"""umls2rdf_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ncbo/umls2rdf, rebuilt Spark-first.

The reference (/root/reference/umls2rdf.py) is a single-process
MySQL→Turtle ETL; this package re-expresses every capability as
declarative DataFrame plans that Catalyst/Tungsten can optimize and
that scale out by partitioning (see SURVEY.md §2 for the inventory).
"""

from umls2rdf_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
