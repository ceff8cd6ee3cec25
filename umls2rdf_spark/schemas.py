"""Explicit schemas for the UMLS Metathesaurus tables and the driver
testdata tables.

The reference addresses RRF columns positionally (constants at
umls2rdf.py:47-90, e.g. MRCONSO_CUI=0, MRCONSO_AUI=7); we give every
column its released name (per NLM's MRFILES spec, mirrored in the
reference's create_mysql_db.py DDL) so plans stay declarative and
column pruning reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _string_schema(cols: str) -> T.StructType:
    return T.StructType(
        [T.StructField(c, T.StringType(), True) for c in cols.split()]
    )


# UMLS RRF tables (column order matches the RRF release / reference DDL).
MRCONSO = _string_schema(
    "CUI LAT TS LUI STT SUI ISPREF AUI SAUI SCUI SDUI SAB TTY CODE STR "
    "SRL SUPPRESS CVF"
)
MRREL = _string_schema(
    "CUI1 AUI1 STYPE1 REL CUI2 AUI2 STYPE2 RELA RUI SRUI SAB SL RG DIR "
    "SUPPRESS CVF"
)
MRDEF = _string_schema("CUI AUI ATUI SATUI SAB DEF SUPPRESS CVF")
MRSAT = _string_schema(
    "CUI LUI SUI METAUI STYPE CODE ATUI SATUI ATN SAB ATV SUPPRESS CVF"
)
MRSTY = _string_schema("CUI TUI STN STY ATUI CVF")
MRRANK = _string_schema("RANK SAB TTY SUPPRESS")
MRSAB = _string_schema(
    "VCUI RCUI VSAB RSAB SON SF SVER VSTART VEND IMETA RMETA SLC SCC "
    "SRL TFR CFR CXTY TTYL ATNL LAT CENC CURVER SABIN SSN SCIT"
)
MRDOC = _string_schema("DOCKEY VALUE TYPE EXPL")

UMLS_SCHEMAS: dict[str, T.StructType] = {
    "MRCONSO": MRCONSO,
    "MRREL": MRREL,
    "MRDEF": MRDEF,
    "MRSAT": MRSAT,
    "MRSTY": MRSTY,
    "MRRANK": MRRANK,
    "MRSAB": MRSAB,
    "MRDOC": MRDOC,
}

# Driver testdata tables (TPC-H-ish star schema + events/documents/embeddings).
TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
