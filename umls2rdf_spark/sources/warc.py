"""WARC (Web ARChive) record source: the container format crawl
corpora actually arrive in (Common Crawl publishes WARC; C4 /
RefinedWeb / FineWeb all start from it). Pairs with
``operators/htmlextract.py`` to form the full crawl → visible-text
front of the pipeline: ``read_warc → warc_responses → html_to_text``.

No WARC library exists in the runtime and none is needed: a WARC
file is concatenated records, each

    WARC/1.<minor>\\r\\n
    <WARC headers: Name: value lines>\\r\\n
    \\r\\n
    <payload bytes (for response records: an HTTP message)>\\r\\n\\r\\n

so Spark's own text reader does the record framing: ``lineSep =
"WARC/1."`` splits the stream AT record boundaries inside the JVM
scan — executors take file splits directly, records parse as plain
Column expressions (regexp header extraction + ``instr`` payload
split). No UDF, no driver-side parsing, no custom InputFormat.

Engine scan rules (same as sources/text.py): malformed records are
QUARANTINED, not fatal and not silently dropped — a record missing
its blank-line separator or its WARC-Type surfaces as a
``_corrupt_record`` row the caller can count, instead of killing a
1000-executor job hours in.

Scale notes: uncompressed WARC splits at record granularity via the
custom line separator (splittable read, intra-file parallelism).
Real crawls ship gzipped WARC, which is not splittable — there,
parallelism is per-file (Common Crawl segments are ~1 GB precisely
so file-level parallelism suffices); the same reader applies
unchanged since Spark's text source decompresses transparently by
extension. Limitation, stated: this parses textual payloads (HTML
pages — the training-data case); binary payloads (images in WARC)
need the binaryFile source + operators/multimodal.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.sources.text import CORRUPT_COL

_CRLF2 = "\r\n\r\n"
#: WARC header fields surfaced as typed columns.
_HEADER_COLS = {
    "warc_type": r"(?im)^WARC-Type:[ \t]*(\S+)",
    "target_uri": r"(?im)^WARC-Target-URI:[ \t]*(\S+)",
    "warc_date": r"(?im)^WARC-Date:[ \t]*(\S+)",
    "record_id": r"(?im)^WARC-Record-ID:[ \t]*(\S+)",
    "content_length": r"(?im)^Content-Length:[ \t]*(\d+)",
}


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record: the header fields of
    ``_HEADER_COLS``, the raw ``payload`` (bytes after the blank
    line, trailing record separator trimmed), and ``_corrupt_record``
    carrying the raw text of records that don't parse (NULL
    otherwise). A leading pre-record chunk (empty under correct
    framing) is dropped only when empty — garbage before the first
    record quarantines instead of vanishing."""
    raw = spark.read.option("lineSep", "WARC/1.").text(path)
    return parse_warc_chunks(raw)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_warc`: a file-source STREAM over
    a directory WARC files land in — the continuous-crawl intake
    shape (each fetcher drop becomes one micro-batch; used by
    streaming/crawl.py). Identical record framing (the ``lineSep``
    split happens in the streaming text source's JVM scan) and the
    identical Column-only parse, so batch and stream rows are
    byte-equal for the same file."""
    raw = (
        spark.readStream.option("lineSep", "WARC/1.")
        .text(path)
    )
    return parse_warc_chunks(raw)


def parse_warc_chunks(raw: DataFrame) -> DataFrame:
    """The shared Column-expression parse over ``lineSep``-framed
    chunks (one ``value`` row per record candidate) — batch and
    streaming sources differ only in the scan above this."""
    raw = raw.where(F.col("value") != "")
    # a well-formed chunk starts with the version minor digit and
    # contains the headers/payload blank-line separator
    sep_pos = F.expr(r"instr(value, '\r\n\r\n')")
    well_formed = F.col("value").rlike(r"^\d\r\n") & (sep_pos > 0)
    headers = F.expr(r"substring(value, 1, instr(value, '\r\n\r\n') - 1)")
    payload = F.expr(
        r"substring(value, instr(value, '\r\n\r\n') + 4)"
    )
    payload = F.regexp_replace(payload, r"(\r\n)+$", "")
    cols = [
        F.when(
            well_formed, F.regexp_extract(headers, pat, 1)
        ).alias(name)
        for name, pat in _HEADER_COLS.items()
    ]
    return raw.select(
        *cols,
        F.when(well_formed, payload).alias("payload"),
        F.when(~well_formed, F.col("value")).alias(CORRUPT_COL),
    )


def warc_responses(records: DataFrame) -> DataFrame:
    """The response records, with the HTTP envelope split off the
    payload: (target_uri, warc_date, http_status int, html). Records
    whose payload carries no HTTP header block (no blank line) get a
    NULL status and the raw payload as body — quarantine-style
    degradation, consistent with read_warc."""
    has_env = F.expr(r"instr(payload, '\r\n\r\n')") > 0
    status = F.regexp_extract(
        F.col("payload"), r"^HTTP/[0-9.]+[ \t]+(\d{3})", 1
    )
    body = F.expr(
        r"substring(payload, instr(payload, '\r\n\r\n') + 4)"
    )
    return (
        records.where(
            (F.col(CORRUPT_COL).isNull())
            & (F.col("warc_type") == "response")
        )
        .select(
            "target_uri",
            "warc_date",
            F.when(has_env & (status != ""), status)
            .cast("int")
            .alias("http_status"),
            F.when(has_env, body)
            .otherwise(F.col("payload"))
            .alias("html"),
        )
    )


def make_warc_bytes(records: list[dict]) -> bytes:
    """Serialize record dicts into WARC bytes — the test/fixture
    twin of :func:`read_warc` (write side of the format contract).
    Each dict: ``type``, ``uri`` (optional), ``payload`` (str)."""
    out = []
    for i, r in enumerate(records):
        payload = r.get("payload", "")
        headers = [f"WARC-Type: {r['type']}"]
        if r.get("uri"):
            headers.append(f"WARC-Target-URI: {r['uri']}")
        headers.append(f"WARC-Record-ID: <urn:test:{i}>")
        headers.append("WARC-Date: 2026-01-01T00:00:00Z")
        headers.append(f"Content-Length: {len(payload.encode())}")
        out.append(
            "WARC/1.0\r\n"
            + "\r\n".join(headers)
            + "\r\n\r\n"
            + payload
            + "\r\n\r\n"
        )
    return "".join(out).encode()
