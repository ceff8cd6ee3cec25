"""WARC source (sources/warc.py): record framing via the JVM text
scan, header extraction, HTTP envelope split, quarantine semantics,
and the full crawl → visible-text composition with htmlextract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umls2rdf_spark.operators.htmlextract import html_to_text
from umls2rdf_spark.sources.text import CORRUPT_COL
from umls2rdf_spark.sources.warc import (
    make_warc_bytes,
    read_warc,
    warc_responses,
)

_HTML = (
    "<html><head><title>t</title></head><body>"
    "<p>hello &amp; welcome</p></body></html>"
)
_HTTP = (
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _HTML
)


@pytest.fixture()
def warc_path(tmp_path):
    records = [
        {"type": "warcinfo", "payload": "software: test\r\nformat: WARC"},
        {"type": "response", "uri": "https://a.io/p", "payload": _HTTP},
        {
            "type": "response",
            "uri": "https://b.io/q",
            # payload WITHOUT an HTTP envelope (no blank line):
            # degraded body passthrough, NULL status
            "payload": "<html><body>raw</body></html>",
        },
    ]
    p = tmp_path / "test.warc"
    data = make_warc_bytes(records)
    # inject a malformed record (no blank-line separator at all)
    data += b"WARC/1.0\r\nWARC-Type: broken-no-separator"
    p.write_bytes(data)
    return str(p)


def test_read_warc_records_and_quarantine(spark, warc_path):
    df = read_warc(spark, warc_path)
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(good) == 3 and len(bad) == 1
    assert sorted(r.warc_type for r in good) == [
        "response", "response", "warcinfo",
    ]
    info = next(r for r in good if r.warc_type == "warcinfo")
    assert info.payload == "software: test\r\nformat: WARC"
    assert info.target_uri == ""  # header absent -> empty extract
    resp = next(r for r in good if r.target_uri == "https://a.io/p")
    assert resp.payload == _HTTP
    assert resp.content_length == str(len(_HTTP.encode()))
    assert "broken-no-separator" in bad[0][CORRUPT_COL]


def test_warc_responses_envelope_split(spark, warc_path):
    resp = warc_responses(read_warc(spark, warc_path)).collect()
    assert len(resp) == 2
    a = next(r for r in resp if r.target_uri == "https://a.io/p")
    assert a.http_status == 200 and a.html == _HTML
    b = next(r for r in resp if r.target_uri == "https://b.io/q")
    assert b.http_status is None
    assert b.html == "<html><body>raw</body></html>"


def test_warc_to_visible_text_end_to_end(spark, warc_path):
    """The full crawl front: WARC records -> HTTP responses ->
    visible text, all JVM-side expressions."""
    resp = warc_responses(read_warc(spark, warc_path))
    out = html_to_text(resp, "html", "text").where(
        F.col("http_status") == 200
    )
    assert [r.text for r in out.collect()] == ["hello & welcome"]


def test_read_warc_is_splittable_scan(spark, warc_path):
    # record framing happens in the text scan (lineSep), not in a
    # UDF or driver loop: the plan is a plain FileScan + project
    plan = read_warc(spark, warc_path)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Scan text" in plan
    assert "BatchEvalPython" not in plan


def test_read_warc_fuzz_never_dies(spark, tmp_path):
    """Truncated / garbage / empty inputs parse to quarantine rows or
    nothing — never a job failure (the D5 philosophy on the crawl
    container)."""
    blobs = [
        b"",                                     # empty file
        b"garbage with no record marker at all",
        b"WARC/1.0\r\ntruncated-mid-head",
        b"WARC/1.0\r\n\r\n\r\n",                 # empty headers+payload
        make_warc_bytes(
            [{"type": "response", "uri": "u", "payload": "x"}]
        )[:-10],                                  # truncated tail
    ]
    for i, blob in enumerate(blobs):
        p = tmp_path / f"fuzz{i}.warc"
        p.write_bytes(blob)
        rows = read_warc(spark, str(p)).collect()  # must not raise
        for r in rows:
            # every row is either parsed or quarantined, never both
            assert (r[CORRUPT_COL] is None) == (r.warc_type is not None)
