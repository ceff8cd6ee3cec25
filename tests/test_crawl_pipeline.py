"""End-to-end crawl-curation composition (plans/crawl_pipeline.py):
WARC bytes → packed sequences with a funnel observation per stage.
The per-operator suites verify each stage alone; THIS suite verifies
the hand-offs: which fixture documents survive each stage, funnel
counts == direct counts, and the no-re-read plan shape (the raw WARC
text is scanned by the ingest stage only)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umls2rdf_spark.plans.crawl_pipeline import curate_crawl
from umls2rdf_spark.sources.warc import make_warc_bytes

_PSL = ("com", "co.uk", "uk")

_GOOD = (
    "the quick brown fox jumps over a lazy dog and runs to the "
    "green hills of summer in bright morning light with steady "
    "wind and a clear view of the valley below"
)


def _page(body: str) -> str:
    return (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        f"<html><body><p>{body}</p></body></html>"
    )


def _fixture(tmp_path):
    """13 records; expected survival is annotated per record."""
    good2 = (
        "an old harbor town kept the records of every ship and "
        "cargo that passed through its gates in heavy ledgers bound "
        "with leather and kept in a cold stone cellar under the "
        "customs house near the pier"
    )
    good3 = (
        "careful gardeners plant the hardy roses along a southern "
        "wall where morning sun and shelter from the north wind let "
        "them flower well into autumn and sometimes to the first "
        "frost of the year"
    )
    good4 = (
        "the committee reviewed a long list of proposals and voted "
        "to fund the bridge repairs first because the inspection "
        "report had flagged serious rust in the main cables and in "
        "several of the anchor plates"
    )
    good5 = (
        "travelers in the high passes carry extra rope and a small "
        "stove because the weather can turn in minutes and the "
        "nearest shelter may be hours away across fields of loose "
        "stone and drifted snow"
    )
    base_text = (
        "a completely different base document about the history of "
        "printing and the spread of movable type across europe in "
        "the early modern period with many long journeys to market"
    )
    cyr = "Я" * 40
    records = [
        # alpha.com family: 3 quality pages, cap=2 keeps 2
        {"type": "response", "uri": "http://www.alpha.com/a",
         "payload": _page(_GOOD)},
        {"type": "response", "uri": "http://m.alpha.com/b",
         "payload": _page(good2)},
        {"type": "response", "uri": "http://alpha.com/c",
         "payload": _page(good3)},
        # beta.co.uk: one good page (reg domain spans subdomains)
        {"type": "response", "uri": "http://beta.co.uk/x",
         "payload": _page(good4)},
        # URL-dup pair: normalizes to the SAME canonical URL as the
        # next record -> url_dedup keeps exactly one
        {"type": "response", "uri": "http://delta.com/p?utm_source=x",
         "payload": _page(good5)},
        {"type": "response", "uri": "http://delta.com/p",
         "payload": _page(good5)},
        # exact near-dup of beta's text under a different URL ->
        # within-shard minhash drops one of the pair
        {"type": "response", "uri": "http://epsilon.com/copy",
         "payload": _page(good4)},
        # exact dup of a BASE-corpus doc -> dropped vs the index
        {"type": "response", "uri": "http://zeta.com/base-copy",
         "payload": _page(base_text)},
        # too short -> gopher gate drops
        {"type": "response", "uri": "http://eta.com/short",
         "payload": _page("just five small words here")},
        # passes gopher (latin words) but >10% non-ASCII -> char gate
        {"type": "response", "uri": "http://theta.com/mixed",
         "payload": _page(_GOOD + " " + cyr)},
        # PII page: survives, text scrubbed
        {"type": "response", "uri": "http://iota.com/pii",
         "payload": _page(
             "the support desk answers most of the letters within a "
             "week and forwards the rest to the regional office for "
             "a slower but more thorough reply in the post so "
             "contact bob@example.com now"
         )},
        # non-200 -> dropped at ingest
        {"type": "response", "uri": "http://kappa.com/gone",
         "payload": "HTTP/1.1 404 Not Found\r\n\r\n<html>gone</html>"},
        # non-response record -> dropped by warc_responses
        {"type": "request", "uri": "http://alpha.com/a",
         "payload": "GET /a HTTP/1.1"},
    ]
    path = str(tmp_path / "crawl.warc")
    with open(path, "wb") as f:
        f.write(make_warc_bytes(records))
    return path, base_text


def _run(spark, tmp_path):
    path, base_text = _fixture(tmp_path)
    base = spark.createDataFrame(
        [(10**15, base_text)], "doc_id long, text string"
    )
    return curate_crawl(
        spark, path, base, _PSL, cap=2, seq_len=32
    )


def test_funnel_counts_match_direct_counts(spark, tmp_path):
    packed, counts, frames = _run(spark, tmp_path)
    for stage, c in counts.items():
        assert c["observed"] == c["direct"], (stage, c)
    # expected drop-offs, stage by stage:
    # 13 records -> 12 responses -> 11 http-200
    assert counts["ingest"]["direct"] == 11
    assert counts["extract"]["direct"] == 11
    assert counts["pii_scrub"]["direct"] == 11
    # gopher drops the 5-word page; char gate drops the cyrillic mix
    assert counts["quality_gate"]["direct"] == 9
    # the utm variant collapses onto its canonical twin
    assert counts["url_dedup"]["direct"] == 8
    # alpha.com has 3 docs -> cap 2 (everything else under cap)
    assert counts["domain_cap"]["direct"] == 7
    # near-dup: one of the within-shard exact pair + the base copy
    assert counts["near_dup"]["direct"] == 5
    for f in frames.values():
        f.unpersist()


def test_stage_semantics_compose(spark, tmp_path):
    packed, counts, frames = _run(spark, tmp_path)
    admitted = {
        r["url"]: r["text"] for r in frames["near_dup"].collect()
    }
    urls = set(admitted)
    # the PII page survived WITH the redaction applied
    assert "http://iota.com/pii" in urls
    assert "<EMAIL>" in admitted["http://iota.com/pii"]
    assert "bob@example.com" not in admitted["http://iota.com/pii"]
    # quality-gate victims are gone
    assert "http://eta.com/short" not in urls
    assert "http://theta.com/mixed" not in urls
    # the base copy is gone; exactly ONE of the within-shard pair
    assert "http://zeta.com/base-copy" not in urls
    pair = {"http://beta.co.uk/x", "http://epsilon.com/copy"}
    assert len(pair & urls) == 1
    # exactly one of the URL-dup pair (the canonical one, min id)
    dupes = {u for u in urls if u.startswith("http://delta.com/p")}
    assert len(dupes) == 1
    # alpha.com capped to 2 of its 3 pages
    assert sum(1 for u in urls if "alpha.com" in u) == 2

    # packing consumed every admitted token exactly once
    total_tokens = sum(len(t.split()) for t in admitted.values())
    spans = packed.select(
        (F.col("tok_end") - F.col("tok_start")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert spans == total_tokens
    for f in frames.values():
        f.unpersist()


def test_warc_scanned_only_at_ingest(spark, tmp_path):
    """The no-re-read plan fact: every post-ingest stage's EXECUTED
    access path is the materialized boundary (InMemoryTableScan) —
    zero file scans. The raw FileScan survives only INSIDE
    InMemoryRelation's cached-plan description (provenance, not an
    access), so the audit inspects the plan prefix before the first
    InMemoryRelation node."""
    packed, counts, frames = _run(spark, tmp_path)

    def access_path(df) -> str:
        plan = df._jdf.queryExecution().executedPlan().toString()
        cut = plan.find("InMemoryRelation")
        return plan if cut < 0 else plan[:cut]

    # ingest provenance IS the WARC scan (cached, so the scan lives
    # in the relation description)
    ingest_plan = (
        frames["ingest"]._jdf.queryExecution().executedPlan().toString()
    )
    assert "FileScan text" in ingest_plan
    for stage in ("extract", "pii_scrub", "quality_gate", "url_dedup",
                  "domain_cap", "near_dup"):
        ap = access_path(frames[stage])
        assert "FileScan" not in ap, (stage, ap)
        assert "InMemoryTableScan" in ap, stage
    # the packed frame reads only the near_dup boundary too
    assert "FileScan" not in access_path(packed)
    for f in frames.values():
        f.unpersist()


def test_checkpoint_mode_same_results_and_no_warc_reread(
    spark, tmp_path
):
    """checkpoint_dir mode: identical funnel counts and packed output
    vs persist mode, and the no-re-read plan fact holds with parquet
    boundaries — every post-ingest stage's executed plan scans ONLY
    its upstream checkpoint table (FileScan parquet), never the raw
    WARC (FileScan text)."""
    path, base_text = _fixture(tmp_path)
    base = spark.createDataFrame(
        [(10**15, base_text)], "doc_id long, text string"
    )
    packed_p, counts_p, frames_p = curate_crawl(
        spark, path, base, _PSL, cap=2, seq_len=32
    )
    ckpt = str(tmp_path / "ckpt")
    packed_c, counts_c, frames_c = curate_crawl(
        spark, path, base, _PSL, cap=2, seq_len=32,
        checkpoint_dir=ckpt,
    )
    assert counts_c == counts_p
    for stage, c in counts_c.items():
        assert c["observed"] == c["direct"], (stage, c)
    assert sorted(map(tuple, packed_c.collect())) == sorted(
        map(tuple, packed_p.collect())
    )
    # plan audit: post-ingest stages read parquet boundaries only
    for stage in ("extract", "pii_scrub", "quality_gate", "url_dedup",
                  "domain_cap", "near_dup"):
        plan = (
            frames_c[stage]._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "FileScan text" not in plan, (stage, plan)
        assert "FileScan parquet" in plan, stage
    final = packed_c._jdf.queryExecution().executedPlan().toString()
    assert "FileScan text" not in final
    for f in frames_p.values():
        f.unpersist()


def test_decontam_stage_drops_benchmark_leak(spark, tmp_path):
    """With a benchmark supplied, the optional decontam stage drops
    exactly the admitted doc that duplicates a benchmark item, its
    funnel row matches the direct count, and the packed output no
    longer contains the leak."""
    path, base_text = _fixture(tmp_path)
    base = spark.createDataFrame(
        [(10**15, base_text)], "doc_id long, text string"
    )
    # bare run harvests an admitted doc's text to use as the bench
    _p0, counts0, frames0 = curate_crawl(
        spark, path, base, _PSL, cap=2, seq_len=32
    )
    delta_text = [
        r["text"]
        for r in frames0["near_dup"].collect()
        if "delta.com" in r["url"]
    ][0]
    for f in frames0.values():
        f.unpersist()
    bench = spark.createDataFrame(
        [(1, delta_text)], "bench_id long, text string"
    )
    packed, counts, frames = curate_crawl(
        spark, path, base, _PSL, cap=2, seq_len=32, benchmark=bench
    )
    assert counts["decontam"]["observed"] == counts["decontam"]["direct"]
    assert (
        counts["decontam"]["direct"]
        == counts["near_dup"]["direct"] - 1
    )
    urls = {r["url"] for r in frames["decontam"].collect()}
    assert urls and not any("delta.com" in u for u in urls)
    for f in frames.values():
        f.unpersist()


def test_normalize_and_para_dedup_stages(spark, tmp_path):
    """Opt-in round-8 stages: normalize fixes mojibake before the
    gates; para_dedup strips the cross-document shared sentence from
    all but its first-occurrence doc."""
    shared = (
        "every page on this site carries this exact legal footer "
        "sentence about cookies and consent"
    )
    uniq_a = (
        "the first article talks at length about rivers and canals "
        "and the slow trade of grain between the towns of the plain "
        "in the dry years of the old calendar"
    )
    uniq_b = (
        "the second article describes a mountain observatory and "
        "the careful work of keeping its clocks aligned with the "
        "stars through the long and windy winter nights"
    )
    moji = (
        "they said donâ€™t worry about the harvest because the "
        "barns were full and the weather held for another month of "
        "long clear days across the whole of the southern valley"
    )
    records = [
        {"type": "response", "uri": "http://a.com/one",
         "payload": _page(f"{shared}. {uniq_a}")},
        {"type": "response", "uri": "http://b.com/two",
         "payload": _page(f"{shared}. {uniq_b}")},
        {"type": "response", "uri": "http://c.com/three",
         "payload": _page(moji)},
    ]
    path = str(tmp_path / "np.warc")
    with open(path, "wb") as f:
        f.write(make_warc_bytes(records))
    base = spark.createDataFrame([], "doc_id long, text string")
    packed, counts, frames = curate_crawl(
        spark, path, base, _PSL, cap=5, seq_len=64,
        normalize=True, paragraph_dedup=True, paragraph_sep=". ",
        # verify LSH candidates at exact jaccard: a/b share one long
        # footer (real jaccard ~0.2) and would otherwise drop on the
        # band collision alone — the para stage, not doc dedup, is
        # the right tool for shared boilerplate
        near_dup_min_jaccard=0.5,
    )
    assert counts["normalize"]["direct"] == 3
    assert counts["normalize"]["observed"] == 3
    assert counts["near_dup"]["direct"] == 3
    # all three docs keep at least one unique paragraph
    assert counts["para_dedup"]["direct"] == 3
    texts = {r["url"]: r["text"] for r in frames["para_dedup"].collect()}
    # mojibake fixed before the gates and in the final text
    c_text = texts["http://c.com/three"]
    assert "don't" in c_text and "â€" not in c_text
    # the shared footer survives in exactly one of a/b
    n_shared = sum(
        1 for u in ("http://a.com/one", "http://b.com/two")
        if shared in texts[u]
    )
    assert n_shared == 1
    # both keep their unique article text
    assert uniq_a in texts["http://a.com/one"]
    assert uniq_b in texts["http://b.com/two"]
    for f in frames.values():
        f.unpersist()
