"""Web-curation operators (SURVEY §2 C37/C38): per-domain caps and
DSIR hashed-n-gram importance weights — oracle, plan-shape, and
property coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle
from umls2rdf_spark.operators.webcurate import (
    cap_per_domain,
    cap_per_domain_sql,
    dsir_bucket_weights,
    dsir_score,
    dsir_sql,
    dsir_topk,
)
from umls2rdf_spark.plans import curation_demos
from umls2rdf_spark.sources.parquet import load_table


# ── oracle parity (the driver's bar, at the oracle SF) ──────────────
def test_domain_cap_matches_oracle(spark, duck):
    from tests.conftest import SF_DIR_ORACLE

    df = curation_demos.domain_cap(spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, curation_demos.DOMAIN_CAP_SQL)


def test_dsir_weights_match_oracle(spark, duck):
    from tests.conftest import SF_DIR_ORACLE

    df = curation_demos.dsir_weights(spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, curation_demos.DSIR_SQL)


def test_dsir_topk_matches_oracle(spark, duck):
    from tests.conftest import SF_DIR_ORACLE

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    wts = dsir_bucket_weights(docs, "text", F.col("lang") == "en")
    scored = dsir_score(docs, wts, "doc_id", "text")
    df = dsir_topk(scored, "doc_id", 25)
    sql = dsir_sql("doc_id", "text", "lang = 'en'", "documents", topk=25)
    assert_matches_oracle(df, duck, sql)


# ── cap semantics ───────────────────────────────────────────────────
def test_cap_and_blocklist_enforced(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = cap_per_domain(
        docs, "doc_id", "source", cap=3, blocklist=["src1", "src5"]
    ).toPandas()
    assert out["r"].max() <= 3
    per_dom = out.groupby("source").size()
    assert per_dom.max() <= 3
    assert not set(per_dom.index) & {"src1", "src5"}
    # sources that survive and had >= 3 docs keep exactly 3
    totals = docs.groupBy("source").count().toPandas().set_index("source")
    for dom, kept in per_dom.items():
        assert kept == min(3, int(totals.loc[dom, "count"]))


def test_cap_rank_is_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = sorted(
        map(tuple, cap_per_domain(docs, "doc_id", "source", 4).collect())
    )
    b = sorted(
        map(tuple, cap_per_domain(docs, "doc_id", "source", 4).collect())
    )
    assert a == b


def test_cap_plan_has_partial_window_group_limit(spark):
    """The 100 TB property: each map task prunes to <= cap rows per
    domain BEFORE the shuffle. A Spark regression dropping the
    WindowGroupLimit(Partial) node would silently reintroduce the
    full-mega-domain shuffle."""
    docs = load_table(spark, SF_DIR, "documents")
    out = cap_per_domain(docs, "doc_id", "source", cap=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


# ── dsir semantics ──────────────────────────────────────────────────
def test_dsir_model_state_is_bounded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    wts = dsir_bucket_weights(docs, "text", F.col("lang") == "en")
    n = wts.count()
    assert n <= 256
    cols = dict(wts.dtypes)
    assert cols == {"bucket": "bigint", "w": "bigint"}


def test_dsir_target_docs_score_higher_on_average(spark):
    """Sanity direction: documents in the target slice should carry a
    higher mean importance weight than the rest — the property DSIR
    resampling relies on."""
    docs = load_table(spark, SF_DIR, "documents")
    wts = dsir_bucket_weights(docs, "text", F.col("lang") == "en")
    scored = dsir_score(docs, wts, "doc_id", "text").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = (
        scored.groupBy(F.col("lang") == "en")
        .agg(F.avg("avg_dsir").alias("m"))
        .collect()
    )
    by = {bool(r[0]): r["m"] for r in means}
    assert by[True] > by[False]


def test_dsir_topk_is_takeordered(spark):
    docs = load_table(spark, SF_DIR, "documents")
    wts = dsir_bucket_weights(docs, "text", F.col("lang") == "en")
    scored = dsir_score(docs, wts, "doc_id", "text")
    top = dsir_topk(scored, "doc_id", 7)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert top.count() == 7


def test_cap_sql_quotes_blocklist_entries():
    sql = cap_per_domain_sql(
        "doc_id", "source", "documents", 2, blocklist=["o'reilly.com"]
    )
    assert "'o''reilly.com'" in sql


# ── turtle_validate section semantics (D2 core, completion.py) ──────
def test_turtle_validate_flags_exactly_the_corrupted_blocks(spark):
    from umls2rdf_spark.plans.completion import (
        _TV_BRACKET_MOD,
        _TV_CHOP_MOD,
        _turtle_validate_frame,
    )

    out = _turtle_validate_frame(spark, SF_DIR).toPandas()
    key = out["subject"].astype("int64")
    corrupted = (key % _TV_CHOP_MOD == 0) | (key % _TV_BRACKET_MOD == 0)
    assert (out.loc[corrupted, "ok"] == False).all()  # noqa: E712
    assert (out.loc[~corrupted, "ok"] == True).all()  # noqa: E712
    # chopped blocks lose their terminator; bracket blocks gain an
    # unbalanced '<' on the final line
    chop_only = (key % _TV_CHOP_MOD == 0) & (key % _TV_BRACKET_MOD != 0)
    assert (out.loc[chop_only, "n_terminators"] == 0).all()
    bracket = key % _TV_BRACKET_MOD == 0
    assert (out.loc[bracket, "n_bad_bracket"] >= 1).all()


# ── snapshot_diff semantics (corpus.py, text_scoring section 26) ────
def test_snapshot_diff_classifies_every_transition(spark):
    from umls2rdf_spark.operators.corpus import snapshot_diff

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(base, new, "doc_id", "text").collect()
    }
    assert got == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "added"
    }


def test_snapshot_diff_shuffle_carries_fingerprints_not_text(spark):
    """The full-outer join's inputs are pre-projected to
    (id, md5) — text must not appear in any column crossing the
    exchange."""
    from umls2rdf_spark.operators.corpus import snapshot_diff
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = snapshot_diff(docs, docs, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)


# ── URL canonicalization + dedup (C41, round 6) ─────────────────────
def test_normalize_url_rules(spark):
    from umls2rdf_spark.operators.webcurate import normalize_url_expr

    cases = [
        # case + default port + tracking + fragment + trailing slash
        ("HTTPS://Example.COM:443/a/b/?utm_source=f&id=7#x",
         "https://example.com/a/b?id=7"),
        ("http://example.com:80/", "http://example.com"),
        # non-default port kept; param ORDER preserved (no re-sort)
        ("http://h.io:8080/x?b=2&utm_campaign=z&a=1",
         "http://h.io:8080/x?b=2&a=1"),
        ("https://h.io/p?utm_a=1&fbclid=2", "https://h.io/p"),
        ("notaurl", None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "id long, url string"
    )
    got = {
        r.id: r.n
        for r in df.select(
            "id", normalize_url_expr(F.col("url")).alias("n")
        ).collect()
    }
    for i, (_, exp) in enumerate(cases):
        assert got[i] == exp, (cases[i][0], got[i], exp)


def test_dedup_by_url_keeps_min_id_and_drops_invalid(spark):
    from umls2rdf_spark.operators.webcurate import dedup_by_url

    df = spark.createDataFrame(
        [
            (5, "https://a.io/p#one"),
            (2, "HTTPS://A.IO/p"),
            (9, "https://a.io/p/"),
            (1, "garbage"),
            (3, "https://b.io/q"),
        ],
        "id long, url string",
    )
    rows = {
        r.id: r.url_norm for r in dedup_by_url(df, "id", "url").collect()
    }
    assert rows == {2: "https://a.io/p", 3: "https://b.io/q"}


def test_dedup_by_url_window_group_limit_plan(spark):
    from umls2rdf_spark.operators.webcurate import dedup_by_url

    df = spark.createDataFrame(
        [(1, "https://a.io/p")], "id long, url string"
    )
    plan = dedup_by_url(df, "id", "url")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


# ── eTLD+1 registered domain (C37 grouping upgrade) ─────────────────
def test_registered_domain_rules(spark):
    from umls2rdf_spark.operators.webcurate import registered_domain_expr

    rows = [
        (1, "WWW.Example.COM"),
        (2, "a.b.example.com"),
        (3, "shop.a.co.uk"),
        (4, "b.co.uk"),
        (5, "co.uk"),          # bare suffix: falls to last-2 rule
        (6, "localhost"),
        (7, "m.news.com.au"),
    ]
    df = spark.createDataFrame(rows, "id long, host string")
    got = {
        r.id: r.d
        for r in df.select(
            "id", registered_domain_expr(F.col("host")).alias("d")
        ).collect()
    }
    assert got[1] == "example.com"
    assert got[2] == "example.com"
    assert got[3] == "a.co.uk"
    assert got[4] == "b.co.uk"
    assert got[5] == "co.uk"
    assert got[6] == "localhost"
    assert got[7] == "news.com.au"


def test_registered_domain_matches_oracle(spark, duck):
    from umls2rdf_spark.operators.webcurate import (
        registered_domain_expr,
        registered_domain_sql,
    )

    hosts = [
        (1, "www.example.com"), (2, "shop.a.co.uk"), (3, "b.co.uk"),
        (4, "x.y.z.gov.uk"), (5, "single"), (6, "M.NEWS.com.AU"),
        (7, "192.168.0.1"),
    ]
    df = spark.createDataFrame(hosts, "id long, host string")
    got = sorted(
        (r.id, r.d)
        for r in df.select(
            "id", registered_domain_expr(F.col("host")).alias("d")
        ).collect()
    )
    duck.execute("CREATE OR REPLACE TABLE __hosts (id BIGINT, host VARCHAR)")
    duck.executemany("INSERT INTO __hosts VALUES (?, ?)", hosts)
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            f"SELECT id, {registered_domain_sql('host')} AS d FROM __hosts"
        ).fetchall()
    )
    assert got == exp


def test_cap_per_domain_composes_with_registered_domain(spark):
    """The real FineWeb grouping: cap on eTLD+1 so www./m. subdomain
    variants of one site share a cap while distinct co.uk
    registrants keep their own."""
    from umls2rdf_spark.operators.webcurate import (
        cap_per_domain,
        registered_domain_expr,
    )

    rows = (
        [(i, "www.big.com") for i in range(10)]
        + [(100 + i, "m.big.com") for i in range(10)]
        + [(200 + i, f"site{i}.co.uk") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "id long, host string").withColumn(
        "domain", registered_domain_expr(F.col("host"))
    )
    kept = cap_per_domain(df, "id", "domain", cap=3).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.domain, []).append(r.id)
    # one shared cap for both big.com subdomains
    assert len(by_dom["big.com"]) == 3
    # each co.uk registrant is its own domain
    assert sum(1 for d in by_dom if d.endswith(".co.uk")) == 5


# ── full-PSL registered domains (wildcard + exception rules) ─────────
# the publicsuffix.org spec's own jp/kobe test block: exact rules at
# 1-3 labels, a wildcard rule, and an exception rule
_PSL_RULES = (
    "jp", "ac.jp", "kyoto.jp", "ide.kyoto.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "com", "co.uk",
)

#: (host, expected registered domain) — publicsuffix.org
#: checkPublicSuffix vectors; spec-NULL cases (host IS a public
#: suffix / bare label) follow the repo's pass-through convention
_PSL_VECTORS = [
    ("example.com", "example.com"),
    ("WWW.example.COM", "example.com"),
    ("jp", "jp"),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", "ac.jp"),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", "kyoto.jp"),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", "ide.kyoto.jp"),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("c.kobe.jp", "c.kobe.jp"),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    ("a.www.city.kobe.jp", "city.kobe.jp"),
    ("a.co.uk", "a.co.uk"),
    ("b.a.co.uk", "a.co.uk"),
    # unlisted TLD → implicit * rule (last 2 labels)
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("localhost", "localhost"),
]


def test_registered_domain_psl_spec_vectors(spark):
    from umls2rdf_spark.operators.webcurate import registered_domain_psl

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(_PSL_VECTORS)],
        "id long, host string",
    )
    got = {
        r["id"]: r["reg_domain"]
        for r in registered_domain_psl(df, "host", _PSL_RULES).collect()
    }
    for i, (h, want) in enumerate(_PSL_VECTORS):
        assert got[i] == want, f"{h}: got {got[i]}, want {want}"


def test_registered_domain_psl_engine_parity(spark, duck):
    from umls2rdf_spark.operators.webcurate import (
        registered_domain_psl,
        registered_domain_psl_sql,
    )

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(_PSL_VECTORS)],
        "id long, host string",
    )
    inline = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{h}')" for i, (h, _) in enumerate(_PSL_VECTORS)
    ) + ") AS v(id, host)"
    assert_matches_oracle(
        registered_domain_psl(df, "host", _PSL_RULES),
        duck,
        registered_domain_psl_sql(inline, "host", _PSL_RULES),
    )


def test_registered_domain_psl_zero_exchange(spark):
    """The production claim: K broadcast joins, corpus never
    shuffles — no Exchange anywhere in the executed plan."""
    from umls2rdf_spark.operators.webcurate import registered_domain_psl

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.concat(F.col("source"), F.lit(".co.uk")).alias("host")
    )
    plan = (
        registered_domain_psl(docs, "host", _PSL_RULES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange" not in plan.replace("BroadcastExchange", "BX")


def test_parse_psl_format():
    from umls2rdf_spark.operators.webcurate import parse_psl

    text = """// ===BEGIN ICANN DOMAINS===
// jp : https://en.wikipedia.org/wiki/.jp
jp
ac.jp

*.kobe.jp
!city.kobe.jp
// ===END ICANN DOMAINS===
COM
"""
    assert parse_psl(text) == (
        "jp", "ac.jp", "*.kobe.jp", "!city.kobe.jp", "com"
    )


def test_cap_composes_with_psl_registered_domain(spark):
    """The production composition: group by full-PSL eTLD+1, then
    cap — wildcard-suffix hosts do NOT collapse into one group."""
    from umls2rdf_spark.operators.webcurate import (
        cap_per_domain,
        registered_domain_psl,
    )

    rows = [
        (i, f"sub{i}.site{i % 3}.kobe.jp") for i in range(12)
    ] + [(100 + i, f"w{i}.example.com") for i in range(9)]
    df = spark.createDataFrame(rows, "id long, host string")
    with_dom = registered_domain_psl(df, "host", _PSL_RULES)
    capped = cap_per_domain(with_dom, "id", "reg_domain", cap=2)
    per = {
        r["reg_domain"]: r["n"]
        for r in capped.groupBy("reg_domain")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # *.kobe.jp: siteN.kobe.jp is itself a public suffix, so each
    # subI.siteN.kobe.jp is its OWN registered domain (cap no-op)
    assert sum(1 for d in per if d.endswith("kobe.jp")) == 12
    assert all(n == 1 for d, n in per.items() if d.endswith("kobe.jp"))
    # example.com collapses: 9 docs -> cap 2
    assert per["example.com"] == 2


def test_registered_domain_psl_large_rule_table(spark, duck):
    """Real-PSL-shaped rule table (~1000 rules, depths 1-4, wildcard
    and exception rules mixed in): the K-join plan and the DuckDB
    twin stay value-equal, and the plan stays broadcast-only."""
    from umls2rdf_spark.operators.webcurate import (
        registered_domain_psl,
        registered_domain_psl_sql,
    )

    rules = ["com", "org", "net", "uk", "jp"]
    rules += [f"t{i}" for i in range(200)]                    # 1-label
    rules += [f"co.t{i}" for i in range(200)]                 # 2-label
    rules += [f"pref.co.t{i}" for i in range(0, 200, 2)]      # 3-label
    rules += [f"city.pref.co.t{i}" for i in range(0, 200, 4)] # 4-label
    rules += [f"*.wild.t{i}" for i in range(0, 200, 5)]       # wildcard
    rules += [f"!keep.wild.t{i}" for i in range(0, 200, 10)]  # exception
    rules = tuple(rules)

    hosts = []
    for i in range(0, 200, 7):
        hosts.append(f"a.co.t{i}")             # 2-label suffix
        hosts.append(f"b.pref.co.t{i}")        # 3-label when listed
        hosts.append(f"x.y.wild.t{i}")         # wildcard zone
        hosts.append(f"keep.wild.t{i}")        # exception zone
        hosts.append(f"plain.t{i}")            # 1-label suffix
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "id long, host string"
    )
    got = registered_domain_psl(df, "host", rules)
    # spot-check the semantics at each depth
    vals = {r["host"]: r["reg_domain"] for r in got.collect()}
    assert vals["a.co.t0"] == "a.co.t0"
    assert vals["b.pref.co.t0"] == "b.pref.co.t0"
    assert vals["x.y.wild.t0"] == "x.y.wild.t0"   # y.wild.t0 is PS
    assert vals["keep.wild.t0"] == "keep.wild.t0" # exception: PS=wild.t0
    assert vals["plain.t7"] == "plain.t7"
    inline = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{h}')" for i, h in enumerate(hosts)
    ) + ") AS v(id, host)"
    assert_matches_oracle(
        got, duck, registered_domain_psl_sql(inline, "host", rules)
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", "BX")
