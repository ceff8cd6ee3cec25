"""Web-corpus curation operators: per-domain caps with blocklists
(the RefinedWeb/FineWeb host-level curation step) and DSIR-style
hashed-n-gram importance weighting (Xie et al., NeurIPS 2023).

Neither has a reference twin (umls2rdf is an ontology ETL); both are
LLM-training-pipeline table stakes the brief asks for as first-class
components. Both are pure DataFrame plans — no UDFs — and both have
DuckDB oracle SQL generated from the same constants.

Scale notes (the 100 TB question):

- ``cap_per_domain`` declares ``row_number() <= cap`` over a
  per-domain window and lets Catalyst insert the
  ``WindowGroupLimit`` Partial/Final pair (Spark >= 3.5): every map
  task locally keeps at most ``cap`` rows per domain BEFORE the
  shuffle, so a mega-domain (the classic skew case: one host is 5%
  of the crawl) ships at most ``cap x n_input_partitions`` rows,
  not its full row count. ``tests/test_webcurate.py`` pins the
  Partial node's presence so a Spark regression can't silently
  reintroduce the full-domain shuffle.
- ``dsir_bucket_weights`` keeps model state at exactly
  ``num_buckets`` rows regardless of corpus size — the entire point
  of DSIR's hashed features vs the unbounded-vocabulary
  :func:`~umls2rdf_spark.operators.textstats.token_log_odds` model
  it complements. One conditional-aggregation pass trains both the
  target and raw distributions (no second scan); scoring joins the
  broadcast bucket dim (``num_buckets`` rows) so the only shuffle is
  the per-doc sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import stable_hash40, stable_hash40_sql

DSIR_BUCKETS = 256
DSIR_QUANT_BITS = 20

#: lowercase alnum-run tokenization shared with token_log_odds /
#: gopher_quality — one tokenizer across every text-scoring op.
_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda t: t != ""
    )


# ── per-domain caps (FineWeb-style host curation) ───────────────────
def cap_per_domain(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    cap: int,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, chosen by a
    deterministic hash rank (so the "sample" is reproducible across
    runs and engines), after dropping blocklisted domains.

    Output: (id, domain, r) for every kept row, r in [1, cap].

    The rank key is ``stable_hash40(id)`` with the id itself as
    tiebreak — a uniform pseudo-random order that both engines
    compute identically, unlike a timestamp or ingestion order that
    would bias the kept set toward one crawl segment.

    Plan shape: blocklist as a broadcast anti-join when given
    (a blocklist is thousands of hosts — always broadcastable);
    window + filter compiles to WindowGroupLimit(Partial) ->
    Exchange(domain) -> WindowGroupLimit(Final), i.e. map-side
    top-``cap`` per domain before any data moves.
    """
    out = df.select(
        F.col(id_col), F.col(domain_col), F.col(id_col).cast("string").alias("__s")
    )
    if blocklist:
        bl = df.sparkSession.createDataFrame(
            [(d,) for d in blocklist], f"{domain_col} string"
        )
        out = out.join(F.broadcast(bl), domain_col, "left_anti")
    w = Window.partitionBy(domain_col).orderBy(
        stable_hash40(F.col("__s")), F.col(id_col)
    )
    return (
        out.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= cap)
        .select(id_col, domain_col, "r")
    )


def cap_per_domain_sql(
    id_col: str,
    domain_col: str,
    table: str,
    cap: int,
    blocklist: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`cap_per_domain` (QUALIFY form)."""
    where = ""
    if blocklist:
        quoted = ", ".join("'" + d.replace("'", "''") + "'" for d in blocklist)
        where = f"WHERE {domain_col} NOT IN ({quoted})"
    rank_h = stable_hash40_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {id_col}, {domain_col},
       CAST(row_number() OVER (
           PARTITION BY {domain_col}
           ORDER BY {rank_h}, {id_col}) AS INT) AS r
FROM {table}
{where}
QUALIFY r <= {cap}
"""


#: Multi-label public suffixes for the eTLD+1 default list — the
#: high-traffic subset of the Public Suffix List (publicsuffix.org,
#: MPL-licensed data; these ccTLD second-level registries are where
#: host-level grouping goes wrong: "a.co.uk" and "b.co.uk" are
#: DIFFERENT registrants, while "x.example.com" and "y.example.com"
#: are the same). Pass the full PSL for production crawls.
PUBLIC_SUFFIXES_2LABEL = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.br", "net.br", "org.br", "gov.br",
    "co.za", "org.za", "web.za",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "gob.mx", "org.mx",
    "co.kr", "or.kr", "go.kr",
    "com.tr", "org.tr", "gov.tr",
    "com.ar", "org.ar", "gob.ar",
    "com.sg", "com.hk", "com.tw", "com.my", "co.id", "co.th",
    "co.nz", "org.nz", "net.nz",
)


def registered_domain_expr(
    host: F.Column,
    suffixes_2label: tuple[str, ...] = PUBLIC_SUFFIXES_2LABEL,
) -> F.Column:
    """eTLD+1 (registered domain) from a hostname — the grouping key
    FineWeb-class curation actually caps on: host-level grouping
    splits one site across www./m./cdn. subdomains (diluting the
    cap) and, worse, treats every ``*.co.uk`` registrant as one
    domain if it naively takes the last two labels.

    Pure codegen (split + negative element_at + IN): no UDF, no
    join — the suffix check is a literal IN over the provided
    2-label public-suffix set. Rule: if the last two labels form a
    listed public suffix and a third label exists, the registered
    domain is the last THREE labels; otherwise the last two; a
    bare single-label host (localhost, intranet names) passes
    through. IPs are not special-cased (each IP is its own
    "domain", which is the right cap behavior anyway).

    At full-PSL scale (~9k multi-label rules) the IN list compiles
    to a sorted-array switch — still branch-free codegen; if the
    rule set ever outgrows literals, the same decision is a
    broadcast left-join on the 2/3-label candidate keys.
    """
    h = F.lower(host)
    parts = F.split(h, "\\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when((n >= 3) & last2.isin(*suffixes_2label), last3)
        .when(n >= 2, last2)
        .otherwise(h)
    )


def registered_domain_sql(
    host_expr: str,
    suffixes_2label: tuple[str, ...] = PUBLIC_SUFFIXES_2LABEL,
) -> str:
    """DuckDB twin of :func:`registered_domain_expr` (same rule,
    same suffix set, negative list indexing)."""
    quoted = ", ".join("'" + s + "'" for s in suffixes_2label)
    return f"""
CASE
  WHEN len(string_split(lower({host_expr}), '.')) >= 3
       AND string_split(lower({host_expr}), '.')[-2] || '.'
           || string_split(lower({host_expr}), '.')[-1]
           IN ({quoted})
  THEN string_split(lower({host_expr}), '.')[-3] || '.'
       || string_split(lower({host_expr}), '.')[-2] || '.'
       || string_split(lower({host_expr}), '.')[-1]
  WHEN len(string_split(lower({host_expr}), '.')) >= 2
  THEN string_split(lower({host_expr}), '.')[-2] || '.'
       || string_split(lower({host_expr}), '.')[-1]
  ELSE lower({host_expr})
END"""


# ── full Public Suffix List registered domains ──────────────────────
def parse_psl(text: str) -> tuple[str, ...]:
    """Parse the publicsuffix.org file format into a rule tuple:
    comment (``//``) and blank lines dropped, ``!`` exception and
    ``*.`` wildcard prefixes preserved, everything lowercased. The
    ICANN/private section split is intentionally ignored (cap
    grouping wants both)."""
    rules = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rules.append(line.lower())
    return tuple(rules)


def _psl_key_table(
    rules: tuple[str, ...],
) -> dict[str, list[int | None]]:
    """Normalize PSL rules into an equi-joinable lookup:
    ``key -> [exc_ps, wc_ps, ex_ps]`` where key is the EXACT label
    suffix a host candidate string can equal and each slot is the
    public-suffix label count that rule kind implies when its key
    matches (None = no such rule on this key):

    - exact rule ``co.uk``      → key ``co.uk``,  ex_ps = 2
    - wildcard ``*.ck``         → key ``ck``,     wc_ps = 2
      (matches only when the host ALSO has a label in the ``*``
      position — enforced by the ``n_labels >= wc_ps`` filter at
      match time, per the PSL spec's "* matches exactly one label")
    - exception ``!www.ck``     → key ``www.ck``, exc_ps = 1
      (public suffix = the rule minus its leftmost label)
    """
    table: dict[str, list[int | None]] = {}

    def slot(key: str) -> list[int | None]:
        return table.setdefault(key, [None, None, None])

    for rule in rules:
        if rule.startswith("!"):
            key = rule[1:]
            if len(key.split(".")) < 2:
                # the PSL spec guarantees exception rules modify a
                # multi-label wildcard rule; a one-label '!com' would
                # make exc_ps=0 and mint a bogus zero-label "public
                # suffix" — reject malformed input loudly
                raise ValueError(
                    f"malformed PSL exception rule {rule!r}: "
                    "exception rules must have >= 2 labels"
                )
            slot(key)[0] = len(key.split(".")) - 1
        elif rule.startswith("*."):
            key = rule[2:]
            slot(key)[1] = len(key.split(".")) + 1
        else:
            slot(rule)[2] = len(rule.split("."))
    return table


def registered_domain_psl(
    df: DataFrame,
    host_col: str,
    rules: tuple[str, ...],
    out_col: str = "reg_domain",
) -> DataFrame:
    """eTLD+1 under FULL Public Suffix List semantics — the
    production form of :func:`registered_domain_expr` (which stays
    the zero-dependency PSL-lite default): multi-label suffixes of
    any depth, ``*.``-wildcard rules, and ``!``-exception rules, per
    the publicsuffix.org algorithm (exception beats all; otherwise
    the matching rule with the most labels prevails; no match =
    the implicit ``*`` rule).

    Scale shape — ZERO Exchange: the rule table is driver-sized
    (~9.5k rules in the real PSL) and its keys have at most K labels
    (4 in the current PSL), so instead of exploding host-suffix
    candidates and re-grouping (a corpus shuffle), the plan runs K
    broadcast LEFT joins — one per candidate suffix length — and
    resolves precedence in a single codegen expression
    (``array_max`` over (priority, ps_labels) structs; exceptions
    carry a +1000 priority). The corpus never shuffles; the K joins
    are map-side against frames of ≤ |rules| rows.

    Convention carried over from the lite form: a host that IS a
    public suffix (no registrable label left — spec: undefined)
    passes through unchanged, as does a bare single-label host.

    Output: the input columns + ``out_col``.
    """
    table = _psl_key_table(rules)
    if not table:
        raise ValueError("rules must contain at least one PSL rule")
    spark = df.sparkSession
    max_k = max(len(k.split(".")) for k in table)

    h = F.lower(F.col(host_col))
    parts = F.split(h, "\\.")
    n = F.size(parts)
    out = df.withColumn("__psl_h", h).withColumn("__psl_n", n)
    cands = []
    for k in range(1, max_k + 1):
        rows = [
            (key, v[0], v[1], v[2])
            for key, v in table.items()
            if len(key.split(".")) == k
        ]
        if not rows:
            continue
        dim = spark.createDataFrame(
            rows,
            f"__psl_k{k} string, __exc{k} int, __wc{k} int, __ex{k} int",
        )
        suffix_k = F.concat_ws(
            ".", *[F.element_at(parts, -i) for i in range(k, 0, -1)]
        )
        out = out.withColumn(f"__psl_s{k}", F.when(n >= k, suffix_k)).join(
            F.broadcast(dim),
            F.col(f"__psl_s{k}") == F.col(f"__psl_k{k}"),
            "left",
        )
        cands.append(
            f"struct(1000 + __exc{k} AS prio, __exc{k} AS ps)"
        )
        cands.append(
            f"CASE WHEN __psl_n >= __wc{k} THEN "
            f"struct(__wc{k} AS prio, __wc{k} AS ps) END"
        )
        cands.append(f"struct(__ex{k} AS prio, __ex{k} AS ps)")
    winner = (
        "coalesce(array_max(filter(array("
        + ", ".join(cands)
        + "), s -> s.prio IS NOT NULL)), struct(1 AS prio, 1 AS ps))"
    )
    reg = F.expr(
        f"CASE WHEN __psl_n >= ({winner}).ps + 1 THEN "
        f"array_join(slice(split(__psl_h, '\\\\.'), "
        f"__psl_n - ({winner}).ps, ({winner}).ps + 1), '.') "
        "ELSE __psl_h END"
    )
    keep = [c for c in df.columns]
    return out.select(*keep, reg.alias(out_col))


def registered_domain_psl_sql(
    table_sql: str,
    host_col: str,
    rules: tuple[str, ...],
    out_col: str = "reg_domain",
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`registered_domain_psl`, generated from
    the SAME normalized key table: one VALUES dim per suffix length,
    the same K LEFT joins, the same struct-max precedence."""
    table = _psl_key_table(rules)
    max_k = max(len(k.split(".")) for k in table)
    if cols.strip() == "*":
        # column parity with the Spark operator (input columns only) —
        # strip the host-decomposition helpers, the
        # select_to_token_budget_sql discipline
        cols = "__t.* EXCLUDE (__h, __p, __n)"
    joins = []
    cands = []
    for k in range(1, max_k + 1):
        rows = [
            (key, v[0], v[1], v[2])
            for key, v in table.items()
            if len(key.split(".")) == k
        ]
        if not rows:
            continue
        vals = ", ".join(
            "('{}', {}, {}, {})".format(
                key.replace("'", "''"),
                "NULL" if e is None else e,
                "NULL" if w is None else w,
                "NULL" if x is None else x,
            )
            for key, e, w, x in rows
        )
        suffix_k = " || '.' || ".join(
            f"__p[-{i}]" for i in range(k, 0, -1)
        )
        joins.append(
            f"LEFT JOIN (VALUES {vals}) AS __d{k}"
            f"(__k{k}, __exc{k}, __wc{k}, __ex{k}) ON "
            f"(CASE WHEN __n >= {k} THEN {suffix_k} END) = __k{k}"
        )
        cands.append(
            f"CASE WHEN __exc{k} IS NOT NULL THEN "
            f"(1000 + __exc{k}, __exc{k}) END"
        )
        cands.append(
            f"CASE WHEN __wc{k} IS NOT NULL AND __n >= __wc{k} "
            f"THEN (__wc{k}, __wc{k}) END"
        )
        cands.append(
            f"CASE WHEN __ex{k} IS NOT NULL THEN "
            f"(__ex{k}, __ex{k}) END"
        )
    winner = (
        "coalesce(list_max(list_filter(["
        + ", ".join(cands)
        + "], s -> s IS NOT NULL)), (1, 1))"
    )
    return f"""
SELECT {cols},
       CASE WHEN __n >= ({winner})[2] + 1
            THEN array_to_string(
                   list_slice(__p, __n - ({winner})[2], __n), '.')
            ELSE __h END AS {out_col}
FROM (
  SELECT *, lower({host_col}) AS __h,
         string_split(lower({host_col}), '.') AS __p,
         len(string_split(lower({host_col}), '.')) AS __n
  FROM ({table_sql}) AS __s
) AS __t
{chr(10).join(joins)}
"""


# ── DSIR hashed-n-gram importance weights ───────────────────────────
def dsir_bucket_weights(
    df: DataFrame,
    text_col: str,
    target_col,
    num_buckets: int = DSIR_BUCKETS,
    quant_bits: int = DSIR_QUANT_BITS,
) -> DataFrame:
    """Train the DSIR importance model: per-hash-bucket integer
    log-ratio weights between the TARGET token distribution (rows
    where ``target_col`` is true — the high-quality reference slice)
    and the RAW distribution (every row).

    Returns (bucket, w) with exactly ``num_buckets`` rows — the
    bounded-state property that makes DSIR viable where a
    full-vocabulary model is not: at 100 TB the vocabulary is
    billions of tokens, the bucket table is still ``num_buckets``
    rows.

    w(b) = round(2^quant_bits * (log2 P(b|target) - log2 P(b|raw)))
    with add-one smoothing, arranged as
    log2((t_n+1)*(r_tot+B)) - log2((r_n+1)*(t_tot+B)) so every log2
    argument is a double product of exactly-representable ints (the
    token_log_odds overflow/stability pattern, textstats.py).

    One tokenize+explode pass trains both distributions via
    conditional aggregation; buckets never seen anywhere get weight
    0 by construction downstream (left join + coalesce), matching
    the smoothed estimate of "no evidence either way".
    """
    occ = df.select(
        F.coalesce(target_col.cast("boolean"), F.lit(False)).alias("__t"),
        F.explode(_tokens(text_col)).alias("__tok"),
    ).select(
        "__t",
        F.pmod(stable_hash40(F.col("__tok")), F.lit(num_buckets)).alias("bucket"),
    )
    counts = occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("t_n"),
        F.count(F.lit(1)).alias("r_n"),
    )
    # Totals over an UNBOUNDED window rather than the
    # agg+crossJoin(broadcast) pattern token_log_odds uses: counts is
    # <= num_buckets rows BY CONSTRUCTION, so a single-partition
    # window is free here and saves both a second evaluation of the
    # counts lineage (one full corpus scan) and a BNLJ node. The
    # window form would be wrong for token_log_odds, whose vocabulary
    # frame is unbounded.
    everything = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    totals = counts.select(
        "bucket",
        "t_n",
        "r_n",
        F.sum("t_n").over(everything).alias("__tt"),
        F.sum("r_n").over(everything).alias("__rt"),
    )
    scale = 1 << quant_bits
    b = F.lit(num_buckets)
    w = F.round(
        (
            F.log2(
                (F.col("t_n") + 1).cast("double")
                * (F.col("__rt") + b).cast("double")
            )
            - F.log2(
                (F.col("r_n") + 1).cast("double")
                * (F.col("__tt") + b).cast("double")
            )
        )
        * F.lit(float(scale))
    ).cast("bigint")
    return totals.select("bucket", w.alias("w"))


def dsir_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = DSIR_BUCKETS,
    quant_bits: int = DSIR_QUANT_BITS,
) -> DataFrame:
    """Apply a :func:`dsir_bucket_weights` model: per-document integer
    importance weight (sum of bucket weights over token occurrences).

    Output: (id, n_tokens, dsir_q, avg_dsir) — dsir_q is the pure
    int64 order-independent sum; avg_dsir the length-normalized
    double a resampler thresholds on.

    The weights side is ``num_buckets`` rows — broadcast-joined, so
    the only shuffle is the per-doc aggregation.
    """
    occ = df.select(
        F.col(id_col),
        F.explode(_tokens(text_col)).alias("__tok"),
    ).select(
        id_col,
        F.pmod(stable_hash40(F.col("__tok")), F.lit(num_buckets)).alias("bucket"),
    )
    scored = occ.join(F.broadcast(weights), "bucket", "left").withColumn(
        "__w", F.coalesce(F.col("w"), F.lit(0))
    )
    scale = 1 << quant_bits
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__w").alias("dsir_q"),
        )
        .withColumn(
            "avg_dsir",
            F.col("dsir_q").cast("double")
            / F.lit(float(scale))
            / F.col("n_tokens").cast("double"),
        )
    )


def dsir_topk(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """The resampling step as deterministic selection: top-``k``
    documents by importance weight, id as tiebreak. Compiles to
    TakeOrderedAndProject — map-side top-k, no full sort, no
    single-partition window.
    """
    return scored.orderBy(F.desc("dsir_q"), F.asc(id_col)).limit(k)


def dsir_sql(
    id_col: str,
    text_col: str,
    target_sql: str,
    table: str,
    num_buckets: int = DSIR_BUCKETS,
    quant_bits: int = DSIR_QUANT_BITS,
    topk: int | None = None,
) -> str:
    """DuckDB twin of train+score (+ optional top-k): identical
    tokenization, bucket hash, smoothing, and quantization."""
    scale = 1 << quant_bits
    h = stable_hash40_sql("token")
    limit = (
        f"ORDER BY dsir_q DESC, {id_col} LIMIT {topk}" if topk else ""
    )
    return f"""
WITH occ AS (
  SELECT {id_col},
         ({target_sql}) AS t,
         {h} % {num_buckets} AS bucket
  FROM (
    SELECT *,
           unnest(list_filter(
               string_split_regex(lower({text_col}), '{_TOKEN_SPLIT}'),
               x -> x <> '')) AS token
    FROM {table})),
counts AS (
  SELECT bucket,
         SUM(CASE WHEN t THEN 1 ELSE 0 END) AS t_n,
         COUNT(*) AS r_n
  FROM occ GROUP BY 1),
tot AS (SELECT SUM(t_n) AS tt, SUM(r_n) AS rt FROM counts),
wts AS (
  SELECT bucket,
         CAST(round((log2(CAST(t_n + 1 AS DOUBLE)
                          * CAST(rt + {num_buckets} AS DOUBLE))
                   - log2(CAST(r_n + 1 AS DOUBLE)
                          * CAST(tt + {num_buckets} AS DOUBLE)))
                    * {float(scale)}) AS BIGINT) AS w
  FROM counts CROSS JOIN tot)
SELECT {id_col},
       COUNT(*) AS n_tokens,
       CAST(SUM(COALESCE(w, 0)) AS BIGINT) AS dsir_q,
       CAST(SUM(COALESCE(w, 0)) AS DOUBLE) / {float(scale)}
           / COUNT(*) AS avg_dsir
FROM occ LEFT JOIN wts USING (bucket)
GROUP BY 1
{limit}
"""


# ── URL canonicalization + URL-keyed dedup (FineWeb step 1) ─────────
#: query parameters that never distinguish content — tracking ids.
URL_TRACKING_PARAM_PAT = (
    r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)="
)
_SCHEME_PAT = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_PAT = r"\?([^#]*)"


def normalize_url_expr(url: F.Column) -> F.Column:
    """Canonical URL as one Column expression: fragment dropped,
    scheme+host lowercased, default port stripped (:443 on https,
    :80 on http), trailing path slashes removed, tracking query
    params (``URL_TRACKING_PARAM_PAT``) filtered out with the
    remaining params left in page order (FineWeb does not re-sort
    params; neither do we — reordering is a different URL author's
    choice we must not merge). Unparseable urls (no ``scheme://``)
    normalize to NULL.

    Deliberately composed from regexp_extract + CASE + list_filter —
    NO backreference replacements, because Java spells them ``$1``
    and RE2 ``\\1``: every pattern here is valid and equivalent in
    both engines, keeping the oracle byte-exact (same discipline as
    operators/htmlextract.py).
    """
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_PAT, 1))
    auth = F.lower(F.regexp_extract(nofrag, _AUTH_PAT, 1))
    # port strip without backrefs: CASE on (scheme, suffix)
    auth = F.when(
        (scheme == "https") & auth.rlike(r":443$"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).when(
        (scheme == "http") & auth.rlike(r":80$"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).otherwise(auth)
    path = F.regexp_replace(
        F.regexp_extract(nofrag, _PATH_PAT, 1), r"/+$", ""
    )
    query = F.array_join(
        F.filter(
            F.split(F.regexp_extract(nofrag, _QUERY_PAT, 1), "&"),
            lambda t: (t != "") & ~t.rlike(URL_TRACKING_PARAM_PAT),
        ),
        "&",
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        rebuilt
    )


def dedup_by_url(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """One kept document per canonical URL (smallest id wins —
    deterministic across runs and engines): FineWeb's first dedup
    pass, upstream of any content hashing. Declared as
    ``row_number() <= 1`` per normalized URL so Catalyst plants
    WindowGroupLimit(Partial): each map task forwards ONE candidate
    per URL before the shuffle — a hot URL (the re-crawled homepage)
    ships partitions rows, not its full occurrence count. Rows with
    unparseable URLs are dropped (they have no dedup key; route them
    through a quarantine branch if they must be kept).

    Output: (id, url_norm) for every kept row.
    """
    out = df.select(
        F.col(id_col), normalize_url_expr(F.col(url_col)).alias("url_norm")
    ).where(F.col("url_norm").isNotNull())
    w = Window.partitionBy("url_norm").orderBy(F.col(id_col))
    return (
        out.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(id_col, "url_norm")
    )


def normalize_url_expr_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_url_expr`, generated from the
    same pattern constants."""
    nofrag = f"regexp_replace({expr}, '#.*$', '', 'g')"
    scheme = f"lower(regexp_extract({nofrag}, '{_SCHEME_PAT}', 1))"
    auth0 = f"lower(regexp_extract({nofrag}, '{_AUTH_PAT}', 1))"
    auth = f"""CASE
      WHEN {scheme} = 'https' AND regexp_matches({auth0}, ':443$')
        THEN substring({auth0}, 1, length({auth0}) - 4)
      WHEN {scheme} = 'http' AND regexp_matches({auth0}, ':80$')
        THEN substring({auth0}, 1, length({auth0}) - 3)
      ELSE {auth0} END"""
    path = (
        f"regexp_replace(regexp_extract({nofrag}, '{_PATH_PAT}', 1),"
        " '/+$', '', 'g')"
    )
    tracking = URL_TRACKING_PARAM_PAT.replace("'", "''")
    query = (
        f"list_aggregate(list_filter("
        f"string_split(regexp_extract({nofrag}, '{_QUERY_PAT}', 1), '&'),"
        f" t -> t <> '' AND NOT regexp_matches(t, '{tracking}')),"
        " 'string_agg', '&')"
    )
    query = f"COALESCE({query}, '')"
    return f"""CASE WHEN {scheme} = '' THEN NULL
      ELSE {scheme} || '://' || {auth} || {path}
           || CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END
      END"""


def dedup_by_url_sql(table_sql: str, id_col: str, url_expr: str) -> str:
    """DuckDB twin of :func:`dedup_by_url` (QUALIFY form)."""
    norm = normalize_url_expr_sql(url_expr)
    return f"""
SELECT {id_col}, url_norm
FROM (
  SELECT {id_col}, {norm} AS url_norm
  FROM ({table_sql}) AS __docs
) AS __normed
WHERE url_norm IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY url_norm ORDER BY {id_col}) = 1
"""
