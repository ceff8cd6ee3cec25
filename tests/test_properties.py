"""Property-style tests: salting equivalence, escape parity with the
reference implementation, closure soundness — each property checked
over batches of generated inputs (one Spark action per batch)."""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from umls2rdf_spark.functions.text import rdf_escape, turtle_literal
from umls2rdf_spark.operators.hierarchy import transitive_closure
from umls2rdf_spark.operators.skew import salted_agg, salted_join

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def reference_escape(s: str) -> str:
    """escape() from umls2rdf.py:103 — the parity target."""
    return s.replace("\\", "\\\\").replace('"', '\\"')


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters=["\x00"]
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_rdf_escape_matches_reference(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [r["e"] for r in df.select(rdf_escape(F.col("s")).alias("e")).collect()]
    assert got == [reference_escape(t) for t in texts]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters=["\x00"]),
            max_size=30,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_turtle_literal_quoting(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [
        r["lit"]
        for r in df.select(
            turtle_literal(F.col("s"), lang=F.lit("en")).alias("lit")
        ).collect()
    ]
    for t, lit in zip(texts, got):
        esc = reference_escape(t)
        expected = (
            f'"""{esc}"""@en' if "\n" in esc else f'"{esc}"@en'
        )
        assert lit == expected


def test_salted_agg_equals_plain_agg(spark):
    rng = random.Random(7)
    rows = [
        # heavy skew: 80% of rows on key 0
        (0 if rng.random() < 0.8 else rng.randrange(20), rng.randrange(1000))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "k int, v long")
    plain = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"])
        for r in salted_agg(
            df,
            ["k"],
            partial_aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pn")],
            merge_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
            salt_on="v",
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    rng = random.Random(11)
    fact = spark.createDataFrame(
        [(rng.randrange(5), i) for i in range(2000)], "k int, fid long"
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(5)], "k int, label string"
    )
    plain = sorted(
        (r["fid"], r["label"]) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r["fid"], r["label"])
        for r in salted_join(fact, dim, on="k", salt_factor=8).collect()
    )
    assert salted == plain


def test_transitive_closure_sound_and_complete(spark):
    rng = random.Random(13)
    # random forest: parent(i) < i, ~60 nodes
    edges = [(i, rng.randrange(i)) for i in range(1, 60) if rng.random() < 0.8]
    df = spark.createDataFrame(edges, "child long, parent long")
    got = {
        (r["child"], r["ancestor"]) for r in transitive_closure(df).collect()
    }
    # python reference closure
    parents = {}
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
    expected = set()
    for c in parents:
        frontier = set(parents[c])
        seen = set()
        while frontier:
            n = frontier.pop()
            if n in seen:
                continue
            seen.add(n)
            expected.add((c, n))
            frontier |= parents.get(n, set())
    assert got == expected


def test_transitive_closure_frontier_equals_doubling(spark):
    # deep chain + random DAG cross-edges: exercises multi-round
    # deltas, where the frontier path diverges from doubling if the
    # delta recurrence misses a composition
    rng = random.Random(29)
    edges = [(i, i - 1) for i in range(1, 40)]
    edges += [(i, rng.randrange(i)) for i in range(2, 40) if rng.random() < 0.3]
    df = spark.createDataFrame(edges, "child long, parent long")
    frontier = {
        (r["child"], r["ancestor"])
        for r in transitive_closure(df, strategy="frontier").collect()
    }
    doubling = {
        (r["child"], r["ancestor"])
        for r in transitive_closure(df, strategy="doubling").collect()
    }
    assert frontier == doubling
    # chain of 40: node 39 has 39 ancestors
    assert (39, 0) in frontier


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=5),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=4),
)
@settings(**_SETTINGS)
def test_chunk_documents_roundtrip(spark, docs, chunk_tokens, overlap):
    """Dropping the first `overlap` tokens of every chunk after the
    first reconstructs the original token stream exactly — no token
    lost or duplicated by the windowing."""
    from umls2rdf_spark.operators.corpus import chunk_documents

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = chunk_documents(
        df, "id", "text", chunk_tokens=chunk_tokens, overlap=overlap
    )
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["id"], []).append(r)
    for i, words in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        rebuilt = []
        for j, r in enumerate(chunks):
            toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
            rebuilt.extend(toks if j == 0 else toks[overlap:])
        # trailing fully-contained window may re-emit suffix tokens;
        # the reconstruction must be a prefix-complete match
        assert rebuilt[: len(words)] == words
        assert len(rebuilt) >= len(words)


@given(st.integers(min_value=2, max_value=30))
@settings(**_SETTINGS)
def test_connected_components_on_random_graphs(spark, n_edges):
    """CC labels computed by the star algorithm equal a driver-side
    union-find ground truth on random small graphs."""
    from umls2rdf_spark.operators.dedup import connected_components

    rng = random.Random(n_edges)
    nodes = list(range(1, 15))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(n_edges)
    ]
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in nodes}

    e_df = spark.createDataFrame(edges, "id_a long, id_b long")
    n_df = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {
        r["node"]: r["label"]
        for r in connected_components(e_df, n_df).collect()
    }
    assert got == expected


@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),  # id
            st.integers(min_value=0, max_value=37),      # ntok
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    seq_len=st.integers(min_value=1, max_value=23),
    shards=st.integers(min_value=1, max_value=9),
)
@settings(**_SETTINGS)
def test_pack_sequences_matches_replica(spark, items, seq_len, shards):
    """pack_sequences equals the pure-Python concat-and-chop replica
    for arbitrary (id, ntok) inputs, sequence lengths and shard
    counts — including empty inputs, all-zero token counts and
    single-shard degenerate cases."""
    import hashlib

    from umls2rdf_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(items, "id long, ntok long")
    got = sorted(
        (r["id"], r["seq_id"], r["tok_start"], r["tok_end"], r["seq_off"])
        for r in pack_sequences(
            df, "id", "ntok", seq_len=seq_len, shards=shards
        ).collect()
    )

    def h40(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:10], 16)

    ordered = sorted(
        ((i, n) for i, n in items if n > 0),
        key=lambda t: (h40(t[0]) % shards, t[0]),
    )
    want, gb = [], 0
    for i, n in ordered:
        for s in range(gb // seq_len, (gb + n - 1) // seq_len + 1):
            a = max(0, s * seq_len - gb)
            b = min(n, (s + 1) * seq_len - gb)
            want.append((i, s, a, b, gb + a - s * seq_len))
        gb += n
    assert got == sorted(want)


def _py_remove_repeated(docs: dict[int, str], L: int) -> dict[int, tuple]:
    """Pure-Python replica of remove_repeated_substrings."""
    toks = {d: [t for t in s.split(" ") if t] for d, s in docs.items()}
    from collections import Counter

    wins = Counter()
    for t in toks.values():
        for p in range(max(len(t) - L + 1, 0)):
            wins[" ".join(t[p:p + L])] += 1
    out = {}
    for d, t in toks.items():
        rep = sorted(
            p for p in range(max(len(t) - L + 1, 0))
            if wins[" ".join(t[p:p + L])] > 1
        )
        spans = []
        for p in rep:
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + L))
            else:
                spans.append((p, p + L))
        kept = [
            tok for i, tok in enumerate(t)
            if not any(s <= i < e for s, e in spans)
        ]
        out[d] = (" ".join(kept), len(t) - len(kept))
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_remove_repeated_substrings_matches_replica(spark, token_docs, L):
    """Over random tiny-alphabet corpora (repeats guaranteed), the
    Spark pipeline must equal the straightforward Python replica —
    window counting, interval merge and token cutting all at once."""
    from umls2rdf_spark.operators.substrings import (
        remove_repeated_substrings,
    )

    docs = {i: " ".join(t) for i, t in enumerate(token_docs)}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in remove_repeated_substrings(
            df, "doc_id", "text", min_len=L
        ).collect()
    }
    assert got == _py_remove_repeated(docs, L)


def _py_remove_boiler(docs: dict[int, str], W: int, K: int) -> dict[int, tuple]:
    """Pure-Python replica of remove_boilerplate_segments."""
    toks = {d: [t for t in s.split(" ") if t] for d, s in docs.items()}
    from collections import defaultdict

    seen: dict[str, set] = defaultdict(set)
    segged = {}
    for d, t in toks.items():
        segs = [
            " ".join(t[p:p + W])
            for p in range(0, max(len(t) - 1, 0) + 1, W)
        ]
        segged[d] = segs
        for s in segs:
            seen[s].add(d)
    out = {}
    for d, segs in segged.items():
        kept = [s for s in segs if len(seen[s]) <= K]
        out[d] = (" ".join(kept), len(segs) - len(kept))
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z"]),
            min_size=0,
            max_size=15,
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_remove_boilerplate_matches_replica(spark, token_docs, W, K):
    from umls2rdf_spark.operators.corpus import remove_boilerplate_segments

    docs = {i: " ".join(t) for i, t in enumerate(token_docs)}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_dropped"])
        for r in remove_boilerplate_segments(
            df, "doc_id", "text", segment_words=W, max_docs=K
        ).collect()
    }
    assert got == _py_remove_boiler(docs, W, K)


@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),  # id
            st.integers(min_value=0, max_value=50),      # ntok
            st.integers(min_value=0, max_value=5),       # score class
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(min_value=0, max_value=800),
    shards=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_token_budget_matches_replica(spark, items, budget, shards):
    """select_to_token_budget equals the pure-Python greedy prefix
    over (score DESC, id-hash shard, id) for arbitrary inputs —
    including empty frames, zero budgets, zero-token rows and heavy
    score-class collisions (the two-level decomposition's edge
    cases)."""
    import hashlib

    from umls2rdf_spark.operators.selection import select_to_token_budget

    df = spark.createDataFrame(items, "id long, ntok long, score long")
    got = sorted(
        r["id"]
        for r in select_to_token_budget(
            df, "id", "ntok", "score", budget, shards=shards
        ).collect()
    )

    def h40(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:10], 16)

    order = sorted(items, key=lambda t: (-t[2], h40(t[0]) % shards, t[0]))
    exp, cum = [], 0
    for i, n, _ in order:
        cum += n
        if cum <= budget:
            exp.append(i)
    assert got == sorted(exp)


@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),           # id
            st.sampled_from(["web", "code", "wiki", "books"]),    # dom
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    parts=st.fixed_dictionaries(
        {},
        optional={
            "web": st.integers(min_value=1, max_value=5),
            "code": st.integers(min_value=1, max_value=5),
            "wiki": st.integers(min_value=1, max_value=5),
        },
    ),
)
@settings(**_SETTINGS)
def test_resample_mixture_matches_replica(spark, items, parts):
    """resample_mixture equals the pure-Python sizing + hash
    membership replica for arbitrary domain distributions and weight
    dicts (domains can be absent from the data, the dict, or both)."""
    import hashlib

    from collections import Counter

    from umls2rdf_spark.operators.selection import resample_mixture

    if not parts:
        parts = {"web": 1}
    precision = 1_000_000
    df = spark.createDataFrame(items, "id long, dom string")
    got = sorted(
        r["id"]
        for r in resample_mixture(
            df, "dom", "id", parts, precision=precision
        ).collect()
    )

    def h40(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:10], 16)

    counts = Counter(d for _, d in items)
    P = sum(parts.values())
    weighted = [d for d in counts if parts.get(d, 0) > 0]
    if weighted:
        T = min(counts[d] * P // parts[d] for d in weighted)
        exp = [
            i
            for i, d in items
            if parts.get(d, 0) > 0
            and h40(i) % precision
            < parts[d] * T * precision // (P * counts[d])
        ]
    else:
        exp = []
    assert got == sorted(exp)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # id
            st.sampled_from(["a", "b", "c", "d"]),        # domain
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5),               # cap
)
@settings(**_SETTINGS)
def test_cap_per_domain_matches_replica(spark, rows, cap):
    """cap_per_domain vs a plain-Python replica of its contract:
    within each non-blocklisted domain, keep the ``cap`` lowest rows
    by (stable_hash40(str(id)), id), ranked 1..cap."""
    from umls2rdf_spark.functions.hashing import stable_hash40_py
    from umls2rdf_spark.operators.webcurate import cap_per_domain

    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        map(
            tuple,
            cap_per_domain(
                df, "doc_id", "source", cap=cap, blocklist=["d"]
            ).collect(),
        )
    )
    by_dom: dict[str, list[tuple[int, int]]] = {}
    for i, dom in rows:
        if dom == "d":
            continue
        by_dom.setdefault(dom, []).append(
            (stable_hash40_py(str(i)), i)
        )
    expected = sorted(
        (i, dom, r + 1)
        for dom, members in by_dom.items()
        for r, (_, i) in enumerate(sorted(members)[:cap])
    )
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1_000),
            st.text(
                alphabet="ab1 .,XZ",
                max_size=30,
            ),
            st.booleans(),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_dsir_matches_python_replica(spark, rows):
    """dsir train+score vs a plain-Python replica: same tokenizer
    (lowercase alnum runs), same md5 bucket hash, same smoothing and
    int64 quantization — over adversarial text (punctuation, case,
    empties)."""
    import math
    import re

    from umls2rdf_spark.functions.hashing import stable_hash40_py
    from umls2rdf_spark.operators.webcurate import (
        DSIR_QUANT_BITS,
        dsir_bucket_weights,
        dsir_score,
    )

    B = 256
    df = spark.createDataFrame(
        rows, "doc_id long, text string, tgt boolean"
    )
    wts = dsir_bucket_weights(df, "text", F.col("tgt"), num_buckets=B)
    got = {
        r.doc_id: (r.n_tokens, r.dsir_q)
        for r in dsir_score(df, wts, "doc_id", "text", num_buckets=B)
        .collect()
    }

    def toks(t):
        return [x for x in re.split("[^a-z0-9]+", t.lower()) if x]

    counts: dict[int, list[int]] = {}
    for _, text, tgt in rows:
        for tok in toks(text):
            b = stable_hash40_py(tok) % B
            c = counts.setdefault(b, [0, 0])
            c[0] += 1 if tgt else 0
            c[1] += 1
    tt = sum(c[0] for c in counts.values())
    rt = sum(c[1] for c in counts.values())
    scale = 1 << DSIR_QUANT_BITS
    def round_half_away(x: float) -> int:
        # Python round() is banker's; Spark/DuckDB round() is half
        # AWAY FROM ZERO (so e.g. -2.5 -> -3, not -2)
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    w = {
        b: round_half_away(
            (
                math.log2((c[0] + 1) * float(rt + B))
                - math.log2((c[1] + 1) * float(tt + B))
            )
            * scale
        )
        for b, c in counts.items()
    }
    expected = {}
    for i, text, _ in rows:
        tk = toks(text)
        if not tk:
            continue  # no token rows -> doc absent from occ
        expected[i] = (
            len(tk),
            sum(w.get(stable_hash40_py(t) % B, 0) for t in tk),
        )
    assert got == expected


@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),  # id
            st.integers(min_value=0, max_value=50),      # weight
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=5),
)
@settings(**_SETTINGS)
def test_weighted_sample_matches_replica(spark, items, k, seed):
    """weighted_sample equals the pure-Python systematic rule over
    the (hash(seed|id), id) order — including empty frames,
    all-zero weights and weights heavier than W/k (the
    without-replacement absorption case)."""
    from umls2rdf_spark.functions.hashing import stable_hash40_py
    from umls2rdf_spark.operators.selection import weighted_sample

    df = spark.createDataFrame(items, "id long, w long")
    got = sorted(
        r["id"] for r in weighted_sample(df, "id", "w", k, seed).collect()
    )

    W = sum(w for _, w in items)
    if W == 0:
        assert got == []
        return
    order = sorted(
        items, key=lambda t: (stable_hash40_py(f"{seed}|{t[0]}"), t[0])
    )
    exp, cum = [], 0
    for i, w in order:
        cum += w
        if (k * cum) // W > (k * (cum - w)) // W:
            exp.append(i)
    assert got == sorted(exp)
    assert len(exp) <= k


@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),   # id
            st.integers(min_value=0, max_value=5),        # score
            st.sampled_from(["a", "b", "c"]),             # group
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
)
@settings(**_SETTINGS)
def test_score_percentile_matches_replica(spark, items):
    """score_percentile equals the strictly-below/n ppm rule per
    group for arbitrary inputs (ties, singleton groups, one-score
    groups)."""
    from umls2rdf_spark.operators.selection import score_percentile

    df = spark.createDataFrame(items, "id long, s long, g string")
    got = {
        r["id"]: r["pct_ppm"]
        for r in score_percentile(df, "id", "s", "g").collect()
    }
    exp = {}
    for i, s, g in items:
        grp = [s2 for _, s2, g2 in items if g2 == g]
        exp[i] = sum(1 for v in grp if v < s) * 1_000_000 // len(grp)
    assert got == exp


_UNICODE_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0x400, max_codepoint=0x4FF),   # Cyrillic
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4FFF), # CJK
        st.sampled_from("\t\n\r"),
    ),
    max_size=40,
)


@given(
    texts=st.lists(_UNICODE_TEXT, min_size=1, max_size=8),
)
@settings(**_SETTINGS)
def test_char_profile_unicode_dialect_fuzz(spark, texts):
    """C53's regex patterns must mean the same thing to Java regex
    and RE2 for ARBITRARY mixed-script text — the dialect-parity
    risk a fixed fixture can't cover. Compares full frames engine
    vs engine."""
    import duckdb

    from umls2rdf_spark.operators.textstats import (
        char_profile,
        char_profile_sql,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(
        tuple(str(v) for v in r)
        for r in char_profile(df, "id", "text").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    cols = [
        "id", "n_chars", "non_ascii_ppm", "letter_ppm", "digit_ppm",
        "upper_ppm", "white_ppm", "cyrillic_ppm", "cjk_ppm",
        "dom_script", "mostly_ascii",
    ]
    sel = ", ".join(cols)
    exp = sorted(
        tuple("None" if v is None else str(v) for v in r)
        for r in con.execute(
            f"SELECT {sel} FROM ("
            + char_profile_sql("SELECT * FROM t", "id", "text")
            + ") q"
        ).fetchall()
    )
    assert got == exp


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab1 .-"), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=6,
    ),
)
@settings(**_SETTINGS)
def test_kn_surprisal_replica_fuzz(spark, texts):
    """KN quantization chain vs the plain-Python replica over
    arbitrary tiny corpora (single-token docs, empty docs, repeated
    bigrams, punctuation-only)."""
    import math
    import re
    from collections import Counter

    from umls2rdf_spark.operators.textstats import kn_surprisal

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.kn_q)
        for r in kn_surprisal(df, "doc_id", "text").collect()
    }

    occ = []
    for did, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        occ += [(did, a, b) for a, b in zip(toks, toks[1:])]
    big = Counter((a, b) for _, a, b in occ)
    if not big:
        assert got == {}
        return
    cc: Counter = Counter()
    n1: Counter = Counter()
    n2: Counter = Counter()
    for (a, b), c in big.items():
        cc[a] += c
        n1[a] += 1
        n2[b] += 1
    B = len(big)
    scale = 1 << 20
    wq = {}
    for (a, b), c in big.items():
        num = float(B) * float(4 * c - 3) + float(3 * n1[a]) * float(n2[b])
        den = float(cc[a]) * float(4 * B)
        wq[(a, b)] = int(round((math.log2(den) - math.log2(num)) * scale))
    exp: dict = {}
    for did, a, b in occ:
        n, s = exp.get(did, (0, 0))
        exp[did] = (n + 1, s + wq[(a, b)])
    assert got == exp


@given(
    docs=st.lists(
        st.text(alphabet=st.sampled_from("abc "), min_size=0, max_size=40),
        min_size=2,
        max_size=5,
    ),
)
@settings(**_SETTINGS)
def test_containment_invariants_fuzz(spark, docs):
    """For every pair: containment_a >= jaccard, containment_b >=
    jaccard, all in [0, 1], and inter <= min(sz_a, sz_b) — Broder's
    basic inequalities over arbitrary word soup."""
    from umls2rdf_spark.operators.dedup import containment_verify_pairs

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(a, b) for a in range(len(docs)) for b in range(len(docs)) if a < b],
        "id_a long, id_b long",
    )
    for r in containment_verify_pairs(
        df, pairs, "doc_id", "text", shingle_n=2
    ).collect():
        assert r.inter <= min(r.sz_a, r.sz_b)
        for c in (r.jaccard, r.containment_a, r.containment_b):
            assert c is None or 0.0 <= c <= 1.0
        if r.jaccard is not None:
            if r.containment_a is not None:
                assert r.containment_a >= r.jaccard - 1e-12
            if r.containment_b is not None:
                assert r.containment_b >= r.jaccard - 1e-12


# ── full-PSL registered domains vs an independent replica ──────────
def _psl_reference(host: str, rules: tuple[str, ...]) -> str:
    """Independent pure-Python publicsuffix.org algorithm: find every
    matching rule ('*' matches exactly one label; a rule matches if
    its labels suffix-match the host's), exceptions beat all (public
    suffix = exception minus its leftmost label), otherwise the
    matching rule with the most labels, default '*'. Registered
    domain = PS + 1 label; host == PS or bare label passes through
    (the repo convention)."""
    labels = host.lower().split(".")
    n = len(labels)
    best_ps = 1  # implicit * rule
    exc_ps = None
    for rule in rules:
        exc = rule.startswith("!")
        r = rule[1:] if exc else rule
        rl = r.split(".")
        m = len(rl)
        if m > n:
            continue
        tail = labels[n - m:]
        ok = all(a == "*" or a == b for a, b in zip(rl, tail))
        if not ok:
            continue
        if exc:
            ps = m - 1
            if exc_ps is None or ps > exc_ps:
                exc_ps = ps
        else:
            best_ps = max(best_ps, m)
    ps = exc_ps if exc_ps is not None else best_ps
    if n >= ps + 1:
        return ".".join(labels[n - ps - 1:])
    return host.lower()


@given(
    st.lists(
        st.builds(
            lambda kind, labs: kind + ".".join(labs)
            if kind != "*."
            else "*." + ".".join(labs),
            st.sampled_from(["", "", "", "*.", "!"]),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd", "net"]),
                min_size=1,
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "net", "www", "x"]),
            min_size=1,
            max_size=5,
        ).map(".".join),
        min_size=1,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_registered_domain_psl_matches_reference_replica(
    spark, rules, hosts
):
    from umls2rdf_spark.operators.webcurate import (
        registered_domain_psl,
    )

    # exception rules always have >= 2 labels per the PSL spec;
    # _psl_key_table REJECTS one-label '!x' (ValueError) rather than
    # miscomputing a zero-label "public suffix" — pin the raise, then
    # proceed with the valid subset
    one_label_exc = [
        r for r in rules if r.startswith("!") and "." not in r
    ]
    if one_label_exc:
        with pytest.raises(ValueError, match="exception rule"):
            registered_domain_psl(
                spark.createDataFrame([("x.net",)], ["host"]),
                "host",
                tuple(rules),
            )
    rules = tuple(
        r for r in rules
        if not (r.startswith("!") and "." not in r)
    ) or ("net",)
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "id long, host string"
    )
    got = {
        r["id"]: r["reg_domain"]
        for r in registered_domain_psl(df, "host", rules).collect()
    }
    for i, h in enumerate(hosts):
        want = _psl_reference(h, rules)
        assert got[i] == want, (h, rules, got[i], want)


# ── unigram-LM trainer vs the plain-Python replica on fuzz corpora ──
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=7),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_unigram_trainer_matches_replica_on_fuzz_corpora(
    spark, texts, rounds
):
    """Tiny alphabet forces heavy substring collisions — the
    adversarial case for seed ranking, tie-breaks, and the greedy
    walk. Model AND per-word segmentation must equal the independent
    replica exactly."""
    from tests.test_unigram import _ref_train
    from umls2rdf_spark.operators.unigram import (
        unigram_lm_train,
        unigram_vocab_after,
    )

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    model_df = unigram_lm_train(
        df, "text", vocab_size=8, rounds=rounds, seed_size=16
    )
    got_model = {
        r["piece"]: (r["cnt"], r["cost_q"]) for r in model_df.collect()
    }
    model, seg, wf = _ref_train(
        texts, vocab_size=8, rounds=rounds, seed_size=16
    )
    assert got_model == model
    got_seg = {
        r["word"]: r["n_pieces"]
        for r in unigram_vocab_after(
            df, "text", vocab_size=8, rounds=rounds, seed_size=16,
            model=model_df,
        ).collect()
    }
    assert got_seg == {w: len(seg[w]) for w in wf}
