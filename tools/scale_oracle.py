"""10x correctness gate: re-run the DuckDB oracle compare on a 10x
replica of sf0.1, not just re-time it.

Wall-clock scaling (SCALE.md) shows the plans stay cheap at 10x, but
the salted/adaptive paths (AQE skew splits, LSH bucket salting,
stable-id sharding, counting-percentile cut search) change BEHAVIOR
with data size — that is exactly where partition-order or
boundary-condition bugs would hide while the sf0.01 gate stays green.
This tool builds the replica, runs each selected queries() key on it
with Spark AND its oracle_sql() with DuckDB on the SAME parquet
files, and compares row count, column names, and a canonical value
checksum — the same three facts the driver's CORRECTNESS gate records.

Replica construction (key-shifted union, the same scheme as the
SCALE.md timing sweep): ``copies`` shifted copies of every fact/doc
table, surrogate int64 keys offset by ``copy_index * KEY_OFFSET`` so
referential joins stay consistent within a copy and never collide
across copies; the tiny dims (nation, region) stay single-copy and
nationkey references are left unshifted. Text/vector payloads are
replicated verbatim — dedup-family ops therefore see every document
exactly ``copies`` times, a deliberately adversarial duplicate
distribution for the dedup/LSH paths.

Value canonicalization (applied identically to both sides, so any
engine rounding difference within 1e-6 is forgiven, matching the
composed-demo convention in plans/completion.py): doubles ->
floor(x * 1e6) as int; timestamps -> ISO string; lists canonicalized
element-wise; NULL -> sentinel. Columns sorted by name, rows sorted
as strings, md5 over the concatenation.

Usage:
    python tools/scale_oracle.py [--copies 10] [--src /root/testdata/sf0.1]
        [--dst /tmp/sf1x] [--keys k1,k2,...] [--markdown]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

KEY_OFFSET = 1_000_000_000

# int64 surrogate keys to shift per table; dims absent here are
# copied once, unshifted.
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
SINGLE_COPY = ["nation", "region"]

# The scale-sensitive keys: every query whose plan has an adaptive /
# salted / iterative / counting path, plus the composed demos that
# carry the tests-only SURVEY rows.
DEFAULT_KEYS = [
    "transitive_closure",
    "corpus_prep",
    "dedup_clusters",
    "ann_ivf_topk",
    "asof_join",
    "ann_lsh_topk",
    "ann_cosine_topk",
    "ngram_jaccard",
    "dedup_embedding",
    "histogram",
    "skew_salted_agg",
    "tpch_completion",
    "text_scoring",
    "event_windows",
    "pq_topk",
]


def _write_split(tbl, path: str, splits: int) -> None:
    """Write ``tbl`` as a single parquet file (splits=1) or as a
    DIRECTORY of ``splits`` part files — the cluster-shaped layout
    where a scan yields many input splits, so the spread gate takes
    its no-op branch and the no-added-Exchange path is the one that
    executes (round-5 runs were single-file and always exercised the
    spread branch; round 6 closes that evidence gap)."""
    import pyarrow.parquet as pq

    import shutil

    # a previous run may have left the OTHER layout at this path
    # (single file vs split directory) — clear either
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    if splits <= 1:
        pq.write_table(tbl, path)
        return
    os.makedirs(path)
    n = tbl.num_rows
    per = (n + splits - 1) // splits
    for i in range(splits):
        part = tbl.slice(i * per, per)
        if part.num_rows == 0:
            break
        pq.write_table(part, f"{path}/part-{i:05d}.parquet")


def table_glob(dst: str, t: str) -> str:
    """DuckDB-readable path for a replica table: the file itself, or
    a glob over the part files when the table is a split directory."""
    path = f"{dst}/{t}.parquet"
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def build_replica(
    src: str, dst: str, copies: int, perturb_docs: bool = False,
    splits: int = 1,
) -> None:
    """``perturb_docs`` appends a per-copy tag to documents.text so
    the replica holds NEAR-duplicates instead of exact ones — without
    it, exact 10x duplication makes the repeated-substring stage
    (correctly) delete the whole corpus, which turns the corpus_prep
    compare into a trivially-matching 0=0."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in SINGLE_COPY:
        _write_split(
            pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet", splits
        )
    for t, keys in SHIFT_COLS.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        parts = []
        for i in range(copies):
            tbl = base
            for k in keys:
                col = tbl[k]
                shifted = pc.add(col, pa.scalar(i * KEY_OFFSET, type=col.type))
                tbl = tbl.set_column(tbl.schema.get_field_index(k), k, shifted)
            if perturb_docs and t == "documents":
                # per-ROW unique 7-token tail derived from the shifted
                # doc_id: survives boilerplate removal (each 3-gram
                # occurs once) and substring dedup (each run occurs
                # once), so the cleaned corpus is non-empty even
                # though the replicated shared text is (correctly)
                # removed. A per-COPY constant tag would not work: it
                # appears in every doc of the copy, gets stripped as
                # boilerplate, and the copies collapse back to exact
                # duplicates.
                idx = tbl.schema.get_field_index("text")
                ids = pc.cast(tbl["doc_id"], pa.string())
                pieces = [tbl["text"].cast(pa.string())]
                for p in ("ua", "ub", "uc", "ud", "ue", "uf", "ug"):
                    pieces.append(
                        pc.binary_join_element_wise(
                            pa.scalar(p), ids, ""
                        )
                    )
                tagged = pc.binary_join_element_wise(*pieces, " ")
                tbl = tbl.set_column(idx, "text", tagged)
            parts.append(tbl)
        _write_split(
            pa.concat_tables(parts), f"{dst}/{t}.parquet", splits
        )


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        if v == 0:
            return "0"
        # 12 significant digits, RELATIVE: the driver's sf0.01 gate
        # compares doubles exactly and passes, but at 10x magnitudes
        # Spark and DuckDB can disagree by ONE ULP when a DECIMAL
        # sum's scale reduction rounds differently (HALF_UP vs
        # half-even; observed on q1 sum_charge: ...010.94159 vs
        # ...010.941593). An absolute floor(x*1e6) is meaningless
        # past 2^53 and flags that noise; 12 significant digits
        # forgives last-ulp rounding at any magnitude and still
        # catches every real defect.
        return f"{v:.12e}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return str(v)


def frame_facts(cols: list[str], rows) -> tuple[int, list[str], str]:
    """(n_rows, sorted column names, canonical md5) for a result set
    given as an iterable of row tuples aligned with ``cols``."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    lines = sorted(
        "\x1f".join(_canon(row[i]) for i in order) for row in rows
    )
    digest = hashlib.md5("\n".join(lines).encode()).hexdigest()[:16]
    return len(lines), names, digest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1x")
    ap.add_argument("--keys", default=",".join(DEFAULT_KEYS))
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--perturb-docs", action="store_true")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--splits", type=int, default=1)
    ap.add_argument("--plan-probe", action="store_true")
    args = ap.parse_args()

    if not args.skip_build:
        t0 = time.time()
        build_replica(args.src, args.dst, args.copies, args.perturb_docs,
                      args.splits)
        print(f"replica built at {args.dst} in {time.time()-t0:.1f}s",
              file=sys.stderr)

    import duckdb

    import __spark_entry__ as entrymod
    from umls2rdf_spark.schemas import TESTDATA_TABLES as TABLES
    from umls2rdf_spark.session import get_spark

    spark = get_spark(app_name="scale-oracle", shuffle_partitions=32)
    con = duckdb.connect()
    # give the oracle a disk spill path and a hard ceiling below the
    # box's RAM: the 57-section text_scoring union at 10x otherwise
    # grows past 100 GB RSS and dies on a bad allocation (the
    # round-6 30x finding, reached earlier by the larger surface);
    # with a temp_directory DuckDB can spill its hash joins/aggs
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='90GB'")
    for t in TABLES:
        # materialized, not views: DuckDB inlines a parquet view per
        # reference, and some oracle shapes (e.g. a window CTE joined
        # twice back to the base table) hit a planner pathology at
        # replica scale — 45 min where the same query on a temp table
        # takes 0.1 s. Same rows either way; the driver's sf0.01 gate
        # uses views and is unaffected at its size.
        con.execute(
            f"CREATE TEMP TABLE {t} AS "
            f"SELECT * FROM '{table_glob(args.dst, t)}'"
        )

    if args.plan_probe:
        # plan-fact evidence that the multi-split replica takes the
        # gated NO-SPREAD path: featurize-family frames built from
        # the replica must plan exactly their post-featurize shuffle
        # — zero pre-featurize Exchange (test_spread_gate pins the
        # same facts on synthetic 64-split input; this pins them on
        # the replica actually being value-verified)
        from umls2rdf_spark.operators.dedup import (
            minhash_signatures,
            simhash,
        )
        from umls2rdf_spark.operators.similarity import (
            hard_negative_topk_lsh,
            lsh_cosine_topk,
        )
        from umls2rdf_spark.plans.audit import plan_facts

        docs = spark.read.parquet(f"{args.dst}/documents.parquet")
        emb = spark.read.parquet(f"{args.dst}/embeddings.parquet")
        probes = {
            "minhash": (minhash_signatures(docs, "doc_id", "text",
                                           num_perm=8), 1),
            "simhash": (simhash(docs, "doc_id", "text"), 1),
            "lsh_topk": (lsh_cosine_topk(emb, "vec_id", "embedding",
                                         k=3, planes=4), 1),
            "hard_neg_lsh": (hard_negative_topk_lsh(
                emb, "vec_id", "embedding", "label", k=2, planes=4), 2),
        }
        for pname, (frame, allowed) in probes.items():
            n_splits = len(frame.inputFiles())
            ex = plan_facts(frame)["exchanges"]
            verdict = "OK" if ex <= allowed else "SPREAD-EXCHANGE-BACK"
            print(f"plan-probe {pname}: input_files={n_splits} "
                  f"exchanges={ex} (allowed {allowed}) {verdict}",
                  file=sys.stderr)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    keys = list(qs) if args.keys == "all" else args.keys.split(",")
    results = []
    for key in keys:
        t0 = time.time()
        print(f"[{time.strftime('%H:%M:%S')}] {key}: spark...",
              file=sys.stderr, flush=True)
        try:
            df = qs[key](spark, args.dst)
            cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            s_n, s_names, s_hash = frame_facts(cols, s_rows)
            print(f"[{time.strftime('%H:%M:%S')}] {key}: oracle...",
                  file=sys.stderr, flush=True)
            rel = con.execute(oracles[key])
            o_cols = [d[0] for d in rel.description]
            o_n, o_names, o_hash = frame_facts(o_cols, rel.fetchall())
            ok = (s_n == o_n) and (s_names == o_names) and (s_hash == o_hash)
            results.append(
                (key, s_n, o_n, s_names == o_names, s_hash == o_hash,
                 ok, time.time() - t0, None)
            )
        except Exception as e:  # record, keep sweeping
            results.append((key, -1, -1, False, False, False,
                            time.time() - t0, f"{type(e).__name__}: {e}"))

    fail = 0
    if args.markdown:
        print("| query | rows (spark=oracle) | schema | values | wall (s) |")
        print("|---|---|---|---|---|")
    for key, s_n, o_n, sch, hsh, ok, wall, err in results:
        if not ok:
            fail += 1
        if args.markdown:
            rows = f"{s_n}={o_n}" if s_n == o_n else f"**{s_n}≠{o_n}**"
            print(f"| {key} | {rows} | {'✓' if sch else '✗'} | "
                  f"{'✓' if hsh else '✗'} | {wall:.1f} |")
        else:
            print(key, "OK" if ok else f"FAIL rows={s_n}/{o_n} "
                  f"schema={sch} hash={hsh} err={err}", f"{wall:.1f}s")
        if err:
            print(f"  {key}: {err}", file=sys.stderr)
    print(f"{len(results) - fail}/{len(results)} green", file=sys.stderr)
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
