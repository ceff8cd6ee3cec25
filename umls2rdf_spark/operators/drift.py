"""Corpus drift detection: per-group chi-square divergence between a
BASE corpus and a NEW corpus over a bucketed numeric signal — the
monitoring primitive a continuously-crawled training pipeline needs
("did this month's crawl change the length/quality distribution of
source X?"). Distribution drift is where silent pipeline breakage
shows up first (an extractor regression shifts length histograms
long before anyone reads a document), and per-source χ² against the
previous snapshot is the standard alarm.

Statistic, stated exactly: values bucket by ``floor(v / W)``; for a
group with base bucket counts b_i (total N_b) and new counts n_i
(total N_n), the engine-exact quantized statistic is

    chi2_q = Σ over buckets with b_i > 0 of
             ((d_i² · 2^score_bits) div (b_i · N_n)) div N_b,
             where d_i = n_i · N_b − b_i · N_n

which is χ² = Σ (n_i − e_i)²/e_i against expectations e_i scaled
from the base (algebra in the test), computed entirely in
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) integral divisions — the
PMI/WordPiece quantization discipline: bit-identical in both
engines, no libm, no IEEE accumulation order (a float χ² would sum
in partial-aggregation order, which is nondeterministic across
runs — unusable under a value gate). Scaling BEFORE the divisions
makes the two nested floors cost < 2 units of 2^-score_bits per
bucket, so chi2_q is a DEFINED deterministic statistic tightly
below the real χ² · 2^score_bits.
Buckets NOVEL in the new corpus (b_i = 0, n_i > 0) have no defined
χ² term (e_i = 0) and are reported separately as n_novel /
novel_mass — a novel bucket is itself a drift signal, not noise to
fold in. Vanished buckets (n_i = 0) contribute their full expected
mass through d_i. Magnitude valve: d_i² · 2^score_bits must fit
DECIMAL(38,0), which holds for per-group per-side totals up to
~3·10^7 rows at the default score_bits (d_i ≤ N_n·N_b); beyond
that, monitor a stratified_sample of each side (the statistic is
distributional — sampling is the standard practice) or lower
score_bits. Out of range FAILS CLOSED: ANSI DECIMAL overflow
raises, it never goes silently wrong.

100 TB shape: one map-side-combined groupBy(group, bucket) per
corpus (the only raw-data shuffles), a full-outer bucket join of the
two bounded count frames, one map-side-combined per-group sum.

Reference parity: none (the reference has no statistics);
LLM-pipeline monitoring surface (SURVEY §2 C70).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "DECIMAL(38,0)"


def _bucket_counts(
    df: DataFrame, grp_col: str, val_expr, bucket_width: int, name: str
) -> DataFrame:
    return (
        df.select(
            F.col(grp_col).alias("g"),
            F.floor(val_expr / F.lit(bucket_width))
            .cast("bigint")
            .alias("b"),
        )
        .where(F.col("b").isNotNull())
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias(name))
    )


def chi_square_drift(
    base_df: DataFrame,
    new_df: DataFrame,
    grp_col: str,
    val_expr,
    bucket_width: int,
    score_bits: int = 20,
) -> DataFrame:
    """(grp, n_base, n_new, n_buckets, chi2_q, n_novel, novel_mass):
    per-group quantized χ² of the new corpus against base-scaled
    expectations (module docstring). Groups present in only one
    corpus are reported with the other side's total at 0 — all-novel
    or all-vanished is the loudest drift there is."""
    b = _bucket_counts(base_df, grp_col, val_expr, bucket_width, "bi")
    n = _bucket_counts(new_df, grp_col, val_expr, bucket_width, "ni")
    j = (
        b.join(n, ["g", "b"], "full")
        .select(
            "g",
            "b",
            F.coalesce("bi", F.lit(0)).alias("bi"),
            F.coalesce("ni", F.lit(0)).alias("ni"),
        )
    )
    totals = j.groupBy("g").agg(
        F.sum("bi").cast("bigint").alias("nb"),
        F.sum("ni").cast("bigint").alias("nn"),
    )
    t = j.join(totals, "g")
    d = (
        f"(CAST(ni AS {DEC}) * CAST(nb AS {DEC})"
        f" - CAST(bi AS {DEC}) * CAST(nn AS {DEC}))"
    )
    term = F.expr(
        f"CAST((({d} * {d} * CAST({1 << score_bits} AS {DEC}))"
        f" div (CAST(bi AS {DEC}) * CAST(nn AS {DEC})))"
        f" div CAST(nb AS {DEC}) AS BIGINT)"
    )
    return t.groupBy("g").agg(
        F.max("nb").cast("bigint").alias("n_base"),
        F.max("nn").cast("bigint").alias("n_new"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("bi") > 0) & (F.col("nn") > 0), term
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("chi2_q"),
        F.sum(
            ((F.col("bi") == 0) & (F.col("ni") > 0)).cast("bigint")
        )
        .cast("bigint")
        .alias("n_novel"),
        F.sum(
            F.when(F.col("bi") == 0, F.col("ni")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("novel_mass"),
    ).select(
        F.col("g").alias(grp_col),
        "n_base",
        "n_new",
        "n_buckets",
        "chi2_q",
        "n_novel",
        "novel_mass",
    )


def chi_square_drift_sql(
    base_sql: str,
    new_sql: str,
    grp_col: str,
    val_sql: str,
    bucket_width: int,
    score_bits: int = 20,
) -> str:
    """DuckDB twin — same bucket rule, same HUGEINT division order."""
    d = (
        "(CAST(ni AS HUGEINT) * CAST(nb AS HUGEINT)"
        " - CAST(bi AS HUGEINT) * CAST(nn AS HUGEINT))"
    )
    term = (
        f"CAST((({d} * {d} * CAST({1 << score_bits} AS HUGEINT))"
        f" // (CAST(bi AS HUGEINT) * CAST(nn AS HUGEINT)))"
        f" // CAST(nb AS HUGEINT) AS BIGINT)"
    )
    return f"""
WITH __bc AS (
  SELECT {grp_col} AS g,
         CAST(floor(({val_sql}) / {bucket_width}) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS bi
  FROM ({base_sql}) AS __b
  WHERE ({val_sql}) IS NOT NULL GROUP BY 1, 2),
__nc AS (
  SELECT {grp_col} AS g,
         CAST(floor(({val_sql}) / {bucket_width}) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS ni
  FROM ({new_sql}) AS __n
  WHERE ({val_sql}) IS NOT NULL GROUP BY 1, 2),
__j AS (
  SELECT COALESCE(bc.g, nc.g) AS g, COALESCE(bc.b, nc.b) AS b,
         COALESCE(bc.bi, 0) AS bi, COALESCE(nc.ni, 0) AS ni
  FROM __bc bc FULL OUTER JOIN __nc nc
    ON bc.g = nc.g AND bc.b = nc.b),
__t AS (
  SELECT j.*, t.nb, t.nn
  FROM __j j JOIN (
    SELECT g, CAST(SUM(bi) AS BIGINT) AS nb,
           CAST(SUM(ni) AS BIGINT) AS nn
    FROM __j GROUP BY 1) t ON j.g = t.g)
SELECT g AS {grp_col},
       CAST(MAX(nb) AS BIGINT) AS n_base,
       CAST(MAX(nn) AS BIGINT) AS n_new,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(COALESCE(SUM(CASE WHEN bi > 0 AND nn > 0
                              THEN {term} END), 0) AS BIGINT)
         AS chi2_q,
       CAST(SUM(CASE WHEN bi = 0 AND ni > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN bi = 0 THEN ni ELSE 0 END) AS BIGINT)
         AS novel_mass
FROM __t GROUP BY 1
"""
