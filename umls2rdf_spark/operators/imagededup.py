"""Perceptual-hash near-duplicate detection for media columns — the
image-side counterpart of the text near-dup family (minhash/simhash).

Two halves, split by SQL-expressibility:

- :func:`hamming_near_dup_pairs` — generic banded Hamming join over
  ANY integer hash column (aHash, simhash, ...): split the hash into
  ``bands`` equal bit-bands, bucket-join on (band, sig), verify
  candidates with exact ``bit_count(a XOR b)``. Pigeonhole gives
  GUARANTEED completeness for Hamming distance <= bands-1; never
  all-pairs. Pure relational — DuckDB-oracled and driven through the
  text_scoring driver key over the corpus simhashes.
- :func:`image_ahash` — classic 8x8 average hash: stdlib PNG decode
  (functions/png.py, the codec resize_images shares), integer
  luma, nearest-neighbor 8x8 reduction, bit j set iff
  ``pixel_j * 64 > sum(pixels)``. All-integer, deterministic
  everywhere; binary decode keeps it tests-only by nature (SURVEY
  C13 stance).

At 100 TB: the hash build is one Arrow-batched map pass (8 bytes/doc
state, the same between-ingests index argument as the text dedup
family), and the banded join's per-bucket work is bounded by bucket
size with the usual salting escape if a degenerate hash value
dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions import jpeg as _jpeg
from umls2rdf_spark.functions import media as _media
from umls2rdf_spark.functions import png as _png

_ALLOWED_BANDS = (1, 2, 4, 8, 16)


def hamming_near_dup_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    hash_bits: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """(id_a < id_b, hamming) pairs whose hashes differ in at most
    ``max_hamming`` bits, via banded LSH on ``bands`` equal bit
    slices. Complete for ``max_hamming <= bands - 1`` (a pair
    differing in fewer bits than bands must agree on one whole
    band); above that it is the standard recall trade — raise
    ``bands`` for a guarantee.

    ``max_bucket`` is the skew valve for degenerate hash values
    (blank images all hashing to 0, a boilerplate simhash): a
    (band, sig) bucket larger than it splits into r = ceil(size /
    max_bucket) id-hash salt classes and the join runs over the r×r
    BLOCK-PAIR grid — the left side replicates each row r times as
    (own salt, k) and the right as (k, own salt), so every pair
    still meets in EXACTLY one block. Unlike the top-k ops'
    salting this loses nothing: pair completeness is preserved at
    the price of r× replication for the oversized buckets only.

    Hash values must be non-negative in the low ``hash_bits`` bits
    (aHash emits 63-bit-safe hashes; simhash is 32-bit).
    """
    if bands not in _ALLOWED_BANDS or hash_bits % bands != 0:
        raise ValueError(f"bands must divide {hash_bits}: {_ALLOWED_BANDS}")
    width = hash_bits // bands
    mask = (1 << width) - 1
    ex = hashes.select(
        F.col(id_col),
        F.col(hash_col).cast("bigint").alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col(hash_col).cast("bigint"), i * width
                        )
                        .bitwiseAND(F.lit(mask))
                        .alias("sig"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("__b"),
    ).select(id_col, "__h", F.col("__b.band").alias("band"),
             F.col("__b.sig").alias("sig"))
    a = ex.select(
        F.col(id_col).alias("id_a"), F.col("__h").alias("h_a"),
        "band", "sig",
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col("__h").alias("h_b"),
        "band", "sig",
    )
    if max_bucket is not None:
        from umls2rdf_spark.functions.hashing import stable_hash40

        # Broadcast only the OVERSIZED buckets: the (band, sig)
        # domain is 2^(hash_bits/bands) (2^32 at bands=2), so the
        # full counts frame can approach corpus size; buckets above
        # max_bucket are few by definition. Un-split buckets take
        # __r = 1 via the left join's null.
        counts = (
            ex.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .where(F.col("__cnt") > max_bucket)
        )
        nsplit = F.expr(f"(__cnt + {max_bucket} - 1) div {max_bucket}")
        salted = (
            ex.join(F.broadcast(counts), ["band", "sig"], "left")
            .withColumn(
                "__r", F.coalesce(nsplit.cast("int"), F.lit(1))
            )
            .withColumn(
                "__salt",
                F.pmod(
                    stable_hash40(F.col(id_col).cast("string")),
                    F.col("__r"),
                ).cast("int"),
            )
        )
        ks = F.explode(F.sequence(F.lit(0), F.col("__r") - 1)).alias("__k")
        a = salted.select(
            F.col(id_col).alias("id_a"), F.col("__h").alias("h_a"),
            "band", "sig", F.col("__salt").alias("__bi"), ks,
        ).withColumnRenamed("__k", "__bj")
        b = salted.select(
            F.col(id_col).alias("id_b"), F.col("__h").alias("h_b"),
            "band", "sig", F.col("__salt").alias("__bj"), ks,
        ).withColumnRenamed("__k", "__bi")
        join_keys = ["band", "sig", "__bi", "__bj"]
    else:
        join_keys = ["band", "sig"]
    # the hamming test runs BEFORE the cross-band dedup shuffle
    # (guide §2.3): XOR + bit_count is a map-side codegen expression,
    # so only pairs that actually pass the threshold reach the
    # distinct's exchange — the candidate pairs of a hot bucket
    # (hundreds of times more rows) are dropped in the join stage.
    # Result-identical: hamming is a pure function of the pair, and
    # filter/distinct commute row-wise.
    return (
        a.join(b, join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def hamming_near_dup_pairs_sql(
    table_sql: str,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    hash_bits: int = 64,
) -> str:
    """DuckDB twin of :func:`hamming_near_dup_pairs` over an inner
    SELECT producing (id_col, hash_col)."""
    if bands not in _ALLOWED_BANDS or hash_bits % bands != 0:
        raise ValueError(f"bands must divide {hash_bits}: {_ALLOWED_BANDS}")
    width = hash_bits // bands
    mask = (1 << width) - 1
    band_vals = ", ".join(str(i) for i in range(bands))
    return f"""
WITH src AS ({table_sql}),
ex AS (
  SELECT {id_col}, CAST({hash_col} AS BIGINT) AS h, u.band,
         (CAST({hash_col} AS BIGINT) >> (u.band * {width})) & {mask} AS sig
  FROM src, UNNEST([{band_vals}]) AS u(band)
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
         a.h AS h_a, b.h AS h_b
  FROM ex a JOIN ex b ON a.band = b.band AND a.sig = b.sig
  WHERE a.{id_col} < b.{id_col}
)
SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(h_a, h_b)) <= {max_hamming}
"""


def _ahash_int(gray) -> int:
    """Average hash of a grayscale image: nearest-neighbor floor map
    to 8x8, bit j (row-major) set iff ``cell_j * 64 > total`` — pure
    integers, no float mean, identical everywhere. Bit 63 (the
    bottom-right cell) is forced to 0 so the hash stays positive in
    every engine's signed BIGINT; 63 of 64 cells is an immaterial
    loss for near-dup ranking and it spares the banded join from
    sign-sensitive shift semantics."""
    import numpy as np

    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    cells = gray[ys][:, xs].astype(np.int64).ravel()
    total = int(cells.sum())
    bits = (cells * 64 > total).astype(np.int64)
    bits[63] = 0  # keep the hash in signed-64 positive range
    return int((bits << np.arange(64)).sum())


def image_ahash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    mode: str = "FAILFAST",
    keep_corrupt: bool = False,
) -> DataFrame:
    """(id, ahash): 8x8 average perceptual hash per image, Arrow-
    batched. Stdlib PNG + baseline JPEG decode (functions/media.py
    dispatch — the two dominant web formats; progressive JPEG and
    everything else raise with a clear message, or quarantine under
    PERMISSIVE); 63-bit positive hashes, deterministic.

    ``mode`` follows the D5 reader contract (sources/text.py):

    - ``FAILFAST`` (default): any undecodable blob fails the job —
      the strict contract for pipelines that must not lose media.
    - ``PERMISSIVE``: a bad blob becomes data, not job death — its
      row lands with ``ahash`` null and the decode error in
      ``_corrupt_record``. By default corrupt rows are then dropped
      AFTER being countable; ``keep_corrupt=True`` returns them for
      quarantine/inspection (filter ``_corrupt_record IS NOT
      NULL``). At 100 TB a corpus WILL contain truncated and
      mislabeled bytes; one of them must not kill a million-image
      hash job.
    """
    from umls2rdf_spark.operators.spread import spread_small_input
    from umls2rdf_spark.sources.text import CORRUPT_COL

    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE: {mode}")
    permissive = mode == "PERMISSIVE"

    def hash_batches(batches):
        import pandas as pd

        for pdf in batches:
            ids, hs, errs = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                if permissive:
                    try:
                        h = _ahash_int(_media.decode_image_gray(b))
                        err = None
                    except Exception as e:
                        h = None
                        err = f"{type(e).__name__}: {e}"
                else:
                    h = _ahash_int(_media.decode_image_gray(b))
                    err = None
                ids.append(mid)
                hs.append(h)
                errs.append(err)
            out = {
                id_col: pd.Series(ids, dtype="int64"),
                "ahash": pd.Series(hs, dtype="Int64"),
            }
            if permissive:
                out[corrupt_col] = pd.Series(errs, dtype="object")
            yield pd.DataFrame(out)

    from pyspark import cloudpickle

    import umls2rdf_spark.operators.imagededup as _selfmod

    corrupt_col = CORRUPT_COL
    src = spread_small_input(df.select(id_col, content_col), id_col)
    schema = f"{id_col} long, ahash long"
    if permissive:
        schema += f", {CORRUPT_COL} string"
    # modules shipped by value: the worker closure calls _ahash_int
    # (this module) and png.decode_png_gray, and executor pythons may
    # not have the repo on sys.path (same pattern as operators/pq.py)
    cloudpickle.register_pickle_by_value(_selfmod)
    cloudpickle.register_pickle_by_value(_png)
    cloudpickle.register_pickle_by_value(_jpeg)
    cloudpickle.register_pickle_by_value(_media)
    try:
        hashed = src.mapInPandas(hash_batches, schema=schema)
    finally:
        cloudpickle.unregister_pickle_by_value(_media)
        cloudpickle.unregister_pickle_by_value(_jpeg)
        cloudpickle.unregister_pickle_by_value(_png)
        cloudpickle.unregister_pickle_by_value(_selfmod)
    if permissive and not keep_corrupt:
        return hashed.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return hashed


def image_near_dup_groups(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 3,
    bands: int = 4,
    mode: str = "FAILFAST",
) -> DataFrame:
    """(id, group_id) for every image, where near-duplicate images
    (aHash Hamming <= max_hamming, transitively closed) share the
    min-id representative — aHash -> banded Hamming pairs ->
    connected components, the image twin of dedup_clusters.

    ``mode="PERMISSIVE"`` quarantines undecodable blobs out of the
    hash/pair stages (image_ahash contract) instead of failing the
    job; quarantined ids still appear in the output as their own
    singleton groups — an image nobody could decode is nobody's
    near-duplicate, but it is still in the corpus."""
    from umls2rdf_spark.operators.dedup import connected_components

    hashes = image_ahash(df, id_col, content_col, mode=mode)
    pairs = hamming_near_dup_pairs(
        hashes, id_col, "ahash", max_hamming=max_hamming, bands=bands
    )
    ids = df.select(F.col(id_col).alias("node")).distinct()
    comp = connected_components(pairs, ids)
    return comp.select(
        F.col("node").alias(id_col), F.col("label").alias("group_id")
    )
