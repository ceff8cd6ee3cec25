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
  (same byte format support as multimodal.resize_images), integer
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

_ALLOWED_BANDS = (1, 2, 4, 8, 16)


def hamming_near_dup_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    hash_bits: int = 64,
) -> DataFrame:
    """(id_a < id_b, hamming) pairs whose hashes differ in at most
    ``max_hamming`` bits, via banded LSH on ``bands`` equal bit
    slices. Complete for ``max_hamming <= bands - 1`` (a pair
    differing in fewer bits than bands must agree on one whole
    band); above that it is the standard recall trade — raise
    ``bands`` for a guarantee.

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
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
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


def _decode_png_gray(b: bytes):
    """8-bit grayscale/RGB PNG → (h, w) uint8 grayscale ndarray via
    integer luma (r*299+g*587+b*114)//1000. Same format support and
    NotImplementedError contract as multimodal.resize_images'
    stdlib codec."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("image_ahash stdlib path: PNG bytes only")
    pos, idat = 8, b""
    w = h = bitd = colt = None
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        if typ == b"IHDR":
            w, h, bitd, colt = struct.unpack(">IIBB", data[:10])
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or bitd != 8 or colt not in (0, 2):
        raise NotImplementedError(
            f"8-bit grayscale/RGB PNG only (bit depth {bitd}, "
            f"color type {colt})"
        )
    ch = 1 if colt == 0 else 3
    raw = zlib.decompress(idat)
    stride = w * ch
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p:p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                up = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa = abs(up - c)
                pb = abs(a - c)
                pc = abs(a + up - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise NotImplementedError(f"PNG filter type {f}")
        out += line
        prev = line
    arr = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, ch)
    if ch == 3:
        a64 = arr.astype(np.int64)
        gray = (
            a64[:, :, 0] * 299 + a64[:, :, 1] * 587 + a64[:, :, 2] * 114
        ) // 1000
        return gray.astype(np.uint8)
    return arr[:, :, 0]


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


def image_ahash(df: DataFrame, id_col: str = "media_id",
                content_col: str = "content") -> DataFrame:
    """(id, ahash): 8x8 average perceptual hash per image, Arrow-
    batched. Stdlib PNG decode (NotImplementedError for other
    formats — same contract as resize_images); 63-bit positive
    hashes, deterministic."""
    from umls2rdf_spark.operators.spread import spread_small_input

    def hash_batches(batches):
        import pandas as pd

        for pdf in batches:
            ids, hs = [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                hs.append(_ahash_int(_decode_png_gray(b)))
                ids.append(mid)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "ahash": pd.Series(hs, dtype="int64")}
            )

    from pyspark import cloudpickle

    import umls2rdf_spark.operators.imagededup as _selfmod

    src = spread_small_input(df.select(id_col, content_col), id_col)
    # module shipped by value: the worker closure calls
    # _decode_png_gray/_ahash_int and executor pythons may not have
    # the repo on sys.path (same pattern as operators/pq.py)
    cloudpickle.register_pickle_by_value(_selfmod)
    try:
        return src.mapInPandas(
            hash_batches, schema=f"{id_col} long, ahash long"
        )
    finally:
        cloudpickle.unregister_pickle_by_value(_selfmod)


def image_near_dup_groups(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(id, group_id) for every image, where near-duplicate images
    (aHash Hamming <= max_hamming, transitively closed) share the
    min-id representative — aHash -> banded Hamming pairs ->
    connected components, the image twin of dedup_clusters."""
    from umls2rdf_spark.operators.dedup import connected_components

    hashes = image_ahash(df, id_col, content_col)
    pairs = hamming_near_dup_pairs(
        hashes, id_col, "ahash", max_hamming=max_hamming, bands=bands
    )
    ids = df.select(F.col(id_col).alias("node")).distinct()
    comp = connected_components(pairs, ids)
    return comp.select(
        F.col("node").alias(id_col), F.col("label").alias("group_id")
    )
