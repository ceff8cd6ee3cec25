"""Perceptual-hash image near-dup: banded Hamming join (DuckDB-
oracled + completeness property) and the aHash decode path on real
stdlib-encoded PNGs."""

from __future__ import annotations

import random

import duckdb
import pytest

from tests.test_streaming_multimodal import make_png
from umls2rdf_spark.operators.imagededup import (
    hamming_near_dup_pairs,
    hamming_near_dup_pairs_sql,
    image_ahash,
    image_near_dup_groups,
)


def _brute_pairs(vals, max_hamming):
    out = set()
    for i, (ia, ha) in enumerate(vals):
        for ib, hb in vals[i + 1:]:
            a, b = (ia, ha) if ia < ib else (ib, hb)
            c, d = (ib, hb) if ia < ib else (ia, ha)
            if bin(ha ^ hb).count("1") <= max_hamming:
                out.add((a, c, bin(ha ^ hb).count("1")))
    return out


def test_hamming_pairs_complete_and_oracle_exact(spark):
    """bands=4 guarantees every Hamming<=3 pair is found; results
    hash-match the DuckDB twin row for row."""
    rng = random.Random(17)
    base = [rng.getrandbits(63) for _ in range(40)]
    vals = []
    for i, h in enumerate(base):
        vals.append((i * 10, h))
        # a planted near-dup: flip up to 3 bits
        flipped = h
        for _ in range(rng.randrange(0, 4)):
            flipped ^= 1 << rng.randrange(63)
        vals.append((i * 10 + 1, flipped))
    df = spark.createDataFrame(vals, "img_id long, h long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dup_pairs(
            df, "img_id", "h", max_hamming=3, bands=4
        ).collect()
    }
    assert got == _brute_pairs(vals, 3)
    con = duckdb.connect()
    con.execute("CREATE TABLE hashes AS SELECT * FROM (VALUES "
                + ",".join(f"({i},{h})" for i, h in vals)
                + ") t(img_id, h)")
    oracle = {
        tuple(r)
        for r in con.execute(
            hamming_near_dup_pairs_sql(
                "SELECT img_id, h FROM hashes", "img_id", "h",
                max_hamming=3, bands=4,
            )
        ).fetchall()
    }
    assert got == oracle
    con.close()


def test_hamming_pairs_rejects_bad_bands(spark):
    df = spark.createDataFrame([(1, 2)], "img_id long, h long")
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(df, "img_id", "h", bands=3)


def _noisy_png(rng, base, flips):
    """Copy of ``base`` (list of rows of 0..255) with ``flips``
    pixels nudged slightly — small luma change, aHash-stable unless
    it crosses a cell's mean threshold."""
    rows = [list(r) for r in base]
    h, w = len(rows), len(rows[0])
    for _ in range(flips):
        y, x = rng.randrange(h), rng.randrange(w)
        rows[y][x] = min(255, rows[y][x] + 8)
    return rows


def test_image_near_dup_groups_on_pngs(spark):
    """Exact copies and lightly-perturbed copies of an image group
    together; a structurally different image stays apart."""
    rng = random.Random(5)
    img_a = [
        [(x * 255) // 15 for x in range(16)] for _ in range(16)
    ]  # horizontal gradient
    img_b = [
        [255 if (x // 4 + y // 4) % 2 == 0 else 0 for x in range(16)]
        for y in range(16)
    ]  # checkerboard
    rows = [
        (1, make_png(img_a), ("image/png", "t")),
        (2, make_png(img_a), ("image/png", "t")),          # exact dup
        (3, make_png(_noisy_png(rng, img_a, 3)), ("image/png", "t")),
        (4, make_png(img_b), ("image/png", "t")),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, content binary, meta struct<mime:string,source:string>"
    )
    groups = {
        r["media_id"]: r["group_id"]
        for r in image_near_dup_groups(df, max_hamming=3).collect()
    }
    assert groups[1] == groups[2] == 1
    assert groups[4] != groups[1]
    # the perturbed copy joins the gradient group (tiny luma nudges
    # stay within the cell-mean threshold at this magnitude)
    assert groups[3] == groups[1]


def test_image_ahash_deterministic_and_positive(spark):
    img = [[(x * y) % 256 for x in range(10)] for y in range(12)]
    df = spark.createDataFrame(
        [(7, make_png(img), ("image/png", "t"))],
        "media_id long, content binary, meta struct<mime:string,source:string>",
    )
    h1 = image_ahash(df).collect()[0]["ahash"]
    h2 = image_ahash(df).collect()[0]["ahash"]
    assert h1 == h2
    assert 0 <= h1 < (1 << 63)


def test_image_ahash_non_png_raises(spark):
    df = spark.createDataFrame(
        [(1, b"JPEGJUNK", ("image/jpeg", "t"))],
        "media_id long, content binary, meta struct<mime:string,source:string>",
    )
    with pytest.raises(Exception, match="PNG"):
        image_ahash(df).collect()


def test_hamming_pairs_salted_equals_unsalted(spark):
    """max_bucket block-pair salting must not lose or invent a single
    pair — including a degenerate bucket where EVERY hash is equal
    (the skew case the valve exists for)."""
    rng = random.Random(31)
    vals = [(i, 0) for i in range(25)]                   # one giant bucket
    vals += [(100 + i, rng.getrandbits(63)) for i in range(30)]
    df = spark.createDataFrame(vals, "img_id long, h long")
    plain = {
        tuple(r)
        for r in hamming_near_dup_pairs(
            df, "img_id", "h", max_hamming=3, bands=4
        ).collect()
    }
    salted = {
        tuple(r)
        for r in hamming_near_dup_pairs(
            df, "img_id", "h", max_hamming=3, bands=4, max_bucket=5
        ).collect()
    }
    assert salted == plain
    # the degenerate bucket's pairs are all present: 25*24/2
    zero_pairs = {p for p in plain if p[0] < 100 and p[1] < 100}
    assert len(zero_pairs) == 300


def test_image_ahash_permissive_quarantine(spark):
    """Mixed PNG/garbage corpus under PERMISSIVE: the job completes,
    good rows hash, bad rows land with ahash null and the decode
    error in _corrupt_record (keep_corrupt=True), and the default
    drops them after being countable — the D5 reader contract on the
    media path."""
    img = [[(x + y) % 256 for x in range(10)] for y in range(10)]
    rows = [
        (1, make_png(img), ("image/png", "t")),
        (2, b"JPEGJUNK", ("image/jpeg", "t")),
        (3, None, ("image/png", "t")),
        (4, make_png(img), ("image/png", "t")),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    kept = image_ahash(df, mode="PERMISSIVE").collect()
    assert {r["media_id"] for r in kept} == {1, 4}
    assert all(r["ahash"] is not None for r in kept)

    full = image_ahash(df, mode="PERMISSIVE", keep_corrupt=True).collect()
    by_id = {r["media_id"]: r for r in full}
    assert len(full) == 4
    assert by_id[1]["_corrupt_record"] is None
    assert by_id[2]["ahash"] is None
    assert "PNG" in by_id[2]["_corrupt_record"]
    assert by_id[3]["ahash"] is None
    assert by_id[1]["ahash"] == by_id[4]["ahash"]


def test_image_near_dup_groups_permissive_singletons(spark):
    """PERMISSIVE grouping: quarantined ids never pair but stay in
    the output as their own singleton groups."""
    img_a = [[(x * 3 + y) % 256 for x in range(12)] for y in range(12)]
    rows = [
        (1, make_png(img_a), ("image/png", "t")),
        (2, make_png(img_a), ("image/png", "t")),
        (3, b"NOTAPNG", ("image/jpeg", "t")),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    groups = {
        r["media_id"]: r["group_id"]
        for r in image_near_dup_groups(
            df, max_hamming=3, mode="PERMISSIVE"
        ).collect()
    }
    assert set(groups) == {1, 2, 3}
    assert groups[1] == groups[2]
    assert groups[3] != groups[1]


def test_resize_images_permissive_quarantine(spark):
    """resize PERMISSIVE keeps every row: good blobs re-encode, bad
    blobs carry null content + the decode error."""
    from umls2rdf_spark.operators.multimodal import resize_images

    img = [[(x * 2 + y) % 256 for x in range(8)] for y in range(8)]
    df = spark.createDataFrame(
        [(1, make_png(img), ("image/png", "t")),
         (2, b"GARBAGE", ("image/jpeg", "t"))],
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    out = {
        r["media_id"]: r
        for r in resize_images(
            df, 4, 4, image_module=None, mode="PERMISSIVE"
        ).collect()
    }
    assert len(out) == 2
    assert out[1]["content"] is not None
    assert out[1]["_corrupt_record"] is None
    assert out[2]["content"] is None
    assert "PNG" in out[2]["_corrupt_record"]
