"""Manifest-pinned snapshot tables: a minimal versioned table format
(the Delta/Iceberg idea reduced to its reproducibility core) for
training-data releases — "the model was trained on snapshot v7" must
stay answerable after the corpus moves on, and a directory of
parquet files can't answer it: any later append or compaction
silently changes what ``spark.read.parquet(dir)`` returns.

Layout (append-only data, atomic manifest commit):

    table_dir/
      data/v{N}/part-*.parquet     written once, never rewritten
      manifests/v{N}.json          file list + per-file row counts
                                   + total rows + schema + parent
                                   + note

A snapshot is COMMITTED by renaming its manifest into place
(``os.rename`` is atomic on POSIX within a filesystem) — readers
either see the complete manifest or none; a crashed writer leaves a
``v{N}`` data directory with no manifest, which is garbage, never a
half-readable table. Reads load EXACTLY the manifest's file list and
fail CLOSED: a missing file or a row-count mismatch raises instead
of silently returning a partial snapshot (the reproducibility
contract — a wrong training set is worse than a failed job).

Time travel is reading an old manifest; nothing expires (retention
is the caller's policy). ``diff_snapshots`` answers "what changed
between v3 and v7" by id anti-joins — the audit question every
release process gets asked.

Concurrency contract, stated: SINGLE WRITER. Version numbers are
max+1 at commit time; two concurrent writers can race to the same
version and the second rename overwrites (POSIX rename semantics) —
coordination (a lock, a queue) is the caller's job, exactly the
contract of Delta's non-transactional-store mode. Readers are
always safe.

At 100 TB: manifests hold file PATHS + counts, not data — a
million-file snapshot is a megabytes-scale JSON; reads plan a
normal parquet scan over the listed files (partition pruning and
pushdown unaffected).

Reference parity: deployment-side analogue of the reference's
move_rdf_to_repo.py (git add/push of rendered output — the only
reference file with no data semantics); this adds the data-side
versioning the reference delegates to git (SURVEY §2 D13).
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "manifests")


def snapshot_versions(table_dir: str) -> list[int]:
    """Committed versions, ascending (manifests present on disk)."""
    mdir = _manifest_dir(table_dir)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        m = re.fullmatch(r"v(\d+)\.json", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _data_versions(table_dir: str) -> list[int]:
    """``data/v{N}`` dirs present on disk, committed or not — an
    orphan from a crashed writer counts, so the next commit SKIPS
    its number instead of failing ``mode('error')`` on it forever
    (round-8 advice: a crash between data write and manifest rename
    must not wedge the table)."""
    ddir = os.path.join(table_dir, "data")
    if not os.path.isdir(ddir):
        return []
    out = []
    for f in os.listdir(ddir):
        m = re.fullmatch(r"v(\d+)", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def commit_snapshot(
    df: DataFrame, table_dir: str, note: str = ""
) -> int:
    """Write ``df`` as the next snapshot version and atomically
    commit its manifest. Returns the new version number. The
    version is 1 + the max over committed manifests AND existing
    ``data/v*`` dirs, so a crashed writer's orphan data dir is
    stepped over (it stays garbage, per the layout contract) rather
    than colliding with ``mode('error')`` on every later commit."""
    spark = df.sparkSession
    version = (
        max(
            snapshot_versions(table_dir) + _data_versions(table_dir),
            default=0,
        )
        + 1
    )
    data_dir = os.path.join(table_dir, "data", f"v{version}")
    df.write.mode("error").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    counts = {
        f: spark.read.parquet(f).count() for f in files
    }
    committed = snapshot_versions(table_dir)
    manifest = {
        "version": version,
        # latest COMMITTED version — with orphan dirs skipped,
        # version-1 may name a data dir that was never a snapshot
        "parent": committed[-1] if committed else None,
        "note": note,
        "schema": df.schema.json(),
        "files": [
            {"path": f, "rows": counts[f]} for f in files
        ],
        "total_rows": sum(counts.values()),
    }
    mdir = _manifest_dir(table_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.rename(tmp, os.path.join(mdir, f"v{version}.json"))
    return version


def read_manifest(table_dir: str, version: int) -> dict:
    path = os.path.join(_manifest_dir(table_dir), f"v{version}.json")
    if not os.path.exists(path):
        raise ValueError(
            f"snapshot v{version} is not committed in {table_dir} "
            f"(committed: {snapshot_versions(table_dir)})"
        )
    with open(path) as fh:
        return json.load(fh)


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    verify_counts: bool = False,
) -> DataFrame:
    """Read EXACTLY one committed snapshot (latest by default).
    Fails closed: missing data files raise; ``verify_counts=True``
    additionally re-counts every file against the manifest (an
    integrity audit — a swapped/truncated file raises instead of
    training on it)."""
    if version is None:
        versions = snapshot_versions(table_dir)
        if not versions:
            raise ValueError(f"no snapshots committed in {table_dir}")
        version = versions[-1]
    manifest = read_manifest(table_dir, version)
    files = [f["path"] for f in manifest["files"]]
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise ValueError(
            f"snapshot v{version} is corrupt: {len(missing)} data "
            f"file(s) missing, first: {missing[0]}"
        )
    if verify_counts:
        for f in manifest["files"]:
            # an audit must not trust session caches: the footer/
            # status cache would otherwise mask a swapped file (or
            # turn it into an opaque length-mismatch error)
            spark.catalog.refreshByPath(f["path"])
            got = spark.read.parquet(f["path"]).count()
            if got != f["rows"]:
                raise ValueError(
                    f"snapshot v{version} integrity failure: "
                    f"{f['path']} has {got} rows, manifest says "
                    f"{f['rows']}"
                )
    return spark.read.parquet(*files)


def diff_snapshots(
    spark: SparkSession,
    table_dir: str,
    v_old: int,
    v_new: int,
    id_col: str,
) -> DataFrame:
    """(change, id): 'added' ids present only in v_new, 'removed'
    ids present only in v_old — the release-audit diff, two
    anti-joins on the id column."""
    from pyspark.sql import functions as F

    old = read_snapshot(spark, table_dir, v_old).select(id_col)
    new = read_snapshot(spark, table_dir, v_new).select(id_col)
    added = new.join(old, id_col, "left_anti").select(
        F.lit("added").alias("change"), F.col(id_col)
    )
    removed = old.join(new, id_col, "left_anti").select(
        F.lit("removed").alias("change"), F.col(id_col)
    )
    return added.unionByName(removed)
