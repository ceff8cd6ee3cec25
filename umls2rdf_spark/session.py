"""SparkSession factory with scale-oriented defaults.

Settings chosen for correctness at local[32] and sanity at cluster
scale: AQE (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for any pandas interchange, and a shuffle
parallelism that matches the local core count (on a real cluster AQE
coalesces the 200+ default down, so this is safe either way).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def cluster_conf_100tb(
    executors: int = 1000,
    executor_cores: int = 4,
) -> dict[str, str]:
    """Deployment conf for the 100 TB / 1000-executor target — pass
    as ``get_spark(extra_conf=cluster_conf_100tb())`` or spark-submit
    ``--conf`` lines. Every key is sized from the cluster shape, with
    the reasoning inline; AQE then corrects per-stage at runtime.

    - shuffle.partitions = 2 waves of total cores: a static count is
      always wrong somewhere; start near the parallelism and let AQE
      coalesce down / split skew rather than starting at 200.
    - files.maxPartitionBytes 256m: ~400k scan tasks over 100 TB —
      large enough to amortize task overhead, small enough that one
      task's columnar batches fit executor memory with room for the
      shuffle write buffer.
    - advisoryPartitionSizeInBytes 128m: AQE's coalesce/split target;
      post-shuffle partitions land near the scan granule so joins
      and aggs see uniform work.
    - skewJoin factor 5 / threshold 512m: split a straggler
      partition when it is 5x the median AND big in absolute terms —
      catches hot keys (dedup cluster giants, header-like docs)
      without shredding benign variance.
    - autoBroadcastJoinThreshold 64m: every dim in this engine
      (MRRANK/MRSAB/MRDOC, region/nation/supplier, perm tables,
      LSH/IVF centroid frames, benchmark shingle sets) fits; the
      fact tables never do, so 64m is a safe ceiling that keeps
      them off the shuffle.
    - Arrow batch cap 10k rows: bounds pandas-UDF memory for the
      multimodal/vector paths (wide binary/array rows).
    - Kryo + speculation: standard long-job hygiene; speculative
      re-launch masks slow disks on a 1000-node fleet.
    """
    total_cores = executors * executor_cores
    return {
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            128 * 1024 * 1024
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            512 * 1024 * 1024
        ),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.speculation": "true",
    }


def get_spark(
    app_name: str = "umls2rdf-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    AQE is the load-bearing setting: at 100 TB the static shuffle
    partition count is always wrong somewhere, and AQE's runtime
    coalescing + skew-join handling fix it per-stage.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # generated-code cache: the default keeps only 100 compiled
        # WholeStageCodegen classes JVM-wide; a session that cycles
        # through this engine's query surface holds several hundred
        # distinct units, so at 100 every re-run pays full Janino
        # recompilation (measured: the same composed key runs ~2x
        # slower mid-suite than isolated). Scale-independent driver/
        # executor JVM hygiene, not a local[32] tune.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        # PySpark 4 wraps every DataFrame/Column method to capture the
        # Python call site for error messages; each wrapped call costs
        # 3 extra py4j round-trips (conf.get + PySparkCurrentOrigin
        # set/clear) plus a stack walk. The official toggle below
        # exists "to reduce performance slowdown" (pyspark/errors/
        # utils.py); disabling it cut the text_scoring plan build from
        # 14.4s to 10.2s warm (~102k wrapped calls) with no semantic
        # change — only error-message call-site enrichment is lost.
        # Driver-side, scale-independent: plan build latency is the
        # same on local[32] and a 1000-executor cluster.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_SHUFFLE_PARTITIONS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
