"""SparkSession factory tuned for this engine.

Local-mode test/bench sessions; on a real cluster the same builder is used
minus the master override (spark-submit supplies it).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "pgfts_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Defaults: AQE on (runtime coalesce + skew-join splitting), Arrow on
    (vectorized pandas-UDF transfer), shuffle partitions sized to the local
    core count instead of the 200 default (local mode has no network
    shuffle — oversplitting only adds task overhead).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] → cpu count; else leave a cluster-ish default
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cpus if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # Broadcast decisions are AQE-ONLY: the static planner's file-size
        # estimates pick the wrong build side exactly when it matters
        # (measured here: a 600k-row fact table statically chosen as the
        # hashed-relation build side over a 37k-row filtered dim-join
        # output, ~1.5x the query's wall; at cluster scale the same
        # mis-estimate is an executor OOM). With the static threshold off,
        # joins plan as shuffles and AQE converts to broadcast from the
        # REAL materialized sizes — the estimate-vs-reality gap that bit
        # the blockagg semi-join in round 4 (bm25.py:390-404) cannot
        # recur, and explicit F.broadcast hints still apply unchanged.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024),
        )
        # Text pipelines do ~100× more work per scanned byte than plain SQL
        # (tokenize, hash, encode), so the default 128 MB file bin-packing
        # yields a handful of scan tasks on compressed text and starves the
        # cores. 16 MB keeps scan-side stages as parallel as the cluster.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("PGFTS_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
    )
    # Shuffle scratch on tmpfs when available: the sandbox's virtual disk
    # (~200 MB/s) throttles shuffle-heavy stages far below what any real
    # cluster's local NVMe provides; RAM-backed scratch removes that
    # artificial I/O wall (local-mode only concern).
    shm = os.environ.get("PGFTS_LOCAL_DIR", "/dev/shm/pgfts-spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    except OSError:
        pass
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
