"""SparkSession factory tuned for this engine.

Local-mode testing runs on local[N]; the configs below are the ones that
also matter on a real multi-executor cluster (AQE, skew handling, Arrow
batching for the pandas-UDF analyze stage, shuffle-partition sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _pin_blas_threads() -> None:
    """One BLAS/OpenMP thread per python worker. Without this, every
    Arrow worker spins up its own OpenBLAS pool (N workers × N BLAS
    threads) and the analyze stage ANTI-scales with core count —
    measured 134 s -> 27 s at local[32] on the 8M-turn bench."""
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")


def get_spark(app_name: str = "skyline_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    _pin_blas_threads()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism, not the 200 default — at cluster scale this
        # is sized so a shuffle partition of the conv_id group-by fits in
        # executor memory (series are bounded by the full_duration trim)
        try:
            n = master.split("[", 1)[1].rstrip("]")
            shuffle_partitions = cpus if n == "*" else int(n)
        except (IndexError, ValueError):
            shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # one BLAS thread per python worker (see _pin_blas_threads) —
        # also pushed to executor env for real-cluster parity
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # split large files finer so scan/parse parallelism matches the
        # core count rather than the writer's file layout
        .config("spark.sql.files.maxPartitionBytes", "32m")
        # AQE partition coalescing floor (guide §2.2): with
        # parallelismFirst the coalesce target is max(total/parallelism,
        # minPartitionSize); the 1 MB default floor collapses small
        # shuffles (dimension aggregations, window stages over
        # series-cardinality data) to 1-2 tasks, serializing whole
        # post-shuffle stages while the rest of the cluster idles. 64k
        # keeps those stages at cluster width; large shuffles are sized
        # by total/parallelism and never touch the floor. Overridable
        # per deployment via SPARK_GRAFT_MIN_PARTITION_SIZE.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
