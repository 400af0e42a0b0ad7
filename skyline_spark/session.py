"""SparkSession factory tuned for this engine.

Local-mode testing runs on local[N]; the configs below are the ones that
also matter on a real multi-executor cluster (AQE, skew handling, Arrow
batching for the pandas-UDF analyze stage, shuffle-partition sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "skyline_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
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
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
