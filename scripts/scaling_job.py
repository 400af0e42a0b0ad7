"""The scaling-evidence job: one full parse -> enrich -> analyze ->
route pipeline run over a replicated transcripts table, executed via

    spark-submit --master local[N] --py-files dist/skyline_spark.zip \
        scripts/scaling_job.py <cores> <sf_dir> <replicas> <out_json>

Prints one JSON line with turns/sec. The identical job is run at two
parallelism levels (N and 4N cores) by scripts/scaling_bench.py — the
sandbox substitute for the north_rule's N vs 4N executor criterion
(BASELINE.md 'Scaling-evidence protocol').
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    cores = int(sys.argv[1])
    sf_dir = sys.argv[2]
    replicas = int(sys.argv[3])
    out_json = sys.argv[4]
    input_dir = sys.argv[5]

    from pyspark.sql import SparkSession

    from skyline_spark.plans.pipeline import run_pipeline
    from skyline_spark.queries import _events_alert_config, _events_cfg
    from skyline_spark.session import _pin_blas_threads

    _pin_blas_threads()
    spark = (
        SparkSession.builder
        .appName(f"skyline_scaling_{cores}")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    tdf = spark.read.parquet(input_dir)
    n_turns = tdf.count()

    def run_once() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        res = run_pipeline(spark, tdf, _events_alert_config(spark),
                           _events_cfg())
        res.routed_turns.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    from skyline_spark.hostprobe import host_delta, host_probe

    run_once()  # warmup: python workers + codegen
    p0 = host_probe()
    wall = run_once()
    host = host_delta(p0, host_probe())

    out = {"cores": cores, "replicas": replicas, "turns": n_turns,
           "wall_sec": round(wall, 3),
           "turns_per_sec": round(n_turns / wall, 1),
           # /proc/stat delta + loadavg around the TIMED run: the
           # machine-checkable host-phase evidence the per-round
           # artifacts carry (steal>0 or foreign load = co-tenant
           # burst, not plan change)
           "host": host}
    with open(out_json, "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
