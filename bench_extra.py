"""Extra benchmarks for the optimization round (guide §1.4 noop-sink
isolation + plan capture). NOT the driver's bench — bench.py stays
frozen; this file exists so OPTIMIZATION_r08.md numbers and the
plans/r08/*.txt artifacts are reproducible.

Usage:
    python bench_extra.py [--plans-dir plans/r08 --suffix before]
                          [--queries q1,q7] [--runs 3]

Prints one JSON line with {query: {min, samples}} and writes
<plans-dir>/<query>_<suffix>.txt with explain("formatted") output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from skyline_spark import queries as Q
    from skyline_spark.session import get_spark
    spark = get_spark(app_name="skyline_spark_bench_extra",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)

    # identical input materialization to bench.py (untimed)
    replicas = int(os.environ.get("SPARK_GRAFT_REPLICAS", "20"))
    from skyline_spark.sources.transcripts import transcripts_from_events
    base = transcripts_from_events(spark, sf_dir)
    rep = spark.range(replicas).select(F.col("id").cast("int").alias("replica"))
    replicated = base.crossJoin(rep).withColumn(
        "conv_id", F.concat_ws("-", "conv_id", F.col("replica").cast("string"))
    ).drop("replica")
    import tempfile
    tdir = tempfile.mkdtemp(prefix="skyline_benchx_")
    base.repartition(cpus).write.mode("overwrite").parquet(f"{tdir}/t1")
    replicated.repartition(cpus * 4).write.mode("overwrite") \
        .parquet(f"{tdir}/tR")
    t1 = spark.read.parquet(f"{tdir}/t1")
    tR = spark.read.parquet(f"{tdir}/tR")

    def pipeline_turns(tdf):
        from skyline_spark.plans.pipeline import run_pipeline
        from skyline_spark.queries import _events_alert_config, _events_cfg
        res = run_pipeline(spark, tdf, _events_alert_config(spark),
                           _events_cfg())
        return res.routed_turns

    def minhash_production():
        from skyline_spark.operators.dedup import minhash_near_duplicates
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_near_duplicates(docs, threshold=0.4)

    # q8r (VERDICT r07 item 4): the dedup chain end-to-end at 20x docs —
    # minhash -> LSH pairs -> connected components. Documents replicated
    # with a per-replica token prefix so replicas do NOT collapse into
    # one giant near-dup bucket (each replica set has its own clusters).
    def dedup_chain_scaled():
        from skyline_spark.operators.dedup import (
            minhash_near_duplicates,
            near_duplicate_clusters,
        )
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        r = spark.range(replicas).select(
            F.col("id").cast("int").alias("rep"))
        big = (docs.crossJoin(r)
               .withColumn("doc_id",
                           F.col("doc_id") * replicas + F.col("rep"))
               .withColumn("text", F.concat(F.lit("rep"),
                                            F.col("rep").cast("string"),
                                            F.lit("x "), F.col("text")))
               .drop("rep"))
        pairs = minhash_near_duplicates(big, threshold=0.4)
        return near_duplicate_clusters(big, pairs)

    # q1s (VERDICT r07 item 5): hot-key skew — one synthetic conv_id
    # holding ~30% of all turns through the full pipeline.
    def pipeline_skewed():
        hot = tR.withColumn(
            "conv_id",
            F.when(F.xxhash64("conv_id", "turn_idx") % 10 < 3,
                   F.lit("conv-hot-0")).otherwise(F.col("conv_id")))
        return pipeline_turns(hot)

    makers = {
        "q1_pipeline_end_to_end": lambda: pipeline_turns(t1),
        f"q1r_pipeline_replicated_{replicas}x": lambda: pipeline_turns(tR),
        "q2_parse_events": lambda: Q.q_parse(spark, sf_dir),
        "q3_exception_filters": lambda: Q.q_exceptions(spark, sf_dir),
        "q4_downsample_1h": lambda: Q.q_downsample_1h(spark, sf_dir),
        "q5_flux_aggregate_1h": lambda: Q.q_flux_aggregate_1h(spark, sf_dir),
        "q6_least_squares": lambda: Q.q_least_squares(spark, sf_dir),
        "q7_correlate_pearson": lambda: Q.q_correlate(spark, sf_dir),
        "q8_minhash_near_dups": minhash_production,
        "q9_cosine_topk": lambda: Q.q_cosine_topk(spark, sf_dir),
        f"q8r_dedup_chain_{replicas}x": dedup_chain_scaled,
        "q1s_pipeline_hot_key": pipeline_skewed,
    }
    only = {q.strip() for q in args.queries.split(",") if q.strip()}
    if only:
        makers = {k: v for k, v in makers.items()
                  if k in only or k.split("_")[0] in only}

    # warmup: python workers, codegen, shuffle dirs
    pipeline_turns(t1.limit(2000)).write.mode("overwrite") \
        .format("noop").save()

    out: dict[str, dict] = {}
    for name, make in makers.items():
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = make()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        samples = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            make().write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(f"# {name}: min={min(samples)} samples={samples}",
              file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
