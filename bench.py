"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total seconds), "unit": "sec",
"queries": {name: sec}, "sf", plus throughput extras}.

The headline is the end-to-end parse->enrich->analyze->route pipeline
(BASELINE.json metric: parse->route throughput in turns/sec).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from pyspark.sql import functions as F

    from skyline_spark import queries as Q
    from skyline_spark.session import get_spark
    spark = get_spark(app_name="skyline_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    timings: dict[str, float] = {}
    n_turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # ---- input cardinalities (cheap aggregations, NOT timed) ----------
    # recorded so every BENCH_rN is self-attributing: a per-query wall
    # change can be traced to input growth vs plan regression (the r02
    # q7 2.5x was untraceable from artifacts alone — it was the planted
    # view%40 split growing the correlate pair-set 214k -> 562k rows)
    from skyline_spark import queries as Qm
    from skyline_spark.operators import preprocess as _pp
    valid = Qm._valid(spark, sf_dir)
    n_valid = valid.count()
    n_series = valid.select("conv_id").distinct().count()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    hourly = _pp.downsample(valid, 3600, method="mean")
    per_bucket = hourly.groupBy("bucket_start").count()
    q7_pairs = int(per_bucket.agg(F.sum(
        F.col("count") * (F.col("count") - 1) / 2)).first()[0] or 0)
    inputs = {"events": n_turns, "valid_events": n_valid,
              "series": n_series, "documents": n_docs,
              "embeddings": n_emb, "q7_pair_rows": q7_pairs}

    fast = os.environ.get("SPARK_GRAFT_BENCH_FAST", "") == "1"

    # ---- per-query host telemetry (machine-checkable phase evidence) --
    # Three rounds running, per-query driver wall times have whipsawed
    # 15-85% with shared-VM host phase while the code paths were
    # commit-verified untouched (r03 q2/q4, r04 q1, r05 all ten). The
    # attribution lived in prose + out-of-band vmstat runs; from r06
    # the bench carries a /proc/stat user/idle/steal/iowait delta +
    # loadavg around EVERY timed sample, so "host phase" is verifiable
    # from the artifacts alone. steal>2% on the picked sample also
    # triggers an extra resample (foreign load by definition — idle%
    # can't discriminate: our own local[32] job owns the cores).
    #
    # Emission shape (r07 fix): r06 inlined the full telemetry into the
    # single stdout JSON line, which outgrew the driver's tail-capture
    # window and truncated away the summary head (BENCH_r06.json came
    # back parsed:null). The stdout line is now the COMPACT summary
    # only (metric/value/queries/inputs/throughput + the picked-sample
    # index per query for cross-reference), printed LAST; the full
    # per-sample telemetry goes to a side artifact
    # ($SPARK_GRAFT_BENCH_HOST_OUT, default BENCH/BENCH_host_latest.json).
    from skyline_spark.hostprobe import host_delta as _host_delta
    from skyline_spark.hostprobe import host_probe as _host_probe

    host: dict[str, dict] = {}
    run_probe_start = _host_probe()

    def timed(name: str, make_df, runs: int = 2) -> None:
        # the sandbox host has noisy multi-second stalls: take min of 2
        # runs, a 3rd when the first two disagree > 20% (the r03
        # q2/q4 +24%/+27% phantom regressions sat under the old 50%
        # trigger), and a 3rd when the would-be pick saw steal
        samples: list[float] = []
        probes: list[dict] = []
        for i in range(1 if fast else runs + 1):
            if i == runs:
                best = min(range(len(samples)), key=samples.__getitem__)
                noisy = (samples[best] > 1e-9
                         and (max(samples) / samples[best]) >= 1.2)
                stolen = probes[best]["steal_pct"] > 2.0
                if not (noisy or stolen):
                    break
                if sum(samples) > 150:
                    break
            spark.catalog.clearCache()  # fresh run, no leaked persists
            p0 = _host_probe()
            t0 = time.perf_counter()
            df = make_df()
            # force full materialization without collecting payloads
            df.write.mode("overwrite").format("noop").save()
            sec = time.perf_counter() - t0
            probe = _host_delta(p0, _host_probe())
            probe["sec"] = round(sec, 3)
            samples.append(sec)
            probes.append(probe)
            if sec > 60:  # stay within the harness budget
                break
        picked = min(range(len(samples)), key=samples.__getitem__)
        timings[name] = round(samples[picked], 3)
        host[name] = {"picked": picked, "samples": probes}

    # Input materialization (NOT timed): the pipeline's contract input is
    # a transcripts *table* (Iceberg/parquet); the events->transcripts
    # derivation is test-harness scaffolding. The replicated variant
    # fans the series population out R× (same lengths) so sustained
    # throughput is measured where fixed job overhead amortizes.
    replicas = int(os.environ.get("SPARK_GRAFT_REPLICAS", "20"))
    from skyline_spark.sources.transcripts import transcripts_from_events
    base = transcripts_from_events(spark, sf_dir)
    rep = spark.range(replicas).select(F.col("id").cast("int").alias("replica"))
    replicated = base.crossJoin(rep).withColumn(
        "conv_id", F.concat_ws("-", "conv_id", F.col("replica").cast("string"))
    ).drop("replica")
    import tempfile
    tdir = tempfile.mkdtemp(prefix="skyline_bench_")
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

    # untimed warmup: spin up python workers, JIT codegen, shuffle dirs
    pipeline_turns(t1.limit(2000)).write.mode("overwrite").format("noop").save()

    timed("q1_pipeline_end_to_end", lambda: pipeline_turns(t1))
    timed(f"q1r_pipeline_replicated_{replicas}x",
          lambda: pipeline_turns(tR))
    timed("q2_parse_events", lambda: Q.q_parse(spark, sf_dir))
    timed("q3_exception_filters", lambda: Q.q_exceptions(spark, sf_dir))
    timed("q4_downsample_1h", lambda: Q.q_downsample_1h(spark, sf_dir))
    timed("q5_flux_aggregate_1h", lambda: Q.q_flux_aggregate_1h(spark, sf_dir))
    timed("q6_least_squares", lambda: Q.q_least_squares(spark, sf_dir))
    timed("q7_correlate_pearson", lambda: Q.q_correlate(spark, sf_dir))
    def minhash_production():
        # the PRODUCTION xxhash64 path (the registry query runs the
        # md5 hash mode so DuckDB can value-check it — ~6x slower)
        from skyline_spark.operators.dedup import minhash_near_duplicates
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_near_duplicates(docs, threshold=0.4)

    timed("q8_minhash_near_dups", minhash_production)
    timed("q9_cosine_topk", lambda: Q.q_cosine_topk(spark, sf_dir))

    # primary input table per query (rows), keyed like `queries`
    input_rows = {
        "q1_pipeline_end_to_end": n_turns,
        f"q1r_pipeline_replicated_{replicas}x": n_turns * replicas,
        "q2_parse_events": n_turns,
        "q3_exception_filters": n_valid,
        "q4_downsample_1h": n_valid,
        "q5_flux_aggregate_1h": n_turns,
        "q6_least_squares": n_valid,
        "q7_correlate_pearson": q7_pairs,
        "q8_minhash_near_dups": n_docs,
        "q9_cosine_topk": n_emb,
    }

    total = round(sum(timings.values()), 3)
    run_host = _host_delta(run_probe_start, _host_probe())

    # full per-sample telemetry -> side artifact (never on stdout: the
    # driver captures only the tail of stdout, and the telemetry block
    # is bigger than that window — see r06 post-mortem above)
    host_out = os.environ.get("SPARK_GRAFT_BENCH_HOST_OUT",
                              os.path.join(os.path.dirname(
                                  os.path.abspath(__file__)),
                                  "BENCH", "BENCH_host_latest.json"))
    host_payload = {"host": host, "host_whole_run": run_host,
                    "queries": timings, "sf": sf, "cpus": cpus}
    try:
        os.makedirs(os.path.dirname(host_out), exist_ok=True)
        with open(host_out, "w") as fh:
            json.dump(host_payload, fh, indent=1)
    except OSError as exc:  # never let telemetry sink a bench run
        print(f"host telemetry write failed: {exc}", file=sys.stderr)
        host_out = None

    out = {
        "metric": "end-to-end parse->route pipeline + headline operators, total wall seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "inputs": inputs,
        "input_rows": input_rows,
        "sf": sf,
        "turns": n_turns,
        "pipeline_turns_per_sec": round(n_turns / timings["q1_pipeline_end_to_end"], 1),
        "sustained_turns_per_sec": round(
            n_turns * replicas / timings[f"q1r_pipeline_replicated_{replicas}x"], 1),
        "replicas": replicas,
        "cpus": cpus,
        # picked-sample index per query + whole-run host summary; the
        # per-sample /proc/stat deltas live in host_telemetry_path
        # (keyed by query name, samples[host_picked[q]] is the timed one)
        "host_picked": {q: h["picked"] for q, h in host.items()},
        "host_whole_run": run_host,
        "host_telemetry_path": host_out,
    }
    # COMPACT summary as the LAST stdout line (driver tail-captures)
    sys.stdout.flush()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
