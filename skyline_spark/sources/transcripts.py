"""Transcripts sources.

Two ways to obtain the input table of BASELINE.json's ``input_hint``:

1. ``synthetic_transcripts(spark)`` — the deterministic fixture table
   (skyline_spark.synth), used by unit tests and the golden oracle.
2. ``transcripts_from_events(spark, sf_dir)`` — a deterministic
   derivation from the driver-generated ``events`` parquet, expressible
   identically in DuckDB SQL (see DUCKDB_TRANSCRIPTS_SQL) so every
   pipeline operator can be oracle-checked by the correctness driver.

Derivation (pure function of the events table; no wall clock, no rand):
- conv_id   = 'conv-' || event_type || '-' || (user_id % 5)
- turn_idx  = row_number() over (partition by conv_id
                                 order by ts, event_id) - 1
- role      = user/assistant/tool cycling on turn_idx % 3
- tool      = for tool turns, one of search/exec/db/none by
              (user_id + turn_idx) % 4
- text      = 'evt <event_id> metric=<event_type>.turns.rate
               value=<%.2f of value>[ err=E<5xx>]' (err present iff
               event_type = 'error'); %.2f keeps Spark/DuckDB float
               formatting identical
- ts        = events.ts
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skyline_spark.schema import TRANSCRIPTS_SCHEMA
from skyline_spark.synth import fixture_transcripts


def synthetic_transcripts(spark: SparkSession, seed: int = 42,
                          cache_dir: str | None = "/tmp/skyline_fixtures"
                          ) -> DataFrame:
    """Fixture transcripts as a *parquet-backed* DataFrame (the input
    contract is a table scan, and plan-embedded local relations are
    re-serialized on every action — write-once/read-parquet keeps tests
    and benches honest about scan pushdown)."""
    if cache_dir is None:
        return spark.createDataFrame(fixture_transcripts(seed),
                                     schema=TRANSCRIPTS_SCHEMA)
    import os
    path = os.path.join(cache_dir, f"transcripts_seed{seed}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        df = spark.createDataFrame(fixture_transcripts(seed),
                                   schema=TRANSCRIPTS_SCHEMA)
        df.write.mode("overwrite").parquet(path)
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    conv = F.concat(F.lit("conv-"), F.col("event_type"), F.lit("-"),
                    (F.col("user_id") % 5).cast("string"))
    df = ev.withColumn("conv_id", conv)
    w = Window.partitionBy("conv_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    role = F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                        (F.col("turn_idx") % 3) + 1)
    tool = F.when(
        role == "tool",
        F.element_at(F.array(F.lit("search"), F.lit("exec"), F.lit("db"),
                             F.lit("none")),
                     ((F.col("user_id") + F.col("turn_idx")) % 4 + 1).cast("int")))
    err = F.when(F.col("event_type") == "error",
                 F.concat(F.lit(" err=E"),
                          (500 + F.col("event_id") % 5).cast("string")))
    text = F.concat(
        F.lit("evt "), F.col("event_id").cast("string"),
        F.lit(" metric="), F.col("event_type"), F.lit(".turns.rate"),
        F.lit(" value="), F.format_string("%.2f", F.col("value")),
        F.coalesce(err, F.lit("")))
    return df.select(
        "conv_id", "turn_idx", role.alias("role"), text.alias("text"),
        tool.alias("tool"), "ts")


#: the identical derivation in DuckDB SQL — the prefix every oracle query
#: uses as a CTE (the driver registers `events` as a view)
DUCKDB_TRANSCRIPTS_SQL = """
    SELECT
        'conv-' || event_type || '-' || CAST(user_id % 5 AS VARCHAR) AS conv_id,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY 'conv-' || event_type || '-' || CAST(user_id % 5 AS VARCHAR)
            ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
        (['user','assistant','tool'])[(CAST(ROW_NUMBER() OVER (
            PARTITION BY 'conv-' || event_type || '-' || CAST(user_id % 5 AS VARCHAR)
            ORDER BY ts, event_id) - 1 AS INTEGER) % 3) + 1] AS role,
        'evt ' || CAST(event_id AS VARCHAR) || ' metric=' || event_type
            || '.turns.rate value=' || printf('%.2f', value)
            || CASE WHEN event_type = 'error'
                    THEN ' err=E' || CAST(500 + event_id % 5 AS VARCHAR)
                    ELSE '' END AS text,
        CASE WHEN (CAST(ROW_NUMBER() OVER (
                 PARTITION BY 'conv-' || event_type || '-' || CAST(user_id % 5 AS VARCHAR)
                 ORDER BY ts, event_id) - 1 AS INTEGER) % 3) = 2
             THEN (['search','exec','db','none'])[CAST((user_id + (ROW_NUMBER() OVER (
                 PARTITION BY 'conv-' || event_type || '-' || CAST(user_id % 5 AS VARCHAR)
                 ORDER BY ts, event_id) - 1)) % 4 AS INTEGER) + 1]
             ELSE NULL END AS tool,
        ts
    FROM events
"""
