"""Transcripts sources.

Two ways to obtain the input table of BASELINE.json's ``input_hint``:

1. ``synthetic_transcripts(spark)`` — the deterministic fixture table
   (skyline_spark.synth), used by unit tests and the golden oracle.
2. ``transcripts_from_events(spark, sf_dir)`` — a deterministic
   derivation from the driver-generated ``events`` parquet, expressible
   identically in DuckDB SQL (see DUCKDB_TRANSCRIPTS_SQL) so every
   pipeline operator can be oracle-checked by the correctness driver.

Derivation (pure function of the events table; no wall clock, no rand).
The base mapping plus PLANTED downstream variety, so the driver's gate
exercises every routing branch on real data (anomalous, deferred,
TooShort, Stale, Boring, EmptyTimeseries, DeletedByRoomba) instead of
only 'normal':

- conv_id   = 'conv-' || event_type || '-' || (user_id % SPLIT) where
              SPLIT is 40 for 'view' (many short convs -> TooShort at
              sf<=0.01) and 5 otherwise
- row filter: 'conv-click-3' keeps only its first 21 days (last point
              ~9 days before the batch watermark -> Stale, E3);
              'conv-signup-3' keeps only its first 5 days (every point
              outside the 21-day retention window -> DeletedByRoomba)
- turn_idx  = row_number() over (partition by conv_id
                                 order by ts, event_id) - 1, AFTER the
              row filter
- role      = user/assistant/tool cycling on turn_idx % 3
- tool      = for tool turns, one of search/exec/db/none by
              (user_id + turn_idx) % 4
- value'    = 7.0 for the last 150 turns of 'conv-signup-2' (constant
              tail -> Boring, E4); value+2000 for the last 3 turns of
              'conv-purchase-0' (-> anomalous sink) and 'conv-error-0'
              (error.* is a mirage namespace -> deferred sink ->
              second-stage confirm); 'conv-click-0' gets a +300 plateau
              on turns -11..-2 with a final value of 1.0 (-> boundary
              detect_drop_off_cliff fires); value otherwise
- text      = 'evt <event_id> metric=<event_type>.turns.rate
               value=<%.2f of value'>[ err=E<5xx>]' (err present iff
              event_type = 'error'); %.2f keeps Spark/DuckDB float
              formatting identical. 'conv-click-4' texts carry NO
              metric event (-> EmptyTimeseries, E1)
- ts        = events.ts
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds
from skyline_spark.schema import TRANSCRIPTS_SCHEMA
from skyline_spark.synth import fixture_transcripts

#: planted-variety constants (shared by the Spark and DuckDB derivations)
#: purchase-0 -> anomalous sink (slack alerter); error-0 -> deferred
#: (mirage namespace); signup-0 -> ionosphere sink (smtp, non-mirage,
#: ionosphere enabled in the events pipeline)
SPIKE_CONVS = ("conv-purchase-0", "conv-error-0", "conv-signup-0")
SPIKE_OFFSET = 2000.0  # additive: triggers >= 7 of the 9 algorithms
SPIKE_TAIL = 3
BORING_CONV = "conv-signup-2"
BORING_TAIL = 150
BORING_VALUE = 7.0
STALE_CONV = "conv-click-3"
STALE_KEEP_S = 21 * 86400
ROOMBA_CONV = "conv-signup-3"
ROOMBA_KEEP_S = 5 * 86400
NOPARSE_CONV = "conv-click-4"
CLIFF_CONV = "conv-click-0"   # high plateau then last point ~1 -> cliff
CLIFF_LIFT = 300.0
CLIFF_TAIL = 11
VIEW_SPLIT = 40


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


def _conv_expr() -> F.Column:
    """conv_id derivation expression over the raw events columns."""
    split = F.when(F.col("event_type") == "view",
                   F.lit(VIEW_SPLIT)).otherwise(F.lit(5))
    return F.concat(F.lit("conv-"), F.col("event_type"), F.lit("-"),
                    (F.col("user_id") % split).cast("string"))


def events_watermark_scalar(spark: SparkSession, sf_dir: str) -> float:
    """The batch watermark — max(epoch(ts)) over the KEPT transcript
    rows (the oracle's ``batch`` CTE) — computed WITHOUT the per-conv
    window shuffle the derivation pays (r08, guide §2.4).

    ``max(te | kept)`` decomposes exactly: the keep-filter only drops
    rows of the two planted convs (STALE_CONV rows with
    te >= t0 + STALE_KEEP_S, ROOMBA_CONV rows with
    te >= t0 + ROOMBA_KEEP_S, t0 = per-conv min(te)), so

        max_kept = max(max(te | conv not special),
                       max(te | conv special, te < t0_conv + K_conv))

    Job 1 is one partial-aggregated groupBy on a 3-value key (special
    conv name or '__rest') collected driver-side (<= 3 rows —
    config-sized, like the alert-rule collect). A special conv whose
    tmax < t0 + K has no dropped rows, so its kept max is tmax and no
    second pass is needed; otherwise job 2 re-scans only that conv's
    rows under te < t0 + K. Two pruned aggregate scans replace a
    full-table Exchange + Sort + Window. Doubles all the way (epoch
    cast, + K, <) with IEEE-identical Python arithmetic, and ``max`` is
    fold-order-exact, so the value is bit-identical to
    ``transcripts_from_events(...).agg(max(epoch(ts)))``; drop-in for
    ``batch_now(transcripts_from_events(spark, sf_dir))``."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    conv = _conv_expr()
    te = epoch_seconds(F.col("ts"))
    k = (F.when(conv == STALE_CONV, F.lit(STALE_CONV))
         .when(conv == ROOMBA_CONV, F.lit(ROOMBA_CONV))
         .otherwise(F.lit("__rest")))
    by_k = {r["k"]: r for r in
            ev.groupBy(k.alias("k"))
              .agg(F.min(te).alias("t0"), F.max(te).alias("tmax"))
              .collect()}
    cand = []
    if "__rest" in by_k:
        cand.append(by_k["__rest"]["tmax"])
    trimmed = []  # special convs with dropped rows -> need the real max
    for name, keep_s in ((STALE_CONV, STALE_KEEP_S),
                         (ROOMBA_CONV, ROOMBA_KEEP_S)):
        if name not in by_k:
            continue
        lim = by_k[name]["t0"] + keep_s
        if by_k[name]["tmax"] < lim:
            cand.append(by_k[name]["tmax"])
        else:
            trimmed.append((name, lim))
    if trimmed:
        cond = None
        for name, lim in trimmed:
            c = (conv == name) & (te < F.lit(lim))
            cond = c if cond is None else (cond | c)
        m = ev.where(cond).agg(F.max(te)).first()[0]
        if m is not None:
            cand.append(m)
    return float(max(cand))


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = ev.withColumn("conv_id", _conv_expr())

    # All three per-conv window passes share ONE ordering spec
    # (conv_id, ts asc, event_id asc) so the physical plan is a single
    # Exchange + a single Sort (r08: previously min-over-partition +
    # an extra DESC row_number forced three sorts of the full input):
    # - t0 is first(epoch) over the running frame (== min, ts-ordered);
    # - turn_idx is the ASC row_number after the keep-filter;
    # - __rnd (the DESC rank) is count-over-partition - turn_idx, exact
    #   because (ts, event_id) totally orders rows within a conv.
    w = Window.partitionBy("conv_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    te = epoch_seconds(F.col("ts"))
    t0 = F.first(te).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    keep = ~(
        ((F.col("conv_id") == STALE_CONV) & (te >= t0 + STALE_KEEP_S))
        | ((F.col("conv_id") == ROOMBA_CONV) & (te >= t0 + ROOMBA_KEEP_S)))
    df = df.withColumn("__keep", keep).where(F.col("__keep")).drop("__keep")

    cnt = F.count(F.lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    df = df.withColumn("__rnd", cnt - F.col("turn_idx"))
    role = F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                        (F.col("turn_idx") % 3) + 1)
    tool = F.when(
        role == "tool",
        F.element_at(F.array(F.lit("search"), F.lit("exec"), F.lit("db"),
                             F.lit("none")),
                     ((F.col("user_id") + F.col("turn_idx")) % 4 + 1).cast("int")))
    value2 = (
        F.when((F.col("conv_id") == CLIFF_CONV) & (F.col("__rnd") == 1),
               F.lit(1.0))
        .when((F.col("conv_id") == CLIFF_CONV)
              & (F.col("__rnd") <= CLIFF_TAIL),
              F.col("value") + CLIFF_LIFT)
        .when((F.col("conv_id") == BORING_CONV)
              & (F.col("__rnd") <= BORING_TAIL), F.lit(BORING_VALUE))
        .when(F.col("conv_id").isin(*SPIKE_CONVS)
              & (F.col("__rnd") <= SPIKE_TAIL),
              F.col("value") + SPIKE_OFFSET)
        .otherwise(F.col("value")))
    err = F.when(F.col("event_type") == "error",
                 F.concat(F.lit(" err=E"),
                          (500 + F.col("event_id") % 5).cast("string")))
    text = F.when(
        F.col("conv_id") == NOPARSE_CONV,
        F.concat(F.lit("evt "), F.col("event_id").cast("string"),
                 F.lit(" raw"))
    ).otherwise(F.concat(
        F.lit("evt "), F.col("event_id").cast("string"),
        F.lit(" metric="), F.col("event_type"), F.lit(".turns.rate"),
        F.lit(" value="), F.format_string("%.2f", value2),
        F.coalesce(err, F.lit(""))))
    return df.select(
        "conv_id", "turn_idx", role.alias("role"), text.alias("text"),
        tool.alias("tool"), "ts")


#: the identical derivation in DuckDB SQL — the prefix every oracle query
#: uses as a CTE (the driver registers `events` as a view)
DUCKDB_TRANSCRIPTS_SQL = f"""
    WITH __ev AS (
        SELECT *,
               'conv-' || event_type || '-' || CAST(user_id % (
                   CASE WHEN event_type = 'view' THEN {VIEW_SPLIT}
                        ELSE 5 END) AS VARCHAR) AS conv_id,
               epoch(ts) AS __te,
               min(epoch(ts)) OVER (
                   PARTITION BY 'conv-' || event_type || '-' || CAST(user_id % (
                       CASE WHEN event_type = 'view' THEN {VIEW_SPLIT}
                            ELSE 5 END) AS VARCHAR)) AS __t0
        FROM events),
    __kept AS (
        SELECT * FROM __ev
        WHERE NOT ((conv_id = '{STALE_CONV}' AND __te >= __t0 + {STALE_KEEP_S})
                OR (conv_id = '{ROOMBA_CONV}' AND __te >= __t0 + {ROOMBA_KEEP_S}))),
    __idx AS (
        SELECT *,
               CAST(ROW_NUMBER() OVER (PARTITION BY conv_id
                                       ORDER BY ts, event_id) - 1 AS INTEGER)
                   AS turn_idx,
               ROW_NUMBER() OVER (PARTITION BY conv_id
                                  ORDER BY ts DESC, event_id DESC) AS __rnd
        FROM __kept),
    __val AS (
        SELECT *,
               CASE WHEN conv_id = '{CLIFF_CONV}' AND __rnd = 1
                        THEN 1.0
                    WHEN conv_id = '{CLIFF_CONV}' AND __rnd <= {CLIFF_TAIL}
                        THEN value + {CLIFF_LIFT}
                    WHEN conv_id = '{BORING_CONV}' AND __rnd <= {BORING_TAIL}
                        THEN {BORING_VALUE}
                    WHEN conv_id IN {SPIKE_CONVS!r} AND __rnd <= {SPIKE_TAIL}
                        THEN value + {SPIKE_OFFSET}
                    ELSE value END AS __v2
        FROM __idx)
    SELECT
        conv_id,
        turn_idx,
        (['user','assistant','tool'])[(turn_idx % 3) + 1] AS role,
        CASE WHEN conv_id = '{NOPARSE_CONV}'
             THEN 'evt ' || CAST(event_id AS VARCHAR) || ' raw'
             ELSE 'evt ' || CAST(event_id AS VARCHAR) || ' metric=' || event_type
                  || '.turns.rate value=' || printf('%.2f', __v2)
                  || CASE WHEN event_type = 'error'
                          THEN ' err=E' || CAST(500 + event_id % 5 AS VARCHAR)
                          ELSE '' END
        END AS text,
        CASE WHEN (turn_idx % 3) = 2
             THEN (['search','exec','db','none'])[
                 CAST((user_id + turn_idx) % 4 AS INTEGER) + 1]
             ELSE NULL END AS tool,
        ts
    FROM __val
"""
