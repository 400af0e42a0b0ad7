"""The combined ionosphere stage — one disposition per series from the
three matchers the reference's spin_process runs per anomaly:

1. motif inference (skyline/ionosphere/ionosphere.py dispatches
   ionosphere_motif_inference FIRST when IONOSPHERE_INFERENCE_MOTIFS
   is enabled — a matched motif short-circuits the feature comparison),
2. the features-profile percent-similar comparison
   (skyline/ionosphere/ionosphere.py:2550-2710 analogue, the echo flow
   already carried by operators/features_profile.ionosphere_match),
3. the D/D1/E layers rules (run only when the features comparison did
   not match — skyline/ionosphere/ionosphere.py layers dispatch).

A match by ANY matcher suppresses the anomaly; the disposition label
records WHICH matcher fired, in the reference's check order.

Each component keeps the exact input conventions of its standalone
operator (features over the raw valid events; layers and motifs over
the per-(series, ts) deduped series), so the standalone oracles and
this combined one share their SQL blocks verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def ionosphere_stage(valid: DataFrame, layers_cfg: DataFrame,
                     motif_settings: dict | None = None,
                     percent_similar: float = 10.0,
                     train_frac: float = 0.6,
                     layers_join_on: str = "family") -> DataFrame:
    """(conv_id, metric, motif_matched, fp_matched, layer_matched,
    disposition) per series in ``valid`` — disposition is
    'motif' / 'fp' / 'layers' (first matcher in check order) or
    'anomalous'."""
    from skyline_spark.operators.features_profile import (
        feature_profiles,
        ionosphere_match,
    )
    from skyline_spark.operators.layers import run_layer_algorithms
    from skyline_spark.operators.motifs import ionosphere_motif_inference

    anoms = valid.groupBy("conv_id").agg(F.max("metric").alias("metric"))

    # features: raw valid events, trained = the train_frac time head
    cur = feature_profiles(valid)
    t01 = valid.groupBy("conv_id").agg(
        F.min(epoch_seconds(F.col("ts"))).alias("__t0"),
        F.max(epoch_seconds(F.col("ts"))).alias("__t1"))
    head = valid.join(t01, "conv_id").where(
        epoch_seconds(F.col("ts"))
        <= F.col("__t0") + train_frac * (F.col("__t1") - F.col("__t0")))
    trained = feature_profiles(head.drop("__t0", "__t1"))
    fp = ionosphere_match(anoms, trained, cur,
                          percent_similar=percent_similar) \
        .select("conv_id", "metric",
                F.col("ionosphere_matched").alias("fp_matched"))

    # layers + motifs: deduped first-per-ts series
    wd = Window.partitionBy("conv_id", "metric", "ts").orderBy("turn_idx")
    dedup = (valid.withColumn("__dd", F.row_number().over(wd))
             .where(F.col("__dd") == 1).drop("__dd"))
    lay_in = dedup.withColumn(
        layers_join_on, F.split("metric", "\\.").getItem(0))
    lay = (run_layer_algorithms(lay_in, layers_cfg,
                                join_on=layers_join_on)
           .groupBy("conv_id", "metric")
           .agg(F.max(F.col("layer_matched").cast("int")).alias("__l")))
    mot = (ionosphere_motif_inference(dedup, settings=motif_settings,
                                      train_frac=train_frac)
           .groupBy("conv_id", "metric")
           .agg(F.max(F.col("matched").cast("int")).alias("__m")))

    out = (anoms.join(fp, ["conv_id", "metric"], "left")
           .join(lay, ["conv_id", "metric"], "left")
           .join(mot, ["conv_id", "metric"], "left"))
    motif_m = F.coalesce(F.col("__m") == 1, F.lit(False))
    fp_m = F.coalesce(F.col("fp_matched"), F.lit(False))
    layer_m = F.coalesce(F.col("__l") == 1, F.lit(False))
    return out.select(
        "conv_id", "metric",
        motif_m.alias("motif_matched"),
        fp_m.alias("fp_matched"),
        layer_m.alias("layer_matched"),
        F.when(motif_m, "motif").when(fp_m, "fp")
        .when(layer_m, "layers").otherwise("anomalous")
        .alias("disposition"))
