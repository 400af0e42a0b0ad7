"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k per query — the correctness
  baseline. Dot products via native F.zip_with + F.aggregate (JVM-side,
  no Python); queries are broadcast.
- lsh_topk: random-hyperplane LSH bucketing as the scale path —
  hyperplanes are a deterministic (seeded) literal matrix; bucket join
  restricts candidates, then exact cosine re-ranks within buckets.

Scale notes: brute force is O(N·Q) — fine when Q (queries) is small and
broadcastable; the LSH variant's shuffle key is the bucket signature, so
candidate generation is one bucket-join, not a cross join. For very
large N, IVF-style partition pruning falls out of bucketing the table by
signature prefix.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest other
    vectors. queries is broadcast (small); rank ties broken by id."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    c = embeddings.select(F.col(id_col).alias("cand_id"),
                          F.col(vec_col).alias("cvec"))
    # round to 4 dp BEFORE ranking (ties broken by cand_id): the raw dot
    # product differs from other engines' fold order by ~1 ulp, which at
    # 6 dp can straddle a rounding boundary (oracle hash mismatch seen at
    # exactly one 0.xxxxx45 value); 4 dp makes the comparison robust while
    # keeping the ranking deterministic on both sides
    scored = (c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
              .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 4) + F.lit(0.0)))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("cand_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "sim", "rank"))


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(0, 1, (n_planes, dim)).round(6).tolist()


def with_lsh_signature(embeddings: DataFrame, planes: list[list[float]],
                       vec_col: str = "embedding") -> DataFrame:
    """Sign-of-dot-product bucket signature (one long) per vector —
    native expressions only; the hyperplane matrix rides along as
    literals (dimension-sized, tiny)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col), plane) > 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bits.append(bit)
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseXOR(b)
    return embeddings.withColumn("lsh_sig", sig)


def with_lsh_signatures(df: DataFrame, dim: int, n_planes: int,
                        n_tables: int, seed: int,
                        vec_col: str = "embedding") -> DataFrame:
    """(table, signature) pairs per vector — OR-amplified LSH: a
    candidate matches if it shares a bucket in ANY of the n_tables
    independent hyperplane sets (standard recall amplification)."""
    out = df
    sig_cols = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        out = with_lsh_signature(out, planes, vec_col) \
            .withColumnRenamed("lsh_sig", f"__sig{t}")
        sig_cols.append(f"__sig{t}")
    return out.withColumn(
        "table_sig",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"), F.col(c).alias("sig"))
            for t, c in enumerate(sig_cols)]))
    ).drop(*sig_cols).withColumn("tbl", F.col("table_sig.tbl")) \
        .withColumn("sig", F.col("table_sig.sig")).drop("table_sig")


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
             n_planes: int = 6, n_tables: int = 4, dim: int = 64,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN: bucket-join on (table, hyperplane signature) across
    n_tables OR-amplified tables, exact cosine re-rank on the candidate
    union. Recall < 1 by design; pytest checks recall@1 against brute
    force plus a planted exact neighbor."""
    c = with_lsh_signatures(
        embeddings.select(F.col(id_col).alias("cand_id"),
                          F.col(vec_col).alias("cvec")),
        dim, n_planes, n_tables, seed, "cvec")
    q = with_lsh_signatures(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec")),
        dim, n_planes, n_tables, seed, "qvec")
    cands = (c.join(F.broadcast(q), ["tbl", "sig"])
             .where(F.col("cand_id") != F.col("query_id"))
             .select("query_id", "qvec", "cand_id", "cvec").distinct())
    scored = cands.withColumn(  # 4 dp before ranking (see brute_force_topk)
        "sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 4) + F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("cand_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "sim", "rank"))


def assign_cells(vectors: DataFrame, centroids: DataFrame,
                 nprobe: int = 1, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: assign each vector to its ``nprobe``
    nearest centroids by cosine (centroids are list-cardinality ->
    broadcast; the 'join' is a C-way expression fan-out, never an
    all-pairs shuffle). Output: (id, vec, cell, cell_rank)."""
    c = centroids.select(F.col("cell"), F.col("centroid"))
    scored = vectors.join(F.broadcast(c)).withColumn(
        "__sim", cosine(F.col(vec_col), F.col("centroid")))
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(),
                                           F.col("cell").asc())
    return (scored.withColumn("cell_rank", F.row_number().over(w))
            .where(F.col("cell_rank") <= nprobe)
            .select(id_col, vec_col, "cell", "cell_rank"))


def kmeans_centroids(embeddings: DataFrame, n_cells: int = 8,
                     iters: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Deterministic Lloyd k-means for the IVF coarse quantizer:
    init = the n_cells lowest-id vectors, then ``iters`` rounds of
    (distributed nearest-centroid assignment) -> (per-cell mean via
    posexplode/avg). Centroids are k×dim — collected (config-sized)
    between rounds so the lineage stays flat; every per-vector step is
    a broadcast join, no all-pairs shuffle."""
    spark = embeddings.sparkSession
    vecs = embeddings.select(F.col(id_col).alias("__id"),
                             F.col(vec_col).alias("__v"))
    init = (vecs.orderBy("__id").limit(n_cells).collect())
    cents = [(i, [float(x) for x in r["__v"]]) for i, r in enumerate(init)]
    for _ in range(iters):
        cdf = spark.createDataFrame(cents, "cell int, centroid array<double>")
        assigned = assign_cells(vecs, cdf, nprobe=1,
                                id_col="__id", vec_col="__v")
        pos = assigned.select(
            "cell", F.posexplode(F.col("__v")).alias("pos", "x"))
        mean = (pos.groupBy("cell", "pos").agg(F.avg("x").alias("m"))
                .groupBy("cell")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                     .alias("pm")))
        rows = mean.select(
            "cell", F.transform("pm", lambda s: s["m"]).alias("centroid")
        ).collect()
        new = {r.cell: list(r.centroid) for r in rows}
        cents = [(c, new.get(c, v)) for c, v in cents]
    return spark.createDataFrame(cents, "cell int, centroid array<double>")


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
             nprobe: int = 2, n_cells: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> DataFrame:
    """IVF ANN top-k: k-means coarse quantizer, data vectors live in
    their single nearest cell, queries probe their ``nprobe`` nearest
    cells, exact cosine re-rank within probed cells. The shuffle key is
    the cell id — candidate generation is a cell equi-join
    (|cells| × avg cell size work), never N×Q. Recall < 1 by design;
    pytest measures recall@1 vs brute force."""
    cents = kmeans_centroids(embeddings, n_cells=n_cells,
                             id_col=id_col, vec_col=vec_col)
    data_cells = assign_cells(
        embeddings.select(F.col(id_col).alias("cand_id"),
                          F.col(vec_col).alias("cvec")),
        cents, nprobe=1, id_col="cand_id", vec_col="cvec")
    query_cells = assign_cells(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec")),
        cents, nprobe=nprobe, id_col="query_id", vec_col="qvec")
    cands = (data_cells.join(query_cells.select("query_id", "qvec", "cell"),
                             "cell")
             .where(F.col("cand_id") != F.col("query_id")))
    scored = cands.withColumn(
        "sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 4) + F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("cand_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "sim", "rank"))


def pairwise_label_centroids(embeddings: DataFrame,
                             vec_col: str = "embedding",
                             label_col: str = "label") -> DataFrame:
    """Per-label centroid vectors (posexplode + avg per position) — the
    building block for IVF coarse quantization; one shuffle on
    (label, position)."""
    pos = embeddings.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col)).alias("pos", "v"))
    cent = pos.groupBy(label_col, "pos").agg(F.avg("v").alias("v"))
    return (cent.groupBy(label_col)
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
            .select(label_col,
                    F.transform("pv", lambda s: F.round(s["v"], 6)).alias("centroid")))
