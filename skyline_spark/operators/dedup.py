"""Document deduplication operators for large-scale training-data
pipelines: exact (hash group-by), MinHash+LSH, SimHash, and n-gram
Jaccard near-dup.

Everything is native Spark expressions (no Python UDFs): shingling via
split/transform/sequence, hashing via xxhash64/md5, LSH banding via
group-by on band signatures. All operators are deterministic (fixed
hash seeds, no RNG).

Scale design: each stage is one shuffle on a bounded key; candidate
pairs come from LSH band buckets (never an all-pairs join); verification
joins fetch shingle sets only for candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / shingling (shared)
# ---------------------------------------------------------------------------


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", F.split(F.col(text_col), " "))


def with_shingles(df: DataFrame, k: int = 3,
                  text_col: str = "text") -> DataFrame:
    """k-token shingles as an array<string> column — pure native:
    transform over an index sequence, slice + concat."""
    df = with_tokens(df, text_col)
    n = F.size("tokens")
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    shingle = lambda i: F.array_join(F.slice("tokens", i, k), " ")  # noqa: E731
    return df.withColumn(
        "shingles",
        F.when(n >= k, F.array_distinct(F.transform(idx, shingle)))
        .otherwise(F.array(F.array_join("tokens", " "))))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash window: emits (doc_id, keep_id,
    content_hash) for every duplicate row, keep_id = min doc_id of the
    group. One shuffle on the hash; group stats attach as partition
    window aggregates (no side table — a dup-heavy 100 TB corpus has
    an unbounded duplicate-group cardinality, so broadcasting the
    groups would OOM)."""
    from pyspark.sql import Window
    h = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    d = (h.withColumn("keep_id", F.min(id_col).over(w))
         .withColumn("__n", F.count("*").over(w)))
    return (d.where((F.col("__n") > 1) & (F.col(id_col) != F.col("keep_id")))
            .select(id_col, "keep_id", "content_hash"))


def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (min id wins)."""
    w_hash = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    from pyspark.sql import Window
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (w_hash.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn", "content_hash"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _portable_hash(col, seed: int):
    """60-bit integer from md5('<seed>:<value>') — bit-identical in any
    engine with md5 (the DuckDB-oracle-checkable alternative to
    xxhash64)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)),
                              1, 15), 16, 10).cast("long")


def _minhash_sig(num_hashes: int, hash_mode: str):
    """The minhash signature expression over a ``shingles`` column."""
    if hash_mode == "md5":
        def hfn(s, i):
            return _portable_hash(s, i)
    else:
        def hfn(s, i):
            return F.xxhash64(s, F.lit(i))
    return F.array(*[
        F.array_min(F.transform("shingles", lambda s, i=i: hfn(s, i)))
        for i in range(num_hashes)
    ])


def with_minhash(df: DataFrame, num_hashes: int = 32,
                 shingle_k: int = 3, text_col: str = "text",
                 hash_mode: str = "xxhash64") -> DataFrame:
    """MinHash signature (array<long>, length num_hashes) per doc:
    signature[i] = min over shingles of hash_i(shingle). Fully native;
    deterministic. ``hash_mode``: 'xxhash64' (fast, production) or
    'md5' (engine-portable — the oracle twin computes the identical
    signatures in ANSI SQL)."""
    df = with_shingles(df, k=shingle_k, text_col=text_col)
    sig = _minhash_sig(num_hashes, hash_mode)
    return df.withColumn("minhash", sig).drop("tokens", "shingles")


def band_explode(with_sig: DataFrame, num_hashes: int = 32,
                 bands: int = 8, hash_mode: str = "xxhash64",
                 keep_cols: tuple = ()) -> DataFrame:
    """Band the minhash signature (bands × rows) and explode to one
    (band, band_sig) row per doc per band — the shared banding stage
    of the batch bucket-join and the streaming stateful bucket."""
    rows_per_band = num_hashes // bands

    def band_key(joined):
        return (F.md5(joined) if hash_mode == "md5"
                else F.xxhash64(joined).cast("string"))
    band_sigs = F.array(*[
        band_key(F.array_join(
            F.transform(F.slice("minhash", b * rows_per_band + 1,
                                rows_per_band),
                        lambda x: x.cast("string")), ","))
        for b in range(bands)
    ])
    return with_sig.select(
        *keep_cols, F.posexplode(band_sigs).alias("band", "band_sig"))


def lsh_candidate_pairs(with_sig: DataFrame, num_hashes: int = 32,
                        bands: int = 8, id_col: str = "doc_id",
                        hash_mode: str = "xxhash64") -> DataFrame:
    """Band the signature (bands × rows), bucket-join on (band, band
    hash): docs sharing any band bucket become candidate pairs
    (id_a < id_b). Shuffle key = band signature -> no all-pairs join."""
    banded = band_explode(with_sig, num_hashes, bands, hash_mode,
                          keep_cols=(id_col,))
    left = banded.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    pairs = left.join(right, ["band", "band_sig"]).where(
        F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b").distinct()


def minhash_near_duplicates(docs: DataFrame, num_hashes: int = 32,
                            bands: int = 8, shingle_k: int = 3,
                            threshold: float = 0.6,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            hash_mode: str = "xxhash64") -> DataFrame:
    """shingle -> minhash -> band -> bucket-join -> verify with exact
    Jaccard over shingle sets. Returns (id_a, id_b, jaccard) pairs with
    jaccard >= threshold.

    r08 recompute elimination (guide §1.2/§5): the banded signatures
    feed BOTH sides of the candidate self-join and the shingle sets
    feed BOTH verify joins; without persists the shingling ran 3x and
    the 32-hash minhash sweep 2x over the corpus. Shingles are computed
    once (persisted, doc-cardinality), the banded keys once (persisted,
    bands x docs tiny rows). Values are bit-identical — the expressions
    are unchanged, only their evaluation count drops."""
    sh = with_shingles(docs, k=shingle_k, text_col=text_col) \
        .select(F.col(id_col), "shingles").persist()
    sigs = sh.withColumn("minhash", _minhash_sig(num_hashes, hash_mode))
    banded = band_explode(sigs, num_hashes, bands, hash_mode,
                          keep_cols=(id_col,)).persist()
    left = banded.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    cands = (left.join(right, ["band", "band_sig"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    j = (cands
         .join(sh.select(F.col(id_col).alias("id_a"),
                         F.col("shingles").alias("sh_a")), "id_a")
         .join(sh.select(F.col(id_col).alias("id_b"),
                         F.col("shingles").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (j.withColumn("jaccard", (F.round(inter / union, 6) + F.lit(0.0)))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def with_simhash(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 hash_mode: str = "xxhash64") -> DataFrame:
    """SimHash over token hashes: per bit, vote +1/-1 weighted by token
    count; bit set iff the sum is positive. Implemented as explode ->
    N conditional sums (all JVM-side aggregates). ``hash_mode``:
    'xxhash64' -> 64-bit signature (production); 'md5' -> 60-bit
    signature from md5-prefix integers, bit-identical in ANSI SQL (the
    oracle twin)."""
    nbits = 64 if hash_mode == "xxhash64" else 60
    toks = (with_tokens(docs, text_col)
            .select(F.col(id_col), F.explode("tokens").alias("tok")))
    hexpr = (F.xxhash64("tok") if hash_mode == "xxhash64"
             else _portable_hash(F.col("tok"), 0))
    weighted = (toks.groupBy(id_col, "tok").agg(F.count("*").alias("w"))
                .withColumn("h", hexpr))
    votes = [
        F.sum(F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1,
                     F.col("w")).otherwise(-F.col("w"))).alias(f"b{b}")
        for b in range(nbits)
    ]
    agg = weighted.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(nbits):
        bit = F.when(F.col(f"b{b}") > 0,
                     F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseXOR(bit)
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            hash_mode: str = "xxhash64") -> DataFrame:
    """Near-dups by Hamming distance <= max_hamming via 4×16-bit chunk
    banding (pigeonhole: distance <= 3 -> at least one of 4 chunks
    equal), then exact popcount verification via bit_count."""
    sh = with_simhash(docs, id_col, text_col, hash_mode)
    chunks = sh.select(
        F.col(id_col), "simhash",
        F.posexplode(F.array(*[
            F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ])).alias("chunk", "chunk_val"))
    left = chunks.select(F.col(id_col).alias("id_a"),
                         F.col("simhash").alias("sim_a"), "chunk", "chunk_val")
    right = chunks.select(F.col(id_col).alias("id_b"),
                          F.col("simhash").alias("sim_b"), "chunk", "chunk_val")
    pairs = (left.join(right, ["chunk", "chunk_val"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sim_a", "sim_b").distinct())
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (pairs.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked all-candidates variant, oracle-checkable)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, n: int = 1,
                        min_jaccard: float = 0.5,
                        block_col: str = "lang",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Token-set Jaccard over candidate pairs blocked by ``block_col``
    (same-language docs only). Exact and SQL-expressible — the oracle
    twin for the MinHash path."""
    toks = (with_tokens(docs, text_col)
            .select(F.col(id_col), F.col(block_col),
                    F.array_distinct("tokens").alias("tset")))
    a = toks.select(F.col(id_col).alias("id_a"), F.col(block_col),
                    F.col("tset").alias("t_a"))
    b = toks.select(F.col(id_col).alias("id_b"), F.col(block_col),
                    F.col("tset").alias("t_b"))
    pairs = a.join(b, block_col).where(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("t_a", "t_b")).cast("double")
    union = F.size(F.array_union("t_a", "t_b")).cast("double")
    return (pairs.withColumn("jaccard", (F.round(inter / union, 6) + F.lit(0.0)))
            .where(F.col("jaccard") >= min_jaccard)
            .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicates
# ---------------------------------------------------------------------------

def embedding_near_duplicates_exact(embeddings: DataFrame,
                                    min_cosine: float = 0.9,
                                    block_col: str = "label",
                                    id_col: str = "vec_id",
                                    vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs, exact within ``block_col`` blocks
    (quadratic-per-block — the SQL-expressible ORACLE twin of the LSH
    path below; never the production path at scale)."""
    from skyline_spark.operators.similarity import cosine
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(block_col),
                          F.col(vec_col).alias("v_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(block_col),
                          F.col(vec_col).alias("v_b"))
    pairs = a.join(b, block_col).where(F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine(F.col("v_a"), F.col("v_b")), 4) + F.lit(0.0)
    return (pairs.withColumn("sim", sim)
            .where(F.col("sim") >= min_cosine)
            .select("id_a", "id_b", "sim"))


def embedding_near_duplicates(embeddings: DataFrame,
                              min_cosine: float = 0.9,
                              n_planes: int = 8, n_tables: int = 6,
                              dim: int = 64, seed: int = 42,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: OR-amplified
    hyperplane-LSH bucket join generates candidates (shuffle key = the
    bucket signature, never all-pairs), exact cosine verifies. Recall<1
    by design; pytest plants a near-identical pair and checks it
    survives."""
    from skyline_spark.operators.similarity import cosine, with_lsh_signatures
    sigs = with_lsh_signatures(
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        dim, n_planes, n_tables, seed, "v")
    a = sigs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                    "tbl", "sig")
    b = sigs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                    "tbl", "sig")
    cands = (a.join(b, ["tbl", "sig"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "v_a", "v_b").distinct())
    sim = F.round(cosine(F.col("v_a"), F.col("v_b")), 4) + F.lit(0.0)
    return (cands.withColumn("sim", sim)
            .where(F.col("sim") >= min_cosine)
            .select("id_a", "id_b", "sim"))


# ---------------------------------------------------------------------------
# near-dup clustering: connected components + cluster-and-keep-one
# ---------------------------------------------------------------------------

def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iterations: int = 50) -> DataFrame:
    """Connected components over a pair list via alternating
    large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond", ACM SoCC'14) — the
    shuffle-friendly formulation that converges in O(log^2 n) rounds
    and never materializes a neighbor list:

    - large-star: every node u computes m = min(N(u) + {u}) with one
      partial-aggregable groupBy-min, then each LARGER neighbor v > u
      is re-pointed at m (a join, no collect_list — this is what keeps
      a 10^8-degree hub from becoming a single-task neighbor array);
    - small-star: each edge oriented larger->smaller, every node
      re-points its smaller neighbors (and itself) at its minimum.

    The driver loop is deliberately iterative (like the IVF Lloyd
    trainer); each round is one shuffle on the node id, persisted and
    lineage-cut so round k doesn't recompute rounds 1..k-1. Convergence
    = the oriented edge set is a fixed point (count + order-insensitive
    xxhash64 checksum, one action per round).

    Returns (node, component) for every node that appears in ``edges``,
    component = the minimum node id of its component.
    """
    u, v = F.col("u"), F.col("v")
    cur = (edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
           .where(u != v).distinct().persist())
    prev_sig = None
    prev_df = None
    for _ in range(max_iterations):
        # large-star
        und = cur.union(cur.select(v.alias("u"), u.alias("v")))
        mins = (und.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("mv", u).alias("m")))
        cur2 = (und.where(v > u).join(mins, "u")
                .select(v.alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v")).distinct())
        # small-star (orient larger -> smaller; und regenerated so the
        # large-star output is consumed, not the stale input)
        und2 = cur2.union(cur2.select(v.alias("u"), u.alias("v")))
        ori = und2.where(v <= u)
        mins2 = ori.groupBy("u").agg(F.min("v").alias("m"))
        nxt = (ori.join(mins2, "u")
               .select(v.alias("u"), F.col("m").alias("v"))
               .union(mins2.select(F.col("u"), F.col("m").alias("v")))
               .where(F.col("u") != F.col("v")).distinct()
               .localCheckpoint())
        sig = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h")
        ).collect()[0]
        if prev_df is not None:
            prev_df.unpersist()
        cur.unpersist()
        cur, prev_df = nxt, cur
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # fixed point of small-star is a star graph: u -> component min.
    # Component minima only ever appear on the right side (m -> m edges
    # are filtered), so union every input node back in and map the
    # minima to themselves.
    star = cur.groupBy("u").agg(F.min("v").alias("component")) \
        .select(F.col("u").alias("node"), "component")
    nodes = (edges.select(F.col(id_a).alias("node"))
             .union(edges.select(F.col(id_b).alias("node"))).distinct())
    return nodes.join(star, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component"))


def near_duplicate_clusters(docs: DataFrame, pairs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Cluster-and-keep-one over near-dup pairs: connected components
    assign every document a cluster_id (the minimum doc id reachable
    through the near-dup graph; singletons cluster with themselves),
    and ``keep`` marks the cluster canonical — the standard dedup step
    between pair generation and corpus filtering in a training-data
    pipeline."""
    cc = connected_components(pairs)
    out = docs.select(F.col(id_col)).join(
        cc.withColumnRenamed("node", id_col), id_col, "left")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (F.col(id_col) == cluster).alias("keep"))


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------

def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with a
    benchmark/eval set — the standard decontamination pass (the
    GPT-3/PaLM 13-gram rule, shortened for short documents). Returns
    (doc_id, n_overlapping_ngrams, contaminated).

    Scale: n-grams explode on both sides; the benchmark side is
    eval-set-sized, so the gram join broadcasts it. One shuffle on the
    doc id for the per-doc distinct-gram count."""
    def grams(df, out):
        toks = F.split(F.col(text_col), " ")
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        g = F.when(F.size(toks) >= n,
                   F.array_distinct(F.transform(
                       idx, lambda i: F.array_join(F.slice(toks, i, n),
                                                   " ")))) \
            .otherwise(F.array().cast("array<string>"))
        return df.select(F.col(id_col), F.explode(g).alias(out))

    dg = grams(docs, "g")
    bg = grams(benchmark, "g").select("g").distinct()
    hits = (dg.join(F.broadcast(bg), "g")
            .groupBy(id_col)
            .agg(F.countDistinct("g").alias("n_overlapping_ngrams")))
    return (docs.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_overlapping_ngrams", F.lit(0))
                    .alias("n_overlapping_ngrams"))
            .withColumn("contaminated",
                        F.col("n_overlapping_ngrams") > 0))


# ---------------------------------------------------------------------------
# exact repeated-substring statistics (Lee et al. 2022 signal)
# ---------------------------------------------------------------------------

def repeated_span_stats(docs: DataFrame, span_len: int = 10,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-document statistics of exact ``span_len``-token substrings
    that occur MORE THAN ONCE anywhere in the corpus — the signal
    behind Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" (their ExactSubstr dedup removes such
    spans; this operator reports the per-doc span occurrences and the
    fraction of token positions covered, the decision inputs).

    Scale: one gram-keyed shuffle for the global occurrence counts (a
    partial-aggregable groupBy), one doc-keyed shuffle for the distinct
    covered positions. Position coverage explodes span_len rows per
    repeated occurrence — bounded amplification on the (rare at clean
    corpora) repeated grams only, never on the whole corpus."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    grams = F.when(n >= span_len, F.transform(
        F.sequence(F.lit(1), n - (span_len - 1)),
        lambda i: F.struct(i.alias("pos"),
                           F.array_join(F.slice(words, i, span_len), " ")
                           .alias("g")))) \
        .otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
    occ = (docs.select(F.col(id_col), n.alias("n_tok"),
                       F.explode(grams).alias("o"))
           .select(id_col, "n_tok", F.col("o.pos").alias("pos"),
                   F.col("o.g").alias("g")))
    counts = occ.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    rep = occ.join(counts.where(F.col("c") > 1), "g")
    covered = (rep.select(id_col, "n_tok", F.explode(
        F.sequence(F.col("pos"), F.col("pos") + (span_len - 1)))
        .alias("p"))
        .groupBy(id_col).agg(
            F.first("n_tok").alias("n_tok"),
            F.countDistinct("p").alias("covered_tokens")))
    n_rep = rep.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_repeated_spans"))
    out = (docs.select(F.col(id_col), n.alias("n_tok"))
           .join(n_rep, id_col, "left")
           .join(covered.drop("n_tok"), id_col, "left"))
    frac = (F.coalesce("covered_tokens", F.lit(0))
            / F.greatest(F.col("n_tok"), F.lit(1)))
    return out.select(
        id_col,
        F.coalesce("n_repeated_spans", F.lit(0))
        .alias("n_repeated_spans"),
        F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
        (F.round(frac, 6) + F.lit(0.0)).alias("repeated_frac"),
        (F.coalesce("n_repeated_spans", F.lit(0)) > 0)
        .alias("has_repeated_span"))
