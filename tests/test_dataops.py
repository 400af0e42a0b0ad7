"""Tests for the training-data pipeline operators: dedup (exact, MinHash
LSH, SimHash, n-gram Jaccard), similarity search, text analysis, and
multimodal plumbing — with planted duplicates / near-duplicates /
nearest neighbors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # plant: 9000/9001 exact dup of doc 0; 9002 near-dup of doc 1 (one
    # token changed); 9003 unrelated tiny doc
    rows = base.where(F.col("doc_id").isin([0, 1])).collect()
    d0, d1 = (r for r in sorted(rows, key=lambda r: r.doc_id))
    near = d1.text.split(" ")
    near[len(near) // 2] = "zzz"
    extra = spark.createDataFrame(
        [(9000, d0.text, d0.lang, "planted", len(d0.text)),
         (9001, d0.text, d0.lang, "planted", len(d0.text)),
         (9002, " ".join(near), d1.lang, "planted", len(d1.text)),
         (9003, "tiny doc", "en", "planted", 8)],
        schema=base.schema)
    return base.unionByName(extra)


def test_exact_duplicates(spark, docs):
    from skyline_spark.operators.dedup import dedup_exact, exact_duplicates
    dups = exact_duplicates(docs).toPandas()
    pairs = set(map(tuple, dups[["doc_id", "keep_id"]].values))
    assert (9000, 0) in pairs and (9001, 0) in pairs
    assert len(pairs) == 2
    kept = dedup_exact(docs)
    assert kept.count() == docs.count() - 2
    assert kept.where(F.col("doc_id").isin([9000, 9001])).count() == 0


def test_minhash_lsh_near_duplicates(spark, docs):
    from skyline_spark.operators.dedup import minhash_near_duplicates
    nd = minhash_near_duplicates(docs, threshold=0.5).toPandas()
    pairs = set(map(tuple, nd[["id_a", "id_b"]].values))
    # exact dups must be found (jaccard 1.0), near-dup of doc 1 too
    assert (0, 9000) in pairs and (0, 9001) in pairs and (9000, 9001) in pairs
    assert (1, 9002) in pairs
    ja = {tuple(r[:2]): r[2] for r in nd.values}
    assert ja[(0, 9000)] == 1.0
    assert 0.5 <= ja[(1, 9002)] < 1.0


def test_simhash_near_duplicates(spark, docs):
    from skyline_spark.operators.dedup import simhash_near_duplicates, with_simhash
    sh = with_simhash(docs).toPandas().set_index("doc_id")["simhash"]
    assert sh[0] == sh[9000] == sh[9001]  # identical text -> identical hash
    nd = simhash_near_duplicates(docs, max_hamming=8).toPandas()
    pairs = set(map(tuple, nd[["id_a", "id_b"]].values))
    assert (0, 9000) in pairs and (1, 9002) in pairs


def test_ngram_jaccard_pairs(spark, docs):
    from skyline_spark.operators.dedup import ngram_jaccard_pairs
    nd = ngram_jaccard_pairs(docs, min_jaccard=0.5).toPandas()
    pairs = set(map(tuple, nd[["id_a", "id_b"]].values))
    assert (0, 9000) in pairs and (1, 9002) in pairs


@pytest.fixture(scope="module")
def embeddings(spark):
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    row = base.where(F.col("vec_id") == 7).first()
    near = (np.array(row.embedding) + 0.001).astype(np.float32).tolist()
    extra = spark.createDataFrame([(9000, near, row.label)], schema=base.schema)
    return base.unionByName(extra)


def test_brute_force_topk(spark, embeddings):
    from skyline_spark.operators.similarity import brute_force_topk
    q = embeddings.where(F.col("vec_id") == 7)
    top = brute_force_topk(embeddings, q, k=3).toPandas()
    assert list(top.query_id.unique()) == [7]
    assert top.iloc[0].cand_id == 9000  # planted neighbor is rank 1
    assert top.iloc[0].sim > 0.9999
    assert list(top["rank"]) == [1, 2, 3]


def test_lsh_topk_recall(spark, embeddings):
    from skyline_spark.operators.similarity import brute_force_topk, lsh_topk
    q = embeddings.where(F.col("vec_id") < 10)
    exact = brute_force_topk(embeddings, q, k=1).toPandas()
    approx = lsh_topk(embeddings, q, k=1, n_planes=5, n_tables=6).toPandas()
    # planted exact-neighbor must be found (same bucket: identical signs)
    got = approx.set_index("query_id").cand_id.to_dict()
    assert got.get(7) == 9000
    # recall@1 of the remaining queries is best-effort; require > 0.3
    hits = sum(1 for qid, cid in exact.set_index("query_id").cand_id.items()
               if got.get(qid) == cid)
    assert hits / len(exact) > 0.3


def test_embedding_near_duplicates(spark, embeddings):
    """Embedding-cosine near-dup: the planted near-identical pair
    (7, 9000) must survive both the exact twin and the LSH-bucketed
    path; LSH pairs must be a subset of exact pairs (verification is
    exact, only candidate RECALL is approximate)."""
    from skyline_spark.operators.dedup import (
        embedding_near_duplicates,
        embedding_near_duplicates_exact,
    )
    exact = embedding_near_duplicates_exact(embeddings, min_cosine=0.99) \
        .toPandas()
    lsh = embedding_near_duplicates(embeddings, min_cosine=0.99).toPandas()
    assert (7, 9000) in set(zip(exact.id_a, exact.id_b))
    assert (7, 9000) in set(zip(lsh.id_a, lsh.id_b))
    assert set(zip(lsh.id_a, lsh.id_b)) <= set(zip(exact.id_a, exact.id_b))


def test_ivf_topk_recall(spark, embeddings):
    """IVF cell-join ANN: the planted same-cell near-neighbor must be
    found; recall@1 vs brute force over the probed cells is high because
    queries probe their 2 nearest label-centroid cells."""
    from skyline_spark.operators.similarity import brute_force_topk, ivf_topk
    q = embeddings.where(F.col("vec_id") < 10)
    exact = brute_force_topk(embeddings, q, k=1).toPandas()
    approx = ivf_topk(embeddings, q, k=1, nprobe=2).toPandas()
    got = approx.set_index("query_id").cand_id.to_dict()
    assert got.get(7) == 9000  # planted neighbor shares the cell
    hits = sum(1 for qid, cid in exact.set_index("query_id").cand_id.items()
               if got.get(qid) == cid)
    assert hits / len(exact) > 0.5


def test_label_centroids(spark, embeddings):
    from skyline_spark.operators.similarity import pairwise_label_centroids
    cents = pairwise_label_centroids(embeddings).toPandas()
    assert len(cents) == 10
    assert all(len(c) == 64 for c in cents.centroid)


def test_text_analysis(spark, docs):
    from skyline_spark.functions.text import (
        fingerprint_columns,
        lang_id_columns,
        quality_columns,
        token_count,
    )
    df = docs.withColumn("n_tok", token_count())
    df = quality_columns(df)
    df = lang_id_columns(df)
    df = fingerprint_columns(df)
    pdf = df.toPandas().set_index("doc_id")
    r = pdf.loc[0]
    assert r.n_tok == len(r["text"].split(" "))
    assert 0.0 <= r.quality_score <= 1.0
    # identical texts -> identical fingerprints & hashes
    assert pdf.loc[0].fingerprint == pdf.loc[9000].fingerprint
    assert pdf.loc[0].content_hash == pdf.loc[9000].content_hash
    # near-dup shares the min-shingle fingerprint with high probability;
    # content hash must differ
    assert pdf.loc[1].content_hash != pdf.loc[9002].content_hash
    # docs text contains 'the'/'a' -> english markers win
    assert pdf.loc[0].lang_guess in ("en", "und")


def test_multimodal_plumbing(spark, docs):
    from skyline_spark.operators.multimodal import (
        decode_metadata,
        extract_features,
        frame_sample,
        synth_media,
    )
    media = synth_media(spark, docs)
    meta = decode_metadata(media).toPandas().set_index("media_id")
    assert len(meta) == docs.count()
    assert (meta.width >= 1).all() and (meta.height >= 1).all()
    # payload = 8-byte header + text bytes
    r0 = meta.loc[0]
    t0 = docs.where(F.col("doc_id") == 0).first().text
    assert r0.n_bytes == 8 + len(t0.encode())
    feats = extract_features(media).toPandas()
    assert len(feats) == len(meta)
    assert all(len(f) == 8 for f in feats.features)
    assert all(abs(sum(f) - 1.0) < 1e-3 for f in feats.features)
    frames = frame_sample(media).toPandas()
    # only video rows produce frames
    vids = set(media.where(F.col("kind") == "video")
               .select("media_id").toPandas().media_id)
    assert set(frames.media_id).issubset(vids)
    assert (frames.groupby("media_id").frame_idx.min() == 0).all()


def test_real_png_codec_roundtrip(spark):
    """Image is now a REAL codec path too: synth_png_media writes
    genuine PNG payloads (zlib/struct, CRC-validated, all five scanline
    filters), decode_image reconstructs the pixels. Decoded stats must
    equal those of the independently regenerated source arrays, and a
    corrupt payload must degrade to NULLs."""
    import numpy as np
    import pandas as pd

    from skyline_spark.operators.multimodal import (
        decode_image,
        png_decode,
        png_encode,
        synth_png_media,
    )
    # pure-python roundtrip: every filter type, every channel count
    rng = np.random.RandomState(0)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, (11, 13, ch)).astype(np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            assert np.array_equal(
                png_decode(png_encode(img, row_filters=filters)), img)
    # CRC corruption is detected
    blob = bytearray(png_encode(img))
    blob[20] ^= 0xFF
    try:
        png_decode(bytes(blob))
        raise AssertionError("corrupt PNG accepted")
    except ValueError:
        pass

    # Spark end-to-end: decoded stats == regenerated source stats
    media = synth_png_media(spark, n=12)
    decoded = decode_image(media).toPandas().set_index("media_id")
    assert len(decoded) == 12
    for mid in range(12):
        r = np.random.RandomState(mid)
        w = 8 + mid % 41
        h = 8 + (mid * 7) % 25
        ch = (1, 3, 4)[mid % 3]
        grad = np.linspace(0, 255, w, dtype=np.uint8)
        img = (np.tile(grad, (h, 1))[:, :, None]
               + r.randint(0, 64, (h, w, ch))).astype(np.uint8)
        row = decoded.loc[mid]
        assert (row.width, row.height, row.channels) == (w, h, ch)
        assert row.px_checksum == int(img.sum())
        assert abs(row.mean_px - float(img.mean())) < 1e-9
        assert abs(row.std_px - float(img.std())) < 1e-9
    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [99], "kind": ["image"],
                      "payload": [b"not-a-png"]}))
    out = decode_image(bad).toPandas()
    assert len(out) == 1 and out.width.isna().all()


def test_real_gif_codec_roundtrip(spark):
    """Video is a REAL codec path too: synth_gif_media writes genuine
    animated GIF89a payloads (variable-width LSB-first LZW, sub-block
    framing), decode_video explodes pixel-exact per-frame rows. The LZW
    pair must roundtrip across code widths and the 4096-entry dict
    reset, the decoder must parse third-party-encoded system GIFs, and
    a corrupt payload must degrade to NULLs."""
    import glob

    import numpy as np
    import pandas as pd

    from skyline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
        decode_video,
        gif_decode,
        gif_encode,
        synth_gif_media,
    )
    rng = np.random.RandomState(0)
    for mcs in (2, 4, 8):
        for size in (1, 7, 100, 5000, 40000):    # 40000 forces dict resets
            data = rng.randint(0, 1 << mcs, size).astype(np.uint8).tobytes()
            assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data
        runs = np.repeat(rng.randint(0, 1 << mcs, 200),
                         rng.randint(1, 50, 200)).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(runs, mcs), mcs) == runs
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    frames = rng.randint(0, 16, (4, 23, 31)).astype(np.uint8)
    dec, delays = gif_decode(gif_encode(frames, pal, delay_cs=7))
    assert dec.shape == (4, 23, 31, 3) and delays == [7] * 4
    assert np.array_equal(dec, pal[frames])
    # interop: third-party-encoded GIFs shipped with system docs
    for p in sorted(glob.glob("/usr/share/doc/*/html/*.gif"))[:3]:
        f, _ = gif_decode(open(p, "rb").read())
        assert f.ndim == 4 and f.shape[0] >= 1 and f.shape[3] == 3

    # Spark end-to-end: per-frame stats == regenerated source stats
    media = synth_gif_media(spark, n=10)
    decoded = decode_video(media).toPandas()
    for mid in range(10):
        sub = decoded[decoded.media_id == mid].sort_values("frame_idx")
        r = np.random.RandomState(mid)
        w = 8 + mid % 33
        h = 8 + (mid * 5) % 21
        nf = 2 + mid % 4
        p = r.randint(0, 256, (16, 3)).astype(np.uint8)
        assert len(sub) == nf
        assert (sub.width == w).all() and (sub.height == h).all()
        assert (sub.delay_cs == 4 + mid % 9).all()
        yy, xx = np.mgrid[0:h, 0:w]
        for f in range(nf):
            d2 = (xx - (mid + f * 3) % w) ** 2 + (yy - (mid * 2 + f * 2) % h) ** 2
            rgb = p[np.minimum(d2 // 4, 15).astype(np.uint8)]
            row = sub.iloc[f]
            assert row.px_checksum == int(rgb.sum())
            assert abs(row.mean_px - float(rgb.astype(np.float64).mean())) < 1e-9
    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [99], "kind": ["video"],
                      "payload": [b"not-a-gif"]}))
    out = decode_video(bad).toPandas()
    assert len(out) == 1 and out.width.isna().all()


def test_real_wav_codec_roundtrip(spark):
    """Audio is a REAL codec path: synth_wav_media writes genuine
    RIFF/WAVE 16-bit PCM payloads, decode_audio parses them back with
    the stdlib wave module. The decoded parameters, RMS (sine => A/√2),
    and dominant FFT bin must match the generation parameters, and a
    corrupt payload must degrade to NULLs, not fail the batch."""
    import io
    import wave as wave_mod

    import numpy as np

    from skyline_spark.operators.multimodal import (
        decode_audio,
        synth_wav_media,
    )
    media = synth_wav_media(spark, n=16, sample_rate=8000, n_samples=800)
    decoded = decode_audio(media).toPandas().set_index("media_id")
    assert len(decoded) == 16
    assert (decoded.sample_rate == 8000).all()
    assert (decoded.n_channels == 1).all()
    assert (decoded.n_frames == 800).all()
    assert np.allclose(decoded.duration_s, 0.1)
    # sine of amplitude 12000 -> rms ~ 12000/sqrt(2), within quantization
    assert np.allclose(decoded.rms, 12000 / np.sqrt(2), rtol=0.02)
    # dominant FFT bin of each decoded payload equals the keyed frequency
    rows = media.select("media_id", "payload").collect()
    for r in rows[:4]:
        with wave_mod.open(io.BytesIO(bytes(r.payload))) as w:
            x = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        dom_hz = np.abs(np.fft.rfft(x.astype(float))).argmax() * 8000 / 800
        assert dom_hz == 100.0 + (r.media_id % 32) * 20.0
    # corrupt payload degrades to NULL features
    import pandas as pd
    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [99], "kind": ["audio"],
                      "payload": [b"not-a-wav"]}))
    out = decode_audio(bad).toPandas()
    assert len(out) == 1 and out.sample_rate.isna().all()


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to component minimum
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(m) for r, m in comp.items() for x in m}


def test_connected_components_vs_union_find(spark):
    # deterministic pseudo-random graph: chains, a big hub, triangles,
    # and singletons — exercises multiple large/small-star rounds
    import random
    rng = random.Random(7)
    n = 120
    edges = set()
    for _ in range(90):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    # a long chain (worst case for naive min-propagation)
    for i in range(100, 119):
        edges.add((i, i + 1))
    edges = sorted(edges)
    from skyline_spark.operators.dedup import connected_components
    df = spark.createDataFrame(edges, schema="id_a long, id_b long")
    got = {r.node: r.component
           for r in connected_components(df).collect()}
    want = _union_find_components(n, edges)
    touched = {x for e in edges for x in e}
    assert got == {x: want[x] for x in touched}


def test_near_duplicate_clusters_planted(spark, docs):
    # two planted near-dup groups + untouched singletons
    from skyline_spark.operators.dedup import near_duplicate_clusters
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (2, 4)], schema="id_a long, id_b long")
    d = spark.createDataFrame([(i,) for i in range(10)],
                              schema="doc_id long")
    out = {r.doc_id: (r.cluster_id, r.keep)
           for r in near_duplicate_clusters(d, pairs).collect()}
    assert out[1] == (1, True) and out[5] == (1, False) \
        and out[9] == (1, False)
    assert out[2] == (2, True) and out[4] == (2, False)
    for s in (0, 3, 6, 7, 8):
        assert out[s] == (s, True)
    assert len(out) == 10


def test_gopher_repetition_columns_planted(spark):
    from skyline_spark.functions.text import gopher_repetition_columns
    clean = " ".join(f"word{i} token{i} item{i}" for i in range(20))
    spam = "the same phrase again and " * 12  # one dominating 5-gram
    dup_lines = "alpha beta gamma\nalpha beta gamma\ndelta epsilon zeta"
    hashes = " ".join(["ok"] * 10) + " #### ... #"
    d = spark.createDataFrame(
        [(0, clean), (1, spam.strip()), (2, dup_lines), (3, hashes)],
        schema="doc_id long, text string")
    out = {r.doc_id: r for r in gopher_repetition_columns(d).collect()}

    # clean doc: 60 distinct words, no repetition -> passes
    r = out[0]
    assert r.gopher_pass
    assert r.dup_5gram_char_frac == 0.0 and r.dup_line_frac == 0.0

    # spam doc: every 5-gram duplicated, top 2-gram dominates -> fails
    r = out[1]
    assert r.dup_5gram_char_frac == 1.0
    assert r.top_2gram_char_frac > 0.2
    assert not r.gopher_pass

    # duplicate lines: 3 lines, 2 identical -> frac 1/3; char frac =
    # 16 dup chars / (16*2 + 18)
    r = out[2]
    assert abs(r.dup_line_frac - 1 / 3) < 1e-6
    assert abs(r.dup_line_char_frac - 16 / 50) < 1e-6

    # symbol spam: 5 '#' + 1 '...' over 13 words -> ratio 6/13, fails
    r = out[3]
    assert abs(r.symbol_word_ratio - 6 / 13) < 1e-6
    assert not r.gopher_pass


def test_pii_scrub_planted(spark):
    from skyline_spark.functions.text import pii_scrub_columns
    d = spark.createDataFrame(
        [(0, "mail me at jo.doe+x@sub.example.org or call +1 (555) 123-4567"),
         (1, "server 10.0.0.1 talked to 192.168.10.254 twice: 10.0.0.1"),
         (2, "user@host.example.net logged in from 1.2.3.4"),
         (3, "nothing to see here")],
        schema="doc_id long, text string")
    out = {r.doc_id: r for r in pii_scrub_columns(d).collect()}
    r = out[0]
    assert (r.n_email, r.n_ipv4, r.n_phone) == (1, 0, 1)
    assert "<EMAIL>" in r.scrubbed and "<PHONE>" in r.scrubbed
    assert "jo.doe" not in r.scrubbed and "555" not in r.scrubbed
    r = out[1]
    assert r.n_ipv4 == 3 and r.scrubbed.count("<IPV4>") == 3
    r = out[2]
    assert (r.n_email, r.n_ipv4) == (1, 1)
    assert "<EMAIL>" in r.scrubbed and "<IPV4>" in r.scrubbed
    assert out[3].scrubbed == "nothing to see here"


def test_sequence_packing_greedy(spark):
    from skyline_spark.operators.packing import pack_documents
    mk = lambda n: " ".join(["w"] * n)  # noqa: E731
    # one shard (n_shards=1): token counts 300, 300, 700, 200, 200, 200
    d = spark.createDataFrame(
        [(0, mk(300)), (1, mk(300)), (2, mk(700)),
         (3, mk(200)), (4, mk(200)), (5, mk(200))],
        schema="doc_id long, text string")
    out = {r.doc_id: (r.pack_id, r.n_tok)
           for r in pack_documents(d, budget=512, n_shards=1).collect()}
    # 300 -> pack0; +300 overflows -> pack1; 700 oversized -> pack2
    # alone; 200+200 -> pack3; +200 overflows -> pack4
    assert [out[i][0] for i in range(6)] == [0, 1, 2, 3, 3, 4]
    assert out[2][1] == 700
    # invariant on real docs: no pack exceeds the budget unless it is
    # a single oversized document
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    packs = pack_documents(docs, budget=512, n_shards=8).toPandas()
    g = packs.groupby(["shard", "pack_id"]).agg(
        tot=("n_tok", "sum"), n=("n_tok", "size"))
    bad = g[(g.tot > 512) & (g.n > 1)]
    assert bad.empty, bad


def test_decontaminate_planted(spark):
    from skyline_spark.operators.dedup import decontaminate
    phrase = "one two three four five six seven eight"  # exactly 8 words
    train = spark.createDataFrame(
        [(0, f"start {phrase} end of the training document body here"),
         (1, "completely unrelated text with enough words to form "
             "several eight grams of its own material"),
         (2, phrase)],  # the benchmark text verbatim
        schema="doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, f"question: {phrase} answer: something")],
        schema="doc_id long, text string")
    out = {r.doc_id: (r.n_overlapping_ngrams, r.contaminated)
           for r in decontaminate(train, bench, n=8).collect()}
    assert out[0][1] and out[0][0] >= 1    # shares the 8-gram
    assert out[2] == (1, True)             # verbatim benchmark text
    assert out[1] == (0, False)
    # short docs (< n words) can never contaminate
    tiny = spark.createDataFrame([(5, "too short")],
                                 schema="doc_id long, text string")
    assert decontaminate(tiny, bench, n=8).collect()[0].contaminated is False


def test_stratified_hash_sample_deterministic(spark):
    from skyline_spark.operators.sampling import stratified_hash_sample
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    frac = {"en": 0.5, "de": 0.25}
    a = stratified_hash_sample(docs, frac).toPandas()
    b = stratified_hash_sample(docs, frac).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # fully deterministic
    assert set(a.lang) <= {"en", "de"}           # others dropped
    # quotas hold approximately (hash-uniform)
    n = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    kept = a.groupby("lang").size()
    for lang, f in frac.items():
        if n.get(lang, 0) >= 20:
            assert abs(kept.get(lang, 0) / n[lang] - f) < 0.25
    # every kept row respects its own threshold
    assert (a.sample_u < a.lang.map(frac).astype(float) + 1e-6).all()


def test_bigram_perplexity_signal(spark):
    from skyline_spark.functions.text import bigram_perplexity_columns
    # doc 0: highly repetitive -> all its bigrams are frequent -> LOW
    # perplexity; doc 1: every bigram unique in the corpus -> HIGH
    rep = ("the cat sat on the mat " * 20).strip()
    uniq = " ".join(f"tok{i}a tok{i}b" for i in range(40))
    d = spark.createDataFrame(
        [(0, rep), (1, uniq), (2, "x")],
        schema="doc_id long, text string")
    out = {r.doc_id: r for r in bigram_perplexity_columns(d).collect()}
    assert out[0].perplexity < out[1].perplexity
    assert out[0].n_bigrams == 119 and out[1].n_bigrams == 79
    # single-token doc: no bigrams, NULL scores
    assert out[2].n_bigrams == 0 and out[2].cross_entropy is None
    # cross-entropy/perplexity consistency
    import math
    assert out[0].perplexity == pytest.approx(
        math.exp(out[0].cross_entropy), rel=1e-4)


def test_repeated_span_stats_planted(spark):
    from skyline_spark.operators.dedup import repeated_span_stats
    span = " ".join(f"s{i}" for i in range(10))  # a 10-token span
    d = spark.createDataFrame(
        [(0, f"{span} middle filler words here then again {span}"),
         (1, f"prefix tokens {span} suffix tokens"),
         (2, " ".join(f"u{i}" for i in range(30)))],  # all unique
        schema="doc_id long, text string")
    out = {r.doc_id: r for r in repeated_span_stats(d, 10).collect()}
    # doc 0 repeats the span internally AND shares it with doc 1
    assert out[0].has_repeated_span and out[1].has_repeated_span
    assert not out[2].has_repeated_span and out[2].repeated_frac == 0.0
    # doc 1: exactly the one shared span -> 10 covered tokens of 14
    assert out[1].n_repeated_spans == 1
    assert out[1].covered_tokens == 10
    assert out[1].repeated_frac == pytest.approx(10 / 14, abs=1e-6)
    # doc 0: both occurrences counted, covered = 20 of 26 tokens
    assert out[0].n_repeated_spans == 2
    assert out[0].covered_tokens == 20


def _gopher_twin(text, line_sep=". "):
    """Independent Python twin of gopher_repetition_columns written
    from the metric definitions, not the Spark expressions."""
    from collections import Counter
    words = text.split(" ")
    n_words = len(words)
    n_chars = len(text)
    lines = text.split(line_sep)
    lc = Counter(lines)
    n_lines = len(lines)
    dup_line_frac = (n_lines - len(lc)) / max(n_lines, 1)
    dup_chars = sum((c - 1) * len(l) for l, c in lc.items())
    line_chars = sum(c * len(l) for l, c in lc.items())
    dup_line_char_frac = dup_chars / max(line_chars, 1)

    def top_frac(n):
        if n_words < n:
            return 0.0
        grams = Counter(" ".join(words[i:i + n])
                        for i in range(n_words - n + 1))
        mx = max(grams.values())
        top = max(c * len(g) for g, c in grams.items() if c == mx)
        return top / max(n_chars, 1)

    def dup5():
        if n_words < 5:
            return 0.0
        grams = Counter(" ".join(words[i:i + 5])
                        for i in range(n_words - 4))
        dup = sum(c * len(g) for g, c in grams.items() if c > 1)
        tot = sum(c * len(g) for g, c in grams.items())
        return dup / max(tot, 1)

    hashes = text.count("#")
    ell = 0
    rest = text
    while "..." in rest:
        rest = rest.replace("...", "", 1)
        ell += 1
    alpha = sum(1 for w in words if any(c.isascii() and c.isalpha()
                                        for c in w))
    return {
        "dup_line_frac": round(dup_line_frac, 6),
        "dup_line_char_frac": round(dup_line_char_frac, 6),
        "top_2gram_char_frac": round(top_frac(2), 6),
        "top_3gram_char_frac": round(top_frac(3), 6),
        "top_4gram_char_frac": round(top_frac(4), 6),
        "dup_5gram_char_frac": round(dup5(), 6),
        "symbol_word_ratio": round((hashes + ell) / max(n_words, 1), 6),
        "alpha_word_frac": round(alpha / max(n_words, 1), 6),
    }


def test_gopher_randomized_vs_python_twin(spark):
    import random
    from skyline_spark.functions.text import gopher_repetition_columns
    rng = random.Random(13)
    vocab = ["the", "cat", "sat", "mat", "##", "a...b", "and", "runs",
             "12", "x"]
    docs = []
    for i in range(30):
        n = rng.randint(1, 60)
        words = [rng.choice(vocab) for _ in range(n)]
        # sometimes inject sentence separators and repeats
        text = " ".join(words)
        if rng.random() < 0.5:
            text = text + ". " + text
        docs.append((i, text))
    out = gopher_repetition_columns(
        spark.createDataFrame(docs, schema="doc_id long, text string"),
        line_sep=". ").collect()
    for r in out:
        want = _gopher_twin(dict(docs)[r.doc_id])
        got = {k: getattr(r, k) for k in want}
        assert got == pytest.approx(want, abs=2e-6), (r.doc_id, got, want)
