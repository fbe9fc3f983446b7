"""Training-data pipeline operators: dedup / similarity / text stats /
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from varint_spark.pipeline import dedup, multimodal, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d.cache().count()
    return d


@pytest.fixture(scope="module")
def embs(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    e.cache().count()
    return e


def test_exact_dedup(spark, docs):
    doubled = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    marked = dedup.exact_dedup(doubled, ["text"], "doc_id")
    keepers = marked.filter(F.col("dup_rank") == 0).count()
    dupes = marked.filter(F.col("dup_rank") > 0).count()
    n_unique = docs.select("text").distinct().count()
    assert keepers == n_unique
    assert keepers + dupes == 2 * docs.count()


def test_minhash_detects_duplicates(spark, docs):
    base = docs.limit(50)
    copies = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = base.union(copies)
    pairs = dedup.minhash_lsh_pairs(both, "doc_id", "text", num_hashes=32, bands=8)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    expected = {(r.doc_id, r.doc_id + 1_000_000) for r in base.collect()}
    # exact copies share every band → all expected pairs found
    assert expected <= found


def test_minhash_deterministic_across_parallelism(spark, docs):
    s1 = dedup.minhash_signatures(docs.repartition(1), "doc_id", "text", 16)
    s2 = dedup.minhash_signatures(docs.repartition(7), "doc_id", "text", 16)
    d1 = {r.doc_id: tuple(r.signature) for r in s1.collect()}
    d2 = {r.doc_id: tuple(r.signature) for r in s2.collect()}
    assert d1 == d2


def test_simhash_similarity(spark, docs):
    sh = dedup.simhash(docs, "doc_id", "text")
    assert sh.count() == docs.filter(F.length(F.trim("text")) > 0).count()
    # identical texts → identical simhash
    doubled = docs.limit(10).union(docs.limit(10).withColumn("doc_id", F.col("doc_id") + 500))
    vals = dedup.simhash(doubled, "doc_id", "text").collect()
    by_id = {r.doc_id: r.simhash for r in vals}
    for r in docs.limit(10).collect():
        assert by_id[r.doc_id] == by_id[r.doc_id + 500]


def test_ngram_jaccard_verifies(spark, docs):
    base = docs.limit(20)
    copies = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = base.union(copies)
    pairs = dedup.minhash_lsh_pairs(both, "doc_id", "text", num_hashes=32, bands=8)
    verified = dedup.ngram_jaccard_pairs(both, pairs, "doc_id", "text", threshold=0.99)
    found = {(r.id_a, r.id_b) for r in verified.collect()}
    expected = {(r.doc_id, r.doc_id + 1_000_000) for r in base.collect()}
    assert expected <= found


def test_cosine_topk_matches_numpy(spark, embs):
    rows = embs.collect()
    query = list(rows[0].embedding)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    q = np.array(query, dtype=np.float64)
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.argsort(-cos, kind="stable")[:5]
    expected = [rows[i].vec_id for i in order]
    got = [r.vec_id for r in similarity.cosine_topk(embs, "vec_id", "embedding", query, 5).collect()]
    assert got == expected


def test_lsh_topk_contains_query_itself(spark, embs):
    row0 = embs.orderBy("vec_id").first()
    query = list(row0.embedding)
    got = similarity.lsh_cosine_topk(embs, "vec_id", "embedding", query, k=5, bits=4)
    ids = [r.vec_id for r in got.collect()]
    assert row0.vec_id in ids  # the query vector's own bucket contains it


def test_token_and_quality_stats(spark, docs):
    ts = textstats.token_stats(docs, "doc_id", "text").collect()
    by_id = {r.doc_id: r for r in ts}
    for r in docs.limit(20).collect():
        expect_tokens = len([t for t in r.text.split() if t])
        assert by_id[r.doc_id].n_tokens == expect_tokens
        assert by_id[r.doc_id].n_chars == len(r.text)
        import re
        from varint_spark.pipeline.textstats import BPE_PRETOKEN_RE
        expect_bpe = len(re.findall(BPE_PRETOKEN_RE.replace("\\s", r"\s"), r.text))
        assert by_id[r.doc_id].n_bpe_pretokens == expect_bpe, r.doc_id
    qs = textstats.quality_score(docs, "doc_id", "text")
    row = qs.first()
    assert 0.0 <= row.punct_ratio <= 1.0 and 0.0 <= row.stopword_ratio <= 1.0


def test_lang_id_runs(spark, docs):
    out = textstats.lang_id(docs, "doc_id", "text")
    langs = {r.lang_pred for r in out.collect()}
    assert langs <= {"en", "de", "fr", "es", "und"}
    assert out.count() == docs.count()


def test_fingerprints_deterministic(spark, docs):
    f1 = {r.doc_id: r.fingerprint for r in
          textstats.fingerprints(docs.repartition(2), "doc_id", "text").collect()}
    f2 = {r.doc_id: r.fingerprint for r in
          textstats.fingerprints(docs.repartition(5), "doc_id", "text").collect()}
    assert f1 == f2
    # identical text ⇒ identical fingerprint
    texts = {r.doc_id: r.text for r in docs.collect()}
    ids = list(texts)
    assert all(f1[i] == f1[j] for i in ids for j in ids if texts[i] == texts[j])


def test_multimodal_plumbing(spark):
    media = multimodal.synthesize_media(spark, n=60)
    feats = multimodal.extract_features(media, feature_dim=16)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r.features) == 16 for r in rows)
    # deterministic across parallelism
    f2 = multimodal.extract_features(media.repartition(7), feature_dim=16).collect()
    assert {r.media_id: tuple(r.features) for r in rows} == \
           {r.media_id: tuple(r.features) for r in f2}
    stats = multimodal.media_stats(media).collect()
    assert {r.modality for r in stats} == {"image", "audio", "video"}


def test_embedding_near_dup(spark, embs):
    # plant exact duplicates: near-dup detection must find them all
    dups = embs.limit(25).withColumn("vec_id", F.col("vec_id") + 10_000)
    both = embs.union(dups)
    pairs = similarity.embedding_near_dup_pairs(both, "vec_id", "embedding",
                                                threshold=0.999, bits=6)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    expected = {(r.vec_id, r.vec_id + 10_000) for r in embs.limit(25).collect()}
    assert expected <= found
    # determinism across parallelism
    p2 = similarity.embedding_near_dup_pairs(both.repartition(7), "vec_id",
                                             "embedding", threshold=0.999, bits=6)
    assert {(r.id_a, r.id_b) for r in p2.collect()} >= expected


def test_ivf_ann_recall(spark, embs):
    from varint_spark.pipeline.similarity import cosine_topk, ivf_build, ivf_topk

    assigned, cent = ivf_build(embs, "vec_id", "embedding", k_lists=8)
    assigned = assigned.cache()
    assert assigned.count() == embs.count()
    query = list(embs.orderBy("vec_id").first().embedding)
    exact = [r.vec_id for r in cosine_topk(embs, "vec_id", "embedding", query, 10).collect()]
    approx = [r.vec_id for r in ivf_topk(assigned, cent, "vec_id", "embedding",
                                         query, k=10, nprobe=4).collect()]
    # half the lists probed → expect high recall incl. the query itself
    assert exact[0] in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, recall


def test_embedding_near_dup_bucket_guard(spark, embs):
    """A degenerate bucket (one vector duplicated many times) larger than
    max_bucket_size is dropped instead of going quadratic."""
    from pyspark.sql import functions as SF
    from varint_spark.pipeline import similarity

    base = embs.filter(SF.col("vec_id") < 5)
    flood = base.filter(SF.col("vec_id") == 0)
    for i in range(1, 40):
        flood = flood.union(
            base.filter(SF.col("vec_id") == 0).withColumn("vec_id", SF.lit(1000 + i)))
    df = base.union(flood)
    guarded = similarity.embedding_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.999, bits=2, max_bucket_size=8)
    flood_ids = {r.id_a for r in guarded.collect()} | {r.id_b for r in guarded.collect()}
    assert not any(i >= 1000 for i in flood_ids)  # flooded bucket dropped
    unguarded = similarity.embedding_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.999, bits=2, max_bucket_size=10_000)
    assert unguarded.count() >= 800  # without the guard it explodes (~C(41,2))


def _explode_simhash(df, id_col, text_col, hash_mode):
    """The pre-r4 explode + 64-signed-column SimHash, kept here as the
    spec the corpus-plane kernel must reproduce bit for bit."""
    def portable_token_hash(tok):
        chars = F.transform(
            F.sequence(F.lit(1), F.length(tok)),
            lambda i: F.ascii(F.substr(tok, i, F.lit(1))).cast("long"))

        def fold(base):
            return F.aggregate(
                chars, F.lit(0).cast("long"),
                lambda a, c: (a * F.lit(base) + c) % F.lit(2147483647))

        return fold(31) * F.lit(2147483648) + fold(37)

    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    hcol = (F.xxhash64("tok") if hash_mode == "xxhash64"
            else portable_token_hash(F.col("tok")))
    th = tokens.withColumn("h", hcol)
    bits = th.select(
        id_col,
        *[F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
          .otherwise(-1).alias(f"b{i}") for i in range(64)])
    agg = bits.groupBy(id_col).agg(*[F.sum(f"b{i}").alias(f"b{i}") for i in range(64)])
    return agg.select(
        id_col,
        sum((F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
             * F.lit(1 << i) if i < 63
             else F.when(F.col(f"b{i}") > 0, F.lit(-(1 << 63)))
             .otherwise(F.lit(0)).cast("long"))
            for i in range(64)).alias("simhash"))


@pytest.mark.parametrize("mode", ["xxhash64", "portable"])
def test_simhash_kernel_matches_explode_reference(spark, docs, mode):
    sub = docs.limit(120)
    got = {r.doc_id: r.simhash
           for r in dedup.simhash(sub, "doc_id", "text", hash_mode=mode).collect()}
    want = {r.doc_id: r.simhash
            for r in _explode_simhash(sub, "doc_id", "text", mode).collect()}
    assert got == want


@pytest.mark.parametrize("mode", ["xxhash64", "portable"])
def test_simhash_kernel_unicode_and_edge_docs(spark, mode):
    texts = ["héllo wörld ünïcode tökens", "日本語 テスト one two", "", "   ",
             "\t\n\x0b\f\r mixed \t ws", "single", "a " * 300 + "b",
             "long-token-" + "x" * 80 + " short"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: r.simhash
           for r in dedup.simhash(df, "doc_id", "text", hash_mode=mode).collect()}
    want = {r.doc_id: r.simhash
            for r in _explode_simhash(df, "doc_id", "text", mode).collect()}
    assert got == want


def test_xxhash64_kernel_matches_spark(spark):
    import pandas as pd
    from varint_spark.pipeline import textkernels as tk

    toks = [""] + ["x" * n for n in (1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17,
                                     31, 32, 33, 63, 64, 65, 100)] \
        + ["hello", "wörld", "日本語テスト", "The quick brown fox jumps over it",
           bytes(range(1, 32)).decode("latin-1")]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(toks)],
                               "i long, t string")
    want = {r.i: r.h for r in df.select("i", F.xxhash64("t").alias("h")).collect()}
    plane, offs = tk.to_plane(pd.Series(toks))
    got = tk.xxhash64_strings(plane, offs[:-1].astype(np.int64),
                              np.diff(offs).astype(np.int64)).view(np.int64)
    assert {i: int(h) for i, h in enumerate(got)} == want


def test_multimodal_null_payload_distinct_from_empty(spark):
    """ADVICE r3: a NULL payload reaches the decoder as None (here: the
    fake decoder's None branch -> all-zero features), while an EMPTY
    payload is a real zero-length buffer (sha256(b"") -> non-zero
    features) — the two must not collapse into one another."""
    df = spark.createDataFrame(
        [(1, "image", b"xx"), (2, None, b""), (3, "audio", None)],
        "media_id long, modality string, payload binary")
    out = multimodal.extract_features(df, feature_dim=4).collect()
    by_id = {r.media_id: list(r.features) for r in out}
    assert by_id[3] == [0.0, 0.0, 0.0, 0.0]
    assert any(v != 0.0 for v in by_id[2])
    assert any(v != 0.0 for v in by_id[1])


def test_wav_decoder_roundtrips_synthesized_payloads():
    """decode_wav is a real RIFF/WAVE parser: it must recover the exact
    PCM samples synthesize_wav_media wrote, and reject malformed bytes."""
    n = 37
    k = np.arange(n, dtype=np.int64)
    s = ((5 * 31 + k * 7) % 65536 - 32768).astype("<i2")
    data = s.tobytes()
    wav = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
           + b"data" + len(data).to_bytes(4, "little") + data)
    got = multimodal.decode_wav(wav)
    np.testing.assert_array_equal(got, s)
    # an extra chunk before data must be skipped (word-aligned walk)
    wav2 = wav[:12] + b"LIST" + (3).to_bytes(4, "little") + b"abc\x00" + wav[12:]
    np.testing.assert_array_equal(multimodal.decode_wav(wav2), s)
    for bad in (b"", b"RIFFxxxxWAVE", wav[:20],
                wav.replace(b"fmt ", b"fmx ")):
        with pytest.raises(ValueError):
            multimodal.decode_wav(bad)
    # stereo / non-PCM rejected
    stereo = wav.replace((1).to_bytes(2, "little") + (1).to_bytes(2, "little"),
                         (1).to_bytes(2, "little") + (2).to_bytes(2, "little"), 1)
    with pytest.raises(ValueError):
        multimodal.decode_wav(stereo)


def test_wav_features_match_reference(spark, docs):
    sub = docs.limit(40)
    media = multimodal.synthesize_wav_media(sub)
    feats = multimodal.extract_features(
        media, feature_dim=4, decoder=multimodal.wav_feature_decoder)
    got = {r.media_id: [int(x) for x in r.features] for r in feats.collect()}
    for r in sub.collect():
        n = len(r.text) % 64 + 16
        k = np.arange(n, dtype=np.int64)
        s = (r.doc_id * 31 + k * 7) % 65536 - 32768
        assert got[r.doc_id] == [n, int(np.abs(s).sum()), int(s[0]), int(s.max())]


def test_simhash_near_dup_finds_planted_duplicates(spark, docs):
    sub = docs.limit(60).select("doc_id", "text") \
        .filter(F.length(F.trim("text")) > 0)
    doubled = sub.union(sub.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    pairs = dedup.simhash_near_dup_pairs(doubled, "doc_id", "text",
                                         max_hamming=3, bands=8)
    found = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    for r in sub.collect():
        assert found.get((r.doc_id, r.doc_id + 1_000_000)) == 0, r.doc_id
    # exact recall: every pair the brute-force check admits is present
    sh = {r.doc_id: r.simhash
          for r in dedup.simhash(doubled, "doc_id", "text").collect()}
    ids = sorted(sh)
    brute = {(a, b): bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
             for i, a in enumerate(ids) for b in ids[i + 1:]}
    brute = {k: v for k, v in brute.items() if v <= 3}
    assert found == brute


def test_simhash_near_dup_band_guard():
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_near_dup_pairs(None, "id", "t", max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="divide"):
        dedup.simhash_near_dup_pairs(None, "id", "t", max_hamming=3, bands=7)


def test_ppm_decoder_roundtrips_and_rejects():
    w, h, d = 5, 3, 11
    i = np.arange(w * h * 3, dtype=np.int64)
    pix = ((d * 7 + (i // (w * 3)) * 5 + ((i % (w * 3)) // 3) * 3 + i % 3)
           % 256).astype(np.uint8)
    ppm = b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()
    img = multimodal.decode_ppm(ppm)
    assert img.shape == (h, w, 3)
    np.testing.assert_array_equal(img.ravel(), pix)
    # header comments are skipped per the spec
    ppm_c = b"P6\n# a comment\n%d %d\n255\n" % (w, h) + pix.tobytes()
    np.testing.assert_array_equal(multimodal.decode_ppm(ppm_c).ravel(), pix)
    for bad in (b"", b"P5\n1 1\n255\nx", ppm[:-4],
                b"P6\n2 2\n65535\n" + bytes(12)):
        with pytest.raises(ValueError):
            multimodal.decode_ppm(bad)


def test_ppm_features_match_reference(spark, docs):
    sub = docs.limit(30)
    media = multimodal.synthesize_ppm_media(sub)
    feats = multimodal.extract_features(
        media, feature_dim=4, decoder=multimodal.ppm_feature_decoder)
    got = {r.media_id: [int(x) for x in r.features] for r in feats.collect()}
    for r in sub.collect():
        w, h, d = len(r.text) % 8 + 2, r.doc_id % 6 + 2, r.doc_id
        i = np.arange(w * h * 3, dtype=np.int64)
        v = (d * 7 + (i // (w * 3)) * 5 + ((i % (w * 3)) // 3) * 3 + i % 3) % 256
        assert got[d] == [w * h, int(v[i % 3 == 0].sum()), int(v.sum()),
                          int(v.max())]


def test_resize_nearest_and_frame_sampling():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.int64).astype(np.uint8)
    out = multimodal.resize_nearest(img, 3, 3)
    assert out.shape == (3, 3, 3)
    for y in range(3):
        for x in range(3):
            np.testing.assert_array_equal(out[y, x],
                                          img[y * 7 // 3, x * 5 // 3])
    # frame sampling: every 2nd fixed-size frame, zero-copy views
    payload = bytes(range(100)) * 6  # 600 bytes = 6 frames of 100
    frames = multimodal.sample_frames(payload, 100, 2)
    assert len(frames) == 3
    assert bytes(frames[1]) == payload[200:300]
    with pytest.raises(ValueError):
        multimodal.sample_frames(payload, 0, 2)


def test_quantize_embeddings_reconstruction_bound(spark, embs):
    q = similarity.quantize_embeddings(embs, "vec_id", "embedding")
    rows = {r.vec_id: r for r in q.collect()}
    for r in embs.limit(40).collect():
        v = np.asarray(r.embedding, dtype=np.float64)
        qr = rows[r.vec_id]
        codes = np.asarray(qr.codes, dtype=np.float64)
        assert len(codes) == len(v)
        assert np.abs(codes).max() <= 127
        # reconstruction within half a quantization step per component
        if qr.scale > 0:
            assert np.abs(codes * qr.scale - v).max() <= qr.scale / 2 + 1e-12
    # all-zero vector edge: scale 0, zero codes
    z = spark.createDataFrame([(1, [0.0] * 8)], "vec_id long, embedding array<float>")
    zr = similarity.quantize_embeddings(z, "vec_id", "embedding").collect()[0]
    assert zr.scale == 0.0 and list(zr.codes) == [0] * 8


def test_new_operators_handle_empty_inputs(spark):
    """Empty-input sweep over the round-4 operators: none may throw or
    return phantom rows."""
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.simhash(empty_docs, "doc_id", "text").count() == 0
    assert dedup.simhash_near_dup_pairs(empty_docs, "doc_id", "text").count() == 0
    empty_embs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.quantize_embeddings(empty_embs, "vec_id",
                                          "embedding").count() == 0
    assert similarity.lsh_buckets(empty_embs, "vec_id", "embedding").count() == 0
    media = spark.createDataFrame([], "media_id long, modality string, payload binary")
    assert multimodal.extract_features(media, 4).count() == 0


def test_vocab_top_tokens_matches_python_counts(spark, docs):
    from collections import Counter

    got = [(r.token, r.n) for r in
           textstats.vocab_top_tokens(docs, "text", k=30).collect()]
    counts = Counter()
    for r in docs.collect():
        counts.update(t for t in r.text.split() if t)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert got == want
    # determinism across parallelism (partial counts merge identically)
    g2 = [(r.token, r.n) for r in
          textstats.vocab_top_tokens(docs.repartition(7), "text", k=30).collect()]
    assert g2 == want


def test_simhash_incremental_matches_brute_force(spark, docs):
    """New-batch × stored-index banding must find exactly the cross-batch
    pairs a brute-force Hamming join admits — and must never tokenize the
    old corpus (it only ever sees the signature table)."""
    old = docs.filter("doc_id < 40").select("doc_id", "text") \
        .filter(F.length(F.trim("text")) > 0)
    new = docs.filter("doc_id >= 40 AND doc_id < 70").select("doc_id", "text") \
        .union(old.limit(10).withColumn("doc_id", F.col("doc_id") + 1_000_000))
    index_sigs = dedup.simhash(old, "doc_id", "text")
    got = {(r.new_id, r.old_id): r.hamming
           for r in dedup.simhash_incremental_pairs(
               index_sigs, new, "doc_id", "text", max_hamming=3,
               bands=8).collect()}
    # planted copies of stored docs are found at hamming 0
    for r in old.limit(10).collect():
        assert got.get((r.doc_id + 1_000_000, r.doc_id)) == 0, r.doc_id
    sh_old = {r.doc_id: r.simhash for r in index_sigs.collect()}
    sh_new = {r.doc_id: r.simhash
              for r in dedup.simhash(new, "doc_id", "text").collect()}
    brute = {(n, o): bin((sh_new[n] ^ sh_old[o]) & ((1 << 64) - 1)).count("1")
             for n in sh_new for o in sh_old}
    brute = {k: v for k, v in brute.items() if v <= 3}
    assert got == brute


def test_simhash_incremental_guards():
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_incremental_pairs(None, None, "id", "t",
                                        max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="divide"):
        dedup.simhash_incremental_pairs(None, None, "id", "t",
                                        max_hamming=3, bands=7)


def test_minhash_incremental_matches_union_lsh(spark, docs):
    """Banding a new batch against stored minhash signatures must produce
    exactly the cross-batch candidates the self-join LSH finds on the
    union of both batches (same banding scheme), and must find planted
    copies of indexed docs."""
    old = docs.filter("doc_id < 40").select("doc_id", "text") \
        .filter(F.length(F.trim("text")) > 0)
    new = docs.filter("doc_id >= 40 AND doc_id < 70").select("doc_id", "text") \
        .union(old.limit(8).withColumn("doc_id", F.col("doc_id") + 1_000_000))
    index_sigs = dedup.minhash_signatures(old, "doc_id", "text")
    got = {(r.new_id, r.old_id)
           for r in dedup.minhash_incremental_pairs(
               index_sigs, new, "doc_id", "text").collect()}
    for r in old.limit(8).collect():  # identical text -> identical bands
        assert (r.doc_id + 1_000_000, r.doc_id) in got, r.doc_id
    old_ids = {r.doc_id for r in old.collect()}
    new_ids = {r.doc_id for r in new.collect()}
    union_pairs = dedup.minhash_lsh_pairs(old.union(new), "doc_id", "text")
    want = {(r.id_b, r.id_a) for r in union_pairs.collect()
            if r.id_a in old_ids and r.id_b in new_ids}
    assert got == want


def test_sessionize_gap_semantics(spark):
    """Strict-gap boundary, deterministic ties, 1-based indices."""
    from varint_spark.pipeline import sessions

    MIN = 60_000_000  # µs
    rows = [  # user 1: gaps exactly 30min (no split) and 30min+1µs (split)
        (1, 1, 0), (2, 1, 30 * MIN), (3, 1, 60 * MIN + 1),
        # user 2: tie on ts -> event_id breaks it, same session
        (10, 2, 5 * MIN), (11, 2, 5 * MIN), (12, 2, 200 * MIN),
    ]
    import datetime
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(e, u, base + datetime.timedelta(microseconds=off))
         for e, u, off in rows], "event_id long, user_id long, ts timestamp_ntz")
    got = {r.event_id: r.session_idx
           for r in sessions.sessionize(df, gap_minutes=30).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 10: 1, 11: 1, 12: 2}
    stats = {(r.user_id, r.session_idx): (r.n_events, r.duration_us)
             for r in sessions.session_stats(df, gap_minutes=30).collect()}
    assert stats[(1, 1)] == (2, 30 * MIN)
    assert stats[(1, 2)] == (1, 0)
    assert stats[(2, 2)] == (1, 0)


def test_stratified_sample_deterministic_and_stratified(spark):
    from varint_spark.pipeline import sampling

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fr = {"src1": 1.0, "src3": 0.5, "src5": 0.0}
    kept = sampling.stratified_sample(docs, "source", "doc_id", fr)
    rows = kept.select("doc_id", "source").collect()
    srcs = {r.source for r in rows}
    assert "src1" in srcs and "src5" not in srcs
    assert srcs <= {"src1", "src3"}  # unlisted sources dropped
    n_src1_all = docs.filter("source = 'src1'").count()
    assert sum(1 for r in rows if r.source == "src1") == n_src1_all
    # determinism across partitionings: same ids regardless of layout
    ids1 = {r.doc_id for r in rows}
    ids2 = {r.doc_id for r in
            sampling.stratified_sample(docs.repartition(13), "source",
                                       "doc_id", fr).collect()}
    assert ids1 == ids2
    # global float rate: roughly the asked fraction (500-doc table),
    # exactly reproducible
    half = sampling.stratified_sample(docs, "source", "doc_id", 0.5)
    n = half.count()
    assert abs(n - 250) < 50 and n == sampling.stratified_sample(
        docs, "source", "doc_id", 0.5).count()
    # portable mode replays as plain arithmetic
    port = sampling.stratified_sample(docs, "source", "doc_id", 0.25,
                                      hash_mode="portable")
    want = {r.doc_id for r in docs.collect()
            if ((r.doc_id % 1000003) * 4099 + 42) % 1000000 < 250000}
    assert {r.doc_id for r in port.collect()} == want


def test_pack_next_fit_semantics(spark):
    """Budget respected (except oversized singletons), corpus order
    preserved within bins, deterministic across partitionings."""
    import pytest

    from varint_spark.pipeline import packing

    rows = [(i, "a", L) for i, L in
            enumerate([400, 400, 300, 900, 2500, 100, 100])] \
        + [(100 + i, "b", 600) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_chars long")
    got = {r.doc_id: r.bin for r in packing.pack_next_fit(
        df, "src", "doc_id", "n_chars", 1000).collect()}
    # a: [400+400] [300] <- 900 overflows? 400+400=800, +300=1100>1000 ->
    # bin1 starts at 300, +900=1200>1000 -> bin2=900, +2500>1000 ->
    # bin3=2500 (oversized alone), 100 -> bin4, +100 -> bin4
    assert got[0] == 0 and got[1] == 0
    assert got[2] == 1
    assert got[3] == 2
    assert got[4] == 3          # oversized doc gets its own bin
    assert got[5] == 4 and got[6] == 4
    assert [got[100 + i] for i in range(4)] == [0, 1, 2, 3]  # 600+600 > 1000
    got2 = {r.doc_id: r.bin for r in packing.pack_next_fit(
        df.repartition(7), "src", "doc_id", "n_chars", 1000).collect()}
    assert got == got2
    stats = {(r.src, r.bin): (r.n_docs, r.total_len)
             for r in packing.pack_stats(df, "src", "doc_id",
                                         "n_chars", 1000).collect()}
    assert stats[("a", 0)] == (2, 800)
    assert stats[("a", 3)] == (1, 2500)
    assert all(t <= 1000 or n == 1 for n, t in stats.values())
    with pytest.raises(ValueError, match="positive"):
        packing.pack_next_fit(df, "src", "doc_id", "n_chars", 0)


def test_token_postings_search(spark, docs):
    """Posting bitmaps reproduce exact membership; conjunctive AND on the
    serialized form equals the python set intersection; absent terms
    short-circuit empty; vocab restricts the indexed terms."""
    from varint_spark.pipeline import textindex

    postings = textindex.build_token_postings(
        docs, "doc_id", "text", vocab=["join", "filter", "nosuchtoken"])
    assert {r.token for r in postings.select("token").collect()} \
        <= {"join", "filter"}
    texts = {r.doc_id: set(r.text.split()) for r in docs.collect()}
    want = sorted(i for i, t in texts.items()
                  if "join" in t and "filter" in t)
    got = sorted(r.doc_id for r in textindex.search_all_terms(
        spark, postings, ["join", "filter"]).collect())
    assert got == want and got  # non-trivial intersection
    assert textindex.search_all_terms(
        spark, postings, ["join", "nosuchtoken"]).count() == 0
    # single-term query = that term's exact posting list
    one = sorted(r.doc_id for r in textindex.search_all_terms(
        spark, postings, ["filter"]).collect())
    assert one == sorted(i for i, t in texts.items() if "filter" in t)


def test_postings_boolean_search(spark, docs):
    """(AND all_of) ∩ (OR any_of) \\ (OR none_of) on serialized postings
    equals the python set algebra; guard rails on the degenerate shapes."""
    from varint_spark.pipeline import textindex

    vocab = ["join", "scan", "filter", "hash"]
    postings = textindex.build_token_postings(docs, "doc_id", "text",
                                              vocab=vocab)
    texts = {r.doc_id: set(r.text.split()) for r in docs.collect()}

    def ids(pred):
        return sorted(i for i, t in texts.items() if pred(t))

    got = sorted(r.doc_id for r in textindex.search_boolean(
        spark, postings, any_of=["join", "scan"],
        none_of=["filter"]).collect())
    assert got == ids(lambda t: ("join" in t or "scan" in t)
                      and "filter" not in t)
    got = sorted(r.doc_id for r in textindex.search_boolean(
        spark, postings, all_of=["join", "hash"],
        any_of=["scan", "filter"]).collect())
    assert got == ids(lambda t: "join" in t and "hash" in t
                      and ("scan" in t or "filter" in t))
    assert textindex.search_boolean(
        spark, postings, all_of=["join", "notindexed"]).count() == 0
    with pytest.raises(ValueError, match="positive clause"):
        textindex.search_boolean(spark, postings, none_of=["join"])


def test_search_results_born_distributed(spark, docs, monkeypatch):
    """The folded query bitmap must never be decoded into a driver-side
    Python id list: driver-side code only shards the serialized form
    (shard_serialized); containers decode executor-side in mapInArrow
    (whose workers re-import the module, so this driver-process
    monkeypatch cannot leak into them). Results stay correct."""
    from varint_spark.codecs import bitmap
    from varint_spark.pipeline import textindex

    postings = textindex.build_token_postings(
        docs, "doc_id", "text", vocab=["join", "filter", "scan"])
    postings.cache().count()
    texts = {r.doc_id: set(r.text.split()) for r in docs.collect()}

    def boom(*a, **k):
        raise AssertionError("bitmap.decode called on the driver")

    monkeypatch.setattr(bitmap, "decode", boom)
    got = sorted(r.doc_id for r in textindex.search_all_terms(
        spark, postings, ["join", "filter"]).collect())
    assert got == sorted(i for i, t in texts.items()
                         if "join" in t and "filter" in t) and got
    got = sorted(r.doc_id for r in textindex.search_boolean(
        spark, postings, any_of=["join", "scan"],
        none_of=["filter"]).collect())
    assert got == sorted(i for i, t in texts.items()
                         if ("join" in t or "scan" in t)
                         and "filter" not in t)
    with pytest.raises(ValueError, match="empty query"):
        textindex.search_all_terms(spark, postings, [])


def test_search_no_posting_bytes_on_driver(spark, docs, monkeypatch):
    """r6 collected every query term's serialized posting to the driver at
    once (q × n_docs/8 bytes on wide queries — VERDICT r6 #5); the fold
    now runs per 64Ki shard executor-side. Pin it: no DataFrame whose
    schema carries the 'posting' binary column is ever collect()ed by any
    of the four search entry points, and results stay correct."""
    from pyspark.sql import DataFrame
    from varint_spark.pipeline import textindex

    postings = textindex.build_token_postings(docs, "doc_id", "text")
    pos = textindex.build_positional_postings(docs, "doc_id", "text")
    postings.cache().count(), pos.cache().count()
    texts = {r.doc_id: set(r.text.split()) for r in docs.collect()}

    orig = DataFrame.collect

    def spy(self, *a, **k):
        assert "posting" not in self.columns, \
            "posting bytes collected on the driver"
        return orig(self, *a, **k)

    monkeypatch.setattr(DataFrame, "collect", spy)
    got = sorted(r.doc_id for r in textindex.search_all_terms(
        spark, postings, ["join", "filter"]).collect())
    assert got == sorted(i for i, t in texts.items()
                         if "join" in t and "filter" in t) and got
    textindex.search_boolean(spark, postings, any_of=["join"],
                             none_of=["filter"]).collect()
    textindex.search_phrase(spark, postings, pos, ["join", "filter"]).collect()
    textindex.search_near(spark, postings, pos, ["join", "filter"],
                          slop=3).collect()


def test_pack_kernel_per_bin_equals_row_scan():
    """The per-bin searchsorted kernel is assignment-identical to the
    row-at-a-time reference scan on adversarial shapes: exact-budget
    ties, zero-length docs after a full bin, oversized docs, randoms."""
    from varint_spark.pipeline.packing import pack_next_fit_kernel

    def row_scan(lens, budget):
        bins = np.zeros(len(lens), dtype=np.int64)
        if len(lens):
            fill, b = int(lens[0]), 0
            for i in range(1, len(lens)):
                if fill + int(lens[i]) > budget:
                    b += 1
                    fill = int(lens[i])
                else:
                    fill += int(lens[i])
                bins[i] = b
        return bins

    cases = [
        ([], 10), ([5], 10), ([15], 10),
        ([4, 6, 0, 0, 1], 10),          # exact fill then zero-length docs
        ([10, 10, 10], 10),             # every doc exactly budget
        ([11, 12, 13], 10),             # every doc oversized
        ([3, 3, 3, 3, 3], 9),
    ]
    rng = np.random.default_rng(19)
    for _ in range(20):
        n = int(rng.integers(1, 200))
        cases.append((rng.integers(0, 30, n).tolist(),
                      int(rng.integers(1, 60))))
    for lens, budget in cases:
        a = pack_next_fit_kernel(np.asarray(lens, dtype=np.int64), budget)
        b = row_scan(np.asarray(lens, dtype=np.int64), budget)
        np.testing.assert_array_equal(a, b, err_msg=f"{lens} @ {budget}")


def test_pack_schema_follows_input_types(spark):
    """Non-long order column / non-string bucket column: output types are
    derived from the input schema, not hardcoded."""
    from varint_spark.pipeline import packing

    rows = [(i, 7 * (i % 2), 400) for i in range(6)]
    df = spark.createDataFrame(rows, "ord int, bucket int, n long")
    out = packing.pack_next_fit(df, "bucket", "ord", "n", 1000)
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types == {"ord": "int", "bucket": "int", "bin": "bigint"}
    got = {(r.bucket, r.ord): r.bin for r in out.collect()}
    assert got[(0, 0)] == 0 and got[(0, 2)] == 0 and got[(0, 4)] == 1
    assert got[(7, 1)] == 0 and got[(7, 3)] == 0 and got[(7, 5)] == 1


def test_portable_sampling_negative_ids_bucket_uniformly(spark):
    """A negative id must not bypass the keep-fraction filter (plain %
    gave it a negative bucket that passed every threshold); both hash
    modes now keep a negative-id population at roughly the fraction."""
    from varint_spark.pipeline import sampling

    ids = spark.range(-4000, 0).withColumnRenamed("id", "doc_id") \
        .withColumn("src", F.lit("a"))
    for mode in ("portable", "xxhash64"):
        n = sampling.stratified_sample(
            ids, "src", "doc_id", 0.25, hash_mode=mode).count()
        assert 700 < n < 1300, (mode, n)


def _phrase_ids(texts: dict, phrase: list[str]) -> list[int]:
    # python reference: whitespace tokens, exact adjacent subsequence
    out = []
    for i, t in texts.items():
        toks = t.split()
        if any(toks[j:j + len(phrase)] == phrase
               for j in range(len(toks) - len(phrase) + 1)):
            out.append(i)
    return sorted(out)


def test_phrase_search(spark, docs):
    """Positional postings + adjacency verify reproduce exact phrase
    membership for 1/2/3-token and repeated-token phrases; an absent
    token short-circuits empty; empty phrase raises."""
    from varint_spark.pipeline import textindex

    vocab = ["key", "scan", "query", "a", "value"]
    postings = textindex.build_token_postings(docs, "doc_id", "text",
                                              vocab=vocab)
    pos = textindex.build_positional_postings(docs, "doc_id", "text",
                                              vocab=vocab)
    postings.cache().count(), pos.cache().count()
    texts = {r.doc_id: r.text for r in docs.collect()}

    for phrase in (["key", "scan"], ["key", "scan", "query"],
                   ["a", "a"], ["value"]):
        got = sorted(r.doc_id for r in textindex.search_phrase(
            spark, postings, pos, phrase).collect())
        assert got == _phrase_ids(texts, phrase), phrase
    # at least one of the shapes must be non-trivial on this fixture
    assert _phrase_ids(texts, ["key", "scan"]) or \
        _phrase_ids(texts, ["a", "a"])
    assert textindex.search_phrase(
        spark, postings, pos, ["key", "nosuchtoken"]).count() == 0
    with pytest.raises(ValueError, match="empty phrase"):
        textindex.search_phrase(spark, postings, pos, [])


def test_phrase_search_multi_shard(spark):
    """Doc ids straddling the 64Ki container boundary: positional shards
    align with the bitmap containers and the per-shard verify unions
    correctly across shards."""
    from varint_spark.pipeline import textindex

    rows = [(65530 + i, "x y z" if i % 3 == 0 else "x z y")
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    postings = textindex.build_token_postings(df, "doc_id", "text")
    pos = textindex.build_positional_postings(df, "doc_id", "text")
    got = sorted(r.doc_id for r in textindex.search_phrase(
        spark, postings, pos, ["x", "y"]).collect())
    want = sorted(i for i, t in rows if t.startswith("x y"))
    assert got == want and len({i >> 16 for i in want}) == 2


def test_phrase_results_born_distributed(spark, docs, monkeypatch):
    """Phrase queries keep the module's driver contract: the driver only
    folds/shards serialized bitmaps — full-bitmap decode and positional
    decode never run driver-side (executor workers re-import the module,
    so these driver-process monkeypatches cannot leak into them)."""
    from varint_spark.codecs import bitmap
    from varint_spark.pipeline import textindex

    vocab = ["key", "scan"]
    postings = textindex.build_token_postings(docs, "doc_id", "text",
                                              vocab=vocab)
    pos = textindex.build_positional_postings(docs, "doc_id", "text",
                                              vocab=vocab)
    postings.cache().count(), pos.cache().count()
    texts = {r.doc_id: r.text for r in docs.collect()}

    def boom(*a, **k):
        raise AssertionError("decode called on the driver")

    monkeypatch.setattr(bitmap, "decode", boom)
    monkeypatch.setattr(textindex, "decode_pos_block", boom)
    got = sorted(r.doc_id for r in textindex.search_phrase(
        spark, postings, pos, ["key", "scan"]).collect())
    assert got == _phrase_ids(texts, ["key", "scan"])


def test_pos_block_roundtrip():
    """pos_block layout: (docs, counts, positions) through the engine's
    cost-gated int codecs, byte-deterministic for a fixed value set."""
    import pyarrow as pa
    from varint_spark.pipeline.textindex import (_encode_pos_group,
                                                 decode_pos_block)

    lows = [5, 5, 5, 9, 130, 130]
    ps = [2, 40, 41, 0, 7, 1000]
    t = pa.table({"token": ["t"] * 6, "shard": [0] * 6,
                  "low": lows, "pos": ps})
    blob = _encode_pos_group(None, t).column("pos_block")[0].as_py()
    docs, counts, pos = decode_pos_block(blob)
    assert docs.tolist() == [5, 9, 130]
    assert counts.tolist() == [3, 1, 2]
    assert pos.tolist() == [2, 40, 41, 0, 7, 1000]
    # permuted input rows -> identical bytes (lexsort canonicalization)
    t2 = pa.table({"token": ["t"] * 6, "shard": [0] * 6,
                   "low": lows[::-1], "pos": ps[::-1]})
    assert _encode_pos_group(None, t2).column("pos_block")[0].as_py() == blob


def _near_ids(texts: dict, tokens: list[str], slop: int) -> list[int]:
    # python reference DP: ordered chain with every gap in [1, slop]
    out = []
    for i, t in texts.items():
        toks = t.split()
        reach = [j for j, w in enumerate(toks) if w == tokens[0]]
        for want in tokens[1:]:
            nxt = [j for j, w in enumerate(toks) if w == want
                   and any(1 <= j - q <= slop for q in reach)]
            reach = nxt
        if reach:
            out.append(i)
    return sorted(out)


def test_near_search(spark, docs):
    """Ordered proximity: vectorized DP equals the python reference for
    several slops; slop=1 equals the phrase result; guard rails."""
    from varint_spark.pipeline import textindex

    vocab = ["key", "scan", "query", "a"]
    postings = textindex.build_token_postings(docs, "doc_id", "text",
                                              vocab=vocab)
    pos = textindex.build_positional_postings(docs, "doc_id", "text",
                                              vocab=vocab)
    postings.cache().count(), pos.cache().count()
    texts = {r.doc_id: r.text for r in docs.collect()}

    for tokens, slop in ((["key", "scan"], 3), (["key", "scan", "query"], 4),
                         (["a", "a"], 2), (["key", "scan"], 1)):
        got = sorted(r.doc_id for r in textindex.search_near(
            spark, postings, pos, tokens, slop=slop).collect())
        assert got == _near_ids(texts, tokens, slop), (tokens, slop)
    # wider slop can only add docs; slop=1 == phrase
    s1 = sorted(r.doc_id for r in textindex.search_near(
        spark, postings, pos, ["key", "scan"], slop=1).collect())
    ph = sorted(r.doc_id for r in textindex.search_phrase(
        spark, postings, pos, ["key", "scan"]).collect())
    assert s1 == ph
    s5 = sorted(r.doc_id for r in textindex.search_near(
        spark, postings, pos, ["key", "scan"], slop=5).collect())
    assert set(s1) <= set(s5)
    with pytest.raises(ValueError, match="slop"):
        textindex.search_near(spark, postings, pos, ["key"], slop=0)


def test_incremental_postings_merge_equals_rebuild(spark, docs):
    """Rolling-crawl index maintenance: build per-batch postings, merge,
    and the result is BYTE-identical to a from-scratch build over the
    union corpus — for both the doc-granular bitmaps and the positional
    blocks. The old batch's text is never re-read (only its postings),
    and merged indexes answer queries identically to rebuilt ones."""
    from varint_spark.pipeline import textindex

    vocab = ["key", "scan", "join", "filter", "a"]
    old_docs = docs.filter(F.col("doc_id") % 2 == 0)
    new_docs = docs.filter(F.col("doc_id") % 2 == 1)

    full = {r.token: bytes(r.posting) for r in textindex.build_token_postings(
        docs, "doc_id", "text", vocab=vocab).collect()}
    merged_df = textindex.merge_token_postings(
        textindex.build_token_postings(old_docs, "doc_id", "text", vocab=vocab),
        textindex.build_token_postings(new_docs, "doc_id", "text", vocab=vocab))
    merged = {r.token: bytes(r.posting) for r in merged_df.collect()}
    assert merged == full and len(full) == len(vocab)

    full_pos = {(r.token, r.shard): bytes(r.pos_block)
                for r in textindex.build_positional_postings(
                    docs, "doc_id", "text", vocab=vocab).collect()}
    merged_pos_df = textindex.merge_positional_postings(
        textindex.build_positional_postings(
            old_docs, "doc_id", "text", vocab=vocab),
        textindex.build_positional_postings(
            new_docs, "doc_id", "text", vocab=vocab))
    merged_pos = {(r.token, r.shard): bytes(r.pos_block)
                  for r in merged_pos_df.collect()}
    assert merged_pos == full_pos

    # a token present in only one batch must survive the merge verbatim
    only_old = textindex.build_token_postings(
        old_docs, "doc_id", "text", vocab=["key"])
    empty = spark.createDataFrame([], "token string, posting binary")
    kept = {r.token: bytes(r.posting) for r in
            textindex.merge_token_postings(only_old, empty).collect()}
    assert kept == {r.token: bytes(r.posting) for r in only_old.collect()}

    # merged index answers a phrase query identically to the rebuilt one
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = sorted(r.doc_id for r in textindex.search_phrase(
        spark, merged_df, merged_pos_df, ["key", "scan"]).collect())
    assert got == _phrase_ids(texts, ["key", "scan"])
