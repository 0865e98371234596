"""Text / dedup / similarity / multimodal function tests (pytest side;
the SQL-oracle equivalence runs in the driver gate)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different text with zero overlap whatsoever here"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, ""),
        (5, "el perro y el gato de la casa que los"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark, docs):
    got = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).collect()}
    assert got[0] == 9 and got[4] == 0 and got[5] == 10


def test_quality_score(spark, docs):
    rows = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert rows[4]["score"] == pytest.approx(0.2)  # empty: only punct term
    assert rows[0]["n_tokens"] == 9
    assert 0 <= rows[0]["stop_ratio"] <= 1


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    assert got[0] == "en" and got[5] == "es" and got[4] == "und"


def test_exact_dups(spark, docs):
    got = dedup.exact_dup_groups(docs).collect()
    assert len(got) == 1
    assert got[0]["dup_count"] == 2 and got[0]["keep_id"] == 0


def test_ngram_jaccard(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # identical docs
    assert (0, 1) in pairs  # near dup: 6/8 shared trigrams
    assert not any(2 in p for p in pairs)


def test_minhash_lsh_agrees_with_exact(spark, docs):
    exact = {(r["id_a"], r["id_b"]) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # LSH pairs are verified exactly, so lsh ⊆ exact; high-sim pairs recalled
    assert lsh <= exact
    assert (0, 3) in lsh


def test_simhash(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(docs).collect()}
    assert got[0] == got[3]  # identical docs → identical fingerprint
    assert got[0] != got[2]
    dup_pairs = {(r["id_a"], r["id_b"]) for r in dedup.simhash_dup_pairs(docs).collect()}
    assert (0, 3) in dup_pairs
    # near-dup docs 0/1 differ in one token: hamming distance small
    h = bin(got[0] ^ got[1]).count("1")
    assert h <= 8


def test_winnowing_fingerprints(spark, docs):
    fp = text.winnowing_fingerprints(docs).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[0] == by_doc[3]  # identical docs → identical fingerprint sets
    inter01 = len(by_doc[0] & by_doc[1]) / len(by_doc[0] | by_doc[1])
    inter02 = len(by_doc[0] & by_doc[2]) / len(by_doc[0] | by_doc[2])
    assert inter01 > inter02  # near-dup overlaps more than unrelated


@pytest.fixture()
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 16).astype("float32")
    vecs[1] = vecs[0] + 0.01 * rng.randn(16).astype("float32")  # near-dup of 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk(spark, emb):
    got = similarity.cosine_topk(emb, queries=emb.where(F.col("vec_id") == 0), k=3).collect()
    assert got[0]["neighbor_id"] == 1 and got[0]["rank"] == 1
    assert got[0]["sim"] > 0.99


def test_lsh_topk_recall(spark, emb):
    exact = similarity.cosine_topk(emb, k=3)
    approx = similarity.lsh_topk(emb, k=3, num_planes=4, num_tables=8)
    e1 = {(r["query_id"], r["neighbor_id"]) for r in exact.where("rank = 1").collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e1 & a) / len(e1)
    assert recall >= 0.6  # 4-plane/8-table S-curve recalls most top-1s
    # the engineered near-dup is always found
    assert (0, 1) in a and (1, 0) in a


def test_embedding_near_dups(spark, emb):
    exact = {(r["id_a"], r["id_b"]) for r in similarity.embedding_near_dup_pairs(emb, 0.98).collect()}
    assert exact == {(0, 1)}
    approx = {(r["id_a"], r["id_b"]) for r in similarity.embedding_near_dup_pairs(emb, 0.98, exact=False).collect()}
    assert (0, 1) in approx


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """A degenerate corpus of identical vectors hashes every row into ONE
    (table, bucket) group per table — without the cap the bucket self-join
    is O(N²).  With ``max_bucket`` below the corpus size the over-cap
    buckets are dropped entirely, so the candidate pair count is bounded
    (here: zero), mirroring ``dedup.minhash_lsh_pairs``'s cap."""
    rows = [(i, [1.0] * 16) for i in range(50)]
    emb50 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = similarity.lsh_buckets(emb50, num_planes=4, num_tables=2)
    sizes = [r["c"] for r in b.groupBy("table", "bucket").agg(F.count(F.lit(1)).alias("c")).collect()]
    assert max(sizes) == 50  # degenerate by construction
    capped = similarity._cap_buckets(b, max_bucket=10)
    assert capped.count() == 0
    # end-to-end: both LSH paths stay bounded instead of exploding
    assert similarity.lsh_topk(emb50, k=3, max_bucket=10).count() == 0
    assert (
        similarity.embedding_near_dup_pairs(emb50, 0.9, exact=False, max_bucket=10).count()
        == 0
    )
    # and with the cap above the corpus size the pairs come back
    assert (
        similarity.embedding_near_dup_pairs(emb50, 0.9, exact=False, max_bucket=10_000).count()
        == 50 * 49 // 2
    )


def test_multimodal_real_png_decode(spark):
    """The media pipeline decodes REAL PNG bytes (stdlib zlib inflate +
    unfilter) and the features equal the closed-form pattern exactly."""
    media = multimodal.synthetic_media(spark, n=8)
    feats = multimodal.image_features(media).collect()
    assert len(feats) == 8
    by_id = {r["media_id"]: r for r in feats}
    for i in range(8):
        img = multimodal._synth_image(i).astype(np.float64)
        r = by_id[i]
        assert (r["height"], r["width"]) == img.shape[:2]
        assert r["mean_r"] == round(float(img[:, :, 0].mean()), 6)
        assert r["mean_g"] == round(float(img[:, :, 1].mean()), 6)
        assert r["mean_b"] == round(float(img[:, :, 2].mean()), 6)
        assert r["brightness"] == round(float(img.mean()), 6)
    # determinism
    again = multimodal.image_features(multimodal.synthetic_media(spark, n=8)).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))
    frames = multimodal.frame_sample(media).collect()
    assert len(frames) == sum(
        (len(bytes(r["data"])) + 63) // 64 for r in media.collect()
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"not-a-png-blob", fake=False)


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent PNG scanline FORWARD filtering (encode side of RFC
    2083 §6) — exercises every decoder unfilter branch."""
    h, w, _ = img.shape
    stride = w * 3
    rows = img.reshape(h, stride).astype(np.int32)
    out = b""
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        cur = rows[y]
        line = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[i] = (cur[i] - pred) & 0xFF
        out += bytes([ft]) + line.astype(np.uint8).tobytes()
        prev = cur
    return out


def test_png_codec_roundtrip_all_filters():
    import struct
    import zlib

    img = multimodal._synth_image(5)
    # encoder roundtrip (filter 0)
    assert np.array_equal(multimodal.decode_png(multimodal.encode_png(img)), img)
    # grayscale broadcast
    gray = img[:, :, 0]
    dec = multimodal.decode_png(multimodal.encode_png(gray))
    assert np.array_equal(dec[:, :, 0], gray) and np.array_equal(dec[:, :, 1], gray)
    # hand-built PNG cycling filters 0-4: decoder must invert every one
    h, w, _ = img.shape
    raw = _forward_filter(img, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        multimodal._PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(raw))
        + multimodal._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal.decode_png(png), img)


def test_ivf_topk_recall(spark, emb):
    exact = similarity.cosine_topk(emb, k=3)
    approx = similarity.ivf_topk(emb, k=3, n_centroids=6, nprobe=3)
    e1 = {(r["query_id"], r["neighbor_id"]) for r in exact.where("rank = 1").collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e1 & a) / len(e1)
    assert recall >= 0.6  # probing half the cells recalls most top-1s
    assert (0, 1) in a and (1, 0) in a  # engineered near-dup found
    # nprobe = n_centroids degenerates to exact brute force
    full = similarity.ivf_topk(emb, k=3, n_centroids=6, nprobe=6)
    f = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in full.collect()}
    ex = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exact.collect()}
    assert f == ex
    # determinism
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(emb, k=3, n_centroids=6, nprobe=3).collect()
    }
    assert again == a


def test_contamination_hits_python_oracle(spark):
    from networkit_spark.functions import decontaminate as dc

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown fox sleeps all day long"),
            (4, "completely unrelated text about spark plans"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("q1", "what does the quick brown fox do")],
        "qid string, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["n_shingles"])
        for r in dc.contamination_hits(
            docs, bench, n=3, bench_text_col="text"
        ).collect()
    }

    def grams(s, n=3):
        t = s.lower().split()
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    bg = grams("what does the quick brown fox do")
    for did, text in [
        (1, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox sleeps all day long"),
    ]:
        g = grams(text)
        assert out[did] == (len(g & bg), len(g))
    assert 2 not in out and 4 not in out


def test_decontaminate_drops_flagged_docs(spark):
    from networkit_spark.functions import decontaminate as dc

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("b", "alpha beta gamma epsilon")], "qid string, text string"
    )
    kept = dc.decontaminate(docs, bench, n=3).select("doc_id").collect()
    assert {r["doc_id"] for r in kept} == {2}
    # min_hits above the overlap keeps everything
    kept2 = dc.decontaminate(docs, bench, n=3, min_hits=5).count()
    assert kept2 == 2
