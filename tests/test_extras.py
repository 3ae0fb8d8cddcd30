"""Tests for the training-data-pipeline extras: dedup family, similarity
search, text stats, multimodal plumbing."""

import json
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup of 1
        (3, "the quick brown fox jumped over the lazy dog", "en"),  # near dup
        (4, "def parse(value): return value.strip().lower()", "code"),
        (5, "def parse(value): return value.strip().upper()", "code"),  # near dup of 4
        (6, "completely different content about weather patterns", "en"),
        (7, "der hund und die katze sind nicht zu hause", "de"),
        (8, "", "en"),
    ]
    return spark.createDataFrame(rows, "id: long, content: string, lang: string")


def test_exact_dedup(spark, docs):
    from fuzzspark.extras.dedup import exact_dup_clusters
    out = exact_dup_clusters(docs).collect()
    assert len(out) == 1
    assert out[0]["dup_count"] == 2
    assert out[0]["keep_id"] == 1
    assert out[0]["member_ids"] == [1, 2]


def test_simhash_deterministic_and_near(spark, docs):
    from fuzzspark.extras.dedup import simhash64, simhash_near_dup_pairs
    # deterministic across calls
    assert simhash64("hello world") == simhash64("hello world")
    # near-dup docs differ in few bits; unrelated docs in many
    h1 = simhash64("the quick brown fox jumps over the lazy dog")
    h3 = simhash64("the quick brown fox jumped over the lazy dog")
    h6 = simhash64("completely different content about weather patterns")
    near = bin(h1 ^ h3).count("1")
    far = bin(h1 ^ h6).count("1")
    assert near < far
    pairs = simhash_near_dup_pairs(docs, content_col="content",
                                   max_hamming=near).collect()
    found = {(r["left_id"], r["right_id"]) for r in pairs}
    assert (1, 2) in found  # identical -> hamming 0
    assert (1, 3) in found or (2, 3) in found


def test_minhash_near_dup(spark, docs):
    from fuzzspark.extras.dedup import minhash_near_dup_pairs
    out = minhash_near_dup_pairs(docs, content_col="content",
                                 jaccard_cutoff=0.5).collect()
    found = {(r["left_id"], r["right_id"]) for r in out}
    assert (1, 2) in found
    assert (1, 3) in found
    assert not any({6} & set(p) for p in found)


def test_ngram_jaccard_col(spark):
    from fuzzspark.extras.dedup import ngram_jaccard_col
    df = spark.createDataFrame([("abcd", "abcd"), ("abcd", "wxyz"),
                                ("ab", "ab")],
                               "s1: string, s2: string")
    rows = df.withColumn("j", ngram_jaccard_col("s1", "s2", 3)).collect()
    assert rows[0]["j"] == 1.0
    assert rows[1]["j"] == 0.0
    assert rows[2]["j"] == 1.0  # both below n -> empty sets -> defined as 1.0


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((8, 16))
    rows = []
    for i in range(8):
        rows.append((i, [float(x) for x in base[i]], i % 2))
        # id+100 = small perturbation of id -> its nearest neighbor
        rows.append((i + 100, [float(x) for x in base[i]
                               + 0.01 * rng.standard_normal(16)], i % 2))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")


def test_cosine_topk_exact(spark, embeddings):
    from fuzzspark.extras.similarity import cosine_topk
    q = embeddings.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = cosine_topk(embeddings, q, k=1).collect()
    for r in out:
        assert r["cand_id"] == r["query_id"] + 100, r


def test_lsh_topk_recall(spark, embeddings):
    from fuzzspark.extras.similarity import lsh_cosine_topk
    q = embeddings.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_cosine_topk(embeddings, q, k=1, dim=16,
                          n_bands=8, bits_per_band=4).collect()
    hits = sum(1 for r in out if r["cand_id"] == r["query_id"] + 100)
    assert hits >= 6  # near-identical vectors share bands w.h.p.


def test_ivf_topk(spark, embeddings):
    from fuzzspark.extras.similarity import ivf_topk
    q = embeddings.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_topk(embeddings, q, k=1, dim=16, n_cells=4, nprobe=4).collect()
    hits = sum(1 for r in out if r["cand_id"] == r["query_id"] + 100)
    assert hits == 8  # nprobe == n_cells -> exhaustive -> exact


def test_textstats(spark, docs):
    from fuzzspark.extras.textstats import quality_cols, token_count_col, langid_udf
    out = (docs.withColumn("ntok", token_count_col("content"))
           .withColumn("lang_guess", langid_udf()(F.col("content"))))
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["ntok"] == 9
    assert rows[8]["ntok"] == 0
    assert rows[1]["lang_guess"] == "en"
    assert rows[7]["lang_guess"] == "de"
    assert rows[4]["lang_guess"] == "code"
    q = docs.select("id", *[v.alias(k) for k, v in
                            quality_cols("content").items()]).collect()
    for r in q:
        assert 0.0 <= r["alpha_ratio"] <= 1.0


def test_rolling_fingerprint(spark, docs):
    from fuzzspark.extras.textstats import rolling_fingerprint_udf
    out1 = {r["id"]: r["fp"] for r in docs.select(
        "id", rolling_fingerprint_udf()(F.col("content")).alias("fp")).collect()}
    out2 = {r["id"]: r["fp"] for r in docs.select(
        "id", rolling_fingerprint_udf()(F.col("content")).alias("fp")).collect()}
    assert out1 == out2  # deterministic
    assert out1[1] == out1[2]  # identical docs -> identical fingerprint
    assert out1[1] != out1[6]


def test_multimodal_plumbing(spark, docs):
    from fuzzspark.extras.multimodal import (extract_features, frame_sample_plan,
                                             text_as_media)
    media = text_as_media(docs, id_col="id", text_col="content")
    assert media.schema["blob"].dataType.typeName() == "binary"
    feats = extract_features(media, fake=True)
    rows = {r["id"]: r for r in feats.collect()}
    assert len(rows) == 8
    v = json.loads(rows[1]["feature"])
    assert len(v) == 8 and all(0.0 <= x <= 1.0 for x in v)
    assert rows[1]["feature"] == rows[2]["feature"]  # same bytes, same feature
    assert rows[1]["blob_sha"] != rows[3]["blob_sha"]
    # real decode is explicitly stubbed
    with pytest.raises(NotImplementedError):
        extract_features(media, fake=False)
    plan = frame_sample_plan(media, every_ms=100)
    vids = media.where("kind = 'video'").count()
    assert plan.count() >= vids  # at least one frame per video
    assert plan.groupBy("id").count().count() == vids


def test_fuzzy_topk_join(spark):
    from fuzzspark.extras.search import fuzzy_topk_join
    from fuzzspark.kernels.fuzz import ratio_raw
    qs = [(1, "apple pie"), (2, "banana bread"), (3, "zzzz")]
    cs = [(10, "apple pies"), (11, "apple tart"), (12, "banana loaf"),
          (13, "bananas bread"), (14, "cherry cake")]
    qdf = spark.createDataFrame(qs, "qid: long, qname: string")
    cdf = spark.createDataFrame(cs, "cid: long, cname: string")
    out = fuzzy_topk_join(qdf, cdf, query_col="qname", choice_col="cname",
                          query_id="qid", choice_id="cid",
                          scorer="ratio", k=2, score_cutoff=0.5).collect()
    got = {(r["query_id"], r["rank"]): (r["choice_id"], r["score"]) for r in out}
    # manual oracle: ratio per pair, cutoff, sort by (-score, cid)
    import itertools
    for qid, qn in qs:
        scored = sorted(((round(ratio_raw(qn, cn), 6), cid)
                         for cid, cn in cs if ratio_raw(qn, cn) >= 0.5),
                        key=lambda t: (-t[0], t[1]))[:2]
        for rank, (score, cid) in enumerate(scored, 1):
            assert got[(qid, rank)] == (cid, score), (qid, rank)
        assert (qid, len(scored) + 1) not in got


def test_embedding_near_dup_pairs_planted(spark):
    """planted perturbed copies are found (LSH recall) and nothing
    below the cutoff survives (exact verify)."""
    import numpy as np
    from fuzzspark.extras.dedup import embedding_near_dup_pairs
    rng = np.random.default_rng(4)
    n, dim = 80, 32
    base = rng.standard_normal((n, dim))
    pert = base + 0.05 * rng.standard_normal((n, dim))
    rows = [(i, base[i].tolist()) for i in range(n)] + \
           [(n + i, pert[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "id: long, embedding: array<double>")
    got = embedding_near_dup_pairs(df, dim=dim, cos_cutoff=0.95).collect()
    pairs = {(r["left_id"], r["right_id"]) for r in got}
    planted = {(i, n + i) for i in range(n)}
    found = len(pairs & planted)
    assert found >= 0.9 * n, f"recall {found}/{n}"
    # exact verify: every returned pair really clears the cutoff
    emb = {i: np.array(e) for i, e in rows}
    for l, r in pairs:
        c = float(emb[l] @ emb[r] /
                  (np.linalg.norm(emb[l]) * np.linalg.norm(emb[r])))
        assert c >= 0.95 - 1e-9, (l, r, c)


def test_dedup_corpus_end_to_end(spark):
    """near-dup groups collapse to the min-id representative; distinct
    docs map to themselves (transitive: a~b, b~c => one group)."""
    from fuzzspark.extras.dedup import dedup_corpus
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(1, base), (2, base + "tail one"), (3, base + "tail two"),
            (10, "completely different content about weather patterns " * 4),
            (11, "yet another unrelated document body entirely " * 4)]
    df = spark.createDataFrame(rows, "id: long, content: string")
    out = {r["id"]: r["representative_id"]
           for r in dedup_corpus(df, jaccard_cutoff=0.6).collect()}
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[10] == 10 and out[11] == 11
