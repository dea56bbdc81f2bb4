"""Unit tests for the training-data function library."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog and it is fast"),
        (1, "The quick brown fox jumps over the lazy dog and it is fast"),   # exact dup of 0
        (2, "The quick brown fox jumps over the lazy dog and it is quick"),  # near dup of 0
        (3, "el rapido zorro marron salta sobre el perro con la luna"),
        (4, "completely different content about spark engines and shuffles here"),
        (5, "  The   quick brown fox jumps over the lazy dog and it is fast  "),  # ws-normalized dup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    from estuary_spark.functions.dedup import dedup_exact, exact_dup_groups

    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3       # docs 0, 1, 5
    assert groups[0]["keep_id"] == 0
    kept = dedup_exact(docs)
    assert kept.count() == 4              # 6 - 2 dropped dups


def test_minhash_finds_near_dups(docs):
    from estuary_spark.functions.dedup import minhash_dedup_pairs

    pairs = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs                # exact dup certainly caught
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_signature_members_differ(spark):
    """Regression: each hash-family member must use its own seed."""
    from estuary_spark.functions.dedup import minhash_signature

    row = spark.createDataFrame([("some sample text for hashing",)], ["text"]).select(
        minhash_signature(F.col("text"), num_hashes=8).alias("sig")
    ).collect()[0]
    assert len(set(row["sig"])) > 1


def test_minhash_poly_pairs(docs):
    """Oracle-checkable poly-hash minhash: candidates via banded equi-join
    (no cross join in the plan), exact Jaccard verify, deterministic."""
    from estuary_spark.functions.dedup import minhash_poly_pairs

    out = minhash_poly_pairs(docs, threshold=0.2, num_hashes=16, seed=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    pairs = {(r["id_a"], r["id_b"]): r["jac"] for r in out.collect()}
    assert pairs[(0, 1)] == 1.0            # exact dup
    assert (0, 2) in pairs                 # near dup caught by some band
    assert not any(4 in p for p in pairs)  # unrelated doc excluded
    # determinism: second run bit-identical
    assert {(r["id_a"], r["id_b"]): r["jac"] for r in
            minhash_poly_pairs(docs, threshold=0.2, num_hashes=16, seed=7).collect()} == pairs


def _exact_allpairs_jaccard(docs, threshold, ngram_n=3):
    """Reference: brute-force all-pairs word-ngram Jaccard (test scale
    only — the O(n²) shape the banded operators exist to avoid)."""
    from estuary_spark.functions.dedup import jaccard, word_ngrams

    g = docs.select(F.col("doc_id").alias("_id"), word_ngrams(F.col("text"), ngram_n).alias("_g"))
    a, b = g.alias("a"), g.alias("b")
    out = (
        a.crossJoin(b)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(jaccard(F.col("a._g"), F.col("b._g")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )
    return {(r["id_a"], r["id_b"]): r["jac"] for r in out.collect()}


def test_minhash_poly_vs_exact_allpairs(docs):
    """ADVICE r2: the gate oracle reproduces the SAME candidate logic as
    the implementation, so a shared candidate-recall bug would pass the
    gate undetected — this cross-checks against an independently-computed
    exact all-pairs result: precision must be 1.0 (candidates are
    exact-verified) and recall high (1-(1-s)^16 at s=0.2 is ~0.97/pair)."""
    from estuary_spark.functions.dedup import minhash_poly_pairs

    got = {(r["id_a"], r["id_b"]): r["jac"] for r in
           minhash_poly_pairs(docs, threshold=0.2, num_hashes=16, seed=7).collect()}
    exact = _exact_allpairs_jaccard(docs, threshold=0.2)
    assert set(got) <= set(exact)                      # precision 1.0
    assert all(got[p] == exact[p] for p in got)        # verified jaccards identical
    assert len(got) / len(exact) >= 0.9                # candidate recall


def test_minhash_banded_poly_vs_exact(docs):
    """Banded (4x4 S-curve) poly minhash: exact-verified pairs are a
    subset of brute-force all-pairs with identical jaccard values; the
    exact dup and near dup are caught; no cross join in the plan."""
    from estuary_spark.functions.dedup import minhash_banded_poly_pairs

    out = minhash_banded_poly_pairs(docs, threshold=0.5, num_hashes=16, bands=4, seed=11)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    got = {(r["id_a"], r["id_b"]): r["jac"] for r in out.collect()}
    exact = _exact_allpairs_jaccard(docs, threshold=0.5)
    assert set(got) <= set(exact)
    assert all(got[p] == exact[p] for p in got)
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 2) in got                   # near dup above the S-curve knee
    assert not any(4 in p for p in got)


def test_simhash_poly_candidates(docs):
    """60-bit poly simhash: deterministic, identical texts at hamming 0,
    near dups closer than unrelated docs, banded equi-join only."""
    from estuary_spark.functions.dedup import simhash_poly_candidates

    out = simhash_poly_candidates(docs, band_bits=15, max_hamming=20, seed=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert rows[(0, 1)] == 0               # identical text
    assert (0, 2) in rows and rows[(0, 2)] <= 12   # near dup within radius
    again = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_poly_candidates(docs, band_bits=15, max_hamming=20, seed=5).collect()}
    assert again == rows


def test_embedding_near_dup_lsh_blocking(spark):
    """Parameterized multi-table hyperplane blocking: near-identical
    vectors pair up; requires dim; effective block count is
    n_tables * 2^n_planes."""
    import numpy as np

    from estuary_spark.functions.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(11)
    base = rng.randn(20, 16)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    rows.append((100, [float(x) for x in base[0] + 0.001 * rng.randn(16)]))  # near-dup of 0
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    out = embedding_near_dup_pairs(
        df, threshold=0.99, n_planes=4, n_tables=4, dim=16
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 100)}

    with pytest.raises(ValueError):
        embedding_near_dup_pairs(df, threshold=0.9)  # dim is required


def test_simhash_hamming(docs):
    from estuary_spark.functions.dedup import hamming64, simhash64

    sh = docs.select("doc_id", simhash64(F.col("text")).alias("sh"))
    vals = {r["doc_id"]: r["sh"] for r in sh.collect()}
    ham = lambda a, b: bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
    assert ham(0, 1) == 0                 # identical text
    assert ham(0, 2) < ham(0, 4)          # near dup closer than unrelated


def test_jaccard_pairs(docs):
    from estuary_spark.functions.dedup import jaccard, word_ngrams

    g = docs.select("doc_id", word_ngrams(F.col("text"), 3).alias("g"))
    a = g.filter(F.col("doc_id") == 0).select(F.col("g").alias("ga"))
    b = g.filter(F.col("doc_id") == 1).select(F.col("g").alias("gb"))
    j = a.crossJoin(b).select(jaccard(F.col("ga"), F.col("gb")).alias("j")).collect()[0]["j"]
    assert j == 1.0


def test_cosine_topk_matches_numpy(spark):
    from estuary_spark.functions.similarity import cosine_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 16).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 2)
    got = cosine_topk(corpus, queries, k=3).collect()

    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norms @ norms.T
    for qid in (0, 1):
        expect = [i for i in np.argsort(-sims[qid]) if i >= 2][:3]
        mine = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == qid]
        assert mine == expect


def test_lsh_ann_recall(spark):
    """ANN top-k should recover most of the exact top-k (recall >= 0.6)."""
    from estuary_spark.functions.similarity import cosine_topk, lsh_ann_topk

    rng = np.random.RandomState(11)
    vecs = rng.randn(200, 16).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = cosine_topk(corpus, queries, k=5).collect()
    approx = lsh_ann_topk(corpus, queries, k=5, n_planes=6, dim=16).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(ex & ap) / len(ex) >= 0.6


def test_ivf_clustered_recall(spark):
    """IVF on genuinely CLUSTERED data probes a small fraction of cells
    with high recall (the r1-verdict note: random vectors needed
    nprobe≈n_clusters, which is near-exhaustive; the production case is a
    clustered corpus where nprobe << n_clusters suffices)."""
    from estuary_spark.functions.similarity import cosine_topk, ivf_topk

    rng = np.random.RandomState(13)
    centers = rng.randn(8, 16) * 4.0           # well-separated cluster centers
    vecs = np.concatenate([c + 0.3 * rng.randn(40, 16) for c in centers])  # 320 vectors
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )  # one query per cluster
    corpus = emb.filter(F.col("vec_id") % 40 != 0)

    exact = cosine_topk(corpus, queries, k=5).collect()
    approx = ivf_topk(corpus, queries, k=5, n_clusters=8, nprobe=2, sample_size=320).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    # probing 2/8 cells on clustered data keeps recall high
    assert len(ex & ap) / len(ex) >= 0.9


def test_ivf_fit_sample_unbiased_on_cluster_sorted_corpus(spark):
    """r2 VERDICT finding #1: the centroid-fit sample used limit(), which
    takes the first partition's rows — on a corpus written cluster-sorted
    across files (the realistic 100 TB layout: time/space-correlated
    vectors per file) the sample is ONE cluster and recall collapses. The
    fix draws the bounded sample in xxhash64(id) order; this corpus is
    deliberately cluster-sorted + range-partitioned so the old code fails."""
    from estuary_spark.functions.similarity import cosine_topk, ivf_topk

    rng = np.random.RandomState(13)
    centers = rng.randn(8, 16) * 4.0
    vecs = np.concatenate([c + 0.3 * rng.randn(40, 16) for c in centers])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartitionByRange(
        8, "vec_id"  # partition boundaries align with cluster boundaries
    )
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 40 != 0)

    exact = cosine_topk(corpus, queries, k=5).collect()
    # sample_size 80 << corpus: limit() would see only the lowest-id
    # cluster(s); the hash-ordered draw spans all 8
    approx = ivf_topk(corpus, queries, k=5, n_clusters=8, nprobe=2, sample_size=80).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(ex & ap) / len(ex) >= 0.9


def test_text_quality_and_lang(spark):
    from estuary_spark.functions import text as TX

    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is in that house for it with love"),
            (1, "el perro que corre por la casa con los gatos"),
            (2, "!!!???!!!"),
        ],
        ["doc_id", "text"],
    )
    out = df.select(
        "doc_id",
        TX.lang_id(F.col("text")).alias("lang"),
        TX.token_count_ws(F.col("text")).alias("tws"),
        F.round(TX.punct_ratio(F.col("text")), 3).alias("pr"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["lang"] == "en"
    assert by_id[1]["lang"] == "es"
    assert by_id[2]["lang"] == "und"
    assert by_id[0]["tws"] == 13
    assert by_id[2]["pr"] == 1.0


def test_multimodal_plumbing(spark):
    from estuary_spark.functions.multimodal import (
        decode_image,
        extract_features,
        frame_sample_plan,
        synthesize_media,
    )

    media = synthesize_media(spark, n=30)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # determinism
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)

    plan = frame_sample_plan(media, every_ms=10_000)
    assert plan.count() > 0
    with pytest.raises(NotImplementedError):
        decode_image(b"png-bytes")


def test_transform_chain(spark):
    from estuary_spark.functions.transcripts import transform_chain

    df = spark.createDataFrame(
        [("c1", 0, "  hello   world  contact me at bob@example.com ok ")],
        ["conv_id", "turn_idx", "text"],
    )
    out = transform_chain(df, ["normalize_whitespace", "redact_pii"]).collect()[0]
    assert out["text"] == "hello world contact me at <email> ok"
