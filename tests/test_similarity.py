"""Similarity search: brute-force top-k golden on constructed vectors;
LSH variant recall against brute force on clustered data."""

import math

import pytest
from pyspark.sql import functions as F

from malstrom_spark.functions import similarity


def _vec(angle, dim=8):
    v = [0.0] * dim
    v[0] = math.cos(angle)
    v[1] = math.sin(angle)
    return v


@pytest.fixture(scope="module")
def corpus(spark):
    # vectors at increasing angles from the x-axis
    rows = [(i, _vec(i * 0.1)) for i in range(20)]
    return spark.createDataFrame(rows, "c_id long, c_vec array<float>")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame([(0, _vec(0.0))], "q_id long, q_vec array<float>")


def test_cosine_topk_golden(queries, corpus):
    out = similarity.cosine_topk(queries, corpus, k=3).collect()
    ranked = [r.c_id for r in sorted(out, key=lambda r: r.rank)]
    # nearest by angle: 0 (identical), then 1, then 2
    assert ranked == [0, 1, 2]
    sims = {r.c_id: r.sim for r in out}
    assert abs(sims[0] - 1.0) < 1e-9
    assert abs(sims[1] - math.cos(0.1)) < 1e-6


def test_lsh_topk_recall(queries, corpus):
    exact = {r.c_id for r in similarity.cosine_topk(queries, corpus, k=5).collect()}
    approx = {
        r.c_id
        for r in similarity.lsh_topk(queries, corpus, dim=8, k=5, n_planes=4).collect()
    }
    # low plane count -> big buckets -> should recover most of exact top-5
    assert len(exact & approx) >= 3


def test_embedding_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(rows, "vid long, vec array<float>")
    pairs = similarity.embedding_near_dups(df, "vid", "vec", dim=4, threshold=0.99, n_planes=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def test_ivf_exact_when_probing_all_lists(spark, sf_dir):
    """n_probe = n_lists must reproduce brute-force top-k exactly."""
    from malstrom_spark.functions import similarity
    from malstrom_spark.queries import table

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    exact = {
        (r.q_id, r.rank): r.c_id
        for r in similarity.cosine_topk(queries, corpus, k=3).collect()
    }
    ivf_all = {
        (r.q_id, r.rank): r.c_id
        for r in similarity.ivf_topk(
            queries, corpus, k=3, n_lists=4, n_probe=4, n_iters=1
        ).collect()
    }
    assert ivf_all == exact


def test_ivf_partial_probe_recall(spark, sf_dir):
    """Probing half the cells should still recover most true
    neighbors (sanity bound, deterministic centroids)."""
    from malstrom_spark.functions import similarity
    from malstrom_spark.queries import table

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    exact = {
        (r.q_id, r.c_id)
        for r in similarity.cosine_topk(queries, corpus, k=3).collect()
    }
    approx = {
        (r.q_id, r.c_id)
        for r in similarity.ivf_topk(
            queries, corpus, k=3, n_lists=8, n_probe=4, n_iters=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below sanity bound"


def test_cosine_topk_pandas_matches_hof(spark, sf_dir):
    """The Arrow/numpy scorer must produce the same (q_id, c_id, rank)
    assignment as the HOF fold — float sums differ only in summation
    order, far below ranking granularity on real data."""
    from malstrom_spark.functions import similarity
    from malstrom_spark.queries import table

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    hof = similarity.cosine_topk(queries, corpus, k=5)
    arrow = similarity.cosine_topk_pandas(queries, corpus, k=5)
    a = {(r.q_id, r.c_id): r.rank for r in hof.collect()}
    b = {(r.q_id, r.c_id): r.rank for r in arrow.collect()}
    assert a == b
    # sims numerically equal to fp-reassociation tolerance
    sa = {(r.q_id, r.c_id): r.sim for r in hof.collect()}
    sb = {(r.q_id, r.c_id): r.sim for r in arrow.collect()}
    assert all(abs(sa[k_] - sb[k_]) < 1e-9 for k_ in sa)
