"""Product quantization: encode/ADC engine identity, codebook fit
determinism, IVF-PQ composition, recall floor, and plan shape."""

import pytest
from pyspark.sql import functions as F

from malstrom_spark.functions import pq
from malstrom_spark.functions.similarity import cosine_topk
from malstrom_spark.queries import table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def learned_books(emb):
    return pq.pq_fit_codebooks(emb, "embedding", 64, m=8, k=16, n_iters=3)


def test_head_codebooks_self_encode(spark, emb):
    """Head vectors ARE codebook entries, so each must encode to its
    own index in every subspace and ADC-score itself at distance 0."""
    cbs = pq.pq_head_codebooks(emb, "embedding", "vec_id", 64, m=8, k=16)
    assert len(cbs) == 8 and len(cbs[0]) == 16 and len(cbs[0][0]) == 8
    enc = pq.pq_encode(emb, "embedding", cbs, 64, integer=True)
    head = {r.vec_id: list(r.codes) for r in enc.where(F.col("vec_id") < 16).collect()}
    assert head == {i: [i] * 8 for i in range(16)}
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    codes = enc.select(F.col("vec_id").alias("c_id"), "codes")
    top = pq.pq_adc_topk(q, codes, cbs, 64, k=1, integer=True).collect()
    assert {(r.q_id, r.c_id, r.d2) for r in top} == {(i, i, 0) for i in range(4)}


def test_fit_deterministic_and_geometry(emb, learned_books):
    again = pq.pq_fit_codebooks(emb, "embedding", 64, m=8, k=16, n_iters=3)
    assert learned_books == again
    assert len(learned_books) == 8
    assert all(len(b) == 16 and all(len(c) == 8 for c in b) for b in learned_books)
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_fit_codebooks(emb, "embedding", 64, m=7)


def test_encode_literal_arrow_identical(emb, learned_books):
    lit = pq.pq_encode(emb, "embedding", learned_books, 64, use_arrow=False)
    arw = pq.pq_encode(emb, "embedding", learned_books, 64, use_arrow=True)
    lmap = {r.vec_id: list(r.codes) for r in lit.collect()}
    amap = {r.vec_id: list(r.codes) for r in arw.collect()}
    assert lmap == amap


def test_encode_null_vector_encodes_null(spark, learned_books):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, None)], "id long, embedding array<float>"
    )
    for arrow in (False, True):
        got = {
            r.id: r.codes
            for r in pq.pq_encode(
                df, "embedding", learned_books, 64, use_arrow=arrow
            ).collect()
        }
        assert got[2] is None and got[1] is not None


def test_adc_literal_arrow_identical(emb, learned_books):
    enc = pq.pq_encode(emb, "embedding", learned_books, 64, use_arrow=False)
    q = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    codes = enc.select(F.col("vec_id").alias("c_id"), "codes")
    lit = pq.pq_adc_topk(q, codes, learned_books, 64, k=5, use_arrow=False).collect()
    arw = pq.pq_adc_topk(q, codes, learned_books, 64, k=5, use_arrow=True).collect()
    key = lambda r: (r.q_id, r.rank)  # noqa: E731
    lit, arw = sorted(lit, key=key), sorted(arw, key=key)
    assert [(r.q_id, r.c_id, r.rank) for r in lit] == [
        (r.q_id, r.c_id, r.rank) for r in arw
    ]
    assert all(abs(a.d2 - b.d2) < 1e-9 for a, b in zip(lit, arw))


def test_adc_recall_vs_exact(emb, learned_books):
    """PQ is lossy; assert recall@10 of ADC against exact cosine
    top-10 clears a floor on the near-uniform synthetic embeddings
    (weak structure -> modest bar, same rationale as the LSH tests)."""
    enc = pq.pq_encode(emb, "embedding", learned_books, 64, use_arrow=False)
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    codes = enc.select(F.col("vec_id").alias("c_id"), "codes")
    approx = pq.pq_adc_topk(q, codes, learned_books, 64, k=10)
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    exact = cosine_topk(q, corpus, k=10)
    a = {(r.q_id, r.c_id) for r in approx.collect()}
    e = {(r.q_id, r.c_id) for r in exact.collect()}
    # m=8 x 16 codes = 32-bit codes on structureless vectors: the
    # honest bar is "far above chance" (random recall@10 = 10/500 =
    # 0.02), not high absolute recall
    assert len(a & e) / len(e) >= 0.2


def test_ivf_pq_topk_smoke_and_refine(emb, learned_books):
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    adc = pq.ivf_pq_topk(
        q, corpus, 64, k=3, n_lists=4, n_probe=4, codebooks=learned_books
    )
    rows = adc.collect()
    assert {r.q_id for r in rows} == {0, 1, 2, 3}
    assert all(r.rank <= 3 for r in rows)
    # self-hit at rank 1 with full probing (d2 to own code is minimal
    # but may tie; accept membership in top-3)
    by_q = {qid: {r.c_id for r in rows if r.q_id == qid} for qid in range(4)}
    assert all(qid in by_q[qid] for qid in range(4))
    refined = pq.ivf_pq_topk(
        q, corpus, 64, k=3, n_lists=4, n_probe=4,
        codebooks=learned_books, refine=20,
    ).collect()
    # exact re-rank puts the exact self-match (sim 1.0) at rank 1
    firsts = {r.q_id: (r.c_id, r.sim) for r in refined if r.rank == 1}
    assert all(firsts[qid][0] == qid and abs(firsts[qid][1] - 1.0) < 1e-9
               for qid in range(4))


def test_encode_is_shuffle_free_projection(emb, learned_books):
    """Encode must fuse into the scan: no Exchange in the plan for
    either engine (the 100 TB contract — codes append map-side)."""
    for arrow in (False, True):
        plan = (
            pq.pq_encode(emb, "embedding", learned_books, 64, use_arrow=arrow)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan


def test_adc_arrow_shuffles_only_topk(emb, learned_books):
    """Arrow ADC: corpus scoring is map-side (local top-k), the only
    exchange is the k*|Q|-row global top-k window."""
    enc = pq.pq_encode(emb, "embedding", learned_books, 64, use_arrow=False)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    codes = enc.select(F.col("vec_id").alias("c_id"), "codes")
    plan = (
        pq.pq_adc_topk(q, codes, learned_books, 64, k=5, use_arrow=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_geometry_validation(spark, emb):
    bad = [[[0.0] * 8] * 16] * 7  # m=7 does not tile 64... (7*8=56)
    with pytest.raises(ValueError, match="does not tile"):
        pq.pq_encode(emb, "embedding", bad, 64)


def test_integer_arrow_combination_rejected(spark, emb):
    """integer=True + use_arrow=True would silently skip quantization
    in the arrow engine — must refuse, not mis-score."""
    cbs = pq.pq_head_codebooks(emb, "embedding", "vec_id", 64, m=8, k=16)
    with pytest.raises(ValueError, match="literal engine"):
        pq.pq_encode(emb, "embedding", cbs, 64, integer=True, use_arrow=True)
    q = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    codes = pq.pq_encode(emb, "embedding", cbs, 64, integer=True).select(
        F.col("vec_id").alias("c_id"), "codes"
    )
    with pytest.raises(ValueError, match="literal engine"):
        pq.pq_adc_topk(q, codes, cbs, 64, integer=True, use_arrow=True)


def test_adc_arrow_null_and_empty_queries(spark, emb, learned_books):
    """Engine parity on degenerate query sets: NULL query vectors drop
    (as the literal engine's null-d2 filter does) and an all-null /
    empty query set returns an empty result, not a crash."""
    enc = pq.pq_encode(emb, "embedding", learned_books, 64, use_arrow=False)
    codes = enc.select(F.col("vec_id").alias("c_id"), "codes")
    one_null = spark.createDataFrame(
        [(0, None)], "q_id long, q_vec array<float>"
    ).unionByName(
        emb.where(F.col("vec_id") == 1).selectExpr(
            "vec_id as q_id", "cast(embedding as array<float>) as q_vec"
        )
    )
    for arrow in (False, True):
        got = pq.pq_adc_topk(one_null, codes, learned_books, 64, k=3,
                             use_arrow=arrow).collect()
        assert {r.q_id for r in got} == {1}, (arrow, got)
    all_null = spark.createDataFrame([(0, None)], "q_id long, q_vec array<float>")
    assert pq.pq_adc_topk(all_null, codes, learned_books, 64, use_arrow=True).count() == 0
