"""Bitext / parallel-pair mining over embedding spaces: margin-based
scoring (Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining
with Multilingual Sentence Embeddings"; the CCMatrix / NLLB data
pipeline's alignment stage). Given two embedded sides A and B (two
languages, two crawl snapshots, two modalities), score candidate
pairs by the RATIO margin

    margin(x, y) = cos(x, y) /
        ( avg_{z in NNk(x,B)} cos(x, z) / 2 + avg_{z in NNk(y,A)} cos(y, z) / 2 )

and keep pairs that are MUTUAL best matches above a threshold — the
margin normalizes away hubness (a vector close to everything scores
no pair highly), which raw cosine thresholds cannot do.

The reference engine has no alignment operator; the algorithm is the
published form. Spark-first decomposition:

- kNN production is PLUGGABLE: the core `mine_bitext_from_knn` takes
  the two directed top-k edge sets as DataFrames and is pure
  window/join relational algebra (one shuffle per side keyed by id).
  At 100 TB the edges come from the ANN family
  (`similarity.ivf_topk_partitioned` — partition-pruned IVF serving);
  for verification and small sides `mine_bitext_exact` produces them
  with the broadcast brute-force `cosine_topk` kernel.
- Engine portability (hash-exact oracle): cosines are deterministic
  sequential-fold doubles (similarity.dot), quantized to integer
  micro-sims (FLOOR(sim * 1e6), the BM25/PMI discipline) BEFORE any
  aggregation. The margin denominator is then an exact BIGINT sum of
  k micro-sims per side and the margin itself ONE division of exact
  integers — bit-identical in any engine, no order-sensitive float
  sums anywhere.
- Neighbor-set selection orders by the RAW double sim (bit-identical
  across engines) with id tie-break, so the top-k sets — and hence
  the sums — are reproducible, not merely close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine_topk

#: micro-sim quantization: FLOOR(cos * SIM_SCALE) as BIGINT
SIM_SCALE = 1_000_000


def _micro(sim_col) -> F.Column:
    return F.floor(sim_col * F.lit(float(SIM_SCALE))).cast("long")


def mine_bitext_from_knn(
    fwd: DataFrame,
    bwd: DataFrame,
    k: int,
    threshold: float = 1.0,
    mutual: bool = True,
) -> DataFrame:
    """Margin-score and align from directed kNN edge sets.

    fwd: (x_id, y_id, sim) — for each x in A its top-k neighbors in B,
    bwd: (y_id, x_id, sim) — for each y in B its top-k neighbors in A.
    Both must be true top-k by (sim DESC, neighbor id ASC); sims must
    be the same deterministic cosine on both sides (cos is symmetric,
    and the fold evaluates positionally, so fwd and bwd agree bitwise
    on a shared pair).

    Returns (x_id, y_id, sim_q, margin): mutual-best pairs with
    margin >= threshold, margin a double computed as one division of
    exact integers (2k * sim_q / (sum_k(x) + sum_k(y))).

    Shape: two map-side-combinable integer sums keyed by id, one
    distinct over <= 2k|A| candidate edges, two id-keyed broadcast-or
    -shuffle joins, two window top-1 passes. Nothing is ever
    all-pairs; feed ANN edges and it runs at corpus scale.
    """
    f = fwd.select("x_id", "y_id", _micro(F.col("sim")).alias("sim_q"))
    b = bwd.select("x_id", "y_id", _micro(F.col("sim")).alias("sim_q"))

    # Exact integer neighborhood mass per node (k terms each).
    sum_x = f.groupBy("x_id").agg(F.sum("sim_q").alias("sum_x"))
    sum_y = b.groupBy("y_id").agg(F.sum("sim_q").alias("sum_y"))

    cands = f.unionByName(b).distinct()
    scored = (
        cands.join(sum_x, "x_id")
        .join(sum_y, "y_id")
        .where((F.col("sum_x") + F.col("sum_y")) > 0)
        .withColumn(
            "margin",
            (F.col("sim_q") * F.lit(2 * k)).cast("double")
            / (F.col("sum_x") + F.col("sum_y")).cast("double"),
        )
    )

    wx = Window.partitionBy("x_id").orderBy(F.desc("margin"), F.asc("y_id"))
    wy = Window.partitionBy("y_id").orderBy(F.desc("margin"), F.asc("x_id"))
    best = (
        scored.withColumn("rx", F.row_number().over(wx))
        .withColumn("ry", F.row_number().over(wy))
    )
    if mutual:
        best = best.where((F.col("rx") == 1) & (F.col("ry") == 1))
    else:
        best = best.where(F.col("rx") == 1)
    return best.where(F.col("margin") >= F.lit(float(threshold))).select(
        "x_id", "y_id", "sim_q", "margin"
    )


def mine_bitext_exact(
    side_a: DataFrame,
    side_b: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    mutual: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-kNN bitext mining: brute-force `cosine_topk` in both
    directions (each side broadcast once as the query set — the
    validation kernel; swap in ANN edges via `mine_bitext_from_knn`
    when both sides are corpus-sized)."""
    a = side_a.select(F.col(id_col).alias("x_id"), F.col(vec_col).alias("x_vec"))
    b = side_b.select(F.col(id_col).alias("y_id"), F.col(vec_col).alias("y_vec"))
    fwd = cosine_topk(
        a.withColumnRenamed("x_id", "q_id").withColumnRenamed("x_vec", "q_vec"),
        b.withColumnRenamed("y_id", "c_id").withColumnRenamed("y_vec", "c_vec"),
        k=k,
    ).select(F.col("q_id").alias("x_id"), F.col("c_id").alias("y_id"), "sim")
    bwd = cosine_topk(
        b.withColumnRenamed("y_id", "q_id").withColumnRenamed("y_vec", "q_vec"),
        a.withColumnRenamed("x_id", "c_id").withColumnRenamed("x_vec", "c_vec"),
        k=k,
    ).select(F.col("c_id").alias("x_id"), F.col("q_id").alias("y_id"), "sim")
    return mine_bitext_from_knn(fwd, bwd, k=k, threshold=threshold, mutual=mutual)


def mine_bitext_ivf(
    side_a: DataFrame,
    side_b: DataFrame,
    centroids: DataFrame,
    k: int = 4,
    n_probe: int = 3,
    threshold: float = 1.0,
    mutual: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bitext mining with IVF-approximate kNN — the corpus-scale
    shape: both sides share ONE coarse quantizer (they live in the
    same embedding space), each side assigns to a single cell as
    corpus and probes `n_probe` cells as queries, and every kNN join
    is a CELL-keyed shuffle equi-join (`broadcast_queries=False` —
    neither side is broadcast, unlike the exact kernel which must
    broadcast a whole side). Cell assignment is exact integer L2 over
    quantized vectors, so the candidate sets — and hence the mined
    pairs — are engine-reproducible, not just approximately right.
    With n_probe = number of centroids it degrades gracefully to the
    exact kernel's output (pytest-pinned)."""
    from .similarity import ivf_topk_portable

    a = side_a.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = side_b.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    fwd = ivf_topk_portable(
        a.select(F.col("a_id").alias("q_id"), F.col("a_vec").alias("q_vec")),
        b.select(F.col("b_id").alias("c_id"), F.col("b_vec").alias("c_vec")),
        centroids, k=k, n_probe=n_probe, broadcast_queries=False,
    ).select(F.col("q_id").alias("x_id"), F.col("c_id").alias("y_id"), "sim")
    bwd = ivf_topk_portable(
        b.select(F.col("b_id").alias("q_id"), F.col("b_vec").alias("q_vec")),
        a.select(F.col("a_id").alias("c_id"), F.col("a_vec").alias("c_vec")),
        centroids, k=k, n_probe=n_probe, broadcast_queries=False,
    ).select(F.col("c_id").alias("x_id"), F.col("q_id").alias("y_id"), "sim")
    return mine_bitext_from_knn(fwd, bwd, k=k, threshold=threshold, mutual=mutual)
