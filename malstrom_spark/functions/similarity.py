"""Similarity search over embedding columns (array<float>).

North-star operator set (absent from the reference, SURVEY §2.8).
Two tiers:

- `cosine_topk`: exact brute force — broadcast the (small) query set
  against the corpus, dot/norm as native array expressions
  (zip_with + aggregate, JVM-side), per-query top-k via window.
  Scale: O(|Q| * |corpus|) but embarrassingly parallel; right answer
  for |Q| small (retrieval eval, dedup probes).
- `lsh_topk`: approximate — random-hyperplane LSH buckets the corpus
  once (signature = sign-bit string over H fixed hyperplanes), probes
  only matching buckets. Scale path for corpus x corpus joins: the
  bucket join replaces the full cross product; recall tunable via
  bands/hyperplanes.

Embedding near-dup (cosine >= threshold pairs) composes `lsh_buckets`
with a verified pair join, mirroring the MinHash pipeline shape in
`functions.dedup`.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double — deterministic
    (fixed FP order), JVM-native, no UDF."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (q_id, c_id, sim, rank). Query side is broadcast — the
    corpus never shuffles; each partition scores its slice and the
    window top-k reduces map-side before the final per-query merge.
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id),
        F.col(c_id),
        cosine(F.col(q_vec), F.col(c_vec)).alias("sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Fixed pseudo-random unit hyperplanes (Box-Muller over an LCG) —
    reproducible across sessions, no runtime RNG state."""
    x = 0x2545F4914F6CDD1D
    planes = []
    for _ in range(n_planes):
        vals = []
        while len(vals) < dim:
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            u1 = ((x >> 11) + 1) / (1 << 53)
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            u2 = (x >> 11) / (1 << 53)
            r = math.sqrt(-2.0 * math.log(u1))
            vals.append(r * math.cos(2 * math.pi * u2))
            if len(vals) < dim:
                vals.append(r * math.sin(2 * math.pi * u2))
        planes.append(vals[:dim])
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature: bigint whose bit i = sign(vec . h_i).
    Evaluated as native expressions over a literal plane matrix."""
    planes = _hyperplanes(dim, n_planes)
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        d = dot(vec, lit_plane)
        bit = F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket
    are scored. Single equi-join on the bucket id — at 100 TB this is
    a hash join on a uniform key instead of a cross product. Recall
    rises as n_planes falls (bigger buckets); multi-probe = union of
    queries with flipped bits (left to callers)."""
    cb = corpus.withColumn("bucket", lsh_bucket(F.col(c_vec), dim, n_planes))
    qb = queries.withColumn("bucket", lsh_bucket(F.col(q_vec), dim, n_planes))
    scored = cb.join(F.broadcast(qb), "bucket").select(
        F.col(q_id), F.col(c_id), cosine(F.col(q_vec), F.col(c_vec)).alias("sim")
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
) -> DataFrame:
    """Corpus x corpus near-duplicate pairs by cosine >= threshold,
    LSH-bucketed so the self-join never materializes all pairs."""
    b = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket")
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("sim"),
    )
    return pairs.filter(F.col("sim") >= threshold)
