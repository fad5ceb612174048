"""Keying / repartitioning operators (reference SURVEY §2.2).

- key_local      -> reference keyed/key_local.rs:16-63 (assign key, no shuffle)
- key_distribute -> reference keyed/key_distribute.rs:21-45 (assign key + shuffle)

The reference routes records to workers with rendezvous hashing
(keyed/partitioners.rs:13-30) so that rescaling moves minimal state.
On Spark, key->partition ownership is the engine's job: hash shuffle
partitioning for batch, state-store-per-shuffle-partition for
streaming. Rendezvous hashing is deliberately NOT ported — Spark's
checkpoint rebinds state to partitions on restart, which is the
rescale story (SURVEY §2.9).

Scale notes: `key_distribute` is the only operator that forces a
shuffle. Downstream groupBy/join on the same key reuses the exchange
(Catalyst's EnsureRequirements sees the existing hash partitioning),
so key once, aggregate many times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_local(df: DataFrame, key: Column | str, key_col: str = "key") -> DataFrame:
    """Assign a key column WITHOUT shuffling (key_local.rs:16-63).

    State built on a locally-keyed stream is not movable in the
    reference; in Spark the distinction only matters if you later rely
    on co-location — use `key_distribute` before stateful ops.
    """
    expr = F.col(key) if isinstance(key, str) else key
    # A plain reference to key_col itself (key_local("u", "u") or
    # key_local(F.col("u"), "u")) is a no-op overwrite — allowed.
    is_self_ref = str(expr) == str(F.col(key_col))
    if key_col in df.columns and not is_self_ref:
        # withColumn would silently REPLACE an existing column's values
        # (e.g. key_local("tn", "u") clobbers column u with tn's data —
        # the composite-key form is Stream.key_by("tn", "u")).
        raise ValueError(
            f"key_local would overwrite existing column {key_col!r}; "
            f"pass a fresh key_col name, or use key_by(...) to declare "
            f"existing columns as a (composite) key"
        )
    return df.withColumn(key_col, expr)


def key_distribute(
    df: DataFrame,
    key: Column | str,
    key_col: str = "key",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign a key and hash-shuffle records to their owning partition
    (key_distribute.rs:21-45 = key_local + distribute).

    Equivalent of the reference's Distributor (keyed/distributed.rs) is
    Spark's shuffle exchange — nothing to port. `num_partitions=None`
    lets AQE pick; pass an explicit count only to co-locate with an
    existing layout.
    """
    keyed = key_local(df, key, key_col)
    if num_partitions:
        return keyed.repartition(num_partitions, F.col(key_col))
    return keyed.repartition(F.col(key_col))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for SKEWED keys: stage 1 aggregates on
    (key, salt) so a hot key fans out over `n_salts` reducers; stage 2
    merges the partials on the key alone. The second shuffle moves at
    most n_salts rows per key regardless of input skew.

    `aggs` maps output name -> (kind, column) where kind is one of
    sum/count/min/max (algebraic aggregates — the only ones a salted
    split can merge losslessly; avg = sum/count composed by callers).

    AQE's skew-join splitting handles skewed JOINS automatically; this
    helper is for skewed AGGREGATIONS, which AQE does not re-split
    (a single hot groupBy key always lands in one reducer otherwise).
    The salt is derived from a per-row nondeterministic id — it only
    controls placement, never the merged result.
    """
    _merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    stage1_aggs = []
    for name, (kind, col) in aggs.items():
        if kind not in _merge:
            raise ValueError(f"salted_agg supports sum/count/min/max, got {kind}")
        agg_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[kind]
        stage1_aggs.append(agg_fn(col).alias(f"__p_{name}"))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*stage1_aggs)
    )
    stage2_aggs = [
        _merge[kind](F.col(f"__p_{name}")).alias(name) for name, (kind, _) in aggs.items()
    ]
    return stage1.groupBy(*key_cols).agg(*stage2_aggs)
