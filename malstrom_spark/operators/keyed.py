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
