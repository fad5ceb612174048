"""Registry contract: every query (driver-facing 50 AND the packed
tail via full_registry) runs at sf0.001, every oracle key refers to an
existing query, and the driver-facing list stays within the gate's
50-row cap. (Exact oracle equivalence is checked by
tools/oracle_check.py at sf0.01 — heavier than unit tests.)"""

import pytest

import __spark_entry__ as entry
from malstrom_spark.queries import full_registry, load_all


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs


def test_driver_registry_within_gate_cap():
    assert len(entry.queries()) <= 50


@pytest.mark.parametrize("name", sorted(full_registry().keys()))
def test_query_runs_nonneg_rows(spark, sf_dir, name):
    fn = full_registry()[name].fn
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    if name in load_all():
        # Driver hashability contract (round-9 postmortem: the
        # orders_snapshot_diff gate row errored because the driver's
        # pandas canonicalizer cannot factorize list cells). Every
        # GATE row's top-level schema must be scalar-only; nested
        # results belong in full_registry-only rows or must be
        # flattened (array_join/to_json) in the gate projection.
        from pyspark.sql.types import ArrayType, MapType, StructType

        for f in df.schema.fields:
            assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
                f"gate row {name}: column {f.name} has nested type "
                f"{f.dataType.simpleString()} — the driver's canonicalizer "
                "cannot hash it; flatten it in the gate projection"
            )


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
