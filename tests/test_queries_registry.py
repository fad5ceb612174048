"""Registry contract: every query (driver-facing 50 AND the packed
tail via full_registry) runs at sf0.001, every oracle key refers to an
existing query, and the driver-facing list stays within the gate's
50-row cap. (Exact oracle equivalence is checked by
tools/oracle_check.py at sf0.01 — heavier than unit tests.)"""

import pytest

import __spark_entry__ as entry
from malstrom_spark.queries import full_registry


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


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
