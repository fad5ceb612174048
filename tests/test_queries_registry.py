"""Registry contract: every queries() entry runs at sf0.001 and every
oracle key refers to an existing query. (Exact oracle equivalence is
checked by tools/oracle_check.py at sf0.01 — heavier than unit tests.)"""

import pytest

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_query_runs_nonneg_rows(spark, sf_dir, name):
    fn = entry.queries()[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
