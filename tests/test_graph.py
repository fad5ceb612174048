"""Integer-exact PageRank (functions/graph.py)."""

import duckdb
import pytest

from malstrom_spark.functions import graph


EDGES = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 5)]


def _values_cte(edges):
    vals = ",".join(f"({a},{b})" for a, b in edges)
    return f"SELECT * FROM (VALUES {vals}) t(src, dst)"


def test_pagerank_matches_python_reference(spark):
    """Replay the integer fixed-point in pure Python — every rank
    must be identical (the algorithm is exact, not approximate)."""
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(e, n_iter=5).collect()}

    nodes = sorted({n for ab in EDGES for n in ab})
    out = {}
    for a, _ in EDGES:
        out[a] = out.get(a, 0) + 1
    n = len(nodes)
    r = {v: graph.SCALE // n for v in nodes}
    for _ in range(5):
        inc = {v: 0 for v in nodes}
        for a, b in EDGES:
            inc[b] += (r[a] * 17) // (20 * out[a])
        r = {v: (3 * graph.SCALE) // (20 * n) + inc[v] for v in nodes}
    assert got == r


def test_pagerank_matches_duckdb_twin(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(e, n_iter=3).collect()}
    duck = dict(duckdb.sql(
        graph.pagerank_sql(_values_cte(EDGES), n_iter=3)).fetchall())
    assert got == {int(k): int(v) for k, v in duck.items()}


def test_pagerank_ordering_sensible(spark):
    # hub node 1 (two in-edges incl. from the cycle) outranks leaf 4
    e = spark.createDataFrame(EDGES, "src long, dst long")
    r = {row["node"]: row["rank"]
         for row in graph.pagerank(e, n_iter=5).collect()}
    assert r[1] > r[4]
    assert r[3] > r[4]  # 3 has two in-edges
    assert r[4] == (3 * graph.SCALE) // (20 * 5)  # no in-edges: teleport only


def test_pagerank_parallel_edges_weight_double(spark):
    # a -> b twice vs a -> c once: b gets 2/3 of a's send mass
    e = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3)], "src long, dst long")
    r = {row["node"]: row["rank"]
         for row in graph.pagerank(e, n_iter=1).collect()}
    tele = (3 * graph.SCALE) // (20 * 3)
    r0 = graph.SCALE // 3
    assert r[2] - tele == 2 * ((r0 * 17) // (20 * 3))
    assert r[3] - tele == (r0 * 17) // (20 * 3)


def test_pagerank_validation(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        graph.pagerank(e, n_iter=0)
