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


def test_pagerank_checkpoint_every_identical_and_bounded_storage(spark):
    """checkpoint_every is a materialization boundary, not a semantic
    change: n_iter=15 ranks identical with and without; and the
    previous checkpoint's blocks are freed each time, so at most one
    extra checkpointed RDD holds storage after the run (the dedup-CC
    discipline)."""
    e = spark.createDataFrame(EDGES, "src long, dst long")

    def n_stored():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    plain = {r["node"]: r["rank"]
             for r in graph.pagerank(e, n_iter=15).collect()}
    before = n_stored()
    ck = {r["node"]: r["rank"]
          for r in graph.pagerank(e, n_iter=15, checkpoint_every=3).collect()}
    assert ck == plain
    leaked = n_stored() - before
    assert leaked <= 1, f"{leaked} checkpoint RDDs leaked across rounds"


def test_pagerank_dangling_mass_conserved(spark):
    """With redistribute_dangling=True total rank mass conserves to
    SCALE up to floor dust (integer division loses < 1 micro-unit per
    term); without it the dangling node's mass drains. Node 6 below is
    dangling (sink only)."""
    edges = EDGES + [(3, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    n, n_edges = 6, len(edges)

    tot = sum(r["rank"] for r in
              graph.pagerank(e, n_iter=8, redistribute_dangling=True).collect())
    # floor losses: per round < (teleport + dangling + per-edge) terms
    bound = 8 * (2 * n + n_edges + 2)
    assert graph.SCALE - bound <= tot <= graph.SCALE

    tot_drop = sum(r["rank"] for r in graph.pagerank(e, n_iter=8).collect())
    assert tot_drop < graph.SCALE - graph.SCALE // 100  # mass visibly drained


def test_pagerank_dangling_matches_duckdb_twin(spark):
    """The dangling-redistribution variant stays integer-exact vs the
    extended SQL twin."""
    edges = EDGES + [(3, 6), (2, 7)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(
               e, n_iter=4, redistribute_dangling=True).collect()}
    duck = dict(duckdb.sql(
        graph.pagerank_sql(_values_cte(edges), n_iter=4,
                           redistribute_dangling=True)).fetchall())
    assert got == duck


def test_pagerank_checkpoint_validation(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="checkpoint_every"):
        graph.pagerank(e, checkpoint_every=0)


def test_weighted_pagerank_matches_duckdb_twin(spark):
    """Weighted contributions split by integer edge weight; SQL twin
    identical; weight=1 everywhere equals the unweighted run."""
    edges = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5), (4, 1, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(e, n_iter=4, weight="w").collect()}
    vals = ",".join(f"({a},{b},{w})" for a, b, w in edges)
    duck = dict(duckdb.sql(graph.pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst, w)",
        n_iter=4, weighted=True)).fetchall())
    assert got == duck
    # the heavier edge (1->2 w=3) pulls more mass than (1->3 w=1)
    # would under equal split: node 2 outranks its unweighted self
    unw = {r["node"]: r["rank"]
           for r in graph.pagerank(
               e.select("src", "dst"), n_iter=4).collect()}
    assert got[2] > unw[2]


def test_weight_one_equals_unweighted(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    ones = e.withColumn("w", __import__("pyspark").sql.functions.lit(1))
    a = {r["node"]: r["rank"] for r in graph.pagerank(e, n_iter=5).collect()}
    b = {r["node"]: r["rank"]
         for r in graph.pagerank(ones, n_iter=5, weight="w").collect()}
    assert a == b


def test_triangle_count_known_graphs(spark):
    """K4 (every node in 3 triangles) + pendant node (0); direction
    duplicates and self-loops normalized away; a path has none."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
          (2, 1), (3, 3)]
    e = spark.createDataFrame(k4, "src long, dst long")
    got = {r["node"]: r["triangles"]
           for r in graph.triangle_count(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}

    path = spark.createDataFrame([(i, i + 1) for i in range(6)],
                                 "src long, dst long")
    assert all(r["triangles"] == 0
               for r in graph.triangle_count(path).collect())


def test_triangle_count_matches_duckdb_twin(spark):
    import random

    rng = random.Random(11)
    edges = sorted({(rng.randrange(12), rng.randrange(12))
                    for _ in range(40)})
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"]
           for r in graph.triangle_count(e).collect()}
    vals = ",".join(f"({a},{b})" for a, b in edges)
    duck = dict(duckdb.sql(graph.triangle_count_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)")).fetchall())
    assert got == duck


def test_triangle_degree_order_disagrees_with_id_order(spark):
    """Round-9 review repro: deg(2) > deg(3) stores {2,3} as (3,2);
    an id-ordered wedge filter missed triangle {1,2,3} entirely —
    and the DuckDB twin shared the bug, so the oracle hash-matched on
    wrong answers. Pinned against the hand truth, not the twin."""
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (2, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"]
           for r in graph.triangle_count(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0}


def test_triangle_count_matches_brute_force(spark):
    """Independent reference (itertools over the adjacency set) — a
    shared-bug twin comparison cannot stand in for ground truth."""
    import itertools
    import random

    rng = random.Random(23)
    edges = sorted({(rng.randrange(14), rng.randrange(14))
                    for _ in range(50)})
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"]
           for r in graph.triangle_count(e).collect()}

    und = {frozenset((a, b)) for a, b in edges if a != b}
    nodes = sorted({n for ab in und for n in ab})
    truth = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if {frozenset((x, y)), frozenset((y, z)),
                frozenset((x, z))} <= und:
            truth[x] += 1
            truth[y] += 1
            truth[z] += 1
    assert got == truth


def test_weighted_pagerank_rejects_bad_weights(spark):
    """ADVICE r9: NULL/non-positive weights made Spark's integer div
    yield NULL (contribution silently dropped) while the DuckDB twin
    raises — the guard now fails loudly on the Spark side too."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    for rows in ([(1, 2, 0)], [(1, 2, -3)], [(1, 2, None)]):
        e = spark.createDataFrame(rows, "src long, dst long, w long")
        with pytest.raises((Py4JJavaError, SparkRuntimeException),
                           match="positive BIGINT"):
            graph.pagerank(e, n_iter=1, weight="w").collect()


def test_pagerank_tol_early_exit_identical_ranks(spark):
    """tol is observation, not perturbation: a converged graph exits
    early, and the exit-round ranks equal the fixed-iteration run."""
    # directed 4-cycle: uniform ranks are the fixed point from round 1
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long")
    early = graph.pagerank(e, n_iter=10, tol=1)
    got = {r["node"]: r["rank"] for r in early.collect()}
    assert early._pagerank_rounds < 10
    fixed = graph.pagerank(e, n_iter=early._pagerank_rounds)
    want = {r["node"]: r["rank"] for r in fixed.collect()}
    assert got == want
    # a non-converged skewed graph runs the full cap
    e2 = spark.createDataFrame(
        [(i, 0) for i in range(1, 8)] + [(0, 1)], "src long, dst long")
    full = graph.pagerank(e2, n_iter=4, tol=1)
    assert full._pagerank_rounds == 4
    assert {r["node"]: r["rank"] for r in full.collect()} == \
        {r["node"]: r["rank"] for r in graph.pagerank(e2, n_iter=4).collect()}


def test_pagerank_tol_validation(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="tol"):
        graph.pagerank(e, tol=0)


def test_host_reputation_composition(spark):
    """host_edges_from_links drops self-links and unparseable ends,
    aggregates parallel links into weights; host_reputation's
    integer prior keeps exactly the link rank for uncrawled hosts
    and zeroes unlinked ones (quality alone never launders)."""
    from malstrom_spark.functions import reputation as rep
    from pyspark.sql import functions as F

    links = spark.createDataFrame(
        [("https://a.com/1", "https://b.com/x"),
         ("https://a.com/2", "https://b.com/y"),      # parallel: w=2
         ("https://a.com/3", "https://A.com/self"),   # self, dropped
         ("https://b.com/1", "https://hub.org/"),
         ("bogus", "https://hub.org/")],              # no src host
        "src string, dst string")
    edges = rep.host_edges_from_links(links, "src", "dst")
    got = {(r.src, r.dst): r.w for r in edges.collect()}
    assert got == {("a.com", "b.com"): 2, ("b.com", "hub.org"): 1}

    docs = spark.createDataFrame(
        [("https://a.com/1", True), ("https://a.com/2", False),
         ("https://b.com/1", True),
         ("https://island.net/1", True)],   # unlinked host
        "url string, keep boolean")
    stats = rep.host_quality_stats(docs, "url", "keep")
    prior = {r.host: r for r in rep.host_reputation(
        edges, stats, n_iter=3).collect()}
    # hub.org: linked but uncrawled -> n_docs=0, reputation == rank
    assert prior["hub.org"].n_docs == 0
    assert prior["hub.org"].reputation == prior["hub.org"].rank
    assert prior["hub.org"].rank > 0
    # island.net: crawled but unlinked -> rank 0, reputation 0
    assert prior["island.net"].rank == 0
    assert prior["island.net"].reputation == 0
    # a.com: rank r, 2 docs 1 keep -> rep = (r * 2) div 3
    a = prior["a.com"]
    assert a.reputation == (a.rank * 2) // 3


# --------------------------------------------- anchor profile (r11)
def test_anchor_text_profile_mode_and_ties(spark):
    from malstrom_spark.functions.reputation import anchor_text_profile

    links = spark.createDataFrame(
        [
            ("https://a.example/x", "Home"),
            ("https://a.example/y", "Home"),
            ("https://a.example/z", "About"),
            ("https://A.EXAMPLE:443/w", "  About  "),  # host-normalized, trimmed
            ("https://b.example/1", "zeta"),
            ("https://b.example/2", "alpha"),  # tie at 1 -> lexicographic
            ("https://c.example/1", ""),       # empty anchor dropped
            ("notaurl", "skipped"),
        ],
        "href string, anchor string",
    )
    got = {r.host: r for r in anchor_text_profile(links, "href", "anchor").collect()}
    assert got["a.example"].n_inlinks == 4
    assert got["a.example"].n_distinct_anchors == 2
    # Home=2 vs About=2 after trim+host-norm -> tie -> 'About' < 'Home'
    assert got["a.example"].top_anchor == "About"
    assert got["b.example"].top_anchor == "alpha"
    assert "c.example" not in got
