"""Iterative graph algorithms over edge-list DataFrames. The
connected-components family lives in functions/dedup.py (alternating
large-star/small-star, O(log n) rounds); this module adds PageRank —
the canonical "iterative algorithm on Spark" the driver contract
calls out, here made ORACLE-EXACT by doing the whole fixed-point in
integer arithmetic.

Why integer: float PageRank sums per-node contributions in shuffle
order, so no two engines (or two runs) agree bit-for-bit. With ranks
held as BIGINT micro-units (SCALE = 1e12) and the damping applied as
an exact rational (85/100 -> *17 // 20), every operation is integer
multiply/floor-divide/sum — associative, order-free, identical in
any engine — so a DuckDB oracle replays the SAME iterations as
chained CTEs and every rank matches exactly. The floor losses are
<= 1 micro-unit per edge per round: irrelevant to ranking, priceless
for verifiability (same trade as the quantized-NB language ID and
the micro-integer BM25 sums).

Semantics (simplified-dangling variant, documented): each round
    r'(v) = (3 * SCALE) // (20 * N)            -- teleport 0.15
          + sum over in-edges (u, v) of (r(u) * 17) // (20 * out(u))
where out(u) counts edge ROWS (parallel edges weight double).
Dangling nodes' mass is dropped, not redistributed — ranks are then
not a probability distribution, but the ordering (what PageRank is
used for) is standard, and the fixed-point stays exactly
reproducible.

100 TB shape: edges are the big relation; each of the fixed
`n_iter` rounds is one join of the (nodes-sized) rank vector onto
edges plus one groupBy(dst) sum with map-side partial combine —
2 shuffles per round, nothing driver-side, no collect. Pre-
partitioning edges by src lets every round's join reuse the same
exchange; outdegree is computed once. This is the DataFrame
rendering of Pregel-style PageRank, with the iteration count fixed
(checkpoint/AQE keep lineage bounded for small n_iter; for n_iter
beyond ~10, localCheckpoint per round is the standard lineage cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # ranks in integer micro-units (1e12)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
) -> DataFrame:
    """Integer-exact PageRank over the nodes appearing in `edges`.
    Returns (node BIGINT, rank BIGINT in SCALE micro-units)."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("out"))
    n_nodes = nodes.agg(F.count("*").alias("n"))

    # r0 = SCALE // N for every node; teleport term is constant too —
    # both ride on the broadcast one-row count (q11 pattern).
    # `div` (not `/`): Spark's `/` is always DOUBLE, and
    # floor(correctly_rounded(a/b)) can disagree with exact a // b
    # when the quotient rounds up to an integer — `div` is the exact
    # integral op, matching DuckDB's `//` on non-negative BIGINTs.
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"{SCALE} div n").alias("rank")
    )
    teleport = F.expr(f"{3 * SCALE} div (20 * n)")

    for _ in range(n_iter):
        send = (
            e.join(ranks, e.src == ranks.node)
            # outdeg is NODES-sized: no broadcast hint (a hint forces a
            # driver collect that dies at hundreds of millions of
            # nodes) — the join shares the src key with the rank join
            # and AQE broadcasts it only when it actually fits
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank * 17) div (20 * out)").alias("__c"),
            )
        )
        incoming = send.groupBy("node").agg(F.sum("__c").alias("__in"))
        ranks = (
            nodes.join(incoming, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (teleport + F.coalesce(F.col("__in"), F.lit(0)))
                .cast("long").alias("rank"),
            )
        )
    return ranks


def pagerank_sql(
    edges_cte: str, n_iter: int = 5, src: str = "src", dst: str = "dst"
) -> str:
    """DuckDB rendering of the IDENTICAL fixed-point for oracles:
    pass a CTE body producing (src, dst); returns chained-CTE SQL
    ending in SELECT node, rank. Integer ops mirror pagerank() term
    for term ((x * 17) // (20 * out), (3 * SCALE) // (20 * n))."""
    pre = f"""
    WITH e AS ({edges_cte}),
    nodes AS (
      SELECT {src} AS node FROM e UNION SELECT {dst} AS node FROM e
    ),
    outdeg AS (SELECT {src} AS src, COUNT(*) AS out FROM e GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, {SCALE} // n AS rank FROM nodes, nn)"""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(f"""
    s{i} AS (
      SELECT e.{dst} AS node, (r.rank * 17) // (20 * o.out) AS c
      FROM e JOIN r{i - 1} r ON r.node = e.{src}
      JOIN outdeg o ON o.src = e.{src}
    ),
    inc{i} AS (
      SELECT node, CAST(SUM(c) AS BIGINT) AS s FROM s{i} GROUP BY node
    ),
    r{i} AS (
      SELECT nodes.node,
             (3 * {SCALE}) // (20 * nn.n) + COALESCE(inc.s, 0) AS rank
      FROM nodes CROSS JOIN nn
      LEFT JOIN inc{i} inc ON inc.node = nodes.node
    )""")
    return (
        pre + "," + ",".join(steps)
        + f"\n    SELECT node, CAST(rank AS BIGINT) AS rank FROM r{n_iter}"
    )
