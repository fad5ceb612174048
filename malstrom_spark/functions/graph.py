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
    checkpoint_every: int | None = None,
    redistribute_dangling: bool = False,
    weight: str | None = None,
    tol: int | None = None,
) -> DataFrame:
    """Integer-exact PageRank over the nodes appearing in `edges`.
    Returns (node BIGINT, rank BIGINT in SCALE micro-units).

    `weight=<col>` (round 9): weighted PageRank — contributions split
    proportionally to INTEGER edge weights (link counts, click
    counts):
        r'(v) += (r(u) * 17 * w(u,v)) div (20 * W(u)),
    W(u) = sum of u's out-edge weights. Weights must be positive
    BIGINTs; keep max weight <= ~5e5 so rank*17*w stays inside int64
    even if one node held ALL the mass (documented bound, same
    integer-headroom reasoning as the micro-unit SCALE). weight=None
    is exactly weight 1 everywhere (parallel edges still count
    double).

    `checkpoint_every=k` (round 9 — the lineage cut the r8 docstring
    promised, now a flag): every k rounds the rank vector is
    localCheckpoint'ed (eager) and the PREVIOUS checkpoint's storage
    blocks are released deterministically (the dedup-CC discipline —
    executor storage stays O(1) in rounds, not O(rounds)). Without it
    the loop builds a linearly growing plan: fine to ~10 rounds, a
    planner wall beyond. Ranks are identical with or without
    (pytest-pinned) — a checkpoint is a materialization boundary, not
    a semantic change.

    `redistribute_dangling=True` (round 9): dangling nodes' damped
    mass is redistributed uniformly each round — one broadcast scalar
    (the q11 pattern), still all-integer:
        r'(v) += (17 * sum_dangling r(u)) div (20 * N)
    making total mass conserve to SCALE up to floor dust, i.e. the
    standard probability-distribution PageRank. Default stays the
    simplified drop-mass variant (the r8 gate row's fixed contract).

    `tol=<int>` (round 10): convergence early-exit — stop when the
    max per-node |rank delta| of a round drops below `tol` micro-units
    (one tiny node-keyed join + one-row aggregate per round, the
    dangling-scalar pattern; at SCALE=1e12, tol=1e6 is a 1e-6
    relative tolerance). n_iter becomes the CAP. Early exit is a
    driver-side decision, so tol=None (default) keeps the
    fixed-iteration determinism the oracle rows rely on; with tol
    set, ranks at exit are IDENTICAL to the fixed-iteration run that
    happens to stop there (pytest-pinned) — the delta check is
    observation, not perturbation. The returned DataFrame carries
    `._pagerank_rounds` (rounds actually run) for observability."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if checkpoint_every is not None and checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    if tol is not None and tol < 1:
        raise ValueError("tol must be >= 1 micro-unit (or None)")
    # The dangling variant references the rank vector TWICE per round
    # (contribution join + dangling anti-join) and the tol check once
    # more, so an uncheckpointed plan grows 2^rounds, not linearly —
    # force a per-round cut unless the caller chose a cadence (2^k
    # subtree copies between cuts is then the caller's bounded trade).
    if (redistribute_dangling or tol is not None) and checkpoint_every is None:
        checkpoint_every = 1
    if weight:
        # Weights must be positive: a NULL/zero out-strength makes
        # Spark's integer `div` yield NULL (contribution silently
        # dropped) while DuckDB's `//` raises — silent cross-engine
        # divergence. Guard INSIDE the weight expression (a free-
        # standing guard column gets pruned by Catalyst — see
        # resample.py) so a bad weight fails the job loudly on the
        # first batch that touches it, no extra validation job.
        wc = F.col(weight).cast("long")
        w = F.when(
            wc.isNull() | (wc <= 0),
            F.raise_error(
                F.concat(
                    F.lit("pagerank: weight column must be a positive "
                          "BIGINT, got "),
                    F.coalesce(wc.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(wc)
    else:
        w = F.lit(1).cast("long")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # out-strength: with weight=None this is exactly the edge count
    outdeg = e.groupBy("src").agg(F.sum("w").alias("out"))
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

    prev_ckpt = None
    rounds_run = n_iter
    for i in range(n_iter):
        prev_ranks = ranks
        send = (
            e.join(ranks, e.src == ranks.node)
            # outdeg is NODES-sized: no broadcast hint (a hint forces a
            # driver collect that dies at hundreds of millions of
            # nodes) — the join shares the src key with the rank join
            # and AQE broadcasts it only when it actually fits
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank * 17 * w) div (20 * out)").alias("__c"),
            )
        )
        incoming = send.groupBy("node").agg(F.sum("__c").alias("__in"))
        new_rank = teleport + F.coalesce(F.col("__in"), F.lit(0))
        base = nodes.join(incoming, "node", "left").crossJoin(
            F.broadcast(n_nodes)
        )
        if redistribute_dangling:
            # damped mass parked on dangling nodes (no out-edges),
            # spread uniformly — ONE one-row broadcast per round
            dang = (
                ranks.join(
                    outdeg, ranks.node == outdeg.src, "left_anti"
                ).agg(
                    F.coalesce(F.sum("rank"), F.lit(0)).alias("dmass")
                )
            )
            base = base.crossJoin(F.broadcast(dang))
            new_rank = new_rank + F.expr("(dmass * 17) div (20 * n)")
        ranks = base.select("node", new_rank.cast("long").alias("rank"))
        ckpted = (
            checkpoint_every
            and (i + 1) % checkpoint_every == 0
            and i + 1 < n_iter
        )
        if ckpted:
            ranks = ranks.localCheckpoint(eager=True)
        if tol is not None and i + 1 < n_iter:
            # one node-keyed join + one-row max per round; runs off
            # the just-checkpointed vector so nothing recomputes.
            # MUST run before the previous checkpoint is released —
            # prev_ranks IS that checkpoint at cadence 1
            delta = (
                ranks.join(
                    prev_ranks.select(
                        "node", F.col("rank").alias("__prev")
                    ),
                    "node",
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("__prev"))))
                .first()[0]
            )
            if delta is not None and delta < tol:
                rounds_run = i + 1
                if ckpted and prev_ckpt is not None:
                    from .dedup import _free_local_checkpoint

                    _free_local_checkpoint(prev_ckpt)
                break
        if ckpted:
            if prev_ckpt is not None:
                from .dedup import _free_local_checkpoint

                _free_local_checkpoint(prev_ckpt)
            prev_ckpt = ranks
    ranks._pagerank_rounds = rounds_run
    return ranks


def pagerank_sql(
    edges_cte: str,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    redistribute_dangling: bool = False,
    weighted: bool = False,
) -> str:
    """DuckDB rendering of the IDENTICAL fixed-point for oracles:
    pass a CTE body producing (src, dst) — or (src, dst, w) with
    `weighted` — returns chained-CTE SQL ending in SELECT node, rank.
    Integer ops mirror pagerank() term for term ((x * 17 [* w]) //
    (20 * out), (3 * SCALE) // (20 * n), and — with
    redistribute_dangling — (dmass * 17) // (20 * n))."""
    out_expr = "SUM(w)" if weighted else "COUNT(*)"
    w_mul = " * e.w" if weighted else ""
    pre = f"""
    WITH e AS ({edges_cte}),
    nodes AS (
      SELECT {src} AS node FROM e UNION SELECT {dst} AS node FROM e
    ),
    outdeg AS (SELECT {src} AS src, {out_expr} AS out FROM e GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, {SCALE} // n AS rank FROM nodes, nn)"""
    steps = []
    for i in range(1, n_iter + 1):
        dang_cte = f"""
    dang{i} AS (
      SELECT COALESCE(CAST(SUM(r.rank) AS BIGINT), 0) AS dmass
      FROM r{i - 1} r LEFT JOIN outdeg o ON o.src = r.node
      WHERE o.src IS NULL
    ),""" if redistribute_dangling else ""
        dang_join = f" CROSS JOIN dang{i}" if redistribute_dangling else ""
        dang_term = (
            f" + (dang{i}.dmass * 17) // (20 * nn.n)"
            if redistribute_dangling
            else ""
        )
        steps.append(f"""
    s{i} AS (
      SELECT e.{dst} AS node, (r.rank * 17{w_mul}) // (20 * o.out) AS c
      FROM e JOIN r{i - 1} r ON r.node = e.{src}
      JOIN outdeg o ON o.src = e.{src}
    ),
    inc{i} AS (
      SELECT node, CAST(SUM(c) AS BIGINT) AS s FROM s{i} GROUP BY node
    ),{dang_cte}
    r{i} AS (
      SELECT nodes.node,
             (3 * {SCALE}) // (20 * nn.n){dang_term}
             + COALESCE(inc.s, 0) AS rank
      FROM nodes CROSS JOIN nn{dang_join}
      LEFT JOIN inc{i} inc ON inc.node = nodes.node
    )""")
    return (
        pre + "," + ",".join(steps)
        + f"\n    SELECT node, CAST(rank AS BIGINT) AS rank FROM r{n_iter}"
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph of
    `edges` (direction, parallel edges and self-loops are normalized
    away). Returns (node BIGINT, triangles BIGINT) for every node of
    the graph, zeros included.

    Algorithm is the degree-oriented wedge join (Suri &
    Vassilvitskii, WWW 2011 "Counting triangles and the curse of the
    last reducer"): orient every edge from the (degree, id)-smaller
    endpoint to the larger, build wedges only at each triangle's
    minimum vertex, and close them with one more join — each triangle
    found EXACTLY once. Why this is the 100 TB shape: orientation
    bounds every out-neighborhood by O(sqrt(E)) regardless of skew, so
    a celebrity hub with 10^8 followers contributes wedges only
    through its few higher-degree peers instead of C(10^8, 2) pairs —
    the naive all-wedges join dies exactly there. Cost: three hash
    joins + one count; everything integer, so the DuckDB oracle
    replays it exactly (customer_triangles row)."""
    e0 = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .distinct()
    )
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    oriented = (
        e0.join(du, "u").join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    )
    w1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    # x != y, NOT x < y: the closing edge is stored in exactly ONE
    # orientation — the (degree, id) one — which need not agree with
    # raw id order (deg(2)>deg(3) stores {2,3} as (3,2)); an id-order
    # wedge filter silently misses those triangles (caught by the
    # round-9 review with a 5-edge repro). Keeping both (x, y) and
    # (y, x) wedges and joining against the single stored orientation
    # still counts each triangle exactly once.
    wedges = w1.join(w2, "a").where(F.col("x") != F.col("y"))
    closer = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closer, ["x", "y"]).select(
        F.col("a"), F.col("x"), F.col("y")
    )
    corners = (
        tris.select(F.col("a").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    return nodes.join(corners, "node", "left").select(
        "node", F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
        .alias("triangles")
    )


def triangle_count_sql(
    edges_cte: str, src: str = "src", dst: str = "dst"
) -> str:
    """DuckDB rendering of the IDENTICAL degree-oriented count."""
    return f"""
    WITH e_raw AS ({edges_cte}),
    e0 AS (
      SELECT DISTINCT LEAST({src}, {dst}) AS u, GREATEST({src}, {dst}) AS v
      FROM e_raw WHERE {src} <> {dst}
    ),
    nodes AS (SELECT u AS node FROM e0 UNION SELECT v AS node FROM e0),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0)
      GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e0.u < e0.v)
                  THEN e0.u ELSE e0.v END AS a,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e0.u < e0.v)
                  THEN e0.v ELSE e0.u END AS b
      FROM e0
      JOIN deg du ON du.node = e0.u
      JOIN deg dv ON dv.node = e0.v
    ),
    tri AS (
      SELECT w1.a, w1.b AS x, w2.b AS y
      FROM o w1 JOIN o w2 ON w1.a = w2.a AND w1.b <> w2.b
      JOIN o c ON c.a = w1.b AND c.b = w2.b
    ),
    corners AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
      FROM (SELECT a AS node FROM tri UNION ALL SELECT x FROM tri
            UNION ALL SELECT y FROM tri)
      GROUP BY node
    )
    SELECT nodes.node, CAST(COALESCE(corners.triangles, 0) AS BIGINT)
             AS triangles
    FROM nodes LEFT JOIN corners ON corners.node = nodes.node
    """
