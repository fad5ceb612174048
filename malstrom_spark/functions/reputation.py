"""Host-reputation propagation: the CCNet/Dolma-style source-scoring
composition — a host-level link graph (functions/html.extract_links ->
functions/url.url_host) run through integer-exact PageRank
(functions/graph.pagerank), combined with per-host document-quality
aggregates into a HOST PRIOR that joins back onto the document table
as a broadcast (docs never reshuffle for it).

Reference parity: the reference engine exposes the pieces (link
extraction, per-key aggregation, iterative fixed points) but not the
composition; this module is the LLM-pipeline operator a crawl-scale
corpus needs — re-rank or gate documents by where they come from, not
only by what they contain (CCNet §3 "source quality", Dolma's per-host
spam priors).

100 TB shape: host cardinality is ~1e7-1e8 — millions of times smaller
than the document table. Everything host-keyed (edge aggregation,
PageRank rounds, quality rollup, the final prior table) runs on that
small keyspace; the ONLY document-sized work is the two projections
that derive (host, quality) per doc and the final broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .url import url_host


def host_edges_from_links(
    links: DataFrame,
    src_url: str,
    dst_url: str,
) -> DataFrame:
    """(src, dst, w): host-level weighted link graph from a URL-level
    link table (e.g. the output of html.extract_links exploded per
    doc). Hosts lowercased/port-stripped via url_host; rows whose
    either end has no parseable host are dropped; SELF-links (both
    ends on one host) are dropped — intra-site navigation says
    nothing about cross-host endorsement (the PageRank-for-hosts
    convention); parallel links aggregate into the integer weight.
    One host-keyed shuffle over the (already link-level) table."""
    e = links.select(
        url_host(F.col(src_url)).alias("src"),
        url_host(F.col(dst_url)).alias("dst"),
    ).where((F.col("src") != "") & (F.col("dst") != "")
            & (F.col("src") != F.col("dst")))
    return e.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )


def host_quality_stats(
    docs: DataFrame,
    url_col: str,
    keep_col: str,
) -> DataFrame:
    """(host, n_docs, n_keep): per-host rollup of a boolean document
    quality verdict (e.g. text.linear_classifier's `keep`). Docs with
    no parseable host are dropped (they can't receive a host prior
    anyway). One map-side-combinable host-keyed aggregate."""
    return (
        docs.select(
            url_host(F.col(url_col)).alias("host"),
            F.col(keep_col).cast("boolean").alias("__k"),
        )
        .where(F.col("host") != "")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("__k").cast("long")).cast("long").alias("n_keep"),
        )
    )


def host_reputation(
    host_edges: DataFrame,
    host_stats: DataFrame,
    n_iter: int = 5,
    weighted: bool = True,
) -> DataFrame:
    """(host, rank, n_docs, n_keep, reputation): the host prior.
    `rank` is integer-exact (micro-unit) PageRank over the host link
    graph — weighted by link counts when `weighted` (a host linked
    500 times endorses more than one linked once); `reputation`
    combines endorsement with observed content quality, all-integer
    so reruns and the SQL oracle agree bit for bit:

        reputation = (rank * (1 + n_keep)) div (1 + n_docs)

    — monotone in both rank and keep fraction, with the +1 Laplace
    floor so an unobserved host (linked to, but no docs crawled from
    it yet: n_docs = n_keep = 0) keeps exactly its link rank rather
    than dividing by zero or zeroing out. Hosts in the stats table
    but outside the link graph get rank 0 (nobody endorses them) and
    reputation 0 — quality alone never launders an unlinked host.

    Shape: PageRank runs on the HOST graph (orders of magnitude
    smaller than the corpus); the stats join is host-keyed on the
    same small table. Nothing here is document-sized."""
    from .graph import pagerank

    ranks = pagerank(
        host_edges,
        src="src",
        dst="dst",
        n_iter=n_iter,
        weight="w" if weighted else None,
    ).withColumnRenamed("node", "host")
    joined = ranks.join(host_stats, "host", "full_outer").select(
        "host",
        F.coalesce(F.col("rank"), F.lit(0)).cast("long").alias("rank"),
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.col("n_keep"), F.lit(0)).cast("long").alias("n_keep"),
    )
    # integer `div`, not float `/` + floor: rank*(1+n_keep) can pass
    # 2^53 where double division drops bits and diverges from the
    # oracle's integer `//`. The product goes through DECIMAL(38,0):
    # a mega-host (rank ~1e11 micro-units = 10% of all link mass)
    # with ~1e8 kept docs overflows BIGINT (1e19 > 2^63), which ANSI
    # mode turns into a job-killing ARITHMETIC_OVERFLOW; the decimal
    # product is exact to 1e38 and the quotient is bounded by rank
    # (n_keep <= n_docs), so the final BIGINT cast is always safe.
    # DuckDB side mirrors with a HUGEINT product.
    return joined.withColumn(
        "reputation",
        F.expr(
            "(CAST(rank AS DECIMAL(38, 0)) * (1 + n_keep)) div (1 + n_docs)"
        ).cast("long"),
    )


def with_host_reputation(
    docs: DataFrame,
    url_col: str,
    reputation: DataFrame,
    prefix: str = "host_",
) -> DataFrame:
    """Join the host prior back onto the document table: each doc
    gains {prefix}rank / {prefix}reputation (0 when its host is
    absent from the prior — an unknown host has no endorsement).
    The prior is BROADCAST (host tables are small by contract —
    see module docstring), so the document table never reshuffles:
    the plan must show BroadcastHashJoin with no Exchange on the
    docs side (pinned by test_plans)."""
    prior = F.broadcast(
        reputation.select(
            F.col("host").alias("__h"),
            F.col("rank").alias(f"{prefix}rank"),
            F.col("reputation").alias(f"{prefix}reputation"),
        )
    )
    out = docs.withColumn("__h", url_host(F.col(url_col))).join(
        prior, "__h", "left"
    )
    return out.drop("__h").fillna(
        {f"{prefix}rank": 0, f"{prefix}reputation": 0}
    )


def anchor_text_profile(
    links: DataFrame,
    dst_url_col: str,
    anchor_col: str,
) -> DataFrame:
    """Per-target-host anchor-text profile — the classic web-search /
    quality signal (how OTHER pages describe a host beats how the
    host describes itself; used for ranking since anchor propagation
    in early web search and for spam priors in crawl pipelines).

    Output per destination host: (host, n_inlinks,
    n_distinct_anchors, top_anchor, top_anchor_n) where top_anchor is
    the most frequent non-empty anchor string (ties broken
    lexicographically — a total, engine-reproducible order).

    100 TB shape: two host-keyed aggregations over the (already
    link-level) table — the profile keyspace is host-sized, millions
    of times smaller than the corpus; no data-sized windows (the
    top-1 window runs on (host, anchor) COUNTS, not raw links)."""
    a = links.select(
        url_host(F.col(dst_url_col)).alias("host"),
        F.trim(F.col(anchor_col)).alias("__a"),
    ).where((F.col("host") != "") & (F.col("__a") != ""))
    counts = a.groupBy("host", "__a").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.desc("__n"), F.asc("__a"))
    top = (
        counts.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            "host",
            F.col("__a").alias("top_anchor"),
            F.col("__n").alias("top_anchor_n"),
        )
    )
    totals = counts.groupBy("host").agg(
        F.sum("__n").cast("long").alias("n_inlinks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_anchors"),
    )
    return totals.join(top, "host").select(
        "host", "n_inlinks", "n_distinct_anchors", "top_anchor", "top_anchor_n"
    )
