"""Corpus-assembly operators for training-data pipelines: C4-style
line-level cleaning, concat-and-chunk sequence packing, and
deterministic stratified sampling.

Like functions/text.py these are absent from the reference (its
surface is general closures, SURVEY §2.8) and first-class here per
the north star. Everything is native Column expressions or one
bounded window per shard — no Python in the row path, no global
(unpartitioned) windows, nothing driver-side.
"""

from __future__ import annotations

import math

import pandas as pd  # module-level: mapInPandas closures resolve here

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _tokens_cheap, md5_prefix_hash

# ---------------------------------------------- C4-style line cleaning

LINE_TERMINALS = r'[.!?"]$'
DOC_DROP_MARKERS = ("lorem ipsum", "{")
LINE_DROP_MARKERS = ("javascript",)


def clean_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, public
    rule set): keep only lines with >= ``min_words`` words that end in
    terminal punctuation and don't advertise code/boilerplate
    ('javascript'); drop the whole document when it contains a
    page-level marker ('lorem ipsum', '{'). Output: one row per
    SURVIVING doc — (id, n_lines, n_kept, cleaned) with the kept lines
    re-joined.

    All decisions are line-array HOFs over one split('\\n') — a pure
    map at 100 TB; the line array is materialized once per row so the
    split never re-evaluates per line (PERF NOTE in functions/dedup).
    Null-text docs are dropped (no lines to keep)."""
    lines = F.split(F.col(text_col), "\n")
    with_lines = df.select(F.col(id_col), F.col(text_col), lines.alias("_lines"))
    doc_bad = F.lit(False)
    for m in DOC_DROP_MARKERS:
        doc_bad = doc_bad | F.lower(F.col(text_col)).contains(m)

    def line_ok(ln: Column) -> Column:
        ok = F.size(F.split(F.trim(ln), r"\s+")) >= min_words
        ok = ok & ln.rlike(LINE_TERMINALS)
        for m in LINE_DROP_MARKERS:
            ok = ok & ~F.lower(ln).contains(m)
        return ok

    kept = F.filter(F.col("_lines"), line_ok)
    out = with_lines.where(~doc_bad).select(
        F.col(id_col),
        F.size("_lines").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("cleaned"),
    )
    return out.where(F.col("n_kept") > 0)


# ------------------------------------------- concat-and-chunk packing


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    n_shards: int = 32,
    portable: bool = False,
) -> DataFrame:
    """GPT-style sequence packing (concatenate-then-chunk): documents
    are laid out back to back in a deterministic order and cut into
    fixed ``seq_len``-token training sequences. Each doc gets the
    sequence it STARTS in plus its offset there, and a flag when it
    spans a cut point (pipelines either mask or split those).

    Distribution shape: docs shard by hash of id (`n_shards` streams
    packed independently — exactly how a multi-worker tokenizer run
    packs, and what keeps the cumulative-sum window PARTITIONED; a
    global pack order would be one task). Within a shard the order is
    ascending id, so output is deterministic and engine-reproducible;
    ``portable=True`` uses the md5-prefix hash for the shard so a SQL
    oracle reproduces the exact same shards (xxhash64 otherwise).

    Output: id, shard, seq_id (per-shard chunk index), start_offset
    (token offset inside that sequence), crosses_boundary. Ids must be
    unique (they define the within-shard pack order)."""
    hash_fn = md5_prefix_hash if portable else F.xxhash64
    shard = F.pmod(hash_fn(F.col(id_col).cast("string")), F.lit(n_shards))
    base = df.select(
        F.col(id_col), F.col(n_tokens_col).cast("long").alias("_nt"), shard.alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    csum = F.sum("_nt").over(w)
    laid = base.select(
        id_col,
        "shard",
        "_nt",
        (csum - F.col("_nt")).alias("_start"),
        csum.alias("_end"),
    )
    return laid.select(
        id_col,
        "shard",
        F.floor(F.col("_start") / seq_len).cast("long").alias("seq_id"),
        F.pmod(F.col("_start"), F.lit(seq_len)).cast("long").alias("start_offset"),
        (
            (F.col("_nt") > 0)
            & (F.floor((F.col("_end") - 1) / seq_len) > F.floor(F.col("_start") / seq_len))
        ).alias("crosses_boundary"),
    )


# --------------------------------------------- corpus datasheet


def corpus_datasheet(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Per-source data-card metrics in ONE aggregation pass — the
    summary table a dataset datasheet / mixing decision starts from:

      n_docs            rows
      n_distinct_texts  COUNT(DISTINCT md5 of whitespace/case-
                        normalized text) — (n_docs - this) is the
                        exact-duplicate volume per source
      total_words /     whitespace tokens (the _tokens_cheap
      min_words /       definition every dedup/LM op shares, so the
      max_words         numbers agree with the rest of the pipeline)
      total_chars       raw length sum
      n_langs           COUNT(DISTINCT lang) (skipped when lang_col
                        is None)

    Every aggregate is exact and map-side combinable (COUNT DISTINCT
    goes through Spark's two-phase expand — no sketch, the counts are
    datasheet facts, not estimates); one shuffle on source. For
    billion-doc corpora where exact distinct-text counting is too hot,
    run the HLL twin (functions/stats.py) — this operator's contract
    is exactness."""
    toks = _tokens_cheap(F.col(text_col))
    fp = F.md5(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_distinct_texts"),
        F.sum(F.size(toks)).cast("long").alias("total_words"),
        F.min(F.size(toks)).cast("long").alias("min_words"),
        F.max(F.size(toks)).cast("long").alias("max_words"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
    ]
    if lang_col is not None:
        aggs.append(F.countDistinct(F.col(lang_col)).alias("n_langs"))
    return df.groupBy(source_col).agg(*aggs)


# --------------------------------------------- leakage-safe splits


def split_by_group(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    portable: bool = False,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/validation/test assignment: the unit of
    assignment is the GROUP — a dedup/near-dup cluster id
    (dedup_groups / semdedup output), a host, an author — never the
    row. A row-level split lets near-duplicate documents straddle
    train and eval, which inflates benchmark numbers exactly the way
    Lee et al. 2021 measured; hashing the group id puts every member
    of a group in the SAME split by construction.

    split = first name (in sorted-by-name order, so dict order can't
    change assignments) whose cumulative fraction cutoff exceeds
    hash(seed, group) mod 1e6. Deterministic, resumable (a re-run or
    a grown corpus never reassigns an existing group), zero shuffle —
    one hash and one when-chain. Fractions must sum to 1 (within 1e-9
    — an accidental 0.8/0.1 split silently dropping 10% of the corpus
    is the kind of bug that must fail loudly). ``portable=True`` uses
    the md5-prefix hash so a SQL oracle replays the exact assignment;
    xxhash64 otherwise (the scale path)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must sum to 1 (got {total!r}); an implicit "
            "remainder would silently drop rows")
    if portable:
        h = md5_prefix_hash(
            F.concat_ws("\x1f", F.lit(str(seed)),
                        F.col(group_col).cast("string")))
    else:
        h = F.xxhash64(F.lit(str(seed)), F.col(group_col).cast("string"))
    u = F.pmod(h, F.lit(1_000_000))
    expr = None
    cum = 0.0
    names = sorted(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cut = int(round(cum * 1_000_000))
        branch = F.when(u < cut, F.lit(name))
        expr = branch if expr is None else expr.when(u < cut, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


# --------------------------------------------- stratified sampling


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the data-mixing pass of
    a pre-training pipeline (e.g. keep 100% of en, 30% of fr, drop the
    rest). A row is kept iff ``hash(key) % 1e6 < rate(stratum) * 1e6``:
    pure filter, no shuffle, reproducible across runs/engines (the
    same key always makes the same cut — resumable pipelines depend on
    this, which is why it is a hash, not rand()). ``portable=True``
    uses the md5-prefix hash (SQL-oracle-identical); xxhash64
    otherwise."""
    hash_fn = md5_prefix_hash if portable else F.xxhash64
    u = F.pmod(hash_fn(F.col(key_col).cast("string")), F.lit(1_000_000))
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.where(u < rate * 1_000_000)


# --------------------------------------------- rare-token-rate scoring


def rare_token_rate(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    vocab_k: int = 500,
) -> DataFrame:
    """Vocabulary-based quality proxy (the integer-exact cousin of
    CCNet's LM-perplexity filter, which needs a trained model): score
    each document by the fraction of its token OCCURRENCES that fall
    outside the corpus's top-``vocab_k`` vocabulary (by document
    frequency, ties broken by token for determinism). High rate =
    unusual vocabulary = likely noise/garble; near-zero = boilerplate.

    Two stages, both scale-safe: (1) the vocabulary is one
    (token -> doc frequency) aggregation + top-k — a tiny table that
    BROADCASTS; (2) scoring is explode -> broadcast semi-join ->
    per-doc count — the corpus text never shuffles, only (id, count)
    pairs do. All arithmetic is integer ratios divided in double
    (engine-exact; no logs, which are not bit-portable across
    engines).

    Output: (id, n_tokens, n_rare, rare_rate)."""
    toks = df.select(
        F.col(id_col), F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_t")
    )
    exploded = toks.select(id_col, F.explode_outer("_t").alias("_tok"))
    vocab = (
        exploded.groupBy("_tok")
        .agg(F.countDistinct(id_col).alias("_df"))
        .orderBy(F.desc("_df"), F.asc("_tok"))
        .limit(vocab_k)
        .select("_tok")
    )
    flagged = exploded.join(
        F.broadcast(vocab.withColumn("_in_vocab", F.lit(1))), "_tok", "left"
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias("n_rare"),
    )
    return per_doc.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_rare").cast("long").alias("n_rare"),
        (F.col("n_rare") / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")).alias(
            "rare_rate"
        ),
    )


# ------------------------------------------ cross-doc paragraph dedup


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Cross-document PARAGRAPH-level dedup (the CCNet/RefinedWeb
    pass): split every document into paragraphs, keep only the FIRST
    occurrence of each byte-identical paragraph corpus-wide (first =
    minimum (doc_id, paragraph_index)), and reconstruct documents from
    their surviving paragraphs. This removes boilerplate that exact
    whole-doc dedup can't touch — headers, footers, license blocks,
    navigation text shared across otherwise-distinct pages.

    Output: one row per doc with >= 1 surviving paragraph —
    (id, n_paras, n_kept, cleaned), where n_paras counts the doc's
    non-blank paragraphs and `cleaned` re-joins the keepers with
    ``sep`` in original order. Blank paragraphs (empty after trim) are
    dropped before dedup, like CCNet.

    100 TB shape: two hash exchanges — paragraphs shuffle once on the
    md5 fingerprint (keeper election: a partitioned row_number window,
    deterministic (doc, idx) order) and once on the doc id
    (reconstruction agg). Both are map-side-combinable-free windows/
    aggs over rows no wider than the original text; nothing is
    quadratic and nothing touches the driver. Election could shuffle
    only (fp, doc, idx) triples at the cost of a third join — at
    paragraph granularity the text payload is the same either way, so
    the 2-exchange form wins on data movement."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_idx", "_para"),
    ).where(F.trim(F.col("_para")) != "")
    w = Window.partitionBy("_fp").orderBy(id_col, "_idx")
    flagged = (
        paras.withColumn("_fp", F.md5(F.col("_para")))
        .withColumn("_keep", F.row_number().over(w) == 1)
    )
    cells = F.array_sort(F.collect_list(F.struct("_idx", "_para", "_keep")))
    kept_paras = F.transform(
        F.filter(cells, lambda s: s["_keep"]), lambda s: s["_para"]
    )
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.array_join(kept_paras, sep).alias("cleaned"),
    )
    return out.where(F.col("n_kept") > 0)


# ------------------------------------ bigram-LM surprisal scoring


def _floor_log2_ratio(total: Column, cnt: Column) -> Column:
    """floor(log2(total/cnt)) for positive bigints with total >= cnt,
    INTEGER-EXACT: d = bitlen(total) - bitlen(cnt), minus one when
    total < cnt << d. bitlen via length(bin(x)) — identical in DuckDB,
    which is what makes the whole scorer hash-verifiable: float log()
    differs across engines in the last ulp, whole-bit surprisal
    doesn't."""
    d = (F.length(F.bin(total)) - F.length(F.bin(cnt))).cast("int")
    # SQL shiftleft takes a column shift amount; the PySpark wrapper
    # F.shiftleft only takes a Python int, hence call_function
    shifted = F.call_function("shiftleft", cnt, d)
    return (d - F.when(total < shifted, 1).otherwise(0)).cast("long")


def fit_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    top_bigrams: int = 5000,
    top_unigrams: int = 2000,
):
    """Fit a stupid-backoff bigram language model for quality scoring
    (Heafield-style count tables, not neural): returns
    ``(unigrams, bigrams)`` DataFrames — (w, cnt, total) and
    (w1, w2, cnt, total) — truncated to the top-k most frequent
    entries (ties broken by token, deterministic). The top-k tables
    are what BROADCASTS at scoring time; everything rarer backs off.

    100 TB shape: one shuffle per n-gram order (map-side-combinable
    counts), top-k via TakeOrdered (never a global sort), totals ride
    along as a broadcast 1-row cross join so the fit stays lazy. Fit
    on a clean REFERENCE corpus (or a sample) and score the crawl —
    the standard quality-filter setup."""
    toks = df.select(_tokens_cheap(F.col(text_col)).alias("_t"))
    # explode_outer + null filter, NOT plain explode: the inferred
    # size(arr)>0 pre-filter would inline the tokenizer into a scan
    # filter (the Catalyst trap in BASELINE.md; lint-locked)
    uni_c = (
        toks.select(F.explode_outer("_t").alias("w"))
        .where(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    uni_total = uni_c.agg(F.sum("cnt").alias("total"))
    unigrams = (
        uni_c.orderBy(F.desc("cnt"), F.asc("w"))
        .limit(top_unigrams)
        .crossJoin(F.broadcast(uni_total))
    )
    big = _doc_bigrams(toks, []).select("w1", "w2")
    bi_c = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    bi_total = bi_c.agg(F.sum("cnt").alias("total"))
    bigrams = (
        bi_c.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(top_bigrams)
        .crossJoin(F.broadcast(bi_total))
    )
    return unigrams, bigrams


def _doc_bigrams(toks: DataFrame, keep_cols: list[str]) -> DataFrame:
    """(keep_cols..., w1, w2) adjacent-token pairs from a `_t` token
    array column. explode_outer (not explode) so no size(arr)>0
    filter is inferred with the tokenizer inlined into it — the
    Catalyst trap documented in BASELINE.md; short docs drop via the
    null-index filter on the GENERATED column instead."""
    idx = F.when(
        F.size("_t") >= 2, F.sequence(F.lit(1), F.size("_t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        toks.select(*keep_cols, "_t", F.explode_outer(idx).alias("_i"))
        .where(F.col("_i").isNotNull())
        .select(
            *keep_cols,
            F.element_at("_t", F.col("_i")).alias("w1"),
            F.element_at("_t", F.col("_i") + 1).alias("w2"),
        )
    )


def lm_surprisal(
    df: DataFrame,
    id_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    backoff_bits: int = 4,
    oov_bits: int = 24,
) -> DataFrame:
    """Per-document mean bigram surprisal in WHOLE BITS against a
    fitted `fit_bigram_lm` model — the perplexity-style quality score
    every corpus pipeline runs, made integer-exact (and therefore
    DuckDB-hash-verifiable) by bucketing -log2(p) to its floor:

      bigram in table:   floor(log2(total_bi / cnt))
      else unigram hit:  backoff_bits + floor(log2(total_uni / cnt))
      else:              oov_bits

    Low mean_bits = fluent/common text; high = rare or garbled. Output
    (id, n_bigrams, sum_bits, mean_bits) for docs with >= 1 bigram;
    mean_bits = sum/count of bigints divides identically in both
    engines.

    100 TB shape: tokenize+explode is a pure map, both LM tables are
    top-k-bounded broadcasts, the only shuffle is the per-doc agg."""
    toks = df.select(F.col(id_col), _tokens_cheap(F.col(text_col)).alias("_t"))
    big = _doc_bigrams(toks, [id_col])
    bi = bigrams.select(
        "w1", "w2", F.col("cnt").alias("_bc"), F.col("total").alias("_bt")
    )
    uni = unigrams.select(
        F.col("w").alias("w2"), F.col("cnt").alias("_uc"), F.col("total").alias("_ut")
    )
    scored = (
        big.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni), "w2", "left")
        .select(
            F.col(id_col),
            F.coalesce(
                _floor_log2_ratio(F.col("_bt"), F.col("_bc")),
                F.lit(backoff_bits) + _floor_log2_ratio(F.col("_ut"), F.col("_uc")),
                F.lit(oov_bits).cast("long"),
            ).alias("_bits"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("_bits").alias("sum_bits"),
        (F.sum("_bits").cast("double") / F.count(F.lit(1))).alias("mean_bits"),
    )


# ----------------------------------------------- per-source caps


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    order_cols: list[Column | str],
) -> DataFrame:
    """Keep at most ``n`` rows per key, chosen by ``order_cols`` — the
    per-domain/per-source cap every web-corpus pipeline applies so one
    prolific domain can't dominate the training mix (RefinedWeb-style
    source balancing). Deterministic: make ``order_cols`` a total
    order (end with the id) so reruns and engines agree on the cut.

    Shape: one partitioned window (rank <= n). Keys here are corpus
    sources/domains — many keys, bounded rows each; for an adversarial
    single mega-key, pre-aggregate an approximate per-key order-stat
    threshold and filter before the window (same candidates-then-exact
    pattern as the dedup pipelines) rather than sorting the mega-key's
    whole partition."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


# ----------------------------------------- mixture upsampling


def upsample_by_weight(
    df: DataFrame,
    id_col: str,
    weight: Column,
    seed: int = 0,
    portable: bool = False,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic fractional upsampling — the data-MIXING primitive
    (LLaMA-style domain weights: 'repeat wikipedia 2.5x, downweight
    web to 0.7x') that complements `cap_per_key`'s downsampling side.

    Each row appears floor(w) + Bernoulli(frac(w)) times, where the
    'coin' is a pure hash of (id, seed) — reproducible across runs,
    engines and partitionings, no RNG state. Output rows carry
    ``copy_col`` (0-based copy index) so downstream packing can
    deterministic-shuffle copies apart (order by hash(id, copy_idx)).

    Shape (100 TB): zero shuffle — the repeat count and the explode
    are map-side; output volume is sum(w) rows. ``portable=True``
    uses the md5-prefix hash so a SQL oracle reproduces the exact
    Bernoulli draws (registry `doc_mixture_upsample`); default is
    xxhash64 (no hex materialization on the hot path)."""
    from .dedup import md5_prefix_hash

    if portable:
        u_int = md5_prefix_hash(F.concat_ws("\x1f", F.col(id_col), F.lit(str(seed))))
    else:
        u_int = F.xxhash64(F.col(id_col), F.lit(seed))
    # pmod, not %/abs: xxhash64 spans the full signed range and
    # abs(Long.MIN_VALUE) overflows
    u = F.pmod(u_int, F.lit(1_000_000)) / F.lit(1_000_000.0)
    n = (F.floor(weight) + F.when(u < weight - F.floor(weight), 1).otherwise(0)).cast(
        "int"
    )
    return (
        df.withColumn("__n", n)
        .where(F.col("__n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


# --------------------------------------------- deterministic shuffle


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    n_shards: int = 32,
    portable: bool = False,
) -> DataFrame:
    """Deterministic GLOBAL training shuffle + shard assignment — the
    last step of a training-data pipeline: every record lands in
    exactly one of ``n_shards`` output shards at a stable position,
    and the whole permutation is a pure function of (seed, id). A new
    epoch is a new seed; re-running on a grown corpus only reorders
    within shards (no RNG state, no sampling drift across engines or
    partitionings).

    shard = hash(seed, id) mod n_shards  — uniform, so shard sizes
    stay balanced regardless of id distribution (no hot shard);
    pos   = rank of hash(seed+1, id) within the shard (ties broken by
    id). Two INDEPENDENT hash draws: the shard draw must not leak
    into the within-shard order, or the low bits that chose the shard
    would correlate positions across shards.

    Shape (100 TB): ONE hash shuffle on shard + a per-shard window
    sort — the same cost as writing the shards at all; there is no
    global sort and no driver-side state. With n_shards sized to the
    writer parallelism this is the standard "shuffle then shard"
    layout job. ``portable=True`` swaps xxhash64 for the md5-prefix
    hash so a SQL oracle reproduces the permutation exactly.

    Output: input columns + shard (int) + pos (long, 0-based)."""
    from .dedup import md5_prefix_hash

    if portable:
        h = lambda s: md5_prefix_hash(  # noqa: E731
            F.concat_ws("\x1f", F.lit(str(s)), F.col(id_col))
        )
    else:
        h = lambda s: F.xxhash64(F.lit(str(s)), F.col(id_col))  # noqa: E731
    shard = F.pmod(h(seed), F.lit(n_shards)).cast("int")
    order = h(seed + 1)
    w = Window.partitionBy("shard").orderBy(order, F.col(id_col))
    return (
        df.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
    )


# ----------------------------------------- heavy hitters


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    phi: float,
    k: int | None = None,
) -> DataFrame:
    """Exact phi-heavy-hitters (every item occurring in more than
    phi * N of the N item rows) at 100 TB cost: a single-pass
    MERGEABLE Misra-Gries sketch proposes candidates, a second pass
    recounts only those exactly — the classic candidates-then-exact
    shape (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries",
    PODS 2012 for the merge step used across partitions).

    Pass 1 keeps <= k weighted counters per partition (vectorized:
    value_counts per Arrow batch folded into the counter dict; when it
    overflows, subtract the (k+1)-th largest weight and keep
    positives — the mergeable-summaries reduce).

    Candidate-superset guarantee (shared with streaming/heavy.py —
    the SAME bound, stated once): each reduce step removes >= (k+1)*d
    total weight, and total weight inserted is N_p, so a partition's
    per-item undercount is <= N_p/(k+1); an item absent from a
    partition's survivors therefore has c_p <= N_p/(k+1). If an item
    is absent from EVERY partition's survivors, its total count is
    <= sum_p N_p/(k+1) = N/(k+1). Hence whenever k + 1 >= 1/phi,
    N/(k+1) <= phi*N and every phi-heavy item (count > phi*N)
    survives in at least one partition — the candidate union is a
    provable superset. We VALIDATE k >= ceil(1/phi) (raising when the
    guarantee would be silently voided) and default to
    k = ceil(2/phi), which halves the undercount bound
    (|candidates| <= k * partitions, broadcast-small). Pass 2
    broadcast-semi-joins the candidates and
    counts exactly, so the OUTPUT is exact and deterministic — sketch
    internals never leak into the answer, which keeps the row
    oracle-checkable against a plain GROUP BY/HAVING.

    Shuffles: candidate merge (<= k rows/partition) + the recount agg
    of candidate rows only; the full relation is never shuffled.

    Output: (item_col, cnt, share) for items with cnt > phi * N,
    share = cnt / N.
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    if k is None:
        k = int(math.ceil(2.0 / phi))
    elif k < math.ceil(1.0 / phi):
        # below ceil(1/phi) the superset guarantee is void: a true
        # phi-heavy item can miss the candidate set and the exact
        # recount cannot restore it — refuse rather than silently
        # return an incomplete "exact" result
        raise ValueError(
            f"k={k} voids the heavy-hitter guarantee for phi={phi}: "
            f"need k >= ceil(1/phi) = {math.ceil(1.0 / phi)} "
            f"(default is ceil(2/phi) = {math.ceil(2.0 / phi)})"
        )
    item_type = df.schema[item_col].dataType.simpleString()

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[item_col].dropna().value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                # mergeable-summaries reduce: subtract the (k+1)-th
                # largest weight from everything, keep positives
                d = sorted(counters.values(), reverse=True)[k]
                counters = {i: w - d for i, w in counters.items() if w > d}
        if counters:
            yield pd.DataFrame(
                {"item": list(counters.keys()), "w": list(counters.values())}
            )

    summaries = df.select(item_col).mapInPandas(mg, f"item {item_type}, w long")
    # merged weights are never output or thresholded — the recount
    # decides — so candidates are just the distinct surviving items
    return recount_heavy_hitters(df, item_col, summaries.select("item").distinct(), phi)


def recount_heavy_hitters(
    df: DataFrame, item_col: str, candidates: DataFrame, phi: float
) -> DataFrame:
    """Exact second pass shared by the batch and streaming heavy-
    hitter operators: recount the candidate superset (a DataFrame
    with column ``item``) against the full relation and keep items
    with cnt > phi * N. Output: (item_col, cnt, share)."""
    # reserved candidate column name: the semi-join below would be
    # ambiguous if the caller's item_col were itself named "item"
    cand = candidates.select(F.col("item").alias("__hh_item"))
    total = df.where(F.col(item_col).isNotNull()).agg(
        F.count(item_col).alias("_n")
    )
    counted = (
        df.join(
            F.broadcast(cand), F.col(item_col) == F.col("__hh_item"), "leftsemi"
        )
        .groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.lit(float(phi)) * F.col("_n"))
        .select(
            item_col,
            "cnt",
            F.round(F.col("cnt") / F.col("_n"), 6).alias("share"),
        )
    )


# ----------------------------------------- context-window chunking


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 0,
    tokens_col: str | None = None,
) -> DataFrame:
    """Split documents into overlapping context windows — the chunker
    in front of embedding / retrieval-index builds and the long-doc
    splitter for fixed-window training corpora. Whitespace tokens;
    window w covers tokens [w*(max_tokens-overlap),
    w*(max_tokens-overlap) + max_tokens); the last window may be
    short; a document shorter than one window yields exactly one
    chunk; empty/whitespace-only text yields one chunk with
    n_tokens = 0 and chunk = '' (filter n_tokens > 0 to drop them —
    they stay visible rather than vanishing, so corpus defects
    surface). NULL text has no tokens to window and is dropped.

    Pure Column pipeline: split -> sequence of window starts ->
    posexplode -> slice/join — zero Python, zero shuffle, fuses into
    the scan (the 100 TB contract for a per-row expansion; output
    rows ~ tokens/(max_tokens-overlap) per doc).

    ``tokens_col`` switches the unit from whitespace words to a
    precomputed array<string> token column (e.g. functions/bpe.py
    `bpe_encode` output) — the subword-budgeted form production
    chunkers use; ``text_col`` is ignored then except for the NULL
    filter, and `chunk` joins the tokens with spaces.

    Output: id_col, chunk_id (0-based), n_tokens, chunk (string).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    step = max_tokens - overlap
    if tokens_col is not None:
        toks = F.col(tokens_col)
        df = df.where(toks.isNotNull())
        text_col = tokens_col  # NULL filter below applies to tokens
    else:
        # drop the '' artifact split() yields on empty input so an
        # empty doc reports n_tokens = 0, distinguishable from a
        # 1-token doc
        toks = F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
    n = F.size(toks)
    # window starts: 0, step, 2*step, ... covering every token; the
    # last start is the largest multiple of step < n (or 0)
    last = F.greatest(
        (n - 1 - F.lit(overlap)), F.lit(0)
    ) - F.pmod(F.greatest((n - 1 - F.lit(overlap)), F.lit(0)), F.lit(step))
    starts = F.sequence(F.lit(0), last, F.lit(step))
    t = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), toks.alias("_toks"), starts.alias("_starts")
    )
    win = F.slice(F.col("_toks"), F.col("_start") + 1, max_tokens)
    return (
        t.select(
            id_col,
            F.posexplode("_starts").alias("chunk_id", "_start"),
            "_toks",
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(win).cast("long").alias("n_tokens"),
            F.array_join(win, " ").alias("chunk"),
        )
    )


def cap_per_key_skew_safe(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    order_col: str,
    id_col: str,
    lo: int,
    hi: int,
    n_bins: int = 1024,
    ascending: bool = True,
) -> DataFrame:
    """`cap_per_key` for ADVERSARIAL key skew: the plain form window-
    sorts each key in one task, so one mega-key (a domain holding a
    double-digit share of a 100 TB crawl) becomes a single-task sort.
    This variant is the candidates-then-exact shape the dedup family
    uses: (1) one histogram aggregation over (key, bin of order_col)
    — map-side combinable, output bounded by keys x n_bins; (2) per
    key, the first bin where the cumulative count reaches ``n`` (a
    window over n_bins-sized partitions, never row-sized); (3) keep
    only rows at-or-better than that threshold bin — at most
    n + (rows in the threshold bin) per key survive; (4) the exact
    window runs on the survivors. Output is EXACTLY the plain
    operator's (pytest-pinned equal), deterministic via the
    (order_col, id_col) total order.

    ``order_col`` must be integer-valued in [lo, hi) (pre-scale
    floats to cents etc. — same contract as operators/histogram).
    ``ascending=True`` keeps the n smallest. A threshold bin stuffed
    with duplicates of one value degrades toward the plain window for
    THAT key only — raise n_bins to tighten."""
    from ..operators.histogram import linear_bin

    v = F.col(order_col).cast("long")
    b = linear_bin(v, lo, hi, n_bins) if ascending else -linear_bin(v, lo, hi, n_bins)
    binned = df.withColumn("__bin", b)
    hist = binned.groupBy(*key_cols, "__bin").agg(F.count("*").alias("__c"))
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc("__bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # smallest bin whose cumulative count reaches n; keys with fewer
    # than n rows keep everything (threshold = max bin)
    thresholds = (
        hist.withColumn("__cum", F.sum("__c").over(wb))
        .groupBy(*key_cols)
        .agg(
            F.coalesce(
                F.min(F.when(F.col("__cum") >= n, F.col("__bin"))),
                F.max("__bin"),
            ).alias("__cut")
        )
    )
    # plain equi-join, not a broadcast hint: the threshold table is
    # keys-sized (millions of domains at crawl scale) — let AQE pick
    # broadcast when it actually fits. The join itself streams; the
    # mega-key's rows never BUFFER anywhere, which is the point
    survivors = binned.join(thresholds, key_cols).where(
        F.col("__bin") <= F.col("__cut")
    )
    order = [F.asc(order_col) if ascending else F.desc(order_col), F.asc(id_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .select(*df.columns)
    )


# ---------------------------------- temperature-balanced resampling


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    boost: float = 1.0,
    max_copies: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Temperature-based stratum rebalancing — the multilingual data-
    mixing rule (sampling probability ∝ p_lang^alpha, the published
    choice in XLM-R/mT5-style pipelines) generalized to any stratum
    column (language, source domain, quality tier). Unlike
    `sample_stratified`, the per-stratum weights are DERIVED FROM THE
    DATA: a stratum seen with probability p gets expected copies
    w = boost * (p_min / p)^(1 - alpha), so the rarest stratum gets
    `boost` copies and larger strata progressively fewer — alpha=1
    reproduces the corpus, alpha=0 makes every stratum equally
    represented in expectation. w > 1 UPSAMPLES (docs are emitted
    floor(w) times plus one Bernoulli extra), w < 1 downsamples —
    one mechanism for both, deterministic per key: the Bernoulli is
    `hash(key) % 1e6 < frac(w) * 1e6` (same resumability convention
    as sample_stratified; rand() would unglue reruns).

    Output = input columns + copy_idx (1..n for that row's copies).

    Engine portability: alpha=0.5 computes w via sqrt (IEEE
    correctly-rounded in every engine, hence oracle-exact);
    other alphas go through pow(), whose last-ulp behavior is
    libm-specific — fine for production, not for a hash-exact oracle.
    ``portable=True`` swaps xxhash64 for the md5-prefix hash.

    100 TB shape: the stratum weight table is one tiny groupBy
    crossJoined with its one-row min (both broadcast, ReuseExchange
    pattern as q11); the corpus side is a broadcast join + explode —
    the fact table never shuffles and never sorts. max_copies bounds
    the explode against degenerate p_min/p ratios."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    if boost <= 0:
        raise ValueError("boost must be > 0")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__cnt"))
    cmin = counts.agg(F.min("__cnt").alias("__cmin"))
    ratio = F.col("__cmin").cast("double") / F.col("__cnt").cast("double")
    if abs(alpha - 0.5) < 1e-12:
        w = F.sqrt(ratio)
    else:
        w = F.pow(ratio, F.lit(1.0 - alpha))
    w = F.least(w * F.lit(float(boost)), F.lit(float(max_copies)))
    weights = counts.crossJoin(F.broadcast(cmin)).select(
        strata_col, w.alias("__w")
    )

    hash_fn = md5_prefix_hash if portable else F.xxhash64
    u = F.pmod(hash_fn(F.col(key_col).cast("string")), F.lit(1_000_000))
    frac = F.col("__w") - F.floor(F.col("__w"))
    n = (F.floor("__w").cast("long")
         + F.when(u < frac * 1_000_000, F.lit(1)).otherwise(F.lit(0)).cast("long"))
    return (
        df.join(F.broadcast(weights), strata_col)
        .withColumn("__n", n)
        .where(F.col("__n") >= 1)
        .select(
            *df.columns,
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("__n"))
            ).alias("copy_idx"),
        )
    )


# ------------------------------------------- PMI collocation mining


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    quant: int = 10_000,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the
    association-mining pass that surfaces multiword expressions
    ("machine learning") and tokenizer-merge candidates from a
    corpus. PMI(a, b) = ln(c(ab) * T / (c(a) * c(b))) over adjacent
    token pairs, where T is the total number of bigram positions.

    Engine-portability: c(ab) * T and c(a) * c(b) are exact BIGINTs;
    their double quotient is one correctly-rounded op; the single ln
    is immediately quantized (floor(ln * quant) -> pmi_q BIGINT), the
    same discipline as BM25's idf — so ranking and output are
    hash-exact. Ties break on (pmi_q desc, gram asc).

    Shape: one bigram-count shuffle + one unigram-count shuffle (both
    map-side combinable), two token-keyed joins of the bigram
    relation onto the (vocab-sized) unigram counts, a one-row total
    broadcast, and a two-stage skew-safe top-k. min_count prunes the
    long tail BEFORE the joins, which is what keeps the joined
    relation collocation-sized rather than corpus-sized."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = df.where(F.col(text_col).isNotNull()).select(
        _tokens_cheap(F.col(text_col)).alias("__t")
    ).where(F.size("__t") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__t") - 2),
                lambda i: F.struct(
                    F.element_at("__t", i + 1).alias("a"),
                    F.element_at("__t", i + 2).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    big = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    uni = (
        toks.select(F.explode("__t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_tok"))
    )
    total = pairs.agg(F.count(F.lit(1)).cast("long").alias("T"))
    ua = uni.select(F.col("tok").alias("a"), F.col("c_tok").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c_tok").alias("c_b"))
    scored = (
        big.join(ua, "a").join(ub, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a", "b", "c_ab",
            F.floor(
                F.log(
                    (F.col("c_ab") * F.col("T")).cast("double")
                    / (F.col("c_a") * F.col("c_b")).cast("double")
                ) * F.lit(float(quant))
            ).cast("long").alias("pmi_q"),
        )
    )
    from .search import topk_per_key

    top = topk_per_key(
        scored.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.desc("pmi_q"), F.asc("a"), F.asc("b")],
        top_k,
    )
    return top.select(
        "a", "b", "c_ab", "pmi_q", F.col("rank").cast("long").alias("rank")
    )


# ------------------- DSIR importance resampling (Xie et al. 2023)


def dsir_feature_counts(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 8192,
    portable: bool = False,
) -> DataFrame:
    """Hashed-n-gram feature counts — the sufficient statistic of the
    DSIR bag-of-hashed-ngrams model (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): every unigram and
    bigram is hashed into one of `n_buckets` buckets; the output is
    (bucket BIGINT, cnt BIGINT).

    MERGEABLE across shards by construction: counts from separately
    fitted corpus shards (or days) sum — `df_a.unionByName(df_b)
    .groupBy("bucket").agg(sum(cnt))` is the exact all-at-once fit,
    so the target and raw models can be maintained incrementally like
    every other state here.

    Shape at 100 TB: one explode over tokens+bigrams and ONE
    aggregation whose partial combine runs map-side and whose output
    is at most `n_buckets` rows — the shuffle is bounded by the
    bucket count, not the corpus. Bigrams are hashed from their two
    token cells via the multi-arg hash (no n-gram string is
    materialized on the scale path)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    return (
        _dsir_feature_buckets(docs, [], text_col, n_buckets, portable)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _dsir_feature_buckets(
    docs: DataFrame,
    keep_cols: list[str],
    text_col: str,
    n_buckets: int,
    portable: bool,
) -> DataFrame:
    """ONE definition of the DSIR feature stream (keep_cols* +
    bucket): hashed unigrams + bigrams of the cheap tokenizer, bucket
    = pmod(hash, n_buckets). Fit (dsir_feature_counts) and score
    (dsir_score) both call THIS — they must hash identically or every
    score silently sums weights the fit never counted (review catch:
    two hand-kept copies had already drifted in shape). The bigram
    arm is guarded: sequence(0, size-2) on a 1-token doc would be
    sequence(0, -1), which Spark auto-steps BACKWARDS to [0, -1]
    (element_at(t, 0) then errors) — empty array instead."""
    hash_fn = md5_prefix_hash if portable else F.xxhash64
    toks = docs.where(F.col(text_col).isNotNull()).select(
        *keep_cols, _tokens_cheap(F.col(text_col)).alias("__t")
    ).where(F.size("__t") > 0)
    t = F.col("__t")
    bigram_hashes = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: hash_fn(
                F.element_at(t, i + 1), F.element_at(t, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return toks.select(
        *keep_cols,
        F.explode(
            F.concat(F.transform(t, lambda x: hash_fn(x)), bigram_hashes)
        ).alias("__h"),
    ).select(
        *keep_cols, F.pmod(F.col("__h"), F.lit(n_buckets)).alias("bucket")
    )


def dsir_log_ratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = 8192,
    quant: int = 10_000,
) -> DataFrame:
    """Per-bucket quantized log importance ratio from two fitted
    count tables: lam_q = floor(ln((t_b + 1) * (R + B) /
    ((r_b + 1) * (T + B))) * quant) — Laplace-smoothed log(p/q) in
    BIGINT quant units (the langid/BM25 discipline: both products are
    exact BIGINTs, ONE correctly-rounded division, ONE ln, quantized
    immediately, so scoring downstream is order-free integer
    arithmetic and oracle-exact).

    Integer-headroom bound (documented like pmi_bigrams): the
    products must stay inside int64 — (max bucket count + 1) *
    (total features + n_buckets) < 2^63, which holds to ~3e9 target
    features against a 3e9-feature raw corpus; fit on a sample (DSIR
    does) long before that.

    Output is at most `n_buckets` rows (missing buckets on either
    side get the smoothed ratio via the outer join) — broadcast it
    onto the corpus for scoring."""
    t_tot = target_counts.agg(F.sum("cnt").alias("__T"))
    r_tot = raw_counts.agg(F.sum("cnt").alias("__R"))
    joined = (
        target_counts.withColumnRenamed("cnt", "__tc")
        .join(raw_counts.withColumnRenamed("cnt", "__rc"), "bucket", "full")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
    )
    tc = F.coalesce(F.col("__tc"), F.lit(0)) + F.lit(1)
    rc = F.coalesce(F.col("__rc"), F.lit(0)) + F.lit(1)
    num = (tc * (F.col("__R") + F.lit(n_buckets))).cast("double")
    den = (rc * (F.col("__T") + F.lit(n_buckets))).cast("double")
    return joined.select(
        "bucket",
        F.floor(F.log(num / den) * F.lit(float(quant)))
        .cast("long").alias("lam_q"),
    )


def dsir_fit(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 8192,
    quant: int = 10_000,
    portable: bool = False,
) -> DataFrame:
    """Convenience: fit both hashed-feature models and return the
    (bucket, lam_q) importance table in one call. For incremental
    fits keep the two `dsir_feature_counts` states and re-derive."""
    return dsir_log_ratio(
        dsir_feature_counts(target_docs, text_col, n_buckets, portable),
        dsir_feature_counts(raw_docs, text_col, n_buckets, portable),
        n_buckets,
        quant,
    )


def dsir_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_buckets: int = 8192,
    portable: bool = False,
) -> DataFrame:
    """Per-doc DSIR importance: score_q = sum over the doc's hashed
    features of lam_q — i.e. quant * log w(x) under the bag-of-
    hashed-ngrams model, an exact BIGINT sum (order-free, hash-exact).
    Docs with NULL/empty text score 0 (kept — selection policy
    belongs to the caller).

    Shape: explode features -> broadcast-join the <= n_buckets weight
    table -> groupBy(doc) sum with map-side combine — ONE shuffle
    whose rows are (doc, partial sum), not the token stream."""
    feats = _dsir_feature_buckets(
        docs, [id_col], text_col, n_buckets, portable
    )
    scores = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lam_q").alias("dsir_q"))
    )
    return (
        docs.join(scores, id_col, "left")
        .select(
            *docs.columns,
            F.coalesce(F.col("dsir_q"), F.lit(0)).cast("long")
            .alias("dsir_q"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    n: int,
    text_col: str = "text",
    n_buckets: int = 8192,
    quant: int = 10_000,
    portable: bool = False,
) -> DataFrame:
    """DSIR selection: sample `n` docs without replacement with
    probability proportional to importance w(x), via Gumbel-top-k
    (Xie et al.'s resampling) made DETERMINISTIC: the Gumbel noise is
    derived from hash(doc_id) instead of rand() — u = (h % 1e6 + 0.5)
    / 1e6, g_q = floor(-ln(-ln(u)) * quant) — so reruns, restarts and
    the DuckDB oracle reproduce the identical selection (the
    sample_stratified/temperature_sample resumability convention;
    rand() would unglue reruns). key_q = dsir_q + g_q is all-BIGINT;
    top-n by (key_q desc, id asc) runs through the skew-safe
    two-stage top-k (no global single-task sort).

    Output: the selected docs' columns + dsir_q + rank (1..n)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    hash_fn = md5_prefix_hash if portable else F.xxhash64
    scored = dsir_score(docs, weights, id_col, text_col, n_buckets, portable)
    u = (
        F.pmod(hash_fn(F.col(id_col).cast("string")), F.lit(1_000_000))
        .cast("double") + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    g_q = F.floor(-F.log(-F.log(u)) * F.lit(float(quant))).cast("long")
    keyed = scored.withColumn("__key_q", F.col("dsir_q") + g_q)
    from .search import topk_per_key

    top = topk_per_key(
        keyed.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.desc("__key_q"), F.asc(id_col)],
        n,
    )
    return top.select(
        *docs.columns, "dsir_q", F.col("rank").cast("long").alias("rank")
    )


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    weight: Column,
    token_budget: int,
    max_epochs: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Data-mixing PLAN for a token-budgeted training run — the
    per-source table a Dolma/LLaMA-style mixture decision produces
    before any sampling happens: for each stratum, how many tokens
    are available, how many the target mixture asks for, how many
    epochs (passes) that implies, and whether the max-epochs repeat
    cap binds (the "we cannot upsample Wikipedia 40x" constraint).
    Feed `planned_rate` (the cap-respecting rate) into
    `temperature_sample`/`upsample_by_weight` to realize the plan;
    `sampling_rate` reports the uncapped ask so the report shows how
    far the cap binds.

    `weight` is an integer Column giving the stratum's relative
    mixture weight (ppm-precision integer weights cover practical
    mixtures). ALL plan arithmetic is exact integer math — target =
    budget * w // W, epochs = ceil-div — and the one reported rate is
    a single division of exact BIGINTs, so the plan is engine-exact,
    not approximately right.

    Shape: one map-side-combinable count/sum aggregation keyed by the
    stratum (the corpus never reshuffles), then literal one-row-
    broadcast arithmetic — the q11 scalar pattern."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    avail = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(strata_col), F.size(toks).cast("long").alias("__n"))
        .groupBy(strata_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__n").alias("available_tokens"),
        )
        .withColumn("weight", weight.cast("long"))
    )
    tot = avail.agg(F.sum("weight").alias("__w_total"))
    target = F.expr(f"(CAST({int(token_budget)} AS BIGINT) * weight) div __w_total")
    planned = F.least(
        F.col("target_tokens"),
        F.col("available_tokens") * F.lit(int(max_epochs)),
    )
    epochs = F.expr("(target_tokens + available_tokens - 1) div available_tokens")
    return (
        avail.crossJoin(F.broadcast(tot))
        .withColumn("target_tokens", target)
        .where(F.col("available_tokens") > 0)
        .withColumn("planned_tokens", planned)
        .withColumn("n_epochs", F.greatest(epochs, F.lit(1).cast("long")))
        .withColumn(
            "sampling_rate",
            F.col("target_tokens").cast("double")
            / F.col("available_tokens").cast("double"),
        )
        .withColumn(
            # the rate that RESPECTS the repeat cap — this is the one
            # to feed into temperature_sample/upsample_by_weight;
            # sampling_rate reports the uncapped ask for the report
            "planned_rate",
            F.col("planned_tokens").cast("double")
            / F.col("available_tokens").cast("double"),
        )
        .withColumn("is_capped", F.col("n_epochs") > F.lit(int(max_epochs)))
        .select(
            strata_col, "n_docs", "available_tokens", "weight",
            "target_tokens", "planned_tokens", "n_epochs",
            "sampling_rate", "planned_rate", "is_capped",
        )
    )
