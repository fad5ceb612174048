"""Subword (BPE) tokenization — distributed fit + vectorized apply.

Every token-budgeted operator in this engine (`pack_sequences`,
`chunk_text`, `rare_token_rate`, surprisal) counted whitespace tokens;
production pipelines budget in SUBWORD tokens. This module supplies
byte-pair-encoding (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") the Spark-first way:

- **fit** is ONE distributed word-count aggregation (groupBy over the
  — optionally sampled — corpus) capped to the top `max_words` word
  types, followed by the classic incremental pair-count merge loop
  over that bounded word-frequency table on the driver. The driver
  loop is O(word types x merges), INDEPENDENT of corpus size: at
  100 TB the corpus-sized work is exactly one shuffle (plus the
  sample scan), the same construction-time-small shape as the k-means
  fit in functions/similarity.py.
- **apply** is an Arrow-batched pandas_udf over the broadcast merge
  list with a per-batch distinct-word cache (Zipf makes the cache hit
  rate ~= 1), emitting an `array<string>` token column that the
  existing packing/chunking operators budget with.

Determinism & oracle-exactness: the trainer breaks ties by (count
DESC, pair lexicographic ASC) and REFUSES any merge whose
concatenation equals an existing token string. That restriction buys
a provable equivalence: applying the merge list IN RANK ORDER (one
full left-to-right non-overlapping pass per merge) yields the same
tokens as the classic priority-queue encoder — a later merge can
never create an occurrence of an earlier pair, because the earlier
pair would need the later merge's output string to already exist as
a token (pinned by a property test in tests/test_bpe.py). In-order
application is a fold of plain string `replace` calls over the
symbol string, which Python, Spark and DuckDB implement identically
— so the encode is expressible as a recursive CTE in the DuckDB
oracle and the gate row is hash-exact, not rows-only.

String representation subtlety (load-bearing): tokens are joined by
TWO spaces and each replace pattern is flanked by ONE space
(` a  b ` -> ` ab `), so a match consumes only the inner space of
each boundary and the neighbouring occurrence keeps its own — this
makes string replace reproduce token-level LEFTMOST NON-OVERLAPPING
merging exactly. A single-space join gets this wrong: in
`a d a d` the first match eats the separator the second needs, and
in runs of five identical symbols it merges positions (0,1),(3,4)
instead of (0,1),(2,3). Property-tested against the classic
priority-queue encoder.

The reference has no tokenizer (its surface is general closures,
SURVEY §2.8); this is north-star LLM-pipeline capability, like
functions/corpus.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

import pandas as pd  # noqa: F401  (pandas_udf closures resolve here)

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker appended to every word's symbol sequence
#: (classic Sennrich convention; lets merges distinguish word-final
#: subwords like 'er</w>' from word-internal 'er')
EOW = "</w>"


# ------------------------------------------------------------ trainer


def _pairs(sym: tuple[str, ...]) -> list[tuple[str, str]]:
    return [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]


def _merge_word(
    sym: tuple[str, ...], a: str, b: str, ab: str
) -> tuple[str, ...]:
    """Leftmost non-overlapping merge of the pair (a, b) -> ab — the
    same occurrence semantics as a single string `replace` pass."""
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_merges(
    word_counts: Mapping[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a word-frequency table
    (pure Python — `bpe_fit` feeds it the distributed counts; the
    oracle side feeds it the identical seeded counts, so both engines
    hold the same merges).

    Incremental pair statistics (only words containing the merged
    pair are re-scanned per round, Sennrich's learn_bpe shape);
    deterministic selection = highest total count, ties to the
    lexicographically smallest pair; pairs whose concatenation equals
    an existing token string are skipped (see module doc — this is
    what makes in-order application exact). Stops early when no
    eligible pair remains."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    from collections import Counter, defaultdict

    vocab: list[tuple[tuple[str, ...], int]] = []
    token_strings: set[str] = {EOW}
    for w in sorted(word_counts):
        c = int(word_counts[w])
        if not w or c <= 0:
            continue
        sym = tuple(list(w) + [EOW])
        vocab.append((sym, c))
        token_strings.update(sym)

    stats: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for wi, (sym, c) in enumerate(vocab):
        for p in _pairs(sym):
            stats[p] += c
            index[p].add(wi)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = min(
            (
                p
                for p, cnt in stats.items()
                if cnt > 0 and (p[0] + p[1]) not in token_strings
            ),
            key=lambda p: (-stats[p], p),
            default=None,
        )
        if best is None:
            break
        a, b = best
        ab = a + b
        token_strings.add(ab)
        merges.append(best)
        for wi in list(index[best]):
            sym, c = vocab[wi]
            for p in _pairs(sym):
                stats[p] -= c
                index[p].discard(wi)
            new = _merge_word(sym, a, b, ab)
            vocab[wi] = (new, c)
            for p in _pairs(new):
                stats[p] += c
                index[p].add(wi)
    return merges


# ------------------------------------------------------------- encode


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode ONE word: chars + EOW, then one left-to-right
    non-overlapping `replace` pass per merge, in rank order, on the
    double-space-joined symbol string (see module doc for why the
    boundary is two spaces). This is the exact algorithm the DuckDB
    oracle runs (recursive CTE of `replace(s, ' a  b ', ' ab ')`), so
    Spark and the oracle agree byte-for-byte; it equals the
    priority-queue encoder for any merge list produced by
    `train_merges` (property-pinned)."""
    s = "  " + "  ".join(list(word) + [EOW]) + "  "
    for a, b in merges:
        s = s.replace(f" {a}  {b} ", f" {a}{b} ")
    return s.split()


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 65536,
    sample_fraction: float | None = None,
    seed: int = 7,
    lowercase: bool = False,
) -> list[tuple[str, str]]:
    """Distributed BPE fit: whitespace word counts in ONE groupBy over
    the (optionally Bernoulli-sampled) corpus, capped to the top
    `max_words` word types by (count DESC, word ASC) — a TakeOrdered,
    so the collect is bounded by max_words regardless of corpus size
    — then the merge loop over that table. Returns the ordered merge
    list (broadcast it into `bpe_encode`).

    100 TB shape: the only corpus-sized cost is the word-count
    shuffle (map-side combined); everything after is O(max_words).
    Sample for speed — BPE statistics converge long before 100 TB of
    evidence (Sennrich trained on single-digit-GB corpora)."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    words = df.where(F.col(text_col).isNotNull()).select(
        F.explode(toks).alias("word")
    )
    if lowercase:
        words = words.select(F.lower(F.col("word")).alias("word"))
    if sample_fraction is not None and sample_fraction < 1.0:
        words = words.sample(fraction=sample_fraction, seed=seed)
    counts = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return train_merges({r.word: r.cnt for r in counts}, n_merges)


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    lowercase: bool = False,
) -> DataFrame:
    """Add `out_col` (array<string>): the BPE token sequence of the
    whitespace-pre-tokenized text. Pre-tokenization runs JVM-side
    with the same split(r'\\s+') every other doc_* operator uses (so
    word boundaries are engine-consistent); the per-word encode is an
    Arrow pandas_udf over the closure-shipped merge list with a
    per-batch distinct-word cache. NULL text -> NULL tokens; empty /
    whitespace-only text -> empty array."""
    from pyspark.sql.functions import pandas_udf

    merges_local = list(merges)

    @pandas_udf("array<string>")
    def _enc(words_arr: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_doc(words):
            if words is None:
                return None
            out: list[str] = []
            for w in words:
                t = cache.get(w)
                if t is None:
                    t = cache[w] = encode_word(w, merges_local)
                out.extend(t)
            return out

        return words_arr.map(enc_doc)

    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    lowered = F.transform(words, F.lower) if lowercase else words
    return df.withColumn(
        out_col,
        F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
            _enc(lowered)
        ),
    )


# ----------------------------------------------------- vocab / ids


def bpe_vocab(
    merges: list[tuple[str, str]], base_chars: Iterable[str]
) -> dict[str, int]:
    """Deterministic token -> id table: EOW, then the sorted base
    characters, then each merge's output in rank order. `base_chars`
    is the corpus character inventory (callers usually collect it
    once next to `bpe_fit`; it bounds the id space)."""
    vocab: dict[str, int] = {EOW: 0}
    for ch in sorted(set(base_chars)):
        if ch and ch not in vocab:
            vocab[ch] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok in vocab:
            raise ValueError(
                f"merge output {tok!r} duplicates an existing token — "
                "not a train_merges-produced merge list"
            )
        vocab[tok] = len(vocab)
    return vocab


def bpe_token_ids(
    tokens: Column, vocab: dict[str, int], oov_id: int = -1
) -> Column:
    """Map an array<string> token column to array<int> ids through a
    LITERAL map (JVM-side, zero Python in the row path — vocab sizes
    are thousands, far under literal-plan limits). Unknown tokens map
    to `oov_id`. The map literal is built in ONE py4j call (round-12
    session 4: the per-entry create_map paid two round-trips per
    vocab token — see functions/litutil.py)."""
    from .litutil import json_lit_map

    m = json_lit_map({t: int(i) for t, i in vocab.items()}, "int")
    return F.transform(
        tokens, lambda t: F.coalesce(m[t], F.lit(oov_id)).cast("int")
    )


# ------------------------------------------------------ persistence

#: bump when the (rank, left, right) layout changes; bpe_load refuses
#: tables written by a newer layout instead of mis-reading them
BPE_FORMAT_VERSION = 1


def bpe_save(spark, merges: list[tuple[str, str]], table_name: str) -> None:
    """Persist the ordered merge list as a versioned stage table
    (rank, left, right, format_version) — the persist_stage discipline
    every other incremental operator follows (dedup history, IVF
    serving): the FIT is one job, every later encode job loads the
    table instead of refitting or hand-carrying a Python list. The
    table is tiny (merges are hundreds-thousands of rows), so it is a
    plain managed parquet table, not bucketed."""
    if not merges:
        raise ValueError("refusing to persist an empty merge list")
    rows = [
        (i + 1, a, b, BPE_FORMAT_VERSION) for i, (a, b) in enumerate(merges)
    ]
    df = spark.createDataFrame(
        rows, "rank int, left string, right string, format_version int"
    )
    # a previous incarnation of the table (possibly from a catalog
    # that has since been recreated) must not block the write
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    from .unigram import _clear_orphaned_location

    _clear_orphaned_location(spark, table_name)
    df.write.mode("overwrite").format("parquet").saveAsTable(table_name)


def bpe_load(spark, table_name: str) -> list[tuple[str, str]]:
    """Load a merge list persisted by `bpe_save`, validated: known
    format version, non-null pair strings, contiguous ranks 1..n (a
    partial/corrupt write must fail loudly, not silently tokenize
    differently). The collect is bounded by the merge count."""
    rows = spark.table(table_name).select(
        "rank", "left", "right", "format_version"
    ).collect()
    if not rows:
        raise ValueError(f"{table_name}: empty merge table")
    vers = {r["format_version"] for r in rows}
    if vers != {BPE_FORMAT_VERSION}:
        raise ValueError(
            f"{table_name}: format_version {sorted(vers)} != "
            f"{BPE_FORMAT_VERSION} — refusing to mis-read"
        )
    rows.sort(key=lambda r: r["rank"])
    if [r["rank"] for r in rows] != list(range(1, len(rows) + 1)):
        raise ValueError(f"{table_name}: ranks not contiguous 1..n")
    if any(r["left"] is None or r["right"] is None for r in rows):
        raise ValueError(f"{table_name}: NULL merge pair")
    return [(r["left"], r["right"]) for r in rows]


# -------------------------------------------------- oracle plumbing


def merges_sql_values(merges: list[tuple[str, str]]) -> str:
    """Render a merge list as DuckDB VALUES rows `(rank, pat, rep)`
    where pat/rep are the space-delimited replace patterns the
    recursive-CTE encoder folds with — the oracle-side twin of
    `encode_word`."""
    if not merges:
        raise ValueError("empty merge list has no SQL rendering")

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = [
        f"({r + 1}, {q(f' {a}  {b} ')}, {q(f' {a}{b} ')})"
        for r, (a, b) in enumerate(merges)
    ]
    return ", ".join(rows)
