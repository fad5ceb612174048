"""Text analysis for large-scale training-data pipelines.

The reference has no scalar-function library at all (SURVEY §2.8) —
users call arbitrary Rust in closures. Here every text metric is a
native Column expression (JVM-side, whole-stage codegen, zero Python)
so a 100 TB `documents` scan stays vectorized end to end.

Ops: tokenization, token/char counts, ratio-based quality scoring,
n-gram/stopword language ID, md5 document fingerprinting.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker vocabularies for the heuristic language ID.
# Deterministic and oracle-reproducible (plain set intersection).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
    "fr": ["le", "la", "les", "et", "des", "un", "est"],
}


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form used by
    fingerprinting and dedup so near-identical docs collide."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(col), r"\s+")


def word_tokens(col: Column) -> Column:
    """BPE-ish tokenization: words, numbers, or single punctuation
    marks — the regex analog of a GPT-2-style pre-tokenizer."""
    return F.regexp_extract_all(col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count(col: Column) -> Column:
    return F.length(col).cast("long")


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    kept = F.length(F.regexp_replace(col, r"[^A-Za-z ]", ""))
    return kept / F.greatest(F.length(col), F.lit(1))


def digit_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^0-9]", "")).cast("long")


def avg_token_len(col: Column) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.greatest(F.size(t), F.lit(1))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_MARKERS["en"]
    t = F.split(F.trim(F.lower(col)), r"\s+")
    hits = F.size(F.filter(t, lambda x: x.isin(sw)))
    return hits.cast("double") / F.greatest(F.size(t), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs with
    high alpha ratio and moderate average token length. Pure per-row
    double arithmetic — deterministic and engine-portable."""
    n_tok = token_count(col).cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    alpha_term = alpha_ratio(col)
    atl = avg_token_len(col)
    atl_term = F.lit(1.0) - F.least(F.abs(atl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    return (length_term + alpha_term + atl_term) / F.lit(3.0)


def lang_guess(col: Column) -> Column:
    """Marker-set language ID: the language with the most marker-word
    hits wins; ties broken by fixed language order; no hits -> 'und'."""
    t = F.split(F.trim(F.lower(col)), r"\s+")
    scores = {
        lang: F.size(F.array_intersect(t, F.lit(list(words)).cast("array<string>")))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    guess = F.lit("und")
    # Reverse order so earlier languages win ties via later when() override.
    for lang in reversed(list(scores)):
        guess = F.when(scores[lang] == best, F.lit(lang)).otherwise(guess)
    return F.when(best <= 0, F.lit("und")).otherwise(guess)


def fingerprint(col: Column) -> Column:
    """Stable 128-bit document fingerprint: md5 of the normalized text.
    md5 (not xxhash) so external oracles can reproduce it."""
    return F.md5(normalize_text(col))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "token_count": token_count(c),
            "char_count": char_count(c),
            "alpha_ratio": alpha_ratio(c),
            "digit_count": digit_count(c),
            "avg_token_len": avg_token_len(c),
            "stopword_ratio": stopword_ratio(c),
            "quality_score": quality_score(c),
            "fingerprint": fingerprint(c),
        }
    )


# --------------------------------------------------------------- PII
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9() .-]{7,}[0-9]"


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) per row — RE2-compatible patterns (no
    lookarounds) so external engines reproduce them exactly."""
    n_email = F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))).cast("long")
    n_phone = F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), F.lit(0))).cast("long")
    return n_email, n_phone


def scrub_pii(col: Column, email_token: str = "<EMAIL>", phone_token: str = "<PHONE>") -> Column:
    """Replace emails then phone-number-like spans with tokens —
    the standard pre-training redaction pass, pure regexp_replace
    (vectorized, zero Python)."""
    no_email = F.regexp_replace(col, EMAIL_RE, email_token)
    return F.regexp_replace(no_email, PHONE_RE, phone_token)


# ------------------------------------------------- repetition signals
def repetition_signals(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_bigram_frac``: fraction of tokens covered by the single
      most frequent word bigram (2 * max bigram count / token count).
    - ``dup_trigram_frac``: fraction of trigram OCCURRENCES that are
      repeats (1 - distinct/total).

    High values flag boilerplate/spam for pre-training filtering.
    Scale shape: trigram stats are pure per-row expressions; the
    bigram mode needs one (doc, bigram) count + one per-doc max —
    both map-side combinable shuffles on uniform keys. Docs shorter
    than 2 (resp. 3) tokens score 0.0. All arithmetic is int ratios
    divided in double — bit-identical in DuckDB for the oracle."""
    t = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tok = df.select(
        F.col(id_col),
        t.alias("_t"),
        F.size(t).alias("_n"),
    )
    # per-row trigram stats (single reference of each HOF — no inlining risk)
    tri = F.when(
        F.col("_n") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.col("_n") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("_t", i),
                F.element_at("_t", i + 1),
                F.element_at("_t", i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stats = tok.select(
        id_col,
        "_t",
        "_n",
        F.size(tri).alias("_tri_total"),
        F.size(F.array_distinct(tri)).alias("_tri_distinct"),
    )
    # bigram mode via (doc, gram) count -> per-doc max; explode_outer +
    # null-gram sentinel keeps short docs in the output
    bigrams = F.when(
        F.col("_n") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.col("_n") - 1),
            lambda i: F.concat_ws(" ", F.element_at("_t", i), F.element_at("_t", i + 1)),
        ),
    ).otherwise(F.array(F.lit(None).cast("string")))
    g = stats.select(
        id_col, "_n", "_tri_total", "_tri_distinct", F.explode_outer(bigrams).alias("_g")
    )
    per_gram = g.groupBy(id_col, "_g").agg(
        F.count(F.lit(1)).alias("_c"),
        F.first("_n").alias("_n"),
        F.first("_tri_total").alias("_tt"),
        F.first("_tri_distinct").alias("_td"),
    )
    per_doc = per_gram.groupBy(id_col).agg(
        F.coalesce(
            F.max(F.when(F.col("_g").isNotNull(), F.col("_c"))), F.lit(0)
        ).alias("_topc"),
        F.first("_n").alias("_n"),
        F.first("_tt").alias("_tt"),
        F.first("_td").alias("_td"),
    )
    return per_doc.select(
        id_col,
        (
            F.col("_topc") * F.lit(2.0) / F.greatest(F.col("_n"), F.lit(1)).cast("double")
        ).alias("top_bigram_frac"),
        F.when(F.col("_tt") > 0, F.lit(1.0) - F.col("_td") / F.col("_tt").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )


# ---------------------------------------- Gopher composite filter

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al.
    2021, appendix A) as ONE pure-Column pass — the composite filter
    pre-training pipelines run after dedup:

    - word count in [min_words, max_words];
    - mean word length in [3, 10];
    - symbol-to-word ratio ('#' or ellipsis) <= 0.1;
    - < 90% of lines starting with a bullet;
    - <= 30% of lines ending with an ellipsis;
    - >= 80% of words containing an alphabetic character;
    - >= 2 distinct words from a small English stopword list.

    Output: (id, n_words, one boolean per rule, keep = AND of all).
    Zero shuffles (per-row expressions only); every ratio is an
    integer count divided in double, so the DuckDB oracle matches
    bit-for-bit. Null-text docs are dropped."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(text_col).alias("_x"),
        t.alias("_t"),
        F.size(t).alias("_n"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    mean_len = (
        F.aggregate(F.col("_t"), F.lit(0), lambda a, x: a + F.length(x)).cast("double")
        / F.greatest(F.col("_n"), F.lit(1))
    )
    n_symbols = F.length(F.regexp_replace(F.col("_x"), "[^#…]", ""))
    nl = F.greatest(F.size("_lines"), F.lit(1))
    n_bullets = F.size(
        F.filter(
            F.col("_lines"),
            lambda ln: F.trim(ln).startswith("•")
            | F.trim(ln).startswith("-")
            | F.trim(ln).startswith("*"),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            F.col("_lines"),
            lambda ln: F.trim(ln).endswith("…") | F.trim(ln).endswith("..."),
        )
    )
    n_alpha = F.size(F.filter(F.col("_t"), lambda x: x.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(F.col("_t"), F.lower)),
            F.lit(list(GOPHER_STOPWORDS)).cast("array<string>"),
        )
    )
    flags = base.select(
        id_col,
        F.col("_n").cast("long").alias("n_words"),
        ((F.col("_n") >= min_words) & (F.col("_n") <= max_words)).alias("pass_word_count"),
        ((mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)).alias(
            "pass_mean_word_len"
        ),
        (
            n_symbols.cast("double") / F.greatest(F.col("_n"), F.lit(1))
            <= max_symbol_ratio
        ).alias("pass_symbol_ratio"),
        (n_bullets.cast("double") / nl < max_bullet_frac).alias("pass_bullet_lines"),
        (n_ellipsis.cast("double") / nl <= max_ellipsis_frac).alias("pass_ellipsis_lines"),
        (
            n_alpha.cast("double") / F.greatest(F.col("_n"), F.lit(1))
            >= min_alpha_word_frac
        ).alias("pass_alpha_words"),
        (stop_hits >= min_stopwords).alias("pass_stopwords"),
    )
    keep = F.lit(True)
    for c in [
        "pass_word_count",
        "pass_mean_word_len",
        "pass_symbol_ratio",
        "pass_bullet_lines",
        "pass_ellipsis_lines",
        "pass_alpha_words",
        "pass_stopwords",
    ]:
        keep = keep & F.col(c)
    return flags.withColumn("keep", keep)


# ------------------------------------- trained linear quality filter

# Named feature library for `linear_classifier`. Every feature is a
# pure per-row Column expression over the text column producing a
# DOUBLE, built from integer counts divided in double — IEEE-exact, so
# a SQL oracle reproduces each value bit-for-bit. Keep this the single
# source of truth: weights are keyed by these names.
CLASSIFIER_FEATURES: dict[str, object] = {
    # fraction of characters that are ASCII letters or space
    "alpha_ratio": lambda c: alpha_ratio(c),
    # fraction of characters that are digits
    "digit_ratio": lambda c: digit_count(c).cast("double")
    / F.greatest(F.length(c), F.lit(1)),
    # fraction of characters that are symbols (not alnum/space)
    "symbol_ratio": lambda c: F.length(
        F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    ).cast("double")
    / F.greatest(F.length(c), F.lit(1)),
    # English stopword hit rate over whitespace tokens
    "stopword_ratio": lambda c: stopword_ratio(c),
    # mean whitespace-token length
    "avg_token_len": lambda c: avg_token_len(c),
    # doc length saturating at 100 tokens (the Gopher-style size term)
    "length_term": lambda c: F.least(
        token_count(c).cast("double") / F.lit(100.0), F.lit(1.0)
    ),
    # fraction of characters that are UPPERCASE letters
    "upper_ratio": lambda c: F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast(
        "double"
    )
    / F.greatest(F.length(c), F.lit(1)),
}


def linear_classifier(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
    keep_features: bool = False,
) -> DataFrame:
    """Trained linear quality classifier — the model-based document
    filter modern pre-training pipelines run after heuristic rules
    (CCNet's fastText LM filter; DCLM's fastText quality classifier;
    Llama's "quality classifier" pass). The model here is a logistic
    regression over the named engineered features in
    ``CLASSIFIER_FEATURES``; ``weights`` carries the TRAINED
    coefficients (train anywhere — sklearn on a labeled sample — and
    paste the coefficients; inference is what has to run at 100 TB,
    and this makes it a pure column expression).

    Scores only the LOGIT (bias + Σ w_f · feature_f, summed in sorted
    feature order so the double rounding sequence is deterministic)
    and decides ``keep = logit >= threshold``. The sigmoid is strictly
    monotone, so thresholding the logit at t is identical to
    thresholding the probability at sigmoid(t) — and unlike exp(),
    +/* on doubles is bit-portable across engines, which keeps this
    oracle-exact.

    Shape (100 TB): zero shuffle, zero Python — one codegen'd
    projection fused into the scan; the filter pushes into the parquet
    reader when applied before joins.

    Output: input id + (each feature if keep_features) + logit + keep.
    """
    unknown = sorted(set(weights) - set(CLASSIFIER_FEATURES))
    if unknown:
        raise ValueError(
            f"unknown classifier features {unknown}; "
            f"known: {sorted(CLASSIFIER_FEATURES)}"
        )
    c = F.col(text_col)
    feats = {name: CLASSIFIER_FEATURES[name](c) for name in sorted(weights)}
    logit = F.lit(float(bias))
    for name in sorted(weights):
        logit = logit + F.lit(float(weights[name])) * feats[name]
    cols = [F.col(id_col)]
    if keep_features:
        cols += [feats[n].alias(n) for n in sorted(weights)]
    return df.select(
        *cols,
        logit.alias("logit"),
        (logit >= F.lit(float(threshold))).alias("keep"),
    )


# ------------------------------------- unicode normalization

# C0 controls (minus \t \n \r, which are legitimate whitespace) + DEL.
# Explicit \xNN ranges: the same class compiles identically under
# Java regex (Spark) and RE2 (DuckDB).
CONTROL_CHARS_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def strip_control_chars(col: Column) -> Column:
    """Remove C0 control characters and DEL (keep tab/newline/CR) —
    the crawl-text hygiene pass before tokenization. Pure
    regexp_replace, zero shuffle, oracle-portable."""
    return F.regexp_replace(col, CONTROL_CHARS_RE, "")


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization — canonical composition so that
    'e' + COMBINING ACUTE and the precomposed 'é' (etc.) are the SAME
    string before hashing/dedup/tokenization; without it, exact and
    MinHash dedup silently miss byte-different equal-text duplicates.
    Spark has no native normalizer, so this is an Arrow-batched
    pandas UDF over `unicodedata.normalize` — the one Python hop in
    the text-hygiene path (NFC is a per-row pure function; at 100 TB
    it's map-side, no shuffle). DuckDB's `nfc_normalize` implements
    the same UCD algorithm, so results are oracle-exact."""
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(col)
