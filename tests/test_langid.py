"""Trained char-n-gram language ID: fit parity, classification,
integer-exactness properties."""

from pyspark.sql import functions as F

from malstrom_spark.functions.langid import (
    fit_from_counts,
    fit_ngram_lang_id,
    fit_ngram_lang_id_local,
    lang_id,
    lang_scores,
)

CORPUS = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "this is a simple english sentence with common words",
    ],
    "es": [
        "el rapido zorro marron salta sobre el perro perezoso",
        "esta es una frase sencilla con palabras comunes",
    ],
    "de": [
        "der schnelle braune fuchs springt uber den faulen hund",
        "dies ist ein einfacher satz mit haufigen wortern",
    ],
}


def test_distributed_fit_equals_local(spark):
    rows = [(lang, s) for lang, ss in sorted(CORPUS.items()) for s in ss]
    df = spark.createDataFrame(rows, "lang string, text string").repartition(4)
    dist = fit_ngram_lang_id(df, "text", "lang", n=2, top_grams=64)
    local = fit_ngram_lang_id_local(CORPUS, n=2, top_grams=64)
    assert dist == local


def test_classifies_unseen_sentences(spark):
    model = fit_ngram_lang_id_local(CORPUS, n=2)
    tests = [
        ("the cat sat on the mat and looked out of the window", "en"),
        ("el gato esta sobre la mesa y mira por la ventana", "es"),
        ("die katze sitzt auf dem tisch und schaut aus dem fenster", "de"),
    ]
    df = spark.createDataFrame(tests, "text string, want string")
    got = df.select(
        "want", lang_id(F.col("text"), model).alias("pred")
    ).collect()
    for r in got:
        assert r.pred == r.want, (r.want, r.pred)


def test_null_and_short_text_is_und(spark):
    model = fit_ngram_lang_id_local(CORPUS, n=2)
    df = spark.createDataFrame([(None,), ("",), ("x",)], "text string")
    got = [r.p for r in df.select(lang_id(F.col("text"), model).alias("p")).collect()]
    assert got == ["und", "und", "und"]


def test_scores_are_integer_exact(spark):
    """The portability claim: scores are int64, reproducible by plain
    Python over the same integer weight table."""
    model = fit_ngram_lang_id_local(CORPUS, n=2)
    text = "the quick brown cat"
    df = spark.createDataFrame([(text,)], "text string")
    cols = lang_scores(F.col("text"), model)
    row = df.select(
        *[c.alias(lang) for lang, c in cols.items()]
    ).collect()[0]
    import re

    s = re.sub(r"\s+", " ", text.lower()).strip()
    for lang in model.langs:
        want = model.prior[lang] + sum(
            model.weights[lang].get(s[i : i + 2], model.oov[lang])
            for i in range(len(s) - 1)
        )
        assert row[lang] == want


def test_fit_from_counts_empty_raises():
    import pytest

    with pytest.raises(ValueError, match="empty"):
        fit_from_counts({}, 2)


def test_lang_id_is_shuffle_free(spark):
    model = fit_ngram_lang_id_local(CORPUS, n=2, top_grams=32)
    df = spark.createDataFrame([("hello there",)] * 3, "text string")
    plan = (
        df.select(lang_id(F.col("text"), model))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_agreement_with_heuristic_on_documents(spark):
    """Both identifiers agree on clearly-English text; the trained
    model additionally separates the seeded es/de/fr sentences the
    marker heuristic has no markers for (numbers booked in
    BASELINE.md round-8)."""
    from malstrom_spark.functions.text import lang_guess

    model = fit_ngram_lang_id_local(CORPUS, n=2)
    df = spark.createDataFrame(
        [("the data table is fast and the query is simple",)],
        "text string",
    )
    r = df.select(
        lang_id(F.col("text"), model).alias("trained"),
        lang_guess(F.col("text")).alias("heur"),
    ).collect()[0]
    assert r.trained == "en" and r.heur == "en"


def test_lang_id_arrow_matches_column_form(spark):
    """The Arrow production scorer is bit-identical to the pure-Column
    lang_id on the gate model — including NULLs, too-short texts,
    NBSP/whitespace edge cases, and tie-break order."""
    from malstrom_spark.functions import langid as L
    from malstrom_spark.queries.pipeline import (
        _LANGID_SENTENCES, _LANGID_TOP_GRAMS,
    )

    model = L.fit_ngram_lang_id_local(
        _LANGID_SENTENCES, n=2, top_grams=_LANGID_TOP_GRAMS
    )
    texts = [s for sents in _LANGID_SENTENCES.values() for s in sents]
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [
        (900, None), (901, ""), (902, "x"),          # und paths
        (903, "  le chat  est\tsur le tapis  "),      # ws collapse
        (904, "der hund ist hier"),              # NBSP survives
        (905, "THE CAT SAT ON THE MAT"),              # lower()
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    col = {r.id: r.p for r in df.select(
        "id", L.lang_id(F.col("text"), model).alias("p")).collect()}
    arrow = {r.id: r.lang_pred for r in L.lang_id_arrow(
        df, "text", model).collect()}
    assert col == arrow
    assert col[900] == "und" and col[902] == "und"
