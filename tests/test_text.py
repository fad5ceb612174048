"""Text-analysis golden tests: counts/ratios/lang-ID/fingerprint."""

import pyspark.sql.functions as F

from malstrom_spark.functions import text


def test_text_stats_golden(spark):
    df = spark.createDataFrame([(1, "Hello world 123 !!")], "id long, text string")
    row = text.with_text_stats(df).collect()[0]
    assert row.token_count == 4
    assert row.char_count == 18
    assert row.digit_count == 3
    assert abs(row.alpha_ratio - 13 / 18) < 1e-9  # letters+spaces kept
    assert len(row.fingerprint) == 32


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "id long, text string",
    )
    fps = [r.fp for r in df.select(text.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_lang_guess(spark):
    rows = [
        (1, "the cat is in the house and the dog is here"),
        (2, "el perro y la casa de los gatos en que vivo"),
        (3, "der hund und die katze ist ein tier nicht wahr"),
        (4, "zzz qqq www"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.g for r in df.select("id", text.lang_guess(F.col("text")).alias("g")).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [(1, "a good normal sentence with several reasonable words"), (2, "x")],
        "id long, text string",
    )
    got = {r.id: r.q for r in df.select("id", text.quality_score(F.col("text")).alias("q")).collect()}
    assert 0.0 <= got[2] < got[1] <= 1.0


def test_repetition_signals(spark):
    from malstrom_spark.functions.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),            # one bigram 3x, all trigrams dup
            (1, "all words here are different ok"),
            (2, "tiny"),                            # <2 tokens -> both 0.0
            (3, "a b"),                             # 1 bigram, no trigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.top_bigram_frac, r.dup_trigram_frac)
           for r in repetition_signals(docs, "doc_id").collect()}
    assert got[0] == (2 * 3 / 4, 1 - 1 / 2)  # 'spam spam' x3; 2 trigrams, 1 distinct
    assert got[1] == (2 * 1 / 6, 0.0)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (2 * 1 / 2, 0.0)


# ---------------------------------------- Gopher composite filter


def test_gopher_filter_rules(spark):
    from malstrom_spark.functions.text import gopher_filter

    good = (
        "the quick brown fox jumps over that lazy dog and all of them have "
        "plenty to be doing with their friends today because the weather is "
        "lovely and everyone would like to spend the afternoon outside in "
        "the big sunny garden near the old stone wall by the river path"
    )
    rows = [
        (1, good),                                     # passes everything
        (2, "too short to pass."),                     # word count
        (3, good + " " + "# " * 40),                   # symbol ratio
        (4, good + ("\n- b" * 60)),                    # bullet lines > 90%
        (5, good + "\nwait...\nmore...\nyes...\nno..." * 3),  # ellipsis
        (6, " ".join(["12345"] * 60)),                 # no alpha, no stopwords
        (7, None),                                     # dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_filter(df, "doc_id").collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert got[1].keep
    assert not got[2].pass_word_count and not got[2].keep
    assert not got[3].pass_symbol_ratio and not got[3].keep
    assert not got[4].pass_bullet_lines and not got[4].keep
    assert not got[5].pass_ellipsis_lines and not got[5].keep
    assert not got[6].pass_alpha_words and not got[6].pass_stopwords


def test_linear_classifier_scores_and_threshold(spark):
    from malstrom_spark.functions.text import linear_classifier

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog in a field of green"),
            (2, "000 111 222 333 444 555 666 777 888 999"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    w = {"alpha_ratio": 2.0, "digit_ratio": -4.0, "stopword_ratio": 3.0}
    out = linear_classifier(
        df.where(F.col("text").isNotNull()), "doc_id", w, bias=-1.0
    )
    assert out.columns == ["doc_id", "logit", "keep"]
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 2}
    # prose doc: high alpha + stopwords -> positive logit; digit doc:
    # digit penalty dominates -> negative
    assert got[1].logit > 0 and got[1].keep
    assert got[2].logit < 0 and not got[2].keep
    # keep is exactly logit >= threshold (sigmoid-monotone equivalence)
    out2 = linear_classifier(
        df.where(F.col("text").isNotNull()), "doc_id", w, bias=-1.0,
        threshold=got[1].logit,
    )
    got2 = {r.doc_id: r.keep for r in out2.collect()}
    assert got2 == {1: True, 2: False}


def test_linear_classifier_feature_columns_and_validation(spark):
    import pytest as _pytest

    from malstrom_spark.functions.text import linear_classifier

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = linear_classifier(
        df, "doc_id", {"length_term": 1.0, "alpha_ratio": 1.0}, keep_features=True
    )
    # feature columns surface in sorted order between id and logit
    assert out.columns == ["doc_id", "alpha_ratio", "length_term", "logit", "keep"]
    r = out.collect()[0]
    assert abs(r.logit - (r.alpha_ratio + r.length_term)) < 1e-12
    with _pytest.raises(ValueError, match="unknown classifier features"):
        linear_classifier(df, "doc_id", {"nope": 1.0})


def test_nfc_normalize_and_strip_controls(spark):
    from malstrom_spark.functions.text import nfc_normalize, strip_control_chars

    df = spark.createDataFrame(
        [
            (1, "cafe\u0301 ok"),  # decomposed: len 8 -> composed len 7
            (2, "a\x01b\x7fc\td"),      # controls stripped, tab kept
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.v
        for r in df.select(
            "doc_id",
            nfc_normalize(strip_control_chars(F.col("text"))).alias("v"),
        ).collect()
    }
    assert out[1] == "caf\u00e9 ok" and len(out[1]) == 7
    assert out[2] == "abc\td"
    assert out[3] is None
