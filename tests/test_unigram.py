"""Unigram-LM (SentencePiece-style) tokenizer: Viterbi core vs brute
force, distributed fit pinned bit-identical to the local twin, the
DuckDB oracle DP pinned against the Python core, encode plumbing,
and versioned persistence."""

import itertools

import pytest

from malstrom_spark.functions import unigram as ug


def _brute_best(word, scores, max_piece_len, max_word_chars):
    """Enumerate every segmentation; return the best by
    (score, longer-pieces-earlier...) — specifically the max score,
    ties broken exactly like the DP: compare segmentations by their
    piece lengths from the END, longer last piece first."""
    if len(word) > max_word_chars:
        return [word]
    n = len(word)
    best = None
    # all compositions of n
    for cuts in itertools.product([0, 1], repeat=n - 1) if n > 1 else [()]:
        pieces, start = [], 0
        for i, c in enumerate(cuts, start=1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        if any(len(p) > max_piece_len for p in pieces):
            continue
        sc = 0
        ok = True
        for p in pieces:
            ps = scores.get(p)
            if ps is None:
                if len(p) != 1:
                    ok = False
                    break
                ps = ug.UNK_SCORE
            sc += ps
        if not ok:
            continue
        # the DP's effective tie order: score, then at each suffix
        # boundary the longer last piece. Encode as (score, lengths
        # reversed) lexicographic.
        key = (sc, tuple(len(p) for p in reversed(pieces)))
        if best is None or key > best[0]:
            best = (key, pieces)
    assert best is not None  # single-char fallback always exists
    return best[1]


def test_viterbi_matches_brute_force():
    scores = {
        "ab": -1_000_000, "b": -2_000_000, "a": -2_500_000,
        "abc": -2_900_000, "c": -3_000_000, "bc": -1_500_000,
        "abab": -3_500_000,
    }
    for word in ["abab", "ababc", "abcabc", "aaaa", "bcbc", "xaybz",
                 "abcx", "cab", "b", "x", "abababab"]:
        got = ug.viterbi_word(word, scores, 4, 16)
        want = _brute_best(word, scores, 4, 16)
        assert got == want, (word, got, want)
        assert "".join(got) == word  # coverage: pieces respell word


def test_viterbi_long_word_bypass_and_empty():
    scores = {"a": -1}
    assert ug.viterbi_word("", scores, 4, 8) == []
    w = "a" * 9
    assert ug.viterbi_word(w, scores, 4, 8) == [w]  # whole, one piece
    assert ug.viterbi_word("a" * 8, scores, 4, 8) == ["a"] * 8


def test_local_fit_learns_frequent_pieces():
    wc = {"spark": 50, "sparks": 20, "park": 30, "dark": 10, "s": 5}
    m = ug.unigram_fit_local(wc, vocab_size=24, n_iters=3,
                             max_piece_len=5, max_word_chars=16)
    assert isinstance(m, ug.UnigramModel)
    # frequent substrings become pieces and win segmentation
    toks = ug.viterbi_word("spark", m.scores, m.max_piece_len,
                           m.max_word_chars)
    assert len(toks) <= 2  # not char-by-char
    # all scores are negative quantized ints
    assert all(isinstance(s, int) and s < 0 for s in m.scores.values())
    # coverage: every char of the corpus is a piece
    for ch in set("".join(wc)):
        assert ch in m.scores


def test_distributed_fit_bit_identical_to_local(spark):
    wc = {"stream": 9, "streams": 4, "streaming": 3, "streamer": 2,
          "dream": 5, "dreams": 2, "beam": 4, "team": 3, "a": 7}
    df = spark.createDataFrame(
        [(" ".join([w] * c),) for w, c in sorted(wc.items())],
        "text string",
    )
    dist = ug.unigram_fit(df, "text", vocab_size=32, n_iters=3,
                          max_piece_len=5, max_word_chars=16,
                          seed_size=256)
    local = ug.unigram_fit_local(wc, vocab_size=32, n_iters=3,
                                 max_piece_len=5, max_word_chars=16,
                                 seed_size=256)
    assert dist.scores == local.scores  # bit-identical (integer EM)


def test_oracle_viterbi_sql_matches_python():
    """The unrolled DuckDB DP produces the SAME segmentation as
    viterbi_word for every word, including UNK chars, ties, and the
    long-word bypass."""
    import duckdb

    wc = {"spark": 50, "sparks": 20, "park": 30, "dark": 10}
    m = ug.unigram_fit_local(wc, vocab_size=24, n_iters=2,
                             max_piece_len=4, max_word_chars=8)
    words = ["spark", "sparks", "park", "dark", "sparkle", "zzz",
             "s", "parkpark", "a" * 9]
    q = f"""
    WITH words AS (
      SELECT unnest({words!r}) AS word
    ),
    v(piece, ps) AS (VALUES {ug.unigram_sql_values(m)}),
    {ug.viterbi_sql_steps(m)}
    SELECT word, toks FROM seg ORDER BY word
    """
    got = {w: list(t) for w, t in duckdb.sql(q).fetchall()}
    for w in words:
        want = ug.viterbi_word(w, m.scores, m.max_piece_len,
                               m.max_word_chars)
        assert got[w] == want, (w, got[w], want)


def test_unigram_encode_plumbing(spark):
    m = ug.UnigramModel(
        {"ab": -1_000_000, "a": -2_000_000, "b": -2_000_000,
         "c": -3_000_000},
        max_piece_len=2, max_word_chars=8,
    )
    df = spark.createDataFrame(
        [(1, "abab c"), (2, None), (3, "   "), (4, "ab zq")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.unigram_tokens
           for r in ug.unigram_encode(df, "text", m).collect()}
    assert got[1] == ["ab", "ab", "c"]
    assert got[2] is None
    assert got[3] == []
    assert got[4] == ["ab", "z", "q"]  # z,q: UNK single chars


def test_unigram_save_load_roundtrip_and_validation(spark):
    m = ug.UnigramModel({"ab": -5, "a": -9, "b": -11}, 2, 8)
    ug.unigram_save(spark, m, "uni_test_model")
    back = ug.unigram_load(spark, "uni_test_model")
    assert back == m
    with pytest.raises(ValueError, match="empty"):
        ug.unigram_save(spark, ug.UnigramModel({}, 2, 8), "uni_bad")
    # corrupt version is refused (orphan-clear: a killed earlier run
    # may have left the location without a catalog entry)
    spark.sql("DROP TABLE IF EXISTS uni_badver")
    ug._clear_orphaned_location(spark, "uni_badver")
    spark.createDataFrame(
        [("a", -9, 2, 8, 999)],
        "piece string, score long, max_piece_len int, "
        "max_word_chars int, format_version int",
    ).write.mode("overwrite").format("parquet").saveAsTable("uni_badver")
    with pytest.raises(ValueError, match="format_version"):
        ug.unigram_load(spark, "uni_badver")
