"""BPE tokenizer: trainer determinism, encode equivalence with the
classic priority algorithm, distributed fit == driver core, ids."""

from pyspark.sql import functions as F

from malstrom_spark.functions.bpe import (
    EOW,
    _merge_word,
    bpe_encode,
    bpe_fit,
    bpe_token_ids,
    bpe_vocab,
    encode_word,
    merges_sql_values,
    train_merges,
)


def _encode_priority(word, merges):
    """Reference encoder: repeatedly merge ALL leftmost-nonoverlapping
    occurrences of the lowest-rank pair present (the classic BPE
    apply loop) — the semantics encode_word must reproduce."""
    ranks = {p: i for i, p in enumerate(merges)}
    sym = tuple(list(word) + [EOW])
    while True:
        present = {(sym[i], sym[i + 1]) for i in range(len(sym) - 1)}
        ranked = [(ranks[p], p) for p in present if p in ranks]
        if not ranked:
            return list(sym)
        _, (a, b) = min(ranked)
        sym = _merge_word(sym, a, b, a + b)


def test_trainer_learns_expected_merges():
    # 'low' x10, 'lower' x4: most frequent pair is (o, w) then
    # (lo-ish chains); just pin determinism + shape on a known corpus
    counts = {"low": 10, "lower": 4, "newest": 6, "widest": 3}
    merges = train_merges(counts, 8)
    assert len(merges) == 8
    # first merge: highest-count adjacent pair; (l,o) and (o,w) both
    # occur 14x; tie breaks lexicographically -> (l, o)
    assert merges[0] == ("l", "o")
    # deterministic under dict-order permutation
    import random

    items = list(counts.items())
    random.Random(3).shuffle(items)
    assert train_merges(dict(items), 8) == merges


def test_trainer_stops_when_exhausted():
    merges = train_merges({"ab": 3}, 100)
    # only pairs: (a,b), (b,EOW), then merged results chain: finite
    assert 0 < len(merges) < 100
    # fully merged: the single word encodes to one token
    assert encode_word("ab", merges) == ["ab" + EOW]


def test_encode_word_matches_priority_algorithm_property():
    """The in-order replace fold (what the SQL oracle runs) must equal
    the priority-queue encoder for any train_merges-produced list —
    the equivalence the module doc claims."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words_st = st.text(alphabet="abcdr", min_size=1, max_size=8)

    @settings(max_examples=150, deadline=None)
    @given(
        corpus=st.dictionaries(
            words_st, st.integers(1, 20), min_size=1, max_size=12
        ),
        query=words_st,
        n_merges=st.integers(0, 25),
    )
    def prop(corpus, query, n_merges):
        merges = train_merges(corpus, n_merges)
        got = encode_word(query, merges)
        assert got == _encode_priority(query, merges)
        # lossless: concatenating tokens restores word + EOW
        assert "".join(got) == query + EOW

    prop()


def test_repeated_char_runs_merge_leftmost():
    # 'aaa' with merge (a,a) must give [aa, a...] not overlap
    merges = train_merges({"aaaa": 5}, 1)
    assert merges == [("a", "a")]
    assert encode_word("aaa", merges) == ["aa", "a", EOW]
    assert encode_word("aaaa", merges) == ["aa", "aa", EOW]


def test_distributed_fit_equals_core(spark):
    rows = [("low low lower newest",), ("newest newest widest low",), (None,)]
    df = spark.createDataFrame(rows, "text string").repartition(4)
    got = bpe_fit(df, "text", n_merges=10)
    want = train_merges({"low": 3, "lower": 1, "newest": 3, "widest": 1}, 10)
    assert got == want


def test_distributed_fit_max_words_cap(spark):
    # cap to top-1 word type: merges derive from 'aaa' only
    df = spark.createDataFrame(
        [("aaa aaa aaa bcd",)], "text string"
    )
    got = bpe_fit(df, "text", n_merges=2, max_words=1)
    assert got == train_merges({"aaa": 3}, 2)


def test_bpe_encode_dataframe(spark):
    merges = train_merges({"low": 10, "lower": 5}, 6)
    df = spark.createDataFrame(
        [(1, "low lower"), (2, ""), (3, None), (4, "  low  ")],
        "id int, text string",
    )
    out = {
        r.id: r.bpe_tokens
        for r in bpe_encode(df, "text", merges).collect()
    }
    assert out[1] == encode_word("low", merges) + encode_word("lower", merges)
    assert out[2] == []
    assert out[3] is None
    assert out[4] == encode_word("low", merges)


def test_vocab_and_ids(spark):
    merges = train_merges({"low": 10, "lower": 5}, 4)
    vocab = bpe_vocab(merges, base_chars="lower")
    assert vocab[EOW] == 0
    assert len(set(vocab.values())) == len(vocab)
    df = spark.createDataFrame([(1, "low zzz")], "id int, text string")
    enc = bpe_encode(df, "text", merges)
    ids = enc.select(
        bpe_token_ids(F.col("bpe_tokens"), vocab).alias("ids"),
        "bpe_tokens",
    ).collect()[0]
    rev = {i: t for t, i in vocab.items()}
    for tok, i in zip(ids.bpe_tokens, ids.ids):
        if i == -1:
            assert tok not in vocab  # oov char from 'zzz'
        else:
            assert rev[i] == tok


def test_merges_sql_values_quoting():
    s = merges_sql_values([("a", "'")])
    assert s == "(1, ' a  '' ', ' a'' ')"


def test_bpe_feeds_token_budgeted_operators(spark):
    """The integration the tokenizer exists for: budget pack_sequences
    and chunk_text in BPE tokens instead of whitespace words."""
    from malstrom_spark.functions.corpus import chunk_text, pack_sequences
    from malstrom_spark.functions.bpe import bpe_encode, bpe_fit

    df = spark.createDataFrame(
        [(i, "low lower newest widest low low") for i in range(20)],
        "doc_id int, text string",
    )
    merges = bpe_fit(df, "text", n_merges=12)
    enc = bpe_encode(df, "text", merges).withColumn(
        "n_bpe", F.size("bpe_tokens").cast("long")
    )
    n_bpe = enc.select("n_bpe").collect()[0].n_bpe
    assert n_bpe > 6  # subword: more tokens than the 6 words

    packed = pack_sequences(enc, "doc_id", "n_bpe", seq_len=32, n_shards=4)
    rows = packed.collect()
    assert len(rows) == 20
    # offsets advance by the BPE count, not the word count
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        prev = by_shard.get(r.shard, 0)
        assert (r.seq_id * 32 + r.start_offset) == prev
        by_shard[r.shard] = prev + n_bpe

    chunks = chunk_text(
        enc, "doc_id", max_tokens=5, overlap=1, tokens_col="bpe_tokens"
    )
    one = [r for r in chunks.collect() if r.doc_id == 0]
    toks = enc.where(F.col("doc_id") == 0).collect()[0].bpe_tokens
    # chunks tile the BPE token sequence with the given overlap
    assert one[0].chunk == " ".join(toks[:5])
    assert one[1].chunk == " ".join(toks[4:9])
    assert sum(r.n_tokens for r in one) >= len(toks)


def test_bpe_save_load_roundtrip_and_validation(spark):
    import pytest

    """Persistence (round 9): the merge table round-trips exactly,
    loaded merges encode identically to in-memory ones, and corrupt
    tables (bad version, gapped ranks, empty) fail loudly instead of
    silently tokenizing differently."""
    from malstrom_spark.functions import bpe

    df = spark.createDataFrame(
        [(1, "low lower lowest new newest low low")],
        "id long, text string")
    merges = bpe.bpe_fit(df, "text", n_merges=20)
    try:
        bpe.bpe_save(spark, merges, "bpe_merges_test_rt")
        loaded = bpe.bpe_load(spark, "bpe_merges_test_rt")
        assert loaded == merges

        a = bpe.bpe_encode(df, "text", merges).collect()[0]["bpe_tokens"]
        b = bpe.bpe_encode(df, "text", loaded).collect()[0]["bpe_tokens"]
        assert a == b

        with pytest.raises(ValueError, match="empty merge list"):
            bpe.bpe_save(spark, [], "bpe_merges_test_empty")

        spark.sql("DROP TABLE IF EXISTS bpe_merges_test_gap")
        spark.createDataFrame(
            [(1, "a", "b", 1), (3, "c", "d", 1)],
            "rank int, left string, right string, format_version int",
        ).write.mode("overwrite").format("parquet").saveAsTable(
            "bpe_merges_test_gap")
        with pytest.raises(ValueError, match="contiguous"):
            bpe.bpe_load(spark, "bpe_merges_test_gap")
    finally:
        spark.sql("DROP TABLE IF EXISTS bpe_merges_test_rt")
        spark.sql("DROP TABLE IF EXISTS bpe_merges_test_gap")
