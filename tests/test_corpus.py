"""Corpus-assembly operators: C4 line cleaning rules, concat-and-chunk
sequence packing arithmetic, deterministic stratified sampling."""

import pytest
from pyspark.sql import functions as F

from malstrom_spark.functions import corpus


def test_clean_lines_rules(spark):
    rows = [
        # kept sentence + dropped short + dropped javascript line
        (0, 'A perfectly good sentence stays right here.\nno\nPlease enable javascript to continue.'),
        # page-level marker: whole doc dropped
        (1, "Fine sentence here too.\nlorem ipsum dolor sit amet."),
        (2, "Brace { means template junk.\nAnother fine sentence survives."),
        # all lines fail -> doc dropped (n_kept = 0)
        (3, "no punctuation here\nstill none"),
        # question/quote terminals count
        (4, 'Is this a kept question?\nShe said "keep this quote."'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in corpus.clean_lines(df, "doc_id").collect()}
    assert set(out) == {0, 4}
    assert out[0].n_lines == 3 and out[0].n_kept == 1
    assert out[0].cleaned == "A perfectly good sentence stays right here."
    assert out[4].n_kept == 2


def test_pack_sequences_arithmetic(spark):
    """Single shard, known token counts: docs at offsets 0/1000/2500
    with seq_len 2048 — second doc crosses the 2048 boundary, third
    starts in sequence 1."""
    rows = [(0, 1000), (1, 1500), (2, 600), (3, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r.doc_id: r
        for r in corpus.pack_sequences(
            df, "doc_id", "n_tokens", seq_len=2048, n_shards=1
        ).collect()
    }
    assert [out[i].shard for i in range(4)] == [0, 0, 0, 0]
    # doc0: [0,1000) -> seq 0; doc1: [1000,2500) crosses; doc2: [2500,3100) seq 1
    assert (out[0].seq_id, out[0].start_offset, out[0].crosses_boundary) == (0, 0, False)
    assert (out[1].seq_id, out[1].start_offset, out[1].crosses_boundary) == (0, 1000, True)
    assert (out[2].seq_id, out[2].start_offset, out[2].crosses_boundary) == (1, 452, False)
    # zero-token doc never "crosses"
    assert out[3].crosses_boundary is False


def test_pack_sequences_shard_independence(spark):
    """Every doc appears exactly once and each shard's packing is
    internally gapless: offsets within a shard reconstruct the shard's
    cumulative layout."""
    df = spark.createDataFrame(
        [(i, 10 + (i % 7) * 13) for i in range(200)], "doc_id long, n_tokens long"
    )
    out = corpus.pack_sequences(df, "doc_id", "n_tokens", seq_len=64, n_shards=4)
    rows = out.collect()
    assert len(rows) == 200
    starts = {
        r.doc_id: r.seq_id * 64 + r.start_offset for r in rows
    }
    toks = {i: 10 + (i % 7) * 13 for i in range(200)}
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.doc_id)
    for ids in by_shard.values():
        acc = 0
        for d in sorted(ids):
            assert starts[d] == acc, "gap or overlap in shard layout"
            acc += toks[d]


def test_sample_stratified_deterministic_and_proportional(spark):
    df = spark.createDataFrame(
        [(i, ["en", "es", "xx"][i % 3]) for i in range(3000)], "k long, lang string"
    )
    kept = corpus.sample_stratified(
        df, "lang", "k", rates={"en": 1.0, "es": 0.5}, portable=True
    )
    rows = [(r.k, r.lang) for r in kept.collect()]
    # deterministic: identical on rerun
    assert rows == [(r.k, r.lang) for r in kept.collect()]
    by_lang: dict = {}
    for _, lang in rows:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    assert by_lang.get("xx", 0) == 0  # default rate drops unknown strata
    assert by_lang["en"] == 1000  # rate 1.0 keeps everything
    assert by_lang["es"] == pytest.approx(500, abs=60)  # hash-uniform half
    # scale (xxhash) path: same proportions, different (but valid) cut
    kept_scale = corpus.sample_stratified(
        df, "lang", "k", rates={"en": 1.0, "es": 0.5}, portable=False
    )
    n_es = kept_scale.where(F.col("lang") == "es").count()
    assert n_es == pytest.approx(500, abs=60)


def test_rare_token_rate(spark):
    """Vocabulary cutoff and per-doc occurrence counting: with
    vocab_k=2 the two highest-doc-frequency tokens are in-vocab
    (ties by token string); everything else counts as rare."""
    rows = [
        (0, "common common words here"),
        (1, "common words again"),
        (2, "common words"),
        (3, "zzz qqq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # doc freq: common=3, words=3, here=1, again=1, zzz=1, qqq=1
    out = {r.doc_id: r for r in
           corpus.rare_token_rate(df, "doc_id", vocab_k=2).collect()}
    assert (out[0].n_tokens, out[0].n_rare) == (4, 1)   # 'here' rare; dup 'common' occurrences both counted
    assert (out[1].n_tokens, out[1].n_rare) == (3, 1)
    assert (out[2].n_tokens, out[2].n_rare) == (2, 0)
    assert (out[3].n_tokens, out[3].n_rare) == (2, 2)
    assert out[3].rare_rate == 1.0


# ---------------------------------------- cross-doc paragraph dedup


def test_dedup_paragraphs_first_occurrence_wins(spark):
    from malstrom_spark.functions.corpus import dedup_paragraphs

    sep = "\n\n"
    rows = [
        (1, sep.join(["alpha body one.", "SHARED FOOTER", "unique one."])),
        (2, sep.join(["beta body two.", "SHARED FOOTER", "unique two."])),
        (3, "SHARED FOOTER"),           # all paras duplicate -> dropped
        (4, sep.join(["   ", "gamma."])),  # blank paragraph ignored
        (5, None),                       # null text -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_paragraphs(df, "doc_id").collect()}
    assert set(got) == {1, 2, 4}
    assert got[1].n_paras == 3 and got[1].n_kept == 3
    assert got[1].cleaned == sep.join(["alpha body one.", "SHARED FOOTER", "unique one."])
    # doc 2 loses the footer, keeps order
    assert got[2].n_paras == 3 and got[2].n_kept == 2
    assert got[2].cleaned == sep.join(["beta body two.", "unique two."])
    assert got[4].n_paras == 1 and got[4].n_kept == 1 and got[4].cleaned == "gamma."


def test_dedup_paragraphs_registry_matches_oracle(spark, sf_dir):
    """Exact cross-check of the registered query against its DuckDB
    oracle at the test scale factor (same check oracle_check.py runs)."""
    import duckdb

    from malstrom_spark.queries import full_registry

    spec = full_registry()["doc_paragraph_dedup"]
    got = {
        (r.doc_id, r.n_paras, r.n_kept, r.cleaned)
        for r in spec.fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    for t in ["documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = set(map(tuple, con.execute(spec.oracle).fetchall()))
    assert got == want and len(got) > 0


# ------------------------------------- bigram-LM surprisal scoring


def test_lm_surprisal_hand_checked(spark):
    """Whole-bit surprisal on a corpus small enough to verify by hand:
    4 'a b' bigrams + 1 'b c' + 1 'c a' => totals 6. floor(log2(6/4))=0
    for 'a b', floor(log2(6/1))=2 for the rest; an unseen bigram backs
    off to the unigram table (+4 bits); an OOV token costs 24."""
    from malstrom_spark.functions.corpus import fit_bigram_lm, lm_surprisal

    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c a b")], "doc_id long, text string"
    )
    uni, bi = fit_bigram_lm(ref, top_bigrams=10, top_unigrams=10)
    # score: doc 10 all known bigrams; doc 11 has unseen bigram 'c c'
    # (backoff: unigram c cnt=1 of 9 -> 4 + floor(log2(9)) = 4+3);
    # doc 12 has OOV token 'zzz' (24 bits)
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "c c"), (12, "a zzz")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm_surprisal(docs, "doc_id", uni, bi).collect()}
    assert got[10].n_bigrams == 1 and got[10].sum_bits == 0   # 'a b': 4/6
    assert got[11].sum_bits == 4 + 3                          # backoff c
    assert got[12].sum_bits == 24                             # OOV
    assert got[11].mean_bits == 7.0


def test_lm_surprisal_short_docs_excluded(spark):
    from malstrom_spark.functions.corpus import fit_bigram_lm, lm_surprisal

    ref = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    uni, bi = fit_bigram_lm(ref)
    docs = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None), (4, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id for r in lm_surprisal(docs, "doc_id", uni, bi).collect()}
    assert got == {4}  # <2 tokens / empty / null emit nothing


# ----------------------------------------------- per-source caps


def test_cap_per_key(spark):
    from malstrom_spark.functions.corpus import cap_per_key

    rows = [(i, "a" if i < 8 else "b", 100 - i) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = cap_per_key(df, ["source"], 3, [F.desc("n_chars"), F.asc("doc_id")])
    got = {r.source: sorted(rr.doc_id for rr in out.collect() if rr.source == r.source)
           for r in out.select("source").distinct().collect()}
    # longest-first: source a keeps docs 0,1,2 (n_chars 100,99,98);
    # source b has only 4 docs, keeps its top 3 (8,9,10)
    assert got == {"a": [0, 1, 2], "b": [8, 9, 10]}


def test_upsample_by_weight_semantics(spark):
    """Integer weights repeat exactly; zero drops; fractional weights
    hit the expected proportion via the deterministic hash coin; the
    draw is stable across partitionings (pure function of id+seed)."""
    from malstrom_spark.functions.corpus import upsample_by_weight

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    tripled = upsample_by_weight(df, "doc_id", F.lit(3.0))
    assert tripled.count() == 3000
    assert tripled.groupBy("doc_id").count().where("count != 3").count() == 0
    assert {r.copy_idx for r in tripled.where("doc_id = 5").collect()} == {0, 1, 2}

    assert upsample_by_weight(df, "doc_id", F.lit(0.0)).count() == 0

    frac = upsample_by_weight(df, "doc_id", F.lit(1.5), seed=3)
    n = frac.count()
    assert 1350 <= n <= 1650  # ~1500 expected, hash-uniform coin

    # determinism: same ids, different partitioning, identical draws
    again = upsample_by_weight(df.repartition(17), "doc_id", F.lit(1.5), seed=3)
    a = {(r.doc_id, r.copy_idx) for r in frac.collect()}
    b = {(r.doc_id, r.copy_idx) for r in again.collect()}
    assert a == b

    # portable twin draws may differ from xxhash but obey the same law
    p = upsample_by_weight(df, "doc_id", F.lit(1.5), seed=3, portable=True)
    assert 1350 <= p.count() <= 1650


def test_upsample_by_weight_no_shuffle(spark):
    """The mixing primitive must be map-side: no Exchange in the plan."""
    from malstrom_spark.functions.corpus import upsample_by_weight

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    out = upsample_by_weight(df, "doc_id", F.lit(2.5))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_shuffle_shard_deterministic_permutation(spark):
    from malstrom_spark.functions import corpus

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = corpus.shuffle_shard(df, "doc_id", seed=1, n_shards=4)
    rows = out.collect()
    # a permutation: every doc exactly once, positions contiguous
    # 0..n-1 within each shard
    assert len(rows) == 500 and len({r.doc_id for r in rows}) == 500
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard
    # balanced shards (hash-uniform): no shard under/over 2x its share
    sizes = sorted(len(p) for p in by_shard.values())
    assert sizes[0] > 500 // 4 // 2 and sizes[-1] < 500 // 4 * 2
    # stable across re-runs; a new seed is a different permutation
    again = {(r.doc_id, r.shard, r.pos) for r in
             corpus.shuffle_shard(df, "doc_id", seed=1, n_shards=4).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}
    epoch2 = {(r.doc_id, r.shard, r.pos) for r in
              corpus.shuffle_shard(df, "doc_id", seed=2, n_shards=4).collect()}
    assert epoch2 != again
    # portable twin is also a valid permutation (exactness vs the SQL
    # oracle is pinned by the doc_shuffle_shard registry row)
    port = corpus.shuffle_shard(df, "doc_id", seed=1, n_shards=4, portable=True)
    assert port.count() == 500


def test_heavy_hitters_exact_output(spark):
    """Output must equal the exact groupBy/HAVING answer even with
    the minimum guaranteed-safe k (= ceil(1/phi)), which forces
    constant Misra-Gries compression on 75 distinct tokens — the
    sketch proposes, the recount decides."""
    from malstrom_spark.functions.corpus import heavy_hitters

    rows = (
        [("big",)] * 40 + [("mid",)] * 25
        + [(f"tail{i}",) for i in range(35)]
    )
    df = spark.createDataFrame(rows, "token string").repartition(8)
    got = {
        (r.token, r.cnt) for r in heavy_hitters(df, "token", phi=0.2, k=5).collect()
    }
    # N=100, phi=0.2 -> cnt > 20: big (40) and mid (25) only
    assert got == {("big", 40), ("mid", 25)}


def test_heavy_hitters_share_and_validation(spark):
    import pytest as _pytest

    from malstrom_spark.functions.corpus import heavy_hitters

    df = spark.createDataFrame([("a",)] * 3 + [("b",)] * 1, "token string")
    out = {r.token: (r.cnt, r.share) for r in heavy_hitters(df, "token", 0.5).collect()}
    assert out == {"a": (3, 0.75)}
    with _pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "token", 1.5)
    # ADVICE r7: a caller-supplied k below ceil(1/phi) voids the
    # candidate-superset guarantee — must refuse, not silently return
    # an incomplete "exact" result
    with _pytest.raises(ValueError, match="ceil"):
        heavy_hitters(df, "token", phi=0.2, k=4)
    # k == ceil(1/phi) is the documented minimum and must be accepted
    assert heavy_hitters(df, "token", phi=0.2, k=5).count() >= 0


def test_heavy_hitters_superset_guarantee_property():
    """Pure-Python property pin of the documented MG bound (no Spark):
    folding ANY partitioning of ANY multiset through the
    mergeable-summaries reduce with k = ceil(1/phi) counters, the
    union of per-partition survivors contains every phi-heavy item —
    the proof-sketch contract both heavy-hitter docstrings state."""
    import math as _math
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def mg_fold(items, k):
        counters = {}
        for it in items:
            counters[it] = counters.get(it, 0) + 1
            if len(counters) > k:
                d = sorted(counters.values(), reverse=True)[k]
                counters = {i: w - d for i, w in counters.items() if w > d}
        return set(counters)

    @settings(max_examples=200, deadline=None)
    @given(
        data=st.lists(st.integers(0, 30), min_size=1, max_size=300),
        n_parts=st.integers(1, 8),
        phi=st.sampled_from([0.5, 0.34, 0.25, 0.2, 0.11]),
    )
    def prop(data, n_parts, phi):
        k = _math.ceil(1.0 / phi)
        candidates = set()
        for p in range(n_parts):
            candidates |= mg_fold(data[p::n_parts], k)
        n = len(data)
        heavy = {i for i, c in Counter(data).items() if c > phi * n}
        assert heavy <= candidates, (heavy, candidates, phi, n_parts)

    prop()


def test_heavy_hitters_ignores_nulls(spark):
    from malstrom_spark.functions.corpus import heavy_hitters

    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], "token string"
    )
    # N counts non-null items only: N=3, phi=0.5 -> cnt > 1.5: a(2)
    got = {(r.token, r.cnt) for r in heavy_hitters(df, "token", 0.5).collect()}
    assert got == {("a", 2)}


def test_chunk_text_windows_and_edges(spark):
    from malstrom_spark.functions.corpus import chunk_text

    df = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            (2, "solo"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = chunk_text(df, "doc_id", max_tokens=4, overlap=1)
    rows = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk) for r in out.collect()}
    # step=3: starts 0,3,6 for doc 1 (last start: g=8 -> 6)
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")
    assert rows[(1, 2)] == (4, "t6 t7 t8 t9")
    assert rows[(2, 0)] == (1, "solo")
    assert {k[0] for k in rows} == {1, 2}  # null text dropped
    # every token index is covered by some window
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_text(df, "doc_id", max_tokens=4, overlap=4)
    with _pytest.raises(ValueError, match="max_tokens"):
        chunk_text(df, "doc_id", max_tokens=0)


def test_chunk_text_is_shuffle_free(spark):
    from malstrom_spark.functions.corpus import chunk_text

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_text(df, "doc_id", max_tokens=2, overlap=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_heavy_hitters_item_named_item(spark):
    """The candidate semi-join must not be ambiguous when the input
    column is itself named 'item'."""
    from malstrom_spark.functions.corpus import heavy_hitters

    df = spark.createDataFrame([("a",)] * 3 + [("b",)], "item string")
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "item", 0.5).collect()}
    assert got == {("a", 3)}


def test_chunk_text_empty_doc_distinguishable(spark):
    from malstrom_spark.functions.corpus import chunk_text

    df = spark.createDataFrame(
        [(1, "   "), (2, ""), (3, "one")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk)
        for r in chunk_text(df, "doc_id", max_tokens=4).collect()
    }
    assert rows[(1, 0)] == (0, "")
    assert rows[(2, 0)] == (0, "")
    assert rows[(3, 0)] == (1, "one")


def test_cap_per_key_skew_safe_equals_plain(spark):
    """Output must equal cap_per_key exactly: same rows kept for
    skewed and tiny keys, ties broken by (order, id)."""
    import random

    from malstrom_spark.functions.corpus import cap_per_key, cap_per_key_skew_safe

    rng = random.Random(7)
    rows = [("mega", rng.randrange(0, 1000), i) for i in range(500)]
    rows += [("tiny", rng.randrange(0, 1000), 10_000 + i) for i in range(2)]
    rows += [("ties", 42, 20_000 + i) for i in range(6)]
    df = spark.createDataFrame(rows, "domain string, score long, id long").repartition(8)

    plain = cap_per_key(df, ["domain"], 5, [F.asc("score"), F.asc("id")])
    safe = cap_per_key_skew_safe(
        df, ["domain"], 5, "score", "id", lo=0, hi=1024, n_bins=64
    )
    p = {(r.domain, r.score, r.id) for r in plain.collect()}
    s = {(r.domain, r.score, r.id) for r in safe.collect()}
    assert p == s
    assert len([x for x in s if x[0] == "tiny"]) == 2  # under-n key kept whole
    assert len([x for x in s if x[0] == "ties"]) == 5  # id tie-break


def test_temperature_sample_alpha1_is_identity(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 80 else "fr") for i in range(100)],
        "doc_id long, lang string",
    )
    out = corpus.temperature_sample(df, "lang", "doc_id", alpha=1.0).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(100))
    assert all(r["copy_idx"] == 1 for r in out)


def test_temperature_sample_matches_python_reference(spark):
    """alpha=0.5, boost=2.5 over a skewed corpus: every emitted
    (doc_id, copy_idx) must equal the hand-computed rule
    n = floor(w) + [md5_60(doc_id) % 1e6 < frac(w) * 1e6]."""
    import hashlib
    import math

    rows = [(i, "en") for i in range(300)] + [(i, "fr") for i in range(300, 400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = corpus.temperature_sample(
        df, "lang", "doc_id", alpha=0.5, boost=2.5, portable=True
    ).collect()

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    w = {"en": min(math.sqrt(100 / 300) * 2.5, 64.0),
         "fr": min(math.sqrt(100 / 100) * 2.5, 64.0)}
    want = set()
    for i, lang in rows:
        wv = w[lang]
        n = int(math.floor(wv))
        if h60(str(i)) % 1_000_000 < (wv - math.floor(wv)) * 1_000_000:
            n += 1
        for c in range(1, n + 1):
            want.add((i, c))
    got = {(r["doc_id"], r["copy_idx"]) for r in out}
    assert got == want
    # fr (rarest) upsampled 2.5x in expectation, en ~1.44x
    n_fr = sum(1 for i, c in got if i >= 300)
    assert 2.0 * 100 <= n_fr <= 3.0 * 100


def test_temperature_sample_alpha0_equalizes_expectation(spark):
    rows = [(i, "big") for i in range(1000)] + \
           [(i, "small") for i in range(1000, 1100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = corpus.temperature_sample(df, "lang", "doc_id", alpha=0.0).collect()
    by = {}
    for r in out:
        by[r["lang"]] = by.get(r["lang"], 0) + 1
    # expected 100 rows from each stratum; allow sampling slack
    assert abs(by["big"] - 100) < 40
    assert by["small"] == 100  # rarest stratum: w == 1 exactly


def test_temperature_sample_validation_and_determinism(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="alpha"):
        corpus.temperature_sample(df, "lang", "doc_id", alpha=1.5)
    with pytest.raises(ValueError, match="boost"):
        corpus.temperature_sample(df, "lang", "doc_id", boost=0)
    big = spark.createDataFrame(
        [(i, "x" if i % 3 else "y") for i in range(200)],
        "doc_id long, lang string",
    )
    a = sorted((r["doc_id"], r["copy_idx"]) for r in
               corpus.temperature_sample(big, "lang", "doc_id").collect())
    b = sorted((r["doc_id"], r["copy_idx"]) for r in
               corpus.temperature_sample(big, "lang", "doc_id").collect())
    assert a == b


def test_temperature_sample_plan_no_fact_shuffle(spark):
    """The documents side must reach the weight join without its own
    Exchange: weights broadcast, fact stays in place."""
    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    plan = corpus.temperature_sample(df, "lang", "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pmi_bigrams_hand_checked(spark):
    """Corpus where 'machine learning' is a strong collocation and
    'the the' is anti-correlated filler."""
    import math

    docs = spark.createDataFrame(
        [("machine learning " * 6).strip(),
         ("machine learning " * 4).strip(),
         "the cat the dog the bird machine",
         "learning the ropes the hard way"],
        "string",
    ).toDF("text")
    out = corpus.pmi_bigrams(docs, min_count=2, top_k=5).collect()
    top = [(r["a"], r["b"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert top[0] == ("machine", "learning")
    # verify the quantized score against a hand count
    rows = {(r["a"], r["b"]): (r["c_ab"], r["pmi_q"]) for r in out}
    c_ab, pmi_q = rows[("machine", "learning")]
    # hand counts: docs 1-2 contribute 10 'machine learning' pairs...
    # derive from python reference instead of hand arithmetic
    texts = [("machine learning " * 6).strip(),
             ("machine learning " * 4).strip(),
             "the cat the dog the bird machine",
             "learning the ropes the hard way"]
    toks = [t.lower().split() for t in texts if len(t.split()) >= 2]
    pairs = [(w[i], w[i + 1]) for w in toks for i in range(len(w) - 1)]
    unis = [tok for w in toks for tok in w]
    T = len(pairs)
    ca = sum(1 for p in pairs if p == ("machine", "learning"))
    cm = unis.count("machine")
    cl = unis.count("learning")
    assert c_ab == ca
    assert pmi_q == math.floor(math.log(ca * T / (cm * cl)) * 10000)


def test_pmi_bigrams_min_count_prunes(spark):
    docs = spark.createDataFrame(
        [("rare pair",), ("common word common word common word",)],
        "text string")
    out = corpus.pmi_bigrams(docs, min_count=2, top_k=10).collect()
    assert ("rare", "pair") not in {(r["a"], r["b"]) for r in out}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.pmi_bigrams(docs, min_count=0)


# -------------------- DSIR importance resampling (round 10)

def _md5h(*parts):
    import hashlib

    s = "\x1f".join(parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _dsir_python(target, raw, docs, n_buckets=64, quant=10_000):
    """Independent reference: the oracle replays the same algorithm,
    so this brute force is the correctness pin (the r9 triangle
    lesson — cross-engine agreement is not correctness)."""
    import math
    from collections import Counter

    def feats(text):
        t = text.lower().strip().split()
        out = [_md5h(x) % n_buckets for x in t]
        out += [_md5h(a, b) % n_buckets for a, b in zip(t, t[1:])]
        return out

    tc, rc = Counter(), Counter()
    for _, txt in target:
        tc.update(feats(txt))
    for _, txt in raw:
        rc.update(feats(txt))
    T, R = sum(tc.values()), sum(rc.values())
    lam = {
        b: math.floor(
            math.log(((tc.get(b, 0) + 1) * (R + n_buckets))
                     / ((rc.get(b, 0) + 1) * (T + n_buckets))) * quant
        )
        for b in set(tc) | set(rc)
    }
    return {
        i: sum(lam.get(b, 0) for b in feats(txt)) for i, txt in docs
    }, lam


def test_dsir_score_matches_python_reference(spark):
    target = [(100 + i, f"spark shuffle partition data frame {i % 3}")
              for i in range(6)]
    raw = [(200 + i, ("spark data job" if i % 2 else
                      "cat videos and celebrity gossip news"))
           for i in range(10)]
    docs = [(i, txt) for i, txt in
            [(1, "spark shuffle data"), (2, "celebrity gossip news"),
             (3, "partition frame spark"), (4, "unrelated words entirely")]]
    t_df = spark.createDataFrame(target, "doc_id long, text string")
    r_df = spark.createDataFrame(raw, "doc_id long, text string")
    d_df = spark.createDataFrame(docs, "doc_id long, text string")
    w = corpus.dsir_fit(t_df, r_df, n_buckets=64, portable=True)
    got = {r["doc_id"]: r["dsir_q"]
           for r in corpus.dsir_score(d_df, w, "doc_id",
                                      n_buckets=64, portable=True).collect()}
    want, _ = _dsir_python(target, raw, docs)
    assert got == want
    # and target-like docs outscore off-target ones
    assert got[1] > got[2] and got[3] > got[4]


def test_dsir_single_token_and_empty_docs(spark):
    """1-token docs must not hit the sequence(0,-1) reverse-step trap;
    NULL/empty docs score 0 and are kept."""
    t_df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "   "), (4, "alpha beta")],
        "doc_id long, text string")
    w = corpus.dsir_fit(t_df, t_df, n_buckets=32, portable=True)
    got = {r["doc_id"]: r["dsir_q"]
           for r in corpus.dsir_score(docs, w, "doc_id",
                                      n_buckets=32, portable=True).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == 0
    # target==raw -> every smoothed ratio is ln(1)=0, so scores are 0
    assert got[1] == got[4] == 0


def test_dsir_counts_mergeable_across_shards(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 3} shared words") for i in range(30)],
        "doc_id long, text string")
    whole = {(r["bucket"], r["cnt"])
             for r in corpus.dsir_feature_counts(
                 docs, n_buckets=64, portable=True).collect()}
    a = corpus.dsir_feature_counts(docs.where("doc_id % 2 = 0"),
                                   n_buckets=64, portable=True)
    b = corpus.dsir_feature_counts(docs.where("doc_id % 2 = 1"),
                                   n_buckets=64, portable=True)
    merged = {(r["bucket"], r["cnt"]) for r in
              a.unionByName(b).groupBy("bucket")
              .agg(F.sum("cnt").alias("cnt")).collect()}
    assert merged == whole


def test_dsir_resample_deterministic_and_target_seeking(spark):
    target = spark.createDataFrame(
        [(100 + i, f"clean encyclopedia prose sentence number {i}")
         for i in range(8)], "doc_id long, text string")
    rows = ([(i, "clean encyclopedia prose article") for i in range(10)]
            + [(50 + i, "buy pills casino winner click") for i in range(10)])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = corpus.dsir_fit(target, docs, n_buckets=256, portable=True)
    sel1 = corpus.dsir_resample(docs, w, "doc_id", n=8,
                                n_buckets=256, portable=True).collect()
    sel2 = corpus.dsir_resample(docs, w, "doc_id", n=8,
                                n_buckets=256, portable=True).collect()
    assert sorted(map(tuple, sel1)) == sorted(map(tuple, sel2))
    picked = {r["doc_id"] for r in sel1}
    assert len(picked) == 8
    # gumbel noise is bounded; the clean docs dominate the selection
    n_clean = sum(1 for d in picked if d < 50)
    assert n_clean >= 6, picked
    # ranks are 1..n and keys deterministic
    assert sorted(r["rank"] for r in sel1) == list(range(1, 9))


def test_split_by_group_leakage_safe(spark):
    """Every member of a group gets the SAME split (the leakage
    guard), assignments are deterministic across engines
    (portable == rerun), fractions are validated, and proportions
    land near the requested mix."""
    import pytest as _pytest

    from malstrom_spark.functions.corpus import split_by_group

    rows = [(i, i % 97) for i in range(2000)]  # ~20 rows per group
    df = spark.createDataFrame(rows, "doc_id long, group_id long")
    frac = {"train": 0.8, "validation": 0.1, "test": 0.1}
    out = split_by_group(df, "group_id", frac, seed=3).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.group_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())  # no straddling
    # proportions over GROUPS approach the mix (97 groups, +-20%)
    from collections import Counter

    got = Counter(next(iter(s)) for s in by_group.values())
    assert got["train"] > 60 and got["validation"] >= 3 and got["test"] >= 3
    # deterministic: rerun and portable path agree with themselves
    again = split_by_group(df, "group_id", frac, seed=3).collect()
    assert sorted((r.doc_id, r.split) for r in out) == \
        sorted((r.doc_id, r.split) for r in again)
    # a different seed moves groups between splits (not a constant fn)
    other = split_by_group(df, "group_id", frac, seed=4).collect()
    assert sorted((r.doc_id, r.split) for r in out) != \
        sorted((r.doc_id, r.split) for r in other)
    # fractions must cover the space exactly
    with _pytest.raises(ValueError, match="sum to 1"):
        split_by_group(df, "group_id", {"train": 0.8, "test": 0.1})
    with _pytest.raises(ValueError, match="non-empty"):
        split_by_group(df, "group_id", {})
    # zero shuffle
    plan = split_by_group(df, "group_id", frac)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_datasheet_metrics(spark):
    from malstrom_spark.functions.corpus import corpus_datasheet

    rows = [
        (1, "Hello  world", "en", "a"),
        (2, "hello world", "en", "a"),      # exact dup of 1 (normalized)
        (3, "one two three four", "fr", "a"),
        (4, "solo", "en", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r.source: r for r in corpus_datasheet(df).collect()}
    a = got["a"]
    assert (a.n_docs, a.n_distinct_texts) == (3, 2)  # dup volume = 1
    assert (a.total_words, a.min_words, a.max_words) == (8, 2, 4)
    assert a.total_chars == len("Hello  world") + len("hello world") + len("one two three four")
    assert a.n_langs == 2
    b = got["b"]
    assert (b.n_docs, b.n_distinct_texts, b.total_words, b.n_langs) == (1, 1, 1, 1)
    # lang_col=None drops the column entirely
    cols = corpus_datasheet(df, lang_col=None).columns
    assert "n_langs" not in cols


def test_corpus_datasheet_plan_partial_agg_and_pruned_scan(spark):
    """The datasheet must map-side combine (partial_ aggs below the
    exchange) and prune the scan to the three consumed columns."""
    from malstrom_spark.functions.corpus import corpus_datasheet

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = corpus_datasheet(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "partial_count" in plan and "partial_sum" in plan
    assert "doc_id" not in plan  # pruned from the scan


# -------------------------------------------------- mixture plan (r11)
def test_mixture_plan_exact_integer_arithmetic(spark):
    from pyspark.sql import functions as F

    from malstrom_spark.functions.corpus import mixture_plan

    docs = spark.createDataFrame(
        [("a", "w " * 10), ("a", "w " * 10), ("b", "w " * 5)],
        "source string, text string",
    )
    w = F.when(F.col("source") == "a", F.lit(1)).otherwise(F.lit(3))
    got = {r.source: r for r in mixture_plan(
        docs, "source", w, token_budget=100, max_epochs=2
    ).collect()}
    # a: 20 tokens avail, weight 1 -> target 100*1//4 = 25 -> 2 epochs
    assert got["a"].available_tokens == 20 and got["a"].target_tokens == 25
    assert got["a"].n_epochs == 2 and not got["a"].is_capped
    assert got["a"].planned_tokens == 25
    # b: 5 avail, weight 3 -> target 75 -> 15 epochs, capped at 2 -> 10
    assert got["b"].target_tokens == 75 and got["b"].n_epochs == 15
    assert got["b"].is_capped and got["b"].planned_tokens == 10
    assert got["b"].sampling_rate == 75 / 5
    # planned_rate respects the cap — the rate to actually realize
    assert got["b"].planned_rate == 10 / 5
    assert got["a"].planned_rate == got["a"].sampling_rate


def test_mixture_plan_skips_empty_strata(spark):
    from pyspark.sql import functions as F

    from malstrom_spark.functions.corpus import mixture_plan

    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", None)], "source string, text string"
    )
    got = mixture_plan(docs, "source", F.lit(1), token_budget=10).collect()
    assert [r.source for r in got] == ["a"]
