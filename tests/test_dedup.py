"""Dedup operators over planted duplicates: exact groups, MinHash-LSH
recall on near-identical docs, SimHash Hamming pairs."""

import pyspark.sql.functions as F
import pytest

from malstrom_spark.functions import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different text about spark query engines and shuffles here today"),
        (4, "Yet another unrelated document mentioning benchmarks latency and throughput numbers"),
        (5, BASE + " extra tail words appended"),  # near dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "doc_id").collect()
    groups = {r.keeper_id: r.n_copies for r in out}
    assert groups[0] == 2  # docs 0 and 1 collapse
    assert len(out) == 5  # 5 distinct texts


def test_minhash_lsh_finds_near_dups(docs):
    pairs = dedup.near_dup_pairs_minhash(
        docs, "doc_id", n_hashes=32, n_bands=16, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found  # exact dup always found
    assert (0, 2) in found or (1, 2) in found  # one-word change
    # unrelated docs never pair
    assert not any(3 in p or 4 in p for p in found)


def test_minhash_jaccard_values(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.near_dup_pairs_minhash(
            docs, "doc_id", n_hashes=32, n_bands=16, threshold=0.1
        ).collect()
    }
    assert pairs.get((0, 1)) == 1.0  # identical shingle sets


def test_simhash_near_dups(docs):
    pairs = dedup.simhash_near_dups(docs, "doc_id", max_hamming=10).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found.get((0, 1)) == 0  # identical -> distance 0
    assert not any((3 in p or 4 in p) and found[p] <= 3 for p in found)


def test_ngram_jaccard_kernel(docs, spark):
    pairs = spark.createDataFrame([(0, 1), (0, 3)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard(pairs, docs, "doc_id").collect()}
    assert out[(0, 1)] == 1.0
    assert out[(0, 3)] < 0.05


def test_collapse_and_uncollapsed_outputs_identical(docs):
    """The exact-collapse pre-pass (and the adaptive probe that skips
    it on low-duplicate corpora) must be invisible in the output: both
    code paths emit the same pairs with the same scores."""
    def rows(df):
        return sorted(map(tuple, df.collect()))

    for kw in ({"n_hashes": 32, "n_bands": 16, "threshold": 0.1},):
        a = dedup.near_dup_pairs_minhash(docs, "doc_id", collapse_exact=True, **kw)
        b = dedup.near_dup_pairs_minhash(docs, "doc_id", collapse_exact=False, **kw)
        assert rows(a) == rows(b)
    sa = dedup.simhash_near_dups(docs, "doc_id", max_hamming=10, collapse_exact=True)
    sb = dedup.simhash_near_dups(docs, "doc_id", max_hamming=10, collapse_exact=False)
    assert rows(sa) == rows(sb)


def test_collapse_probe_skips_on_distinct_corpus(spark):
    """All-distinct corpus: the adaptive probe must decide NOT to
    collapse (members is None) — the collapse machinery would be pure
    overhead."""
    distinct_docs = spark.createDataFrame(
        [(i, f"unique document number {i} with its own words") for i in range(40)],
        "doc_id long, text string",
    )
    _, members = dedup._collapse_exact(distinct_docs, "doc_id", "text")
    assert members is None
    # and the planted-duplicates fixture (1 exact dup in 6) does collapse
    dup_docs = spark.createDataFrame(
        [(0, BASE), (1, BASE), (2, "other")], "doc_id long, text string"
    )
    _, members = dedup._collapse_exact(dup_docs, "doc_id", "text")
    assert members is not None
    assert {(r[0], r[1]) for r in members.collect()} == {(0, 0), (1, 0), (2, 2)}


def test_decontaminate_flags_ngram_overlap(spark):
    """Docs sharing a 5-gram window with the benchmark set are removed;
    docs with fewer than 5 shared consecutive tokens survive. Short
    docs (< n tokens) hash one truncated gram and only match equally
    short benchmark docs."""
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),  # contains bench window
            (1, "zeta eta unrelated words that share nothing consecutive here"),
            (2, "alpha beta gamma delta words broken up beta gamma delta epsilon zero"),
            (3, "tiny doc"),
            (4, "totally clean document about other things entirely today"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "prefix words alpha beta gamma delta epsilon more tail"), (1, "tiny doc")],
        "bid long, text string",
    )
    bad = {
        r.doc_id
        for r in dedup.contaminated_ids(corpus, bench, "doc_id", ngram_n=5).collect()
    }
    # doc 0 shares 'alpha beta gamma delta epsilon'; doc 3 is an exact
    # short-doc match; docs 1/2/4 share at most 4 consecutive tokens
    assert bad == {0, 3}
    kept = {r.doc_id for r in dedup.decontaminate(corpus, bench, "doc_id", ngram_n=5).collect()}
    assert kept == {1, 2, 4}
    # portable and scale hashing agree on the match set
    bad_p = {
        r.doc_id
        for r in dedup.contaminated_ids(corpus, bench, "doc_id", ngram_n=5, portable=True).collect()
    }
    assert bad_p == bad


def test_dedup_groups_transitive_closure(spark):
    """A-B and B-C near-dup edges must put A, B, C in ONE group labeled
    min(id), even though A-C was never emitted as a pair; isolated
    docs keep their own id."""
    from malstrom_spark.functions.dedup import dedup_groups

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.group_id for r in dedup_groups(pairs, ids, "doc_id").collect()}
    assert got == {0: 0, 3: 0, 5: 0, 1: 1, 2: 1, 4: 4}
