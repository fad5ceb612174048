"""Deduplication operators for training-data pipelines.

Not present in the reference (its surface is general stateful
primitives, SURVEY §2.8); first-class here per the north star. All
stages are native DataFrame ops — shingling/hashing/banding happen
JVM-side; nothing collects to the driver.

Scale design (100 TB of documents):
- exact dedup: one hash-shuffle on the fingerprint. Map-side partial
  aggregation cuts shuffle volume; AQE coalesces the output.
- MinHash+LSH: explode to (doc, shingle) -> per-doc signature via ONE
  groupBy (32 min-aggregates computed together) -> band hashes ->
  self-join on (band, bandhash) buckets. Shuffle keys are band hashes
  (uniform by construction, no skew). Candidate verification joins
  shingle sets only for candidate pairs, never all pairs.
- SimHash: same shape, 64 sign-sums in one groupBy, Hamming distance
  via bit_count(xor) — all codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text, tokens

# Deterministic MinHash parameters (Mersenne prime scheme). 2^31-1 so
# h*a fits in a 64-bit long under ANSI overflow checking.
_MERSENNE = (1 << 31) - 1


def _perm_params(n_hashes: int) -> list[tuple[int, int]]:
    """Fixed, reproducible (a, b) permutation params derived from a
    simple LCG — no runtime randomness, identical across runs/sessions."""
    params = []
    x = 0x9E3779B97F4A7C15
    for _ in range(n_hashes):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (_MERSENNE - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _MERSENNE
        params.append((a, b))
    return params


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of the normalized text (array<string>)."""
    t = tokens(normalize_text(col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)]))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups on normalized text: emits one row per
    distinct text with the surviving (minimum) id and the copy count.
    One shuffle on the md5 fingerprint; never shuffles the text body."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        df.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str = "text", n_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """(id, signature: array<bigint>) via explode -> one groupBy with
    n_hashes min-aggregates. Shingle hash = xxhash64 (JVM-native);
    permutations = (a*h+b) mod 2^61-1 evaluated as native expressions."""
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("sh")
    ).select(id_col, F.pmod(F.xxhash64("sh"), F.lit(_MERSENNE)).alias("h"))
    aggs = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_perm_params(n_hashes))
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"mh_{i}") for i in range(n_hashes)]).alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, n_bands: int = 8
) -> DataFrame:
    """Band the signature and self-join on (band, band_hash) buckets.
    Returns distinct candidate (id_a < id_b) pairs. Bucket keys are
    hashes — uniformly distributed, so the self-join shuffle is
    skew-free by construction."""
    sig = signatures
    rows_per_band = F.floor(F.size("signature") / n_bands).cast("int")
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.slice("signature", b * rows_per_band + 1, rows_per_band)).alias(
                        "bhash"
                    ),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bhash")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str = "text",
                  shingle_n: int = 3) -> DataFrame:
    """Exact Jaccard over word-shingle sets for given (id_a, id_b)
    pairs — the verify stage after LSH. Joins shingle arrays onto the
    (small) candidate set, never onto all pairs."""
    sh = docs.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = df_pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    uni = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return joined.select(
        "id_a", "id_b", (inter / F.greatest(uni, F.lit(1.0))).alias("jaccard")
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature -> banded
    candidates -> exact-Jaccard verify >= threshold."""
    sigs = minhash_signature(df, id_col, text_col, n_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, n_bands)
    verified = ngram_jaccard(cands, df, id_col, text_col)
    return verified.filter(F.col("jaccard") >= threshold)


def simhash(col: Column, bits: int = 64) -> Column:
    """64-bit SimHash of the token set, fully native: per-token
    xxhash64, per-bit sign sum, sign -> bit. Returns bigint."""
    t = F.array_distinct(tokens(normalize_text(col)))
    h = F.transform(t, lambda x: F.xxhash64(x))
    out = F.lit(0).cast("long")
    for i in range(bits):
        # sum over tokens of +1/-1 for bit i, then set bit if positive
        bit_sum = F.aggregate(
            h,
            F.lit(0),
            lambda acc, hv: acc
            + F.when(F.shiftright(hv, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        bit = F.when(bit_sum > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        out = out.bitwiseOR(bit)
    return out


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into 4 x 16-bit
    chunks (any pair within Hamming<=3 shares at least one exact chunk
    by pigeonhole), bucket-join on chunks, verify with bit_count(xor)."""
    sh = df.select(F.col(id_col), simhash(F.col(text_col)).alias("sh"))
    chunks = sh.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftright("sh", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "sh", "c.chunk_id", "c.chunk")
    l, r = chunks.alias("l"), chunks.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
