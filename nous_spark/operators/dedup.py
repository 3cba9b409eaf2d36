"""Document deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard.

These are the training-data-pipeline workhorses at 100 TB: exact dedup is
one hash-groupBy; near-dup needs blocking (LSH banding) so the candidate
self-join is per-bucket instead of all-pairs. Signatures are computed in
ONE Arrow-batched numpy pass per partition; all joins/groupBys stay
JVM-side.

Scale notes:
  * MinHash banding: P(candidate) = 1-(1-s^r)^b — with r=4, b=16 the
    S-curve crosses ~0.5 at s≈0.5; buckets are (band_id, band_hash)
    pairs, so the shuffle key space is huge and hot buckets (boilerplate
    docs) are bounded by band width, not corpus size.
  * SimHash: 64-bit fingerprints, near-dup = hamming<=3 via 4x16-bit
    pigeonhole blocking, verified with bit_count(xor) in the JVM.
  * n-gram Jaccard: exact verification — explode distinct shingle hashes,
    equi-join on shingle, count shared / union. Run AFTER blocking at
    scale; standalone it is quadratic in bucket size only.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# deterministic 64-bit universal-hash parameters (fixed seed — resumable runs)
_MERSENNE = (1 << 61) - 1


def _hash_params(n: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n, dtype=np.int64)
    return a, b


def _shingles(text: str, k: int) -> np.ndarray:
    """Word k-gram shingle hashes (crc32 — fast, deterministic)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.array([0], dtype=np.int64)
    return np.unique(
        np.fromiter((zlib.crc32(g.encode("utf-8")) for g in grams), dtype=np.int64)
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5(text) -> canonical (min) id + group size."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_docs"),
        )
    )


def minhash_signatures_jvm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — minhash entirely JVM-side (no Python
    workers): word k-gram shingles via slide (split/sequence/slice/
    concat_ws), hash family j = xxhash64(shingle, seed, j), signature =
    array_min per j.

    Honest A/B at sf0.1 (5k docs, forced evaluation): this path 4.3-5.2s
    vs 0.75-2.8s for the numpy/Arrow default — higher-order-function
    lambdas are interpreted per element while numpy gets SIMD matrix
    ops, so the Arrow path wins despite crossing into Python. Kept as
    the zero-Python-worker alternative (useful where worker fork/import
    dominates or Python is unavailable on executors).
    """
    words = F.split(F.col(text_col), r"\s+")
    n = F.greatest(F.size(words) - (shingle_k - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, shingle_k))),
    )
    # Bind the shingle array ONCE as a runtime lambda variable (1-element
    # array wrapper): embedding `shingles` directly in all n_hashes
    # lambdas would copy the string-building subtree n_hashes times into
    # the plan — lambda bodies are not common-subexpression-eliminated
    # (measured 64x slowdown without this).
    sig = F.element_at(
        F.transform(
            F.array(shingles),
            lambda sh: F.transform(
                F.sequence(F.lit(0), F.lit(n_hashes - 1)),
                lambda j: F.array_min(
                    F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed), j))
                ),
            ),
        ),
        1,
    )
    return docs.select(F.col(id_col), sig.alias("sig"))


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — DEFAULT: vectorized numpy minhash per
    Arrow batch ((a*x+b) mod Mersenne family over crc32 shingles, one
    (n_hashes x n_shingles) matrix op per doc). Fastest measured path
    (see minhash_signatures_jvm docstring for the A/B). Same statistical
    contract as the JVM variant (different hash family, not
    bit-identical); tests assert both find the same near-dup pairs."""
    a, b = _hash_params(n_hashes, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                sh = _shingles(text or "", shingle_k)
                # (a*x + b) mod p for all hash fns at once: (H, S) matrix
                vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
                sigs.append(vals.min(axis=1).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, sig array<long>"
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
) -> DataFrame:
    """Band the signatures and self-join per bucket -> candidate (a, b) pairs.

    Bucket key = (band index, xxhash of the band slice); pairs are emitted
    once (a < b) and deduped across bands.
    """
    n_hashes = 64  # matches minhash_signatures default; slice size derived below
    sig_len_row = signatures.select(F.size("sig").alias("n")).first()
    if sig_len_row is not None:
        n_hashes = sig_len_row["n"]
    r = n_hashes // n_bands

    bands = signatures.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.xxhash64(F.slice("sig", i * r + 1, r).cast("string")),
            )
        ).alias("band", "bucket"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs with estimated Jaccard >= threshold.

    Estimate = fraction of agreeing minhash positions (unbiased for true
    Jaccard). Returns (id_a, id_b, est_jaccard).
    """
    # Materialize signatures once: the JVM sig expression would otherwise
    # be re-inlined by Catalyst into every band slice and both join sides
    # (16 bands x 64 hashes x shingles — measured minutes instead of
    # seconds at sf0.1). MEMORY_AND_DISK: sigs are 8B x n_hashes per doc.
    sigs = minhash_signatures(docs, id_col, text_col, n_hashes, shingle_k, seed).persist()
    cands = lsh_candidate_pairs(sigs, id_col, n_bands)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", agree / F.size("sig_a"))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """64-bit SimHash over word unigram hashes — (id, simhash: long).

    DEFAULT: vectorized numpy per Arrow batch (bit matrix of word hashes,
    one (n_words x 64) op per doc). Honest A/B at sf0.1: 1.3-2.4s vs
    3.0-4.9s for the JVM higher-order-function variant
    (simhash_fingerprints_jvm) — same conclusion as minhash: numpy SIMD
    beats interpreted HOF lambdas.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                words = (text or "").split()
                if not words:
                    out.append(0)
                    continue
                hs = np.fromiter(
                    (
                        (zlib.crc32((w + str(seed)).encode()) * 0x9E3779B97F4A7C15)
                        & 0xFFFFFFFFFFFFFFFF
                        for w in words
                    ),
                    dtype=np.uint64,
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                    np.int32
                )
                v = (2 * bits - 1).sum(axis=0)
                fp = np.uint64(0)
                for j in range(64):
                    if v[j] > 0:
                        fp |= np.uint64(1) << np.uint64(j)
                out.append(int(fp.astype(np.int64)))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(gen, f"{id_col} long, simhash long")


def simhash_fingerprints_jvm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """JVM-only SimHash variant (no Python workers): per word,
    xxhash64(word, seed) contributes +-1 to each of 64 bit counters (one
    `aggregate` over the words array with an array accumulator); the
    fingerprint sets bit j where counter j > 0. Different hash family
    than the default — not bit-identical, same blocking semantics.
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    hashes = F.transform(words, lambda w: F.xxhash64(w, F.lit(seed)))
    zero = F.array_repeat(F.lit(0).cast("long"), 64)

    def bits_pm1(h):
        return F.array(
            *[
                (
                    F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) * 2 - 1
                ).cast("long")
                for j in range(64)
            ]
        )

    counters = F.aggregate(
        hashes, zero, lambda acc, h: F.zip_with(acc, bits_pm1(h), lambda a, b: a + b)
    )
    # bit j's value as a literal array (bit 63 = long sign bit in two's
    # complement) — zip against the counters so the aggregate above is
    # referenced exactly once
    bitvals = F.array(
        *[
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
            for j in range(64)
        ]
    )
    fp = F.aggregate(
        F.zip_with(
            counters,
            bitvals,
            lambda c, v: F.when(c > 0, v).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return docs.select(
        F.col(id_col),
        F.when(F.size(words) == 0, F.lit(0).cast("long")).otherwise(fp).alias("simhash"),
    )


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Blocking: split the 64-bit fingerprint into 4 x 16-bit chunks; any
    pair within hamming<=3 must agree on >=1 chunk (pigeonhole), so the
    candidate join is an equi-join on (chunk_idx, chunk_value). The
    verification (bit_count of xor) runs JVM-side.
    """
    # persist: the fingerprint expression would be re-inlined into all
    # four chunk extractions and both join sides otherwise
    fp = simhash_fingerprints(docs, id_col, text_col, seed).persist()
    chunks = fp.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col("a.simhash").alias("sh_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# embedding-cosine near-duplicates
# --------------------------------------------------------------------------
def embedding_near_dups_exact(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold — exact all-pairs verification.

    JVM-side math (zip_with/aggregate in double — same formula as the
    DuckDB oracle's list_cosine_similarity). Quadratic: use ONLY after
    blocking at scale, or on a bounded candidate set; the scale path is
    ``embedding_near_dups`` below.
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate embeddings at scale: random-hyperplane LSH blocking
    then exact cosine verification inside each bucket.

    Vectors with cosine >= threshold (angle theta) collide on all
    n_planes sign bits with probability (1 - theta/pi)^n — at 0.95
    (theta~18deg) and n=8 that's ~0.42 per table; production stacks
    multiple hash tables for recall (kept single-table here; the operator
    contract is "every returned pair is a true near-dup", not recall=1).
    """
    from nous_spark.operators.similarity import hyperplane_buckets

    buckets = hyperplane_buckets(vectors, n_planes, None, seed, id_col, vec_col)
    with_bucket = vectors.join(buckets, id_col)
    a = with_bucket.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = with_bucket.select(
        F.col("bucket").alias("bucket_b"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (verification operator)
# --------------------------------------------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-k-gram Jaccard similarity for all pairs sharing >=1 gram.

    Pure DataFrame end-to-end: shingle hashes built JVM-side (the same
    split/sequence/slice/xxhash64 expression as the JVM minhash), explode
    distinct, equi-join on shingle, |A∩B| via group-count,
    |A∪B| = |A|+|B|-|A∩B|. No Python workers.
    """
    words = F.split(F.col(text_col), r"\s+")
    n = F.greatest(F.size(words) - (k - 1), F.lit(1))
    shingle_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k))),
        )
    )
    shingled = docs.select(
        F.col(id_col), F.explode(shingle_arr).alias("shingle")
    ).persist()  # reused by sizes + both join sides
    sizes = shingled.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
