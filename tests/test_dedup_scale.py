"""Scale-defense tests for the doc-level dedup operators: hot-bucket /
stop-shingle caps must bound candidate generation on boilerplate-heavy
corpora (the 100 TB failure mode: one shared template puts ~n docs in
one LSH bucket and the per-bucket self-join goes quadratic), without
losing the genuine near-dup pairs that live in small buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nous_spark.operators.dedup import (
    embedding_near_dups,
    embedding_near_dups_exact,
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
    minhash_verified_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
)

BOILER = (
    "terms of service privacy policy cookie notice all rights reserved "
    "contact us about careers press sitemap subscribe to our newsletter "
    "follow us on social media copyright two thousand twenty four"
)

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the quiet green field toward the distant river bank"
)


@pytest.fixture(scope="module")
def boilerplate_corpus(spark):
    """300 identical boilerplate docs + 8 planted near-dup pairs."""
    rows = [(i, BOILER) for i in range(300)]
    for i in range(8):
        variant = BASE.replace("quick", f"word{i}")
        rows.append((1000 + 2 * i, variant))
        rows.append((1000 + 2 * i + 1, variant.replace("river", "ocean")))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


PLANTED = {(1000 + 2 * i, 1000 + 2 * i + 1) for i in range(8)}


def test_minhash_hot_bucket_cap_bounds_boilerplate(boilerplate_corpus):
    """300 identical docs -> every boilerplate (band, bucket) exceeds the
    cap and is dropped, so the candidate join stays bounded; the planted
    pairs (small buckets) are still found."""
    sigs = minhash_signatures(boilerplate_corpus)
    cands = lsh_candidate_pairs(sigs, n_hashes=64, max_bucket=64).collect()
    got = {(r["id_a"], r["id_b"]) for r in cands}
    assert PLANTED <= got
    # without the cap the 300 boilerplate docs alone give C(300,2)=44850
    # pairs; with it, none of them survive
    assert not any(a < 1000 and b < 1000 for a, b in got)
    assert len(got) < 300

    near = minhash_near_dups(boilerplate_corpus, threshold=0.5, max_bucket=64).collect()
    assert PLANTED <= {(r["id_a"], r["id_b"]) for r in near}


def test_simhash_hot_bucket_cap_bounds_boilerplate(boilerplate_corpus):
    near = simhash_near_dups(
        boilerplate_corpus, max_hamming=10, max_bucket=64
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in near}
    # boilerplate chunk buckets (300 members) are dropped pre-join
    assert not any(a < 1000 and b < 1000 for a, b in got)
    assert len(got) < 300
    # planted one-word edits mostly land within hamming<=10 and small
    # buckets (per-pair hamming is family-dependent; the pigeonhole
    # blocking only GUARANTEES recall for hamming<=3)
    assert len(PLANTED & got) >= 4


def test_ngram_stop_shingle_cap(spark):
    """A shingle shared by every doc is dropped (df cap) before the
    equi-join; pairs emerge only from rare-shingle overlap."""
    hot = "click here to accept cookies"
    rows = []
    for i in range(100):
        # each doc: the hot boilerplate sentence + a unique tail
        rows.append((i, f"{hot} unique tail number {i} alpha beta"))
    # one genuine near-dup pair sharing a long rare tail
    rows.append((500, f"{hot} shared rare tail gamma delta epsilon zeta eta"))
    rows.append((501, f"{hot} shared rare tail gamma delta epsilon zeta theta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(docs, k=3, threshold=0.3, max_df=16).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (500, 501) in got
    # the 100 boilerplate-sharing docs must NOT pair up on the hot shingles
    assert not any(a < 500 and b < 500 for a, b in got)


def test_minhash_verified_equals_exact_all_pairs(spark):
    """The LSH-blocked + exact-verified operator returns the same pairs
    and the same exact Jaccard values as an all-pairs exact computation
    (blocking recall 1 on a clearly-bimodal corpus)."""
    rows = []
    for i in range(8):
        variant = BASE.replace("quick", f"word{i}")
        rows.append((2 * i, variant))
        rows.append((2 * i + 1, variant.replace("river", "ocean")))
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()
    # threshold 0.75: the planted pairs sit at 0.8, cross-variant pairs
    # at ~0.64 — bimodal, so banding recall is ~1 above the threshold
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_verified_near_dups(docs, threshold=0.75, shingle_k=5).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=5, threshold=0.75).collect()
    }
    assert verified == exact
    assert set(verified) >= {(2 * i, 2 * i + 1) for i in range(8)}


def test_stacked_lsh_tables_recall_gate(spark):
    """Stacked hyperplane tables must recover >= 0.9 of the exact
    near-dup pairs (single-table recall at 0.95 cosine is only ~0.43)."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows, vid = [], 0
    for _ in range(20):
        base = rng.standard_normal(48)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + 0.02 * rng.standard_normal(48)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups_exact(vectors, threshold=0.95).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            vectors, threshold=0.95, n_planes=8, n_tables=8
        ).collect()
    }
    assert lsh <= exact  # verification: no false positives ever
    assert len(lsh) / len(exact) >= 0.9  # stacked-table recall gate


def test_embedding_hot_bucket_cap(spark):
    """Thousands of identical vectors collapse into one bucket per table;
    the cap drops them instead of emitting a quadratic pair set."""
    import numpy as np

    rng = np.random.RandomState(3)
    v0 = rng.standard_normal(16)
    v0 /= np.linalg.norm(v0)
    rows = [(i, [float(x) for x in v0]) for i in range(500)]
    # one planted distinct near-dup pair
    b = rng.standard_normal(16)
    b /= np.linalg.norm(b)
    rows.append((900, [float(x) for x in b]))
    rows.append((901, [float(x) for x in (b + 0.01 * rng.standard_normal(16))]))
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_near_dups(
        vectors, threshold=0.95, n_planes=8, n_tables=4, max_bucket=64
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert not any(a < 900 and b_ < 900 for a, b_ in got)
    assert (900, 901) in got
