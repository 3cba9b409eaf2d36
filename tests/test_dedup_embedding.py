"""Embedding-cosine near-duplicate tests: the exact all-pairs operator
finds planted near-dups; the LSH-blocked operator returns a subset of
the exact result with no false positives."""

from __future__ import annotations

import numpy as np
import pytest

from nous_spark.operators.dedup import embedding_near_dups, embedding_near_dups_exact

DIM = 32


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for base_i in range(10):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        # each base plus two tiny-noise copies => cosine ~0.999 within trio
        for _ in range(3):
            v = base + 0.02 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_exact_finds_planted_trios(vectors):
    pairs = embedding_near_dups_exact(vectors, threshold=0.95).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # every within-trio pair (3 per trio, 10 trios) must be found
    expected = {
        (3 * t + i, 3 * t + j) for t in range(10) for i in range(3) for j in range(3) if i < j
    }
    assert expected <= got
    # and nothing across trios (random directions in 32-d are far apart)
    assert got == expected
    assert all(r["cosine"] >= 0.95 for r in pairs)


def test_lsh_is_subset_of_exact_with_true_positives_only(vectors):
    exact = {
        (r["id_a"], r["id_b"]) for r in embedding_near_dups_exact(vectors, 0.95).collect()
    }
    lsh = embedding_near_dups(vectors, threshold=0.95, n_planes=6).collect()
    got = {(r["id_a"], r["id_b"]) for r in lsh}
    assert got <= exact  # blocking never invents pairs
    assert len(got) > 0  # near-identical vectors share sign buckets
    assert all(r["cosine"] >= 0.95 for r in lsh)


def test_minhash_jvm_and_pandas_agree_on_near_dups(spark):
    """The JVM and numpy minhash families differ bit-wise but must find
    the same planted near-duplicate pairs at the same threshold."""
    from nous_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_near_dups,
        minhash_signatures,
        minhash_signatures_pandas,
    )
    from pyspark.sql import functions as F

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet green field toward the distant river bank"
    )
    rows = []
    for i in range(8):
        # pairs (2i, 2i+1) are near-dups (one word changed); distinct bases
        variant = base.replace("quick", f"word{i}")
        rows.append((2 * i, variant))
        rows.append((2 * i + 1, variant.replace("river", "ocean")))
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()

    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(docs, threshold=0.5).collect()
    }
    expected = {(2 * i, 2 * i + 1) for i in range(8)}
    assert expected <= found

    # pandas family through the same banding finds the same pairs
    sigs_p = minhash_signatures_pandas(docs)
    cands_p = {
        (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs_p).collect()
    }
    assert expected <= cands_p

    # JVM signatures are deterministic across evaluations
    s1 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    s2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert s1 == s2
