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
    """The numpy (default) and JVM minhash families differ bit-wise but must find
    the same planted near-duplicate pairs at the same threshold."""
    from nous_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_near_dups,
        minhash_signatures,
        minhash_signatures_jvm,
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

    # the JVM hash family through the same banding finds the same pairs
    sigs_p = minhash_signatures_jvm(docs)
    cands_p = {
        (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs_p).collect()
    }
    assert expected <= cands_p

    # JVM signatures are deterministic across evaluations
    s1 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    s2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert s1 == s2


def test_simhash_blocks_near_dups(spark):
    """SimHash: identical docs get identical fingerprints; one-word
    edits land within small hamming distance; unrelated docs do not."""
    from nous_spark.operators.dedup import simhash_fingerprints, simhash_near_dups
    from pyspark.sql import functions as F

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),  # exact dup
            (2, base.replace("sigma", "SIGMA2")),  # near dup
            (3, "completely different words entirely here about other topics now"),
        ],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[1]  # identical text -> identical fingerprint
    near = {(r["id_a"], r["id_b"]) for r in simhash_near_dups(docs, max_hamming=10).collect()}
    assert (0, 1) in near  # hamming 0: guaranteed through any chunk
    # the 4x16 pigeonhole blocking GUARANTEES recall only for hamming<=3;
    # the one-word edit lands at hamming ~7 (family-dependent), so (0,2)
    # is best-effort — but nothing beyond the threshold may ever appear:
    h02 = bin(fps[0] ^ fps[2]).count("1")
    assert 0 < h02 <= 10
    assert (0, 3) not in near and (2, 3) not in near
    hams = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dups(docs, max_hamming=10).collect()}
    assert all(h <= 10 for h in hams.values())


def test_lang_id_col_matches_python(spark):
    from nous_spark.operators.text import lang_id_col, lang_id_text
    from pyspark.sql import functions as F

    texts = [
        "the cat sat on the mat and it was happy with the sun",
        "de que o do da em um uma para com os",
        "le la de et les des en un une du",
        "der die und das in von zu den mit",
        "el la de que y en los del se las",
        "zzz qqq xxx",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {r["i"]: r["l"] for r in df.select("i", lang_id_col(F.col("text")).alias("l")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == lang_id_text(t), (t, got[i], lang_id_text(t))


def test_embedding_near_dups_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_near_dups(empty, threshold=0.9).count() == 0
    assert embedding_near_dups_exact(empty, threshold=0.9).count() == 0


def test_buckets_multi_equals_per_table(spark):
    """The fused one-pass bucketing must reproduce each per-table
    hyperplane_buckets call exactly (same seeded planes per table)."""
    from nous_spark.operators.similarity import (
        hyperplane_buckets,
        hyperplane_buckets_multi,
    )

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    multi = hyperplane_buckets_multi(vecs, n_planes=6, n_tables=3, seed=42)
    got = {
        (r["vec_id"], r["tbl"]): r["bucket"] for r in multi.collect()
    }
    for t in range(3):
        solo = hyperplane_buckets(vecs, 6, None, 42 + 7919 * t).collect()
        assert all(got[(r["vec_id"], t)] == r["bucket"] for r in solo)
        assert len(solo) == sum(1 for (_, tt) in got if tt == t)


# ---------------------------------------------------------------- semantic decontamination
def test_decontaminate_semantic_matches_numpy_reference(spark):
    """Operator output == a brute-force numpy reference (rounded scores,
    max per row, smallest-eval-id tie-break) on seeded random vectors."""
    from nous_spark.operators.dedup import decontaminate_semantic

    rng = np.random.RandomState(11)
    vm = rng.standard_normal((60, DIM))
    rows = [(i, [float(x) for x in vm[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ev = df.filter("vec_id % 7 = 0")

    got = {r["vec_id"]: r for r in decontaminate_semantic(df, ev, 0.4).collect()}

    from nous_spark.operators.dedup import _round_half_away

    e_ids = np.array(sorted(i for i in range(60) if i % 7 == 0))
    # reference normalizes from the float32 column values, as the op sees them
    vm32 = vm.astype(np.float32).astype(np.float64)
    vn = vm32 / np.linalg.norm(vm32, axis=1, keepdims=True)
    r = _round_half_away(vn @ vn[e_ids].T)
    for i in range(60):
        best = int(np.argmax(r[i]))
        assert got[i]["max_eval_sim"] == pytest.approx(r[i].max(), abs=0)
        assert got[i]["nearest_eval_id"] == int(e_ids[best])
        assert got[i]["contaminated"] == bool(r[i].max() >= 0.4)
    # eval members self-match at exactly 1.0
    assert all(got[int(i)]["max_eval_sim"] == 1.0 for i in e_ids)


def test_decontaminate_semantic_tie_breaks_to_smallest_eval_id(spark):
    """Two byte-identical eval vectors tie on every rounded score — the
    nearest_eval_id must be the smaller id (the oracle's ORDER BY
    s DESC, eval_id ASC pick)."""
    from nous_spark.operators.dedup import decontaminate_semantic

    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(0, v), (5, v), (9, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ev = df.filter("vec_id != 9")
    got = {r["vec_id"]: r for r in decontaminate_semantic(df, ev, 0.9).collect()}
    assert got[0]["nearest_eval_id"] == 0 and got[5]["nearest_eval_id"] == 0
    assert got[0]["contaminated"] and got[5]["contaminated"]
    assert not got[9]["contaminated"] and got[9]["max_eval_sim"] == 0.0


def test_decontaminate_semantic_empty_eval_raises(spark):
    from nous_spark.operators.dedup import decontaminate_semantic

    df = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty eval set"):
        decontaminate_semantic(df, df.filter("vec_id < 0"))


def test_decontaminate_semantic_zero_vectors_match_duckdb_convention(spark):
    """Zero-norm vectors score exactly -1.0 against everything — DuckDB
    list_cosine_similarity's convention — on BOTH the training and the
    eval side, so a regenerated testdata with an all-zero embedding
    can't silently break oracle parity."""
    from nous_spark.operators.dedup import decontaminate_semantic

    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in
           decontaminate_semantic(df, df, threshold=0.5).collect()}
    # zero training vector: -1.0 vs every eval member, nearest = smallest id
    assert got[0]["max_eval_sim"] == -1.0
    assert got[0]["nearest_eval_id"] == 0 and not got[0]["contaminated"]
    # nonzero training vectors self-match at 1.0; the zero EVAL member
    # contributes -1.0, never 0.0
    assert got[1]["max_eval_sim"] == 1.0 and got[1]["nearest_eval_id"] == 1


def test_round_half_away_matches_duckdb(spark):
    """_round_half_away == DuckDB round(x, 4) on every 4-decimal
    midpoint in [-1, 1] plus uniform fuzz — the exact boundary where
    np.round (half-to-even) diverges."""
    import duckdb
    import pandas as pd

    from nous_spark.operators.dedup import _round_half_away

    rng = np.random.RandomState(5)
    xs = np.concatenate(
        [rng.uniform(-1, 1, 20000), np.arange(-10000, 10001) / 10000.0 + 0.00005]
    )
    con = duckdb.connect()
    con.register("xs_df", pd.DataFrame({"x": xs}))
    dd = con.sql("SELECT round(x, 4) AS r FROM xs_df").df()["r"].to_numpy()
    assert (dd == _round_half_away(xs)).all()
    # and np.round genuinely differs on midpoints (the bug this guards)
    assert (np.round(xs, 4) != dd).any()
