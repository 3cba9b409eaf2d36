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
    cap, so the self-join is replaced by the STAR-CHAIN to the bucket min
    (linear: 299 hub pairs, never C(300,2)=44850); the planted pairs
    (small buckets) are still found, and — the advisor's cluster-recall
    fix — every over-cap cluster member still surfaces in some pair."""
    sigs = minhash_signatures(boilerplate_corpus)
    cands = lsh_candidate_pairs(sigs, n_hashes=64, max_bucket=64).collect()
    got = {(r["id_a"], r["id_b"]) for r in cands}
    assert PLANTED <= got
    boiler_pairs = {(a, b) for a, b in got if a < 1000 and b < 1000}
    # linear star pairs only: every hot-bucket pair is (hub=0, member)
    assert boiler_pairs == {(0, x) for x in range(1, 300)}
    # bounded: ~n star pairs + planted/cross-variant candidates — never
    # the C(300,2)=44850 quadratic blow-up
    assert len(got) < 1000

    near = minhash_near_dups(boilerplate_corpus, threshold=0.5, max_bucket=64).collect()
    near_pairs = {(r["id_a"], r["id_b"]) for r in near}
    assert PLANTED <= near_pairs
    # cluster membership survives the cap: all 300 identical docs appear
    covered = {a for a, _ in near_pairs if a < 1000} | {
        b for _, b in near_pairs if b < 1000
    }
    assert covered == set(range(300))


def test_simhash_hot_bucket_cap_bounds_boilerplate(boilerplate_corpus):
    from nous_spark.operators.dedup import simhash_fingerprints

    near = simhash_near_dups(
        boilerplate_corpus, max_hamming=10, max_bucket=64
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in near}
    # boilerplate chunk buckets (300 members) star-chain to the hub —
    # linear pairs at hamming 0, never the quadratic self-join
    boiler_pairs = {(a, b) for a, b in got if a < 1000 and b < 1000}
    assert boiler_pairs == {(0, x) for x in range(1, 300)}
    # radius contract: with chunks derived from max_hamming (pigeonhole
    # needs h+1 chunks), EVERY planted pair whose true hamming is <= 10
    # must be found — no family-dependent slack
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(boilerplate_corpus).collect()
    }
    expected = {
        (a, b) for a, b in PLANTED if bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1") <= 10
    }
    assert expected == PLANTED & got
    assert len(expected) >= 4  # one-word edits stay close in simhash space


def test_simhash_radius_contract(spark):
    """A hamming-6 pair that disagrees on ALL FOUR 16-bit chunks (the
    round-2 silent miss: fixed 4-chunk blocking cannot see it) must be
    found once the chunk count derives from the radius."""
    from nous_spark.operators.dedup import simhash_near_dups

    fp_a = 0
    fp_b = (1 << 0) | (1 << 1) | (1 << 16) | (1 << 17) | (1 << 32) | (1 << 48)
    docs = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    fps = spark.createDataFrame([(1, fp_a), (2, fp_b)], "doc_id long, simhash long")
    out = simhash_near_dups(docs, max_hamming=6, fingerprints=fps).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in out} == {(1, 2, 6)}
    # and the same pair at a radius below its distance is correctly absent
    out3 = simhash_near_dups(docs, max_hamming=5, fingerprints=fps).collect()
    assert out3 == []


def test_simhash_radius_zero_full_word_chunk(spark):
    """max_hamming=0 puts the whole 64-bit word in ONE chunk — the mask
    literal (1<<64)-1 would overflow Spark's long (advisor finding), so
    the full-width chunk must skip the mask. Exact-duplicate
    fingerprints (including negative longs, i.e. bit 63 set) match;
    hamming-1 neighbors don't."""
    from nous_spark.operators.dedup import simhash_near_dups

    neg = -(1 << 62) | 5  # bit-63 territory: sign handling matters
    docs = spark.createDataFrame(
        [(i, "x") for i in range(1, 5)], "doc_id long, text string"
    )
    fps = spark.createDataFrame(
        [(1, neg), (2, neg), (3, neg ^ 1), (4, 7)], "doc_id long, simhash long"
    )
    out = simhash_near_dups(docs, max_hamming=0, fingerprints=fps).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in out} == {(1, 2, 0)}


def test_simhash_caller_cache_preserved(spark):
    """A caller-persisted fingerprints frame must stay cached after the
    call (advisor finding: the finally-block unpersist was evicting it);
    a frame the operator builds itself is still cleaned up."""
    from nous_spark.operators.dedup import simhash_near_dups

    docs = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    fps = spark.createDataFrame(
        [(1, 3), (2, 3)], "doc_id long, simhash long"
    ).persist()
    try:
        fps.count()
        out = simhash_near_dups(docs, max_hamming=1, fingerprints=fps).collect()
        assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
        assert fps.is_cached  # reuse-across-radii cache survives
    finally:
        fps.unpersist()


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
    """Hundreds of identical vectors collapse into one bucket per table;
    the cap star-chains them to the hub (linear cluster coverage) instead
    of emitting a quadratic pair set."""
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
    cluster_pairs = {(a, b_) for a, b_ in got if a < 900 and b_ < 900}
    # linear star shape, full cluster coverage, no quadratic blow-up
    assert cluster_pairs == {(0, x) for x in range(1, 500)}
    assert (900, 901) in got


def test_embedding_near_dups_empty_input_schema(spark):
    """Empty corpus with STRING ids: the empty fast path must derive its
    schema from the input (round-2 hardcoded long ids), so it unions
    cleanly with a non-empty result."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    out = embedding_near_dups(empty)
    assert out.count() == 0
    assert out.schema["id_a"].dataType == T.StringType()
    nonempty = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.001])], schema
    )
    got = embedding_near_dups(nonempty, threshold=0.9, n_planes=2)
    # schemas align -> the union is legal and keeps the real pair
    unioned = out.unionByName(got).collect()
    assert {(r["id_a"], r["id_b"]) for r in unioned} == {("a", "b")}


def test_dedup_corpus_transitive_cluster_and_string_order(spark):
    """a~b, b~c => one cluster keeps only min id; numeric ids must pick
    the NUMERIC min (9 survives {9, 10}, not string-min '10')."""
    from nous_spark.operators.dedup import dedup_corpus

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (0, 1, 2, 3, 9, 10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 10)], "id_a long, id_b long"
    )
    out = dedup_corpus(docs, pairs)
    assert {r["doc_id"] for r in out.collect()} == {0, 1, 9}
    assert out.columns == docs.columns  # survivors keep all columns


def test_dedup_lines_hot_line_is_pure_aggregation(spark):
    """A cookie-banner line shared by EVERY doc is the C4 hot key. The
    operator is aggregation-shaped (map-side combine on md5(line), no
    pair join), so the hot line must cost one stats row, not a blowup —
    asserted behaviorally: 5k docs x 1 shared line dedups correctly and
    the per-doc reassembly preserves each doc's unique payload."""
    from nous_spark.operators.dedup import dedup_lines_corpus

    n = 5000
    docs = spark.createDataFrame(
        [(i, f"ACCEPT COOKIES\nunique payload {i}") for i in range(n)],
        "doc_id long, text string",
    )
    out = dedup_lines_corpus(docs, min_df=2)
    agg = out.selectExpr(
        "sum(n_dropped) AS dropped",
        "sum(n_kept) AS kept",
        "min(doc_id) AS lo",
    ).first()
    # every doc except doc 0 (min id keeps its copy) drops the banner
    assert agg["dropped"] == n - 1
    assert agg["kept"] == n + 1  # n unique payloads + doc 0's banner
    sample = {r["doc_id"]: r["text_clean"] for r in out.filter("doc_id in (0, 4321)").collect()}
    assert sample[0] == "ACCEPT COOKIES\nunique payload 0"
    assert sample[4321] == "unique payload 4321"


def test_substring_dedup_hot_gram_is_pure_aggregation(spark):
    """The boilerplate-license span shared by EVERY doc is the hot key.
    substring_dedup is aggregation-shaped (map-side combine on the gram
    md5, no pair join anywhere in the plan), so 5k docs sharing a
    20-token license must dedup correctly at aggregation cost: every doc
    but doc 0 loses exactly the 20 license tokens as ONE maximal span and
    keeps its unique 16-token body."""
    from nous_spark.operators.dedup import substring_dedup

    n = 5000
    lic = " ".join(f"lic{i}" for i in range(20))
    # the first body token is doc-unique (u{i}) so no boundary-straddling
    # gram is shared — coverage is exactly the 20 license tokens
    docs = spark.createDataFrame(
        [(i, f"{lic} u{i} " + " ".join(f"b{i}x{j}" for j in range(14)))
         for i in range(n)],
        "doc_id long, text string",
    )
    out = substring_dedup(docs, min_len=13)
    agg = out.selectExpr(
        "sum(n_dup_tokens) AS dup",
        "sum(n_dup_spans) AS spans",
        "sum(n_tokens) AS total",
    ).first()
    assert agg["dup"] == (n - 1) * 20
    assert agg["spans"] == n - 1
    assert agg["total"] == n * 35
    sample = {
        r["doc_id"]: r
        for r in out.filter("doc_id in (0, 4321)").collect()
    }
    assert sample[0]["n_dup_tokens"] == 0 and sample[0]["text_clean"].startswith(lic)
    assert sample[4321]["n_dup_tokens"] == 20
    assert sample[4321]["text_clean"].startswith("u4321 b4321x0")
    # no pairwise operator in the physical plan: a join keyed by the
    # gram hash and aggregations only — assert no CartesianProduct /
    # BroadcastNestedLoopJoin snuck in
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_dedup_corpus_best_picks_quality_survivor(spark):
    """dedup_corpus_best keeps the argmax(order_col) member per
    transitive cluster (id-asc tiebreak), singletons untouched, and the
    sharded two-phase pick equals the n_shards=1 single-window answer —
    including on a 300-member mega-cluster (the hot-cluster case the
    shard cap exists for)."""
    from nous_spark.operators.dedup import dedup_corpus, dedup_corpus_best

    docs = spark.createDataFrame(
        [(i, "x" * (100 - i) if i < 8 else "y" * i) for i in range(1, 13)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    # clusters {1,2,3} (transitive via 1-2, 2-3) and {5,9}; rest singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 9)], "id_a long, id_b long")

    best = sorted(r.doc_id for r in dedup_corpus_best(docs, pairs, "n_chars").collect())
    assert best == [1, 4, 5, 6, 7, 8, 10, 11, 12]  # longest per cluster
    # ascending keeps the SHORTEST member instead
    asc = sorted(
        r.doc_id
        for r in dedup_corpus_best(docs, pairs, "n_chars", descending=False).collect()
    )
    assert asc == [3, 4, 6, 7, 8, 9, 10, 11, 12]
    # equal-order ties fall back to min id (2 beats 3; both beat 1)
    tied = docs.withColumn(
        "n_chars", F.when(F.col("doc_id").isin(2, 3), 500).otherwise(F.col("n_chars"))
    )
    t = sorted(r.doc_id for r in dedup_corpus_best(tied, pairs, "n_chars").collect())
    assert 2 in t and 3 not in t and 1 not in t
    # differs from min-id dedup_corpus exactly when the best != min id
    minid = sorted(r.doc_id for r in dedup_corpus(tied, pairs).collect())
    assert 1 in minid and 2 not in minid

    # mega-cluster: 300 docs chained pairwise, winner = unique longest;
    # sharded result == unsharded result
    mega = spark.createDataFrame(
        [(i, "z" * (1000 if i == 177 else 10 + i % 7)) for i in range(300)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a long, id_b long"
    )
    got = [r.doc_id for r in dedup_corpus_best(mega, chain, "n_chars").collect()]
    assert got == [177]
    got1 = [
        r.doc_id
        for r in dedup_corpus_best(mega, chain, "n_chars", n_shards=1).collect()
    ]
    assert got1 == got


def test_dedup_incremental_within_and_cross_snapshot(spark):
    """dedup_incremental drops in-batch duplicates to the min-id rep AND
    every doc whose exact text already exists in the seen-hash table,
    keeping unseen singletons untouched with all columns."""
    from nous_spark.operators.dedup import dedup_incremental, text_hashes

    prev = spark.createDataFrame(
        [(100, "already ingested page"), (101, "another old page")],
        "doc_id long, text string",
    )
    seen = text_hashes(prev)
    batch = spark.createDataFrame(
        [
            (1, "brand new page"),
            (2, "already ingested page"),   # seen in snapshot -> dropped
            (3, "repeated in batch"),
            (4, "repeated in batch"),       # in-batch dup -> min-id rep only
            (5, "another new page"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in dedup_incremental(batch, seen).collect()}
    assert out == {
        1: "brand new page",
        3: "repeated in batch",
        5: "another new page",
    }
    # idempotent re-ingest: after appending the survivors' hashes, the
    # same batch yields nothing new
    seen2 = seen.union(text_hashes(dedup_incremental(batch, seen)))
    assert dedup_incremental(batch, seen2).count() == 0
