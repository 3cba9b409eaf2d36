"""Curation operators: deterministic stratified sampling + sequence
packing (oracle parity is covered by test_oracle_parity; these pin the
semantic invariants)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nous_spark.operators.curation import (
    hash_uniform_col,
    pack_sequences,
    stratified_sample,
)


def test_stratified_sample_deterministic_and_stratum_aware(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh", f"text {i}") for i in range(400)],
        "doc_id long, lang string, text string",
    )
    out1 = stratified_sample(docs, {"en": 0.25, "zh": 1.0}, default_fraction=0.0)
    out2 = stratified_sample(docs, {"en": 0.25, "zh": 1.0}, default_fraction=0.0)
    ids1 = {r["doc_id"] for r in out1.collect()}
    assert ids1 == {r["doc_id"] for r in out2.collect()}  # deterministic
    by_lang = {
        r["lang"]: r["n"]
        for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["zh"] == 200  # fraction 1.0 keeps everything
    assert 20 <= by_lang["en"] <= 80  # ~0.25 of 200, hash-binomial spread
    # a HIGHER fraction keeps a superset (same hash, higher threshold)
    wider = stratified_sample(docs, {"en": 0.6, "zh": 1.0}, default_fraction=0.0)
    assert ids1 <= {r["doc_id"] for r in wider.collect()}


def test_hash_uniform_range(spark):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    mm = docs.select(
        F.min(hash_uniform_col(F.col("doc_id"))).alias("lo"),
        F.max(hash_uniform_col(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0.0 <= mm["lo"] and mm["hi"] < 1.0


def test_pack_sequences_budget_and_conservation(spark):
    docs = spark.createDataFrame(
        [(i, "en", " ".join(["w"] * (50 + i % 37))) for i in range(200)],
        "doc_id long, lang string, text string",
    )
    out = pack_sequences(docs, budget_tokens=500).collect()
    assert len(out) == 200  # every doc assigned exactly once
    seqs: dict[int, int] = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        seqs[r["seq_id"]] = seqs.get(r["seq_id"], 0) + r["n_tokens"]
    sids = sorted(seqs)
    assert sids == list(range(len(sids)))  # contiguous from 0
    # budget-quantized: every sequence except the last holds >= budget
    # only via its straddling last doc; the PRECEDING sum is < budget
    max_doc = max(r["n_tokens"] for r in out)
    assert all(tok < 500 + max_doc for tok in seqs.values())
    assert sum(seqs.values()) == sum(r["n_tokens"] for r in out)


def test_tfidf_topk_semantics(spark):
    """A term present in every doc has idf 0; a distinctive term tops
    its doc's ranking; rank is dense 1..k per doc."""
    from nous_spark.operators.text import tfidf_topk_terms

    docs = spark.createDataFrame(
        [
            (0, "common alpha alpha common common"),
            (1, "common beta beta common"),
            (2, "common gamma common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # the distinctive term wins rank 1 in each doc; 'common' scores 0
    assert by_doc[0][0]["term"] == "alpha"
    assert by_doc[1][0]["term"] == "beta"
    assert by_doc[2][0]["term"] == "gamma"
    assert all(r["score"] == 0.0 for rows in by_doc.values() for r in rows if r["term"] == "common")


def test_pack_sequences_sharded_caps_window_partitions(spark):
    """n_shards caps the hot-group window (the CLAUDE.md hot-key-cap
    invariant): every (group, shard) window partition is strictly
    smaller than the group, sequence ids stay collision-free across
    shards (local*n_shards+shard namespacing), shard assignment is
    deterministic, and packing invariants (assignment, conservation,
    budget quantization) hold per shard."""
    from nous_spark.operators.curation import hash_shard_col

    n_shards = 4
    docs = spark.createDataFrame(
        [(i, "en", " ".join(["w"] * (50 + i % 37))) for i in range(400)],
        "doc_id long, lang string, text string",
    )
    out = pack_sequences(docs, budget_tokens=500, n_shards=n_shards).collect()
    assert len(out) == 400  # every doc assigned exactly once

    shard_of = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", hash_shard_col(F.col("doc_id"), n_shards).alias("s")
        ).collect()
    }
    # the window partition bound: no shard holds the whole group
    by_shard: dict[int, int] = {}
    for did, s in shard_of.items():
        by_shard[s] = by_shard.get(s, 0) + 1
    assert len(by_shard) == n_shards  # 400 md5 draws hit all 4 shards
    assert max(by_shard.values()) < 400
    # seq_id namespacing: a sequence's shard is recoverable as
    # seq_id % n_shards and matches every member's md5 shard
    for r in out:
        assert r["seq_id"] % n_shards == shard_of[r["doc_id"]]
    # packing invariants hold WITHIN each shard
    per_seq: dict[int, int] = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_tokens"]
    max_doc = max(r["n_tokens"] for r in out)
    assert all(tok < 500 + max_doc for tok in per_seq.values())
    assert sum(per_seq.values()) == sum(r["n_tokens"] for r in out)
    # per shard, local ids are contiguous from 0
    for s in range(n_shards):
        locals_ = sorted({sid // n_shards for sid in per_seq if sid % n_shards == s})
        assert locals_ == list(range(len(locals_)))


def test_pack_sequences_single_shard_unchanged(spark):
    """n_shards=1 is byte-identical to the unsharded form (the default
    contract existing callers rely on)."""
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr", " ".join(["w"] * (30 + i % 11))) for i in range(120)],
        "doc_id long, lang string, text string",
    )
    base = pack_sequences(docs, budget_tokens=300)
    one = pack_sequences(docs, budget_tokens=300, n_shards=1)
    assert base.exceptAll(one).isEmpty() and one.exceptAll(base).isEmpty()


def test_top_k_per_group_matches_single_window(spark):
    from nous_spark.operators.curation import top_k_per_group
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [(i, f"src{i % 7}", (i * 37) % 50) for i in range(300)],
        "doc_id long, source string, n_chars long",
    )
    sharded = top_k_per_group(docs, k=4, n_shards=8).collect()
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    exact = (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 4)
        .select("source", "doc_id", "n_chars", "rank")
        .collect()
    )
    key = lambda r: (r["source"], r["rank"])
    assert sorted(((r["source"], r["rank"], r["doc_id"]) for r in sharded)) == sorted(
        ((r["source"], r["rank"], r["doc_id"]) for r in exact)
    )
    # every group capped at k, ranks contiguous from 1
    by_grp: dict[str, list[int]] = {}
    for r in sharded:
        by_grp.setdefault(r["source"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 4
               for v in by_grp.values())
    # unsharded path identical
    plain = top_k_per_group(docs, k=4, n_shards=1).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, sharded))


def test_token_budget_mix_semantics(spark):
    from nous_spark.operators.curation import token_budget_mix

    docs = spark.createDataFrame(
        [
            (i, "en" if i < 400 else ("zh" if i < 500 else "xx"),
             " ".join(["w"] * 10))
            for i in range(600)
        ],
        "doc_id long, lang string, text string",
    )
    # en: 4000 tokens, zh: 1000 tokens, xx: unweighted -> dropped
    out = token_budget_mix(docs, {"en": 0.5, "zh": 0.5}, budget_tokens=2000)
    rows = out.collect()
    assert all(r["lang"] != "xx" for r in rows)
    n_en = sum(1 for r in rows if r["lang"] == "en")
    n_zh = sum(1 for r in rows if r["lang"] == "zh")
    # zh fraction capped at 1.0 (budget*0.5 = 1000 >= its 1000 tokens)
    assert n_zh == 100
    # en fraction = 1000/4000 = 0.25 of 400 docs, binomial spread
    assert 60 <= n_en <= 140
    # deterministic
    again = {r["doc_id"] for r in token_budget_mix(
        docs, {"en": 0.5, "zh": 0.5}, budget_tokens=2000).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_curation_pipeline_stage_semantics(spark):
    from nous_spark.operators.curation import curation_pipeline

    good = ("spark rows flow nicely. " * 8).strip()  # passes quality gates
    docs = spark.createDataFrame(
        [(1, "en", good), (2, "en", good),            # exact dups: min id wins
         (3, "en", good + " extra"), (4, "zh", good + " zh variant"),
         (5, "en", "too short"),                      # quality-filtered
         (6, "xx", good + " unweighted")],            # unweighted stratum
        "doc_id long, lang string, text string",
    )
    out = curation_pipeline(
        docs, {"en": 0.5, "zh": 0.5}, mix_budget_tokens=10_000, n_shards=2
    ).collect()
    ids = {r["doc_id"] for r in out}
    assert 2 not in ids          # exact-dup loser
    assert 5 not in ids          # failed quality
    assert 6 not in ids          # unweighted stratum
    # budget >> corpus -> fractions cap at 1.0, all survivors kept
    assert ids == {1, 3, 4}
    assert all(r["n_tokens"] > 0 and r["seq_id"] >= 0 for r in out)


def test_quality_weighted_sample_pareto_rule(spark):
    """quality_weighted_sample == the Python reference of the inverted
    GPT-3 Pareto rule (u > 1 - (2-score)^-alpha with the md5 uniform
    draw), keep rate is monotone in score, and score=1 rows are kept
    (threshold 0, u > 0 for every realizable draw)."""
    import hashlib

    from nous_spark.operators.curation import quality_weighted_sample

    rows = [(i, round(0.05 + 0.9 * (i % 20) / 19, 4)) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, quality_score double")
    kept = {r.doc_id for r in quality_weighted_sample(docs, alpha=9.0).collect()}

    def u(i):
        return int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:8], 16) / 2**32

    want = {
        i for i, s in rows if u(i) > round(1.0 - (2.0 - s) ** -9.0, 6)
    }
    assert kept == want
    # monotone: the top-score band keeps (weakly) more than the bottom band
    lo = [i for i, s in rows if s < 0.2]
    hi = [i for i, s in rows if s > 0.8]
    assert len(kept & set(hi)) / len(hi) > len(kept & set(lo)) / len(lo)
    # score=1 -> threshold 0 -> kept for any nonzero draw
    ones = spark.createDataFrame([(7, 1.0), (8, 1.0)], "doc_id long, quality_score double")
    assert {r.doc_id for r in quality_weighted_sample(ones).collect()} == {7, 8}


# --------------------------------------------------------- quantile buckets
def test_quantile_buckets_exact_order_statistics(spark):
    """scores 1..10, cuts at 0.2/0.5: t0 = 2nd smallest = 2,
    t1 = 5th smallest = 5; buckets split 2/3/5."""
    from nous_spark.operators.curation import quantile_buckets

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "doc_id long, s double"
    )
    out = {r["doc_id"]: r["bucket"]
           for r in quantile_buckets(df, "s", (0.2, 0.5)).collect()}
    assert [out[i] for i in range(1, 11)] == (
        ["head"] * 2 + ["middle"] * 3 + ["tail"] * 5
    )


def test_quantile_buckets_ties_fall_low_and_groups_independent(spark):
    """Ties at a threshold all take the lower bucket (head may exceed
    q0); each group gets its own thresholds; NULL scores are dropped."""
    from nous_spark.operators.curation import quantile_buckets

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 1.0), (3, "a", 1.0), (4, "a", 9.0),
         (5, "b", 5.0), (6, "b", 6.0), (7, "b", 7.0), (8, "b", 8.0),
         (9, "b", None)],
        "doc_id long, lang string, s double",
    )
    rows = quantile_buckets(df, "s", (0.25, 0.5), group_col="lang").collect()
    out = {r["doc_id"]: r["bucket"] for r in rows}
    # group a: n=4, t0 = 1st smallest = 1.0 -> ALL three 1.0s are head
    assert out[1] == out[2] == out[3] == "head"
    assert out[4] == "tail"
    # group b: n=4 (NULL dropped), t0=5.0, t1=6.0
    assert out[5] == "head" and out[6] == "middle"
    assert out[7] == out[8] == "tail"
    assert 9 not in out


def test_quantile_buckets_validates_arguments(spark):
    import pytest as _pytest

    from nous_spark.operators.curation import quantile_buckets

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, s double")
    with _pytest.raises(ValueError, match="labels"):
        quantile_buckets(df, "s", (0.5,), labels=("a", "b", "c"))
    with _pytest.raises(ValueError, match="ascending"):
        quantile_buckets(df, "s", (0.9, 0.1), labels=("a", "b", "c"))
    with _pytest.raises(ValueError, match="ascending"):
        quantile_buckets(df, "s", (0.0, 0.5), labels=("a", "b", "c"))


# ---------------------------------------------------------------- shuffle_to_shards
def test_shuffle_to_shards_matches_python_reference(spark):
    """(shard, pos) == a pure-Python md5 reference: shard from the
    'id:seed' 32-bit draw, order from the independent 'id:shuf:seed'
    full digest, ties by id."""
    import hashlib

    from nous_spark.operators.curation import shuffle_to_shards

    ids = list(range(300))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shuffle_to_shards(docs, n_shards=8, seed=42).collect()}

    def shard(i):
        return int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:8], 16) % 8

    def sk(i):
        return hashlib.md5(f"{i}:shuf:42".encode()).hexdigest()

    want = {}
    for s in range(8):
        members = sorted((i for i in ids if shard(i) == s), key=lambda i: (sk(i), i))
        for pos, i in enumerate(members, start=1):
            want[i] = (s, pos)
    assert got == want


def test_shuffle_to_shards_invariant_to_physical_partitioning(spark):
    """The layout is a pure function of (id, seed, n_shards): any
    repartitioning of the input produces the byte-identical map — the
    resumability/reproducibility contract."""
    from nous_spark.operators.curation import shuffle_to_shards

    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = sorted(map(tuple, shuffle_to_shards(docs, 16).collect()))
    b = sorted(map(tuple, shuffle_to_shards(docs.repartition(13), 16).collect()))
    assert a == b
    # positions are 1..size contiguous per shard
    from collections import Counter
    per = Counter(s for _, s, _ in a)
    pos = {}
    for _, s, p in a:
        pos.setdefault(s, set()).add(p)
    assert all(pos[s] == set(range(1, per[s] + 1)) for s in per)
    # a different seed produces a different order (not a constant map)
    c = sorted(map(tuple, shuffle_to_shards(docs, 16, seed=7).collect()))
    assert a != c


def test_soft_dedup_matches_python_reference_and_downweights(spark):
    """soft_dedup == the pure-Python rule (u(id) < 1/n_copies with the
    md5 draw) on planted duplicate clusters; uniques always survive;
    result invariant to physical partitioning; NULL text groups with
    ''."""
    import hashlib

    from nous_spark.operators.dedup import soft_dedup

    rows = []
    for i in range(200):
        rows.append((i, f"unique text {i}"))
    for i in range(200, 260):
        rows.append((i, "the boilerplate cookie banner"))  # one 60-copy cluster
    rows.append((260, None))
    rows.append((261, ""))  # NULL and '' share a cluster (coalesce rule)
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {r["doc_id"]: (r["n_copies"], r["keep"])
           for r in soft_dedup(docs, seed=42).collect()}
    assert sorted(got) == [r[0] for r in rows]

    def u(i):
        return int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:8], 16) / 2**32

    for i, t in rows:
        n = 60 if 200 <= i < 260 else (2 if i >= 260 else 1)
        assert got[i] == (n, u(i) < 1.0 / n), (i, got[i], n)
    assert all(got[i][1] for i in range(200))  # uniques: always kept
    survivors = sum(got[i][1] for i in range(200, 260))
    assert 0 <= survivors <= 5  # E=1 of 60 copies; the draw is fixed, just sane-bound it

    re = {r["doc_id"]: (r["n_copies"], r["keep"])
          for r in soft_dedup(docs.repartition(11), seed=42).collect()}
    assert re == got


# ---------------------------------------------------------------------------
# chunk_documents: fixed-window token chunking
# ---------------------------------------------------------------------------
def _py_chunks(text, max_tokens, stride):
    """Pure-Python reference: re.split to match Java/Spark \\s semantics
    (Python str.split() also breaks on NBSP/\\x1c-\\x1f, which Java \\s
    does not — test texts stay ASCII-whitespace so both agree)."""
    import re

    toks = [t for t in re.split(r"\s+", text.strip()) if t]
    return [
        (k, min(max_tokens, len(toks) - s), " ".join(toks[s : s + max_tokens]))
        for k, s in enumerate(range(0, len(toks), stride))
    ]


def _run_chunks(spark, rows, max_tokens, stride):
    from nous_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, max_tokens=max_tokens, stride=stride)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        )
    return {k: sorted(v) for k, v in got.items()}


CHUNK_DOCS = [
    (1, "one two three four five six seven"),  # short tail window
    (2, "  padded \t with\n\nmixed   whitespace runs here  "),
    (3, "a b c d"),  # == max_tokens for the (4, 4) case
    (4, "solo"),
    (5, " ".join(f"w{i}" for i in range(23))),  # just under a boundary
    (6, " ".join(f"w{i}" for i in range(24))),  # exactly a boundary
    (7, "\tleading tab and trailing newline\n"),  # non-space \s edges
]


@pytest.mark.parametrize("max_tokens,stride", [(4, 4), (4, 2), (24, 16), (5, 3)])
def test_chunk_documents_matches_python_reference(spark, max_tokens, stride):
    got = _run_chunks(spark, CHUNK_DOCS, max_tokens, stride)
    for doc_id, text in CHUNK_DOCS:
        assert got.get(doc_id, []) == _py_chunks(text, max_tokens, stride), doc_id


def test_chunk_documents_disjoint_partition_when_stride_equals_max(spark):
    # stride == max_tokens: chunks tile the token list exactly — the
    # rejoined chunk_texts reproduce the canonicalized document and
    # n_tokens sums to the token count.
    got = _run_chunks(spark, CHUNK_DOCS, 4, 4)
    for doc_id, text in CHUNK_DOCS:
        toks = text.split()
        chunks = got[doc_id]
        assert " ".join(c[2] for c in chunks) == " ".join(toks)
        assert sum(c[1] for c in chunks) == len(toks)


def test_chunk_documents_overlap_invariant(spark):
    # stride < max_tokens: chunk k's tail (max - stride tokens) equals
    # chunk k+1's head whenever chunk k is full.
    max_tokens, stride = 6, 4
    got = _run_chunks(spark, CHUNK_DOCS, max_tokens, stride)
    for chunks in got.values():
        for (_, n1, t1), (_, _, t2) in zip(chunks, chunks[1:]):
            if n1 == max_tokens:
                tail = t1.split()[stride:]  # the max - stride overlap tokens
                assert t2.split()[: len(tail)] == tail


def test_chunk_documents_skips_empty_and_null(spark):
    from nous_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   \n\t  "), (4, "kept")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, max_tokens=4, stride=4).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(4, "kept")]


def test_chunk_documents_rejects_bad_params(spark):
    from nous_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0, stride=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, stride=0)


def test_chunk_documents_chunk_count_formula(spark):
    # one window starts at every 1 + k*stride <= n  =>  floor((n-1)/stride)+1
    got = _run_chunks(spark, CHUNK_DOCS, 5, 3)
    for doc_id, text in CHUNK_DOCS:
        n = len(text.split())
        assert len(got[doc_id]) == (n - 1) // 3 + 1, doc_id


# ---------------------------------------------------------------------------
# corpus_datacard: per-group composition report
# ---------------------------------------------------------------------------
DATACARD_ROWS = [
    # src_a: an exact-dup pair + the NULL≡'' identity pair (NULL text and
    # '' hash together; NULL drops out of token stats but counts in n_docs)
    (1, "the of and to in a is that it was here now", "src_a"),
    (2, "the of and to in a is that it was here now", "src_a"),
    (3, None, "src_a"),
    (4, "", "src_a"),
    (5, "o que de e a em um para com não por mais", "src_a"),
    # src_b: 1 en vs 1 pt vs 1 und — mode ties broken (count DESC, lang ASC)
    (6, "the of and to in a is that it was", "src_b"),
    (7, "o que de e a em um para com não", "src_b"),
    (8, "zzz qqq xxx www yyy kkk jjj", "src_b"),
]


def test_corpus_datacard_edge_semantics(spark):
    from nous_spark.operators.curation import corpus_datacard

    docs = spark.createDataFrame(DATACARD_ROWS, "doc_id long, text string, source string")
    got = {r["source"]: r.asDict() for r in corpus_datacard(docs).collect()}

    a = got["src_a"]
    assert a["n_docs"] == 5
    # doc 3 (NULL) out of token stats; docs 1/2 have 12 tokens, doc 4 -> 1
    assert (a["min_doc_tokens"], a["max_doc_tokens"]) == (1, 12)
    assert a["n_tokens"] == 12 + 12 + 1 + 12
    # 5 docs, distinct texts = {dup-text, ''(=NULL too), pt-text} = 3
    assert a["exact_dup_frac"] == round(1 - 3 / 5, 4)
    assert a["top_lang"] == "en" and a["top_lang_frac"] == round(2 / 5, 4)

    b = got["src_b"]
    assert b["n_docs"] == 3 and b["exact_dup_frac"] == 0.0
    # 1 en / 1 pt / 1 und — the count tie resolves to the ASC-first lang
    assert b["top_lang"] == "en" and b["top_lang_frac"] == round(1 / 3, 4)


def test_corpus_datacard_duckdb_oracle_on_edge_corpus(spark):
    """The generated oracle must agree on the edge corpus too (the sf
    parity run sees no exact dups and no NULL text)."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _build_datacard_sql
    from nous_spark.operators.curation import corpus_datacard

    docs = spark.createDataFrame(DATACARD_ROWS, "doc_id long, text string, source string")
    got = corpus_datacard(docs).toPandas().sort_values("source").reset_index(drop=True)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(DATACARD_ROWS, columns=["doc_id", "text", "source"]),
    )
    want = con.execute(_build_datacard_sql()).df().sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
