"""Curation operators: deterministic stratified sampling + sequence
packing (oracle parity is covered by test_oracle_parity; these pin the
semantic invariants)."""

from __future__ import annotations

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
