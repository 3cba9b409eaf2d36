"""Semantic-layer tests — the batch analogs of the reference's Qdrant +
RAG integration suites (test_qdrant_repository_integration.py,
test_get_entity_with_rag_integration.py:102-474): deterministic point
ids, entity-scoped vector search, min-score threshold, graph
verification semi-join (cross-entity leak prevention :399-434), and the
summarizer qualifier rules (test_get_entity_summary.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from nous_spark.normalize import point_id_for
from nous_spark.semantic import (
    NO_FACTS_SUMMARY,
    build_embeddings,
    embed_text,
    entity_summary,
    rag_recall,
    rag_recall_debug,
    summarize_entities,
)

TS = dt.datetime(2024, 1, 1)
DIM = 256  # small dim for test speed; prod default is 768 (settings.py:94-96)

EDGE_SCHEMA = (
    "src string, edge_type string, dst string, pred string, "
    "confidence double, is_primary boolean, created_at timestamp"
)


@pytest.fixture(scope="module")
def graph(spark):
    edges = spark.createDataFrame(
        [
            ("eA", "HAS_IDENTIFIER", "email:a@x.com", None, None, True, TS),
            ("eB", "HAS_IDENTIFIER", "email:b@x.com", None, None, True, TS),
            ("eA", "HAS_FACT", "Hobby:Hiking", "enjoys", 0.95, None, TS),
            ("eA", "HAS_FACT", "Location:Paris", "lives_in", 0.98, None, TS),
            ("eA", "HAS_FACT", "Company:Google", "works_at", 0.8, None, TS),
            ("eB", "HAS_FACT", "Hobby:Surfing", "enjoys", 0.9, None, TS),
        ],
        EDGE_SCHEMA,
    )
    facts = spark.createDataFrame(
        [
            ("Hobby:Hiking", "Hiking", "Hobby"),
            ("Location:Paris", "Paris", "Location"),
            ("Company:Google", "Google", "Company"),
            ("Hobby:Surfing", "Surfing", "Hobby"),
        ],
        "fact_id string, name string, fact_type string",
    )
    return edges, facts


@pytest.fixture(scope="module")
def embeddings(graph):
    edges, facts = graph
    return build_embeddings(edges, facts, dim=DIM).cache()


# ------------------------------------------------------------- embedder
def test_embed_deterministic_and_normalized():
    a = embed_text("The entity enjoys Hobby: Hiking", DIM)
    b = embed_text("The entity enjoys Hobby: Hiking", DIM)
    assert np.array_equal(a, b)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-5
    assert np.array_equal(embed_text("", DIM), np.zeros(DIM, dtype=np.float32))


def test_embed_similarity_orders_sensibly():
    q = embed_text("hiking hobby outdoors", DIM)
    hit = embed_text("The entity enjoys Hobby: Hiking", DIM)
    miss = embed_text("The entity works_at Company: Google", DIM)
    assert float(q @ hit) > float(q @ miss)


# ------------------------------------------------------- embeddings table
def test_build_embeddings_point_ids_and_idempotency(graph, embeddings):
    rows = {r["point_id"]: r for r in embeddings.collect()}
    expected_pid = point_id_for("default", "eA", "enjoys", "Hobby:Hiking")
    assert expected_pid in rows
    r = rows[expected_pid]
    assert r["sentence"] == "The entity enjoys Hobby: Hiking"
    assert len(r["vector"]) == DIM
    # idempotency: rebuild + union + dedup == original (A4 deterministic upsert)
    edges, facts = graph
    again = build_embeddings(edges, facts, dim=DIM)
    merged = embeddings.unionByName(again).dropDuplicates(["point_id"])
    assert merged.count() == embeddings.count() == 4


# --------------------------------------------------------------- RAG path
def test_rag_recall_restricted_to_entity(graph, embeddings):
    edges, facts = graph
    out = rag_recall(edges, facts, embeddings, "email", "a@x.com", "hiking hobby", dim=DIM).collect()
    assert out, "expected at least one verified hit"
    assert all(r["entity_id"] == "eA" for r in out)
    out = sorted(out, key=lambda r: r["rank"])
    assert out[0]["fact_id"] == "Hobby:Hiking"  # best score ranks first (E4)
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, len(out) + 1)
    )


def test_rag_min_score_and_top_k(graph, embeddings):
    edges, facts = graph
    assert (
        rag_recall(
            edges, facts, embeddings, "email", "a@x.com", "hiking hobby", min_score=0.99, dim=DIM
        ).count()
        == 0
    )
    one = rag_recall(edges, facts, embeddings, "email", "a@x.com", "hiking hobby", top_k=1, dim=DIM)
    assert one.count() == 1


def test_rag_verification_blocks_cross_entity_leak(spark, graph, embeddings):
    """A poisoned vector row claims eA asserts eB's fact; the graph
    verification semi-join (C6, get_entity_usecase.py:145-160) must drop
    it — mirror of the leak test :399-434."""
    edges, facts = graph
    fake = spark.createDataFrame(
        [
            (
                "fake-point",
                embed_text("hiking hobby outdoors surfing", DIM).tolist(),
                "default",
                "eA",
                "Hobby:Surfing",  # NOT in eA's graph facts
                "enjoys",
                "poisoned",
            )
        ],
        embeddings.schema,
    )
    out = rag_recall(
        edges, facts, embeddings.unionByName(fake), "email", "a@x.com", "hiking hobby", dim=DIM
    ).collect()
    assert all(r["fact_id"] != "Hobby:Surfing" for r in out)


def test_rag_debug_metrics(graph, embeddings):
    edges, facts = graph
    rows, dbg = rag_recall_debug(
        edges, facts, embeddings, "email", "a@x.com", "hiking hobby", top_k=5, dim=DIM
    )
    assert dbg["candidates_found"] >= dbg["results_after_verification"] == len(rows)
    assert dbg["vector_search_ms"] > 0 and dbg["graph_verify_ms"] > 0


# ------------------------------------------------- vector mirror maintenance
def test_vector_mirror_deletes(graph, embeddings):
    from nous_spark.semantic import remove_entity_vectors, remove_relationship_vector

    one_gone = remove_relationship_vector(
        embeddings, "default", "eA", "enjoys", "Hobby:Hiking"
    )
    assert one_gone.count() == embeddings.count() - 1
    remaining, n_deleted = remove_entity_vectors(embeddings, "eA")
    assert n_deleted == 3
    assert remaining.filter(F.col("entity_id") == "eA").count() == 0
    assert remaining.count() == embeddings.count() - 3


# ------------------------------------------------------------- summaries
def test_summary_qualifiers(graph):
    edges, facts = graph
    s = {r["entity_id"]: r for r in summarize_entities(edges, facts).collect()}
    a = s["eA"]["summary"]
    assert a.startswith("The entity ")
    assert "enjoys Hobby: Hiking" in a and "likely " not in a.split("enjoys")[0]
    assert "likely works_at Company: Google" in a  # 0.8 -> likely
    assert "lives_in Location: Paris" in a
    assert s["eA"]["n_facts"] == 3


def test_summary_possibly_qualifier(spark, graph):
    _, facts = graph
    edges = spark.createDataFrame(
        [
            ("eC", "HAS_IDENTIFIER", "email:c@x.com", None, None, True, TS),
            ("eC", "HAS_FACT", "Hobby:Hiking", "enjoys", 0.5, None, TS),
        ],
        EDGE_SCHEMA,
    )
    s = summarize_entities(edges, facts).collect()[0]["summary"]
    assert "possibly enjoys Hobby: Hiking" in s


def test_summary_lang_templates(spark, graph):
    """routes/lookup.py:147 lang parameter: pt/es templates for prefix +
    qualifiers; unknown codes fall back to English; the zero-fact string
    is localized too."""
    from nous_spark.semantic import entity_summary

    edges, facts = graph
    pt = {r["entity_id"]: r for r in summarize_entities(edges, facts, lang="pt-br").collect()}
    a = pt["eA"]["summary"]
    assert a.startswith("A entidade ")
    assert "provavelmente works_at Company: Google" in a  # 0.8 -> likely(pt)
    es = summarize_entities(edges, facts, lang="es").collect()[0]["summary"]
    assert es.startswith("La entidad ")
    fallback = {r["entity_id"]: r["summary"] for r in summarize_entities(edges, facts, lang="xx").collect()}
    assert fallback["eA"].startswith("The entity ")
    # zero-fact fast path localized
    lonely = spark.createDataFrame(
        [("eZ", "HAS_IDENTIFIER", "email:z@x.com", None, None, True, TS)],
        EDGE_SCHEMA,
    )
    s = entity_summary(lonely, facts, "email", "z@x.com", lang="pt")
    assert s.startswith("Esta entidade")


def test_summary_zero_fact_fast_path(spark, graph):
    _, facts = graph
    edges = spark.createDataFrame(
        [("eZ", "HAS_IDENTIFIER", "email:z@x.com", None, None, True, TS)],
        EDGE_SCHEMA,
    )
    assert entity_summary(edges, facts, "email", "z@x.com") == NO_FACTS_SUMMARY
    assert entity_summary(edges, facts, "email", "missing@x.com") == NO_FACTS_SUMMARY


def test_rag_dim_mismatch_fails_loudly(graph, embeddings):
    """A query dim different from the stored vectors must raise (the
    guard must survive Catalyst pruning), never silently return empty."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    edges, facts = graph
    with pytest.raises((SparkRuntimeException, Py4JJavaError, Exception)) as ei:
        rag_recall(
            edges, facts, embeddings, "email", "a@x.com", "hiking", dim=DIM * 2
        ).collect()
    assert "dim mismatch" in str(ei.value) or "ASSERT" in str(ei.value).upper()
