"""Hot-key guards on the graph side: recanonicalize's degenerate shared
identifier and summarize_entities' million-fact entity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nous_spark.graph import recanonicalize_graph
from nous_spark.semantic import summarize_entities

TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _edge(src, etype, dst, pred=None, conf=None, primary=None):
    return (src, etype, dst, pred, conf, primary, TS)

EDGE_SCHEMA = (
    "src string, edge_type string, dst string, pred string, "
    "confidence double, is_primary boolean, created_at timestamp"
)


def test_recanonicalize_ignores_degenerate_hot_identifier(spark):
    """500 entities sharing one garbage identifier ('email:') must NOT be
    merged (and must not blow up the self-join); a normal 2-entity shared
    identifier still merges."""
    rows = []
    # degenerate: one empty-ish identifier claimed by 500 entities
    for i in range(500):
        rows.append(_edge(f"e{i:04d}", "HAS_IDENTIFIER", "email:", primary=True))
    # legitimate: two entities sharing a real identifier
    rows.append(_edge("ga", "HAS_IDENTIFIER", "email:x@example.com", primary=True))
    rows.append(_edge("gb", "HAS_IDENTIFIER", "email:x@example.com", primary=False))
    edges = spark.createDataFrame(rows, EDGE_SCHEMA)
    nodes = edges.select(F.col("src").alias("entity_id")).distinct().select(
        "entity_id",
        F.lit(TS).alias("created_at"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )
    tables = {
        "edges": edges,
        "nodes": nodes,
        "identifiers": spark.createDataFrame([], "value string, id_type string"),
        "facts": spark.createDataFrame([], "fact_id string, name string, fact_type string"),
        "sources": spark.createDataFrame([], "source_id string, content string, ts timestamp"),
    }
    out = recanonicalize_graph(tables, max_share=128)
    srcs = {r["src"] for r in out["edges"].filter("edge_type='HAS_IDENTIFIER'").collect()}
    # hot-identifier holders keep their own ids (no merge through 'email:')
    assert all(f"e{i:04d}" in srcs for i in range(0, 500, 100))
    # the legitimate pair merged to the min id
    assert "ga" in srcs and "gb" not in srcs
    n_nodes = out["nodes"].count()
    assert n_nodes == 501  # 500 unmerged + 1 merged pair


def test_summarize_hot_entity_capped_two_phase(spark):
    """A 20k-fact entity summarizes under the salted two-phase cap; the
    capped summary equals the uncapped summary truncated to max_facts,
    and n_facts still reports the total."""
    n = 20_000
    edges = spark.range(n).select(
        F.lit("hot").alias("src"),
        F.lit("HAS_FACT").alias("edge_type"),
        F.concat(F.lit("Fact:"), F.format_string("%05d", F.col("id"))).alias("dst"),
        F.lit("mentions").alias("pred"),
        F.lit(1.0).alias("confidence"),
        F.lit(None).cast("boolean").alias("is_primary"),
        F.lit(TS).alias("created_at"),
    )
    facts = spark.range(n).select(
        F.concat(F.lit("Fact:"), F.format_string("%05d", F.col("id"))).alias("fact_id"),
        F.format_string("%05d", F.col("id")).alias("name"),
        F.lit("Fact").alias("fact_type"),
    )
    capped = summarize_entities(edges, facts, max_facts=100, n_salts=8).collect()[0]
    assert capped["n_facts"] == n
    expected_clauses = [f"mentions Fact: {i:05d}" for i in range(100)]
    assert capped["summary"] == "The entity " + "; ".join(expected_clauses) + "."


def test_summarize_capped_matches_uncapped_prefix(spark):
    """On a small graph the capped path must agree with the single-phase
    path truncated to max_facts (same clauses, same order)."""
    rows = []
    for e in range(5):
        for f in range(7):
            rows.append(
                (f"e{e}", "HAS_FACT", f"Fact:{f}", f"p{f % 3}", 0.95, None, TS)
            )
    edges = spark.createDataFrame(rows, EDGE_SCHEMA)
    facts = spark.createDataFrame(
        [(f"Fact:{f}", f"name{f}", "Fact") for f in range(7)],
        "fact_id string, name string, fact_type string",
    )
    full = {r["entity_id"]: r for r in summarize_entities(edges, facts).collect()}
    capped = {
        r["entity_id"]: r
        for r in summarize_entities(edges, facts, max_facts=3, n_salts=4).collect()
    }
    for e in full:
        assert capped[e]["n_facts"] == full[e]["n_facts"]
        full_clauses = full[e]["summary"][len("The entity ") : -1].split("; ")
        want = "The entity " + "; ".join(full_clauses[:3]) + "."
        assert capped[e]["summary"] == want
