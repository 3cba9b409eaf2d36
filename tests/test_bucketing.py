"""Bucketed-table co-located joins: two tables bucketed on the same key
join WITHOUT a shuffle (no Exchange in the physical plan) — the
pre-partitioning strategy for the recall self-join path at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nous_spark.io import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark):
    edges = spark.createDataFrame(
        [(f"e{i%7}", f"Fact:{i}", "likes") for i in range(100)],
        "src string, dst string, pred string",
    )
    nodes = spark.createDataFrame(
        [(f"e{i}", i) for i in range(7)], "src string, rank int"
    )
    write_bucketed_table(edges, "t_edges_b", ["src"], n_buckets=4, sort_cols=["src"])
    write_bucketed_table(nodes, "t_nodes_b", ["src"], n_buckets=4, sort_cols=["src"])
    yield spark.table("t_edges_b"), spark.table("t_nodes_b")
    spark.sql("DROP TABLE IF EXISTS t_edges_b")
    spark.sql("DROP TABLE IF EXISTS t_nodes_b")


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so bucketed distribution (not broadcast)
    is what eliminates the shuffle."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, bucketed, no_broadcast):
    edges_b, nodes_b = bucketed
    joined = edges_b.join(nodes_b, "src")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == 100


def test_bucketed_self_join_recall_shape_no_shuffle(spark, bucketed, no_broadcast):
    """The recall traversal (edges ⋈ edges on src) — shuffle-free when
    the edges table is bucketed on src."""
    edges_b, _ = bucketed
    a = edges_b.alias("a")
    b = edges_b.alias("b")
    joined = a.join(b, F.col("a.src") == F.col("b.src"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() > 0


def test_unbucketed_join_does_shuffle(spark, bucketed, no_broadcast):
    """Control: the same join on plain DataFrames shuffles; bucketing is
    what removed it above."""
    edges = spark.createDataFrame(
        [(f"e{i%7}", f"Fact:{i}", "likes") for i in range(100)],
        "src string, dst string, pred string",
    )
    a, b = edges.alias("a"), edges.alias("b")
    joined = a.join(b, F.col("a.src") == F.col("b.src"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
