"""Fixed-iteration PageRank (graph.pagerank): pure-Python reference
parity on an adversarial graph (cycle + dangling node + multi-edge —
shapes the bipartite TPC-H parity graph cannot exercise), dangling-mass
redistribution, the rank-mass invariant, determinism, and a DuckDB
cross-check of the generated unrolled-CTE oracle on the same cyclic
graph (the sf-data oracle parity in test_oracle_parity only sees a
two-level fan-in)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nous_spark.graph import pagerank, pagerank_oracle_sql

# cycle a->b->c->a, dangling d, multi-edge b->c (x2): exercises cyclic
# propagation, outdeg weighting of repeated edges, and dangling mass.
EDGES = [("a", "b"), ("b", "c"), ("b", "c"), ("c", "a"), ("a", "d")]


def _py_pagerank(edges, iterations=3, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    odeg: dict[str, int] = {}
    for u, _ in edges:
        odeg[u] = odeg.get(u, 0) + 1
    ranks = {v: 1.0 for v in nodes}
    for _ in range(iterations):
        dang = sum(r for v, r in ranks.items() if v not in odeg)
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += ranks[u] / odeg[u]
        ranks = {
            v: (1.0 - damping) + damping * (contrib[v] + dang / n) for v in nodes
        }
    return ranks


def _spark_edges(spark, edges=EDGES):
    return spark.createDataFrame(edges, "src string, dst string")


def test_pagerank_matches_python_reference(spark):
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_spark_edges(spark), iterations=3).collect()
    }
    want = _py_pagerank(EDGES, iterations=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


@pytest.mark.parametrize("iterations", [1, 5])
def test_pagerank_mass_invariant(spark, iterations):
    # sum r_{k+1} = n(1-d) + d*(non-dangling + dangling mass) = n when
    # sum r_k = n — the dangling fix is exactly what preserves this.
    rows = pagerank(_spark_edges(spark), iterations=iterations).collect()
    assert sum(r["rank"] for r in rows) == pytest.approx(len(rows), abs=1e-9)


def test_pagerank_multi_edge_weighting(spark):
    # b's outdeg counts the doubled edge, so c receives 2/2 of b's rank
    # and a receives 1/1 of c's: after enough iterations c (double
    # in-edge + cycle) outranks the dangling leaf d.
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_spark_edges(spark), iterations=5).collect()
    }
    assert got["c"] > got["d"]
    want = _py_pagerank(EDGES, iterations=5)
    assert got["c"] == pytest.approx(want["c"], abs=1e-9)


def test_pagerank_deterministic(spark):
    a = sorted(pagerank(_spark_edges(spark)).collect())
    b = sorted(pagerank(_spark_edges(spark)).collect())
    assert [(r["node"], round(r["rank"], 12)) for r in a] == [
        (r["node"], round(r["rank"], 12)) for r in b
    ]


def test_pagerank_rejects_zero_iterations(spark):
    with pytest.raises(ValueError):
        pagerank(_spark_edges(spark), iterations=0)


def test_pagerank_empty_edges(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0


def test_pagerank_oracle_sql_matches_on_cyclic_graph(spark):
    # cross-engine check on a graph with a cycle — the sf-data parity
    # graph (customer -> fact) is bipartite/acyclic, so this is the only
    # place the oracle's iterative CTEs see rank flowing around a loop.
    values = ", ".join(f"('{u}', '{v}')" for u, v in EDGES)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)",
        iterations=4,
        round_to=9,
    )
    duck = {
        node: rank for node, rank in duckdb.connect().execute(sql).fetchall()
    }
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_spark_edges(spark), iterations=4)
        .select("node", F.round("rank", 9).alias("rank"))
        .collect()
    }
    assert got == duck
