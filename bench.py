"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "pipeline": {"triples_per_sec": ..., "scaling": {...}}}

Two parts:
  1. headline relational/KG/dedup/ANN queries at $SPARK_GRAFT_SF_DIR
     (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
  2. the full KG-construction pipeline (pages -> canonical edges) on a
     deterministic synthetic corpus, run at TWO parallelism levels
     (local[8] and local[32]) in fresh subprocesses — the sandbox stand-in
     for the north_rule's N vs 4N cluster-size scaling requirement.
     efficiency = (T_8 / T_32) / 4.

Usage: python bench.py            # full run, one JSON line to stdout
       python bench.py --pipeline-child <cores> <n_pages> <out_dir>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("NOUS_BENCH_PAGES", "40000"))

HEADLINE = [
    "tpch_q1_pricing_summary",
    "region_revenue",
    "kg_recall_lookup",
    "kg_fact_refcount",
    "kg_predicate_traversal",
    "ranked_pick_latest_order",
    "usage_daily_rollup",
    "customer_order_counts",
    "doc_exact_dedup",
    "doc_minhash_near_dups",
    "doc_token_stats",
    "ann_cosine_scores",
]


def pipeline_child(cores: int, n_pages: int, out_dir: str) -> None:
    """Run the full pipeline once at a fixed parallelism; print timing JSON."""
    from nous_spark.datagen import generate_pages
    from nous_spark.pipeline import run_pipeline
    from nous_spark.session import get_spark

    spark = get_spark(app_name=f"nous_bench_{cores}", cores=cores)
    shutil.rmtree(out_dir, ignore_errors=True)
    pages = generate_pages(spark, n_pages, seed=42)
    t0 = time.time()
    tables = run_pipeline(spark, pages, out_dir, run_id=f"bench{cores}")
    n_triples = (
        tables["edges"].filter("edge_type = 'HAS_FACT'").count()
    )
    wall = time.time() - t0
    print(json.dumps({"cores": cores, "wall_sec": wall, "n_triples": n_triples}))
    spark.stop()


def run_pipeline_at(cores: int, n_pages: int) -> dict:
    out_dir = f"/tmp/nous_bench_{cores}"
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    res = subprocess.run(
        [sys.executable, __file__, "--pipeline-child", str(cores), str(n_pages), out_dir],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1800,
    )
    last = [l for l in res.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(f"pipeline child failed: {res.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-child":
        pipeline_child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return

    import __spark_entry__ as entrymod
    from nous_spark.session import get_spark

    spark = get_spark(app_name="nous_bench", cores=CPUS)
    queries = entrymod.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        fn(spark, SF_DIR).count()  # warm (parquet footer cache, UDF workers)
        t0 = time.time()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()

    # scaling evidence: same input, 8 vs 32 cores, fresh JVM each
    r8 = run_pipeline_at(8, N_PAGES)
    r32 = run_pipeline_at(32, N_PAGES)
    efficiency = (r8["wall_sec"] / r32["wall_sec"]) / (32 / 8)
    triples_per_sec = r32["n_triples"] / r32["wall_sec"]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "pipeline": {
            "n_pages": N_PAGES,
            "n_triples": r32["n_triples"],
            "wall_sec_8c": round(r8["wall_sec"], 2),
            "wall_sec_32c": round(r32["wall_sec"], 2),
            "triples_per_sec_32c": round(triples_per_sec, 1),
            "pages_per_sec_32c": round(N_PAGES / r32["wall_sec"], 1),
            "scaling_efficiency_8_to_32": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
