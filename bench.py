"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "pipeline": {"triples_per_sec": ..., "scaling": {...}}}

Two parts:
  1. headline relational/KG/dedup/ANN queries at $SPARK_GRAFT_SF_DIR
     (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
  2. the full KG-construction pipeline (pages-parquet scan -> canonical
     graph tables) on a deterministic synthetic corpus, run at TWO
     parallelism levels (local[N] and local[4N], default 2 vs 8) in
     fresh subprocesses — the sandbox stand-in for the north_rule's
     N vs 4N cluster-size scaling requirement.
     efficiency = (T_N / T_4N) / 4.

     The pair defaults to 2 vs 8 (not 8 vs 32) because this host's CPU
     itself stops scaling past ~8 busy cores: a pure-Python burn
     measures 8->32 processes at only 2.7x (virtualized frequency/
     bandwidth throttling; see BASELINE.md). On a real cluster N and 4N
     executors are distinct machines and do not share that ceiling.
     Override with NOUS_BENCH_CORES="8,32" to reproduce the ceiling.

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
N_PAGES = int(os.environ.get("NOUS_BENCH_PAGES", "300000"))
SOFT_DEADLINE = float(os.environ.get("NOUS_BENCH_DEADLINE", "330"))  # sec
REPEATS = int(os.environ.get("NOUS_BENCH_REPEATS", "3"))  # deadline-bounded
FILL = int(os.environ.get("NOUS_BENCH_FILL", "8"))
CORES_N, CORES_4N = (
    int(x) for x in os.environ.get("NOUS_BENCH_CORES", "2,8").split(",")
)

HEADLINE = [
    "tpch_q1_pricing_summary",
    "region_revenue",
    "kg_recall_lookup",
    "kg_fact_refcount",
    "kg_predicate_traversal",
    "kg_neighborhood_lookup",
    "kg_expand_hops",
    "kg_entity_summary",
    "ranked_pick_latest_order",
    "usage_daily_rollup",
    "customer_order_counts",
    "doc_exact_dedup",
    "doc_minhash_near_dups",
    "doc_token_stats",
    "ann_cosine_scores",
    "ann_batch_topk",
]


def pipeline_child(cores: int, n_pages: int, out_dir: str) -> None:
    """Run the full pipeline once at a fixed parallelism; print timing JSON.

    The pages corpus is materialized to parquet ONCE (untimed, shared
    across children) — production reads an existing pages table, so the
    timed region is pages-scan -> canonical graph tables, not datagen.
    """
    from nous_spark.datagen import generate_pages
    from nous_spark.pipeline import run_pipeline
    from nous_spark.session import get_spark

    spark = get_spark(app_name=f"nous_bench_{cores}", cores=cores)
    shutil.rmtree(out_dir, ignore_errors=True)
    from nous_spark.datagen import DATAGEN_VERSION

    pages_path = f"/tmp/nous_bench_pages_v{DATAGEN_VERSION}_{n_pages}_f{FILL}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        generate_pages(spark, n_pages, seed=42, fill_sentences=FILL).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    # untimed pilot: JIT-compile codegen paths, fork+import python workers,
    # touch every stage once — standard warm-up so the timed region
    # measures steady-state throughput, not JVM cold start.
    pilot = generate_pages(spark, 2000, seed=7, fill_sentences=FILL)
    run_pipeline(spark, pilot, out_dir + "_pilot", run_id="pilot")
    shutil.rmtree(out_dir + "_pilot", ignore_errors=True)
    t0 = time.time()
    tables = run_pipeline(spark, pages, out_dir, run_id=f"bench{cores}")
    n_triples = (
        tables["edges"].filter("edge_type = 'HAS_FACT'").count()
    )
    wall = time.time() - t0
    print(json.dumps({"cores": cores, "wall_sec": wall, "n_triples": n_triples}))
    spark.stop()


def _burn(k: int) -> int:
    x = 0
    for i in range(k):
        x += i * i
    return x


def cpu_scale_control(n: int, n4: int, per: int = 12_000_000) -> float:
    """Pure-CPU N-vs-4N process scaling on this host, measured now.

    A tight integer loop has zero shuffle/IO/JVM overhead, so its
    efficiency is the hardware ceiling for ANY N->4N comparison run at
    this moment on this (shared, throttled) VM.
    """
    import multiprocessing as mp

    burn = _burn

    def measure(procs: int) -> float:
        t0 = time.time()
        with mp.Pool(procs) as pool:
            pool.map(burn, [per] * procs)
        return procs * per / (time.time() - t0)

    best = 0.0
    for _ in range(2):
        eff = (measure(n4) / measure(n)) / (n4 / n)
        best = max(best, eff)
    return best


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

    # Host-noise control: this sandbox is a shared VM whose CPU throughput
    # swings >2x minute-to-minute. Measure how well PURE CPU work scales
    # N->4N processes right now — the ceiling any Spark job can reach.
    control_eff = cpu_scale_control(CORES_N, CORES_4N)

    # scaling evidence: same input, N vs 4N cores, fresh JVM each,
    # INTERLEAVED repeats with min-wall per config (noise-robust).
    # 4N first so it also materializes the shared pages parquet (untimed).
    bench_start = time.time()
    walls_4n, walls_n = [], []
    n_triples = 0
    for rep in range(REPEATS):
        if rep > 0 and time.time() - bench_start > SOFT_DEADLINE:
            break  # keep at least one pair; stay inside the driver budget
        r4n = run_pipeline_at(CORES_4N, N_PAGES)
        rn = run_pipeline_at(CORES_N, N_PAGES)
        walls_4n.append(r4n["wall_sec"])
        walls_n.append(rn["wall_sec"])
        n_triples = r4n["n_triples"]
    t4n, tn = min(walls_4n), min(walls_n)
    efficiency = (tn / t4n) / (CORES_4N / CORES_N)
    triples_per_sec = n_triples / t4n

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "pipeline": {
            "n_pages": N_PAGES,
            "fill_sentences": FILL,
            "n_triples": n_triples,
            "cores_n": CORES_N,
            "cores_4n": CORES_4N,
            "wall_sec_n": round(tn, 2),
            "wall_sec_4n": round(t4n, 2),
            "wall_sec_n_runs": [round(w, 1) for w in walls_n],
            "wall_sec_4n_runs": [round(w, 1) for w in walls_4n],
            "triples_per_sec_4n": round(triples_per_sec, 1),
            "pages_per_sec_4n": round(N_PAGES / t4n, 1),
            "scaling_efficiency_n_to_4n": round(efficiency, 3),
            "host_cpu_control_efficiency_n_to_4n": round(control_eff, 3),
            # engine efficiency normalized by what pure CPU could scale on
            # this shared VM at the same moment (BASELINE.md protocol)
            "efficiency_vs_host_ceiling": round(efficiency / control_eff, 3)
            if control_eff
            else None,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
