"""Soak run: the full pipeline at 1M pages on local[32].

Reaffirms at 6x bench scale what the test suite pins at small scale:
throughput, zero duplicate edge keys (the exactly-once audit), and node
count sanity. Usage: python scripts/soak.py [n_pages]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nous_spark.datagen import generate_pages
from nous_spark.pipeline import run_pipeline
from nous_spark.session import get_spark


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = "/tmp/nous_soak_r3"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark(app_name="nous_soak", cores=32)
    pages = generate_pages(spark, n_pages, seed=42)
    t0 = time.time()
    tables = run_pipeline(spark, pages, out, run_id="soak")
    wall = time.time() - t0
    hf = tables["edges"].filter("edge_type = 'HAS_FACT'")
    n = hf.count()
    dup = n - hf.dropDuplicates(["src", "dst", "pred"]).count()
    nodes = tables["nodes"].count()
    print(
        f"SOAK n_pages={n_pages} wall={wall:.0f}s triples={n} dup_edge_keys={dup} "
        f"nodes={nodes} triples_per_sec={n / wall:.0f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
