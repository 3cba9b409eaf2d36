"""Structured-Streaming incremental assimilation tests: micro-batched
ingest lands the same graph as the batch pipeline, replays append
nothing (exactly-once via the idempotent writer), and watermarked
event-time rollups aggregate correctly."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nous_spark.datagen import generate_pages
from nous_spark.pipeline import GRAPH_TABLES
from nous_spark.streaming import (
    TABLE_KEYS,
    assimilate_batch,
    page_rate,
    read_pages_stream,
    start_assimilation,
)

N_PAGES = 40


@pytest.fixture()
def dirs(tmp_path):
    return {
        "pages": str(tmp_path / "pages"),
        "graph": str(tmp_path / "graph"),
        "cp": str(tmp_path / "cp"),
    }


def _write_pages(spark, dirs, lo: int, hi: int) -> None:
    """Materialize pages [lo, hi) as one new file in the stream dir."""
    pages = generate_pages(spark, hi, seed=42).filter(
        F.col("url") >= f"https://example.org/p/{lo:012d}"
    )
    pages.coalesce(1).write.mode("append").parquet(dirs["pages"])


def _drain(spark, dirs) -> None:
    q = start_assimilation(spark, dirs["pages"], dirs["graph"], dirs["cp"])
    q.awaitTermination(120)


def _counts(spark, dirs) -> dict[str, int]:
    out = {}
    for t in GRAPH_TABLES:
        p = os.path.join(dirs["graph"], t)
        out[t] = spark.read.parquet(p).count() if os.path.exists(p) else 0
    return out


def test_stream_matches_batch_and_is_exactly_once(spark, dirs):
    # micro-batch 1: pages [0, 20); micro-batch 2: pages [20, 40)
    _write_pages(spark, dirs, 0, 20)
    _drain(spark, dirs)
    first = _counts(spark, dirs)
    assert first["edges"] > 0

    _write_pages(spark, dirs, 20, N_PAGES)
    _drain(spark, dirs)
    streamed = _counts(spark, dirs)
    assert streamed["edges"] > first["edges"]

    # re-drain with nothing new: zero growth (checkpoint + idempotency)
    _drain(spark, dirs)
    assert _counts(spark, dirs) == streamed

    # replay the WHOLE corpus through the non-stream path: still no dups
    all_pages = generate_pages(spark, N_PAGES, seed=42)
    appended = assimilate_batch(all_pages, dirs["graph"])
    assert all(v == 0 for v in appended.values()), appended

    # per-table key uniqueness audit
    for t in GRAPH_TABLES:
        df = spark.read.parquet(os.path.join(dirs["graph"], t))
        assert df.count() == df.dropDuplicates(TABLE_KEYS[t]).count(), t

    # equivalence: streamed edges == batch-in-one-go edges
    batch_dir = dirs["graph"] + "_batch"
    shutil.rmtree(batch_dir, ignore_errors=True)
    assimilate_batch(all_pages, batch_dir)
    streamed_edges = spark.read.parquet(os.path.join(dirs["graph"], "edges"))
    batch_edges = spark.read.parquet(os.path.join(batch_dir, "edges"))
    key = [F.col(k) for k in TABLE_KEYS["edges"]]
    assert (
        streamed_edges.select(*key).exceptAll(batch_edges.select(*key)).count() == 0
        and batch_edges.select(*key).exceptAll(streamed_edges.select(*key)).count() == 0
    )


def test_stateful_running_fact_counts(spark, tmp_path):
    """applyInPandasWithState: distinct-fact state survives across
    micro-batches and re-asserted facts count zero new."""
    from nous_spark.streaming import running_entity_fact_counts

    import time as _time

    src = str(tmp_path / "triples")
    # two files written with distinct mtimes -> two micro-batches
    # (maxFilesPerTrigger=1 processes oldest-first)
    spark.createDataFrame(
        [("eA", "f1"), ("eA", "f2"), ("eA", "f1"), ("eB", "f1")],
        "entity_id string, fact_id string",
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(
        [("eA", "f1"), ("eA", "f3")], "entity_id string, fact_id string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("entity_id string, fact_id string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        running_entity_fact_counts(stream)
        .writeStream.format("memory")
        .queryName("state_q")
        .option("checkpointLocation", str(tmp_path / "cp_state"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r["entity_id"], r["n_total"], r["n_new"])
        for r in spark.sql("select * from state_q").collect()
    }
    # batch 1: within-batch dedup of f1; batch 2: state remembers f1
    assert ("eA", 2, 2) in rows
    assert ("eB", 1, 1) in rows
    assert ("eA", 3, 1) in rows  # cross-micro-batch state


def test_streaming_embeddings_mirror(spark, dirs):
    """Incremental vector mirror: exactly-once on replay (H5 analog)."""
    _write_pages(spark, dirs, 0, 20)
    all_pages = generate_pages(spark, 20, seed=42)
    first = assimilate_batch(all_pages, dirs["graph"], with_embeddings=True)
    assert first["embeddings"] > 0
    again = assimilate_batch(all_pages, dirs["graph"], with_embeddings=True)
    assert again["embeddings"] == 0
    emb = spark.read.parquet(os.path.join(dirs["graph"], "embeddings"))
    assert emb.count() == emb.dropDuplicates(["point_id"]).count()


def test_page_rate_watermarked_rollup(spark, dirs):
    _write_pages(spark, dirs, 0, 20)
    stream = read_pages_stream(spark, dirs["pages"])
    assert stream.isStreaming
    q = (
        page_rate(stream, "1 hour", "2 hours")
        .writeStream.format("memory")
        .queryName("page_rate_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select sum(n_pages) as n from page_rate_test").first()["n"]
    assert got == 20
    # static-frame parity: same expression over a batch read
    static = page_rate(spark.read.parquet(dirs["pages"]), "1 hour", "2 hours")
    assert static.agg(F.sum("n_pages")).first()[0] == 20


def test_dedup_pages_stream_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a url replayed within the watermark
    window is emitted once."""
    from nous_spark.streaming import dedup_pages_stream

    src = str(tmp_path / "dup_pages")
    pages = generate_pages(spark, 10, seed=42)
    dup = pages.unionByName(pages.limit(5))  # 5 urls duplicated
    dup.coalesce(1).write.mode("append").parquet(src)

    from nous_spark.schemas import PAGES

    stream = spark.readStream.schema(PAGES).parquet(src)
    q = (
        dedup_pages_stream(stream, "1 hour")
        .select("url")
        .writeStream.format("memory")
        .queryName("dedup_q")
        .option("checkpointLocation", str(tmp_path / "cp_dedup"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    urls = [r["url"] for r in spark.sql("select url from dedup_q").collect()]
    assert len(urls) == 10
    assert len(set(urls)) == 10
