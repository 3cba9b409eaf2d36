"""End-to-end KG construction pipeline with checkpointed, resumable stages.

Stage graph (each stage a pure DataFrame transform + a parquet stage
table; Iceberg would swap in via the same writer seam — sources/io.py):

  pages ──extract──> docs(url, warc_ts, lang, text, mentions[], triples[])
        ──mentions──> mentions(url, mention_rank, id_type, id_value, anchor_id)
        ──canonical──> mapping(anchor_id, entity_id)        [connected components]
        ──link──> triples(entity_id, pred, fact_id, ..., source_url)
        ──materialize──> graph/{nodes,identifiers,facts,sources,edges}

Resumability (north_rule): a ``_manifest.json`` in the run directory
records completed stages; re-running skips them and re-reads their
parquet output — combined with idempotent (dedup-keyed) writes, a
killed-and-restarted run produces byte-identical tables with zero
duplicate rows. Per-stage metrics rows (rows_in/rows_out/wall) and
per-partition lineage rows land in ``metrics/`` — the analog of the
reference's token_usage_events ledger (usage/models.py:16-63).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nous_spark.extraction.html import extract_text_str
from nous_spark.extraction.mentions import extract_mentions_text
from nous_spark.extraction.triples import extract_triples_text
from nous_spark.graph import build_graph_tables
from nous_spark.linking import canonical_mapping, with_anchor_id
from nous_spark.normalize import fact_id_col

GRAPH_TABLES = ("nodes", "identifiers", "facts", "sources", "edges")

DOCS_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, "
    "mentions array<struct<id_type:string,id_value:string>>, "
    "triples array<struct<pred:string,fact_type:string,fact_name:string,confidence:double>>"
)


# --------------------------------------------------------------------------
# stage transforms (pure)
# --------------------------------------------------------------------------
def stage_extract(pages: DataFrame) -> DataFrame:
    """html -> text (byte-identical per url) + mentions + triples in ONE
    Arrow-batched mapInPandas pass, no shuffle.

    Fused deliberately: three chained pandas UDFs would each get their
    own PythonRunner (3 Python workers per task — measured 3.5x CPU
    inflation at local[32] from worker fork+import costs alone). One
    fused pass means one worker per task and one Arrow round trip: the
    html bytes never cross the JVM<->Python boundary more than once.

    An optional ``history`` column (prior conversation turns, joined by
    newlines) extends the PAGES contract: when present it is prepended
    to the extraction scan — the batch analog of the reference's history
    section in the extractor prompt (AssimilateKnowledgeRequest.history,
    dtos/knowledge_dto.py:76-80 -> langchain_fact_extractor.py:129-152)
    — while the emitted ``text`` stays the page's OWN extracted text
    (the byte-identity-per-url contract is unchanged).
    """
    has_history = "history" in pages.columns

    def gen(batches):
        import pandas as pd

        from nous_spark.extraction.triples import with_history

        for pdf in batches:
            # the PAGES contract allows html-less rows carrying text
            # directly (input_hint: both columns nullable) — fall back so
            # text-only pages still contribute instead of silently
            # yielding zero mentions/triples
            texts = [
                extract_text_str(h) if h is not None else (t or "")
                for h, t in zip(pdf["html"], pdf["text"])
            ]
            if "history" in pdf.columns:
                scans = [with_history(h, t) for h, t in zip(pdf["history"], texts)]
            else:
                scans = texts
            mentions = [
                [{"id_type": a, "id_value": b} for (a, b) in extract_mentions_text(t)]
                for t in scans
            ]
            triples = [
                [
                    {"pred": p, "fact_type": ft, "fact_name": fn, "confidence": c}
                    for (p, ft, fn, c) in extract_triples_text(t)
                ]
                for t in scans
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "text": texts,
                    "mentions": mentions,
                    "triples": triples,
                }
            )

    cols = ["url", "warc_ts", "lang", "html", "text"] + (
        ["history"] if has_history else []
    )
    return pages.select(*cols).mapInPandas(gen, DOCS_SCHEMA)


def stage_mentions(docs: DataFrame) -> DataFrame:
    m = docs.select(
        "url", "warc_ts", F.posexplode("mentions").alias("mention_rank", "m")
    ).select("url", "warc_ts", "mention_rank", "m.id_type", "m.id_value")
    return with_anchor_id(m)


def stage_canonical(
    mentions: DataFrame,
    alias_dict: DataFrame | None = None,
    use_lsh: bool = False,
    lsh_threshold: float = 0.85,
) -> DataFrame:
    return canonical_mapping(
        mentions, alias_dict, use_lsh=use_lsh, lsh_threshold=lsh_threshold
    )


def stage_link(docs: DataFrame, mentions: DataFrame, mapping: DataFrame) -> DataFrame:
    """Attach each page's triples to its subject's canonical entity id."""
    subjects = (
        mentions.filter(F.col("mention_rank") == 0)
        .join(mapping, "anchor_id")
        .select("url", "entity_id")
    )
    exploded = docs.select(
        "url", "warc_ts", F.explode("triples").alias("t")
    ).select(
        "url",
        "warc_ts",
        F.col("t.pred").alias("pred"),
        F.col("t.fact_type").alias("fact_type"),
        F.col("t.fact_name").alias("fact_name"),
        F.col("t.confidence").alias("confidence"),
    )
    return (
        exploded.join(subjects, "url")  # url is unique per page — skew-free equi-join
        .withColumn("fact_id", fact_id_col(F.col("fact_type"), F.col("fact_name")))
        .select(
            "entity_id",
            "pred",
            "fact_type",
            "fact_name",
            "fact_id",
            "confidence",
            F.col("url").alias("source_url"),
            "warc_ts",
        )
    )


def stage_materialize(linked_triples: DataFrame, mentions_mapped: DataFrame, n_salts: int = 16) -> dict[str, DataFrame]:
    """Materialize the five graph tables; HAS_FACT merging runs as the
    explicit two-phase salted aggregation (hot-entity skew, north_rule)."""
    return build_graph_tables(linked_triples, mentions_mapped, n_salts=n_salts)


# --------------------------------------------------------------------------
# run orchestration: checkpoints, resume, metrics
# --------------------------------------------------------------------------
class Run:
    """A checkpointed pipeline run rooted at ``out_dir``."""

    def __init__(self, spark: SparkSession, out_dir: str, run_id: str = "run"):
        import threading

        self.spark = spark
        self.out_dir = out_dir
        self.run_id = run_id
        self.manifest_path = os.path.join(out_dir, "_manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self.manifest = self._load_manifest()
        self.metrics: list[dict] = []
        self._lock = threading.Lock()  # checkpoint() may run concurrently

    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"run_id": self.run_id, "stages": {}}

    def _save_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2)
        os.replace(tmp, self.manifest_path)

    def done(self, stage: str) -> bool:
        return stage in self.manifest["stages"]

    def path(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def read(self, stage: str) -> DataFrame:
        from nous_spark.io import read_table

        return read_table(self.spark, self.path(stage))

    def checkpoint(
        self,
        stage: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        tokens_col: Column | None = None,
        operation: str | None = None,
    ) -> DataFrame:
        """Materialize a stage: write the stage table once (io.py seam —
        parquet here, Iceberg on a cluster), mark done, read back.

        If the stage is already done (resume), the compute is skipped
        entirely and the stored result is returned — zero recompute.

        ``tokens_col`` (a per-row token-count expression) piggybacks a
        token sum on the same Observation, and ``operation`` prices it
        at write time (pricing.py, F7/G4): the stage's metrics row then
        carries (tokens, cost_usd DECIMAL(18,8)) like the reference's
        token_usage_events ledger.
        """
        if self.done(stage):
            return self.read(stage)
        t0 = time.time()
        from pyspark.sql import Observation

        from nous_spark.io import write_table

        path = self.path(stage)
        # row count (+ token sum) piggybacks on the write job via the
        # Observation API — no separate count job per stage (driver-serial
        # jobs are the scaling-efficiency tax at small corpus sizes).
        obs = Observation(f"ckpt_{stage}")
        metrics_exprs = [F.count(F.lit(1)).alias("rows")]
        if tokens_col is not None:
            metrics_exprs.append(F.sum(tokens_col).alias("tokens"))
        write_table(
            df.observe(obs, *metrics_exprs),
            path,
            mode="overwrite",
            partition_by=partition_by,
        )
        got = obs.get
        rows_out = int(got["rows"])
        tokens = int(got["tokens"]) if tokens_col is not None and got.get("tokens") is not None else None
        cost = None
        if tokens is not None and operation is not None:
            from nous_spark.pricing import cost_usd

            cost = cost_usd(operation, tokens)
        out = self.read(stage)
        with self._lock:
            self.metrics.append(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "partition_id": None,
                    "rows_in": None,
                    "rows_out": rows_out,
                    "tokens": tokens,
                    "cost_usd": cost,
                    "started_at": dt.datetime.fromtimestamp(t0, dt.timezone.utc),
                    "finished_at": dt.datetime.now(dt.timezone.utc),
                    "status": "ok",
                    "error_type": None,
                }
            )
            self.manifest["stages"][stage] = {"rows": rows_out, "finished": time.time()}
            self._save_manifest()
        return out

    def write_lineage(self, stage: str, df: DataFrame) -> None:
        """Per-partition lineage rows for a materialized stage.

        Written to a per-(run_id, stage) directory with OVERWRITE so a
        resumed/re-invoked run replaces identical rows instead of
        appending duplicates (the idempotent-sink rule applies to the
        bookkeeping tables too)."""
        lineage = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("stage", F.lit(stage))
        )
        path = os.path.join(self.out_dir, "lineage", f"run_id={self.run_id}", f"stage={stage}")
        lineage.drop("run_id", "stage").write.mode("overwrite").parquet(path)

    def flush_metrics(self) -> None:
        """Metrics rows for stages that EXECUTED in this invocation.

        Per-run_id overwrite + merge with previously recorded stages: a
        resume run (which skips stages and produces no metric rows for
        them) keeps the original rows; re-running a stage replaces its
        row — zero duplicates either way."""
        if not self.metrics:
            return
        from nous_spark.schemas import METRICS

        mdf = self.spark.createDataFrame(self.metrics, METRICS)
        path = os.path.join(self.out_dir, "metrics", f"run_id={self.run_id}")
        if os.path.exists(path):
            prior = self.spark.read.schema(METRICS).parquet(path)
            fresh = {m["stage"] for m in self.metrics}
            mdf = prior.filter(~F.col("stage").isin(list(fresh))).unionByName(mdf)
        # materialize before overwriting the directory being read
        rows = mdf.collect()
        self.spark.createDataFrame(rows, METRICS).write.mode("overwrite").parquet(path)
        self.metrics = []


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str = "run",
    alias_dict: DataFrame | None = None,
    n_salts: int = 16,
    tenant_id: str | None = None,
    use_lsh: bool = False,
) -> dict[str, DataFrame]:
    """Execute (or resume) the full pipeline; returns the graph tables.

    ``tenant_id`` stamps every graph-table row and hive-partitions the
    output on it — the physical-isolation analog of the reference's
    graph-per-tenant (SURVEY.md §1.3); at 10^12 docs each tenant's
    queries prune to its partition directories."""
    run = Run(spark, out_dir, run_id)

    # the extract stage is the pipeline's provider-call analog (G1):
    # token-count its output text and price it into the metrics ledger
    docs = run.checkpoint(
        "extract",
        stage_extract(pages),
        tokens_col=F.size(F.split(F.col("text"), r"\s+")),
        operation="extract",
    )
    mentions = run.checkpoint("mentions", stage_mentions(docs))
    mapping = run.checkpoint(
        "canonical", stage_canonical(mentions, alias_dict, use_lsh=use_lsh)
    )
    linked = run.checkpoint("triples", stage_link(docs, mentions, mapping))

    # mentions x mapping feeds three of the five graph tables — persist it
    # once instead of recomputing the join per table job.
    mentions_mapped = (
        mentions.join(mapping, "anchor_id")
        .select("url", "mention_rank", "id_type", "id_value", "entity_id", "warc_ts")
        .persist()
    )
    tables = stage_materialize(linked, mentions_mapped, n_salts=n_salts)
    # The five graph tables are independent given (linked, mentions_mapped):
    # submit their jobs CONCURRENTLY (Spark's scheduler interleaves them
    # across the executor pool) instead of serializing five small writes —
    # cuts the materialize wall to ~max(table) instead of sum(table).
    from concurrent.futures import ThreadPoolExecutor

    if tenant_id is not None:
        tables = {
            name: t.withColumn("tenant_id", F.lit(tenant_id))
            for name, t in tables.items()
        }
    # cluster edge files by head entity: parquet row-group min/max stats on
    # `src` then prune most files for point recall lookups (the batch
    # analog of the reference's unique B-tree on Entity.id,
    # docs/graph_db_schema_age.md:40) — a local sort, no extra shuffle.
    tables["edges"] = tables["edges"].sortWithinPartitions("src", "edge_type")
    part = ["tenant_id"] if tenant_id is not None else None
    out = {}
    try:
        with ThreadPoolExecutor(max_workers=len(GRAPH_TABLES)) as pool:
            futs = {
                name: pool.submit(run.checkpoint, f"graph_{name}", tables[name], part)
                for name in GRAPH_TABLES
            }
            for name, fut in futs.items():
                out[name] = fut.result()
    finally:
        mentions_mapped.unpersist()
    run.write_lineage("triples", linked)
    run.flush_metrics()
    return out
