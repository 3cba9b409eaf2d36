"""Skew-handling primitives: salted repartition + two-phase aggregation.

Web-scale KG construction has pathologically hot keys: entities like
"Location:Paris" fan in from millions of pages (our synthetic corpus
reproduces this with a Zipf-skewed city/company pool — datagen.py). A
single-shuffle groupBy on the raw key puts the whole hot key in one
reducer; the north_rule mandates explicit salted repartitioning on the
head-entity hash instead.

Pattern: add salt = pmod(xxhash64(key, monotonic row disambiguator), S),
aggregate by (key, salt) — the *partial* phase, spread over S reducers —
then aggregate the S partials by key — the *final* phase, S rows per key.

Note Spark's own HashAggregate already does map-side partials for
algebraic aggs; salting matters for (a) non-algebraic aggs
(collect_set/list), (b) bounding reducer memory on dedup of very hot
keys, and (c) stabilizing AQE plans. ``salted_distinct`` is the one the
pipeline uses before edge materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, *cols: str) -> DataFrame:
    """Per-row salt in [0, n_salts).

    With ``cols``: deterministic hash of those columns (identical rows get
    the same salt — right for dedup). Without: a row-position hash that
    spreads even fully-duplicate rows (right for counts). Either way the
    salt only affects data placement, never results.
    """
    src = (
        F.xxhash64(*[F.col(c) for c in cols])
        if cols
        else F.xxhash64(F.monotonically_increasing_id())
    )
    return df.withColumn("_salt", F.pmod(src, F.lit(n_salts)))


def salted_repartition(df: DataFrame, key_cols: list[str], n_parts: int, n_salts: int) -> DataFrame:
    """Repartition on (key, salt) so one hot key spreads over n_salts
    partitions — repartition(N, pmod(xxhash64(key, salt), N))."""
    salted = with_salt(df, n_salts)
    return salted.repartition(n_parts, *[F.col(c) for c in key_cols], F.col("_salt"))


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int, out_col: str = "n") -> DataFrame:
    """Two-phase count by key: (key, salt) partial counts -> final sum."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_pc"))
    return partial.groupBy(*key_cols).agg(F.sum("_pc").cast("long").alias(out_col))


def salted_collect_set(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int, out_col: str = "vals"
) -> DataFrame:
    """Two-phase collect_set — partial sets per (key, salt), flattened and
    deduped in the final phase. Bounds reducer memory on hot keys."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.collect_set(value_col).alias("_ps")
    )
    return partial.groupBy(*key_cols).agg(
        F.array_distinct(F.flatten(F.collect_list("_ps"))).alias(out_col)
    )


def salted_distinct(df: DataFrame, key_cols: list[str], n_salts: int) -> DataFrame:
    """dropDuplicates(keys) with an explicit pre-spread of hot keys.

    Phase 1 dedups within (key, salt) buckets; phase 2 dedups the ≤n_salts
    survivors per key. Output: one arbitrary-but-deterministic row per key
    (ties broken by the salt bucket order via min on remaining cols is NOT
    applied — rows identical on key_cols are interchangeable here because
    callers dedup full duplicate rows).
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.dropDuplicates([*key_cols, "_salt"])
    return phase1.dropDuplicates(key_cols).drop("_salt")


def pmod_bucket(col: Column, n: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(n))
