"""Entity linking: identifier mentions -> stable canonical entity ids.

The reference resolves one identifier per request with a find-or-create
round trip (usecases/assimilate_knowledge_usecase.py:66-95 +
age_repository.py:101-123). Corpus-wide, that serial protocol is
replaced by three embarrassingly-parallel / bulk steps:

  1. **anchor**: every (id_type, id_value) deterministically maps to an
     anchor entity id (uuid5) — no coordination, idempotent across runs
     (same observable contract as the reference's idempotent create);
  2. **alias edges**: pairs of identifiers asserted to be the same
     entity — (a) co-occurrence on one page (the batch analog of one
     request carrying an identifier for content that names another), and
     (b) an optional curated alias dictionary (broadcast-joined: it is
     small-dimension data);
  3. **canonicalize**: connected components over the alias graph
     (nous_spark.cc) elect one canonical id per component; every mention
     is rewritten anchor -> canonical.

Scale notes: step 1 is a map; step 2's self-join is per-page (bounded
fan-out); step 3 is the iterative CC with per-iteration checkpointing.
No step collects to the driver.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nous_spark.cc import connected_components
from nous_spark.normalize import ENTITY_NS

# vectorized uuid5 anchor minting (Arrow-batched; uuid5 has no JVM builtin)
@F.pandas_udf(T.StringType())
def anchor_id_udf(key: pd.Series) -> pd.Series:
    return key.map(lambda k: str(uuid.uuid5(ENTITY_NS, k)))


def with_anchor_id(mentions: DataFrame) -> DataFrame:
    """mentions(url, id_type, id_value) -> + entity_key, anchor_id."""
    return mentions.withColumn(
        "entity_key", F.concat_ws(":", "id_type", "id_value")
    ).withColumn("anchor_id", anchor_id_udf(F.col("entity_key")))


def cooccurrence_alias_edges(mentions_with_anchor: DataFrame) -> DataFrame:
    """Alias edges from identifiers co-occurring on the same page.

    The subject (first mention) is paired with every other mention of the
    page. Pages with a single mention emit nothing. Returns (src, dst)
    anchor-id pairs, deduped.
    """
    first = mentions_with_anchor.filter(F.col("mention_rank") == 0).select(
        "url", F.col("anchor_id").alias("src")
    )
    rest = mentions_with_anchor.filter(F.col("mention_rank") > 0).select(
        "url", F.col("anchor_id").alias("dst")
    )
    return (
        first.join(rest, "url")
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def canonical_mapping(
    mentions_with_anchor: DataFrame,
    alias_dict: DataFrame | None = None,
) -> DataFrame:
    """Build the anchor_id -> canonical entity_id mapping.

    ``alias_dict`` (optional, small): (entity_key_a, entity_key_b) pairs
    of identifiers curated as equivalent; broadcast-joined onto anchors.

    Returns (anchor_id, entity_id). Anchors in no alias component map to
    themselves — the mapping is TOTAL over observed anchors, so the
    downstream join is a plain inner equi-join.
    """
    edges = cooccurrence_alias_edges(mentions_with_anchor)
    if alias_dict is not None:
        pairs = alias_dict.select(
            anchor_id_udf(F.col("entity_key_a")).alias("src"),
            anchor_id_udf(F.col("entity_key_b")).alias("dst"),
        )
        edges = edges.unionByName(pairs).dropDuplicates(["src", "dst"])

    comp = connected_components(edges)  # (id, component) — component = min id
    anchors = mentions_with_anchor.select("anchor_id").dropDuplicates(["anchor_id"])
    return (
        anchors.join(comp, anchors.anchor_id == comp.id, "left")
        .select(
            "anchor_id",
            F.coalesce(comp.component, anchors.anchor_id).alias("entity_id"),
        )
    )


def rank_mentions(mentions_exploded: DataFrame) -> DataFrame:
    """Assign document-order rank; rank 0 is the page's subject identifier.

    Expects (url, pos, id_type, id_value) where pos is the index within
    the page's mention array (posexplode output).
    """
    return mentions_exploded.withColumnRenamed("pos", "mention_rank")
