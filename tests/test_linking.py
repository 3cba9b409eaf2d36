"""Entity-linking tests: anchor determinism, co-occurrence aliasing, and
the MinHash-LSH blocking + similarity-scored candidate ranking path
(north_star; the corpus-wide analog of the reference's find-or-create
resolution, usecases/assimilate_knowledge_usecase.py:66-95)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nous_spark.linking import (
    canonical_mapping,
    identifier_signatures,
    lsh_alias_candidates,
    with_anchor_id,
)
from nous_spark.normalize import entity_id_for

MENTIONS_SCHEMA = "url string, mention_rank int, id_type string, id_value string"


@pytest.fixture(scope="module")
def fuzzy_mentions(spark):
    """Three spellings of one identity (same type), plus an unrelated one
    and a same-value different-type pair (must NOT alias via LSH)."""
    rows = [
        ("u1", 0, "email", "jonathan.doe.1985@example.com"),
        ("u2", 0, "email", "jonathan.doe1985@example.com"),   # dot dropped
        ("u3", 0, "email", "jonathan.doe.1985@example.org"),  # tld variant
        ("u4", 0, "email", "completely.other@elsewhere.net"),
        ("u5", 0, "username", "jonathan.doe.1985@example.com"),  # other type
    ]
    return with_anchor_id(spark.createDataFrame(rows, MENTIONS_SCHEMA))


def test_anchor_id_matches_python_side(spark):
    m = with_anchor_id(
        spark.createDataFrame([("u", 0, "email", "a@x.com")], MENTIONS_SCHEMA)
    ).collect()[0]
    assert m["anchor_id"] == entity_id_for("email", "a@x.com")


def test_signatures_deterministic(fuzzy_mentions):
    s1 = {r["anchor_id"]: r["sig"] for r in identifier_signatures(fuzzy_mentions).collect()}
    s2 = {r["anchor_id"]: r["sig"] for r in identifier_signatures(fuzzy_mentions).collect()}
    assert s1 == s2
    assert all(len(sig) == 32 for sig in s1.values())


def test_lsh_candidates_rank_and_threshold(fuzzy_mentions):
    pairs = lsh_alias_candidates(fuzzy_mentions, threshold=0.6).collect()
    anchors = {
        v: entity_id_for("email", v)
        for v in (
            "jonathan.doe.1985@example.com",
            "jonathan.doe1985@example.com",
            "jonathan.doe.1985@example.org",
            "completely.other@elsewhere.net",
        )
    }
    got = {(r["src"], r["dst"]) for r in pairs}
    near = anchors["jonathan.doe.1985@example.com"], anchors["jonathan.doe1985@example.com"]
    assert tuple(sorted(near)) in got or tuple(sorted(near, reverse=True)) in got
    # unrelated identifier pairs with nobody
    other = anchors["completely.other@elsewhere.net"]
    assert all(other not in p for p in got)
    # similarity scores are real Jaccards in (0, 1]
    assert all(0.6 <= r["sim"] <= 1.0 for r in pairs)


def test_lsh_never_crosses_identifier_type(fuzzy_mentions):
    """Same value, different id_type: blocked join key includes id_type."""
    pairs = lsh_alias_candidates(fuzzy_mentions, threshold=0.1).collect()
    email_anchor = entity_id_for("email", "jonathan.doe.1985@example.com")
    user_anchor = entity_id_for("username", "jonathan.doe.1985@example.com")
    for r in pairs:
        assert {r["src"], r["dst"]} != {email_anchor, user_anchor}


def test_canonical_mapping_with_lsh_merges_variants(fuzzy_mentions):
    mapping = canonical_mapping(fuzzy_mentions, use_lsh=True, lsh_threshold=0.6)
    m = {r["anchor_id"]: r["entity_id"] for r in mapping.collect()}
    a = entity_id_for("email", "jonathan.doe.1985@example.com")
    b = entity_id_for("email", "jonathan.doe1985@example.com")
    c = entity_id_for("email", "jonathan.doe.1985@example.org")
    d = entity_id_for("email", "completely.other@elsewhere.net")
    assert m[a] == m[b] == m[c]  # variants collapse to one canonical id
    assert m[d] == d  # singleton maps to itself (total mapping)
    # mapping is total over all observed anchors
    assert set(m) == {r["anchor_id"] for r in fuzzy_mentions.select("anchor_id").distinct().collect()}


def test_canonical_mapping_without_lsh_keeps_variants_separate(fuzzy_mentions):
    mapping = canonical_mapping(fuzzy_mentions, use_lsh=False)
    m = {r["anchor_id"]: r["entity_id"] for r in mapping.collect()}
    a = entity_id_for("email", "jonathan.doe.1985@example.com")
    b = entity_id_for("email", "jonathan.doe1985@example.com")
    assert m[a] != m[b]


def test_lsh_templated_identifier_family_is_bounded(spark):
    """Measured failure mode: templated identifiers (personaNNNN@...) are
    all ~0.85-similar, so naive banding makes the candidate join
    quadratic and CC meaningless. Hot-bucket capping + top-m ranking must
    (a) keep the stage bounded, (b) NOT cross-link the whole family,
    while (c) still catching a genuine typo alias."""
    rows = [
        ("u%d" % i, 0, "email", f"persona{i:06d}@example.com") for i in range(400)
    ]
    # one genuine alias pair: same value with a character doubled
    rows += [
        ("ua", 0, "email", "jonathan.doe.1985@gmail.com"),
        ("ub", 0, "email", "jonathan.doe.19855@gmail.com"),
    ]
    m = with_anchor_id(spark.createDataFrame(rows, MENTIONS_SCHEMA))
    pairs = lsh_alias_candidates(m, threshold=0.8).collect()
    got = {(r["src"], r["dst"]) for r in pairs}
    a = entity_id_for("email", "jonathan.doe.1985@gmail.com")
    b = entity_id_for("email", "jonathan.doe.19855@gmail.com")
    assert tuple(sorted((a, b))) in got  # the true alias survives
    # the persona family does not explode: top-m caps fan-out per anchor
    assert len(pairs) <= 402 * 3
    from collections import Counter

    fan = Counter(r["src"] for r in pairs)
    assert max(fan.values()) <= 3


def test_cooccurrence_array_form_equals_exploded_form(spark):
    """The shuffle-free array derivation emits the exact same alias edge
    set as the exploded-table url self-join (the pipeline uses the array
    form; the contract is identity)."""
    from nous_spark.datagen import generate_pages
    from nous_spark.linking import (
        cooccurrence_alias_edges,
        cooccurrence_alias_edges_from_arrays,
    )
    from nous_spark.pipeline import stage_extract, stage_mentions

    docs = stage_extract(generate_pages(spark, 300, seed=42)).persist()
    try:
        mentions = stage_mentions(docs)
        old = {(r["src"], r["dst"]) for r in cooccurrence_alias_edges(mentions).collect()}
        new = {
            (r["src"], r["dst"])
            for r in cooccurrence_alias_edges_from_arrays(docs).collect()
        }
        assert old == new and len(old) > 0
    finally:
        docs.unpersist()
