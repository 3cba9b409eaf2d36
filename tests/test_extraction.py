"""Golden-triple extraction suite — the P/R >= 0.95 gate at unit level.

Mirrors the reference's extraction integration tests
(test_langchain_fact_extractor_integration.py — specific triples from
specific inputs, structural invariants, zero-facts-on-generic-text)."""

from __future__ import annotations

import pytest

from nous_spark.datagen import gen_row
from nous_spark.extraction.html import extract_text_str
from nous_spark.extraction.mentions import extract_mentions_text
from nous_spark.extraction.triples import extract_triples_text, with_history
from nous_spark.golden import GOLDEN, score_pr
from nous_spark.normalize import fact_id


@pytest.mark.parametrize("g", GOLDEN, ids=[g["gid"] for g in GOLDEN])
def test_golden_case(g):
    # history cases (g11): prior turns are prepended to the scan, exactly
    # as stage_extract does with the optional pages.history column
    trips = extract_triples_text(with_history(g.get("history"), g["text"]))
    subj = f"{g['id_type']}:{g['id_value']}"
    emitted = [(subj, p, fact_id(t, n)) for (p, t, n, c) in trips]
    expected = [(subj, pa, oa) for (pa, oa) in g["expected"]]
    precision, recall = score_pr(emitted, expected)
    assert precision == 1.0 and recall == 1.0, (emitted, expected)


@pytest.mark.parametrize("g", GOLDEN, ids=[g["gid"] for g in GOLDEN])
def test_structural_invariants(g):
    # reference test :58-73 — non-empty name/type/verb, confidence in [0,1]
    for pred, ftype, name, conf in extract_triples_text(
        with_history(g.get("history"), g["text"])
    ):
        assert pred and pred == pred.strip().lower()
        assert ftype and ftype == ftype.strip()
        assert name and name == name.strip()
        assert 0.0 <= conf <= 1.0


def test_zero_facts_on_generic_text():
    assert extract_triples_text("This is a test entity with minimal information.") == []
    assert extract_triples_text("") == []
    assert extract_triples_text(None) == []


def test_english_type_verb_pt_name():
    # langchain_fact_extractor.py:70 — type/verb English, name source language
    trips = extract_triples_text(GOLDEN[5]["text"])
    assert len(trips) == 1
    pred, ftype, name, _ = trips[0]
    assert pred == "plans_to_open" and ftype == "Business"
    assert "empresa" in name


def test_within_doc_dedup():
    text = "I enjoy hiking. I enjoy hiking."
    assert len(extract_triples_text(text)) == 1


def test_html_roundtrip_byte_identity():
    # BASELINE.md per-row invariant: byte-identical text per url
    for i in range(200):
        page, _ = gen_row(i)
        assert extract_text_str(page["html"]) == page["text"]


def test_html_extractor_determinism_and_idempotence():
    html = b"<html><head><script>var x=1;</script></head><body><p>Hello &amp; world</p><div>Bye</div></body></html>"
    out = extract_text_str(html)
    assert out == "Hello & world\nBye"
    assert extract_text_str(out) == out  # idempotent on plain text


def test_mentions_detection_and_order():
    text = "Identity: email:a@b.com\nIdentity: username:ab_handle\nReach me at c@d.org or @other."
    got = extract_mentions_text(text)
    assert got[0] == ("email", "a@b.com")
    assert ("username", "ab_handle") in got
    assert ("email", "c@d.org") in got
    assert ("username", "other") in got


def test_mentions_phone_uuid():
    text = "Call +4915112345678 or ref 123e4567-e89b-12d3-a456-426614174000."
    got = dict((t, v) for t, v in extract_mentions_text(text))
    assert got.get("phone") == "+4915112345678"
    assert got.get("uuid") == "123e4567-e89b-12d3-a456-426614174000"


def test_mentions_social_profiles():
    """In-the-wild social_id detection (identifier_model.py:38-43 enum):
    platform-qualified so the same handle on two platforms never aliases."""
    text = (
        "Find me at https://github.com/Alice-Dev or "
        "www.linkedin.com/in/alice-dev and x.com/@alicedev."
    )
    got = [(t, v) for t, v in extract_mentions_text(text)]
    socials = {v for t, v in got if t == "social_id"}
    assert "github:alice-dev" in socials
    assert "linkedin:alice-dev" in socials
    assert "twitter:alicedev" in socials
    # explicit Identity: social_id lines still work and are not re-detected
    got2 = extract_mentions_text("Identity: social_id:github:bob\nno links here")
    assert got2 == [("social_id", "github:bob")]
