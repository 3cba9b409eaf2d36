"""Byte-exact normalization rules that define triple identity.

These MUST match the reference exactly — they are the identity functions
for the P/R >= 0.95 gate (SURVEY.md §4 item 5). One implementation, two
surfaces: plain-Python (used inside Arrow-batched pandas UDFs and in
tests) and Spark Column expressions (used in DataFrame stages). Both are
property-tested for agreement in tests/test_normalize.py.

Reference rules (files relative to /root/reference/apps/api/app/features/graph/):
  * Fact.name / Fact.type: strip, reject empty    (models/fact_model.py:30-38)
  * fact_id = f"{type}:{name}"                    (models/fact_model.py:55-57)
  * HAS_FACT.verb: strip then lower               (models/fact_model.py:84-88)
  * Identifier.value: strip, reject empty         (models/identifier_model.py:29-36)
  * Identifier.type in {email, phone, username,
    uuid, social_id}                              (models/identifier_model.py:38-43)
  * Source.content: strip, reject empty           (models/source_model.py:29-36)
  * confidence_score in [0, 1], default 1.0       (models/fact_model.py:71-76)
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

from nous_spark.schemas import IDENTIFIER_TYPES

# Namespace for deterministic entity ids: uuid5 over "idtype:idvalue".
# The reference mints uuid4 per new entity (entity_model.py:21) and makes
# creation idempotent by find-or-create on the identifier
# (age_repository.py:101-123); a deterministic uuid5 anchor gives the same
# observable semantics (one stable id per identifier) without coordination,
# which is what makes linking embarrassingly parallel at 10^12 docs.
ENTITY_NS = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")  # stdlib NAMESPACE_URL

# Namespace-equivalent used for Qdrant-style deterministic point ids
# (qdrant_repository.py:63-78 uses uuid5(NAMESPACE_DNS, key)).
POINT_NS = uuid.NAMESPACE_DNS


# ------------------------------------------------------------- python side
def norm_name(s: str) -> str:
    """Fact.name normalization: strip (fact_model.py:30-33)."""
    return s.strip()


def norm_type(s: str) -> str:
    """Fact.type normalization: strip (fact_model.py:35-38)."""
    return s.strip()


def norm_verb(s: str) -> str:
    """HAS_FACT verb normalization: strip + lower (fact_model.py:84-88)."""
    return s.strip().lower()


def norm_identifier_value(s: str) -> str:
    """Identifier.value normalization: strip (identifier_model.py:29-36)."""
    return s.strip()


def fact_id(fact_type: str, name: str) -> str:
    """Synthetic fact PK: f"{type}:{name}" (fact_model.py:55-57).

    Inputs are assumed already normalized.
    """
    return f"{fact_type}:{name}"


def entity_key(id_type: str, id_value: str) -> str:
    return f"{id_type}:{id_value}"


def entity_id_for(id_type: str, id_value: str) -> str:
    """Deterministic anchor entity id for an identifier."""
    return str(uuid.uuid5(ENTITY_NS, entity_key(id_type, id_value)))


def point_id_for(tenant_id: str, entity_id: str, verb: str, fid: str) -> str:
    """Deterministic vector point id — uuid5 of
    f"{tenant}:{entity}:{verb}:{fact_id}" (qdrant_repository.py:63-78)."""
    return str(uuid.uuid5(POINT_NS, f"{tenant_id}:{entity_id}:{verb}:{fid}"))


def synthetic_sentence(verb: str, fact_type: str, name: str) -> str:
    """Embedding input sentence (qdrant_repository.py:93-107)."""
    return f"The entity {verb} {fact_type}: {name}"


def is_valid_identifier_type(t: str) -> bool:
    return t in IDENTIFIER_TYPES


def clamp_confidence(c: float | None) -> float:
    """confidence in [0,1], default 1.0 (fact_model.py:71-76)."""
    if c is None:
        return 1.0
    return max(0.0, min(1.0, float(c)))


# ------------------------------------------------------------- column side
# Spark's trim() strips ONLY ASCII space; the reference strips via Python
# str.strip(), which removes every char where str.isspace() is True —
# including \x1c-\x1f, \x85, NBSP and the Unicode Zs block. Byte-exact
# parity (found by hypothesis in tests/test_properties.py) requires a
# regex with exactly Python's whitespace set.
_PY_SPACE_CLASS = (
    "[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]"
)
_PY_STRIP_RE = f"^{_PY_SPACE_CLASS}+|{_PY_SPACE_CLASS}+$"


def py_strip_col(c: Column) -> Column:
    """Column equivalent of Python str.strip() (byte-exact)."""
    return F.regexp_replace(c, _PY_STRIP_RE, "")


def norm_name_col(c: Column) -> Column:
    return py_strip_col(c)


def norm_type_col(c: Column) -> Column:
    return py_strip_col(c)


def norm_verb_col(c: Column) -> Column:
    return F.lower(py_strip_col(c))


def fact_id_col(fact_type: Column, name: Column) -> Column:
    return F.concat(fact_type, F.lit(":"), name)


def entity_key_col(id_type: Column, id_value: Column) -> Column:
    return F.concat(id_type, F.lit(":"), id_value)


def synthetic_sentence_col(verb: Column, fact_type: Column, name: Column) -> Column:
    return F.concat(
        F.lit("The entity "), verb, F.lit(" "), fact_type, F.lit(": "), name
    )
