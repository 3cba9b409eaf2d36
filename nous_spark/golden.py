"""Golden-triple corpus — the correctness oracle for the P/R >= 0.95 gate.

Canonicalized from the reference extraction suite (FIXTURES.md §2;
/root/reference/apps/api/tests/features/graph/services/
test_langchain_fact_extractor_integration.py and
.../usecases/test_assimilate_knowledge_usecase_integration.py).

Each case: (gid, id_type, id_value, lang, text, expected) where
``expected`` is a list of (pred_alternatives, obj_alternatives) — the
reference tests accept alternative verbs/types, encoded here with ``|``;
an obj of ``*:Name`` accepts any fact type. Empty expected == the
zero-fact invariant (generic text, test :102-113).
"""

from __future__ import annotations

GOLDEN: list[dict] = [
    {
        "gid": "g01",  # test :116-138
        "id_type": "email",
        "id_value": "john.doe@example.com",
        "lang": "en",
        "text": "I really enjoy hiking on weekends.",
        "expected": [("enjoys|likes", "Hobby:Hiking|Activity:Hiking")],
    },
    {
        "gid": "g02",  # test :140-162
        "id_type": "username",
        "id_value": "user123",
        "lang": "en",
        "text": "I don't like Mondays.",
        "expected": [("dislikes|does_not_like", "*:Mondays")],
    },
    {
        "gid": "g03",  # test :44-73; prompt example langchain_fact_extractor.py:80-83
        "id_type": "email",
        "id_value": "john.doe@example.com",
        "lang": "en",
        "text": "John Doe lives in Paris and works as a Software Engineer at Google.",
        "expected": [
            ("lives_in", "Location:Paris"),
            ("works_as", "Profession:Software Engineer"),
            ("works_at", "Company:Google"),
        ],
    },
    {
        "gid": "g04",  # test :76-100
        "id_type": "username",
        "id_value": "AppleInc",
        "lang": "en",
        "text": "Apple Inc. is headquartered in Cupertino, California and was founded in 1976.",
        "expected": [
            ("headquartered_in", "Location:Cupertino"),
            ("headquartered_in", "Location:California"),
            ("founded_in", "Year:1976"),
        ],
    },
    {
        "gid": "g05",  # test :102-113 — zero facts from generic/meta text
        "id_type": "username",
        "id_value": "test-entity-123",
        "lang": "en",
        "text": "This is a test entity with minimal information.",
        "expected": [],
    },
    {
        "gid": "g06",  # test :164-201 — pt name, English type/verb
        "id_type": "email",
        "id_value": "mariele@example.com",
        "lang": "pt",
        "text": (
            "De tomar a decisão correta em uma empresa nova que eu e meu "
            "marido vamos abrir em breve."
        ),
        "expected": [("plans_to_open", "Business:empresa nova")],
    },
    {
        "gid": "g07",  # usecase test :244-285 — multi-fact, multi-type bio
        "id_type": "email",
        "id_value": "jane.smith@example.com",
        "lang": "en",
        "text": (
            "Jane Smith lives in San Francisco and works as a Senior Product "
            "Manager at TechCorp. She studied at Stanford University. "
            "She speaks English and Portuguese. "
            "She enjoys hiking and photography."
        ),
        "expected": [
            ("lives_in", "Location:San Francisco"),
            ("works_as", "Profession:Senior Product Manager"),
            ("works_at", "Company:TechCorp"),
            ("studied_at", "Institution:Stanford University"),
            ("speaks", "Language:English"),
            ("speaks", "Language:Portuguese"),
            ("enjoys", "Hobby:Hiking"),
            ("enjoys", "Hobby:Photography"),
        ],
    },
    {
        "gid": "g08",  # prompt example langchain_fact_extractor.py:86-89
        "id_type": "email",
        "id_value": "jane.doe@example.com",
        "lang": "en",
        "text": "I think that new project is a bad idea.",
        "expected": [("considers_bad_idea", "Opinion:new project")],
    },
    {
        "gid": "g09",  # Spanish multilingual (usecase test :287-310)
        "id_type": "email",
        "id_value": "maria.garcia@example.com",
        "lang": "es",
        "text": (
            "Me llamo María García. Vivo en Barcelona y trabajo como "
            "profesora de matemáticas."
        ),
        "expected": [
            ("is_named", "Name:María García"),
            ("lives_in", "Location:Barcelona"),
            ("works_as", "Profession:profesora de matemáticas"),
        ],
    },
    {
        "gid": "g10",  # history-context phrasing (usecase test :184-213)
        "id_type": "email",
        "id_value": "test.user@example.com",
        "lang": "en",
        "text": "I work as a software engineer now.",
        "expected": [("works_as", "Profession:Software Engineer")],
    },
    {
        "gid": "g11",  # real two-turn history context (usecase test :184-213:
        # history=["Hello, I'm John...", "I moved to Paris last year."],
        # content="I work as a software engineer now." — the extractor
        # prompt prepends the history section, langchain_fact_extractor.py:129-152)
        "id_type": "email",
        "id_value": "test.user@example.com",
        "lang": "en",
        "history": "Hello, I'm John and I'm 25 years old.\nI moved to Paris last year.",
        "text": "I work as a software engineer now.",
        "expected": [
            ("moved_to", "Location:Paris"),
            ("works_as", "Profession:Software Engineer"),
        ],
    },
]

# cases whose text alone is self-contained (no separate history column) —
# what datagen inlines into synthetic pages; MUST keep the same length/
# order as round-1 GOLDEN so seeded corpora stay byte-identical
GOLDEN_INLINE: list[dict] = [g for g in GOLDEN if "history" not in g]


def expected_matches(pred: str, obj: str, exp_pred: str, exp_obj: str) -> bool:
    """Does emitted (pred, obj) satisfy an expected (pred_alts, obj_alts)?"""
    if pred not in exp_pred.split("|"):
        return False
    for alt in exp_obj.split("|"):
        etype, _, ename = alt.partition(":")
        otype, _, oname = obj.partition(":")
        if (etype == "*" or etype == otype) and oname == ename:
            return True
    return False


def score_pr(
    emitted: list[tuple[str, str, str]],
    expected: list[tuple[str, str, str]],
) -> tuple[float, float]:
    """Precision/recall over (subj, pred, obj) with |-alternatives in expected.

    ``emitted``: concrete triples. ``expected``: (subj, pred_alts, obj_alts).
    """
    matched_exp: set[int] = set()
    tp = 0
    for subj, pred, obj in emitted:
        hit = False
        for i, (esubj, epred, eobj) in enumerate(expected):
            if i in matched_exp:
                continue
            if esubj == subj and expected_matches(pred, obj, epred, eobj):
                matched_exp.add(i)
                hit = True
                break
        if hit:
            tp += 1
    fp = len(emitted) - tp
    fn = len(expected) - len(matched_exp)
    precision = tp / (tp + fp) if (tp + fp) else 1.0
    recall = tp / (tp + fn) if (tp + fn) else 1.0
    return precision, recall
