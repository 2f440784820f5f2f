"""Deterministic per-turn classification.

Analog of the reference's content-regex page classification fast path
(``lib/idp_common_pkg/idp_common/classification/service.py:713-739``)
emitting the same output contract as its LLM path — a
``{class, document_boundary}`` pair (``classification/service.py:1296-1317``)
where ``document_boundary ∈ {start, continue}`` drives BIO-style
contiguous-run segmentation (``:2138-2214``).

Classes are derived from explicit topic markers embedded in the main
content (the transcript analog of class-identifying phrases in document
text); unknown/absent markers yield ``unclassified``, mirroring the
reference's empty-response handling (``:1307-1317``).
"""

from __future__ import annotations

import re

_TOPIC = re.compile(r"#topic:([a-z_]+)")
_SEG_START = re.compile(r"#seg:start\b")

# Topic marker → class label (the engine's "class config").
TOPIC_CLASSES = {
    "billing": "invoice",
    "support": "support_ticket",
    "sales": "sales_lead",
    "tech": "tech_note",
}
UNCLASSIFIED = "unclassified"
VALID_CLASSES = frozenset(TOPIC_CLASSES.values())

BOUNDARY_START = "start"
BOUNDARY_CONTINUE = "continue"


def classify_turn(extracted_text: str, role: str, tool: str | None) -> tuple[str, str]:
    """Classify one turn from its extracted main content.

    Returns ``(classification, boundary)``.  Tool-less empty turns are
    ``unclassified`` (reference: blank classification → 'unclassified',
    ``classification/service.py:1310``).
    """
    m = _TOPIC.search(extracted_text)
    cls = TOPIC_CLASSES.get(m.group(1), UNCLASSIFIED) if m else UNCLASSIFIED
    boundary = BOUNDARY_START if _SEG_START.search(extracted_text) else BOUNDARY_CONTINUE
    return cls, boundary
