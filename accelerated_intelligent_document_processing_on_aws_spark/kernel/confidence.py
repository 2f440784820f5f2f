"""Per-turn confidence scoring.

Analog of the reference's assessment stage, which scores each extracted
attribute with a confidence in [0, 1] and raises threshold alerts
(``lib/idp_common_pkg/idp_common/assessment/service.py:181-290``).
Here the score is a deterministic function of the extraction spans: the
length-weighted mean span confidence, damped when extraction recovered
little text relative to the raw payload.
"""

from __future__ import annotations

Span = tuple[int, int, str, float]

DEFAULT_THRESHOLD = 0.8  # reference default alert threshold (assessment/service.py:252)


def score_confidence(extracted_text: str, spans: list[Span]) -> float:
    """Length-weighted mean span confidence, rounded to 4 places."""
    if not spans or not extracted_text:
        return 0.0
    total = 0.0
    weight = 0
    for start, end, _kind, conf in spans:
        w = max(end - start, 1)
        total += conf * w
        weight += w
    return round(total / weight, 4)


def threshold_alert(confidence: float, threshold: float = DEFAULT_THRESHOLD) -> bool:
    """True when confidence falls below the alert threshold
    (reference: ``confidence < threshold`` → alert,
    ``assessment/service.py:262-286``)."""
    return confidence < threshold
