"""String comparison kernels (pure Python) used inside pandas UDFs.

Mirrors the semantics of the reference comparators
(``lib/idp_common_pkg/idp_common/evaluation/comparator.py``): text
normalization (``:100-115``), numeric normalization (``:118-140``),
Levenshtein similarity (``:306-345``).  The Spark column-expression
twins live in ``functions.normalize`` / ``operators.evaluation``; these
exist for list-item comparisons inside the Hungarian matcher, where the
work is per-pair and already inside a vectorized batch.
"""

from __future__ import annotations

import re

_PUNCT = re.compile(r"[^\w\s]")
_WS = re.compile(r"\s+")
_CURRENCY = re.compile(r"[$,()\s]")


def norm_text(s: str | None) -> str:
    if s is None:
        return ""
    return _WS.sub(" ", _PUNCT.sub("", str(s))).strip().lower()


def norm_numeric(s) -> float | None:
    if s is None:
        return None
    try:
        return float(_CURRENCY.sub("", str(s)))
    except ValueError:
        return None


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_score(a: str | None, b: str | None) -> float:
    """1 - dist/max_len over normalized strings (``comparator.py:306-345``)."""
    na, nb = norm_text(a), norm_text(b)
    if not na and not nb:
        return 1.0
    if not na or not nb:
        return 0.0
    return 1.0 - levenshtein(na, nb) / max(len(na), len(nb))


def item_score(a, b, comparator: str = "EXACT") -> float:
    """Per-item similarity for list matching (``comparator.py:550-572``)."""
    if comparator == "FUZZY":
        return fuzzy_score(a, b)
    if comparator == "NUMERIC":
        x, y = norm_numeric(a), norm_numeric(b)
        if x is not None and y is not None:
            return 1.0 if x == y else 0.0
        return 1.0 if norm_text(a) == norm_text(b) else 0.0
    return 1.0 if norm_text(a) == norm_text(b) else 0.0


def hungarian_compare(
    expected: list | None,
    actual: list | None,
    comparator: str = "EXACT",
    threshold: float = 0.8,
) -> tuple[int, int, float]:
    """List-vs-list optimal assignment → (tp, fp, mean assigned score).

    Reference semantics (``comparator.py:240-303``): a 1-vs-1 pair
    early-returns the RAW score with (1,0)/(0,1) on the threshold
    (``:266-269``); cost = 1 - sim; TP = assigned pairs with
    sim ≥ threshold; FP = len(actual) - TP; avg_score averages over ALL
    assigned pairs, not only the matched ones (``:301``); empty edge
    cases per ``:272-277``.
    """
    expected = expected or []
    actual = actual or []
    if len(expected) == 1 and len(actual) == 1:
        score = item_score(expected[0], actual[0], comparator)
        return (1, 0, score) if score >= threshold else (0, 1, score)
    if not expected and not actual:
        return 0, 0, 1.0
    if not expected:
        return 0, len(actual), 0.0
    if not actual:
        return 0, 0, 0.0
    from .hungarian import assign

    sims = [[item_score(e, a, comparator) for a in actual] for e in expected]
    cost = [[1.0 - s for s in row] for row in sims]
    pairs = assign(cost)
    scores = [sims[r][c] for r, c in pairs]
    tp = sum(1 for s in scores if s >= threshold)
    fp = len(actual) - tp
    avg = sum(scores) / len(scores) if scores else 0.0
    return tp, fp, avg


def convert_to_list(value) -> list[str]:
    """String→list coercion, exact reference parity
    (``evaluation/comparator.py:210-238``): None → []; list → items
    stringified; a parseable ``[...]`` literal → its items via
    ``ast.literal_eval``; anything else → ``[str(value)]``."""
    import ast

    if value is None:
        return []
    if isinstance(value, list):
        return [str(item) for item in value]
    if isinstance(value, str) and value.startswith("[") and value.endswith("]"):
        try:
            parsed = ast.literal_eval(value)
            if isinstance(parsed, list):
                return [str(item) for item in parsed]
        except (ValueError, SyntaxError):
            pass
    return [str(value)]
