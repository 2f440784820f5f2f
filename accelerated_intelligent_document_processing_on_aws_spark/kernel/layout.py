"""Layout-span extraction: bounding-region → text-span mapping with
reading-order sort.

Analog of the reference's Textract LINE-block handling: lines arrive in
arbitrary order with bounding boxes and confidences and must be
restored to reading order (top-to-bottom rows, left-to-right within a
row) before being newline-joined — mirroring the textractor
reading-order parse and the per-line text-confidence table of
``lib/idp_common_pkg/idp_common/ocr/service.py:1561-1675``.

The plain-text path fabricates a single full-width span at confidence
0.99, mirroring the synthetic-OCR path for converted documents
(``ocr/service.py:1805-1846``).
"""

from __future__ import annotations

import json

Span = tuple[int, int, str, float]

PLAIN_CONF = 0.99


def parse_layout(payload: str) -> list[dict] | None:
    """Return the line records if ``payload`` is a layout payload, else None."""
    s = payload.lstrip()
    if not s.startswith("["):
        return None
    try:
        recs = json.loads(s)
    except Exception:
        return None
    if not isinstance(recs, list) or not recs:
        return None
    for r in recs:
        if not isinstance(r, dict) or "bbox" not in r or "text" not in r:
            return None
    return recs


def _row_key(e: tuple) -> tuple:
    return (e[1], e[0], e[2])


def _reading_order(recs: list[dict]) -> list[dict]:
    """Sort line records top-to-bottom, left-to-right.

    Rows are clustered greedily on y0 with a tolerance of half the
    median line height; within a row, sort by x0.  Deterministic: ties
    broken by (y0, x0, text) then input position.

    Hot-path form: one pass builds (y0, x0, text, idx, rec) tuples so
    both sorts run on plain tuples (no per-element key lambdas re-
    indexing the dicts); the idx tiebreak reproduces the original
    stable-sort order exactly and keeps the comparison from ever
    touching the rec dicts.
    """
    items = []
    hs = []
    for i, r in enumerate(recs):
        b = r["bbox"]
        y0 = b[1]
        hs.append(max(b[3] - y0, 1e-9))
        items.append((y0, b[0], r["text"], i, r))
    hs.sort()
    tol = 0.5 * hs[len(hs) // 2]
    items.sort()
    ordered: list[dict] = []
    row: list[tuple] = []
    row_y = None
    for it in items:
        y0 = it[0]
        if row_y is None or y0 - row_y > tol:
            if row:
                row.sort(key=_row_key)
                ordered.extend(e[4] for e in row)
            row = [it]
            row_y = y0
        else:
            row.append(it)
    if row:
        row.sort(key=_row_key)
        ordered.extend(e[4] for e in row)
    return ordered


def extract_spans(payload: str) -> tuple[str, list[Span]]:
    """Extract reading-ordered text + spans from a layout payload.

    Returns ``(text, spans)``; each span is ``(start, end, "line", conf)``
    with ``conf`` normalized to [0, 1] and rounded to 4 places (the
    reference rounds its 0-100 confidences to one decimal,
    ``ocr/service.py:1582``).
    """
    recs = parse_layout(payload)
    if recs is None:
        raise ValueError("not a layout payload")
    return extract_spans_recs(recs)


def extract_spans_recs(recs: list[dict]) -> tuple[str, list[Span]]:
    """:func:`extract_spans` on ALREADY-PARSED line records — the hot
    path entry used by ``kernel/oracle.py`` so the sniff's parse is
    reused instead of ``json.loads``-ing every layout payload twice."""
    ordered = _reading_order(recs)
    parts: list[str] = []
    spans: list[Span] = []
    pos = 0
    for r in ordered:
        t = str(r["text"])
        c = float(r.get("conf", 100.0))
        if c > 1.0:  # 0-100 scale → 0-1
            c = c / 100.0
        parts.append(t)
        spans.append((pos, pos + len(t), "line", round(c, 4)))
        pos += len(t) + 1
    return "\n".join(parts), spans


def plain_spans(text: str) -> tuple[str, list[Span]]:
    """Identity extraction for plain prose at constant confidence 0.99."""
    t = text.strip()
    if not t:
        return "", []
    return t, [(0, len(t), "text", PLAIN_CONF)]


def _parse_blocks(payload: str) -> list[dict]:
    """Parse a layout-block payload (JSON array of heterogeneous
    records carrying a ``kind`` field) — the Python twin of the Spark
    ``from_json`` lift in ``operators/layout_tables.py``."""
    s = payload.lstrip()
    if not s.startswith("["):
        return []
    try:
        recs = json.loads(s)
    except Exception:
        return []
    return [r for r in recs if isinstance(r, dict)]


def extract_tables(payload: str) -> list[dict]:
    """Lift table cells into the reference's ``Page.tables`` shape
    (``lib/idp_common_pkg/idp_common/models.py:48``): a list of cell
    dicts ``{table, row, col, text, conf}`` sorted row-major within
    table id.  Non-cell records are ignored."""
    cells = [
        {
            "table": int(r.get("table", 0) or 0),
            "row": int(r.get("row", 0) or 0),
            "col": int(r.get("col", 0) or 0),
            "text": str(r.get("text", "")),
            "conf": float(r.get("conf", 0.0) or 0.0),
        }
        for r in _parse_blocks(payload)
        if r.get("kind") == "cell"
    ]
    cells.sort(key=lambda c: (c["table"], c["row"], c["col"], c["text"]))
    return cells


def extract_forms(payload: str) -> dict[str, str]:
    """Lift key-value form fields into the reference's ``Page.forms``
    shape (``models.py:49``): key → value with dict-update semantics
    (later records overwrite earlier duplicates, matching the Spark
    lift's last-position-wins window)."""
    out: dict[str, str] = {}
    for r in _parse_blocks(payload):
        if r.get("kind") == "kv" and r.get("key") is not None:
            out[str(r["key"])] = str(r.get("text", ""))
    return out


def tables_to_markdown(cells: list[dict]) -> dict[int, str]:
    """Render lifted cells to a markdown grid per table id — the
    Python twin of the reference's table render
    (``ocr/document_converter.py:331``): header row, ``|---|``
    separator, body rows."""
    by_table: dict[int, list[dict]] = {}
    for c in cells:
        by_table.setdefault(c["table"], []).append(c)
    out: dict[int, str] = {}
    for tid, cs in by_table.items():
        cs = sorted(cs, key=lambda c: (c["row"], c["col"], c["text"]))
        rows: dict[int, list[str]] = {}
        for c in cs:
            rows.setdefault(c["row"], []).append(c["text"])
        ncols = max(c["col"] for c in cs) + 1
        lines = ["| " + " | ".join(rows[r]) + " |" for r in sorted(rows)]
        sep = "|" + "---|" * ncols
        out[tid] = "\n".join([lines[0], sep] + lines[1:])
    return out
