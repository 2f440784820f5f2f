"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema is exactly the BASELINE input hint:
``transcripts(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)``.

Design goals:
- **Seeded, no wall-clock** — same args → byte-identical parquet.
- **Zipf conversation lengths** (clamped 1..500) so a handful of huge
  conversations exercise the skew salting the north rule mandates.
- **Shuffled turn order within the file** so stable ordering via
  ``Window.partitionBy(conv_id).orderBy(turn_idx)`` is actually tested
  (the reference sorts pages numerically, ``ocr/service.py:455-465``).
- Three payload kinds per FIXTURES.md: html (~50%), layout (~25%),
  plain (~25%), with embedded ``#topic:``/``#seg:start`` class markers
  reproducing the BIO segmentation cases of
  ``classification/service.py:2138-2214``.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("browser", "pdf_reader", "search")
_TOPICS = ("billing", "support", "sales", "tech")

_WORDS = (
    "ledger invoice statement balance refund quota shipment carrier résumé "
    "vector schema parquet shuffle executor partition lineage snapshot "
    "gradient churn cohort tenant quorum replica outage rollback triage "
    "payload checksum manifest watermark throughput latency backlog"
).split()

_NAV_ITEMS = ("Home", "Products", "Pricing", "Docs", "Blog", "Careers", "Contact")
_AD_TEXTS = (
    "Limited offer! Subscribe now and save 20% on the annual plan today",
    "Sponsored: the fastest cloud warehouse, free trial, no card needed",
    "Hot deal — upgrade your storage tier before prices change",
)


def _sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words)).capitalize() + "."


def _paragraph(rng: random.Random, marker: str = "") -> str:
    body = " ".join(_sentence(rng, rng.randint(6, 14)) for _ in range(rng.randint(2, 4)))
    return (marker + " " + body).strip() if marker else body


def _html_payload(rng: random.Random, marker: str) -> str:
    nav = "".join(f'<li><a href="/{x.lower()}">{x}</a></li>' for x in _NAV_ITEMS)
    ads = "".join(
        f'<div class="ad-box"><a href="/promo{i}">{rng.choice(_AD_TEXTS)}</a></div>'
        for i in range(rng.randint(1, 3))
    )
    paras = "".join(
        f"<p>{_paragraph(rng, marker if i == 0 else '')}</p>"
        for i in range(rng.randint(1, 4))
    )
    footer_links = "".join(f'<a href="/f{i}">legal {i}</a>' for i in range(4))
    return (
        "<html><head><title>synthetic</title><style>.x{color:red}</style></head>"
        f"<body><nav><ul>{nav}</ul></nav>"
        f'<header><h1><a href="/">Synthetic Portal</a></h1></header>'
        f'<aside class="sidebar">{ads}</aside>'
        f"<article>{paras}</article>"
        f"<footer>{footer_links}</footer></body></html>"
    )


def _layout_payload(rng: random.Random, marker: str) -> str:
    lines = []
    y = 40.0
    first = True
    for _ in range(rng.randint(3, 8)):
        n_cols = rng.randint(1, 2)
        x = 10.0
        for _ in range(n_cols):
            txt = _sentence(rng, rng.randint(3, 7))
            if first:
                txt = (marker + " " + txt).strip() if marker else txt
                first = False
            lines.append(
                {
                    "text": txt,
                    "bbox": [x, y, x + 30.0 + 4.0 * len(txt) / 10.0, y + 12.0],
                    "conf": round(rng.uniform(72.0, 99.9), 1),
                }
            )
            x += 260.0
        y += 30.0
    rng.shuffle(lines)  # scrambled order: reading-order sort must fix it
    return json.dumps(lines)


def _plain_payload(rng: random.Random, marker: str) -> str:
    head = (marker + " ") if marker else ""
    return head + " ".join(_sentence(rng, rng.randint(5, 12)) for _ in range(rng.randint(1, 3)))


def _zipf_len(rng: random.Random, a: float = 1.5, lo: int = 1, hi: int = 500) -> int:
    # Inverse-CDF Zipf via rejection-free power-law approximation:
    # deterministic given rng state, heavy-tailed, clamped.
    u = rng.random()
    x = int((u ** (-1.0 / (a - 1.0))))
    return max(lo, min(hi, x))


def generate_transcripts(n_convs: int, seed: int = 42) -> list[dict]:
    """Materialize the corpus as a list of row dicts (shuffled turn order)."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for ci in range(n_convs):
        conv_id = f"conv-{ci:08d}"
        length = _zipf_len(rng)
        base_ts = _EPOCH + timedelta(hours=ci % 720)
        # Per-conversation topic plan: occasional topic flips and
        # explicit boundary restarts to exercise all segmentation cases.
        topic = rng.choice(_TOPICS)
        for ti in range(length):
            if ti > 0 and rng.random() < 0.15:
                topic = rng.choice(_TOPICS)  # type-change split
            seg_start = ti > 0 and rng.random() < 0.08  # same-type boundary split
            marker = f"#topic:{topic}" + (" #seg:start" if seg_start else "")
            if rng.random() < 0.05:
                marker = ""  # unclassified turn
            role = _ROLES[ti % 3] if rng.random() < 0.9 else rng.choice(_ROLES)
            tool = rng.choice(_TOOLS) if role == "tool" else None
            r = rng.random()
            if r < 0.50:
                text = _html_payload(rng, marker)
            elif r < 0.75:
                text = _layout_payload(rng, marker)
            else:
                text = _plain_payload(rng, marker)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": base_ts + timedelta(seconds=7 * ti),
                }
            )
    rng.shuffle(rows)
    return rows


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 42,
                              row_group_size: int = 8192) -> int:
    """Write the corpus to one parquet file; returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_transcripts(n_convs, seed)
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    cols = {k: [r[k] for r in rows] for k in schema.names}
    table = pa.Table.from_pydict(cols, schema=schema)
    pq.write_table(table, path, compression="snappy", row_group_size=row_group_size)
    return len(rows)
