"""Batch-vectorized HTML main-content extraction.

Byte-equal batch twin of :func:`.html_extract.strip_boilerplate` (the
per-turn scalar kernel, itself the Spark restatement of the reference's
OCR text parse, ``lib/idp_common_pkg/idp_common/ocr/service.py:1603-1675``),
following the same engineering pattern as the signature kernel
(:mod:`.sighash`): lower to flat Arrow/numpy buffers, vectorize the
per-document busywork batch-wide, keep only an int-driven state machine
in Python, and gate equivalence per document against the scalar
reference (tests/test_htmlbatch_equiv.py).

Three phases per batch of documents:

1. **Token discovery (numpy, batch-wide).**  All ``<`` / ``>`` byte
   positions in the concatenated UTF-8 buffer via ``flatnonzero``; the
   matching ``>`` per candidate via one ``searchsorted``; candidate
   class (open/end/misc/junk) from the byte after ``<``.  ASCII is
   byte-transparent in UTF-8 — a multi-byte sequence can never contain
   ``<`` ``>`` ``/`` or a letter — so byte positions are exactly the
   scalar scanner's character decisions.
2. **Tag resolution (memoized, per site).**  Each open/end tag slice
   is resolved — name parse, quote balance, class/id boilerplate hint
   — once per distinct byte string, cached module-wide.  (A batch-wide
   ``dictionary_encode`` variant was measured and REJECTED: gathering
   the tag bytes into one Arrow array cost ~1.2 s/13.6 k docs, an
   order of magnitude more than the ~0.15 s of dict probes + slices it
   saved — see NOTES.md round 6.)
3. **State machine (lean Python loop).**  Per-event Python: stack
   push/pop, depth counters, block bookkeeping — driven by the
   precomputed candidate tuples; no string find/regex in the loop.
   Block text materialization (decode, conditional unescape,
   whitespace collapse) happens per KEPT block afterwards, exactly
   like the scalar path.

**Measured outcome (round 6): the batch twin is byte-equal but only
~1.0x the scalar find-dispatch kernel** (interleaved medians, 13.6 k
fixture docs: 0.84 s scalar vs 0.86 s batch).  Candidate pre-discovery
eliminates the ``str.find`` calls (~0.23 s/1 M), but pays an equal
tokenize + list-materialization cost, and the remaining >80 % of the
time is the per-tag state bookkeeping both designs share.  The scalar
kernel stays the production path; this module is the equivalence-gated
prototype (tests/test_htmlbatch_equiv.py) for future revisits.

Per-document fallbacks to the scalar kernel (still byte-equal, just
slower): documents containing U+0130 / U+212A — the only two
codepoints where ``str.lower()`` changes length or lowers into ASCII,
which would shift the scalar's lazy ``html.lower()`` raw-text search —
and any document whose batch scan raises.
"""

from __future__ import annotations

import html as _html_mod
import re
from bisect import bisect_left

import numpy as np
import pyarrow as pa

from . import html_extract as hx

# Byte-compiled twins of the scalar scanner's anchored fallback
# grammars.  The patterns are pure ASCII and UTF-8 is byte-transparent
# for ASCII, so match spans in the byte domain equal the scalar match
# spans in the character domain (offset by the document's byte start).
_CAREFUL_TAG_B = re.compile(
    rb"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)"
    rb"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)"
    rb"(/?)>",
    re.DOTALL,
)
_MISC_TAG_B = re.compile(rb"<(?:!--.*?-->|![^>]*>|\?[^>]*>)", re.DOTALL)
_PURE_NAME_B = re.compile(rb"[a-zA-Z][a-zA-Z0-9:-]*\Z")
_NAME_PREFIX_B = re.compile(rb"[a-zA-Z][a-zA-Z0-9:-]*")

# Candidate classes (cand_type values).
_OPEN, _END, _MISC, _JUNK = 0, 1, 2, 3

# The ONLY codepoints whose str.lower() is not a 1:1 non-ASCII map:
# U+0130 (İ → 'i'+combining dot: length changes, shifting positions in
# the scalar's lowered-string raw-text search) and U+212A (KELVIN K →
# ASCII 'k': lowers INTO the ASCII searched for "</script").  Verified
# exhaustively over all of Unicode; documents containing either byte
# sequence take the scalar path.
_SUSPECT_I = (0xC4, 0xB0)  # U+0130 UTF-8
_SUSPECT_K = (0xE2, 0x84, 0xAA)  # U+212A UTF-8

# Module-wide resolution memos keyed by slice BYTES (the templated tag
# vocabulary of a corpus is tiny; bounded like the scalar memos).
_CAREFUL = object()  # sentinel: must re-regex at each occurrence
_OPEN_RES: dict = {}
_END_RES: dict = {}
_MEMO_BOUND = 4096

_RAW_SCRIPT = rb"</script"
_RAW_STYLE = rb"</style"


def _resolve_end(nm: bytes):
    """END-tag slice → tag name (str) or the _CAREFUL sentinel when the
    name needs the full grammar."""
    res = _END_RES.get(nm)
    if res is not None:
        return res
    if _PURE_NAME_B.match(nm):
        res = nm.decode("ascii").lower()
    else:
        res = _CAREFUL
    if len(_END_RES) < _MEMO_BOUND:
        _END_RES[nm] = res
    return res


def _resolve_open(sl: bytes):
    """OPEN-tag slice → (tag, drop, boiler, block, entry, self_close,
    is_a, is_br, is_raw) or _CAREFUL when mixed/odd quotes mean the tag
    may extend past the first '>' (exactly the scalar memoizability
    rule).  The is_* flags precompute the scan loop's string compares."""
    res = _OPEN_RES.get(sl)
    if res is not None:
        return res
    if b'"' in sl or b"'" in sl:
        if b"'" not in sl and sl.count(b'"') % 2 == 0:
            pass  # balanced double quotes: the slice IS the tag
        elif b'"' not in sl and sl.count(b"'") % 2 == 0:
            pass  # balanced single quotes
        else:
            if len(_OPEN_RES) < _MEMO_BOUND:
                _OPEN_RES[sl] = _CAREFUL
            return _CAREFUL
    m = _NAME_PREFIX_B.match(sl)  # sl[0] is alpha by candidate class
    name = m.group()
    rest = sl[m.end() :]
    if rest.endswith(b"/"):
        self_close = True
        blob = rest[:-1]
    else:
        self_close = False
        blob = rest
    tag = name.decode("ascii").lower()
    drop, boiler, block = hx._TAG_INFO.get(tag, hx._NO_INFO)
    entry = (tag, boiler, drop, block)
    if (
        blob
        and not boiler
        and (b"class" in blob or b"id" in blob or b"ID" in blob or b"CLASS" in blob)
    ):
        attr_text = " ".join(
            (am.group(2) or am.group(3) or am.group(4) or "")
            for am in hx._FAST_ATTR.finditer(blob.decode("utf-8"))
        )
        if attr_text and hx._BOILERPLATE_HINT.search(attr_text):
            boiler = True
            entry = (tag, True, drop, block)
    res = (tag, drop, boiler, block, entry, self_close)
    if len(_OPEN_RES) < _MEMO_BOUND:
        _OPEN_RES[sl] = res
    return res


def _blob_boiler(tag: str, drop: bool, boiler: bool, block: bool, blob: bytes):
    """Attr-hint pass for the non-memoizable careful path."""
    entry = (tag, boiler, drop, block)
    if (
        blob
        and not boiler
        and (b"class" in blob or b"id" in blob or b"ID" in blob or b"CLASS" in blob)
    ):
        attr_text = " ".join(
            (am.group(2) or am.group(3) or am.group(4) or "")
            for am in hx._FAST_ATTR.finditer(blob.decode("utf-8"))
        )
        if attr_text and hx._BOILERPLATE_HINT.search(attr_text):
            boiler = True
            entry = (tag, True, drop, block)
    return boiler, entry


def _tokenize_batch(buf: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Phase 1+2: candidate discovery + dictionary-encoded tag slices.

    Returns ``(cand_pos, cand_type, cand_gt, gt_list, raw_close,
    fallback)``: parallel per-candidate lists (position, candidate
    class, matching ``>`` position or -1 when absent) with junk
    candidates pre-filtered out (a junk ``<`` is data and never acted
    on), all ``>`` positions, the case-insensitive ``</script`` /
    ``</style`` occurrence positions, and the doc indices that must
    take the scalar path (suspect codepoints).  Tag-slice resolution
    happens per site in :func:`_scan_doc` through the module memos —
    measured faster than a batch dictionary-encode gather, whose
    repeat/arange byte gather cost more than the dict probes it saved.
    """
    lt_idx = np.flatnonzero(buf == 0x3C)
    gt_idx = np.flatnonzero(buf == 0x3E)
    nbuf = buf.size
    n = lt_idx.size

    if n:
        nc_pos = lt_idx + 1
        nc = np.where(nc_pos < nbuf, buf[np.minimum(nc_pos, nbuf - 1)], 0)
        is_open = ((nc >= 0x61) & (nc <= 0x7A)) | ((nc >= 0x41) & (nc <= 0x5A))
        is_end = nc == 0x2F
        is_misc = (nc == 0x21) | (nc == 0x3F)
        ctype = np.full(n, _JUNK, np.int8)
        ctype[is_open] = _OPEN
        ctype[is_end] = _END
        ctype[is_misc] = _MISC
        # a '<' whose following byte lives in the NEXT document is junk
        doc_of = np.searchsorted(ends, lt_idx, side="right")
        ctype[nc_pos >= ends[np.minimum(doc_of, ends.size - 1)]] = _JUNK

        slice_start = np.where(ctype == _END, lt_idx + 2, lt_idx + 1)
        if gt_idx.size:
            gi = np.searchsorted(gt_idx, slice_start)
            has_gt = gi < gt_idx.size
            # missing '>' encodes as nbuf: one `gt >= dend` compare in
            # the scan loop covers both absent and cross-document
            cgt = np.where(has_gt, gt_idx[np.minimum(gi, gt_idx.size - 1)], nbuf)
        else:
            cgt = np.full(n, nbuf, np.int64)
        keep = ctype != _JUNK
        cand_pos = lt_idx[keep].tolist()
        cands = list(
            zip(cand_pos, ctype[keep].tolist(), cgt[keep].tolist())
        )
    else:
        cand_pos = []
        cands = []

    # raw-text close positions: END candidates whose lowered name
    # starts with script/style — all case-insensitive occurrences of
    # "</script" / "</style" in the buffer are END-class '<' bytes
    raw_close: dict = {"script": [], "style": []}
    if n:
        end_lt = lt_idx[is_end]
        if end_lt.size:
            # bytes 0-1 are '<' '/' by candidate class; the remaining
            # pattern bytes are ASCII letters, so `| 0x20` case-folds
            # without copying/lowering the whole buffer
            for tag, pat in (("script", _RAW_SCRIPT), ("style", _RAW_STYLE)):
                plen = len(pat)
                cand = end_lt[end_lt + plen <= nbuf]
                m = np.ones(cand.size, bool)
                for k in range(2, plen):
                    m &= (buf[cand + k] | 0x20) == pat[k]
                raw_close[tag] = cand[m].tolist()

    # suspect codepoints → scalar fallback for the containing docs
    fallback: set = set()
    if nbuf:
        s1 = np.flatnonzero((buf[:-1] == _SUSPECT_I[0]) & (buf[1:] == _SUSPECT_I[1]))
        s2 = (
            np.flatnonzero(
                (buf[:-2] == _SUSPECT_K[0])
                & (buf[1:-1] == _SUSPECT_K[1])
                & (buf[2:] == _SUSPECT_K[2])
            )
            if nbuf >= 3
            else np.empty(0, np.int64)
        )
        for pos_arr in (s1, s2):
            if pos_arr.size:
                for d in np.searchsorted(ends, pos_arr, side="right").tolist():
                    fallback.add(d)

    return cand_pos, cands, gt_idx.tolist(), raw_close, fallback


def _scan_doc(
    big: bytes,
    dstart: int,
    dend: int,
    ci: int,
    cand_pos: list,
    cands: list,
    gt_list: list,
    raw_script: list,
    raw_style: list,
) -> tuple[list, int]:
    """Phase 3 state machine for ONE document.  Returns (blocks, next_ci)
    where each block is ``[tag, boiler, n_elems, parts]`` and each part
    is ``(byte_start, byte_end, in_link)``.  Mirrors
    :func:`html_extract._scan_blocks` decision-for-decision; all
    positions are byte offsets into the batch buffer."""
    blocks: list = []
    drop_depth = boiler_depth = link_depth = 0
    cur = None
    stack: list = []
    pos = dstart
    ncand = len(cands)

    def _end(tag: str) -> None:
        nonlocal drop_depth, boiler_depth, link_depth, cur
        while stack:
            t, b, d, blk = stack.pop()
            if d:
                if drop_depth:
                    drop_depth -= 1
            else:
                if b and boiler_depth:
                    boiler_depth -= 1
                if t == "a" and link_depth:
                    link_depth -= 1
                if blk:
                    cur = None
            if t == tag:
                break

    while ci < ncand:
        lt, t, gt = cands[ci]
        if lt >= dend:
            break
        if lt < pos:  # consumed by an earlier token / raw-text skip
            ci += 1
            continue
        if t == _MISC:
            m = _MISC_TAG_B.match(big, lt, dend)
            if m is None:
                ci += 1
                continue
            if lt > pos and not drop_depth:
                if cur is None:
                    cur = [
                        "p",
                        boiler_depth > 0,
                        1,
                        [(pos, lt, link_depth > 0)],
                    ]
                    blocks.append(cur)
                else:
                    cur[3].append((pos, lt, link_depth > 0))
            pos = m.end()
            ci += 1
            continue
        if gt >= dend:
            ci += 1  # no '>' inside this document: '<' stays data
            continue
        if t == _END:
            sl = big[lt + 2 : gt]
            res = _END_RES.get(sl) or _resolve_end(sl)
            if res is _CAREFUL:
                m = _CAREFUL_TAG_B.match(big, lt, dend)
                if m is None:
                    ci += 1
                    continue
                nm2 = m.group(2)
                res2 = _resolve_end(nm2)
                # nm2 is a pure name by the regex, never _CAREFUL
                if lt > pos and not drop_depth:
                    if cur is None:
                        cur = ["p", boiler_depth > 0, 1, [(pos, lt, link_depth > 0)]]
                        blocks.append(cur)
                    else:
                        cur[3].append((pos, lt, link_depth > 0))
                pos = m.end()
                _end(res2)
                ci += 1
                continue
            if lt > pos and not drop_depth:
                if cur is None:
                    cur = ["p", boiler_depth > 0, 1, [(pos, lt, link_depth > 0)]]
                    blocks.append(cur)
                else:
                    cur[3].append((pos, lt, link_depth > 0))
            pos = gt + 1
            tag = res
            if stack and stack[-1][0] == tag:
                tt, b, d, blk = stack.pop()
                if d:
                    if drop_depth:
                        drop_depth -= 1
                else:
                    if b and boiler_depth:
                        boiler_depth -= 1
                    if tt == "a" and link_depth:
                        link_depth -= 1
                    if blk:
                        cur = None
            else:
                _end(tag)
            ci += 1
            continue
        # ---- open tag -----------------------------------------------
        sl = big[lt + 1 : gt]
        res = _OPEN_RES.get(sl) or _resolve_open(sl)
        if res is _CAREFUL:
            m = _CAREFUL_TAG_B.match(big, lt, dend)
            if m is None:
                ci += 1
                continue
            name, blob, sc = m.group(2, 3, 4)
            self_close = bool(sc)
            tag_end = m.end()
            tag = name.decode("ascii").lower()
            drop, boiler, block = hx._TAG_INFO.get(tag, hx._NO_INFO)
            boiler, entry = _blob_boiler(tag, drop, boiler, block, blob)
        else:
            tag, drop, boiler, block, entry, self_close = res
            tag_end = gt + 1
        if lt > pos and not drop_depth:
            if cur is None:
                cur = ["p", boiler_depth > 0, 1, [(pos, lt, link_depth > 0)]]
                blocks.append(cur)
            else:
                cur[3].append((pos, lt, link_depth > 0))
        pos = tag_end
        stack.append(entry)
        if drop:
            drop_depth += 1
        else:
            if boiler:
                boiler_depth += 1
            if tag == "a":
                link_depth += 1
            if block:
                if tag == "br":
                    cur = None
                else:
                    cur = [tag, boiler_depth > 0, 1, []]
                    blocks.append(cur)
            elif cur is not None:
                cur[2] += 1
        if self_close:
            _end(tag)
        elif tag == "script" or tag == "style":
            closes = raw_script if tag == "script" else raw_style
            k = bisect_left(closes, pos)
            if k == len(closes) or closes[k] >= dend:
                # unterminated raw text: drop the document tail
                return blocks, bisect_left(cand_pos, dend, ci)
            close = closes[k]
            j = bisect_left(gt_list, close)
            gt2 = gt_list[j] if j < len(gt_list) and gt_list[j] < dend else -1
            _end(tag)
            pos = dend if gt2 < 0 else gt2 + 1
        ci += 1
    # document tail
    if pos < dend and not drop_depth:
        if cur is None:
            cur = ["p", boiler_depth > 0, 1, [(pos, dend, link_depth > 0)]]
            blocks.append(cur)
        else:
            cur[3].append((pos, dend, link_depth > 0))
    return blocks, bisect_left(cand_pos, dend, ci)


def _materialize(big: bytes, raw_blocks: list):
    """Raw block specs → (text, spans) with exactly the scalar keep
    logic (html_extract.strip_boilerplate)."""
    unescape = _html_mod.unescape
    kept: list = []
    for tag, boiler, n_elems, parts in raw_blocks:
        if boiler:
            continue  # cheap flag first, like the scalar path
        link_chars = 0
        texts: list = []
        for s, e, in_link in parts:
            data = big[s:e].decode("utf-8")
            if "&" in data:
                data = unescape(data)
            texts.append(data)
            if in_link:
                link_chars += len(data.strip())
        t = " ".join("".join(texts).split())
        if not t or len(t) < hx.MIN_BLOCK_CHARS:
            continue
        link_density = link_chars / max(len(t), 1)
        text_density = len(t) / max(n_elems, 1)
        if link_density > hx.MAX_LINK_DENSITY or text_density < hx.MIN_TEXT_DENSITY:
            continue
        conf = round(min(0.99, 0.6 + 0.39 * (1.0 - link_density)), 4)
        kept.append((t, tag, conf))
    spans: list = []
    pos = 0
    out: list = []
    for t, kind, conf in kept:
        out.append(t)
        spans.append((pos, pos + len(t), kind, conf))
        pos += len(t) + 1
    return "\n".join(out), spans


def strip_boilerplate_batch(texts: list) -> list:
    """Batch twin of :func:`html_extract.strip_boilerplate`: one
    ``(text, spans)`` per input document, byte-equal to the scalar
    kernel (equivalence-gated per document by
    tests/test_htmlbatch_equiv.py).  ``None`` inputs yield ``("", [])``
    like ``strip_boilerplate("")``."""
    n = len(texts)
    if n == 0:
        return []
    try:
        # inside the guarded region: a batch whose concatenated text
        # exceeds the int32 offset capacity of pa.string() (~2 GB)
        # raises ArrowCapacityError and must fall back, not propagate —
        # the contract is "always byte-equal, falls back on failure"
        arr = pa.array([t if t is not None else "" for t in texts], type=pa.string())
        buf_off, buf_dat = arr.buffers()[1], arr.buffers()[2]
        offs = np.frombuffer(buf_off, dtype=np.int32)
        starts = offs[:-1].astype(np.int64)
        ends = offs[1:].astype(np.int64)
        buf = (
            np.frombuffer(buf_dat, dtype=np.uint8)[: int(ends[-1])]
            if buf_dat is not None
            else np.empty(0, np.uint8)
        )
        cand_pos, cands, gt_list, raw_close, fallback = _tokenize_batch(
            buf, starts, ends
        )
    except Exception:
        # batch-wide buffer build or discovery failed: the scalar
        # kernel is always safe
        return [hx.strip_boilerplate(t or "") for t in texts]
    big = buf.tobytes()
    raw_script = raw_close["script"]
    raw_style = raw_close["style"]
    out: list = []
    ci = 0
    starts_l = starts.tolist()
    ends_l = ends.tolist()
    for d in range(n):
        dstart, dend = starts_l[d], ends_l[d]
        if d in fallback:
            out.append(hx.strip_boilerplate(texts[d] or ""))
            ci = bisect_left(cand_pos, dend, ci)
            continue
        try:
            raw_blocks, ci = _scan_doc(
                big,
                dstart,
                dend,
                ci,
                cand_pos,
                cands,
                gt_list,
                raw_script,
                raw_style,
            )
            out.append(_materialize(big, raw_blocks))
        except Exception:
            out.append(hx.strip_boilerplate(texts[d] or ""))
            ci = bisect_left(cand_pos, dend, ci)
    return out
