"""HTML main-content extraction: DOM parse + density heuristics.

Analog of the reference's OCR text parse (Textract blocks → reading
ordered markdown, ``lib/idp_common_pkg/idp_common/ocr/service.py:1603-1675``)
restated for HTML transcript payloads: parse the DOM with the stdlib
``html.parser``, split into leaf blocks, score each block with
text-density and link-density heuristics (Kohlschuetter-style
boilerplate detection), drop blocks under boilerplate containers
(nav/header/footer/aside, ad/sidebar class hints), and emit the main
content as newline-joined block texts plus per-block spans.

Pure function of the input string — no globals, no locale, no
wall-clock — so Spark partitioning cannot perturb the output.
"""

from __future__ import annotations

import re

# Subtrees dropped entirely (never contribute text).
_DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "iframe", "svg", "head", "title"}
)
# Structural containers that are boilerplate by tag semantics.
_BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside"})
# class/id hints that mark a container as boilerplate.
_BOILERPLATE_HINT = re.compile(
    r"(?:^|[\s_-])(?:ad|ads|advert\w*|banner|sidebar|menu|nav|footer|header|promo|"
    r"cookie|popup|social|share|breadcrumb|related)(?:$|[\s_-])",
    re.IGNORECASE,
)
# Elements that terminate/open a leaf block.
_BLOCK_TAGS = frozenset(
    {
        "article", "section", "div", "p", "li", "ul", "ol", "h1", "h2", "h3",
        "h4", "h5", "h6", "table", "tr", "td", "th", "blockquote", "pre",
        "main", "figure", "figcaption", "br",
    }
)

_WS = re.compile(r"\s+")

# Tuning constants for the keep/drop decision (fixed — part of the
# kernel contract; goldens depend on them).
MAX_LINK_DENSITY = 0.33
MIN_BLOCK_CHARS = 10
MIN_TEXT_DENSITY = 8.0  # chars of text per descendant element


class _Block:
    __slots__ = ("tag", "parts", "link_chars", "n_elems", "boiler")

    def __init__(self, tag: str, boiler: bool) -> None:
        self.tag = tag
        self.parts: list[str] = []
        self.link_chars = 0
        self.n_elems = 1
        self.boiler = boiler

    def text(self) -> str:
        # " ".join(split()) is byte-equivalent to _WS.sub(" ", s).strip()
        # (verified over every codepoint: str.split() and \s agree on
        # the whitespace set) and ~3× faster — this collapse is the
        # single hottest string op on the 100 TB path.
        return " ".join("".join(self.parts).split())


# tag → (drop, boiler, block): ONE dict lookup in the hot handler
# instead of three frozenset probes (tag classes are disjoint).
_TAG_INFO: dict = {}
for _t in _DROP_TAGS:
    _TAG_INFO[_t] = (True, False, False)
for _t in _BOILERPLATE_TAGS:
    _TAG_INFO[_t] = (False, True, False)
for _t in _BLOCK_TAGS:
    _TAG_INFO[_t] = (False, False, True)
_NO_INFO = (False, False, False)


import html as _html_mod

_FAST_TAG = re.compile(
    r"<(?:"
    r"!--.*?-->"                      # comment
    r"|![^>]*>"                       # doctype
    r"|\?[^>]*>"                      # processing instruction
    r"|(/?)([a-zA-Z][a-zA-Z0-9:-]*)"  # 1=end-slash 2=tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)"  # 3=attr blob
    r"(/?)>"                          # 4=self-closing slash
    r")",
    re.DOTALL,
)
_FAST_ATTR = re.compile(r"""(class|id)\s*=\s*(?:"([^"]*)"|'([^']*)'|(\S+))""", re.IGNORECASE)
_RAWTEXT = ("script", "style")
# raw-tag-name memo: name-as-written → (tag, drop, boiler, block, entry)
# where entry is the premade stack tuple (tag, boiler, drop, block) for
# the no-attr-hint case — ONE dict probe per tag event replaces the
# lowercase memo + tag-class lookup + per-tag tuple allocation.
_TAG_META: dict = {}


def _scan_blocks_ref(html: str) -> list[_Block]:
    """Reference tokenizer: single fused regex pass + block builder.

    A position-driven ``search`` loop; inter-match slices are data (an
    unmatched '<' stays inside its data slice — output is
    concatenation-equivalent, and entities never span a '<' so
    per-slice unescape is unaffected).  After a raw-text skip the
    search RESUMES at the character after the closing tag, so a quoted
    attribute inside script content can never swallow tags beyond the
    script's end (the old ``finditer`` + lt<pos-skip form had exactly
    that artifact — a match starting inside the skipped region consumed
    text past it; hypothesis found the divergence).
    This is the SEMANTIC DEFINITION of the scan; :func:`_scan_blocks`
    is the find-dispatch fast twin, gated by an equivalence test
    (tests/test_tokenizer_equiv.py) on fixture + adversarial + random +
    structured-nested inputs.  Block semantics are pinned by the kernel
    snapshot test (tests/test_kernel.py)."""
    blocks: list[_Block] = []
    drop_depth = boiler_depth = link_depth = 0
    cur: _Block | None = None
    stack: list[tuple] = []
    pos = 0
    n = len(html)
    lowered = None  # built at most ONCE, on the first raw-text element
    unescape = _html_mod.unescape
    tag_info = _TAG_INFO.get

    def _end(tag: str) -> None:
        nonlocal drop_depth, boiler_depth, link_depth, cur
        # unwind to the matching open tag (HTML is forgiving)
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

    tm = _TAG_META  # shared raw-name memo (tag vocabulary is tiny)
    search = _FAST_TAG.search
    m = search(html, 0)
    while m:
        lt, mend = m.span()
        if lt > pos and not drop_depth:
            data = html[pos:lt]
            if "&" in data:
                data = unescape(data)
            if data:
                if cur is None:
                    cur = _Block("p", boiler_depth > 0)
                    blocks.append(cur)
                cur.parts.append(data)
                if link_depth:
                    cur.link_chars += len(data.strip())
        pos = mend
        end_slash, name, blob, self_close = m.group(1, 2, 3, 4)
        if name is None:  # comment/doctype/PI
            m = search(html, pos)
            continue
        meta = tm.get(name)
        if meta is None:
            tag = name.lower()
            drop, boiler0, block = tag_info(tag, _NO_INFO)
            meta = (tag, drop, boiler0, block, (tag, boiler0, drop, block))
            if len(tm) < 4096:  # bound the memo on adversarial input
                tm[name] = meta
        if end_slash:
            tag = meta[0]
            # well-nested fast path: the end tag matches the stack top —
            # handle inline (one pop) instead of the unwind-call; ~97%
            # of end tags in real HTML take this branch
            if stack and stack[-1][0] == tag:
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
            else:
                _end(tag)
            m = search(html, pos)
            continue
        tag, drop, boiler, block, entry = meta
        if (
            blob
            and not boiler
            and ("class" in blob or "id" in blob or "ID" in blob or "CLASS" in blob)
        ):
            attr_text = " ".join(
                (am.group(2) or am.group(3) or am.group(4) or "")
                for am in _FAST_ATTR.finditer(blob)
            )
            if attr_text and _BOILERPLATE_HINT.search(attr_text):
                boiler = True
                entry = (tag, True, drop, block)
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
                    cur = _Block(tag, boiler_depth > 0)
                    blocks.append(cur)
            elif cur is not None:
                cur.n_elems += 1
        if self_close:
            _end(tag)
        elif tag in _RAWTEXT:
            # raw-text elements: skip to the closing tag verbatim
            if lowered is None:
                lowered = html.lower()
            close = lowered.find(f"</{tag}", pos)
            if close < 0:
                return blocks  # unterminated raw-text: drop the tail
            gt = html.find(">", close)
            _end(tag)
            pos = n if gt < 0 else gt + 1
        m = search(html, pos)
    if pos < n and not drop_depth:
        data = html[pos:]
        if "&" in data:
            data = unescape(data)
        if data:
            if cur is None:
                cur = _Block("p", boiler_depth > 0)
                blocks.append(cur)
            cur.parts.append(data)
            if link_depth:
                cur.link_chars += len(data.strip())
    return blocks


# Anchored helpers for the find-dispatch tokenizer: the tag alternative
# of _FAST_TAG (for slow paths) and the comment/doctype/PI alternatives.
_CAREFUL_TAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)"
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)"
    r"(/?)>",
    re.DOTALL,
)
_MISC_TAG = re.compile(r"<(?:!--.*?-->|![^>]*>|\?[^>]*>)", re.DOTALL)
_PURE_NAME = re.compile(r"[a-zA-Z][a-zA-Z0-9:-]*\Z")
_NAME_PREFIX = re.compile(r"[a-zA-Z][a-zA-Z0-9:-]*")
# full-slice open-tag memo: '<'+slice+'>' → the COMPLETE open decision
# (tag, drop, boiler-with-attr-hint, block, stack entry, self_close).
# Real corpora repeat a small set of templated tags (class attrs
# included), so repeated opens collapse to one dict probe — the attr
# regex and boilerplate-hint search run once per distinct tag string.
_OPEN_MEMO: dict = {}


def _scan_blocks(html: str) -> list[_Block]:
    """Find-dispatch tokenizer: byte-equivalent fast twin of
    :func:`_scan_blocks_ref`.

    ``str.find('<')`` locates each candidate token and one character
    dispatches it; the common cases — ``</name>`` end tags and
    ``<name>`` / ``<name attrs>`` opens without quoted attributes —
    run on C-level ``find``/slice/dict-get with ZERO regex match
    objects.  Quoted-attribute opens, end tags with junk, comments,
    doctypes and PIs fall back to anchored regexes with exactly the
    reference grammar (a quoted '>' extends the tag; an unterminated
    quote or missing '>' voids it, leaving '<' as data).  Equivalence
    with the reference tokenizer is CI-gated over the fixture corpus,
    adversarial cases, and random tag soup
    (tests/test_tokenizer_equiv.py)."""
    blocks: list[_Block] = []
    drop_depth = boiler_depth = link_depth = 0
    cur: _Block | None = None
    stack: list[tuple] = []
    pos = 0
    scan = 0
    n = len(html)
    lowered = None
    unescape = _html_mod.unescape
    tag_info = _TAG_INFO.get
    find = html.find

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

    tm = _TAG_META
    while True:
        lt = find("<", scan)
        if lt < 0:
            break
        nc = html[lt + 1 : lt + 2]
        if nc == "/":
            # ---- end tag ------------------------------------------------
            gt = find(">", lt + 2)
            if gt < 0:
                scan = lt + 1
                continue
            nm = html[lt + 2 : gt]
            meta = tm.get(nm)
            if meta is None:
                if _PURE_NAME.match(nm):
                    tag = nm.lower()
                    drop, boiler, block = tag_info(tag, _NO_INFO)
                    meta = (tag, drop, boiler, block, (tag, boiler, drop, block))
                    if len(tm) < 4096:
                        tm[nm] = meta
                else:
                    # junk / quoted end tag: full grammar decides (a
                    # quoted '>' extends it; unterminated → not a tag)
                    m = _CAREFUL_TAG.match(html, lt)
                    if m is None:
                        scan = lt + 1
                        continue
                    nm2 = m.group(2)
                    meta2 = tm.get(nm2)
                    if meta2 is None:
                        tag = nm2.lower()
                        drop, boiler, block = tag_info(tag, _NO_INFO)
                        meta2 = (tag, drop, boiler, block, (tag, boiler, drop, block))
                        if len(tm) < 4096:
                            tm[nm2] = meta2
                    if lt > pos and not drop_depth:
                        data = html[pos:lt]
                        if "&" in data:
                            data = unescape(data)
                        if data:
                            if cur is None:
                                cur = _Block("p", boiler_depth > 0)
                                blocks.append(cur)
                            cur.parts.append(data)
                            if link_depth:
                                cur.link_chars += len(data.strip())
                    pos = scan = m.end()
                    _end(meta2[0])
                    continue
            if lt > pos and not drop_depth:
                data = html[pos:lt]
                if "&" in data:
                    data = unescape(data)
                if data:
                    if cur is None:
                        cur = _Block("p", boiler_depth > 0)
                        blocks.append(cur)
                    cur.parts.append(data)
                    if link_depth:
                        cur.link_chars += len(data.strip())
            pos = scan = gt + 1
            tag = meta[0]
            if stack and stack[-1][0] == tag:
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
            else:
                _end(tag)
            continue
        if ("a" <= nc <= "z") or ("A" <= nc <= "Z"):
            # ---- open tag -----------------------------------------------
            gt = find(">", lt + 1)
            if gt < 0:
                scan = lt + 1
                continue
            sl = html[lt + 1 : gt]
            om = _OPEN_MEMO.get(sl)
            if om is None:
                tag_end = gt + 1
                memoizable = True
                if '"' in sl or "'" in sl:
                    # balanced same-kind quotes cannot hide a '>' (sl has
                    # none) nor dangle open, so the slice IS the tag
                    if "'" not in sl and sl.count('"') % 2 == 0:
                        pass
                    elif '"' not in sl and sl.count("'") % 2 == 0:
                        pass
                    else:
                        # mixed/odd quotes: full grammar decides (a quoted
                        # '>' extends the tag; unterminated quote voids it)
                        m = _CAREFUL_TAG.match(html, lt)
                        if m is None:
                            scan = lt + 1
                            continue
                        memoizable = False
                        name, blob, sc = m.group(2, 3, 4)
                        self_close = bool(sc)
                        tag_end = m.end()
                if memoizable:
                    m2 = _NAME_PREFIX.match(sl)  # sl[0] is alpha: matches
                    name = m2.group()
                    rest = sl[m2.end() :]
                    if rest.endswith("/"):
                        self_close = True
                        blob = rest[:-1]
                    else:
                        self_close = False
                        blob = rest
                meta = tm.get(name)
                if meta is None:
                    tag = name.lower()
                    drop, boiler, block = tag_info(tag, _NO_INFO)
                    meta = (tag, drop, boiler, block, (tag, boiler, drop, block))
                    if len(tm) < 4096:
                        tm[name] = meta
                tag, drop, boiler, block, entry = meta
                if (
                    blob
                    and not boiler
                    and (
                        "class" in blob
                        or "id" in blob
                        or "ID" in blob
                        or "CLASS" in blob
                    )
                ):
                    attr_text = " ".join(
                        (am.group(2) or am.group(3) or am.group(4) or "")
                        for am in _FAST_ATTR.finditer(blob)
                    )
                    if attr_text and _BOILERPLATE_HINT.search(attr_text):
                        boiler = True
                        entry = (tag, True, drop, block)
                if memoizable and len(_OPEN_MEMO) < 4096:
                    _OPEN_MEMO[sl] = (tag, drop, boiler, block, entry, self_close)
            else:
                tag, drop, boiler, block, entry, self_close = om
                tag_end = gt + 1
            if lt > pos and not drop_depth:
                data = html[pos:lt]
                if "&" in data:
                    data = unescape(data)
                if data:
                    if cur is None:
                        cur = _Block("p", boiler_depth > 0)
                        blocks.append(cur)
                    cur.parts.append(data)
                    if link_depth:
                        cur.link_chars += len(data.strip())
            pos = scan = tag_end
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
                        cur = _Block(tag, boiler_depth > 0)
                        blocks.append(cur)
                elif cur is not None:
                    cur.n_elems += 1
            if self_close:
                _end(tag)
            elif tag in _RAWTEXT:
                if lowered is None:
                    lowered = html.lower()
                close = lowered.find(f"</{tag}", pos)
                if close < 0:
                    return blocks  # unterminated raw-text: drop the tail
                gt2 = find(">", close)
                _end(tag)
                pos = scan = n if gt2 < 0 else gt2 + 1
            continue
        if nc == "!" or nc == "?":
            # ---- comment / doctype / PI ---------------------------------
            m = _MISC_TAG.match(html, lt)
            if m is None:
                scan = lt + 1
                continue
            if lt > pos and not drop_depth:
                data = html[pos:lt]
                if "&" in data:
                    data = unescape(data)
                if data:
                    if cur is None:
                        cur = _Block("p", boiler_depth > 0)
                        blocks.append(cur)
                    cur.parts.append(data)
                    if link_depth:
                        cur.link_chars += len(data.strip())
            pos = scan = m.end()
            continue
        scan = lt + 1  # '<' followed by junk: stays in the data run
    if pos < n and not drop_depth:
        data = html[pos:]
        if "&" in data:
            data = unescape(data)
        if data:
            if cur is None:
                cur = _Block("p", boiler_depth > 0)
                blocks.append(cur)
            cur.parts.append(data)
            if link_depth:
                cur.link_chars += len(data.strip())
    return blocks


def strip_boilerplate(html: str) -> tuple[str, list[tuple[int, int, str, float]]]:
    """Extract main content from an HTML payload.

    Returns ``(text, spans)`` where ``spans`` is a list of
    ``(start, end, kind, conf)`` character spans into ``text`` — one per
    kept block, ``kind`` = the block's tag, ``conf`` derived from link
    density (cleaner blocks score higher).
    """
    try:
        blocks = _scan_blocks(html)
    except Exception:
        # Malformed HTML: fall back to tag-stripped text, mirroring the
        # reference's parse fallback chain (ocr/service.py:1649-1673).
        plain = _WS.sub(" ", re.sub(r"<[^>]+>", " ", html)).strip()
        return plain, ([(0, len(plain), "fallback", 0.5)] if plain else [])

    kept: list[tuple[str, str, float]] = []  # (text, kind, conf)
    for b in blocks:
        if b.boiler:  # cheap flag first: skip the whitespace-collapse
            continue  # regex on blocks that can never be kept
        t = b.text()
        if not t or len(t) < MIN_BLOCK_CHARS:
            continue
        link_density = b.link_chars / max(len(t), 1)
        text_density = len(t) / max(b.n_elems, 1)
        if link_density > MAX_LINK_DENSITY or text_density < MIN_TEXT_DENSITY:
            continue
        conf = round(min(0.99, 0.6 + 0.39 * (1.0 - link_density)), 4)
        kept.append((t, b.tag, conf))

    spans: list[tuple[int, int, str, float]] = []
    pos = 0
    out: list[str] = []
    for t, kind, conf in kept:
        out.append(t)
        spans.append((pos, pos + len(t), kind, conf))
        pos += len(t) + 1  # newline separator
    return "\n".join(out), spans
