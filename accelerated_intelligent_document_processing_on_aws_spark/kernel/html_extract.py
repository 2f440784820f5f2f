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
_LC_TAG: dict = {}


def _scan_blocks(html: str) -> list[_Block]:
    """Single fused pass: regex tokenizer + block builder.

    One ``finditer`` loop; inter-match slices are data (an unmatched '<'
    stays inside its data slice — output is concatenation-equivalent,
    and entities never span a '<' so per-slice unescape is unaffected).
    Tokenizer and handler were separate (callback per tag event) through
    round 2; fusing them into local-variable state removes two Python
    calls per tag on the 100 TB hot path.  Block semantics are pinned by
    the kernel snapshot test (tests/test_kernel.py)."""
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
            t, b, d = stack.pop()
            if d:
                if drop_depth:
                    drop_depth -= 1
            else:
                if b and boiler_depth:
                    boiler_depth -= 1
                if t == "a" and link_depth:
                    link_depth -= 1
                if t in _BLOCK_TAGS:
                    cur = None
            if t == tag:
                break

    lc = _LC_TAG  # shared lowercase-tag memo (tag vocabulary is tiny)
    for m in _FAST_TAG.finditer(html):
        lt, mend = m.span()
        if lt < pos:
            continue  # tag text inside a raw-text element already skipped
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
            continue
        tag = lc.get(name)
        if tag is None:
            tag = name.lower()
            if len(lc) < 4096:  # bound the memo on adversarial input
                lc[name] = tag
        if end_slash:
            # well-nested fast path: the end tag matches the stack top —
            # handle inline (one pop) instead of the unwind-call; ~97%
            # of end tags in real HTML take this branch
            if stack and stack[-1][0] == tag:
                t, b, d = stack.pop()
                if d:
                    if drop_depth:
                        drop_depth -= 1
                else:
                    if b and boiler_depth:
                        boiler_depth -= 1
                    if t == "a" and link_depth:
                        link_depth -= 1
                    if t in _BLOCK_TAGS:
                        cur = None
            else:
                _end(tag)
            continue
        drop, boiler, block = tag_info(tag, _NO_INFO)
        if (
            blob
            and not boiler
            and ("class" in blob or "id" in blob or "ID" in blob or "CLASS" in blob)
        ):
            attr_text = " ".join(
                (am.group(2) or am.group(3) or am.group(4) or "")
                for am in _FAST_ATTR.finditer(blob)
            )
            if attr_text:
                boiler = bool(_BOILERPLATE_HINT.search(attr_text))
        stack.append((tag, boiler, drop))
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
