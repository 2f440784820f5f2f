"""Equivalence gate: the find-dispatch HTML tokenizer must produce
byte-identical blocks to the reference regex tokenizer on every input
class — fixture corpus, adversarial tag soup, and random strings.
`_scan_blocks_ref` is the semantic definition; `_scan_blocks` is the
hot-path twin the Spark kernel actually runs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from accelerated_intelligent_document_processing_on_aws_spark.fixtures.transcripts import (
    generate_transcripts,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernel.html_extract import (
    _scan_blocks,
    _scan_blocks_ref,
)


def _digest(blocks):
    return [
        (b.tag, b.text(), b.link_chars, b.n_elems, b.boiler) for b in blocks
    ]


def assert_equiv(payload: str) -> None:
    assert _digest(_scan_blocks(payload)) == _digest(_scan_blocks_ref(payload)), (
        payload[:300]
    )


ADVERSARIAL = [
    "",
    "plain text no tags",
    "<p>hello</p>",
    "<div class=\"x > y\">quoted gt extends the tag</div>",
    "<div class=\"unterminated quote voids the tag",
    "<div class='single > quoted'>x</div>",
    "<p>a & b &amp; c</p>",
    "<a href=x>link text</a> tail",
    "<A HREF=X>upper link</A>",
    "<!-- comment with > inside -->after",
    "<!-- unterminated comment with a later > char",
    "<!-- never closed at all",
    "<!DOCTYPE html><p>x</p>",
    "<?php echo '>' ?><p>x</p>",
    "<p>before<<div>double lt</div>",
    "< notatag>still data</p>",
    "<a=b>name stops at equals</a=b>",
    "</div junk blob>after junk end",
    "</div/>self-closing end tag",
    "</>empty end",
    "<br>line<br/>another",
    "<div/>self closed block",
    "<script>var x = '<p>not a tag</p>';</script><p>real</p>",
    "<script src='x'>unterminated raw text <p>dropped",
    "<style>p { color: red; }</style><p>kept</p>",
    "<scriptxyz>not script</scriptxyz>",
    "<p>ends with lt <",
    "<p>ends with tag start <di",
    "<nav><a href=x>menu</a></nav><p>main content here ok</p>",
    "<div id=sidebar>boiler</div><p>content paragraph here</p>",
    "<div CLASS=ad>caps attr</div>",
    "<td colspan=2>unquoted attr</td>",
    "<a <b>lt inside blob</a>",
    "<p title=\"a<b\">lt inside quotes</p>",
    "<ul><li>one<li>two<li>three</ul>",
    "<p>unclosed everywhere<div>nested<span>deep",
    "é<é>unicode tag name is not a tag",
    "<p>&#60;escaped lt&#62;</p>",
]


class TestAdversarialEquivalence:
    def test_handcrafted_cases(self):
        for payload in ADVERSARIAL:
            assert_equiv(payload)

    def test_fixture_corpus(self):
        rows = generate_transcripts(n_convs=300, seed=31)
        for r in rows:
            assert_equiv(r["text"])


class TestRandomEquivalence:
    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="<>ab c/&;#x\"'=!-?p", max_size=300))
    def test_tag_soup(self, soup):
        assert_equiv(soup)

    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=300))
    def test_arbitrary_text(self, payload):
        assert_equiv(payload)


# Structured generator: realistic nested HTML with randomized tag names,
# attribute quoting styles, entities, comments, and broken closings —
# the distribution the fast paths actually dispatch on.
_TAGS = ["div", "p", "span", "a", "li", "ul", "nav", "script", "b", "DIV", "P"]
_ATTRS = [
    "",
    " class=msg",
    ' class="msg user"',
    " class='sidebar ad'",
    ' id="main"',
    " href=x",
    ' data-x="1" class="content"',
    " class",  # valueless
    ' class="a>b"',  # quoted '>'
    ' class="unterminated',  # void tag
]
_texts = st.sampled_from(
    ["hello world", "a &amp; b", "x &#60; y", "", "  ", "multi\nline text here"]
)


@st.composite
def _html_doc(draw, depth=0):
    n = draw(st.integers(0, 4 if depth < 3 else 0))
    parts = [draw(_texts)]
    for _ in range(n):
        tag = draw(st.sampled_from(_TAGS))
        attr = draw(st.sampled_from(_ATTRS))
        style = draw(st.integers(0, 4))
        inner = draw(_html_doc(depth + 1))
        if style == 0:
            parts.append(f"<{tag}{attr}>{inner}</{tag}>")
        elif style == 1:
            parts.append(f"<{tag}{attr}>{inner}")  # never closed
        elif style == 2:
            parts.append(f"<{tag}{attr}/>{inner}")  # self-closed
        elif style == 3:
            parts.append(f"<{tag}{attr}>{inner}</{tag} junk>")  # junk end
        else:
            parts.append(f"<!-- c -->{inner}<br>")
        parts.append(draw(_texts))
    return "".join(parts)


class TestStructuredEquivalence:
    @settings(max_examples=150, deadline=None)
    @given(_html_doc())
    def test_structured_nested_html(self, doc):
        assert_equiv(doc)


import pytest

from accelerated_intelligent_document_processing_on_aws_spark.kernel import (
    html_extract as _hx,
)


@pytest.fixture(autouse=False)
def _fresh_memos():
    """Snapshot/restore the module-global tag memos so a test that
    deliberately overflows them doesn't leave later tests (and their
    timings) running with a junk-saturated memo."""
    tm, om = dict(_hx._TAG_META), dict(_hx._OPEN_MEMO)
    try:
        yield
    finally:
        _hx._TAG_META.clear()
        _hx._TAG_META.update(tm)
        _hx._OPEN_MEMO.clear()
        _hx._OPEN_MEMO.update(om)


class TestMemoOverflow:
    @pytest.mark.usefixtures("_fresh_memos")
    def test_beyond_memo_bound_stays_equivalent(self):
        """Adversarial input with >4096 distinct tag names: both
        tokenizers stop memoizing at the bound and must stay
        byte-equivalent on the unmemoized tail (different memo
        *contents* across the two implementations must never leak into
        output)."""
        parts = []
        for i in range(5000):
            parts.append(f"<t{i} class=msg>word {i} here</t{i}>")
        doc = "<div>" + "".join(parts) + "</div>"
        assert_equiv(doc)

    @pytest.mark.usefixtures("_fresh_memos")
    def test_repeated_after_overflow(self):
        # tags seen AFTER the memo is full take the slow path every
        # time — same output required
        doc = "".join(f"<z{i}>x</z{i}>" for i in range(4200))
        doc += "<p>tail paragraph with enough text to keep</p>" * 3
        assert_equiv(doc)
