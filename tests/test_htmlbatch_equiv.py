"""Equivalence gate: the batch-vectorized HTML scanner
(kernel/htmlscan_batch.strip_boilerplate_batch) must produce
byte-identical (text, spans) to the scalar kernel
(html_extract.strip_boilerplate) on every input class — fixture
corpus, adversarial tag soup, random strings, suspect-codepoint
fallbacks — AND regardless of how documents are batched together
(the candidate cursor threads one shared buffer across documents).

The module is kept as a measured prototype: it is byte-equal but only
~1.0x the scalar find-dispatch kernel (see NOTES.md round-6 analysis),
so the scalar path remains the production kernel.  This gate keeps the
prototype honest for future revisits.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from accelerated_intelligent_document_processing_on_aws_spark.fixtures.transcripts import (
    generate_transcripts,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernel.html_extract import (
    strip_boilerplate,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernel.htmlscan_batch import (
    strip_boilerplate_batch,
)
from tests.test_tokenizer_equiv import ADVERSARIAL


def assert_batch_equiv(texts: list) -> None:
    ref = [strip_boilerplate(t if t is not None else "") for t in texts]
    bat = strip_boilerplate_batch(texts)
    assert len(ref) == len(bat)
    for i, (a, b) in enumerate(zip(ref, bat)):
        assert a == b, (i, (texts[i] or "")[:300])


SUSPECT = [
    "<p>İstanbul content paragraph with the dotted capital I</p>",
    "<p>Kelvin sign lowers into ascii k</p>",
    "<script>İ</script><p>after suspect raw text</p>",
    "plain İ text",
]

CROSS_DOC = [
    "<p>ends with lt <",          # trailing '<' whose next byte is doc 2
    "<div class=\"open quote",     # unterminated quoted tag at doc end
    "<script>never closed",        # unterminated raw text: tail dropped
    "<p>normal doc after weird neighbours</p>",
    "",
    None,
    "<!-- unterminated comment",
    "<p>final doc must still parse cleanly</p>",
]


class TestBatchEquivalence:
    def test_adversarial_one_batch(self):
        assert_batch_equiv(list(ADVERSARIAL))

    def test_adversarial_singletons(self):
        for payload in ADVERSARIAL:
            assert_batch_equiv([payload])

    def test_fixture_corpus(self):
        rows = generate_transcripts(n_convs=120, seed=47)
        assert_batch_equiv([r["text"] for r in rows])

    def test_suspect_codepoint_fallback(self):
        # mixed batch: fallback docs interleaved with fast-path docs;
        # the cursor must stay aligned across the skipped documents
        batch = []
        for s in SUSPECT:
            batch.append(s)
            batch.append("<div><p>plain neighbour paragraph body</p></div>")
        assert_batch_equiv(batch)

    def test_cross_document_isolation(self):
        assert_batch_equiv(list(CROSS_DOC))
        assert_batch_equiv(list(reversed(CROSS_DOC)))

    def test_empty_and_none(self):
        assert_batch_equiv([])
        assert_batch_equiv(["", None, "", None])


class TestRandomBatchEquivalence:
    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="<>ab c/&;#x\"'=!-?p", max_size=200),
            max_size=8,
        )
    )
    def test_tag_soup_batches(self, batch):
        assert_batch_equiv(batch)

    @settings(max_examples=75, deadline=None)
    @given(st.lists(st.text(max_size=200), max_size=6))
    def test_arbitrary_text_batches(self, batch):
        assert_batch_equiv(batch)
