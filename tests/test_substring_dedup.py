"""Planted-fixture tests for the round-7 late operators: exact-substring
span removal (Lee et al. analog), asymmetric containment, and unigram
self-perplexity.

The registry queries carry the DuckDB oracle gate at three scale
factors; these tests pin the SEMANTICS on constructed corpora where
the right answer is known by hand — span boundaries, both-copy
removal, threshold edges, quote asymmetry, rarity ordering.
"""

from __future__ import annotations

import pytest

from accelerated_intelligent_document_processing_on_aws_spark.operators import (
    dedup,
    textstats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# a 14-token passage duplicated verbatim across two documents
PASSAGE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"
UNIQ_A = "red orange yellow green blue indigo violet crimson amber teal"
UNIQ_B = "one two three four five six seven eight nine ten eleven twelve"


class TestRemoveDuplicatedSpans:
    def test_planted_passage_removed_from_both_copies(self, spark):
        rows = [
            (1, UNIQ_A + " " + PASSAGE),
            (2, PASSAGE + " " + UNIQ_B),
            (3, "standalone words without any duplication footprint here"),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicated_spans(
                _docs(spark, rows), gram_n=5, min_span_tokens=10
            ).collect()
        }
        # the duplicated passage is cut from BOTH documents (all
        # occurrences go — the conservative curation default)
        assert out[1]["cleaned_text"] == UNIQ_A
        assert out[2]["cleaned_text"] == UNIQ_B
        assert out[1]["n_removed"] == 14
        assert out[2]["n_removed"] == 14
        assert out[3]["n_removed"] == 0
        assert (
            out[3]["cleaned_text"]
            == "standalone words without any duplication footprint here"
        )

    def test_short_duplicate_below_min_span_survives(self, spark):
        # a 6-token duplicate: grams mark it, but the merged span
        # (6 tokens) is below min_span_tokens=10 → kept
        short = "pq rs tu vw xy zz"
        rows = [
            (1, UNIQ_A + " " + short),
            (2, short + " " + UNIQ_B),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicated_spans(
                _docs(spark, rows), gram_n=5, min_span_tokens=10
            ).collect()
        }
        assert out[1]["n_removed"] == 0
        assert out[2]["n_removed"] == 0

    def test_span_boundaries_exact(self, spark):
        # duplicate sits mid-document; neighbors on both sides survive
        rows = [
            (1, "aa bb " + PASSAGE + " cc dd"),
            (2, "ee ff " + PASSAGE + " gg hh"),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicated_spans(
                _docs(spark, rows), gram_n=5, min_span_tokens=10
            ).collect()
        }
        assert out[1]["cleaned_text"] == "aa bb cc dd"
        assert out[2]["cleaned_text"] == "ee ff gg hh"

    def test_whole_doc_removed_and_empty_doc(self, spark):
        rows = [
            (1, PASSAGE),
            (2, PASSAGE),
            (3, ""),
            (4, "   "),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicated_spans(
                _docs(spark, rows), gram_n=5, min_span_tokens=10
            ).collect()
        }
        assert out[1]["cleaned_text"] == ""
        assert out[1]["n_removed"] == out[1]["n_tokens"] == 14
        assert out[3]["n_tokens"] == 0 and out[3]["cleaned_text"] == ""
        assert out[4]["n_tokens"] == 0 and out[4]["n_removed"] == 0

    def test_keep_first_retains_one_copy(self, spark):
        # keep_first: the globally first occurrence (min doc_id, pos)
        # of the duplicated passage survives; the later copy is cut
        rows = [
            (1, UNIQ_A + " " + PASSAGE),
            (2, PASSAGE + " " + UNIQ_B),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicated_spans(
                _docs(spark, rows), gram_n=5, min_span_tokens=10,
                keep_first=True,
            ).collect()
        }
        # doc 1 holds the first occurrence of every passage gram
        # (doc_id 1 < 2) → untouched; doc 2 loses the passage
        assert out[1]["n_removed"] == 0
        assert out[1]["cleaned_text"] == UNIQ_A + " " + PASSAGE
        assert out[2]["n_removed"] == 14
        assert out[2]["cleaned_text"] == UNIQ_B

    def test_keep_first_within_doc_repeats(self, spark):
        # the same passage twice inside ONE doc: first copy survives,
        # second is cut (order by pos within the doc)
        rows = [(1, PASSAGE + " " + UNIQ_A + " " + PASSAGE)]
        out = dedup.remove_duplicated_spans(
            _docs(spark, rows), gram_n=5, min_span_tokens=10,
            keep_first=True,
        ).collect()[0]
        assert out["n_removed"] == 14
        assert out["cleaned_text"] == PASSAGE + " " + UNIQ_A

    def test_overlapping_duplicates_merge_into_one_span(self, spark):
        # two overlapping duplicated windows merge (gaps-and-islands):
        # doc 1 shares its first 12 tokens with doc 2 and its last 12
        # with doc 3; the union covers all 14 tokens of doc 1.
        toks = PASSAGE.split()
        rows = [
            (1, PASSAGE),
            (2, " ".join(toks[:12]) + " " + UNIQ_B),
            (3, UNIQ_A + " " + " ".join(toks[2:])),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicated_spans(
                _docs(spark, rows), gram_n=5, min_span_tokens=10
            ).collect()
        }
        assert out[1]["n_removed"] == 14
        assert out[1]["cleaned_text"] == ""


class TestContainmentPairs:
    def test_quote_inclusion_asymmetry(self, spark):
        # doc 2 is doc 1 quoted inside a longer document: containment
        # of 1-in-2 is 1.0 while Jaccard is well below it
        quote = "the quick brown fox jumps over the lazy dog tonight"
        rows = [
            (1, quote),
            (2, UNIQ_A + " " + quote + " " + UNIQ_B),
            (3, "entirely disjoint vocabulary occupies this third document"),
        ]
        df = _docs(spark, rows).selectExpr("doc_id", "text", "'s' AS blk")
        out = {
            (r["id_a"], r["id_b"]): r
            for r in dedup.containment_pairs(df, "blk", n=2).collect()
        }
        pair = out[(1, 2)]
        assert pair["cont_a_in_b"] == pytest.approx(1.0)
        assert pair["cont_b_in_a"] < 0.5
        assert pair["containment"] == pytest.approx(1.0)
        assert out[(1, 3)]["containment"] == 0.0

    def test_threshold_filters(self, spark):
        rows = [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")]
        df = _docs(spark, rows).selectExpr("doc_id", "text", "'s' AS blk")
        got = dedup.containment_pairs(df, "blk", n=2, threshold=0.9).collect()
        assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}


class TestUnigramLogppl:
    def test_rare_tokens_score_higher(self, spark):
        # doc 1 repeats one token (max likelihood), doc 2 is all
        # singletons (max rarity) → strictly higher score
        rows = [
            (1, "common common common common"),
            (2, "emerald zephyr quixotic labyrinth"),
        ]
        out = {
            r["doc_id"]: r
            for r in textstats.unigram_logppl(_docs(spark, rows)).collect()
        }
        assert out[2]["logppl"] > out[1]["logppl"]
        # all-singleton doc: every cnt=1, so score = ln(N) exactly
        import math

        n_total = 8
        assert out[2]["logppl"] == pytest.approx(math.log(n_total), abs=1e-5)

    def test_tokenless_docs_emit_no_row(self, spark):
        rows = [(1, "some words here"), (2, ""), (3, "   ")]
        got = textstats.unigram_logppl(_docs(spark, rows)).collect()
        assert {r["doc_id"] for r in got} == {1}


class TestBigramLogppl:
    def test_order_sensitivity(self, spark):
        # both docs use the same tokens with the same unigram counts;
        # doc 2 scrambles the ORDER → its bigrams are rarer → higher
        # bigram perplexity while unigram logppl ties exactly
        common = "a b c d " * 5
        rows = [
            (1, common + "a b c d"),
            (2, common + "d c b a"),
        ]
        uni = {
            r["doc_id"]: r["logppl"]
            for r in textstats.unigram_logppl(_docs(spark, rows)).collect()
        }
        bi = {
            r["doc_id"]: r["logppl2"]
            for r in textstats.bigram_logppl(_docs(spark, rows)).collect()
        }
        assert uni[1] == uni[2]
        assert bi[2] > bi[1]

    def test_single_token_docs_emit_no_row(self, spark):
        rows = [(1, "two words"), (2, "one"), (3, "")]
        got = textstats.bigram_logppl(_docs(spark, rows)).collect()
        assert {r["doc_id"] for r in got} == {1}

    def test_deterministic_text_scores_zero(self, spark):
        # a corpus where every prefix has exactly one continuation:
        # every conditional is 1 → logppl2 = 0
        rows = [(1, "p q r s"), (2, "p q r s")]
        got = textstats.bigram_logppl(_docs(spark, rows)).collect()
        assert all(r["logppl2"] == 0.0 for r in got)


# ---------------------------------------------------------------------------
# property: Spark operator ≡ a 30-line pure-Python reference
# ---------------------------------------------------------------------------

def _ref_remove_spans(texts, gram_n=5, min_span=10, keep_first=False):
    """Pure-Python reference of remove_duplicated_spans (same
    tokenization: lower, whitespace split)."""
    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    occ = {}
    for i in sorted(toks):
        t = toks[i]
        for p in range(len(t) - gram_n + 1):
            occ.setdefault(tuple(t[p:p + gram_n]), []).append((i, p + 1))
    marked = {i: set() for i in toks}
    for g, positions in occ.items():
        if len(positions) < 2:
            continue
        for rank, (i, p) in enumerate(sorted(positions)):
            if keep_first and rank == 0:
                continue
            marked[i].add(p)
    out = {}
    for i, t in toks.items():
        spans, run = [], []
        for p in sorted(marked[i]):
            if run and p - run[-1] > gram_n:
                spans.append(run)
                run = []
            run.append(p)
        if run:
            spans.append(run)
        cut = set()
        for run in spans:
            s, e = run[0], run[-1] + gram_n - 1
            if e - s + 1 >= min_span:
                cut.update(range(s, e + 1))
        kept = [tok for j, tok in enumerate(t, start=1) if j not in cut]
        out[i] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


class TestSubstringProperty:
    @pytest.mark.parametrize("keep_first", [False, True])
    def test_equivalence_random_corpora(self, spark, keep_first):
        import random

        rng = random.Random(1234)
        vocab = [f"w{j}" for j in range(12)]  # tiny vocab → heavy dups
        for trial in range(3):
            texts = [
                " ".join(rng.choices(vocab, k=rng.randint(0, 30)))
                for _ in range(40)
            ]
            want = _ref_remove_spans(texts, keep_first=keep_first)
            rows = [(i, t) for i, t in enumerate(texts)]
            got = {
                r["doc_id"]: (
                    r["n_tokens"], r["n_removed"], r["cleaned_text"]
                )
                for r in dedup.remove_duplicated_spans(
                    _docs(spark, rows), gram_n=5, min_span_tokens=10,
                    keep_first=keep_first,
                ).collect()
            }
            assert got == want, f"trial {trial} keep_first={keep_first}"
