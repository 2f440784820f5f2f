"""Property-based invariants (hypothesis) for the pure-Python kernels.

The reference ships no property/randomized testing (SURVEY §5 "Not
present"); these go beyond it: every kernel that feeds an Arrow batch
must be total (never raise) and structurally sound on arbitrary input,
and the optimized implementations must agree with brute-force
definitions on small instances.
"""

from __future__ import annotations

import json
from itertools import permutations

from hypothesis import given, settings, strategies as st

from accelerated_intelligent_document_processing_on_aws_spark.kernel.html_extract import (
    strip_boilerplate,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernel.json_extract import (
    detect_format,
    extract_json,
    extract_structured,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernel.strings import (
    convert_to_list,
    hungarian_compare,
    item_score,
)

MAX_EX = 60


class TestStripBoilerplateTotality:
    @settings(max_examples=MAX_EX, deadline=None)
    @given(st.text(max_size=400))
    def test_never_raises_and_spans_index_output(self, payload):
        text, spans = strip_boilerplate(payload)
        assert isinstance(text, str)
        for s, e, kind, conf in spans:
            assert 0 <= s < e <= len(text)
            assert text[s:e]
            assert 0.0 <= conf <= 1.0

    @settings(max_examples=MAX_EX, deadline=None)
    @given(st.text(alphabet="<>ab c/&;#x\"'=!-", max_size=200))
    def test_tag_soup_never_raises(self, soup):
        text, spans = strip_boilerplate(soup)
        assert isinstance(text, str) and isinstance(spans, list)


class TestJsonLadderTotality:
    @settings(max_examples=MAX_EX, deadline=None)
    @given(st.text(max_size=300))
    def test_extract_json_total_and_valid(self, text):
        parsed, repaired = extract_json(text)
        if parsed is not None:
            json.loads(parsed)  # must round-trip
        assert isinstance(repaired, bool)
        fmt = detect_format(text)
        assert fmt in ("json", "yaml", "unknown")
        js, fmt2 = extract_structured(text)
        if js is not None:
            json.loads(js)

    @settings(max_examples=MAX_EX, deadline=None)
    @given(
        st.dictionaries(
            st.text(st.characters(codec="ascii", exclude_characters='"\\'), min_size=1, max_size=6),
            st.one_of(st.integers(), st.booleans(), st.text(max_size=8), st.none()),
            max_size=4,
        ),
        st.integers(min_value=1, max_value=200),
    )
    def test_truncated_json_repair_is_valid_or_none(self, d, cut):
        full = json.dumps(d)
        frag = full[: max(1, len(full) - cut % max(1, len(full)))]
        parsed, _ = extract_json(frag)
        if parsed is not None:
            got = json.loads(parsed)
            # a repaired object never invents keys
            assert set(got) <= set(str(k) for k in d)


class TestHungarianOptimality:
    @settings(max_examples=MAX_EX, deadline=None)
    @given(
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=2, max_size=4),
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=2, max_size=4),
    )
    def test_matches_bruteforce_assignment(self, expected, actual):
        """JV assignment total score == brute-force max over permutations;
        tp == optimal matching count at the threshold (EXACT items)."""
        tp, fp, avg = hungarian_compare(expected, actual, "EXACT", 0.8)
        n, m = len(expected), len(actual)
        k = min(n, m)
        best = -1.0
        if n <= m:
            for perm in permutations(range(m), n):
                best = max(best, sum(item_score(expected[i], actual[j], "EXACT") for i, j in enumerate(perm)))
        else:
            for perm in permutations(range(n), m):
                best = max(best, sum(item_score(expected[i], actual[j], "EXACT") for j, i in enumerate(perm)))
        # EXACT scores are 0/1, so optimal total == max matching size == tp
        assert tp == int(round(best))
        assert fp == m - tp
        assert avg == (best / k if k else 0.0)


class TestConvertToListRoundTrip:
    @settings(max_examples=MAX_EX, deadline=None)
    @given(st.lists(st.text(st.characters(codec="ascii", exclude_characters="'\\\"[],"), min_size=1, max_size=6), max_size=5))
    def test_list_literal_roundtrip(self, items):
        assert convert_to_list(str(items)) == [str(x) for x in items]

    @settings(max_examples=MAX_EX, deadline=None)
    @given(st.one_of(st.integers(), st.floats(allow_nan=False), st.text(max_size=10)))
    def test_scalar_fallback(self, v):
        out = convert_to_list(v)
        if isinstance(v, str) and v.startswith("[") and v.endswith("]"):
            assert isinstance(out, list)  # may parse or fall back whole
        else:
            assert out == [str(v)]


class _FakeState:
    """Minimal GroupState stand-in for driving _segment_group directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class TestStreamingReorderProperty:
    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=12),
        st.data(),
    )
    def test_any_delivery_order_matches_batch_bio(self, classes, data):
        """Split a conversation's turns into random micro-batches delivered
        in a random order: the reorder buffer must emit exactly the batch
        BIO numbering once everything has arrived."""
        import pandas as pd

        from accelerated_intelligent_document_processing_on_aws_spark.kernel.oracle import (
            sections_oracle,
        )
        from accelerated_intelligent_document_processing_on_aws_spark.streaming.stateful import (
            _segment_group,
        )

        turns = [
            {"conv_id": "c", "turn_idx": i, "classification": cls,
             "boundary": "continue", "confidence": 1.0}
            for i, cls in enumerate(classes)
        ]
        # random partition into batches, then random delivery order
        n_batches = data.draw(st.integers(1, min(4, len(turns))))
        assignment = [data.draw(st.integers(0, n_batches - 1)) for _ in turns]
        batches = [[t for t, b in zip(turns, assignment) if b == i] for i in range(n_batches)]
        order = data.draw(st.permutations(range(n_batches)))

        state = _FakeState()
        emitted = []
        for bi in order:
            rows = batches[bi]
            pdf = pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "classification", "boundary", "confidence"]
            )
            for out in _segment_group(("c",), iter([pdf]), state):
                emitted += list(
                    zip(out["turn_idx"].tolist(), out["section_id"].tolist())
                )
        got = dict(emitted)
        want = {}
        for sec in sections_oracle(turns):
            for ti in sec["turn_idxs"]:
                want[ti] = sec["section_id"]
        assert got == want
        assert len(emitted) == len(turns)  # exactly-once emission


class _TimedOutState(_FakeState):
    hasTimedOut = True

    def setTimeoutDuration(self, ms):
        pass


class TestGapFlush:
    def test_timeout_flushes_across_gap_marked(self):
        """A gapped conversation (turn 2 missing) flushes buffered turns
        on timeout, in order, with gap_flushed=true."""
        import pandas as pd

        from accelerated_intelligent_document_processing_on_aws_spark.streaming.stateful import (
            _make_segment_group,
        )

        fn = _make_segment_group(flush_timeout_ms=1000)
        state = _FakeState()
        state.setTimeoutDuration = lambda ms: None
        pdf = pd.DataFrame(
            [("c", 0, "a", "continue"), ("c", 1, "a", "continue"),
             ("c", 3, "b", "continue"), ("c", 4, "b", "continue")],
            columns=["conv_id", "turn_idx", "classification", "boundary"],
        )
        first = list(fn(("c",), iter([pdf]), state))[0]
        assert first["turn_idx"].tolist() == [0, 1]          # 3,4 wait for 2
        assert not first["gap_flushed"].any()
        assert first["pending_after"].iloc[-1] == 2

        timed = _TimedOutState()
        timed._v = state._v
        flushed = list(fn(("c",), iter([]), timed))[0]
        assert flushed["turn_idx"].tolist() == [3, 4]
        assert flushed["gap_flushed"].all()
        assert flushed["section_id"].tolist() == [2, 2]      # numbering continues
        assert flushed["pending_after"].iloc[-1] == 0


class TestCodecProperties:
    """Round-trip invariants for the pure-numpy codecs."""

    @given(
        st.integers(1, 24), st.integers(1, 24),
        st.sampled_from(["gray", "rgb"]), st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_png_round_trip(self, h, w, mode, seed):
        import numpy as np

        from accelerated_intelligent_document_processing_on_aws_spark.kernel import (
            image as img,
        )

        rng = np.random.RandomState(seed % (2**32))
        shape = (h, w) if mode == "gray" else (h, w, 3)
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert np.array_equal(img.decode_png(img.encode_png(arr)), arr)

    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_pnm_round_trip(self, h, w, seed):
        import numpy as np

        from accelerated_intelligent_document_processing_on_aws_spark.kernel import (
            image as img,
        )

        rng = np.random.RandomState(seed % (2**32))
        g = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        assert np.array_equal(img.decode_ppm(img.encode_pgm(g)), g)
        rgb = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(img.decode_ppm(img.encode_ppm(rgb)), rgb)

    @given(st.integers(1, 2000), st.integers(1, 2), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_wav_round_trip(self, n, channels, seed):
        import numpy as np

        from accelerated_intelligent_document_processing_on_aws_spark.kernel import (
            audio as aud,
        )

        rng = np.random.RandomState(seed % (2**32))
        samples = rng.randint(-32768, 32768, size=(n, channels)).astype(np.int16)
        got, sr = aud.decode_wav(aud.encode_wav_pcm16(samples, 22050))
        assert sr == 22050 and got.shape == (n, channels)
        assert np.allclose(got * 32768.0, samples)

    @given(st.integers(1, 64), st.integers(1, 64), st.integers(1, 64))
    @settings(max_examples=60, deadline=None)
    def test_resize_never_upscales_and_bounds(self, h, w, max_side):
        import numpy as np

        from accelerated_intelligent_document_processing_on_aws_spark.kernel import (
            image as img,
        )

        arr = np.zeros((h, w), np.uint8)
        out = img.resize_max_side(arr, max_side)
        assert max(out.shape) <= max(max_side, min(h, w), 1) or max(out.shape) <= max(h, w)
        assert out.shape[0] <= h and out.shape[1] <= w  # never upscale
        if max(h, w) <= max_side:
            assert out.shape == (h, w)
        else:
            assert max(out.shape) <= max_side


class _MemState:
    """GroupState stand-in for direct stateful-fn property tests."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value

    def setTimeoutDuration(self, ms):
        pass


class TestStreamingSegmentationDeterminism:
    """The reorder buffer's core contract: for a contiguous 0-based
    conversation, ANY partition of the turns into micro-batches in ANY
    batch order yields exactly the batch BIO numbering."""

    @given(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=24),
        st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def test_any_delivery_order_matches_batch_bio(self, classes, data):
        import pandas as pd

        from accelerated_intelligent_document_processing_on_aws_spark.streaming.stateful import (
            _make_segment_group,
        )

        turns = [(i, c, "continue") for i, c in enumerate(classes)]
        # batch-BIO reference numbering
        want, last, sec = {}, None, 0
        for i, c, _ in turns:
            if last is None or c != last:
                sec += 1
            want[i] = sec
            last = c

        # random partition into chunks, delivered in a random order
        n = len(turns)
        n_cuts = data.draw(st.integers(0, max(0, n - 1)))
        cuts = sorted(data.draw(
            st.lists(st.integers(1, max(1, n - 1)), min_size=n_cuts,
                     max_size=n_cuts, unique=True)
        )) if n > 1 else []
        chunks, prev = [], 0
        for cut in cuts + [n]:
            if cut > prev:
                chunks.append(turns[prev:cut])
                prev = cut
        order = data.draw(st.permutations(range(len(chunks))))

        fn = _make_segment_group(None)
        state = _MemState()
        got = {}
        for ci in order:
            chunk = chunks[ci]
            pdf = pd.DataFrame(
                {
                    "conv_id": ["c"] * len(chunk),
                    "turn_idx": [t[0] for t in chunk],
                    "classification": [t[1] for t in chunk],
                    "boundary": [t[2] for t in chunk],
                }
            )
            out = list(fn(("c",), iter([pdf]), state))[0]
            for _, row in out.iterrows():
                assert row["turn_idx"] not in got, "duplicate emission"
                got[row["turn_idx"]] = row["section_id"]
        assert got == want
