"""Short-doc parity for ``dedup_keep_representative_docs``.

Round-6 ADVICE found a latent oracle divergence: the Spark shingle
kernel (``operators/dedup.py:shingles``) emits a whole-text singleton
shingle for a doc with fewer than ``n`` tokens (and ``[""]`` for a
token-less doc), while the original oracle SQL's
``generate_series(1, len-1)`` produced an EMPTY shingle set — so two
identical <2-token docs paired in Spark (Jaccard 1.0) but never in the
oracle.  Spark also rounds Jaccard to 6dp before thresholding; the
oracle thresholded unrounded.  The oracle now mirrors both (short-doc
CASE fallback + ROUND(..., 6)); this file pins the fix by running the
REGISTERED query against its REGISTERED oracle on a corpus made of
exactly the divergent shapes: zero-token duplicates, one-token
duplicates, and a cross-source non-pair.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# (doc_id, text, source) — ids are multiples of 4 so the query's
# ``doc_id % 4 = 0`` sample keeps them
SHORT_DUP_DOCS = [
    (0, "", "web"),  # zero-token dup pair {0, 4}: sh == ['']
    (4, "", "web"),
    (8, "hello", "web"),  # one-token dup pair {8, 12}: sh == ['hello']
    (12, "hello", "web"),
    (16, "hello world", "web"),  # 2-token dup pair {16, 20}: bigram path
    (20, "hello world", "web"),
    (24, "a longer normal document with plenty of distinct tokens", "web"),
    (28, "hello", "other"),  # same text, different source → no pair
    (3, "hello", "web"),  # fails % 4 sample → must not appear
]


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("keep_rep_short")
    rows = [(i, t, "en", s, len(t)) for i, t, s in SHORT_DUP_DOCS]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def _canon(df):
    cols = sorted(df.columns)
    rows = []
    for tup in df[cols].itertuples(index=False):
        rows.append(
            tuple(
                f"{v:.9g}" if isinstance(v, float) and not math.isnan(v) else str(v)
                for v in tup
            )
        )
    rows.sort()
    return cols, rows


def test_keep_representative_short_dup_parity(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    got = QUERIES["dedup_keep_representative_docs"](spark, sf_dir).toPandas()
    want = con.execute(ORACLES["dedup_keep_representative_docs"]).fetchdf()
    gc, gr = _canon(got)
    wc, wr = _canon(want)
    assert gc == wc
    assert gr == wr
    kept = set(got["doc_id"])
    # each same-source short-dup pair collapsed to its min-id member
    # (identical docs → equal quality score → min doc_id tiebreak);
    # the cross-source twin and the unique doc survive
    assert kept == {0, 8, 16, 24, 28}
