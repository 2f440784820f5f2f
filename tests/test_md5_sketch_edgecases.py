"""Adversarial edge-case parity for the cross-engine md5 sketch queries.

Round-4 ADVICE found two latent divergences the standard fixtures never
exercised:

- ``minhash_md5_signature``: a sampled doc with < 3 tokens made
  ``F.sequence(1, greatest(size-2, 0))`` step DOWNWARD to ``[1, 0]``
  (Spark's sequence decrements when start > stop), so the shingle
  transform indexed ``element_at(_t, 0)`` and threw
  INVALID_ARRAY_INDEX before the ``size(_sh) > 0`` filter ran.
- ``simhash_md5_fingerprint``: ``F.aggregate`` over an empty token-hash
  array returns the init (0) so every bit-vote was >= 0 → all '1';
  DuckDB's ``list_sum`` over an empty list is NULL → all '0'.

This file pins both fixes by running the REGISTERED query and its
REGISTERED oracle SQL over a synthetic corpus built of exactly those
adversarial shapes (empty text, whitespace-only, 1/2/3-token docs),
plus normal docs, using doc_ids that survive the ``% 10 == 0`` sample.
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

ADVERSARIAL_DOCS = [
    # (doc_id, text) — ids are multiples of 10 so the sample keeps them
    (0, ""),  # zero tokens: simhash empty-vote divergence
    (10, "   "),  # whitespace-only → zero tokens after filter
    (20, "one"),  # 1 token: sequence(1, 0) crash shape
    (30, "two tokens"),  # 2 tokens: sequence(1, 0) crash shape
    (40, "three token doc"),  # exactly 3 tokens → one shingle
    (50, "a normal document with plenty of tokens for shingling here"),
    (60, "Repeat repeat REPEAT repeat"),  # case-folding + distinct
    (70, "\t tab\nand newline separated \n tokens \t"),
    (5, "not sampled — must not appear"),  # fails % 10 filter
]


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("md5_edge")
    rows = [
        (i, t, "en", "synthetic", len(t)) for i, t in ADVERSARIAL_DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con


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


@pytest.mark.parametrize(
    "name", ["minhash_md5_signature", "simhash_md5_fingerprint"]
)
def test_md5_sketch_adversarial_parity(spark, duck, sf_dir, name):
    got = QUERIES[name](spark, sf_dir).toPandas()  # must not throw
    want = duck.execute(ORACLES[name]).fetchdf()
    gc, gr = _canon(got)
    wc, wr = _canon(want)
    assert gc == wc
    assert gr == wr, (
        f"{name}: first mismatch "
        f"{next((a, b) for a, b in zip(gr, wr) if a != b) if len(gr) == len(wr) else (len(gr), len(wr))}"
    )


def test_minhash_drops_sub3_token_docs(spark, duck, sf_dir):
    got = QUERIES["minhash_md5_signature"](spark, sf_dir).toPandas()
    kept = set(got["doc_id"])
    # <3-token docs produce no shingles and are filtered, not crashed on
    assert kept == {40, 50, 60, 70}


def test_simhash_zero_token_fingerprint_is_all_zero(spark, sf_dir):
    got = QUERIES["simhash_md5_fingerprint"](spark, sf_dir).toPandas()
    empties = got[got["n_toks"] == 0]
    assert set(empties["doc_id"]) == {0, 10}
    assert set(empties["simhash_bits"]) == {"0" * 60}
