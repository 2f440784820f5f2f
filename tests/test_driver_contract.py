"""Replicates the driver's queries()/oracle_sql() DuckDB cross-check
locally at sf0.001 so parity breaks surface before the round gate."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df):
    """Canonical sorted-rows/sorted-columns representation."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    if v == 0.0:
                        v = 0.0  # normalize -0.0
                    row.append(f"{v:.9g}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return cols, rows


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    got = QUERIES[name](spark, SF).toPandas()
    # Replicate the driver's canonicalizer exactly: pandas sort_values
    # over raw cells crashes on unhashable array/struct values (bit us
    # in r1 pipeline_sections_bio and r3 embedding_int8_quantization —
    # _canon's str() masking is not enough).
    if len(got):
        got.sort_values(by=sorted(got.columns), kind="mergesort")
    want = duck.execute(ORACLES[name]).fetchdf()
    gc, gr = _canon(got)
    wc, wr = _canon(want)
    assert gc == wc, f"{name}: column mismatch {gc} vs {wc}"
    assert len(gr) == len(wr), f"{name}: row count {len(gr)} vs {len(wr)}"
    mism = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} row mismatches; first: "
        f"spark={gr[mism[0]]} duck={wr[mism[0]]}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Rows-only entries must survive the driver's pandas canonicalizer:
    toPandas + sort_values over every column (array/struct columns are
    unhashable there and crashed pipeline_sections_bio in round 1)."""
    df = QUERIES[name](spark, SF)
    pdf = df.toPandas()
    assert list(pdf.columns)
    if len(pdf):
        pdf.sort_values(by=sorted(pdf.columns), inplace=True, kind="mergesort")
    assert len(pdf) >= 0


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert "classification" in out.columns


def test_registry_front_invariant():
    """The correctness driver verifies only the FIRST 50 registry
    entries.  Round-7 shape (r6 verdict items 2+3): FRONT = the 5 new
    entries (the rows-only prebuilt-IVF serving shape + 4 new
    oracle-paired TPC-H queries), then the 42 oracle-paired queries
    whose latest driver evidence is r4 (oldest-first), then 3 rows-only
    dedup/ANN re-presents — after r7 no oracle-paired query's evidence
    is older than r5.  FRONT must fill the 50 driver slots exactly;
    rows-only entries are allowed ONLY from the explicit re-present
    lists (their real gates are pytest)."""
    from accelerated_intelligent_document_processing_on_aws_spark.plans import registry

    names = list(registry.QUERIES)
    assert names[: len(registry.FRONT)] == registry.FRONT
    assert len(registry.FRONT) == 50, "FRONT must fill the 50 driver slots"
    rows_only_allowed = {"ann_ivf_prebuilt_topk"} | set(registry.FRONT_ROWS_ONLY_R7)
    unexpected = [
        n
        for n in registry.FRONT
        if n not in registry.ORACLES and n not in rows_only_allowed
    ]
    assert not unexpected, unexpected
    assert len(registry.FRONT_STALE_R4) == 42
    assert all(n in registry.ORACLES for n in registry.FRONT_STALE_R4)
    assert registry.FRONT[0] == "ann_ivf_prebuilt_topk"
    # outside FRONT, oracle-paired entries still precede rows-only ones
    rest = names[len(registry.FRONT) :]
    kinds = [n in registry.ORACLES for n in rest]
    assert kinds == sorted(kinds, reverse=True), "rows-only before oracle-paired"


def test_registry_outputs_atomic(spark):
    """Registry lint (round-3 verdict #1): the driver canonicalizes by
    pandas sort_values over every output column, which cannot factorize
    array/map/struct cells — so NO registry query may expose a
    non-atomic column.  Schema-only check (plans are built lazily, not
    executed)."""
    from pyspark.sql import types as T

    from accelerated_intelligent_document_processing_on_aws_spark.plans import registry

    bad = {}
    for name, fn in registry.QUERIES.items():
        schema = fn(spark, SF).schema
        offenders = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, f"non-atomic driver-facing columns: {bad}"
