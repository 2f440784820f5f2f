"""JSON payload operators.

Fast path: ``F.get_json_object`` / ``F.from_json`` — JVM, codegen'd —
for well-formed JSON columns (the reference's happy path).  Ragged
path: :func:`extract_json_udf`, an Arrow-batched kernel applying the
multi-strategy extractor + truncated repair of
``kernel.json_extract`` (reference ``utils/__init__.py:133-270,658-1038``),
emitting an ``output_repaired`` flag like ``extraction/service.py:996-1017``.

Schema discovery: :func:`discover_json_schema` samples a JSON column
and returns the merged Spark schema — the analog of the reference's
genson-based inference (``evaluation/service.py:221-265``,
``discovery/classes_discovery.py``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_RESULT = T.StructType(
    [
        T.StructField("json", T.StringType()),
        T.StructField("repaired", T.BooleanType()),
    ]
)


@pandas_udf(_RESULT)
def extract_json_udf(text: pd.Series) -> pd.DataFrame:
    from ..kernel.json_extract import extract_json

    out = [extract_json(t) for t in text]
    return pd.DataFrame(out, columns=["json", "repaired"])


@pandas_udf(T.StringType())
def detect_format_udf(text: pd.Series) -> pd.Series:
    """'json' | 'yaml' | 'unknown' per payload — the format-detection
    ladder (``utils/__init__.py:442-533``), Arrow-batched."""
    from ..kernel.json_extract import detect_format

    return text.map(detect_format)


_STRUCTURED_RESULT = T.StructType(
    [
        T.StructField("json", T.StringType()),
        T.StructField("fmt", T.StringType()),
    ]
)


@pandas_udf(_STRUCTURED_RESULT)
def extract_structured_udf(text: pd.Series) -> pd.DataFrame:
    """Format-dispatched parse: YAML payloads re-serialize to canonical
    JSON, everything else goes through the JSON repair ladder."""
    from ..kernel.json_extract import extract_structured

    out = [extract_structured(t) for t in text]
    return pd.DataFrame(out, columns=["json", "fmt"])


def json_field(col: Column | str, path: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def discover_json_schema(df: DataFrame, col: str, sample: int = 200) -> T.StructType:
    """Infer the merged schema of a JSON string column from a bounded
    sample (driver-side, O(sample) — never the corpus)."""
    spark = df.sparkSession
    rows = [r[0] for r in df.select(col).limit(sample).collect() if r[0]]
    return spark.read.json(spark.sparkContext.parallelize(rows)).schema


def parse_with_schema(df: DataFrame, col: str, schema: T.StructType,
                      out: str = "parsed") -> DataFrame:
    return df.withColumn(out, F.from_json(F.col(col), schema))
