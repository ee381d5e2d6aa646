"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator (SURVEY.md §2) with DuckDB
oracles where SQL-expressible.  Non-SQL-expressible ops (the span classifier
itself, pandas-UDF media features, LSH ANN, url cleaning UDF, page filter
over classifier counts) are rows-only here and pinned against the pure-Python
oracle in tests/ instead (span-sequence equality, tests/test_extract_spark.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wordscape_spark import datagen
from wordscape_spark import queries as Q
from wordscape_spark.operators import extract as X


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: classified ordered span sequences for every sf0.001 doc."""
    path = datagen.ensure_interleaved(0.001)
    docs = spark.read.parquet(path)
    extracted = X.extract(docs)
    return X.spans_out(extracted)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return Q.build_oracle_sql()
