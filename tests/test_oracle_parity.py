"""Driver-style correctness gate, run locally: every query with an oracle
must match DuckDB on row count, column names, and (sorted) values at the
driver's comparison scale (sf0.01)."""

import math

import duckdb
import pytest

from wordscape_spark import queries as Q

SF_DIR = Q.ORACLE_SF_DIR
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df):
    """Sort columns by name, rows by string repr — order-insensitive."""
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


ORACLES = Q.build_oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    spark_df = Q.QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = duck.execute(ORACLES[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), name
    a, b = _canon(spark_df), _canon(duck_df)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    mismatches = [
        (x, y) for x, y in zip(a, b) if x != y
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(Q.QUERIES) - set(ORACLES)):
        df = Q.QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name
