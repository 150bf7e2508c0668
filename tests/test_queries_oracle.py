"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() twin on DuckDB over the same parquet, compare
row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pandas as pd
import pytest

from crawld_spark.queries import TABLES, oracle_sql, queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, bool):
            return v
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, float):
            if v != v:
                return None
            return round(v, 9)
        return v

    rows = sorted(
        tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return rows


ALL = sorted(queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, ddb, name):
    fn = queries()[name]
    sql = oracle_sql().get(name)
    got = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check (driver's weaker lane)
        return
    want = ddb.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = canon(got), canon(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
