"""Local mirror of the driver's t2 check: run a Spark query and its DuckDB
oracle over the same parquet fixtures and compare row count, schema (column
name set) and order-insensitive values.

Comparison canonicalization (same spirit as a value-hash): columns sorted by
name, rows sorted by their full tuple, floats compared exactly after the
in-query rounding convention (so a mismatch here predicts a driver hash
mismatch)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ("null",)
        if isinstance(v, float):
            return ("f", repr(v))
        if isinstance(v, (int,)):
            return ("i", int(v))
        return ("s", str(v))

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch spark={sorted(actual.columns)} "
        f"oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count spark={len(actual)} oracle={len(expected)}"
    )
    ca, ce = _canon(actual), _canon(expected)
    if ca != ce:
        diffs = [(a, e) for a, e in zip(ca, ce) if a != e][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
