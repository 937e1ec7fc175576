"""Simulates the driver's correctness gate: every ``queries()`` entry runs on
Spark at sf0.01 and, where an ``oracle_sql()`` entry exists, must match the
DuckDB result (row count + schema names + order-insensitive values)."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E
from conftest import SF_CORRECT

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_CORRECT, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        # unify decimal/object numerics
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c]).round(9)
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(E.oracle_sql().keys())
ROWS_ONLY = sorted(set(E.queries()) - set(ORACLE_NAMES))


def test_every_query_has_an_oracle():
    """The zero-rows-only invariant (held since round 4): every board
    query is DuckDB-checkable, and no oracle is orphaned."""
    assert ROWS_ONLY == []
    assert sorted(set(ORACLE_NAMES) - set(E.queries())) == []


def test_board_fits_driver_cap():
    """The driver correctness board records at most 50 rows in dict order
    (observed: round 4 ran 50 of 51 queries, round 5 ran 50 of 54 — the
    dropped rows were exactly the LAST dict keys both times). Exceeding
    the cap silently un-verifies whatever sits at the end of the dict, so
    variant rows must be merged, never appended past 50."""
    assert len(E.queries()) <= 50


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = E.queries()[name]
    got = normalize(q(spark, SF_CORRECT).toPandas())
    exp = normalize(ddb.execute(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for c in got.columns:
        a, b = got[c], exp[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            ok = (
                (a.isna() & b.isna())
                | (pd.to_numeric(a) - pd.to_numeric(b)).abs().le(1e-9)
            )
        else:
            ok = (a.isna() & b.isna()) | (a == b)
        assert ok.all(), f"{name}.{c}: first mismatch\n{got[~ok].head()}\n{exp[~ok].head()}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = E.queries()[name](spark, SF_CORRECT)
    n = df.count()
    assert n >= 0
    # extraction queries must produce data
    if name.startswith("extract") or name in ("document_text", "image_metadata"):
        assert n > 0, name


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns and "text" in df.columns
