"""Self-run oracle parity harness mirroring the driver's t2 gate.

Runs a Spark query and its DuckDB oracle on the same parquet tables,
normalizes both to pandas (columns sorted by name, rows sorted by all
columns), and compares values — exact for ints/strings/dates/bools,
tolerant for floats, Decimal coerced to float for comparison.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from olist_lakehouse_2_0_spark.catalog import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _normalize_cell(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (np.floating, float)):
        return float(v)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, _dt.date):
        # pandas widens DATE columns to datetime64; compare at midnight
        return _dt.datetime(v.year, v.month, v.day)
    if isinstance(v, np.ndarray):
        return tuple(_normalize_cell(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    if v is pd.NaT:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append(None)
            elif v is pd.NaT:
                cells.append(None)
            else:
                cells.append(_normalize_cell(v))
        rows.append(tuple(cells))

    def sort_key(r):
        return tuple((x is None, str(type(x).__name__), str(x)) for x in r)

    return sorted(rows, key=sort_key)


def _cells_equal(a, b, rtol=1e-9, atol=1e-9) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=rtol, abs_tol=atol)
        except (TypeError, ValueError):
            return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, name: str = "query"):
    actual = _normalize(spark_df.toPandas())
    expected = _normalize(run_oracle(oracle_sql, sf_dir))
    assert len(actual) == len(expected), (
        f"{name}: row count mismatch spark={len(actual)} oracle={len(expected)}"
    )
    spark_cols = sorted(spark_df.columns)
    oracle_cols = sorted(run_oracle(f"SELECT * FROM ({oracle_sql}) LIMIT 0", sf_dir).columns)
    assert spark_cols == oracle_cols, (
        f"{name}: column mismatch spark={spark_cols} oracle={oracle_cols}"
    )
    for i, (a, e) in enumerate(zip(actual, expected)):
        if len(a) != len(e) or not all(_cells_equal(x, y) for x, y in zip(a, e)):
            raise AssertionError(
                f"{name}: row {i} mismatch\n spark:  {a}\n oracle: {e}"
            )
