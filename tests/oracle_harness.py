"""Local mirror of the driver's DuckDB-oracle correctness gate.

For each registered (query, oracle) pair: run the Spark query and the DuckDB
SQL over the same parquet, normalize both frames (column order by name,
float rounding, timestamp canonicalization, row sort), and compare values.
This is intentionally at least as strict as the driver's order-insensitive
value-hash (SURVEY.md §5.2), so passing here predicts passing CORRECTNESS.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from data_pipeline_cursor_spark.sources.tables import TABLE_NAMES, table_path

FLOAT_DECIMALS = 4


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register each fixture parquet as a view, as the driver does.

    A table may be a single parquet file (driver fixtures) or a DIRECTORY
    of part files (scripts/make_scale_data.py's sf1/sf10 fixtures, written
    one file per copy) — DuckDB needs an explicit glob for the latter."""
    import os

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon_scalar(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        r = round(v, FLOAT_DECIMALS)
        if r == 0:
            r = 0.0  # normalize -0.0
        return f"{r:.{FLOAT_DECIMALS}f}"
    if isinstance(v, (np.floating,)):
        return _canon_scalar(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, Decimal):
        return _canon_scalar(float(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_scalar(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_dtypes(pdf: pd.DataFrame) -> dict[str, str]:
    """Column → canonical dtype FAMILY, comparable across Spark/DuckDB
    pandas exports.  Exact pandas dtypes differ legitimately between the
    engines (Spark hour() → int32, DuckDB hour() → int64; DuckDB sum(int)
    → HUGEINT → float64/object), so widths are collapsed; families (int vs
    float vs str vs timestamp vs array …) still expose real regressions
    that a names-only schema compare misses (round-4 ADVICE, selfcheck.py)."""
    out = {}
    for col in pdf.columns:
        out[col] = _dtype_family(pdf[col])
    return out


def _dtype_family(series: pd.Series) -> str:
    dt = series.dtype
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "timestamp"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    non_null = series.dropna()
    if not len(non_null):
        return "unknown"  # all-NULL object column carries no dtype evidence
    v = non_null.iloc[0]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating, Decimal)):
        return "float"
    if isinstance(v, (pd.Timestamp, datetime)):
        return "timestamp"
    if isinstance(v, date):
        return "date"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "array"
    if isinstance(v, bytes):
        return "bytes"
    if isinstance(v, dict):
        return "struct"
    if isinstance(v, str):
        return "str"
    return type(v).__name__


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_canon_scalar(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def compare_query(spark, name, query_fn, oracle: str, sf_dir: str) -> None:
    """Raise AssertionError with a useful diff if the pair mismatches."""
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        duck_pdf = con.sql(oracle).df()
    finally:
        con.close()

    # An oracled query that returns 0 rows proves nothing — both engines
    # trivially agree on empty (round-2 VERDICT item 1: q_join_anti / q_except
    # / q_scalar_subquery all passed vacuously).  Every oracled query must
    # produce evidence at the smallest gate SF.
    assert len(spark_pdf) > 0, (
        f"{name}: oracled query returned 0 rows — vacuous oracle match; "
        "tighten the predicate so the query produces evidence at this SF"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch\n spark={sorted(spark_pdf.columns)}\n "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        from collections import Counter

        cs, cd = Counter(s_rows), Counter(d_rows)
        diff_s = list((cs - cd).elements())[:5]
        diff_d = list((cd - cs).elements())[:5]
        raise AssertionError(
            f"{name}: value mismatch ({len(diff_s)}+ differing rows)\n"
            f" spark-only sample: {diff_s}\n duck-only sample: {diff_d}\n"
            f" columns: {sorted(spark_pdf.columns)}"
        )
