"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet tables,
canonicalizes both (column sort by name, row sort over all columns, float
rounding, null normalization — per FIXTURES.md "usage by tier"), and
compares values. Used by tests/test_entry.py to gate every
``__spark_entry__.queries()`` / ``oracle_sql()`` pair before the driver does.

Driver parity note (the round-1/round-2 lesson): the driver canonicalizes
BOTH sides through pandas before hashing, so *representation* classes
matter, not just values. Round 1: DuckDB DECIMAL → float64 vs Spark
Decimal objects. Round 2: DuckDB HUGEINT (any ``SUM(BIGINT)``) → float64
vs Spark int64 — bit-identical values, red hash. This comparator therefore
fetches the DuckDB side via ``rel.df()`` and the Spark side via
``toPandas()`` and fails on numeric-dtype-class mismatches (int vs float vs
bool) in addition to value mismatches.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v, float_digits: int = 4):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x, float_digits) for x in v)
    # pd.NA / scalar NaN-likes (after the container check — pd.isna is
    # elementwise on arrays)
    if v is getattr(pd, "NA", None):
        return None
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return round(float(v), float_digits)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # Render midnight timestamps as dates so DuckDB's datetime64 DATE
        # column compares equal to Spark's datetime.date objects; the rule
        # is applied to both sides, so true midnight timestamps stay equal.
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def canonicalize(columns, rows, float_digits: int = 4):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i], float_digits) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return [columns[i] for i in order], out


def _numeric_class(dtype) -> str | None:
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return None


def compare(spark_df, con, sql: str, float_digits: int = 4):
    """Return (ok, message) comparing a Spark result to a DuckDB result.

    Both sides are materialized as pandas frames (the driver's hash path),
    so dtype-representation mismatches that would flip the driver's value
    hash (int64 vs float64, Decimal objects, HUGEINT widening) fail here
    even when the values are numerically identical.
    """
    s_pdf = spark_df.toPandas()
    d_pdf = con.sql(sql).df()
    s_cols = list(s_pdf.columns)
    d_cols = list(d_pdf.columns)
    if sorted(s_cols) != sorted(d_cols):
        return False, (f"column mismatch: spark={sorted(s_cols)} "
                       f"duckdb={sorted(d_cols)}")
    if len(s_pdf) != len(d_pdf):
        return False, (f"row count mismatch: spark={len(s_pdf)} "
                       f"duckdb={len(d_pdf)}")
    order = sorted(s_cols)
    dtype_bad = []
    for c in order:
        a, b = _numeric_class(s_pdf[c].dtype), _numeric_class(d_pdf[c].dtype)
        if a != b and not (a is None or b is None):
            dtype_bad.append((c, str(s_pdf[c].dtype), str(d_pdf[c].dtype)))
    if dtype_bad:
        return False, ("pandas dtype-class mismatch (driver-hash hazard; "
                       "spark vs duckdb): " + repr(dtype_bad))
    s_rows = [tuple(r) for r in s_pdf[order].itertuples(index=False,
                                                        name=None)]
    d_rows = [tuple(r) for r in d_pdf[order].itertuples(index=False,
                                                        name=None)]
    _, cs = canonicalize(order, s_rows, float_digits)
    _, cd = canonicalize(order, d_rows, float_digits)
    for i, (a, b) in enumerate(zip(cs, cd)):
        # str-level too: Decimal('1.2300') == Decimal('1.23') numerically,
        # but the driver hashes representations (via pandas), where scale
        # and trailing zeros matter — catch that class locally
        if a != b or tuple(map(str, a)) != tuple(map(str, b)):
            return False, (f"first differing row #{i}:\n  spark : {a}\n"
                           f"  duckdb: {b}")
    return True, "ok"
