"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet tables,
canonicalizes both (column sort by name, row sort over all columns, float
rounding, null normalization — per FIXTURES.md "usage by tier"), and
compares values. Used by tests/test_entry.py to gate every
``__spark_entry__.queries()`` / ``oracle_sql()`` pair before the driver does.
"""

from __future__ import annotations

import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v, float_digits: int = 4):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, float_digits)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x, float_digits) for x in v)
    return v

def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def canonicalize(columns, rows, float_digits: int = 4):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i], float_digits) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return [columns[i] for i in order], out


def compare(spark_df, con, sql: str, float_digits: int = 4):
    """Return (ok, message) comparing a Spark result to a DuckDB result."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    _, cs = canonicalize(s_cols, s_rows, float_digits)
    _, cd = canonicalize(d_cols, d_rows, float_digits)
    for i, (a, b) in enumerate(zip(cs, cd)):
        # str-level too: Decimal('1.2300') == Decimal('1.23') numerically,
        # but the driver hashes representations (via pandas), where scale
        # and trailing zeros matter — catch that class locally
        if a != b or tuple(map(str, a)) != tuple(map(str, b)):
            return False, f"first differing row #{i}:\n  spark : {a}\n  duckdb: {b}"
    return True, "ok"
