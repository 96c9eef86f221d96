"""DuckDB oracle comparison mirroring the driver's t2 gate: row-count,
column names, and order-insensitive values (columns sorted by name).

Values are compared TYPE-STRICTLY: every cell is tagged with a type class
before comparison, so an engine returning int64 where the oracle returns
float64 fails here exactly like it fails the driver's value-hash gate
(Python's `1848 == 1848.0` would otherwise mask the drift — the round-2
bug class)."""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb

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


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _type_class(x) -> str:
    if x is None:
        return "null"
    if isinstance(x, bool):
        return "bool"
    if isinstance(x, int):
        return "int"
    if isinstance(x, float):
        return "float"
    if isinstance(x, Decimal):
        return "decimal"
    if isinstance(x, str):
        return "str"
    if isinstance(x, (bytes, bytearray)):
        return "bytes"
    if isinstance(x, datetime.datetime):
        return "datetime"
    if isinstance(x, datetime.date):
        return "date"
    if isinstance(x, (list, tuple)):
        return "list"
    return type(x).__name__


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(x):
        tc = _type_class(x)
        if tc == "float":
            return (tc, round(x, 9) if not math.isnan(x) else "NaN")
        if tc == "list":
            return (tc, tuple(norm_cell(v) for v in x))
        if tc == "bytes":
            return (tc, bytes(x))
        return (tc, x)

    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str):
    con = duck_connect(sf_dir)
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count differs: {len(s_rows)} vs {len(o_rows)}"
    assert _normalize(s_rows, s_cols) == _normalize(o_rows, o_cols)
