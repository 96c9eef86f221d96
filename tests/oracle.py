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


def _arrow_type_class(t) -> str:
    """Type class of a DECLARED duckdb result column (via Arrow schema).

    The driver's value hash is type-strict at the declared-type level:
    duckdb's Python fetchall() converts HUGEINT (e.g. sum(BIGINT)) to plain
    int, hiding the drift from cell-level comparison — but .arrow() reports
    it as decimal128(38,0), which is what the driver actually hashes.
    """
    import pyarrow.types as pat

    if pat.is_integer(t):
        return "int"
    if pat.is_floating(t):
        return "float"
    if pat.is_decimal(t):
        return "decimal"
    if pat.is_boolean(t):
        return "bool"
    if pat.is_string(t) or pat.is_large_string(t):
        return "str"
    if pat.is_binary(t) or pat.is_large_binary(t):
        return "bytes"
    if pat.is_timestamp(t):
        return "datetime"
    if pat.is_date(t):
        return "date"
    if pat.is_list(t) or pat.is_large_list(t):
        return "list<" + _arrow_type_class(t.value_type) + ">"
    if pat.is_struct(t):
        return "struct"
    return str(t)


def _spark_type_class(t) -> str:
    from pyspark.sql import types as T

    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.BinaryType):
        return "bytes"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.ArrayType):
        return "list<" + _spark_type_class(t.elementType) + ">"
    if isinstance(t, T.StructType):
        return "struct"
    return t.simpleString()


def declared_type_mismatches(spark_schema, con, sql: str):
    """Compare DECLARED result types: Spark df.schema vs duckdb's Arrow
    schema for the oracle SQL. Returns [(col, spark_class, oracle_class)].

    This catches the HUGEINT drift class (uncast sum() in oracle SQL) that
    cell-value comparison cannot see locally."""
    arrow_schema = con.execute(sql).arrow().schema
    o_types = {f.name: _arrow_type_class(f.type) for f in arrow_schema}
    out = []
    for field in spark_schema.fields:
        sc = _spark_type_class(field.dataType)
        oc = o_types.get(field.name)
        if oc is not None and sc != oc:
            out.append((field.name, sc, oc))
    return out


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
    drift = declared_type_mismatches(spark_df.schema, con, sql)
    assert not drift, f"declared result types differ (driver hash would fail): {drift}"
