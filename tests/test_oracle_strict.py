"""The local oracle gate must be TYPE-STRICT: the driver hashes values, so
int64 `1848` and float64 `1848.0` are different results even though Python's
`==` says otherwise. Round 2 shipped three entries green locally that failed
the driver's hash gate on exactly this; these tests pin the fix."""

from __future__ import annotations

from decimal import Decimal

from tests.oracle import _normalize


def test_int_vs_float_drift_fails():
    assert _normalize([(1848,)], ["x"]) != _normalize([(1848.0,)], ["x"])


def test_int_vs_decimal_drift_fails():
    assert _normalize([(5,)], ["x"]) != _normalize([(Decimal(5),)], ["x"])


def test_bool_vs_int_drift_fails():
    assert _normalize([(True,)], ["x"]) != _normalize([(1,)], ["x"])


def test_same_types_match():
    assert _normalize([(1848, "a")], ["x", "y"]) == _normalize(
        [(1848, "a")], ["x", "y"]
    )


def test_float_rounding_still_tolerant():
    assert _normalize([(1.0000000000001,)], ["x"]) == _normalize([(1.0,)], ["x"])


def test_nested_list_types_strict():
    assert _normalize([([1, 2],)], ["x"]) != _normalize([([1.0, 2.0],)], ["x"])
    assert _normalize([([1, 2],)], ["x"]) == _normalize([((1, 2),)], ["x"])


def test_equiv_union_detects_divergence(spark):
    """The registry's multiset-equivalence harness must return exactly `a`
    when variants agree, and surface extra rows (breaking the row-count
    gate) when any variant diverges — including duplicate-multiplicity
    differences that set-based checks miss."""
    from rdfproject_msc_spark.registry import _equiv_union

    a = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], "k long, v string")
    same = spark.createDataFrame([(2, "y"), (1, "x"), (2, "y")], "k long, v string")
    missing = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    extra = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y"), (3, "z")], "k long, v string"
    )
    assert _equiv_union(a, same).count() == 3
    assert sorted(map(tuple, _equiv_union(a, same).collect())) == sorted(
        map(tuple, a.collect())
    )
    assert _equiv_union(a, missing).count() == 4   # the lost duplicate surfaces
    assert _equiv_union(a, extra).count() == 4     # the foreign row surfaces
    assert _equiv_union(a, same, extra).count() == 4


def test_declared_type_gate_catches_hugeint(spark):
    """duckdb fetchall() converts sum(BIGINT)'s HUGEINT result to plain int,
    so cell-level comparison cannot see the drift that fails the driver's
    type-strict hash. The declared-type gate (Arrow schema vs Spark schema)
    must flag an uncast sum() and pass the CAST(... AS BIGINT) twin."""
    import duckdb

    from tests.oracle import declared_type_mismatches

    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT CAST(5 AS BIGINT) AS n")
    df = spark.createDataFrame([(5,)], "total long")

    drift = declared_type_mismatches(
        df.schema, con, "SELECT sum(n) AS total FROM t"
    )
    assert drift == [("total", "int", "decimal")]

    assert not declared_type_mismatches(
        df.schema, con, "SELECT CAST(sum(n) AS BIGINT) AS total FROM t"
    )


def test_declared_type_gate_int_widths_agree(spark):
    """INTEGER vs BIGINT are both class 'int' — the driver's hash does not
    distinguish widths (verified by 48 green r3 rows over mixed widths), so
    the gate must not false-positive on them."""
    import duckdb

    from tests.oracle import declared_type_mismatches

    con = duckdb.connect()
    df = spark.createDataFrame([(5, 1.5)], "a long, b double")
    assert not declared_type_mismatches(
        df.schema, con, "SELECT CAST(5 AS INTEGER) AS a, CAST(1.5 AS DOUBLE) AS b"
    )
