"""As-of join unit tests: inclusive vs strict, ties, missing matches."""

from __future__ import annotations

import pytest

from rdfproject_msc_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 15, 200.0), (2, 16, 210.0)],
        "k long, t long, v double",
    )
    return left, right


def test_inclusive_backward(sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", prefix="r_")
    got = {r.name: r.r_v for r in out.collect()}
    # a@10 sees right(1,10); b@20 sees right(1,15); c@15 sees right(2,15)
    # inclusively; d has no right rows for k=3
    assert got == {"a": 100.0, "b": 150.0, "c": 200.0, "d": None}


def test_strict_backward(sides):
    left, right = sides
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", prefix="r_", strict=True
    )
    got = {r.name: r.r_v for r in out.collect()}
    # strict: a@10 no longer sees right(1,10); c@15 no longer sees right(2,15)
    assert got == {"a": None, "b": 150.0, "c": None, "d": None}


def test_tie_on_right_ts_resolved_by_tiebreak(spark):
    left = spark.createDataFrame([(1, 20, "x")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 1, 11.0), (1, 10, 2, 22.0)], "k long, t long, id long, v double"
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="t",
        right_ts="t",
        right_cols=["id", "v"],
        prefix="r_",
        tiebreak="id",
    )
    row = out.collect()[0]
    assert (row.r_id, row.r_v) == (2, 22.0)  # max tiebreak wins


def test_left_row_count_preserved(sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t")
    assert out.count() == left.count()


def test_interval_join_exact_window(spark):
    from rdfproject_msc_spark.operators.asof import interval_join

    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 89, "too_early"), (1, 90, "edge_lo"), (1, 100, "same"),
         (1, 110, "edge_hi"), (1, 111, "too_late"), (2, 100, "wrong_key")],
        "k long, t long, tag string",
    )
    out = interval_join(left, right, on="k", left_ts="t", right_ts="t", max_delta=10)
    got = sorted(r.near_tag for r in out.collect())
    assert got == ["edge_hi", "edge_lo", "same"]  # inclusive bounds, key-scoped


def test_interval_join_cross_cell_pairs(spark):
    """Pairs whose cells differ by one (e.g. 99 vs 101 with cell size 100)
    must still meet — the ±1 cell explode exists exactly for this."""
    from rdfproject_msc_spark.operators.asof import interval_join

    left = spark.createDataFrame([(1, 99)], "k long, t long")
    right = spark.createDataFrame([(1, 101)], "k long, t long")
    out = interval_join(left, right, on="k", left_ts="t", right_ts="t", max_delta=100)
    assert out.count() == 1


def test_single_shuffle_plan(sides):
    """The whole as-of compiles to ONE exchange (the window shuffle on the
    key) — the operator's scale claim, pinned in the plan."""
    left, right = sides
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
