"""As-of (temporal) join — an operator Spark's DataFrame API lacks natively.

Semantics: for each LEFT row, attach the single RIGHT row with the largest
``right_ts`` that is ≤ (inclusive) or < (strict) the left row's ``left_ts``,
within the same key. The classic implementation people reach for — per-key
sort + merge in Python — doesn't distribute; a range-condition theta join
explodes to O(|L|·|R|) per key.

The scalable re-expression (composition of built-ins, per the engine's
operator policy):

1. tag both sides and UNION them into one relation (cheap, no join);
2. one shuffle: ``Window.partitionBy(key).orderBy(ts, side, tiebreak)``;
3. ``last(right_payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — each left row picks up
   the most recent right payload in sort order;
4. keep the left rows, unpack the payload struct.

Cost: ONE shuffle of |L|+|R| rows on the join key — the same lower bound as
any co-partitioned join — with no per-key blowup; skewed keys are handled by
AQE like any other window shuffle. Strict-vs-inclusive is encoded purely in
the sort position of right rows at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delta: int,
    prefix: str = "near_",
) -> DataFrame:
    """Range join: every (left, right) pair with the same key whose
    timestamps are within ``max_delta`` of each other (|l - r| ≤ max_delta,
    timestamps as integers — e.g. epoch micros/nanos).

    A naive range condition compiles to a nested-loop / per-key cartesian.
    The scalable re-expression buckets time into ``max_delta``-sized cells:
    a qualifying pair's cells differ by at most 1, so joining on
    (key, cell) ∪ (key, cell±1) — built by exploding each LEFT row into its
    three candidate cells — turns the theta join into ONE equi-shuffle,
    followed by the exact |Δ| ≤ max_delta refinement. Cost: 3× the left
    side's shuffle rows (cheap: ids + two longs), never |L|·|R| per key.
    """
    # cell assignment in EXACT integer division: epoch-nanos int64 (~1.7e18)
    # exceeds double's 53-bit mantissa, so `/` + cast could mis-bucket a
    # timestamp within a few hundred ns of a cell boundary and silently drop
    # a qualifying pair. `div` on longs never leaves the integer domain.
    cell = F.expr(f"`{right_ts}` div {int(max_delta)}")
    r = right.select(
        F.col(on).alias("__k"),
        cell.alias("__cell"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
    )
    lcell = F.expr(f"`{left_ts}` div {int(max_delta)}")
    l = left.select(
        F.col(on).alias("__k"),
        F.explode(
            F.array(lcell - 1, lcell, lcell + 1)
        ).alias("__cell"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    joined = l.join(r, ["__k", "__cell"]).filter(
        F.abs(F.col(f"__l.{left_ts}") - F.col(f"__r.{right_ts}")) <= max_delta
    )
    return joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(f"{prefix}{c}") for c in right.columns],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    strict: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join (latest right at-or-before left).

    ``strict=True`` excludes right rows at exactly left_ts (< instead of ≤).
    ``tiebreak``: right column ordering rows that share (key, ts) — the max
    wins; REQUIRED for deterministic results when such ties can exist.
    Output: all left columns + each right col as ``{prefix}{col}`` (null when
    no right row qualifies).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )

    # side ordering at equal ts decides inclusive vs strict:
    #   inclusive: right first (0) so a left row at the same ts sees it
    #   strict:    right last  (1) so it doesn't
    right_side = 1 if strict else 0
    left_side = 1 - right_side

    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(right_side).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        payload.alias("__r"),
        F.lit(None).alias("__l"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__l").isNotNull()).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out
