"""Embedding quantization: symmetric int8 scalar quantization.

At 100 TB an embedding corpus is IO-bound: float32 vectors at dim d cost
4d bytes/row. Symmetric per-vector int8 (q = round(v/scale), scale =
max|v|/127) cuts that 4× with ~0.3% cosine error at dim 64 — the standard
first rung of the quantization ladder (below IVF-PQ). The quantized layout
is what the ANN scale path scans; exact re-ranking of the top candidates
uses the float layout.

Determinism/cross-engine: rounding is floor(x + 0.5) — identical in Spark
and DuckDB (both engines' native round() disagree on tie behavior), so
every column here has an exact SQL oracle twin (pytest-pinned; the
registry's 50-slot driver window is full, SURVEY.md §8).

These are one-time layout transforms, not per-query hot paths, so the
array work uses higher-order functions (one pass, JVM-side, no Python) —
the per-QUERY scoring path is the unrolled-literal form in similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_half_up(c: Column) -> Column:
    return F.floor(c + F.lit(0.5))


def with_qvec(
    df: DataFrame, vec_col: str = "embedding", keep_scale: bool = False
) -> DataFrame:
    """Add the int8 quantized vector ``qvec`` (and, with ``keep_scale``,
    the per-vector ``scale``) beside the existing columns. Pure per-row
    expressions — stateless, so usable identically on batch relations and
    streaming sources (the IVF streaming appender relies on this)."""
    # BIND the cast array as a projected column (r12): the abs-max fold
    # and the quantize transform both consumed the cast expression,
    # re-running it per reference. Values unchanged.
    v = F.col("__qv_d")
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    q = F.transform(
        v,
        lambda x: F.when(F.col("scale") == 0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    _round_half_up(x / F.col("scale")).cast("int"),
                ),
            )
        )
        .cast("int"),
    )
    out = (
        df.withColumn(
            "__qv_d",
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
        )
        .withColumn("scale", amax / F.lit(127.0))
        .withColumn("qvec", q)
        .drop("__qv_d")
    )
    return out if keep_scale else out.drop("scale")


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, qvec: array<int> in [-127, 127], scale: double). A zero vector
    quantizes to zeros with scale 0 (dequantizes to exact zeros)."""
    return with_qvec(df, vec_col, keep_scale=True).select(
        F.col(id_col), "scale", "qvec"
    )


def dequantize_rmse(
    qdf: DataFrame,
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, rmse): reconstruction error of the quantized vector against the
    float original — the quality metric that gates a quantized layout
    rollout."""
    joined = qdf.join(df.select(id_col, vec_col), id_col)
    diff2 = F.zip_with(
        F.col("qvec"),
        F.col(vec_col),
        lambda q, x: (q * F.col("scale") - x.cast("double"))
        * (q * F.col("scale") - x.cast("double")),
    )
    n = F.size(F.col(vec_col))
    return joined.select(
        F.col(id_col),
        F.sqrt(
            F.aggregate(diff2, F.lit(0.0), lambda a, b: a + b) / n
        ).alias("rmse"),
    )


def cosine_topk_quantized(
    qdf: DataFrame,
    df: DataFrame,
    query_id: int,
    k: int = 10,
    rerank: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-tier top-k: rank by QUANTIZED cosine over the int8 layout (the
    4×-smaller scan), keep ``rerank``·k candidates, then re-score those
    exactly from the float layout — the scan is cheap, the exactness is
    restored where it matters. Scores use the same unrolled-literal
    codegen path as the exact operator, so output columns and rounding
    match ``cosine_topk_to`` exactly (recall < 1 only when quantization
    reorders the candidate boundary; tests measure it)."""
    from rdfproject_msc_spark.operators.similarity import cosine_to_literal

    qrow = qdf.filter(F.col(id_col) == query_id).first()
    if qrow is None:
        raise ValueError(f"query_id {query_id} not found in {id_col}")
    qvec = [float(x) for x in qrow["qvec"]]

    approx = (
        qdf.filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            cosine_to_literal(F.col("qvec"), qvec).alias("ascore"),
        )
        .orderBy(F.col("ascore").desc(), F.col(id_col))
        .limit(rerank * k)
    )
    frow = df.filter(F.col(id_col) == query_id).select(vec_col).first()
    fvec = [float(x) for x in frow[0]]
    return (
        df.join(approx.select(id_col), id_col, "leftsemi")
        .select(
            F.col(id_col),
            F.round(cosine_to_literal(F.col(vec_col), fvec), 6).alias(
                "score"
            ),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
