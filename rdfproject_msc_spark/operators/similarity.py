"""Similarity search over an embedding column (array<float>).

Two tiers:
- brute-force cosine top-k — exact baseline; one pass, JVM-side arithmetic
  (``zip_with`` + ``aggregate``), no Python in the loop. At scale: the query
  vector is a literal in the plan (no join), the scan is embarrassingly
  parallel, and top-k is a TakeOrdered — no full sort, no shuffle of vectors.
- LSH-bucketed (random-hyperplane signatures) — the 100 TB path: candidates
  meet only within matching signature buckets; brute-force verifies inside
  the bucket. Hyperplanes are derived deterministically from a seed via a
  hash-based pseudo-random construction so results are reproducible without
  driver-side RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double math)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query vector.

    Deterministic tie-break on id. Output: (id, score) with score rounded to
    6 decimals (cross-engine float stability).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def cosine_topk_to(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k most similar to the vector whose id == query_id (excluded from
    results). The query vector joins in via a broadcast single-row cross join
    — no driver collect, so the same plan works when the 'query' is itself a
    large relation (becomes a broadcast-nested-loop / hashed semi-batch)."""
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qvec")
    )
    scored = (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6).alias(
                "score"
            ),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane (SimHash) signature per vector.

    Plane j, component i is a deterministic pseudo-random ±1:
    sign(hash(seed, j, i)) via a integer mix — computed as a literal array in
    the plan, identical on every executor, no RNG shipping.
    """
    import hashlib

    def plane(j: int) -> list[float]:
        comps = []
        for i in range(dim):
            h = int.from_bytes(
                hashlib.sha256(f"{seed}:{j}:{i}".encode()).digest()[:4], "big"
            )
            comps.append(1.0 if h % 2 == 0 else -1.0)
        return comps

    sig = None
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for j in range(n_planes):
        p = F.array(*[F.lit(c) for c in plane(j)])
        bit = (_dot(vd, p) >= 0).cast("long")
        sig = bit if sig is None else sig * 2 + bit
    return df.select(F.col(id_col), sig.alias("signature"))


def lsh_candidate_pairs(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Banded LSH: split the signature into bands; vectors sharing any band
    bucket become candidate pairs (self-join per band, unioned, distinct).
    The band value is the shuffle key — small ints, never vectors."""
    assert n_planes % bands == 0
    bits_per_band = n_planes // bands
    sigs = lsh_signatures(df, dim, n_planes, seed, vec_col, id_col)
    mask = (1 << bits_per_band) - 1
    out = None
    for b in range(bands):
        band = sigs.select(
            F.col(id_col).alias("id"),
            (F.shiftright(F.col("signature"), b * bits_per_band) & mask).alias(
                "band_val"
            ),
        )
        a, bb = band.alias("a"), band.alias("b")
        pairs = a.join(
            bb,
            (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        out = pairs if out is None else out.unionAll(pairs)
    return out.distinct()
