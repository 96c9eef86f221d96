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


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes: plane j, component i is
    sign(sha256(seed:j:i)). Identical on every executor AND reproducible by
    any other engine (the oracle inlines these as SQL literals), so LSH
    semantics are cross-engine pinned — no RNG state shipping."""
    import hashlib

    def plane(j: int) -> list[float]:
        comps = []
        for i in range(dim):
            h = int.from_bytes(
                hashlib.sha256(f"{seed}:{j}:{i}".encode()).digest()[:4], "big"
            )
            comps.append(1.0 if h % 2 == 0 else -1.0)
        return comps

    return [plane(j) for j in range(n_planes)]


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane (SimHash) signature per vector: bit j = (v·plane_j
    ≥ 0); signature = bits packed MSB-first (plane 0 highest). Per-row, zero
    shuffle — at scale signatures are computed once and persisted."""
    sig = None
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for p_comps in hyperplanes(dim, n_planes, seed):
        p = F.array(*[F.lit(c) for c in p_comps])
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
    mask = F.lit((1 << bits_per_band) - 1).cast("long")
    out = None
    for b in range(bands):
        band = sigs.select(
            F.col(id_col).alias("id"),
            F.shiftright(F.col("signature"), b * bits_per_band)
            .bitwiseAND(mask)
            .alias("band_val"),
        )
        a, bb = band.alias("a"), band.alias("b")
        pairs = a.join(
            bb,
            (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        out = pairs if out is None else out.unionAll(pairs)
    return out.distinct()


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.2,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-level near-duplicate pairs: LSH band candidates + exact
    cosine verify ≥ threshold. The all-pairs n² cosine join never happens —
    only bucket collisions are scored. Output: (id_a, id_b, score).

    Like the MinHash path, the verify stage joins the vectors back by id for
    candidates only; shuffle keys in candidate generation are (band, value)
    ints, never vectors."""
    cand = lsh_candidate_pairs(df, dim, n_planes, bands, seed, vec_col, id_col)
    vecs = df.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v"))
    scored = (
        cand.join(
            vecs.select(
                F.col("__vid").alias("id_a"), F.col("__v").alias("__va")
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("__vid").alias("id_b"), F.col("__v").alias("__vb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 6).alias(
                "score"
            ),
        )
    )
    return scored.filter(F.col("score") >= threshold)


def lsh_topk_to(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by cosine to the vector with id == query_id:
    candidates are vectors sharing ≥1 LSH band bucket with the query; exact
    cosine scores + top-k only within candidates.

    Scale shape: the query's band values are a tiny relation → broadcast
    semi-join prunes the candidate set before any vector arithmetic; only
    candidate vectors are scored. With persisted signatures (bucket-partitioned
    Parquet), the scan itself prunes to matching buckets — the brute-force
    full-scan disappears. Recall is tunable via (n_planes, bands); it is NOT
    1.0 — tests measure it against ``cosine_topk_to``.
    """
    assert n_planes % bands == 0
    bits_per_band = n_planes // bands
    mask = F.lit((1 << bits_per_band) - 1).cast("long")
    sigs = lsh_signatures(df, dim, n_planes, seed, vec_col, id_col)
    band_vals = F.array(
        *[
            F.shiftright(F.col("signature"), b * bits_per_band).bitwiseAND(mask)
            for b in range(bands)
        ]
    )
    bv = sigs.select(
        F.col(id_col).alias("id"), F.posexplode(band_vals).alias("band", "band_val")
    )
    qb = bv.filter(F.col("id") == query_id).select("band", "band_val")
    cand = (
        bv.join(F.broadcast(qb), ["band", "band_val"])
        .filter(F.col("id") != query_id)
        .select("id")
        .distinct()
    )
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qvec"))
    scored = (
        df.join(cand, df[id_col] == cand.id, "leftsemi")
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6).alias(
                "score"
            ),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
