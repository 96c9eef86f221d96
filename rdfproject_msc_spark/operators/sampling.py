"""Dataset partitioning for training pipelines: deterministic train/val/test
splits and stratified sampling.

A training-data pipeline needs split assignment that is (a) deterministic —
re-running the pipeline on the same corpus yields the same split, no RNG
state, no partition-order dependence; (b) stable under corpus growth — a
document's split never changes when other documents are added; (c) cheap —
a per-row hash, no shuffle at all.  Hashing the document id gives all
three; ``sampleBy``/``randomSplit`` give none (seed- and partition-order-
dependent).

Hash choice: md5 (via the nibble arithmetic of operators/dedup.py
``_md5_nibbles``) rather than xxhash64, because md5 behaves identically in
Spark and DuckDB, so every split/sample below has an EXACT SQL oracle twin
(xxhash64 exists only in Spark).  At 100 TB the md5-vs-xxhash64 cost
difference is real but small relative to the scan, and a pure-Spark
deployment can swap ``hash_bucket`` for xxhash64 without touching the
callers — the contract is just "uniform deterministic bucket".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# number of hash buckets for split assignment; weights quantize to 1/1000
N_BUCKETS = 1000


def hash_bucket(
    col: Column, n_buckets: int = N_BUCKETS, hex_start: int = 1
) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from md5 of the
    column's string form.  Six hex digits (24 bits) starting at
    ``hex_start`` — independent bucket streams use disjoint digit ranges
    of the same digest (split uses 1-6, sampling 7-12), so the split
    decision and the sample decision are statistically independent."""
    word = F.substring(F.md5(col.cast("string")), hex_start, 6)
    return (F.conv(word, 16, 10).cast("long") % n_buckets).cast("long")


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with the
    given weights (default 80/10/10 train/val/test).  Pure per-row
    projection: no shuffle, no state — the plan is a scan plus a codegen'd
    expression, so it composes with any downstream filter for free.

    Split names are assigned over contiguous bucket ranges in sorted-name
    order, so the mapping is reproducible from the weights alone."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    bucket = hash_bucket(F.col(id_col), hex_start=1)
    expr = None
    acc = 0.0
    # deterministic range layout: alphabetical split names
    for name in sorted(weights):
        acc += weights[name]
        hi = int(round(acc * N_BUCKETS))
        cond = bucket < F.lit(hi)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic training-mixture sampling: each source is kept at its
    configured rate, with rates > 1 UPSAMPLING by duplication — the epoch
    weighting used to mix corpus sources for LLM training (e.g. wiki ×2.5,
    web ×0.3). A ``copy`` column (0-based) distinguishes duplicates so
    downstream shuffling/packing treats them as distinct examples.

    rate = k + f (k integer, 0 ≤ f < 1) keeps ⌊rate⌋ full copies of every
    row and one more iff the row's hash falls under f — so the EXPECTED
    multiplicity is exactly the rate, per row, deterministically: the same
    document always gets the same multiplicity (stable under corpus
    growth, like the split/stratified ops — no RNG, no partition-order
    dependence). The fractional decision uses md5 digits 13-18, disjoint
    from the split (1-6) and stratified (7-12) streams, so mixing composes
    independently with both.

    Plan shape: one per-row codegen'd expression + an explode over a
    sequence of length ≤ ⌈max rate⌉ — zero shuffle, zero state; sources
    not in ``rates`` use ``default_rate``. The multiset the explode
    produces is the exact distributed form of the driver-side weighted
    concatenation a single-node pipeline would build."""
    for src, r in rates.items():
        if r < 0:
            raise ValueError(f"negative mixture rate for {src!r}: {r}")
    if default_rate < 0:
        raise ValueError(f"negative default mixture rate: {default_rate}")
    rate = F.lit(float(default_rate))
    for src in sorted(rates):
        rate = F.when(
            F.col(source_col) == F.lit(src), F.lit(float(rates[src]))
        ).otherwise(rate)
    frac_bucket = hash_bucket(
        F.col(id_col), n_buckets=N_BUCKETS, hex_start=13
    )
    # multiplicity = floor(rate) + (bucket < frac·N ? 1 : 0); quantized to
    # 1/N_BUCKETS like the split weights
    n_copies = (
        F.floor(rate)
        + (
            frac_bucket
            < F.round((rate - F.floor(rate)) * F.lit(N_BUCKETS))
        ).cast("long")
    ).cast("int")
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1))
        )
        .drop("__n_copies")
    )


def with_stratified_flag(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    flag_col: str = "sampled",
) -> DataFrame:
    """Flag a deterministic fixed-size sample per stratum: the
    ``n_per_stratum`` rows with the smallest (hash, id) key within each
    stratum.  Hash-ordering makes the sample uniform; the id tiebreak
    makes it total, so the flag is reproducible bit-for-bit.

    One hash-partition shuffle on the strata column; each stratum ranks in
    parallel (window per stratum, never a global sort).  Skewed strata
    hold the rank state of one partition only — at 100 TB the state per
    task is one counter, and AQE splits oversized strata partitions."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(id_col), n_buckets=1 << 24, hex_start=7),
        F.col(id_col),
    )
    return df.withColumn(
        flag_col, (F.row_number().over(w) <= n_per_stratum).cast("boolean")
    )


def temperature_rates(
    df: DataFrame,
    temperature: float,
    source_col: str = "source",
    total_rows: int | None = None,
) -> dict[str, float]:
    """Per-source mixture rates implementing multinomial TEMPERATURE
    sampling (the mT5 / GPT-3 domain-mixing rule): sample source i with
    probability p_i ∝ n_i^(1/T). T=1 reproduces natural proportions;
    T→∞ approaches uniform over sources; T<1 sharpens toward the largest
    source. The returned dict feeds ``mixture_sample`` directly —
    rate_i = p_i · total / n_i, so the EXPECTED output size is
    ``total_rows`` (default: the corpus size, i.e. pure reweighting)
    and small sources are upsampled by duplication, large ones
    downsampled, exactly as the epoch-weighting literature prescribes.

    The aggregation is one map-side-combined groupBy over the source
    column — the number of SOURCES is bounded (domains, not documents),
    so the collect is model-sized, like the Bloom/DSIR fits."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        return {}
    n_total = sum(counts.values())
    target = float(total_rows) if total_rows is not None else float(n_total)
    powered = {s: n ** (1.0 / temperature) for s, n in counts.items()}
    z = sum(powered.values())
    return {
        s: (powered[s] / z) * target / counts[s] for s in sorted(counts)
    }
