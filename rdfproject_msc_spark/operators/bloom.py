"""Broadcastable Bloom filter, built and probed entirely JVM-side.

The 100 TB membership problem: decontamination / blocklist / dedup-key
checks need "is this value in a bounded reference set?" against every row
of the corpus. A join answers it exactly but ships the corpus's key column
through an exchange (or at best builds a broadcast hash relation of the
whole reference set per executor). A Bloom filter answers "definitely not /
maybe" from a bit array whose size is chosen up front — kilobytes to a few
megabytes — and the probe is pure whole-stage-codegen arithmetic on the
scan, so the expensive exact join only runs over the survivors.

Design:
- Build: k = ``num_hashes`` positions per value via ``xxhash64(value, i)``
  mod ``num_bits``; positions fold into 64-bit words with ``shiftleft`` +
  ``bit_or`` aggregation keyed by word index. The shuffle is keyed on at
  most ``num_bits/64`` distinct word indexes (map-side combine collapses
  almost everything), and the driver collect is exactly the filter's own
  words — bounded by the CHOSEN filter size, never by the data.
- Probe: the word array is embedded as an array<bigint> literal, so
  ``might_contain`` is k conjuncts of (element_at & mask) != 0 — no join,
  no shuffle, no Python, usable inside higher-order-function lambdas
  (``F.filter(ngs, lambda g: bloom.might_contain(g))``) so an array can be
  pre-filtered BEFORE it is exploded.
- Zero false negatives by construction: probe and build evaluate the same
  expressions. False positives are resolved by the exact join that follows
  (the survivors), so composed results are bit-identical to the join-only
  plan. ~1% false positives at ~10 bits/element with k=5..7.
- Merge: two filters with identical (num_bits, num_hashes) OR together —
  per-shard partial filters union losslessly, the same incremental story
  as the HLL/bitmap sketches (operators/sketches.py).

Spark's own ``bloom_filter_agg``/``might_contain`` exist only as Scala/SQL
internals without a stable PySpark surface; this implementation keeps the
filter a plain, inspectable Python object (testable, persistable, version
independent) while every per-row operation stays codegen'd.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shiftleft(base: Column, amount: Column) -> Column:
    """``shiftleft`` with a per-row shift amount — the PySpark wrapper
    only takes a Python int, but the underlying SQL function shifts by a
    column just fine."""
    return F.call_function("shiftleft", base, amount.cast("int"))


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of a value — shared verbatim by build and probe
    (zero false negatives depends on this).

    Kirsch-Mitzenmacher double hashing: position_i = h1 + i·h2 (mod m)
    derives all k positions from TWO xxhash64 evaluations instead of k —
    the probe sits on the corpus scan's hot path, and per-value hash CPU
    is its entire cost (measured: k=7 independent hashes ≈ 2× the whole
    unfiltered explode). The FP guarantee is asymptotically unchanged
    (Kirsch & Mitzenmacher 2006); h2 is forced odd so strides cycle the
    full word space rather than degenerating on even moduli."""
    m = F.lit(num_bits)
    h1 = F.pmod(F.xxhash64(col), m)
    # reduced mod m BEFORE combining (ANSI mode forbids wrapping longs;
    # i·h2 with h2 < m and small i cannot overflow), forced odd
    h2 = F.pmod(F.xxhash64(col, F.lit(1)), m).bitwiseOR(F.lit(1).cast("long"))
    return [
        F.pmod(h1 + F.lit(i).cast("long") * h2, m)
        for i in range(num_hashes)
    ]


@dataclass(frozen=True)
class BloomFilter:
    """An immutable built filter: ``num_bits`` bits in ``num_bits/64``
    little-endian 64-bit words."""

    num_bits: int
    num_hashes: int
    words: tuple[int, ...]

    def might_contain(self, col: Column) -> Column:
        """True if ``col`` may be in the set (false ⇒ definitely absent).
        Pure column arithmetic over an array literal — safe in lambdas."""
        arr = F.lit(list(self.words))
        checks = []
        for pos in _positions(col, self.num_bits, self.num_hashes):
            word = F.get(arr, (pos / F.lit(64)).cast("int"))
            mask = _shiftleft(F.lit(1).cast("long"), pos % F.lit(64))
            checks.append(word.bitwiseAND(mask) != F.lit(0))
        return reduce(lambda a, b: a & b, checks)

    @property
    def saturation(self) -> float:
        """Fraction of set bits — the health metric (≳0.5 means the filter
        was sized too small for its population and FP rate degrades)."""
        set_bits = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in self.words)
        return set_bits / self.num_bits

    def union(self, other: "BloomFilter") -> "BloomFilter":
        """Lossless merge of two filters over the same (m, k) geometry —
        the partial-per-shard composition path."""
        if (self.num_bits, self.num_hashes) != (
            other.num_bits,
            other.num_hashes,
        ):
            raise ValueError(
                "cannot union Bloom filters with different geometry: "
                f"({self.num_bits}, {self.num_hashes}) vs "
                f"({other.num_bits}, {other.num_hashes})"
            )
        return BloomFilter(
            self.num_bits,
            self.num_hashes,
            tuple(a | b for a, b in zip(self.words, other.words)),
        )


def optimal_geometry(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2); m rounded up
    to a word multiple, both clamped to sane minimums."""
    n = max(1, expected_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round((m / n) * math.log(2)))
    return m, k


def bloom_build(
    df: DataFrame,
    col: str,
    *,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> BloomFilter:
    """Build a filter over every non-null value of ``df[col]``.

    One narrow projection (k positions per row, exploded), one word-keyed
    aggregation with map-side combine onto ≤ m/64 keys, one bounded
    collect. NULLs are skipped (SQL membership of NULL is not a question
    a bit can answer; callers filter nulls or handle them out of band).
    """
    num_bits = max(64, ((num_bits + 63) // 64) * 64)
    src = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    pos = src.select(
        F.explode(
            F.array(*_positions(F.col("__v"), num_bits, num_hashes))
        ).alias("pos")
    )
    agg = (
        pos.select(
            (F.col("pos") / F.lit(64)).cast("int").alias("w"),
            _shiftleft(
                F.lit(1).cast("long"), F.col("pos") % F.lit(64)
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for row in agg:
        words[row["w"]] = row["bits"]
    return BloomFilter(num_bits, num_hashes, tuple(words))
