"""Leakage-safe train/eval splitting.

A deterministic hash split (operators/sampling.with_split) fixes WHICH
documents land in val/test — but near-duplicates and heavily-overlapping
documents of those eval rows still land in train, and evaluating on
text the model trained on overstates quality (the train/eval analogue
of benchmark contamination). This operator quarantines them:

  1. zero-shuffle md5 split (train/val/test, reproducible from weights);
  2. n-gram overlap of every TRAIN document against the HELD-OUT
     documents' distinct n-gram set (operators/decontam machinery);
  3. train documents at/over the overlap threshold are re-labelled
     ``train_leaked`` — dropped from training by the downstream
     ``split = 'train'`` filter, kept in the output for audit.

Held-out splits are never modified: eval sets must stay fixed, and
removal is one-sided (leakage only inflates eval scores; dropping the
train copy costs a fraction of a percent of training data).

Scale note: unlike benchmark decontamination (eval sets are MBs →
broadcast), the holdout here is a constant FRACTION of the corpus, so
the n-gram match is a shuffle hash join (``broadcast_benchmark=False``)
— one extra ng-keyed shuffle of the train n-gram relation; the holdout
side is distinct per n-gram, so hot n-grams never multiply rows.

``bloom_fpp`` attacks exactly that shuffle: a Bloom filter over the
HOLDOUT n-grams (operators/bloom.py, bits capped by ``bloom_max_bits``
because the holdout population scales with the corpus — a saturated
filter degrades to more false positives, never to wrong results)
filters each train document's n-gram array scan-side, so the ng-keyed
exchange carries matches + the FP sliver instead of every train n-gram.
Results stay bit-identical (no false negatives; the exact join resolves
FPs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.decontam import ngram_contamination
from rdfproject_msc_spark.operators.sampling import with_split


def leakage_safe_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    n: int = 5,
    threshold: float = 0.5,
    bloom_fpp: float | None = None,
    bloom_max_bits: int = 1 << 23,
) -> DataFrame:
    """``docs`` + a ``split`` column in {train, train_leaked, val,
    test}: the hash split with train rows contaminating the held-out
    splits quarantined. Deterministic given ids, texts and weights."""
    s = with_split(docs, id_col=id_col, weights=weights)
    train = s.filter(F.col("split") == "train").select(id_col, text_col)
    holdout = s.filter(F.col("split") != "train").select(text_col)
    bf = None
    if bloom_fpp is not None:
        from rdfproject_msc_spark.operators import bloom as bloom_mod
        from rdfproject_msc_spark.operators.decontam import word_ngrams

        holdout_ng = holdout.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("ng")
        ).distinct()
        import math

        n_holdout = holdout_ng.count()
        bits, hashes = bloom_mod.optimal_geometry(n_holdout, bloom_fpp)
        if bits > bloom_max_bits:
            # capped: re-derive k for the REAL bits/element ratio (the
            # uncapped k would over-hash a denser filter)
            bits = bloom_max_bits
            hashes = max(
                1, round((bits / max(1, n_holdout)) * math.log(2))
            )
        bf = bloom_mod.bloom_build(
            holdout_ng, "ng", num_bits=bits, num_hashes=hashes
        )
    report = ngram_contamination(
        train,
        holdout,
        n=n,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        broadcast_benchmark=False,
        bloom_filter=bf,
    )
    leaked = report.filter(F.col("contaminated")).select(
        F.col(id_col), F.lit(True).alias("__leak")
    )
    return (
        s.join(leaked, id_col, "left")
        .withColumn(
            "split",
            F.when(F.col("__leak"), F.lit("train_leaked")).otherwise(
                F.col("split")
            ),
        )
        .drop("__leak")
    )
