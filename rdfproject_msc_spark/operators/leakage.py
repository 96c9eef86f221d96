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
) -> DataFrame:
    """``docs`` + a ``split`` column in {train, train_leaked, val,
    test}: the hash split with train rows contaminating the held-out
    splits quarantined. Deterministic given ids, texts and weights."""
    s = with_split(docs, id_col=id_col, weights=weights)
    train = s.filter(F.col("split") == "train").select(id_col, text_col)
    holdout = s.filter(F.col("split") != "train").select(text_col)
    report = ngram_contamination(
        train,
        holdout,
        n=n,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        broadcast_benchmark=False,
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
