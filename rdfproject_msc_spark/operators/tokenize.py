"""Hash-vocab tokenization: text → the ``array<int>`` token-id sequences a
trainer actually consumes.

A real deployment plugs a trained BPE/SentencePiece vocabulary in here; this
operator provides the Spark-side contract with a DETERMINISTIC, vocab-free
stand-in — the same decision as the multimodal decoders (real plumbing,
stubbed model): pre-tokenize with the engine's BPE-ish regex
(textstats.BPE_ISH_PATTERN, the one token_count_bpe budgets with, so counts
and ids agree by construction), then map each pre-token to a fixed id range
via md5 bucketing. Swapping in a real vocabulary changes ONE expression
(the token→id map becomes a broadcast join against the vocab table); every
downstream shape — special tokens, truncation, padding, packing — is
unchanged.

Id space: 0..N_SPECIAL-1 reserved (PAD=0, BOS=1, EOS=2, UNK=3 — UNK unused
by the hash map, reserved for the vocab-table variant), content ids in
[N_SPECIAL, vocab_size).

100 TB design: pure per-row array expressions (regexp_extract_all +
transform + md5 arithmetic) — whole-stage codegen, zero shuffle, no
Python; md5 nibble hashing keeps the DuckDB twin exact like every other
sampling/bucketing operator in the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.sampling import hash_bucket
from rdfproject_msc_spark.operators.textstats import BPE_ISH_PATTERN

PAD_ID, BOS_ID, EOS_ID, UNK_ID = 0, 1, 2, 3
N_SPECIAL = 4


def token_ids(col: Column, vocab_size: int = 32_768) -> Column:
    """array<int> of hash-vocab ids for a text column (no specials)."""
    if vocab_size <= N_SPECIAL:
        raise ValueError(f"vocab_size must exceed {N_SPECIAL}, got {vocab_size}")
    toks = F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)
    return F.transform(
        toks,
        lambda t: (
            hash_bucket(t, n_buckets=vocab_size - N_SPECIAL)
            + F.lit(N_SPECIAL)
        ).cast("int"),
    )


def tokenize_ids(
    df: DataFrame,
    vocab_size: int = 32_768,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_len: int | None = None,
    add_special: bool = True,
    pad_to_max: bool = False,
) -> DataFrame:
    """(id_col, input_ids, n_tokens) — the training-sequence projection.

    ``add_special`` wraps BOS … EOS (counted in ``max_len``'s budget:
    content truncates to max_len − 2 first, the trainer convention).
    ``pad_to_max`` right-pads with PAD to exactly max_len — fixed-shape
    batches for frameworks that want them; length-bucketed batching
    (operators/batching.py) is the padding-minimizing alternative.
    NULL text tokenizes like empty text (BOS EOS only / empty array)."""
    c = F.coalesce(F.col(content_col), F.lit(""))
    ids = token_ids(c, vocab_size)
    if max_len is not None:
        budget = max_len - (2 if add_special else 0)
        if budget < 0:
            raise ValueError(f"max_len={max_len} cannot fit special tokens")
        ids = F.slice(ids, 1, budget)
    if add_special:
        ids = F.concat(
            F.array(F.lit(BOS_ID).cast("int")),
            ids,
            F.array(F.lit(EOS_ID).cast("int")),
        )
    n = F.size(ids)
    if pad_to_max:
        if max_len is None:
            raise ValueError("pad_to_max requires max_len")
        ids = F.concat(
            ids,
            F.array_repeat(
                F.lit(PAD_ID).cast("int"), F.lit(max_len) - n
            ),
        )
    return df.select(
        F.col(id_col),
        ids.alias("input_ids"),
        n.cast("long").alias("n_tokens"),
    )
