"""Corpus curation: the composed training-data pipeline, end to end.

This is the operator a 100 TB pre-training corpus actually runs nightly —
the individual stages (exact dedup, near-dup removal, quality scoring,
token budgeting) composed into ONE lazy DataFrame plan, so Catalyst
optimizes across stage boundaries (e.g. the quality-filter predicate
prunes documents before the near-dup join sees them when legal).

Pipeline (each stage is the already-oracle-checked operator):
1. exact dedup        keep min-id per distinct text (dedup.exact_dedup)
2. near-dup removal   MinHash-LSH pairs at a Jaccard threshold; the HIGHER
                      id of every verified pair is dropped (deterministic
                      canonical choice; transitive chains collapse to the
                      min id because pairs are emitted for every qualifying
                      edge, not just a spanning set)
3. quality filter     textstats quality_score ≥ min_quality
4. budget accounting  corpus stats: surviving docs, BPE-ish token total
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import dedup, textstats


def curate(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float = 0.5,
    min_quality: float = 0.3,
    min_partitions: int | None = None,
) -> DataFrame:
    """Surviving documents with quality + token columns attached."""
    uniq = dedup.exact_dedup(df, content_col, id_col)
    # Pushdown BARRIER (r13): `uniq` feeds two consumers — the LSH pair
    # generation and the anti-join/stats tail. The quality filter applied
    # to survivors is a pure function of the content column (a grouping
    # key), so Catalyst pushes it below the dedup aggregate all the way to
    # the scan — but only on the stats consumer, which breaks subtree
    # equality with the LSH consumer: the corpus was SCANNED AND
    # DEDUP-AGGREGATED TWICE (2 FileScans, 2 text-keyed exchanges in the
    # executed plan). The LSH side must see every uniq row regardless, so
    # sharing one scan + one text-keyed exchange strictly beats the early
    # filter at any scale. A one-element explode is row-preserving and
    # blocks predicate pushdown (predicates referencing generator output
    # cannot cross Generate) — same no-pushable-predicate device as
    # dedup._lsh_band_rows' band wrap.
    uniq = uniq.select(
        F.explode(F.array(F.struct(*uniq.columns))).alias("__row")
    ).select("__row.*")
    pairs = dedup.minhash_lsh_pairs(
        uniq,
        content_col,
        id_col,
        threshold=near_dup_threshold,
        min_partitions=min_partitions,
    )
    # drop the higher id of every near-dup pair (left-anti join on id_b);
    # id_a < id_b always, so the minimum of each near-dup cluster survives
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = uniq.join(drops, id_col, "left_anti")
    scored = textstats.with_text_stats(kept, content_col)
    survivors = scored.filter(F.col("quality_score") >= min_quality)
    return textstats.with_token_counts(survivors, content_col)


def curate_stats(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float = 0.5,
    min_quality: float = 0.3,
    min_partitions: int | None = None,
) -> DataFrame:
    """One-row corpus budget: surviving docs, chars, BPE-ish tokens."""
    # the stats read nothing but (id, content) — project the other
    # columns away BEFORE the dedup stages so (a) they never ride the
    # two text-keyed exchanges (guide §2.3) and (b) exact_dedup's
    # survivor aggregate takes its plain-min HashAggregate fast path
    # instead of a struct-buffered SortAggregate (r13)
    survivors = curate(
        df.select(id_col, content_col),
        content_col, id_col, near_dup_threshold, min_quality, min_partitions
    )
    return survivors.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(F.col(content_col)).cast("long")).alias("total_chars"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
    )


def curate_full(
    df: DataFrame,
    benchmark: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float = 0.5,
    min_quality: float = 0.3,
    max_top_bigram_frac: float = 0.5,
    max_dup_trigram_frac: float = 0.5,
    decontam_n: int = 5,
    decontam_threshold: float = 0.5,
    max_bits_per_token: float = 20.0,
    embed_dim: int = 64,
    min_partitions: int | None = None,
) -> DataFrame:
    """The COMPLETE curation pipeline — every stage the engine ships,
    composed into one lazy plan:

      clean (normalize + PII-redact) → exact dedup → near-dup removal →
      quality filter → repetition filter (Gopher signals) → benchmark
      decontamination → unigram-LM surprisal filter → hashed-TF
      vectorization

    Output: surviving documents with their quality/repetition/surprisal
    columns and a ready-for-ANN ``embedding`` column. Stage order follows
    production practice: cheap per-row filters run before the join-heavy
    dedup stages they shrink, decontamination runs on the deduplicated
    corpus (one representative per near-dup cluster — its contamination
    verdict covers the cluster), and the LM vocabulary is fit on the
    ALREADY-cleaned corpus so boilerplate does not distort the model.
    """
    from rdfproject_msc_spark.operators import (
        decontam,
        hashvec,
        lmscore,
        textclean,
    )

    cleaned = textclean.with_clean_text(df, content_col).withColumn(
        content_col, F.col("text_clean")
    )
    survivors = curate(
        cleaned, content_col, id_col, near_dup_threshold, min_quality,
        min_partitions,
    )
    rep = textstats.with_repetition_stats(survivors, content_col).filter(
        (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_trigram_frac") <= max_dup_trigram_frac)
    )
    cont = decontam.ngram_contamination(
        rep,
        benchmark,
        n=decontam_n,
        threshold=decontam_threshold,
        id_col=id_col,
        text_col=content_col,
    )
    clean_ids = cont.filter(~F.col("contaminated")).select(id_col)
    decontaminated = rep.join(clean_ids, id_col, "left_semi")
    vocab = lmscore.unigram_vocab(decontaminated, text_col=content_col)
    scored = decontaminated.join(
        lmscore.doc_lm_score(
            decontaminated, vocab, id_col=id_col, text_col=content_col
        ).select(id_col, "bits_per_token"),
        id_col,
    ).filter(F.col("bits_per_token") <= max_bits_per_token)
    return scored.join(
        hashvec.hash_embed(
            scored, dim=embed_dim, text_col=content_col, id_col=id_col
        ),
        id_col,
    )


def prepare_training_set(
    df: DataFrame,
    benchmark: DataFrame,
    mixture_rates: dict[str, float] | None = None,
    max_tokens: int = 512,
    overlap: int = 0,
    pack_budget: int = 2048,
    content_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    **curate_kw,
) -> DataFrame:
    """The LAST MILE: documents → packed training sequences, one lazy plan.

    curate_full (clean → dedup → quality → repetition → decontaminate →
    LM filter) → mixture_sample (per-source epoch weights, upsampling by
    duplication) → chunk_documents (overlapping token windows) →
    pack_documents (budget-sized packs via the distributed prefix sum,
    ordered by the compound (doc, copy, chunk) key so packs are
    deterministic and upsampled copies pack as distinct examples).

    Output: one row per training example —
    (doc_id, copy, chunk_id, chunk, n_tokens, pack_id).

    Every stage is the already-pinned operator; this function only
    composes them, so the 100 TB properties (bounded shuffle keys, no
    all-pairs, bounded single-partition stages) are inherited, not
    re-argued."""
    from rdfproject_msc_spark.operators.chunking import chunk_documents
    from rdfproject_msc_spark.operators.packing import pack_documents
    from rdfproject_msc_spark.operators.sampling import mixture_sample

    curated = curate_full(
        df, benchmark, content_col=content_col, id_col=id_col, **curate_kw
    )
    mixed = (
        mixture_sample(
            curated, mixture_rates, source_col=source_col, id_col=id_col
        )
        if mixture_rates
        else curated.withColumn("copy", F.lit(0))
    )
    chunks = chunk_documents(
        mixed,
        max_tokens=max_tokens,
        overlap=overlap,
        content_col=content_col,
        id_col=id_col,
        carry_cols=("copy",),
    )
    return pack_documents(
        chunks,
        token_col="n_tokens",
        budget=pack_budget,
        id_col=id_col,
        order_cols=[id_col, "copy", "chunk_id"],
    )
