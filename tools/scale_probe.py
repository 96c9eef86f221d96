"""Two-scale probe for the RDF + dedup families: generate a local sf1
(10× sf0.1) dataset and measure wall time at both scales, checking the
physical plan SHAPE (exchange/scan counts) stays identical — i.e. the
pruning and join strategies that make the 100 TB story hold do not
degrade when the data grows 10×.

The driver's testdata stops at sf0.1 (~600k table rows); everything above
is plan-audit extrapolation. This script closes that gap one decade: if
wall time grows ≤ linearly while the plan is unchanged, the scaling claim
is measured, not argued.

Generation: each table is replicated `factor`× with key-shifted copies
(FK consistency preserved: order/customer/event references shift
together; nation/region dims stay fixed, as they would at any scale).
Document texts get a per-copy suffix token so near-duplicate structure
stays near-dup instead of collapsing into exact 10-way clusters.

Usage:
    python tools/scale_probe.py [--factor 10] [--out /tmp/spark_graft_sf1]
Prints one JSON line:
    {"sf_small": ..., "sf_big": ..., "factor": N,
     "queries": {name: {"small_sec": s, "big_sec": s, "ratio": r,
                        "plan_equal": bool}}}
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

from pyspark.sql import functions as F

FAMILY = [
    # RDF family: derived triple store, 2-hop joins, SPARQL front-end
    "rdf_path_2hop",
    "rdf_path_2hop_all",
    "sparql_2hop",
    "sparql_nested",
    "sparql_compat",
    "sparql_subquery",
    # dedup family: exact + MinHash-LSH + SimHash over documents
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    # similarity family: brute-force cosine + banded LSH ANN
    "knn_cosine",
    "ann_lsh_topk",
    # named graphs: quad-relation scans + same-graph join keys
    "sparql_graph",
    # lexical value semantics (r10): dictionary-side STR derivation +
    # typed numeric values over a raw-ingested store
    "sparql_lexical_str",
    # §15.1 value ordering + cmp value routing (r11): per-key term
    # attach + TakeOrderedAndProject over a raw-ingested store
    "sparql_value_order",
    # text/retrieval family (r6): BM25's two-full-scan zero-shuffle
    # design, decontamination's broadcast n-grams + one corpus shuffle,
    # and the 4-stage curation composition — the shapes whose scale
    # story is the most scan-volume-bound
    "bm25_search",
    "text_decontaminate",
    "corpus_curate",
    # r7: dictionary-side accessor joins (LANG/DATATYPE over |dict|
    # terms), the one-shuffle n-gram aggregation, salted quota sampling
    # under a hot source, and the typed-value comparison + cast ordering
    "sparql_lang",
    "text_ngram_top",
    "docs_quota_sample",
    "sparql_value_cmp",
    "passage_dedup",
    # r8: SemDeDup — the within-cluster quadratic must stay bounded by
    # cluster size (plan shape: cluster-keyed self-join, no cartesian)
    "semantic_dedup",
    # r8: Bloom pre-filtered decontamination (the explode feeds only
    # bloom survivors — must track text_decontaminate's shape with a
    # smaller join input) and bitmap distinct reach (state bounded by
    # occupied buckets, two map-side-combined aggs)
    "bloom_decontam",
    "events_user_reach",
    # r8: model-based quality scoring — hash_embed's two keyed aggs plus
    # a statically-expanded 64-term dot product (scan-CPU-bound; must
    # stay Python-free and shuffle-count-stable)
    "quality_model_filter",
    # r8: DSIR — bounded log-ratio model broadcast to the scoring join;
    # the corpus-side exchange is ONLY the doc-keyed sum (near-linear
    # scan-bound fit is expected; the plan shape must not change)
    "dsir_weights",
    # r9: raw-RDF first mile — text write + parse + distributed dictionary
    # build (two-phase rank) + 3-join encode + query + decode; inherently
    # ≈linear in corpus size (every stage is scan- or shuffle-bound on the
    # full input), the check is that the plan shape holds and nothing
    # driver-side appears as terms grow 10×
    "rdf_ingest_nt",
    "rdf_ingest_rdfxml",
]

def _passage_dedup_k32(spark, sf_dir):
    """passage_dedup at a REALISTIC span length (r8): Lee et al. dedup
    ~50-token spans, not 3-word ones. k=32 flips the shuffle-bytes
    trade-off — chunk count per doc drops ~10×, passage strings grow
    ~10× — so the scale row measures the shape users actually run."""
    from rdfproject_msc_spark.operators.passages import passage_dedup
    from rdfproject_msc_spark.registry import load_table

    return passage_dedup(load_table(spark, sf_dir, "documents"), k=32)


def _semantic_dedup_kscaled(spark, sf_dir):
    """SemDeDup's DEFAULT call (r9): no k, no centroids — auto_k derives
    k ≈ N/625 and the deterministic IVF quantizer trains, so this row
    measures exactly what a user gets out of the box, kmeans included.
    Cluster sizes — and the within-cluster Σcᵢ² — stay constant per unit
    of data. The registry row keeps k=8 fixed (oracle-replicable), which
    the probe shows goes quadratic; THIS row is the at-scale default."""
    from rdfproject_msc_spark.operators.semdedup import semantic_dedup
    from rdfproject_msc_spark.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, dim=64, threshold=0.35).select(
        "vec_id", "cluster"
    )


def _leakage_split(spark, sf_dir):
    """The ≈linear-by-construction shuffle-join shape (SCALE.md r7 row):
    both sides of the n-gram join grow with the corpus."""
    from rdfproject_msc_spark.operators.leakage import leakage_safe_split
    from rdfproject_msc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return leakage_safe_split(docs.repartition(64), n=5)


def _leakage_split_bloom(spark, sf_dir):
    """The same split with the r8 Bloom pre-filter: the train-side
    n-gram exchange carries matches + the FP sliver instead of every
    train n-gram — the regime the Bloom filter exists for (contrast
    bloom_decontam, whose join was already broadcast)."""
    from rdfproject_msc_spark.operators.leakage import leakage_safe_split
    from rdfproject_msc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return leakage_safe_split(docs.repartition(64), n=5, bloom_fpp=0.01)


# parameter variants probed alongside the registry entries
def _select_budget(spark, sf_dir):
    """Budgeted selection (r8): global (score DESC, id) prefix sum via
    range partitioning + the two-phase pattern — the shape that must
    NOT collapse to a single-partition window as the corpus grows."""
    from rdfproject_msc_spark.operators.classify import REFERENCE_MODEL
    from rdfproject_msc_spark.operators.selection import (
        select_quality_budget,
    )
    from rdfproject_msc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents").repartition(64)
    return select_quality_budget(docs, REFERENCE_MODEL, budget=100_000)


def _neardup_probe_persisted(spark, sf_dir):
    """Persisted MinHash index probe (r8): the index over the held 2/3 of
    the corpus is built ONCE per scale (inside this constructor, outside
    the timed evaluations); the measured plan is the delivery's banded
    join against the stored bands + stored-shingle verify — the
    steady-state cost of the incremental ingest loop."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from rdfproject_msc_spark.operators import dedup
    from rdfproject_msc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    held = docs.filter(F.col("doc_id") % 3 != 1)
    delivery = docs.filter(F.col("doc_id") % 3 == 1)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_graft_mh_index_{tag}"
    mp = spark.sparkContext.defaultParallelism
    if not os.path.exists(os.path.join(path, "_meta")):
        dedup.minhash_write(held, path, min_partitions=mp)
    return dedup.minhash_join_persisted(
        delivery, path, threshold=0.5, min_partitions=mp
    )


def _trig_ingest(spark, sf_dir):
    """TriG first mile (r10): graph blocks over the per-file Turtle
    parse unit — the probe writes ~32 TriG documents whose statements
    split between the default graph and per-nation named-graph blocks,
    and measures parse + shared quad-encode (encode_quad_relation: one
    dictionary over every term incl. graph labels + two encodes). Same
    scaling lever as turtle_ingest: file COUNT drives parse
    parallelism; the encode joins are the shared NT machinery."""
    import os as _os
    import tempfile as _tf

    from rdfproject_msc_spark.registry import load_table
    from rdfproject_msc_spark.sources.turtle import ingest_trig

    tag = _os.path.basename(_os.path.normpath(sf_dir))
    base = _os.path.join(_tf.gettempdir(), "rdfproject_msc_trig_probe", tag)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    s = lambda c: F.col(c).cast("string")  # noqa: E731
    lines = (
        orders.select(
            F.concat(
                F.lit("<urn:order_"), s("o_orderkey"),
                F.lit("> <urn:placedBy> <urn:customer_"), s("o_custkey"),
                F.lit("> ."),
            ).alias("value")
        )
        .unionAll(customer.select(
            F.concat(
                F.lit("<urn:g_nation_"), s("c_nationkey"),
                F.lit("> { <urn:customer_"), s("c_custkey"),
                F.lit("> <urn:inNation> <urn:nation_"), s("c_nationkey"),
                F.lit("> . }"),
            ).alias("value")
        ))
    )
    lines.repartition(32).write.mode("overwrite").text(base)
    triples, quads, d = ingest_trig(spark, base)
    return triples.groupBy("p").count().unionAll(
        quads.groupBy("g").count()
    )


def _tokenize_vocab(spark, sf_dir):
    """Trained-vocab tokenization (r9): the fit is one token-keyed agg +
    bounded top-V; the apply is posexplode → broadcast vocab join → one
    doc-keyed reassembly shuffle. Both sides scale with the corpus scan;
    the vocab stays model-sized, so the join must remain broadcast at
    both scales."""
    from rdfproject_msc_spark.operators.tokenize import (
        fit_vocab,
        tokenize_ids_vocab,
    )
    from rdfproject_msc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return tokenize_ids_vocab(docs, fit_vocab(docs, vocab_size=32_768))


def _turtle_ingest(spark, sf_dir):
    """Turtle first mile (r9): the parse unit is the FILE (statements
    span lines, directives are document state), so the probe writes the
    derived graph as ~32 Turtle documents and measures the per-file
    mapInPandas parse + dictionary build + encode. The scaling lever is
    file COUNT (more files = more parallel parse tasks); per-file text
    grows with the corpus, both scales keep the same plan shape."""
    import os as _os
    import tempfile as _tf

    from rdfproject_msc_spark.registry import load_table
    from rdfproject_msc_spark.sources.turtle import ingest_turtle

    tag = _os.path.basename(_os.path.normpath(sf_dir))
    base = _os.path.join(_tf.gettempdir(), "rdfproject_msc_ttl_probe", tag)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    s = lambda c: F.col(c).cast("string")  # noqa: E731
    lines = (
        orders.select(
            F.concat(
                F.lit("<urn:order_"), s("o_orderkey"),
                F.lit("> <urn:placedBy> <urn:customer_"), s("o_custkey"),
                F.lit("> ; <urn:hasPriority> \""), F.col("o_orderpriority"),
                F.lit("\" ."),
            ).alias("value")
        )
        .unionAll(customer.select(
            F.concat(
                F.lit("<urn:customer_"), s("c_custkey"),
                F.lit("> <urn:inNation> <urn:nation_"), s("c_nationkey"),
                F.lit("> ."),
            ).alias("value")
        ))
    )
    lines.repartition(32).write.mode("overwrite").text(base)
    enc, d = ingest_turtle(spark, base)
    return enc.groupBy("p").count()


def _rdfs_materialize(spark, sf_dir):
    """RDFS materialization (r9) over the derived corpus + a synthetic
    ontology: schema closures are ontology-sized (fixed at ANY corpus
    scale), instance rules are broadcast joins, the corpus pays one
    distinct — the probe measures that single data-sized stage."""
    from rdfproject_msc_spark.operators.rdfs import rdfs_closure
    from rdfproject_msc_spark.sources.derived import (
        P_BY_USER,
        P_HAS_TYPE,
        P_IN_NATION,
        P_IN_REGION,
        P_LINKED_EVENT,
        P_PLACED_BY,
        triples_df,
    )

    TYPE, SCO, SPO, DOM, RNG = 901, 902, 903, 904, 905
    schema = [
        (P_PLACED_BY, SPO, P_LINKED_EVENT),   # placedBy ⊑ linkedEvent
        (P_IN_NATION, SPO, P_IN_REGION),      # inNation ⊑ inRegion
        (P_BY_USER, DOM, 950),                # dom(byUser) = Event
        (P_BY_USER, RNG, 951),                # rng(byUser) = User
        (950, SCO, 952), (952, SCO, 953),     # Event ⊑ Act ⊑ Thing
        (P_HAS_TYPE, SPO, TYPE),              # hasType ⊑ rdf:type
    ]
    triples = triples_df(spark, sf_dir).unionAll(
        spark.createDataFrame(schema, "s long, p long, o long")
    )
    vocab = {
        "type": TYPE, "subclassof": SCO, "subpropertyof": SPO,
        "domain": DOM, "range": RNG,
    }
    return rdfs_closure(triples, vocab)


EXTRAS = {
    "rdfs_materialize": _rdfs_materialize,
    "turtle_ingest": _turtle_ingest,
    "trig_ingest": _trig_ingest,
    "tokenize_vocab": _tokenize_vocab,
    "neardup_probe_persisted": _neardup_probe_persisted,
    "passage_dedup_k32": _passage_dedup_k32,
    "semantic_dedup_kscaled": _semantic_dedup_kscaled,
    "leakage_split": _leakage_split,
    "leakage_split_bloom": _leakage_split_bloom,
    "select_budget": _select_budget,
}

TABLES = [
    "customer",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
    "nation",
    "region",
]
# table -> (shifted key or None, shifted FK or None, FK's referenced table)
KEYED = {
    "customer": ("c_custkey", None, None),
    "orders": ("o_orderkey", "o_custkey", "customer"),
    # lineitem's composite key (l_orderkey, l_linenumber) stays unique when
    # l_orderkey shifts with the orders copies (r13, for the skew/TPCH rows)
    "lineitem": (None, "l_orderkey", "orders"),
    "events": ("event_id", "user_id", "customer"),
    "documents": ("doc_id", None, None),
    "embeddings": ("vec_id", None, None),
}


def generate(spark, src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    strides: dict[str, int] = {}
    for t in TABLES:
        df = spark.read.parquet(os.path.join(src, t + ".parquet"))
        if t not in KEYED:  # dimension tables stay fixed at any scale
            df.write.mode("overwrite").parquet(os.path.join(out, t + ".parquet"))
            continue
        key, fk, ref = KEYED[t]
        copies = spark.range(factor).select(F.col("id").alias("__copy"))
        big = df.crossJoin(copies)
        if key is not None:
            stride = df.agg(F.max(key)).first()[0] + 1
            strides[t] = stride
            big = big.withColumn(
                key, F.col(key) + F.col("__copy") * F.lit(stride)
            )
        if fk is not None:  # shift FK with the referenced table's copies
            big = big.withColumn(
                fk, F.col(fk) + F.col("__copy") * F.lit(strides[ref])
            )
        if t == "documents":
            big = big.withColumn(
                "text",
                F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.col("text"),
                        F.lit(" cvar"),
                        F.col("__copy").cast("string"),
                    )
                ),
            )
        big.drop("__copy").write.mode("overwrite").parquet(
            os.path.join(out, t + ".parquet")
        )


def _plan_shape(df) -> tuple[str, str]:
    """Two fingerprints of the FINAL adaptive plan:
    - pruning: scan count + how many scans carry pushed filters — the
      scale-survival property (filters reaching parquet) that must NOT
      change with data volume;
    - strategy: join/aggregate operator tallies — ALLOWED to change
      across scales (AQE re-costs broadcast vs sort-merge as sides grow;
      that is the adaptive behavior working, reported but not failed).
    Row-count-dependent details (sizes, partition counts, AQE coalesce
    numbers) are excluded from both."""
    df.collect()  # execute THIS plan so AQE finalizes it (count() would
    # drive a different QueryExecution and leave df's plan pre-adaptive)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = len(re.findall(r"\bFileScan\b", plan))
    pushed = len(
        [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()]
    )
    pruning = f"scans={scans} pushed={pushed}"
    ops = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"HashAggregate|ObjectHashAggregate|TakeOrderedAndProject)\b",
        plan,
    )
    tally: dict[str, int] = {}
    for op in ops:
        tally[op] = tally.get(op, 0) + 1
    return pruning, json.dumps(tally, sort_keys=True)


def _evaluate(df) -> None:
    """Force FULL evaluation: a noop-format write materializes every
    output column. count() — the harness action through r7 — let
    Catalyst prune projection-only work entirely (quality_model_filter
    'scaled' 0.75× at 10× because the 64-term dot product was never
    evaluated; leakage_safe_split's flagged-join stage collapsed the
    same way), quietly flattering exactly the scan-CPU-bound shapes the
    probe exists to stress."""
    df.write.format("noop").mode("overwrite").save()


def _time_best(df, reps: int = 3) -> float:
    _evaluate(df)  # warm-up: analysis + codegen + page cache
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _evaluate(df)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--skip-generate", action="store_true")
    ap.add_argument(
        "--cpus", type=int, default=0,
        help="local[N] core count (0 = all cores) — the r13 data-bound "
        "core-scaling probe runs the same big fixture at 8 vs 32",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated subset of FAMILY/EXTRAS names to probe",
    )
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rdfproject_msc_spark.registry import REGISTRY
    from rdfproject_msc_spark.session import get_spark

    spark = get_spark(
        app_name="scale_probe", cpus=args.cpus or os.cpu_count() or 8
    )
    if not args.skip_generate:
        print(f"generating {args.factor}x into {args.out} ...", file=sys.stderr)
        generate(spark, args.src, args.out, args.factor)

    results: dict[str, dict] = {}
    names = list(FAMILY) + list(EXTRAS)
    if args.only:
        names = [n for n in args.only.split(",") if n]
    skipped = []
    for name in names:
        if name not in EXTRAS and name not in REGISTRY:
            # registry slots rotate (demoted entries move to the pytest
            # oracle suite) — skip rather than KeyError on a stale name
            print(f"skip {name}: not in REGISTRY/EXTRAS", file=sys.stderr)
            skipped.append(name)
            continue
        fn = EXTRAS[name] if name in EXTRAS else REGISTRY[name].fn
        small_df = fn(spark, args.src)
        big_df = fn(spark, args.out)
        prune_s, strat_s = _plan_shape(small_df)
        prune_b, strat_b = _plan_shape(big_df)
        t_small = _time_best(small_df)
        t_big = _time_best(big_df)
        results[name] = {
            "small_sec": round(t_small, 3),
            "big_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "pruning_equal": prune_s == prune_b,
            "strategy_equal": strat_s == strat_b,
            "strategy_small": json.loads(strat_s),
            "strategy_big": json.loads(strat_b),
        }
        print(
            f"  {name}: {t_small:.3f}s -> {t_big:.3f}s "
            f"(x{t_big / t_small:.2f}, pruning_equal={prune_s == prune_b}, "
            f"strategy_equal={strat_s == strat_b})",
            file=sys.stderr,
        )
        # the derived-triples cache is per (spark, sf_dir) pair; clear
        # between queries so one family member's cache does not hide
        # another's scan cost
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "sf_small": args.src,
                "sf_big": args.out,
                "factor": args.factor,
                "queries": results,
                "skipped": skipped,
            }
        )
    )
    spark.stop()
    if skipped:
        print(f"WARNING: {len(skipped)} requested name(s) skipped: {skipped}",
              file=sys.stderr)
    if not results:
        # an --only list of typos must not exit 0 having probed nothing
        sys.exit(2)


if __name__ == "__main__":
    main()
