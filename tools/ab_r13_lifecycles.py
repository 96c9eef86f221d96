"""Interleaved A/B for the r13 lifecycle changes (encoded-relation
persist + pre-derived dictionary STR values).

Builds BOTH variants in one session over the same already-written NT
text: OLD = store over the lazy encoded relation + Dictionary without
sv_df; NEW = exactly what Engine.load_triples now does. Runs the bench
action (count) round-robin, reports per-variant minima.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from rdfproject_msc_spark.dictionary import Dictionary
    from rdfproject_msc_spark.engine import Engine
    from rdfproject_msc_spark.registry import REGISTRY
    from rdfproject_msc_spark.session import get_spark
    from rdfproject_msc_spark.sources.ntriples import ingest_ntriples
    from rdfproject_msc_spark.sparql.planner import sparql_to_df
    from rdfproject_msc_spark.store import TripleStore

    spark = get_spark(app_name="ab-r13", cpus=cpus)
    tag = os.path.basename(os.path.normpath(sf_dir))

    # ensure the NT/vorder text exists (registry fns write it)
    REGISTRY["rdf_ingest_nt"].fn(spark, sf_dir).count()
    REGISTRY["sparql_value_order"].fn(spark, sf_dir).count()

    vo_nt = os.path.join(tempfile.gettempdir(), "rdfproject_msc_vorder", tag, "nt")
    VO_Q = """SELECT ?s ?v WHERE {
                 { ?s <urn:acct> ?v . FILTER(?v * 2 >= 9000) }
                 UNION
                 { ?s <urn:label> ?v }
               } ORDER BY ?v ?s LIMIT 150"""

    # NEW: the engine as committed
    eng_new = Engine(spark).load_triples(vo_nt, fmt="nt", layout="sign_split")
    df_new = eng_new.sparql(VO_Q, decode=True)

    # OLD: lazy encoded relation, no sv cache (r12 shape)
    caches: list = []
    enc_old, dict_old = ingest_ntriples(spark, vo_nt, caches=caches)
    store_old = TripleStore(enc_old, layout="sign_split")
    store_old.register(spark, "table_old")
    d_old = Dictionary(dict_old, broadcast_hint=False)
    df_old = sparql_to_df(store_old, VO_Q, d_old, decode=True,
                          term_style="lexical")

    # same for rdf_ingest_nt's query
    nt_dir = os.path.join(tempfile.gettempdir(), "rdfproject_msc_nt", tag, "nt")
    neg = F.col("term").startswith("<urn:event_")

    def build_nt(engine):
        ids = engine.dictionary.encode_terms(
            ["<urn:placedBy>", "<urn:inNation>", "<urn:nation_7>"]
        )
        pos = engine.store.positive.alias("t0")
        pos2 = engine.store.positive.alias("t1")
        res = (
            pos.join(pos2, F.col("t0.o") == F.col("t1.s"))
            .where(
                (F.col("t0.p") == ids["<urn:placedBy>"])
                & (F.col("t1.p") == ids["<urn:inNation>"])
                & (F.col("t1.o") == ids["<urn:nation_7>"])
            )
            .select(F.col("t0.s").alias("order_id"), F.col("t0.o").alias("cust_id"))
        )
        dec = res.withColumn("order_term", F.col("order_id")).withColumn(
            "cust_term", F.col("cust_id")
        )
        return engine.dictionary.decode(dec, ["order_term", "cust_term"])

    eng_nt_new = Engine(spark).load_triples(
        nt_dir, fmt="nt", layout="sign_split", negative_when=neg,
        register_as="t_new",
    )
    nt_new = build_nt(eng_nt_new)

    caches2: list = []
    enc2, dict2 = ingest_ntriples(spark, nt_dir, negative_when=neg, caches=caches2)
    store2 = TripleStore(enc2, layout="sign_split")
    eng_nt_old = Engine(spark, store=store2,
                        dictionary=Dictionary(dict2, broadcast_hint=False))
    nt_old = build_nt(eng_nt_old)

    variants = {
        "vorder_old": df_old, "vorder_new": df_new,
        "ingest_old": nt_old, "ingest_new": nt_new,
    }
    for name, df in variants.items():  # warm-up x3
        for _ in range(3):
            df.count()
    best = {n: float("inf") for n in variants}
    for _ in range(7):
        for name, df in variants.items():
            t0 = time.perf_counter()
            df.count()
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, b in best.items():
        print(f"{name}: {b:.3f}s", flush=True)
    print(f"vorder speedup: {best['vorder_old']/best['vorder_new']:.2f}x")
    print(f"ingest speedup: {best['ingest_old']/best['ingest_new']:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
