"""Attribute rdf_ingest_nt's per-action cost to its sub-plans (r13).

Reproduces the lifecycle exactly as registry.rdf_ingest_nt, warms the
ingest caches, then noop-times each sub-plan (guide §1.4) and two
variants:
  A  positive-side scan (3 encode joins over the cached parsed/dict)
  B  the 2-hop self-join (2x encode subtree + join)
  C  full query (B + 2 decode joins)         == what bench times
  D  full query with the ENCODED relation persisted (upper bound)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def noop_time(spark, df, label, reps=5):
    spark.sparkContext.setJobDescription(label)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: min={min(ts):.3f}s reps={[round(t,3) for t in ts]}",
          flush=True)
    return min(ts)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from rdfproject_msc_spark.registry import REGISTRY
    from rdfproject_msc_spark.session import get_spark

    spark = get_spark(app_name="probe-nt-parts", cpus=cpus)

    # build the lifecycle via the registry fn ONCE (writes the NT text,
    # builds caches); then re-create the engine pieces for sub-plans
    import os
    import tempfile

    from rdfproject_msc_spark.engine import Engine

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(tempfile.gettempdir(), "rdfproject_msc_nt", tag)
    df_full = REGISTRY["rdf_ingest_nt"].fn(spark, sf_dir)
    df_full.count()  # warm caches
    df_full.count()

    eng = Engine(spark).load_triples(
        os.path.join(base, "nt"), fmt="nt", layout="sign_split",
        negative_when=F.col("term").startswith("<urn:event_"),
    )
    ids = eng.dictionary.encode_terms(
        ["<urn:placedBy>", "<urn:inNation>", "<urn:nation_7>"]
    )
    eng.store.positive.count()  # warm this engine's own caches

    pos = eng.store.positive
    noop_time(spark, pos, "A: positive (3 encode joins)")

    res = eng.sql(
        f"""SELECT t0.s AS order_id, t0.o AS cust_id
            FROM Positive t0 INNER JOIN Positive t1 ON t0.o = t1.s
            WHERE t0.p = {ids['<urn:placedBy>']}
              AND t1.p = {ids['<urn:inNation>']}
              AND t1.o = {ids['<urn:nation_7>']}"""
    )
    noop_time(spark, res, "B: 2-hop join")

    decorated = res.withColumn("order_term", F.col("order_id")).withColumn(
        "cust_term", F.col("cust_id")
    )
    full = eng.dictionary.decode(decorated, ["order_term", "cust_term"])
    noop_time(spark, full, "C: full (B + 2 decode joins)")

    # D: persist the encoded relation, rebuild the same query over it
    enc = eng.store.df.persist()
    enc.count()
    from rdfproject_msc_spark.store import TripleStore

    store2 = TripleStore(enc, layout="sign_split")
    store2.register(spark, "table")
    res2 = eng.sql(
        f"""SELECT t0.s AS order_id, t0.o AS cust_id
            FROM Positive t0 INNER JOIN Positive t1 ON t0.o = t1.s
            WHERE t0.p = {ids['<urn:placedBy>']}
              AND t1.p = {ids['<urn:inNation>']}
              AND t1.o = {ids['<urn:nation_7>']}"""
    )
    dec2 = res2.withColumn("order_term", F.col("order_id")).withColumn(
        "cust_term", F.col("cust_id")
    )
    full2 = eng.dictionary.decode(dec2, ["order_term", "cust_term"])
    noop_time(spark, full2, "D: full over persisted encoded relation")

    # E: dictionary pre-shrunk per encode column? No — instead measure
    # ONE encode join alone to size the per-join cost.
    parsed = spark.createDataFrame([], "s_term string, p_term string, o_term string")
    d = eng.dictionary.df
    one = (
        eng._ingest_caches[0]
        .join(d.select(F.col("id").alias("s"), F.col("term").alias("s_term")),
              "s_term", "inner")
    )
    noop_time(spark, one, "E: ONE encode join (parsed x dict)")

    spark.stop()


if __name__ == "__main__":
    main()
