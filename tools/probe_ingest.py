"""Per-action probe for the ingest/lexical lifecycles (r13 item 3/4).

Builds one lifecycle query DataFrame the way bench.py does (fn once,
ingest caches warm after the first action), then times repeated
count() actions and dumps the EXECUTED plan (df.collect() first — a
count() drives a different QueryExecution), counting BroadcastExchange
vs ReusedExchange nodes in the final adaptive plan.

Usage: python tools/probe_ingest.py <query> [sf_dir] [cpus]
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from rdfproject_msc_spark.registry import REGISTRY
    from rdfproject_msc_spark.session import get_spark

    spark = get_spark(app_name=f"probe-{name}", cpus=cpus)
    spark.sparkContext.setJobDescription(f"probe: {name} build")
    t0 = time.perf_counter()
    df = REGISTRY[name].fn(spark, sf_dir)
    print(f"build: {time.perf_counter() - t0:.3f}s", flush=True)

    # warm-up x3 (bench methodology)
    for i in range(3):
        spark.sparkContext.setJobDescription(f"probe: {name} warm{i}")
        t0 = time.perf_counter()
        df.count()
        print(f"warm{i}: {time.perf_counter() - t0:.3f}s", flush=True)
    times = []
    for i in range(5):
        spark.sparkContext.setJobDescription(f"probe: {name} rep{i}")
        t0 = time.perf_counter()
        df.count()
        times.append(time.perf_counter() - t0)
    print(f"reps: {[round(t, 3) for t in times]} min={min(times):.3f}s",
          flush=True)

    # executed plan of the real result (collect, not count)
    spark.sparkContext.setJobDescription(f"probe: {name} collect-for-plan")
    df.collect()
    plan = str(df._jdf.queryExecution().executedPlan())
    out = f"/tmp/probe_{name}_executed.txt"
    with open(out, "w") as f:
        f.write(plan)
    for node in ("BroadcastExchange", "ReusedExchange", "BroadcastHashJoin",
                 "SortMergeJoin", "ShuffledHashJoin", "Exchange hash",
                 "Exchange range", "InMemoryTableScan", "AQEShuffleRead"):
        n = len(re.findall(re.escape(node), plan))
        print(f"  {node}: {n}", flush=True)
    print(f"executed plan -> {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
