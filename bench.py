"""Action-timed benchmark harness (fixes the reference's flaw of timing
``sql()`` parse/analyze instead of execution — SURVEY.md §6,
PartitionQueryingSubject.java:128-133 vs :153).

Runs the headline registry queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; each query is timed around a real action
(count of the materialized result) after one warm-up run. Prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    # best-of-5: in a 19-query single-JVM run, JIT/GC noise occasionally
    # inflates one query's all-3 reps (observed 1.4s → 2.4s on dedup_simhash);
    # two extra reps cost ~7s total and pin the steady-state number.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    from rdfproject_msc_spark.registry import REGISTRY
    from rdfproject_msc_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)

    names = [n for n, s in REGISTRY.items() if s.headline]
    timings: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        try:
            # Build the DataFrame once: we measure ENGINE execution (scan,
            # shuffle, join, agg — what dominates at scale), not Python-side
            # plan reconstruction + re-analysis + codegen compile, which is
            # a per-query constant. No caching: every count() re-executes
            # the full physical plan.
            df = spec.fn(spark, sf_dir)
            # warm-up ×3: analysis + codegen compile + page cache + C2 JIT
            # of the interpreted expression paths (HOF-heavy queries early
            # in the JVM lifetime need >1 run to reach steady state —
            # knn_cosine as the first query measured 0.30s after one
            # warm-up vs 0.21s steady)
            for _ in range(3):
                df.count()
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                df.count()  # count() forces full execution
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
            print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)
        except Exception as e:  # one broken query must not kill the run
            print(f"  {name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(v for v in timings.values() if v >= 0), 4)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
