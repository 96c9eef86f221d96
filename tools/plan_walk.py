"""Walk an executed SparkPlan via py4j and count the operators that
actually re-execute per action: descends AdaptiveSparkPlan final plans
and QueryStage plans, but does NOT descend into InMemoryTableScan
relations (their inner plan ran once at cache materialization).

Usage: python tools/plan_walk.py <query> [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

REPO = os.environ.get(
    "PLANS_REPO", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)


def walk(node, counts, depth=0, lines=None):
    name = node.getClass().getSimpleName().replace("Exec", "")
    counts[name] += 1
    if lines is not None and depth < 60:
        lines.append("  " * depth + name)
    if name == "InMemoryTableScan":
        return  # cached: inner plan does not re-run per action
    if name == "AdaptiveSparkPlan":
        walk(node.executedPlan(), counts, depth + 1, lines)
        return
    if name.endswith("QueryStage"):
        walk(node.plan(), counts, depth + 1, lines)
        return
    if name == "ReusedExchange":
        return  # shared stage: built once elsewhere
    it = node.children().iterator()
    while it.hasNext():
        walk(it.next(), counts, depth + 1, lines)
    # subqueries (e.g. scalar subquery broadcasts) — count separately
    sq = node.subqueries().iterator()
    while sq.hasNext():
        counts["<subquery>"] += 1
        walk(sq.next(), counts, depth + 1, lines)


def analyze(df, label, dump_tree=False):
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    counts: Counter = Counter()
    lines: list | None = [] if dump_tree else None
    walk(plan, counts, 0, lines)
    print(f"== {label} ==")
    for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {v}")
    if lines is not None:
        print("\n".join(lines))
    return counts


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from rdfproject_msc_spark.registry import REGISTRY
    from rdfproject_msc_spark.session import get_spark

    spark = get_spark(app_name=f"walk-{name}", cpus=cpus)
    df = REGISTRY[name].fn(spark, sf_dir)
    analyze(df, name, dump_tree="--tree" in sys.argv)
    spark.stop()


if __name__ == "__main__":
    main()
