"""Generate PLANS.md: physical-plan audit of the headline registry queries.

Runs each headline query at sf0.01 (action first, so AQE finalizes the
adaptive plan), then summarizes join strategies, shuffle counts, partition
pruning, pushed filters, and whole-stage-codegen spans.
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"

HEADER = """# PLANS — physical-plan audit of the headline queries

Auto-generated (tools/gen_plans.py) from the FINAL adaptive plan of each
headline query at sf0.01 (an action runs first so AQE's runtime re-planning
is reflected). What to look for: joins broadcast where a side is small,
filters reaching the Parquet scan (`pushed:`), sign routing as directory
pruning (`partition pruning:`), and shuffle counts that match each
operator's documented lower bound.
"""


def summarize(plan: str) -> list[str]:
    # formatted explain = operator tree, then per-operator detail blocks;
    # count operators from the TREE only (details repeat the names)
    tree = plan.split("\n\n")[0].split("== Initial Plan ==")[0]
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)",
        tree,
    )
    exch = len(re.findall(r"[+\-:\s]Exchange \(\d+\)", tree))  # not BroadcastExchange
    pf = [p for p in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if p.strip()]
    pushed = [
        " ".join(p.split())[:120]
        for p in re.findall(r"PushedFilters: \[([^\]\n]*)", plan)
        if any(k in p for k in ("EqualTo", "GreaterThan", "LessThan"))
    ]
    wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
    out = []
    jc = Counter(joins)
    if jc:
        out.append("joins: " + ", ".join(f"{k}×{v}" for k, v in sorted(jc.items())))
    out.append(f"shuffles: {exch}")
    if pf:
        out.append(
            "partition pruning: "
            + "; ".join(sorted({re.sub(r"#\d+", "", p) for p in pf})[:2])
        )
    if pushed:
        out.append("pushed: " + "; ".join(sorted(set(pushed))[:3]))
    out.append(f"codegen stages: {wsc}")
    return out


def main() -> None:
    from rdfproject_msc_spark.registry import REGISTRY
    from rdfproject_msc_spark.session import get_spark

    spark = get_spark(app_name="gen-plans", cpus=8)
    lines = [HEADER]
    for name, spec in REGISTRY.items():
        if not spec.headline:
            continue
        df = spec.fn(spark, SF)
        df.collect()  # execute THIS plan so AQE finalizes it
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines.append(f"## {name}")
        lines.extend(f"- {s}" for s in summarize(plan))
        lines.append("")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
