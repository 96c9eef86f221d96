"""Dump `.explain("formatted")` for registry queries into
plans/<round>/<name>_<tag>.txt — the optimization round's evidence files.

Usage: python tools/dump_plans.py <tag> [name ...]
  tag: "before" or "after"; optional names restrict the set.
Env:
  PLANS_OUT   output dir (default /root/repo/plans/r13)
  PLANS_SF    data dir   (default /root/testdata/sf0.01)
  PLANS_REPO  repo root to import from (default: this script's parent)

Each query runs an action first (count) so AQE's final plan is captured
alongside the initial one in the formatted output.
"""

from __future__ import annotations

import os
import sys

REPO = os.environ.get(
    "PLANS_REPO", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

SF = os.environ.get("PLANS_SF", "/root/testdata/sf0.01")
OUT = os.environ.get("PLANS_OUT", "/root/repo/plans/r13")


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)

    from rdfproject_msc_spark.registry import REGISTRY
    from rdfproject_msc_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{tag}", cpus=8)
    for name, spec in REGISTRY.items():
        if not spec.headline or (only and name not in only):
            continue
        try:
            df = spec.fn(spark, SF)
            df.count()  # finalize the adaptive plan
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{OUT}/{name}_{tag}.txt", "w") as f:
                f.write(plan)
            print(f"ok   {name}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
