"""Driver-contract sweep: bare SparkSession + __spark_entry__ vs DuckDB at
sf0.01, mirroring the external driver's t2 gate (type-strict since round 3).

Usage: python tools/verify_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from tests.oracle import _normalize, declared_type_mismatches, duck_connect

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import __spark_entry__ as E

    t0 = time.time()
    n = E.entry(spark).count()
    print(f"entry(): {n} rows in {time.time() - t0:.1f}s", flush=True)

    con = duck_connect(SF_DIR)
    oracles = E.oracle_sql()
    failures = []
    for name, fn in E.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {exc}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only {len(s_rows)} ({time.time() - t0:.1f}s)", flush=True)
            continue
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error {exc}", flush=True)
            continue
        if sorted(s_cols) != sorted(o_cols):
            failures.append(name)
            print(f"FAIL {name}: cols {sorted(s_cols)} vs {sorted(o_cols)}", flush=True)
        elif len(s_rows) != len(o_rows):
            failures.append(name)
            print(f"FAIL {name}: rows {len(s_rows)} vs {len(o_rows)}", flush=True)
        elif _normalize(s_rows, s_cols) != _normalize(o_rows, o_cols):
            failures.append(name)
            print(f"FAIL {name}: value/type hash mismatch", flush=True)
        elif drift := declared_type_mismatches(df.schema, con, sql):
            failures.append(name)
            print(f"FAIL {name}: declared type drift {drift}", flush=True)
        else:
            print(f"ok   {name}: {len(s_rows)} rows ({time.time() - t0:.1f}s)", flush=True)

    print(f"\n{len(failures)} failures: {failures}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
