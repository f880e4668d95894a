#!/usr/bin/env python3
"""Driver-gate rehearsal: run EVERY declared query under a VANILLA
SparkSession (no factory confs — exactly the environment a caller-provided
session gives us) and compare each against its DuckDB oracle at sf0.01.

This is the strictest pre-flight for the external correctness gate: it
catches session-dependency bugs (missing nanos-timestamp conf, timezone
drift, temp-view collisions, package-shipping assumptions) that the pytest
suite — which uses our own session factory — cannot see. Run:

    python tools/vanilla_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from oracle_utils import compare

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[8]")
             .appName("vanilla-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name in sorted(queries):
        try:
            if name not in oracles:
                # rows-only query (NON_SQL_QUERIES): the driver's weaker
                # check — must actually yield rows (a broken probe
                # returning 0 rows is a failure, round-5 ADVICE)
                n = queries[name](spark, sf_dir).count()
                ok, detail = n > 0, f"rows-only: {n} rows"
            else:
                ok, detail = compare(queries[name](spark, sf_dir),
                                     oracles[name], sf_dir, verbose=False)
            if not ok:
                failures.append((name, str(detail)[:200]))
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            failures.append((name, f"ERR {type(ex).__name__}: {str(ex)[:200]}"))
        print(("FAIL " if failures and failures[-1][0] == name else "ok   ")
              + name, flush=True)
    print(f"\nchecked {len(queries)}; failures: {len(failures)}")
    for name, detail in failures:
        print("FAIL", name, detail)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
