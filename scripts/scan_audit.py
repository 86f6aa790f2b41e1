#!/usr/bin/env python
"""Repeated-scan audit: for every bench query, count physical FileScans per
table in the executed plan and flag tables scanned >= 2 times.

This mechanizes lesson 15's symptom (NEXT.md): a derived frame consumed by
two plan branches re-runs its whole subtree unless persisted — differing
output projections defeat ReusedExchange, so the fact is scanned (and the
expensive rollup recomputed) once per consumer. Found this way in round 8:
ds_q64 (2.42->0.76s), stats_kendall_tau_brand (1.09->0.56s),
training_dsir_importance_weights (1.22->0.65s).

Interpretation guide — a flag is NOT automatically a defect:
- InMemoryTableScan > 0: the persisted plan EMBEDS its child FileScan text,
  inflating the count; the data is served from cache.
- Identical-SQL twins (events_funnel_*) deliberately share oracle SQL and
  pay narrow re-scans to keep the cross-engine text identical.
- Different SHAPES of the same table (a rollup + the raw fact, ds_q72) are
  two genuine but irreducible scans.
Chase a flag only when the repeated subtree is an EXPENSIVE derived frame
(rollup, explode, tokenize) with InMemoryTableScan == 0.

Run from the repo root: python scripts/scan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("scan-audit")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__  # noqa: F401 — registers queries
    from bench import ADDITIONS, HEADLINE
    from k_means_map_reduce_spark.registry import QUERIES

    errors = 0
    for name in HEADLINE + ADDITIONS:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, keep auditing
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            errors += 1
            continue
        scans = re.findall(
            r"FileScan parquet \[[^\]]*\][^\n]*?(\w+)\.parquet", plan
        )
        multi = {t: n for t, n in Counter(scans).items() if n >= 2}
        if multi:
            ims = plan.count("InMemoryTableScan")
            reuse = plan.count("ReusedExchange")
            marker = "  <-- inspect" if ims == 0 and reuse == 0 else ""
            print(
                f"{name}: {multi} (InMemoryTableScan={ims}, "
                f"ReusedExchange={reuse}){marker}"
            )
    print(f"audit complete ({errors} queries errored)" if errors else "audit complete")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
