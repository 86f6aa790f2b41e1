"""Replay the driver's CORRECTNESS check locally under DRIVER-LIKE conditions.

The repo's get_spark() tunes the session (8g driver heap, UTC, AQE, Arrow);
the driver builds its own default session. Lesson 18a (NEXT.md): plan-growth
OOMs and conf-dependent behavior only show up in a DEFAULT session — so this
script deliberately builds a bare local[32] session (default 1g driver heap,
no repo confs beyond shuffle partitions, which the driver also sets) and runs
the first N rotation-ordered queries at sf0.01:

  - oracled queries  -> oracle.compare_query (row count + schema + value hash)
  - rows-only queries -> run + count (the driver's weaker rows-only check)

Usage: python scripts/driver_mirror.py [N] [sf_dir]
Exit code 0 only if every checked query passes.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("driver-mirror")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from k_means_map_reduce_spark.oracle import compare_query
    from k_means_map_reduce_spark.registry import ORACLES, QUERIES

    names = entry._ordered_names()[:n]
    n = len(names)  # requesting more than the registry holds reports actuals
    failures: list[str] = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            if name in ORACLES:
                r = compare_query(spark, name, sf_dir)
                ok, det = r.ok, r.detail
                rows = r.spark_rows
            else:
                rows = QUERIES[name](spark, sf_dir).count()
                ok, det = rows >= 0, "rows-only"
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            ok, det, rows = False, f"{type(exc).__name__}: {exc}", -1
        dt = time.perf_counter() - t0
        status = "ok" if ok else "FAIL"
        print(f"[{i + 1:2d}/{n}] {status:4s} {name} rows={rows} {dt:.1f}s {det if not ok else ''}", flush=True)
        if not ok:
            failures.append(name)

    print(f"\n{n - len(failures)}/{n} passed; failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
