"""Targeted parity check for named registry queries during development.

Runs each named query through oracle.compare_query (or rows-only count when
no oracle is registered) at one or more SF dirs, using the repo session.

Usage: python scripts/check_queries.py name [name ...] [--sf sf0.01,sf0.001]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sfs = ["sf0.01", "sf0.001"]
    if "--sf" in args:
        i = args.index("--sf")
        sfs = args[i + 1].split(",")
        del args[i : i + 2]
    names = args

    from k_means_map_reduce_spark.oracle import compare_query
    from k_means_map_reduce_spark.registry import ORACLES, QUERIES
    from k_means_map_reduce_spark.session import get_spark

    spark = get_spark("check-queries")
    spark.sparkContext.setLogLevel("ERROR")

    fails = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        for name in names:
            t0 = time.perf_counter()
            try:
                if name in ORACLES:
                    r = compare_query(spark, name, sf_dir)
                    ok, det, rows = r.ok, r.detail, r.spark_rows
                else:
                    rows = QUERIES[name](spark, sf_dir).count()
                    ok, det = rows >= 0, "rows-only"
            except Exception as exc:  # noqa: BLE001
                ok, det, rows = False, f"{type(exc).__name__}: {exc}", -1
            dt = time.perf_counter() - t0
            print(
                f"{'ok  ' if ok else 'FAIL'} {sf:8s} {name} rows={rows} "
                f"{dt:.1f}s {det if not ok else ''}",
                flush=True,
            )
            fails += 0 if ok else 1
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
