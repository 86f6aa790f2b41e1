"""Fault-tolerance parity (SURVEY.md §2a ops #18-#19).

The reference simulates a 20% task failure rate and hand-rolls detect +
restart (/root/reference/mapper.py:52-55, master.py:161-235). On Spark that
machinery is the scheduler's task retry — these tests inject a real task
failure and assert the job still produces the correct result, with zero
engine code.

Runs in a subprocess with its own JVM: retries need `local[N, maxFailures]`
(the shared test session's plain local[*] means maxFailures=1), and a
SparkContext is one-per-JVM.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4, 3]")  # up to 3 attempts per task
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("fault-tolerance-probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def flaky(batches):
    # Fail the whole task on its first attempt for partition 0 — a real
    # executor-side exception, like the reference's simulated FAILURE status
    # (mapper.py:52-55), but recovered by Spark's task retry instead of
    # hand-rolled monitor/restart threads (master.py:161-235).
    from pyspark import TaskContext
    tc = TaskContext.get()
    if tc.partitionId() == 0 and tc.attemptNumber() == 0:
        raise RuntimeError("injected task failure (first attempt)")
    for b in batches:
        yield b

df = spark.range(0, 1000, 1, 4).withColumn("v", F.col("id") * 2)
out = df.mapInPandas(flaky, "id long, v long")
total = out.agg(F.sum("v").alias("s")).collect()[0]["s"]
assert total == 999 * 1000, total
n = out.count()
assert n == 1000, n
print("RETRY_OK", total, n)
"""


def test_task_retry_recovers_injected_failure():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY_OK 999000 1000" in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
