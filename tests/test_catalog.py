"""Loader invariants for the driver testdata catalog.

The driver regenerates /root/testdata between rounds and has already changed
the physical type of events.ts once (TIMESTAMP(NANOS) → TIMESTAMP_MICROS),
which silently scaled every timestamp 1000× under a hard-coded unit
assumption. These tests pin the loader's unit-sniffing behavior so any future
drift fails loudly instead of corrupting every time-windowed query.
"""

from __future__ import annotations

import datetime
import os

import pytest

from k_means_map_reduce_spark.sources.catalog import (
    TABLE_NAMES,
    _events_ts_unit,
    load_table,
)

from conftest import SF_DIR, SF_DIR_ORACLE


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_events_ts_epoch_sanity(spark, sf_dir):
    """min/max(ts) must be plausible modern dates.

    A wrong unit assumption scales timestamps by 1000× in one direction
    (2024 → 1970) or the other (2024 → year 56094); either trips this.
    """
    import pyspark.sql.functions as F

    row = (
        load_table(spark, sf_dir, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert row.lo is not None
    assert datetime.datetime(2000, 1, 1) <= row.lo, f"ts too small: {row.lo}"
    assert row.hi <= datetime.datetime(2100, 1, 1), f"ts too large: {row.hi}"


def test_events_ts_matches_pyarrow(spark, sf_dir):
    """The Spark-loaded wall-clock values must equal pyarrow's own read of
    the footer-declared type — unit-independent ground truth."""
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    path = os.path.join(sf_dir, "events.parquet")
    tbl = pq.read_table(path, columns=["event_id", "ts"])
    pdf = tbl.to_pandas().sort_values("event_id").head(50)
    got = {
        r.event_id: r.ts
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "ts")
        .orderBy("event_id")
        .limit(50)
        .collect()
    }
    for eid, expected in zip(pdf["event_id"], pdf["ts"]):
        exp = expected.to_pydatetime().replace(tzinfo=None)
        # floor to µs: parquet ns data truncates on load (DuckDB-compatible)
        exp = exp.replace(microsecond=exp.microsecond)
        assert got[int(eid)] == exp, (eid, got[int(eid)], exp)


def test_events_ts_unit_sniff(sf_dir):
    unit = _events_ts_unit(os.path.join(sf_dir, "events.parquet"))
    assert unit in ("s", "ms", "us", "ns", "int64")


def test_all_tables_load(spark, sf_dir):
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        assert df.limit(1).count() == 1, name
