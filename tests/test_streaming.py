"""M4: stream ≡ batch over identical input (availableNow drain)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_map_reduce_spark.registry import QUERIES
from k_means_map_reduce_spark.sources import load_table
from k_means_map_reduce_spark.streaming import (
    stream_sessionization,
    stream_tumbling_hourly,
    stream_user_running_stats,
)


def _as_sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark, sf_dir):
    batch = QUERIES["events_tumbling_hourly"](spark, sf_dir)
    stream = stream_tumbling_hourly(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _as_sorted_rows(stream, cols) == _as_sorted_rows(batch, cols)


def test_sessionization_stream_equals_batch(spark, sf_dir):
    batch = QUERIES["events_session_windows"](spark, sf_dir)
    stream = stream_sessionization(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events"]
    assert _as_sorted_rows(stream, cols) == _as_sorted_rows(batch, cols)


def test_stateful_user_stats_matches_batch_agg(spark, sf_dir):
    stream = stream_user_running_stats(spark, sf_dir)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )
    )
    s = {r["user_id"]: (r["n_events"], round(r["max_value"], 9)) for r in stream.collect()}
    b = {r["user_id"]: (r["n_events"], round(r["max_value"], 9)) for r in batch.collect()}
    assert s == b


def test_sliding_stream_equals_batch(spark, sf_dir):
    from k_means_map_reduce_spark.streaming.jobs import stream_sliding_windows

    batch = QUERIES["events_sliding_1h_30m"](spark, sf_dir)
    stream = stream_sliding_windows(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _as_sorted_rows(stream, cols) == _as_sorted_rows(batch, cols)


def test_stream_static_join(spark, sf_dir):
    from k_means_map_reduce_spark.streaming.jobs import (
        stream_static_join_enriched_counts,
    )

    out = stream_static_join_enriched_counts(spark, sf_dir)
    rows = {r["event_type"]: (r["n_events"], r["weighted_events"]) for r in out.collect()}
    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    weights = {"view": 1, "click": 2, "signup": 5, "purchase": 10, "error": 0}
    for et, n in batch.items():
        assert rows[et] == (n, n * weights[et])


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from k_means_map_reduce_spark.streaming.jobs import (
        batch_view_click_join,
        stream_stream_view_click_join,
    )

    stream = stream_stream_view_click_join(spark, sf_dir)
    batch = batch_view_click_join(spark, sf_dir)
    # Compare on ids (the ts columns differ only in type: stream=UTC instant,
    # batch=NTZ wall clock — same values under the UTC test session).
    cols = ["view_id", "click_id", "user_id"]
    assert _as_sorted_rows(stream, cols) == _as_sorted_rows(batch, cols)
    assert stream.count() > 0


def test_stream_dedup_equals_batch_distinct(spark, sf_dir):
    from k_means_map_reduce_spark.streaming.jobs import stream_dedup_user_event_types

    stream = stream_dedup_user_event_types(spark, sf_dir)
    batch = (
        load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    )
    cols = ["user_id", "event_type"]
    assert _as_sorted_rows(stream, cols) == _as_sorted_rows(batch, cols)


def test_jsonl_stream_equals_parquet_stream_and_batch(spark, oracle_sf_dir):
    """The JSONL (Kafka-shaped) source must yield the exact same hourly
    aggregation as the parquet stream and the batch query: format on the
    wire must not leak into results (timestamp round-trip through ISO
    strings at µs precision included)."""
    from k_means_map_reduce_spark.registry import QUERIES
    from k_means_map_reduce_spark.streaming.jobs import stream_tumbling_hourly_jsonl

    def key(rows):
        return {
            (r["window_start"], r["event_type"]): (
                r["n_events"],
                round(r["sum_value"], 6),
                r["approx_users"],
            )
            for r in rows
        }

    from k_means_map_reduce_spark.streaming.jobs import stream_tumbling_hourly

    jsonl = key(stream_tumbling_hourly_jsonl(spark, oracle_sf_dir).collect())
    parquet_stream = key(stream_tumbling_hourly(spark, oracle_sf_dir).collect())
    assert jsonl == parquet_stream
    # and the exact (non-approx) columns must also match the batch query
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in QUERIES["events_tumbling_hourly"](spark, oracle_sf_dir).collect()
    }
    assert {k: v[:2] for k, v in jsonl.items()} == batch


def test_checkpointed_file_sink_is_exactly_once_across_restarts(spark, oracle_sf_dir, tmp_path):
    """Restarting a checkpointed stream must not duplicate output, and new
    source files must be picked up incrementally — the exactly-once file
    sink contract a production pipeline relies on. Three runs over the same
    checkpoint: (1) drain the initial source files, (2) restart with no new
    data → zero new rows, (3) restart after a new file lands → exactly its
    rows appended."""
    import os

    from pyspark.sql import functions as F
    from k_means_map_reduce_spark.sources import load_table

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ev = load_table(spark, oracle_sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    first = ev.where(F.col("event_id") % 3 != 0)
    first.coalesce(2).write.mode("append").parquet(src)

    def drain():
        q = (
            spark.readStream.schema(
                "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
            )
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    n_first = first.count()
    assert drain().count() == n_first
    # restart, no new data: the checkpoint must prevent any reprocessing
    assert drain().count() == n_first
    # a late file lands; only its rows may appear
    late = ev.where(F.col("event_id") % 3 == 0)
    late.coalesce(1).write.mode("append").parquet(src)
    got = drain()
    assert got.count() == n_first + late.count()
    assert got.select(F.count_distinct("event_id")).collect()[0][0] == ev.count()


def test_tws_registers_everywhere_and_matches_batch(spark, sf_dir):
    """The tws twin registers UNCONDITIONALLY (round-3 verdict: an
    environment-conditional registry makes the driver rotation differ
    between containers). Where google.protobuf is absent
    (transformWithStateInPandas's state-server client needs
    StateMessage_pb2) the query runs the documented
    applyInPandasWithState fallback; either path must match the plain
    batch aggregation oracle."""
    from k_means_map_reduce_spark.oracle import compare_query
    from k_means_map_reduce_spark.registry import QUERIES

    assert "streaming_user_stats_tws_vs_batch" in QUERIES
    r = compare_query(spark, "streaming_user_stats_tws_vs_batch", sf_dir)
    assert r.ok, r.detail


def test_publish_state_atomic_swap_and_epoch_marker(spark, tmp_path):
    """_publish_state must (a) leave state_path a symlink that always
    resolves to a complete state version, (b) stamp the applied epoch
    inside the version so marker and data swap together, (c) drop the
    superseded version dir."""
    import os

    from k_means_map_reduce_spark.streaming.jobs import (
        _publish_state,
        _state_epoch,
    )

    state = str(tmp_path / "state")
    assert _state_epoch(state) == -1
    _publish_state(spark.range(3).toDF("x"), state, 0)
    assert os.path.islink(state) and _state_epoch(state) == 0
    v0 = os.path.realpath(state)
    _publish_state(spark.read.parquet(state).withColumn("y", F.lit(1)), state, 1)
    assert _state_epoch(state) == 1
    assert spark.read.parquet(state).count() == 3
    assert not os.path.isdir(v0), "superseded version must be removed"


def test_cms_stream_replayed_epoch_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an epoch into the CMS
    state must NOT double-count (addition is not idempotent — the state's
    epoch marker makes the replay a no-op). Round-3 advisor finding."""
    from k_means_map_reduce_spark.streaming.jobs import (
        _publish_state,
        _state_epoch,
    )

    state = str(tmp_path / "state")
    delta = spark.createDataFrame([(0, 7, 2), (1, 3, 5)], "j INT, bucket INT, c LONG")

    def refresh(bdf, epoch_id):
        # the exact guard+merge shape stream_cms_heavy_hitters uses
        if epoch_id <= _state_epoch(state):
            return
        import os

        if os.path.isdir(state):
            merged = (
                spark.read.parquet(state)
                .unionByName(bdf)
                .groupBy("j", "bucket")
                .agg(F.sum("c").cast("long").alias("c"))
            )
        else:
            merged = bdf
        _publish_state(merged, state, epoch_id)

    refresh(delta, 0)
    refresh(delta, 0)  # replayed epoch: must be skipped
    refresh(delta, 1)  # genuinely new epoch: folds in
    got = {(r.j, r.bucket): r.c for r in spark.read.parquet(state).collect()}
    assert got == {(0, 7): 4, (1, 3): 10}


def test_streaming_kmv_absorbs_replay_without_epoch_skip(spark, sf_dir):
    """The KMV lattice merge (k smallest of the union) is idempotent, so a
    replayed batch leaves the sketch unchanged even WITHOUT the epoch
    guard — the property the query's docstring claims."""
    from pyspark.sql import Window as W

    from k_means_map_reduce_spark.operators.sketches import _KMV_K

    hv = F.abs(F.xxhash64(F.col("user_id").cast("string"), F.lit(42)))
    base = (
        load_table(spark, sf_dir, "events")
        .select(F.lit("all").alias("event_type"), hv.alias("hv"))
        .distinct()
    )
    w = W.partitionBy("event_type").orderBy("hv")
    topk = lambda df: (  # noqa: E731
        df.distinct()
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KMV_K)
        .select("event_type", "hv")
    )
    once = topk(base)
    replayed = topk(once.unionByName(once))
    assert sorted(r.hv for r in once.collect()) == sorted(
        r.hv for r in replayed.collect()
    )


def test_left_outer_join_stream_flushes_all_unmatched_views(spark, sf_dir):
    """The r13 left-outer twin: the matched subset must equal the inner
    interval-join twin exactly, every view must appear (outer totality —
    the horizon batch flushed ALL unmatched views, the property the twin
    exists to prove), unmatched rows must be NULL-padded, and no sentinel
    (user_id < 0) may leak."""
    from k_means_map_reduce_spark.registry import QUERIES
    from k_means_map_reduce_spark.sources import load_table

    out = QUERIES["streaming_left_outer_join_vs_batch"](spark, sf_dir)
    rows = out.collect()
    assert all(r["user_id"] >= 0 for r in rows)
    matched = {(r["view_id"], r["click_id"]) for r in rows if r["click_id"] is not None}
    inner = QUERIES["streaming_interval_join_vs_batch"](spark, sf_dir)
    inner_pairs = {(r["view_id"], r["click_id"]) for r in inner.collect()}
    assert matched == inner_pairs
    for r in rows:
        if r["click_id"] is None:
            assert r["click_ts"] is None
    n_views = (
        load_table(spark, sf_dir, "events")
        .where("event_type = 'view'")
        .count()
    )
    assert len({r["view_id"] for r in rows}) == n_views


def test_full_outer_join_stream_completes_both_outer_sets(spark, sf_dir):
    """The r13 full-outer twin: its matched + view-outer rows must equal
    the left-outer twin exactly, every click must appear (click-side
    outer totality — the symmetric property the full-outer mode adds),
    and no sentinel may leak."""
    from k_means_map_reduce_spark.registry import QUERIES
    from k_means_map_reduce_spark.sources import load_table

    rows = QUERIES["streaming_full_outer_join_vs_batch"](spark, sf_dir).collect()
    assert all(r["user_id"] >= 0 for r in rows)
    left = QUERIES["streaming_left_outer_join_vs_batch"](spark, sf_dir).collect()
    full_left_part = sorted(
        (r["view_id"], r["click_id"]) for r in rows if r["view_id"] is not None
    )
    assert full_left_part == sorted((r["view_id"], r["click_id"]) for r in left)
    click_ids = {r["click_id"] for r in rows if r["click_id"] is not None}
    n_clicks = (
        load_table(spark, sf_dir, "events")
        .where("event_type = 'click'")
        .count()
    )
    assert len(click_ids) == n_clicks
    for r in rows:
        if r["view_id"] is None:
            assert r["view_ts"] is None and r["click_id"] is not None
