"""Sinks (incl. bucketed no-shuffle joins), reference text formats, skew
mitigation equivalence."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from k_means_map_reduce_spark.operators.skew import salted_aggregate, salted_join_keys
from k_means_map_reduce_spark.plans import plan_report
from k_means_map_reduce_spark.sources import load_table
from k_means_map_reduce_spark.sources.points_txt import (
    read_centroids_txt,
    read_points_txt,
    write_centroids_txt,
)
from k_means_map_reduce_spark.sources.sinks import (
    write_bucketed,
    write_csv,
    write_orc,
    write_parquet,
    write_partitioned,
)

REFERENCE_POINTS = "/root/reference/Data/Input/points.txt"


def test_read_reference_points_file(spark):
    """The reference's own sample input parses N-dimensionally, unmutated."""
    if not os.path.exists(REFERENCE_POINTS):
        pytest.skip("reference sample not present")
    df = read_points_txt(spark, REFERENCE_POINTS)
    rows = df.collect()
    assert len(rows) == 20
    assert all(len(r["coordinates"]) == 2 for r in rows)
    assert all(
        all(c is not None for c in r["coordinates"]) for r in rows
    ), "separator variants must parse without mutating the file"


def test_points_txt_separator_variants(spark, tmp_path):
    p = tmp_path / "pts.txt"
    p.write_text("1,2\n3, 4\n 5 ,6.5 \n\n")
    rows = read_points_txt(spark, str(p)).collect()
    assert sorted(tuple(r["coordinates"]) for r in rows) == [
        (1.0, 2.0),
        (3.0, 4.0),
        (5.0, 6.5),
    ]


def test_centroids_txt_roundtrip(tmp_path):
    centers = [[1.5, -2.25], [0.0, 3.125]]
    path = str(tmp_path / "centroids.txt")
    write_centroids_txt(centers, path)
    assert read_centroids_txt(path) == centers
    # reference format: comma-joined coords, no ids (master.py:72-75)
    first = open(path).readline().strip()
    assert first == "1.5,-2.25"


def test_kmeans_end_to_end_reference_format(spark, tmp_path):
    """Full reference lifecycle: points.txt in → k-means → centroids.txt out."""
    from k_means_map_reduce_spark.kmeans import kmeans_native

    if not os.path.exists(REFERENCE_POINTS):
        pytest.skip("reference sample not present")
    pts = read_points_txt(spark, REFERENCE_POINTS)
    r = kmeans_native(pts, vec_col="coordinates", k=5, max_iter=10, tol=1e-6, seed=42)
    out = str(tmp_path / "centroids.txt")
    write_centroids_txt(r.centers, out)
    assert len(read_centroids_txt(out)) == 5


def test_cli_reference_invocation(spark, tmp_path):
    """The reference's documented run (`python master.py 3 2 5 10`,
    README.md:50-58) works verbatim against the Spark engine via
    `python -m k_means_map_reduce_spark 3 2 5 10 <points> <out>`: 5
    centroids in the reference's centroids.txt format, reducer count
    honored as the shuffle partitioning, session conf restored after."""
    from k_means_map_reduce_spark.__main__ import main

    if not os.path.exists(REFERENCE_POINTS):
        pytest.skip("reference sample not present")
    out = str(tmp_path / "centroids.txt")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    rc = main(["3", "2", "5", "10", REFERENCE_POINTS, out])
    assert rc == 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    centers = read_centroids_txt(out)
    assert len(centers) == 5
    assert all(len(c) == 2 and all(isinstance(x, float) for x in c) for c in centers)
    # bad usage fails fast without touching the filesystem
    assert main(["3", "2"]) == 2
    assert main(["3", "2", "x", "10"]) == 2
    assert main(["0", "2", "5", "10"]) == 2


def test_parquet_csv_roundtrip(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    pq = str(tmp_path / "nation_pq")
    cv = str(tmp_path / "nation_csv")
    write_parquet(n, pq)
    write_csv(n, cv)
    assert spark.read.parquet(pq).count() == 25
    back = spark.read.option("header", True).schema(n.schema).csv(cv)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in n.collect()
    )


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(o, path)
    back = spark.read.orc(path)
    assert back.count() == o.count()
    # ORC scans take predicate pushdown like parquet
    r = plan_report(back.where(F.col("o_orderkey") == 7))
    assert "orc" in r.text.lower()
    assert back.where(F.col("o_orderkey") == 7).count() == o.where(
        F.col("o_orderkey") == 7
    ).count()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    c = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_part")
    write_partitioned(c, path, ["c_mktsegment"])
    # partition dirs exist
    assert any(d.startswith("c_mktsegment=") for d in os.listdir(path))
    back = spark.read.parquet(path).where(F.col("c_mktsegment") == "BUILDING")
    r = plan_report(back)
    # pruned scan: only the BUILDING directory is in the location; check
    # partition filter is recognized
    assert "PartitionFilters" in r.text and "BUILDING" in r.text


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketed-by-key tables must sort-merge join with ZERO shuffle.

    Auto-broadcast is disabled for the check: at these test sizes Spark would
    otherwise broadcast (and skip bucketing entirely); the bucketed layout is
    for the 100 TB case where neither side broadcasts."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(l, "lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        r = plan_report(joined)
        assert r.sortmerge_joins >= 1, r.text
        assert "Exchange hashpartitioning" not in r.text, (
            "bucketed join should not shuffle:\n" + r.text
        )
        assert "Bucketed: true" in r.text, r.text
        plain = o.join(l, o.o_orderkey == l.l_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_salted_aggregate_equals_plain(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], r["mx"])
        for r in l.groupBy("l_returnflag")
        .agg(F.count("l_quantity").alias("n"), F.max("l_extendedprice").alias("mx"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["mx"])
        for r in salted_aggregate(
            l,
            ["l_returnflag"],
            {"n": ("l_quantity", "count"), "mx": ("l_extendedprice", "max")},
            n_salts=16,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = o.join(c, o.o_custkey == c.c_custkey).count()
    # salted_join_keys takes a single key name; o/c keys differ, so rename
    o2 = o.withColumnRenamed("o_custkey", "custkey")
    c2 = c.withColumnRenamed("c_custkey", "custkey")
    big, small, cond = salted_join_keys(o2, c2, "custkey", n_salts=4)
    salted = big.join(small, cond).count()
    assert salted == plain


def test_merge_upsert_parquet_roundtrip(spark, sf_dir, tmp_path):
    """MERGE semantics: updates win, unmatched rows survive, new keys
    append; the parquet swap leaves exactly the merged snapshot."""
    import pyspark.sql.functions as F

    from k_means_map_reduce_spark.sources import load_table
    from k_means_map_reduce_spark.sources.sinks import merge_upsert_parquet

    path = str(tmp_path / "cust")
    base = load_table(spark, sf_dir, "customer").limit(50)
    base.write.parquet(path)
    n0 = spark.read.parquet(path).count()
    keys = [r.c_custkey for r in base.select("c_custkey").orderBy("c_custkey").limit(3).collect()]
    updates = (
        base.where(F.col("c_custkey").isin(keys))
        .withColumn("c_acctbal", F.lit(-999.0))
        .unionByName(
            base.limit(1).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.col("c_name"),
                F.col("c_nationkey"),
                F.lit(123.0).alias("c_acctbal"),
                F.col("c_mktsegment"),
            )
        )
    )
    merge_upsert_parquet(spark, path, updates, ["c_custkey"])
    after = spark.read.parquet(path)
    assert after.count() == n0 + 1
    got = {r.c_custkey: r.c_acctbal for r in after.where(F.col("c_custkey").isin(keys)).collect()}
    assert all(v == -999.0 for v in got.values()) and len(got) == 3
    assert after.where(F.col("c_custkey") >= 10_000_000).count() == 1
    # idempotent re-merge: same updates applied twice = same snapshot
    merge_upsert_parquet(spark, path, updates, ["c_custkey"])
    assert spark.read.parquet(path).count() == n0 + 1


def test_merge_apply_parquet_full_merge(spark, sf_dir, tmp_path):
    """Three-clause MERGE: matched keys delete, matched keys update,
    unmatched keys insert — and with disjoint-key change batches the fold
    is replay-idempotent and order-insensitive (the at-least-once contract
    a foreachBatch sink needs)."""
    import pyspark.sql.functions as F

    from k_means_map_reduce_spark.sources import load_table
    from k_means_map_reduce_spark.sources.sinks import merge_apply_parquet

    base = (
        load_table(spark, sf_dir, "customer")
        .limit(40)
        .select("c_custkey", (F.round(F.col("c_acctbal") * 100, 0).cast("long")).alias("units"))
    )
    keys = sorted(r.c_custkey for r in base.select("c_custkey").collect())
    del_keys, upd_keys, ins_base = keys[:5], keys[5:10], keys[10:15]

    def batch(dk, uk, ik):
        dels = base.where(F.col("c_custkey").isin(dk)).select("c_custkey")
        ups = base.where(F.col("c_custkey").isin(uk)).select(
            "c_custkey", (F.col("units") + 7).alias("units")
        )
        ins = base.where(F.col("c_custkey").isin(ik)).select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
            F.lit(42).cast("long").alias("units"),
        )
        return ups.unionByName(ins), dels

    def run(order):
        path = str(tmp_path / f"serving_{order}")
        base.write.parquet(path)
        b1 = batch(del_keys[:3], upd_keys[:3], ins_base[:3])
        b2 = batch(del_keys[3:], upd_keys[3:], ins_base[3:])
        seq = [b1, b2] if order == "fwd" else [b2, b1]
        if order == "replay":
            seq = [b1, b1, b2]  # redelivered micro-batch
        for ups, dels in seq:
            merge_apply_parquet(spark, path, ups, dels, ["c_custkey"])
        return {
            (r.c_custkey, r.units)
            for r in spark.read.parquet(path).collect()
        }

    fwd = run("fwd")
    assert run("rev") == fwd and run("replay") == fwd
    got_keys = {k for k, _ in fwd}
    assert not (set(del_keys) & got_keys)
    assert {k + 10_000_000 for k in ins_base} <= got_keys
    base_units = {r.c_custkey: r.units for r in base.collect()}
    for k in upd_keys:
        assert (k, base_units[k] + 7) in fwd


def test_incremental_combine_late_data_refresh(spark):
    """A late batch touching one (day, user) must update exactly that row
    and leave every other state row byte-identical (the no-rewrite
    invariant the broadcast anti/semi split guarantees)."""
    from k_means_map_reduce_spark.operators.incremental import (
        _agg_batch,
        combine_additive,
    )

    base = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 10, 2.0), (2, "2024-01-01 11:00:00", 11, 3.0),
         (3, "2024-01-02 10:00:00", 10, 5.0)],
        "event_id LONG, ts STRING, user_id LONG, value DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    late = spark.createDataFrame(
        [(4, "2024-01-01 23:00:00", 10, 7.0)],
        "event_id LONG, ts STRING, user_id LONG, value DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    state0 = _agg_batch(base)
    state1 = combine_additive(state0, _agg_batch(late))
    rows = {(str(r["day"]), r["user_id"]): (float(r["sum_value"]), r["n_events"])
            for r in state1.collect()}
    assert rows[("2024-01-01", 10)] == (9.0, 2)      # updated: 2 + 7
    assert rows[("2024-01-01", 11)] == (3.0, 1)      # untouched
    assert rows[("2024-01-02", 10)] == (5.0, 1)      # untouched


def test_compact_files_reduces_count_preserves_rows(spark, sf_dir, tmp_path):
    from k_means_map_reduce_spark.sources.sinks import compact_files

    e = load_table(spark, sf_dir, "events")
    p = str(tmp_path / "frag")
    e.repartition(16).write.parquet(p)
    n = e.count()
    before, after = compact_files(spark, p, target_rows_per_file=n)
    assert before == 16 and after == 1
    assert spark.read.parquet(p).count() == n


def test_retention_sweep_drops_only_expired(spark, sf_dir, tmp_path):
    from k_means_map_reduce_spark.sources.sinks import retention_sweep

    e = load_table(spark, sf_dir, "events")
    p = str(tmp_path / "ret")
    e.write.parquet(p)
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    cutoff_ts = lo + (hi - lo) / 2
    want = e.where(F.col("ts") >= F.lit(cutoff_ts)).count()
    before, after = retention_sweep(spark, p, "ts", cutoff_ts)
    assert before == e.count() and after == want and 0 < after < before


def test_dynamic_partition_overwrite_backfill(spark, sf_dir, tmp_path):
    """Backfilling one broken day must rewrite ONLY that partition:
    dynamic partitionOverwriteMode replaces touched partitions and leaves
    the rest byte-identical (static mode would wipe the whole table)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts").cast("string")
    )
    p = str(tmp_path / "days")
    e.write.partitionBy("day").parquet(p)
    days = [r["day"] for r in e.select("day").distinct().collect()]
    target = sorted(days)[0]
    before_other = spark.read.parquet(p).where(F.col("day") != target).count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed = e.where(F.col("day") == target).withColumn(
            "value", F.col("value") * 0
        )
        fixed.write.mode("overwrite").partitionBy("day").parquet(p)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(p)
    assert back.where(F.col("day") != target).count() == before_other
    assert back.where((F.col("day") == target) & (F.col("value") != 0)).count() == 0
    assert back.count() == e.count()


def test_nested_schema_pruning(spark, sf_dir, tmp_path):
    """Selecting one struct field must prune the parquet read to that leaf
    (ReadSchema shows only meta.origin, not the whole struct)."""
    from k_means_map_reduce_spark.operators.multimodal import media_table

    p = str(tmp_path / "media")
    media_table(spark, sf_dir).write.parquet(p)
    df = spark.read.parquet(p).select("doc_id", F.col("meta.origin"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "origin" in rs[0] and "lang" not in rs[0], rs
