"""DQ battery + snapshot diff: triage semantics beyond the oracle hash."""

from __future__ import annotations

from k_means_map_reduce_spark.registry import QUERIES


def test_dq_checks_clean_dataset(spark, sf_dir):
    """The driver testdata is referentially clean — every check reports 0
    violations (and the counts row totals are non-trivial)."""
    rows = {r["check_name"]: r for r in QUERIES["dq_checks_orders"](spark, sf_dir).collect()}
    assert set(rows) == {
        "null_custkey",
        "duplicate_orderkey",
        "dangling_custkey_fk",
        "orderdate_out_of_range",
        "nonpositive_totalprice",
    }
    for name, r in rows.items():
        assert r["violations"] == 0, (name, r)
        assert r["n_rows"] > 0


def test_snapshot_diff_triage_semantics(spark, sf_dir):
    """Membership algebra of the carved snapshots: inserts are exactly the
    keys in v2\\v1 (%10==0 and %7!=0), deletes v1\\v2 (%7==0 and %10!=0),
    updates a subset of the %3 repricings present in both."""
    rows = QUERIES["snapshot_diff_orders"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        k, c = r["o_orderkey"], r["change"]
        if c == "insert":
            assert k % 10 == 0 and k % 7 != 0, r
        elif c == "delete":
            assert k % 7 == 0 and k % 10 != 0, r
        else:
            assert c == "update" and k % 3 == 0 and k % 10 != 0 and k % 7 != 0, r
    # every %3 key present in both snapshots must be reported as an update
    # (repricing changes the value unless totalprice*1.1 rounds to itself,
    # impossible for positive prices)
    updates = {r["o_orderkey"] for r in rows if r["change"] == "update"}
    from k_means_map_reduce_spark.sources import load_table

    keys = {
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .collect()
    }
    expect = {k for k in keys if k % 3 == 0 and k % 10 != 0 and k % 7 != 0}
    assert updates == expect
