"""Driver-contract mirror: every oracle-backed query must hash-match DuckDB.

Runs at sf0.01 (the driver's correctness SF). This is the local early-warning
for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from k_means_map_reduce_spark.registry import ORACLES, QUERIES
from k_means_map_reduce_spark.oracle import compare_query


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, oracle_sf_dir, name):
    r = compare_query(spark, name, oracle_sf_dir)
    assert r.ok, f"{name}: {r.detail} (rows {r.spark_rows}/{r.oracle_rows})"
    assert r.spark_rows > 0, f"{name}: empty result weakens the check"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, oracle_sf_dir, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_small_sf(spark, sf_dir, name):
    """Same hash-compare at sf0.001: catches scale-dependent fragility —
    hard-coded thresholds that empty out, pivot cells that go NULL when
    combos disappear, dtype drift on sparse groups. No rows>0 assertion
    (some selective queries are legitimately empty this small — parity on
    emptiness is still parity)."""
    r = compare_query(spark, name, sf_dir)
    assert r.ok, f"{name}@sf0.001: {r.detail} (rows {r.spark_rows}/{r.oracle_rows})"
