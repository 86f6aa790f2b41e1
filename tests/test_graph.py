"""PageRank invariants: mass conservation, determinism, convergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_map_reduce_spark.operators.graph import (
    _partsupp_edges,
    pagerank,
)
from k_means_map_reduce_spark.registry import QUERIES


def test_pagerank_mass_and_convergence(spark, sf_dir):
    """With no dangling nodes, total rank mass == n_nodes after every
    round (teleport injects (1-d)·n, walks redistribute d·n); and ranks
    must be converging (successive-round L1 delta shrinks)."""
    edges = _partsupp_edges(spark, sf_dir).persist()
    n_nodes = edges.select("src").distinct().count()
    r5 = {r["node"]: r["rank"] for r in pagerank(edges, rounds=5).collect()}
    r6 = {r["node"]: r["rank"] for r in pagerank(edges, rounds=6).collect()}
    r10 = {r["node"]: r["rank"] for r in pagerank(edges, rounds=10).collect()}
    for ranks in (r5, r10):
        assert abs(sum(ranks.values()) - n_nodes) < 1e-6 * n_nodes
    d65 = sum(abs(r6[n] - r5[n]) for n in r5)
    d10 = {r["node"]: r["rank"] for r in pagerank(edges, rounds=9).collect()}
    d109 = sum(abs(r10[n] - d10[n]) for n in r10)
    assert d109 < d65, (d109, d65)


def test_pagerank_query_shape_and_determinism(spark, sf_dir):
    rows1 = QUERIES["graph_pagerank_partsupp"](spark, sf_dir).collect()
    rows2 = QUERIES["graph_pagerank_partsupp"](spark, sf_dir).collect()
    assert {(r["entity"], r["entity_key"], r["rank"]) for r in rows1} == {
        (r["entity"], r["entity_key"], r["rank"]) for r in rows2
    }
    assert {r["entity"] for r in rows1} == {"part", "supplier"}
    assert all(r["rank"] > 0 for r in rows1)
