"""Iterative graph analytics: PageRank over a derived bipartite graph.

Alongside k-means (kmeans.py) and connected components (dedup.py), this
completes the canonical iterative-dataflow triple. The reference engine's
whole design is "iterate a map/shuffle/reduce until converged"
(master.py's k-means loop); PageRank is the same loop with a different
reducer — expressed here as repeated DataFrame joins, letting Spark's
scheduler do what the reference hand-rolled.

Graph: the distinct (l_partkey, l_suppkey) links from lineitem (the same
derived partsupp link tpch_full.py uses), namespaced into one node space
(parts even, suppliers odd). Undirected random walk = edges in both
directions. rank_{t+1}(v) = (1-d) + d * Σ_{u→v} rank_t(u) / outdeg(u),
d = 0.85, 10 rounds.

100 TB shape: edges hash-partition on src once; every iteration is a
(ranks ⋈ edges) shuffle on that same key plus a map-side-combined sum —
the classic Pregel superstep as two exchanges. Ranks (one double per
node) are the only iterated state; each round persists and the prior
round unpersists, so lineage stays flat (no exponential plan growth).

Rows-only driver row (iterative, like the kmeans family); invariants in
tests/test_graph.py: probability mass conserved each round (the graph
has no dangling nodes — every node has at least one edge by
construction), fixed ordering, convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_DAMPING = 0.85
_ROUNDS = 10


def _partsupp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected edge list (src, dst) of the bipartite part-supplier
    graph, nodes namespaced: part p -> 2p, supplier s -> 2s+1."""
    l = load_table(spark, sf_dir, "lineitem")
    links = l.select(
        (F.col("l_partkey") * 2).alias("p"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    ).distinct()
    return links.selectExpr("p AS src", "s AS dst").unionByName(
        links.selectExpr("s AS src", "p AS dst")
    )


def pagerank(edges: DataFrame, damping: float = _DAMPING, rounds: int = _ROUNDS) -> DataFrame:
    """(node, rank) after `rounds` synchronous PageRank iterations.

    The loop builds a LAZY 2-shuffles-per-round lineage and executes it as
    one job: rank state is one double per node, used exactly once per
    round, so lineage stays linear and nothing needs per-round
    materialization on a local/mid-size run. For very long runs (or a
    1000-executor deployment where a lost executor would recompute the
    whole chain) checkpoint every ~10 rounds — the loop-invariant weighted
    edge list is persisted either way, it is the operand every round
    re-reads.
    """
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    w = edges.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("frac")
    ).persist()
    ranks = w.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("rank")
    )
    for _ in range(rounds):
        contribs = (
            w.join(ranks, w["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("frac")).alias("c"))
        )
        ranks = (
            contribs.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("in_mass"))
            .select(
                "node",
                (F.lit(1.0 - damping) + F.lit(damping) * F.col("in_mass")).alias(
                    "rank"
                ),
            )
        )
    return ranks


@query("graph_pagerank_partsupp")
def graph_pagerank_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part-supplier link graph: which parts/suppliers
    sit at the center of the supply network. Returns every node with its
    entity type, original key, and rounded rank. Rows-only (iterative);
    invariant-tested in tests/test_graph.py."""
    ranks = pagerank(_partsupp_edges(spark, sf_dir))
    return ranks.select(
        F.when(F.col("node") % 2 == 0, "part").otherwise("supplier").alias(
            "entity"
        ),
        (F.col("node") / 2).cast("long").alias("entity_key"),
        F.round("rank", 6).alias("rank"),
    )
