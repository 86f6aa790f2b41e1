#!/usr/bin/env python
"""Regenerate PLANS.md: captured physical plans of headline queries with
scale commentary. Run from the repo root."""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_map_reduce_spark.registry import QUERIES  # noqa: E402
from k_means_map_reduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PICKS = {
    "q3_shipping_priority": (
        "Broadcast the filtered dimensions, shuffle the fact once, "
        "TakeOrderedAndProject for the top-k — never a global sort."
    ),
    "q9_product_profit": (
        "Five-way join: every dimension broadcasts; the only exchange is "
        "lineitem⋈orders on orderkey. At 1000 executors the fact is read "
        "once and shuffled once."
    ),
    "q18_large_volume_customers": (
        "The HAVING subquery aggregates lineitem on l_orderkey and "
        "semi-joins it back: both sides hash-partition on the same key, so "
        "AQE feeds the agg's shuffle output straight into the join."
    ),
    "q21_waiting_suppliers": (
        "EXISTS + NOT EXISTS rewritten as ONE per-order aggregation joined "
        "back — no correlated probes, no nested-loop join; three operators "
        "share the orderkey partitioning."
    ),
    "timeseries_gap_fill_hourly": (
        "The hourly spine is generated executor-side (sequence+explode "
        "after a per-key agg); join and forward-fill window both partition "
        "on user_id, reusing one exchange."
    ),
    "dedup_winnowing_pairs": (
        "Inverted-index self-join: explode fingerprints, prune postings to "
        "df∈[2,10] (kills both singleton and stop fingerprints), join on "
        "fp, aggregate pairs. The prune is what keeps candidate pairs "
        "~linear at corpus scale."
    ),
    "sim_cosine_topk": (
        "Brute-force cosine baseline: normalized dot via zip_with/aggregate "
        "expressions, per-query top-k by window rank — all codegen, no "
        "Python."
    ),
    "events_session_windows": (
        "session_window gap aggregation — one shuffle on user_id, windows "
        "form inside the aggregate; the streaming twin adds a watermark, "
        "same plan shape."
    ),
    "bloom_semi_join_orders": (
        "Bloom pre-filter below the shuffle semi-join: the key side "
        "collapses to an 8 KB word array carried inside the filter "
        "expression, so the fact exchange moves only probable matches; "
        "the ShuffledHashJoin then removes false positives — exact "
        "result, fact pruned before it ever shuffles."
    ),
    "events_rolling_7d_distinct_users": (
        "Windowed-distinct via bounded fan-out: dedupe to (day,user) "
        "once — the only fact-sized shuffle — then a broadcast range "
        "join against the day spine (<=7 targets per pair) feeds the "
        "final distinct agg. Work is O(7·|pairs|), independent of raw "
        "event volume."
    ),
    "corpus_to_training_pipeline": (
        "The whole curation chain in one plan: gate+scrub+hash are a "
        "single codegen scan, dedup is one shuffle on the 16-byte content "
        "hash, the split is a projection, and the summary is a partial-agg "
        "rollup — two shuffles end to end, payload never moves twice."
    ),
    "join_scd2_order_segment": (
        "SCD2 point-in-time join: the versioned dimension broadcasts; the "
        "validity interval rides the custkey hash join as a residual "
        "filter, so the fact never shuffles and each order matches exactly "
        "one version."
    ),
    "market_basket_pairs": (
        "Basket self-join keyed on the order: fan-out bounded by basket "
        "size, support floor prunes before the lift joins, item "
        "frequencies broadcast."
    ),
    "incremental_daily_rollup": (
        "Materialized-view maintenance: each refresh aggregates only its "
        "batch (map-side partials), broadcast anti/semi splits the state "
        "on the batch's key set, and only the touched slice re-aggregates "
        "— the untouched state never shuffles or rewrites."
    ),
    "attribution_linear_multitouch": (
        "Both touch counts are conditional sums over ONE time-RANGE window: "
        "a single user_id exchange, no purchase-to-touch join, 3-row output."
    ),
    "events_peak_concurrency_daily": (
        "Sweep line decomposed: day-partitioned running sums + an O(days) "
        "carry-in prefix replace the textbook single-partition global sort."
    ),
    "graph_triangle_count": (
        "Degree-ordered orientation caps per-node out-degree at O(sqrt(E)); "
        "wedge + closure joins are plain shuffled equi-joins on node keys."
    ),
    "dedup_shared_chunk_fraction": (
        "Chunks become md5 digests inside the scan projection; the "
        "inverted index and per-doc rollup shuffle 16-byte keys, never text."
    ),
    "text_unigram_cross_entropy": (
        "The token-frequency model broadcasts; the scoring pass is one "
        "explode -> broadcast-join -> per-doc reduce, no vocabulary shuffle."
    ),
    "text_bm25_search": (
        "ONE tokenize/explode pass and one doc_id shuffle yield doc "
        "lengths AND per-term tfs (conditional aggs + stack); df/corpus "
        "stats broadcast; top-25 is TakeOrderedAndProject."
    ),
    "events_time_weighted_avg_daily": (
        "A single (event_type, day) exchange feeds lead(), the partial "
        "agg, and the final agg — window and aggregation share one "
        "partitioning; decimal value x integer-us duration keeps the "
        "integral exact."
    ),
    "sketch_cms_heavy_hitters": (
        "The sketch is built from the per-key AGGREGATE (additivity: "
        "identical cells, ~10^6x fewer rows at scale); the 4x256-cell "
        "table broadcasts back for the min-probe."
    ),
    "finance_rebate_allocation": (
        "One l_orderkey shuffle serves the join and all three window "
        "passes (total weight, floor-sum, remainder rank) — allocation "
        "is integer cents end to end."
    ),
    "stats_multiple_regression": (
        "Multivariate fit as ONE aggregation: nine decimal power sums "
        "are the sufficient statistics; Cramer's rule runs on a single "
        "row. No iteration, no matrix library, one scan."
    ),
    "orders_halfsample_ci_mean": (
        "32 resampling replicas ride ONE fact scan (literal-range cross "
        "join filtered scan-side); inference costs one extra pass, not "
        "32."
    ),
    "dedup_prefix_filter_jaccard": (
        "AllPairs prefix filtering: the shingle projection is cached once "
        "(InMemoryTableScan feeds prefix build AND verify); candidates "
        "meet only on rare df-ordered prefix shingles plus a length-ratio "
        "guard; the quadratic join exists only in the DuckDB oracle."
    ),
    "graph_local_clustering_topk": (
        "Per-node triangle counts as three projections of the compact-"
        "forward closure join (the cached oriented edge list feeds wedge "
        "pairing, closure, and degrees); the coefficient and top-25 rank "
        "run over the node rollup, never the edges."
    ),
    "ds_q36_margin_hierarchy": (
        "ONE fact pass feeds the ROLLUP lattice via Expand with map-side "
        "partial aggregation; the rank-within-parent window partitions "
        "the tiny lattice, not the fact."
    ),
    "attribution_position_based": (
        "First/last-touch TYPE rides the SAME user_id time-RANGE frame as "
        "the counts (encoded MIN/MAX) — one exchange feeds all four frame "
        "aggregates; the 3-row report is a stack() over one agg row."
    ),
    "agg_bitmap_distinct_users": (
        "IDs collapse map-side into per-(type, 32k-bucket) bitmap blocks; "
        "the ALL row ORs the cached blocks — no second fact scan, and raw "
        "ids never shuffle."
    ),
    # round-9 picks
    "dedup_semantic_cluster_pairs": (
        "SemDeDup: vectors meet ONLY through a shared Lloyd cluster id — "
        "the persisted assignment feeds both self-join sides, so the "
        "quadratic term is (n/k)^2 per cluster and cid is a "
        "partition-pruning key at scale."
    ),
    "geo_stay_points": (
        "Everything partitions by user_id: ONE exchange feeds the walk "
        "prefix sums, the LAG island flags, and the running stay ids; "
        "the per-(user, stay) rollup aggregates map-side."
    ),
    "ds_q66_monthly_nation_pivot": (
        "Twelve conditional decimal sums ride ONE hash aggregate with "
        "map-side combine — no Expand, no PIVOT, no multi-distinct; the "
        "dims broadcast."
    ),
    "dedup_containment_pairs": (
        "Asymmetric containment: candidates meet only on df-capped RARE "
        "shingle postings (the stop-shingle cap bounds fan-out); the "
        "cached shingle arrays serve postings AND the exact verify."
    ),
    "text_bigram_perplexity": (
        "The persisted bigram LM serves the smoothing constants and the "
        "scoring join; the corpus is tokenized once per pass and scored "
        "with a model-side equi-join — broadcastable until web scale."
    ),
    # round-10 picks
    "finance_fifo_lot_matching": (
        "FIFO as interval intersection of cumulative-quantity ranges: "
        "buys and sells bucket into <= 2 cumulative bands each (width 50 "
        "< 128), so the join is an equi-join on (part, band) with the "
        "overlap predicate as a residual — per-key fan-out bounded by "
        "band occupancy, never lots x disposals per part."
    ),
    "ml_naive_bayes_lang_confusion": (
        "The persisted (doc, token, count) rollup is tokenized ONCE and "
        "serves vocab, class counts, priors, and the scoring join; "
        "scoring is a token-keyed equi-join against the |V| x 5 model "
        "(vocabulary-scale, broadcastable), argmax is one 5-row window "
        "per doc."
    ),
    "ds_q11_two_channel_yoy_winners": (
        "One fact pass into the (customer, year) two-channel rollup; the "
        "year-shift self-join reuses the rollup's own customer "
        "partitioning, and the ratio comparison is exact DECIMAL(38,0) "
        "cross-multiplication — no division, no float."
    ),
    "graph_global_clustering_ratio": (
        "Reuses the persisted compact-forward oriented edges — the "
        "O(E^1.5)-bounded wedge closure and the integer wedge-count "
        "rollup share one cached build; the ratio is a 1-row cross join."
    ),
    "dedup_paragraph_containment_pairs": (
        "Paragraph-grain containment: the SessionMemo'd shingle table "
        "serves postings and BOTH verify sides; candidates meet only on "
        "df-capped rare shingles, so fan-out is bounded per posting and "
        "the verify touches candidate pairs only."
    ),
    # round-10 continuation picks
    "contamination_winnowing_train_test": (
        "Test fingerprints semi-join the DISTINCT train fingerprint SET, "
        "never train documents — a boilerplate fingerprint held by 10^6 "
        "train docs is ONE join-side row, so there is no posting "
        "explosion to cap; the winnow scan itself is the session-memoized "
        "fps frame (one rolling-hash pass per session)."
    ),
    "events_kaplan_meier_conversion": (
        "ONE fact pass: the censoring horizon rides the same per-user "
        "rollup as the signup/purchase firsts (max-of-maxes), the KM grid "
        "is day-grain (hundreds of rows), and both cumulative windows "
        "run over the grid, never fact rows."
    ),
    "dedup_survivorship_threshold_curve": (
        "The 6-row threshold spine nested-loop-joins the memoized "
        "verified pair graph (near-dups only) — a constant-factor pass "
        "over an already-sub-quadratic structure; the corpus is never "
        "rescanned."
    ),
    # round-11 picks
    "stats_jonckheere_terpstra_priority": (
        "The 10 pairwise group joins the textbook suggests collapse to "
        "ONE global ordered window carrying four running lower-group "
        "counts; at extreme scale the same sums reconstruct from "
        "per-partition counts + offset prefix sums (two-phase rank), so "
        "the plan is a sort + one aggregate at any size."
    ),
    "timeseries_ljung_box_daily": (
        "The fact collapses to day grain in one partial-agg pass; n and "
        "T ride wall windows (no aggregate + crossJoin rescan), seven "
        "LEADs share ONE ordered window, and the integer-demean trick "
        "(e' = n*y - T) keeps every power sum an exact DECIMAL product "
        "— no float ever enters a window."
    ),
    "graph_katz_centrality": (
        "Three matvec rounds = three shuffles on the node key over the "
        "memoized adjacency (the PageRank shape at a third the rounds); "
        "beta = 1/8 makes katz an exact binary fraction, so the top-20 "
        "ranks on an INTEGER key — no float comparator anywhere."
    ),
    "stats_hodges_lehmann_shift": (
        "Pairwise statistics are usually forbidden at fact grain; here "
        "both sides collapse to DAY grain first, so the cross join is "
        "calendar-squared (5.8M rows for 6.6 years) at ANY data volume "
        "— the quadratic is bounded by time, not data."
    ),
}


def main() -> None:
    spark = get_spark("kmmr-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of headline queries "
        "(captured at sf0.1, local[32])",
        "",
        "Auto-captured `explain('simple')` output with scale commentary. "
        "Regenerate with",
        "`python scripts/gen_plans.py` (writes this file). The point of "
        "each plan is that",
        "it would survive a 1000-executor / 100 TB deployment: dimensions "
        "broadcast,",
        "facts shuffle at most once per key, generators run executor-side, "
        "and nothing",
        "drops to row-at-a-time Python.",
        "",
    ]
    for name, note in PICKS.items():
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        plan = re.sub(r"#\d+L?", "", buf.getvalue().strip())
        lines = [line[:160] for line in plan.splitlines()]
        out.append(f"## {name}\n\n{note}\n\n```\n" + "\n".join(lines) + "\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(PICKS)} queries)")


if __name__ == "__main__":
    main()
