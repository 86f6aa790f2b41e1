"""TPC-DS-signature query shapes over the TPC-H-ish test tables.

TPC-H covers join/agg breadth; TPC-DS adds the window-over-aggregate and
cross-channel patterns that dominate real warehouse workloads. Four
representative shapes, all fully oracled:

- ds_monthly_deviation (q47's core): per-group monthly series with a
  centered moving average and deviation from the group's yearly mean —
  aggregation feeding two differently-framed windows.
- ds_channel_full_outer (q78's core): two independently aggregated
  "channels" full-outer-joined on the entity key with NULL-tolerant
  ratios — the canonical cross-channel reconciliation.
- ds_yoy_customer_growth (q74's core): per-entity yearly series
  self-compared across consecutive years via lag + adjacency guard.
- ds_time_band_counts (q88's core): N band-filtered counts as ONE
  conditional-aggregation scan instead of q88's N self-joins.

Reference parity note: the reference engine (K-Means gRPC MapReduce,
master.py) has no relational surface; these extend SURVEY.md §2b breadth.

At 100 TB: both shapes aggregate the fact FIRST (map-side partials into a
per-(group, month)/per-customer rollup orders of magnitude smaller than the
fact), then run windows/joins on the rollup — never a window over raw fact
rows. The full-outer join keys on the same column both rollups are already
partitioned by, so AQE plans it shuffle-free after the aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from ._util import dsum


@query(
    "ds_monthly_deviation",
    oracle="""
    WITH monthly AS (
      SELECT
        n_name,
        strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1, 2
    ),
    yearly AS (
      SELECT *,
        CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER (
          PARTITION BY n_name, substr(month, 1, 4)
        ) AS DOUBLE)
        / COUNT(*) OVER (PARTITION BY n_name, substr(month, 1, 4)) AS year_avg,
        CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER (
          PARTITION BY n_name ORDER BY month
          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
        ) AS DOUBLE)
        / COUNT(*) OVER (
          PARTITION BY n_name ORDER BY month
          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
        ) AS centered_avg
      FROM monthly
    )
    SELECT
      n_name, month, revenue,
      ROUND(centered_avg, 4) AS centered_avg,
      ROUND(revenue / year_avg, 6) AS dev_ratio
    FROM yearly
    """,
)
def ds_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue per nation with a centered 3-month moving average and
    the ratio to the nation-year mean (TPC-DS q47's seasonality-deviation
    core). The fact aggregates once; both windows run over the tiny
    (nation, month) rollup. Decimal-exact sums; averages as decimal-sum /
    count per the cross-engine float recipe."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w_year = Window.partitionBy("n_name", F.substring("month", 1, 4))
    w_center = (
        Window.partitionBy("n_name").orderBy("month").rowsBetween(-1, 1)
    )
    dec = F.col("revenue").cast("decimal(18,6)")
    return monthly.select(
        "n_name",
        "month",
        "revenue",
        F.round(
            F.sum(dec).over(w_center).cast("double")
            / F.count(F.lit(1)).over(w_center),
            4,
        ).alias("centered_avg"),
        F.round(
            F.col("revenue")
            / (
                F.sum(dec).over(w_year).cast("double")
                / F.count(F.lit(1)).over(w_year)
            ),
            6,
        ).alias("dev_ratio"),
    )


@query(
    "ds_channel_full_outer",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey AS custkey,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6))) AS DOUBLE) AS order_value
      FROM orders GROUP BY 1
    ),
    returned AS (
      SELECT o_custkey AS custkey,
        COUNT(*) AS n_returned_items,
        CAST(SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(18,6))) AS DOUBLE) AS returned_value
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
      GROUP BY 1
    )
    SELECT
      COALESCE(o.custkey, r.custkey) AS custkey,
      COALESCE(n_orders, 0) AS n_orders,
      COALESCE(n_returned_items, 0) AS n_returned_items,
      ROUND(COALESCE(returned_value, 0.0) / order_value, 6) AS return_ratio
    FROM ordered o
    FULL OUTER JOIN returned r ON o.custkey = r.custkey
    """,
)
def ds_channel_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-channel reconciliation (TPC-DS q78's core): every customer's
    order channel vs returned-items channel, FULL OUTER joined so customers
    present in only one channel survive with NULL-tolerant defaults.
    return_ratio keeps NULL when a customer has returns but no orders row
    (impossible here, but the oracle agrees on the semantics). Both channels
    aggregate to per-customer rollups before the join; the join keys on the
    aggregation key, so no extra exchange."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    ordered = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("order_value"),
    )
    returned = (
        l.where(F.col("l_returnflag") == "R")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_returned_items"),
            dsum("l_extendedprice").alias("returned_value"),
        )
    )
    r = returned.select(
        F.col("custkey").alias("r_custkey"),
        "n_returned_items",
        "returned_value",
    )
    return (
        ordered.join(r, F.col("custkey") == F.col("r_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("custkey"), F.col("r_custkey")).alias("custkey"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("n_returned_items"), F.lit(0)).alias(
                "n_returned_items"
            ),
            F.round(
                F.coalesce(F.col("returned_value"), F.lit(0.0))
                / F.col("order_value"),
                6,
            ).alias("return_ratio"),
        )
    )


@query(
    "ds_yoy_customer_growth",
    oracle="""
    WITH yearly AS (
      SELECT
        o_custkey,
        CAST(substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS INT) AS yr,
        CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6))) AS DOUBLE) AS spend
      FROM orders
      GROUP BY 1, 2
    ),
    chained AS (
      SELECT
        o_custkey, yr, spend,
        lag(spend) OVER (PARTITION BY o_custkey ORDER BY yr) AS prev_spend,
        lag(yr) OVER (PARTITION BY o_custkey ORDER BY yr) AS prev_yr
      FROM yearly
    )
    SELECT
      o_custkey, yr, ROUND(spend, 4) AS spend,
      ROUND(prev_spend, 4) AS prev_spend,
      ROUND(spend / prev_spend, 6) AS growth
    FROM chained
    WHERE prev_yr = yr - 1 AND prev_spend > 0 AND spend / prev_spend > 1.5
    """,
)
def ds_yoy_customer_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74's signature: per-entity yearly series, self-compared
    across CONSECUTIVE years (lag + year-adjacency guard — a customer who
    skipped 1995 must not have 1996 compared against 1994), keeping
    customers whose spend grew >1.5x.

    Scale shape: the fact collapses to a (customer, year) rollup via
    map-side partials first — the window (and everything after) runs on
    ~|customers|x7 rows, not the fact. One shuffle for the agg; the lag
    window reuses the same customer partitioning.
    """
    o = load_table(spark, sf_dir, "orders")
    yearly = (
        o.groupBy(
            "o_custkey",
            F.year("o_orderdate").alias("yr"),
        )
        .agg(dsum("o_totalprice").alias("spend"))
    )
    w = Window.partitionBy("o_custkey").orderBy("yr")
    chained = yearly.select(
        "o_custkey",
        "yr",
        "spend",
        F.lag("spend").over(w).alias("prev_spend"),
        F.lag("yr").over(w).alias("prev_yr"),
    )
    return (
        chained.where(
            (F.col("prev_yr") == F.col("yr") - 1)
            & (F.col("prev_spend") > 0)
            & (F.col("spend") / F.col("prev_spend") > 1.5)
        )
        .select(
            "o_custkey",
            "yr",
            F.round("spend", 4).alias("spend"),
            F.round("prev_spend", 4).alias("prev_spend"),
            F.round(F.col("spend") / F.col("prev_spend"), 6).alias("growth"),
        )
    )


@query(
    "ds_time_band_counts",
    oracle="""
    SELECT
      COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 0 AND 5)  AS night,
      COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 6 AND 11) AS morning,
      COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 12 AND 17) AS afternoon,
      COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 18 AND 23) AS evening,
      COUNT(*) FILTER (WHERE event_type = 'purchase'
                         AND EXTRACT(hour FROM ts) BETWEEN 18 AND 23)
        AS evening_purchases,
      COUNT(DISTINCT CASE WHEN EXTRACT(hour FROM ts) BETWEEN 18 AND 23
                          THEN user_id END) AS evening_users
    FROM events
    """,
)
def ds_time_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88's signature: many independent band-filtered counts
    answered by ONE scan of the fact — the anti-pattern it replaces is N
    self-joined subqueries (one per band), which q88 is literally written
    as. Conditional aggregation turns 6 scans into 1; Catalyst computes
    all six partials map-side in a single pass.
    """
    e = load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    band = lambda lo, hi: (h >= lo) & (h <= hi)  # noqa: E731
    return e.agg(
        F.count(F.when(band(0, 5), 1)).alias("night"),
        F.count(F.when(band(6, 11), 1)).alias("morning"),
        F.count(F.when(band(12, 17), 1)).alias("afternoon"),
        F.count(F.when(band(18, 23), 1)).alias("evening"),
        F.count(
            F.when(band(18, 23) & (F.col("event_type") == "purchase"), 1)
        ).alias("evening_purchases"),
        F.countDistinct(
            F.when(band(18, 23), F.col("user_id"))
        ).alias("evening_users"),
    )


@query(
    "ds_cumulative_channel_crossover",
    oracle="""
    WITH monthly AS (
      SELECT
        c_mktsegment AS segment,
        strftime(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)), '%Y-%m') AS month,
        SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6)) END) AS urgent_rev,
        SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6)) END) AS routine_rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), cumulative AS (
      SELECT
        segment, month,
        SUM(COALESCE(urgent_rev, 0)) OVER w AS urgent_cum,
        SUM(COALESCE(routine_rev, 0)) OVER w AS routine_cum
      FROM monthly
      WINDOW w AS (
        PARTITION BY segment ORDER BY month
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      )
    )
    SELECT
      segment, month,
      CAST(urgent_cum AS DOUBLE) AS urgent_cum,
      CAST(routine_cum AS DOUBLE) AS routine_cum
    FROM cumulative
    WHERE urgent_cum > routine_cum
    """,
)
def ds_cumulative_channel_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51's core shape: two per-channel revenue series (urgent vs
    routine order priorities standing in for web vs store channels),
    cumulated per segment over months, reporting the (segment, month)
    points where the urgent channel's running total exceeds the routine
    one — cumulative-series crossover detection.

    Scale shape: the channel split is a conditional aggregation inside ONE
    fact pass (q51's two separate channel scans fused), so the fact is
    read once and shuffled once to the (segment, month) grain; both
    cumulative windows then share a single sort of the tiny rollup.
    Decimal cumulation keeps every running total exact, so the crossover
    predicate cannot flip on float association.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    dec = F.round(F.col("o_totalprice"), 6).cast("decimal(18,6)")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(F.when(urgent, dec)).alias("urgent_rev"),
            F.sum(F.when(~urgent, dec)).alias("routine_rev"),
        )
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = monthly.select(
        "segment",
        "month",
        F.sum(F.coalesce(F.col("urgent_rev"), F.lit(0).cast("decimal(18,6)"))).over(w).alias("urgent_cum"),
        F.sum(F.coalesce(F.col("routine_rev"), F.lit(0).cast("decimal(18,6)"))).over(w).alias("routine_cum"),
    )
    return cum.where(F.col("urgent_cum") > F.col("routine_cum")).select(
        "segment",
        "month",
        F.col("urgent_cum").cast("double").alias("urgent_cum"),
        F.col("routine_cum").cast("double").alias("routine_cum"),
    )


@query(
    "ds_rollup_topn_by_level",
    oracle="""
    WITH rolled AS (
      SELECT
        COALESCE(n_name, 'ALL') AS nation,
        COALESCE(c_mktsegment, 'ALL') AS segment,
        CASE WHEN n_name IS NULL THEN 2 WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END
          AS lvl,
        CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
    ), ranked AS (
      SELECT *,
        ROW_NUMBER() OVER (
          PARTITION BY lvl ORDER BY revenue DESC, nation, segment
        ) AS rk
      FROM rolled
    )
    SELECT CAST(lvl AS BIGINT) AS lvl, nation, segment, revenue, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def ds_rollup_topn_by_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67's core shape: a ROLLUP over the reporting hierarchy
    (nation -> segment) ranked WITHIN each aggregation level, keeping the
    top 3 rows per level — the 'best performers at every grain' report.

    Scale shape: ONE fact pass feeds the rollup (Spark's Expand produces
    the grouping sets before a single exchange); the rank window runs over
    the rollup OUTPUT (≤ nations x segments rows) partitioned by grouping
    level, and the rank<=3 filter pushes down as a WindowGroupLimit top-k.
    Grouping level comes from the NULL pattern, made explicit so both
    engines label rows identically; ties break on names for cross-engine
    determinism.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    dec = F.round(F.col("o_totalprice"), 6).cast("decimal(18,6)")
    rolled = (
        joined.rollup("n_name", "c_mktsegment")
        .agg(F.sum(dec).cast("double").alias("revenue"))
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            F.when(F.col("n_name").isNull(), 2)
            .when(F.col("c_mktsegment").isNull(), 1)
            .otherwise(0)
            .alias("lvl"),
            "revenue",
        )
    )
    w = Window.partitionBy("lvl").orderBy(
        F.col("revenue").desc(), "nation", "segment"
    )
    return (
        rolled.select(
            F.col("lvl").cast("long").alias("lvl"),
            "nation",
            "segment",
            "revenue",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@query(
    "ds_q64_repeat_channel_chain",
    oracle="""
    WITH sales AS (
      SELECT
        l_partkey,
        o_custkey,
        CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6)
                      AS DECIMAL(18,6))) AS DOUBLE) AS net,
        COUNT(*) AS n_lines
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, 2, 3
    )
    SELECT
      s1.l_partkey AS partkey,
      p_brand,
      s1.o_custkey AS custkey,
      n_name,
      s1.yr AS yr1,
      ROUND(s1.net, 4) AS net1,
      ROUND(s2.net, 4) AS net2,
      s1.n_lines AS n1,
      s2.n_lines AS n2
    FROM sales s1
    JOIN sales s2
      ON s1.l_partkey = s2.l_partkey
     AND s1.o_custkey = s2.o_custkey
     AND s2.yr = s1.yr + 1
    JOIN part ON p_partkey = s1.l_partkey
    JOIN customer ON c_custkey = s1.o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE s2.net > s1.net
    """,
)
def ds_q64_repeat_channel_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64's signature: the same (item, customer) pair observed in
    the sales chain in two CONSECUTIVE years, with both years' aggregates
    side-by-side through the full dimension chain (part, customer, nation),
    keeping pairs whose net revenue grew. q64 does this across two channels
    and two years; with one fact the two-year self-comparison is the core.

    Scale shape: the fact collapses FIRST to a (part, customer, year)
    rollup (map-side partials), and the year-over-year self-join runs on
    the rollup keyed by (part, customer) — both sides share that
    partitioning, so the self-join adds no extra exchange beyond the agg's.
    Dimensions join AFTER the self-join has shrunk the row set; nation is
    a bounded broadcast, part/customer scale with SF and stay shuffled
    (AQE may still broadcast them at small SF).
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    net = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    sales = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_partkey", "o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(net.cast("decimal(18,6)")).cast("double").alias("net"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    s1 = sales.alias("s1")
    s2 = sales.select(
        F.col("l_partkey").alias("pk2"),
        F.col("o_custkey").alias("ck2"),
        F.col("yr").alias("yr2"),
        F.col("net").alias("net_2"),
        F.col("n_lines").alias("n_lines2"),
    )
    chained = s1.join(
        s2,
        (F.col("s1.l_partkey") == F.col("pk2"))
        & (F.col("s1.o_custkey") == F.col("ck2"))
        & (F.col("yr2") == F.col("s1.yr") + 1),
    ).where(F.col("net_2") > F.col("s1.net"))
    return (
        chained.join(p, F.col("p_partkey") == F.col("s1.l_partkey"))
        .join(c, F.col("c_custkey") == F.col("s1.o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("s1.l_partkey").alias("partkey"),
            "p_brand",
            F.col("s1.o_custkey").alias("custkey"),
            "n_name",
            F.col("s1.yr").alias("yr1"),
            F.round(F.col("s1.net"), 4).alias("net1"),
            F.round(F.col("net_2"), 4).alias("net2"),
            F.col("s1.n_lines").alias("n1"),
            F.col("n_lines2").alias("n2"),
        )
    )


@query(
    "ds_q72_inventory_window",
    oracle="""
    WITH inv AS (
      SELECT
        l_partkey AS pk,
        CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) // 7
             AS BIGINT) AS wk,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS inv_qty
      FROM lineitem
      GROUP BY 1, 2
    ),
    shortage AS (
      SELECT
        s.l_partkey,
        CAST(date_diff('day', DATE '1995-01-01', CAST(s.l_shipdate AS DATE)) // 7
             AS BIGINT) AS sale_wk,
        s.l_quantity
      FROM lineitem s
      JOIN inv i
        ON i.pk = s.l_partkey
       AND (i.wk = CAST(date_diff('day', DATE '1995-01-01',
                                  CAST(s.l_shipdate AS DATE)) // 7 AS BIGINT) + 1)
       AND i.inv_qty < 5 * CAST(s.l_quantity AS BIGINT)
    )
    SELECT
      p_brand,
      sale_wk,
      COUNT(*) AS shortage_events,
      COUNT(DISTINCT l_partkey) AS parts_affected
    FROM shortage
    JOIN part ON p_partkey = l_partkey
    GROUP BY 1, 2
    """,
)
def ds_q72_inventory_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q72's signature: a sales row joined to the item's INVENTORY
    state in a bounded FOLLOWING time window, keeping rows where on-hand
    quantity can't cover demand (inv_qty < 5x the line quantity), rolled
    up to (brand, week) shortage counts. Inventory is derived per
    (part, week) from shipped quantities — testdata ships no inventory
    table; the window-join shape is q72's.

    Scale shape: q72's range join (inv_date within days after sale) is
    restated as an EQUI-join — the sale probes exactly the next week's
    bucket (wk+1), so there is no range-join explosion and no
    inequality-only join: Spark plans a plain hash join on (part, week).
    The inventory rollup aggregates map-side first; weeks are integer
    epoch-week indices computed identically in both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    wk = lambda col: F.floor(  # noqa: E731
        F.datediff(F.col(col), F.lit("1995-01-01").cast("date")) / 7
    )
    inv = l.groupBy(
        F.col("l_partkey").alias("pk"), wk("l_shipdate").alias("wk")
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("inv_qty"))
    sales = l.select(
        "l_partkey",
        wk("l_shipdate").alias("sale_wk"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    shortage = sales.join(
        inv,
        (F.col("pk") == F.col("l_partkey"))
        & (F.col("wk") == F.col("sale_wk") + 1)
        & (F.col("inv_qty") < 5 * F.col("qty")),
    )
    return (
        shortage.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "sale_wk")
        .agg(
            F.count(F.lit(1)).alias("shortage_events"),
            F.countDistinct("l_partkey").alias("parts_affected"),
        )
    )


@query(
    "ds_q93_returns_adjusted_sales",
    oracle="""
    WITH lines AS (
      SELECT
        p_brand,
        strftime(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)), '%Y-%m')
          AS month,
        CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))
          AS net,
        l_returnflag,
        l_linestatus
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN part ON p_partkey = l_partkey
    ),
    agg AS (
      SELECT
        p_brand,
        month,
        CAST(SUM(net) AS DOUBLE) AS gross,
        CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F'
                               THEN net END), 0) AS DOUBLE) AS full_refund,
        CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' AND l_linestatus <> 'F'
                               THEN net END), 0) AS DOUBLE) AS half_refund
      FROM lines
      GROUP BY 1, 2
    )
    SELECT
      p_brand, month, gross, full_refund, half_refund,
      gross - full_refund - 0.5 * half_refund AS act_sales
    FROM agg
    """,
)
def ds_q93_returns_adjusted_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93's signature: actual sales net of returns, where the
    refund amount depends on the return disposition (q93's CASE over the
    return reason): finalized returned lines ('R'/'F') refund fully, open
    returned lines refund half. Rolled up per (brand, month).

    Scale shape: ONE fact pass — the disposition split is conditional
    aggregation, never a second scan or a returns self-join (q93 is
    written as store_sales LEFT JOIN store_returns; with the flag on the
    line the join is free). Decimal sums keep gross/refund exact; the
    half refund halves an exact double (exact in binary) and the final
    subtraction of exact doubles is deterministic cross-engine.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    net = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(18,6)")
    returned = F.col("l_returnflag") == "R"
    final = F.col("l_linestatus") == "F"
    zero = F.lit(0).cast("decimal(18,6)")
    agg = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            "p_brand",
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
        )
        .agg(
            F.sum(net).cast("double").alias("gross"),
            F.coalesce(F.sum(F.when(returned & final, net)), zero)
            .cast("double")
            .alias("full_refund"),
            F.coalesce(F.sum(F.when(returned & ~final, net)), zero)
            .cast("double")
            .alias("half_refund"),
        )
    )
    return agg.select(
        "p_brand",
        "month",
        "gross",
        "full_refund",
        "half_refund",
        (
            F.col("gross") - F.col("full_refund") - 0.5 * F.col("half_refund")
        ).alias("act_sales"),
    )


@query(
    "ds_q34_trip_size_bands",
    oracle="""
    WITH trip AS (
      SELECT l_orderkey, COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1
    ),
    big AS (
      SELECT o_custkey, COUNT(*) AS n_big_trips,
             CAST(SUM(n_lines) AS BIGINT) AS big_trip_lines
      FROM trip JOIN orders ON o_orderkey = l_orderkey
      WHERE n_lines BETWEEN 5 AND 7
      GROUP BY 1
    )
    SELECT c_custkey, c_name, c_mktsegment,
           n_big_trips, big_trip_lines
    FROM big JOIN customer ON c_custkey = o_custkey
    WHERE n_big_trips >= 2
    """,
)
def ds_q34_trip_size_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73's signature: count items per TRIP (order), keep trips
    whose size falls in a band (5-7 lines — the 'bulk shopper' band in
    this schema's 1-7 line range), and report customers with repeated
    banded trips. The group-size-as-filter pattern: the fact aggregates
    to trip grain FIRST, the band filter runs on the tiny rollup, and
    only banded trips join the customer dim.

    Scale shape: one fact pass to the (order, count) rollup (map-side
    partials on the fact's natural key), the orders join is keyed on the
    rollup's grain, and the customer join happens after the >= 2-trip
    filter has shrunk rows to the report set. Integer counts only.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    trip = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    big = (
        trip.where(F.col("n_lines").between(5, 7))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_big_trips"),
            F.sum("n_lines").alias("big_trip_lines"),
        )
        .where(F.col("n_big_trips") >= 2)
    )
    return big.join(c, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_custkey", "c_name", "c_mktsegment", "n_big_trips", "big_trip_lines"
    )
