"""Advanced aggregation and window analytics: cube / grouping sets, pivot,
lag/lead deltas, ranking tiles, and frame-based moving aggregates.

SURVEY §2.2 lists grouping sets/cube/rollup and the window-function families
(ranking / analytic / frames) among the categories absent from the reference;
this module provides the Spark-native coverage. All queries follow the §7
determinism contract: total ORDER BY with key tie-breaks, doubles rounded to
6 dp, dates emitted as formatted strings (never raw timestamps).

Scale notes: cube/rollup are partial-aggregated map-side by Spark's Expand +
HashAggregate, pivot with an explicit value list compiles to one grouped
aggregation (no per-value scans), and the window queries partition on the
natural key (customer) so state stays bounded per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


# ---------- cube / grouping sets ----------

def cube_order_stats(orders: DataFrame) -> DataFrame:
    """CUBE over (o_orderstatus, o_orderpriority) with grouping_id — all four
    grouping sets in one Expand+HashAggregate pass (no self-union of
    aggregations)."""
    return (orders.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price"),
                 F.grouping_id().alias("gid"))
            .orderBy(F.col("gid"),
                     F.col("o_orderstatus").asc_nulls_first(),
                     F.col("o_orderpriority").asc_nulls_first()))


CUBE_ORDER_STATS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       GROUPING(o_orderstatus, o_orderpriority) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# ---------- pivot ----------

def pivot_flag_by_status(lineitem: DataFrame) -> DataFrame:
    """Pivot l_linestatus ('F'/'O') into columns per l_returnflag. The
    explicit value list keeps it a single grouped aggregation — no
    distinct-value pre-scan, no second shuffle."""
    return (lineitem.groupBy("l_returnflag")
            .pivot("l_linestatus", ["F", "O"])
            .agg(F.round(F.sum("l_quantity"), 6))
            .select(F.col("l_returnflag"),
                    F.coalesce("F", F.lit(0.0)).alias("qty_f"),
                    F.coalesce("O", F.lit(0.0)).alias("qty_o"))
            .orderBy("l_returnflag"))


PIVOT_FLAG_BY_STATUS_ORACLE = """
SELECT l_returnflag,
       coalesce(round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6), 0.0) AS qty_f,
       coalesce(round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6), 0.0) AS qty_o
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------- analytic windows: lag / lead ----------

def order_gaps(orders: DataFrame, limit_custkey: int = 200) -> DataFrame:
    """Per-customer order timeline with lag/lead: days since the previous
    order and until the next one. Bounded to custkey < limit for a stable
    test surface; the window partitions on the customer key so per-group
    state is one customer's history."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    day = F.date_format("o_orderdate", "yyyy-MM-dd")
    return (orders.where(F.col("o_custkey") < limit_custkey)
            .select(
                "o_custkey", "o_orderkey", day.alias("order_day"),
                F.datediff(F.col("o_orderdate"),
                           F.lag("o_orderdate").over(w)).alias("days_since_prev"),
                F.datediff(F.lead("o_orderdate").over(w),
                           F.col("o_orderdate")).alias("days_until_next"))
            .orderBy("o_custkey", "o_orderkey"))


def order_gaps_oracle(limit_custkey: int = 200) -> str:
    return f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INTEGER) AS days_since_prev,
       CAST(date_diff('day', o_orderdate,
            lead(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey))
            AS INTEGER) AS days_until_next
FROM orders WHERE o_custkey < {limit_custkey}
ORDER BY o_custkey, o_orderkey
"""


# ---------- ranking windows: ntile / percent_rank / dense_rank ----------

def customer_balance_tiles(customer: DataFrame, tiles: int = 4) -> DataFrame:
    """Quartile (ntile), percent_rank, and dense_rank of customers by account
    balance within each market segment — the full ranking-function family in
    one windowed pass."""
    w = (Window.partitionBy("c_mktsegment")
         .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")))
    return (customer.select(
        "c_mktsegment", "c_custkey",
        F.round("c_acctbal", 6).alias("acctbal"),
        F.ntile(tiles).over(w).alias("bal_tile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.dense_rank().over(w).alias("drank"))
        .orderBy("c_mktsegment", F.col("acctbal").desc(), "c_custkey"))


def customer_balance_tiles_oracle(tiles: int = 4) -> str:
    return f"""
SELECT c_mktsegment, c_custkey,
       round(c_acctbal, 6) AS acctbal,
       CAST(ntile({tiles}) OVER w AS INTEGER) AS bal_tile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       CAST(dense_rank() OVER w AS BIGINT) AS drank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, acctbal DESC, c_custkey
"""


# ---------- frame-based moving aggregate ----------

def moving_avg_daily_revenue(orders: DataFrame, days: int = 7) -> DataFrame:
    """7-day moving average of daily order revenue via a RANGE frame over
    epoch-day numbers — calendar-correct (missing days still age out of the
    window, unlike a ROWS frame). One aggregation, one window over a
    single date-ordered series."""
    daily = (orders
             .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
             .agg(F.sum("o_totalprice").alias("revenue")))
    day_num = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = (Window.orderBy(day_num.cast("long"))
         .rangeBetween(-(days - 1), Window.currentRow))
    return (daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round("revenue", 6).alias("revenue"),
        F.round(F.avg("revenue").over(w), 6).alias(f"avg_{days}d"))
        .orderBy("day"))


def moving_avg_daily_revenue_oracle(days: int = 7) -> str:
    return f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d, sum(o_totalprice) AS revenue
  FROM orders GROUP BY 1
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       round(revenue, 6) AS revenue,
       round(avg(revenue) OVER (
         ORDER BY CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT)
         RANGE BETWEEN {days - 1} PRECEDING AND CURRENT ROW), 6) AS avg_{days}d
FROM daily
ORDER BY day
"""


# ---------- semi join ----------

def customers_with_open_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """left_semi: customers having at least one 'O'-status order — the
    existence probe never materializes the orders side into the output, and
    Spark broadcasts or hashes just the key set."""
    open_orders = orders.where(F.col("o_orderstatus") == "O")
    return (customer.join(open_orders,
                          customer.c_custkey == open_orders.o_custkey,
                          "left_semi")
            .select("c_custkey", "c_name", "c_mktsegment")
            .orderBy("c_custkey"))


CUSTOMERS_WITH_OPEN_ORDERS_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
ORDER BY c_custkey
"""


def late_supplier_blame(lineitem: DataFrame, supplier: DataFrame,
                        nation: DataFrame, topn: int = 20) -> DataFrame:
    """TPC-H Q21-shaped sole-blame query on this schema's columns:
    suppliers whose 'R'-flagged line was the ONLY returned line in a
    multi-supplier order, counted per flagged line. The correlated
    EXISTS (another supplier shipped in the same order) is a left-semi
    self-join and the NOT EXISTS (another supplier was ALSO flagged) is
    a left-anti self-join — both keyed on l_orderkey, so the flagged
    side shuffles once and both probes reuse that exchange; the
    supplier/nation dims broadcast onto the bounded per-supplier
    aggregate; TakeOrderedAndProject caps the output at ``topn`` with
    a unique (numwait DESC, s_name) ordering."""
    flagged = (lineitem.where(F.col("l_returnflag") == "R")
               .select("l_orderkey", "l_suppkey"))
    others = (lineitem.select(F.col("l_orderkey").alias("o2"),
                              F.col("l_suppkey").alias("s2")))
    multi = flagged.join(
        others,
        (flagged.l_orderkey == others.o2) & (flagged.l_suppkey != others.s2),
        "left_semi")
    flagged_others = (flagged.select(F.col("l_orderkey").alias("o3"),
                                     F.col("l_suppkey").alias("s3")))
    sole = multi.join(
        flagged_others,
        (multi.l_orderkey == flagged_others.o3)
        & (multi.l_suppkey != flagged_others.s3),
        "left_anti")
    blame = sole.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("numwait"))
    dims = F.broadcast(
        supplier.select("s_suppkey", "s_name", "s_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey")))
    return (blame.join(dims, blame.l_suppkey == F.col("s_suppkey"))
            .select("s_name", "n_name", "numwait")
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(topn))


def late_supplier_blame_oracle(topn: int = 20) -> str:
    """Oracle twin of :func:`late_supplier_blame`, parameterized on the
    same ``topn`` so a non-default limit can't silently diverge from
    the SQL used for certification."""
    return f"""
SELECT s_name, n_name, count(*) AS numwait
FROM lineitem l1, supplier, nation
WHERE l1.l_returnflag = 'R'
  AND s_suppkey = l1.l_suppkey AND n_nationkey = s_nationkey
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT {int(topn)}
"""


LATE_SUPPLIER_BLAME_ORACLE = late_supplier_blame_oracle()


# ---------- scalar-subquery pattern ----------

def orders_above_customer_avg(orders: DataFrame, factor: float = 1.5) -> DataFrame:
    """Orders priced above ``factor`` × their customer's average — the
    correlated-scalar-subquery pattern expressed as an aggregate + re-join
    on the grouping key (one shuffle, reused by AQE for the join)."""
    avg_by_cust = (orders.groupBy("o_custkey")
                   .agg(F.avg("o_totalprice").alias("cust_avg")))
    return (orders.join(avg_by_cust, "o_custkey")
            .where(F.col("o_totalprice") > F.col("cust_avg") * factor)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 6).alias("totalprice"),
                    F.round("cust_avg", 6).alias("cust_avg"))
            .orderBy("o_custkey", "o_orderkey"))


def orders_above_customer_avg_oracle(factor: float = 1.5) -> str:
    return f"""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 6) AS totalprice,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey), 6) AS cust_avg
FROM orders
QUALIFY o_totalprice > avg(o_totalprice) OVER (PARTITION BY o_custkey) * {factor}
ORDER BY o_custkey, o_orderkey
"""


def customer_first_orders(orders: DataFrame, limit_custkey: int = 500) -> DataFrame:
    """first_value / nth_value coverage: each customer's first and second
    order keys over their date-ordered history, evaluated once per row and
    deduplicated to one row per customer (the windows need the full-frame
    ROWS spec — default frames end at CURRENT ROW, where nth_value(2) is
    NULL until the second row)."""
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (orders.where(F.col("o_custkey") < limit_custkey)
            .select("o_custkey",
                    F.first_value("o_orderkey").over(w).alias("first_order"),
                    F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
                    F.count(F.lit(1)).over(w).alias("n_orders"))
            .distinct()
            .orderBy("o_custkey"))


def customer_first_orders_oracle(limit_custkey: int = 500) -> str:
    return f"""
SELECT DISTINCT o_custkey,
       first_value(o_orderkey) OVER w AS first_order,
       nth_value(o_orderkey, 2) OVER w AS second_order,
       count(*) OVER w AS n_orders
FROM orders WHERE o_custkey < {limit_custkey}
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey
"""


def event_value_histogram(events: DataFrame, bucket_width: float = 10.0) -> DataFrame:
    """Fixed-width histogram of event values per type — floor-division
    bucketing (portable; width_bucket is not in every engine). The classic
    distribution-profiling aggregation: one grouped count, bucket count
    bounded by the value range."""
    bucket = F.floor(F.col("value") / bucket_width).cast("int")
    return (events.groupBy("event_type", bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy("event_type", "bucket"))


def event_value_histogram_oracle(bucket_width: float = 10.0) -> str:
    return f"""
SELECT event_type, CAST(floor(value / {bucket_width}) AS INTEGER) AS bucket,
       count(*) AS n_events
FROM events
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""
