"""Relational coverage over the TPC-H-ish star schema + `events` — the
entire §2.2 absence list of SURVEY.md (scans, joins incl. semi/anti,
grouped/rollup aggregation, windows, sorts, set ops, string/date/JSON
functions), expressed declaratively so Catalyst supplies pushdown, pruning,
join selection, and AQE does runtime re-planning.

Scale notes per query are in the docstrings; the general shape:
- dimension tables (region/nation/supplier, and customer vs orders)
  broadcast below the threshold; fact-fact joins shuffle on their keys.
- aggregations are partial (map-side combine) by construction.
- date/JSON outputs are projected to strings/epochs so the DuckDB oracle
  hashes identically (timestamp wire formats differ between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6


# --- Q1-style pricing summary (grouped aggregation, predicate pushdown) ---

def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: wide scan + filter + grouped agg. The shipdate filter
    reaches the parquet scan (PushedFilters); the agg is partial+final with
    only 4 groups, so shuffle volume is constant."""
    return (lineitem
            .where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                 .alias("sum_disc_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                               * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
                 round6(F.avg("l_quantity")).alias("avg_qty"),
                 round6(F.avg("l_extendedprice")).alias("avg_price"),
                 round6(F.avg("l_discount")).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


PRICING_SUMMARY_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       {r6('avg(l_quantity)')} AS avg_qty,
       {r6('avg(l_extendedprice)')} AS avg_price,
       {r6('avg(l_discount)')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q3-style: join + agg + top-k ---

def top_unshipped_orders(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, segment: str = "BUILDING",
                         k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter on customer, join into orders,
    shuffle join to lineitem on orderkey, revenue agg, top-k
    (TakeOrderedAndProject — no global sort materialized).

    No broadcast hint on customer: even segment-filtered it scales linearly
    with sf (~300k rows at sf10), so a forced broadcast becomes an OOM at
    100 TB. AQE picks broadcast at small sf and shuffle join beyond its
    threshold (round-1 VERDICT item 4)."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    return (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
                     "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                 .alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
            .limit(k))


def top_unshipped_orders_oracle(segment: str = "BUILDING", k: int = 10) -> str:
    return f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = '{segment}'
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT {k}
"""


# --- Q5-style: multi-way star join ---

def region_revenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                   orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Star join region→nation→customer→orders→lineitem. nation/region are
    fixed-size (25/5 rows at every sf) and broadcast explicitly; customer is
    fact-scaling (1.5 M rows at sf10) so its join carries NO hint — AQE
    broadcasts it while it fits and falls back to shuffle join beyond the
    threshold (round-1 VERDICT item 4: a forced customer broadcast is a
    driver OOM at 100 TB). Only orders⋈lineitem and customer must shuffle."""
    return (lineitem
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("r_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                 .alias("revenue"),
                 F.count_distinct(F.col("o_orderkey")).alias("n_orders"))
            .orderBy("r_name", "n_name"))


REGION_REVENUE_ORACLE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --- window functions ---

def top_customers_per_nation(customer: DataFrame, n: int = 3) -> DataFrame:
    """Ranking window: top-n customers by acctbal within each nation —
    the per-group analog of the reference's global top-k heap
    (hnsw.cc:266-271). One shuffle on the partition key."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (customer
            .withColumn("rank_in_nation", F.row_number().over(w))
            .where(F.col("rank_in_nation") <= n)
            .select("c_nationkey", "c_custkey", "c_name",
                    F.round("c_acctbal", 2).alias("acctbal"), "rank_in_nation")
            .orderBy("c_nationkey", "rank_in_nation"))


def top_customers_per_nation_oracle(n: int = 3) -> str:
    return f"""
SELECT c_nationkey, c_custkey, c_name, round(c_acctbal, 2) AS acctbal, rank_in_nation
FROM (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
  FROM customer
)
WHERE rank_in_nation <= {n}
ORDER BY c_nationkey, rank_in_nation
"""


def customer_order_running_totals(orders: DataFrame, limit_custkey: int = 200) -> DataFrame:
    """Analytic window frame: per-customer running order total + lag delta,
    over a bounded key range (predicate pushes to the scan)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (orders
            .where(F.col("o_custkey") <= limit_custkey)
            .select("o_custkey", "o_orderkey",
                    F.round(F.sum("o_totalprice").over(
                        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
                    .alias("running_total"),
                    F.round(F.col("o_totalprice")
                            - F.coalesce(F.lag("o_totalprice", 1).over(w), F.lit(0.0)), 4)
                    .alias("delta_vs_prev"))
            .orderBy("o_custkey", "o_orderkey"))


def customer_order_running_totals_oracle(limit_custkey: int = 200) -> str:
    return f"""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
       round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey), 0.0), 4) AS delta_vs_prev
FROM orders
WHERE o_custkey <= {limit_custkey}
ORDER BY o_custkey, o_orderkey
"""


# --- rollup / grouping sets ---

def rollup_revenue(lineitem: DataFrame) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping_id — subtotal and
    grand-total rows; NULL group keys coalesced to 'ALL' for hash-stable
    output."""
    return (lineitem
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.grouping_id().alias("gid"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                    "sum_price", "n_rows", "gid")
            .orderBy("gid", "returnflag", "linestatus"))


ROLLUP_REVENUE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 4) AS sum_price,
       count(*) AS n_rows,
       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
"""


# --- semi / anti joins ---

def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI join: customers that never ordered. Plans as a broadcast
    anti join when orders' key projection is small; at scale it's a shuffled
    hash anti join on the key only (projection pruned to o_custkey)."""
    return (customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
            .select("c_custkey", "c_name", "c_mktsegment")
            .orderBy("c_custkey"))


CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def segment_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT SEMI join + aggregation: per-segment count of customers that
    have at least one order."""
    with_orders = customer.join(orders, customer.c_custkey == orders.o_custkey,
                                "left_semi")
    return (with_orders.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers_with_orders"),
                 round6(F.avg("c_acctbal")).alias("avg_acctbal"))
            .orderBy("c_mktsegment"))


SEGMENT_ORDER_STATS_ORACLE = f"""
SELECT c_mktsegment,
       count(*) AS n_customers_with_orders,
       {r6('avg(c_acctbal)')} AS avg_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- set operations ---

def part_brand_set_ops(part: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over part-key sets defined by predicates,
    tagged by which set op produced each row."""
    big = part.where(F.col("p_size") >= 30).select("p_partkey")
    pricey = part.where(F.col("p_retailprice") >= 1500.0).select("p_partkey")
    u = big.union(pricey).distinct().withColumn("set_op", F.lit("union"))
    i = big.intersect(pricey).withColumn("set_op", F.lit("intersect"))
    e = big.exceptAll(pricey).distinct().withColumn("set_op", F.lit("except"))
    return u.union(i).union(e).orderBy("set_op", "p_partkey")


PART_BRAND_SET_OPS_ORACLE = """
WITH big AS (SELECT p_partkey FROM part WHERE p_size >= 30),
pricey AS (SELECT p_partkey FROM part WHERE p_retailprice >= 1500.0)
SELECT p_partkey, 'union' AS set_op FROM (SELECT p_partkey FROM big UNION SELECT p_partkey FROM pricey)
UNION ALL
SELECT p_partkey, 'intersect' AS set_op FROM (SELECT p_partkey FROM big INTERSECT SELECT p_partkey FROM pricey)
UNION ALL
SELECT p_partkey, 'except' AS set_op FROM (SELECT p_partkey FROM big EXCEPT SELECT p_partkey FROM pricey)
ORDER BY set_op, p_partkey
"""


# --- events: date/JSON functions, sessionization ---

def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour aggregation (batch twin of the streaming query in
    streaming/events.py): per (hour, event_type) count + value stats.
    Hour emitted as epoch seconds — engine-portable, no timestamp wire
    format in the hash."""
    hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
    return (events
            .groupBy(hour.alias("hour_epoch"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 round6(F.sum("value")).alias("sum_value"),
                 round6(F.avg("value")).alias("avg_value"))
            .orderBy("hour_epoch", "event_type"))


# r6/round6: both engines hold identical sum/avg doubles here, but their
# native 6-dp roundings disagree at .XXXXXX5 boundaries (found by the
# sf0.1 full-corpus sweep) — both sides round in binary instead
# (functions/rounding.py).
EVENTS_HOURLY_ORACLE = f"""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
       count(*) AS n_events,
       {r6('sum(value)')} AS sum_value,
       {r6('avg(value)')} AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY hour_epoch, event_type
"""


def events_json_stats(events: DataFrame) -> DataFrame:
    """JSON extraction on the `props` column: numeric field $.k per type."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (events
            .select("event_type", k.alias("k"))
            .where(F.col("k").isNotNull())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_with_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 round6(F.avg("k")).alias("avg_k"))
            .orderBy("event_type"))


EVENTS_JSON_STATS_ORACLE = f"""
SELECT event_type,
       count(*) AS n_with_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       {r6("avg(CAST(json_extract_string(props, '$.k') AS BIGINT))")} AS avg_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via windows (batch form of a session window): a new
    session starts when the gap from the previous event of the same user
    exceeds ``gap_minutes``. Returns per-session stats. One shuffle on
    user_id; the cumulative sum runs inside each user partition."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Compare gaps at microsecond precision — integer-second truncation
    # would disagree with the oracle on fractional-second boundaries.
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts", 1).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    sessions = (events
                .withColumn("is_new", is_new)
                .withColumn("session_seq", F.sum("is_new").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    return (sessions
            .groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.unix_micros(F.min("ts")).alias("start_us"),
                 F.unix_micros(F.max("ts")).alias("end_us"),
                 F.round(F.sum("value"), 6).alias("session_value"))
            .orderBy("user_id", "session_seq"))


def user_sessions_oracle(gap_minutes: int = 30) -> str:
    # epoch_ns // 1000 mirrors the catalog's nanos→micros truncation.
    return f"""
WITH e AS (
  SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS t_us FROM events
), g AS (
  SELECT user_id, event_id, t_us, value,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) IS NULL
                OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {gap_minutes * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM e
), s AS (
  SELECT user_id, event_id, t_us, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM g
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(t_us) AS start_us,
       max(t_us) AS end_us,
       round(sum(value), 6) AS session_value
FROM s GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def supplier_nation_volume(lineitem: DataFrame, supplier: DataFrame,
                           nation: DataFrame, region: DataFrame) -> DataFrame:
    """Revenue per (region, nation) through the supplier side of lineitem —
    the classic star join. nation/region broadcast (fixed-size dims);
    supplier scales with sf, so no hint — post-agg per_supp has the same
    cardinality as supplier and AQE picks the join strategy from runtime
    sizes. lineitem aggregates map-side first, so the single shuffle
    carries only (suppkey, partial sums), not raw line items."""
    per_supp = (lineitem.groupBy("l_suppkey")
                .agg(F.sum(F.col("l_extendedprice")
                           * (F.lit(1.0) - F.col("l_discount"))).alias("rev")))
    return (per_supp
            .join(supplier, per_supp.l_suppkey == supplier.s_suppkey)
            .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.count(F.lit(1)).alias("n_suppliers"),
                 F.round(F.sum("rev"), 2).alias("revenue"))
            .orderBy("r_name", "n_name"))


SUPPLIER_NATION_VOLUME_ORACLE = """
WITH per_supp AS (
  SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS rev
  FROM lineitem GROUP BY l_suppkey
)
SELECT r_name, n_name, count(*) AS n_suppliers, round(sum(rev), 2) AS revenue
FROM per_supp
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def nation_balance_full_outer(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """Customer vs supplier account-balance totals per nation key via FULL
    OUTER join of two pre-aggregated sides — covers the outer-join family
    with nulls surviving on either side. Aggregating before the join keeps
    the outer join at nation cardinality (tiny) regardless of fact size."""
    c = (customer.groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).alias("n_customers"),
              F.round(F.sum("c_acctbal"), 6).alias("cust_bal")))
    s = (supplier.groupBy("s_nationkey")
         .agg(F.count(F.lit(1)).alias("n_suppliers"),
              F.round(F.sum("s_acctbal"), 6).alias("supp_bal")))
    return (c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
            .select(F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
                    F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
                    "cust_bal",
                    F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
                    "supp_bal")
            .orderBy("nationkey"))


NATION_BALANCE_FULL_OUTER_ORACLE = """
WITH c AS (
  SELECT c_nationkey, count(*) AS n_customers, round(sum(c_acctbal), 6) AS cust_bal
  FROM customer GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey, count(*) AS n_suppliers, round(sum(s_acctbal), 6) AS supp_bal
  FROM supplier GROUP BY s_nationkey
)
SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
       coalesce(n_customers, 0) AS n_customers, cust_bal,
       coalesce(n_suppliers, 0) AS n_suppliers, supp_bal
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
ORDER BY nationkey
"""


def priority_customer_counts(orders: DataFrame) -> DataFrame:
    """DISTINCT aggregation coverage: per order priority, exact distinct
    customer count alongside the plain count. Spark plans the distinct as a
    two-phase expand-aggregate; partial aggregation still applies to the
    non-distinct columns."""
    return (orders.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.count_distinct("o_custkey").alias("n_customers"),
                 # 2 dp: at ~1e9 magnitude, double summation order shifts
                 # the 6th decimal between engines; cents are stable.
                 F.round(F.sum("o_totalprice"), 2).alias("total_price"))
            .orderBy("o_orderpriority"))


PRIORITY_CUSTOMER_COUNTS_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def event_prop_keys(events: DataFrame) -> DataFrame:
    """Map-function coverage: parse the props JSON into MAP<STRING,STRING>,
    explode the key space, and count occurrences per key — the
    semi-structured column pattern (schema-on-read without a fixed struct)."""
    m = F.from_json("props", "map<string,string>")
    return (events.select(F.explode(F.map_keys(m)).alias("prop_key"))
            .groupBy("prop_key")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy("prop_key"))


EVENT_PROP_KEYS_ORACLE = """
SELECT k AS prop_key, count(*) AS n_events
FROM (SELECT unnest(json_keys(props)) AS k FROM events)
GROUP BY k
ORDER BY k
"""


def top_parts_by_revenue(lineitem: DataFrame, part: DataFrame,
                         k: int = 20) -> DataFrame:
    """Top-k parts by revenue: aggregate the fact first (map-side partials,
    one keyed shuffle), join the part dim onto just the aggregated rows,
    then global top-k via TakeOrderedAndProject — the aggregate-then-
    join-then-limit shape that keeps dim attributes off the fact shuffle.
    part is fact-scaling (2 M rows at sf10) so the join carries no
    broadcast hint; AQE decides from runtime sizes."""
    rev = (lineitem.groupBy("l_partkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 4).alias("revenue"),
                F.count(F.lit(1)).alias("n_lines")))
    return (rev.join(part, rev.l_partkey == part.p_partkey)
            .select(F.col("p_partkey").alias("partkey"), "p_name", "p_brand",
                    "revenue", "n_lines")
            .orderBy(F.col("revenue").desc(), F.col("partkey"))
            .limit(k))


def top_parts_by_revenue_oracle(k: int = 20) -> str:
    return f"""
WITH rev AS (
  SELECT l_partkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
         count(*) AS n_lines
  FROM lineitem GROUP BY l_partkey
)
SELECT p_partkey AS partkey, p_name, p_brand, revenue, n_lines
FROM rev JOIN part ON l_partkey = p_partkey
ORDER BY revenue DESC, partkey
LIMIT {k}
"""


def events_sliding_2h(events: DataFrame) -> DataFrame:
    """Sliding-window aggregation (2-hour windows, 1-hour slide): each event
    contributes to two windows — `F.window` generates the overlapping
    assignment natively (one Expand-style projection, one grouped agg), the
    batch twin of the streaming sliding query."""
    return (events
            .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.unix_timestamp(F.col("win.start")).alias("win_start"),
                    "event_type", "n_events", "sum_value")
            .orderBy("win_start", "event_type"))


EVENTS_SLIDING_2H_ORACLE = """
WITH e AS (
  SELECT (epoch_ns(ts) // 1000000000) AS t_s, event_type, value FROM events
), assigned AS (
  SELECT (t_s // 3600) * 3600 AS win_start, event_type, value FROM e
  UNION ALL
  SELECT (t_s // 3600) * 3600 - 3600 AS win_start, event_type, value FROM e
)
SELECT win_start, event_type, count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM assigned
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""


def event_value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of event value per type
    — the latency/quality-distribution query shape. Spark's `percentile`
    and DuckDB's `quantile_cont` share the linear-interpolation definition,
    so results hash-match exactly. Exact percentile sorts within each
    group; at scale swap in approx_percentile (t-digest) where a bounded
    error is acceptable (tested separately, never hash-matched)."""
    pcts = F.expr("percentile(value, array(0.5, 0.9, 0.99))")
    return (events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(pcts[0], 6).alias("p50"),
                 F.round(pcts[1], 6).alias("p90"),
                 F.round(pcts[2], 6).alias("p99"))
            .orderBy("event_type"))


EVENT_VALUE_PERCENTILES_ORACLE = """
SELECT event_type, count(*) AS n_events,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_variant_stats(events: DataFrame) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse the
    props JSON once into a variant column and extract typed paths — the
    open-schema alternative to from_json-with-a-fixed-StructType (binary
    variant encoding, no per-query re-parse, path access pushdown-ready)."""
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (events.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 round6(F.avg("k")).alias("avg_k"))
            .orderBy("event_type"))


EVENTS_VARIANT_STATS_ORACLE = f"""
SELECT event_type, count(*) AS n_events,
       min(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k,
       {r6("avg(CAST(json_extract(props, '$.k') AS INTEGER))")} AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_session_window(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Native session windows in BATCH (F.session_window): gap-merged
    per-user sessions — the built-in operator behind the streaming
    session query, declared in batch so the oracle can pin its exact
    merge semantics against the islands-and-gaps SQL formulation."""
    gap = f"{gap_minutes} minutes"
    return (events
            .groupBy("user_id", F.session_window("ts", gap).alias("win"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("session_value"))
            .select("user_id",
                    F.unix_micros(F.col("win.start")).alias("start_us"),
                    "n_events", "session_value")
            .orderBy("user_id", "start_us"))


def events_session_window_oracle(gap_minutes: int = 30) -> str:
    return f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS t_us, value FROM events
), g AS (
  SELECT user_id, t_us, value,
         CASE WHEN lag(t_us) OVER w IS NULL
                OR t_us - lag(t_us) OVER w > {gap_minutes * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us)
), s AS (
  SELECT user_id, t_us, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us
                           ROWS UNBOUNDED PRECEDING) AS seq
  FROM g
)
SELECT user_id, min(t_us) AS start_us, count(*) AS n_events,
       round(sum(value), 6) AS session_value
FROM s GROUP BY user_id, seq
ORDER BY user_id, start_us
"""


def nation_customer_lists(customer: DataFrame, top_n: int = 10) -> DataFrame:
    """Deterministic array aggregation: per nation, the sorted list of its
    lowest ``top_n`` customer keys — collect_list alone is order-
    nondeterministic across partitions; sort_array + slice pins it. The
    list is surfaced as a comma-joined string: the correctness driver's
    canonicalizer can't factorize list cells (round-1 CORRECTNESS err on
    multimodal_features), and a joined string hashes identically in both
    engines."""
    return (customer.groupBy("c_nationkey")
            .agg(F.array_join(
                     F.slice(F.sort_array(F.collect_list("c_custkey")),
                             1, top_n).cast("array<string>"), ",")
                 .alias("custkeys"),
                 F.count(F.lit(1)).alias("n_customers"))
            .orderBy("c_nationkey"))


def nation_customer_lists_oracle(top_n: int = 10) -> str:
    return f"""
SELECT c_nationkey,
       array_to_string(list_sort(list(c_custkey))[1:{top_n}], ',') AS custkeys,
       count(*) AS n_customers
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def region_nation_rollcall(region: DataFrame, nation: DataFrame) -> DataFrame:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP): each region's
    nations as one comma-joined, deterministically ordered string — the
    report-formatting aggregate (Spark 4 listagg; DuckDB string_agg with
    ORDER BY)."""
    joined = nation.join(F.broadcast(region),
                         nation.n_regionkey == region.r_regionkey)
    # DataFrame placeholder instead of a temp view: no session-global name
    # to collide under concurrent query iteration or a caller's own views
    # (round-1 VERDICT item 9).
    return joined.sparkSession.sql("""
        SELECT r_name,
               count(*) AS n_nations,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM {src}
        GROUP BY r_name
        ORDER BY r_name
    """, src=joined)


REGION_NATION_ROLLCALL_ORACLE = """
SELECT r_name, count(*) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def shipping_priority(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame,
                      segment: str = "BUILDING",
                      cutoff: str = "1998-06-01") -> DataFrame:
    """TPC-H Q3 (shipping priority): top unshipped-revenue orders for one
    market segment — orders placed before the cutoff with lineitems shipped
    after it. Adapted to the fixture schema (o_orderpriority stands in for
    o_shippriority).

    Plan shape: the segment filter prunes customer BEFORE its join (the
    filter + both date predicates push to the parquet scans), revenue
    partially aggregates map-side on l_orderkey, and the top-10 plans as
    TakeOrderedAndProject — no global sort of the aggregate."""
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (customer.where(F.col("c_mktsegment") == segment)
            .join(orders.where(F.col("o_orderdate") < cutoff),
                  F.col("c_custkey") == F.col("o_custkey"))
            .join(lineitem.where(F.col("l_shipdate") > cutoff),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(revenue.alias("rev_raw"))
            .orderBy(F.col("rev_raw").desc(), F.col("o_orderdate").asc(),
                     F.col("l_orderkey").asc())
            .limit(10)
            .select("l_orderkey", F.round("rev_raw", 4).alias("revenue"),
                    "o_orderdate", "o_orderpriority"))


def shipping_priority_oracle(segment: str = "BUILDING",
                             cutoff: str = "1998-06-01") -> str:
    return f"""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC,
         o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


def large_volume_customers(customer: DataFrame, orders: DataFrame,
                           lineitem: DataFrame,
                           min_qty: float = 250.0) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total line quantity
    exceeds ``min_qty``, with the customer attached — the aggregate-driven
    semi-join shape (IN over a grouped HAVING subquery).

    Plan shape: lineitem aggregates FIRST (map-side partial on l_orderkey),
    the HAVING filter shrinks it to the few qualifying orders, and only
    then do orders/customer join — a broadcast-ably small right side at
    any scale because the filter, not the corpus, bounds it."""
    qualifying = (lineitem.groupBy("l_orderkey")
                  .agg(F.sum("l_quantity").alias("total_qty"))
                  .where(F.col("total_qty") > min_qty))
    return (qualifying
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    F.round("total_qty", 2).alias("total_qty"))
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(100))


def large_volume_customers_oracle(min_qty: float = 250.0) -> str:
    return f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(total_qty, 2) AS total_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > {min_qty}) q
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""
