"""Advanced join operators: as-of (point-in-time) and range joins —
SURVEY §2.2 lists these among the join kinds absent from the reference.

Spark has no native AS OF join; the scalable formulation here is the
union + carry-forward-window pattern: tag both streams, sort within the
partition key, and carry the last match forward — one shuffle on the key,
no per-row subqueries, no skew beyond the key's own distribution. The range
join stays an equi-join on the blocking key with the range predicate
applied post-join (Catalyst evaluates it inside the join), so row explosion
is bounded by the key group size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_purchase_click(events: DataFrame) -> DataFrame:
    """For every `purchase` event: the strictly-most-recent prior `click`
    by the same user (classic point-in-time correctness join for feature
    pipelines).

    Implementation: union the two tagged streams, sort by (t_us, tag,
    event_id) within each user — purchases sort before same-instant clicks,
    making the match *strictly* earlier — and carry the last click forward
    with last_value(ignoreNulls) over the running window.
    """
    base = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us"),
        "event_type", "value")
    clicks = base.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("t_us").alias("click_us"), F.lit(1).alias("tag"))
    purchases = base.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("t_us").alias("p_us"), F.col("value").alias("purchase_value"))
    tagged = (purchases
              .select("user_id", F.col("p_us").alias("t_us"),
                      F.lit(0).alias("tag"), "purchase_id", "purchase_value",
                      F.lit(None).cast("long").alias("click_id"),
                      F.lit(None).cast("long").alias("click_us"))
              .unionByName(
                  clicks.select("user_id", F.col("click_us").alias("t_us"),
                                "tag",
                                F.lit(None).cast("long").alias("purchase_id"),
                                F.lit(None).cast("double").alias("purchase_value"),
                                "click_id", "click_us")))
    w = (Window.partitionBy("user_id")
         .orderBy("t_us", "tag", F.coalesce("click_id", "purchase_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged.select(
        "user_id", "purchase_id", F.col("t_us").alias("purchase_us"),
        "purchase_value",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last("click_us", ignorenulls=True).over(w).alias("last_click_us"))
    return (carried.where(F.col("purchase_id").isNotNull())
            .select("user_id", "purchase_id", "purchase_us",
                    F.round("purchase_value", 6).alias("purchase_value"),
                    "last_click_id", "last_click_us",
                    (F.col("purchase_us") - F.col("last_click_us")).alias("us_since_click"))
            .orderBy("user_id", "purchase_id"))


ASOF_JOIN_ORACLE = """
WITH base AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t_us, event_type, value
  FROM events
), p AS (
  SELECT user_id, event_id AS purchase_id, t_us AS purchase_us,
         round(value, 6) AS purchase_value
  FROM base WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, t_us AS click_us
  FROM base WHERE event_type = 'click'
), matched AS (
  SELECT p.*,
         (SELECT c.click_id FROM c
          WHERE c.user_id = p.user_id AND c.click_us < p.purchase_us
          ORDER BY c.click_us DESC, c.click_id DESC LIMIT 1) AS last_click_id,
         (SELECT c.click_us FROM c
          WHERE c.user_id = p.user_id AND c.click_us < p.purchase_us
          ORDER BY c.click_us DESC, c.click_id DESC LIMIT 1) AS last_click_us
  FROM p
)
SELECT user_id, purchase_id, purchase_us, purchase_value,
       last_click_id, last_click_us,
       purchase_us - last_click_us AS us_since_click
FROM matched
ORDER BY user_id, purchase_id
"""


def range_join_event_pairs(events: DataFrame,
                           window_minutes: int = 5) -> DataFrame:
    """Interval/range join: per user, count pairs of distinct events within
    ``window_minutes`` of each other, by event-type pair. Equi-key on
    user_id bounds the quadratic term to each user's own history."""
    base = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us"), "event_type")
    a = base.select("user_id", F.col("event_id").alias("id_a"),
                    F.col("t_us").alias("ta"), F.col("event_type").alias("type_a"))
    b = base.select("user_id", F.col("event_id").alias("id_b"),
                    F.col("t_us").alias("tb"), F.col("event_type").alias("type_b"))
    win_us = window_minutes * 60 * 1_000_000
    pairs = (a.join(b, "user_id")
             .where((F.col("id_a") < F.col("id_b"))
                    & (F.abs(F.col("ta") - F.col("tb")) <= win_us)))
    return (pairs.groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("type_a", "type_b"))


def range_join_oracle(window_minutes: int = 5) -> str:
    win_us = window_minutes * 60 * 1_000_000
    return f"""
WITH base AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t_us, event_type FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_pairs
FROM base a JOIN base b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(a.t_us - b.t_us) <= {win_us}
GROUP BY type_a, type_b
ORDER BY type_a, type_b
"""
