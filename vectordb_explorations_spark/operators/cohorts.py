"""Cohort and sequence analytics over the events stream — the two classic
product-analytics shapes the window/aggregation families didn't yet cover:

- cohort retention: users grouped by signup week, tracked by how many are
  active k weeks later (the triangle matrix every growth dashboard draws);
- transition matrix: first-order Markov counts of consecutive event types
  within a user's ordered stream (lang_confusion's shape applied to
  SEQUENCES — lag over a per-user window instead of a per-doc pair).

Both are exact integer aggregations with r6-rounded ratios (ratio of small
ints -> binary rounder), hash-checked.

Scale shape (retention): one per-user min-timestamp aggregate (combinable)
joined back to the stream — the classic self-join trap avoided: activity
weeks aggregate BEFORE the cohort join, so the join carries (user, week)
distinct rows, not raw events.

Scale shape (transitions): one window lag per user (single hash exchange
on user_id) then a combinable (from, to) count — no self-join, no
per-user event-list materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6

WEEK_S = 7 * 86_400
RETENTION_MAX_WEEKS = 4


def cohort_retention(events: DataFrame,
                     max_weeks: int = RETENTION_MAX_WEEKS) -> DataFrame:
    """(cohort_week_s, week_offset, n_active, retention): users cohorted
    by the week of their FIRST event; a (cohort, offset) row counts the
    cohort members with any activity in cohort_week + offset. Weeks are
    epoch-second integers floor-divided by 7 days — exact and identical
    in both engines."""
    week = (F.floor(F.unix_timestamp("ts") / F.lit(WEEK_S).cast("long"))
            * F.lit(WEEK_S).cast("long"))
    ev = events.select("user_id", week.alias("week_s"))
    first = ev.groupBy("user_id").agg(F.min("week_s").alias("cohort_week_s"))
    active = ev.distinct()
    joined = (active.join(first, "user_id")
              .select("user_id", "cohort_week_s",
                      ((F.col("week_s") - F.col("cohort_week_s"))
                       / F.lit(WEEK_S)).cast("long").alias("week_offset"))
              .where(F.col("week_offset") <= max_weeks))
    counts = (joined.groupBy("cohort_week_s", "week_offset")
              .agg(F.count_distinct("user_id").alias("n_active")))
    size = Window.partitionBy("cohort_week_s")
    cohort_n = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))) \
        .over(size)
    return (counts
            .select("cohort_week_s",
                    F.col("week_offset").cast("int").alias("week_offset"),
                    F.col("n_active").cast("long").alias("n_active"),
                    round6(F.col("n_active").cast("double")
                           / cohort_n.cast("double")).alias("retention"))
            .orderBy("cohort_week_s", "week_offset"))


def cohort_retention_oracle(max_weeks: int = RETENTION_MAX_WEEKS) -> str:
    return f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / {WEEK_S}) * {WEEK_S} AS BIGINT) AS week_s
  FROM events
),
first AS (SELECT user_id, min(week_s) AS cohort_week_s
          FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week_s FROM ev),
joined AS (
  SELECT a.user_id, f.cohort_week_s,
         CAST((a.week_s - f.cohort_week_s) // {WEEK_S} AS BIGINT)
           AS week_offset
  FROM active a JOIN first f ON a.user_id = f.user_id
  WHERE (a.week_s - f.cohort_week_s) // {WEEK_S} <= {max_weeks}
),
counts AS (
  SELECT cohort_week_s, week_offset,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM joined GROUP BY cohort_week_s, week_offset
)
SELECT cohort_week_s, CAST(week_offset AS INTEGER) AS week_offset, n_active,
       {r6('''CAST(n_active AS DOUBLE) / CAST(max(CASE WHEN week_offset = 0
            THEN n_active END) OVER (PARTITION BY cohort_week_s) AS DOUBLE)''')}
         AS retention
FROM counts
ORDER BY cohort_week_s, week_offset
"""


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """(from_type, to_type, n, p): counts of consecutive event-type pairs
    in each user's timestamp-ordered stream (event_id tie-break), with
    the row-normalized transition probability."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (events
             .select("user_id", "ts", "event_id",
                     F.col("event_type").alias("to_type"),
                     F.lag("event_type").over(w).alias("from_type"))
             .where(F.col("from_type").isNotNull()))
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n"))
    row = Window.partitionBy("from_type")
    return (counts
            .select("from_type", "to_type", F.col("n").cast("long").alias("n"),
                    round6(F.col("n").cast("double")
                           / F.sum("n").over(row).cast("double")).alias("p"))
            .orderBy("from_type", "to_type"))


def event_transition_matrix_oracle() -> str:
    return f"""
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       {r6('''CAST(n AS DOUBLE) / CAST(sum(n) OVER
            (PARTITION BY from_type) AS DOUBLE)''')} AS p
FROM counts
ORDER BY from_type, to_type
"""
