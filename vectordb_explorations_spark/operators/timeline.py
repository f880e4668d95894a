"""Event-timeline analytics the events family still lacked: gap-filled
resampling (the timescale-style `time_bucket_gapfill` + LOCF) and ordered
funnel conversion — both pure relational compositions, hash-checked.

Buckets travel as EPOCH SECONDS (BIGINT), the engine-portable convention
`events_hourly` established (relational.py:292-304) — no timestamp wire
format in the driver hash, and the bucket math (floor(epoch/step)*step) is
exact integer arithmetic identical in both engines.

Scale shape (gapfill): the grid is data-span/step rows per series — tiny
and synthesized from ONE min/max aggregate (no driver round-trip); the
events aggregate is one combinable groupBy; the grid side of the join
broadcasts. LOCF is one window per series ordered by bucket — the frame
carries the last non-null rounded value, O(grid) rows.

Scale shape (funnel): each stage is a combinable per-user min-timestamp
aggregate joined on user_id, so candidate volume shrinks monotonically
down the funnel; no window over the raw event stream, no per-user
event-list materialization (the usual funnel scale trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6

GAPFILL_STEP_S = 21_600          # 6-hour buckets
FUNNEL_WINDOW_S = 7 * 86_400     # purchase must land within 7 days of signup
FUNNEL_STAGES = ("signup", "engage", "purchase")   # engage = click or view


def events_gapfill(events: DataFrame, step_s: int = GAPFILL_STEP_S) -> DataFrame:
    """Gap-filled per-type resample: every (event_type, bucket) of the
    dense grid from floor(min ts) to max ts appears exactly once —
    n_events = 0 on empty buckets and avg_value carried forward (LOCF,
    still NULL before a series' first observation)."""
    step = F.lit(step_s).cast("long")
    ev = events.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / step) * step).alias("bucket_s"),
        "value")
    agg = (ev.groupBy("event_type", "bucket_s")
           .agg(F.count(F.lit(1)).alias("n"),
                round6(F.avg("value")).alias("avg_v")))
    span = ev.agg(F.min("bucket_s").alias("b0"), F.max("bucket_s").alias("b1"))
    # Explicit broadcast on the distinct-type side: its cardinality is
    # known-tiny (the event-type vocabulary), and the hint makes the plan
    # deterministic instead of relying on AQE's runtime stats to avoid a
    # grid-sized shuffle (r8 verdict minor).
    grid = (span.select(F.explode(
        F.sequence(F.col("b0"), F.col("b1"), step)).alias("bucket_s"))
        .crossJoin(F.broadcast(events.select("event_type").distinct())))
    w = (Window.partitionBy("event_type").orderBy("bucket_s")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(agg, ["event_type", "bucket_s"], "left")
            .select("event_type", "bucket_s",
                    F.coalesce(F.col("n"), F.lit(0)).cast("long")
                    .alias("n_events"),
                    F.last("avg_v", ignorenulls=True).over(w)
                    .alias("avg_value_locf"))
            .orderBy("event_type", "bucket_s"))


def events_gapfill_oracle(step_s: int = GAPFILL_STEP_S) -> str:
    return f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {step_s}) * {step_s} AS BIGINT) AS bucket_s,
         value
  FROM events
),
agg AS (
  SELECT event_type, bucket_s, CAST(count(*) AS BIGINT) AS n,
         {r6('avg(value)')} AS avg_v
  FROM ev GROUP BY event_type, bucket_s
),
span AS (SELECT min(bucket_s) AS b0, max(bucket_s) AS b1 FROM ev),
grid AS (
  SELECT t.event_type, g.bucket_s
  FROM (SELECT unnest(generate_series(b0, b1, {step_s})) AS bucket_s
        FROM span) g
  CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
)
SELECT grid.event_type, grid.bucket_s,
       coalesce(agg.n, 0) AS n_events,
       last_value(agg.avg_v IGNORE NULLS) OVER (
         PARTITION BY grid.event_type ORDER BY grid.bucket_s
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS avg_value_locf
FROM grid LEFT JOIN agg
  ON grid.event_type = agg.event_type AND grid.bucket_s = agg.bucket_s
ORDER BY grid.event_type, grid.bucket_s
"""


def funnel_conversion(events: DataFrame,
                      window_s: int = FUNNEL_WINDOW_S) -> DataFrame:
    """Ordered funnel signup -> engage(click|view) -> purchase: a user
    counts for a stage only with a strictly later event than their
    previous stage's FIRST occurrence, and the purchase must close within
    ``window_s`` of the first signup. Output: one row per stage with the
    reached-user count and the 6dp conversion ratio from the previous
    stage (ratio of small ints -> binary rounder)."""
    s1 = (events.where(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (events.where(F.col("event_type").isin("click", "view"))
          .join(s1, "user_id")
          .where(F.col("ts") > F.col("t1"))
          .groupBy("user_id")
          .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1")))
    s3 = (events.where(F.col("event_type") == "purchase")
          .join(s2, "user_id")
          .where((F.col("ts") > F.col("t2"))
                 # interval arithmetic, NOT unix_timestamp: Spark's
                 # unix_timestamp truncates sub-second while DuckDB's
                 # epoch() keeps it — a boundary purchase would diverge
                 & (F.col("ts") <= F.col("t1")
                    + F.expr(f"INTERVAL {window_s} SECONDS")))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    counts = (s1.agg(F.count(F.lit(1)).alias("n")).withColumn("stage_ix", F.lit(1))
              .unionByName(s2.agg(F.count(F.lit(1)).alias("n"))
                           .withColumn("stage_ix", F.lit(2)))
              .unionByName(s3.agg(F.count(F.lit(1)).alias("n"))
                           .withColumn("stage_ix", F.lit(3))))
    stage_name = F.element_at(
        F.array(*[F.lit(s) for s in FUNNEL_STAGES]), F.col("stage_ix"))
    w = Window.orderBy("stage_ix")
    prev = F.lag("n").over(w)
    conv = F.when(prev.isNull(), F.lit(None).cast("double")) \
        .otherwise(F.col("n").cast("double") / prev.cast("double"))
    return (counts
            .select(F.col("stage_ix").cast("int").alias("stage_ix"),
                    stage_name.alias("stage"),
                    F.col("n").cast("long").alias("users"),
                    round6(conv).alias("conv_from_prev"))
            .orderBy("stage_ix"))


def funnel_conversion_oracle(window_s: int = FUNNEL_WINDOW_S) -> str:
    names = ", ".join(f"'{s}'" for s in FUNNEL_STAGES)
    return f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2, any_value(s1.t1) AS t1
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type IN ('click', 'view') AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t1 + INTERVAL {window_s} SECONDS
  GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS stage_ix, CAST(count(*) AS BIGINT) AS n FROM s1
  UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM s2
  UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM s3
)
SELECT CAST(stage_ix AS INTEGER) AS stage_ix,
       ([{names}])[stage_ix] AS stage,
       n AS users,
       {r6('CAST(n AS DOUBLE) / CAST(lag(n) OVER (ORDER BY stage_ix) AS DOUBLE)')}
         AS conv_from_prev
FROM counts
ORDER BY stage_ix
"""
