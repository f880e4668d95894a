"""Skew-mitigation patterns: salted two-phase aggregation (and the config
knobs that make AQE handle skewed joins at runtime).

At 100 TB a groupBy on a low-cardinality or power-law key (event_type here:
a handful of values across billions of rows) funnels whole key populations
through single reducers. Salting splits each hot key across ``num_salts``
reducers in a first partial aggregation, then merges the per-salt partials
in a second, tiny aggregation — the logical result is identical, which the
DuckDB oracle (a plain GROUP BY) pins.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in the
session factory) covers the join-side analog at runtime; this module is the
explicit, planner-independent pattern for aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6


def salted_event_type_stats(events: DataFrame, num_salts: int = 16) -> DataFrame:
    """Event-type statistics via salted two-phase aggregation.

    Phase 1 groups by (event_type, salt) — the map-side combine plus the
    salted shuffle spread each hot key over ``num_salts`` reducers; phase 2
    merges the partials per key (rows in phase 2 = keys × salts, trivially
    small). All aggregates used are decomposable: count/sum merge by sum,
    min/max by min/max; avg is derived at the end from the merged sums.
    """
    salt = F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(num_salts))
    partial = (events
               .withColumn("salt", salt)
               .groupBy("event_type", "salt")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("value").alias("sum_v"),
                    F.min("value").alias("min_v"),
                    F.max("value").alias("max_v")))
    return (partial.groupBy("event_type")
            .agg(F.sum("n").alias("n_events"),
                 F.round(F.sum("sum_v"), 6).alias("sum_value"),
                 F.round(F.min("min_v"), 6).alias("min_value"),
                 F.round(F.max("max_v"), 6).alias("max_value"),
                 round6(F.sum("sum_v") / F.sum("n")).alias("avg_value"))
            .orderBy("event_type"))


SALTED_EVENT_TYPE_STATS_ORACLE = f"""
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       {r6('sum(value) / count(*)')} AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""
