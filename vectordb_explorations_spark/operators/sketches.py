"""Approximate sketch aggregations: HyperLogLog distinct counts and
KLL/GK-style quantiles.

At 100 TB these are not conveniences — they are the difference between a
plan that works and one that doesn't. An exact COUNT(DISTINCT user_id)
shuffles every distinct key; the HLL sketch is a fixed-size (KBs)
map-side-combinable state whatever the cardinality, so the shuffle carries
one sketch per group per partition. Same for percentile_approx vs an exact
sort-based percentile. Spark's built-ins (`approx_count_distinct`,
`percentile_approx`) are JVM-side Catalyst aggregates — no UDF.

Like the ANN families, sketch outputs are APPROXIMATE and engine-specific,
so they are never hash-matched against DuckDB (SURVEY §0's treatment of
stochastic/approximate ops); tests/test_sketches.py gates them against the
exact answers computed on the same data — |approx - exact| within the
documented error bound (rsd for HLL, accuracy rank-error for quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HLL_RSD = 0.05           # HLL relative standard deviation (2.5x default precision)
QUANTILE_ACCURACY = 1000  # percentile_approx rank-error 1/accuracy


def approx_distinct_users(events: DataFrame,
                          rsd: float = HLL_RSD) -> DataFrame:
    """Per-event-type approximate distinct users (HLL) next to the exact
    count — the audit pair; production plans at scale drop the exact
    column and keep the sketch."""
    return (events.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"),
                 F.countDistinct("user_id").alias("exact_users"),
                 F.count(F.lit(1)).alias("n_events"))
            .orderBy("event_type"))


def approx_value_quantiles(events: DataFrame,
                           accuracy: int = QUANTILE_ACCURACY) -> DataFrame:
    """Per-event-type approximate value quantiles (p50/p90/p99) with the
    exact percentiles alongside for the gate."""
    probs = [0.5, 0.9, 0.99]
    return (events.groupBy("event_type")
            .agg(F.percentile_approx("value", probs, accuracy).alias("approx_q"),
                 F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("exact_q"),
                 F.count(F.lit(1)).alias("n_events"))
            .orderBy("event_type"))
