"""Semantic tests for the advanced join operators (as-of, range) on
handcrafted frames — oracle parity at sf0.01 is covered by
tests/test_oracle_parity.py; these pin the edge semantics: strict
inequality at equal timestamps, no-match nulls, and pair-window bounds."""

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators import joins as J  # noqa: E402


_T0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _events(spark, rows):
    return spark.createDataFrame(
        [(uid, eid, _T0 + datetime.timedelta(seconds=sec), etype, float(val))
         for uid, eid, sec, etype, val in rows],
        "user_id long, event_id long, ts timestamp, event_type string, value double")


def test_asof_strictly_earlier_click(spark):
    # click at t=5 and purchase at t=5: same instant is NOT a match;
    # the click at t=2 is.
    df = _events(spark, [
        (1, 10, 2, "click", 0.0),
        (1, 11, 5, "click", 0.0),
        (1, 12, 5, "purchase", 9.5),
    ])
    rows = {r["purchase_id"]: r for r in J.asof_join_purchase_click(df).collect()}
    assert rows[12]["last_click_id"] == 10
    assert rows[12]["us_since_click"] == 3_000_000


def test_asof_no_prior_click_is_null(spark):
    df = _events(spark, [
        (2, 20, 1, "purchase", 1.0),
        (2, 21, 3, "click", 0.0),
        (2, 22, 4, "purchase", 2.0),
    ])
    rows = {r["purchase_id"]: r for r in J.asof_join_purchase_click(df).collect()}
    assert rows[20]["last_click_id"] is None
    assert rows[20]["us_since_click"] is None
    assert rows[22]["last_click_id"] == 21


def test_asof_ties_pick_latest_click_id(spark):
    # Two clicks at the same microsecond: the larger click_id wins
    # (matches the oracle's ORDER BY click_us DESC, click_id DESC).
    df = _events(spark, [
        (3, 30, 2, "click", 0.0),
        (3, 31, 2, "click", 0.0),
        (3, 32, 6, "purchase", 4.0),
    ])
    rows = {r["purchase_id"]: r for r in J.asof_join_purchase_click(df).collect()}
    assert rows[32]["last_click_id"] == 31


def test_range_join_window_bound(spark):
    # pairs within 5 min: (40,41) at 0s/299s in; (40,42) at 0s/301s out;
    # (41,42) at 299s/301s in. Different users never pair.
    df = _events(spark, [
        (4, 40, 0, "click", 0.0),
        (4, 41, 299, "view", 0.0),
        (4, 42, 301, "purchase", 1.0),
        (5, 43, 0, "click", 0.0),
    ])
    out = {(r["type_a"], r["type_b"]): r["n_pairs"]
           for r in J.range_join_event_pairs(df).collect()}
    assert out == {("click", "view"): 1, ("view", "purchase"): 1}


def test_approx_percentile_close_to_exact(spark, sf_dir):
    # approx_percentile (t-digest) is the scale path; gate on relative
    # error vs the exact interpolated percentile, never on hashes.
    from vectordb_explorations_spark.sources.catalog import load_table
    from pyspark.sql import functions as F
    ev = load_table(spark, "events", sf_dir)
    row = ev.agg(
        F.expr("percentile(value, 0.9)").alias("exact"),
        F.expr("approx_percentile(value, 0.9, 1000)").alias("approx")).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    # HLL-sketch distinct counting is the 100 TB path (count_distinct
    # shuffles every distinct value; approx ships fixed-size sketches) —
    # gated on relative error, never hashed.
    from vectordb_explorations_spark.sources.catalog import load_table
    from pyspark.sql import functions as F
    orders = load_table(spark, "orders", sf_dir)
    row = orders.agg(
        F.count_distinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", 0.02).alias("approx")).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
