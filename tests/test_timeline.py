"""Timeline analytics: gap-fill density/LOCF semantics on a handcrafted
series, funnel ordering semantics (strictly-later stages, closing window),
and fixture-level sanity."""

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_explorations_spark.operators import timeline as TL  # noqa: E402
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h), u, t, v, None)
         for i, (d, h, u, t, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def test_gapfill_dense_grid_and_locf(spark):
    # one series, observations at buckets 0 and 3 (6h apart each step)
    rows = [(1, 0, 1, "click", 10.0), (1, 18, 1, "click", 30.0)]
    out = TL.events_gapfill(_ev(spark, rows)).collect()
    assert len(out) == 4  # buckets 00,06,12,18 — gaps filled
    by_bucket = sorted(out, key=lambda r: r["bucket_s"])
    assert [r["n_events"] for r in by_bucket] == [1, 0, 0, 1]
    # LOCF: empty buckets carry the last observed avg
    assert [r["avg_value_locf"] for r in by_bucket] == [10.0, 10.0, 10.0, 30.0]


def test_gapfill_null_before_first_observation(spark):
    rows = [(1, 0, 1, "click", 1.0), (1, 12, 1, "view", 5.0)]
    out = {(r["event_type"], r["bucket_s"]): r
           for r in TL.events_gapfill(_ev(spark, rows)).collect()}
    views = sorted((b, r) for (t, b), r in out.items() if t == "view")
    # view has no observation in the first buckets: LOCF stays NULL
    assert views[0][1]["avg_value_locf"] is None
    assert views[-1][1]["avg_value_locf"] == 5.0


def test_funnel_requires_strict_order_and_window(spark):
    rows = [  # (day, hour, user_id, event_type, value)
        # user 1: full ordered funnel within the window
        (1, 0, 1, "signup", 0.0), (1, 6, 1, "click", 0.0),
        (2, 0, 1, "purchase", 0.0),
        # user 2: purchase BEFORE engage — must not reach stage 3
        (1, 0, 2, "signup", 0.0), (2, 0, 2, "purchase", 0.0),
        (3, 0, 2, "view", 0.0),
        # user 3: purchase outside the 7-day window (signup day 1,
        # purchase day 20)
        (1, 0, 3, "signup", 0.0), (2, 0, 3, "click", 0.0),
        (20, 0, 3, "purchase", 0.0),
        # user 4: engage only (no signup) — enters no stage
        (1, 0, 4, "click", 0.0),
    ]
    out = {r["stage"]: r["users"]
           for r in TL.funnel_conversion(_ev(spark, rows)).collect()}
    assert out == {"signup": 3, "engage": 3, "purchase": 1}


def test_fixture_funnel_monotone(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    rows = TL.funnel_conversion(ev).collect()
    users = [r["users"] for r in sorted(rows, key=lambda r: r["stage_ix"])]
    assert users[0] >= users[1] >= users[2] > 0
