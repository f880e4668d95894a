"""Cohort retention and transition-matrix semantics on handcrafted
streams, plus fixture-level invariants (retention row 0 is 1.0, matrix
rows are probability distributions)."""

import os
import sys
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators import cohorts as CO  # noqa: E402
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


def _ev(spark, rows):
    base = datetime(2024, 1, 4)  # a Thursday: epoch-week boundaries apply
    return spark.createDataFrame(
        [(i, base + timedelta(days=d, hours=h), u, t, 1.0, None)
         for i, (d, h, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def test_retention_triangle(spark):
    rows = [
        # users 1,2 start week 0; user 1 returns week 1, nobody in week 2;
        # user 2 returns week 3
        (0, 1, 1, "view"), (1, 1, 2, "view"),
        (7, 1, 1, "click"),
        (21, 1, 2, "click"),
    ]
    out = {(r["cohort_week_s"], r["week_offset"]): (r["n_active"], r["retention"])
           for r in CO.cohort_retention(_ev(spark, rows)).collect()}
    cohorts = {c for c, _ in out}
    assert len(cohorts) == 1
    (c,) = cohorts
    assert out[(c, 0)] == (2, 1.0)
    assert out[(c, 1)][0] == 1 and out[(c, 1)][1] == 0.5
    assert (c, 2) not in out           # no activity -> no row
    assert out[(c, 3)] == (1, 0.5)


def test_transitions_ordered_per_user(spark):
    rows = [
        (0, 1, 1, "view"), (0, 2, 1, "click"), (0, 3, 1, "view"),
        (0, 1, 2, "view"), (0, 2, 2, "click"),
    ]
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in CO.event_transition_matrix(_ev(spark, rows)).collect()}
    # two view->click (users 1 and 2), one click->view (user 1 only —
    # transitions never cross users)
    assert out[("view", "click")] == (2, 1.0)
    assert out[("click", "view")] == (1, 1.0)
    assert ("click", "click") not in out


def test_fixture_invariants(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    ret = CO.cohort_retention(ev).collect()
    for r in ret:
        if r["week_offset"] == 0:
            assert r["retention"] == 1.0
        assert 0.0 < r["retention"] <= 1.0
    rows = {}
    for r in CO.event_transition_matrix(ev).collect():
        rows.setdefault(r["from_type"], []).append(r["p"])
        assert r["n"] > 0
    for probs in rows.values():
        assert abs(sum(probs) - 1.0) < 1e-4
