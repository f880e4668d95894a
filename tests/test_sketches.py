"""Sketch aggregations are gated against exact answers on the same data
(the recall-gate pattern for approximate ops): HLL within a multiple of
its configured rsd, approximate quantiles within the rank-error bound."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators.sketches import (  # noqa: E402
    HLL_RSD, approx_distinct_users, approx_value_quantiles)
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


def test_hll_within_error_bound(spark, sf_dir):
    rows = approx_distinct_users(load_table(spark, "events", sf_dir)).collect()
    assert rows
    for r in rows:
        exact = r["exact_users"]
        # 4 sigma of the configured rsd (+1 absolute slack for tiny groups)
        tol = 4 * HLL_RSD * exact + 1
        assert abs(r["approx_users"] - exact) <= tol, (r, tol)


def test_hll_is_partitioning_invariant(spark, sf_dir):
    """The sketch merge must give the same estimate however the corpus is
    partitioned — that is what makes it a combinable distributed agg."""
    ev = load_table(spark, "events", sf_dir)
    a = {r["event_type"]: r["approx_users"]
         for r in approx_distinct_users(ev).collect()}
    b = {r["event_type"]: r["approx_users"]
         for r in approx_distinct_users(ev.repartition(17)).collect()}
    assert a == b


def test_quantiles_within_rank_error(spark, sf_dir):
    """percentile_approx guarantees rank error <= n/accuracy: the returned
    value must be an element whose sorted position is within that many
    ranks of the true quantile position (checked exactly against the
    collected per-group values — the fixture groups are small)."""
    import math

    from vectordb_explorations_spark.operators.sketches import (
        QUANTILE_ACCURACY)

    ev = load_table(spark, "events", sf_dir)
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    rows = approx_value_quantiles(ev).collect()
    assert rows
    for r in rows:
        v = sorted(vals[r["event_type"]])
        n = len(v)
        slack = math.ceil(n / QUANTILE_ACCURACY) + 1
        for p, approx in zip((0.5, 0.9, 0.99), r["approx_q"]):
            pos = p * (n - 1)
            lo = max(0, math.floor(pos) - slack)
            hi = min(n - 1, math.ceil(pos) + slack)
            assert v[lo] <= approx <= v[hi], (r["event_type"], p, approx,
                                              v[lo], v[hi])
