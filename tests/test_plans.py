"""Plan-quality regression net: the physical properties PLANS.md documents
must hold for every declared query — a query silently falling out of
codegen into Python, or losing pushdown, is a perf bug even while results
stay correct."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

QUERIES = entry_mod.queries()

# The only declared queries allowed to run Python (deliberate Arrow-batched
# paths: blockwise k-NN, the multimodal byte-payload stages, and the
# grouped-agg pandas UDAF that IS the custom-aggregate surface demo).
PYTHON_ALLOWED = {"knn_batch_blockwise", "multimodal_features",
                  "multimodal_frames", "multimodal_resize",
                  "lang_geomean_chars"}


def _plan(spark, sf_dir, name):
    return (QUERIES[name](spark, sf_dir)._jdf
            .queryExecution().executedPlan().toString())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_python_in_declared_plans(name, spark, sf_dir):
    if name in PYTHON_ALLOWED:
        pytest.skip("Arrow-batched by design")
    plan = _plan(spark, sf_dir, name)
    # "Python" catches Batch/ArrowEvalPython (row/scalar UDFs);
    # MapInPandas/FlatMapGroupsInPandas are the grouped Arrow operators.
    for marker in ("Python", "MapInPandas", "InPandas"):
        assert marker not in plan, f"{name} fell off the JVM path ({marker})"


@pytest.mark.parametrize("name", ["knn_exact", "sql_knn"])
def test_topk_plans_take_ordered(name, spark, sf_dir):
    assert "TakeOrderedAndProject" in _plan(spark, sf_dir, name)


@pytest.mark.parametrize("name,pushed", [
    ("pricing_summary", "LessThanOrEqual(l_shipdate"),
    ("asof_join", "EqualTo(event_type,click)"),
    ("customers_with_open_orders", "EqualTo(o_orderstatus,O)"),
])
def test_filters_reach_parquet_scan(name, pushed, spark, sf_dir):
    plan = _plan(spark, sf_dir, name)
    assert pushed in plan, f"{name}: filter not pushed to scan"


def test_cube_uses_single_expand(spark, sf_dir):
    plan = _plan(spark, sf_dir, "cube_order_stats")
    assert plan.count("Expand") >= 1
    # one Expand, not a union of per-grouping-set scans
    assert plan.count("FileScan parquet") == 1
