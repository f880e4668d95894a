"""Data-quality audit: one-scan shape, metric correctness against direct
queries, and null-extent behavior on a column that actually has nulls."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_explorations_spark.operators import quality as QA  # noqa: E402
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


def test_metrics_match_direct_queries(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    audit = {r["col_name"]: r for r in
             QA.table_quality_audit(orders).collect()}
    n = orders.count()
    for c, _ in QA.ORDERS_AUDIT_COLS:
        assert audit[c]["n_rows"] == n
        assert audit[c]["n_null"] == orders.where(F.col(c).isNull()).count()
        assert audit[c]["n_distinct"] == \
            orders.select(c).distinct().where(F.col(c).isNotNull()).count()
    assert audit["o_totalprice"]["min_num"] == \
        orders.agg(F.min("o_totalprice")).first()[0]
    assert audit["o_orderstatus"]["min_txt"] is not None
    assert audit["o_orderstatus"]["min_num"] is None


def test_single_scan(spark, sf_dir):
    """The audit must not rescan the table per column: one parquet scan
    in the plan (the one-row aggregate computes every metric)."""
    orders = load_table(spark, "orders", sf_dir)
    plan = (QA.table_quality_audit(orders)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("orders.parquet") == 1


def test_nulls_counted(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, None)], "k long, v double")
    audit = {r["col_name"]: r for r in
             QA.table_quality_audit(df, (("k", "num"), ("v", "num"))).collect()}
    assert audit["v"]["n_null"] == 2
    assert audit["v"]["n_distinct"] == 1
    assert audit["v"]["min_num"] == 5.0 == audit["v"]["max_num"]
