"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship batch k-NN join on sf0.001;
``queries()`` exposes the full declared inventory (SURVEY.md §2 plus the
north-star dedup / text / multimodal extensions) and ``oracle_sql()`` the
DuckDB twin for every entry — all queries are deterministic with total
ordering and 6-dp-rounded doubles (SURVEY §7 determinism contract).
Approximate ANN paths are intentionally not declared here: they are
recall-gated against the exact path in tests/test_ann.py (SURVEY §0).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def _inventory():
    from vectordb_explorations_spark.plans import inventory
    return inventory


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    inv = _inventory()
    return inv.q_knn_batch(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_inventory().QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every declared query."""
    return dict(_inventory().ORACLES)
