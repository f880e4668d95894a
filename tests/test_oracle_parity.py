"""The local twin of the driver's correctness gate: every declared query in
__spark_entry__.queries() is compared against its DuckDB oracle — row count,
column names, and order-insensitive 6-dp-rounded values (t2 protocol)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle_utils import compare  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_an_oracle():
    from vectordb_explorations_spark.plans.inventory import NON_SQL_QUERIES
    assert set(QUERIES) - set(ORACLES) == NON_SQL_QUERIES
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, sf_dir):
    if name not in ORACLES:
        # rows-only check (the driver's fallback for non-SQL ops):
        # non-empty, stable schema, deterministic across runs
        df = QUERIES[name](spark, sf_dir)
        rows = sorted(map(tuple, df.collect()))
        assert len(rows) > 0
        again = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        assert rows == again
        return
    ok, detail = compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir,
                         verbose=False)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["query_id", "vec_id", "dist", "rank"]
