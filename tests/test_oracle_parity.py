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
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, sf_dir):
    ok, detail = compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir,
                         verbose=False)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["query_id", "vec_id", "dist", "rank"]
