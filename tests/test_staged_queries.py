"""Drift tripwire for the round-13 staging registry (inventory
STAGED_QUERIES / STAGED_ORACLES): every staged operator must keep
hash-matching its DuckDB oracle between the round that built it and
the round that declares it — the same compare the driver's correctness
gate runs, at the sf0.01 gate scale."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_utils import compare  # noqa: E402

from vectordb_explorations_spark.plans.inventory import (  # noqa: E402
    NON_SQL_QUERIES, QUERIES, STAGED_ORACLES, STAGED_QUERIES)

SF = "/root/testdata/sf0.01"


def test_staging_registry_well_formed():
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)
    assert not set(STAGED_QUERIES) & set(QUERIES)
    assert not set(STAGED_QUERIES) & NON_SQL_QUERIES


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(name, spark):
    ok, detail = compare(STAGED_QUERIES[name](spark, SF),
                         STAGED_ORACLES[name], SF, verbose=False)
    assert ok, f"{name}: {detail}"
