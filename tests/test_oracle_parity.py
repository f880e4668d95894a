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


# Types DuckDB can emit that Spark cannot: the driver hashes TYPED output,
# so an oracle column of one of these fails the hash even when every value
# matches (DuckDB promotes SUM(BIGINT) — including window sums — to HUGEINT).
# The value-level compare above normalizes via Python ints and provably
# cannot catch this class; this binding-level guard closes it.
_DUCK_TYPES_SPARK_CANNOT_EMIT = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                                 "USMALLINT", "UTINYINT", "TIME", "INTERVAL",
                                 "BIT", "UUID"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_only_spark_types(name, sf_dir):
    from tests.oracle_utils import duck_connection
    con = duck_connection(sf_dir)
    try:
        rel = con.sql(ORACLES[name])  # lazy bind: types without execution
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t).upper() in _DUCK_TYPES_SPARK_CANNOT_EMIT]
    finally:
        con.close()
    assert not bad, (f"{name}: oracle emits DuckDB-only types {bad}; "
                     f"CAST them (e.g. AS BIGINT) so the driver's typed "
                     f"hash can match Spark")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["query_id", "vec_id", "dist", "rank"]
