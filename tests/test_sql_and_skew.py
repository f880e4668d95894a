"""Tests for the SQL-text surface (SQL scalar functions stay JVM-side) and
the salted-aggregation skew pattern (result invariant under salt count)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_explorations_spark.operators import skew as SK  # noqa: E402
from vectordb_explorations_spark.plans import sql_api as Q  # noqa: E402
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


def test_sql_functions_inline_to_native_exprs(spark):
    Q.register_functions(spark)
    row = spark.sql(
        "SELECT l2_dist(array(1.0f,2.0f), array(4.0f,6.0f)) AS d, "
        "l2_norm(array(3.0f,4.0f)) AS n, "
        "cosine_sim(array(1.0f,0.0f), array(1.0f,0.0f)) AS c, "
        "ip_sim(array(1.0f,2.0f), array(3.0f,4.0f)) AS ip").first()
    assert row["d"] == 5.0 and row["n"] == 5.0 and abs(row["c"] - 1.0) < 1e-12
    assert row["ip"] == 11.0
    plan = spark.sql(
        "SELECT l2_dist(array(1.0f), array(2.0f))")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Python" not in plan  # inlined, not a Python UDF


def test_salting_invariant_under_salt_count(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    r4 = sorted(map(tuple, SK.salted_event_type_stats(ev, num_salts=4).collect()))
    r64 = sorted(map(tuple, SK.salted_event_type_stats(ev, num_salts=64).collect()))
    assert r4 == r64


def test_salted_spreads_hot_keys(spark, sf_dir):
    # The phase-1 grouping key space must be keys x salts, i.e. strictly
    # finer than the key space — that's the whole point of the salt.
    ev = load_table(spark, "events", sf_dir)
    n_keys = ev.select("event_type").distinct().count()
    from pyspark.sql import functions as F
    partial_groups = (ev.withColumn(
        "salt", F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(16)))
        .groupBy("event_type", "salt").count().count())
    assert partial_groups > n_keys


def test_chunk_ranges_udtf_matches_doc_chunks(spark, sf_dir):
    """The row-at-a-time UDTF surface emits the same window math as the
    declared codegen twin (sampling.doc_chunks) — lateral-join it against
    real token counts and compare (doc_id, chunk_id, start, len) sets."""
    from vectordb_explorations_spark.operators.sampling import doc_chunks
    from vectordb_explorations_spark.plans.sql_api import (
        register_chunk_ranges_udtf)
    from vectordb_explorations_spark.sources.catalog import load_table

    register_chunk_ranges_udtf(spark)
    docs = load_table(spark, "documents", sf_dir)
    docs.select("doc_id", F.size(F.split("text", " ")).alias("n")) \
        .createOrReplaceTempView("doc_tokens")
    via_udtf = spark.sql("""
        SELECT t.doc_id, c.chunk_id, c.chunk_start, c.chunk_len
        FROM doc_tokens t, LATERAL chunk_ranges(t.n, 32, 24) c
    """)
    expected = doc_chunks(docs).select(
        "doc_id", "chunk_id", "chunk_start", "chunk_len")
    assert sorted(map(tuple, via_udtf.collect())) == \
        sorted(map(tuple, expected.collect()))
