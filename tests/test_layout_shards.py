"""Z-order layout and deterministic-global-shuffle shard tests: the
interleave must match a pure-Python reference bit for bit, z-clustering
must produce measurably tighter 2-D bounding boxes than single-column
sorting, and hash sharding must balance without moving a shard between
runs."""

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators.layout import (  # noqa: E402
    ZORDER_BITS, cluster_by_zorder, zorder_key, zorder_key_py, zorder_layout)
from vectordb_explorations_spark.operators.sampling import (  # noqa: E402
    TRAINING_SHARDS, global_shuffle, training_shard_manifest)
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402

CELL = st.integers(min_value=0, max_value=(1 << ZORDER_BITS) - 1)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(CELL, CELL), min_size=1, max_size=32))
def test_zorder_key_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y",
                     zorder_key(F.col("x"), F.col("y")).alias("z")).collect()}
    for x, y in pairs:
        assert got[(x, y)] == zorder_key_py(x, y)


def test_zorder_key_py_known_values():
    # Morton order of the 2x2 grid is the N-shaped curve 0,1,2,3.
    assert [zorder_key_py(x, y, 1) for y in (0, 1) for x in (0, 1)] == [0, 1, 2, 3]
    # x fills even bit positions, y odd.
    assert zorder_key_py(0b11, 0, 2) == 0b0101
    assert zorder_key_py(0, 0b11, 2) == 0b1010


def test_zorder_buckets_are_local_in_both_dims(spark, sf_dir):
    """Every z-bucket's bounding box must be a small tile: a 16-bit key cut
    at >>8 fixes the top 4 bits of each dimension, so each bucket spans at
    most a 16x16 cell tile of the 256x256 grid — 1/256 of the area a
    single-column sort leaves in its unsorted dimension."""
    rows = zorder_layout(load_table(spark, "orders", sf_dir)).collect()
    assert sum(r["n_orders"] for r in rows) == \
        load_table(spark, "orders", sf_dir).count()
    for r in rows:
        assert r["x_max"] - r["x_min"] < 16
        assert r["y_max"] - r["y_min"] < 16
        assert r["cell_area"] <= 256


def test_cluster_by_zorder_files_have_tight_ranges(spark, sf_dir, tmp_path):
    """Writing through cluster_by_zorder yields parquet files whose
    per-file custkey ranges are fragments of the domain — the min/max
    footer stats a pruned scan keys on. An unclustered write of the same
    frame leaves every file spanning ~the full domain."""
    orders = load_table(spark, "orders", sf_dir)
    zk = zorder_key(F.col("o_custkey") % 256,
                    (F.dayofyear("o_orderdate") - 1) % 256)
    out = str(tmp_path / "zorders")
    cluster_by_zorder(orders, zk, num_partitions=8).write.parquet(out)
    per_file = (spark.read.parquet(out)
                .groupBy(F.input_file_name())
                .agg((F.max("o_custkey") - F.min("o_custkey")).alias("span"))
                .collect())
    assert len(per_file) >= 4
    domain = (orders.agg(F.max("o_custkey") - F.min("o_custkey"))
              .first()[0])
    # at least half the files cover a fraction of the key domain
    tight = [r for r in per_file if r["span"] <= domain * 0.75]
    assert len(tight) >= len(per_file) // 2, [r["span"] for r in per_file]


def test_global_shuffle_is_stable_and_balanced(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    n = docs.count()
    m = training_shard_manifest(docs).collect()
    assert len(m) == TRAINING_SHARDS
    assert sum(r["n_docs"] for r in m) == n
    # hash balance: no shard more than 2x the ideal share
    assert max(r["n_docs"] for r in m) <= 2 * (n / TRAINING_SHARDS)
    # assignment is a pure function of doc_id: re-running moves nothing
    a = {r["doc_id"]: r["shard_id"]
         for r in global_shuffle(docs).select("doc_id", "shard_id").collect()}
    b = {r["doc_id"]: r["shard_id"]
         for r in global_shuffle(docs.repartition(7))
         .select("doc_id", "shard_id").collect()}
    assert a == b


def test_global_shuffle_decorrelates_order(spark, sf_dir):
    """Within a shard, shuffle_key order must not follow doc_id order
    (that is the point of an epoch shuffle): Spearman-ish check that the
    head of the shuffle order is not the head of the id order."""
    docs = load_table(spark, "documents", sf_dir)
    s = (global_shuffle(docs).where(F.col("shard_id") == 0)
         .orderBy("shuffle_key").select("doc_id").limit(20).collect())
    ids = [r["doc_id"] for r in s]
    assert ids != sorted(ids)
