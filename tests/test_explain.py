"""plans.explain: the observability API returns accurate plan facts
(checked against queries with known shapes) and cache_footprint reflects
materialized blocks."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.plans.explain import (  # noqa: E402
    cache_footprint, plan_summary)
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


def test_topk_and_pruning_facts(spark, sf_dir, tmp_path):
    import os as _os
    import shutil

    from vectordb_explorations_spark.operators.knn import knn_exact

    # scan a COPY of the fixture: this test asserts column pruning of a
    # fresh parquet scan, and Spark substitutes any cached plan matching
    # the original path (load_table's session cache, materialized by
    # other modules with the label column — which the fixed ReadSchema
    # parser now reports honestly; the old truncated regex masked it)
    dst = str(tmp_path / "emb_copy.parquet")
    shutil.copyfile(_os.path.join(sf_dir, "embeddings.parquet"), dst)
    emb = spark.read.parquet(dst)
    q = emb.orderBy("vec_id").first()["embedding"]
    s = plan_summary(knn_exact(emb, q, 5))
    assert s["take_ordered_topk"]
    assert not s["python_stages"]
    assert s["columns_read"] == ["embedding", "vec_id"]


def test_join_and_exchange_facts(spark, sf_dir):
    from vectordb_explorations_spark.operators.relational import region_revenue
    dfs = [load_table(spark, t, sf_dir)
           for t in ("region", "nation", "customer", "orders", "lineitem")]
    s = plan_summary(region_revenue(*dfs))
    assert "BroadcastHashJoin" in s["join_strategies"]
    assert s["broadcast_exchanges"] >= 1
    assert s["shuffle_exchanges"] >= 1
    # the projection is pruned to the join/aggregate columns
    assert "l_comment" not in s["columns_read"]
    assert "l_extendedprice" in s["columns_read"]

    from vectordb_explorations_spark.operators.relational import pricing_summary
    s2 = plan_summary(pricing_summary(dfs[-1]))
    assert any("l_shipdate" in f for f in s2["pushed_filters"])


def test_nested_struct_schema_parsed(spark, sf_dir, tmp_path):
    # ReadSchema with a nested struct and an array type: the bracket-depth
    # scan must yield only top-level column names, no phantom columns from
    # the nested fields (the naive regex stopped at the first '>')
    from pyspark.sql import functions as F
    path = str(tmp_path / "nested")
    (load_table(spark, "region", sf_dir)
     .select("r_regionkey",
             F.struct(F.struct(F.col("r_name").alias("x")).alias("inner"),
                      F.col("r_name").alias("y")).alias("meta"),
             F.array("r_regionkey").alias("keys"))
     .write.parquet(path))
    df = spark.read.parquet(path).select("r_regionkey", "meta", "keys")
    df.collect()
    s = plan_summary(df)
    assert s["columns_read"] == ["keys", "meta", "r_regionkey"]


def test_python_stage_detected(spark, sf_dir):
    from vectordb_explorations_spark.operators.knn import (
        knn_join_blockwise, sample_queries)
    emb = load_table(spark, "embeddings", sf_dir)
    s = plan_summary(knn_join_blockwise(emb, sample_queries(emb, 3), 5))
    assert s["python_stages"]


def test_cache_footprint_counts_persisted_blocks(spark, sf_dir):
    df = load_table(spark, "region", sf_dir).cache()
    df.count()
    try:
        fp = cache_footprint(spark)
        assert fp["total_bytes"] > 0
        assert fp["per_rdd"]
    finally:
        df.unpersist()


def test_truncated_read_schema_does_not_swallow_plan():
    """r7 ADVICE: a ReadSchema clipped by spark.sql.maxMetadataStringLength
    has no closing '>' — the bracket scan must neither swallow later plan
    lines nor let a later Filter's '>' close it spuriously; the complete
    leading fields are salvaged, the unterminated tail dropped."""
    from vectordb_explorations_spark.plans.explain import (
        _read_schemas, _top_level_columns)

    plan = ("*(1) Project [a#1, b#2]\n"
            "+- FileScan parquet [a#1,b#2] PushedFilters: [], "
            "ReadSchema: struct<a:int,b:string,c:struct<x:int,...\n"
            "+- Filter (d#3 > 3)\n")
    schemas = _read_schemas(plan)
    assert len(schemas) == 1
    cols = _top_level_columns(schemas[0])
    assert cols == ["a", "b"], cols
    assert all("Filter" not in s and "\n" not in s for s in schemas)

    intact = "FileScan ReadSchema: struct<a:int,c:struct<x:int,y:int>>\n"
    assert _top_level_columns(_read_schemas(intact)[0]) == ["a", "c"]
