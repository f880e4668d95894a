"""Exact k-NN: physical-strategy agreement and edge cases."""

from pyspark.sql import functions as F

from vectordb_explorations_spark.operators.knn import (
    knn_exact, knn_join, knn_join_blockwise, sample_queries)
from vectordb_explorations_spark.sources import load_table


def test_knn_join_equals_blockwise(spark, sf_dir):
    """The window-ranking path and the Arrow/NumPy local-top-k path must
    produce identical rows — same logical operator, two physical plans."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = sample_queries(emb, 5)
    a = sorted(tuple(r) for r in knn_join(emb, qs, 7).collect())
    b = sorted(tuple(r) for r in knn_join_blockwise(emb, qs, 7).collect())
    assert a == b


def test_knn_self_is_nearest(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    qs = sample_queries(emb, 10)
    top1 = (knn_join(emb, qs, 1)
            .select("query_id", "vec_id").collect())
    assert all(r.query_id == r.vec_id for r in top1)


def test_knn_k_larger_than_table(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.orderBy("vec_id").first()["embedding"]
    n = emb.count()
    assert knn_exact(emb, q, n + 100).count() == n


def test_knn_deterministic_tiebreak(spark):
    """Equal distances break ties by id ascending (SURVEY §7)."""
    df = spark.createDataFrame(
        [(5, [1.0, 0.0]), (2, [0.0, 1.0]), (9, [1.0, 0.0])],
        "vec_id long, embedding array<float>")
    rows = knn_exact(df, [0.0, 0.0], 3).collect()
    assert [r.vec_id for r in rows] == [2, 5, 9]


def test_knn_filtered_stays_in_facet(spark, sf_dir):
    """Pre-filtered search: every result shares the query's label, and a
    result never beats the unfiltered ranking (it is a subset search)."""
    from vectordb_explorations_spark.operators.knn import knn_join_filtered
    emb = load_table(spark, "embeddings", sf_dir)
    qs = (emb.orderBy("vec_id").limit(5)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("query_vec"), "label"))
    qlabel = {r["query_id"]: r["label"] for r in qs.collect()}
    rows = knn_join_filtered(emb, qs, 7).collect()
    labels = {r["vec_id"]: r["label"] for r in
              emb.select("vec_id", "label").collect()}
    for r in rows:
        assert r["label"] == qlabel[r["query_id"]]
        assert labels[r["vec_id"]] == qlabel[r["query_id"]]
    # the filtered top-k of a query's own label contains the query itself
    firsts = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert firsts == {q: q for q in firsts}


def test_range_search_matches_bruteforce(spark, sf_dir):
    """Radius semantics: exactly the brute-force neighbors within r."""
    from vectordb_explorations_spark.operators.knn import range_search
    emb = load_table(spark, "embeddings", sf_dir)
    qs = sample_queries(emb, 5)
    r = 1.25
    got = {(x["query_id"], x["vec_id"]) for x in
           range_search(emb, qs, r, round_dp=None).collect()}
    # brute force via the unfiltered join ranked to the full corpus size
    n = emb.count()
    expect = {(x["query_id"], x["vec_id"]) for x in
              knn_join(emb, qs, n, round_dp=None).collect()
              if x["dist"] <= r}
    assert got == expect
    assert all(x["dist"] <= r for x in
               range_search(emb, qs, r, round_dp=None).collect())


def test_knn_filtered_partitioned_prunes_and_matches(spark, sf_dir, tmp_path):
    """Facet-partitioned layout: the filtered search's scan must show
    PartitionFilters on label (non-queried facets never read) and return
    exactly what the in-memory facet join returns."""
    import re

    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.knn import (
        knn_filtered_partitioned, knn_join_filtered)
    from vectordb_explorations_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    path = str(tmp_path / "emb_by_label")
    emb.write.partitionBy("label").parquet(path)
    queries = (emb.orderBy("vec_id").limit(3)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec"),
                       "label").cache())
    queries.count()

    served = knn_filtered_partitioned(spark, path, queries, 5, dim=64)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "label" in pf and pf.strip(), plan[:1500]

    mem = knn_join_filtered(emb, queries, 5, dim=64)
    a = sorted(map(tuple, served.collect()))
    b = sorted(map(tuple, mem.collect()))
    assert a == b and a


def test_search_after_pages_tile_the_ranking(spark, sf_dir):
    """Cursor pagination contract: page1 ∪ page2 (cursor = page1's last
    raw row) must equal the top-2k of the full ranking, disjointly."""
    from vectordb_explorations_spark.operators.knn import (
        knn_exact, search_after)
    from vectordb_explorations_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    qvec = emb.orderBy("vec_id").first()["embedding"]
    k = 7
    page1_raw = knn_exact(emb, qvec, k, round_dp=None).collect()
    cursor = (page1_raw[-1]["dist"], page1_raw[-1]["vec_id"])
    page2 = search_after(emb, qvec, k, cursor).collect()
    top2k = knn_exact(emb, qvec, 2 * k).collect()
    got = [r["vec_id"] for r in page1_raw] + [r["vec_id"] for r in page2]
    want = [r["vec_id"] for r in top2k]
    assert got == want
    assert len(set(got)) == 2 * k  # disjoint pages


def test_mutual_knn_pairs_are_reciprocal(spark, sf_dir):
    """Every returned pair must be reciprocal: b in a's k-NN AND a in
    b's k-NN (checked against a driver-side recompute on the bounded
    subset), and no non-reciprocal k-NN edge may appear."""
    import numpy as np

    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.knn import mutual_knn_pairs
    from vectordb_explorations_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    k, bound = 4, 120
    got = {(r["id_a"], r["id_b"])
           for r in mutual_knn_pairs(emb, k, bound).collect()}
    rows = (emb.where(F.col("vec_id") < bound)
            .select("vec_id", "embedding").collect())
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    d2 = ((mat[:, None, :] - mat[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    order = np.lexsort((ids[None, :].repeat(len(ids), 0), d2), axis=1)
    knn = {int(ids[i]): {int(ids[j]) for j in order[i, :k]}
           for i in range(len(ids))}
    want = {(a, b) for a in knn for b in knn[a]
            if a < b and a in knn[b]}
    assert got == want and got
