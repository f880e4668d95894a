"""Hashing-trick featurization: the dense pipeline form is L2-normalized
and exactly consistent with the sparse audit; hashing is deterministic and
partitioning-invariant; the produced vectors actually work as a retrieval
signal (same-doc top-1 through the knn machinery)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_explorations_spark.operators import featurize as FZ  # noqa: E402
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir)


def test_dense_is_unit_norm_and_matches_sparse(docs):
    sub = docs.where(F.col("doc_id") < FZ.AUDIT_DOCS)
    dense = {r["doc_id"]: list(r["embedding"])
             for r in FZ.hashed_embeddings(sub).collect()}
    sparse = {}
    for r in FZ.hashed_embedding_audit(docs).collect():
        sparse.setdefault(r["doc_id"], {})[r["dim_id"]] = r["w_norm"]
    assert set(dense) == set(sparse)
    for doc_id, vec in dense.items():
        assert len(vec) == FZ.HASH_DIM
        assert abs(math.sqrt(sum(x * x for x in vec)) - 1.0) < 1e-9
        for d, v in enumerate(vec):
            expect = sparse[doc_id].get(d, 0.0)
            # audit values are 6dp-rounded; dense ones are raw
            assert abs(v - expect) < 1e-6, (doc_id, d)


def test_partitioning_invariant(docs):
    sub = docs.where(F.col("doc_id") < 30)
    a = sorted((r["doc_id"], tuple(r["embedding"]))
               for r in FZ.hashed_embeddings(sub).collect())
    b = sorted((r["doc_id"], tuple(r["embedding"]))
               for r in FZ.hashed_embeddings(sub.repartition(11)).collect())
    assert a == b


def test_vectors_are_a_retrieval_signal(spark, docs):
    """Feed the produced vectors through the engine's own knn machinery:
    every doc's nearest hashed-embedding neighbor is itself (unit vectors,
    cosine==dot==1 only for an identical token multiset direction)."""
    from vectordb_explorations_spark.operators.knn import knn_join
    sub = docs.where(F.col("doc_id") < 40)
    emb = (FZ.hashed_embeddings(sub)
           .select(F.col("doc_id").alias("vec_id"),
                   F.col("embedding").cast("array<float>").alias("embedding"))
           .cache())
    qs = (emb.where(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("query_vec")))
    top1 = {r["query_id"]: r["vec_id"]
            for r in knn_join(emb, qs, 1).collect()}
    assert top1 == {q: q for q in top1}


def test_tokenless_docs_keep_their_row_with_null_embedding(spark):
    docs = spark.createDataFrame(
        [(1, "scan merge vector"), (2, "   "), (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["embedding"]
            for r in FZ.hashed_embeddings(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] is not None
    assert rows[2] is None and rows[3] is None
