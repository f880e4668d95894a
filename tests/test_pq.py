"""PQ: compression contract, determinism, and recall gates (ADC-only and
ADC+exact-refine) against the exact k-NN path."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators import pq as PQ  # noqa: E402
from vectordb_explorations_spark.operators.ann import recall_at_k  # noqa: E402
from vectordb_explorations_spark.operators.knn import (  # noqa: E402
    knn_join, sample_queries)
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402

K = 10


@pytest.fixture(scope="module")
def setup(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    books = PQ.pq_train(emb, m_subspaces=8, k_codes=64)
    codes = PQ.pq_encode(emb, books).cache()
    codes.count()
    queries = sample_queries(emb, 30).cache()
    exact = knn_join(emb, queries, K).cache()
    exact.count()
    return emb, books, codes, queries, exact


def test_codes_shape_and_range(setup):
    emb, books, codes, _, _ = setup
    assert books.shape == (8, 64, 8)
    rows = codes.limit(50).collect()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 64 for r in rows for c in r["codes"])
    assert codes.count() == emb.count()


def test_encode_deterministic(setup):
    emb, books, codes, _, _ = setup
    again = {r["vec_id"]: r["codes"] for r in PQ.pq_encode(emb, books).collect()}
    assert {r["vec_id"]: r["codes"] for r in codes.collect()} == again


def test_adc_recall(setup):
    _, books, codes, queries, exact = setup
    adc = PQ.pq_search(codes, books, queries, K)
    r = recall_at_k(adc, exact, K)
    assert r >= 0.4, r  # 8-byte codes, no refine: coarse but useful


def test_refined_recall(setup):
    emb, books, codes, queries, exact = setup
    refined = PQ.pq_search(codes, books, queries, K,
                           refine_with=emb, refine_factor=10)
    r = recall_at_k(refined, exact, K)
    assert r >= 0.9, r
