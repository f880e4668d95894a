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


def test_adaptive_refine_factor_policy(spark, sf_dir):
    """Round-8 policy: refine_factor='auto' holds the rf*k/N candidate
    fraction (the 1M probe measured the fixed-rf decay: PQ 0.958->0.812,
    restored at the resolved rf); at fixture scale 'auto' floors at the
    default so results are unchanged; a fixed rf below the fraction
    warns loudly."""
    import warnings

    from vectordb_explorations_spark.operators.pq import (
        IVFPQ_REFINE_FRACTION, PQ_REFINE_FRACTION, adaptive_refine_factor,
        pq_encode, pq_search, pq_train)
    from vectordb_explorations_spark.operators.knn import sample_queries
    from vectordb_explorations_spark.sources.catalog import load_table

    # policy math: the 200k anchors resolve to the calibrated points
    assert adaptive_refine_factor(200_000, 10, PQ_REFINE_FRACTION) == 30
    assert adaptive_refine_factor(1_000_000, 10, PQ_REFINE_FRACTION) == 150
    assert adaptive_refine_factor(1_000_000, 10, IVFPQ_REFINE_FRACTION) == 50
    assert adaptive_refine_factor(2_000, 10, PQ_REFINE_FRACTION) == 10

    emb = load_table(spark, "embeddings", sf_dir)
    books = pq_train(emb, m_subspaces=8, k_codes=16)
    codes = pq_encode(emb, books)
    qs = sample_queries(emb, 3)
    fixed = pq_search(codes, books, qs, 5, refine_with=emb,
                      refine_factor=10).collect()
    auto = pq_search(codes, books, qs, 5, refine_with=emb,
                     refine_factor="auto").collect()
    assert sorted(map(tuple, fixed)) == sorted(map(tuple, auto))

    # at the 500-doc fixture any rf >= 1 satisfies the fraction, so the
    # warning branch needs a below-floor rf; the search still runs (its
    # shortlist just clamps empty and the refine returns no rows)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pq_search(codes, books, qs, 5, refine_with=emb,
                  refine_factor=-1000000).collect()
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("recall decays" in m and "auto" in m for m in msgs), msgs
