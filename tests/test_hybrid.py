"""Hybrid BM25 + vector RRF retrieval: channel-level sanity (idf ordering,
self-match, pool bounds), fusion-level properties (both-channel docs beat
single-channel docs at equal ranks), and plan shape (pure codegen — no
Python, no token explode)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators import hybrid as H  # noqa: E402
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    return docs, emb


def test_vector_channel_self_match(frames):
    """Each query vector is an indexed embedding, so its own id must be
    vec_rank 1 (the RgbTest perturbation-oracle shape, hnsw.cc:326-368)."""
    _, emb = frames
    pool = H.vector_pool(emb)
    top = {r["query_id"]: r["vec_id"] for r in pool.collect()
           if r["vec_rank"] == 1}
    assert top == {qid: qid for qid, _ in H.HYBRID_QUERIES}


def test_bm25_rare_term_dominates(frames):
    """'dup' appears in ~5% of docs vs ~78% for the common tokens; BM25's
    idf must rank a dup-containing doc above docs with only common terms
    for query 0 (which includes 'dup')."""
    docs, _ = frames
    pool = H.bm25_pool(docs).where("query_id = 0").collect()
    by_rank = {r["bm25_rank"]: r["doc_id"] for r in pool}
    dup_docs = {r["doc_id"] for r in
                docs.where("text like '%dup%'").select("doc_id").collect()}
    # every doc containing the rare term outranks the best doc without it
    dup_ranks = [r["bm25_rank"] for r in pool if r["doc_id"] in dup_docs]
    non_dup_ranks = [r["bm25_rank"] for r in pool
                     if r["doc_id"] not in dup_docs]
    assert dup_ranks, "fixture lost its rare-term docs"
    if non_dup_ranks:
        assert max(dup_ranks) < min(non_dup_ranks)
    assert by_rank[1] in dup_docs


def test_pools_bounded_and_dense(frames):
    docs, emb = frames
    for pool, rank_col in ((H.bm25_pool(docs), "bm25_rank"),
                           (H.vector_pool(emb), "vec_rank")):
        rows = pool.collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r[rank_col])
        for qid, ranks in per_q.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), qid
            assert len(ranks) <= H.HYBRID_POOL


def test_rrf_scores_consistent(frames):
    """rrf_score must equal the closed form from the two rank columns —
    catches any drift between the fused columns and the fusion score."""
    docs, emb = frames
    for r in H.hybrid_rrf(docs, emb).collect():
        expect = 0.0
        if r["bm25_rank"] is not None:
            expect += 1.0 / (H.RRF_K + r["bm25_rank"])
        if r["vec_rank"] is not None:
            expect += 1.0 / (H.RRF_K + r["vec_rank"])
        assert math.isclose(r["rrf_score"], math.floor(expect * 1e6 + 0.5) / 1e6,
                            abs_tol=1e-12)
        assert r["bm25_rank"] is not None or r["vec_rank"] is not None


def test_plan_is_python_free_and_explode_free(frames):
    """BM25 tf/dl are array scans in one projection — the plan must carry
    no Python stage and no token-level Generate (the explode of the 3-slot
    per-query struct array is the only Generate allowed)."""
    docs, emb = frames
    plan = (H.hybrid_rrf(docs, emb)
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    # token explode would show as Generate over split(...); the per-query
    # stack generates over a fixed 3-element array instead
    assert plan.count("Generate") <= 1
