"""MMR diversified re-rank: greedy contract (self first, dense ranks,
monotone first-pick), the diversity property it exists for (lower max
pairwise similarity than the plain cosine top-k), and partitioning
invariance of the bounded applyInPandas loop."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_explorations_spark.operators import rerank as RR  # noqa: E402
from vectordb_explorations_spark.operators.hybrid import (  # noqa: E402
    HYBRID_QUERIES, vector_pool)
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir)


@pytest.fixture(scope="module")
def result(emb):
    return RR.mmr_rerank(emb).collect()


def test_self_is_first_pick(result):
    """rel(self) = 1.0 dominates, and the first pick carries no diversity
    penalty — rank 1 must be the query itself with score LAM * 1.0."""
    firsts = {r["query_id"]: r for r in result if r["rank"] == 1}
    for qid, _ in HYBRID_QUERIES:
        assert firsts[qid]["vec_id"] == qid
        assert abs(firsts[qid]["mmr_score"] - RR.MMR_LAM) < 1e-9


def test_ranks_dense(result):
    per_q = {}
    for r in result:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {qid for qid, _ in HYBRID_QUERIES}
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, RR.MMR_TOP + 1))


def test_mmr_diversifies(emb, result):
    """The point of the operator: the MMR top-k must have a strictly lower
    max pairwise cosine than the plain cosine top-k for at least one query
    and never a higher one (the fixture corpus has clustered embeddings,
    so plain top-k returns near-duplicates)."""
    vecs = {r["vec_id"]: list(r["embedding"])
            for r in emb.select("vec_id", "embedding").collect()}

    def max_pair_sim(ids):
        return max(RR._cos(vecs[a], vecs[b])
                   for i, a in enumerate(ids) for b in ids[i + 1:])

    plain = {}
    for r in vector_pool(emb, pool=RR.MMR_TOP).collect():
        plain.setdefault(r["query_id"], []).append(r["vec_id"])
    mmr = {}
    for r in result:
        mmr.setdefault(r["query_id"], []).append(r["vec_id"])

    improved = 0
    for qid, _ in HYBRID_QUERIES:
        p, m = max_pair_sim(plain[qid]), max_pair_sim(mmr[qid])
        assert m <= p + 1e-12, (qid, m, p)
        improved += m < p - 1e-9
    assert improved >= 1


def test_partitioning_invariant(emb, result):
    again = RR.mmr_rerank(emb.repartition(13)).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, result))


def test_quota_cap_enforced(emb, spark, sf_dir):
    """No query's results exceed the per-source quota on the fixture."""
    docs = load_table(spark, "documents", sf_dir)
    out = RR.quota_capped_topk(emb, docs).collect()
    per = {}
    for r in out:
        per[(r["query_id"], r["source"])] = \
            per.get((r["query_id"], r["source"]), 0) + 1
        assert r["src_rank"] <= RR.QUOTA_PER_SOURCE
    assert max(per.values()) <= RR.QUOTA_PER_SOURCE


def test_quota_cap_binds_on_crowded_source(spark):
    """Synthetic crowding: one source owns every nearest neighbor, so the
    cap must actually displace results (the fixture's sources are diverse
    enough that plain top-k can satisfy the cap by luck)."""
    import numpy as np
    rng = np.random.default_rng(11)
    qids = [qid for qid, _ in HYBRID_QUERIES]
    n = 40
    base = rng.normal(size=64)
    rows = []
    for i in range(n):
        # ids 0..2 are the probe vectors; 3..20 hug the probes (source
        # 'hot'), the rest are far (source 'cold_k')
        if i <= 20:
            v = base + rng.normal(scale=0.05, size=64)
            src = "hot"
        else:
            v = rng.normal(size=64)
            src = f"cold{i % 3}"
        rows.append((i, [float(x) for x in v], src))
    emb_s = spark.createDataFrame([(i, v) for i, v, _ in rows],
                                  "vec_id long, embedding array<float>")
    docs_s = spark.createDataFrame([(i, s) for i, _, s in rows],
                                   "doc_id long, source string")
    out = RR.quota_capped_topk(emb_s, docs_s).collect()
    for qid in qids:
        hot = [r for r in out if r["query_id"] == qid and r["source"] == "hot"]
        assert len(hot) == RR.QUOTA_PER_SOURCE  # crowded source capped
    per = {}
    for r in out:
        per[(r["query_id"], r["source"])] = \
            per.get((r["query_id"], r["source"]), 0) + 1
    assert max(per.values()) <= RR.QUOTA_PER_SOURCE
