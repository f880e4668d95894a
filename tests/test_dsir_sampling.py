"""DSIR importance resampling + cluster-balanced sampling behavior tests.

Oracle parity (exactness vs DuckDB) rides test_oracle_parity.py like every
declared query; these tests pin the SEMANTICS — a planted target
distribution is actually recovered, quotas actually cap dominant clusters —
on corpora built for the purpose, not the fixture.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_explorations_spark.operators.sampling import (  # noqa: E402
    cluster_balanced_sample, dsir_select)


def _planted_corpus(spark):
    """Target docs speak a tight phrase vocabulary; half the raw pool are
    lookalikes (same vocabulary), half are per-doc-unique gibberish."""
    phrase = "alpha beta gamma delta epsilon zeta"
    rows = []
    for i in range(10):                      # target exemplars
        rows.append((i, "tgt", phrase))
    for i in range(10, 30):                  # raw lookalikes
        rows.append((i, "raw", phrase))
    for i in range(30, 50):                  # raw gibberish
        toks = " ".join(f"g{i}w{j}" for j in range(6))
        rows.append((i, "raw", toks))
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_dsir_recovers_planted_target_distribution(spark):
    docs = _planted_corpus(spark)
    out = dsir_select(docs, target_sources=("tgt",), k=40).collect()
    assert len(out) == 40                    # the whole raw pool, ranked
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == set(range(10, 50))  # target docs never selected
    look = [by_id[i].logratio for i in range(10, 30)]
    gib = [by_id[i].logratio for i in range(30, 50)]
    # every lookalike's importance log-weight beats every gibberish doc's
    assert min(look) > max(gib)
    # and the Gumbel-top-k front is dominated by lookalikes: with this
    # separation the noise cannot promote gibberish past them
    top20 = {r.doc_id for r in out[:20]}
    assert len(top20 & set(range(10, 30))) >= 15


def test_dsir_is_deterministic_and_partitioning_invariant(spark):
    docs = _planted_corpus(spark)
    a = dsir_select(docs, target_sources=("tgt",), k=40).collect()
    b = dsir_select(docs.repartition(7), target_sources=("tgt",),
                    k=40).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cluster_balanced_sample_caps_dominant_clusters(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    quota = 3
    out = cluster_balanced_sample(emb, quota=quota).collect()
    per = {}
    for r in out:
        per.setdefault(r.cluster_id, []).append(r)
    n_total = emb.count()
    for cid, rows in per.items():
        size = rows[0].cluster_size
        assert all(r.cluster_size == size for r in rows)
        # quota actually caps; small clusters survive whole
        assert len(rows) == min(quota, size)
        assert sorted(r.rk for r in rows) == list(range(1, len(rows) + 1))
    # every corpus row is assigned to exactly one cluster
    assert sum(rows[0].cluster_size for rows in per.values()) == n_total
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids))
