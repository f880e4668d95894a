#!/usr/bin/env python3
"""Re-validate the PQ / IVF-PQ / IVF-SQ8 'auto' refine policies at 1M
after the round-9 resolver change (r8 verdict item 2 + ADVICE item 1):
resolution now uses corpus rows — build-metadata or a memoized count
divided by the known assign_n replication — where round 8 counted the
REPLICATED code table, so IVF-family 'auto' silently resolved to 2x the
calibrated rf (100, not the documented 50 at 1M). This probe measures
recall@10 and steady search wall at the CORRECTED auto resolution and
appends the quiet-box rows to SCALE_NOTES.md.

Run:  python tools/pq_auto_recheck.py [N]
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
K = 10
NQ = 100
OUT = f"/tmp/scale_probe_embeddings_{N}"


def main() -> None:
    from vectordb_explorations_spark.operators import pq as PQ
    from vectordb_explorations_spark.operators import sq as SQ
    from vectordb_explorations_spark.operators.ann import recall_at_k
    from vectordb_explorations_spark.operators.knn import (
        knn_join_blockwise, sample_queries)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="pq-auto-recheck")
    spark.sparkContext.setLogLevel("ERROR")
    assert os.path.exists(OUT), f"run tools/scale_probe_1m.py first ({OUT})"

    emb = spark.read.parquet(OUT).cache()
    n = emb.count()
    queries = sample_queries(emb, NQ).cache()
    queries.count()
    exact = knn_join_blockwise(emb, queries, K).cache()
    exact.count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def steady(fn):
        force(fn())
        runs = []
        for _ in range(3):
            t0 = time.time()
            force(fn())
            runs.append(time.time() - t0)
        return round(sorted(runs)[1], 2)

    rows = []

    books = PQ.pq_train(emb, m_subspaces=16, k_codes=64)
    codes = PQ.pq_encode(emb, books).cache()
    codes.count()
    rf = PQ.adaptive_refine_factor(n, K, PQ.PQ_REFINE_FRACTION)

    def run_pq():
        return PQ.pq_search(codes, books, queries, K, refine_with=emb,
                            refine_factor="auto", corpus_n=n)
    w = steady(run_pq)
    rows.append(("pq auto", f"rf={rf}", w,
                 round(recall_at_k(run_pq(), exact, K), 3)))
    codes.unpersist()

    ic, cents, ibooks = PQ.ivfpq_build(emb, num_centroids=64,
                                       m_subspaces=16, k_codes=64)
    ic = ic.cache()
    ic.count()
    rf = PQ.adaptive_refine_factor(n, K, PQ.IVFPQ_REFINE_FRACTION)

    def run_ivfpq():
        return PQ.ivfpq_search(ic, cents, ibooks, queries, K, nprobe=8,
                               refine_with=emb, refine_factor="auto",
                               corpus_n=n)
    w = steady(run_ivfpq)
    rows.append(("ivfpq auto", f"rf={rf}", w,
                 round(recall_at_k(run_ivfpq(), exact, K), 3)))
    ic.unpersist()

    sc, scents, mins, maxs = SQ.ivfsq_build(emb, num_centroids=64)
    sc = sc.cache()
    sc.count()
    rf = PQ.adaptive_refine_factor(n, K, SQ.IVFSQ_REFINE_FRACTION)

    def run_ivfsq():
        return SQ.ivfsq_search(sc, scents, mins, maxs, queries, K, nprobe=8,
                               refine_with=emb, refine_factor="auto",
                               corpus_n=n)
    w = steady(run_ivfsq)
    rows.append(("ivfsq auto", f"rf={rf}", w,
                 round(recall_at_k(run_ivfsq(), exact, K), 3)))
    sc.unpersist()

    lines = [
        "",
        f"## Round-9 addendum: PQ-family 'auto' refine at {n:,} under the "
        "corrected (replication-aware) resolution",
        "",
        "Round 8's resolver counted the assign_n=2-replicated IVF code "
        "tables, so IVF-family 'auto' resolved to 2x the calibrated rf "
        "(r8 ADVICE item 1). Corrected resolution (corpus rows, carried "
        "as search-time metadata — zero count jobs in the serving path):",
        "",
        "| family | resolved | search s/batch100 | recall@10 |",
        "|---|---|---|---|",
    ]
    for fam, r, w, rec in rows:
        lines.append(f"| {fam} | {r} | {w} | {rec} |")
        print(f"[recheck] {fam} {r}: {w}s recall {rec}", flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_NOTES.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("[recheck] SCALE_NOTES.md updated", flush=True)


if __name__ == "__main__":
    main()
