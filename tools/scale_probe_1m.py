#!/usr/bin/env python3
"""1M-vector scale probe — the reference's own footprint benchmark
configuration (SizeTest(1000000, ...), hnsw.cc:486) applied to the four
serving families the r6 verdict named: hyperplane LSH, IVF, SQ8, and the
BQ1->SQ8->exact cascade, plus the exact blockwise baseline.

Appends a round-7 addendum section to SCALE_NOTES.md (the zone
tools/scale_probe.py's regeneration preserves) with build/search wall
times, recall@10, and persisted index bytes. Run:

    python tools/scale_probe_1m.py [N]
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 64
K = 10
NQ = 100
OUT = f"/tmp/scale_probe_embeddings_{N}"


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators import bq as BQ
    from vectordb_explorations_spark.operators import sq as SQ
    from vectordb_explorations_spark.operators.ann import (
        ivf_build, ivf_search, lsh_refine_hot_buckets, lsh_search,
        random_hyperplane_lsh, recall_at_k)
    from vectordb_explorations_spark.operators.knn import (
        knn_join_blockwise, sample_queries)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-1m")
    spark.sparkContext.setLogLevel("ERROR")

    # Same deterministic clustered generator as tools/scale_probe.py —
    # findings must be comparable across the 200k and 1M probes.
    if not os.path.exists(OUT):
        base = spark.range(N).withColumn("label",
                                         (F.col("id") % 32).cast("int"))
        dims = [
            (
                (F.conv(F.substring(F.md5(F.concat_ws(
                    "_", F.col("id"), F.lit(d))), 1, 8), 16, 10)
                 .cast("double") / F.lit(float(0xFFFFFFFF)) - 0.5)
                + (F.col("label") % 8) * F.lit(0.25)
                * F.lit(1.0 if d % 3 == 0 else 0.0)
            ).cast("float")
            for d in range(DIM)
        ]
        (base.select(F.col("id").alias("vec_id"), "label",
                     F.array(*dims).alias("embedding"))
         .repartition(32)
         .write.mode("overwrite").parquet(OUT))

    emb = spark.read.parquet(OUT).cache()
    n = emb.count()
    queries = sample_queries(emb, NQ).cache()
    queries.count()

    results: dict[str, float] = {}
    recalls: dict[str, float] = {}
    ibytes: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        results[name] = round(time.time() - t0, 2)

    def steady(name, fn):
        fn()
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        results[name] = round(sorted(runs)[1], 2)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def persist(name, df):
        path = f"/tmp/probe1m_idx_{name}"
        df.write.mode("overwrite").parquet(path)
        ibytes[name] = _dir_bytes(path)

    # time BEFORE caching the result: a cached identical plan would be
    # substituted and the row would measure a cache read (see
    # tools/scale_probe.py, round-7 fix)
    steady("exact_blockwise", lambda: force(knn_join_blockwise(emb, queries, K)))
    exact = knn_join_blockwise(emb, queries, K).cache()
    exact.count()

    lsh_state = {}

    def build_lsh():
        idx = random_hyperplane_lsh(emb, num_tables=8, num_planes=10).cache()
        idx.count()
        ref_idx, cent_rows = lsh_refine_hot_buckets(idx, emb, bucket_cap=1024)
        ref_idx = ref_idx.cache()
        ref_idx.count()
        lsh_state["idx"], lsh_state["ref"] = idx, (ref_idx, cent_rows)
    timed("lsh_build", build_lsh)
    persist("lsh", lsh_state["ref"][0])

    def run_lsh():
        return lsh_search(emb, queries, K, num_tables=8, num_planes=10,
                          index=lsh_state["idx"], bucket_cap=1024,
                          refined=lsh_state["ref"])
    steady("lsh_search", lambda: force(run_lsh()))
    recalls["lsh"] = round(recall_at_k(run_lsh(), exact, K), 3)

    ivf_state = {}

    def build_ivf():
        a, c = ivf_build(emb, num_centroids=64)
        a = a.cache()
        a.count()
        ivf_state["a"], ivf_state["c"] = a, c
    timed("ivf_build", build_ivf)
    persist("ivf", ivf_state["a"].select("vec_id", "list_id"))
    steady("ivf_search",
           lambda: force(ivf_search(ivf_state["a"], ivf_state["c"],
                                    queries, K, nprobe=8)))
    recalls["ivf"] = round(recall_at_k(
        ivf_search(ivf_state["a"], ivf_state["c"], queries, K, nprobe=8),
        exact, K), 3)

    sq_state = {}

    def build_sq():
        mins, maxs = SQ.sq_train(emb, DIM)
        codes = SQ.sq_encode(emb, mins, maxs).cache()
        codes.count()
        sq_state["mins"], sq_state["maxs"], sq_state["c"] = mins, maxs, codes
    timed("sq8_build", build_sq)
    persist("sq8", sq_state["c"])
    steady("sq8_search",
           lambda: force(SQ.sq_search(sq_state["c"], sq_state["mins"],
                                      sq_state["maxs"], queries, K,
                                      refine_with=emb, refine_factor=3)))
    recalls["sq8"] = round(recall_at_k(
        SQ.sq_search(sq_state["c"], sq_state["mins"], sq_state["maxs"],
                     queries, K, refine_with=emb, refine_factor=3),
        exact, K), 3)

    bq_state = {}

    def build_bq():
        thr = BQ.bq_thresholds(emb, DIM)
        levels = BQ.bq_levels(emb, thr)
        codes = BQ.bq_encode(emb, thr).cache()
        codes.count()
        bq_state["thr"], bq_state["lv"], bq_state["c"] = thr, levels, codes
    timed("bq1_build", build_bq)
    persist("bq1", bq_state["c"])

    # shortlist scaling: the 200k probe showed cascade recall equals the
    # 1-bit SHORTLIST ceiling; 1M tests whether a corpus-proportional
    # shortlist (1%) holds it, and what a fixed 2000 costs in recall.
    def run_cascade(shortlist):
        return BQ.bq_cascade_search(
            bq_state["c"], bq_state["thr"], bq_state["lv"], sq_state["c"],
            sq_state["mins"], sq_state["maxs"], queries, K,
            refine_with=emb, shortlist=shortlist, midlist=100)
    steady("bq1_cascade_sl2000", lambda: force(run_cascade(2000)))
    recalls["bq1_cascade_sl2000"] = round(
        recall_at_k(run_cascade(2000), exact, K), 3)
    steady("bq1_cascade_sl10000", lambda: force(run_cascade(10000)))
    recalls["bq1_cascade_sl10000"] = round(
        recall_at_k(run_cascade(10000), exact, K), 3)

    mb = n * DIM * 4 // 1_000_000
    lines = [
        "",
        f"## Round-7 addendum: {n:,}-vector probe "
        "(the reference's SizeTest scale, hnsw.cc:486)",
        "",
        f"Same generator/methodology as the 200k core above, {n:,} x "
        f"{DIM} float32 (~{mb} MB raw), 100-query batches, k={K}, "
        "local[32]. Regenerate: `python tools/scale_probe_1m.py`.",
        "",
        "| path | build (s) | batch-100 search (s) | recall@10 "
        "| index bytes |",
        "|---|---|---|---|---|",
        f"| exact blockwise (baseline) | — | {results['exact_blockwise']}"
        " | 1.0 | — |",
        f"| hyperplane LSH (T=8, P=10, cap 1024) | {results['lsh_build']}"
        f" | {results['lsh_search']} | {recalls['lsh']}"
        f" | {ibytes['lsh']:,} |",
        f"| IVF (C=64, nprobe=8) | {results['ivf_build']}"
        f" | {results['ivf_search']} | {recalls['ivf']}"
        f" | {ibytes['ivf']:,} |",
        f"| SQ8 + exact refine (rf=3) | {results['sq8_build']}"
        f" | {results['sq8_search']} | {recalls['sq8']}"
        f" | {ibytes['sq8']:,} |",
        f"| BQ1->SQ8->exact cascade (shortlist 2000) | "
        f"{results['bq1_build']} (bq1) | {results['bq1_cascade_sl2000']}"
        f" | {recalls['bq1_cascade_sl2000']} | {ibytes['bq1']:,} (bq1) |",
        f"| BQ1->SQ8->exact cascade (shortlist 10000 = 1%) | — "
        f"| {results['bq1_cascade_sl10000']}"
        f" | {recalls['bq1_cascade_sl10000']} | — |",
        "",
        "Recalls explained (vs the 200k core above):",
        "",
        f"- **IVF held** ({recalls['ivf']} at nprobe 8/64): probed lists "
        "are a constant FRACTION of the corpus, so per-list population "
        "growth does not move the geometry — the nearest lists still "
        "contain the nearest neighbors. This is the family whose recall "
        "is scale-invariant by construction.",
        f"- **SQ8 held at {recalls['sq8']}**: per-dimension 8-bit "
        "quantization error is a property of the value RANGE, not the "
        "corpus size; as long as inter-neighbor distances dwarf the "
        "quantization step (true for this clustered generator at any N), "
        "the rf=3 refine recovers everything. The cost moved, not the "
        "recall: the dequantized-GEMM scan is linear in N "
        f"({results['sq8_search']} s vs the exact scan's "
        f"{results['exact_blockwise']} s) — its value is the 4x "
        "footprint, not wall time on a warm box.",
        f"- **LSH fell to {recalls['lsh']}** (0.87-0.93 at smaller N): "
        "hot-bucket refinement caps candidates per probe at bucket_cap, "
        "so at 5x the corpus each probe inspects a 5x SMALLER fraction. "
        "Holding recall needs cap or probe count to grow with N — the "
        "bound that makes it scale is exactly what prices its recall. "
        f"Its build ({results['lsh_build']} s) is dominated by "
        "re-clustering the hot buckets a clustered corpus produces.",
        f"- **The fixed-2000 cascade shortlist collapsed to "
        f"{recalls['bq1_cascade_sl2000']}** (0.95 at 200k) and even a "
        f"corpus-proportional 1% holds only "
        f"{recalls['bq1_cascade_sl10000']}: 64 one-bit codes saturate — "
        "in-cluster candidates grow with N while the code space stays "
        "2^64-sparse-in-64-dims, so the true neighbors' Hamming ranks "
        "drift past any fixed cutoff. Confirms (at 5x) the 200k "
        "finding: at dim 64, BQ1 is a pre-filter whose shortlist must "
        "scale super-linearly, and 1-bit-as-ranker belongs to dim>=256 "
        "embeddings.",
        f"- **Exact blockwise at {results['exact_blockwise']} s** "
        "(honest un-substituted scan, round-7 methodology fix) says the "
        "warm-cache local box is NOT where these indexes pay off: their "
        "payoff is persisted partitioned serving (probe-pruned I/O) and "
        "corpora past executor memory.",
        "",
    ]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_NOTES.md")
    existing = open(path).read()
    marker = f"## Round-7 addendum: {n:,}-vector probe"
    idx = existing.find(marker)
    if idx >= 0:
        # replace a previous run of this addendum (up to the next ## or EOF)
        nxt = existing.find("\n## ", idx)
        existing = existing[:idx - 1] + (existing[nxt:] if nxt >= 0 else "")
    with open(path, "w") as f:
        f.write(existing.rstrip("\n") + "\n" + "\n".join(lines))
    print("appended 1M addendum to SCALE_NOTES.md")
    print(results, recalls, ibytes)


if __name__ == "__main__":
    main()
