#!/usr/bin/env python3
"""10M-vector auto-policy probe (r9 verdict item 3): turn the >1M
extrapolations into measurements for the CHEAP families — IVF, SQ8,
LSH (bucket_cap/multiprobe='auto' + ranked probe_budget) — and, the
real target, `cascade_route`'s claimed ~5M cascade→SQ8 crossover.

The calibration anchors so far are 200k/1M; every 'auto' policy past 1M
is candidate-fraction math, not data. 10M x 64 f32 ≈ 2.6 GB raw — one
order past the anchors, feasible in the 128 GiB sandbox. The heavy
families (HNSW graph wiring, PQ residual training) are deliberately out
of scope: their 1M economics already said batch-build them shard-routed,
and a 10M HNSW build is hours of wiring that validates no policy.

Prints a markdown table + one JSON line; paste the table into
SCALE_NOTES.md after eyeballing. Run (takes tens of minutes):

    python tools/scale_probe_10m.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
DIM = 64
K = 10
NQ = 100
OUT = f"/tmp/scale_probe_embeddings_{N}"


def main() -> None:
    import warnings

    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators import bq as BQ
    from vectordb_explorations_spark.operators import sq as SQ
    from vectordb_explorations_spark.operators.ann import (
        adaptive_bucket_cap, adaptive_multiprobe_bits, ivf_build,
        ivf_search, lsh_refine_hot_buckets, lsh_search,
        random_hyperplane_lsh, recall_at_k)
    from vectordb_explorations_spark.operators.bq import (
        adaptive_shortlist, cascade_route)
    from vectordb_explorations_spark.operators.knn import (
        knn_join_blockwise, sample_queries)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-10m")
    spark.sparkContext.setLogLevel("ERROR")
    t_all = time.time()

    # Same deterministic clustered generator as tools/scale_probe{,_1m}.py
    # — findings must be comparable across the 200k/1M/10M anchors.
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
         .repartition(64)
         .write.mode("overwrite").parquet(OUT))
        print(f"[probe10m] generated {N:,} vectors", flush=True)

    emb = spark.read.parquet(OUT).cache()
    n = emb.count()
    queries = sample_queries(emb, NQ).cache()
    queries.count()

    results: dict[str, float] = {}
    recalls: dict[str, float] = {}
    policies: dict[str, object] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        results[name] = round(time.time() - t0, 2)
        print(f"[probe10m] {name}: {results[name]}s", flush=True)

    def steady(name, fn):
        fn()  # warm (cache fill, codegen)
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        results[name] = round(sorted(runs)[1], 2)
        print(f"[probe10m] {name}: {results[name]}s", flush=True)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def rec(name, mk):
        recalls[name] = round(recall_at_k(mk(), exact, K), 3)
        print(f"[probe10m] recall {name}: {recalls[name]}", flush=True)

    # ground truth (time before caching: cached-plan substitution trap)
    steady("exact_blockwise",
           lambda: force(knn_join_blockwise(emb, queries, K)))
    exact = knn_join_blockwise(emb, queries, K).cache()
    exact.count()

    # ---- IVF: C scaled with sqrt(N) convention (64 at 1M -> 192) ------
    ivf_state = {}

    def build_ivf():
        a, c = ivf_build(emb, num_centroids=192)
        a = a.cache()
        a.count()
        ivf_state["a"], ivf_state["c"] = a, c
    timed("ivf_build", build_ivf)
    steady("ivf_search",
           lambda: force(ivf_search(ivf_state["a"], ivf_state["c"],
                                    queries, K, nprobe=24)))
    rec("ivf_nprobe24", lambda: ivf_search(ivf_state["a"], ivf_state["c"],
                                           queries, K, nprobe=24))
    ivf_state["a"].unpersist()

    # ---- SQ8 (+ cascade_route's stage-2 artifacts) ---------------------
    sq_state = {}

    def build_sq():
        mins, maxs = SQ.sq_train(emb, DIM)
        codes = SQ.sq_encode(emb, mins, maxs).cache()
        codes.count()
        sq_state["mins"], sq_state["maxs"], sq_state["c"] = mins, maxs, codes
    timed("sq8_build", build_sq)

    def run_sq():
        return SQ.sq_search(sq_state["c"], sq_state["mins"],
                            sq_state["maxs"], queries, K,
                            refine_with=emb, refine_factor=3)
    steady("sq8_search", lambda: force(run_sq()))
    rec("sq8", run_sq)

    # ---- cascade_route: the ~5M crossover claim ------------------------
    policies["adaptive_shortlist"] = adaptive_shortlist(n)
    policies["shortlist_fraction"] = round(
        adaptive_shortlist(n) / n, 5)
    policies["cascade_route"] = cascade_route(n, DIM)
    policies["cascade_max_fraction"] = BQ.CASCADE_MAX_SHORTLIST_FRACTION
    print(f"[probe10m] cascade_route(N={n:,}, dim={DIM}) -> "
          f"{policies['cascade_route']} (shortlist "
          f"{policies['adaptive_shortlist']:,} = "
          f"{policies['shortlist_fraction']:.2%})", flush=True)
    # Measure BOTH sides of the routing decision on the same artifacts
    # so the crossover is a measurement, not an inequality: the raw
    # cascade (what the router steps off of) and the routed SQ8 path.
    casc_state = {}

    def build_casc():
        thr = BQ.bq_thresholds(emb, DIM)
        levels = BQ.bq_levels(emb, thr)
        codes = BQ.bq_encode(emb, thr).cache()
        codes.count()
        casc_state["c"], casc_state["t"], casc_state["l"] = codes, thr, levels
    timed("bq1_build", build_casc)

    def run_cascade():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            return BQ.bq_cascade_search(
                casc_state["c"], casc_state["t"], casc_state["l"],
                sq_state["c"], sq_state["mins"], sq_state["maxs"],
                queries, K, refine_with=emb, shortlist="auto",
                corpus_n=n)
    # Past ~10% resolved shortlist the raw cascade is not merely slow,
    # it is INFEASIBLE in one piece: stage 2 broadcasts Q x shortlist
    # candidate rows, which bursts spark.driver.maxResultSize (measured
    # at 10M: 1,076 MiB > the 1 GiB default on the FIRST collect of the
    # NQ=100 x 5M-row shortlist). Record the fact instead of the crash —
    # this hard wall, not the 1M slow-down, is the crossover's endpoint.
    if policies["shortlist_fraction"] <= 0.1:
        timed("cascade_raw_search", lambda: force(run_cascade()))
        rec("cascade_raw", run_cascade)
    else:
        policies["cascade_raw"] = (
            f"infeasible: Q x shortlist = {NQ * policies['adaptive_shortlist']:,} "
            f"candidate rows broadcast past spark.driver.maxResultSize")
        print(f"[probe10m] cascade_raw: {policies['cascade_raw']}",
              flush=True)

    def run_routed():
        return BQ.bq_cascade_search_auto(
            casc_state["c"], casc_state["t"], casc_state["l"],
            sq_state["c"], sq_state["mins"], sq_state["maxs"],
            queries, K, refine_with=emb, corpus_n=n)
    steady("cascade_routed_search", lambda: force(run_routed()))
    rec("cascade_routed", run_routed)
    casc_state["c"].unpersist()
    sq_state["c"].unpersist()

    # ---- LSH: full auto + ranked probe budget --------------------------
    policies["lsh_auto_cap"] = adaptive_bucket_cap(n)
    policies["lsh_auto_mpb"] = adaptive_multiprobe_bits(n)
    lsh_state = {}

    def build_lsh():
        idx = random_hyperplane_lsh(emb, num_tables=8, num_planes=10).cache()
        idx.count()
        ref_idx, cent_rows = lsh_refine_hot_buckets(idx, emb,
                                                    bucket_cap="auto")
        ref_idx = ref_idx.cache()
        ref_idx.count()
        lsh_state["idx"], lsh_state["ref"] = idx, (ref_idx, cent_rows)
    timed("lsh_auto_build", build_lsh)

    def run_lsh(budget=None):
        return lsh_search(emb, queries, K, num_tables=8, num_planes=10,
                          index=lsh_state["idx"],
                          bucket_cap=policies["lsh_auto_cap"],
                          multiprobe_bits=policies["lsh_auto_mpb"],
                          refined=lsh_state["ref"], corpus_n=n,
                          probe_budget=budget)
    steady("lsh_auto_search", lambda: force(run_lsh()))
    rec("lsh_auto", run_lsh)
    steady("lsh_budget24_search", lambda: force(run_lsh(24)))
    rec("lsh_budget24", lambda: run_lsh(24))
    lsh_state["idx"].unpersist()
    lsh_state["ref"][0].unpersist()

    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    out = {"n": n, "dim": DIM, "k": K, "nq": NQ,
           "total_sec": round(time.time() - t_all, 1),
           "timings": results, "recalls": recalls, "policies": policies,
           "loadavg": load}
    print(json.dumps(out))
    print()
    print("| probe | wall (s) | recall@10 |")
    print("|---|---|---|")
    for k_ in results:
        r = recalls.get(k_.replace("_search", "").replace("_build", ""), "")
        print(f"| {k_} | {results[k_]} | {r} |")


if __name__ == "__main__":
    main()
