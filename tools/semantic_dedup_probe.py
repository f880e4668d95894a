#!/usr/bin/env python3
"""Measure semantic_dedup's fixed-vs-auto cluster-count cost curve and
the codegen-vs-arrow pair-kernel crossover.

The round-8 policy claim: at a FIXED num_clusters the intra-cluster pair
join materializes ~N²/(2C) candidate rows (quadratic in N), while
num_clusters='auto' holds expected cluster size at
SEM_TARGET_CLUSTER_ROWS so pair work is ~N*target/2 (linear in N). This
probe measures wall time and the exact candidate-pair count for both
policies at increasing N on the same deterministic clustered generator
the 200k/1M ANN probes use — with the arrow GEMM pair kernel, because
the probe ALSO measures why that kernel exists: the codegen pair stage
lands the unrolled 64-term cosine in the SortMergeJoin condition, whose
generated method is too large to JIT and evaluates interpreted at ~25k
pairs/s. Appends both tables to SCALE_NOTES.md.

    python tools/semantic_dedup_probe.py [N ...]   # default 50k 100k 200k
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(a) for a in sys.argv[1:]] or [50_000, 100_000, 200_000,
                                           1_000_000]
# Above this size only the auto policy's wall is measured; the fixed-C
# cell still reports its EXACT pair count (cheap to compute from the
# assignment) but timing a ~6e10-pair GEMM is the cost the policy
# exists to prohibit.
AUTO_ONLY_ABOVE = 200_000
DIM = 64


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.dedup import (
        SEM_CLUSTERS, SEM_TARGET_CLUSTER_ROWS, adaptive_sem_clusters,
        semantic_dedup)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="semantic-dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(n: int):
        # same md5-hash generator family as tools/scale_probe*.py so the
        # corpora are comparable across probes
        base = spark.range(n).withColumn("label",
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
        path = f"/tmp/semdedup_probe_{n}"
        if not os.path.exists(path):
            (base.select(F.col("id").alias("vec_id"),
                         F.array(*dims).alias("embedding"))
             .repartition(32).write.mode("overwrite").parquet(path))
        return spark.read.parquet(path).cache()

    def pair_candidates(n: int, c: int) -> int:
        # exact candidate count for nearest-seed clusters of sizes s_i:
        # sum_i s_i*(s_i-1)/2 — computed from the assignment, not modeled.
        # Assignment kernel follows the ENGINE'S OWN policy: the join
        # shape materializes N*C rows — at 10M x auto-C that is ~5e10
        # rows whose window sort spilled a 69 GB disk to death (measured
        # in-round) — so past SEM_GEMM_ASSIGN_MIN_CELLS cells the count
        # rides the same Arrow GEMM argmin semantic_dedup itself uses.
        import warnings

        from pyspark.sql import Window
        from vectordb_explorations_spark.functions.rounding import round6
        from vectordb_explorations_spark.functions.vectors import \
            squared_l2_sql
        from vectordb_explorations_spark.operators.dedup import (
            SEM_GEMM_ASSIGN_MIN_CELLS, _sem_assign_gemm)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            emb = gen(n)
            if n * c >= SEM_GEMM_ASSIGN_MIN_CELLS:
                sizes = (_sem_assign_gemm(emb, c)
                         .groupBy("cluster_id").count().collect())
                return sum(r["count"] * (r["count"] - 1) // 2
                           for r in sizes)
            seeds = (emb.where(F.col("vec_id") < c)
                     .select(F.col("vec_id").alias("seed_id"),
                             F.col("embedding").alias("semb")))
            dist = round6(F.expr(squared_l2_sql("embedding", "semb", DIM)))
            w = Window.partitionBy("vec_id").orderBy("dist", "seed_id")
            sizes = (emb.join(F.broadcast(seeds))
                     .select("vec_id", "seed_id", dist.alias("dist"))
                     .withColumn("rn", F.row_number().over(w))
                     .where(F.col("rn") == 1)
                     .groupBy("seed_id").count().collect())
        return sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)

    import warnings

    def run(emb, clusters, kernel):
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            (semantic_dedup(emb, num_clusters=clusters, pair_kernel=kernel)
             .write.format("noop").mode("overwrite").save())
        return round(time.time() - t0, 2)

    # --- kernel crossover at a size the codegen path can still finish ---
    n_x = 5_000
    emb_x = gen(n_x)
    emb_x.count()
    xpairs = pair_candidates(n_x, SEM_CLUSTERS)
    xover = {}
    for kernel in ("codegen", "arrow"):
        run(emb_x, SEM_CLUSTERS, kernel)  # warm (codegen JIT / arrow fork)
        xover[kernel] = run(emb_x, SEM_CLUSTERS, kernel)
        print(f"[semprobe] crossover N={n_x:,} {kernel}: "
              f"{xover[kernel]}s", flush=True)
    emb_x.unpersist()

    # --- fixed-vs-auto cost curve, arrow kernel -------------------------
    rows = []
    for n in SIZES:
        emb = gen(n)
        emb.count()
        auto_c = adaptive_sem_clusters(n)
        for label, clusters, c_resolved in (
                (f"fixed C={SEM_CLUSTERS}", SEM_CLUSTERS, SEM_CLUSTERS),
                (f"auto C={auto_c}", "auto", auto_c)):
            pairs = pair_candidates(n, c_resolved)
            if n > AUTO_ONLY_ABOVE and clusters != "auto":
                dt = None  # the cost the policy prohibits; count only
            else:
                dt = run(emb, clusters, "arrow")
            rows.append((n, label, pairs, dt))
            print(f"[semprobe] N={n:,} {label}: pairs={pairs:,} "
                  f"wall={dt}s", flush=True)
        emb.unpersist()

    from vectordb_explorations_spark.operators.dedup import \
        SEM_ARROW_MIN_ROWS

    lines = [
        "",
        "## Round-8 addendum: semantic_dedup pair-kernel crossover and "
        "fixed-vs-auto cluster cost (the policies' measured basis)",
        "",
        "Same md5 clustered generator as the ANN probes, dim 64, "
        "local[32]. Two findings, one probe. **Kernel**: the codegen "
        "pair stage pushes the unrolled 64-term cosine into the "
        "SortMergeJoin condition — ONE generated method over 8 KB of "
        "bytecode, which HotSpot silently never JIT-compiles (WSC "
        "projections split expressions into small methods; join "
        "conditions don't). Proven by flag experiment: the same verdict "
        f"query at N={n_x:,} ({xpairs:,} pairs) measured 143 s on a "
        "vanilla JVM, 8 s with -XX:-DontCompileHugeMethods (the session "
        f"factory now sets it; this run: {xover['codegen']}s), and "
        f"{xover['arrow']}s on the GEMM kernel — still "
        f"{xover['codegen'] / max(xover['arrow'], 0.01):.0f}x faster "
        "than flagged codegen, and immune to the JVM opts a vanilla "
        "driver session or unflagged cluster executors would run with. "
        "pair_kernel='auto' therefore switches to the per-cluster "
        f"blockwise GEMM (applyInPandas) past {SEM_ARROW_MIN_ROWS:,} "
        "corpus rows; fixtures stay codegen (declared plan Python-free, "
        "hash-checked), and a pytest pins verdict equality between the "
        "kernels. The same lesson as dedup_embedding_lsh's 48-plane "
        "bucketing: bulk pairwise similarity belongs in an Arrow GEMM, "
        "not a giant scalar expression tree.",
        "",
        "**Policy** (arrow pair kernel throughout): `pairs` is the EXACT "
        "intra-cluster candidate count sum(s_i*(s_i-1)/2) from the real "
        "assignment — the work the verdict stage must evaluate; wall is "
        "the full query (assignment + per-cluster GEMM + order). auto "
        f"holds expected cluster size at {SEM_TARGET_CLUSTER_ROWS:,} "
        "rows (floor C=8). The 1M auto row additionally exercises "
        "assign_kernel='auto' -> 'gemm' (N*C crosses "
        "SEM_GEMM_ASSIGN_MIN_CELLS, so assignment runs as one Arrow "
        "argmin pass instead of a 245M-row broadcast cross-join); its "
        "fixed-C wall is deliberately not measured — a ~6e10-pair GEMM "
        "is the cost the cluster policy exists to prohibit. Regenerate: "
        "`python tools/semantic_dedup_probe.py`.",
        "",
        "| N | policy | candidate pairs | verdict wall (s) |",
        "|---|---|---|---|",
    ]
    for n, label, pairs, dt in rows:
        cell = "— (the prohibited cost)" if dt is None else f"{dt}"
        lines.append(f"| {n:,} | {label} | {pairs:,} | {cell} |")
    fixed = {n: (p, d) for n, lbl, p, d in rows if lbl.startswith("fixed")}
    auto = {n: (p, d) for n, lbl, p, d in rows if lbl.startswith("auto")}
    n_lo, n_hi = min(SIZES), max(SIZES)
    growth = n_hi / n_lo
    fixed_ratio = fixed[n_hi][0] / max(1, fixed[n_lo][0])
    auto_ratio = auto[n_hi][0] / max(1, auto[n_lo][0])
    lines += [
        "",
        f"Pair work grew {fixed_ratio:.1f}x for fixed C=8 vs "
        f"{auto_ratio:.1f}x for auto across a {growth:.0f}x corpus "
        "growth — the measured quadratic-vs-linear split the "
        "num_clusters='auto' policy encodes (quadratic would be "
        f"{growth * growth:.0f}x, linear {growth:.0f}x). At 100 TB the "
        "fixed-C pair join is the difference between a bounded shuffle "
        "and an effectively all-pairs stage.",
        "",
    ]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_NOTES.md")
    existing = open(path).read()
    marker = "## Round-8 addendum: semantic_dedup"
    idx = existing.find(marker)
    if idx >= 0:
        nxt = existing.find("\n## ", idx)
        existing = existing[:idx - 1] + (existing[nxt:] if nxt >= 0 else "")
    with open(path, "w") as f:
        f.write(existing.rstrip("\n") + "\n" + "\n".join(lines))
    print("appended semantic-dedup addendum to SCALE_NOTES.md")


if __name__ == "__main__":
    main()
