#!/usr/bin/env python3
"""MinHash persisted-admission probe (r12 verdict item 6): measure the
serving face (minhash_persist + minhash_admit_persisted) against the
derive-in-memory admission shape at corpus sizes far past the fixture,
with planted structure so the verdicts are checkable, not just timeable.

Generator (deterministic, no RNG): N old docs x 30 six-char md5 words
(distinct per doc — random docs never share a band), plus a 500-doc
admission batch where every 5th doc is an EXACT copy of old doc
(i * 7919) % N (jaccard 1.0 — rejection is deterministic, every band
collides) and the rest are fresh. Expected admission verdict is exact:
100 rejected with best_jaccard 1.0 and matched_old == the planted source,
400 admitted.

The comparator re-derives the old side's signatures + banding in memory
on every admission run — the cost incremental_dedup's docstring says a
persisted banded table exists to amortize. The probe reports both,
plus the one-time substrate build.

    python tools/minhash_persist_probe.py [N ...]   # default 100k 1M
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
N_WORDS = 30
BATCH = 500
COPY_EVERY = 5


def main() -> None:
    from pyspark.sql import Window, functions as F

    from vectordb_explorations_spark.operators import dedup as D
    from vectordb_explorations_spark.functions.rounding import round6
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="minhash-persist-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(n: int):
        path = f"/tmp/mh_probe_docs_{n}"
        if not os.path.exists(path):
            words = (f"transform(sequence(0, {N_WORDS - 1}), i -> "
                     f"substr(md5(concat(id, '_', i)), 1, 6))")
            (spark.range(n)
             .select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"),
                     F.array_join(F.expr(words), " ").alias("text"))
             .repartition(32)
             .write.mode("overwrite").parquet(path))
        bpath = f"/tmp/mh_probe_batch_{n}"
        if not os.path.exists(bpath):
            # every COPY_EVERY-th batch doc copies old doc (i*7919)%n
            src = f"(CAST(id AS BIGINT) * 7919) % {n}"
            words = (f"transform(sequence(0, {N_WORDS - 1}), i -> "
                     f"CASE WHEN id % {COPY_EVERY} = 0 THEN "
                     f"substr(md5(concat({src}, '_', i)), 1, 6) ELSE "
                     f"substr(md5(concat('new_', id, '_', i)), 1, 6) END)")
            (spark.range(BATCH)
             .select((F.col("id") + n).alias("doc_id"),
                     F.lit("en").alias("lang"),
                     F.array_join(F.expr(words), " ").alias("text"),
                     F.expr(f"CASE WHEN id % {COPY_EVERY} = 0 THEN {src} "
                            f"ELSE NULL END").alias("planted_src"))
             .write.mode("overwrite").parquet(bpath))
        return (spark.read.parquet(path).cache(),
                spark.read.parquet(bpath).cache())

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed3(fn):
        fn()
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        return round(sorted(runs)[1], 2)

    def admit_in_memory(old_docs, batch):
        """The same admission joins, old side derived per run (the
        signature pass the substrate exists to pay once)."""
        bo = D.banded_keys(D.minhash_signatures(old_docs))
        bn = D.banded_keys(D.minhash_signatures(batch))
        cand = (bn.select(F.col("doc_id").alias("new_id"), "band_idx",
                          "band_key")
                .join(bo.select(F.col("doc_id").alias("old_id"),
                                "band_idx", "band_key"),
                      ["band_idx", "band_key"])
                .select("new_id", "old_id").distinct())
        sh_new = D._shingle_sets(batch)
        sh_old = D._shingle_sets(old_docs)
        jac = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
               / F.size(F.array_union("sh_a", "sh_b")))
        ver = (cand
               .join(sh_new.select(F.col("doc_id").alias("new_id"),
                                   F.col("sh").alias("sh_a")), "new_id")
               .join(sh_old.select(F.col("doc_id").alias("old_id"),
                                   F.col("sh").alias("sh_b")), "old_id")
               .select("new_id", "old_id", round6(jac).alias("jaccard"))
               .where(F.col("jaccard") >= D.JACCARD_THRESHOLD))
        w = Window.partitionBy("new_id").orderBy(F.col("jaccard").desc(),
                                                 F.col("old_id").asc())
        return (ver.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1))

    for n in SIZES:
        docs, batch = gen(n)
        docs.count(), batch.count()
        base = f"/tmp/mh_probe_substrate_{n}"

        t0 = time.time()
        D.minhash_persist(docs, base)
        t_build = round(time.time() - t0, 2)

        t_admit = timed3(
            lambda: force(D.minhash_admit_persisted(spark, base, batch)))
        t_inmem = timed3(lambda: force(admit_in_memory(docs, batch)))

        out = {r["doc_id"]: r for r in
               D.minhash_admit_persisted(spark, base, batch).collect()}
        planted = {r["doc_id"]: r["planted_src"]
                   for r in batch.select("doc_id", "planted_src").collect()}
        n_rej = sum(1 for r in out.values() if not r["admitted"])
        bad = [d for d, src in planted.items() if src is not None
               and (out[d]["admitted"] or out[d]["matched_old"] != src
                    or out[d]["best_jaccard"] != 1.0)]
        extra = [d for d, src in planted.items() if src is None
                 and not out[d]["admitted"]]
        print(f"N={n} build_substrate_s={t_build} "
              f"admit_persisted_s={t_admit} admit_inmemory_s={t_inmem} "
              f"rejected={n_rej}/{BATCH} planted_errors={len(bad)} "
              f"false_rejections={len(extra)}", flush=True)
        assert not bad and not extra, (bad[:5], extra[:5])
        assert n_rej == BATCH // COPY_EVERY, n_rej


if __name__ == "__main__":
    main()
