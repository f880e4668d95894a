#!/usr/bin/env python3
"""Scale probe for the round-11 session-2 curation additions: gopher
rules, perplexity buckets, embedding outliers, ngram novelty, and the
retrieval-quality harness, at corpus sizes far past the 5k-doc fixture,
with planted structure of KNOWN shape so outputs are checkable, not
just timeable.

Generators (deterministic, no RNG):

- documents: N docs x 50 words drawn from a 10k-word hashed vocabulary
  (zipf-free worst case for the LM fit is avoided; the fit's group
  count is vocab-bounded like a real corpus). Every 10th doc carries a
  25-token span shared across its template's 50 docs (the span-probe
  plant): the template KEEPER must score novelty 1.0 and every other
  spanned doc exactly 25/31 (6 of its 31 windows sit fully inside the
  shared span). No doc contains a stop word, so gopher_quality_signals
  must flag stopword_poor on EVERY doc and keep none.
- embeddings: N vectors, 10 labels, each tight around its label's
  center; ids 0..9 are planted far outliers (one per label) that
  embedding_outliers must rank first. retrieval_quality runs on the
  same table WITHOUT the outlier plant: every query's top-k shares its
  label, so all 20 queries must grade precision=mrr=ndcg=1.0.

    python tools/curation_scale_probe.py [N ...]   # default 100k 1M
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
N_WORDS = 50
SPAN_LEN = 25
SPAN_EVERY = 10
DOCS_PER_TEMPLATE = 50
VOCAB = 10_000
DIM = 64
N_LABELS = 10


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.dedup import ngram_novelty
    from vectordb_explorations_spark.operators.featurize import (
        embedding_outliers)
    from vectordb_explorations_spark.operators.knn import retrieval_quality
    from vectordb_explorations_spark.operators.textops import (
        gopher_quality_signals, perplexity_buckets)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="curation-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen_docs(n: int):
        t = max(1, n // SPAN_EVERY // DOCS_PER_TEMPLATE)
        path = f"/tmp/curation_probe_docs_{n}"
        if not os.path.exists(path):
            words = (
                f"transform(sequence(0, {N_WORDS - 1}), i -> "
                f"CASE WHEN id % {SPAN_EVERY} = 0 AND i >= 10 "
                f"AND i < {10 + SPAN_LEN} THEN "
                f"substr(md5(concat('span_', CAST((id DIV {SPAN_EVERY}) "
                f"% {t} AS STRING), '_', i)), 1, 6) "
                f"ELSE substr(md5(concat('v_', CAST(abs(hash(id * {N_WORDS}"
                f" + i)) % {VOCAB} AS STRING))), 1, 6) END)")
            (spark.range(n)
             .select(F.col("id").alias("doc_id"),
                     F.array_join(F.expr(words), " ").alias("text"),
                     F.concat(F.lit("l"), (F.col("id") % 5).cast("string"))
                     .alias("lang"),
                     F.lit("probe").alias("source"))
             .repartition(32)
             .write.mode("overwrite").parquet(path))
        return spark.read.parquet(path).cache(), t

    def gen_embeddings(n: int, plant_outliers: bool):
        suffix = "out" if plant_outliers else "clean"
        path = f"/tmp/curation_probe_emb_{n}_{suffix}"
        if not os.path.exists(path):
            # label centers 100 apart on every dim; jitter < 0.5; the
            # plant pushes ids 0..9 to +50 on every dim (mid-gap, far
            # from every center)
            plant = (f"CASE WHEN id < {N_LABELS} THEN 50.0 ELSE 0.0 END"
                     if plant_outliers else "0.0")
            vec = (f"transform(sequence(0, {DIM - 1}), i -> CAST("
                   f"(id % {N_LABELS}) * 100.0 "
                   f"+ (abs(hash(id * {DIM} + i)) % 100) / 200.0 "
                   f"+ {plant} AS FLOAT))")
            (spark.range(n)
             .select(F.col("id").alias("vec_id"),
                     F.expr(vec).alias("embedding"),
                     (F.col("id") % N_LABELS).cast("int").alias("label"))
             .repartition(32)
             .write.mode("overwrite").parquet(path))
        return spark.read.parquet(path).cache()

    rows = []
    for n in SIZES:
        docs, t = gen_docs(n)
        docs.count()
        timings: dict[str, float] = {}
        checks: dict[str, bool] = {}

        t0 = time.time()
        g = gopher_quality_signals(docs)
        gs = g.agg(
            F.count(F.when(F.col("drop_reasons").contains("stopword_poor"),
                           1)).alias("stop_flagged"),
            F.count(F.when(F.col("keep"), 1)).alias("kept")).collect()[0]
        timings["gopher_s"] = round(time.time() - t0, 2)
        checks["gopher_all_stop_flagged"] = int(gs["stop_flagged"]) == n
        checks["gopher_none_kept"] = int(gs["kept"]) == 0

        t0 = time.time()
        pb = perplexity_buckets(docs).collect()
        timings["ppl_buckets_s"] = round(time.time() - t0, 2)
        checks["ppl_rows"] = len(pb) == 15
        checks["ppl_docs_total"] = sum(r.n_docs for r in pb) == n
        by_lang: dict[str, list] = {}
        for r in pb:
            by_lang.setdefault(r.lang, []).append(r)
        checks["ppl_thirds_ordered"] = all(
            v[0].max_ppl <= v[1].min_ppl and v[1].max_ppl <= v[2].min_ppl
            for v in by_lang.values())

        t0 = time.time()
        nv = ngram_novelty(docs)
        # 31 windows per doc; non-keeper spanned docs share the 6 windows
        # fully inside the planted span -> novelty 25/31. The two windows
        # STRADDLING a span edge additionally collide when the single
        # boundary vocab token matches across a same-template doc pair
        # (1/VOCAB per pair per edge — a handful of docs at 10k, so the
        # planted assertion allows the collision tail but pins the count
        # of exact-25/31 docs and the total).
        import math
        frac6 = math.floor(25.0 / 31.0 * 1e6 + 0.5) / 1e6
        ns = nv.agg(
            F.count(F.when(F.col("novelty") < 1.0, 1)).alias("dup_docs"),
            F.count(F.when(F.col("novelty") == frac6, 1)).alias("exact_dup"),
            F.min("novelty").alias("min_nov")).collect()[0]
        timings["novelty_s"] = round(time.time() - t0, 2)
        expected_dups = t * (DOCS_PER_TEMPLATE - 1)
        checks["novelty_dup_docs"] = int(ns["dup_docs"]) == expected_dups
        checks["novelty_mode_is_25_31"] = (
            int(ns["exact_dup"]) >= 0.9 * expected_dups)
        checks["novelty_min_sane"] = float(ns["min_nov"]) >= 20.0 / 31.0

        emb_out = gen_embeddings(n, plant_outliers=True)
        emb_out.count()
        t0 = time.time()
        top = embedding_outliers(emb_out, top_k=1).collect()
        timings["outliers_s"] = round(time.time() - t0, 2)
        checks["outliers_planted_rank1"] = (
            sorted(r.vec_id for r in top if r.rk == 1) == list(range(10)))
        emb_out.unpersist()

        emb_clean = gen_embeddings(n, plant_outliers=False)
        emb_clean.count()
        t0 = time.time()
        rq = retrieval_quality(emb_clean, num_queries=20, k=10,
                               dim=DIM).collect()
        timings["retrieval_s"] = round(time.time() - t0, 2)
        checks["retrieval_all_perfect"] = all(
            r.precision_at_k == 1.0 and r.mrr == 1.0 and r.ndcg == 1.0
            for r in rq) and len(rq) == 20
        emb_clean.unpersist()

        row = {"n_docs": n, "templates": t, **timings,
               "checks_pass": all(checks.values()),
               "failed": [k for k, v in checks.items() if not v]}
        rows.append(row)
        print(f"[curationprobe] {json.dumps(row)}", flush=True)
        docs.unpersist()

    print()
    print("| docs | gopher s | ppl s | novelty s | outliers s "
          "| retrieval s | planted checks |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        status = "ALL PASS" if r["checks_pass"] else f"FAIL {r['failed']}"
        print(f"| {r['n_docs']:,} | {r['gopher_s']} | {r['ppl_buckets_s']} "
              f"| {r['novelty_s']} | {r['outliers_s']} "
              f"| {r['retrieval_s']} | {status} |")


if __name__ == "__main__":
    main()
