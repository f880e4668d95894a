"""Deterministic sketches (operators/sketches.py): the HLL rank
derivation against an independent Python bit-level reference, the CMS
overcount invariant and exact-when-collision-free behavior, and
planted sensitivity (adding users moves the registers/estimates in
both the engine and the declared output)."""

import hashlib

import numpy as np
import pytest

from vectordb_explorations_spark.operators.sketches import (
    CMS_DEPTH, CMS_WIDTH, HLL_M, cms_heavy_hitters,
    hll_user_cardinality)


def _ref_register_rank(key: str):
    """Independent bit-level reference: md5 -> first 4 bits register,
    leading zeros of the next 52 bits + 1 (computed on the INTEGER,
    not the hex string the engine uses)."""
    h = int(hashlib.md5(key.encode()).hexdigest()[:14], 16)  # 56 bits
    register = h >> 52
    rest = h & ((1 << 52) - 1)
    rank = 53 - rest.bit_length() if rest else 53
    return register, rank


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string")


def test_hll_registers_match_bit_level_reference(spark):
    """The hex-string rank derivation (regexp leading zeros + nibble
    case) equals the integer bit-length definition for every user in
    a planted corpus — and the emitted harmonic sum is exactly the
    reference's."""
    users = list(range(1, 300))
    rows = [(i, u, "t") for i, u in enumerate(users)]
    out = hll_user_cardinality(_events(spark, rows)).collect()
    assert len(out) == 1
    regs = {}
    for u in users:
        r, k = _ref_register_rank(str(u))
        regs[r] = max(regs.get(r, 0), k)
    s_total = sum(1 << (53 - k) for k in regs.values()) \
        + (HLL_M - len(regs)) * (1 << 53)
    row = out[0]
    assert row.n_registers_hit == len(regs)
    assert row.harmonic_sum_scaled == s_total
    assert row.true_distinct == len(users)
    # m=16 raw-regime accuracy: within 3 sigma (3 * 1.04/sqrt(16))
    assert abs(row.rel_error) < 0.78


def test_hll_estimate_moves_with_the_corpus(spark):
    """Planted sensitivity: doubling the user set changes registers
    and pushes the estimate up — the sketch is live, not a constant."""
    small = hll_user_cardinality(
        _events(spark, [(i, u, "t") for i, u in enumerate(range(50))])
    ).collect()[0]
    big = hll_user_cardinality(
        _events(spark, [(i, u, "t")
                        for i, u in enumerate(range(500))])
    ).collect()[0]
    assert big.hll_estimate > small.hll_estimate
    assert big.harmonic_sum_scaled < small.harmonic_sum_scaled


def test_cms_overcount_invariant_and_ordering(spark):
    """CMS estimates are NEVER below the true count (min over rows of
    counters that each include the key), and the declared output
    keeps the (true_n desc, user_id) contract over the top 20."""
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for u in range(40):                      # 40 keys << width 64
        for _ in range(int(rng.integers(1, 30))):
            rows.append((eid, u, "t"))
            eid += 1
    out = cms_heavy_hitters(_events(spark, rows)).collect()
    assert len(out) == 20
    assert all(r.overcount >= 0 for r in out)
    assert all(r.cms_estimate == r.true_n + r.overcount for r in out)
    # ordering contract: true_n desc, user_id asc
    keys = [(-r.true_n, r.user_id) for r in out]
    assert keys == sorted(keys)


def test_cms_forced_single_bucket_sums(spark):
    """Degenerate pin: with ONE distinct key the sketch row counters
    equal the key's count exactly, so estimate == true_n."""
    rows = [(i, 42, "t") for i in range(25)]
    out = cms_heavy_hitters(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].true_n == 25 and out[0].cms_estimate == 25
    assert out[0].overcount == 0


def test_cms_width_forces_collisions_at_fixture_scale(spark):
    """The declared parameters (width 64) against 150+ keys MUST
    produce at least one positive overcount somewhere in the full
    sketch — the honesty guard on the 'approximate' claim. (Not
    necessarily among the top 20: check via a bigger key set.)"""
    rows = [(i, u, "t") for i, u in enumerate(range(1000))]
    out = cms_heavy_hitters(_events(spark, rows)).collect()
    # 1000 keys over 64 buckets x 4 rows: every bucket ~15 deep, the
    # min over 4 rows is > 1 for some key with true_n == 1
    assert any(r.overcount > 0 for r in out)


def test_bloom_no_false_negatives_and_adaptive_sizing(spark):
    """Bloom guarantees: every true member passes (n_pass >=
    n_true_member per group, and per construction n_pass ==
    n_true_member + n_false_pos); the filter is sized from the data,
    so a 10x bigger build side keeps the false-positive rate low
    instead of saturating (the fixed-m failure mode the first
    implementation actually had)."""
    from vectordb_explorations_spark.operators.sketches import (
        bloom_join_prune)

    def frames(n_members, n_orders, seed):
        rng = np.random.default_rng(seed)
        cust = spark.createDataFrame(
            [(k, 9000.0 if k < n_members else 1.0)
             for k in range(2 * n_members)],
            "c_custkey long, c_acctbal double")
        orders = spark.createDataFrame(
            [(i, int(rng.integers(0, 2 * n_members)), "P")
             for i in range(n_orders)],
            "o_orderkey long, o_custkey long, o_orderpriority string")
        return cust, orders

    for n_members in (50, 500):
        out = bloom_join_prune(*frames(n_members, 2000, n_members))
        rows = out.collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.n_pass == r.n_true_member + r.n_false_pos
        assert r.n_pass >= r.n_true_member          # no false negatives
        # 16 bits/key holds FPR way under the saturation regime
        assert r.false_pos_rate < 0.05, (n_members, r.false_pos_rate)


def test_bloom_bitmap_signature_tracks_build_side(spark):
    """The bitmap_md5 column pins the packed filter content: adding
    one eligible customer changes it; reordering input rows does not
    (bit_or is order-free)."""
    from vectordb_explorations_spark.operators.sketches import (
        bloom_join_prune)

    orders = spark.createDataFrame(
        [(1, 1, "P")], "o_orderkey long, o_custkey long, "
        "o_orderpriority string")

    def sig(keys):
        cust = spark.createDataFrame(
            [(k, 9000.0) for k in keys],
            "c_custkey long, c_acctbal double")
        return bloom_join_prune(cust, orders).collect()[0].bitmap_md5

    assert sig([1, 2, 3]) == sig([3, 1, 2])
    assert sig([1, 2, 3]) != sig([1, 2, 3, 4])


def test_streaming_hll_equals_batch_registers(spark, sf_dir):
    """The merge property that makes HLL a streaming monitor:
    update-mode register maxima drained across micro-batches finalize
    to EXACTLY the batch query's sketch columns."""
    from vectordb_explorations_spark.sources import load_table
    from vectordb_explorations_spark.streaming.events import (
        streaming_hll_monitor)

    batch = {r.event_type: (r.n_registers_hit, r.harmonic_sum_scaled,
                            r.hll_estimate)
             for r in hll_user_cardinality(
                 load_table(spark, "events", sf_dir)).collect()}
    stream = {r.event_type: (r.n_registers_hit,
                             r.harmonic_sum_scaled, r.hll_estimate)
              for r in streaming_hll_monitor(spark, sf_dir).collect()}
    assert stream == batch


# ---------------------------------------------------------------------------
# KMV set-operation sketch
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def _ref_kmv_pairs(texts_by_source):
    """Independent pure-Python KMV reference: 60-bit md5 shingle
    hashes, k-smallest sketches, merged k-set membership — the whole
    estimator recomputed outside Spark/DuckDB."""
    import math

    from vectordb_explorations_spark.operators.sketches import KMV_K

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)} \
            if len(w) >= 3 else set()

    def r6(x):
        return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0

    hs = {src: {int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                for t in texts for s in shingles(t)}
          for src, texts in texts_by_source.items()}

    def est(n, kth):
        return float(n) if n < KMV_K \
            else (KMV_K - 1.0) * float(1 << 60) / float(kth)

    out = {}
    for a in sorted(hs):
        for b in sorted(hs):
            if a >= b:
                continue
            ska, skb = (sorted(hs[a])[:KMV_K], sorted(hs[b])[:KMV_K])
            merged = sorted(set(ska) | set(skb))[:KMV_K]
            sa, sb = set(ska), set(skb)
            n_shared = sum(1 for h in merged if h in sa and h in sb)
            jac = n_shared / len(merged)
            u_est = est(len(merged), merged[-1])
            inter = hs[a] & hs[b]
            tj = len(inter) / len(hs[a] | hs[b])
            out[(a, b)] = dict(
                kth_a=ska[-1], kth_b=skb[-1], kth_union=merged[-1],
                n_shared=n_shared,
                union_sketch_md5=hashlib.md5(
                    "|".join(str(h) for h in merged).encode()
                ).hexdigest(),
                distinct_est_a=r6(est(len(ska), ska[-1])),
                distinct_est_b=r6(est(len(skb), skb[-1])),
                union_est=r6(u_est), jaccard_est=r6(jac),
                intersection_est=r6(jac * u_est),
                true_jaccard=r6(tj), jaccard_err=r6(jac - tj))
    return out


def test_kmv_matches_bit_level_reference_full_sketches(spark):
    """Sources with > KMV_K distinct shingles (the full-sketch
    estimator path): every output column — bigint sketch pins, the
    merged-set md5, and all 6-dp estimates — equals the pure-Python
    reference exactly."""
    from vectordb_explorations_spark.operators.sketches import (
        KMV_K, kmv_source_overlap)

    # ~298 shingles per source, overlapping halfway: srcA = w0..w299,
    # srcB = w150..w449, srcC disjoint
    mk = lambda lo, hi: " ".join(f"w{i}" for i in range(lo, hi))
    texts = {"sa": [mk(0, 300)], "sb": [mk(150, 450)],
             "sc": [mk(1000, 1300)]}
    rows = [(i, src, t) for i, (src, ts) in enumerate(sorted(
        texts.items())) for t in ts]
    got = {(r.source_a, r.source_b): r
           for r in kmv_source_overlap(_docs(spark, rows)).collect()}
    ref = _ref_kmv_pairs(texts)
    assert set(got) == set(ref)
    for pair, e in ref.items():
        r = got[pair]
        for col, v in e.items():
            assert getattr(r, col) == v, (pair, col, getattr(r, col), v)
    # and the full path really was exercised
    assert all(len({s for t in ts for s in [
        " ".join(t.split(" ")[i:i + 3])
        for i in range(len(t.split(" ")) - 2)]}) > KMV_K
        for ts in texts.values())


def test_kmv_underfull_sketch_is_exact(spark):
    """Below KMV_K distinct shingles the sketch IS the set: distinct
    estimates equal the exact counts and jaccard_est equals
    true_jaccard (jaccard_err == 0)."""
    from vectordb_explorations_spark.operators.sketches import (
        kmv_source_overlap)

    mk = lambda lo, hi: " ".join(f"w{i}" for i in range(lo, hi))
    rows = [(1, "sa", mk(0, 30)), (2, "sb", mk(10, 40))]
    out = kmv_source_overlap(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.distinct_est_a == 28.0 and r.distinct_est_b == 28.0
    assert r.jaccard_err == 0.0
    assert r.jaccard_est == r.true_jaccard
    # exact overlap: shingles w10..w27 start indices shared = 18 of 38
    # (6-dp rounded output vs the exact ratio)
    assert r.n_shared == 18 and abs(r.true_jaccard - 18 / 38) < 1e-6


def test_kmv_estimates_track_truth_at_fixture_scale(spark, sf_dir):
    """Accuracy honesty-guard at declared parameters (K=128) on the
    real fixture: every source pair's Jaccard estimate lands within
    0.1 of truth (k=128 puts one merged-set slot at 1/128 ~ 0.008, so
    0.1 is ~3+ sigma headroom at fixture overlap levels), and the
    estimator is live, not vacuous — estimates vary across pairs."""
    from vectordb_explorations_spark.sources import load_table
    from vectordb_explorations_spark.operators.sketches import (
        kmv_source_overlap)

    rows = kmv_source_overlap(
        load_table(spark, "documents", sf_dir)).collect()
    assert len(rows) == 190                      # C(20, 2)
    for r in rows:
        assert abs(r.jaccard_err) < 0.1, (r.source_a, r.source_b)
    assert len({r.union_est for r in rows}) > 1
    assert len({r.jaccard_est for r in rows}) > 1


def test_streaming_cms_equals_batch(spark, sf_dir):
    """Counter sums are commutative+associative: the update-mode CMS
    cells drained across micro-batches finalize to EXACTLY the batch
    query's output rows."""
    from vectordb_explorations_spark.sources import load_table
    from vectordb_explorations_spark.streaming.events import (
        streaming_cms_monitor)

    batch = {(r.user_id, r.true_n, r.cms_estimate, r.overcount)
             for r in cms_heavy_hitters(
                 load_table(spark, "events", sf_dir)).collect()}
    stream = {(r.user_id, r.true_n, r.cms_estimate, r.overcount)
              for r in streaming_cms_monitor(spark, sf_dir).collect()}
    assert stream == batch


def test_hll_null_user_id_hashes_as_empty_key(spark):
    """Review regression: a NULL user_id must hash like the empty
    string (the coalesce both engines share), not produce a NULL
    register row — pinned against the bit-level reference."""
    out = hll_user_cardinality(
        _events(spark, [(1, None, "t"), (2, 7, "t")])).collect()
    assert len(out) == 1
    regs = {}
    for key in ("", "7"):
        r, k = _ref_register_rank(key)
        regs[r] = max(regs.get(r, 0), k)
    s_total = sum(1 << (53 - k) for k in regs.values()) \
        + (HLL_M - len(regs)) * (1 << 53)
    assert out[0].n_registers_hit == len(regs)
    assert out[0].harmonic_sum_scaled == s_total


def test_streaming_kmv_multibatch_state_merge(spark, tmp_path):
    """The KMV merge rule across REAL micro-batch boundaries: the
    fixture docs split into two parquet files stream as two batches
    (maxFilesPerTrigger=1); the drained max-version sketch per source
    equals the pure-Python k-smallest-of-all construction, and
    versions are strictly monotone across the two updates."""
    import hashlib

    from pyspark.sql import types as T

    from vectordb_explorations_spark.operators.sketches import KMV_K
    from vectordb_explorations_spark.streaming.documents import (
        kmv_stream)
    from vectordb_explorations_spark.streaming.events import (
        await_drained, run_to_memory)

    mk = lambda lo, hi: " ".join(f"w{i}" for i in range(lo, hi))
    rows_a = [(1, "sa", mk(0, 200)), (2, "sb", mk(300, 420))]
    rows_b = [(3, "sa", mk(100, 320)), (4, "sb", mk(400, 520))]
    schema = "doc_id long, source string, lang string, text string"
    d = tmp_path / "docs_stream"
    d.mkdir()
    spark.createDataFrame(
        [(i, s, "en", t) for i, s, t in rows_a], schema
    ).coalesce(1).write.parquet(str(d / "part_a"))
    spark.createDataFrame(
        [(i, s, "en", t) for i, s, t in rows_b], schema
    ).coalesce(1).write.parquet(str(d / "part_b"))

    stream = (spark.readStream
              .schema(spark.read.parquet(str(d / "part_a")).schema)
              .option("maxFilesPerTrigger", 1)
              .option("pathGlobFilter", "*.parquet")
              .parquet(f"{d}/part_*"))
    name = "skmv_mb_test"
    q = run_to_memory(kmv_stream(stream), name, "update")
    await_drained(q)
    got = spark.table(name).collect()

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    ref = {}
    for _i, src, t in rows_a + rows_b:
        ref.setdefault(src, set()).update(
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            for s in shingles(t))
    for src, hs in ref.items():
        ks = sorted(hs)[:KMV_K]
        rows = sorted((r for r in got if r.source == src),
                      key=lambda r: r.version)
        assert len(rows) == 2                      # one per batch
        assert rows[0].version < rows[1].version   # monotone
        final = rows[1]
        assert final.n_sk == len(ks)
        assert final.kth == ks[-1]
        assert final.sketch_md5 == hashlib.md5(
            "|".join(str(x) for x in ks).encode()).hexdigest()
