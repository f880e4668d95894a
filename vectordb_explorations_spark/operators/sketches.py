"""Deterministic cardinality / frequency sketches (r14 build, staged
for the r15 window) — the streaming summaries a 100 TB pipeline keys
its monitoring on, declared as hash-checkable queries.

At cluster scale you cannot afford exact distinct counts or exact
per-key frequency tables over every slice; the standard answers are
HyperLogLog (Flajolet et al. 2007) and Count-Min (Cormode &
Muthukrishnan 2005). Spark ships approx_count_distinct, but its HLL++
register layout is opaque to a cross-engine oracle — so these
operators build the sketches FROM FIRST PRINCIPLES on the engine's
established cross-engine hash primitive (``conv(substr(md5(x),..),
16, 10)`` / DuckDB ``CAST(concat('0x', ..) AS BIGINT)``,
operators/dedup.py:107): every register value, counter, and estimate
is a deterministic function of the data, identical in both engines,
so the driver's hash gate checks the SKETCH CONTENT, not just row
counts.

Scale shape (both operators): one scan with a combinable groupBy —
map-side partial max (HLL registers) or partial count (CMS counters)
reduces the shuffle to (groups x m) rows regardless of input size;
the CMS estimate side broadcasts the fixed-size sketch to the top-k
keys. No windows, no driver collects.

Determinism notes: register ranks derive from md5 HEX STRINGS
(leading-zero runs via regexp, nibble case analysis) — never floating
log2; harmonic sums are kept as EXACT BIGINTs (sum of 2^(53-rank))
and converted to a double estimate with one multiply/divide chain of
parse-identical literals, then the shared binary half-up round
(functions/rounding) — see that module's docstring for why decimal
rounding is not cross-engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6

HLL_P = 4                       # 2^4 = 16 registers
HLL_M = 1 << HLL_P
# Flajolet's alpha_16; parse-identical literal in both engines
HLL_ALPHA = 0.673
_POW53 = 9007199254740992.0     # 2^53, exact double literal
_POW53_I = 1 << 53

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_TOPN = 20


def _hll_rank_cols(key_str):
    """(register, rank) Spark columns for one string key. register =
    first md5 nibble (HLL_P=4 bits); rank = leading-zero bits of the
    next 52 bits + 1, derived from the hex string: z leading '0'
    chars, then the first nonzero nibble's position within its 4 bits
    (never floating log2)."""
    md5 = F.md5(key_str.cast("binary"))
    register = F.conv(F.substring(md5, 1, 1), 16, 10).cast("int")
    hex13 = F.substring(md5, 2, 13)
    z = F.length(F.regexp_extract(hex13, "^0*", 0))
    # Column-arg substr (F.substring needs int literals); conv('')
    # on the z=13 row is NULL-safe — the when() shields it
    d = F.conv(hex13.substr(z + 1, F.lit(1)), 16, 10).cast("int")
    nib = (F.when(d >= 8, 1).when(d >= 4, 2).when(d >= 2, 3)
           .otherwise(4))
    rank = F.when(z == 13, F.lit(53)).otherwise(z * 4 + nib)
    return register, rank


def hll_user_cardinality(events: DataFrame) -> DataFrame:
    """Declared query (staged r14 for r15): per-event-type HyperLogLog
    over user_id, with every intermediate on the output so the hash
    gate pins the whole sketch: registers hit, the EXACT scaled
    harmonic sum (bigint — empty registers contribute 2^53), the raw
    HLL estimate (alpha_m * m^2 / sum 2^-rank), its relative error
    against the exact distinct count, and the event volume.

    m = 16 registers keeps every fixture scale in HLL's raw regime
    (distinct users >> 2.5m at sf0.01+); the small-range
    linear-counting branch is deliberately NOT applied — it needs ln,
    whose libm rounding is not cross-engine-stable (the rounding
    module's lesson), and the raw inputs to apply it are all emitted.
    Cites hnsw.cc: none — north-star extension."""
    regs = hll_registers(events)
    harm = _hll_harmonics(regs)
    truth = (events.groupBy("event_type")
             .agg(F.count("*").alias("n_events"),
                  F.countDistinct("user_id").alias("true_distinct")))
    raw_est = _hll_raw_estimate()
    return (truth.join(harm, "event_type")
            .select("event_type", "n_events", "true_distinct",
                    "n_registers_hit", "harmonic_sum_scaled",
                    round6(raw_est).alias("hll_estimate"),
                    round6((raw_est - F.col("true_distinct"))
                           / F.col("true_distinct")).alias("rel_error"))
            .orderBy("event_type"))


def hll_registers(events: DataFrame) -> DataFrame:
    """(event_type, register, mr) register maxima — the MERGEABLE
    sketch state: max is commutative/idempotent, so the same frame
    works as a batch aggregation, a streaming update-mode
    aggregation, or a union of shards (register-wise max IS HLL
    sketch union). NULL keys coalesce to '' BEFORE hashing — the
    _cms_bucket concat_ws trap's sibling: an un-coalesced NULL makes
    Spark emit a NULL-register row while the oracle's
    concat('0x', substr(NULL..)) errors outright."""
    register, rank = _hll_rank_cols(
        F.coalesce(F.col("user_id").cast("string"), F.lit("")))
    return (events
            .select("event_type", register.alias("register"),
                    rank.alias("rank"))
            .groupBy("event_type", "register")
            .agg(F.max("rank").alias("mr")))


def _hll_harmonics(regs: DataFrame) -> DataFrame:
    """Registers -> per-group (n_registers_hit, harmonic_sum_scaled)
    with empty registers contributing 2^53 exactly."""
    harm = (regs.groupBy("event_type")
            .agg(F.count("*").alias("n_registers_hit"),
                 # F.shiftleft needs an int-literal bit count; the SQL
                 # form takes a column
                 F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - mr)"))
                 .alias("s_present")))
    s_total = (F.col("s_present")
               + (F.lit(HLL_M) - F.col("n_registers_hit"))
               * F.lit(_POW53_I))
    return harm.select("event_type", "n_registers_hit",
                       s_total.alias("harmonic_sum_scaled"))


def _hll_raw_estimate():
    """The estimate column over a frame carrying
    harmonic_sum_scaled (parse-identical literal chain — see the
    oracle's DOUBLE-cast note)."""
    return (F.lit(HLL_ALPHA) * HLL_M * HLL_M * F.lit(_POW53)
            / F.col("harmonic_sum_scaled").cast("double"))


def hll_user_cardinality_oracle() -> str:
    # explicit DOUBLE casts: DuckDB would otherwise run the literal
    # chain in DECIMAL and overflow at 172288 * 2^53; the
    # multiplication order matches the Spark expression left-to-right
    # so the IEEE results are identical
    raw = (f"CAST({HLL_ALPHA} AS DOUBLE) * {HLL_M} * {HLL_M} "
           f"* CAST({_POW53} AS DOUBLE) / CAST(s_total AS DOUBLE)")
    return f"""
WITH k AS (
  SELECT event_type,
         md5(coalesce(CAST(user_id AS VARCHAR), '')) AS h
  FROM events
), zd AS (
  SELECT event_type,
         CAST(concat('0x', substr(h, 1, 1)) AS BIGINT) AS register,
         substr(h, 2, 13) AS hex13,
         length(regexp_extract(substr(h, 2, 13), '^0*')) AS z
  FROM k
), nib AS (
  SELECT event_type, register, z,
         CASE WHEN z = 13 THEN 0 ELSE
           CAST(concat('0x', substr(hex13, z + 1, 1)) AS BIGINT)
         END AS d
  FROM zd
), ranked AS (
  SELECT event_type, register,
         CASE WHEN z = 13 THEN 53 ELSE z * 4 + (CASE
           WHEN d >= 8 THEN 1 WHEN d >= 4 THEN 2 WHEN d >= 2 THEN 3
           ELSE 4 END) END AS rank
  FROM nib
), regs AS (
  SELECT event_type, register, max(rank) AS mr
  FROM ranked GROUP BY event_type, register
), harm AS (
  SELECT event_type, count(*) AS n_registers_hit,
         sum((1::BIGINT << (53 - mr)))::BIGINT AS s_present
  FROM regs GROUP BY event_type
), truth AS (
  SELECT event_type, count(*) AS n_events,
         count(DISTINCT user_id) AS true_distinct
  FROM events GROUP BY event_type
), j AS (
  SELECT t.*, h.n_registers_hit,
         (h.s_present + ({HLL_M} - h.n_registers_hit)
          * {_POW53_I}::BIGINT)::BIGINT AS s_total
  FROM truth t JOIN harm h USING (event_type)
)
SELECT event_type, n_events, true_distinct, n_registers_hit,
       s_total AS harmonic_sum_scaled,
       {r6(raw)} AS hll_estimate,
       {r6(f"(({raw}) - true_distinct) / true_distinct")} AS rel_error
FROM j ORDER BY event_type
"""


def _cms_bucket(r_col, key_str):
    """Row-r counter index for a string key: 32 md5 bits of 'r:key'
    mod CMS_WIDTH — the per-row independent hash family. The key
    coalesces to '' BEFORE concat_ws: Spark's concat_ws DROPS a NULL
    argument ('r') while DuckDB's concat renders it empty ('r:') —
    the dedup.py:99 trap; coalescing makes both engines hash 'r:'."""
    return (F.conv(F.substring(
        F.md5(F.concat_ws(":", r_col.cast("string"),
                          F.coalesce(key_str, F.lit("")))
              .cast("binary")), 1, 8), 16, 10)
        .cast("long") % CMS_WIDTH)


def cms_heavy_hitters(events: DataFrame) -> DataFrame:
    """Declared query (staged r14 for r15): Count-Min heavy hitters
    over user_id — build the depth x width counter sketch in one
    combinable pass, then read the top-CMS_TOPN true keys back
    through it. Emits true_n, the CMS estimate (min over rows), and
    the overcount — which is PROVABLY >= 0, so the output doubles as
    a live invariant check on the sketch math; width 64 << 150+ keys
    forces real collisions, keeping the overcount column honest.

    Scale: the sketch is a groupBy over (depth x width) cells —
    map-side combine collapses the shuffle to 256 rows per partition;
    the estimate side broadcasts those 256 cells to the top keys.
    Cites hnsw.cc: none — north-star extension."""
    rs = F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
    keyed = events.select(
        F.col("user_id").cast("string").alias("k"),
        F.explode(rs).alias("r"))
    sketch = (keyed
              .select("r", _cms_bucket(F.col("r"), F.col("k"))
                      .alias("bucket"))
              .groupBy("r", "bucket").agg(F.count("*").alias("c")))
    top = (events.groupBy("user_id")
           .agg(F.count("*").alias("true_n"))
           .orderBy(F.desc("true_n"), "user_id").limit(CMS_TOPN))
    probes = (top.select("user_id", "true_n", F.explode(rs).alias("r"))
              .withColumn("bucket",
                          _cms_bucket(F.col("r"),
                                      F.col("user_id").cast("string"))))
    est = (probes.join(F.broadcast(sketch), ["r", "bucket"])
           .groupBy("user_id", "true_n")
           .agg(F.min("c").alias("cms_estimate")))
    return (est.select(
        "user_id", "true_n", "cms_estimate",
        (F.col("cms_estimate") - F.col("true_n")).alias("overcount"))
        .orderBy(F.desc("true_n"), "user_id"))


def cms_heavy_hitters_oracle() -> str:
    bucket = ("CAST(concat('0x', substr(md5(concat(r, ':', "
              "CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) "
              f"% {CMS_WIDTH}")
    return f"""
WITH rs AS (SELECT unnest(range({CMS_DEPTH})) AS r),
keyed AS (
  SELECT r, {bucket} AS bucket FROM events CROSS JOIN rs
), sketch AS (
  SELECT r, bucket, count(*) AS c FROM keyed GROUP BY r, bucket
), top AS (
  SELECT user_id, count(*) AS true_n FROM events
  GROUP BY user_id ORDER BY true_n DESC, user_id LIMIT {CMS_TOPN}
), probes AS (
  SELECT user_id, true_n, r, {bucket} AS bucket
  FROM top CROSS JOIN rs
), est AS (
  SELECT user_id, true_n, min(c) AS cms_estimate
  FROM probes JOIN sketch USING (r, bucket)
  GROUP BY user_id, true_n
)
SELECT user_id, true_n, cms_estimate,
       cms_estimate - true_n AS overcount
FROM est ORDER BY true_n DESC, user_id
"""


BLOOM_BITS_PER_KEY = 16         # m = 16 bits per eligible key (the
                                # corpus-adaptive 'auto' discipline: a
                                # FIXED m saturates at the next scale
                                # factor; 16n holds the false-positive
                                # rate at (1 - e^(-5/16))^5 ~ 0.14%
                                # at EVERY corpus size)
BLOOM_K = 5                     # hash functions
BLOOM_WORD = 32                 # bits packed per bigint word: DuckDB
                                # overflow-checks 1::BIGINT << 63, so
                                # stay well under the sign bit
BLOOM_BALANCE_MIN = 5000.0      # "hot customers" predicate


def _bloom_positions(key_str, m_col):
    """BLOOM_K independent bit positions for one string key — the
    md5('i:key') % m family (the CMS construction with k rows); the
    modulus is a COLUMN (the broadcast corpus-sized bit count), never
    a baked constant. NULL keys coalesce to '' (the concat_ws-drops-
    NULL vs DuckDB-concat-renders-empty divergence — see
    _cms_bucket)."""
    return [
        (F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(str(i)),
                              F.coalesce(key_str, F.lit("")))
                  .cast("binary")), 1, 8), 16, 10)
         .cast("long") % m_col)
        for i in range(BLOOM_K)]


def bloom_join_prune(customer: DataFrame, orders: DataFrame
                     ) -> DataFrame:
    """Declared query (staged r14 for r15): Bloom-filter semi-join
    pruning — THE shuffle-avoidance tool for selective joins at
    100 TB (build a small bit filter on the build side's hot keys,
    broadcast it, drop probe rows before they ever reach the join
    exchange). Builds a 5-hash filter over customers with acctbal >
    BLOOM_BALANCE_MIN, sized at 16 bits per eligible key — the size
    is COMPUTED FROM THE DATA as a broadcast scalar (cross-joined
    1-row frame, no driver collect), identically in both engines, so
    the ~0.14% false-positive rate survives any scale factor where a
    fixed-m filter would saturate. Probes every order and emits per
    order-priority: rows probed, rows passing, true members, false
    positives, the 6-dp false-positive and pass rates — plus the md5
    of the PACKED BITMAP WORDS in word order, so the hash gate pins
    the filter's exact content. Bloom guarantees no false negatives:
    n_pass == n_true_member + n_false_pos by construction, and the
    pytest pins that every true member passes.

    Scale shape: the build side collapses to m/32 packed words
    (map-side bit_or); the probe is one scan with the word table
    broadcast; the output is a 5-row rollup.
    Cites hnsw.cc: none — north-star extension."""
    elig = (customer.where(F.col("c_acctbal") > BLOOM_BALANCE_MIN)
            .select(F.col("c_custkey").alias("k")))
    msize = elig.agg(F.greatest(
        F.count("*") * BLOOM_BITS_PER_KEY,
        F.lit(BLOOM_WORD).cast("long")).alias("mbits"))
    pos = F.explode(F.array(*_bloom_positions(
        F.col("k").cast("string"), F.col("mbits")))).alias("pos")
    # localCheckpoint: the packed word table feeds the signature, the
    # BLOOM_K probe lookups below and nothing else — without
    # materialization the build subtree is planned once per consumer
    # (Spark 4.1.2 plans no ReusedExchange up front). Bounded: m/32
    # rows = 1 word per 2 eligible keys.
    words = (elig.crossJoin(F.broadcast(msize)).select(pos)
             .select((F.col("pos") / BLOOM_WORD).cast("int")
                     .alias("word"),
                     F.expr(f"shiftleft(cast(1 as bigint), "
                            f"pos % {BLOOM_WORD})").alias("m"))
             .groupBy("word").agg(F.bit_or("m").alias("bm"))
             .localCheckpoint())
    # bitmap signature: md5 over 'word:bm' tokens in NUMERIC word
    # order — array_sort over structs (collect_list order is not
    # guaranteed, and zero-padding caps the scale)
    sig = words.select(F.expr(
        "md5(cast(concat_ws('|', transform("
        "array_sort(collect_list(struct(word, bm))), "
        "x -> concat(x.word, ':', x.bm))) as binary)) AS bitmap_md5"))
    # Probe side: BLOOM_K chained broadcast word lookups, NO explode —
    # the previous shape exploded every order into BLOOM_K probe rows
    # and shuffled them on a synthetic row_id to AND the bit tests back
    # together (one corpus-sized exchange of K x |orders| rows). The
    # word table is already broadcast; probing it K times per row keeps
    # the whole probe in one map-side stage (identical broadcast
    # exchanges are reused), so the only exchange left on the probe
    # side is the 5-group priority rollup. Results identical
    # (exceptAll both ways = 0 at sf0.1); fixture-neutral wall, the win
    # is the removed K x |orders| shuffle at scale (guide §2.3/§3).
    base = (orders.select(F.col("o_custkey"), F.col("o_orderpriority"))
            .crossJoin(F.broadcast(msize)))
    poss = _bloom_positions(F.col("o_custkey").cast("string"),
                            F.col("mbits"))
    proj = (base.select(
        "o_custkey", "o_orderpriority",
        *[p.alias(f"p{i}") for i, p in enumerate(poss)])
        .select(
            "o_custkey", "o_orderpriority",
            *[(F.col(f"p{i}") / BLOOM_WORD).cast("int").alias(f"w{i}")
              for i in range(BLOOM_K)],
            *[F.expr(f"shiftleft(cast(1 as bigint), p{i} % {BLOOM_WORD})")
              .alias(f"m{i}") for i in range(BLOOM_K)]))
    cur = proj
    passes = None
    for i in range(BLOOM_K):
        wt = words.select(F.col("word").alias(f"_jw{i}"),
                          F.col("bm").alias(f"_bm{i}"))
        cur = cur.join(F.broadcast(wt),
                       cur[f"w{i}"] == wt[f"_jw{i}"], "left")
        bit = F.coalesce(
            F.col(f"_bm{i}").bitwiseAND(F.col(f"m{i}")) != 0,
            F.lit(False))
        passes = bit if passes is None else (passes & bit)
    hit = cur.select("o_custkey", "o_orderpriority",
                     passes.cast("int").alias("passes"))
    member = elig.distinct().withColumn("is_member", F.lit(1))
    per_order = (hit.join(F.broadcast(member),
                          hit.o_custkey == member.k, "left")
                 .select("o_orderpriority", "passes",
                         F.coalesce("is_member", F.lit(0))
                         .alias("is_member")))
    stats = (per_order.groupBy("o_orderpriority")
             .agg(F.count("*").alias("n_orders"),
                  F.sum("passes").alias("n_pass"),
                  F.sum("is_member").alias("n_true_member"),
                  F.sum(F.when((F.col("passes") == 1)
                               & (F.col("is_member") == 0), 1)
                        .otherwise(0)).alias("n_false_pos")))
    fpr_den = F.col("n_orders") - F.col("n_true_member")
    return (stats.crossJoin(F.broadcast(sig))
            .select("o_orderpriority", "n_orders", "n_pass",
                    "n_true_member", "n_false_pos",
                    round6(F.col("n_false_pos").cast("double")
                           / F.when(fpr_den > 0, fpr_den).otherwise(1)
                           .cast("double")).alias("false_pos_rate"),
                    round6(F.col("n_pass").cast("double")
                           / F.col("n_orders").cast("double"))
                    .alias("pass_rate"),
                    "bitmap_md5")
            .orderBy("o_orderpriority"))


def bloom_join_prune_oracle() -> str:
    def pos_sql(i: int, key: str) -> str:
        return (f"(CAST(concat('0x', substr(md5(concat('{i}', ':', "
                f"CAST({key} AS VARCHAR))), 1, 8)) AS BIGINT) "
                f"% (SELECT mbits FROM msize))")

    build_pos = " UNION ALL ".join(
        f"SELECT {pos_sql(i, 'k')} AS pos FROM elig"
        for i in range(BLOOM_K))
    probe_pos = " UNION ALL ".join(
        f"SELECT row_id, o_custkey, o_orderpriority, "
        f"{pos_sql(i, 'o_custkey')} AS pos FROM o"
        for i in range(BLOOM_K))
    return f"""
WITH elig AS (
  SELECT c_custkey AS k FROM customer
  WHERE c_acctbal > {BLOOM_BALANCE_MIN}
), msize AS (
  SELECT greatest(count(*) * {BLOOM_BITS_PER_KEY},
                  {BLOOM_WORD})::BIGINT AS mbits
  FROM elig
), bpos AS ({build_pos}),
words AS (
  SELECT (pos // {BLOOM_WORD})::INT AS word,
         bit_or(1::BIGINT << (pos % {BLOOM_WORD})::INT)::BIGINT AS bm
  FROM bpos GROUP BY 1
), sig AS (
  SELECT md5(coalesce(string_agg(concat(word, ':', bm),
                                 '|' ORDER BY word), '')) AS bitmap_md5
  FROM words
), o AS (
  SELECT row_number() OVER (ORDER BY o_orderkey) AS row_id,
         o_custkey, o_orderpriority
  FROM orders
), ppos AS ({probe_pos}),
hit AS (
  SELECT row_id, o_custkey, o_orderpriority,
         min(CASE WHEN w.bm IS NOT NULL
                   AND (w.bm & (1::BIGINT << (pos % {BLOOM_WORD})::INT))
                       <> 0
             THEN 1 ELSE 0 END) AS passes
  FROM ppos LEFT JOIN words w ON w.word = (pos // {BLOOM_WORD})::INT
  GROUP BY row_id, o_custkey, o_orderpriority
), per_order AS (
  SELECT o_orderpriority, passes,
         CASE WHEN o_custkey IN (SELECT k FROM elig) THEN 1 ELSE 0 END
           AS is_member
  FROM hit
), stats AS (
  SELECT o_orderpriority,
         count(*)::BIGINT AS n_orders,
         sum(passes)::BIGINT AS n_pass,
         sum(is_member)::BIGINT AS n_true_member,
         sum(CASE WHEN passes = 1 AND is_member = 0 THEN 1
             ELSE 0 END)::BIGINT AS n_false_pos
  FROM per_order GROUP BY o_orderpriority
)
SELECT o_orderpriority, n_orders, n_pass, n_true_member, n_false_pos,
       {r6("n_false_pos::DOUBLE / (CASE WHEN n_orders - n_true_member > 0 THEN n_orders - n_true_member ELSE 1 END)::DOUBLE")}
         AS false_pos_rate,
       {r6("n_pass::DOUBLE / n_orders::DOUBLE")} AS pass_rate,
       (SELECT bitmap_md5 FROM sig) AS bitmap_md5
FROM stats ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# KMV (K-minimum-values) distinct sketch with SET OPERATIONS — the third
# member of the monitoring family. HLL answers "how many distinct"; KMV
# additionally answers "how much do two sets OVERLAP" (union / Jaccard /
# intersection estimates) from two mergeable k-row summaries
# (Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-value synopses").
# ---------------------------------------------------------------------------

KMV_K = 128                     # sketch size: k smallest hashes per set
_POW60_I = 1 << 60              # 15 md5 hex nibbles -> [0, 2^60)
_POW60 = 1152921504606846976.0  # exact double literal of 2^60

# The dedup family's shingle fingerprint primitives — SAME hash, so a
# KMV overlap estimate is directly comparable to the exact
# source_dup_matrix / split_leakage numbers built on these fingerprints.
from vectordb_explorations_spark.operators.dedup import (  # noqa: E402
    _SHINGLE_HASH as _KMV_SHINGLE_HASH,
    _SHINGLE_HASH_DUCK as _KMV_SHINGLE_HASH_DUCK,
    _SHINGLES_DUCK as _KMV_SHINGLES_DUCK)


def _kmv_est(n_col, kth_col):
    """Distinct estimate from a (possibly under-full) KMV sketch:
    (k-1) * 2^60 / h_(k) when the sketch holds k values, else the exact
    member count (an under-full sketch IS the whole set). (k-1)*2^60 is
    a 7-bit mantissa times a power of two — exactly representable, so
    the single IEEE division is parse-identical cross-engine."""
    full = F.lit(float(KMV_K - 1)) * F.lit(_POW60) \
        / kth_col.cast("double")
    return F.when(n_col < KMV_K, n_col.cast("double")).otherwise(full)


def _kmv_est_sql(n: str, kth: str) -> str:
    return (f"CASE WHEN {n} < {KMV_K} THEN CAST({n} AS DOUBLE) "
            f"ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({_POW60} AS DOUBLE)"
            f" / CAST({kth} AS DOUBLE) END")


def kmv_source_overlap(docs: DataFrame) -> DataFrame:
    """Declared query (r14 continuation): cross-source content overlap
    from KMV sketches — the SKETCH-SCALE answer to the question
    ``source_dup_matrix`` answers exactly. Each source's distinct
    hashed-3-shingle set (the dedup family's 60-bit md5 fingerprint,
    operators/dedup.py) is summarized by its KMV_K smallest hash
    values; for every unordered source pair the query emits the merged
    sketch's content pin (kth minima as exact bigints + the md5 of the
    full merged k-set), the shared-member count, and the derived
    union / Jaccard / intersection estimates, alongside the EXACT
    Jaccard so the driver hash-checks both the sketch content and its
    error. Estimator: distinct ~ (k-1)*2^60/h_(k); for pair (A, B) with
    merged k-set L, J(A,B) ~ |L ∩ A ∩ B| / |L| (Beyer et al. 2007).

    Scale shape (100 TB): the sketch build is ONE scan — distinct
    (source, h) then a per-source bounded top-k (the k-smallest rank
    prunes to |sources| x k rows; partial sort per partition, never a
    global sort); the pair stage joins k-row sketches, so it is
    |sources|^2 x k on BOUNDED summaries regardless of corpus size —
    exactly why a data team monitors cross-crawl overlap with KMV
    instead of the quadratic exact join. The true_jaccard audit
    columns are the fixture-scale grading half (the hll_user_
    cardinality discipline); a production run at 100 TB would emit
    only the estimate columns. Cites hnsw.cc: none — north-star
    extension."""
    from pyspark.sql import Window

    # posexplode + lead shingle stream (the _exploded_shingles shape —
    # measured ~4x faster than the array-lambda form, dedup.py) carrying
    # the source column so no doc_id join is needed downstream
    words = docs.select(
        "doc_id", "source",
        F.posexplode(F.split("text", " ")).alias("pos", "w"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    tri = words.select(
        "source",
        F.concat_ws(" ", F.col("w"), F.lead("w", 1).over(wdoc),
                    F.lead("w", 2).over(wdoc)).alias("s"),
        F.lead("w", 2).over(wdoc).alias("_w2"))
    # localCheckpoint both shared frames: `sh` feeds the sketch window,
    # the exact-truth distinct counts AND both sides of the exact
    # intersection self-join; `sk` feeds per_src and both pair
    # expansions. Spark 4.1.2 re-executes identical child subtrees, so
    # without materialization the tokenize+explode+md5+distinct corpus
    # pass ran once PER CONSUMER (the maxsim/minhash serve lesson). `sk`
    # is bounded (|sources| x KMV_K rows); `sh` is the query's inherent
    # working set — the exact-truth audit half needs the full distinct
    # fingerprint set twice regardless (a production run at 100 TB
    # emits only the estimate columns and would checkpoint only `sk`).
    # A/B at sf0.1: 4.22 -> 3.38 s median-of-4, results bit-identical.
    sh = (tri.where(F.col("_w2").isNotNull())
          .select("source", F.expr(_KMV_SHINGLE_HASH).alias("h"))
          .distinct().localCheckpoint())
    win = Window.partitionBy("source").orderBy("h")
    sk = (sh.withColumn("rn", F.row_number().over(win))
          .where(F.col("rn") <= KMV_K)
          .select("source", "h").localCheckpoint())
    per_src = (sk.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_sk"),
                    F.max("h").alias("kth")))
    srcs = per_src.select("source")
    pairs = (srcs.select(F.col("source").alias("source_a"))
             .join(srcs.select(F.col("source").alias("source_b")),
                   F.col("source_a") < F.col("source_b")))
    rows_a = (pairs.join(sk.withColumnRenamed("source", "source_a"),
                         "source_a")
              .select("source_a", "source_b", "h",
                      F.lit(True).alias("fa"), F.lit(False).alias("fb")))
    rows_b = (pairs.join(sk.withColumnRenamed("source", "source_b"),
                         "source_b")
              .select("source_a", "source_b", "h",
                      F.lit(False).alias("fa"), F.lit(True).alias("fb")))
    merged = (rows_a.unionByName(rows_b)
              .groupBy("source_a", "source_b", "h")
              .agg(F.max("fa").alias("in_a"), F.max("fb").alias("in_b")))
    wp = Window.partitionBy("source_a", "source_b").orderBy("h")
    topm = (merged.withColumn("rn", F.row_number().over(wp))
            .where(F.col("rn") <= KMV_K))
    per_pair = (topm.groupBy("source_a", "source_b")
                .agg(F.count(F.lit(1)).alias("n_union_sk"),
                     F.max("h").alias("kth_union"),
                     F.sum((F.col("in_a") & F.col("in_b")).cast("int"))
                     .alias("n_shared"),
                     F.md5(F.concat_ws(
                         "|", F.transform(
                             F.array_sort(F.collect_list("h")),
                             lambda x: x.cast("string")))
                         .cast("binary")).alias("union_sketch_md5")))
    # exact-truth audit half (fixture-scale grading; see docstring).
    # Examined r15, kept as the self-join deliberately: a groupBy(h) +
    # sort_array(collect_set(source)) + ordered-pair explode computes
    # the identical counts with ONE corpus-rows exchange instead of
    # the join's two, but the drift-free same-session A/B at sf0.1
    # measured it 1.6x SLOWER (0.88 vs 0.55 s median-of-5, identical
    # results) — ObjectHashAggregate's per-row set building costs more
    # than the codegen'd join saves. The join reads the checkpoint
    # twice, so no extra corpus scan rides either shape.
    nd = sh.groupBy("source").agg(F.count(F.lit(1)).alias("nd"))
    inter = (sh.select(F.col("source").alias("source_a"), "h")
             .join(sh.select(F.col("source").alias("source_b"), "h"),
                   "h")
             .where(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    truth = (pairs
             .join(nd.withColumnRenamed("source", "source_a")
                   .withColumnRenamed("nd", "nd_a"), "source_a")
             .join(nd.withColumnRenamed("source", "source_b")
                   .withColumnRenamed("nd", "nd_b"), "source_b")
             .join(inter, ["source_a", "source_b"], "left")
             .select("source_a", "source_b", "nd_a", "nd_b",
                     F.coalesce("n_inter", F.lit(0)).alias("n_inter")))
    sa = per_src.select(F.col("source").alias("source_a"),
                        F.col("n_sk").alias("n_sk_a"),
                        F.col("kth").alias("kth_a"))
    sb = per_src.select(F.col("source").alias("source_b"),
                        F.col("n_sk").alias("n_sk_b"),
                        F.col("kth").alias("kth_b"))
    union_est = _kmv_est(F.col("n_union_sk"), F.col("kth_union"))
    jac_est = (F.col("n_shared").cast("double")
               / F.col("n_union_sk").cast("double"))
    true_jac = (F.col("n_inter").cast("double")
                / (F.col("nd_a") + F.col("nd_b") - F.col("n_inter"))
                .cast("double"))
    return (per_pair
            .join(sa, "source_a").join(sb, "source_b")
            .join(truth, ["source_a", "source_b"])
            .select("source_a", "source_b",
                    "kth_a", "kth_b", "kth_union", "n_shared",
                    "union_sketch_md5",
                    round6(_kmv_est(F.col("n_sk_a"), F.col("kth_a")))
                    .alias("distinct_est_a"),
                    round6(_kmv_est(F.col("n_sk_b"), F.col("kth_b")))
                    .alias("distinct_est_b"),
                    round6(union_est).alias("union_est"),
                    round6(jac_est).alias("jaccard_est"),
                    round6(jac_est * union_est)
                    .alias("intersection_est"),
                    round6(true_jac).alias("true_jaccard"),
                    round6(jac_est - true_jac).alias("jaccard_err"))
            .orderBy("source_a", "source_b"))


def kmv_source_overlap_oracle() -> str:
    est_a = _kmv_est_sql("n_sk_a", "kth_a")
    est_b = _kmv_est_sql("n_sk_b", "kth_b")
    est_u = _kmv_est_sql("n_union_sk", "kth_union")
    jac = "CAST(n_shared AS DOUBLE) / CAST(n_union_sk AS DOUBLE)"
    tjac = ("CAST(n_inter AS DOUBLE) "
            "/ CAST(nd_a + nd_b - n_inter AS DOUBLE)")
    return f"""
WITH raw AS (
  SELECT source, unnest({_KMV_SHINGLES_DUCK}) AS s FROM documents
), sh AS (
  SELECT DISTINCT source,
         {_KMV_SHINGLE_HASH_DUCK} AS h
  FROM raw
), sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM sh) WHERE rn <= {KMV_K}
), per_src AS (
  SELECT source, count(*) AS n_sk, max(h) AS kth FROM sk GROUP BY source
), pairs AS (
  SELECT x.source AS source_a, y.source AS source_b
  FROM per_src x JOIN per_src y ON x.source < y.source
), mrows AS (
  SELECT p.source_a, p.source_b, k.h, TRUE AS fa, FALSE AS fb
  FROM pairs p JOIN sk k ON k.source = p.source_a
  UNION ALL
  SELECT p.source_a, p.source_b, k.h, FALSE AS fa, TRUE AS fb
  FROM pairs p JOIN sk k ON k.source = p.source_b
), merged AS (
  SELECT source_a, source_b, h,
         bool_or(fa) AS in_a, bool_or(fb) AS in_b
  FROM mrows GROUP BY source_a, source_b, h
), topm AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY source_a, source_b ORDER BY h) AS rn
    FROM merged) WHERE rn <= {KMV_K}
), per_pair AS (
  SELECT source_a, source_b,
         count(*) AS n_union_sk, max(h) AS kth_union,
         sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)::BIGINT
           AS n_shared,
         md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY h))
           AS union_sketch_md5
  FROM topm GROUP BY source_a, source_b
), nd AS (
  SELECT source, count(*) AS nd FROM sh GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS n_inter
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
), j AS (
  SELECT pp.*, sa.n_sk AS n_sk_a, sa.kth AS kth_a,
         sb.n_sk AS n_sk_b, sb.kth AS kth_b,
         na.nd AS nd_a, nb.nd AS nd_b,
         coalesce(i.n_inter, 0) AS n_inter
  FROM per_pair pp
  JOIN per_src sa ON sa.source = pp.source_a
  JOIN per_src sb ON sb.source = pp.source_b
  JOIN nd na ON na.source = pp.source_a
  JOIN nd nb ON nb.source = pp.source_b
  LEFT JOIN inter i ON i.source_a = pp.source_a
                   AND i.source_b = pp.source_b
)
SELECT source_a, source_b, kth_a, kth_b, kth_union, n_shared,
       union_sketch_md5,
       {r6(est_a)} AS distinct_est_a,
       {r6(est_b)} AS distinct_est_b,
       {r6(est_u)} AS union_est,
       {r6(jac)} AS jaccard_est,
       {r6(f"({jac}) * ({est_u})")} AS intersection_est,
       {r6(tjac)} AS true_jaccard,
       {r6(f"({jac}) - ({tjac})")} AS jaccard_err
FROM j ORDER BY source_a, source_b
"""
