#!/usr/bin/env python3
"""Regenerate PLANS.md: physical-plan evidence for the flagship queries.

For each selected query this extracts the load-bearing plan facts —
exchange (shuffle) count, join strategies, pushed filters, read schemas,
whole-stage-codegen coverage, top-k operator — so plan quality is
reviewable without re-running Spark. Run from the repo root:

    python tools/gen_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

COMMENTARY = {
    "knn_exact": (
        "Single-query exact k-NN (`FindNearest`, hnsw.cc:276-285). The whole "
        "query is scan → distance projection → `TakeOrderedAndProject`: zero "
        "shuffles, top-k never materializes the full sorted set."),
    "knn_batch": (
        "Batch k-NN join: the 20-query side broadcasts (BroadcastNestedLoop "
        "for the deliberate cartesian), distances compute in codegen, and "
        "the data shuffles once for the per-query window rank (the second "
        "exchange is the declared output ORDER BY)."),
    "pricing_summary": (
        "TPC-H Q1 shape: the date filter pushes into the parquet scan, the "
        "scan reads only the needed columns, and aggregation is partial "
        "(map-side) before one keyed exchange (plus the output sort)."),
    "region_revenue": (
        "Star join: region/nation/customer broadcast (no shuffle on the "
        "fact); orders⋈lineitem is the one real join, handled by AQE."),
    "asof_join": (
        "As-of join via union + carry-forward window: one keyed shuffle on "
        "user_id (plus the output sort) replaces a per-row correlated "
        "subquery; no join node at all in the physical plan."),
    "cube_order_stats": (
        "CUBE compiles to a single Expand (4 grouping sets in one pass) "
        "feeding partial+final hash aggregation — not a union of 4 scans."),
    "salted_event_type_stats": (
        "Salted two-phase aggregation: the hot event_type keys spread over "
        "(key, salt) reducers first; the second exchange moves only "
        "keys×salts rows."),
    "knn_search_after": (
        "Cursor-paginated exact search. The round-9 shape: the cursor "
        "predicate is a lexicographic STRUCT comparison (dist, id) > "
        "(cd, cid), binding the unrolled 64-term distance tree ONCE in "
        "the pushed filter — the previous two-reference OR predicate "
        "blew janino's 64 KB method limit after CollapseProject "
        "substitution and silently ran the stage interpreted. One scan + "
        "TakeOrderedAndProject; page depth never changes the cost."),
    "doc_char_entropy": (
        "Character-entropy quality score: explode feeds a (doc, char) "
        "map-side-combinable count agg, then one per-doc reduction via "
        "H = ln(T) - sum(cnt ln cnt)/T — two grouped aggregations, no "
        "join, no window, no Python."),
    "source_dup_matrix": (
        "Cross-source near-dup matrix over the engine's own "
        "minhash_lsh_pairs: the bounded verified-pair side broadcasts "
        "into two narrow (doc_id, source) probes; the matrix agg is at "
        "most |sources|^2 rows."),
    "late_supplier_blame": (
        "TPC-H Q21-shaped correlated-exists pair: EXISTS (another supplier "
        "in the order) is a left-semi self-join and NOT EXISTS (another "
        "flagged supplier) a left-anti self-join, both keyed on l_orderkey "
        "so one exchange serves both probes at scale; supplier/nation "
        "broadcast onto the bounded per-supplier agg; "
        "TakeOrderedAndProject caps the output."),
    "dedup_soft_weights": (
        "Soft dedup: inverse-cluster-size weights over the label-"
        "propagation clusters plus a deterministic md5-uniform kept draw — "
        "one count agg on the cluster root, one root-keyed size join, and "
        "a pure projection on top of the converged labels."),
    "streaming_ivfpq_refresh": (
        "Streamed compressed-layout audit: foreachBatch drains micro-"
        "batches through the frozen-codebook IVF-PQ append, then the "
        "declared plan is one combinable agg over the hive layout — the "
        "streaming work happens in the drained query, not this plan."),
    "sql_knn": (
        "The SQL-text twin of knn_exact through the registered `l2_dist` "
        "SQL function — inlines to a native expression tree with the same "
        "TakeOrderedAndProject shape (no Python; the DataFrame twin "
        "additionally unrolls the fixed-dim sum into codegen)."),
    "supplier_nation_volume": (
        "Aggregate-before-join star: lineitem reduces to (suppkey, partial "
        "sum) before any dim join, so the broadcast joins see aggregated "
        "rows, never raw line items."),
    "top_parts_by_revenue": (
        "Aggregate → broadcast dim join → global top-k: the limit plans as "
        "TakeOrderedAndProject over already-aggregated rows."),
    "dedup_minhash_lsh": (
        "MinHash+LSH banding: one md5 per shingle + integer mixing; the "
        "banding self-join is a shuffled hash join on (band_idx, band_key) "
        "— hinted so the banded corpus never broadcasts; Spark 4.1.2 runs "
        "the signature subtree once per join side (measured: no exchange "
        "reuse — persist the banded frame to pay it once); the exact "
        "Jaccard verify melts "
        "candidate pairs to (pair, side, doc) so ONE shingle scan serves "
        "both sides."),
    "dedup_exact_substring": (
        "Exact-substring (span-level) dedup, Lee et al. 2021: ONE corpus "
        "scan explodes (doc_id, pos, md5-of-w-tokens) — the 32-char "
        "fingerprint is all that shuffles, never the window text; the "
        "duplicated-fp facts (distinct-doc count, boilerplate cap) ride "
        "window functions over one fp-partitioned sort; the pair self-join "
        "is bucketed BY the fingerprint (each group is one duplicated "
        "span's occurrence set — no all-pairs stage, occupancy capped)."),
    "substring_dup_coverage": (
        "Per-doc duplicated-span coverage over the same one-scan "
        "duplicated-windows frame, then a gaps-and-islands window pass "
        "(running max-end per doc) unions overlapping spans WITHOUT a "
        "w-way position explode; short docs rejoin with zero coverage via "
        "one left join."),
    "strip_duplicated_spans": (
        "Span-dedup remediation: the smallest doc_id keeps each duplicated "
        "span, other docs strip the covered tokens. The interval list rides "
        "a per-doc struct array and the strip is a higher-order filter "
        "(JVM-side, no Python, no token-level explode); the cleaned text "
        "is audited by md5 — a pure function of the corpus."),
    "maxsim_chunk_topk": (
        "Multi-vector (late-interaction) MaxSim retrieval: one corpus "
        "scan explodes chunks->tokens into exact-INTEGER signed-hash "
        "chunk weights (one combinable (doc, chunk, dim) sum); the "
        "literal query-term weights BROADCAST onto the shared-dim rows, "
        "so the dot-product join is shuffle-free on the corpus side; the "
        "per-(query, term) candidate window carries a WindowGroupLimit "
        "(top-C pushed map-side), bounding the post-score exchange at "
        "O(queries x terms x C); MaxSim re-scores only candidate docs "
        "with an explicit left-to-right per-term fold."),
    "streaming_span_admission": (
        "Streaming span-dedup admission (foreachBatch): the declared "
        "frame aggregates the persisted hit table — the admission work "
        "itself runs per micro-batch as NEW x OLD fingerprint joins "
        "against the persisted state table (never a corpus self-join), "
        "with per-source-file idempotence markers."),
    "dsir_select": (
        "DSIR importance resampling (Xie et al. 2023): two corpus passes "
        "— the paper's own fit/score structure. The fit pass rolls "
        "hashed-ngram counts up to n_buckets groups map-side and takes "
        "corpus totals as a whole-frame window over those 64 rows (a "
        "separate totals agg re-read the corpus a third time — plan-"
        "audited out); the scoring pass broadcasts the 64-row log-ratio "
        "table onto its pushed-filter scan and ends in Gumbel-top-k via "
        "TakeOrderedAndProject. No vocabulary build, no corpus "
        "self-join, no driver pass."),
    "cluster_balanced_sample": (
        "Density-equalizing embedding sample: the seed exemplars broadcast "
        "(num_clusters rows), nearest-seed assignment is a codegen "
        "projection + per-vec window, and the per-cluster quota rank is "
        "one keyed exchange on cluster_id — output bounded at clusters x "
        "quota rows; nothing quadratic anywhere."),
    "split_leakage": (
        "Train/eval near-dup leakage audit: the verified-pair side "
        "(banded candidates only, never all-pairs) is BOUNDED and "
        "broadcasts into two narrow (doc_id, split) probes — the "
        "source_dup_matrix shape keyed on the deterministic md5 split; "
        "output is the leaking pairs themselves."),
    "mixture_plan": (
        "Training-mix token budgeting: one map-side-combinable "
        "aggregation keyed on source, then a FULL OUTER join against "
        "the literal |mix|-row weight table (full-outer precisely so a "
        "budgeted source with zero corpus presence still reports — the "
        "condition the query exists to catch; it plans as an SMJ of two "
        "already-tiny frames, |sources| vs |mix| rows, so the exchange "
        "is negligible at any corpus size). No second corpus scan."),
    "source_kl_divergence": (
        "Per-source distribution drift: one corpus scan into a "
        "(source, bucket) combinable count; the cell frame densifies "
        "from the AGGREGATED counts (sources x 64 rows), so the "
        "windows deriving per-source/per-bucket/corpus totals never "
        "touch corpus-sized data. Output |sources| rows."),
    "vocab_stats": (
        "Vocabulary heavy-hitters: explode → groupBy(token) aggregates "
        "partially map-side (zipfian head tokens never concentrate raw rows "
        "on one reducer), the corpus count joins in as a broadcast scalar, "
        "and only the top-N rows survive TakeOrderedAndProject."),
    "train_val_split_stats": (
        "Deterministic md5-threshold split audit — pure projection + one "
        "grouped aggregation; no RNG, no shuffle beyond the group-by."),
    "shipping_priority": (
        "TPC-H Q3 shape: the segment filter and both date predicates push "
        "into the parquet scans, customer prunes before its join, revenue "
        "aggregates partially map-side on the order key, and the top-10 "
        "plans as TakeOrderedAndProject — the aggregate never fully sorts."),
    "doc_repetition_stats": (
        "Gopher-style repetition filter: every metric is a per-row array "
        "expression over one tokenize — no explode, zero data-dependent "
        "shuffles (the only exchange is the declared output order)."),
    "gopher_quality_signals": (
        "Gopher A1.1 document-shape rules: pure per-row higher-order "
        "expressions over one tokenize — no explode, zero data-dependent "
        "shuffles. Gram arrays, per-distinct counts and the max count are "
        "STAGED through projected columns (composed Column trees re-inline "
        "sub-expressions on every reference; the naive composed argmin "
        "re-ran the O(distinct x positions) count per candidate — "
        "measured minutes vs sub-second staged)."),
    "perplexity_buckets": (
        "CCNet perplexity thirds: unigram_logprob's two combinable aggs + "
        "zipf-bounded vocabulary join, then ONE lang-partitioned sort for "
        "the deterministic ntile (ordered by rounded score + doc_id, never "
        "float-summation order) and a combinable rollup to n_langs x 3 "
        "rows."),
    "temperature_mixture": (
        "Temperature-scaled mixture: ONE map-side-combinable aggregation "
        "keyed on source; both normalizations (token total, sum of "
        "p^alpha) ride whole-frame windows over the |sources|-row result "
        "— no second corpus scan (the dsir_select fit discipline)."),
    "embedding_outliers": (
        "Distance-to-centroid outlier audit: centroids are one posexplode "
        "+ combinable grouped avg (|labels| x dim rows), re-assembled and "
        "BROADCAST back; the distance is a per-row zip_with fold; moments "
        "and top-k ride one label-partitioned window sort. Ranking is by "
        "rounded distance (z is monotone within a label), so rank never "
        "depends on float summation order."),
    "ngram_novelty": (
        "Per-doc novel-text share: one corpus scan emits compact (doc_id, "
        "pos, md5) window rows (the span-family tokenize hoist); the "
        "keeper rides min() over one fp-partitioned window (no groupBy-"
        "then-join-back double scan); the rollup is a combinable count on "
        "doc_id. Nothing quadratic — boilerplate-hot fingerprints cost "
        "their row count, not their pair count."),
    "retrieval_quality": (
        "IR evaluation harness: the bounded query side broadcasts, the "
        "corpus streams through one query-keyed window rank "
        "(WindowGroupLimit pushes the top-k map-side), metrics are one "
        "combinable agg per query, and the |labels|-row corpus totals "
        "broadcast back for the nDCG ideal. Nothing collects; the "
        "expensive stage is the same scored scan knn_batch already "
        "bounds."),
    "source_data_cards": (
        "Per-source data card composition: the gopher verdict frame is "
        "shuffle-free per-row work, novelty adds the span family's one "
        "fingerprint exchange, both join back on the stable doc_id, and "
        "ONE combinable source-keyed aggregation ends the pipeline — the "
        "count-distinct of sha256(text) is the only extra exchange and "
        "carries 32-byte hashes, not documents."),
    "dedup_perceptual_image": (
        "Perceptual image near-dup: payloads synthesize in codegen "
        "(encode/concat/substring), the REAL decode -> re-encode -> "
        "decode -> aHash/dHash kernels run in two narrow Arrow stages "
        "(payload bytes never shuffle), and everything after is compact "
        "JVM work — the banding self-join shuffles only (asset_id, "
        "band_idx, band_val) integers with the bucket-occupancy window "
        "capping hot buckets, and the Hamming verify joins candidate "
        "pairs back to the 5-column hash frame (AQE broadcasts it when "
        "small). Never all-pairs; the minhash-LSH shape over 16-bit "
        "integer band keys."),
    "dedup_perceptual_audio": (
        "Perceptual audio near-dup: same shape as the image path with "
        "the 8->16-bit PCM re-encode and the 32-bit energy-contour hash "
        "(one packed word, 2 bands)."),
    "bpe_token_counts": (
        "Tokenizer-faithful budgets: one corpus scan — explode to "
        "words, sixteen literal codegen replaces apply the fixed merges "
        "table per word, ONE combinable groupBy(source) count/sum, and "
        "the per-source doc counts broadcast back. No Python, no second "
        "pass; at 100 TB the cost is the scan plus a |sources|-row "
        "exchange."),
    "knn_ip": (
        "Exact inner-product top-k (declared r14): one scan, the "
        "64-term dot product in whole-stage codegen, "
        "TakeOrderedAndProject — the knn_exact shape on the third "
        "metric. Approximate IP serving is the mips_augment reduction, "
        "not an index change."),
    "bpe_learn_merges": (
        "BPE merge learning (declared r14): the corpus scans ONCE into "
        "the distinct-word frequency dictionary, then each of 8 ranks "
        "is a pair explode + combinable agg + 1-row argmax + literal "
        "replace over |vocab| rows, localCheckpointed so rank r never "
        "re-executes ranks 1..r-1 (plan would otherwise grow "
        "exponentially — Spark reuses no identical subtrees)."),
    "bpe_fertility_by_lang": (
        "Tokenizer fertility per language (staged r15): the learned-"
        "budget composition grouped by lang with a UTF-8 byte column — "
        "trainer ranks vocabulary-bound, then ONE corpus scan with a "
        "combinable groupBy(lang) agg and broadcast doc counts."),
    "dedup_cross_codec_image": (
        "Cross-codec perceptual triplets (staged r15): one raster as "
        "P6, BMP, and native-PNG payloads — byte-different, one dHash "
        "— through the banded pipeline; the oracle rides lossless-"
        "re-encode invariance (no codec in DuckDB)."),
    "dedup_cross_codec_audio": (
        "Audio cross-codec triplets (staged r15): WAV8, WAV16, and "
        "native-FLAC payloads of one sample stream share the energy-"
        "contour hash; same banded shape as the image twin."),
    "hll_user_cardinality": (
        "HyperLogLog from first principles on the md5 cross-engine "
        "hash (declared r14): combinable per-register max collapses the "
        "shuffle to groups x 16 rows; harmonic sums stay EXACT "
        "bigints, ranks derive from hex strings (never libm log2), "
        "so the driver hash-checks the sketch content."),
    "cms_heavy_hitters": (
        "Count-Min heavy hitters (declared r14): depth x width counter "
        "sketch via one map-side-combined groupBy (256 cells), "
        "broadcast back to the top-20 true keys; overcount >= 0 is a "
        "live invariant on the output."),
    "bloom_join_prune": (
        "Bloom-filter semi-join pruning (declared r14): the filter is "
        "sized FROM THE DATA (16 bits/eligible key, broadcast scalar, "
        "no driver collect) so the ~0.14% FPR survives any SF where "
        "fixed-m saturates; bitmap_md5 pins the packed words; "
        "n_pass == n_true + n_false_pos rides as an invariant."),
    "streaming_hll_monitor": (
        "HLL on a STREAM (declared r14): update-mode register maxima — "
        "max is commutative+idempotent, i.e. register-wise max IS "
        "sketch union — drained and finalized to the batch query's "
        "exact harmonic sums; state bounded at groups x 16 rows at "
        "any stream volume, no watermark needed."),
    "kmv_source_overlap": (
        "KMV set-operation sketch (declared r14): distinct (source, "
        "shingle-hash) pass, per-source bounded top-k (rank <= 128 "
        "prunes to |sources| x k rows), then the pair stage joins "
        "k-row sketches — |sources|^2 work on BOUNDED summaries at "
        "any corpus size. The merged k-set's kth minima + md5 pin the "
        "sketch content; the exact-truth columns are the fixture-"
        "grading half (production emits estimates only)."),
    "streaming_cms_monitor": (
        "Count-Min on a STREAM (declared r14): update-mode counter "
        "cells (count is commutative+associative), finalized per-cell "
        "across drained updates and probed by the batch top-20 — "
        "output equals cms_heavy_hitters exactly, oracle shared. "
        "State bounded at 256 cells at any stream volume."),
    "streaming_kmv_monitor": (
        "KMV on a STREAM (declared r14): the per-source k-smallest "
        "distinct hash set as CUSTOM applyInPandasWithState state — "
        "k-smallest-of-union is the commutative+idempotent KMV merge, "
        "so micro-batches and replays converge; state bounded at "
        "KMV_K longs x |sources|; max-version finalize equals the "
        "batch construction bit-for-bit (sketch md5 hash-checked)."),
    "gif_frame_sample": (
        "REAL animation frame sampling (declared r14): per-doc "
        "animated GIF synthesized in one Arrow kernel, decoded "
        "through the full GIF grammar (LZW, palette, GCE delays, "
        "compositing), every-2nd frame emitted with content hash — "
        "the oracle rides the codec round-trip invariance (composited "
        "frame bytes == text slice). One narrow projection, one "
        "mapInPandas, no shuffle before the presentation sort."),
    "bpe_learned_budget": (
        "The tokenizer loop closed (declared r14): the trainer's 8 "
        "bounded vocabulary iterations, then the LEARNED table rides a "
        "n_merges-row driver collect into the same one-scan codegen "
        "replace chain bpe_token_counts runs — learn, apply, budget in "
        "one hash-checked composition. At 100 TB: trainer cost is "
        "vocab-bound (probe ladder flat to 10M docs), apply is one "
        "corpus scan + a combinable per-source agg."),
    "perceptual_hash_table": (
        "Per-doc fingerprint table: the image and audio Arrow hash "
        "stages run once each over codegen-synthesized payloads, then "
        "join on doc_id — six ints per row through the join, payload "
        "bytes never shuffle. The direct hash-check surface for the "
        "kernels the pair queries compose."),
    "perceptual_incremental": (
        "Incremental perceptual admission: ONE shared banded frame over "
        "the per-doc dHash words with the batch split attached as a "
        "broadcast single-row aggregate (no driver-side action at "
        "plan-construction time) and the side split as a JOIN PREDICATE "
        "— new x old only, never old x old; occupancy cap before the "
        "join, Hamming verify on two id-keyed joins to the compact hash "
        "frame, best match by (hamming, old_id) window."),
    "bpe_sequence_pack": (
        "Sequence packing with tokenizer-faithful lengths: the BPE merge "
        "table applies as ONE per-row HOF fold inside the length "
        "expression — no explode, no extra shuffle vs the plain packer; "
        "the greedy bin walk is a per-source window scan."),
    "hard_examples": (
        "Contrastive hard-example mining: the same broadcast-scored "
        "neighborhood scan, then two row_number windows over the "
        "k-bounded frame pick the nearest wrong-label and farthest "
        "same-label candidates per anchor — O(anchors x k) rows after "
        "the rank, left-joined back onto the anchor frame so missing "
        "kinds surface as NULLs rather than dropped anchors."),
    "contamination_check": (
        "Eval-set decontamination: the eval slice's distinct 8-grams "
        "broadcast; training-doc k-grams stream through a map-side hash "
        "join and a combinable count — the big side never shuffles raw "
        "grams to a join exchange."),
    "multimodal_resize": (
        "Real codec kernel inside one Arrow stage: P6 payloads built in "
        "codegen (encode/concat/substring), then decode + nearest-neighbor "
        "resize + sha in a single mapInPandas pass — payload bytes never "
        "shuffle; the only exchange is the declared output order."),
    "ann_bucketed_probe": (
        "Persisted-index pruned serving: the LSH index is saved "
        "hash-bucketed on `bucket`, and the probe's bucket-id IN filter "
        "prunes file buckets at the SCAN (`SelectedBucketsCount` below — "
        "the probe reads a constant fraction of the index, never scans "
        "it); probed candidates then re-score exactly with broadcast "
        "query vectors and rank per query."),
    "boilerplate_ngrams": (
        "Corpus boilerplate discovery: per-doc distinct k-grams bound each "
        "doc's contribution before the explode, document-frequency counts "
        "combine map-side, the corpus size arrives as one broadcast "
        "scalar, and only rows over the fraction threshold survive to the "
        "top-N."),
    "boilerplate_coverage": (
        "Per-lang boilerplate footprint: the bounded hot-gram set "
        "broadcasts into the coverage join (the corpus-side gram stream "
        "never shuffles); zero-hit docs re-enter via a narrow left join "
        "before the per-lang rollup."),
    "dedup_incremental": (
        "Incremental-ingest admission: the side split is a join predicate "
        "on one shared banded frame (Spark 4.1.2 still executes the "
        "signature subtree per join side — see the dedup_minhash_lsh note; "
        "at scale the old side is a persisted banded-keys table), the "
        "join matches new-side x old-side only (no corpus self-join "
        "exists in the plan), the melted verify scans shingle sets once, "
        "and the best-match pick is a window over verified candidates "
        "only."),
    "zorder_layout": (
        "Z-order layout audit: the 1-row extent aggregate broadcasts into "
        "the quantize projection (BroadcastNestedLoop on a single row), "
        "the Morton interleave is pure shift/mask codegen, and the "
        "per-bucket bounding boxes aggregate map-side — one keyed "
        "exchange on ~256 buckets ends the plan."),
    "training_shards": (
        "Deterministic global-shuffle manifest: shard assignment is a "
        "pure md5 projection (no exchange to assign), and the manifest is "
        "one combinable aggregation on n_shards groups — min_by/max_by "
        "ride the same combiner, so the corpus shuffles only n_shards "
        "narrow rows per partition."),
    "sq8_quantization": (
        "SQ8 per-dimension error audit: posexplode fans out (dim, value), "
        "then ONE hash exchange on dim_id serves both the extent window "
        "and the final aggregation (AQE reuses the partitioning); every "
        "expression — quantize, clip, reconstruct — is codegen, no "
        "Python anywhere."),
    "streaming_near_dedup": (
        "Streaming first-seen-per-band admission drained to a memory "
        "sink: the declared aggregate below scans the sink — the "
        "streaming micro-batch plan itself is the stateless banding "
        "projection + applyInPandasWithState keyed on (band_idx, "
        "band_key), state one long per occupied band."),
    "bq_hamming_topk": (
        "1-bit Hamming ranking over packed 32-bit words: encode "
        "(zip_with + shift-accumulate) and XOR+bit_count scoring are all "
        "codegen; the 10 probe codes broadcast; ONE hash exchange for the "
        "per-query window rank."),
    "hybrid_rrf_search": (
        "BM25 + cosine + RRF, explode-free on the lexical side: tf/dl "
        "are per-row array scans of a ONCE-projected token array, corpus "
        "stats are a 1-row aggregate broadcast back; both channels' "
        "scored rows union under ONE pool window whose (query_id, ch) "
        "exchange carries a Partial WindowGroupLimit (pool-sized shuffle "
        "traffic), a pool-sized repartition serves the fusion aggregate "
        "and final window, and the <=30-row output sorts in a single "
        "coalesced partition (no range-partitioning sampling job). The "
        "heavy scoring expressions parse from ONE SQL string shared with "
        "the DuckDB oracle — construction cost measured 4.5 s -> 0.5 s."),
    "knn_filtered": (
        "Faceted (pre-filtered) k-NN: the label facet is the KEY of the "
        "broadcast query join — non-matching vectors drop before the "
        "distance evaluates; the scored set is bounded by facet "
        "selectivity, then one window exchange ranks per query."),
    "range_search": (
        "Radius search: broadcast probes, codegen distance, a plain "
        "filter on the raw double — NO window and NO ordering exchange; "
        "the matches stream straight out (set semantics, the point of "
        "range search)."),
    "mmr_diversified_topk": (
        "MMR greedy re-rank: the corpus-scale work is the cosine pool "
        "channel (broadcast probes + one window); the sequential argmax "
        "runs in applyInPandas over the BOUNDED 25-row per-query pool — "
        "the only Python stage, and it touches pool-sized data only."),
    "hashed_doc_embeddings": (
        "Hashing-trick featurization: one token explode, one combinable "
        "(doc, dim) integer sum, one doc-local norm join — integer math "
        "until the final normalization, so the audit hash-matches with "
        "no float-summation-order hazard."),
    "data_quality_audit": (
        "Table validation gate: every per-column metric (count, nulls, "
        "exact distincts, typed extents) computes in ONE scan / one "
        "aggregate row, then a literal-sized unpivot — the plan must "
        "show a single parquet scan however many columns are audited."),
    "events_gapfill": (
        "Gap-filled resample: the dense grid synthesizes from one "
        "min/max aggregate (grid rows = span/step per series — tiny, "
        "broadcast into the left join); the events side is one "
        "combinable groupBy; LOCF is one window over grid-sized rows."),
    "funnel_conversion": (
        "Ordered funnel: each stage is a combinable per-user "
        "min-timestamp aggregate joined on user_id — candidate volume "
        "shrinks monotonically down the funnel, and no window ever runs "
        "over the raw event stream."),
    "cohort_retention": (
        "Retention triangle: per-user min-week aggregate joined to "
        "DISTINCT (user, week) activity — the activity side aggregates "
        "BEFORE the cohort join, so the join carries user-week rows, "
        "never raw events (the classic cohort self-join trap avoided)."),
    "event_transitions": (
        "Transition matrix: ONE per-user lag window (single hash "
        "exchange on user_id), then a combinable (from, to) count — "
        "no self-join, no per-user event-list materialization."),
    "random_projection": (
        "Seeded JL dimensionality reduction: k generated scalar "
        "expressions over one scan — pure whole-stage codegen, no Python "
        "stage, no data-dependent shuffle (the only exchange is the "
        "declared output order); the oracle bakes the identical seeded "
        "matrix as repr-float64 literals."),
    "tfidf_top_terms": (
        "Per-doc TF-IDF keywords: explode -> combinable (doc, term) tf "
        "counts; document frequency derives from the tf frame itself "
        "(count(*) per term — no second distinct pass); the zipf-bounded "
        "df side joins keyed on term and the per-doc window ranks only "
        "doc-vocabulary-sized groups."),
    "knn_classify": (
        "Majority-vote k-NN classification: broadcast queries + window "
        "rank with self dropped BEFORE ranking, then a combinable "
        "(query, label) vote count and a 1-row-per-query argmax window "
        "— vote traffic is O(queries x k), never corpus-sized."),
    "mutual_knn": (
        "Reciprocal nearest neighbors: ONE k-NN edge list (broadcast + "
        "window), self-joined on the reversed key — the join input is "
        "O(n x k) edges, the O(n^2) distance matrix never exists in the "
        "plan."),
    "ann_recall_report": (
        "Retrieval evaluation as a query: the bucketed-probe ANN result "
        "joins the exact ranking on (query_id, vec_id) — two "
        "O(queries x k) result sets; the heavy work stays in the "
        "underlying searches, the evaluation is k-row arithmetic, and "
        "BOTH sides being deterministic makes the eval itself "
        "hash-checked."),
    "bm25_topk": (
        "Lexical BM25 retrieval: tokenize-once codegen projection, "
        "1-row corpus-stats broadcast (avgdl/N), df from the per-doc "
        "distinct term frame, per-query score-and-rank in one window — "
        "the hybrid_rrf lexical channel standing alone."),
    "band_state_budget": (
        "Streaming-dedup state-store sizing as a batch query: the same "
        "MinHash band projection the stream uses, then one "
        "distinct-per-band aggregate — the row count IS the state rows "
        "a first-seen-per-band store would hold (validated against a "
        "real run's state metrics in SCALE_NOTES)."),
    "dedup_semantic": (
        "SemDeDup cluster-then-prune: the num_clusters seed exemplars "
        "broadcast into a nearest-seed window (C=8 distance trees stay "
        "in Catalyst — plan pinned Python-free), norms project once per "
        "side, and the duplicate-verdict pair join is bounded to "
        "intra-cluster candidates, never all pairs."),
}


def facts(df) -> list[str]:
    # rendered from the library's observability API so PLANS.md and
    # plans.explain.plan_summary can never diverge
    from vectordb_explorations_spark.plans.explain import plan_summary

    s = plan_summary(df)
    out = [f"- shuffle exchanges: **{s['shuffle_exchanges']}**, "
           f"broadcast exchanges: **{s['broadcast_exchanges']}**"]
    if s["join_strategies"]:
        out.append(f"- join strategies: {', '.join(s['join_strategies'])}")
    if s["take_ordered_topk"]:
        out.append("- top-k: `TakeOrderedAndProject` (no full sort)")
    if s["grouping_sets_expand"]:
        out.append("- grouping sets via single `Expand`")
    out.append(f"- whole-stage codegen spans: {s['codegen_spans']}; "
               f"Python in plan: "
               f"{'yes (Arrow-batched)' if s['python_stages'] else 'no'}")
    if s["bucket_pruning"]:
        sel = s["bucket_pruning"].split("/")
        out.append(f"- bucket pruning: `SelectedBucketsCount: {sel[0]} "
                   f"out of {sel[1]}`")
    if s["partition_filters"]:
        out.append(f"- partition pruning: "
                   f"`PartitionFilters: [{s['partition_filters'][0][:90]}]`")
    if s["pushed_filters"]:
        out.append(f"- pushed filters: "
                   f"`{'; '.join(s['pushed_filters'][:3])}`")
    if s["columns_read"]:
        out.append(f"- columns read: `{', '.join(s['columns_read'])}` (pruned)")
    return out


def main() -> None:
    import __spark_entry__ as E
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    lines = [
        "# PLANS — physical-plan evidence (generated by tools/gen_plans.py)",
        "",
        f"Plans captured at sf0.01 with AQE on; regenerate with "
        f"`python tools/gen_plans.py`. Beyond this sample, "
        f"tests/test_plans.py asserts EVERY declared query plans "
        f"Python-free (except the deliberate Arrow blockwise path), "
        f"top-k queries plan TakeOrderedAndProject, and key filters "
        f"reach the parquet scans.",
        "",
    ]
    from vectordb_explorations_spark.plans.inventory import STAGED_QUERIES
    for name, note in COMMENTARY.items():
        # staged-but-not-yet-declared queries get their plan evidence
        # early, so the round that declares them regenerates nothing
        df = (qs.get(name) or STAGED_QUERIES[name])(spark, SF)
        lines.append(f"## {name}")
        lines.append("")
        lines.append(note)
        lines.append("")
        lines.extend(facts(df))
        lines.append("")

    # --- persisted serving layouts (not declared queries: they write a
    # temp index first, so they live here, with the partition-pruning
    # evidence rendered from the same observability API) ---
    import tempfile

    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.ann import (
        ivf_build, ivf_persist_partitioned, ivf_probe_partitioned)
    from vectordb_explorations_spark.operators.hnsw import (
        hnsw_build, hnsw_persist_partitioned, hnsw_probe_partitioned)
    from vectordb_explorations_spark.operators.knn import (
        knn_filtered_partitioned, sample_queries)
    from vectordb_explorations_spark.sources import load_table

    emb = load_table(spark, "embeddings", SF)
    queries = sample_queries(emb, 5).cache()
    with tempfile.TemporaryDirectory() as d:
        assigned, cents = ivf_build(emb, num_centroids=8)
        ivf_persist_partitioned(assigned, f"{d}/ivf")
        serving = [
            ("ivf_probe_partitioned (serving layout)",
             "Hive-partitioned inverted lists: the probe union's list_id "
             "IN filter prunes unprobed list directories at the file "
             "listing; per-probe I/O is nprobe/num_centroids of the "
             "index regardless of corpus size.",
             ivf_probe_partitioned(spark, f"{d}/ivf", cents, queries, 5,
                                   nprobe=2)),
        ]
        idx = hnsw_build(emb, num_shards=4, shard_by="kmeans").cache()
        idx.count()
        hnsw_persist_partitioned(idx, f"{d}/hnsw")
        serving.append(
            ("hnsw_probe_partitioned (serving layout)",
             "Shard-partitioned HNSW graphs: routed cells become a "
             "literal shard IN filter — unrouted shards' blob files are "
             "never read (the file-level completion of 'unrouted shards "
             "are pruned at the scan'); results are bit-equal to the "
             "in-memory hnsw_search (tests/test_ann.py).",
             hnsw_probe_partitioned(spark, f"{d}/hnsw", queries, 5,
                                    probe_shards=2)))
        emb.write.partitionBy("label").parquet(f"{d}/facet")
        fq = (emb.orderBy("vec_id").limit(3)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("query_vec"), "label"))
        serving.append(
            ("knn_filtered_partitioned (serving layout)",
             "Facet-partitioned corpus: the query batch's distinct "
             "facets prune non-matching label directories before any "
             "byte is read; the broadcast facet-join then scopes each "
             "query to its own facet (tests/test_knn.py pins "
             "bit-equality with the in-memory facet join).",
             knn_filtered_partitioned(spark, f"{d}/facet", fq, 5, dim=64)))
        lines.append("## Persisted serving layouts (partition pruning)")
        lines.append("")
        for name, note, df in serving:
            df.collect()
            lines.append(f"### {name}")
            lines.append("")
            lines.append(note)
            lines.append("")
            lines.extend(facts(df))
            lines.append("")
        idx.unpersist()

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
