"""Plan audit: verify the physical plans are the ones a 100 TB run needs.

For each audited query, asserts the presence (or absence) of physical-plan
markers: parquet predicate pushdown (PushedFilters), broadcast joins for
small dims, TakeOrderedAndProject for top-k (never a global sort), no
single-partition WindowExec on data-sized inputs (the tiny prefix-sum
window in assign_offsets is allowed by design), and whole-stage codegen
(`*(n)` stage markers).

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any expectation fails.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from vsphere_event_streaming_spark.registry import load_all  # noqa: E402
from vsphere_event_streaming_spark.session import get_spark  # noqa: E402

#: query -> (must_contain, must_not_contain) regex lists over explain().
EXPECT: dict[str, tuple[list[str], list[str]]] = {
    # literal predicates reach the parquet scan
    "q_point_lookup": [[r"PushedFilters: \[.*EqualTo\(event_id"], []],
    "q_replay_from": [[r"PushedFilters: \[.*GreaterThanOrEqual\(event_id"], []],
    "q_retention": [[r"PushedFilters: \[.*GreaterThan\(event_id"], []],
    "q_time_window_filter": [[r"PushedFilters: \[.*GreaterThanOrEqual\(ts"], []],
    # top-k compiles to a heap merge, not a global sort
    "q_last_page": [[r"TakeOrderedAndProject"], [r"\+- Sort \[.*global=true"]],
    "q_knn_topk": [[r"TakeOrderedAndProject"], []],
    # small dims broadcast
    "q_join_broadcast": [[r"BroadcastHashJoin"], [r"SortMergeJoin"]],
    # pure range join, binned: the bin equi-join plans as a HASH join
    # (any equi flavor), with the explode present — never a nested
    # loop or cartesian, which is what a bare theta join would force
    "q_join_range_binned": [
        [r"Join", r"Generate"],
        [r"BroadcastNestedLoopJoin", r"CartesianProduct"],
    ],
    # projections stay inside whole-stage codegen (the `*(n)` marker)
    "q_envelope": [[r"\*\(\d+\) Project"], []],
    # aggregation is partial+final hash agg
    "q_group_agg": [[r"HashAggregate"], []],
    "q_range": [[r"HashAggregate"], []],
    # offset assignment: ONE range shuffle + in-partition sort; the
    # local rank comes from monotonically_increasing_id arithmetic, so
    # there must be no second data-sized exchange (hashpartitioning of
    # the full rows on __pid was the old 2x-cost shape) and no
    # row_number window over the data (the only window left is the
    # #partitions-row prefix sum on the broadcast side)
    "q_offset_assign": [
        [r"rangepartitioning\(ts", r"monotonically_increasing_id"],
        # no row_number window over the data, and no full-data re-sort
        # clustered on __pid (the tiny 32-row agg exchange on the
        # broadcast side is fine — it is aggregated, not data-sized)
        [r"row_number", r"Sort \[__pid#\d+ ASC NULLS FIRST, ts"],
    ],
    # TPC-H headliners: pushed date filters, broadcast dims, top-k heap
    "q_tpch_q1": [
        [r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", r"HashAggregate"],
        [],
    ],
    "q_tpch_q3": [
        [r"TakeOrderedAndProject", r"BroadcastHashJoin"],
        [r"\+- Sort \[revenue.*global=true"],
    ],
    "q_tpch_q5": [[r"BroadcastHashJoin"], []],
    "q_tpch_q6": [
        [r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate", r"HashAggregate"],
        [],
    ],
    "q_tpch_q18": [[r"BroadcastHashJoin", r"TakeOrderedAndProject"], []],
    # scalar subquery executed as literal → pushed to the scan
    "q_subquery_scalar": [[r"PushedFilters: \[.*GreaterThan\(l_extendedprice"], []],
    # hash sampling stays JVM-side (no Python eval in the plan)
    "q_sample": [[r"HashAggregate"], [r"BatchEvalPython", r"ArrowEvalPython"]],
    "q_pivot": [[r"HashAggregate"], [r"Generate"]],
    "q_tpch_q10": [[r"BroadcastHashJoin", r"TakeOrderedAndProject"], []],
    "q_tpch_q14": [
        [r"BroadcastHashJoin", r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate"],
        [],
    ],
    # cube = one Expand + one shuffle, not 2^k scans
    "q_cube": [[r"Expand", r"HashAggregate"], []],
    "q_sample_stratified": [
        [r"HashAggregate"],
        [r"BatchEvalPython", r"ArrowEvalPython"],
    ],
    # struct-valued max_by is sort-aggregated, but still partial+final
    # (one shuffle) and never a window over the whole table
    "q_minmax_by": [[r"partial_max_by"], [r"Window"]],
    "q_grouping_sets": [[r"Expand", r"HashAggregate"], []],
    # Q19: per-side residuals reach both scans despite the cross-side OR
    "q_tpch_q19": [
        [
            r"BroadcastHashJoin",
            r"PushedFilters: \[.*Or\(.*l_quantity",
        ],
        [r"SortMergeJoin"],
    ],
    "q_tpch_q16": [[r"BroadcastHashJoin", r"HashAggregate"], []],
    # north-star composition + text tier stay JVM-side end to end
    "q_pipeline_prep": [
        [r"HashAggregate", r"Generate"],
        [r"BatchEvalPython", r"ArrowEvalPython"],
    ],
    "q_chunk_text": [
        [r"Generate"],
        [r"BatchEvalPython", r"ArrowEvalPython", r"Exchange"],
    ],
    "q_top_words": [[r"TakeOrderedAndProject", r"HashAggregate"], []],
    "q_sessionize": [
        [r"Window", r"HashAggregate"],
        [r"BatchEvalPython", r"ArrowEvalPython"],
    ],
    "q_variant_json": [
        [r"Project"],
        [r"BatchEvalPython", r"ArrowEvalPython"],
    ],
    "q_embed_centroid": [[r"Generate", r"HashAggregate"], []],
    # search: term filter runs before aggregation; df side broadcasts
    "q_search_tfidf": [
        [r"BroadcastHashJoin", r"TakeOrderedAndProject"],
        [r"SortMergeJoin"],
    ],
    # contamination: benchmark membership is a LEFT SEMI join on int64
    # shingle hashes — never a cartesian/pair-producing join
    "q_contamination": [
        [r"LeftSemi", r"HashAggregate"],
        [r"CartesianProduct"],
    ],
    # sign-LSH ANN: bucket equi-join + top-k heap, no global sort
    "q_knn_hyperplane": [
        [r"TakeOrderedAndProject", r"BroadcastHashJoin"],
        [r"\+- Sort \[score.*global=true"],
    ],
    # PII scrub is one codegen projection over the scan — no Python
    "q_pii_scrub": [
        [r"\*\(\d+\) Project"],
        [r"BatchEvalPython", r"ArrowEvalPython"],
    ],
    # markup strip / URL harvest: one codegen projection each — no
    # Python eval, no join, no shuffle
    # corpus split: one codegen projection, no shuffle, no RNG
    "q_corpus_split": [
        [r"\*\(\d+\) Project"],
        [r"BatchEvalPython", r"ArrowEvalPython", r"Exchange", r"rand"],
    ],
    "q_markup_strip": [
        [r"\*\(\d+\) Project"],
        [r"BatchEvalPython", r"ArrowEvalPython", r"Exchange"],
    ],
    # (plain Project: the transform(..., lower) higher-order lambda
    # keeps this projection out of whole-stage codegen — interpreted,
    # but still JVM-side, single-pass, shuffle-free)
    "q_url_domains": [
        [r"Project"],
        [r"BatchEvalPython", r"ArrowEvalPython", r"Exchange"],
    ],
    # CMS: sketch build is a hash aggregate; the 20-row probe side
    # broadcasts against the <=4096-cell sketch — never a cartesian
    "q_sketch_cms": [
        [r"HashAggregate", r"BroadcastHashJoin", r"TakeOrderedAndProject"],
        [r"CartesianProduct", r"BatchEvalPython"],
    ],
    # grouped-map applyInPandas: the one legitimate Python stage, one
    # shuffle on the group key
    "q_grouped_map_stats": [
        [r"FlatMapGroupsInPandas"],
        [r"BatchEvalPython", r"CartesianProduct"],
    ],
    # repetition profile: two-level hash aggregate chain, no join
    "q_quality_repetition": [
        [r"HashAggregate"],
        [r"Join", r"CartesianProduct"],
    ],
    # BM25: df side broadcasts, top-k compiles to a heap; corpus
    # stats (n_docs, avgdl) are IN-PLAN since r10 (VERDICT_r9 #3) —
    # the 1-row stats frame joins as a BroadcastNestedLoopJoin, never
    # a driver .first() collapsed to literals (which would show as
    # bare double literals and NO BNLJ) nor a cartesian
    "q_search_bm25": [
        [
            r"BroadcastHashJoin",
            r"TakeOrderedAndProject",
            r"BroadcastNestedLoopJoin",
        ],
        [r"CartesianProduct"],
    ],
    # PMI: within-doc self-join only (key = doc_id), top-k heap
    "q_word_pmi": [
        [r"TakeOrderedAndProject"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ],
    # salted aggregate: phase-1 groups by (key, salt) — both grouping
    # shapes must appear; the salt is xxhash64, never rand()
    "q_salted_agg": [
        [r"hashpartitioning\(event_type#\d+, __salt", r"xxhash64"],
        [r"\brand\("],
    ],
    # salted join: dim replicated per salt (explode), fact salted
    "q_salted_join": [
        [r"Generate explode", r"xxhash64"],
        [r"CartesianProduct", r"\brand\("],
    ],
    # guarded pipeline: gates plan as semi/anti joins, no cartesian
    "q_pipeline_guarded": [
        [r"LeftSemi", r"LeftAnti"],
        [r"CartesianProduct"],
    ],
    # Hamming-probe SimHash pairing: banded equi-join (probe rows via
    # explode), never a cartesian or nested-loop pair scan
    "q_dedup_simhash_hamming": [
        [r"Generate explode", r"HashAggregate"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ],
    # dataset mixing: ONE codegen'd filter — no shuffle, no join, no
    # Python; md5 keep-decision evaluates JVM-side
    "q_dataset_mix": [
        [r"\*\(\d+\) Filter", r"\bmd5\("],
        [
            r"Exchange",
            r"Join",
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"\brand\(",
        ],
    ],
    # sequence packing: per-stratum window (hashpartitioning on lang),
    # NEVER a single-partition global window
    "q_pack_sequences": [
        [r"Window", r"hashpartitioning\(lang"],
        [r"SinglePartition", r"BatchEvalPython", r"ArrowEvalPython"],
    ],
    # scalar quantization: codes are one JVM-side projection
    "q_vector_sq": [
        [r"Project"],
        [r"BatchEvalPython", r"ArrowEvalPython", r"Join"],
    ],
    # quantized ANN: top-k heap over the broadcast-query scoring scan
    "q_knn_sq": [
        [r"TakeOrderedAndProject", r"BroadcastNestedLoopJoin"],
        [r"BatchEvalPython", r"ArrowEvalPython", r"SortMergeJoin"],
    ],
    # boilerplate scrub: df count + flag join run on md5 segment
    # hashes (never strings); segmentation is array arithmetic feeding
    # one Generate — all JVM-side
    "q_boilerplate_scrub": [
        [r"Generate", r"HashAggregate", r"\bmd5\("],
        [r"BatchEvalPython", r"ArrowEvalPython", r"CartesianProduct"],
    ],
    # bigram LM: count tables are hash aggregates; scoring joins
    # per-doc DISTINCT bigrams (equi-join), never the token stream via
    # a pair-producing join
    "q_quality_lm": [
        [r"HashAggregate", r"Generate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # semantic dedup: bucket self-join is an equi-join on sig — any
    # pair enumeration outside a bucket would plan as a cartesian or
    # nested loop, which must not appear
    "q_dedup_semantic": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # repeated spans: gram-hash equi-join + (pair, diagonal) islands
    # window — never a pair-producing nested loop, and the window must
    # partition on the pair keys, not run single-partition
    "q_repeated_spans": [
        [r"Window", r"hashpartitioning\(id_a"],
        [
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
            r"SinglePartition.*Window",
        ],
    ],
    # importance weight: count tables are hash aggregates; scoring
    # joins per-doc distinct words (equi-join), all JVM-side
    "q_importance_weight": [
        [r"HashAggregate", r"Generate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # perceptual hash: the codec roundtrip is Arrow-batched
    # MapInPandas (the legitimate Python stage), never row-at-a-time
    # Python eval, and no shuffling join between the two map stages.
    # The ban names the shuffle/cartesian join operators specifically
    # (VERDICT_r4 #6): a bare r"Join" would also match a legitimate
    # future BroadcastHashJoin on the metadata side and force an audit
    # weakening when this tier grows.
    "q_media_phash": [
        [r"MapInPandas"],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
            r"ShuffledHashJoin",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    "q_media_phash_jpeg": [
        [r"MapInPandas"],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
            r"ShuffledHashJoin",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    "q_video_frames": [
        [r"MapInPandas"],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
            r"ShuffledHashJoin",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    "q_audio_fingerprint": [
        [r"MapInPandas"],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
            r"ShuffledHashJoin",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # training shuffle: the W1 two-phase range rank — one range
    # exchange, id arithmetic, never a global row_number window
    "q_training_shuffle": [
        [r"rangepartitioning\(skey", r"monotonically_increasing_id"],
        [r"row_number", r"BatchEvalPython", r"ArrowEvalPython"],
    ],
    # curriculum order: same W1 two-phase rank, ranged on the staged
    # composite key — still no window, no Python
    "q_curriculum_order": [
        [r"rangepartitioning\(stage", r"monotonically_increasing_id"],
        [r"row_number", r"BatchEvalPython", r"ArrowEvalPython"],
    ],
    # text-to-ANN composition: embed (aggregates) -> bucket equi-join
    # -> top-k heap, all JVM-side, no pair scans, no global sort
    "q_text_knn": [
        [r"TakeOrderedAndProject", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"\+- Sort \[score.*global=true",
        ],
    ],
    # composed selection: both score tiers + the mixing filter plan as
    # equi-joins/filters inside one plan — no Python, no pair scans,
    # and the mixing gate's md5 decision evaluates JVM-side
    "q_pipeline_select": [
        [r"HashAggregate", r"\bmd5\("],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
            r"\brand\(",
        ],
    ],
    # pruned near-dup (r6, completing the VERDICT_r5 #4 quartet): the
    # df-capped inverted-index join stays an equi-join over gram
    # hashes with JVM-side scoring — no Python stage, no cartesian.
    # (A BroadcastNestedLoopJoin IS expected: the 1-row freq-list
    # attach in jaccard_pairs_pruned step 2 — constant build side.)
    "q_dedup_near_pruned": [
        [r"HashAggregate", r"Generate"],
        [r"BatchEvalPython", r"ArrowEvalPython", r"CartesianProduct"],
    ],
    # BPE (r6, re-shaped r13 per VERDICT_r12 #2): application is
    # codegen chained replaces over the vocabulary; the occurrence
    # join is NO LONGER force-broadcast (the distinct-word table is
    # unbounded on web text — a forced broadcast OOMs at 100 TB).
    # AQE picks broadcast when the vocab is actually small, shuffle
    # when not, so the contract is "no NLJ / no cartesian / no
    # Python", not "broadcast" (SMJ in the static plan is fine — AQE
    # converts it at runtime here)
    "q_bpe_tokens": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # media near-dup (r6): decode is Arrow mapInPandas; pairing is the
    # banded equi-join (Generate = the probe-row explode) — never a
    # pair-producing nested loop / cartesian
    "q_dedup_media": [
        [r"MapInPandas", r"Generate", r"Join"],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # video: frame-aligned banding + all-frames verify — same contract
    "q_dedup_video": [
        [r"MapInPandas", r"Generate", r"Join"],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # audio twin: same shape contract as the image pairing
    "q_dedup_audio": [
        [r"MapInPandas", r"Generate", r"Join"],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # BPE-budgeted packing: the parents' plans composed — vocabulary
    # join (AQE-decided since r13, see q_bpe_tokens) + per-language
    # window, no Python, no cartesian, no NLJ, and no
    # single-partition global sort
    "q_pack_bpe": [
        [r"Window", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
            r"SinglePartition",
        ],
    ],
    # skew-robust media pairing (r7): banded tier + exact star tier —
    # the degenerate-group join must be a BROADCAST of the (tiny,
    # Zipf-bounded) over-cap fingerprint head, never a shuffle or a
    # pair-producing nested loop
    "q_dedup_media_robust": [
        [r"MapInPandas", r"Generate", r"BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # document-splitting packing (r7): one per-stratum window + the
    # grid-cell explode (Generate) — still no Python, no cartesian,
    # no single-partition global sort
    "q_pack_chunked": [
        [r"Window", r"Generate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SinglePartition",
        ],
    ],
    # full-alphabet BPE (r7): same plan contract as q_bpe_tokens —
    # AQE-decided vocabulary join (r13), no Python stage, no NLJ
    "q_bpe_tokens_full": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # trained-model tier (r7): APPLICATION plans only (training runs
    # at build time — K bounded integer aggregates, driver state
    # O(K·d)/O(d²)). Scoring/projection is one codegen fold per row:
    # scan + project, no shuffle, no Python anywhere.
    "q_quality_classifier": [
        [r"Project"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Exchange",
        ],
    ],
    # eval is one small hash aggregate over the scored projection
    "q_classifier_eval": [
        [r"HashAggregate"],
        [r"BatchEvalPython", r"ArrowEvalPython", r"CartesianProduct"],
    ],
    # PR sweep: threshold fan-out is a Generate (exploded literal
    # array — NOT a join), then one hash aggregate
    "q_classifier_pr": [
        [r"Generate", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Join",
        ],
    ],
    "q_embed_pca": [
        [r"Project"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Exchange",
        ],
    ],
    # exact AUC: corpus collapses through a hash aggregate to the
    # distinct-score table, then the W1 two-phase cumulative
    # (VERDICT_r7 #4): the data-sized window is PARTITIONED by the
    # score-grid bucket (windowspecdefinition(bkt, s ...)), the
    # cross-bucket prefix rides in on a broadcast join of the tiny
    # ≤AUC_BUCKETS-row base table — an unpartitioned window ordered
    # directly by s (the old single-partition WindowExec) must NOT
    # appear
    "q_classifier_auc": [
        [
            r"HashAggregate",
            r"windowspecdefinition\(bkt#\d+, s#\d+",
            r"BroadcastHashJoin",
        ],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"windowspecdefinition\(s#\d+",
        ],
    ],
    # calibration: ONE hash aggregate (the binned scale path) — no
    # window, no join, no Python
    "q_classifier_calibration": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Join",
            r"Window",
        ],
    ],
    # cluster-balanced sampling: ONE scan — the k×d argmin assignment
    # sits behind a one-row Generate barrier and the keep filter reads
    # it via a literal rate-array lookup (rates collected once at
    # build time); no join, no shuffle, no Python — and the argmin is
    # evaluated EXACTLY ONCE per row (VERDICT_r7 #1: the old
    # literal-CASE predicate let filter pushdown substitute the
    # assignment into all 8 branches + the projection — array_min ×9,
    # 5x the assignment cost; `(?s)array_min.*array_min` rejects any
    # second occurrence anywhere in the plan)
    "q_cluster_balanced": [
        [r"Generate explode", r"array_min"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Join",
            r"Exchange",
            r"(?s)array_min.*array_min",
        ],
    ],
    # k-means diagnostics: argmin projection -> ONE k-key hash agg
    "q_kmeans_sizes": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Join",
        ],
    ],
    # k-means application: per-row literal-centroid argmin projection
    # (training runs at build time) — scan + project only
    "q_kmeans_cluster": [
        [r"Project"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Exchange",
            r"Join",
        ],
    ],
    # BPE fertility: the tokenized-vocabulary join (AQE-decided since
    # r13, see q_bpe_tokens) back onto per-doc counts, then one
    # per-language aggregate; no Python, no cartesian, no NLJ
    "q_bpe_fertility": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # temperature mixture: the k-row rate table rides back on a
    # BROADCAST join (never a shuffle of the corpus against a 5-row
    # table), the keep decision is a codegen conditional aggregate;
    # no Python, no cartesian
    "q_dataset_mix_temp": [
        [r"BroadcastHashJoin", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
        ],
    ],
    # SemDeDup over trained cells: the cid self-join must be an
    # equi-join (hash/SMJ), never a cartesian; the cosine verify is a
    # codegen filter inside the join stage; no Python
    "q_dedup_semantic_cells": [
        [r"Join"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # whitened-space SemDeDup: same cell self-equi-join shape as the
    # raw-space cells query (whitened coords are literal-scaled
    # codegen folds computed before the join); no Python, no
    # cartesian, no BNLJ
    "q_dedup_semantic_white": [
        [r"Join"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
        ],
    ],
    # binned AUC: ONE hash aggregate to ≤AUC_BUCKETS cells, then the
    # tiny cumulative over the CELL table (windowspecdefinition(bin
    # ...) — W1 tiny-prefix shape); no join, no Python, and never a
    # window ordered on the raw score (that would be the
    # score-cardinality-sized exact tier's trap)
    "q_classifier_auc_binned": [
        [r"HashAggregate", r"windowspecdefinition\(bin#\d+"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Join",
            r"windowspecdefinition\(s#\d+",
            r"windowspecdefinition\(p#\d+",
        ],
    ],
    # quality-percentile gate: corpus collapses to <=256 cells in ONE
    # hash aggregate; the threshold rides a broadcast back onto the
    # scored corpus; no Python, no cartesian, and the only windows
    # are over the tiny cell table (never the raw text/doc rows)
    "q_quality_gate": [
        [r"HashAggregate", r"BroadcastNestedLoopJoin|BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"windowspecdefinition\(doc_id#\d+",
            r"windowspecdefinition\(text#\d+",
        ],
    ],
    # token-mass systematic sample: per-stratum cum-sum window (the
    # pack_sequences posture) + broadcast stride table + codegen
    # filter; no Python, no cartesian, no global (unpartitioned) sort
    "q_sample_tokens": [
        [r"windowspecdefinition\(lang#\d+", r"BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # binned quantiles: ONE hash aggregate collapses rows to cells
    # BEFORE any window; the cumulative window is PARTITIONED by the
    # group key over the cell table — a window over raw value/event
    # rows (value#/ts# spec) or any Python/cartesian stage is a
    # scale regression
    "q_percentile_binned": [
        [r"HashAggregate", r"windowspecdefinition\(event_type#\d+"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"windowspecdefinition\(value#\d+",
            r"windowspecdefinition\(ts#\d+",
        ],
    ],
    # RRF hybrid retrieval: both rankings must end in top-k heaps
    # (TakeOrderedAndProject) with the df table broadcast; no
    # cartesian, no Python — the tiny post-heap windows are the W1
    # ≤RRF_DEPTH-row shape and are allowed. The BM25 corpus stats
    # ride the same in-plan BroadcastNestedLoopJoin as q_search_bm25
    # (shared bm25_scores, VERDICT_r9 #3) — no driver .first()
    # event-rate anomaly: ONE cell aggregate over events, the moment
    # table broadcast back onto the cells; no Python, no window over
    # raw events, no cartesian
    "q_events_anomaly": [
        [r"HashAggregate", r"BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # kNN classify: bucket self-equi-join, neighbor ranking is a
    # PARTITIONED window (never a global sort), vote is a hash
    # aggregate; no Python, no cartesian
    "q_knn_classify": [
        [r"Window", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # index-backed RRF: the semantic ranking reads the materialized
    # IVF index with a PartitionFilters IN clause on centroid_id
    # (only nprobe cells are scanned); both rankings end in heaps;
    # the BM25 stats ride the same in-plan BNLJ as q_search_rrf
    "q_search_rrf_indexed": [
        [
            r"PartitionFilters: \[.*centroid_id#\d+ IN \(",
            r"TakeOrderedAndProject",
        ],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
        ],
    ],
    "q_search_rrf": [
        [
            r"TakeOrderedAndProject",
            r"BroadcastHashJoin",
            r"BroadcastNestedLoopJoin",
        ],
        [
            r"BatchEvalPython",
            r"CartesianProduct",
        ],
    ],
    # n-gram novelty: shingle df is one hash aggregate; the df join is
    # a shuffle equi-join on the shingle key; no Python (the shingle
    # arrays are codegen'd higher-order funcs), no cartesian
    "q_ngram_novelty": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # PCA scree: model-metadata output (m literal rows) — the plan
    # must be a bare local scan of the createDataFrame rows, never a
    # corpus read, join, exchange, or Python stage
    "q_embed_pca_scree": [
        [r"Scan ExistingRDD|LocalTableScan"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Exchange",
            r"Join",
            r"parquet",
        ],
    ],
    # top-4 PCA application: four codegen folds per row, still scan +
    # project only — adding components must not add shuffles or Python
    "q_embed_pca_topm": [
        [r"Project"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Exchange",
            r"Join",
        ],
    ],
    # whitening: same scan+project shape — the λ scaling is a literal
    # division, never a second pass or a join
    "q_embed_whiten": [
        [r"Project"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Exchange",
            r"Join",
        ],
    ],
    # k-means ∘ LM-quality stratification: the cluster assignment is a
    # codegen projection feeding an id equi-join (never a cartesian),
    # the LM tier's count tables broadcast, and the result is a k-cell
    # hash aggregate; no Python anywhere
    "q_cluster_quality": [
        [r"HashAggregate", r"BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # PCA outlier scoring: m+1 codegen folds per row feeding a top-k
    # heap — scan + project + TakeOrderedAndProject, never a global
    # sort, shuffle, join, or Python stage
    "q_embed_outlier": [
        [r"TakeOrderedAndProject", r"Project"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
            r"Join",
            r"Exchange",
        ],
    ],
    # ANN recall harness: the bounded query panel broadcasts (ground
    # truth is a BroadcastNestedLoopJoin by design — Q×N is the
    # defining cost of a recall benchmark); both rankings are windows
    # PARTITIONED per query; the tallies are hash aggregates; never
    # Python or an unbroadcast cartesian
    "q_knn_recall": [
        [r"BroadcastNestedLoopJoin", r"Window", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # ES weighted sampling: one codegen transform+array_max per row
    # into a top-k heap — no shuffle, no window, no join, no Python
    "q_sample_weighted": [
        [r"TakeOrderedAndProject"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
            r"Join",
        ],
    ],
    # PQ ANN: encode/ADC are the documented Arrow slow-path escape
    # (ArrowEvalPython REQUIRED — the codegen HOF form is ~k·m
    # interpreted fold chains per row); both stages end in TakeOrdered
    # heaps; the 1-row query broadcasts (BNLJ is the intended join);
    # never row-at-a-time Python, never an unbroadcast cartesian
    "q_knn_pq": [
        [r"ArrowEvalPython", r"TakeOrderedAndProject"],
        [r"BatchEvalPython", r"CartesianProduct"],
    ],
    # dup-cluster size histogram: the CC fixed point's iterative
    # equi-joins + two tiny aggregates over the group table — no
    # Python, no cartesian, no window
    "q_dedup_group_sizes": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # near-dup keep list (r13): the CC labels are materialized at
    # build time (localCheckpoint per label-propagation round, the
    # operators/graph.py contract), so the returned plan is the
    # labels-sized scan joined back to doc ids — no Python, no
    # cartesian, no window
    "q_dedup_keep_list": [
        [r"Join"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
            r"Window",
        ],
    ],
    # asymmetric containment (r13): the L2 inverted-index shape —
    # shared-shingle equi-join + hash aggregate, never a pair-
    # producing nested loop, no Python, no window
    "q_dedup_containment": [
        [r"HashAggregate", r"Join"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
            r"Window",
        ],
    ],
    # pruned containment (r13): same contract as the unpruned form,
    # plus the 1-row frequent-shingle broadcast (BroadcastNestedLoopJoin
    # on a literal TRUE condition is the DOCUMENTED 1-row attach shape
    # from jaccard_pairs_pruned — allowed; a pair-producing cartesian
    # still is not)
    "q_dedup_containment_pruned": [
        [r"HashAggregate", r"Join"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # character entropy (r13): explode + (doc, char) hash aggregate +
    # per-doc sorted fold — codegen end to end, no Python, no window,
    # no cartesian
    "q_quality_entropy": [
        [r"HashAggregate", r"Generate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
            r"Window",
        ],
    ],
    # HLL sketch (r13): ONE map-side-combined register aggregate +
    # the 30-row est/exact join — no Python, no cartesian, no window
    "q_sketch_hll": [
        [r"HashAggregate", r"Join"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
            r"Window",
        ],
    ],
    # minhash estimator accuracy: banded candidates + signature and
    # shingle-array joins over CANDIDATES only — no cartesian, no
    # window, no Python
    "q_minhash_est": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # event funnel: pushed type filters, per-stage hash aggregates,
    # user-keyed equi-joins (broadcastable stage tables) — no window
    # over raw events, no Python, no cartesian
    "q_events_funnel": [
        [r"HashAggregate", r"PushedFilters: \[.*event_type"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # transition matrix: per-user lead window (partitioned, never
    # global), pair-count aggregate, totals broadcast back — no
    # Python, no cartesian, no single-partition window
    "q_events_transitions": [
        [r"Window", r"HashAggregate", r"BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SinglePartition",
        ],
    ],
    # Matryoshka ANN: both stages TakeOrderedAndProject heaps; the
    # rerank candidate fetch is a broadcast semi-join — no global
    # sort, no Python, no cartesian
    "q_knn_matryoshka": [
        [r"TakeOrderedAndProject", r"BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"\bSort\b.*global",
        ],
    ],
    # dedup threshold sweep: bucket count over the verified pairs,
    # running sum over the <=20-row CELL table (the intentional
    # tiny-frame window) — no Python in the sweep itself
    "q_dedup_threshold_sweep": [
        [r"HashAggregate", r"Window"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # Heaps growth: two hash aggregates + tiny cell join + the
    # intentional tiny-frame cumulative window — no distinct-over-
    # prefix, no Python
    "q_corpus_heaps": [
        [r"HashAggregate", r"Window"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # split-KL drift: ONE vocab aggregate with conditional counts
    # (no join between halves), broadcast totals, one KL aggregate
    "q_corpus_drift": [
        [r"HashAggregate", r"BroadcastNestedLoopJoin|BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"Window",
        ],
    ],
    # Zipf diagnostic: vocab hash aggregate + the W1 two-phase rank
    # (range exchange reused by the counts branch) + one aggregate —
    # no Python, no cartesian; the only window is the machinery's
    # <=num_partitions-row prefix table
    "q_corpus_zipf": [
        [r"HashAggregate", r"ReusedExchange|Exchange rangepartitioning"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # Bloom decontamination prefilter: the bits table BROADCASTS
    # (the zero-shuffle probe claim), the exact tier stays a
    # (semi-)join over int64 shingles — no cartesian, no Python, no
    # window anywhere
    "q_bloom_contamination": [
        [r"BroadcastHashJoin|BroadcastExchange", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # DAU/WAU stickiness: distinct activity pass + two hash
    # aggregates + a <=days-row join — the 7x contribution explode
    # replaces any moving-window distinct; no window op at all
    "q_events_stickiness": [
        [r"HashAggregate", r"Generate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # session paths: two per-user(-session) windows, trigram count —
    # partitioned windows only, no Python, no cartesian, no join
    "q_events_paths": [
        [r"Window", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SinglePartition",
            r"Join",
        ],
    ],
    # power-user curve: two chained hash aggregates (per-user counts,
    # then count-of-counts) — no window, no join, no Python
    "q_events_power_curve": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
            r"Join",
        ],
    ],
    # inter-event gaps: ONE per-user lead window + one aggregate over
    # <=types groups — no Python, no join, no single-partition window
    "q_events_gaps": [
        [r"Window", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SinglePartition",
            r"Join",
        ],
    ],
    # cohort retention: DISTINCT (user, day) + min-aggregate +
    # user-keyed join; cell-bounded output
    "q_events_retention": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # dataset card: one aggregate per language (count-distinct's
    # standard two-phase expand) — no join, no window, no Python
    "q_corpus_card": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
            r"Join",
        ],
    ],
    # lang-ID confusion matrix: one map-side-combined aggregate over
    # the codegen scoring projection — no Python, no join, no window
    "q_langid_eval": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
            r"Join",
        ],
    ],
    # readability: one codegen regexp projection — nothing else
    "q_text_readability": [
        [r"Project"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
            r"Join",
            r"Exchange",
        ],
    ],
    # IVF-PQ: the stage-1 scan must prune to the probed cells
    # (PartitionFilters IN on centroid_id) and read codes, not raw
    # vectors (codes-only ReadSchema asserted in pytest — the audit
    # here pins pruning + the heaps + the Arrow ADC stage)
    "q_knn_ivfpq": [
        [
            r"PartitionFilters: \[.*centroid_id#\d+ IN \(",
            r"ArrowEvalPython",
            r"TakeOrderedAndProject",
        ],
        [r"BatchEvalPython", r"CartesianProduct"],
    ],
    # duplicate-graph triangles: banded candidate equi-joins + the
    # middle-vertex/closing-edge equi-joins + two explode tallies —
    # hash aggregates and equi-joins only, no Python, no cartesian,
    # no window
    "q_dedup_triangles": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # cross-split leakage audit: both sides reduce to int64 shingle
    # hashes, train side collapses to DISTINCT and the eval side
    # (semi-)joins against it — no cartesian, no Python, no window;
    # the split label is a codegen projection, never a join back
    "q_split_leakage": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # pair-level leakage: the lsh-verified shape (band equi-join,
    # no cartesian, no Python) + a codegen split projection — and
    # NEVER a join back to the corpus for labels (the verified table
    # is edges-sized; labels are pure per-id expressions)
    "q_split_leakage_pairs": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # chunk-pooling fidelity: chunk words by codegen transform INSIDE
    # the row (no explode of chunk text), two hash aggregates over
    # one persisted scan, doc-keyed join — no Python, no cartesian
    "q_chunk_pool_fidelity": [
        [r"HashAggregate", r"InMemory"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # type co-occurrence: distinct (user, type) first, user-keyed
    # pair join, broadcast type counts — no window, no Python, no
    # cartesian (the 1-row n_users BNLJ broadcast is the stats
    # convention, not a cartesian)
    "q_events_cooccurrence": [
        [r"HashAggregate", r"BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
        ],
    ],
    # burstiness: two chained cell aggregates, nothing else
    "q_events_burstiness": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
            r"Join",
        ],
    ],
    # tokenizer coverage: runs the TIERED vocabulary join (r13,
    # join_tokenized_vocab) — the top-K head is force-broadcast (the
    # required BroadcastHashJoin; build side bounded by the cap, not
    # by hoping the vocabulary stays small), the unbounded tail may
    # plan as SMJ (allowed — AQE broadcasts it at test SF). Still no
    # Python, no cartesian, no NLJ, no window
    "q_bpe_coverage": [
        [r"HashAggregate", r"BroadcastHashJoin"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"BroadcastNestedLoopJoin",
            r"Window",
        ],
    ],
    # packing efficiency: per-stratum cum-sum window (never
    # SinglePartition over data), two cell aggregates — no Python
    "q_pack_efficiency": [
        [r"Window", r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SinglePartition",
        ],
    ],
    # exact-K deterministic sample: ONE TakeOrderedAndProject heap —
    # no global sort exchange, no window, no Python; the seeded key
    # is computed in the scan projection
    "q_sample_exact_k": [
        [r"TakeOrderedAndProject"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Window",
            r"Exchange rangepartitioning",
        ],
    ],
    # token-length histogram: one map-side-combined hash aggregate to
    # <= langs x ~20 cells; the share window runs on the cell table
    # (allowed); no Python, no cartesian
    "q_len_histogram": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
    ],
    # hour-of-day seasonality: one hash aggregate to <= types x 24
    # cells; share window on the cell table (allowed); no Python,
    # no cartesian, no join
    "q_events_seasonality": [
        [r"HashAggregate"],
        [
            r"BatchEvalPython",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Join",
        ],
    ],
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # simple-mode explain truncates scan metadata (PushedFilters/...) at
    # 100 chars by default — widen so the audit sees the full filter list
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    qs = load_all()
    failed = 0

    # q_search_rrf single-tokenize assertion (VERDICT_r11 #2): the
    # corpus is tokenized ONCE into a persisted projection shared by
    # the BM25 side (dl/tf/df) and the hash-embed side. Formatted
    # mode prints each node once (simple mode reprints the cached
    # plan per InMemoryTableScan), so exactly one `split(lower(`
    # occurrence == one tokenize stage in the whole plan.
    buf = io.StringIO()
    with redirect_stdout(buf):
        qs["q_search_rrf"].fn(spark, sf_dir).explain(mode="formatted")
    n_tok = len(re.findall(r"split\(lower\(", buf.getvalue()))
    if n_tok == 1:
        print("✓ q_search_rrf single-tokenize (formatted)")
    else:
        failed += 1
        print(
            f"✗ q_search_rrf single-tokenize: {n_tok} split(lower( "
            "stages in formatted plan (want exactly 1)"
        )

    for name, (must, must_not) in EXPECT.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            qs[name].fn(spark, sf_dir).explain(extended=False)
        plan = buf.getvalue()
        problems = [f"missing {p!r}" for p in must if not re.search(p, plan)]
        problems += [
            f"unexpected {p!r}" for p in must_not if re.search(p, plan)
        ]
        if problems:
            failed += 1
            print(f"✗ {name}: {'; '.join(problems)}")
        else:
            print(f"✓ {name}")
    print(f"\n{failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
