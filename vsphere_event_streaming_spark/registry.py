"""Declared-query registry.

Every operator from SURVEY.md §2 registers here as a named query: a
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible)
the equivalent ANSI SQL a DuckDB oracle runs on the same parquet
tables. ``__spark_entry__.py`` exposes this registry to the driver.

Cross-engine determinism rules every query follows:

- alias every computed column identically in Spark and SQL;
- money/double aggregates go through ``decimal`` casts so sums are
  exact (order-independent) in both engines, then back to double;
- timestamps stay in UTC (session tz pinned by ``session.tune``);
- top-k queries break ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query (decorator)."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QueryDef(fn=fn, oracle=oracle)
        return fn

    return deco


# Registry order is driver-visible: the verify driver checks queries in
# registration order and its CORRECTNESS window records the first 50.
# PRIORITY pins each round's rotation plan; tests/test_registry.py
# (WINDOW_R7) enforces the pinned membership.
#
# r7 rotation (VERDICT_r6 next-round #1): after r6's 50/50, the
# stalest driver evidence is the 5 r3-row queries and the 48 r4-row
# queries — 53 candidates for 50 slots. The window takes all 5 r3
# rows + 42 r4 rows + the three r7-new queries
# (q_dedup_media_robust, q_pack_chunked, q_bpe_tokens_full), which
# displace deferred-r4 slots, never r3 ones; the six deferred r4
# rows (q_union, q_ordered_replay, q_knn_hyperplane,
# q_dedup_semantic, q_multimodal_decode, q_text_tokens — family
# rationale inline below) rotate in next round. After r7 lands, no
# registered query's newest driver row is older than r4, and the
# five r3 stragglers go green at r7.
# The two permanent rows-only checks (q_knn_ivf, q_approx_aggs) stay
# out of the window for good (VERDICT_r5 "What's wrong" #1): their
# `no_oracle` rows can never go green and their evidence lives in
# pytest (test_approx_aggs.py, test_pipeline.py IVF recall).
# Everything rotated out keeps its oracle and is exact-value-checked
# every round by tools/selfcheck.py.
PRIORITY: tuple[str, ...] = (
    # ---- r7 driver window (first 50) — VERDICT_r6 #1: the 50
    # stalest queries. The 5 whose newest driver row is r3:
    "q_count",
    "q_typename",
    "q_grouping_sets",
    "q_lag_gap",
    "q_json_extract",
    # ... plus 35 of the 48 whose newest driver row is r4. Thirteen
    # r4 rows are DEFERRED to r8, each with other in-window or
    # r5/r6-green family coverage, none its operator's sole oracle
    # (the seven r7-new trained-model queries displace seven more
    # deferred-r4 slots per the verdict's displacement rule:
    # q_string_funcs + q_bitwise_funcs + q_map_funcs + q_array_funcs
    # (§2.8 scalar family: in-window q_time_funcs/q_casts/
    # q_null_funcs + r6-green q_math_funcs), q_knn_sq (ANN family:
    # in-window q_knn_topk/q_knn_hyperplane_probed + r5/r6-green IVF
    # tier), q_join_anti (J4 family held by in-window q_join_semi),
    # q_knn_topk (ANN family: in-window q_knn_hyperplane_probed +
    # r5/r6-green IVF/SQ tiers)):
    # q_union (§2.7 also held by in-window q_except + r6-green
    # q_intersect), q_ordered_replay (ordering also held by in-window
    # q_last_page + the wire-level pytest tier), q_knn_hyperplane
    # (subsumed by in-window q_knn_hyperplane_probed — same operator,
    # probed superset — plus q_knn_topk/q_knn_sq), q_dedup_semantic
    # (embedding near-dup family: in-window q_dedup_lsh_verified/
    # q_dedup_exact/q_dedup_simhash_hamming + r5-green q_dedup_embed),
    # q_multimodal_decode (decode surface exercised by r5-green
    # q_media_phash/q_audio_fingerprint + the r6 media-dedup trio +
    # in-window q_dedup_media_robust), q_text_tokens (§2.10 surface:
    # in-window q_udf_cosine/q_udtf_props; token counting also via
    # r6-green q_bpe_tokens + in-window q_bpe_tokens_full):
    "q_boilerplate_scrub",
    "q_casts",
    "q_contamination",
    "q_count_distinct",
    "q_dataset_mix",
    "q_dedup_exact",
    "q_dedup_lsh_verified",
    "q_dedup_simhash_hamming",
    "q_envelope",
    "q_except",
    "q_group_agg",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_left",
    "q_join_range",
    "q_join_semi",
    "q_join_smj",
    "q_knn_hyperplane_probed",
    "q_last_page",
    "q_null_funcs",
    "q_offset_assign",
    "q_pii_scrub",
    "q_point_lookup",
    "q_quality_lm",
    "q_quality_repetition",
    "q_range",
    "q_replay_from",
    "q_retention",
    "q_rollup",
    "q_search_bm25",
    "q_time_funcs",
    "q_tumbling_agg",
    "q_udf_cosine",
    "q_udtf_props",
    "q_word_pmi",
    # ... and the ten r7-new queries, displacing deferred-r4 slots
    # (never r3 ones), per the verdict's displacement rule:
    "q_dedup_media_robust",
    "q_pack_chunked",
    "q_bpe_tokens_full",
    "q_quality_classifier",
    "q_classifier_eval",
    "q_classifier_pr",
    "q_embed_pca",
    "q_classifier_auc",
    "q_classifier_calibration",
    "q_kmeans_cluster",
    # ---- out of the r7 window ----
    # Every query below holds a driver-green value-hash row from
    # r4-r6 (histogram in VERDICT_r6) and keeps its oracle —
    # tools/selfcheck.py exact-value-checks all of them every round.
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q10",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_percentile",
    "q_window_analytics",
    "q_cube",
    "q_join_cross",
    "q_regexp_funcs",
    "q_try_funcs",
    "q_sample_stratified",
    "q_search_tfidf",
    "q_embed_centroid",
    "q_conditional_agg",
    "q_pipeline_prep",
    "q_string_agg",
    "q_minmax_by",
    "q_histogram",
    "q_fuzzy_match",
    "q_subquery_scalar",
    "q_sample",
    "q_profile",
    "q_bpe_tokens",
    "q_dedup_media",
    "q_dedup_audio",
    "q_pack_bpe",
    "q_dedup_video",
    "q_eventclass",
    "q_math_funcs",
    "q_running_sum",
    "q_dedup_simhash",
    "q_time_window_filter",
    "q_range_bounds",
    "q_page_json",
    "q_decode_roundtrip",
    "q_chain_agg",
    "q_rank",
    "q_intersect",
    "q_knn_ivf",
    "q_approx_aggs",
    "q_pack_sequences",
    "q_vector_sq",
    "q_repeated_spans",
    "q_importance_weight",
    "q_pipeline_select",
    "q_media_phash",
    "q_media_phash_jpeg",
    "q_video_frames",
    "q_audio_fingerprint",
    "q_text_hash_embed",
    "q_text_knn",
    "q_training_shuffle",
    "q_curriculum_order",
    "q_multimodal_meta",
    "q_sliding_agg",
    "q_session_window",
    "q_udaf_gmean",
    "q_cogroup_recon",
    "q_grouped_map_stats",
    "q_dedup_minhash",
    "q_dedup_near",
    "q_dedup_near_pruned",
    "q_dedup_near_char",
    "q_dedup_simhash_pairs",
    "q_dedup_embed",
    "q_lang_id",
    "q_quality_score",
    "q_fingerprint",
    "q_token_count",
    "q_text_ngrams",
    "q_join_asof_fwd",
    "q_join_asof_tol",
    "q_join_range_binned",
    "q_salted_agg",
    "q_salted_join",
    "q_pipeline_guarded",
    "q_markup_strip",
    "q_url_domains",
    "q_corpus_split",
    "q_dedup_groups",
    "q_join_full",
    "q_pivot",
    "q_range_frame",
    "q_variant_json",
    "q_sessionize",
    "q_chunk_text",
    "q_top_words",
    "q_sketch_cms",
    "q_ordered_replay",
    "q_union",
    "q_text_tokens",
    "q_multimodal_decode",
    "q_knn_hyperplane",
    "q_dedup_semantic",
    "q_string_funcs",
    "q_bitwise_funcs",
    "q_knn_sq",
    "q_map_funcs",
    "q_array_funcs",
    "q_join_anti",
    "q_knn_topk",
    # r7-new, declared OUT of the window (no free slot without
    # deferring a sole-oracle row); oracled, so selfcheck covers it
    "q_kmeans_sizes",
    "q_cluster_balanced",
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side-effect: registration).

    Returns the registry re-ordered so PRIORITY names come first (in
    PRIORITY order), then everything else in registration order.

    A PRIORITY name that is no longer registered degrades gracefully —
    warn and skip, never fail every consumer over a rename. The pinned
    window itself is enforced by ``tests/test_registry.py`` instead.
    """
    import warnings

    from .queries import (  # noqa: F401
        advanced_queries,
        log_queries,
        model_queries,
        pipeline_queries,
        relational_queries,
        scalar_queries,
        streaming_queries,
    )

    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        warnings.warn(
            f"PRIORITY names not registered (skipped): {missing}",
            RuntimeWarning,
            stacklevel=2,
        )
    ordered = {n: QUERIES[n] for n in PRIORITY if n in QUERIES}
    ordered.update((n, qd) for n, qd in QUERIES.items() if n not in ordered)
    return ordered
