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
# (WINDOW_R8) enforces the pinned membership.
#
# r8 rotation (VERDICT_r7 next-round #3): the window takes every query
# whose newest driver evidence is older than r5 or absent — the 13
# r4-DEFERRED rows from r7's plan, the two r7-new rows that had no
# free slot (q_kmeans_sizes, q_cluster_balanced — first driver rows),
# and the two r8-new queries (q_embed_pca_topm, q_cluster_quality) —
# then fills to 50 with 33 of the 48 r5-stale rows. The FIFTEEN
# deferred r5 rows (first in line for r9) each have in-window or
# fresher family coverage, none its operator's sole oracle:
# q_dedup_near_char (near-dup family: in-window q_dedup_near/
# q_dedup_near_pruned), q_dedup_simhash_pairs (SimHash family:
# r7-green q_dedup_simhash_hamming + r6 q_dedup_simhash),
# q_join_asof_fwd + q_join_asof_tol (J6 family: r7-green q_join_asof),
# q_media_phash_jpeg (media decode: in-window q_media_phash +
# q_multimodal_decode + the r6/r7 media-dedup tier),
# q_multimodal_meta (in-window q_multimodal_decode), q_pivot (A3:
# r7-green q_group_agg + r6 q_conditional_agg), q_quality_score
# (quality family: r7-green q_quality_lm/q_quality_repetition),
# q_range_frame (W4: r6-green q_running_sum/q_window_analytics),
# q_salted_agg + q_salted_join (skew forms of in-window/r7-green
# agg+join families, plan-audited), q_sessionize (T6: in-window
# q_session_window + q_sliding_agg), q_text_ngrams (text family:
# in-window q_token_count/q_top_words/q_text_tokens), q_udaf_gmean
# (§2.10: r7-green q_udf_cosine/q_udtf_props + in-window
# q_cogroup_recon/q_grouped_map_stats), q_variant_json (JSON family:
# r7-green q_json_extract).
# The two permanent rows-only checks (q_knn_ivf, q_approx_aggs) stay
# out of the window for good (VERDICT_r5 "What's wrong" #1): their
# `no_oracle` rows can never go green and their evidence lives in
# pytest (test_approx_aggs.py, test_pipeline.py IVF recall).
# Everything rotated out keeps its oracle and is exact-value-checked
# every round by tools/selfcheck.py.
PRIORITY: tuple[str, ...] = (
    # ---- r8 driver window (first 50) ----
    # the 13 r4-DEFERRED rows (r7's displacement debt, repaid):
    "q_union",
    "q_ordered_replay",
    "q_knn_hyperplane",
    "q_dedup_semantic",
    "q_multimodal_decode",
    "q_text_tokens",
    "q_string_funcs",
    "q_bitwise_funcs",
    "q_map_funcs",
    "q_array_funcs",
    "q_knn_sq",
    "q_join_anti",
    "q_knn_topk",
    # the two r7-new rows getting their FIRST driver evidence:
    "q_kmeans_sizes",
    "q_cluster_balanced",
    # the two r8-new queries (top-m PCA, per-cluster quality):
    "q_embed_pca_topm",
    "q_cluster_quality",
    # ... and 33 of the 48 r5-stale rows (15 deferred to r9,
    # rationale above):
    "q_audio_fingerprint",
    "q_chunk_text",
    "q_cogroup_recon",
    "q_corpus_split",
    "q_curriculum_order",
    "q_dedup_embed",
    "q_dedup_groups",
    "q_dedup_minhash",
    "q_dedup_near",
    "q_dedup_near_pruned",
    "q_fingerprint",
    "q_grouped_map_stats",
    "q_importance_weight",
    "q_join_full",
    "q_join_range_binned",
    "q_lang_id",
    "q_markup_strip",
    "q_media_phash",
    "q_pack_sequences",
    "q_pipeline_guarded",
    "q_pipeline_select",
    "q_repeated_spans",
    "q_session_window",
    "q_sketch_cms",
    "q_sliding_agg",
    "q_text_hash_embed",
    "q_text_knn",
    "q_token_count",
    "q_top_words",
    "q_training_shuffle",
    "q_url_domains",
    "q_vector_sq",
    "q_video_frames",
    # ---- out of the r8 window ----
    # Every query below holds a driver-green value-hash row from
    # r4-r7 (histogram in VERDICT_r7) or is a permanent rows-only
    # check; tools/selfcheck.py exact-value-checks every oracled one
    # each round.
    "q_count",
    "q_typename",
    "q_grouping_sets",
    "q_lag_gap",
    "q_json_extract",
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
    "q_media_phash_jpeg",
    "q_multimodal_meta",
    "q_udaf_gmean",
    "q_dedup_near_char",
    "q_dedup_simhash_pairs",
    "q_quality_score",
    "q_text_ngrams",
    "q_join_asof_fwd",
    "q_join_asof_tol",
    "q_salted_agg",
    "q_salted_join",
    "q_pivot",
    "q_range_frame",
    "q_variant_json",
    "q_sessionize",
    # r8-new, declared OUT of the window (the r8 window is pinned to
    # the staleness-repayment plan above); oracled, so selfcheck and
    # the embeddings fuzz family cover it until its r9 driver row
    "q_classifier_auc_binned",
    "q_dedup_semantic_cells",
    "q_embed_whiten",
    "q_dataset_mix_temp",
    "q_bpe_fertility",
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
