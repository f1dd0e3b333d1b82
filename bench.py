"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query is materialized with the `noop` writer — the full plan
executes (no count-based column pruning shortcuts) and nothing is
collected to the driver, so timings measure the engine, not the
harness.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vsphere_event_streaming_spark.registry import load_all  # noqa: E402
from vsphere_event_streaming_spark.session import get_spark  # noqa: E402

#: Headline set: the reference read path (log model + envelope), the
#: heavy relational operators, and the LLM-pipeline tier.
HEADLINE = [
    "q_last_page",
    "q_offset_assign",
    "q_envelope",
    "q_join_broadcast",
    "q_join_smj",
    "q_join_asof",
    "q_group_agg",
    "q_rollup",
    "q_running_sum",
    "q_session_window",
    "q_text_tokens",
    "q_dedup_near",
    "q_dedup_minhash",
    "q_knn_topk",
    "q_udf_cosine",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q18",
    "q_pipeline_prep",
    # r2 additions (superset keeps r1 per-query comparability): the
    # scale-path dedup/ANN variants and wider TPC-H join shapes
    "q_dedup_lsh_verified",
    "q_dedup_near_pruned",
    "q_dedup_simhash",
    "q_knn_ivf",
    "q_multimodal_decode",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q13",
    # r3 additions: training-data hygiene tier + the oracle-checkable
    # ANN variant + the one-plan hygiene-guarded corpus prep
    "q_contamination",
    "q_pii_scrub",
    "q_quality_repetition",
    "q_knn_hyperplane",
    "q_pipeline_guarded",
    # r4 additions: Hamming-probe SimHash pairing, dataset mixing,
    # sequence packing, scalar-quantized ANN
    "q_dedup_simhash_hamming",
    "q_dataset_mix",
    "q_pack_sequences",
    "q_knn_sq",
    # r4 additions (2): segment-level boilerplate scrub, bigram-LM
    # quality scoring, bucketed semantic dedup
    "q_boilerplate_scrub",
    "q_quality_lm",
    "q_dedup_semantic",
    # r4 additions (3): repeated-span detection, DSIR importance,
    # and the one-plan composed selection pipeline
    "q_repeated_spans",
    "q_importance_weight",
    "q_pipeline_select",
    # r4 additions (4): perceptual hash / audio fingerprint through
    # the real PNG / WAV roundtrips
    "q_media_phash",
    "q_audio_fingerprint",
    # r4 additions (5): text-to-ANN composition over feature-hashing
    # embeddings
    "q_text_knn",
    # r5 additions: full baseline JPEG roundtrip gate (VERDICT_r4 #4)
    # and the MJPEG-AVI video frame-sampling path it unlocked
    "q_media_phash_jpeg",
    "q_video_frames",
    # r5 additions (2): web-corpus extraction front, CMS sketch,
    # grouped-map robust stats
    "q_markup_strip",
    "q_url_domains",
    "q_sketch_cms",
    "q_grouped_map_stats",
    "q_curriculum_order",
    "q_join_range_binned",
    "q_corpus_split",
    # r6 additions: trained-merge BPE (training + application) and the
    # pHash-banded media near-dup composition
    "q_bpe_tokens",
    "q_dedup_media",
    # r6 additions (2): the audio near-dup twin and BPE-budgeted
    # sequence packing
    "q_dedup_audio",
    "q_pack_bpe",
    # r6 additions (3): clip-level video near-dup (frame-aligned bands)
    "q_dedup_video",
    # r7 additions: degenerate-robust media dedup (banded ∪ exact
    # tier), document-splitting chunked packing, full-alphabet BPE
    "q_dedup_media_robust",
    "q_pack_chunked",
    "q_bpe_tokens_full",
    # r7 additions (4): the trained-model tier. Training runs ONCE per
    # (process, corpus) — per-corpus memos in queries/model_queries.py
    # pay the driver-looped training aggregates on first use (the
    # train-once/apply-many shape real pipelines have), so the timed
    # rows below measure the APPLICATION path only (codegen scoring /
    # eval aggregate / PR sweep / projection; timed_pass starts its
    # clock after fn() returns, so driver-side training inside query
    # construction is untimed by design). The full training cost is
    # measured separately: scale_probe's logreg_train_score (8.3 s at
    # sf0.1, 2.0x at 10x rows) and pca_gram_project (0.72 s, 1.2x) —
    # SCALE.md.
    "q_quality_classifier",
    "q_classifier_eval",
    "q_classifier_pr",
    "q_embed_pca",
    # exact rank-sum AUC + calibration bins over the memoized scores
    "q_classifier_auc",
    "q_classifier_calibration",
    # trained k-means assignment (application path; training probed
    # in SCALE.md via scale_probe's kmeans_train_assign)
    "q_kmeans_cluster",
    "q_kmeans_sizes",
    "q_cluster_balanced",
    # r8 additions: top-4 PCA projection (application path), the
    # k-means ∘ LM-quality stratification composition, and the
    # trained-cell IVF (q_knn_ivf already listed above now runs over
    # trained centroids)
    "q_embed_pca_topm",
    "q_cluster_quality",
    # binned mergeable-cell AUC (the streaming monitor form)
    "q_classifier_auc_binned",
    # SemDeDup over trained k-means cells (the published recipe,
    # training + every pair decision oracle-replayed)
    "q_dedup_semantic_cells",
    # whitening projection (unit-second-moment top-m components)
    "q_embed_whiten",
    # temperature-equalized mixture sampling (n^alpha rates in-plan)
    "q_dataset_mix_temp",
    # per-language tokenizer fertility over the trained BPE
    "q_bpe_fertility",
    # r9 additions: PCA scree (model-metadata path), RRF hybrid
    # retrieval, per-doc n-gram novelty, binned mergeable quantiles
    "q_embed_pca_scree",
    "q_search_rrf",
    "q_ngram_novelty",
    "q_percentile_binned",
    # token-mass systematic sampling (exact-integer weighted sample)
    "q_sample_tokens",
    # quality-percentile gate (L39 cells feeding selection in-plan)
    "q_quality_gate",
    # r10 additions: whitened-space SemDeDup (cells + whitened
    # cosine); index-backed hybrid retrieval (trained-IVF semantic
    # ranking — index built+memoized per corpus at first call,
    # untimed; the timed row is the probe + fusion serve path)
    "q_dedup_semantic_white",
    "q_search_rrf_indexed",
    # kNN pseudo-labeling over the sign-LSH buckets
    "q_knn_classify",
    # per-type event-rate anomaly monitor (cells + broadcast moments)
    "q_events_anomaly",
    # r10 additions (second wave): PCA residual outliers; the ANN
    # recall harness (exact panel ground truth is the timed cost);
    # ES weighted sampling; duplicate-graph triangles; PQ ANN with
    # exact rerank (codebooks trained+memoized per corpus at first
    # call, untimed; the timed row is the encode+ADC+rerank serve)
    "q_embed_outlier",
    "q_knn_recall",
    "q_sample_weighted",
    "q_dedup_triangles",
    "q_knn_pq",
    # composed IVF-PQ index serve (coarse cells + codebooks trained,
    # index written+memoized per corpus at first call, untimed; the
    # timed row is probe -> ADC-over-codes -> exact rerank)
    "q_knn_ivfpq",
    # lang-ID confusion matrix + Flesch readability (heuristic eval
    # and quality tiers)
    "q_langid_eval",
    "q_text_readability",
    # event analytics (funnel, cohort retention) + the dataset card
    "q_events_funnel",
    "q_events_retention",
    "q_corpus_card",
    # MinHash estimator-accuracy evaluation
    "q_minhash_est",
    # dup-cluster size histogram (CC composition)
    "q_dedup_group_sizes",
    # first-order event-type transition matrix
    "q_events_transitions",
    # r11 additions: session-path mining, power-user curve,
    # inter-event gap profile
    "q_events_paths",
    "q_events_power_curve",
    "q_events_gaps",
    # Bloom-prefiltered decontamination (broadcast filter, zero shuffle)
    "q_bloom_contamination",
    # Matryoshka two-stage ANN + the dedup threshold-sweep diagnostic
    "q_knn_matryoshka",
    "q_dedup_threshold_sweep",
    # DAU/WAU stickiness (contribution-expanded trailing window)
    "q_events_stickiness",
    # Zipf-law corpus diagnostic (W1 two-phase vocab rank + regression)
    "q_corpus_zipf",
    # Heaps growth curve + split-KL drift monitor
    "q_corpus_heaps",
    "q_corpus_drift",
    # r12 additions: shingle-tier cross-split leakage audit, exact-K
    # deterministic sample, token-length pack-budget histogram,
    # hour-of-day seasonality profile
    "q_split_leakage",
    "q_split_leakage_pairs",
    "q_sample_exact_k",
    "q_len_histogram",
    "q_events_seasonality",
    # chunk-pooling fidelity (RAG embedding diagnostic)
    "q_chunk_pool_fidelity",
    # type co-occurrence lift + per-type burstiness
    "q_events_cooccurrence",
    "q_events_burstiness",
    # per-language tokenizer coverage over the trained BPE
    "q_bpe_coverage",
    # packing fill/overflow summary over the pack cells
    "q_pack_efficiency",
    # r13 additions: the dedup verdict table (pairs -> CC -> keep),
    # asymmetric containment pairs, character-entropy quality, and
    # the oracle-replayed HLL distinct sketch
    "q_dedup_keep_list",
    "q_dedup_containment",
    "q_dedup_containment_pruned",
    "q_quality_entropy",
    "q_join_asof_near",
    "q_sketch_hll",
]

#: Pinned measurement spine (VERDICT_r6 #2). MEMBERSHIP IS FROZEN —
#: never add or remove a query from this list. The full HEADLINE set
#: grows every round inside one JVM, which manufactures 1.5-2×
#: phantom per-query "regressions" from co-tenancy (GC + Arrow-pool
#: pressure from later decode-heavy additions); the spine is timed in
#: its own matched-load pass (same 20 queries, same order, same
#: warm-up state every round), so spine-total round-over-round is the
#: official performance ratio. The full set remains reported for
#: coverage visibility, not for ratios. Cross-section: log model,
#: broadcast + as-of joins, hash agg, window, 4 TPC-H shapes, LSH +
#: SimHash dedup, exact + quantized ANN, tokenization, the composed
#: selection pipeline, image + audio decode, trained BPE.
#: The ten most expensive full-set queries (as of r12's ledger) —
#: the heavy tail where an ambient-load spike shows up largest in
#: absolute seconds. bench_full.json carries their min-of-2 AND
#: single-shot first trials (the spine's VERDICT_r11 #3 control,
#: extended per VERDICT_r12 #5) so a round-over-round mover here is
#: adjudicated in-artifact: single_shot moved with flat min2 =
#: co-tenancy; a moved MIN = investigate the plan.
HEAVY_TAIL = [
    "q_dedup_video",
    "q_knn_pq",
    "q_dedup_audio",
    "q_search_rrf",
    "q_text_knn",
    "q_video_frames",
    "q_bloom_contamination",
    "q_dedup_media",
    "q_dedup_media_robust",
    "q_pipeline_select",
    # r13 observation: read 7.42 min-of-2 IN-SET on the early run but
    # 2.08 isolated (r12 ledger 1.93) — the strongest full-set
    # co-tenancy case measured yet, so it carries the control too
    "q_repeated_spans",
    # r14 additions (the media-tier fusions halved that tier, so the
    # pruned-dedup pair generators are now among the heaviest rows;
    # additive only — the spine stays frozen)
    "q_dedup_near_pruned",
    "q_dedup_containment_pruned",
]

SPINE = [
    "q_last_page",
    "q_offset_assign",
    "q_envelope",
    "q_join_broadcast",
    "q_join_asof",
    "q_group_agg",
    "q_running_sum",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q6",
    "q_tpch_q18",
    "q_dedup_lsh_verified",
    "q_dedup_simhash_hamming",
    "q_knn_topk",
    "q_knn_sq",
    "q_text_tokens",
    "q_pipeline_select",
    "q_media_phash",
    "q_audio_fingerprint",
    "q_bpe_tokens",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # SPARK_GRAFT_BENCH_PREFIX=N times only the first N headline
    # queries — used for matched-JVM-load comparisons against an older
    # round's smaller set (a 47-query run carries more GC pressure per
    # query than the 34-query run it's compared to; VERDICT_r4 #5).
    headline = HEADLINE
    prefix = os.environ.get("SPARK_GRAFT_BENCH_PREFIX")
    if prefix:
        headline = HEADLINE[: int(prefix)]
    # SPARK_GRAFT_BENCH_ONLY=a,b,c times just the named queries in
    # isolation — the tool for root-causing a single query's nominal
    # regression without the full set's JVM co-tenancy (VERDICT_r5 #4).
    queries = load_all()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
        headline = names
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: first query pays JVM/JIT/codegen + parquet footer
    # costs (~2 s) that say nothing about plan quality; standard warm-run
    # benchmarking.
    queries["q_count"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Python-runtime warmup, same rationale: the first wide Python stage
    # pays worker spawn + numpy/pandas/pyarrow import for every core —
    # a chained mapInPandas needs 2×cores workers, ~3-5 s of one-time
    # cost (and the dominant run-to-run variance for
    # q_multimodal_decode). Spawn the full pool untimed so Python-stage
    # timings measure the plan, not interpreter startup.
    def _noop(batches):  # pragma: no cover - trivial warmup body
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    width = spark.sparkContext.defaultParallelism
    spark.range(0, 100 * width, 1, width).mapInPandas(
        _noop, "id long"
    ).mapInPandas(_noop, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    def codegen_warm(names: list[str]) -> None:
        # Codegen warmup: whole-stage codegen compiles one generated
        # class per unique plan shape (~0.5-1.5 s per query, cached by
        # source text). Run each query once at the smallest SF untimed
        # — identical plan shapes hit the compile cache, so measured
        # runs time execution at the benchmark SF, not janino.
        # Warm-engine / cold-data: nothing row-level is cached
        # (different files + clearCache between runs).
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir) and os.path.realpath(
            warm_dir
        ) != os.path.realpath(sf_dir):
            for name in names:
                queries[name].fn(spark, warm_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                spark.catalog.clearCache()

    def timed_trials(names: list[str]) -> dict[str, list[float]]:
        # Each query is timed twice (hyperfine-style): this machine
        # shows intermittent multi-second ambient contention spikes,
        # and min-of-2 measures the plan rather than the co-tenant.
        # Both trials are returned so the artifact can carry the
        # ambient control itself (VERDICT_r11 #3): first-trial vs min
        # divergence IS the ambient signal — uniform elevation of
        # trial 1 across members with flat mins means co-tenancy, a
        # single query whose MIN moved means investigate the plan.
        trials: dict[str, list[float]] = {}
        for name in names:
            ts: list[float] = []
            for _ in range(2):
                df = queries[name].fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 3))
                # measure queries in isolation: persisted
                # intermediates (dedup shingle tables etc.) must not
                # occupy memory for later queries or the second trial
                spark.catalog.clearCache()
            trials[name] = ts
        return trials

    # The spine runs FIRST, immediately after the fixed warmups and
    # warmed only on its own (frozen) membership — the JVM state under
    # it is identical every round regardless of how HEADLINE grows, so
    # spine totals are the round-over-round comparable (VERDICT_r6 #2).
    spine_block = None
    if not prefix and not only:
        codegen_warm(SPINE)
        spine_trials = timed_trials(SPINE)
        spine_timings = {n: min(ts) for n, ts in spine_trials.items()}
        single_shot = {n: ts[0] for n, ts in spine_trials.items()}
        spine_block = {
            "total_sec": round(sum(spine_timings.values()), 3),
            "queries": spine_timings,
            # VERDICT_r11 #3: the artifact carries its own ambient
            # control — spine_min2 (the official per-query min-of-2)
            # next to the single-shot first trial. A round-over-round
            # move that shows in single_shot but not spine_min2 is
            # co-tenancy, not a plan change.
            "spine_min2": spine_timings,
            "single_shot": single_shot,
            "single_shot_total_sec": round(sum(single_shot.values()), 3),
        }

    codegen_warm(headline)
    full_trials = timed_trials(headline)
    timings = {n: min(ts) for n, ts in full_trials.items()}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # VERDICT_r14 #7: the ledger must say which core count produced
        # it — a driver cpus=8 scaling run once overwrote the committed
        # 32-core closing record and the two were indistinguishable.
        "cpus": spark.sparkContext.defaultParallelism,
    }
    if spine_block is not None:
        out["spine"] = spine_block
    # VERDICT_r12 #5: the heavy tail carries its own ambient control
    # in the archived artifact, the way the spine does — full JSON /
    # bench_full.json only (the compact tail line must stay <1KB).
    tail_names = [n for n in HEAVY_TAIL if n in full_trials]
    if tail_names:
        out["heavy_tail"] = {
            "min2": {n: timings[n] for n in tail_names},
            "single_shot": {n: full_trials[n][0] for n in tail_names},
        }
    # The driver records only the LAST 2000 bytes of stdout and parses
    # the JSON line it finds there; r7's single line (75 queries +
    # spine) outgrew that buffer and lost its head (`BENCH_r07.json
    # parsed: null` — VERDICT_r7 #3). So: the full-set JSON goes out
    # FIRST (and to bench_full.json beside this script for archival —
    # UNTRACKED since r10, VERDICT_r9 #9: driver and builder runs both
    # land here, and a tracked file let a driver run overwrite the
    # builder's committed ledger entry; the committed round-over-round
    # record is BENCH_r{N}.json + the README adjudication log),
    # and the LAST line is a compact, always-<1KB object — totals +
    # the frozen 20-query spine, the official round-over-round
    # instrument — guaranteed to survive the tail capture whole.
    print(json.dumps(out))
    # bench_full.json is the TRACKED round ledger — only a FULL run may
    # write it. A SPARK_GRAFT_BENCH_ONLY/PREFIX smoke run overwriting
    # it once clobbered a round's committed closing record (r13), and a
    # driver cpus=8 scaling run did the same in r14 (VERDICT_r14 #7) —
    # so a non-default core count also skips the archive write (the
    # run's own stdout JSON still carries its numbers + cpus).
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    default_cpus = cpus_env in (None, "", "*") or cpus_env == str(
        os.cpu_count()
    )
    if not prefix and not only and default_cpus:
        try:
            full_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "bench_full.json",
            )
            with open(full_path, "w") as fh:
                json.dump(out, fh)
        except OSError:
            pass  # archival only; never fail the bench over it
    if spine_block is not None:
        # Compact spine: totals + per-query mins only — the min2 /
        # single_shot control maps live in the full JSON and
        # bench_full.json; three maps of 20 entries would push this
        # line past the driver's 2000-byte tail capture.
        compact = {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": spine_block["queries"],
            "sf": sf,
            "spine": {
                "total_sec": spine_block["total_sec"],
                "queries": spine_block["queries"],
                "single_shot_total_sec": spine_block[
                    "single_shot_total_sec"
                ],
            },
        }
        print(json.dumps(compact))


if __name__ == "__main__":
    main()
