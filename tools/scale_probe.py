"""Scale probe: replicate the test tables 10× in-memory and time the
scale-critical operators against their 1× time.

Replication = union of key-shifted copies (each copy's text gets a
copy-tag word so replicas are near-dups, not byte-dups — the worst
realistic case for dedup: ~45 true near-dup pairs per base doc).
Nothing is written anywhere; /root/testdata stays untouched.

A healthy engine scales ~linearly in rows (dedup: in candidate
pairs). Superlinear time here means a plan that will not survive
100 TB.

Usage: python tools/scale_probe.py [sf_dir] [factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from vsphere_event_streaming_spark.functions.dedup import (  # noqa: E402
    containment_pairs,
    containment_pairs_pruned,
    contamination_report,
    exact_dedup_keepers,
    jaccard_pairs,
    jaccard_pairs_pruned,
    lsh_candidate_pairs,
    lsh_verified_pairs,
    release_cached,
)
from vsphere_event_streaming_spark.functions.sketches import (  # noqa: E402
    hll_cells,
    hll_estimates,
)
from vsphere_event_streaming_spark.functions.dedup import (  # noqa: E402
    repeated_spans,
)
from vsphere_event_streaming_spark.functions.multimodal import (  # noqa: E402
    phash_images,
    synth_cell_avi_payloads,
    synth_cell_jpeg_payloads,
    synth_cell_png_payloads,
    video_frame_hashes,
)
from vsphere_event_streaming_spark.functions.text import (  # noqa: E402
    bigram_lm_scores,
    boilerplate_scrub,
    hash_embed,
    importance_weights,
    md5_hash,
    pii_counts,
    repetition_profile,
)


def _shuffle_key():
    """q_training_shuffle's exact key: numeric 60-bit seed-keyed md5."""
    return md5_hash(F.concat(F.lit("epoch0:"), F.col("doc_id")))
from vsphere_event_streaming_spark.functions.vectors import (  # noqa: E402
    hyperplane_topk_probed,
    semantic_dedup,
)
from vsphere_event_streaming_spark.log.model import (  # noqa: E402
    assign_offsets,
    last_page,
)
from vsphere_event_streaming_spark.session import get_spark  # noqa: E402
from vsphere_event_streaming_spark.tables import load  # noqa: E402


def _replicate_docs(docs, factor: int, extra_cols: tuple[str, ...] = ()):
    n = docs.count()
    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
            *extra_cols,
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _replicate_embeddings(emb, factor: int, extra_cols: tuple[str, ...] = ()):
    """Key-shifted replicas with IDENTICAL vectors: every replica
    lands in its original's LSH bucket, so bucket populations grow by
    the full factor — the worst case for the bucket equi-join. Ids
    shift UPWARD so lowest-id seeds/queries are unchanged.
    ``extra_cols`` carries supervision (the trained-model probes pass
    ("label",)) — the _replicate_docs convention."""
    n = emb.count()
    copies = [
        emb.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            "embedding",
            *extra_cols,
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


#: Weights from every _classifier_shape training this process — the
#: 1x and 10x runs must all land here identical (asserted below).
_LOGREG_WEIGHTS: list[list[int]] = []


def _classifier_shape(emb):
    """q_quality_classifier's shape: the FULL 12-iteration quantized-GD
    training (12 driver-looped integer aggregates — the measured cost)
    followed by the codegen scoring pass. Identical replicas multiply
    every gradient sum by the factor k but the update divides by N
    (also ×k), and k·a/(k·b) is the same correctly-rounded double as
    a/b, so 10x rows trains the SAME weights (asserted) —
    per-iteration aggregate time is what must stay ~flat."""
    from vsphere_event_streaming_spark.functions.classifier import (
        logreg_score,
        train_logreg,
    )

    w = train_logreg(emb, iters=12, lr_num=3, lr_den=1, pos_weight=9)
    _LOGREG_WEIGHTS.append(w)
    assert all(x == _LOGREG_WEIGHTS[0] for x in _LOGREG_WEIGHTS), (
        "identical replicas must train identical weights"
    )
    return emb.select(
        "vec_id", logreg_score(F.col("embedding"), w).alias("p")
    )


#: Centroids from every _kmeans_shape training this process — 1x and
#: 10x must land identical: replicas scale each cluster's integer sum
#: AND count by the factor, and floor(k·s/(k·n)) == floor(s/n).
_KMEANS_CENTROIDS: list[list[list[int]]] = []


def _kmeans_shape(emb):
    """q_kmeans_cluster's shape: the FULL 4-iteration Lloyd's training
    (per iteration: broadcast-centroid argmin projection + ONE
    k·d-cell integer aggregate — the measured cost) followed by the
    literal-centroid assignment projection."""
    from vsphere_event_streaming_spark.functions.kmeans import (
        kmeans_assign,
        train_kmeans,
    )

    cm = train_kmeans(emb, k=8, iters=4, id_col="vec_id")
    _KMEANS_CENTROIDS.append(cm)
    assert all(c == _KMEANS_CENTROIDS[0] for c in _KMEANS_CENTROIDS), (
        "identical replicas must train identical centroids"
    )
    return emb.select(
        "vec_id", kmeans_assign(F.col("embedding"), cm).alias("cid")
    )


def _pca_shape(emb):
    """q_embed_pca's shape: quantized-Gram build (the upper-triangle
    integer aggregate over the slice-bounded posexplode^2 fan-out —
    d(d+1)/2 = 2,080 cells/row since r8, measured 1.4x faster than
    the full-d^2 fan it replaced) + driver power iteration + codegen
    projection."""
    from vsphere_event_streaming_spark.functions.classifier import (
        gram_micro,
        pca_project,
        power_iteration,
    )

    g = gram_micro(emb)
    d = 1 + max((i for i, _ in g), default=-1)
    v = power_iteration(g, d, iters=6)
    return emb.select(
        "vec_id", pca_project(F.col("embedding"), v).alias("pc1")
    )


def _hyperplane_probed_shape(emb):
    """q_knn_hyperplane_probed's plan shape (query = min vec_id)."""
    qmin = emb.agg(F.min("vec_id").alias("__qid"))
    qvec = emb.join(F.broadcast(qmin), emb.vec_id == F.col("__qid")).select(
        F.col("embedding").alias("q")
    )
    corpus = (
        emb.join(F.broadcast(qmin))
        .filter(F.col("vec_id") != F.col("__qid"))
        .drop("__qid")
    )
    return hyperplane_topk_probed(corpus, qvec, k=10, n_bits=6)


def _guarded_shape(docs):
    """q_pipeline_guarded's composed hygiene plan, parameterized on
    the document table (contamination anti-join → exact-dedup keeper
    semi-join → repetition gate → PII gate → per-lang stats)."""
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    contaminated = (
        contamination_report(docs, bench, threshold=0.5)
        .filter(F.col("contaminated") == 1)
        .select(F.col("id").alias("doc_id"))
    )
    keepers = exact_dedup_keepers(docs).select(
        F.col("keeper_id").alias("doc_id")
    )
    rep = repetition_profile(docs).select(
        F.col("id").alias("doc_id"), "n_words", "max_freq_ratio"
    )
    counts = pii_counts(F.col("text"))
    pii_total = counts["email"] + counts["phone"] + counts["ipv4"]
    return (
        docs.filter(pii_total == 0)
        .join(keepers, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .join(rep, "doc_id")
        .filter(F.col("max_freq_ratio") <= 0.2)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_tokens"),
        )
    )


def _replicate_events(ev, factor: int):
    n = ev.count()
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * n)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i} DAYS")).alias("ts"),
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _replicate_lineitem(li, factor: int):
    shift = li.agg(F.max("l_orderkey")).first()[0] + 1
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _cms_shape(docs):
    """q_sketch_cms's plan shape, inlined over the in-memory replicated
    frame (the query callable takes (spark, sf_dir)): vocabulary-bound
    sketch build + exact top-20 probe from one persisted word-count
    table."""
    from vsphere_event_streaming_spark.functions.dedup import _persist
    from vsphere_event_streaming_spark.functions.sketches import _bucket

    CMS_D, CMS_W = 4, 1024
    tok = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda w: w != "",
            )
        ).alias("token")
    )
    wc = _persist(
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_exact"))
    )
    cms = (
        wc.select(
            F.posexplode(
                F.array(
                    *[_bucket(F.col("token"), r, CMS_W) for r in range(CMS_D)]
                )
            ).alias("j", "bucket"),
            "n_exact",
        )
        .groupBy("j", "bucket")
        .agg(F.sum("n_exact").cast("long").alias("c"))
    )
    top = wc.orderBy(F.desc("n_exact"), "token").limit(20)
    probes = top.select(
        "token",
        "n_exact",
        F.posexplode(
            F.array(
                *[_bucket(F.col("token"), r, CMS_W) for r in range(CMS_D)]
            )
        ).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("token")
        .agg(F.first("n_exact").alias("n_exact"), F.min("c").alias("n_cms"))
    )


def _replicate_events_disjoint(ev, factor: int, span_days: int = 40):
    """Time-DISJOINT event replicas (each copy shifted past the prior
    copy's full span): event density per window stays constant, so a
    temporal self-join's true pair count scales ~linearly with rows —
    the honest probe for the binned range join. (The plain
    _replicate_events shifts copies by 1 day each, stacking them into
    the same month: density x factor -> pairs x factor^2, which would
    measure pair volume, not the join.)"""
    n = ev.count()
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * n)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i * span_days} DAYS")).alias(
                "ts"
            ),
            "event_type",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _binned_range_shape(ev):
    """q_join_range_binned's plan shape over an in-memory frame."""
    from vsphere_event_streaming_spark.operators.joins import (
        binned_range_join,
    )

    points = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("hit_type"),
    )
    intervals = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("window_type"),
    )
    return (
        binned_range_join(
            points,
            intervals,
            point_ts="b_ts",
            lo_ts="a_ts",
            hi_expr=F.col("a_ts") + F.expr("INTERVAL 10 MINUTE"),
            bin_seconds=600,
        )
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("window_type", "hit_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _tpch_q1_shape(li):
    dsum = lambda c, s=2: F.sum(  # noqa: E731
        F.col(c).cast(f"decimal(18,{s})")
    ).cast("double")
    return (
        li.filter(
            F.col("l_shipdate")
            <= F.lit("2000-12-01 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _media_pairs_shape(docs):
    """q_dedup_media's exact shape: real PNG roundtrip dHash into the
    56-bit (MEDIA_HASH_BITS) Hamming-banded pairing (persisted hash
    table, released by
    the caller's release_cached)."""
    from vsphere_event_streaming_spark.functions.dedup import (
        _persist,
        hamming_pairs,
    )
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        MEDIA_HASH_BITS,
        MEDIA_MAX_HAMMING,
    )

    ph = _persist(
        phash_images(synth_cell_png_payloads(docs, "doc_id", "text"))
    )
    return hamming_pairs(
        ph, "media_id", "phash", MEDIA_MAX_HAMMING, n_bits=MEDIA_HASH_BITS
    )


def _audio_pairs_shape(docs):
    """q_dedup_audio's exact shape: WAV roundtrip fingerprint into the
    56-bit banded pairing."""
    from vsphere_event_streaming_spark.functions.dedup import (
        _persist,
        hamming_pairs,
    )
    from vsphere_event_streaming_spark.functions.multimodal import (
        audio_fingerprints,
        synth_wav_payloads,
    )
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        AUDIO_HASH_BITS,
        AUDIO_MAX_HAMMING,
    )

    fp = _persist(
        audio_fingerprints(synth_wav_payloads(docs, "doc_id", "text"))
    )
    return hamming_pairs(
        fp, "media_id", "afp", AUDIO_MAX_HAMMING, n_bits=AUDIO_HASH_BITS
    )


def _video_pairs_shape(docs):
    """q_dedup_video's exact shape: AVI walk + per-frame JPEG decode
    into frame-aligned banding + all-frames verify."""
    from vsphere_event_streaming_spark.functions.dedup import (
        _persist,
        hamming_pairs_frames,
    )
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        MEDIA_HASH_BITS,
        VIDEO_MAX_HAMMING,
        VIDEO_SAMPLE_MS,
    )

    fh = _persist(
        video_frame_hashes(
            synth_cell_avi_payloads(docs, "doc_id", "text"),
            every_ms=VIDEO_SAMPLE_MS,
        )
    )
    return hamming_pairs_frames(
        fh, "media_id", "frame_idx", "phash", VIDEO_MAX_HAMMING,
        n_bits=MEDIA_HASH_BITS,
    )


def _bpe_shape(docs):
    """q_bpe_tokens' exact shape: train the merge table (12 merges on
    the word-frequency table), then count per-doc subword tokens."""
    from vsphere_event_streaming_spark.functions.bpe import (
        bpe_token_counts,
        learn_bpe,
        word_vocab,
    )

    merges = learn_bpe(word_vocab(docs))
    return bpe_token_counts(docs, merges)


def _markup_shape(docs):
    from vsphere_event_streaming_spark.functions.text import markup_profile

    return markup_profile(docs)


def _split_shape(docs):
    from vsphere_event_streaming_spark.functions.sampling import corpus_split

    return corpus_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}
    )


def _curriculum_shape(docs):
    """q_curriculum_order's exact shape: fixed-threshold quality stage
    + seed-keyed within-stage shuffle + the W1 two-phase rank."""
    from vsphere_event_streaming_spark.functions.text import quality_score
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        CURRICULUM_SEED,
        CURRICULUM_STAGES,
    )

    hi, mid, lo = CURRICULUM_STAGES
    q = quality_score(F.col("text"))
    staged = docs.select(
        "doc_id",
        F.when(q >= hi, 0)
        .when(q >= mid, 1)
        .when(q >= lo, 2)
        .otherwise(3)
        .cast("int")
        .alias("stage"),
        md5_hash(
            F.concat(F.lit(f"{CURRICULUM_SEED}:"), F.col("doc_id"))
        ).alias("skey"),
    )
    return assign_offsets(
        staged,
        order_by=["stage", "skey", "doc_id"],
        offset_col="curriculum_pos",
        start=0,
    )


def _ivf_stream_probe(
    spark, emb, tag: str, n_batches: int = 5, k: int = 10, nprobe: int = 3
) -> tuple[float, int]:
    """Streaming IVF parity probe (VERDICT_r5 #5, matching the L12 LSH
    probe's shape): ingest the corpus into a fresh IvfIndex in
    ``n_batches`` idempotent batches against FROZEN centroids, then
    search — asserting (a) exact parity with the inline ``ivf_topk``
    over the whole corpus (the streamed index must lose nothing) and
    (b) partition pruning (the probe reads only nprobe cells of every
    batch directory). Returns (elapsed_sec, corpus_rows); writes only
    under a throwaway temp dir."""
    import io
    import re
    import shutil
    import tempfile
    from contextlib import redirect_stdout

    from vsphere_event_streaming_spark.functions.kmeans import (
        kmeans_centroid_frame,
        train_kmeans,
    )
    from vsphere_event_streaming_spark.functions.vectors import (
        IvfIndex,
        ivf_topk,
    )

    qmin = emb.agg(F.min("vec_id").alias("__qid"))
    qvec = emb.join(F.broadcast(qmin), emb.vec_id == F.col("__qid")).select(
        F.col("embedding").alias("q")
    )
    corpus = (
        emb.join(F.broadcast(qmin))
        .filter(F.col("vec_id") != F.col("__qid"))
        .drop("__qid")
        .persist()
    )
    n = corpus.count()
    # trained cells (VERDICT_r7 #5), frozen before the timed ingest —
    # training cost is _kmeans_shape's own probe, not this one's
    cents = kmeans_centroid_frame(
        spark, train_kmeans(emb, k=8, iters=4)
    )
    path = tempfile.mkdtemp(prefix=f"ivf_probe_{tag}_")
    try:
        t0 = time.perf_counter()
        idx = IvfIndex(spark, path, cents)
        for b in range(n_batches):
            idx.add_batch(
                corpus.filter(F.col("vec_id") % n_batches == b), f"b{b}"
            )
        got_df = idx.search(qvec, k=k, nprobe=nprobe)
        got = [r["vec_id"] for r in got_df.collect()]
        elapsed = round(time.perf_counter() - t0, 2)
        inline = [
            r["vec_id"]
            for r in ivf_topk(corpus, cents, qvec, k=k, nprobe=nprobe).collect()
        ]
        assert got == inline, (
            f"streamed IVF search diverged from inline at {tag}: "
            f"{got} vs {inline}"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            got_df.explain()
        assert re.search(
            r"PartitionFilters: \[.*centroid_id#\d+ IN \(", buf.getvalue()
        ), f"IVF probe scan not partition-pruned at {tag}"
        return elapsed, n
    finally:
        corpus.unpersist()
        shutil.rmtree(path, ignore_errors=True)



def _auc_cum_shape(spark, n: int):
    """q_classifier_auc's scale-critical stage in isolation: the
    cumulative negatives-below count over an n-row DISTINCT-score
    table (r8, VERDICT_r7 #4). Replicated embeddings collapse to ONE
    distinct-score table (identical vectors -> identical scores), so
    this probe synthesizes the n-row table directly — exactly the
    input whose growth single-partitioned the old ``Window.orderBy``
    plan. The two-phase form (score-grid buckets, tiny cross-bucket
    prefix broadcast, bucket-partitioned window) must track n
    ~linearly."""
    from pyspark.sql import Window

    B = 128
    g = spark.range(0, n, 1, 32).select(
        (F.col("id").cast("double") / F.lit(float(n))).alias("s"),
        (F.col("id") % 3 == 0).cast("long").alias("cpos"),
        (F.col("id") % 3 != 0).cast("long").alias("cneg"),
    )
    gb = g.withColumn(
        "bkt",
        F.least(F.lit(B - 1), F.floor(F.col("s") * B)).cast("int"),
    )
    tiny = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        gb.groupBy(F.col("bkt").alias("__b"))
        .agg(F.sum("cneg").alias("__bneg"))
        .select(
            "__b",
            F.coalesce(F.sum("__bneg").over(tiny), F.lit(0)).alias("__base"),
        )
    )
    wb = (
        Window.partitionBy("bkt")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = (
        gb.withColumn(
            "__nb", F.coalesce(F.sum("cneg").over(wb), F.lit(0))
        )
        .join(F.broadcast(bases), F.col("bkt") == F.col("__b"))
        .select(
            "cpos",
            "cneg",
            (F.col("__base") + F.col("__nb")).alias("nb"),
        )
    )
    num2 = F.col("cpos") * 2 * F.col("nb") + F.col("cpos") * F.col("cneg")
    return c.agg(
        F.sum("cpos").alias("n_pos"),
        F.sum("cneg").alias("n_neg"),
        F.sum(num2).alias("auc_num2"),
    )


def _semantic_cells_shape(emb):
    """q_dedup_semantic_cells' shape (r9, corpus-scaled k): train the
    k = ceil(N/SEM_CELL_TARGET) cell model, assign (persisted once),
    pair within cells with the cosine verify inside the join. With k
    GROWING with the corpus (VERDICT_r8 #5), even the identical-
    replica worst case grows pairs ~linearly here: replicas of one
    vector must share a cell, but the replicated corpus also has 10x
    the rows, so 10x the cells keep average cell size flat (the
    recipe's knob working as published)."""
    from vsphere_event_streaming_spark.functions.dedup import _persist
    from vsphere_event_streaming_spark.functions.kmeans import (
        kmeans_assign,
        train_kmeans,
    )
    from vsphere_event_streaming_spark.functions.vectors import (
        SEMANTIC_THRESHOLD,
        cosine,
    )
    from vsphere_event_streaming_spark.queries.model_queries import _sem_k
    from vsphere_event_streaming_spark.tables import spread

    cm = train_kmeans(emb, k=_sem_k(emb.count()), iters=2)
    # spread before the argmin, mirroring the declared query: the 1x
    # input is a single-partition persisted frame and the k-literal
    # interpreted argmin must not serialize on one thread
    s = _persist(
        spread(emb).select(
            "vec_id",
            "embedding",
            kmeans_assign(F.col("embedding"), cm).alias("cid"),
        )
    )
    a = s.select(
        F.col("vec_id").alias("__ida"),
        F.col("embedding").alias("__va"),
        "cid",
    )
    b = s.select(
        F.col("vec_id").alias("__idb"),
        F.col("embedding").alias("__vb"),
        "cid",
    )
    red = (
        a.join(b, "cid")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(
            cosine(F.col("__va"), F.col("__vb"))
            >= F.lit(SEMANTIC_THRESHOLD)
        )
        .select(F.col("__idb").alias("vec_id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return s.join(red, "vec_id", "left").select(
        "vec_id",
        "cid",
        (~F.coalesce(F.col("__dup"), F.lit(False))).alias("kept"),
    )


def _semantic_white_shape(emb):
    """q_dedup_semantic_white's shape (r10): trained corpus-scaled
    cells block candidates, min-id dominance over the PCA-WHITENED
    projections. Identical replicas pack exact-dup cliques into
    cells, so candidate pairs grow ~factor^2 (time tracks pairs —
    the flat-cost knob is the corpus-scaled k, probed separately by
    semantic_cells_scaled_k; whitening adds one trained projection
    per row, rows-linear)."""
    from vsphere_event_streaming_spark.functions.classifier import (
        gram_micro,
        pca_topm_ordered,
        whiten_columns,
    )
    from vsphere_event_streaming_spark.functions.dedup import _persist
    from vsphere_event_streaming_spark.functions.kmeans import (
        kmeans_assign,
        train_kmeans,
    )
    from vsphere_event_streaming_spark.functions.vectors import cosine
    from vsphere_event_streaming_spark.queries.model_queries import (
        PCA_ITERS,
        PCA_TOPM,
        _sem_k,
    )
    from vsphere_event_streaming_spark.queries.model_queries import (
        WHITE_SEMANTIC_THRESHOLD,
    )
    from vsphere_event_streaming_spark.tables import spread

    n = emb.count()
    cm = train_kmeans(emb, k=_sem_k(n), iters=2)
    g = gram_micro(emb)
    d = 1 + max(i for i, _ in g)
    comps, lams = pca_topm_ordered(g, d, iters=PCA_ITERS, m=PCA_TOPM)
    s = _persist(
        spread(emb).select(
            "vec_id",
            kmeans_assign(F.col("embedding"), cm).alias("cid"),
            F.array(
                *whiten_columns(F.col("embedding"), comps, lams, n)
            ).alias("wv"),
        )
    )
    a = s.select(
        F.col("vec_id").alias("__ida"), F.col("wv").alias("__wa"), "cid"
    )
    b = s.select(
        F.col("vec_id").alias("__idb"), F.col("wv").alias("__wb"), "cid"
    )
    red = (
        a.join(b, "cid")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(
            cosine(F.col("__wa"), F.col("__wb"))
            >= F.lit(WHITE_SEMANTIC_THRESHOLD)
        )
        .select(F.col("__idb").alias("vec_id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return s.join(red, "vec_id", "left").select(
        "vec_id",
        "cid",
        (~F.coalesce(F.col("__dup"), F.lit(False))).alias("kept"),
    )


def _knn_classify_shape(emb):
    """q_knn_classify's shape (r10): sign-LSH bucket self-join,
    PARTITIONED neighbor-rank window, vote aggregate. Replicas share
    buckets, so bucket populations grow by the full factor and pair
    rows ~factor^2 — the documented L9 bucket-bounded posture (at
    scale, bucket width is the recall/cost knob)."""
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        q_knn_classify,
    )

    # reuse the declared query's machinery over an in-memory frame by
    # writing through the same expressions inline (the query reads a
    # table; this shape mirrors its plan on the replicated frame)
    from pyspark.sql import Window

    from vsphere_event_streaming_spark.functions.dedup import _persist
    from vsphere_event_streaming_spark.functions.vectors import (
        cosine,
        dot,
        hyperplane_sig,
    )
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        KNN_CLASSIFY_K,
    )
    from vsphere_event_streaming_spark.tables import spread

    s = _persist(
        spread(emb).select(
            "vec_id",
            (F.col("vec_id") % 4).cast("long").alias("label"),
            "embedding",
            hyperplane_sig(F.col("embedding"), 6).alias("sig"),
        )
    )
    a = s.select(
        F.col("vec_id").alias("__ida"),
        F.col("embedding").alias("__va"),
        "sig",
    )
    b = s.select(
        F.col("vec_id").alias("__idb"),
        F.col("label").alias("nlabel"),
        F.col("embedding").alias("__vb"),
        "sig",
    )
    gcos = F.when(
        (dot(F.col("__va"), F.col("__va")) > 0)
        & (dot(F.col("__vb"), F.col("__vb")) > 0),
        cosine(F.col("__va"), F.col("__vb")),
    ).otherwise(F.lit(-1.0))
    w_nb = Window.partitionBy("__ida").orderBy(gcos.desc(), F.col("__idb"))
    votes = (
        a.join(b, "sig")
        .filter(F.col("__ida") != F.col("__idb"))
        .withColumn("rn", F.row_number().over(w_nb))
        .filter(F.col("rn") <= KNN_CLASSIFY_K)
        .groupBy("__ida", "nlabel")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_pr = Window.partitionBy("__ida").orderBy(
        F.col("cnt").desc(), F.col("nlabel")
    )
    return votes.withColumn("pr", F.row_number().over(w_pr)).filter(
        F.col("pr") == 1
    )


def _novelty_shape(docs):
    """q_ngram_novelty's shape: shared shingle arrays -> ONE df hash
    aggregate -> shingle-key join -> per-doc aggregate. Identical
    replicas share every shingle, so the df join fans out ~factor per
    shingle occurrence (rows grow by the factor; the join carries
    (doc, shingle) pairs either way) — time should track rows
    ~linearly, never pairs-quadratically (no pairwise work exists in
    the plan)."""
    from vsphere_event_streaming_spark.functions.dedup import (
        shingle_hash_arrays,
    )

    sha = shingle_hash_arrays(docs)
    ex = sha.select(
        F.col("id").alias("doc_id"), F.explode("sh_arr").alias("sh")
    )
    dfc = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    return (
        ex.join(dfc, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_novel"),
        )
    )


#: Train-once PQ codebooks for the probe (keyed by frame identity —
#: the probe trains on the 1x corpus and serves both sizes with the
#: SAME books, the production train-once/serve-many configuration).
_PQ_PROBE_BOOKS: dict[int, list] = {}


def _pq_books(emb):
    from vsphere_event_streaming_spark.functions.vectors import pq_fit

    key = id(emb)
    books = _PQ_PROBE_BOOKS.get(key)
    if books is None:
        books = pq_fit(emb)
        _PQ_PROBE_BOOKS[key] = books
    return books


def _pq_adc_shape(emb, books):
    """q_knn_pq's serve shape under FIXED trained codebooks: Arrow
    encode + ADC over every row into a shortlist heap, then the exact
    rerank of the shortlist only. Rows-linear by construction (no
    join fans out, no pairwise stage); the rerank cost is constant
    (PQ_SHORTLIST rows) regardless of corpus size."""
    from vsphere_event_streaming_spark.functions.vectors import (
        min_id_query_split,
        pq_topk_rerank,
    )

    qvec, corpus = min_id_query_split(emb)
    return pq_topk_rerank(corpus, qvec, books, 64, k=10)


def _recall_panel_shape(emb_panel, emb_corpus):
    """q_knn_recall's ground-truth side under a FIXED query panel
    (the production configuration — the panel is a query file, not a
    corpus sample): panel × corpus guarded-cosine pairs ranked by a
    window PARTITIONED per query. Pairs grow by the corpus factor
    only (the panel is pinned), so time must track rows ~linearly."""
    from pyspark.sql import Window

    from vsphere_event_streaming_spark.functions.vectors import (
        cosine,
        dot,
    )

    q = emb_panel.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qv")
    )
    c = emb_corpus.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("__cv")
    )
    gcos = F.when(
        (dot(F.col("__qv"), F.col("__qv")) > 0)
        & (dot(F.col("__cv"), F.col("__cv")) > 0),
        cosine(F.col("__cv"), F.col("__qv")),
    ).otherwise(F.lit(-1.0))
    w = Window.partitionBy("qid").orderBy(F.col("__gc").desc(), "cid")
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("__gc", gcos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "cid")
    )


def _sample_weighted_shape(docs):
    """q_sample_weighted's shape: one codegen transform+array_max per
    row (O(Σ min(tokens, cap)) draws — the cost of one tokenization
    pass) into a TakeOrdered heap. Rows-linear, shuffle-free."""
    from vsphere_event_streaming_spark.functions import text as T
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        ES_SEED,
        ES_WEIGHT_CAP,
        SAMPLE_ES_K,
    )

    t = docs.select(
        "doc_id",
        F.size(T.words(F.col("text"))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    draws = F.transform(
        F.sequence(
            F.lit(1).cast("long"),
            F.least(F.col("n_tokens"), F.lit(ES_WEIGHT_CAP).cast("long")),
        ),
        lambda i: T.md5_hash(
            F.concat(
                F.lit(f"{ES_SEED}:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                i.cast("string"),
            )
        ),
    )
    return (
        t.select("doc_id", "n_tokens", F.array_max(draws).alias("skey"))
        .orderBy(F.desc("skey"), "doc_id")
        .limit(SAMPLE_ES_K)
    )


def _replicate_events_users(ev, factor: int):
    """User-DISJOINT event replicas (each copy's user_ids offset past
    the prior copy's): per-user sequence lengths stay constant, user
    count scales by the factor — the honest probe for a per-user
    window (partitions multiply, partition size does not)."""
    n = ev.count()
    u = ev.agg(F.max("user_id")).first()[0] + 1
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * n)).alias("event_id"),
            (F.col("user_id") + F.lit(i * u)).alias("user_id"),
            "ts",
            "event_type",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _transitions_shape(ev):
    """q_events_transitions' shape: per-user lead window → pair count
    → totals broadcast back. Under user-disjoint replicas the window
    partition count scales, partition size does not — time must
    track rows ~linearly, never user-count-quadratically."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tc = (
        ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tt = tc.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return tc.join(F.broadcast(tt), "event_type").select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("tot").cast("double"), 6
        ).alias("p_next"),
    )


def _rate_anomaly_shape(ev):
    """q_events_anomaly's shape: ONE map-side-combined cell aggregate
    over the events (≤ types × buckets cells), a second tiny
    aggregate over the CELLS, broadcast back. Rows-linear scan; the
    joined/windowed state is cell-bounded regardless of row count."""
    from vsphere_event_streaming_spark.functions.sketches import (
        anomalies_from_cells,
        rate_cells,
    )

    return anomalies_from_cells(rate_cells(ev))


def _paths_shape(ev):
    """q_events_paths' shape: sessionize (lag + running sum) then two
    leads within (user, session), one count over ≤types³ path groups.
    Under user-disjoint replicas both window layers multiply
    PARTITIONS, not partition size — time must track rows ~linearly."""
    from pyspark.sql import Window

    from vsphere_event_streaming_spark.queries.streaming_queries import (
        _PATH_GAP_US,
    )

    e = ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flag = F.when(us - F.lag(us).over(w) > _PATH_GAP_US, 1).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(flag)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_id"),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    tri = sess.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        tri.select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _bloom_shape(docs):
    """q_bloom_contamination's shape: shingle arrays persist once, the
    bench bits table stays ≤ m rows NO MATTER the corpus (the
    broadcast-constant claim), the probe is h chained broadcast hash
    joins + one per-doc aggregate — rows-linear, zero corpus-side
    shuffle before the final count."""
    from vsphere_event_streaming_spark.functions.dedup import (
        shingle_hash_arrays,
    )
    from vsphere_event_streaming_spark.functions.sketches import (
        bloom_bits,
        bloom_membership,
    )

    arrs = shingle_hash_arrays(docs)
    bench_sh = (
        arrs.filter(F.col("id") % 50 == 0)
        .select(F.explode("sh_arr").alias("sh"))
        .distinct()
    )
    bits = bloom_bits(bench_sh, "sh")
    sh = arrs.select("id", F.explode("sh_arr").alias("sh"))
    return (
        bloom_membership(bits, sh, "sh")
        .filter(F.col("bloom_hit"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
    )


def _zipf_shape(docs):
    """q_corpus_zipf's shape: vocab aggregate → W1 two-phase rank →
    one regression aggregate. Doc replicas multiply token counts, not
    vocabulary — time must track the token scan, never vocab²."""
    from vsphere_event_streaming_spark.log.model import assign_offsets

    tok = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda w: w != "",
            )
        ).alias("token")
    )
    wc = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    rk = assign_offsets(
        wc.withColumn("__negn", -F.col("n")),
        order_by=["__negn", "token"],
        offset_col="r",
        start=1,
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("n").cast("double"))
    return rk.agg(
        F.sum(x * y).alias("sxy"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.count(F.lit(1)).alias("v"),
    )


def _split_leakage_shape(docs):
    """q_split_leakage's shape: split projection + the contamination
    semi-join pointed at the split (eval side vs distinct train
    shingles). Near-dup replicas grow BOTH sides 10x — the semi-join
    carries int64 (id, sh) rows, so time must track the shingle scan,
    rows-linear, never eval x train."""
    from vsphere_event_streaming_spark.functions.sampling import (
        corpus_split,
    )
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        SPLIT_FRACTIONS,
        SPLIT_LEAK_THRESHOLD,
        SPLIT_SEED,
    )

    d = corpus_split(docs, SPLIT_FRACTIONS, seed=SPLIT_SEED)
    return contamination_report(
        d.filter(F.col("split") != "train"),
        d.filter(F.col("split") == "train"),
        threshold=SPLIT_LEAK_THRESHOLD,
    )


def _sample_exact_k_shape(docs):
    """q_sample_exact_k's shape: seeded-key projection into ONE
    TakeOrderedAndProject heap (constant K) — a rows-linear scan with
    constant output; no shuffle, no window."""
    from vsphere_event_streaming_spark.functions.sampling import (
        keep_bucket,
    )
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        SAMPLE_EXACT_K,
        SAMPLE_EXACT_SEED,
    )

    return (
        docs.select(
            "doc_id",
            keep_bucket(F.col("doc_id"), SAMPLE_EXACT_SEED)
            .cast("bigint")
            .alias("skey"),
        )
        .orderBy("skey", "doc_id")
        .limit(SAMPLE_EXACT_K)
    )


def _len_histogram_shape(docs):
    """q_len_histogram's shape: tokenize-and-measure projection into
    ONE map-side-combined aggregate over <= langs x ~20 cells; the
    share window runs on the cell table. Replicas multiply docs, not
    cells — time must track the token scan."""
    from vsphere_event_streaming_spark.functions.text import words

    n_tok = F.size(words(F.col("text"))).cast("bigint")
    return (
        docs.select(
            "lang",
            (
                F.length(F.bin(F.greatest(n_tok, F.lit(1))))
                .cast("bigint")
                - 1
            ).alias("len_bucket"),
            n_tok.alias("n_tokens"),
        )
        .groupBy("lang", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bucket_tokens"),
        )
    )


def _seasonality_shape(ev):
    """q_events_seasonality's shape: one hash aggregate to
    <= types x 24 cells (+ a cell-table share window) — rows-linear
    over events, cell count invariant under replication."""
    us = F.unix_micros(F.col("ts"))
    return (
        ev.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            (F.floor(us / F.lit(3.6e9)).cast("bigint") % 24).alias(
                "hour_of_day"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _chunk_pool_shape(docs):
    """q_chunk_pool_fidelity's shape: one persisted projection (both
    word arrays, chunk side in-row — no explode of chunk text), two
    hash aggregates, a doc-keyed join. Rows-linear; the fan-out is
    words x ~1.33 overlap, never chunks x corpus."""
    from vsphere_event_streaming_spark.functions.text import words
    from vsphere_event_streaming_spark.functions.vectors import cosine, dot
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        HASH_EMBED_DIM,
        POOL_CHUNK_OVERLAP,
        POOL_CHUNK_SIZE,
        POOL_CHUNK_STRIDE,
    )

    bound = F.greatest(F.length("text") - POOL_CHUNK_OVERLAP, F.lit(1))
    starts = F.sequence(F.lit(0), bound - 1, F.lit(POOL_CHUNK_STRIDE))
    cw = F.flatten(
        F.transform(
            starts,
            lambda s: words(
                F.substring(F.col("text"), s + 1, POOL_CHUNK_SIZE)
            ),
        )
    )
    shared = docs.select(
        "doc_id",
        words(F.col("text")).alias("__dw"),
        cw.alias("__cw"),
        F.size(starts).cast("bigint").alias("n_chunks"),
    ).persist()
    demb = hash_embed(shared, HASH_EMBED_DIM, words_col="__dw")
    cemb = hash_embed(
        shared, HASH_EMBED_DIM, words_col="__cw"
    ).withColumnRenamed("embedding", "cembedding")
    g = F.when(
        (dot(F.col("embedding"), F.col("embedding")) > 0)
        & (dot(F.col("cembedding"), F.col("cembedding")) > 0),
        F.round(cosine(F.col("embedding"), F.col("cembedding")), 6),
    ).otherwise(F.lit(-1.0))
    return (
        demb.join(cemb, "doc_id")
        .join(shared.select("doc_id", "n_chunks"), "doc_id")
        .select("doc_id", "n_chunks", g.alias("pool_cos"))
    )


def _cooccurrence_shape(ev):
    """q_events_cooccurrence's shape: DISTINCT (user, type) first,
    user-keyed pair join (<= types^2 pairs per user), broadcast type
    counts. User-disjoint replicas multiply users — pairs grow
    linearly in users, never event-quadratic."""
    ut = (
        ev.filter(
            F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
        )
        .select("user_id", "event_type")
        .distinct()
    )
    a = ut.withColumnRenamed("event_type", "type_a")
    b = ut.withColumnRenamed("event_type", "type_b")
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )


def _burstiness_shape(ev):
    """q_events_burstiness' shape: two chained cell aggregates
    (types x days, then types) — rows-linear event scan into
    bounded cells."""
    us = F.unix_micros(F.col("ts"))
    dc = (
        ev.filter(
            F.col("ts").isNotNull() & F.col("event_type").isNotNull()
        )
        .groupBy(
            "event_type",
            F.floor(us / F.lit(86.4e9)).cast("bigint").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return dc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )


def _stickiness_shape(ev):
    """q_events_stickiness' shape: distinct activity pass + two hash
    aggregates + a ≤days-row join. User-disjoint replicas multiply
    users; day count is fixed — cells grow linearly, never user²."""
    from vsphere_event_streaming_spark.functions.sketches import (
        activity_days,
        stickiness_from_days,
    )

    return stickiness_from_days(activity_days(ev))


def _matryoshka_shape(emb):
    """q_knn_matryoshka's shape: prefix-cosine TakeOrdered shortlist +
    full-dim broadcast rerank — two rows-linear scans, no shuffle of
    the corpus side."""
    from vsphere_event_streaming_spark.functions.vectors import (
        cosine,
        dot,
        knn_topk,
        min_id_query_split,
    )

    qvec, corpus = min_id_query_split(emb)
    pv = F.slice(F.col("embedding"), 1, 32)
    pq = F.slice(F.col("q"), 1, 32)
    ps = F.when(
        (dot(pv, pv) > 0) & (dot(pq, pq) > 0), cosine(pv, pq)
    ).otherwise(F.lit(-1.0))
    short = (
        corpus.join(F.broadcast(qvec))
        .select("vec_id", ps.alias("__ps"))
        .orderBy(F.col("__ps").desc(), "vec_id")
        .limit(100)
        .select("vec_id")
    )
    cand = corpus.join(F.broadcast(short), "vec_id", "left_semi")
    return knn_topk(cand, qvec, k=10)


def _sem_scaled_pairs(spark, n: int) -> tuple[float, int, int]:
    """(elapsed, k, candidate_pairs) for the corpus-scaled SemDeDup
    cell model over n DISTINCT synthetic vectors (pseudorandom sine
    scatter, so the lowest-id seeds are effectively random points).
    candidate_pairs is the cell self-join's exact work; with
    k = ceil(n/SEM_CELL_TARGET) it grows ~linearly in n."""
    from vsphere_event_streaming_spark.functions.kmeans import (
        kmeans_assign,
        train_kmeans,
    )
    from vsphere_event_streaming_spark.queries.model_queries import _sem_k

    t0 = time.perf_counter()
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    F.sin(
                        F.col("id") * F.lit(12.9898 + 7.13 * d)
                        + F.lit(d)
                    )
                    for d in range(8)
                ]
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    base.count()
    k = _sem_k(n)
    cm = train_kmeans(base, k=k, iters=2)
    sizes = base.select(
        kmeans_assign(F.col("embedding"), cm).alias("cid")
    ).groupBy("cid").count()
    pairs = int(
        sizes.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2)
        ).collect()[0][0]
    )
    base.unpersist()
    return round(time.perf_counter() - t0, 2), k, pairs


def _entropy_shape(docs):
    """q_quality_entropy's plan: (doc, char) hash aggregate + the
    char-ordered per-doc fold."""
    ex = docs.select(
        "doc_id",
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), "")
        ).alias("c"),
    ).filter(F.col("c") != "")
    return (
        ex.groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n"),
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("c", "cnt"))),
                    lambda s: s.cnt.cast("double")
                    * F.log2(s.cnt.cast("double")),
                ),
                F.lit(0.0).cast("double"),
                lambda a, x: a + x,
            ).alias("sc"),
        )
    )


def _keep_list_shape(docs):
    """q_dedup_keep_list's plan: pairs -> CC labels -> one
    labels-sized left join back to doc ids."""
    from vsphere_event_streaming_spark.operators.graph import dedup_groups

    gl = dedup_groups(jaccard_pairs(docs, 0.5))
    return docs.select("doc_id").join(gl, "doc_id", "left")


def _hll_shape(ev):
    """q_sketch_hll's register plan: one map-side-combined aggregate
    into <= 256 register cells per day + the per-day estimate."""
    base = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0))
        .cast("long")
        .alias("d"),
        "user_id",
    )
    return hll_estimates(hll_cells(base, "user_id", ["d"]), ["d"])


def _time(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    df = fn()
    n = df.count() if hasattr(df, "count") else 0
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load(spark, sf_dir, "documents").select("doc_id", "text")
    docsN = _replicate_docs(docs1, factor).persist()
    docsN.count()
    ev1 = load(spark, sf_dir, "events").select("event_id", "ts")
    evN = _replicate_events(ev1, factor).persist()
    evN.count()
    evt1 = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    evtN = _replicate_events_disjoint(evt1, factor).persist()
    evtN.count()
    evu1 = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    evuN = _replicate_events_users(evu1, factor).persist()
    evuN.count()
    li1 = load(spark, sf_dir, "lineitem")
    liN = _replicate_lineitem(li1, factor).persist()
    liN.count()
    emb1 = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    embN = _replicate_embeddings(emb1, factor).persist()
    embN.count()
    # SPARK_GRAFT_PROBE_ONLY=a,b runs a subset (the bench's
    # SPARK_GRAFT_BENCH_ONLY convention) — new probes shouldn't cost
    # a full sweep to validate.
    only_env = os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").strip()
    only = {t.strip() for t in only_env.split(",") if t.strip()}

    model_probes = {"logreg_train_score", "pca_gram_project"}
    if not only or only & model_probes:
        embL1 = load(spark, sf_dir, "embeddings")
        embLN = _replicate_embeddings(
            embL1, factor, extra_cols=("label",)
        ).persist()
        embLN.count()
    docs1g = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    docsNg = _replicate_docs(docs1g, factor, extra_cols=("lang",)).persist()
    docsNg.count()

    # pre-train the PQ probe codebooks OUTSIDE any timed lambda (the
    # production train-once/serve-many split — both probe sizes serve
    # with the same 1x-trained books)
    if not only or "pq_adc_rerank" in only:
        _pq_books(emb1)

    results = {}
    for name, one, many in [
        (
            "jaccard_pairs",
            lambda: jaccard_pairs(docs1, 0.5),
            lambda: jaccard_pairs(docsN, 0.5),
        ),
        (
            "lsh_candidate_pairs",
            lambda: lsh_candidate_pairs(docs1),
            lambda: lsh_candidate_pairs(docsN),
        ),
        (
            # the canonical 100 TB near-dup pipeline: LSH candidates →
            # exact re-score of candidates only
            "lsh_verified_pairs",
            lambda: lsh_verified_pairs(docs1, threshold=0.5),
            lambda: lsh_verified_pairs(docsN, threshold=0.5),
        ),
        (
            # stop-shingle-pruned exact Jaccard (df-capped join)
            "jaccard_pairs_pruned",
            lambda: jaccard_pairs_pruned(docs1, 0.5, max_doc_freq=100),
            lambda: jaccard_pairs_pruned(docsN, 0.5, max_doc_freq=100),
        ),
        (
            # benchmark-contamination semi-join (hygiene tier)
            "contamination_report",
            lambda: contamination_report(
                docs1, docs1.filter(F.col("doc_id") % 50 == 0), 0.5
            ),
            lambda: contamination_report(
                docsN, docsN.filter(F.col("doc_id") % 50 == 0), 0.5
            ),
        ),
        (
            # sign-LSH ANN with Hamming-1 multiprobe (replicas share
            # buckets → bucket populations grow by the full factor)
            "hyperplane_topk_probed",
            lambda: _hyperplane_probed_shape(emb1),
            lambda: _hyperplane_probed_shape(embN),
        ),
        (
            # the composed hygiene pipeline (one Catalyst plan)
            "pipeline_guarded",
            lambda: _guarded_shape(docs1g),
            lambda: _guarded_shape(docsNg),
        ),
        (
            # segment-level boilerplate scrub: replicas share every
            # segment, so the boiler set saturates — worst case for
            # the flag join
            "boilerplate_scrub",
            lambda: boilerplate_scrub(docs1),
            lambda: boilerplate_scrub(docsN),
        ),
        (
            # bigram-LM scoring: count-table joins over per-doc
            # distinct bigrams
            "bigram_lm_scores",
            lambda: bigram_lm_scores(docs1),
            lambda: bigram_lm_scores(docsN),
        ),
        (
            # DSIR importance weights (lang-keyed target here: the
            # replica frame carries lang, not source)
            "importance_weights",
            lambda: importance_weights(
                docs1g, "en", source_col="lang"
            ),
            lambda: importance_weights(
                docsNg, "en", source_col="lang"
            ),
        ),
        (
            # repeated spans: replicas are near-dups sharing their
            # full text, so true span count grows ~quadratically in
            # replicas (45 pair-combinations per base doc) — time
            # must track output pairs, not explode past them
            "repeated_spans",
            lambda: repeated_spans(docs1),
            lambda: repeated_spans(docsN),
        ),
        (
            # semantic dedup: identical replica vectors share buckets,
            # so within-bucket pairs grow by factor^2 — the documented
            # bound (raise n_bits with corpus size); time must track
            # the pair count
            "semantic_dedup",
            lambda: semantic_dedup(emb1),
            lambda: semantic_dedup(embN),
        ),
        (
            # feature-hashing embedding: explode + two hash aggregates
            "hash_embed",
            lambda: hash_embed(docs1),
            lambda: hash_embed(docsN),
        ),
        (
            # perceptual hash: PNG encode -> decode -> dHash, two
            # Arrow map stages, no shuffle
            "phash_images",
            lambda: phash_images(
                synth_cell_png_payloads(docs1, "doc_id", "text")
            ),
            lambda: phash_images(
                synth_cell_png_payloads(docsN, "doc_id", "text")
            ),
        ),
        (
            # JPEG gate: baseline encode -> full T.81 decode -> dHash,
            # same two-Arrow-map no-shuffle shape as the PNG gate but
            # with the entropy-coding + IDCT cost per doc
            "phash_images_jpeg",
            lambda: phash_images(
                synth_cell_jpeg_payloads(docs1, "doc_id", "text"),
                quantize_step=16,
            ),
            lambda: phash_images(
                synth_cell_jpeg_payloads(docsN, "doc_id", "text"),
                quantize_step=16,
            ),
        ),
        (
            # video tier: AVI container build (5 JPEG frames) -> walk
            # -> sample -> decode 3 frames per clip
            "video_frame_hashes",
            lambda: video_frame_hashes(
                synth_cell_avi_payloads(docs1, "doc_id", "text"),
                every_ms=200,
            ),
            lambda: video_frame_hashes(
                synth_cell_avi_payloads(docsN, "doc_id", "text"),
                every_ms=200,
            ),
        ),
        (
            # reproducible training shuffle: the W1 two-phase rank on
            # the SAME numeric 60-bit seed-keyed md5 the query uses
            # (string md5 keys would measure a different shuffle
            # weight); replica doc_ids are distinct so the order key
            # is unique like the query's
            "training_shuffle",
            lambda: assign_offsets(
                docs1.select("doc_id", _shuffle_key().alias("skey")),
                order_by=["skey", "doc_id"],
                offset_col="shuffle_pos",
                start=0,
            ),
            lambda: assign_offsets(
                docsN.select("doc_id", _shuffle_key().alias("skey")),
                order_by=["skey", "doc_id"],
                offset_col="shuffle_pos",
                start=0,
            ),
        ),
        (
            # pure range join, binned: time-disjoint replicas keep
            # per-window density constant -> true pairs ~x10 at x10
            # rows; time must track rows, never rows^2
            "binned_range_join",
            lambda: _binned_range_shape(evt1),
            lambda: _binned_range_shape(evtN),
        ),
        (
            "assign_offsets",
            lambda: assign_offsets(ev1, order_by=["ts", "event_id"]),
            lambda: assign_offsets(evN, order_by=["ts", "event_id"]),
        ),
        (
            "last_page",
            lambda: last_page(ev1, 50, "event_id"),
            lambda: last_page(evN, 50, "event_id"),
        ),
        (
            # CMS: the bucket explode is vocabulary-bound — replicas
            # share one vocabulary, so 10x tokens ~ same sketch-build
            # fan-out; time must track the token-count pass, not 10x it
            "sketch_cms",
            lambda: _cms_shape(docs1),
            lambda: _cms_shape(docsN),
        ),
        (
            "tpch_q1_agg",
            lambda: _tpch_q1_shape(li1),
            lambda: _tpch_q1_shape(liN),
        ),
        # r6 (VERDICT_r5 #6): the three r5-new oracled ops without a
        # probe line — all shuffle-free projections except the rank's
        # single range exchange; time must track rows ~linearly
        (
            "markup_profile",
            lambda: _markup_shape(docs1),
            lambda: _markup_shape(docsN),
        ),
        (
            "corpus_split",
            lambda: _split_shape(docs1),
            lambda: _split_shape(docsN),
        ),
        (
            "curriculum_order",
            lambda: _curriculum_shape(docs1),
            lambda: _curriculum_shape(docsN),
        ),
        # r9: n-gram novelty — the one-number-per-doc complement of
        # the dedup tier; the df join fans out linearly in rows (no
        # pairwise stage exists), so 10x docs must be ~10x time or
        # better, never quadratic
        (
            "ngram_novelty",
            lambda: _novelty_shape(docs1),
            lambda: _novelty_shape(docsN),
        ),
        # r6 (VERDICT_r5 #3 follow-through): media near-dup pairing —
        # replicas are near-dup texts, so dHashes mostly differ by a
        # few cells; the banded join must track candidates, not rows²
        (
            "media_hamming_pairs",
            lambda: _media_pairs_shape(docs1),
            lambda: _media_pairs_shape(docsN),
        ),
        (
            "audio_hamming_pairs",
            lambda: _audio_pairs_shape(docs1),
            lambda: _audio_pairs_shape(docsN),
        ),
        (
            "video_hamming_pairs",
            lambda: _video_pairs_shape(docs1),
            lambda: _video_pairs_shape(docsN),
        ),
        # r6: trained-merge BPE — training on the vocabulary-bounded
        # word-frequency table (replicas share one vocabulary, so 10x
        # docs ~ same per-merge aggregate) + broadcast-join application
        (
            "bpe_tokens",
            lambda: _bpe_shape(docs1),
            lambda: _bpe_shape(docsN),
        ),
        # r7: trained-model tier — training passes are integer
        # aggregates whose per-iteration cost must track rows
        # ~linearly (locally the scheduler floor dominates, so the
        # ratio should sit near 1); the Gram build fans out d^2
        # cells/row and is the real 10x load
        (
            "logreg_train_score",
            lambda: _classifier_shape(embL1),
            lambda: _classifier_shape(embLN),
        ),
        (
            "pca_gram_project",
            lambda: _pca_shape(embL1),
            lambda: _pca_shape(embLN),
        ),
        # r7: trained k-means — per-iteration cost is the argmin
        # projection (rows-linear) + a k·d-cell aggregate; replica
        # ids offset upward so the lowest-id seeds are unchanged and
        # the 10x centroids must be bit-identical (asserted)
        (
            "kmeans_train_assign",
            lambda: _kmeans_shape(emb1),
            lambda: _kmeans_shape(embN),
        ),
        # r8: the exact-AUC cumulative over the distinct-score table —
        # the stage the old unpartitioned window single-tasked; the
        # two-phase form must track the table size ~linearly
        (
            "auc_rank_sum_cum",
            lambda: _auc_cum_shape(spark, 200_000),
            lambda: _auc_cum_shape(spark, 2_000_000),
        ),
        # r8: SemDeDup over trained cells — identical replicas pack
        # exact-dup cliques into cells, so candidate pairs grow
        # ~factor^2 (time tracks pairs; the published recipe's knob
        # is growing SEM_K with the corpus)
        (
            "semantic_cells",
            lambda: _semantic_cells_shape(emb1),
            lambda: _semantic_cells_shape(embN),
        ),
        # r10: whitened-space SemDeDup — same cell-blocked pair
        # posture as semantic_cells plus one trained whitening
        # projection per row (rows-linear)
        (
            "semantic_white",
            lambda: _semantic_white_shape(emb1),
            lambda: _semantic_white_shape(embN),
        ),
        # r10: kNN pseudo-labeling — bucket-bounded pairs (replicas
        # share buckets: pair rows ~factor^2, the L9 posture)
        (
            "knn_classify",
            lambda: _knn_classify_shape(emb1),
            lambda: _knn_classify_shape(embN),
        ),
        # r10 second wave: PQ serve under FIXED codebooks (trained
        # once below, outside both timings) — Arrow encode+ADC is
        # rows-linear, the rerank constant (PQ_SHORTLIST rows)
        (
            "pq_adc_rerank",
            lambda: _pq_adc_shape(emb1, _pq_books(emb1)),
            lambda: _pq_adc_shape(embN, _pq_books(emb1)),
        ),
        # r10: ANN recall harness under a FIXED query panel — pairs
        # grow by the corpus factor only, never panel x corpus^2
        (
            "knn_recall_panel",
            lambda: _recall_panel_shape(emb1, emb1),
            lambda: _recall_panel_shape(emb1, embN),
        ),
        # r10: ES weighted sampling — one transform+array_max per
        # row into a heap; rows-linear, shuffle-free
        (
            "sample_weighted",
            lambda: _sample_weighted_shape(docs1),
            lambda: _sample_weighted_shape(docsN),
        ),
        # r10: event-rate anomaly — rows-linear scan into
        # cell-bounded state (disjoint replicas: 10x cells, fine)
        (
            "rate_anomaly",
            lambda: _rate_anomaly_shape(evt1),
            lambda: _rate_anomaly_shape(evtN),
        ),
        # r10: transition matrix — per-user lead window under
        # user-disjoint replicas (10x partitions, constant partition
        # size): rows-linear, never user-quadratic
        (
            "events_transitions",
            lambda: _transitions_shape(evu1),
            lambda: _transitions_shape(evuN),
        ),
        # r11: session paths — two per-user(-session) window layers
        # under user-disjoint replicas: rows-linear, never
        # user-quadratic
        (
            "events_paths",
            lambda: _paths_shape(evu1),
            lambda: _paths_shape(evuN),
        ),
        # r11: Bloom decontamination probe — bits table constant-size
        # broadcast at any corpus; probe rows-linear
        (
            "bloom_contamination",
            lambda: _bloom_shape(docs1),
            lambda: _bloom_shape(docsN),
        ),
        # r11: Zipf diagnostic — token scan + W1 rank over a
        # replica-invariant vocabulary: near-flat at 10x docs
        (
            "corpus_zipf",
            lambda: _zipf_shape(docs1),
            lambda: _zipf_shape(docsN),
        ),
        # r11: stickiness — activity cells grow with users, never
        # user-quadratic under user-disjoint replicas
        (
            "events_stickiness",
            lambda: _stickiness_shape(evu1),
            lambda: _stickiness_shape(evuN),
        ),
        # r11: Matryoshka ANN — two rows-linear scans (prefix
        # shortlist heap + rerank)
        (
            "knn_matryoshka",
            lambda: _matryoshka_shape(emb1),
            lambda: _matryoshka_shape(embN),
        ),
        # r12: split leakage — contamination semi-join over the split;
        # both sides 10x, int64 shingle rows only: rows-linear
        (
            "split_leakage",
            lambda: _split_leakage_shape(docs1),
            lambda: _split_leakage_shape(docsN),
        ),
        # r12: exact-K sample — rows-linear scan into a constant heap
        (
            "sample_exact_k",
            lambda: _sample_exact_k_shape(docs1),
            lambda: _sample_exact_k_shape(docsN),
        ),
        # r12: length histogram — token scan into lang x ~20 cells
        (
            "len_histogram",
            lambda: _len_histogram_shape(docs1g),
            lambda: _len_histogram_shape(docsNg),
        ),
        # r12: seasonality — event scan into types x 24 cells
        (
            "events_seasonality",
            lambda: _seasonality_shape(evt1),
            lambda: _seasonality_shape(evtN),
        ),
        # r12: chunk-pooling fidelity — shared scan + two hash
        # aggregates + doc-keyed join: rows-linear
        (
            "chunk_pool",
            lambda: _chunk_pool_shape(docs1),
            lambda: _chunk_pool_shape(docsN),
        ),
        # r12: co-occurrence — user-keyed pair join under
        # user-disjoint replicas: users-linear, never event-quadratic
        (
            "events_cooccurrence",
            lambda: _cooccurrence_shape(evu1),
            lambda: _cooccurrence_shape(evuN),
        ),
        # r12: burstiness — two chained cell aggregates
        (
            "events_burstiness",
            lambda: _burstiness_shape(evt1),
            lambda: _burstiness_shape(evtN),
        ),
        # r13: asymmetric containment — the L2 inverted-index shape;
        # like jaccard_pairs this is the oracle-tier baseline (pair
        # rows grow with shared-shingle k², the documented skew note)
        (
            "containment_pairs",
            lambda: containment_pairs(docs1, 0.9),
            lambda: containment_pairs(docsN, 0.9),
        ),
        # r13: pruned containment — the scale path: global df cap
        # bounds the join at df^2 rows per surviving shingle. The cap
        # scales with the corpus (5 -> 5*factor), the
        # semantic_cells_scaled_k precedent: replicas multiply every
        # df by the factor, so a FIXED cap prunes the whole corpus
        # (measured: rows_10x = 0) — df caps are corpus-relative
        # knobs by definition
        (
            "containment_pruned",
            lambda: containment_pairs_pruned(docs1, 0.9, 5),
            lambda: containment_pairs_pruned(docsN, 0.9, 5 * factor),
        ),
        # r13: character entropy — explode + (doc, char) aggregate +
        # per-doc fold over a <= alphabet-size array: rows-linear
        (
            "char_entropy",
            lambda: _entropy_shape(docs1),
            lambda: _entropy_shape(docsN),
        ),
        # r13: keep list — pairs -> CC labels -> labels-sized join;
        # CC cost tracks the EDGE table, not the corpus
        (
            "dedup_keep_list",
            lambda: _keep_list_shape(docs1),
            lambda: _keep_list_shape(docsN),
        ),
        # r13: HLL registers — one map-side-combined aggregate into
        # <= 256 cells/day however many users: rows-linear scan,
        # constant output
        (
            "hll_registers",
            lambda: _hll_shape(evu1),
            lambda: _hll_shape(evuN),
        ),
    ]:
        if only and name not in only:
            continue
        t1, n1 = _time(one)
        release_cached()  # dedup intermediates must not subsidize the Nx run
        tN, nN = _time(many)
        release_cached()
        results[name] = {
            "t_1x_sec": t1,
            f"t_{factor}x_sec": tN,
            "rows_1x": n1,
            f"rows_{factor}x": nN,
            "time_ratio": round(tN / t1, 1) if t1 else None,
        }
        print(json.dumps({name: results[name]}))

    # streaming IVF parity at 1x vs Nx (VERDICT_r5 #5): ingest in 5
    # batches + search, exact-parity and pruning asserted inside
    t1, n1 = _ivf_stream_probe(spark, emb1, "1x")
    tN, nN = _ivf_stream_probe(spark, embN, f"{factor}x")
    results["ivf_index_stream"] = {
        "t_1x_sec": t1,
        f"t_{factor}x_sec": tN,
        "rows_1x": n1,
        f"rows_{factor}x": nN,
        "time_ratio": round(tN / t1, 1) if t1 else None,
    }
    print(json.dumps({"ivf_index_stream": results["ivf_index_stream"]}))

    # r9 (VERDICT_r8 #5): per-cell pair cost under the CORPUS-SCALED
    # SemDeDup k on growing DISTINCT corpora — the flat-cost claim the
    # scaled knob exists for. Candidate pairs = sum_c c*(c-1)/2 over
    # the trained assignment; per-vector pairs must stay ~flat as N
    # grows 4x (a constant k would grow them ~4x).
    name = "semantic_cells_scaled_k"
    if not only or name in only:
        (tA, kA, pA), (tB, kB, pB) = (
            _sem_scaled_pairs(spark, 4000),
            _sem_scaled_pairs(spark, 16000),
        )
        per_a, per_b = pA / 4000, pB / 16000
        assert per_b <= 2.0 * per_a, (
            f"per-vector pair cost not flat under scaled k: "
            f"{per_a:.1f} -> {per_b:.1f}"
        )
        results[name] = {
            "n_small": 4000,
            "n_big": 16000,
            "k_small": kA,
            "k_big": kB,
            "pairs_small": pA,
            "pairs_big": pB,
            "pairs_per_vector_small": round(per_a, 1),
            "pairs_per_vector_big": round(per_b, 1),
            "t_small_sec": tA,
            "t_big_sec": tB,
        }
        print(json.dumps({name: results[name]}))

    print(json.dumps({"factor": factor, "sf_dir": sf_dir, "probe": results}))


if __name__ == "__main__":
    main()
