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
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from vsphere_event_streaming_spark.functions.dedup import (  # noqa: E402
    contamination_report,
    exact_dedup_keepers,
    jaccard_pairs,
    jaccard_pairs_pruned,
    lsh_candidate_pairs,
    lsh_verified_pairs,
    release_cached,
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


def _replicate_embeddings(emb, factor: int):
    """Key-shifted replicas with IDENTICAL vectors: every replica
    lands in its original's LSH bucket, so bucket populations grow by
    the full factor — the worst case for the bucket equi-join."""
    n = emb.count()
    copies = [
        emb.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            "embedding",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


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
    li1 = load(spark, sf_dir, "lineitem")
    liN = _replicate_lineitem(li1, factor).persist()
    liN.count()
    emb1 = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    embN = _replicate_embeddings(emb1, factor).persist()
    embN.count()
    docs1g = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    docsNg = _replicate_docs(docs1g, factor, extra_cols=("lang",)).persist()
    docsNg.count()

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
    ]:
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

    print(json.dumps({"factor": factor, "sf_dir": sf_dir, "probe": results}))


if __name__ == "__main__":
    main()
