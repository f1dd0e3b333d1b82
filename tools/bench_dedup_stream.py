"""Throughput of the streaming incremental near-dup pipeline.

Feeds the sf0.1 documents table to ``start_incremental_dedup`` in
``chunks`` file-batches (each micro-batch bands against the growing
index) and reports docs/sec through the full candidate-emit + index-
ingest path, plus the final candidate count.

Usage: python tools/bench_dedup_stream.py [sf_dir] [chunks]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from vsphere_event_streaming_spark.session import get_spark  # noqa: E402
from vsphere_event_streaming_spark.streaming.dedup_stream import (  # noqa: E402
    read_candidate_pairs,
    start_incremental_dedup,
)
from vsphere_event_streaming_spark.tables import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("bench-dedup-stream")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="dedup_stream_bench_")
    in_dir = f"{work}/in"
    try:
        # pre-write the chunk files; the stream discovers them all and
        # availableNow drains them as separate epochs when maxFilesPerTrigger=1
        for i in range(chunks):
            docs.filter((docs.doc_id % chunks) == i).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)

        t0 = time.perf_counter()
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        # reuse the library writer but with our throttled reader: the
        # foreachBatch body is identical, so time it via the public API
        # by monkey-free composition — start_incremental_dedup builds
        # its own reader, so drive the same epochs via chunks of files
        from vsphere_event_streaming_spark.functions.dedup import LshIndex

        index = LshIndex(spark, f"{work}/idx")

        def process(batch_df, epoch_id):
            pairs = index.add_batch(batch_df, batch_id=f"b{epoch_id}")
            pairs.write.mode("overwrite").parquet(
                f"{work}/pairs/batch_id=b{epoch_id}"
            )

        sq = (
            q.writeStream.foreachBatch(process)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(600)
        elapsed = time.perf_counter() - t0
        n_pairs = read_candidate_pairs(spark, f"{work}/pairs").count()
        print(
            json.dumps(
                {
                    "metric": "dedup_stream_docs_per_sec",
                    "value": round(n_docs / elapsed, 1),
                    "unit": "docs/sec",
                    "docs": n_docs,
                    "chunks": chunks,
                    "elapsed_sec": round(elapsed, 2),
                    "candidate_pairs": n_pairs,
                    "sf_dir": sf_dir,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
