"""Throughput of the streaming incremental near-dup pipeline.

Feeds the sf0.1 documents table to ``start_incremental_dedup`` in
``chunks`` file-batches (maxFilesPerTrigger=1, so each is its own
checkpointed epoch banding against the growing index) and reports
docs/sec through the full candidate-emit + index-ingest path, plus the
final candidate count.

Usage: python tools/bench_dedup_stream.py [sf_dir] [chunks]
Prints one JSON line; exits nonzero if the stream did not finish.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

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
        # pmod + coalesce: NULL or negative doc_ids still land in a
        # chunk, so every counted doc is streamed and the candidate
        # count stays comparable to a batch run over the full table
        chunk = F.coalesce(
            F.pmod(F.col("doc_id"), F.lit(chunks)), F.lit(0)
        )
        for i in range(chunks):
            docs.filter(chunk == i).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)

        t0 = time.perf_counter()
        sq = start_incremental_dedup(
            spark,
            in_dir,
            f"{work}/idx",
            f"{work}/pairs",
            f"{work}/ckpt",
            max_files_per_trigger=1,
        )
        finished = sq.awaitTermination(600)
        elapsed = time.perf_counter() - t0
        if not finished:
            sq.stop()
            print(
                json.dumps(
                    {"error": "stream did not finish within 600s"}
                ),
                file=sys.stderr,
            )
            sys.exit(1)
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
