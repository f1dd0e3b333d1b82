"""Ingest-throughput bench: poll source → envelope → offset sink.

The reference's ingest ceiling is 50 events/s — 50-event pages at a
1 s poll cadence, both hardcoded (/root/reference/cmd/server/main.go:24,
:107). This measures the same pipeline shape on the engine (poll-page
micro-batches through the CloudEvents transform into the
offset-continuous parquet sink) with the page size as a parameter:
at page_size=50 the engine is poll-bound exactly like the reference;
larger pages show the engine's actual capacity.

Usage: python tools/bench_ingest.py [n_events] [page_size]
Prints one JSON line {"metric": "ingest_events_per_sec", ...}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from vsphere_event_streaming_spark.session import get_spark  # noqa: E402
from vsphere_event_streaming_spark.sources.poll_source import (  # noqa: E402
    read_poll_stream,
)
from vsphere_event_streaming_spark.streaming.ingest import (  # noqa: E402
    LOG_SCHEMA_DDL,
    start_ingest,
)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    page_size = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("bench-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ingest_bench_")
    log_dir = f"{tmp}/log"
    stream = read_poll_stream(
        spark, page_size=page_size, start_key=0, max_key=n_events
    )
    t0 = time.perf_counter()
    q = start_ingest(spark, stream, log_dir, f"{tmp}/ckpt")
    try:
        deadline = time.time() + 600
        cnt = 0
        while time.time() < deadline and cnt < n_events:
            try:
                cnt = (
                    spark.read.schema(LOG_SCHEMA_DDL).parquet(log_dir).count()
                )
            except Exception:
                cnt = 0
            time.sleep(0.2)
        elapsed = time.perf_counter() - t0
    finally:
        q.stop()
        q.awaitTermination(30)
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "ingest_events_per_sec",
                "value": round(cnt / elapsed, 1),
                "unit": "events/sec",
                "events": cnt,
                "elapsed_sec": round(elapsed, 2),
                "page_size": page_size,
                "reference_ceiling": 50,
            }
        )
    )


if __name__ == "__main__":
    main()
