"""Poisoned-degenerate pairing probe (VERDICT_r6 #3).

Scenario: a crawl-scale corpus where one "empty content" class (the
all-zero image, digital silence) collapses to a single fingerprint
value — a c-row bucket that the banded self-join turns into c²/2
candidate pairs. The lever under test is
``dedup.hamming_pairs_robust``: exclude over-cap fingerprints from
the banded join and restore each excluded group as an O(c) star.

Synthetic fingerprints (no decode — the pairing is what scales):
N background rows with random 56-bit hashes + a poisoned constant
group of c rows. We time the unguarded ``hamming_pairs`` and the
robust composition at growing c; the unguarded time must grow ~c²
(it emits the clique), the robust time must stay flat (the
degenerate class costs one groupBy + broadcast join and c-1 output
rows).

Usage: python tools/probe_degenerate.py [c1,c2,...] (default
15000,50000,150000; background N=200k).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vsphere_event_streaming_spark.functions.dedup import (  # noqa: E402
    hamming_pairs,
    hamming_pairs_robust,
)
from vsphere_event_streaming_spark.session import get_spark  # noqa: E402

N_BITS = 56
K = 2
CAP = 1000
BACKGROUND = 200_000
POISON_FP = 0x0F0F0F0F0F0F0F  # the degenerate class's single value


def fingerprint_table(spark, c: int):
    """BACKGROUND rows of content-keyed pseudo-random 56-bit hashes
    (xxhash64 of the id — deterministic, uniform) + c poisoned rows
    sharing POISON_FP."""
    bg = spark.range(0, BACKGROUND, 1, 32).select(
        F.col("id"),
        F.abs(F.xxhash64(F.col("id"))).bitwiseAND(
            F.lit((1 << N_BITS) - 1)
        ).alias("h"),
    )
    poison = spark.range(BACKGROUND, BACKGROUND + c, 1, 32).select(
        F.col("id"), F.lit(POISON_FP).cast("long").alias("h")
    )
    return bg.unionByName(poison)


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [15_000, 50_000, 150_000]
    )
    spark = get_spark("probe-degenerate")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for c in sizes:
        t = fingerprint_table(spark, c).persist()
        t.count()
        r0 = time.perf_counter()
        robust = hamming_pairs_robust(
            t, "id", "h", K, n_bits=N_BITS, max_fp_freq=CAP
        ).count()
        r1 = time.perf_counter()
        entry = {"robust_sec": round(r1 - r0, 2), "robust_pairs": robust}
        # the unguarded clique is 11G pairs at c=150k — only run it
        # where it finishes in reasonable time
        if c * (c - 1) // 2 <= 2_000_000_000:
            u0 = time.perf_counter()
            unguarded = hamming_pairs(t, "id", "h", K, n_bits=N_BITS).count()
            u1 = time.perf_counter()
            entry |= {
                "unguarded_sec": round(u1 - u0, 2),
                "unguarded_pairs": unguarded,
            }
        out[c] = entry
        t.unpersist()
        print(json.dumps({c: entry}), flush=True)
    print(json.dumps({"probe": "degenerate_pairing", "results": out}))


if __name__ == "__main__":
    main()
