"""Count-min sketch: frequency estimates in fixed memory.

Complements the built-in sketches the engine already exposes
(HyperLogLog++ count-distinct, approximate quantiles — q_approx_aggs):
CMS answers *per-key frequency* ("how often does this token appear in
100 TB?") with state d×w counters, independent of both row count and
key cardinality. The exact alternative (q_top_words' two-phase top-k)
shuffles the full vocabulary; CMS never shuffles more than d×w cells.

Distributed form: each row contributes one increment to d cells
(posexplode of its d row-hashes) → a (row, bucket) hash aggregate with
map-side partial combine reduces everything to ≤ d×w rows → the tiny
sketch collects to the driver. Estimation: min over the d cells
(classic CMS upper-bound estimate: overestimates only, by ≤ εN with
probability ≥ 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

Hashing: the same md5/conv codegen built-ins every deterministic
operator here uses (never Python row-at-a-time); row r of the sketch
uses md5(key || '#' || r).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int) -> Column:
    salted = F.concat_ws("#", key, F.lit(str(row)))
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10)
        .cast("long")
        % width
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> list[list[int]]:
    """Aggregate a column into a d×w count-min sketch (driver-side
    list of lists — the sketch IS small by construction).

    Key encoding contract: the column is hashed through Spark's
    cast-to-string; query keys passed to ``cms_estimate`` must be the
    SAME string rendering. Use a string column (or pre-cast with the
    formatting you will query with) for non-trivial types — Spark's
    rendering of doubles/booleans differs from Python's ``str()``.
    Null keys are excluded: they can never be queried, and counting
    them would both inflate colliding cells and silently widen the
    εN error bound.
    """
    key = F.col(key_col).cast("string")
    cells = df.filter(key.isNotNull()).select(
        F.posexplode(
            F.array(*[_bucket(key, r, width) for r in range(depth)])
        ).alias("row", "bucket")
    )
    counts = (
        cells.groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    sketch = [[0] * width for _ in range(depth)]
    for r in counts:
        sketch[r["row"]][r["bucket"]] = r["c"]
    return sketch


def cms_estimate(sketch: list[list[int]], key: str) -> int:
    """Point frequency estimate: min over the d hashed cells.

    Width is derived from the sketch itself — passing a mismatched
    width would silently hash into the wrong cells (including
    underestimates), so it is not a parameter.
    """
    import hashlib

    width = len(sketch[0])
    est = None
    for r in range(len(sketch)):
        salted = f"{key}#{r}".encode()
        h = int(hashlib.md5(salted).hexdigest()[:15], 16) % width
        c = sketch[r][h]
        est = c if est is None else min(est, c)
    return int(est or 0)
