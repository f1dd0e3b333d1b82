"""Deterministically-trained k-means (SURVEY §2.11 L36) — Lloyd's
iterations with every cross-row reduction an exact integer sum, so
TRAINING itself is oracle-replayable (the L32 BPE / L34 logreg
precedent). This replaces the engine's documented stand-in for a
k-means fit (`vectors.deterministic_centroids`: "the n lowest-id
vectors ... a stand-in for a k-means fit") with the real trained
artifact, keeping that stand-in's determinism guarantee.

Determinism devices (shared with `functions.classifier`):

- **winsorized inputs** (±G_CLAMP per coordinate) bound magnitudes;
- **quantized centroid state**: centroids live as BIGINT micro-units;
  ``c = micro/1e6`` is the same correctly-rounded double in Python,
  Spark, and DuckDB;
- **expanded squared distance** ``xx - 2·(x·c) + (c·c)`` where every
  dot is the shared left-to-right fold (`vectors.dot` ==
  ``list_dot_product`` == the Python reference's explicit loop), so
  both engines compare the same doubles;
- **deterministic seeding**: the k lowest-id vectors (quantized) —
  no sampling, reproducible across engines (kmeans++ would need a
  shared RNG; at real scale you'd seed from a content-keyed md5
  order, the L13 trick);
- **lexicographic argmin** on ``(dist, cid)`` — duplicate vectors and
  duplicate centroids tie-break identically everywhere;
- **integer centroid update**: ``c' = floor(Σ floor(xj·1e6) / n)``
  exact BIGINT floor-division (DuckDB's ``//`` truncates toward zero,
  so the oracle spells out floor semantics for negative sums);
  empty clusters keep their previous centroid.

Scale shape (100 TB): each iteration is ONE pass — a broadcast of k
centroids (one row, O(k·d) driver state), a per-row codegen+HOF
argmin (no shuffle), and a k·d-key integer hash aggregate with
map-side combine emitting k·d cells regardless of corpus size.
Application is a per-row argmin projection — no shuffle, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .classifier import G_CLAMP, MICRO, _dim_series, winsorized
from .vectors import dot

#: Deterministic-parity bound reused from the classifier tier.
__all__ = [
    "train_kmeans",
    "train_kmeans_reference",
    "kmeans_assign",
    "kmeans_assign_detail",
    "kmeans_centroid_frame",
    "kmeans_oracle",
]


def _centroid_floats(cm: list[int]) -> list[float]:
    # micro/MICRO in Python is the same correctly-rounded double
    # DuckDB's m/1000000.0 yields — exact literal parity.
    return [m / MICRO for m in cm]


def kmeans_centroid_frame(spark, cm: list[list[int]]) -> DataFrame:
    """The trained micro-unit centroids as the ``(centroid_id, cvec)``
    frame the IVF family consumes (``vectors.ivf_topk`` /
    ``IvfIndex``) — the bridge that retires the documented
    ``deterministic_centroids`` stand-in (VERDICT_r7 #5): IVF cells
    anchored on a real trained model instead of the lowest-id rows."""
    return spark.createDataFrame(
        [(cid, _centroid_floats(row)) for cid, row in enumerate(cm)],
        "centroid_id long, cvec array<double>",
    )


def _self_dot(cf: list[float]) -> float:
    """c·c as the shared explicit left fold (== list_dot_product)."""
    acc = 0.0
    for c in cf:
        acc = acc + c * c
    return acc


def _assign_col(cent: Column, x: Column, xx: Column) -> Column:
    """The winning ``struct<d, c>`` by argmin_(dist, cid) over an
    array<struct<cid,c,cc>> column — struct comparison is
    lexicographic in Spark, mirroring the oracle's ``ORDER BY dist,
    cid`` and the reference's strict-< scan. dist = xx - 2·(x·c) +
    cc, every op shared-fold/correctly rounded."""
    return F.array_min(
        F.transform(
            cent,
            lambda s: F.struct(
                (
                    xx - F.lit(2.0) * dot(x, s["c"]) + s["cc"]
                ).alias("d"),
                s["cid"].alias("c"),
            ),
        )
    )


def _centroid_frame(spark, cm: list[list[int]]):
    """The k trained/interim centroids as ONE broadcastable row
    (array of structs) — the logreg lesson: literal centroids would
    recompile codegen every iteration."""
    cent = [
        (cid, _centroid_floats(row), _self_dot(_centroid_floats(row)))
        for cid, row in enumerate(cm)
    ]
    return spark.createDataFrame(
        [(cent,)],
        "cent array<struct<cid:int,c:array<double>,cc:double>>",
    )


def train_kmeans(
    emb: DataFrame,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_cm: list[list[int]] | None = None,
) -> list[list[int]]:
    """Lloyd's k-means over the winsorized embeddings, returned as k
    BIGINT micro-unit centroid lists. Each iteration: assignment is a
    per-row argmin against the broadcast centroid row (no shuffle);
    the update is ONE integer hash aggregate over the posexplode
    (k·d cells out, map-side combined) — the L34 training posture:
    bounded passes, O(k·d) driver state, no Python on the corpus.
    The exact computation is replayed verbatim by
    :func:`kmeans_oracle`.

    ``init_cm`` warm-starts from a checkpointed model (r8, the
    L34-warm precedent): the iteration is a pure function of
    (centroids, corpus), so K iterations continued from a
    K-iteration checkpoint are BIT-IDENTICAL to 2K from scratch
    (asserted in tests, including the warm-started DuckDB replay via
    ``kmeans_oracle(init_cm=...)``) — the honest incremental story
    for an assignment-dependent update that, like the logreg
    gradient, is not batch-additive: retrain on a cadence from the
    last checkpoint, and between retrains the frozen centroids keep
    serving (streaming_cluster_assignments)."""
    from ..tables import spread

    base = spread(
        emb.select(
            F.col(id_col).alias("vid"),
            winsorized(F.col(vec_col)).alias("x"),
        ),
        min_partitions=8,
    ).select("vid", "x", dot(F.col("x"), F.col("x")).alias("xx"))
    base = base.persist()
    try:
        if init_cm is not None:
            if len(init_cm) != k:
                raise ValueError(
                    f"init_cm has {len(init_cm)} centroids for k={k}"
                )
            cm = [list(row) for row in init_cm]
        else:
            init = base.orderBy("vid").limit(k).select("x").collect()
            if not init:
                raise ValueError(
                    "cannot train k-means on an empty table"
                )
            cm = [
                [math.floor(v * MICRO) for v in r["x"]] for r in init
            ]
        d = len(cm[0])
        spark = emb.sparkSession
        for _ in range(iters):
            cdf = _centroid_frame(spark, cm)
            a = base.join(F.broadcast(cdf)).select(
                _assign_col(F.col("cent"), F.col("x"), F.col("xx"))[
                    "c"
                ].alias("cid"),
                F.col("x"),
            )
            # Generate barrier: cid is evaluated once per input row
            # and carried through the posexplode (the L34 lesson —
            # a d-wide aggregate would re-evaluate the argmin d×).
            ex = a.select(
                "cid", F.posexplode(F.col("x")).alias("pos", "xj")
            )
            cells = (
                ex.groupBy("cid", "pos")
                .agg(
                    F.sum(
                        F.floor(F.col("xj") * F.lit(float(MICRO)))
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            got: dict[tuple[int, int], tuple[int, int]] = {
                (r["cid"], r["pos"]): (int(r["s"]), int(r["n"]))
                for r in cells
            }
            for cid in range(len(cm)):
                for j in range(d):
                    sn = got.get((cid, j))
                    if sn is not None:
                        s, n = sn
                        cm[cid][j] = s // n  # Python // floors
        return cm
    finally:
        base.unpersist()


def kmeans_assign_detail(vec: Column, cm: list[list[int]]) -> Column:
    """The winning ``struct<d: double, c: int>`` (squared distance +
    cluster id) under the trained micro-unit centroids — a
    literal-centroid argmin projection (one-time compile; no shuffle,
    no Python). ``xx`` is computed internally from the WINSORIZED
    vector — a caller-supplied unwinsorized x·x would silently
    misassign out-of-clamp rows, so it isn't a parameter."""
    wx = winsorized(vec)
    xx = dot(wx, wx)
    cent = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(
                    *[
                        F.lit(v).cast("double")
                        for v in _centroid_floats(row)
                    ]
                ).alias("c"),
                F.lit(_self_dot(_centroid_floats(row)))
                .cast("double")
                .alias("cc"),
            )
            for cid, row in enumerate(cm)
        ]
    )
    return _assign_col(cent, wx, xx)


def kmeans_assign(vec: Column, cm: list[list[int]]) -> Column:
    """Per-row cluster id: :func:`kmeans_assign_detail`'s ``c``
    field."""
    return kmeans_assign_detail(vec, cm)["c"]


def train_kmeans_reference(
    rows: list[tuple[int, list[float]]],
    k: int = 8,
    iters: int = 4,
    init_cm: list[list[int]] | None = None,
) -> list[list[int]]:
    """Pure-Python reference — must produce BIT-IDENTICAL micro-unit
    centroids to :func:`train_kmeans` (the three-way-parity pattern):
    explicit left folds, strict-< argmin scan in ascending cid order
    (≡ lexicographic (dist, cid) min), Python floor division.
    ``init_cm`` warm-starts from a checkpoint, mirroring
    :func:`train_kmeans`."""
    xs = []
    for _, v in sorted(rows, key=lambda r: r[0]):
        x = [max(-G_CLAMP, min(G_CLAMP, float(c))) for c in v]
        acc = 0.0
        for c in x:
            acc = acc + c * c
        xs.append((x, acc))
    if not xs:
        raise ValueError("cannot train k-means on an empty table")
    if init_cm is not None:
        cm = [list(row) for row in init_cm]
    else:
        cm = [[math.floor(v * MICRO) for v in x] for x, _ in xs[:k]]
    d = len(cm[0])
    for _ in range(iters):
        cf = [_centroid_floats(row) for row in cm]
        cc = [_self_dot(c) for c in cf]
        sums: dict[int, list[int]] = {}
        cnts: dict[int, int] = {}
        for x, xx in xs:
            best_d, best_c = None, None
            for cid in range(len(cm)):
                acc = 0.0
                for xj, cj in zip(x, cf[cid]):
                    acc = acc + xj * cj
                dist = xx - 2.0 * acc + cc[cid]
                if best_d is None or dist < best_d:
                    best_d, best_c = dist, cid
            srow = sums.setdefault(best_c, [0] * d)
            for j in range(d):
                srow[j] += math.floor(x[j] * MICRO)
            cnts[best_c] = cnts.get(best_c, 0) + 1
        for cid, srow in sums.items():
            n = cnts[cid]
            cm[cid] = [s // n for s in srow]
    return cm


#: Exact BIGINT floor division for the oracle — DuckDB's ``//``
#: truncates toward zero ((-7)//2 = -3), Python's floors (-4); the
#: divisor (a count) is always positive.
_FLOORDIV = (
    "(u.s // u.n - CASE WHEN u.s % u.n <> 0 AND u.s < 0"
    " THEN 1 ELSE 0 END)"
)


def kmeans_oracle(
    k: int | str = 8,
    iters: int = 4,
    init_cm: list[list[int]] | None = None,
) -> str:
    """The training replay as a chained-CTE prefix (no final SELECT):
    ``WITH e, ex, c0, cf1, a1, u1, c1, ..., a{iters+1}`` — append a
    final SELECT over ``e``/``a{iters+1}`` to build a query oracle.

    ``cf{t}`` converts centroid micro-units to the doubles both
    engines share; ``a{t}`` assigns every row by ``ORDER BY dist,
    cid`` row_number (the lexicographic argmin); ``u{t}``/``c{t}``
    apply the exact integer update, empty clusters keeping their
    previous centroid. The final ``a{iters+1}`` carries the trained
    model's assignments. ``init_cm`` replays a warm-started run:
    ``c0`` becomes the checkpoint VALUES instead of the lowest-id
    seeding (the logreg_oracle init_w_micro precedent).

    ``k`` may be a SQL AGGREGATE EXPRESSION over ``e`` (a str, e.g.
    ``"greatest(1, (count(*) + 124) // 125)"``) instead of a literal —
    the corpus-scaled form (VERDICT_r8 #5): a ``kn`` CTE evaluates it
    once and the seeding LIMIT reads it, so the oracle derives k from
    the same corpus the engine counts. Integer-only arithmetic (``//``)
    keeps the derivation exact in both engines at any corpus size."""
    if init_cm is None:
        if isinstance(k, str):
            limit = "(SELECT k FROM kn)"
        else:
            limit = str(k)
        c0 = f"""c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid,
         list_transform(x,
           v -> CAST(floor(v * {MICRO}.0) AS BIGINT)) AS cm
  FROM (SELECT vec_id, x FROM e ORDER BY vec_id LIMIT {limit})
)"""
    else:
        vals = ", ".join(
            f"({cid}, [{', '.join(f'CAST({m} AS BIGINT)' for m in row)}])"
            for cid, row in enumerate(init_cm)
        )
        c0 = (
            f"c0 AS MATERIALIZED (SELECT * FROM (VALUES {vals})"
            " t(cid, cm))"
        )
    parts = [
        """e AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
                        x -> greatest(-1000.0, least(1000.0, x))) AS x
  FROM embeddings
)""",
        "ex AS MATERIALIZED (SELECT vec_id, x,"
        " list_dot_product(x, x) AS xx FROM e)",
    ]
    if init_cm is None and isinstance(k, str):
        parts.append(f"kn AS MATERIALIZED (SELECT {k} AS k FROM e)")
    parts.append(c0)
    for t in range(1, iters + 2):
        parts.append(
            f"""cf{t} AS MATERIALIZED (
  SELECT cid, list_transform(cm, m -> m/{MICRO}.0) AS c,
         list_dot_product(list_transform(cm, m -> m/{MICRO}.0),
                          list_transform(cm, m -> m/{MICRO}.0)) AS cc
  FROM c{t - 1}
)"""
        )
        parts.append(
            f"""a{t} AS MATERIALIZED (
  SELECT vec_id, cid, d FROM (
    SELECT ex.vec_id, c.cid,
           ex.xx - 2.0*list_dot_product(ex.x, c.c) + c.cc AS d,
           row_number() OVER (PARTITION BY ex.vec_id ORDER BY
             ex.xx - 2.0*list_dot_product(ex.x, c.c) + c.cc,
             c.cid) AS rn
    FROM ex, cf{t} c) z
  WHERE rn = 1
)"""
        )
        if t == iters + 1:
            break
        parts.append(
            f"""u{t} AS MATERIALIZED (
  SELECT a.cid, d.dim,
         CAST(sum(CAST(floor(ex.x[d.dim] * {MICRO}.0) AS BIGINT))
           AS BIGINT) AS s,
         count(*) AS n
  FROM ex JOIN a{t} a USING (vec_id)
  JOIN {_dim_series("ex")} d ON d.dim <= len(ex.x)
  GROUP BY a.cid, d.dim
)"""
        )
        parts.append(
            f"""c{t} AS MATERIALIZED (
  SELECT c.cid,
         list(CASE WHEN u.n IS NULL THEN c.cm[d.dim]
                   ELSE {_FLOORDIV} END ORDER BY d.dim) AS cm
  FROM c{t - 1} c
  JOIN {_dim_series("ex")} d ON d.dim <= len(c.cm)
  LEFT JOIN u{t} u ON u.cid = c.cid AND u.dim = d.dim
  GROUP BY c.cid
)"""
        )
    return "WITH\n" + ",\n".join(parts)
