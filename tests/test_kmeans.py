"""Trained k-means (L36): three-way training parity (Spark == DuckDB
chained-CTE replay == pure-Python reference, BIT-IDENTICAL — the
L32/L34 pattern), clustering-quality floors, deterministic
tie-breaking on duplicate vectors/centroids, and the empty-cluster /
floor-division edge cases the oracle must mirror."""

from __future__ import annotations

import math

import duckdb
import pytest

from vsphere_event_streaming_spark.functions.kmeans import (
    kmeans_assign,
    kmeans_oracle,
    train_kmeans,
    train_kmeans_reference,
)
from vsphere_event_streaming_spark.functions.classifier import MICRO
from vsphere_event_streaming_spark.queries.model_queries import (
    K_CLUSTERS,
    KMEANS_ITERS,
)

SF_DIR = "/root/testdata/sf0.001"
EMB = f"{SF_DIR}/embeddings.parquet"


def _rows():
    con = duckdb.connect()
    out = con.sql(f"SELECT vec_id, embedding FROM '{EMB}'").fetchall()
    con.close()
    return [(i, list(v)) for i, v in out]


def _duck(sql_suffix: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
    out = con.sql(
        kmeans_oracle(k=K_CLUSTERS, iters=KMEANS_ITERS) + sql_suffix
    ).fetchall()
    con.close()
    return out


def test_kmeans_three_way_training_parity(spark):
    """Spark training, the DuckDB chained-CTE replay, and the pure
    Python reference must produce bit-identical micro-unit centroids
    at the declared hyperparameters."""
    emb = spark.read.parquet(EMB)
    cm_spark = train_kmeans(emb, k=K_CLUSTERS, iters=KMEANS_ITERS)
    cm_py = train_kmeans_reference(
        _rows(), k=K_CLUSTERS, iters=KMEANS_ITERS
    )
    duck = _duck(f"SELECT cid, cm FROM c{KMEANS_ITERS} ORDER BY cid")
    cm_duck = [list(c) for _, c in duck]
    assert cm_spark == cm_py == cm_duck
    # the model moved off its seed: at least one centroid differs
    # from the quantized lowest-id vectors
    seeds = sorted(_rows())[:K_CLUSTERS]
    seed_cm = [
        [math.floor(v * MICRO) for v in x] for _, x in seeds
    ]
    assert cm_spark != seed_cm


def test_kmeans_assignment_matches_oracle_and_uses_clusters(spark):
    """Spark-side application (literal-centroid argmin) must agree
    row-for-row with the oracle's final assignment CTE, and the
    trained model must actually partition the corpus (>1 cluster,
    every cid in range)."""
    import pyspark.sql.functions as F

    emb = spark.read.parquet(EMB)
    cm = train_kmeans(emb, k=K_CLUSTERS, iters=KMEANS_ITERS)
    a_spark = {
        r["vec_id"]: r["cid"]
        for r in emb.select(
            "vec_id", kmeans_assign(F.col("embedding"), cm).alias("cid")
        ).collect()
    }
    a_duck = dict(_duck(f"SELECT vec_id, cid FROM a{KMEANS_ITERS + 1}"))
    assert a_spark == a_duck
    used = set(a_spark.values())
    assert len(used) > 1
    assert all(0 <= c < K_CLUSTERS for c in used)


def test_kmeans_reference_duplicate_vectors_tie_break_low_cid():
    """Duplicate seed vectors produce duplicate centroids; every
    member must tie-break to the LOWER cid (the lexicographic
    (dist, cid) rule both engines implement)."""
    rows = [(i, [1.0, 1.0]) for i in range(4)] + [
        (i, [10.0, 10.0]) for i in range(4, 8)
    ]
    cm = train_kmeans_reference(rows, k=2, iters=2)
    # seeds are rows 0 and 1 (identical) -> cluster 1 starts empty
    # and keeps its seed; cluster 0 absorbs the [1,1] group after
    # the far group pulls nothing (all [1,1] tie to cid 0)
    assert cm[1] == [MICRO, MICRO]  # unchanged duplicate seed


def test_kmeans_reference_negative_coordinates_floor_division():
    """Negative coordinate sums exercise the floor-vs-trunc split the
    oracle's _FLOORDIV guards: centroid of {-1.5, -2.0} along dim 0
    is floor((-1500000 + -2000000)/2) = -1750000 exactly."""
    rows = [(0, [-1.5]), (1, [-2.0])]
    cm = train_kmeans_reference(rows, k=1, iters=1)
    assert cm[0] == [-1750000]


def test_kmeans_reference_negative_floor_division_odd_split():
    """An odd negative sum must floor (toward -inf), not truncate:
    {-1.5, -2.0, -2.0} -> floor(-5500000/3) = -1833334 (trunc would
    give -1833333)."""
    rows = [(0, [-1.5]), (1, [-2.0]), (2, [-2.0])]
    cm = train_kmeans_reference(rows, k=1, iters=1)
    assert cm[0] == [math.floor(-5500000 / 3)] == [-1833334]


def test_kmeans_oracle_floor_division_matches_python():
    """The oracle's spelled-out floor division must reproduce the
    odd-negative-sum centroid digit-for-digit in DuckDB itself."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(0, [-1.5]::DOUBLE[], 0), (1, [-2.0]::DOUBLE[], 0), "
        "(2, [-2.0]::DOUBLE[], 0)) t(vec_id, embedding, label)"
    )
    got = con.sql(
        kmeans_oracle(k=1, iters=1) + "SELECT cm FROM c1"
    ).fetchone()[0]
    con.close()
    assert list(got) == [-1833334]


def test_kmeans_empty_table_raises(spark):
    emb = spark.read.parquet(EMB).limit(0)
    with pytest.raises(ValueError, match="empty"):
        train_kmeans(emb, k=2, iters=1)


def test_kmeans_fewer_rows_than_k(spark):
    """n < k trains n centroids in both engines (LIMIT k yields n)."""
    rows = [(0, [1.0, 2.0]), (1, [5.0, 6.0])]
    cm = train_kmeans_reference(rows, k=8, iters=2)
    assert len(cm) == 2


def test_kmeans_sizes_partition_the_corpus(spark):
    """Cluster sizes must sum to the corpus row count, mirror the
    assignment query's per-cid counts exactly, and every distance
    envelope must be ordered (min <= max, min >= 0 up to float
    cancellation of the expanded square)."""
    from collections import Counter

    from vsphere_event_streaming_spark.queries import model_queries as mq

    sizes = {
        r["cid"]: (r["n"], r["min_d_micro"], r["max_d_micro"])
        for r in mq.q_kmeans_sizes(spark, SF_DIR).collect()
    }
    assigned = Counter(
        r["cid"]
        for r in mq.q_kmeans_cluster(spark, SF_DIR).collect()
    )
    assert {c: n for c, (n, _, _) in sizes.items()} == dict(assigned)
    assert sum(n for n, _, _ in sizes.values()) == 500
    for cid, (n, lo, hi) in sizes.items():
        assert lo <= hi
        assert lo >= -1  # floor() of tiny negative cancellation noise


def test_cluster_balanced_budgets(spark):
    """The balanced sample must keep small clusters whole (rate 1) and
    shrink over-cap clusters toward cap = ceil(N/k) (hash-bucket
    variance allowed), never growing any cluster."""
    from collections import Counter

    from vsphere_event_streaming_spark.queries import model_queries as mq

    full = Counter(
        r["cid"] for r in mq.q_kmeans_cluster(spark, SF_DIR).collect()
    )
    kept = Counter(
        r["cid"] for r in mq.q_cluster_balanced(spark, SF_DIR).collect()
    )
    n = sum(full.values())
    cap = -(-n // K_CLUSTERS)
    assert set(kept) <= set(full)
    for cid, nf in full.items():
        nk = kept.get(cid, 0)
        assert nk <= nf
        if nf <= cap:
            assert nk == nf, f"under-cap cluster {cid} lost rows"
        else:
            # binomial(n_f, cap/n_f): mean cap, allow 5 sigma
            import math as m

            sigma = m.sqrt(nf * (cap / nf) * (1 - cap / nf))
            assert abs(nk - cap) <= 5 * sigma + 1, (cid, nf, nk, cap)


def test_kmeans_warmstart_continuation_parity(spark):
    """L36-warm (r8, the L34-warm precedent): Lloyd's iteration is a
    pure function of (centroids, corpus), so 2 iterations continued
    from a 2-iteration checkpoint must be BIT-IDENTICAL to 4 from
    scratch — in the engine, the pure-Python reference, AND the
    warm-started DuckDB replay (c0 = checkpoint VALUES)."""
    emb = spark.read.parquet(EMB)
    half = train_kmeans(emb, k=K_CLUSTERS, iters=2)
    full = train_kmeans(emb, k=K_CLUSTERS, iters=4)
    cont = train_kmeans(emb, k=K_CLUSTERS, iters=2, init_cm=half)
    assert cont == full
    assert half != full  # the continuation actually moved
    # pure-Python warm start agrees
    cont_py = train_kmeans_reference(
        _rows(), k=K_CLUSTERS, iters=2, init_cm=half
    )
    assert cont_py == full
    # warm-started DuckDB replay agrees
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
    duck = con.sql(
        kmeans_oracle(k=K_CLUSTERS, iters=2, init_cm=half)
        + "SELECT cid, cm FROM c2 ORDER BY cid"
    ).fetchall()
    con.close()
    assert [list(c) for _, c in duck] == full


def test_kmeans_warmstart_k_mismatch_raises(spark):
    emb = spark.read.parquet(EMB)
    with pytest.raises(ValueError, match="init_cm"):
        train_kmeans(emb, k=K_CLUSTERS, iters=1, init_cm=[[0, 0]])
