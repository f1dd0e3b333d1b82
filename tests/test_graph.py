"""Connected components vs an independent union-find reference."""

from __future__ import annotations

import random

from vsphere_event_streaming_spark.operators.graph import (
    connected_components,
    dedup_groups,
)


def _union_find_components(edges, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min vertex id per component
    comp = {}
    for v in vertices:
        comp[v] = find(v)
    # path-compress fully so the root IS the min (roots were unioned
    # toward min above, so find(v) is already the min id)
    return comp


def test_connected_components_random_graph(spark):
    """Random sparse graph (chains, cliques, singletons via self-loop
    edges) matches union-find exactly."""
    rng = random.Random(20260813)
    vertices = list(range(200))
    edges = []
    # chains with long diameter (stress the iteration count)
    for base in (0, 50):
        edges += [(base + i, base + i + 1) for i in range(30)]
    # a clique
    clique = list(range(100, 110))
    edges += [(a, b) for a in clique for b in clique if a < b]
    # random extra edges
    edges += [
        (rng.randrange(0, 200), rng.randrange(0, 200)) for _ in range(60)
    ]
    # isolated vertices appear as self-edges so they exist in the table
    edges += [(v, v) for v in vertices]

    expect = _union_find_components(edges, vertices)

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == expect


def test_dedup_groups_from_pairs(spark):
    """Overlapping near-dup pairs union into one keep-group."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["group_id"] for r in dedup_groups(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
