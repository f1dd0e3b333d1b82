"""Connected components over an edge table (iterative label
propagation).

The reference's events carry a ``ChainId`` correlating related events
into causal chains (README.md:63); resolving the full transitive
correlation groups — "which events belong to one incident" — is a
connected-components problem over the co-occurrence edge set. The
same operator powers training-data dedup at corpus scale: near-dup
PAIRS (functions/dedup.py) become dedup GROUPS only after a
connected-components pass unions overlapping pairs.

Algorithm: label propagation + pointer jumping — every vertex starts
as its own component (label = own id); each round (1) adopts the
minimum label across edges, then (2) compresses by adopting the label
OF its label (path doubling). The compression step turns O(diameter)
convergence into O(log diameter) — a 1M-long chain resolves in ~20
rounds instead of 1M.

Scale posture per round: two key-partitioned shuffles (edge⋈label,
label⋈label); convergence is a cheap changed-label count. Iterative
DataFrame loops MUST truncate lineage each round
(``localCheckpoint``) — persist alone keeps the logical plan growing
until Catalyst analysis stack-overflows (~30 rounds). No driver-side
graph structure ever exists — at 100 TB the edge list stays
distributed end to end. (GraphX is JVM/RDD/Scala-only; this
DataFrame formulation is the PySpark-native equivalent.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (vertex, component) where component = min vertex id
    reachable. ``edges`` is undirected input (each pair once is fine).

    Each round: propagate every vertex's current label to every
    neighbor across the symmetrized edge list, take the min of own and
    neighbor labels, stop when no label changed. Caching keeps the
    label table (2 longs/vertex) hot; the edge list is re-read from
    its own cache each round.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # (1) propagate: for each edge a->b, b's candidate = label(a)
        cand = (
            sym.join(labels, sym.a == labels.vertex)
            .select(F.col("b").alias("vertex"), "component")
            .groupBy("vertex")
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = (
            labels.join(cand, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    "component", F.coalesce("nbr_min", "component")
                ).alias("component"),
            )
            # materialize before the self-join below references it
            # twice — otherwise the propagate join executes once per
            # side, doubling per-round cost
            .localCheckpoint(eager=True)
        )
        # (2) pointer jump: adopt the label of my label (path doubling)
        lab2 = stepped.select(
            F.col("vertex").alias("v2"), F.col("component").alias("c2")
        )
        new_labels = (
            stepped.join(lab2, stepped.component == lab2.v2, "left")
            .select(
                "vertex",
                F.least(
                    "component", F.coalesce("c2", "component")
                ).alias("component"),
            )
            # truncate lineage EVERY round or analysis cost explodes
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — with pointer jumping "
            f"this covers diameters up to ~2^{max_iter}; raise max_iter "
            "only if the graph is genuinely that stretched"
        )
    return labels


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → dedup groups: (doc_id, group_id = min reachable
    doc id). Feed with ``jaccard_pairs`` / ``lsh_candidate_pairs``
    output to turn pairwise similarity into keep-one-per-group
    decisions.
    """
    return connected_components(pairs, src=id_a, dst=id_b).select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("group_id")
    )
