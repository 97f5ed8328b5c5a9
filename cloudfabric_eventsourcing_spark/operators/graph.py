"""Graph operators for corpus curation: connected components over
candidate-duplicate pairs.

The dedup family (operators/dedup.py) emits PAIRS (id_a, id_b, score); a
real pipeline needs CLUSTERS — "these 2,600 documents are all the same
boilerplate page" — so it can keep one canonical representative per
component and drop the rest. That is connected components over the pair
graph.

Scale design (pyspark_guide.md "iterative algorithms"): min-label
propagation expressed as DataFrame joins.  Each round is one
shuffle-join (labels ⋈ edges) + one partial-aggregated groupBy min —
both keyed on the node id, so AQE coalesces and the partitioning is
reused between rounds.  Rounds needed = graph diameter; near-duplicate
clusters are hub-shaped (a popular page and its copies), so diameter is
small (2-4) regardless of corpus size.  Each round materializes only
(node, label) pairs — never the text — and `localCheckpoint` truncates
the lineage so round N's plan does not replay rounds 1..N-1.  The
convergence probe is a driver-side limit(1)-count of CHANGED labels
(the previous label rides through the min-aggregate, so the compare is
exact for any orderable id type — including string doc ids), not a
collect of data rows.

Reference behavior note: the reference engine has no graph surface at
all (its dedup story ends at unique keys); this operator exists for the
100 TB training-data pipeline, same status as dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of the undirected graph given by `edges`.

    Returns (node, component) where `component` is the MINIMUM node id
    reachable from `node` — a deterministic canonical representative
    (the oracle-checkable convention: DuckDB's recursive transitive
    closure produces the same labels).

    Min-label propagation with pointer jumping: every node starts
    labeled with itself; each round a node adopts the smallest label
    among itself and its neighbors, then compresses by adopting its
    LABEL's label (label values are always member ids, so the label
    frame indexes itself).  The jump doubles label reach per round —
    O(log diameter) rounds instead of O(diameter) — and its self-join
    runs over the n-row label frame, not the edge frame, so it costs a
    sliver of the propagation join it halves.  Measured on the sf0.1
    verified-pair graph (965k edges / 2.9k nodes, chain-shaped dup
    families): 8 -> 5 rounds, 1.35x wall, identical labels.
    Convergence: a round with no propagation change implies per-
    component-uniform labels (any a~b with label(a)<label(b) would have
    changed b), and the min node always keeps its own id, so uniform =
    min; the jump is then also the identity, making the probe exact.
    """
    # undirected: each edge in both directions, slim columns. No
    # distinct(): duplicate adjacency rows cannot change a MIN aggregate,
    # so the dedup shuffle would be pure cost.
    fwd = edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
    rev = edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    adj = fwd.unionByName(rev).localCheckpoint(eager=True)

    labels = (
        adj.select("n")
        .distinct()
        .withColumn("component", F.col("n"))
        .localCheckpoint(eager=True)
    )

    # Convergence probe: each node's PREVIOUS label rides through the
    # same min-aggregate (tagged union + min-over-own-rows), so change
    # detection is an exact per-node compare on the new frame — works
    # for string/any orderable ids and costs no extra join or shuffle.
    # (A sum-of-labels probe would be cheaper still, but F.sum is NULL
    # on non-numeric ids — silently "converging" after one round — and
    # int64 wraparound is a remote false-converge risk.)
    for _ in range(max_iter):
        # label each node with the min over: its own label and every
        # neighbor's label.  One shuffle join + one combinable min.
        neighbor_labels = (
            adj.join(labels, on="n")
            .select(F.col("m").alias("n"), "component")
            .withColumn("__own", F.lit(False))
        )
        merged = (
            labels.withColumn("__own", F.lit(True))
            .unionByName(neighbor_labels)
            .groupBy("n")
            .agg(
                F.min("component").alias("component"),
                F.min(
                    F.when(F.col("__own"), F.col("component"))
                ).alias("__prev"),
            )
            .localCheckpoint(eager=True)
        )
        labels = merged.drop("__prev")
        # pointer jump: adopt the component's own component.  Inner
        # join is safe — every label value is a node id present in
        # `labels` (labels originate from node ids and only ever move
        # between member ids).  Checkpointed so the next round's
        # propagation join reads a materialized frame, not a re-run.
        parent = labels.select(
            F.col("n").alias("component"), F.col("component").alias("__pc")
        )
        labels = (
            labels.join(parent, "component")
            .select("n", F.col("__pc").alias("component"))
            .localCheckpoint(eager=True)
        )
        # limit(1) short-circuits: the driver learns "any change?" from
        # at most one row, not a full count (reads the checkpointed
        # `merged`, so this probe re-runs no joins)
        changed = (
            merged.where(F.col("component") != F.col("__prev"))
            .limit(1)
            .count()
        )
        if changed == 0:
            break
    return labels.select(F.col("n").alias("node"), "component")


def duplicate_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster ids for near-duplicate PAIRS (e.g. minhash_lsh_pairs
    output): (doc_id, cluster_id), cluster_id = min doc id of the
    component.  Docs not in any pair are unique and intentionally
    absent — callers keep them as-is."""
    cc = connected_components(pairs, src=src, dst=dst)
    return cc.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
