"""Distributed connected components — the clustering step of near-dedup.

Pair-level dedup (operators/dedup.py) stops at candidate pairs, but a
production corpus-dedup pipeline must *transitively close* them: if
A~B and B~C, all three are one duplicate group and exactly one document
survives.  That closure is connected components over the similarity
graph.

Implementation: iterative min-label propagation on an edge list — each
round every vertex adopts the smallest component id among itself and
its neighbors; converges in O(graph diameter) rounds.  This is the
standard MapReduce/Spark formulation (cf. Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — whose large-star/
small-star variant cuts rounds to O(log d) and is the upgrade path if
duplicate chains ever get long; near-dup graphs in practice have tiny
diameters because similarity is near-transitive).

Scale notes (100 TB corpus → billions of vertices, edges ≪ vertices²
because LSH only emits colliding pairs):

* the loop is a *driver-side iteration over distributed joins* — no
  vertex data ever reaches the driver; the only driver-visible value
  per round is the `changed` count that decides termination;
* `localCheckpoint(eager=True)` after every round truncates lineage —
  without it the plan doubles per iteration and Catalyst analysis
  time, not the data, becomes the bottleneck;
* each round is one shuffle (groupBy id); edges are re-used unshuffled
  every round, so persisting them pays for itself after round 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """Return (id, comp): every vertex of the undirected graph labeled
    with its component id = the minimum vertex id in the component.

    ``edges`` must already contain both directions of every undirected
    edge (callers union the swap).  Deterministic: the fixpoint is
    unique regardless of execution schedule.
    """
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    edges = edges.persist()
    labels = (edges.select(F.col("src").alias("id"))
              .union(edges.select(F.col("dst").alias("id")))
              .distinct()
              .select("id", F.col("id").alias("comp"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        msgs = (edges.join(labels, edges.src == labels.id)
                .select(F.col("dst").alias("id"), "comp"))
        new_labels = (msgs.unionByName(labels.select("id", "comp"))
                      .groupBy("id").agg(F.min("comp").alias("comp"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.comp") != F.col("o.comp"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels
