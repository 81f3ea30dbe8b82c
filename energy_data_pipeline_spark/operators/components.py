"""Connected components over a pair graph — the pairs→clusters step of a
production dedup pipeline (near-dup PAIRS are not actionable until they
are grouped into clusters with one canonical keeper per cluster).

Reference parity: the reference stops at per-key dedup
(initial_db_ingestion.py:99, merge_to_all.py:57-79); transitive
near-dup clustering is part of the training-data surface this engine
adds on top.

Algorithm: iterative min-label propagation. Every vertex starts
labelled with its own id; each round every vertex takes the minimum
label among itself and its neighbours; convergence when no label
changes. Rounds needed = graph diameter, and near-dup clusters are
shallow (near-cliques — LSH emits most intra-cluster pairs directly),
so 2-4 rounds is typical. Each round is two shuffles on the edge/label
keys — all JVM-side, no Python.

Scale notes (100 TB posture):
- The edge list is the OUTPUT of LSH verification, i.e. orders of
  magnitude smaller than the corpus; it is cached once and reused
  every round.
- ``localCheckpoint`` after each round truncates the lineage so the
  plan does not grow with iteration count (an un-checkpointed loop
  re-executes every prior round's shuffles on each action).
- Plain neighbor-min propagation needs diameter-many rounds — an
  adversarial chain graph defeats any fixed budget. After a few plain
  rounds (near-dup clusters are near-cliques and converge in 2-4), any
  still-unconverged graph switches to hybrid rounds that also
  POINTER-JUMP (``label(u) <- label(label(u))``, the "shortcut" of
  Shiloach-Vishkin / the contraction idea behind large-star/small-star,
  Kiveris et al. "Connected Components in MapReduce"), so pointer
  distances double per round and convergence is O(log diameter):
  ``max_iter=25`` covers astronomical diameters. The shortcut operates
  on the round's CHECKPOINTED hook output — a self-join on live lineage
  would recompute the hook aggregation on both branches.
- Non-convergence is NEVER silent: if the budget exhausts with labels
  still changing, ``ConvergenceError`` is raised — wrong cluster labels
  flowing into a dedup purge (dropping the wrong documents from a
  training corpus) is strictly worse than a loud failure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Iterative algorithm exhausted its round budget without reaching a
    fixpoint — results would be wrong, so no result is returned."""


def connected_components(
    pairs: DataFrame,
    id1: str,
    id2: str,
    max_iter: int = 25,
    shortcut_after: int = 2,
) -> DataFrame:
    """Cluster the undirected pair graph; returns (vertex, cluster_id)
    with cluster_id = the minimum vertex id reachable from ``vertex``.

    Deterministic for any id type with a total order (min/least).
    Rounds < ``shortcut_after`` hook only (neighbor-min — one join +
    aggregate, the cheap path shallow dedup graphs finish on); later
    rounds also shortcut (pointer jump), making total rounds
    O(log diameter). Raises :class:`ConvergenceError` if ``max_iter``
    rounds still leave labels changing.
    """
    edges = (
        pairs.select(F.col(id1).alias("_a"), F.col(id2).alias("_b"))
        .union(pairs.select(F.col(id2).alias("_a"), F.col(id1).alias("_b")))
        .distinct()
        .localCheckpoint(eager=False)  # persists + cuts lineage to the pairs plan
    )

    labels = (
        edges.select(F.col("_a").alias("vertex"))
        .distinct()
        .withColumn("cluster_id", F.col("vertex"))
    )

    for i in range(max_iter):
        # hook: min label among each vertex's neighbours
        nbr_min = (
            edges.join(labels, edges["_a"] == labels["vertex"])
            .groupBy(F.col("_b").alias("vertex"))
            .agg(F.min("cluster_id").alias("_nbr_min"))
        )
        hooked = (
            labels.join(nbr_min, "vertex", "left")
            .select(
                "vertex",
                F.col("cluster_id").alias("_old"),
                F.least(
                    F.col("cluster_id"), F.coalesce("_nbr_min", "cluster_id")
                ).alias("_hook"),
            )
            .localCheckpoint(eager=True)  # truncate lineage + materialize once
        )
        if i < shortcut_after:
            new_labels = hooked.select(
                "vertex",
                F.col("_hook").alias("cluster_id"),
                (F.col("_hook") < F.col("_old")).alias("_changed"),
            )
        else:
            # shortcut: label(u) <- label(label(u)) — labels are always
            # ids of smaller same-component vertices, so pointer chains
            # double-compress; self-join runs on the CHECKPOINTED hooked
            parent = hooked.select(
                F.col("vertex").alias("_pv"), F.col("_hook").alias("_pl")
            )
            jumped = F.least(
                F.col("_hook"), F.coalesce(F.col("_pl"), F.col("_hook"))
            )
            new_labels = (
                hooked.join(parent, hooked["_hook"] == parent["_pv"], "left")
                .select(
                    "vertex",
                    jumped.alias("cluster_id"),
                    (jumped < F.col("_old")).alias("_changed"),
                )
                .localCheckpoint(eager=True)
            )
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise ConvergenceError(
            f"connected_components: labels still changing after {max_iter} "
            f"hook+shortcut rounds (graph diameter ~2^{max_iter} exceeded or "
            "pathological input); refusing to return wrong cluster labels"
        )

    edges.unpersist()
    return labels
