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
- For adversarial graphs with long chains, the round count grows with
  the diameter; the standard escape is the large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce"),
  which converges in O(log^2 n) — the per-round join structure below
  is the same, so it can be swapped in without changing callers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id1: str,
    id2: str,
    max_iter: int = 25,
) -> DataFrame:
    """Cluster the undirected pair graph; returns (vertex, cluster_id)
    with cluster_id = the minimum vertex id reachable from ``vertex``.

    Deterministic for any id type with a total order (min/least).
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

    for _ in range(max_iter):
        # min label among each vertex's neighbours
        nbr_min = (
            edges.join(labels, edges["_a"] == labels["vertex"])
            .groupBy(F.col("_b").alias("vertex"))
            .agg(F.min("cluster_id").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("cluster_id"), F.coalesce("_nbr_min", "cluster_id")
                ).alias("cluster_id"),
                (F.col("_nbr_min") < F.col("cluster_id")).alias("_changed"),
            )
            .localCheckpoint(eager=True)  # truncate lineage + materialize once
        )
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break

    edges.unpersist()
    return labels
