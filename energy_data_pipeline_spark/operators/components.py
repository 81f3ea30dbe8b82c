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
- Strategy is size-gated at RUNTIME (the AQE philosophy): an edge list
  within ``SMALL_GRAPH_MAX_EDGES`` is solved exactly with union-find on
  the driver — per-round scheduling overhead dominates tiny graphs —
  while anything larger runs the distributed loop below. The gate is a
  ``limit(gate+1).collect()`` probe: ONE execution of the pair plan
  that doubles as the full edge list when the limit is not hit, so the
  small path costs a single action total; the choice is driven by the
  actual dup rate, not a planner guess.
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
  ``max_iter=25`` covers astronomical diameters. The jump's parent map
  is the previous round's checkpointed labels (not the in-round hook
  values): one round staler, but labels only decrease and always name
  same-component vertices, so the jump stays correct — and each round
  then needs exactly one materialization (hook, jump, and convergence
  flag all land in one checkpointed output).
- Non-convergence is NEVER silent: if the budget exhausts with labels
  still changing, ``ConvergenceError`` is raised — wrong cluster labels
  flowing into a dedup purge (dropping the wrong documents from a
  training corpus) is strictly worse than a loud failure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Iterative algorithm exhausted its round budget without reaching a
    fixpoint — results would be wrong, so no result is returned."""


# Size gate for the driver-local fast path: an edge list at or under
# this bound (post-dedup, both directions) is solved with union-find on
# the driver — exact same labels, zero iterative rounds. The real
# driver cost at the gate is NOT raw longs: collected PySpark Rows,
# the union-find parent dict, and the createDataFrame round-trip of
# the result tuples together run to roughly 1 KB per edge of transient
# Python heap, so 2^17 edges ≈ a few hundred MB worst case — bounded
# and GC-friendly, where the previous 2^20 gate could spike to
# multi-GB driver RSS on graphs near the boundary. Above the bound the
# distributed pointer-jump loop runs. Same philosophy as AQE's
# broadcast conversion: pick the physical strategy from the RUNTIME
# size of an intermediate, because the planner cannot know the
# near-dup pair count in advance.
SMALL_GRAPH_MAX_EDGES = 1 << 17


def _driver_union_find(edges, spark, vtype) -> DataFrame:
    """Exact connected components on the driver (path-compressed
    union-find, smaller root wins so each component's label is its
    minimum id — identical to the distributed fixpoint). ``edges`` is
    an iterable of (a, b) tuples — plain tuples, not Rows: the caller
    converts and releases the collected Row objects first so only the
    parent dict and result tuples are live here."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField("vertex", vtype, True),
            StructField("cluster_id", vtype, True),
        ]
    )
    out = [(v, find(v)) for v in parent]
    return spark.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    id1: str,
    id2: str,
    max_iter: int = 25,
    shortcut_after: int = 2,
    small_graph_max_edges: int | None = SMALL_GRAPH_MAX_EDGES,
) -> DataFrame:
    """Cluster the undirected pair graph; returns (vertex, cluster_id)
    with cluster_id = the minimum vertex id reachable from ``vertex``.

    Deterministic for any id type with a total order (min/least).
    Strategy is size-gated at runtime: an edge list at or under
    ``small_graph_max_edges`` (None disables the gate) is solved with
    driver-local union-find — per-round scheduling overhead dominates
    tiny graphs, and the pair list is already the small output of LSH
    verification. Larger graphs run the distributed loop: every round
    applies the neighbor-min hook twice in one plan (one scheduled
    action per round — propagation distance 2); rounds >=
    ``shortcut_after`` also shortcut (pointer jump through the previous
    round's labels), making total rounds O(log diameter). Raises
    :class:`ConvergenceError` if ``max_iter`` rounds still leave labels
    changing. Both paths yield identical labels.
    """
    edges_plan = (
        pairs.select(F.col(id1).alias("_a"), F.col(id2).alias("_b"))
        .union(pairs.select(F.col(id2).alias("_a"), F.col(id1).alias("_b")))
        .distinct()
    )
    spark = pairs.sparkSession
    vtype = edges_plan.schema["_a"].dataType

    # size gate, probed with ONE execution of the pair plan: collect up
    # to gate+1 edges via limit. If the limit was not hit, that single
    # collect IS the complete edge list — union-find it directly, with
    # no checkpoint write, no separate emptiness probe, no count, no
    # second collect (the pre-probe scheme cost 4 actions; per-action
    # fixed cost dominates tiny graphs). If gate+1 rows come back, the
    # graph is big: fall through to the checkpointed distributed loop
    # (which re-runs the pair plan once — acceptable on the rare big
    # path, and the loop's checkpoint amortizes it over its rounds).
    if small_graph_max_edges is not None:
        probe = edges_plan.limit(small_graph_max_edges + 1).collect()
        if not probe:
            return edges_plan.select(
                F.col("_a").alias("vertex"), F.col("_b").alias("cluster_id")
            )
        if len(probe) <= small_graph_max_edges:
            # shed the Row objects immediately — plain 2-tuples cost a
            # fraction of a Row, and the probe list is the peak of the
            # small path's driver footprint
            edge_tuples = [(r[0], r[1]) for r in probe]
            del probe
            return _driver_union_find(edge_tuples, spark, vtype)

    # distributed path: eager checkpoint — the pair plan (often a full
    # LSH chain) runs exactly once here; every round reads the
    # materialized edge list
    edges = edges_plan.localCheckpoint(eager=True)

    # early-exit before entering the loop: no pairs -> no clusters
    # (reachable only when the gate is disabled)
    if not edges.take(1):
        return edges.select(
            F.col("_a").alias("vertex"), F.col("_b").alias("cluster_id")
        )

    labels = (
        edges.select(F.col("_a").alias("vertex"))
        .distinct()
        .withColumn("cluster_id", F.col("vertex"))
    )

    def _hook(lab: DataFrame, label_col: str, out_col: str) -> DataFrame:
        """Min label among self+neighbours: adds ``out_col`` =
        least(label_col, min over neighbours), keeps all other columns."""
        sub = lab.select(
            F.col("vertex").alias("_v"), F.col(label_col).alias("_l")
        )
        nbr_min = (
            edges.join(sub, edges["_a"] == sub["_v"])
            .groupBy(F.col("_b").alias("vertex"))
            .agg(F.min("_l").alias("_nbr_min"))
        )
        return (
            lab.join(nbr_min, "vertex", "left")
            .withColumn(
                out_col,
                F.least(
                    F.col(label_col), F.coalesce("_nbr_min", F.col(label_col))
                ),
            )
            .drop("_nbr_min")
        )

    for i in range(max_iter):
        # two hook steps per round: each round is exactly one scheduled
        # action (the eager checkpoint, with the convergence flag
        # collected as an observe() metric of that same action), and
        # action / plan-compile overhead dominates a round's cost long
        # before the extra in-plan shuffle does — so propagate distance 2
        # per action and halve the round count for shallow dedup graphs.
        h1 = _hook(
            labels.select("vertex", F.col("cluster_id").alias("_old")),
            "_old",
            "_mid",
        )
        hooked = _hook(h1, "_mid", "_hook")
        # in-round fixpoint certificate: if the SECOND hook changed
        # nothing relative to the first (_hook == _mid everywhere), then
        # _mid is a fixpoint of the hook operator — which implies every
        # edge has equal endpoint labels, i.e. components are uniformly
        # labeled at their minimum id, the final answer. Observing this
        # flag lets the loop STOP at the end of this round instead of
        # paying a whole confirm round: near-clique dedup graphs (LSH
        # emits most intra-cluster pairs directly) converge inside the
        # first round's two hooks, so clustering costs ONE round.
        late = (F.col("_hook") < F.col("_mid")).alias("_late")
        if i < shortcut_after:
            cand = hooked.select(
                "vertex", "_old", F.col("_hook").alias("_new"), late
            )
        else:
            # shortcut: label(u) <- label(label(u)) — labels are always
            # ids of smaller same-component vertices, so pointer chains
            # double-compress. The parent map is the PREVIOUS round's
            # labels (already checkpointed): one round staler than the
            # in-round hook values, but still ids of same-component
            # vertices with monotonically non-increasing labels, so the
            # jump stays correct and still compresses geometrically —
            # and the round needs only ONE materialization instead of a
            # mid-round checkpoint to protect a self-join on live
            # lineage.
            parent = labels.select(
                F.col("vertex").alias("_pv"), F.col("cluster_id").alias("_pl")
            )
            cand = hooked.join(parent, hooked["_hook"] == parent["_pv"], "left").select(
                "vertex",
                "_old",
                F.least(
                    F.col("_hook"), F.coalesce(F.col("_pl"), F.col("_hook"))
                ).alias("_new"),
                late,
            )
        # ONE action per round: the convergence check is an observe()
        # metric collected DURING the checkpoint materialization (no
        # separate changed-count job at all — CollectMetrics fires on the
        # localCheckpoint action's QueryExecution).
        obs = Observation(f"cc_converge_{i}")
        new_labels = (
            cand.select(
                "vertex",
                F.col("_new").alias("cluster_id"),
                (F.col("_new") < F.col("_old")).alias("_changed"),
                "_late",
            )
            .observe(
                obs,
                F.max(F.col("_changed").cast("int")).alias("any_changed"),
                F.max(F.col("_late").cast("int")).alias("late_changed"),
            )
            .localCheckpoint(eager=True)
        )
        metrics = obs.get  # blocks until the action reports
        labels = new_labels.drop("_changed", "_late")
        # converged if this round changed nothing (vs previous round) OR
        # the in-round certificate held (second hook was a no-op) —
        # either way `labels` is the fixpoint. None = empty label table.
        if not metrics["any_changed"] or not metrics["late_changed"]:
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
