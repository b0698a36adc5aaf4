"""Iterative graph operators on edge DataFrames.

Connected components is the missing last step of every near-dup
pipeline: pair emitters (MinHash/SimHash/Jaccard — dedup.py) produce
EDGES, but dedup needs GROUPS — if A~B and B~C, then {A,B,C} is one
duplicate cluster even though (A,C) was never emitted. At corpus
scale the pair graph has billions of edges, so the grouping must be
a fixed small number of distributed passes, not a driver-side
union-find.

Algorithm: hash-min label propagation (the standard Pregel-style
formulation, cf. "CC-MR" / GraphX's connectedComponents shape):
every vertex starts labeled with its own id; each round, every
vertex adopts the minimum label in its closed neighborhood;
converged when no label changes. Rounds needed = graph diameter —
for near-dup clusters (tiny, dense clumps) that is 2-3; the loop
is capped and checked, not assumed.

Each round is one join + one aggregation (both on vertex id), all
JVM-side. Labels localCheckpoint per round to cut the exponentially
growing lineage — the classic iterative-DataFrame trap.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

# Count of checkpoint-block release attempts that raised (reset only
# by process restart). The release reaches through private plan APIs
# (queryExecution().logical().rdd()); if a Spark version wraps the
# checkpointed plan so that path breaks, release degrades to a no-op
# and block storage accumulates per CC round — this counter (plus a
# debug log line per failure) is the signal that the silent
# degradation is happening, instead of rediscovering it as a
# disk-full at corpus scale.
RELEASE_FAILURES = 0


def _release_label_blocks(df: DataFrame, what: str) -> None:
    """Best-effort unpersist of a localCheckpoint frame's blocks.
    DataFrame.unpersist is a no-op for local checkpoints (they are
    not cacheManager entries); the blocks live on the checkpointed
    RDD inside the logical plan. Never raises — storage hygiene must
    never fail the labeling — but failures are counted + logged."""
    global RELEASE_FAILURES
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception as ex:
        RELEASE_FAILURES += 1
        _log.debug(
            "connected_components: could not release %s blocks "
            "(plan shape changed under this Spark version?): %s",
            what, ex,
        )


class ConvergenceError(RuntimeError):
    """Raised when an iterative operator exhausts its round budget
    with labels still moving. A partially-propagated labeling is a
    WRONG grouping (it splits components), not a degraded one — so
    the contract is converge-or-raise, never return-best-effort."""


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) — component = min vertex id reachable.

    `edges` is an undirected pair relation (src, dst). Vertices with
    no edges are absent (join the result back to the full vertex set
    with coalesce(component, id) for singleton semantics — see
    dedup_groups in queries.py).

    Raises ConvergenceError if labels are still changing after
    `max_iter` rounds: with pointer jumping each round roughly
    halves label-chain length, so the default 20 rounds covers
    component diameter ~2^20; a graph that needs more gets a loud
    error instead of a silently split grouping. Retry with a larger
    `max_iter` (cost is per-round, so doubling the budget covers
    the square of the diameter).
    """
    sym = edges.select(
        F.col(src).alias("v"), F.col(dst).alias("n")
    ).unionByName(edges.select(F.col(dst).alias("v"), F.col(src).alias("n")))
    # adjacency is reused every round: materialize once. A local
    # CHECKPOINT, not persist — persist keeps the edge relation's
    # full lineage referenced for every round, which pins the shuffle
    # files of whatever produced the edges (a multi-million-doc
    # MinHash candidate+verify graph upstream of dedup's CC measurably
    # holds tens of GB of scratch through the whole loop). The
    # checkpoint cuts that lineage at CC entry, so upstream shuffles
    # become collectable the moment the loop starts.
    adj = sym.distinct().localCheckpoint(eager=True)
    # seed labels with the first propagation round folded in: the
    # min of the closed neighborhood costs the same shuffle a plain
    # distinct-vertices init would, and dense near-dup clumps
    # (diameter 1-2) then converge on the first loop pass.
    labels = (
        adj.groupBy("v").agg(F.least(F.col("v"), F.min("n")).alias("c"))
    ).localCheckpoint()

    from pyspark.sql import Observation

    changed = None  # None = loop never ran (max_iter == 0)
    for _ in range(max_iter):
        # candidate label per vertex: min over its own label and all
        # neighbor labels (closed neighborhood); carry the round-start
        # label so convergence is observable in the same pass
        neigh = (
            adj.join(labels.withColumnRenamed("v", "n"), "n")
            .groupBy("v")
            .agg(F.min("c").alias("nc"))
        )
        stepped = labels.join(neigh, "v", "left").select(
            "v",
            F.col("c").alias("old_c"),
            F.least("c", F.coalesce("nc", "c")).alias("c"),
        )
        # pointer jumping (shortcutting): also adopt the label OF the
        # current label — contracts label chains by half each round,
        # so convergence is O(log diameter) instead of O(diameter)
        # (a 1M-vertex path converges in ~20 rounds, not 1M).
        parent = stepped.select(
            F.col("v").alias("c"), F.col("c").alias("cc")
        )
        # the changed-count rides the SAME job as the checkpoint
        # materialization (Observation), so each round costs ONE job
        # instead of a checkpoint job plus a comparison join job.
        obs = Observation()
        new_labels = (
            stepped.join(parent, "c", "left")
            .select(
                "v",
                "old_c",
                F.least("c", F.coalesce("cc", "c")).alias("c"),
            )
            .observe(
                obs,
                # coalesce: sum over ZERO rows is NULL, and a None
                # changed-count must read as converged (an empty edge
                # relation would otherwise loop max_iter times)
                F.coalesce(
                    F.sum((F.col("c") != F.col("old_c")).cast("long")),
                    F.lit(0),
                ).alias("changed"),
            )
            .select("v", "c")
        ).localCheckpoint()
        # the superseded round's label blocks are dead weight the
        # moment the new checkpoint exists — release them
        _release_label_blocks(labels, "superseded-round label")
        labels = new_labels
        changed = obs.get["changed"]
        if changed == 0:
            break

    _release_label_blocks(adj, "adjacency")
    if changed is None or changed > 0:
        # converge-or-raise still must not leak: the final round's
        # label blocks are unreachable after the raise
        _release_label_blocks(labels, "final-round label")
        # the seed fold (above) is itself one propagation round, so
        # max_iter == 0 on a non-trivial graph is also unverified
        raise ConvergenceError(
            f"connected_components: {changed or 'unknown'} labels still "
            f"changing after max_iter={max_iter} rounds; the grouping "
            "would be silently split — retry with a larger max_iter"
        )
    return labels.select(F.col("v").alias("vertex"), F.col("c").alias("component"))
