"""Connected-components clustering for transitive near-dup resolution.

``dedup_keep_min`` (operators.dedup) drops docs that pair with a smaller
id — correct for pairs but not transitive chains (A~B, B~C, A≁C keeps C
if only (A,B),(B,C) were found and C < B's partner logic misfires).
This module resolves pair sets into full components via iterated
min-label propagation — the standard large-graph approach (alternating
large/small-star in the limit; plain propagation suffices for the
shallow components near-dup graphs produce).

Scale: each iteration is one groupBy(min) + one join, all on
``(node, label)`` long pairs; iterations ≈ component diameter (near-dup
chains are short). Driver loop is over *iterations*, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 10,
) -> DataFrame:
    """Resolve an undirected edge list into ``(node, component)`` where
    ``component`` is the min node id reachable from ``node``.

    Converges when an iteration changes no labels (checked with one
    tiny aggregate per round). Each round's labels are eagerly
    ``localCheckpoint``-ed: the per-round ``count()`` action would
    otherwise recompute the whole unpersisted lineage, making cost (and
    plan depth) multiplicative in iterations. Raises ``RuntimeError``
    if the iteration cap is hit while labels are still changing —
    unconverged labels are silently wrong (they disagree with the
    transitive closure), never return them.
    """
    # both edge directions from ONE evaluation of `pairs` (r19): the
    # union-of-two-selects form evaluated the whole upstream pair
    # pipeline once per branch (for semantic dedup that is the Python
    # cell-matmul stage, twice, inside the checkpoint job); a per-row
    # explode emits (u,v) and (v,u) from a single pass — identical row
    # set after the distinct.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("u"), F.col(b_col).alias("v")
                    ),
                    F.struct(
                        F.col(b_col).alias("u"), F.col(a_col).alias("v")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .distinct()
        .localCheckpoint(eager=True)  # reused every round — scan once
    )
    # label(node) = min(node, min neighbor) to start
    labels = edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("label")).select(
        F.col("u").alias("node"), "label"
    )
    converged = False
    for _ in range(max_iterations):
        # propagate: new label = min(label(node), min over neighbors of label(neighbor))
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .select(F.col("u").alias("node"), "nbr_label")
        )
        propagated = labels.join(neighbor_labels, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                "mid_label"
            ),
            "label",
        )
        # propagated feeds both sides of the jump join but is NOT
        # checkpointed (r19): its inputs (labels, edges) are themselves
        # checkpointed, so re-evaluating it on each join branch costs
        # one extra join+groupBy of bounded depth INSIDE the round's
        # single materializing job — cheaper than the extra sequential
        # eager-checkpoint job the old form paid per round (3 driver-
        # blocking jobs/round → 2; the label values are identical
        # either way: min-propagation is deterministic).
        # pointer jumping: label ← label(label). Plain propagation moves
        # the min one hop per round (O(diameter) rounds); the jump halves
        # the remaining chain each round, so propagation+jump converges in
        # O(log diameter) — a path of 2^max_iterations still resolves.
        parents = propagated.select(
            F.col("node").alias("parent_key"), F.col("mid_label").alias("parent_label")
        )
        updated = (
            propagated.join(
                parents, propagated["mid_label"] == parents["parent_key"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("mid_label"), F.coalesce("parent_label", "mid_label")
                ).alias("new_label"),
                "label",
            )
            .localCheckpoint(eager=True)
        )
        # both reads below hit the checkpointed partitions, not the lineage
        changed = updated.where(F.col("new_label") < F.col("label")).limit(1).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds the cap); raise "
            "max_iterations"
        )
    return labels.select("node", F.col("label").alias("component"))


def dedup_components(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one survivor (min id) per connected near-dup component —
    transitive-closure-correct, unlike single-pass pair dropping."""
    comp = connected_components(pairs)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
