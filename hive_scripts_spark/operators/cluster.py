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

from pyspark.sql import DataFrame, Observation
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
    for i in range(max_iterations):
        # propagate: new label = min(label(node), min over neighbors of label(neighbor))
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .select(F.col("u").alias("node"), "nbr_label")
        )
        cur = labels.join(neighbor_labels, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                "mid_label"
            ),
            "label",
        )
        # the intermediate frames feed both sides of each jump join but
        # are NOT checkpointed (r19): their inputs (labels, edges) are
        # themselves checkpointed, so re-evaluating them per join branch
        # costs bounded extra work INSIDE the round's single
        # materializing job — cheaper than an extra sequential
        # eager-checkpoint job per round (the label values are identical
        # either way: min-propagation is deterministic).
        # pointer jumping: label ← label(label). Plain propagation moves
        # the min one hop per round (O(diameter) rounds); the jump halves
        # the remaining chain each round, so propagation+jump converges in
        # O(log diameter) — a path of 2^max_iterations still resolves.
        # A SECOND jump per round was probed in r20 and FALSIFIED on the
        # real semantic-dedup graph (tools history: it halved rounds on a
        # synthetic 400-node path, but on the real 1080-pair graph the
        # round count stayed 9 at any jump count while per-round cost
        # nearly doubled, 5.4 → 9.4 s — the deeper un-checkpointed plan
        # re-evaluates the propagation once per jump branch). One jump
        # stays.
        parents = cur.select(
            F.col("node").alias("parent_key"),
            F.col("mid_label").alias("parent_label"),
        )
        cur = cur.join(
            parents, cur["mid_label"] == parents["parent_key"], "left"
        ).select(
            "node",
            F.least(
                F.col("mid_label"), F.coalesce("parent_label", "mid_label")
            ).alias("mid_label"),
            "label",
        )
        # convergence rides the SAME action as the checkpoint (r20): an
        # Observation on the pre-checkpoint plan is populated by the
        # eager checkpoint's internal materialization, so the old
        # separate per-round `changed` count job disappears (2 driver-
        # blocking jobs per round → 1; measured 8.9 → 5.7 s on the
        # 400-node-path probe). max over an empty round reads NULL —
        # coalesced to "converged", same as the old count()==0.
        obs = Observation(f"cc_changed_{i}")
        updated = cur.select(
            "node", F.col("mid_label").alias("new_label"), "label"
        ).observe(
            obs,
            F.max((F.col("new_label") < F.col("label")).cast("int")).alias(
                "chg"
            ),
        ).localCheckpoint(eager=True)
        changed = obs.get["chg"] or 0
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
