"""Connected components over candidate-duplicate pairs.

A dedup pipeline's last mile: LSH/Jaccard emit PAIRS, but dedup acts on
CLUSTERS (keep one doc per component). This implements the alternating
large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — see PAPERS.md), the
standard web-scale formulation:

  large-star: every node connects its LARGER neighbors to its current
              minimum neighbor (or itself)
  small-star: every node connects its smaller-or-equal neighbors to its
              minimum neighbor

Each round is a plain min-aggregation plus a per-EDGE join against the
per-node minimum — deliberately NOT collect_set + explode: collecting a
node's neighbor set materializes a whole component in one task row, and
near-dup web corpora have boilerplate clusters of millions of docs (the
component minimum would OOM a single executor). Per-edge joins keep
every row O(1) regardless of degree; the edge set still contracts
toward a star per component in O(log n) rounds. Compare
label-propagation (O(diameter) rounds) or transitive closure (edge
blow-up): at 100 TB of near-dup web pages whose duplicate chains can be
long, O(log n) rounds of linear-size shuffles is the survivable plan.

The driver loop checks convergence via an edge-count action per round —
bounded driver work (one scalar per round), no collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star round.

    edges: (u, v) with u != v, orientation irrelevant (symmetrized
    here). Emits new edges (neighbor → min(u, Γ(u))) deduplicated.
    Every intermediate row is O(1)-sized — no per-node neighbor arrays.
    """
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # m(u) = min(u, Γ(u)) — a plain partial-aggregating min, then joined
    # back per edge (both sides hash-partitioned on u, so the join
    # reuses the aggregation's exchange)
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    cond = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
    linked = (
        sym.filter(cond)
        .join(mins, "u")
        .select(F.col("v").alias("u2"), F.col("m").alias("v2"))
    )
    if not large:
        # small-star also re-links u itself to the minimum
        linked = linked.union(
            mins.filter(F.col("m") != F.col("u"))
            .select(F.col("u").alias("u2"), F.col("m").alias("v2"))
        )
    return (
        linked.filter(F.col("u2") != F.col("v2"))
        .select(F.col("u2").alias("u"), F.col("v2").alias("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    Only nodes that appear in `pairs` are returned — left-join the full
    corpus and coalesce(component, id) for singleton handling.
    """
    # localCheckpoint (NOT cache) per round: an iterative plan whose
    # lineage compounds across rounds re-analyzes exponentially and
    # OOMs the driver around round ~10 — checkpointing truncates the
    # logical plan to the materialized blocks each round (Spark's
    # standard iterative-algorithm hygiene; GraphX does the same)
    edges = (
        pairs.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_cnt = edges.count()
    for _ in range(max_iter):
        after_large = _star_round(edges, large=True)
        after_small = _star_round(after_large, large=False).localCheckpoint()
        cnt = after_small.count()
        # fixpoint of the combined round = the canonical star forest
        # (each edge points at its component minimum); counts-equal +
        # one-way except ⇒ set equality with a single extra job
        stable = cnt == prev_cnt and after_small.exceptAll(edges).isEmpty()
        edges = after_small
        prev_cnt = cnt
        if stable:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # final star forest: each edge (u, v) has v = component min;
    # the min itself is a member of its own component
    nodes = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node"), F.col("v").alias("component"))
    return nodes.union(roots).distinct()


def canonicalize(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Near-dup collapse, end to end: keep ONE canonical doc (the
    component-minimum id) per duplicate cluster; docs in no pair
    survive untouched. This is the operation a training-data pipeline
    actually runs — LSH/Jaccard pairs and connected components are its
    two internal stages (reference test/validate.py:49-77 checks the
    same keep-one-per-key invariant for exact dups).

    Scale shape: `pairs` may come from any candidate generator
    (minhash_lsh_pairs at 100 TB, exact ngram_jaccard_pairs at
    validation scale); components is O(log n) rounds of linear
    shuffles; the final step is one LEFT ANTI join of the corpus
    against the LOSER set (nodes whose component min is not
    themselves) — the small side at web scale (dup fraction << 1),
    so AQE broadcasts it; survivors never shuffle the corpus.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return corpus.join(losers, id_col, "left_anti")
