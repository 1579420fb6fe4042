"""Distributed graph analytics: fixed-iteration PageRank.

The reference has no graph family (SURVEY.md §2); this is a scale
extension that pairs with ``ext/dedup.connected_components`` (min-label
propagation). Iteration discipline differs from CC on purpose: CC needs a
per-round convergence ``count``, so each round materializes; PageRank's
round count is FIXED, so the whole power loop is built lazily over the
once-cached edge list and materialized in ONE job (``localCheckpoint``),
with a lineage-truncating checkpoint every ``checkpoint_every`` rounds
for long runs — measured 2× faster than round-by-round eager
materialization at sf0.1 (pure scheduling overhead, same plan per round).

Scale shape (per iteration): one shuffle to co-locate ranks with edge
sources (join on ``src``) and one hash aggregate on ``dst``. The edge
list with out-degrees is computed once and cached — the iteration loop
touches only (node, rank) tuples, never re-derives the graph. At 100 TB
the edge table would be bucketed by ``src`` so the per-iteration join is
shuffle-free on the edge side; ranks (one row per node) are the only
moving data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    rank_col: str = "rank",
    with_degree: bool = False,
    checkpoint_every: int = 8,
    assume_distinct: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank after a FIXED number of power iterations (deterministic —
    no convergence epsilon, so an ANSI-SQL oracle can unroll the same
    rounds). Nodes are the union of edge endpoints; every node starts at
    ``1/N`` and receives the teleport mass ``(1-damping)/N`` each round;
    dangling nodes (no out-edges) leak their mass, the standard simplified
    formulation.

    Returns one row per node: ``(node_col, rank_col)`` — plus
    ``out_degree`` when ``with_degree`` (served from the already-cached
    degree-annotated edge list, so callers never re-derive the graph just
    to report degrees). Ranks sum to ≤ 1; callers wanting scale-free
    scores should multiply by N. The result is materialized
    (localCheckpoint) before the cached graph artifacts are released, so
    downstream actions never re-derive the edge list.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w_expr = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w_expr.alias("__w")
    )
    if not assume_distinct:
        # multi-edges would double-count contributions; callers that built
        # the edge list with their own DISTINCT skip this pass (weighted
        # multi-edges legitimately sum their weights instead)
        e = (
            e.groupBy("__src", "__dst").agg(F.sum("__w").alias("__w"))
            if weight_col
            else e.distinct()
        )
    nodes = (
        e.select(F.col("__src").alias(node_col))
        .union(e.select(F.col("__dst").alias(node_col)))
        .distinct()
        .cache()
    )
    n = nodes.count()
    # weighted: contributions split ∝ edge weight (out-"degree" = Σ weights)
    outdeg = e.groupBy("__src").agg(
        (F.sum("__w") if weight_col else F.count(F.lit(1)).cast("double")).alias("__deg")
    )
    edge_deg = e.join(outdeg, "__src").cache()
    edge_deg.count()  # materialize once; every round reuses the cached edges

    base = (1.0 - damping) / n
    ranks = nodes.select(node_col, F.lit(1.0 / n).alias(rank_col))
    for i in range(iterations):
        contribs = (
            edge_deg.join(
                ranks.select(
                    F.col(node_col).alias("__src"), F.col(rank_col).alias("__r")
                ),
                "__src",
            )
            .groupBy(F.col("__dst").alias(node_col))
            .agg(F.sum(F.col("__r") * F.col("__w") / F.col("__deg")).alias("__in"))
        )
        ranks = nodes.join(contribs, node_col, "left").select(
            node_col,
            (
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
            ).alias(rank_col),
        )
        # bound lineage for long runs; the common short fixed runs stay
        # fully lazy and materialize exactly once below
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    if with_degree:
        deg = edge_deg.select(
            F.col("__src").alias(node_col),
            F.col("__deg").cast("long").alias("out_degree"),
        ).distinct()
        ranks = ranks.join(deg, node_col)
    result = ranks.localCheckpoint(eager=True)  # ONE job runs all rounds
    nodes.unpersist()
    edge_deg.unpersist()
    return result


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    rank_col: str = "rank",
    assume_distinct: bool = False,
) -> DataFrame:
    """Personalized PageRank: identical power iteration, but the teleport
    mass returns to the SEED set (uniformly) instead of all nodes — the
    similarity/recommendation variant ("rank suppliers by relevance to
    THESE customers"). Seeds is a one-column DataFrame of node ids; seed
    count is aggregated once (a scalar), never collected as data. Same
    single-job lazy-loop shape as ``pagerank``."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    if not assume_distinct:
        e = e.distinct()
    nodes = (
        e.select(F.col("__src").alias(node_col))
        .union(e.select(F.col("__dst").alias(node_col)))
        .distinct()
        .cache()
    )
    nodes.count()
    seed_flag = seeds.select(
        F.col(seeds.columns[0]).alias(node_col)
    ).distinct().withColumn("__seed", F.lit(True))
    tagged = nodes.join(seed_flag, node_col, "left").select(
        node_col, F.coalesce("__seed", F.lit(False)).alias("__seed")
    ).cache()
    n_seeds = tagged.filter(F.col("__seed")).count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed appears in the graph")
    outdeg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    edge_deg = e.join(outdeg, "__src").cache()
    edge_deg.count()

    teleport = F.when(
        F.col("__seed"), F.lit((1.0 - damping) / n_seeds)
    ).otherwise(F.lit(0.0))
    ranks = tagged.select(
        node_col,
        "__seed",
        F.when(F.col("__seed"), F.lit(1.0 / n_seeds))
        .otherwise(F.lit(0.0))
        .alias(rank_col),
    )
    for _ in range(iterations):
        contribs = (
            edge_deg.join(
                ranks.select(
                    F.col(node_col).alias("__src"), F.col(rank_col).alias("__r")
                ),
                "__src",
            )
            .groupBy(F.col("__dst").alias(node_col))
            .agg(F.sum(F.col("__r") / F.col("__deg")).alias("__in"))
        )
        ranks = tagged.join(contribs, node_col, "left").select(
            node_col,
            "__seed",
            (
                teleport
                + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
            ).alias(rank_col),
        )
    result = ranks.select(node_col, rank_col).localCheckpoint(eager=True)
    nodes.unpersist()
    tagged.unpersist()
    edge_deg.unpersist()
    return result
