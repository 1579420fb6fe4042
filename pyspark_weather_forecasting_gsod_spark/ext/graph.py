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
use ``build_graph`` + ``pagerank_on``: the degree-annotated edge list is
persisted BUCKETED by ``src`` (sources/bucketing.py), so the
per-iteration ranks⨝edges join is exchange-free on the edge side —
ranks (one row per node) are the only moving data, proven by the plan
assert in tests/test_graph_bloom_mix.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    if weight_col:
        # PageRank weights are transition propensities: non-positive edges
        # carry no mass (and a src whose weights summed to 0 would divide
        # by zero under ANSI mode — r06 review); dropping them here makes
        # such a src an ordinary dangling node
        e = e.filter(F.col("__w") > 0)
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
    if n == 0:
        nodes.unpersist()
        raise ValueError(
            "pagerank: the (positive-weight) edge list is empty — no graph "
            "to rank"
        )
    # weighted: contributions split ∝ edge weight (out-"degree" = Σ weights)
    outdeg = e.groupBy("__src").agg(
        (F.sum("__w") if weight_col else F.count(F.lit(1)).cast("double")).alias("__deg")
    )
    edge_deg = e.join(outdeg, "__src").cache()
    edge_deg.count()  # materialize once; every round reuses the cached edges

    ranks = _power_loop(
        nodes, n, edge_deg, iterations, damping, node_col, rank_col,
        checkpoint_every,
    )
    if with_degree:
        ranks = _attach_degree(
            ranks, edge_deg, node_col, as_double=weight_col is not None
        )
    result = ranks.localCheckpoint(eager=True)  # ONE job runs all rounds
    nodes.unpersist()
    edge_deg.unpersist()
    return result


def _power_loop(
    nodes: DataFrame,
    n: int,
    edge_deg: DataFrame,
    iterations: int,
    damping: float,
    node_col: str,
    rank_col: str,
    checkpoint_every: int,
) -> DataFrame:
    """The shared lazy power loop over a degree-annotated edge list
    (``__src``, ``__dst``, ``__w``, ``__deg``): per round one ranks⨝edges
    join + one hash agg on ``__dst``."""
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
        # fully lazy and materialize exactly once at the caller
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def _attach_degree(
    ranks: DataFrame, edge_deg: DataFrame, node_col: str, as_double: bool
) -> DataFrame:
    """LEFT-join out-degrees onto the rank table: dangling nodes (appearing
    only as ``dst``) keep their rank row with ``out_degree`` 0 — an inner
    join silently dropped them, breaking the one-row-per-node contract.
    Weighted degrees (Σ of double weights) stay double; only the unweighted
    count casts to long (exact by construction)."""
    deg = edge_deg.select(
        F.col("__src").alias(node_col), F.col("__deg").alias("__outdeg")
    ).distinct()
    out = (
        F.coalesce(F.col("__outdeg"), F.lit(0.0))
        if as_double
        else F.coalesce(F.col("__outdeg").cast("long"), F.lit(0).cast("long"))
    )
    return ranks.join(deg, node_col, "left").select(
        *[c for c in ranks.columns], out.alias("out_degree")
    )


def build_graph(
    edges: DataFrame,
    table: str,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    num_buckets: int = 32,
    assume_distinct: bool = False,
) -> None:
    """Persist the degree-annotated edge list as a managed table BUCKETED
    by ``__src`` (plus a ``{table}_nodes`` side table of node ids with
    out-degrees) — the 100 TB layout ``pagerank``'s docstring promises:
    the multi-edge collapse and degree aggregation are paid ONCE at build
    time, and every subsequent ``pagerank_on`` iteration joins ranks to
    edges with NO exchange on the (huge) edge side, because the bucketed
    scan already satisfies the join's partitioning requirement.

    Mirrors the round-3 IVF fix (``build_ivf_index``/``ivf_search``):
    an expensive corpus-shaped artifact gets a build/probe split instead
    of being recomputed per call."""
    from ..sources.bucketing import write_bucketed

    w_expr = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w_expr.alias("__w")
    )
    if not assume_distinct:
        e = (
            e.groupBy("__src", "__dst").agg(F.sum("__w").alias("__w"))
            if weight_col
            else e.distinct()
        )
    # the collapse + degree agg feed BOTH the edge write and the nodes
    # write — persist so the most expensive pass runs once, not twice
    # (r06 review), released before return
    e = e.persist()
    outdeg = e.groupBy("__src").agg(
        (F.sum("__w") if weight_col else F.count(F.lit(1)).cast("double")).alias(
            "__deg"
        )
    ).persist()
    edge_deg = e.join(outdeg, "__src")
    # sorted-within-bucket so the per-iteration merge join skips its sort
    # on the edge side as well as its exchange
    write_bucketed(
        edge_deg, table, bucket_by="__src", num_buckets=num_buckets,
        sort_by="__src",
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
        .join(
            outdeg.select(F.col("__src").alias("node"), F.col("__deg")),
            "node",
            "left",
        )
        .select("node", F.coalesce("__deg", F.lit(0.0)).alias("out_degree"))
    )
    # shared cleanup (r06 review: the inlined copy missed the lowercased /
    # db-qualified warehouse paths write_bucketed's helper handles)
    from ..sources.bucketing import drop_managed_table

    spark = edges.sparkSession
    drop_managed_table(spark, f"{table}_nodes")
    nodes.write.mode("overwrite").format("parquet").saveAsTable(f"{table}_nodes")
    e.unpersist()
    outdeg.unpersist()


def pagerank_on(
    spark: SparkSession,
    table: str,
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    rank_col: str = "rank",
    with_degree: bool = False,
    degree_as_double: bool = False,
    checkpoint_every: int = 8,
) -> DataFrame:
    """PageRank over a graph persisted by ``build_graph`` — probe-only:
    no distinct pass, no degree aggregation, no cache warm-up. Each
    iteration's ranks⨝edges join reads the bucketed edge table in place
    (zero exchange on the edge side; the per-node rank table is the only
    shuffled data), exactly the property the plan assert checks."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    edge_deg = spark.table(table)
    nodes_t = spark.table(f"{table}_nodes")
    n = nodes_t.count()
    if n == 0:
        raise ValueError(
            f"pagerank_on: graph table {table!r} holds no nodes — it was "
            f"built from an empty edge list"
        )
    nodes = nodes_t.select(F.col("node").alias(node_col))
    ranks = _power_loop(
        nodes, n, edge_deg, iterations, damping, node_col, rank_col,
        checkpoint_every,
    )
    if with_degree:
        out = (
            F.col("out_degree")
            if degree_as_double
            else F.col("out_degree").cast("long")
        )
        ranks = ranks.join(
            nodes_t.select(
                F.col("node").alias(node_col), out.alias("out_degree")
            ),
            node_col,
            "left",
        )
    # Mirror pagerank (r05 ADVICE): materialize once so ONE job runs all
    # power iterations — without this every downstream action (count then
    # collect, say) replays the full lazy loop from the bucketed scan.
    return ranks.localCheckpoint(eager=True)


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
