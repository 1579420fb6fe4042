"""Sequence packing for LLM-pretraining data prep.

Not in the reference (no text processing at all — SURVEY.md §2.7); this is a
north-star training-data-pipeline operator. The algorithm is the standard
"concatenate-and-chunk" pack used by most pretraining pipelines: lay the
documents of a shard end-to-end in a deterministic order and cut the stream
into fixed token-budget sequences; each document is assigned to the sequence
in which it *starts*.

Why this formulation and not bin-packing: first-fit-decreasing style packing
is inherently sequential (every placement depends on all previous bins),
which cannot scale past one core. Concatenate-and-chunk is a prefix-sum — a
window cumsum — so it distributes as one hash shuffle on the shard key with
per-shard sorts, and its output is byte-for-byte deterministic (stable order
within shards), which makes training runs reproducible.

Scale shape at 100 TB: `shards` bounds the size of each window partition (a
shard is the unit a downstream data-loader worker reads), so no partition
ever exceeds ~corpus/shards tokens regardless of total corpus size; skew is
impossible by construction because shard assignment is round-robin on the
document id, not on content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int = 64,
) -> DataFrame:
    """Assign every document a ``(shard, seq_id, offset)`` placement.

    - ``shard``: round-robin ``id % shards`` — portable, skew-free.
    - ``offset``: tokens preceding this doc in its shard's concatenated
      stream (exclusive prefix sum over ``(shard) ORDER BY id``).
    - ``seq_id``: ``offset div budget`` — the fixed-size chunk the document
      starts in. A document longer than ``budget`` spills into following
      chunks (standard pretraining behavior: attention masks, not placement,
      handle the boundary).

    One shuffle (hash on ``shard``) + per-partition sort; everything else is
    a projection, so the plan is a single exchange regardless of corpus size.
    """
    shard = (F.col(id_col) % F.lit(shards)).cast("long").alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return (
        df.select(F.col(id_col), F.col(token_col).cast("long").alias(token_col), shard)
        .withColumn("offset", offset)
        .withColumn("seq_id", (F.col("offset") / F.lit(budget)).cast("long"))
    )


def packing_stats(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Per-(shard, seq) packing report: docs per sequence and fill ratio.

    ``fill`` can exceed 1.0 when a document spills past the chunk boundary
    (its tokens belong to later chunks); the *average* fill converging to
    ~1.0 is the packing-efficiency acceptance signal.
    """
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.round(F.sum("n_tokens") / F.lit(budget), 4).alias("fill"),
    )
