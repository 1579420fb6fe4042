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
    # pmod, not %: the sign-preserving % maps negative ids (e.g.
    # xxhash64-derived) to negative shards outside [0, shards), which a
    # worker-to-shard mapping would silently never read (r06 review)
    shard = F.pmod(F.col(id_col), F.lit(shards)).cast("long").alias("shard")
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


def packing_stats(
    packed: DataFrame, budget: int = 2048, token_col: str = "n_tokens"
) -> DataFrame:
    """Per-(shard, seq) packing report: docs per sequence and fill ratio.

    ``fill`` can exceed 1.0 when a document spills past the chunk boundary
    (its tokens belong to later chunks); the *average* fill converging to
    ~1.0 is the packing-efficiency acceptance signal. ``token_col`` and
    ``budget`` must match the values given to ``pack_sequences`` (r06
    review: the column name was hardcoded, so a non-default ``token_col``
    crashed — or silently summed a stale column)."""
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("seq_tokens"),
        F.round(F.sum(token_col) / F.lit(budget), 4).alias("fill"),
    )


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """RAG-style context-window chunking: split each document's token
    stream into overlapping windows of ``chunk_size`` tokens advancing by
    ``stride`` (overlap = chunk_size - stride), the preparation step for
    embedding/indexing a corpus whose documents exceed the encoder's
    context window. The final window is the remainder (shorter than
    chunk_size) unless the previous window already covered it.

    Deterministic layout: chunk k of a doc covers token positions
    [1 + k·stride, 1 + k·stride + chunk_size). One row per chunk:
    ``(id, chunk_id, chunk_start, n_chunk_tokens, chunk_text)``.

    Scale shape: a pure per-row 1→N fan-out (in-row ``transform`` over the
    start-position sequence, then one explode) — no shuffle, no Python;
    chunk count per doc is ⌈(n_tokens - chunk_size)/stride⌉ + 1, so output
    size is a predictable ~n_tokens/stride multiple of the input.
    """
    if stride <= 0 or chunk_size <= 0 or stride > chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    # drop empty tokens (split(trim('')) is ['']) and token-free docs:
    # an empty/whitespace doc used to emit a phantom chunk with
    # n_chunk_tokens=1, and a NULL doc a row of NULLs (r06 review);
    # size(NULL) is -1, so the filter removes NULL-text docs too
    toks = F.array_remove(F.split(F.trim(F.col(text_col)), r"\s+"), "")
    base = df.select(F.col(id_col).alias("__id"), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    # starts 1 + k·stride for k = 0..K with K = ⌈max(0, n - chunk)/stride⌉:
    # the last window is the first whose end reaches the final token (it
    # may be shorter than chunk_size — slice clamps at the end)
    k_max = (
        f"CAST(ceil(greatest(0, size(toks) - {chunk_size}) / {stride}) AS INT)"
    )
    starts = f"transform(sequence(0, {k_max}), k -> 1 + k * {stride})"
    chunks = base.select(
        "__id",
        F.posexplode(
            F.expr(
                f"transform({starts}, s -> struct(s AS start, "
                f"slice(toks, s, {chunk_size}) AS ctoks))"
            )
        ).alias("chunk_id", "c"),
    )
    return chunks.select(
        F.col("__id").alias(id_col),
        "chunk_id",
        F.col("c.start").alias("chunk_start"),
        F.size("c.ctoks").alias("n_chunk_tokens"),
        F.array_join("c.ctoks", " ").alias("chunk_text"),
    )
