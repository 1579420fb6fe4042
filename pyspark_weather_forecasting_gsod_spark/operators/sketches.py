"""Mergeable-sketch operators: HyperLogLog distinct counting with rollup.

Not in the reference (its only distinct counting is exact `countDistinct`,
SURVEY.md §2.4 A1); this is the scale extension. Exact distinct counting
shuffles every distinct key; a Datasketches HLL sketch is a few KB per
group, computes in one pass with map-side partials, and — the property that
matters at 100 TB — is *mergeable*: per-partition / per-day / per-shard
sketches union into any coarser grain without rescanning the data. That
turns "distinct users per (day, country, event_type) AND all rollups" from
N scans into one scan + tiny sketch-table aggregations.

Built on Spark's native `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` (JVM Datasketches, Spark ≥3.5) — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` plus its estimate.

    ``lgk`` trades memory for accuracy (2^lgk buckets; 12 → ~1.6% relative
    standard error, ~4 KB per group). Keep the sketch column: it is the
    mergeable artifact downstream rollups consume.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(sketch_col),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
        ).alias("n_distinct_est"),
    )


def hll_rollup(
    sketch_df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
) -> DataFrame:
    """Merge fine-grain sketches to a coarser grouping — no rescan of the
    base data, input is the (tiny) sketch table. Set union is exact under
    merge: the rolled-up estimate has the same error bound as if the sketch
    had been built from the raw rows directly."""
    agg = [
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col),
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "n_distinct_est"
        ),
    ]
    return sketch_df.groupBy(*group_cols).agg(*agg) if group_cols else sketch_df.agg(*agg)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation (heavy hitters).
# ---------------------------------------------------------------------------


def _cms_bucket(key: "F.Column", row: int, width: int) -> "F.Column":
    """Deterministic, engine-portable CMS hash: row ``row``'s bucket for
    ``key`` is the md5 of ``"<row>:<key>"`` folded to an int mod width.
    Seeding by prefix makes the depth rows independent hash functions
    without any engine-specific hash (DuckDB reproduces it exactly)."""
    from ..operators.sampling import hash_bucket

    return hash_bucket(F.concat_ws(":", F.lit(row), key), width, hex_chars=8)


def cms_table(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 16,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``key_col`` as a (row, bucket, count)
    table — depth×width cells, each the EXACT sum of weights hashing there.

    The sketch array is tiny (depth×width rows) and mergeable: summing two
    sketch tables cell-wise is the CMS of the concatenated streams, so
    per-day / per-shard sketches roll up without rescanning — the same
    property ``hll_rollup`` exploits. Build cost is one scan with an
    in-row depth-way fan-out and a map-side-combined hash agg on depth×width
    keys; at 100 TB the exchange carries only the (tiny) cell partials.

    Unlike a sampled or randomized sketch, every cell value is exact and
    deterministic, so the whole estimation pipeline is oracle-hashable.
    ``weight_col`` must be an integral type — a silent cast('long') on
    fractional weights truncated 0.9 to 0 and falsified the 'exact sum'
    guarantee (r06 review); widen the sketch to double cells if fractional
    weights are ever needed.
    """
    if weight_col is not None:
        # case-insensitive lookup, matching Spark's column resolution
        dt = next(
            (d for nm, d in df.dtypes if nm.lower() == weight_col.lower()),
            None,
        )
        # zero-scale decimals (decimal(p,0)) are exactly integral — the
        # long cast cannot truncate them, so they are admitted (r06
        # advice: rejecting them broke previously-working callers)
        import re

        integral = dt in ("tinyint", "smallint", "int", "bigint") or bool(
            re.fullmatch(r"decimal\(\d+,0\)", dt or "")
        )
        if not integral:
            raise ValueError(
                f"cms_table: weight_col must be integral ({weight_col} is "
                f"{dt}); integer types and decimal(p,0) qualify — cast "
                "explicitly or scale fractional weights to integers first"
            )
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                _cms_bucket(F.col(key_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"), w.alias("w"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("w").alias("cell_count"))
    )


def bloom_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Build a Bloom filter of ``key_col`` as the DISTINCT set of occupied
    (r, bucket) cells — depth independent md5-seeded hash rows (the same
    engine-portable cell scheme as ``cms_table``), width buckets per row.

    Like the CMS/HLL tables this artifact is tiny (≤ depth×width rows
    REGARDLESS of input size) and mergeable: the union of two bloom tables
    is the bloom of the concatenated key sets. One scan + one distinct on
    bounded keys; at 100 TB the exchange carries only occupied cell ids.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                _cms_bucket(F.col(key_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select(F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
        .distinct()
    )


def bloom_masks(bloom: DataFrame, depth: int, width: int) -> list[str]:
    """Collect the (bounded: ≤ depth×width rows BY CONSTRUCTION, never
    data-sized) bloom cell table into one compact hex mask per hash row —
    the broadcastable artifact a 100 TB probe embeds as a literal. Hex char
    ``i`` (0-based) of row ``r``'s mask encodes buckets ``4i..4i+3``; bit
    ``b`` of the nibble is set iff bucket ``4i + b`` is occupied."""
    nibbles = [[0] * ((width + 3) // 4) for _ in range(depth)]
    for row in bloom.collect():
        r, bucket = row["r"], row["bucket"]
        nibbles[r][bucket // 4] |= 1 << (bucket % 4)
    return ["".join(format(n, "x") for n in row) for row in nibbles]


def bloom_might_contain(
    key: "F.Column", masks: list[str], width: int
) -> "F.Column":
    """Map-only membership test against literal hex masks from
    ``bloom_masks``: no join, no shuffle, no Python — each hash row is a
    substring + nibble decode + bit test, ANDed across rows. False
    negatives are impossible; false-positive rate ~(occupancy)^depth."""
    depth = len(masks)
    hit = F.lit(True)
    for r in range(depth):
        bucket = _cms_bucket(key, r, width)
        nibble = F.conv(
            F.substring(F.lit(masks[r]), (bucket / 4).cast("int") + 1, 1), 16, 10
        ).cast("int")
        bit_pow = (
            F.when(bucket % 4 == 0, F.lit(1))
            .when(bucket % 4 == 1, F.lit(2))
            .when(bucket % 4 == 2, F.lit(4))
            .otherwise(F.lit(8))
        )
        hit = hit & (F.floor(nibble / bit_pow).cast("int") % 2 == 1)
    return hit


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 16,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the CMS estimate
    is min over the depth rows of the key's cell count (never an
    underestimate; overestimation = collision mass). The sketch table is
    depth×width rows → broadcast; the probe is a map-side join + one
    per-key min agg. A cell no stream element hashed to is an EMPTY cell
    (count 0), so a key with any empty cell estimates 0 — the left join's
    NULL is coalesced to 0 before the min, otherwise F.min would skip it
    and absent keys would inherit the collision mass of their non-empty
    cells."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cms), ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(
                F.coalesce(F.col("cell_count"), F.lit(0).cast("long"))
            ).alias("cms_count")
        )
    )


# ---------------------------------------------------------------------------
# Equi-width histogram sketch: mergeable, DETERMINISTIC quantiles.
# ---------------------------------------------------------------------------


def histogram_table(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Equi-width histogram of ``value_col`` over [lo, hi) as a (bin,
    bin_count) table — the deterministic member of the quantile-sketch
    family. ``approx_quantile`` (GK) and t-digest give tighter error but
    are traversal-order/implementation-defined; a fixed-bin histogram is a
    pure function of the data, so estimates reproduce across engines,
    runs, AND partitionings — and the table is mergeable (cell-wise sum =
    histogram of the concatenated streams), the property that lets per-day
    / per-shard histograms roll up without rescanning, like the HLL/CMS/
    bloom tables above.

    One scan, one map-side-combined hash agg on ≤ bins keys. Values
    outside [lo, hi) clamp into the edge bins (min/max guards belong
    upstream); NULLs are dropped. Thin wrapper over
    ``grouped_histogram_table`` with no group columns (r06 review: the
    bin-clamp expression existed twice and could drift).
    """
    return grouped_histogram_table(df, [], value_col, lo, hi, bins)


def histogram_quantiles(
    hist: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Quantile estimates from a ``histogram_table``: walk the (tiny)
    cumulative histogram to the bin containing rank q·n and interpolate
    linearly inside it — worst-case error one bin width, deterministic.
    Input is ≤ bins rows, so every step here is sketch-table-sized; the
    base data is never touched again. Returns (q, quantile_est). Thin
    wrapper over ``grouped_histogram_quantiles`` with no group columns
    (r06 review: the cumulative-walk/interpolation formula existed twice
    and could drift)."""
    return grouped_histogram_quantiles(hist, [], qs, lo, hi, bins)


def cms_join_size_estimate(
    cms_a: DataFrame,
    cms_b: DataFrame,
    depth: int = 3,
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built on
    the join keys (AMS/CMS inner-product estimator): for each hash row r,
    Σ_b cellA[r,b]·cellB[r,b] never underestimates |A ⨝ B| (every true
    match lands in a shared cell; collisions only add), and the MIN over
    the depth rows is the tightest such bound. This is the
    optimizer-style use of sketches — sizing a join from KB-sized
    mergeable summaries instead of scanning either input — and, because
    the cells are exact deterministic sums, the whole estimate is
    oracle-hashable, unlike a sampled estimator.

    Input: two ``cms_table`` outputs with the same (depth, width). Output:
    one row ``(join_size_est)``. Cost: a join of two depth×width tables.
    """
    a = cms_a.select("r", "bucket", F.col("cell_count").alias("ca"))
    b = cms_b.select("r", "bucket", F.col("cell_count").alias("cb"))
    per_row = (
        a.join(b, ["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("prod"))
    )
    # materialize ALL depth row ids before taking the min: a hash row whose
    # sketches share no cell has true inner product 0 — dropping it (the
    # old inner-join shape) overestimated, and with zero overlap everywhere
    # the estimate was NULL instead of the correct 0
    rows = cms_a.sparkSession.range(depth).select(F.col("id").cast("int").alias("r"))
    full = rows.join(per_row, "r", "left").select(
        F.coalesce(F.col("prod"), F.lit(0)).alias("prod")
    )
    return full.agg(F.min("prod").cast("long").alias("join_size_est"))


def grouped_histogram_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Per-group equi-width histogram: ``histogram_table`` keyed by
    ``group_cols`` — ≤ |groups|·bins rows, one map-side-combined hash agg.
    The grouped member of the mergeable family: per-shard tables sum
    cell-wise per group, and any group's quantiles come from its slice of
    the sketch without touching the base data."""
    w = (hi - lo) / bins
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)).cast("long")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("bin_count"))
    )


def grouped_histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Per-group quantile estimates from a ``grouped_histogram_table``:
    the same cumulative-walk + in-bin interpolation as
    ``histogram_quantiles``, windowed per group — sketch-table-sized
    work, deterministic, error ≤ one bin width per estimate."""
    from pyspark.sql.window import Window

    w = (hi - lo) / bins
    gw = Window.partitionBy(*group_cols)
    cum = hist.withColumn(
        "cum",
        F.sum("bin_count").over(
            gw.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("total", F.sum("bin_count").over(gw))
    from ..session import local_rows_df

    qdf = local_rows_df(hist.sparkSession, [(float(q),) for q in qs], "q double")
    rank = F.col("total") * F.col("q")
    hit = cum.crossJoin(F.broadcast(qdf)).filter(F.col("cum") >= rank)
    first = Window.partitionBy(*group_cols, "q").orderBy("bin")
    return (
        hit.withColumn("__rn", F.row_number().over(first))
        .filter(F.col("__rn") == 1)
        .select(
            *group_cols,
            "q",
            (
                F.lit(lo)
                + (
                    F.col("bin")
                    + (rank - (F.col("cum") - F.col("bin_count")))
                    / F.col("bin_count")
                )
                * F.lit(w)
            ).alias("quantile_est"),
        )
    )
