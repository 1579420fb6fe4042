"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

North-star extensions (BASELINE.json) for training-data pipelines. Scale
design:

  * exact dedup — hash-aggregate on a fingerprint column; one shuffle keyed
    by the fingerprint, no driver data.
  * n-gram Jaccard — EXACT pairwise similarity, but candidate pairs come from
    an inverted shingle index (docs sharing ≥1 shingle), never a cross join.
    Cost is Σ_bucket |bucket|², so it is for capped/small corpora or as the
    verification stage after LSH banding.
  * MinHash+LSH — the 100 TB path: shingle → minhash signature (permutation
    hashes of xxhash64 values) → band buckets → candidate join inside
    buckets only → exact Jaccard verification of candidates. Fully
    expression-based (no Python UDFs); plus an MLlib MinHashLSH variant.
  * SimHash — 64-bit near-dup fingerprint from per-token hash bit votes;
    Hamming-adjacent buckets found by splitting the fingerprint into bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


def exact_dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Drop exact duplicates by ``keys`` (default: all columns). Spark plans
    this as a hash aggregate keyed on ``keys`` — one shuffle, fully
    distributed."""
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()


def exact_dedup_by_fingerprint(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Keep the smallest ``id_col`` per normalized-text fingerprint — the
    deterministic representative-picking variant (plain dropDuplicates keeps
    an arbitrary row)."""
    fp = F.md5(normalize_text(text_col).cast("binary")).alias("__fp")
    ranked = df.select(*df.columns, fp).groupBy("__fp").agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(ranked.select(id_col), on=id_col, how="left_semi")


def word_shingles(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (id, n-word shingle) pairs. Documents with fewer than ``n``
    words produce no shingles."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    shingles = F.expr(
        f"transform(sequence(1, size(split(trim({text_col}), '\\\\s+')) - {n - 1}), "
        + "i -> concat_ws(' ', "
        + ", ".join(f"split(trim({text_col}), '\\\\s+')[i + {j - 1}]" for j in range(n))
        + "))"
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard for all pairs sharing ≥1 shingle.

    Returns (doc_a, doc_b, common, jaccard) with doc_a < doc_b. The
    inverted-index join means cost concentrates in hot shingles — at scale,
    run after LSH banding (``minhash_lsh_pairs``) or cap the corpus slice.
    """
    sh = word_shingles(df, id_col, text_col, n).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        common.join(F.broadcast(sa), on="doc_a")
        .join(F.broadcast(sb), on="doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "common", "jaccard")
    )
    return out


def minhash_signatures(
    sh: DataFrame, id_col: str, num_hashes: int = 32, seed: int = 42
) -> DataFrame:
    """Per-doc minhash signature columns ``mh_0..mh_{k-1}`` from a
    (id, shingle) frame. Permutation hashing is (a*x + b) mod p over
    xxhash64(shingle) — pure expressions, one hash-agg, no UDFs."""
    # 31-bit Mersenne prime: a*x ≤ 2^62 never overflows int64 (ANSI mode).
    p = (1 << 31) - 1
    x = F.pmod(F.xxhash64("shingle", F.lit(seed)), F.lit(p))
    import random

    rng = random.Random(seed)
    aggs = []
    for i in range(num_hashes):
        a, b = rng.randrange(1, p), rng.randrange(0, p)
        aggs.append(F.min((x * F.lit(a) + F.lit(b)) % F.lit(p)).alias(f"mh_{i}"))
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash + banded LSH near-dup detection, exact-Jaccard verified.

    shingle → signature → ``bands`` band-hash keys → candidates = pairs
    sharing any band bucket → exact Jaccard on shingle sets → threshold.
    This is the 100 TB shape: no cross join anywhere; candidate volume is
    controlled by bands/rows-per-band (8 bands × 4 rows ≈ s-curve threshold
    ~0.5), and verification touches only candidates.
    """
    rows_per_band = num_hashes // bands
    sh = word_shingles(df, id_col, text_col, n).persist()
    sig = minhash_signatures(sh, id_col, num_hashes, seed)
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    bucket = banded.selectExpr(
        id_col,
        "stack("
        + ", ".join([str(bands)] + [f"{b}, band_{b}" for b in range(bands)])
        + ") as (band_no, bucket)",
    )
    a = bucket.select(F.col(id_col).alias("doc_a"), "band_no", "bucket")
    b = bucket.select(F.col(id_col).alias("doc_b"), "band_no", "bucket")
    candidates = (
        a.join(b, on=["band_no", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verification of candidates only
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        candidates.join(sa, on="doc_a")
        .join(sb, on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    za = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(F.broadcast(za), "doc_a")
        .join(F.broadcast(zb), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash fingerprint: per-token xxhash64, per-bit ±1 votes,
    sign of the vote sum sets each fingerprint bit. Expression-only
    (explode → agg of shifted sign sums → bit reassembly)."""
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"v_{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_band_buckets(
    sim: DataFrame, id_col: str, band_bits: int = 16
) -> DataFrame:
    """Split the 64-bit simhash into bands; docs sharing any band are
    Hamming-near candidates (≤ 64/band_bits - 1 differing bands)."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bands = [
        (F.shiftrightunsigned(F.col("simhash"), i * band_bits).bitwiseAND(F.lit(mask))).alias(
            f"sb_{i}"
        )
        for i in range(n_bands)
    ]
    banded = sim.select(id_col, *bands)
    return banded.selectExpr(
        id_col,
        "stack("
        + ", ".join([str(n_bands)] + [f"{i}, sb_{i}" for i in range(n_bands)])
        + ") as (band_no, bucket)",
    )
