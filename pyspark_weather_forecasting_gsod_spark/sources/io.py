"""Sources and sinks with explicit schemas.

Reference equivalents: S1 CSV scan with ``inferSchema=True`` (ipynb:187 — two
full passes over the file) and S6 model sink. At scale, schema inference is a
full extra read of 100 TB, so every source here takes an explicit
``StructType``; the driver's synthetic parquet tables get pinned schemas below.
Parquet is the primary format (columnar, vectorized reader, min/max + null
stats enable predicate pushdown; CSV has none of that).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pinned schemas for the driver-provided testdata tables (TESTDATA.md /
# FIXTURES.md §B). Explicit schemas (a) skip footer-merging across many files,
# (b) fail fast on drift, (c) document the contract.
TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    # o_orderdate / l_shipdate are parquet TIMESTAMP(MILLIS, false) → NTZ.
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    # events.ts physical type has varied across driver testdata generations:
    # TIMESTAMP(NANOS, false) (Spark reads int64 ns under
    # spark.sql.legacy.parquet.nanosAsLong) or TIMESTAMP(MICROS, false)
    # (native timestamp). ``load_table``/``events_schema_for`` probe the
    # parquet footer and pick the matching schema + conversion so both
    # generations produce an identical microsecond TimestampType column —
    # the same floor-truncation DuckDB's reader applies.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# footer-probe cache: path -> True if events.ts is int64 nanoseconds
# (legacy NANOS parquet), False if it is a native timestamp column.
_EVENTS_TS_IS_INT64: dict[str, bool] = {}


def _events_ts_int64(spark: SparkSession, path: str) -> bool:
    """Probe the parquet footer (driver-side metadata read, no scan) to see
    whether ``ts`` surfaces as int64 (TIMESTAMP(NANOS) under
    ``nanosAsLong``) or as a native timestamp (MICROS/MILLIS)."""
    cached = _EVENTS_TS_IS_INT64.get(path)
    if cached is None:
        probed = spark.read.parquet(path).schema["ts"].dataType
        cached = isinstance(probed, T.LongType)
        _EVENTS_TS_IS_INT64[path] = cached
    return cached


def events_schema_for(spark: SparkSession, sf_dir: str) -> T.StructType:
    """The pin-able read schema for this testdata generation's events table
    (int64 ts for NANOS files, timestamp ts otherwise) — also what
    ``readStream`` must be given, since streaming requires an explicit
    schema."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = TABLE_SCHEMAS["events"]
    if _events_ts_int64(spark, path):
        return schema
    fields = [
        T.StructField("ts", T.TimestampNTZType()) if f.name == "ts" else f
        for f in schema.fields
    ]
    return T.StructType(fields)


def normalize_events_ts(df: DataFrame, ts_is_int64: bool) -> DataFrame:
    """Make ``ts`` a microsecond TimestampType regardless of source
    generation: int64 ns → floor-truncate to µs (integer domain — ns epoch
    ≈ 1.7e18 exceeds double's 2^53 exact range, never divide as float);
    native NTZ timestamp → reinterpret as UTC instant (session tz is pinned
    UTC, so wall clock == instant, matching DuckDB's naive reader)."""
    if ts_is_int64:
        # floor division, not `div` (which truncates toward zero): a
        # pre-epoch ns value like -1500 must floor to -2 µs to match
        # DuckDB's reader (r06 review; pmod is always non-negative)
        return df.withColumn(
            "ts", F.expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)")
        )
    return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its pinned schema.

    Column pruning and predicate pushdown happen automatically downstream —
    callers should ``select``/``filter`` early and let Catalyst reach the scan.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        ts_int64 = _events_ts_int64(spark, path)
        df = spark.read.schema(events_schema_for(spark, sf_dir)).parquet(path)
        return normalize_events_ts(df, ts_int64)
    schema = TABLE_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    """CSV source with an explicit schema by default.

    Replaces the reference's ``inferSchema=True`` load (ipynb:187): at 100 TB
    an inference pass is a full extra scan, and inferred types drift with the
    data sample (SURVEY.md §1 shows GSOD's declared STRING columns silently
    retyped). The scale-correct default therefore REQUIRES ``schema``.

    ``infer_schema=True`` (r05 VERDICT ask — the last literal reference-API
    gap) opts into the reference's exploratory behavior: Spark's own
    inference pre-scan types the columns. Exploration convenience only —
    production pipelines should pin the ``StructType``. Passing both (or
    neither) a schema and ``infer_schema=True`` raises: silent precedence
    between the two would reintroduce exactly the drift this API prevents.
    """
    if (schema is None) == (not infer_schema):
        raise ValueError(
            "read_csv: pass exactly one of schema=<StructType> (production) "
            "or infer_schema=True (exploration — extra full scan, "
            "sample-dependent types)"
        )
    reader = spark.read.options(header=str(header).lower(), **options)
    if infer_schema:
        return reader.option("inferSchema", "true").csv(path)
    return reader.schema(schema).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink; ``partition_by`` gives partition pruning on read."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines source with a mandatory explicit schema.

    Same rationale as ``read_csv``: schema inference on JSON is a full
    pre-scan AND type-unstable (an all-int sample infers LONG, then a float
    arrives). Corrupt records are quarantined, not dropped: pass
    ``columnNameOfCorruptRecord`` plus a matching StringType field in the
    schema to capture them (PERMISSIVE mode, the default).
    """
    return spark.read.options(**options).schema(schema).json(path)


def compact_small_files(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the table-maintenance pass every long-lived
    100 TB dataset needs (streaming sinks, incremental appends and
    per-partition writers leave thousands of KB-sized parquet files whose
    open/footer cost dominates scan time). Rewrites ``src_dir`` into
    ``dest_dir`` with files sized toward ``target_file_bytes``.

    Sizing is observed, not guessed: the source's total on-disk bytes come
    from the driver-side file listing (metadata only, no data read), and
    the rewrite fans IN via ``coalesce`` — a partition-count change with
    NO shuffle; each output task concatenates whole input splits. Returns
    the output file count.
    """
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(src_dir)  # noqa: SLF001
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src_dir).coalesce(n_files).write.mode("overwrite").parquet(
        dest_dir
    )
    return n_files


def read_avro(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Avro source (``spark-avro``) behind an availability gate: the Avro
    DataSource is an EXTERNAL Spark module (core ships only the Avro jars,
    not the DataSource) and this sandbox does not bundle it. When absent,
    raise a clear pointer instead of Spark's generic failed-to-find error —
    the same honest optional-dep doctrine as the XGBoost/SHAP gates
    (ml/models.py, ml/explain.py). On a cluster with the module deployed
    the same call just works."""
    try:
        return spark.read.options(**options).format("avro").load(path)
    except Exception as exc:  # noqa: BLE001 — AnalysisException subclass varies
        if "Failed to find data source: avro" in str(exc):
            raise NotImplementedError(
                "spark-avro module not deployed in this runtime; add "
                "org.apache.spark:spark-avro_2.13 to spark.jars.packages "
                "(core Avro jars alone do not provide the DataSource)"
            ) from exc
        raise


def write_avro(df: DataFrame, path: str, mode: str = "overwrite", **options: str) -> None:
    """Avro sink, gated exactly like ``read_avro``."""
    try:
        df.write.options(**options).mode(mode).format("avro").save(path)
    except Exception as exc:  # noqa: BLE001
        if "Failed to find data source: avro" in str(exc):
            raise NotImplementedError(
                "spark-avro module not deployed in this runtime; add "
                "org.apache.spark:spark-avro_2.13 to spark.jars.packages "
                "(core Avro jars alone do not provide the DataSource)"
            ) from exc
        raise
