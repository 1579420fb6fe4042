"""Sequence packing (ext/packing.py) and Z-order layout (operators/layout.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_weather_forecasting_gsod_spark.ext.packing import pack_sequences, packing_stats
from pyspark_weather_forecasting_gsod_spark.operators.layout import (
    write_zordered,
    zorder_key,
)


def test_pack_sequences_prefix_sums_and_spill(spark):
    # one shard (shards=1) so placement is a pure ordered prefix sum
    df = spark.createDataFrame(
        [
            Row(doc_id=1, n_tokens=100),
            Row(doc_id=2, n_tokens=100),
            Row(doc_id=3, n_tokens=500),  # longer than the budget: spills
            Row(doc_id=4, n_tokens=50),
        ]
    )
    out = {
        r.doc_id: (r.shard, r.offset, r.seq_id)
        for r in pack_sequences(df, budget=256, shards=1).collect()
    }
    assert out[1] == (0, 0, 0)
    assert out[2] == (0, 100, 0)
    assert out[3] == (0, 200, 0)  # starts in seq 0, spills into 1 and 2
    assert out[4] == (0, 700, 2)  # lands where the big doc's stream ended


def test_pack_sequences_sharding_is_roundrobin_and_deterministic(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
    )
    packed = pack_sequences(df, budget=100, shards=4)
    shards = packed.groupBy("shard").count().collect()
    assert {r.shard for r in shards} == {0, 1, 2, 3}
    assert all(r["count"] == 250 for r in shards)  # skew-free by construction
    # deterministic across runs
    a = sorted(packed.collect())
    b = sorted(pack_sequences(df, budget=100, shards=4).collect())
    assert a == b
    # exactly 10 docs of 10 tokens per 100-token sequence, every seq full
    stats = packing_stats(packed, budget=100)
    assert all(r.n_docs == 10 and r.fill == 1.0 for r in stats.collect())


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([Row(a=0b101, b=0b011)])
    key = df.select(zorder_key(["a", "b"], bits=4)).collect()[0].zkey
    # a bits land at even positions, b bits at odd: a=101, b=011
    # key = a0<<0 | b0<<1 | a1<<2 | b1<<3 | a2<<4 | b2<<5
    expected = (1 << 0) | (1 << 1) | (0 << 2) | (1 << 3) | (1 << 4) | (0 << 5)
    assert key == expected


def test_write_zordered_tightens_per_file_bounding_boxes(spark, tmp_path):
    import pyarrow.parquet as pq

    # 64x64 grid, shuffled row order — neither dimension is pre-clustered
    df = (
        spark.range(0, 4096)
        .select(
            (F.col("id") % 64).cast("long").alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.hash("id").alias("noise"),
        )
        .orderBy("noise")
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    df.repartition(8).write.mode("overwrite").parquet(plain)
    write_zordered(df, zed, ["x", "y"], bits=6, num_files=8)

    def avg_box_area(path):
        import glob
        import os

        areas = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            lo = {"x": None, "y": None}
            hi = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        s = col.statistics
                        lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                        hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
            areas.append((hi["x"] - lo["x"] + 1) * (hi["y"] - lo["y"] + 1))
        return sum(areas) / len(areas)

    full = 64 * 64
    # random layout: every file spans ~the whole grid; z-order: a fraction.
    assert avg_box_area(plain) > 0.9 * full
    assert avg_box_area(zed) < 0.4 * full


def test_zorder_key_rejects_sign_bit_overflow(spark):
    import pytest

    from pyspark_weather_forecasting_gsod_spark.operators.layout import (
        zorder_key,
        zorder_key_sql,
    )

    with pytest.raises(ValueError, match="63"):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 bits → sign bit
    with pytest.raises(ValueError, match="63"):
        zorder_key_sql(["a", "b", "c", "d"], bits=16)
    zorder_key(["a", "b", "c"], bits=21)  # 63 bits: allowed
