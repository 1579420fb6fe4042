"""Round-4c additions: PageRank, portable Bloom filter, epoch-weighted
mixing, PQ ANN, small-file compaction."""

import math
import os

import pytest
from pyspark.sql import functions as F

from pyspark_weather_forecasting_gsod_spark.ext.graph import pagerank
from pyspark_weather_forecasting_gsod_spark.operators.sampling import (
    weighted_repeat,
)
from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
    bloom_masks,
    bloom_might_contain,
    bloom_table,
)

SF_GATE = "/root/testdata/sf0.01"


def _declared(name):
    import importlib

    Q = importlib.import_module(
        "pyspark_weather_forecasting_gsod_spark.plans.queries"
    )
    return Q.QUERIES[name][0]


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _numpy_pagerank(edges, iterations=3, damping=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    r = [1.0 / n] * n
    for _ in range(iterations):
        nxt = [(1.0 - damping) / n] * n
        for a, b in edges:
            nxt[idx[b]] += damping * r[idx[a]] / out[a]
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_reference_power_iteration(spark):
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
        ("b", "c"), ("c", "b"), ("c", "d"), ("d", "c"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    want = _numpy_pagerank(edges, iterations=3)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)


def test_pagerank_mass_conserved_without_dangling_nodes(spark):
    # symmetric graph → no dangling nodes → total rank mass stays 1
    e = [(i, (i + 1) % 7) for i in range(7)]
    df = spark.createDataFrame(e + [(b, a) for a, b in e], ["src", "dst"])
    ranks = pagerank(df, iterations=4).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_rejects_zero_iterations(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_pagerank_with_degree_keeps_dangling_nodes(spark):
    """A node appearing only as dst (no out-edges) must keep its rank row
    with out_degree 0 — the r04 ADVICE finding: the inner degree join
    silently dropped it, breaking the one-row-per-node contract."""
    df = spark.createDataFrame([(1, 2), (3, 2)], ["src", "dst"])
    rows = {
        r["node"]: r
        for r in pagerank(df, iterations=2, with_degree=True).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[2]["out_degree"] == 0
    assert rows[1]["out_degree"] == 1 and rows[3]["out_degree"] == 1
    # and the ranks themselves match the plain (degree-free) output
    plain = {r["node"]: r["rank"] for r in pagerank(df, iterations=2).collect()}
    for node, r in rows.items():
        assert r["rank"] == pytest.approx(plain[node], abs=1e-15)


def test_weighted_pagerank_degree_not_truncated(spark):
    """Weighted out-degree is a sum of double weights; the r04 long cast
    truncated 0.75 to 0 — it must survive as a double."""
    df = spark.createDataFrame(
        [(1, 2, 0.5), (1, 3, 0.25), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    rows = {
        r["node"]: r["out_degree"]
        for r in pagerank(
            df, iterations=1, weight_col="w", with_degree=True
        ).collect()
    }
    assert rows[1] == pytest.approx(0.75, abs=1e-12)


def test_build_graph_then_pagerank_on_matches_inline(spark):
    """The persisted bucketed-graph path (build once, probe per run) must
    return exactly the inline path's ranks."""
    from pyspark_weather_forecasting_gsod_spark.ext.graph import (
        build_graph,
        pagerank_on,
    )

    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
        ("b", "c"), ("c", "b"), ("c", "d"), ("d", "c"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    build_graph(df, "g_pr_test", num_buckets=4)
    want = {
        (r["node"], round(r["rank"], 12), r["out_degree"])
        for r in pagerank(df, iterations=3, with_degree=True).collect()
    }
    got = {
        (r["node"], round(r["rank"], 12), r["out_degree"])
        for r in pagerank_on(
            spark, "g_pr_test", iterations=3, with_degree=True
        ).collect()
    }
    assert got == want


def test_pagerank_on_edge_side_is_exchange_free(spark):
    """The property build_graph buys at 100 TB: the per-iteration
    ranks⨝edges join reads the bucketed edge table IN PLACE. With
    broadcast off, the iteration body plans exactly two Exchanges — the
    per-node rank side of the join and the dst aggregation — and none
    above the edge scan (3 would mean the edge table reshuffles every
    round)."""
    import contextlib
    import io

    from pyspark_weather_forecasting_gsod_spark.ext.graph import build_graph

    df = spark.createDataFrame(
        [(i % 17, (i * 7) % 17) for i in range(200)], ["src", "dst"]
    )
    build_graph(df, "g_pr_plan", num_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edge_deg = spark.table("g_pr_plan")
        ranks = spark.table("g_pr_plan_nodes").select(
            F.col("node").alias("__src"), F.lit(0.25).alias("__r")
        )
        contribs = (
            edge_deg.join(ranks, "__src")
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("__r") * F.col("__w") / F.col("__deg")).alias("__in"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            contribs.explain("formatted")
        p = buf.getvalue()
        assert "SortMergeJoin" in p
        assert "SelectedBucketsCount" in p  # bucketed scan engaged
        import re

        # formatted mode prints each node once in the tree and once in the
        # detail section — count detail headers
        assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_never_false_negative(spark):
    keys = [f"key{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    masks = bloom_masks(bloom_table(df, "k", depth=3, width=512), 3, 512)
    probe = spark.createDataFrame(
        [(f"key{i}",) for i in range(400)], ["k"]
    ).withColumn("hit", bloom_might_contain(F.col("k"), masks, 512))
    got = {r["k"]: r["hit"] for r in probe.collect()}
    # every stored key MUST test positive
    assert all(got[k] for k in keys)
    # an undersized filter on 200 keys still rejects most absent keys
    absent_hits = sum(got[f"key{i}"] for i in range(200, 400))
    assert absent_hits < 100


def test_bloom_masks_encode_exactly_the_occupied_cells(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["k"])
    tbl = bloom_table(df, "k", depth=2, width=256)
    cells = {(r["r"], r["bucket"]) for r in tbl.collect()}
    masks = bloom_masks(tbl, 2, 256)
    decoded = set()
    for r, mask in enumerate(masks):
        for i, ch in enumerate(mask):
            nib = int(ch, 16)
            for b in range(4):
                if nib >> b & 1:
                    decoded.add((r, 4 * i + b))
    assert decoded == cells


def test_bloom_table_is_mergeable(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(40)], ["k"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(40)], ["k"])
    both = a.union(b)
    merged = bloom_table(a, "k", 3, 512).union(bloom_table(b, "k", 3, 512)).distinct()
    direct = bloom_table(both, "k", 3, 512)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_bloom_prune_dedup_query_negative_rows_are_new(spark):
    rows = _declared("bloom_prune_dedup")(spark, SF_GATE).collect()
    assert rows
    # bloom negatives are CERTIFIED new (no-false-negative property)
    assert all(r["is_new"] for r in rows if not r["bloom_positive"])


# ---------------------------------------------------------------------------
# weighted_repeat (epoch mixing)
# ---------------------------------------------------------------------------


def test_weighted_repeat_integer_weights_exact(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], ["id"])
    out = weighted_repeat(df, "id", F.lit(2.0)).collect()
    assert len(out) == 40
    per = {}
    for r in out:
        per.setdefault(r["id"], []).append(r["epoch"])
    assert all(sorted(v) == [1, 2] for v in per.values())


def test_weighted_repeat_zero_weight_drops(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    assert weighted_repeat(df, "id", F.lit(0.0)).count() == 0


def test_weighted_repeat_fractional_rate_and_stability(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], ["id"])
    out = weighted_repeat(df, "id", F.lit(1.5)).collect()
    # realized copies within a loose band around 1.5×
    assert 400 * 1.3 <= len(out) <= 400 * 1.7
    # STABILITY: adding rows never changes an existing row's copy count
    bigger = spark.createDataFrame([(i,) for i in range(800)], ["id"])
    out2 = weighted_repeat(bigger, "id", F.lit(1.5)).collect()
    count1 = {}
    for r in out:
        count1[r["id"]] = count1.get(r["id"], 0) + 1
    count2 = {}
    for r in out2:
        if r["id"] < 400:
            count2[r["id"]] = count2.get(r["id"], 0) + 1
    assert count1 == count2


# ---------------------------------------------------------------------------
# PQ ANN
# ---------------------------------------------------------------------------


def test_pq_ann_topk_recall_gate(spark):
    rows = _declared("pq_ann_topk")(spark, SF_GATE).collect()
    recs = {r.qid: r.recall_vs_exact for r in rows}
    assert recs, "no queries produced results"
    # random 64-d corpus with a flat non-self cosine band is the hardest
    # regime for quantized scoring; 32×32 codes measured 0.68 mean here
    assert sum(recs.values()) / len(recs) >= 0.5
    assert min(recs.values()) >= 0.2
    # the self-neighbor (the one structurally meaningful match) is always
    # recovered at rank 1
    for r in rows:
        if r.rank == 1:
            assert r.nid == r.qid


def test_pq_codes_shape_and_range(spark, tmp_path):
    from pyspark_weather_forecasting_gsod_spark.ext.similarity import (
        build_pq_index,
    )
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    emb = load_table(spark, SF_GATE, "embeddings")
    d = str(tmp_path / "pq")
    build_pq_index(emb, d, m=8, k=4)
    codes = spark.read.parquet(f"{d}/codes").collect()
    assert len(codes) == emb.count()
    assert all(len(r["codes"]) == 8 for r in codes)
    assert all(0 <= c < 4 for r in codes for c in r["codes"])
    books = spark.read.parquet(f"{d}/codebooks").collect()
    assert len(books) == 8 * 4
    assert all(len(r["cvec"]) == 8 for r in books)  # 64 / m


def test_pq_rejects_nondivisible_subspaces(spark):
    from pyspark_weather_forecasting_gsod_spark.ext.similarity import (
        build_pq_index,
    )
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    emb = load_table(spark, SF_GATE, "embeddings")
    with pytest.raises(ValueError):
        build_pq_index(emb, "/tmp/unused_pq", m=7, k=4)


# ---------------------------------------------------------------------------
# small-file compaction
# ---------------------------------------------------------------------------


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    from pyspark_weather_forecasting_gsod_spark.sources.io import (
        compact_small_files,
    )

    src = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)  # 64 tiny files
    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_in == 64
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    target = math.ceil(total / 4)  # aim for ~4 output files
    n_out = compact_small_files(spark, src, dest, target_file_bytes=target)
    files_out = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert len(files_out) == n_out <= 8
    # content survives the rewrite
    assert (
        spark.read.parquet(dest).agg(F.sum("v")).first()[0]
        == df.agg(F.sum("v")).first()[0]
    )


# ---------------------------------------------------------------------------
# histogram sketch
# ---------------------------------------------------------------------------


def test_histogram_quantiles_error_bounded_by_bin_width(spark):
    rows = _declared("histogram_quantiles_value")(spark, SF_GATE).collect()
    assert {r["q"] for r in rows} == {0.5, 0.9, 0.99}
    for r in rows:
        assert r["abs_err"] <= 2.0  # one bin width by construction


def test_histogram_table_is_mergeable(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
        histogram_table,
    )

    a = spark.range(0, 500).withColumn("v", F.col("id") % 97 * 1.0)
    b = spark.range(500, 900).withColumn("v", F.col("id") % 89 * 1.0)
    merged = (
        histogram_table(a, "v", 0.0, 100.0, 20)
        .unionByName(histogram_table(b, "v", 0.0, 100.0, 20))
        .groupBy("bin")
        .agg(F.sum("bin_count").alias("bin_count"))
    )
    direct = histogram_table(a.unionByName(b), "v", 0.0, 100.0, 20)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_histogram_quantiles_exact_on_point_mass(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
        histogram_quantiles,
        histogram_table,
    )

    # all mass in one bin → interpolation stays inside that bin
    df = spark.range(100).withColumn("v", F.lit(7.3))
    h = histogram_table(df, "v", 0.0, 10.0, 10)
    got = {r["q"]: r["quantile_est"] for r in histogram_quantiles(h, [0.5], 0.0, 10.0, 10).collect()}
    assert 7.0 <= got[0.5] <= 8.0


# ---------------------------------------------------------------------------
# JS divergence
# ---------------------------------------------------------------------------


def test_source_js_divergence_is_a_bounded_metric(spark):
    rows = _declared("source_js_divergence")(spark, SF_GATE).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["js_vs_rest"] <= 1.0  # log2 JS is bounded by 1


def test_js_divergence_zero_for_identical_halves(spark):
    # two "sources" with identical token streams → JS ≈ 0 for both
    import importlib

    A = importlib.import_module(
        "pyspark_weather_forecasting_gsod_spark.plans.analytics_extra"
    )
    # reuse the declared query's math via a tiny local frame written to
    # parquet-less path: easier to assert the formula directly in python
    p = [0.5, 0.5]
    q = [0.5, 0.5]
    js = sum(
        0.5 * pi * math.log2(2 * pi / (pi + qi))
        + 0.5 * qi * math.log2(2 * qi / (pi + qi))
        for pi, qi in zip(p, q)
    )
    assert js == 0.0
    assert hasattr(A, "source_js_divergence")


# ---------------------------------------------------------------------------
# weighted_sample_k
# ---------------------------------------------------------------------------


def test_weighted_sample_k_deterministic_and_topk_planned(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.sampling import (
        weighted_sample_k,
    )

    df = spark.range(500).withColumn("w", (F.col("id") % 10 + 1).cast("double"))
    s1 = weighted_sample_k(df, "id", F.col("w"), 50).collect()
    s2 = weighted_sample_k(df.repartition(13), "id", F.col("w"), 50).collect()
    assert sorted(r["id"] for r in s1) == sorted(r["id"] for r in s2)
    plan = (
        weighted_sample_k(df, "id", F.col("w"), 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_k_prefers_heavy_rows(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.sampling import (
        weighted_sample_k,
    )

    # ids 0..249 weight 1, ids 250..499 weight 100 → sample should be
    # dominated by the heavy half
    df = spark.range(500).withColumn(
        "w", F.when(F.col("id") < 250, 1.0).otherwise(100.0)
    )
    got = weighted_sample_k(df, "id", F.col("w"), 100).collect()
    heavy = sum(1 for r in got if r["id"] >= 250)
    assert heavy >= 80


def test_weighted_sample_k_drops_nonpositive_weights(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.sampling import (
        weighted_sample_k,
    )

    df = spark.range(10).withColumn(
        "w", F.when(F.col("id") < 5, -1.0).otherwise(2.0)
    )
    got = weighted_sample_k(df, "id", F.col("w"), 10).collect()
    assert sorted(r["id"] for r in got) == [5, 6, 7, 8, 9]


# ---------------------------------------------------------------------------
# incremental near-dup probe
# ---------------------------------------------------------------------------


def test_neardup_index_probe_recall_gate(spark):
    rows = _declared("neardup_index_probe")(spark, SF_GATE).collect()
    assert rows
    r = rows[0]
    assert r["n_false_positive"] == 0  # verify stage is exact Jaccard
    assert r["n_exact_flagged"] >= 5  # planted cross-source near-dups exist
    assert r["recall_vs_exact"] >= 0.9  # measured 1.0 at sf0.01
    # flagged rows carry a verified match at/above the threshold
    for row in rows:
        if row["best_match"] is not None:
            assert row["best_jaccard"] >= 0.5


# ---------------------------------------------------------------------------
# quantile binning
# ---------------------------------------------------------------------------


def test_quantile_bins_balanced_and_ordered(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.quantiles import (
        quantile_bins,
    )

    df = spark.range(1000).withColumn("v", (F.col("id") * 37 % 1000).cast("double"))
    out = quantile_bins(df, "v", n_bins=10)
    per = {r["bin"]: r["cnt"] for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(per) == set(range(10))
    # equal-frequency: v is a permutation of 0..999 → 100 ± 1 per decile
    assert all(99 <= c <= 101 for c in per.values())
    # bins are ordered by value
    ranges = {
        r["bin"]: (r["lo"], r["hi"])
        for r in out.groupBy("bin").agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()
    }
    for b in range(9):
        assert ranges[b][1] <= ranges[b + 1][0]


def test_quantile_bins_rejects_single_bin(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.quantiles import (
        quantile_bins,
    )

    with pytest.raises(ValueError):
        quantile_bins(spark.range(5).withColumn("v", F.col("id") * 1.0), "v", n_bins=1)


# ---------------------------------------------------------------------------
# attribution
# ---------------------------------------------------------------------------


def test_attribution_matches_bruteforce(spark):
    rows = _declared("attribution_last_touch")(spark, SF_GATE).collect()
    got = {(r["purchase_id"]): (r["click_id"], r["micros_since_click"]) for r in rows}

    import duckdb

    con = duckdb.connect()
    ev = con.execute(
        "SELECT event_id, user_id, event_type, epoch_us(ts) AS us"
        " FROM read_parquet('/root/testdata/sf0.01/events.parquet')"
        " ORDER BY user_id, us, event_id"
    ).fetchall()
    want = {}
    last_click = {}
    for eid, uid, typ, us in ev:
        if typ == "purchase" and uid in last_click:
            cid, cus = last_click[uid]
            if us - cus <= 7200 * 1_000_000:
                want[eid] = (cid, us - cus)
        if typ == "click":
            last_click[uid] = (eid, us)
    assert got == want
    assert len(got) > 0


# ---------------------------------------------------------------------------
# streaming additions (oracle covers equality; these check the machinery)
# ---------------------------------------------------------------------------


def test_streaming_sketch_merge_is_multibatch_and_complete(spark):
    from pyspark_weather_forecasting_gsod_spark.streaming.stream import (
        run_streaming_sketch_merge,
    )

    out = run_streaming_sketch_merge(spark, n_rows=1000, rows_per_batch=200)
    rows = out.collect()
    # the runner raises unless ≥2 non-empty batches merged; counts must
    # cover the whole stream
    assert sum(r["bin_count"] for r in rows) == 1000


# ---------------------------------------------------------------------------
# image perceptual-hash near-dup
# ---------------------------------------------------------------------------


def test_hamming_band_join_equals_bruteforce(spark):
    from pyspark_weather_forecasting_gsod_spark.ext.dedup import (
        hamming_neardup_pairs,
    )

    import random

    rng = random.Random(7)
    base = [rng.getrandbits(63) for _ in range(120)]
    rows = [(i, h) for i, h in enumerate(base)]
    # plant close pairs: flip ≤3 bits
    for j in range(20):
        h = base[j]
        for b in rng.sample(range(63), j % 4):
            h ^= 1 << b
        rows.append((1000 + j, h))
    df = spark.createDataFrame(rows, ["id", "h"])
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_neardup_pairs(df, "id", "h", max_hamming=4).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = bin(rows[i][1] ^ rows[j][1]).count("1")
            if d <= 4:
                a, b = sorted((rows[i][0], rows[j][0]))
                want.add((a, b, d))
    assert got == want  # lossless: pigeonhole banding misses nothing
    assert len(want) >= 20


def test_image_phash_neardup_finds_exactly_planted_pairs(spark):
    rows = _declared("image_phash_neardup")(spark, SF_GATE).collect()
    planted = [r for r in rows if r["id_b"] - r["id_a"] == 1_000_000]
    assert len(planted) == 50  # every doc_id % 10 == 0 variant recovered
    assert all(r["hamming"] <= 8 for r in rows)
    assert len(rows) == 50  # chained-digest frames: no false neighbors


def test_dhash_bmp_stable_and_perturbation_sensitive(spark):
    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        dhash_bmp,
        synthesize_bmp,
    )

    import hashlib

    d1 = hashlib.md5(b"image one").digest() * 24
    d2 = hashlib.md5(b"image two").digest() * 24
    p1, p2 = synthesize_bmp(d1[:384]), synthesize_bmp(d2[:384])
    assert dhash_bmp(p1) == dhash_bmp(p1)  # deterministic
    h1, h2 = dhash_bmp(p1), dhash_bmp(p2)
    # unrelated images: large distance (tiled rows → compare row-wise dup,
    # still ≥ some bits differ); just assert they are not near
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") > 0
    pert = bytearray(p1)
    pert[54] = 255 - pert[54]
    hp = dhash_bmp(bytes(pert))
    assert bin((h1 ^ hp) & ((1 << 64) - 1)).count("1") <= 8


# ---------------------------------------------------------------------------
# unpivot + HLL sliding windows
# ---------------------------------------------------------------------------


def test_unpivot_preserves_wide_values(spark):
    rows = _declared("unpivot_event_stats")(spark, SF_GATE).collect()
    # 5 event types × 3 metrics
    assert len(rows) == 15
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["metric"]] = r["metric_value"]
    for mets in by_type.values():
        assert set(mets) == {"avg_value", "min_value", "max_value"}
        assert mets["min_value"] <= mets["avg_value"] <= mets["max_value"]


def test_hll_sliding_windows_match_exact_distincts(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    est = {
        r["window_end_hour"]: r["n_distinct_est"]
        for r in _declared("hll_sliding_distinct")(spark, SF_GATE).collect()
    }
    ev = load_table(spark, SF_GATE, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "user_id"
    )
    exact_rows = ev.collect()
    from collections import defaultdict

    per_hour = defaultdict(set)
    for r in exact_rows:
        per_hour[r["hour"]].add(r["user_id"])
    import datetime

    for w, e in est.items():
        users = set()
        for off in range(3):
            users |= per_hour.get(w - datetime.timedelta(hours=off), set())
        if users:
            assert abs(e - len(users)) / len(users) <= 0.02


def test_grouped_histogram_quantiles_error_bounded(spark):
    rows = _declared("histogram_quantiles_by_type")(spark, SF_GATE).collect()
    assert len(rows) == 10  # 5 event types × 2 quantiles
    for r in rows:
        assert r["abs_err"] <= 2.0  # one bin width


def test_grouped_histogram_table_merges_per_group(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
        grouped_histogram_table,
    )

    a = spark.range(600).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 50 * 1.0).alias("v")
    )
    b = spark.range(600, 1000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 40 * 1.0).alias("v")
    )
    merged = (
        grouped_histogram_table(a, ["g"], "v", 0.0, 50.0, 10)
        .unionByName(grouped_histogram_table(b, ["g"], "v", 0.0, 50.0, 10))
        .groupBy("g", "bin")
        .agg(F.sum("bin_count").alias("bin_count"))
    )
    direct = grouped_histogram_table(a.unionByName(b), ["g"], "v", 0.0, 50.0, 10)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_period_over_period_first_month_null_and_deltas(spark):
    rows = sorted(
        _declared("period_over_period_revenue")(spark, SF_GATE).collect(),
        key=lambda r: r["month"],
    )
    assert rows[0]["prev_revenue"] is None and rows[0]["mom_delta"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["prev_revenue"] == prev["revenue"]
        assert cur["mom_delta"] == pytest.approx(
            round(cur["revenue"] - prev["revenue"], 4), abs=1e-9
        )


# ---------------------------------------------------------------------------
# property tests (hypothesis) for the round-4c operators
# ---------------------------------------------------------------------------


def test_property_bloom_has_no_false_negative_ever(spark):
    from hypothesis import given, settings, strategies as st

    key = st.text(
        alphabet="abcdefghij0123456789", min_size=1, max_size=12
    )

    @settings(max_examples=5, deadline=None)
    @given(st.lists(key, min_size=1, max_size=40, unique=True))
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], ["k"])
        masks = bloom_masks(bloom_table(df, "k", 2, 64), 2, 64)
        got = {
            r["k"]: r["hit"]
            for r in df.withColumn(
                "hit", bloom_might_contain(F.col("k"), masks, 64)
            ).collect()
        }
        assert all(got.values())  # stored keys always test positive

    check()


def test_property_weighted_repeat_matches_formula(spark):
    import hashlib

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True),
        st.sampled_from([0.0, 0.4, 1.0, 1.7, 2.5]),
    )
    def check(ids, w):
        df = spark.createDataFrame([(i,) for i in ids], ["id"])
        got = {}
        for r in weighted_repeat(df, "id", F.lit(w)).collect():
            got[r["id"]] = got.get(r["id"], 0) + 1
        buckets = 1_000_000
        for i in ids:
            b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % buckets
            want = int(w) + (1 if b < (w - int(w)) * buckets else 0)
            assert got.get(i, 0) == want

    check()


def test_property_scd2_current_slice_equals_snapshot(spark):
    from hypothesis import given, settings, strategies as st

    from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
        scd2_apply,
        scd2_init,
    )

    kv = st.dictionaries(
        st.integers(0, 8), st.sampled_from(["a", "b", "c"]), min_size=1, max_size=6
    )

    @settings(max_examples=5, deadline=None)
    @given(kv, kv, kv)
    def check(s1, s2, s3):
        def df(d):
            return spark.createDataFrame(list(d.items()), ["k", "attr"])

        dim = scd2_init(df(s1), ["k"], "2024-01-01 00:00:00")
        dim = scd2_apply(dim, df(s2), ["k"], "2024-02-01 00:00:00")
        dim = scd2_apply(dim, df(s3), ["k"], "2024-03-01 00:00:00")
        current = {
            r["k"]: r["attr"]
            for r in dim.filter(F.col("is_current")).collect()
        }
        assert current == s3  # the current slice IS the latest snapshot
        # closed rows all carry a valid_to; open rows never do
        for r in dim.collect():
            assert (r["valid_to"] is None) == bool(r["is_current"])

    check()


def test_aqp_estimate_ci_covers_and_is_deterministic(spark):
    r1 = _declared("aqp_sampled_revenue")(spark, SF_GATE).first()
    assert r1["ci_covers_exact"]
    assert r1["ci_low"] <= r1["sum_est"] <= r1["ci_high"]
    # deterministic sample → bit-identical estimate on a second run
    r2 = _declared("aqp_sampled_revenue")(spark, SF_GATE).first()
    assert r1.asDict() == r2.asDict()
    # sampled count within 4 sigma of rate * N
    import math

    expected = 0.02 * r1["exact_count"]
    assert abs(r1["n_sampled"] - expected) <= 4 * math.sqrt(expected)


# ---------------------------------------------------------------------------
# personalized PageRank + OHLC bars
# ---------------------------------------------------------------------------


def _numpy_ppr(edges, seeds, iterations=3, damping=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    s = [n for n in nodes if n in seeds]
    r = [1.0 / len(s) if n in seeds else 0.0 for n in nodes]
    for _ in range(iterations):
        nxt = [
            (1.0 - damping) / len(s) if n in seeds else 0.0 for n in nodes
        ]
        for a, b in edges:
            nxt[idx[b]] += damping * r[idx[a]] / out[a]
        r = nxt
    return {nodes[i]: r[i] for i in range(len(nodes))}


def test_personalized_pagerank_matches_reference(spark):
    from pyspark_weather_forecasting_gsod_spark.ext.graph import (
        personalized_pagerank,
    )

    e = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "d"), ("d", "c")]
    df = spark.createDataFrame(e, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, seeds, iterations=4).collect()
    }
    want = _numpy_ppr(e, {"a"}, iterations=4)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    # mass concentrates near the seed: a outranks the far node d
    assert got["a"] > got["d"]


def test_personalized_pagerank_requires_seed_in_graph(spark):
    from pyspark_weather_forecasting_gsod_spark.ext.graph import (
        personalized_pagerank,
    )

    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("zzz",)], ["node"])
    with pytest.raises(ValueError):
        personalized_pagerank(df, seeds)


def test_ohlc_bars_match_bruteforce(spark):
    import datetime

    from pyspark_weather_forecasting_gsod_spark.operators.temporal import (
        ohlc_bars,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for g in ("x", "y"):
        for i in range(50):
            rows.append(
                (
                    g,
                    base + datetime.timedelta(minutes=7 * i),
                    float((i * 37 + (ord(g) % 5)) % 23),
                    i,
                )
            )
    df = spark.createDataFrame(rows, ["g", "ts", "v", "seq"])
    got = {
        (r["g"], r["bucket"]): (r["open"], r["high"], r["low"], r["close"], r["n_points"])
        for r in ohlc_bars(df, "ts", "v", ["g"], "1 hour", tie_col="seq").collect()
    }
    from collections import defaultdict

    buckets = defaultdict(list)
    for g, ts, v, seq in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        buckets[(g, b)].append((ts, seq, v))
    for k, pts in buckets.items():
        pts.sort()
        vals = [p[2] for p in pts]
        assert got[k] == (pts[0][2], max(vals), min(vals), pts[-1][2], len(pts))
    assert set(got) == set(buckets)


def test_weighted_pagerank_matches_reference(spark):
    # weighted edges: contribution splits proportional to weight
    edges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=3, weight_col="w").collect()
    }
    nodes = ["a", "b", "c"]
    out_w = {"a": 4.0, "b": 1.0, "c": 1.0}
    r = {n: 1 / 3 for n in nodes}
    for _ in range(3):
        nxt = {n: 0.15 / 3 for n in nodes}
        for s, d, w in edges:
            nxt[d] += 0.85 * r[s] * w / out_w[s]
        r = nxt
    for n in nodes:
        assert got[n] == pytest.approx(r[n], abs=1e-12)
    # b receives 3x c's share from a → outranks it
    assert got["b"] > got["c"]


def test_weighted_pagerank_sums_parallel_edges(spark):
    # two parallel (a,b) edges of weight 1 == one edge of weight 2
    two = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "b", 1.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "w"],
    )
    one = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "w"],
    )
    g2 = {r["node"]: r["rank"] for r in pagerank(two, iterations=3, weight_col="w").collect()}
    g1 = {r["node"]: r["rank"] for r in pagerank(one, iterations=3, weight_col="w").collect()}
    for n in g1:
        assert g2[n] == pytest.approx(g1[n], abs=1e-12)


def test_pagerank_on_is_materialized(spark):
    """r05 ADVICE: pagerank_on must localCheckpoint like pagerank — a
    caller doing count() then collect() pays the power loop once, and the
    returned plan is a materialized scan, not the lazy iteration tree."""
    from pyspark_weather_forecasting_gsod_spark.ext.graph import (
        build_graph,
        pagerank_on,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], ["src", "dst"]
    )
    build_graph(df, "g_pr_ckpt", num_buckets=2)
    ranks = pagerank_on(spark, "g_pr_ckpt", iterations=2)
    plan = ranks._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    assert ranks.count() == 3


def test_shuffle_shards_total_order_and_determinism(spark):
    """shuffle_shards yields a permutation: every row keeps exactly one
    (shard, pos) slot, positions are contiguous 1..n within each shard,
    the assignment is identical across runs, and a different seed gives a
    genuinely different order (an epoch re-shuffle)."""
    from pyspark_weather_forecasting_gsod_spark.operators.sampling import shuffle_shards

    df = spark.range(500).withColumnRenamed("id", "k")
    a = shuffle_shards(df, "k", n_shards=8, seed="e1").collect()
    assert len(a) == 500 and len({(r["shard"], r["pos"]) for r in a}) == 500
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    b = shuffle_shards(df, "k", n_shards=8, seed="e1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = shuffle_shards(df, "k", n_shards=8, seed="e2").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    # not the identity order: the permutation actually shuffles
    first_shard = sorted((r["pos"], r["k"]) for r in a if r["shard"] == 0)
    assert [k for _, k in first_shard] != sorted(k for _, k in first_shard)


def test_shuffle_shards_null_key_gets_deterministic_slot(spark):
    """r06 advice: a NULL key must not yield NULL (shard, pos) — it
    coalesces to the hash_split sentinel and lands in one deterministic
    slot, keeping the documented total-order/permutation contract."""
    from pyspark_weather_forecasting_gsod_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), ("c",)], "k string"
    )
    out = shuffle_shards(df, "k", n_shards=4, seed="e1").collect()
    assert len(out) == 4
    assert all(r.shard is not None and r.pos is not None for r in out)
    nulls = [r for r in out if r.k is None]
    again = {
        (r.k, r.shard, r.pos)
        for r in shuffle_shards(df, "k", n_shards=4, seed="e1").collect()
    }
    assert {(r.k, r.shard, r.pos) for r in out} == again
    assert len(nulls) == 1


def test_null_key_rows_join_the_sentinel_cohort_not_the_void(spark):
    """r08 review: four md5-decision operators hashed the raw key, so
    md5(NULL) = NULL made every NULL-key row silently vanish (dropped
    from samples, 0 copies emitted, excluded from the AQP sample while
    the estimator still scaled by 1/p). They now hash through the shared
    sentinel: NULL-key rows form ONE deterministic cohort."""
    import pytest
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.sampling import (
        rate_sample_by_stratum,
        sampled_sum_estimate,
        weighted_repeat,
        weighted_sample_k,
    )

    df = spark.createDataFrame(
        [(None, "en", 10.0)] + [(str(i), "en", 1.0) for i in range(20)],
        "k string, s string, v double",
    )

    # weighted_repeat: weight 3.0 emits exactly 3 copies, NULL key or not
    got = weighted_repeat(df, "k", F.lit(3.0)).groupBy("k").count().collect()
    assert {r["count"] for r in got} == {3}
    assert sum(1 for r in got if r["k"] is None) == 1

    # rate 1.0 keeps EVERYTHING — including the NULL-key row
    kept = rate_sample_by_stratum(df, "s", {"en": 1.0}, key="k")
    assert kept.count() == 21
    # rate 0.0 keeps nothing; the NULL cohort obeys the rate like any key
    assert rate_sample_by_stratum(df, "s", {"en": 0.0}, key="k").count() == 0

    # AQP at rate 1.0: the sample IS the population, NULL-key row included
    est = sampled_sum_estimate(df, "k", "v", rate=1.0).first()
    assert est["n_sampled"] == 21 and abs(est["sum_est"] - 30.0) < 1e-9

    # A-Res with k == population: the NULL-key row is selectable
    assert weighted_sample_k(df, "k", F.lit(1.0), k=21).count() == 21

    # rate validation (r08 review): out-of-range rates raise loudly
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        rate_sample_by_stratum(df, "s", {"en": 1.5}, key="k")


def test_shuffle_and_quota_refuse_reserved_column_collisions(spark):
    """r08 review: shuffle_shards overwrote caller columns named
    shard/pos/__ok wholesale; quota_sample destroyed a caller's __stratum
    and went ambiguous on __quota. Both now refuse."""
    import pytest
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.sampling import (
        quota_sample,
        shuffle_shards,
    )

    df = spark.createDataFrame(
        [(str(i), "a") for i in range(5)], "k string, s string"
    )
    with pytest.raises(ValueError, match="already has.*pos"):
        shuffle_shards(df.withColumn("pos", F.lit(7)), "k")
    with pytest.raises(ValueError, match="already has.*__stratum"):
        quota_sample(
            df.withColumn("__stratum", F.lit("x")), "s", {"a": 1.0},
            total=2, key="k",
        )
