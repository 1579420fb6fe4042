"""Similarity-search extension operators (ext/similarity.py)."""

import math

from pyspark.sql import Row

from pyspark_weather_forecasting_gsod_spark.ext.similarity import (
    brp_lsh_ann,
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
)


def _emb(spark):
    # vectors with known geometry: 0 ∥ 1, 0 ⟂ 2, 3 ≈ 0 (small angle)
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[2.0, 0.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.0]),
        Row(vec_id=3, embedding=[1.0, 0.1, 0.0, 0.0]),
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows)


def test_cosine_topk_exact_ordering(spark):
    emb = _emb(spark)
    out = cosine_topk(emb, emb.filter("vec_id = 0"), k=3)
    got = [(r.nid, r.cosine, r.rk) for r in out.orderBy("rk").collect()]
    assert [g[0] for g in got] == [1, 3, 2]  # parallel, near, orthogonal
    assert got[0][1] == 1.0
    assert abs(got[1][1] - 1 / math.sqrt(1.01)) < 1e-4
    assert got[2][1] == 0.0


def test_cosine_topk_excludes_self(spark):
    emb = _emb(spark)
    out = cosine_topk(emb, emb.filter("vec_id = 0"), k=10)
    assert 0 not in {r.nid for r in out.collect()}


def test_embedding_neardup_pairs_threshold(spark):
    out = embedding_neardup_pairs(_emb(spark), min_cosine=0.95)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (0, 1) in pairs  # identical direction
    assert (0, 3) in pairs  # cos ≈ 0.995
    assert (0, 2) not in pairs  # orthogonal
    assert (0, 4) not in pairs  # opposite


def test_brp_lsh_ann_returns_ranked_neighbors(spark):
    emb = _emb(spark)
    out = brp_lsh_ann(emb, emb.filter("vec_id = 0"), k=2)
    got = [r.nid for r in out.orderBy("rk").collect()]
    assert got[0] == 1  # nearest on the unit sphere


def test_ivf_topk_probes_clusters(spark):
    emb = _emb(spark)
    out = ivf_topk(emb, emb.filter("vec_id = 0"), k=2, n_centroids=2, nprobe=2)
    got = [r.nid for r in out.orderBy("rk").collect()]
    assert got[0] == 1


def test_cosine_allpairs_small_corpus_ok(spark):
    from pyspark_weather_forecasting_gsod_spark.ext.similarity import cosine_allpairs

    out = cosine_allpairs(_emb(spark), min_cosine=0.95)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (0, 1) in pairs and (0, 3) in pairs and (0, 2) not in pairs


def test_cosine_allpairs_guard_refuses_oversized_corpus(spark):
    import pytest

    from pyspark_weather_forecasting_gsod_spark.ext.similarity import cosine_allpairs

    with pytest.raises(ValueError, match="embedding_neardup_pairs"):
        cosine_allpairs(_emb(spark), min_cosine=0.9, max_rows=3)


def test_cosine_allpairs_blocked_equals_broadcast_path(spark):
    import random

    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.similarity import (
        cosine_allpairs,
        cosine_allpairs_blocked,
    )

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(16)])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows)
    want = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_allpairs(df, min_cosine=0.2).collect()
    }
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_allpairs_blocked(df, min_cosine=0.2, n_blocks=5).collect()
    }
    assert got == want and len(got) > 50
    # single block degenerates to one within-block task; still exact
    one = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_allpairs_blocked(df, min_cosine=0.2, n_blocks=1).collect()
    }
    assert one == want
