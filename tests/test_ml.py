"""ML pipeline operators (M1-M13) + the recomposed GSOD pipeline."""

import pytest
from pyspark.sql import Row

from pyspark_weather_forecasting_gsod_spark.ml.explain import feature_importances, shap_values
from pyspark_weather_forecasting_gsod_spark.ml.features import assemble_features
from pyspark_weather_forecasting_gsod_spark.ml.models import (
    evaluate_classification,
    evaluate_regression,
    seeded_split,
    train_gbt_classifier,
    train_gbt_regressor,
    train_linear_regression,
    train_xgb_regressor,
)


def _frame(spark, n=200):
    rows = [
        Row(cat="a" if i % 3 else "b", x=float(i % 17), y=float(i % 5),
            label=2.0 * (i % 17) + (0.0 if i % 3 else 5.0))
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_feature_pipeline_dimensions(spark):
    feat = assemble_features(_frame(spark), categorical=["cat"], numerical=["x", "y"])
    row = feat.select("features").first()
    # 2 one-hot slots (2 cats, keep-invalid adds one dropped-last) + 2 scaled
    assert row.features.size >= 4
    assert "scaled_numerical_features" in feat.columns


def test_linear_regression_learns_linear_signal(spark):
    feat = assemble_features(_frame(spark), categorical=["cat"], numerical=["x", "y"])
    train, test = seeded_split(feat)
    model = train_linear_regression(train, "label")
    metrics = evaluate_regression(model.transform(test), "label")
    assert metrics["r2"] > 0.99  # exactly linear target
    assert metrics["rmse"] < 1.0
    assert set(metrics) == {"rmse", "mse", "mae", "r2"}


def test_gbt_regressor_and_importances(spark):
    feat = assemble_features(_frame(spark), categorical=["cat"], numerical=["x", "y"])
    model = train_gbt_regressor(feat, "label", max_iter=5)
    preds = model.transform(feat)
    metrics = evaluate_regression(preds, "label")
    assert metrics["r2"] > 0.9
    names = [f"cat_{i}" for i in range(model.numFeatures - 2)] + ["x", "y"]
    imps = feature_importances(model, names)
    assert imps[0][1] >= imps[-1][1] and abs(sum(v for _, v in imps) - 1.0) < 1e-6


def test_gbt_classifier_metrics(spark):
    from pyspark.sql import functions as F

    df = _frame(spark).withColumn("up", (F.col("x") > 8).cast("double"))
    feat = assemble_features(df, categorical=["cat"], numerical=["x", "y"])
    train, test = seeded_split(feat)
    model = train_gbt_classifier(train, "up", max_iter=5)
    metrics = evaluate_classification(model.transform(test), "up")
    assert metrics["accuracy"] > 0.95  # threshold function of x is learnable
    assert 0.9 < metrics["areaUnderROC"] <= 1.0


def test_evaluate_regression_ignores_null_rows(spark):
    """r12 (r11 ADVICE #1): rows with NULL label or prediction must not
    count toward n — previously they deflated every mean — and metrics
    must equal the same computation over the pre-filtered frame."""
    from pyspark.sql import Row

    clean = spark.createDataFrame(
        [Row(label=1.0, prediction=2.0), Row(label=3.0, prediction=3.0),
         Row(label=5.0, prediction=4.0)]
    )
    dirty = clean.unionByName(spark.createDataFrame(
        [Row(label=None, prediction=9.0), Row(label=7.0, prediction=None)],
        "label double, prediction double",
    ))
    want = evaluate_regression(clean, "label", with_count=True)
    got = evaluate_regression(dirty, "label", with_count=True)
    assert got["n"] == want["n"] == 3
    for k in ("rmse", "mse", "mae", "r2"):
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_seeded_split_reproducible(spark):
    df = _frame(spark)
    a1, b1 = seeded_split(df)
    a2, b2 = seeded_split(df)
    assert a1.count() == a2.count() and b1.count() == b2.count()


def test_optional_deps_honestly_gated(spark):
    with pytest.raises(NotImplementedError):
        train_xgb_regressor(_frame(spark), "label")
    with pytest.raises(NotImplementedError):
        shap_values("/nonexistent", None)


def test_xgb_gate_body_executes_with_injected_module(spark, monkeypatch):
    """r08 VERDICT #7: the import gates are pytest-verified, but the code
    BEHIND them (SparkXGBRegressor construction + fit call) had zero
    execution coverage because the sandbox lacks xgboost. Injecting a
    minimal fake module executes the gated branch: the estimator must be
    built with the passed label_col/params and its fit() must receive the
    training frame."""
    import sys
    import types

    calls = {}

    class FakeSparkXGBRegressor:
        def __init__(self, label_col=None, **params):
            calls["init"] = {"label_col": label_col, **params}

        def fit(self, train):
            calls["fit_rows"] = train.count()
            return "fitted-xgb"

    fake_spark = types.ModuleType("xgboost.spark")
    fake_spark.SparkXGBRegressor = FakeSparkXGBRegressor
    fake_xgb = types.ModuleType("xgboost")
    fake_xgb.spark = fake_spark
    monkeypatch.setitem(sys.modules, "xgboost", fake_xgb)
    monkeypatch.setitem(sys.modules, "xgboost.spark", fake_spark)

    feat = assemble_features(_frame(spark), categorical=["cat"], numerical=["x", "y"])
    model = train_xgb_regressor(feat, "label", n_estimators=7)
    assert model == "fitted-xgb"
    assert calls["init"] == {"label_col": "label", "n_estimators": 7}
    assert calls["fit_rows"] == 200


def test_shap_gate_body_executes_with_injected_modules(monkeypatch):
    """r08 VERDICT #7, SHAP leg: booster reload + TreeExplainer +
    shap_values call behind the import gate, executed via fake modules —
    the model path must reach Booster.load_model and the explainer must
    wrap that booster and receive the feature frame."""
    import sys
    import types

    calls = {}

    class FakeBooster:
        def load_model(self, path):
            calls["loaded"] = path

    class FakeTreeExplainer:
        def __init__(self, booster):
            calls["explained"] = isinstance(booster, FakeBooster)

        def shap_values(self, pdf):
            calls["pdf"] = pdf
            return [[0.1, -0.2]]

    fake_xgb = types.ModuleType("xgboost")
    fake_xgb.Booster = FakeBooster
    fake_shap = types.ModuleType("shap")
    fake_shap.TreeExplainer = FakeTreeExplainer
    monkeypatch.setitem(sys.modules, "xgboost", fake_xgb)
    monkeypatch.setitem(sys.modules, "shap", fake_shap)

    out = shap_values("/models/booster.json", "sentinel-pdf")
    assert out == [[0.1, -0.2]]
    assert calls == {
        "loaded": "/models/booster.json",
        "explained": True,
        "pdf": "sentinel-pdf",
    }


def test_gsod_pipeline_end_to_end(spark):
    """Reference acceptance criterion: all-zero post-imputation census
    (ipynb:1128-1152) + sane regression metrics on the weather fixture."""
    from pyspark_weather_forecasting_gsod_spark.pipelines.gsod import run_gsod_pipeline, weather_fixture

    wx = weather_fixture(spark, n_stations=20, n_days=90)
    out = run_gsod_pipeline(wx, fast=True, with_classifier=False)
    assert all(v == 0 for k, v in out["census"].items() if k.startswith("null_"))
    # next_day_max is seasonal+noise: R² should be clearly positive
    assert out["regression"]["r2"] > 0.5
    assert out["regression"]["rmse"] < 20.0


def test_gsod_pipeline_from_csv_end_to_end(spark, tmp_path):
    """The reference's literal entry leg (S1, ipynb:187): CSV → explicit
    StructType → sentinel normalization → full pipeline (r09 VERDICT #7).
    The parquet-fixture e2e test covers the pipeline math; this one covers
    the CSV source leg — typed header read through ``read_csv`` (no
    inference scan), then the same zero-null-census acceptance criterion
    and metric band."""
    from pyspark_weather_forecasting_gsod_spark.pipelines.gsod import (
        gsod_csv_schema,
        run_gsod_pipeline,
        weather_fixture,
    )
    from pyspark_weather_forecasting_gsod_spark.sources.io import read_csv

    wx = weather_fixture(spark, n_stations=20, n_days=90)
    path = str(tmp_path / "gsod_csv")
    wx.write.option("header", True).mode("overwrite").csv(path)
    back = read_csv(spark, path, gsod_csv_schema())
    # the pinned schema really types every fixture column (no silent
    # string fallbacks), and the roundtrip loses no rows
    assert [f.name for f in back.schema.fields] == wx.columns
    assert {f.dataType.simpleString() for f in back.schema.fields} == {
        "string", "int", "date", "double",
    }
    assert back.count() == wx.count()
    out = run_gsod_pipeline(back, fast=True, with_classifier=False)
    assert all(v == 0 for k, v in out["census"].items() if k.startswith("null_"))
    assert out["regression"]["r2"] > 0.5
    assert out["regression"]["rmse"] < 20.0


def test_gsod_pipeline_metric_parity_band(spark):
    """BASELINE parity envelope on the full 347k-row fixture (the declared
    ``gsod_pipeline_e2e`` config): the reference publishes LR RMSE 6.2103 /
    R² 0.93168 on real GSOD 2023 (BASELINE.md, ipynb:1528/1531). The
    synthetic fixture is easier than real weather (measured R² ≈ 0.965,
    RMSE ≈ 4.08 — seasonal signal + bounded uniform noise, no fronts or
    regime shifts), so exact parity is impossible; the band instead pins
    the metrics to a regression-catching envelope: R² ≥ 0.9 (a silent
    feature-pipeline bug — dropped column, mis-joined label — craters R²
    long before it reaches 0.9) and 2.0 ≤ RMSE ≤ 6.5 (the lower bound
    catches label leakage: predicting next_day_max better than the
    fixture's irreducible ±6 noise band means the label leaked into the
    features)."""
    import importlib

    Q = importlib.import_module("pyspark_weather_forecasting_gsod_spark.plans.queries")
    rows = Q.QUERIES["gsod_pipeline_e2e"][0](spark, "/root/testdata/sf0.001").collect()
    m = {r.metric: r.value for r in rows}
    assert all(v == 0.0 for k, v in m.items() if k.startswith("census_null_"))
    assert m["reg_r2"] >= 0.9, f"feature pipeline regression: R²={m['reg_r2']}"
    assert 2.0 <= m["reg_rmse"] <= 6.5, f"RMSE out of band: {m['reg_rmse']}"
    # the per-phase breakdown rows (bench-drift diagnosis) are present
    phases = {k for k in m if k.startswith("phase_")}
    assert {"phase_impute_sec", "phase_lr_fit_sec", "phase_lr_eval_sec"} <= phases


def test_weather_fixture_pathologies(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.pipelines.gsod import weather_fixture

    wx = weather_fixture(spark, n_stations=10, n_days=60)
    # all-sentinel column for station 0 (forces global fallback)
    s0 = wx.filter("stn = '000000'")
    assert s0.filter(F.col("visib") != 999.9).count() == 0
    # single-row station
    assert wx.filter(f"stn = '{9:06d}'").count() == 1
    # deterministic across invocations
    assert wx.agg(F.sum("temp")).first()[0] == weather_fixture(
        spark, n_stations=10, n_days=60
    ).agg(F.sum("temp")).first()[0]


def test_kfold_cv_deterministic_balanced_and_disjoint(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.ml.models import (
        kfold_cv_regression,
    )
    from pyspark.ml.feature import VectorAssembler

    df = spark.range(2000).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("x"),
    ).withColumn("y", F.col("x") * 3.0 + 1.0)
    feat = VectorAssembler(inputCols=["x"], outputCol="features").transform(df)
    folds = kfold_cv_regression(feat, "y", key_col="id", k=4)
    # perfect linear data → every fold fits exactly
    assert all(m["r2"] > 0.999 for m in folds)
    # md5 folds: balanced within a loose band, cover everything
    sizes = [m["n_test"] for m in folds]
    assert sum(sizes) == 2000
    assert all(2000 / 4 * 0.8 <= s <= 2000 / 4 * 1.2 for s in sizes)
    # determinism: same folds regardless of partitioning
    folds2 = kfold_cv_regression(feat.repartition(13), "y", key_col="id", k=4)
    assert [m["n_test"] for m in folds2] == sizes


def test_kfold_cv_classification_deterministic_and_learns(spark):
    from pyspark.sql import functions as F
    from pyspark.ml.feature import VectorAssembler

    from pyspark_weather_forecasting_gsod_spark.ml.models import (
        kfold_cv_classification,
    )

    # separable data: label = x > 50
    df = spark.range(1200).select(
        "id", (F.col("id") % 101).cast("double").alias("x")
    ).withColumn("y", (F.col("x") > 50).cast("double"))
    feat = VectorAssembler(inputCols=["x"], outputCol="features").transform(df)
    folds = kfold_cv_classification(feat, "y", key_col="id", k=3, max_iter=5)
    assert len(folds) == 3
    assert sum(m["n_test"] for m in folds) == 1200
    assert all(m["accuracy"] > 0.95 for m in folds)
    folds2 = kfold_cv_classification(
        feat.repartition(7), "y", key_col="id", k=3, max_iter=5
    )
    assert [m["n_test"] for m in folds2] == [m["n_test"] for m in folds]
