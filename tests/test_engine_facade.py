"""DQEngine facade: the reference user's whole workflow in a few calls."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataquality_ml_spark.engine import DQEngine
from tests.test_e2e_reference_parity import SCHEMA, _fixture_rows


def test_facade_end_to_end(spark):
    eng = DQEngine(spark)
    telemetry = spark.createDataFrame(_fixture_rows(), SCHEMA)
    train = telemetry.where(F.col("date") < "2024-12-25")
    test = telemetry.where(F.col("date") == "2024-12-25")

    prof_df = eng.profile(train, ["smart_1", "smart_2"])
    assert prof_df.count() == 2

    fitted = eng.fit_detector(
        train,
        roles={
            "numeric": ["smart_1", "smart_2"],
            "categorical": ["model"],
            "boolean": ["is_legacy_format"],
        },
        detector="pca",
        n_components=1,
    )
    assert fitted.threshold > 0

    scored = eng.score(test, fitted)
    m = eng.evaluate(scored).first()
    assert m["tp"] >= 3  # planted failures found through the facade too

    report = eng.report(scored, k=10)
    rows = report.collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    auc = eng.auc(scored).first()["auc"]
    assert auc > 0.9


def test_facade_iforest_path(spark):
    eng = DQEngine(spark)
    telemetry = spark.createDataFrame(_fixture_rows(), SCHEMA)
    fitted = eng.fit_detector(
        telemetry.where(F.col("date") < "2024-12-25"),
        roles={"numeric": ["smart_1", "smart_2"], "categorical": [], "boolean": []},
        detector="iforest",
    )
    scored = eng.score(telemetry.where(F.col("date") == "2024-12-25"), fitted)
    assert scored.where(F.col("is_anomaly")).count() > 0
