"""E2E parity with the reference's evaluation loop (SURVEY.md §5 item 3).

Reproduces the full train→score→threshold→evaluate lifecycle
(reference SURVEY §3.2-3.3) on a synthetic drive-telemetry fixture
(FIXTURES.md fixture 1 shape) and asserts the engine's distributed results
match an independent numpy recomputation EXACTLY: imputation values,
z-scores, P95 threshold, confusion counts, detection rate and FPR formulas
(reference app/test_AE.py:250-274).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataquality_ml_spark.ml import detectors as det
from dataquality_ml_spark.ml import features as feat
from dataquality_ml_spark.operators import evaluate as ev
from dataquality_ml_spark.operators import thresholds as th


N_DRIVES = 400
N_DAYS = 4  # 3 train days + 1 test day
FAIL_DRIVES = (7, 133, 222, 391)  # exactly 4 failures on the test day


def _fixture_rows():
    rng = np.random.default_rng(42)
    rows = []
    for day in range(N_DAYS):
        date = f"2024-12-{22 + day:02d}"
        for drive in range(N_DRIVES):
            is_test = day == N_DAYS - 1
            failed = is_test and drive in FAIL_DRIVES
            base = rng.lognormal(2.0, 0.5)
            smart_1 = base * (8.0 if failed else 1.0)  # failures drift hard
            smart_2 = rng.normal(50, 10) + (80.0 if failed else 0.0)
            # ~5% nulls in smart_2 on non-failed rows
            if not failed and rng.random() < 0.05:
                smart_2 = None
            model = f"m{int(rng.integers(0, 5))}"
            rows.append(
                (
                    date,
                    f"sn{drive:05d}",
                    model,
                    float(smart_1),
                    None if smart_2 is None else float(smart_2),
                    int(failed),
                    bool(drive % 7 == 0),
                )
            )
    return rows


SCHEMA = (
    "date string, serial_number string, model string, smart_1 double, "
    "smart_2 double, failure int, is_legacy_format boolean"
)


@pytest.fixture(scope="module")
def telemetry(spark):
    return spark.createDataFrame(_fixture_rows(), SCHEMA).cache()


def test_reference_lifecycle_parity(spark, telemetry):
    train = telemetry.where(F.col("date") < "2024-12-25")
    test = telemetry.where(F.col("date") == "2024-12-25")

    # 1. fit-on-normal (reference app/AE_model.py:42-48)
    train_normal = train.where(F.col("failure") == 0)
    roles = {
        "numeric": ["smart_1", "smart_2"],
        "categorical": ["model"],
        "boolean": ["is_legacy_format"],
    }
    model = feat.fit_features(train_normal, roles=roles, label_col="failure")

    # numpy ground truth for the fit stats
    rows = train_normal.select("smart_1", "smart_2").collect()
    s1 = np.array([r[0] for r in rows])
    s2 = np.array([r[1] for r in rows if r[1] is not None])
    assert model.mean["smart_1"] == pytest.approx(s1.mean(), rel=1e-12)
    assert model.impute["smart_2"] == pytest.approx(s2.mean(), rel=1e-12)
    assert model.std["smart_1"] == pytest.approx(s1.std(ddof=1), rel=1e-12)

    # 2. transform train + test with the SAME fitted artifact (fixes the
    # reference's refit drift, app/test_AE.py:87-97)
    train_feats = feat.apply_features(train_normal, model)
    test_feats = feat.apply_features(test, model)

    # 3. detector fit on bounded sample, distributed scoring
    x_train = det.collect_feature_sample(train_feats, max_rows=10_000)
    # 1 component of 4 features: the anomaly directions (smart drifts) stay
    # in the residual space; more components would absorb them
    ae = det.PCAAutoencoder.fit(x_train, n_components=1)
    train_scored = det.score_distributed(train_feats, ae)
    test_scored = det.score_distributed(test_feats, ae)

    # 4. threshold = P95 of TRAIN errors (reference app/AE_model.py:197)
    t = th.percentile_threshold(train_scored, "score", 0.95, exact=True)
    train_errs = np.array([r["score"] for r in train_scored.select("score").collect()])
    assert t == pytest.approx(np.percentile(train_errs, 95), rel=1e-9)

    # 5. flag + confusion (reference app/test_AE.py:247-274)
    flagged = th.flag_anomalies(test_scored, "score", t).withColumn(
        "actual_failure", F.col("failure") == 1
    )
    m = ev.confusion_metrics(flagged).first()

    # numpy recomputation of the whole confusion block
    pdf = flagged.select("score", "failure").collect()
    scores = np.array([r["score"] for r in pdf])
    labels = np.array([r["failure"] for r in pdf])
    pred = scores > t
    tp = int(np.sum(pred & (labels == 1)))
    fp = int(np.sum(pred & (labels == 0)))
    fn = int(np.sum(~pred & (labels == 1)))
    tn = int(np.sum(~pred & (labels == 0)))
    assert (m["tp"], m["fp"], m["tn"], m["fn"]) == (tp, fp, tn, fn)
    assert m["detection_rate"] == pytest.approx(round(tp / max(tp + fn, 1), 4))
    assert m["false_positive_rate"] == pytest.approx(round(fp / max(fp + tn, 1), 4))

    # 6. the planted failures must actually be detected (model quality):
    # drifted drives reconstruct badly under the normal-only PCA
    assert tp >= 3, f"detected only {tp}/4 planted failures"

    # 7. ROC AUC sanity: anomalous scores rank failures near the top
    auc_df = ev.roc_auc(
        test_scored.withColumn("y", F.col("failure") == 1), "score", "y"
    ).first()
    assert auc_df["auc"] > 0.9


def test_unseen_model_category_at_test_time(spark, telemetry):
    """Test-day category unseen in training → the 'keep' bucket, row kept
    (reference StringIndexer handleInvalid='keep', lib/utils.py:206)."""
    train = telemetry.where(F.col("date") < "2024-12-25")
    roles = {"numeric": ["smart_1"], "categorical": ["model"], "boolean": []}
    model = feat.fit_features(
        train.where(F.col("failure") == 0), roles=roles, label_col="failure"
    )
    new_row = spark.createDataFrame(
        [("2024-12-25", "snX", "brand_new_model", 5.0, None, 0, False)], SCHEMA
    )
    out = feat.apply_features(new_row, model).first()
    assert out["model_idx"] == float(len(model.categories["model"]))
