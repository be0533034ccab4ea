"""Data augmentation (SURVEY.md §2.8 M11-M12, §7 step 8).

The reference's SMOTE runs driver-side over a pandas frame
(reference app/data_augmentation_enhanced.py:250-265, k_neighbors=min(5, n-1));
its hyperparameter search is a serial sklearn GridSearchCV
(app/IsolationForest_AE.py:209-247). Here:

- ``smote_oversample``: the minority class is tiny by definition, so it is
  collected once, synthesized with deterministic numpy SMOTE on the driver,
  and parallelized back — the majority class never moves.
- ``grid_search``: embarrassingly parallel fit/eval over the param grid via
  ``sparkContext.parallelize`` (one task per param set).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def smote_oversample(
    df: DataFrame,
    label_col: str,
    minority_value,
    target_count: int,
    feature_cols: list[str],
    k_neighbors: int = 5,
    seed: int = 42,
) -> DataFrame:
    """SMOTE synthesis to ``target_count`` minority rows, unioned back.

    Reference semantics (app/data_augmentation_enhanced.py:250-265):
    k = min(k_neighbors, n_minority - 1); each synthetic row interpolates a
    random minority point toward one of its k nearest minority neighbors by
    a uniform gap. Deterministic under the seed.
    """
    minority = df.where(F.col(label_col) == F.lit(minority_value))
    rows = minority.select(*feature_cols).collect()
    x = np.array([[float(v) for v in r] for r in rows])
    n = len(x)
    need = target_count - n
    if need <= 0 or n < 2:
        return df

    k = min(k_neighbors, n - 1)
    rng = np.random.default_rng(seed)
    # exact kNN on the minority set (tiny by definition)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    nn = np.argsort(d2, axis=1)[:, :k]

    base = rng.integers(0, n, size=need)
    pick = nn[base, rng.integers(0, k, size=need)]
    gap = rng.random(size=need)[:, None]
    synth = x[base] + gap * (x[pick] - x[base])

    spark = df.sparkSession
    synth_df = spark.createDataFrame(
        [tuple(map(float, row)) for row in synth], schema=feature_cols
    ).withColumn(label_col, F.lit(minority_value))
    return df.select(label_col, *feature_cols).unionByName(
        synth_df.select(label_col, *feature_cols)
    )


def grid_search(
    spark,
    grid: list[dict[str, Any]],
    fit_eval: Callable[[dict[str, Any]], float],
    maximize: bool = True,
) -> tuple[dict[str, Any], float, list[tuple[dict[str, Any], float]]]:
    """Parallel hyperparameter search: one Spark task per param set
    (reference M11 GridSearchCV re-expressed as an RDD map). ``fit_eval``
    must be self-contained (closure ships to executors)."""
    results = (
        spark.sparkContext.parallelize(grid, numSlices=len(grid))
        .map(lambda p: (p, float(fit_eval(p))))
        .collect()
    )
    best = max(results, key=lambda t: t[1]) if maximize else min(results, key=lambda t: t[1])
    return best[0], best[1], results


def stability_score(scores: np.ndarray) -> float:
    """The reference's enhanced-IF model-selection score
    (app/IsolationForest_AE_enhanced.py:108-121): with anomaly scores over
    the NORMAL training slice, ``1 / (1 + std/(mean+1e-8) +
    range/(mean+1e-8))`` — parameter sets whose score distribution is
    tight and narrow (stable on normal data) rank highest. Higher is
    better; ties keep the earliest grid entry (the reference's strict-``>``
    update rule, which ``max`` reproduces by returning the first max)."""
    s = np.asarray(scores, dtype=np.float64)
    mean = float(np.mean(s))
    denom = mean + 1e-8
    norm_std = float(np.std(s)) / denom
    norm_range = float(np.max(s) - np.min(s)) / denom
    return 1.0 / (1.0 + norm_std + norm_range)


def iforest_stability_search(
    spark,
    x: np.ndarray,
    grid: list[dict[str, Any]],
    seed: int = 42,
) -> tuple[dict[str, Any], float, list[tuple[dict[str, Any], float]]]:
    """The reference's manual IsolationForest parameter sweep
    (app/IsolationForest_AE_enhanced.py:49-146) on the engine's
    from-scratch forest: fit each (n_estimators, max_samples) combination
    on the bounded normal sample, score THE SAME sample, rank by
    ``stability_score``. One Spark task per combination (M11's
    embarrassingly-parallel shape); ``x`` ships once per task closure —
    it is the bounded driver fit sample, not table data.

    The reference grid also sweeps contamination / max_features /
    bootstrap, which exist only as sklearn's thresholding and subsampling
    knobs; the from-scratch forest exposes the two parameters that change
    the model itself, and extra keys in a grid entry are ignored rather
    than rejected so reference-shaped grids run as-is.
    """
    from dataquality_ml_spark.ml.detectors import IsolationForest

    def _fit_eval(params: dict[str, Any]) -> float:
        model = IsolationForest(
            n_estimators=int(params.get("n_estimators", 100)),
            max_samples=int(params.get("max_samples", 256)),
            seed=seed,
        ).fit(x)
        return stability_score(model.score_samples(x))

    return grid_search(spark, grid, _fit_eval, maximize=True)
