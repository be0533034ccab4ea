"""Data augmentation (SURVEY.md §2.8 M11-M12, §7 step 8).

The reference's SMOTE runs driver-side over a pandas frame
(reference app/data_augmentation_enhanced.py:250-265, k_neighbors=min(5, n-1));
its hyperparameter search is a serial sklearn GridSearchCV
(app/IsolationForest_AE.py:209-247). Here:

- ``smote_oversample``: the minority feature matrix is CAPPED
  (``max_minority_rows``, loud on-overflow contract like
  ``fit_features``), broadcast once, and the synthetic rows are
  generated EXECUTOR-SIDE by a ``mapInPandas`` over ``spark.range(need)``
  — "minority is tiny" is enforced as a contract, never assumed, and
  neither the minority collect nor the synthesis is ever unbounded
  driver work.
- ``grid_search``: embarrassingly parallel fit/eval over the param grid via
  ``sparkContext.parallelize`` (one task per param set).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def _mix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a counter-based uniform hash so
    every synthetic row's randomness is a pure function of (seed, row id):
    deterministic under any partitioning of the ``spark.range`` seed
    relation, no driver-side random arrays of size ``need``."""
    z = np.asarray(z, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _knn_table(x: np.ndarray, k: int) -> np.ndarray:
    """Exact kNN over the (capped) minority matrix, chunked so peak memory
    is O(chunk·n) — never the O(n²·d) broadcast-difference tensor. Ties
    break by index (stable), matching a full argsort."""
    n = len(x)
    norms = (x * x).sum(axis=1)
    nn = np.empty((n, k), dtype=np.int64)
    # ~64 MB of float64 per chunk distance block
    chunk = max(1, int(8_000_000 // max(1, n)))
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        d2 = norms[s:e, None] + norms[None, :] - 2.0 * (x[s:e] @ x.T)
        d2[np.arange(e - s), np.arange(s, e)] = np.inf
        if n > k + 1:
            cand = np.argpartition(d2, k, axis=1)[:, : k + 1]
        else:
            cand = np.tile(np.arange(n), (e - s, 1))
        cd = np.take_along_axis(d2, cand, axis=1)
        order = np.lexsort((cand, cd), axis=1)[:, :k]
        nn[s:e] = np.take_along_axis(cand, order, axis=1)
    return nn


def smote_oversample(
    df: DataFrame,
    label_col: str,
    minority_value,
    target_count: int,
    feature_cols: list[str],
    k_neighbors: int = 5,
    seed: int = 42,
    max_minority_rows: int = 65536,
    on_overflow: str = "error",
) -> DataFrame:
    """SMOTE synthesis to ``target_count`` minority rows, unioned back.

    Reference semantics (app/data_augmentation_enhanced.py:250-265):
    k = min(k_neighbors, n_minority - 1); each synthetic row interpolates a
    random minority point toward one of its k nearest minority neighbors by
    a uniform gap. Deterministic under the seed.

    Scale contract (round 10 — this was the last unbounded driver collect
    reachable from a §2 operator): the driver only ever materializes at
    most ``max_minority_rows`` minority rows. Over the cap, the
    ``on_overflow`` contract fires BEFORE anything minority-sized moves:

    - ``"error"`` (default): raise ValueError with the observed count —
      a 0.1% minority of a 100 TB table is ~100 GB and must never OOM the
      driver silently.
    - ``"sample"``: interpolate within a deterministic xxhash64-ranked
      sample of ``max_minority_rows`` minority rows (the synthetic count
      still tops the class up to ``target_count``; the interpolation BASE
      is sampled, which is the standard practical SMOTE at scale).

    Synthesis is executor-side: the capped (rows × features) matrix and
    its kNN table are broadcast, and a ``mapInPandas`` over
    ``spark.range(need)`` derives each row's (base point, neighbor, gap)
    from a counter-based splitmix64 hash of (seed, id) — bit-identical
    output under any partitioning, and ``need`` never sits on the driver.
    """
    if on_overflow not in ("error", "sample"):
        raise ValueError(
            f"smote_oversample: on_overflow={on_overflow!r} — must be "
            "'error' or 'sample'"
        )
    minority = df.where(F.col(label_col) == F.lit(minority_value))
    feats = minority.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols]
    )
    n_full = feats.count()
    need = target_count - n_full
    if need <= 0 or n_full < 2:
        return df

    if n_full > max_minority_rows:
        if on_overflow == "error":
            raise ValueError(
                f"smote_oversample: minority class '{minority_value}' has "
                f"{n_full} rows, over max_minority_rows={max_minority_rows} "
                "— raise the cap or pass on_overflow='sample' (interpolate "
                "within a deterministic hash-ranked sample)"
            )
        # deterministic threshold-sample (~1.25× slack), then the exact
        # cap by hash rank — TakeOrdered over ≤1.25·cap surviving rows,
        # never a global sort of the full minority
        m = 1_048_576
        frac = min(1.0, 1.25 * max_minority_rows / n_full)
        hcol = F.xxhash64(*[F.col(c) for c in feature_cols], F.lit(seed))
        pdf = (
            feats.withColumn("_h", hcol)
            .where(F.pmod(F.col("_h"), F.lit(m)) < int(frac * m))
            .orderBy("_h")
            .limit(max_minority_rows)
            .drop("_h")
            .toPandas()
        )
    else:
        pdf = feats.toPandas()

    # null/NaN feature rows still count toward n_full (they are minority
    # rows) but are excluded from the interpolation BASE — a NaN base
    # point would silently poison every synthetic row derived from it
    pdf = pdf.dropna()
    x = np.ascontiguousarray(pdf[feature_cols].to_numpy(dtype=np.float64))
    n = len(x)
    if n < 2:
        return df
    k = min(k_neighbors, n - 1)
    nn = _knn_table(x, k)

    spark = df.sparkSession
    bx = spark.sparkContext.broadcast((x, nn))
    ms = int(_mix64(np.array([seed], dtype=np.uint64))[0])
    n_b, k_b = n, k

    def _gen(batches):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        mx, mnn = bx.value
        for b in batches:
            idx = b["id"].to_numpy(np.uint64)
            with np.errstate(over="ignore"):
                base = (
                    _mix64(idx + np.uint64(ms)) % np.uint64(n_b)
                ).astype(np.int64)
                slot = (
                    _mix64(idx + np.uint64(ms) + np.uint64(0x51ED2701))
                    % np.uint64(k_b)
                ).astype(np.int64)
                gap = (
                    _mix64(idx ^ np.uint64(ms) ^ np.uint64(0xC2B2AE3D))
                    .astype(np.float64)
                    / 18446744073709551616.0
                )
            pick = mnn[base, slot]
            synth = mx[base] + gap[:, None] * (mx[pick] - mx[base])
            yield pd.DataFrame(synth, columns=list(feature_cols))

    schema = StructType(
        [StructField(c, DoubleType()) for c in feature_cols]
    )
    synth_df = spark.range(need).mapInPandas(_gen, schema).withColumn(
        label_col, F.lit(minority_value)
    )
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


def stability_from_stats(mean: float, std: float, rng: float) -> float:
    """The stability formula on precomputed distribution stats —
    ``1 / (1 + std/(mean+1e-8) + range/(mean+1e-8))`` — shared by
    :func:`stability_score` (raw score vectors) and the SQL-checkable
    ``stability_grid_lineitem`` query (Spark-aggregated mean/stddev_pop/
    range per param set), so both faces run the identical scalar float
    sequence the oracle replays."""
    denom = mean + 1e-8
    return 1.0 / (1.0 + std / denom + rng / denom)


def stability_score(scores: np.ndarray) -> float:
    """The reference's enhanced-IF model-selection score
    (app/IsolationForest_AE_enhanced.py:108-121): with anomaly scores over
    the NORMAL training slice, ``1 / (1 + std/(mean+1e-8) +
    range/(mean+1e-8))`` — parameter sets whose score distribution is
    tight and narrow (stable on normal data) rank highest. Higher is
    better; ties keep the earliest grid entry (the reference's strict-``>``
    update rule, which ``max`` reproduces by returning the first max)."""
    s = np.asarray(scores, dtype=np.float64)
    return stability_from_stats(
        float(np.mean(s)), float(np.std(s)), float(np.max(s) - np.min(s))
    )


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
