"""MLlib feature pipeline — reference-parity path (SURVEY.md §2.8 M1-M6).

Reproduces the reference's Pipeline exactly where a consumer wants VectorUDT
outputs for MLlib estimators: Imputer (mean or median) → StringIndexer×N
(frequency-ordered, handleInvalid="keep") → VectorAssembler (keep or skip)
→ StandardScaler(withMean, withStd). Cited semantics:

- AE path: in-place imputation, assembler handleInvalid="keep"
  (reference lib/utils.py:205-252)
- IF/LSTM path: "_imputed" copies, median strategy, assembler "skip"
  (drops rows with any NaN — app/IsolationForest_AE.py:115-135)

Prefer ``ml.features`` (array-native, oracle-checkable, single stats pass)
for new code; this wrapper exists for drop-in reference parity and for
feeding MLlib estimators.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import Imputer, StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame

from dataquality_ml_spark.ml.features import infer_roles
from dataquality_ml_spark.operators.profile import valid_columns


def build_feature_pipeline(
    df: DataFrame,
    label_col: str | None = "failure",
    strategy: str = "mean",
    assembler_invalid: str = "keep",
    in_place_impute: bool = True,
    with_scaling: bool = True,
) -> Pipeline:
    """Assemble the stage list with the reference's semantics. Column
    validity is checked in ONE aggregation (valid_columns), not the
    reference's per-column job loop."""
    roles = infer_roles(df, label_col)
    numeric = valid_columns(df, roles["numeric"])
    cats = roles["categorical"]
    bools = roles["boolean"]

    stages = []
    if numeric:
        out_cols = numeric if in_place_impute else [f"{c}_imputed" for c in numeric]
        stages.append(
            Imputer(strategy=strategy, inputCols=numeric, outputCols=out_cols)
        )
        num_out = out_cols
    else:
        num_out = []
    idx_cols = [f"{c}_idx" for c in cats]
    if cats:
        # ONE multi-column StringIndexer instead of N single-column stages:
        # one fit job computes every frequency table in a single pass over
        # the data (SURVEY §2.8 M2 scale note — the reference fits 26
        # separate indexers, 26 aggregation jobs). Per-column semantics
        # (frequencyDesc order, handleInvalid="keep") are identical.
        stages.append(
            StringIndexer(
                inputCols=list(cats), outputCols=idx_cols, handleInvalid="keep"
            )
        )
    assemble_in = idx_cols + num_out + bools
    stages.append(
        VectorAssembler(
            inputCols=assemble_in,
            outputCol="features_unscaled" if with_scaling else "features",
            handleInvalid=assembler_invalid,
        )
    )
    if with_scaling:
        stages.append(
            StandardScaler(
                inputCol="features_unscaled",
                outputCol="features",
                withMean=True,
                withStd=True,
            )
        )
    return Pipeline(stages=stages)


def fit_on_normal(
    df: DataFrame, label_col: str = "failure", **kwargs
) -> PipelineModel:
    """The fit-on-normal contract (reference app/AE_model.py:42-48): fit
    stages on the ``label == 0`` slice only, transform anything after."""
    from pyspark.sql import functions as F

    normal = df.where(F.col(label_col) == F.lit(0))
    return build_feature_pipeline(df, label_col=label_col, **kwargs).fit(normal)


def fit_quality_classifier(docs: DataFrame, reg_param: float = 0.01):
    """fastText-style document-quality classifier: logistic regression
    over cheap text statistics (token count, punctuation/digit density,
    stopword fraction, mean token length) — the standard LLM-pipeline
    quality model (DCLM / LLaMA-style filters), here trained by
    self-distillation on the heuristic filter's weak labels so the whole
    lifecycle is runnable without gold annotations; a production
    deployment swaps in human/LLM labels and keeps the plumbing.

    Returns the fitted PipelineModel (assembler → scaler → LR). Training
    cost: MLlib's L-BFGS over the ~5-feature stats relation — the heavy
    text work is the one pass computing the statistics; the solve itself
    aggregates gradients tree-wise and is corpus-size-linear.
    """
    from pyspark.ml.classification import LogisticRegression

    # the fit evaluates the stats relation several times (scaler fit, LR
    # instance build; LR caches only its own internal RDD) and each
    # evaluation re-runs BOTH tokenization passes + the join — checkpoint
    # the ~7-doubles-per-doc relation once (guide §2.4, round 13)
    feats = _quality_features(docs).localCheckpoint(eager=False)
    assembler = VectorAssembler(
        inputCols=_QUALITY_FEATURE_COLS, outputCol="_fv", handleInvalid="skip"
    )
    scaler = StandardScaler(
        inputCol="_fv", outputCol="_fs", withMean=True, withStd=True
    )
    lr = LogisticRegression(
        featuresCol="_fs",
        labelCol="_label",
        maxIter=25,
        regParam=reg_param,
        standardization=False,  # scaler already standardized
    )
    return Pipeline(stages=[assembler, scaler, lr]).fit(feats)


_QUALITY_FEATURE_COLS = [
    "n_tokens",
    "punct_ratio",
    "digit_ratio",
    "stopword_frac",
    "avg_token_len",
]


def _quality_features(docs: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    from dataquality_ml_spark.operators.text import text_quality, token_stats

    q = text_quality(docs)
    t = token_stats(docs).select("doc_id", "avg_token_len")
    return q.join(t, "doc_id").select(
        "doc_id",
        *[F.col(c).cast("double").alias(c) for c in _QUALITY_FEATURE_COLS],
        F.col("is_high_quality").cast("double").alias("_label"),
    )


def score_quality(docs: DataFrame, model) -> DataFrame:
    """Apply a fitted quality classifier: (doc_id, prob_hq, pred_hq).

    Scoring is WEIGHTS-ONLY: the scaler means/stds and LR coefficients
    are extracted from the fitted pipeline and evaluated as plain SQL
    expressions (sigmoid of the standardized dot product) — the same
    pattern as the keras adapters. Besides staying inside whole-stage
    codegen, this sidesteps a Spark 4.1 classic hazard: a session that
    has ever registered an ``Observation`` (e.g. after
    ``write_parquet_observed``) fails to serialize MLlib-transform task
    closures (``NotSerializableException: ObservationManager`` via the
    model summary's DataFrame → session reference), so shipping the
    model object into a closure is fragile in exactly the sessions a
    pipeline runs. Probability rounded 3 dp (solver jitter is far
    below that).
    """
    from pyspark.sql import functions as F

    scaler = model.stages[1]
    lr = model.stages[2]
    means = list(scaler.mean.toArray())
    stds = list(scaler.std.toArray())
    coefs = list(lr.coefficients.toArray())
    intercept = float(lr.intercept)

    feats = _quality_features(docs)
    # assembler handleInvalid="skip" parity: drop rows with null/NaN
    for c in _QUALITY_FEATURE_COLS:
        feats = feats.where(F.col(c).isNotNull() & ~F.isnan(F.col(c)))
    z = F.lit(intercept)
    for c, mu, sd, w in zip(_QUALITY_FEATURE_COLS, means, stds, coefs):
        scaled = (
            (F.col(c) - F.lit(mu)) / F.lit(sd) if sd != 0.0 else F.lit(0.0)
        )
        z = z + F.lit(w) * scaled
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        F.round(prob, 3).alias("prob_hq"),
        (prob > F.lit(0.5)).cast("int").alias("pred_hq"),
    )
