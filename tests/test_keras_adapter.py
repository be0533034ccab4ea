"""Keras-adapter tests (VERDICT r2 item 4): the optional backend is
exercised with a stand-in keras module — the real library is absent from
this container by design, and the adapter's artifact is weights-only numpy,
so everything after `.fit` is fully testable without it."""

from __future__ import annotations

import types

import numpy as np
import pytest

from dataquality_ml_spark.ml.detectors import PCAAutoencoder, score_distributed
from dataquality_ml_spark.ml.keras_adapter import (
    KerasDenseAE,
    build_autoencoder,
    fold_dense_batchnorm,
)


def make_fake_keras():
    """Minimal keras stand-in: functional-API layer objects carrying
    deterministic weights, a Model that records build order, no-op
    compile/fit. Tensors are plain ints (the feature dimension)."""
    created = []

    class Dense:
        def __init__(self, units, activation=None, kernel_regularizer=None):
            self.units = units

        def __call__(self, dim):
            rng = np.random.default_rng(17 * self.units + dim)
            self.kernel = rng.normal(0, 0.5, size=(dim, self.units))
            self.bias = rng.normal(0, 0.5, size=self.units)
            created.append(self)
            return self.units

        def get_weights(self):
            return [self.kernel, self.bias]

    class BatchNormalization:
        epsilon = 1e-3

        def __call__(self, dim):
            rng = np.random.default_rng(1000 + dim)
            self.g = rng.uniform(0.5, 1.5, dim)
            self.b = rng.normal(0, 0.5, dim)
            self.mu = rng.normal(0, 0.5, dim)
            self.var = rng.uniform(0.5, 1.5, dim)
            created.append(self)
            return dim

        def get_weights(self):
            return [self.g, self.b, self.mu, self.var]

    class GaussianNoise:
        def __init__(self, stddev):
            pass

        def __call__(self, dim):
            return dim

    def Input(shape):
        return shape[0]

    class Model:
        def __init__(self, inputs=None, outputs=None):
            self.layers = list(created)

        def compile(self, **kw):
            pass

        def fit(self, *a, **kw):
            pass

    def _cb(**kw):
        return object()

    keras = types.SimpleNamespace(
        layers=types.SimpleNamespace(
            Input=Input,
            Dense=Dense,
            BatchNormalization=BatchNormalization,
            GaussianNoise=GaussianNoise,
        ),
        regularizers=types.SimpleNamespace(l2=lambda v: None),
        models=types.SimpleNamespace(Model=Model),
        optimizers=types.SimpleNamespace(
            Adam=lambda learning_rate: None,
            legacy=types.SimpleNamespace(Adam=lambda learning_rate: None),
        ),
        callbacks=types.SimpleNamespace(
            EarlyStopping=_cb, ReduceLROnPlateau=_cb
        ),
    )
    return keras


def test_fold_linear_dense_bn_is_exact():
    """Dense(linear) + BN folds into ONE affine equal to the unfused pair."""

    class Dense:
        def __init__(self, w, b):
            self._w = (w, b)

        def get_weights(self):
            return list(self._w)

    class BatchNormalization:
        epsilon = 1e-3

        def __init__(self, g, b, mu, var):
            self._w = (g, b, mu, var)

        def get_weights(self):
            return list(self._w)

    rng = np.random.default_rng(0)
    w, b = rng.normal(size=(3, 4)), rng.normal(size=4)
    g, beta, mu, var = (
        rng.uniform(0.5, 1.5, 4),
        rng.normal(size=4),
        rng.normal(size=4),
        rng.uniform(0.5, 1.5, 4),
    )
    folded = fold_dense_batchnorm(
        [Dense(w, b), BatchNormalization(g, beta, mu, var)], ["linear"]
    )
    assert len(folded) == 1
    x = rng.normal(size=(10, 3))
    y_unfused = (x @ w + b - mu) * (g / np.sqrt(var + 1e-3)) + beta
    fw, fb, act = folded[0]
    assert act == "linear"
    np.testing.assert_allclose(x @ fw + fb, y_unfused, rtol=1e-12)


def test_fit_new_with_fake_keras_forward_matches_manual():
    fake = make_fake_keras()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 3))
    model = KerasDenseAE.fit_new(
        x, topology=[(4, "relu"), (None, "linear")], keras_module=fake
    )
    # layer stack: Dense(4, relu) -> BN -> Dense(3, linear); relu blocks
    # folding, so BN survives as its own affine layer: 3 layers total
    assert [act for _, _, act in model.weights] == ["relu", "linear", "linear"]

    # recompute manually from the captured fake layer weights
    (w1, b1), (w2, b2) = model.weights[0][:2], model.weights[2][:2]
    scale_w, scale_b = model.weights[1][:2]
    h = np.maximum(x @ w1 + b1, 0.0)
    h = h @ scale_w + scale_b
    xhat = h @ w2 + b2
    want = (np.abs(x - xhat) / model.feature_var).mean(axis=1)
    np.testing.assert_allclose(model.reconstruction_error(x), want, rtol=1e-12)
    # artifact round-trips through json (the registry format)
    again = KerasDenseAE.from_json(model.to_json())
    np.testing.assert_allclose(
        again.reconstruction_error(x), want, rtol=1e-12
    )


def test_build_autoencoder_fallback_and_backends():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(40, 5))
    # this container has no keras: auto falls back to the closed-form PCA AE
    model = build_autoencoder(x, n_components=2, backend="auto")
    assert isinstance(model, PCAAutoencoder)
    assert isinstance(build_autoencoder(x, backend="pca"), PCAAutoencoder)
    with pytest.raises(ImportError):
        build_autoencoder(x, backend="keras")
    with pytest.raises(ValueError):
        build_autoencoder(x, backend="tensorflow")


def test_score_distributed_accepts_keras_artifact(spark):
    """The duck-typed scorer contract: a weights-only KerasDenseAE scores
    through the same broadcast + pandas_udf path as the PCA backend."""
    fake = make_fake_keras()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(30, 3))
    model = KerasDenseAE.fit_new(
        x, topology=[(2, "linear"), (None, "linear")], keras_module=fake
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id bigint, features array<double>",
    )
    got = {
        r["id"]: r["score"]
        for r in score_distributed(df, model, "features").collect()
    }
    want = model.reconstruction_error(x)
    for i in range(len(x)):
        assert got[i] == pytest.approx(want[i], rel=1e-9)
