"""Optional Keras backend for the dense-autoencoder detector (M7; extends
to the windowed sequence detectors M8/M9 through the same scorer contract).

The reference's core detector is a Keras dense AE — 512→256→128→48 relu
encoder, 128→256→512 linear decoder with BatchNorm after every Dense,
GaussianNoise input, L2 2.5e-4, Adam 1e-4, MAE loss, EarlyStopping +
ReduceLROnPlateau, threshold = P95 of training reconstruction error
(reference app/AE_model.py:111-209). This container ships no keras, so the
engine's default backend is the closed-form ``PCAAutoencoder``
(``ml.detectors``); this module is the documented adapter that uses real
keras WHEN IMPORTABLE, with the same engine lifecycle:

- **fit** runs single-node on the bounded driver sample (keras training is
  not distributed — same stance as the reference);
- **the fitted artifact is weights-only numpy**: after training, each
  Dense(+following BatchNorm) pair is folded into one affine layer, so
  **scoring executors never import keras** — ``reconstruction_error`` is a
  pure-numpy forward pass, broadcast-friendly, Arrow-batch-sized.
- reconstruction error keeps the reference's variance-normalized MAE with
  the 1e-6 clamp (lib/utils.py:39-63), identical to the PCA backend.

``build_autoencoder`` is the entry point: ``backend="auto"`` tries keras
and silently falls back to PCA; ``backend="keras"`` raises if keras is
missing; ``backend="pca"`` never tries.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from dataquality_ml_spark.ml.detectors import MIN_VARIANCE, PCAAutoencoder

# (units, activation) per Dense layer of the reference topology; None units
# = input_dim (the final reconstruction layer, app/AE_model.py:160).
REFERENCE_TOPOLOGY: list[tuple[int | None, str]] = [
    (512, "relu"),
    (256, "relu"),
    (128, "relu"),
    (48, "relu"),
    (128, "linear"),
    (256, "linear"),
    (512, "linear"),
    (None, "linear"),
]


@dataclass
class KerasDenseAE:
    """Weights-only dense autoencoder: a list of folded affine layers
    (W, b, activation). Produced by ``fit_new`` (keras training + BatchNorm
    folding); consumed by a numpy forward pass — picklable, broadcastable,
    no framework dependency at scoring time."""

    weights: list = field(default_factory=list)  # [(W, b, act), ...]
    feature_var: np.ndarray | None = None

    def _forward(self, x: np.ndarray) -> np.ndarray:
        h = x
        for w, b, act in self.weights:
            h = h @ w + b
            if act == "relu":
                h = np.maximum(h, 0.0)
        return h

    def reconstruction_error(self, x: np.ndarray) -> np.ndarray:
        """Variance-normalized MAE (reference mae_error_ae,
        lib/utils.py:39-63), matching ``PCAAutoencoder`` exactly."""
        xhat = self._forward(x)
        return (np.abs(x - xhat) / self.feature_var).mean(axis=1)

    def to_json(self) -> str:
        return json.dumps(
            {
                "weights": [
                    [w.tolist(), b.tolist(), act] for w, b, act in self.weights
                ],
                "feature_var": self.feature_var.tolist(),
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "KerasDenseAE":
        d = json.loads(s)
        return cls(
            weights=[
                (np.array(w), np.array(b), act) for w, b, act in d["weights"]
            ],
            feature_var=np.array(d["feature_var"]),
        )

    # -- training ----------------------------------------------------------
    @classmethod
    def fit_new(
        cls,
        x: np.ndarray,
        epochs: int = 60,
        batch_size: int = 256,
        topology: list[tuple[int | None, str]] | None = None,
        keras_module=None,
    ) -> "KerasDenseAE":
        """Train the reference-topology AE with keras and fold the result
        into numpy affine layers. Raises ImportError when keras is absent.

        ``keras_module`` injects a stand-in for tests; production callers
        leave it None and get the real ``import keras``.
        """
        keras = keras_module
        if keras is None:
            import keras  # noqa: PLC0415 — the optional dependency gate

        topo = topology or REFERENCE_TOPOLOGY
        input_dim = x.shape[1]
        inp = keras.layers.Input(shape=(input_dim,))
        t = keras.layers.GaussianNoise(0.01)(inp)
        for i, (units, act) in enumerate(topo):
            n = input_dim if units is None else units
            reg = keras.regularizers.l2(0.00025)
            t = keras.layers.Dense(n, activation=act, kernel_regularizer=reg)(t)
            if i < len(topo) - 1:  # no BatchNorm after the final layer
                t = keras.layers.BatchNormalization()(t)
        model = keras.models.Model(inputs=inp, outputs=t)
        try:
            opt = keras.optimizers.legacy.Adam(learning_rate=0.0001)
        except AttributeError:
            opt = keras.optimizers.Adam(learning_rate=0.0001)
        model.compile(optimizer=opt, loss="mae")
        callbacks = [
            keras.callbacks.EarlyStopping(
                monitor="val_loss",
                patience=12,
                restore_best_weights=True,
                min_delta=0.00005,
            ),
            keras.callbacks.ReduceLROnPlateau(
                monitor="val_loss", factor=0.2, patience=3, min_lr=0.000001
            ),
        ]
        model.fit(
            x,
            x,
            epochs=epochs,
            batch_size=batch_size,
            validation_split=0.2,
            callbacks=callbacks,
            shuffle=True,
            verbose=0,
        )
        acts = [act for _, act in topo]
        folded = fold_dense_batchnorm(model.layers, acts)
        var = np.maximum(x.var(axis=0), MIN_VARIANCE)
        return cls(weights=folded, feature_var=var)


def fold_dense_batchnorm(layers, activations: list[str]) -> list:
    """Fold each Dense layer and its (optional) following BatchNormalization
    into one affine (W, b): BN(y) = γ·(y−μ)/√(σ²+ε) + β applied to
    y = xW + b gives W' = W·diag(γ/√(σ²+ε)), b' = (b−μ)·γ/√(σ²+ε) + β.
    Inference-exact (BN uses moving stats at inference; GaussianNoise is
    train-only and drops out entirely).

    Layers are matched by class NAME so a test stand-in module works;
    ``activations`` supplies the per-Dense activation in build order.
    """
    folded: list = []
    dense_idx = 0
    i = 0
    seq = list(layers)
    while i < len(seq):
        layer = seq[i]
        if type(layer).__name__ == "Dense":
            w, b = (np.asarray(a, dtype=np.float64) for a in layer.get_weights())
            act = activations[dense_idx]
            dense_idx += 1
            if i + 1 < len(seq) and type(seq[i + 1]).__name__ == "BatchNormalization":
                bn = seq[i + 1]
                gamma, beta, mu, var = (
                    np.asarray(a, dtype=np.float64) for a in bn.get_weights()
                )
                eps = float(getattr(bn, "epsilon", 1e-3))
                scale = gamma / np.sqrt(var + eps)
                if act == "linear":
                    # affine ∘ affine composes exactly
                    w, b = w * scale, (b - mu) * scale + beta
                    i += 1
                else:
                    # non-linear activation sits between Dense and BN:
                    # keep BN as its own affine layer after the activation
                    folded.append((w, b, act))
                    d = w.shape[1]
                    folded.append(
                        (
                            np.diag(scale),
                            beta - mu * scale,
                            "linear",
                        )
                    )
                    i += 2
                    continue
            folded.append((w, b, act))
        i += 1
    if dense_idx != len(activations):
        raise ValueError(
            f"expected {len(activations)} Dense layers, found {dense_idx}"
        )
    return folded


def build_autoencoder(
    x: np.ndarray,
    n_components: int = 8,
    backend: str = "auto",
    **fit_kwargs,
):
    """Detector factory honoring the optional-keras contract:

    - ``backend="auto"``: real keras AE when ``import keras`` succeeds,
      else the closed-form ``PCAAutoencoder`` (this container's path);
    - ``backend="keras"``: keras or ImportError;
    - ``backend="pca"``: always the closed-form backend.

    Either return value satisfies the ``score_distributed`` scorer contract
    (``reconstruction_error`` over an (n, d) array + broadcastability).
    """
    if backend not in ("auto", "keras", "pca"):
        raise ValueError(f"unknown backend: {backend}")
    if backend in ("auto", "keras"):
        try:
            return KerasDenseAE.fit_new(x, **fit_kwargs)
        except ImportError:
            if backend == "keras":
                raise
    return PCAAutoencoder.fit(x, n_components=n_components)
