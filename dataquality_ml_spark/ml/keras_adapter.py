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
            # 1-D w = elementwise affine (a folded BatchNorm after a
            # non-linearity); 2-D w = dense matmul
            h = h * w + b if w.ndim == 1 else h @ w + b
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
                    # keep BN as its own ELEMENTWISE affine after the
                    # activation (1-D scale, not an O(d^2) diag matrix —
                    # at the reference's 512-wide layers the dense form
                    # bloats the artifact ~350k zeros and turns an O(d)
                    # multiply into a matmul)
                    folded.append((w, b, act))
                    folded.append((scale, beta - mu * scale, "linear"))
                    i += 2
                    continue
            folded.append((w, b, act))
        i += 1
    if dense_idx != len(activations):
        raise ValueError(
            f"expected {len(activations)} Dense layers, found {dense_idx}"
        )
    return folded


# -- sequence (LSTM) backend: M8/M9 ----------------------------------------

# (units, return_sequences) per LSTM layer of the reference encoder/decoder
# (app/LSTM_AE.py:237-350): 128→64→32 encoder, RepeatVector, 64→128 decoder,
# TimeDistributed(Dense) reconstruction. The VAE (app/LSTM_VAE.py:281-424)
# shares this shape with a reparameterized latent — at inference its mean
# path is the same deterministic stack, which is what scoring needs.
REFERENCE_LSTM_TOPOLOGY = {
    "encoder": [(128, True), (64, True), (32, False)],
    "decoder": [(64, True), (128, True)],
}


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def lstm_forward(
    x: np.ndarray, w: np.ndarray, u: np.ndarray, b: np.ndarray, return_sequences: bool
) -> np.ndarray:
    """Standard keras LSTM inference in numpy: gate order (i, f, c̃, o),
    sigmoid recurrent activation, tanh cell activation, zero initial state.
    x is (n, T, d); returns (n, T, units) or (n, units)."""
    n, t_steps, _ = x.shape
    units = u.shape[0]
    h = np.zeros((n, units))
    c = np.zeros((n, units))
    outs = []
    for t in range(t_steps):
        z = x[:, t] @ w + h @ u + b
        i = _sigmoid(z[:, :units])
        f = _sigmoid(z[:, units : 2 * units])
        g = np.tanh(z[:, 2 * units : 3 * units])
        o = _sigmoid(z[:, 3 * units :])
        c = f * c + i * g
        h = o * np.tanh(c)
        outs.append(h)
    return np.stack(outs, axis=1) if return_sequences else h


@dataclass
class KerasLSTMAE:
    """Weights-only LSTM autoencoder (M8; the VAE's deterministic mean path
    for M9). ``layers`` is a list of specs replayed by a numpy forward pass:

    - ``("lstm", W, U, b, return_sequences)``
    - ``("affine", scale, shift)`` — a folded BatchNormalization, applied
      along the feature axis (broadcasts over time when 3-D)
    - ``("repeat", n)`` — RepeatVector
    - ``("dense", W, b)`` — TimeDistributed(Dense), applied per timestep

    ``reconstruction_error`` takes FLATTENED (n, T·f) rows — the layout the
    ``sequences`` window operator emits — so the artifact plugs into
    ``score_distributed`` unchanged; it reshapes to (n, T, f) internally.
    Error = variance-clamped MAE over the sequence (reference 3-D
    mae_error, lib/utils.py:66-96).
    """

    layers: list = field(default_factory=list)
    timesteps: int = 0
    n_features: int = 0
    feature_var: np.ndarray | None = None  # per flat (T·f) position

    def _forward(self, x3: np.ndarray) -> np.ndarray:
        h = x3
        for spec in self.layers:
            kind = spec[0]
            if kind == "lstm":
                _, w, u, b, ret = spec
                h = lstm_forward(h, w, u, b, ret)
            elif kind == "affine":
                _, scale, shift = spec
                h = h * scale + shift
            elif kind == "repeat":
                h = np.repeat(h[:, None, :], spec[1], axis=1)
            elif kind == "dense":
                _, w, b = spec
                h = h @ w + b
            else:  # pragma: no cover - guarded at construction
                raise ValueError(f"unknown layer kind {kind}")
        return h

    def reconstruction_error(self, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        x3 = x.reshape(n, self.timesteps, self.n_features)
        xhat = self._forward(x3).reshape(n, -1)
        return (np.abs(x - xhat) / self.feature_var).mean(axis=1)

    def to_json(self) -> str:
        specs = []
        for spec in self.layers:
            if spec[0] == "repeat":
                specs.append(["repeat", spec[1]])
            elif spec[0] == "lstm":
                specs.append(
                    ["lstm", spec[1].tolist(), spec[2].tolist(), spec[3].tolist(), spec[4]]
                )
            else:  # affine / dense: (kind, arr, arr)
                specs.append([spec[0], spec[1].tolist(), spec[2].tolist()])
        return json.dumps(
            {
                "layers": specs,
                "timesteps": self.timesteps,
                "n_features": self.n_features,
                "feature_var": self.feature_var.tolist(),
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "KerasLSTMAE":
        d = json.loads(s)
        layers = []
        for spec in d["layers"]:
            if spec[0] == "repeat":
                layers.append(("repeat", int(spec[1])))
            elif spec[0] == "lstm":
                layers.append(
                    (
                        "lstm",
                        np.array(spec[1]),
                        np.array(spec[2]),
                        np.array(spec[3]),
                        bool(spec[4]),
                    )
                )
            else:
                layers.append((spec[0], np.array(spec[1]), np.array(spec[2])))
        return cls(
            layers=layers,
            timesteps=d["timesteps"],
            n_features=d["n_features"],
            feature_var=np.array(d["feature_var"]),
        )

    @classmethod
    def fit_new(
        cls,
        x3: np.ndarray,
        epochs: int = 100,
        batch_size: int = 256,
        topology: dict | None = None,
        keras_module=None,
    ) -> "KerasLSTMAE":
        """Train the reference LSTM-AE with keras and extract a weights-only
        replay stack. Raises ImportError when keras is absent."""
        keras = keras_module
        if keras is None:
            import keras  # noqa: PLC0415 — the optional dependency gate

        topo = topology or REFERENCE_LSTM_TOPOLOGY
        n, timesteps, n_features = x3.shape
        inp = keras.layers.Input(shape=(timesteps, n_features))
        t = keras.layers.GaussianNoise(0.01)(inp)
        for units, ret in topo["encoder"]:
            t = keras.layers.LSTM(units, activation="tanh", return_sequences=ret)(t)
            t = keras.layers.BatchNormalization()(t)
        t = keras.layers.RepeatVector(timesteps)(t)
        for units, ret in topo["decoder"]:
            t = keras.layers.LSTM(units, activation="tanh", return_sequences=ret)(t)
            t = keras.layers.BatchNormalization()(t)
        t = keras.layers.TimeDistributed(
            keras.layers.Dense(n_features, activation="linear")
        )(t)
        model = keras.models.Model(inputs=inp, outputs=t)
        try:
            opt = keras.optimizers.legacy.Adam(learning_rate=0.001)
        except AttributeError:
            opt = keras.optimizers.Adam(learning_rate=0.001)
        model.compile(optimizer=opt, loss="mae")
        model.fit(
            x3,
            x3,
            epochs=epochs,
            batch_size=batch_size,
            validation_split=0.2,
            callbacks=[
                keras.callbacks.EarlyStopping(
                    monitor="val_loss", patience=20, restore_best_weights=True
                ),
                keras.callbacks.ReduceLROnPlateau(
                    monitor="val_loss", factor=0.2, patience=10
                ),
            ],
            shuffle=True,
            verbose=0,
        )
        layers = extract_sequence_layers(model.layers)
        flat = x3.reshape(n, -1)
        var = np.maximum(flat.var(axis=0), MIN_VARIANCE)
        return cls(
            layers=layers,
            timesteps=timesteps,
            n_features=n_features,
            feature_var=var,
        )


def extract_sequence_layers(layers) -> list:
    """Map keras layer objects (matched by class NAME so test stand-ins
    work) to the numpy replay specs of ``KerasLSTMAE``. BatchNorm becomes a
    standalone affine (the tanh non-linearity forbids folding into the LSTM);
    Dropout/GaussianNoise/Input vanish (inference no-ops)."""
    out: list = []
    for layer in layers:
        name = type(layer).__name__
        if name == "LSTM":
            w, u, b = (np.asarray(a, dtype=np.float64) for a in layer.get_weights())
            ret = bool(getattr(layer, "return_sequences", True))
            out.append(("lstm", w, u, b, ret))
        elif name == "BatchNormalization":
            gamma, beta, mu, var = (
                np.asarray(a, dtype=np.float64) for a in layer.get_weights()
            )
            eps = float(getattr(layer, "epsilon", 1e-3))
            scale = gamma / np.sqrt(var + eps)
            out.append(("affine", scale, beta - mu * scale))
        elif name == "RepeatVector":
            out.append(("repeat", int(layer.n)))
        elif name == "TimeDistributed":
            w, b = (np.asarray(a, dtype=np.float64) for a in layer.get_weights())
            out.append(("dense", w, b))
    return out


def build_sequence_autoencoder(
    x3: np.ndarray,
    n_components: int = 4,
    backend: str = "auto",
    **fit_kwargs,
):
    """Sequence-detector factory (M8/M9 counterpart of ``build_autoencoder``):
    real keras LSTM-AE when importable, else the windowed linear AE — a
    ``PCAAutoencoder`` over FLATTENED (n, T·f) windows, the engine's default
    stand-in (VERDICT r2 M8/M9). Both satisfy the ``score_distributed``
    contract over flattened sequence rows."""
    if backend not in ("auto", "keras", "pca"):
        raise ValueError(f"unknown backend: {backend}")
    if backend in ("auto", "keras"):
        try:
            return KerasLSTMAE.fit_new(x3, **fit_kwargs)
        except ImportError:
            if backend == "keras":
                raise
    flat = x3.reshape(x3.shape[0], -1)
    return PCAAutoencoder.fit(flat, n_components=n_components)


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
