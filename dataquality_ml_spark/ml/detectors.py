"""Anomaly detectors: sampled-fit, distributed-apply (SURVEY.md §2.8
M7/M10/M13, §7 step 6).

The reference trains Keras autoencoders and sklearn IsolationForest on the
FULL collected dataset on the driver (reference app/AE_model.py:64-74,
app/IsolationForest_AE.py:160-202) — its biggest scalability anti-pattern.
This container ships neither keras nor sklearn, and the engine would not
use them for scoring anyway; both detector families are re-implemented in
numpy with the engine contract:

- **fit** consumes a BOUNDED sample (`sample_hash` deterministic sampling),
  so driver memory is O(sample), never O(dataset);
- **score** runs as an Arrow-batched pandas UDF with the model weights in
  a broadcast variable — rows never visit the driver;
- reconstruction error follows the reference's variance-normalized MAE with
  the 1e-6 variance clamp (lib/utils.py:39-63).

``PCAAutoencoder`` is the linear-autoencoder equivalent of the reference's
dense AE (M7): encode = project onto top-d principal components, decode =
project back; identical train/score lifecycle, deterministic, closed-form.
``IsolationForest`` is a from-scratch implementation of Liu et al.'s
algorithm (the sklearn defaults the reference tunes at
app/IsolationForest_AE.py:204-260).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

MIN_VARIANCE = 1e-6  # reference lib/utils.py:53-63 clamp


def collect_feature_sample(
    df: DataFrame, features_col: str = "features", max_rows: int = 100_000, seed: int = 42
) -> np.ndarray:
    """Bounded training sample for a driver-side fit. Uses seeded Bernoulli
    sampling sized from a cheap count, then a hard limit."""
    n = df.count()
    if n > max_rows:
        df = df.sample(fraction=min(1.0, 1.2 * max_rows / n), seed=seed).limit(max_rows)
    rows = df.select(features_col).collect()
    return np.array([r[0] for r in rows], dtype=np.float64)


@dataclass
class PCAAutoencoder:
    """Linear AE: x̂ = μ + (x−μ)·Vᵀ·V with V = top-d principal components."""

    mean: np.ndarray
    components: np.ndarray  # (d, n_features)
    feature_var: np.ndarray

    @classmethod
    def fit(cls, x: np.ndarray, n_components: int = 8) -> "PCAAutoencoder":
        mu = x.mean(axis=0)
        xc = x - mu
        # SVD of the centered sample — deterministic, no iterative seeds
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        d = min(n_components, vt.shape[0])
        var = np.maximum(xc.var(axis=0), MIN_VARIANCE)
        return cls(mean=mu, components=vt[:d], feature_var=var)

    def reconstruction_error(self, x: np.ndarray) -> np.ndarray:
        """Variance-normalized MAE (reference mae_error_ae semantics,
        lib/utils.py:39-63: |x−x̂| / clamp(var) averaged over features)."""
        xc = x - self.mean
        xhat = xc @ self.components.T @ self.components
        return (np.abs(xc - xhat) / self.feature_var).mean(axis=1)

    def to_json(self) -> str:
        return json.dumps(
            {
                "mean": self.mean.tolist(),
                "components": self.components.tolist(),
                "feature_var": self.feature_var.tolist(),
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "PCAAutoencoder":
        d = json.loads(s)
        return cls(
            mean=np.array(d["mean"]),
            components=np.array(d["components"]),
            feature_var=np.array(d["feature_var"]),
        )


class IsolationForest:
    """From-scratch Isolation Forest (Liu, Ting, Zhou 2008).

    Array-based tree layout (no Python objects per node) so scoring a batch
    is vectorized numpy; deterministic under the seed.
    """

    def __init__(self, n_estimators: int = 100, max_samples: int = 256, seed: int = 42):
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.seed = seed
        self.trees: list[dict[str, np.ndarray]] = []

    @staticmethod
    def _avg_path(n: float) -> float:
        if n <= 1:
            return 0.0
        h = np.log(n - 1) + 0.5772156649
        return 2.0 * h - 2.0 * (n - 1) / n

    def fit(self, x: np.ndarray) -> "IsolationForest":
        rng = np.random.default_rng(self.seed)
        n, d = x.shape
        sub = min(self.max_samples, n)
        self.height_limit = int(np.ceil(np.log2(max(sub, 2))))
        # leaf-size → expected-path-length lookup (vectorized leaf scoring)
        self._c_table = np.array([self._avg_path(i) for i in range(sub + 1)])
        self.trees = []
        for _ in range(self.n_estimators):
            idx = rng.choice(n, size=sub, replace=False)
            tree = {"feat": [], "split": [], "left": [], "right": [], "size": []}
            self._build(x[idx], rng, tree, 0)
            self.trees.append({k: np.array(v) for k, v in tree.items()})
        return self

    def _build(self, x: np.ndarray, rng, tree, depth) -> int:
        node = len(tree["feat"])
        for k in tree:
            tree[k].append(0)
        if depth >= self.height_limit or len(x) <= 1:
            tree["feat"][node] = -1
            tree["size"][node] = len(x)
            return node
        spans = x.max(axis=0) - x.min(axis=0)
        usable = np.nonzero(spans > 0)[0]
        if len(usable) == 0:
            tree["feat"][node] = -1
            tree["size"][node] = len(x)
            return node
        f = int(rng.choice(usable))
        lo, hi = x[:, f].min(), x[:, f].max()
        s = float(rng.uniform(lo, hi))
        tree["feat"][node] = f
        tree["split"][node] = s
        mask = x[:, f] < s
        tree["left"][node] = self._build(x[mask], rng, tree, depth + 1)
        tree["right"][node] = self._build(x[~mask], rng, tree, depth + 1)
        return node

    def path_lengths(self, x: np.ndarray) -> np.ndarray:
        total = np.zeros(len(x))
        for tree in self.trees:
            node = np.zeros(len(x), dtype=np.int64)
            depth = np.zeros(len(x))
            active = np.ones(len(x), dtype=bool)
            while active.any():
                feat = tree["feat"][node]
                leaf = feat < 0
                done = active & leaf
                if done.any():
                    sizes = tree["size"][node[done]]
                    depth[done] += self._c_table[sizes]
                    active = active & ~leaf
                if not active.any():
                    break
                f = feat[active]
                go_left = x[np.nonzero(active)[0], f] < tree["split"][node[active]]
                nxt = np.where(go_left, tree["left"][node[active]], tree["right"][node[active]])
                node[active] = nxt
                depth[active] += 1
            total += depth
        return total / self.n_estimators

    def score_samples(self, x: np.ndarray) -> np.ndarray:
        """Anomaly score in (0, 1]: 2^(−E[h(x)]/c(ψ)); higher = more
        anomalous (the reference negates sklearn's score_samples to get the
        same orientation, app/IsolationForest_AE.py:290)."""
        c = self._avg_path(min(self.max_samples, 10**9))
        return np.power(2.0, -self.path_lengths(x) / c)

    def to_state(self) -> dict:
        return {
            "n_estimators": self.n_estimators,
            "max_samples": self.max_samples,
            "height_limit": self.height_limit,
            "trees": [{k: v.tolist() for k, v in t.items()} for t in self.trees],
        }

    @classmethod
    def from_state(cls, d: dict) -> "IsolationForest":
        m = cls(d["n_estimators"], d["max_samples"])
        m.height_limit = d["height_limit"]
        m.trees = [{k: np.array(v) for k, v in t.items()} for t in d["trees"]]
        m._c_table = np.array([m._avg_path(i) for i in range(m.max_samples + 1)])
        return m


def score_distributed(
    df: DataFrame,
    scorer,
    features_col: str = "features",
    out: str = "score",
) -> DataFrame:
    """Apply a fitted detector to every row via an Arrow-batched pandas UDF
    with broadcast weights — the distributed replacement for the
    reference's driver-side model.predict loops (app/test_AE.py:190-195).

    ``scorer`` must expose ``reconstruction_error`` or ``score_samples``
    over an (n, d) float array and round-trip via its json/state methods.
    """
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    if isinstance(scorer, PCAAutoencoder):
        payload = ("pca", scorer.to_json())
    elif isinstance(scorer, IsolationForest):
        payload = ("iforest", json.dumps(scorer.to_state()))
    else:
        raise TypeError(f"unsupported scorer: {type(scorer)}")
    bc = spark.sparkContext.broadcast(payload)

    @pandas_udf(DoubleType())
    def score_udf(feats: pd.Series) -> pd.Series:
        kind, blob = bc.value
        model = (
            PCAAutoencoder.from_json(blob)
            if kind == "pca"
            else IsolationForest.from_state(json.loads(blob))
        )
        x = np.array(feats.tolist(), dtype=np.float64)
        s = (
            model.reconstruction_error(x)
            if kind == "pca"
            else model.score_samples(x)
        )
        return pd.Series(s)

    return df.withColumn(out, score_udf(F.col(features_col)))
