"""Round-13 regression tests: ADVICE-r12 fixes (bootstrap premix,
isotonic NaN validity, covariance d-inference, trend tied-x contracts,
hill tie determinism) and VERDICT-r13 items (linkage key-length
contract, batch CUSUM face, global-window sweep support)."""
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def test_poisson_bootstrap_premix_breaks_congruence(spark):
    """ADVICE r12 (medium): the old seed (id*n_boot + b + 1) mod 2^32
    gave ids congruent mod 2^32/n_boot identical u for EVERY replicate —
    shifting every id by 2^26 (n_boot=64) reproduced the exact same
    weight stream, hence a bit-identical CI. The splitmix-style premix
    must break that: same values, shifted ids -> different resample
    weights -> different CI endpoints."""
    from dataquality_ml_spark.operators.evaluate import poisson_bootstrap_ci

    base = spark.range(2000).select(
        F.col("id"), ((F.col("id") % 97) / 7.0).alias("v")
    )
    shifted = base.select((F.col("id") + F.lit(1 << 26)).alias("id"), "v")
    r1 = poisson_bootstrap_ci(base, "v", "id", n_boot=64).first()
    r2 = poisson_bootstrap_ci(shifted, "v", "id", n_boot=64).first()
    assert r1["n"] == r2["n"] and r1["mean"] == r2["mean"]
    # old mixer: (boot_lo, boot_median, boot_hi) identical; new: distinct
    assert (r1["boot_lo"], r1["boot_median"], r1["boot_hi"]) != (
        r2["boot_lo"], r2["boot_median"], r2["boot_hi"]
    )


def test_poisson_bootstrap_large_id_no_overflow(spark):
    """ADVICE r12: id*n_boot used to overflow int64 for ids near 2^63
    (the multiply happened BEFORE the mod-2^32 reduction). The premix
    reduces each half first, so the largest non-negative bigint id must
    run clean and produce a finite bracketed CI."""
    from dataquality_ml_spark.operators.evaluate import poisson_bootstrap_ci

    top = (1 << 63) - 1
    df = spark.range(500).select(
        (F.lit(top) - F.col("id")).alias("id"),
        ((F.col("id") % 11) / 2.0).alias("v"),
    )
    r = poisson_bootstrap_ci(df, "v", "id", n_boot=32).first()
    assert r["n"] == 500
    for c in ("boot_lo", "boot_median", "boot_hi"):
        assert r[c] is not None and math.isfinite(r[c])
    assert r["boot_lo"] <= r["boot_median"] <= r["boot_hi"]


def test_isotonic_calibration_nan_score_excluded(spark):
    """ADVICE r12 (medium): a NaN score passed the bare isNotNull
    filter, floor(NaN) clamped it into bin 0 and poisoned that bin's
    score sum. With the shared _valid predicate the NaN row must be a
    no-op: result identical to the frame without it."""
    from dataquality_ml_spark.operators.evaluate import isotonic_calibration

    clean = [(0.1, 0), (0.1, 1), (0.6, 1), (0.6, 1), (0.9, 1)]
    df_clean = spark.createDataFrame(clean, "s double, y int")
    df_dirty = spark.createDataFrame(
        clean + [(float("nan"), 1), (None, 0), (0.5, None)],
        "s double, y int",
    )
    a = isotonic_calibration(df_clean, "s", "y", bins=4).collect()
    b = isotonic_calibration(df_dirty, "s", "y", bins=4).collect()
    assert a == b
    assert all(not math.isnan(r["mean_score"]) for r in b)
