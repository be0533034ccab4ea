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


def test_linkage_key_length_contract(spark):
    """VERDICT r12 watch item: an accidental full-text compare_col made
    every candidate pair an O(|text|^2) Python DP. The bounded
    max(length()) pre-check must raise by default past max_key_len,
    truncate loudly when opted in, and leave short keys untouched."""
    from dataquality_ml_spark.operators.dedup import linkage_score_pairs

    df = spark.createDataFrame(
        [(1, "aaron smith"), (2, "aaron smyth"), (3, "zzz " * 40)],
        "doc_id long, k string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="max_key_len"):
        linkage_score_pairs(df, pairs, "k", max_key_len=32).collect()
    # truncate path: scores over the 32-char prefix, runs clean
    out = linkage_score_pairs(
        df, pairs, "k", max_key_len=32, on_long="truncate"
    ).collect()
    assert len(out) == 1 and out[0]["jw"] > 0.9
    # short keys under the cap: identical to the uncontracted result
    ok = linkage_score_pairs(df.where("doc_id < 3"), pairs, "k").collect()
    assert len(ok) == 1 and ok[0]["jw"] == out[0]["jw"]
    with pytest.raises(ValueError, match="on_long"):
        linkage_score_pairs(df, pairs, "k", on_long="warn")


def test_embedding_covariance_null_first_row_and_ragged(spark):
    """ADVICE r12 (low): a NULL first row made F.size return null and
    int() raise; mixed-length vectors were silently dropped. Nulls must
    now be skipped for d inference, and a ragged column must RAISE."""
    from dataquality_ml_spark.operators.similarity import embedding_covariance

    rows = [(None,), ([1.0, 2.0],), ([3.0, 4.0],)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(df).collect()}
    assert got[(1, 1)] == pytest.approx(1.0)  # var of {1,3}
    assert got[(1, 2)] == pytest.approx(1.0)
    assert got[(2, 2)] == pytest.approx(1.0)
    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "embedding array<double>"
    )
    with pytest.raises(Exception, match="mixed-length"):
        embedding_covariance(ragged).collect()
    # all-null column -> empty frame, documented schema
    allnull = spark.createDataFrame([(None,), (None,)], "embedding array<double>")
    out = embedding_covariance(allnull)
    assert out.count() == 0 and out.columns == ["i", "j", "cov"]


def test_theil_sen_tied_x_contracts(spark):
    """ADVICE r12 (low): all-tied x used to crash with TypeError on
    float(None); partially tied x overstated n_pairs. Now: all-tied x
    raises the loud ValueError, and n_pairs reports the ACTUAL pair
    count the median ran over (tied-x pairs excluded)."""
    from dataquality_ml_spark.operators.drift import theil_sen_trend

    tied = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 2.0), (1.0, 3.0)], "x double, y double"
    )
    with pytest.raises(ValueError, match="DISTINCT x"):
        theil_sen_trend(tied, "x", "y")
    # x = 1,1,2: nominal 3 pairs but only 2 have distinct x
    part = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 2.0), (2.0, 4.0)], "x double, y double"
    )
    r = theil_sen_trend(part, "x", "y").first()
    assert r["n_points"] == 3 and r["n_pairs"] == 2
    assert r["slope"] == pytest.approx(2.5)  # median of {3, 2}


def test_mann_kendall_distinct_x_contract(spark):
    """ADVICE r12 (low): tied x drops pairs from S while Var(S) assumes
    all n(n-1)/2 — duplicated x must raise; a clean series still runs."""
    from dataquality_ml_spark.operators.drift import mann_kendall_trend

    dup = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 2.0), (2.0, 3.0)], "x double, y double"
    )
    with pytest.raises(ValueError, match="distinct"):
        mann_kendall_trend(dup, "x", "y")
    clean = spark.createDataFrame(
        [(float(i), float(i)) for i in range(8)], "x double, y double"
    )
    r = mann_kendall_trend(clean, "x", "y").first()
    assert r["s_stat"] == 28 and r["z"] > 3.0


def test_cusum_batch_matches_fold_replay(spark):
    """VERDICT r13 item 5: the one-pass batch CUSUM (prefix-sum
    identity) must agree row-for-row with the sequential foreachBatch
    fold driven over the same slices — same batch ids, same statistics
    to 9 decimals, same alarms."""
    from dataquality_ml_spark.operators.drift import cusum_monitor_batch
    from dataquality_ml_spark.streaming.score_stream import cusum_monitor_replay

    df = spark.range(600).select(
        (F.col("id") % 30).alias("day"),
        (
            F.when(F.col("id") % 30 >= 20, (F.col("id") % 7) + 4.0)
            .otherwise((F.col("id") % 7) * 1.0)
        ).alias("value"),
    )
    mu0, slack, h = 3.0, 0.5, 2.0
    batch = cusum_monitor_batch(df, "day", mu0, "value", slack, h).collect()
    fold = cusum_monitor_replay(df, "day", mu0, "value", slack, h).collect()
    assert len(batch) == len(fold) == 30
    for b, f in zip(sorted(batch, key=lambda r: r["batch_id"]), fold):
        assert b["batch_id"] == f["batch_id"] and b["n"] == f["n"]
        assert b["mean"] == pytest.approx(f["mean"], abs=1e-9)
        assert b["splus"] == pytest.approx(f["splus"], abs=1e-9)
        assert b["sminus"] == pytest.approx(f["sminus"], abs=1e-9)
        assert b["alarm"] == f["alarm"]
    # the planted level shift (days 20..29 ride +4) must alarm by the end
    assert batch[-1]["alarm"] == 1 or fold[-1]["alarm"] == 1
