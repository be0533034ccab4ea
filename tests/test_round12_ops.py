"""Round-12 contract gates: the VERDICT r11 / ADVICE r12 fixes.

- survival_km's loud bins/lo/hi contract + exact-path distinct guard
- conversion_ztest raising (not returning empty) on a missing control
- woe_iv's NaN-excluding valid population
- pair_cooccurrence's hot-basket loud cap (hot_df convention)
- benford_check full-grid chi2 is pinned in test_round11_ops
- the selection engine's defensive collect cap under a lying HLL sketch
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_survival_km_bins_contract(spark):
    """bins=0 raises (never silently selects the exact path); bins
    without explicit lo/hi raises (the old (0,1) defaults clamped every
    duration > 1 into the top edge bin); a bracketing lo/hi works."""
    from dataquality_ml_spark.operators.sequences import survival_km

    df = spark.createDataFrame(
        [(1.0, 1), (5.0, 0), (9.0, 1)], "d double, e int"
    )
    with pytest.raises(ValueError, match="bins must be >= 1"):
        survival_km(df, "d", "e", bins=0)
    with pytest.raises(ValueError, match="explicit lo/hi"):
        survival_km(df, "d", "e", bins=4)
    with pytest.raises(ValueError, match="explicit lo/hi"):
        survival_km(df, "d", "e", bins=4, lo=0.0)  # hi missing
    with pytest.raises(ValueError, match="explicit lo/hi"):
        survival_km(df, "d", "e", bins=4, lo=5.0, hi=5.0)  # empty range
    rows = survival_km(df, "d", "e", bins=4, lo=0.0, hi=10.0).collect()
    assert len(rows) == 3  # three distinct bins occupied
    assert all(0.0 <= r["survival"] <= 1.0 for r in rows)


def test_survival_km_exact_path_distinct_guard(spark):
    """The exact (bins=None) path funnels the distinct-duration relation
    through ONE window task — it must raise past max_points with
    guidance to bins=, and still work below it."""
    from dataquality_ml_spark.operators.sequences import survival_km

    cont = spark.range(5000).select(
        (F.col("id") * 1.37).alias("d"), (F.col("id") % 2).alias("e")
    )
    with pytest.raises(ValueError, match="bins=.*bounded grid|bounded grid"):
        survival_km(cont, "d", "e", max_points=100)
    # below the cap: the textbook values still come out
    small = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1)], "d double, e int"
    )
    got = {r["t"]: r for r in survival_km(small, "d", "e", max_points=100).collect()}
    assert got[1.0]["survival"] == pytest.approx(2 / 3)
    assert got[3.0]["survival"] == 0.0


def test_conversion_ztest_missing_control_raises(spark):
    """A control value absent from group_col must fail LOUDLY at
    execution, never return a silently empty frame (round-12 ADVICE)."""
    from dataquality_ml_spark.operators.evaluate import conversion_ztest

    df = spark.createDataFrame(
        [("a", 1), ("a", 0), ("b", 1), ("b", 1)], "g string, y int"
    )
    out = conversion_ztest(df, "g", "y", control="nope")
    with pytest.raises(Exception, match="control group 'nope' has no rows"):
        out.collect()
    # a present control still computes the textbook z
    ok = {r["variant"]: r for r in conversion_ztest(df, "g", "y", "a").collect()}
    r = ok["b"]
    assert (r["n_control"], r["n_variant"]) == (2, 2)
    p_c, p_v, pool = 0.5, 1.0, 0.75
    se = math.sqrt(pool * (1 - pool) * (1 / 2 + 1 / 2))
    assert r["z"] == pytest.approx((p_v - p_c) / se, rel=1e-12)


def test_woe_iv_excludes_nan(spark):
    """NaN feature values are OUTSIDE the valid population — they must
    not clamp into bin 0 via floor(NaN/w) (round-12 ADVICE; same defect
    class as the binned-drift NULL/NaN bucket fix)."""
    from dataquality_ml_spark.operators.evaluate import woe_iv

    clean = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (9.5, 1), (9.5, 0)], "x double, y int"
    )
    dirty = clean.unionAll(
        spark.createDataFrame(
            [(float("nan"), 1)] * 50 + [(None, 0)] * 50, "x double, y int"
        )
    )
    want = sorted(
        (r["bin"], r["n_pos"], r["n_neg"])
        for r in woe_iv(clean, "x", "y", lo=0.0, hi=10.0, bins=5).collect()
    )
    got = sorted(
        (r["bin"], r["n_pos"], r["n_neg"])
        for r in woe_iv(dirty, "x", "y", lo=0.0, hi=10.0, bins=5).collect()
    )
    assert got == want  # the 100 NaN/NULL rows changed nothing


def test_pair_cooccurrence_hot_basket_contract(spark):
    """A basket whose distinct-item count exceeds max_items_per_basket
    raises under the default 'error' policy (its self-join expands
    k*(k-1)/2 pairs); 'exact' is the explicit quadratic opt-in; values
    on the opt-in path match the brute-force census."""
    from dataquality_ml_spark.operators.sequences import pair_cooccurrence

    hot = spark.createDataFrame(
        [("b1", f"i{j}") for j in range(30)] + [("b2", "i0"), ("b2", "i1")],
        "basket string, item string",
    )
    with pytest.raises(ValueError, match="hottest basket holds 30"):
        pair_cooccurrence(hot, "item", ["basket"], max_items_per_basket=10)
    with pytest.raises(ValueError, match="on_hot_basket"):
        pair_cooccurrence(hot, "item", ["basket"], on_hot_basket="warn")
    rows = pair_cooccurrence(
        hot, "item", ["basket"], max_items_per_basket=10, on_hot_basket="exact"
    ).collect()
    assert len(rows) == 30 * 29 // 2
    both = {(r["item_a"], r["item_b"]): r for r in rows}
    r01 = both[("i0", "i1")]
    assert (r01["n_both"], r01["n_a"], r01["n_b"]) == (2, 2, 2)
    assert r01["lift"] == pytest.approx(2 * 2 / (2 * 2))


def test_selection_collect_cap_survives_lying_sketch(spark, monkeypatch):
    """Round-12 ADVICE (profile collect cap): force the HLL distinct
    estimate to lie (report 1 for a 4000-distinct column) — the
    nd-admitted fast path must hit its .limit budget, re-route the chain
    to refinement instead of collecting unbounded runs, and the resolved
    quantiles must STILL be bit-equal to percentile()."""
    import pyspark.sql.functions as PF

    from dataquality_ml_spark.operators import profile as prof

    real_acd = PF.approx_count_distinct
    monkeypatch.setattr(
        PF, "approx_count_distinct", lambda c, *a, **k: F.lit(1)
    )
    try:
        df = spark.range(4000).select((F.col("id") * 1.0009).alias("v"))
        qs = [0.1, 0.5, 0.9]
        q_sql = ", ".join(map(str, qs))
        want = df.agg(
            F.expr(f"percentile(v, array({q_sql}))").alias("p")
        ).first()["p"]
        got = prof.exact_quantiles_select(df, "v", qs, collect_limit=64, bins=8)
        assert got == list(want)
    finally:
        monkeypatch.setattr(PF, "approx_count_distinct", real_acd)


def test_sorted_neighborhood_multipass_semantics(spark):
    """Multi-pass union: a pair proposed by two keys reports n_passes=2
    and the smaller rank distance; pairs are canonicalized id_a < id_b
    by ID (each pass orders by its own rank); every pass's join stays an
    equi-join (no CartesianProduct)."""
    from dataquality_ml_spark.operators.dedup import (
        sorted_neighborhood_multipass,
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "aaron smith", "x1"),
        (2, "aaron smyth", "x2"),
        (3, "zzz corp", "x3"),
        (4, "middle value", "x9"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, k1 string, k2 string")
    out = sorted_neighborhood_multipass(df, ["k1", "k2"], window=1)
    got = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    # k1 order: 1 < 2 < 4 < 3; k2 order: 1 < 2 < 3 < 4
    assert set(got) == {(1, 2), (2, 4), (3, 4), (2, 3)}
    assert got[(1, 2)]["n_passes"] == 2  # adjacent under both keys
    assert got[(2, 4)]["n_passes"] == 1  # k1 only
    assert got[(2, 3)]["n_passes"] == 1  # k2 only
    assert got[(3, 4)]["n_passes"] == 2  # adjacent under both (order flips)
    assert got[(1, 2)]["min_rank_distance"] == 1
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
    # brute-force cross-check vs the single-pass generator
    single = {
        frozenset((r["id_a"], r["id_b"]))
        for key in ("k1", "k2")
        for r in sorted_neighborhood_pairs(df, key, window=1).collect()
    }
    assert {frozenset(p) for p in got} == single
    with pytest.raises(ValueError, match="need >=1 sort key"):
        sorted_neighborhood_multipass(df, [], window=1)
