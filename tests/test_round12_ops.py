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


def test_hill_tail_index_semantics(spark):
    """Exact Pareto order statistics give the closed-form Hill estimate;
    the plan is a TakeOrderedAndProject (no global sort); fewer than k+1
    positive values raises loudly at execution."""
    # deterministic Pareto(alpha=2): v = (1 - u)^(-1/2) on a fixed grid
    df = spark.range(1, 2001).select(
        F.col("id").alias("i"), F.pow(F.col("id") / 2001.0, -0.5).alias("v")
    )
    from dataquality_ml_spark.operators.profile import hill_tail_index

    out = hill_tail_index(df, "v", k=100, id_col="i")
    row = out.first()
    # brute force in python
    vals = sorted((float((i / 2001.0) ** -0.5), i) for i in range(1, 2001))
    top = sorted(vals, key=lambda t: (-t[0], t[1]))[:101]
    thr = top[100][0]
    h = sum(math.log(v / thr) for v, _ in top[:100]) / 100
    assert row["k_used"] == 100
    assert row["threshold"] == thr
    assert row["hill_alpha"] == pytest.approx(1 / h, rel=1e-9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    small = spark.range(1, 5).select(F.col("id").alias("i"), F.col("id").cast("double").alias("v"))
    with pytest.raises(Exception, match="fewer than k"):
        hill_tail_index(small, "v", k=100, id_col="i").collect()


def test_gini_coefficient_semantics(spark):
    """Gini == brute-force rank formula; constant column -> 0; one
    holder of everything among n -> (n-1)/n; no unpartitioned window in
    the plan (distributed prefix-sum rank)."""
    from dataquality_ml_spark import plans as plan_mod
    from dataquality_ml_spark.operators.profile import gini_coefficient
    from tests.test_scale_plans import _global_window_specs

    import random

    rng = random.Random(5)
    rows = [(i, rng.random() * rng.randrange(1, 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "i long, v double")
    got = gini_coefficient(df, "v", id_col="i").first()
    xs = sorted(v for _, v in rows)
    n, s = len(xs), sum(xs)
    want = 2 * sum((r + 1) * x for r, x in enumerate(xs)) / (n * s) - (n + 1) / n
    assert got["gini"] == pytest.approx(want, rel=1e-12)
    assert _global_window_specs(
        plan_mod.formatted_plan(gini_coefficient(df, "v", id_col="i"))
    ) == []
    onehot = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 10)], "i long, v double"
    )
    assert gini_coefficient(onehot, "v").first()["gini"] == pytest.approx(0.9)


def test_cusum_changepoint_semantics(spark):
    """A planted level shift puts the |CUSUM| peak on the last
    pre-shift bucket; cusum telescopes to ~0 at the series end."""
    import datetime

    from dataquality_ml_spark.operators.drift import cusum_changepoint

    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d, hours=h),
         10.0 + (4.0 if d >= 20 else 0.0))
        for d in range(40)
        for h in range(2)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = cusum_changepoint(df, "ts", "v").orderBy("bucket_ts").collect()
    assert len(out) == 40
    peak = [r for r in out if r["is_changepoint"] == 1]
    assert len(peak) == 1 and str(peak[0]["bucket_ts"])[:10] == "2024-01-20"
    assert abs(out[-1]["cusum"]) < 1e-9  # telescoping


def test_theil_sen_contract_and_robustness(spark):
    """Outlier-immune slope on a clean line + one corrupted point;
    raises past max_points and below 2 points."""
    from dataquality_ml_spark.operators.drift import theil_sen_trend

    pts = spark.createDataFrame(
        [(float(i), 3.0 * i - 2.0 + (1000.0 if i == 7 else 0.0)) for i in range(15)],
        "x double, y double",
    )
    r = theil_sen_trend(pts, "x", "y").first()
    assert r["slope"] == pytest.approx(3.0)
    assert r["intercept"] == pytest.approx(-2.0)
    assert r["n_pairs"] == 15 * 14 // 2
    with pytest.raises(ValueError, match="exceed max_points"):
        theil_sen_trend(pts, "x", "y", max_points=10)
    one = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    with pytest.raises(ValueError, match="need >=2 points"):
        theil_sen_trend(one, "x", "y")


def test_chao1_textbook_example(spark):
    """Hand corpus: 6 singletons, 2 doubletons, 1 triple ->
    S_obs=9, Chao1 = 9 + 6*5/(2*3) = 14; coverage = 1 - 6/13."""
    from dataquality_ml_spark.operators.dedup import chao1_duplicate_richness

    texts = (
        [f"unique doc {i}" for i in range(6)]
        + ["pair one"] * 2 + ["pair two"] * 2 + ["triple doc"] * 3
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    r = chao1_duplicate_richness(df).first()
    assert (r["n_docs"], r["s_obs"], r["f1"], r["f2"]) == (13, 9, 6, 2)
    assert r["chao1_estimate"] == pytest.approx(9 + 6 * 5 / (2 * 3))
    assert r["coverage"] == pytest.approx(1 - 6 / 13)
    assert r["dup_rate"] == pytest.approx(1 - 9 / 13)


def test_importance_weight_ess(spark):
    """Equal weights -> ESS = n; one dominant weight -> ESS ~ 1; null /
    NaN / non-positive weights excluded."""
    from dataquality_ml_spark.operators.selection import importance_weight_ess

    eq = spark.range(100).select(F.lit(2.5).alias("w"))
    r = importance_weight_ess(eq, "w").first()
    assert r["ess"] == pytest.approx(100.0) and r["ess_frac"] == pytest.approx(1.0)
    dom = spark.createDataFrame(
        [(1e6,)] + [(1e-6,)] * 99, "w double"
    )
    r2 = importance_weight_ess(dom, "w").first()
    assert r2["ess"] == pytest.approx(1.0, rel=1e-6)
    assert r2["max_w_share"] == pytest.approx(1.0, rel=1e-6)
    dirty = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (0.0,), (-3.0,), (1.0,)], "w double"
    )
    r3 = importance_weight_ess(dirty, "w").first()
    assert (r3["n"], r3["sum_w"], r3["ess"]) == (2, 2.0, 2.0)


def test_mann_kendall_semantics(spark):
    """Monotone series -> S = n(n-1)/2 and large positive z; constant
    series -> S = 0, var 0, z 0; tie correction matches the textbook
    formula; loud bounded contract shared with Theil-Sen."""
    from dataquality_ml_spark.operators.drift import mann_kendall_trend

    up = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(10)], "x double, y double"
    )
    r = mann_kendall_trend(up, "x", "y").first()
    assert r["s_stat"] == 45 and r["z"] > 2.0
    assert r["var_s"] == pytest.approx(10 * 9 * 25 / 18)
    const = spark.createDataFrame(
        [(float(i), 7.0) for i in range(6)], "x double, y double"
    )
    rc = mann_kendall_trend(const, "x", "y").first()
    # one tie group of 6: var = (6*5*17 - 6*5*17)/18 = 0
    assert (rc["s_stat"], rc["var_s"], rc["z"]) == (0, 0.0, 0.0)
    with pytest.raises(ValueError, match="exceed max_points"):
        mann_kendall_trend(up, "x", "y", max_points=5)


def test_seasonal_residual_outliers(spark):
    """A value spike in an otherwise flat hour-of-week pattern is the
    only flagged row; the baseline absorbs a recurring seasonal high
    that a raw z-score would flag."""
    import datetime

    from dataquality_ml_spark.operators.sequences import (
        seasonal_residual_outliers,
    )

    rows = []
    eid = 0
    for week in range(8):
        for d in range(7):
            for h in (9, 15):
                ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                    days=week * 7 + d, hours=h
                )
                # hour 9 always runs hot (seasonal), hour 15 is flat
                v = 100.0 if h == 9 else 10.0
                rows.append((eid, ts, v))
                eid += 1
    # one genuine anomaly in the flat slot
    rows.append((eid, datetime.datetime(2024, 2, 26, 15), 500.0))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, v double")
    out = seasonal_residual_outliers(df, "ts", "v", k=3.0, id_col="event_id").collect()
    assert [r["event_id"] for r in out] == [eid]
    # the spike's own cell mean absorbs some of it: (500 + 8*10)/9
    assert out[0]["z"] > 3.0
    assert out[0]["expected"] == pytest.approx((500 + 8 * 10) / 9)


def test_lix_readability(spark):
    """Hand-computed LIX on a known sentence pair; empty text -> NULL
    lix with zero words; fragments floor sentences at 1."""
    from dataquality_ml_spark.operators.text import lix_readability

    df = spark.createDataFrame(
        [
            (0, "The cat sat. The dog barked!"),  # 6 words, 2 sentences,
            # 1 long ("barked!" = 7 chars — punctuation rides the token)
            (1, "Incomprehensible bureaucratic terminology"),  # 3 words, 1 sent, 3 long
            (2, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lix_readability(df).collect()}
    assert (got[0]["n_words"], got[0]["n_sentences"], got[0]["n_long"]) == (6, 2, 1)
    assert got[0]["lix"] == pytest.approx(3.0 + 100.0 / 6.0)
    assert got[1]["lix"] == pytest.approx(3.0 + 100.0)
    assert got[2]["n_words"] == 0 and got[2]["lix"] is None


def test_ratio_metric_ci(spark):
    """Constant per-unit ratio -> se 0 and ci collapsed on the ratio;
    hand-computed delta-method se on a small group; degenerate groups
    return NULL se."""
    from dataquality_ml_spark.operators.evaluate import ratio_metric_ci

    const = spark.createDataFrame(
        [("a", 2.0 * i, 1.0 * i) for i in range(1, 6)], "g string, x double, y double"
    )
    r = ratio_metric_ci(const, "g", "x", "y").first()
    assert r["ratio"] == pytest.approx(2.0)
    # x = 2y exactly -> delta-method variance is 0
    assert r["se"] == pytest.approx(0.0, abs=1e-12)
    assert r["ci_lo"] == pytest.approx(2.0) and r["ci_hi"] == pytest.approx(2.0)

    rows = [("b", 1.0, 1.0), ("b", 3.0, 2.0), ("b", 2.0, 1.0)]
    hand = ratio_metric_ci(spark.createDataFrame(rows, "g string, x double, y double"), "g", "x", "y").first()
    import statistics

    xs, ys = [r[1] for r in rows], [r[2] for r in rows]
    n, R = len(rows), sum(xs) / sum(ys)
    yb = sum(ys) / n
    vx = statistics.pvariance(xs)
    vy = statistics.pvariance(ys)
    cxy = sum(x * y for x, y in rows_xy) / n - (sum(xs) / n) * yb if (rows_xy := list(zip(xs, ys))) else 0
    want_se = ((vx + R * R * vy - 2 * R * cxy) / (n * yb * yb)) ** 0.5
    assert hand["se"] == pytest.approx(want_se, rel=1e-12)

    one = spark.createDataFrame([("c", 1.0, 1.0)], "g string, x double, y double")
    r1 = ratio_metric_ci(one, "g", "x", "y").first()
    assert r1["se"] is None and r1["ratio"] == pytest.approx(1.0)


def test_fd_violations_semantics(spark):
    """g3 = minimum rows to delete for X -> Y to hold: hand case with one
    clean group, one 2-way split, one NULL-keyed group; NULL Y is a
    value."""
    from dataquality_ml_spark.operators.rules import fd_violations

    rows = [
        (1, "a"), (1, "a"), (1, "a"),      # clean group
        (2, "a"), (2, "b"), (2, "b"),      # violating: delete 1
        (None, "x"), (None, None),         # NULL X group, NULL Y value: delete 1
    ]
    df = spark.createDataFrame(rows, "k int, y string")
    r = fd_violations(df, ["k"], "y").first()
    assert (r["n_rows"], r["n_groups"], r["n_violating_groups"]) == (8, 3, 2)
    assert r["g3_rows"] == 2
    assert r["g3_error"] == pytest.approx(2 / 8)
    # an exact FD scores 0
    clean = spark.createDataFrame([(i, i % 3) for i in range(30)], "k int, y int")
    assert fd_violations(clean, ["k"], "y").first()["g3_error"] == 0.0


def test_gpd_tail_fit_semantics(spark):
    """Exponential exceedances -> xi ~ 0 and beta ~ scale (MoM recovers
    the GPD limit); explicit threshold respected; empty column raises."""
    import random

    from dataquality_ml_spark.operators.profile import gpd_tail_fit

    rng = random.Random(13)
    # exponential(scale=2) shifted above 10: exact GPD with xi=0, beta=2
    rows = [(10.0 + rng.expovariate(1 / 2.0),) for _ in range(20000)]
    df = spark.createDataFrame(rows, "v double")
    r = gpd_tail_fit(df, "v", threshold=10.0).first()
    assert r["threshold"] == 10.0 and r["n_exceed"] == 20000
    assert abs(r["xi"]) < 0.05          # xi -> 0 for exponential
    assert r["beta"] == pytest.approx(2.0, rel=0.05)
    assert r["mean_excess"] == pytest.approx(2.0, rel=0.05)
    with pytest.raises(ValueError, match="no valid values"):
        gpd_tail_fit(spark.createDataFrame([], "v double"), "v")


def test_jaro_winkler_matches_duckdb(spark, duck):
    """The pandas-UDF Jaro-Winkler is bit-identical to DuckDB's native
    jaro_winkler_similarity on classic and adversarial pairs — the
    property the linkage face's oracle hash depends on."""
    from dataquality_ml_spark.functions.scalar import (
        _jaro_winkler_py,
        jaro_winkler_udf,
    )

    pairs = [
        ("martha", "marhta"), ("dixon", "dicksonx"), ("dwayne", "duane"),
        ("jellyfish", "smellyfish"), ("abc", "abc"), ("", "abc"),
        ("ab", "ba"), ("crate", "trace"), ("aaron smith", "aaron smyth"),
        ("prefix same then diverges x", "prefix same then diverges y"),
    ]
    for a, b in pairs:
        want = duck.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert _jaro_winkler_py(a, b) == want, (a, b)
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in df.select("a", "b", jaro_winkler_udf()(F.col("a"), F.col("b")).alias("jw")).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _jaro_winkler_py(a, b)
    # null propagation
    np = spark.createDataFrame([("x", None)], "a string, b string")
    assert np.select(jaro_winkler_udf()(F.col("a"), F.col("b")).alias("jw")).first()["jw"] is None


def test_linkage_score_pairs(spark):
    """Blocking candidates scored and thresholded: the typo pair
    survives 0.9, the unrelated neighbor does not."""
    from dataquality_ml_spark.operators.dedup import (
        linkage_score_pairs,
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "aaron smith"), (2, "aaron smyth"), (3, "zzz corp")],
        "doc_id long, k string",
    )
    pairs = sorted_neighborhood_pairs(df, "k", window=2).select("id_a", "id_b")
    out = linkage_score_pairs(df, pairs, "k", threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
    assert out[0]["jw"] > 0.95


def test_poisson_bootstrap_ci(spark):
    """Deterministic Poissonization: the replicate CI brackets the true
    mean with roughly the delta-method width, two runs are bit-identical
    (no RNG state), and bad alpha raises."""
    from dataquality_ml_spark.operators.evaluate import poisson_bootstrap_ci

    df = spark.range(4000).select(
        F.col("id"), ((F.col("id") % 100) / 10.0).alias("v")
    )
    r1 = poisson_bootstrap_ci(df, "v", "id", n_boot=64, alpha=0.05).first()
    r2 = poisson_bootstrap_ci(df, "v", "id", n_boot=64, alpha=0.05).first()
    assert r1 == r2  # deterministic replay
    assert r1["n"] == 4000 and r1["mean"] == pytest.approx(4.95)
    assert r1["boot_lo"] < r1["mean"] < r1["boot_hi"]
    # population sd ~ 2.887 over 4000 rows -> se ~ 0.0456; the empirical
    # 95% width should be the same order (loose 3x bracket)
    width = r1["boot_hi"] - r1["boot_lo"]
    se = 2.887 / 4000**0.5
    assert 2 * 1.96 * se / 3 < width < 2 * 1.96 * se * 3
    with pytest.raises(ValueError, match="0 < alpha < 1"):
        poisson_bootstrap_ci(df, "v", "id", alpha=1.5)


def test_isotonic_calibration_pav(spark):
    """Textbook PAV: a monotone-violating middle bin pools with its
    neighbor (weighted), output is nondecreasing, already-monotone
    input is returned unchanged."""
    from dataquality_ml_spark.operators.evaluate import isotonic_calibration

    # bins 0..3 rates: 0.2, 0.6, 0.4, 0.8 -> bins 1,2 pool to (6+4)/(10+10)=0.5
    rows = []
    for b, (n, npos) in enumerate([(10, 2), (10, 6), (10, 4), (10, 8)]):
        s = b / 4.0 + 0.05
        rows += [(s, 1)] * npos + [(s, 0)] * (n - npos)
    df = spark.createDataFrame(rows, "s double, y int")
    got = {r["bin"]: r for r in isotonic_calibration(df, "s", "y", bins=4, lo=0.0, hi=1.0).collect()}
    assert [got[b]["frac_pos"] for b in range(4)] == [0.2, 0.6, 0.4, 0.8]
    assert [got[b]["calibrated"] for b in range(4)] == [0.2, 0.5, 0.5, 0.8]
    cal = [got[b]["calibrated"] for b in range(4)]
    assert cal == sorted(cal)  # nondecreasing
    # empty input -> empty frame with the documented schema
    empty = isotonic_calibration(
        spark.createDataFrame([], "s double, y int"), "s", "y"
    )
    assert empty.count() == 0 and empty.columns == [
        "bin", "n", "mean_score", "frac_pos", "calibrated"
    ]


def test_pagerank_star_graph(spark):
    """PageRank on a 1-center/4-leaf star == the hand-unrolled recursion;
    ranks sum to ~1; the center dominates; empty edges -> empty;
    iterations < 1 raises."""
    from dataquality_ml_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    # hand recursion: deg(center)=4, deg(leaf)=1, n=5
    d, n = 0.85, 5
    rc = rl = 1 / n
    for _ in range(5):
        rc, rl = (1 - d) / n + d * 4 * rl / 1, (1 - d) / n + d * rc / 4
    assert got[0] == pytest.approx(rc, rel=1e-12)
    for leaf in range(1, 5):
        assert got[leaf] == pytest.approx(rl, rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    assert got[0] > got[1]
    assert pagerank(
        spark.createDataFrame([], "id_a long, id_b long")
    ).count() == 0
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)


def test_embedding_covariance_and_effective_rank(spark):
    """Hand 2-d covariance; planted rank-2 subspace in d=8 gives
    erank ~ 2; an isotropic cube gives erank ~ d; empty input raises."""
    from dataquality_ml_spark.operators.similarity import (
        embedding_covariance,
        embedding_effective_rank,
    )

    # hand case: components [(1,2),(3,6),(5,4)] -> means (3,4)
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 6.0]), (2, [5.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(df).collect()}
    import statistics

    xs, ys = [1.0, 3.0, 5.0], [2.0, 6.0, 4.0]
    assert got[(1, 1)] == pytest.approx(statistics.pvariance(xs))
    assert got[(2, 2)] == pytest.approx(statistics.pvariance(ys))
    cxy = sum(x * y for x, y in zip(xs, ys)) / 3 - 3.0 * 4.0
    assert got[(1, 2)] == pytest.approx(cxy)
    assert set(got) == {(1, 1), (1, 2), (2, 2)}  # upper triangle only

    # rank-2 subspace inside d=8: two orthogonal directions, equal power
    import random

    rng = random.Random(3)
    rows = []
    for i in range(800):
        a, b = rng.gauss(0, 1), rng.gauss(0, 1)
        vec = [a if k == 0 else (b if k == 1 else 0.0) for k in range(8)]
        rows.append((i, vec))
    low = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_effective_rank(low).first()
    assert r["d"] == 8 and 1.8 < r["effective_rank"] < 2.2
    assert r["top_eig_share"] > 0.4

    iso = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(1500)],
        "vec_id long, embedding array<double>",
    )
    ri = embedding_effective_rank(iso).first()
    assert 5.5 < ri["effective_rank"] <= 6.0

    with pytest.raises(ValueError, match="empty embedding"):
        embedding_effective_rank(
            spark.createDataFrame([], "vec_id long, embedding array<double>")
        )


def test_kfold_assign_leakage_safe(spark):
    """Grouped folds: every group's rows share ONE fold; folds are
    deterministic across calls and balanced-ish; k < 2 raises."""
    from dataquality_ml_spark.operators.selection import kfold_assign

    df = spark.range(3000).select(
        F.col("id"), (F.col("id") % 300).alias("g")
    )
    a = kfold_assign(df, k=5, group_col="g", id_col="id")
    per_group = a.groupBy("g").agg(F.countDistinct("fold").alias("nf")).collect()
    assert all(r["nf"] == 1 for r in per_group)  # no group straddles folds
    b = {r["id"]: r["fold"] for r in kfold_assign(df, 5, "g", "id").collect()}
    for r in a.collect():
        assert b[r["id"]] == r["fold"]  # deterministic replay
    sizes = [r["n"] for r in a.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 5 and min(sizes) > 0.5 * max(sizes)  # rough balance
    with pytest.raises(ValueError, match="k must be >= 2"):
        kfold_assign(df, k=1)


def test_cusum_changepoint_keyed(spark):
    """keys= runs one independent CUSUM per segment — each segment flags
    its own planted shift day, and the keyed plan has NO unpartitioned
    window (grand mean / cumulative / peak all key-partitioned)."""
    import datetime

    from dataquality_ml_spark import plans as plan_mod
    from dataquality_ml_spark.operators.drift import cusum_changepoint
    from tests.test_scale_plans import _global_window_specs

    rows = []
    for seg, shift_day in (("a", 10), ("b", 25)):
        for d in range(40):
            for h in (1, 13):
                rows.append(
                    (
                        seg,
                        datetime.datetime(2024, 1, 1)
                        + datetime.timedelta(days=d, hours=h),
                        5.0 + (3.0 if d >= shift_day else 0.0),
                    )
                )
    df = spark.createDataFrame(rows, "seg string, ts timestamp, v double")
    out = cusum_changepoint(df, "ts", "v", keys=["seg"])
    peaks = {
        r["seg"]: str(r["bucket_ts"])[:10]
        for r in out.where("is_changepoint = 1").collect()
    }
    assert peaks == {"a": "2024-01-10", "b": "2024-01-25"}
    assert _global_window_specs(plan_mod.formatted_plan(out)) == []
