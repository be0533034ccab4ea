"""Round-11 operator semantics: burstiness, pair co-occurrence, Benford,
WoE/IV, vocabulary growth, Zipf fit, hour-of-week profile.

The oracle suite pins these against DuckDB on the test tables; here we pin
the STATISTICAL semantics on hand-built inputs (periodic vs bursty timing,
known lift, planted power law) plus the scale-plan gate for the Zipf top-k.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_interarrival_burstiness_semantics(spark):
    """Perfectly periodic gaps give B = -1 and CV = 0; a heavy-tailed gap
    pattern gives B > 0; users below min_events are dropped; exact-int
    formula equals a hand computation."""
    from dataquality_ml_spark.operators.sequences import interarrival_burstiness

    base = 1_700_000_000_000_000  # µs epoch
    rows = []
    # user 1: periodic, 60 s exactly × 10 events
    rows += [(1, base + i * 60_000_000) for i in range(10)]
    # user 2: bursty — 9 gaps of 1 s, then one 10-hour silence
    rows += [(2, base + i * 1_000_000) for i in range(10)]
    rows += [(2, base + 36_000_000_000)]
    # user 3: too few events
    rows += [(3, base), (3, base + 5_000_000)]
    df = spark.createDataFrame(rows, "user_id int, us long").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    got = {
        r["user_id"]: r
        for r in interarrival_burstiness(df, "ts", "user_id", min_events=5).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["burstiness"] == -1.0 and got[1]["cv"] == 0.0
    assert got[1]["mean_gap_s"] == 60.0 and got[1]["n_events"] == 10
    # one huge gap dominates σ; with n=10 gaps B is capped at
    # (sqrt(9)-1)/(sqrt(9)+1) = 0.5, approached from below
    assert got[2]["burstiness"] > 0.45
    # hand check user 2: gaps = 9×1e6 µs + (36e9 − 9e6) µs
    gaps = [1_000_000] * 9 + [36_000_000_000 - 9_000_000]
    n = len(gaps)
    mu = sum(gaps) / n
    var = (sum(g * g for g in gaps) - sum(gaps) ** 2 / n) / n
    b = (math.sqrt(var) - mu) / (math.sqrt(var) + mu)
    assert got[2]["burstiness"] == pytest.approx(b, rel=1e-12)


def test_pair_cooccurrence_lift(spark):
    """Hand-built baskets: a pair present in every basket has lift 1/...,
    independence gives lift ~1, perfect co-occurrence of rare items gives
    lift N/n; item order is canonical (a < b) and self-pairs absent."""
    from dataquality_ml_spark.operators.sequences import pair_cooccurrence

    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
        (4, "b"),  # duplicate item in basket must not double-count
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in pair_cooccurrence(df, "item", ["basket"]).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c")}
    ab = got[("a", "b")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    assert ab["lift"] == pytest.approx(4 * 2 / (3 * 3), rel=1e-12)
    ac = got[("a", "c")]
    assert (ac["n_both"], ac["n_a"], ac["n_b"]) == (1, 3, 1)
    assert ac["lift"] == pytest.approx(4 * 1 / (3 * 1), rel=1e-12)


def test_benford_check_semantics(spark):
    """A Benford-distributed sample scores a small chi2; a uniform-digit
    sample alarms; digits come from the integer part (sub-1 and null
    values excluded)."""
    from dataquality_ml_spark.operators.profile import benford_check

    # build counts proportional to Benford probabilities exactly
    rows = []
    for d in range(1, 10):
        n_d = round(10000 * math.log10(1 + 1 / d))
        rows += [(float(d) * 10 + 3.7,)] * n_d  # first digit d
    rows += [(0.5,), (None,)]  # excluded
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_check(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1]["chi2_total"] < 1.0  # near-perfect fit
    assert sum(r["n"] for r in out.values()) == sum(
        round(10000 * math.log10(1 + 1 / d)) for d in range(1, 10)
    )
    # uniform digits: chi2 blows past any plausible threshold
    uni = spark.createDataFrame(
        [(float(d) * 100 + 1,) for d in range(1, 10) for _ in range(100)],
        "v double",
    )
    assert benford_check(uni, "v").first()["chi2_total"] > 100.0
    # round-12 ADVICE: absent digits contribute their full expected mass
    # n*p_d to chi2 (textbook chi-square over the complete 1..9 grid) —
    # the strongest fabrication signal must not be silently dropped
    only1 = spark.createDataFrame([(1.0,)] * 100, "v double")
    rows1 = {r["digit"]: r for r in benford_check(only1, "v").collect()}
    assert set(rows1) == set(range(1, 10))  # full grid, n=0 fill
    assert all(rows1[d]["n"] == 0 and rows1[d]["p"] == 0.0 for d in range(2, 10))
    p = [math.log10(1 + 1 / d) for d in range(1, 10)]
    want = (100 - 100 * p[0]) ** 2 / (100 * p[0]) + sum(
        100 * p[d - 1] for d in range(2, 10)
    )
    assert rows1[1]["chi2_total"] == pytest.approx(want, rel=1e-12)


def test_woe_iv_semantics(spark):
    """A feature independent of the label gives IV ~ 0; a perfectly
    separating feature gives a large IV with opposite-signed WoE in the
    two occupied bins; counts are exact."""
    from dataquality_ml_spark.operators.evaluate import woe_iv

    # independent: the label depends on id//10, the bin on id%10
    ind = spark.range(1000).select(
        (F.col("id") % 10).cast("double").alias("x"),
        ((F.col("id") / 10).cast("long") % 2 == 0).alias("y"),
    )
    rep = woe_iv(ind, "x", "y", lo=0.0, hi=10.0, bins=10).collect()
    assert len(rep) == 10
    assert all(abs(r["iv_total"]) < 1e-9 for r in rep)
    # separating: positives in [0,5), negatives in [5,10)
    sep = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, 2.0).otherwise(7.0).alias("x"),
        (F.col("id") % 2 == 0).alias("y"),
    )
    rep2 = {r["bin"]: r for r in woe_iv(sep, "x", "y", lo=0.0, hi=10.0, bins=2).collect()}
    assert rep2[0]["n_pos"] == 500 and rep2[0]["n_neg"] == 0
    assert rep2[0]["woe"] > 10 and rep2[1]["woe"] < -10  # EPS-clamped, finite
    assert rep2[0]["iv_total"] > 20


def test_vocab_growth_semantics(spark):
    """Hand corpus: per-doc new-token counts, cumulative vocabulary and
    token totals; a doc of only repeats contributes zero new tokens."""
    from dataquality_ml_spark.operators.text import vocab_growth

    df = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b d"),
            (3, "a a a"),
            (4, "e"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in vocab_growth(df).collect()}
    assert [got[d]["new_tokens"] for d in (1, 2, 3, 4)] == [3, 1, 0, 1]
    assert [got[d]["vocab_size"] for d in (1, 2, 3, 4)] == [3, 4, 4, 5]
    assert [got[d]["cum_tokens"] for d in (1, 2, 3, 4)] == [3, 6, 9, 10]


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus whose token counts follow c(r) = round(4000·r^(-0.8))
    fits slope ~ -0.8; the plan keeps the vocabulary out of a global sort
    (TakeOrderedAndProject from orderBy+limit)."""
    from dataquality_ml_spark.operators.text import zipf_fit

    rows = []
    for r in range(1, 101):
        c = max(1, round(4000 * r ** -0.8))
        rows += [(i, f"tok{r:03d}") for i in (0,)] * 0 or []
        rows += [(0, f"tok{r:03d}")] * c
    # one doc per token occurrence keeps the text trivial
    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )
    fit = zipf_fit(df, top_k=100).first()
    assert fit["n_tokens_fit"] == 100
    assert fit["slope"] == pytest.approx(-0.8, abs=0.05)
    plan = zipf_fit(df, top_k=100)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_dow_hour_profile_semantics(spark):
    """Two cells with known volumes/values: shares sum to 1, mean_ratio
    is the cell mean over the global mean."""
    from dataquality_ml_spark.operators.sequences import dow_hour_profile

    rows = (
        [("2024-01-01 09:10:00", 10.0)] * 3  # Monday 9h
        + [("2024-01-07 22:00:00", 30.0)] * 1  # Sunday 22h
    )
    df = spark.createDataFrame(rows, "s string, value double").select(
        F.to_timestamp("s").alias("ts"), "value"
    )
    got = {(r["dow"], r["hour"]): r for r in dow_hour_profile(df, "ts", "value").collect()}
    assert set(got) == {(2, 9), (1, 22)}  # Spark dow: 1=Sunday
    mon = got[(2, 9)]
    assert mon["n"] == 3 and mon["n_share"] == 0.75
    assert mon["mean_value"] == 10.0
    assert mon["mean_ratio"] == pytest.approx(10.0 / 15.0, rel=1e-12)
    assert got[(1, 22)]["mean_ratio"] == pytest.approx(2.0, rel=1e-12)


def test_silhouette_centroid_separated_vs_mixed(spark):
    """Tightly separated clusters score near 1; points halfway between
    centroids score near 0; assignment ties follow kmeans_assign."""
    from dataquality_ml_spark.operators.similarity import silhouette_centroid

    cents = [[0.0, 0.0], [10.0, 0.0]]
    rows = [(i, [0.0 + (i % 3) * 0.01, 0.0]) for i in range(6)]
    rows += [(i + 10, [10.0 - (i % 3) * 0.01, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["cluster"]: r for r in silhouette_centroid(df, cents).collect()}
    assert set(got) == {0, 1} and got[0]["n"] == 6 and got[1]["n"] == 6
    assert got[0]["mean_silhouette"] > 0.99 and got[1]["mean_silhouette"] > 0.99
    # midpoint: a == b -> s == 0
    mid = spark.createDataFrame(
        [(1, [5.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert silhouette_centroid(mid, cents).first()["mean_silhouette"] == 0.0


def test_truncated_recall_full_prefix_is_perfect(spark):
    """dims == full dimensionality must give recall 1.0 for every query;
    a 1-dim prefix on vectors whose order-defining signal lives in later
    dims must lose recall."""
    import numpy as np

    from dataquality_ml_spark.operators.similarity import truncated_recall

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).round(3)
    vecs[:, 0] = 1.0  # first dim carries no signal
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = df.where("vec_id < 4")
    full = truncated_recall(df, q, dims=8, k=3).collect()
    assert all(r["recall"] == 1.0 for r in full) and len(full) == 4
    cut = truncated_recall(df, q, dims=1, k=3).collect()
    assert min(r["recall"] for r in cut) < 1.0


def test_triangle_stats_hand_graph(spark):
    """Triangle + pendant: edges {1-2, 2-3, 1-3, 3-4} -> degrees
    (2,2,3,1), wedges 1+1+3 = 5, one triangle, coefficient 3/5;
    duplicate and reversed edges are canonicalized away."""
    from dataquality_ml_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (1, 2), (3, 1)],
        "id_a long, id_b long",
    )
    r = triangle_stats(edges).first()
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 5, 1)
    assert r["clustering_coefficient"] == pytest.approx(0.6, rel=1e-12)
    # triangle-free graph: coefficient 0, no divide-by-zero on empty
    chain = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    r2 = triangle_stats(chain).first()
    assert (r2["n_triangles"], r2["clustering_coefficient"]) == (0, 0.0)


def test_neyman_allocation_semantics(spark):
    """A zero-variance stratum gets zero allocation; allocation is
    proportional to N_h*sigma_h and sums to the budget."""
    from dataquality_ml_spark.operators.selection import neyman_allocation

    rows = [("a", 5.0)] * 100  # constant: sigma 0
    rows += [("b", float(v)) for v in range(100)]  # wide
    rows += [("c", float(v % 10)) for v in range(200)]  # narrower, bigger N
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in neyman_allocation(df, "v", "g", 1000).collect()}
    assert got["a"]["alloc"] == 0.0 and got["a"]["sigma"] == 0.0
    assert abs(sum(r["alloc"] for r in got.values()) - 1000.0) < 1e-6
    # b: N*sigma = 100*28.86..; c: 200*2.87.. -> b gets the larger share
    assert got["b"]["alloc"] > got["c"]["alloc"] > 0


def test_robust_scale_hand_quantiles(spark):
    """(v - median)/IQR with exact quantiles; constant column passes
    through centered only (IQR 0 convention)."""
    from dataquality_ml_spark.ml.features import robust_scale

    df = spark.createDataFrame(
        [(float(v), 3.0) for v in range(1, 12)], "x double, c double"
    )
    # x in 1..11: median 6, q1 3.5, q3 8.5, iqr 5
    out = robust_scale(df, ["x", "c"]).collect()
    xs = sorted(r["x"] for r in out)
    assert xs[0] == pytest.approx((1 - 6) / 5.0, rel=1e-12)
    assert xs[-1] == pytest.approx((11 - 6) / 5.0, rel=1e-12)
    assert all(r["c"] == 0.0 for r in out)  # centered, not divided


def test_quantile_map_identity_and_shift(spark):
    """Mapping a distribution onto ITSELF is (near-)identity at the
    knots; mapping a shifted distribution onto the reference removes the
    shift (the drift-repair semantics). Rank order is preserved."""
    from dataquality_ml_spark.ml.features import quantile_map

    ref = spark.range(1001).select((F.col("id") / 10.0).alias("v"))  # 0..100
    cur_same = spark.range(1001).select((F.col("id") / 10.0).alias("v"))
    same = {r["value"]: r["mapped"] for r in quantile_map(cur_same, "v", ref).collect()}
    # uniform onto itself: the piecewise-linear map is the identity
    for v in (0.0, 25.0, 50.0, 75.0, 100.0):
        assert same[v] == pytest.approx(v, abs=0.2)
    shifted = spark.range(1001).select((F.col("id") / 10.0 + 500.0).alias("v"))
    rep = quantile_map(shifted, "v", ref).collect()
    mapped = [r["mapped"] for r in sorted(rep, key=lambda r: r["value"])]
    assert mapped[0] == pytest.approx(0.0, abs=0.2)
    assert mapped[-1] == pytest.approx(100.0, abs=0.2)
    assert mapped == sorted(mapped)  # monotone
    # empty reference fails loudly
    empty = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError, match="reference"):
        quantile_map(cur_same, "v", empty)


def test_ngram_diversity_semantics(spark):
    """A looping template corpus collapses bigram TTR; a diverse corpus
    keeps it near 1; counts are exact."""
    from dataquality_ml_spark.operators.text import ngram_diversity

    rows = [(i, "spam ham " * 20, "loop") for i in range(5)]
    rows += [(100 + i, " ".join(f"w{i}_{j}" for j in range(40)), "rich") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in ngram_diversity(df, group_col="source").collect()}
    # loop: 40 tokens/doc, 2 distinct unigrams, 2 distinct bigrams
    assert got["loop"]["n_unigrams"] == 200 and got["loop"]["d_unigrams"] == 2
    assert got["loop"]["d_bigrams"] == 2
    assert got["loop"]["ttr_bigram"] < 0.02
    assert got["rich"]["ttr_bigram"] == 1.0 and got["rich"]["ttr_unigram"] == 1.0


def test_survival_km_textbook_example(spark):
    """Classic KM hand case: durations 1,2+,3,4+,5 (events at 1,3,5,
    censored at 2,4): S = 4/5 after t=1, 4/5*(2/3) after t=3,
    4/5*2/3*0 after t=5; censored rows shrink the risk set without
    dropping S. Binned face groups times onto the grid; an all-death
    time point sends S to exactly 0 (absorbing, no ln(0) blowup)."""
    from dataquality_ml_spark.operators.sequences import survival_km

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 1)],
        "d double, e int",
    )
    got = {r["t"]: r for r in survival_km(df, "d", "e").collect()}
    assert got[1.0]["n_at_risk"] == 5 and got[1.0]["survival"] == pytest.approx(0.8)
    assert got[3.0]["n_at_risk"] == 3
    assert got[3.0]["survival"] == pytest.approx(0.8 * 2 / 3)
    assert got[5.0]["n_at_risk"] == 1 and got[5.0]["survival"] == 0.0
    assert got[2.0]["survival"] == pytest.approx(0.8)  # censoring: S flat
    # binned face: same estimator on the quantized grid
    b = {r["t"]: r for r in survival_km(df, "d", "e", bins=3, lo=0.0, hi=6.0).collect()}
    assert set(b) == {2.0, 4.0, 6.0}
    assert b[2.0]["n_at_risk"] == 5 and b[2.0]["survival"] == pytest.approx(0.8)
    # grid cells: t=4 has (d=1, c=1, at_risk=4) -> 3/4; t=6 (d=1, c=1,
    # at_risk=2) -> 1/2: S = 0.8 * 0.75 * 0.5
    assert b[6.0]["survival"] == pytest.approx(0.3)
    # absorbing zero without censoring: everyone dies at the last point
    dd = spark.createDataFrame([(1.0, 1), (2.0, 1)], "d double, e int")
    g2 = {r["t"]: r["survival"] for r in survival_km(dd, "d", "e").collect()}
    assert g2[2.0] == 0.0


def test_conversion_ztest_semantics(spark):
    """Hand case: equal conversion gives z ~ 0 and lift 0; a strong
    variant gives a large positive z; zero-variance pool (all convert)
    reports NULL z, not a divide-by-zero."""
    from dataquality_ml_spark.operators.evaluate import conversion_ztest

    rows = [("c", i < 50) for i in range(100)]          # 50% control
    rows += [("same", i < 50) for i in range(100)]      # 50% variant
    rows += [("better", i < 90) for i in range(100)]    # 90% variant
    df = spark.createDataFrame(rows, "g string, y boolean")
    got = {r["variant"]: r for r in conversion_ztest(df, "g", "y", "c").collect()}
    assert set(got) == {"same", "better"}
    assert got["same"]["lift"] == 0.0 and abs(got["same"]["z"]) < 1e-12
    assert got["better"]["lift"] == pytest.approx(0.4)
    assert got["better"]["z"] > 5
    # degenerate pool: everyone converts everywhere -> NULL z
    allc = spark.createDataFrame(
        [("c", True)] * 10 + [("v", True)] * 10, "g string, y boolean"
    )
    assert conversion_ztest(allc, "g", "y", "c").first()["z"] is None


def test_conformal_interval_guarantee(spark):
    """Known residuals: with alpha=0.1 and n=19 calibration points the
    interval uses the ceil(20*0.9)=18th smallest; coverage on an
    identically distributed test half respects the >=1-alpha guarantee;
    empty calibration fails loudly."""
    from dataquality_ml_spark.operators.evaluate import conformal_interval

    cal = spark.createDataFrame([(float(i),) for i in range(1, 20)], "r double")
    test = spark.createDataFrame([(float(i),) for i in range(1, 20)], "r double")
    row = conformal_interval(cal, test, "r", alpha=0.1).first()
    assert row["n_cal"] == 19 and row["qhat"] == 18.0
    assert row["coverage"] == pytest.approx(18 / 19)
    assert row["coverage"] >= 0.9
    empty = spark.createDataFrame([], "r double")
    with pytest.raises(ValueError, match="calibration"):
        conformal_interval(empty, test, "r")


def test_sorted_neighborhood_pairs_semantics(spark):
    """Hand corpus: pairs are exactly the rank-window neighbors of the
    sort order (ties broken by id), each row meets <= 2*window
    candidates, and typo-near keys that shingle methods may miss land in
    the same neighborhood. Plan: no unpartitioned window (rank via the
    distributed prefix sum)."""
    from dataquality_ml_spark import plans as plan_mod
    from dataquality_ml_spark.operators.dedup import sorted_neighborhood_pairs
    from tests.test_scale_plans import _global_window_specs

    rows = [
        (1, "aaron smith"),
        (2, "aaron smyth"),   # typo neighbor of 1
        (3, "zzz corp"),
        (4, "aarno smith"),   # transposition: sorts next to 1/2
        (5, "middle value"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = sorted_neighborhood_pairs(df, "k", window=1)
    # sort order: aarno(4) < aaron smith(1) < aaron smyth(2) < middle(5) < zzz(3)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(4, 1), (1, 2), (2, 5), (5, 3)}
    assert _global_window_specs(plan_mod.formatted_plan(out)) == []
    # the neighborhood join must be a real equi-join (exploded adjacent
    # buckets), never a CartesianProduct over all rank pairs
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
    assert "BroadcastNestedLoopJoin" not in physical
    # window=2 adds the distance-2 pairs
    got2 = {(r["id_a"], r["id_b"]) for r in sorted_neighborhood_pairs(df, "k", window=2).collect()}
    assert got == {p for p in got2 if p in got} and len(got2) == 7
