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


# ---------------------------------------------------------------------------
# prefix_filter_jaccard_pairs (round 13: AllPairs/PPJoin prefix filtering)
# ---------------------------------------------------------------------------
def test_prefix_filter_matches_full_inverted_index(spark):
    """The prefix-filtered join must return EXACTLY the pairs of the
    uncapped full-inverted-index form (the prefix lemma is complete, the
    verify step is exact — zero recall loss, unlike LSH banding)."""
    from dataquality_ml_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for k, t in ((5, 0.8), (3, 0.5)):
        a = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dd.prefix_filter_jaccard_pairs(
                docs, k=k, threshold=t
            ).collect()
        }
        b = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dd.ngram_jaccard_pairs(
                docs, k=k, threshold=t, on_hot_shingle="exact"
            ).collect()
        }
        assert a == b and a


def test_prefix_filter_planted_near_dup(spark):
    """A doc and its one-word-edited copy (high Jaccard) must surface;
    an unrelated doc must not pair with either."""
    from dataquality_ml_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    edited = base.replace("lazy", "sleepy", 1)
    other = "completely different content about spark shuffle partitions " * 4
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], ["doc_id", "text"]
    )
    got = dd.prefix_filter_jaccard_pairs(df, k=5, threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_prefix_filter_prefix_is_smaller_than_full_index(spark):
    """Scale invariant: the candidate join's input (prefix tokens) must be
    a strict subset of the full posting list — at t=0.8 each doc posts
    only ~20% of its shingles (n - ceil(0.8 n) + 1)."""
    from pyspark.sql import Window
    from dataquality_ml_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hs = dd.with_hashed_shingles(docs, "text", "doc_id", 5)
    full = hs.select(F.explode("hs")).count()
    ex = hs.select("doc_id", F.size("hs").alias("n"), F.explode("hs").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("dfc"))
    w = Window.partitionBy("doc_id").orderBy("dfc", "s")
    pos = ex.join(dfreq, "s").withColumn("pos", F.row_number().over(w))
    ceil_tn = ((F.lit(800000) * F.col("n") + F.lit(999999)) / F.lit(1000000)).cast("long")
    pref = pos.where(F.col("pos") <= F.col("n") - ceil_tn + 1).count()
    assert pref <= 0.25 * full


def test_label_propagation_splits_bridged_cliques(spark):
    """Two 4-cliques joined by ONE bridge edge: connected_components
    fuses them into a single cluster (min-label reachability), but LPA
    keeps them apart — a label must win each node's neighborhood
    majority, and one bridge vote never does. The soft-vs-hard
    clustering contrast the operator exists for."""
    from dataquality_ml_spark.operators import graph as gr

    clique = lambda ids: [
        (a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
    ]
    edges = spark.createDataFrame(
        clique([1, 2, 3, 4]) + clique([5, 6, 7, 8]) + [(4, 5)],
        ["id_a", "id_b"],
    )
    cc = gr.connected_components(edges)
    assert cc.select("component").distinct().count() == 1
    lpa = {r.node: r.community for r in gr.label_propagation(edges, 4).collect()}
    assert {lpa[n] for n in (1, 2, 3, 4)} == {1}
    assert {lpa[n] for n in (5, 6, 7, 8)} == {5}


def test_label_propagation_deterministic_and_loud(spark):
    """Fixed iterations + synchronous updates + (count desc, label asc)
    ties: two runs must agree exactly; iterations < 1 raises."""
    from dataquality_ml_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    r1 = sorted(map(tuple, gr.label_propagation(edges, 3).collect()))
    r2 = sorted(map(tuple, gr.label_propagation(edges, 3).collect()))
    assert r1 == r2
    with pytest.raises(ValueError, match="iterations"):
        gr.label_propagation(edges, 0)


# ---------------------------------------------------------------------------
# ewma_control (round 13: one-pass EWMA chart via the prefix identity)
# ---------------------------------------------------------------------------
def test_ewma_closed_form_equals_sequential_fold(spark):
    """The prefix-identity EWMA must match the textbook recursion
    z_t = lam*m_t + (1-lam)*z_{t-1}, z_0 = mean(m), folded sequentially
    driver-side, to float precision — same differential contract as the
    batch CUSUM face."""
    from dataquality_ml_spark.operators.drift import ewma_control

    vals = [(i, 10.0 + (i % 7) - (3.0 if i > 40 else 0.0)) for i in range(60)]
    df = spark.createDataFrame(vals, ["b", "value"])
    got = {
        r.batch_id: r.ewma
        for r in ewma_control(df, "b", "value", lam=0.25).collect()
    }
    ms = [v for _, v in vals]
    z = sum(ms) / len(ms)
    for t, m in enumerate(ms):
        z = 0.25 * m + 0.75 * z
        assert math.isclose(got[t], z, rel_tol=1e-9), (t, got[t], z)


def test_ewma_flags_planted_level_shift(spark):
    """With a FROZEN in-control reference (the documented usage when the
    monitored range may contain the shift), a persistent level shift
    from batch 50 on must trip the chart shortly after onset and never
    before; self-estimated params on the same data alarm LATER, because
    the shift contaminates the estimated center and scale."""
    from dataquality_ml_spark.operators.drift import ewma_control

    rows = [
        (i, 100.0 + (0.5 if i % 2 else -0.5) + (8.0 if i >= 50 else 0.0))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["b", "value"])
    frozen = sorted(
        (r.batch_id, r.ooc)
        for r in ewma_control(
            df, "b", "value", lam=0.2, nsigma=3.0, mu0=100.0, sigma0=0.5
        ).collect()
    )
    first_alarm = min((b for b, o in frozen if o == 1), default=None)
    assert first_alarm is not None and 50 <= first_alarm <= 52
    assert all(o == 0 for b, o in frozen if b < 50)
    selfest = sorted(
        (r.batch_id, r.ooc)
        for r in ewma_control(df, "b", "value", lam=0.2, nsigma=3.0).collect()
    )
    self_alarm = min((b for b, o in selfest if o == 1), default=None)
    assert self_alarm is not None and self_alarm > first_alarm


def test_ewma_keyed_has_no_global_window_and_loud_lam(spark):
    """keys= must partition EVERY window (plan contains no empty
    windowspecdefinition partition), and lam outside (0,1] raises."""
    from dataquality_ml_spark.operators.drift import ewma_control

    df = spark.createDataFrame(
        [("a", i, float(i % 5)) for i in range(20)], ["k", "b", "value"]
    )
    plan = (
        ewma_control(df, "b", "value", keys=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(k" in plan.replace("#", "").lower() or (
        "Window" in plan and "partitionBy" not in plan
    )
    with pytest.raises(ValueError, match="lam"):
        ewma_control(df, "b", "value", lam=0.0)


# ---------------------------------------------------------------------------
# acf_ljung_box (round 13)
# ---------------------------------------------------------------------------
def test_acf_matches_numpy_reference(spark):
    """rho_k and Q_k must match the textbook formulas computed in numpy
    on the same series (deterministic LCG noise, no RNG)."""
    import numpy as np
    from dataquality_ml_spark.operators.drift import acf_ljung_box

    x, vals = 7, []
    for i in range(120):
        x = (1103515245 * x + 12345) % (2**31)
        vals.append((i, 50.0 + 10.0 * ((i % 6) == 0) + (x % 1000) / 100.0))
    df = spark.createDataFrame(vals, ["b", "value"])
    got = {
        r.lag: (r.rho, r.q_lb, r.n_batches)
        for r in acf_ljung_box(df, "b", "value", max_lag=6).collect()
    }
    m = np.array([v for _, v in vals])
    d = m - m.mean()
    den = float((d * d).sum())
    T = len(m)
    q = 0.0
    for k in range(1, 7):
        rho = float((d[:-k] * d[k:]).sum()) / den
        q += rho * rho / (T - k)
        assert math.isclose(got[k][0], rho, rel_tol=1e-9), k
        assert math.isclose(got[k][1], T * (T + 2) * q, rel_tol=1e-9), k
        assert got[k][2] == T
    # the planted period-6 bump must dominate the ACF at lag 6
    assert got[6][0] == max(got[k][0] for k in got)


def test_acf_keyed_independent_series(spark):
    """Two keys with different dynamics must get independent ACFs: a
    constant-plus-alternating series has rho_1 < 0, a trending series
    rho_1 > 0."""
    from dataquality_ml_spark.operators.drift import acf_ljung_box

    rows = [("alt", i, 10.0 + (1.0 if i % 2 else -1.0)) for i in range(40)]
    rows += [("trend", i, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, ["k", "b", "value"])
    got = {
        (r.k, r.lag): r.rho
        for r in acf_ljung_box(df, "b", "value", max_lag=2, keys=["k"]).collect()
    }
    assert got[("alt", 1)] < -0.9
    assert got[("trend", 1)] > 0.9
    with pytest.raises(ValueError, match="max_lag"):
        acf_ljung_box(df, "b", "value", max_lag=0)


def test_anova_matches_scipy_formula_and_contracts(spark):
    """F and eta^2 must match the textbook computation on a planted
    3-group frame (hand-checkable sums); degenerate inputs raise."""
    from dataquality_ml_spark.operators.evaluate import anova_oneway

    rows = (
        [("a", v) for v in (1.0, 2.0, 3.0)]
        + [("b", v) for v in (2.0, 3.0, 4.0)]
        + [("c", v) for v in (6.0, 7.0, 8.0)]
    )
    df = spark.createDataFrame(rows, "k string, value double")
    r = anova_oneway(df, "k", "value").first()
    # groups means 2,3,7; grand 4; SSB=3*(4+1+9)=42; SSW=2+2+2=6
    assert r["n"] == 9 and r["n_groups"] == 3
    assert r["df1"] == 2 and r["df2"] == 6
    assert r["f_stat"] == pytest.approx((42 / 2) / (6 / 6))
    assert r["eta_sq"] == pytest.approx(42 / 48)
    with pytest.raises(ValueError, match=">= 2 groups"):
        anova_oneway(df.where("k = 'a'"), "k", "value")
    one_per = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, value double"
    )
    with pytest.raises(ValueError, match="degrees of freedom"):
        anova_oneway(one_per, "k", "value")


def test_kruskal_wallis_hand_computed_with_ties(spark):
    """Textbook check: a=[1,2] b=[3,4] gives H=2.4 untied; a=[1,1]
    b=[2,2] gives the same H from midranks but C=0.8 so H_adj=3.0.
    Degenerate inputs raise loudly."""
    from dataquality_ml_spark.operators.evaluate import kruskal_wallis

    untied = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)],
        "k string, value double",
    )
    r = kruskal_wallis(untied, "k", "value").first()
    assert r["n"] == 4 and r["n_groups"] == 2 and r["df1"] == 1
    assert r["h_stat"] == pytest.approx(2.4)
    assert r["tie_correction"] == pytest.approx(1.0)
    tied = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "k string, value double",
    )
    r2 = kruskal_wallis(tied, "k", "value").first()
    assert r2["h_stat"] == pytest.approx(2.4)
    assert r2["tie_correction"] == pytest.approx(0.8)
    assert r2["h_adj"] == pytest.approx(3.0)
    with pytest.raises(ValueError, match=">= 2 groups"):
        kruskal_wallis(untied.where("k = 'a'"), "k", "value")
    allsame = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("b", 5.0)], "k string, value double"
    )
    with pytest.raises(ValueError, match="all values tied"):
        kruskal_wallis(allsame, "k", "value")


def test_fdr_bh_known_example_and_tie_invariance(spark):
    """Hand-checked BH: p=[.005,.01,.03,.04], m=4 -> q=[.02,.02,.04,.04];
    tied p must get identical q regardless of row order; q is clamped
    to 1 and monotone in p."""
    from dataquality_ml_spark.operators.evaluate import fdr_bh

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)],
        "t string, p_value double",
    )
    got = {r.t: r.q_value for r in fdr_bh(df, "p_value").collect()}
    assert got == pytest.approx(
        {"d": 0.02, "a": 0.02, "c": 0.04, "b": 0.04}
    )
    tied = spark.createDataFrame(
        [("x1", 0.02), ("x2", 0.02), ("y", 0.5), ("z", 1.0)],
        "t string, p_value double",
    )
    q = {r.t: r.q_value for r in fdr_bh(tied, "p_value").collect()}
    assert q["x1"] == q["x2"] == pytest.approx(0.04)
    assert q["z"] == 1.0
    with pytest.raises(ValueError, match="m="):
        fdr_bh(tied.where("p_value > 2"), "p_value")
    # m passed explicitly (pre-filtered panel keeps the original test count)
    sub = fdr_bh(tied.where("t != 'z'"), "p_value", m=4)
    q2 = {r.t: r.q_value for r in sub.collect()}
    assert q2["x1"] == pytest.approx(0.04)


def test_good_turing_panel_planted_counts(spark):
    """Corpus with term counts {x:1, y:1, z:2} -> N=4, N1=2, N2=1:
    r=1 row must show r*=(1+1)*N2/N1=1.0 and token_share=N1/N=0.5 (the
    Good-Turing unseen-mass estimate); r=2 has nothing above it so
    r_star is NULL; max_r<1 raises."""
    from dataquality_ml_spark.operators.text import good_turing_panel

    df = spark.createDataFrame(
        [(1, "x z"), (2, "y z")], ["doc_id", "text"]
    )
    rows = {r.r: r for r in good_turing_panel(df, max_r=10).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_r == 2
    assert rows[1].r_star == pytest.approx(1.0)
    assert rows[1].token_share == pytest.approx(0.5)
    assert rows[2].n_r == 1
    assert rows[2].r_star is None
    assert rows[2].token_share == pytest.approx(0.5)
    with pytest.raises(ValueError, match="max_r"):
        good_turing_panel(df, max_r=0)


def test_ranking_quality_hand_computed(spark):
    """Perfect agreement -> ndcg=1, mrr=1; reversed top-3 vs exact
    top-3 -> hand-computed DCG over rel (3,2,1) reversed; missing
    top-1 -> mrr=0."""
    from dataquality_ml_spark.operators.similarity import ranking_quality

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    same = ranking_quality(exact, exact, k=3).first()
    assert same["ndcg"] == pytest.approx(1.0) and same["mrr"] == 1.0
    rev = spark.createDataFrame(
        [(1, 12, 1), (1, 11, 2), (1, 10, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    r = ranking_quality(exact, rev, k=3).first()
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    dcg = 1 / math.log2(2) + 2 / math.log2(3) + 3 / math.log2(4)
    assert r["idcg"] == pytest.approx(idcg)
    assert r["dcg"] == pytest.approx(dcg)
    assert r["ndcg"] == pytest.approx(dcg / idcg)
    assert r["mrr"] == pytest.approx(1.0 / 3.0)
    disjoint = spark.createDataFrame(
        [(1, 99, 1), (1, 98, 2), (1, 97, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    d = ranking_quality(exact, disjoint, k=3).first()
    assert d["ndcg"] == 0.0 and d["mrr"] == 0.0
    with pytest.raises(ValueError, match="k must be"):
        ranking_quality(exact, exact, k=0)


def test_cluster_bootstrap_wider_on_grouped_data(spark):
    """On data where every group's rows are identical copies (maximal
    within-group correlation: 40 groups x 50 copies), the cluster
    bootstrap must produce a WIDER interval than the row-level
    bootstrap — the row bootstrap treats the 50 copies as independent
    information and understates the variance ~sqrt(50)-fold."""
    from dataquality_ml_spark.operators.evaluate import poisson_bootstrap_ci

    rows = [
        (g * 50 + j, g, float(g % 7) * 3.0)
        for g in range(40)
        for j in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, grp long, v double")
    by_row = poisson_bootstrap_ci(df, "v", "id", n_boot=48).first()
    by_grp = poisson_bootstrap_ci(
        df, "v", "id", n_boot=48, group_col="grp"
    ).first()
    assert by_grp["n"] == by_row["n"] == 2000
    assert by_grp["mean"] == by_row["mean"]
    width_row = by_row["boot_hi"] - by_row["boot_lo"]
    width_grp = by_grp["boot_hi"] - by_grp["boot_lo"]
    assert width_grp > 2.0 * width_row
    # null group rows are dropped from the grouped variant
    with_null = df.union(
        spark.createDataFrame([(99999, None, 5.0)], "id long, grp long, v double")
    )
    assert poisson_bootstrap_ci(
        with_null, "v", "id", n_boot=8, group_col="grp"
    ).first()["n"] == 2000


def test_mmd_linear_null_vs_shifted(spark):
    """Same-distribution halves give |z| small; a mean-shifted second
    sample drives mmd2 and z up decisively. Deterministic LCG vectors,
    no RNG; truncation contracts (unequal sizes, odd pair count) run
    clean."""
    from dataquality_ml_spark.operators.similarity import mmd_linear

    def vecs(n, offset, shift=0.0):
        out, s = [], 12345 + offset
        for i in range(n):
            v = []
            for _ in range(8):
                s = (1103515245 * s + 12345) % (2**31)
                v.append((s % 2000) / 1000.0 - 1.0 + shift)
            out.append((offset + i, v))
        return out

    schema = "vec_id long, embedding array<double>"
    x = spark.createDataFrame(vecs(400, 0), schema)
    y_same = spark.createDataFrame(vecs(400, 10_000), schema)
    y_shift = spark.createDataFrame(vecs(400, 20_000, shift=1.5), schema)
    null = mmd_linear(x, y_same, sigma2=1.0).first()
    alt = mmd_linear(x, y_shift, sigma2=1.0).first()
    assert null["n_quads"] == 200
    assert abs(null["z"]) < 3.0
    assert alt["z"] > 10.0 and alt["mmd2"] > 10 * abs(null["mmd2"])
    # unequal sizes + odd alignment truncate, not crash
    odd = mmd_linear(
        x.limit(31), spark.createDataFrame(vecs(45, 50_000), schema)
    ).first()
    assert odd["n_quads"] == 15
    with pytest.raises(ValueError, match="sigma2"):
        mmd_linear(x, y_same, sigma2=0.0)


def test_mmd_identical_sets_null_z(spark):
    """x == y elementwise makes every h exactly 0 — mmd2 = 0 and z is
    NULL (undefined statistic), never a divide-by-zero error."""
    from dataquality_ml_spark.operators.similarity import mmd_linear

    rows = [(i, [float(i % 7), float(i % 3)]) for i in range(40)]
    schema = "vec_id long, embedding array<double>"
    x = spark.createDataFrame(rows, schema)
    y = spark.createDataFrame([(i + 100, v) for i, v in rows], schema)
    r = mmd_linear(x, y, sigma2=1.0).first()
    assert r["mmd2"] == 0.0 and r["se"] == 0.0 and r["z"] is None


def test_bootstrap_keys_panel_equals_per_slice_runs(spark):
    """keys= must give EXACTLY the CI the corpus-wide operator computes
    on each key's slice alone — the Poisson weights depend only on
    (id, b), so the panel is slice-decomposable and this equality is
    exact, not approximate."""
    from dataquality_ml_spark.operators.evaluate import poisson_bootstrap_ci

    rows = [(i, "a" if i % 3 else "b", float(i % 13)) for i in range(900)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    panel = {
        r["k"]: r
        for r in poisson_bootstrap_ci(
            df, "v", "id", n_boot=24, keys=["k"]
        ).collect()
    }
    for key in ("a", "b"):
        solo = poisson_bootstrap_ci(
            df.where(F.col("k") == key), "v", "id", n_boot=24
        ).first()
        for c in ("n", "mean", "boot_lo", "boot_median", "boot_hi"):
            assert panel[key][c] == solo[c], (key, c)


def test_concentration_panel_hand_computed(spark):
    """Shares (0.5, 0.25, 0.25): HHI = 0.375, CR1 = 0.5, CR4 = 1,
    H = 1.5 ln2, Theil = ln3 - H; an id-like key raises the loud
    max_groups contract; one group pins the normalized edges."""
    from dataquality_ml_spark.operators.profile import concentration_panel

    df = spark.createDataFrame(
        [("a", 2.0), ("b", 1.0), ("c", 1.0)], "k string, w double"
    )
    r = concentration_panel(df, "k", "w").first()
    assert r["n_groups"] == 3 and r["total"] == 4.0
    assert r["hhi"] == pytest.approx(0.375)
    assert r["hhi_norm"] == pytest.approx((0.375 - 1 / 3) / (1 - 1 / 3))
    assert r["cr1"] == pytest.approx(0.5)
    assert r["crk"] == pytest.approx(1.0)
    h = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert r["entropy"] == pytest.approx(h)
    assert r["entropy_norm"] == pytest.approx(h / math.log(3))
    assert r["theil"] == pytest.approx(math.log(3) - h)
    wide = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="max_groups"):
        concentration_panel(wide, "k", max_groups=100)
    one = concentration_panel(df.where("k = 'a'"), "k", "w").first()
    assert one["hhi_norm"] == 1.0 and one["entropy_norm"] == 0.0


def test_dup_source_matrix_planted_cross_source(spark):
    """A near-dup pair straddling sources lands in the off-diagonal
    cell with canonical (least, greatest) ordering; a within-source
    pair lands on the diagonal."""
    from dataquality_ml_spark.operators.dedup import dup_source_matrix

    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.85)], "id_a long, id_b long, jaccard double"
    )
    src = spark.createDataFrame(
        [(1, "web"), (2, "books"), (3, "web"), (4, "web")],
        "doc_id long, source string",
    )
    got = {
        (r.source_a, r.source_b): (r.n_pairs, r.avg_jaccard)
        for r in dup_source_matrix(pairs, src).collect()
    }
    assert got[("books", "web")] == (1, 0.9)
    assert got[("web", "web")] == (1, 0.85)


def test_ks_matrix_binned_identical_and_disjoint(spark):
    """Identical segment distributions -> D = 0; disjoint supports ->
    D = 1; loud contracts on bins/lo-hi/key-cardinality."""
    from dataquality_ml_spark.operators.drift import ks_matrix_binned

    rows = (
        [("a", float(i % 10)) for i in range(200)]
        + [("b", float(i % 10)) for i in range(300)]
        + [("c", 80.0 + (i % 10)) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "k string, value double")
    got = {
        (r.key_a, r.key_b): r
        for r in ks_matrix_binned(df, "k", bins=20, lo=0.0, hi=100.0).collect()
    }
    assert got[("a", "b")]["ks_d"] == pytest.approx(0.0)
    assert got[("a", "b")]["n_a"] == 200 and got[("a", "b")]["n_b"] == 300
    assert got[("a", "c")]["ks_d"] == pytest.approx(1.0)
    assert got[("b", "c")]["ks_d"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="bins"):
        ks_matrix_binned(df, "k", bins=1, lo=0.0, hi=1.0)
    with pytest.raises(ValueError, match="lo < hi"):
        ks_matrix_binned(df, "k", bins=4, lo=1.0, hi=1.0)
    wide = spark.range(600).select(
        F.col("id").cast("string").alias("k"), F.lit(1.0).alias("value")
    )
    with pytest.raises(ValueError, match="max_keys"):
        ks_matrix_binned(wide, "k", bins=4, lo=0.0, hi=2.0, max_keys=50)


def test_rolling_origin_no_future_leak(spark):
    """Every fold's max train timestamp must precede its min test
    timestamp; training windows EXPAND across folds; a row never plays
    test in an earlier fold than train."""
    import datetime as dt

    from dataquality_ml_spark.operators.selection import rolling_origin_assign

    base = dt.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=i)) for i in range(500)],
        "id long, ts timestamp",
    )
    out = rolling_origin_assign(df, "ts", n_folds=4)
    cells = {
        (r.fold, r.role): (r.mn, r.mx, r.n)
        for r in out.groupBy("fold", "role")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    train_sizes = []
    for fold in (1, 2, 3, 4):
        assert cells[(fold, "train")][1] < cells[(fold, "test")][0], fold
        train_sizes.append(cells[(fold, "train")][2])
    assert train_sizes == sorted(train_sizes) and train_sizes[0] < train_sizes[-1]
    # the union of fold-1 train and all test slices covers every row
    assert out.select("id").distinct().count() == 500
    with pytest.raises(ValueError, match="n_folds"):
        rolling_origin_assign(df, "ts", n_folds=0)


def test_markov_stationary_hand_chain_and_patch(spark):
    """Two-state chain P(a->b)=1, P(b->a)=0.5, P(b->b)=0.5 has
    stationary pi = (1/3, 2/3); a dangling state keeps all mass it is
    fed via the self-loop patch; iterations<1 raises."""
    from dataquality_ml_spark.operators.graph import markov_stationary

    trans = spark.createDataFrame(
        [("a", "b", 10), ("b", "a", 5), ("b", "b", 5)],
        "prev_t string, next_t string, n long",
    )
    pi = {r.state: r.pi for r in markov_stationary(trans, iterations=40).collect()}
    assert pi["a"] == pytest.approx(1 / 3, abs=1e-6)
    assert pi["b"] == pytest.approx(2 / 3, abs=1e-6)
    absorbing = spark.createDataFrame(
        [("a", "z", 1)], "prev_t string, next_t string, n long"
    )
    pz = {r.state: r.pi for r in markov_stationary(absorbing, iterations=30).collect()}
    assert pz["z"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="iterations"):
        markov_stationary(trans, iterations=0)


def test_loso_mean_delta_hand_computed(spark):
    """Segments a:(1,1), b:(4): removing b moves the mean 2 -> 1
    (delta -1); removing a moves it 2 -> 4 (delta +2); a segment that
    IS the corpus gets NULL mean_without."""
    from dataquality_ml_spark.operators.profile import loso_mean_delta

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 4.0)], "k string, v double"
    )
    got = {r.k: r for r in loso_mean_delta(df, "k", "v").collect()}
    assert got["b"]["mean_without"] == pytest.approx(1.0)
    assert got["b"]["delta"] == pytest.approx(-1.0)
    assert got["a"]["mean_without"] == pytest.approx(4.0)
    assert got["a"]["delta"] == pytest.approx(2.0)
    solo = loso_mean_delta(df.where("k = 'a'"), "k", "v").first()
    assert solo["mean_without"] is None and solo["delta"] is None


def test_welch_matrix_hand_computed(spark):
    """Welch t/df and Cohen's d against the textbook formulas on two
    hand segments; equal segments give t=0; the quadratic key contract
    raises."""
    from dataquality_ml_spark.operators.evaluate import welch_t_matrix

    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("b", v) for v in (6.0, 8.0)
    ]
    df = spark.createDataFrame(rows, "k string, value double")
    r = welch_t_matrix(df, "k", "value").first()
    # a: n=4 m=2.5 v=5/3 ; b: n=2 m=7 v=2
    sa, sb = (5 / 3) / 4, 2 / 2
    t = (2.5 - 7) / math.sqrt(sa + sb)
    dfw = (sa + sb) ** 2 / (sa**2 / 3 + sb**2 / 1)
    sp = math.sqrt((3 * (5 / 3) + 1 * 2) / 4)
    assert r["t_stat"] == pytest.approx(t)
    assert r["df_welch"] == pytest.approx(dfw)
    assert r["cohens_d"] == pytest.approx((2.5 - 7) / sp)
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)],
        "k string, value double",
    )
    assert welch_t_matrix(same, "k", "value").first()["t_stat"] == pytest.approx(0.0)
    wide = spark.range(300).select(
        F.col("id").cast("string").alias("k"), F.lit(1.0).alias("value")
    )
    with pytest.raises(ValueError, match="max_keys"):
        welch_t_matrix(wide, "k", "value", max_keys=10)


def test_markov_entropy_rate_deterministic_vs_uniform(spark):
    """A deterministic 2-cycle has entropy rate 0; a uniform 2-state
    chain has ln 2 (normalized 1.0)."""
    from dataquality_ml_spark.operators.graph import markov_entropy_rate

    cycle = spark.createDataFrame(
        [("a", "b", 7), ("b", "a", 7)], "prev_t string, next_t string, n long"
    )
    r = markov_entropy_rate(cycle).first()
    assert r["n_states"] == 2 and r["entropy_rate"] == pytest.approx(0.0)
    uniform = spark.createDataFrame(
        [("a", "a", 5), ("a", "b", 5), ("b", "a", 5), ("b", "b", 5)],
        "prev_t string, next_t string, n long",
    )
    u = markov_entropy_rate(uniform).first()
    assert u["entropy_rate"] == pytest.approx(math.log(2))
    assert u["entropy_rate_norm"] == pytest.approx(1.0)


def test_markov_local_vs_distributed_strategies(spark):
    """The driver-side bounded power method (strategy='local'/'auto')
    replays the distributed relational loop exactly: same states, same
    pi/entropy to float tolerance, on a chain with dangling states and
    a pure-source state (which must DROP OUT of pi in both forms); the
    over-limit local contract raises loudly."""
    from dataquality_ml_spark.operators.graph import (
        markov_entropy_rate,
        markov_stationary,
    )

    trans = spark.createDataFrame(
        [
            ("a", "b", 10),
            ("b", "a", 5),
            ("b", "b", 5),
            ("b", "c", 2),
            ("c", "d", 1),  # d is dangling -> self-loop patch
            ("x", "a", 3),  # x is a pure source -> drops out of pi
        ],
        "prev_t string, next_t string, n long",
    )
    loc = {
        r.state: r.pi
        for r in markov_stationary(trans, iterations=7, strategy="local").collect()
    }
    dist = {
        r.state: r.pi
        for r in markov_stationary(
            trans, iterations=7, strategy="distributed"
        ).collect()
    }
    assert set(loc) == set(dist) and "x" not in loc
    for s in dist:
        assert loc[s] == pytest.approx(dist[s], abs=1e-12), s
    el = markov_entropy_rate(trans, iterations=7, strategy="local").first()
    ed = markov_entropy_rate(trans, iterations=7, strategy="distributed").first()
    assert el["n_states"] == ed["n_states"]
    assert el["entropy_rate"] == pytest.approx(ed["entropy_rate"], abs=1e-12)
    assert el["entropy_rate_norm"] == pytest.approx(
        ed["entropy_rate_norm"], abs=1e-12
    )
    with pytest.raises(ValueError, match="local_rows_limit"):
        markov_stationary(trans, strategy="local", local_rows_limit=2)
    with pytest.raises(ValueError, match="local_rows_limit"):
        markov_entropy_rate(trans, strategy="local", local_rows_limit=2)
