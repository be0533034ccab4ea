"""Unit tests for the drift (PSI/KS/chi-square), skew-profiling,
incremental-dedup and RHP-LSH operators — statistical behavior on planted
distributions, beyond the oracle hash parity covered in
test_oracle_parity.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataquality_ml_spark.operators import drift
from dataquality_ml_spark.operators.dedup import incremental_dedup
from dataquality_ml_spark.operators.profile import heavy_hitters
from dataquality_ml_spark.operators.similarity import rhp_near_dup_pairs, rhp_planes


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def test_psi_identical_distributions_is_zero(spark):
    df = _vals(spark, [i % 10 for i in range(1000)])
    out = drift.psi_bins(df, df, "x", lo=0.0, hi=10.0, bins=10).collect()
    assert len(out) == 10
    assert all(abs(r["psi_term"]) < 1e-12 for r in out)
    assert abs(out[0]["psi_total"]) < 1e-12


def test_psi_detects_planted_shift(spark):
    ref = _vals(spark, [1] * 900 + [8] * 100)
    cur = _vals(spark, [1] * 100 + [8] * 900)  # mass moved across bins
    out = drift.psi_bins(ref, cur, "x", lo=0.0, hi=10.0, bins=10).collect()
    total = out[0]["psi_total"]
    assert total > 0.2, f"swapped 80% of mass but PSI={total}"
    # bins that lost and gained mass contribute symmetrically here
    terms = {r["bin"]: r["psi_term"] for r in out}
    assert terms[1] > 0 and terms[8] > 0  # both (p-q)ln(p/q) terms positive


def test_psi_out_of_range_values_clamp_to_edge_bins(spark):
    ref = _vals(spark, [-5.0, 50.0])  # below lo and above hi
    out = drift.psi_bins(ref, ref, "x", lo=0.0, hi=10.0, bins=5).collect()
    by_bin = {r["bin"]: r["p_ref"] for r in out}
    assert by_bin[0] == 0.5 and by_bin[4] == 0.5


def test_ks_same_sample_is_zero_and_shift_is_large(spark):
    a = _vals(spark, range(500))
    assert drift.ks_statistic(a, a, "x").first()["ks_d"] == 0.0
    b = _vals(spark, range(400, 900))  # shifted by 400 of 500 → D = 0.8
    r = drift.ks_statistic(a, b, "x").first()
    assert abs(r["ks_d"] - 0.8) < 1e-9
    assert (r["n_a"], r["n_b"]) == (500, 500)


def test_ks_binned_approximates_exact(spark):
    a = _vals(spark, [i % 97 for i in range(2000)])
    b = _vals(spark, [(i * 7) % 113 for i in range(2000)])
    exact = drift.ks_statistic(a, b, "x").first()["ks_d"]
    binned = drift.ks_statistic(a, b, "x", bins=50, lo=0.0, hi=113.0).first()["ks_d"]
    # binned D underestimates by at most ~the max per-bin mass (≈1/50·2)
    assert binned <= exact + 1e-9
    assert abs(binned - exact) < 0.06


def test_chi2_independent_vs_dependent(spark):
    # independent: b = i%2 varies within every a group identically
    rows = [(str(i % 3), i % 2) for i in range(600)]
    ind = spark.createDataFrame(rows, "a string, b int")
    r = drift.chi2_independence(ind, "a", "b").first()
    assert r["chi2"] < 1e-9 and r["dof"] == 2 and r["n"] == 600
    # perfectly dependent: b determined by a → chi2 = n·(min(|A|,|B|)-1)
    dep = spark.createDataFrame([(str(i % 2), i % 2) for i in range(600)], "a string, b int")
    r2 = drift.chi2_independence(dep, "a", "b").first()
    assert abs(r2["chi2"] - 600.0) < 1e-6  # n·(2-1)·(2-1) for a 2×2


def test_chi2_matches_hand_computation(spark):
    # contingency [[30, 10], [20, 40]] → chi2 = 100·(30·40-10·20)²/(40·60·50·50)
    rows = (
        [("x", 0)] * 30 + [("x", 1)] * 10 + [("y", 0)] * 20 + [("y", 1)] * 40
    )
    df = spark.createDataFrame(rows, "a string, b int")
    expected = 100 * (30 * 40 - 10 * 20) ** 2 / (40 * 60 * 50 * 50)
    got = drift.chi2_independence(df, "a", "b").first()["chi2"]
    assert abs(got - expected) < 1e-9


def test_heavy_hitters_shares_and_ties(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"]], "k string"
    )
    out = heavy_hitters(df, "k", top_n=3).collect()
    assert [(r["value"], r["n"], r["rank"]) for r in out] == [
        ("a", 5, 1),
        ("b", 3, 2),  # tie with c broken by value asc
        ("c", 3, 3),
    ]
    assert abs(out[0]["share"] - 5 / 12) < 1e-12


def test_incremental_dedup_drops_corpus_and_batch_dups(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "hello world")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "Hello   WORLD"),  # dup of corpus doc 2 after normalization
            (11, "something new"),
            (12, "something new"),  # batch-internal dup → keep min id 11
            (13, "entirely different"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in incremental_dedup(batch, corpus).collect())
    assert kept == [11, 13]


def test_rhp_planes_deterministic_and_bounded():
    p1 = rhp_planes(64, 12)
    p2 = rhp_planes(64, 12)
    assert p1 == p2
    assert all(-1.0 <= v <= 1.0 for plane in p1 for v in plane)
    assert len({tuple(p) for p in p1}) == 12  # distinct planes


def test_rhp_lsh_finds_planted_near_duplicate(spark):
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [v + rng.gauss(0, 0.01) for v in base]  # cosine ≈ 1
    rows = [(0, base), (1, near)] + [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = rhp_near_dup_pairs(df, threshold=0.9).collect()
    assert any((r["id_a"], r["id_b"]) == (0, 1) for r in pairs), (
        "near-identical vector pair must share at least one LSH band"
    )


def test_ks_null_values_ignored(spark):
    a = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
    r = drift.ks_statistic(a, a, "x").first()
    assert r["n_a"] == 2 and r["ks_d"] == 0.0


# ---------------------------------------------------------------------------
# Connected components / dedup clusters
# ---------------------------------------------------------------------------
def test_connected_components_chain_and_clique(spark):
    """A 5-node chain (diameter > 1 iteration) and a separate triangle must
    both collapse to their min-id representative."""
    from dataquality_ml_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert {comp[n] for n in (1, 2, 3, 4, 5)} == {1}
    assert {comp[n] for n in (10, 11, 12)} == {10}


def test_dedup_clusters_sizes_and_keepers(spark):
    from dataquality_ml_spark.operators.graph import dedup_clusters

    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 21)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[7]["keep_id"] == 3 and rows[9]["keep_id"] == 3
    assert rows[3]["cluster_size"] == 3
    assert rows[20]["keep_id"] == 20 and rows[20]["cluster_size"] == 2
    # drop set = nodes whose id != keeper
    drops = sorted(d for d, r in rows.items() if r["keep_id"] != d)
    assert drops == [7, 9, 21]


def test_connected_components_long_path_converges(spark):
    """A 33-node path needs ~log-diameter doubling or linear propagation;
    the operator must reach the fixpoint within its max_iter budget."""
    from dataquality_ml_spark.operators.graph import connected_components

    n = 33
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = connected_components(edges, max_iter=40).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == n


# ---------------------------------------------------------------------------
# Round-8 two-sample family: brute-force Python differentials for the new
# drift tests (rank-sum, CvM, Q-Q, MI) on tie-heavy random data. The plan
# shapes (no unpartitioned window in the exact paths) are gated separately
# in tests/test_scale_plans.py.
# ---------------------------------------------------------------------------
def _two_samples(spark, seed=7, na=800, nb=650):
    import random

    rng = random.Random(seed)
    av = [round(rng.gauss(0, 1), 2) for _ in range(na)]  # ties via rounding
    bv = [round(rng.gauss(0.3, 1.2), 2) for _ in range(nb)]
    a = spark.createDataFrame([(x,) for x in av], "v double")
    b = spark.createDataFrame([(x,) for x in bv], "v double")
    return av, bv, a, b


def test_rank_sum_matches_brute_force(spark):
    import collections
    import math

    from dataquality_ml_spark.operators.drift import rank_sum_test

    av, bv, a, b = _two_samples(spark)
    cnt = collections.Counter(av + bv)
    mr, below = {}, 0
    for v in sorted(cnt):
        mr[v] = below + (cnt[v] + 1) / 2.0
        below += cnt[v]
    na, nb = len(av), len(bv)
    n = na + nb
    u = sum(mr[x] for x in av) - na * (na + 1) / 2
    ties = sum(c**3 - c for c in cnt.values())
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    row = rank_sum_test(a, b, "v").first()
    assert row["u_stat"] == u  # midranks are halves → IEEE-exact
    assert abs(row["z_score"] - z) < 1e-9
    assert (row["n_a"], row["n_b"]) == (na, nb)


def test_cvm_matches_brute_force(spark):
    import collections

    from dataquality_ml_spark.operators.drift import cvm_statistic

    av, bv, a, b = _two_samples(spark)
    na, nb = len(av), len(bv)
    cnt = collections.Counter(av + bv)
    ca = cb = 0
    s = 0.0
    for v in sorted(cnt):
        ca += sum(1 for x in av if x == v)
        cb += sum(1 for x in bv if x == v)
        s += cnt[v] * (ca / na - cb / nb) ** 2
    t = na * nb / (na + nb) ** 2 * s
    row = cvm_statistic(a, b, "v").first()
    assert abs(row["cvm_t"] - t) < 1e-9
    assert (row["n_a"], row["n_b"]) == (na, nb)


def test_cvm_binned_close_to_exact(spark):
    from dataquality_ml_spark.operators.drift import cvm_statistic

    _, _, a, b = _two_samples(spark)
    exact = cvm_statistic(a, b, "v").first()["cvm_t"]
    binned = cvm_statistic(a, b, "v", bins=200, lo=-5.0, hi=5.0).first()["cvm_t"]
    assert abs(binned - exact) < 0.05 * max(exact, 1e-9)


def test_qq_table_matches_sorted_interpolation(spark):
    import math

    from dataquality_ml_spark.operators.drift import qq_table

    av, bv, a, b = _two_samples(spark)
    sa, sb = sorted(av), sorted(bv)

    def qc(s, q):
        i = q * (len(s) - 1)
        lo, hi = int(math.floor(i)), int(math.ceil(i))
        return s[lo] + (i - lo) * (s[hi] - s[lo])

    rows = qq_table(a, b, "v").collect()
    assert [r["q"] for r in rows] == [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    for r in rows:
        assert r["val_a"] == qc(sa, r["q"])  # bit-equal interpolation
        assert r["val_b"] == qc(sb, r["q"])
        assert abs(r["gap"] - (r["val_b"] - r["val_a"])) < 1e-15


def test_mutual_information_matches_brute_force(spark):
    import collections
    import math
    import random

    from dataquality_ml_spark.operators.drift import mutual_information

    rng = random.Random(11)
    pairs = [(rng.choice("abc"), rng.choice("xyzw")) for _ in range(3000)]
    # inject real dependence so MI is far from 0
    pairs += [("a", "x")] * 500 + [("b", "y")] * 400
    df = spark.createDataFrame(pairs, "s string, l string")
    pc = collections.Counter(pairs)
    pa = collections.Counter(p[0] for p in pairs)
    pb = collections.Counter(p[1] for p in pairs)
    n = len(pairs)
    mi = sum(
        o / n * math.log(o * n / (pa[k[0]] * pb[k[1]])) for k, o in pc.items()
    )
    row = mutual_information(df, "s", "l").first()
    assert abs(row["mi"] - mi) < 1e-9
    assert row["n"] == n
    # independence sanity: shuffling one side to a constant gives MI == 0
    const = df.select("s", F.lit("z").alias("l"))
    assert abs(mutual_information(const, "s", "l").first()["mi"]) < 1e-12


def test_anderson_darling_matches_brute_force(spark):
    import collections

    from dataquality_ml_spark.operators.drift import anderson_darling

    av, bv, a, b = _two_samples(spark)
    na, nb = len(av), len(bv)
    n = na + nb
    cnt = collections.Counter(av + bv)
    fa, fb = collections.Counter(av), collections.Counter(bv)
    ca = cb = 0
    inner = 0.0
    for z in sorted(cnt):
        l = cnt[z]
        ca += fa.get(z, 0)
        cb += fb.get(z, 0)
        bb = ca + cb - l / 2
        den = bb * (n - bb) - n * l / 4
        if den <= 0:
            continue
        m_a = ca - fa.get(z, 0) / 2
        m_b = cb - fb.get(z, 0) / 2
        inner += (l / n) * (
            (n * m_a - na * bb) ** 2 / den / na
            + (n * m_b - nb * bb) ** 2 / den / nb
        )
    want = (n - 1) / n * inner
    row = anderson_darling(a, b, "v").first()
    assert abs(row["ad_a2"] - want) < 1e-9
    assert (row["n_a"], row["n_b"]) == (na, nb)
    # identical samples: every (N·M − n·B) gap is exactly 0 → A² == 0.0
    assert anderson_darling(a, a, "v").first()["ad_a2"] == 0.0


def test_ks_by_group_matches_per_group_ks(spark):
    """Keyed single-pass KS == running the global operator once per
    segment; one-sided segments report ks_d = 1.0 by convention."""
    from dataquality_ml_spark.operators.drift import ks_by_group, ks_statistic

    av, bv, a, b = _two_samples(spark)
    ga = a.select(F.lit("s1").alias("g"), "v").unionAll(
        a.select(F.lit("s2").alias("g"), (F.col("v") * 2).alias("v"))
    )
    gb = b.select(F.lit("s1").alias("g"), "v").unionAll(
        b.select(F.lit("s3").alias("g"), (F.col("v") + 1).alias("v"))
    )
    rows = {r["g"]: r for r in ks_by_group(ga, gb, "v", keys=["g"]).collect()}
    assert set(rows) == {"s1", "s2", "s3"}
    want = ks_statistic(a, b, "v").first()
    assert rows["s1"]["ks_d"] == want["ks_d"]
    assert (rows["s1"]["n_a"], rows["s1"]["n_b"]) == (want["n_a"], want["n_b"])
    # s2 exists only on side a, s3 only on side b → total drift
    assert rows["s2"]["ks_d"] == 1.0 and rows["s2"]["n_b"] == 0
    assert rows["s3"]["ks_d"] == 1.0 and rows["s3"]["n_a"] == 0


def test_psi_timeline_two_periods_equals_psi_bins(spark):
    """psi_timeline with exactly two periods reproduces psi_bins'
    psi_total for the second period (ref period's own PSI is 0), and the
    per-period n counts the non-null rows."""
    from dataquality_ml_spark.operators.drift import psi_bins, psi_timeline

    av, bv, a, b = _two_samples(spark)
    tagged = a.select(F.lit(1).alias("t"), "v").unionAll(
        b.select(F.lit(2).alias("t"), "v")
    )
    rows = {
        r["period"]: r
        for r in psi_timeline(
            tagged, "v", F.col("t"), lo=-4.0, hi=4.0, bins=16
        ).collect()
    }
    assert rows[1]["psi"] == 0.0 and rows[1]["n"] == len(av)
    want = (
        psi_bins(a, b, "v", lo=-4.0, hi=4.0, bins=16)
        .select("psi_total")
        .first()[0]
    )
    assert abs(rows[2]["psi"] - want) < 1e-12
    assert rows[2]["n"] == len(bv)


def test_corr_drift_matches_brute_force(spark):
    """corr_drift == numpy corrcoef per side + hand-computed Fisher z;
    identical samples give z == 0 exactly."""
    import math
    import random

    import numpy as np

    from dataquality_ml_spark.operators.drift import corr_drift

    rng = random.Random(5)
    rows_a = [(x := rng.gauss(0, 1), 0.8 * x + rng.gauss(0, 0.5)) for _ in range(600)]
    rows_b = [(x := rng.gauss(0, 1), -0.2 * x + rng.gauss(0, 1.0)) for _ in range(400)]
    a = spark.createDataFrame(rows_a, "x double, y double")
    b = spark.createDataFrame(rows_b, "x double, y double")
    row = corr_drift(a, b, "x", "y").first()
    ra = float(np.corrcoef([r[0] for r in rows_a], [r[1] for r in rows_a])[0, 1])
    rb = float(np.corrcoef([r[0] for r in rows_b], [r[1] for r in rows_b])[0, 1])
    na, nb = len(rows_a), len(rows_b)
    z = (math.atanh(ra) - math.atanh(rb)) / math.sqrt(1 / (na - 3) + 1 / (nb - 3))
    assert abs(row["r_a"] - ra) < 1e-9 and abs(row["r_b"] - rb) < 1e-9
    assert abs(row["fisher_z"] - z) < 1e-9
    assert (row["n_a"], row["n_b"]) == (na, nb)
    same = corr_drift(a, a, "x", "y").first()
    assert same["fisher_z"] == 0.0


def test_ks_by_group_keeps_null_segment_key(spark):
    """A NULL segment key is a real segment: grouped aggregates keep it
    (both engines), so the keyed totals join must be null-safe or the
    NULL group silently vanishes from the drift panel (round-9 ADVICE)."""
    from dataquality_ml_spark.operators.drift import ks_by_group, ks_statistic

    rows_a = [("t1", float(i % 10)) for i in range(200)] + [
        (None, float(i % 7)) for i in range(150)
    ]
    rows_b = [("t1", float(i % 10) + 2.0) for i in range(180)] + [
        (None, float(i % 7) + 1.0) for i in range(120)
    ]
    a = spark.createDataFrame(rows_a, "g string, v double")
    b = spark.createDataFrame(rows_b, "g string, v double")
    rows = {r["g"]: r for r in ks_by_group(a, b, "v", keys=["g"]).collect()}
    assert set(rows) == {"t1", None}, "NULL segment dropped"
    want = ks_statistic(
        a.where(F.col("g").isNull()), b.where(F.col("g").isNull()), "v"
    ).first()
    got = rows[None]
    assert got["ks_d"] == want["ks_d"]
    assert (got["n_a"], got["n_b"]) == (150, 120)


def test_cvm_exact_overflow_raises_and_inexact_path_survives(spark):
    """The exact CvM path must FAIL LOUDLY when the DECIMAL(38,0) terms
    overflow (Spark nulls overflowing products and sum skips nulls — a
    silent wrong answer otherwise), and exact=False must return the
    normalized-double statistic at any magnitude (round-9 ADVICE).
    Overflow is staged through a synthetic prebuilt ecdf relation —
    counts at the ~2e9-row pooled ceiling, no need for 2e9 actual rows."""
    from dataquality_ml_spark.operators.drift import cvm_statistic

    big = 3_000_000_000  # tot ~3e9 → gap ~9e18, cnt·gap² > 10³⁸
    fake = spark.createDataFrame(
        [
            (2, 1, big, 0, big, big),
            (1, 2, big, big // 3, big, big),
        ],
        "n_a bigint, n_b bigint, ca bigint, cb bigint, tot_a bigint, tot_b bigint",
    )
    # under ANSI (Spark 4 default) the decimal product itself throws
    # NUMERIC_VALUE_OUT_OF_RANGE; with ansi off, sum skips the nulled
    # products and our raise_error guard fires — loud either way
    with pytest.raises(
        Exception, match="overflow|USER_RAISED|Decimal\\(38"
    ):
        cvm_statistic(None, None, "v", ecdf=fake).first()
    row = cvm_statistic(None, None, "v", ecdf=fake, exact=False).first()
    # hand-computed: T = na·nb/N² · Σ cnt·(ca/ta − cb/tb)²  (normalized)
    want = (
        big * big / (2.0 * big) ** 2
        * (3 * (1.0 - 0.0) ** 2 + 3 * (1.0 - (big // 3) / big) ** 2)
    )
    assert abs(row["cvm_t"] - want) < 1e-9 * want

    # on ordinary data the two paths agree to float precision
    a = _vals(spark, [i % 31 for i in range(3000)])
    b = _vals(spark, [(i * 3) % 41 for i in range(2500)])
    ex = cvm_statistic(a, b, "x").first()["cvm_t"]
    ap = cvm_statistic(a, b, "x", exact=False).first()["cvm_t"]
    assert abs(ex - ap) < 1e-9 * max(ex, 1.0)


def test_cvm_partial_overflow_detected_under_ansi_off(spark):
    """Round-10 ADVICE: under ansi-off, an overflowing DECIMAL(38,0) term
    becomes NULL and F.sum SKIPS it — when only SOME rows overflow the sum
    stays non-null and the old null-check guard passed, returning a
    silently-wrong cvm_t. The guard must compare row count to non-null
    term count. Staged: tot=2e9 keeps denom = 4·t⁴ ≈ 6.4e37 under the
    decimal ceiling (so the denom check can't save us), row 1's
    cnt·gap² = 100·(t²)² ≈ 1.6e39 overflows, row 2's gap = 0 doesn't."""
    from dataquality_ml_spark.operators.drift import cvm_statistic, drift_panel

    t = 2_000_000_000
    fake = spark.createDataFrame(
        [
            (50, 50, t, 0, t, t),  # gap = t² → term overflows
            (1, 1, t, t, t, t),  # gap = 0 → term fine
        ],
        "n_a bigint, n_b bigint, ca bigint, cb bigint, tot_a bigint, tot_b bigint",
    )
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="overflow|USER_RAISED"):
            cvm_statistic(None, None, "v", ecdf=fake).first()
        with pytest.raises(Exception, match="overflow|USER_RAISED"):
            drift_panel(None, None, "v", ecdf=fake).first()
        # the normalized-double path still returns the right statistic:
        # T = n_a·n_b/N² · Σ cnt·(F_a−F_b)² = t·t/(2t)²·(100·1² + 2·0²) = 25
        row = cvm_statistic(None, None, "v", ecdf=fake, exact=False).first()
        assert row["cvm_t"] == pytest.approx(25.0)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_keyed_drift_family_matches_per_segment_global(spark):
    """rank_sum_test / cvm_statistic / anderson_darling / qq_table with
    keys= must equal running the global operator once per segment
    (VERDICT r8 item 4 — the one-pass panel that replaces the
    reference's per-column job loop, lib/utils.py:187-195), including a
    NULL segment key and a one-sided segment."""
    import random

    from dataquality_ml_spark.operators.drift import (
        anderson_darling,
        cvm_statistic,
        qq_table,
        rank_sum_test,
    )

    rng = random.Random(11)
    rows_a = (
        [("t1", rng.gauss(0, 1)) for _ in range(400)]
        + [("t2", float(rng.randrange(20))) for _ in range(300)]
        + [(None, rng.random()) for _ in range(200)]
        + [("only_a", rng.random()) for _ in range(50)]
    )
    rows_b = (
        [("t1", rng.gauss(0.5, 1.2)) for _ in range(350)]
        + [("t2", float(rng.randrange(25))) for _ in range(250)]
        + [(None, rng.random() + 0.2) for _ in range(150)]
    )
    a = spark.createDataFrame(rows_a, "g string, v double")
    b = spark.createDataFrame(rows_b, "g string, v double")
    segs = ["t1", "t2", None]

    def _seg(df, g):
        return df.where(F.col("g").isNull() if g is None else (F.col("g") == g))

    mw = {r["g"]: r for r in rank_sum_test(a, b, "v", keys=["g"]).collect()}
    cv = {r["g"]: r for r in cvm_statistic(a, b, "v", keys=["g"]).collect()}
    ad = {r["g"]: r for r in anderson_darling(a, b, "v", keys=["g"]).collect()}
    qq = {}
    for r in qq_table(a, b, "v", qs=(0.25, 0.5, 0.75), keys=["g"]).collect():
        qq.setdefault(r["g"], {})[r["q"]] = (r["val_a"], r["val_b"], r["gap"])
    assert set(mw) == set(cv) == set(ad) == {"t1", "t2", None, "only_a"}

    for g in segs:
        wa, wb = _seg(a, g), _seg(b, g)
        w_mw = rank_sum_test(wa, wb, "v").first()
        assert mw[g]["u_stat"] == w_mw["u_stat"], g
        assert abs(mw[g]["z_score"] - w_mw["z_score"]) < 1e-12, g
        assert (mw[g]["n_a"], mw[g]["n_b"]) == (w_mw["n_a"], w_mw["n_b"])
        w_cv = cvm_statistic(wa, wb, "v").first()
        assert cv[g]["cvm_t"] == w_cv["cvm_t"], g
        w_ad = anderson_darling(wa, wb, "v").first()
        assert abs(ad[g]["ad_a2"] - w_ad["ad_a2"]) < 1e-12, g
        w_qq = {
            r["q"]: (r["val_a"], r["val_b"], r["gap"])
            for r in qq_table(wa, wb, "v", qs=(0.25, 0.5, 0.75)).collect()
        }
        assert qq[g] == w_qq, g

    # one-sided segment: MW/CvM/AD report NULL statistics with the
    # correct side counts; QQ reports the present side's quantiles only
    assert mw["only_a"]["z_score"] is None
    assert (mw["only_a"]["n_a"], mw["only_a"]["n_b"]) == (50, 0)
    assert cv["only_a"]["cvm_t"] is None
    assert ad["only_a"]["ad_a2"] is None
    qa = qq["only_a"]
    assert all(v[1] is None and v[2] is None for v in qa.values())
    only = _seg(a, "only_a").agg(
        F.expr("percentile(v, array(0.25, 0.5, 0.75))").alias("p")
    ).first()["p"]
    assert [qa[q][0] for q in (0.25, 0.5, 0.75)] == list(only)


def test_drift_panel_equals_standalone_operators(spark):
    """drift_panel fuses KS/MW/CvM/AD into ONE aggregation over one
    shared ECDF — values must equal the standalone operators EXACTLY
    (same expression trees), ungrouped and keyed, including a NULL
    segment key and a one-sided segment."""
    import random

    from dataquality_ml_spark.operators.drift import (
        anderson_darling,
        cvm_statistic,
        drift_panel,
        ks_by_group,
        ks_statistic,
        rank_sum_test,
    )

    rng = random.Random(23)
    rows_a = (
        [("x", rng.gauss(0, 1)) for _ in range(300)]
        + [(None, float(rng.randrange(9))) for _ in range(150)]
        + [("solo", rng.random()) for _ in range(40)]
    )
    rows_b = [("x", rng.gauss(0.3, 1.1)) for _ in range(260)] + [
        (None, float(rng.randrange(11))) for _ in range(120)
    ]
    a = spark.createDataFrame(rows_a, "g string, v double")
    b = spark.createDataFrame(rows_b, "g string, v double")

    # ungrouped
    p = drift_panel(a, b, "v").first()
    assert p["ks_d"] == ks_statistic(a, b, "v").first()["ks_d"]
    mw = rank_sum_test(a, b, "v").first()
    assert (p["u_stat"], p["z_score"]) == (mw["u_stat"], mw["z_score"])
    assert p["cvm_t"] == cvm_statistic(a, b, "v").first()["cvm_t"]
    # AD's inner term is a DOUBLE sum — partial-aggregation order varies
    # run to run, so equality is tolerance-tight, not bitwise
    assert abs(p["ad_a2"] - anderson_darling(a, b, "v").first()["ad_a2"]) < 1e-9
    assert (p["n_a"], p["n_b"]) == (490, 380)

    # keyed
    panel = {r["g"]: r for r in drift_panel(a, b, "v", keys=["g"]).collect()}
    ks = {r["g"]: r["ks_d"] for r in ks_by_group(a, b, "v", keys=["g"]).collect()}
    mwk = {r["g"]: r for r in rank_sum_test(a, b, "v", keys=["g"]).collect()}
    cvk = {r["g"]: r["cvm_t"] for r in cvm_statistic(a, b, "v", keys=["g"]).collect()}
    adk = {r["g"]: r["ad_a2"] for r in anderson_darling(a, b, "v", keys=["g"]).collect()}
    assert set(panel) == {"x", None, "solo"}
    for g, r in panel.items():
        assert r["ks_d"] == ks[g], g
        assert (r["u_stat"], r["z_score"]) == (mwk[g]["u_stat"], mwk[g]["z_score"]), g
        assert r["cvm_t"] == cvk[g], g
        if r["ad_a2"] is None:
            assert adk[g] is None, g
        else:
            assert abs(r["ad_a2"] - adk[g]) < 1e-9, g
    assert panel["solo"]["ks_d"] == 1.0
    assert panel["solo"]["z_score"] is None
    assert panel["solo"]["cvm_t"] is None and panel["solo"]["ad_a2"] is None


def test_psi_categorical_and_jsd_semantics(spark):
    """Categorical drift pair: identical mixes score ~0; a share swap
    alarms; NULL is a real category; disjoint supports hit JSD's ln 2
    ceiling exactly and JSD is symmetric."""
    import math

    from dataquality_ml_spark.operators.drift import js_divergence, psi_categorical

    mk = lambda xs: spark.createDataFrame([(x,) for x in xs], "c string")  # noqa: E731
    a = mk(["en"] * 80 + ["fr"] * 15 + [None] * 5)
    same = psi_categorical(a, a, "c").collect()
    assert {r["category"] for r in same} == {"en", "fr", None}
    assert all(abs(r["psi_term"]) < 1e-12 for r in same)
    assert abs(js_divergence(a, a, "c").first()["jsd"]) < 1e-12

    b = mk(["en"] * 15 + ["fr"] * 80 + [None] * 5)  # en/fr shares swapped
    rows = {r["category"]: r for r in psi_categorical(a, b, "c").collect()}
    assert rows["en"]["psi_total"] > 0.2
    assert rows[None]["psi_term"] == 0.0  # unchanged share
    assert abs(rows["en"]["p_ref"] - 0.8) < 1e-12
    assert abs(rows["en"]["p_cur"] - 0.15) < 1e-12

    # one-sided category stays finite (EPS clamp)
    c = mk(["en"] * 50 + ["zz"] * 50)
    one = {r["category"]: r for r in psi_categorical(a, c, "c").collect()}
    assert math.isfinite(one["zz"]["psi_term"]) and one["zz"]["psi_term"] > 0

    # disjoint supports: JSD == ln 2 exactly in the formula's limit
    d1, d2 = mk(["x"] * 40), mk(["y"] * 60)
    r = js_divergence(d1, d2, "c").first()
    assert abs(r["jsd"] - math.log(2)) < 1e-12
    assert (r["n_ref"], r["n_cur"]) == (40, 60)
    # symmetry
    assert js_divergence(d2, d1, "c").first()["jsd"] == r["jsd"]


def test_calibration_curve_ece_semantics(spark):
    """A perfectly calibrated score (frac_pos == mean score per bin)
    gives ECE ~0; a systematically overconfident score alarms; row set =
    occupied bins; counts and the weighted ECE match hand math."""
    from dataquality_ml_spark.operators.evaluate import calibration_curve

    # bin midpoints 0.05..0.95: make frac_pos exactly the bin's mean score
    rows = []
    for b in range(10):
        p = b / 10 + 0.05
        n = 200
        pos = round(n * p)
        rows += [(p, 1)] * pos + [(p, 0)] * (n - pos)
    df = spark.createDataFrame(rows, "s double, y int")
    out = calibration_curve(df, "s", "y", bins=10).collect()
    assert len(out) == 10
    ece = out[0]["ece"]
    assert ece < 1e-9, ece
    for r in out:
        assert r["n"] == 200
        assert abs(r["frac_pos"] - r["mean_score"]) < 1e-9

    # overconfident: scores near 0.9 but only 30% positives
    bad = spark.createDataFrame(
        [(0.9, 1)] * 30 + [(0.9, 0)] * 70, "s double, y int"
    )
    rep = calibration_curve(bad, "s", "y", bins=10).collect()
    assert len(rep) == 1  # only the occupied bin
    assert abs(rep[0]["ece"] - 0.6) < 1e-9  # |0.9 - 0.3|


def test_feature_drift_report_matches_per_column_panels(spark):
    """feature_drift_report == drift_panel run per column — every
    feature's full panel from ONE melt + ONE keyed aggregation (the
    feature-level kill of the per-column job loop); null/NaN handled
    per column."""
    import random

    from dataquality_ml_spark.operators.drift import drift_panel, feature_drift_report

    rng = random.Random(43)
    mk = lambda shift: spark.createDataFrame(  # noqa: E731
        [
            (
                rng.gauss(shift, 1),
                float(rng.randrange(12)) + shift,
                rng.random() if rng.random() > 0.05 else float("nan"),
            )
            for _ in range(700)
        ],
        "x double, y double, z double",
    )
    a, b = mk(0.0), mk(0.4)
    rep = {r["column"]: r for r in feature_drift_report(a, b, ["x", "y", "z"]).collect()}
    assert set(rep) == {"x", "y", "z"}
    for c in ("x", "y", "z"):
        want = drift_panel(
            a.select(F.col(c).alias("v")).where(~F.isnan("v")),
            b.select(F.col(c).alias("v")).where(~F.isnan("v")),
            "v",
        ).first()
        got = rep[c]
        # approx on the float-sum stats: two separate executions, and
        # Spark does not guarantee float-sum order across plans
        assert got["ks_d"] == pytest.approx(want["ks_d"], rel=1e-9), c
        assert got["u_stat"] == pytest.approx(want["u_stat"], rel=1e-9), c
        assert got["z_score"] == pytest.approx(want["z_score"], rel=1e-9), c
        assert got["cvm_t"] == pytest.approx(want["cvm_t"], rel=1e-9), c
        assert abs(got["ad_a2"] - want["ad_a2"]) < 1e-9, c
        assert (got["n_a"], got["n_b"]) == (want["n_a"], want["n_b"]), c
    # the shifted columns alarm; ks_d sane
    assert rep["x"]["ks_d"] > 0.1 and rep["y"]["ks_d"] > 0.1


def test_categorical_drift_report_matches_standalone_ops(spark):
    """categorical_drift_report's per-column PSI/JSD must equal the
    standalone psi_categorical / js_divergence, and chi2 must equal the
    two-sample homogeneity chi2 (chi2_independence on the stacked
    relation when every cell is occupied); a category entirely missing
    from one side contributes its (0-e)^2/e evidence (hand-computed)."""
    from dataquality_ml_spark.operators.drift import (
        categorical_drift_report,
        chi2_independence,
        js_divergence,
        psi_categorical,
    )

    a = spark.createDataFrame(
        [("x",)] * 40 + [("y",)] * 30 + [("z",)] * 10 + [(None,)] * 5,
        "c1 string",
    ).withColumn("c2", F.when(F.col("c1") == "x", "p").otherwise("q"))
    b = spark.createDataFrame(
        [("x",)] * 20 + [("y",)] * 45 + [("z",)] * 25 + [(None,)] * 2,
        "c1 string",
    ).withColumn("c2", F.when(F.col("c1") == "y", "p").otherwise("q"))

    rep = {
        r["column"]: r
        for r in categorical_drift_report(a, b, ["c1", "c2"]).collect()
    }
    for col in ("c1", "c2"):
        want_psi = psi_categorical(a, b, col).first()["psi_total"]
        want_jsd = js_divergence(a, b, col).first()["jsd"]
        assert abs(rep[col]["psi"] - want_psi) < 1e-12
        assert abs(rep[col]["jsd"] - want_jsd) < 1e-12
        # homogeneity chi2 == independence chi2 of (category, side) when
        # all cells are occupied
        stacked = a.select(F.col(col).alias("cat"), F.lit("a").alias("side")).unionByName(
            b.select(F.col(col).alias("cat"), F.lit("b").alias("side"))
        ).fillna({"cat": "__null__"})
        want_chi2 = chi2_independence(stacked, "cat", "side").first()["chi2"]
        assert abs(rep[col]["chi2"] - want_chi2) < 1e-9
    assert (rep["c1"]["n_a"], rep["c1"]["n_b"]) == (85, 92)

    # zero cell: category 'only_a' absent from cur — hand chi2
    a2 = spark.createDataFrame([("u",)] * 30 + [("only_a",)] * 10, "c string")
    b2 = spark.createDataFrame([("u",)] * 40, "c string")
    row = categorical_drift_report(a2, b2, ["c"]).first()
    # cells: u (30,40), only_a (10,0); N=80, tot_r=tot_c=40
    # e_u = 70*40/80 = 35 each side; e_oa = 10*40/80 = 5 each side
    want = (30 - 35) ** 2 / 35 + (40 - 35) ** 2 / 35 + (10 - 5) ** 2 / 5 + (0 - 5) ** 2 / 5
    assert abs(row["chi2"] - want) < 1e-9


def test_feature_drift_report_mixed_schema(spark):
    """feature_drift_report(categorical_columns=) widens the schema:
    numeric rows NULL out psi/jsd/chi2, categorical rows NULL out the
    rank/ECDF panel; numeric values equal the legacy 8-column report."""
    from dataquality_ml_spark.operators.drift import feature_drift_report

    a = spark.range(300).select(
        (F.col("id") * 1.7 % 13).alias("v"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    b = spark.range(260).select(
        (F.col("id") * 0.9 % 11).alias("v"),
        (F.col("id") % 4).cast("string").alias("g"),
    )
    legacy = feature_drift_report(a, b, ["v"]).first()
    mixed = {
        r["column"]: r
        for r in feature_drift_report(
            a, b, ["v"], categorical_columns=["g"]
        ).collect()
    }
    assert set(mixed) == {"v", "g"}
    # approx, not ==: the two panels are separate Spark executions and
    # float-sum order depends on partitioning/AQE state (observed last-ULP
    # flake on ad_a2: 7.6781630550512725 vs ...276)
    for s in ("ks_d", "u_stat", "z_score", "cvm_t", "ad_a2"):
        assert mixed["v"][s] == pytest.approx(legacy[s], rel=1e-9)
        assert mixed["g"][s] is None
    for s in ("psi", "jsd", "chi2"):
        assert mixed["v"][s] is None
        assert mixed["g"][s] is not None


def test_feature_drift_report_binned_scale_path(spark):
    """feature_drift_report(bins=) — the 100 TB path — must equal the
    standalone binned operators per column under the same per-column
    (lo, hi): the broadcast-joined bucket expression replays _bucket's
    exact IEEE sequence. Constant columns collapse to bucket 0 (NULL
    stats via the one-sided/zero-variance conventions, not a crash);
    frozen `bounds=` overrides the auto min/max pass."""
    from dataquality_ml_spark.operators.drift import (
        cvm_statistic,
        drift_panel,
        feature_drift_report,
        ks_statistic,
    )

    a = spark.range(2500).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.sin(F.col("id").cast("double")) * 40).alias("y"),
        F.lit(5.0).alias("const"),
    )
    b = spark.range(2000).select(
        ((F.col("id") * 3) % 113).cast("double").alias("x"),
        (F.cos(F.col("id").cast("double")) * 35 + 10).alias("y"),
        F.lit(5.0).alias("const"),
    )
    cols = ["x", "y", "const"]
    got = {
        r["column"]: r
        for r in feature_drift_report(a, b, cols, bins=32).collect()
    }
    # per-column bounds the report derived (union min/max)
    both = a.unionByName(b)
    for c in ("x", "y"):
        lohi = both.agg(F.min(c), F.max(c)).first()
        lo, hi = float(lohi[0]), float(lohi[1])
        want_ks = ks_statistic(a, b, c, bins=32, lo=lo, hi=hi).first()["ks_d"]
        want_cvm = cvm_statistic(a, b, c, bins=32, lo=lo, hi=hi).first()["cvm_t"]
        # ks_d reduces integer counts through max (order-free) but the
        # panels are separate executions — keep approx for the float sums
        assert got[c]["ks_d"] == pytest.approx(want_ks, rel=1e-9), c
        assert got[c]["cvm_t"] == pytest.approx(want_cvm, rel=1e-9), c
    # constant column: every row in bucket 0 on both sides — KS 0, and the
    # rank stats match the single-tied-value panel
    assert got["const"]["ks_d"] == 0.0
    assert got["const"]["n_a"] == 2500 and got["const"]["n_b"] == 2000
    # frozen bounds override the auto pass and change the quantizer
    got_fb = {
        r["column"]: r
        for r in feature_drift_report(
            a, b, ["x"], bins=32, bounds={"x": (0.0, 200.0)}
        ).collect()
    }
    want_fb = ks_statistic(a, b, "x", bins=32, lo=0.0, hi=200.0).first()["ks_d"]
    assert got_fb["x"]["ks_d"] == pytest.approx(want_fb, rel=1e-9)


def test_feature_drift_report_binned_drops_nulls(spark):
    """bins= must drop NULL feature values exactly like the exact path:
    a NULL v must not be quantized into bucket 0 (greatest() skips nulls,
    so an unguarded clamp would do that), and n_a/n_b must count only
    non-null rows. Regression for the binned-path null-inflation bug."""
    from dataquality_ml_spark.operators.drift import feature_drift_report

    base = spark.range(8).select((F.col("id") % 4).cast("double").alias("x"))
    with_nulls = base.unionByName(
        spark.range(8).select(F.lit(None).cast("double").alias("x"))
    )
    # identical distributions + extra nulls on one side: zero drift
    exact = feature_drift_report(with_nulls, base, ["x"]).first()
    binned = feature_drift_report(with_nulls, base, ["x"], bins=4).first()
    assert (exact["n_a"], exact["n_b"]) == (8, 8)
    assert (binned["n_a"], binned["n_b"]) == (8, 8)
    assert binned["ks_d"] == 0.0 and exact["ks_d"] == 0.0


def test_categorical_drift_report_keyed_matches_per_segment(spark):
    """keys= on categorical_drift_report == running the global report once
    per segment, including a NULL segment key; segments present on only
    one side still score (missing mass is drift)."""
    from dataquality_ml_spark.operators.drift import categorical_drift_report

    rows_a, rows_b = [], []
    for seg, n_x, n_y in (("s1", 40, 10), ("s2", 5, 45), (None, 12, 8)):
        rows_a += [(seg, "x")] * n_x + [(seg, "y")] * n_y
    for seg, n_x, n_y in (("s1", 10, 40), ("s2", 6, 44), (None, 4, 16)):
        rows_b += [(seg, "x")] * n_x + [(seg, "y")] * n_y
    rows_b += [("only_b", "x")] * 9
    a = spark.createDataFrame(rows_a, "seg string, c string")
    b = spark.createDataFrame(rows_b, "seg string, c string")

    keyed = {
        r["seg"]: r
        for r in categorical_drift_report(a, b, ["c"], keys=["seg"]).collect()
    }
    assert set(keyed) == {"s1", "s2", None, "only_b"}
    for seg in ("s1", "s2", None):
        want = categorical_drift_report(
            a.where(F.col("seg").eqNullSafe(F.lit(seg))),
            b.where(F.col("seg").eqNullSafe(F.lit(seg))),
            ["c"],
        ).first()
        got = keyed[seg]
        assert abs(got["psi"] - want["psi"]) < 1e-12, seg
        assert abs(got["jsd"] - want["jsd"]) < 1e-12, seg
        assert abs(got["chi2"] - want["chi2"]) < 1e-9, seg
        assert (got["n_a"], got["n_b"]) == (want["n_a"], want["n_b"]), seg
    # one-sided segment: ref side empty -> tot_r = 0; n_a records 0
    assert keyed["only_b"]["n_a"] == 0 and keyed["only_b"]["n_b"] == 9


def test_categorical_drift_report_max_categories_contract(spark):
    """Round 11 (VERDICT r10 item 6): the 'bounded pass' claim needs a
    cardinality guard — a high-cardinality column must FAIL LOUDLY by
    default, fold into top-K + __other__ with on_overflow='keep' (mass
    conserved), and run exact with max_categories=None."""
    from dataquality_ml_spark.operators.drift import categorical_drift_report

    a = spark.range(200).select(
        F.concat(F.lit("u"), F.col("id")).alias("c")  # 200 distinct
    )
    b = spark.range(150).select(F.concat(F.lit("u"), F.col("id") * 2).alias("c"))
    with pytest.raises(ValueError, match="distinct categories"):
        categorical_drift_report(a, b, ["c"], max_categories=50).collect()
    with pytest.raises(ValueError, match="on_overflow"):
        categorical_drift_report(a, b, ["c"], on_overflow="warn")
    # keep: top-K + __other__, n_a/n_b conserve total mass
    kept = categorical_drift_report(
        a, b, ["c"], max_categories=50, on_overflow="keep"
    ).first()
    assert (kept["n_a"], kept["n_b"]) == (200, 150)
    assert kept["psi"] is not None and kept["chi2"] is not None
    # exact opt-out matches the uncapped default on a cool column
    low_a = spark.range(100).select((F.col("id") % 3).cast("string").alias("c"))
    low_b = spark.range(80).select((F.col("id") % 4).cast("string").alias("c"))
    exact = categorical_drift_report(low_a, low_b, ["c"], max_categories=None).first()
    default = categorical_drift_report(low_a, low_b, ["c"]).first()
    for s in ("psi", "jsd", "chi2"):
        assert exact[s] == pytest.approx(default[s], rel=1e-9)


def test_feature_drift_report_bounds_must_cover_all_columns(spark):
    """bounds= covering only some columns must raise (the bounds join
    would silently drop the uncovered columns' rows otherwise)."""
    from dataquality_ml_spark.operators.drift import feature_drift_report

    a = spark.range(50).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"),
    )
    with pytest.raises(ValueError, match="missing columns.*'y'"):
        feature_drift_report(a, a, ["x", "y"], bins=8, bounds={"x": (0.0, 50.0)})
