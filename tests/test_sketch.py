"""Sketch family (operators/sketch.py): mergeability, estimator
properties, and the skew-proof plan shape.

The load-bearing claims: (1) every sketch merges associatively — that is
what makes it maintainable per-shard / per-micro-batch at 100 TB without
reprocessing; (2) count-min never undercounts; (3) KMV is exact below k
and deterministic above it; (4) the bottom-k window is salted two-level,
equal to the single-window definition, with no partition-less window
anywhere in the plan."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataquality_ml_spark.operators import sketch as sk


def _tokens_df(spark, n=3000, mod=200, prefix="tok"):
    """n rows over `mod` distinct skewed tokens (Zipf-ish via i % (i%mod+1))."""
    return spark.range(n).select(
        F.concat(F.lit(prefix), (F.col("id") % mod) % ((F.col("id") % 7) + 13))
        .cast("string")
        .alias("token"),
        (F.col("id") % 2).alias("half"),
    )


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(
        F.lit("g").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    out = sk.kmv_distinct(df, "v", ["g"], k=64).collect()
    assert len(out) == 1
    assert out[0]["n_kept"] == 40
    assert out[0]["est_distinct"] == 40.0


def test_kmv_estimate_within_theory_bound(spark):
    # 2,000 distinct values, k=64: expected rel error ~ 1/sqrt(k-2) ≈ 0.13;
    # assert a loose 3-sigma-ish bound so the test is not a coin flip.
    df = spark.range(2000).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    est = sk.kmv_distinct(df, "v", (), k=64).collect()[0]["est_distinct"]
    assert abs(est - 2000) / 2000 < 0.4


def test_kmv_sketch_merges(spark):
    """KMV(A ∪ B) == bottom-k of (KMV(A) ∪ KMV(B)) — shard-maintainable."""
    df = _tokens_df(spark)
    whole = sk.kmv_sketch(df, "token", (), k=16).select("kmv_h")
    parts = [
        sk.kmv_sketch(df.filter(F.col("half") == h), "token", (), k=16).select("kmv_h")
        for h in (0, 1)
    ]
    merged = sk._bottomk(parts[0].unionByName(parts[1]).distinct(), [], "kmv_h", 16)
    assert sorted(r["kmv_h"] for r in whole.collect()) == sorted(
        r["kmv_h"] for r in merged.select("kmv_h").collect()
    )


def test_cms_never_undercounts_and_is_tight_here(spark):
    df = _tokens_df(spark)
    exact = {r["token"]: r["n"] for r in df.groupBy("token").agg(F.count("*").alias("n")).collect()}
    sketch = sk.cms_build(df, "token", width=256, depth=4)
    est = {
        r["token"]: r["est_count"]
        for r in sk.cms_estimate(sketch, df.select("token"), "token", 256, 4).collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert est[t] >= n  # CMS one-sided error guarantee
    # with 13 distinct tokens in 256 buckets collisions are rare: most exact
    assert sum(est[t] == n for t, n in exact.items()) >= len(exact) - 2


def test_cms_merge_equals_whole(spark):
    df = _tokens_df(spark)
    whole = sk.cms_build(df, "token", width=128, depth=3)
    a = sk.cms_build(df.filter(F.col("half") == 0), "token", width=128, depth=3)
    b = sk.cms_build(df.filter(F.col("half") == 1), "token", width=128, depth=3)
    merged = sk.cms_merge(a, b)
    key = lambda r: (r["cms_depth"], r["cms_bucket"], r["cms_cnt"])  # noqa: E731
    assert sorted(map(key, whole.collect())) == sorted(map(key, merged.collect()))


def test_cms_sketch_is_bounded(spark):
    df = _tokens_df(spark, n=5000)
    assert sk.cms_build(df, "token", width=64, depth=2).count() <= 128


def test_reservoir_exact_k_and_matches_single_window(spark):
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("doc_id")
    )
    got = sk.reservoir_sample(df, k=7, group_cols=["g"], id_col="doc_id")
    counts = {r["g"]: r["n"] for r in got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 7, "1": 7, "2": 7}
    # reference: the unsalted single-window definition
    from dataquality_ml_spark.functions.scalar import portable_hash60

    h = portable_hash60(F.concat_ws("|", F.lit("res"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("g").orderBy(F.col("res_h").asc(), F.col("doc_id").asc())
    want = (
        df.withColumn("res_h", h)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 7)
    )
    assert sorted((r["g"], r["doc_id"]) for r in got.collect()) == sorted(
        (r["g"], r["doc_id"]) for r in want.collect()
    )
    # small groups: keep all n when n < k
    tiny = df.filter(F.col("doc_id") < 4)
    assert sk.reservoir_sample(tiny, k=7, group_cols=["g"], id_col="doc_id").count() == 4


def test_bottomk_plan_has_no_partitionless_window(spark):
    """Both window passes carry a partition spec — a dominant group can
    never funnel through a single task (the level-1 salt splits it)."""
    import re

    from dataquality_ml_spark import plans

    df = spark.range(1000).select(
        F.lit("one_group").alias("g"), F.col("id").alias("doc_id")
    )
    out = sk.reservoir_sample(df, k=5, group_cols=["g"], id_col="doc_id")
    plan = plans.formatted_plan(out)
    for m in re.finditer(r"Window \[(.*)\]", plan):
        spec = m.group(1)
        assert "windowspecdefinition(" in spec
        inner = spec.split("windowspecdefinition(", 1)[1]
        # first argument of the spec must be a partition column, not an
        # ordering (orderings carry ASC/DESC markers immediately)
        first_arg = inner.split(",", 1)[0]
        assert "ASC" not in first_arg and "DESC" not in first_arg, plan


# ---------------------------------------------------------------------------
# sessionize (operators/sequences.py) — semantics + one-shuffle plan
# ---------------------------------------------------------------------------


def test_sessionize_gap_semantics_and_single_exchange(spark):
    import re

    from dataquality_ml_spark import plans
    from dataquality_ml_spark.operators.sequences import session_stats, sessionize

    rows = [
        # user a: events at t=0, 100, 2000 (gap>1800 → new session), 2100
        ("a", 1, 0.0, 1.0),
        ("a", 2, 100.0, 2.0),
        ("a", 3, 2000.0, 3.0),
        ("a", 4, 2100.0, 4.0),
        # user b: one event
        ("b", 5, 50.0, 5.0),
    ]
    df = spark.createDataFrame(
        [(u, i, __import__("datetime").datetime.fromtimestamp(t, __import__("datetime").timezone.utc), v) for u, i, t, v in rows],
        "user_id string, event_id bigint, ts timestamp, value double",
    )
    sess = sessionize(df, key="user_id", order="ts", max_gap_seconds=1800.0)
    got = {(r["user_id"], r["event_id"]): r["session_seq"] for r in sess.collect()}
    assert got == {("a", 1): 1, ("a", 2): 1, ("a", 3): 2, ("a", 4): 2, ("b", 5): 1}

    stats = session_stats(sess, key="user_id", order="ts", value="value").collect()
    by = {(r["user_id"], r["session_seq"]): r for r in stats}
    assert by[("a", 1)]["n_events"] == 2 and by[("a", 1)]["duration_s"] == 100.0
    assert by[("a", 2)]["sum_value"] == 7.0
    assert by[("b", 1)]["n_events"] == 1 and by[("b", 1)]["duration_s"] == 0.0

    # both analytic windows + the rollup share ONE hash exchange on user_id
    # (formatted plans print each op as "(n) Exchange" in the detail section)
    plan = plans.formatted_plan(session_stats(sess))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan


# ---------------------------------------------------------------------------
# Pairwise Jaccard from KMV sketches (bottom-k union trick)
# ---------------------------------------------------------------------------


def test_kmv_jaccard_exact_below_k(spark):
    # A = 0..29, B = 20..49 → |A∩B| = 10, |A∪B| = 50 < k → exact
    rows = [("a", f"v{i}") for i in range(30)] + [("b", f"v{i}") for i in range(20, 50)]
    df = spark.createDataFrame(rows, "source string, v string")
    sks = sk.kmv_sketch(df, "v", ["source"], k=64)
    out = sk.kmv_pairwise_jaccard(sks, "source", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    assert r["n_union_kept"] == 50 and r["n_both"] == 10
    assert r["jaccard_est"] == 0.2
    assert r["est_union"] == 50.0
    assert r["est_overlap"] == 10.0


def test_kmv_jaccard_estimate_large(spark):
    # A = 0..999, B = 500..1499 → J = 500/1500 = 1/3, union = 1500
    rows = [("a", f"t{i}") for i in range(1000)] + [
        ("b", f"t{i}") for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "source string, v string")
    sks = sk.kmv_sketch(df, "v", ["source"], k=64)
    r = sk.kmv_pairwise_jaccard(sks, "source", k=64).collect()[0]
    # σ(J) = sqrt(J(1-J)/k) ≈ 0.059 at k=64 — allow ~2.5σ
    assert abs(r["jaccard_est"] - 1 / 3) < 0.15
    assert abs(r["est_union"] - 1500) / 1500 < 0.35
    assert r["n_union_kept"] == 64


def test_kmv_jaccard_all_pairs_present(spark):
    rows = [(f"s{g}", f"w{g}_{i}") for g in range(4) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, v string")
    sks = sk.kmv_sketch(df, "v", ["source"], k=16)
    out = sk.kmv_pairwise_jaccard(sks, "source", k=16).collect()
    got = {(r["src_a"], r["src_b"]) for r in out}
    assert got == {(f"s{i}", f"s{j}") for i in range(4) for j in range(i + 1, 4)}
    assert all(r["jaccard_est"] == 0.0 for r in out)  # disjoint vocabularies


# ---------------------------------------------------------------------------
# HLL (Spark builtin DataSketches) — accuracy + shard-merge contracts
# ---------------------------------------------------------------------------


def test_hll_accuracy_and_union_merge(spark):
    df = spark.range(5000).select(
        (F.col("id") % 2).alias("half"),
        F.concat(F.lit("u"), F.col("id")).alias("v"),
    )
    est = sk.hll_distinct(df, "v", (), lgk=12).collect()[0]["est_hll"]
    assert abs(est - 5000) / 5000 < 0.05  # ~1.6% expected at lgk=12

    # shard-merge: union of per-half sketches estimates the same corpus
    shards = sk.hll_sketch_by_group(
        df.withColumn("g", F.lit("all")), "v", ["g", "half"], lgk=12
    ).drop("half")
    merged = sk.hll_union_estimate(shards, ["g"]).collect()[0]["est_hll"]
    assert abs(merged - 5000) / 5000 < 0.05
    # halves overlap zero → merged ≈ whole-corpus estimate
    assert abs(merged - est) / 5000 < 0.02


def test_hll_exactish_small(spark):
    df = spark.range(50).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    est = sk.hll_distinct(df, "v", (), lgk=12).collect()[0]["est_hll"]
    assert est == 50  # sparse mode is exact at tiny cardinalities


# ---------------------------------------------------------------------------
# Fixed-bin quantile sketch (round 8)
# ---------------------------------------------------------------------------
def test_qsketch_merge_equals_whole_and_accuracy(spark):
    """merge(shard sketches) must EQUAL the single-pass build (integer bin
    counts, the family contract), and quantile estimates must sit within
    one bin width of the exact percentile."""
    from dataquality_ml_spark.operators import sketch as sk

    df = spark.range(20000).select(
        ((F.col("id") * 7919) % 1000 / 2.0).alias("v")
    )
    LO, HI, BINS = 0.0, 500.0, 250  # bin width 2.0
    whole = sk.qsketch_build(df, "v", LO, HI, bins=BINS)
    h1 = sk.qsketch_build(df.where(F.col("id") % 3 == 0), "v", LO, HI, bins=BINS)
    h2 = sk.qsketch_build(df.where(F.col("id") % 3 != 0), "v", LO, HI, bins=BINS)
    merged = sk.qsketch_merge(h1, h2)
    w = {r["qs_bin"]: r["qs_cnt"] for r in whole.collect()}
    m = {r["qs_bin"]: r["qs_cnt"] for r in merged.collect()}
    assert w == m  # exact, not approximate

    qs = [0.25, 0.5, 0.9, 0.99]
    est = {
        r["q"]: r["est"]
        for r in sk.qsketch_quantiles(whole, qs, LO, HI, bins=BINS).collect()
    }
    exact = df.agg(
        F.expr(f"percentile(v, array({', '.join(map(str, qs))}))")
    ).first()[0]
    for q, ex in zip(qs, exact):
        assert abs(est[q] - ex) <= 2.0 + 1e-9, (q, est[q], ex)


def test_qsketch_grouped_and_out_of_range_clamp(spark):
    """Per-group sketches share the frozen quantizer; out-of-range values
    clamp into terminal bins (drift stays countable)."""
    from dataquality_ml_spark.operators import sketch as sk

    rows = [("a", float(v)) for v in range(100)] + [
        ("b", float(v) + 1000.0) for v in range(50)  # entirely above range
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    s = sk.qsketch_build(df, "v", 0.0, 100.0, bins=10, group_cols=["g"])
    by = {(r["g"], r["qs_bin"]): r["qs_cnt"] for r in s.collect()}
    assert by[("b", 9)] == 50  # all clamped into the terminal bin
    assert sum(c for (g, _), c in by.items() if g == "a") == 100

    est = {
        r["g"]: r["est"]
        for r in sk.qsketch_quantiles(
            s, [0.5], 0.0, 100.0, bins=10, group_cols=["g"]
        ).collect()
    }
    assert abs(est["a"] - 50.0) <= 10.0
    # clamped mass interpolates uniformly inside the terminal bin
    # (median of 50 rows all in bin 9 -> 10*(9 + 25/50) = 95); the drift
    # SIGNAL is the terminal-bin count asserted above, not the estimate
    assert est["b"] == 95.0


def test_qsketch_build_excludes_nan(spark):
    """NaN must be EXCLUDED from the sketch population (floor(NaN) casts
    to 0 in Spark, so before round 9 NaNs piled into bin 0 and skewed
    every quantile low) — same valid-value contract as profile._valid
    and exact_quantiles_*."""
    import math

    from dataquality_ml_spark.operators import sketch as sk

    rows = [(float(i % 10),) for i in range(100)] + [(float("nan"),)] * 50 + [(None,)] * 7
    df = spark.createDataFrame(rows, "v double")
    hist = {r["qs_bin"]: r["qs_cnt"] for r in sk.qsketch_build(df, "v", 0.0, 10.0, bins=10).collect()}
    assert sum(hist.values()) == 100, "NaN/null leaked into the sketch"
    assert hist[0] == 10  # ten 0.0s, not 60 (10 + 50 NaN)
    assert not any(math.isnan(float(b)) for b in hist)
