"""Scale-curve CI smoke (VERDICT r5 item 6 / r6 item 6): measure the
wall-clock scaling exponent α = log(t_4x / t_1x) / log(4) of the headline
corpus operators on synthetic corpora at 1× and 4× size, and assert each
stays clearly sublinear in measured cost.

This is the test that would have caught both registry scale-killers as
MEASUREMENTS instead of code-review findings: the pre-rewrite
simhash intra-class expansion measured α≈1.9 on a duplicate-saturated
corpus, and an unbounded unigram DP loop scales with max word length, not
corpus size — both now pinned here.

Methodology notes baked into the thresholds:
- Each op gets one warm-up run at 1× (JIT, codegen, shuffle-service
  spin-up), then the measured 1× and 4× runs.  Spark's fixed per-job
  overhead (~0.3-1 s) biases α DOWN at these sizes, so a LOW bound
  cannot prove linearity — but a quadratic blow-up still shows clearly
  (the simhash incident measured α≈1.9 at 10×).  The assert bound 1.25
  leaves noise headroom while failing hard on quadratic regressions.
- The corpora are deterministic expression-generated (no Python row
  loops): bounded vocab (so the word/vocab relations saturate — the
  property the tokenizer family's corpus-independence relies on), plus a
  20% identical-boilerplate class to saturate duplicate handling.
"""

from __future__ import annotations

import math
import time

import pytest
from pyspark.sql import functions as F

N1 = 1_500
FACTOR = 4
ALPHA_BOUND = 1.25


def _docs(spark, n: int):
    """Deterministic synthetic corpus: 18 words/doc from a 97-word vocab;
    every 5th doc is the same boilerplate line (duplicate saturation)."""
    boiler = "the same boilerplate header on every page of this site again"
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 5 == 0, F.lit(boiler))
            .otherwise(
                F.expr(
                    "array_join(transform(sequence(1, 18), "
                    "i -> concat('w', pmod(id * i + i * i, 97))), ' ')"
                )
            )
            .alias("text"),
        )
        .localCheckpoint(eager=True)  # generation cost off the clock
    )


def _measure(fn, df) -> float:
    t0 = time.monotonic()
    fn(df)
    return time.monotonic() - t0


def _alpha(spark, fn) -> float:
    d1, d4 = _docs(spark, N1), _docs(spark, N1 * FACTOR)
    _measure(fn, d1)  # warm-up
    t1 = max(_measure(fn, d1), 1e-3)
    t4 = max(_measure(fn, d4), 1e-3)
    return math.log(t4 / t1) / math.log(FACTOR)


@pytest.mark.parametrize(
    "name",
    [
        "simhash_hamming",
        "minhash_pairs",
        "unigram_em",
        "exact_dedup",
        "containment",
        "sorted_neighborhood",
    ],
)
def test_headliner_scale_exponent(spark, name):
    from dataquality_ml_spark.operators import dedup, unigram as ug

    if name == "sorted_neighborhood":
        # round 12: the exploded adjacent-bucket equi-join must stay
        # linear — the pre-fix OR-of-equalities CartesianProduct measures
        # α≈2 here, so this is the measurement that catches a revert
        fn = lambda df: dedup.sorted_neighborhood_multipass(  # noqa: E731
            df,
            [F.substring("text", 1, 16), F.substring("text", 17, 16)],
            window=4,
        ).count()
    elif name == "simhash_hamming":
        fn = lambda df: dedup.simhash_hamming_pairs(df, k=3).count()  # noqa: E731
    elif name == "containment":
        # stop-shingle cap engaged: the 20% boilerplate class would
        # otherwise produce a quadratic pair OUTPUT by construction
        fn = lambda df: dedup.ngram_containment_pairs(  # noqa: E731
            df, k=3, threshold=0.9, max_df=32
        ).count()
    elif name == "minhash_pairs":
        fn = lambda df: dedup.minhash_dedup_pairs(df).count()  # noqa: E731
    elif name == "exact_dedup":
        fn = lambda df: dedup.dedup_exact(df).count()  # noqa: E731
    else:

        def fn(df):
            wc = ug.word_counts(df).localCheckpoint(eager=False)
            srows = ug.seed_pieces(wc, 4, 24).collect()
            tot = sum(r["freq"] for r in srows)
            pdf = df.sparkSession.createDataFrame(
                [(r["piece"], r["freq"] / tot) for r in srows],
                "piece string, prob double",
            )
            ug.em_expected_counts(wc, pdf, 4).count()

    a = _alpha(spark, fn)
    assert a < ALPHA_BOUND, (
        f"{name}: scaling exponent α={a:.2f} at {FACTOR}× corpus size — "
        f"superlinear regression (bound {ALPHA_BOUND})"
    )


def test_value_deciles_scale_exponent(spark, tmp_path):
    """The decomposed global-NTILE query (salted rank + distributed
    prefix sum): must stay sublinear in measured cost at 4× rows under a
    heavy-hitter value distribution (one value holds 20% of rows)."""
    from dataquality_ml_spark.queries import value_deciles

    def mk(n, d):
        spark.range(n).select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 5 == 0, F.lit(7.0))
            .otherwise((F.col("id") % 2000).cast("double") / 16)
            .alias("value"),
        ).write.mode("overwrite").parquet(f"{tmp_path}/{d}/events.parquet")
        return f"{tmp_path}/{d}"

    p1, p4 = mk(20_000, "s1"), mk(80_000, "s4")
    value_deciles(spark, p1).collect()  # warm-up
    t1 = max(_measure(lambda _: value_deciles(spark, p1).collect(), None), 1e-3)
    t4 = max(_measure(lambda _: value_deciles(spark, p4).collect(), None), 1e-3)
    a = math.log(t4 / t1) / math.log(4)
    assert a < ALPHA_BOUND, f"value_deciles α={a:.2f}"


def test_pack_doc_boundary_scale_exponent(spark):
    """Blockwise greedy packing: bounded per-block tasks + two-level
    renumbering must stay sublinear in measured cost at 4× docs."""
    from dataquality_ml_spark.operators.packing import pack_doc_boundary

    def mk(n):
        return (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                (F.pmod(F.col("id") * 37 + 11, 90) + 10).alias("n_tokens"),
            )
            .localCheckpoint(eager=True)
        )

    d1, d4 = mk(10_000), mk(40_000)
    fn = lambda df: pack_doc_boundary(df, budget=256, block=512).count()  # noqa: E731
    fn(d1)  # warm-up
    t1 = max(_measure(fn, d1), 1e-3)
    t4 = max(_measure(fn, d4), 1e-3)
    a = math.log(t4 / t1) / math.log(4)
    assert a < ALPHA_BOUND, f"pack_doc_boundary α={a:.2f}"


def test_exact_quantiles_select_scale_exponent(spark):
    """Selection quantiles (VERDICT r8 item 7): ungrouped AND grouped
    (join-membership, >64 segments) must stay sublinear in measured cost
    at 4× rows, and the refinement depth — the driver-walk levels, which
    is what bounds driver state — must NOT grow with data size (it is
    log_bins(n / collect_limit), pinned here by construction: equal
    knob-forced depth at both sizes)."""
    from dataquality_ml_spark.operators import profile as prof

    def mk(n):
        return (
            spark.range(n)
            .select(
                F.concat(F.lit("g"), F.pmod(F.col("id"), 80)).alias("g"),
                (
                    F.sin(F.col("id").cast("double")) * 50.0
                    + (F.col("id") % 997).cast("double")
                ).alias("v"),
            )
            .localCheckpoint(eager=True)
        )

    d1, d4 = mk(30_000), mk(120_000)
    qs = [0.25, 0.5, 0.9]

    for label, kw in (
        ("ungrouped", {}),
        ("grouped-many", {"group_by": ["g"], "max_groups": 64}),
    ):
        fn = lambda df: prof.exact_quantiles_select(  # noqa: E731
            df, "v", qs, bins=64, collect_limit=2048, checkpoint=False, **kw
        )
        fn(d1)  # warm-up
        t1 = max(_measure(fn, d1), 1e-3)
        t4 = max(_measure(fn, d4), 1e-3)
        a = math.log(t4 / t1) / math.log(4)
        assert a < ALPHA_BOUND, f"exact_quantiles_select {label} α={a:.2f}"

    # constant driver-walk depth: count refinement levels via the
    # histogram walker — depth = ceil(log_bins(n / collect_limit)) levels
    # of count-row histograms, identical at 1× and 4× when the knobs hold
    # the ratio fixed (here both need ≤ 2 levels at bins=64)
    depths = []
    orig = prof._walk_hist
    for df in (d1, d4):
        calls = {"n": 0}

        def spy(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        prof._walk_hist = spy
        try:
            prof.exact_quantiles_select(
                df, "v", qs, group_by=["g"], max_groups=64,
                bins=64, collect_limit=64, checkpoint=False,
            )
        finally:
            prof._walk_hist = orig
        depths.append(calls["n"])
    # walker invocations grow with CHAIN count (targets×segments), never
    # with rows: 4× the rows must not add refinement work per chain
    assert depths[1] <= depths[0] * 2, depths


def test_weighted_quantiles_many_groups_scale_exponent(spark):
    """Round 10 (VERDICT r9 item 2): the weighted grouped selection past
    max_groups — the broadcast-JOIN membership engine with SUM(w) — must
    stay sublinear in measured cost at 4x rows across 80 segments, same
    gate as the unweighted join path."""
    from dataquality_ml_spark.operators import profile as prof

    def mk(n):
        return (
            spark.range(n)
            .select(
                F.concat(F.lit("g"), F.pmod(F.col("id"), 80)).alias("g"),
                (
                    F.sin(F.col("id").cast("double")) * 50.0
                    + (F.col("id") % 997).cast("double")
                ).alias("v"),
                (1 + F.pmod(F.col("id"), 9)).alias("w"),
            )
            .localCheckpoint(eager=True)
        )

    d1, d4 = mk(30_000), mk(120_000)
    qs = [0.25, 0.5, 0.9]
    fn = lambda df: prof.weighted_quantiles_select(  # noqa: E731
        df, "v", "w", qs, group_by=["g"], max_groups=64,
        bins=64, collect_limit=2048, checkpoint=False,
    )
    fn(d1)  # warm-up
    t1 = max(_measure(fn, d1), 1e-3)
    t4 = max(_measure(fn, d4), 1e-3)
    a = math.log(t4 / t1) / math.log(4)
    assert a < ALPHA_BOUND, f"weighted grouped-many α={a:.2f}"
