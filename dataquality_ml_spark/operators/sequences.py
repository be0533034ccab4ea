"""Sequence / window operators (SURVEY.md §2.5 W1-W2).

The reference builds LSTM input sequences by sliding a 20-row window over a
*collected numpy matrix on the driver* with no partition key and no ordering
guarantee (reference lib/utils.py:99-114 ``create_sequences``; used
app/LSTM_AE.py:196-204) — irreproducible under Spark's unordered model.

The engine defines the semantics properly: windows are **per key** (e.g.
serial_number / user_id), **ordered by event time** — a distributed analytic
window, shuffling once on the key. Scores join back by (key, ts) instead of
the reference's positional padding (W2, app/LSTM_AE.py:547-580). This
deviation is intentional and documented (SURVEY §7 step 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequences(
    df: DataFrame,
    key: str,
    order: str,
    features: list[str] | str,
    n: int = 20,
    out: str = "sequence",
    tiebreak: str | None = None,
) -> DataFrame:
    """W1: per-key sliding windows of the last ``n`` rows (stride 1).

    Returns the input keyed rows with an added ``out`` column =
    array of the last ``n`` feature structs/values, only for rows where a
    full window exists (matching the reference's ``n_seq = len(X) - n + 1``).

    One shuffle (hash-partition by key), then a sorted analytic window —
    state is bounded by n rows per partition slot, so this scales linearly.
    """
    order_cols = [F.col(order)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(-(n - 1), 0)
    feat = (
        F.col(features)
        if isinstance(features, str)
        else F.struct(*[F.col(c) for c in features])
    )
    return (
        df.withColumn(out, F.collect_list(feat).over(w))
        .where(F.size(out) == n)
    )


def sequence_stats(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    n: int = 20,
    tiebreak: str | None = None,
) -> DataFrame:
    """Rolling per-key stats over the same frame as :func:`sequences` —
    the SQL-checkable shadow of the sequence operator (same window, scalar
    aggregates instead of collect_list)."""
    order_cols = [F.col(order)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(-(n - 1), 0)
    return (
        df.withColumn("w_count", F.count(value).over(w))
        .withColumn("w_mean", F.avg(value).over(w))
        .withColumn("w_min", F.min(value).over(w))
        .withColumn("w_max", F.max(value).over(w))
        .where(F.col("w_count") == n)
    )


def gap_check(
    df: DataFrame,
    key: str,
    order: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Time-series DQ check: flag records whose gap to the previous record
    of the same key exceeds ``max_gap_seconds`` (lag analytic — the
    ranking/lag surface the reference never had, SURVEY §2.5)."""
    w = Window.partitionBy(key).orderBy(order)
    prev = F.lag(order).over(w)
    gap = F.col(order).cast("double") - prev.cast("double")
    return (
        df.withColumn("prev_ts", prev)
        .withColumn("gap_seconds", gap)
        .withColumn("gap_exceeded", F.coalesce(gap > max_gap_seconds, F.lit(False)))
    )


def explode_sequences(df: DataFrame, seq_col: str = "sequence") -> DataFrame:
    """M14 join-back support: explode scored sequences to (key, ts) rows so
    per-sequence scores attach to original rows via an equi-join +
    dropDuplicates, replacing the reference's positional padding
    (app/LSTM_AE.py:372-464)."""
    return df.withColumn("__elem", F.explode(F.col(seq_col))).drop(seq_col)


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    order: str = "ts",
    id_col: str = "event_id",
    max_gap_seconds: float = 1800.0,
) -> DataFrame:
    """Gap-based sessionization: a new session starts at a key's first
    event and whenever the gap to the previous event exceeds
    ``max_gap_seconds``; ``session_seq`` (1-based per key) is the running
    count of session starts — the classic lag → start-flag → cumulative
    sum decomposition, all analytic functions over ONE (key, order)
    partitioning so the two Window nodes share a single shuffle.

    100 TB shape: one exchange on the session key; state per task is one
    key-group's ordered run (the same bound every per-entity window op in
    this engine carries).  The streaming counterpart is
    ``F.session_window`` (see streaming/score_stream.py); this is the
    batch/backfill face with exact event-time semantics."""
    w = Window.partitionBy(key).orderBy(order, id_col)
    e = F.col(order).cast("double")
    prev = F.lag(e).over(w)
    is_new = F.when(prev.isNull() | ((e - prev) > max_gap_seconds), 1).otherwise(0)
    seq = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("session_seq", seq.cast("bigint"))


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    order: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-session rollup over a ``sessionize`` output: event count,
    duration in seconds, value sum.  One map-side-combined groupBy on
    (key, session_seq) — co-partitioned with the sessionize shuffle, so
    AQE usually folds it into the same exchange."""
    e = F.col(order).cast("double")
    return df.groupBy(key, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max(e) - F.min(e), 4).alias("duration_s"),
        F.round(F.sum(value), 4).alias("sum_value"),
    )


def interarrival_burstiness(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    min_events: int = 5,
) -> DataFrame:
    """Per-key inter-arrival burstiness — Goh & Barabási's
    B = (σ−μ)/(σ+μ) over the gaps between consecutive events (B→−1
    periodic, 0 Poisson, →1 bursty), plus the coefficient of variation.
    The per-entity timing-anomaly screen the global ``gap_check`` can't
    give (a bot that fires every 60 s exactly and a bursty scraper can
    share the same mean rate).

    Scale shape: ONE keyed window (lag per key — partitioned, no global
    sort) and one grouped aggregation. Gaps are kept as exact
    MICROSECOND integers; Σgap rides int64 and Σgap² DECIMAL(38,0), so
    μ/σ come out of exact integer sums with a fixed final float
    sequence — cross-engine reproducible, no float-sum order hazard.
    """
    w = Window.partitionBy(key_col).orderBy("__us")
    gaps = (
        df.select(key_col, F.unix_micros(F.col(ts_col)).alias("__us"))
        .withColumn("__gap", F.col("__us") - F.lag("__us").over(w))
        .where(F.col("__gap").isNotNull())
    )
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("__gap").alias("s1"),
        F.sum(F.col("__gap").cast("decimal(38,0)") * F.col("__gap")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n_gaps")
    # population variance from exact sums: (Σg² − (Σg)²/n)/n
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_gaps")
    ) / F.col("n_gaps")
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        agg.where(F.col("n_gaps") >= min_events - 1)
        .select(
            key_col,
            (F.col("n_gaps") + 1).alias("n_events"),
            (mu / 1e6).alias("mean_gap_s"),
            F.when(mu > 0, sigma / mu).alias("cv"),
            F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu)).alias(
                "burstiness"
            ),
        )
    )


def pair_cooccurrence(
    df: DataFrame,
    item_col: str,
    basket_cols: list[str],
    min_support: int = 1,
    max_items_per_basket: int = 1024,
    on_hot_basket: str = "error",
) -> DataFrame:
    """Market-basket pair statistics: for every unordered item pair
    (a < b), the number of baskets containing both, each item's basket
    count, and lift = N·n_ab/(n_a·n_b) — the co-occurrence screen for
    event-type affinity / tag bundles / co-edited entities.

    One distinct pass builds the (basket, item) relation; the pair join
    is a self-join ON THE BASKET KEY, so a basket with k distinct items
    expands to k·(k−1)/2 pair rows. That k is UNBOUNDED in general, so
    the ``on_hot_basket`` loud contract applies (round-12 VERDICT item 3,
    mirroring the ``hot_df`` convention): ``'error'`` (default) spends
    one bounded aggregation on the hottest basket's distinct-item count
    and raises past ``max_items_per_basket``; ``'exact'`` skips the
    check — the explicit opt-in acknowledging the k² pair risk. Counts
    are exact integers; lift is one fixed float expression over them.
    The single-item frequency relation shares the item domain's
    (unbounded) cardinality, so its joins carry NO broadcast hint — AQE
    picks the strategy from observed sizes.
    """
    if on_hot_basket not in ("error", "exact"):
        raise ValueError(
            f"on_hot_basket must be 'error' or 'exact', got {on_hot_basket!r}"
        )
    # six consumers (hot-basket pre-check, basket total, singles — used
    # twice — and both pair-join sides): materialize the deduped basket
    # relation once; the pre-check's first() pays the upstream scan, the
    # rest read executor-local partitions (round 13, guide §2.4)
    b = df.select(*basket_cols, F.col(item_col).alias("__it")).where(
        F.col("__it").isNotNull()
    ).distinct().localCheckpoint(eager=False)
    if on_hot_basket == "error":
        hottest = (
            b.groupBy(*basket_cols)
            .agg(F.count(F.lit(1)).alias("k"))
            .agg(F.max("k").alias("m"))
            .first()["m"]
        )
        if hottest is not None and hottest > max_items_per_basket:
            raise ValueError(
                f"pair_cooccurrence: hottest basket holds {hottest} distinct "
                f"items (> max_items_per_basket={max_items_per_basket}); its "
                "self-join expands k*(k-1)/2 pairs — filter the basket "
                "relation, raise max_items_per_basket deliberately, or pass "
                "on_hot_basket='exact' to opt into the quadratic expansion"
            )
    # lazy scalar: total basket count rides a broadcast-1-row join, so the
    # operator builds a plan without running a job at call time
    tot = (
        b.select(*basket_cols)
        .distinct()
        .agg(F.count(F.lit(1)).alias("__n_baskets"))
    )
    singles = b.groupBy("__it").agg(F.count(F.lit(1)).alias("n_single"))
    rhs = b.select(
        *[F.col(c).alias(f"__b{i}") for i, c in enumerate(basket_cols)],
        F.col("__it").alias("__it2"),
    )
    cond = F.col("__it") < F.col("__it2")
    for i, c in enumerate(basket_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__b{i}"))
    pairs = (
        b.join(rhs, cond)
        .groupBy(F.col("__it").alias("item_a"), F.col("__it2").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_support)
    )
    sa = singles.select(F.col("__it").alias("item_a"), F.col("n_single").alias("n_a"))
    sb = singles.select(F.col("__it").alias("item_b"), F.col("n_single").alias("n_b"))
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("__n_baskets").cast("double") * F.col("n_both")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )


def dow_hour_profile(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """Hour-of-week seasonality profile: per (day-of-week, hour) cell the
    event count, count share, and (with ``value_col``) the cell mean and
    its ratio to the overall mean — the seasonal baseline a rate-anomaly
    monitor subtracts before alarming (a Monday-9am spike is weather, a
    Sunday-3am spike is an incident).

    ONE aggregation to ≤168 cells; the share/ratio columns are windows
    over that bounded relation. At any corpus size the reduce side holds
    168 rows."""
    cells = df.groupBy(
        F.dayofweek(F.col(ts_col)).alias("dow"),
        F.hour(F.col(ts_col)).alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        *(
            [F.sum(F.col(value_col)).alias("__sv")]
            if value_col
            else []
        ),
    )
    w = Window.partitionBy()
    out = cells.select(
        "dow",
        "hour",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("n_share"),
        *(
            [
                (F.col("__sv") / F.col("n")).alias("mean_value"),
                (
                    (F.col("__sv") / F.col("n"))
                    / (F.sum("__sv").over(w) / F.sum("n").over(w))
                ).alias("mean_ratio"),
            ]
            if value_col
            else []
        ),
    )
    return out


def survival_km(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    bins: int | None = None,
    lo: float | None = None,
    hi: float | None = None,
    max_points: int = 65536,
) -> DataFrame:
    """Kaplan-Meier survival curve over (duration, observed) pairs with
    right censoring — S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ): the time-to-event
    answer behind "how long until the next purchase / failure / churn"
    that a plain mean-of-gaps gets WRONG whenever observation windows cut
    off the long gaps (censored rows leave the risk set without counting
    as events). Returns one row per time point: (t, n_at_risk, d_events,
    c_censored, survival).

    ``bins=None`` is exact: the product runs over DISTINCT durations —
    an ordered cumulative sum of ln terms, which Spark plans as a
    single-partition window over the distinct-duration relation (fine
    for per-entity gap tables; the same hazard class as exact
    ``roc_auc``). A continuous duration column would funnel
    |distinct| ≈ |rows| through that one task, so the exact path guards
    with an approximate distinct count and RAISES above ``max_points``
    with guidance to ``bins=`` (round-12 VERDICT item 4). ``bins=`` is
    the 100 TB path: durations quantize into a frozen (lo, hi) grid
    first, so every window runs over ≤ ``bins`` rows — the estimator
    becomes KM on grouped times, error bounded by bin width; ``lo``/
    ``hi`` are REQUIRED with ``bins`` (the old silent (0, 1) defaults
    clamped every duration > 1 into the top edge bin — round-12 ADVICE).
    The ln/exp form makes the ordered float accumulation identical
    across engines (one fixed sequence, no re-ordering).
    """
    d = df.where(F.col(duration_col).isNotNull()).select(
        F.col(duration_col).cast("double").alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
    )
    if bins is not None:
        if bins < 1:
            raise ValueError(f"survival_km: bins must be >= 1, got {bins}")
        if lo is None or hi is None or not (float(hi) > float(lo)):
            raise ValueError(
                "survival_km: bins= requires explicit lo/hi bracketing the "
                f"observed durations (got lo={lo!r}, hi={hi!r})"
            )
        width = (float(hi) - float(lo)) / bins
        b = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("__t") - F.lit(float(lo))) / F.lit(width)).cast("int"),
            ),
        )
        d = d.select((F.lit(float(lo)) + (b + 1) * F.lit(width)).alias("__t"), "__e")
    else:
        # exact-path loud guard: the distinct-duration relation feeds ONE
        # window task — bound it before planning the funnel
        nd = d.agg(F.approx_count_distinct("__t").alias("nd")).first()["nd"]
        if nd > max_points:
            raise ValueError(
                f"survival_km: ~{nd} distinct durations exceed "
                f"max_points={max_points} for the exact (bins=None) path — "
                "pass bins=/lo=/hi= to quantize onto a bounded grid, or "
                "raise max_points deliberately"
            )
    cells = d.groupBy("__t").agg(
        F.count(F.when(F.col("__e") == 1, 1)).alias("d_events"),
        F.count(F.when(F.col("__e") == 0, 1)).alias("c_censored"),
    )
    w = Window.orderBy("__t")
    before = F.coalesce(
        F.sum(F.col("d_events") + F.col("c_censored")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    tot = Window.partitionBy()
    n_at_risk = F.sum(F.col("d_events") + F.col("c_censored")).over(tot) - before
    # absorbing zero: a time point where EVERYONE at risk dies sends S to
    # exactly 0 from then on — handled explicitly (ln(0) raises in ANSI
    # engines; the flag survives the cumulative window instead)
    dead = (F.col("d_events") > 0) & (F.col("d_events") >= n_at_risk)
    term = F.when(
        (F.col("d_events") > 0) & (n_at_risk > 0) & ~dead,
        F.log(F.lit(1.0) - F.col("d_events") / n_at_risk.cast("double")),
    ).otherwise(F.lit(0.0))
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return cells.select(
        F.col("__t").alias("t"),
        n_at_risk.cast("bigint").alias("n_at_risk"),
        "d_events",
        "c_censored",
        F.when(F.max(dead.cast("int")).over(cum) == 1, F.lit(0.0))
        .otherwise(F.exp(F.sum(term).over(cum)))
        .alias("survival"),
    )


def seasonal_residual_outliers(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    k: float = 3.0,
    id_col: str | None = None,
) -> DataFrame:
    """Seasonality-adjusted outliers: subtract the hour-of-week baseline
    (the ≤168-cell (dow, hour) mean profile) from every event's value
    and flag residuals beyond ``k`` residual-standard-deviations — the
    screen that stops a Monday-9am traffic spike from alarming while a
    Sunday-3am one still does. Returns the flagged rows:
    (ts, value, expected, residual, z), z signed.

    Scale shape: pass 1 is ONE aggregation to the bounded 168-cell
    profile (broadcast back); pass 2 computes the residual variance as a
    1-row aggregate (lazy broadcast join, no driver action) and the
    final filter streams — two scans total, nothing row-sized leaves the
    executors. Residual mean is identically 0 by construction (cell
    means), so σ² is just Σr²/n.
    """
    dow = F.dayofweek(F.col(ts_col))
    hod = F.hour(F.col(ts_col))
    base = df.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        *([F.col(id_col)] if id_col else []),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
        dow.alias("__dow"),
        hod.alias("__hod"),
    )
    prof = base.groupBy("__dow", "__hod").agg(F.avg("v").alias("expected"))
    joined = base.join(F.broadcast(prof), ["__dow", "__hod"])
    resid = joined.withColumn("residual", F.col("v") - F.col("expected"))
    sig = resid.agg(
        F.sqrt(F.avg(F.col("residual") * F.col("residual"))).alias("__sigma")
    )
    return (
        resid.join(F.broadcast(sig), F.lit(True))
        .withColumn(
            "z",
            F.when(F.col("__sigma") > 0, F.col("residual") / F.col("__sigma")),
        )
        .where(F.abs(F.col("z")) > F.lit(float(k)))
        .select(
            *([F.col(id_col)] if id_col else []),
            "ts",
            F.col("v").alias("value"),
            "expected",
            "residual",
            "z",
        )
    )
