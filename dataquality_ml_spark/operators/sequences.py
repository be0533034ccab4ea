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
