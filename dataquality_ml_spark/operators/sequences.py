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
