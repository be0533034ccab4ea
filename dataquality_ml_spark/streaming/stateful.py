"""Custom stateful streaming operator (SURVEY.md §2.9 extension):
per-key running anomaly detection via ``applyInPandasWithState``.

Keeps an exponentially-weighted mean/variance per key (Welford-style EW
update) and flags arriving values whose deviation exceeds ``z_threshold``
sigmas — the streaming analog of the batch z-score operator, with O(1)
state per key (bounded memory regardless of stream length; GroupState TTL
handles key expiry).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("mean", DoubleType()),
        StructField("var", DoubleType()),
        StructField("n", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("ew_mean", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)


def make_ew_anomaly_fn(alpha: float = 0.1, z_threshold: float = 3.0, min_n: int = 5):
    """Build the per-group update function: emits rows whose EW z-score
    exceeds the threshold (after a warm-up of ``min_n`` observations)."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            mean, var, n = state.get
        else:
            mean, var, n = 0.0, 1.0, 0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("event_id")
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                v = float(v)
                if n >= min_n:
                    sd = max(var, 1e-12) ** 0.5
                    z = (v - mean) / sd
                    if abs(z) > z_threshold:
                        out_rows.append((key[0], int(eid), v, mean, z))
                # EW update AFTER scoring (prequential: never score a value
                # against state that already includes it)
                if n == 0:
                    mean, var = v, 1.0
                else:
                    delta = v - mean
                    mean = mean + alpha * delta
                    var = (1 - alpha) * (var + alpha * delta * delta)
                n += 1
        state.update((mean, var, n))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["key", "event_id", "value", "ew_mean", "zscore"]
            )

    return update


def ew_anomaly_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    alpha: float = 0.1,
    z_threshold: float = 3.0,
    min_n: int = 5,
) -> DataFrame:
    """Wire the stateful function onto a stream: one shuffle on the key,
    per-key GroupState holding three scalars."""
    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            make_ew_anomaly_fn(alpha, z_threshold, min_n),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
