"""As-of (most-recent-prior) join — a custom operator Spark lacks natively
(SURVEY.md §7 stance: compose from built-in DataFrame ops when semantics
allow).

``asof_join(left, right, ...)`` attaches to every left row the latest right
row with ``right.ts <= left.ts`` within the same key — the time-series
point-in-time join (market data, telemetry enrichment).

Implementation is the scalable union + carry-forward pattern, NOT a range
join: tag both sides, union, sort per key by (ts, side), and carry the last
right value forward with ``last(..., ignorenulls=True)``. One shuffle on
the key, linear state — a range join would re-scan O(right) per left row
on skewed keys; this never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: values of the latest right row at-or-before its
    timestamp (NULL if none). Left columns pass through unchanged."""
    left_cols = left.columns
    tagged_left = left.withColumn("__side", F.lit(1))
    tagged_right = right.select(
        key, ts, *[F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    ).withColumn("__side", F.lit(0))

    unioned = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row IS visible to the left row (<= semantics)
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col("__side")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"__carry_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
