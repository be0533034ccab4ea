"""Interval (point-in-range) join — match point events to time intervals
without an inequality-only join.

A naive ``p.ts >= i.start AND p.ts < i.end`` join has no equi-key, so
Spark plans it as BroadcastNestedLoopJoin (fine only while one side
broadcasts) or a cartesian product — the classic range-join scale trap.
This operator manufactures the equi-key: intervals explode to the fixed
time buckets they cover, points map to their single bucket, and the join
becomes a plain shuffled/broadcast hash join on bucket id with the exact
range predicate applied as a post-filter. Bucket width trades replication
(long intervals explode to more buckets) against join selectivity; set it
near the typical interval length.

This is the same technique Databricks' range-join optimization and
Flink's interval join use internally — expressed here as a composition
of public DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row (at ``ts_col``) to every interval row with
    ``start <= ts < end``. Column names must be disjoint apart from the
    manufactured bucket key. ``how`` supports 'inner' and 'left'
    (left = keep unmatched points with null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError("interval_join supports how='inner'|'left'")
    b_lo = F.floor(F.col(start_col).cast("double") / bucket_seconds).cast("long")
    b_hi = F.floor(F.col(end_col).cast("double") / bucket_seconds).cast("long")
    iv = intervals.withColumn("_b", F.explode_outer(F.sequence(b_lo, b_hi)))
    pt = points.withColumn(
        "_b", F.floor(F.col(ts_col).cast("double") / bucket_seconds).cast("long")
    )
    in_range = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col)
    )
    if how == "inner":
        return pt.join(iv, "_b").where(in_range).drop("_b")
    # left: unmatched points keep nulls in interval columns. The range
    # predicate must live in the join condition, not a post-filter.
    cond = (pt["_b"] == iv["_b"]) & in_range
    out = pt.join(iv, cond, "left").drop(iv["_b"]).drop(pt["_b"])
    return out
