"""Token-budget sequence packing — assign documents to fixed-budget
training sequences by running token count (the "sequence packing" step
that turns a shuffled corpus into budget-sized model inputs).

The semantics are a global prefix sum in a deterministic document order.
A naive ``sum() over (order by id)`` with no partition key collapses the
whole corpus into ONE window partition — the classic 100 TB killer. This
implements the distributed form:

1. range-repartition by the order key and sort within partitions — ranges
   are totally ordered across partitions, so partition id IS rank order;
2. per-partition token subtotals (one tiny agg: |partitions| rows);
3. prefix-sum the subtotals driver-side and broadcast the per-partition
   starting offsets back;
4. an intra-partition running sum (window partitioned by partition id —
   parallel, no skew) plus the broadcast offset gives every doc its exact
   global start position.

The result is invariant to where the range boundaries land, so Spark's
sampled range partitioner doesn't affect output. Oracle-checkable against
the naive single-window SQL form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each doc a (seq_id, seq_offset) under a token ``budget``:
    seq_id = global_start // budget, seq_offset = global_start % budget,
    where global_start = sum of n_col over all docs ordered before it.
    Documents may straddle a budget boundary (offset + n > budget); a
    trainer that forbids straddling filters or re-packs the stragglers."""
    parts = df.repartitionByRange(F.col(id_col)).sortWithinPartitions(id_col)
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    subtotals = (
        with_pid.groupBy("_pid").agg(F.sum(n_col).alias("_psum")).collect()
    )
    acc = 0
    offsets = []
    for r in sorted(subtotals, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["_psum"]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "_pid int, _off long")
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(n_col).over(w), F.lit(0)) + F.col("_off")
    return (
        with_pid.join(off_df, "_pid")
        .withColumn("_start", start)
        .select(
            id_col,
            n_col,
            (F.col("_start") / budget).cast("bigint").alias("seq_id"),
            (F.col("_start") % budget).alias("seq_offset"),
        )
    )
