"""Sinks (SURVEY.md §2.1 S3, S6, S7).

The reference writes its anomaly reports with driver-side ``pandas.to_csv``
(reference app/AE_model.py:288-290, app/IsolationForest_AE.py:360-365) — a
single-node choke point. Here every sink is a distributed ``DataFrameWriter``;
reports stay partitioned unless the caller explicitly asks for one file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_report(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """CSV report sink (reference S6). ``single_file`` coalesces to 1 part —
    only for small aggregate reports, never row-level data at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_iceberg(df: DataFrame, table: str, mode: str = "createOrReplace") -> None:
    """Iceberg table write (reference S3, app/main.py:13-14)."""
    writer = df.writeTo(table).using("iceberg")
    if mode == "createOrReplace":
        writer.createOrReplace()
    elif mode == "append":
        writer.append()
    else:
        raise ValueError(f"unknown mode: {mode}")


def write_parquet_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    target_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Compacted, sort-clustered parquet layout: range-repartition on the
    sort keys (each output file owns a disjoint key range) and sort within
    partitions (row groups inside a file are ordered too). Downstream
    range/point predicates on the sort keys then skip whole files via
    parquet column statistics — the poor-man's Z-order, and the right
    default layout for append-heavy tables re-compacted on a schedule.

    ``target_files`` controls compaction: small-file storms (one file per
    streaming micro-batch / per task) are the top cause of slow scans on
    big tables; re-writing N-thousand tiny files into `target_files`
    range-clustered ones is the maintenance op this implements.
    """
    cols = [df[c] for c in sort_cols]
    if target_files:
        df = df.repartitionByRange(target_files, *cols)
    else:
        df = df.repartitionByRange(*cols)
    df.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — same columnar statistics/pushdown story as parquet, kept
    so the engine can land in ORC-standardized warehouses without an extra
    conversion hop."""
    df.write.mode(mode).orc(path)


def write_parquet_observed(
    df: DataFrame,
    path: str,
    value_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Sink with FREE data-quality metrics: attach a Spark ``Observation``
    to the write so row count and per-column null counts come out of the
    write's own pass — no second scan to audit what landed. At 100 TB the
    difference between this and write-then-recount is a full re-read of
    the output.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    value_cols = value_cols or []
    obs = Observation("write_metrics")
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls") for c in value_cols
    ]
    df.observe(obs, *metrics).write.mode(mode).parquet(path)
    return dict(obs.get)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    fmt: str = "parquet",
    token_count_col: str | None = None,
) -> DataFrame:
    """Sharded training-data export: assign every row a deterministic
    shard = portable_hash(key) mod n_shards, write one partition
    directory per shard (``shard=N/``), and return a per-shard manifest
    (row count, optional token sum) computed from a READ-BACK of the
    written files — the manifest certifies what is actually on disk,
    not what the plan intended.

    Hash sharding (vs range) keeps shards statistically balanced with
    zero knowledge of the key distribution and is stable under
    re-export: the same row lands in the same shard forever, so
    downstream loaders can resume / diff shards across corpus versions.
    ``fmt`` is ``parquet`` or ``json`` (JSONL — one object per line, the
    common LM-training interchange).

    100 TB shape: the shard column is one codegen'd projection; the
    write is the normal distributed partitioned write (no coalesce, no
    driver data); the manifest is an aggregate over the read-back scan,
    partition-pruned per shard.
    """
    from pyspark.sql import functions as F

    from dataquality_ml_spark.functions.scalar import portable_hash32

    shard = F.pmod(portable_hash32(F.col(key_col).cast("string")), F.lit(n_shards))
    out = df.withColumn("shard", shard)
    writer = out.write.mode("overwrite").partitionBy("shard")
    if fmt == "parquet":
        writer.parquet(path)
        back = df.sparkSession.read.parquet(path)
    elif fmt == "json":
        writer.json(path)
        back = df.sparkSession.read.schema(out.schema).json(path)
    else:
        raise ValueError(f"unsupported shard format: {fmt}")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_count_col is not None:
        aggs.append(F.sum(token_count_col).cast("bigint").alias("n_tokens"))
    return back.groupBy("shard").agg(*aggs).orderBy("shard")
