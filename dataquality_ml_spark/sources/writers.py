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
