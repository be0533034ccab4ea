"""Physical-plan inspection (SURVEY.md §4).

The engine ships no custom Catalyst rules — every optimization the
reference needs is built in (§4 table). What it ships instead is plan
*verification*: helpers that read the formatted physical plan so tests can
assert the properties that matter at 100 TB — filters pushed to the scan,
columns pruned, small dims broadcast, shuffle counts bounded. A plan
regression (lost pushdown, surprise SortMergeJoin) fails CI instead of
surfacing as a 10× slowdown on the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (ReadSchema) — the
    check that projection pruning reached storage."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes in the physical plan = shuffle boundaries."""
    return formatted_plan(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)
