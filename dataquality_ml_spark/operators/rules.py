"""Declarative data-quality rule engine.

The reference hard-codes its checks inside scripts (null scans, label
splits); a reusable DQ engine states them as data: each rule compiles to a
boolean violation expression or an aggregation, and ALL row-level rules
evaluate in ONE pass over the table (one aggregation of conditional
counts). Cross-table rules (referential integrity) compile to anti-join
counts; uniqueness compiles to a grouped count.

Rule kinds:
- ``not_null(col)``                    — col IS NULL (+ NaN for floats)
- ``in_range(col, lo, hi)``            — col outside [lo, hi]
- ``in_set(col, values)``              — col not in the allowed set
- ``matches(col, regex)``              — col doesn't match
- ``unique(cols)``                     — duplicate key tuples (count > 1)
- ``references(cols, other, other_cols)`` — FK rows missing from ``other``

Output: one row per rule — (rule, kind, n_violations, violation_frac).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


@dataclass
class Rule:
    name: str
    kind: str
    params: dict = field(default_factory=dict)


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "not_null", {"col": col})


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"in_range({col})", "in_range", {"col": col, "lo": lo, "hi": hi})


def in_set(col: str, values: list) -> Rule:
    return Rule(f"in_set({col})", "in_set", {"col": col, "values": values})


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"matches({col})", "matches", {"col": col, "pattern": pattern})


def unique(cols: list[str]) -> Rule:
    return Rule(f"unique({','.join(cols)})", "unique", {"cols": cols})


def references(cols: list[str], other: DataFrame, other_cols: list[str], label: str) -> Rule:
    return Rule(
        f"references({','.join(cols)}->{label})",
        "references",
        {"cols": cols, "other": other, "other_cols": other_cols},
    )


def _violation_expr(df: DataFrame, rule: Rule):
    p = rule.params
    c = F.col(p["col"]) if "col" in p else None
    if rule.kind == "not_null":
        cond = c.isNull()
        if isinstance(df.schema[p["col"]].dataType, (DoubleType, FloatType)):
            cond = cond | F.isnan(c)
        return cond
    if rule.kind == "in_range":
        return c.isNull() | (c < F.lit(p["lo"])) | (c > F.lit(p["hi"]))
    if rule.kind == "in_set":
        return c.isNull() | ~c.isin(*p["values"])
    if rule.kind == "matches":
        return c.isNull() | ~c.rlike(p["pattern"])
    raise ValueError(f"not a row-level rule: {rule.kind}")


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, kind, n_violations,
    violation_frac) ordered by rule name. Row-level rules share one scan."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r.kind in ("not_null", "in_range", "in_set", "matches")]
    results: list[DataFrame] = []

    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.count(F.when(_violation_expr(df, r), 1)).alias(f"v{i}")
            for i, r in enumerate(row_rules)
        ]
        row = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                F.col(f"v{i}").cast("bigint").alias("n_violations"),
                F.round(F.col(f"v{i}") / F.col("__n"), 6).alias("violation_frac"),
            )
            for i, r in enumerate(row_rules)
        ]
        results.append(
            row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
        )

    n_total = None
    for rule in rules:
        if rule.kind == "unique":
            cols = rule.params["cols"]
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("cnt"))
                .where(F.col("cnt") > 1)
                .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("nv"))
            )
            if n_total is None:
                n_total = df.count()
            results.append(
                dup.select(
                    F.lit(rule.name).alias("rule"),
                    F.lit("unique").alias("kind"),
                    F.col("nv").cast("bigint").alias("n_violations"),
                    F.round(F.col("nv") / F.lit(n_total), 6).alias("violation_frac"),
                )
            )
        elif rule.kind == "references":
            p = rule.params
            other = p["other"].select(
                *[F.col(oc).alias(c) for c, oc in zip(p["cols"], p["other_cols"])]
            ).distinct()
            orphans = df.join(other, p["cols"], "left_anti")
            if n_total is None:
                n_total = df.count()
            results.append(
                orphans.agg(F.count(F.lit(1)).alias("nv")).select(
                    F.lit(rule.name).alias("rule"),
                    F.lit("references").alias("kind"),
                    F.col("nv").cast("bigint").alias("n_violations"),
                    F.round(F.col("nv") / F.lit(n_total), 6).alias("violation_frac"),
                )
            )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.orderBy("rule")
