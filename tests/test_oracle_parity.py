"""Replicates the driver's correctness gate locally: run every registered
query in Spark at sf0.01 and its oracle in DuckDB on the same parquet, then
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod


def _normalize(rows, columns):
    """Sort columns by name and rows by value — order-insensitive compare,
    with float rounding mirroring the driver's value-hash tolerance."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{round(v, 4) + 0.0:.4f}"  # round, then canonicalize -0.0
        if isinstance(v, list):
            return tuple(norm_val(x) for x in v)
        return str(v)

    return sorted(tuple(norm_val(r[i]) for i in idx) for r in rows)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_oracle(spark, duck, oracle_sf_dir, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, oracle_sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert len(spark_rows) >= 0
        return

    res = duck.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _normalize([list(r) for r in spark_rows], spark_cols)
    d = _normalize([list(r) for r in duck_rows], duck_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:3]
    assert s == d, f"{name}: value mismatch at sorted rows {mismatches}: " + "; ".join(
        f"spark={s[i]} duck={d[i]}" for i in mismatches
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
