"""Engine-portable scalar expression helpers.

All pure ``pyspark.sql.functions`` compositions — JVM-side, inside
whole-stage codegen, no Python in the hot path. Each has an exact DuckDB
equivalent so every operator built on them is oracle-checkable:

- ``portable_hash32``  ⇔  ``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``
- ``tokens``           ⇔  ``string_split_regex(trim(lower(x)), '\\s+')``
- ``shingles``         ⇔  list-comprehension over ``generate_series``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lowercase + trim — the shared normalization for fingerprints and
    shingles. Kept minimal so the DuckDB oracle stays byte-identical."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.lower(c))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(col), r"\s+")


def portable_hash32(col: Column | str) -> Column:
    """Deterministic 32-bit string hash identical across engines:
    first 8 hex digits of md5, parsed as an unsigned int."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def portable_hash60(col: Column | str) -> Column:
    """60-bit variant (first 15 hex digits of md5) for join keys where
    32-bit birthday collisions would matter; still bigint-safe in every
    engine."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def shingles(tok_col: Column, k: int) -> Column:
    """Distinct k-word shingles from a token array (w-shingling for
    MinHash / Jaccard dedup). Pure array expressions — no UDF, no shuffle.

    Guarded for docs shorter than k tokens: Spark's ``sequence(1, n)``
    turns DESCENDING for n < 1 and the resulting index 0 makes ``slice``
    throw — short docs yield an empty array instead."""
    idx = F.sequence(F.lit(1), F.size(tok_col) - (k - 1))
    return F.when(
        F.size(tok_col) >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok_col, i, k)))
        ),
    ).otherwise(F.array().cast("array<string>"))


def bow_fingerprint(col: Column | str) -> Column:
    """Order-insensitive bag-of-words fingerprint: md5 of the sorted
    distinct token list — catches shuffled-word duplicates that an exact
    text hash misses."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))
