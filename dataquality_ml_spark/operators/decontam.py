"""Benchmark decontamination — flag corpus documents that share verbatim
k-gram shingles with a held-out benchmark/test set.

The standard pre-training hygiene step (reference has no equivalent; this
is part of the beyond-reference training-data surface): any training
document containing an n-gram that also appears in an evaluation set is
suspected contamination and must be reported (and usually dropped).

Scale shape: the benchmark side is SMALL (eval sets are thousands of
docs, the corpus is the 100 TB side). We therefore reduce the benchmark
to a distinct set of 60-bit shingle hashes and BROADCAST it — the corpus
side is a single scan + array-expression shingling + explode + broadcast
semi-join, no shuffle of corpus data at all. The only aggregation is the
per-doc overlap count, keyed by doc_id (well-distributed). Shingle
hashing uses the md5-derived portable hash so a DuckDB oracle can verify
the exact same decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataquality_ml_spark.functions.scalar import portable_hash60
from dataquality_ml_spark.operators.dedup import with_shingles


def _hashed_shingle_rows(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, s) exploded 60-bit shingle hashes, distinct per doc."""
    sh = with_shingles(df, text_col, id_col, k)
    return sh.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(F.transform(F.col("shs"), portable_hash60))
        ).alias("s"),
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """(doc_id, n_overlap) for every corpus doc sharing >= 1 k-gram with
    the benchmark; n_overlap = number of distinct shared shingles.

    benchmark is reduced to distinct hashes and broadcast: corpus rows
    never shuffle, so the plan survives a 100 TB corpus unchanged as long
    as the *benchmark* fits in a broadcast (it does — eval sets are MBs).
    """
    bench = (
        _hashed_shingle_rows(benchmark, text_col, id_col, k)
        .select("s")
        .distinct()
    )
    corp = _hashed_shingle_rows(corpus, text_col, id_col, k)
    return (
        corp.join(F.broadcast(bench), "s")
        .groupBy(id_col)
        .agg(F.count_distinct("s").alias("n_overlap"))
    )
