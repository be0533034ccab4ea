"""Custom Python DataSource (Spark 4 API): a deterministic synthetic
document corpus generated ON THE EXECUTORS — the scale-testing source.

A 100 TB pipeline test needs 100 TB of input; materializing it to storage
first costs more than the test. This source generates documents inside
each scan task instead: ``n_docs`` split across ``n_partitions`` range
partitions, every document derived purely from its doc_id and the seed —
so the corpus is identical under ANY partitioning, re-run, or cluster
size, and scales to arbitrary row counts with zero storage and zero
driver involvement beyond planning the ranges.

Usage::

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("n_docs", 1_000_000).option("n_partitions", 64)
          .load())

Schema mirrors the testdata ``documents`` table (doc_id, text, lang,
source, n_chars) so every text/dedup/curation operator runs unchanged.
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "window", "order", "data", "column",
    "join", "small", "line", "customer", "query", "big", "the", "a",
    "stream", "group", "sort", "filter", "vector",
]
_LANGS = ["en", "de", "es", "fr", "zh"]


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 7))
        self.min_len = int(options.get("min_len", 5))
        self.max_len = int(options.get("max_len", 40))

    def partitions(self):
        per = -(-self.n_docs // self.n_partitions)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.n_docs))
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            # content is a pure function of (seed, doc_id) — NOT of the
            # partition — so any partitioning yields the same corpus
            rng = random.Random((self.seed << 33) ^ doc_id)
            n = rng.randint(self.min_len, self.max_len)
            text = " ".join(rng.choice(_VOCAB) for _ in range(n))
            yield (
                doc_id,
                text,
                rng.choice(_LANGS),
                f"src{rng.randint(0, 19)}",
                len(text),
            )


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars int"
        )

    def reader(self, schema):
        return SyntheticDocsReader(self.options)
