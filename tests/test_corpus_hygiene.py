"""Corpus-hygiene operators: decontamination, repetition filtering,
per-group quota sampling."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataquality_ml_spark.operators.decontam import contamination_report
from dataquality_ml_spark.operators.relational import quota_sample
from dataquality_ml_spark.operators.text import repetition_stats


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------
def test_contamination_report_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench 5-gram
            (2, "one two three four five six"),  # clean
            (3, "alpha beta gamma delta epsilon"),  # exactly the bench 5-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["n_overlap"] for r in contamination_report(corpus, bench).collect()}
    assert set(rows) == {1, 3}
    assert rows[3] == 1
    # doc 1 shares 2 shingles: "alpha..epsilon" and "beta..zeta"? No —
    # bench has only ONE 5-gram, so overlap counts distinct SHARED shingles.
    assert rows[1] == 1


def test_contamination_short_docs_ignored(spark):
    """Docs below shingle length (k=5 tokens) can never be flagged."""
    corpus = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    assert contamination_report(corpus, bench).count() == 0


# ---------------------------------------------------------------------------
# Repetition stats
# ---------------------------------------------------------------------------
def test_repetition_flags_degenerate_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # one token repeated
            (2, "a quick brown fox jumps over lazy dogs"),  # all distinct
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["is_repetitive"] and not rows[2]["is_repetitive"]
    assert rows[1]["dup_token_frac"] == round(1 - 1 / 6, 4)
    assert rows[1]["top_bigram_frac"] == 1.0
    assert rows[2]["dup_token_frac"] == 0.0
    # 7 distinct bigrams out of 7 -> top share 1/7
    assert rows[2]["top_bigram_frac"] == round(1 / 7, 4)


def test_repetition_single_token_doc_excluded(spark):
    df = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    assert repetition_stats(df).count() == 0


# ---------------------------------------------------------------------------
# Quota sampling
# ---------------------------------------------------------------------------
def _naive_quota(df, group_col, key, n):
    h = (F.col(key).cast("bigint") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def test_quota_sample_matches_naive_window_on_skew(spark):
    """Two-phase hash-cutoff pruning must be lossless vs the naive
    whole-group window, including on a heavily skewed group."""
    rows = [(i, "big") for i in range(2000)] + [(10_000 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in quota_sample(df, "source", "doc_id", 5).collect()
    )
    want = sorted(
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in _naive_quota(df, "source", "doc_id", 5).collect()
    )
    assert got == want
    assert len([g for g in got if g[0] == "big"]) == 5
    assert len([g for g in got if g[0] == "small"]) == 5  # under-full group kept whole


def test_quota_sample_group_smaller_than_quota(spark):
    df = spark.createDataFrame([(1, "s"), (2, "s")], "doc_id long, source string")
    out = quota_sample(df, "source", "doc_id", 10).collect()
    assert len(out) == 2 and {r["sample_rank"] for r in out} == {1, 2}
