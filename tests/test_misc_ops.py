"""Remaining operator coverage: catalog scan, grid search, hash parity
property tests (hypothesis), MinHash estimate quality."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataquality_ml_spark.functions.scalar import portable_hash32
from dataquality_ml_spark.ml.augment import grid_search
from dataquality_ml_spark.sources.readers import read_parquet, read_table


def test_read_table_catalog_scan(spark):
    """S2: 3-part-name-free catalog scan via a registered view."""
    read_parquet(spark, "/root/testdata/sf0.001/region.parquet").createOrReplaceTempView(
        "region_view"
    )
    assert read_table(spark, "region_view").count() == 5


def test_grid_search_parallel(spark):
    grid = [{"k": k} for k in range(1, 9)]
    best, score, results = grid_search(
        spark, grid, lambda p: -((p["k"] - 5) ** 2), maximize=True
    )
    assert best == {"k": 5} and score == 0.0
    assert len(results) == len(grid)


@settings(max_examples=25, deadline=None)
@given(st.text(min_size=0, max_size=60, alphabet=st.characters(codec="ascii")))
def test_portable_hash_parity_property(s):
    """portable_hash32 (md5-prefix) must agree between DuckDB and Python's
    hashlib for arbitrary ascii strings — the property every oracle-checked
    dedup operator relies on."""
    import hashlib

    py = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    duck = duckdb.sql(
        "SELECT CAST('0x' || substr(md5(?), 1, 8) AS BIGINT)", params=[s]
    ).fetchone()[0]
    assert py == duck


def test_portable_hash_spark_matches_duckdb(spark):
    """Same property through the actual Spark expression, on real data."""
    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet").limit(50)
    spark_vals = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", portable_hash32(F.col("text")).alias("h")).collect()
    }
    duck_rows = duckdb.sql(
        "SELECT doc_id, CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS h "
        "FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 50"
    ).fetchall()
    for doc_id, h in duck_rows:
        assert spark_vals[doc_id] == h


def test_minhash_estimates_jaccard(spark):
    """MinHash signature agreement rate ≈ true Jaccard (the LSH guarantee
    the banding recall math depends on)."""
    from dataquality_ml_spark.operators import dedup as dd

    docs = read_parquet(spark, "/root/testdata/sf0.01/documents.parquet")
    hs = dd.with_hashed_shingles(docs)
    sig = dd.minhash_signatures(hs, num_perms=16)
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    sigs = {r["doc_id"]: r["sig"] for r in sig.collect()}
    for p in pairs[:10]:
        agree = sum(a == b for a, b in zip(sigs[p.id_a], sigs[p.id_b])) / 16
        assert agree >= 0.5, f"high-jaccard pair {p.id_a},{p.id_b} agrees only {agree}"
