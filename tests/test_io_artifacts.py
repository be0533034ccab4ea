"""Source/sink round-trips (SURVEY §2.1 S1/S3/S6/S7) + evaluation extras."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataquality_ml_spark.sources import readers, writers


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    """S1+S6: write a report CSV, read it back with an explicit schema (no
    inference double-scan) and get identical values."""
    src = readers.read_parquet(spark, "/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "value"
    )
    out = str(tmp_path / "report_csv")
    writers.write_csv_report(src, out)
    back = readers.read_csv(
        spark, out, schema="event_id bigint, event_type string, value double"
    )
    assert back.count() == src.count()
    a = src.agg(F.sum("value").alias("s")).first()["s"]
    b = back.agg(F.sum("value").alias("s")).first()["s"]
    assert abs(a - b) < 1e-6


def test_csv_inference_matches_reference_behavior(spark, tmp_path):
    """S1 with infer=True reproduces the reference's inferSchema load."""
    src = readers.read_parquet(spark, "/root/testdata/sf0.001/events.parquet").select(
        "event_id", "value"
    )
    out = str(tmp_path / "infer_csv")
    writers.write_csv_report(src, out)
    back = readers.read_csv(spark, out, infer=True)
    types = {f.name: f.dataType.typeName() for f in back.schema.fields}
    assert types["value"] == "double"
    assert types["event_id"] in ("integer", "long")


def test_parquet_sink_partitioned(spark, tmp_path):
    src = readers.read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "part_parquet")
    writers.write_parquet(src, out, partition_by=["event_type"])
    back = readers.read_parquet(spark, out)
    assert back.count() == src.count()
    # partition pruning: filtering one event_type reads only its directory
    from dataquality_ml_spark import plans

    pruned = back.where(F.col("event_type") == "error")
    assert pruned.count() == src.where(F.col("event_type") == "error").count()


def test_mllib_pipeline_artifact_roundtrip(spark, tmp_path):
    """S7: persist and reload the fitted PipelineModel; transforms agree.
    (The reference refits at test time — app/test_AE.py:87-97 drift hazard —
    the engine always loads.)"""
    from pyspark.ml import PipelineModel

    from dataquality_ml_spark.ml.mllib_pipeline import build_feature_pipeline

    df = readers.read_parquet(spark, "/root/testdata/sf0.001/events.parquet").select(
        F.col("event_type"), F.col("value"), F.lit(0).alias("failure")
    )
    fitted = build_feature_pipeline(df, label_col="failure").fit(df)
    path = str(tmp_path / "pipe")
    fitted.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    a = fitted.transform(df).select("features").first()["features"]
    b = loaded.transform(df).select("features").first()["features"]
    assert list(a) == list(b)


def test_iceberg_write_gated(spark, tmp_path):
    """S3: Iceberg writeTo — exercised only if the runtime ships the
    Iceberg extension jars (not present in this container → skip)."""
    src = readers.read_parquet(spark, "/root/testdata/sf0.001/region.parquet")
    try:
        writers.write_iceberg(src, "local.db.region_copy")
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"no Iceberg runtime in container: {type(e).__name__}")


def test_binned_auc_approximates_exact(spark):
    from dataquality_ml_spark.operators import evaluate as ev

    df = readers.read_parquet(spark, "/root/testdata/sf0.01/events.parquet").withColumn(
        "label", F.col("event_type") == "error"
    )
    exact = ev.roc_auc(df, "value", "label").first()["auc"]
    binned = ev.roc_auc_binned(df, "value", "label", bins=10000).first()["auc"]
    assert abs(exact - binned) < 0.001


def test_sorted_compaction_layout(spark, tmp_path):
    """write_parquet_sorted must produce the requested file count, with
    files owning DISJOINT sort-key ranges (parquet footer min/max) — the
    property that lets range predicates skip whole files."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(0, 10_000).selectExpr(
        "cast(id * 2654435761 % 4294967296 as long) as k", "id as v"
    ).repartition(16)  # scrambled input, many partitions
    out = str(tmp_path / "sorted_parquet")
    writers.write_parquet_sorted(df, out, sort_cols=["k"], target_files=4)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        ks = [
            (md.row_group(i).column(0).statistics.min,
             md.row_group(i).column(0).statistics.max)
            for i in range(md.num_row_groups)
        ]
        ranges.append((min(k[0] for k in ks), max(k[1] for k in ks)))
    ranges.sort()
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == 10_000
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "file key ranges overlap — no skip potential"


def test_json_quarantine_split(spark, tmp_path):
    """Malformed JSON lines land in quarantine with the raw text; clean
    rows parse to the declared schema. Nothing is dropped or fatal."""
    from dataquality_ml_spark.sources.readers import read_json_with_quarantine

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "v": 2.5}\n'
        "this is not json\n"
        '{"id": "not_an_int_but_null_ok"}\n'
        '{"id": 3, "v": 9.0}\n'
    )
    good, bad = read_json_with_quarantine(spark, str(p), "id long, v double")
    good_rows = {r["id"]: r["v"] for r in good.collect()}
    bad_rows = sorted(r["raw_record"] for r in bad.collect())
    assert good_rows == {1: 2.5, 3: 9.0}
    assert len(bad_rows) == 2
    assert "this is not json" in bad_rows[1] or "this is not json" in bad_rows[0]
    assert good.columns == ["id", "v"]


def test_orc_roundtrip_with_pushdown(spark, tmp_path, sf_dir):
    from dataquality_ml_spark.sources.readers import read_orc, read_parquet
    from dataquality_ml_spark.sources.writers import write_orc

    src = read_parquet(spark, f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path, columns=["o_orderkey", "o_totalprice"])
    assert back.count() == src.count()
    plan = back.where(F.col("o_totalprice") > 1000)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_binary_file_source_multimodal_contract(spark, tmp_path):
    from dataquality_ml_spark.operators.multimodal import attach_binary_metadata
    from dataquality_ml_spark.sources.readers import read_binary_files

    # fake image assets: PNG magic + deterministic payload; one .txt decoy
    # excluded by the glob
    png_magic = bytes.fromhex("89504e470d0a1a0a")
    for i in range(3):
        (tmp_path / f"img_{i}.png").write_bytes(png_magic + bytes([i]) * (10 + i))
    (tmp_path / "notes.txt").write_text("not an image")

    df = read_binary_files(spark, str(tmp_path), glob="*.png")
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    meta = attach_binary_metadata(df, "content", "path")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in meta.collect()}
    assert len(rows) == 3
    for i in range(3):
        r = rows[f"img_{i}.png"]
        assert r["n_bytes"] == 8 + 10 + i
        assert r["magic"] == "89504E47"  # PNG signature survives ingest


def test_write_parquet_observed_metrics(spark, tmp_path, sf_dir):
    from dataquality_ml_spark.sources.readers import read_parquet
    from dataquality_ml_spark.sources.writers import write_parquet_observed

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    path = str(tmp_path / "observed")
    m = write_parquet_observed(ev, path, value_cols=["value", "user_id"])
    back = spark.read.parquet(path)
    assert m["n_rows"] == back.count()
    assert m["value__nulls"] == back.where(F.col("value").isNull()).count()
    assert m["user_id__nulls"] == back.where(F.col("user_id").isNull()).count()


def test_synthetic_docs_datasource_partition_independent(spark):
    """Spark-4 custom Python DataSource: executor-side generation, corpus
    identical under any partitioning, operators run on it unchanged."""
    from dataquality_ml_spark.operators.text import token_stats
    from dataquality_ml_spark.sources.synthetic import SyntheticDocsDataSource

    spark.dataSource.register(SyntheticDocsDataSource)

    def load(parts):
        return (
            spark.read.format("synthetic_docs")
            .option("n_docs", 200)
            .option("n_partitions", parts)
            .option("seed", 11)
            .load()
        )

    one = sorted((r["doc_id"], r["text"]) for r in load(1).collect())
    many_df = load(7)
    assert many_df.rdd.getNumPartitions() == 7
    many = sorted((r["doc_id"], r["text"]) for r in many_df.collect())
    assert one == many and len(one) == 200
    assert many_df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    # downstream operators run unchanged on the generated corpus
    stats = token_stats(many_df)
    assert stats.where("n_tokens >= 5").count() == 200


def test_training_shards_manifest_and_determinism(spark, tmp_path):
    """The shard export must (a) place every row, (b) report a manifest
    that matches what is on disk, (c) assign shards deterministically
    across re-exports, and (d) produce readable JSONL."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"seq {i}", 10 + i % 5) for i in range(200)],
        "seq_id long, text string, n_tokens int",
    )
    man = writers.write_training_shards(
        df, str(tmp_path / "shards_pq"), 4, "seq_id", token_count_col="n_tokens"
    ).collect()
    assert sorted(r["shard"] for r in man) == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in man) == 200
    assert sum(r["n_tokens"] for r in man) == sum(10 + i % 5 for i in range(200))
    # hash sharding balances statistically: no shard dominates
    assert max(r["n_rows"] for r in man) <= 200 * 0.5

    back = spark.read.parquet(str(tmp_path / "shards_pq"))
    # determinism: re-export puts the same keys in the same shards
    man2 = writers.write_training_shards(
        df, str(tmp_path / "shards_pq2"), 4, "seq_id"
    )
    back2 = spark.read.parquet(str(tmp_path / "shards_pq2"))
    assert (
        back.select("seq_id", "shard")
        .exceptAll(back2.select("seq_id", "shard"))
        .count()
        == 0
    )

    # JSONL face
    manj = writers.write_training_shards(
        df, str(tmp_path / "shards_jsonl"), 2, "seq_id", fmt="json"
    ).collect()
    assert sum(r["n_rows"] for r in manj) == 200
    files = list((tmp_path / "shards_jsonl").glob("shard=*/*.json"))
    assert files
    import json as _json

    line = open(files[0]).readline()
    assert set(_json.loads(line)) >= {"seq_id", "text", "n_tokens"}
