"""Host/domain-level corpus curation (RefinedWeb/CCNet shape).

Real web corpora curate per REGISTERED DOMAIN, not per document: a host's
document count, aggregate quality, blocklist membership and a per-host
document cap are the knobs (Penedo et al. 2023, "The RefinedWeb Dataset
for Falcon LLM").  Everything here is aggregation-shaped:

- host extraction is ``parse_url`` — a JVM builtin, pushdown-friendly;
- the blocklist is a broadcast join (blocklists are model parameters —
  thousands of rows, never corpus-scale);
- the per-host cap reuses ``relational.quota_sample``'s two-phase
  broadcast-cutoff + shortfall-backstop engine, so the cap never sorts a
  hot host's documents in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataquality_ml_spark.functions.scalar import tokens


def with_host(df: DataFrame, url_col: str = "url", out: str = "host") -> DataFrame:
    """Extract the registered host from a URL column (``parse_url`` —
    engine builtin; the DuckDB oracle mirrors it with a regexp)."""
    return df.withColumn(out, F.parse_url(F.col(url_col), F.lit("HOST")))


def host_curation_report(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: list[str] | None = None,
    cap: int = 5,
) -> DataFrame:
    """Per-host curation summary: document count, mean token count,
    blocklist flag, and how many documents survive the per-host cap —
    (host, n_docs, avg_tokens, blocked, n_kept), one row per host.

    Shape: ONE corpus scan for the host+token aggregation; the blocklist
    is a broadcast left join; kept counts come from the hash-rank quota
    sampler (candidates only ever reach the rank window) with blocked
    hosts keeping zero.  At 100 TB hosts are the skew axis — every
    aggregate here is map-side combinable and the cap is the skew-proof
    two-phase sampler, not a corpus window."""
    from dataquality_ml_spark.operators.relational import quota_sample

    spark = df.sparkSession
    hosts = with_host(df, url_col).select(
        "host", F.col(id_col), F.size(tokens(text_col)).alias("_ntok")
    )
    agg = hosts.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("_ntok"), 4).alias("avg_tokens"),
    )
    bl = spark.createDataFrame(
        [(h,) for h in (blocklist or [])], "host string"
    ).withColumn("_blocked", F.lit(1))
    agg = agg.join(F.broadcast(bl), "host", "left").select(
        "host",
        "n_docs",
        "avg_tokens",
        F.coalesce("_blocked", F.lit(0)).alias("blocked"),
    )
    kept = (
        quota_sample(hosts.select("host", id_col), "host", id_col, cap)
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("_nk"))
    )
    return agg.join(kept, "host", "left").select(
        "host",
        "n_docs",
        "avg_tokens",
        "blocked",
        F.when(F.col("blocked") == 1, F.lit(0))
        .otherwise(F.coalesce(F.col("_nk"), F.lit(0)))
        .cast("bigint")
        .alias("n_kept"),
    )
