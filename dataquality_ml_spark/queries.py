"""Query catalog: every implemented operator exposed as a named query.

Each entry is a pure function ``(spark, sf_dir) -> DataFrame`` paired (when
SQL-expressible) with an ANSI-SQL oracle that DuckDB runs on the same parquet
tables. The driver hash-compares results at sf0.01 (CORRECTNESS gate).

Conventions:
- Every computed column is explicitly aliased; aliases match the oracle.
- Floating-point aggregates are rounded (4 decimals) on BOTH sides so
  summation-order differences between engines can't flip the value hash.
- Results are deterministic: ties always broken by a key column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataquality_ml_spark.operators import profile as prof
from dataquality_ml_spark.sources.readers import read_parquet

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Flagship: pricing summary (scan → filter → groupBy agg → sort).
# Exercises S1/P1/P3/A-class aggregation in one declarative plan; Catalyst
# pushes the shipdate filter and 7-column pruning into the parquet scan, and
# the groupBy is a 2-phase hash agg (map-side partial → 8-group reduce).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
      ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
      ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
      ROUND(AVG(l_discount), 4)                                          AS avg_disc,
      COUNT(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Join coverage: star join over the full dimension chain. The reference has
# no joins (SURVEY §2.3); this is the engine's native replacement for its
# positional alignment. nation/region/customer are broadcast (small dims) —
# only lineitem⋈orders shuffles, on the join key, with AQE skew handling.
# ---------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    oracle="""
    SELECT
      n.n_name                                                        AS nation,
      ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)           AS revenue,
      COUNT(*)                                                        AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = F.broadcast(_t(spark, sf_dir, "customer"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Flagship DQ operator: single-pass column profile (SURVEY §7 step 2).
# One scan + one reduce replaces the reference's ~40-job per-column loop.
# ---------------------------------------------------------------------------
_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
        SELECT
          '{c}'                                                   AS "column",
          COUNT(*)                                                AS n_rows,
          COUNT({c})                                              AS n_valid,
          ROUND(AVG(CASE WHEN {c} IS NULL THEN 1.0 ELSE 0.0 END), 4) AS null_frac,
          ROUND(AVG(CASE WHEN {c} = 0 THEN 1.0 ELSE 0.0 END), 4)  AS zero_frac,
          ROUND(AVG({c}), 4)                                      AS mean,
          ROUND(STDDEV_SAMP({c}), 4)                              AS stddev,
          ROUND(MIN({c}), 4)                                      AS min,
          ROUND(MAX({c}), 4)                                      AS max,
          ROUND(QUANTILE_CONT({c}, 0.25), 4)                      AS p25,
          ROUND(QUANTILE_CONT({c}, 0.50), 4)                      AS p50,
          ROUND(QUANTILE_CONT({c}, 0.75), 4)                      AS p75,
          ROUND(QUANTILE_CONT({c}, 0.90), 4)                      AS p90,
          ROUND(QUANTILE_CONT({c}, 0.95), 4)                      AS p95
        FROM lineitem""")
    return " UNION ALL ".join(parts)


@register("profile_lineitem", oracle=_profile_oracle())
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = prof.profile(li, columns=_PROFILE_COLS, exact_quantiles=True)
    stat_cols = [c for c in p.columns if c not in ("column", "n_rows", "n_valid")]
    return p.select(
        "column",
        "n_rows",
        "n_valid",
        *[F.round(F.col(c), 4).alias(c) for c in stat_cols],
    )


# ---------------------------------------------------------------------------
# Projection + predicate + cast + JSON extraction (P1/P3/P5 + scalar fns).
# All JVM-side expressions; the filter and 4-column projection push into the
# parquet scan.
# ---------------------------------------------------------------------------
@register(
    "filter_project_cast",
    oracle="""
    SELECT
      event_id,
      user_id,
      CAST(FLOOR(value) AS INTEGER)                           AS value_int,
      CAST(json_extract(props, '$.k') AS INTEGER)             AS prop_k
    FROM events
    WHERE event_type = 'purchase' AND value > 100
    ORDER BY event_id
    """,
)
def filter_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 100))
        .select(
            "event_id",
            "user_id",
            F.col("value").cast("int").alias("value_int"),
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        )
        .orderBy("event_id")
    )


# ===========================================================================
# Thresholds / anomaly flags / evaluation (SURVEY §2.4 A7-A13, §2.8 M13)
# ===========================================================================
from dataquality_ml_spark.operators import evaluate as ev  # noqa: E402
from dataquality_ml_spark.operators import relational as rel  # noqa: E402
from dataquality_ml_spark.operators import sequences as seq  # noqa: E402
from dataquality_ml_spark.operators import thresholds as th  # noqa: E402


@register(
    "zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sigma FROM events
    )
    SELECT e.event_id, ROUND((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e, stats s
    WHERE ABS((e.value - s.mu) / s.sigma) > 2.5
    ORDER BY e.event_id
    """,
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_df = _t(spark, sf_dir, "events")
    z = th.zscore_agg(ev_df, "value")
    return (
        z.where(F.abs(F.col("zscore")) > 2.5)
        .select("event_id", F.round("zscore", 4).alias("zscore"))
        .orderBy("event_id")
    )


@register(
    "iqr_outlier_counts",
    oracle="""
    WITH qs AS (
      SELECT QUANTILE_CONT(value, 0.25) AS q1, QUANTILE_CONT(value, 0.75) AS q3
      FROM events
    )
    SELECT e.event_type, COUNT(*) AS n_outliers
    FROM events e, qs
    WHERE e.value > qs.q3 + 1.5 * (qs.q3 - qs.q1)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def iqr_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_df = _t(spark, sf_dir, "events")
    t = th.iqr_threshold(ev_df, "value", k=1.5, exact=True)
    return (
        th.flag_anomalies(ev_df, "value", t)
        .where(F.col("is_anomaly"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
        .orderBy("event_type")
    )


@register(
    "confusion_p90",
    oracle="""
    WITH t AS (SELECT QUANTILE_CONT(value, 0.90) AS thr FROM events),
    flags AS (
      SELECT (e.value > t.thr) AS p, (e.event_type = 'error') AS a
      FROM events e, t
    ),
    c AS (
      SELECT
        COUNT(*) FILTER (WHERE p AND a)         AS tp,
        COUNT(*) FILTER (WHERE p AND NOT a)     AS fp,
        COUNT(*) FILTER (WHERE NOT p AND NOT a) AS tn,
        COUNT(*) FILTER (WHERE NOT p AND a)     AS fn
      FROM flags
    )
    SELECT tp, fp, tn, fn,
      ROUND(tp / GREATEST(tp + fn, 1), 4)  AS detection_rate,
      ROUND(fp / GREATEST(fp + tn, 1), 4)  AS false_positive_rate,
      ROUND(tp / GREATEST(tp + fp, 1), 4)  AS precision,
      ROUND(2.0 * (tp / GREATEST(tp + fp, 1)) * (tp / GREATEST(tp + fn, 1))
            / GREATEST(tp / GREATEST(tp + fp, 1) + tp / GREATEST(tp + fn, 1), 1e-12), 4) AS f1
    FROM c
    """,
)
def confusion_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_df = _t(spark, sf_dir, "events")
    t = th.percentile_threshold(ev_df, "value", 0.90, exact=True)
    flagged = th.flag_anomalies(ev_df, "value", t).withColumn(
        "actual_failure", F.col("event_type") == "error"
    )
    return ev.confusion_metrics(flagged)


@register(
    "roc_auc_value",
    oracle="""
    WITH ranked AS (
      SELECT (event_type = 'error') AS y,
             ROW_NUMBER() OVER (ORDER BY value) AS rn,
             value AS s
      FROM events
    ),
    mid AS (
      SELECT y, AVG(rn) OVER (PARTITION BY s) AS midrank FROM ranked
    ),
    agg AS (
      SELECT SUM(CASE WHEN y THEN midrank END) AS rank_sum,
             COUNT(*) FILTER (WHERE y)     AS np,
             COUNT(*) FILTER (WHERE NOT y) AS nn
      FROM mid
    )
    SELECT ROUND((rank_sum - np * (np + 1) / 2.0) / (np * nn), 4) AS auc, np, nn
    FROM agg
    """,
)
def roc_auc_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_df = _t(spark, sf_dir, "events").withColumn(
        "label", F.col("event_type") == "error"
    )
    return ev.roc_auc(ev_df, "value", "label")


@register(
    "string_index_freq",
    oracle="""
    SELECT event_type,
           COUNT(*) AS freq,
           CAST(DENSE_RANK() OVER (ORDER BY COUNT(*) DESC, event_type) - 1 AS BIGINT) AS idx
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def string_index_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ordered categorical index (reference A6/M2: StringIndexer
    orders by descending frequency, lib/utils.py:205-208) with a
    deterministic tie-break the MLlib version lacks."""
    from pyspark.sql import Window

    ev_df = _t(spark, sf_dir, "events")
    counts = ev_df.groupBy("event_type").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.desc("freq"), F.asc("event_type"))
    return (
        counts.withColumn("idx", (F.dense_rank().over(w) - 1).cast("bigint"))
        .orderBy("event_type")
    )


# ===========================================================================
# Sequences / analytic windows (SURVEY §2.5 W1-W3)
# ===========================================================================
@register(
    "seq_window_stats",
    oracle="""
    SELECT event_id, user_id,
           ROUND(w_mean, 4) AS w_mean,
           ROUND(w_min, 4)  AS w_min,
           ROUND(w_max, 4)  AS w_max
    FROM (
      SELECT event_id, user_id,
        COUNT(value) OVER w AS w_count,
        AVG(value)  OVER w AS w_mean,
        MIN(value)  OVER w AS w_min,
        MAX(value)  OVER w AS w_max
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    WHERE w_count = 20
    ORDER BY event_id
    """,
)
def seq_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-checkable shadow of the sequence operator (W1): same per-key
    ordered 20-row frame, scalar stats instead of collect_list."""
    ev_df = _t(spark, sf_dir, "events")
    s = seq.sequence_stats(ev_df, "user_id", "ts", "value", n=20, tiebreak="event_id")
    return s.select(
        "event_id",
        "user_id",
        F.round("w_mean", 4).alias("w_mean"),
        F.round("w_min", 4).alias("w_min"),
        F.round("w_max", 4).alias("w_max"),
    ).orderBy("event_id")


@register(
    "gap_check_events",
    oracle="""
    SELECT user_id, COUNT(*) AS n_gaps
    FROM (
      SELECT user_id,
        EXTRACT(EPOCH FROM ts) - LAG(EXTRACT(EPOCH FROM ts))
          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_seconds
      FROM events
    )
    WHERE gap_seconds > 3600
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def gap_check_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_df = _t(spark, sf_dir, "events").withColumn(
        "__ord", F.col("ts").cast("double") + F.col("event_id") * F.lit(0.0)
    )
    # deterministic ordering: (ts, event_id)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    return (
        ev_df.withColumn("gap_seconds", gap)
        .where(F.col("gap_seconds") > 3600)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
        .orderBy("user_id")
    )


@register(
    "topk_by_value",
    oracle="""
    SELECT event_id, ROUND(value, 4) AS value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 100
    """,
)
def topk_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 top-anomalies ordering: TakeOrderedAndProject, not a full sort."""
    ev_df = _t(spark, sf_dir, "events")
    return rel.top_k(ev_df, "value", 100, "event_id").select(
        "event_id", F.round("value", 4).alias("value")
    )


# ===========================================================================
# Sampling / set ops / rollup (SURVEY §2.6 L4-L6 + engine-native extras)
# ===========================================================================
@register(
    "sample_hash_10pct",
    oracle="""
    SELECT event_id, user_id
    FROM events
    WHERE (event_id * 2654435761) % 4294967296 < 429496729
    ORDER BY event_id
    """,
)
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable deterministic 10% sample (reference L4 random_state=42
    semantics, but reproducible across engines and cluster sizes)."""
    ev_df = _t(spark, sf_dir, "events")
    return rel.sample_hash(ev_df, "event_id", 10).select("event_id", "user_id").orderBy("event_id")


@register(
    "union_align_events",
    oracle="""
    SELECT event_id, value, CAST(NULL AS BIGINT) AS user_id FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, CAST(NULL AS DOUBLE) AS value, user_id FROM events WHERE event_type = 'signup'
    ORDER BY event_id
    """,
)
def union_align_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6+P7: unionByName with automatic null-fill for missing columns
    (reference pd.concat + manual lit(None) alignment)."""
    ev_df = _t(spark, sf_dir, "events")
    a = ev_df.where(F.col("event_type") == "purchase").select("event_id", "value")
    b = ev_df.where(F.col("event_type") == "signup").select("event_id", "user_id")
    return rel.union_aligned(a, b).orderBy("event_id")


@register(
    "events_rollup",
    oracle="""
    SELECT event_type,
           CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP))
    ORDER BY event_type NULLS FIRST, day NULLS FIRST
    """,
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup aggregation — grouping-sets surface the reference
    lacks entirely (SURVEY §2.4 note); free in Spark, map-side partial agg."""
    ev_df = _t(spark, sf_dir, "events")
    return (
        ev_df.withColumn("day", F.date_trunc("day", "ts"))
        .rollup("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy(F.col("event_type").asc_nulls_first(), F.col("day").asc_nulls_first())
    )


# ===========================================================================
# Imputation (SURVEY §2.4 A3/A4, §2.8 M1) — nulls synthesized via predicate
# because the testdata has none (value < 1 → NULL).
# ===========================================================================
@register(
    "impute_mean_value",
    oracle="""
    WITH nulled AS (
      SELECT event_id, CASE WHEN value >= 1 THEN value END AS v FROM events
    ),
    m AS (SELECT AVG(v) AS mean_v FROM nulled)
    SELECT n.event_id, ROUND(COALESCE(n.v, m.mean_v), 4) AS value_imputed
    FROM nulled n, m
    ORDER BY n.event_id
    """,
)
def impute_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_df = _t(spark, sf_dir, "events").select(
        "event_id", F.when(F.col("value") >= 1, F.col("value")).alias("v")
    )
    imputed = th.impute_mean(ev_df, ["v"])
    return imputed.select(
        "event_id", F.round("v", 4).alias("value_imputed")
    ).orderBy("event_id")


@register(
    "impute_median_value",
    oracle="""
    WITH nulled AS (
      SELECT event_id, CASE WHEN value >= 1 THEN value END AS v FROM events
    ),
    m AS (SELECT QUANTILE_CONT(v, 0.5) AS med_v FROM nulled)
    SELECT n.event_id, ROUND(COALESCE(n.v, m.med_v), 4) AS value_imputed
    FROM nulled n, m
    ORDER BY n.event_id
    """,
)
def impute_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_df = _t(spark, sf_dir, "events").select(
        "event_id", F.when(F.col("value") >= 1, F.col("value")).alias("v")
    )
    imputed = th.impute_median(ev_df, ["v"], exact=True)
    return imputed.select(
        "event_id", F.round("v", 4).alias("value_imputed")
    ).orderBy("event_id")
