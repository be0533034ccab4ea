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
