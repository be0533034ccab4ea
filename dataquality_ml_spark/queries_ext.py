"""Extended query catalog (round-1 continuation): multi-way join shapes,
rolling/rank window analytics, robust outlier stats, and corpus collocation
mining. Registered into the same ``queries()``/``oracle_sql()`` registry as
``dataquality_ml_spark.queries`` — same conventions (explicit aliases,
rounded floats, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataquality_ml_spark.operators import profile as prof
from dataquality_ml_spark.operators import text as tx
from dataquality_ml_spark.operators import thresholds as th
from dataquality_ml_spark.operators.relational import exclusive_prefix_sum
from dataquality_ml_spark.queries import _t, register


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: aggregate → HAVING → join back to the fact's parents.
# The lineitem agg collapses to per-order rows BEFORE any join (map-side
# partial agg, one shuffle on l_orderkey); orders joins it on the same key
# (AQE picks shuffle-hash/broadcast by the surviving row count — at 100 TB
# the HAVING filter is what keeps the probe side small). customer is a
# broadcast dim.
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, ROUND(b.sum_qty, 2) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipped between two nations by year. The nation
# filter is applied to the DIMENSIONS first (supplier/customer each
# broadcast-joined against a 2-row filtered nation table), so lineitem rows
# from every other nation pair are dropped at the first join instead of
# after a 6-way join; the date range pushes into the parquet scan.
# ---------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    pair = ("NATION_3", "NATION_7")
    n_small = nation.where(F.col("n_name").isin(*pair))
    supp_n = supplier.join(
        F.broadcast(n_small.select(F.col("n_nationkey").alias("s_nationkey"),
                                   F.col("n_name").alias("supp_nation"))),
        "s_nationkey",
    ).select("s_suppkey", "supp_nation")
    cust_n = customer.join(
        F.broadcast(n_small.select(F.col("n_nationkey").alias("c_nationkey"),
                                   F.col("n_name").alias("cust_nation"))),
        "c_nationkey",
    ).select("c_custkey", "cust_nation")

    li_f = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        li_f.join(F.broadcast(supp_n), li_f.l_suppkey == supp_n.s_suppkey)
        .join(orders, li_f.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(volume), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Rolling event-time window: 7-day rolling spend per user. The raw stream is
# FIRST collapsed to per-(user, day) partials (one keyed shuffle), and the
# RANGE window runs over that much smaller relation, partitioned by user —
# never a global window, never the raw fact table. Ordering key is an
# integer day number so the range frame is engine-portable.
# ---------------------------------------------------------------------------
@register(
    "rolling_7d_user_value",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, SUM(value) AS dv
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT user_id, day, ROUND(dv, 2) AS day_value,
           ROUND(SUM(dv) OVER (
             PARTITION BY user_id
             ORDER BY datediff('day', DATE '1990-01-01', day)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 2) AS rolling_7d
    FROM daily
    ORDER BY user_id, day
    """,
)
def rolling_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum("value").alias("dv"))
    day_num = F.datediff(F.col("day"), F.lit("1990-01-01").cast("date")).cast("long")
    w = Window.partitionBy("user_id").orderBy(day_num).rangeBetween(-6, 0)
    return daily.select(
        "user_id",
        "day",
        F.round("dv", 2).alias("day_value"),
        F.round(F.sum("dv").over(w), 2).alias("rolling_7d"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# Distribution-position analytics: percent_rank + cume_dist of order value
# within its priority class. Both functions are rank-based (tie-stable, no
# float accumulation), partitioned by priority — full parallelism across
# partitions; no global window.
# ---------------------------------------------------------------------------
@register(
    "percent_rank_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def percent_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Robust per-group outliers: median / MAD (50%-breakdown estimators — an
# anomaly burst can't drag its own threshold the way P95 or Q3+1.5·IQR can).
# Operator: operators/thresholds.py::mad_robust_outliers.
# ---------------------------------------------------------------------------
@register(
    "mad_outliers_events",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, m.med, ABS(e.value - m.med) AS abs_dev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(abs_dev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(MAX(d.med), 4) AS med,
           ROUND(MAX(md.mad), 4) AS mad,
           COUNT(*) AS n,
           COUNT(CASE WHEN d.abs_dev > 3.5 * 1.4826 * md.mad THEN 1 END) AS n_outliers
    FROM dev d JOIN mad md USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    rep = th.mad_robust_outliers(events, "value", "event_type", k=3.5)
    return rep.select(
        "event_type",
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        "n",
        "n_outliers",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Categorical distribution shape: cardinality, Shannon entropy, Gini — the
# profile that picks partition/salt keys. Operator:
# operators/profile.py::categorical_entropy (single scan, stacked explode).
# ---------------------------------------------------------------------------
@register(
    "entropy_profile_docs",
    oracle="""
    WITH stacked AS (
      SELECT 'lang' AS col_name, lang AS val FROM documents
      UNION ALL
      SELECT 'source' AS col_name, source AS val FROM documents
    ),
    counts AS (
      SELECT col_name, val, COUNT(*) AS c FROM stacked GROUP BY col_name, val
    ),
    tot AS (SELECT col_name, SUM(c) AS n FROM counts GROUP BY col_name)
    SELECT c.col_name AS "column",
           COUNT(*) AS n_distinct,
           ROUND(-SUM((c.c / t.n) * LN(c.c / t.n)), 4) + 0 AS entropy,
           ROUND(1 - SUM((c.c / t.n) * (c.c / t.n)), 4) + 0 AS gini
    FROM counts c JOIN tot t USING (col_name)
    GROUP BY c.col_name
    ORDER BY c.col_name
    """,
)
def entropy_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    rep = prof.categorical_entropy(docs, ["lang", "source"])
    return rep.select(
        "column",
        "n_distinct",
        (F.round("entropy", 4) + F.lit(0.0)).alias("entropy"),
        (F.round("gini", 4) + F.lit(0.0)).alias("gini"),
    ).orderBy("column")


# ---------------------------------------------------------------------------
# Collocation mining: top-20 bigrams by PMI (min support 5). Operator:
# operators/text.py::bigram_pmi — narrow array-zip bigrams, two hash aggs,
# broadcast vocabulary joins, deterministic (rounded-PMI, bigram) cut.
# ---------------------------------------------------------------------------
@register(
    "bigram_pmi_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(nfc_normalize(text))), '\\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)] AS bgs
      FROM toks WHERE len(t) >= 2
    ),
    bc AS (
      SELECT bg AS bigram, COUNT(*) AS c_ab
      FROM (SELECT unnest(bgs) AS bg FROM big) GROUP BY bg
    ),
    uc AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ),
    nb AS (SELECT SUM(c_ab) AS n_bi FROM bc),
    nu AS (SELECT SUM(c) AS n_uni FROM uc)
    SELECT b.bigram, b.c_ab,
           ROUND(LN((b.c_ab / nb.n_bi)
                    / ((u1.c / nu.n_uni) * (u2.c / nu.n_uni))), 4) AS pmi
    FROM bc b
    JOIN uc u1 ON u1.tok = string_split(b.bigram, ' ')[1]
    JOIN uc u2 ON u2.tok = string_split(b.bigram, ' ')[2]
    CROSS JOIN nb CROSS JOIN nu
    WHERE b.c_ab >= 5
    ORDER BY pmi DESC, b.bigram
    LIMIT 20
    """,
)
def bigram_pmi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return tx.bigram_pmi(docs, min_count=5, top_k=20)


# ---------------------------------------------------------------------------
# Full outer join: high-balance suppliers vs customers per nation. Both
# inputs are AGGREGATED before the join (tiny keyed relations), and the
# >9900 filter makes each side sparse, so genuine left-only/right-only rows
# exercise the outer semantics; COALESCE fills the holes.
# ---------------------------------------------------------------------------
@register(
    "full_outer_nation_balance",
    oracle="""
    WITH s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_rich_supp,
             ROUND(SUM(s_acctbal), 2) AS supp_bal
      FROM supplier WHERE s_acctbal > 9900 GROUP BY s_nationkey
    ),
    c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_rich_cust,
             ROUND(SUM(c_acctbal), 2) AS cust_bal
      FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey
    )
    SELECT COALESCE(s.nationkey, c.nationkey) AS nationkey,
           COALESCE(s.n_rich_supp, 0) AS n_rich_supp,
           COALESCE(s.supp_bal, 0.0) AS supp_bal,
           COALESCE(c.n_rich_cust, 0) AS n_rich_cust,
           COALESCE(c.cust_bal, 0.0) AS cust_bal
    FROM s FULL OUTER JOIN c ON s.nationkey = c.nationkey
    ORDER BY nationkey
    """,
)
def full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    s = (
        supplier.where(F.col("s_acctbal") > 9900)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(
            F.count(F.lit(1)).alias("n_rich_supp"),
            F.round(F.sum("s_acctbal"), 2).alias("supp_bal"),
        )
    )
    c = (
        customer.where(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(
            F.count(F.lit(1)).alias("n_rich_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("cust_bal"),
        )
    )
    return (
        s.join(c, s.s_nk == c.c_nk, "full_outer")
        .select(
            F.coalesce("s_nk", "c_nk").alias("nationkey"),
            F.coalesce("n_rich_supp", F.lit(0)).alias("n_rich_supp"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
            F.coalesce("n_rich_cust", F.lit(0)).alias("n_rich_cust"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Correlated EXISTS / NOT EXISTS through the SQL surface (spark.sql over
# temp views — every other query uses the DataFrame API; this one proves the
# engine's SQL entry point end-to-end). Catalyst decorrelates both
# subqueries into a left-semi and a left-anti join on o_custkey; no
# per-row subquery execution survives in the physical plan.
# ---------------------------------------------------------------------------
_EXISTS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM {customer} c
WHERE EXISTS (
        SELECT 1 FROM {orders} o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
  AND NOT EXISTS (
        SELECT 1 FROM {orders} o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      )
ORDER BY c_custkey
"""


@register(
    "exists_urgent_no_fail",
    oracle=_EXISTS_SQL.format(customer="customer", orders="orders"),
)
def exists_urgent_no_fail(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(_EXISTS_SQL.format(customer="v_customer", orders="v_orders"))


# ---------------------------------------------------------------------------
# Fuzzy duplicate candidates via edit distance with a blocking key: part
# names within the same brand at levenshtein ≤ 2. The brand equi-join is
# the blocking step — the quadratic pair space exists only INSIDE each
# brand bucket (a hash join, never a cartesian product); levenshtein runs
# JVM-side as a post-join filter. For unblocked fuzzy matching at 100 TB,
# the LSH family (minhash_dedup_pairs / rhp_lsh_pairs) is the scale path.
# ---------------------------------------------------------------------------
@register(
    "levenshtein_brand_pairs",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY key_a, key_b
    """,
)
def levenshtein_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataquality_ml_spark.operators.relational import ensure_parallelism

    part = _t(spark, sf_dir, "part")
    # The probe side MUST be repartitioned: part is one small parquet file,
    # so the broadcast join would otherwise stream every in-brand pair
    # (~n²/|brands|, the actual cost of this query) through 1-2 tasks.
    a = ensure_parallelism(part).select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand"),
    )
    # Two pruning layers before the full edit distance, both result-neutral:
    # |len(a)-len(b)| <= 2 is a necessary condition for dist <= 2 (one
    # cheap comparison kills most of the in-brand pair space), and the
    # 3-arg levenshtein runs the banded O(len·k) DP with early exit,
    # returning -1 past the threshold instead of finishing the O(len²)
    # table. The oracle computes the plain distance — same surviving rows.
    close_len = F.abs(F.length("name_a") - F.length("name_b")) <= 2
    dist_k = F.levenshtein("name_a", "name_b", 2)
    return (
        a.join(b, "brand")
        .where(F.col("key_a") < F.col("key_b"))
        .where(close_len & (dist_k >= 0))
        .select("key_a", "key_b", "name_a", "name_b", dist_k.alias("dist"))
        .orderBy("key_a", "key_b")
    )


# ---------------------------------------------------------------------------
# Multimodal metadata with a real oracle: build an opaque binary payload
# (utf-8 bytes of the text — same plumbing as image/audio bytes), then the
# engine's attach_binary_metadata computes size / content-hash / magic
# sniff as pure JVM expressions. This oracle-checks the metadata half of
# the multimodal contract; the decode half stays a tested stub
# (operators/multimodal.py::decode_features).
# ---------------------------------------------------------------------------
@register(
    "binary_docs_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           substring(hex(encode(text)), 1, 8) AS magic,
           (octet_length(encode(text)) = length(text)) AS is_ascii
    FROM documents
    ORDER BY doc_id
    """,
)
def binary_docs_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataquality_ml_spark.operators.multimodal import attach_binary_metadata

    docs = _t(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.length("text").alias("n_chars"),
    )
    meta = attach_binary_metadata(payload, "payload", "doc_id")
    return (
        meta.join(payload.select("doc_id", "n_chars"), "doc_id")
        .select(
            "doc_id",
            "n_bytes",
            "content_hash",
            "magic",
            (F.col("n_bytes") == F.col("n_chars")).alias("is_ascii"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional-aggregate ratio — share of March-1996 revenue
# from PROMO parts. One month of lineitem (date range pushes into the scan)
# broadcast-joins the part dim; numerator and denominator come out of the
# SAME single aggregation (CASE inside SUM), not two passes.
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    li_f = li.where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return li_f.join(F.broadcast(part), li_f.l_partkey == part.p_partkey).agg(
        F.round(100.0 * F.sum(promo_rev) / F.sum(rev), 4).alias("promo_share_pct")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-table predicates (OR of brand ×
# size-range × quantity-range conjunctions). Catalyst extracts the common
# join key and pushes the per-side halves of each disjunct down to the
# scans (part: brand/size; lineitem: quantity) before the broadcast join;
# the residual OR runs as the join filter.
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")

    def clause(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        clause("Brand#12", 15, 1, 11)
        | clause("Brand#23", 25, 10, 20)
        | clause("Brand#34", 35, 20, 30)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE grouping: all 4 aggregation levels of (event_type, day-of-week) in
# one pass — Spark expands the cube in the partial aggregate (map-side),
# so the fact table is still scanned once. The grouping id is computed
# explicitly as grouping(a)*2 + grouping(b) so both engines agree bit-for-
# bit; null group keys are labeled 'ALL'. (Spark dayofweek is 1=Sunday;
# DuckDB dow is 0=Sunday — the -1 shift aligns them.)
# ---------------------------------------------------------------------------
@register(
    "cube_events_type_dow",
    oracle="""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
           GROUPING(event_type) * 2 + GROUPING(dow) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT event_type, CAST(EXTRACT(dow FROM ts) AS INTEGER) AS dow, value
      FROM events
    )
    GROUP BY CUBE (event_type, dow)
    ORDER BY gid, event_type, dow
    """,
)
def cube_events_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),
        "value",
    )
    gid = (F.grouping("event_type") * 2 + F.grouping("dow")).cast("bigint")
    return (
        events.cube("event_type", "dow")
        .agg(
            gid.alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
            "gid",
            "n",
            "sum_value",
        )
        .orderBy("gid", "event_type", "dow")
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: the pure scan-and-aggregate forecast query. No join, no
# group — the whole plan is a parquet scan with EVERY predicate pushed down
# (date range + two numeric ranges land in PushedFilters) feeding a single
# partial/final agg. At 100 TB this is I/O-bound by design: row-group
# min/max statistics prune most of the table before a byte is decoded.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting. Fact⋈fact on the order key
# (the only shuffle), customer/nation broadcast, top-20 by revenue with a
# deterministic key tie-break. The date filter on orders halves the probe
# side before the join — Catalyst pushes it below.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1993-10-01'
      AND o.o_orderdate <  TIMESTAMP '1994-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1993-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1994-10-01").cast("timestamp"))
    )
    customer = F.broadcast(_t(spark, sf_dir, "customer"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: distribution of orders-per-customer, INCLUDING the
# zero-order customers — the left outer join is load-bearing (an inner join
# silently drops the most interesting bucket). Two aggregations: per-key
# count, then a histogram over the counts (second agg is over |customers|
# rows, not the fact table).
# ---------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery (per-part average quantity)
# decorrelated into an aggregate + equi-join. The per-part avg collapses
# lineitem to |parts| rows before joining back — broadcast at this SF,
# shuffle-hash at 100 TB (AQE decides); either way the correlation never
# becomes a per-row subquery execution.
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.qty_cut
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty.withColumnRenamed("l_partkey", "a_partkey"),
              F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (adapted: l_returnflag='R' stands in for the reference
# schema's late-delivery columns, absent from this testdata): suppliers
# whose 'R' lineitems sit in multi-supplier orders where NO OTHER supplier
# returned — a semi-join AND an anti-join against the same fact table.
# Both EXISTS/NOT EXISTS decorrelate to one re-aggregation of lineitem per
# order (n_supp, n_bad_supp) joined once — not two correlated probes.
# ---------------------------------------------------------------------------
@register(
    "q21_sole_returning_supplier",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    JOIN per_order po ON po.l_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R' AND po.n_supp > 1 AND po.n_ret = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret"),
    ).withColumnRenamed("l_orderkey", "po_orderkey")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_ret") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape (adapted: c_mktsegment stands in for the reference
# schema's phone country code): positive-balance customers above the
# segment-independent average balance with NO orders at all. The scalar
# subquery is a 1-row broadcast; the NOT EXISTS decorrelates to a
# left-anti join against the distinct order custkeys.
# ---------------------------------------------------------------------------
@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH cut AS (
      SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, cut
    WHERE c.c_acctbal > cut.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cut = customer.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(cut))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Corpus-level duplicate-text signal (RefinedWeb/Gopher "duplicate n-grams
# across the corpus"): for each doc, the fraction of its DISTINCT 5-gram
# hashes that also occur in some other document. One explode + one global
# frequency agg + one join back — the frequency table is vocabulary-sized
# (Zipf), so the join-back broadcasts at any realistic shingle cardinality
# per executor, and the corpus text itself is scanned once.
# ---------------------------------------------------------------------------
from dataquality_ml_spark.queries import _SH_CTE, _TOKS_CTE  # noqa: E402


@register(
    "cross_doc_ngram_dup",
    oracle=f"""
    WITH {_TOKS_CTE},
    {_SH_CTE},
    ex AS (SELECT doc_id, CAST('0x' || substr(md5(unnest(shs)), 1, 15) AS BIGINT) AS s FROM sh),
    freq AS (SELECT s, COUNT(*) AS n_docs FROM ex GROUP BY s)
    SELECT e.doc_id,
           COUNT(*) AS n_sh,
           ROUND(AVG(CASE WHEN f.n_docs > 1 THEN 1.0 ELSE 0.0 END), 4) + 0 AS dup_frac
    FROM ex e JOIN freq f USING (s)
    GROUP BY e.doc_id
    ORDER BY e.doc_id
    """,
)
def cross_doc_ngram_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataquality_ml_spark.functions.scalar import portable_hash60
    from dataquality_ml_spark.operators.dedup import with_shingles

    docs = _t(spark, sf_dir, "documents")
    ex = (
        with_shingles(docs, "text", "doc_id", k=5)
        .select(
            "doc_id",
            F.explode_outer(F.array_distinct("shs")).alias("_s"),
        )
        .select("doc_id", portable_hash60(F.col("_s")).alias("s"))
    )
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        ex.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            (
                F.round(
                    F.avg(F.when(F.col("n_docs") > 1, 1.0).otherwise(0.0)), 4
                )
                + F.lit(0.0)
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation, shuffle-scalable: midranks from grouped value
# counts (midrank(v) = rows_below(v) + (ties+1)/2) instead of a global
# row_number window — the window over DISTINCT values is |distinct| rows
# per column, never the fact table, and the join back to rows is a plain
# equi-join on the value. Pearson corr of the midranks = Spearman rho.
# ---------------------------------------------------------------------------
@register(
    "spearman_qty_price",
    oracle="""
    WITH rx AS (
      SELECT l_quantity AS v, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    mx AS (
      SELECT v, SUM(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0 AS mr
      FROM rx
    ),
    ry AS (
      SELECT l_extendedprice AS v, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    my AS (
      SELECT v, SUM(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0 AS mr
      FROM ry
    )
    SELECT ROUND(CORR(mx.mr, my.mr), 6) + 0 AS spearman_rho,
           COUNT(*) AS n
    FROM lineitem l
    JOIN mx ON mx.v = l.l_quantity
    JOIN my ON my.v = l.l_extendedprice
    """,
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")

    def midranks(col: str):
        # midrank(v) = rows strictly below v + (ties+1)/2. The strictly-
        # below count is a distributed exclusive prefix sum over the
        # grouped DISTINCT-value relation (VERDICT r7 item 1) — for a
        # continuous column |distinct| ≈ |rows|, so the former
        # `Window.orderBy(v)` cumulative sum was a single-task funnel.
        gc = li.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
        return exclusive_prefix_sum(gc, "v", "cnt", out="_below").select(
            "v", (F.col("_below") + (F.col("cnt") + 1) / 2.0).alias("mr")
        )

    mx = midranks("l_quantity").withColumnsRenamed({"v": "vx", "mr": "mrx"})
    my = midranks("l_extendedprice").withColumnsRenamed({"v": "vy", "mr": "mry"})
    return (
        li.join(F.broadcast(mx), li.l_quantity == mx.vx)
        .join(my, li.l_extendedprice == my.vy)
        .agg(
            (F.round(F.corr("mrx", "mry"), 6) + F.lit(0.0)).alias("spearman_rho"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Event funnel: view → click → purchase, strictly ordered by each user's
# FIRST occurrence of each stage. One conditional-min aggregation per user
# (single keyed shuffle of 3 small timestamps — the classic funnel without
# ever self-joining the event stream), then one global roll-up.
# ---------------------------------------------------------------------------
@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS n_view,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_click_after_view,
           COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
             AS n_full_funnel
    FROM per_user
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_click_after_view"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# Grid-density clustering (DBSCAN's grid-based cousin, exactly computable):
# bucket embeddings into fixed cells on the first two dimensions, keep
# cells with >= minpts points, connect 8-adjacent dense cells with the
# engine's pointer-jumping connected components, and label points by their
# cell's component. Every step is a hash agg or a broadcast join on the
# TINY dense-cell relation — the 64-dim vectors themselves never shuffle.
# Oracle: recursive-CTE transitive closure over the same dense-cell graph.
# ---------------------------------------------------------------------------
@register(
    "grid_density_clusters",
    oracle="""
    WITH RECURSIVE pts AS (
      SELECT vec_id,
             CAST(FLOOR(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT) AS x,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT) AS y
      FROM embeddings
    ),
    cells AS (
      SELECT x, y, CAST(x AS VARCHAR) || ':' || CAST(y AS VARCHAR) AS cell, COUNT(*) AS c
      FROM pts GROUP BY x, y
    ),
    dense AS (SELECT * FROM cells WHERE c >= 8),
    edges AS (
      SELECT a.cell AS a, b.cell AS b
      FROM dense a JOIN dense b
        ON b.x BETWEEN a.x - 1 AND a.x + 1
       AND b.y BETWEEN a.y - 1 AND a.y + 1
    ),
    reach(node, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b
    ),
    comp AS (SELECT node AS cell, MIN(r) AS cluster FROM reach GROUP BY node)
    SELECT p.vec_id,
           CAST(p.x AS VARCHAR) || ':' || CAST(p.y AS VARCHAR) AS cell,
           COALESCE(comp.cluster, 'noise') AS cluster
    FROM pts p
    LEFT JOIN comp ON comp.cell = CAST(p.x AS VARCHAR) || ':' || CAST(p.y AS VARCHAR)
    ORDER BY p.vec_id
    """,
)
def grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataquality_ml_spark.operators import graph as gr

    h, minpts = 0.1, 8
    emb = _t(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.floor(F.element_at("embedding", 1).cast("double") / h).cast("bigint").alias("x"),
        F.floor(F.element_at("embedding", 2).cast("double") / h).cast("bigint").alias("y"),
    )
    cell_str = F.concat_ws(":", F.col("x").cast("string"), F.col("y").cast("string"))
    cells = pts.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    dense = cells.where(F.col("c") >= minpts).select(
        "x", "y", cell_str.alias("cell")
    ).cache()
    a = dense.select(F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("cell").alias("id_a"))
    b = dense.select(F.col("x").alias("bx"), F.col("y").alias("by"), F.col("cell").alias("id_b"))
    # 8-neighborhood + self-pairs; self-edges keep isolated dense cells as
    # their own single-cell cluster (connected_components drops isolated
    # nodes otherwise).
    edges = a.join(
        F.broadcast(b),
        F.col("bx").between(F.col("ax") - 1, F.col("ax") + 1)
        & F.col("by").between(F.col("ay") - 1, F.col("ay") + 1),
    ).select("id_a", "id_b")
    comp = gr.connected_components(edges).withColumnRenamed("node", "cell")
    return (
        pts.select("vec_id", cell_str.alias("cell"))
        .join(F.broadcast(comp), "cell", "left_outer")
        .select(
            "vec_id",
            "cell",
            F.coalesce("component", F.lit("noise")).alias("cluster"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Distributed ordinary least squares via the normal equations AS AGGREGATES:
# the five raw sums (Σx, Σy, Σxy, Σx², Σy²) are one map-side-combined pass
# over the fact table — the d×d Gram matrix generalization is how the
# engine fits any linear model at 100 TB without collecting rows. The
# oracle spells out the SAME closed forms over the same raw sums.
# ---------------------------------------------------------------------------
@register(
    "linreg_price_on_qty",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
             SUM(l_quantity * l_extendedprice) AS sxy,
             SUM(l_quantity * l_quantity) AS sxx,
             SUM(l_extendedprice * l_extendedprice) AS syy
      FROM lineitem
    )
    SELECT n,
      ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
      ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept,
      ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def linreg_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "n",
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-ES), fully
# deterministic: uniform u from the engine-portable md5 hash of the key,
# priority = -ln(u)/w, global top-k by SMALLEST priority. Spark executes
# this as TakeOrdered (per-partition top-k + driver merge of k·p rows) —
# no global sort; inclusion probability stays proportional to o_totalprice.
# ---------------------------------------------------------------------------
@register(
    "weighted_sample_orders",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(-LN((CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                       AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0) / o_totalprice, 10)
             AS priority
    FROM orders
    ORDER BY priority, o_orderkey
    LIMIT 25
    """,
)
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataquality_ml_spark.functions.scalar import portable_hash32

    orders = _t(spark, sf_dir, "orders")
    u = (portable_hash32(F.col("o_orderkey").cast("string")).cast("double") + 0.5) / F.lit(
        4294967296.0
    )
    priority = -F.log(u) / F.col("o_totalprice")
    return (
        orders.select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round(priority, 10).alias("priority"),
        )
        .orderBy("priority", "o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Time-weighted average for IRREGULARLY sampled series: each reading holds
# until the next one (step interpolation), so its weight is the gap to the
# next event. One lead() window per user (single keyed shuffle, ordered
# by event time with a deterministic tie-break), then a per-user ratio
# aggregate. The plain AVG is wrong whenever sampling density correlates
# with the value — this is the standard fix.
# ---------------------------------------------------------------------------
@register(
    "time_weighted_avg_value",
    oracle="""
    WITH g AS (
      SELECT user_id, value,
             epoch(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch(ts) AS dt
      FROM events
    )
    SELECT user_id,
           ROUND(SUM(value * dt) / SUM(dt), 4) AS tw_avg,
           ROUND(AVG(value), 4) AS naive_avg,
           COUNT(*) AS n_gaps
    FROM g WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.lead(F.col("ts").cast("double")).over(w) - F.col("ts").cast("double")
    g = ev.select("user_id", "value", dt.alias("dt"))
    return (
        g.where(F.col("dt").isNotNull() & (F.col("dt") > 0))
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 4).alias("tw_avg"),
            F.round(F.avg("value"), 4).alias("naive_avg"),
            F.count(F.lit(1)).alias("n_gaps"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Evaluation composition: language-ID predictions cross-tabulated against
# the labeled lang column — the A11 confusion-matrix pattern applied to a
# text operator (every (label, prediction) cell, zero cells omitted).
# ---------------------------------------------------------------------------
from dataquality_ml_spark.queries import _lang_id_oracle  # noqa: E402


@register(
    "lang_confusion_matrix",
    oracle=f"""
    SELECT d.lang, p.pred_lang, COUNT(*) AS n
    FROM ({_lang_id_oracle()}) p
    JOIN documents d USING (doc_id)
    GROUP BY d.lang, p.pred_lang
    ORDER BY d.lang, p.pred_lang
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pred = tx.language_id(docs).select("doc_id", "pred_lang")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# Multivariate outliers via Mahalanobis distance, 2-feature closed form:
# raw-sum aggregates → sample covariance → analytic 2×2 inverse → quadratic
# form per row. One stats pass + one scan with the 1-row stats broadcast —
# the d-dimensional version is the same shape with a d×d Gram matrix
# solved driver-side (see linreg_price_on_qty). Cutoff = χ²(2df, p=0.001).
# Both engines compute the identical raw-sum expression tree.
# ---------------------------------------------------------------------------
@register(
    "mahalanobis_outliers",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
             SUM(l_quantity * l_extendedprice) AS sxy,
             SUM(l_quantity * l_quantity) AS sxx,
             SUM(l_extendedprice * l_extendedprice) AS syy
      FROM lineitem
    ),
    c AS (
      SELECT n, sx / n AS mx, sy / n AS my,
             (sxx - sx * sx / n) / (n - 1) AS cxx,
             (syy - sy * sy / n) / (n - 1) AS cyy,
             (sxy - sx * sy / n) / (n - 1) AS cxy
      FROM s
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(((l_quantity - mx) * (l_quantity - mx) * cyy
                  - 2 * (l_quantity - mx) * (l_extendedprice - my) * cxy
                  + (l_extendedprice - my) * (l_extendedprice - my) * cxx)
                 / (cxx * cyy - cxy * cxy), 4) AS d2
    FROM lineitem, c
    WHERE ROUND(((l_quantity - mx) * (l_quantity - mx) * cyy
                 - 2 * (l_quantity - mx) * (l_extendedprice - my) * cxy
                 + (l_extendedprice - my) * (l_extendedprice - my) * cxx)
                / (cxx * cyy - cxy * cxy), 4) > 13.8155
    ORDER BY l_orderkey, l_linenumber
    """,
)
def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    c = s.select(
        (F.col("sx") / n).alias("mx"),
        (F.col("sy") / n).alias("my"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)).alias("cxx"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)).alias("cyy"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)).alias("cxy"),
    )
    dx, dy = x - F.col("mx"), y - F.col("my")
    d2 = F.round(
        (dx * dx * F.col("cyy") - 2 * dx * dy * F.col("cxy") + dy * dy * F.col("cxx"))
        / (F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy")),
        4,
    )
    return (
        li.crossJoin(F.broadcast(c))
        .select("l_orderkey", "l_linenumber", d2.alias("d2"))
        .where(F.col("d2") > 13.8155)
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Supervised training-set builder from an event stream: lag-window features
# (previous 3 readings) + the current value as label, per user in event-time
# order. ONE keyed window shuffle produces every row of the design matrix —
# the standard autoregressive feature layout, built without ever collecting
# a series to the driver.
# ---------------------------------------------------------------------------
@register(
    "lag_features_trainset",
    oracle="""
    SELECT * FROM (
      SELECT event_id, user_id,
             LAG(value, 3) OVER w AS lag3,
             LAG(value, 2) OVER w AS lag2,
             LAG(value, 1) OVER w AS lag1,
             value AS label
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE lag3 IS NOT NULL
    ORDER BY event_id
    """,
)
def lag_features_trainset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.lag("value", 3).over(w).alias("lag3"),
            F.lag("value", 2).over(w).alias("lag2"),
            F.lag("value", 1).over(w).alias("lag1"),
            F.col("value").alias("label"),
        )
        .where(F.col("lag3").isNotNull())
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Join-skew diagnosis BEFORE running the join: per-key cardinalities on
# both sides and the output each key would produce. Two key-only hash aggs
# — the decision input for plain-shuffle vs AQE-skew vs salted join
# (relational.salted_join), costing a scan of the keys instead of the join.
# ---------------------------------------------------------------------------
@register(
    "join_skew_report_orders",
    oracle="""
    WITH lc AS (SELECT o_custkey AS key, COUNT(*) AS n_left FROM orders GROUP BY 1),
    rc AS (SELECT c_custkey AS key, COUNT(*) AS n_right FROM customer GROUP BY 1),
    both_t AS (
      SELECT key, n_left, n_right, n_left * n_right AS out_rows
      FROM lc JOIN rc USING (key)
    )
    SELECT key, n_left, n_right, out_rows,
           ROUND(out_rows / CAST((SELECT SUM(out_rows) FROM both_t) AS DOUBLE), 6) + 0
             AS out_share
    FROM both_t
    ORDER BY out_rows DESC, key
    LIMIT 10
    """,
)
def join_skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prof.join_skew_report(
        _t(spark, sf_dir, "orders"), "o_custkey",
        _t(spark, sf_dir, "customer"), "c_custkey",
        top_n=10,
    )


# ---------------------------------------------------------------------------
# Pipeline-freshness DQ check: daily row counts vs the trailing-7-day
# average — the "did yesterday's partition actually land, and was it the
# right size" monitor. The raw stream collapses to one row per day first;
# the trailing window runs over |days| rows.
# ---------------------------------------------------------------------------
@register(
    "daily_completeness_check",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day, n,
             AVG(n) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS trailing_avg
      FROM daily
    )
    SELECT day, n, ROUND(trailing_avg, 4) AS trailing_avg,
           ROUND(n / trailing_avg, 4) AS ratio,
           (n < 0.5 * trailing_avg OR n > 2.0 * trailing_avg) AS is_abnormal
    FROM w WHERE trailing_avg IS NOT NULL
    ORDER BY day
    """,
)
def daily_completeness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-7, -1)
    t_avg = F.avg("n").over(w)
    return (
        daily.select(
            "day",
            "n",
            F.round(t_avg, 4).alias("trailing_avg"),
            F.round(F.col("n") / t_avg, 4).alias("ratio"),
            ((F.col("n") < 0.5 * t_avg) | (F.col("n") > 2.0 * t_avg)).alias("is_abnormal"),
        )
        .where(F.col("trailing_avg").isNotNull())
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding: category → mean of the target over the
# OTHER rows of the category ((sum−y)/(n−1)) — the leakage-safe categorical
# encoding for tree/linear models. One grouped agg broadcast back onto the
# fact; the LOO correction is pure row arithmetic, so no per-row subquery
# and no second shuffle.
# ---------------------------------------------------------------------------
@register(
    "target_encode_loo",
    oracle="""
    WITH s AS (
      SELECT event_type, SUM(value) AS sum_v, COUNT(*) AS n
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(CASE WHEN s.n > 1 THEN (s.sum_v - e.value) / (s.n - 1) END, 4)
             AS te_loo
    FROM events e JOIN s USING (event_type)
    WHERE e.value IS NOT NULL
    ORDER BY e.event_id
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    s = ev.groupBy("event_type").agg(
        F.sum("value").alias("sum_v"), F.count(F.lit(1)).alias("n")
    )
    te = F.when(
        F.col("n") > 1, (F.col("sum_v") - F.col("value")) / (F.col("n") - 1)
    )
    return (
        ev.join(F.broadcast(s), "event_type")
        .select("event_id", "event_type", F.round(te, 4).alias("te_loo"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Hashing-trick feature bucketing: unbounded categorical vocabulary →
# fixed k buckets via the engine-portable hash; per-bucket frequencies +
# the collision inventory (distinct source values per bucket). The
# dimensionality is fixed BEFORE any fit, which is what makes categorical
# pipelines schema-stable at 100 TB (no vocabulary growth between train
# and apply, no index artifact to ship).
# ---------------------------------------------------------------------------
@register(
    "feature_hash_buckets",
    oracle="""
    SELECT CAST(CAST('0x' || substr(md5(p_type), 1, 8) AS BIGINT) % 16 AS BIGINT)
             AS bucket,
           COUNT(*) AS n,
           COUNT(DISTINCT p_type) AS n_values
    FROM part
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def feature_hash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataquality_ml_spark.functions.scalar import portable_hash32

    part = _t(spark, sf_dir, "part")
    return (
        part.select((portable_hash32(F.col("p_type")) % 16).alias("bucket"), "p_type")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("p_type").alias("n_values"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Entry/exit analytics: first, last, and second event per user in one
# windowed pass (first_value / last_value / nth_value over the full-
# partition frame). One keyed shuffle; the frame spec matters — last_value
# over the default frame silently returns the CURRENT row.
# ---------------------------------------------------------------------------
@register(
    "user_journey_endpoints",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER w AS last_type,
           NTH_VALUE(value, 2) OVER w AS second_value,
           COUNT(*) OVER w AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
)
def user_journey_endpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.nth_value("value", 2).over(w).alias("second_value"),
            F.count(F.lit(1)).over(w).alias("n_events"),
        )
        .distinct()
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix of user behavior: (prev → next)
# event-type counts from one lag window, row-normalized into transition
# probabilities with a windowed total over the GROUPED matrix (|types|²
# rows). The classic session-behavior profile.
# ---------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS next_t,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_t
      FROM events
    ),
    m AS (
      SELECT prev_t, next_t, COUNT(*) AS n
      FROM seq WHERE prev_t IS NOT NULL
      GROUP BY prev_t, next_t
    )
    SELECT prev_t, next_t, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY prev_t) AS DOUBLE), 6) + 0 AS p
    FROM m
    ORDER BY prev_t, next_t
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_t"),
        F.lag("event_type").over(w).alias("prev_t"),
    )
    m = (
        seq.where(F.col("prev_t").isNotNull())
        .groupBy("prev_t", "next_t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_t")
    return m.select(
        "prev_t",
        "next_t",
        "n",
        (F.round(F.col("n") / F.sum("n").over(tot), 6) + F.lit(0.0)).alias("p"),
    ).orderBy("prev_t", "next_t")


# ---------------------------------------------------------------------------
# Regression-residual outliers: fit OLS in one aggregate pass (see
# linreg_price_on_qty), broadcast the two coefficients, flag rows whose
# standardized residual exceeds 4σ. Model-based anomaly detection as two
# scans and zero shuffles of row data.
# ---------------------------------------------------------------------------
@register(
    "linreg_residual_outliers",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
             SUM(l_quantity * l_extendedprice) AS sxy,
             SUM(l_quantity * l_quantity) AS sxx
      FROM lineitem
    ),
    c AS (
      SELECT n,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
      FROM s
    ),
    r AS (
      SELECT l_orderkey, l_linenumber,
             l_extendedprice - (a + b * l_quantity) AS resid
      FROM lineitem, c
    ),
    sd AS (SELECT STDDEV_SAMP(resid) AS sigma FROM r)
    SELECT l_orderkey, l_linenumber, ROUND(resid / sigma, 4) AS std_resid
    FROM r, sd
    WHERE ABS(ROUND(resid / sigma, 4)) > 4.0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def linreg_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    c = s.select(slope.alias("b"), ((F.col("sy") - slope * F.col("sx")) / n).alias("a"))
    # two consumers (sigma + the standardized output) — checkpoint so the
    # lineitem scan + residual projection run once (round 13, guide §2.4)
    r = li.crossJoin(F.broadcast(c)).select(
        "l_orderkey",
        "l_linenumber",
        (y - (F.col("a") + F.col("b") * x)).alias("resid"),
    ).localCheckpoint(eager=False)
    sd = r.agg(F.stddev_samp("resid").alias("sigma"))
    return (
        r.crossJoin(F.broadcast(sd))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("resid") / F.col("sigma"), 4).alias("std_resid"),
        )
        .where(F.abs(F.col("std_resid")) > 4.0)
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS through the SQL surface (spark.sql over a temp
# view): exactly the two marginals, without the full cube's interior —
# at 100 TB the difference between 2 and 2^k aggregation levels in the
# partial aggregate. Complements cube_events_type_dow / events_rollup.
# ---------------------------------------------------------------------------
@register(
    "grouping_sets_marginals",
    oracle="""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT event_type, CAST(EXTRACT(dow FROM ts) AS INTEGER) AS dow, value
      FROM events
    )
    GROUP BY GROUPING SETS ((event_type), (dow))
    ORDER BY event_type, dow
    """,
)
def grouping_sets_marginals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.dayofweek("ts") - 1).alias("dow"), "value"
    )
    ev.createOrReplaceTempView("_gs_events")
    return ev.sparkSession.sql(
        """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(dow AS STRING), 'ALL') AS dow,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (dow))
        ORDER BY event_type, dow
        """
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
# each other instead of silently dropping — load-bearing whenever a
# "no value" bucket must survive an aggregation join. Both sides are
# grouped relations, so the join is tiny; what's under test is the
# equality semantics, which a plain equi-join gets wrong by one bucket.
# ---------------------------------------------------------------------------
@register(
    "null_safe_join_counts",
    oracle="""
    WITH a AS (
      SELECT NULLIF(event_type, 'error') AS k, COUNT(*) AS n_a
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    b AS (
      SELECT NULLIF(event_type, 'error') AS k, ROUND(SUM(value), 2) AS sum_b
      FROM events GROUP BY 1
    )
    SELECT COALESCE(a.k, '(null)') AS k, a.n_a, b.sum_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY k
    """,
)
def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error"))
    a = ev.where(F.col("value").isNotNull()).groupBy(k.alias("k")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    b = ev.groupBy(k.alias("k")).agg(F.round(F.sum("value"), 2).alias("sum_b"))
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(F.coalesce(a["k"], F.lit("(null)")).alias("k"), "n_a", "sum_b")
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Rolling 7-day DISTINCT users per day — windowed COUNT(DISTINCT) doesn't
# exist in any engine's window frame, and the naive day×user range join is
# quadratic. The scale shape: collapse to distinct (user, day) first, then
# EXPLODE each into the ≤7 report days it contributes to (bucket-explode,
# the same trick as the interval join) and run one countDistinct per day.
# Shuffle volume: 7×|user-days|, independent of raw event count.
# ---------------------------------------------------------------------------
@register(
    "rolling_7d_distinct_users",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS uday FROM events)
    SELECT d.day, COUNT(DISTINCT u.user_id) AS active_7d
    FROM days d JOIN ud u ON u.uday BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    ORDER BY d.day
    """,
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("uday")).distinct()
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("uday"), F.date_add("uday", 6))).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day")  # drop report days past the data
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market share of one supplier nation inside one customer
# region, by year — a 7-relation join where every dimension filter is
# applied BEFORE its join (region-filtered customers, type-filtered parts
# both broadcast), and the share is a conditional-sum ratio inside one
# year-grouped aggregation (no second pass over the joined fact).
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) + 0 AS mkt_share,
           COUNT(*) AS n_lines
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'EUROPE'
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supplier = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    # region-filtered customer keys (broadcast): the filter reaches the
    # fact via the customer dim, not after the 7-way join
    cust_eu = customer.join(
        F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
        customer.c_nationkey == nation.n_nationkey,
    ).select("c_custkey")
    supp_n = supplier.join(
        F.broadcast(
            nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
        ),
        supplier.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")

    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_eu), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.round(
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                            0.0
                        )
                    )
                    / F.sum("volume"),
                    6,
                )
                + F.lit(0.0)
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: supplier(s) achieving the GLOBAL maximum revenue — an
# aggregation joined against its own scalar max (the view + subquery in
# the original). The revenue relation is computed once and reused for
# both the max and the final filter via a 1-row broadcast, not recomputed
# per comparison.
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
        .cache()
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Multi-probe IVF ANN + recall report (VERDICT r3 item 3): nprobe=2 probes
# the two nearest centroids per query — boundary queries whose true
# neighbors sit across a Voronoi edge get them back at 2× candidate cost —
# and the recall query quantifies exactly what probe truncation costs by
# joining the ANN result against the exact brute-force baseline.
# ---------------------------------------------------------------------------
from dataquality_ml_spark.operators import similarity as sim  # noqa: E402
from dataquality_ml_spark.queries import (  # noqa: E402
    _CENT_CTE,
    _COS_SQL,
    _queries_vecs,
)

_IVF_NPROBE2_CTES = f"""
    {_CENT_CTE},
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    assign_scored AS (
      SELECT v.vec_id, c.centroid_id,
        ROUND(list_dot_product(v.emb, c.centroid)
          / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.centroid, c.centroid))), 6) + 0 AS sim
      FROM vecs v, cent c
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
        FROM assign_scored
      ) WHERE rn = 1
    ),
    q_probes AS (
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
        FROM assign_scored WHERE vec_id < 10
      ) WHERE rn <= 2
    ),
    q AS (
      SELECT v.vec_id AS query_id, v.emb AS qv, p.cluster AS q_cluster
      FROM vecs v JOIN q_probes p USING (vec_id) WHERE v.vec_id < 10
    ),
    c AS (
      SELECT v.vec_id AS neighbor_id, v.emb AS cv, a.cluster AS c_cluster
      FROM vecs v JOIN assign a USING (vec_id)
    ),
    ivf_scored AS (
      SELECT query_id, neighbor_id, ROUND({_COS_SQL}, 4) + 0 AS sim
      FROM q JOIN c ON c_cluster = q_cluster AND neighbor_id != query_id
    ),
    ivf_ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM ivf_scored
    )"""


@register(
    "knn_ivf_nprobe2",
    oracle=f"""
    WITH {_IVF_NPROBE2_CTES}
    SELECT query_id, neighbor_id, sim, rank
    FROM ivf_ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def knn_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.centroids_by_label(emb)
    return sim.knn_ivf(emb, _queries_vecs(spark, sf_dir), cents, k=5, nprobe=2)


@register(
    "ivf_recall_at_k",
    oracle=f"""
    WITH {_IVF_NPROBE2_CTES},
    bf_scored AS (
      SELECT q2.query_id, c2.neighbor_id, ROUND(
        list_dot_product(q2.qv, c2.cv)
        / (sqrt(list_dot_product(q2.qv, q2.qv)) * sqrt(list_dot_product(c2.cv, c2.cv))), 4) + 0 AS sim
      FROM (SELECT vec_id AS query_id, emb AS qv FROM vecs WHERE vec_id < 10) q2,
           (SELECT vec_id AS neighbor_id, emb AS cv FROM vecs) c2
      WHERE c2.neighbor_id != q2.query_id
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM bf_scored
      ) WHERE rank <= 5
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM ivf_ranked WHERE rank <= 5
    ),
    hits AS (
      SELECT b.query_id, COUNT(*) AS n_hit
      FROM bf b JOIN ivf i ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
      GROUP BY b.query_id
    )
    SELECT b.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COALESCE(ANY_VALUE(h.n_hit), 0) AS BIGINT) AS n_hit,
           ROUND(CAST(COALESCE(ANY_VALUE(h.n_hit), 0) AS DOUBLE) / COUNT(*), 4) AS recall
    FROM bf b LEFT JOIN hits h ON b.query_id = h.query_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """,
)
def ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of multi-probe IVF (nprobe=2) against the exact brute-force
    baseline, per query — the number the round-3 verdict asked the ANN
    family to report instead of assuming. Both result sets come from the
    registered operators themselves; the comparison is one broadcast-sized
    join over (query × k) rows."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.centroids_by_label(emb)
    q = _queries_vecs(spark, sf_dir)
    bf = sim.knn_bruteforce(emb, q, k=5).select("query_id", "neighbor_id")
    ivf = sim.knn_ivf(emb, q, cents, k=5, nprobe=2).select("query_id", "neighbor_id")
    hits = bf.join(ivf, ["query_id", "neighbor_id"], "left_semi")
    n_exact = bf.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_exact.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.col("n_exact"), 4
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity-bucketed sampling (round 4): score every doc by
# mean unigram log-prob under the corpus's own distribution, cut the corpus
# into head/middle/tail terciles (Wenzek et al. 2020's quality buckets,
# model-free variant), and draw a deterministic per-bucket quota sample —
# the standard recipe for building a quality-stratified training mix.
# ---------------------------------------------------------------------------
from dataquality_ml_spark.operators import relational as rel  # noqa: E402
from dataquality_ml_spark.queries import _TOKS_CTE  # noqa: E402


@register(
    "perplexity_bucket_sample",
    oracle=f"""
    WITH {_TOKS_CTE},
    tk AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    cnt AS (SELECT tok, COUNT(*) AS tf FROM tk GROUP BY tok),
    tot AS (SELECT SUM(tf) AS total FROM cnt),
    v AS (SELECT tok, ln(tf / CAST(total AS DOUBLE)) AS logp FROM cnt, tot),
    lp AS (
      SELECT doc_id, ROUND(AVG(logp), 4) AS mean_logprob
      FROM tk JOIN v USING (tok) GROUP BY doc_id
    ),
    th AS (
      SELECT
        ROUND(percentile_cont(0.3333333333333333) WITHIN GROUP (ORDER BY mean_logprob), 6) AS t1,
        ROUND(percentile_cont(0.6666666666666666) WITHIN GROUP (ORDER BY mean_logprob), 6) AS t2
      FROM lp
    ),
    b AS (
      SELECT doc_id, mean_logprob,
        CASE WHEN mean_logprob <= t1 THEN 'tail'
             WHEN mean_logprob <= t2 THEN 'middle'
             ELSE 'head' END AS bucket
      FROM lp, th
    ),
    r AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY bucket
        ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS INTEGER) AS sample_rank
      FROM b
    )
    SELECT doc_id, bucket, mean_logprob, sample_rank
    FROM r WHERE sample_rank <= 50
    ORDER BY bucket, doc_id
    """,
)
def perplexity_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified corpus sampling: unigram log-prob score (the
    model-free perplexity), tercile thresholds from ONE percentile agg
    (rounded 6 dp so the bucket comparison is engine-portable), bucket by
    broadcast-scalar comparison (narrow scan, no shuffle), then the
    hash-cutoff quota sampler draws 50 docs per bucket without a
    corpus-wide window — at 100 TB only ~margin·n candidates per bucket
    ever reach the rank window."""
    docs = _t(spark, sf_dir, "documents")
    # localCheckpoint: the logprob scan (token explode + vocab join) feeds
    # both the threshold agg and the bucketed sample — materialize it once
    # instead of paying the explode+join twice (same RDD-owned-block
    # rationale as simhash_hamming_pairs; ~2x at sf0.1)
    lp = (
        tx.unigram_logprob(docs)
        .select("doc_id", "mean_logprob")
        .localCheckpoint(eager=False)
    )
    from dataquality_ml_spark.operators.thresholds import _exact_quantiles

    # distributed exact terciles (round 8): mean_logprob is continuous, so
    # |distinct| ≈ |docs| and the former single-buffer percentile
    # aggregate was the VERDICT r7 item 2 hazard; values bit-equal
    tq = _exact_quantiles(
        lp, "mean_logprob", [0.3333333333333333, 0.6666666666666666]
    )
    t1, t2 = (round(q, 6) for q in tq)
    b = lp.withColumn(
        "bucket",
        F.when(F.col("mean_logprob") <= F.lit(t1), "tail")
        .when(F.col("mean_logprob") <= F.lit(t2), "middle")
        .otherwise("head"),
    )
    return (
        rel.quota_sample(b, "bucket", "doc_id", n_per_group=50)
        .select(
            "doc_id", "bucket", "mean_logprob",
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
        .orderBy("bucket", "doc_id")
    )


@register(
    "span_dedup_docs",
    oracle=f"""
    WITH {_TOKS_CTE},
    st AS (SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t), 1), 3)) AS s
           FROM toks),
    ch AS (SELECT doc_id, CAST((s - 1) / 3 AS BIGINT) AS chunk_idx,
             array_to_string(t[s:s+2], ' ') AS chunk_text FROM st),
    m AS (
      SELECT doc_id, chunk_idx, chunk_text,
             COUNT(*) OVER (PARTITION BY chunk_text) AS span_count,
             ROW_NUMBER() OVER (
               PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn
      FROM ch
    ),
    k AS (SELECT doc_id, chunk_idx, chunk_text, span_count,
            (span_count < 2 OR rn = 1) AS kept FROM m)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(
             list(chunk_text ORDER BY chunk_idx) FILTER (WHERE kept),
             ' '), '') AS clean_text
    FROM k GROUP BY doc_id ORDER BY doc_id
    """,
)
def span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (Lee et al. 2022 keep-first policy) over
    3-token tiling spans: repeated spans are dropped corpus-wide except
    their global first occurrence, then documents are reconstructed from
    the survivors. Count + global-first are algebraic aggregates on the
    60-bit span hash (map-side combine absorbs boilerplate hot keys; AQE
    skew-splits the join-back), one groupBy folds back per doc; at sf0.01
    the rule removes ~19% of spans, so both policy branches are
    exercised."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.dedup import dedup_spans, reconstruct_spans
    from dataquality_ml_spark.operators.text import chunk_documents
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        chunks = chunk_documents(_docs_nfc(spark, sf_dir), chunk=3, overlap=0)
        return reconstruct_spans(dedup_spans(chunks)).orderBy("doc_id")


from dataquality_ml_spark.queries import _kmeans_cte  # noqa: E402


@register(
    "semdedup_embeddings",
    oracle=f"""
    WITH {_kmeans_cte(4)},
    members AS (
      SELECT v.vec_id, v.emb, sqrt(list_dot_product(v.emb, v.emb)) AS nrm,
             a.cluster
      FROM vecs v JOIN a3 a USING (vec_id)
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) + 0 AS cs
      FROM members a JOIN members b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    ),
    w AS (
      SELECT id_b AS vec_id, MIN(id_a) AS dup_of
      FROM pairs WHERE cs >= 0.25 GROUP BY id_b
    )
    SELECT m.vec_id, m.cluster, (w.dup_of IS NULL) AS kept, w.dup_of
    FROM members m LEFT JOIN w USING (vec_id)
    ORDER BY m.vec_id
    """,
)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): deterministic k-means clustering
    (k=4, 2 Lloyd iterations) then within-cluster cosine pruning at
    tau=0.25 under the lowest-id witness rule — per-vector keep/evict
    decisions with the evicting witness. The pair space exists only
    inside the per-cluster GEMM; below-threshold pairs never become
    rows."""
    from dataquality_ml_spark.operators import similarity as sim_ops

    emb = _t(spark, sf_dir, "embeddings")
    from dataquality_ml_spark.queries import _memo_kmeans

    cents = _memo_kmeans(spark, sf_dir, k=4, iters=2)
    return sim_ops.semdedup(emb, cents, tau=0.25).orderBy("vec_id")


@register(
    "leakage_safe_split_docs",
    oracle=f"""
    WITH RECURSIVE {_TOKS_CTE},
    {_SH_CTE},
    sizes AS (SELECT doc_id, len(shs) AS n_sh FROM sh),
    ex AS (SELECT doc_id, CAST('0x' || substr(md5(unnest(shs)), 1, 15) AS BIGINT) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.8
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b
    ),
    comp AS (SELECT node AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY node),
    alldocs AS (
      SELECT d.doc_id, COALESCE(c.keep_id, d.doc_id) AS keep_id
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    u AS (
      SELECT doc_id, keep_id,
        CAST('0x' || substr(md5('split|' || CAST(keep_id AS VARCHAR)), 1, 8)
             AS BIGINT) / 4294967296.0 AS uu
      FROM alldocs
    )
    SELECT doc_id, keep_id,
           CASE WHEN uu < 0.8 THEN 'train'
                WHEN uu < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM u ORDER BY doc_id
    """,
)
def leakage_safe_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe corpus split: near-dup clusters (n-gram Jaccard pairs
    -> connected components) define the split unit, so a test document can
    never have a near-duplicate in train. Unpaired docs are their own
    cluster; the 80/10/10 assignment hashes the cluster representative —
    stable under corpus growth, zero-shuffle once clusters exist."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators import dedup as dd
    from dataquality_ml_spark.operators import graph as gr
    from dataquality_ml_spark.operators.relational import leakage_safe_split
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        pairs = dd.ngram_jaccard_pairs(
            docs, k=5, threshold=0.8, on_hot_shingle="exact"
        ).select("id_a", "id_b")
        clusters = gr.dedup_clusters(pairs).select("doc_id", "keep_id")
        grouped = (
            docs.select("doc_id")
            .join(clusters, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("keep_id"), F.col("doc_id")).alias("keep_id"),
            )
        )
        return leakage_safe_split(grouped, "keep_id").orderBy("doc_id")


@register(
    "embedding_profile_report",
    oracle="""
    WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    ex AS (
      SELECT CAST(generate_subscripts(emb, 1) - 1 AS INTEGER) AS pos,
             unnest(emb) AS v
      FROM vecs
    ),
    dims AS (
      SELECT pos, CAST(COUNT(*) AS BIGINT) AS n, ROUND(AVG(v), 4) AS mean,
             ROUND(COALESCE(stddev_samp(v), 0), 4) AS std,
             ROUND(MIN(v), 4) AS min, ROUND(MAX(v), 4) AS max,
             ROUND(AVG(CASE WHEN v = 0 THEN 1.0 ELSE 0.0 END), 4) AS frac_zero
      FROM ex GROUP BY pos
    ),
    nr AS (
      SELECT CAST(-1 AS INTEGER) AS pos, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(AVG(nv), 4) AS mean,
             ROUND(COALESCE(stddev_samp(nv), 0), 4) AS std,
             ROUND(MIN(nv), 4) AS min, ROUND(MAX(nv), 4) AS max,
             ROUND(AVG(CASE WHEN nv = 0 THEN 1.0 ELSE 0.0 END), 4) AS frac_zero
      FROM (SELECT sqrt(list_dot_product(emb, emb)) AS nv
            FROM vecs WHERE emb IS NOT NULL)
    )
    SELECT * FROM dims UNION ALL SELECT * FROM nr ORDER BY pos
    """,
)
def embedding_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column health gate: per-dimension n/mean/std/min/max/
    frac_zero plus the L2-norm distribution as the pos=-1 row — collapsed
    or scale-drifted dimensions and zero-vector bursts surface here before
    they silently destroy ANN recall. Shuffle volume is dims x partition
    partials regardless of corpus size."""
    from dataquality_ml_spark.operators.similarity import embedding_profile

    return embedding_profile(_t(spark, sf_dir, "embeddings")).orderBy("pos")


@register(
    "semdedup_centroid_keep",
    oracle=f"""
    WITH {_kmeans_cte(4)},
    mem AS (
      SELECT v.vec_id, v.emb, sqrt(list_dot_product(v.emb, v.emb)) AS nrm,
             a.cluster
      FROM vecs v JOIN a3 a USING (vec_id)
    ),
    pc AS (
      SELECT m.vec_id, m.cluster, m.emb, m.nrm,
             ROUND(list_dot_product(m.emb, c.emb)
               / (m.nrm * sqrt(list_dot_product(c.emb, c.emb))), 6) + 0 AS csim
      FROM mem m JOIN c2 c ON m.cluster = c.cid
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.csim AS csim_a, b.csim AS csim_b,
             ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) + 0 AS cs
      FROM pc a JOIN pc b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    ),
    orient AS (
      SELECT CASE WHEN (csim_a, id_a) < (csim_b, id_b)
                  THEN id_b ELSE id_a END AS victim,
             CASE WHEN (csim_a, id_a) < (csim_b, id_b)
                  THEN id_a ELSE id_b END AS witness,
             CASE WHEN (csim_a, id_a) < (csim_b, id_b)
                  THEN csim_a ELSE csim_b END AS wcsim
      FROM pairs WHERE cs >= 0.25
    ),
    sel AS (
      SELECT victim, witness,
             ROW_NUMBER() OVER (
               PARTITION BY victim ORDER BY wcsim, witness) AS rn
      FROM orient
    ),
    w AS (SELECT victim AS vec_id, witness AS dup_of FROM sel WHERE rn = 1)
    SELECT p.vec_id, p.cluster, (w.dup_of IS NULL) AS kept, w.dup_of
    FROM pc p LEFT JOIN w USING (vec_id)
    ORDER BY p.vec_id
    """,
)
def semdedup_centroid_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup under the PAPER's keep rule: within each tau-duplicate
    witness chain the member LEAST similar to its cluster centroid
    survives (keep the least-typical example — Abbas et al. 2023 §3).
    Priority = (centroid cosine asc, id asc), zero-shuffle literal-
    centroid expression; everything else matches semdedup_embeddings."""
    from dataquality_ml_spark.operators import similarity as sim_ops

    emb = _t(spark, sf_dir, "embeddings")
    from dataquality_ml_spark.queries import _memo_kmeans

    cents = _memo_kmeans(spark, sf_dir, k=4, iters=2)
    return sim_ops.semdedup(
        emb, cents, tau=0.25, keep="centroid_far"
    ).orderBy("vec_id")


@register(
    "corpus_health_by_source",
    oracle=f"""
    WITH {_TOKS_CTE},
    q AS (
      SELECT d.doc_id, d.source, d.lang, len(t.t) AS n_tokens,
             md5(array_to_string(list_sort(list_distinct(t.t)), ' ')) AS fp,
             (len(t.t) >= 10
              AND ROUND((length(d.text) - length(regexp_replace(d.text, '[.!?,;:]', '', 'g')))
                    / CAST(length(d.text) AS DOUBLE), 4) <= 0.1
              AND ROUND((length(d.text) - length(regexp_replace(d.text, '[0-9]', '', 'g')))
                    / CAST(length(d.text) AS DOUBLE), 4) <= 0.2) AS hq
      FROM documents d JOIN toks t USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(1 - COUNT(DISTINCT fp) / CAST(COUNT(*) AS DOUBLE), 4) AS dup_frac,
           ROUND(AVG(n_tokens), 2) AS avg_tokens,
           ROUND(AVG(CASE WHEN hq THEN 1.0 ELSE 0.0 END), 4) AS high_quality_frac,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM q GROUP BY source ORDER BY source
    """,
)
def corpus_health_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard — the monitoring face of the
    curation pipeline: doc counts, exact-dup fraction (bag-of-words
    fingerprint collisions within the source), token-length mean, the
    high-quality fraction under the standard filter, and language spread.
    One scan + one grouped agg; every metric is map-side combinable except
    the two COUNT(DISTINCT)s, which expand keyed by (source, value) —
    still |sources|-bounded output."""
    from dataquality_ml_spark.functions.scalar import bow_fingerprint

    docs = _t(spark, sf_dir, "documents")
    q = tx.text_quality(docs)
    j = docs.select(
        "doc_id", "source", "lang", bow_fingerprint("text").alias("fp")
    ).join(q.select("doc_id", "n_tokens", "is_high_quality"), "doc_id")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                1 - F.countDistinct("fp") / F.count(F.lit(1)).cast("double"), 4
            ).alias("dup_frac"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.round(
                F.avg(F.col("is_high_quality").cast("double")), 4
            ).alias("high_quality_frac"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


@register(
    "winnow_dup_pairs_docs",
    oracle=f"""
    WITH {_TOKS_CTE},
    hs AS (
      SELECT doc_id,
        [CAST('0x' || substr(md5(t[i]), 1, 8) AS BIGINT)
         for i in generate_series(1, len(t))] AS th
      FROM toks WHERE len(t) >= 4
    ),
    seqs AS (
      SELECT doc_id,
        [list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+3]),
                     (a, b) -> (a * 65599 + b) % 17592186044416)
         for i in generate_series(1, greatest(len(th) - 3, 1))] AS seq
      FROM hs
    ),
    wins AS (
      SELECT doc_id,
        list_distinct([list_min(seq[j:j+3])
                       for j in generate_series(1, greatest(len(seq) - 3, 1))]) AS fps
      FROM seqs
    ),
    ex AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared FROM pairs
    WHERE n_shared >= 2 ORDER BY id_a, id_b
    """,
)
def winnow_dup_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed near-dup candidates (Schleimer et al. SIGMOD'03): select
    the min hash of every w=4 window over the ordered 4-gram hash
    sequence — any shared run of >= w+k-1 = 7 tokens still collides, but
    the inverted index is ~4x sparser than the full shingle index, the
    cost knob for substring-level dedup at 100 TB. Pairs sharing >= 2
    selected prints survive."""
    from dataquality_ml_spark.operators.dedup import winnow_dup_pairs

    return winnow_dup_pairs(
        _t(spark, sf_dir, "documents"), k=4, w=4, min_shared=2
    )


def _incremental_minhash_oracle() -> str:
    from dataquality_ml_spark.operators.dedup import MINHASH_P, minhash_perms

    perms = minhash_perms(16)
    sig_exprs = ",\n      ".join(
        f"list_aggregate(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P}),"
        f" 'min') AS s{i}"
        for i, (a, b) in enumerate(perms)
    )
    band_rows = []
    for b in range(4):
        key = f"'{b}-' || " + " || ',' || ".join(
            f"CAST(s{b * 4 + r} AS VARCHAR)" for r in range(4)
        )
        band_rows.append(f"SELECT doc_id, {key} AS band FROM sigs")
    bands_sql = " UNION ALL ".join(band_rows)
    est = " + ".join(
        f"(CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END)" for i in range(16)
    )
    return f"""
    WITH {_TOKS_CTE},
    {_SH_CTE},
    hsh AS (
      SELECT doc_id, list_distinct(list_transform(shs,
        s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT))) AS hs
      FROM sh
    ),
    sigs AS (SELECT doc_id, {sig_exprs} FROM hsh),
    bands AS ({bands_sql}),
    bb AS (SELECT b.* FROM bands b JOIN documents d USING (doc_id)
           WHERE d.source = 'src0'),
    cb AS (SELECT b.* FROM bands b JOIN documents d USING (doc_id)
           WHERE d.source <> 'src0'),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_new, r.doc_id AS corpus_id
      FROM bb l JOIN cb r ON l.band = r.band
    ),
    e AS (
      SELECT c.id_new AS doc_id, c.corpus_id,
             ROUND(({est}) / 16.0, 4) AS est_jaccard
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.id_new
      JOIN sigs sb ON sb.doc_id = c.corpus_id
    )
    SELECT doc_id, corpus_id, est_jaccard FROM e
    WHERE est_jaccard >= 0.5 ORDER BY doc_id, corpus_id
    """


@register("incremental_minhash_docs", oracle=_incremental_minhash_oracle())
def incremental_minhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup probe: the src0 batch is checked against the
    rest-of-corpus MinHash SIGNATURE index (the |corpus| x 16-long
    artifact a daily pipeline persists) — banding equi-join for
    candidates, signature-agreement Jaccard estimate for verification;
    the corpus never re-shingles."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators import dedup as dd2
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        corpus = docs.where(F.col("source") != "src0")
        batch = docs.where(F.col("source") == "src0")
        corpus_sigs = dd2.minhash_signatures(dd2.with_hashed_shingles(corpus))
        return dd2.incremental_minhash_dedup(batch, corpus_sigs, threshold=0.5)


@register(
    "token_drift_sources",
    oracle=f"""
    WITH {_TOKS_CTE},
    ta AS (SELECT unnest(t.t) AS token FROM toks t
           JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
    tb AS (SELECT unnest(t.t) AS token FROM toks t
           JOIN documents d USING (doc_id) WHERE d.source <> 'src0'),
    ca AS (SELECT token, COUNT(*) AS n FROM ta GROUP BY token),
    cb AS (SELECT token, COUNT(*) AS n FROM tb GROUP BY token),
    fa AS (SELECT token, n / CAST((SELECT SUM(n) FROM ca) AS DOUBLE) AS p_a
           FROM (SELECT token, n FROM ca ORDER BY n DESC, token LIMIT 10)),
    fb AS (SELECT token, n / CAST((SELECT SUM(n) FROM cb) AS DOUBLE) AS p_b
           FROM (SELECT token, n FROM cb ORDER BY n DESC, token LIMIT 10))
    SELECT token,
      ROUND(COALESCE(p_a, 0) + 1e-06, 6) AS p_a,
      ROUND(COALESCE(p_b, 0) + 1e-06, 6) AS p_b,
      ROUND((COALESCE(p_a, 0) - COALESCE(p_b, 0))
            * ln((COALESCE(p_a, 0) + 1e-06) / (COALESCE(p_b, 0) + 1e-06)),
            6) AS psi_term
    FROM fa FULL OUTER JOIN fb USING (token)
    ORDER BY token
    """,
)
def token_drift_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between the src0 snapshot and the rest of
    the corpus: per-token PSI contributions over the union of each side's
    top-10 tokens (smoothed for one-sided tokens). SUM(psi_term) > 0.2 is
    the retrain-grade alarm, same convention as the events PSI monitor."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        return tx.token_drift(
            docs.where(F.col("source") == "src0"),
            docs.where(F.col("source") != "src0"),
            top_k=10,
        )


@register("quality_classifier_docs")  # rows-only: LR training not SQL-expressible
def quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality classifier lifecycle in one query: compute
    text statistics, train logistic regression on the heuristic filter's
    weak labels (self-distillation — production swaps gold labels), score
    every document with a calibrated high-quality probability. Rows-only
    gate: the L-BFGS solve is not SQL-expressible; tests assert the model
    separates planted junk from clean text, and the ENTIRE serving path
    (featurize -> standardize -> sigmoid) is hash-gated end-to-end by
    ``quality_score_fixed_weights_docs`` with the weights as literals."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.ml.mllib_pipeline import (
        fit_quality_classifier,
        score_quality,
    )
    from dataquality_ml_spark.queries import _docs_nfc

    # normalize once, then fit+score (4+ tokenization passes) skip the
    # per-pass NFC Arrow round-trip — see _docs_nfc
    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        model = fit_quality_classifier(docs)
        return score_quality(docs, model).orderBy("doc_id")


@register(
    "snapshot_diff_docs",
    oracle="""
    WITH old AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' legacy' ELSE text END) AS h
      FROM documents WHERE doc_id % 7 <> 0
    ),
    new AS (SELECT doc_id, md5(text) AS h FROM documents)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.h = n.h THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    ORDER BY doc_id
    """,
)
def snapshot_diff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus release diff: yesterday's snapshot (docs except every 7th,
    with every 5th carrying legacy content) against today's full corpus —
    added / removed-is-impossible-here / changed / unchanged per doc via
    content-hash comparison over a narrow (id, hash) full-outer join."""
    from dataquality_ml_spark.operators.relational import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" legacy"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(old, docs).orderBy("doc_id")


@register(
    "bigram_logprob_docs",
    oracle=f"""
    WITH {_TOKS_CTE},
    bgl AS (
      SELECT doc_id,
             unnest([struct_pack(v := t[i], w := t[i+1])
                     for i in generate_series(1, len(t) - 1)]) AS b
      FROM toks WHERE len(t) >= 2
    ),
    bg AS (SELECT doc_id, b.v AS v, b.w AS w FROM bgl),
    bgc AS (SELECT v, w, COUNT(*) AS c_vw FROM bg GROUP BY v, w),
    ex AS (SELECT unnest(t) AS w FROM toks),
    uni AS (SELECT w, COUNT(*) AS c_w FROM ex GROUP BY w),
    tot AS (SELECT SUM(c_w) AS total FROM uni)
    SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      ROUND(AVG(ln(0.7 * (bgc.c_vw / CAST(u1.c_w AS DOUBLE))
                   + (1 - 0.7) * (u2.c_w / CAST(total AS DOUBLE)))), 4)
        AS mean_logprob
    FROM bg
    JOIN bgc USING (v, w)
    JOIN uni u1 ON u1.w = bg.v
    JOIN uni u2 ON u2.w = bg.w
    CROSS JOIN tot
    GROUP BY bg.doc_id ORDER BY bg.doc_id
    """,
)
def bigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality score (lam=0.7): transition-aware
    model-free perplexity — word-salad docs with plausible unigrams but
    random transitions score low. Vocab aggs map-side combine; scoring is
    vocab-keyed joins, nothing collected."""
    return tx.bigram_logprob(_t(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "pack_pieces_docs",
    oracle=f"""
    WITH {_TOKS_CTE},
    n AS (SELECT doc_id, len(t) AS n_tokens FROM toks),
    c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      FROM n
    ),
    pieces AS (
      SELECT doc_id, strt, n_tokens,
             unnest(generate_series(CAST(strt // 256 AS BIGINT),
                                    CAST((strt + n_tokens - 1) // 256 AS BIGINT)))
               AS seq_id
      FROM c WHERE n_tokens > 0
    )
    SELECT seq_id, doc_id,
      CAST(GREATEST(strt, seq_id * 256) - seq_id * 256 AS BIGINT)
        AS piece_offset,
      CAST(LEAST(strt + n_tokens - 1, seq_id * 256 + 255)
           - GREATEST(strt, seq_id * 256) + 1 AS BIGINT) AS piece_len
    FROM pieces ORDER BY seq_id, doc_id
    """,
)
def pack_pieces_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-sequence manifest (budget=256): every (sequence, doc piece)
    with in-sequence offset and split length, straddling docs included —
    the attention-boundary map for packed training examples. Composes the
    distributed prefix-sum packer with a narrow interval-clipping
    explode; the oracle recomputes from the naive window form."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.packing import pack_pieces, pack_sequences
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        n_df = tx.token_stats(_docs_nfc(spark, sf_dir)).select(
            "doc_id", "n_tokens"
        )
        packed = pack_sequences(n_df, budget=256)
        return pack_pieces(packed, budget=256).orderBy("seq_id", "doc_id")


# ===========================================================================
# Round 4 (cont.): data selection — DSIR importance resampling
# ===========================================================================


@register(
    "dsir_resample_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(nfc_normalize(text))), '\\s+') AS t
      FROM documents
    ),
    hh AS (
      SELECT doc_id, lang,
             [CAST('0x' || substr(md5(t[i]), 1, 8) AS BIGINT)
              for i in generate_series(1, len(t))] AS h
      FROM toks
    ),
    fb AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               [x % 1024 for x in h],
               [(h[i] * 31 + h[i + 1]) % 1024
                for i in generate_series(1, len(h) - 1)])) AS bucket
      FROM hh
    ),
    ct AS (SELECT bucket, COUNT(*) AS ct FROM fb WHERE lang = 'en' GROUP BY bucket),
    cr AS (SELECT bucket, COUNT(*) AS cr FROM fb WHERE lang <> 'en' GROUP BY bucket),
    tt AS (SELECT SUM(ct) AS t_tgt FROM ct),
    tr AS (SELECT SUM(cr) AS t_raw FROM cr),
    lam AS (
      SELECT cr.bucket,
             ln((COALESCE(ct.ct, 0) + 1.0) / (t_tgt + 1.0 * 1024))
           - ln((cr.cr + 1.0) / (t_raw + 1.0 * 1024)) AS lam
      FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tt CROSS JOIN tr
    ),
    w AS (
      SELECT fb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
             ROUND(SUM(lam), 4) AS logw
      FROM fb JOIN lam USING (bucket)
      WHERE fb.lang <> 'en'
      GROUP BY fb.doc_id
    )
    SELECT doc_id, n_feats, logw,
           ROUND(logw + (-ln(-ln(
             (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)
                   AS BIGINT) + 0.5) / 4294967296.0))), 4) AS score
    FROM w
    ORDER BY score DESC, doc_id
    LIMIT 150
    """,
)
def dsir_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): treat the ``lang='en'``
    slice as the target distribution and resample 150 docs from the rest
    with probability ∝ exp(hashed-ngram importance weight), via the
    deterministic Gumbel top-k.  Both bucket models are 1024-row broadcast
    relations; the corpus sees two explode+groupBy passes and a TakeOrdered
    — no corpus-wide window or sort."""
    from dataquality_ml_spark.operators.selection import dsir_resample

    docs = _t(spark, sf_dir, "documents")
    return dsir_resample(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
        k=150,
    )


# ===========================================================================
# Round 4 (cont.): distributed BPE tokenizer training
# ===========================================================================

_BPE_N = 6

_TOK_MEMO: dict = {}


def _memo_bpe_merges(spark: SparkSession, sf_dir: str, num_merges: int = 6):
    """Memoized BPE merge training: deterministic (tie-broken) merges over
    the same corpus are model parameters — the four BPE queries that each
    retrained them now share one fit per (sf_dir, data fingerprint), the
    quantizer-memo pattern applied to tokenizers."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.bpe import bpe_train
    from dataquality_ml_spark.queries import _docs_nfc, _parquet_fingerprint

    key = (
        "bpe",
        sf_dir,
        _parquet_fingerprint(f"{sf_dir}/documents.parquet"),
        num_merges,
    )
    if key not in _TOK_MEMO:
        with pre_normalized():
            _TOK_MEMO[key] = bpe_train(
                _docs_nfc(spark, sf_dir), num_merges=num_merges
            )
    return _TOK_MEMO[key]


def _ug_shared(spark: SparkSession, sf_dir: str):
    """Memoized unigram-LM shared artifacts per (sf_dir, data
    fingerprint): the NFC word-count relation (checkpointed — the one
    corpus pass), the seed-probability list, and the Viterbi word
    segmentation under the seed LM (checkpointed — the DP).  The four
    unigram queries derive these from identical inputs; train once,
    reuse.  Returns (wc, probs, seg)."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators import unigram as ug
    from dataquality_ml_spark.queries import _docs_nfc, _parquet_fingerprint

    key = ("ug", sf_dir, _parquet_fingerprint(f"{sf_dir}/documents.parquet"))
    hit = _TOK_MEMO.get(key)
    if hit is None:
        with pre_normalized():
            wc = ug.word_counts(_docs_nfc(spark, sf_dir)).localCheckpoint(
                eager=True
            )
            srows = ug.seed_pieces(wc, _UG_ML, _UG_MP).collect()
            tot = sum(r["freq"] for r in srows)
            probs = [(r["piece"], r["freq"] / tot) for r in srows]
            pdf = spark.createDataFrame(probs, "piece string, prob double")
            seg = ug.viterbi_segment_words(
                wc, pdf, _UG_ML, max_word_len=_UG_L
            ).localCheckpoint(eager=True)
        hit = (wc, probs, seg)
        _TOK_MEMO[key] = hit
    return hit


# Double-separator word symbol string (mirrors operators/bpe.py
# word_symbol_str): '··c··h··</w>··'.
_BPE_WORD_EXPR = "regexp_replace(word, '(.)', '··\\1', 'g') || '··</w>··'"


def _bpe_merge_cascade(n: int, expr: str = _BPE_WORD_EXPR) -> str:
    """Chain the n learned merges over a symbol-string expression, one
    '·l··r·' → '·lr·' replace per merge — identical semantics to the
    Spark-side merge_pattern cascade (true left-to-right BPE, single pass
    per merge; see operators/bpe.py module docstring)."""
    for i in range(1, n + 1):
        expr = (
            f"replace({expr}, "
            f"'·' || (SELECT lhs FROM p{i}) || '··' || (SELECT rhs FROM p{i}) || '·', "
            f"'·' || (SELECT lhs FROM p{i}) || (SELECT rhs FROM p{i}) || '·')"
        )
    return expr


def _bpe_train_ctes(n: int, corpus_where: str = "") -> str:
    """Unrolled BPE training as DuckDB CTEs: v0 is the symbol-string vocab;
    each step i computes pair counts from v{i-1}, picks the argmax pair
    (count desc, lhs, rhs) into p{i}, and applies it with the anchored
    separator replace into v{i} — the same string algebra the Spark
    operator runs.  ``corpus_where`` optionally restricts the training
    corpus (vocabulary-coverage experiments)."""
    parts = [
        f"ex AS MATERIALIZED (SELECT unnest(t) AS word FROM toks{corpus_where})",
        "words AS MATERIALIZED (SELECT word, COUNT(*) AS cnt FROM ex WHERE word <> '' "
        "GROUP BY word)",
        # Double-separator symbol encoding (see operators/bpe.py module
        # docstring): every boundary is '··', the merge pattern '·l··r·'
        # consumes one separator per side and restores one, so single-pass
        # replace == true left-to-right BPE even for back-to-back repeats.
        "v0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', '··\\1', 'g')"
        " || '··</w>··' AS word_str, cnt FROM words)",
    ]
    for i in range(1, n + 1):
        prev = f"v{i - 1}"
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT cnt, list_filter(string_split(word_str, '·'),"
            f" x -> x <> '') AS s FROM {prev})"
        )
        parts.append(
            f"pc{i} AS MATERIALIZED (SELECT s[idx] AS lhs, s[idx + 1] AS rhs, SUM(cnt) AS total "
            f"FROM (SELECT cnt, s, unnest(generate_series(1, len(s) - 1)) AS idx "
            f"FROM s{i} WHERE len(s) >= 2) GROUP BY 1, 2)"
        )
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT lhs, rhs, total FROM pc{i} "
            f"ORDER BY total DESC, lhs, rhs LIMIT 1)"
        )
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT replace(word_str, "
            f"'·' || (SELECT lhs FROM p{i}) || '··' || (SELECT rhs FROM p{i}) || '·', "
            f"'·' || (SELECT lhs FROM p{i}) || (SELECT rhs FROM p{i}) || '·') "
            f"AS word_str, cnt FROM {prev})"
        )
    return ",\n    ".join(parts)


def _bpe_merges_oracle(n: int = _BPE_N) -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    selects = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, CAST(total AS BIGINT) AS cnt FROM p{i}"
        for i in range(1, n + 1)
    )
    return (
        f"WITH {_TOKS_CTE},\n    {_bpe_train_ctes(n)}\n    "
        f"{selects} ORDER BY merge_rank"
    )


def _bpe_segment_oracle(n: int = _BPE_N) -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    expr = _bpe_merge_cascade(n)
    return f"""
    WITH {_TOKS_CTE},
    {_bpe_train_ctes(n)},
    exd AS (SELECT doc_id, unnest(t) AS word FROM toks),
    seg AS (
      SELECT doc_id, length(word) AS n_chars,
             len(list_filter(string_split({expr}, '·'), x -> x <> '')) AS n_sub
      FROM exd WHERE word <> ''
    )
    SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
           ROUND(SUM(n_chars) / CAST(SUM(n_sub) AS DOUBLE), 4) AS chars_per_subword
    FROM seg GROUP BY doc_id ORDER BY doc_id
    """


@register("bpe_merges_docs", oracle=_bpe_merges_oracle())
def bpe_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 6 BPE merges learned on the documents corpus (Sennrich et al.
    2016).  One corpus-scale word-count pass; every merge iteration runs on
    the vocab relation only, with a 1-row argmax collect per merge (model
    parameters).  Ties break (count desc, lhs, rhs) so training is
    engine-portable; the oracle replays training step-for-step in SQL."""
    from dataquality_ml_spark.operators.bpe import bpe_merge_df, bpe_train

    merges = _memo_bpe_merges(spark, sf_dir, num_merges=_BPE_N)
    return bpe_merge_df(spark, merges).orderBy("merge_rank")


@register("bpe_segment_docs", oracle=_bpe_segment_oracle())
def bpe_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 6 learned merges back to the corpus: per-doc subword count
    (word-end marker counts as a symbol until merged, same on both engines)
    and chars-per-subword compression.  The merge list rides in the plan as
    a literal replace cascade — no UDF, one explode + one groupBy."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.bpe import bpe_segment, bpe_train
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        merges = _memo_bpe_merges(spark, sf_dir, num_merges=_BPE_N)
        return bpe_segment(docs, merges).orderBy("doc_id")


# ===========================================================================
# Round 4 (cont.): JL projection + int8 embedding quantization
# ===========================================================================


def _jl_oracle(in_dim: int = 64, out_dim: int = 8) -> str:
    from dataquality_ml_spark.operators.similarity import jl_signs

    import math

    inv = 1.0 / math.sqrt(out_dim)
    comps = []
    for row in jl_signs(in_dim, out_dim):
        lits = ", ".join(f"{float(s)}" for s in row)
        comps.append(
            f"ROUND(list_dot_product(embedding::DOUBLE[], [{lits}]) * {inv!r}, 6)"
        )
    arr = ",\n             ".join(comps)
    return f"""
    SELECT vec_id, [{arr}] AS proj
    FROM embeddings ORDER BY vec_id
    """


@register("jl_project_embeddings", oracle=_jl_oracle())
def jl_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sign projection 64 → 8 dims (Achlioptas 2003):
    the cheap distance-preserving dimension cut before ANN indexing.  The
    ±1 matrix is md5-derived and rides in the plan as literals — no side
    input, no join, one narrow codegen scan."""
    from dataquality_ml_spark.operators.similarity import jl_project

    return jl_project(_t(spark, sf_dir, "embeddings"), out_dim=8).orderBy("vec_id")


_INT8_ORACLE = """
    WITH ex AS (
      SELECT vec_id, unnest(generate_series(1, len(embedding))) AS pos
      FROM embeddings
    ),
    vals AS (
      SELECT ex.vec_id, ex.pos, e.embedding[ex.pos]::DOUBLE AS x
      FROM ex JOIN embeddings e USING (vec_id)
    ),
    scales AS (
      SELECT pos, ROUND(MAX(ABS(x)), 6) AS s FROM vals GROUP BY pos
    ),
    codes AS (
      SELECT vec_id, pos, x, s,
             CASE WHEN s = 0 THEN 0
                  ELSE GREATEST(-127, LEAST(127, CAST(ROUND(x / s * 127) AS INT)))
             END AS code
      FROM vals JOIN scales USING (pos)
    )
    SELECT vec_id,
           list(code ORDER BY pos) AS codes,
           ROUND(SUM(ABS(x - code * s / 127.0)) / COUNT(*), 6) AS dequant_mae
    FROM codes GROUP BY vec_id ORDER BY vec_id
    """


@register("embedding_int8_codes", oracle=_INT8_ORACLE)
def embedding_int8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dimension int8 quantization of the embedding corpus:
    4×-smaller codes plus the per-row dequantization MAE that makes
    quantization loss monitorable.  Scales are one posexplode aggregation
    collected as dim-many floats (model parameters) and ride back as
    literals; the encode pass is a narrow zip_with, no shuffle."""
    from dataquality_ml_spark.operators.similarity import int8_scales, quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    return quantize_int8(emb, int8_scales(emb)).orderBy("vec_id")


# ===========================================================================
# Round 4 (cont.): hard negatives + temperature source sampling
# ===========================================================================

_HARDNEG_ORACLE = """
    WITH a AS (
      SELECT vec_id AS anchor_id, label AS anchor_label,
             embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    c AS (
      SELECT vec_id AS neg_id, label AS neg_label, embedding::DOUBLE[] AS cv
      FROM embeddings
    ),
    scored AS (
      SELECT anchor_id, anchor_label, neg_id, neg_label,
             ROUND(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) *
                    sqrt(list_dot_product(cv, cv))), 4) + 0 AS sim
      FROM a, c WHERE neg_label != anchor_label
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY anchor_id ORDER BY sim DESC, neg_id) AS INTEGER) AS rank
      FROM scored
    )
    SELECT anchor_id, anchor_label, neg_id, neg_label, sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY anchor_id, rank
    """


@register("hard_negatives_embeddings", oracle=_HARDNEG_ORACLE)
def hard_negatives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor (vec_id <
    10, broadcast), the 5 most-similar corpus vectors with a different
    label — near-boundary negatives for triplet/InfoNCE losses.  Corpus
    streams through a broadcast nested-loop join, never shuffled."""
    from dataquality_ml_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    return hard_negatives(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "temperature_sample_sources",
    oracle="""
    WITH cnts AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
    tw AS (SELECT SUM(POW(cnt, 0.5)) AS t FROM cnts),
    q AS (
      SELECT source, LEAST(cnt, CAST(FLOOR(300 * POW(cnt, 0.5) / t) AS BIGINT))
               AS quota
      FROM cnts CROSS JOIN tw
    ),
    h AS (
      SELECT doc_id, source, (doc_id * 2654435761) % 4294967296 AS hv
      FROM documents
    ),
    r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id)
               AS sample_rank
      FROM h
    )
    SELECT r.doc_id, r.source, r.sample_rank
    FROM r JOIN q USING (source) WHERE sample_rank <= quota
    ORDER BY source, sample_rank
    """,
)
def temperature_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain re-balancing (q_s ∝ n_s^0.5, Conneau &
    Lample 2019): 300-doc budget allocated across sources by count^alpha,
    head sources down-weighted; selection is the deterministic hash-rank
    quota with the two-phase broadcast cutoff (the window never sees the
    corpus).  Oracle computes the naive full-window form."""
    from dataquality_ml_spark.operators.relational import temperature_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        temperature_sample(docs, "source", "doc_id", budget=300, alpha=0.5)
        .select("doc_id", "source", "sample_rank")
        .orderBy("source", "sample_rank")
    )


def _bpe_tokenize_oracle(n: int = _BPE_N) -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    seg = _bpe_merge_cascade(n)
    merged_rows = " UNION ALL ".join(
        f"SELECT (SELECT lhs FROM p{i}) || (SELECT rhs FROM p{i}) AS sym, "
        f"(SELECT c FROM nbase) + {i - 1} AS tid"
        for i in range(1, n + 1)
    )
    return f"""
    WITH {_TOKS_CTE},
    {_bpe_train_ctes(n)},
    chars AS MATERIALIZED (
      SELECT DISTINCT unnest([word[i] for i in generate_series(1, length(word))])
        AS ch
      FROM words
    ),
    base AS MATERIALIZED (
      SELECT ch, ROW_NUMBER() OVER (ORDER BY ch) - 1 AS tid
      FROM (SELECT ch FROM chars UNION SELECT '</w>' AS ch)
    ),
    nbase AS (SELECT COUNT(*) AS c FROM base),
    vocab AS MATERIALIZED (
      SELECT ch AS sym, tid FROM base UNION ALL {merged_rows}
    ),
    exd AS (
      SELECT doc_id,
             unnest([struct_pack(w := t[i], i := i)
                     for i in generate_series(1, len(t))]) AS x
      FROM toks WHERE doc_id < 40
    ),
    wseg AS (
      SELECT doc_id, x.i AS wpos,
             list_filter(string_split({seg.replace('word', 'x.w')}, '·'),
                         s -> s <> '') AS ss
      FROM exd WHERE x.w <> ''
    ),
    symrows AS (
      SELECT doc_id, wpos,
             unnest([struct_pack(s := ss[j], j := j)
                     for j in generate_series(1, len(ss))]) AS y
      FROM wseg
    )
    SELECT doc_id,
           list(COALESCE(v.tid, -1) ORDER BY wpos, y.j) AS token_ids,
           COUNT(*) AS n_ids
    FROM symrows LEFT JOIN vocab v ON v.sym = y.s
    GROUP BY doc_id ORDER BY doc_id
    """


@register("bpe_tokenize_docs", oracle=_bpe_tokenize_oracle())
def bpe_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full tokenizer lifecycle: train 6 merges, build the vocab (corpus
    chars + word-end marker id-ordered lexicographically, merged symbols in
    rank order), tokenize docs < 40 to id sequences.  Ids come from a
    broadcast vocab join over exploded symbols (a relation, not a literal
    map — scales to 100k entries); each doc's ids reassemble via
    array_sort(collect_list(struct)) — no corpus window."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.bpe import train_tokenizer
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        tok = train_tokenizer(docs, num_merges=_BPE_N)
        return tok.tokenize(docs.where(F.col("doc_id") < 40)).orderBy("doc_id")


def _bpe_pack_oracle(n: int = _BPE_N, budget: int = 512) -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    seg = _bpe_merge_cascade(n)
    return f"""
    WITH {_TOKS_CTE},
    {_bpe_train_ctes(n)},
    exd AS (SELECT doc_id, unnest(t) AS word FROM toks),
    seg AS (
      SELECT doc_id,
             len(list_filter(string_split({seg}, '·'), s -> s <> '')) AS n_sub
      FROM exd WHERE word <> ''
    ),
    n AS (SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS n_tokens
          FROM seg GROUP BY doc_id),
    c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      FROM n
    )
    SELECT doc_id, n_tokens,
           CAST(strt // {budget} AS BIGINT) AS seq_id,
           CAST(strt % {budget} AS BIGINT) AS seq_offset
    FROM c ORDER BY doc_id
    """


@register("bpe_pack_docs", oracle=_bpe_pack_oracle())
def bpe_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware packing: the REAL subword counts from the trained
    BPE tokenizer (not whitespace proxies) drive the distributed prefix-sum
    packer — the manifest a packed-training job actually needs.  Composes
    two oracle-gated operators; the oracle recomputes from the naive
    window."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.bpe import bpe_segment, bpe_train
    from dataquality_ml_spark.operators.packing import pack_sequences
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        merges = _memo_bpe_merges(spark, sf_dir, num_merges=_BPE_N)
        n_df = bpe_segment(docs, merges).select(
            "doc_id", F.col("n_subwords").alias("n_tokens")
        )
        return pack_sequences(n_df, budget=512).orderBy("doc_id")


# ===========================================================================
# Round 4 (cont.): DQ rule suggestion
# ===========================================================================


@register(
    "suggest_rules_events",
    oracle="""
    WITH base AS (SELECT event_type, value, user_id FROM events),
    s AS (
      SELECT COUNT(*) AS n,
             COUNT(event_type) AS nn_et, COUNT(DISTINCT event_type) AS nd_et,
             COUNT(value) AS nn_v,
             quantile_cont(value, 0.01) AS lo_v, quantile_cont(value, 0.99) AS hi_v,
             COUNT(user_id) AS nn_u,
             quantile_cont(user_id, 0.01) AS lo_u, quantile_cont(user_id, 0.99) AS hi_u
      FROM base
    ),
    sup AS (
      SELECT AVG(CASE WHEN value BETWEEN (SELECT lo_v FROM s) AND (SELECT hi_v FROM s)
                      THEN 1.0 ELSE 0.0 END) AS sup_v,
             AVG(CASE WHEN user_id BETWEEN (SELECT lo_u FROM s) AND (SELECT hi_u FROM s)
                      THEN 1.0 ELSE 0.0 END) AS sup_u,
             to_json(list_sort(list(DISTINCT event_type)
               FILTER (WHERE event_type IS NOT NULL))) AS set_et
      FROM base
    ),
    rows_out AS (
      SELECT 'event_type' AS "column", 'not_null' AS rule,
             CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi,
             CAST(NULL AS VARCHAR) AS vals,
             ROUND(nn_et / CAST(n AS DOUBLE), 4) AS support
      FROM s WHERE nn_et = n
      UNION ALL
      SELECT 'value', 'not_null', NULL, NULL, NULL, ROUND(nn_v / CAST(n AS DOUBLE), 4)
      FROM s WHERE nn_v = n
      UNION ALL
      SELECT 'user_id', 'not_null', NULL, NULL, NULL, ROUND(nn_u / CAST(n AS DOUBLE), 4)
      FROM s WHERE nn_u = n
      UNION ALL
      SELECT 'event_type', 'in_set', NULL, NULL, sup.set_et,
             ROUND(s.nn_et / CAST(s.n AS DOUBLE), 4)
      FROM s, sup WHERE s.nd_et <= 10
      UNION ALL
      SELECT 'value', 'in_range', ROUND(s.lo_v, 4), ROUND(s.hi_v, 4), NULL,
             ROUND(sup.sup_v, 4) FROM s, sup
      UNION ALL
      SELECT 'user_id', 'in_range', ROUND(s.lo_u, 4), ROUND(s.hi_u, 4), NULL,
             ROUND(sup.sup_u, 4) FROM s, sup
    )
    SELECT * FROM rows_out ORDER BY "column", rule
    """,
)
def suggest_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule mining on events(event_type, value, user_id): not-null rules
    where the data is clean, an accepted-values set for the low-cardinality
    type column, and (P1, P99) range rules with observed support — the
    profile → suggest → run_checks loop's middle step.  Two aggregation
    passes regardless of column count."""
    from dataquality_ml_spark.operators.rules import suggest_rules

    ev = _t(spark, sf_dir, "events")
    return suggest_rules(ev, ["event_type", "value", "user_id"])


# ===========================================================================
# Round 4 (cont.): LSH quality report — MinHash vs exact Jaccard
# ===========================================================================


def _minhash_recall_oracle() -> str:
    from dataquality_ml_spark.queries import _ORACLES

    mh, ex = _ORACLES["minhash_dedup_pairs"], _ORACLES["ngram_jaccard_pairs"]
    return f"""
    WITH mh AS ({mh}),
    ex AS ({ex}),
    j AS (
      SELECT COALESCE(ex.id_a, mh.id_a) AS id_a,
             COALESCE(ex.id_b, mh.id_b) AS id_b,
             CASE WHEN ex.id_a IS NULL THEN 0 ELSE 1 END AS in_ex,
             CASE WHEN mh.id_a IS NULL THEN 0 ELSE 1 END AS in_mh
      FROM ex FULL OUTER JOIN mh USING (id_a, id_b)
    )
    SELECT CAST(SUM(in_ex) AS BIGINT) AS n_exact,
           CAST(SUM(in_mh) AS BIGINT) AS n_lsh,
           CAST(SUM(in_ex * in_mh) AS BIGINT) AS n_common,
           ROUND(SUM(in_ex * in_mh) / CAST(SUM(in_ex) AS DOUBLE), 4) AS recall,
           ROUND(SUM(in_ex * in_mh) / CAST(SUM(in_mh) AS DOUBLE), 4) AS precision
    FROM j
    """


@register("minhash_recall_report", oracle=_minhash_recall_oracle())
def minhash_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality as a number (the dedup twin of ivf_recall_at_k):
    MinHash-LSH near-dup pairs vs the exact inverted-index Jaccard
    baseline, same threshold — recall measures band truncation, precision
    measures the verify step.  Both operands are the already-oracle-gated
    operators; the report is one full-outer join + one aggregate."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators import dedup as dd
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        mh = dd.minhash_dedup_pairs(
            docs, k=5, num_perms=16, bands=4, rows=4, threshold=0.8
        ).select("id_a", "id_b").withColumn("in_mh", F.lit(1))
        ex = dd.ngram_jaccard_pairs(
            docs, k=5, threshold=0.8, on_hot_shingle="exact"
        ).select("id_a", "id_b").withColumn("in_ex", F.lit(1))
    j = ex.join(mh, ["id_a", "id_b"], "full").na.fill({"in_ex": 0, "in_mh": 0})
    return j.agg(
        F.sum("in_ex").alias("n_exact"),
        F.sum("in_mh").alias("n_lsh"),
        F.sum(F.col("in_ex") * F.col("in_mh")).alias("n_common"),
        F.round(
            F.sum(F.col("in_ex") * F.col("in_mh")) / F.sum("in_ex"), 4
        ).alias("recall"),
        F.round(
            F.sum(F.col("in_ex") * F.col("in_mh")) / F.sum("in_mh"), 4
        ).alias("precision"),
    )


def _bpe_oov_oracle(n: int = _BPE_N) -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    seg = _bpe_merge_cascade(n)
    merged_rows = " UNION ALL ".join(
        f"SELECT (SELECT lhs FROM p{i}) || (SELECT rhs FROM p{i}) AS sym, "
        f"(SELECT c FROM nbase) + {i - 1} AS tid"
        for i in range(1, n + 1)
    )
    train_where = (
        " WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')"
    )
    return f"""
    WITH {_TOKS_CTE},
    {_bpe_train_ctes(n, train_where)},
    chars AS MATERIALIZED (
      SELECT DISTINCT unnest([word[i] for i in generate_series(1, length(word))])
        AS ch
      FROM words
    ),
    base AS MATERIALIZED (
      SELECT ch, ROW_NUMBER() OVER (ORDER BY ch) - 1 AS tid
      FROM (SELECT ch FROM chars UNION SELECT '</w>' AS ch)
    ),
    nbase AS (SELECT COUNT(*) AS c FROM base),
    vocab AS MATERIALIZED (
      SELECT ch AS sym, tid FROM base UNION ALL {merged_rows}
    ),
    exd AS (
      SELECT t2.doc_id, d.source, unnest(t2.t) AS word
      FROM toks t2 JOIN documents d USING (doc_id)
    ),
    symrows AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split({seg}, '·'), s -> s <> '')) AS sym
      FROM exd WHERE word <> ''
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_ids,
           CAST(SUM(CASE WHEN v.tid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
           ROUND(SUM(CASE WHEN v.tid IS NULL THEN 1.0 ELSE 0.0 END) / COUNT(*), 4)
             AS oov_rate
    FROM symrows LEFT JOIN vocab v USING (sym)
    GROUP BY source ORDER BY source
    """


@register("bpe_oov_by_source", oracle=_bpe_oov_oracle())
def bpe_oov_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage report: train the tokenizer on ONE domain
    (source='src0'), tokenize the whole corpus, report the out-of-vocab
    symbol rate per source — the number that says whether a tokenizer
    transfers to a new domain or needs retraining.  One explode + broadcast
    vocab left-join + one groupBy(source)."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.bpe import bpe_tokenize, train_tokenizer
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        tok = train_tokenizer(docs.where(F.col("source") == "src0"), num_merges=_BPE_N)
        ids = bpe_tokenize(docs, tok.merges, tok.vocab)
    unk = ids.select(
        "doc_id",
        F.size("token_ids").alias("n_ids"),
        F.size(F.filter("token_ids", lambda t: t == -1)).alias("n_unk"),
    ).join(docs.select("doc_id", "source"), "doc_id")
    return (
        unk.groupBy("source")
        .agg(
            F.sum("n_ids").alias("n_ids"),
            F.sum("n_unk").alias("n_unk"),
            F.round(F.sum("n_unk") / F.sum("n_ids"), 4).alias("oov_rate"),
        )
        .orderBy("source")
    )


# ===========================================================================
# Round 4 (cont.): DoReMi-style domain reweighting
# ===========================================================================


def _doremi_oracle() -> str:
    from dataquality_ml_spark.queries import _ORACLES

    bl = _ORACLES["bigram_logprob_docs"]
    return f"""
    WITH bl AS ({bl}),
    per_doc AS (
      SELECT bl.doc_id, d.source, -bl.mean_logprob AS nll
      FROM bl JOIN documents d USING (doc_id)
    ),
    per_src AS (
      SELECT source, COUNT(*) AS n_docs, AVG(nll) AS mean_nll
      FROM per_doc GROUP BY source
    ),
    overall AS (SELECT AVG(nll) AS corpus_nll, COUNT(*) AS n_total FROM per_doc),
    raw AS (
      SELECT source, n_docs, mean_nll,
             mean_nll - corpus_nll AS excess,
             (n_docs / CAST(n_total AS DOUBLE))
               * exp(1.0 * (mean_nll - corpus_nll)) AS raw_w
      FROM per_src CROSS JOIN overall
    ),
    z AS (SELECT SUM(raw_w) AS z FROM raw)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(mean_nll, 4) AS mean_nll,
           ROUND(excess, 4) AS excess,
           ROUND(raw_w / z, 4) AS weight
    FROM raw CROSS JOIN z ORDER BY source
    """


@register("doremi_reweight_sources", oracle=_doremi_oracle())
def doremi_reweight_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style mixture update: per-source excess bigram NLL drives an
    exponentiated-gradient reweighting (harder domains up-weighted,
    weights normalized).  The per-doc NLL comes from the oracle-gated
    interpolated bigram LM; the update itself is one groupBy + two 1-row
    broadcast scalars."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.selection import domain_reweight
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        nll = tx.bigram_logprob(docs).select(
            "doc_id", (-F.col("mean_logprob")).alias("nll")
        )
        return domain_reweight(nll, docs.select("doc_id", "source"))


# ===========================================================================
# Round 4 (cont.): JL projection quality — projected kNN recall
# ===========================================================================


def _jl_recall_oracle(in_dim: int = 64, out_dim: int = 8) -> str:
    from dataquality_ml_spark.operators.similarity import jl_signs

    import math

    inv = 1.0 / math.sqrt(out_dim)
    comps = []
    for row in jl_signs(in_dim, out_dim):
        lits = ", ".join(f"{float(s)}" for s in row)
        comps.append(
            f"ROUND(list_dot_product(embedding::DOUBLE[], [{lits}]) * {inv!r}, 6)"
        )
    arr = ",\n               ".join(comps)
    cos = (
        "list_dot_product(qv, cv) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
    )
    return f"""
    WITH proj AS (SELECT vec_id, [{arr}] AS p FROM embeddings),
    exact_q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    exact_c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    exact_r AS (
      SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY ROUND({cos}, 4) + 0 DESC, neighbor_id) AS rank
      FROM exact_q, exact_c WHERE neighbor_id != query_id
    ),
    proj_q AS (SELECT vec_id AS query_id, p AS qv FROM proj WHERE vec_id < 10),
    proj_c AS (SELECT vec_id AS neighbor_id, p AS cv FROM proj),
    proj_r AS (
      SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY ROUND({cos}, 4) + 0 DESC, neighbor_id) AS rank
      FROM proj_q, proj_c WHERE neighbor_id != query_id
    )
    SELECT e.query_id,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_common,
           ROUND(COUNT(p.neighbor_id) / 5.0, 4) AS recall_at_5
    FROM (SELECT * FROM exact_r WHERE rank <= 5) e
    LEFT JOIN (SELECT * FROM proj_r WHERE rank <= 5) p
      USING (query_id, neighbor_id)
    GROUP BY e.query_id ORDER BY e.query_id
    """


@register("jl_knn_recall", oracle=_jl_recall_oracle())
def jl_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL projection quality as a number: top-5 cosine neighbors computed
    in the 8-dim projected space vs the exact 64-dim baseline, recall@5
    per query — the measurement that justifies (or vetoes) running ANN on
    the 8x-cheaper projected vectors.  Both sides are the existing
    oracle-gated operators; the report is one join + one aggregate."""
    from dataquality_ml_spark.operators.similarity import jl_project, knn_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = knn_bruteforce(emb, q, k=5).select("query_id", "neighbor_id")
    proj = jl_project(emb, out_dim=8).withColumnRenamed("proj", "embedding")
    approx = knn_bruteforce(proj, proj.where(F.col("vec_id") < 10), k=5).select(
        "query_id", F.col("neighbor_id").alias("p_neighbor")
    )
    j = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["p_neighbor"]),
        "left",
    ).select(exact["query_id"], "p_neighbor")
    return (
        j.groupBy("query_id")
        .agg(
            F.count("p_neighbor").alias("n_common"),
            F.round(F.count("p_neighbor") / F.lit(5.0), 4).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


# ===========================================================================
# Round 5: unicode normalization (VERDICT r4 item 1)
# ===========================================================================


@register(
    "nfc_normalize_docs",
    oracle="""
    SELECT doc_id,
           md5(trim(lower(nfc_normalize(text)))) AS norm_fp,
           CAST(length(text) AS BIGINT) AS n_chars_raw,
           CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars_nfc,
           CAST(CASE WHEN nfc_normalize(text) = text THEN 0 ELSE 1 END AS INT)
             AS changed
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def nfc_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonical composition end-to-end: the Arrow-batched NFC
    pass (ASCII fast path) against DuckDB's utf8proc ``nfc_normalize`` —
    per-doc fingerprint of the normalized text, raw vs normalized
    codepoint counts, and a changed flag.  The md5 comparison proves both
    engines produce byte-identical canonical text, which is what makes
    every fingerprint/shingle/span-hash/BPE operator portable on
    multilingual corpora."""
    from dataquality_ml_spark.functions.scalar import normalize_text, unicode_normalize

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    nfc = unicode_normalize(F.col("text"), "NFC")
    return docs.select(
        "doc_id",
        F.md5(normalize_text("text")).alias("norm_fp"),
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.length(nfc).cast("bigint").alias("n_chars_nfc"),
        F.when(nfc == F.col("text"), 0).otherwise(1).cast("int").alias("changed"),
    ).orderBy("doc_id")


# ===========================================================================
# Round 5: unigram-LM (SentencePiece-style) tokenizer (VERDICT r4 item 2)
# ===========================================================================

_UG_ML = 4   # max piece length
_UG_MP = 24  # multi-char seed pieces kept
_UG_L = 12   # unrolled word-length bound (testdata max word len = 8)


def _ug_base_ctes(ml: int = _UG_ML, mp: int = _UG_MP) -> str:
    """words → substring seed vocab → seed probabilities → in-vocab span
    occurrences: the shared prelude of every unigram oracle.  Mirrors
    operators/unigram.py word_counts/seed_pieces/_occurrences."""
    return f"""
    words AS MATERIALIZED (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest(t) AS word FROM toks) WHERE word <> '' GROUP BY word),
    subs AS MATERIALIZED (
      SELECT piece, SUM(cnt) AS freq FROM (
        SELECT unnest(flatten([[word[s:s+l-1]
                 for l in generate_series(1, least({ml}, length(word)-s+1))]
                 for s in generate_series(1, length(word))])) AS piece, cnt
        FROM words) GROUP BY piece),
    seedsel AS MATERIALIZED (
      SELECT piece, freq FROM subs WHERE length(piece) = 1
      UNION ALL
      SELECT piece, freq FROM (
        SELECT piece, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, piece) AS rk
        FROM subs WHERE length(piece) >= 2) WHERE rk <= {mp}),
    p0 AS MATERIALIZED (
      SELECT piece, freq / (SELECT CAST(SUM(freq) AS DOUBLE) FROM seedsel) AS prob
      FROM seedsel),
    occ AS MATERIALIZED (
      SELECT o.word, o.cnt, o.wl, o.s, o.e, o.piece, p.prob
      FROM (
        SELECT word, cnt, length(word) AS wl, x.s AS s, x.e AS e, x.piece AS piece
        FROM (
          SELECT word, cnt,
                 unnest(flatten([[{{'s': s-1, 'e': s-1+l, 'piece': word[s:s+l-1]}}
                   for l in generate_series(1, least({ml}, length(word)-s+1))]
                   for s in generate_series(1, length(word))])) AS x
          FROM words)) o
      JOIN p0 p USING (piece))"""


def _ug_alpha_beta_ctes(n: int = _UG_L) -> str:
    """Unrolled forward/backward DP over the segmentation lattice — one
    bounded join per character position, the relational twin of
    em_expected_counts' loop.  Every afx/btx accumulator is MATERIALIZED:
    each is referenced TWICE at the next level (the DP join and the
    union), so an inlining planner would otherwise double the work per
    level — a 2^n blowup that turned this oracle into the parity suite's
    wall-time hot spot (round-12 VERDICT item 5)."""
    parts = [
        "af0 AS (SELECT word, 0 AS pos, CAST(1.0 AS DOUBLE) AS a FROM words)",
        "afx0 AS MATERIALIZED (SELECT * FROM af0)",
    ]
    for i in range(1, n + 1):
        parts.append(
            f"af{i} AS (SELECT o.word, {i} AS pos, SUM(p.a * o.prob) AS a "
            f"FROM occ o JOIN afx{i - 1} p ON p.word = o.word AND p.pos = o.s "
            f"WHERE o.e = {i} GROUP BY o.word)"
        )
        parts.append(
            f"afx{i} AS MATERIALIZED "
            f"(SELECT * FROM afx{i - 1} UNION ALL SELECT * FROM af{i})"
        )
    parts.append(
        "bt0 AS (SELECT word, length(word) AS pos, CAST(1.0 AS DOUBLE) AS b FROM words)"
    )
    parts.append("btx0 AS MATERIALIZED (SELECT * FROM bt0)")
    for k in range(1, n + 1):
        parts.append(
            f"bt{k} AS (SELECT o.word, o.s AS pos, SUM(o.prob * nx.b) AS b "
            f"FROM occ o JOIN btx{k - 1} nx ON nx.word = o.word AND nx.pos = o.e "
            f"WHERE o.s = o.wl - {k} GROUP BY o.word, o.s)"
        )
        parts.append(
            f"btx{k} AS MATERIALIZED "
            f"(SELECT * FROM btx{k - 1} UNION ALL SELECT * FROM bt{k})"
        )
    parts.append(
        f"zz AS (SELECT a.word, a.a AS z FROM afx{n} a "
        f"JOIN words w ON w.word = a.word AND a.pos = length(w.word))"
    )
    return ",\n    ".join(parts)


def _ug_seed_oracle() -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    return f"""
    WITH {_TOKS_CTE},{_ug_base_ctes()}
    SELECT piece, CAST(freq AS BIGINT) AS freq FROM seedsel
    ORDER BY freq DESC, piece
    """


def _ug_em_oracle() -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    return f"""
    WITH {_TOKS_CTE},{_ug_base_ctes()},
    {_ug_alpha_beta_ctes()}
    SELECT o.piece,
           ROUND(SUM(o.cnt * fa.a * o.prob * bb.b / zz.z), 4) + 0 AS ecnt
    FROM occ o
    JOIN afx{_UG_L} fa ON fa.word = o.word AND fa.pos = o.s
    JOIN btx{_UG_L} bb ON bb.word = o.word AND bb.pos = o.e
    JOIN zz ON zz.word = o.word
    WHERE zz.z > 0
    GROUP BY o.piece ORDER BY o.piece
    """


def _ug_viterbi_ctes(n: int = _UG_L) -> str:
    parts = [
        "v0 AS (SELECT word, 0 AS pos, CAST(1.0 AS DOUBLE) AS vp, 0 AS np, "
        "CAST([] AS VARCHAR[]) AS path FROM words)",
        "vx0 AS MATERIALIZED (SELECT * FROM v0)",
    ]
    for i in range(1, n + 1):
        parts.append(
            f"c{i} AS (SELECT o.word, p.vp * o.prob AS vp, p.np + 1 AS np, o.s, "
            f"list_append(p.path, o.piece) AS path "
            f"FROM occ o JOIN vx{i - 1} p ON p.word = o.word AND p.pos = o.s "
            f"WHERE o.e = {i})"
        )
        parts.append(
            f"v{i} AS (SELECT word, {i} AS pos, vp, np, path FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY word "
            f"ORDER BY vp DESC, np, s) AS rk FROM c{i}) WHERE rk = 1)"
        )
        parts.append(
            f"vx{i} AS MATERIALIZED "
            f"(SELECT * FROM vx{i - 1} UNION ALL SELECT * FROM v{i})"
        )
    parts.append(
        f"segw AS (SELECT v.word, v.np AS n_pieces, v.path FROM vx{n} v "
        f"JOIN words w ON w.word = v.word AND v.pos = length(w.word))"
    )
    return ",\n    ".join(parts)


def _ug_segment_oracle() -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    return f"""
    WITH {_TOKS_CTE},{_ug_base_ctes()},
    {_ug_viterbi_ctes()}
    SELECT e.doc_id, COUNT(*) AS n_words,
           CAST(SUM(s.n_pieces) AS BIGINT) AS n_pieces,
           ROUND(SUM(length(e.word)) / CAST(SUM(s.n_pieces) AS DOUBLE), 4)
             AS chars_per_piece
    FROM (SELECT doc_id, unnest(t) AS word FROM toks) e
    JOIN segw s ON s.word = e.word
    WHERE e.word <> ''
    GROUP BY e.doc_id ORDER BY e.doc_id
    """


@register("unigram_seed_docs", oracle=_ug_seed_oracle())
def unigram_seed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM seed vocabulary (Kudo 2018 §3): every single character
    plus the 24 most frequent multi-character substrings (≤4 chars) of the
    word-count table, occurrence-weighted.  The corpus contributes ONE
    word count; the substring explosion runs over the Heaps-bounded word
    relation."""
    from dataquality_ml_spark.operators import unigram as ug

    wc = ug.word_counts(_t(spark, sf_dir, "documents"))
    return (
        ug.seed_pieces(wc, _UG_ML, _UG_MP)
        .select("piece", F.col("freq").cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), "piece")
    )


@register("unigram_em_counts_docs", oracle=_ug_em_oracle())
def unigram_em_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM E-step of unigram-LM training: expected piece counts under
    the seed model via forward-backward over each word's segmentation
    lattice.  The Spark side runs the relational DP (one bounded join per
    character position, piece table broadcast); the oracle replays it as
    unrolled CTEs — the cross-engine check Kudo's EM is amenable to
    precisely because the E-step is relational algebra."""
    from dataquality_ml_spark.operators import unigram as ug

    wc, probs, _ = _ug_shared(spark, sf_dir)
    pdf = spark.createDataFrame(probs, "piece string, prob double")
    return (
        # cap == the oracle's unroll depth, so both engines drop
        # over-length words at exactly the same lattice depth
        ug.em_expected_counts(wc, pdf, _UG_ML, max_word_len=_UG_L)
        .select("piece", (F.round("ecnt", 4) + 0).alias("ecnt"))
        .orderBy("piece")
    )


@register("unigram_segment_docs", oracle=_ug_segment_oracle())
def unigram_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi segmentation of the corpus under the seed unigram LM:
    per-document piece counts and chars-per-piece compression.  The DP
    runs over the WORD relation only (max/argmax with a probability-
    product score — cross-engine tie-safe); the corpus is segmented by a
    broadcast join, never row-by-row."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators import unigram as ug
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        _, _, seg = _ug_shared(spark, sf_dir)
        return ug.unigram_segment(
            docs, seg.select("word", "n_pieces")
        ).orderBy("doc_id")


@register("unigram_pieces_docs")  # full EM trainer → rows-only check;
# local/distributed equivalence + pure-Python differential in test_unigram.py
def unigram_pieces_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full unigram-LM training: seed → 3 EM iterations with pruning to a
    32-piece vocab (single characters never pruned; prob-based pruning is
    the documented simplification of Kudo's likelihood-loss criterion).
    Deterministic (prob desc, piece asc) ordering; the trainer's
    correctness is pinned by the strategy-equivalence and pure-Python
    differential tests rather than a SQL oracle (multi-iteration EM with
    pruning is where SQL unrolling stops paying)."""
    from dataquality_ml_spark.operators import unigram as ug

    pieces = ug.unigram_train(
        _t(spark, sf_dir, "documents"),
        vocab_size=32,
        n_iters=3,
        max_piece_len=_UG_ML,
        max_pieces=_UG_MP,
    )
    return spark.createDataFrame(
        [(i + 1, p, round(pr, 6)) for i, (p, pr) in enumerate(pieces)],
        "piece_rank int, piece string, prob double",
    )


# ===========================================================================
# Round 5: incremental ANN index drift (VERDICT r4 item 4)
# ===========================================================================

_AID_BINS = 8


def _ann_drift_oracle(k: int = 4, bins: int = _AID_BINS) -> str:
    """Unrolled: hash-init kmeans (1 Lloyd iteration, ROUND(AVG,6) means —
    the engine-portable centroid rounding kmeans_fit(round_dp=6) applies)
    on the even-id reference half; squared assignment distances for both
    halves; equi-width bin proportions over (0, max ref dist²]; PSI."""
    sq = (
        "list_sum([ (v.emb[i]-c.emb[i])*(v.emb[i]-c.emb[i]) "
        "for i in generate_series(1, len(v.emb))])"
    )
    return f"""
    WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    ref AS (SELECT * FROM vecs WHERE vec_id % 2 = 0),
    cur AS (SELECT * FROM vecs WHERE vec_id % 2 = 1),
    init AS (
      SELECT emb, ROW_NUMBER() OVER (
        ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) - 1 AS cid
      FROM ref QUALIFY cid < {k}
    ),
    a1 AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {sq}, c.cid) AS rn
        FROM ref v CROSS JOIN init c
      ) WHERE rn = 1
    ),
    c1 AS (
      SELECT cid, list(m ORDER BY pos) AS emb FROM (
        SELECT cluster AS cid, pos, ROUND(AVG(val), 6) AS m FROM (
          SELECT a.cluster, unnest(v.emb) AS val,
                 generate_subscripts(v.emb, 1) AS pos
          FROM a1 a JOIN ref v USING (vec_id)
        ) GROUP BY cluster, pos
      ) GROUP BY cid
    ),
    dref AS (
      SELECT v.vec_id, MIN({sq}) AS d2 FROM ref v CROSS JOIN c1 c GROUP BY v.vec_id
    ),
    dcur AS (
      SELECT v.vec_id, MIN({sq}) AS d2 FROM cur v CROSS JOIN c1 c GROUP BY v.vec_id
    ),
    hi AS (SELECT ROUND(MAX(d2), 6) AS h FROM dref),
    pr AS (
      SELECT bin, n / CAST(SUM(n) OVER () AS DOUBLE) AS p_ref FROM (
        SELECT LEAST({bins - 1}, GREATEST(0,
                 CAST(FLOOR(d2 / ((SELECT h FROM hi) / {bins})) AS INT))) AS bin,
               COUNT(*) AS n
        FROM dref GROUP BY 1)
    ),
    pc AS (
      SELECT bin, n / CAST(SUM(n) OVER () AS DOUBLE) AS p_cur FROM (
        SELECT LEAST({bins - 1}, GREATEST(0,
                 CAST(FLOOR(d2 / ((SELECT h FROM hi) / {bins})) AS INT))) AS bin,
               COUNT(*) AS n
        FROM dcur GROUP BY 1)
    ),
    spine AS (SELECT unnest(generate_series(0, {bins - 1})) AS bin),
    j AS (
      SELECT s.bin, COALESCE(pr.p_ref, 0.0) AS p_ref, COALESCE(pc.p_cur, 0.0) AS p_cur
      FROM spine s LEFT JOIN pr USING (bin) LEFT JOIN pc USING (bin)
    ),
    t AS (
      SELECT bin, p_ref, p_cur,
             (GREATEST(p_cur, 1e-06) - GREATEST(p_ref, 1e-06))
               * ln(GREATEST(p_cur, 1e-06) / GREATEST(p_ref, 1e-06)) AS psi_term
      FROM j
    )
    SELECT CAST(bin AS INT) AS bin,
           ROUND(p_ref, 6) + 0 AS p_ref, ROUND(p_cur, 6) + 0 AS p_cur,
           ROUND(psi_term, 6) + 0 AS psi_term,
           ROUND(SUM(psi_term) OVER (), 6) + 0 AS psi_total
    FROM t ORDER BY bin
    """


@register("ann_index_drift", oracle=_ann_drift_oracle())
def ann_index_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-index health check: squared assignment-distance distribution of
    a new batch (odd vec_ids) vs the index's build-time profile (even
    vec_ids), as per-bin PSI — the number that tells an append-only
    vector pipeline when the frozen coarse quantizer needs retraining.
    Both sides are one narrow literal-centroid scan + a ≤bins-row agg."""
    from dataquality_ml_spark.operators import similarity as sim2

    emb = _t(spark, sf_dir, "embeddings")
    ref = emb.where(F.col("vec_id") % 2 == 0)
    cur = emb.where(F.col("vec_id") % 2 == 1)
    cents = sim2.kmeans_fit(ref, k=4, iters=1, round_dp=6)
    idx = sim2.ANNIndex(cents, codebooks=[])
    idx.fit_distance_profile(ref, bins=_AID_BINS)
    rep = idx.drift_report(cur)
    return rep.select(
        F.col("bin").cast("int").alias("bin"),
        (F.round("p_ref", 6) + 0).alias("p_ref"),
        (F.round("p_cur", 6) + 0).alias("p_cur"),
        (F.round("psi_term", 6) + 0).alias("psi_term"),
        (F.round("psi_total", 6) + 0).alias("psi_total"),
    ).orderBy("bin")


# ===========================================================================
# Round 5: host/domain-level curation (VERDICT r4 item 7)
# ===========================================================================

_HOST_BLOCKLIST = ["src0-0.example.org", "src2-3.example.org"]


@register(
    "host_curation_report",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text,
             'https://' || source || '-' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             regexp_extract(url, '^https?://([^/]+)', 1) AS host,
             len(string_split_regex(trim(lower(nfc_normalize(text))), '\\s+'))
               AS ntok
      FROM d
    ),
    agg AS (
      SELECT host, COUNT(*) AS n_docs, ROUND(AVG(ntok), 4) + 0 AS avg_tokens
      FROM h GROUP BY host
    ),
    bl AS (SELECT unnest({_HOST_BLOCKLIST!r}) AS host),
    kept AS (
      SELECT host, COUNT(*) AS nk FROM (
        SELECT host,
               ROW_NUMBER() OVER (PARTITION BY host
                 ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
        FROM h
      ) WHERE rk <= 5 GROUP BY host
    )
    SELECT a.host, CAST(a.n_docs AS BIGINT) AS n_docs, a.avg_tokens,
           CAST(CASE WHEN b.host IS NOT NULL THEN 1 ELSE 0 END AS INT) AS blocked,
           CAST(CASE WHEN b.host IS NOT NULL THEN 0
                     ELSE COALESCE(k.nk, 0) END AS BIGINT) AS n_kept
    FROM agg a LEFT JOIN bl b USING (host) LEFT JOIN kept k ON k.host = a.host
    ORDER BY a.host
    """,
)
def host_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level corpus curation (RefinedWeb): synthesize deterministic
    per-doc URLs (the testdata ships none), extract hosts with the
    ``parse_url`` builtin, and report per registered host the document
    count, mean token count, blocklist membership (broadcast join) and
    the per-host document cap survivors via the skew-proof two-phase
    quota sampler.  The oracle replays the cap with the naive full
    window — equality re-proves the sampler's losslessness on the skew
    axis real web corpora actually have."""
    from dataquality_ml_spark.operators.web import host_curation_report as hcr

    docs = _t(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("-"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )
    return hcr(docs, blocklist=_HOST_BLOCKLIST, cap=5).orderBy("host")


def _ug_tokenize_oracle() -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    return f"""
    WITH {_TOKS_CTE},{_ug_base_ctes()},
    {_ug_viterbi_ctes()},
    vocab AS (
      SELECT piece, CAST(ROW_NUMBER() OVER (ORDER BY prob DESC, piece) - 1 AS INT)
               AS tid
      FROM p0
    ),
    exd AS (
      SELECT doc_id,
             unnest([{{'w': t[i], 'i': i}} for i in generate_series(1, len(t))]) AS x
      FROM toks WHERE doc_id < 40
    ),
    wp AS (
      SELECT e.doc_id, e.x.i AS wpos,
             COALESCE(s.path, [e.x.w]) AS pieces
      FROM exd e LEFT JOIN segw s ON s.word = e.x.w
      WHERE e.x.w <> ''
    ),
    sy AS (
      SELECT doc_id, wpos,
             unnest([{{'p': pieces[j], 'j': j}}
                     for j in generate_series(1, len(pieces))]) AS y
      FROM wp
    )
    SELECT doc_id,
           list(COALESCE(v.tid, -1) ORDER BY wpos, sy.y.j) AS token_ids,
           COUNT(*) AS n_ids
    FROM sy LEFT JOIN vocab v ON v.piece = sy.y.p
    GROUP BY doc_id ORDER BY doc_id
    """


@register("unigram_tokenize_docs", oracle=_ug_tokenize_oracle())
def unigram_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM corpus tokenization to id sequences (docs < 40): the
    Viterbi piece path rides through the relational DP as an array (no
    backpointer walk), paths broadcast-join back to the positionally
    exploded corpus, ids come from the (prob desc, piece) vocab order,
    and unsegmentable words emit a single UNK — the ``bpe_tokenize``
    contract under the unigram model.  The oracle replays path carrying
    with ``list_append`` through the same unrolled CTEs."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators import unigram as ug
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        _, probs, seg = _ug_shared(spark, sf_dir)
        pieces = sorted(probs, key=lambda t: (-t[1], t[0]))
        return ug.unigram_tokenize(
            docs.where(F.col("doc_id") < 40), pieces, _UG_ML,
            max_word_len=_UG_L, seg_words=seg,
        ).orderBy("doc_id")


# ===========================================================================
# Round 5 (cont.): composed showcase queries
# ===========================================================================


def _tokenizer_compare_oracle() -> str:
    seg_bpe = _bpe_segment_oracle()
    seg_ug = _ug_segment_oracle()
    return f"""
    SELECT 'bpe' AS tokenizer,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_subwords) AS BIGINT) AS n_pieces,
           ROUND(SUM(n_subwords) / CAST(SUM(n_words) AS DOUBLE), 4)
             AS pieces_per_word
    FROM ({seg_bpe}) b
    UNION ALL
    SELECT 'unigram',
           CAST(SUM(n_words) AS BIGINT),
           CAST(SUM(n_pieces) AS BIGINT),
           ROUND(SUM(n_pieces) / CAST(SUM(n_words) AS DOUBLE), 4)
    FROM ({seg_ug}) u
    ORDER BY tokenizer
    """


@register("tokenizer_compare_docs", oracle=_tokenizer_compare_oracle())
def tokenizer_compare_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer bake-off on one corpus: BPE (6 merges) vs the seed
    unigram LM, corpus-level fertility (pieces per word) side by side —
    the report that picks a tokenizer family before committing to a 32k
    vocab run.  Composes two independently-oracled segmentation
    pipelines; each stays one corpus pass after its vocab-relation
    training."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators import unigram as ug
    from dataquality_ml_spark.operators.bpe import bpe_segment, bpe_train
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        docs = _docs_nfc(spark, sf_dir)
        merges = _memo_bpe_merges(spark, sf_dir, num_merges=_BPE_N)
        b = bpe_segment(docs, merges).agg(
            F.lit("bpe").alias("tokenizer"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_subwords").alias("n_pieces"),
            F.round(F.sum("n_subwords") / F.sum("n_words"), 4).alias(
                "pieces_per_word"
            ),
        )
        _, _, seg = _ug_shared(spark, sf_dir)
        u = ug.unigram_segment(docs, seg.select("word", "n_pieces")).agg(
            F.lit("unigram").alias("tokenizer"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            F.round(F.sum("n_pieces") / F.sum("n_words"), 4).alias(
                "pieces_per_word"
            ),
        )
        return b.unionByName(u).orderBy("tokenizer")


def _cluster_balanced_oracle(k: int = 4, cap: int = 25) -> str:
    from dataquality_ml_spark.queries import _kmeans_cte

    return f"""
    WITH {_kmeans_cte(k)},
    r AS (
      SELECT vec_id, cluster,
             ROW_NUMBER() OVER (PARTITION BY cluster
               ORDER BY (vec_id * 2654435761) % 4294967296, vec_id)
               AS sample_rank
      FROM a3
    )
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           CAST(sample_rank AS INT) AS sample_rank
    FROM r WHERE sample_rank <= {cap}
    ORDER BY cluster, sample_rank
    """


@register("cluster_balanced_sample", oracle=_cluster_balanced_oracle())
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balanced corpus sampling over EMBEDDINGS: k-means cluster
    assignment (the deterministic hash-init trainer) + an equal per-cluster
    document cap via the skew-proof quota sampler — the embedding-space
    analogue of per-source temperature sampling (semantic balance instead
    of provenance balance)."""
    from dataquality_ml_spark.operators import similarity as sim3
    from dataquality_ml_spark.operators.relational import quota_sample

    emb = _t(spark, sf_dir, "embeddings")
    from dataquality_ml_spark.queries import _memo_kmeans

    cents = _memo_kmeans(spark, sf_dir, k=4, iters=2)
    assigned = sim3.kmeans_assign(emb, cents)
    return (
        quota_sample(assigned, "cluster", "vec_id", 25)
        .select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
        .orderBy("cluster", "sample_rank")
    )


def _dup_cluster_sizes_oracle() -> str:
    from dataquality_ml_spark.queries import _ORACLES

    return f"""
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(DISTINCT keep_id) AS BIGINT) AS n_clusters
    FROM ({_ORACLES["dup_clusters_docs"]}) c
    GROUP BY cluster_size ORDER BY cluster_size
    """


@register("dup_cluster_sizes", oracle=_dup_cluster_sizes_oracle())
def dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster SIZE distribution — the corpus-health number that
    distinguishes 'a few giant boilerplate families' from 'many pairwise
    twins' (they need different dedup policies).  One aggregation over the
    already-oracled connected-components output."""
    from dataquality_ml_spark.queries import _dup_clusters_shared

    clusters = _dup_clusters_shared(spark, sf_dir)
    return (
        clusters.groupBy("cluster_size")
        .agg(F.countDistinct("keep_id").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
        )
        .orderBy("cluster_size")
    )


@register(
    "accent_fold_docs",
    oracle="""
    SELECT doc_id,
           md5(strip_accents(text)) AS fold_fp,
           CAST(length(text) - length(strip_accents(text)) AS BIGINT)
             AS n_marks_removed
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def accent_fold_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accent folding end-to-end: NFD + combining-mark strip vs DuckDB's
    utf8proc ``strip_accents`` — per-doc folded-text fingerprint and the
    number of marks removed.  The fuzzy-matching companion to
    ``nfc_normalize_docs`` (diacritic variants of a word compare equal
    after folding)."""
    from dataquality_ml_spark.functions.scalar import fold_accents

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    folded = fold_accents(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(folded).alias("fold_fp"),
        (F.length("text") - F.length(folded)).cast("bigint").alias(
            "n_marks_removed"
        ),
    ).orderBy("doc_id")


@register(
    "trim_boilerplate_docs",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || chr(10) || 'ad -- click here now!!' || chr(10) || 'x'
               AS t2
      FROM documents
    ),
    ln AS (
      SELECT doc_id, x.i AS ln, x.l AS line, trim(lower(x.l)) AS norm
      FROM (
        SELECT doc_id,
               unnest([{'l': ls[i], 'i': i}
                       for i in generate_series(1, len(ls))]) AS x
        FROM (SELECT doc_id, string_split(t2, chr(10)) AS ls FROM aug)
      )
    ),
    hr AS (
      SELECT *,
             length(norm) >= 10
             AND (CASE WHEN length(norm) > 0
                  THEN length(regexp_replace(norm, '[a-z\\s]', '', 'g'))
                       / CAST(length(norm) AS DOUBLE)
                  ELSE 1.0 END) <= 0.5 AS ok
      FROM ln
    ),
    hot AS (
      SELECT norm FROM hr WHERE ok GROUP BY norm
      HAVING COUNT(DISTINCT doc_id) > 50
    ),
    mk AS (
      SELECT h.doc_id, h.ln, h.line,
             h.ok AND ht.norm IS NULL AS keep
      FROM hr h LEFT JOIN hot ht ON ht.norm = h.norm
    )
    SELECT doc_id,
           md5(array_to_string(list(line ORDER BY ln)
                 FILTER (WHERE keep), chr(10))) AS text_fp,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM mk GROUP BY doc_id ORDER BY doc_id
    """,
)
def trim_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb line filtering end-to-end: every document gets a
    corpus-wide boilerplate line and a too-short line appended (the
    testdata ships single-line docs), then the trimmer must drop exactly
    those — the short line by the length heuristic, the repeated line by
    the hot-line anti-join — and reassemble the original text in order.
    Output fingerprints the rebuilt text."""
    from dataquality_ml_spark.operators.text import trim_boilerplate_lines

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit("\nad -- click here now!!\nx"),
        ),
    )
    out = trim_boilerplate_lines(docs, max_line_docs=50)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_fp"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
    ).orderBy("doc_id")


@register(
    "mixture_epochs_sources",
    oracle="""
    WITH toks2 AS (
      SELECT source,
             len(string_split_regex(trim(lower(nfc_normalize(text))), '\\s+'))
               AS nt
      FROM documents
    ),
    avail AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS n_tokens
              FROM toks2 GROUP BY source),
    w AS (
      SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2))
        AS t(source, wraw)
    ),
    nw AS (SELECT source, wraw / (SELECT SUM(wraw) FROM w) AS weight FROM w)
    SELECT a.source, a.n_tokens,
           ROUND(COALESCE(nw.weight, 0.0), 6) + 0 AS weight,
           ROUND(1000000.0 * COALESCE(nw.weight, 0.0), 4) + 0 AS target_tokens,
           ROUND(1000000.0 * COALESCE(nw.weight, 0.0) / a.n_tokens, 4) + 0
             AS epochs
    FROM avail a LEFT JOIN nw USING (source)
    ORDER BY a.source
    """,
)
def mixture_epochs_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-accounted mixing manifest: a 1M-token budget split 50/30/20
    across three sources; per source the available tokens, the target
    allocation, and the implied epochs — >1 epoch = the data-constrained
    repetition regime (Muennighoff et al. 2023), ≤1 = subsample.  One
    token-count aggregation; weights broadcast."""
    from dataquality_ml_spark.operators.selection import mixture_epochs

    return mixture_epochs(
        _t(spark, sf_dir, "documents"),
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        token_budget=1_000_000,
    ).orderBy("source")


# ===========================================================================
# Round 7: URL canonicalization + URL-level dedup (VERDICT r6 item 4)
# ===========================================================================

_URL_AUTH = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_URL_CANON_SQL = r"""
      CASE WHEN regexp_matches(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://')
      THEN
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(
            lower(regexp_extract(s, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
              || regexp_extract(s, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1),
          '^http://', 'https://', 'g'),
          '^(https?://)www\.', '\1', 'g'),
          '([?&])(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid|igshid|ref_src)=[^&#]*',
          '\1', 'g'),
          '([?&])[?&]+', '\1', 'g'),
          '[?&]+$', '', 'g'),
          '^([^?]*)/\?', '\1?', 'g'),
          '^([^?]*)/$', '\1', 'g')
      ELSE trim(url) END
"""


@register(
    "url_dedup_docs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             'https://' || source || '.example.org/page/'
               || CAST(doc_id // 4 AS VARCHAR) AS base
      FROM documents
    ),
    u AS (
      SELECT doc_id,
        CASE
          WHEN doc_id % 97 = 0 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
          WHEN doc_id % 4 = 1 THEN 'HTTP://WWW.'
               || upper(source || '.example.org') || '/page/'
               || CAST(doc_id // 4 AS VARCHAR)
          WHEN doc_id % 4 = 2 THEN base || '/?utm_source=feed&utm_campaign=x'
          WHEN doc_id % 4 = 3 THEN base || '?gclid=abc123&fbclid=z9'
          ELSE base END AS url
      FROM d
    ),
    su AS (SELECT doc_id, url, regexp_replace(trim(url), '#.*$', '', 'g') AS s
           FROM u),
    c AS (SELECT doc_id, {_URL_CANON_SQL} AS canon_url FROM su)
    SELECT canon_url, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
    FROM c GROUP BY canon_url ORDER BY canon_url
    """,
)
def url_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup on the canonical form (VERDICT r6 item 4):
    synthesize four surface variants per page — plain, SHOUTING
    scheme/host + www, trailing-slash + UTM tags, click-id params — and
    every ~97th doc an unparsable string.  Canonicalization (pure
    codegen'd regexp algebra, ``operators/web.canonical_url``) collapses
    the four variants to one URL while unparsable strings stay distinct;
    dedup is one map-side-combined groupBy on the canonical key.  The
    oracle replays the same regexp pipeline with DuckDB's 'g'-flagged
    ``regexp_replace``."""
    from dataquality_ml_spark.operators.web import url_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/page/"),
        F.expr("doc_id div 4").cast("string"),
    )
    url = (
        F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(F.lit("not a url "), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("HTTP://WWW."),
                F.upper(F.concat(F.col("source"), F.lit(".example.org"))),
                F.lit("/page/"),
                F.expr("doc_id div 4").cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(base, F.lit("/?utm_source=feed&utm_campaign=x")),
        )
        .when(
            F.col("doc_id") % 4 == 3,
            F.concat(base, F.lit("?gclid=abc123&fbclid=z9")),
        )
        .otherwise(base)
    )
    return (
        url_dedup(d.withColumn("url", url))
        .select(
            "canon_url",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("keep_id").cast("bigint").alias("keep_id"),
        )
        .orderBy("canon_url")
    )


@register(
    "dedup_best_survivor_docs",
    oracle=r"""
    WITH g AS (
      SELECT doc_id, doc_id // 6 AS grp,
             len(string_split_regex(trim(text), '\s+')) AS q
      FROM documents
    ),
    sz AS (SELECT grp, COUNT(*) AS cluster_size FROM g
           GROUP BY grp HAVING COUNT(*) > 1),
    k AS (
      SELECT grp, doc_id AS keep_id FROM (
        SELECT grp, doc_id,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY q DESC, doc_id)
                 AS rk
        FROM g) WHERE rk = 1
    )
    SELECT g.doc_id, k.keep_id, sz.cluster_size
    FROM g JOIN sz USING (grp) JOIN k USING (grp)
    ORDER BY g.doc_id
    """,
)
def dedup_best_survivor_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware duplicate-survivor policy (VERDICT r6 item 5):
    near-dup clusters (synthesized as blocks of 6 consecutive doc_ids so
    the oracle can replay membership exactly) resolved with
    ``dedup_clusters(keep="best")`` — the survivor is the member with the
    most tokens, NOT the min id, ties to the lowest id.  The oracle
    replays the keeper with a full per-group window; equality proves the
    groupBy/max_by decomposition picks the identical survivor."""
    from dataquality_ml_spark.operators.graph import dedup_clusters

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    g = d.withColumn("_grp", F.expr("doc_id div 6"))
    pairs = (
        g.alias("a")
        .join(g.alias("b"), "_grp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    quality = d.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), "\\s+")).alias("score")
    )
    return (
        dedup_clusters(pairs, keep="best", quality=quality)
        .select(
            "doc_id",
            F.col("keep_id").cast("bigint").alias("keep_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
        )
        .orderBy("doc_id")
    )


def _pack_fill_oracle(bud: int = 256, blk: int = 64) -> str:
    """Replay block-greedy next-fit packing as a RECURSIVE CTE: the
    working table advances one in-block doc index per iteration carrying
    (open seq, fill) state — the sequential scan pack_doc_boundary
    distributes blockwise."""
    from dataquality_ml_spark.queries import _TOKS_CTE

    asn = (
        f"CASE WHEN b.nt >= {bud} THEN "
        f"(CASE WHEN st.fill > 0 THEN st.seq + 1 ELSE st.seq END) "
        f"WHEN st.fill + b.nt > {bud} THEN st.seq + 1 ELSE st.seq END"
    )
    return f"""
    WITH RECURSIVE {_TOKS_CTE},
    n AS (SELECT doc_id, len(t) AS nt,
                 ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rnk
          FROM toks),
    b AS (SELECT doc_id, nt, rnk // {blk} AS blk, rnk % {blk} AS idx FROM n),
    st AS (
      SELECT blk, CAST(-1 AS BIGINT) AS idx, CAST(0 AS BIGINT) AS seq,
             CAST(0 AS BIGINT) AS fill, CAST(NULL AS BIGINT) AS assigned,
             CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS nt
      FROM (SELECT DISTINCT blk FROM b)
      UNION ALL
      SELECT b.blk, b.idx,
        CASE WHEN b.nt >= {bud} THEN ({asn}) + (b.nt + {bud - 1}) // {bud}
             ELSE ({asn}) END AS seq,
        CASE WHEN b.nt >= {bud} THEN 0
             WHEN st.fill + b.nt > {bud} THEN b.nt
             ELSE st.fill + b.nt END AS fill,
        {asn} AS assigned,
        b.doc_id, b.nt
      FROM st JOIN b ON b.blk = st.blk AND b.idx = st.idx + 1
    ),
    asn AS (SELECT blk, doc_id, nt, assigned FROM st WHERE idx >= 0),
    fin AS (SELECT blk, MAX(idx) AS mi FROM st GROUP BY blk),
    bstat AS (SELECT st.blk,
                     st.seq + CASE WHEN st.fill > 0 THEN 1 ELSE 0 END AS nseqs
              FROM st JOIN fin ON fin.blk = st.blk AND fin.mi = st.idx),
    offs AS (SELECT blk, COALESCE(SUM(nseqs) OVER (ORDER BY blk
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
             FROM bstat),
    g AS (SELECT a.doc_id, a.nt, o.off + a.assigned AS seq_id
          FROM asn a JOIN offs o ON o.blk = a.blk)
    SELECT seq_id, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS used_tokens,
           ROUND(SUM(nt) / {bud}.0, 4) + 0 AS fill_rate
    FROM g GROUP BY seq_id ORDER BY seq_id
    """


@register("pack_fill_report_docs", oracle=_pack_fill_oracle())
def pack_fill_report_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing fill-rate report (VERDICT r5 item 5 carry): doc-boundary
    (no-straddle) greedy packing at budget=256 in 64-doc blocks, then the
    per-sequence fill report — the padding-loss accounting a trainer
    needs before committing to a no-straddle data loader.  The oracle
    replays the greedy scan as a recursive CTE; equality proves the
    blockwise distribution (bounded applyInPandas + two-level sequence
    renumbering) matches the sequential semantics exactly."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.packing import (
        pack_doc_boundary,
        packing_fill_report,
    )
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        n_df = tx.token_stats(_docs_nfc(spark, sf_dir)).select(
            "doc_id", "n_tokens"
        )
        assigned = pack_doc_boundary(n_df, budget=256, block=64)
        return packing_fill_report(assigned, budget=256).orderBy("seq_id")


def _pack_compare_oracle() -> str:
    from dataquality_ml_spark.queries import _TOKS_CTE

    fill = _pack_fill_oracle()
    return f"""
    WITH straddle AS (
      SELECT seq_id, SUM(piece_len) AS used FROM (
        WITH {_TOKS_CTE},
        n AS (SELECT doc_id, len(t) AS n_tokens FROM toks),
        c AS (
          SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
          FROM n
        ),
        pieces AS (
          SELECT doc_id, strt, n_tokens,
                 unnest(generate_series(CAST(strt // 256 AS BIGINT),
                                        CAST((strt + n_tokens - 1) // 256 AS BIGINT)))
                   AS seq_id
          FROM c WHERE n_tokens > 0
        )
        SELECT seq_id,
          CAST(LEAST(strt + n_tokens - 1, seq_id * 256 + 255)
               - GREATEST(strt, seq_id * 256) + 1 AS BIGINT) AS piece_len
        FROM pieces
      ) GROUP BY seq_id
    ),
    db AS (SELECT seq_id, used_tokens AS used FROM ({fill}))
    SELECT 'doc_boundary' AS packer, COUNT(*) AS n_seqs,
           CAST(SUM(used) AS BIGINT) AS used_tokens,
           ROUND(AVG(used / 256.0), 4) + 0 AS mean_fill
    FROM db
    UNION ALL
    SELECT 'straddle', COUNT(*), CAST(SUM(used) AS BIGINT),
           ROUND(AVG(used / 256.0), 4) + 0
    FROM straddle
    ORDER BY packer
    """


@register("pack_efficiency_compare_docs", oracle=_pack_compare_oracle())
def pack_efficiency_compare_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing strategy bake-off at budget=256: token-straddling prefix
    packing (every sequence full except the last) vs doc-boundary greedy
    (padding where a doc won't fit) — sequence count, used tokens, and
    mean fill rate side by side.  This is the report that prices the
    no-straddle trainer contract in wasted sequences before a 100 TB
    packing run.  Composes two independently-oracled packers; each is
    one corpus pass after the shared token count."""
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.operators.packing import (
        pack_doc_boundary,
        pack_pieces,
        pack_sequences,
        packing_fill_report,
    )
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        n_df = (
            tx.token_stats(_docs_nfc(spark, sf_dir))
            .select("doc_id", "n_tokens")
            .localCheckpoint(eager=False)
        )

        def summarize(rep: DataFrame, label: str) -> DataFrame:
            return rep.agg(
                F.lit(label).alias("packer"),
                F.count(F.lit(1)).alias("n_seqs"),
                F.sum("used_tokens").cast("bigint").alias("used_tokens"),
                (F.round(F.avg(F.col("used_tokens") / F.lit(256.0)), 4)
                 + F.lit(0.0)).alias("mean_fill"),
            )

        straddle = packing_fill_report(
            pack_pieces(pack_sequences(n_df, budget=256), budget=256),
            budget=256,
            n_col="piece_len",
        )
        db = packing_fill_report(
            pack_doc_boundary(n_df, budget=256, block=64), budget=256
        )
        return (
            summarize(db, "doc_boundary")
            .unionByName(summarize(straddle, "straddle"))
            .orderBy("packer")
        )


@register(
    "url_decontam_docs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             'https://' || source || '.example.org/page/'
               || CAST(doc_id // 4 AS VARCHAR) AS base
      FROM documents
    ),
    u AS (
      SELECT doc_id, source,
        CASE
          WHEN doc_id % 97 = 0 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
          WHEN doc_id % 4 = 1 THEN 'HTTP://WWW.'
               || upper(source || '.example.org') || '/page/'
               || CAST(doc_id // 4 AS VARCHAR)
          WHEN doc_id % 4 = 2 THEN base || '/?utm_source=feed&utm_campaign=x'
          WHEN doc_id % 4 = 3 THEN base || '?gclid=abc123&fbclid=z9'
          ELSE base END AS url
      FROM d
    ),
    su AS (SELECT doc_id, source, url,
                  regexp_replace(trim(url), '#.*$', '', 'g') AS s
           FROM u),
    c AS (SELECT doc_id, source, {_URL_CANON_SQL} AS canon_url FROM su),
    bench AS (
      SELECT DISTINCT canon_url FROM c
      WHERE doc_id % 4 = 0 AND (doc_id // 4) % 13 = 0 AND doc_id % 97 <> 0
    )
    SELECT c.source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN b.canon_url IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated
    FROM c LEFT JOIN bench b USING (canon_url)
    GROUP BY c.source ORDER BY c.source
    """,
)
def url_decontam_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level benchmark decontamination: the complement of the n-gram
    ``decontam`` family — pages whose CANONICAL URL appears in a
    benchmark's source list are contaminated regardless of surface form
    (tracking params, scheme/host case, trailing slash all collapse
    first).  The benchmark list is every 13th page group's plain URL;
    its case/param variants in the corpus must still be caught.  Scale
    shape: canonicalization is codegen'd scan algebra, the benchmark set
    is a broadcast join (benchmark URL lists are model-parameter-sized),
    one groupBy on source."""
    from dataquality_ml_spark.operators.web import canonical_url

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/page/"),
        F.expr("doc_id div 4").cast("string"),
    )
    url = (
        F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(F.lit("not a url "), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("HTTP://WWW."),
                F.upper(F.concat(F.col("source"), F.lit(".example.org"))),
                F.lit("/page/"),
                F.expr("doc_id div 4").cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(base, F.lit("/?utm_source=feed&utm_campaign=x")),
        )
        .when(
            F.col("doc_id") % 4 == 3,
            F.concat(base, F.lit("?gclid=abc123&fbclid=z9")),
        )
        .otherwise(base)
    )
    c = d.withColumn("canon_url", canonical_url(url)).localCheckpoint(
        eager=False
    )
    bench = (
        c.where(
            (F.col("doc_id") % 4 == 0)
            & (F.expr("(doc_id div 4) % 13") == 0)
            & (F.col("doc_id") % 97 != 0)
        )
        .select("canon_url")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        c.join(F.broadcast(bench), "canon_url", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Mergeable engine-portable sketches (operators/sketch.py): KMV distinct-
# count, count-min heavy hitters, deterministic bottom-k reservoir.  The
# pseudo-randomness is the md5 portable hash, so the APPROXIMATE estimates
# themselves replay bit-identically in DuckDB — the oracle checks the
# sketch math, not just row counts.
# ---------------------------------------------------------------------------

_SK_TOKS_CTE = (
    "toks AS (SELECT doc_id, source, lang, "
    "string_split_regex(trim(lower(nfc_normalize(text))), '\\s+') AS t "
    "FROM documents)"
)


@register(
    "kmv_distinct_tokens_docs",
    oracle=f"""
    WITH {_SK_TOKS_CTE},
    tok AS (SELECT source, unnest(t) AS token FROM toks),
    ex AS (SELECT source, COUNT(DISTINCT token) AS n_exact FROM tok GROUP BY source),
    h AS (SELECT DISTINCT source,
                 CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS kmv_h
          FROM tok),
    r AS (SELECT source, kmv_h,
                 row_number() OVER (PARTITION BY source ORDER BY kmv_h) AS rk
          FROM h),
    skc AS (SELECT source, COUNT(*) AS n_kept, MAX(kmv_h) AS kth
            FROM r WHERE rk <= 64 GROUP BY source),
    est AS (SELECT source, n_kept,
                   ROUND(CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                         ELSE 63.0 / (CAST(kth AS DOUBLE) / 1152921504606846976.0)
                         END, 4) AS est_kmv
            FROM skc)
    SELECT ex.source, ex.n_exact, est.est_kmv,
           ROUND(ABS(est.est_kmv - ex.n_exact) / ex.n_exact, 4) AS rel_err
    FROM ex JOIN est ON ex.source = est.source
    ORDER BY ex.source
    """,
)
def kmv_distinct_tokens_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token cardinality via a k=64 KMV sketch
    (Bar-Yossef et al. 2002), checked against the exact distinct AND
    against the oracle's replay of the estimator itself — the estimate is
    deterministic because the 'random' hash is the md5 portable hash.
    100 TB shape: the sketch state is 64 bigints per group (vs an exact
    distinct whose shuffle carries every token type), the bottom-k window
    is salted two-level so a dominant source never funnels through one
    task, and sketches merge associatively across shards/streams."""
    from dataquality_ml_spark.functions.scalar import pre_normalized, tokens
    from dataquality_ml_spark.operators import sketch as sk
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        tok = (
            _docs_nfc(spark, sf_dir)
            .select("source", F.explode(tokens(F.col("text"))).alias("token"))
            .localCheckpoint(eager=False)
        )
    exact = tok.groupBy("source").agg(F.countDistinct("token").alias("n_exact"))
    est = sk.kmv_distinct(tok, "token", ["source"], k=64).withColumnRenamed(
        "est_distinct", "est_kmv"
    )
    return (
        exact.join(est, "source")
        .select(
            "source",
            "n_exact",
            "est_kmv",
            F.round(
                F.abs(F.col("est_kmv") - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


@register(
    "cms_heavy_tokens_docs",
    oracle=f"""
    WITH {_SK_TOKS_CTE},
    tok AS (SELECT unnest(t) AS token FROM toks),
    ex AS (SELECT token, COUNT(*) AS n_exact FROM tok GROUP BY token),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    heavy AS (SELECT token, n_exact FROM ex, tot WHERE n_exact * 200 > tot.n),
    cells AS (SELECT g.d,
                     CAST('0x' || substr(md5(CAST(g.d AS VARCHAR) || '|' || token), 1, 8)
                          AS BIGINT) % 1024 AS bucket,
                     COUNT(*) AS cnt
              FROM tok CROSS JOIN generate_series(0, 3) AS g(d)
              GROUP BY 1, 2),
    probes AS (SELECT h.token, h.n_exact, g.d,
                      CAST('0x' || substr(md5(CAST(g.d AS VARCHAR) || '|' || h.token), 1, 8)
                           AS BIGINT) % 1024 AS bucket
               FROM heavy h CROSS JOIN generate_series(0, 3) AS g(d)),
    est AS (SELECT p.token, p.n_exact, MIN(COALESCE(c.cnt, 0)) AS est_cms
            FROM probes p LEFT JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
            GROUP BY 1, 2)
    SELECT token, n_exact, est_cms, est_cms - n_exact AS overcount
    FROM est ORDER BY token
    """,
)
def cms_heavy_tokens_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens (frequency > 0.5% of the corpus) with their
    count-min estimates (Cormode & Muthukrishnan 2005; width=1024,
    depth=4, hash row i = portable_hash32(i || '|' || token)).  The
    oracle replays the full sketch — build, point queries, min-over-depth
    — so the CMS overestimate values themselves are hash-checked.
    100 TB shape: the sketch is ≤ depth×width = 4096 rows no matter the
    corpus (the build shuffle's key space is that bounded, so map-side
    combine collapses it), lookups broadcast the sketch, and the heavy
    cutoff is exact bigint algebra (n·200 > total), no float compare."""
    from dataquality_ml_spark.functions.scalar import pre_normalized, tokens
    from dataquality_ml_spark.operators import sketch as sk
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        tok = (
            _docs_nfc(spark, sf_dir)
            .select(F.explode(tokens(F.col("text"))).alias("token"))
            .localCheckpoint(eager=False)
        )
    exact = tok.groupBy("token").agg(F.count("*").alias("n_exact"))
    tot = tok.agg(F.count("*").alias("_tot"))
    heavy = (
        exact.join(F.broadcast(tot))
        .filter(F.col("n_exact") * 200 > F.col("_tot"))
        .drop("_tot")
    )
    sketch = sk.cms_build(tok, "token", width=1024, depth=4)
    est = sk.cms_estimate(sketch, heavy.select("token"), "token", width=1024, depth=4)
    return (
        heavy.join(est, "token")
        .select(
            "token",
            "n_exact",
            F.col("est_count").alias("est_cms"),
            (F.col("est_count") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy("token")
    )


@register(
    "reservoir_docs_by_lang",
    oracle="""
    WITH h AS (SELECT lang, doc_id,
                      CAST('0x' || substr(md5('res|' || CAST(doc_id AS VARCHAR)), 1, 15)
                           AS BIGINT) AS res_h
               FROM documents),
    r AS (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang ORDER BY res_h, doc_id) AS rk
          FROM h)
    SELECT lang, doc_id, CAST(rk AS INT) AS res_rank
    FROM r WHERE rk <= 5 ORDER BY lang, res_rank
    """,
)
def reservoir_docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-5 uniform-without-replacement docs per language via the
    deterministic bottom-k reservoir (keep the 5 smallest salted portable
    hashes).  Unlike Bernoulli ``sample_hash`` the output size is exact;
    unlike ``orderBy(rand()).limit`` it is engine-portable and MERGEABLE
    — per-shard bottom-k unions re-truncate to the global bottom-k, so a
    stream maintains it incrementally.  The salted two-level window keeps
    every task bounded under language skew."""
    from dataquality_ml_spark.operators import sketch as sk

    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id")
    return (
        sk.reservoir_sample(docs, k=5, group_cols=["lang"], id_col="doc_id")
        .select("lang", "doc_id", "res_rank")
        .orderBy("lang", "res_rank")
    )


@register(
    "session_stats_events",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, value,
             EXTRACT(EPOCH FROM ts) AS e,
             LAG(EXTRACT(EPOCH FROM ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pe
      FROM events
    ),
    f AS (SELECT *, CASE WHEN pe IS NULL OR e - pe > 1800 THEN 1 ELSE 0 END AS nw
          FROM g),
    s AS (SELECT *, CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY e, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    AS session_seq
          FROM f)
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           ROUND(MAX(e) - MIN(e), 4) AS duration_s,
           ROUND(SUM(value), 4) AS sum_value
    FROM s GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def session_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SESSION rollup (duration, value sum) under 30-min-gap
    sessionization — the companion of the per-USER ``sessionize_events``
    count query (queries.py:1584), now via the reusable
    ``sequences.sessionize``/``session_stats`` operators:
    lag → start-flag → cumulative sum, both analytics over one
    (user_id, ts) partitioning — a single shuffle — then a
    co-partitioned groupBy.  The batch face of the streaming
    ``session_window`` aggregation; classic clickstream/backfill shape
    the reference's per-row pandas pipeline cannot express."""
    from dataquality_ml_spark.operators.sequences import session_stats, sessionize

    ev = _t(spark, sf_dir, "events")
    sess = sessionize(ev, key="user_id", order="ts", max_gap_seconds=1800.0)
    return session_stats(sess, key="user_id", order="ts", value="value").orderBy(
        "user_id", "session_seq"
    )


@register(
    "hybrid_search_docs",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    vs AS (SELECT query_id, neighbor_id,
             ROUND(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4) + 0 AS sim
           FROM q, c WHERE neighbor_id != query_id),
    vr AS (SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank_a
           FROM vs QUALIFY rank_a <= 20),
    toks AS (SELECT doc_id,
               list_distinct(string_split_regex(trim(lower(nfc_normalize(text))), '\\s+')) AS tset
             FROM documents),
    lq AS (SELECT doc_id AS query_id, tset AS q_set FROM toks WHERE doc_id < 3),
    ls AS (SELECT lq.query_id, t.doc_id AS neighbor_id,
             ROUND(len(list_intersect(q_set, tset))
               / CAST(len(q_set) + len(tset) - len(list_intersect(q_set, tset)) AS DOUBLE), 4) + 0 AS sim
           FROM lq, toks t WHERE t.doc_id != lq.query_id),
    lr AS (SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank_b
           FROM ls QUALIFY rank_b <= 20),
    f AS (SELECT COALESCE(vr.query_id, lr.query_id) AS query_id,
             COALESCE(vr.neighbor_id, lr.neighbor_id) AS neighbor_id,
             vr.rank_a, lr.rank_b,
             ROUND(COALESCE(CAST(1 AS DOUBLE)/(60 + vr.rank_a), 0.0)
                 + COALESCE(CAST(1 AS DOUBLE)/(60 + lr.rank_b), 0.0), 6) + 0 AS rrf_score
          FROM vr FULL OUTER JOIN lr
            ON vr.query_id = lr.query_id AND vr.neighbor_id = lr.neighbor_id)
    SELECT query_id, neighbor_id, rank_a, rank_b, rrf_score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY rrf_score DESC, neighbor_id) AS INTEGER) AS fused_rank
    FROM f QUALIFY fused_rank <= 10
    ORDER BY query_id, fused_rank
    """,
)
def hybrid_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009): per query doc, the vector top-20 (exact cosine over the
    aligned embeddings table) and the lexical top-20 (distinct-token
    Jaccard) fuse as Σ 1/(60+rank) into one ranking — the
    retrieval-based curation face (find training docs related to a seed
    set by meaning OR wording).  Both candidate generators broadcast
    the 3 query vectors/token-sets and stream the corpus; the fusion
    join and window touch only O(|queries|·20) rows.  All scores are
    4dp-rounded with id tie-breaks, so the oracle replays every rank
    bit-identically."""
    from dataquality_ml_spark.functions.scalar import pre_normalized, tokens
    from dataquality_ml_spark.operators import text as txo
    from dataquality_ml_spark.queries import _docs_nfc

    emb = _t(spark, sf_dir, "embeddings")
    vec = sim.knn_bruteforce(emb, emb.where(F.col("vec_id") < 3), k=20)
    with pre_normalized():
        tok = _docs_nfc(spark, sf_dir).select(
            "doc_id", F.array_distinct(tokens(F.col("text"))).alias("tset")
        )
    tok = tok.localCheckpoint(eager=False)
    lex = txo.jaccard_topk(tok, tok.where(F.col("doc_id") < 3), k=20)
    return sim.rrf_fuse(vec, lex, topk=10)


@register(
    "triplet_manifest_embeddings",
    oracle="""
    WITH a AS (
      SELECT vec_id AS anchor_id, label AS anchor_label,
             embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    c AS (
      SELECT vec_id AS cid, label AS clabel, embedding::DOUBLE[] AS cv
      FROM embeddings
    ),
    scored AS (
      SELECT anchor_id, anchor_label, cid, clabel,
             ROUND(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) *
                    sqrt(list_dot_product(cv, cv))), 4) + 0 AS sim
      FROM a, c WHERE cid != anchor_id
    ),
    pos AS (
      SELECT anchor_id, anchor_label, cid AS pos_id, sim AS pos_sim
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
              ORDER BY sim DESC, cid) AS rn
            FROM scored WHERE clabel = anchor_label)
      WHERE rn = 1
    ),
    neg AS (
      SELECT anchor_id, cid AS neg_id, sim AS neg_sim
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
              ORDER BY sim DESC, cid) AS rn
            FROM scored WHERE clabel != anchor_label)
      WHERE rn = 1
    )
    SELECT p.anchor_id, p.anchor_label, p.pos_id, p.pos_sim,
           n.neg_id, n.neg_sim,
           ROUND(p.pos_sim - n.neg_sim, 4) AS margin
    FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
    ORDER BY p.anchor_id
    """,
)
def triplet_manifest_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training triplets per anchor (vec_id < 10): hardest
    same-label positive ⊕ hardest different-label negative
    (``similarity.triplet_manifest``), with margin = pos_sim − neg_sim
    — the per-triplet difficulty a metric-learning curriculum filters
    on.  Both miners broadcast the anchors and stream the corpus; the
    manifest join touches only the two rank-1 relations."""
    from dataquality_ml_spark.operators.similarity import triplet_manifest

    emb = _t(spark, sf_dir, "embeddings")
    return triplet_manifest(emb, emb.where(F.col("vec_id") < 10))


def _hybrid_ivf_oracle() -> str:
    from dataquality_ml_spark.queries import _CENT_CTE, _COS_SQL

    return f"""
    WITH {_CENT_CTE},
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    assign_scored AS (
      SELECT v.vec_id, c.centroid_id,
        ROUND(list_dot_product(v.emb, c.centroid)
          / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.centroid, c.centroid))), 6) + 0 AS sim
      FROM vecs v, cent c
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
        FROM assign_scored
      ) WHERE rn = 1
    ),
    q AS (
      SELECT v.vec_id AS query_id, v.emb AS qv, a.cluster AS q_cluster
      FROM vecs v JOIN assign a USING (vec_id) WHERE v.vec_id < 3
    ),
    c AS (
      SELECT v.vec_id AS neighbor_id, v.emb AS cv, a.cluster AS c_cluster
      FROM vecs v JOIN assign a USING (vec_id)
    ),
    vs AS (
      SELECT query_id, neighbor_id, ROUND({_COS_SQL}, 4) + 0 AS sim
      FROM q JOIN c ON c_cluster = q_cluster AND neighbor_id != query_id
    ),
    vr AS (SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank_a
           FROM vs QUALIFY rank_a <= 20),
    toks AS (SELECT doc_id,
               list_distinct(string_split_regex(trim(lower(nfc_normalize(text))), '\\s+')) AS tset
             FROM documents),
    lq AS (SELECT doc_id AS query_id, tset AS q_set FROM toks WHERE doc_id < 3),
    ls AS (SELECT lq.query_id, t.doc_id AS neighbor_id,
             ROUND(len(list_intersect(q_set, tset))
               / CAST(len(q_set) + len(tset) - len(list_intersect(q_set, tset)) AS DOUBLE), 4) + 0 AS sim
           FROM lq, toks t WHERE t.doc_id != lq.query_id),
    lr AS (SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank_b
           FROM ls QUALIFY rank_b <= 20),
    f AS (SELECT COALESCE(vr.query_id, lr.query_id) AS query_id,
             COALESCE(vr.neighbor_id, lr.neighbor_id) AS neighbor_id,
             vr.rank_a, lr.rank_b,
             ROUND(COALESCE(CAST(1 AS DOUBLE)/(60 + vr.rank_a), 0.0)
                 + COALESCE(CAST(1 AS DOUBLE)/(60 + lr.rank_b), 0.0), 6) + 0 AS rrf_score
          FROM vr FULL OUTER JOIN lr
            ON vr.query_id = lr.query_id AND vr.neighbor_id = lr.neighbor_id)
    SELECT query_id, neighbor_id, rank_a, rank_b, rrf_score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY rrf_score DESC, neighbor_id) AS INTEGER) AS fused_rank
    FROM f QUALIFY fused_rank <= 10
    ORDER BY query_id, fused_rank
    """


@register("hybrid_search_ivf_docs", oracle=_hybrid_ivf_oracle())
def hybrid_search_ivf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path of ``hybrid_search_docs``: the vector half goes
    through the IVF index (cluster-pruned candidate generation — the
    corpus side of the cosine join shrinks to the probed cells) instead
    of the brute-force scan, then reciprocal-rank-fuses with the same
    lexical top-20.  Same fusion operator, same oracle algebra — only
    the candidate generator swaps, which is the point of keeping
    ``rrf_fuse`` generator-agnostic."""
    from dataquality_ml_spark.functions.scalar import pre_normalized, tokens
    from dataquality_ml_spark.operators import text as txo
    from dataquality_ml_spark.queries import _docs_nfc

    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.centroids_by_label(emb)
    vec = sim.knn_ivf(emb, emb.where(F.col("vec_id") < 3), cents, k=20)
    with pre_normalized():
        tok = _docs_nfc(spark, sf_dir).select(
            "doc_id", F.array_distinct(tokens(F.col("text"))).alias("tset")
        )
    tok = tok.localCheckpoint(eager=False)
    lex = txo.jaccard_topk(tok, tok.where(F.col("doc_id") < 3), k=20)
    return sim.rrf_fuse(vec, lex, topk=10)


@register(
    "budget_select_docs",
    oracle="""
    WITH toks AS (SELECT doc_id,
            string_split_regex(trim(lower(nfc_normalize(text))), '\\s+') AS t
          FROM documents),
    q AS (SELECT doc_id, len(t) AS n_tokens,
            COALESCE(ROUND(len(list_filter(t, w -> w IN ({stops})))
                     / CAST(len(t) AS DOUBLE), 4), 0.0) AS score
          FROM toks),
    c AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
                ORDER BY score DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tokens_before
          FROM q)
    SELECT doc_id, score, n_tokens, tokens_before
    FROM c WHERE tokens_before + n_tokens <= 50000
    ORDER BY score DESC, doc_id
    """.format(stops=", ".join(f"'{w}'" for w in tx.STOPWORDS)),
)
def budget_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained corpus selection: score every doc
    (stopword fraction as the natural-language-ness proxy), rank
    (score desc, doc_id), keep the maximal prefix that fits a 50k-token
    training budget — ``selection.budget_select`` over the shared
    distributed prefix sum, so the global cumulative-token rank runs as
    range partitions + per-partition windows with no partition-less
    window anywhere.  The oracle replays the greedy as one window
    cumulative sum."""
    from dataquality_ml_spark.operators import selection as sel
    from dataquality_ml_spark.functions.scalar import pre_normalized, tokens
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        t = _docs_nfc(spark, sf_dir).select(
            "doc_id", tokens(F.col("text")).alias("t")
        )
    from dataquality_ml_spark.operators.text import STOPWORDS

    n_tok = F.size("t")
    stop_frac = F.round(
        F.size(F.filter("t", lambda w: w.isin(*STOPWORDS))) / n_tok, 4
    )
    scored = t.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.coalesce(stop_frac, F.lit(0.0)).alias("score"),
    )
    out = sel.budget_select(scored, 50_000, "score", "n_tokens", "doc_id")
    return out.select("doc_id", "score", "n_tokens", "tokens_before").orderBy(
        F.col("score").desc(), "doc_id"
    )


@register(
    "source_overlap_docs",
    oracle=f"""
    WITH {_SK_TOKS_CTE},
    tok AS (SELECT source, unnest(t) AS token FROM toks),
    h AS (SELECT DISTINCT source,
                 CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS kmv_h
          FROM tok),
    r AS (SELECT source, kmv_h,
                 row_number() OVER (PARTITION BY source ORDER BY kmv_h) AS rk
          FROM h),
    sk AS (SELECT source, kmv_h FROM r WHERE rk <= 64),
    srcs AS (SELECT DISTINCT source FROM sk),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b
              FROM srcs a JOIN srcs b ON a.source < b.source),
    sides AS (
        SELECT p.src_a, p.src_b, s.kmv_h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.source = p.src_a
        UNION ALL
        SELECT p.src_a, p.src_b, s.kmv_h, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk s ON s.source = p.src_b
    ),
    u AS (SELECT src_a, src_b, kmv_h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
          FROM sides GROUP BY src_a, src_b, kmv_h),
    m AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b
                                       ORDER BY kmv_h) AS rk
          FROM u),
    agg AS (SELECT src_a, src_b, COUNT(*) AS n_union_kept,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
                   MAX(kmv_h) AS kth
            FROM m WHERE rk <= 64 GROUP BY src_a, src_b),
    est AS (SELECT src_a, src_b, n_union_kept, n_both,
                   ROUND(CAST(n_both AS DOUBLE) / n_union_kept, 4) AS jaccard_est,
                   ROUND(CASE WHEN n_union_kept < 64
                         THEN CAST(n_union_kept AS DOUBLE)
                         ELSE 63.0 / (CAST(kth AS DOUBLE) / 1152921504606846976.0)
                         END, 4) AS est_union
            FROM agg)
    SELECT src_a, src_b, n_union_kept, n_both, jaccard_est, est_union,
           ROUND(jaccard_est * est_union, 2) AS est_overlap
    FROM est
    ORDER BY src_a, src_b
    """,
)
def source_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs source-overlap matrix from KMV sketches alone (bottom-k
    union trick, Cohen & Kaplan 2007): per source pair, estimated token
    Jaccard, union cardinality, and shared-token count — the
    which-sources-duplicate-each-other report that drives source-level
    mixing and contamination decisions.  The corpus is read once to build
    64-hash-per-source sketches; the pair matrix never touches a raw
    token, so the cost is O(|sources|²·k) regardless of corpus size.
    The estimates are deterministic on the md5 portable hash and the
    oracle replays the full estimator bit-identically."""
    from dataquality_ml_spark.functions.scalar import pre_normalized, tokens
    from dataquality_ml_spark.operators import sketch as sk
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        tok = _docs_nfc(spark, sf_dir).select(
            "source", F.explode(tokens(F.col("text"))).alias("token")
        )
    sketches = sk.kmv_sketch(tok, "token", ["source"], k=64)
    return sk.kmv_pairwise_jaccard(sketches, "source", k=64).orderBy(
        "src_a", "src_b"
    )


@register(
    "hll_distinct_tokens_docs",
    oracle=f"""
    WITH {_SK_TOKS_CTE},
    tok AS (SELECT source, unnest(t) AS token FROM toks)
    SELECT source,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS n_exact,
           1 AS hll_within_3sigma
    FROM tok GROUP BY source ORDER BY source
    """,
)
def hll_distinct_tokens_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token cardinality via Spark's builtin
    DataSketches HLL (2^12 registers, ~1.6% standard error) gated
    against the exact count — the JVM-native fast face of
    ``kmv_distinct_tokens_docs``. Upgraded from rows-only to a HASH gate
    (VERDICT r12 item 6): the raw estimate depends on the DataSketches
    implementation (DuckDB's approx_count_distinct does not share it),
    but its DOCUMENTED accuracy contract is engine-independent — the
    face emits ``n_exact`` (bit-replayable SQL) plus
    ``hll_within_3sigma`` = est within 3·1.04/√2¹² ≈ 5% relative error,
    which the oracle asserts is literally 1 for every source. A
    DataSketches regression past the published bound now breaks the
    hash, not just a unit test; the raw-estimate report and shard-merge
    consistency stay pinned in tests/test_sketch.py. 100 TB shape:
    fixed register state per group, map-side partial merge, no window,
    no Python."""
    from dataquality_ml_spark.functions.scalar import pre_normalized, tokens
    from dataquality_ml_spark.operators import sketch as sk
    from dataquality_ml_spark.queries import _docs_nfc

    with pre_normalized():
        tok = _docs_nfc(spark, sf_dir).select(
            "source", F.explode(tokens(F.col("text"))).alias("token")
        )
    exact = tok.groupBy("source").agg(F.countDistinct("token").alias("n_exact"))
    est = sk.hll_distinct(tok, "token", ["source"], lgk=12)
    return (
        exact.join(est, "source")
        .select(
            "source",
            "n_exact",
            (
                F.abs(F.col("est_hll") - F.col("n_exact"))
                / F.col("n_exact")
                <= F.lit(0.05)
            ).cast("int").alias("hll_within_3sigma"),
        )
        .orderBy("source")
    )


# ===========================================================================
# Round 8: binned-AUC oracle face (VERDICT r7 item 3)
# ===========================================================================
@register(
    "roc_auc_binned_value",
    oracle="""
    WITH lh AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
      WHERE value IS NOT NULL
    ),
    b AS (
      SELECT LEAST(999, CAST(FLOOR((value - lo) /
               (CASE WHEN (hi - lo) / 1000.0 = 0 THEN 1.0
                     ELSE (hi - lo) / 1000.0 END)) AS BIGINT)) AS bk,
             (event_type = 'error') AS y
      FROM events, lh WHERE value IS NOT NULL
    ),
    hist AS (
      SELECT bk,
             COUNT(*) FILTER (WHERE y)     AS np,
             COUNT(*) FILTER (WHERE NOT y) AS nn
      FROM b GROUP BY bk
    ),
    sc AS (
      SELECT np, nn,
             COALESCE(SUM(nn) OVER (ORDER BY bk
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nn_below
      FROM hist
    )
    SELECT ROUND(CAST(SUM(CAST(np AS HUGEINT) * (2 * nn_below + nn)) AS DOUBLE)
                 / (2.0 * SUM(np) * SUM(nn)), 4) AS auc,
           SUM(np) AS np, SUM(nn) AS nn
    FROM sc
    """,
)
def roc_auc_binned_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB AUC face, driver-gated like the exact one (VERDICT r7
    item 3): same Mann-Whitney midrank statistic as ``roc_auc_value``
    (reference A12, lib/utils.py:117-151) but over a 1000-bucket score
    histogram — one fully parallel aggregation, a window over ≤ 1000
    rows, exact integer pair counting (decimal/HUGEINT on the two
    engines), and a single double division; bit-identical cross-engine
    by construction.  ``tests/test_ml.py`` pins binned ≈ exact."""
    from dataquality_ml_spark.operators import evaluate as ev

    ev_df = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .withColumn("label", F.col("event_type") == "error")
    )
    return ev.roc_auc_binned(ev_df, "value", "label", bins=1000)


# ===========================================================================
# Round 8: mergeable fixed-bin quantile sketch (VERDICT r7 item 4)
# ===========================================================================
@register(
    "quantile_sketch_events",
    oracle="""
    WITH h AS (
      SELECT LEAST(199, GREATEST(0, CAST(FLOOR((value - 0.0) / 2.5) AS BIGINT)))
               AS qs_bin,
             COUNT(*) AS qs_cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT qs_bin, qs_cnt,
             SUM(qs_cnt) OVER (ORDER BY qs_bin) AS cum,
             SUM(qs_cnt) OVER () AS n
      FROM h
    ),
    q AS (SELECT UNNEST(CAST([0.5, 0.9, 0.95, 0.99] AS DOUBLE[])) AS q)
    SELECT q.q AS q,
           ROUND(MIN(0.0 + 2.5 * (qs_bin + (q.q * n - (cum - qs_cnt)) / qs_cnt)),
                 4) + 0 AS est
    FROM c, q
    WHERE cum >= q.q * n AND cum - qs_cnt < q.q * n
    GROUP BY q.q ORDER BY q.q
    """,
)
def quantile_sketch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile thresholds read from the mergeable fixed-bin quantile
    sketch (VERDICT r7 item 4): the persistable/cross-shard face of
    reference A7/A8 — a frozen (lo=0, hi=500, bins=200) quantizer, one
    fully parallel histogram aggregation, and a bounded-window read with
    uniform-within-bin interpolation.  merge == whole is pinned in
    tests/test_sketch.py; the streaming face is
    ``streaming.qsketch_monitor_stream``.  The DuckDB oracle replays the
    identical integer-count + double algebra bit-for-bit."""
    from dataquality_ml_spark.operators import sketch as sk

    ev_df = _t(spark, sf_dir, "events")
    s = sk.qsketch_build(ev_df, "value", 0.0, 500.0, bins=200)
    est = sk.qsketch_quantiles(s, [0.5, 0.9, 0.95, 0.99], 0.0, 500.0, bins=200)
    return est.select(
        "q", (F.round("est", 4) + F.lit(0.0)).alias("est")
    ).orderBy("q")


# ===========================================================================
# Round 8: derived partsupp → TPC-H q2/q9/q11/q16/q20 (VERDICT r7 item 5)
#
# The driver's testdata ships no partsupp relation, so the five TPC-H join
# shapes that need it are closed over a DERIVED partsupp: a deterministic
# pure-arithmetic expansion of part × {0..3} (4 suppliers per part, the
# TPC-H multiplicity) that BOTH engines compute independently from the
# same parquet — (p_partkey + i·(S//4+1)) mod S for the supplier spread,
# integer-arithmetic attrs, and an exact cost-in-cents twin (ps_costc) so
# threshold/HAVING comparisons aggregate in exact integers (a float-sum
# boundary flip would change the ROW SET, not just a rounding digit).
# Dates/filters are adapted to the driver corpus (1995-2001, NATION_*/
# real region names); shapes and join graphs are the TPC-H ones.
# ===========================================================================

_PARTSUPP_CTE = """
    _sn AS (SELECT COUNT(*) AS s FROM supplier),
    _i4 AS (SELECT UNNEST([0, 1, 2, 3]) AS i),
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + i * (s // 4 + 1)) % s AS ps_suppkey,
             CAST((p_partkey * 7 + i * 11) % 9999 + 1 AS INTEGER) AS ps_availqty,
             CAST((p_partkey * 31 + ((p_partkey + i * (s // 4 + 1)) % s) * 17)
                  % 100000 AS DOUBLE) / 100.0 AS ps_supplycost,
             (p_partkey * 31 + ((p_partkey + i * (s // 4 + 1)) % s) * 17)
                  % 100000 AS ps_costc
      FROM part, _i4, _sn
    )
"""

_PS_SUPP_COUNT_MEMO: dict = {}


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp (see section comment): 4 rows per part, unique
    (ps_partkey, ps_suppkey), attrs pure integer arithmetic — identical
    under any partitioning and bit-reproducible in DuckDB.  |partsupp| =
    4·|part|: a FACT relation at 100 TB (never broadcast it); the only
    driver traffic is the supplier COUNT (memoized scalar)."""
    if sf_dir not in _PS_SUPP_COUNT_MEMO:
        _PS_SUPP_COUNT_MEMO[sf_dir] = _t(spark, sf_dir, "supplier").count()
    s = _PS_SUPP_COUNT_MEMO[sf_dir]
    step = s // 4 + 1
    base = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("ps_partkey"),
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("_i"),
    )
    suppkey = (F.col("ps_partkey") + F.col("_i") * F.lit(step)) % F.lit(s)
    costc = (F.col("ps_partkey") * 31 + suppkey * 17) % 100000
    return base.select(
        "ps_partkey",
        suppkey.alias("ps_suppkey"),
        ((F.col("ps_partkey") * 7 + F.col("_i") * 11) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (costc.cast("double") / 100.0).alias("ps_supplycost"),
        costc.cast("bigint").alias("ps_costc"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    eligible AS (
      SELECT p.p_partkey, p.p_brand, ps.ps_supplycost, ps.ps_suppkey
      FROM part p
      JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
      JOIN supplier s  ON s.s_suppkey   = ps.ps_suppkey
      JOIN nation n    ON n.n_nationkey = s.s_nationkey
      JOIN region r    ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
    ),
    mn AS (SELECT p_partkey, MIN(ps_supplycost) AS min_cost
           FROM eligible GROUP BY 1)
    SELECT s.s_acctbal, s.s_name, n.n_name, e.p_partkey, e.p_brand,
           ROUND(e.ps_supplycost, 2) AS ps_supplycost
    FROM eligible e
    JOIN mn ON mn.p_partkey = e.p_partkey AND e.ps_supplycost = mn.min_cost
    JOIN supplier s ON s.s_suppkey = e.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, e.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: selective part filter → region-restricted
    supplier star → per-part MIN(ps_supplycost) → join-back on the
    minimum (the decorrelated form of the spec's correlated subquery —
    what Catalyst would rewrite it to anyway) → top-100.

    100 TB plan: part filter pushes to the scan; supplier⋈nation⋈region
    is a broadcast chain (dims); partsupp⋈part shuffles on partkey; the
    min-cost relation is per-part aggregate-sized and AQE picks the join
    strategy for the join-back.  Float-equality on the min is safe: both
    sides carry the identical double (same bit pattern, no arithmetic
    between agg and compare)."""
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    elig = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(eu_supp), ps.ps_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_brand", "ps_supplycost",
            "s_suppkey", "s_name", "s_acctbal", "n_name",
        )
    )
    mn = (
        elig.groupBy(F.col("p_partkey").alias("mn_partkey"))
        .agg(F.min("ps_supplycost").alias("min_cost"))
    )
    return (
        elig.join(
            mn,
            (F.col("p_partkey") == F.col("mn_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("ps_supplycost", 2).alias("ps_supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


@register(
    "q9_product_profit",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                     - ps.ps_costc * CAST(l.l_quantity AS BIGINT) * 100)
                 / 10000.0, 2) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by nation × year): the 6-relation join with
    partsupp keyed on BOTH (partkey, suppkey).  Profit aggregates in
    EXACT integer 1e-4-dollar units (prices/discounts are 2-decimal,
    quantities integral — cents×percent arithmetic stays in bigint), so
    the sum is order-independent and the DuckDB replay bit-identical;
    one double division at the end.

    100 TB plan: p_name filter prunes part before broadcast; lineitem
    shuffles once on (partkey, suppkey) for the partsupp join (both
    fact-sized); orders⋈lineitem shuffles on orderkey; supplier/nation
    broadcast."""
    ps = _partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    profit_u = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
        - F.col("ps_costc") * F.col("l_quantity").cast("bigint") * 100
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit_u) / 10000.0, 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    filt AS (
      SELECT ps.ps_partkey, ps.ps_costc * ps.ps_availqty AS vc
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    byp AS (SELECT ps_partkey, SUM(vc) AS vcents FROM filt GROUP BY 1),
    tot AS (SELECT SUM(vcents) AS tcents FROM byp)
    SELECT ps_partkey, ROUND(vcents / 100.0, 2) AS stock_value
    FROM byp, tot
    WHERE vcents > tcents * 0.0001
    ORDER BY stock_value DESC, ps_partkey
    LIMIT 100
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock by nation): per-part stock value
    vs a fraction-of-total HAVING threshold.  The value aggregates in
    EXACT integer cents (ps_costc × ps_availqty) so the threshold
    comparison can never flip a borderline part between engines — a
    float-sum boundary here changes the row set, not a digit.

    100 TB plan: nation→supplier is a broadcast chain; partsupp shuffles
    once on ps_partkey for the per-part agg; the grand total is a 1-row
    aggregate broadcast back (no second scan of partsupp)."""
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    filt = (
        ps.join(
            F.broadcast(
                supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
                .select("s_suppkey")
            ),
            ps.ps_suppkey == F.col("s_suppkey"),
        )
        .select("ps_partkey", (F.col("ps_costc") * F.col("ps_availqty")).alias("vc"))
    )
    # two consumers (threshold total + the filtered report) — checkpoint
    # so the partsupp/supplier join + groupBy run once (round 13)
    byp = filt.groupBy("ps_partkey").agg(F.sum("vc").alias("vcents")).localCheckpoint(
        eager=False
    )
    tot = byp.agg(F.sum("vcents").alias("tcents"))
    return (
        byp.crossJoin(F.broadcast(tot))
        .where(F.col("vcents") > F.col("tcents") * 0.0001)
        .select(
            "ps_partkey",
            F.round(F.col("vcents") / 100.0, 2).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), F.asc("ps_partkey"))
        .limit(100)
    )


@register(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier counts by part attrs): attribute
    filters + an anti-join exclusion list (the spec's Customer
    Complaints supplier set, adapted to a deterministic s_acctbal
    predicate) + COUNT(DISTINCT) per attribute group.

    100 TB plan: part filters push to the scan and part broadcasts; the
    exclusion list is an aggregate-sized broadcast ANTI join (NOT IN on
    a non-null key = left_anti, no null trap); the distinct-count
    shuffles once on the (brand, type, size) group key with partial
    aggregation."""
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 100)
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    return (
        ps.join(bad_supp, "ps_suppkey", "left_anti")
        .join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
            F.asc("p_size"),
        )
    )


@register(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    qty AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'red%'
      JOIN qty    ON qty.l_partkey = ps.ps_partkey
                 AND qty.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > 0.5 * qty.q
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN excess e ON e.ps_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s.s_name
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess stock of a part family):
    year-windowed shipped-quantity aggregate per (part, supplier) vs
    50% of available stock, then a DISTINCT supplier projection joined
    to names.  Adapted: pairs with NO shipments in the window are out
    (inner join to the qty aggregate), vs the spec's compare-against-0 —
    both engines implement the identical semantics.  Quantities are
    integral doubles → the 0.5·q threshold is exact.

    100 TB plan: the shipdate window pushes to the lineitem scan; the
    qty aggregate shuffles lineitem once on (partkey, suppkey) and the
    partsupp join reuses that key; part filter broadcast; the final
    DISTINCT is supplier-cardinality-sized."""
    ps = _partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    qty = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("q"))
    excess = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            qty,
            (qty.l_partkey == ps.ps_partkey) & (qty.l_suppkey == ps.ps_suppkey),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("q"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        supp.join(excess, supp.s_suppkey == excess.ps_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Round-8 drift-test family: the rank-based, body-shift, and localized
# complements to ks_drift_events — all on the shared grouped-distinct-value
# + distributed-prefix-sum machinery (operators/drift.py _ecdf_counts), so
# none funnels a row-sized relation through one task at any cardinality.
# Reference A12/drift context: the reference retrains daily but never
# tests distribution shift (app/test_AE.py:87-97); these are the
# production-grade tests that decide WHEN its retrain should fire.
# ---------------------------------------------------------------------------
_DRIFT_SPLIT_TS = "2024-01-16"  # events span 2024-01; halves = ref vs cur


def _events_ecdf(spark: SparkSession, sf_dir: str):
    """Memoized shared ECDF relation for the two-sample drift family per
    (sf_dir, data fingerprint): the four statistics (KS / Mann-Whitney /
    CvM / Anderson-Darling) over the same (events.value, month-half
    split) all read the SAME ``drift._ecdf_counts`` output — grouped
    distinct values + prefix sums + totals. Build it once, lazily
    checkpoint, and let each query reduce it its own way (the
    deterministic-artifact memo contract: _TOK_MEMO entries are dropped
    by ``clear_feature_model_memo`` and invalidate on the parquet
    fingerprint)."""
    from dataquality_ml_spark.operators.drift import _ecdf_from_tagged
    from dataquality_ml_spark.queries import _parquet_fingerprint

    key = ("ecdf_ev", sf_dir, _parquet_fingerprint(f"{sf_dir}/events.parquet"))
    hit = _TOK_MEMO.get(key)
    if hit is None:
        # single tagged scan (round 13, §18): identical rows to the
        # two-filter union — NULL ts belongs to neither side either way
        ev = _t(spark, sf_dir, "events")
        tag = F.col("ts") < F.to_timestamp(F.lit(_DRIFT_SPLIT_TS))
        tagged = (
            ev.where(F.col("value").isNotNull())
            .select(
                F.col("value").alias("v"),
                F.when(tag, 1).when(~tag, 0).alias("in_a"),
            )
            .where(F.col("in_a").isNotNull())
        )
        hit = _ecdf_from_tagged(tagged, [], bounded=False).localCheckpoint(
            eager=False
        )
        _TOK_MEMO[key] = hit
    return hit


@register(
    "mann_whitney_drift_events",
    oracle=f"""
    WITH tagged AS (
      SELECT value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (SELECT v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b FROM tagged GROUP BY v),
    mr AS (
      SELECT n_a, n_a + n_b AS cnt,
             SUM(n_a + n_b) OVER (ORDER BY v) - (n_a + n_b)
               + (n_a + n_b + 1) / 2.0 AS midrank
      FROM per_v
    ),
    s AS (
      SELECT SUM(n_a * midrank) AS ra,
             CAST(SUM(cnt * cnt * cnt - cnt) AS DOUBLE) AS ties,
             CAST(SUM(n_a) AS DOUBLE) AS na,
             CAST(SUM(cnt - n_a) AS DOUBLE) AS nb
      FROM mr
    )
    SELECT ra - na * (na + 1) / 2 AS u_stat,
           ROUND((ra - na * (na + 1) / 2 - na * nb / 2)
                 / SQRT(na * nb / 12
                        * ((na + nb + 1) - ties / ((na + nb) * (na + nb - 1)))),
                 6) + 0 AS z_score,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b
    FROM s
    """,
)
def mann_whitney_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U drift between the two halves of the events month:
    pooled midranks from grouped value counts + exclusive_prefix_sum
    (drift.rank_sum_test) — every midrank is a multiple of 0.5, so
    u_stat is IEEE-exact and unrounded on both engines."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.rank_sum_test(None, None, "value", ecdf=_events_ecdf(spark, sf_dir))
    return out.select(
        "u_stat",
        (F.round("z_score", 6) + F.lit(0.0)).alias("z_score"),
        "n_a",
        "n_b",
    )


@register(
    "cvm_drift_events",
    oracle=f"""
    WITH tagged AS (
      SELECT value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (SELECT v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b FROM tagged GROUP BY v),
    cum AS (
      SELECT n_a, n_b,
             SUM(n_a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(n_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(n_a) OVER () AS tot_a,
             SUM(n_b) OVER () AS tot_b
      FROM per_v
    ),
    s AS (
      SELECT SUM(CAST(n_a + n_b AS HUGEINT)
                 * (CAST(ca AS HUGEINT) * tot_b - CAST(cb AS HUGEINT) * tot_a)
                 * (CAST(ca AS HUGEINT) * tot_b - CAST(cb AS HUGEINT) * tot_a)) AS s,
             MAX(CAST(tot_a + tot_b AS HUGEINT) * (tot_a + tot_b) * tot_a * tot_b) AS denom,
             MAX(tot_a) AS n_a, MAX(tot_b) AS n_b
      FROM cum
    )
    SELECT ROUND(CAST(s AS DOUBLE) / CAST(denom AS DOUBLE), 6) + 0 AS cvm_t,
           n_a, n_b
    FROM s
    """,
)
def cvm_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises drift between the events-month halves
    (drift.cvm_statistic): the squared-ECDF-gap numerator reduces in
    exact integer decimals, so both engines round the SAME double."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.cvm_statistic(None, None, "value", ecdf=_events_ecdf(spark, sf_dir))
    return out.select(
        (F.round("cvm_t", 6) + F.lit(0.0)).alias("cvm_t"), "n_a", "n_b"
    )


@register(
    "qq_drift_deciles",
    oracle=f"""
    WITH a AS (
      SELECT value AS v FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    b AS (
      SELECT value AS v FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    qa AS (
      SELECT UNNEST([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q,
             UNNEST(QUANTILE_CONT(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS va
      FROM a
    ),
    qb AS (
      SELECT UNNEST([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q,
             UNNEST(QUANTILE_CONT(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS vb
      FROM b
    )
    SELECT CAST(qa.q AS DOUBLE) AS q,
           ROUND(va, 6) AS val_a,
           ROUND(vb, 6) AS val_b,
           ROUND(vb - va, 6) AS gap
    FROM qa JOIN qb ON qa.q = qb.q
    ORDER BY q
    """,
)
def qq_drift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile Q-Q drift table between the events-month halves — WHERE the
    distribution moved, not just whether (drift.qq_table: one
    exact_quantiles_grouped build keyed on the side tag, never a
    single-buffer percentile aggregate)."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.qq_table(None, None, "value", ecdf=_events_ecdf(spark, sf_dir))
    return out.select(
        "q",
        F.round("val_a", 6).alias("val_a"),
        F.round("val_b", 6).alias("val_b"),
        F.round("gap", 6).alias("gap"),
    ).orderBy("q")


@register(
    "mutual_info_source_lang",
    oracle="""
    WITH cont AS (
      SELECT source, lang, COUNT(*) AS o FROM documents
      WHERE source IS NOT NULL AND lang IS NOT NULL
      GROUP BY 1, 2
    ),
    ma AS (SELECT source, SUM(o) AS ma FROM cont GROUP BY 1),
    mb AS (SELECT lang, SUM(o) AS mb FROM cont GROUP BY 1),
    tot AS (SELECT SUM(o) AS n FROM cont)
    SELECT ROUND(SUM((o / n) * LN(o * n / (ma * mb))), 6) + 0 AS mi,
           MAX(n) AS n
    FROM cont
    JOIN ma USING (source)
    JOIN mb USING (lang)
    CROSS JOIN tot
    """,
)
def mutual_info_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between a document's source and language — the
    scale-free dependence ranking the mixture-design pass reads next to
    chi2 (drift.mutual_information: one contingency scan, sums over
    category-bounded cells only)."""
    from dataquality_ml_spark.operators import drift as dr

    docs = _t(spark, sf_dir, "documents")
    out = dr.mutual_information(docs, "source", "lang")
    return out.select((F.round("mi", 6) + F.lit(0.0)).alias("mi"), "n")


@register(
    "ad_drift_events",
    oracle=f"""
    WITH tagged AS (
      SELECT value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (SELECT v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b FROM tagged GROUP BY v),
    cum AS (
      SELECT n_a, n_b,
             SUM(n_a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(n_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(n_a) OVER () AS tot_a,
             SUM(n_b) OVER () AS tot_b
      FROM per_v
    ),
    t AS (
      SELECT CAST(n_a + n_b AS DOUBLE) AS l,
             CAST(tot_a + tot_b AS DOUBLE) AS n,
             CAST(ca + cb AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2 AS bb,
             CAST(ca AS DOUBLE) - n_a / 2 AS m_a,
             CAST(cb AS DOUBLE) - n_b / 2 AS m_b,
             tot_a, tot_b
      FROM cum
    ),
    s AS (
      SELECT SUM(CASE WHEN bb * (n - bb) - n * l / 4 > 0 THEN
                   (l / n) * ((n * m_a - tot_a * bb) * (n * m_a - tot_a * bb))
                     / (bb * (n - bb) - n * l / 4) / tot_a
                 ELSE 0 END)
           + SUM(CASE WHEN bb * (n - bb) - n * l / 4 > 0 THEN
                   (l / n) * ((n * m_b - tot_b * bb) * (n * m_b - tot_b * bb))
                     / (bb * (n - bb) - n * l / 4) / tot_b
                 ELSE 0 END) AS inner_s,
             MAX(tot_a) AS n_a, MAX(tot_b) AS n_b
      FROM t
    )
    SELECT ROUND((CAST(n_a + n_b AS DOUBLE) - 1) / (n_a + n_b) * inner_s, 6) + 0 AS ad_a2,
           n_a, n_b
    FROM s
    """,
)
def ad_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson–Darling drift between the events-month halves
    (drift.anderson_darling, Scholz–Stephens midrank A² with k=2) — the
    tail-weighted alarm KS/CvM miss; same _ecdf_counts machinery, no
    unpartitioned window in the exact path."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.anderson_darling(None, None, "value", ecdf=_events_ecdf(spark, sf_dir))
    return out.select(
        (F.round("ad_a2", 6) + F.lit(0.0)).alias("ad_a2"), "n_a", "n_b"
    )


@register(
    "ks_drift_by_type",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT event_type, value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (
      SELECT event_type, v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b
      FROM tagged GROUP BY event_type, v
    ),
    cdf AS (
      SELECT event_type,
             SUM(n_a) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / CAST(SUM(n_a) OVER (PARTITION BY event_type) AS DOUBLE) AS cdf_a,
             SUM(n_b) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / CAST(SUM(n_b) OVER (PARTITION BY event_type) AS DOUBLE) AS cdf_b,
             SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
             SUM(n_b) OVER (PARTITION BY event_type) AS tot_b
      FROM per_v
    )
    SELECT event_type,
           ROUND(MAX(ABS(cdf_a - cdf_b)), 6) + 0 AS ks_d,
           CAST(MAX(tot_a) AS BIGINT) AS n_a,
           CAST(MAX(tot_b) AS BIGINT) AS n_b
    FROM cdf
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KS drift between the events-month halves in ONE pass
    (drift.ks_by_group): keyed prefix sums, per-key totals join — the
    per-segment drift report without a per-segment job loop."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.ks_by_group(
        None, None, "value", keys=["event_type"],
        ecdf=_events_ecdf_by_type(spark, sf_dir),
    )
    return out.select(
        "event_type",
        (F.round("ks_d", 6) + F.lit(0.0)).alias("ks_d"),
        "n_a",
        "n_b",
    ).orderBy("event_type")


@register(
    "psi_timeline_events",
    oracle="""
    WITH counts AS (
      SELECT CAST(EXTRACT(day FROM ts) AS INTEGER) AS period,
             LEAST(9, GREATEST(0, CAST(FLOOR((value - 0.0) / 50.0) AS INTEGER))) AS bin,
             COUNT(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT p.period, b.bin
      FROM (SELECT DISTINCT period FROM counts) p
      CROSS JOIN (SELECT UNNEST(RANGE(10)) AS bin) b
    ),
    props AS (
      SELECT s.period, s.bin, COALESCE(c.n, 0) AS n,
             SUM(COALESCE(c.n, 0)) OVER (PARTITION BY s.period) AS n_tot
      FROM spine s LEFT JOIN counts c ON c.period = s.period AND c.bin = s.bin
    ),
    p2 AS (
      SELECT period, bin, n / CAST(n_tot AS DOUBLE) AS p, n_tot FROM props
    ),
    ref AS (
      SELECT bin, p AS p_ref FROM p2
      WHERE period = (SELECT MIN(period) FROM p2)
    )
    SELECT p2.period AS period,
           ROUND(SUM((GREATEST(p, 1e-06) - GREATEST(p_ref, 1e-06))
                     * LN(GREATEST(p, 1e-06) / GREATEST(p_ref, 1e-06))), 6) + 0 AS psi,
           CAST(MAX(n_tot) AS BIGINT) AS n
    FROM p2 JOIN ref USING (bin)
    GROUP BY 1
    ORDER BY 1
    """,
)
def psi_timeline_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift timeline: every day of the events month against day 1
    (drift.psi_timeline) — WHEN the drift started, one bounded scan
    (groupBy(day, bin) → ≤31·10 rows; all downstream math on that)."""
    from dataquality_ml_spark.operators import drift as dr

    ev = _t(spark, sf_dir, "events")
    out = dr.psi_timeline(
        ev, "value", F.dayofmonth("ts").cast("int"), lo=0.0, hi=500.0, bins=10
    )
    return out.select(
        "period",
        (F.round("psi", 6) + F.lit(0.0)).alias("psi"),
        F.col("n").cast("bigint").alias("n"),
    ).orderBy("period")


_CORR_SPLIT = "1998-01-01"  # lineitem shipdates span 1995-2001


@register(
    "corr_drift_lineitem",
    oracle=f"""
    WITH s AS (
      SELECT CORR(CASE WHEN l_shipdate < TIMESTAMP '{_CORR_SPLIT}' THEN l_quantity END,
                  CASE WHEN l_shipdate < TIMESTAMP '{_CORR_SPLIT}' THEN l_extendedprice END) AS r_a,
             CORR(CASE WHEN l_shipdate >= TIMESTAMP '{_CORR_SPLIT}' THEN l_quantity END,
                  CASE WHEN l_shipdate >= TIMESTAMP '{_CORR_SPLIT}' THEN l_extendedprice END) AS r_b,
             COUNT(CASE WHEN l_shipdate < TIMESTAMP '{_CORR_SPLIT}' THEN 1 END) AS n_a,
             COUNT(CASE WHEN l_shipdate >= TIMESTAMP '{_CORR_SPLIT}' THEN 1 END) AS n_b
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    )
    SELECT ROUND(r_a, 6) + 0 AS r_a,
           ROUND(r_b, 6) + 0 AS r_b,
           ROUND((0.5 * LN((1 + r_a) / (1 - r_a)) - 0.5 * LN((1 + r_b) / (1 - r_b)))
                 / SQRT(1.0 / (n_a - 3) + 1.0 / (n_b - 3)), 6) + 0 AS fisher_z,
           n_a, n_b
    FROM s
    """,
)
def corr_drift_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationship drift: Pearson r of (quantity, price) before vs after
    the 1995 shipdate split + Fisher z (drift.corr_drift) — marginals
    can hold steady while the RELATIONSHIP a model learned inverts; one
    conditional-moment aggregation over the tagged union."""
    from dataquality_ml_spark.operators import drift as dr

    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_shipdate") < F.lit(_CORR_SPLIT).cast("timestamp"))
    b = li.where(F.col("l_shipdate") >= F.lit(_CORR_SPLIT).cast("timestamp"))
    out = dr.corr_drift(a, b, "l_quantity", "l_extendedprice")
    return out.select(
        (F.round("r_a", 6) + F.lit(0.0)).alias("r_a"),
        (F.round("r_b", 6) + F.lit(0.0)).alias("r_b"),
        (F.round("fisher_z", 6) + F.lit(0.0)).alias("fisher_z"),
        "n_a",
        "n_b",
    )


# ---------------------------------------------------------------------------
# Round-9 keyed drift panel (VERDICT r8 item 4): Mann-Whitney / CvM / Q-Q
# per SEGMENT in one pass each — the keys= generalization of the round-8
# family over the shared keyed _ecdf_counts (prefix sums restart per key,
# totals join per key null-safely). The anti-pattern this kills is the
# reference's per-column job loop (reference lib/utils.py:187-195): a
# 100-segment drift panel is ONE scan, not 100.
# ---------------------------------------------------------------------------


def _events_ecdf_by_type(spark: SparkSession, sf_dir: str):
    """Memoized KEYED ECDF relation (keys=[event_type]) shared by the
    per-segment drift queries — same memo contract as _events_ecdf."""
    from dataquality_ml_spark.operators.drift import _ecdf_from_tagged
    from dataquality_ml_spark.queries import _parquet_fingerprint

    key = ("ecdf_ev_k", sf_dir, _parquet_fingerprint(f"{sf_dir}/events.parquet"))
    hit = _TOK_MEMO.get(key)
    if hit is None:
        # single tagged scan — see _events_ecdf
        ev = _t(spark, sf_dir, "events")
        tag = F.col("ts") < F.to_timestamp(F.lit(_DRIFT_SPLIT_TS))
        tagged = (
            ev.where(F.col("value").isNotNull())
            .select(
                "event_type",
                F.col("value").alias("v"),
                F.when(tag, 1).when(~tag, 0).alias("in_a"),
            )
            .where(F.col("in_a").isNotNull())
        )
        hit = _ecdf_from_tagged(
            tagged, ["event_type"], bounded=False
        ).localCheckpoint(eager=False)
        _TOK_MEMO[key] = hit
    return hit


@register(
    "mann_whitney_by_type",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT event_type, value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (
      SELECT event_type, v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b
      FROM tagged GROUP BY event_type, v
    ),
    mr AS (
      SELECT event_type, n_a, n_a + n_b AS cnt,
             SUM(n_a + n_b) OVER (PARTITION BY event_type ORDER BY v)
               - (n_a + n_b) + (n_a + n_b + 1) / 2.0 AS midrank
      FROM per_v
    ),
    s AS (
      SELECT event_type,
             SUM(n_a * midrank) AS ra,
             CAST(SUM(cnt * cnt * cnt - cnt) AS DOUBLE) AS ties,
             CAST(SUM(n_a) AS DOUBLE) AS na,
             CAST(SUM(cnt - n_a) AS DOUBLE) AS nb
      FROM mr GROUP BY event_type
    )
    SELECT event_type,
           ra - na * (na + 1) / 2 AS u_stat,
           ROUND((ra - na * (na + 1) / 2 - na * nb / 2)
                 / SQRT(na * nb / 12
                        * ((na + nb + 1) - ties / ((na + nb) * (na + nb - 1)))),
                 6) + 0 AS z_score,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b
    FROM s
    ORDER BY event_type
    """,
)
def mann_whitney_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Mann-Whitney U drift between the events-month halves
    in ONE pass (drift.rank_sum_test keys=['event_type']): keyed pooled
    midranks off the shared keyed ECDF — u_stat stays IEEE-exact and
    unrounded per segment."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.rank_sum_test(
        None, None, "value", ecdf=_events_ecdf_by_type(spark, sf_dir),
        keys=["event_type"],
    )
    return out.select(
        "event_type",
        "u_stat",
        (F.round("z_score", 6) + F.lit(0.0)).alias("z_score"),
        "n_a",
        "n_b",
    ).orderBy("event_type")


@register(
    "cvm_drift_by_type",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT event_type, value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (
      SELECT event_type, v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b
      FROM tagged GROUP BY event_type, v
    ),
    cum AS (
      SELECT event_type, n_a, n_b,
             SUM(n_a) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(n_b) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
             SUM(n_b) OVER (PARTITION BY event_type) AS tot_b
      FROM per_v
    ),
    s AS (
      SELECT event_type,
             SUM(CAST(n_a + n_b AS HUGEINT)
                 * (CAST(ca AS HUGEINT) * tot_b - CAST(cb AS HUGEINT) * tot_a)
                 * (CAST(ca AS HUGEINT) * tot_b - CAST(cb AS HUGEINT) * tot_a)) AS s,
             MAX(CAST(tot_a + tot_b AS HUGEINT) * (tot_a + tot_b) * tot_a * tot_b) AS denom,
             MAX(tot_a) AS n_a, MAX(tot_b) AS n_b
      FROM cum GROUP BY event_type
    )
    SELECT event_type,
           ROUND(CAST(s AS DOUBLE) / CAST(denom AS DOUBLE), 6) + 0 AS cvm_t,
           n_a, n_b
    FROM s
    ORDER BY event_type
    """,
)
def cvm_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Cramér–von Mises drift in ONE pass
    (drift.cvm_statistic keys=['event_type']): the exact-integer decimal
    numerator reduces per segment, so both engines round the SAME double
    per event type."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.cvm_statistic(
        None, None, "value", ecdf=_events_ecdf_by_type(spark, sf_dir),
        keys=["event_type"],
    )
    return out.select(
        "event_type",
        (F.round("cvm_t", 6) + F.lit(0.0)).alias("cvm_t"),
        "n_a",
        "n_b",
    ).orderBy("event_type")


@register(
    "qq_drift_by_type",
    oracle=f"""
    WITH a AS (
      SELECT event_type, value AS v FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    b AS (
      SELECT event_type, value AS v FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    qa AS (
      SELECT event_type,
             UNNEST([0.25, 0.5, 0.75]) AS q,
             UNNEST(QUANTILE_CONT(v, [0.25, 0.5, 0.75])) AS va
      FROM a GROUP BY event_type
    ),
    qb AS (
      SELECT event_type,
             UNNEST([0.25, 0.5, 0.75]) AS q,
             UNNEST(QUANTILE_CONT(v, [0.25, 0.5, 0.75])) AS vb
      FROM b GROUP BY event_type
    )
    SELECT qa.event_type AS event_type,
           CAST(qa.q AS DOUBLE) AS q,
           ROUND(va, 6) AS val_a,
           ROUND(vb, 6) AS val_b,
           ROUND(vb - va, 6) AS gap
    FROM qa JOIN qb ON qa.q = qb.q AND qa.event_type = qb.event_type
    ORDER BY event_type, q
    """,
)
def qq_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type quartile Q-Q drift table in ONE pass
    (drift.qq_table keys=['event_type']): WHERE each segment's
    distribution moved — order statistics picked per segment off the
    shared keyed ECDF, bit-equal to QUANTILE_CONT."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.qq_table(
        None, None, "value", qs=(0.25, 0.5, 0.75),
        ecdf=_events_ecdf_by_type(spark, sf_dir), keys=["event_type"],
    )
    return out.select(
        "event_type",
        "q",
        F.round("val_a", 6).alias("val_a"),
        F.round("val_b", 6).alias("val_b"),
        F.round("gap", 6).alias("gap"),
    ).orderBy("event_type", "q")


# ---------------------------------------------------------------------------
# Round-9 vector-drift timeline (VERDICT r8 item 6): WHEN the embedding
# distribution moved — the per-period face of ann_index_drift, pairing the
# frozen ANN distance profile with the psi_timeline shape.
# ---------------------------------------------------------------------------


def _emb_timeline_oracle(k: int = 4, bins: int = _AID_BINS) -> str:
    """Unrolled: hash-init 1-iteration kmeans on the FIRST append batch
    (vec_id < ceil((max+1)/4)); squared assignment distances for the whole
    corpus tagged by batch; equi-width bins over the batch-0 profile's
    frozen (0, max ref dist²]; per-batch PSI vs that frozen profile."""
    sq = (
        "list_sum([ (v.emb[i]-c.emb[i])*(v.emb[i]-c.emb[i]) "
        "for i in generate_series(1, len(v.emb))])"
    )
    return f"""
    WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    ck AS (SELECT CAST(CEIL((MAX(vec_id) + 1) / 4.0) AS BIGINT) AS c FROM vecs),
    ref AS (SELECT * FROM vecs WHERE vec_id < (SELECT c FROM ck)),
    init AS (
      SELECT emb, ROW_NUMBER() OVER (
        ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) - 1 AS cid
      FROM ref QUALIFY cid < {k}
    ),
    a1 AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {sq}, c.cid) AS rn
        FROM ref v CROSS JOIN init c
      ) WHERE rn = 1
    ),
    c1 AS (
      SELECT cid, list(m ORDER BY pos) AS emb FROM (
        SELECT cluster AS cid, pos, ROUND(AVG(val), 6) AS m FROM (
          SELECT a.cluster, unnest(v.emb) AS val,
                 generate_subscripts(v.emb, 1) AS pos
          FROM a1 a JOIN ref v USING (vec_id)
        ) GROUP BY cluster, pos
      ) GROUP BY cid
    ),
    dall AS (
      SELECT v.vec_id,
             LEAST(3, CAST(v.vec_id // (SELECT c FROM ck) AS INT)) AS period,
             MIN({sq}) AS d2
      FROM vecs v CROSS JOIN c1 c GROUP BY 1, 2
    ),
    hi AS (SELECT ROUND(MAX(d2), 6) AS h FROM dall WHERE period = 0),
    binned AS (
      SELECT period,
             LEAST({bins - 1}, GREATEST(0,
               CAST(FLOOR(d2 / ((SELECT h FROM hi) / {bins})) AS INT))) AS bin,
             COUNT(*) AS n
      FROM dall GROUP BY 1, 2
    ),
    spine AS (
      SELECT p.period, b.bin
      FROM (SELECT DISTINCT period FROM binned) p
      CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {bins - 1})) AS bin) b
    ),
    props AS (
      SELECT s.period, s.bin, COALESCE(c.n, 0) AS n,
             SUM(COALESCE(c.n, 0)) OVER (PARTITION BY s.period) AS n_tot
      FROM spine s LEFT JOIN binned c ON c.period = s.period AND c.bin = s.bin
    ),
    pref AS (
      SELECT bin, n / CAST(n_tot AS DOUBLE) AS p_ref
      FROM props WHERE period = 0
    ),
    j AS (
      SELECT pr.period, pr.n / CAST(pr.n_tot AS DOUBLE) AS p_cur,
             r.p_ref, pr.n_tot
      FROM props pr JOIN pref r ON pr.bin = r.bin
    )
    SELECT period,
           ROUND(SUM((GREATEST(p_cur, 1e-06) - GREATEST(p_ref, 1e-06))
                     * LN(GREATEST(p_cur, 1e-06) / GREATEST(p_ref, 1e-06))),
                 6) + 0 AS psi,
           CAST(MAX(n_tot) AS BIGINT) AS n
    FROM j GROUP BY period ORDER BY period
    """


@register("embedding_drift_timeline", oracle=_emb_timeline_oracle())
def embedding_drift_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-drift timeline: the embedding corpus split into four
    append batches by vec_id range; batch 0 trains the frozen coarse
    quantizer + distance profile (the ANNIndex artifact), and every
    batch's assignment-distance distribution scores PSI against that
    FROZEN profile in one groupBy(batch, bin) scan
    (similarity.ANNIndex.drift_timeline) — WHEN the embedding
    distribution moved, per append batch, without the baseline shifting
    as the corpus grows."""
    import math as _math

    from dataquality_ml_spark.operators import similarity as sim2

    emb = _t(spark, sf_dir, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    chunk = int(_math.ceil((max_id + 1) / 4.0))
    ref = emb.where(F.col("vec_id") < chunk)
    cents = sim2.kmeans_fit(ref, k=4, iters=1, round_dp=6)
    idx = sim2.ANNIndex(cents, codebooks=[])
    idx.fit_distance_profile(ref, bins=_AID_BINS)
    period = F.least(
        F.lit(3), F.floor(F.col("vec_id") / F.lit(chunk)).cast("int")
    ).cast("int")
    out = idx.drift_timeline(emb, period)
    return out.select(
        F.col("period").cast("int").alias("period"),
        (F.round("psi", 6) + F.lit(0.0)).alias("psi"),
        F.col("n").cast("bigint").alias("n"),
    ).orderBy("period")


@register(
    "ad_drift_by_type",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT event_type, value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (
      SELECT event_type, v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b
      FROM tagged GROUP BY event_type, v
    ),
    cum AS (
      SELECT event_type, n_a, n_b,
             SUM(n_a) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(n_b) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
             SUM(n_b) OVER (PARTITION BY event_type) AS tot_b
      FROM per_v
    ),
    t AS (
      SELECT event_type,
             CAST(n_a + n_b AS DOUBLE) AS l,
             CAST(tot_a + tot_b AS DOUBLE) AS n,
             CAST(ca + cb AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2 AS bb,
             CAST(ca AS DOUBLE) - n_a / 2 AS m_a,
             CAST(cb AS DOUBLE) - n_b / 2 AS m_b,
             tot_a, tot_b
      FROM cum
    ),
    s AS (
      SELECT event_type,
             SUM(CASE WHEN bb * (n - bb) - n * l / 4 > 0 AND tot_a > 0 THEN
                   (l / n) * ((n * m_a - tot_a * bb) * (n * m_a - tot_a * bb))
                     / (bb * (n - bb) - n * l / 4) / tot_a
                 ELSE 0 END)
           + SUM(CASE WHEN bb * (n - bb) - n * l / 4 > 0 AND tot_b > 0 THEN
                   (l / n) * ((n * m_b - tot_b * bb) * (n * m_b - tot_b * bb))
                     / (bb * (n - bb) - n * l / 4) / tot_b
                 ELSE 0 END) AS inner_s,
             MAX(tot_a) AS n_a, MAX(tot_b) AS n_b
      FROM t GROUP BY event_type
    )
    SELECT event_type,
           ROUND((CAST(n_a + n_b AS DOUBLE) - 1) / (n_a + n_b) * inner_s, 6) + 0 AS ad_a2,
           n_a, n_b
    FROM s ORDER BY event_type
    """,
)
def ad_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Anderson–Darling drift in ONE pass
    (drift.anderson_darling keys=['event_type']) — the tail-weighted
    member completing the keyed panel (KS/MW/CvM/QQ/AD all per segment,
    each one pass over the shared keyed ECDF)."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.anderson_darling(
        None, None, "value", ecdf=_events_ecdf_by_type(spark, sf_dir),
        keys=["event_type"],
    )
    return out.select(
        "event_type",
        (F.round("ad_a2", 6) + F.lit(0.0)).alias("ad_a2"),
        "n_a",
        "n_b",
    ).orderBy("event_type")


@register(
    "median_by_type_day",
    oracle="""
    SELECT event_type,
           CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
           ROUND(QUANTILE_CONT(value, 0.5), 6) + 0 AS med,
           ROUND(QUANTILE_CONT(value, 0.9), 6) + 0 AS p90,
           COUNT(value) AS n
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def median_by_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-(event_type, day) median + P90 panel — ~150 segments,
    the oracle-gated face of the MANY-groups selection path (round 9:
    profile._select_grouped_many, broadcast-JOIN chain membership): the
    shuffles carry only chains·bins count rows at any segment count,
    where the former >64-group fallback shuffled the full distinct-value
    relation. Values bit-equal to QUANTILE_CONT."""
    from dataquality_ml_spark.operators.profile import exact_quantiles_select

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.dayofmonth("ts").cast("int").alias("day"),
        "value",
    )
    # one stats scan serves BOTH the selection (per-group n/min/max seed)
    # and the report's n column — the stats= pass-through contract
    stats = {
        (r["event_type"], r["day"]): (r["n"], r["lo"], r["hi"])
        for r in ev.where(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("event_type", "day")
        .agg(F.count("value").alias("n"), F.min("value").alias("lo"),
             F.max("value").alias("hi"))
        .collect()
    }
    got = exact_quantiles_select(
        ev, "value", [0.5, 0.9], group_by=["event_type", "day"],
        stats=stats, checkpoint=False,
    )
    out = spark.createDataFrame(
        [
            (g[0], int(g[1]), float(v[0]), float(v[1]), int(stats[g][0]))
            for g, v in got.items()
        ],
        "event_type string, day int, med double, p90 double, n bigint",
    )
    return out.select(
        "event_type",
        "day",
        (F.round("med", 6) + F.lit(0.0)).alias("med"),
        (F.round("p90", 6) + F.lit(0.0)).alias("p90"),
        "n",
    ).orderBy("event_type", "day")


@register(
    "drift_panel_by_type",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT event_type, value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (
      SELECT event_type, v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b
      FROM tagged GROUP BY event_type, v
    ),
    cum AS (
      SELECT event_type, n_a, n_b,
             SUM(n_a) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(n_b) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
             SUM(n_b) OVER (PARTITION BY event_type) AS tot_b
      FROM per_v
    ),
    s AS (
      SELECT event_type,
             MAX(ABS(ca / CAST(tot_a AS DOUBLE) - cb / CAST(tot_b AS DOUBLE))) AS ks_d,
             SUM(n_a * (ca + cb - (n_a + n_b) + (n_a + n_b + 1) / 2.0)) AS ra,
             CAST(SUM((n_a + n_b) * (n_a + n_b) * (n_a + n_b) - (n_a + n_b)) AS DOUBLE) AS ties,
             SUM(CAST(n_a + n_b AS HUGEINT)
                 * (CAST(ca AS HUGEINT) * tot_b - CAST(cb AS HUGEINT) * tot_a)
                 * (CAST(ca AS HUGEINT) * tot_b - CAST(cb AS HUGEINT) * tot_a)) AS cvm_s,
             MAX(CAST(tot_a + tot_b AS HUGEINT) * (tot_a + tot_b) * tot_a * tot_b) AS cvm_den,
             SUM(CASE WHEN (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)
                            * (tot_a + tot_b - (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                            - (tot_a + tot_b) * (n_a + n_b) / 4.0 > 0 THEN
                   (CAST(n_a + n_b AS DOUBLE) / (tot_a + tot_b))
                   * (((tot_a + tot_b) * (CAST(ca AS DOUBLE) - n_a / 2.0) - tot_a * (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                      * ((tot_a + tot_b) * (CAST(ca AS DOUBLE) - n_a / 2.0) - tot_a * (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)))
                   / ((CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)
                      * (tot_a + tot_b - (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                      - (tot_a + tot_b) * (n_a + n_b) / 4.0)
                   / tot_a
                 ELSE 0 END)
           + SUM(CASE WHEN (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)
                            * (tot_a + tot_b - (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                            - (tot_a + tot_b) * (n_a + n_b) / 4.0 > 0 THEN
                   (CAST(n_a + n_b AS DOUBLE) / (tot_a + tot_b))
                   * (((tot_a + tot_b) * (CAST(cb AS DOUBLE) - n_b / 2.0) - tot_b * (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                      * ((tot_a + tot_b) * (CAST(cb AS DOUBLE) - n_b / 2.0) - tot_b * (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)))
                   / ((CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)
                      * (tot_a + tot_b - (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                      - (tot_a + tot_b) * (n_a + n_b) / 4.0)
                   / tot_b
                 ELSE 0 END) AS ad_inner,
             CAST(MAX(tot_a) AS DOUBLE) AS na,
             CAST(MAX(tot_b) AS DOUBLE) AS nb
      FROM cum GROUP BY event_type
    )
    SELECT event_type,
           ROUND(ks_d, 6) + 0 AS ks_d,
           ra - na * (na + 1) / 2 AS u_stat,
           ROUND((ra - na * (na + 1) / 2 - na * nb / 2)
                 / SQRT(na * nb / 12
                        * ((na + nb + 1) - ties / ((na + nb) * (na + nb - 1)))),
                 6) + 0 AS z_score,
           ROUND(CAST(cvm_s AS DOUBLE) / CAST(cvm_den AS DOUBLE), 6) + 0 AS cvm_t,
           ROUND((na + nb - 1) / (na + nb) * ad_inner, 6) + 0 AS ad_a2,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b
    FROM s ORDER BY event_type
    """,
)
def drift_panel_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL per-segment drift panel — KS, Mann-Whitney U/z, CvM,
    Anderson-Darling — in ONE aggregation over the one shared keyed ECDF
    (drift.drift_panel): what a per-segment-per-day drift monitor
    actually runs, one scan and one shuffle for four statistics instead
    of four passes (and instead of the reference's per-column job loop,
    lib/utils.py:187-195)."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.drift_panel(
        None, None, "value", keys=["event_type"],
        ecdf=_events_ecdf_by_type(spark, sf_dir),
    )
    return out.select(
        "event_type",
        (F.round("ks_d", 6) + F.lit(0.0)).alias("ks_d"),
        "u_stat",
        (F.round("z_score", 6) + F.lit(0.0)).alias("z_score"),
        (F.round("cvm_t", 6) + F.lit(0.0)).alias("cvm_t"),
        (F.round("ad_a2", 6) + F.lit(0.0)).alias("ad_a2"),
        "n_a",
        "n_b",
    ).orderBy("event_type")


@register(
    "corr_drift_by_flag",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             CORR(CASE WHEN l_shipdate < TIMESTAMP '{_CORR_SPLIT}' THEN l_quantity END,
                  CASE WHEN l_shipdate < TIMESTAMP '{_CORR_SPLIT}' THEN l_extendedprice END) AS r_a,
             CORR(CASE WHEN l_shipdate >= TIMESTAMP '{_CORR_SPLIT}' THEN l_quantity END,
                  CASE WHEN l_shipdate >= TIMESTAMP '{_CORR_SPLIT}' THEN l_extendedprice END) AS r_b,
             COUNT(CASE WHEN l_shipdate < TIMESTAMP '{_CORR_SPLIT}' THEN 1 END) AS n_a,
             COUNT(CASE WHEN l_shipdate >= TIMESTAMP '{_CORR_SPLIT}' THEN 1 END) AS n_b
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           ROUND(r_a, 6) + 0 AS r_a,
           ROUND(r_b, 6) + 0 AS r_b,
           ROUND((0.5 * LN((1 + r_a) / (1 - r_a)) - 0.5 * LN((1 + r_b) / (1 - r_b)))
                 / SQRT(1.0 / (n_a - 3) + 1.0 / (n_b - 3)), 6) + 0 AS fisher_z,
           n_a, n_b
    FROM s ORDER BY l_returnflag
    """,
)
def corr_drift_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag relationship drift (drift.corr_drift
    keys=['l_returnflag']): Fisher z of r(quantity, price) before vs
    after the shipdate split, per segment, in ONE conditional-moment
    aggregation over the tagged union — which SEGMENT's learned
    relationship moved, not just whether one did."""
    from dataquality_ml_spark.operators import drift as dr

    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_shipdate") < F.lit(_CORR_SPLIT).cast("timestamp"))
    b = li.where(F.col("l_shipdate") >= F.lit(_CORR_SPLIT).cast("timestamp"))
    out = dr.corr_drift(a, b, "l_quantity", "l_extendedprice", keys=["l_returnflag"])
    return out.select(
        "l_returnflag",
        (F.round("r_a", 6) + F.lit(0.0)).alias("r_a"),
        (F.round("r_b", 6) + F.lit(0.0)).alias("r_b"),
        (F.round("fisher_z", 6) + F.lit(0.0)).alias("fisher_z"),
        "n_a",
        "n_b",
    ).orderBy("l_returnflag")


@register(
    "weighted_len_quantiles_docs",
    oracle=f"""
    WITH {_TOKS_CTE},
    wv AS (
      SELECT CAST(d.n_chars AS DOUBLE) AS v, len(t.t) AS w
      FROM documents d JOIN toks t USING (doc_id)
      WHERE d.n_chars IS NOT NULL AND len(t.t) > 0
    ),
    agg AS (SELECT v, SUM(w) AS w FROM wv GROUP BY v),
    cum AS (
      SELECT v, SUM(w) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      FROM agg
    ),
    tot AS (SELECT SUM(w) AS tw FROM wv),
    probes AS (SELECT UNNEST([0.1, 0.25, 0.5, 0.9, 0.99]) AS q)
    SELECT CAST(p.q AS DOUBLE) AS q, MIN(c.v) AS val
    FROM probes p
    JOIN cum c ON c.cw >= GREATEST(p.q * (SELECT tw FROM tot), 1.0)
    GROUP BY p.q ORDER BY q
    """,
)
def weighted_len_quantiles_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-weighted document-length quantiles: the char-length cut
    under which q of the corpus TOKENS (not documents) sit — the number
    a token-budgeted packing/selection pass thresholds on, and one
    ``percentile`` cannot express (row-weighted only). Lower weighted
    quantile by histogram-refine selection
    (profile.weighted_quantiles_select — weighted bucket SUMS move
    through the shuffle, never rows; bit-equal to the cumulative-weight
    replay because both engines compare exact integer cumulative weights
    to the same IEEE double q·W)."""
    from dataquality_ml_spark.operators import text as tx
    from dataquality_ml_spark.operators.profile import weighted_quantiles_select

    docs = _t(spark, sf_dir, "documents")
    toks = tx.token_stats(docs)
    wv = docs.join(toks, "doc_id").select(
        F.col("n_chars").cast("double").alias("v"),
        F.col("n_tokens").alias("w"),
    )
    qs = [0.1, 0.25, 0.5, 0.9, 0.99]
    vals = weighted_quantiles_select(wv, "v", "w", qs)
    return spark.createDataFrame(
        [(float(q), float(v)) for q, v in zip(qs, vals)],
        "q double, val double",
    ).orderBy("q")


@register(
    "calibration_curve_events",
    oracle="""
    WITH scored AS (
      SELECT LEAST(9, GREATEST(0, CAST(FLOOR((value / 500.0) / 0.1) AS INT))) AS bin,
             value / 500.0 AS s,
             CASE WHEN (event_id * 2654435761) % 100 < value / 5.0 THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT bin, COUNT(*) AS n, AVG(s) AS mean_score, AVG(CAST(y AS DOUBLE)) AS frac_pos
      FROM scored GROUP BY bin
    )
    SELECT bin, n,
           ROUND(mean_score, 6) + 0 AS mean_score,
           ROUND(frac_pos, 6) + 0 AS frac_pos,
           ROUND(ABS(mean_score - frac_pos), 6) + 0 AS gap,
           ROUND(SUM(n * ABS(mean_score - frac_pos)) OVER () / SUM(n) OVER (), 6) + 0 AS ece
    FROM cells ORDER BY bin
    """,
)
def calibration_curve_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE over a deterministic score/label pair on
    events (evaluate.calibration_curve) — whether the scores MEAN their
    probabilities, the evaluation the reference's confusion/ROC pair
    never runs; one scan to ≤10 cells, the scalar rides every row."""
    from dataquality_ml_spark.operators.evaluate import calibration_curve

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("value") / 500.0).alias("s"),
        (
            F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(100))
            < F.col("value") / 5.0
        ).cast("int").alias("y"),
    )
    out = calibration_curve(scored, "s", "y", bins=10, lo=0.0, hi=1.0)
    return out.select(
        "bin",
        "n",
        (F.round("mean_score", 6) + F.lit(0.0)).alias("mean_score"),
        (F.round("frac_pos", 6) + F.lit(0.0)).alias("frac_pos"),
        (F.round("gap", 6) + F.lit(0.0)).alias("gap"),
        (F.round("ece", 6) + F.lit(0.0)).alias("ece"),
    ).orderBy("bin")


_DOC_HALF = "doc_id % 2 = 0"


@register(
    "psi_categorical_sources",
    oracle=f"""
    WITH r AS (
      SELECT source AS category, COUNT(*) AS n FROM documents
      WHERE {_DOC_HALF} GROUP BY source
    ),
    c AS (
      SELECT source AS category, COUNT(*) AS n FROM documents
      WHERE NOT ({_DOC_HALF}) GROUP BY source
    ),
    j AS (
      SELECT COALESCE(r.category, c.category) AS category,
             COALESCE(r.n / CAST((SELECT SUM(n) FROM r) AS DOUBLE), 0.0) AS p_ref,
             COALESCE(c.n / CAST((SELECT SUM(n) FROM c) AS DOUBLE), 0.0) AS p_cur
      FROM r FULL OUTER JOIN c ON r.category IS NOT DISTINCT FROM c.category
    )
    SELECT category,
           ROUND(p_ref, 6) + 0 AS p_ref,
           ROUND(p_cur, 6) + 0 AS p_cur,
           ROUND((GREATEST(p_cur, 1e-06) - GREATEST(p_ref, 1e-06))
                 * LN(GREATEST(p_cur, 1e-06) / GREATEST(p_ref, 1e-06)), 6) + 0 AS psi_term,
           ROUND(SUM((GREATEST(p_cur, 1e-06) - GREATEST(p_ref, 1e-06))
                 * LN(GREATEST(p_cur, 1e-06) / GREATEST(p_ref, 1e-06))) OVER (), 6) + 0 AS psi_total
    FROM j ORDER BY category
    """,
)
def psi_categorical_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix PSI between the even/odd doc_id halves
    (drift.psi_categorical) — the categorical face of psi_bins: which
    CATEGORY's share moved; one scan per side to ≤|sources| rows."""
    from dataquality_ml_spark.operators import drift as dr

    docs = _t(spark, sf_dir, "documents")
    r = docs.where(F.col("doc_id") % 2 == 0)
    c = docs.where(F.col("doc_id") % 2 != 0)
    out = dr.psi_categorical(r, c, "source")
    return out.select(
        "category",
        (F.round("p_ref", 6) + F.lit(0.0)).alias("p_ref"),
        (F.round("p_cur", 6) + F.lit(0.0)).alias("p_cur"),
        (F.round("psi_term", 6) + F.lit(0.0)).alias("psi_term"),
        (F.round("psi_total", 6) + F.lit(0.0)).alias("psi_total"),
    ).orderBy("category")


@register(
    "jsd_lang_halves",
    oracle=f"""
    WITH r AS (
      SELECT lang AS category, COUNT(*) AS n FROM documents
      WHERE {_DOC_HALF} GROUP BY lang
    ),
    c AS (
      SELECT lang AS category, COUNT(*) AS n FROM documents
      WHERE NOT ({_DOC_HALF}) GROUP BY lang
    ),
    j AS (
      SELECT COALESCE(r.n, 0) / CAST((SELECT SUM(n) FROM r) AS DOUBLE) AS p,
             COALESCE(c.n, 0) / CAST((SELECT SUM(n) FROM c) AS DOUBLE) AS q
      FROM r FULL OUTER JOIN c ON r.category IS NOT DISTINCT FROM c.category
    )
    SELECT ROUND((SUM(CASE WHEN p > 0 THEN p * LN(p / ((p + q) / 2)) ELSE 0 END)
                + SUM(CASE WHEN q > 0 THEN q * LN(q / ((p + q) / 2)) ELSE 0 END)) / 2,
                 6) + 0 AS jsd,
           (SELECT SUM(n) FROM r) AS n_ref,
           (SELECT SUM(n) FROM c) AS n_cur
    FROM j
    """,
)
def jsd_lang_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix Jensen-Shannon divergence between the doc_id halves
    (drift.js_divergence) — the bounded symmetric drift scalar
    (0 ≤ JSD ≤ ln 2) that stays finite on one-sided categories without
    PSI's EPS clamp."""
    from dataquality_ml_spark.operators import drift as dr

    docs = _t(spark, sf_dir, "documents")
    r = docs.where(F.col("doc_id") % 2 == 0)
    c = docs.where(F.col("doc_id") % 2 != 0)
    out = dr.js_divergence(r, c, "lang")
    return out.select(
        (F.round("jsd", 6) + F.lit(0.0)).alias("jsd"), "n_ref", "n_cur"
    )


@register(
    "brier_score_events",
    oracle="""
    WITH scored AS (
      SELECT value / 500.0 AS s,
             CASE WHEN (event_id * 2654435761) % 100 < value / 5.0 THEN 1 ELSE 0 END AS y,
             LEAST(9, GREATEST(0, CAST(FLOOR((value / 500.0) / 0.1) AS INT))) AS bin
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT bin, COUNT(*) AS n, AVG(s) AS sb, AVG(CAST(y AS DOUBLE)) AS yb,
             SUM((s - y) * (s - y)) AS se
      FROM scored GROUP BY bin
    ),
    g AS (
      SELECT SUM(n) AS n_tot, SUM(yb * n) / SUM(n) AS ybar FROM cells
    )
    SELECT ROUND(SUM(se) / MAX(g.n_tot), 6) + 0 AS brier,
           ROUND(SUM(n * (sb - yb) * (sb - yb)) / MAX(g.n_tot), 6) + 0 AS reliability,
           ROUND(SUM(n * (yb - g.ybar) * (yb - g.ybar)) / MAX(g.n_tot), 6) + 0 AS resolution,
           ROUND(MAX(g.ybar) * (1 - MAX(g.ybar)), 6) + 0 AS uncertainty,
           CAST(MAX(g.n_tot) AS BIGINT) AS n
    FROM cells CROSS JOIN g
    """,
)
def brier_score_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + Murphy decomposition over the same deterministic
    score/label pair as calibration_curve_events
    (evaluate.brier_score): the proper scoring rule behind the
    reliability diagram — REL (calibration gap) vs RES (discrimination)
    vs UNC, exact brier from one map-side-combined pass."""
    from dataquality_ml_spark.operators.evaluate import brier_score

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("value") / 500.0).alias("s"),
        (
            F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(100))
            < F.col("value") / 5.0
        ).cast("int").alias("y"),
    )
    out = brier_score(scored, "s", "y", bins=10)
    return out.select(
        (F.round("brier", 6) + F.lit(0.0)).alias("brier"),
        (F.round("reliability", 6) + F.lit(0.0)).alias("reliability"),
        (F.round("resolution", 6) + F.lit(0.0)).alias("resolution"),
        (F.round("uncertainty", 6) + F.lit(0.0)).alias("uncertainty"),
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "lift_table_events",
    oracle="""
    WITH scored AS (
      SELECT LEAST(19, GREATEST(0, CAST(FLOOR((value / 500.0) / 0.05) AS INT))) AS bin,
             CASE WHEN (event_id * 2654435761) % 100 < value / 5.0 THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT bin, COUNT(*) AS n, SUM(y) AS n_pos FROM scored GROUP BY bin
    ),
    cum AS (
      SELECT bin, n, n_pos,
             SUM(n) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             SUM(n_pos) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
             SUM(n) OVER () AS n_tot,
             SUM(n_pos) OVER () AS pos_tot
      FROM cells
    ),
    stepped AS (
      SELECT bin, n, n_pos,
             cum_n / CAST(n_tot AS DOUBLE) AS depth,
             cum_pos / CAST(pos_tot AS DOUBLE) AS gain,
             (cum_pos / CAST(pos_tot AS DOUBLE)) / (cum_n / CAST(n_tot AS DOUBLE)) AS lift,
             cum_pos / CAST(cum_n AS DOUBLE) AS precision,
             cum_pos / CAST(pos_tot AS DOUBLE)
               - COALESCE(LAG(cum_pos / CAST(pos_tot AS DOUBLE))
                          OVER (ORDER BY bin DESC), 0.0) AS d_recall
      FROM cum
    )
    SELECT bin, n, n_pos,
           ROUND(depth, 6) + 0 AS depth,
           ROUND(gain, 6) + 0 AS gain,
           ROUND(lift, 6) + 0 AS lift,
           ROUND(precision, 6) + 0 AS precision,
           ROUND(gain, 6) + 0 AS recall,
           ROUND(SUM(d_recall * precision) OVER (), 6) + 0 AS pr_auc
    FROM stepped ORDER BY bin DESC
    """,
)
def lift_table_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table + binned average precision over the
    deterministic score/label pair (evaluate.lift_table): the ranking
    eval for prioritization budgets — depth/gain/lift/precision/recall
    per descending score bin with PR-AUC riding every row, ≤20 cells
    from one scan (no global sort at any corpus size)."""
    from dataquality_ml_spark.operators.evaluate import lift_table

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("value") / 500.0).alias("s"),
        (
            F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(100))
            < F.col("value") / 5.0
        ).cast("int").alias("y"),
    )
    out = lift_table(scored, "s", "y", bins=20)
    return out.select(
        "bin",
        "n",
        "n_pos",
        (F.round("depth", 6) + F.lit(0.0)).alias("depth"),
        (F.round("gain", 6) + F.lit(0.0)).alias("gain"),
        (F.round("lift", 6) + F.lit(0.0)).alias("lift"),
        (F.round("precision", 6) + F.lit(0.0)).alias("precision"),
        (F.round("recall", 6) + F.lit(0.0)).alias("recall"),
        (F.round("pr_auc", 6) + F.lit(0.0)).alias("pr_auc"),
    ).orderBy(F.desc("bin"))


@register(
    "weighted_len_quantiles_by_source",
    oracle=f"""
    WITH {_TOKS_CTE},
    wv AS (
      SELECT d.source AS source, CAST(d.n_chars AS DOUBLE) AS v, len(t.t) AS w
      FROM documents d JOIN toks t USING (doc_id)
      WHERE d.n_chars IS NOT NULL AND len(t.t) > 0
    ),
    agg AS (SELECT source, v, SUM(w) AS w FROM wv GROUP BY source, v),
    cum AS (
      SELECT source, v, SUM(w) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      FROM agg
    ),
    tot AS (SELECT source, SUM(w) AS tw FROM wv GROUP BY source),
    probes AS (SELECT UNNEST([0.25, 0.5, 0.9]) AS q)
    SELECT c.source AS source, CAST(p.q AS DOUBLE) AS q, MIN(c.v) AS val
    FROM probes p
    CROSS JOIN tot
    JOIN cum c ON c.source = tot.source
              AND c.cw >= GREATEST(p.q * tot.tw, 1.0)
    GROUP BY c.source, p.q ORDER BY source, q
    """,
)
def weighted_len_quantiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE token-weighted document-length cuts
    (profile.weighted_quantiles_select group_by=['source']) — each
    source's char-length threshold under which q of ITS tokens sit, all
    segments located in the same shared selection scans; the per-source
    packing/budget knob the global cut can't provide."""
    from dataquality_ml_spark.operators import text as tx
    from dataquality_ml_spark.operators.profile import weighted_quantiles_select

    docs = _t(spark, sf_dir, "documents")
    toks = tx.token_stats(docs)
    wv = docs.join(toks, "doc_id").select(
        "source",
        F.col("n_chars").cast("double").alias("v"),
        F.col("n_tokens").alias("w"),
    )
    qs = [0.25, 0.5, 0.9]
    got = weighted_quantiles_select(wv, "v", "w", qs, group_by=["source"])
    return spark.createDataFrame(
        [
            (g[0], float(q), float(v))
            for g, vals in got.items()
            for q, v in zip(qs, vals)
        ],
        "source string, q double, val double",
    ).orderBy("source", "q")


@register(
    "feature_drift_lineitem",
    oracle=f"""
    WITH melted AS (
      SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS v, l_shipdate FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE), l_shipdate FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DOUBLE), l_shipdate FROM lineitem
    ),
    tagged AS (
      SELECT col_name, v, CASE WHEN l_shipdate < TIMESTAMP '{_CORR_SPLIT}' THEN 1 ELSE 0 END AS in_a
      FROM melted WHERE v IS NOT NULL
    ),
    per_v AS (
      SELECT col_name, v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b
      FROM tagged GROUP BY col_name, v
    ),
    cum AS (
      SELECT col_name, n_a, n_b,
             SUM(n_a) OVER (PARTITION BY col_name ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(n_b) OVER (PARTITION BY col_name ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(n_a) OVER (PARTITION BY col_name) AS tot_a,
             SUM(n_b) OVER (PARTITION BY col_name) AS tot_b
      FROM per_v
    ),
    s AS (
      SELECT col_name,
             MAX(ABS(ca / CAST(tot_a AS DOUBLE) - cb / CAST(tot_b AS DOUBLE))) AS ks_d,
             SUM(n_a * (ca + cb - (n_a + n_b) + (n_a + n_b + 1) / 2.0)) AS ra,
             CAST(SUM((n_a + n_b) * (n_a + n_b) * (n_a + n_b) - (n_a + n_b)) AS DOUBLE) AS ties,
             SUM(CAST(n_a + n_b AS HUGEINT)
                 * (CAST(ca AS HUGEINT) * tot_b - CAST(cb AS HUGEINT) * tot_a)
                 * (CAST(ca AS HUGEINT) * tot_b - CAST(cb AS HUGEINT) * tot_a)) AS cvm_s,
             MAX(CAST(tot_a + tot_b AS HUGEINT) * (tot_a + tot_b) * tot_a * tot_b) AS cvm_den,
             SUM(CASE WHEN (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)
                            * (tot_a + tot_b - (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                            - (tot_a + tot_b) * (n_a + n_b) / 4.0 > 0 THEN
                   (CAST(n_a + n_b AS DOUBLE) / (tot_a + tot_b))
                   * (((tot_a + tot_b) * (CAST(ca AS DOUBLE) - n_a / 2.0) - tot_a * (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                      * ((tot_a + tot_b) * (CAST(ca AS DOUBLE) - n_a / 2.0) - tot_a * (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)))
                   / ((CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)
                      * (tot_a + tot_b - (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                      - (tot_a + tot_b) * (n_a + n_b) / 4.0)
                   / tot_a
                 ELSE 0 END)
           + SUM(CASE WHEN (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)
                            * (tot_a + tot_b - (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                            - (tot_a + tot_b) * (n_a + n_b) / 4.0 > 0 THEN
                   (CAST(n_a + n_b AS DOUBLE) / (tot_a + tot_b))
                   * (((tot_a + tot_b) * (CAST(cb AS DOUBLE) - n_b / 2.0) - tot_b * (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                      * ((tot_a + tot_b) * (CAST(cb AS DOUBLE) - n_b / 2.0) - tot_b * (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)))
                   / ((CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0)
                      * (tot_a + tot_b - (CAST(ca + cb AS DOUBLE) - (n_a + n_b) / 2.0))
                      - (tot_a + tot_b) * (n_a + n_b) / 4.0)
                   / tot_b
                 ELSE 0 END) AS ad_inner,
             CAST(MAX(tot_a) AS DOUBLE) AS na,
             CAST(MAX(tot_b) AS DOUBLE) AS nb
      FROM cum GROUP BY col_name
    )
    SELECT col_name AS column,
           ROUND(ks_d, 6) + 0 AS ks_d,
           ra - na * (na + 1) / 2 AS u_stat,
           ROUND((ra - na * (na + 1) / 2 - na * nb / 2)
                 / SQRT(na * nb / 12
                        * ((na + nb + 1) - ties / ((na + nb) * (na + nb - 1)))),
                 6) + 0 AS z_score,
           ROUND(CAST(cvm_s AS DOUBLE) / CAST(cvm_den AS DOUBLE), 6) + 0 AS cvm_t,
           ROUND((na + nb - 1) / (na + nb) * ad_inner, 6) + 0 AS ad_a2,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b
    FROM s ORDER BY col_name
    """,
)
def feature_drift_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH FEATURE drifted across the shipdate split: the full
    four-statistic panel for quantity/price/discount in ONE melt + ONE
    keyed aggregation (drift.feature_drift_report) — a 40-feature drift
    report at 100 TB costs one scan per side, not 160 jobs (the
    reference's per-column loop, lib/utils.py:187-195)."""
    from dataquality_ml_spark.operators import drift as dr

    li = _t(spark, sf_dir, "lineitem")
    # split=: ONE lineitem scan, tagged by the shipdate predicate —
    # row-identical to the two-filter form (NULL shipdate belongs to
    # neither side either way), at half the input I/O (round 13)
    out = dr.feature_drift_report(
        li,
        None,
        ["l_quantity", "l_extendedprice", "l_discount"],
        split=F.col("l_shipdate") < F.lit(_CORR_SPLIT).cast("timestamp"),
    )
    return out.select(
        "column",
        (F.round("ks_d", 6) + F.lit(0.0)).alias("ks_d"),
        "u_stat",
        (F.round("z_score", 6) + F.lit(0.0)).alias("z_score"),
        (F.round("cvm_t", 6) + F.lit(0.0)).alias("cvm_t"),
        (F.round("ad_a2", 6) + F.lit(0.0)).alias("ad_a2"),
        "n_a",
        "n_b",
    ).orderBy("column")



# ---------------------------------------------------------------------------
# Round 12: multi-pass sorted-neighborhood (VERDICT r11 item 6) — the
# standard Hernández-Stolfo recipe: several sort keys, one neighborhood
# pass each, pair union. Any single key misses duplicates whose
# discrepancy lands early in that key; the prefix / mid-prefix /
# token-sorted trio covers leading typos, shared boilerplate heads, and
# word reorderings respectively. Every pass is the exploded
# adjacent-bucket equi-join (no cartesian); the union dedup is one
# groupBy on the pair key.
# ---------------------------------------------------------------------------
@register(
    "sorted_neighborhood_multikey_docs",
    oracle="""
    WITH norm AS (
      SELECT doc_id, trim(lower(nfc_normalize(text))) AS nt FROM documents
    ),
    keyed AS (
      SELECT doc_id, 1 AS pass, substr(nt, 1, 24) AS k FROM norm
      UNION ALL
      SELECT doc_id, 2, substr(nt, 25, 24) FROM norm
      UNION ALL
      SELECT doc_id, 3,
             array_to_string(list_sort(string_split(nt, ' ')[1:5]), ' ')
      FROM norm
    ),
    ranked AS (
      SELECT doc_id, pass,
             ROW_NUMBER() OVER (PARTITION BY pass ORDER BY k, doc_id) - 1 AS r
      FROM keyed
    ),
    pairs AS (
      SELECT a.pass,
             LEAST(a.doc_id, b.doc_id) AS id_a,
             GREATEST(a.doc_id, b.doc_id) AS id_b,
             b.r - a.r AS rank_distance
      FROM ranked a JOIN ranked b
        ON a.pass = b.pass AND b.r > a.r AND b.r - a.r <= 3
    )
    SELECT id_a, id_b,
           CAST(COUNT(*) AS INT) AS n_passes,
           MIN(rank_distance) AS min_rank_distance
    FROM pairs GROUP BY id_a, id_b
    ORDER BY id_a, id_b
    """,
)
def sorted_neighborhood_multikey_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood blocking over the corpus (round
    12): candidate pairs within 3 positions under ANY of three sort keys
    — normalized 24-char prefix, the next 24 chars, and the
    alphabetically-sorted first-5-token key — unioned and deduped, with
    n_passes as the agreement signal. Each pass's rank is a distributed
    prefix sum and its neighborhood join a bucket equi-join, so the
    whole face is |passes|x the single-key cost, never quadratic."""
    from dataquality_ml_spark.functions.scalar import normalize_text
    from dataquality_ml_spark.operators import dedup as dd

    # materialize the three keys ONCE: each pass otherwise re-evaluates
    # the normalization (an Arrow UDF on non-ASCII corpora) through its
    # own prefix-sum jobs — 1 normalization scan instead of ~6
    nt = normalize_text("text")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(nt, 1, 24).alias("__k1"),
        F.substring(nt, 25, 24).alias("__k2"),
        F.array_join(F.array_sort(F.slice(F.split(nt, " "), 1, 5)), " ").alias(
            "__k3"
        ),
    ).localCheckpoint(eager=False)
    out = dd.sorted_neighborhood_multipass(
        docs, ["__k1", "__k2", "__k3"], window=3
    )
    return out.orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Round 12: tail/concentration/trend/coverage statistics — the corpus-
# health questions the drift panel doesn't answer: HOW heavy is the tail
# (Hill), HOW concentrated is the mass (Gini, ESS), WHEN did the level
# shift (CUSUM), what's the robust trend (Theil-Sen), and how much
# distinct content does the corpus REALLY have (Chao1).
# ---------------------------------------------------------------------------
@register(
    "hill_tail_orders",
    oracle="""
    WITH t AS (
      SELECT o_totalprice AS v, o_orderkey AS i FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
      ORDER BY v DESC, i LIMIT 501
    ),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v DESC, i) AS rk FROM t),
    thr AS (SELECT v AS thr FROM r WHERE rk = 501)
    SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
           MIN(thr) AS threshold,
           ROUND(1.0 / AVG(LN(v / thr)), 6) + 0 AS hill_alpha,
           ROUND(AVG(LN(v / thr)), 6) + 0 AS tail_mean_log
    FROM r, thr WHERE rk <= 500
    """,
)
def hill_tail_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index of order values (round 12): α̂ over the 500
    largest o_totalprice — α ≤ 2 would mean infinite-variance spend and
    invalidate every z-score face downstream. ONE TakeOrderedAndProject
    of 501 rows; no global sort. Ties at the threshold break by
    o_orderkey so both engines pick identical rows."""
    out = prof.hill_tail_index(
        _t(spark, sf_dir, "orders"), "o_totalprice", k=500, id_col="o_orderkey"
    )
    return out.select(
        "k_used",
        "threshold",
        (F.round("hill_alpha", 6) + F.lit(0.0)).alias("hill_alpha"),
        (F.round("tail_mean_log", 6) + F.lit(0.0)).alias("tail_mean_log"),
    )


@register(
    "gini_revenue_customers",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(o_totalprice) AS v FROM orders GROUP BY 1
    ),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, o_custkey) AS rk FROM rev)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(v), 2) + 0 AS total,
           ROUND(2.0 * SUM(rk * v) / (COUNT(*) * SUM(v))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) + 0 AS gini
    FROM r
    """,
)
def gini_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of revenue across customers (round 12): the
    inequality summary behind "do 1% of customers carry the book". The
    global rank is a DISTRIBUTED prefix sum over the per-customer
    aggregate — no single-task window anywhere."""
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    out = prof.gini_coefficient(rev, "rev", id_col="o_custkey")
    return out.select(
        "n",
        (F.round("total", 2) + F.lit(0.0)).alias("total"),
        (F.round("gini", 6) + F.lit(0.0)).alias("gini"),
    )


@register(
    "cusum_daily_value_events",
    oracle="""
    WITH cells AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(*) AS n, AVG(value) AS mean_value
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1
    ),
    s AS (
      SELECT d, n, mean_value,
             SUM(mean_value - (SELECT AVG(mean_value) FROM cells))
               OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cusum
      FROM cells
    )
    SELECT d, n,
           ROUND(mean_value, 6) + 0 AS mean_value,
           ROUND(cusum, 6) + 0 AS cusum,
           CAST(ABS(cusum) = MAX(ABS(cusum)) OVER () AS INT) AS is_changepoint
    FROM s ORDER BY d
    """,
)
def cusum_daily_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift screen over the daily event-value series (round
    12): per day the running sum of deviations from the grand mean of
    daily means, peak flagged — WHEN the level changed, complementing
    the drift panel's DID it change. One aggregation to the
    calendar-bounded day relation; the cumulative window runs over that
    bounded relation only (same class as exact roc_auc)."""
    from dataquality_ml_spark.operators import drift as dr

    out = dr.cusum_changepoint(_t(spark, sf_dir, "events"), "ts", "value")
    return out.select(
        F.to_date("bucket_ts").alias("d"),
        "n",
        (F.round("mean_value", 6) + F.lit(0.0)).alias("mean_value"),
        (F.round("cusum", 6) + F.lit(0.0)).alias("cusum"),
        "is_changepoint",
    ).orderBy("d")


@register(
    "theil_sen_monthly_revenue",
    oracle="""
    WITH pts AS (
      SELECT (EXTRACT(year FROM o_orderdate) - 1992) * 12
             + EXTRACT(month FROM o_orderdate) AS x,
             SUM(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    sl AS (
      SELECT median((b.y - a.y) / (b.x - a.x)) AS slope,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pts a JOIN pts b ON b.x > a.x
    )
    SELECT CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n_points,
           n_pairs,
           ROUND(slope, 6) + 0 AS slope,
           ROUND((SELECT median(y - sl.slope * x) FROM pts), 6) + 0 AS intercept
    FROM sl
    """,
)
def theil_sen_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue (round 12): the median
    pairwise slope — a backfilled or truncated month cannot swing it the
    way it swings OLS. The corpus collapses to the calendar-bounded
    month relation FIRST; the quadratic pair join runs over that bounded
    series under the operator's loud max_points contract."""
    from dataquality_ml_spark.operators import drift as dr

    pts = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (
                (F.year("o_orderdate") - F.lit(1992)) * 12
                + F.month("o_orderdate")
            ).alias("x")
        )
        .agg(F.sum("o_totalprice").alias("y"))
    )
    out = dr.theil_sen_trend(pts, "x", "y")
    return out.select(
        "n_points",
        "n_pairs",
        (F.round("slope", 6) + F.lit(0.0)).alias("slope"),
        (F.round("intercept", 6) + F.lit(0.0)).alias("intercept"),
    )


from dataquality_ml_spark.queries import _TOKS_CTE as _TOKS_CTE_R12


@register(
    "chao1_dup_richness_docs",
    oracle=f"""
    WITH {_TOKS_CTE_R12},
    clusters AS (
      SELECT md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp,
             COUNT(*) AS n_copies
      FROM toks GROUP BY 1
    ),
    hist AS (SELECT n_copies, COUNT(*) AS n_clusters FROM clusters GROUP BY 1)
    SELECT CAST(SUM(n_copies * n_clusters) AS BIGINT) AS n_docs,
           CAST(SUM(n_clusters) AS BIGINT) AS s_obs,
           CAST(SUM(CASE WHEN n_copies = 1 THEN n_clusters ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN n_copies = 2 THEN n_clusters ELSE 0 END) AS BIGINT) AS f2,
           ROUND(SUM(n_clusters)
                 + CAST(SUM(CASE WHEN n_copies = 1 THEN n_clusters ELSE 0 END) AS DOUBLE)
                   * (SUM(CASE WHEN n_copies = 1 THEN n_clusters ELSE 0 END) - 1)
                   / (2.0 * (SUM(CASE WHEN n_copies = 2 THEN n_clusters ELSE 0 END) + 1)),
                 6) + 0 AS chao1_estimate,
           ROUND(1.0 - SUM(CASE WHEN n_copies = 1 THEN n_clusters ELSE 0 END)
                 / CAST(SUM(n_copies * n_clusters) AS DOUBLE), 6) + 0 AS coverage,
           ROUND(1.0 - SUM(n_clusters)
                 / CAST(SUM(n_copies * n_clusters) AS DOUBLE), 6) + 0 AS dup_rate
    FROM hist
    """,
)
def chao1_dup_richness_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 capture-recapture estimate of the corpus's true distinct-
    content count (round 12), from the exact-dedup cluster-size
    histogram: how much near-singleton content a bigger crawl would
    still surface, plus Good-Turing coverage and the duplication rate.
    One hash aggregation to the cluster relation, one to its ≤|max
    size| histogram; all integer counts."""
    from dataquality_ml_spark.operators import dedup as dd12

    out = dd12.chao1_duplicate_richness(_t(spark, sf_dir, "documents"))
    return out.select(
        "n_docs",
        "s_obs",
        "f1",
        "f2",
        (F.round("chao1_estimate", 6) + F.lit(0.0)).alias("chao1_estimate"),
        (F.round("coverage", 6) + F.lit(0.0)).alias("coverage"),
        (F.round("dup_rate", 6) + F.lit(0.0)).alias("dup_rate"),
    )


@register(
    "ess_length_weights_docs",
    oracle="""
    WITH w AS (
      SELECT CAST(length(text) AS DOUBLE) AS w FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(w), 2) + 0 AS sum_w,
           ROUND(SUM(w) * SUM(w) / SUM(w * w), 6) + 0 AS ess,
           ROUND(SUM(w) * SUM(w) / SUM(w * w) / COUNT(*), 6) + 0 AS ess_frac,
           ROUND(MAX(w) / SUM(w), 6) + 0 AS max_w_share
    FROM w
    """,
)
def ess_length_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of length-proportional document
    weights (round 12) — the diagnostic every weighted sampler (DSIR,
    temperature, token-budget) should report: ESS/n near 0 means a few
    long documents dominate the expected sample. ONE aggregation."""
    from dataquality_ml_spark.operators import selection as sel12

    docs = _t(spark, sf_dir, "documents").select(
        F.length("text").cast("double").alias("w")
    )
    out = sel12.importance_weight_ess(docs, "w")
    return out.select(
        "n",
        (F.round("sum_w", 2) + F.lit(0.0)).alias("sum_w"),
        (F.round("ess", 6) + F.lit(0.0)).alias("ess"),
        (F.round("ess_frac", 6) + F.lit(0.0)).alias("ess_frac"),
        (F.round("max_w_share", 6) + F.lit(0.0)).alias("max_w_share"),
    )


# ---------------------------------------------------------------------------
# Round 12, batch 3: monotonic-trend testing, seasonality-adjusted
# monitoring, ratio-metric inference, readability scoring.
# ---------------------------------------------------------------------------
@register(
    "mann_kendall_monthly_revenue",
    oracle="""
    WITH pts AS (
      SELECT (EXTRACT(year FROM o_orderdate) - 1992) * 12
             + EXTRACT(month FROM o_orderdate) AS x,
             SUM(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(SIGN(b.y - a.y)) AS BIGINT) AS s_stat
      FROM pts a JOIN pts b ON b.x > a.x
    ),
    t AS (
      SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tt
      FROM (SELECT COUNT(*) AS t FROM pts GROUP BY y HAVING COUNT(*) > 1)
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts)
    SELECT n.n AS n_points,
           s.s_stat,
           ROUND((n.n * (n.n - 1) * (2 * n.n + 5) - t.tt) / 18.0, 6) + 0 AS var_s,
           ROUND(CASE
             WHEN (n.n * (n.n - 1) * (2 * n.n + 5) - t.tt) <= 0 THEN 0.0
             WHEN s.s_stat > 0 THEN (s.s_stat - 1)
               / SQRT((n.n * (n.n - 1) * (2 * n.n + 5) - t.tt) / 18.0)
             WHEN s.s_stat < 0 THEN (s.s_stat + 1)
               / SQRT((n.n * (n.n - 1) * (2 * n.n + 5) - t.tt) / 18.0)
             ELSE 0.0 END, 6) + 0 AS z
    FROM n, s, t
    """,
)
def mann_kendall_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on monthly revenue (round 12):
    the distribution-free IS-it-trending answer that pairs with
    theil_sen_monthly_revenue's slope. Calendar-bounded series first;
    exact integer S and tie terms under the operator's loud max_points
    contract."""
    from dataquality_ml_spark.operators import drift as dr

    pts = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (
                (F.year("o_orderdate") - F.lit(1992)) * 12
                + F.month("o_orderdate")
            ).alias("x")
        )
        .agg(F.sum("o_totalprice").alias("y"))
    )
    out = dr.mann_kendall_trend(pts, "x", "y")
    return out.select(
        "n_points",
        "s_stat",
        (F.round("var_s", 6) + F.lit(0.0)).alias("var_s"),
        (F.round("z", 6) + F.lit(0.0)).alias("z"),
    )


@register(
    "seasonal_outliers_events",
    oracle="""
    WITH base AS (
      SELECT event_id, ts, CAST(value AS DOUBLE) AS v,
             dayofweek(ts) + 1 AS dw, EXTRACT(hour FROM ts) AS hh
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    prof AS (SELECT dw, hh, AVG(v) AS expected FROM base GROUP BY 1, 2),
    resid AS (
      SELECT b.event_id, b.ts, b.v, p.expected, b.v - p.expected AS residual
      FROM base b JOIN prof p ON p.dw = b.dw AND p.hh = b.hh
    ),
    sig AS (SELECT SQRT(AVG(residual * residual)) AS sigma FROM resid)
    SELECT event_id, ts, ROUND(v, 6) + 0 AS value,
           ROUND(expected, 6) + 0 AS expected,
           ROUND(residual, 6) + 0 AS residual,
           ROUND(residual / sigma, 6) + 0 AS z
    FROM resid, sig
    WHERE ABS(residual / sigma) > 3.0
    ORDER BY event_id
    """,
)
def seasonal_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted value outliers (round 12): events whose
    value deviates >3 residual-sigmas from their hour-of-week baseline —
    the screen that ignores the Monday-9am spike a raw z-score alarms
    on. One agg to the 168-cell profile (broadcast back), one 1-row
    sigma join; nothing row-sized leaves the executors."""
    from dataquality_ml_spark.operators import sequences as seq

    out = seq.seasonal_residual_outliers(
        _t(spark, sf_dir, "events"), "ts", "value", k=3.0, id_col="event_id"
    )
    return out.select(
        "event_id",
        "ts",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
        (F.round("expected", 6) + F.lit(0.0)).alias("expected"),
        (F.round("residual", 6) + F.lit(0.0)).alias("residual"),
        (F.round("z", 6) + F.lit(0.0)).alias("z"),
    ).orderBy("event_id")


@register(
    "lix_readability_docs",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_words,
             GREATEST(1, len(string_split_regex(text, '[.!?]')) - 1) AS n_sentences,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> length(x) > 6)) AS n_long
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_long AS BIGINT) AS n_long,
           CASE WHEN n_words > 0 THEN
             ROUND(n_words / CAST(n_sentences AS DOUBLE)
                   + 100.0 * n_long / CAST(n_words AS DOUBLE), 4) + 0
           END AS lix
    FROM w ORDER BY doc_id
    """,
)
def lix_readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIX readability per document (round 12): words/sentences +
    100*longwords/words — the syllable-free (hence engine-exact)
    readability screen joining the text-quality feature family. Pure
    narrow expressions, no shuffle."""
    out = tx.lix_readability(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_long",
        (F.round("lix", 4) + F.lit(0.0)).alias("lix"),
    ).orderBy("doc_id")


@register(
    "ratio_metric_ci_events",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             user_id % 2 AS variant,
             SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS x,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    agg AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
             SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM per_user GROUP BY 1
    )
    SELECT variant, n,
           ROUND(sx / sy, 6) + 0 AS ratio,
           ROUND(SQRT(GREATEST(
                   sxx / n - (sx / n) * (sx / n)
                   + (sx / sy) * (sx / sy) * (syy / n - (sy / n) * (sy / n))
                   - 2 * (sx / sy) * (sxy / n - (sx / n) * (sy / n)), 0.0))
                 / SQRT(n * (sy / n) * (sy / n)), 6) + 0 AS se,
           ROUND(sx / sy - 1.959963984540054 * SQRT(GREATEST(
                   sxx / n - (sx / n) * (sx / n)
                   + (sx / sy) * (sx / sy) * (syy / n - (sy / n) * (sy / n))
                   - 2 * (sx / sy) * (sxy / n - (sx / n) * (sy / n)), 0.0))
                 / SQRT(n * (sy / n) * (sy / n)), 6) + 0 AS ci_lo,
           ROUND(sx / sy + 1.959963984540054 * SQRT(GREATEST(
                   sxx / n - (sx / n) * (sx / n)
                   + (sx / sy) * (sx / sy) * (syy / n - (sy / n) * (sy / n))
                   - 2 * (sx / sy) * (sxy / n - (sx / n) * (sy / n)), 0.0))
                 / SQRT(n * (sy / n) * (sy / n)), 6) + 0 AS ci_hi
    FROM agg ORDER BY variant
    """,
)
def ratio_metric_ci_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for the purchase-value-per-event ratio metric
    (round 12), per synthetic arm (user_id parity): the A/B readout
    where denominators vary per user and the naive mean-of-ratios CI is
    wrong. Unit = user (one pre-aggregation), then ONE |arms|-row
    aggregation of exact sums."""
    from dataquality_ml_spark.operators import evaluate as ev12

    per_user = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    F.lit(0.0)
                )
            ).alias("x"),
            F.count(F.lit(1)).cast("double").alias("y"),
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    out = ev12.ratio_metric_ci(per_user, "variant", "x", "y")
    return out.select(
        "variant",
        "n",
        (F.round("ratio", 6) + F.lit(0.0)).alias("ratio"),
        (F.round("se", 6) + F.lit(0.0)).alias("se"),
        (F.round("ci_lo", 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round("ci_hi", 6) + F.lit(0.0)).alias("ci_hi"),
    ).orderBy("variant")


@register(
    "linkage_matches_docs",
    oracle="""
    WITH norm AS (
      SELECT doc_id, trim(lower(nfc_normalize(text))) AS nt FROM documents
    ),
    keyed AS (
      SELECT doc_id, substr(nt, 1, 24) AS k, substr(nt, 1, 48) AS vk FROM norm
    ),
    ranked AS (
      SELECT doc_id, vk, ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS r
      FROM keyed
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.vk AS va, b.vk AS vb
      FROM ranked a JOIN ranked b ON b.r > a.r AND b.r - a.r <= 3
    )
    SELECT id_a, id_b,
           ROUND(jaro_winkler_similarity(va, vb), 6) + 0 AS jw
    FROM pairs
    WHERE jaro_winkler_similarity(va, vb) >= 0.9
    ORDER BY id_a, id_b
    """,
)
def linkage_matches_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage record linkage end-to-end (round 12): sorted-
    neighborhood blocking (window 3 on the normalized 24-char prefix)
    generates candidates, Jaro-Winkler >= 0.9 over the normalized
    48-char prefix verifies them. The scorer is the textbook JW as an
    Arrow-batched pandas UDF, differentially bit-identical to DuckDB's
    jaro_winkler_similarity — so this face hash-checks a PYTHON UDF
    against a native engine implementation."""
    from dataquality_ml_spark.functions.scalar import normalize_text
    from dataquality_ml_spark.operators import dedup as ddl

    # one normalization scan: the keyed relation feeds the blocking
    # pass AND both sides of the verify join
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(normalize_text("text"), 1, 24).alias("__k"),
        F.substring(normalize_text("text"), 1, 48).alias("__vk"),
    ).localCheckpoint(eager=False)
    pairs = ddl.sorted_neighborhood_pairs(docs, "__k", window=3).select(
        "id_a", "id_b"
    )
    out = ddl.linkage_score_pairs(
        docs.select("doc_id", "__vk"), pairs, "__vk", threshold=0.9
    )
    return out.select(
        "id_a", "id_b", (F.round("jw", 6) + F.lit(0.0)).alias("jw")
    ).orderBy("id_a", "id_b")


@register(
    "fd_check_lineitem",
    oracle="""
    WITH pairs AS (
      SELECT l_orderkey, l_returnflag AS y, COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    per_x AS (
      SELECT l_orderkey, SUM(c) AS n_g, MAX(c) AS max_y, COUNT(*) AS n_y
      FROM pairs GROUP BY 1
    )
    SELECT CAST(SUM(n_g) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT(*) FILTER (WHERE n_y > 1) AS BIGINT) AS n_violating_groups,
           CAST(SUM(n_g - max_y) AS BIGINT) AS g3_rows,
           ROUND(SUM(n_g - max_y) / CAST(SUM(n_g) AS DOUBLE), 6) + 0 AS g3_error
    FROM per_x
    """,
)
def fd_check_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit l_orderkey -> l_returnflag (round 12):
    the g3 error — the minimum row fraction to delete for "one order,
    one return flag" to hold. Two map-side-combinable groupBys + a 1-row
    reduce; the decay of a believed FD is a classic silent data-entry
    drift."""
    from dataquality_ml_spark.operators import rules as ru

    out = ru.fd_violations(_t(spark, sf_dir, "lineitem"), ["l_orderkey"], "l_returnflag")
    return out.select(
        "n_rows",
        "n_groups",
        "n_violating_groups",
        "g3_rows",
        (F.round("g3_error", 6) + F.lit(0.0)).alias("g3_error"),
    )


@register(
    "gpd_tail_lineitem",
    oracle="""
    WITH u AS (
      SELECT quantile_cont(l_extendedprice, 0.95) AS u FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    exc AS (
      SELECT l_extendedprice - u.u AS y, u.u AS u
      FROM lineitem, u
      WHERE l_extendedprice IS NOT NULL
    ),
    agg AS (
      SELECT MAX(u) AS u, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (WHERE y > 0) AS BIGINT) AS n_exceed,
             SUM(CASE WHEN y > 0 THEN y END) AS s1,
             SUM(CASE WHEN y > 0 THEN y * y END) AS s2
      FROM exc
    )
    SELECT ROUND(u, 6) + 0 AS threshold, n, n_exceed,
           ROUND(s1 / n_exceed, 6) + 0 AS mean_excess,
           ROUND((1.0 - (s1 / n_exceed) * (s1 / n_exceed)
                  / (s2 / n_exceed - (s1 / n_exceed) * (s1 / n_exceed))) / 2,
                 6) + 0 AS xi,
           ROUND((s1 / n_exceed)
                 * ((s1 / n_exceed) * (s1 / n_exceed)
                    / (s2 / n_exceed - (s1 / n_exceed) * (s1 / n_exceed)) + 1) / 2,
                 6) + 0 AS beta
    FROM agg
    """,
)
def gpd_tail_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD fit of l_extendedprice beyond its exact
    p95 (round 12): method-of-moments xi/beta — the extreme-value
    complement to hill_tail_orders (what the unseen tail looks like, not
    just how heavy). Threshold through the shared selection engine; one
    filtered aggregation."""
    out = prof.gpd_tail_fit(_t(spark, sf_dir, "lineitem"), "l_extendedprice", q=0.95)
    return out.select(
        (F.round("threshold", 6) + F.lit(0.0)).alias("threshold"),
        "n",
        "n_exceed",
        (F.round("mean_excess", 6) + F.lit(0.0)).alias("mean_excess"),
        (F.round("xi", 6) + F.lit(0.0)).alias("xi"),
        (F.round("beta", 6) + F.lit(0.0)).alias("beta"),
    )


@register(
    "bootstrap_mean_ci_events",
    oracle="""
    WITH base AS (
      SELECT CAST(event_id AS BIGINT) AS i, CAST(value AS DOUBLE) AS x
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value) AND event_id IS NOT NULL
    ),
    ex AS (
      SELECT i, x, CAST(g.range AS BIGINT) AS b FROM base, range(64) g
    ),
    halves AS (
      SELECT b, x, (i % 4294967296) AS lo, (i >> 32) AS hi FROM ex
    ),
    pm1 AS (
      SELECT b, x, hi,
             (lo * 1103515245 + hi * 1597334677 + 12345) % 4294967296 AS p
      FROM halves
    ),
    pm2 AS (SELECT b, x, hi, xor(p, p >> 16) AS p FROM pm1),
    pm3 AS (SELECT b, x, (p * 1597334677 + hi) % 4294967296 AS p FROM pm2),
    pm4 AS (SELECT b, x, xor(p, p >> 13) AS p FROM pm3),
    mix AS (
      SELECT b, x, (p + (b + 1) * 1046527) % 4294967296 AS s FROM pm4
    ),
    m1 AS (SELECT b, x, (s * 1103515245 + 12345) % 4294967296 AS h FROM mix),
    m2 AS (SELECT b, x, xor(h, h >> 16) AS h FROM m1),
    m3 AS (SELECT b, x, (h * 1597334677) % 4294967296 AS h FROM m2),
    uw AS (
      SELECT b, x, xor(h, h >> 16) / 4294967296.0 AS u FROM m3
    ),
    w AS (
      SELECT b, x, CASE
        WHEN u < 0.36787944117144233 THEN 0
        WHEN u < 0.7357588823428847 THEN 1
        WHEN u < 0.9196986029286058 THEN 2
        WHEN u < 0.9810118431238463 THEN 3
        WHEN u < 0.9963401531726563 THEN 4
        WHEN u < 0.9994058151824183 THEN 5
        WHEN u < 0.999916758850712 THEN 6
        WHEN u < 0.9999897508033253 THEN 7
        WHEN u < 0.999998874797402 THEN 8
        WHEN u < 0.9999998885745216 THEN 9
        ELSE 10 END AS w
      FROM uw
    ),
    reps AS (
      SELECT b, SUM(w * x) / SUM(w) AS mean_b FROM w GROUP BY b
      HAVING SUM(w) > 0
    ),
    ci AS (
      SELECT quantile_cont(mean_b, 0.025) AS boot_lo,
             quantile_cont(mean_b, 0.5) AS boot_median,
             quantile_cont(mean_b, 0.975) AS boot_hi
      FROM reps
    )
    SELECT CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n,
           ROUND((SELECT AVG(x) FROM base), 6) + 0 AS mean,
           ROUND(boot_lo, 6) + 0 AS boot_lo,
           ROUND(boot_median, 6) + 0 AS boot_median,
           ROUND(boot_hi, 6) + 0 AS boot_hi,
           CAST(64 AS INT) AS n_boot
    FROM ci
    """,
)
def bootstrap_mean_ci_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poissonized bootstrap CI of the mean event value (round 12): 64
    deterministic Poisson(1)-reweighted replicates in ONE scan (hash of
    (event_id, b) through the frozen inverse CDF — no RNG state, no
    shuffle-order dependence), empirical 95% interval over the bounded
    replicate relation. The distributed bootstrap a 100 TB pipeline can
    actually afford."""
    from dataquality_ml_spark.operators import evaluate as ev12b

    out = ev12b.poisson_bootstrap_ci(
        _t(spark, sf_dir, "events"), "value", "event_id", n_boot=64, alpha=0.05
    )
    return out.select(
        "n",
        (F.round("mean", 6) + F.lit(0.0)).alias("mean"),
        (F.round("boot_lo", 6) + F.lit(0.0)).alias("boot_lo"),
        (F.round("boot_median", 6) + F.lit(0.0)).alias("boot_median"),
        (F.round("boot_hi", 6) + F.lit(0.0)).alias("boot_hi"),
        "n_boot",
    )


@register(
    "cusum_stream_replay_events",
    oracle="""
    WITH mu AS (
      SELECT ROUND(AVG(value), 6) AS mu0 FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n, AVG(value) AS m
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1
    ),
    p AS (
      SELECT d, n, m,
             ROW_NUMBER() OVER (ORDER BY d) - 1 AS batch_id,
             SUM(m - mu.mu0 - 1.0) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS plo,
             SUM(m - mu.mu0 + 1.0) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS phi
      FROM cells, mu
    ),
    s AS (
      SELECT batch_id, n, m,
             plo - LEAST(0, MIN(plo) OVER (ORDER BY batch_id ROWS UNBOUNDED PRECEDING)) AS splus,
             GREATEST(0, MAX(phi) OVER (ORDER BY batch_id ROWS UNBOUNDED PRECEDING)) - phi AS sminus
      FROM p
    )
    SELECT batch_id, n,
           ROUND(m, 6) + 0 AS mean,
           ROUND(splus, 6) + 0 AS splus,
           ROUND(sminus, 6) + 0 AS sminus,
           CAST(splus > 5.0 OR sminus > 5.0 AS INT) AS alarm
    FROM s ORDER BY batch_id
    """,
)
def cusum_stream_replay_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM level monitor, replayed (round 12): the
    PRODUCTION foreachBatch fold (streaming.score_stream._cusum_monitor_fold
    — Page's two-sided CUSUM vs the frozen training mean, slack 1.0,
    alarm at 5.0) driven over WEEKLY micro-batch slices of events (a
    replay runs one driver-sequenced fold per batch, so the face keeps
    the batch count calendar-small; the fold itself is slice-size-free). The
    prefix-sum identity S+ = P - min(0, min P) makes the stateful
    recursion exactly SQL-replayable, so the streaming operator is
    hash-gated end-to-end; per batch exactly two scalars cross to the
    driver."""
    from dataquality_ml_spark.streaming import score_stream as ss

    ev = _t(spark, sf_dir, "events")
    mu0 = round(
        ev.where(F.col("value").isNotNull()).agg(F.avg("value")).first()[0], 6
    )
    sliced = ev.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).withColumn("__day", F.to_date(F.date_trunc("week", F.col("ts"))))
    out = ss.cusum_monitor_replay(
        sliced, "__day", mu0, "value", slack=1.0, h=5.0
    )
    return out.select(
        "batch_id",
        "n",
        (F.round("mean", 6) + F.lit(0.0)).alias("mean"),
        (F.round("splus", 6) + F.lit(0.0)).alias("splus"),
        (F.round("sminus", 6) + F.lit(0.0)).alias("sminus"),
        "alarm",
    ).orderBy("batch_id")


@register(
    "isotonic_calibration_events",
    oracle="""
    WITH scored AS (
      SELECT value / 500.0 AS s,
             CAST(((event_id * 2654435761) % 100) < value / 5.0 AS INT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT LEAST(31, GREATEST(0, CAST(FLOOR(s / 0.03125) AS INT))) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS np,
             SUM(s) AS ss
      FROM scored WHERE s IS NOT NULL AND NOT isnan(s) AND y IS NOT NULL
      GROUP BY 1
    ),
    ord AS (
      SELECT bin, n, np, ss, ROW_NUMBER() OVER (ORDER BY bin) AS i,
             SUM(n) OVER (ORDER BY bin) AS cw,
             SUM(np) OVER (ORDER BY bin) AS cwy
      FROM cells
    ),
    -- isotonic solution via the max-min identity:
    -- iso_i = max_{j<=i} min_{k>=i} (cwy_k - (cwy_j - np_j)) / (cw_k - (cw_j - n_j))
    a AS (
      SELECT m.i AS i, j.i AS j,
             MIN((k.cwy - (j.cwy - j.np)) / CAST(k.cw - (j.cw - j.n) AS DOUBLE)) AS mn
      FROM ord m
      JOIN ord j ON j.i <= m.i
      JOIN ord k ON k.i >= m.i
      GROUP BY m.i, j.i
    ),
    iso AS (SELECT i, MAX(mn) AS calibrated FROM a GROUP BY i)
    SELECT o.bin,
           o.n,
           ROUND(o.ss / o.n, 6) + 0 AS mean_score,
           ROUND(CAST(o.np AS DOUBLE) / o.n, 6) + 0 AS frac_pos,
           ROUND(iso.calibrated, 6) + 0 AS calibrated
    FROM ord o JOIN iso ON iso.i = o.i
    ORDER BY o.bin
    """,
)
def isotonic_calibration_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) score calibration over the deterministic
    score/label pair of calibration_curve_events (round 12): the
    monotone score-to-probability map that FIXES the miscalibration the
    reliability diagram diagnoses. One aggregation to <=32 cells; PAV
    runs driver-side with exact integer sums, and the oracle computes
    the same fit through the max-min identity — PAV == max-min is the
    Ayer et al. theorem, and both sides reduce to identical int/int
    divisions, so the check is bitwise."""
    from dataquality_ml_spark.operators.evaluate import isotonic_calibration

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("value") / 500.0).alias("s"),
        (
            F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(100))
            < F.col("value") / 5.0
        ).cast("int").alias("y"),
    )
    out = isotonic_calibration(scored, "s", "y", bins=32, lo=0.0, hi=1.0)
    return out.select(
        "bin",
        "n",
        (F.round("mean_score", 6) + F.lit(0.0)).alias("mean_score"),
        (F.round("frac_pos", 6) + F.lit(0.0)).alias("frac_pos"),
        (F.round("calibrated", 6) + F.lit(0.0)).alias("calibrated"),
    ).orderBy("bin")


def _pagerank_oracle(iters: int = 5) -> str:
    """Unrolled relational PageRank over the sorted-neighborhood
    candidate graph — one MATERIALIZED CTE per iteration (same
    anti-inlining discipline as the unigram DP oracles)."""
    parts = [
        """norm AS (
      SELECT doc_id, trim(lower(nfc_normalize(text))) AS nt FROM documents
    ),
    keyed AS (SELECT doc_id, substr(nt, 1, 24) AS k FROM norm),
    ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS r
      FROM keyed
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ranked a JOIN ranked b ON b.r > a.r AND b.r - a.r <= 3
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM sym GROUP BY 1),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    r0 AS MATERIALIZED (SELECT src, 1.0 / nn.n AS rank FROM deg CROSS JOIN nn)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""r{t} AS MATERIALIZED (
      SELECT d.src,
             (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c.insum, 0.0) AS rank
      FROM deg d CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS src, SUM(r.rank / dg.deg) AS insum
        FROM r{t - 1} r
        JOIN deg dg ON dg.src = r.src
        JOIN sym e ON e.src = r.src
        GROUP BY e.dst
      ) c ON c.src = d.src
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT src AS node, ROUND(rank, 6) + 0 AS rank
    FROM r{iters} ORDER BY node
    """
    )


@register("pagerank_dup_candidates_docs", oracle=_pagerank_oracle())
def pagerank_dup_candidates_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality in the sorted-neighborhood candidate graph
    (round 12, 5 iterations, d=0.85): a boilerplate/template hub blocks
    against many documents even when no single pair-score stands out —
    rank concentration is the hub alarm the pairwise dedup operators
    cannot raise. Relational PageRank: one equi-join + groupBy per
    iteration, each iterate localCheckpoint-ed; the oracle unrolls the
    same five iterations as MATERIALIZED CTEs."""
    from dataquality_ml_spark.functions.scalar import normalize_text
    from dataquality_ml_spark.operators import dedup as ddp
    from dataquality_ml_spark.operators import graph as gr

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring(normalize_text("text"), 1, 24).alias("__k")
    )
    # NOT checkpointed: measured at sf0.1, re-evaluating the bounded
    # neighborhood join in the union's two parallel branches (5.0 s) beats
    # materializing it through an RDD checkpoint first (9.8 s)
    pairs = ddp.sorted_neighborhood_pairs(docs, "__k", window=3).select(
        "id_a", "id_b"
    )
    out = gr.pagerank(pairs, iterations=5, damping=0.85)
    return out.select(
        "node", (F.round("rank", 6) + F.lit(0.0)).alias("rank")
    ).orderBy("node")


@register(
    "embedding_covariance_docs",
    oracle="""
    WITH comp AS (
      SELECT vec_id, u.i AS i, u.v AS v
      FROM embeddings,
      UNNEST([{'i': i, 'v': embedding[i]}
              for i in generate_series(1, len(embedding))]) AS t(u)
    )
    SELECT a.i, CAST(b.i AS INT) AS j,
           ROUND(SUM(a.v * b.v) / COUNT(*)
                 - (SUM(a.v) / COUNT(*)) * (SUM(b.v) / COUNT(*)), 6) + 0 AS cov
    FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND b.i >= a.i
    GROUP BY a.i, b.i
    ORDER BY a.i, j
    """,
)
def embedding_covariance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance of the embedding components (round 12):
    the anisotropy audit the per-dimension profile can't see — a strong
    common direction inflates every cosine and compresses ANN score
    ranges. Per-partition Gram matrices via mapInPandas (one BLAS MᵀM
    per Arrow batch, d(d+1)/2 narrow rows per partition) reduced by one
    (i, j) groupBy — rewritten from a d + d(d+1)/2 wide aggregation
    whose 2 145 expressions blew up codegen at d=64 (17 s → 0.92 s,
    oracle hash unchanged); the oracle replays the same algebra through
    a component self-join."""
    from dataquality_ml_spark.operators import similarity as sim12

    out = sim12.embedding_covariance(_t(spark, sf_dir, "embeddings"))
    return out.select(
        "i", "j", (F.round("cov", 6) + F.lit(0.0)).alias("cov")
    ).orderBy("i", "j")


@register("embedding_effective_rank_docs")  # eigendecomposition of the
# covariance is not SQL-expressible -> rows-only driver gate; the
# covariance INPUT is hash-gated by embedding_covariance_docs and the
# erank math is pinned by planted-rank unit tests
def embedding_effective_rank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective rank of the embedding space (round 12): exp(entropy of
    the covariance eigenvalue distribution) — how many directions the
    embeddings REALLY occupy; erank << d means the space collapsed and
    ANN is searching a far smaller space than paid for. Covariance via
    mapInPandas partial Grams reduced by one (i, j) groupBy; the
    bounded d x d eigenproblem runs driver-side."""
    from dataquality_ml_spark.operators import similarity as sim12

    out = sim12.embedding_effective_rank(_t(spark, sf_dir, "embeddings"))
    return out.select(
        "d",
        (F.round("total_var", 6) + F.lit(0.0)).alias("total_var"),
        (F.round("effective_rank", 6) + F.lit(0.0)).alias("effective_rank"),
        (F.round("top_eig_share", 6) + F.lit(0.0)).alias("top_eig_share"),
    )


@register(
    "kfold_split_events",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CAST(CAST(('0x' || substr(md5('cv1|' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 5 AS INT) AS fold
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_groups
    FROM assigned GROUP BY fold ORDER BY fold
    """,
)
def kfold_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 5-fold split of events grouped by user (round 12):
    every user's rows land in ONE fold (hash of the user id, not the
    row), so grouped cross-validation never sees a user on both sides —
    and the assignment is engine-portable and rerun-stable, unlike
    randomSplit. Face reports the per-fold row/group balance."""
    from dataquality_ml_spark.operators import selection as sel

    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    out = sel.kfold_assign(ev, k=5, group_col="user_id", seed="cv1")
    return (
        out.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_groups"),
        )
        .orderBy("fold")
    )


@register(
    "cusum_by_type_events",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n, AVG(value) AS m
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    g AS (SELECT event_type, AVG(m) AS gm FROM cells GROUP BY 1),
    s AS (
      SELECT c.event_type, c.d, c.n, c.m,
             SUM(c.m - g.gm) OVER (PARTITION BY c.event_type ORDER BY c.d
                                   ROWS UNBOUNDED PRECEDING) AS cusum
      FROM cells c JOIN g ON g.event_type = c.event_type
    )
    SELECT event_type, d, n,
           ROUND(m, 6) + 0 AS mean_value,
           ROUND(cusum, 6) + 0 AS cusum,
           CAST(ABS(cusum) = MAX(ABS(cusum)) OVER (PARTITION BY event_type)
                AS INT) AS is_changepoint
    FROM s ORDER BY event_type, d
    """,
)
def cusum_by_type_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment CUSUM changepoint panel (round 12): one independent
    daily CUSUM per event type — WHEN each segment's level shifted. The
    keyed face has NO unpartitioned window anywhere (grand mean,
    cumulative, and peak all key-partitioned), so a thousand-segment
    panel spreads across tasks."""
    from dataquality_ml_spark.operators import drift as dr

    ev = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    out = dr.cusum_changepoint(ev, "ts", "value", keys=["event_type"])
    return out.select(
        "event_type",
        F.to_date("bucket_ts").alias("d"),
        "n",
        (F.round("mean_value", 6) + F.lit(0.0)).alias("mean_value"),
        (F.round("cusum", 6) + F.lit(0.0)).alias("cusum"),
        "is_changepoint",
    ).orderBy("event_type", "d")


# ===========================================================================
# Round 13
# ===========================================================================
@register(
    "cusum_monitor_batch_events",
    oracle="""
    WITH mu AS (
      SELECT ROUND(AVG(value), 6) AS mu0 FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n, AVG(value) AS m
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1
    ),
    p AS (
      SELECT d, n, m,
             ROW_NUMBER() OVER (ORDER BY d) - 1 AS batch_id,
             SUM(m - mu.mu0 - 1.0) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS plo,
             SUM(m - mu.mu0 + 1.0) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS phi
      FROM cells, mu
    ),
    s AS (
      SELECT batch_id, n, m,
             plo - LEAST(0, MIN(plo) OVER (ORDER BY batch_id ROWS UNBOUNDED PRECEDING)) AS splus,
             GREATEST(0, MAX(phi) OVER (ORDER BY batch_id ROWS UNBOUNDED PRECEDING)) - phi AS sminus
      FROM p
    )
    SELECT batch_id, n,
           ROUND(m, 6) + 0 AS mean,
           ROUND(splus, 6) + 0 AS splus,
           ROUND(sminus, 6) + 0 AS sminus,
           CAST(splus > 5.0 OR sminus > 5.0 AS INT) AS alarm
    FROM s ORDER BY batch_id
    """,
)
def cusum_monitor_batch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass batch CUSUM monitor at DAILY granularity (round 13,
    VERDICT item 5): the same two-sided Page statistic the streaming
    fold carries (cusum_stream_replay_events), computed for every day
    in ONE job via the prefix-sum identity — the weekly replay face
    exists because a daily replay drives ~150 sequential driver folds;
    this face makes the fine-granularity backfill affordable. Windows
    run over the calendar-daily bucket relation only (the documented
    bounded-window class); batch==fold agreement is differentially
    tested in tests/test_round13_ops.py."""
    from dataquality_ml_spark.operators import drift as dr13

    ev = _t(spark, sf_dir, "events")
    mu0 = round(
        ev.where(F.col("value").isNotNull()).agg(F.avg("value")).first()[0], 6
    )
    sliced = ev.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).withColumn("__day", F.to_date(F.date_trunc("day", F.col("ts"))))
    out = dr13.cusum_monitor_batch(
        sliced, "__day", mu0, "value", slack=1.0, h=5.0
    )
    return out.select(
        "batch_id",
        "n",
        (F.round("mean", 6) + F.lit(0.0)).alias("mean"),
        (F.round("splus", 6) + F.lit(0.0)).alias("splus"),
        (F.round("sminus", 6) + F.lit(0.0)).alias("sminus"),
        "alarm",
    ).orderBy("batch_id")


from dataquality_ml_spark.queries import _STOP_SQL as _STOP_SQL13  # noqa: E402


@register(
    "quality_score_fixed_weights_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text, trim(lower(nfc_normalize(text))) AS norm,
             string_split_regex(trim(lower(nfc_normalize(text))), '\\s+') AS t
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             CAST(len(t) AS DOUBLE) AS n_tokens,
             ROUND((length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')))
                   / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
             ROUND((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                   / CAST(length(text) AS DOUBLE), 4) AS digit_ratio,
             ROUND(len(list_filter(t, w -> w IN ({_STOP_SQL13})))
                   / CAST(len(t) AS DOUBLE), 4) AS stopword_frac,
             ROUND((length(norm) - (len(t) - 1)) / CAST(len(t) AS DOUBLE), 4) AS avg_token_len
      FROM toks
      WHERE len(t) > 0 AND length(text) > 0
    ),
    z AS (
      SELECT doc_id,
             0.4 + 0.9 * ((n_tokens - 60.0) / 40.0)
                 + -1.2 * ((punct_ratio - 0.05) / 0.04)
                 + -0.8 * ((digit_ratio - 0.05) / 0.05)
                 + 0.7 * ((stopword_frac - 0.35) / 0.15)
                 + -0.3 * ((avg_token_len - 5.0) / 1.2) AS z
      FROM f
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-z)), 6) + 0 AS prob_hq,
           CAST(1.0 / (1.0 + exp(-z)) > 0.5 AS INT) AS pred_hq
    FROM z ORDER BY doc_id
    """,
)
def quality_score_fixed_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier SCORING path under frozen weights (round 13,
    VERDICT item 6): the exact featurization + standardize + sigmoid
    pipeline ``score_quality`` runs — five text statistics, per-feature
    (f-mu)/sd, weighted sum, logistic — with the fitted coefficients
    replaced by FIXED literals, so the entire serving path is
    SQL-expressible and HASH-gated end-to-end (the same
    weights-as-literals pattern pca_ae_anomalies uses for the AE). The
    L-BFGS solve itself remains the only unverified stage of
    ``quality_classifier_docs``; separation quality is pinned by the
    planted-junk tests."""
    from dataquality_ml_spark.ml.mllib_pipeline import (
        _QUALITY_FEATURE_COLS,
        _quality_features,
    )
    from dataquality_ml_spark.functions.scalar import pre_normalized
    from dataquality_ml_spark.queries import _docs_nfc

    # (mu, sd, w) per feature in _QUALITY_FEATURE_COLS order + intercept:
    # plausible fitted-model constants, shared verbatim with the oracle
    params = {
        "n_tokens": (60.0, 40.0, 0.9),
        "punct_ratio": (0.05, 0.04, -1.2),
        "digit_ratio": (0.05, 0.05, -0.8),
        "stopword_frac": (0.35, 0.15, 0.7),
        "avg_token_len": (5.0, 1.2, -0.3),
    }
    with pre_normalized():
        feats = _quality_features(_docs_nfc(spark, sf_dir))
    for c in _QUALITY_FEATURE_COLS:
        feats = feats.where(F.col(c).isNotNull() & ~F.isnan(F.col(c)))
    z = F.lit(0.4)
    for c in _QUALITY_FEATURE_COLS:
        mu, sd, w = params[c]
        z = z + F.lit(w) * ((F.col(c) - F.lit(mu)) / F.lit(sd))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        (F.round(prob, 6) + F.lit(0.0)).alias("prob_hq"),
        (prob > F.lit(0.5)).cast("int").alias("pred_hq"),
    ).orderBy("doc_id")


@register(
    "prefix_filter_jaccard_docs",
    oracle=f"""
    WITH {_TOKS_CTE},
    {_SH_CTE},
    ex AS (
      SELECT doc_id, len(shs) AS n,
             CAST('0x' || substr(md5(unnest(shs)), 1, 8) AS BIGINT) AS s
      FROM sh
    ),
    dfreq AS (SELECT s, COUNT(*) AS dfc FROM ex GROUP BY 1),
    pos AS (
      SELECT e.doc_id, e.n, e.s,
             ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY d.dfc, e.s)
               AS pos
      FROM ex e JOIN dfreq d USING (s)
    ),
    pref AS (
      SELECT * FROM pos
      WHERE pos <= n - (800000 * n + 999999) // 1000000 + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n AS n_a, b.n AS n_b
      FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id
      WHERE 1000000 * LEAST(a.n, b.n) >= 800000 * GREATEST(a.n, b.n)
    ),
    inter AS (
      SELECT c.id_a, c.id_b, c.n_a, c.n_b, COUNT(*) AS n_inter
      FROM cand c
      JOIN ex ea ON ea.doc_id = c.id_a
      JOIN ex eb ON eb.doc_id = c.id_b AND eb.s = ea.s
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           ROUND(n_inter / CAST(n_a + n_b - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter
    WHERE ROUND(n_inter / CAST(n_a + n_b - n_inter AS DOUBLE), 4) >= 0.8
    ORDER BY id_a, id_b
    """,
)
def prefix_filter_jaccard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs/PPJoin prefix-filtered exact-Jaccard self-join (round 13):
    candidates come from each doc's RAREST ``n - ceil(t*n) + 1`` shingles
    under the global df-asc order, not from the full inverted index — the
    canonical set-similarity-join strategy that removes the hot-shingle
    quadratic risk ``ngram_jaccard_pairs`` must cap, at zero recall loss
    (the prefix lemma is exact, unlike LSH banding).  Hash-gated against
    a DuckDB replica of the full pipeline (same md5 token hash, same
    integer prefix arithmetic) and differentially tested equal to the
    full-index form in tests/test_round13_ops.py."""
    from dataquality_ml_spark.operators import dedup as dd13

    return dd13.prefix_filter_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=5, threshold=0.8
    )


def _lpa_oracle(iters: int = 4) -> str:
    """Unrolled synchronous label propagation over the sorted-
    neighborhood candidate graph — one MATERIALIZED CTE per iteration
    (same anti-inlining discipline as _pagerank_oracle), argmax via
    ROW_NUMBER (count desc, label asc) mirroring the engine's
    min-struct tie-break."""
    parts = [
        """norm AS (
      SELECT doc_id, trim(lower(nfc_normalize(text))) AS nt FROM documents
    ),
    keyed AS (SELECT doc_id, substr(nt, 1, 24) AS k FROM norm),
    ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS r
      FROM keyed
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ranked a JOIN ranked b ON b.r > a.r AND b.r - a.r <= 3
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM sym)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""l{t} AS MATERIALIZED (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl)
                 AS rn
        FROM (
          SELECT node, lbl, COUNT(*) AS c FROM (
            SELECT e.src AS node, l.lbl AS lbl
            FROM sym e JOIN l{t - 1} l ON l.node = e.dst
            UNION ALL
            SELECT node, lbl FROM l{t - 1}
          ) v GROUP BY 1, 2
        ) g
      ) r WHERE rn = 1
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT node, lbl AS community FROM l{iters} ORDER BY node
    """
    )


@register("label_prop_communities_docs", oracle=_lpa_oracle())
def label_prop_communities_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities in the sorted-neighborhood candidate
    graph (round 13, 4 synchronous iterations, self-vote, deterministic
    ties): the soft-clustering complement to the connected-components
    dedup clusters — one bridge edge fuses two template families under
    CC, but under LPA a label must win each node's neighborhood
    majority, so dense groups stay separate. Same candidate graph as
    pagerank_dup_candidates_docs; oracle unrolls the same 4 iterations
    as MATERIALIZED CTEs."""
    from dataquality_ml_spark.functions.scalar import normalize_text
    from dataquality_ml_spark.operators import dedup as ddl
    from dataquality_ml_spark.operators import graph as gr13

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring(normalize_text("text"), 1, 24).alias("__k")
    )
    pairs = ddl.sorted_neighborhood_pairs(docs, "__k", window=3).select(
        "id_a", "id_b"
    )
    return gr13.label_propagation(pairs, iterations=4).orderBy("node")


@register(
    "ewma_control_by_type_events",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n, AVG(value) AS m
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    p AS (
      SELECT event_type, d, n, m,
             AVG(m) OVER (PARTITION BY event_type) AS mu0,
             STDDEV_SAMP(m) OVER (PARTITION BY event_type) AS s0,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                  AS DOUBLE) AS t
      FROM cells
    ),
    c AS (
      SELECT *,
             SUM(m / pow(0.8, t)) OVER (PARTITION BY event_type ORDER BY t
                                        ROWS UNBOUNDED PRECEDING) AS cq
      FROM p
    ),
    z AS (
      SELECT event_type, t, n, m,
             pow(0.8, t) * (mu0 + 0.2 * cq) AS ewma,
             mu0 - 3.0 * s0 * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * t))) AS lcl,
             mu0 + 3.0 * s0 * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * t))) AS ucl
      FROM c
    )
    SELECT event_type, CAST(t - 1 AS BIGINT) AS batch_id, n,
           ROUND(m, 6) + 0 AS mean,
           ROUND(ewma, 6) + 0 AS ewma,
           ROUND(lcl, 6) + 0 AS lcl,
           ROUND(ucl, 6) + 0 AS ucl,
           COALESCE(CAST(ewma < lcl OR ewma > ucl AS INT), 0) AS ooc
    FROM z ORDER BY event_type, batch_id
    """,
)
def ewma_control_by_type_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment EWMA control chart at daily granularity (round 13):
    one independent chart per event type — the small-persistent-shift
    monitor that completes the panel between the Shewhart-style outlier
    faces and the CUSUM level-shift family. Whole chart is ONE pass via
    the closed-form prefix identity z_t = r^t(mu + lambda*sum m_i/r^i);
    exact variance-inflation limits, not the asymptotic band. Every
    window is key-partitioned (NO unpartitioned window anywhere, same
    contract as cusum_by_type_events)."""
    from dataquality_ml_spark.operators import drift as dr13b

    ev = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    sliced = ev.withColumn(
        "__day", F.to_date(F.date_trunc("day", F.col("ts")))
    ).where(F.col("__day").isNotNull())
    out = dr13b.ewma_control(
        sliced, "__day", "value", lam=0.2, nsigma=3.0, keys=["event_type"]
    )
    return out.select(
        "event_type",
        "batch_id",
        "n",
        (F.round("mean", 6) + F.lit(0.0)).alias("mean"),
        (F.round("ewma", 6) + F.lit(0.0)).alias("ewma"),
        (F.round("lcl", 6) + F.lit(0.0)).alias("lcl"),
        (F.round("ucl", 6) + F.lit(0.0)).alias("ucl"),
        "ooc",
    ).orderBy("event_type", "batch_id")


def _acf_oracle(max_lag: int = 7) -> str:
    leads = ",\n             ".join(
        f"LEAD(d0, {k}) OVER (PARTITION BY event_type ORDER BY d) AS d{k}"
        for k in range(1, max_lag + 1)
    )
    nums = ",\n             ".join(
        f"SUM(d0 * d{k}) AS num{k}" for k in range(1, max_lag + 1)
    )
    unions = "\n      UNION ALL ".join(
        f"SELECT event_type, T, {k} AS lag, num{k} / den AS rho FROM a"
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH cells AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             AVG(value) AS m
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    dv AS (
      SELECT event_type, d,
             m - AVG(m) OVER (PARTITION BY event_type) AS d0
      FROM cells
    ),
    led AS (
      SELECT event_type, d0,
             {leads}
      FROM dv
    ),
    a AS (
      SELECT event_type, COUNT(*) AS T, SUM(d0 * d0) AS den,
             {nums}
      FROM led GROUP BY 1
    ),
    r AS (
      {unions}
    )
    SELECT event_type, lag, T AS n_batches,
           ROUND(rho, 6) + 0 AS rho,
           ROUND(T * (T + 2) * SUM(rho * rho / (T - lag))
                 OVER (PARTITION BY event_type ORDER BY lag
                       ROWS UNBOUNDED PRECEDING), 6) + 0 AS q_lb
    FROM r ORDER BY event_type, lag
    """


@register("acf_by_type_events", oracle=_acf_oracle())
def acf_by_type_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment autocorrelation + Ljung-Box panel of the daily mean
    series (round 13, lags 1..7): the serial-dependence diagnostic that
    says whether the control-chart family's independence assumptions
    hold per event type, and exposes weekly seasonality as a lag-7
    spike. All 7 lead columns come from ONE key-partitioned window
    pass; no unpartitioned window anywhere."""
    from dataquality_ml_spark.operators import drift as dr13c

    ev = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    sliced = ev.withColumn(
        "__day", F.to_date(F.date_trunc("day", F.col("ts")))
    ).where(F.col("__day").isNotNull())
    out = dr13c.acf_ljung_box(
        sliced, "__day", "value", max_lag=7, keys=["event_type"]
    )
    return out.select(
        "event_type",
        "lag",
        "n_batches",
        (F.round("rho", 6) + F.lit(0.0)).alias("rho"),
        (F.round("q_lb", 6) + F.lit(0.0)).alias("q_lb"),
    ).orderBy("event_type", "lag")


@register(
    "anova_value_by_type",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_k,
             SUM(value) AS s_k, SUM(value * value) AS ss_k
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_type IS NOT NULL
      GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n_k) AS BIGINT) AS N, CAST(COUNT(*) AS BIGINT) AS g,
             SUM(s_k) AS S, SUM(ss_k) AS SS, SUM(s_k * s_k / n_k) AS A
      FROM cells
    )
    SELECT N AS n, g AS n_groups,
           ROUND(((A - S * S / N) / (g - 1))
                 / ((SS - A) / (N - g)), 6) + 0 AS f_stat,
           g - 1 AS df1, N - g AS df2,
           ROUND((A - S * S / N) / (SS - S * S / N), 6) + 0 AS eta_sq
    FROM t
    """,
)
def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA omnibus F across event types (round 13): the
    multiple-testing gate in front of the pairwise drift family — one
    statistic for "do segment means differ at all", with eta² effect
    size. One grouped agg to the bounded per-type relation, one
    reduce."""
    from dataquality_ml_spark.operators.evaluate import anova_oneway

    out = anova_oneway(_t(spark, sf_dir, "events"), "event_type", "value")
    return out.select(
        "n",
        "n_groups",
        (F.round("f_stat", 6) + F.lit(0.0)).alias("f_stat"),
        "df1",
        "df2",
        (F.round("eta_sq", 6) + F.lit(0.0)).alias("eta_sq"),
    )


@register(
    "kruskal_value_by_type",
    oracle="""
    WITH valid AS (
      SELECT event_type AS k, value AS v FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_type IS NOT NULL
    ),
    vals AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM valid GROUP BY 1),
    ranked AS (
      SELECT v, t,
             COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                      PRECEDING AND 1 PRECEDING), 0) AS cl
      FROM vals
    ),
    cells AS (
      SELECT k, v, CAST(COUNT(*) AS BIGINT) AS n_kv FROM valid GROUP BY 1, 2
    ),
    gk AS (
      SELECT c.k, SUM(c.n_kv) AS n_k,
             SUM(c.n_kv * (r.cl + (r.t + 1) / 2.0)) AS rk
      FROM cells c JOIN ranked r USING (v) GROUP BY 1
    ),
    tie AS (SELECT SUM(t * t * t - t) AS t3 FROM vals),
    tot AS (
      SELECT CAST(SUM(n_k) AS BIGINT) AS N, CAST(COUNT(*) AS BIGINT) AS g,
             SUM(rk * rk / n_k) AS s
      FROM gk
    )
    SELECT N AS n, g AS n_groups, g - 1 AS df1,
           ROUND(12.0 / (N * (N + 1)) * s - 3 * (N + 1), 6) + 0 AS h_stat,
           ROUND(1.0 - t3 / (CAST(N AS DOUBLE) * N * N - N), 6) + 0
             AS tie_correction,
           ROUND((12.0 / (N * (N + 1)) * s - 3 * (N + 1))
                 / (1.0 - t3 / (CAST(N AS DOUBLE) * N * N - N)), 6) + 0
             AS h_adj
    FROM tot, tie
    """,
)
def kruskal_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank omnibus across event types (round 13): the
    distribution-free companion to anova_value_by_type. Midranks via
    the distributed exclusive prefix sum over the distinct-value
    relation — no global sort, no unpartitioned window."""
    from dataquality_ml_spark.operators.evaluate import kruskal_wallis

    out = kruskal_wallis(_t(spark, sf_dir, "events"), "event_type", "value")
    return out.select(
        "n",
        "n_groups",
        "df1",
        (F.round("h_stat", 6) + F.lit(0.0)).alias("h_stat"),
        (F.round("tie_correction", 6) + F.lit(0.0)).alias("tie_correction"),
        (F.round("h_adj", 6) + F.lit(0.0)).alias("h_adj"),
    )


from dataquality_ml_spark.queries import _TOKS_CTE as _TOKS_CTE13  # noqa: E402


@register(
    "good_turing_unseen_docs",
    oracle=f"""
    WITH {_TOKS_CTE13},
    w AS (SELECT unnest(t) AS w FROM toks),
    tf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM w GROUP BY 1),
    ff AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tf GROUP BY 1),
    tot AS (SELECT SUM(r * n_r) AS N FROM ff)
    SELECT a.r, a.n_r,
           ROUND((a.r + 1) * b.n_r / CAST(a.n_r AS DOUBLE), 6) + 0 AS r_star,
           ROUND(a.r * a.n_r / CAST(tot.N AS DOUBLE), 6) + 0 AS token_share
    FROM ff a
    LEFT JOIN ff b ON b.r = a.r + 1
    CROSS JOIN tot
    WHERE a.r <= 10
    ORDER BY a.r
    """,
)
def good_turing_unseen_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies panel over the documents
    corpus (round 13): row r=1's token_share is the unseen-token-mass
    estimate N1/N, r_star the smoothed band counts — the vocab-budget
    diagnostic complementing chao1 (unseen CONTENT) and vocab_growth
    (seen trajectory). Equi-join on the freq-of-freq relation; no
    global window."""
    from dataquality_ml_spark.operators import text as tx13

    out = tx13.good_turing_panel(
        _t(spark, sf_dir, "documents"), max_r=10
    )
    return out.select(
        "r",
        "n_r",
        (F.round("r_star", 6) + F.lit(0.0)).alias("r_star"),
        (F.round("token_share", 6) + F.lit(0.0)).alias("token_share"),
    ).orderBy("r")


@register(
    "fdr_ks_panel_by_type",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value AS v, 1 AS in_a FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
      UNION ALL
      SELECT event_type, value AS v, 0 AS in_a FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT_TS}' AND value IS NOT NULL
    ),
    per_v AS (
      SELECT event_type, v, SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b
      FROM tagged GROUP BY event_type, v
    ),
    cdf AS (
      SELECT event_type,
             SUM(n_a) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / CAST(SUM(n_a) OVER (PARTITION BY event_type) AS DOUBLE) AS cdf_a,
             SUM(n_b) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / CAST(SUM(n_b) OVER (PARTITION BY event_type) AS DOUBLE) AS cdf_b,
             SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
             SUM(n_b) OVER (PARTITION BY event_type) AS tot_b
      FROM per_v
    ),
    ks AS (
      SELECT event_type, MAX(ABS(cdf_a - cdf_b)) AS d,
             MAX(tot_a) AS na, MAX(tot_b) AS nb
      FROM cdf GROUP BY event_type
    ),
    panel AS (
      SELECT event_type, d,
             LEAST(1.0, 2 * EXP(-2 * pow(
               d * sqrt(na * nb / CAST(na + nb AS DOUBLE)), 2))) AS p
      FROM ks
    ),
    rankd AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY p) AS j,
             COUNT(*) OVER () AS m
      FROM panel
    ),
    qv AS (
      SELECT *, LEAST(1.0, MIN(p * m / j) OVER (ORDER BY j DESC
                    ROWS UNBOUNDED PRECEDING)) AS q
      FROM rankd
    )
    SELECT event_type,
           ROUND(d, 6) + 0 AS ks_d,
           ROUND(p, 6) + 0 AS p_raw,
           ROUND(q, 6) + 0 AS q_value
    FROM qv ORDER BY event_type
    """,
)
def fdr_ks_panel_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR closure of the per-type KS drift panel
    (round 13): a k-segment drift report tested at alpha raises ~k*alpha
    false alarms; this face attaches the Smirnov-approximate p-value
    p = min(1, 2 exp(-2 lambda^2)) to each segment's D and BH-adjusts
    across the panel — q_value is what a paging rule should threshold,
    not p. The BH windows run over the bounded per-event-type panel
    (allowlisted bounded-window class); the KS statistics themselves
    come from the keyed prefix-sum engine with no unpartitioned
    window."""
    from dataquality_ml_spark.operators import drift as dr
    from dataquality_ml_spark.operators.evaluate import fdr_bh

    ks = dr.ks_by_group(
        None, None, "value", keys=["event_type"],
        ecdf=_events_ecdf_by_type(spark, sf_dir),
    )
    lam = F.col("ks_d") * F.sqrt(
        F.col("n_a") * F.col("n_b") / (F.col("n_a") + F.col("n_b"))
    )
    panel = ks.select(
        "event_type",
        "ks_d",
        F.least(
            F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * lam * lam)
        ).alias("p_raw"),
    )
    out = fdr_bh(panel, "p_raw")
    return out.select(
        "event_type",
        (F.round("ks_d", 6) + F.lit(0.0)).alias("ks_d"),
        (F.round("p_raw", 6) + F.lit(0.0)).alias("p_raw"),
        (F.round("q_value", 6) + F.lit(0.0)).alias("q_value"),
    ).orderBy("event_type")


@register(
    "ndcg_ivf_vs_exact",
    oracle=f"""
    WITH {{IVF_CTES}},
    bf_scored AS (
      SELECT q2.query_id, c2.neighbor_id, ROUND(
        list_dot_product(q2.qv, c2.cv)
        / (sqrt(list_dot_product(q2.qv, q2.qv))
           * sqrt(list_dot_product(c2.cv, c2.cv))), 4) + 0 AS sim
      FROM (SELECT vec_id AS query_id, emb AS qv FROM vecs WHERE vec_id < 10) q2,
           (SELECT vec_id AS neighbor_id, emb AS cv FROM vecs) c2
      WHERE c2.neighbor_id != q2.query_id
    ),
    bf AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM bf_scored
      ) WHERE rank <= 5
    ),
    ivf AS (
      SELECT query_id, neighbor_id, rank FROM ivf_ranked WHERE rank <= 5
    ),
    dcg AS (
      SELECT i.query_id,
             SUM(COALESCE(6 - b.rank, 0) / log2(i.rank + 1)) AS dcg
      FROM ivf i LEFT JOIN bf b
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
      GROUP BY 1
    ),
    idcg AS (
      SELECT query_id, SUM((6 - rank) / log2(rank + 1)) AS idcg
      FROM bf GROUP BY 1
    ),
    mrr AS (
      SELECT b.query_id, COALESCE(MAX(1.0 / i.rank), 0) AS mrr
      FROM bf b LEFT JOIN ivf i
        ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
      WHERE b.rank = 1 GROUP BY 1
    )
    SELECT x.query_id,
           ROUND(COALESCE(d.dcg, 0), 6) + 0 AS dcg,
           ROUND(x.idcg, 6) + 0 AS idcg,
           ROUND(COALESCE(d.dcg, 0) / x.idcg, 6) + 0 AS ndcg,
           ROUND(m.mrr, 6) + 0 AS mrr
    FROM idcg x
    LEFT JOIN dcg d ON d.query_id = x.query_id
    LEFT JOIN mrr m ON m.query_id = x.query_id
    ORDER BY x.query_id
    """.replace("{IVF_CTES}", _IVF_NPROBE2_CTES),
)
def ndcg_ivf_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 + MRR of multi-probe IVF against the exact brute-force
    ranking, per query (round 13): the graded ORDER-aware companion to
    ivf_recall_at_k — recall says the right neighbors came back, NDCG
    says they came back in the right order, MRR says where the single
    best neighbor landed. Same registered operators on both sides; the
    comparison is two (query x k)-sized equi-joins."""
    from dataquality_ml_spark.operators import similarity as sim13

    emb = _t(spark, sf_dir, "embeddings")
    cents = sim13.centroids_by_label(emb)
    q = _queries_vecs(spark, sf_dir)
    bf = sim13.knn_bruteforce(emb, q, k=5)
    ivf = sim13.knn_ivf(emb, q, cents, k=5, nprobe=2)
    out = sim13.ranking_quality(bf, ivf, k=5)
    return out.select(
        "query_id",
        (F.round("dcg", 6) + F.lit(0.0)).alias("dcg"),
        (F.round("idcg", 6) + F.lit(0.0)).alias("idcg"),
        (F.round("ndcg", 6) + F.lit(0.0)).alias("ndcg"),
        (F.round("mrr", 6) + F.lit(0.0)).alias("mrr"),
    ).orderBy("query_id")


@register(
    "ewma_stream_replay_events",
    oracle="""
    WITH mu AS (
      SELECT ROUND(AVG(value), 6) AS mu0 FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n, AVG(value) AS m
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1
    ),
    sg AS (SELECT ROUND(STDDEV_SAMP(m), 6) AS s0 FROM cells),
    p AS (
      SELECT d, n, m,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS t
      FROM cells
    ),
    c AS (
      SELECT *, SUM(m / pow(0.8, t)) OVER (ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS cq
      FROM p
    ),
    z AS (
      SELECT t, n, m,
             pow(0.8, t) * (mu.mu0 + 0.2 * cq) AS ewma,
             mu.mu0 - 3.0 * sg.s0
               * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * t))) AS lcl,
             mu.mu0 + 3.0 * sg.s0
               * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * t))) AS ucl
      FROM c, mu, sg
    )
    SELECT CAST(t - 1 AS BIGINT) AS batch_id, n,
           ROUND(m, 6) + 0 AS mean,
           ROUND(ewma, 6) + 0 AS ewma,
           ROUND(lcl, 6) + 0 AS lcl,
           ROUND(ucl, 6) + 0 AS ucl,
           CAST(ewma < lcl OR ewma > ucl AS INT) AS ooc
    FROM z ORDER BY batch_id
    """,
)
def ewma_stream_replay_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EWMA control chart, replayed (round 13): the PRODUCTION
    foreachBatch fold (streaming.score_stream._ewma_monitor_fold —
    z = lambda*m + (1-lambda)*z vs the frozen training reference, exact
    variance-inflation limits) driven over WEEKLY micro-batch slices of
    events, hash-gated against the closed-form prefix identity
    z_t = r^t(mu0 + lambda*sum m_i/r^i) in SQL — same replay contract
    as cusum_stream_replay_events; per batch exactly two scalars cross
    to the driver. The daily-granularity batch face is
    ewma_control_by_type_events."""
    from dataquality_ml_spark.streaming import score_stream as ss13

    ev = _t(spark, sf_dir, "events")
    mu0 = round(
        ev.where(F.col("value").isNotNull()).agg(F.avg("value")).first()[0], 6
    )
    sliced = ev.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).withColumn("__wk", F.to_date(F.date_trunc("week", F.col("ts"))))
    sigma0 = round(
        sliced.groupBy("__wk")
        .agg(F.avg("value").alias("m"))
        .agg(F.stddev_samp("m"))
        .first()[0],
        6,
    )
    out = ss13.ewma_monitor_replay(
        sliced, "__wk", mu0, sigma0, "value", lam=0.2, nsigma=3.0
    )
    return out.select(
        "batch_id",
        "n",
        (F.round("mean", 6) + F.lit(0.0)).alias("mean"),
        (F.round("ewma", 6) + F.lit(0.0)).alias("ewma"),
        (F.round("lcl", 6) + F.lit(0.0)).alias("lcl"),
        (F.round("ucl", 6) + F.lit(0.0)).alias("ucl"),
        "ooc",
    ).orderBy("batch_id")


@register(
    "cluster_bootstrap_user_value",
    oracle="""
    WITH base AS (
      SELECT CAST(user_id AS BIGINT) AS i, CAST(value AS DOUBLE) AS x
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value) AND user_id IS NOT NULL
    ),
    ex AS (
      SELECT i, x, CAST(g.range AS BIGINT) AS b FROM base, range(64) g
    ),
    halves AS (
      SELECT b, x, (i % 4294967296) AS lo, (i >> 32) AS hi FROM ex
    ),
    pm1 AS (
      SELECT b, x, hi,
             (lo * 1103515245 + hi * 1597334677 + 12345) % 4294967296 AS p
      FROM halves
    ),
    pm2 AS (SELECT b, x, hi, xor(p, p >> 16) AS p FROM pm1),
    pm3 AS (SELECT b, x, (p * 1597334677 + hi) % 4294967296 AS p FROM pm2),
    pm4 AS (SELECT b, x, xor(p, p >> 13) AS p FROM pm3),
    mix AS (
      SELECT b, x, (p + (b + 1) * 1046527) % 4294967296 AS s FROM pm4
    ),
    m1 AS (SELECT b, x, (s * 1103515245 + 12345) % 4294967296 AS h FROM mix),
    m2 AS (SELECT b, x, xor(h, h >> 16) AS h FROM m1),
    m3 AS (SELECT b, x, (h * 1597334677) % 4294967296 AS h FROM m2),
    uw AS (
      SELECT b, x, xor(h, h >> 16) / 4294967296.0 AS u FROM m3
    ),
    w AS (
      SELECT b, x, CASE
        WHEN u < 0.36787944117144233 THEN 0
        WHEN u < 0.7357588823428847 THEN 1
        WHEN u < 0.9196986029286058 THEN 2
        WHEN u < 0.9810118431238463 THEN 3
        WHEN u < 0.9963401531726563 THEN 4
        WHEN u < 0.9994058151824183 THEN 5
        WHEN u < 0.999916758850712 THEN 6
        WHEN u < 0.9999897508033253 THEN 7
        WHEN u < 0.999998874797402 THEN 8
        WHEN u < 0.9999998885745216 THEN 9
        ELSE 10 END AS w
      FROM uw
    ),
    reps AS (
      SELECT b, SUM(w * x) / SUM(w) AS mean_b FROM w GROUP BY b
      HAVING SUM(w) > 0
    ),
    ci AS (
      SELECT quantile_cont(mean_b, 0.025) AS boot_lo,
             quantile_cont(mean_b, 0.5) AS boot_median,
             quantile_cont(mean_b, 0.975) AS boot_hi
      FROM reps
    )
    SELECT CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n,
           ROUND((SELECT AVG(x) FROM base), 6) + 0 AS mean,
           ROUND(boot_lo, 6) + 0 AS boot_lo,
           ROUND(boot_median, 6) + 0 AS boot_median,
           ROUND(boot_hi, 6) + 0 AS boot_hi,
           CAST(64 AS INT) AS n_boot
    FROM ci
    """,
)
def cluster_bootstrap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER (grouped) bootstrap CI of the mean event value (round
    13): the Poisson weight is drawn from the USER id, so each user's
    events resample together — the correct interval when rows within a
    user are correlated; the row-level bootstrap_mean_ci_events
    understates grouped variance by treating within-user copies as
    independent. Same one-scan Poissonization engine, same portable
    integer mixer, whole bootstrap bit-replayed in DuckDB."""
    from dataquality_ml_spark.operators import evaluate as ev13c

    out = ev13c.poisson_bootstrap_ci(
        _t(spark, sf_dir, "events"), "value", "event_id",
        n_boot=64, alpha=0.05, group_col="user_id",
    )
    return out.select(
        "n",
        (F.round("mean", 6) + F.lit(0.0)).alias("mean"),
        (F.round("boot_lo", 6) + F.lit(0.0)).alias("boot_lo"),
        (F.round("boot_median", 6) + F.lit(0.0)).alias("boot_median"),
        (F.round("boot_hi", 6) + F.lit(0.0)).alias("boot_hi"),
        "n_boot",
    )


@register(
    "mmd_embeddings_halves",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    ),
    xr AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS r, e AS vx
      FROM v WHERE vec_id % 2 = 0
    ),
    yr AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS r, e AS vy
      FROM v WHERE vec_id % 2 = 1
    ),
    p AS (SELECT xr.r, vx, vy FROM xr JOIN yr ON yr.r = xr.r),
    t1 AS (
      SELECT r // 2 AS q, vx AS x1, vy AS y1 FROM p WHERE r % 2 = 0
    ),
    t2 AS (
      SELECT (r - 1) // 2 AS q, vx AS x2, vy AS y2 FROM p WHERE r % 2 = 1
    ),
    hq AS (
      SELECT
        exp(-(list_dot_product(x1, x1) - 2 * list_dot_product(x1, x2)
              + list_dot_product(x2, x2)) / 2.0)
      + exp(-(list_dot_product(y1, y1) - 2 * list_dot_product(y1, y2)
              + list_dot_product(y2, y2)) / 2.0)
      - exp(-(list_dot_product(x1, x1) - 2 * list_dot_product(x1, y2)
              + list_dot_product(y2, y2)) / 2.0)
      - exp(-(list_dot_product(x2, x2) - 2 * list_dot_product(x2, y1)
              + list_dot_product(y1, y1)) / 2.0) AS h
      FROM t1 JOIN t2 USING (q)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_quads,
           ROUND(AVG(h), 6) + 0 AS mmd2,
           ROUND(sqrt(var_samp(h) / COUNT(*)), 6) + 0 AS se,
           ROUND(CASE WHEN var_samp(h) > 0
                 THEN AVG(h) / sqrt(var_samp(h) / COUNT(*)) END, 6) + 0 AS z
    FROM hq
    """,
)
def mmd_embeddings_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-time kernel MMD two-sample test between the even/odd
    vec_id halves of the embeddings table (round 13, RBF sigma^2 = 1 —
    the corpus's own mean pair distance scale): the moment-free drift
    test per-dimension profiles and centroid timelines can't replace.
    Identical halves of one corpus => z near 0 (the calibration check);
    a drifted serving window replaces one side in production. Ranks
    from the distributed prefix-sum engine, quadruples by equi-join —
    no global window, O(m d) total."""
    from dataquality_ml_spark.operators import similarity as sim13b

    emb = _t(spark, sf_dir, "embeddings")
    x = emb.where(F.col("vec_id") % 2 == 0)
    y = emb.where(F.col("vec_id") % 2 == 1)
    out = sim13b.mmd_linear(x, y, sigma2=1.0)
    return out.select(
        "n_quads",
        (F.round("mmd2", 6) + F.lit(0.0)).alias("mmd2"),
        (F.round("se", 6) + F.lit(0.0)).alias("se"),
        (F.round("z", 6) + F.lit(0.0)).alias("z"),
    )


@register(
    "bootstrap_ci_by_type",
    oracle="""
    WITH base AS (
      SELECT event_type AS k, CAST(event_id AS BIGINT) AS i,
             CAST(value AS DOUBLE) AS x
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value) AND event_id IS NOT NULL
        AND event_type IS NOT NULL
    ),
    ex AS (
      SELECT k, i, x, CAST(g.range AS BIGINT) AS b FROM base, range(32) g
    ),
    halves AS (
      SELECT k, b, x, (i % 4294967296) AS lo, (i >> 32) AS hi FROM ex
    ),
    pm1 AS (
      SELECT k, b, x, hi,
             (lo * 1103515245 + hi * 1597334677 + 12345) % 4294967296 AS p
      FROM halves
    ),
    pm2 AS (SELECT k, b, x, hi, xor(p, p >> 16) AS p FROM pm1),
    pm3 AS (SELECT k, b, x, (p * 1597334677 + hi) % 4294967296 AS p FROM pm2),
    pm4 AS (SELECT k, b, x, xor(p, p >> 13) AS p FROM pm3),
    mix AS (
      SELECT k, b, x, (p + (b + 1) * 1046527) % 4294967296 AS s FROM pm4
    ),
    m1 AS (SELECT k, b, x, (s * 1103515245 + 12345) % 4294967296 AS h FROM mix),
    m2 AS (SELECT k, b, x, xor(h, h >> 16) AS h FROM m1),
    m3 AS (SELECT k, b, x, (h * 1597334677) % 4294967296 AS h FROM m2),
    uw AS (
      SELECT k, b, x, xor(h, h >> 16) / 4294967296.0 AS u FROM m3
    ),
    w AS (
      SELECT k, b, x, CASE
        WHEN u < 0.36787944117144233 THEN 0
        WHEN u < 0.7357588823428847 THEN 1
        WHEN u < 0.9196986029286058 THEN 2
        WHEN u < 0.9810118431238463 THEN 3
        WHEN u < 0.9963401531726563 THEN 4
        WHEN u < 0.9994058151824183 THEN 5
        WHEN u < 0.999916758850712 THEN 6
        WHEN u < 0.9999897508033253 THEN 7
        WHEN u < 0.999998874797402 THEN 8
        WHEN u < 0.9999998885745216 THEN 9
        ELSE 10 END AS w
      FROM uw
    ),
    reps AS (
      SELECT k, b, SUM(w * x) / SUM(w) AS mean_b FROM w GROUP BY k, b
      HAVING SUM(w) > 0
    ),
    ci AS (
      SELECT k,
             quantile_cont(mean_b, 0.025) AS boot_lo,
             quantile_cont(mean_b, 0.5) AS boot_median,
             quantile_cont(mean_b, 0.975) AS boot_hi
      FROM reps GROUP BY k
    ),
    ov AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n, AVG(x) AS mean
      FROM base GROUP BY k
    )
    SELECT ov.k AS event_type, ov.n,
           ROUND(ov.mean, 6) + 0 AS mean,
           ROUND(ci.boot_lo, 6) + 0 AS boot_lo,
           ROUND(ci.boot_median, 6) + 0 AS boot_median,
           ROUND(ci.boot_hi, 6) + 0 AS boot_hi,
           CAST(32 AS INT) AS n_boot
    FROM ov JOIN ci ON ci.k = ov.k
    ORDER BY event_type
    """,
)
def bootstrap_ci_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Poissonized bootstrap CI panel (round 13): one
    (n, mean, 95% CI) row per event type from the SAME single scan the
    corpus-wide bootstrap rides — replicates group by (type, b),
    quantiles by type over the bounded replicate relation; no window
    anywhere. The panel form a segment drift report wants next to its
    point estimates."""
    from dataquality_ml_spark.operators import evaluate as ev13d

    out = ev13d.poisson_bootstrap_ci(
        _t(spark, sf_dir, "events"), "value", "event_id",
        n_boot=32, alpha=0.05, keys=["event_type"],
    )
    return out.select(
        "event_type",
        "n",
        (F.round("mean", 6) + F.lit(0.0)).alias("mean"),
        (F.round("boot_lo", 6) + F.lit(0.0)).alias("boot_lo"),
        (F.round("boot_median", 6) + F.lit(0.0)).alias("boot_median"),
        (F.round("boot_hi", 6) + F.lit(0.0)).alias("boot_hi"),
        "n_boot",
    ).orderBy("event_type")


@register(
    "source_concentration_docs",
    oracle="""
    WITH cells AS (
      SELECT source, SUM(CAST(n_chars AS DOUBLE)) AS wk
      FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
      GROUP BY 1
    ),
    ranked AS (
      SELECT wk, ROW_NUMBER() OVER (ORDER BY wk DESC) AS rnk FROM cells
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS g, SUM(wk) AS W,
             SUM(wk * wk) AS sq, SUM(wk * ln(wk)) AS slw, MAX(wk) AS w1,
             (SELECT SUM(wk) FROM ranked WHERE rnk <= 4) AS wtop
      FROM cells
    )
    SELECT g AS n_groups,
           ROUND(W, 6) + 0 AS total,
           ROUND(sq / (W * W), 6) + 0 AS hhi,
           ROUND(CASE WHEN g > 1
                 THEN (sq / (W * W) - 1.0 / g) / (1.0 - 1.0 / g)
                 ELSE 1.0 END, 6) + 0 AS hhi_norm,
           ROUND(w1 / W, 6) + 0 AS cr1,
           ROUND(wtop / W, 6) + 0 AS crk,
           ROUND(ln(W) - slw / W, 6) + 0 AS entropy,
           ROUND(CASE WHEN g > 1 THEN (ln(W) - slw / W) / ln(g)
                 ELSE 0.0 END, 6) + 0 AS entropy_norm,
           ROUND(ln(g) - (ln(W) - slw / W), 6) + 0 AS theil
    FROM t
    """,
)
def source_concentration_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix concentration panel over document SOURCES weighted by
    character mass (round 13): HHI, CR-1/CR-4, entropy, and Theil in
    one aggregation — the governance header of a training-mix report
    (complements gini_revenue_customers, which handles high-cardinality
    inequality via distributed ranks; this is the bounded-categorical
    panel with the loud max_groups contract)."""
    from dataquality_ml_spark.operators import profile as prof13

    out = prof13.concentration_panel(
        _t(spark, sf_dir, "documents"), "source", "n_chars", top_k=4
    )
    return out.select(
        "n_groups",
        (F.round("total", 6) + F.lit(0.0)).alias("total"),
        (F.round("hhi", 6) + F.lit(0.0)).alias("hhi"),
        (F.round("hhi_norm", 6) + F.lit(0.0)).alias("hhi_norm"),
        (F.round("cr1", 6) + F.lit(0.0)).alias("cr1"),
        (F.round("crk", 6) + F.lit(0.0)).alias("crk"),
        (F.round("entropy", 6) + F.lit(0.0)).alias("entropy"),
        (F.round("entropy_norm", 6) + F.lit(0.0)).alias("entropy_norm"),
        (F.round("theil", 6) + F.lit(0.0)).alias("theil"),
    )


@register(
    "dup_source_matrix_docs",
    oracle=f"""
    WITH {_TOKS_CTE13},
    sh AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+4], ' ')
           for i in generate_series(1, len(t)-4)]) AS shs
           FROM toks WHERE len(t) >= 5),
    sizes AS (SELECT doc_id, len(shs) AS n_sh FROM sh),
    ex AS (SELECT doc_id, CAST('0x' || substr(md5(unnest(shs)), 1, 15)
                AS BIGINT) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b,
             ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 4)
               AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 4)
            >= 0.8
    )
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(p.jaccard), 6) + 0 AS avg_jaccard
    FROM pairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    GROUP BY 1, 2
    ORDER BY source_a, source_b
    """,
)
def dup_source_matrix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-dup matrix (round 13): the prefix-filtered
    exact-Jaccard pairs folded over the doc->source dimension — which
    source pairs share near-duplicate content (off-diagonal cells are
    the train/benchmark contamination alarms). Two broadcast dimension
    joins + one bounded groupBy on top of the pair relation."""
    from dataquality_ml_spark.operators import dedup as dd13b

    docs = _t(spark, sf_dir, "documents")
    pairs = dd13b.prefix_filter_jaccard_pairs(docs, k=5, threshold=0.8)
    out = dd13b.dup_source_matrix(pairs, docs)
    return out.select(
        "source_a",
        "source_b",
        "n_pairs",
        (F.round("avg_jaccard", 6) + F.lit(0.0)).alias("avg_jaccard"),
    ).orderBy("source_a", "source_b")


@register(
    "ks_matrix_by_type",
    oracle="""
    WITH valid AS (
      SELECT event_type AS k, value AS v FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_type IS NOT NULL
    ),
    cells AS (
      SELECT k,
             LEAST(49, GREATEST(0, CAST(FLOOR((v - 0.0) / 10.0) AS INT)))
               AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM valid GROUP BY 1, 2
    ),
    spine AS (
      SELECT k, CAST(g.range AS INT) AS bin
      FROM (SELECT DISTINCT k FROM cells), range(50) g
    ),
    grid AS (
      SELECT s.k, s.bin, COALESCE(c.n, 0) AS n
      FROM spine s LEFT JOIN cells c ON c.k = s.k AND c.bin = s.bin
    ),
    cdf AS (
      SELECT k, bin,
             SUM(n) OVER (PARTITION BY k) AS tot,
             SUM(n) OVER (PARTITION BY k ORDER BY bin
                          ROWS UNBOUNDED PRECEDING)
               / CAST(SUM(n) OVER (PARTITION BY k) AS DOUBLE) AS cdf
      FROM grid
    )
    SELECT a.k AS key_a, b.k AS key_b,
           CAST(MAX(a.tot) AS BIGINT) AS n_a,
           CAST(MAX(b.tot) AS BIGINT) AS n_b,
           ROUND(MAX(ABS(a.cdf - b.cdf)), 6) + 0 AS ks_d
    FROM cdf a JOIN cdf b ON a.bin = b.bin AND a.k < b.k
    GROUP BY 1, 2
    ORDER BY key_a, key_b
    """,
)
def ks_matrix_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise binned-KS distance matrix across event types (round 13,
    50-cell frozen grid over [0, 500]): WHICH segment pairs differ —
    the stratification/merge decision input the omnibus and two-window
    faces don't give. CDF windows partition by key over the bounded
    spine; pair join is an equi-join on bin; loud max_keys contract on
    the quadratic key count."""
    from dataquality_ml_spark.operators import drift as dr13d

    out = dr13d.ks_matrix_binned(
        _t(spark, sf_dir, "events"), "event_type", "value",
        bins=50, lo=0.0, hi=500.0,
    )
    return out.select(
        "key_a",
        "key_b",
        "n_a",
        "n_b",
        (F.round("ks_d", 6) + F.lit(0.0)).alias("ks_d"),
    ).orderBy("key_a", "key_b")


@register(
    "rolling_origin_events",
    oracle="""
    WITH valid AS (
      SELECT event_id, CAST(FLOOR(epoch(ts)) AS DOUBLE) AS s
      FROM events WHERE ts IS NOT NULL
    ),
    cuts AS (
      SELECT quantile_cont(s, 0.2) AS c1, quantile_cont(s, 0.4) AS c2,
             quantile_cont(s, 0.6) AS c3, quantile_cont(s, 0.8) AS c4,
             quantile_cont(s, 1.0) AS c5
      FROM valid
    ),
    folds AS (
      SELECT 1 AS fold, c1 AS c_lo, c2 AS c_hi FROM cuts
      UNION ALL SELECT 2, c2, c3 FROM cuts
      UNION ALL SELECT 3, c3, c4 FROM cuts
      UNION ALL SELECT 4, c4, c5 FROM cuts
    ),
    assigned AS (
      SELECT f.fold,
             CASE WHEN v.s <= f.c_lo THEN 'train'
                  WHEN v.s <= f.c_hi THEN 'test' END AS role,
             v.s
      FROM valid v CROSS JOIN folds f
    )
    SELECT fold, role,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(s) AS BIGINT) AS min_s,
           CAST(MAX(s) AS BIGINT) AS max_s
    FROM assigned WHERE role IS NOT NULL
    GROUP BY fold, role
    ORDER BY fold, role
    """,
)
def rolling_origin_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) temporal CV assignment over
    events (round 13, 4 folds): fold i trains on everything up to the
    i/5 time quantile and tests on the next quantile slice — the
    backtest protocol; hash folds leak the future for time-ordered
    signal. Face reports per-(fold, role) row counts and the epoch
    bounds, hashing the cutoffs end-to-end."""
    from dataquality_ml_spark.operators import selection as sel13

    ev = _t(spark, sf_dir, "events")
    out = sel13.rolling_origin_assign(ev, "ts", n_folds=4)
    s = F.unix_timestamp(F.col("ts"))
    return (
        out.groupBy("fold", "role")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(s).alias("min_s"),
            F.max(s).alias("max_s"),
        )
        .orderBy("fold", "role")
    )


def _stationary_oracle(iters: int = 16) -> str:
    parts = [
        """seq AS (
      SELECT user_id, event_type AS next_t,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_t
      FROM events
    ),
    m AS (
      SELECT prev_t, next_t, COUNT(*) AS n
      FROM seq WHERE prev_t IS NOT NULL
      GROUP BY prev_t, next_t
    ),
    states AS (
      SELECT DISTINCT prev_t AS s FROM m
      UNION SELECT DISTINCT next_t FROM m
    ),
    tot AS (SELECT prev_t AS s, SUM(n) AS tot FROM m GROUP BY 1),
    p AS MATERIALIZED (
      SELECT m.prev_t AS s, m.next_t AS d, m.n / CAST(t.tot AS DOUBLE) AS p
      FROM m JOIN tot t ON t.s = m.prev_t
      UNION ALL
      SELECT st.s, st.s, 1.0
      FROM states st LEFT JOIN tot ON tot.s = st.s WHERE tot.s IS NULL
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM states),
    pi0 AS MATERIALIZED (SELECT s, 1.0 / nn.n AS pi FROM states, nn)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""pi{t} AS MATERIALIZED (
      SELECT p.d AS s, SUM(pi.pi * p.p) AS pi
      FROM pi{t - 1} pi JOIN p ON p.s = pi.s GROUP BY 1
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT s AS state, ROUND(pi, 6) + 0 AS pi FROM pi{iters} ORDER BY state
    """
    )


@register("event_stationary_dist", oracle=_stationary_oracle())
def event_stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    (round 13, 16 power iterations): the equilibrium share of the event
    stream each type owns — where the journeys event_transition_matrix
    describes eventually settle. Bounded-categorical power method, one
    equi-join + groupBy per iteration; oracle unrolls the same
    iterations as MATERIALIZED CTEs (the pagerank convention)."""
    from dataquality_ml_spark.operators import graph as gr13b

    ev = _t(spark, sf_dir, "events")
    w13 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_t"),
        F.lag("event_type").over(w13).alias("prev_t"),
    )
    m = (
        seq.where(F.col("prev_t").isNotNull())
        .groupBy("prev_t", "next_t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = gr13b.markov_stationary(m, iterations=16)
    return out.select(
        "state", (F.round("pi", 6) + F.lit(0.0)).alias("pi")
    ).orderBy("state")


@register(
    "loso_mean_value_by_type",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_k,
             SUM(CAST(value AS DOUBLE)) AS s_k
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_type IS NOT NULL
      GROUP BY 1
    ),
    t AS (SELECT SUM(n_k) AS N, SUM(s_k) AS S FROM cells)
    SELECT event_type, n_k,
           ROUND(s_k / n_k, 6) + 0 AS mean_k,
           ROUND(CASE WHEN N > n_k THEN (S - s_k) / (N - n_k) END, 6) + 0
             AS mean_without,
           ROUND(CASE WHEN N > n_k THEN (S - s_k) / (N - n_k) - S / N END,
                 6) + 0 AS delta
    FROM cells, t
    ORDER BY event_type
    """,
)
def loso_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-segment-out mean-impact panel over event types (round
    13): the corpus mean without each segment and the delta its removal
    causes — the closed-form ablation ranking a curation decision reads
    before paying for a retrain. One groupBy + one broadcast totals
    join for ALL k leave-one-out corpora."""
    from dataquality_ml_spark.operators import profile as prof13b

    out = prof13b.loso_mean_delta(_t(spark, sf_dir, "events"), "event_type", "value")
    return out.select(
        "event_type",
        "n_k",
        (F.round("mean_k", 6) + F.lit(0.0)).alias("mean_k"),
        (F.round("mean_without", 6) + F.lit(0.0)).alias("mean_without"),
        (F.round("delta", 6) + F.lit(0.0)).alias("delta"),
    ).orderBy("event_type")


@register(
    "welch_matrix_by_type",
    oracle="""
    WITH cells AS (
      SELECT event_type AS k, CAST(COUNT(*) AS BIGINT) AS n,
             AVG(value) AS m, VAR_SAMP(value) AS v
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_type IS NOT NULL
      GROUP BY 1
    ),
    p AS (
      SELECT a.k AS key_a, b.k AS key_b, a.n AS n_a, b.n AS n_b,
             a.m - b.m AS mean_diff,
             a.v / a.n AS sa, b.v / b.n AS sb,
             a.v AS v_a, b.v AS v_b, a.n AS na, b.n AS nb
      FROM cells a JOIN cells b ON a.k < b.k
    )
    SELECT key_a, key_b, n_a, n_b,
           ROUND(mean_diff, 6) + 0 AS mean_diff,
           ROUND(CASE WHEN sa + sb > 0
                 THEN mean_diff / sqrt(sa + sb) END, 6) + 0 AS t_stat,
           ROUND(CASE WHEN sa + sb > 0 AND na > 1 AND nb > 1
                 THEN (sa + sb) * (sa + sb)
                      / (sa * sa / (na - 1) + sb * sb / (nb - 1)) END,
                 6) + 0 AS df_welch,
           ROUND(CASE WHEN ((na - 1) * v_a + (nb - 1) * v_b)
                           / (na + nb - 2) > 0
                 THEN mean_diff / sqrt(((na - 1) * v_a + (nb - 1) * v_b)
                                       / (na + nb - 2)) END, 6) + 0
             AS cohens_d
    FROM p ORDER BY key_a, key_b
    """,
)
def welch_matrix_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Welch t matrix + Cohen's d across event types (round
    13): the mean-focused companion to ks_matrix_by_type — which
    segment PAIRS differ in level, with the effect size big-n t values
    hide. One grouped agg to the bounded per-type cells; the pair join
    is an explicit-broadcast nested loop (never a CartesianProduct),
    loud max_keys contract."""
    from dataquality_ml_spark.operators.evaluate import welch_t_matrix

    out = welch_t_matrix(_t(spark, sf_dir, "events"), "event_type", "value")
    return out.select(
        "key_a",
        "key_b",
        "n_a",
        "n_b",
        (F.round("mean_diff", 6) + F.lit(0.0)).alias("mean_diff"),
        (F.round("t_stat", 6) + F.lit(0.0)).alias("t_stat"),
        (F.round("df_welch", 6) + F.lit(0.0)).alias("df_welch"),
        (F.round("cohens_d", 6) + F.lit(0.0)).alias("cohens_d"),
    ).orderBy("key_a", "key_b")


def _entropy_rate_oracle(iters: int = 16) -> str:
    base = _stationary_oracle(iters)
    final = base.rsplit("SELECT s AS state", 1)[0]
    return (
        final
        + f""",
    hs AS (
      SELECT m.prev_t AS s,
             -SUM((m.n / CAST(t.tot AS DOUBLE))
                  * ln(m.n / CAST(t.tot AS DOUBLE))) AS h_s
      FROM m JOIN tot t ON t.s = m.prev_t
      GROUP BY 1
    ),
    joined AS (
      SELECT p.s, p.pi, COALESCE(hs.h_s, 0.0) AS h_s
      FROM pi{iters} p LEFT JOIN hs ON hs.s = p.s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_states,
           ROUND(SUM(pi * h_s), 6) + 0 AS entropy_rate,
           ROUND(CASE WHEN COUNT(*) > 1
                 THEN SUM(pi * h_s) / ln(COUNT(*)) ELSE 0.0 END, 6) + 0
             AS entropy_rate_norm
    FROM joined
    """
    )


@register("event_entropy_rate", oracle=_entropy_rate_oracle())
def event_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain (round 13):
    how predictable the next event is given the current one — the
    journey-complexity scalar implied by event_transition_matrix +
    event_stationary_dist together; the normalized form is a
    behavioral-anomaly feature (0 = deterministic loop, 1 = uniform
    wandering)."""
    from dataquality_ml_spark.operators import graph as gr13c

    ev = _t(spark, sf_dir, "events")
    w13b = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_t"),
        F.lag("event_type").over(w13b).alias("prev_t"),
    )
    m = (
        seq.where(F.col("prev_t").isNotNull())
        .groupBy("prev_t", "next_t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = gr13c.markov_entropy_rate(m, iterations=16)
    return out.select(
        "n_states",
        (F.round("entropy_rate", 6) + F.lit(0.0)).alias("entropy_rate"),
        (F.round("entropy_rate_norm", 6) + F.lit(0.0)).alias(
            "entropy_rate_norm"
        ),
    )
