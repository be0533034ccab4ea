"""Distribution-drift operators: PSI, two-sample KS, chi-square.

The reference retrains and re-evaluates daily snapshots but never tests
whether today's data still looks like the training data (its only guard is
the threshold refit, reference app/test_AE.py:87-97). Drift checks are the
standard production answer, and at 100 TB they must be aggregation-shaped:
every operator here reduces the input to O(bins) or O(categories) rows in
ONE scan per side before any driver-side math — no sorts of raw rows, no
collect of row data.

- ``psi_bins``: Population Stability Index over fixed equi-width bins.
  Fixed (lo, hi) edges make the result deterministic and engine-portable
  (no data-dependent quantile edges), and mean the whole computation is a
  single groupBy per side over a clamped ``floor((x-lo)/w)`` bucket id.
- ``ks_statistic``: exact two-sample Kolmogorov-Smirnov D. Pre-aggregates
  to one row per distinct value (groupBy), then takes the running-CDF
  difference with a global-order window over those GROUPED rows — the
  window sees |distinct values| rows, not |rows|. For truly unbounded
  domains use ``bins=`` (binned KS): O(bins) rows, sketch-mergeable, the
  100 TB path (D error ≤ bin probability mass).
- ``chi2_independence``: chi-square statistic of independence between two
  categorical columns from the (a, b) contingency counts — one groupBy,
  margins derived with window sums (no second scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6  # proportion clamp so empty bins don't produce ±inf PSI terms


def _bucket(col, lo: float, hi: float, bins: int):
    """Clamped equi-width bin id in [0, bins): outside values land in the
    edge bins, so the bucket expression is total (no null branch)."""
    w = (hi - lo) / bins
    raw = F.floor((col - F.lit(lo)) / F.lit(w)).cast("int")
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))


def _bin_props(df: DataFrame, col: str, lo: float, hi: float, bins: int, out: str) -> DataFrame:
    """(bin, proportion) in one scan: groupBy the bucket id, window-sum the
    per-bin counts into a total (the window runs over ≤``bins`` rows)."""
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(_bucket(F.col(col), lo, hi, bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy()
    return counts.select("bin", (F.col("n") / F.sum("n").over(total)).alias(out))


def psi_bins(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Per-bin PSI decomposition: (bin, p_ref, p_cur, psi_term, psi_total).

    psi_term = (p_cur − p_ref)·ln(p_cur/p_ref) with both proportions
    clamped to ``EPS``; psi_total repeats the sum on every row so a single
    result relation carries both the diagnostic breakdown and the scalar
    (PSI ≳ 0.2 = significant shift, the usual industry reading).

    Cost at any scale: one scan per side → ≤2·bins rows. Missing bins are
    restored from a generated spine so both engines agree on row count.
    """
    spark = ref.sparkSession
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    r = _bin_props(ref, col, lo, hi, bins, "p_ref")
    c = _bin_props(cur, col, lo, hi, bins, "p_cur")
    joined = (
        spine.join(r, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("p_ref", F.lit(0.0)).alias("p_ref"),
            F.coalesce("p_cur", F.lit(0.0)).alias("p_cur"),
        )
    )
    pr = F.greatest(F.col("p_ref"), F.lit(EPS))
    pc = F.greatest(F.col("p_cur"), F.lit(EPS))
    term = (pc - pr) * F.log(pc / pr)
    w = Window.partitionBy()
    return (
        joined.withColumn("psi_term", term)
        .withColumn("psi_total", F.sum("psi_term").over(w))
        .orderBy("bin")
    )


def ks_statistic(
    a: DataFrame,
    b: DataFrame,
    col: str,
    bins: int | None = None,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Two-sample KS distance as a 1-row DataFrame (ks_d, n_a, n_b).

    Exact mode (``bins=None``): union the two sides tagged 0/1, group by
    VALUE first (the decisive scale move: the global-order window then runs
    over distinct values, already shuffled down to one row each), running
    CDFs via cumulative sums, D = max |F_a − F_b| evaluated at every
    distinct value (ECDFs only change there, so this is the true supremum).

    Binned mode: same machinery over ``_bucket`` ids — O(bins) window rows,
    no global sort of data-sized relations; use at 100 TB.
    """
    key = _bucket(F.col(col), lo, hi, bins) if bins else F.col(col)
    a = a.where(F.col(col).isNotNull())
    b = b.where(F.col(col).isNotNull())
    tagged = a.select(key.alias("v"), F.lit(1).alias("in_a")).unionAll(
        b.select(key.alias("v"), F.lit(0).alias("in_a"))
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("in_a").alias("n_a"),
        F.sum(1 - F.col("in_a")).alias("n_b"),
    )
    run = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cdf = per_v.select(
        "v",
        (F.sum("n_a").over(run) / F.sum("n_a").over(tot)).alias("cdf_a"),
        (F.sum("n_b").over(run) / F.sum("n_b").over(tot)).alias("cdf_b"),
        F.sum("n_a").over(tot).alias("tot_a"),
        F.sum("n_b").over(tot).alias("tot_b"),
    )
    return cdf.agg(
        F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))).alias("ks_d"),
        F.max("tot_a").alias("n_a"),
        F.max("tot_b").alias("n_b"),
    )


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Chi-square statistic of independence between two categorical columns
    as a 1-row DataFrame (chi2, dof, n).

    One groupBy builds the contingency table; margins reduce it further and
    cross-join back into the FULL |A|×|B| grid (tiny), so unobserved cells
    still contribute their (0−e)²/e term — dropping them understates chi2
    exactly when dependence is strongest. The raw data is scanned once
    regardless of table size. Expected count e = row_margin·col_margin/n.
    """
    cont = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("o"))
    )
    ma = cont.groupBy(col_a).agg(F.sum("o").alias("ma"))
    mb = cont.groupBy(col_b).agg(F.sum("o").alias("mb"))
    wt = Window.partitionBy()
    full = (
        ma.crossJoin(mb)
        .join(cont, [col_a, col_b], "left")
        .select(
            col_a,
            col_b,
            "ma",
            "mb",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
        .withColumn("n", F.sum("o").over(wt))
        .withColumn("e", F.col("ma") * F.col("mb") / F.col("n"))
    )
    return full.agg(
        F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")).alias("chi2"),
        ((F.count_distinct(F.col(col_a)) - 1) * (F.count_distinct(F.col(col_b)) - 1))
        .cast("bigint")
        .alias("dof"),
        F.max("n").alias("n"),
    )
