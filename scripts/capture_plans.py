"""Capture .explain("formatted") for named queries into plans/$PLANS_ROUND/ (default r14).

Usage: python scripts/capture_plans.py before q1 q2 ...  (suffix = before|after)
With no names, captures the default optimization-target cohort.

Plans are captured at sf0.1 (the bench scale) WITHOUT executing the query
(explain is plan-time), except that some query builders run bounded
driver-side jobs (fits, threshold collects) while constructing the plan —
that is part of their documented shape.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DEFAULT_COHORT = [
    "iforest_anomalies",
    "feature_drift_lineitem",
    "feature_drift_binned_lineitem",
    "feature_drift_mixed_lineitem",
    "pagerank_dup_candidates_docs",
    "unigram_em_counts_docs",
    "simhash_hamming_pairs",
    "linkage_matches_docs",
    "ivf_pq_refine_topk",
    "profile_lineitem",
    "pack_efficiency_compare_docs",
    "event_entropy_rate",
    "event_stationary_dist",
    "ndcg_ivf_vs_exact",
    "minhash_recall_report",
    "sorted_neighborhood_multikey_docs",
    "bpe_oov_by_source",
    "label_prop_communities_docs",
    "prefix_filter_jaccard_docs",
    "spearman_qty_price",
    "mad_outliers_events",
    "median_by_type_day",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_COHORT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(HERE, "plans", os.environ.get("PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    from dataquality_ml_spark import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("dq-capture-plans")
    spark.sparkContext.setLogLevel("OFF")
    qs = entry_mod.queries()

    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"capture_plan:{name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
