"""Face-level scale-exponent harness (VERDICT r12 item 4): run registry
faces at sf0.001 / sf0.01 / sf0.1 and fit the empirical scaling exponent
per face, so "would it survive 100x" is a measurement, not plan-reading.

For each face: min-of-K wall time at each scale factor, then
alpha = log10(t_sf0.1 / t_sf0.01) — the decade step between the two
largest sizes, where fixed per-query overhead (planning, JVM, session)
no longer dominates. t ~ rows^alpha: alpha ~ 1 is linear, <1 means
overhead still amortizing or sublinear reduce shapes, >~1.3 is a
superlinear finding that needs an explanation or a fix.

Run:  python scripts/face_scale_curve.py [face ...]
Defaults to the round-12 top-10 priciest cohort. Prints a markdown table
(paste into NOTES_r13.md) plus one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_FACES = [
    "pagerank_dup_candidates_docs",
    "iforest_anomalies",
    "feature_drift_lineitem",
    "pack_efficiency_compare_docs",
    "linkage_matches_docs",
    "sorted_neighborhood_multikey_docs",
    "unigram_em_counts_docs",
    "simhash_hamming_pairs",
    "bpe_oov_by_source",
    "profile_lineitem",
]

SF_DIRS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
]

REPS = 3


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    faces = sys.argv[1:] or DEFAULT_FACES
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    qs = entry_mod.queries()
    # warm the session so face #1 does not pay JVM/codegen startup
    qs["q1_pricing_summary"](spark, SF_DIRS[0][1]).collect()

    results = {}
    for name in faces:
        fn = qs[name]
        times = {}
        for sf, d in SF_DIRS:
            best = math.inf
            for _ in range(REPS):
                t0 = time.monotonic()
                fn(spark, d).collect()
                best = min(best, time.monotonic() - t0)
            times[sf] = round(best, 3)
        alpha = math.log10(times["0.1"] / times["0.01"])
        results[name] = {**times, "alpha": round(alpha, 2)}
        print(
            f"| {name} | {times['0.001']:.2f} | {times['0.01']:.2f} | "
            f"{times['0.1']:.2f} | {alpha:.2f} |",
            flush=True,
        )
    print(json.dumps({"metric": "face_scale_exponents", "results": results}))


if __name__ == "__main__":
    main()
