"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract vs driver reality: the driver records only the LAST 2000
characters of stdout and tries to parse a JSON line out of it; a single
line carrying all ~130 per-query timings is ~4 KB and therefore was
recorded truncated-and-unparseable in rounds 1-2 ("parsed": null). So:

- stdout gets exactly ONE compact JSON line, guaranteed < 2000 chars:
  {"metric": "total_query_sec", "value": total, "unit": "sec", "sf": ...,
   "n_queries": N, "failed": [...], "queries": {<slowest K that fit>},
   "queries_file": "BENCH_OUT.json"}
- the FULL result (every query's timing, both passes, config) is written
  to BENCH_OUT.json next to this file and committed to the repo.

Timing method: each query runs twice back-to-back and we keep the MIN —
single-run timings on this shared sandbox swing 2x run-to-run (VERDICT r2
measured symmetric ±2x noise on identical code), and min-of-2 is the
cheapest estimator that suppresses one-off scheduler stalls. Each query is
executed to completion (collect) so the timing covers scan → shuffle →
result, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)

    from dataquality_ml_spark import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("dq-bench")
    spark.sparkContext.setLogLevel("OFF")

    qs = entry_mod.queries()
    # Warm the JVM + parquet footer caches with the flagship query once.
    try:
        entry_mod.entry(spark).collect()
    except Exception:
        pass

    runs: dict[str, list[float]] = {}
    failed: list[str] = []
    for name, fn in sorted(qs.items()):
        runs[name] = []
        for _ in range(2):
            # queries cache intermediates internally; clear between runs so
            # shared sub-plans don't cross-subsidize timings
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
                runs[name].append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001 — record failures, keep going
                if name not in failed:
                    failed.append(name)
                print(f"BENCH FAIL {name}: {e}", file=sys.stderr)
                break

    # a query that failed on ANY run is reported only in `failed`, never
    # double-counted in timings/value/n_queries
    timings = {n: min(r) for n, r in runs.items() if r and n not in failed}
    total = round(sum(timings.values()), 3)
    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_tag) if sf_tag.replace(".", "").isdigit() else sf_tag

    full = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "failed": failed,
        "queries": dict(sorted(timings.items())),
        "runs": runs,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "timing": "min_of_2",
    }
    with open(os.path.join(here, "BENCH_OUT.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)

    # Compact stdout line: summary + as many of the slowest queries as fit
    # in the driver's 2000-char tail window (with headroom for stray output).
    summary = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "failed": failed,
        "queries_file": "BENCH_OUT.json",
        "queries": {},
    }
    budget = 1700
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        summary["queries"][name] = sec
        if len(json.dumps(summary, separators=(",", ":"))) > budget:
            del summary["queries"][name]
            break
    print(json.dumps(summary, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
