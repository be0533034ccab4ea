"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect) so the timing covers scan →
shuffle → result, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from dataquality_ml_spark import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("dq-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # Warm the JVM + parquet footer caches with the flagship query once.
    try:
        entry_mod.entry(spark).collect()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name, fn in sorted(qs.items()):
        # queries cache intermediates internally; clear between queries so
        # shared sub-plans don't cross-subsidize timings
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record failures, keep going
            timings[name] = -1.0
            print(f"BENCH FAIL {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
