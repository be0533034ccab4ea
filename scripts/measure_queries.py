"""Targeted per-query re-measurement (VERDICT r7 item 6): min-of-N
timings for a named subset of registered queries at a given SF dir,
without paying for the whole bench.

    python scripts/measure_queries.py [sf_dir] [reps] name [name ...]

Prints one JSON line {name: min_sec}. Same timing discipline as
bench.py: clearCache between runs, collect() to completion.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = int(args.pop(0)) if args and args[0].isdigit() else 3
    names = args
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)

    import __spark_entry__ as entry_mod

    from dataquality_ml_spark import get_spark

    spark = get_spark("dq-measure")
    spark.sparkContext.setLogLevel("OFF")
    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # same warm-up as bench.py so the first measured query isn't paying
    # JVM + parquet-footer costs
    entry_mod.entry(spark).collect()

    out: dict[str, float] = {}
    for name in names:
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = min(runs)
        print(f"# {name}: {runs}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "min_sec": out}))


if __name__ == "__main__":
    main()
