"""Capture UNTRUNCATED .explain("formatted") for named queries into
plans/$PLANS_ROUND/<name>_full_<suffix>.txt.

The house optimization style materializes shared subtrees with
``localCheckpoint(eager=False)``, which truncates the final explain at a
``Scan ExistingRDD`` — the Exchanges/scans inside the checkpointed
subtree become invisible (the r13 plan-note class).  For plan AUDITS we
monkeypatch ``DataFrame.localCheckpoint`` to the identity while the
query object is being built, so the printed plan shows the whole tree a
checkpoint-free execution would run.  Plan-time only — nothing here is
used by the engine at runtime, and timings of these plans are
meaningless (the checkpoints exist precisely to stop re-evaluation).

Usage: python scripts/capture_full_plans.py <suffix> q1 q2 ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(HERE, "plans", os.environ.get("PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    from dataquality_ml_spark import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("dq-capture-full-plans")
    spark.sparkContext.setLogLevel("OFF")
    qs = entry_mod.queries()

    from pyspark.sql.classic.dataframe import DataFrame as CDF

    orig = CDF.localCheckpoint
    CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]
    try:
        for name in names:
            if name not in qs:
                print(f"SKIP unknown query {name}", file=sys.stderr)
                continue
            spark.sparkContext.setJobDescription(f"capture_full_plan:{name}")
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_full_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
    finally:
        CDF.localCheckpoint = orig  # type: ignore[assignment]
    spark.stop()


if __name__ == "__main__":
    main()
