"""Capture .explain('formatted') for a list of registry queries into
plans/<tag>/<query>_<suffix>.txt — one Spark session for the batch.

Usage:
  python tools/capture_plans.py <out_dir> <suffix> <sf_dir> q1 q2 ...

Run from the repo root whose code should be captured (the judge's
before/after evidence: run once from the round-start snapshot with
suffix 'before', once from the working tree with suffix 'after').
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__)
        return 2
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from sec_edgar_spark.session import get_spark
    import sec_edgar_spark.queries as Q

    spark = get_spark(app_name=f"plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    for name in names:
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
