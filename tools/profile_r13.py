"""Per-query optimization profiler (r13 measurement harness, guide §1).

For each named registry query at the bench scale (sf0.1, 32 cores,
same session conf as bench.py including longcents + per-query
scan-spread), runs the noop-sink action under a job group and prints:

- wall seconds (best of N samples, default 2, cache-cleared between),
- job-group executor task-time of the best sample,
- the heaviest stages of the best sample (executorRunTime, tasks,
  shuffle read/write MB, spill MB),

so a slow query can be attributed to a SPECIFIC stage before anything
is changed, and re-attributed after.  Wall >> task_time/cores means
scheduling/driver latency (many tiny stages, codegen, plan size);
task_time-dominated means real executor compute.

Usage: python tools/profile_r13.py q1 q2 ...  [env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, PROFILE_SAMPLES]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.taskmetrics import GroupMetrics  # noqa: E402


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    samples_n = int(os.environ.get("PROFILE_SAMPLES", "2"))

    from sec_edgar_spark.session import builder
    import sec_edgar_spark.queries as Q
    import bench as B

    spark = (
        builder(app_name="profile-r13")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sec_edgar.longcents", "true")
    qs = Q.queries()
    gm = GroupMetrics(spark)

    # same warmup as bench.py
    from sec_edgar_spark import catalog

    spark.range(1).count()
    for t in catalog.TABLES:
        catalog.table(spark, sf_dir, t).count()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        spark.conf.set(
            "spark.sec_edgar.scan_parallelize",
            B.SCAN_PARALLELIZE.get(name, ""),
        )
        best = None
        for attempt in range(samples_n):
            spark.catalog.clearCache()
            gid = f"prof:{name}:{attempt}"
            spark.sparkContext.setJobGroup(gid, name)
            t0 = time.time()
            try:
                noop(qs[name](spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                print(f"!! {name}: {type(e).__name__}: {e}"[:300])
                break
            finally:
                spark.sparkContext.setJobGroup("", "")
            wall = time.time() - t0
            if best is None or wall < best[0]:
                best = (wall, gid)
        if best is None:
            continue
        wall, gid = best
        tt = gm.task_time_s(gid)
        print(
            f"== {name}: wall={wall:.2f}s task_time={tt}s "
            f"({len(gm._group_stage_ids(gid))} stages)"
        )
        for r in gm.stage_profile(gid, top=8):
            print("   ", json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
