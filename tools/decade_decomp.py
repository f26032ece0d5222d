"""Decompose a decade factor into compute vs scheduling, per stage
(r13, follow-up to BENCH_SF100's min-of-2 result).

BENCH_SF100 measures dedup_prefix_filter_capped at ~11.5×/decade wall
(33-36s → 385-394s, stable across passes) with the engine's own
partition autosizing.  Wall on local[32] conflates executor compute
with stage-scheduling latency; this tool runs one query at both
scales under a job group and prints, per leg:

- wall, Σ executorRunTime (task-time), and their decade factors — if
  task-time scales ~linear while wall does not, the residual is
  scheduling/straggler latency, a local-harness artifact, not
  algorithmic growth;
- the heaviest stages with shuffle read/write + spill, so a genuinely
  superlinear stage is named by stage, not guessed.

Usage: python tools/decade_decomp.py [query] [--passes N]
Prints JSON to stdout; no artifact file (feeds the BENCH_SF100.md
narrative).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "testdata_sf10")
SF100 = os.path.join(REPO, "testdata_sf100")


def main() -> int:
    from sec_edgar_spark.session import builder
    import sec_edgar_spark.queries as Q
    import bench
    from tools.taskmetrics import GroupMetrics

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "dedup_prefix_filter_capped"
    passes = (
        int(sys.argv[sys.argv.index("--passes") + 1])
        if "--passes" in sys.argv
        else 1
    )

    # UI on: the whole point of this tool is REST task metrics (the
    # shared builder disables the UI; bench.py measured its listener
    # cost and that cost applies equally to both legs here)
    spark = (
        builder(app_name="decade-decomp")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sec_edgar.longcents", "true")
    spark.conf.set(
        "spark.sec_edgar.scan_parallelize",
        "documents,embeddings" if name in bench.SCAN_PARALLELIZE else "",
    )
    gm = GroupMetrics(spark)
    fn = Q.queries()[name]

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # untimed warmup at each dir (codegen + one-time probe + page cache)
    for d in (SF10, SF100):
        noop(fn(spark, d))
        spark.catalog.clearCache()

    out = {"query": name, "legs": {}}
    for label, d in (("sf10", SF10), ("sf100", SF100)):
        walls, tasks, profile = [], [], None
        for p in range(passes):
            spark.catalog.clearCache()
            gid = f"decomp:{label}:{p}"
            spark.sparkContext.setJobGroup(gid, name)
            t0 = time.time()
            noop(fn(spark, d))
            spark.sparkContext.setJobGroup("", "")
            walls.append(round(time.time() - t0, 1))
            tasks.append(gm.task_time_s(gid))
            profile = gm.stage_profile(gid)
        out["legs"][label] = {
            "wall_s": walls,
            "task_s": tasks,
            "shuffle": spark.conf.get("spark.sql.shuffle.partitions"),
            "top_stages": profile,
        }
        print(
            f"  {name} @ {label}: wall={walls} task={tasks}", flush=True
        )
    w10 = min(out["legs"]["sf10"]["wall_s"])
    w100 = min(out["legs"]["sf100"]["wall_s"])
    t10s = [t for t in out["legs"]["sf10"]["task_s"] if t]
    t100s = [t for t in out["legs"]["sf100"]["task_s"] if t]
    out["wall_factor"] = round(w100 / w10, 2)
    if t10s and t100s:
        out["task_factor"] = round(min(t100s) / min(t10s), 2)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
