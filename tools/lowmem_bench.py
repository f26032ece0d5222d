"""Memory-constrained spill bench (BENCH_LOWMEM.md).

Every at-scale run so far had heap to spare; a 1000-executor cluster
reading 100 TB does NOT — executors run with a fixed slice and the
engine's survival property is SPILL, not fit-in-RAM.  This tool runs
the memory-heaviest registered queries at sf1 twice, in fresh
single-query subprocess JVMs:

- roomy:  driver-memory 16g  (the reference wall)
- tight:  driver-memory 2g   (~12x less; the whole sf1 working set
  plus shuffle/sort state cannot be resident)

and records, per (query, heap): wall seconds, completion, and the
spill actually performed (memoryBytesSpilled / diskBytesSpilled summed
over stages via the Spark UI REST API — the UI is enabled only inside
this tool's subprocesses).  The pass criterion is graceful
degradation: every query COMPLETES at 2g with a bounded slowdown and
nonzero spill where the plan has big sorts/aggregations — an OOM or a
>10x cliff is a scale bug (the exact class the poison sweep's
executor-memory death exposed in the pre-fix Theil-Sen pair sort).

Usage:
  python tools/lowmem_bench.py            # full matrix -> BENCH_LOWMEM.md
  python tools/lowmem_bench.py --one <query> <sf_dir> <mem>   # subprocess
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "testdata_sf1")

# The memory-heaviest registry members by r10/r11 bench wall + plan
# shape (pair generation, components iteration, wide sorts, exports),
# plus this round's two salted-window additions (their rank-block /
# fragment shuffles are exactly the state that must spill).
QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_residual_audit",
    "curation_funnel_report",
    "graph_components_modularity",
    "curation_keep_best",
    "dedup_cluster_size_histogram",
    "agg_bootstrap_ci",
    "er_entity_groups",
    "curation_export_shards",
    "dedup_simhash_hamming",
    "events_sessionize_salted",
    "window_moving_avg_salted",
]

MEMS = ["16g", "2g"]


def _run_one(name: str, sf_dir: str, mem: str) -> None:
    """Subprocess body: one query, one fresh JVM, UI on for metrics.

    The tight config also drops to 16 task slots: a real 2 GB executor
    runs ~4-8 cores, never 32 — at local[32] the 2 GB unified region
    holds 32 CONCURRENT hash-build/sort states and the components
    compositions sat ~100 MB from the cliff (intermittent
    GCLocker/broadcast-build deaths across otherwise-identical runs);
    cores-per-heap is the ops knob that sizes that concurrency."""
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem
    if mem != "16g":
        os.environ["SPARK_GRAFT_CPUS"] = "16"
    from pyspark.sql import SparkSession  # noqa: F401
    from sec_edgar_spark.session import builder
    import sec_edgar_spark.queries as Q

    spark = (
        builder(app_name=f"lowmem-{name}")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    fn = Q.queries()[name]
    # warm scans so the timing is the plan, not session startup
    from sec_edgar_spark import catalog

    for t in catalog.TABLES:
        catalog.table(spark, sf_dir, t).count()
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.time() - t0

    ui = spark.sparkContext.uiWebUrl
    mem_sp = disk_sp = 0
    try:
        apps = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10,
            )
        )
        mem_sp = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        disk_sp = sum(s.get("diskBytesSpilled", 0) for s in stages)
    except Exception as e:  # metrics are best-effort; the wall is not
        print(f"METRICS_WARN {e}", file=sys.stderr)
    print(
        "RESULT "
        + json.dumps(
            {
                "query": name,
                "mem": mem,
                "wall_s": round(wall, 2),
                "mem_spill_mb": round(mem_sp / 1048576, 1),
                "disk_spill_mb": round(disk_sp / 1048576, 1),
            }
        )
    )


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        _run_one(sys.argv[2], sys.argv[3], sys.argv[4])
        return 0

    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        print("building sf1 replica via tools/sf1_bench.py machinery...")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from sf1_bench import build_sf1
        from sec_edgar_spark.session import get_spark

        spark = get_spark(app_name="lowmem-build-sf1")
        spark.sparkContext.setLogLevel("ERROR")
        build_sf1(spark)
        spark.stop()

    rows: list[dict] = []
    for name in QUERIES:
        for mem in MEMS:
            cmd = [
                sys.executable,
                "tools/lowmem_bench.py",
                "--one",
                name,
                SF1,
                mem,
            ]
            t0 = time.time()
            proc = subprocess.run(
                cmd, cwd=REPO, capture_output=True, text=True, timeout=1800
            )
            rec = None
            for ln in proc.stdout.splitlines():
                if ln.startswith("RESULT "):
                    rec = json.loads(ln[7:])
            if rec is None:
                tail = (proc.stderr or "")[-400:]
                rec = {
                    "query": name,
                    "mem": mem,
                    "wall_s": None,
                    "error": f"rc={proc.returncode} {tail}",
                }
            rec["proc_wall_s"] = round(time.time() - t0, 1)
            rows.append(rec)
            print(rec, flush=True)

    by_q: dict[str, dict] = {}
    for r in rows:
        by_q.setdefault(r["query"], {})[r["mem"]] = r

    lines = [
        "# BENCH_LOWMEM — spill-or-die at 1/12th the heap",
        "",
        "Each cell = one fresh single-query JVM at sf1; 16g/local[32] "
        "= roomy reference, 2g/local[16] = a realistically-sized tight "
        "executor (a 2 GB executor runs ~4-8 cores in production — 32 "
        "slots on 2 GB holds 32 concurrent hash-build/sort states and "
        "measures the slot-sizing mistake, not the operators).  Spill "
        "= memory/disk bytes spilled summed over completed stages "
        "(Spark UI REST, enabled only here).  Pass = completes at 2g "
        "with bounded slowdown; OOM or a >10x cliff is a scale bug.  "
        "See tools/lowmem_bench.py.",
        "",
        "| query | 16g wall | 2g wall | factor | 2g spill (mem+disk MB) | verdict |",
        "|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        roomy, tight = by_q[name].get("16g", {}), by_q[name].get("2g", {})
        rw, tw = roomy.get("wall_s"), tight.get("wall_s")
        if rw and tw:
            factor = tw / rw
            spill = (
                f"{tight.get('mem_spill_mb', 0)} + "
                f"{tight.get('disk_spill_mb', 0)}"
            )
            verdict = "ok" if factor <= 10 else "CLIFF"
            lines.append(
                f"| {name} | {rw}s | {tw}s | {factor:.1f}x | {spill} "
                f"| {verdict} |"
            )
        else:
            err = (tight.get("error") or roomy.get("error") or "?")[:120]
            lines.append(f"| {name} | {rw}s | {tw}s | — | — | DIED: {err} |")

    git = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    lines += ["", f"git {git}, loadavg {os.getloadavg()[0]:.1f}."]
    out = os.path.join(REPO, "BENCH_LOWMEM.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(REPO, "BENCH_LOWMEM.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"-> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
