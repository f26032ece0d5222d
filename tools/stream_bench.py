"""Streaming throughput bench for the three heaviest stateful streams
(VERDICT r9 #5).

Parity tests prove the streams CORRECT; nothing so far measured them
SUSTAINED.  This tool drives each stream with sf0.1-volume micro-batch
waves through the real Structured Streaming engine (file source,
maxFilesPerTrigger=1, so every wave is one micro-batch with full
engine overhead included) and records per-batch wall, rows/s, and
state growth across >= 20 batches:

- incremental LSH (streaming/incremental_lsh.py): 20 waves x 250 docs
  of sf0.1 documents; state = the persisted bands/sets store on disk,
  sampled after every batch (the bounded-growth claim under test:
  store grows LINEARLY with docs ingested, per-batch wall stays flat
  because the probe is an equi-join against an only-appended index).
- decontamination gate (streaming/decontam_stream.py): 20 waves x 250
  docs probed against a static eval-shingle index; state = the
  windowed aggregate's rows/bytes from StreamingQueryProgress
  (bounded by contaminated-doc count, NOT corpus size).
- SCD2 dimension maintenance (streaming/scd_stream.py): 20 waves x
  5000 sf0.1 events; state = the dimension store on disk (bounded by
  distinct (user, type) keys, not event count).

Output: STREAM_BENCH.md + STREAM_BENCH.json with per-batch curves and
a max-sustainable-rate statement per stream (rows/s at the observed
steady state; the LAST batches matter — a stream whose batch wall
grows with total ingested history cannot run forever).

Usage: python tools/stream_bench.py [lsh|decontam|scd2 ...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_stream_bench"
N_WAVES = 20


def _du(path: str) -> int:
    total = 0
    for dp, _, fns in os.walk(path):
        for f in fns:
            try:
                total += os.path.getsize(os.path.join(dp, f))
            except OSError:
                pass
    return total


def _write_waves(df, key_col: str, out: str, n: int) -> int:
    """Split df into n waves by key hash, one parquet dir per wave
    (one file each -> one micro-batch each under maxFilesPerTrigger=1).
    Returns total rows."""
    total = 0
    for i in range(n):
        w = df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(n)) == i)
        w.coalesce(1).write.mode("overwrite").parquet(f"{out}/w{i:02d}")
        total += w.count()
    return total


def bench_lsh(spark) -> dict:
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.streaming.incremental_lsh import lsh_upsert_batch

    root = f"{WORK}/lsh_store"
    feed = f"{WORK}/lsh_feed"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(feed, ignore_errors=True)

    docs = table(spark, BASE, "documents").select("doc_id", "text")
    total_rows = _write_waves(docs, "doc_id", feed, N_WAVES)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*")
    )
    curve = []

    def _sink(batch_df, batch_id: int) -> None:
        t0 = time.time()
        n = batch_df.count()
        lsh_upsert_batch(spark, root, batch_df, batch_id=batch_id)
        curve.append(
            {
                "batch": int(batch_id),
                "rows": int(n),
                "wall_s": round(time.time() - t0, 2),
                "store_bytes": _du(root),
            }
        )
        print(f"  lsh batch {batch_id}: {n} rows {curve[-1]['wall_s']}s "
              f"store={curve[-1]['store_bytes']//1024}KiB", flush=True)

    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", f"{WORK}/lsh_ckpt")
        .queryName("bench_lsh")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    wall = time.time() - t0
    return {
        "stream": "incremental_lsh",
        "total_rows": total_rows,
        "total_wall_s": round(wall, 1),
        "rows_per_s": round(total_rows / wall, 1),
        "curve": curve,
    }


def bench_decontam(spark) -> dict:
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.streaming.decontam_stream import (
        decontam_stream,
        eval_shingle_index,
    )

    feed = f"{WORK}/dc_feed"
    shutil.rmtree(feed, ignore_errors=True)

    docs = table(spark, BASE, "documents").select(
        "doc_id",
        "text",
        F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("ts"),
    )
    total_rows = _write_waves(docs, "doc_id", feed, N_WAVES)
    # eval set: a slice of the SAME corpus so the join actually hits
    eval_index = (
        eval_shingle_index(
            table(spark, BASE, "documents").filter("doc_id % 50 = 0")
        )
        .cache()
    )
    eval_index.count()

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*")
    )
    out = decontam_stream(stream, eval_index)
    t0 = time.time()
    q = (
        out.writeStream.format("memory")
        .queryName("bench_decontam")
        .outputMode("append")
        .option("checkpointLocation", f"{WORK}/dc_ckpt")
        .start()
    )
    q.processAllAvailable()
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    wall = time.time() - t0
    curve = []
    for p in progress:
        st = (p.get("stateOperators") or [{}])[0]
        curve.append(
            {
                "batch": p.get("batchId"),
                "rows": p.get("numInputRows", 0),
                "wall_s": round(
                    (p.get("batchDuration") or 0) / 1000.0, 2
                ),
                "state_rows": st.get("numRowsTotal", 0),
                "state_bytes": st.get("memoryUsedBytes", 0),
            }
        )
        print(f"  decontam batch {curve[-1]['batch']}: "
              f"{curve[-1]['rows']} rows {curve[-1]['wall_s']}s "
              f"state_rows={curve[-1]['state_rows']}", flush=True)
    eval_index.unpersist()
    return {
        "stream": "decontam_gate",
        "total_rows": total_rows,
        "total_wall_s": round(wall, 1),
        "rows_per_s": round(total_rows / wall, 1),
        "curve": curve,
    }


def bench_scd2(spark) -> dict:
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.streaming.scd_stream import scd2_upsert_batch

    root = f"{WORK}/scd_store"
    feed = f"{WORK}/scd_feed"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(feed, ignore_errors=True)

    ev = table(spark, BASE, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    total_rows = _write_waves(ev, "event_id", feed, N_WAVES)

    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, event_id long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*")
    )
    curve = []

    def _sink(batch_df, batch_id: int) -> None:
        t0 = time.time()
        n = batch_df.count()
        scd2_upsert_batch(spark, root, batch_df, batch_id=batch_id)
        curve.append(
            {
                "batch": int(batch_id),
                "rows": int(n),
                "wall_s": round(time.time() - t0, 2),
                "store_bytes": _du(root),
            }
        )
        print(f"  scd2 batch {batch_id}: {n} rows {curve[-1]['wall_s']}s "
              f"store={curve[-1]['store_bytes']//1024}KiB", flush=True)

    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", f"{WORK}/scd_ckpt")
        .queryName("bench_scd2")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    wall = time.time() - t0
    return {
        "stream": "scd2_maintenance",
        "total_rows": total_rows,
        "total_wall_s": round(wall, 1),
        "rows_per_s": round(total_rows / wall, 1),
        "curve": curve,
    }


def main() -> int:
    from sec_edgar_spark.session import get_spark

    which = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "lsh",
        "decontam",
        "scd2",
    ]
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    runners = {"lsh": bench_lsh, "decontam": bench_decontam, "scd2": bench_scd2}
    results = []
    for name in which:
        print(f"=== {name} ===", flush=True)
        results.append(runners[name](spark))

    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.strip()
    lines = [
        "# STREAM_BENCH — stateful-stream throughput at sf0.1 volume",
        "",
        f"Each stream driven through the real Structured Streaming "
        f"engine (file source, maxFilesPerTrigger=1 → one wave per "
        f"micro-batch, {N_WAVES} batches), "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].  git {sha}, "
        f"loadavg {os.getloadavg()[0]:.1f}.",
        "",
        "Sustainability reading: per-batch wall must be FLAT across "
        "batches (a wall that grows with ingested history cannot run "
        "forever); store/state growth must be linear in ingested rows "
        "(LSH, by design) or bounded by key/eval cardinality "
        "(SCD2 / decontam).",
        "",
    ]
    for r in results:
        c = r["curve"]
        head, tail = c[: 3], c[-3:]
        lines += [
            f"## {r['stream']}",
            "",
            f"**{r['total_rows']} rows in {r['total_wall_s']}s = "
            f"{r['rows_per_s']} rows/s sustained across {len(c)} "
            f"batches.**",
            "",
            "| batch | rows | wall | state |",
            "|---|---|---|---|",
        ]
        shown = {id(x) for x in head + tail}
        mid = [x for x in c if id(x) not in shown]
        sample = head + mid[:: max(1, len(mid) // 4)][:4] + tail
        seen = set()
        for b in sample:
            if b["batch"] in seen:
                continue
            seen.add(b["batch"])
            state = (
                f"{b.get('store_bytes', 0) // 1024} KiB on disk"
                if "store_bytes" in b
                else f"{b.get('state_rows', 0)} rows / "
                f"{b.get('state_bytes', 0) // 1024} KiB mem"
            )
            lines.append(
                f"| {b['batch']} | {b['rows']} | {b['wall_s']}s | {state} |"
            )
        first_w = sum(x["wall_s"] for x in c[:5]) / max(len(c[:5]), 1)
        last_w = sum(x["wall_s"] for x in c[-5:]) / max(len(c[-5:]), 1)
        lines += [
            "",
            f"Batch-wall drift (mean last-5 / first-5): "
            f"{last_w / max(first_w, 1e-9):.2f}x.",
            "",
        ]
    with open(os.path.join(REPO, "STREAM_BENCH.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(REPO, "STREAM_BENCH.json"), "w") as fh:
        json.dump(
            {
                "git_sha": sha,
                "loadavg_1m": round(os.getloadavg()[0], 2),
                "streams": results,
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print("-> STREAM_BENCH.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
