"""Streaming throughput bench v2 — Zipf-skew intake, 100 batches, and
the composed intake pipeline (VERDICT r10 #3 and #7).

v1 (r10) drove the three heaviest stateful streams with UNIFORM
sf0.1-volume waves for 20 batches — and the r10 skew lesson is that
uniform benches hide the killers, while 20 batches cannot show
state-store compaction or snapshot-rewrite creep.  v2 defaults to:

- intake = the Zipf-skew corpus (testdata_sf1_skew: ONE user owns
  30 % of 1M events, ONE source owns 40 % of 50k docs, a shared
  Zipf token head) — waves split by id hash, so EVERY micro-batch
  carries the hot keys at full strength;
- >= 100 micro-batches per stream (real engine, file source,
  maxFilesPerTrigger=1);
- hot-key state-row sizes recorded after the run (the skewed analog
  of the state-growth claim: does ONE key's state swamp the store?);
- a COMPOSED intake pipeline benched as one continuous query DAG —
  url-canonical gate (dropDuplicatesWithinWatermark state) → stateless
  quality columns + content-hash dedup (second dedup state) →
  per-batch decontamination gate (stream-static shingle join) →
  incremental-LSH index upsert — the four stages previously benched
  only in isolation, their state stores now coexisting.

Output: STREAM_BENCH.md + STREAM_BENCH.json with per-batch curves,
drift (mean last-5 / first-5 batch walls — flat or a named bounded
term), sustained rows/s, per-stage rates for the composed DAG, and
the hot-key state shares.

Usage: python tools/stream_bench.py [--sf-dir DIR] [--waves N]
       [lsh|decontam|scd2|composed ...]
(defaults: testdata_sf1_skew, 100 waves, all four)
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
WORK = "/tmp/spark_graft_stream_bench"
HOT_USER = 777_777
HOT_SOURCE = "hotdomain.example"


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
    Hash-splitting means a hot key's rows appear in EVERY wave at its
    corpus share — the skewed-batch-mix the r10 verdict asked for.
    Returns total rows."""
    total = 0
    for i in range(n):
        w = df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(n)) == i)
        w.coalesce(1).write.mode("overwrite").parquet(f"{out}/w{i:02d}")
        total += w.count()
    return total


def bench_lsh(spark, base: str, n_waves: int, tag: str = "") -> dict:
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.streaming.incremental_lsh import lsh_upsert_batch

    root = f"{WORK}/lsh_store{tag}"
    feed = f"{WORK}/lsh_feed{tag}"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(feed, ignore_errors=True)
    # a stale file-source checkpoint would resume batch numbering and
    # skip same-named wave files — every bench run starts fresh
    shutil.rmtree(f"{WORK}/lsh_ckpt{tag}", ignore_errors=True)

    docs = table(spark, base, "documents").select("doc_id", "text")
    total_rows = _write_waves(docs, "doc_id", feed, n_waves)

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
        if batch_id % 10 == 0 or batch_id < 3:
            print(
                f"  lsh batch {batch_id}: {n} rows "
                f"{curve[-1]['wall_s']}s "
                f"store={curve[-1]['store_bytes']//1024}KiB",
                flush=True,
            )

    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", f"{WORK}/lsh_ckpt{tag}")
        .queryName("bench_lsh")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    wall = time.time() - t0

    # hot-key state share: band-index rows belonging to hot-source docs
    hot = {}
    try:
        bands = spark.read.parquet(f"{root}/bands")
        hot_ids = (
            table(spark, base, "documents")
            .filter(F.col("source") == HOT_SOURCE)
            .select("doc_id")
        )
        hot["band_rows_total"] = bands.count()
        hot["band_rows_hot_source"] = bands.join(hot_ids, "doc_id").count()
    except Exception as e:  # noqa: BLE001 — absent column on uniform dirs
        hot["note"] = f"hot-source split unavailable: {str(e)[:60]}"
    return {
        "stream": f"incremental_lsh{tag}",
        "total_rows": total_rows,
        "total_wall_s": round(wall, 1),
        "rows_per_s": round(total_rows / wall, 1),
        "hot_state": hot,
        "curve": curve,
    }


def bench_decontam(spark, base: str, n_waves: int) -> dict:
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.streaming.decontam_stream import (
        decontam_stream,
        eval_shingle_index,
    )

    feed = f"{WORK}/dc_feed"
    shutil.rmtree(feed, ignore_errors=True)
    shutil.rmtree(f"{WORK}/dc_ckpt", ignore_errors=True)

    docs = table(spark, base, "documents").select(
        "doc_id",
        "text",
        F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("ts"),
    )
    total_rows = _write_waves(docs, "doc_id", feed, n_waves)
    # eval set: a slice of the SAME corpus so the join actually hits
    eval_index = (
        eval_shingle_index(
            table(spark, base, "documents").filter("doc_id % 50 = 0")
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
                "wall_s": round((p.get("batchDuration") or 0) / 1000.0, 2),
                "state_rows": st.get("numRowsTotal", 0),
                "state_bytes": st.get("memoryUsedBytes", 0),
            }
        )
    eval_index.unpersist()
    return {
        "stream": "decontam_gate",
        "total_rows": total_rows,
        "total_wall_s": round(wall, 1),
        "rows_per_s": round(total_rows / wall, 1),
        "hot_state": {
            "note": "state keyed by (window, doc_id) — bounded by "
            "contaminated docs; per-key split not exposed by the "
            "state store API, total rows in curve"
        },
        "curve": curve,
    }


def bench_scd2(spark, base: str, n_waves: int) -> dict:
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.streaming.scd_stream import scd2_upsert_batch

    root = f"{WORK}/scd_store"
    feed = f"{WORK}/scd_feed"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(feed, ignore_errors=True)
    shutil.rmtree(f"{WORK}/scd_ckpt", ignore_errors=True)

    ev = table(spark, base, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    total_rows = _write_waves(ev, "event_id", feed, n_waves)

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
        if batch_id % 10 == 0 or batch_id < 3:
            print(
                f"  scd2 batch {batch_id}: {n} rows "
                f"{curve[-1]['wall_s']}s "
                f"store={curve[-1]['store_bytes']//1024}KiB",
                flush=True,
            )

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

    # hot-key state share: dimension rows owned by the hot user —
    # through read_dim (closed/ carries the r13 _emit_ord column; a
    # raw unionByName against current/ is a width mismatch)
    hot = {}
    try:
        from sec_edgar_spark.streaming.scd_stream import read_dim

        dim = read_dim(spark, root)
        hot["dim_rows_total"] = dim.count()
        hot["dim_rows_hot_user"] = dim.filter(
            F.col("user_id") == HOT_USER
        ).count()
    except Exception as e:  # noqa: BLE001
        hot["note"] = f"store read failed: {str(e)[:60]}"
    return {
        "stream": "scd2_maintenance",
        "total_rows": total_rows,
        "total_wall_s": round(wall, 1),
        "rows_per_s": round(total_rows / wall, 1),
        "hot_state": hot,
        "curve": curve,
    }


def bench_composed(spark, base: str, n_waves: int) -> dict:
    """The intake chain as ONE continuous query DAG (VERDICT r10 #7):
    url-canonical gate → quality columns + content dedup → per-batch
    decontam gate → incremental-LSH upsert.  Two streaming dedup state
    stores live inside the query; the LSH store and the static eval
    index coexist with them.  Event time is constant, so neither dedup
    state ever expires — state growth is linear in distinct keys by
    design and recorded as such."""
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.streaming.incremental_lsh import lsh_upsert_batch
    from sec_edgar_spark.streaming.decontam_stream import eval_shingle_index
    from sec_edgar_spark.streaming.quality_stream import quality_columns
    from sec_edgar_spark.streaming.url_intake import url_intake_stream
    from sec_edgar_spark.functions import text as T

    root = f"{WORK}/comp_lsh_store"
    feed = f"{WORK}/comp_feed"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(feed, ignore_errors=True)
    shutil.rmtree(f"{WORK}/comp_ckpt", ignore_errors=True)

    docs = table(spark, base, "documents").select("doc_id", "text")
    n_docs = docs.count()
    # synthetic crawl frame: ~25 % of URLs are re-crawls of another
    # doc's canonical URL (modulo fold) + utm noise the canonicalizer
    # must strip; constant event time (see docstring)
    crawl = docs.select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://crawl.example.com/p/"),
            (F.col("doc_id") % int(max(n_docs * 0.75, 1))).cast("string"),
            F.lit("?utm_source=feed&utm_campaign=q"),
            (F.col("doc_id") % 3).cast("string"),
        ).alias("url"),
        F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("ts"),
    )
    total_rows = _write_waves(crawl, "doc_id", feed, n_waves)

    eval_index = (
        eval_shingle_index(docs.filter("doc_id % 50 = 0")).cache()
    )
    eval_index.count()

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, url string, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*")
    )
    gated = url_intake_stream(stream)  # state store 1: canonical URLs
    quality = quality_columns(gated).filter(F.col("passes_quality"))
    deduped = quality.withColumn(
        "content_hash", F.md5(F.lower(F.trim(F.col("text"))))
        # the watermark set inside url_intake_stream carries through —
        # redefining it between stateful operators is disallowed
    ).dropDuplicatesWithinWatermark(["content_hash"])  # state store 2
    curve = []

    def _sink(batch_df, batch_id: int) -> None:
        t0 = time.time()
        # one upstream compute for the whole round: every action on a
        # foreachBatch frame otherwise replays the stateful lineage
        # (two state stores + the gates), and caches derived from a
        # streaming source MISS on derived-plan lookup (see
        # incremental_lsh.lsh_upsert_batch) — localCheckpoint cuts
        # the lineage at an RDD-backed relation
        batch_df = batch_df.localCheckpoint(eager=True)
        arrived = batch_df.count()
        # decontam gate: stream-static shingle join per batch, docs
        # with >= 1 eval shingle overlap are quarantined
        sh = batch_df.select(
            "doc_id", T.tokens("text").alias("_toks")
        ).select(
            "doc_id",
            F.explode(T.shingles_from_tokens(F.col("_toks"), 8)).alias(
                "shingle"
            ),
        )
        dirty = sh.join(eval_index, "shingle").select("doc_id").distinct()
        clean = batch_df.join(dirty, "doc_id", "left_anti").select(
            "doc_id", "text"
        )
        n_dirty = dirty.count()
        lsh_upsert_batch(spark, root, clean, batch_id=batch_id)
        curve.append(
            {
                "batch": int(batch_id),
                "rows_after_dedup_gates": int(arrived),
                "rows_quarantined": int(n_dirty),
                "rows_indexed": int(arrived - n_dirty),
                "wall_s": round(time.time() - t0, 2),
                "lsh_store_bytes": _du(root),
            }
        )
        if batch_id % 10 == 0 or batch_id < 3:
            print(
                f"  composed batch {batch_id}: {arrived} arrived, "
                f"{n_dirty} quarantined, {curve[-1]['wall_s']}s",
                flush=True,
            )

    t0 = time.time()
    q = (
        deduped.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", f"{WORK}/comp_ckpt")
        .queryName("bench_composed")
        .start()
    )
    q.processAllAvailable()
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    wall = time.time() - t0

    # in-query dedup state (both stores) from the engine's progress
    state_rows = []
    for p in progress:
        ops = p.get("stateOperators") or []
        state_rows.append(
            {
                "batch": p.get("batchId"),
                "input_rows": p.get("numInputRows", 0),
                "state_rows_per_op": [
                    op.get("numRowsTotal", 0) for op in ops
                ],
            }
        )
    eval_index.unpersist()
    indexed = sum(b["rows_indexed"] for b in curve)
    return {
        "stream": "composed_intake",
        "total_rows": total_rows,
        "total_wall_s": round(wall, 1),
        "rows_per_s": round(total_rows / wall, 1),
        "rows_indexed": indexed,
        "hot_state": {
            "final_state_rows_per_op": (
                state_rows[-1]["state_rows_per_op"] if state_rows else []
            ),
            "lsh_store_bytes": curve[-1]["lsh_store_bytes"] if curve else 0,
        },
        "curve": curve,
        "engine_state_curve": state_rows[:: max(1, len(state_rows) // 12)],
    }


def main() -> int:
    from sec_edgar_spark.session import get_spark

    argv = sys.argv[1:]
    base = os.path.join(REPO, "testdata_sf1_skew")
    n_waves = 100
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        base = argv[i + 1]
        del argv[i : i + 2]
    if "--waves" in argv:
        i = argv.index("--waves")
        n_waves = int(argv[i + 1])
        del argv[i : i + 2]
    which = [a for a in argv if not a.startswith("--")] or [
        "lsh",
        "decontam",
        "scd2",
        "composed",
    ]
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    runners = {
        "lsh": bench_lsh,
        "decontam": bench_decontam,
        "scd2": bench_scd2,
        "composed": bench_composed,
    }
    results = []
    for name in which:
        print(f"=== {name} ({base}, {n_waves} waves) ===", flush=True)
        results.append(runners[name](spark, base, n_waves))
        if name == "lsh":
            # The r13 profile showed the micro-batch wall is per-stage
            # scheduling, not data (A/B in the artifact) — so docs/s
            # scales with increment size.  The backfill row measures
            # the SAME corpus in 10 waves: what a catch-up ingest
            # (bounded feed, bigger increments) actually sustains.
            print(f"=== lsh backfill ({base}, 10 waves) ===", flush=True)
            results.append(bench_lsh(spark, base, 10, tag="_backfill"))

    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.strip()
    lines = [
        "# STREAM_BENCH v4 — Zipf-skew intake, 100-batch sustain, "
        "composed pipeline, micro vs backfill increments",
        "",
        "v4 (r13, VERDICT r12 #5): the incremental-LSH upsert's "
        "per-batch cost contract is now O(batch + collisions) — the "
        "corpus stores are scanned map-side, never shuffled (batch "
        "side broadcast into the probe; verify sets semi-joined to "
        "pair participants), the store's file count is held flat by "
        "periodic crash-safe compaction, and micro-batch rounds run "
        "with 4 shuffle partitions + AQE off (tiny_batches flag; "
        "conf restored per batch).  Measured per-batch A/B at the "
        "steady state, same corpus/waves: 32 partitions + AQE = "
        "2.36 s/batch, 4 partitions + AQE = 1.76, 4 + no AQE = 1.25, "
        "32 + no AQE = 1.42 — the wall is per-stage SCHEDULING, not "
        "data, so sustained docs/s scales with increment size; the "
        "incremental_lsh_backfill row (same 50k-doc corpus, 10 "
        "waves) is the catch-up-ingest shape.",
        "",
        "THE STREAM-LINEAGE CACHE MISS (r13's named wall, found while "
        "closing this item): .cache()/.persist() on frames DERIVED "
        "from a foreachBatch batch frame register but MISS on lookup "
        "from larger derived plans (the streaming source node does "
        "not canonicalize equal across re-analysis), so a "
        "self-joining candidate DAG recomputes its whole subtree per "
        "reference — measured on the composed pipeline as per-action "
        "cost DOUBLING with plan depth (pairs 8s → sets 16s → verify "
        "31s on a 500-row batch whose isolated batch-context twin "
        "runs in ~2s), while trivial and broadcast-join jobs inside "
        "the same callback stay at 0.2-0.3s.  Fix: "
        "localCheckpoint(eager) at upsert entry cuts the plan at an "
        "RDD-backed relation (composed batch wall 20.4/17.2/15.2/8.9s "
        "→ 14.6/8.2/7.3/4.4s on the same 12-wave A/B, ~2× the "
        "PRE-round code); exactly-once markers make the "
        "non-reliable-checkpoint retry path idempotent.",
        "",
        f"Each stream driven through the real Structured Streaming "
        f"engine (file source, maxFilesPerTrigger=1 → one wave per "
        f"micro-batch, {n_waves} batches) with intake = `{base}` — "
        f"the Zipf corpus (one user = 30 % of events, one source = "
        f"40 % of docs, shared token head); waves split by id hash, "
        f"so every batch carries the hot keys at corpus share.  "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].  git "
        f"{sha}, loadavg {os.getloadavg()[0]:.1f}.  (v1 = r10: uniform "
        f"sf0.1 intake, 20 batches.)",
        "",
        "Sustainability reading: per-batch wall must be FLAT across "
        "batches (a wall that grows with ingested history cannot run "
        "forever); store/state growth must be linear in ingested rows "
        "(LSH, by design) or bounded by key/eval cardinality "
        "(SCD2 / decontam).  Hot-key state shares show whether one "
        "key's state swamps a store.",
        "",
    ]
    for r in results:
        c = r["curve"]
        head, tail = c[:3], c[-3:]
        lines += [
            f"## {r['stream']}",
            "",
            f"**{r['total_rows']} rows in {r['total_wall_s']}s = "
            f"{r['rows_per_s']} rows/s sustained across {len(c)} "
            f"batches.**",
            "",
        ]
        if r["stream"] == "composed_intake":
            lines += [
                "One continuous query DAG: url-canonical gate "
                "(dropDuplicatesWithinWatermark) → quality filter → "
                "content-hash dedup (second state store) → per-batch "
                "decontam shingle gate → incremental-LSH upsert.  "
                f"{r['rows_indexed']} docs reached the index.",
                "",
                "| batch | past dedup gates | quarantined | indexed | "
                "wall | lsh store |",
                "|---|---|---|---|---|---|",
            ]
            shown = {id(x) for x in head + tail}
            mid = [x for x in c if id(x) not in shown]
            sample = head + mid[:: max(1, len(mid) // 5)][:5] + tail
            seen = set()
            for b in sample:
                if b["batch"] in seen:
                    continue
                seen.add(b["batch"])
                lines.append(
                    f"| {b['batch']} | {b['rows_after_dedup_gates']} | "
                    f"{b['rows_quarantined']} | {b['rows_indexed']} | "
                    f"{b['wall_s']}s | "
                    f"{b['lsh_store_bytes'] // 1024} KiB |"
                )
            lines += [
                "",
                f"Final in-query dedup state rows per operator: "
                f"{r['hot_state']['final_state_rows_per_op']} (two "
                f"dedup stores; constant event time → no expiry by "
                f"design, growth = distinct keys).",
            ]
        else:
            lines += [
                "| batch | rows | wall | state |",
                "|---|---|---|---|",
            ]
            shown = {id(x) for x in head + tail}
            mid = [x for x in c if id(x) not in shown]
            sample = head + mid[:: max(1, len(mid) // 5)][:5] + tail
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
                    f"| {b['batch']} | {b['rows']} | {b['wall_s']}s | "
                    f"{state} |"
                )
            hs = r.get("hot_state", {})
            if hs and "note" not in hs:
                lines += ["", f"Hot-key state share: {hs}."]
            elif hs:
                lines += ["", f"Hot-key state note: {hs['note']}."]
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
                "sf_dir": base,
                "n_waves": n_waves,
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
