"""Round-over-round bench diff with ambient-noise attribution
(VERDICT r12 #4).

Problem this closes: r12's round-over-round analysis could not tell a
real plan/compute regression from loaded-box inflation — the wall-time
deltas were argued by hand from loadavg.  Both r12 and r13 BENCH_LOCAL
artifacts carry per-query job-group executor task-time, which is the
discriminator: executor task-time moves when the PLAN or the COMPUTE
changed; it stays flat when only the wall moved (scheduler delay, CPU
contention from a loaded host, page-cache misses).

Classification per shared query (threshold r, default 1.2):

- ``compute``  — task_time ratio outside [1/r, r]: the executors did
  materially different work; a plan change, a dispatch flip, or a
  constant-factor code change.  These are the real deltas.
- ``ambient``  — wall ratio outside the band but task_time inside it:
  same executor work, different elapsed time — host noise, not code.
- ``flat``     — both inside the band.

The summary separates Σwall and Σtask over shared queries, so the
headline claim ("within X% of round N") can be made on task-time —
immune to the loaded-box problem that clouded r12's stamp.

Usage:
  python tools/bench_compare.py OLD.json NEW.json [--threshold 1.2]
                                [--json OUT.json]

Exit code 0 always (an analysis tool, not a gate); pipe --json into
round notes for machine-readable deltas.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def classify(
    old: dict, new: dict, threshold: float = 1.2
) -> dict:
    qo, qn = old.get("queries", {}), new.get("queries", {})
    to, tn = old.get("task_time", {}) or {}, new.get("task_time", {}) or {}
    # task_time is only comparable when both artifacts measured it the
    # SAME way: r12's stage-window attribution booked concurrent jobs'
    # stages into every sample (Σtask 1184.9s) while r13's job-group
    # scoping does not (112.4s) — a cross-method ratio is a metric
    # artifact, and classifying on it labeled all 145 shared queries
    # "compute" for a round that was actually flat-to-faster.  The
    # method is identified by task_time_note; on mismatch, fall back
    # to wall-only classification and say so.
    task_incomparable = (
        bool(to)
        and bool(tn)
        and old.get("task_time_note") != new.get("task_time_note")
    )
    if task_incomparable:
        to, tn = {}, {}
    shared = sorted(set(qo) & set(qn))
    rows = []
    for name in shared:
        wo, wn = qo[name], qn[name]
        wall_ratio = wn / wo if wo else float("inf")
        ta, tb = to.get(name), tn.get(name)
        task_ratio = (tb / ta) if (ta and tb) else None
        if task_ratio is not None and not (
            1 / threshold <= task_ratio <= threshold
        ):
            kind = "compute"
        elif not (1 / threshold <= wall_ratio <= threshold):
            # wall moved but executor work did not (or task_time is
            # missing on either side and we can't attribute better)
            kind = "ambient" if task_ratio is not None else "wall-only"
        else:
            kind = "flat"
        rows.append(
            {
                "query": name,
                "wall_old_s": wo,
                "wall_new_s": wn,
                "wall_ratio": round(wall_ratio, 3),
                "task_old_s": ta,
                "task_new_s": tb,
                "task_ratio": round(task_ratio, 3)
                if task_ratio is not None
                else None,
                "kind": kind,
            }
        )
    sum_wall_old = sum(qo[n] for n in shared)
    sum_wall_new = sum(qn[n] for n in shared)
    both_task = [n for n in shared if to.get(n) and tn.get(n)]
    sum_task_old = sum(to[n] for n in both_task)
    sum_task_new = sum(tn[n] for n in both_task)
    return {
        "threshold": threshold,
        "shared_queries": len(shared),
        "added": sorted(set(qn) - set(qo)),
        "removed": sorted(set(qo) - set(qn)),
        "sum_wall_old_s": round(sum_wall_old, 1),
        "sum_wall_new_s": round(sum_wall_new, 1),
        "wall_total_ratio": round(sum_wall_new / sum_wall_old, 3)
        if sum_wall_old
        else None,
        "sum_task_old_s": round(sum_task_old, 1),
        "sum_task_new_s": round(sum_task_new, 1),
        "task_total_ratio": round(sum_task_new / sum_task_old, 3)
        if sum_task_old
        else None,
        "loadavg_old": [
            old.get("loadavg_1m_start"), old.get("loadavg_1m")
        ],
        "loadavg_new": [
            new.get("loadavg_1m_start"), new.get("loadavg_1m")
        ],
        "sha_old": old.get("git_sha"),
        "sha_new": new.get("git_sha"),
        "task_incomparable": task_incomparable,
        "rows": rows,
        "n_compute": sum(1 for r in rows if r["kind"] == "compute"),
        "n_ambient": sum(
            1 for r in rows if r["kind"] in ("ambient", "wall-only")
        ),
        "n_flat": sum(1 for r in rows if r["kind"] == "flat"),
    }


def main() -> int:
    argv = sys.argv[1:]
    threshold, out_json, args = 1.2, None, []
    i = 0
    while i < len(argv):
        if argv[i] == "--threshold":
            threshold = float(argv[i + 1])
            i += 2
        elif argv[i] == "--json":
            out_json = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    rep = classify(load(args[0]), load(args[1]), threshold)

    print(
        f"compare {rep['sha_old']} -> {rep['sha_new']}: "
        f"{rep['shared_queries']} shared queries "
        f"(+{len(rep['added'])} added, -{len(rep['removed'])} removed)"
    )
    print(
        f"loadavg old {rep['loadavg_old']}, new {rep['loadavg_new']}"
    )
    if rep["task_incomparable"]:
        print(
            "WARNING: task_time attribution methods differ between "
            "artifacts (task_time_note mismatch) — task columns "
            "ignored, classification is wall-only"
        )
    line = (
        f"Σwall {rep['sum_wall_old_s']}s -> {rep['sum_wall_new_s']}s "
        f"({rep['wall_total_ratio']}x)"
    )
    if rep["task_total_ratio"] is not None:
        line += (
            f"; Σtask {rep['sum_task_old_s']}s -> "
            f"{rep['sum_task_new_s']}s ({rep['task_total_ratio']}x)"
        )
    print(line)
    print(
        f"{rep['n_compute']} compute / {rep['n_ambient']} ambient / "
        f"{rep['n_flat']} flat (threshold {threshold}x)"
    )
    sig = [r for r in rep["rows"] if r["kind"] != "flat"]
    sig.sort(key=lambda r: -(r["task_ratio"] or r["wall_ratio"]))
    if sig:
        print(
            f"{'query':42s} {'wall':>14s} {'task':>14s} kind"
        )
        for r in sig:
            wall = f"{r['wall_old_s']:.2f}->{r['wall_new_s']:.2f}"
            task = (
                f"{r['task_old_s']:.2f}->{r['task_new_s']:.2f}"
                if r["task_ratio"] is not None
                else "-"
            )
            print(
                f"{r['query']:42s} {wall:>14s} {task:>14s} {r['kind']}"
            )
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(rep, fh, indent=1)
            fh.write("\n")
        print(f"-> {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
