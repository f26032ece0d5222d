"""Pre-commit meta-gate check (<5s, no Spark session).

Round 7 shipped a red suite because a gate-rule change landed without a
whole-suite run.  This preflight runs the two cheap meta-gates that
caught it, so the failure mode costs seconds instead of a round:

1. PLAN_AUDIT.md currency — the report's own "N queries audited"
   header must equal len(queries()) at HEAD (a stale report silently
   under-audits whatever landed after its regeneration).
2. Registry/oracle symmetry — every oracle_sql() key must exist in
   queries() (a dangling oracle means a renamed or deleted query whose
   correctness row would silently vanish).

3. BENCH_LOCAL.json currency — the repo-side per-query bench record
   must cover exactly bench.HEADLINE (the driver artifact truncates;
   this file is the round-over-round comparison source of truth).

4. (--stamp-check) SUITE-STAMP + SWEEP-STAMP SHA == HEAD — VERDICT r12
   #7: r12 ended with the suite stamp six commits behind HEAD, leaving
   the NULL-key fixes formally unverified by the whole suite.  The
   round-end discipline is now executable: run
   `python tools/preflight.py --stamp-check` as the LAST gate; it
   fails if either COVERAGE.md stamp names a SHA other than HEAD.

Usage: python tools/preflight.py            (exit 0 = green, <5s)
       python tools/preflight.py --stamp-check  (round-end: both
           COVERAGE.md stamps must be at HEAD)
       python tools/preflight.py --full     (also runs the whole pytest
           suite and stamps result + SHA into COVERAGE.md — MANDATORY
           for the round's final registry-touching commit; r7 and
           nearly r8 shipped red/unverified suites without it)
       python tools/preflight.py --sweep [SF_DIR]   (runs the FULL
           oracle registry via tools/check_oracle.py at SF_DIR,
           default /root/testdata/sf0.1, and stamps result + SHA into
           COVERAGE.md between the SWEEP-STAMP markers — the r9
           sf0.1 sweep caught the only two wrong answers in the
           system, both invisible at sf0.01, so this is a STANDING
           round-end gate alongside --full)
Documented pre-commit step: run the fast mode before any commit that
touches queries/, tools/plan_audit.py, or PLAN_AUDIT.md; run --full
AND --sweep before (i.e. dated after) the round's last commit that
touches queries/ or tools/ — both stamps must postdate that commit.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, ".")


def full_suite_stamp() -> int:
    """Run the whole pytest suite and stamp the outcome + HEAD SHA into
    COVERAGE.md (between the SUITE-STAMP markers, replacing the old
    stamp).  Returns pytest's exit code."""
    import time

    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        capture_output=True,
        text=True,
    )
    tail = (proc.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else "no output"
    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    _stamp_coverage(
        "SUITE-STAMP",
        f"**Whole-suite run** (tools/preflight.py --full): `{summary}` at "
        f"`{sha}` (+ uncommitted work-tree state at stamp time), "
        f"{time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}.",
    )
    print(f"suite: {summary} @ {sha} -> COVERAGE.md stamp")
    return proc.returncode


def _stamp_coverage(marker: str, body: str) -> None:
    """Replace (or append) the `<!-- {marker} --> ... <!-- /{marker} -->`
    block in COVERAGE.md."""
    stamp = f"<!-- {marker} -->\n{body}\n<!-- /{marker} -->"
    with open("COVERAGE.md") as fh:
        cov = fh.read()
    if f"<!-- {marker} -->" in cov:
        cov = re.sub(
            rf"<!-- {marker} -->.*?<!-- /{marker} -->", stamp, cov, flags=re.S
        )
    else:
        cov = cov.rstrip() + "\n\n" + stamp + "\n"
    with open("COVERAGE.md", "w") as fh:
        fh.write(cov)


def sweep_stamp(sf_dir: str) -> int:
    """Run the full oracle registry at sf_dir (the scale that catches
    what sf0.01 can't — r9 found its only two wrong answers this way)
    and stamp the result + HEAD SHA into COVERAGE.md."""
    import time

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", sf_dir],
        capture_output=True,
        text=True,
    )
    lines = [
        ln for ln in (proc.stdout or "").replace("\r", "\n").splitlines() if ln
    ]
    summary = lines[-1] if lines else "no output"
    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    _stamp_coverage(
        "SWEEP-STAMP",
        f"**Full-registry oracle sweep** (tools/preflight.py --sweep "
        f"{sf_dir}): `{summary}` at `{sha}` (+ uncommitted work-tree "
        f"state at stamp time), {time.time()-t0:.0f}s, "
        f"{time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}.",
    )
    print(f"sweep: {summary} @ {sha} -> COVERAGE.md stamp")
    return proc.returncode


def stamp_head_check() -> int:
    """Fail unless BOTH COVERAGE.md stamps (SUITE-STAMP, SWEEP-STAMP)
    name the current HEAD short SHA — the round-end staleness gate
    (VERDICT r12 #7).  Run AFTER --full and --sweep, as the final
    check before the round's last commit; note the stamps themselves
    modify COVERAGE.md, so the closing commit contains exactly the
    stamp refresh and nothing code-bearing."""
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    with open("COVERAGE.md") as fh:
        cov = fh.read()
    bad = []
    for marker in ("SUITE-STAMP", "SWEEP-STAMP"):
        m = re.search(
            rf"<!-- {marker} -->.*?at\s+`([0-9a-f]+)`.*?<!-- /{marker} -->",
            cov,
            flags=re.S,
        )
        if not m:
            bad.append(f"{marker}: missing from COVERAGE.md")
        elif m.group(1) != head:
            bad.append(f"{marker}: stamped at {m.group(1)}, HEAD is {head}")
    if bad:
        for b in bad:
            print(f"PREFLIGHT FAIL (stamp-check): {b}")
        return 1
    print(f"stamp-check green: both stamps at HEAD {head}")
    return 0


def main() -> int:
    import bench
    import sec_edgar_spark.queries as Q

    failures: list[str] = []

    qnames = set(Q.queries())
    with open("PLAN_AUDIT.md") as fh:
        head = fh.read(500)
    m = re.search(r"(\d+) queries audited", head)
    if not m:
        failures.append("PLAN_AUDIT.md missing 'N queries audited' header")
    elif int(m.group(1)) != len(qnames):
        failures.append(
            f"PLAN_AUDIT.md stale: audited {m.group(1)}, registry has "
            f"{len(qnames)} — regenerate: python tools/plan_audit.py"
        )

    dangling = set(Q.oracle_sql()) - qnames
    if dangling:
        failures.append(f"oracle_sql keys missing from queries(): {dangling}")

    # BENCH_LOCAL.json must cover exactly the current HEADLINE set —
    # a headline query added without a bench rerun leaves the repo's
    # per-query record silently stale (VERDICT r8 #2).
    try:
        with open("BENCH_LOCAL.json") as fh:
            bl = json.load(fh)
        covered = set(bl.get("queries", {})) | set(bl.get("errors", {}))
        if covered != set(bench.HEADLINE):
            missing = set(bench.HEADLINE) - covered
            extra = covered - set(bench.HEADLINE)
            failures.append(
                f"BENCH_LOCAL.json stale vs bench.HEADLINE "
                f"(missing={sorted(missing)[:5]}, extra={sorted(extra)[:5]}) "
                f"— rerun: python bench.py"
            )
    except FileNotFoundError:
        failures.append("BENCH_LOCAL.json missing — run: python bench.py")

    if failures:
        for f in failures:
            print(f"PREFLIGHT FAIL: {f}")
        return 1
    print(f"preflight green: {len(qnames)} queries, report current")
    if "--stamp-check" in sys.argv:
        return stamp_head_check()
    rc = 0
    if "--full" in sys.argv:
        rc = full_suite_stamp()
    if "--sweep" in sys.argv and rc == 0:
        i = sys.argv.index("--sweep")
        rest = sys.argv[i + 1 :]
        # Any following token that is not another flag names the sweep
        # dir (relative paths included) — keying on '/' silently swept
        # the default dir for 'sf1dir'-style names and stamped
        # COVERAGE.md with a result for the wrong scale.
        if rest and not rest[0].startswith("--"):
            sf_dir = rest[0]
            if not os.path.isdir(sf_dir):
                print(f"PREFLIGHT FAIL: --sweep dir does not exist: {sf_dir}")
                return 1
        else:
            sf_dir = "/root/testdata/sf0.1"
        rc = sweep_stamp(sf_dir)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
