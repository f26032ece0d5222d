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

Usage: python tools/preflight.py   (exit 0 = green).
Documented pre-commit step: run this before any commit that touches
queries/, tools/plan_audit.py, or PLAN_AUDIT.md.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main() -> int:
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

    if failures:
        for f in failures:
            print(f"PREFLIGHT FAIL: {f}")
        return 1
    print(f"preflight green: {len(qnames)} queries, report current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
