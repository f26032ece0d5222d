"""CI twin of tools/plan_audit.py: the HARD plan rules over the whole
registry — no CartesianProduct anywhere, no row-at-a-time Python UDF
outside the documented whitelist.  (BroadcastNestedLoopJoin against
broadcast 1-row bounds frames and tiny-frame global windows are
report-only — see PLAN_AUDIT.md.)  Marked slow: iterative trainers
(k-means, PQ) execute their training jobs during plan construction."""

import pytest


@pytest.mark.slow
def test_no_hard_antipatterns_anywhere(spark):
    import sys

    sys.path.insert(0, ".")
    from tools.plan_audit import PY_UDF_WHITELIST, audit

    rows = audit("/root/testdata/sf0.001")
    assert len(rows) >= 150
    errors = []
    for name, flags in rows:
        if "PLAN_ERROR" in flags:
            errors.append(f"{name}: {flags['PLAN_ERROR']}")
        if flags.get("CartesianProduct"):
            errors.append(f"{name}: CartesianProduct")
        if (
            flags.get("BatchEvalPython") or flags.get("ArrowEvalPython")
        ) and name not in PY_UDF_WHITELIST:
            errors.append(f"{name}: python UDF outside whitelist")
        if flags.get("ExcessExchanges"):
            errors.append(
                f"{name}: {flags['ExcessExchanges']} Exchanges — unrolled "
                "iteration without lineage truncation (localCheckpoint "
                "per round, see operators/graph.py)"
            )
    assert not errors, errors


@pytest.mark.slow
def test_audit_is_hermetic_under_cache_pollution(spark):
    """Regression for the r7 order-dependent gate failure: executing a
    query that .cache()s during construction (the capped dedup joins)
    used to leave InMemoryRelation entries that rewrote later audited
    plans — 57 Exchanges polluted vs 33 fresh.  audit() now clears the
    cache before every plan build, so the counts must be identical
    cold and after deliberately polluting the session."""
    import sys

    sys.path.insert(0, ".")
    from tools.plan_audit import audit
    import sec_edgar_spark.queries as Q

    targets = ["dedup_prefix_filter_capped", "dedup_containment_capped"]
    cold = dict(audit("/root/testdata/sf0.001", only=targets))
    # Pollute: build + execute a cache-using query and leave its cache.
    Q.queries()["dedup_prefix_filter_capped"](
        spark, "/root/testdata/sf0.001"
    ).count()
    polluted = dict(audit("/root/testdata/sf0.001", only=targets))
    spark.catalog.clearCache()
    for name in targets:
        assert cold[name].get("_shuffles") == polluted[name].get(
            "_shuffles"
        ), (name, cold[name], polluted[name])


def test_plan_audit_report_is_current():
    """PLAN_AUDIT.md must cover the FULL registry at HEAD — a stale
    report (regenerated before the last queries landed) silently
    under-audits.  The report's own header states its query count;
    pin it to len(queries())."""
    import re

    import sec_edgar_spark.queries as Q

    with open("PLAN_AUDIT.md") as fh:
        head = fh.read(500)
    m = re.search(r"(\d+) queries audited", head)
    assert m, "PLAN_AUDIT.md missing the 'N queries audited' header"
    assert int(m.group(1)) == len(Q.queries()), (
        f"PLAN_AUDIT.md audited {m.group(1)} queries but the registry "
        f"has {len(Q.queries())} — regenerate: python tools/plan_audit.py"
    )
