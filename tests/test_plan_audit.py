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
    from tools.plan_audit import (
        HOT_KEY_WINDOW_NOTES,
        PY_UDF_WHITELIST,
        audit,
    )

    rows = audit("/root/testdata/sf0.001")
    assert len(rows) >= 150
    errors = []
    hot_flagged = set()
    for name, flags in rows:
        if flags.get("HotKeyWindow"):
            hot_flagged.add(name)
            if name not in HOT_KEY_WINDOW_NOTES:
                errors.append(
                    f"{name}: corpus-keyed window partitioned by a "
                    "hot-capable key with no salt marker and no "
                    "HOT_KEY_WINDOW_NOTES row — salt it (salted_rank / "
                    "asof bucket_s / sessionize fragments) or document "
                    "why the per-key frame is bounded (VERDICT r10 #6)"
                )
    for name, flags in rows:
        if "PLAN_ERROR" in flags:
            errors.append(f"{name}: {flags['PLAN_ERROR']}")
        if flags.get("CartesianProduct"):
            errors.append(f"{name}: CartesianProduct")
        if (
            flags.get("BatchEvalPython") or flags.get("ArrowEvalPython")
        ) and name not in PY_UDF_WHITELIST:
            errors.append(f"{name}: python UDF outside whitelist")
        if flags.get("ExchangeDrift"):
            errors.append(
                f"{name}: Exchange count drift {flags['ExchangeDrift']} "
                "(measured!=pinned) — an intentional plan change must "
                "regenerate its pin (python tools/plan_audit.py "
                "--emit-pins); a silent regression (lost broadcast, "
                "extra repartition, unrolled loop without lineage "
                "truncation) must be fixed"
            )
        if flags.get("UnpinnedQuery"):
            errors.append(
                f"{name}: no Exchange pin in tools/plan_pins.json — "
                "every registry query must be pinned (--emit-pins)"
            )
    # the notes map may not go stale either: an entry whose query no
    # longer shows the flag (it got salted) must be removed so the map
    # stays an exact ledger of the live exposure
    for name in HOT_KEY_WINDOW_NOTES:
        if name not in hot_flagged:
            errors.append(
                f"{name}: HOT_KEY_WINDOW_NOTES entry but the plan no "
                "longer shows a HotKeyWindow — remove the stale note"
            )
    assert not errors, errors


def test_pin_file_covers_registry_exactly():
    """Fast no-Spark completeness gate: tools/plan_pins.json must pin
    EVERY queries() entry and nothing else (VERDICT r8 #4 — the global
    ceiling is gone; an unpinned query would otherwise only fail in the
    slow full-audit test)."""
    import json
    import sys

    sys.path.insert(0, ".")
    from tools.plan_audit import PINS_PATH
    import sec_edgar_spark.queries as Q

    with open(PINS_PATH) as fh:
        pins = set(json.load(fh))
    qnames = set(Q.queries())
    assert pins == qnames, (
        f"missing pins: {sorted(qnames - pins)[:10]}, "
        f"stale pins: {sorted(pins - qnames)[:10]}"
    )


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


def test_plan_audit_report_has_no_exchange_drift():
    """A committed PLAN_AUDIT.md must carry ZERO ExchangeDrift rows
    (VERDICT r13 #6: the r13 report was regenerated before the final
    re-pins and shipped drift rows the pins had already resolved — the
    count-match test above can't see that).  The audit flags drift
    when a measured plan's Exchange count disagrees with
    tools/plan_pins.json AT GENERATION TIME; pins are regenerated with
    every intentional plan change, so a drift row in the committed
    report always means the report is stale (or a regression shipped
    unpinned) — both are regenerate-and-look errors.

    The pin side of each drift annotation is the pins-file value at
    generation time, so any drift row also means report and pins were
    generated at different code states."""
    import re

    with open("PLAN_AUDIT.md") as fh:
        report = fh.read()
    drift = re.findall(r"\|\s*(\w+)\s*\|[^|\n]*ExchangeDrift×(\d+)!=(\d+)", report)
    assert not drift, (
        "PLAN_AUDIT.md carries ExchangeDrift rows — regenerate the "
        f"report at HEAD (python tools/plan_audit.py): {drift[:5]}"
    )


def test_whitelists_reference_live_queries():
    """Fast no-Spark hygiene gate: every name in the plan-audit
    whitelists must exist in the registry — a renamed or deleted query
    would otherwise leave a stale whitelist entry that silently
    re-arms if the name is ever reused."""
    import sys

    sys.path.insert(0, ".")
    from tools.plan_audit import (
        HOT_KEY_WINDOW_NOTES,
        PY_UDF_WHITELIST,
        TINY_WINDOW_WHITELIST,
    )
    import sec_edgar_spark.queries as Q

    qnames = set(Q.queries())
    stale = (
        PY_UDF_WHITELIST | TINY_WINDOW_WHITELIST | set(HOT_KEY_WINDOW_NOTES)
    ) - qnames
    assert not stale, f"whitelist entries not in registry: {sorted(stale)}"
