"""Warning parity on uncapped/unsalted twins (VERDICT r10 #5): every
registered query that keeps oracle-exact-but-skew-fragile semantics
while a capped/salted production twin exists MUST name that twin in
its own docstring — the warning lives at the definition site, not only
in a bench report a reader may never open."""

import sec_edgar_spark.queries as Q

# uncapped/unsalted oracle-exact form -> its scale-safe production twin.
# Grown mechanically: every registered *_capped/*_salted query whose
# exact twin is also registered appears here (the companion assertion
# below fails if a future twin pair is added without extending this
# map).
TWINS = {
    "events_attribution_linear": "events_attribution_capped",
    "events_sessionize": "events_sessionize_salted",
    "dedup_semantic": "dedup_semantic_capped",
    "er_match_score": "er_match_score_capped",
    "dedup_ngram_jaccard_pairs": "dedup_prefix_filter_capped",
    "window_moving_avg": "window_moving_avg_salted",
}


def test_every_uncapped_twin_names_its_production_path():
    qs = Q.queries()
    for base, twin in TWINS.items():
        assert base in qs and twin in qs, (base, twin)
        doc = qs[base].__doc__ or ""
        assert twin in doc, (
            f"{base} has a scale-safe twin ({twin}) but its docstring "
            "does not name it — add the hot-key warning at the "
            "definition site"
        )
        assert "WARNING" in doc, f"{base}: warning block missing"


def test_twin_map_is_complete():
    """Any new *_capped/*_salted registration whose name-mangled base
    is also a registered query must be added to TWINS (with the
    docstring warning)."""
    qs = Q.queries()
    suffixes = ("_capped", "_salted")
    for name in qs:
        for suf in suffixes:
            if name.endswith(suf):
                base = name[: -len(suf)]
                if base in qs:
                    assert base in TWINS and TWINS[base] == name, (
                        f"{name} pairs with registered {base} but the "
                        "pair is not in TWINS"
                    )
