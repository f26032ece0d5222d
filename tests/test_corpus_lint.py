"""Corpus lint: invariants the oracle gate's CONTRACT depends on.

ADVICE r12 (operators/asof.py): asof_join's NULL equi-key window
semantics (NULL matches NULL, like any window partition) deliberately
diverge from DuckDB's native ASOF JOIN (NULL never matches NULL).
Four oracle-gated queries ride that seam (events_asof_join — now also
self-enforcing via an explicit IS NOT NULL on both sides —
events_scd2_pit_enrich, events_attribution_last_touch,
events_time_to_convert), so the gate is only meaningful while every
oracle-gated corpus keeps events.user_id non-null.  This lint makes
the requirement executable: a future poison/testdata refresh that adds
a NULL user_id fails HERE with the reason, instead of failing the
as-of gates with a baffling hash mismatch between two
each-behaving-as-designed engines.

DuckDB-only (no Spark session): lints run in milliseconds.
"""

import os

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every committed corpus that the oracle/poison gates read
_CORPORA = [
    os.path.join(_REPO, "testdata_sf0.001_poison"),
    os.path.join(_REPO, "testdata_sf1"),
    os.path.join(_REPO, "testdata_sf1_skew"),
    os.path.join(_REPO, "testdata_sf10"),
    os.path.join(_REPO, "testdata_sf10_skew"),
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("corpus", _CORPORA, ids=os.path.basename)
def test_events_user_id_non_null(corpus):
    path = os.path.join(corpus, "events.parquet")
    if not os.path.exists(path):
        pytest.skip(f"corpus not present: {corpus}")
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}/**/*.parquet') "
        "WHERE user_id IS NULL"
        if os.path.isdir(path)
        else f"SELECT count(*) FROM read_parquet('{path}') "
        "WHERE user_id IS NULL"
    ).fetchone()[0]
    assert n == 0, (
        f"{path}: {n} NULL user_id rows — the as-of oracle gates "
        "(events_asof_join/scd2_pit_enrich/attribution_last_touch/"
        "time_to_convert) require non-null join keys because Spark's "
        "window formulation groups NULL keys while DuckDB ASOF JOIN "
        "drops them; either pre-filter NULL keys in the new query or "
        "keep the corpus key non-null (ADVICE r12)"
    )
