"""Plan-quality regression tests: the physical properties the engine
is designed around must survive refactors (SURVEY §4 / README rules).
"""

import pytest


@pytest.fixture(scope="module")
def plans(spark):
    import sec_edgar_spark.queries as Q

    qs = Q.queries()
    sf = "/root/testdata/sf0.001"

    def plan(name):
        df = qs[name](spark, sf)
        return df._jdf.queryExecution().executedPlan().toString()

    return plan


def test_q1_filter_and_projection_pushed(plans):
    p = plans("q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: only the 7 needed columns reach the scan
    rs = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in rs and "l_shipdate" in rs


def test_q5_broadcasts_dims(plans):
    p = plans("q5_region_revenue")
    assert p.count("BroadcastHashJoin") >= 3  # supplier/nation/region at least


def test_topk_uses_window_group_limit(plans):
    assert "WindowGroupLimit" in plans("l1_topk_per_group")


def test_global_topk_uses_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans("sort_limit_global")


def test_cik_resolution_broadcasts(plans):
    assert "BroadcastHashJoin" in plans("edgar_cik_resolution")


def test_lsh_candidates_no_cartesian(plans):
    p = plans("dedup_minhash_lsh_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
