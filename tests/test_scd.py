"""SCD2 build + incremental merge: the merge-equivalence invariant
(merge(build(old), new) == build(all)) on synthetic logs and on the
real events parquet, plus edge cases (new keys, untouched keys)."""

import os

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.scd import scd2_build, scd2_merge

SF_DIR = "/root/testdata/sf0.001"


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )


def _canon(df):
    return {
        (r.user_id, r.status, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in df.collect()
    }


def test_merge_equals_full_build_synthetic(spark):
    import datetime as dt

    t = lambda d, h: dt.datetime(2024, 1, d, h)
    rows = [
        (1, "signup", t(1, 0), 1),
        (1, "active", t(2, 0), 2),
        (1, "churned", t(20, 0), 3),   # new-half event, existing key
        (2, "signup", t(3, 0), 4),     # untouched key
        (3, "signup", t(21, 0), 5),    # brand-new key in the delta
        (3, "active", t(22, 0), 6),
    ]
    log = _log(spark, rows)
    cut = dt.datetime(2024, 1, 16)
    merged = scd2_merge(
        scd2_build(log.filter(F.col("ts") < cut)),
        log.filter(F.col("ts") >= cut),
    )
    assert _canon(merged) == _canon(scd2_build(log))


def test_merge_tie_timestamps_deterministic(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 20)
    # two delta events with the SAME timestamp: event_id breaks the tie
    rows = [
        (7, "a", t0, 1),
        (7, "b", t1, 2),
        (7, "c", t1, 3),
    ]
    log = _log(spark, rows)
    cut = dt.datetime(2024, 1, 10)
    merged = scd2_merge(
        scd2_build(log.filter(F.col("ts") < cut)),
        log.filter(F.col("ts") >= cut),
    )
    assert _canon(merged) == _canon(scd2_build(log))
    cur = [r for r in merged.collect() if r.is_current]
    assert len(cur) == 1 and cur[0].status == "c"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_merge_equals_full_build_real_events(spark):
    from sec_edgar_spark.catalog import table

    e = table(spark, SF_DIR, "events")
    cut = F.lit("2024-01-16 00:00:00").cast(e.schema["ts"].dataType)
    merged = scd2_merge(
        scd2_build(e.filter(F.col("ts") < cut)),
        e.filter(F.col("ts") >= cut),
    )
    assert _canon(merged) == _canon(scd2_build(e))
