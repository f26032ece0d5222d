"""Property-based (hypothesis) invariants for session-3 operators that
have algebraic contracts: SCD2 merge-equivalence on random logs and
parallel NTILE vs the builtin on random shapes.  Few examples, small
frames — each example is a Spark round trip."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

events_strategy = st.lists(
    st.tuples(
        st.integers(1, 5),                      # user_id
        st.sampled_from(["a", "b", "c"]),       # status
        st.integers(0, 10_000),                  # minutes offset
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(rows=events_strategy, cut_min=st.integers(0, 10_000))
def test_scd2_merge_equals_full_build_random(spark, rows, cut_min):
    """For ANY log and ANY global time split:
    merge(build(log < T), log >= T) == build(log)."""
    from sec_edgar_spark.operators.scd import scd2_build, scd2_merge

    base = dt.datetime(2024, 1, 1)
    data = [
        (u, s, base + dt.timedelta(minutes=m), i)
        for i, (u, s, m) in enumerate(rows)
    ]
    log = spark.createDataFrame(
        data, "user_id long, event_type string, ts timestamp, event_id long"
    )
    cut = base + dt.timedelta(minutes=cut_min)
    merged = scd2_merge(
        scd2_build(log.filter(F.col("ts") < cut)),
        log.filter(F.col("ts") >= cut),
    )

    def canon(df):
        return {
            (r.user_id, r.status, str(r.valid_from), str(r.valid_to), r.is_current)
            for r in df.collect()
        }

    assert canon(merged) == canon(scd2_build(log))


@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(1, 60),
    k=st.integers(1, 9),
    mult=st.integers(1, 97),
)
def test_parallel_ntile_matches_builtin_random(spark, n, k, mult):
    from sec_edgar_spark.operators.relational import parallel_ntile

    df = spark.range(n).select(
        ((F.col("id") * mult) % 41).alias("v"), F.col("id").alias("t")
    ).repartition(5)
    got = {
        (r.v, r.t): r.bucket
        for r in parallel_ntile(df, ["v", "t"], k).collect()
    }
    w = Window.orderBy("v", "t")
    want = {
        (r.v, r.t): r.b
        for r in df.withColumn("b", F.ntile(k).over(w)).collect()
    }
    assert got == want
