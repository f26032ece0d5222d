"""Property-based equality: asof_join(bucket_s=...) ≡ the classic
single-window form on RANDOM streams across every (direction, strict)
combination and random bucket widths — the adversarial-case tests in
test_asof.py pin known traps (bucket edges, empty-bucket carries);
these search for unknown ones (hypothesis shrinks counterexamples)."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from sec_edgar_spark.operators.asof import asof_join

BASE = 1_700_000_000

# Timestamps cluster on a coarse grid (ties common) and spread over
# several bucket widths at the smallest bucket; two shared keys plus
# one left-only and one right-only key exercise the outer-null path.
_stream = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 30_000)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(
    lrows=_stream,
    rrows=_stream,
    direction=st.sampled_from(["backward", "forward"]),
    strict=st.booleans(),
    bucket_s=st.integers(1, 7200),
)
def test_salted_asof_equals_single_window(
    spark, lrows, rrows, direction, strict, bucket_s
):
    def ts(off):
        return datetime.datetime.utcfromtimestamp(BASE + off)

    left = spark.createDataFrame(
        [(i, u, ts(off)) for i, (u, off) in enumerate(lrows)],
        "lid long, key long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1000 + j, u if u != 4 else 5, ts(off), float(j))
         for j, (u, off) in enumerate(rrows)],
        "rid long, key long, rts timestamp, rval double",
    )
    kw = dict(
        on="key", left_ts="lts", right_ts="rts",
        direction=direction, strict=strict,
    )
    classic = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    salted = sorted(
        map(tuple, asof_join(left, right, bucket_s=bucket_s, **kw).collect())
    )
    assert classic == salted and classic
