"""Phrase-merge semantics: left-to-right non-overlapping replace is
identical on both engines (the property the oracle relies on), and the
learned trajectory is deterministic."""

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.mark.timeout(120)
def test_replace_overlap_semantics_match_duckdb(spark):
    cases = [" a a a ", " x y x y x ", " x y x y x y ", " q x y x y p "]
    sdf = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [
        r.r
        for r in sdf.select(
            F.replace("s", F.lit(" x y "), F.lit(" x_y ")).alias("r")
        ).collect()
    ]
    want = [
        duckdb.sql(
            f"SELECT replace('{c}', ' x y ', ' x_y ')"
        ).fetchone()[0]
        for c in cases
    ]
    assert got == want
    # the shared-delimiter quirk: consecutive pairs merge alternately
    assert got[1] == " x_y x y x "


@pytest.mark.timeout(240)
def test_phrase_merge_trajectory_deterministic(spark):
    from sec_edgar_spark.queries.textops import text_phrase_merge

    sf = "/root/testdata/sf0.001"
    a = text_phrase_merge(spark, sf).collect()
    b = text_phrase_merge(spark, sf).collect()
    assert a == b
    assert [r.iteration for r in a] == [1, 2, 3]
    # merges actually happened and never exceed the counted pairs
    for r in a:
        assert 0 < r.n_merged <= r.pair_count
