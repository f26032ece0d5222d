"""Arrow scalar + GROUPED_AGG pandas_udf surface: exact agreement
with the built-in equivalents, on real testdata."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
skip = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)


@skip
def test_scalar_digit_sum_matches_expression(spark):
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.functions.arrow_udfs import digit_sum

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey").limit(500)
    got = {
        r.l_orderkey: r.ds
        for r in li.select(
            "l_orderkey", digit_sum("l_orderkey").alias("ds")
        ).collect()
    }
    # reference: JVM expression over the digits of the string form
    want = {
        r.l_orderkey: r.ds
        for r in li.select(
            "l_orderkey",
            F.aggregate(
                F.transform(
                    F.split(F.col("l_orderkey").cast("string"), ""),
                    lambda ch: F.when(ch != "", ch.cast("long")).otherwise(0),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, d: acc + d,
            ).alias("ds"),
        ).collect()
    }
    assert got == want and got


@skip
def test_scalar_digit_sum_nulls_and_negatives(spark):
    """NULL in → NULL out (not 0); negative in → digit sum of the
    magnitude (ADVICE r8: na_value=0 silently zeroed NULLs, and
    numpy's floored // on negatives produced garbage)."""
    from sec_edgar_spark.functions.arrow_udfs import digit_sum

    df = spark.createDataFrame(
        [(1, 123), (2, None), (3, -405), (4, 0)], "id INT, v BIGINT"
    )
    got = {
        r.id: r.ds for r in df.select("id", digit_sum("v").alias("ds")).collect()
    }
    assert got == {1: 6, 2: None, 3: 9, 4: 0}


@skip
def test_scalar_digit_sum_survives_safe_arrow_cast(spark):
    """The kernel must return a NULLABLE INTEGER series, never
    float64+NaN relying on an unsafe float->bigint Arrow cast: under
    spark.sql.execution.pandas.convertToArrowArraySafely=true the
    unsafe cast raises (ADVICE r9).  Run the null case with the safe
    conf ON and assert identical results."""
    from sec_edgar_spark.functions.arrow_udfs import digit_sum

    key = "spark.sql.execution.pandas.convertToArrowArraySafely"
    prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        df = spark.createDataFrame(
            [(1, 999), (2, None), (3, -18)], "id INT, v BIGINT"
        )
        got = {
            r.id: r.ds
            for r in df.select("id", digit_sum("v").alias("ds")).collect()
        }
        assert got == {1: 27, 2: None, 3: 9}
    finally:
        spark.conf.set(key, prev)


def test_sign_bits_plane_count_guard():
    """>62 hyperplanes must fail at build with a clear message, not a
    cryptic int64-overflow lit() error (ADVICE r8)."""
    from sec_edgar_spark.functions.vectors import random_projection_sign_bits

    with pytest.raises(ValueError, match="at most 62"):
        random_projection_sign_bits("embedding", [[1.0, 0.0]] * 63)


@skip
def test_grouped_agg_sum_of_squares_matches_builtin(spark):
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.functions.arrow_udfs import sum_of_squares

    li = table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    got = {
        r.l_returnflag: r.ssq
        for r in li.groupBy("l_returnflag")
        .agg(sum_of_squares("q").alias("ssq"))
        .collect()
    }
    want = {
        r.l_returnflag: r.ssq
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ssq"))
        .collect()
    }
    assert got == want and got


@skip
def test_grouped_agg_works_as_window_function(spark):
    from pyspark.sql import Window
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.functions.arrow_udfs import sum_of_squares

    li = (
        table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", F.col("l_quantity").cast("long").alias("q"))
        .limit(200)
    )
    w = Window.partitionBy("l_returnflag")
    rows = li.withColumn("ssq", sum_of_squares("q").over(w)).collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    for flag, grp in by_flag.items():
        expect = sum(r.q * r.q for r in grp)
        assert all(r.ssq == expect for r in grp), flag
