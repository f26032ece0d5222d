"""salted_join: row-identical to the plain join, spreads hot keys."""

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.relational import salted_join


def test_salted_equals_plain_join(spark):
    facts = spark.range(2000).select(
        F.when(F.col("id") % 10 < 8, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("rid"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("lab")
    )
    got = {
        (r.k, r.rid, r.lab)
        for r in salted_join(facts, dim, "k", 8, salt_source="rid").collect()
    }
    want = {(r.k, r.rid, r.lab) for r in facts.join(dim, "k").collect()}
    assert got == want


def test_hot_key_spreads_over_salts(spark):
    facts = spark.range(1000).select(
        F.lit(1).alias("k"), F.col("id").alias("rid")
    )
    from sec_edgar_spark.functions.text import md5_hash64

    n_salts = (
        facts.select(F.pmod(md5_hash64(F.col("rid")), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts == 8  # the hot key's rows occupy every salt bucket


def test_outer_joins_rejected(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", 8, how="full")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", 8, how="right")
