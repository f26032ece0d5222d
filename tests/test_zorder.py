"""Morton/z-order key: correctness of the interleave and the locality
property that makes min/max file skipping work in two dimensions."""

from pyspark.sql import functions as F

from sec_edgar_spark.operators.zorder import morton_key, morton_key_sql


def test_interleave_known_values(spark):
    # x=0b11, y=0b01 -> bits: y1 x1 y0 x0 = 0 1 1 1 = 7
    df = spark.createDataFrame([(3, 1)], "x long, y long").select(
        morton_key(F.col("x"), F.col("y"), bits=4).alias("z")
    )
    assert df.collect()[0]["z"] == 0b0111
    # x=0, y=0 -> 0; x=2^b-1,y=2^b-1 -> 2^(2b)-1
    df2 = spark.createDataFrame([(0, 0), (15, 15)], "x long, y long").select(
        morton_key(F.col("x"), F.col("y"), bits=4).alias("z")
    )
    assert [r["z"] for r in df2.collect()] == [0, 255]


def test_sql_twin_matches_spark(spark):
    """morton_key_sql must equal morton_key bit-for-bit (DuckDB replay
    is what the oracle checks; here we check the SQL string itself via
    Spark's own parser on the shift/mask arithmetic)."""
    import duckdb

    rows = [(i * 37 % 256, i * 91 % 256) for i in range(64)]
    spark_z = (
        spark.createDataFrame(rows, "x long, y long")
        .select(morton_key(F.col("x"), F.col("y"), bits=8).alias("z"))
        .collect()
    )
    duck_z = duckdb.sql(
        "SELECT " + morton_key_sql("x", "y", 8) + " AS z FROM (SELECT "
        "unnest($xs::BIGINT[]) AS x, unnest($ys::BIGINT[]) AS y)",
        params={"xs": [r[0] for r in rows], "ys": [r[1] for r in rows]},
    ).fetchall()
    assert [r["z"] for r in spark_z] == [r[0] for r in duck_z]


def test_zorder_chunks_bound_both_dimensions(spark):
    """Sort a 2-d grid by morton key and cut it into chunks (stand-ins
    for parquet files): every chunk's bounding box must be small in
    BOTH dimensions, unlike a row-major (x-then-y) sort where each x
    slice spans the full y domain.  This is the file-skipping
    property: a filter on either dimension prunes most chunks."""
    n = 64  # 64x64 grid, 4096 points
    grid = (
        spark.range(n * n)
        .select((F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
    )
    z = grid.select("x", "y", morton_key(F.col("x"), F.col("y"), 6).alias("z"))
    chunk = F.shiftright("z", 8)  # 256 keys/chunk -> 16 chunks
    boxes = (
        z.groupBy(chunk.alias("c"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(boxes) == 16
    # every morton chunk of 256 keys is a 16x16 tile
    assert all(r["dx"] <= 15 and r["dy"] <= 15 for r in boxes)
    # row-major chunks of the same size span the full x domain
    rm = (
        grid.select("x", "y", (F.col("y") * n + F.col("x")).alias("k"))
        .groupBy(F.shiftright("k", 8).alias("c"))
        .agg((F.max("x") - F.min("x")).alias("dx"))
        .collect()
    )
    assert all(r["dx"] == n - 1 for r in rm)


def test_bits_validation():
    import pytest

    with pytest.raises(ValueError):
        morton_key(F.lit(1), F.lit(1), bits=0)
    with pytest.raises(ValueError):
        morton_key(F.lit(1), F.lit(1), bits=40)
