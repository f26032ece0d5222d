"""CLI facade tests (reference cli.py parity, network-free)."""

from sec_edgar_spark.cli import main


def test_cli_query_to_parquet(spark, data_dir, tmp_path, capsys):
    out = str(tmp_path / "matches")
    rc = main(
        [
            "--index", f"{data_dir}/full-index/1996/QTR4/master.idx",
            "--filing-type", "10-K",
            "--start", "1996-01-01",
            "--end", "1996-12-31",
            "--out", out,
        ],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert {r.cik for r in got.collect()} == {320193, 40545}


def test_cli_lookup_show(spark, data_dir, capsys):
    rc = main(
        [
            "--index", f"{data_dir}/full-index/1996/QTR4/master.idx",
            "--lookup", "AAPL",
            "--cik-map", f"{data_dir}/company_tickers.json",
            "--count", "1",
        ],
        spark=spark,
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "320193" in printed and "789019" not in printed


def test_cli_mirror_build_and_pruned_query(spark, tmp_path):
    """--to-mirror writes the partitioned mirror; a follow-up query
    against the mirror partition-prunes."""
    from sec_edgar_spark.cli import main

    dest = str(tmp_path / "mirror")
    rc = main(
        ["--index", "tests/data/full-index/1996/QTR4/master.idx", "--to-mirror", dest],
        spark=spark,
    )
    assert rc == 0
    mirrored = spark.read.parquet(dest)
    assert mirrored.count() > 0
    assert set(mirrored.select("year").distinct().toPandas()["year"]) == {1996}
    rc = main(
        ["--index", dest, "--filing-type", "10-K", "--show", "1"], spark=spark
    )
    assert rc == 0
