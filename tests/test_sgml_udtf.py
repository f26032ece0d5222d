"""sgml_docs UDTF: SQL-lateral explode matches the mapInPandas +
posexplode pipeline on the reference's own filing fixture."""

import os

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
FIXTURE = os.path.join(DATA, "filing_sample.txt")


def test_udtf_matches_pipeline(spark):
    from sec_edgar_spark.parsing.meta import (
        documents_table,
        parse_filings,
        read_filings,
    )
    from sec_edgar_spark.parsing.sgml_udtf import register

    register(spark)
    filings = read_filings(spark, FIXTURE)
    filings.createOrReplaceTempView("t_filings")

    got = {
        (r.doc_type, r.sequence, r.filename, r.text, r.is_uuencoded)
        for r in spark.sql(
            "SELECT t.* FROM t_filings f, LATERAL sgml_docs(f.content) t"
        ).collect()
    }
    want = {
        (r.type, r.sequence, r.filename, r.text, r.is_uuencoded)
        for r in documents_table(parse_filings(filings)).collect()
    }
    assert got and got == want


def test_udtf_null_input_yields_nothing(spark):
    from sec_edgar_spark.parsing.sgml_udtf import register

    register(spark)
    rows = spark.sql(
        "SELECT t.* FROM VALUES (CAST(NULL AS STRING)) v(c), "
        "LATERAL sgml_docs(v.c) t"
    ).collect()
    assert rows == []
