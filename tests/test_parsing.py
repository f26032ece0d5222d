"""SGML/Form-4/uudecode parsing tests (C14-C19, S15)."""

import datetime
from decimal import Decimal

from sec_edgar_spark.parsing import meta, uu
from sec_edgar_spark.parsing.form4 import parse_form4


def _sample_text(data_dir):
    with open(f"{data_dir}/filing_sample.txt") as f:
        return f.read()


def test_parse_header_flat_and_nested(data_dir):
    parsed = meta.parse_filing(_sample_text(data_dir))
    md = parsed["metadata"]
    assert parsed["accession_number"] == "0000320193-24-000004"
    assert md["ACCEPTANCE-DATETIME"] == "20240115180354"
    assert md["CONFORMED SUBMISSION TYPE"] == "4"
    assert md["FILER/COMPANY DATA/COMPANY CONFORMED NAME"] == "Apple Inc."
    assert md["FILER/COMPANY DATA/CENTRAL INDEX KEY"] == "0000320193"
    assert md["FILER/FILING VALUES/FORM TYPE"] == "4"


def test_parse_documents(data_dir):
    docs = meta.parse_filing(_sample_text(data_dir))["documents"]
    assert [d["type"] for d in docs] == ["4", "EX-24", "GRAPHIC"]
    assert [d["sequence"] for d in docs] == ["1", "2", "3"]
    assert docs[0]["filename"] == "form4.xml"
    assert "<ownershipDocument>" in docs[0]["text"]
    assert [d["is_uuencoded"] for d in docs] == [False, False, True]


def test_uudecode_roundtrip(data_dir):
    docs = meta.parse_filing(_sample_text(data_dir))["documents"]
    blob = uu.uudecode_text(docs[2]["text"])
    assert blob == b"spark-edgar binary payload \x00\x01\x02 end"


def test_parse_filings_spark_stage(spark, data_dir):
    filings = meta.read_filings(spark, f"{data_dir}/filing_sample.txt")
    parsed = meta.parse_filings(filings)
    table = meta.documents_table(parsed)
    rows = table.orderBy("seq_doc").collect()
    assert len(rows) == 3
    assert rows[0].accession_number == "0000320193-24-000004"
    assert rows[0].type == "4"
    assert rows[2].is_uuencoded is True


def test_form4_transactions(spark, data_dir):
    with open(f"{data_dir}/form4_sample.xml") as f:
        xml = f.read()
    df = spark.createDataFrame(
        [("0000320193-21-000001", xml)], ["accession_number", "xml"]
    )
    rows = parse_form4(df).orderBy("transaction_date").collect()
    assert len(rows) == 2
    t0, t1 = rows
    assert t0.security_title == "Common Stock"
    assert t0.transaction_date == datetime.date(2021, 5, 14)
    assert t0.transaction_code == "S"
    assert t0.equity_swap_involved is False
    assert t0.transaction_shares == Decimal("1000.0000")
    assert t0.transaction_price_per_share == Decimal("125.0400")
    assert t0.acquired_disposed_code == "D"
    assert t0.shares_owned_following == Decimal("50000.0000")
    assert t0.direct_or_indirect_ownership == "D"
    assert t1.transaction_code == "G"
    assert t1.equity_swap_involved is True
    assert t1.transaction_shares == Decimal("250.5000")
    assert t1.direct_or_indirect_ownership == "I"
