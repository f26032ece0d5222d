"""cik_map / REST-JSON source tests (S5, S7-S10, J1)."""

import datetime
from decimal import Decimal

from sec_edgar_spark.sources.cik_map import read_cik_map, resolve_ciks
from sec_edgar_spark.sources.rest import (
    read_company_concept,
    read_company_facts,
    read_frames,
    read_submissions,
)


def test_cik_map_dimension(spark, data_dir):
    dim = read_cik_map(spark, f"{data_dir}/company_tickers.json")
    rows = {r.ticker: r for r in dim.collect()}
    assert rows["AAPL"].cik_str == 320193
    assert rows["MSFT"].title == "MICROSOFT CORP"
    assert len(rows) == 3


def test_resolve_ciks_fallback_chain(spark, data_dir):
    dim = read_cik_map(spark, f"{data_dir}/company_tickers.json")
    lookups = spark.createDataFrame(
        [("aapl",), ("Tesla, Inc.",), ("0000789019",), ("UNKNOWN CO",)],
        ["lookup_term"],
    )
    got = {r.lookup_term: r for r in resolve_ciks(lookups, dim).collect()}
    assert got["aapl"].cik == 320193 and got["aapl"].resolved_by == "ticker"
    assert got["Tesla, Inc."].cik == 1318605 and got["Tesla, Inc."].resolved_by == "title"
    assert got["0000789019"].cik == 789019 and got["0000789019"].resolved_by == "digits"
    assert got["UNKNOWN CO"].cik is None and got["UNKNOWN CO"].resolved_by is None


def test_company_facts_long_table(spark, data_dir):
    facts = read_company_facts(spark, f"{data_dir}/companyfacts_sample.json")
    rows = facts.collect()
    assert len(rows) == 4
    assets = [r for r in rows if r.tag == "Assets"]
    assert len(assets) == 2
    a2020 = next(r for r in assets if r.fy == 2020)
    assert a2020.cik == 320193
    assert a2020.taxonomy == "us-gaap"
    assert a2020.unit == "USD"
    assert a2020.val == Decimal("323888000000.0000")
    assert a2020.filed == datetime.date(2020, 10, 30)
    assert a2020.frame == "CY2020Q3I"
    dei = next(r for r in rows if r.taxonomy == "dei")
    assert dei.unit == "shares"


def test_submissions_rows(spark, data_dir):
    subs = read_submissions(spark, f"{data_dir}/submissions_sample.json")
    rows = subs.orderBy("filing_date").collect()
    assert [r.form for r in rows] == ["10-K", "4"]
    assert rows[1].accession_number == "0000320193-24-000004"
    assert rows[1].filing_date == datetime.date(2024, 1, 15)


def test_frames_cross_company(spark, data_dir):
    frames = read_frames(spark, f"{data_dir}/frames_sample.json")
    rows = frames.orderBy("cik").collect()
    assert len(rows) == 2
    assert rows[0].cik == 320193 and rows[0].frame == "CY2020Q3I"
    assert rows[1].val == Decimal("301311000000.0000")


def test_company_concept_long_table(spark, data_dir):
    """S8 golden: companyconcept payload (single cik/taxonomy/tag with
    units map) normalizes to the same long-row surface as companyfacts
    (reference get_company_concepts, core/rest.py:91-123)."""
    concept = read_company_concept(
        spark, f"{data_dir}/companyconcept_sample.json"
    )
    rows = concept.orderBy("fy").collect()
    assert len(rows) == 2
    r0 = rows[0]
    assert r0.cik == 320193
    assert r0.entity_name == "Apple Inc."
    assert r0.taxonomy == "us-gaap"
    assert r0.tag == "AccountsPayableCurrent"
    assert r0.unit == "USD"
    assert r0.val == Decimal("42296000000.0000")
    assert r0.fy == 2020 and r0.fp == "FY" and r0.form == "10-K"
    assert r0.filed == datetime.date(2020, 10, 30)
    assert r0.frame == "CY2020Q3I"
    assert rows[1].frame is None  # frame is optional per-row
    # concept rows union cleanly with the facts surface: FULL schema
    # identity (names AND types) — name-only equality let round 4's
    # decimal drift through; the internal fact surfaces must stay
    # decimal(24,4) for val (the gate queries cast to double at their
    # own boundary, never here — README driver-hash contract).
    facts = read_company_facts(spark, f"{data_dir}/companyfacts_sample.json")
    # (nullability may differ — facts' taxonomy/tag are map keys, hence
    # non-null; that never breaks a union)
    assert concept.dtypes == facts.dtypes
    assert dict(facts.dtypes)["val"] == "decimal(24,4)"
    assert facts.unionByName(concept).count() == 6
