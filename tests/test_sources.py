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


def test_xbrl_tri_surface_schema_parity(spark, tmp_path):
    """S8/S9/S10 property (VERDICT r5 #7): the THREE XBRL fact surfaces
    — companyfacts, companyconcept, frames — built from the SAME
    underlying facts yield union-compatible schemas (identical dtypes
    on every shared column, unionByName(allowMissingColumns) succeeds)
    and agree on the shared (cik, taxonomy, tag, unit, val) tuples.
    Values include the edge magnitudes the decimal(24,4) contract
    exists for: integer cents beyond double's 2^53 and negatives."""
    import json

    from pyspark.sql import functions as F

    facts = [
        # (cik, entity, taxonomy, tag, unit, val, fy, fp, form, filed, accn, frame)
        (320193, "Apple Inc.", "us-gaap", "Revenues", "USD",
         123456789012345678.0, 2023, "FY", "10-K", "2023-11-03",
         "0000320193-23-000106", "CY2023"),
        (320193, "Apple Inc.", "us-gaap", "Revenues", "USD",
         -987654321.25, 2022, "FY", "10-K", "2022-10-28",
         "0000320193-22-000108", "CY2022"),
        (789019, "MICROSOFT CORP", "us-gaap", "Revenues", "USD",
         0.0001, 2023, "FY", "10-K", "2023-07-27",
         "0000789019-23-000014", "CY2023"),
    ]

    # ---- render the three payload shapes from the one fact set ----
    def unit_row(f):
        return {"val": f[5], "fy": f[6], "fp": f[7], "form": f[8],
                "filed": f[9], "accn": f[10], "frame": f[11]}

    cf_dir = tmp_path / "cf"; cf_dir.mkdir()
    cc_dir = tmp_path / "cc"; cc_dir.mkdir()
    fr_dir = tmp_path / "fr"; fr_dir.mkdir()
    for cik in {f[0] for f in facts}:
        mine = [f for f in facts if f[0] == cik]
        # companyfacts: facts.{taxonomy}.{tag}.units.{unit} = [rows]
        tree = {}
        for f in mine:
            tree.setdefault(f[2], {}).setdefault(
                f[3], {"units": {}}
            )["units"].setdefault(f[4], []).append(unit_row(f))
        (cf_dir / f"CIK{cik}.json").write_text(json.dumps(
            {"cik": cik, "entityName": mine[0][1], "facts": tree}))
        # companyconcept: one (taxonomy, tag) branch hoisted to top
        units = {}
        for f in mine:
            units.setdefault(f[4], []).append(unit_row(f))
        (cc_dir / f"CIK{cik}.json").write_text(json.dumps(
            {"cik": cik, "entityName": mine[0][1], "taxonomy": mine[0][2],
             "tag": mine[0][3], "label": "Revenues",
             "units": units}))
    # frames: one payload per (frame), data = per-company rows
    for frame in {f[11] for f in facts}:
        mine = [f for f in facts if f[11] == frame]
        (fr_dir / f"{frame}.json").write_text(json.dumps(
            {"taxonomy": "us-gaap", "tag": "Revenues", "uom": "USD",
             "ccp": frame,
             "data": [{"cik": f[0], "entityName": f[1], "val": f[5],
                       "end": "2023-09-30"} for f in mine]}))

    cf = read_company_facts(spark, str(cf_dir / "*.json"))
    cc = read_company_concept(spark, str(cc_dir / "*.json"))
    fr = read_frames(spark, str(fr_dir / "*.json"))

    # schema parity: every shared column name has the identical dtype
    schemas = {"facts": dict(cf.dtypes), "concept": dict(cc.dtypes),
               "frames": dict(fr.dtypes)}
    for a in schemas:
        for b in schemas:
            shared = set(schemas[a]) & set(schemas[b])
            for col in shared:
                assert schemas[a][col] == schemas[b][col], (
                    f"{col}: {a}={schemas[a][col]} {b}={schemas[b][col]}")
    # facts and concept are the SAME surface
    assert cf.columns == cc.columns

    # union-compatibility in both directions
    u = cf.unionByName(cc, allowMissingColumns=True).unionByName(
        fr, allowMissingColumns=True)
    assert u.count() == cf.count() + cc.count() + fr.count()

    # value parity on the shared tuple space
    key = ["cik", "taxonomy", "tag", "unit", "val"]
    tup = lambda df: sorted(
        (r.cik, r.taxonomy, r.tag, r.unit, str(r.val))
        for r in df.select(*key).collect())
    assert tup(cf) == tup(cc) == tup(fr)
