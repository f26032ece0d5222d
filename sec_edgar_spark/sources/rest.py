"""XBRL REST ingestion → long fact tables (SURVEY §2.1 S7-S10).

The reference GETs per-company JSON from data.sec.gov and returns raw
nested dicts (core/rest.py:51-205).  Spark-first: the fetched payloads
(or a mirrored directory of them) load with ``spark.read.json`` and
normalize to ONE long fact table (XBRL_FACT schema) via explode — the
cross-company/cross-tag analytics the reference leaves to the caller
become plain DataFrame queries.

The network edge is separated (fetch stage writes JSON files; tests use
fixture files) so everything here is hermetic and scan-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_company_facts(spark: SparkSession, path_glob: str) -> DataFrame:
    """companyfacts JSON file(s) → XBRL_FACT long table.

    Input shape (rest.py:126-156): ``{cik, entityName, facts:
    {taxonomy: {tag: {units: {unit: [{val, fy, fp, form, filed, accn,
    frame?}, ...]}}}}}``.  The triple-nested map explodes to
    (taxonomy, tag, unit, fact-row) without any Python parsing: maps
    come in as MapType via a permissive read, then three explodes.
    """
    raw = spark.read.option("multiLine", "true").json(path_glob)
    # facts is a struct of structs in inferred form; re-read the nested
    # payload as a map of maps so tag names stay data, not schema.
    sch = (
        "map<string,map<string,struct<"
        "units:map<string,array<struct<"
        "val:decimal(24,4),fy:int,fp:string,form:string,"
        "filed:string,accn:string,frame:string,end:string,start:string"
        ">>>>>>"
    )
    facts = raw.select(
        F.col("cik").cast("long").alias("cik"),
        F.col("entityName").alias("entity_name"),
        F.from_json(F.to_json("facts"), sch).alias("facts"),
    )
    tax = facts.select(
        "cik", "entity_name", F.explode("facts").alias("taxonomy", "tags")
    )
    tags = tax.select(
        "cik", "entity_name", "taxonomy", F.explode("tags").alias("tag", "body")
    )
    units = tags.select(
        "cik",
        "entity_name",
        "taxonomy",
        "tag",
        F.explode("body.units").alias("unit", "rows"),
    )
    return units.select(
        "cik",
        "entity_name",
        "taxonomy",
        "tag",
        "unit",
        F.explode("rows").alias("r"),
    ).select(
        "cik",
        "entity_name",
        "taxonomy",
        "tag",
        "unit",
        F.col("r.val").alias("val"),
        F.col("r.fy").alias("fy"),
        F.col("r.fp").alias("fp"),
        F.col("r.form").alias("form"),
        F.to_date("r.filed").alias("filed"),
        F.col("r.accn").alias("accn"),
        F.col("r.frame").alias("frame"),
    )


def read_company_concept(spark: SparkSession, path_glob: str) -> DataFrame:
    """S8 — companyconcept JSON file(s) → long fact table.

    Input shape (reference ``get_company_concepts``, core/rest.py:91-123;
    endpoint ``companyconcept/CIK{cik}/{taxonomy}/{tag}.json``): ONE
    (cik, taxonomy, tag) per payload — ``{cik, taxonomy, tag, label,
    entityName, units: {unit: [{val, fy, fp, form, filed, accn, frame?,
    end?, start?}, ...]}}`` — i.e. a single branch of the companyfacts
    tree with taxonomy/tag hoisted to the top level.  Normalizes to the
    same long-row surface as ``read_company_facts`` so concept and
    facts outputs union cleanly.
    """
    raw = spark.read.option("multiLine", "true").json(path_glob)
    return concept_rows(raw)


def concept_rows(raw: DataFrame) -> DataFrame:
    """The units-map explode for the companyconcept shape, usable on any
    frame with (cik, taxonomy, tag, entityName, units)."""
    sch = (
        "map<string,array<struct<"
        "val:decimal(24,4),fy:int,fp:string,form:string,"
        "filed:string,accn:string,frame:string,end:string,start:string"
        ">>>"
    )
    base = raw.select(
        F.col("cik").cast("long").alias("cik"),
        F.col("entityName").alias("entity_name"),
        F.col("taxonomy"),
        F.col("tag"),
        F.from_json(F.to_json("units"), sch).alias("units"),
    )
    units = base.select(
        "cik",
        "entity_name",
        "taxonomy",
        "tag",
        F.explode("units").alias("unit", "rows"),
    )
    return units.select(
        "cik",
        "entity_name",
        "taxonomy",
        "tag",
        "unit",
        F.explode("rows").alias("r"),
    ).select(
        "cik",
        "entity_name",
        "taxonomy",
        "tag",
        "unit",
        F.col("r.val").alias("val"),
        F.col("r.fy").alias("fy"),
        F.col("r.fp").alias("fp"),
        F.col("r.form").alias("form"),
        F.to_date("r.filed").alias("filed"),
        F.col("r.accn").alias("accn"),
        F.col("r.frame").alias("frame"),
    )


def read_submissions(spark: SparkSession, path_glob: str) -> DataFrame:
    """submissions JSON (rest.py:51-88) → one row per filing.

    ``filings.recent`` is columnar (parallel arrays); ``arrays_zip`` +
    ``explode`` rebuilds rows — the reference's pagination concat
    (rest.py:74-86) is a ``unionByName`` over multiple files.
    """
    raw = spark.read.option("multiLine", "true").json(path_glob)
    return submissions_rows(raw)


def submissions_rows(raw: DataFrame) -> DataFrame:
    """The columnar→row rebuild, usable on any frame with the
    submissions shape (``cik``, ``name``, ``filings.recent.*``
    parallel arrays) however it was loaded."""
    zipped = raw.select(
        F.col("cik").cast("long").alias("cik"),
        F.col("name").alias("entity_name"),
        F.explode(
            F.arrays_zip(
                F.col("filings.recent.accessionNumber").alias("accession_number"),
                F.col("filings.recent.form").alias("form"),
                F.col("filings.recent.filingDate").alias("filing_date"),
                F.col("filings.recent.primaryDocument").alias("primary_document"),
            )
        ).alias("f"),
    )
    return zipped.select(
        "cik",
        "entity_name",
        F.col("f.accession_number").alias("accession_number"),
        F.col("f.form").alias("form"),
        F.to_date("f.filing_date").alias("filing_date"),
        F.col("f.primary_document").alias("primary_document"),
    )


def read_frames(spark: SparkSession, path_glob: str) -> DataFrame:
    """frames JSON (rest.py:159-205) → (tag, unit, frame, cik, val …)."""
    raw = spark.read.option("multiLine", "true").json(path_glob)
    return frames_rows(raw)


def frames_rows(raw: DataFrame) -> DataFrame:
    """The frame-payload explode, usable on any frame with the frames
    shape (taxonomy/tag/uom/ccp + ``data`` array)."""
    return raw.select(
        F.col("taxonomy"),
        F.col("tag"),
        F.col("uom").alias("unit"),
        F.col("ccp").alias("frame"),
        F.explode("data").alias("d"),
    ).select(
        "taxonomy",
        "tag",
        "unit",
        "frame",
        F.col("d.cik").cast("long").alias("cik"),
        F.col("d.entityName").alias("entity_name"),
        # One val type across every XBRL fact surface (facts, concept,
        # frames): decimal(24,4), exact for integer-cent magnitudes that
        # exceed double's 2^53 — frames payloads arrive as JSON doubles,
        # so the cast path is double → decimal(24,4) on both engines.
        F.col("d.val").cast("decimal(24,4)").alias("val"),
        F.col("d.end").alias("period_end"),
    )
