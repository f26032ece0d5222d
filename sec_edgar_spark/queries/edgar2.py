"""Second EDGAR coverage batch: F9/F10 filters, C7 date fill, J2
accession↔extracted-file matching, U2 page union."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..catalog import table
from ..filing_types import is_ownership_form
from .registry import query
from .edgar import _INDEX_CTE_SQL, synthetic_filing_index


@query(
    "edgar_ownership_filter",
    oracle=_INDEX_CTE_SQL
    + """
    SELECT
      regexp_replace(form_type, '/A$', '') IN ('3','4','5') AS is_ownership,
      form_type, COUNT(*) AS n
    FROM filing_index
    GROUP BY 1, 2
    """,
)
def edgar_ownership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 ownership include/exclude (company.py:226-235): the ownership
    predicate (forms 3/4/5 incl. amendments) as a derived column."""
    idx = synthetic_filing_index(spark, sf_dir)
    return (
        idx.groupBy(
            is_ownership_form(F.col("form_type")).alias("is_ownership"),
            "form_type",
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "edgar_match_format",
    oracle=_INDEX_CTE_SQL
    + """
    SELECT
      CASE WHEN form_type LIKE '%/A' THEN 'AMEND' ELSE 'EXACT' END AS match_format,
      COUNT(*) AS n, COUNT(DISTINCT cik) AS n_companies
    FROM filing_index
    GROUP BY 1
    """,
)
def edgar_match_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 match_format EXACT/AMEND/ALL (company.py:158-166): amended
    filings are the '/A'-suffixed variants."""
    idx = synthetic_filing_index(spark, sf_dir)
    return (
        idx.groupBy(
            F.when(F.col("form_type").endswith("/A"), "AMEND")
            .otherwise("EXACT")
            .alias("match_format")
        )
        .agg(F.count("*").alias("n"), F.countDistinct("cik").alias("n_companies"))
    )


@query(
    "edgar_fill_days",
    oracle="""
    WITH spans AS (
      SELECT o_custkey AS cik,
        MIN(CAST(o_orderdate AS DATE)) AS first_day,
        MAX(CAST(o_orderdate AS DATE)) AS last_day
      FROM orders WHERE o_custkey % 50 = 0 GROUP BY 1
    )
    SELECT cik, first_day, last_day,
      CAST(len(generate_series(first_day, last_day, INTERVAL 1 DAY)) AS INT) AS n_days
    FROM spans
    """,
)
def edgar_fill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 fill_days (combo.py:12-28): the daily-date enumeration as
    sequence()+size — the reference's Python date loop as one expr."""
    from ..functions.scalars import fill_days

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    spans = o.groupBy(F.col("o_custkey").alias("cik")).agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
    )
    return spans.select(
        "cik",
        "first_day",
        "last_day",
        F.size(fill_days(F.col("first_day"), F.col("last_day"))).alias("n_days"),
    )


@query(
    "edgar_accession_file_match",
    oracle=_INDEX_CTE_SQL
    + """
    , idx AS (
      SELECT cik, regexp_extract(file_name, '/([0-9-]+)\\.txt$', 1) AS accession, line_no
      FROM filing_index
    ), extracted AS (
      SELECT regexp_extract(file_name, '/([0-9-]+)\\.txt$', 1) AS accession,
        CASE WHEN line_no % 7 = 0 THEN 'corr01'
             WHEN line_no % 3 = 0 THEN 'corr04' ELSE 'nc' END AS suffix
      FROM filing_index WHERE line_no % 2 = 0
    ), ranked AS (
      SELECT i.cik, i.accession, e.suffix,
        ROW_NUMBER() OVER (PARTITION BY i.accession ORDER BY
          CASE e.suffix WHEN 'nc' THEN 0 WHEN 'corr04' THEN 1
               WHEN 'corr03' THEN 2 WHEN 'corr02' THEN 3 ELSE 4 END,
          i.cik, e.suffix) AS pri
      FROM idx i JOIN extracted e ON i.accession = e.accession
    )
    SELECT cik, accession, suffix FROM ranked WHERE pri = 1
    """,
)
def edgar_accession_file_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 accession↔extracted-file match (_index.py:285-303): the
    reference probes {accession}.{nc,corr04..corr01} in priority order;
    here an equi-join on the extracted accession + priority row_number
    — the 5-way suffix probe as one windowed join."""
    idx = synthetic_filing_index(spark, sf_dir).select(
        "cik",
        F.regexp_extract("file_name", r"/([0-9-]+)\.txt$", 1).alias("accession"),
        "line_no",
    )
    extracted = (
        synthetic_filing_index(spark, sf_dir)
        .filter(F.col("line_no") % 2 == 0)
        .select(
            F.regexp_extract("file_name", r"/([0-9-]+)\.txt$", 1).alias("e_accession"),
            F.when(F.col("line_no") % 7 == 0, "corr01")
            .when(F.col("line_no") % 3 == 0, "corr04")
            .otherwise("nc")
            .alias("suffix"),
        )
    )
    pri = (
        F.when(F.col("suffix") == "nc", 0)
        .when(F.col("suffix") == "corr04", 1)
        .when(F.col("suffix") == "corr03", 2)
        .when(F.col("suffix") == "corr02", 3)
        .otherwise(4)
    )
    # Total order: accession strings COLLIDE across ciks at larger SFs
    # (the synthetic file names reuse digit blocks), and multiple
    # extracted rows can tie on priority — without the (cik, suffix)
    # tiebreak the surviving row is partition-order-dependent (caught
    # by the first full sweep at sf0.1, latent at sf0.01 and below).
    w = Window.partitionBy("accession").orderBy(
        pri, F.col("cik"), F.col("suffix")
    )
    return (
        idx.join(extracted, idx.accession == extracted.e_accession)
        .withColumn("pri", F.row_number().over(w))
        .filter(F.col("pri") == 1)
        .select("cik", "accession", "suffix")
    )


@query(
    "edgar_union_pages",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
      CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM (
      SELECT user_id, event_id FROM events WHERE event_id < 3000
      UNION ALL
      SELECT user_id, event_id FROM events WHERE event_id >= 3000
    )
    GROUP BY user_id
    """,
)
def edgar_union_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 REST pagination union (rest.py:74-86): older pages concat onto
    recent — unionByName of page frames then one re-aggregation."""
    e = table(spark, sf_dir, "events")
    recent = e.filter(F.col("event_id") < 3000).select("user_id", "event_id")
    older = e.filter(F.col("event_id") >= 3000).select("user_id", "event_id")
    return (
        recent.unionByName(older)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").cast("bigint").alias("first_event"),
        )
    )


@query(
    "edgar_company_pagination",
    oracle="""
    WITH filings AS (
      SELECT o_custkey AS ck, o_orderkey AS ok,
        strftime(o_orderdate, '%Y-%m-%d') AS dt,
        CASE WHEN o_orderkey % 3 = 0 THEN '10-K' ELSE '10-Q' END AS typ,
        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders WHERE o_custkey <= 40
    ), typed AS (
      SELECT ck, ok, dt, typ,
        ROW_NUMBER() OVER (PARTITION BY ck ORDER BY rn) AS sel
      FROM filings WHERE typ = '10-Q'
    )
    SELECT
      lpad(CAST(ck AS VARCHAR), 10, '0') AS lookup_cik,
      lpad(CAST(ck AS VARCHAR), 10, '0') AS cik,
      CAST(dt AS DATE) AS datefiled,
      'https://www.sec.gov/Archives/edgar/data/' || ck || '/' || ok || '-index.htm'
        AS filinghref,
      typ AS type,
      'https://www.sec.gov/Archives/edgar/data/' || ck || '/' || ok || '.txt'
        AS txt_url
    FROM typed WHERE sel <= 12
    """,
)
def edgar_company_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 pagination roundtrip on the gate: synthesize browse-edgar XML
    pages (10 filings per page, built with codegen'd string exprs from
    ``orders``), then run the PRODUCTION paged-listing parse —
    from_xml, posexplode, exact-type re-check, per-CIK count
    truncation in (page_idx, pos) order, txt-URL derivation
    (sources/company_listing.parse_paged_listing; reference
    company.py:269-303)."""
    from pyspark.sql import Window

    from ..sources.company_listing import parse_paged_listing

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 40)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    numbered = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ok"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"),
        F.when(F.col("o_orderkey") % 3 == 0, "10-K").otherwise("10-Q").alias("typ"),
        (F.row_number().over(w) - 1).alias("rn0"),
    )
    fragment = F.concat(
        F.lit("<filing><dateFiled>"), F.col("dt"),
        F.lit("</dateFiled><filingHREF>"
              "https://www.sec.gov/Archives/edgar/data/"),
        F.col("ck").cast("string"), F.lit("/"), F.col("ok").cast("string"),
        F.lit("-index.htm</filingHREF><formName>Report</formName><type>"),
        F.col("typ"), F.lit("</type></filing>"),
    )
    pages = (
        numbered.select(
            F.lpad(F.col("ck").cast("string"), 10, "0").alias("lookup_cik"),
            (F.col("rn0") / 10).cast("int").alias("page_idx"),
            F.struct((F.col("rn0") % 10).alias("pos"), fragment.alias("frag")).alias("pf"),
        )
        .groupBy("lookup_cik", "page_idx")
        .agg(
            F.concat(
                F.lit("<companyFilings><companyInfo><CIK>"),
                F.col("lookup_cik"),
                F.lit("</CIK><name>Synth Co.</name></companyInfo><results>"),
                F.array_join(
                    F.transform(F.array_sort(F.collect_list("pf")), lambda s: s["frag"]),
                    "",
                ),
                F.lit("</results></companyFilings>"),
            ).alias("xml")
        )
    )
    return parse_paged_listing(pages, filing_type="10-Q", count=12)


@query(
    "edgar_submissions_roundtrip",
    oracle="""
    SELECT
      o_custkey AS cik,
      'Company ' || o_custkey AS entity_name,
      lpad(CAST(o_custkey AS VARCHAR), 10, '0') || '-20-' ||
        lpad(CAST(o_orderkey AS VARCHAR), 6, '0') AS accession_number,
      CASE WHEN o_orderkey % 2 = 0 THEN '10-K' ELSE '8-K' END AS form,
      o_orderdate AS filing_date,
      'doc' || o_orderkey || '.htm' AS primary_document
    FROM orders WHERE o_custkey <= 50
    """,
)
def edgar_submissions_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 REST submissions on the gate: build the data.sec.gov
    submissions payload shape (per-company row, ``filings.recent``
    PARALLEL ARRAYS — EDGAR's columnar JSON) from ``orders`` with
    sorted collect_lists, then rebuild filing rows through the
    PRODUCTION arrays_zip+explode path (sources/rest.submissions_rows;
    reference rest.py:51-88)."""
    from ..sources.rest import submissions_rows

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    per_filing = o.select(
        F.col("o_custkey").alias("cik"),
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.concat(
                F.lpad(F.col("o_custkey").cast("string"), 10, "0"),
                F.lit("-20-"),
                F.lpad(F.col("o_orderkey").cast("string"), 6, "0"),
            ).alias("accession"),
            F.when(F.col("o_orderkey") % 2 == 0, "10-K").otherwise("8-K").alias("form"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("fdate"),
            F.concat(F.lit("doc"), F.col("o_orderkey").cast("string"), F.lit(".htm")).alias("doc"),
        ).alias("s"),
    )
    raw = (
        per_filing.groupBy("cik")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(
            "cik",
            F.concat(F.lit("Company "), F.col("cik").cast("string")).alias("name"),
            F.struct(
                F.struct(
                    F.transform("ss", lambda s: s["accession"]).alias("accessionNumber"),
                    F.transform("ss", lambda s: s["form"]).alias("form"),
                    F.transform("ss", lambda s: s["fdate"]).alias("filingDate"),
                    F.transform("ss", lambda s: s["doc"]).alias("primaryDocument"),
                ).alias("recent")
            ).alias("filings"),
        )
    )
    return submissions_rows(raw)


@query(
    "edgar_frames_roundtrip",
    oracle="""
    SELECT
      'us-gaap' AS taxonomy,
      'Assets' AS tag,
      'USD' AS unit,
      'CY2020Q' || ((c_custkey % 4) + 1) || 'I' AS frame,
      c_custkey AS cik,
      c_name AS entity_name,
      CAST(c_acctbal AS DOUBLE) AS val,
      '2020-0' || ((c_custkey % 4) * 3 + 1) || '-01' AS period_end
    FROM customer WHERE c_custkey <= 200
    """,
)
def edgar_frames_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 XBRL frames on the gate: build the data.sec.gov frames
    payload shape (one row per (tag, unit, frame) with a ``data``
    array of per-company facts) from ``customer``, then explode
    through the PRODUCTION frames path (sources/rest.frames_rows;
    reference rest.py:159-205).

    Gate output casts ``val`` decimal(24,4) -> double: the driver's
    hash canonicalizes DuckDB decimals through pandas float64 while
    Spark decimals keep scale-4 trailing zeros, so scale>2 decimal
    output can never hash-match even when values are identical
    (CORRECTNESS_r04).  Internal XBRL_FACT storage stays decimal."""
    from ..sources.rest import frames_rows

    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    frame_key = F.concat(
        F.lit("CY2020Q"), ((F.col("c_custkey") % 4) + 1).cast("string"), F.lit("I")
    )
    datum = F.struct(
        F.col("c_custkey").alias("cik"),
        F.col("c_name").alias("entityName"),
        F.col("c_acctbal").cast("double").alias("val"),
        F.concat(
            F.lit("2020-0"),
            ((F.col("c_custkey") % 4) * 3 + 1).cast("string"),
            F.lit("-01"),
        ).alias("end"),
        F.col("c_custkey").alias("k"),
    )
    raw = (
        c.select(frame_key.alias("ccp"), datum.alias("d"))
        .groupBy("ccp")
        .agg(F.array_sort(F.collect_list("d")).alias("data"))
        .select(
            F.lit("us-gaap").alias("taxonomy"),
            F.lit("Assets").alias("tag"),
            F.lit("USD").alias("uom"),
            "ccp",
            "data",
        )
    )
    return frames_rows(raw).withColumn("val", F.col("val").cast("double"))


@query(
    "edgar_concept_roundtrip",
    oracle="""
    SELECT c_custkey AS cik, c_name AS entity_name,
      'us-gaap' AS taxonomy, 'AccountsPayableCurrent' AS tag, 'USD' AS unit,
      CAST(CAST(CASE WHEN fy = 2020 THEN CAST(c_acctbal AS DECIMAL(24,4)) * 1000
           ELSE CAST(c_acctbal AS DECIMAL(24,4)) END AS DECIMAL(24,4)) AS DOUBLE) AS val,
      fy, 'FY' AS fp, '10-K' AS form,
      CAST(fy || '-10-30' AS DATE) AS filed,
      'accn-' || c_custkey || '-' || fy AS accn,
      CAST(NULL AS VARCHAR) AS frame
    FROM customer CROSS JOIN (SELECT unnest([2020, 2021]) AS fy)
    WHERE c_custkey % 7 = 0
    """,
)
def edgar_concept_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 companyconcept on the gate: build the data.sec.gov
    companyconcept payload shape (single cik/taxonomy/tag, units map of
    per-period fact arrays — reference get_company_concepts,
    core/rest.py:91-123) from ``customer``, then explode through the
    PRODUCTION concept path (sources/rest.concept_rows).

    Gate output casts ``val`` to double — same driver-hash rationale
    as ``edgar_frames_roundtrip`` (scale-4 Spark decimals vs pandas
    float64 rendering of DuckDB decimals)."""
    from ..sources.rest import concept_rows

    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 == 0)
    bal = F.col("c_acctbal").cast("decimal(24,4)")

    def period(fy: int, val):
        return F.struct(
            val.alias("val"),
            F.lit(fy).alias("fy"),
            F.lit("FY").alias("fp"),
            F.lit("10-K").alias("form"),
            F.lit(f"{fy}-10-30").alias("filed"),
            F.concat(
                F.lit("accn-"),
                F.col("c_custkey").cast("string"),
                F.lit(f"-{fy}"),
            ).alias("accn"),
        )

    raw = c.select(
        F.col("c_custkey").alias("cik"),
        F.lit("us-gaap").alias("taxonomy"),
        F.lit("AccountsPayableCurrent").alias("tag"),
        F.col("c_name").alias("entityName"),
        F.struct(
            F.array(
                period(2020, (bal * 1000).cast("decimal(24,4)")),
                period(2021, bal),
            ).alias("USD")
        ).alias("units"),
    )
    return concept_rows(raw).withColumn("val", F.col("val").cast("double"))
