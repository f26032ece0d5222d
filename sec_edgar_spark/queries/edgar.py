"""EDGAR-pipeline-shaped queries over the synthetic tables.

The reference's central pipeline (SURVEY §3.2) is: index scan → validity
filter (F1) → project to FilingEntry (F2) → user predicate (F3) →
running count (A3) → group-by-CIK (A1) → url derivation (C12) → per-CIK
limit (L1).  These queries materialize that exact pipeline over a
filing-index relation *derived deterministically from orders* (cik ←
o_custkey, accession ← synthesized from orderkey), so the whole chain is
DuckDB-oracle-checked end-to-end at any scale factor.  The real EDGAR
scans over .idx files are in sources/index.py with golden-file tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

from ..catalog import table
from .registry import query

# Deterministic synthetic filing-index over orders:
#   cik          = o_custkey
#   form_type    = maps o_orderpriority → a real EDGAR form vocabulary
#   date_filed   = o_orderdate
#   accession    = '0000320193-96-' || lpad(o_orderkey % 100000, 6, '0')
#   file_name    = 'edgar/data/' || cik || '/' || accession || '.txt'
# The same construction is written in the oracle SQL, so every derived
# column is value-checked.

_FORM_CASE_SQL = """
      CASE o_orderpriority
        WHEN '1-URGENT' THEN '10-K' WHEN '2-HIGH' THEN '10-Q'
        WHEN '3-MEDIUM' THEN '8-K' WHEN '4-NOT SPECIFIED' THEN '4'
        ELSE 'SC 13D/A' END
"""

_INDEX_CTE_SQL = f"""
    WITH filing_index AS (
      SELECT
        o_custkey AS cik,
        {_FORM_CASE_SQL} AS form_type,
        CAST(o_orderdate AS DATE) AS date_filed,
        'edgar/data/' || o_custkey || '/0000320193-96-' ||
          lpad((o_orderkey % 100000)::VARCHAR, 6, '0') || '.txt' AS file_name,
        o_orderkey AS line_no
      FROM orders
    )
"""


def _form_type_col() -> F.Column:
    p = F.col("o_orderpriority")
    return (
        F.when(p == "1-URGENT", "10-K")
        .when(p == "2-HIGH", "10-Q")
        .when(p == "3-MEDIUM", "8-K")
        .when(p == "4-NOT SPECIFIED", "4")
        .otherwise("SC 13D/A")
    )


def synthetic_filing_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared synthetic filing_index relation (see module docstring)."""
    o = table(spark, sf_dir, "orders")
    accession = F.concat(
        F.lit("0000320193-96-"),
        F.lpad((F.col("o_orderkey") % 100000).cast("string"), 6, "0"),
    )
    return o.select(
        F.col("o_custkey").alias("cik"),
        _form_type_col().alias("form_type"),
        F.col("o_orderdate").cast("date").alias("date_filed"),
        F.concat(
            F.lit("edgar/data/"),
            F.col("o_custkey").cast("string"),
            F.lit("/"),
            accession,
            F.lit(".txt"),
        ).alias("file_name"),
        F.col("o_orderkey").alias("line_no"),
    )


@query(
    "edgar_index_pipeline",
    oracle=_INDEX_CTE_SQL
    + """
    SELECT cik, form_type, date_filed, file_name,
      'Archives/' || file_name AS path,
      'https://www.sec.gov/Archives/' || file_name AS url,
      CAST(ROW_NUMBER() OVER (ORDER BY line_no) - 1 AS BIGINT) AS num_previously_valid
    FROM filing_index
    WHERE form_type = '10-K'
      AND date_filed BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
    """,
)
def edgar_index_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole index pipeline as ONE DataFrame expression:
    F1 validity filter semantics + F2 projection (path = 'Archives/'||
    file_name, _index.py:168) + F3/F6 form-type predicate + F7 date
    range + A3 running count in file order (_index.py:160-173) + C12 url
    templating (client.py:142-152).

    The global ROW_NUMBER mirrors the reference's single-file scan
    order; at cluster scale the order key is (file, line offset) and the
    window partitions by file — kept global here because the oracle
    relation is one logical file.
    """
    idx = synthetic_filing_index(spark, sf_dir)
    w = Window.orderBy("line_no")
    return (
        idx.filter(
            (F.col("form_type") == "10-K")
            & F.col("date_filed").between("1996-01-01", "1998-12-31")
        )
        .withColumn("path", F.concat(F.lit("Archives/"), F.col("file_name")))
        .withColumn("url", F.concat(F.lit("https://www.sec.gov/"), F.col("path")))
        .withColumn(
            "num_previously_valid",
            (F.row_number().over(w) - 1).cast("bigint"),
        )
        .select(
            "cik", "form_type", "date_filed", "file_name", "path", "url",
            "num_previously_valid",
        )
    )


@query(
    "edgar_company_topk",
    oracle=_INDEX_CTE_SQL
    + """
    SELECT cik, form_type, date_filed, accession FROM (
      SELECT cik, form_type, date_filed,
        regexp_extract(file_name, '/([0-9-]+)\\.txt$', 1) AS accession,
        ROW_NUMBER() OVER (PARTITION BY cik ORDER BY date_filed DESC, line_no) AS rk
      FROM filing_index
      WHERE form_type IN ('10-K','10-Q')
    ) WHERE rk <= 5
    """,
)
def edgar_company_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CompanyFilings count-limit semantics (L1, company.py:198-213):
    newest 5 filings per company, restricted to periodic reports, with
    the accession number extracted C1-style from the file name."""
    idx = synthetic_filing_index(spark, sf_dir)
    w = Window.partitionBy("cik").orderBy(F.desc("date_filed"), "line_no")
    return (
        idx.filter(F.col("form_type").isin("10-K", "10-Q"))
        .select(
            "cik",
            "form_type",
            "date_filed",
            F.regexp_extract("file_name", r"/([0-9-]+)\.txt$", 1).alias("accession"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .drop("rk")
    )


@query(
    "edgar_cik_resolution",
    oracle="""
    WITH lookups AS (
      SELECT DISTINCT upper(c_name) AS lookup_term FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT (c_custkey + 1000000)::VARCHAR AS lookup_term FROM customer WHERE c_custkey % 97 = 0
    ), cik_map AS (
      SELECT upper(c_name) AS ticker, c_custkey AS cik_str FROM customer
    )
    SELECT lookup_term,
      COALESCE(m.cik_str,
               CASE WHEN regexp_full_match(lookup_term, '[0-9]+')
                    THEN CAST(lookup_term AS BIGINT) END) AS cik,
      (m.cik_str IS NOT NULL) AS resolved_via_map
    FROM lookups LEFT JOIN cik_map m ON lookup_term = m.ticker
    """,
)
def edgar_cik_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 CIK resolution (cik_lookup.py:195-226) as a broadcast join:
    all-digit lookups pass through; everything else probes the
    broadcast ticker dimension; COALESCE implements the fallback chain.
    The dimension (~10k companies in real EDGAR) broadcasts at any
    lineitem scale."""
    c = table(spark, sf_dir, "customer")
    lookups = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(F.upper("c_name").alias("lookup_term"))
        .distinct()
        .unionByName(
            c.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).cast("string").alias("lookup_term")
            )
        )
    )
    cik_map = c.select(F.upper("c_name").alias("ticker"), F.col("c_custkey").alias("cik_str"))
    digits = F.col("lookup_term").rlike("^[0-9]+$")
    return (
        lookups.join(broadcast(cik_map), lookups.lookup_term == cik_map.ticker, "left")
        .select(
            "lookup_term",
            F.coalesce(
                F.col("cik_str"),
                F.when(digits, F.col("lookup_term").cast("bigint")),
            ).alias("cik"),
            F.col("cik_str").isNotNull().alias("resolved_via_map"),
        )
    )


@query(
    "edgar_scalar_battery",
    oracle=_INDEX_CTE_SQL
    + """
    SELECT
      file_name,
      string_split(file_name, '/')[-1] AS accession_filename,
      regexp_replace(string_split(file_name, '/')[-1], '\\.[A-Za-z0-9]+$', '')
        AS accession_number,
      regexp_replace(regexp_replace('Apple Inc. /DE/', '[^0-9A-Za-z\\s]', '', 'g'), '\\s', '_', 'g')
        AS clean_dir,
      strftime(date_filed, '%Y%m%d') AS date_yyyymmdd,
      CAST(quarter(date_filed) AS BIGINT) AS qtr,
      CAST((quarter(date_filed) - 1) * 3 + 1 AS BIGINT) AS first_month_of_qtr,
      CAST(CASE WHEN quarter(date_filed) = 4 THEN year(date_filed) + 1 ELSE year(date_filed) END AS BIGINT) AS next_year,
      CAST(CASE WHEN quarter(date_filed) = 4 THEN 1 ELSE quarter(date_filed) + 1 END AS BIGINT) AS next_quarter,
      lpad(cik::VARCHAR, 10, '0') AS cik10,
      CASE WHEN year(date_filed) < 1995 THEN strftime(date_filed, '%m%d%y')
           WHEN date_filed < DATE '1998-03-31' THEN strftime(date_filed, '%y%m%d')
           ELSE strftime(date_filed, '%Y%m%d') END AS idx_date_token,
      regexp_extract('https://www.sec.gov/Archives/edgar/data/320193/0000320193-20-000010-index.htm',
                     '^(.*)-', 1) || '.txt' AS txt_url
    FROM filing_index
    WHERE line_no % 10 = 0
    """,
)
def edgar_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C12 scalar battery (SURVEY §2.8) checked value-for-value:
    accession extraction, directory cleaning, date sanitization, quarter
    math with rollover, era-dependent idx date token, CIK zero-pad, and
    index-URL → txt-URL derivation."""
    from ..functions import scalars as S

    idx = synthetic_filing_index(spark, sf_dir).filter(F.col("line_no") % 10 == 0)
    d = F.col("date_filed")
    q = F.quarter(d)
    next_year, next_quarter = S.add_quarter(F.year(d), q)
    sample_href = (
        "https://www.sec.gov/Archives/edgar/data/320193/0000320193-20-000010-index.htm"
    )
    return idx.select(
        "file_name",
        S.accession_filename("file_name").alias("accession_filename"),
        S.accession_number("file_name").alias("accession_number"),
        S.clean_directory_path(F.lit("Apple Inc. /DE/")).alias("clean_dir"),
        S.sanitize_date_yyyymmdd(d).alias("date_yyyymmdd"),
        q.cast("bigint").alias("qtr"),
        S.month_of_quarter(q).cast("bigint").alias("first_month_of_qtr"),
        next_year.cast("bigint").alias("next_year"),
        next_quarter.cast("bigint").alias("next_quarter"),
        S.cik_zfill("cik").alias("cik10"),
        S.daily_idx_date(d).alias("idx_date_token"),
        S.txt_url(F.lit(sample_href)).alias("txt_url"),
    )


@query(
    "edgar_quarter_partition_counts",
    oracle=_INDEX_CTE_SQL
    + """
    SELECT CAST(year(date_filed) AS BIGINT) AS y, CAST(quarter(date_filed) AS BIGINT) AS q,
           COUNT(*) AS n_filings, COUNT(DISTINCT cik) AS n_companies
    FROM filing_index
    WHERE date_filed BETWEEN DATE '1995-07-15' AND DATE '1999-02-20'
    GROUP BY 1, 2
    """,
)
def edgar_quarter_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ComboFilings access-path algorithm (combo.py:137-199) made
    declarative: a plain date-range filter + per-(year, quarter) agg.
    Catalyst partition-prunes a date/quarter-partitioned index at scale;
    the quarterly/daily split disappears into the plan (SURVEY §4)."""
    idx = synthetic_filing_index(spark, sf_dir)
    return (
        idx.filter(F.col("date_filed").between("1995-07-15", "1999-02-20"))
        .groupBy(
            F.year("date_filed").cast("bigint").alias("y"),
            F.quarter("date_filed").cast("bigint").alias("q"),
        )
        .agg(
            F.count("*").alias("n_filings"),
            F.countDistinct("cik").alias("n_companies"),
        )
    )
