"""sec_edgar_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``secedgar`` reference library
(rahulrrixe/sec-edgar), re-expressed Spark-first.

The reference is a single-process Python ETL pipeline over the SEC EDGAR
corpus (see SURVEY.md).  This package re-expresses every stage of its
pipeline — query spec → access-path selection → index scan →
filter/project/group → limit → fetch → parse → save — as declarative
Spark DataFrame plans that Catalyst can optimize, partition-prune and
codegen, plus the LLM-training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout:
    session     SparkSession factory tuned for the target cluster shape
    catalog     test-table loader for the driver's synthetic parquet data
    schemas     canonical StructTypes (filing_index, form4, xbrl_fact, ...)
    functions/  scalar Column helpers (EDGAR C1-C19), text, vector math
    sources/    index/cik-map/filing-blob/REST readers
    operators/  relational helpers, dedup, similarity, multimodal
    parsing/    SGML MetaParser + Form-4 parser as vectorized stages
    plans/      the `filings()` planner facade (dispatch matrix of §3.1)
    streaming/  Structured Streaming view of the daily index feed
    queries/    the oracle-checked query battery (driver contract)
"""

__version__ = "0.1.0"
