"""SGML document explode as a Python UDTF (Spark 4, SPARK-43798).

The mapInPandas + posexplode pipeline (parsing/meta.py) is the
throughput path; this UDTF form makes the same parse SQL-NATIVE: after
``register(spark)`` any SQL user can write

    SELECT f.path, t.*
    FROM filings f, LATERAL sgml_docs(f.content) t

and get one row per ``<DOCUMENT>`` block — the table-function shape
(SURVEY §2.10) the reference exposes as a Python generator loop
(parser.py:79-130).  Rows stream out of ``eval`` per input row, so a
filing with 200 exhibits never materializes a 200-element array column
the way the posexplode path does — the lateral join flattens inline.

Parity with the pipeline form is asserted on the reference's own
filing fixture in tests/test_sgml_udtf.py.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from .meta import parse_filing

RETURN_TYPE = (
    "doc_type string, sequence string, filename string, "
    "text string, is_uuencoded boolean"
)


@udtf(returnType=RETURN_TYPE)
class SgmlDocsUDTF:
    """Explode one SGML filing container into its document rows."""

    def eval(self, content: str):  # noqa: D102 — UDTF contract
        if content is None:
            return
        for d in parse_filing(content)["documents"]:
            yield (
                d["type"],
                d["sequence"],
                d["filename"],
                d["text"],
                d["is_uuencoded"],
            )


def register(spark) -> None:
    """Make ``sgml_docs`` callable from SQL in this session."""
    spark.udtf.register("sgml_docs", SgmlDocsUDTF)
