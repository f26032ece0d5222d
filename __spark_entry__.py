"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the oracle-checked battery defined in
``sec_edgar_spark.queries`` (one entry per implemented operator from
SURVEY.md §2 plus the LLM-data-pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sec_edgar_spark import queries as _q  # noqa: E402
from sec_edgar_spark.session import ensure_session_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's whole index pipeline as one
    DataFrame expression (scan → filter → project → running count →
    url derivation): see sec_edgar_spark/queries/edgar.py.
    """
    ensure_session_conf(spark)
    return _q.queries()["edgar_index_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omissions → rows-only check)."""
    return _q.oracle_sql()
