"""In-flight pipeline observability via ``Observation`` metrics.

The 100 TB problem: a curation pipeline needs row counts, null rates,
and drop ratios at each stage for monitoring/alerting — but a separate
``count()`` per stage re-runs the scan (at 100 TB, each extra action is
hours).  Spark's ``observe`` API attaches named aggregate metrics to a
point IN the plan; they are computed task-side during the one real
pass and delivered to the driver with the action's completion — zero
extra scans, zero extra shuffles.

This is the engine-native form of what Deequ/dbt-style quality checks
bolt on with extra passes; ``streaming/quality_stream.py`` covers the
streaming side, this covers batch lineage points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_stage(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named metrics at this point of the plan.  Returns the
    (unchanged) DataFrame and the Observation whose ``.get`` blocks
    until the next action materializes the frame once."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def quality_metrics(*cols: str) -> list[Column]:
    """Standard per-stage quality bundle: row count plus a null count
    per listed column — all map-side-combinable aggregates, so the
    observation adds no shuffle."""
    out = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        out.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    return out
