"""Connected components over a pair list — dedup cluster assignment.

After candidate generation + verification (MinHash-LSH, ngram-Jaccard,
SimHash...), near-duplicate PAIRS must become CLUSTERS so a pipeline can
keep one canonical document per group: pairs (a,b),(b,c) are one
3-document cluster even though (a,c) never met in any bucket.  That is
connected components, the one genuinely iterative algorithm in the
dedup family.

Formulation: min-label propagation (the simple form of the
large-star/small-star map-reduce algorithm).  Every node starts
labelled with itself; each round, every node takes the min of its own
label and its neighbours' labels; fixpoint = every node carries the
minimum id of its component.  Rounds needed = graph diameter — for
dedup graphs (dense clusters of copies) that is 2-4, not log n.

Scale shape per round: one shuffle join (labels onto edge endpoints) +
one groupBy(min) — both partial-aggregated; the driver only runs the
convergence check (a count), never touches row data.  Lineage is cut
every round with localCheckpoint so plans stay O(1) deep regardless of
iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node
    id reachable.  Deterministic.  Raises if not converged in
    ``max_iter`` rounds (diameter larger than max_iter — raise it)."""
    sym = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("id"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint()
    )
    labels = sym.select("id").distinct().select(
        "id", F.col("id").alias("label")
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels.select(
                F.col("id").alias("nbr"), F.col("label").alias("nbr_label")
            ),
            "nbr",
        )
        pulled = nbr_labels.groupBy("id").agg(F.min("nbr_label").alias("min_nbr"))
        new_labels = (
            labels.join(pulled, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("min_nbr", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def canonical_assignment(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, component, is_canonical) — dedup decision per clustered doc:
    keep the minimum id of each component, drop the rest."""
    cc = connected_components(edges, src, dst)
    return cc.select(
        "id", "component", (F.col("id") == F.col("component")).alias("is_canonical")
    )
