"""dedup_semantic_capped (queries/similarity.py): the scale-safe
SemDeDup twin — capped == uncapped while no cluster exceeds the cap
(the ER/PPJoin gate pairing), strict-subset + per-sub-cell-complete
when a forced tiny cap binds, and the audit ledger's arithmetic."""

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.queries.similarity import (
    _SEM_CAP,
    _sem_subsplit,
    dedup_semantic,
    dedup_semantic_cap_audit,
    dedup_semantic_capped,
)

SF = "/root/testdata/sf0.001"


def _pairs(df, cols=("cell", "keep_id", "drop_id", "cosine")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_capped_equals_uncapped_at_gate_sf(spark):
    """No sf0.001 cluster exceeds _SEM_CAP, so the capped twin must
    reproduce dedup_semantic EXACTLY (modulo its extra sub column,
    which must be all zero — one sub-cell per cluster)."""
    capped = dedup_semantic_capped(spark, SF)
    uncapped = dedup_semantic(spark, SF)
    assert capped.filter(F.col("sub") != 0).count() == 0
    got = _pairs(capped)
    want = _pairs(uncapped)
    assert got == want and got


def test_audit_shows_no_forfeit_at_gate_sf(spark):
    audit = dedup_semantic_cap_audit(spark, SF).collect()
    assert audit
    total = 0
    for r in audit:
        assert r["n_subcells"] == 1
        assert r["pairs_forfeited"] == 0
        assert r["pairs_scored"] == r["pairs_possible"]
        assert r["pairs_possible"] == r["n_vectors"] * (r["n_vectors"] - 1) // 2
        total += r["n_vectors"]
    assert total == spark.read.parquet(f"{SF}/embeddings.parquet").count()


def test_forced_tiny_cap_is_subset_and_subcell_complete(spark):
    """With cap=8 on a 40-vector cluster the split binds: the capped
    pair set must be a strict subset of the uncapped one, and EVERY
    same-sub-cell pair of the uncapped set must survive (the forfeit
    is exactly the cross-sub-cell mass — nothing else is dropped)."""
    from sec_edgar_spark.operators.similarity import group_cosine_pairs

    vecs = spark.createDataFrame(
        [
            (i, [1.0, float(i % 5) / 10.0, 0.5], 0 if i < 40 else 1)
            for i in range(52)
        ],
        "vec_id long, embedding array<float>, cell int",
    )
    cap = 8
    subbed = _sem_subsplit(vecs, cap)
    # sub ∈ [0, ceil(n/cap)): 5 sub-cells for the 40-cluster, 2 for 12
    rng = {
        r["cell"]: (r["lo"], r["hi"], r["n"])
        for r in subbed.groupBy("cell")
        .agg(
            F.min("_sub").alias("lo"),
            F.max("_sub").alias("hi"),
            F.countDistinct("_sub").alias("n"),
        )
        .collect()
    }
    assert rng[0][0] >= 0 and rng[0][1] < 5 and rng[0][2] > 1
    assert rng[1][0] >= 0 and rng[1][1] < 2

    uncapped = group_cosine_pairs(
        vecs, group_col="cell", threshold=0.9, id_col="vec_id",
        vec_col="embedding",
    )
    gk = subbed.withColumn(
        "_g", F.col("cell").cast("long") * F.lit(1 << 32) + F.col("_sub")
    )
    capped = group_cosine_pairs(
        gk.select("vec_id", "embedding", "_g"), group_col="_g",
        threshold=0.9, id_col="vec_id", vec_col="embedding",
    )
    sub_of = {r["vec_id"]: (r["cell"], r["_sub"]) for r in subbed.collect()}
    got = {(r["id_a"], r["id_b"], r["cosine"]) for r in capped.collect()}
    want_all = {(r["id_a"], r["id_b"], r["cosine"]) for r in uncapped.collect()}
    want_same_sub = {
        (a, b, c) for a, b, c in want_all if sub_of[a] == sub_of[b]
    }
    assert got == want_same_sub
    assert got < want_all  # the cap genuinely forfeited cross-sub pairs


def test_subsplit_balance_and_determinism(spark):
    """The high-bit hash split stays balanced (max sub-cell ≤ ~2×cap)
    on the stride patterns that defeat low-bit modulo — sequential,
    even-only, and ×64-strided ids — and is reproducible."""
    import math

    for stride in (1, 2, 64):
        vecs = spark.createDataFrame(
            [(i * stride, [1.0, 1.0], 0) for i in range(1000)],
            "vec_id long, embedding array<float>, cell int",
        )
        for cap in (7, 64):
            sizes = (
                _sem_subsplit(vecs, cap)
                .groupBy("cell", "_sub")
                .count()
                .collect()
            )
            n_sub = math.ceil(1000 / cap)
            assert all(0 <= r["_sub"] < n_sub for r in sizes)
            assert max(r["count"] for r in sizes) <= 2 * cap + 2, (
                stride, cap, sorted(r["count"] for r in sizes)[-3:],
            )
            again = (
                _sem_subsplit(vecs, cap)
                .groupBy("cell", "_sub")
                .count()
                .collect()
            )
            assert sorted(map(tuple, sizes)) == sorted(map(tuple, again))
