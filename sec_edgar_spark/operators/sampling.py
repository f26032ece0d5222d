"""Dataset curation operators for training pipelines: deterministic
sampling, split assignment, sequence packing, decontamination.

Everything keys off the engine-portable 60-bit md5 hash
(functions/text.md5_hash64), so sampling decisions are reproducible
across engines, runs, and cluster sizes — never ``rand()``, which
breaks retry-determinism (a re-run task would sample differently).

Scale notes: hash sampling and split labels are stateless projections
(no shuffle); packing is one window over the chosen ordering key;
decontamination is a shingle-bucket semi-join (inverted index), the
same never-all-pairs shape as the dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from the row's key."""
    c = F.col(key) if isinstance(key, str) else key
    return T.md5_hash64(c.cast("string")) % buckets


def hash_sample(df: DataFrame, key: str, rate_pct: int) -> DataFrame:
    """Keep ~rate_pct% of rows, decided by key hash — stable under
    re-runs, partitioning, and engine (unlike ``df.sample``)."""
    return df.filter(hash_bucket(key) < rate_pct)


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~rates_pct[stratum]% of
    each stratum's rows, decided by the key hash (never ``rand()``).
    Strata absent from the map fall back to ``default_pct``.

    The rate map compiles to a literal map lookup — a stateless
    projection + filter, no shuffle, and Catalyst can push the bucket
    predicate into the scan alongside any other filters.
    """
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates_pct.items() for x in kv]
    )
    rate = F.coalesce(
        rate_map.getItem(F.col(strata_col)), F.lit(int(default_pct))
    )
    return df.filter(hash_bucket(key) < rate)


def split_assign(
    key: Column | str,
    val_pct: int = 10,
    test_pct: int = 10,
) -> Column:
    """'train' | 'val' | 'test' label from the key hash: the last
    ``test_pct`` buckets are test, the ``val_pct`` before them val."""
    b = hash_bucket(key)
    return (
        F.when(b >= 100 - test_pct, "test")
        .when(b >= 100 - test_pct - val_pct, "val")
        .otherwise("train")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_count_col: str,
    budget: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Contiguous sequence packing: walk docs in ``order_col`` order,
    assign ``pack_id = floor(preceding_token_total / budget)`` — docs
    landing in the same pack concatenate into one ~budget-token
    training sequence.

    One window (optionally per ``partition_col`` so packing
    parallelizes per shard); a doc straddling a boundary joins the
    pack where it starts, so packs can overflow by at most one doc —
    the standard streaming-packing contract (exact bin packing is NP
    and order-destroying).
    """
    w = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    preceding = F.sum(token_count_col).over(w) - F.col(token_count_col)
    return df.withColumn(
        "pack_id", F.floor(preceding / budget).cast("bigint")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Flag training docs sharing any word ``n``-gram with the eval
    set (benchmark-contamination scan).

    Inverted-index shape: eval shingles are (typically) small → the
    semi-join hashes on the shingle; a training doc is contaminated
    iff any of its shingles appears in the eval index.  Returns
    (id, n_overlapping_shingles) for contaminated train docs; anti-join
    this against the corpus to get the clean set.
    """
    from .dedup import shingle_rows

    train_sh = shingle_rows(train, id_col, text_col, n)
    eval_sh = (
        shingle_rows(eval_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    return (
        train_sh.join(eval_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlapping_shingles"))
    )


def pack_sequences_ffd(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    partition_col: str,
) -> DataFrame:
    """First-fit-decreasing sequence packing per shard — the
    higher-quality (less padding) packer the contiguous window variant
    trades away for SQL-expressibility.

    Runs as ``applyInPandas`` per ``partition_col`` shard: sort the
    shard's docs by token count descending, place each into the first
    pack with room (docs above budget get singleton packs).  Shards
    pack in parallel; within a shard the result is deterministic
    (stable sort, id tiebreak).  Output: (id, partition, n_tokens,
    pack_id, pack_fill).
    """
    import pandas as pd

    out_schema = (
        f"{id_col} long, {partition_col} string, "
        f"{token_count_col} long, pack_id long, pack_fill long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL token counts arrive as NaN and would poison the integer
        # fill arithmetic (one unmeasured doc must not kill the shard —
        # POISON.md); an unknown length packs as 0 tokens.
        pdf[token_count_col] = (
            pdf[token_count_col].fillna(0).astype("int64")
        )
        pdf = pdf.sort_values(
            [token_count_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        assignment = []
        for tok in pdf[token_count_col]:
            placed = None
            for i, fill in enumerate(fills):
                if fill + tok <= budget:
                    placed = i
                    break
            if placed is None:
                fills.append(0)
                placed = len(fills) - 1
            fills[placed] += tok
            assignment.append(placed)
        pdf = pdf.assign(
            pack_id=pd.Series(assignment, dtype="int64"),
            pack_fill=pd.Series(
                [fills[a] for a in assignment], dtype="int64"
            ),
        )
        return pdf[[id_col, partition_col, token_count_col, "pack_id", "pack_fill"]]

    return (
        df.select(id_col, partition_col, token_count_col)
        .groupBy(partition_col)
        .applyInPandas(pack, out_schema)
    )
