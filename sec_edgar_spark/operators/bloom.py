"""Distributed Bloom-filter build + probe — shuffle-volume pruning.

The 100 TB problem this solves: a semi-join where the "small" side is
too big to broadcast as a hash relation (tens of millions of keys ->
GBs of JVM hash map) but whose *Bloom filter* is a few MB.  Building
the filter distributively and broadcasting only the bit array lets the
fact-side scan drop non-matching rows BEFORE the shuffle, so the
exact (shuffled) semi-join that follows moves only the ~matching rows.
This is what Spark's own runtime-filter feature
(spark.sql.optimizer.runtime.bloomFilter.enabled) injects for
equi-joins; this operator is the explicit, reusable form — the filter
can be built once and applied to many scans (classic dim-to-many-facts
pruning), which the automatic rewrite cannot do.

Everything is JVM expressions (md5-derived double hashing, bitwise
ops over an array<long>) — no Python UDF, no driver collect: the bit
array is assembled with explode -> groupBy(word) -> bit_or -> one-row
agg, and reaches the probe side as a broadcast crossJoin of that
single row (the same shape the battery uses for k-means centroids and
histogram bounds).

Hash scheme (Kirsch–Mitzenmacher double hashing): h_i(x) =
(h1(x) + i*h2(x)) mod m with h1/h2 taken from disjoint halves of
md5(x) — portable, engine-independent, and k positions cost one md5.

False positives only ever ADD candidate rows; the exact join after the
prefilter removes them, so bloom-prefiltered results are exactly the
plain semi-join (which is what the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


# h1,h2 < 2^56 (14 hex chars), so h1 + i*h2 stays below 2^63 for every
# i <= _MAX_K - 1 — no BIGINT overflow under Spark 4 ANSI mode for any
# accepted k (with 60-bit halves the sum overflowed at i >= 8).
_MAX_K = 64


def _check_k(k: int) -> None:
    if not 1 <= k <= _MAX_K:
        raise ValueError(
            f"k must be in 1..{_MAX_K} (got {k}): h1 + (k-1)*h2 with "
            f"56-bit hashes must stay below 2^63"
        )


def _h1h2(key: Column) -> tuple[Column, Column]:
    """Two independent 56-bit non-negative hashes from one md5.

    HASH-FAMILY VERSION: v2 (56-bit halves at hex offsets 1/17; v1
    used 60-bit halves).  Changing these widths/offsets changes every
    probe position, so a ``words`` array PERSISTED by an older
    bloom_build silently yields false negatives when probed by a newer
    bloom_might_contain — a no-false-negative contract violation.
    In-repo callers build and probe within one plan (unaffected); if
    you persist filters, store this version marker alongside the array
    and refuse mismatched probes."""
    hx = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(hx, 1, 14), 16, 10).cast("bigint")
    # Force h2 odd so the k probe positions never collapse onto one
    # position (classic double-hashing degeneracy when h2 = 0 mod m).
    h2 = F.conv(F.substring(hx, 17, 14), 16, 10).cast("bigint").bitwiseOR(
        F.lit(1)
    )
    return h1, h2


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """One-row DataFrame ``(words: array<long>)`` — the Bloom filter of
    ``keys[key_col]`` with ``n_bits`` bits (must be a multiple of 64)
    and ``k`` probes per key.

    Plan: explode each key into its k (word, mask) pairs, OR the masks
    per word (partial-aggregated, so the shuffle carries at most
    n_bits/64 rows per partition), then assemble the dense word array
    in one final single-group agg.  Total shuffled data is bounded by
    the filter size, never the key count.
    """
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    _check_k(k)
    n_words = n_bits // 64
    h1, h2 = _h1h2(F.col(key_col))
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.pmod(h1 + i * h2, F.lit(n_bits)),
        )
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("bigint").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
    )
    # Dense array: missing words (no bits set) become 0.
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at("m", i.cast("bigint")), F.lit(0).cast("bigint")
            ),
        ).alias("words")
    )


def bloom_might_contain(
    key: Column, words_col: Column, n_bits: int, k: int
) -> Column:
    """Boolean Column: true iff all k bit positions of ``key`` are set
    in ``words_col`` (an array<long> from :func:`bloom_build`).  Pure
    codegen expressions — runs inside the scan stage."""
    _check_k(k)
    h1, h2 = _h1h2(key)

    def bit_set(i):
        pos = F.pmod(h1 + i * h2, F.lit(n_bits))
        word = F.element_at(words_col, (pos / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
        )
        return word.bitwiseAND(mask) != 0

    return F.forall(F.sequence(F.lit(0), F.lit(k - 1)), bit_set)


def bloom_prefilter(
    facts: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """``facts`` rows whose ``fact_key`` *might* be in
    ``dim_keys[dim_key]`` — a superset of the exact semi-join, produced
    without shuffling ``facts``.  Chain an exact semi-join afterwards
    for exactness; the prefilter bounds that join's input to
    |matches| + fp_rate * |facts|."""
    bloom = bloom_build(dim_keys, dim_key, n_bits, k)
    return facts.crossJoin(broadcast(bloom)).filter(
        bloom_might_contain(F.col(fact_key), F.col("words"), n_bits, k)
    ).drop("words")
