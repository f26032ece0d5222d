"""Dataset-curation queries (operators/sampling.py on the oracle gate).

The md5-based hash is engine-portable, so sampling/split/packing
decisions — not just aggregates of them — are value-checked against
DuckDB row by row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query

# DuckDB twin of functions/text.md5_hash64 (60-bit md5 prefix).
_H = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"


@query(
    "curation_split_train_val_test",
    oracle=f"""
    SELECT doc_id,
      CAST({_H} % 100 AS BIGINT) AS bucket,
      CASE WHEN {_H} % 100 >= 90 THEN 'test'
           WHEN {_H} % 100 >= 80 THEN 'val'
           ELSE 'train' END AS split
    FROM documents
    """,
)
def curation_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by doc-key hash — stable across
    re-runs/partitionings (never rand()); the split decision itself is
    on the value gate."""
    from ..operators.sampling import hash_bucket, split_assign

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        hash_bucket("doc_id").alias("bucket"),
        split_assign("doc_id", val_pct=10, test_pct=10).alias("split"),
    )


@query(
    "curation_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
        CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
             AS INT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
      CAST(floor((SUM(n_tokens) OVER (
          PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) - n_tokens) / 512.0) AS BIGINT) AS pack_id
    FROM t
    """,
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing into ~512-token training sequences,
    sharded per language (one window per shard — packing parallelizes
    across partitions; a doc straddling a boundary joins the pack
    where it starts)."""
    from ..functions import text as T
    from ..operators.sampling import pack_sequences

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.token_count("text").alias("n_tokens")
    )
    return pack_sequences(
        d, order_col="doc_id", token_count_col="n_tokens",
        budget=512, partition_col="lang",
    )


@query(
    "curation_decontaminate",
    oracle="""
    WITH tokd AS (
      SELECT doc_id,
        list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    ), shingled AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(toks) - 7, 0) + 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
               toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
               toks[i+6] || ' ' || toks[i+7])) AS sh
      FROM tokd
    ), train_sh AS (
      SELECT doc_id, unnest(sh) AS shingle FROM shingled WHERE doc_id % 13 <> 0
    ), eval_sh AS (
      SELECT DISTINCT unnest(sh) AS shingle FROM shingled WHERE doc_id % 13 = 0
    )
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlapping_shingles
    FROM train_sh t JOIN eval_sh e ON t.shingle = e.shingle
    GROUP BY t.doc_id
    """,
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: train docs (doc_id % 13 != 0)
    sharing any 8-gram with the held-out eval slice (doc_id % 13 = 0).
    Inverted-index semi-join on the shingle — never all-pairs."""
    from ..operators.sampling import decontaminate

    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 13 != 0)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    return decontaminate(train, eval_df, "doc_id", "text", n=8)


@query(
    "curation_pipeline",
    oracle=f"""
    WITH stats AS (
      SELECT doc_id, text, lang,
        len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
          AS n_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
          / greatest(length(text), 1) AS alpha_ratio
      FROM documents
    ), quality AS (
      SELECT * FROM stats WHERE n_tokens >= 10 AND alpha_ratio > 0.5
    ), deduped AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    )
    SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
      CASE WHEN {_H} % 100 >= 90 THEN 'test'
           WHEN {_H} % 100 >= 80 THEN 'val'
           ELSE 'train' END AS split,
      CAST(floor((SUM(n_tokens) OVER (
          PARTITION BY (CASE WHEN {_H} % 100 >= 90 THEN 'test'
                        WHEN {_H} % 100 >= 80 THEN 'val'
                        ELSE 'train' END)
          ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) - n_tokens) / 512.0) AS BIGINT) AS pack_id
    FROM deduped
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-data intake pipeline on one gate row:
    quality gate (token count + alpha ratio) → exact dedup (first doc
    per content hash) → deterministic split assignment → per-split
    sequence packing.  Each stage is the production operator; the
    oracle recomputes the whole chain in SQL, so stage COMPOSITION is
    value-checked, not just the stages."""
    from ..functions import text as T
    from ..operators.sampling import pack_sequences, split_assign

    d = table(spark, sf_dir, "documents")
    n_tokens = T.token_count("text")
    alpha_ratio = T.alpha_chars("text").cast("double") / F.greatest(
        F.length("text"), F.lit(1)
    )
    quality = d.select(
        "doc_id", "text", "lang", n_tokens.alias("n_tokens")
    ).filter((F.col("n_tokens") >= 10) & (alpha_ratio > 0.5))

    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    deduped = (
        quality.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    split = deduped.withColumn("split", split_assign("doc_id"))
    return pack_sequences(
        split, order_col="doc_id", token_count_col="n_tokens",
        budget=512, partition_col="split",
    ).select("doc_id", "lang", F.col("n_tokens").cast("int").alias("n_tokens"), "split", "pack_id")


@query("curation_pack_ffd")  # no SQL oracle: FFD is order-dependent
def curation_pack_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing packing per language shard (applyInPandas).
    Genuinely non-SQL-expressible (the pack assignment depends on the
    running bin state), so this rides the driver's rows-only check;
    the invariants (fill ≤ budget, all docs packed) are pytest-asserted
    in tests/test_sampling.py."""
    from ..functions import text as T
    from ..operators.sampling import pack_sequences_ffd

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.token_count("text").cast("long").alias("n_tokens")
    )
    return pack_sequences_ffd(
        d, "doc_id", "n_tokens", budget=512, partition_col="lang"
    )


@query(
    "curation_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang,
      CAST({_H} % 100 AS BIGINT) AS bucket
    FROM documents
    WHERE {_H} % 100 < CASE lang
      WHEN 'en' THEN 30 WHEN 'fr' THEN 80 WHEN 'de' THEN 80
      WHEN 'es' THEN 80 WHEN 'zh' THEN 80 ELSE 0 END
    """,
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling — the corpus-rebalancing
    primitive (downweight the dominant language, keep the tail).  The
    per-stratum rate compiles to a literal map lookup, so the whole
    thing is a pushable stateless filter; every kept row is on the
    value gate."""
    from ..operators.sampling import hash_bucket, stratified_sample

    d = table(spark, sf_dir, "documents")
    rates = {"en": 30, "fr": 80, "de": 80, "es": 80, "zh": 80}
    kept = stratified_sample(d, "doc_id", "lang", rates)
    return kept.select(
        "doc_id", "lang", hash_bucket("doc_id").alias("bucket")
    )


@query(
    "curation_domain_mix",
    oracle="""
    WITH t(lang, w) AS (VALUES
      ('en', 0.4), ('de', 0.15), ('es', 0.15), ('fr', 0.15), ('zh', 0.15)
    ), counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), total AS (
      SELECT MIN(CAST(floor(n / w) AS BIGINT)) AS n_total
      FROM counts JOIN t USING (lang)
    ), quota AS (
      SELECT t.lang, CAST(floor(w * n_total) AS BIGINT) AS k
      FROM t CROSS JOIN total
    ), ranked AS (
      SELECT doc_id, lang, ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      ) AS sample_rank
      FROM documents
    )
    SELECT r.doc_id, r.lang, r.sample_rank
    FROM ranked r JOIN quota q ON r.lang = q.lang
    WHERE r.sample_rank <= q.k
    """,
)
def curation_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota domain mixing: downsample each stratum (language
    here; source/domain identically) so the kept corpus matches a
    target mix — the data-recipe primitive behind "40% en / 15% each
    of de-es-fr-zh" training mixes.

    The largest achievable corpus is N' = min_s floor(n_s / w_s)
    (binding stratum kept whole-ish, everything else downsampled);
    per-stratum quota k_s = floor(w_s * N'); membership is the k_s
    lowest md5(doc_id) ranks — fully deterministic, no rand().

    Scale shape: stratum counts are a tiny hash agg; N' and quotas
    derive on that dimension table (broadcast both ways, never a
    collect).  Exact quotas need a per-stratum rank (one shuffle on
    lang).  At 100 TB swap the rank for the rate-based hash-threshold
    gate of curation_stratified_sample (stateless filter, no shuffle)
    and accept ±epsilon quota error — same semantics, documented
    trade.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    d = table(spark, sf_dir, "documents")
    targets = spark.createDataFrame(
        [("en", 0.4), ("de", 0.15), ("es", 0.15), ("fr", 0.15), ("zh", 0.15)],
        "lang string, w double",
    )
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    n_total = (
        counts.join(broadcast(targets), "lang")
        .select(F.floor(F.col("n") / F.col("w")).cast("bigint").alias("cap"))
        .agg(F.min("cap").alias("n_total"))
    )
    quota = targets.crossJoin(broadcast(n_total)).select(
        "lang", F.floor(F.col("w") * F.col("n_total")).cast("bigint").alias("k")
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(w).cast("bigint").alias("sample_rank")
    )
    return (
        ranked.join(broadcast(quota), "lang")
        .filter(F.col("sample_rank") <= F.col("k"))
        .select("doc_id", "lang", "sample_rank")
    )
