"""Similarity-search operators (library surface).

Brute-force scoring is the correctness baseline; bucketed variants
(sign-bit LSH, grid quantization) generate candidates via equi-joins so
no stage is ever an all-pairs product at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import vectors as V


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    The query set broadcasts; the corpus scan is never shuffled — the
    window's partition key is query_id so only (n_queries × corpus)
    scored rows reduce to n_queries × k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        V.norm(vec_col).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        V.norm(vec_col).alias("c_nrm"),
    )
    scored = c.join(broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        (V.dot("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate top-k: score only within the query's sign-bit bucket."""
    keyed = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        V.norm(vec_col).alias("c_nrm"),
        V.random_projection_sign_bits(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        V.norm(vec_col).alias("q_nrm"),
        V.random_projection_sign_bits(vec_col, planes).alias("q_bucket"),
    )
    scored = keyed.join(
        broadcast(q),
        (F.col("bucket") == F.col("q_bucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        (V.dot("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def ivf_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """IVF-style approximate top-k: assign every vector to its nearest
    centroid (coarse quantizer), score only within the query's cell.

    The cell id is a pure expression (K literal dots + argmax), so
    candidate generation is an equi-join on the cell — the same
    never-all-pairs shape as the LSH variant, but data-adaptive when
    the centroids come from a (deterministic) training pass.  Raising
    recall = probing more cells (union of per-cell joins).
    """
    keyed = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        V.norm(vec_col).alias("c_nrm"),
        V.nearest_centroid(vec_col, centroids).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        V.norm(vec_col).alias("q_nrm"),
        V.nearest_centroid(vec_col, centroids).alias("q_cell"),
    )
    scored = keyed.join(
        broadcast(q),
        (F.col("cell") == F.col("q_cell"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        (V.dot("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def cosine_threshold_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
    impl: str = "arrow",
) -> DataFrame:
    """Exact all-pairs cosine-threshold join as a block-partitioned
    equi-join — the scalable shape for exhaustive pair scoring.

    Exact threshold joins at moderate thresholds (e.g. 0.45 on
    near-random high-dim data) admit no guaranteed-recall pruning: on
    unit vectors cos >= t bounds the pair distance by sqrt(2-2t),
    which at t=0.45 (~1.05) exceeds the coordinate/projection spread
    of the data, so every bucketing scheme either loses recall or
    prunes nothing.  The O(n^2) compute is inherent; what must NOT be
    inherent is a corpus-sized broadcast or a single cartesian task.

    Block decomposition: each row hashes to one of B blocks; the left
    side replicates to block-pair keys (g, j>=g), the right side to
    (i<=g, g), and an equi-join on (bi, bj) gives every unordered pair
    exactly once across B(B+1)/2 independent tasks (same-block pairs
    appear twice and are halved by the id ordering filter).  Per-task
    memory is O(n/B) rows, replication factor ~B/2 per side — the
    communication-optimal sqrt(2P) for dense all-pairs on P tasks.
    At 100 TB, pick B so n/B rows fit one executor's hash map.

    The cosine expression is the same dot/(norm*norm) fold as the
    brute-force baseline, so values are bit-identical to the oracle.
    When approximate recall is acceptable (true near-dup thresholds
    >= ~0.9), ``lsh_bucketed_topk``'s candidate shape is the cheaper
    tier; this operator is the exact tier.

    Two scoring backends, identical results:

    - ``impl="arrow"`` (default): cogrouped ``applyInPandas`` over the
      block-pair keys — each task receives the two blocks' ROWS once
      (n/B rows per side, never the materialized pair table) and
      scores all pairs vectorized in numpy.  The dim-major
      accumulation loop (``acc += outer(a[:,d], b[:,d])`` for d in
      order, inputs widened to float64 first) performs the exact same
      IEEE double operations in the exact same order as the
      element-order ``aggregate`` fold, so cosines are BIT-IDENTICAL
      to the expression path and the SQL oracle — while running ~10x
      faster than per-pair interpreted lambda evaluation.
    - ``impl="expr"``: pure Column expressions (zip_with/aggregate
      fold after a (bi, bj) equi-join); no Python workers.

    Zero vectors (norm 0) are dropped up front in BOTH backends: their
    cosine is 0/0 = NaN, and the engines disagree on what NaN means
    (Spark SQL orders NaN above all doubles so ``NaN >= t`` keeps the
    pair; numpy's IEEE comparison drops it).  A NaN-cosine "duplicate
    pair" is semantically meaningless either way, so the operator
    defines degenerate vectors as matching nothing — making the two
    backends and the SQL oracle genuinely agree on any input.
    """
    if n_blocks < 1:
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    b = F.lit(n_blocks)
    g = F.pmod(F.hash(F.col(id_col)), b)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("emb"),
        V.norm(vec_col).alias("nrm"),
        g.alias("g"),
    ).filter(F.col("nrm") > 0)
    left = base.select(
        F.col("id").alias("id_l"),
        F.col("emb").alias("emb_l"),
        F.col("nrm").alias("nrm_l"),
        F.col("g").alias("bi"),
        F.explode(F.sequence(F.col("g"), b - 1)).alias("bj"),
    )
    right = base.select(
        F.col("id").alias("id_r"),
        F.col("emb").alias("emb_r"),
        F.col("nrm").alias("nrm_r"),
        F.explode(F.sequence(F.lit(0), F.col("g"))).alias("bi"),
        F.col("g").alias("bj"),
    )
    if impl == "expr":
        pairs = left.join(right, ["bi", "bj"]).filter(
            # distinct-block pairs arrive exactly once (keep both id
            # orders, normalized below); same-block pairs arrive twice
            # (keep one).
            (F.col("bi") != F.col("bj")) | (F.col("id_l") < F.col("id_r"))
        )
        cos = V.dot("emb_l", "emb_r") / (F.col("nrm_l") * F.col("nrm_r"))
        return (
            pairs.filter(F.col("id_l") != F.col("id_r"))
            .select(
                F.least("id_l", "id_r").alias("id_a"),
                F.greatest("id_l", "id_r").alias("id_b"),
                cos.alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
    if impl != "arrow":
        raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")

    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("cosine", DoubleType()),
        ]
    )
    thr = float(threshold)

    def score(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        same_block = key[0] == key[1]
        la = np.vstack(lpdf["emb_l"].to_numpy()).astype(np.float64)
        ra = np.vstack(rpdf["emb_r"].to_numpy()).astype(np.float64)
        # Dim-major accumulation: per pair this adds the d-th product
        # exactly when the element-order fold would — same IEEE ops,
        # same order, bit-identical cosines to the expression path.
        acc = np.zeros((la.shape[0], ra.shape[0]))
        for d in range(la.shape[1]):
            acc += np.multiply.outer(la[:, d], ra[:, d])
        cosm = acc / np.multiply.outer(
            lpdf["nrm_l"].to_numpy(dtype=np.float64),
            rpdf["nrm_r"].to_numpy(dtype=np.float64),
        )
        lid = lpdf["id_l"].to_numpy()
        rid = rpdf["id_r"].to_numpy()
        keep = cosm >= thr
        if same_block:
            # same-block pairs arrive once here (no replication within a
            # block): keep the ordered half, drop self-pairs.
            keep &= np.less.outer(lid, rid)
        else:
            keep &= np.not_equal.outer(lid, rid)
        li, ri = np.nonzero(keep)
        a, bb = lid[li], rid[ri]
        return pd.DataFrame(
            {
                "id_a": np.minimum(a, bb),
                "id_b": np.maximum(a, bb),
                "cosine": cosm[li, ri],
            }
        )

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(score, out_schema)
    )


def l2_normalize(vec_col, eps: float = 1e-12):
    """Unit-normalize an array<float|double> embedding column (pure
    zip_with/aggregate expression — codegen, no UDF).  Zero vectors
    pass through as zeros (eps guard) rather than NaN."""
    nrm = F.greatest(V.norm(vec_col), F.lit(eps))
    return F.transform(V.as_double(vec_col), lambda x: x / nrm)


def mean_pool(df: DataFrame, key_col: str, vec_col: str = "embedding") -> DataFrame:
    """Element-wise mean of all vectors per key (sentence→document
    pooling).  posexplode → (key, pos) partial sums → collect back in
    position order: map-side combinable, never holds a group's vectors
    in one row until the final (dim-sized) assembly."""
    exploded = df.select(
        F.col(key_col), F.posexplode(V.as_double(vec_col)).alias("pos", "x")
    )
    per_pos = exploded.groupBy(key_col, "pos").agg(
        F.sum("x").alias("s"), F.count("*").alias("n")
    )
    return (
        per_pos.groupBy(key_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", (F.col("s") / F.col("n")).alias("m")))
                ),
                lambda st: st["m"],
            ).alias("embedding")
        )
    )


def norm_outliers(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    lo: float = 0.5, hi: float = 2.0,
) -> DataFrame:
    """Embedding-quality gate: flag vectors whose L2 norm falls outside
    [lo·median, hi·median] — degenerate (near-zero) or exploded
    embeddings that poison cosine retrieval.  Median via
    approx_percentile (mergeable; exact at gate scale)."""
    normed = df.select(F.col(id_col), V.norm(vec_col).alias("nrm"))
    med = normed.agg(
        F.percentile_approx("nrm", 0.5, 1000000).alias("med")
    )
    return normed.crossJoin(F.broadcast(med)).select(
        id_col,
        "nrm",
        "med",
        ((F.col("nrm") < lo * F.col("med")) | (F.col("nrm") > hi * F.col("med"))).alias(
            "is_outlier"
        ),
    )


def group_cosine_pairs(
    df: DataFrame,
    group_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-group cosine-threshold pairs (group, id_a < id_b,
    cosine) — the scoring stage behind cluster-pruned dedup
    (SemDeDup): candidates are ONLY pairs sharing ``group_col``.

    Same cogrouped-Arrow shape as ``cosine_threshold_pairs``, keyed by
    the caller's group instead of synthetic blocks: each task receives
    one group's rows once (never a materialized pair table) and scores
    all pairs vectorized with the dim-major accumulation loop — the
    exact same IEEE double ops in the same order as the element-order
    ``aggregate`` fold, so cosines are BIT-IDENTICAL to the expression
    path and the SQL oracle.

    Zero-norm vectors are dropped up front (NaN-cosine pairs match
    nothing — same rule as cosine_threshold_pairs).  At 100 TB the
    per-task memory is the largest group; if a group outgrows one
    executor, sub-block it with cosine_threshold_pairs inside the
    group — the cluster count should grow with the corpus anyway.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("emb"),
        V.norm(vec_col).alias("nrm"),
    ).filter(F.col("nrm") > 0)

    g_type = df.schema[group_col].dataType
    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("g", g_type),
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("cosine", DoubleType()),
        ]
    )
    thr = float(threshold)

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame(
                {"g": [], "id_a": [], "id_b": [], "cosine": []}
            )
        a = np.vstack(pdf["emb"].to_numpy()).astype(np.float64)
        acc = np.zeros((a.shape[0], a.shape[0]))
        for d in range(a.shape[1]):
            acc += np.multiply.outer(a[:, d], a[:, d])
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        cosm = acc / np.multiply.outer(nrm, nrm)
        ids = pdf["id"].to_numpy()
        keep = (cosm >= thr) & np.less.outer(ids, ids)
        li, ri = np.nonzero(keep)
        return pd.DataFrame(
            {
                "g": np.repeat(key[0], len(li)),
                "id_a": ids[li],
                "id_b": ids[ri],
                "cosine": cosm[li, ri],
            }
        )

    return base.groupBy("g").applyInPandas(score, out_schema)


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Multi-probe sign-bit LSH (Lv et al., VLDB'07): each query
    probes its own bucket PLUS every Hamming-1 perturbation of it —
    the buckets a near-neighbor most likely fell into when one
    hyperplane's sign disagreed.  Recall approaches multi-table LSH
    with ONE stored table: the corpus is hashed and bucketed once,
    only the (tiny) query side fans out |planes|+1 probes.

    Candidate uniqueness is structural: a corpus vector lives in
    exactly one bucket and the probe set is distinct buckets, so no
    (query, neighbor) pair is scored twice — no dedup stage needed.
    """
    if len(planes) > 62:
        raise ValueError(
            f"lsh_multiprobe_topk supports at most 62 hyperplanes "
            f"(bucket ids are int64 bit weights 2**b), got {len(planes)}"
        )
    keyed = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        V.norm(vec_col).alias("c_nrm"),
        V.random_projection_sign_bits(vec_col, planes).alias("bucket"),
    )
    qb = F.col("q_bucket")
    probe_set = F.array(
        qb, *[qb.bitwiseXOR(F.lit(2 ** b)) for b in range(len(planes))]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        V.norm(vec_col).alias("q_nrm"),
        V.random_projection_sign_bits(vec_col, planes).alias("q_bucket"),
    ).select(
        "query_id", "q_emb", "q_nrm", F.explode(probe_set).alias("bucket")
    )
    scored = keyed.join(
        broadcast(q), "bucket"
    ).filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        (V.dot("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )
