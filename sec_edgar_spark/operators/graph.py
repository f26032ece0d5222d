"""Connected components over a pair list — dedup cluster assignment.

After candidate generation + verification (MinHash-LSH, ngram-Jaccard,
SimHash...), near-duplicate PAIRS must become CLUSTERS so a pipeline can
keep one canonical document per group: pairs (a,b),(b,c) are one
3-document cluster even though (a,c) never met in any bucket.  That is
connected components, the one genuinely iterative algorithm in the
dedup family.

Formulation: min-label propagation (hook) + pointer jumping
(compress), the data-parallel Shiloach–Vishkin shape.  Every node
starts labelled with itself; each round, every node (1) takes the min
of its own label and its neighbours' labels, then (2) replaces its
label with its label's label.  The hook step alone converges in
diameter rounds — fine for dedup graphs (dense clusters of copies,
diameter 2-4) but pathological for chain-shaped graphs; the compress
step doubles the distance a label travels per round, so a
diameter-D component converges in O(log D) rounds (a 100k-node chain:
~20 rounds, not 100k — probed in tests/test_graph.py).

Compression preserves the invariant that a node's label is always the
id of some node in its own component and never below the component
min (it jumps to label[label], which is <= label and co-component),
so the fixpoint is still exactly label = component min.

Scale shape per round: one shuffle join (labels onto edge endpoints) +
one groupBy(min) for the hook, one self-equi-join for the compress —
all partial-aggregated / hash joins; the driver only runs the
convergence check (a count), never touches row data.  Lineage is cut
every round with lineage_cut (localCheckpoint, or reliable checkpoint
when spark.sec_edgar.checkpoint_dir is set) so plans stay O(1) deep
regardless of
iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._lineage import lineage_cut


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node
    id reachable.  Deterministic.  Raises if not converged in
    ``max_iter`` rounds (~log2(diameter) + slack needed — raise for
    extreme graphs)."""
    sym = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("id"), F.col(src).alias("nbr")))
        .distinct()
        .transform(lineage_cut)
    )
    labels = sym.select("id").distinct().select(
        "id", F.col("id").alias("label")
    ).transform(lineage_cut)

    # Loop joins carry an explicit MERGE hint: at corpus scale both
    # sides are node/edge-sized so SMJ is the only sane strategy, but
    # at gate SFs the checkpointed frames carry exact (small) stats and
    # Catalyst auto-broadcasts EVERY ROUND — one driver-side hash-table
    # build per iteration, which is exactly what died first under the
    # 2 GB heap of BENCH_LOWMEM.md (notEnoughMemoryToBuildAndBroadcast
    # in round 2 of this loop).  SMJ spills; per-round broadcasts
    # don't.  The hint makes the tight-heap plan THE plan.
    for _ in range(max_iter):
        nbr_labels = sym.hint("merge").join(
            labels.select(
                F.col("id").alias("nbr"), F.col("label").alias("nbr_label")
            ),
            "nbr",
        )
        pulled = nbr_labels.groupBy("id").agg(F.min("nbr_label").alias("min_nbr"))
        # The round's STARTING label rides along as `old` so the
        # convergence check below is a filter over the checkpointed
        # round output instead of a fourth merge-join of new vs old
        # labels per round (r13, guide §2.4 — one long column through
        # the checkpoint buys one sort-merge join, its two sorts and
        # its exchange, every round).
        hooked = labels.hint("merge").join(pulled, "id", "left").select(
            "id",
            F.col("label").alias("old"),
            F.least(
                F.col("label"), F.coalesce("min_nbr", F.col("label"))
            ).alias("label"),
        )
        # Pointer jumping: label := label[label].  Every label is itself
        # a node id present in `hooked`, so the lookup always hits; the
        # left join + coalesce is belt-and-braces.
        new_labels = (
            hooked.alias("a")
            .hint("merge")
            .join(
                hooked.select(
                    F.col("id").alias("label"), F.col("label").alias("gl")
                ).alias("b"),
                "label",
                "left",
            )
            .select(
                "id",
                "old",
                F.least(F.col("label"), F.coalesce("gl", F.col("label"))).alias(
                    "label"
                ),
            )
            # lazy cut (r13): the changed-count below materializes the
            # round — one job instead of checkpoint + count per round.
            .transform(lambda d: lineage_cut(d, eager=False))
        )
        changed = new_labels.filter(F.col("label") != F.col("old")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """(id, rank) after ``iters`` synchronous PageRank rounds, in
    integer micro-units (rank mass ``scale`` split over N nodes) so the
    result is bit-identical across engines and cluster layouts — no
    floating-point sum-order sensitivity, which is what makes iterative
    rank scores normally impossible to value-check distributively.

    Arithmetic per round (all non-negative BIGINT, overflow-safe for
    scale<=1e12 since 85*sum_contrib <= 85*scale ~ 8.5e13 << 2^63):
        contrib(v)  = rank(v) div out_deg(v)
        rank'(u)    = (15*scale div 100) div N
                      + (85 * sum_{v->u} contrib(v)) div 100
    Dangling nodes never exist because the input is symmetrized (and
    deduplicated) INTERNALLY — the standard undirected-PageRank
    formulation for influence scoring on similarity/co-occurrence
    graphs, and the same caller contract as
    :func:`connected_components` / :func:`label_propagation` (passing
    already-symmetric edges is a no-op thanks to the distinct).  A
    directed formulation would silently leak rank mass at dst-only
    nodes, so this operator refuses to be one.

    Scale shape per round: one shuffle join (ranks onto edge sources,
    partitioned by node id) + one partial-aggregated groupBy(dst) —
    identical to :func:`connected_components`'s hook step; lineage cut
    per round with lineage_cut.  The driver never sees row data.
    """
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = fwd.unionByName(
        fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().transform(lineage_cut)
    deg = sym.groupBy("s").agg(F.count("*").alias("deg"))
    nodes = sym.select(F.col("s").alias("id")).distinct().transform(lineage_cut)
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0).cast("bigint").alias("rank"))
    teleport = (15 * scale // 100) // n
    ranks = nodes.select("id", F.lit(scale // n).cast("bigint").alias("rank"))
    for _ in range(iters):
        contrib = (
            ranks.join(deg, ranks["id"] == deg["s"])
            .select("id", F.expr("rank div deg").alias("contrib"))
        )
        inbound = (
            sym.join(contrib.withColumnRenamed("id", "s"), "s")
            .groupBy(F.col("d").alias("id"))
            .agg(F.sum("contrib").alias("s_in"))
        )
        ranks = (
            nodes.join(inbound, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.expr("85 * coalesce(s_in, 0L) div 100")
                ).cast("bigint").alias("rank"),
            )
            # lazy cut (r13): fixed-iteration loop with no per-round
            # action and ONE consumer of each round's output — the
            # final action computes the whole chain in one job while
            # the plan stays truncated per round.
            .transform(lambda d: lineage_cut(d, eager=False))
        )
    return ranks


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


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """(id, community) after ``iters`` synchronous label-propagation
    rounds — community detection (dense groups), complementing
    :func:`connected_components` (reachability) and
    :func:`pagerank_int` (influence).

    Fully deterministic: each round every node adopts the label that
    is most frequent among its neighbours, ties broken by the SMALLER
    label — an integer argmax with a total order, so the trajectory is
    engine- and partitioning-independent (the oracle unrolls the same
    rounds as SQL CTEs).  Classic async LPA is run-order dependent and
    unverifiable; the synchronous total-ordered form trades a little
    convergence speed for replayability.

    Scale shape per round: one join (labels onto edge destinations) +
    one (node, label) count agg + one per-node top-1 — all hash
    partial-aggregated; WindowGroupLimit keeps the top-1 from sorting
    whole vote lists.  Lineage cut per round with lineage_cut.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .transform(lineage_cut)
    )
    labels = sym.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    for _ in range(iters):
        votes = (
            sym.join(
                labels.select(F.col("id").alias("b"), "label"), "b"
            )
            .groupBy(F.col("a").alias("id"), "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("label"))
        labels = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("id", "label")
            # lazy cut (r13): one consumer per round, no per-round
            # action — all rounds compute in the final job.
            .transform(lambda d: lineage_cut(d, eager=False))
        )
    return labels.select("id", F.col("label").alias("community"))


def kcore_prune(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """``rounds`` synchronous k-core pruning steps over an undirected
    edge list ``(s, d)``: each round drops every node whose CURRENT
    degree is below ``k`` (and the edges touching it), simultaneously —
    the deterministic fixed-round form of k-core decomposition (run to
    fixpoint it yields the exact k-core; fixed rounds keep the
    trajectory engine-replayable, the same contract as
    label_propagation/pagerank_int).  Returns the surviving
    ``(id, degree)`` frame.

    Scale shape per round: one degree aggregate (map-combined) + two
    semi-joins to keep edges whose BOTH endpoints survive — no
    collect, no driver loop.  Lineage is cut per round with
    lineage_cut (same discipline as label_propagation above):
    each round references the previous survivor set THREE times
    (degree agg + two semi-join probes), so without truncation the
    unrolled plan grows ~3^rounds (measured: 134 Exchanges at
    rounds=3).  With the cut the executed plan is O(1) per round —
    one materialised survivor scan feeding three consumers — so the
    operator survives run-to-fixpoint depths (8-15 rounds on real
    graphs), not just the fixed-round demo.
    """
    from pyspark.sql import functions as F

    und = edges.select("s", "d").union(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().transform(lineage_cut)
    for _ in range(rounds):
        deg = und.groupBy("s").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("s")
        und = (
            und.join(keep, "s", "semi")
            .join(keep.withColumnRenamed("s", "d"), "d", "semi")
        ).transform(lineage_cut)
    return und.groupBy(F.col("s").alias("id")).agg(
        F.count("*").alias("degree")
    )


def kcore_fixpoint(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    assert_rounds: int | None = None,
) -> DataFrame:
    """Exact k-core: run :func:`kcore_prune` rounds until no node is
    dropped (fixpoint), bounded by ``max_rounds`` as a runaway guard.

    ``assert_rounds``: if set, RAISE when convergence needs more than
    this many pruning rounds.  The oracle twin of the gate query
    over-unrolls a fixed number of rounds and relies on idempotence at
    the fixpoint — valid only when convergence depth <= the unroll, so
    the gate query pins the unroll here and a deeper graph fails
    loudly instead of silently diverging from its oracle.

    This is the form a production graph pipeline actually needs — the
    fixed-round variant exists for engine-replayable oracle checks;
    this one is the real decomposition.  The driver-side loop state is
    a single edge ``count()`` per round (cheap over the just-
    checkpointed partitions, no extra shuffle; edge count unchanged ⇔
    fixpoint, because every node present in the edge list has degree
    ≥ 1, so dropping any node removes ≥ 1 edge), never row data, and
    lineage is cut per round with lineage_cut so the executed
    plan stays O(1) deep at any depth.  Converges in at most |V|
    rounds; in practice degeneracy-ordered graphs finish in <15.
    """
    und = edges.select("s", "d").union(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().transform(lineage_cut)
    n_prev = und.count()
    for rnd in range(1, max_rounds + 1):
        deg = und.groupBy("s").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("s")
        und = (
            und.join(keep, "s", "semi")
            .join(keep.withColumnRenamed("s", "d"), "d", "semi")
        ).transform(lambda d: lineage_cut(d, eager=False))
        # the count IS the round's materialization (lazy cut, r13) —
        # one job per round instead of checkpoint + count; the three
        # next-round consumers then read the materialized partitions.
        n = und.count()
        if n == n_prev:
            break
        # A round that still drops nodes past the pinned unroll means
        # prune^assert_rounds is NOT the fixpoint (a dropping round
        # AT the pin is fine — the pin-th prune may be the last one).
        if assert_rounds is not None and rnd > assert_rounds:
            raise ValueError(
                f"kcore_fixpoint: not converged after {rnd} rounds "
                f"(edge count still dropping {n_prev} -> {n}) but the "
                f"caller pinned assert_rounds={assert_rounds} — its "
                "oracle's fixed unroll no longer reaches the fixpoint; "
                "raise the unroll (and this pin) together"
            )
        n_prev = n
    return und.groupBy(F.col("s").alias("id")).agg(
        F.count("*").alias("degree")
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Kiveris large-star: every node connects its STRICTLY LARGER
    neighbours to the minimum of its closed neighbourhood."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("mv"), F.col("u"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame, pre_oriented: bool = False) -> DataFrame:
    """Kiveris small-star: orient each edge to (larger, smaller); every
    node connects its smaller-or-equal neighbourhood (itself included)
    to that neighbourhood's minimum.

    ``pre_oriented=True`` (r13) skips the orient+distinct exchange
    when the input is ALREADY oriented-and-distinct — which
    ``_large_star`` output provably is: its rows are (old_v, m) with
    m = least(min_nbr, old_u) <= old_u < old_v, so u > v strictly on
    every row (greatest/least are the identity), and it ends in its
    own ``.distinct()``.  Fusing small∘large on that proof removes one
    |E|-row shuffle per WCC round.
    """
    oriented = (
        e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        if pre_oriented
        else e.select(
            F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
        ).distinct()
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("mb"))
    joined = oriented.join(mins, "a")
    kids = joined.filter(F.col("b") != F.col("mb")).select(
        F.col("b").alias("u"), F.col("mb").alias("v")
    )
    selfs = mins.select(F.col("a").alias("u"), F.col("mb").alias("v"))
    return kids.unionByName(selfs).distinct()


def wcc_star(
    edges: DataFrame,
    src: str = "s",
    dst: str = "d",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the shuffle-optimal WCC for MapReduce-shaped engines.

    Why a second CC alongside :func:`connected_components`:
    Shiloach–Vishkin keeps a LABEL TABLE joined against the edge list
    every round, so each round shuffles |E| + |V| rows no matter how
    far convergence has progressed.  Star contraction rewrites the
    EDGE LIST itself toward a forest of stars — the working set
    SHRINKS every round (each large-star hooks whole neighbourhoods
    onto local minima), which is the property that matters at 100 TB:
    late rounds touch a fraction of the original edges.  Convergence
    is O(log² n) rounds worst-case, O(log n) in practice.

    Both star ops are min-AGGREGATES joined back on the grouping key —
    partial-aggregated, combiner-friendly, skew-safe (a hub node's min
    is computed map-side; no per-key buffer, unlike a collect_list
    formulation).  The driver's loop state per round is one count plus
    one anti-join isEmpty over just-checkpointed partitions — both
    edge lists are distinct, so equal counts + (new ⊆ old) <=> the
    edge SET is stable, no row data ever reaches the driver; lineage
    is cut per round with lineage_cut so the executed plan stays
    O(1) deep.

    At the fixpoint the edge list IS the assignment: every edge is
    (node, component-min) and every center is its component's min, so
    the result needs no extra propagation pass.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(lambda d: lineage_cut(d, eager=False))
    )
    n_prev = -1
    for _ in range(max_rounds):
        prev_e = e
        # Lazy cut + immediate count (r13): the count IS the round's
        # materialization, so each round runs ONE job instead of a
        # checkpoint job followed by a count job; the plan is still
        # truncated at build time.  _small_star fuses on _large_star's
        # oriented-and-distinct output (see its docstring) — one
        # fewer |E|-row exchange per round.
        e = _small_star(_large_star(e), pre_oriented=True).transform(
            lambda d: lineage_cut(d, eager=False)
        )
        n = e.count()
        if n == n_prev and e.join(prev_e, ["u", "v"], "left_anti").isEmpty():
            break
        n_prev = n
    else:
        raise ValueError(
            f"wcc_star: not converged after {max_rounds} rounds"
        )
    centers = e.select(F.col("v").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )
    return (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .unionByName(centers)
        .distinct()
    )


def ppr_int(
    edges: DataFrame,
    is_seed,
    iters: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """Personalized PageRank in integer micro-units: identical
    arithmetic to :func:`pagerank_int` except ALL teleport mass (and
    all initial mass) goes to the SEED set — ``is_seed`` is a
    Column-builder ``id_col -> BooleanColumn`` evaluated as a pure
    expression, so the seed set is plan-replayable by an oracle.  The
    result ranks nodes by proximity to the seeds (the random surfer
    restarts AT a seed), the standard similarity-to-a-set score behind
    "more like these" retrieval and seed-expansion labeling.

    Same per-round scale shape as pagerank_int (one node-partitioned
    join + one partial agg, lineage cut per round); mass conservation
    in integer units is inherited (floor-division dust excepted).
    """
    fwd = edges.select(F.col(edges.columns[0]).alias("s"),
                       F.col(edges.columns[1]).alias("d"))
    sym = fwd.unionByName(
        fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().transform(lineage_cut)
    deg = sym.groupBy("s").agg(F.count("*").alias("deg"))
    nodes = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("seed", is_seed(F.col("id")))
        .transform(lineage_cut)
    )
    ns = nodes.filter(F.col("seed")).count()
    if ns == 0:
        return nodes.select("id", F.lit(0).cast("bigint").alias("rank"))
    tele = (15 * scale // 100) // ns
    r0 = scale // ns
    ranks = nodes.select(
        "id",
        F.when(F.col("seed"), F.lit(r0)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("rank"),
    )
    for _ in range(iters):
        contrib = (
            ranks.join(deg, ranks["id"] == deg["s"])
            .select(ranks["id"].alias("cid"),
                    F.expr("rank DIV deg").alias("contrib"))
        )
        inflow = (
            sym.join(contrib, sym["s"] == F.col("cid"))
            .groupBy("d")
            .agg(F.sum("contrib").alias("s_in"))
        )
        ranks = (
            nodes.join(inflow, nodes["id"] == inflow["d"], "left")
            .select(
                "id",
                (
                    F.when(F.col("seed"), F.lit(tele)).otherwise(F.lit(0))
                    + F.expr("85 * COALESCE(s_in, 0) DIV 100")
                )
                .cast("bigint")
                .alias("rank"),
            )
            # lazy cut (r13): same single-consumer chain argument as
            # pagerank_int — all rounds compute in the final job.
            .transform(lambda d: lineage_cut(d, eager=False))
        )
    return ranks
