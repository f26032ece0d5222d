"""Key-heat probe — pay the salt tax only when a hot key exists.

Round 11 made every per-key event window hot-key-safe by defaulting to
the bucket-salted two-level forms (salted_rank / salted_prev /
salted_next / salted_suffix_min / salted_moving_agg / asof_join
``bucket_s`` / salted_sessionize).  That bought skew immunity
(BENCH_SF10_SKEW: 1.01× wall at a 3M-event hot key) at a PERMANENT
constant on healthy data: each salted form costs 1-9 extra Exchanges
(pins: markov 5→9, asof 1→3, attribution_capped 8→17), ≈17 % of the
whole uniform sf0.1 bench — paid even when no hot key exists, which on
a healthy 100 TB corpus is real money (VERDICT r11 #1).

This module is the missing dispatcher.  Both plan families are proven
bit-identical (tests/test_salted_rank.py, test_salted_moving_agg.py,
test_asof*.py, test_sessionize.py), so the choice is PURELY physical —
a cheap data-dependent probe can pick per dataset without any
correctness exposure:

1. sample the key column (fixed seed — the decision is deterministic
   for a given dataset), hash-aggregate the sample, take the max
   per-key sample count; estimate max key rows = max_count / fraction.
   One tiny job over ONE column (parquet scan is column-pruned); the
   sampled agg is map-side combined, the final agg is a scalar.
2. hot iff the estimated hottest key holds ≥ ``hot_rows`` rows.  The
   threshold is ABSOLUTE, not a share: a straggler is a task that
   sorts the hot key's whole stream, and that hurts when the stream is
   large in rows, regardless of corpus size.  Default 1M: below that a
   single task's in-memory sort costs less than the salted plan's
   extra corpus-wide Exchanges; the measured hot corpora sit far above
   (sf10-skew hot user = 3M rows → salted; uniform sf10 max user ≈
   4k rows → plain).  Estimator noise at the threshold is irrelevant
   to correctness — both outcomes produce identical rows.
3. results memoize per ``cache_key`` (callers pass (sf_dir, table,
   key)), so a bench/gate process probes each dataset ONCE — the
   moral equivalent of table statistics (ANALYZE), which is exactly
   what a production deployment would persist instead.

At 100 TB the probe is one column-pruned sampled scan amortized over
every query on the table — the cluster-native replacement for "always
pay the salt" (and `events_hot_key_profile` remains the full audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default absolute hot threshold (rows held by the hottest key)
HOT_ROWS_DEFAULT = 1_000_000
# default probe sample fraction: at the 1M-row threshold the sampled
# count is ~20k ± 140 (binomial), so the decision is sharp
SAMPLE_FRAC_DEFAULT = 0.02
SEED = 1337

# (cache_key) -> estimated max key rows; process-lifetime, like a
# statistics cache.  Keyed by caller-supplied dataset identity, never
# by DataFrame object (plans don't hash usefully).
_EST_CACHE: dict[tuple, float] = {}


def estimated_max_key_rows(
    df: DataFrame,
    key_cols: list[str] | str,
    sample_frac: float = SAMPLE_FRAC_DEFAULT,
    seed: int = SEED,
) -> float:
    """Estimated row count of the hottest key (sampled, one tiny job).

    NULL keys group together like any other value — a hot NULL key is
    still a straggler in a per-key window."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if not 0 < sample_frac <= 1:
        raise ValueError(f"sample_frac must be in (0, 1], got {sample_frac}")
    mx = (
        df.select(*key_cols)
        .sample(fraction=sample_frac, seed=seed)
        .groupBy(*key_cols)
        .count()
        .agg(F.max("count").alias("_mx"))
        .first()["_mx"]
    )
    return (mx or 0) / sample_frac


def pick_bucket(
    df: DataFrame,
    key_cols: list[str] | str,
    bucket_s: int = 6 * 3600,
    hot_rows: int = HOT_ROWS_DEFAULT,
    sample_frac: float = SAMPLE_FRAC_DEFAULT,
    cache_key: tuple | None = None,
) -> int | None:
    """The dispatch decision: ``bucket_s`` (use the salted plan) if the
    hottest key is estimated ≥ ``hot_rows`` rows, else ``None`` (use
    the plain single-window plan).  Plugs directly into every operator
    of the salted family, whose ``bucket_s=None`` IS the plain form.

    ``cache_key``: dataset identity for memoization — pass
    ``(sf_dir, table, *key_cols)`` so repeated queries in one process
    probe once.
    """
    if cache_key is not None and cache_key in _EST_CACHE:
        est = _EST_CACHE[cache_key]
    else:
        est = estimated_max_key_rows(df, key_cols, sample_frac=sample_frac)
        if cache_key is not None:
            _EST_CACHE[cache_key] = est
    return bucket_s if est >= hot_rows else None


def exact_max_group_rows(
    df: DataFrame,
    key_cols: list[str] | str,
    cache_key: tuple | None = None,
) -> int:
    """EXACT row count of the hottest group (one map-side-combined
    aggregation job; scalar result), memoized like the sampled probe.

    Why exact, not sampled (r13, cap-family dispatch): the salted
    window families could dispatch on a SAMPLED estimate because both
    plans are bit-identical — estimator noise has zero correctness
    exposure.  The CAP families (block caps, posting caps, sub-cell
    caps) are different: capped and uncapped plans produce different
    ROWS whenever a cap binds, so the only dispatch condition that is
    safe against the static capped oracle is a THEOREM, not an
    estimate — "exact max group size <= cap" proves the cap cannot
    bind, hence capped == uncapped bit-for-bit and the cheaper
    uncapped plan may be chosen.  A sampled probe at the threshold
    could pick the uncapped plan while the cap binds, silently
    changing results.  The exact probe costs one full-column
    aggregation, amortized by the same per-dataset memoization as
    table statistics.
    """
    if cache_key is not None:
        key = ("exact_max_group",) + cache_key
        if key in _EST_CACHE:
            return int(_EST_CACHE[key])
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    mx = (
        df.groupBy(*key_cols)
        .count()
        .agg(F.max("count").alias("_mx"))
        .first()["_mx"]
    )
    mx = int(mx or 0)
    if cache_key is not None:
        _EST_CACHE[("exact_max_group",) + cache_key] = mx
    return mx


def memo_stat(cache_key: tuple, compute):
    """Memoize an arbitrary dataset statistic in the same
    process-lifetime statistics cache as the heat estimates (callers
    fold a ``dataset_fingerprint`` into the key for self-healing
    staleness, same contract as ``pick_bucket``)."""
    key = ("stat",) + cache_key
    if key not in _EST_CACHE:
        _EST_CACHE[key] = compute()
    return _EST_CACHE[key]


def clear_cache() -> None:
    """Drop memoized estimates (tests; or after rewriting a dataset)."""
    _EST_CACHE.clear()


def dataset_fingerprint(path: str) -> tuple | None:
    """Cheap identity of a parquet dataset directory for cache keying
    (ADVICE r12: a process that rewrites a dataset in place — fixture
    rebuilds, compaction, SCD2 maintenance — must not reuse a stale
    heat decision).  One os.scandir: (file count, max mtime_ns, total
    bytes) changes on any overwrite/append; single-file datasets stat
    the file directly; None when the path isn't local (remote stores
    fall back to caller-managed clear_cache()).  Fold the result into
    ``cache_key`` so staleness is self-healing instead of a
    discipline."""
    import os

    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return (1, st.st_mtime_ns, st.st_size)
        n, mx, total = 0, 0, 0
        with os.scandir(path) as it:
            for e in it:
                st = e.stat()
                n += 1
                mx = max(mx, st.st_mtime_ns)
                total += st.st_size
        return (n, mx, total)
    except OSError:
        return None
