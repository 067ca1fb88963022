"""Skew-mitigation primitives (SURVEY §4 scale posture).

AQE's skew-join splitting (on in the engine defaults) handles most
runtime skew, but two shapes still need explicit help at 100 TB:

- a *skewed aggregation* where one key owns a double-digit percentage
  of all rows (one reducer does all the work, no matter how many
  partitions exist), and
- a *skewed join* against a dimension too big to broadcast, where the
  hot keys hash to the same few tasks.

Both use the standard salting construction: spread the hot rows over
``factor`` synthetic sub-keys, do the expensive shuffle at the salted
granularity, then take one cheap second pass over ``keys × factor``
rows (aggregation) or replicate the small side per salt (join). The
salt is deterministic per row (hash-based, not random) so retries and
speculative tasks produce identical output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_col(df: DataFrame, factor: int) -> Column:
    """Deterministic per-row salt in [0, factor): hash of the whole
    row's monotonic id is NOT stable across retries — hash the row's
    own values instead."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(factor))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    merges: list[Column],
    factor: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` aggregate raw rows at (keys, salt) granularity; ``merges``
    combine the ``factor`` partials per key (e.g. sum of partial sums,
    sum of partial counts). The first shuffle spreads a hot key over
    ``factor`` reducers; the second shuffles only |keys|·factor rows.

    ``hot_keys`` — values of ``keys[0]`` to salt (take them from
    :func:`skew_profile`) — restricts salting to the keys that need
    it; everything else keeps salt 0 and aggregates in one phase-1
    group exactly as an unsalted plan would. For aggregates with
    per-GROUP overhead this is the difference between a win and a
    catastrophe — measured on the 40%-hot-key corpus (SCALE.md §9,
    r13): the whole-corpus-salted grouped-agg pandas UDAF is 20×
    SLOWER than plain at sf1 (99.2 s vs 4.9 s — 65 537 keys × factor
    32 → 2.1M tiny Arrow groups), while hot-only salting WINS 1.74×
    at sf10 (9.0 s vs 15.7 s: the hot group's 24M-row Arrow transfer
    splits across 32 Python workers) and 1.34× for collect_set
    (7.1 s vs 9.5 s).

    Spark's built-in partial aggregation already does this *within*
    a partition; salting extends it across reducers when one key's
    post-combine volume still swamps a single task (think: one
    megadomain in a web corpus, one NULL-ish default key).

    Measured boundary (SCALE.md §9, 40%-hot-key corpus at sf10): for
    ALGEBRAIC aggregates (sum/count/avg) and exact countDistinct,
    map-side combine/Expand already absorb the skew and salting is
    pure overhead (2.3× / 1.4× slower, re-measured r13) — reserve
    this for HOLISTIC aggregates whose partial state is
    value-proportional (collect_list/set, percentile buffers,
    grouped-map/grouped-agg pandas UDFs), and salt those with
    ``hot_keys``, not the whole corpus.
    The skewed JOIN is where salting pays: see :func:`salted_join`
    (1.7× at sf10 r13, 2.8× r12) and AQE skew-split (2.6-5.1×, on by
    default).
    """
    salt = _salt_col(df, factor)
    if hot_keys is not None:
        salt = F.when(
            F.col(keys[0]).isin(list(hot_keys)), salt
        ).otherwise(F.lit(0))
    salted = df.withColumn(_SALT, salt)
    partial = salted.groupBy(*keys, _SALT).agg(*aggs)
    return partial.groupBy(*keys).agg(*merges)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small
    side ``factor`` times (explode), join on (keys, salt).

    Use when the small side is too large for broadcast and the big
    side's key distribution is heavy-tailed; the replication cost is
    |small|·factor rows — choose ``factor`` ≈ (hot-key rows / target
    task size). For broadcast-sized dimensions just use
    ``F.broadcast`` — this primitive is for the middle ground.

    Only ``inner`` and ``left`` are sound: the small side is
    replicated ``factor`` times, so any join that can emit unmatched
    small-side rows (right/full/right_anti/…) would emit each of them
    ``factor`` times. Guarded with ValueError rather than silently
    deduping — outer-join skew needs a different construction.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            f"{factor}x under outer variants"
        )
    salted_big = big.withColumn(_SALT, _salt_col(big, factor))
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    out = salted_big.join(replicated, [*on, _SALT], how)
    return out.drop(_SALT)


def skew_profile(
    df: DataFrame, key_cols: list[str], top_n: int = 10
) -> DataFrame:
    """The diagnostic that decides whether salting is needed at all:
    per-key frequencies for the ``top_n`` hottest keys plus each key's
    share of the total and its ratio to the MEAN key size (the skew
    factor AQE's skew-join threshold reasons about).

    One grouped count (map-side partials) + a broadcast 1-row totals
    frame; the top-n is TakeOrderedAndProject. Integer counts and
    integer permille shares — engine-exact. Run it on the join/agg key
    BEFORE shipping a pipeline; a skew factor in the hundreds means
    `salted_agg`/`salted_join` (or AQE skew-join at runtime) on that
    key, single digits means leave it alone."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "cnt",
            F.expr("cast((1000 * cnt) div _total as bigint)").alias(
                "share_permille"
            ),
            F.expr("cast(cnt * _nkeys div _total as bigint)").alias(
                "skew_factor"
            ),
        )
        .orderBy(F.desc("cnt"), *key_cols)
        .limit(top_n)
    )
