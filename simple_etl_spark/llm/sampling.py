"""Deterministic corpus sampling for training-data curation.

Random `df.sample()` is non-reproducible across runs, engines, and
partition layouts — useless for a pipeline whose sample membership
must be auditable (and whose re-runs must not silently change the
training set). The standard fix is content-hash bucketing: a row is in
the p% sample iff a stable hash of its key lands in the first p% of
hash space. Same key → same decision, on any engine, forever; the
sample is also *consistent* across tables keyed by the same id
(joinable samples) and monotone in p (the 1% sample is a subset of
the 10% sample — grow the rate without resampling history).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 6 hex chars = 24 bits of hash space
_SPACE = 16**6


def hash_bucket(col: Column | str, buckets: int = _SPACE) -> Column:
    """Stable bucket in [0, buckets) from md5 of the key's string form
    (md5 so the oracle can reproduce it verbatim; crypto strength is
    irrelevant here, distribution uniformity is what matters)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 6), 16, 10).cast("bigint")
    return h % F.lit(buckets) if buckets != _SPACE else h


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int | dict,
    key_col: str,
    default_quota: int = 0,
) -> DataFrame:
    """Deterministic per-stratum quota sample: within each stratum,
    rank rows by the md5 of their key (ties broken by the key itself)
    and keep the first ``n_per_stratum`` — the balanced-mix primitive
    for training-data curation (documents per language/domain in a
    prescribed ratio, reproducible forever).

    ``n_per_stratum`` is either one quota for every stratum or a
    ``{stratum_value: quota}`` mix (the domain-weighting shape:
    "218 en, 70 de, 10 of everything else"); strata absent from the
    dict get ``default_quota`` (0 = excluded entirely). The mix rides
    the plan as a literal CASE expression — no quota table, no join.

    The ranking window partitions by the stratum: one shuffle on the
    stratum key, per-stratum sort — the canonical distributed quota
    plan. Because membership is content-hash-ranked (not `LIMIT` over
    an arbitrary order), the sample is engine-independent and stable
    under repartitioning; growing a quota only ever adds rows
    (monotone, like :func:`hash_sample`). Adds ``sample_rank``
    (1-based within the stratum)."""
    if isinstance(n_per_stratum, dict):
        if not n_per_stratum:
            raise ValueError("quota dict must not be empty")
        if any(q < 0 for q in n_per_stratum.values()) or default_quota < 0:
            raise ValueError("quotas must be >= 0")
        quota = F.lit(default_quota)
        for value, q in sorted(n_per_stratum.items()):
            quota = F.when(F.col(strata_col) == F.lit(value), F.lit(q)).otherwise(
                quota
            )
    else:
        if n_per_stratum < 1:
            raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
        quota = F.lit(n_per_stratum)
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= quota)
    )


def dataset_split(
    df: DataFrame,
    key_col: str,
    val_permille: int = 50,
    test_permille: int = 50,
) -> DataFrame:
    """Deterministic train/val/test assignment: the key's md5 bucket
    in [0, 1000) picks the split — test takes the first
    ``test_permille`` buckets, val the next ``val_permille``, train
    the rest. Jointly exhaustive, disjoint, engine-independent, and
    STABLE UNDER CORPUS GROWTH: a document's split never changes when
    other documents are added or removed (the leakage-safety property
    a random split lacks — a re-run after ingest must not move held-out
    docs into train). Same-keyed tables land in the same split
    (joinable holdouts). Adds a ``split`` column."""
    if val_permille < 0 or test_permille < 0:
        raise ValueError("split permilles must be >= 0")
    if val_permille + test_permille >= 1000:
        raise ValueError(
            f"val+test permille must be < 1000, got "
            f"{val_permille + test_permille}"
        )
    b = hash_bucket(F.col(key_col), 1000)
    split = (
        F.when(b < F.lit(test_permille), F.lit("test"))
        .when(b < F.lit(test_permille + val_permille), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def training_order(
    df: DataFrame,
    key_col: str,
    seed: str | int = 0,
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic seeded global shuffle + shard assignment — the
    "randomize training order and write N shard files" step at the end
    of every pretraining pipeline, without a global sort.

    Each row gets a stable permutation key ``md5(seed || key)``; the
    first 15 hex chars pick the shard (``hash % n_shards``) and the
    remaining 17 order rows *within* the shard, so changing the seed
    reshuffles everything while the same seed reproduces the identical
    order on any engine, forever. Because shard and position derive
    from disjoint slices of one digest, both are uniform and
    independent; a reader consuming shards round-robin sees a uniform
    random permutation of the corpus.

    Scale shape: ONE shuffle, keyed by shard, then a per-shard sort
    (the ranking window partitions on ``shard``). There is no global
    ``ORDER BY rand()`` — that plan range-partitions the entire corpus
    through a single total order, which at 100 TB means a skewed range
    exchange and a driver-side sampling pass. Here each shard sorts
    independently; pick ``n_shards`` so one shard ≈ one comfortable
    task (corpus_bytes / few-GiB), exactly how shard files are sized
    in practice.

    Adds ``shard`` (bigint in [0, n_shards)) and ``pos`` (1-based
    bigint within the shard)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql.window import Window

    shard, order_key = _perm_parts(key_col, seed, n_shards)
    w = Window.partitionBy("shard").orderBy("order_key", key_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("order_key", order_key)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("order_key")
    )


def _perm_parts(key_col: str, seed: str | int, n_shards: int):
    """(shard, within-shard order key) from disjoint slices of one
    md5(seed|key) digest — the permutation primitive training_order
    and curriculum_order share."""
    digest = F.md5(
        F.concat_ws("|", F.lit(str(seed)), F.col(key_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint")
        % F.lit(n_shards)
    )
    return shard, F.substring(digest, 16, 17)


def curriculum_order(
    df: DataFrame,
    phase_col: str,
    phase_order: list[str],
    key_col: str,
    seed: str | int = 0,
    n_shards: int = 16,
) -> DataFrame:
    """Curriculum training order: phases consumed in the given order,
    seeded-uniform shuffle WITHIN each phase — the "easy/clean data
    first" schedule, e.g. the head/middle/tail buckets of
    :func:`~simple_etl_spark.llm.selection.quality_percentile_buckets`.

    Shard assignment is phase-independent (the same md5(seed|key)
    digest split as :func:`training_order`), so every shard contains
    every phase in proportion; a reader consuming each shard in
    ``pos`` order sees phase 0's rows (uniformly shuffled) before
    phase 1's, and round-robin across shards preserves the global
    curriculum. Same scale shape as training_order: ONE shard-keyed
    shuffle, per-shard sort, no global ORDER BY.

    Rows whose ``phase_col`` value is not in ``phase_order`` sort
    after every listed phase (a deliberate catch-all tail — NULL
    buckets from unscorable rows land at the end, visibly, rather
    than erroring mid-pipeline). Adds ``shard`` and ``pos``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if not phase_order:
        raise ValueError("phase_order must list at least one phase")
    from pyspark.sql.window import Window

    phase_idx = F.lit(len(phase_order))
    for i in range(len(phase_order) - 1, -1, -1):
        phase_idx = F.when(
            F.col(phase_col) == phase_order[i], F.lit(i)
        ).otherwise(phase_idx)
    shard, order_key = _perm_parts(key_col, seed, n_shards)
    w = Window.partitionBy("shard").orderBy("phase_idx", "order_key", key_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("phase_idx", phase_idx.cast("bigint"))
        .withColumn("order_key", order_key)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("order_key")
    )


def hash_sample(df: DataFrame, key_col: str, percent: float) -> DataFrame:
    """Keep rows whose hash bucket falls in the first ``percent``% of
    the 24-bit hash space — deterministic, engine-independent sampling.

    (Round 1 exposed an ``id_space`` knob, but the bucket range is
    fixed by the 6-hex-char prefix: any other space either exceeds the
    attainable range — silently sampling up to 100% — or introduces
    modulo bias. Removed rather than documented around.)"""
    if not 0.0 <= percent <= 100.0:
        raise ValueError(f"percent must be in [0, 100], got {percent}")
    cutoff = int(_SPACE * percent / 100.0)
    return df.filter(hash_bucket(key_col) < F.lit(cutoff))


def minmax_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    out_col: str = "normalized",
) -> DataFrame:
    """Per-group min-max feature scaling to [0, 1]: (v - min)/(max -
    min), the standard normalization before mixing heterogeneous
    quality signals into one score. Constant groups (max == min) map
    to NULL rather than dividing by zero — the caller decides whether
    a featureless group means 0, 0.5, or exclusion.

    Scale shape: one grouped min/max aggregation (map-side partials)
    broadcast back onto the fact table — the group frame is
    |groups|-sized; the fact table is scanned once and never
    shuffled. The normalized value is a double ratio of two exact
    inputs; consumers that expose it in graded output quantize to
    ≤ 6 dp per the engine's float-lineage rule."""
    stats = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    joined = df.join(F.broadcast(stats), list(group_cols))
    norm = F.when(
        F.col("_mx") != F.col("_mn"),
        (F.col(value_col) - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
    )
    return joined.withColumn(out_col, norm).drop("_mn", "_mx")


def cluster_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    val_permille: int = 50,
    test_permille: int = 50,
) -> DataFrame:
    """Near-dup-leakage-safe train/val/test assignment: the split key
    is the document's near-duplicate CLUSTER, not the document — so a
    near-duplicate pair can never straddle train and a holdout, the
    eval-contamination bug a per-document hash split (`dataset_split`)
    cannot prevent (two near-copies hash independently and land in
    different splits ~2·p·(1-p) of the time).

    ``clusters`` is an (id, cluster) assignment — the output of
    `dedup.dedup_clusters` (connected components over verified
    near-dup pairs); singletons map to themselves, so coverage is
    total. Same growth-stability contract as `dataset_split`: a
    cluster's split never changes as unrelated docs arrive; a MERGE of
    two clusters (a new bridging near-dup) re-keys to the merged
    cluster's min-id — the unavoidable cost of keeping the safety
    invariant, and the reason holdout sets are frozen by snapshot, not
    recomputed per ingest.

    One broadcast-or-keyed join + the md5 bucket projection; nothing
    beyond the clustering itself."""
    joined = docs.join(clusters, id_col)
    return dataset_split(joined, cluster_col, val_permille, test_permille)


def temperature_weights(
    df: DataFrame,
    strata_col: str,
    total_n: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled multinomial domain mixture: per-stratum
    target sample counts proportional to count^alpha — the standard
    rebalancing for multilingual/multi-domain pretraining (alpha < 1
    up-samples small domains relative to their share; alpha = 1 is
    proportional).

    Returns one row per stratum: (stratum, n_docs, weight_e10 — the
    stratum's normalized mixture weight in 10^-10 units, largest-
    remainder apportioned target_n summing exactly to ``total_n``,
    and take_n = min(target_n, n_docs), what single-epoch sampling
    can actually deliver).

    Engine-exactness: ``alpha`` is restricted to {1.0, 0.5, 0.25} —
    count^alpha is then an sqrt chain, and IEEE-754 sqrt is CORRECTLY
    ROUNDED, so both engines compute bit-identical doubles (pow() has
    no such guarantee, which is why free alpha is refused rather than
    silently drifting). The double weight is quantized to
    decimal(16,6) — the engine-wide ≤6-dp discipline for any double-
    derived decimal (tests/test_float_lineage.py), ample resolution
    for apportionment; both engines round the same double half-away-
    from-zero, and the 10-digit integer part bounds a stratum at
    10^20 docs (overflow errors loudly on either engine, never
    drifts) — then lifted to exact 10^-6 integer units (the
    decimal(16,6)·decimal(7,0) product is decimal(24,6), far inside
    precision 38 — no silent scale cut). Every division from there
    is a non-negative decimal(38,0) ``div`` — floor on both engines;
    alpha = 1.0 skips the lift and apportions on the raw exact
    counts. Largest-remainder ties break by stratum value ascending.

    Scale shape: ONE map-side-combinable count aggregation over the
    corpus; everything after operates on the |strata|-sized frame
    (window over |strata| rows — trivially small)."""
    if total_n < 0:
        raise ValueError(f"total_n must be >= 0, got {total_n}")
    roots = {1.0: 0, 0.5: 1, 0.25: 2}
    if alpha not in roots:
        raise ValueError(
            f"alpha must be one of {sorted(roots)} (sqrt chains are the "
            f"only engine-exact powers — IEEE pow() is not correctly "
            f"rounded), got {alpha}"
        )
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    if alpha == 1.0:
        wint = F.col("n_docs")
    else:
        wexpr = F.col("n_docs").cast("double")
        for _ in range(roots[alpha]):
            wexpr = F.sqrt(wexpr)
        wint = (
            wexpr.cast("decimal(16,6)") * F.lit(1_000_000).cast("decimal(7,0)")
        ).cast("bigint")
    wtotal = Window.partitionBy()
    # sum/products in decimal(38,0): wsum over many strata and
    # total_n·w both clear bigint range; div returns bigint (the
    # quotient is <= total_n / <= 10^10)
    weighted = counts.withColumn(
        "_w", wint.cast("decimal(38,0)")
    ).withColumn("_wsum", F.sum(wint.cast("decimal(38,0)")).over(wtotal))
    apportioned = (
        weighted.withColumn("_base", F.expr(f"({total_n} * _w) div _wsum"))
        .withColumn("_rem", F.expr(f"({total_n} * _w) % _wsum"))
        .withColumn("_leftover", F.lit(total_n) - F.sum("_base").over(wtotal))
        .withColumn(
            "_rrank",
            F.row_number().over(
                # asc_nulls_last: a NULL stratum group sorts last on
                # both engines (Spark asc defaults NULLS FIRST, SQL
                # engines default NULLS LAST — pin the tie-break)
                Window.partitionBy().orderBy(
                    F.desc("_rem"), F.asc_nulls_last("stratum")
                )
            ),
        )
    )
    target = F.col("_base") + F.when(
        F.col("_rrank") <= F.col("_leftover"), F.lit(1)
    ).otherwise(F.lit(0))
    return apportioned.select(
        "stratum",
        "n_docs",
        # normalized weight in 1e-10 units: (w * 1e10) div wsum —
        # non-negative div, floor on both engines
        F.expr("(_w * 10000000000) div _wsum").alias("weight_e10"),
        target.cast("bigint").alias("target_n"),
        F.least(target, F.col("n_docs")).cast("bigint").alias("take_n"),
    )



def _check_mx_reserved(df: DataFrame) -> None:
    """The mixture materializers carry ``_mx_*`` working columns
    through a broadcast join — an input frame already using one of
    those names would make the join condition or filter ambiguous, so
    refuse loudly instead (silent clobbering is a bug, never an
    update)."""
    clash = {"_mx_stratum", "_mx_take", "_mx_n", "_mx_t"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already carries reserved column(s) {sorted(clash)}"
        )


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    total_n: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Materialize the :func:`temperature_weights` mixture: within
    each stratum, keep the md5-rank-first ``take_n`` rows (the same
    deterministic content-hash ranking as :func:`stratified_sample`,
    so the selection is engine-independent, reproducible, and monotone
    in the target). Single-epoch semantics: a stratum can contribute
    at most its population (take_n = min(target_n, n_docs)); callers
    running multiple epochs re-apply the weights per epoch rather
    than sampling with replacement here.

    Scale shape: the weights frame is |strata|-sized and broadcast;
    the ranking window partitions by the stratum — one shuffle on the
    stratum key, the same plan as stratified_sample. The join back is
    NULL-SAFE: a NULL stratum is a real group to temperature_weights
    (it holds quota), so its rows must not be silently dropped here;
    an input frame already carrying one of the ``_mx_*`` working
    names is refused loudly rather than joined ambiguously."""
    from pyspark.sql.window import Window

    _check_mx_reserved(df)
    weights = temperature_weights(df, strata_col, total_n, alpha)
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.join(
            F.broadcast(
                weights.select(
                    F.col("stratum").alias("_mx_stratum"),
                    F.col("take_n").alias("_mx_take"),
                )
            ),
            F.col(strata_col).eqNullSafe(F.col("_mx_stratum")),
        )
        .drop("_mx_stratum")
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= F.col("_mx_take"))
        .drop("_mx_take")
    )


def epoch_expanded_mixture(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    total_n: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Multi-epoch materialization of :func:`temperature_weights`:
    deliver EXACTLY ``target_n`` rows per stratum by repeating
    documents across epochs when the target exceeds the population —
    the standard up-sampling semantics for small domains under
    temperature rebalancing (a stratum with target 25 and 10 docs
    yields 2 full epochs of everything plus the md5-rank-first 5 docs
    a third time).

    Adds ``epoch`` (1-based copy index) and ``sample_rank`` (the
    stratified md5 rank); a document's copy count is
    ``target div n_docs`` (+1 for ranks ≤ ``target mod n_docs``), so
    per-doc repeats within a stratum never differ by more than one
    and membership/order is engine-deterministic.

    Scale shape: weights are |strata|-sized and broadcast; the rank
    window is the stratified-sample plan; the explode multiplies rows
    only by each doc's own copy count (output-sized — no join blowup
    beyond the requested sample itself). NULL-safe join + refused
    ``_mx_*`` collisions, same contract notes as
    :func:`temperature_mixture`."""
    from pyspark.sql.window import Window

    _check_mx_reserved(df)
    weights = temperature_weights(df, strata_col, total_n, alpha)
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    joined = (
        df.join(
            F.broadcast(
                weights.select(
                    F.col("stratum").alias("_mx_stratum"),
                    F.col("n_docs").alias("_mx_n"),
                    F.col("target_n").alias("_mx_t"),
                )
            ),
            F.col(strata_col).eqNullSafe(F.col("_mx_stratum")),
        )
        .drop("_mx_stratum")
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "_copies",
            F.expr("_mx_t div _mx_n")
            + F.when(
                F.col("sample_rank") <= F.expr("_mx_t % _mx_n"), F.lit(1)
            ).otherwise(F.lit(0)),
        )
    )
    return (
        joined.filter(F.col("_copies") >= 1)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(1), F.col("_copies")))
        )
        .withColumn("epoch", F.col("epoch").cast("bigint"))
        .drop("_copies", "_mx_n", "_mx_t")
    )
