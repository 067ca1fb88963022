"""Sketch operators — constant-size summaries for 100 TB analytics.

At cluster scale the expensive aggregations are the *distinct*-shaped
ones: COUNT(DISTINCT) shuffles every key, per-item frequency tables
shuffle every item, and a semi-join prune shuffles the full fact table
before dropping most of it. The classical fixes are sketches: a
HyperLogLog register file (distinct counts in O(m) memory, one
map-side-combinable shuffle of ≤ m rows per group), a count-min cell
grid (frequency estimates in O(d·w) cells), and a Bloom bitmap
(pre-shuffle semi-join pruning). Each is implemented here as a pure
DataFrame program whose hash family is md5-derived — deterministic and
engine-independent, so every sketch has an exact DuckDB oracle twin
and the driver can hash-compare results (unlike Spark's built-in
``approx_count_distinct``/``bloom_filter_agg``, whose xxhash64/register
layouts are engine-private and unverifiable cross-engine).

The fourth operator is the exact counterpart: a distributed
discrete-quantile profile (rank-selection over one keyed sort) — the
honest baseline the sketches are traded against.

Reference parity: the reference's stats blocks are exact Postgres
aggregates (init.sql:91-103, services/staging_pg.py:323-372); these
operators are the scale substitutes a 100 TB deployment would need.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_etl_spark.engine import Catalog
from simple_etl_spark.queries import query

# ---------------------------------------------------------------------------
# Shared md5 hash family (matches llm/sampling.py's hash_bucket idiom:
# DuckDB twin is ('0x' || substr(md5(x), ...))::bigint).
# ---------------------------------------------------------------------------


def _hash_pos(col: F.Column, salt: F.Column | int, mod: int) -> F.Column:
    """Stable position in [0, mod) from md5('<salt>:<value>') — the
    k-member hash family for count-min rows and Bloom probes. DuckDB
    twin: ('0x' || substr(md5(cast(salt as varchar) || ':' ||
    cast(value as varchar)), 1, 6))::bigint % mod."""
    s = salt.cast("string") if isinstance(salt, F.Column) else F.lit(str(salt))
    h = F.md5(F.concat(s, F.lit(":"), col.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint") % F.lit(mod)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count (deterministic md5 register file)
# ---------------------------------------------------------------------------

# Register max is derived from a 60-bit hash tail: rho in [1, 61].
_HLL_TAIL_BITS = 60
_POW2_61 = 2305843009213693952  # 2^61, the rho=0 sentinel weight


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Phase 1 of HLL: per group, the m = 2**p register maxima.

    bucket = first p bits of md5(key); rho = 1 + leading-zero count of
    the next 60 bits. The rho derivation is pure string arithmetic —
    ``length(conv(tail, 16, 2))`` is the tail's bit length (conv never
    emits leading zeros) — so no floating log2 whose rounding could
    flip a register cross-engine.

    Plan shape: ONE shuffle on (group, bucket) with map-side partial
    max — at most m rows per group regardless of input size. This is
    the entire cost of distinct-counting 100 TB: the full
    COUNT(DISTINCT) alternative shuffles every distinct key.
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(f"p must be a multiple of 4 in [4,16], got {p}")
    hexp = p // 4
    # NULL keys are ignored, matching the COUNT(DISTINCT) semantics
    # this sketch substitutes (and map-shaped consumers cannot hold a
    # NULL bucket anyway).
    df = df.filter(F.col(key_col).isNotNull())
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, hexp), 16, 10).cast("bigint")
    tail_bin = F.conv(F.substring(h, hexp + 1, 15), 16, 2)
    rho = F.when(tail_bin == "0", F.lit(_HLL_TAIL_BITS + 1)).otherwise(
        F.lit(_HLL_TAIL_BITS + 1) - F.length(tail_bin)
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 8,
    integral: bool = False,
) -> DataFrame:
    """Phase 2 of HLL: fold the register file into a cardinality
    estimate (Flajolet et al. 2007 bias-corrected harmonic mean, with
    the small-range linear-counting correction).

    Exactness discipline: the harmonic sum is accumulated as
    SUM(2^(61 - m_j)) in DECIMAL(38,0) — every term is an exact power
    of two, and decimal addition is order-independent, so the
    accumulator is bit-identical on any engine (a double accumulator
    would be summation-order-dependent). Only the final one-shot
    division and the ln() of the linear-counting branch are IEEE
    doubles; the exposed estimate is decimal(18,6) per the engine's
    float-lineage rule (COVERAGE.md), where ulp-level ln() drift
    cannot reach.

    ``integral=True`` exposes the estimate as a BIGINT via
    ``floor(est + 0.5)`` computed on the raw double — the right form
    for a hard cross-engine hash gate: a distinct-count estimate is
    naturally integral, the 1.0-wide rounding boundary is 10⁶×
    coarser than the 6-dp quantize, and the rounding never routes
    through a decimal→double cast (whose single-vs-double-rounding
    difference between engines is the r5 ANN-failure class). Note the
    explicit floor(x+0.5), NOT a double→bigint cast: Spark's cast
    truncates while DuckDB's rounds — a semantic, not ulp, mismatch.
    """
    m = 2**p
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    term = F.pow(F.lit(2.0), F.lit(_HLL_TAIL_BITS + 1) - F.col("m_j")).cast(
        "decimal(38,0)"
    )
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nz"), F.sum(term).alias("z_ne")
    )
    v = F.lit(m) - F.col("nz")
    z_scaled = F.col("z_ne") + v * F.lit(_POW2_61).cast("decimal(38,0)")
    e_raw = (
        alpha
        * F.lit(float(m))
        * F.lit(float(m))
        * F.pow(F.lit(2.0), F.lit(_HLL_TAIL_BITS + 1))
        / z_scaled.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5) * F.lit(float(m))) & (v > F.lit(0)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    exposed = (
        F.floor(est + F.lit(0.5)).cast("bigint")
        if integral
        else est.cast("decimal(18,6)")
    )
    return agg.select(*group_cols, exposed.alias("approx_distinct"))


def _hll_oracle_sql(
    key_sql: str, group_sql: str, table: str, p: int = 8,
    integral: bool = False,
) -> str:
    """The DuckDB twin of hll_registers + hll_estimate, same hash
    family and the same decimal accumulator (parity by construction).
    ``integral`` mirrors hll_estimate's bigint exposure."""
    m = 2**p
    hexp = p // 4
    tail = f"('0x' || substr(md5(cast({key_sql} as varchar)), {hexp + 1}, 15))::bigint"
    est_case = (
        f"CASE WHEN e_raw <= 2.5 * {float(m)} AND v > 0"
        f" THEN {float(m)} * ln({float(m)} / v) ELSE e_raw END"
    )
    est_sql = (
        f"cast(floor(({est_case}) + 0.5) AS BIGINT)"
        if integral
        else f"cast({est_case} AS decimal(18,6))"
    )
    return f"""
    WITH regs AS (
        SELECT {group_sql} AS grp,
               ('0x' || substr(md5(cast({key_sql} as varchar)), 1, {hexp}))::bigint
                   AS bucket,
               max(CASE WHEN {tail} = 0 THEN 61
                        ELSE 61 - length(bin({tail})) END) AS m_j
        FROM {table}
        WHERE {key_sql} IS NOT NULL
        GROUP BY 1, 2
    ), folded AS (
        SELECT grp, count(*) AS nz,
               sum(power(2.0, 61 - m_j)::decimal(38,0)) AS z_ne
        FROM regs GROUP BY grp
    ), scored AS (
        SELECT grp, {m} - nz AS v,
               (0.7213 / (1.0 + 1.079 / {float(m)})) * {float(m)} * {float(m)}
                   * power(2.0, 61)
                   / cast(z_ne + ({m} - nz) * 2305843009213693952::decimal(38,0)
                          as double) AS e_raw
        FROM folded
    )
    SELECT grp, {est_sql} AS approx_distinct
    FROM scored
    """


def hll_merge(*register_frames: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union register files and keep the per-bucket max — the HLL merge
    operation. Mergeability is WHY sketches win at 100 TB: per-day /
    per-partition register files are tiny, persistable, and any
    subset's union answers a distinct-count question without rescanning
    the data (merge(daily registers) ≡ registers(all data), exactly —
    tested in tests/test_sketches.py)."""
    if not register_frames:
        raise ValueError("need at least one register frame")
    u = register_frames[0]
    for f in register_frames[1:]:
        u = u.unionByName(f)
    return u.groupBy(*group_cols, "bucket").agg(F.max("m_j").alias("m_j"))


# ---------------------------------------------------------------------------
# KMV (k minimum values) sketch — distinct-set intersection cardinality
# ---------------------------------------------------------------------------

_KMV_SPACE = float(2**48)  # 12 hex chars of md5


def kmv_intersection(
    a: DataFrame, b: DataFrame, key_col: str, k: int = 64
) -> DataFrame:
    """Estimate |distinct(A) ∩ distinct(B)| with a KMV sketch: the k
    smallest 48-bit md5 hashes of the union are a uniform sample of the
    union's distinct keys, so |A∩B| ≈ (c/k)·|A∪B|_est with c the
    sample's in-both count and |A∪B|_est = (k-1)/u_k (u_k the k-th
    smallest normalized hash). When the union holds fewer than k
    distinct keys the sketch is the whole set and the estimate is
    exact — both branches are deterministic, so the DuckDB twin
    reproduces them bit-for-bit.

    Plan: ONE shuffle — membership-tagged union grouped by key with
    map-side partial max — then TakeOrderedAndProject(k) (per-partition
    partial top-k, no global sort) and single-row aggregates. Returns
    (exact_intersection, kmv_estimate) side by side.
    """
    tagged = (
        a.select(F.col(key_col).alias("k"))
        .withColumn("in_a", F.lit(1))
        .withColumn("in_b", F.lit(0))
        .unionByName(
            b.select(F.col(key_col).alias("k"))
            .withColumn("in_a", F.lit(0))
            .withColumn("in_b", F.lit(1))
        )
    )
    u = tagged.groupBy("k").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    h = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 12), 16, 10).cast(
        "bigint"
    )
    topk = u.withColumn("h", h).orderBy("h", "k").limit(k)
    stats = topk.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.max("h").alias("h_k"),
        F.count_if((F.col("in_a") == 1) & (F.col("in_b") == 1)).alias("c"),
    )
    exact = u.filter((F.col("in_a") == 1) & (F.col("in_b") == 1)).agg(
        F.count(F.lit(1)).alias("exact_intersection")
    )
    est = F.when(F.col("n_top") < k, F.col("c").cast("double")).otherwise(
        F.col("c").cast("double")
        / F.lit(float(k))
        * (
            F.lit(float(k - 1))
            * F.lit(_KMV_SPACE)
            / F.col("h_k").cast("double")
        )
    )
    return stats.crossJoin(F.broadcast(exact)).select(
        "exact_intersection", est.cast("decimal(18,6)").alias("kmv_estimate")
    )


# ---------------------------------------------------------------------------
# Count-min frequency sketch
# ---------------------------------------------------------------------------


def count_min_build(
    counts: DataFrame,
    item_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Fold an (item, count) frame into a d×w count-min grid — at most
    depth·width cells regardless of vocabulary size. Each item lands
    in one cell per hash row; a cell total over-counts by whatever
    collides into it, never under-counts.

    Plan: explode ×depth on the *aggregated* frame (vocabulary-sized,
    not corpus-sized), then one grouped sum with map-side partials.
    """
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    cells = counts.select(F.col(item_col), F.col(count_col), rows).withColumn(
        "cell", _hash_pos(F.col(item_col), F.col("j"), width)
    )
    return cells.groupBy("j", "cell").agg(F.sum(count_col).alias("total"))


def count_min_lookup(
    cells: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each item's frequency: min over the d cells it
    hashes to. Probes are |items|·depth rows joined against the ≤ d·w
    cell grid — broadcast-sized by construction. A cell nothing hashed
    into is a counter at 0 (left join + coalesce), so items absent
    from the build set correctly estimate 0 instead of vanishing."""
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    probes = items.select(F.col(item_col), rows).withColumn(
        "cell", _hash_pos(F.col(item_col), F.col("j"), width)
    )
    return (
        probes.join(F.broadcast(cells), ["j", "cell"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("total"), F.lit(0))).alias("cm_estimate"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join prune
# ---------------------------------------------------------------------------


def bloom_bits(
    small: DataFrame, key_col: str, k: int = 3, m_bits: int = 16384
) -> DataFrame:
    """The set-bit positions of a k-hash Bloom filter over the small
    side's keys (≤ k·|small| rows, deduped ≤ m_bits)."""
    probes = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j")
    return (
        # NULL keys set no bits (an equi-join never matches NULL, so
        # dropping them preserves exact semi-join semantics — and a
        # NULL position would crash the bitmap fold).
        small.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col), probes)
        .select(_hash_pos(F.col(key_col), F.col("j"), m_bits).alias("pos"))
        .distinct()
    )


def bloom_prune(
    big: DataFrame, key_col: str, bits: DataFrame, k: int = 3, m_bits: int = 16384
) -> DataFrame:
    """Keep big-side rows whose key sets ALL k Bloom bits — a superset
    of the exact semi-join (no false negatives; false-positive rate
    ≈ (1 - e^(-k·n/m))^k).

    The bit set is folded into a literal bitmap (m_bits/32 words, 32
    used bits per long so every word stays positive) and the membership
    test rides the row as a pure Column expression: the prune is a
    MAP-SIDE FILTER — no shuffle, no join, no aggregation touches the
    fact table. That is the whole point of a Bloom prune at 100 TB:
    every dropped row is a row that never enters the exchange. The one
    driver-side collect is the sketch itself, bounded by m_bits
    (16384 bits = 512 words) regardless of either table's size —
    the same contract as Spark's own runtime bloom-filter pushdown,
    but with an engine-independent hash family the oracle can verify.
    """
    words = [0] * ((m_bits + 31) // 32)
    for (pos,) in bits.collect():
        words[pos // 32] |= 1 << (pos % 32)
    bitmap = F.array(*[F.lit(w) for w in words])
    probe = F.lit(True)
    for j in range(k):
        pos = _hash_pos(F.col(key_col), j, m_bits)
        word = F.element_at(bitmap, (pos / 32).cast("int") + 1)
        shifted = F.call_function("shiftright", word, (pos % 32).cast("int"))
        probe = probe & (shifted.bitwiseAND(F.lit(1)) == 1)
    return big.filter(probe)


# ---------------------------------------------------------------------------
# Exact distributed discrete quantiles (the honest baseline)
# ---------------------------------------------------------------------------


def _quantile_targets(
    n_frame: DataFrame,
    group_cols: list[str],
    qs: list[str],
    rank_name: str,
    rank_type: str,
) -> DataFrame:
    """Shared nearest-rank target builder: validate the quantile
    strings, size the decimal literals to the requested precision, and
    attach ``rank_name`` = ceil(q·n) to the per-group count frame
    (column ``n``). Used by both the exact :func:`quantile_disc` and
    the sketch :func:`hist_quantile` so the target arithmetic (and its
    guards) cannot drift between them."""
    if any(not isinstance(q, str) for q in qs):
        raise TypeError(
            "quantiles must be decimal strings (a float like 0.1 has no "
            f"exact decimal form), got {qs}"
        )
    decs = [Decimal(q) for q in qs]
    if any(not (0 < d <= 1) for d in decs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    scale = max(1, *(-d.as_tuple().exponent for d in decs))
    if scale > 16:
        # q·n must stay inside decimal(38) for a bigint n: scale 16 + 20
        # digits of n leaves headroom; beyond it Spark silently rounds
        # the product and the "exact arithmetic" contract breaks.
        raise ValueError(f"quantile precision capped at 16 dp, got scale {scale}")
    dtype = f"decimal({scale + 1},{scale})"
    q_arr = F.explode(
        F.array(*[F.lit(d).cast(dtype) for d in decs])
    ).alias("q")
    return n_frame.select(*group_cols, "n", q_arr).withColumn(
        rank_name, F.ceil(F.col("q") * F.col("n")).cast(rank_type)
    )


def quantile_disc(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Exact discrete quantiles per group by rank selection: the
    q-quantile is the value at sorted position ceil(q·n) (nearest-rank
    definition — always an actual data value, no interpolation, so the
    result is a pure passthrough with zero float arithmetic).

    Plan: one shuffle on the group key; row_number + per-group count
    in a single window pass; target ranks come from a broadcast-sized
    (groups × quantiles) frame joined back on (group, rank) — the
    fact-scale frame is never multiplied by |qs|. Quantile literals
    are decimals SIZED TO THE REQUESTED PRECISION (a fixed scale would
    silently round 0.999 → 1.00 and return the max), so ceil(q·n) is
    exact arithmetic on every engine.
    """
    w = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    ranked = df.select(
        *group_cols,
        value_col,
        tiebreak_col,
        F.row_number().over(w).alias("rn"),
    )
    n = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    targets = _quantile_targets(n, group_cols, qs, "rn", "int").drop("n")
    return (
        ranked.join(F.broadcast(targets), [*group_cols, "rn"])
        .select(*group_cols, "q", F.col(value_col))
    )


def hist_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Mergeable fixed-grid histogram sketch: per-group counts over
    ``bins`` equal-width buckets of [lo, hi] — the single-pass,
    O(bins)-state scale path for quantiles (the exact
    :func:`quantile_disc` rank-selects inside a per-group sort; a
    GLOBAL exact quantile would need a total sort, which is exactly
    what a 100 TB pipeline avoids).

    Out-of-range values clamp into the edge buckets (the sketch is
    total over non-NULL inputs; NULLs are dropped), so ``n`` from the
    register sum equals the input count and quantile targets stay
    exact. Binning arithmetic is plain IEEE double with one fixed
    expression shape, reproduced verbatim by the DuckDB twin.

    Registers merge by addition: same grid ⇒ union + sum
    (:func:`hist_merge`) — the partial-aggregation property that lets
    per-day/per-source sketches roll up without rescanning."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi}]")
    v = F.col(value_col)
    keep = v.isNotNull()
    # NaN is not NULL: Spark's floor(NaN) casts to bin 0 while other
    # engines clamp it high — an undefined value must not silently
    # drag the low quantiles, so NaN rows are dropped like NULLs
    # (oracle twin: AND NOT isnan(col)).
    if dict(df.dtypes).get(value_col) in ("float", "double"):
        keep = keep & ~F.isnan(v)
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(bins))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.filter(keep)
        .groupBy(*group_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*register_frames: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge same-grid histogram registers by addition."""
    if not register_frames:
        raise ValueError("hist_merge needs at least one register frame")
    it = iter(register_frames)
    out = next(it)
    for f in it:
        out = out.unionByName(f)
    return out.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    registers: DataFrame,
    group_cols: list[str],
    qs: list[str],
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Quantile estimates from histogram registers: for each q, the
    UPPER EDGE of the first bin whose cumulative count reaches the
    nearest-rank target ceil(q·n) — a deterministic, engine-exact
    value (bin edges are Decimal literals computed driver-side; no
    float arithmetic touches the output), within one bin width of the
    exact quantile by construction.

    The cumulative window runs over the |groups|·|bins| register frame
    (post-aggregation, bounded by the grid — the documented
    small-frame window pattern), never over input rows."""
    raw_width = (Decimal(str(hi)) - Decimal(str(lo))) / Decimal(bins)
    width = raw_width.quantize(Decimal("0.000001"))
    if width == 0:
        # a grid finer than the edges' 6-dp resolution would report
        # every quantile as lo — refuse instead of silently collapsing
        raise ValueError(
            f"bin width ({hi} - {lo}) / {bins} rounds to 0 at the 6-dp "
            "edge resolution; widen the range or reduce bins"
        )
    if width != raw_width:
        # the registers bin with exact double arithmetic on (hi-lo)/bins;
        # a width that 6-dp rounding ALTERS would make the reported
        # edges drift off the actual grid by up to bins·5e-7, silently
        # voiding the one-bin-width error bound — refuse, like the
        # width==0 guard (pick lo/hi/bins with an exactly 6-dp width)
        raise ValueError(
            f"bin width ({hi} - {lo}) / {bins} = {raw_width} is not exact "
            "at the 6-dp edge resolution; choose a range/bin count whose "
            "width is a 6-dp decimal so edges lie on the binning grid"
        )
    lo_d = Decimal(str(lo)).quantize(Decimal("0.000001"))
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = registers.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
    )
    n = registers.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    targets = _quantile_targets(n, group_cols, qs, "target", "bigint")
    hits = (
        cum.join(F.broadcast(targets), [*group_cols])
        .filter(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols, "q", "n")
        .agg(F.min("bin").alias("bin"))
    )
    edge = (
        F.lit(lo_d) + (F.col("bin") + 1) * F.lit(width)
    ).cast("decimal(18,6)")
    return hits.select(
        *group_cols, "q", "bin", edge.alias("upper_edge"), "n"
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@query(
    "events_hll_daily_users",
    oracle=f"""
    WITH est AS ({_hll_oracle_sql("user_id", "cast(ts as date)", "events", p=8,
                                  integral=True)}),
    exact AS (
        SELECT cast(ts as date) AS day, count(DISTINCT user_id) AS exact_users
        FROM events GROUP BY 1
    )
    SELECT exact.day, exact.exact_users, est.approx_distinct AS approx_users
    FROM exact JOIN est ON est.grp = exact.day
    ORDER BY day
    """,
    survey="scale substitute for A4's COUNT(DISTINCT) at 100 TB "
    "(init.sql:91-103 view_daily_analytics)",
)
def events_hll_daily_users(cat: Catalog) -> DataFrame:
    """Deterministic-HLL daily distinct users next to the exact count.
    The register shuffle is ≤ 256 rows/day independent of event volume
    — the COUNT(DISTINCT) twin shuffles every (day, user) pair.

    Graded on the driver (r6 — the sketch family's first hard row), so
    the estimate is exposed INTEGRALLY (hll_estimate(integral=True):
    floor(est+0.5) as bigint) — the register fold is already
    decimal-exact, and the integral exposure keeps the few remaining
    double ops (one division, the linear-counting ln) a million times
    farther from the rounding boundary than the 6-dp form."""
    ev = cat["events"].select(F.col("ts").cast("date").alias("day"), "user_id")
    regs = hll_registers(ev, "user_id", ["day"], p=8)
    est = hll_estimate(regs, ["day"], p=8, integral=True).withColumnRenamed(
        "approx_distinct", "approx_users"
    )
    exact = ev.groupBy("day").agg(F.countDistinct("user_id").alias("exact_users"))
    return exact.join(est, "day").select(
        "day", "exact_users", "approx_users"
    ).orderBy("day")


_TOKS_SQL = r"""
    toks AS (
        SELECT unnest(string_split_regex(
            regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), '\s+')) AS word
        FROM documents
    ),
    wc AS (
        SELECT word, count(*) AS cnt FROM toks
        WHERE length(word) >= 3 GROUP BY word
    )
"""


@query(
    "llm_cm_heavy_hitters",
    oracle=f"""
    WITH {_TOKS_SQL},
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    cells AS (
        SELECT j,
               ('0x' || substr(md5(cast(j as varchar) || ':' || word), 1, 6))::bigint
                   % 1024 AS cell,
               sum(cnt) AS total
        FROM wc, js GROUP BY 1, 2
    ),
    cands AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT 10),
    probes AS (
        SELECT word, cnt, j,
               ('0x' || substr(md5(cast(j as varchar) || ':' || word), 1, 6))::bigint
                   % 1024 AS cell
        FROM cands, js
    )
    SELECT p.word, p.cnt AS exact_count, cast(min(c.total) as bigint) AS cm_estimate
    FROM probes p JOIN cells c USING (j, cell)
    GROUP BY 1, 2
    ORDER BY word
    """,
    survey="scale substitute for A16's full frequency table "
    "(app.py:123-153 wordcloud counts) — constant-size cell grid",
)
def llm_cm_heavy_hitters(cat: Catalog) -> DataFrame:
    """Count-min estimates for the top-10 corpus words, next to their
    exact counts. CM never under-counts (estimate >= exact by
    construction; tests assert it), and the 4x1024 grid is the same
    size whether the corpus is 60k rows or 100 TB."""
    from simple_etl_spark.functions.text import tokenize

    toks = (
        cat["documents"]
        .select(F.explode(tokenize(F.col("text"))).alias("word"))
        .filter(F.length("word") >= 3)
    )
    wc = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    cells = count_min_build(wc, "word", "cnt", depth=4, width=1024)
    cands = wc.orderBy(F.col("cnt").desc(), "word").limit(10)
    est = count_min_lookup(cells, cands, "word", depth=4, width=1024)
    return (
        cands.join(est, "word")
        .select("word", F.col("cnt").alias("exact_count"), "cm_estimate")
        .orderBy("word")
    )


@query(
    "orders_bloom_prune",
    oracle="""
    WITH small AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    js AS (SELECT unnest([0, 1, 2]) AS j),
    bits AS (
        SELECT DISTINCT
               ('0x' || substr(md5(cast(j as varchar) || ':'
                    || cast(c_custkey as varchar)), 1, 6))::bigint % 16384 AS pos
        FROM small, js
    ),
    probes AS (
        SELECT o_orderkey,
               ('0x' || substr(md5(cast(j as varchar) || ':'
                    || cast(o_custkey as varchar)), 1, 6))::bigint % 16384 AS pos
        FROM orders, js
    ),
    passed AS (
        SELECT o_orderkey FROM probes JOIN bits USING (pos)
        GROUP BY o_orderkey HAVING count(*) = 3
    ),
    exact AS (
        SELECT count(*) AS exact_matches FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM small)
    )
    SELECT (SELECT count(*) FROM passed) AS bloom_pass,
           exact_matches,
           (SELECT count(*) FROM passed) - exact_matches AS false_positives
    FROM exact
    """,
    survey="scale infrastructure: pre-shuffle semi-join pruning for J1-J3 "
    "class joins (never in the reference; required at 100 TB)",
)
def orders_bloom_prune(cat: Catalog) -> DataFrame:
    """Bloom-prune orders against BUILDING-segment customers and report
    the pruning quality: rows passing the filter, exact semi-join
    matches, and the false-positive overhead. No false negatives by
    construction (pytest asserts the pass-set is a superset)."""
    small = cat["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    bits = bloom_bits(small, "c_custkey", k=3, m_bits=16384)
    passed = bloom_prune(
        cat["orders"].select("o_orderkey", "o_custkey"),
        "o_custkey",
        bits,
        k=3,
        m_bits=16384,
    )
    n_pass = passed.agg(F.count(F.lit(1)).alias("bloom_pass"))
    n_exact = (
        cat["orders"]
        .join(F.broadcast(small), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .agg(F.count(F.lit(1)).alias("exact_matches"))
    )
    return (
        n_pass.crossJoin(F.broadcast(n_exact))
        .select(
            "bloom_pass",
            "exact_matches",
            (F.col("bloom_pass") - F.col("exact_matches")).alias("false_positives"),
        )
    )


@query(
    "events_kmv_overlap",
    oracle="""
    WITH tagged AS (
        SELECT user_id AS k, 1 AS in_a, 0 AS in_b FROM events
        WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id AS k, 0 AS in_a, 1 AS in_b FROM events
        WHERE event_type = 'error'
    ),
    u AS (
        SELECT k, max(in_a) AS in_a, max(in_b) AS in_b FROM tagged GROUP BY k
    ),
    hs AS (
        SELECT k, in_a, in_b,
               ('0x' || substr(md5(cast(k as varchar)), 1, 12))::bigint AS h
        FROM u
    ),
    topk AS (SELECT * FROM hs ORDER BY h, k LIMIT 64),
    stats AS (
        SELECT count(*) AS n_top, max(h) AS h_k,
               count_if(in_a = 1 AND in_b = 1) AS c
        FROM topk
    ),
    exact AS (
        SELECT count(*) AS exact_intersection FROM u
        WHERE in_a = 1 AND in_b = 1
    )
    SELECT exact_intersection,
           cast(CASE WHEN n_top < 64 THEN cast(c as double)
                     ELSE cast(c as double) / cast(64.0 as double)
                          * (cast(63.0 as double) * cast(281474976710656.0 as double)
                             / cast(h_k as double))
                END AS decimal(18,6)) AS kmv_estimate
    FROM stats, exact
    """,
    survey="scale substitute for distinct-set overlap (A4's COUNT(DISTINCT) "
    "family intersected across segments) — KMV set-algebra sketch",
)
def events_kmv_overlap(cat: Catalog) -> DataFrame:
    """How many distinct users both purchased AND errored — estimated
    from a 64-hash KMV sketch next to the exact answer. The sketch
    needs one keyed shuffle + a 64-row top-k; the exact twin's cost
    grows with the distinct-user count forever."""
    ev = cat["events"]
    return kmv_intersection(
        ev.filter(F.col("event_type") == "purchase").select("user_id"),
        ev.filter(F.col("event_type") == "error").select("user_id"),
        "user_id",
        k=64,
    )


@query(
    "events_selfjoin_size_estimate",
    oracle="""
    WITH counts AS (
        SELECT user_id, count(*) AS c FROM events GROUP BY user_id
    ),
    exact AS (
        SELECT cast(sum(cast(c as decimal(38,0)) * c) as bigint)
            AS exact_pairs
        FROM counts
    ),
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    cells AS (
        SELECT j,
               ('0x' || substr(md5(cast(j as varchar) || ':'
                    || cast(user_id as varchar)), 1, 6))::bigint % 1024 AS cell,
               sum(c) AS total
        FROM counts, js GROUP BY 1, 2
    ),
    per_row AS (
        SELECT j, sum(cast(total as decimal(38,0)) * total) AS ip
        FROM cells GROUP BY j
    )
    SELECT exact_pairs, cast(min(ip) as bigint) AS cm_estimate
    FROM per_row, exact
    GROUP BY exact_pairs
    """,
    survey="scale infrastructure: join-cardinality estimation via "
    "count-min inner product — the optimizer statistic that predicts "
    "a self-join blowup from a constant-size sketch before any "
    "shuffle runs; never underestimates",
)
def events_selfjoin_size_estimate(cat: Catalog) -> DataFrame:
    """|events ⋈ events on user_id| — the exact pair count Σc(u)²
    next to the count-min inner-product estimate min_j Σ_cell
    total². The estimate needs only the 4×1024 grid (buildable in one
    pass at any scale); the exact number needs the full per-key count
    relation. One-sided: estimate ≥ exact, collisions only inflate."""
    ev = cat["events"]
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    d38 = "decimal(38,0)"
    exact = counts.agg(
        F.sum(F.col("c").cast(d38) * F.col("c"))
        .cast("bigint")
        .alias("exact_pairs")
    )
    cells = count_min_build(counts, "user_id", "c", depth=4, width=1024)
    per_row = cells.groupBy("j").agg(
        F.sum(F.col("total").cast(d38) * F.col("total")).alias("ip")
    )
    est = per_row.agg(F.min("ip").cast("bigint").alias("cm_estimate"))
    return exact.crossJoin(F.broadcast(est))


@query(
    "orders_quantile_profile",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn
        FROM orders
    ),
    n AS (
        SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1
    ),
    targets AS (
        SELECT o_orderpriority, q, ceil(q * n) AS rn
        FROM n, (SELECT unnest([0.25, 0.50, 0.75, 0.95]) AS q) qs
    )
    SELECT r.o_orderpriority, t.q, r.o_totalprice AS price
    FROM ranked r JOIN targets t
      ON r.o_orderpriority = t.o_orderpriority AND r.rn = t.rn
    ORDER BY r.o_orderpriority, q
    """,
    survey="exact distributed quantiles (nearest-rank) — the exact "
    "baseline the sketches trade against; A3/X3 family "
    "(services/staging_pg.py:323-372)",
)
def orders_quantile_profile(cat: Catalog) -> DataFrame:
    """Exact p25/p50/p75/p95 of order value per priority via rank
    selection — values are passthroughs (no interpolation), so the
    profile is engine-exact. One shuffle on the group key."""
    prof = quantile_disc(
        cat["orders"],
        "o_totalprice",
        ["o_orderpriority"],
        ["0.25", "0.50", "0.75", "0.95"],
        "o_orderkey",
    )
    return prof.select(
        "o_orderpriority", "q", F.col("o_totalprice").alias("price")
    ).orderBy("o_orderpriority", "q")


@query(
    "events_hist_quantile",
    oracle="""
    WITH regs AS (
        SELECT event_type,
               cast(least(greatest(floor((value - 0.0) / 500.0 * 50), 0), 49)
                    as int) AS bin,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, bin,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM regs
    ),
    totals AS (SELECT event_type, cast(sum(cnt) as bigint) AS n
               FROM regs GROUP BY 1),
    targets AS (
        SELECT t.event_type, t.n, qq.q,
               cast(ceil(qq.q * t.n) as bigint) AS target
        FROM totals t,
             (SELECT unnest([cast(0.50 as decimal(3,2)),
                             cast(0.90 as decimal(3,2)),
                             cast(0.99 as decimal(3,2))]) AS q) qq
    ),
    hits AS (
        SELECT c.event_type, tg.q, tg.n, min(c.bin) AS bin
        FROM cum c JOIN targets tg ON tg.event_type = c.event_type
        WHERE c.cum >= tg.target
        GROUP BY c.event_type, tg.q, tg.n
    )
    SELECT event_type, q, bin,
           cast(cast(0.000000 as decimal(18,6))
                + (bin + 1) * cast(10.000000 as decimal(18,6))
                as decimal(18,6)) AS upper_edge,
           n
    FROM hits ORDER BY event_type, q
    """,
    survey="scale substitute for exact quantiles at 100 TB: mergeable "
    "fixed-grid histogram sketch (single pass, O(bins) state, "
    "windows only over the register frame)",
)
def events_hist_quantile(cat: Catalog) -> DataFrame:
    """Per-event-type p50/p90/p99 of `value` from a 50-bin histogram
    sketch over [0, 500]: nearest-rank bin selection, upper-edge
    estimate exact to the grid (within one 10-unit bin of the true
    quantile). The register build is the only pass over the fact
    table."""
    ev = cat["events"]
    regs = hist_registers(ev, "value", ["event_type"], 0.0, 500.0, 50)
    return hist_quantile(
        regs, ["event_type"], ["0.50", "0.90", "0.99"], 0.0, 500.0, 50
    ).orderBy("event_type", "q")


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    tiebreak_col: str,
    lo_q: str = "0.05",
    hi_q: str = "0.95",
) -> DataFrame:
    """Winsorized (clamped-tail) mean per group — the robust aggregate
    for metrics with heavy outliers: values below the ``lo_q`` or
    above the ``hi_q`` nearest-rank quantile are clamped to those
    thresholds before averaging (unlike a trimmed mean, every row
    still contributes, so n is the group size).

    Exactness: thresholds are actual data values (nearest-rank
    passthrough, zero float arithmetic); the clamp is least/greatest
    on doubles; the average runs on the integer-cent fast path
    (exactness.py: long accumulation, one decimal finish, one double
    division — mirrored op-for-op by the oracle). The cent rounding
    is ``units_signed`` (HALF_UP away from zero), matching the
    oracle's decimal-cast rounding for NEGATIVE values too — the
    plain ``units`` floor(x·100+0.5) is HALF_DOWN below zero and
    would diverge cross-engine on e.g. -1.005.

    Scale shape: one per-group sort for the exact thresholds (the
    quantile_disc cost — substitute :func:`hist_quantile` edges when
    the group cardinality makes even per-group sorts unwelcome), a
    BROADCAST of the |groups|-row threshold frame back onto the fact
    table, and one grouped aggregation."""
    from simple_etl_spark.exactness import lavg, units_signed

    th = quantile_disc(df, value_col, group_cols, [lo_q, hi_q], tiebreak_col)
    piv = th.groupBy(*group_cols).agg(
        F.min(
            F.when(F.col("q") == F.lit(Decimal(lo_q)), F.col(value_col))
        ).alias("_lo"),
        F.min(
            F.when(F.col("q") == F.lit(Decimal(hi_q)), F.col(value_col))
        ).alias("_hi"),
    )
    clamped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(piv), list(group_cols))
        .select(*group_cols, units_signed(clamped).alias("_u"))
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"), lavg(F.col("_u"), 2, "win_mean"))
    )


@query(
    "events_winsorized_value",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    th AS (
        SELECT event_type,
               min(CASE WHEN rn = ceil(cast(0.05 as decimal(3,2)) * n)
                        THEN value END) AS lo,
               min(CASE WHEN rn = ceil(cast(0.95 as decimal(3,2)) * n)
                        THEN value END) AS hi
        FROM ranked GROUP BY event_type
    )
    SELECT e.event_type, cast(count(*) as bigint) AS n,
           cast(sum(cast(least(greatest(e.value, t.lo), t.hi)
                         as decimal(9,2))) as double) / count(*) AS win_mean
    FROM events e JOIN th t ON t.event_type = e.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    survey="robust-ext: winsorized mean per event type (nearest-rank "
    "5/95 thresholds, broadcast clamp, integer-cent exact average)",
)
def events_winsorized_value(cat: Catalog) -> DataFrame:
    """Outlier-robust mean of events.value per type: tails clamped at
    the exact p05/p95 data values, average on the integer-cent exact
    path."""
    return winsorized_mean(
        cat["events"], "value", ["event_type"], "event_id"
    ).orderBy("event_type")


@query(
    "events_hll_weekly_users",
    oracle=f"""
    WITH est AS (
        {_hll_oracle_sql("user_id", "cast(date_trunc('week', ts) as date)",
                         "events", p=8)}
    )
    SELECT grp AS week, approx_distinct AS approx_users
    FROM est ORDER BY week
    """,
    survey="sketch-ext: weekly distinct users by MERGING daily HLL "
    "registers through hll_merge — the oracle computes the week "
    "directly from events, so the value compare proves merge ≡ rebuild",
)
def events_hll_weekly_users(cat: Catalog) -> DataFrame:
    """Weekly approx-distinct users via the register-MERGE path: daily
    registers are re-keyed to weeks and folded through
    :func:`hll_merge` (per-bucket max), then estimated. In this
    self-contained query the daily registers are built in-plan (one
    events scan); a production register store persists them once per
    day and serves every rollup WITHOUT the fact rescan — what this
    query proves is the equivalence that store relies on: the DuckDB
    twin builds the weekly registers DIRECTLY from events, and
    identical estimates show the merge loses nothing (register max is
    associative)."""
    ev = cat["events"].withColumn("day", F.col("ts").cast("date"))
    daily = hll_registers(ev, "user_id", ["day"], p=8)
    weekly_regs = hll_merge(
        daily.withColumn(
            "week", F.date_trunc("week", F.col("day")).cast("date")
        ).drop("day"),
        group_cols=["week"],
    )
    return (
        hll_estimate(weekly_regs, ["week"], p=8)
        .select(F.col("week"), F.col("approx_distinct").alias("approx_users"))
        .orderBy("week")
    )
