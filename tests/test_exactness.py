"""Exactness envelope regression: the round-1 lsum finished with a
bare cast-to-double, which double-rounds once the long unit sum passes
2^53 — real at ~2x the benchmarked scale for 10^-6-unit products. The
decimal finish (lsum) and split accumulators (lsum_split) must match
Python's single correct rounding of the exact rational."""

from decimal import Decimal

from pyspark.sql import functions as F

from simple_etl_spark.exactness import lsum, lsum_split, units


def test_lsum_exact_past_2_53(spark):
    # 3 odd longs summing to 13,500,000,000,000,003 units (> 2^53):
    # the old cast-to-double finish rounds the sum before dividing.
    u = 4_500_000_000_000_001
    df = spark.range(3).select(F.lit(u).cast("long").alias("u"))
    got = df.agg(lsum(F.col("u"), 2, "v")).collect()[0]["v"]
    expected = float(Decimal(3 * u) / 100)  # one correct rounding
    assert got == expected


def test_lsum_split_matches_decimal_oracle_past_2_53(spark):
    # 20k rows of 987654.321 at scale 6: unit sum ~2e16 > 2^53.
    rows, val = 20_000, "987654.321"
    df = spark.range(rows).select(F.lit(float(val)).alias("x"))
    got = df.agg(lsum_split(units("x", 6), 6, "v")).collect()[0]["v"]
    expected = float(Decimal(val) * rows)
    assert got == expected


def test_lsum_split_equals_lsum_inside_envelope(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    u = units("l_extendedprice") * (F.lit(100) - units("l_discount"))
    both = li.groupBy("l_returnflag").agg(
        lsum(u, 4, "a"), lsum_split(u, 4, "b")
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_harness_catches_int_width_mismatch(spark):
    # Round-2 incident class: Spark row_number() exposes int32 while the
    # DuckDB oracle's row_number() is int64 — values identical, driver
    # hash differs.  The local harness must flag the width skew so it
    # can never reach the driver again.
    import duckdb

    from tests.oracle_harness import compare

    con = duckdb.connect()
    df = spark.range(3).select(F.col("id").cast("int").alias("rnk"))
    ok, msg = compare(df, con, "SELECT CAST(range AS BIGINT) AS rnk FROM range(3)")
    con.close()
    assert not ok and "type-family mismatch" in msg and "int32" in msg


def test_harness_passes_matching_int64(spark):
    import duckdb

    from tests.oracle_harness import compare

    con = duckdb.connect()
    df = spark.range(3).select(F.col("id").alias("rnk"))
    ok, msg = compare(df, con, "SELECT CAST(range AS BIGINT) AS rnk FROM range(3)")
    con.close()
    assert ok, msg


def test_oracle_decimal_to_double_single_rounding_past_2_53(spark):
    """r8 sf1-parity finding: DuckDB's direct decimal->double cast
    converts the int128 payload to double FIRST and divides by
    10^scale SECOND — two roundings, which diverges from the engine's
    single correct rounding (exactness._exact_value routes through
    decimal division precisely to avoid this) once the unit count
    passes 2^53. pricing_summary's oracle therefore routes its
    product sums decimal->varchar->double. This pins both halves on
    the exact unit count that diverged at sf1."""
    import duckdb
    from decimal import Decimal

    from pyspark.sql import functions as F

    from simple_etl_spark.exactness import _exact_value

    units = 25152114599283953  # > 2^53; sum_charge (R, O) at sf1
    truth = float(Decimal(units) / Decimal(10**6))  # one rounding

    con = duckdb.connect()
    lit = f"cast('{Decimal(units) / Decimal(10**6)}' as decimal(38,6))"
    direct, via_str = con.execute(
        f"SELECT cast({lit} as double),"
        f" cast(cast({lit} as varchar) as double)"
    ).fetchone()
    # the class exists: DuckDB's direct cast double-rounds here...
    assert direct != truth
    # ...the varchar route is the correct single rounding...
    assert via_str == truth
    # ...and the engine's conversion agrees with it
    got = (
        spark.range(1)
        .select(_exact_value(F.lit(units).cast("decimal(38,0)"), 6).alias("v"))
        .head()["v"]
    )
    assert got == truth
