"""Declarative expectations: rule semantics (NULL handling per the
dbt conventions), single-scan report shape, planted violations.
Oracle parity: test_parity (`dq_expectations`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_etl_spark.operators.expectations import (
    accepted_values,
    in_range,
    matches,
    not_null,
    predicate,
    unique,
    validate,
)


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (2, "X", -5.0, "9-BOGUS"),     # bad status, bad range, bad regex
            (3, None, 50.0, None),         # null status; null priority (not a
                                           # matches violation)
            (1, "F", 2000.0, "2-HIGH"),    # duplicate key 1; over range hi
        ],
        "k bigint, status string, price double, pri string",
    )


def _report(df, rules):
    return {
        (r["rule"], r["column"]): (r["violations"], r["total"], r["passed"])
        for r in validate(df, rules).collect()
    }


def test_row_rule_semantics(table):
    rep = _report(
        table,
        [
            not_null("status"),
            accepted_values("status", ["O", "F", "P"]),
            in_range("price", 0, 1000),
            matches("pri", "^[1-5]-"),
        ],
    )
    assert rep[("not_null", "status")] == (1, 4, False)
    # NULL is an accepted_values violation (unknown membership)
    assert rep[("accepted_values", "status")] == (2, 4, False)
    # NULLs are NOT range violations; -5 and 2000 are
    assert rep[("in_range", "price")] == (2, 4, False)
    # NULL is NOT a matches violation; '9-BOGUS' is
    assert rep[("matches", "pri")] == (1, 4, False)


def test_unique_counts_surplus_rows(table):
    rep = _report(table, [unique(["k"])])
    # 4 non-null keys, one duplicated once -> 1 surplus row
    assert rep[("unique", "k")] == (1, 4, False)


def test_predicate_null_is_violation(table):
    rep = _report(
        table, [predicate("price_gt_status_len", F.col("price") > F.length("status"))]
    )
    # row 2: -5 > 1 false; row 3: NULL comparison -> violation; others hold
    assert rep[("predicate", "price_gt_status_len")] == (2, 4, False)


def test_all_passing_suite(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    rep = _report(df, [not_null("v"), unique(["k"])])
    assert all(p for (_, _, p) in rep.values())


def test_empty_rules_rejected(table):
    with pytest.raises(ValueError, match="at least one"):
        validate(table, [])


def test_single_scan_plan(table):
    """All row rules must compile into ONE aggregate over ONE scan —
    the plan contains exactly one scan of the source."""
    df = validate(
        table,
        [not_null("status"), in_range("price", 0, 100), matches("pri", "^x")],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("localrelation") + plan.lower().count("scan") <= 2
