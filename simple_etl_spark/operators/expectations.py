"""Declarative data-quality expectations — the dbt-test /
Great-Expectations capability as a SINGLE-PASS Spark program.

A suite of row-level rules (not-null, accepted values, numeric range,
regex match, custom predicate) compiles into ONE projection of
conditional counts over ONE table scan — at 100 TB the alternative
(one query per rule, the naive GE execution model) multiplies scan
cost by |rules|. Multiset rules (uniqueness) need their own keyed
aggregation by nature; they run as one groupBy per distinct key set,
still a single scan each, and the report unions everything into one
tidy (rule, column, violations, total, passed) frame.

Complements the existing data-quality operators rather than repeating
them: `fk_integrity_audit` owns cross-table referential edges,
`fd_profile` discovers functional dependencies, `content_checksum`
proves snapshot equality; this module asserts DECLARED per-table
contracts (the reference declared them as Postgres column constraints,
services/staging_pg.py:76-88 — NOT NULL / CHECK / UNIQUE — which a
lakehouse table has no engine to enforce, so they become audited
expectations).

Exactness: every verdict is a count of boolean predicates — integer
arithmetic only, bit-identical on any engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, accepted_values, in_range,
    matches, predicate, unique}. ``col`` is the audited column (for
    ``unique``: comma-joined key columns; for ``predicate``: a label).
    ``params`` carries kind-specific arguments."""

    kind: str
    col: str
    params: dict = field(default_factory=dict)


def not_null(col: str) -> Rule:
    return Rule("not_null", col)


def accepted_values(col: str, values: list) -> Rule:
    return Rule("accepted_values", col, {"values": list(values)})


def in_range(col: str, lo, hi) -> Rule:
    """lo <= col <= hi; NULLs are not range violations (compose with
    not_null to also forbid them — the dbt convention)."""
    return Rule("in_range", col, {"lo": lo, "hi": hi})


def matches(col: str, pattern: str) -> Rule:
    """Full-match regex (rlike anchored by the caller's pattern);
    NULLs are not match violations."""
    return Rule("matches", col, {"pattern": pattern})


def predicate(label: str, cond: Column) -> Rule:
    """Arbitrary row predicate that must hold (NULL counts as a
    violation — an undecidable contract is a broken contract)."""
    return Rule("predicate", label, {"cond": cond})


def unique(cols: list[str]) -> Rule:
    return Rule("unique", ",".join(cols), {"cols": list(cols)})


def _violation_cond(rule: Rule) -> Column:
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "accepted_values":
        vals = rule.params["values"]
        return c.isNull() | ~c.isin(vals)
    if rule.kind == "in_range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if rule.kind == "matches":
        return c.isNotNull() & ~c.rlike(rule.params["pattern"])
    if rule.kind == "predicate":
        cond = rule.params["cond"]
        return ~F.coalesce(cond, F.lit(False))
    raise ValueError(f"unknown row-rule kind: {rule.kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run the suite; returns one row per rule:
    (rule, column, violations, total, passed), ordered (rule, column).

    Row-level rules share ONE aggregate projection (single scan);
    each ``unique`` rule adds one keyed count (`total - #distinct
    keys` = number of surplus rows). ``total`` is the table row count
    for row rules and the row count over non-null keys for unique
    rules (NULL keys don't collide by SQL semantics; forbid them with
    not_null)."""
    if not rules:
        raise ValueError("validate needs at least one rule")
    row_rules = [r for r in rules if r.kind != "unique"]
    uniq_rules = [r for r in rules if r.kind == "unique"]
    reports: list[DataFrame] = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_total")]
        for i, r in enumerate(row_rules):
            aggs.append(F.count_if(_violation_cond(r)).alias(f"_v{i}"))
        one = df.agg(*aggs)
        rows = None
        for i, r in enumerate(row_rules):
            rep = one.select(
                F.lit(r.kind).alias("rule"),
                F.lit(r.col).alias("column"),
                F.col(f"_v{i}").cast("bigint").alias("violations"),
                F.col("_total").cast("bigint").alias("total"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
            rows = rep if rows is None else rows.unionByName(rep)
        reports.append(rows)
    for r in uniq_rules:
        keys = [F.col(c) for c in r.params["cols"]]
        nn = df
        for c in r.params["cols"]:
            nn = nn.filter(F.col(c).isNotNull())
        rep = (
            nn.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.sum("_n").alias("_total"),
                F.sum(F.col("_n") - 1).alias("_viol"),
            )
            .select(
                F.lit("unique").alias("rule"),
                F.lit(r.col).alias("column"),
                F.coalesce(F.col("_viol"), F.lit(0)).cast("bigint").alias(
                    "violations"
                ),
                F.coalesce(F.col("_total"), F.lit(0)).cast("bigint").alias(
                    "total"
                ),
                (F.coalesce(F.col("_viol"), F.lit(0)) == 0).alias("passed"),
            )
        )
        reports.append(rep)
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.orderBy("rule", "column")


# ---------------------------------------------------------------------------
# Registered query
# ---------------------------------------------------------------------------

from simple_etl_spark.engine import Catalog  # noqa: E402
from simple_etl_spark.queries import query  # noqa: E402


@query(
    "dq_expectations",
    oracle="""
    WITH row_checks AS (
        SELECT count(*) AS total,
               count_if(o_custkey IS NULL) AS v_nn,
               count_if(o_orderstatus IS NULL
                        OR o_orderstatus NOT IN ('O', 'F', 'P')) AS v_av,
               count_if(o_totalprice IS NOT NULL
                        AND (o_totalprice < 1000 OR o_totalprice > 400000))
                   AS v_rng,
               count_if(o_orderpriority IS NOT NULL
                        AND NOT regexp_matches(o_orderpriority, '^[1-5]-'))
                   AS v_re
        FROM orders
    ),
    uniq AS (
        SELECT cast(sum(n) as bigint) AS total,
               cast(sum(n - 1) as bigint) AS viol
        FROM (SELECT count(*) AS n FROM orders
              WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
    )
    SELECT rule, "column", violations, total, passed FROM (
        SELECT 'accepted_values' AS rule, 'o_orderstatus' AS "column",
               cast(v_av as bigint) AS violations, cast(total as bigint) AS total,
               v_av = 0 AS passed FROM row_checks
        UNION ALL
        SELECT 'in_range', 'o_totalprice', cast(v_rng as bigint),
               cast(total as bigint), v_rng = 0 FROM row_checks
        UNION ALL
        SELECT 'matches', 'o_orderpriority', cast(v_re as bigint),
               cast(total as bigint), v_re = 0 FROM row_checks
        UNION ALL
        SELECT 'not_null', 'o_custkey', cast(v_nn as bigint),
               cast(total as bigint), v_nn = 0 FROM row_checks
        UNION ALL
        SELECT 'unique', 'o_orderkey', viol, total, viol = 0 FROM uniq
    ) ORDER BY rule, "column"
    """,
    survey="dq-ext: declarative expectations suite — the reference's "
    "Postgres column constraints (NOT NULL / CHECK / UNIQUE, "
    "services/staging_pg.py:76-88) as a single-scan audited contract",
)
def dq_expectations(cat: Catalog) -> DataFrame:
    """Five declared contracts on orders in one scan + one keyed count:
    the in_range rule is deliberately tight (1000..400000) so the
    report demonstrates a FAILING expectation on real data next to
    passing ones — a suite that can only say 'passed' tests nothing."""
    return validate(
        cat["orders"],
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            in_range("o_totalprice", 1000, 400000),
            matches("o_orderpriority", "^[1-5]-"),
            unique(["o_orderkey"]),
        ],
    )
