"""Audit: no graded output column may expose fine-scaled decimal
digits derived from double arithmetic.

The failure class (llm_cosine_topk / llm_ann_bucketed, rounds 2-3):
a column computed through IEEE double ops (division, sqrt) and then
cast to a fine decimal scale puts engine-specific ulps into graded
digits — the Spark value and an external oracle's value can disagree
in the last decimal place even when both are "correct". The engine's
rule: any decimal exposure whose lineage passes through double
arithmetic must be quantized to scale <= 6 (ulp drift cannot reach
the 6th dp for O(1)-magnitude values); finer precision guarantees
belong in pytest against an engine-independent reference
(tests/test_similarity_exact.py), not in graded output.

This probe walks the analyzed plan of every graded query, finds each
``cast(... as decimal(p, s))`` with s > 6, and fails if the cast's
argument (or, for a bare column reference, the projection line that
defines it) shows double entry points: an ``as double`` cast, sqrt,
power, exp, ln. Exact-decimal lineages (integer-cent money sums,
decimal aggregation) pass untouched at any scale.
"""

from __future__ import annotations

import re

import pytest

from simple_etl_spark import queries as q

# Expression markers that mean "this value is the RESULT of IEEE
# floating arithmetic" — division, roots, transcendentals, mean. A
# bare ``cast(x as double)`` widening is NOT a marker: the engine's
# element canonicalization (float → double → decimal(12,10)) is input
# quantization both sides of the oracle perform identically, not an
# arithmetic result. Exact-decimal lineages (integer-cent sums,
# decimal multiplication under a widening cast) pass untouched.
# Known textual blind spot: a raw SUM over doubles would not match
# any marker — the engine has no such exposure, and reviewers should
# keep it that way (COVERAGE.md "decimal exposure rule").
_DOUBLE_MARKERS = ("/", "sqrt(", "power(", "exp(", "ln(", "avg(")

_CAST_RE = re.compile(r"cast\((.*?) as decimal\((\d+),(\d+)\)\)", re.I)
_BARE_REF = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*#\d+L?$")

MAX_DOUBLE_DERIVED_SCALE = 6


def _analyzed_plan(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _double_tainted(expr: str, plan: str) -> bool:
    low = expr.lower()
    if any(m in low for m in _DOUBLE_MARKERS):
        return True
    if _BARE_REF.match(expr.strip()):
        # a bare column ref: check the projection line that defines it
        for line in plan.splitlines():
            if f"AS {expr.strip()}" in line:
                ll = line.lower()
                if any(m in ll for m in _DOUBLE_MARKERS):
                    return True
    return False


def _specs():
    q._load_all()
    return [s for s in q.REGISTRY.values() if s.oracle is not None]


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_no_fine_decimal_from_double(spark, sf_dir, spec):
    plan = _analyzed_plan(spec.fn(spark, sf_dir))
    offenders = []
    for m in _CAST_RE.finditer(plan):
        expr, _p, s = m.group(1), int(m.group(2)), int(m.group(3))
        if s <= MAX_DOUBLE_DERIVED_SCALE:
            continue
        if _double_tainted(expr, plan):
            offenders.append(f"scale {s}: cast({expr[:120]}...)")
    assert not offenders, (
        f"{spec.name} exposes double-derived decimal finer than "
        f"{MAX_DOUBLE_DERIVED_SCALE} dp (engine-drift hazard): {offenders}"
    )


def test_probe_catches_the_original_bug_class(spark):
    """Self-test: a double division cast to decimal(18,9) — exactly the
    round-2/3 llm_cosine_topk exposure — must be flagged."""
    df = spark.range(3).selectExpr(
        "cast(cast(id as double) / 7.0 as decimal(18,9)) AS score_q"
    )
    plan = _analyzed_plan(df)
    hits = [
        m
        for m in _CAST_RE.finditer(plan)
        if int(m.group(3)) > MAX_DOUBLE_DERIVED_SCALE
        and _double_tainted(m.group(1), plan)
    ]
    assert hits, "probe failed to flag a double-division decimal(18,9) exposure"


# ---------------------------------------------------------------------------
# Integral ANN tier: stricter contract than the scale rule above.
# llm_cosine_topk / llm_ann_bucketed hash-failed three graded rounds
# (r2/r3/r5) on decimal→double→sqrt/divide ulp drift even under a
# 6-dp quantize; round 6 rebuilt them on the integral exact-ranking
# tier (similarity.py), whose contract is: NO double arithmetic may
# appear anywhere in the analyzed plan — the only permitted
# double-typed expression is the exact float→double widening cast
# inside element canonicalization (it minted no arithmetic result).
# ---------------------------------------------------------------------------

_INTEGRAL_QUERIES = ("llm_cosine_topk", "llm_ann_bucketed")

# any of these in the plan means an IEEE arithmetic op computed a value
_DOUBLE_ARITH_MARKERS = (
    "sqrt(", " / ", "isnan(", "power(", "exp(", "ln(", "avg(", "nanvl(",
)


@pytest.mark.parametrize("name", _INTEGRAL_QUERIES)
def test_integral_ann_plan_is_double_free(spark, sf_dir, name):
    q._load_all()
    df = q.REGISTRY[name].fn(spark, sf_dir)
    # 1. the exposed schema is pure int64 — no decimal or float column
    #    exists for engine rounding to disagree on
    bad = [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields
           if f.dataType.simpleString() != "bigint"]
    assert not bad, f"{name} exposes non-bigint columns: {bad}"
    # 2. the analyzed plan contains no double-arithmetic operator
    plan = _analyzed_plan(df).lower()
    hits = [m for m in _DOUBLE_ARITH_MARKERS if m in plan]
    assert not hits, f"{name} plan contains double arithmetic: {hits}"
    # 3. every appearance of 'double' is the widening cast form —
    #    no attribute is double-typed past canonicalization
    assert plan.count("double") == plan.count("as double"), (
        f"{name} plan has double-typed expressions beyond the exact "
        f"float→double widening cast"
    )


def test_quantized_topk_exposure_is_pure_bigint(spark, sf_dir):
    """llm_quantized_topk entered the graded window in r7. Its
    quantization step IS double arithmetic (x/scale, round) — but it
    is per-element, reduction-free, and both engines compute it on
    identical inputs (IEEE divide is correctly rounded, round is
    HALF_UP in both — parity-proven in tests/test_quantization.py),
    and everything downstream of the int8 codes is the integral
    discipline. This pin guards the exposure half of that argument:
    every graded column must be bigint, so no decimal/float column
    exists for engine rounding to disagree on, and the ranking part
    of the plan must contain no sqrt/transcendental (the r2-r5
    failure class)."""
    q._load_all()
    df = q.REGISTRY["llm_quantized_topk"].fn(spark, sf_dir)
    bad = [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields
           if f.dataType.simpleString() != "bigint"]
    assert not bad, f"llm_quantized_topk exposes non-bigint columns: {bad}"
    plan = _analyzed_plan(df).lower()
    for marker in ("sqrt(", "exp(", "ln(", "avg(", "isnan(", "nanvl("):
        assert marker not in plan, (
            f"llm_quantized_topk plan contains {marker!r} — quantization "
            "permits only divide+round; roots/transcendentals would "
            "reintroduce the cross-engine ulp class"
        )
