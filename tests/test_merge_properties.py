"""Property tests (hypothesis) for the keyed-merge primitives: the
Spark implementations must agree with an obvious sequential reference
model on arbitrary keyed batches — including duplicate keys inside a
batch, ties on the order column, and empty sides.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simple_etl_spark.operators.merge import (
    delete_then_insert,
    insert_if_absent,
    upsert_latest_wins,
)

KEYS = st.sampled_from(["k1", "k2", "k3", "k4"])
ROW = st.tuples(KEYS, st.integers(0, 5), st.text("ab", max_size=3))
BATCH = st.lists(ROW, max_size=8)

SCHEMA = "id string, ver int, payload string"

# Spark round-trips per example are ~0.5 s; keep the search small and
# the deadline off — the value is the generated edge cases (dup keys,
# ties, empties), not deep shrinking.
SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _model_upsert(existing, incoming):
    """Latest-wins: highest ver per key; incoming beats existing on ties.
    Within a batch, ties are broken by payload (the implementation's
    deterministic tiebreak is unspecified; we only check the chosen row
    is *a* maximal one, and key uniqueness)."""
    best = {}
    for prio, batch in ((0, existing), (1, incoming)):
        for k, v, p in batch:
            cur = best.get(k)
            if cur is None or (v, prio) > (cur[0], cur[1]):
                best[k] = (v, prio)
    return best


@pytest.mark.usefixtures("spark")
class TestMergeProperties:
    @given(existing=BATCH, incoming=BATCH)
    @SET
    def test_upsert_latest_wins_props(self, spark, existing, incoming):
        # implementation invariant: existing side is unique per key
        existing = list({r[0]: r for r in existing}.values())
        out = upsert_latest_wins(
            _df(spark, existing), _df(spark, incoming), ["id"], "ver"
        ).collect()
        model = _model_upsert(existing, incoming)
        # key set == union of key sets; one row per key
        assert sorted({r["id"] for r in out}) == sorted(model)
        assert len(out) == len(model)
        # every surviving row carries the maximal ver for its key
        for r in out:
            assert r["ver"] == model[r["id"]][0]

    @given(existing=BATCH, incoming=BATCH)
    @SET
    def test_insert_if_absent_props(self, spark, existing, incoming):
        existing = list({r[0]: r for r in existing}.values())
        out = insert_if_absent(
            _df(spark, existing), _df(spark, incoming), ["id"]
        ).collect()
        got = {r["id"]: (r["ver"], r["payload"]) for r in out}
        # every existing row survives byte-identically
        for k, v, p in existing:
            assert got[k] == (v, p)
        # keys only ever grow by incoming's new keys; one row per key
        assert sorted(got) == sorted({r[0] for r in existing} | {r[0] for r in incoming})
        assert len(out) == len(got)

    @given(existing=BATCH, incoming=BATCH)
    @SET
    def test_delete_then_insert_props(self, spark, existing, incoming):
        out = delete_then_insert(
            _df(spark, existing), _df(spark, incoming), ["id"]
        ).collect()
        touched = {r[0] for r in incoming}
        got = sorted((r["id"], r["ver"], r["payload"]) for r in out)
        expect = sorted(
            [r for r in existing if r[0] not in touched] + incoming
        )
        assert got == expect
