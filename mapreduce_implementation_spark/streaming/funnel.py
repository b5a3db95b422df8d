"""Custom stateful streaming operator: ordered-funnel conversion
detection via ``applyInPandasWithState`` (the batch twin is
operators/events.funnel).

Semantics: the same greedy-earliest recurrence as batch — t_0 = the
user's first step-0 event, t_i = the first step-i event at/after
t_{i-1} with t_i - t_0 <= within_s — applied to the stream with the
per-user slot vector as state. When the LAST slot fills, one
conversion row (user_id, t0, t_final) is emitted and the filled vector
stays as a terminal done-marker (conversion is once-per-user, like the
batch n_users count, and independent of micro-batch boundaries); users
mid-funnel keep their slots across micro-batches, and users with no
step-0 event yet store no state at all.

Equals the batch funnel's converted-user set whenever event time is
non-decreasing ACROSS micro-batches (in-order ingestion — the file/
kafka-append case). Within a batch, events are sorted (t, step) before
folding, so intra-batch disorder is handled exactly like batch. A
cross-batch LATE event (earlier event time than an already-folded one)
can diverge from batch semantics — the fold is order-sensitive by
definition; bound the disorder with the source's watermark or
reprocess in batch, as every incremental funnel does.

State per user is O(K) longs, so the state store is bounded by
|users currently mid-funnel| + |converted users| — expired INCOMPLETE
chains (window elapsed, funnel unfinished) are garbage-collected by
processing-time timeout, while converted users' done-markers are kept
forever (the price of the once-per-user terminal contract; dropping
them on timeout would let a later second chain re-emit). One shuffle:
the groupBy(user_id), identical to batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from mapreduce_implementation_spark.operators.events import funnel_events

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t0", LongType()),
        StructField("t_final", LongType()),
    ]
)

_UNSET = -1  # slot sentinel (GroupState round-trips plain longs)


def _state_schema(k: int) -> StructType:
    return StructType([StructField(f"s{i}", LongType()) for i in range(k)])


def _funnel_fn(k: int, within_s: int, timeout_ms: int, use_timeout: bool = True):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            slots = list(state.get) if state.exists else [_UNSET] * k
            if slots[k - 1] != _UNSET:
                # converted done-marker: NEVER GC it — "one conversion
                # row per user ever" is the terminal contract, and
                # removing the marker here would let a second chain
                # after state_ttl_factor*within_s of idleness re-emit.
                # No timeout re-arm: the marker simply stops timing out
                # and stays (state grows O(converted users) — the
                # minimum any exactly-once-per-user semantics can hold).
                yield pd.DataFrame(columns=["user_id", "t0", "t_final"])
                return
            # expired INCOMPLETE chain: the conversion window has long
            # elapsed — drop the slots (in-order streams can never
            # complete it; a conversion would have arrived within the
            # window + slack)
            state.remove()
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])
            return
        slots = list(state.get) if state.exists else [_UNSET] * k
        if slots[k - 1] != _UNSET:
            # already converted: conversion is TERMINAL (one row per
            # user ever, matching the batch funnel's n_users count);
            # the done-marker state stays so later events can't re-arm
            # — without it, output would depend on micro-batch
            # boundaries (a second chain in the SAME batch is ignored
            # by the fold, one in a LATER batch would re-fire)
            if use_timeout:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])
            return
        evs: list[tuple[int, int]] = []
        for pdf in pdfs:
            evs.extend(zip((int(t) for t in pdf["t"]), (int(s) for s in pdf["si"])))
        evs.sort()
        done: tuple[int, int] | None = None
        for t, si in evs:
            if si == 0:
                if slots[0] == _UNSET:
                    slots[0] = t
            elif (
                slots[si] == _UNSET
                and slots[si - 1] != _UNSET
                and t >= slots[si - 1]
                and t - slots[0] <= within_s
            ):
                slots[si] = t
                if si == k - 1:
                    done = (slots[0], t)
                    break
        if done is not None:
            state.update(tuple(slots))  # done marker (see above)
            if use_timeout:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(
                {"user_id": [user_id], "t0": [done[0]], "t_final": [done[1]]}
            )
        elif slots[0] == _UNSET:
            # no step-0 event yet: no later slot can ever fill, so
            # storing all-UNSET slots would just grow the state store
            # with every user who emitted any funnel-type event
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])
        else:
            state.update(tuple(slots))
            if use_timeout:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])

    return fn


def streaming_funnel(
    events_stream: DataFrame,
    steps: tuple[str, ...] | list[str],
    within_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    state_ttl_factor: int = 10,
    use_timeout: bool = True,
) -> DataFrame:
    """Append-mode stream of completed conversions. Filter to funnel
    event types rides the scan (pushed down); per-user state GC after
    ``state_ttl_factor * within_s`` of processing-time inactivity.

    ``use_timeout=False`` for bounded drains (Trigger.AvailableNow
    tests/oracle runs): a ProcessingTimeTimeout query schedules
    state-cleanup micro-batches indefinitely and never terminates —
    the same caveat as streaming/sessionize.py, same switch. Identical
    conversion output either way (a bounded run never reaches the
    timeout; the timeout only garbage-collects failed chains)."""
    k = len(steps)
    # shared input contract with the batch fold — validation, the
    # (user_id, t, si) projection, NULL-ts drop — one definition
    ev = funnel_events(
        events_stream, steps, within_s, user_col, ts_col, type_col
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(k, within_s, state_ttl_factor * within_s * 1000, use_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_state_schema(k),
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
