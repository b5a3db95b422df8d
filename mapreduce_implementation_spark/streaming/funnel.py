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
from mapreduce_implementation_spark.streaming.sessionize import (
    WATERMARK_SENTINEL_USER,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t0", LongType()),
        StructField("t_final", LongType()),
    ]
)

_UNSET = -1  # slot sentinel (GroupState round-trips plain longs)
# first-touch dead marker (round 16): a user whose FIRST attempt
# provably failed is terminal under expiry="first-touch" — encoded in
# the existing slot longs (all slots _DEAD) so the state schema is
# unchanged vs greedy-restart and checkpoints stay compatible
_DEAD = -2


def _state_schema(k: int, ordering: str = "arrival") -> StructType:
    fields = [StructField(f"s{i}", LongType()) for i in range(k)]
    if ordering == "watermark":
        # pending not-yet-matured events ride in state until the
        # watermark passes them (see _funnel_fn_wm) — bounded by the
        # per-user event count inside one watermark-delay window
        from pyspark.sql.types import ArrayType

        fields += [
            StructField("buf_t", ArrayType(LongType())),
            StructField("buf_si", ArrayType(LongType())),
        ]
    return StructType(fields)


def _funnel_fn(
    k: int,
    within_s: int,
    timeout_ms: int,
    timeout_mode: str = "processing",
    drop_late: bool = False,
):
    """State-fold factory. ``timeout_mode``:

    * ``"processing"`` — wall-clock GC after ``timeout_ms`` of
      inactivity (heuristic: the TTL factor guesses when a chain is
      dead);
    * ``"event"`` — EVENT-TIME GC: an incomplete chain is expired when
      the watermark passes ``slots[0] + within_s`` — at that point no
      event that could complete the chain can still arrive (the
      watermark drops older rows), so the GC is PROVABLY safe, not a
      TTL guess;
    * ``"none"`` — no timeouts armed (bounded available-now drains).

    Done-markers are never armed in event mode and survive every
    timeout in all modes (once-per-user terminal contract)."""

    def _arm(state: GroupState, slots: list[int]) -> None:
        if timeout_mode == "processing":
            state.setTimeoutDuration(timeout_ms)
        elif timeout_mode == "event":
            # fire once the watermark proves the window closed; the
            # timestamp must exceed the current watermark, so clamp
            target = (slots[0] + within_s) * 1000 + 1
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(target, wm + 1))

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if user_id == WATERMARK_SENTINEL_USER:
            # flush sentinel (write_flush_sentinel with a step-typed
            # event_type so it survives the pre-watermark filter): its
            # watermark job is done before the fold runs
            if state.exists:
                state.remove()
            return
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
            if timeout_mode == "processing":
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])
            return
        evs: list[tuple[int, int]] = []
        for pdf in pdfs:
            evs.extend(zip((int(t) for t in pdf["t"]), (int(s) for s in pdf["si"])))
        if drop_late:
            # close the one-batch lag window Spark's previous-batch
            # watermark filter leaves open (see the corrected contract
            # in sessionize.sessionize_stream): rows behind the
            # CURRENT batch watermark never reach the order-sensitive
            # fold
            wm = state.getCurrentWatermarkMs()
            if wm > 0:
                evs = [(t, s) for t, s in evs if t * 1000 >= wm]
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
            if timeout_mode == "processing":
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
            _arm(state, slots)
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])

    return fn


def _funnel_fn_wm(k: int, within_s: int, expiry: str = "greedy-restart"):
    """WATERMARK-ORDERED state fold (round 15; event mode only): the
    order-insensitive counterpart of _funnel_fn. Arriving events BUFFER
    in state; an event is folded only once the watermark passes it
    (matured), and matured events fold in global EVENT-TIME order —
    Spark's late-record filter guarantees no future arrival can precede
    the current watermark (an event with t < wm would be dropped
    against the next batch's late-watermark ≥ wm), so the matured
    sequence is a deterministic, batching-independent serialization of
    the delivered data.

    Semantics over that sequence — GREEDY-RESTART: t1 = the first
    step-0 event of the CURRENT attempt; when a later event proves the
    open attempt's window closed (t > t1 + within_s, chain incomplete)
    the attempt expires IN-FOLD and the next step-0 event seeds a
    fresh one. Equal to the batch twin's greedy-earliest whenever the
    user's FIRST attempt is the converting one (pytest-pinned);
    after a failed attempt the batch twin stays dead forever (its t1
    is fixed at the first step-0 event ever) while this fold retries —
    the operational "sliding first-touch" reading, chosen so state
    stays O(mid-funnel + converted) instead of one dead-marker per
    user who ever emitted a view. Conversion stays once-per-user
    terminal (done-marker), exactly like the arrival fold.

    ``expiry="first-touch"`` (round 16 — the batch-parity mode the 2M
    divergence measurement motivated: 24,181 of 33,382 stream
    conversions there were retry-class): a provably-failed FIRST
    attempt dead-marks the user forever instead of retrying, making
    the conversion set EQUAL to the batch twin
    (operators.events.funnel_converted_users) on the delivered data —
    pytest-pinned, including the retry corpora where greedy-restart
    diverges. The price is the state bound the default mode exists to
    avoid: one permanent dead-marker row per user whose first attempt
    failed (up to one row per user who ever emitted a step-0 event),
    vs O(mid-funnel + converted). The marker rides the existing slot
    longs (all slots -2), so both modes share one state schema and a
    checkpoint can resume under either — but the mode is part of the
    output contract: resume a checkpoint with the SAME expiry it was
    started with.

    Because conversions emit only when MATURED, a bounded drain must
    push the final watermark past every real event: drain with
    sessionize.drain_exact(sentinel_lead_s=delay+1,
    sentinel_extra_cols={"event_type": steps[0]}) — the step-typed
    sentinel survives the funnel's pre-watermark type filter and the
    reserved-key guard keeps it out of state and output."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if user_id == WATERMARK_SENTINEL_USER:
            if state.exists:
                state.remove()
            return
        if state.exists:
            vals = state.get
            slots = list(vals[:k])
            buf = sorted(zip(vals[k] or [], vals[k + 1] or []))
        else:
            slots = [_UNSET] * k
            buf = []
        if slots[k - 1] != _UNSET:
            # terminal marker — converted done-marker, or (first-touch
            # mode) the dead marker: once per user ever; no timer is
            # armed so it simply stays
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])
            return
        if not state.hasTimedOut:
            evs: list[tuple[int, int]] = []
            for pdf in pdfs:
                evs.extend(
                    zip(
                        (int(t) for t in pdf["t"]),
                        (int(s) for s in pdf["si"]),
                    )
                )
            buf = sorted(buf + evs)
        wm = state.getCurrentWatermarkMs()
        matured = [(t, si) for t, si in buf if t * 1000 < wm]
        rest = [(t, si) for t, si in buf if t * 1000 >= wm]
        done: tuple[int, int] | None = None
        for t, si in matured:
            if (
                slots[0] != _UNSET
                and t - slots[0] > within_s
            ):
                # the open attempt's window is provably closed at this
                # event's time: expire IN-FOLD (event-time, not
                # batch-time — keeps the fold a pure function of the
                # matured sequence). Default: let this event seed a
                # retry; first-touch: the user is dead forever.
                if expiry == "first-touch":
                    slots = [_DEAD] * k
                    break
                slots = [_UNSET] * k
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
            state.update(tuple(slots) + ([], []))  # done marker, buf dropped
            yield pd.DataFrame(
                {"user_id": [user_id], "t0": [done[0]], "t_final": [done[1]]}
            )
            return
        # batch-time cleanup (semantically idempotent with the in-fold
        # expiry): an open attempt whose window the watermark closed
        # can never convert, and with an empty buffer the state holds
        # nothing a future event needs
        if (
            slots[0] not in (_UNSET, _DEAD)
            and (slots[0] + within_s) * 1000 < wm
        ):
            slots = [_DEAD] * k if expiry == "first-touch" else [_UNSET] * k
        if slots[0] == _DEAD:
            # first-touch terminal: nothing buffered or future can
            # matter — persist the dead marker alone, no timer
            state.update(tuple(slots) + ([], []))
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])
            return
        if slots[0] == _UNSET and not rest:
            if state.exists:
                state.remove()
            yield pd.DataFrame(columns=["user_id", "t0", "t_final"])
            return
        state.update(
            tuple(slots)
            + ([t for t, _ in rest], [s for _, s in rest])
        )
        # wake when the earliest buffered event matures or the open
        # attempt's window closes, whichever first
        targets = []
        if rest:
            targets.append(min(t for t, _ in rest) * 1000 + 1)
        if slots[0] != _UNSET:
            targets.append((slots[0] + within_s) * 1000 + 1)
        state.setTimeoutTimestamp(max(min(targets), wm + 1))
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
    timeout_mode: str | None = None,
    watermark_delay_s: int | None = None,
    drop_late: bool = False,
    ordering: str = "arrival",
    expiry: str = "greedy-restart",
) -> DataFrame:
    """Append-mode stream of completed conversions. Filter to funnel
    event types rides the scan (pushed down).

    ``ordering`` (round 15): ``"arrival"`` (default) folds events as
    micro-batches deliver them — sorted within a batch, order-
    sensitive ACROSS batches (the documented cross-batch-disorder
    divergence from the batch twin, pinned in
    tests/test_streaming_funnel.py); ``"watermark"`` (event mode
    only) buffers events in state until the watermark matures them
    and folds in global EVENT-TIME order — the sessionize close-rule
    principle applied to the order-sensitive funnel recurrence, so
    with watermark_delay_s STRICTLY GREATER than the staging disorder
    the conversion set is a pure function of the DELIVERED data,
    independent of batching and restarts (see _funnel_fn_wm for the
    greedy-restart expiry semantics and the bounded-drain sentinel
    contract). Delivery boundary (measured round 16, reproduced in
    tests/test_streaming_funnel.py): Spark's pre-fold late filter for
    applyInPandasWithState drops rows with event-time ≤ the PREVIOUS
    batch's watermark — the comparison is inclusive, so the disorder
    tolerance is ``delay - 1`` seconds, not ``delay``, and because
    the initial watermark is 0 an event at exactly epoch 0 is
    PERMANENTLY undeliverable to any watermarked stateful operator
    (it can never fold, in any batch — the one batch-vs-stream
    conversion-set asymmetry the 2M rehearsal found traced to exactly
    this class, BASELINE.md round 16).

    ``expiry`` (round 16; watermark ordering only):
    ``"greedy-restart"`` (default) retries a user after a
    provably-failed attempt — the O(mid-funnel + converted) state
    bound; ``"first-touch"`` dead-marks the user instead, making the
    conversion set EQUAL to the batch
    ``operators.events.funnel_converted_users`` on delivered data
    (pytest-pinned) at the cost of one permanent state row per user
    whose first attempt failed. The 2M rehearsal prices the contract
    gap: 9,202 first-touch vs 33,382 greedy-restart conversions
    (BASELINE.md round 16). Same state schema either way; resume a
    checkpoint under the expiry it was started with.

    ``drop_late=True`` (event mode only — round 13; contract
    corrected round 15): Spark's own late-record filtering already
    drops rows older than the PREVIOUS batch's watermark before the
    fold — this flag closes the remaining one-batch LAG WINDOW by
    filtering against the CURRENT watermark, the determinism-over-
    inclusion trade documented at
    streaming/sessionize.sessionize_stream.

    GC policy — ``timeout_mode`` (``use_timeout`` is the legacy bool:
    True → "processing", False → "none"; an explicit ``timeout_mode``
    wins):

    * ``"processing"`` — per-user state GC after
      ``state_ttl_factor * within_s`` of WALL-CLOCK inactivity. A
      heuristic: replaying an old corpus fast expires nothing; a
      stalled source expires live chains.
    * ``"event"`` — GC keyed to the STREAM'S OWN CLOCK: the input gets
      ``withWatermark(ts, watermark_delay_s)`` (default ``within_s``)
      and an incomplete chain expires when the watermark passes
      ``t0 + within_s`` — the moment the window is provably closed
      (no event that could complete it can still arrive; later ones
      are beyond the window, older ones are beyond the watermark).
      Exact, replay-speed-independent; the 100 TB-shape choice.
    * ``"none"`` — for bounded drains (Trigger.AvailableNow tests /
      oracle runs): a ProcessingTimeTimeout query schedules
      state-cleanup micro-batches indefinitely and never terminates —
      the same caveat as streaming/sessionize.py, same switch.

    Identical conversion output in every mode for in-order streams
    (timeouts only garbage-collect failed chains; done-markers always
    survive). Event mode additionally DROPS late rows beyond the
    watermark — the standard bounded-disorder contract; the batch-vs-
    stream divergence under disorder is pinned in
    tests/test_streaming_funnel.py."""
    k = len(steps)
    if timeout_mode is None:
        timeout_mode = "processing" if use_timeout else "none"
    if timeout_mode not in ("processing", "event", "none"):
        raise ValueError(
            f"timeout_mode must be processing|event|none, got {timeout_mode!r}"
        )
    if drop_late and timeout_mode != "event":
        raise ValueError(
            "drop_late requires timeout_mode='event' (there is no "
            "watermark to be late against in the other modes)"
        )
    if ordering not in ("arrival", "watermark"):
        raise ValueError(
            f"ordering must be 'arrival' or 'watermark', got {ordering!r}"
        )
    if ordering == "watermark" and timeout_mode != "event":
        raise ValueError(
            "ordering='watermark' requires timeout_mode='event' — "
            "maturity IS the watermark"
        )
    if ordering == "watermark" and drop_late:
        raise ValueError(
            "ordering='watermark' already folds deterministically in "
            "event-time order; drop_late would only shrink the "
            "delivered set for no determinism gain — drop one"
        )
    if expiry not in ("greedy-restart", "first-touch"):
        raise ValueError(
            f"expiry must be 'greedy-restart' or 'first-touch', "
            f"got {expiry!r}"
        )
    if expiry == "first-touch" and ordering != "watermark":
        raise ValueError(
            "expiry='first-touch' requires ordering='watermark' — "
            "batch parity is only meaningful over the deterministic "
            "event-time serialization (the arrival fold's output "
            "already depends on delivery order)"
        )
    # shared input contract with the batch fold — validation, the
    # (user_id, t, si) projection, NULL-ts drop — one definition
    ev = funnel_events(
        events_stream, steps, within_s, user_col, ts_col, type_col
    )
    if timeout_mode == "event":
        from pyspark.sql import functions as F

        delay = within_s if watermark_delay_s is None else watermark_delay_s
        # the watermark column must be event-time TIMESTAMP on the
        # frame entering the stateful operator
        ev = ev.withColumn("ts_event", F.timestamp_seconds(F.col("t")))
        ev = ev.withWatermark("ts_event", f"{delay} seconds")
        conf = GroupStateTimeout.EventTimeTimeout
    elif timeout_mode == "processing":
        conf = GroupStateTimeout.ProcessingTimeTimeout
    else:
        conf = GroupStateTimeout.NoTimeout
    fold = (
        _funnel_fn_wm(k, within_s, expiry)
        if ordering == "watermark"
        else _funnel_fn(
            k,
            within_s,
            state_ttl_factor * within_s * 1000,
            timeout_mode,
            drop_late,
        )
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_state_schema(k, ordering),
        outputMode="append",
        timeoutConf=conf,
    )
