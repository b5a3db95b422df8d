"""Stateful streaming funnel (streaming/funnel.py): cross-batch slot
state, emit-on-completion, and agreement with the batch operator on
in-order streams."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.events import funnel
from mapreduce_implementation_spark.streaming.funnel import streaming_funnel
from mapreduce_implementation_spark.streaming.queries import run_available_now

STEPS = ("view", "click", "purchase")
WITHIN = 100

# (user_id, t, event_type) — batch 0 holds t < 10, batch 1 holds t >= 10
EVENTS = [
    (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),  # converts ACROSS batches
    (2, 0, "view"), (2, 5, "click"),                        # stalls at click
    (3, 0, "view"), (3, 1, "click"), (3, 2, "purchase"),    # converts in batch 0
    (4, 0, "view"), (4, 15, "purchase"),                    # skips click -> no
    (5, 0, "click"), (5, 1, "purchase"),                    # no view -> no
    (6, 0, "error"),                                        # non-funnel noise
    # full chain in batch 0 AND a second full chain in batch 1: the
    # done-marker state must suppress the re-fire (terminal semantics)
    (7, 0, "view"), (7, 1, "click"), (7, 2, "purchase"),
    (7, 11, "view"), (7, 12, "click"), (7, 13, "purchase"),
]


def _stage(spark, stream_dir):
    df = spark.createDataFrame(EVENTS, "user_id long, t long, event_type string")
    for i, part in enumerate((df.where("t < 10"), df.where("t >= 10"))):
        part.coalesce(1).write.parquet(f"{stream_dir}/b{i}")
    import glob as g
    import shutil

    for i in range(2):
        src = g.glob(f"{stream_dir}/b{i}/part-*.parquet")[0]
        shutil.move(src, f"{stream_dir}/batch_{i}.parquet")
        shutil.rmtree(f"{stream_dir}/b{i}")
    return df


def test_streaming_funnel_cross_batch_state(spark, tmp_path):
    df = _stage(spark, str(tmp_path))
    schema = spark.read.parquet(f"{tmp_path}/batch_0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "batch_*.parquet")
        .parquet(str(tmp_path))
        .select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")
    )
    out = streaming_funnel(stream, STEPS, within_s=WITHIN, use_timeout=False)
    q = run_available_now(out, "conversions", output_mode="append")
    rows = spark.table("conversions").collect()
    got = {r.user_id: (r.t0, r.t_final) for r in rows}
    q.stop()
    assert len(rows) == len(got)  # exactly one row per converted user
    # user 1's view lives in batch 0, click/purchase in batch 1 — the
    # slot state must survive the batch boundary; user 7 converts in
    # batch 0 and must NOT re-fire on the second chain in batch 1
    assert got == {1: (0, 20), 3: (0, 2), 7: (0, 2)}

    # in-order stream ==> converted-user count equals the batch funnel's
    # final-step n_users on the union of both batches
    batch = df.select(
        "user_id", F.timestamp_seconds("t").alias("ts"), "event_type"
    )
    n_last = {
        r.step_idx: r.n_users
        for r in funnel(batch, STEPS, within_s=WITHIN).collect()
    }[len(STEPS) - 1]
    assert len(got) == n_last == 3


def test_streaming_funnel_validates_params(spark, tmp_path):
    df = _stage(spark, str(tmp_path))
    schema = spark.read.parquet(f"{tmp_path}/batch_0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(tmp_path))
        .select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")
    )
    with pytest.raises(ValueError):
        streaming_funnel(stream, ("view",), within_s=10)
    with pytest.raises(ValueError):
        streaming_funnel(stream, ("view", "view"), within_s=10)
    with pytest.raises(ValueError):
        streaming_funnel(stream, STEPS, within_s=0)


class _FakeState:
    """Minimal GroupState double for unit-driving _funnel_fn's branches
    (the real state store can't be steered into a timeout callback
    deterministically from a test)."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _drain(gen):
    import pandas as pd

    return pd.concat(list(gen), ignore_index=True)


def test_timeout_keeps_done_marker_and_gcs_incomplete():
    """The timeout callback must GC only INCOMPLETE chains; a converted
    user's done-marker survives the timeout so a second chain after the
    TTL can never re-emit (advisor finding r7: 'one row per user ever'
    must not depend on the state TTL)."""
    import pandas as pd

    from mapreduce_implementation_spark.streaming.funnel import (
        _UNSET,
        _funnel_fn,
    )

    fn = _funnel_fn(k=3, within_s=100, timeout_ms=1000)

    # 1) user converts — state becomes the done marker
    st = _FakeState()
    batch = pd.DataFrame({"t": [0, 1, 2], "si": [0, 1, 2]})
    out = _drain(fn((7,), iter([batch]), st))
    assert list(out.user_id) == [7]
    assert st.get is not None and st.get[2] != _UNSET

    # 2) timeout fires on the done marker — it must SURVIVE
    st.hasTimedOut = True
    out = _drain(fn((7,), iter([]), st))
    assert out.empty and not st.removed and st.exists

    # 3) a second full chain after the timeout — still no re-fire
    st.hasTimedOut = False
    batch2 = pd.DataFrame({"t": [50, 51, 52], "si": [0, 1, 2]})
    out = _drain(fn((7,), iter([batch2]), st))
    assert out.empty

    # 4) an INCOMPLETE chain's timeout still garbage-collects
    st2 = _FakeState(value=(0, _UNSET, _UNSET), timed_out=True)
    out = _drain(fn((8,), iter([]), st2))
    assert out.empty and st2.removed and not st2.exists


def test_event_time_arm_sets_window_close_timestamp():
    """Event mode arms the timer at (t0 + within)s + 1ms — the moment
    the watermark can prove the chain dead — clamped above the current
    watermark (Spark rejects timestamps at/behind it)."""
    from mapreduce_implementation_spark.streaming.funnel import (
        _UNSET,
        _funnel_fn,
    )
    import pandas as pd

    fn = _funnel_fn(k=3, within_s=100, timeout_ms=999_999, timeout_mode="event")

    class _EvState(_FakeState):
        def __init__(self, wm_ms=0, **kw):
            super().__init__(**kw)
            self._wm = wm_ms
            self.timeout_ts = None

        def getCurrentWatermarkMs(self):
            return self._wm

        def setTimeoutTimestamp(self, ms):
            self.timeout_ts = ms

    # chain starts at t=40 → window closes at 140s → timer at 140001ms
    st = _EvState(wm_ms=0)
    _drain(fn((1,), iter([pd.DataFrame({"t": [40], "si": [0]})]), st))
    assert st.timeout_ts == 140_001 and st.get[0] == 40

    # watermark already past the window → clamp to wm+1 (fires next batch)
    st2 = _EvState(wm_ms=500_000, value=(40, _UNSET, _UNSET))
    _drain(fn((1,), iter([pd.DataFrame({"t": [60], "si": [1]})]), st2))
    assert st2.timeout_ts == 500_001

    # done marker: never armed in event mode, survives its timeout
    st3 = _EvState(wm_ms=0)
    _drain(fn((1,), iter([pd.DataFrame({"t": [0, 1, 2], "si": [0, 1, 2]})]), st3))
    assert st3.timeout_ts is None and st3.get[2] == 2
    st3.hasTimedOut = True
    _drain(fn((1,), iter([]), st3))
    assert st3.exists and not st3.removed


def _stage_two_files(spark, stream_dir, batch0, batch1):
    import glob as g
    import shutil

    for i, rows in enumerate((batch0, batch1)):
        df = spark.createDataFrame(rows, "user_id long, t long, event_type string")
        df.coalesce(1).write.parquet(f"{stream_dir}/b{i}")
        src = g.glob(f"{stream_dir}/b{i}/part-*.parquet")[0]
        shutil.move(src, f"{stream_dir}/batch_{i}.parquet")
        shutil.rmtree(f"{stream_dir}/b{i}")


def _event_mode_stream(spark, stream_dir, delay_s):
    schema = spark.read.parquet(f"{stream_dir}/batch_0.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "batch_*.parquet")
        .parquet(stream_dir)
        .select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")
    )


def test_event_time_timeout_gcs_dead_chain_e2e(spark, tmp_path):
    """Event-mode GC keyed to the stream's own clock: user 2's stalled
    chain (window closes at t=100) is removed once the watermark
    (advanced by user 9's t=300 events) passes it; user 9's conversion
    done-marker survives. Final state = exactly the done-marker row."""
    _stage_two_files(
        spark,
        str(tmp_path),
        [(2, 0, "view"), (2, 5, "click"), (9, 300, "view")],
        [(9, 305, "click"), (9, 310, "purchase")],
    )
    stream = _event_mode_stream(spark, str(tmp_path), 100)
    out = streaming_funnel(
        stream, STEPS, within_s=WITHIN, timeout_mode="event",
        watermark_delay_s=100,
    )
    q = run_available_now(out, "conv_event_gc", output_mode="append")
    rows = spark.table("conv_event_gc").collect()
    assert {r.user_id for r in rows} == {9}
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    q.stop()
    # last reported state size: only user 9's done-marker remains —
    # user 2's dead chain was event-time-GC'd, not TTL-guessed
    assert state_rows[-1] == 1, state_rows


def test_event_mode_divergence_window_vs_batch(spark, tmp_path):
    """The documented fold divergence under cross-batch disorder: a
    late-arriving MIDDLE step (click t=5 arriving after purchase t=8
    was already folded away) converts in batch but NOT in the stream —
    the fold is order-sensitive across micro-batches by design.
    Intra-batch disorder (user 12) is sorted away and agrees."""
    _stage_two_files(
        spark,
        str(tmp_path),
        [(11, 0, "view"), (11, 8, "purchase")],
        # u11's click arrives late; u12's whole chain lands out of
        # order INSIDE one batch
        [(11, 5, "click"), (12, 20, "view"), (12, 28, "purchase"), (12, 25, "click")],
    )
    stream = _event_mode_stream(spark, str(tmp_path), 1000)
    out = streaming_funnel(
        stream, STEPS, within_s=WITHIN, timeout_mode="event",
        watermark_delay_s=1000,
    )
    q = run_available_now(out, "conv_event_div", output_mode="append")
    got = {r.user_id for r in spark.table("conv_event_div").collect()}
    q.stop()
    assert got == {12}  # stream: intra-batch disorder OK, cross-batch lost

    batch = spark.createDataFrame(
        [(11, 0, "view"), (11, 8, "purchase"), (11, 5, "click"),
         (12, 20, "view"), (12, 28, "purchase"), (12, 25, "click")],
        "user_id long, t long, event_type string",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")
    n_last = {
        r.step_idx: r.n_users
        for r in funnel(batch, STEPS, within_s=WITHIN).collect()
    }[len(STEPS) - 1]
    assert n_last == 2  # batch sees the full ordered history: both convert


# ---------------------------------------------------------------------------
# Round-15: ordering="watermark" — the sessionize close-rule principle
# applied to the order-sensitive funnel recurrence. Events buffer until
# the watermark matures them and fold in global event-time order, so
# the conversion set is batching/restart-invariant for any disorder
# within the delay. Bounded drains complete through drain_exact with a
# step-typed sentinel staged past every real event.
# ---------------------------------------------------------------------------

FUNNEL_SCHEMA = "user_id long, ts timestamp, event_type string"


def _stage_wm(tmp_path, tag, files):
    """files: list of [(user, t, type), ...] — one parquet per batch,
    mtime-ordered from NOW (the file source ignores files older than
    latest-seen - 7d once a sentinel has been staged)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir = tmp_path / f"{tag}_in"
    in_dir.mkdir()
    for i, rows in enumerate(files):
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                    ),
                    "event_type": pa.array(
                        [r[2] for r in rows], pa.string()
                    ),
                }
            ),
            str(in_dir / f"f{i}.parquet"),
        )
        m = int(time.time()) + i * 60
        os.utime(str(in_dir / f"f{i}.parquet"), (m, m))
    return in_dir


def _drain_wm_funnel(spark, tmp_path, tag, files, delay_s, mfpt=1):
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    in_dir = _stage_wm(tmp_path, tag, files)
    out = str(tmp_path / f"{tag}_out")
    drain_exact(
        spark, str(in_dir), out, str(tmp_path / f"{tag}_ckpt"),
        schema=FUNNEL_SCHEMA,
        max_files_per_trigger=mfpt,
        sentinel_lead_s=delay_s + 1,
        sentinel_extra_cols={"event_type": STEPS[0]},
        query_builder=lambda stream: streaming_funnel(
            stream, STEPS, within_s=WITHIN, timeout_mode="event",
            watermark_delay_s=delay_s, ordering="watermark",
        ),
    )
    return sorted(
        (r.user_id, r.t0, r.t_final)
        for r in spark.read.parquet(out).collect()
    )


def test_watermark_ordering_matches_batch_under_cross_batch_disorder(
    spark, tmp_path
):
    """The r13-pinned divergence case, now CONVERGENT: u11's middle
    step arrives a batch after its purchase was seen — arrival
    ordering loses the conversion (test_event_mode_divergence...),
    watermark ordering folds in event-time order and matches batch."""
    # times start at 1000, not 0: rows exactly at the initial epoch-0
    # watermark are dropped by the engine (the FILES-fixture caveat)
    files = [
        [(11, 1000, "view"), (11, 1008, "purchase")],
        [(11, 1005, "click"), (12, 1020, "view"), (12, 1028, "purchase"),
         (12, 1025, "click")],
    ]
    got = _drain_wm_funnel(spark, tmp_path, "wmd", files, delay_s=1000)
    assert got == [(11, 1000, 1008), (12, 1020, 1028)]

    batch = spark.createDataFrame(
        [(u, t, e) for f in files for u, t, e in f],
        "user_id long, t long, event_type string",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")
    n_last = {
        r.step_idx: r.n_users
        for r in funnel(batch, STEPS, within_s=WITHIN).collect()
    }[len(STEPS) - 1]
    assert n_last == len(got) == 2


def test_watermark_ordering_batching_invariant(spark, tmp_path):
    """Same disordered data, three trigger sizes: identical
    conversion sets (the arrival fold is batch-cut-sensitive here)."""
    files = [
        [(1, 1000, "view"), (2, 1300, "view")],
        [(1, 1040, "purchase"), (2, 1310, "click")],
        [(1, 1020, "click"), (2, 1320, "purchase"), (3, 1500, "click")],
    ]
    results = [
        _drain_wm_funnel(
            spark, tmp_path, f"inv{i}", files, delay_s=1000, mfpt=m
        )
        for i, m in enumerate((1, 2, None))
    ]
    assert results[0] == results[1] == results[2]
    assert results[0] == [(1, 1000, 1040), (2, 1300, 1320)]


def test_watermark_ordering_greedy_restart_and_terminal(spark, tmp_path):
    """Expiry semantics: a failed attempt expires in-fold and a later
    chain converts (greedy-RESTART — the documented divergence from
    the batch twin's fixed-first-view greedy-earliest, which would
    stay dead); conversion remains once-per-user terminal."""
    files = [
        # u1: view at 1000 never completes; full chain at 1500 converts
        [(1, 1000, "view"), (1, 1500, "view")],
        [(1, 1510, "click"), (1, 1520, "purchase")],
        # u7: converts, then a SECOND full chain must not re-emit
        [(7, 1000, "view"), (7, 1001, "click"), (7, 1002, "purchase")],
        [(7, 1300, "view"), (7, 1301, "click"), (7, 1302, "purchase")],
    ]
    got = _drain_wm_funnel(spark, tmp_path, "gr", files, delay_s=1000)
    assert got == [(1, 1500, 1520), (7, 1000, 1002)]


def test_watermark_ordering_validation(spark, tmp_path):
    stream = (
        spark.readStream.schema(FUNNEL_SCHEMA)
        .parquet(str(tmp_path))
    )
    with pytest.raises(ValueError, match="watermark"):
        streaming_funnel(
            stream, STEPS, within_s=10, use_timeout=False,
            ordering="watermark",
        )
    with pytest.raises(ValueError, match="drop_late"):
        streaming_funnel(
            stream, STEPS, within_s=10, timeout_mode="event",
            ordering="watermark", drop_late=True,
        )
    with pytest.raises(ValueError, match="ordering"):
        streaming_funnel(
            stream, STEPS, within_s=10, timeout_mode="event",
            ordering="bogus",
        )


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_watermark_ordering_resume_matches_one_shot(spark, tmp_path, provider):
    """Kill-resume invariance: an UNCOMPLETED plain drain over half the
    files (the interrupted-run shape — no sentinel, watermark still at
    the real data), then the rest of the files appear, then one
    drain_exact — the final conversion set equals the one-shot drain's
    (the buffered fold's output is a pure function of the delivered
    data and the final watermark). Note the completion step is
    TERMINAL by design: drain_exact's lead sentinel advances the
    watermark past max_ts + lead − delay, so appending OLDER data
    after a completed drain is out of contract (Spark's late filter
    drops it) — resume-equivalence holds for interrupted runs, which
    never staged the sentinel."""
    from mapreduce_implementation_spark.streaming.queries import (
        ROCKSDB_STATE_STORE_PROVIDER,
    )
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    if provider == "rocksdb":
        spark.conf.set(key, ROCKSDB_STATE_STORE_PROVIDER)
    elif before is not None:
        spark.conf.unset(key)
    tmp_path = tmp_path / provider
    tmp_path.mkdir()

    files = [
        [(11, 1000, "view"), (11, 1008, "purchase")],
        [(11, 1005, "click"), (12, 1020, "view")],
        [(12, 1028, "purchase"), (12, 1025, "click")],
    ]
    one_shot = _drain_wm_funnel(spark, tmp_path, "os", files, delay_s=1000)

    in_dir = _stage_wm(tmp_path, "rs", files[:1])
    out = str(tmp_path / "rs_out")
    ckpt = str(tmp_path / "rs_ckpt")

    def build(stream):
        return streaming_funnel(
            stream, STEPS, within_s=WITHIN, timeout_mode="event",
            watermark_delay_s=1000, ordering="watermark",
        )

    # interrupted-run shape: a bare availableNow drain, no completion
    q = (
        build(
            spark.readStream.schema(FUNNEL_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(in_dir))
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, rows in enumerate(files[1:], start=1):
        p = str(in_dir / f"f{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                    ),
                    "event_type": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            p,
        )
        m = int(time.time()) + 300 + i * 60
        os.utime(p, (m, m))
    report = drain_exact(
        spark, str(in_dir), out, ckpt,
        schema=FUNNEL_SCHEMA,
        max_files_per_trigger=1,
        sentinel_lead_s=1001,
        sentinel_extra_cols={"event_type": STEPS[0]},
        query_builder=build,
    )
    assert report["resumed"] is True
    got = sorted(
        (r.user_id, r.t0, r.t_final)
        for r in spark.read.parquet(out).collect()
    )
    assert got == one_shot == [(11, 1000, 1008), (12, 1020, 1028)]
    if before is not None:
        spark.conf.set(key, before)
    else:
        try:
            spark.conf.unset(key)
        except Exception:
            pass


def test_watermark_vs_batch_divergence_is_exactly_the_retry_class(
    spark, tmp_path
):
    """round-16 verdict item 6: the two funnel contracts under one
    family name differ by a MEASURABLE set, not prose. The batch twin
    (funnel_converted_users) fixes t0 at the user's first step-0 event
    ever (fixed first-touch: one failed attempt kills the user
    forever); the watermark fold retries after a provably-expired
    attempt (greedy-restart). Structurally stream ⊇ batch on
    conversion USERS — expiry fires only when the watermark proves the
    open attempt unconvertible, so no batch conversion is ever lost —
    and the divergence is exactly the retry class; first-attempt
    conversions byte-match. (The 2M-corpus magnitude is recorded in
    BASELINE.md round 16.)"""
    from mapreduce_implementation_spark.operators.events import (
        funnel_converted_users,
    )

    files = [
        # u1: first attempt (view@1000) never completes; the retry
        # chain at 1500 converts — stream-only
        [(1, 1000, "view"), (1, 1500, "view")],
        [(1, 1510, "click"), (1, 1520, "purchase")],
        # u2: converts on the first attempt — both, byte-identical
        [(2, 1000, "view"), (2, 1010, "click"), (2, 1020, "purchase")],
        # u3: never converts — neither
        [(3, 1000, "view"), (3, 1010, "click")],
    ]
    got = _drain_wm_funnel(spark, tmp_path, "div16", files, delay_s=1000)
    batch_df = spark.createDataFrame(
        [(u, t, e) for f in files for u, t, e in f],
        "user_id long, t long, event_type string",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")
    batch = sorted(
        (r.user_id, r.t0, r.t_final)
        for r in funnel_converted_users(batch_df, STEPS, WITHIN).collect()
    )
    stream_users = {u for u, _, _ in got}
    batch_users = {u for u, _, _ in batch}
    assert batch == [(2, 1000, 1020)]
    assert batch_users <= stream_users  # stream ⊇ batch, structurally
    assert stream_users - batch_users == {1}  # divergence = retries only
    assert [r for r in got if r[0] in batch_users] == batch


def test_epoch_zero_event_is_undeliverable_to_the_watermarked_fold(
    spark, tmp_path
):
    """Round-16 delivery-boundary pin (found by the 2M divergence
    harness: 1 of 9202 batch conversions hinged on a ts=0 view).
    Spark's pre-fold late filter for applyInPandasWithState drops rows
    with event-time <= the PREVIOUS batch's watermark — inclusive —
    and the initial watermark is 0, so an event at exactly epoch 0
    never reaches the fold in ANY batch. Consequences pinned here:
    the stream ⊇ batch conversion-set structure holds on the
    DELIVERED data (ts > 0 under in-tolerance disorder), and a chain
    seeded at epoch 0 converts in batch but not in the stream."""
    from mapreduce_implementation_spark.operators.events import (
        funnel_converted_users,
    )

    files = [
        # u1's chain is seeded at epoch 0: view@0 -> click@10 ->
        # purchase@20. The batch fold converts it; the stream never
        # sees the view.
        [(1, 0, "view"), (1, 10, "click")],
        [(1, 20, "purchase"), (2, 30, "view"), (2, 40, "click"),
         (2, 50, "purchase")],
    ]
    got = _drain_wm_funnel(spark, tmp_path, "epoch0", files, delay_s=1000)
    all_df = spark.createDataFrame(
        [(u, t, e) for f in files for u, t, e in f],
        "user_id long, t long, event_type string",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")
    batch_raw = sorted(
        (r.user_id, r.t0, r.t_final)
        for r in funnel_converted_users(all_df, STEPS, WITHIN).collect()
    )
    batch_delivered = sorted(
        (r.user_id, r.t0, r.t_final)
        for r in funnel_converted_users(
            all_df.where(F.col("ts").cast("long") > 0), STEPS, WITHIN
        ).collect()
    )
    # raw batch converts u1 off the undeliverable seed; the stream
    # cannot — and on the delivered set the superset structure is
    # restored exactly
    assert batch_raw == [(1, 0, 20), (2, 30, 50)]
    assert got == [(2, 30, 50)]
    assert batch_delivered == [(2, 30, 50)]
    assert {u for u, _, _ in batch_delivered} <= {u for u, _, _ in got}


def _drain_wm_funnel_expiry(spark, tmp_path, tag, files, delay_s, expiry,
                            mfpt=1):
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    in_dir = _stage_wm(tmp_path, tag, files)
    out = str(tmp_path / f"{tag}_out")
    drain_exact(
        spark, str(in_dir), out, str(tmp_path / f"{tag}_ckpt"),
        schema=FUNNEL_SCHEMA,
        max_files_per_trigger=mfpt,
        sentinel_lead_s=delay_s + 1,
        sentinel_extra_cols={"event_type": STEPS[0]},
        query_builder=lambda stream: streaming_funnel(
            stream, STEPS, within_s=WITHIN, timeout_mode="event",
            watermark_delay_s=delay_s, ordering="watermark",
            expiry=expiry,
        ),
    )
    return sorted(
        (r.user_id, r.t0, r.t_final)
        for r in spark.read.parquet(out).collect()
    )


def test_first_touch_expiry_equals_batch_on_delivered_data(
    spark, tmp_path
):
    """Round-16 batch-parity mode: expiry='first-touch' dead-marks a
    provably-failed first attempt instead of retrying, so the stream's
    conversion set EQUALS funnel_converted_users — including on the
    retry corpus where greedy-restart diverges, and invariant to
    trigger batching."""
    from mapreduce_implementation_spark.operators.events import (
        funnel_converted_users,
    )

    files = [
        # u1: failed first attempt (view@1000 alone), retry chain at
        # 1500 converts — greedy-restart-only; first-touch must NOT
        # emit it (batch doesn't)
        [(1, 1000, "view"), (1, 1500, "view")],
        [(1, 1510, "click"), (1, 1520, "purchase")],
        # u2: converts on the first attempt — identical in all modes
        [(2, 1000, "view"), (2, 1010, "click"), (2, 1020, "purchase")],
        # u3: first attempt fails via the in-fold expiry (click beyond
        # the window proves it closed), no retry material
        [(3, 1000, "view"), (3, 1000 + WITHIN + 50, "click")],
        # u4: chain completes exactly AT the window edge — boundary
        [(4, 2000, "view"), (4, 2000 + WITHIN, "purchase"),
         (4, 2050, "click")],
    ]
    batch_df = spark.createDataFrame(
        [(u, t, e) for f in files for u, t, e in f],
        "user_id long, t long, event_type string",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")
    batch = sorted(
        (r.user_id, r.t0, r.t_final)
        for r in funnel_converted_users(batch_df, STEPS, WITHIN).collect()
    )
    ft = _drain_wm_funnel_expiry(
        spark, tmp_path, "ft16", files, delay_s=3000, expiry="first-touch"
    )
    assert ft == batch  # the whole point: set-equal, not superset
    gr = _drain_wm_funnel_expiry(
        spark, tmp_path, "gr16", files, delay_s=3000,
        expiry="greedy-restart",
    )
    assert {u for u, _, _ in gr} - {u for u, _, _ in ft} == {1}
    # batching invariance holds for the new mode too
    ft2 = _drain_wm_funnel_expiry(
        spark, tmp_path, "ft16b", files, delay_s=3000,
        expiry="first-touch", mfpt=4,
    )
    assert ft2 == ft


def test_first_touch_requires_watermark_ordering(spark, tmp_path):
    stream = spark.readStream.schema(FUNNEL_SCHEMA).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="first-touch"):
        streaming_funnel(
            stream, STEPS, within_s=WITHIN, timeout_mode="event",
            ordering="arrival", expiry="first-touch",
        )
    with pytest.raises(ValueError, match="expiry"):
        streaming_funnel(
            stream, STEPS, within_s=WITHIN, timeout_mode="event",
            ordering="watermark", expiry="nonsense",
        )
