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
