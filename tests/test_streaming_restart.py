"""Checkpoint restart/restore (round-10 verdict item 8): a stateful
streaming query stopped and restarted from the same checkpoint must
restore its state and produce exactly the output an uninterrupted run
produces — including sessions whose open tail STRADDLES the restart
(the case that proves state actually came back from the checkpoint,
not from reprocessing). The parquet sink's exactly-once manifest makes
the two-run composition idempotent; the wall-clock restore cost at 2M
events is measured by ``scale_rehearsal.py --streaming-restart``
(BASELINE.md)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mapreduce_implementation_spark.streaming.sessionize import (
    sessionize_stream,
)

SCHEMA = "event_id long, user_id long, ts timestamp"
GAP_S = 300


def _write_batch(path, rows, order: int) -> None:
    """rows: (event_id, ts_seconds, user_id). ``order`` pins the file
    source's oldest-first mtime ordering (rapid writes tie on mtime
    and would replay out of order, jumping the watermark)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
            }
        ),
        path,
    )
    mtime = 1_000_000_000 + order * 60
    os.utime(path, (mtime, mtime))


# four micro-batch files; user 1's session spans files 0-2 (so its
# open tail must survive the restart between file 1 and file 2), and
# file 3's time jump advances the watermark far enough to close
# everything before it. Times start at 1000s, NOT 0: the engine's
# late-row filter drops rows exactly at the initial epoch-0 watermark.
FILES = [
    [(0, 1000, 1), (1, 1000, 2)],
    [(2, 1100, 1)],
    [(3, 1200, 1), (4, 6000, 2)],
    [(5, 11_000, 1)],
]


def _drain(spark, in_dir, out_dir, ckpt) -> None:
    q = (
        sessionize_stream(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir),
            gap_s=GAP_S,
            timeout_mode="event",
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _sessions(spark, out_dir):
    return sorted(
        map(
            tuple,
            spark.read.parquet(out_dir)
            .select("user_id", "session_start_s", "session_end_s", "n_events")
            .collect(),
        )
    )


def test_sessionize_restart_from_checkpoint_matches_control(spark, tmp_path):
    control_in = tmp_path / "control_in"
    restart_in = tmp_path / "restart_in"
    control_in.mkdir()
    restart_in.mkdir()
    for i, rows in enumerate(FILES):
        _write_batch(str(control_in / f"b{i}.parquet"), rows, i)

    control_out = str(tmp_path / "control_out")
    _drain(spark, str(control_in), control_out, str(tmp_path / "ckpt_c"))
    control = _sessions(spark, control_out)
    # the fixture's planted truth: u1 [1000..1200]x3, u2 [1000]x1 and
    # [6000]x1 are closed by file 3's watermark advance; the tail
    # (u1@11000) stays open
    assert control == [
        (1, 1000, 1200, 3),
        (2, 1000, 1000, 1),
        (2, 6000, 6000, 1),
    ]

    # interrupted run: drain files 0-1, STOP (query terminates with
    # u1's session open in state), stage files 2-3, restart from the
    # SAME checkpoint into the SAME sink
    for i in (0, 1):
        _write_batch(str(restart_in / f"b{i}.parquet"), FILES[i], i)
    restart_out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "ckpt_r")
    _drain(spark, str(restart_in), restart_out, ckpt)
    # nothing closable yet — watermark after file 1 is 1100-300 = 800,
    # before any session's end+gap
    assert not [
        f
        for f in os.listdir(restart_out)
        if f.endswith(".parquet")
    ] or _sessions(spark, restart_out) == []

    for i in (2, 3):
        _write_batch(str(restart_in / f"b{i}.parquet"), FILES[i], i)
    _drain(spark, str(restart_in), restart_out, ckpt)
    assert _sessions(spark, restart_out) == control


def test_flush_pending_sentinel_recovers_control_output(spark, tmp_path):
    """Trailing-flush ownership contract, resolved (round-13 verdict
    item 6). Fixture: u1's session can ONLY close via its event-time
    timer (u1 has no later event; u2's time jump supplies the
    watermark). Strand the tail deterministically with a Trigger.Once
    drain — all data commits in ONE batch at the initial watermark, no
    timer fires, and the query terminates WITHOUT the trailing no-data
    batch: exactly the kill-after-last-commit (trial-5) state. A plain
    no-new-data resume emits nothing (the measured r12 contract);
    write_flush_sentinel + one more drain reproduces the control's
    output exactly."""
    from mapreduce_implementation_spark.streaming.sessionize import (
        write_flush_sentinel,
    )

    files = [[(0, 1000, 1)], [(1, 6000, 2)]]
    control_in = tmp_path / "fc_in"
    control_in.mkdir()
    for i, rows in enumerate(files):
        _write_batch(str(control_in / f"b{i}.parquet"), rows, i)
    control_out = str(tmp_path / "fc_out")
    _drain(spark, str(control_in), control_out, str(tmp_path / "fc_ckpt"))
    control = _sessions(spark, control_out)
    # u1's tail closed by the trailing batch's timer; u2's stays open
    assert control == [(1, 1000, 1000, 1)]

    stranded_in = tmp_path / "fs_in"
    stranded_in.mkdir()
    for i, rows in enumerate(files):
        _write_batch(str(stranded_in / f"b{i}.parquet"), rows, i)
    out = str(tmp_path / "fs_out")
    ckpt = str(tmp_path / "fs_ckpt")
    q = (
        sessionize_stream(
            spark.readStream.schema(SCHEMA).parquet(str(stranded_in)),
            gap_s=GAP_S,
            timeout_mode="event",
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(once=True)
        .start()
    )
    q.awaitTermination()
    assert _sessions(spark, out) == []  # tail stranded in state

    # a resume with NO new data emits nothing (the measured contract)
    _drain(spark, str(stranded_in), out, ckpt)
    assert _sessions(spark, out) == []

    # the completion step: sentinel at the drained data's max ts, then
    # one more drain — emits exactly the control's rows
    max_ts = max(t for rows in files for _, t, _ in rows)
    write_flush_sentinel(str(stranded_in), max_ts)
    _drain(spark, str(stranded_in), out, ckpt)
    assert _sessions(spark, out) == control


import pytest


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_drain_exact_recovers_control_and_cleans_sentinel(
    spark, tmp_path, provider
):
    """round-14 verdict item 5: the one-call bounded-drain helper.
    Strand a tail deterministically (Trigger.Once — the trial-5
    kill-in-trailing-flush-window class), then a single drain_exact
    must emit exactly the control's rows AND leave no sentinel file in
    the source directory; a second call is idempotent. Gated under
    both state-store providers."""
    from mapreduce_implementation_spark.streaming.queries import (
        ROCKSDB_STATE_STORE_PROVIDER,
    )
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    try:
        if provider == "rocksdb":
            spark.conf.set(key, ROCKSDB_STATE_STORE_PROVIDER)
        elif before is not None:
            spark.conf.unset(key)

        files = [[(0, 1000, 1)], [(1, 6000, 2)]]
        control_in = tmp_path / "dc_in"
        control_in.mkdir()
        for i, rows in enumerate(files):
            _write_batch(str(control_in / f"b{i}.parquet"), rows, i)
        control_out = str(tmp_path / "dc_out")
        _drain(spark, str(control_in), control_out, str(tmp_path / "dc_ckpt"))
        control = _sessions(spark, control_out)
        assert control == [(1, 1000, 1000, 1)]

        stranded_in = tmp_path / "de_in"
        stranded_in.mkdir()
        for i, rows in enumerate(files):
            _write_batch(str(stranded_in / f"b{i}.parquet"), rows, i)
        out = str(tmp_path / "de_out")
        ckpt = str(tmp_path / "de_ckpt")
        q = (
            sessionize_stream(
                spark.readStream.schema(SCHEMA).parquet(str(stranded_in)),
                gap_s=GAP_S,
                timeout_mode="event",
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(once=True)
            .start()
        )
        q.awaitTermination()
        assert _sessions(spark, out) == []  # tail stranded in state

        drain_exact(
            spark, str(stranded_in), out, ckpt, schema=SCHEMA, gap_s=GAP_S
        )
        assert _sessions(spark, out) == control
        assert not [
            f for f in os.listdir(stranded_in) if "sentinel" in f
        ], "sentinel file must be removed after the drain commits"

        # idempotent: a second managed drain adds nothing
        drain_exact(
            spark, str(stranded_in), out, ckpt, schema=SCHEMA, gap_s=GAP_S
        )
        assert _sessions(spark, out) == control
        assert not [f for f in os.listdir(stranded_in) if "sentinel" in f]
    finally:
        if before is not None:
            spark.conf.set(key, before)
        else:
            try:
                spark.conf.unset(key)
            except Exception:
                pass


def test_drain_exact_fresh_start_matches_control(spark, tmp_path):
    """From a cold checkpoint, drain_exact == an uninterrupted drain
    (the sentinel replays the control's own trailing watermark)."""
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    control_in = tmp_path / "df_in"
    control_in.mkdir()
    for i, rows in enumerate(FILES):
        _write_batch(str(control_in / f"b{i}.parquet"), rows, i)
    control_out = str(tmp_path / "df_cout")
    _drain(spark, str(control_in), control_out, str(tmp_path / "df_cckpt"))
    control = _sessions(spark, control_out)

    fresh_in = tmp_path / "df_fin"
    fresh_in.mkdir()
    for i, rows in enumerate(FILES):
        _write_batch(str(fresh_in / f"b{i}.parquet"), rows, i)
    out = str(tmp_path / "df_fout")
    drain_exact(
        spark, str(fresh_in), out, str(tmp_path / "df_fckpt"),
        schema=SCHEMA, gap_s=GAP_S, max_files_per_trigger=1,
    )
    assert _sessions(spark, out) == control
    assert not [f for f in os.listdir(fresh_in) if "sentinel" in f]


def test_drain_exact_empty_source_is_noop(spark, tmp_path):
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    empty_in = tmp_path / "de2_in"
    empty_in.mkdir()
    out = str(tmp_path / "de2_out")
    drain_exact(
        spark, str(empty_in), out, str(tmp_path / "de2_ckpt"),
        schema=SCHEMA, gap_s=GAP_S,
    )
    assert os.listdir(empty_in) == []


# ---------------------------------------------------------------------------
# Round-15 verdict item 3: the ~1/35 disordered-input wobble, detected.
# A kill inside the batch-construction window leaves an ORPHAN entry in
# the file source's own log (a staged file group no offsets entry ever
# bound); the resumed batch then consumes that group together with
# newly listed files under the LAST LOGGED watermark, and with
# drop_late borderline rows flip from dropped to kept-and-merged. These
# tests inject the orphan entry deterministically and pin (a) the
# detection, (b) the documented drop-vs-merge bound, (c) that
# watermark_delay_s >= the staging disorder empties the band.
# ---------------------------------------------------------------------------


def _write_now(path, rows, order: int) -> None:
    """_write_batch with NOW-based mtimes: the orphan protocol adds
    files AFTER a drain whose sentinel carries a real-now mtime, and
    the file source ignores files older than (latest seen - 7d)."""
    import time

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
            }
        ),
        path,
    )
    mtime = int(time.time()) + order * 60
    os.utime(path, (mtime, mtime))


def _inject_orphan_entry(ckpt: str, file_path: str) -> int:
    """Hand-write the file-source log entry a kill inside the
    batch-construction window leaves behind: sources/0/<last+1> listing
    ``file_path``, with no offsets entry binding it."""
    import json

    src = os.path.join(ckpt, "sources", "0")
    nxt = max(int(f) for f in os.listdir(src) if f.isdigit()) + 1
    entry = {
        "path": "file://" + os.path.abspath(file_path),
        "timestamp": int(os.path.getmtime(file_path) * 1000),
        "batchId": nxt,
    }
    with open(os.path.join(src, str(nxt)), "w") as f:
        f.write("v1\n" + json.dumps(entry) + "\n")
    return nxt


ORPHAN_GAP_S = 2500
# f0 seeds the session; f1 advances the watermark past f2's event time
# (f2 is the borderline row: late under the control's per-file batching,
# NOT late under the orphan batch's lower watermark); f3 advances the
# watermark far enough to flush every user-7 timer in both arms.
ORPHAN_FILES = [
    [(0, 1000, 7)],
    [(1, 5000, 7)],
    [(2, 3000, 7)],
    [(3, 100_000, 99)],
]


def _orphan_drain(spark, tmp_path, tag: str, delay_s: int):
    """Control arm: all four files drained one-per-trigger, fresh."""
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    in_dir = tmp_path / f"{tag}_in"
    in_dir.mkdir()
    for i, rows in enumerate(ORPHAN_FILES):
        _write_now(str(in_dir / f"f{i}.parquet"), rows, i)
    out = str(tmp_path / f"{tag}_out")
    report = drain_exact(
        spark, str(in_dir), out, str(tmp_path / f"{tag}_ckpt"),
        schema=SCHEMA, gap_s=ORPHAN_GAP_S, watermark_delay_s=delay_s,
        drop_late=True, max_files_per_trigger=1,
    )
    return _sessions(spark, out), report


def _orphan_arm(spark, tmp_path, tag: str, delay_s: int):
    """Orphan arm: drain f0, add f1-f3, inject f1's orphan log entry,
    resume — the resumed batch consumes f1+f2+f3 together under f0's
    watermark."""
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    in_dir = tmp_path / f"{tag}_in"
    in_dir.mkdir()
    _write_now(str(in_dir / "f0.parquet"), ORPHAN_FILES[0], 0)
    out = str(tmp_path / f"{tag}_out")
    ckpt = str(tmp_path / f"{tag}_ckpt")
    first = drain_exact(
        spark, str(in_dir), out, ckpt,
        schema=SCHEMA, gap_s=ORPHAN_GAP_S, watermark_delay_s=delay_s,
        drop_late=True, max_files_per_trigger=1,
    )
    assert first["resumed"] is False
    assert first["resume_consumed_orphan"] is False
    for i, rows in enumerate(ORPHAN_FILES[1:], start=1):
        _write_now(str(in_dir / f"f{i}.parquet"), rows, i)
    _inject_orphan_entry(ckpt, str(in_dir / "f1.parquet"))
    report = drain_exact(
        spark, str(in_dir), out, ckpt,
        schema=SCHEMA, gap_s=ORPHAN_GAP_S, watermark_delay_s=delay_s,
        drop_late=True, max_files_per_trigger=1,
    )
    return _sessions(spark, out), report


def test_orphan_resume_detected_and_diff_is_drop_vs_merge(spark, tmp_path):
    control, _ = _orphan_drain(spark, tmp_path, "oc", delay_s=0)
    # control (per-file watermarks): f2's 3000 is late vs 5000, dropped
    assert control == [(7, 1000, 1000, 1), (7, 5000, 5000, 1)]

    got, report = _orphan_arm(spark, tmp_path, "oa", delay_s=0)
    assert report["resumed"] is True
    assert report["resume_consumed_orphan"] is True
    assert report["orphan_source_entries"] == 1
    assert report["drained"] is True
    # the resumed batch ran f1+f2 under f0's watermark (1000), so the
    # borderline 3000 was KEPT and bridged 1000..5000 into ONE session
    # — exactly the documented drop-vs-merge bound: same user, same
    # events, merge instead of drop; nothing else differs
    assert got == [(7, 1000, 5000, 3)]


def test_orphan_band_empty_when_delay_covers_disorder(spark, tmp_path):
    """watermark_delay_s >= the staging disorder (here 2000 s: f2
    arrives one file after a 2000-s-newer event) means NO row is late
    under either arm's watermark — restart parity is exact even
    through the injected orphan, which is still detected."""
    control, _ = _orphan_drain(spark, tmp_path, "mc", delay_s=4000)
    got, report = _orphan_arm(spark, tmp_path, "ma", delay_s=4000)
    assert report["resume_consumed_orphan"] is True
    assert got == control == [(7, 1000, 5000, 3)]


def test_event_sessionize_batching_invariant_when_delay_covers_disorder(
    spark, tmp_path
):
    """Round-15 close rule, the general form: with watermark_delay_s >=
    the staging disorder, the CLOSED-session output of an event-mode
    drain is a pure function of the data — identical across trigger
    sizes (different micro-batch cuts of the same files) and equal to
    the batch-twin sessionization of every session the final watermark
    made unextendable. The pre-r15 eager close failed this on any
    disordered fixture where a straggler bridged a session another
    batch cut had already emitted."""
    from mapreduce_implementation_spark.operators.events import (
        sessionize as batch_sessionize,
    )
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    # disorder: stragglers jump back up to 9000-1150 = 7850 s behind
    # the max ts already staged; delay MUST cover that (Spark itself
    # drops rows older than the PREVIOUS batch's watermark — the
    # two-watermark late-record filtering pinned below — so "no row
    # is ever late" must hold against every per-batch watermark, not
    # just the final one)
    gap, delay = 200, 8000
    files = [
        [(0, 1000, 1), (1, 9000, 2)],
        [(2, 5000, 1), (3, 1150, 1)],
        [(4, 5150, 1), (5, 9100, 2), (6, 1300, 3)],
        [(7, 40_000, 9)],  # watermark advancer
    ]

    outs = []
    for tag, mfpt in (("t1", 1), ("t2", 2), ("tall", None)):
        in_dir = tmp_path / f"{tag}_in"
        in_dir.mkdir()
        for i, rows in enumerate(files):
            _write_now(str(in_dir / f"f{i}.parquet"), rows, i)
        out = str(tmp_path / f"{tag}_out")
        drain_exact(
            spark, str(in_dir), out, str(tmp_path / f"{tag}_ckpt"),
            schema=SCHEMA, gap_s=gap, watermark_delay_s=delay,
            max_files_per_trigger=mfpt,
        )
        outs.append(_sessions(spark, out))
    assert outs[0] == outs[1] == outs[2]

    # batch-twin ground truth: closed = sessions whose last event +
    # gap lies strictly behind the final watermark (max_ts - delay)
    rows = [r for f in files for r in f]
    bdf = spark.createDataFrame(
        [(e, u, t) for e, t, u in rows], "event_id long, user_id long, ts long"
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    sess = (
        batch_sessionize(bdf, gap_s=gap)
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts_s").alias("s"), F.max("ts_s").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    wm = max(t for _, t, _ in rows) - delay
    truth = sorted(
        (r.user_id, r.s, r.e, r.n)
        for r in sess.collect()
        if (r.e + gap) < wm
    )
    assert outs[0] == truth


def test_spark_filters_rows_older_than_previous_batch_watermark(
    spark, tmp_path
):
    """Engine semantics pin (round 15, corrects the r12 'the operator
    does not filter late rows' reading): Spark 4.1's two-watermark
    late-record filtering DROPS an input row older than the PREVIOUS
    batch's watermark before it ever reaches the applyInPandasWithState
    fold — even with drop_late=False. Only rows inside the one-batch
    lag window (between the previous batch's watermark and the current
    one) reach the fold; that lag window is exactly where the r12
    merge-vs-new-session late-row class lives, and drop_late closes it
    by filtering against the CURRENT watermark."""
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    in_dir = tmp_path / "lf_in"
    in_dir.mkdir()
    files = [
        [(0, 9000, 2)],   # b0 runs at wm 0; wm after = 8000
        [(1, 9100, 2)],   # b1 runs at wm 8000 (late-filter for b1: 0)
        [(2, 5000, 1)],   # b2's late-filter = b1's wm = 8000 > 5000
        [(3, 40_000, 9)],
    ]
    for i, rows in enumerate(files):
        _write_now(str(in_dir / f"f{i}.parquet"), rows, i)
    out = str(tmp_path / "lf_out")
    drain_exact(
        spark, str(in_dir), out, str(tmp_path / "lf_ckpt"),
        schema=SCHEMA, gap_s=100, watermark_delay_s=1000,
        max_files_per_trigger=1,
    )
    got = _sessions(spark, out)
    # user 1's row was dropped BY SPARK (no session, not even a
    # merged or late-opened one); user 2's session flushed normally
    assert [r for r in got if r[0] == 1] == []
    assert (2, 9000, 9100, 2) in got


# ---------------------------------------------------------------------------
# Round-16: object-store-safe sentinel/checkpoint lifecycle (verdict
# item 3 + ADVICE r15 items 1-3) — pyarrow.fs routing, checkpoint-
# scoped sentinel sweep, .compact metadata parsing, state-format guard.


def test_drain_exact_spares_foreign_checkpoint_sentinel(spark, tmp_path):
    """ADVICE r15: the success-path sweep must only delete sentinels
    staged for THIS checkpoint. A concurrent drain on a different
    checkpoint may have offsets-logged its own sentinel over the same
    in_dir; deleting that file would wedge the other checkpoint on
    FileNotFound — the exact failure the delete-after-success rule
    exists to prevent."""
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
        write_flush_sentinel,
    )

    in_dir = tmp_path / "fs_in"
    in_dir.mkdir()
    files = [[(0, 1000, 1)], [(1, 6000, 2)]]
    for i, rows in enumerate(files):
        _write_batch(str(in_dir / f"b{i}.parquet"), rows, i)
    # another checkpoint's sentinel (different token), already staged
    foreign = write_flush_sentinel(
        str(in_dir), 6000, token="feedfacecafe"
    )
    out = str(tmp_path / "fs_out")
    drain_exact(
        spark, str(in_dir), out, str(tmp_path / "fs_ckpt"),
        schema=SCHEMA, gap_s=GAP_S,
    )
    remaining = [f for f in os.listdir(in_dir) if "sentinel" in f]
    assert remaining == [os.path.basename(foreign)], (
        "own sentinel swept, the foreign checkpoint's spared"
    )
    # the foreign sentinel is data to THIS drain but the fold discards
    # its reserved key: output is exactly the control's
    assert _sessions(spark, out) == [(1, 1000, 1000, 1)]


def test_drain_exact_over_file_uri_scheme(spark, tmp_path):
    """Round-16 verdict item 3: the sentinel write/list/delete and the
    checkpoint metadata reads route through pyarrow.fs — exercised
    end-to-end on a non-plain-path URI (file://, the
    local-through-fs-interface arm; hdfs://`s3a:// resolve through the
    same FileSystem.from_uri call)."""
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
    )

    in_dir = tmp_path / "uri_in"
    in_dir.mkdir()
    files = [[(0, 1000, 1)], [(1, 6000, 2)]]
    for i, rows in enumerate(files):
        _write_batch(str(in_dir / f"b{i}.parquet"), rows, i)
    out = str(tmp_path / "uri_out")
    report = drain_exact(
        spark,
        f"file://{in_dir}",
        out,
        f"file://{tmp_path / 'uri_ckpt'}",
        schema=SCHEMA,
        gap_s=GAP_S,
    )
    assert report["drained"] is True
    assert _sessions(spark, out) == [(1, 1000, 1000, 1)]
    assert not [f for f in os.listdir(in_dir) if "sentinel" in f]


def test_inspect_resume_state_parses_compact_entries(tmp_path):
    """ADVICE r15 (medium): Spark's CompactibleFileStreamLog writes
    every Nth file-source entry as '<id>.compact' and may clean older
    plain files — the orphan detector must read the compact name's id
    or max(src_ids) understates past the compaction boundary and the
    wobble-class report false-negatives."""
    import json

    from mapreduce_implementation_spark.streaming.sessionize import (
        inspect_resume_state,
    )

    ckpt = tmp_path / "c_ckpt"
    (ckpt / "offsets").mkdir(parents=True)
    (ckpt / "commits").mkdir()
    (ckpt / "sources" / "0").mkdir(parents=True)
    (ckpt / "offsets" / "0").write_text(
        "v1\n"
        + json.dumps({"batchWatermarkMs": 123000}) + "\n"
        + json.dumps({"logOffset": 2}) + "\n"
    )
    (ckpt / "commits" / "0").write_text("v1\n{}")
    # entries 0-8 compacted into 9.compact; plain 0-2 cleaned up
    (ckpt / "sources" / "0" / "9.compact").write_text("v1\n")
    report = inspect_resume_state(str(ckpt))
    assert report["resumed"] is True
    assert report["last_batch_watermark_ms"] == 123000
    assert report["resume_consumed_orphan"] is True
    assert report["orphan_source_entries"] == 7  # 9 - logOffset 2


def test_check_state_format_detects_pre_r15_checkpoint(tmp_path):
    """ADVICE r15: a checkpoint whose recorded state value schema is
    the pre-round-15 SCALAR (start_s, last_s, n_events) triple must
    fail up front with the migration message, not deep inside the
    first micro-batch's state-schema compatibility check."""
    import pytest

    from mapreduce_implementation_spark.streaming.sessionize import (
        check_state_format,
    )

    old = tmp_path / "old_ckpt"
    (old / "state" / "0" / "_metadata").mkdir(parents=True)
    (old / "state" / "0" / "_metadata" / "schema").write_bytes(
        b'v2\n{"type":"struct","fields":[{"name":"user_id","type":"long",'
        b'"nullable":true,"metadata":{}}]}\n'
        b'{"type":"struct","fields":[{"name":"start_s","type":"long",'
        b'"nullable":true,"metadata":{}},{"name":"last_s","type":"long",'
        b'"nullable":true,"metadata":{}},{"name":"n_events","type":"long",'
        b'"nullable":true,"metadata":{}}]}\n'
    )
    with pytest.raises(ValueError, match="pre-round-15"):
        check_state_format(str(old))

    # the current array format passes, as does a fresh checkpoint
    new = tmp_path / "new_ckpt"
    (new / "state" / "0" / "_metadata").mkdir(parents=True)
    (new / "state" / "0" / "_metadata" / "schema").write_bytes(
        b'v2\n{"name":"start_s","type":{"type":"array",'
        b'"elementType":"long","containsNull":true}}\n'
    )
    check_state_format(str(new))
    check_state_format(str(tmp_path / "absent_ckpt"))
