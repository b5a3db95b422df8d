#!/usr/bin/env python
"""Round-12 restart-mismatch bisection (r11 verdict item 6).

The kill-resume rehearsal reproduced the once-observed parity
mismatch at ~1/10 default-provider trials: the INTERRUPTED run
emits FEWER closed sessions than the control. This harness loops
trials, and on the first mismatch PRESERVES both outputs and the
checkpoint, then classifies the difference:

* are the missing rows each affected user's LAST session (the
  event-time-timeout tail flush — a no-data-batch scheduling
  question), or mid-stream sessions (a genuine replay bug)?
* are there any EXTRA rows (sink replay duplication)?
* what batch was in flight when the kill landed (offset vs commit
  log), and did the resumed run execute a trailing no-data batch?

Usage: python diagnose_restart.py [max_trials] [--sorted]
       [--drop-late] [--rocksdb] [--operator funnel]
       [--expiry first-touch]

``--drop-late`` (round-13 verdict item 4): run the operator with
drop_late=True on the AS-STAGED (disordered) corpus — the late-row/
timer race class (a) disappears because late rows never reach the
fold; the trailing-flush class (b) is completed with the
write_flush_sentinel finish step after the resume (round-13 item 6),
so the gate demands EXACT parity on every trial. ``--rocksdb``
switches the state-store provider.

``--operator funnel`` (round-16 verdict items 6+7): the same
kill-resume protocol over the WATERMARK-ORDERED streaming funnel.
Control and resumes both complete through drain_exact with the
funnel's lead sentinel (matured conversions flush only when the
watermark passes every real event), so parity demands the buffered
fold's output be a pure function of the delivered data. The control
step also prices the batch-vs-stream contract divergence (verdict
item 6): funnel_converted_users (fixed first-touch) vs the stream's
greedy-restart set on the same 2M corpus — stream ⊇ batch
structurally; the printed stream_only count IS the retry class.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from mapreduce_implementation_spark import get_spark
from scale_rehearsal import N_MICRO_BATCHES, synth_events

KEEP_DIR = "/tmp/mris_restart_mismatch"


def main() -> None:
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    max_trials = int(nums[0]) if nums else 12
    spark = get_spark(app_name="mris-diagnose-restart")
    spark.sparkContext.setLogLevel("ERROR")
    drop_late = "--drop-late" in sys.argv
    if "--rocksdb" in sys.argv:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    from mapreduce_implementation_spark.streaming.sessionize import (
        drain_exact,
        sessionize_stream,
        write_flush_sentinel,
    )

    # round-14 verdict item 5: rerun the resume-and-finish protocol
    # THROUGH the one-call helper (sentinel staged, drained, removed
    # inside drain_exact) instead of the manual three-step below
    drain_exact_mode = "--drain-exact" in sys.argv
    funnel_mode = "--operator" in sys.argv and "funnel" in sys.argv
    if funnel_mode:
        drain_exact_mode = True  # matured flush needs the lead sentinel

    root = tempfile.mkdtemp(prefix="mris_diag_")
    events_dir = os.path.join(root, "events")
    synth_events(spark, 2_000_000, events_dir)
    n_files = len(
        [f for f in os.listdir(events_dir) if f.endswith(".parquet")]
    )
    per_trigger = str(max(1, n_files // N_MICRO_BATCHES))
    if "--sorted" in sys.argv:
        # the round-12 fix under test: time-sorted input produces no
        # late rows, so parity across restart must be EXACT at every
        # kill point (see run_restart_rehearsal)
        sorted_dir = events_dir + "_tsorted"
        (
            spark.read.parquet(events_dir)
            .repartitionByRange(n_files, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(sorted_dir)
        )
        now = time.time()
        parts = sorted(
            f for f in os.listdir(sorted_dir) if f.endswith(".parquet")
        )
        for j, f in enumerate(parts):
            mt = now - (len(parts) - j) * 30
            os.utime(os.path.join(sorted_dir, f), (mt, mt))
        events_dir = sorted_dir

    SCHEMA = (
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    STEPS = ("view", "click", "purchase")
    if funnel_mode:
        from mapreduce_implementation_spark.streaming.funnel import (
            streaming_funnel,
        )
        from scale_rehearsal import FUNNEL_WITHIN_S

        # round 16: --expiry first-touch sweeps the batch-parity mode
        # (dead-marker state machine) through the same kill-resume gate
        expiry = (
            "first-touch" if "first-touch" in sys.argv else "greedy-restart"
        )

        def query_builder(stream):
            return streaming_funnel(
                stream, STEPS, within_s=FUNNEL_WITHIN_S,
                timeout_mode="event", ordering="watermark",
                expiry=expiry,
            )

        drain_kwargs = {
            "query_builder": query_builder,
            # matured conversions flush only once the watermark passes
            # every real event; the sentinel must survive the funnel's
            # step-type filter (same contract as the drain CLI)
            "sentinel_lead_s": FUNNEL_WITHIN_S + 1,
            "sentinel_extra_cols": {"event_type": STEPS[0]},
        }
        compare_cols = ["user_id", "t0", "t_final"]
    else:
        drain_kwargs = {"gap_s": 150, "drop_late": drop_late}
        compare_cols = [
            "user_id", "session_start_s", "session_end_s", "n_events"
        ]

    def start(ckpt: str, out_dir: str):
        reader = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", per_trigger)
            .parquet(events_dir)
        )
        q = (
            query_builder(reader)
            if funnel_mode
            else sessionize_stream(
                reader, gap_s=150, timeout_mode="event",
                drop_late=drop_late,
            )
        )
        return (
            q.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def batch_ids(ckpt: str, log: str) -> list[int]:
        d = os.path.join(ckpt, log)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f) for f in os.listdir(d) if f.isdigit()
        )

    # control once. Funnel mode: through drain_exact (the lead
    # sentinel flushes every matured conversion — a plain availableNow
    # run leaves the final delay window un-matured); sessionize keeps
    # the historical plain-drain control.
    out_c = os.path.join(root, "out_c")
    if funnel_mode:
        drain_exact(
            spark, events_dir, out_c, os.path.join(root, "ckpt_c"),
            schema=SCHEMA, max_files_per_trigger=int(per_trigger),
            **drain_kwargs,
        )
    else:
        q = start(os.path.join(root, "ckpt_c"), out_c)
        q.awaitTermination()
    control = spark.read.parquet(out_c)
    n_c = control.count()
    print(json.dumps({"control_rows": n_c}), flush=True)
    if funnel_mode:
        # verdict item 6: price the batch-vs-stream contract divergence
        # on this corpus — fixed first-touch vs greedy-restart
        from mapreduce_implementation_spark.operators.events import (
            funnel_converted_users,
        )
        from scale_rehearsal import FUNNEL_WITHIN_S as _W

        all_ev = spark.read.parquet(events_dir)
        # the DELIVERED set: the engine's pre-fold late filter drops
        # rows with event-time <= the previous batch's watermark, and
        # the initial watermark is 0 — so an event at exactly epoch 0
        # is permanently undeliverable to the watermarked fold (found
        # by this very harness in round 16: 1 of 9202 batch
        # conversions hinged on a ts=0 chain-seeding view). The
        # stream-superset structure holds on delivered data; compare
        # there and report the undeliverable class separately.
        delivered = all_ev.where(F.col("ts").cast("long") > 0)
        batch_set = funnel_converted_users(
            delivered, STEPS, _W
        ).select("user_id")
        batch_raw = funnel_converted_users(
            all_ev, STEPS, _W
        ).select("user_id")
        stream_set = control.select("user_id")
        print(
            json.dumps(
                {
                    "batch_conversions_delivered": batch_set.count(),
                    "batch_conversions_raw": batch_raw.count(),
                    "undeliverable_epoch0_events": all_ev.where(
                        F.col("ts").cast("long") == 0
                    ).count(),
                    "stream_conversions": n_c,
                    "stream_only_retry_class": stream_set.exceptAll(
                        batch_set
                    ).count(),
                    "batch_only_must_be_zero": batch_set.exceptAll(
                        stream_set
                    ).count(),
                }
            ),
            flush=True,
        )

    # sweep the kill point: the two historical mismatches were cold
    # first runs where the stop() plausibly landed LATE — near the
    # trailing no-data batch that flushes the event-time timers — so
    # probe that region, not just mid-drain
    targets = [N_MICRO_BATCHES // 2, 6, 7, 8]
    for trial in range(max_trials):
        ckpt_i = os.path.join(root, f"ckpt_i{trial}")
        out_i = os.path.join(root, f"out_i{trial}")
        q = start(ckpt_i, out_i)
        target = targets[trial % len(targets)]
        while q.isActive:
            p = q.lastProgress
            if p is not None and p.get("batchId", -1) >= target:
                break
            time.sleep(0.05)
        q.stop()
        offsets_before = batch_ids(ckpt_i, "offsets")
        commits_before = batch_ids(ckpt_i, "commits")
        if drain_exact_mode:
            resume_report = drain_exact(
                spark, events_dir, out_i, ckpt_i,
                schema=SCHEMA,
                max_files_per_trigger=int(per_trigger),
                **drain_kwargs,
            )
            offsets_after = batch_ids(ckpt_i, "offsets")
            commits_after = batch_ids(ckpt_i, "commits")
            leftover = [
                f for f in os.listdir(events_dir) if "sentinel" in f
            ]
            assert not leftover, f"sentinel not cleaned: {leftover}"
            got = spark.read.parquet(out_i)
            n_i = got.count()
            row = {
                "trial": trial,
                "kill_target": target,
                "rows": n_i,
                "rows_match": bool(n_i == n_c),
                "kill_offsets": offsets_before,
                "kill_commits": commits_before,
                "final_offsets": offsets_after,
                "final_commits": commits_after,
                "via": "drain_exact",
                # r15: the resume-state report — a wobble-class
                # mismatch should coincide with resume_consumed_orphan
                "resume_report": resume_report,
            }
            print(json.dumps(row), flush=True)
            if n_i != n_c:
                missing = control.select(compare_cols).exceptAll(
                    got.select(compare_cols)
                )
                extra = got.select(compare_cols).exceptAll(
                    control.select(compare_cols)
                )
                print(
                    json.dumps(
                        {
                            "missing_rows": missing.count(),
                            "extra_rows": extra.count(),
                        }
                    ),
                    flush=True,
                )
                print("MISMATCH (drain_exact mode)", flush=True)
                break
            continue
        q = start(ckpt_i, out_i)
        q.awaitTermination()
        if drop_late:
            # resume-and-FINISH (round-13 item 6): the kill may have
            # landed inside the trailing-flush window, stranding tails
            # in state; the sentinel re-advances the watermark to the
            # control's final value and a last drain emits them
            max_ts = int(
                spark.read.parquet(events_dir)
                .agg(F.max(F.col("ts").cast("long")))
                .first()[0]
            )
            sentinel = write_flush_sentinel(events_dir, max_ts)
            q = start(ckpt_i, out_i)
            q.awaitTermination()
            os.remove(sentinel)
        offsets_after = batch_ids(ckpt_i, "offsets")
        commits_after = batch_ids(ckpt_i, "commits")
        got = spark.read.parquet(out_i)
        n_i = got.count()
        row = {
            "trial": trial,
            "kill_target": target,
            "rows": n_i,
            "rows_match": bool(n_i == n_c),
            "kill_offsets": offsets_before,
            "kill_commits": commits_before,
            "final_offsets": offsets_after,
            "final_commits": commits_after,
        }
        if n_i != n_c:
            # classify the diff
            cols = ["user_id", "session_start_s", "session_end_s", "n_events"]
            missing = control.select(cols).exceptAll(got.select(cols))
            extra = got.select(cols).exceptAll(control.select(cols))
            last_per_user = control.groupBy("user_id").agg(
                F.max("session_end_s").alias("last_end")
            )
            missing_last = (
                missing.join(
                    last_per_user,
                    (missing.user_id == last_per_user.user_id)
                    & (missing.session_end_s == last_per_user.last_end),
                )
                .count()
            )
            row.update(
                {
                    "missing_rows": missing.count(),
                    "extra_rows": extra.count(),
                    "missing_that_are_user_last_session": missing_last,
                }
            )
            os.makedirs(KEEP_DIR, exist_ok=True)
            shutil.copytree(
                ckpt_i, os.path.join(KEEP_DIR, "ckpt"), dirs_exist_ok=True
            )
            shutil.copytree(
                out_i, os.path.join(KEEP_DIR, "out_i"), dirs_exist_ok=True
            )
            shutil.copytree(
                out_c, os.path.join(KEEP_DIR, "out_c"), dirs_exist_ok=True
            )
            print(json.dumps(row), flush=True)
            print(f"MISMATCH preserved at {KEEP_DIR}", flush=True)
            break
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
