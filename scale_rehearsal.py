#!/usr/bin/env python
"""Scale rehearsal — measured scaling curves for the dedup/pipeline
operators on a synthetic Zipfian near-dup corpus (round-8 verdict item
1: convert the repo's 100 TB claims from prose to data).

Corpus model (all Spark-side expression generation, no driver loop):

* ``frac_clustered`` of the docs belong to near-dup CLUSTERS whose
  sizes follow the floor(1/u) law (P[cluster c] ~ 1/(c(c+1)) — a
  Zipf-like heavy tail): cluster 1 alone holds ~15% of the corpus, the
  boilerplate-cohort regime the miners' ``max_bucket`` default exists
  for; mid-tail clusters (tens to ~1500 members) survive the cap and
  exercise pair mining + connected components; the rest are
  singletons.
* A cluster member shares its cluster's ``words``-word base text and
  appends an 8-word member-unique tail → Jaccard ~0.8-0.9 vs cluster
  mates (near-dup, never exact-dup).
* ``lang`` = 20 uniform strata for stratified_fixed_n.

Operators measured per size, PRODUCTION DEFAULTS (the finite
DEFAULT_MAX_BUCKET cap — the shape a 100 TB caller on defaults gets),
noop-sink materialization, one cold run each (scaling curves, not
micro-benchmarks; host noise is bounded by the calibration probe):

* minhash_near_dup_pairs   (signature chain + banded join + verify)
* duplicate_span_stats     (20-gram explode + partial-agg holder count)
* stratified_fixed_n       (two-phase top-N, N=1000 over 20 strata)
* corpus_build_near_dup    (quality gate -> exact dedup -> MinHash ->
                            CC -> cluster-min anti-join -> split)

Usage:  python scale_rehearsal.py [sizes...]   (default 250k 1M 4M)
Prints one JSON line per size plus a final summary JSON with per-op
log-log scaling exponents between consecutive sizes.

Round 9 adds the VECTORS rehearsal (``--vectors [sizes...]``): the
similarity/semantic family over synthetic embeddings with the same
Zipf near-dup cluster law (member = cluster base + 0.15x unique
noise, dim 64):

* ivf_build            (k=64 Lloyd x2 + materialized assignment)
* ivf_probe            (32 queries, nprobe=4 -> reads ~1/16 of index)
* brute_force_topk     (same 32 queries — the exact baseline IVF
                        must beat, and the honest crossover evidence)
* srp_near_dup_pairs   (P ~ log2(N/64) hyperplanes, default
                        max_bucket — the corpus-scale semantic-dedup
                        path; semantic_dedup's k-means assignment is
                        O(N*k*d), so ITS curve is bounded by
                        ivf_build at fixed k — measured here — while
                        the pair screen scales as this miner)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from mapreduce_implementation_spark import get_spark

WORDS = 60
VOCAB = 30_000
FRAC_CLUSTERED = 0.3
N_STRATA = 20


def synth_corpus(spark, n_docs: int, out_dir: str, n_files: int = 64) -> float:
    """Generate and write the corpus; returns generation wall-time."""
    t0 = time.perf_counter()
    h = F.abs(F.xxhash64(F.col("doc_id"), F.lit("scatter")))
    u = ((h % 1_000_000) + 1) / 1_000_000.0  # uniform (0, 1]
    is_clustered = (h % 10) < int(FRAC_CLUSTERED * 10)
    cluster = F.floor(1.0 / u).cast("long")
    # singleton docs seed their base from the doc id, far above any
    # cluster id so bases never collide
    base_seed = F.when(is_clustered, cluster).otherwise(
        F.col("doc_id") + F.lit(1_000_000_000_000)
    )
    base = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(WORDS - 1)),
            lambda j: F.concat(
                F.lit("w"), (F.abs(F.xxhash64(base_seed, j)) % VOCAB)
            ),
        ),
    )
    tail = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: F.concat(F.lit("u"), F.col("doc_id"), F.lit("x"), j),
        ),
    )
    df = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.concat(base, F.lit(" "), tail).alias("text"),
            F.concat(F.lit("l"), F.col("doc_id") % N_STRATA).alias("lang"),
        )
    )
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return time.perf_counter() - t0


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def run_ops(spark, docs_dir: str) -> dict[str, float]:
    from mapreduce_implementation_spark.operators.contamination import (
        duplicate_span_stats,
    )
    from mapreduce_implementation_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from mapreduce_implementation_spark.operators.pipeline import (
        CorpusPipelineConfig,
        build_training_corpus,
    )
    from mapreduce_implementation_spark.operators.sampling import (
        stratified_fixed_n,
    )

    docs = spark.read.parquet(docs_dir)
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    materialize(minhash_near_dup_pairs(docs, "doc_id", "text"))
    out["minhash_near_dup_pairs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    materialize(duplicate_span_stats(docs, n=20))
    out["duplicate_span_stats"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    materialize(stratified_fixed_n(docs, "lang", 1000))
    out["stratified_fixed_n"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    art = build_training_corpus(
        docs,
        CorpusPipelineConfig(split_weights={"train": 1.0}, near_dup=True),
    )
    materialize(art["split_train"].select("doc_id"))
    out["corpus_build_near_dup"] = round(time.perf_counter() - t0, 2)
    return out


DIM = 64
NOISE = 0.15  # mate cosine ~0.98; non-mates ~0 +- 1/sqrt(DIM)
N_ANN_QUERIES = 8
ANN_K = 10
IVF_K = 64
IVF_NPROBE = 4
IVF_TRAIN_SAMPLE = 100_000  # bounded quantizer-training sample


def synth_vectors(spark, n_vecs: int, out_dir: str, n_files: int = 64) -> float:
    """Embeddings with the same Zipf near-dup cluster law as the text
    corpus: member = cluster base + NOISE x member-unique perturbation,
    componentwise from xxhash64 (all expression-side)."""
    t0 = time.perf_counter()
    h = F.abs(F.xxhash64(F.col("vec_id"), F.lit("vscatter")))
    u = ((h % 1_000_000) + 1) / 1_000_000.0
    is_clustered = (h % 10) < int(FRAC_CLUSTERED * 10)
    cluster = F.floor(1.0 / u).cast("long")
    base_seed = F.when(is_clustered, cluster).otherwise(
        F.col("vec_id") + F.lit(1_000_000_000_000)
    )

    def comp(seed, tag, j):
        return (
            (F.xxhash64(seed, F.lit(tag), j) % 1_000_001) / 1_000_000.0
        )  # in (-1, 1)

    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            comp(base_seed, "b", j) + F.lit(NOISE) * comp(F.col("vec_id"), "n", j)
        ).cast("float"),
    )
    df = (
        spark.range(n_vecs)
        .withColumnRenamed("id", "vec_id")
        .select("vec_id", emb.alias("embedding"))
    )
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return time.perf_counter() - t0


def run_vector_ops(spark, vec_dir: str) -> dict[str, float]:
    import random

    from mapreduce_implementation_spark.operators import similarity as sim
    from mapreduce_implementation_spark.operators.semantic import (
        srp_near_dup_pairs,
    )
    from mapreduce_implementation_spark.sources.materialize import ensure_table

    vecs = spark.read.parquet(vec_dir)
    n = vecs.count()
    queries = vecs.where(F.col("vec_id") < N_ANN_QUERIES)
    out: dict[str, float] = {}

    idx_root = tempfile.mkdtemp(prefix="mris_vec_idx_")
    try:
        t0 = time.perf_counter()
        # round-11: quantizer trained on a bounded deterministic
        # sample (the FAISS-style practice) — the flat full-corpus
        # Lloyd was the biggest number on this curve (77-144 s at
        # 800k, exponent ~1.07); probe recall parity is pinned in
        # tests/test_similarity.py::test_sampled_training_probe_recall_parity
        cents = sim.train_centroids(
            vecs, k=IVF_K, iters=2, sample_n=IVF_TRAIN_SAMPLE
        )
        index_path = os.path.join(idx_root, "index")
        ensure_table(
            spark,
            index_path,
            lambda: sim.assign_inverted_lists(
                vecs, cents, 1, keep_cols=("embedding",)
            ),
            partition_cols=("centroid_id",),
        )
        out["ivf_build"] = round(time.perf_counter() - t0, 2)

        def timed(build, runs: int = 2) -> float:
            """min-of-N: the first run pays plan/codegen warmup, which
            otherwise swamps the cross-size exponent on a noisy host."""
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                materialize(build())
                best = min(best, time.perf_counter() - t0)
            return round(best, 2)

        out["ivf_probe"] = timed(
            lambda: sim.ivf_topk_from_index(
                spark, index_path, queries, cents, k=ANN_K, nprobe=IVF_NPROBE
            )
        )
        out["brute_force_topk"] = timed(
            lambda: sim.brute_force_topk(vecs, queries, k=ANN_K)
        )

        # P ~ log2(N / 64): expected bucket ~64 members; planes are
        # deterministic driver-side pseudo-random hyperplanes.
        n_planes = max(4, int(math.log2(max(n, 128) / 64)))
        rnd = random.Random(42)
        planes = spark.createDataFrame(
            [
                (p, [rnd.uniform(-1.0, 1.0) for _ in range(DIM)])
                for p in range(n_planes)
            ],
            "plane_id int, plane_emb array<double>",
        )
        out["srp_near_dup_pairs"] = timed(
            lambda: srp_near_dup_pairs(vecs, planes, threshold=0.8)
        )
        out["srp_planes"] = n_planes

        # semantic_dedup END TO END through the two-level assignment
        # path (round-9 verdict item 2: the ingredients were on the
        # curve, the composed operator was not). k ~ N/1000 — the
        # SemDeDup corpus-scale regime — as a k1 x k2 hierarchy;
        # max_cluster=1000 production default, exemption telemetry on.
        from pyspark.sql import Observation

        from mapreduce_implementation_spark.caching import release_caches
        from mapreduce_implementation_spark.operators.semantic import (
            semantic_dedup,
        )

        k_sem = max(16, n // 1000)
        k_side = max(4, int(math.ceil(math.sqrt(k_sem))))
        t0 = time.perf_counter()
        coarse, fine = sim.train_two_level_centroids(
            vecs, k_coarse=k_side, k_fine=k_side, iters=2,
            sample_n=IVF_TRAIN_SAMPLE,
        )
        out["semantic_hier_build"] = round(time.perf_counter() - t0, 2)
        obs = Observation(f"exempt_{n}")
        t0 = time.perf_counter()
        assignment = sim.assign_two_level(
            vecs, coarse, fine, keep_cols=("embedding",)
        )
        materialize(
            semantic_dedup(
                vecs,
                assignment=assignment,
                threshold=0.9,
                max_cluster=1000,
                exemption_observation=obs,
            )
        )
        out["semantic_dedup_e2e"] = round(time.perf_counter() - t0, 2)
        got = obs.get
        # slice default (round-11): the oversized mass is MINED with
        # the slice-restricted candidate set — exempted_rows must be 0
        out["semantic_exempted_rows"] = int(got["exempted_rows"])
        out["semantic_exempted_clusters"] = int(got["exempted_clusters"])
        out["semantic_sliced_rows"] = int(got["sliced_rows"])
        out["semantic_sliced_clusters"] = int(got["sliced_clusters"])
        out["semantic_k"] = k_side * k_side
        release_caches()
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)
    return out


N_MICRO_BATCHES = 8
EVENTS_PER_USER = 50
SESSION_GAP_S = 1800
FUNNEL_WITHIN_S = 1800


def synth_events(spark, n_events: int, out_dir: str) -> float:
    """Event stream with SIZE-INDEPENDENT per-user temporal structure:
    n/EVENTS_PER_USER users, each emitting its k-th event at
    ``k*300 + jitter(0..600)`` seconds — so session/funnel state shape
    (events per user, inter-event gaps, window occupancy) is constant
    across sizes and the measured curve isolates THROUGHPUT scaling.
    Staged as N_MICRO_BATCHES mtime-ordered parquet files split on k
    (coarsely time-ordered; the jitter overlap is covered by the
    operators' watermark delay)."""
    t0 = time.perf_counter()
    n_users = max(1, n_events // EVENTS_PER_USER)
    u = F.col("event_id") % n_users
    k = (F.col("event_id") / n_users).cast("long")
    h = F.abs(F.xxhash64("event_id", F.lit("ev")))
    ts_s = k * 300 + (h % 600)
    etype = (
        F.when(h % 10 < 6, "view")
        .when(h % 10 < 9, "click")
        .otherwise("purchase")
    )
    df = (
        spark.range(n_events)
        .withColumnRenamed("id", "event_id")
        .select(
            "event_id",
            u.alias("user_id"),
            k.alias("_k"),
            ts_s.cast("timestamp").alias("ts"),
            etype.alias("event_type"),
            ((h % 1000) / 10.0).alias("value"),
        )
    )
    os.makedirs(out_dir, exist_ok=True)
    per = max(1, EVENTS_PER_USER // N_MICRO_BATCHES)
    now = time.time()
    for b in range(N_MICRO_BATCHES):
        lo, hi = b * per, (b + 1) * per if b < N_MICRO_BATCHES - 1 else 10**9
        part = df.where((F.col("_k") >= lo) & (F.col("_k") < hi)).drop("_k")
        tmp = os.path.join(out_dir, f"_tmp{b}")
        part.coalesce(4).write.mode("overwrite").parquet(tmp)
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(tmp, "*.parquet")))
        for j, fp in enumerate(files):
            dest = os.path.join(out_dir, f"b{b:02d}_{j}.parquet")
            shutil.move(fp, dest)
            mtime = now - (N_MICRO_BATCHES - b) * 30
            os.utime(dest, (mtime, mtime))
        shutil.rmtree(tmp, ignore_errors=True)
    return time.perf_counter() - t0


def run_streaming_ops(spark, events_dir: str) -> dict[str, float]:
    """Drain each stateful operator over the staged stream with
    Trigger.AvailableNow into a noop sink; report wall seconds and the
    peak state rows the engine held (the bounded-state evidence)."""
    from mapreduce_implementation_spark.streaming.funnel import (
        streaming_funnel,
    )
    from mapreduce_implementation_spark.streaming.queries import (
        streaming_dedup_within_watermark,
        streaming_windowed_counts,
    )
    from mapreduce_implementation_spark.streaming.sessionize import (
        sessionize_stream,
    )

    def read():
        return (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", str(max(1, len(os.listdir(events_dir)) // N_MICRO_BATCHES)))
            .parquet(events_dir)
        )

    ops = {
        "windowed_counts": lambda: streaming_windowed_counts(
            read(), "5 minutes", "10 minutes"
        ),
        "sessionize_event": lambda: sessionize_stream(
            read(), gap_s=SESSION_GAP_S, timeout_mode="event"
        ),
        "dedup_within_wm": lambda: streaming_dedup_within_watermark(
            read().withColumn(
                "dk", F.concat_ws(":", "user_id", "event_id")
            ),
            text_col="dk",
            ts_col="ts",
            watermark="10 minutes",
        ),
        "funnel_event": lambda: streaming_funnel(
            read(),
            ("view", "click", "purchase"),
            FUNNEL_WITHIN_S,
            timeout_mode="event",
        ),
        # round 15: the watermark-ordered (buffered, order-insensitive)
        # funnel — same data, same steps; peak state additionally holds
        # the not-yet-matured event buffers (bounded by the per-user
        # event count inside one watermark-delay window)
        "funnel_event_wm": lambda: streaming_funnel(
            read(),
            ("view", "click", "purchase"),
            FUNNEL_WITHIN_S,
            timeout_mode="event",
            ordering="watermark",
        ),
        # round 16: the batch-parity expiry — prices the dead-marker
        # state bound (one permanent row per user whose first attempt
        # failed) against the default greedy-restart arm above
        "funnel_event_ft": lambda: streaming_funnel(
            read(),
            ("view", "click", "purchase"),
            FUNNEL_WITHIN_S,
            timeout_mode="event",
            ordering="watermark",
            expiry="first-touch",
        ),
    }
    out: dict[str, float] = {}
    for name, build in ops.items():
        ckpt = tempfile.mkdtemp(prefix=f"mris_ckpt_{name}_")
        try:
            t0 = time.perf_counter()
            q = (
                build()
                .writeStream.format("noop")
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
            out[name] = round(time.perf_counter() - t0, 2)
            peak = 0
            for p in q.recentProgress:
                for so in p.get("stateOperators", []):
                    peak = max(peak, so.get("numRowsTotal", 0))
            out[f"{name}_peak_state"] = peak
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
    return out


def run_restart_rehearsal(spark, events_dir: str) -> dict[str, float]:
    """Kill-and-resume (round-10 verdict item 8): sessionize the staged
    stream into a parquet sink, STOP the query mid-drain, restart from
    the same checkpoint, and measure what the idempotent-sink tests
    assert but never timed — (a) restore wall (restart → first batch
    committed), (b) interrupted-total vs uninterrupted-control wall,
    and (c) output parity (row count + order-insensitive xxhash64
    digest of the closed sessions). Run with/without --rocksdb for the
    two state-store providers. The deterministic correctness twin is
    tests/test_streaming_restart.py; this is the wall-clock number.

    gap_s here is 150, NOT the suite's 1800: the staged corpus's
    inter-event gap law is 300±600 s, so at 1800 every user is one
    never-closable session (zero output — parity would be vacuous);
    at 150 ~70% of consecutive events close a session, so the digest
    compares ~millions of rows across the restart boundary."""
    from mapreduce_implementation_spark.streaming.sessionize import (
        sessionize_stream,
    )

    restart_gap_s = 150

    n_files = len(
        [f for f in os.listdir(events_dir) if f.endswith(".parquet")]
    )
    per_trigger = str(max(1, n_files // N_MICRO_BATCHES))

    # Round-12 root cause of the once-observed (then 1-in-10
    # reproduced) parity mismatch: the staged corpus is only COARSELY
    # time-ordered, so batches contain late-beyond-watermark events,
    # and a late event's session is a race between it and the
    # event-time timer — decided by the watermark trajectory, which a
    # restart legitimately CHANGES (diagnosed from the offsets logs:
    # the resumed availableNow run packed two file groups into its
    # first batch, logOffset 4→6, advancing the watermark on a
    # different schedule; the interrupted run then MERGED two events
    # 33 s apart that the control had split — the interrupted output
    # was the more faithful one). Exactly-once machinery (state
    # restore, sink manifest, batch replay) was clean in every trial.
    # Restart parity is therefore only GUARANTEED for never-late
    # data, so the gate drains a TIME-SORTED copy — sorted input can
    # produce no late rows, flush timing can no longer change session
    # content, and any future mismatch is a real exactly-once bug,
    # not the bounded-disorder contract. BASELINE.md round 12.
    sorted_dir = events_dir.rstrip("/") + "_tsorted"
    if not os.path.isdir(sorted_dir):
        ev = spark.read.parquet(events_dir)
        (
            ev.repartitionByRange(n_files, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(sorted_dir)
        )
        # FileStreamSource orders by (mtime, path): stamp ascending
        # mtimes in part order so batch k holds older events than k+1
        now = time.time()
        parts = sorted(
            f for f in os.listdir(sorted_dir) if f.endswith(".parquet")
        )
        for j, f in enumerate(parts):
            mt = now - (len(parts) - j) * 30
            os.utime(os.path.join(sorted_dir, f), (mt, mt))
    events_dir = sorted_dir

    def start(ckpt: str, out_dir: str):
        return (
            sessionize_stream(
                spark.readStream.schema(
                    "event_id long, user_id long, ts timestamp, "
                    "event_type string, value double"
                )
                .option("maxFilesPerTrigger", per_trigger)
                .parquet(events_dir),
                gap_s=restart_gap_s,
                timeout_mode="event",
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def digest(out_dir: str) -> tuple[int, int]:
        df = spark.read.parquet(out_dir)
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                # decimal accumulator: a long sum of millions of
                # xxhash64 values overflows int64 under ANSI mode
                F.sum(
                    F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    out: dict[str, float] = {}
    root = tempfile.mkdtemp(prefix="mris_restart_")
    try:
        # control: uninterrupted drain
        t0 = time.perf_counter()
        q = start(os.path.join(root, "ckpt_c"), os.path.join(root, "out_c"))
        q.awaitTermination()
        out["control_wall"] = round(time.perf_counter() - t0, 2)
        n_c, h_c = digest(os.path.join(root, "out_c"))

        # interrupted: stop after ~half the micro-batches. q.stop() is
        # a mid-drain abort — the in-flight batch is abandoned and NOT
        # committed; recovery replays it from the checkpoint, which is
        # the same path a crash takes.
        ckpt_i = os.path.join(root, "ckpt_i")
        out_i = os.path.join(root, "out_i")
        t0 = time.perf_counter()
        q = start(ckpt_i, out_i)
        target = N_MICRO_BATCHES // 2
        while q.isActive:
            p = q.lastProgress
            if p is not None and p.get("batchId", -1) >= target:
                break
            time.sleep(0.1)
        out["killed_while_active"] = bool(q.isActive)
        q.stop()
        out["first_leg_wall"] = round(time.perf_counter() - t0, 2)
        # attribution for any parity finding: which batch the kill
        # actually landed after (stop() latency can overshoot the
        # polled target on a fast drain) — a kill in the one-batch
        # window between the last data commit and the trailing
        # no-data commit leaves pending tails in state BY CONTRACT
        # (sessionize_stream docstring; BASELINE.md round 12)
        commits_dir = os.path.join(ckpt_i, "commits")
        out["kill_after_commit"] = max(
            (int(f) for f in os.listdir(commits_dir) if f.isdigit()),
            default=-1,
        )

        t0 = time.perf_counter()
        q = start(ckpt_i, out_i)
        while q.isActive and q.lastProgress is None:
            time.sleep(0.05)
        # restore wall: restart() -> first post-restore progress event
        # (offset-log read + state-store reload + first batch)
        out["restore_first_batch_wall"] = round(time.perf_counter() - t0, 2)
        q.awaitTermination()
        out["resume_wall"] = round(time.perf_counter() - t0, 2)
        n_i, h_i = digest(out_i)
        out["rows_match"] = bool(n_c == n_i)
        out["digest_match"] = bool(h_c == h_i)
        out["closed_sessions"] = n_c
        out["closed_sessions_interrupted"] = n_i
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def synth_leaves(spark, n_leaves: int, out_dir: str) -> float:
    """Many-leaf hive-partitioned fixture for the compactor-listing
    A/B: ``n_leaves`` ``batch_id=N`` directories x 2 data files each,
    hardlinked from one template parquet so fixture creation is
    filesystem metadata work, not 2*n_leaves Spark write tasks."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    os.makedirs(out_dir, exist_ok=True)
    # several rotating templates: ext4 caps hardlinks per inode at
    # ~65k, so one template tops out below 33k two-file leaves
    n_templates = max(1, (2 * n_leaves) // 30_000 + 1)
    templates = []
    for t in range(n_templates):
        template = os.path.join(out_dir, f"_template{t}.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame({"doc_id": [1, 2], "v": [0.5, 1.5]})
            ),
            template,
        )
        templates.append(template)
    for i in range(n_leaves):
        leaf = os.path.join(out_dir, f"batch_id={i}")
        template = templates[i % n_templates]
        os.makedirs(leaf, exist_ok=True)
        os.link(template, os.path.join(leaf, "part-0000.parquet"))
        os.link(template, os.path.join(leaf, "part-0001.parquet"))
    for template in templates:
        os.remove(template)  # underscore-prefixed; keep the root clean
    return time.perf_counter() - t0


def run_listing_ab(spark, data_dir: str) -> dict[str, float]:
    """Round-11 verdict item 4 (the unmeasured half of round-10 item
    5): the compactor's paged listStatusIterator walk vs the old
    ``DataFrame.inputFiles()`` form at many leaves — wall time and
    PYTHON-SIDE retained bytes (the old form ships and retains every
    file path in the driver's Python heap; the paged walk retains one
    int per leaf; JVM-side, the old form additionally materializes an
    InMemoryFileIndex over every FileStatus while the walk holds one
    listing page)."""
    from mapreduce_implementation_spark.sources.sinks import (
        distributed_leaf_counts,
        paged_leaf_counts,
    )

    out: dict[str, float] = {}
    walls: dict[str, list[float]] = {
        "paged_walk": [],
        "distributed": [],
        "input_files": [],
    }
    for _ in range(2):
        t0 = time.perf_counter()
        counts = paged_leaf_counts(spark, data_dir, ["batch_id"])
        walls["paged_walk"].append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        dcounts = distributed_leaf_counts(spark, data_dir, ["batch_id"])
        walls["distributed"].append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        files = spark.read.parquet(data_dir).inputFiles()
        walls["input_files"].append(round(time.perf_counter() - t0, 2))
    assert counts == dcounts, "paged vs distributed listing mismatch"
    assert sum(counts.values()) == len(files), (
        sum(counts.values()),
        len(files),
    )
    out["paged_walk_sec"] = min(walls["paged_walk"])
    out["distributed_sec"] = min(walls["distributed"])
    out["input_files_sec"] = min(walls["input_files"])
    out["walls"] = walls  # type: ignore[assignment]
    out["n_leaves"] = len(counts)
    out["n_files"] = sum(counts.values())
    out["paged_retained_bytes"] = sys.getsizeof(counts) + sum(
        sys.getsizeof(k) + sys.getsizeof(v) for k, v in counts.items()
    )
    out["input_files_retained_bytes"] = sys.getsizeof(files) + sum(
        sys.getsizeof(f) for f in files
    )
    return out


def run_spans_only(spark, docs_dir: str) -> dict[str, float]:
    """Round-15 verdict item 2: re-measure the duplicate_span_stats
    wall alone (the operator the r14 octave flagged as the largest
    absolute 8M wall, 707 s, measured on the STRING span kernel) now
    that ``span_impl="tokhash"`` is the default — fresh same-binary
    points for the exponent re-fit, one cold run per size per the
    rehearsal protocol. Run with stderr captured: the r14 8M string
    run emitted JVM GCLocker allocation warnings during the 20-gram
    explode; whether they are gone under tokhash is part of the
    verdict's done-criterion (grep the driver stderr for GCLocker)."""
    from mapreduce_implementation_spark.operators.contamination import (
        duplicate_span_stats,
    )

    docs = spark.read.parquet(docs_dir)
    out: dict[str, float] = {}
    t0 = time.perf_counter()
    materialize(duplicate_span_stats(docs, n=20))
    out["duplicate_span_stats"] = round(time.perf_counter() - t0, 2)
    return out


def run_observe_cost(spark, docs_dir: str) -> dict[str, float]:
    """Measure the observe-telemetry zero-cost claim (round-9 verdict
    item 7): drain the SAME staged document stream through
    start_ingest_dedup_stream with the default corpus-health
    observation ON vs OFF and report both walls. CollectMetrics rides
    the existing micro-batch action, so the delta should be host
    noise."""
    from mapreduce_implementation_spark.operators.dedup import (
        minhash_signatures,
    )
    from mapreduce_implementation_spark.streaming.pipeline import (
        start_ingest_dedup_stream,
    )

    ref_path = os.path.join(tempfile.mkdtemp(prefix="mris_obs_"), "sigs")
    docs = spark.read.parquet(docs_dir)
    minhash_signatures(docs, "doc_id", "text", shingle_n=3, k=16).write.parquet(
        ref_path
    )
    n_files = len(
        [f for f in os.listdir(docs_dir) if f.endswith(".parquet")]
    )
    out: dict[str, float] = {}
    best: dict[str, float] = {}
    # INTERLEAVED on/off/on/off so host drift hits both arms equally
    for _ in range(2):
        for tag, observe_name in (
            ("observe_on", "ingest_quality"),
            ("observe_off", None),
        ):
            ckpt = tempfile.mkdtemp(prefix="mris_obs_ckpt_")
            flags_dir = tempfile.mkdtemp(prefix="mris_obs_flags_")
            try:
                stream = (
                    spark.readStream.schema(docs.schema)
                    .option(
                        "maxFilesPerTrigger", str(max(1, n_files // 8))
                    )
                    .parquet(docs_dir)
                )
                t0 = time.perf_counter()
                q = start_ingest_dedup_stream(
                    stream,
                    ref_path,
                    flags_dir,
                    ckpt,
                    observe_name=observe_name,
                )
                q.awaitTermination()
                best[tag] = min(
                    best.get(tag, float("inf")),
                    time.perf_counter() - t0,
                )
            finally:
                shutil.rmtree(ckpt, ignore_errors=True)
                shutil.rmtree(flags_dir, ignore_errors=True)
    out.update({k: round(v, 2) for k, v in best.items()})
    shutil.rmtree(os.path.dirname(ref_path), ignore_errors=True)
    return out


def run_ingest_ref_ab(spark, docs_dir: str) -> dict[str, float]:
    """Micro-batch latency A/B for the committed reference layout
    (round-9 verdict item 4): drain the SAME staged document stream
    through start_ingest_dedup_stream against (a) the plain parquet
    signature table (re-banded and re-shuffled every batch) and (b)
    the bucketed banded catalog table (committed side read in place,
    zero exchanges per batch)."""
    from mapreduce_implementation_spark.operators.dedup import (
        minhash_signatures,
    )
    from mapreduce_implementation_spark.streaming.pipeline import (
        commit_minhash_reference,
        start_ingest_dedup_stream,
    )

    root = tempfile.mkdtemp(prefix="mris_refab_")
    ref_path = os.path.join(root, "sigs")
    docs = spark.read.parquet(docs_dir)
    sigs = minhash_signatures(docs, "doc_id", "text", shingle_n=3, k=16)
    sigs.write.parquet(ref_path)
    commit_minhash_reference(
        spark.read.parquet(ref_path),
        "t_refab_bands",
        os.path.join(root, "bands"),
        bands=4,
        rows=4,
        k=16,
        n_buckets=32,
    )
    n_files = len(
        [f for f in os.listdir(docs_dir) if f.endswith(".parquet")]
    )
    out: dict[str, float] = {}
    try:
        for tag, kwargs in (
            ("ref_parquet_path", {"ref_sigs_path": ref_path}),
            ("ref_bucketed_table", {"ref_table": "t_refab_bands"}),
        ):
            best = float("inf")
            for _ in range(2):
                ckpt = tempfile.mkdtemp(prefix="mris_refab_ckpt_")
                flags_dir = tempfile.mkdtemp(prefix="mris_refab_flags_")
                try:
                    stream = (
                        spark.readStream.schema(docs.schema)
                        .option(
                            "maxFilesPerTrigger", str(max(1, n_files // 8))
                        )
                        .parquet(docs_dir)
                    )
                    t0 = time.perf_counter()
                    q = start_ingest_dedup_stream(
                        stream,
                        out_dir=flags_dir,
                        checkpoint_dir=ckpt,
                        observe_name=None,
                        **kwargs,
                    )
                    q.awaitTermination()
                    best = min(best, time.perf_counter() - t0)
                finally:
                    shutil.rmtree(ckpt, ignore_errors=True)
                    shutil.rmtree(flags_dir, ignore_errors=True)
            out[tag] = round(best, 2)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_refab_bands")
        shutil.rmtree(root, ignore_errors=True)
    return out


def calibration(spark) -> float:
    from measure_protocol import calibration_probe

    return calibration_probe(spark)


def hof_seed(spark) -> float:
    """Seed this process's interpreted-HOF JIT profile AND measure the
    draw (round-15 finding 1, BASELINE.md): run the IO-free
    permutation-fold canary as the FIRST heavy plan — 8/8
    canary-first processes drew fast where synth-first drew 2/6 slow
    — and return its min-of-2 seconds; main() divides by the
    calibration probe so every rehearsal summary carries its
    process-draw evidence (fast band ≲3.2; slow draws measured
    4.6/5.8). The probe itself is measure_protocol.hof_canary_seconds
    (round-16 verdict item 8: one canary, every harness)."""
    from measure_protocol import hof_canary_seconds

    return hof_canary_seconds(spark)


def main() -> None:
    argv = sys.argv[1:]
    vectors_mode = "--vectors" in argv
    streaming_mode = "--streaming" in argv
    restart_mode = "--streaming-restart" in argv
    rocksdb = "--rocksdb" in argv
    observe_cost = "--observe-cost" in argv
    ingest_ref_ab = "--ingest-ref-ab" in argv
    compactor_listing = "--compactor-listing" in argv
    spans_only = "--spans" in argv
    argv = [
        a
        for a in argv
        if a
        not in (
            "--vectors",
            "--streaming",
            "--streaming-restart",
            "--rocksdb",
            "--observe-cost",
            "--ingest-ref-ab",
            "--compactor-listing",
            "--spans",
        )
    ]
    sizes = [int(s) for s in argv] or (
        [2_000_000]
        if restart_mode
        else [125_000, 500_000, 2_000_000]
        if (vectors_mode or streaming_mode)
        else [4_000_000, 8_000_000]
        if spans_only
        else [500_000]
        if (observe_cost or ingest_ref_ab)
        else [10_000, 40_000]
        if compactor_listing
        else [250_000, 1_000_000, 4_000_000]
    )
    spark = get_spark(app_name="mris-scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    if rocksdb:
        # RocksDB state store (round-9 verdict item 5): disk-backed
        # state instead of the default all-in-executor-memory provider
        # — see streaming/queries.use_rocksdb_state_store.
        from mapreduce_implementation_spark.streaming.queries import (
            use_rocksdb_state_store,
        )

        use_rocksdb_state_store(spark)
    hof_t = hof_seed(spark)  # FIRST heavy plan — see hof_seed
    cal = calibration(spark)
    hof_ratio = round(hof_t / cal, 2) if cal else 0.0
    if spans_only:
        synth, run = synth_corpus, run_spans_only
    elif compactor_listing:
        synth, run = synth_leaves, run_listing_ab
    elif ingest_ref_ab:
        synth, run = synth_corpus, run_ingest_ref_ab
    elif observe_cost:
        synth, run = synth_corpus, run_observe_cost
    elif restart_mode:
        synth, run = synth_events, run_restart_rehearsal
    elif streaming_mode:
        synth, run = synth_events, run_streaming_ops
    elif vectors_mode:
        synth, run = synth_vectors, run_vector_ops
    else:
        synth, run = synth_corpus, run_ops
    results: list[dict] = []
    root = tempfile.mkdtemp(prefix="mris_rehearsal_")
    try:
        for n in sizes:
            d = os.path.join(root, f"data_{n}")
            gen = synth(spark, n, d)
            ops = run(spark, d)
            row = {"n_docs": n, "gen_sec": round(gen, 2), **ops}
            results.append(row)
            print(json.dumps(row), flush=True)
            shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    exponents: dict[str, list[float]] = {}
    for op in results[0]:
        if (
            op
            in (
                "n_docs",
                "gen_sec",
                "srp_planes",
                "semantic_exempted_rows",
                "semantic_exempted_clusters",
                "semantic_sliced_rows",
                "semantic_sliced_clusters",
                "semantic_k",
            )
            or op.endswith("_peak_state")
            or len(results) < 2
            or not isinstance(results[0][op], (int, float))
            or not results[0][op]
        ):
            continue
        exponents[op] = [
            round(
                math.log(results[i + 1][op] / results[i][op])
                / math.log(results[i + 1]["n_docs"] / results[i]["n_docs"]),
                2,
            )
            for i in range(len(results) - 1)
        ]
    print(
        json.dumps(
            {
                "calibration": cal,
                "hof_canary_ratio": hof_ratio,
                "sizes": sizes,
                "scaling_exponents": exponents,
                "state_store": "rocksdb" if rocksdb else "default",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
