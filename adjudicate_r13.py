#!/usr/bin/env python
"""Round-13 adjudication — three measurements the verdict ordered:

1. ARROW ASSIGNMENT A/B (verdict item 1): the mapInPandas-matmul
   assignment kernel vs the expression-fold form it replaces, at 800k
   Zipf vectors (same synth as scale_rehearsal), interleaved min-of-2,
   calibration rows bracketing the run. Arms:
     * ivf_build   — bounded-sample Lloyd + full-corpus assignment
                     (the materialized IVF index build);
     * hier_build  — train_two_level_centroids (coarse Lloyd + fine
                     pick, assignment inside);
     * sem_e2e     — assign_two_level + semantic_dedup(assignment=…)
                     at k≈N/1000, max_cluster=1000 (the slice path).
   Parity is asserted in-run: per-arm output digests (row count +
   xxhash sum over (id, centroid_id) / (id, centroid_id, keep)) must
   be IDENTICAL between impls — the quantized argmax replication is a
   hard gate, not a hope.

2. PAIR-SCREEN CROSSOVER SWEEP (verdict item 2): join vs blas screens
   over CONTROLLED group sizes (bucket = vec_id // m for mean size m),
   200k vectors × dim 64, min-of-2 interleaved — pins the
   AUTO_SCREEN_MIN_MEAN constant from both sides of the regime rule
   the round-12 endpoints (minhash singletons vs SRP/semantic large
   groups) measured only at its extremes.

3. LEAF-LISTING DRIVER RESIDENCY (verdict item 5): the prefix-walk
   distributed_leaf_counts at 10⁵ leaves — wall, parity vs the paged
   JVM walk, and the driver's PYTHON-SIDE tracemalloc peak (the r12
   form staged one path tuple per leaf before parallelize; the new
   form holds directory prefixes + the counts dict only).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from mapreduce_implementation_spark import get_spark
from scale_rehearsal import IVF_TRAIN_SAMPLE, synth_leaves, synth_vectors

nums = [a for a in sys.argv[1:] if a.isdigit()]
N = int(nums[0]) if nums else 800_000
SECTIONS = {a.lstrip("-") for a in sys.argv[1:] if a.startswith("--")} or {
    "ab", "sweep", "leaves"
}
IVF_K = 64
MAX_CLUSTER = 1000
THRESHOLD = 0.9


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def digest(df, cols) -> tuple:
    # pmod keeps the per-row term < 2^40 so the ANSI-mode long sum
    # cannot overflow below ~8M rows; order-insensitive by construction
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(1 << 40))
        ).alias("h"),
    ).first()
    return (int(row.n), int(row.h))


def main() -> None:
    spark = get_spark(app_name="mris-adjudicate-r13")
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_implementation_spark.caching import release_caches
    from mapreduce_implementation_spark.operators import similarity as sim
    from mapreduce_implementation_spark.operators.semantic import (
        semantic_dedup,
    )

    def calib() -> list[float]:
        out = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(
                spark.range(0, 100_000_000, 1, 32).select(
                    F.sum((F.col("id") % 7) * 3 + 1).alias("s")
                )
            )
            out.append(round(time.perf_counter() - t0, 3))
        return out

    results: dict = {"n": N}
    root = tempfile.mkdtemp(prefix="mris_r13_")
    try:
        vec_dir = os.path.join(root, "vecs")
        if SECTIONS & {"ab", "sweep", "buckets", "brute", "ivfwrite"}:
            synth_vectors(spark, N, vec_dir)
            vecs = spark.read.parquet(vec_dir)
        results["calibration_before"] = calib()

        k_sem = max(16, N // 1000)
        k_side = max(4, int(math.ceil(math.sqrt(k_sem))))

        def arm_ivf(impl: str):
            cents = sim.train_centroids(
                vecs, k=IVF_K, iters=2, sample_n=IVF_TRAIN_SAMPLE,
                assign_impl=impl,
            )
            assigned = sim.assign_inverted_lists(
                vecs, cents, 1, keep_cols=("embedding",), impl=impl
            )
            materialize(assigned)
            return digest(
                assigned.select("vec_id", "centroid_id"),
                ["vec_id", "centroid_id"],
            )

        def arm_hier(impl: str):
            coarse, fine = sim.train_two_level_centroids(
                vecs, k_coarse=k_side, k_fine=k_side, iters=2,
                sample_n=IVF_TRAIN_SAMPLE, assign_impl=impl,
            )
            return digest(
                fine.select("coarse_id", "centroid_id"),
                ["coarse_id", "centroid_id"],
            )

        def arm_sem(impl: str):
            coarse, fine = sim.train_two_level_centroids(
                vecs, k_coarse=k_side, k_fine=k_side, iters=2,
                sample_n=IVF_TRAIN_SAMPLE, assign_impl=impl,
            )
            assignment = sim.assign_two_level(
                vecs, coarse, fine, keep_cols=("embedding",), impl=impl
            )
            out = semantic_dedup(
                vecs, assignment=assignment, threshold=THRESHOLD,
                max_cluster=MAX_CLUSTER,
            )
            d = digest(out, ["vec_id", "centroid_id", "keep"])
            release_caches()
            return d

        arms = (
            {"ivf_build": arm_ivf, "hier_build": arm_hier,
             "sem_e2e": arm_sem}
            if "ab" in SECTIONS
            else {}
        )
        walls: dict[str, dict[str, list[float]]] = {
            a: {"expr": [], "arrow": []} for a in arms
        }
        digests: dict[str, dict[str, set]] = {
            a: {"expr": set(), "arrow": set()} for a in arms
        }
        for _ in range(2):
            for name, fn in arms.items():
                for impl in ("expr", "arrow"):
                    t0 = time.perf_counter()
                    d = fn(impl)
                    walls[name][impl].append(
                        round(time.perf_counter() - t0, 2)
                    )
                    digests[name][impl].add(d)
        for name in arms:
            de, da = digests[name]["expr"], digests[name]["arrow"]
            assert len(de) == 1 and de == da, (name, de, da)
            we = min(walls[name]["expr"])
            wa = min(walls[name]["arrow"])
            results[name] = {
                "expr_sec": we,
                "arrow_sec": wa,
                "speedup": round(we / wa, 2) if wa else None,
                "runs": walls[name],
                "digest": sorted(de)[0],
            }
        results["calibration_mid"] = calib()

        # ---- 2. pair-screen crossover sweep -------------------------
        from mapreduce_implementation_spark.functions.vectors import (
            dot,
            norm,
        )
        from mapreduce_implementation_spark.operators.semantic import (
            _blas_pair_screen,
        )

        NS = min(200_000, N)
        svecs = (
            (
                spark.read.parquet(vec_dir)
                .where(F.col("vec_id") < NS)
                .select("vec_id", "embedding")
            )
            if "sweep" in SECTIONS
            else None
        )
        sweep: dict[int, dict[str, float]] = {}
        from pyspark.sql import types as T

        id_type = T.LongType()
        out_schema = T.StructType(
            [
                T.StructField("id_a", id_type),
                T.StructField("id_b", id_type),
                T.StructField("cos_sim", T.DoubleType()),
            ]
        )
        for m in (1, 2, 4, 8, 16, 32, 64) if "sweep" in SECTIONS else ():
            base = svecs.withColumn(
                "bucket", (F.col("vec_id") / m).cast("long")
            ).withColumn("_vn", norm(F.col("embedding")))
            base = base.localCheckpoint(eager=True)
            t_join, t_blas = [], []
            for _ in range(2):
                a, b = base.alias("a"), base.alias("b")
                cand = a.join(
                    b,
                    (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")),
                ).select(
                    F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                    F.col("a.embedding").alias("_ea"),
                    F.col("b.embedding").alias("_eb"),
                    (F.col("a._vn") * F.col("b._vn")).alias("_denom"),
                )
                cos_q = F.when(
                    F.col("_denom") != 0,
                    dot(F.col("_ea"), F.col("_eb")) / F.col("_denom"),
                ).cast(sim.COS_Q)
                t0 = time.perf_counter()
                materialize(
                    cand.select(
                        "id_a", "id_b", cos_q.alias("cos_sim")
                    ).where(
                        F.col("cos_sim")
                        >= F.lit(THRESHOLD).cast(sim.COS_Q)
                    )
                )
                t_join.append(round(time.perf_counter() - t0, 2))
                t0 = time.perf_counter()
                materialize(
                    base.select("vec_id", "embedding", "_vn", "bucket")
                    .groupBy("bucket")
                    .applyInPandas(
                        _blas_pair_screen("vec_id", "embedding", THRESHOLD),
                        out_schema,
                    )
                )
                t_blas.append(round(time.perf_counter() - t0, 2))
            base.unpersist()
            sweep[m] = {
                "join_sec": min(t_join),
                "blas_sec": min(t_blas),
                "winner": "blas" if min(t_blas) < min(t_join) else "join",
            }
        if "sweep" in SECTIONS:
            results["screen_crossover_sweep"] = sweep

        # ---- 3. leaf listing at 1e5 leaves --------------------------
        from mapreduce_implementation_spark.sources.sinks import (
            distributed_leaf_counts,
            paged_leaf_counts,
        )

        # ---- 2d. clustered IVF index write A/B (round-13 follow-on) -
        if "ivfwrite" in SECTIONS:
            import glob

            from mapreduce_implementation_spark.sources.sinks import (
                write_partitioned_dataset,
            )

            cents = sim.train_centroids(
                vecs, k=IVF_K, iters=2, sample_n=IVF_TRAIN_SAMPLE
            )
            assigned = sim.assign_inverted_lists(
                vecs, cents, 1, keep_cols=("embedding",)
            ).localCheckpoint(eager=True)
            wv = {"plain": [], "clustered": []}
            files = {}
            rowsn = {}
            for _ in range(2):
                for mode_name, cl in (("plain", False), ("clustered", True)):
                    out_dir = os.path.join(root, f"ivfw_{mode_name}")
                    t0 = time.perf_counter()
                    write_partitioned_dataset(
                        assigned, out_dir, ["centroid_id"], cluster=cl
                    )
                    wv[mode_name].append(round(time.perf_counter() - t0, 2))
                    files[mode_name] = len(
                        glob.glob(os.path.join(out_dir, "*", "*.parquet"))
                    )
                    rowsn[mode_name] = (
                        spark.read.parquet(out_dir).count()
                    )
            assert rowsn["plain"] == rowsn["clustered"] == N, rowsn
            results["ivf_index_write"] = {
                "plain_sec": min(wv["plain"]),
                "clustered_sec": min(wv["clustered"]),
                "plain_files": files["plain"],
                "clustered_files": files["clustered"],
                "runs": wv,
            }
            assigned.unpersist()

        # ---- 2c. brute-force top-k kernel A/B (round-13 follow-on) --
        if "brute" in SECTIONS:
            queries = vecs.where(F.col("vec_id") < 8)
            bf = {"expr": [], "arrow": []}
            bfd = {"expr": set(), "arrow": set()}
            for _ in range(2):
                for impl in ("expr", "arrow"):
                    t0 = time.perf_counter()
                    out = sim.brute_force_topk(
                        vecs, queries, k=10, impl=impl
                    )
                    materialize(out)
                    bf[impl].append(round(time.perf_counter() - t0, 2))
                    bfd[impl].add(
                        digest(out, ["query_id", "vec_id", "rank"])
                    )
            assert bfd["expr"] == bfd["arrow"] and len(bfd["expr"]) == 1, bfd
            results["brute_force_topk"] = {
                "expr_sec": min(bf["expr"]),
                "arrow_sec": min(bf["arrow"]),
                "speedup": round(min(bf["expr"]) / min(bf["arrow"]), 2),
                "runs": bf,
            }

        # ---- 2b. SRP bucketing kernel A/B (round-13 follow-on) ------
        if "buckets" in SECTIONS:
            import random

            from mapreduce_implementation_spark.operators.semantic import (
                srp_near_dup_pairs,
            )

            DIM = len(vecs.first()["embedding"])
            n_planes = max(4, int(math.log2(max(N, 128) / 64)))
            rnd = random.Random(42)
            planes = spark.createDataFrame(
                [
                    (pi, [rnd.uniform(-1.0, 1.0) for _ in range(DIM)])
                    for pi in range(n_planes)
                ],
                "plane_id int, plane_emb array<double>",
            )
            bwalls = {"bucket_expr": [], "bucket_arrow": [],
                      "srp_expr_buckets": [], "srp_arrow_buckets": []}
            bdig = {"expr": set(), "arrow": set()}
            import mapreduce_implementation_spark.operators.similarity as _s

            orig = _s._with_buckets
            for _ in range(2):
                for impl in ("expr", "arrow"):
                    t0 = time.perf_counter()
                    bk = _s._with_buckets(
                        vecs, planes, "vec_id", "embedding", impl=impl
                    )
                    bdig[impl].add(digest(bk, ["vec_id", "bucket"]))
                    bwalls[f"bucket_{impl}"].append(
                        round(time.perf_counter() - t0, 2)
                    )
                    # srp e2e with the bucketing impl forced
                    def forced(df, pl, i, e, keep_emb=False, _impl=impl):
                        return orig(df, pl, i, e, keep_emb, impl=_impl)

                    _s._with_buckets = forced
                    try:
                        t0 = time.perf_counter()
                        materialize(
                            srp_near_dup_pairs(vecs, planes, threshold=0.8)
                        )
                        bwalls[f"srp_{impl}_buckets"].append(
                            round(time.perf_counter() - t0, 2)
                        )
                    finally:
                        _s._with_buckets = orig
            assert bdig["expr"] == bdig["arrow"] and len(bdig["expr"]) == 1, bdig
            results["bucketing"] = {
                k: min(v) for k, v in bwalls.items()
            } | {"runs": bwalls, "n_planes": n_planes}

        if "leaves" not in SECTIONS:
            results["calibration_after"] = calib()
            print(json.dumps(results))
            return
        leaves_dir = os.path.join(root, "leaves")
        synth_leaves(spark, 100_000, leaves_dir)
        tracemalloc.start()
        t0 = time.perf_counter()
        dcounts = distributed_leaf_counts(spark, leaves_dir, ["batch_id"])
        dwall = round(time.perf_counter() - t0, 2)
        _, dpeak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        t0 = time.perf_counter()
        pcounts = paged_leaf_counts(spark, leaves_dir, ["batch_id"])
        pwall = round(time.perf_counter() - t0, 2)
        assert dcounts == pcounts, "listing parity"
        results["leaf_listing_100k"] = {
            "distributed_sec": dwall,
            "paged_sec": pwall,
            "distributed_driver_peak_bytes": int(dpeak),
            "n_leaves": len(dcounts),
            "n_files": sum(dcounts.values()),
        }
        results["calibration_after"] = calib()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
