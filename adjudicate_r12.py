#!/usr/bin/env python
"""Round-12 adjudication (round-11 verdict items 1 and 3): decompose
the semantic slice arm's overhead at 800k Zipf vectors and A/B the new
BLAS group screen against the join screen it replaces.

Arms (all through the SAME two-level assignment the vectors rehearsal
uses, production max_cluster=1000, threshold=0.9), interleaved
min-of-2 with calibration rows bracketing the run:

* assigned_only — materialize the cached assignment frame (+_vn):
  the shared base cost every arm pays.
* members_only  — the slice arm's POSITIONING machinery alone
  (oversized filter -> projection -> contiguous ids -> slices ->
  overlap union), no screen: isolates the cost the round-11 negative
  result could not separate from enumeration.
* keep          — exempt_strategy="keep", join screen (the r10 shape:
  oversized mass exempted, small clusters enumerated).
* slice_join    — r11's shipped shape: oversized mass mined through
  the slice self-join (the (max_cluster+1)^2/2 enumeration).
* slice_blas    — round 12: same mining, screen folded into one Gram
  matmul per bounded group via applyInPandas (semantic._blas_screen).

Decomposition reads: members_only - assigned_only ~ positioning;
slice_join - members_only ~ join screen (enumeration + dots);
slice_blas - members_only ~ BLAS screen; slice_blas / slice_join is
the verdict-item-3 headline ratio (target >= 1.5x).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import shutil
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from mapreduce_implementation_spark import get_spark
from scale_rehearsal import (
    IVF_TRAIN_SAMPLE,
    synth_vectors,
)

MAX_CLUSTER = 1000
THRESHOLD = 0.9
N = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark(app_name="mris-adjudicate-r12")
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_implementation_spark.caching import (
        release_caches,
        track_cache,
    )
    from mapreduce_implementation_spark.functions.vectors import norm
    from mapreduce_implementation_spark.operators import similarity as sim
    from mapreduce_implementation_spark.operators.dedup import spread
    from mapreduce_implementation_spark.operators.ids import (
        assign_contiguous_ids,
    )
    from mapreduce_implementation_spark.operators.semantic import (
        _slice_projection,
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

    root = tempfile.mkdtemp(prefix="mris_adj12_")
    try:
        vec_dir = os.path.join(root, "vecs")
        gen = synth_vectors(spark, N, vec_dir)
        vecs = spark.read.parquet(vec_dir)

        k_sem = max(16, N // 1000)
        k_side = max(4, int(math.ceil(math.sqrt(k_sem))))
        t0 = time.perf_counter()
        coarse, fine = sim.train_two_level_centroids(
            vecs, k_coarse=k_side, k_fine=k_side, iters=2,
            sample_n=IVF_TRAIN_SAMPLE,
        )
        hier_build = round(time.perf_counter() - t0, 2)

        def assignment():
            return sim.assign_two_level(
                vecs, coarse, fine, keep_cols=("embedding",)
            )

        def assigned_frame():
            return track_cache(
                spread(assignment()).withColumn(
                    "_vn", norm(F.col("embedding"))
                )
            )

        def assigned_only():
            return assigned_frame()

        def members_only():
            assigned = assigned_frame()
            sizes = assigned.groupBy("centroid_id").agg(
                F.count(F.lit(1)).alias("_csize")
            )
            exempt = (
                assigned.join(F.broadcast(sizes), "centroid_id")
                .where(F.col("_csize") > MAX_CLUSTER)
                .drop("_csize")
            )
            positioned = assign_contiguous_ids(
                exempt.withColumn(
                    "_proj", _slice_projection(F.col("embedding"))
                ),
                ["centroid_id", "_proj", "vec_id"],
                "_gpos",
            )
            cmin = positioned.groupBy("centroid_id").agg(
                F.min("_gpos").alias("_cmin")
            )
            base = (
                positioned.join(F.broadcast(cmin), "centroid_id")
                .withColumn("_rel", F.col("_gpos") - F.col("_cmin"))
                .withColumn(
                    "_slice", F.floor(F.col("_rel") / MAX_CLUSTER)
                )
            )
            overlap = base.where(
                (F.col("_rel") % MAX_CLUSTER == 0) & (F.col("_slice") > 0)
            ).withColumn("_slice", F.col("_slice") - 1)
            return base.unionByName(overlap).select(
                "vec_id", "embedding", "_vn", "centroid_id", "_slice"
            )

        def dedup_arm(exempt_strategy, pair_screen):
            return semantic_dedup(
                vecs,
                assignment=assignment(),
                threshold=THRESHOLD,
                max_cluster=MAX_CLUSTER,
                exempt_strategy=exempt_strategy,
                pair_screen=pair_screen,
            )

        arms = {
            "assigned_only": assigned_only,
            "members_only": members_only,
            "keep": lambda: dedup_arm("keep", "join"),
            "slice_join": lambda: dedup_arm("slice", "join"),
            "slice_blas": lambda: dedup_arm("slice", "blas"),
        }

        cal_pre = calib()
        runs: dict[str, list[float]] = {a: [] for a in arms}
        for _ in range(2):
            for name, build in arms.items():
                t0 = time.perf_counter()
                materialize(build())
                runs[name].append(round(time.perf_counter() - t0, 2))
                release_caches()
        cal_post = calib()

        mins = {a: min(v) for a, v in runs.items()}
        out = {
            "n_vecs": N,
            "gen_sec": round(gen, 2),
            "hier_build": hier_build,
            "k": k_side * k_side,
            "max_cluster": MAX_CLUSTER,
            "threshold": THRESHOLD,
            "mins": mins,
            "runs": runs,
            "positioning_sec": round(
                mins["members_only"] - mins["assigned_only"], 2
            ),
            "join_screen_sec": round(
                mins["slice_join"] - mins["members_only"], 2
            ),
            "blas_screen_sec": round(
                mins["slice_blas"] - mins["members_only"], 2
            ),
            "blas_vs_join_e2e": round(
                mins["slice_join"] / mins["slice_blas"], 2
            ),
            "calibration_pre": cal_pre,
            "calibration_post": cal_post,
        }
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
