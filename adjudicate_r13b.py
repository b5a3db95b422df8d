#!/usr/bin/env python
"""Round-13 continuation adjudication — the follow-on measurements:

1. SIGNATURE KERNEL A/B (--sig, default 1M docs): the round-13 arrow
   signature kernels vs the expression folds they replace, on the
   Zipf rehearsal corpus, interleaved min-of-2 with calibration rows
   bracketing the run. Arms:
     * minhash_sig — minhash_signatures (md5 JVM-side either way; the
       k=16 permutation mins are the moving part: interpreted
       array_min(transform) folds vs numpy reduceat);
     * simhash_sig — simhash_signatures (the aggregate(zip_with) ±1
       bit-sum fold vs the nibble-matrix reduceat kernel);
     * minhash_e2e / simhash_e2e — the full in-set miners with
       sig_impl as the only difference (band join + screens ride on
       top either way).
   Parity is asserted in-run: per-arm output digests (row count +
   xxhash sum) must be IDENTICAL between impls — the integer
   arithmetic is exact in both engines, so this is a hard gate.

2. COMPOSED IVF BUILD (--ivfbuild, default 800k vectors): the
   rehearsal ivf_build row re-measured with BOTH round-13 changes in
   (arrow assignment + clustered index write). The r13 consolidated
   table's 51.4 s at 800k predates the clustered write default; the
   verdict expected ~11 s composed (assignment 8.1 + write 2.5) —
   this section records the measured value.
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
from scale_rehearsal import IVF_TRAIN_SAMPLE, synth_corpus, synth_vectors

nums = [a for a in sys.argv[1:] if a.isdigit()]
N = int(nums[0]) if nums else 1_000_000
SECTIONS = {a.lstrip("-") for a in sys.argv[1:] if a.startswith("--")} or {
    "sig"
}
IVF_K = 64


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def digest(df, cols) -> tuple:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(1 << 40))
        ).alias("h"),
    ).first()
    return (int(row.n), int(row.h))


def main() -> None:
    spark = get_spark(app_name="mris-adjudicate-r13b")
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_implementation_spark.caching import release_caches
    from mapreduce_implementation_spark.operators import dedup as dd

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
    root = tempfile.mkdtemp(prefix="mris_r13b_")
    try:
        results["calibration_before"] = calib()

        if any(s.startswith("sig") for s in SECTIONS):
            docs_dir = os.path.join(root, "docs")
            synth_corpus(spark, N, docs_dir)
            docs = spark.read.parquet(docs_dir)

            def mh_sig(impl):
                sigs = dd.minhash_signatures(docs, impl=impl)
                return sigs.select(
                    "doc_id",
                    F.concat_ws(",", F.col("sig").cast("array<string>")).alias(
                        "s"
                    ),
                )

            def sh_sig(impl):
                return dd.simhash_signatures(docs, impl=impl)

            def mh_e2e(impl):
                return dd.minhash_near_dup_pairs(docs, sig_impl=impl)

            def sh_e2e(impl):
                return dd.simhash_near_dup_pairs(docs, sig_impl=impl)

            arms = {
                "minhash_sig": (mh_sig, ["doc_id", "s"]),
                "simhash_sig": (sh_sig, ["doc_id", "simhash"]),
                "minhash_e2e": (
                    mh_e2e,
                    ["doc_a", "doc_b", "est_jaccard"],
                ),
                "simhash_e2e": (sh_e2e, ["doc_a", "doc_b", "hamming"]),
            }
            only = {s[3:] for s in SECTIONS if s.startswith("sig") and s != "sig"}
            if only:  # e.g. --sigsimhash_sig or --sigminhash_e2e
                arms = {k: v for k, v in arms.items() if k in only}
            n_runs = int(os.environ.get("R13B_RUNS", "2"))
            for name, (build, cols) in arms.items():
                times = {"expr": [], "arrow": []}
                for _ in range(n_runs):  # interleaved min-of-N
                    for impl in ("expr", "arrow"):
                        release_caches()
                        t0 = time.perf_counter()
                        materialize(build(impl))
                        times[impl].append(
                            round(time.perf_counter() - t0, 2)
                        )
                release_caches()
                d_expr = digest(build("expr"), cols)
                release_caches()
                d_arrow = digest(build("arrow"), cols)
                assert d_expr == d_arrow, (
                    f"{name} digest mismatch: {d_expr} != {d_arrow}"
                )
                release_caches()
                results[name] = {
                    "expr_runs": times["expr"],
                    "arrow_runs": times["arrow"],
                    "expr": min(times["expr"]),
                    "arrow": min(times["arrow"]),
                    "speedup": round(
                        min(times["expr"]) / max(min(times["arrow"]), 1e-9), 2
                    ),
                    "digest": d_arrow,
                }
                print(name, results[name], flush=True)

        if "sq8" in SECTIONS:
            from mapreduce_implementation_spark.operators import (
                similarity as sim,
            )

            n_vec = min(N, 800_000)
            vec_dir = os.path.join(root, "vecs8")
            synth_vectors(spark, n_vec, vec_dir)
            vecs = spark.read.parquet(vec_dir)
            queries = vecs.where(F.col("vec_id") < 32)
            cents = sim.train_centroids(
                vecs, k=IVF_K, iters=2, sample_n=IVF_TRAIN_SAMPLE
            )
            out: dict = {"n_vectors": n_vec}
            paths = {}
            for mode, q in (("float", None), ("sq8", "int8")):
                p = os.path.join(root, f"idx_{mode}")
                t0 = time.perf_counter()
                sim.materialize_ivf_index(vecs, cents, p, quantize=q)
                out[f"build_{mode}"] = round(time.perf_counter() - t0, 2)
                out[f"bytes_{mode}"] = sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(p)
                    for f in fs
                    if f.endswith(".parquet")
                )
                paths[mode] = p
            tops = {}
            for _ in range(2):
                for mode, p in paths.items():
                    t0 = time.perf_counter()
                    res = sim.ivf_topk_from_index(
                        spark, p, queries, cents, k=10, nprobe=4
                    )
                    tops[mode] = {
                        (r.query_id, r.vec_id) for r in res.collect()
                    }
                    out.setdefault(f"probe_{mode}_runs", []).append(
                        round(time.perf_counter() - t0, 2)
                    )
            out["probe_float"] = min(out["probe_float_runs"])
            out["probe_sq8"] = min(out["probe_sq8_runs"])
            inter = len(tops["float"] & tops["sq8"])
            out["topk_overlap"] = round(inter / max(len(tops["float"]), 1), 4)
            out["shrink"] = round(out["bytes_float"] / out["bytes_sq8"], 2)
            results["sq8"] = out
            print("sq8", out, flush=True)

        if "ivfbuild" in SECTIONS:
            from mapreduce_implementation_spark.operators import (
                similarity as sim,
            )
            from mapreduce_implementation_spark.sources.materialize import (
                ensure_table,
            )

            n_vec = min(N, 800_000)
            vec_dir = os.path.join(root, "vecs")
            synth_vectors(spark, n_vec, vec_dir)
            vecs = spark.read.parquet(vec_dir)
            runs = []
            for i in range(2):
                idx = os.path.join(root, f"idx{i}")
                t0 = time.perf_counter()
                cents = sim.train_centroids(
                    vecs, k=IVF_K, iters=2, sample_n=IVF_TRAIN_SAMPLE
                )
                ensure_table(
                    spark,
                    idx,
                    lambda: sim.assign_inverted_lists(
                        vecs, cents, 1, keep_cols=("embedding",)
                    ),
                    partition_cols=("centroid_id",),
                )
                runs.append(round(time.perf_counter() - t0, 2))
                n_files = sum(
                    len(fs) for _, _, fs in os.walk(idx) for f in [1]
                )
                shutil.rmtree(idx)
            results["ivf_build_composed"] = {
                "n_vectors": n_vec,
                "runs": runs,
                "min": min(runs),
                "files": n_files,
            }
            print("ivf_build_composed", results["ivf_build_composed"], flush=True)

        results["calibration_after"] = calib()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
