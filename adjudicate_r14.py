#!/usr/bin/env python
"""Round-14 adjudication — the measurements the verdict ordered:

1. MINHASH/CLUSTERS DRIVER-BENCH DRIFT (verdict item 2): the r13
   driver bench read minhash 3.47 / clusters 3.40 while the builder's
   same-code quiet run read 2.50/2.89. Candidate causes named by the
   judge: host noise / the auto-screen decision job (new in r13) /
   a real regression. Protocol: three REGIME ARMS of the exact
   headline queries at sf0.1, interleaved min-of-3 with calibration
   rows bracketing each rep:
     * r12-shape — ``pair_screen="join"`` pinned (zero decision jobs,
       window cap: what the r12 binary ran);
     * r13-shape — the one-row ``_group_size_stats`` fold then the
       pinned screen with the window cap (exactly the job r13's auto
       added, without r14's counts reuse);
     * r14-shape — ``pair_screen="auto"`` as it now ships (ONE
       checkpointed counts job feeding the screen decision AND the
       cap detection).
   The delta r13−r12 prices the auto-screen job; r14−r13 prices the
   counts unification; calibration drift prices the host.

2. XXHASH64 SIGNATURE BUILD (verdict item 3): md5 vs xxhash64
   signature chains at N docs (Zipf synth), interleaved min-of-2,
   digest parity NOT expected (different hashes) but NULL-set parity
   asserted; then the expr-vs-arrow impl A/B RE-RUN under xxhash64 —
   with the md5 term gone the regime rule predicts the arrow fold may
   flip from wash to win.

3. SQ8 COMMITTED-TABLE PROBE (verdict item 4): per-batch
   srp_cross_near_dup probe wall against a float vs an SQ8 committed
   reference table at N vectors (same probe batch), min-of-2
   interleaved, flag parity asserted in-run.

Usage: python adjudicate_r14.py [N_docs] [--drift] [--hash] [--sq8]
(default: all sections, N=1_000_000 for hash, sf0.1 for drift).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from mapreduce_implementation_spark import get_spark

nums = [a for a in sys.argv[1:] if a.isdigit()]
N = int(nums[0]) if nums else 1_000_000
SECTIONS = {a.lstrip("-") for a in sys.argv[1:] if a.startswith("--")} or {
    "drift", "hash", "sq8"
}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT: dict = {"n": N, "sf_dir": SF_DIR}


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def cal_probe(spark) -> float:
    t0 = time.perf_counter()
    materialize(
        spark.range(0, 100_000_000, 1, 32).select(
            F.sum((F.col("id") % 7) * 3 + 1).alias("s")
        )
    )
    return round(time.perf_counter() - t0, 3)


def zipf_docs(spark, n: int):
    """Deterministic Zipf-ish doc synth (same flavor as
    scale_rehearsal): ~40-token docs over a skewed vocab, plus 0.5%
    exact-twin mass so the miners find real pairs."""
    base = spark.range(0, n, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (
                        F.pmod(
                            F.xxhash64(F.col("id"), F.lit(i)), F.lit(9973)
                        )
                        % (1 + F.pmod(F.xxhash64(F.col("id"), F.lit(i + 100)), F.lit(997)))
                    ).cast("string"),
                )
                for i in range(40)
            ],
        ).alias("text"),
    )
    return base


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


# ---------------------------------------------------------------- drift
def section_drift(spark) -> None:
    from mapreduce_implementation_spark.caching import release_caches
    from mapreduce_implementation_spark.operators import dedup as dd
    from mapreduce_implementation_spark.plans.dedup_queries import (
        BANDS, K, ROWS,
    )
    from mapreduce_implementation_spark.sources.catalog import load_table
    from mapreduce_implementation_spark.sources.materialize import (
        ensure_table,
        scratch_dir,
    )

    docs = load_table(spark, SF_DIR, "documents")
    sig_path = os.path.join(scratch_dir("mris_adj14_"), "sigs")
    sigs = ensure_table(
        spark, sig_path,
        lambda: dd.minhash_signatures(docs, "doc_id", "text", shingle_n=3, k=K),
    )

    def pairs(shape: str):
        if shape == "r12":
            return dd.minhash_near_dup_pairs(
                docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS,
                rows=ROWS, threshold=0.5, signatures=sigs,
                pair_screen="join",
            )
        if shape == "r13":
            # reconstruct the r13 auto: the one-row stats fold, then
            # the resolved screen pinned (window cap, no counts reuse)
            screen = dd.choose_pair_screen(
                *dd._group_size_stats(
                    dd._minhash_banded(sigs, "doc_id", BANDS, ROWS),
                    ("band_id", "band_hash"),
                    dd.DEFAULT_MAX_BUCKET,
                ),
                dd.DEFAULT_MAX_BUCKET,
                False,
            )
            return dd.minhash_near_dup_pairs(
                docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS,
                rows=ROWS, threshold=0.5, signatures=sigs,
                pair_screen=screen,
            )
        return dd.minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS,
            rows=ROWS, threshold=0.5, signatures=sigs,
        )

    def run(shape: str, clusters: bool):
        p = pairs(shape)
        if clusters:
            materialize(dd.connected_components(p, "doc_a", "doc_b"))
        else:
            materialize(p)

    arms = ["r12", "r13", "r14"]
    res = {f"minhash_{a}": [] for a in arms}
    res.update({f"clusters_{a}": [] for a in arms})
    cals = [cal_probe(spark)]
    # warmup pass (first-slot plan compile, uncounted)
    run("r12", False)
    for rep in range(3):
        for a in arms:
            release_caches()
            res[f"minhash_{a}"].append(timed(lambda: run(a, False)))
        for a in arms:
            release_caches()
            res[f"clusters_{a}"].append(timed(lambda: run(a, True)))
        cals.append(cal_probe(spark))
    OUT["drift"] = {
        "runs": res,
        "min": {k: min(v) for k, v in res.items()},
        "calibration": cals,
    }
    print(json.dumps({"drift": OUT["drift"]}), flush=True)


# ----------------------------------------------------------------- hash
def section_hash(spark) -> None:
    """Measured on the scale_rehearsal Zipf corpus — the SAME synth the
    r13 'md5 dominates the chain' claim was measured on (shingle
    strings are three ~5-char words; the first zipf_docs attempt here
    used 4-char tokens whose md5 was too cheap to matter — 4% delta —
    a corpus-shape artifact, kept in the journal as a negative)."""
    import shutil
    import tempfile

    from mapreduce_implementation_spark.operators import dedup as dd
    from scale_rehearsal import synth_corpus

    root = tempfile.mkdtemp(prefix="mris_adj14_hash_")
    synth_corpus(spark, N, os.path.join(root, "docs"))
    docs = spark.read.parquet(os.path.join(root, "docs"))
    res: dict[str, list[float]] = {}
    nulls: dict[str, int] = {}

    def build(hash_, impl):
        df = dd.minhash_signatures(
            docs, "doc_id", "text", shingle_n=3, k=16, impl=impl, hash=hash_
        )
        materialize(df)

    arms = [
        ("md5", "expr"), ("xxhash64", "expr"),
        ("md5", "arrow"), ("xxhash64", "arrow"),
    ]
    # warmup
    build("md5", "expr")
    for rep in range(2):
        for hash_, impl in arms:
            key = f"{hash_}_{impl}"
            res.setdefault(key, []).append(
                timed(lambda: build(hash_, impl))
            )
    # NULL-set parity: both hashes must agree on WHICH docs have sigs
    for hash_ in ("md5", "xxhash64"):
        nulls[hash_] = (
            dd.minhash_signatures(
                docs, "doc_id", "text", shingle_n=3, k=16, hash=hash_
            )
            .where(F.col("sig").isNull())
            .count()
        )
    OUT["hash"] = {
        "runs": res,
        "min": {k: min(v) for k, v in res.items()},
        "null_sigs": nulls,
        "cal": cal_probe(spark),
    }
    print(json.dumps({"hash": OUT["hash"]}), flush=True)
    shutil.rmtree(root, ignore_errors=True)


# ------------------------------------------------------------------ sq8
def section_sq8(spark) -> None:
    import random
    import shutil
    import tempfile

    from mapreduce_implementation_spark.operators.semantic import (
        srp_cross_near_dup,
    )
    from mapreduce_implementation_spark.streaming.pipeline import (
        commit_srp_reference,
    )

    from scale_rehearsal import synth_vectors

    dim = 64
    nv = min(N, 800_000)
    root = tempfile.mkdtemp(prefix="mris_adj14_sq8_")
    synth_vectors(spark, nv, os.path.join(root, "vecs"))
    vecs = spark.read.parquet(os.path.join(root, "vecs"))
    rnd = random.Random(14)
    planes = spark.createDataFrame(
        [(p, [rnd.uniform(-1, 1) for _ in range(dim)]) for p in range(8)],
        "plane_id int, plane_emb array<double>",
    )
    # probe batch: 2k committed twins under fresh ids (flags expected)
    batch = (
        vecs.where(F.col("vec_id") < 2000)
        .select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
        .localCheckpoint(eager=True)
    )
    try:
        builds = {}
        t0 = time.perf_counter()
        commit_srp_reference(
            vecs, planes, "adj14_ref_f", os.path.join(root, "f"),
            n_buckets=32,
        )
        builds["float"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        commit_srp_reference(
            vecs, planes, "adj14_ref_q", os.path.join(root, "q"),
            n_buckets=32, quantize="int8",
        )
        builds["sq8"] = round(time.perf_counter() - t0, 3)

        def du(p):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(p)
                for f in fs
            )

        sizes = {
            "float_bytes": du(os.path.join(root, "f")),
            "sq8_bytes": du(os.path.join(root, "q")),
        }

        def probe(table):
            return srp_cross_near_dup(
                batch, planes=planes, ref_bucketed=spark.table(table),
                threshold=0.99,
            )

        res: dict[str, list[float]] = {"float": [], "sq8": []}
        probe("adj14_ref_f").count()  # warmup
        for rep in range(2):
            for name, table in (
                ("float", "adj14_ref_f"), ("sq8", "adj14_ref_q"),
            ):
                res[name].append(
                    timed(lambda: materialize(probe(table)))
                )
        flags_f = {
            (r.new_id, r.ref_id) for r in probe("adj14_ref_f").collect()
        }
        flags_q = {
            (r.new_id, r.ref_id) for r in probe("adj14_ref_q").collect()
        }
        OUT["sq8"] = {
            "builds": builds,
            "sizes": sizes,
            "ratio": round(sizes["float_bytes"] / sizes["sq8_bytes"], 2),
            "probe_runs": res,
            "probe_min": {k: min(v) for k, v in res.items()},
            "flags_float": len(flags_f),
            "flags_sq8": len(flags_q),
            "flags_equal": flags_f == flags_q,
            "flags_jaccard": (
                round(
                    len(flags_f & flags_q) / len(flags_f | flags_q), 4
                )
                if flags_f | flags_q
                else None
            ),
            "cal": cal_probe(spark),
        }
        print(json.dumps({"sq8": OUT["sq8"]}), flush=True)
    finally:
        spark.sql("DROP TABLE IF EXISTS adj14_ref_f")
        spark.sql("DROP TABLE IF EXISTS adj14_ref_q")
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="adjudicate-r14")
    spark.sparkContext.setLogLevel("ERROR")
    cal_probe(spark)  # JVM warmup
    OUT["cal_start"] = cal_probe(spark)
    if "drift" in SECTIONS:
        section_drift(spark)
    if "hash" in SECTIONS:
        section_hash(spark)
    if "sq8" in SECTIONS:
        section_sq8(spark)
    OUT["cal_end"] = cal_probe(spark)
    print("FINAL " + json.dumps(OUT), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
