#!/usr/bin/env python
"""Round-15 adjudication: shingle_impl="tokhash" vs "string" on the
1M-doc Zipf rehearsal corpus (verdict item 1).

The r14 decomposition (BASELINE.md) proved the strong hash was never
the signature-build cost — tokenize + ngram-concat + array_distinct
over STRINGS own ~20.5 s of the ~31 s 1M-doc chain. The tokhash
kernel (the span_impl="tokhash" template from contamination.py applied
to the shingle path) hashes each token once and derives shingle int64s
from token-hash slices, never materializing a shingle string.

PROTOCOL — fresh process per timed run (the r14 decomposition's
protocol, made mandatory by an r15 observation): on this box the SAME
plan in the SAME quiet window runs 25-30 s in one process and
120-190 s in another, sustained for that process's lifetime, CPU-bound
(32 cores busy, GC healthy, code cache healthy, thread stacks inside
the interpreted higher-order-function arithmetic of the permutation
transform). The per-process speed is decided around the first heavy
plan and then sticks — consistent with JVM JIT profile pollution of
the megamorphic Expression.eval call sites, and NOT visible to the
pure-compute calibration probe (cal read 0.15 inside a slow process).
Same-process interleaving therefore cannot price the arms: a slow
process taxes both arms ~6x and compresses the ratio. One process =
one timed measurement; arms interleave at the PROCESS level; min-of-N
per arm absorbs the slow-process draws.

Usage:
    python adjudicate_r15.py synth N_DOCS DOCS_DIR
    python adjudicate_r15.py measure {sig_build|miner|ngram_jaccard} \
        {string|tokhash} DOCS_DIR          # one JSON line
    python adjudicate_r15.py probes DOCS_DIR   # recall parity, 3 salts
    python adjudicate_r15.py regime DOCS_DIR   # auto-screen decision

Drive the interleaved sweep from the shell:
    for r in 1 2; do for op in sig_build miner ngram_jaccard; do
      for arm in string tokhash; do
        python adjudicate_r15.py measure $op $arm $DIR; done; done; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_implementation_spark import get_spark
from scale_rehearsal import materialize, synth_corpus


def _spark():
    spark = get_spark(app_name="mris-adjudicate-r15")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def quick_cal(spark) -> float:
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        materialize(
            spark.range(0, 100_000_000, 1, 32).select(
                F.sum((F.col("id") % 7) * 3 + 1).alias("s")
            )
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def cmd_synth(n_docs: int, docs_dir: str) -> None:
    spark = _spark()
    gen = synth_corpus(spark, n_docs, docs_dir)
    print(json.dumps({"synth": n_docs, "gen_sec": round(gen, 2)}), flush=True)
    spark.stop()


def build(spark, op: str, arm: str, docs_dir: str):
    from mapreduce_implementation_spark.operators import dedup as dd

    docs = spark.read.parquet(docs_dir)
    if op == "sig_build":
        return dd.minhash_signatures(
            docs, "doc_id", "text", shingle_n=3, k=16, shingle_impl=arm
        )
    if op == "miner":
        return dd.minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_impl=arm
        )
    if op == "ngram_jaccard":
        return dd.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_impl=arm)
    raise SystemExit(f"unknown op {op!r}")


def cmd_measure(op: str, arm: str, docs_dir: str) -> None:
    spark = _spark()
    cal = quick_cal(spark)
    t0 = time.perf_counter()
    materialize(build(spark, op, arm, docs_dir))
    sec = round(time.perf_counter() - t0, 2)
    print(
        json.dumps({"op": op, "arm": arm, "sec": sec, "cal": cal}),
        flush=True,
    )
    spark.stop()


def cmd_probes(docs_dir: str) -> None:
    """Recall parity through both arms. A different hash family draws
    DIFFERENT min-wise permutation inputs, so borderline pairs (the
    rehearsal corpus's J~0.8 mates at the 1-(1-J^4)^4 knee)
    legitimately flip per draw — the honest parity question is whether
    the arms' recalls sit inside the same DRAW-NOISE band, measured by
    re-running each probe over three frozen samples (salts)."""
    from mapreduce_implementation_spark.operators import dedup as dd

    spark = _spark()
    docs = spark.read.parquet(docs_dir)
    for arm in ("string", "tokhash"):
        for salt in ("recallprobe", "recallprobe2", "recallprobe3"):
            inset = dd.miner_recall_probe(
                docs,
                lambda s, a=arm: dd.minhash_near_dup_pairs(
                    s, "doc_id", "text", shingle_impl=a
                ),
                n_sample=300,
                salt=salt,
            )

            def cross(new, ref, a=arm):
                return dd.minhash_cross_near_dup(
                    dd.minhash_signatures(
                        new, "doc_id", "text", shingle_impl=a
                    ),
                    dd.minhash_signatures(
                        ref, "doc_id", "text", shingle_impl=a
                    ),
                    cap_strategy="representative",
                )

            crossr = dd.cross_miner_recall_probe(
                docs, cross, n_sample=300, salt=salt
            )
            print(
                json.dumps(
                    {
                        "probe_arm": arm,
                        "salt": salt,
                        "inset_recall": inset["recall"],
                        "inset_precision": inset["precision"],
                        "inset_true_pairs": inset["true_pairs"],
                        "cross_recall": crossr["recall"],
                        "cross_flag_recall": crossr.get("flag_recall"),
                        "cross_true_pairs": crossr["true_pairs"],
                    }
                ),
                flush=True,
            )
    spark.stop()


def cmd_regime(docs_dir: str) -> None:
    """The auto pair_screen decision derives from the band-bucket size
    distribution — a property of the CORPUS, not the hash family; both
    arms must pick the same screen."""
    from mapreduce_implementation_spark.operators import dedup as dd

    spark = _spark()
    docs = spark.read.parquet(docs_dir)
    for arm in ("string", "tokhash"):
        sigs = dd.minhash_signatures(docs, "doc_id", "text", shingle_impl=arm)
        counts, (sr, sg, br) = dd._counts_with_stats(
            dd._minhash_banded(sigs, "doc_id", 4, 4),
            ("band_id", "band_hash"),
            dd.DEFAULT_MAX_BUCKET,
        )
        screen = dd.choose_pair_screen(
            sr, sg, br, dd.DEFAULT_MAX_BUCKET, False
        )
        print(
            json.dumps(
                {
                    "regime_arm": arm, "screen": screen,
                    "small_rows": sr, "small_groups": sg, "big_rows": br,
                }
            ),
            flush=True,
        )
    spark.stop()


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "synth":
        cmd_synth(int(sys.argv[2]), sys.argv[3])
    elif cmd == "measure":
        cmd_measure(sys.argv[2], sys.argv[3], sys.argv[4])
    elif cmd == "probes":
        cmd_probes(sys.argv[2])
    elif cmd == "regime":
        cmd_regime(sys.argv[2])
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
