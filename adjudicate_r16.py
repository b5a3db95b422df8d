#!/usr/bin/env python
"""Round-16 adjudication: the minhash signature permutation fold,
``impl="expr"`` (interpreted array_min(transform(...)) HOFs) vs
``impl="arrow"`` (mapInPandas, k vectorized passes +
np.minimum.reduceat), re-measured UNDER THE TOKHASH SHINGLE CHAIN
(verdict item 1).

Why re-measure: the r13 "arrow is a wash" verdict (expr 30.97 s vs
arrow 31.25 s at 1M docs) was taken when tokenize + ngram-concat +
array_distinct-over-strings + md5 dominated the chain. Round 15's
``shingle_impl="tokhash"`` deleted those stages, so the interpreted
permutation fold is now the dominant stage of the production build
(~9.6 s of the 19.4 s 1M-doc tokhash build per the r14 decomposition)
— AND it is the exact eval surface of the r15 JIT-profile lottery, so
vectorizing it would remove both the constant and the
measurement-fragility class for the most-benched operator family.

PROTOCOL (the r15 rules, now via measure_protocol.py): fresh process
per timed run; the HOF canary runs FIRST (seeds the JIT profile and
stamps the draw); arms interleave at the PROCESS level; min-of-N per
arm absorbs slow-process draws. Digest parity is checked in-run
(untimed) so every timed line doubles as a correctness witness.

Usage:
    python adjudicate_r16.py synth N_DOCS DOCS_DIR
    python adjudicate_r16.py measure {expr|arrow} {string|tokhash} DOCS_DIR
    python adjudicate_r16.py parity DOCS_DIR     # digest equality both chains

Interleaved sweep:
    for r in 1 2 3; do for impl in expr arrow; do
      python adjudicate_r16.py measure $impl tokhash $DIR; done; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_implementation_spark import get_spark
from measure_protocol import materialize, protocol_stamp
from scale_rehearsal import synth_corpus


def _spark():
    spark = get_spark(app_name="mris-adjudicate-r16")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _build(spark, impl: str, shingle_impl: str, docs_dir: str):
    from mapreduce_implementation_spark.operators import dedup as dd

    docs = spark.read.parquet(docs_dir)
    return dd.minhash_signatures(
        docs, "doc_id", "text", shingle_n=3, k=16,
        impl=impl, shingle_impl=shingle_impl,
    )


def _digest(sigs) -> int:
    """Order-insensitive content digest over (doc_id, sig) — NULL sig
    hashes as the row with a null json field, so the empty-shingle
    contract is part of the parity check."""
    from pyspark.sql import functions as F

    row = (
        sigs.select(
            F.xxhash64(F.col("doc_id"), F.to_json(F.struct("sig"))).alias(
                "h"
            )
        )
        .agg(F.expr("bit_xor(h)").alias("d"))  # xor: no ANSI overflow
        .first()
    )
    return int(row.d) if row.d is not None else 0


def cmd_synth(n_docs: int, docs_dir: str) -> None:
    spark = _spark()
    gen = synth_corpus(spark, n_docs, docs_dir)
    print(json.dumps({"synth": n_docs, "gen_sec": round(gen, 2)}), flush=True)
    spark.stop()


def cmd_measure(impl: str, shingle_impl: str, docs_dir: str) -> None:
    spark = _spark()
    stamp = protocol_stamp(spark)
    t0 = time.perf_counter()
    materialize(_build(spark, impl, shingle_impl, docs_dir))
    sec = round(time.perf_counter() - t0, 2)
    digest = _digest(_build(spark, impl, shingle_impl, docs_dir))
    print(
        json.dumps(
            {
                "impl": impl, "shingle_impl": shingle_impl,
                "sec": sec, "digest": digest, **stamp,
            }
        ),
        flush=True,
    )
    spark.stop()


def cmd_stage(shingle_impl: str, docs_dir: str) -> None:
    """Time the shingle-int stage ALONE (everything before the
    permutation fold) in a fresh process — total(build) - stage ≈ the
    fold's own share, the number the r14 decomposition put at ~9.6 s
    under tokhash.

    ``shingle_impl="th"`` times only scan → tokenize → per-token
    xxhash64 (the JVM residue of the FUSED build): total(fused) - th ≈
    the numpy kernel + Arrow transfer share."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.functions.text import tokens
    from mapreduce_implementation_spark.operators.dedup import (
        shingle_ints,
        shingle_ints_from_token_hashes,
        spread,
        token_hash_ints,
        word_ngrams,
    )

    spark = _spark()
    stamp = protocol_stamp(spark)
    docs = spark.read.parquet(docs_dir)
    base = spread(
        docs.select(F.col("doc_id"), F.col("text"))
    ).select("doc_id", tokens(F.lower(F.col("text")), mode="simple").alias("_toks"))
    if shingle_impl == "th":
        staged = base.select(
            "doc_id", token_hash_ints(F.col("_toks")).alias("_th")
        )
    elif shingle_impl == "tokhash":
        staged = base.select(
            "doc_id", token_hash_ints(F.col("_toks")).alias("_th")
        ).select(
            "doc_id",
            shingle_ints_from_token_hashes(F.col("_th"), 3).alias("_xs"),
        )
    else:
        staged = base.select(
            "doc_id",
            F.array_distinct(word_ngrams(F.col("_toks"), 3)).alias("sh"),
        ).select("doc_id", shingle_ints(F.col("sh")).alias("_xs"))
    t0 = time.perf_counter()
    materialize(staged)
    sec = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {"stage": "shingle_ints", "shingle_impl": shingle_impl,
             "sec": sec, **stamp}
        ),
        flush=True,
    )
    spark.stop()


def cmd_parity(docs_dir: str) -> None:
    """Digest equality expr==arrow under BOTH shingle chains, one
    process (parity is JIT-independent; only timings need fresh
    processes)."""
    spark = _spark()
    out = {}
    for shingle_impl in ("string", "tokhash"):
        impls = ("expr", "arrow", "fused") if shingle_impl == "tokhash" else (
            "expr", "arrow"
        )
        d = {
            impl: _digest(_build(spark, impl, shingle_impl, docs_dir))
            for impl in impls
        }
        out[shingle_impl] = {**d, "equal": len(set(d.values())) == 1}
    print(json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "synth":
        cmd_synth(int(sys.argv[2]), sys.argv[3])
    elif cmd == "measure":
        cmd_measure(sys.argv[2], sys.argv[3], sys.argv[4])
    elif cmd == "parity":
        cmd_parity(sys.argv[2])
    elif cmd == "stage":
        cmd_stage(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
