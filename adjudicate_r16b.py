#!/usr/bin/env python
"""Round-16 adjudication (b): the duplicate_span_stats span kernel,
``span_impl="tokhash"`` (JVM per-position slice-hash HOF + distinct +
explode) vs ``span_impl="fused"`` (mapInPandas numpy replay of the
xxhash64 slice chain — functions/xxh64np.py — with lexsort per-doc
distinct), at the operator's production shape (n=20, exact mode).

Why: the fused minhash kernel won 1.76× at 1M docs (BASELINE.md r16
continued) by never running the JVM slice-hash stage; the span kernel
is the same pattern at n=20 — 20 chained hashLong passes per gram in
numpy vs one 20-long slice allocation + interpreted hash per gram on
the JVM. The n=20 chain costs the numpy arm ~7× more vector passes
than shingle_n=3 did, so the verdict is NOT implied by the minhash
one — measure it.

PROTOCOL (measure_protocol.py, the r15 rules): fresh process per
timed run; canary-first; arms interleaved at the PROCESS level;
min-of-N per arm; value parity checked in-run (untimed) via an
order-insensitive digest over the full output frame.

Usage:
    python adjudicate_r16b.py synth N_DOCS DOCS_DIR
    python adjudicate_r16b.py measure {tokhash|fused} DOCS_DIR
    python adjudicate_r16b.py parity DOCS_DIR

Interleaved sweep:
    for r in 1 2 3; do for impl in tokhash fused; do
      python adjudicate_r16b.py measure $impl $DIR; done; done
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
    spark = get_spark(app_name="mris-adjudicate-r16b")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _build(spark, span_impl: str, docs_dir: str):
    from mapreduce_implementation_spark.operators.contamination import (
        duplicate_span_stats,
    )

    docs = spark.read.parquet(docs_dir)
    return duplicate_span_stats(docs, n=20, span_impl=span_impl)


def _digest(out) -> int:
    from pyspark.sql import functions as F

    row = (
        out.select(
            F.xxhash64(
                F.col("doc_id"),
                F.col("n_spans"),
                F.col("n_dup_spans"),
                # frac is a pure function of the two counts; hashing the
                # counts alone keeps the digest float-free
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("d"))
        .first()
    )
    return int(row.d) if row.d is not None else 0


def cmd_synth(n_docs: int, docs_dir: str) -> None:
    spark = _spark()
    gen = synth_corpus(spark, n_docs, docs_dir)
    print(json.dumps({"synth": n_docs, "gen_sec": round(gen, 2)}), flush=True)
    spark.stop()


def cmd_measure(span_impl: str, docs_dir: str) -> None:
    spark = _spark()
    stamp = protocol_stamp(spark)
    t0 = time.perf_counter()
    materialize(_build(spark, span_impl, docs_dir))
    sec = round(time.perf_counter() - t0, 2)
    digest = _digest(_build(spark, span_impl, docs_dir))
    print(
        json.dumps(
            {"span_impl": span_impl, "sec": sec, "digest": digest, **stamp}
        ),
        flush=True,
    )
    spark.stop()


def cmd_parity(docs_dir: str) -> None:
    spark = _spark()
    d = {
        impl: _digest(_build(spark, impl, docs_dir))
        for impl in ("tokhash", "fused")
    }
    print(json.dumps({**d, "equal": d["tokhash"] == d["fused"]}), flush=True)
    spark.stop()


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "synth":
        cmd_synth(int(sys.argv[2]), sys.argv[3])
    elif cmd == "measure":
        cmd_measure(sys.argv[2], sys.argv[3])
    elif cmd == "parity":
        cmd_parity(sys.argv[2])
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
