#!/usr/bin/env python
"""Per-phase decomposition of the expensive headline queries at sf0.1.

Times each build phase of the dedup family (signature table write,
counts job, pair join) and the single-action queries with the noop sink,
in ONE warm process (after a warmup pass), min of N. This is a
diagnostic harness, not the bench: absolute numbers are only compared
WITHIN this process.

Usage: python tools_r16/decompose.py [phase ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_implementation_spark import get_spark
from measure_protocol import materialize

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best:7.3f} s")
    return best


def main() -> None:
    spark = get_spark(app_name="mris-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators import dedup as dd
    from mapreduce_implementation_spark.plans.dedup_queries import (
        BANDS, K, ROWS,
    )
    from mapreduce_implementation_spark.sources.catalog import load_table
    from mapreduce_implementation_spark.sources.materialize import (
        ensure_table, scratch_dir,
    )

    docs = load_table(spark, SF, "documents")
    materialize(docs.select("doc_id"))  # warm scan

    # Phase 1: signature chain (no write)
    sigs_df = dd.minhash_signatures(docs, "doc_id", "text", shingle_n=3, k=K)
    t("sig chain compute (noop)", lambda: materialize(sigs_df))

    # Phase 2: ensure_table (write + read) — fresh path each run
    def build_table():
        path = os.path.join(scratch_dir("mris_dec_"), "sigs")
        return ensure_table(
            spark, path,
            lambda: dd.minhash_signatures(docs, "doc_id", "text", shingle_n=3, k=K),
        )

    t("ensure_table(sigs) write+read", lambda: build_table())

    sigs = build_table()

    # Phase 3: counts job (auto screen decision)
    t("counts+stats job (auto screen)", lambda: dd._counts_with_stats(
        dd._minhash_banded(sigs, "doc_id", BANDS, ROWS),
        ("band_id", "band_hash"), 1000,
    ))

    # Phase 4: full pair join given the signatures table
    pairs_df = dd.minhash_near_dup_pairs(
        docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS, rows=ROWS,
        threshold=0.5, signatures=sigs,
    )
    t("pairs from prebuilt sigs (incl counts)", lambda: materialize(
        dd.minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS, rows=ROWS,
            threshold=0.5, signatures=sigs,
        )
    ))
    t("pairs pinned screen join, cap window", lambda: materialize(
        dd.minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS, rows=ROWS,
            threshold=0.5, signatures=sigs, pair_screen="join",
        )
    ))

    # Full cold query for reference
    from mapreduce_implementation_spark.plans import all_queries
    ALL = all_queries()
    for name in (
        "minhash_near_dup_pairs", "dedup_clusters", "doc_quality",
        "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
        "simhash_near_dup_pairs", "events_asof_latest_order",
        "similarity_topk_bruteforce", "dedup_exact",
        "events_sessionization", "events_tumbling_5min",
        "wordcount", "token_stats",
    ):
        t(f"FULL {name}", lambda n=name: materialize(ALL[n].fn(spark, SF)))

    spark.stop()


if __name__ == "__main__":
    main()
