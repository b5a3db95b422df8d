#!/usr/bin/env python
"""Round-10 adjudication of the round-9 bench uptick (BASELINE.md
calibration protocol): targeted min-of-3 reruns with calibration rows,
plus a capped-vs-uncapped A/B isolating the DEFAULT_MAX_BUCKET=1000
plan change that round 9 introduced into the bench rows."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_implementation_spark import get_spark


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="mris-adjudicate-r10")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators import dedup as dd
    from mapreduce_implementation_spark.plans.dedup_queries import (
        BANDS, K, ROWS, _signature_table,
    )
    from mapreduce_implementation_spark.plans import all_queries
    from mapreduce_implementation_spark.sources.catalog import load_table

    # warmup (same as bench.py)
    materialize(spark.read.parquet(os.path.join(sf_dir, "region.parquet")))
    materialize(
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        .groupBy("n_regionkey").count()
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

    reg = all_queries()

    def minhash_variant(max_bucket):
        docs = load_table(spark, sf_dir, "documents")
        sigs = _signature_table(spark, sf_dir, docs)
        return dd.minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS,
            rows=ROWS, threshold=0.5, signatures=sigs,
            max_bucket=max_bucket,
        )

    targets = {
        "minhash_capped_default": lambda: minhash_variant(
            dd.DEFAULT_MAX_BUCKET
        ),
        "minhash_uncapped_r8_shape": lambda: minhash_variant(None),
        "dedup_clusters": lambda: reg["dedup_clusters"].fn(spark, sf_dir),
        "similarity_topk_bruteforce": lambda: reg[
            "similarity_topk_bruteforce"
        ].fn(spark, sf_dir),
    }

    out: dict = {"calibration_before": calib(), "runs": {}}
    for name, fn in targets.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(fn())
            runs.append(round(time.perf_counter() - t0, 3))
        out["runs"][name] = runs
    out["calibration_after"] = calib()
    out["min"] = {k: min(v) for k, v in out["runs"].items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
