#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is materialized with the noop sink (full execution, no
driver-side row transfer) so timings measure the engine, not collect().
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_implementation_spark import get_spark
from mapreduce_implementation_spark.plans import headline_queries


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="mris-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/shuffle warmup (excluded from timings): one tiny scan
    # plus one real shuffle so the first timed query isn't charged for
    # executor/codegen spin-up
    materialize(spark.read.parquet(os.path.join(sf_dir, "region.parquet")))
    materialize(
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        .groupBy("n_regionkey")
        .count()
    )

    # Two timed runs per query, report the MIN: the host is a shared
    # microVM where identical plans have varied up to 80× under external
    # contention (see BASELINE.md) — min-of-2 recovers the engine cost,
    # not the neighbors'.
    timings: dict[str, float] = {}
    for name, q in headline_queries().items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    out = {
        "metric": "headline query wall-clock, noop sink, min of 2 runs",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs_per_query": 2,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
