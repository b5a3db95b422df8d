"""Sequence packing: exactly-once assignment, budget respected,
utilization floor, determinism, oversize isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.chunking import chunk_documents
from mapreduce_implementation_spark.operators.packing import (
    pack_greedy,
    pack_stats,
)
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
BUDGET = 256


@pytest.fixture(scope="module")
def chunked(spark):
    """Real corpus chunks keyed by a synthetic unique chunk key."""
    docs = load_table(spark, SF, "documents")
    ch = chunk_documents(docs, chunk_tokens=100, overlap=0)
    # unique long key per chunk (doc_id * 1024 + chunk_idx)
    return ch.select(
        (F.col("doc_id") * 1024 + F.col("chunk_idx")).alias("chunk_key"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    ).cache()


def test_every_row_packed_exactly_once(spark, chunked):
    packed = pack_greedy(chunked, "chunk_key", "n_tokens", BUDGET)
    assert packed.count() == chunked.count()
    assert (
        packed.groupBy("chunk_key").count().where(F.col("count") > 1).count()
        == 0
    )


def test_budget_respected_and_utilization_floor(spark, chunked):
    packed = pack_greedy(chunked, "chunk_key", "n_tokens", BUDGET)
    stats = pack_stats(packed, "n_tokens", BUDGET)
    assert stats.where(F.col("n_tokens") > BUDGET).count() == 0
    # FFD on ~100-token chunks into 256: average utilization must beat
    # one-chunk-per-pack by a wide margin; 0.7 is a loose floor
    avg_util = stats.agg(F.avg("utilization")).collect()[0][0]
    assert avg_util > 0.7, avg_util
    # pack_slot enumerates 0..n_rows-1 within each pack
    slot_check = (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n"),
            F.max("pack_slot").alias("mx"),
            F.min("pack_slot").alias("mn"),
        )
        .where((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
    )
    assert slot_check.count() == 0


def test_packing_is_deterministic_across_layouts(spark, chunked):
    a = pack_greedy(chunked, "chunk_key", "n_tokens", BUDGET)
    b = pack_greedy(
        chunked.repartition(13), "chunk_key", "n_tokens", BUDGET
    )
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_oversize_rows_get_dedicated_packs(spark):
    df = spark.createDataFrame(
        [(1, 500), (2, 100), (3, 100), (4, 700)],
        "chunk_key long, n_tokens long",
    )
    packed = pack_greedy(df, "chunk_key", "n_tokens", BUDGET, n_buckets=1)
    by_key = {r.chunk_key: r.pack_id for r in packed.collect()}
    # oversize rows isolated, small rows share
    assert by_key[1] != by_key[2] and by_key[4] != by_key[2]
    assert by_key[1] != by_key[4]
    assert by_key[2] == by_key[3]


def test_invalid_params_raise(spark, chunked):
    with pytest.raises(ValueError):
        pack_greedy(chunked, "chunk_key", "n_tokens", 0)
    with pytest.raises(ValueError):
        pack_greedy(chunked, "chunk_key", "n_tokens", BUDGET, n_buckets=0)
