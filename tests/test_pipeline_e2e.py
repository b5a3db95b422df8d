"""End-to-end LLM-data-pipeline composition over the real corpus:
dedup → quality-ish filter → deterministic sample → chunk → pack.
Asserts the properties a pipeline owner needs to trust the whole
chain, not just each stage: reproducibility of the final artifact,
no leakage across the train/holdout boundary, and dense packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.chunking import chunk_documents
from mapreduce_implementation_spark.operators.dedup import exact_dedup
from mapreduce_implementation_spark.operators.packing import (
    pack_greedy,
    pack_stats,
)
from mapreduce_implementation_spark.operators import sampling as sp
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
BUDGET = 256


def _build(spark):
    docs = load_table(spark, SF, "documents")
    # exact_dedup returns one survivor per content hash; keep only the
    # surviving rows (semi join on survivor_id — one shuffle, no dup cols)
    survivors = exact_dedup(docs, "doc_id", "text").select(
        F.col("survivor_id").alias("doc_id")
    )
    deduped = docs.join(survivors, "doc_id", "semi")
    splits = sp.split_by_hash(deduped, "doc_id", {"train": 0.9, "holdout": 0.1})
    train = sp.hash_sample(splits["train"], "doc_id", 0.8, salt="mix")
    chunks = chunk_documents(train, chunk_tokens=100, overlap=10)
    keyed = chunks.select(
        (F.col("doc_id") * 1024 + F.col("chunk_idx")).alias("chunk_key"),
        F.col("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    packed = pack_greedy(keyed, "chunk_key", "n_tokens", BUDGET)
    return splits, train, keyed, packed


def test_pipeline_end_to_end(spark):
    splits, train, keyed, packed = _build(spark)

    # the doc_id*1024+chunk_idx key encoding (and its /1024 decode
    # below) requires <1024 chunks per document — pin it on the raw
    # chunk_idx (pre-encoding) so a fixture regeneration with longer
    # documents fails loudly, not by silent key collision
    max_idx = (
        chunk_documents(train, chunk_tokens=100, overlap=10)
        .agg(F.max("chunk_idx").alias("m"))
        .collect()[0]
        .m
    )
    assert max_idx < 1024, f"chunk_idx overflows the 1024 key stride: {max_idx}"

    # every surviving chunk packed exactly once
    assert packed.count() == keyed.count() > 0
    assert packed.groupBy("chunk_key").count().where("count > 1").count() == 0

    # no pack exceeds the budget; packing is dense
    stats = pack_stats(packed, "n_tokens", BUDGET)
    assert stats.where(F.col("n_tokens") > BUDGET).count() == 0
    assert stats.agg(F.avg("utilization")).collect()[0][0] > 0.6

    # zero leakage: packed chunks derive only from train-side doc_ids
    holdout_ids = {r.doc_id for r in splits["holdout"].select("doc_id").collect()}
    packed_doc_ids = {
        r.doc_id
        for r in packed.select((F.col("chunk_key") / 1024).cast("long").alias("doc_id"))
        .distinct()
        .collect()
    }
    assert not (packed_doc_ids & holdout_ids)

    # the whole chain is a pure function of the input: rebuild == rebuild
    _, _, _, packed2 = _build(spark)
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, packed2.collect())
    )
