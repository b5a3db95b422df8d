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


def test_retention_target_composes_into_pipeline(spark):
    """Round-10 verdict item 9: CorpusPipelineConfig accepts a
    RETENTION target and derives the quality floor in-pipeline (one
    percentile_approx pass) instead of requiring a hand-picked
    min_quality. Gates: (a) the derived-floor build is row-identical
    to passing the externally derived floor as min_quality; (b) the
    gate actually retains ~= the target; (c) both floors at once is
    an error."""
    import pytest

    from mapreduce_implementation_spark.functions.textstats import (
        quality_gate,
        quality_threshold_for_retention,
    )
    from mapreduce_implementation_spark.operators.pipeline import (
        CorpusPipelineConfig,
        build_training_corpus,
    )

    docs = load_table(spark, SF, "documents")
    target = 0.8

    art = build_training_corpus(
        docs,
        CorpusPipelineConfig(
            split_weights={"train": 1.0}, retention_target=target
        ),
    )
    floor = quality_threshold_for_retention(docs, target)
    art_manual = build_training_corpus(
        docs,
        CorpusPipelineConfig(split_weights={"train": 1.0}, min_quality=floor),
    )
    got = sorted(r.doc_id for r in art["split_train"].select("doc_id").collect())
    want = sorted(
        r.doc_id for r in art_manual["split_train"].select("doc_id").collect()
    )
    assert got == want and got

    # the derived floor retains ~= the target fraction of non-NULL docs
    # (>= by the tie rule, minus sketch approximation error)
    non_null = docs.where(F.col("text").isNotNull())
    kept = quality_gate(non_null, min_quality=floor).count()
    ratio = kept / non_null.count()
    assert target - 0.05 <= ratio <= target + 0.1, ratio

    with pytest.raises(ValueError, match="not both"):
        build_training_corpus(
            docs,
            CorpusPipelineConfig(retention_target=0.8, min_quality=0.5),
        )


def test_write_training_shards_layout_contract(spark, tmp_path):
    """The materialized artifact: every chunk exactly once, packs never
    straddle shards, and each shard file is physically ordered by
    (pack_id, pack_slot) so sequence assembly is a linear read."""
    import glob

    from mapreduce_implementation_spark.operators.pipeline import (
        build_training_corpus,
        write_training_shards,
    )

    docs = load_table(spark, SF, "documents")
    art = build_training_corpus(docs)
    out = str(tmp_path / "shards")
    n_shards = 4
    write_training_shards(art["chunks"], art["packed"], out, n_shards)

    shard_dirs = sorted(glob.glob(out + "/shard=*"))
    # hashed assignment: ~100 packs over 4 shards leaves an empty shard
    # with probability ~4*(3/4)^100 — all shards must materialize
    assert len(shard_dirs) == n_shards
    total = 0
    pack_shard: dict[int, int] = {}
    for d in shard_dirs:
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1, d  # one ordered file per shard
        import pyarrow.parquet as pq

        t = pq.read_table(files[0], columns=["pack_id", "pack_slot"])
        order = list(zip(t["pack_id"].to_pylist(), t["pack_slot"].to_pylist()))
        assert order == sorted(order), d  # physical row order contract
        shard_val = int(d.rsplit("=", 1)[1])
        for p, _ in order:
            # a pack never straddles shards
            assert pack_shard.setdefault(p, shard_val) == shard_val
        total += len(order)
    n_chunks = art["chunks"].count()
    assert total == n_chunks > 0
    back = spark.read.parquet(out)
    assert back.select("chunk_key").distinct().count() == n_chunks
