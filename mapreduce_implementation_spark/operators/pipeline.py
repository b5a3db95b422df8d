"""Batch LLM-training-corpus pipeline — the composed dataflow as a
reusable API: corpus mixing → exact dedup → train/holdout split →
token-budget chunking → sequence packing.

This is pure composition of the stage operators (operators/sampling,
operators/dedup, operators/chunking, operators/packing) — no new
semantics; the oracle-gated registry twin
(plans/pipeline_queries.pipeline_sample_dedup_chunk_pack) hash-checks
the same dataflow against DuckDB, and streaming/pipeline.py is the
unbounded-input face. Shuffle budget: dedup groupBy + survivor join +
pack bucket groupBy; mixing, splitting and chunking stay map-only
(plan-gated in tests/test_plans.py). Opting into ``near_dup`` adds the
MinHash band join + cluster labeling + one anti-join — the standard
fuzzy-dedup spend.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_implementation_spark.functions.textstats import quality_gate
from mapreduce_implementation_spark.operators import sampling as sp
from mapreduce_implementation_spark.operators.chunking import (
    chunk_documents,
    keyed_chunks,
)
from mapreduce_implementation_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    exact_dedup,
)
from mapreduce_implementation_spark.operators.packing import (
    pack_greedy,
    pack_stats,
)


def require_integral_id(df: DataFrame, id_col: str) -> None:
    """The chunk_key arithmetic (id * stride + idx) silently casts a
    string id to NULL — refuse loudly instead."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dtype = df.schema[id_col].dataType
    if not isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"id column {id_col!r} must be integral for the chunk_key "
            f"encoding, got {dtype}; map string ids to DENSE longs first "
            "(a raw 64-bit hash like xxhash64 overflows the stride "
            "encoding — keyed_chunks guards the bound per row)"
        )


@dataclass(frozen=True)
class CorpusPipelineConfig:
    """Knobs for one corpus build; defaults are the bench-scale shape.

    ``hash_method``: "xxhash64" (fastest) or "md5" (engine-portable
    membership — use when the split must be reproducible outside Spark,
    e.g. warehouse audits). ``rows_hint``: estimated CHUNK count, drives
    pack bucket sizing (operators/packing sizing rule); at 100 TB always
    set it (or n_buckets) — the 64-bucket default is test-scale."""

    mix_fractions: Mapping[str, float] = field(default_factory=dict)
    mix_default: float = 1.0
    mix_salt: str = "mix"
    stratum_col: str = "lang"
    min_quality: float | None = None  # textstats.quality_score floor
    # RETENTION-target alternative to a hand-picked min_quality: "keep
    # the best X%" — the way corpus specs are actually written. The
    # floor is derived in-pipeline via ONE percentile_approx pass over
    # the quality score (functions/textstats.
    # quality_threshold_for_retention) before the gates run; mutually
    # exclusive with min_quality (two floors would be ambiguous).
    retention_target: float | None = None
    # Gopher-style repetition cap: drop docs whose single most frequent
    # token exceeds this fraction of all tokens (None = no cap)
    max_top_token_frac: float | None = None
    # redact PII-shaped spans (functions/scrub.py) before chunking
    scrub: bool = False
    # MinHash near-dup CLUSTER dedup after exact dedup (keep the min-id
    # doc per connected component of the near-dup pair graph — the
    # fuzzy-dedup stage every web-scale corpus build runs). Cluster
    # semantics, not pair semantics: a doc whose only near-dup edges
    # point at larger ids still drops when it isn't its cluster's min.
    near_dup: bool = False
    near_dup_threshold: float = 0.5
    near_dup_bands: int = 4
    near_dup_rows: int = 4
    near_dup_shingle_n: int = 3
    # boilerplate-cohort cap for the LSH buckets (operators/dedup
    # cap_buckets); finite by default (DEFAULT_MAX_BUCKET rationale in
    # operators/dedup.py) — None is the explicit keep-every-bucket
    # opt-out for oracle-exact parity runs
    near_dup_max_bucket: int | None = DEFAULT_MAX_BUCKET
    # signature family for the near-dup stage (round 15): "string"
    # (md5 over n-gram concat strings — the oracle-replayable default),
    # "tokhash" (shingle int64s from token-hash slices, built by the
    # r16 fused mapInArrow kernel — measured 2.36x signature build at
    # 1M docs vs the expr chain, BASELINE.md r16; re-probe recall per
    # corpus via calibrate_corpus at the same
    # family before adopting), or "auto" (round 16): adopt the family
    # the ``calibration`` report was measured under — the
    # calibrate_corpus pre-flight's recommendation when it ran with
    # shingle_impl="auto" — falling back to "string" with no report
    near_dup_shingle_impl: str = "string"
    # the calibrate_corpus report for THIS corpus at the near_dup_*
    # knobs (round 16): the miner reads its screen/cap decisions with
    # ZERO build-time Spark jobs and "auto" adopts its signature
    # family; structural knob mismatches (k/bands/rows/shingle_n/
    # max_bucket/family) raise via the miner's calibration check
    calibration: dict | None = None
    split_weights: Mapping[str, float] = field(
        default_factory=lambda: {"train": 0.9, "holdout": 0.1}
    )
    split_salt: str = "split"
    train_split: str = "train"
    chunk_tokens: int = 512
    overlap: int = 0
    pack_budget: int = 1024
    n_buckets: int | None = None
    rows_hint: int | None = None
    key_stride: int = 1 << 32
    hash_method: str = "xxhash64"


def build_training_corpus(
    docs: DataFrame,
    cfg: CorpusPipelineConfig = CorpusPipelineConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Run the full corpus build; returns every artifact a pipeline
    owner needs (lazy — materialize what you use — except the
    ``near_dup`` stage, which eagerly materializes its signature table
    to scratch once per call):

    * ``splits``-prefixed frames (``split_<name>``): deduped documents
      per split — provably disjoint (hash ranges), holdout untouched by
      everything downstream.
    * ``chunks``: train-split chunks with collision-free ``chunk_key``
      (``id * key_stride + chunk_idx``).
    * ``packed``: chunk→pack assignment (exactly-once, per-pack token
      sum <= budget, deterministic under retry/relayout).
    * ``stats``: per-pack utilization (padding waste monitor).
    """
    if cfg.train_split not in cfg.split_weights:
        raise ValueError(
            f"train_split {cfg.train_split!r} is not a split_weights key "
            f"{sorted(cfg.split_weights)}"
        )
    require_integral_id(docs, id_col)
    if cfg.retention_target is not None and cfg.min_quality is not None:
        raise ValueError(
            "pass retention_target OR min_quality, not both (two "
            "quality floors would be ambiguous)"
        )
    min_quality = cfg.min_quality
    if cfg.retention_target is not None:
        from mapreduce_implementation_spark.functions.textstats import (
            quality_threshold_for_retention,
        )

        # one percentile_approx pass (t-digest partials, no sort) over
        # the input corpus; the derived floor then rides the same
        # map-only gate prefix a hand-picked floor would
        min_quality = quality_threshold_for_retention(
            docs, cfg.retention_target, text_col=text_col
        )
    # scan-stage Column expressions — the gates ride the same map-only
    # prefix as mixing/splitting, zero added shuffle; empty docs have
    # repetition frac 0 and pass (length policy belongs to min_quality)
    filtered = quality_gate(
        docs,
        text_col,
        min_quality=min_quality,
        max_top_token_frac=cfg.max_top_token_frac,
    )
    if cfg.scrub:
        from mapreduce_implementation_spark.functions.scrub import scrub_pii

        # after the gates (scores rate the text as found), before dedup/
        # chunking (scrubbed text is what dedups and ships) — still the
        # same map-only scan prefix
        filtered = filtered.withColumn(text_col, scrub_pii(text_col))
    mixed = (
        sp.stratified_sample(
            filtered,
            cfg.stratum_col,
            cfg.mix_fractions,
            key_col=id_col,
            default_fraction=cfg.mix_default,
            salt=cfg.mix_salt,
            method=cfg.hash_method,
        )
        if cfg.mix_fractions or cfg.mix_default < 1.0
        else filtered
    )
    survivors = exact_dedup(mixed, id_col, text_col).select(
        F.col("survivor_id").alias(id_col)
    )
    deduped = mixed.join(survivors, id_col, "semi")
    if cfg.near_dup:
        import os as _os

        from mapreduce_implementation_spark.operators.dedup import (
            connected_components,
            minhash_band_stats,
            minhash_near_dup_pairs,
            minhash_signatures,
        )
        from mapreduce_implementation_spark.sources.materialize import (
            ensure_table,
            scratch_dir,
        )

        # pair mining + component labeling over the EXACT-deduped set
        # (identical docs are already collapsed, so the LSH buckets
        # aren't wasted re-pairing byte-identical copies); keep the
        # min-id doc per cluster, drop the rest via anti-join. Runs
        # BEFORE the split so no split can hold a near-dup of another.
        # Signatures are MATERIALIZED to a scratch table and passed in:
        # the operator's signatures=None fallback session-caches the
        # frame with no release path a library caller would ever hit
        # (registry queries release via caching.release_caches; a
        # long-lived session building many corpora would pin one cached
        # frame per build) — the table is also the honest 100 TB
        # layout, shared by the band explode and both verify joins.
        k = cfg.near_dup_bands * cfg.near_dup_rows
        # "auto" adopts the calibration report's measured family
        # (round 16 — calibrate_corpus(shingle_impl="auto") stamps its
        # recommendation there); an EXPLICIT family that contradicts
        # the report raises inside the miner's calibration knob check
        shingle_impl = cfg.near_dup_shingle_impl
        if shingle_impl == "auto":
            cal = cfg.calibration or {}
            shingle_impl = cal.get("minhash", cal).get(
                "shingle_impl", "string"
            )
        root = scratch_dir("mris_pipeline_neardup_")
        sigs = ensure_table(
            docs.sparkSession,
            _os.path.join(root, "sigs"),
            lambda: minhash_signatures(
                deduped, id_col, text_col,
                shingle_n=cfg.near_dup_shingle_n, k=k,
                shingle_impl=shingle_impl,
                with_bands=(cfg.near_dup_bands, cfg.near_dup_rows),
            ),
        )
        # screen snapshot as the table build's second artifact (r17):
        # the miner then makes its build-time decisions with zero jobs;
        # an explicit calibration report still wins inside the miner
        stats = (
            None
            if cfg.calibration is not None
            else minhash_band_stats(
                docs.sparkSession, sigs,
                _os.path.join(root, "sigs_bandstats"),
                bands=cfg.near_dup_bands, rows=cfg.near_dup_rows,
                max_bucket=cfg.near_dup_max_bucket,
            )
        )
        pairs = minhash_near_dup_pairs(
            deduped,
            id_col,
            text_col,
            shingle_n=cfg.near_dup_shingle_n,
            k=k,
            bands=cfg.near_dup_bands,
            rows=cfg.near_dup_rows,
            threshold=cfg.near_dup_threshold,
            max_bucket=cfg.near_dup_max_bucket,
            signatures=sigs,
            shingle_impl=shingle_impl,
            calibration=cfg.calibration,
            band_stats=stats,
        )
        clusters = connected_components(pairs, "doc_a", "doc_b")
        near_drops = clusters.where(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias(id_col))
        deduped = deduped.join(near_drops, id_col, "anti")
    splits = sp.split_by_hash(
        deduped,
        id_col,
        cfg.split_weights,
        salt=cfg.split_salt,
        method=cfg.hash_method,
    )
    train = splits[cfg.train_split]
    chunks = keyed_chunks(
        chunk_documents(
            train,
            id_col=id_col,
            text_col=text_col,
            chunk_tokens=cfg.chunk_tokens,
            overlap=cfg.overlap,
        ),
        id_col=id_col,
        key_stride=cfg.key_stride,
    )
    packed = pack_greedy(
        chunks.select("chunk_key", "n_tokens"),
        "chunk_key",
        "n_tokens",
        cfg.pack_budget,
        n_buckets=cfg.n_buckets,
        rows_hint=cfg.rows_hint,
    )
    out: dict[str, DataFrame] = {
        f"split_{name}": df for name, df in splits.items()
    }
    out["chunks"] = chunks
    out["packed"] = packed
    out["stats"] = pack_stats(packed, "n_tokens", cfg.pack_budget)
    return out


def write_training_shards(
    chunks: DataFrame,
    packed: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "chunk_key",
) -> None:
    """Materialize the training-ready artifact: chunk text joined to its
    pack assignment, sharded and ORDERED so a trainer can stream each
    shard sequentially and see every pack contiguous in slot order.

    Layout contract: ``out_dir/shard=<s>/`` holds one parquet file whose
    row order is (pack_id, pack_slot) ascending — a pack's rows are
    contiguous and in insertion order, so sequence assembly is a linear
    read, no sort at training time. Shard assignment is
    ``pmod(xxhash64(pack_id), n_shards)``: packs never straddle shards,
    and the hash keeps shards balanced regardless of the pack-id
    structure (ids are ``bucket * 2^32 + local_idx`` — a plain modulo
    collapses onto ``local_idx % n`` whenever n divides 2^32, which is
    every power of two).

    Shuffle budget: the chunk_key equi-join (chunks × assignments) and
    the shard repartition — both keyed and skew-free. One task per
    shard writes one ordered file; size ``n_shards`` so a shard is a
    task-sized write (the same rows-per-task rule as pack bucketing),
    NOT small enough to serialize the corpus through a handful of
    writers."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    rows = chunks.join(packed.select(key_col, "pack_id", "pack_slot"), key_col)
    (
        rows.withColumn(
            "shard", F.pmod(F.xxhash64("pack_id"), F.lit(n_shards))
        )
        .repartition(n_shards, "shard")
        # shard FIRST: the parquet writer requires task rows ordered by
        # the partition columns and inserts its own (non-stable) sort
        # when they aren't the prefix — which would scramble the
        # (pack_id, pack_slot) contract
        .sortWithinPartitions("shard", "pack_id", "pack_slot")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def build_drop_list(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float | None = None,
    max_top_token_frac: float | None = None,
    near_dup_pairs: DataFrame | None = None,
    benchmark: DataFrame | None = None,
    contamination_threshold: float = 0.8,
    contamination_n: int = 3,
    max_dup_span_frac: float | None = None,
    dup_span_n: int = 20,
) -> DataFrame:
    """The auditable drop decision: DataFrame[id_col, reason] with one
    row per (document, applicable reason) — the artifact a corpus
    pipeline publishes so every exclusion is explainable. Reasons:

    * ``null_text`` — the text column is NULL (quality_gate and
      build_training_corpus drop these unconditionally, so the drop
      list must too — and they must NOT enter the exact-dup grouping,
      where a shared NULL content hash would crown one NULL-text doc a
      "survivor" and mislabel the rest ``exact_dup``);
    * ``exact_dup`` — another doc has identical normalized content and
      a smaller id (the survivor stays);
    * ``near_dup`` — the doc is a non-minimum member of a connected
      component of the supplied near-dup pair graph
      (``near_dup_pairs``: DataFrame[doc_a, doc_b, ...] from any of
      the pair miners — MinHash, SimHash, n-gram, embedding). CLUSTER
      semantics, exactly matching build_training_corpus's keep-the-
      cluster-min rule: for pairs {(1,3),(2,3)} docs 2 AND 3 are
      tagged (pair semantics would tag only 3 and under-report what
      the corpus build excluded — the round-8 ADVICE divergence);
    * ``low_quality`` / ``repetitive`` — the quality floor / repetition
      cap, same expressions as quality_gate;
    * ``contaminated`` — distinct-n-gram overlap with ``benchmark``
      at/above ``contamination_threshold``;
    * ``dup_spans`` — more than ``max_dup_span_frac`` of the doc's
      distinct ``dup_span_n``-word spans appear verbatim in another
      document (substring-level duplication,
      operators/contamination.duplicate_span_stats).

    A document can carry several reasons (all are reported — dedup
    alone would hide that a kept-if-deduped doc was also contaminated).
    Compute is a union of the stage operators' own plans: nothing here
    re-derives semantics, so the drop list can never disagree with the
    pipeline that enforces it. Filter the corpus with an anti-join
    against the distinct ids."""
    from mapreduce_implementation_spark.functions.textstats import (
        _lower_tokens,
        quality_score,
        top_token_count,
    )
    from mapreduce_implementation_spark.operators.contamination import (
        ngram_contamination,
    )
    from mapreduce_implementation_spark.operators.dedup import (
        connected_components,
        exact_dedup,
    )

    def tagged(df: DataFrame, reason: str) -> DataFrame:
        return df.select(F.col(id_col), F.lit(reason).alias("reason"))

    parts: list[DataFrame] = []
    # NULL-text docs first: flagged with their own reason and EXCLUDED
    # from the exact-dup grouping (see docstring) — this keeps the drop
    # list in lockstep with quality_gate's unconditional NULL drop
    parts.append(
        tagged(docs.where(F.col(text_col).isNull()).select(id_col), "null_text")
    )
    non_null = docs.where(F.col(text_col).isNotNull())
    # exact dups: everyone who is not a survivor — anti-join against
    # the survivor id set (one shuffle; ids are unique so the anti-join
    # is exact)
    dups = exact_dedup(non_null, id_col, text_col)
    survivors = dups.select(F.col("survivor_id").alias(id_col))
    parts.append(
        tagged(non_null.select(id_col).join(survivors, id_col, "anti"), "exact_dup")
    )
    if near_dup_pairs is not None:
        # cluster semantics (connected components, drop non-min
        # members) — the SAME rule build_training_corpus enforces, so
        # the audit artifact reports exactly what the build excluded
        cc = connected_components(near_dup_pairs)
        parts.append(
            tagged(
                cc.where(F.col("doc_id") != F.col("cluster_id")).select(
                    F.col("doc_id").alias(id_col)
                ),
                "near_dup",
            )
        )
    if min_quality is not None or max_top_token_frac is not None:
        staged = docs.select(
            F.col(id_col),
            F.col(text_col),
            _lower_tokens(text_col).alias("_toks"),
        )
        if min_quality is not None:
            parts.append(
                tagged(
                    staged.where(
                        quality_score(text_col, toks=F.col("_toks"))
                        < min_quality
                    ),
                    "low_quality",
                )
            )
        if max_top_token_frac is not None:
            toks = F.col("_toks")
            parts.append(
                tagged(
                    staged.where(
                        top_token_count(toks).cast("double")
                        / F.greatest(F.size(toks).cast("long"), F.lit(1))
                        > max_top_token_frac
                    ),
                    "repetitive",
                )
            )
    if benchmark is not None:
        contam = ngram_contamination(
            docs, benchmark, id_col, text_col, n=contamination_n
        )
        parts.append(
            tagged(
                contam.where(
                    F.col("contamination_frac") >= contamination_threshold
                ),
                "contaminated",
            )
        )
    if max_dup_span_frac is not None:
        from mapreduce_implementation_spark.operators.contamination import (
            duplicate_span_stats,
        )

        spans = duplicate_span_stats(docs, id_col, text_col, n=dup_span_n)
        parts.append(
            tagged(
                spans.where(F.col("dup_span_frac") > max_dup_span_frac),
                "dup_spans",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
