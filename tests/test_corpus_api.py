"""The build_training_corpus API: same guarantees as the hand-composed
e2e pipeline — disjoint splits, holdout leakage zero, exactly-once
packing, full-chain determinism — via one call."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.pipeline import (
    CorpusPipelineConfig,
    build_training_corpus,
)
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

CFG = CorpusPipelineConfig(
    mix_fractions={"en": 1.0, "es": 0.5},
    mix_default=0.25,
    chunk_tokens=100,
    overlap=10,
    pack_budget=256,
    n_buckets=4,
    hash_method="md5",
)


def test_corpus_build_artifacts_and_guarantees(spark):
    docs = load_table(spark, SF, "documents")
    art = build_training_corpus(docs, CFG)

    # splits disjoint + holdout present
    train_ids = {r.doc_id for r in art["split_train"].select("doc_id").collect()}
    hold_ids = {r.doc_id for r in art["split_holdout"].select("doc_id").collect()}
    assert train_ids and hold_ids and not (train_ids & hold_ids)

    # chunks derive only from train docs; packed is exactly-once
    chunk_doc_ids = {
        r.doc_id for r in art["chunks"].select("doc_id").distinct().collect()
    }
    assert chunk_doc_ids <= train_ids
    n_chunks = art["chunks"].count()
    assert art["packed"].count() == n_chunks > 0
    assert (
        art["packed"].select("chunk_key").distinct().count() == n_chunks
    )

    # budget respected, utilization sane
    stats = art["stats"]
    assert stats.where(F.col("n_tokens") > CFG.pack_budget).count() == 0
    assert stats.agg(F.avg("utilization")).collect()[0][0] > 0.5

    # the whole build is a pure function of (input, config)
    again = build_training_corpus(docs, CFG)
    assert sorted(map(tuple, art["packed"].collect())) == sorted(
        map(tuple, again["packed"].collect())
    )


def test_default_config_skips_mixing(spark):
    """Default config (no fractions, default 1.0) must not add the
    stratified filter — every non-null-text doc reaches the dedup."""
    docs = load_table(spark, SF, "documents")
    art = build_training_corpus(docs)
    total = sum(
        art[k].count() for k in art if k.startswith("split_")
    )
    from mapreduce_implementation_spark.functions.textstats import content_hash

    survivors = (
        docs.where(F.col("text").isNotNull())
        .select(content_hash("text").alias("h"))
        .distinct()
    )
    assert total == survivors.count()


def test_quality_floor_filters_before_dedup(spark):
    """min_quality gates the corpus at the scan stage: every surviving
    split doc scores >= the floor, and the filtered build is a strict
    subset of the unfiltered one."""
    from mapreduce_implementation_spark.functions.textstats import (
        quality_score,
    )

    docs = load_table(spark, SF, "documents")
    # the corpus median keeps the floor inside the actual score
    # distribution regardless of testdata regeneration
    floor = (
        docs.select(quality_score("text").alias("q"))
        .agg(F.expr("percentile(q, 0.5)").alias("m"))
        .collect()[0]
        .m
    )
    art = build_training_corpus(
        docs, CorpusPipelineConfig(min_quality=floor)
    )
    kept = None
    for name in ("split_train", "split_holdout"):
        part = art[name].select(
            "doc_id", quality_score("text").alias("q")
        )
        assert part.where(F.col("q") < floor).count() == 0
        kept = part.count() if kept is None else kept + part.count()
    unfiltered = sum(
        build_training_corpus(docs)[k].count()
        for k in ("split_train", "split_holdout")
    )
    assert 0 < kept < unfiltered


def test_string_doc_id_rejected_loudly(spark):
    """A string id would silently become NULL under the chunk_key
    arithmetic — both pipeline faces must refuse with a clear error."""
    import pytest

    from mapreduce_implementation_spark.streaming.pipeline import (
        streaming_chunks,
    )

    df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    with pytest.raises(TypeError, match="integral"):
        build_training_corpus(df)
    with pytest.raises(TypeError, match="integral"):
        streaming_chunks(df)


def test_bad_train_split_rejected(spark):
    import pytest

    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="train_split"):
        build_training_corpus(
            docs, CorpusPipelineConfig(train_split="nope")
        )


def test_repetition_cap_drops_repetitive_docs(spark):
    """max_top_token_frac gates repetitive documents at the scan stage,
    and invalid caps are rejected loudly."""
    import pytest

    from mapreduce_implementation_spark.functions.textstats import (
        _lower_tokens,
        top_token_count,
    )

    docs = load_table(spark, SF, "documents")
    cap = 0.15  # sf fixture top_token_frac spans ~0.05-0.30
    art = build_training_corpus(
        docs, CorpusPipelineConfig(max_top_token_frac=cap)
    )
    toks = _lower_tokens("text")
    frac = top_token_count(toks).cast("double") / F.greatest(
        F.size(toks).cast("long"), F.lit(1)
    )
    for name in ("split_train", "split_holdout"):
        assert (
            art[name].select(frac.alias("f")).where(F.col("f") > cap).count()
            == 0
        )
    # the cap actually bites on this fixture
    total = sum(
        art[k].count() for k in ("split_train", "split_holdout")
    )
    unfiltered = sum(
        build_training_corpus(docs)[k].count()
        for k in ("split_train", "split_holdout")
    )
    assert total < unfiltered

    with pytest.raises(ValueError):
        build_training_corpus(
            docs, CorpusPipelineConfig(max_top_token_frac=0.0)
        )


def test_scrub_redacts_before_chunking(spark):
    """cfg.scrub=True: PII-shaped spans never reach the chunk text."""
    docs = spark.createDataFrame(
        [
            (1, "write to alice@example.com for the 555 123 4567 hotline"),
            (2, "clean text with no pii at all in it"),
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en"))
    art = build_training_corpus(
        docs,
        CorpusPipelineConfig(
            scrub=True, chunk_tokens=8, split_weights={"train": 1.0}
        ),
    )
    texts = " ".join(r.chunk_text for r in art["chunks"].collect())
    assert "<EMAIL>" in texts and "<NUMBER>" in texts
    assert "alice@example.com" not in texts and "4567" not in texts


def test_build_drop_list_reasons(spark):
    """Every drop reason fires on a crafted corpus, multi-reason docs
    report all applicable reasons, and clean docs are absent."""
    from mapreduce_implementation_spark.operators.pipeline import (
        build_drop_list,
    )

    rep = "spam " * 30
    good = "the quick brown fox jumps over a lazy dog with some more words"
    docs = spark.createDataFrame(
        [
            (1, good),                      # survivor of the 1/2 pair
            (2, good),                      # exact dup of 1
            (3, rep),                       # repetitive (and low quality)
            (4, "tiny"),                    # low quality (too short)
            (5, good + " unique tail here"),  # clean
            (6, "the quick brown fox jumps over a lazy dog exactly"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 6)], "doc_a long, doc_b long"
    )  # pretend a miner flagged 1~6
    out = build_drop_list(
        docs,
        min_quality=0.6,
        max_top_token_frac=0.5,
        near_dup_pairs=pairs,
        benchmark=bench,
        contamination_threshold=0.3,
    )
    reasons = {}
    for r in out.collect():
        reasons.setdefault(r.doc_id, set()).add(r.reason)
    assert reasons[2] == {"exact_dup"} or "contaminated" in reasons[2]
    assert "exact_dup" in reasons[2]
    assert "repetitive" in reasons[3]
    assert "low_quality" in reasons[4]  # score 0.5 < 0.6 floor
    assert "near_dup" in reasons[6]
    assert 5 not in reasons  # clean doc survives
    # contamination: docs containing the benchmark's trigrams
    assert "contaminated" in reasons.get(6, set()) or "contaminated" in reasons.get(2, set())


def test_build_drop_list_near_dup_cluster_semantics(spark):
    """near_dup uses CLUSTER semantics matching build_training_corpus:
    for pairs {(1,3),(2,3)} the component is {1,2,3} with min 1, so
    docs 2 AND 3 are tagged — pair semantics (larger id per pair) would
    tag only 3 and under-report what the corpus build excluded (the
    round-8 ADVICE divergence)."""
    from mapreduce_implementation_spark.operators.pipeline import (
        build_drop_list,
    )

    docs = spark.createDataFrame(
        [(i, f"distinct content number {i} " + "filler " * 5) for i in (1, 2, 3)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "doc_a long, doc_b long")
    out = build_drop_list(docs, near_dup_pairs=pairs)
    near = {r.doc_id for r in out.collect() if r.reason == "near_dup"}
    assert near == {2, 3}


def test_build_drop_list_null_text(spark):
    """NULL-text docs get an explicit null_text reason and never enter
    the exact-dup grouping (advisor finding r7: a shared NULL content
    hash crowned one NULL-text doc a 'survivor' and mislabeled the rest
    exact_dup — disagreeing with quality_gate, which drops them all)."""
    from mapreduce_implementation_spark.operators.pipeline import (
        build_drop_list,
    )

    docs = spark.createDataFrame(
        [(1, "real content here"), (2, None), (3, None), (4, "real content here")],
        "doc_id long, text string",
    )
    out = build_drop_list(docs)
    reasons = {}
    for r in out.collect():
        reasons.setdefault(r.doc_id, set()).add(r.reason)
    assert reasons[2] == {"null_text"} and reasons[3] == {"null_text"}
    assert reasons[4] == {"exact_dup"}  # dup of survivor 1
    assert 1 not in reasons  # the real survivor is kept


def test_build_training_corpus_near_dup_stage(spark):
    """cfg.near_dup wires MinHash pair mining + connected components
    into the corpus build: only the min-id doc of each near-dup CLUSTER
    survives into any split (cluster semantics — a doc drops even when
    its only edges point at larger ids), and the stage is off by
    default."""
    from mapreduce_implementation_spark.operators.pipeline import (
        CorpusPipelineConfig,
        build_training_corpus,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the birds sing in trees"
    )
    near = base.replace("lazy dog", "sleepy dog")
    far = "completely different content about catalyst plans and arrow batches with nothing shared"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)],
        "doc_id long, text string",
    )
    cfg = CorpusPipelineConfig(
        split_weights={"train": 1.0}, chunk_tokens=8, near_dup=True
    )
    art = build_training_corpus(docs, cfg)
    kept = {r.doc_id for r in art["split_train"].select("doc_id").collect()}
    # 4 is an exact dup of 1; 2 is a near dup clustered with 1 → only
    # the cluster min (1) and the unrelated doc (3) survive
    assert kept == {1, 3}

    off = build_training_corpus(
        docs, CorpusPipelineConfig(split_weights={"train": 1.0}, chunk_tokens=8)
    )
    kept_off = {r.doc_id for r in off["split_train"].select("doc_id").collect()}
    assert kept_off == {1, 2, 3}  # exact dedup only

    # r15: the tokhash signature family plumbs through the composed
    # build and clusters these high-J near-dups identically
    tok = build_training_corpus(
        docs,
        CorpusPipelineConfig(
            split_weights={"train": 1.0}, chunk_tokens=8, near_dup=True,
            near_dup_shingle_impl="tokhash",
        ),
    )
    kept_tok = {r.doc_id for r in tok["split_train"].select("doc_id").collect()}
    assert kept_tok == {1, 3}


def test_build_drop_list_dup_spans_reason(spark):
    """max_dup_span_frac adds the substring-duplication reason: docs
    sharing a verbatim long span are BOTH flagged (unlike dedup, which
    keeps a survivor — a shared-boilerplate signal is a per-doc fact),
    unique docs are not."""
    from mapreduce_implementation_spark.operators.pipeline import (
        build_drop_list,
    )

    passage = " ".join(f"w{i}" for i in range(24))
    docs = spark.createDataFrame(
        [
            (1, "intro one " + passage),
            (2, "different lead " + passage + " tail"),
            (3, " ".join(f"u{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    out = build_drop_list(docs, max_dup_span_frac=0.3, dup_span_n=20)
    reasons = {}
    for r in out.collect():
        reasons.setdefault(r.doc_id, set()).add(r.reason)
    assert "dup_spans" in reasons.get(1, set())
    assert "dup_spans" in reasons.get(2, set())
    assert "dup_spans" not in reasons.get(3, set())
