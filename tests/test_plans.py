"""Physical-plan quality gates — the 100 TB design checks, asserted.

These read .explain() output: a correct-but-unscalable plan fails here
even when values match the oracle.
"""

from __future__ import annotations

from mapreduce_implementation_spark.plans import all_queries


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark, oracle_sf_dir):
    from mapreduce_implementation_spark.plans.relational_queries import (
        filter_pushdown_scan,
    )

    df = filter_pushdown_scan(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThanOrEqual(l_quantity" in plan, plan
    # projection pruned to the 4 selected columns at the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "l_comment" not in read_schema[0]
    assert "l_extendedprice" in read_schema[0] and "l_discount" not in read_schema[0]


def test_star_join_is_broadcast(spark, oracle_sf_dir):
    df = all_queries()["revenue_by_nation"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dims must broadcast, not shuffle"


def test_q1_partial_aggregation(spark, oracle_sf_dir):
    df = all_queries()["tpch_q1_pricing_summary"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    # partial (map-side) aggregate before the exchange
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") != plan.rindex("HashAggregate")


def test_global_topk_avoids_full_sort(spark, oracle_sf_dir):
    df = all_queries()["topk_global_orders"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_wordcount_prunes_to_text_column(spark, oracle_sf_dir):
    df = all_queries()["wordcount"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" in read_schema[0]
    assert "doc_id" not in read_schema[0] and "lang" not in read_schema[0]


def test_media_decode_prunes_unused_columns(spark, oracle_sf_dir):
    df = all_queries()["media_decode_dims"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    # the encode pass needs only doc_id — text/lang/n_chars all pruned
    assert read_schema and "doc_id" in read_schema[0]
    for col in ("text", "lang", "n_chars"):
        assert col not in read_schema[0]


def test_range_join_is_hash_join_not_nl(spark, oracle_sf_dir):
    df = all_queries()["events_range_join_click_purchase"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_merged_semi_anti_query_has_both_join_types(spark, oracle_sf_dir):
    """The consolidated semi+anti query must still plan BOTH dedicated
    join operators — the merge may not degrade either side."""
    df = all_queries()["semi_anti_join_customers"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan


def test_pivot_median_plans_two_phase_aggregation(spark, oracle_sf_dir):
    """Declared pivot values: the plan is the two-phase pivot aggregate
    (partial → exchange → pivot-first → exchange → final) and nothing
    more — an UNdeclared pivot would additionally run a whole
    distinct-values scan of the table before this plan exists."""
    df = all_queries()["pivot_median_orders_priority_by_status"].fn(
        spark, oracle_sf_dir
    )
    plan = explain_str(df)
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges <= 2, plan
    # partial aggregation below each exchange
    assert "ObjectHashAggregate" in plan or "HashAggregate" in plan


def test_multires_rollup_scans_events_once(spark, oracle_sf_dir):
    """All four tiers (5min/1h/1d/sliding) must derive from ONE scan of
    events via the cached 5-minute partials — the continuous-aggregate
    claim, asserted."""
    df = all_queries()["events_rollup_multires"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    # every tier reads the cached partials (the parquet scan lines in
    # the plan text are the one cached relation's description, repeated
    # with the same node id per reference)
    assert plan.count("InMemoryTableScan") >= 4, plan
    import re

    scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", plan))
    assert len(scan_ids) <= 1, plan


def test_asof_join_has_no_join_operator(spark, oracle_sf_dir):
    """The as-of join must be the union-sort-merge shape: zero Join
    operators in the physical plan (a theta-join + row_number form is
    per-key quadratic over the right history — the expansion AQE can't
    rescue)."""
    df = all_queries()["events_asof_latest_order"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "Join" not in plan, plan
    assert "Union" in plan and "Window" in plan, plan


def test_embedding_near_dup_blocks_on_srp_bucket(spark, oracle_sf_dir):
    """The candidate join must be an EQUI-join on the SRP bucket string
    (the only acceptable nested-loop is the bounded 4-plane broadcast
    scoring pass that computes the buckets)."""
    from mapreduce_implementation_spark.plans import dedup_queries as dq

    df = dq.embedding_near_dup_pairs(spark, oracle_sf_dir)
    plan = explain_str(df)
    # any hash EQUI-join on the bucket is fine (AQE broadcasts at this
    # size; at scale it becomes SMJ/SHJ) — never a nested loop
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan
    assert "bucket" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_prunes_partitions(spark, oracle_sf_dir):
    """The registered IVF query probes the MATERIALIZED centroid_id-
    partitioned index; the probe scan must carry a non-empty
    PartitionFilters on centroid_id — whole inverted-list directories
    pruned at planning time, the 100 TB ANN read path."""
    df = all_queries()["similarity_topk_ivf"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    probe = [l for l in pf_lines if "centroid_id" in l and ": []" not in l]
    assert probe, plan


def test_minhash_consumes_materialized_signature_table(spark, oracle_sf_dir):
    """All three signature consumers (band explode + both verify-join
    sides) must scan the per-invocation materialized artifact (tracked
    localCheckpoint since r17) — no session cache, no recomputation of
    the shingle/md5 chain per consumer, no raw-document scan, and the
    band hashes read from the table's PRECOMPUTED column (posexplode)
    instead of re-running md5-over-slice at mine time."""
    df = all_queries()["minhash_near_dup_pairs"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "InMemoryTableScan" not in plan, plan
    assert "ExistingRDD" in plan, plan  # the checkpointed artifact
    # the shingle/signature chain ran at build time: this plan never
    # touches the raw documents table
    assert "documents.parquet" not in plan, plan
    assert "_bands_4x4" in plan, plan  # stored band hashes consumed
    assert "md5" not in plan, plan  # ...so no runtime band hashing


def test_doc_quality_runs_the_arrow_kernel(spark, oracle_sf_dir):
    """r17: doc_quality's integer feature inputs come from ONE
    MapInArrow pass — no interpreted-HOF feature chain (aggregate /
    array_sort / array_distinct folds) may reappear in the plan."""
    df = all_queries()["doc_quality"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "MapInArrow" in plan, plan
    for hof in ("array_sort", "array_distinct", "aggregate("):
        assert hof not in plan, plan


def test_bucketed_join_avoids_shuffle(spark, oracle_sf_dir):
    """Co-located join via bucketing: both tables bucketed+sorted on the
    join key → SortMergeJoin with NO exchange on either side. At 100 TB
    this is how repeated joins on the same key amortize their shuffle
    to zero."""
    from mapreduce_implementation_spark.sources.catalog import load_table

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        load_table(spark, oracle_sf_dir, "orders").write.mode("overwrite").bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").saveAsTable("orders_bkt")
        load_table(spark, oracle_sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        ).write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable("lineitem_bkt")
        from pyspark.sql import functions as F

        joined = spark.table("orders_bkt").join(
            spark.table("lineitem_bkt"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_events_scan_pushdown_survives_ts_normalization(spark, oracle_sf_dir):
    """normalize_event_ts wraps every events scan in a ts conversion;
    that wrapper must NOT block Catalyst from pushing other-column
    filters into the scan or pruning unused columns. Gate on the range
    join: event_type equality must reach PushedFilters and `props`
    (unused) must be pruned from every events ReadSchema."""
    df = all_queries()["events_range_join_click_purchase"].fn(
        spark, oracle_sf_dir
    )
    plan = explain_str(df)
    assert "EqualTo(event_type,click)" in plan, plan
    assert "EqualTo(event_type,purchase)" in plan, plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "props" not in line, line


def test_sample_and_chunk_stages_are_map_only(spark, oracle_sf_dir):
    """The pipeline's sampling + chunking prefix must add ZERO exchanges:
    hash-bucket filters and the chunk explode are scan-stage work, so at
    100 TB they run at scan parallelism with no shuffle. (The full
    composed query then adds exactly its documented shuffles: dedup
    groupBy, survivor join, pack bucket groupBy.)"""
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators import sampling as sp
    from mapreduce_implementation_spark.operators.chunking import (
        chunk_documents,
    )
    from mapreduce_implementation_spark.sources.catalog import load_table

    docs = load_table(spark, oracle_sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    samp = sp.stratified_sample(
        docs, "lang", {"en": 1.0, "es": 0.5}, key_col="doc_id",
        default_fraction=0.25, salt="mix", method="md5",
    )
    train = sp.split_by_hash(
        samp, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="split", method="md5",
    )["train"]
    chunks = chunk_documents(train, chunk_tokens=16, overlap=4)
    plan = explain_str(chunks)
    assert "Exchange" not in plan, plan


def test_split_by_hash_is_scan_stage_filter(spark, oracle_sf_dir):
    """Each split is a plain Filter over the scan — no exchange, no
    subquery; the xxhash64 default stays inside whole-stage codegen."""
    from mapreduce_implementation_spark.operators import sampling as sp
    from mapreduce_implementation_spark.sources.catalog import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    splits = sp.split_by_hash(docs, "doc_id", {"a": 0.5, "b": 0.5})
    plan = explain_str(splits["a"])
    assert "Exchange" not in plan
    assert "xxhash64" in plan
    # the filter runs inside a codegen stage (formatted explain tags
    # codegen'd operators with "[codegen id : N]")
    assert "codegen id" in plan


def test_funnel_has_no_join_chain(spark, oracle_sf_dir):
    """The funnel must be the sorted-fold shape: zero Join operators
    (the naive K-step formulation is a K-way self-join chain — K
    shuffles of the full event set), exactly one exchange keyed on the
    user before the tiny final count."""
    df = all_queries()["events_funnel_view_click_purchase"].fn(
        spark, oracle_sf_dir
    )
    plan = explain_str(df)
    assert "Join" not in plan, plan
    # one user-keyed exchange + the single-partition final agg exchange
    # (formatted explain lists each node once in the tree and once as a
    # "(n) Exchange" detail header — count the headers)
    assert plan.count(") Exchange") <= 2, plan
    # the event-type filter reaches the scan (only funnel steps read)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "In(event_type" in pushed[0], plan


def test_simhash_pairs_verify_is_fused_into_band_join(spark, oracle_sf_dir):
    """One equi self-join on (band_id, band_val) and NO second join:
    the Hamming verify rides the band join via the per-doc signature
    words (a re-join back to the signature table doubles the shuffle
    surface and was measured 5.7x slower at sf0.1)."""
    df = all_queries()["simhash_near_dup_pairs"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    joins = sum(
        plan.count(f") {j}")
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert joins == 1, plan
    assert "bit_count" in plan, plan


def test_contamination_benchmark_is_broadcast(spark, oracle_sf_dir):
    """The eval-gram side must broadcast (megabytes vs a 100 TB corpus);
    the only shuffle is the per-doc aggregation."""
    df = all_queries()["benchmark_contamination"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_ngram_registry_plan_has_no_window_cap(spark, oracle_sf_dir):
    """The registered ngram_jaccard_pairs runs max_bucket=None (oracle
    parity), so cap_buckets must be a plan-level NO-OP — no Window
    operator, no extra exchange beyond the fp self-join. The capped
    IN-SET variant (100 TB default) uses the WINDOW strategy — its
    exchange+sort on the bucket key is exactly what the self-join
    reuses (round-10 A/B: window 1.81 s vs anti-join 2.01 s at sf0.1
    minhash). The antijoin strategy — the cross-set/committed-side
    configuration — plans the broadcast heavy-hitter anti-join with no
    Window."""
    df = all_queries()["ngram_jaccard_pairs"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "Window" not in plan, plan

    from mapreduce_implementation_spark.operators import dedup as dd
    from mapreduce_implementation_spark.sources.catalog import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    capped_plan = explain_str(
        dd.ngram_jaccard_pairs(docs, "doc_id", "text", max_bucket=50)
    )
    assert "Window" in capped_plan, capped_plan

    staged = docs.selectExpr("doc_id", "pmod(doc_id, 7) as fp")
    anti_plan = explain_str(
        dd.cap_buckets(staged, ("fp",), 3, strategy="antijoin")
    )
    assert "Window" not in anti_plan, anti_plan
    assert "BroadcastHashJoin LeftAnti BuildRight" in anti_plan, anti_plan


def test_cross_set_miners_shuffle_only_banded_projections(spark, oracle_sf_dir):
    """Both incremental-ingest miners (MinHash + SimHash cross-set)
    must join on the band key with the signature payloads riding the
    banded rows — no nested-loop/cartesian fallback anywhere."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators import dedup as dd
    from mapreduce_implementation_spark.sources.catalog import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    msigs = dd.minhash_signatures(docs, "doc_id", "text", shingle_n=3, k=16)
    mh = dd.minhash_cross_near_dup(
        msigs.where(F.col("doc_id") % 2 == 1),
        msigs.where(F.col("doc_id") % 2 == 0),
        k=16, bands=4, rows=4, threshold=0.5,
    )
    ssigs = docs.select("doc_id", dd.token_hashes("text").alias("_hs")).select(
        "doc_id", dd.simhash_from_hashes(F.col("_hs"), 64).alias("simhash")
    )
    sh = dd.simhash_cross_near_dup(
        ssigs.where(F.col("doc_id") % 2 == 1),
        ssigs.where(F.col("doc_id") % 2 == 0),
        n_bits=64, bands=4, max_hamming=3,
    )
    for df in (mh, sh):
        plan = explain_str(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
