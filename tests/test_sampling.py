"""Deterministic sampling/splitting: reproducibility, disjointness,
fraction accuracy, and the map-only (no-shuffle) plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators import sampling as sp
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_hash_sample_fraction_and_determinism(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    a = sp.hash_sample(docs, "doc_id", 0.2)
    b = sp.hash_sample(docs, "doc_id", 0.2)
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # same decision every run
    # xxhash64 uniformity: expect ~n*0.2 ± a generous binomial bound
    assert abs(len(ids_a) - 0.2 * n) < 4 * (0.2 * 0.8 * n) ** 0.5 + 5


def test_hash_sample_salt_decorrelates(spark):
    docs = load_table(spark, SF, "documents")
    a = {r.doc_id for r in sp.hash_sample(docs, "doc_id", 0.5).collect()}
    b = {r.doc_id for r in sp.hash_sample(docs, "doc_id", 0.5, salt="eval").collect()}
    assert a != b  # different salt, different (independent) draw
    n = docs.count()
    # independent 50% draws overlap ~25% of the corpus, not ~50%
    assert abs(len(a & b) - 0.25 * n) < 0.1 * n


def test_hash_sample_is_map_only(spark):
    docs = load_table(spark, SF, "documents")
    plan = (
        sp.hash_sample(docs, "doc_id", 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan  # sampling must never shuffle


def test_stratified_sample_respects_per_stratum_rates(spark):
    docs = load_table(spark, SF, "documents")
    by_lang = {r.lang: r.cnt for r in docs.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    langs = sorted(by_lang)
    keep_all, keep_none = langs[0], langs[1] if len(langs) > 1 else None
    fractions = {keep_all: 1.0}
    if keep_none:
        fractions[keep_none] = 0.0
    out = sp.stratified_sample(docs, "lang", fractions, "doc_id",
                               default_fraction=0.5)
    got = {r.lang: r.cnt for r in out.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    assert got.get(keep_all) == by_lang[keep_all]  # 100% stratum intact
    if keep_none:
        assert keep_none not in got  # 0% stratum fully dropped
    for lang in langs[2:]:  # default 50% strata in a generous band
        frac = got.get(lang, 0) / by_lang[lang]
        assert 0.3 < frac < 0.7, (lang, frac)


def test_split_by_hash_disjoint_and_exhaustive(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    splits = sp.split_by_hash(docs, "doc_id",
                              {"train": 0.8, "val": 0.1, "test": 0.1})
    ids = {name: {r.doc_id for r in df.select("doc_id").collect()}
           for name, df in splits.items()}
    assert sum(len(s) for s in ids.values()) == n  # exhaustive
    assert not (ids["train"] & ids["val"])  # pairwise disjoint
    assert not (ids["train"] & ids["test"])
    assert not (ids["val"] & ids["test"])
    assert len(ids["train"]) > len(ids["val"])  # weights roughly respected
    # stable under re-evaluation
    again = sp.split_by_hash(docs, "doc_id",
                             {"train": 0.8, "val": 0.1, "test": 0.1})
    assert {r.doc_id for r in again["val"].collect()} == ids["val"]


def test_split_matches_duckdb_twin(spark):
    """Cross-engine pin: the bucket expression is plain xxhash64+pmod,
    so DuckDB can't replay it bit-for-bit (different hash) — instead
    pin the CONTRACT the twin would rely on: split membership is a
    pure function of doc_id, computable by re-running the same Spark
    expression on a second, differently-partitioned copy."""
    docs = load_table(spark, SF, "documents")
    shuffled = docs.repartition(7, "lang")  # different physical layout
    a = sp.split_by_hash(docs, "doc_id", {"x": 0.5, "y": 0.5})
    b = sp.split_by_hash(shuffled, "doc_id", {"x": 0.5, "y": 0.5})
    assert {r.doc_id for r in a["x"].collect()} == {
        r.doc_id for r in b["x"].collect()
    }


def test_invalid_fractions_raise(spark):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        sp.hash_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        sp.stratified_sample(docs, "lang", {"en": -0.1}, "doc_id")
    with pytest.raises(ValueError):
        sp.split_by_hash(docs, "doc_id", {})


def test_upsample_by_rate_multiplicity(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    up = sp.upsample_by_rate(docs, "doc_id", 2.5)
    per_key = up.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    assert {r.c for r in per_key} <= {2, 3}  # floor(2.5) or floor+1 copies
    total = sum(r.c for r in per_key)
    # expected multiplicity 2.5 per key, binomial band on the +1 draws
    assert abs(total - 2.5 * n) < 4 * (0.25 * n) ** 0.5 + 5
    # deterministic: same keys get the extra copy every run
    again = sp.upsample_by_rate(docs, "doc_id", 2.5)
    a = sorted((r.doc_id, r.c) for r in per_key)
    b = sorted(
        (r.doc_id, r.c)
        for r in again.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    )
    assert a == b
    # copy_idx enumerates 0..c-1 per key
    idx = sp.upsample_by_rate(docs.limit(20), "doc_id", 2.0)
    got = {}
    for r in idx.select("doc_id", "copy_idx").collect():
        got.setdefault(r.doc_id, []).append(r.copy_idx)
    assert all(sorted(v) == [0, 1] for v in got.values())


def test_upsample_below_one_is_sampling(spark):
    docs = load_table(spark, SF, "documents")
    up = {r.doc_id for r in sp.upsample_by_rate(docs, "doc_id", 0.3).collect()}
    samp = {r.doc_id for r in sp.hash_sample(docs, "doc_id", 0.3).collect()}
    assert up == samp  # same hash, same threshold, same keys


def test_upsample_is_map_only(spark):
    docs = load_table(spark, SF, "documents")
    plan = (
        sp.upsample_by_rate(docs, "doc_id", 3.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    with pytest.raises(ValueError):
        sp.upsample_by_rate(docs, "doc_id", -0.1)


def test_md5_method_matches_duckdb_bucketing(spark):
    """The md5 hash method is engine-portable: DuckDB derives the
    identical bucket from md5(str(key) || salt), so split membership
    itself is oracle-checkable (plans/pipeline_queries.py relies on
    this)."""
    import duckdb

    from mapreduce_implementation_spark.operators.sampling import (
        BUCKETS,
        hash_bucket,
    )

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    got = {
        r.k: r.b
        for r in df.select(
            "k", hash_bucket("k", salt="s1", method="md5").alias("b")
        ).collect()
    }
    want = {
        k: b
        for k, b in duckdb.sql(
            f"SELECT r AS k, CAST(concat('0x', substr(md5(concat(CAST(r AS VARCHAR), 's1')), 1, 8)) AS BIGINT) % {BUCKETS} AS b"
            " FROM range(0, 500) t(r)"
        ).fetchall()
    }
    assert got == want


def test_split_rejects_negative_weight(spark):
    df = spark.range(10)
    with pytest.raises(ValueError, match="must be >= 0"):
        sp.split_by_hash(df, "id", {"a": -0.5, "b": 1.5})


def test_hash_sample_md5_matches_duckdb_membership(spark):
    """hash_sample(method='md5') membership replayed row-for-row in
    DuckDB — the sample a pipeline owner draws here is reproducible in
    any md5-capable engine (warehouse audits, cross-engine backfills)."""
    import duckdb

    from mapreduce_implementation_spark.operators.sampling import BUCKETS

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = sorted(
        r.doc_id
        for r in sp.hash_sample(
            docs, "doc_id", 0.3, salt="aud", method="md5"
        ).collect()
    )
    want = sorted(
        k
        for (k,) in duckdb.sql(
            "SELECT doc_id FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
            f"WHERE CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 'aud')), 1, 8)) AS BIGINT) % {BUCKETS}"
            f" < {int(0.3 * BUCKETS)}"
        ).fetchall()
    )
    assert got == want and 0 < len(got) < 500


def test_upsample_md5_matches_duckdb_replay(spark):
    """upsample_by_rate(method='md5') copy multiplicity replayed in
    DuckDB: floor(rate) copies per key plus one iff the md5 bucket
    falls under frac(rate), copy_idx enumerating 0..n-1."""
    import duckdb

    from mapreduce_implementation_spark.operators.sampling import BUCKETS

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = sorted(
        (r.doc_id, r.copy_idx)
        for r in sp.upsample_by_rate(
            docs, "doc_id", 2.5, salt="up", method="md5"
        )
        .select("doc_id", "copy_idx")
        .collect()
    )
    frac_threshold = int(round(0.5 * BUCKETS))
    want = sorted(
        (k, c)
        for (k, c) in duckdb.sql(
            "WITH b AS (SELECT doc_id, 2 + (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 'up')), 1, 8)) AS BIGINT) "
            f"% {BUCKETS} < {frac_threshold})::INT AS copies "
            "FROM read_parquet('/root/testdata/sf0.001/documents.parquet')) "
            "SELECT doc_id, i AS copy_idx FROM b, unnest(generate_series(0, copies - 1)) AS u(i)"
        ).fetchall()
    )
    assert got == want
    # expected multiplicity ~rate: every key has 2 or 3 copies
    per_key: dict = {}
    for k, _ in got:
        per_key[k] = per_key.get(k, 0) + 1
    assert set(per_key.values()) <= {2, 3} and len(per_key) == 500


def test_md5_null_keys_get_a_bucket_not_dropped(spark):
    """concat propagating NULL would silently drop null-key rows from
    EVERY split; instead they hash like DuckDB's NULL-skipping concat
    (the salt alone) and stay in exactly one split."""
    import duckdb

    from mapreduce_implementation_spark.operators.sampling import (
        BUCKETS,
        hash_bucket,
    )

    df = spark.createDataFrame([(None,), (7,)], "k long")
    got = {
        r.k: r.b
        for r in df.select(
            "k", hash_bucket("k", salt="s", method="md5").alias("b")
        ).collect()
    }
    assert got[7] is not None and got[None] is not None
    want_null = duckdb.sql(
        f"SELECT CAST(concat('0x', substr(md5(concat(CAST(NULL AS VARCHAR), 's')), 1, 8)) AS BIGINT) % {BUCKETS}"
    ).fetchone()[0]
    assert got[None] == want_null

    splits = sp.split_by_hash(df, "k", {"a": 0.5, "b": 0.5}, method="md5")
    assert splits["a"].count() + splits["b"].count() == 2


def test_stratified_fixed_n_exact_counts_and_determinism(spark):
    """Exactly n rows per stratum (all rows of a smaller stratum),
    identical membership across physical relayouts, independent of
    salt, and validation rejects bad n."""
    from mapreduce_implementation_spark.operators.sampling import (
        stratified_fixed_n,
    )

    rows = [(i, "en" if i % 3 else "de") for i in range(90)] + [
        (1000 + i, "tiny") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_fixed_n(df, "lang", 10).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 10 and len(by_lang["de"]) == 10
    assert by_lang["tiny"] == {1000, 1001, 1002}  # smaller stratum kept whole

    relaid = stratified_fixed_n(df.repartition(7, "doc_id"), "lang", 10).collect()
    by_lang2: dict = {}
    for r in relaid:
        by_lang2.setdefault(r.lang, set()).add(r.doc_id)
    assert by_lang2 == by_lang  # pure function of keys, not layout

    other_salt = stratified_fixed_n(df, "lang", 10, salt="other").collect()
    other = {r.doc_id for r in other_salt if r.lang == "en"}
    assert other != by_lang["en"]  # independent decision per salt

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_per_stratum"):
        stratified_fixed_n(df, "lang", 0)


def test_stratified_fixed_n_matches_python_reference(spark):
    """Two-phase top-N equals a pure-Python re-derivation of 'the n
    smallest (md5-bucket, key) per stratum' on seeded random data —
    the selection is a function of keys alone, not of the plan."""
    import hashlib
    import random

    from mapreduce_implementation_spark.operators.sampling import (
        BUCKETS,
        stratified_fixed_n,
    )

    rng = random.Random(8)
    rows = [
        (rng.randrange(1_000_000), rng.choice(["en", "de", "fr", "zz"]))
        for _ in range(400)
    ]
    rows = list({r[0]: r for r in rows}.values())  # unique keys
    df = spark.createDataFrame(rows, "doc_id long, lang string").repartition(9)

    def bucket(k):
        hx = hashlib.md5(f"{k}fx".encode()).hexdigest()[:8]
        return int(hx, 16) % BUCKETS

    expected: dict = {}
    for k, lang in rows:
        expected.setdefault(lang, []).append((bucket(k), k))
    exp_sel = {
        (k, lang)
        for lang, pairs in expected.items()
        for _, k in sorted(pairs)[:7]
    }
    got = {
        (r.doc_id, r.lang)
        for r in stratified_fixed_n(
            df, "lang", 7, key_col="doc_id", salt="fx", method="md5"
        ).collect()
    }
    assert got == exp_sel


def test_stratified_fixed_n_phase2_guard(spark):
    """When N x estimated-partitions exceeds phase2_max_rows, an
    intermediate top-N level bounds the final window's input; results
    are BIT-IDENTICAL with and without the guard (the contraction
    preserves the per-stratum top-N superset property), and the
    guarded plan carries one extra Window level."""
    from mapreduce_implementation_spark.operators.sampling import (
        stratified_fixed_n,
    )

    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string").repartition(16)

    plain = stratified_fixed_n(df, "lang", 10)
    # force the guard: tiny ceiling -> 16 partitions * 10 > 40
    guarded = stratified_fixed_n(df, "lang", 10, phase2_max_rows=40)

    def plan(d):
        return d._sc._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )

    # exact node-header match: WindowGroupLimit also contains "Window"
    assert plan(guarded).count(") Window\n") == plan(plain).count(") Window\n") + 1
    got_p = sorted((r.lang, r.doc_id) for r in plain.collect())
    got_g = sorted((r.lang, r.doc_id) for r in guarded.collect())
    assert got_p == got_g
    assert len(got_g) == 30


# ---------------------------------------------------------------- token budget


def _budget_fixture(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    )
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    return docs, sorted(langs)


def test_token_budget_mass_and_crossing_doc(spark):
    """Selected token mass per listed stratum is >= budget (the crossing
    doc is included) and removing the LAST selected doc drops it under —
    i.e. the selection is minimal for the take-while rule."""
    from mapreduce_implementation_spark.functions.textstats import (
        token_count,
    )

    docs, langs = _budget_fixture(spark)
    budgets = {langs[0]: 400, langs[1]: 150}
    out = sp.stratified_token_budget(docs, "lang", budgets)
    got = (
        out.where(F.col("lang").isin(list(budgets)))
        .withColumn("tok", token_count("text"))
        .withColumn("h", sp.hash_bucket("doc_id", salt="tokbudget"))
        .collect()
    )
    for lang, budget in budgets.items():
        rows = sorted(
            (r for r in got if r.lang == lang),
            key=lambda r: (r.h, r.doc_id),
        )
        total = sum(r.tok for r in rows)
        stratum_total = sum(
            r.tok
            for r in docs.withColumn("tok", token_count("text"))
            .where(F.col("lang") == lang)
            .collect()
        )
        if stratum_total >= budget:
            assert total >= budget, (lang, total, budget)
            assert total - rows[-1].tok < budget, (
                "selection not minimal", lang,
            )
        else:
            assert total == stratum_total


def test_token_budget_unlisted_kept_whole_and_zero_drops(spark):
    docs, langs = _budget_fixture(spark)
    out = sp.stratified_token_budget(
        docs, "lang", {langs[0]: 0, langs[1]: 10**12}
    )
    per_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert langs[0] not in per_lang  # budget 0 drops the stratum
    for lang in langs[1:]:
        assert per_lang[lang] == want[lang]  # huge budget / unlisted: whole


def test_token_budget_layout_independent(spark):
    """The selected id SET is a pure function of keys and token counts:
    range-partitioner cut placement (which varies with input layout and
    num_partitions) must not change membership."""
    docs, langs = _budget_fixture(spark)
    budgets = {lang: 300 for lang in langs}
    a = sp.stratified_token_budget(
        docs.coalesce(2), "lang", budgets, num_partitions=3
    )
    b = sp.stratified_token_budget(
        docs.repartition(17), "lang", budgets, num_partitions=11
    )
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b and ids_a


def test_token_budget_md5_matches_duckdb_prefix_sum(spark):
    """method='md5' membership replayed row-for-row in DuckDB: the
    take-while-prefix-sum-under-budget rule over (md5 bucket, doc_id)
    order — any md5-capable engine derives the identical corpus mix."""
    duckdb = pytest.importorskip("duckdb")
    from mapreduce_implementation_spark.functions.textstats import (
        token_count,
    )

    docs, langs = _budget_fixture(spark)
    budgets = {langs[0]: 500, langs[1]: 200}
    # hand BOTH engines the same (doc_id, lang, tokens) frame so the
    # parity pins the SELECTION algebra (token_count has its own oracle)
    base = docs.select(
        "doc_id", "lang", token_count("text").alias("tok")
    )
    pdf = base.toPandas()
    out = sp.stratified_token_budget(
        base, "lang", budgets, token_col="tok", method="md5"
    )
    got = {r.doc_id for r in out.select("doc_id").collect()}

    con = duckdb.connect()
    con.register("base", pdf)
    cases = " ".join(
        f"WHEN '{s}' THEN {b}" for s, b in budgets.items()
    )
    want = {
        r[0]
        for r in con.execute(f"""
            SELECT doc_id FROM (
              SELECT doc_id, lang,
                COALESCE(SUM(tok) OVER (
                  PARTITION BY lang
                  ORDER BY CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 'tokbudget')), 1, 8)) AS BIGINT) % {sp.BUCKETS},
                           doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS pre
              FROM base WHERE lang IN ({','.join(repr(s) for s in budgets)})
            ) WHERE pre < (CASE lang {cases} END)
            UNION ALL
            SELECT doc_id FROM base
            WHERE lang NOT IN ({','.join(repr(s) for s in budgets)})
        """).fetchall()
    }
    assert got == want and got


def test_token_budget_null_stratum_kept_whole(spark):
    """NULL strata match neither isin() nor ~isin(); they must route to
    the unlimited branch explicitly, not silently vanish (round-9
    advisory fix)."""
    docs, langs = _budget_fixture(spark)
    with_null = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    n_null = with_null.where(F.col("lang").isNull()).count()
    assert n_null > 0
    out = sp.stratified_token_budget(with_null, "lang", {langs[0]: 200})
    assert out.where(F.col("lang").isNull()).count() == n_null


def test_token_budget_integer_stratum(spark):
    """The classification broadcast schema must mirror the source
    stratum dtype — integer category ids used to raise at
    createDataFrame type verification (round-9 advisory fix)."""
    from mapreduce_implementation_spark.functions.textstats import (
        token_count,
    )

    docs, _ = _budget_fixture(spark)
    cat = docs.withColumn("cat", (F.xxhash64("lang") % 4).cast("int"))
    budgets = {0: 300, 1: 10**12}
    out = sp.stratified_token_budget(
        cat, "cat", budgets, num_partitions=4
    )
    got = (
        out.where(F.col("cat") == 0)
        .withColumn("tok", token_count("text"))
        .agg(F.sum("tok"))
        .collect()[0][0]
    )
    stratum_total = (
        cat.where(F.col("cat") == 0)
        .withColumn("tok", token_count("text"))
        .agg(F.sum("tok"))
        .collect()[0][0]
    )
    if stratum_total is not None and stratum_total >= 300:
        assert got >= 300
    # unlimited-budget stratum stays whole
    assert (
        out.where(F.col("cat") == 1).count()
        == cat.where(F.col("cat") == 1).count()
    )


def test_token_budget_reliable_barrier_parity(spark):
    """barrier='reliable' (write-through parquet) selects the identical
    id set as the default block-storage barrier."""
    docs, langs = _budget_fixture(spark)
    budgets = {lang: 250 for lang in langs[:2]}
    a = sp.stratified_token_budget(docs, "lang", budgets)
    b = sp.stratified_token_budget(
        docs, "lang", budgets, barrier="reliable"
    )
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b and ids_a
