"""operators/semantic.py — SemDeDup-style semantic dedup behavior.

Registry parity (vs the DuckDB k-means twin) runs in
test_oracle_parity; here the semantics the oracle can't isolate:
the mega-cluster exemption guard, the pairwise chain-drop rule, the
one-row-per-input invariant, and the pre-trained-centroid path.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.semantic import semantic_dedup


def _unit(angle_deg: float) -> list[float]:
    a = math.radians(angle_deg)
    return [math.cos(a), math.sin(a)]


def _centroids(spark, vecs: dict[int, list[float]]):
    return spark.createDataFrame(
        [(cid, emb) for cid, emb in sorted(vecs.items())],
        "centroid_id int, centroid_emb array<double>",
    )


def _vectors(spark, rows: dict[int, list[float]]):
    return spark.createDataFrame(
        [(vid, emb) for vid, emb in sorted(rows.items())],
        "vec_id int, embedding array<double>",
    )


def test_one_row_per_vector_keep_domain(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, k=4, iters=1, threshold=0.35).toPandas()
    assert len(out) == emb.count()
    assert out["vec_id"].is_unique
    assert set(out["keep"].unique()) <= {0, 1}
    # every vector landed in exactly one of the k clusters
    assert set(out["centroid_id"].unique()) <= set(range(4))


def test_chain_drop_rule_is_pairwise(spark):
    # one cluster; angles 0/40/80 deg: cos(0,40)=cos(40,80)=0.766 >=
    # 0.7071 but cos(0,80)=0.174 < 0.7071 — the pairwise min-id rule
    # drops BOTH 2 (vs 1) and 3 (vs 2, itself dropped), keeping only 1.
    vecs = _vectors(spark, {1: _unit(0), 2: _unit(40), 3: _unit(80)})
    cents = _centroids(spark, {0: _unit(40)})
    out = semantic_dedup(
        vecs, centroids=cents, threshold=math.cos(math.radians(45))
    ).toPandas()
    kept = sorted(out[out["keep"] == 1]["vec_id"])
    assert kept == [1]


def test_mega_cluster_exempted_not_squared(spark):
    # cluster 0: six identical vectors (a degenerate boilerplate
    # cohort); cluster 1: one near-identical pair. With max_cluster=5
    # and exempt_strategy="keep" the cohort is EXEMPT (all kept —
    # conservative failure), while the small cluster still dedups;
    # with the guard off the cohort collapses to its min id.
    rows = {i: _unit(0) for i in range(1, 7)}
    rows[10], rows[11] = _unit(170), _unit(171)
    vecs = _vectors(spark, rows)
    cents = _centroids(spark, {0: _unit(0), 1: _unit(170)})

    guarded = semantic_dedup(
        vecs, centroids=cents, threshold=0.95, max_cluster=5,
        exempt_strategy="keep",
    ).toPandas()
    cohort = guarded[guarded["vec_id"] <= 6]
    assert (cohort["keep"] == 1).all()
    pair = guarded.set_index("vec_id")
    assert pair.loc[10, "keep"] == 1 and pair.loc[11, "keep"] == 0

    unguarded = semantic_dedup(
        vecs, centroids=cents, threshold=0.95, max_cluster=None
    ).toPandas()
    kept = sorted(unguarded[unguarded["keep"] == 1]["vec_id"])
    assert kept == [1, 10]


def test_mega_cluster_slice_mines_planted_twins(spark):
    """Round-10 verdict item 1: exempt_strategy="slice" (the default)
    MINES oversized clusters instead of keeping them wholesale. An
    identical 12-member boilerplate clique in a max_cluster=4 cluster
    must collapse to its min id — the slice overlap row chains the
    drop across every slice boundary — and match the unguarded result
    exactly on this corpus (identical vectors sort adjacent, so the
    slice restriction loses nothing). The small cluster dedups as
    before, and the output stays one row per input vector."""
    rows = {i: _unit(0) for i in range(1, 13)}
    rows[20], rows[21] = _unit(170), _unit(171)
    vecs = _vectors(spark, rows)
    cents = _centroids(spark, {0: _unit(0), 1: _unit(170)})

    sliced = semantic_dedup(
        vecs, centroids=cents, threshold=0.95, max_cluster=4
    ).toPandas()
    assert len(sliced) == 14 and sliced["vec_id"].is_unique
    kept = sorted(sliced[sliced["keep"] == 1]["vec_id"])
    assert kept == [1, 20]

    unguarded = semantic_dedup(
        vecs, centroids=cents, threshold=0.95, max_cluster=None
    ).toPandas()
    kept_un = sorted(unguarded[unguarded["keep"] == 1]["vec_id"])
    assert kept == kept_un


def test_exempt_strategy_validated(spark):
    vecs = _vectors(spark, {1: _unit(0)})
    cents = _centroids(spark, {0: _unit(0)})
    with pytest.raises(ValueError, match="exempt_strategy"):
        semantic_dedup(
            vecs, centroids=cents, max_cluster=5, exempt_strategy="mine"
        )


def test_pretrained_centroids_and_empty_input(spark):
    cents = _centroids(spark, {0: _unit(0), 1: _unit(90)})
    empty = _vectors(spark, {}).where(F.lit(False))
    out = semantic_dedup(empty, centroids=cents, threshold=0.9)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "centroid_id", "keep",
    ]


def test_srp_pairs_cap_drops_degenerate_bucket(spark):
    # 8 identical vectors share one SRP bucket (a boilerplate cohort);
    # a disjoint near-identical pair lives in the opposite bucket.
    # max_bucket=4 must drop the cohort's square entirely while the
    # small bucket still mines its pair; uncapped is a superset.
    from mapreduce_implementation_spark.operators.semantic import (
        srp_near_dup_pairs,
    )

    rows = {i: _unit(10) for i in range(1, 9)}
    rows[20], rows[21] = _unit(200), _unit(201)
    vecs = _vectors(spark, rows)
    planes = spark.createDataFrame(
        [(0, _unit(100))], "plane_id int, plane_emb array<double>"
    )
    capped = srp_near_dup_pairs(
        vecs, planes, threshold=0.9, max_bucket=4
    ).toPandas()
    assert sorted(map(tuple, capped[["id_a", "id_b"]].values)) == [(20, 21)]

    full = srp_near_dup_pairs(
        vecs, planes, threshold=0.9, max_bucket=None
    ).toPandas()
    full_pairs = set(map(tuple, full[["id_a", "id_b"]].values))
    assert (20, 21) in full_pairs
    assert len(full_pairs) == 1 + 8 * 7 // 2


def test_srp_cross_equals_straddling_in_set_pairs(spark, sf_dir):
    # Same contract as the MinHash/SimHash cross-set miners: splitting
    # the corpus by id parity, the cross-set pairs must be EXACTLY the
    # in-set pairs that straddle the split (uncapped, same planes).
    from mapreduce_implementation_spark.operators.semantic import (
        srp_cross_near_dup,
        srp_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("plane_id"),
        F.col("embedding").alias("plane_emb"),
    )
    full = srp_near_dup_pairs(
        emb, planes, threshold=0.3, max_bucket=None
    ).toPandas()
    straddling = {
        frozenset((a, b))
        for a, b in full[["id_a", "id_b"]].values
        if a % 2 != b % 2
    }
    cross = srp_cross_near_dup(
        emb.where(F.col("vec_id") % 2 == 1),
        emb.where(F.col("vec_id") % 2 == 0),
        planes,
        threshold=0.3,
        max_bucket=None,
    ).toPandas()
    assert all(cross["new_id"] % 2 == 1) and all(cross["ref_id"] % 2 == 0)
    assert {
        frozenset((a, b)) for a, b in cross[["new_id", "ref_id"]].values
    } == straddling
    assert len(straddling) > 0  # the fixture must actually exercise it


def test_threshold_validated(spark):
    cents = _centroids(spark, {0: _unit(0)})
    vecs = _vectors(spark, {1: _unit(0)})
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(vecs, centroids=cents, threshold=1.5)


def test_srp_slice_strategy_mines_capped_bucket(spark):
    """cap_strategy="slice" on the SRP in-set miner: the 8-member
    identical cohort that max_bucket=4 drops entirely under the
    window strategy is mined within projection-ordered slices — every
    member except the min id acquires a smaller-id match through the
    slice chain — while the small bucket's pair is untouched."""
    from mapreduce_implementation_spark.operators.semantic import (
        srp_near_dup_pairs,
    )

    rows = {i: _unit(10) for i in range(1, 9)}
    rows[20], rows[21] = _unit(200), _unit(201)
    vecs = _vectors(spark, rows)
    planes = spark.createDataFrame(
        [(0, _unit(100))], "plane_id int, plane_emb array<double>"
    )
    sliced = srp_near_dup_pairs(
        vecs, planes, threshold=0.9, max_bucket=4, cap_strategy="slice"
    ).toPandas()
    got = {(int(a), int(b)) for a, b in sliced[["id_a", "id_b"]].values}
    assert (20, 21) in got
    cohort = {p for p in got if p[0] < 9}
    assert 0 < len(cohort) < 28  # bounded under the C(8,2) square
    # chain property: every cohort member except 1 is droppable
    droppable = {b for _, b in cohort}
    assert droppable == set(range(2, 9))


def test_srp_cross_representative_flags_capped_cohort(spark):
    """cap_strategy="representative" threaded through the SRP cross
    miner: a new vector matching only an oversized committed cohort
    flags against the cohort's min id instead of vanishing."""
    from mapreduce_implementation_spark.operators.semantic import (
        srp_cross_near_dup,
    )

    ref = _vectors(spark, {i: _unit(10) for i in range(1, 9)})
    new = _vectors(spark, {1000: _unit(10)})
    planes = spark.createDataFrame(
        [(0, _unit(100))], "plane_id int, plane_emb array<double>"
    )
    dropped = srp_cross_near_dup(
        new, ref, planes, threshold=0.9, max_bucket=4,
        cap_strategy="antijoin",
    ).toPandas()
    assert len(dropped) == 0
    rep = srp_cross_near_dup(  # representative is the default
        new, ref, planes, threshold=0.9, max_bucket=4,
    ).toPandas()
    assert list(map(tuple, rep[["new_id", "ref_id"]].values)) == [(1000, 1)]


def test_srp_pair_screens_identical(spark):
    """pair_screen="blas" (Gram-matmul pair emitter) must reproduce
    the join screen's pairs AND quantized cosines exactly — across
    the window cap, the slice strategy (overlap chains included), and
    an uncapped control where blas silently defers to join."""
    import math

    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators.semantic import (
        srp_near_dup_pairs,
    )

    # one near-dup cohort (9 members, oversized at max_bucket=4),
    # one small pair, plus scattered singles
    def vec(base, i, drift):
        return [x + drift * math.sin(i * 3 + j) for j, x in enumerate(base)]

    rows = [(i, vec([1.0, 0.2, 0.8, 0.1], i, 0.005)) for i in range(9)]
    rows += [(50, vec([-1.0, 0.5, -0.2, 0.9], 0, 0.0)),
             (51, vec([-1.0, 0.5, -0.2, 0.9], 1, 0.004))]
    rows += [(100 + i, vec([0.1 * (i + 1), -0.7, 0.3, -0.9], i, 0.3))
             for i in range(4)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 1.0, 0.0])],
        "plane_id int, plane_emb array<double>",
    )

    def pairs(**kw):
        got = srp_near_dup_pairs(
            vecs, planes, threshold=0.9, **kw
        ).orderBy("id_a", "id_b").collect()
        return [(int(r.id_a), int(r.id_b), float(r.cos_sim)) for r in got]

    for strategy in ("window", "slice"):
        blas = pairs(max_bucket=4, cap_strategy=strategy,
                     pair_screen="blas")
        join = pairs(max_bucket=4, cap_strategy=strategy,
                     pair_screen="join")
        assert blas == join, (strategy, blas, join)
        assert blas, strategy  # non-trivial: the small pair survives
    # uncapped: blas defers to the join form (unbounded groups)
    assert pairs(max_bucket=None, pair_screen="blas") == pairs(
        max_bucket=None, pair_screen="join"
    )
