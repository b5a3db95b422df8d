"""One-call corpus calibrator (operators/calibrate.py, round-13
verdict item 8): the composed pre-flight must reproduce the
hand-derived round-10/11 probe numbers on a planted corpus — perfect
recall at the uncapped production knobs, the cap's bite surfaced, and
a retention-true quality floor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.calibrate import calibrate_corpus


@pytest.fixture(scope="module")
def planted(spark):
    # the test_dedup planted shape: exact twin pairs + a boilerplate
    # cohort + unrelated filler (known truth for every probe)
    rows = []
    vid = 0
    for i in range(10):
        t = (
            f"pairtext{i}a pairtext{i}b pairtext{i}c pairtext{i}d "
            f"pairtext{i}e pairtext{i}f pairtext{i}g pairtext{i}h"
        )
        rows += [(vid, t), (vid + 1, t)]
        vid += 2
    boiler = (
        "boilerplate terms of service text repeated verbatim across "
        "the whole cohort of scraped pages"
    )
    for j in range(12):
        rows.append((500 + j, boiler))
    for j in range(20):
        rows.append(
            (1000 + j, f"unrelated filler {j} about topic{j} widget{j} "
                       f"sprocket{j} flange{j} gadget{j}")
        )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_calibrate_matches_hand_derived_values(spark, planted):
    out = calibrate_corpus(planted, keep_fraction=0.7, n_sample=60)

    # production knobs echoed with their evidence (round-10 protocol)
    mh = out["minhash"]
    assert (mh["k"], mh["bands"], mh["rows"]) == (16, 4, 4)
    assert mh["true_pairs"] == 10 + 66  # twins + cohort pairs
    assert mh["recall"] == 1.0 and mh["precision"] == 1.0

    # ingest chain (round-11): representative cap keeps flags total
    cr = out["cross"]
    assert cr["cap_strategy"] == "representative"
    assert cr["true_pairs"] > 0  # the cohort straddles the hash split
    assert cr["flag_recall"] == 1.0 and cr["precision"] == 1.0

    # cap does NOT bite at the production default on this corpus
    assert out["buckets"]["max_bucket"] == 1000
    assert out["buckets"]["cap_bites"] is False
    assert not any("BITES" in w for w in out["warnings"])

    # screen regime (round-13): natural-corpus minhash buckets are
    # small/singleton → join, with the evidence attached
    assert mh["pair_screen"] == "join"
    assert 0 < mh["mean_bucket_size"] < 24  # under the crossover

    # quality floor realizes the retention target on the sample — the
    # gate's contract is keep AT LEAST keep_fraction (ties at the
    # floor keep more, never less; this tiny planted corpus is nearly
    # all ties, so retention saturates high)
    q = out["quality"]
    assert q["sample_retention"] >= 0.7

    # deterministic protocol: same corpus, same answer
    assert calibrate_corpus(planted, keep_fraction=0.7, n_sample=60) == out


def test_calibrate_surfaces_biting_cap(spark, planted):
    out = calibrate_corpus(planted, n_sample=60, max_bucket=5)
    assert out["buckets"]["cap_bites"] is True
    # the cohort's 12 rows share one band bucket and exceed the cap
    assert out["buckets"]["top"][0][2] > 5
    assert any("BITES" in w for w in out["warnings"])
    # dropping the cohort shows up as measured recall loss (10/76)
    assert out["minhash"]["recall"] == pytest.approx(10 / 76, abs=0.01)


# ---------------------------------------------------------------------------
# Round-15 verdict item 4: calibrate_ann — measured IVF knobs (√N nlist,
# recall-targeted nprobe, SQ8 layout verdict) + the calibration= feed
# into materialize_ivf_index / ivf_topk_from_index.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted_emb(spark):
    """8 orthonormal cluster centers, 40 unit vectors each at noise
    0.05 (the test_similarity planted law): every query's true top-k
    is provably its own cluster, so IVF recall is a pure function of
    how many of the cluster's lists the probe covers."""
    import math
    import random

    rng = random.Random(20260816)
    DIM, NC, PER = 16, 8, 40
    centers: list[list[float]] = []
    while len(centers) < NC:
        v = [rng.gauss(0, 1) for _ in range(DIM)]
        for c in centers:
            d = sum(x * y for x, y in zip(v, c))
            v = [x - d * y for x, y in zip(v, c)]
        n = math.sqrt(sum(x * x for x in v))
        if n > 1e-6:
            centers.append([x / n for x in v])
    rows = []
    for i in range(NC * PER):
        c = i % NC
        v = [centers[c][j] + rng.gauss(0, 0.05) for j in range(DIM)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [float(x / n) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


@pytest.fixture(scope="module")
def ann_report(spark, planted_emb):
    from mapreduce_implementation_spark.operators.calibrate import (
        calibrate_ann,
    )

    return calibrate_ann(
        planted_emb, k=5, target_recall=0.9, sample_n=320,
        n_queries=16, nprobe_max=4,
    )


class TestCalibrateAnn:
    def test_sqrt_n_rule_and_probe_scaling(self, ann_report):
        ann = ann_report["ann"]
        assert ann["n_rows"] == 320 and ann["dim"] == 16
        assert ann["nlist"] == round(320 ** 0.5)  # 18
        # sample == corpus here, so the probe ran at the exact knobs
        assert ann["probe"]["nlist_probe"] == ann["nlist"]
        assert ann["probe"]["sample_n"] == 320

    def test_recall_target_met_with_evidence(self, ann_report):
        ann = ann_report["ann"]
        assert ann["recall"] is not None and ann["recall"] >= 0.9
        # the recommendation is the curve's LAST point (smallest
        # nprobe meeting the target — the loop early-stops there)
        assert ann["recall_curve"][-1] == [ann["nprobe"], ann["recall"]]
        assert 1 <= ann["nprobe"] <= 4
        # SQ8 codes score within quantization noise of the float arm
        assert ann["sq8_recall"] is not None
        assert ann["sq8_recall"] >= ann["recall"] - 0.1
        # tiny corpus: float layout recommended
        assert ann["quantize"] is None
        assert ann["est_index_bytes"] == 320 * 16 * 4

    def test_feed_materialize_index_knob_check(
        self, spark, planted_emb, ann_report, tmp_path
    ):
        from mapreduce_implementation_spark.operators import (
            similarity as sim,
        )

        nlist = ann_report["ann"]["nlist"]
        good = sim.train_centroids(planted_emb, k=nlist, iters=2)
        bad = sim.train_centroids(planted_emb, k=nlist + 1, iters=2)
        with pytest.raises(ValueError, match="nlist"):
            sim.materialize_ivf_index(
                planted_emb, bad, str(tmp_path / "bad"),
                calibration=ann_report,
            )
        with pytest.raises(ValueError, match="auto"):
            sim.materialize_ivf_index(
                planted_emb, good, str(tmp_path / "noauto"),
                quantize="auto",
            )
        idx = str(tmp_path / "idx")
        sim.materialize_ivf_index(
            planted_emb, good, idx, quantize="auto",
            calibration=ann_report,
        )
        # auto resolved to the calibrated float layout
        assert sim.SQ8_CODE_COL not in spark.read.parquet(idx).columns

        # probe feed: nprobe=None adopts the calibrated depth and
        # matches the explicit setting exactly
        queries = planted_emb.where(F.col("vec_id") < 3)
        reco = ann_report["ann"]["nprobe"]
        adopted = sorted(
            (r.query_id, r.vec_id, r.rank)
            for r in sim.ivf_topk_from_index(
                spark, idx, queries, good, k=5, nprobe=None,
                calibration=ann_report,
            ).collect()
        )
        explicit = sorted(
            (r.query_id, r.vec_id, r.rank)
            for r in sim.ivf_topk_from_index(
                spark, idx, queries, good, k=5, nprobe=reco,
            ).collect()
        )
        assert adopted == explicit and len(adopted) == 15

    def test_probe_depth_guards(self, spark, planted_emb, tmp_path):
        from mapreduce_implementation_spark.operators import (
            similarity as sim,
        )

        cents = sim.train_centroids(planted_emb, k=4, iters=1)
        idx = str(tmp_path / "guard_idx")
        sim.materialize_ivf_index(planted_emb, cents, idx)
        queries = planted_emb.where(F.col("vec_id") < 2)
        cal = {"ann": {"nprobe": 3, "recall": 0.95, "target_recall": 0.9}}
        with pytest.raises(ValueError, match="shallower"):
            sim.ivf_topk_from_index(
                spark, idx, queries, cents, k=3, nprobe=2, calibration=cal
            )
        with pytest.raises(ValueError, match="nprobe=None"):
            sim.ivf_topk_from_index(
                spark, idx, queries, cents, k=3, nprobe=None
            )
        # deeper than calibrated is allowed (recall only rises)
        sim.ivf_topk_from_index(
            spark, idx, queries, cents, k=3, nprobe=4, calibration=cal
        ).collect()

    def test_validation(self, spark, planted_emb):
        from mapreduce_implementation_spark.operators.calibrate import (
            calibrate_ann,
        )

        with pytest.raises(ValueError, match="target_recall"):
            calibrate_ann(planted_emb, target_recall=0.0)
        with pytest.raises(ValueError, match="nprobe_max"):
            calibrate_ann(planted_emb, nprobe_max=0)
        with pytest.raises(ValueError, match="empty"):
            calibrate_ann(planted_emb.where(F.col("vec_id") < 0))


def test_calibrate_ann_warns_when_points_per_list_clamp_binds(
    spark, planted_emb
):
    """ADVICE r15: when sample_n is small relative to the recommended
    points_per_list, the nlist_probe >= 2 clamp makes the probe's
    lists DENSER than the recommendation — the stated transfer basis
    breaks — so the report must say so instead of implying parity."""
    from mapreduce_implementation_spark.operators.calibrate import (
        calibrate_ann,
    )

    # n_rows=320 -> nlist=18, points_per_list~17.8; a 24-vector sample
    # rounds 24/17.8 to 1 < 2, so the clamp binds
    report = calibrate_ann(
        planted_emb, k=3, sample_n=24, n_queries=8, nprobe_max=2,
        n_rows=320,
    )
    assert any("clamp binds" in w for w in report["warnings"])
    assert report["ann"]["probe"]["nlist_probe"] == 2

    # and stays silent when points-per-list is preserved
    full = calibrate_ann(
        planted_emb, k=3, sample_n=320, n_queries=8, nprobe_max=2,
    )
    assert not any("clamp binds" in w for w in full["warnings"])


def test_shingle_recommendation_report_feeds_builds(spark, planted):
    """round-16 verdict item 2: calibrate_corpus(shingle_impl='auto')
    probes both signature families, adopts the recommendation, and the
    resulting report feeds minhash_near_dup_pairs and the corpus
    pipeline AT the recommended family (knob check green) while a
    contradicting explicit family still refuses."""
    from mapreduce_implementation_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from mapreduce_implementation_spark.operators.pipeline import (
        CorpusPipelineConfig,
        build_training_corpus,
    )

    report = calibrate_corpus(
        planted, n_sample=60, shingle_impl="auto", build_probe_docs=50
    )
    sh = report["shingle"]
    assert sh["recommendation"] in ("string", "tokhash")
    assert sh["adopted"] is True
    adopted = report["minhash"]["shingle_impl"]
    assert adopted == sh["recommendation"]
    # both arms were probed on the SAME frozen sample: truth identical
    assert sh["string"]["recall"] is not None
    assert sh["tokhash"]["recall"] is not None

    # report -> miner at the adopted family: zero-job decisions, runs
    pairs = minhash_near_dup_pairs(
        planted, shingle_impl=adopted, calibration=report
    )
    assert pairs.count() > 0
    # a contradicting family refuses (the r14 knob-check contract)
    other = "string" if adopted == "tokhash" else "tokhash"
    with pytest.raises(ValueError, match="shingle_impl"):
        minhash_near_dup_pairs(
            planted, shingle_impl=other, calibration=report
        )

    # report -> pipeline: near_dup_shingle_impl='auto' adopts it
    art = build_training_corpus(
        planted,
        CorpusPipelineConfig(
            split_weights={"train": 1.0},
            near_dup=True,
            near_dup_shingle_impl="auto",
            calibration=report,
        ),
    )
    # twins + boilerplate cohort collapse: far fewer docs survive
    n_out = art["split_train"].count()
    assert 0 < n_out < planted.count()


def test_explicit_family_gets_advisory_warning_when_other_wins(
    spark, planted
):
    """An explicit shingle_impl with recommend_shingle=True keeps the
    calibration under that family but warns when the measured
    recommendation differs (adoption stays the user's call)."""
    report = calibrate_corpus(
        planted, n_sample=60, shingle_impl="string",
        recommend_shingle=True, build_probe_docs=50,
    )
    sh = report["shingle"]
    assert report["minhash"]["shingle_impl"] == "string"
    if sh["recommendation"] != "string":
        assert sh["adopted"] is False
        assert any("recalibrate" in w for w in report["warnings"])
    else:
        assert sh["adopted"] is True
