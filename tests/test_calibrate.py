"""One-call corpus calibrator (operators/calibrate.py, round-13
verdict item 8): the composed pre-flight must reproduce the
hand-derived round-10/11 probe numbers on a planted corpus — perfect
recall at the uncapped production knobs, the cap's bite surfaced, and
a retention-true quality floor."""

from __future__ import annotations

import pytest

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
