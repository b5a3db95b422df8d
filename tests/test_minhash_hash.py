"""Round-14 verdict item 3: ``hash="xxhash64"`` as the production
per-shingle hash for MinHash signatures.

The md5 pass dominates the signature build (BASELINE.md r13) but md5
is only needed where the DuckDB oracle replays signatures bit-for-bit.
xxhash64 (JVM intrinsic) maps shingles into the same [0, 2³¹-1) domain
so every downstream step — permutations, banding, estimation — is
unchanged; min-wise uniformity is hash-agnostic, so recall/precision
on planted corpora must match md5.
"""

from __future__ import annotations

import pytest

from mapreduce_implementation_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def planted(spark):
    rows = []
    vid = 0
    for i in range(10):  # exact twin pairs, mutually dissimilar
        t = (
            f"pairtext{i}a pairtext{i}b pairtext{i}c pairtext{i}d "
            f"pairtext{i}e pairtext{i}f pairtext{i}g pairtext{i}h"
        )
        rows += [(vid, t), (vid + 1, t)]
        vid += 2
    for j in range(20):  # unrelated filler
        rows.append(
            (1000 + j, f"unrelated filler {j} about topic{j} widget{j} "
                       f"sprocket{j} flange{j} gadget{j}")
        )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_xxhash64_sig_domain_and_null_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, None),
            (3, ""),
            (4, "one two"),  # fewer tokens than shingle_n=3
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    sigs = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(docs, hash="xxhash64").collect()
    }
    for d in (2, 3, 4):
        assert sigs[d] is None
    assert sigs[1] == sigs[5] and sigs[1] is not None
    assert len(sigs[1]) == 16
    assert all(0 <= v < dd.MERSENNE_P for v in sigs[1])
    # a different hash produces different min-wise draws
    md5 = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(docs, hash="md5").collect()
    }
    assert md5[1] != sigs[1]


def test_xxhash64_arrow_expr_parity(spark, planted):
    """The arrow kernel consumes the staged shingle ints whatever hash
    produced them — bitwise parity with the expr form must hold under
    xxhash64 exactly as it does under md5."""
    expr = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(
            planted, impl="expr", hash="xxhash64"
        ).collect()
    }
    arrow = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(
            planted, impl="arrow", hash="xxhash64"
        ).collect()
    }
    assert expr == arrow


def test_xxhash64_miner_recall_parity(spark, planted):
    """Planted-corpus recall/precision through the REAL miner chain is
    identical under either hash: blocking and estimation quality are
    properties of min-wise sampling, not of which strong hash draws
    it."""

    def miner(sig_hash):
        return lambda s: dd.minhash_near_dup_pairs(
            s, "doc_id", "text", k=16, bands=4, rows=4,
            threshold=0.5, max_bucket=None, sig_hash=sig_hash,
        )

    md5 = dd.miner_recall_probe(
        planted, miner("md5"), n_sample=60, threshold=0.5
    )
    xx = dd.miner_recall_probe(
        planted, miner("xxhash64"), n_sample=60, threshold=0.5
    )
    assert md5["true_pairs"] == xx["true_pairs"] == 10
    assert md5["recall"] == xx["recall"] == 1.0
    assert md5["precision"] == xx["precision"] == 1.0


def test_xxhash64_pairs_match_md5_on_exact_twins(spark, planted):
    """Exact twins estimate 1.0 under any hash — the pair SET on this
    corpus is hash-invariant even though the signatures differ."""

    def pairs(sig_hash):
        return sorted(
            (r.doc_a, r.doc_b, r.est_jaccard)
            for r in dd.minhash_near_dup_pairs(
                planted, threshold=0.5, max_bucket=None, sig_hash=sig_hash
            ).collect()
        )

    assert pairs("md5") == pairs("xxhash64")


def test_invalid_hash_raises(spark, planted):
    with pytest.raises(ValueError, match="hash"):
        dd.minhash_signatures(planted, hash="sha2").collect()
