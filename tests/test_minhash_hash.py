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


# ---------------------------------------------------------------------------
# Round-15 verdict item 1: shingle_impl="tokhash" — shingle int64s from
# token-hash slices, no shingle string ever materialized. The span-kernel
# template (contamination.py span_impl="tokhash", 2.6x at 4M docs) applied
# to the signature chain, where the r14 decomposition measured the
# string stages (tokenize+ngram-concat+array_distinct) at ~20.5 s of the
# ~31 s 1M-doc build. md5-over-strings stays the oracle arm.
# ---------------------------------------------------------------------------


def test_tokhash_sig_domain_and_null_semantics(spark):
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
        for r in dd.minhash_signatures(docs, shingle_impl="tokhash").collect()
    }
    for d in (2, 3, 4):
        assert sigs[d] is None
    assert sigs[1] == sigs[5] and sigs[1] is not None
    assert len(sigs[1]) == 16
    assert all(0 <= v < dd.MERSENNE_P for v in sigs[1])
    # a different shingle family produces different min-wise draws
    md5 = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(docs, shingle_impl="string").collect()
    }
    assert md5[1] != sigs[1]


def test_tokhash_arrow_expr_parity(spark, planted):
    """The arrow kernel consumes the staged shingle ints whatever
    produced them — bitwise parity with the expr form must hold under
    tokhash exactly as under the string hashes."""
    expr = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(
            planted, impl="expr", shingle_impl="tokhash"
        ).collect()
    }
    arrow = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(
            planted, impl="arrow", shingle_impl="tokhash"
        ).collect()
    }
    assert expr == arrow


def test_tokhash_fused_parity_and_null_semantics(spark):
    """Round 16 (continued): impl='fused' replays Spark's
    xxhash64-over-slice chain in numpy — signatures must be
    BIT-IDENTICAL to the expr tokhash arm (same family, not a fourth
    one), including the NULL contract for shingle-less docs. The
    fresh-process 1M-doc A/B that made fused the tokhash default
    (expr 20.82 s vs fused 11.80 s min-of-3, digest parity on every
    line) is in BASELINE.md r16."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, None),
            (3, ""),
            (4, "one two"),  # fewer tokens than shingle_n=3
            (5, "x y z"),  # exactly shingle_n tokens -> 1 shingle
            (6, "repeat repeat repeat repeat"),  # duplicate shingles
            (7, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )

    def sigs(**kw):
        return {
            r.doc_id: None if r.sig is None else tuple(r.sig)
            for r in dd.minhash_signatures(
                docs, shingle_impl="tokhash", **kw
            ).collect()
        }

    expr, fused = sigs(impl="expr"), sigs(impl="fused")
    assert expr == fused
    for d in (2, 3, 4):
        assert fused[d] is None
    assert fused[1] == fused[7] is not None
    assert all(0 <= v < dd.MERSENNE_P for v in fused[1])
    # impl=None auto-resolves to the fused production path under
    # tokhash (value-identical, so equality is the whole check) ...
    assert sigs() == fused
    # ... and to expr under string (the oracle arm; parity with an
    # explicit expr build pins the resolution without pinning values)
    str_default = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(docs).collect()
    }
    str_expr = {
        r.doc_id: None if r.sig is None else tuple(r.sig)
        for r in dd.minhash_signatures(docs, impl="expr").collect()
    }
    assert str_default == str_expr


def test_fused_requires_tokhash(spark, planted):
    with pytest.raises(ValueError, match="fused"):
        dd.minhash_signatures(planted, impl="fused", shingle_impl="string")


def test_fused_kernels_ship_xxh64np_by_value(spark, planted):
    """The fused kernels must register functions/xxh64np for BY-VALUE
    cloudpickle (the multimodal._ship_codecs_by_value contract):
    arbitrary driver sessions run Python workers WITHOUT this package
    on sys.path (driver cwd != repo root), so a worker-side import of
    the module raises ModuleNotFoundError and every fused build dies.
    pytest runs from the repo root where the worker-side import
    happens to work — this pin is the in-suite stand-in for the
    /tmp-cwd driver canary that caught the original bug."""
    from pyspark import cloudpickle

    from mapreduce_implementation_spark.functions import xxh64np
    from mapreduce_implementation_spark.operators.contamination import (
        duplicate_span_stats,
    )

    # building the frames triggers the registration (construction-time)
    dd.minhash_signatures(planted, shingle_impl="tokhash")
    duplicate_span_stats(planted, n=5)
    assert (
        xxh64np.__name__ in cloudpickle.list_registry_pickle_by_value()
    )


def test_tokhash_miner_recall_parity(spark, planted):
    """Planted-corpus recall/precision through the REAL miner chain is
    identical under tokhash: min-wise sampling quality does not depend
    on which injective map drew the shingle ints."""

    def miner(shingle_impl):
        return lambda s: dd.minhash_near_dup_pairs(
            s, "doc_id", "text", k=16, bands=4, rows=4,
            threshold=0.5, max_bucket=None, shingle_impl=shingle_impl,
        )

    md5 = dd.miner_recall_probe(
        planted, miner("string"), n_sample=60, threshold=0.5
    )
    tok = dd.miner_recall_probe(
        planted, miner("tokhash"), n_sample=60, threshold=0.5
    )
    assert md5["true_pairs"] == tok["true_pairs"] == 10
    assert md5["recall"] == tok["recall"] == 1.0
    assert md5["precision"] == tok["precision"] == 1.0


def test_tokhash_cross_miner_recall_parity(spark, planted):
    """The cross-set ingest chain (signatures -> minhash_cross_near_dup)
    under tokhash flags the straddling twins exactly like md5 — both
    sides of the band join share the family, so blocking holds."""

    def cross(shingle_impl):
        def run(new, ref):
            new_sigs = dd.minhash_signatures(
                new, "doc_id", "text", k=16, shingle_impl=shingle_impl
            )
            ref_sigs = dd.minhash_signatures(
                ref, "doc_id", "text", k=16, shingle_impl=shingle_impl
            )
            return dd.minhash_cross_near_dup(
                new_sigs, ref_sigs, k=16, bands=4, rows=4,
                threshold=0.5, max_bucket=None,
            )
        return run

    md5 = dd.cross_miner_recall_probe(
        planted, cross("string"), n_sample=60, threshold=0.5
    )
    tok = dd.cross_miner_recall_probe(
        planted, cross("tokhash"), n_sample=60, threshold=0.5
    )
    assert md5["true_pairs"] == tok["true_pairs"] > 0
    assert md5["recall"] == tok["recall"] == 1.0
    assert md5["precision"] == tok["precision"] == 1.0


def test_tokhash_pairs_match_md5_on_exact_twins(spark, planted):
    """Exact twins estimate 1.0 under any family — the pair SET on this
    corpus is family-invariant even though the signatures differ."""

    def pairs(shingle_impl):
        return sorted(
            (r.doc_a, r.doc_b, r.est_jaccard)
            for r in dd.minhash_near_dup_pairs(
                planted, threshold=0.5, max_bucket=None,
                shingle_impl=shingle_impl,
            ).collect()
        )

    assert pairs("string") == pairs("tokhash")


def test_tokhash_ngram_jaccard_matches_string(spark, planted):
    """Exact Jaccard over HASHED shingle sets equals string Jaccard up
    to the ~1/2^64 collision contract — identical on the planted
    corpus, for both single- and multi-fingerprint blocking."""
    for nfp in (1, 3):
        s = sorted(
            (r.doc_a, r.doc_b, r.jaccard_sim)
            for r in dd.ngram_jaccard_pairs(
                planted, threshold=0.5, max_bucket=None,
                n_fingerprints=nfp, shingle_impl="string",
            ).collect()
        )
        t = sorted(
            (r.doc_a, r.doc_b, r.jaccard_sim)
            for r in dd.ngram_jaccard_pairs(
                planted, threshold=0.5, max_bucket=None,
                n_fingerprints=nfp, shingle_impl="tokhash",
            ).collect()
        )
        assert s == t and len(s) == 10


def test_tokhash_ngram_jaccard_shingleless_fallback(spark):
    """Shingle-less docs take the joined-tokens fallback KEY (non-null,
    equal for byte-identical docs — same contract as the string path's
    content-hash fallback: the fp stays groupable for the cap, while
    the empty-set jaccard verify still emits no pair — exact twins are
    exact_dedup's job). Both impls must agree."""
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "other thing")],
        ["doc_id", "text"],
    )
    for impl in ("string", "tokhash"):
        got = dd.ngram_jaccard_pairs(
            docs, threshold=0.0, max_bucket=None, shingle_impl=impl
        ).collect()
        assert got == []


def test_tokhash_knob_validation(spark, planted):
    with pytest.raises(ValueError, match="shingle_impl"):
        dd.minhash_signatures(planted, shingle_impl="bogus")
    with pytest.raises(ValueError, match="strong hash over shingle"):
        dd.minhash_signatures(planted, hash="xxhash64", shingle_impl="tokhash")
    with pytest.raises(ValueError, match="string-impl only"):
        dd.ngram_jaccard_pairs(
            planted, shingle_impl="tokhash",
            fingerprint=lambda t: t[0],
        )


def test_calibration_family_mismatch_raises(spark, planted):
    """ADVICE r14: a calibration measured under one signature family
    must refuse to answer for a build under another — the band-bucket
    distribution (screen_stats, has_oversized) is family-specific."""
    cal = {
        "minhash": {
            "k": 16, "bands": 4, "rows": 4, "shingle_n": 3,
            "max_bucket": 1000, "sig_hash": "md5",
            "shingle_impl": "string",
            "screen_stats": {
                "small_rows": 10, "small_groups": 5, "big_rows": 0,
            },
        }
    }
    with pytest.raises(ValueError, match="shingle_impl"):
        dd.minhash_near_dup_pairs(
            planted, max_bucket=1000, shingle_impl="tokhash",
            calibration=cal,
        )
    with pytest.raises(ValueError, match="sig_hash"):
        dd.minhash_near_dup_pairs(
            planted, max_bucket=1000, sig_hash="xxhash64",
            calibration=cal,
        )
    # matched family: accepted (plan-only check, no action needed)
    dd.minhash_near_dup_pairs(planted, max_bucket=1000, calibration=cal)
