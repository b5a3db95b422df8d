"""Bit-exactness of the numpy xxhash64 replay (functions/xxh64np.py)
against Spark's own ``XxHash64`` over ``array<long>``.

The fused kernels' correctness rests on this single claim: the
wrapping-uint64 numpy chain produces THE SAME 64-bit values as the JVM
expression for every input, so a fused build is the same signature /
span-hash family as an expression build. The corpus digests in
tests/test_minhash_hash.py and tests/test_contamination.py pin it on
realistic text; this file pins it on adversarial numeric inputs the
tokenizer would never produce — extreme int64s, sign boundaries, long
chains — straight against the engine.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from mapreduce_implementation_spark.functions import xxh64np


def _np_chain(arr: list[int]) -> int:
    h = np.full(1, np.uint64(xxh64np.XX_SEED), dtype=np.uint64)
    for v in arr:
        inp = np.array([v], dtype=np.int64).view(np.uint64)
        h = xxh64np.hash_long(inp, h)
    return int(h.view(np.int64)[0])


def test_numpy_chain_matches_spark_on_adversarial_arrays(spark):
    rng = random.Random(0xC0FFEE)
    edge = [
        0, 1, -1, 2**63 - 1, -(2**63), 2**31 - 1, -(2**31),
        0x9E3779B185EBCA87 - 2**64,  # the prime itself, as signed
    ]
    cases: list[list[int]] = []
    for v in edge:  # singletons of every edge value
        cases.append([v])
    for ln in (2, 3, 5, 20, 64):  # random chains incl. the span depth
        for _ in range(5):
            cases.append(
                [rng.randrange(-(2**63), 2**63) for _ in range(ln)]
            )
    cases.append(edge)  # one chain of all edges in order

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, xs array<long>"
    )
    from pyspark.sql import functions as F

    got = {
        r.i: r.h
        for r in df.select("i", F.xxhash64("xs").alias("h")).collect()
    }
    for i, c in enumerate(cases):
        assert _np_chain(c) == got[i], (i, c)


def test_chain_over_slices_matches_scalar_chain():
    """The vectorized gram form (n passes over a gather of the flat
    buffer) equals the scalar per-gram chain."""
    rng = np.random.default_rng(7)
    flat = rng.integers(-(2**63), 2**63, size=500, dtype=np.int64).view(
        np.uint64
    )
    n = 4
    starts = np.arange(len(flat) - n + 1, dtype=np.int64)
    vec = xxh64np.chain_over_slices(flat, starts, n).view(np.int64)
    for m in (0, 1, 250, len(starts) - 1):
        expect = _np_chain(
            list(flat[m : m + n].view(np.int64))
        )
        assert int(vec[m]) == expect


def test_gram_starts_bookkeeping():
    lens = np.array([3, 7, 4], dtype=np.int64)
    starts, gram_off, total = xxh64np.gram_starts(lens, 3)
    # doc 0: 1 gram at flat 0; doc 1: 5 grams at 3..7; doc 2: 2 at 10,11
    assert total == 8
    assert list(gram_off) == [0, 1, 6]
    assert list(starts) == [0, 3, 4, 5, 6, 7, 10, 11]


@pytest.mark.parametrize("bad", [[], [5]])
def test_gram_starts_degenerate_not_called_with_short_docs(bad):
    """Callers filter lens >= n before gram_starts; this documents the
    contract rather than defending it (a len < n doc would produce a
    negative gram count)."""
    lens = np.array([4], dtype=np.int64)
    starts, gram_off, total = xxh64np.gram_starts(lens, 4)
    assert total == 1 and list(starts) == [0] and list(gram_off) == [0]
