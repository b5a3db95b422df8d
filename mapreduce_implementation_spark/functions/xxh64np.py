"""Vectorized numpy replay of Spark's ``xxhash64`` over ``array<long>``.

Spark's ``XxHash64`` expression (sql/catalyst XXH64.java) hashes an
``array<long>`` by chaining the single-long XXH64 round across the
elements with the running hash as the next seed (default seed 42):
``h = seed; for x in arr: h = hashLong(x, h)``. ``hashLong`` is one
multiply/rotate round plus the avalanche — ~10 integer ops — so the
whole chain vectorizes over MILLIONS of n-gram positions as n passes
of wrapping-uint64 numpy arithmetic (numpy unsigned ops wrap silently,
exactly the JVM's two's-complement behavior).

This is the kernel behind the ``fused`` impls (BASELINE.md r16): the
JVM keeps tokenize + per-token ``xxhash64``; the per-position
``F.slice`` + interpreted slice-hash HOF — the dominant stage of the
tokhash builds — never runs. Bit-exactness vs the JVM is pytest-pinned
(tests/test_minhash_hash.py, tests/test_contamination.py), which is
what makes a fused build the SAME signature/span-hash family as the
expression build rather than a new one.

Used by :func:`mapreduce_implementation_spark.operators.dedup.
_minhash_sig_fused` (minhash signatures, n=shingle_n chain) and the
fused span kernel in ``operators/contamination.py`` (n=20 chain).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_C8 = np.uint64(8)
_C27 = np.uint64(27)
_C29 = np.uint64(29)
_C31 = np.uint64(31)
_C32 = np.uint64(32)
_C33 = np.uint64(33)
_C37 = np.uint64(37)

XX_SEED = 42  # Spark's xxhash64 default seed


def hash_long(inp: np.ndarray, h: np.ndarray) -> np.ndarray:
    """One XXH64.hashLong(input, seed) step, vectorized: ``inp`` and
    ``h`` are uint64 arrays (or scalars broadcastable to one); returns
    the new running-hash uint64 array. Bit-identical to the JVM."""
    h = h + _P5 + _C8
    m = inp * _P2
    h = h ^ (((m << _C31) | (m >> _C33)) * _P1)
    h = ((h << _C27) | (h >> _C37)) * _P1 + _P4
    h ^= h >> _C33
    h *= _P2
    h ^= h >> _C29
    h *= _P3
    h ^= h >> _C32
    return h


def gram_starts(lens_valid: np.ndarray, n: int):
    """Flat-index bookkeeping for the n-gram positions of concatenated
    valid docs: given per-doc element counts (each >= n), return
    ``(starts, gram_off, total_g)`` where ``starts[m]`` is the flat
    index of gram m's first element and ``gram_off`` marks each doc's
    first gram (the ``np.minimum.reduceat`` / segment boundaries)."""
    g = lens_valid - (n - 1)
    doc_off = np.zeros(len(lens_valid), dtype=np.int64)
    np.cumsum(lens_valid[:-1], out=doc_off[1:])
    gram_off = np.zeros(len(lens_valid), dtype=np.int64)
    np.cumsum(g[:-1], out=gram_off[1:])
    total_g = int(g.sum())
    starts = np.repeat(doc_off - gram_off, g) + np.arange(
        total_g, dtype=np.int64
    )
    return starts, gram_off, total_g


def chain_over_slices(
    flat: np.ndarray, starts: np.ndarray, n: int
) -> np.ndarray:
    """``xxhash64(slice(flat, start, n))`` for every start, vectorized:
    n hash_long passes over the gram-position vector. ``flat`` must be
    uint64; returns uint64 (callers ``.view(np.int64)`` for the JVM's
    signed value, then numpy's floored ``%`` by a positive modulus
    equals Spark's ``pmod``)."""
    h = np.full(len(starts), np.uint64(XX_SEED), dtype=np.uint64)
    for j in range(n):
        h = hash_long(flat[starts + j], h)
    return h
