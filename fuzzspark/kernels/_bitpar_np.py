"""Across-the-batch numpy bit-parallel kernels (patterns ≤ 64 code points).

Where the reference vectorizes *within* one comparison (SIMD-within-
register, src/distance/levenshtein.rs:435-507), an Arrow batch lets us
additionally vectorize *across* pairs: one uint64 lane per pair, all
lanes stepped together over text positions.  Pairs whose text is
shorter than the batch maximum are frozen via an activity mask.

All inputs are padded int64 code-point matrices plus length vectors.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pm_matrix", "levenshtein_batch64", "lcs_batch64", "osa_batch64"]

_U1 = np.uint64(1)
_U0 = np.uint64(0)


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    if hasattr(x, "bit_count"):  # numpy >= 2.0
        try:
            return x.bit_count()
        except AttributeError:  # pragma: no cover
            pass
    x = x - ((x >> _U1) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def pm_matrix(c1: np.ndarray, len1: np.ndarray, c2: np.ndarray, len2: np.ndarray,
              chunk: int = 2048) -> np.ndarray:
    """PM[p, j] = bitmask over i<len1[p] of (c1[p,i] == c2[p,j]).

    The per-pair PatternMatchVector (src/details/pattern_match_vector.rs)
    materialized for every text position up-front, chunked to bound the
    (chunk × n2 × n1) boolean intermediate.
    """
    n_pairs, n1 = c1.shape
    n2 = c2.shape[1]
    weights = (_U1 << np.arange(n1, dtype=np.uint64))
    pm = np.zeros((n_pairs, n2), dtype=np.uint64)
    valid1 = np.arange(n1)[None, :]  # mask out padding of s1
    for lo in range(0, n_pairs, chunk):
        hi = min(lo + chunk, n_pairs)
        eq = c2[lo:hi, :, None] == c1[lo:hi, None, :]
        eq &= valid1 < len1[lo:hi, None, None]
        pm[lo:hi] = (eq * weights).sum(axis=2, dtype=np.uint64)
    # zero out text padding so inactive steps are no-ops where possible
    pm[np.arange(n2)[None, :] >= len2[:, None]] = _U0
    return pm


def _lenmask(len1: np.ndarray) -> np.ndarray:
    m = len1.astype(np.uint64)
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    return np.where(m >= np.uint64(64), full, (_U1 << m) - _U1)


def levenshtein_batch64(c1, len1, c2, len2) -> np.ndarray:
    """Myers bit-parallel uniform Levenshtein, one uint64 lane per pair."""
    pm = pm_matrix(c1, len1, c2, len2)
    n2 = c2.shape[1]
    ones = _lenmask(len1)
    msb = _U1 << (np.maximum(len1, 1) - 1).astype(np.uint64)
    vp = ones.copy()
    vn = np.zeros_like(ones)
    dist = len1.astype(np.int64).copy()
    js = np.arange(n2)
    for j in range(n2):
        act = js[j] < len2
        p = pm[:, j]
        x = p | vn
        d0 = (((x & vp) + vp) ^ vp) | x
        hp = vn | ~(d0 | vp)
        hn = d0 & vp
        dist += (act & ((hp & msb) != _U0)).astype(np.int64)
        dist -= (act & ((hn & msb) != _U0)).astype(np.int64)
        hp = ((hp << _U1) | _U1)
        hn = hn << _U1
        nvp = (hn | ~(d0 | hp)) & ones
        nvn = hp & d0 & ones
        vp = np.where(act, nvp, vp)
        vn = np.where(act, nvn, vn)
    return dist


def lcs_batch64(c1, len1, c2, len2) -> np.ndarray:
    """Hyyrö bit-parallel LCS length, one uint64 lane per pair.
    Text padding has PM == 0, which makes the step a no-op."""
    pm = pm_matrix(c1, len1, c2, len2)
    n2 = c2.shape[1]
    ones = _lenmask(len1)
    s = ones.copy()
    for j in range(n2):
        m = pm[:, j]
        u = s & m
        s = ((s + u) | (s - u)) & ones
    return len1.astype(np.int64) - _popcount_u64(s).astype(np.int64)


def osa_batch64(c1, len1, c2, len2) -> np.ndarray:
    """Hyyrö (2003) bit-parallel OSA (restricted transpositions)."""
    pm = pm_matrix(c1, len1, c2, len2)
    n2 = c2.shape[1]
    ones = _lenmask(len1)
    msb = _U1 << (np.maximum(len1, 1) - 1).astype(np.uint64)
    vp = ones.copy()
    vn = np.zeros_like(ones)
    d0 = np.zeros_like(ones)
    pm_prev = np.zeros_like(ones)
    dist = len1.astype(np.int64).copy()
    js = np.arange(n2)
    for j in range(n2):
        act = js[j] < len2
        p = pm[:, j]
        tr = (((~d0) & p) << _U1) & pm_prev
        nd0 = ((((p & vp) + vp) ^ vp) | p | vn | tr) & ones
        hp = vn | ~(nd0 | vp)
        hn = nd0 & vp
        dist += (act & ((hp & msb) != _U0)).astype(np.int64)
        dist -= (act & ((hn & msb) != _U0)).astype(np.int64)
        hp = (hp << _U1) | _U1
        hn = hn << _U1
        nvp = (hn | ~(nd0 | hp)) & ones
        nvn = hp & nd0 & ones
        vp = np.where(act, nvp, vp)
        vn = np.where(act, nvn, vn)
        d0 = np.where(act, nd0, d0)
        pm_prev = np.where(act, p, pm_prev)
    return dist
