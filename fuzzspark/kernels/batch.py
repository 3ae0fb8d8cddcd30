"""Batch evaluation of scorers over arrays of string pairs.

This is the engine under the Spark pandas UDFs: one call scores an
entire Arrow batch.  Strategy per pair family:

* ``levenshtein`` (uniform) / ``lcs_seq`` / ``indel`` / ``osa`` /
  ``ratio``: strip common affix (src/details/common.rs:79-108), then
  route short remainders (pattern ≤ 64 code points) to the numpy
  across-pair bit-parallel kernels and long remainders to big-int
  bit-parallel cores with per-distinct-pattern mask reuse — the
  ``BatchComparator`` analog (src/distance/levenshtein.rs:1636-1657).
* ``jaro`` / ``jaro_winkler``: O(n+m) greedy window matching per pair.
* ``hamming`` / ``prefix`` / ``postfix`` / weighted ``levenshtein`` /
  ``damerau_levenshtein``: scalar kernels per pair.

Outputs are float64 arrays with NaN for NULL inputs or cutoff-
suppressed scores (reference ``Option::None``, src/common.rs:33-86).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from . import fuzz as _fuzz
from ._bitpar import lcs_core, levenshtein_core, osa_core, pattern_masks
from ._bitpar_np import lcs_batch64, levenshtein_batch64, osa_batch64
from ._lcs_blocked_np import lcs_blocked_batch
from . import _native

_NATIVE_KIND = {"lcs_seq": _native.KIND_LCS, "levenshtein": _native.KIND_LEV,
                "osa": _native.KIND_OSA}
from .common import strip_common_affix
from .metrics import (
    ALL_METRICS,
    HammingError,
    _lev_maximum,
    damerau_distance_raw,
    hamming_distance_raw,
    jaro_similarity_raw,
    jaro_winkler_similarity_raw,
    levenshtein_distance_raw,
)

__all__ = ["batch_scores", "SCORERS", "FORMS"]

SCORERS = (
    "levenshtein", "indel", "lcs_seq", "osa", "damerau_levenshtein",
    "hamming", "jaro", "jaro_winkler", "prefix", "postfix", "ratio",
    "partial_ratio", "token_sort_ratio", "token_set_ratio",
)
FORMS = ("distance", "similarity", "normalized_distance", "normalized_similarity")

_BITPAR_CORES = {
    "levenshtein": (levenshtein_core, levenshtein_batch64),
    "lcs_seq": (lcs_core, lcs_batch64),
    "osa": (osa_core, osa_batch64),
}


def _clean(arr) -> list[Optional[str]]:
    out = []
    for v in arr:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            out.append(None)
        else:
            out.append(v if isinstance(v, str) else str(v))
    return out


def _pad_codes(strs: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=len(strs))
    width = max(1, int(lens.max()) if len(lens) else 1)
    mat = np.zeros((len(strs), width), dtype=np.int64)
    for k, s in enumerate(strs):
        if s:
            mat[k, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return mat, lens


def _bitpar_family_distances(kind: str, pairs: list[tuple[str, str]]) -> np.ndarray:
    """Exact distances for levenshtein/lcs(core=similarity)/osa over many
    pairs.  Returns raw *core* outputs: for 'lcs_seq' the LCS length of
    the stripped remainder (caller adds affix back), else the distance.

    Fast path: the compiled batch kernel (_native.c) when a compiler is
    available; else numpy across-pair uint64 lanes for short patterns
    and big-int bit-parallel cores for long ones."""
    native = _native.get_lib() is not None
    if native and pairs:
        # all three metrics are symmetric; the shorter side as pattern
        # minimizes the word count.  Sort by pattern so the C kernel's
        # consecutive-pattern mask reuse (BatchComparator analog) fires.
        pat = [a if len(a) <= len(b) else b for a, b in pairs]
        txt = [b if len(a) <= len(b) else a for a, b in pairs]
        order = sorted(range(len(pairs)), key=pat.__getitem__)
        got = _native.native_batch(_NATIVE_KIND[kind],
                                   [pat[k] for k in order],
                                   [txt[k] for k in order])
        if got is not None:
            out = np.empty(len(pairs), dtype=np.int64)
            out[order] = got
            return out
    scalar_core, np_core = _BITPAR_CORES[kind]
    n = len(pairs)
    out = np.zeros(n, dtype=np.int64)
    short_idx: list[int] = []
    short_pairs: list[tuple[str, str]] = []
    long_idx: list[int] = []
    long_pairs: list[tuple[str, str]] = []
    for k, (a, b) in enumerate(pairs):
        if not a:
            out[k] = 0 if kind == "lcs_seq" else len(b)
        elif not b:
            out[k] = 0 if kind == "lcs_seq" else len(a)
        elif len(a) <= 64:
            short_idx.append(k)
            short_pairs.append((a, b))
        else:
            long_idx.append(k)
            long_pairs.append((a, b))
    if short_pairs:
        c1, l1 = _pad_codes([p[0] for p in short_pairs])
        c2, l2 = _pad_codes([p[1] for p in short_pairs])
        out[short_idx] = np_core(c1, l1, c2, l2)
    if long_pairs:
        if kind == "lcs_seq":
            # blocked numpy kernel, vectorized across pairs; LCS is
            # symmetric so the shorter side becomes the pattern
            pat = [min(a, b, key=len) for a, b in long_pairs]
            txt = [max(b, a, key=len) for a, b in long_pairs]
            out[long_idx] = lcs_blocked_batch(pat, txt)
        else:
            # BatchComparator analog: reuse pattern masks per distinct s1
            order = sorted(range(len(long_pairs)),
                           key=lambda k: long_pairs[k][0])
            masks = None
            last = None
            for k in order:
                a, b = long_pairs[k]
                # value compare: the list is sorted by content, so equal
                # strings are adjacent even when they are distinct objects
                if a != last:
                    masks = pattern_masks(a)
                    last = a
                out[long_idx[k]] = scalar_core(a, b, masks)
    return out


def _raw_batch(scorer: str, s1: list, s2: list, valid: np.ndarray,
               weights=None, pad=True, prefix_weight=0.1,
               errors: str = "null") -> tuple[np.ndarray, np.ndarray]:
    """Exact raw canonical score per pair (distance for usize metrics,
    similarity for jaro family / composites).  Returns (raw, valid)."""
    n = len(s1)
    raw = np.full(n, np.nan)
    idx = np.flatnonzero(valid)

    if scorer in ("levenshtein",) and (weights is None or tuple(weights) == (1, 1, 1)):
        stripped = [strip_common_affix(s1[k], s2[k]) for k in idx]
        raw[idx] = _bitpar_family_distances("levenshtein", stripped)
    elif scorer == "levenshtein":
        for k in idx:
            raw[k] = levenshtein_distance_raw(s1[k], s2[k], tuple(weights))
    elif scorer in ("indel", "lcs_seq", "ratio", "token_sort_ratio"):
        if scorer == "token_sort_ratio":
            pairs = [(" ".join(sorted(s1[k].split())), " ".join(sorted(s2[k].split())))
                     for k in idx]
        else:
            pairs = [(s1[k], s2[k]) for k in idx]
        lens = np.array([[len(a), len(b)] for a, b in pairs], dtype=np.int64).reshape(-1, 2)
        stripped = [strip_common_affix(a, b) for a, b in pairs]
        # stripped affix chars are all part of the LCS
        affix = np.array([len(a) - len(a2) for (a, _b), (a2, _b2) in zip(pairs, stripped)],
                         dtype=np.int64) if len(pairs) else np.zeros(0, dtype=np.int64)
        lcs_rem = _bitpar_family_distances("lcs_seq", stripped)
        lcs_full = lcs_rem + affix
        if scorer == "indel":
            raw[idx] = lens[:, 0] + lens[:, 1] - 2 * lcs_full
        elif scorer == "lcs_seq":
            # canonical raw = distance = max(len) - lcs
            raw[idx] = np.maximum(lens[:, 0], lens[:, 1]) - lcs_full
        else:  # ratio family: similarity canonical
            total = lens[:, 0] + lens[:, 1]
            dist = total - 2 * lcs_full
            with np.errstate(invalid="ignore", divide="ignore"):
                sim = np.where(total == 0, 1.0, 1.0 - dist / np.where(total == 0, 1, total))
            raw[idx] = sim
    elif scorer == "osa":
        stripped = [strip_common_affix(s1[k], s2[k]) for k in idx]
        raw[idx] = _bitpar_family_distances("osa", stripped)
    elif scorer == "damerau_levenshtein":
        stripped = [strip_common_affix(s1[k], s2[k]) for k in idx]
        got = _native.native_damerau([a for a, _ in stripped],
                                     [b for _, b in stripped])
        if got is not None:
            raw[idx] = got
            for pos, k in enumerate(idx):  # oversized DP fell back
                if got[pos] < 0:
                    raw[k] = damerau_distance_raw(s1[k], s2[k])
        else:
            for k in idx:
                raw[k] = damerau_distance_raw(s1[k], s2[k])
    elif scorer == "hamming":
        bad = []
        for k in idx:
            try:
                raw[k] = hamming_distance_raw(s1[k], s2[k], pad=pad)
            except HammingError:
                if errors == "raise":
                    raise
                bad.append(k)
        if bad:
            valid = valid.copy()
            valid[bad] = False
    elif scorer in ("jaro", "jaro_winkler"):
        a = [s1[k] for k in idx]
        b = [s2[k] for k in idx]
        got = _native.native_jaro(a, b)
        if got is None:
            fn = (jaro_similarity_raw if scorer == "jaro"
                  else lambda x, y: jaro_winkler_similarity_raw(
                      x, y, prefix_weight))
            for k in idx:
                raw[k] = fn(s1[k], s2[k])
        else:
            if scorer == "jaro_winkler":
                # prefix boost (src/distance/jaro_winkler.rs:64-101)
                for pos in range(len(idx)):
                    sim = got[pos]
                    if sim > 0.7:
                        x, y = a[pos], b[pos]
                        pfx = 0
                        for c1, c2 in zip(x[:4], y[:4]):
                            if c1 != c2:
                                break
                            pfx += 1
                        got[pos] = sim + pfx * prefix_weight * (1.0 - sim)
            raw[idx] = got
    elif scorer == "prefix":
        # canonical raw = distance = max(len) - common_prefix
        for k in idx:
            a, b = s1[k], s2[k]
            p = 0
            for c1, c2 in zip(a, b):
                if c1 != c2:
                    break
                p += 1
            raw[k] = max(len(a), len(b)) - p
    elif scorer == "postfix":
        for k in idx:
            a, b = s1[k], s2[k]
            p = 0
            for c1, c2 in zip(reversed(a), reversed(b)):
                if c1 != c2:
                    break
                p += 1
            raw[k] = max(len(a), len(b)) - p
    elif scorer == "partial_ratio":
        for k in idx:
            raw[k] = _fuzz.partial_ratio_raw(s1[k], s2[k])
    elif scorer == "token_set_ratio":
        for k in idx:
            raw[k] = _fuzz.token_set_ratio(s1[k], s2[k])
    else:
        raise ValueError(f"unknown scorer {scorer!r}")
    return raw, valid


_SIM_CANONICAL = {"jaro", "jaro_winkler", "ratio", "partial_ratio",
                  "token_sort_ratio", "token_set_ratio"}


def _length_hopeless(scorer, form, s1, s2, cutoff, weights,
                     prefix_weight=0.1) -> np.ndarray:
    """True where string lengths alone prove the cutoff cannot be met.
    Conservative (never prunes a passing pair); False where unsure."""
    n = len(s1)
    l1 = np.array([len(a) if a is not None else 0 for a in s1], dtype=np.float64)
    l2 = np.array([len(b) if b is not None else 0 for b in s2], dtype=np.float64)
    lo = np.minimum(l1, l2)
    hi = np.maximum(l1, l2)
    both_empty = (l1 + l2) == 0
    out = np.zeros(n, dtype=bool)
    if form == "normalized_similarity":
        if scorer in ("ratio", "indel"):
            with np.errstate(invalid="ignore", divide="ignore"):
                bound = np.where(both_empty, 1.0, 2.0 * lo /
                                 np.maximum(l1 + l2, 1.0))
        elif scorer == "jaro":
            bound = np.where(both_empty, 1.0,
                             np.where(lo == 0, 0.0, (lo / np.maximum(hi, 1.0) + 2.0) / 3.0))
        elif scorer == "jaro_winkler":
            jb = np.where(both_empty, 1.0,
                          np.where(lo == 0, 0.0, (lo / np.maximum(hi, 1.0) + 2.0) / 3.0))
            # prefix boost (<= 4 chars * prefix_weight, applied only when
            # jaro > 0.7; the reference imposes no cap on the weight —
            # src/distance/jaro_winkler.rs:64-101), so the bound must
            # scale with the caller's prefix_weight
            bound = np.where(jb > 0.7,
                             jb + 4.0 * prefix_weight * (1.0 - jb), jb)
        elif scorer in ("levenshtein", "osa", "damerau_levenshtein",
                        "lcs_seq", "prefix", "postfix"):
            if scorer == "levenshtein" and weights is not None \
                    and tuple(weights) != (1, 1, 1):
                return out
            bound = np.where(both_empty, 1.0, lo / np.maximum(hi, 1.0))
        else:
            return out
        out = bound < cutoff
    elif form == "distance" and scorer in (
            "levenshtein", "osa", "damerau_levenshtein"):
        if scorer == "levenshtein" and weights is not None \
                and tuple(weights) != (1, 1, 1):
            return out
        out = (hi - lo) > cutoff
    return out


def _maximum_arr(scorer: str, s1, s2, idx, weights=None) -> np.ndarray:
    l1 = np.array([len(s1[k]) for k in idx], dtype=np.float64)
    l2 = np.array([len(s2[k]) for k in idx], dtype=np.float64)
    if scorer in _SIM_CANONICAL:
        return np.ones(len(idx))
    if scorer == "indel":
        return l1 + l2
    if scorer == "levenshtein" and weights is not None and tuple(weights) != (1, 1, 1):
        return np.array([_lev_maximum(int(a), int(b), tuple(weights))
                         for a, b in zip(l1, l2)], dtype=np.float64)
    return np.maximum(l1, l2)


def batch_scores(scorer: str, form: str, s1_arr, s2_arr, *,
                 score_cutoff: Optional[float] = None, weights=None,
                 pad: bool = True, prefix_weight: float = 0.1,
                 errors: str = "null") -> np.ndarray:
    """Score a batch; returns float64 with NaN for NULL / suppressed."""
    if form not in FORMS:
        raise ValueError(f"unknown form {form!r}")
    s1 = _clean(s1_arr)
    s2 = _clean(s2_arr)
    n = len(s1)
    valid = np.array([a is not None and b is not None for a, b in zip(s1, s2)])
    if score_cutoff is not None:
        # kernel-level analog of the reference's length-difference prune
        # (src/distance/levenshtein.rs:1045-1047, jaro length_filter
        # :122-131): pairs that cannot satisfy the cutoff never reach
        # the kernel.  Their output is suppressed (NaN) either way, so
        # this is exactly result-preserving.
        valid = valid & ~_length_hopeless(scorer, form, s1, s2, score_cutoff,
                                          weights, prefix_weight=prefix_weight)
    raw, valid = _raw_batch(scorer, s1, s2, valid, weights=weights, pad=pad,
                            prefix_weight=prefix_weight, errors=errors)
    out = np.full(n, np.nan)
    idx = np.flatnonzero(valid)
    if len(idx) == 0:
        return out
    r = raw[idx]
    sim_canon = scorer in _SIM_CANONICAL
    maximum = _maximum_arr(scorer, s1, s2, idx, weights=weights)
    if sim_canon:
        sim = r
        dist = maximum - r
    else:
        dist = r
        sim = maximum - r
    with np.errstate(invalid="ignore", divide="ignore"):
        nd = np.where(maximum == 0, 0.0, dist / np.where(maximum == 0, 1.0, maximum))
    ns = 1.0 - nd
    val = {"distance": dist, "similarity": sim,
           "normalized_distance": nd, "normalized_similarity": ns}[form]
    if score_cutoff is not None:
        if form in ("distance", "normalized_distance"):
            val = np.where(val <= score_cutoff, val, np.nan)
        else:
            val = np.where(val >= score_cutoff, val, np.nan)
    out[idx] = val
    return out
