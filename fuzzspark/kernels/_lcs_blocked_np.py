"""Blocked bit-parallel LCS, numpy-vectorized across the pair axis.

The analog of the reference's multi-word LCS kernel
(lcs_blockwise, src/distance/lcs_seq.rs:267-341) with the batch as the
SIMD axis: a group of pairs whose patterns need the same number of
64-bit words advances together, one text position per step, with the
carry chain run across words.

Pattern-match masks are built once per DISTINCT pattern (the
``BatchComparator`` amortization, src/distance/lcs_seq.rs:439-486) and
each text position looks its mask row up via one sorted-key
searchsorted — the vectorized analog of the reference's
PatternMatchVector map (src/details/pattern_match_vector.rs:20-64).
"""

from __future__ import annotations

import numpy as np

__all__ = ["lcs_blocked_batch", "width_chunks"]

_U1 = np.uint64(1)
_CHAR_BITS = 21  # unicode code points < 2^21


def width_chunks(widths, budget: int = 1 << 22, max_rows: int = 16384):
    """Yield index arrays grouping rows (ascending by width) so that
    rows * chunk_max_width stays under ``budget`` elements — bounds the
    padded-matrix allocations of the numpy fallback kernels regardless
    of length skew (round 5: one ~100 KB document in a 10k-row Arrow
    batch must not allocate a 10k x 100k matrix).  A single row wider
    than the budget gets its own chunk (its matrix is 1 x width)."""
    widths = np.asarray(widths, dtype=np.int64)
    order = np.argsort(widths, kind="stable")
    n = len(order)
    start = 0
    while start < n:
        end = start + 1
        # ascending order: the chunk max width is the last row's width
        while (end < n and end - start < max_rows
               and (end - start + 1) * max(1, int(widths[order[end]]))
               <= budget):
            end += 1
        yield order[start:end]
        start = end


def _popcount(x: np.ndarray) -> np.ndarray:
    try:
        return x.bit_count()
    except AttributeError:  # pragma: no cover (numpy < 2)
        x = x - ((x >> _U1) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _factorize_patterns(pat_strs: list[str]) -> tuple[np.ndarray, list[str]]:
    """pair -> distinct-pattern group id (dict on the string objects)."""
    gids = np.empty(len(pat_strs), dtype=np.int64)
    distinct: dict[str, int] = {}
    out: list[str] = []
    for i, s in enumerate(pat_strs):
        g = distinct.get(s)
        if g is None:
            g = len(out)
            distinct[s] = g
            out.append(s)
        gids[i] = g
    return gids, out


def _codes(s: str) -> np.ndarray:
    if not s:
        return np.zeros(0, dtype=np.uint64)
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
             .astype(np.uint64)


def _flat_codes(strs: list[str]):
    """One encode over the concatenation: (codes, gid-per-char,
    pos-within-string-per-char, lengths)."""
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64,
                       count=len(strs))
    codes = _codes("".join(strs))
    gid = np.repeat(np.arange(len(strs), dtype=np.uint64), lens)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = (np.arange(len(codes), dtype=np.int64)
           - np.repeat(offsets, lens)).astype(np.uint64)
    return codes, gid, pos, lens


def _build_mask_table(distinct: list[str], w: int):
    """(gid, char) -> per-word occurrence masks, over distinct patterns.

    Returns (sorted unique keys, mask matrix (n_keys, w))."""
    codes, gid, pos, _lens = _flat_codes(distinct)
    keys = (gid << np.uint64(_CHAR_BITS)) | codes
    words = (pos >> np.uint64(6)).astype(np.int64)
    bits = _U1 << (pos & np.uint64(63))
    # group by (key, word), OR the bits.  lexsort — NOT a packed scalar:
    # packing the word index into fixed low bits aliases (key, word)
    # groups for patterns past the bit budget (regression: 2^16 chars).
    order = np.lexsort((words, keys))
    keys, words, bits = keys[order], words[order], bits[order]
    boundary = np.ones(len(keys), dtype=bool)
    boundary[1:] = (keys[1:] != keys[:-1]) | (words[1:] != words[:-1])
    starts = np.flatnonzero(boundary)
    merged = np.bitwise_or.reduceat(bits, starts) if len(starts) else bits[:0]
    gkeys, gwords = keys[starts], words[starts]
    kb = np.ones(len(gkeys), dtype=bool)
    kb[1:] = gkeys[1:] != gkeys[:-1]
    ukeys = gkeys[kb]
    rows = np.cumsum(kb) - 1
    table = np.zeros((len(ukeys), w), dtype=np.uint64)
    table[rows, gwords] = merged
    return ukeys, table


def lcs_blocked_batch(pat_strs: list[str], txt_strs: list[str],
                      chunk: int = 16384) -> np.ndarray:
    """LCS lengths for string pairs; patterns should be the shorter side
    (LCS is symmetric).  Handles any length; cost O(n2 * ceil(n1/64))
    per pair with the pair axis vectorized.  Chunks are width-aware
    (width_chunks): the per-chunk (rows x n2max) text-key matrix stays
    bounded even when one text is orders of magnitude longer than the
    rest."""
    P = len(pat_strs)
    out = np.zeros(P, dtype=np.int64)
    if not P:
        return out
    tl = np.fromiter((len(s) for s in txt_strs), dtype=np.int64, count=P)
    for sel in width_chunks(tl, max_rows=chunk):
        out[sel] = _lcs_chunk([pat_strs[j] for j in sel],
                              [txt_strs[j] for j in sel])
    return out


def _lcs_chunk(pat_strs: list[str], txt_strs: list[str]) -> np.ndarray:
    P = len(pat_strs)
    gids, distinct = _factorize_patterns(pat_strs)
    m = np.fromiter((len(s) for s in pat_strs), dtype=np.int64, count=P)
    n = np.fromiter((len(s) for s in txt_strs), dtype=np.int64, count=P)
    w = max(1, int((m.max() + 63) // 64))
    n2max = int(n.max()) if P else 0

    ukeys, table = _build_mask_table(distinct, w)

    # text keys per (pair, j), padded with a sentinel no-match
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    tk = np.full((P, n2max), sentinel, dtype=np.uint64)
    tcodes, tpair, tpos, _tlens = _flat_codes(txt_strs)
    gshift = gids.astype(np.uint64) << np.uint64(_CHAR_BITS)
    tk.flat[tpair.astype(np.int64) * n2max + tpos.astype(np.int64)] = \
        gshift[tpair.astype(np.int64)] | tcodes
    idx = np.searchsorted(ukeys, tk)
    idx_c = np.minimum(idx, max(len(ukeys) - 1, 0))
    hit = (ukeys[idx_c] == tk) if len(ukeys) else np.zeros_like(tk, bool)

    zero_row = np.zeros(1, dtype=np.uint64)
    mask_rows = [np.concatenate([table[:, k], zero_row]) for k in range(w)]
    miss_row = len(ukeys)
    lookup = np.ascontiguousarray(
        np.where(hit, idx_c, miss_row).T)  # (n2max, P) row-contiguous

    # S starts all-ones over m bits, split into per-word contiguous arrays
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    S_words, word_masks = [], []
    for k in range(w):
        bits_k = np.clip(m - 64 * k, 0, 64).astype(np.uint64)
        wm = np.where(bits_k >= np.uint64(64), full, (_U1 << bits_k) - _U1)
        word_masks.append(wm)
        S_words.append(wm.copy())

    for j in range(n2max):
        row = lookup[j]
        carry = np.zeros(P, dtype=np.uint64)
        for k in range(w):
            Sk = S_words[k]
            u = Sk & mask_rows[k][row]
            t = Sk + u
            c1 = t < Sk
            t2 = t + carry
            c2 = t2 < t
            S_words[k] = (t2 | (Sk - u)) & word_masks[k]
            carry = (c1 | c2).astype(np.uint64)
    pop = np.zeros(P, dtype=np.int64)
    for k in range(w):
        pop += _popcount(S_words[k]).astype(np.int64)
    return m - pop
