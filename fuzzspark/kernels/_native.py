"""ctypes loader for the native batch kernels (_native.c).

Compiles lazily, once per machine, into a shared cache dir keyed by the
source hash (safe under concurrent python workers via atomic rename).
Falls back to None when no compiler is available — callers must keep
the pure-Python path.  Disable with FUZZSPARK_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native.c")
_LIB = None
_TRIED = False

KIND_LCS = 0
KIND_LEV = 1
KIND_OSA = 2


def _read_source() -> bytes | None:
    try:
        return open(_SRC, "rb").read()
    except OSError:
        pass
    try:  # imported from the shipped zip: read via the package loader
        import importlib.resources as ir
        return (ir.files(__package__) / "_native.c").read_bytes()
    except Exception:
        return None


def _compile() -> str | None:
    src = _read_source()
    if src is None:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), "fuzzspark_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"kernels_{tag}.so")
    if os.path.exists(so):
        return so
    csrc = os.path.join(cache, f"kernels_{tag}.c")
    if not os.path.exists(csrc):
        ctmp = f"{csrc}.{os.getpid()}.tmp"
        with open(ctmp, "wb") as f:
            f.write(src)
        os.replace(ctmp, csrc)
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = ["gcc", "-O3", "-shared", "-fPIC", "-o", tmp, csrc]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            return None
        os.replace(tmp, so)  # atomic; racing workers converge on one file
        return so
    except Exception:
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("FUZZSPARK_NO_NATIVE"):
        return None
    so = _compile()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.batch_metric.restype = ctypes.c_int
        lib.batch_metric.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.batch_metric_bounded.restype = ctypes.c_int
        lib.batch_metric_bounded.argtypes = \
            lib.batch_metric.argtypes + [
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        # es-aware core: code buffers as raw pointers (uint8 or uint32)
        lib.batch_metric_bounded_es.restype = ctypes.c_int
        lib.batch_metric_bounded_es.argtypes = [
            ctypes.c_int,
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.batch_affix.restype = ctypes.c_int
        lib.batch_affix.argtypes = [
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.batch_osa_banded_es.restype = ctypes.c_int
        lib.batch_osa_banded_es.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.batch_lev_hinted_es.restype = ctypes.c_int
        lib.batch_lev_hinted_es.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.batch_indel_banded_es.restype = ctypes.c_int
        lib.batch_indel_banded_es.argtypes = \
            lib.batch_lev_hinted_es.argtypes
        lib.batch_jaro.restype = ctypes.c_int
        lib.batch_jaro.argtypes = [
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.batch_partial_lcs.restype = ctypes.c_int
        lib.batch_partial_lcs.argtypes = [
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.batch_damerau.restype = ctypes.c_int
        lib.batch_damerau.argtypes = [
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.batch_minhash.restype = ctypes.c_int
        lib.batch_minhash.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.batch_union_find.restype = ctypes.c_int
        lib.batch_union_find.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
    except (OSError, AttributeError):
        _LIB = None
    return _LIB


def _flatten(strs: list[str], lens: np.ndarray | None = None):
    if lens is None:
        lens = np.fromiter((len(s) for s in strs), dtype=np.int64,
                           count=len(strs))
    off = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    joined = "".join(strs)
    if not joined:
        return np.zeros(0, dtype=np.uint32), off
    try:
        # ASCII fast path: 1-byte encode + numpy widening beats the
        # 4-byte utf-32 encode for the overwhelmingly common case
        codes = np.frombuffer(joined.encode("ascii"),
                              dtype=np.uint8).astype(np.uint32)
    except UnicodeEncodeError:
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    return np.ascontiguousarray(codes), off


def _flatten_raw(strs: list[str], lens: np.ndarray | None = None):
    """(codes, offsets, elem_size): ASCII batches stay as the raw 1-byte
    encode (no widening copy, 4x less kernel input traffic); anything
    else falls back to uint32 code points."""
    if lens is None:
        lens = np.fromiter((len(s) for s in strs), dtype=np.int64,
                           count=len(strs))
    off = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    joined = "".join(strs)
    if not joined:
        return np.zeros(0, dtype=np.uint8), off, 1
    try:
        return (np.frombuffer(joined.encode("ascii"), dtype=np.uint8),
                off, 1)
    except UnicodeEncodeError:
        return (np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32),
                off, 4)


def native_batch(kind: int, pat_strs: list[str], txt_strs: list[str],
                 bounds: np.ndarray | None = None,
                 pat_lens: np.ndarray | None = None,
                 txt_lens: np.ndarray | None = None) -> np.ndarray | None:
    """Batch metric via the native kernel, or None if unavailable.
    kind 0: LCS similarity; 1: levenshtein distance; 2: OSA distance.
    ``bounds`` (optional int64, -1 = none): per-pair early-abandon
    bound (min passing LCS / max passing distance); abandoned pairs
    return -1 (provably outside the cutoff).  ``pat_lens``/``txt_lens``:
    optional precomputed lengths (skips one python pass per side)."""
    lib = get_lib()
    if lib is None or not pat_strs:
        return None if lib is None else np.zeros(0, dtype=np.int64)
    pat, pat_off, p_es = _flatten_raw(pat_strs, pat_lens)
    txt, txt_off, t_es = _flatten_raw(txt_strs, txt_lens)
    if p_es != t_es:  # mixed ascii/wide sides: widen the narrow one
        if p_es == 1:
            pat = pat.astype(np.uint32)
        else:
            txt = txt.astype(np.uint32)
        p_es = t_es = 4
    out = np.empty(len(pat_strs), dtype=np.int64)
    b = (None if bounds is None
         else np.ascontiguousarray(bounds, dtype=np.int64))
    rc = lib.batch_metric_bounded_es(
        kind,
        pat.ctypes.data_as(ctypes.c_void_p), pat_off,
        txt.ctypes.data_as(ctypes.c_void_p), txt_off,
        len(pat_strs), out,
        None if b is None else b.ctypes.data_as(ctypes.c_void_p),
        p_es)
    if rc != 0:  # pragma: no cover (allocation failure)
        return None
    return out


def native_affix(mode: int, pat_strs: list[str], txt_strs: list[str],
                 cap: int = 0) -> np.ndarray | None:
    """Common affix length per pair (mode 0 = prefix, 1 = suffix);
    cap > 0 bounds the scan.  None when no compiler is available."""
    lib = get_lib()
    if lib is None or not pat_strs:
        return None if lib is None else np.zeros(0, dtype=np.int64)
    pat, pat_off, p_es = _flatten_raw(pat_strs)
    txt, txt_off, t_es = _flatten_raw(txt_strs)
    if p_es != t_es:
        if p_es == 1:
            pat = pat.astype(np.uint32)
        else:
            txt = txt.astype(np.uint32)
        p_es = t_es = 4
    out = np.empty(len(pat_strs), dtype=np.int64)
    rc = lib.batch_affix(
        mode, cap,
        pat.ctypes.data_as(ctypes.c_void_p), pat_off,
        txt.ctypes.data_as(ctypes.c_void_p), txt_off,
        len(pat_strs), out, p_es)
    return out if rc == 0 else None


def native_banded(kind: str, pat_strs: list[str], txt_strs: list[str],
                  hint, bounds: np.ndarray | None = None
                  ) -> np.ndarray | None:
    """Hint/cutoff-seeded banded kernels (exact results), kind in
    {'levenshtein', 'osa', 'indel'}: per pair the diagonal band starts
    at ``hint`` (a scalar raw distance or a per-pair int64 array) and
    doubles until the distance is found.  -2 entries mark pairs where
    banding cannot beat the full bit-parallel kernel (caller recomputes
    those via native_batch); -1 entries mark pairs proven above
    ``bounds`` (the bounded kernel's abandonment contract).  None when
    no compiler is available."""
    lib = get_lib()
    if lib is None or not pat_strs:
        return None if lib is None else np.zeros(0, dtype=np.int64)
    pat, pat_off, p_es = _flatten_raw(pat_strs)
    txt, txt_off, t_es = _flatten_raw(txt_strs)
    if p_es != t_es:
        if p_es == 1:
            pat = pat.astype(np.uint32)
        else:
            txt = txt.astype(np.uint32)
        p_es = t_es = 4
    out = np.empty(len(pat_strs), dtype=np.int64)
    hints = (np.ascontiguousarray(hint, dtype=np.int64)
             if isinstance(hint, np.ndarray)
             else np.full(len(pat_strs), int(hint), dtype=np.int64))
    b = (None if bounds is None
         else np.ascontiguousarray(bounds, dtype=np.int64))
    fn = {"levenshtein": lib.batch_lev_hinted_es,
          "osa": lib.batch_osa_banded_es,
          "indel": lib.batch_indel_banded_es}[kind]
    rc = fn(
        pat.ctypes.data_as(ctypes.c_void_p), pat_off,
        txt.ctypes.data_as(ctypes.c_void_p), txt_off,
        len(pat_strs), out,
        hints.ctypes.data_as(ctypes.c_void_p),
        None if b is None else b.ctypes.data_as(ctypes.c_void_p),
        p_es)
    return out if rc == 0 else None


def native_lev_hinted(pat_strs: list[str], txt_strs: list[str],
                      hint, bounds: np.ndarray | None = None
                      ) -> np.ndarray | None:
    """Back-compat alias for native_banded('levenshtein', ...)."""
    return native_banded("levenshtein", pat_strs, txt_strs, hint, bounds)


def native_partial_lcs(pat_strs: list[str], txt_strs: list[str]
                       ) -> np.ndarray | None:
    """max LCS of pat against any equal-length window of txt (pat must
    be the shorter side), or None when no compiler is available."""
    lib = get_lib()
    if lib is None:
        return None
    if not pat_strs:
        return np.zeros(0, dtype=np.int64)
    pat, pat_off = _flatten(pat_strs)
    txt, txt_off = _flatten(txt_strs)
    out = np.empty(len(pat_strs), dtype=np.int64)
    rc = lib.batch_partial_lcs(pat, pat_off, txt, txt_off,
                               len(pat_strs), out)
    return out if rc == 0 else None


def native_jaro(pat_strs: list[str], txt_strs: list[str]) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    if not pat_strs:
        return np.zeros(0, dtype=np.float64)
    pat, pat_off = _flatten(pat_strs)
    txt, txt_off = _flatten(txt_strs)
    out = np.empty(len(pat_strs), dtype=np.float64)
    rc = lib.batch_jaro(pat, pat_off, txt, txt_off, len(pat_strs), out)
    return out if rc == 0 else None


def native_minhash(strs: list[str], k: int, A: np.ndarray, B: np.ndarray,
                   n_bands: int, rows_per_band: int) -> np.ndarray | None:
    """MinHash-LSH band keys for a batch of (already truncated,
    non-null) strings — bit-exact with blocking.make_minhash_compute's
    numpy reference.  Returns (n_docs, n_bands) int64, or None when no
    compiler is available."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(strs)
    if not n:
        return np.zeros((0, n_bands), dtype=np.int64)
    txt, off, es = _flatten_raw(strs)
    out = np.empty(n * n_bands, dtype=np.int64)
    rc = lib.batch_minhash(
        txt.ctypes.data_as(ctypes.c_void_p), off, n, es, int(k),
        np.ascontiguousarray(A, dtype=np.uint64),
        np.ascontiguousarray(B, dtype=np.uint64),
        len(A), int(n_bands), int(rows_per_band), out)
    return out.reshape(n, n_bands) if rc == 0 else None


def union_find_roots(du: np.ndarray, dv: np.ndarray,
                     n_nodes: int) -> np.ndarray:
    """Component minimum (as dense id) per dense node id, given edges
    (du[i], dv[i]) over ids in [0, n_nodes).  C kernel when available
    (~20 ns/edge), else a python union-find — identical results."""
    lib = get_lib()
    parent = np.arange(n_nodes, dtype=np.int64)
    m = len(du)
    if not m:
        return parent
    if lib is not None:
        du = np.ascontiguousarray(du, dtype=np.int64)
        dv = np.ascontiguousarray(dv, dtype=np.int64)
        if lib.batch_union_find(du, dv, m, n_nodes, parent) == 0:
            return parent
    # pure-python union-by-min with path halving (fresh state in case a
    # failed native call partially wrote into parent)
    p = np.arange(n_nodes, dtype=np.int64)

    def find(x: int) -> int:
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for a, b in zip(du.tolist(), dv.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                p[rb] = ra
            else:
                p[ra] = rb
    for i in range(n_nodes):
        p[i] = find(i)
    return p


def native_damerau(pat_strs: list[str], txt_strs: list[str],
                   max_cells: int = 1 << 24) -> np.ndarray | None:
    """Zhao-Sahni linear-space DL kernel: any input length, O(n + sigma)
    working memory.  max_cells is retained for ABI stability but unused
    (the old full-matrix kernel's -1 oversized marker is gone)."""
    lib = get_lib()
    if lib is None:
        return None
    if not pat_strs:
        return np.zeros(0, dtype=np.int64)
    pat, pat_off = _flatten(pat_strs)
    txt, txt_off = _flatten(txt_strs)
    out = np.empty(len(pat_strs), dtype=np.int64)
    rc = lib.batch_damerau(pat, pat_off, txt, txt_off, len(pat_strs),
                           out, max_cells)
    return out if rc == 0 else None
