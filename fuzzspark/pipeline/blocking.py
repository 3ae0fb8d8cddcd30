"""Blocking: candidate-key generation, block census, skew defusal.

Key families (each a (id, block_key) relation; union = recall ∪):

* ``exact``    — sha256(content): exact duplicates, zero scoring cost.
* ``path``     — (lang, normalized path stem): cheap structural key.
* ``minhash``  — MinHash-LSH over character shingles of normalized
  content: b bands × r rows; two files share a band key with
  probability 1-(1-j^r)^b for Jaccard j (the LSH S-curve).  Computed in
  ONE vectorized pandas UDF returning array<long>, then exploded —
  no per-row Python (BASELINE.json:input_hint).

Skew defusal: a single giant block produces O(n²) pairs no matter what
AQE does to the *join*, so oversized blocks are length-sorted and
re-keyed into overlapping sorted-neighborhood windows (bounded pairs,
documented recall tradeoff) — SURVEY.md §4 "what Catalyst cannot do".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["normalize_content", "block_keys", "defuse_skew",
           "minhash_bands_udf", "minhash_key_rows"]

# large 63-bit primes for the affine minhash family
_MERSENNE = (1 << 61) - 1


def _hash_family(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def make_minhash_matrix(n_bands: int = 8, rows_per_band: int = 4,
                        shingle: int = 5, max_chars: int = 2000,
                        seed: int = 1729):
    """MinHash band keys in PRE-EXPLODE matrix form: texts (may contain
    None) -> (idx, keys) where ``idx`` lists the non-null positions and
    ``keys`` is the (len(idx), n_bands) int64 key matrix.  This is the
    computation :func:`make_minhash_compute` wraps — the matrix form
    exists so :func:`minhash_key_rows` can emit already-exploded
    (id, bk) Arrow rows without building a per-doc Python list of keys
    (round 7: that list churn plus the JVM ``explode`` was most of the
    key-generation stage's cost — guide §4.2)."""
    n_hashes = n_bands * rows_per_band
    A, B = _hash_family(n_hashes, seed)
    Au = A.astype(np.uint64)[:, None]
    Bu = B.astype(np.uint64)[:, None]
    band_off = np.arange(n_bands, dtype=np.int64) << np.int64(56)

    def matrix(content) -> tuple[np.ndarray, np.ndarray]:
        texts, idx = [], []
        for i, t in enumerate(content):
            if t is not None:
                idx.append(i)
                texts.append(t[:max_chars])
        idx = np.asarray(idx, dtype=np.int64)
        # C fast path (round 6): one call over the flattened batch —
        # bit-exact with the numpy loop below (the loop stays as the
        # no-compiler fallback AND the oracle-parity definition).  The
        # big win is the compile-time-constant Mersenne modulus
        # (strength-reduced to multiply-high; numpy pays a runtime-
        # divisor division per element) plus zero per-doc python.
        try:
            from fuzzspark.kernels._native import native_minhash
        except Exception:  # pragma: no cover — partial install
            native_minhash = None
        if native_minhash is not None:
            keys = native_minhash(texts, shingle, A, B,
                                  n_bands, rows_per_band)
            if keys is not None:
                return idx, keys
        rows = np.empty((len(texts), n_bands), dtype=np.int64)
        for pos, t in enumerate(texts):
            if len(t) < shingle:
                # deterministic short-string hash (Python hash() is
                # salted).  The uint64 overflow is the INTENDED FNV
                # wrap — silence numpy's per-doc RuntimeWarning
                # (VERDICT r6: log noise at corpus scale on
                # no-compiler executors)
                hv = np.uint64(1469598103934665603)
                with np.errstate(over="ignore"):
                    for ch in t:
                        hv = (hv * np.uint64(1099511628211)) \
                            ^ np.uint64(ord(ch))
                shingles = np.array([np.int64(hv >> np.uint64(1))], dtype=np.int64)
            else:
                # vectorized shingle hashing: polynomial over code points
                codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                codes = codes.astype(np.uint64)
                k = shingle
                h = np.zeros(len(codes) - k + 1, dtype=np.uint64)
                for i in range(k):
                    h = h * np.uint64(1000003) + codes[i: len(codes) - k + 1 + i]
                shingles = np.unique(h).astype(np.int64) & 0x7FFFFFFFFFFFFFFF
            # minhash: (a*x + b) mod p, min over shingles, per hash fn
            x = shingles.astype(np.uint64)[None, :]
            vals = (Au * x + Bu) % np.uint64(_MERSENNE)
            sig = vals.min(axis=1)  # (n_hashes,)
            bands = sig.reshape(n_bands, rows_per_band)
            keys = np.zeros(n_bands, dtype=np.uint64)
            for r in range(rows_per_band):
                keys = keys * np.uint64(0x9E3779B97F4A7C15) + bands[:, r]
            keys = (keys >> np.uint64(1)).astype(np.int64)  # keep positive
            keys += band_off
            rows[pos] = keys
        return idx, rows

    return matrix


def make_minhash_compute(n_bands: int = 8, rows_per_band: int = 4,
                         shingle: int = 5, max_chars: int = 2000,
                         seed: int = 1729):
    """Plain-python MinHash band-key computation (no Spark dependency;
    the UDF below wraps it).

    MinHash over character shingles of the first ``max_chars`` chars
    (content prefix shingles per BASELINE.json north_star).  Band key =
    hash of the band's row signature, offset by band index so keys from
    different bands never collide.  Per-doc list form of
    :func:`make_minhash_matrix` (None for null texts)."""
    matrix = make_minhash_matrix(n_bands, rows_per_band, shingle,
                                 max_chars, seed)

    def compute(content) -> list:
        idx, keys = matrix(content)
        out = [None] * len(content)
        for pos, i in enumerate(idx):
            out[i] = keys[pos].tolist()
        return out

    return compute


def minhash_bands_udf(n_bands: int = 8, rows_per_band: int = 4,
                      shingle: int = 5, max_chars: int = 2000,
                      seed: int = 1729):
    """pandas UDF: content -> array<long> of band keys."""
    compute = make_minhash_compute(n_bands, rows_per_band, shingle,
                                   max_chars, seed)

    @pandas_udf("array<long>")
    def _udf(content: pd.Series) -> pd.Series:
        return pd.Series(compute(content), index=content.index)

    return _udf


def minhash_key_rows(df: DataFrame, *, id_col: str = "id",
                     text_col: str = "__mh_norm",
                     carry: tuple[str, ...] = (),
                     n_bands: int = 8, rows_per_band: int = 4,
                     shingle: int = 5, max_chars: int = 2000,
                     seed: int = 1729) -> DataFrame:
    """Pre-exploded MinHash key rows: ``df`` (with an already-normalized
    ``text_col``) -> (id_col, *carry, bk:long), one row per (doc, band).

    Round 7 (guide §4.2): equivalent to
    ``explode(minhash_bands_udf(text_col))`` — same kernel, same keys,
    null texts dropped just as ``explode`` drops null arrays — but the
    keys leave the Python worker as one flat Arrow int64 column
    (``matrix.ravel()`` + ``np.repeat`` of the carried columns) instead
    of a per-doc Python list that the JVM then re-explodes.  The
    per-doc list build + explode was most of the key stage's cost."""
    import pyarrow as pa
    import pyarrow.compute as pc

    keep = [id_col, *carry]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keep
    ) + ", bk long"
    params = (n_bands, rows_per_band, shingle, max_chars, seed)

    def emit(batches):
        matrix = make_minhash_matrix(*params)  # once per task
        for batch in batches:
            texts = batch.column(text_col).to_pylist()
            idx, keys = matrix(texts)
            rep = pa.array(np.repeat(idx, n_bands))
            cols = [pc.take(batch.column(c), rep) for c in keep]
            cols.append(pa.array(keys.ravel()))
            yield pa.RecordBatch.from_arrays(cols, names=[*keep, "bk"])

    return df.select(*keep, text_col).mapInArrow(emit, out_schema)


def normalize_content(col):
    """Light normalization before shingling (lowercase, collapse ws)."""
    return F.lower(F.regexp_replace(col, r"\s+", " "))


def block_keys(files: DataFrame, *, use_exact: bool = True,
               use_path: bool = True, use_minhash: bool = True,
               n_bands: int = 8, rows_per_band: int = 4,
               shingle: int = 5, max_chars: int = 2000) -> DataFrame:
    """(id, block_key:string) relation — union over key families.

    Round 7: when ``files`` carries ``content_len``, the key rows carry
    it too (+8 B/row).  Downstream this lets candidate_pairs read both
    pair lengths straight off the join sides instead of paying two
    shuffles of the (amplified) pair set to attach them — see
    candidate_pairs(attach_sides=False)."""
    carry = ["content_len"] if "content_len" in files.columns else []
    parts = []
    if use_exact:
        parts.append(files.select(
            "id", F.concat(F.lit("x:"), F.sha2(F.col("content").cast("binary"), 256))
            .alias("block_key"), *carry))
    if use_path:
        stem = F.regexp_extract(F.element_at(F.split(F.col("path"), "/"), -1),
                                r"^([A-Za-z_]+)", 1)
        parts.append(files.select(
            "id", F.concat(F.lit("p:"), F.col("lang"), F.lit("/"),
                           F.lower(stem)).alias("block_key"), *carry))
    if use_minhash:
        # round 7: pre-exploded Arrow rows straight from the kernel's
        # key matrix (see minhash_key_rows) — same keys, no per-doc
        # Python list + JVM explode
        rows = minhash_key_rows(
            files.select("id", *carry,
                         normalize_content(F.col("content"))
                         .alias("__mh_norm")),
            carry=tuple(carry), n_bands=n_bands,
            rows_per_band=rows_per_band, shingle=shingle,
            max_chars=max_chars)
        parts.append(
            rows.select("id", F.concat(F.lit("m:"),
                                       F.col("bk").cast("string"))
                        .alias("block_key"), *carry))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def defuse_skew(blocks: DataFrame, files_len: DataFrame,
                max_block: int = 200, window: int = 20) -> DataFrame:
    """Bound pair blow-up of oversized blocks.

    Blocks with <= max_block members pass through.  Larger blocks are
    sorted by content length (near-dups have near-equal lengths — the
    length-difference prune would reject far-apart pairs anyway) and
    re-keyed into overlapping windows of ``window`` members with 50%
    overlap: pairs per member bounded by ~2*window instead of n.

    ``files_len``: (id, content_len).
    """
    from pyspark.sql import Window
    # window census: ONE shuffle by block_key and a single computation
    # of the (UDF-bearing) blocks input — a groupBy+self-join would scan
    # it twice and pay a second shuffle for the join.  Key rows that
    # already carry content_len (see block_keys) skip the files_len
    # join, so the downstream pair join can read both lengths off its
    # sides.
    #
    # Round 7 (second pass): the old small ∪ w0 ∪ w1 union replicated
    # the census subtree into THREE branches whose analyzer-deduped
    # attribute ids defeated exchange reuse — the executed plan carried
    # three hashpartitioning(block_key) exchanges + sorts + windows,
    # and the event log showed the census jobs running 3x per stage.
    # Both windows share one partitioning (guide §2.4), so they now
    # stack over a SINGLE exchange+sort, and the 1-or-2 output keys per
    # row come from ONE explode instead of a union: identical output
    # rows, one shuffle of the key set instead of three.  At the 1600x
    # smoke tier that is two fewer shuffles+sorts of 148M key rows.
    carry = ["content_len"] if "content_len" in blocks.columns else []
    if not carry:
        blocks = blocks.join(files_len, "id")
    wc = Window.partitionBy("block_key")
    wr = wc.orderBy("content_len", "id")
    half = max(1, window // 2)
    c = (blocks
         .withColumn("_rank", F.row_number().over(wr) - 1)
         .withColumn("_bsize", F.count("*").over(wc)))
    keys = F.when(
        F.col("_bsize") <= max_block,
        F.array(F.col("block_key"))
    ).otherwise(F.array(
        F.concat(F.col("block_key"), F.lit("#w"),
                 (F.col("_rank") / window).cast("long").cast("string")),
        F.concat(F.col("block_key"), F.lit("#v"),
                 ((F.col("_rank") + half) / window).cast("long")
                 .cast("string"))))
    return c.select("id", F.explode(keys).alias("block_key"), *carry)
