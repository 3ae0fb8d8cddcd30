"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``     — brute-force exact top-k: broadcast the query
  set, Catalyst-native zip_with/aggregate dot products, window top-k.
  The baseline and the verifier for the approximate path.
* ``lsh_cosine_topk`` — scale path: random-hyperplane LSH (SimHash for
  vectors, Charikar 2002).  Probe only candidates sharing a band key;
  recall tunable via bands/bits.  At 10^12 rows the brute-force
  crossJoin is O(n·q); LSH bounds the per-query candidate set.
* ``ivf_topk``        — IVF-style: k-means-lite centroid assignment
  (seeded, one pass), probe nprobe nearest cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["cosine_topk", "lsh_cosine_topk", "ivf_topk", "train_centroids"]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _as_double(df, col):
    return df.withColumn(col, F.col(col).cast("array<double>"))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5, *,
                id_col: str = "vec_id", emb_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact brute-force cosine top-k.  ``queries`` is small -> broadcast."""
    c = _as_double(embeddings.select(F.col(id_col).alias("cand_id"),
                                     F.col(emb_col).alias("ce")), "ce")
    q = _as_double(queries.select(F.col(query_id_col).alias("query_id"),
                                  F.col(emb_col).alias("qe")), "qe")
    scored = (F.broadcast(q).crossJoin(c)
              .where(F.col("query_id") != F.col("cand_id"))
              .withColumn("cos", _dot(F.col("qe"), F.col("ce"))
                          / (_norm(F.col("qe")) * _norm(F.col("ce")))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "cos", "rank"))


def _round_half_up_5(x: np.ndarray) -> np.ndarray:
    """Vectorized twin of Spark's ``round(col, 5)`` on doubles
    (BigDecimal.valueOf(d).setScale(5, HALF_UP).doubleValue()): away-
    from-zero at the .000005 grid.  Values whose scaled fraction lands
    within 1e-6 of the grid midpoint are re-rounded through
    decimal.Decimal(repr(x)) — the same shortest-representation +
    HALF_UP semantics as BigDecimal.valueOf — so boundary cases match
    Spark bit-for-bit.  NaN passes through."""
    import decimal
    y = x * 1e5
    fy = np.floor(y)
    with np.errstate(invalid="ignore"):
        r = np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)) / 1e5 + 0.0
        near = np.abs(y - fy - 0.5) < 1e-6
    if near.any():
        q5 = decimal.Decimal("0.00001")
        flat = r.ravel()
        xs = x.ravel()
        for idx in np.flatnonzero(near.ravel()):
            flat[idx] = float(
                decimal.Decimal(repr(float(xs[idx]))).quantize(
                    q5, rounding=decimal.ROUND_HALF_UP))
    return r


def _fold_cos(q: np.ndarray, c: np.ndarray) -> float:
    """Sequential left-fold cosine — the exact float shape of the
    Catalyst ``aggregate(zip_with(..), 0.0, +)`` expression (and the
    pre-round-7 plan): per-element product, left-to-right summation,
    sqrt norms, dot / (norm_q * norm_c)."""
    import math
    dot = 0.0
    nq = 0.0
    nc = 0.0
    for k in range(len(q)):
        dot += float(q[k]) * float(c[k])
        nq += float(q[k]) * float(q[k])
        nc += float(c[k]) * float(c[k])
    return dot / (math.sqrt(nq) * math.sqrt(nc))


def exact_cosine_topk_block(q_ids: np.ndarray, q_mat: np.ndarray,
                            c_ids: np.ndarray, c_mat: np.ndarray,
                            k: int = 5):
    """Per-block exact cosine top-k: one BLAS matmul for all
    (candidate x query) pairs, 5-dp HALF_UP rounding, then per-query
    top-k under (cos DESC, cand_id ASC) with Spark's NaN-largest
    ordering.  Pairs whose BLAS cosine lies within 1e-11 of a rounding
    boundary are recomputed with the sequential fold (exactly the old
    Catalyst expression) before rounding, so the emitted values equal
    the interpreted plan's bit-for-bit.  Returns (query_id, cand_id,
    cos) arrays of the block's top-k rows; the caller's final window
    over the per-block winners reproduces the global top-k."""
    nq = len(q_ids)
    n = len(c_ids)
    if n == 0 or nq == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=np.float64)
    dots = c_mat @ q_mat.T                                   # (n, nq)
    c_norm = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat))
    q_norm = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat))
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = dots / (q_norm[None, :] * c_norm[:, None])
    # near a 5-dp boundary the BLAS sum may round differently from the
    # sequential fold: recompute those pairs with the fold itself
    y = cos * 1e5
    with np.errstate(invalid="ignore"):
        near = np.abs(y - np.floor(y) - 0.5) < 1e-6
    for ci, qi in zip(*np.nonzero(near)):
        cos[ci, qi] = _fold_cos(q_mat[qi], c_mat[ci])
    cos_r = _round_half_up_5(cos)
    # Spark sorts NaN as the LARGEST double: key it below every real cos
    with np.errstate(invalid="ignore"):
        key = np.where(np.isnan(cos_r), -np.inf, -cos_r)
    out_q: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    for j in range(nq):
        # full lexsort (not argpartition): rounded-cos TIES at the k-th
        # slot must break by cand_id ASC exactly as the window does
        order = np.lexsort((c_ids, key[:, j]))
        keep = order[c_ids[order] != q_ids[j]][:k]
        out_q.append(np.full(len(keep), q_ids[j], dtype=np.int64))
        out_c.append(c_ids[keep])
        out_s.append(cos_r[keep, j])
    return (np.concatenate(out_q), np.concatenate(out_c),
            np.concatenate(out_s))


# Integer quantization scales.  Hyperplanes are seeded Gaussians rounded
# to integers (H_SCALE resolution); input vectors are floor-quantized at
# X_SCALE resolution.  Sign(H_int . x_int) is then PURE INTEGER
# arithmetic — bit-exactly reproducible in any SQL engine (the DuckDB
# oracle inlines the same H as literals), unlike a float dot product
# whose sign can flip with reduction order.  Quantization at these
# resolutions leaves the sign-random-projection recall statistically
# unchanged (hyperplane directions move by ~1/1024).  Assumes
# unit-scale embeddings (|x| ~ 1): |dot| <= dim * 4*H_SCALE * X_SCALE
# stays far inside int64 for dim <= 2^20.
LSH_H_SCALE = 1024
LSH_X_SCALE = 1 << 20


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Integer-quantized random hyperplanes (int64, seeded)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((n_bits, dim))
                    * LSH_H_SCALE).astype(np.int64)


def lsh_band_udf(dim: int, n_bands: int = 4, bits_per_band: int = 8,
                 seed: int = 4242):
    """pandas UDF: embedding -> array<long> of band keys (sign-random-
    projection LSH; Charikar 2002 public construction).  Band keys are
    integer-exact (see quantization note above), so the same keys can be
    re-derived in SQL for oracle checking."""
    H = _hyperplanes(dim, n_bands * bits_per_band, seed)

    @pandas_udf("array<long>")
    def _udf(emb: pd.Series) -> pd.Series:
        out = []
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        xq = np.floor(mat * float(LSH_X_SCALE)).astype(np.int64)
        signs = (xq @ H.T) > 0  # (n, bands*bits)
        weights = 1 << np.arange(bits_per_band, dtype=np.int64)
        for row in signs:
            bands = row.reshape(n_bands, bits_per_band)
            keys = (bands * weights).sum(axis=1)
            keys += np.arange(n_bands, dtype=np.int64) << np.int64(32)
            out.append(keys.tolist())
        return pd.Series(out)

    return _udf


def lsh_cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5, *,
                    dim: int, id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    query_id_col: str = "query_id",
                    n_bands: int = 8, bits_per_band: int = 8,
                    seed: int = 4242) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH band."""
    udf = lsh_band_udf(dim, n_bands, bits_per_band, seed)
    c = _as_double(embeddings.select(F.col(id_col).alias("cand_id"),
                                     F.col(emb_col).alias("ce")), "ce")
    q = _as_double(queries.select(F.col(query_id_col).alias("query_id"),
                                  F.col(emb_col).alias("qe")), "qe")
    ck = c.select("cand_id", "ce", F.explode(udf(F.col("ce"))).alias("bkey"))
    qk = q.select("query_id", "qe", F.explode(udf(F.col("qe"))).alias("bkey"))
    cand = (F.broadcast(qk).join(ck, "bkey")
            .where(F.col("query_id") != F.col("cand_id"))
            .dropDuplicates(["query_id", "cand_id"]))
    scored = cand.withColumn("cos", _dot(F.col("qe"), F.col("ce"))
                             / (_norm(F.col("qe")) * _norm(F.col("ce"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "cos", "rank"))


def train_centroids(embeddings: DataFrame, *, n_cells: int = 16,
                    iters: int = 5, sample: int = 2048,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    seed: int = 99) -> np.ndarray:
    """k-means-lite IVF codebook: deterministic bounded sample
    (orderBy id, limit), seeded init from sample rows, a few Lloyd
    iterations driver-side on the normalized sample.  The codebook is a
    MODEL, so training on a bounded sample is the standard IVF recipe —
    the data path (assignment + probe) stays fully distributed."""
    pdf = (embeddings.select(id_col, emb_col).orderBy(id_col)
           .limit(sample).toPandas())
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in pdf[emb_col]])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(mat))
    cents = mat[rng.choice(len(mat), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5, *,
             dim: int, n_cells: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", emb_col: str = "embedding",
             query_id_col: str = "query_id", seed: int = 99,
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest codebook
    centroid (one broadcast pass), probe the ``nprobe`` nearest cells
    per query.  The codebook defaults to a k-means-lite model trained
    on a deterministic sample of ``embeddings`` (``train_centroids``);
    pass ``centroids`` to reuse a precomputed codebook."""
    cents = centroids if centroids is not None else train_centroids(
        embeddings, n_cells=n_cells, id_col=id_col, emb_col=emb_col,
        seed=seed)
    n_cells = len(cents)

    def assign_udf(top: int):
        @pandas_udf("array<int>")
        def _udf(emb: pd.Series) -> pd.Series:
            mat = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
            norm = np.linalg.norm(mat, axis=1, keepdims=True)
            norm[norm == 0] = 1.0
            sims = (mat / norm) @ cents.T
            idx = np.argsort(-sims, axis=1)[:, :top]
            return pd.Series([row.tolist() for row in idx.astype(np.int32)])
        return _udf

    c = _as_double(embeddings.select(F.col(id_col).alias("cand_id"),
                                     F.col(emb_col).alias("ce")), "ce")
    q = _as_double(queries.select(F.col(query_id_col).alias("query_id"),
                                  F.col(emb_col).alias("qe")), "qe")
    ca = c.withColumn("cell", F.element_at(assign_udf(1)(F.col("ce")), 1))
    qa = q.withColumn("cell", F.explode(assign_udf(nprobe)(F.col("qe"))))
    cand = (F.broadcast(qa).join(ca, "cell")
            .where(F.col("query_id") != F.col("cand_id"))
            .dropDuplicates(["query_id", "cand_id"]))
    scored = cand.withColumn("cos", _dot(F.col("qe"), F.col("ce"))
                             / (_norm(F.col("qe")) * _norm(F.col("ce"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "cos", "rank"))
