"""Arrow-vectorized numpy kernels for embedding math.

Why Pandas UDFs here and nowhere else: 64-dim dot products / norms are
dense numeric loops. Catalyst's higher-order functions (``aggregate``,
``zip_with``, ``transform``) are CodegenFallback — every lambda step is an
interpreted expression eval, and captured subexpressions re-evaluate per
element (measured: a 64-wide normalize via ``transform`` costs 64 norm
recomputes per row). Unrolling into explicit 64-term column sums fixes the
re-evaluation but produces kilobyte-scale generated methods that exceed
HotSpot's JIT bytecode limit and run in the bytecode interpreter (measured
slower than the HOF form). An Arrow-batched numpy kernel is the remaining
fast path: one JVM→Python transfer per batch, SIMD inner loops.

Determinism contract: kernels that feed DuckDB-oracle-checked values
accumulate **sequentially over dimensions, vectorized over rows** —
``acc += a[:, i] * b[:, i]`` — which reproduces the left-to-right fold
order of both the previous Catalyst implementation and DuckDB's
``list_cosine_similarity``/``list_dot_product`` loops, so results are
bit-identical and survive the value-hash compare (see tools/check.py).
A plain ``m @ v`` BLAS matmul uses pairwise/blocked summation and would
drift in the last ulp — only use it where results are rank-checked, not
value-checked (LSH sketch signs, IVF cell argmin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType


def _mat(s: pd.Series) -> np.ndarray:
    """Arrow array<double> series → (n, dim) float64 matrix."""
    return np.vstack(s.to_numpy()).astype(np.float64, copy=False)


def _seq_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot, sequential over dims (bit-identical to a fold)."""
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for i in range(a.shape[1]):
        acc += a[:, i] * b[:, i]
    return acc


def duck_round6(x: np.ndarray) -> np.ndarray:
    """Mirror of DuckDB ``round(x, 6)`` on doubles: round-half-away-from-
    zero applied to the BINARY value (std::round(x*1e6)/1e6) — NOT
    np.round (banker's) and NOT Python round (shortest-decimal). Used
    wherever a driver-side float (k-means centroid mean) must be
    bit-replayable by a DuckDB oracle.

    std::round(y) is the nearest integer of the double y with ties away
    from zero, computed EXACTLY — the naive floor(|y| + 0.5) emulation
    diverges when |y| + 0.5 rounds UP to an integer in FP (|y| one ulp
    under n + 0.5 → floor sees exactly n + 0.5 and claims n + 1, r5
    advisory). Comparing the fractional part avoids the addition
    entirely: both floor(|y|) and |y| - floor(|y|) are exact for
    |y| < 2^52, the magnitude where doubles still have sub-integer
    resolution (beyond it y is already an integer and frac = 0)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.abs(x) * 1e6
    fl = np.floor(y)
    r = fl + (y - fl >= 0.5)
    return np.sign(x) * r / 1e6


def seq_cross_dot(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) × (k, dim) → (n, k) dots, accumulated sequentially over
    dims (vectorized over rows AND planes) — bit-identical to DuckDB's
    list_dot_product fold for every (row, plane) pair, unlike a BLAS
    matmul's pairwise summation. Verified bit-exact against DuckDB on
    the fixture corpus (see similarity.py oracle notes)."""
    acc = np.zeros((m.shape[0], planes.shape[0]), dtype=np.float64)
    for i in range(m.shape[1]):
        acc += m[:, i:i + 1] * planes[None, :, i]
    return acc


def seq_sq_norms(planes: np.ndarray) -> np.ndarray:
    """Per-row ||p||² with dim-order accumulation (fold-identical)."""
    acc = np.zeros(planes.shape[0], dtype=np.float64)
    for i in range(planes.shape[1]):
        acc = acc + planes[:, i] * planes[:, i]
    return acc


@F.pandas_udf(ArrayType(DoubleType()))
def l2_normalize(emb: pd.Series) -> pd.Series:
    """x / ||x||₂ with the norm accumulated in dim order."""
    m = _mat(emb)
    norm = np.sqrt(_seq_dot(m, m))
    out = m / norm[:, None]
    return pd.Series(list(out))


@F.pandas_udf(DoubleType())
def cos_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Dot of two pre-normalized vectors (= cosine), dim-order sum."""
    return pd.Series(_seq_dot(_mat(a), _mat(b)))


def minhash_sig_udf(n_perm: int, prime: int):
    """Pandas UDF: array<bigint> base hashes → array<bigint> MinHash
    signature under the affine family h_i = ((2i+1)·h + 40503i+1231) mod p.

    All arithmetic is int64 ((2i+1)·h < 2^38 for h < p = 2^31-1), so the
    values are exactly those of the equivalent Catalyst fold — the LSH
    band buckets built from them are identical. Rows are flattened into
    one vector per batch and reduced with np.minimum.reduceat, so the
    per-permutation min is vectorized across every shingle of every doc.
    """

    from pyspark.sql.types import LongType

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(base: pd.Series) -> pd.Series:
        lens = base.map(len).to_numpy(dtype=np.int64)
        n = len(lens)
        out = np.full((n, n_perm), prime, dtype=np.int64)  # empty doc → p (matches fold over empty = array_min([]) null; no empty docs in fixtures)
        nonempty = lens > 0
        if nonempty.any():
            flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in base[nonempty]])
            offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=offsets[1:])
            mins = np.empty((int(nonempty.sum()), n_perm), dtype=np.int64)
            for i in range(n_perm):
                vals = ((2 * i + 1) * flat + i * 40503 + 1231) % prime
                mins[:, i] = np.minimum.reduceat(vals, offsets)
            out[nonempty] = mins
        return pd.Series(list(out))

    return _sig


def lsh_sketch_udf(planes: np.ndarray, n_tables: int, n_planes: int,
                   seq: bool = False):
    """Pandas UDF: embedding → array<int> of per-table sign-bit sketches.

    ``planes`` is (n_tables * n_planes, dim); row t*n_planes+p is plane p
    of table t. With ``seq=False`` signs come from a BLAS matmul —
    rank/sign decisions only, pairwise summation drift acceptable (the
    dedup_embedding path, whose oracle is all-pairs ground truth). With
    ``seq=True`` each plane dot accumulates sequentially over dims, so
    every sign decision is bit-identical to DuckDB's list_dot_product
    fold and the resulting BUCKETS are SQL-replayable — the ann_lsh_topk
    path, whose oracle rebuilds the same buckets from the same
    md5-derived planes.
    """

    @F.pandas_udf(ArrayType(IntegerType()))
    def _sketch(emb: pd.Series) -> pd.Series:
        m = _mat(emb)
        dots = seq_cross_dot(m, planes) if seq else m @ planes.T
        bits = (dots >= 0).astype(np.int32)  # (n, T*P)
        weights = 1 << np.arange(n_planes, dtype=np.int32)
        sk = bits.reshape(len(m), n_tables, n_planes) @ weights  # (n, T)
        return pd.Series(list(sk.astype(np.int32)))

    return _sketch


def ivf_assign_udf(centroids: np.ndarray):
    """Pandas UDF: embedding → nearest-centroid cell id (argmin L2,
    ties → lowest cid via argmin first-hit).

    Distances use dim-order sequential accumulation (seq_cross_dot /
    seq_sq_norms), bit-identical to the DuckDB fold
    ``-2*list_dot_product(x,c) + list_dot_product(c,c)`` — so the cell
    assignment is SQL-replayable and ann_ivf_topk / ann_ivf_pruned /
    cluster_kmeans carry full value oracles. ||x||² is dropped: constant
    per row, argmin-invariant in both engines."""

    @F.pandas_udf(IntegerType())
    def _assign(emb: pd.Series) -> pd.Series:
        m = _mat(emb)
        d = -2.0 * seq_cross_dot(m, centroids) + seq_sq_norms(centroids)[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return _assign


def ivf_probe_udf(centroids: np.ndarray, n_probes: int):
    """Pandas UDF: embedding → array<int> of the n_probes nearest cells
    (stable argsort: distance ties keep ascending cid — matches the
    oracle's ORDER BY dist, cid). Same sequential-dim distance as
    ivf_assign_udf, so the probed cell set is SQL-replayable."""

    @F.pandas_udf(ArrayType(IntegerType()))
    def _probe(emb: pd.Series) -> pd.Series:
        m = _mat(emb)
        d = -2.0 * seq_cross_dot(m, centroids) + seq_sq_norms(centroids)[None, :]
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probes]
        return pd.Series(list(order.astype(np.int32)))

    return _probe


def pq_encode_udf(codebooks: np.ndarray):
    """Pandas UDF: embedding → array<int> of M sub-codebook codes.

    ``codebooks`` is (M, K, dsub): vector x is split into M contiguous
    dsub-dim subvectors; code m = argmin_k ||x_m - codebooks[m, k]||².
    Distances use sequential-dim accumulation (r5) so every code is
    bit-identical to the oracle's ``-2*list_dot_product(x_m, cb) +
    list_dot_product(cb, cb)`` fold; argmin ties break to the lowest
    code in both engines."""

    n_sub, _, dsub = codebooks.shape

    @F.pandas_udf(ArrayType(IntegerType()))
    def _encode(emb: pd.Series) -> pd.Series:
        m = _mat(emb)
        codes = np.empty((len(m), n_sub), dtype=np.int32)
        for s in range(n_sub):
            xs = m[:, s * dsub:(s + 1) * dsub]
            cb = codebooks[s]
            d = -2.0 * seq_cross_dot(xs, cb) + seq_sq_norms(cb)[None, :]
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return _encode


def pq_adc_score_udf(codebooks: np.ndarray):
    """Pandas UDF: (query embedding, corpus codes) → approximate inner
    product via asymmetric distance computation: score ≈ Σ_m
    LUT_q[m, code_m], LUT_q[m, k] = q_m · codebooks[m, k].

    Queries repeat across the corpus rows of a batch, so the per-query
    lookup table is computed once per distinct query in the batch (keyed
    by the raw vector bytes) and applied with one fancy-index gather.
    The LUT dots and the across-subspace accumulation run in sequential
    (dim, then subspace) order (r5), matching the oracle's
    Σ_m list_dot_product(q_m, cb[m, code_m]); the consumers round the
    score to 6 decimals before ranking, which also absorbs DuckDB's
    unordered 8-term SUM."""

    n_sub, _, dsub = codebooks.shape

    @F.pandas_udf(DoubleType())
    def _score(qe: pd.Series, codes: pd.Series) -> pd.Series:
        code_mat = np.vstack(codes.to_numpy()).astype(np.int64, copy=False)
        out = np.empty(len(code_mat), dtype=np.float64)
        # Group rows per distinct query with a plain dict keyed by Python
        # bytes: a fixed-width numpy 'S' array strips trailing NUL bytes,
        # so a vector whose last components encode to zero bytes would get
        # a truncated key (short np.frombuffer / distinct queries merged).
        groups: dict[bytes, list[int]] = {}
        for i, v in enumerate(qe.to_numpy()):
            groups.setdefault(np.asarray(v, dtype=np.float64).tobytes(), []).append(i)
        for key, idxs in groups.items():
            q = np.frombuffer(key, dtype=np.float64)
            lut = np.empty((n_sub, codebooks.shape[1]), dtype=np.float64)
            for s in range(n_sub):
                lut[s] = seq_cross_dot(
                    codebooks[s], q[s * dsub:(s + 1) * dsub][None, :]
                )[:, 0]
            rows = np.asarray(idxs)
            acc = np.zeros(len(rows), dtype=np.float64)
            for s in range(n_sub):
                acc += lut[s, code_mat[rows, s]]
            out[rows] = acc
        return pd.Series(out)

    return _score
