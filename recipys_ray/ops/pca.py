"""Streaming PCA over an embedding column — dimensionality reduction for
embedding compression / visualization / cheap pre-filters ahead of ANN.

Two passes, no shuffle:

1. **Sufficient-statistics pass** — each block quantizes its vectors to
   int64 (``q = rint(x · 2^bits)``) and emits ONE partial row: exact
   integer count, sum vector, and d×d Gram (int64 — safe for blocks up to
   ~2^53 / (q_max²) rows; Ray blocks are far smaller). The driver folds
   partials in PYTHON INTS (arbitrary precision), so the corpus-level
   statistics are exact at any scale and any partitioning. Driver state is
   O(d²), like IterativeImputer's Grams (transformers.py).
2. **Projection pass** — eigendecomposition of the covariance on the
   driver (d×d, deterministic LAPACK), deterministic sign convention
   (each component's max-|loading| element positive, ties → lowest index),
   then a broadcast ``(mean, components)`` stamp projects every batch.

Bit-determinism contract (what the golden oracle relies on): quantization
makes every accumulated statistic an exact integer, covariance entries are
elementwise IEEE ops on exact-int-derived doubles, and the projection
contracts over dimensions in FIXED ascending-j order (never BLAS matmul,
whose summation order can vary with thread count). Identical output bits
for any block layout — verified by partition-invariance tests.

scripts/gen_expected.pca_expected regenerates the golden with an
independent sequential implementation of the same contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _quantize(mat: np.ndarray, bits: int) -> np.ndarray:
    return np.rint(mat.astype(np.float64) * float(1 << bits)).astype(
        np.int64
    )


def _emb_matrix(col, emb_col: str) -> np.ndarray:
    """(n, d) float64 from a fixed-length list<float> column — zero-copy
    flatten+reshape fast path, object fallback for ragged/null inputs."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(arr), -1)
    except Exception:
        mat = np.stack(arr.to_pandas().to_numpy())
    if mat.ndim != 2:
        raise ValueError(
            f"pca: {emb_col!r} must be a fixed-length list<float> column"
        )
    return mat.astype(np.float64)


def _fixed_order_project(
    aq: np.ndarray, mu: np.ndarray, comps: np.ndarray, scale: float
) -> np.ndarray:
    """z = ((aq − mu) @ compsᵀ) / scale with ascending-j accumulation —
    the deterministic contraction both the op and the golden use."""
    n, d = aq.shape
    k = comps.shape[0]
    z = np.zeros((n, k), dtype=np.float64)
    a = aq.astype(np.float64)
    for j in range(d):
        z += (a[:, j] - mu[j])[:, None] * comps[:, j][None, :]
    return z / scale


def _fit_stats(ds, emb_col: str, bits: int):
    """One streaming pass → exact integer (n, S, G) folded in Python ints."""

    def partial(tbl: pa.Table) -> pa.Table:
        mat = _emb_matrix(tbl.column(emb_col), emb_col)
        q = _quantize(mat, bits)
        g = q.T @ q  # int64 exact: per-block n · q_max² << 2^63
        return pa.table({
            "n": pa.array([len(q)], pa.int64()),
            "s": pa.array([q.sum(axis=0).tolist()],
                          pa.list_(pa.int64())),
            "g": pa.array([g.ravel().tolist()], pa.list_(pa.int64())),
        })

    parts = (
        ds.select_columns([emb_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    n = sum(int(v) for v in parts["n"])
    s_lists = [list(map(int, v)) for v in parts["s"]]
    g_lists = [list(map(int, v)) for v in parts["g"]]
    d = len(s_lists[0])
    S = [sum(col) for col in zip(*s_lists)]  # python ints — exact fold
    G = [sum(col) for col in zip(*g_lists)]
    return n, d, S, G


def fit_pca(ds, emb_col: str = "embedding", k: int = 4, bits: int = 16):
    """Fit: returns (mean_q, components, eigenvalues) in quantized units.
    ``components`` is (k, d), rows orthonormal, sign-fixed."""
    n, d, S, G = _fit_stats(ds, emb_col, bits)
    if n < 2:
        raise ValueError(f"pca: need at least 2 vectors, got {n}")
    if k > d:
        raise ValueError(f"pca: k={k} exceeds embedding dim {d}")
    nf = float(n)
    mu = np.array([float(si) / nf for si in S], dtype=np.float64)
    Gf = np.array([float(gi) for gi in G], dtype=np.float64).reshape(d, d)
    Sf = np.array([float(si) for si in S], dtype=np.float64)
    cov = (Gf - np.outer(Sf, Sf) / nf) / (nf - 1.0)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comps = evecs[:, ::-1][:, :k].T.copy()  # (k, d), descending eigenvalue
    top_evals = evals[::-1][:k].copy()
    # deterministic sign: max-|loading| element positive, ties lowest index
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, top_evals


def pca_project(
    ds,
    emb_col: str = "embedding",
    k: int = 4,
    bits: int = 16,
    out_prefix: str = "pc",
):
    """Project every vector onto the top-k principal components (module
    docstring). Output: the input's non-embedding columns + pc0..pc{k-1}
    (float64, bit-deterministic for any partitioning)."""
    import ray

    from recipys_ray.kernels.grouped import _lazy_size_bytes

    # two passes over ds (fit stats, projection): pin DERIVED inputs once
    # so the upstream pipeline doesn't re-execute per pass; pure reads
    # re-read pruned parquet (the standard multi-pass policy —
    # ROUND5_NOTES.md, kernels/salted.run_salted_chain)
    if _lazy_size_bytes(ds) is None:
        ds = ds.materialize()

    mu, comps, _ = fit_pca(ds, emb_col, k=k, bits=bits)
    state_ref = ray.put((mu, comps))
    scale = float(1 << bits)

    def stamp(tbl: pa.Table) -> pa.Table:
        smu, scomps = ray.get(state_ref)
        mat = _emb_matrix(tbl.column(emb_col), emb_col)
        q = _quantize(mat, bits)
        z = _fixed_order_project(q, smu, scomps, scale)
        out = tbl.drop_columns([emb_col])
        for i in range(z.shape[1]):
            out = out.append_column(
                f"{out_prefix}{i}", pa.array(z[:, i], pa.float64())
            )
        return out

    return ds.map_batches(stamp, batch_format="pyarrow")
