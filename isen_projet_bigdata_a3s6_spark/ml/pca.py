"""PCA over an embedding (array) column — the feature-reduction step of an
embedding pipeline, in the tree-aggregation shape that scales:

1. One distributed pass computes the moment partials (count, Σx, Σxxᵀ) via
   ``mapInPandas`` — each Arrow batch contributes one (1 + d + d·d) row of
   partial sums, so the driver receives O(batches · d²) numbers, never rows.
2. The d×d covariance eigendecomposition runs on the driver (d is the
   embedding dim — 64 here; trivial at any corpus size, and independent of N).
3. Projection broadcasts the component matrix back and maps each vector —
   Arrow-batched numpy matmul, no shuffle.

Sign convention: each component is flipped so its largest-|entry|
coordinate is positive — eigenvector sign is otherwise arbitrary, and
pinning it makes results reproducible across runs/BLAS builds.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _moment_partials(vec_col: str, d: int):
    def agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        ss = np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            n += V.shape[0]
            s += V.sum(axis=0)
            ss += V.T @ V
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    return agg


def pca_fit(df: DataFrame, vec_col: str, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Fit PCA: returns (mean vector (d,), components (k, d)) — components
    are the top-k covariance eigenvectors, sign-pinned, ordered by
    eigenvalue descending."""
    d = len(df.select(vec_col).first()[0])
    if not 0 < k <= d:
        raise ValueError(f"pca_fit: k must be in [1, {d}]")
    parts = df.select(vec_col).mapInPandas(
        _moment_partials(vec_col, d), "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 vectors")
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_project(
    df: DataFrame, vec_col: str, mean: np.ndarray, comps: np.ndarray,
    out_col: str = "pc",
) -> DataFrame:
    """Project vectors onto the fitted components: out = C·(x − μ).
    Arrow-batched numpy matmul; output column is ``array<double>`` of
    length k."""
    mean_l, comps_l = mean.tolist(), comps.tolist()
    in_cols = df.columns

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mu = np.array(mean_l)
        C = np.array(comps_l)  # (k, d)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            P = (V - mu) @ C.T  # (n, k)
            out = pdf.copy()
            out[out_col] = [row.tolist() for row in P]
            yield out

    fields = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in in_cols)
    return df.mapInPandas(project, f"{fields}, {out_col} array<double>")
