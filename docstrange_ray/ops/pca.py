"""Distributed PCA over an embedding column (scatter-matrix recipe).

Scale shape: ONE shuffle-free scan emits per-block moment partials —
``(n, sum_x (d,), sum_xxT (d,d))`` packed as float64 bytes in a
single row — which a coalesced combine reduces to one O(d^2) row
(d=64 -> 4 KB + 32 KB, corpus-independent).  The driver finishes with
a LAPACK ``eigh`` on the d x d covariance (microseconds) and
broadcasts ``(mean, components)`` once via ``ray.put`` for a second
shuffle-free projection scan.  No corpus-scale state ever reaches the
driver and nothing is re-shipped per batch, so the plan is unchanged
at 100 TB: two streaming scans + a constant-size reduce.

This is the whitening/dimension-reduction step SemDeDup-style
pipelines run before cosine dedup (Abbas et al. 2023 use pre-reduced
embeddings; the classic scatter-matrix PCA is public-domain linear
algebra).  The reference engine has no linear-algebra ops — this
module belongs to the training-data op family the brief adds on top.

Determinism: moments are float64 sums (block order varies, so emitted
sums are round6'd at the oracle boundary only — see
``second_moment_table``); the eigendecomposition itself is driver-side
LAPACK on one fixed matrix, made sign-deterministic by flipping each
eigenvector so its largest-|coordinate| entry is positive
(``argmax(|v|)`` breaks magnitude ties by lowest index).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import round6
from docstrange_ray.shuffle import arrow_out, coalesced_blocks


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])


def embedding_moments(ds, col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum_x, sum_xxT) over the corpus in ONE scan.

    Per-block partial = one row carrying the packed float64 moment
    blobs; the coalesced combine unpacks + sums them (block count,
    not corpus size, bounds the reduce input).
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        mat = _as_matrix(batch.column(col))
        s = mat.sum(axis=0)
        ss = mat.T @ mat
        return pd.DataFrame(
            [{"n": np.int64(mat.shape[0]), "d": np.int64(mat.shape[1]),
              "s": s.tobytes(), "ss": ss.tobytes()}]
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        d = int(df["d"].iloc[0])
        s = np.zeros(d, dtype=np.float64)
        ss = np.zeros((d, d), dtype=np.float64)
        for sb, ssb in zip(df["s"], df["ss"]):
            s += np.frombuffer(sb, dtype=np.float64)
            ss += np.frombuffer(ssb, dtype=np.float64).reshape(d, d)
        return pd.DataFrame(
            [{"n": np.int64(df["n"].sum()), "d": np.int64(d),
              "s": s.tobytes(), "ss": ss.tobytes()}]
        )

    row = coalesced_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow"), combine
    ).take_all()[0]
    d = int(row["d"])
    return (
        int(row["n"]),
        np.frombuffer(row["s"], dtype=np.float64).copy(),
        np.frombuffer(row["ss"], dtype=np.float64).reshape(d, d).copy(),
    )


def pca_fit(ds, n_components: int = 8, col: str = "embedding"):
    """Fit PCA: returns ``(mean (d,), components (k, d), explained_var (k,))``.

    Covariance = ss/n - mu muT (population).  Eigenvectors are sorted
    by eigenvalue descending (ties: ascending original LAPACK index via
    stable argsort) and sign-normalized so each component's
    largest-|coordinate| entry is positive.
    """
    n, s, ss = embedding_moments(ds, col)
    if n == 0:
        raise ValueError("pca_fit over an empty dataset")
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(-w, kind="stable")
    k = min(n_components, len(w))
    comps = v[:, order[:k]].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, np.maximum(w[order[:k]], 0.0)


def pca_project(ds, mean: np.ndarray, components: np.ndarray,
                id_col: str = "vec_id", col: str = "embedding"):
    """Shuffle-free projection scan: broadcast ``(mean, components)``
    once (``ray.put``), emit ``(vec_id, p0..p{k-1})`` round6'd.  Wide
    columns (not a list) keep the output SQL-comparable and
    column-prunable downstream."""
    import ray

    ref = ray.put((np.asarray(mean, dtype=np.float64),
                   np.asarray(components, dtype=np.float64)))
    k = int(np.asarray(components).shape[0])

    def project(batch: pa.Table) -> pa.Table:
        mu, comps = ray.get(ref)
        mat = _as_matrix(batch.column(col)) - mu
        proj = round6(mat @ comps.T)
        arrays = [batch.column(id_col)]
        names = [id_col]
        for i in range(k):
            arrays.append(pa.array(proj[:, i], type=pa.float64()))
            names.append(f"p{i}")
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(project, batch_format="pyarrow")


def second_moment_table(ds, col: str = "embedding", id_col: str = "vec_id"):
    """Oracle-facing view of the distributed moment reduce: one row per
    (i, j) dimension pair with the RAW moment sums ``sxx = sum_r x_i x_j``
    plus the first moments ``si``/``sj``, all round6'd.  This is the
    exact exchange ``pca_fit`` consumes, re-buildable in SQL by
    unnesting the embedding lists — the eigendecomposition downstream
    is driver-side LAPACK on a d x d matrix and is pinned by pytest
    against a whole-matrix numpy reference instead."""
    n, s, ss = embedding_moments(ds, col)
    d = len(s)
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    return pd.DataFrame(
        {
            "i": ii.ravel().astype(np.int64),
            "j": jj.ravel().astype(np.int64),
            "sxx": round6(ss.ravel()),
            "si": round6(np.repeat(s, d)),
            "sj": round6(np.tile(s, d)),
        }
    )


def pca_variance_table(ds, n_components: int = 8, col: str = "embedding"):
    """(component, explained_var, var_ratio) for the top-k components —
    the scree curve.  ONE moment scan (shared with the fit); ratio
    denominator = trace(cov) = sum of ALL eigenvalues, not just the
    kept top-k.  Floats from LAPACK (not SQL-expressible); pinned by
    pytest vs a whole-matrix ``np.cov`` + ``eigh`` reference."""
    n, s, ss = embedding_moments(ds, col)
    if n == 0:
        raise ValueError("pca_variance_table over an empty dataset")
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    ev = np.maximum(w[: min(n_components, len(w))], 0.0)
    trace = float(np.trace(cov))
    total = trace if trace > 0 else 1.0
    return pd.DataFrame(
        {
            "component": np.arange(len(ev), dtype=np.int64),
            "explained_var": round6(ev),
            "var_ratio": round6(ev / total),
        }
    )
