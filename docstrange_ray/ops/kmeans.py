"""Distributed k-means (Lloyd 1982) with EXACT integer arithmetic —
the embedding-clustering primitive (SemDeDup-style corpus partitioning,
IVF coarse quantizers) made plan-independent and SQL-oracle-checkable.

Float k-means is not oracle-comparable (reduction-order-dependent float
centroid sums); this op quantizes each coordinate ONCE to integer units
(``round_half_away(x * q)``) and runs every subsequent step in int64:

  - seeds: the k rows with the lowest ``(md5_key52(id), id)`` — the
    house deterministic-shuffle key, so seeding is a pure function of
    ids (cluster-size/arrival-order independent) and SQL-mirrorable;
    centroid INDEX = seed rank in that order;
  - assignment: argmin over centroids of the exact integer squared L2
    distance, ties broken by lowest centroid index;
  - update: per-cluster per-coordinate TRUNCATED division (toward
    zero) of the int64 coordinate sum by the cluster count — pinned to
    DuckDB's ``//`` semantics (which truncates; Python's ``//``
    floors, so the engine uses sign(s) * (|s| // n));
  - empty cluster: keeps its previous centroid.

After ``iterations`` assign/update rounds, one final assignment pass
emits (id, cluster, d2). Every value is an exact integer, so the
distributed plan, a sequential reference, and an unrolled-CTE DuckDB
oracle agree bit-for-bit at any parallelism.

Scale shape: the centroid table is k x dim ints — ray.put-broadcast
each round (the canonical Lloyd distribution; centroids are KBs while
points are TBs). Each batch emits ONE partial row per non-empty
cluster (count + coordinate sums), coalesced on the driver: per round
the driver holds k x (dim + 1) ints, never points. The quantized
point table is materialized once and re-scanned per round (columnar,
no shuffle — Lloyd needs no point exchange at all). int64 bound:
|x| * q < ~3e18 / sqrt(dim * n_per_batch) for the d2 partials —
comfortable for unit-norm embeddings at q = 1e6.

Reference basis: Lloyd 1982; SemDeDup (Abbas et al. 2023) uses exactly
this k-means-over-embeddings shape for corpus dedup. Reference repo
analogue: none (docstrange has no clustering); cited per SURVEY §2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import md5_key52

Q_DEFAULT = 10**6


def _trunc_div(s: np.ndarray, n: int) -> np.ndarray:
    """Integer division truncating toward zero (DuckDB ``//``)."""
    s = s.astype(np.int64)
    return np.sign(s) * (np.abs(s) // np.int64(n))


def quantize_vec(x: np.ndarray, q: int = Q_DEFAULT) -> np.ndarray:
    """round_half_away(x * q) as int64, elementwise (works on 2-D)."""
    xs = x.astype(np.float64) * float(q)
    return (np.sign(xs) * np.floor(np.abs(xs) + 0.5)).astype(np.int64)


def kmeans_quantized(
    ds,
    k: int = 8,
    iterations: int = 2,
    q: int = Q_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions=None,
):
    """Exact-integer Lloyd k-means over ``Dataset[(id, list<float>)]``.

    Returns Dataset[(``id_col``, cluster, d2)] — the final assignment
    under the ``iterations``-times-updated centroids, d2 the exact
    integer squared distance in q-units. See module docstring for the
    determinism contract.
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    _empty_q = pd.DataFrame(
        {"id": pd.Series([], dtype=np.int64),
         "mk": pd.Series([], dtype=np.int64),
         "qv": pd.Series([], dtype=object),
         "dim": pd.Series([], dtype=np.int64)}
    )

    def quant(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return _empty_q
        mat = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        qv = quantize_vec(mat, q)
        return pd.DataFrame(
            {
                "id": ids,
                "mk": np.array([md5_key52(i) for i in ids], dtype=np.int64),
                "qv": [row.tobytes() for row in qv],
                "dim": np.full(len(ids), qv.shape[1] if qv.ndim == 2 else 0,
                               dtype=np.int64),
            }
        )

    pts = ds.map_batches(arrow_out(quant), batch_format="pyarrow").materialize()

    # ---- seeds: k lowest (md5_key52(id), id) — bounded per-block top-k
    def seed_local(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.sort_values(["mk", "id"]).head(k)

    def seed_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["mk", "id"]).head(k)

    seed_rows = coalesced_blocks(
        pts.map_batches(arrow_out(seed_local), batch_format="pyarrow"),
        seed_final,
    ).take_all()
    if not seed_rows:
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64()),
                 "d2": pa.array([], pa.int64())}
            )
        )
    dim = int(seed_rows[0]["dim"])
    cents = np.stack(
        [np.frombuffer(r["qv"], dtype=np.int64) for r in seed_rows]
    )  # (k_eff, dim); k_eff < k iff fewer points than k
    k_eff = cents.shape[0]

    def assign_mat(qmat: np.ndarray, C: np.ndarray) -> tuple:
        # exact int64 d2: (n, k) via (x-c)^2 sum — argmin ties -> lowest index
        diff = qmat[:, None, :] - C[None, :, :]
        d2 = np.einsum("nkd,nkd->nk", diff, diff)
        a = np.argmin(d2, axis=1)
        return a, d2[np.arange(len(a)), a]

    for _ in range(iterations):
        c_ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=c_ref) -> pd.DataFrame:
            C = ray.get(_ref)
            df = batch.to_pandas()
            if df.empty:
                return pd.DataFrame(
                    {"cluster": pd.Series([], dtype=np.int64),
                     "n": pd.Series([], dtype=np.int64),
                     "sums": pd.Series([], dtype=object)}
                )
            qmat = np.stack(
                [np.frombuffer(b, dtype=np.int64) for b in df["qv"]]
            )
            a, _ = assign_mat(qmat, C)
            out_c, out_n, out_s = [], [], []
            for c in np.unique(a):
                sel = qmat[a == c]
                out_c.append(int(c))
                out_n.append(len(sel))
                out_s.append(sel.sum(axis=0, dtype=np.int64).tobytes())
            return pd.DataFrame(
                {"cluster": pd.Series(out_c, dtype=np.int64),
                 "n": pd.Series(out_n, dtype=np.int64),
                 "sums": out_s}
            )

        def combine(df: pd.DataFrame, _C=cents) -> pd.DataFrame:
            newC = _C.copy()
            for c, grp in df.groupby("cluster"):
                n = int(grp["n"].sum())
                if n == 0:
                    continue
                s = np.sum(
                    [np.frombuffer(b, dtype=np.int64) for b in grp["sums"]],
                    axis=0, dtype=np.int64,
                )
                newC[int(c)] = _trunc_div(s, n)
            return pd.DataFrame(
                {"cluster": np.arange(len(newC), dtype=np.int64),
                 "qv": [row.tobytes() for row in newC]}
            )

        rows = coalesced_blocks(
            pts.map_batches(arrow_out(partial), batch_format="pyarrow"),
            combine,
        ).take_all()
        cents = np.stack(
            [np.frombuffer(r["qv"], dtype=np.int64)
             for r in sorted(rows, key=lambda r_: int(r_["cluster"]))]
        )

    c_ref = ray.put(cents)

    def final_assign(batch: pa.Table, _ref=c_ref) -> pd.DataFrame:
        C = ray.get(_ref)
        df = batch.to_pandas()
        if df.empty:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "cluster": pd.Series([], dtype=np.int64),
                 "d2": pd.Series([], dtype=np.int64)}
            )
        qmat = np.stack([np.frombuffer(b, dtype=np.int64) for b in df["qv"]])
        a, d2 = assign_mat(qmat, C)
        return pd.DataFrame(
            {id_col: df["id"].to_numpy(np.int64),
             "cluster": a.astype(np.int64),
             "d2": d2.astype(np.int64)}
        )

    return pts.map_batches(arrow_out(final_assign), batch_format="pyarrow")
