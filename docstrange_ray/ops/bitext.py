"""Margin-based embedding pair mining (the bitext-mining shape).

Re-expresses the margin-criterion mining recipe — Artetxe & Schwenk
2019 ("Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings", the ratio margin) as productionized at web scale by
CCMatrix (Schwenk et al. 2021) — as Ray Data plans over an embedding
column.  The corpus is split into two sides (think: two languages, or
two snapshots); for each source-side vector the miner scores its
nearest target-side candidates by

    margin(x, y) = cos(x, y) / ((mx + my) / 2)

where ``mx`` is the mean cosine of x's k nearest target-side
neighbours and ``my`` the mean cosine of y's k nearest source-side
neighbours (the ratio margin normalizes away hubness: a candidate only
wins if it is close to x *relative to* how close everything else is to
both endpoints).  Forward mining emits, per source vector, the
argmax-margin candidate above a threshold.

Two physical plans behind the embedding-op auto gate
(:func:`docstrange_ray.ops.dedup.resolve_embedding_plan`):

* ``'broadcast'`` — exact per the paper's contract (candidates = full
  top-k by cosine on each side): normalize + ``ray.put`` both side
  matrices once, stream the corpus twice (source pass emits k candidate
  edges + mx; target pass emits my), co-partition join on tgt_id, ONE
  grouped argmax exchange.  Only sane under the brute row limit.
* ``'bucketed'`` — the 10^12-row path: IVF coarse quantization with
  multi-probe row explosion (:func:`docstrange_ray.ops.ann.ivf_assign_multi`),
  ONE bucket shuffle producing cross-side candidate edges, then
  per-node top-k means are computed over the *found* edges (the
  standard ANN approximation of full kNN — exactly what CCMatrix does
  with sharded faiss).  Recall pinned against the exact plan; never
  materializes anything corpus-scale on the driver (centroid training
  samples a bounded prefix).

The reference engine (smoab/docstrange) has no cross-corpus mining at
all — this module is part of the training-data op family the brief
adds on top of reference parity.

Emit discipline: cosines are rounded half-away to 6dp *before* top-k
selection and mean computation, and the margin is a pure function of
6dp operands — so the SQL oracle (`margin_mined_pairs`) reproduces the
exact floats and the driver's value-hash matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import round6
from docstrange_ray.shuffle import grouped_blocks, hash_join

__all__ = [
    "margin_pairs",
    "margin_pairs_broadcast",
    "margin_pairs_bucketed",
]

_CAND_SCHEMA = pa.schema(
    [
        ("src_id", pa.int64()),
        ("tgt_id", pa.int64()),
        ("cos", pa.float64()),
        ("mx", pa.float64()),
    ]
)
_MEAN_SCHEMA = pa.schema([("tgt_id", pa.int64()), ("my", pa.float64())])
_OUT_COLS = ["src_id", "tgt_id", "cos", "margin"]


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _as_matrix(col) -> np.ndarray:
    vs = col.to_pylist() if hasattr(col, "to_pylist") else list(col)
    return np.stack([np.asarray(v, dtype=np.float64) for v in vs])


def _topk_order(cos6: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (cos6 DESC, id ASC) — the deterministic
    candidate order mirrored by the oracle's ROW_NUMBER."""
    order = np.lexsort((ids, -cos6))
    return order[:k]


def _empty_out() -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.float64()),
            pa.array([], type=pa.float64()),
        ],
        names=_OUT_COLS,
    )


def _mine_tail(cand, ymeans, threshold: float, num_partitions=None):
    """Shared tail of both plans: join candidate edges with per-target
    means on tgt_id (co-partition — both sides can be corpus-scale),
    then ONE grouped exchange on src_id for the deterministic
    argmax-margin pick.  margin = cos6 / ((mx6 + my6)/2), all operands
    already 6dp, re-rounded at emit."""
    joined = hash_join(cand, ymeans, key="tgt_id", num_partitions=num_partitions)

    def best(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in
                 zip(_OUT_COLS, [np.int64, np.int64, np.float64, np.float64])}
            )
        margin = round6(df["cos"].to_numpy() / ((df["mx"].to_numpy() + df["my"].to_numpy()) / 2.0))
        df = df.assign(margin=margin)
        df = df.sort_values(
            ["src_id", "margin", "cos", "tgt_id"],
            ascending=[True, False, False, True],
            kind="mergesort",
        )
        out = df.groupby("src_id", as_index=False).head(1)
        out = out[out["margin"] >= threshold]
        return out[_OUT_COLS].astype(
            {"src_id": np.int64, "tgt_id": np.int64, "cos": np.float64, "margin": np.float64}
        )

    return grouped_blocks(joined, ["src_id"], best, num_partitions, batch_format="pandas")


def margin_pairs_broadcast(
    ds,
    k: int = 4,
    threshold: float = 1.0,
    side_col: str = "label",
    num_partitions=None,
):
    """Exact plan: candidates are the TRUE top-k by cosine on each side
    (full kNN, as in the paper).  Both normalized side matrices are
    broadcast once (``ray.put``); the corpus streams through two
    map_batches passes (no all-pairs materialization — per-batch matmul
    rows are reduced to k candidate rows / 1 mean row immediately)."""
    import ray

    rows = ds.select_columns(["vec_id", "embedding", side_col]).take_all()  # gated by caller
    if not rows:
        import ray.data

        return ray.data.from_arrow(_empty_out())
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    side = np.array([int(r[side_col]) % 2 for r in rows], dtype=np.int64)
    mat = _normalize(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows]))
    x_ids, x_mat = ids[side == 0], mat[side == 0]
    y_ids, y_mat = ids[side == 1], mat[side == 1]
    if len(x_ids) == 0 or len(y_ids) == 0:
        import ray.data

        return ray.data.from_arrow(_empty_out())
    ref = ray.put((x_ids, x_mat, y_ids, y_mat))

    def src_pass(batch: pa.Table) -> pa.Table:
        xi, xm, yi, ym = ray.get(ref)
        keep = np.asarray(batch.column(side_col)).astype(np.int64) % 2 == 0
        if not keep.any():
            return _CAND_SCHEMA.empty_table()
        bids = np.asarray(batch.column("vec_id"), dtype=np.int64)[keep]
        bmat = _normalize(_as_matrix(batch.column("embedding"))[keep])
        cos6 = round6(bmat @ ym.T)
        srcs, tgts, coss, mxs = [], [], [], []
        for i in range(len(bids)):
            sel = _topk_order(cos6[i], yi, k)
            mx = float(round6(cos6[i][sel].mean()))
            srcs.extend([int(bids[i])] * len(sel))
            tgts.extend(int(yi[j]) for j in sel)
            coss.extend(float(c) for c in cos6[i][sel])
            mxs.extend([mx] * len(sel))
        return pa.Table.from_arrays(
            [
                pa.array(srcs, type=pa.int64()),
                pa.array(tgts, type=pa.int64()),
                pa.array(coss, type=pa.float64()),
                pa.array(mxs, type=pa.float64()),
            ],
            schema=_CAND_SCHEMA,
        )

    def tgt_pass(batch: pa.Table) -> pa.Table:
        xi, xm, yi, ym = ray.get(ref)
        keep = np.asarray(batch.column(side_col)).astype(np.int64) % 2 == 1
        if not keep.any():
            return _MEAN_SCHEMA.empty_table()
        bids = np.asarray(batch.column("vec_id"), dtype=np.int64)[keep]
        bmat = _normalize(_as_matrix(batch.column("embedding"))[keep])
        cos6 = round6(bmat @ xm.T)
        tgts, mys = [], []
        for i in range(len(bids)):
            sel = _topk_order(cos6[i], xi, k)
            tgts.append(int(bids[i]))
            mys.append(float(round6(cos6[i][sel].mean())))
        return pa.Table.from_arrays(
            [pa.array(tgts, type=pa.int64()), pa.array(mys, type=pa.float64())],
            schema=_MEAN_SCHEMA,
        )

    cand = ds.map_batches(src_pass, batch_format="pyarrow")
    ymeans = ds.map_batches(tgt_pass, batch_format="pyarrow")
    return _mine_tail(cand, ymeans, threshold, num_partitions)


def margin_pairs_bucketed(
    ds,
    k: int = 4,
    threshold: float = 1.0,
    side_col: str = "label",
    num_partitions=None,
    n_centroids: int | None = None,
    n_probe: int = 4,
):
    """Scale plan — the CCMatrix design (sharded faiss-IVF kNN): train
    an IVF coarse quantizer on a bounded sample
    (:func:`docstrange_ray.ops.ann.train_ivf_centroids`), explode each
    row into its ``n_probe`` nearest centroid buckets
    (:func:`docstrange_ray.ops.ann.ivf_assign_multi`), ONE bucket
    shuffle producing cross-side candidate edges (vectorized
    X-block @ Y-block matmul per bucket), dedup edges found via several
    probes, then compute mx/my as top-k means over the FOUND edges (the
    standard ANN approximation of full kNN — recall pinned by a test
    against the exact plan) and share the argmax tail.

    An earlier hyperplane-LSH variant was measured at 3% kNN recall on
    the fixture (random-direction 8-bit signatures slice moderate-cosine
    neighbourhoods too finely); IVF probes recover the coarse geometry
    kNN actually needs.  Measured vs the exact plan on the sf0.01
    fixture (500 random vectors, the adversarial no-structure case):
    argmax-pair recall 0.54/0.75/0.91 at n_probe 2/3/4; on planted
    near-identical cross-side pairs recall is 1.0 at n_probe=2.
    ``n_centroids`` defaults to ~sqrt(n) (bucket size ~sqrt(n): both
    the per-bucket matmul and the bucket count stay sublinear; scan
    fraction ~ n_probe/sqrt(n))."""
    from docstrange_ray.ops.ann import ivf_assign_multi, train_ivf_centroids

    if n_centroids is None:
        n_centroids = max(8, int(np.sqrt(max(ds.count(), 1))))
    cents = train_ivf_centroids(ds, n_centroids)

    def bucket_edges(df: pd.DataFrame) -> pd.DataFrame:
        srcs, tgts, coss = [], [], []
        for _, g in df.groupby("bucket", sort=False):
            sides = g[side_col].to_numpy().astype(np.int64) % 2
            gx = g[sides == 0]
            gy = g[sides == 1]
            if len(gx) == 0 or len(gy) == 0:
                continue
            xi = gx["vec_id"].to_numpy(dtype=np.int64)
            yi = gy["vec_id"].to_numpy(dtype=np.int64)
            xm = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in gx["embedding"]]))
            ym = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in gy["embedding"]]))
            cos6 = round6(xm @ ym.T)
            # keep at most k edges per source *within this bucket* —
            # bounds the edge exchange at k * n_sets rows per source
            for i in range(len(xi)):
                sel = _topk_order(cos6[i], yi, k)
                srcs.extend([int(xi[i])] * len(sel))
                tgts.extend(int(yi[j]) for j in sel)
                coss.extend(float(c) for c in cos6[i][sel])
        return pd.DataFrame({"src_id": srcs, "tgt_id": tgts, "cos": coss}).astype(
            {"src_id": np.int64, "tgt_id": np.int64, "cos": np.float64}
        )

    bucketed = ivf_assign_multi(ds, cents, n_probe=n_probe)
    edges = grouped_blocks(bucketed, ["bucket"], bucket_edges, num_partitions, batch_format="pandas")
    edges = grouped_blocks(
        edges,
        ["src_id", "tgt_id"],
        lambda df: df.drop_duplicates(["src_id", "tgt_id"]),
        num_partitions,
        batch_format="pandas",
    )
    # cand and ymeans below both consume `edges`; a lazy plan would
    # re-execute the whole bucket DAG twice and stack its shuffles
    # concurrently with the join's (measured deadlock at 4 CPUs).
    # The edge table is bounded at k*n_probe rows of 3 scalars per
    # source vector (~100 B/src — far below the input corpus), so
    # pinning it in the object store (spillable) is the right trade.
    edges = edges.materialize()

    def src_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(mx=pd.Series(dtype=np.float64))
        df = df.sort_values(["src_id", "cos", "tgt_id"], ascending=[True, False, True], kind="mergesort")
        df = df.groupby("src_id", as_index=False).head(k)
        mx = df.groupby("src_id")["cos"].mean().map(lambda v: float(round6(v)))
        return df.assign(mx=df["src_id"].map(mx).astype(np.float64))

    def tgt_means(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"tgt_id": pd.Series(dtype=np.int64), "my": pd.Series(dtype=np.float64)})
        df = df.sort_values(["tgt_id", "cos", "src_id"], ascending=[True, False, True], kind="mergesort")
        top = df.groupby("tgt_id", as_index=False).head(k)
        my = top.groupby("tgt_id", as_index=False)["cos"].mean()
        my["cos"] = round6(my["cos"].to_numpy())
        return my.rename(columns={"cos": "my"}).astype({"tgt_id": np.int64, "my": np.float64})

    cand = grouped_blocks(edges, ["src_id"], src_topk, num_partitions, batch_format="pandas")
    ymeans = grouped_blocks(edges, ["tgt_id"], tgt_means, num_partitions, batch_format="pandas")
    return _mine_tail(cand, ymeans, threshold, num_partitions)


def margin_pairs(
    ds,
    k: int = 4,
    threshold: float = 1.0,
    side_col: str = "label",
    plan: str = "auto",
    num_partitions=None,
):
    """Forward margin mining: per even-side vector, the argmax-margin
    odd-side candidate with ratio margin >= threshold.  Output columns
    (src_id, tgt_id, cos, margin), one row per mined source.

    plan='auto' selects broadcast (exact full-kNN candidates) under
    :data:`docstrange_ray.ops.dedup.EMBED_BRUTE_ROW_LIMIT` rows and the
    bucketed LSH plan above it (same gate as embedding_dup_pairs)."""
    from docstrange_ray.ops import dedup as _dedup

    if plan == "auto":
        choice = _dedup.resolve_embedding_plan(ds, _dedup.EMBED_BRUTE_ROW_LIMIT)
        plan = "broadcast" if choice == "broadcast" else "bucketed"
    if plan == "broadcast":
        return margin_pairs_broadcast(ds, k, threshold, side_col, num_partitions)
    if plan == "bucketed":
        return margin_pairs_bucketed(ds, k, threshold, side_col, num_partitions)
    raise ValueError(f"unknown plan {plan!r}")
