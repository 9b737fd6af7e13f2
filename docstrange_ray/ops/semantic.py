"""Distributed spherical k-means + SemDeDup-style semantic near-dedup.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) prunes semantic
duplicates by clustering embeddings and dropping, within each cluster,
all but one member of every high-cosine group. The reference engine has
no embedding ops at all (its corpus is documents, not vectors); this op
family extends the rebuild for LLM-training-data curation, alongside
``ops/dedup.py``'s lexical near-dup chain.

Scale shape (the whole point):

* **k-means fit** — centroids are tiny (k x dim floats). Each Lloyd
  iteration is ONE corpus scan: every batch assigns its rows to the
  broadcast centroids and emits k partial-sum rows (cid, n, psum);
  an ``adaptive_final`` k-row reduce closes the iteration. The corpus
  itself never crosses an exchange, so the fit costs n_iters scans
  regardless of cluster size.
* **assignment** — shuffle-free: one broadcast matmul per batch.
* **dedup** — ONE shuffle of (vec_id, cluster, embedding) keyed by
  cluster; each cluster's gram matrix is computed block-locally in
  row chunks (bounded memory even for hot clusters).

Determinism: every similarity and every centroid component is rounded
to 6 decimals BEFORE any comparison, so the plan is reproducible
across block orders / float summation orders — and byte-comparable to
the DuckDB oracle, which unrolls the same iterations in SQL
(``__ray_entry__._kmeans_cte``). Ties at equal rounded similarity
break to the lowest centroid id in both engines.

Drop rule: a row is dropped when ANY earlier row (lower vec_id) in its
cluster has rounded cosine >= tau — the house keep-lowest-id
convention (same as exact/passage dedup), a superset of SemDeDup's
keep-one-per-epsilon-group that stays SQL-expressible without
recursion. The paper's keep-farthest-from-centroid variant is a
one-line change to the per-cluster kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import round6

from docstrange_ray.ops.ann import _as_matrix, _normalize


def _lowest_k_rows(ds, k: int) -> np.ndarray:
    """Normalized matrix of the k smallest-vec_id rows — deterministic
    seed set. Local per-block min-k then one coalesced final (bounded:
    n_blocks x k tiny rows)."""
    from docstrange_ray.shuffle import coalesced_blocks

    def local_mink(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        take = np.argsort(ids, kind="stable")[:k]
        return batch.select(["vec_id", "embedding"]).take(pa.array(take))

    def final_mink(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("vec_id").head(k)

    rows = coalesced_blocks(
        ds.map_batches(local_mink, batch_format="pyarrow"), final_mink
    ).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return _normalize(mat)


def _assign_rounded(mat_norm: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmax over ROUNDED cosines; np.argmax's first-max rule = the
    lowest-cid tie-break the SQL oracle uses."""
    sims = round6(mat_norm @ cents.T, 6)
    return np.argmax(sims, axis=1).astype(np.int64)


def kmeans_fit(ds, k: int = 8, n_iters: int = 2, init: str = "first-k") -> np.ndarray:
    """Distributed Lloyd iterations; returns (k, dim) centroids with
    components rounded to 6 decimals.

    ``init='first-k'``: the k lowest-vec_id rows (deterministic and
    SQL-expressible — the oracle path). ``init='kpp'``: farthest-point
    k-means++ over a bounded sample (better spread; reuses
    :func:`docstrange_ray.ops.ann._kmeanspp_init`).

    Per iteration: one corpus scan -> per-block partial sums (k rows) ->
    ``adaptive_final`` k-row combine. Empty clusters keep their previous
    centroid (both engines).
    """
    import ray

    from docstrange_ray.ops.ann import _kmeanspp_init
    from docstrange_ray.shuffle import adaptive_final

    if init == "first-k":
        cents = _lowest_k_rows(ds, k)
    elif init == "kpp":
        rows = ds.limit(2048).take_all()
        mat = _normalize(
            np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        )
        cents = _kmeanspp_init(mat, min(k, len(mat)))
    else:  # pragma: no cover - caller error
        raise ValueError(f"unknown init {init!r}")
    cents = round6(cents, 6)
    k = len(cents)

    for _ in range(n_iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            cc = ray.get(ref)
            mat = _normalize(_as_matrix(batch.column("embedding")))
            assign = _assign_rounded(mat, cc)
            cids, counts, sums = [], [], []
            for cid in np.unique(assign):
                members = mat[assign == cid]
                cids.append(int(cid))
                counts.append(len(members))
                sums.append(members.sum(axis=0))
            return pa.Table.from_arrays(
                [
                    pa.array(cids, type=pa.int64()),
                    pa.array(counts, type=pa.int64()),
                    pa.array(sums, type=pa.list_(pa.float64())),
                ],
                names=["cid", "n", "psum"],
            )

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            out = []
            for cid, g in df.groupby("cid", sort=True):
                out.append(
                    {
                        "cid": int(cid),
                        "n": int(g["n"].sum()),
                        "psum": np.stack([np.asarray(v) for v in g["psum"]]).sum(axis=0),
                    }
                )
            return pd.DataFrame(out)

        partials = ds.map_batches(partial, batch_format="pyarrow")
        reduced = adaptive_final(partials, combine, keys=["cid"]).take_all()

        new = cents.copy()  # empty cluster -> previous centroid survives
        for r in reduced:
            mean = np.asarray(r["psum"], dtype=np.float64) / r["n"]
            new[r["cid"]] = _normalize(mean[None, :])[0]
        cents = round6(new, 6)
    return cents


def kmeans_assign(ds, centroids: np.ndarray):
    """Append the ``cluster`` column (int64): nearest centroid by
    rounded cosine, tie to lowest cid. Shuffle-free broadcast matmul."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(ref)
        mat = _normalize(_as_matrix(batch.column("embedding")))
        cluster = _assign_rounded(mat, cc)
        return batch.append_column("cluster", pa.array(cluster, type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_clusters(ds, k: int = 8, n_iters: int = 2, init: str = "first-k"):
    """(vec_id, cluster) for the whole corpus — fit + assign."""
    cents = kmeans_fit(ds, k=k, n_iters=n_iters, init=init)
    return kmeans_assign(ds, cents).select_columns(["vec_id", "cluster"])


_CHUNK = 2048  # sim-matrix tile edge: the pairwise pass materializes at
# most CHUNK x CHUNK similarity floats at a time (both axes tiled), so
# a hot cluster can never blow a worker's heap through the gram matrix.


def semantic_dedup(
    ds, k: int = 8, n_iters: int = 2, tau: float = 0.4, init: str = "first-k",
    num_partitions: int | None = None, target_cluster_size: int | None = None,
):
    """SemDeDup-style pruning: returns (vec_id, cluster, kept) where
    kept=0 iff some lower-vec_id member of the same cluster has rounded
    cosine >= tau. ONE embedding shuffle (keyed by cluster).

    Scale notes (VERDICT-r3 #5): the cluster key caps the prune's
    PARALLELISM at k, and each group block holds one whole cluster's
    embeddings — so k must scale with the corpus. Pass
    ``target_cluster_size`` to derive ``k = max(k, ceil(n / target))``
    (SemDeDup itself runs k ~ 100k clusters for exactly this reason);
    the fixed default k=8 is the small-fixture/SQL-oracle setting. The
    per-cluster pairwise pass is tiled on BOTH axes (<= _CHUNK^2
    similarity floats live at once), so the only O(cluster) worker
    allocation left is the normalized float64 copy of the cluster's own
    embedding matrix — proportional to the group block grouped_blocks
    already co-located."""
    from docstrange_ray.shuffle import grouped_blocks

    if target_cluster_size is not None:
        # materialize first: count() + the fit/assign scans would
        # otherwise each re-execute a lazy upstream pipeline
        ds = ds.materialize()
        n = ds.count()
        k = max(k, -(-n // target_cluster_size))
    cents = kmeans_fit(ds, k=k, n_iters=n_iters, init=init)
    assigned = kmeans_assign(ds, cents).select_columns(
        ["vec_id", "cluster", "embedding"]
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for cid, g in df.groupby("cluster", sort=True):
            g = g.sort_values("vec_id")
            mat = _normalize(
                np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
            )
            m = len(g)
            dropped = np.zeros(m, dtype=bool)
            for lo in range(1, m, _CHUNK):
                hi = min(lo + _CHUNK, m)
                hit = np.zeros(hi - lo, dtype=bool)
                # column tiles: row lo+r may only see columns < lo+r
                for co in range(0, hi, _CHUNK):
                    ce = min(co + _CHUNK, hi)
                    sims = round6(mat[lo:hi] @ mat[co:ce].T)
                    earlier = (
                        np.arange(co, ce)[None, :]
                        < (lo + np.arange(hi - lo))[:, None]
                    )
                    hit |= ((sims >= tau) & earlier).any(axis=1)
                dropped[lo:hi] = hit
            frames.append(
                pd.DataFrame(
                    {
                        "vec_id": g["vec_id"].to_numpy(),
                        "cluster": np.full(m, int(cid), dtype=np.int64),
                        "kept": (~dropped).astype(np.int64),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "cluster": pd.Series([], dtype="int64"),
                    "kept": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    return grouped_blocks(
        assigned, ["cluster"], prune, num_partitions=num_partitions,
        batch_format="pandas",
    )


def hashed_doc_vectors(ds, m: int = 64, dense: bool = False,
                       num_partitions=None):
    """Feature-hashing doc vectors (the hashing trick, Weinberger et
    al. 2009): ``v[md5(w) % m] += sign(w) * tf(w)`` with the sign
    drawn from the md5's second half — the unbiased signed variant.
    Turns raw text into fixed-width vectors with NO vocabulary state
    (no broadcast, no exchange — a pure shuffle-free scan), so the
    embedding-space ops (PCA, kNN, cosine dedup) compose onto corpora
    that ship no embeddings.

    ``dense=False`` returns the exact long form
    Dataset[(doc_id, dim, val)] — nonzero integer entries only
    (sign cancellation drops a dim), bit-exact against the SQL md5
    idiom. ``dense=True`` returns Dataset[(doc_id, embedding:
    list<float64>)] ready for ops.ann / ops.pca / embedding_dup_pairs.
    """
    import hashlib

    def vectors(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        word_lists = [(t or "").lower().split() for t in texts]
        all_words = [w for ws in word_lists for w in ws]
        mats = np.zeros((len(texts), m), dtype=np.int64)
        if all_words:
            codes, uniq = pd.factorize(np.asarray(all_words, dtype=object))
            digest = b"".join(hashlib.md5(w.encode("utf-8")).digest()
                              for w in uniq)
            raw = np.frombuffer(digest, dtype=">u8").reshape(-1, 2)
            dims = (raw[:, 0] % np.uint64(m)).astype(np.int64)
            signs = np.where(raw[:, 1] % np.uint64(2) == 0, 1, -1).astype(np.int64)
            pos = 0
            for i, ws in enumerate(word_lists):
                k = len(ws)
                c = codes[pos : pos + k]
                pos += k
                np.add.at(mats[i], dims[c], signs[c])
        if dense:
            return pa.Table.from_arrays(
                [pa.array(doc_ids, type=pa.int64()),
                 pa.array([row.astype(np.float64) for row in mats],
                          type=pa.list_(pa.float64()))],
                names=["doc_id", "embedding"],
            )
        nz_doc, nz_dim, nz_val = [], [], []
        for i, did in enumerate(doc_ids):
            nz = np.nonzero(mats[i])[0]
            nz_doc.extend([did] * len(nz))
            nz_dim.extend(int(d) for d in nz)
            nz_val.extend(int(mats[i, d]) for d in nz)
        return pa.Table.from_arrays(
            [pa.array(nz_doc, type=pa.int64()),
             pa.array(nz_dim, type=pa.int64()),
             pa.array(nz_val, type=pa.int64())],
            names=["doc_id", "dim", "val"],
        )

    return ds.map_batches(vectors, batch_format="pyarrow")


def label_centroid_sims(emb_ds, scale_bits: int = 20, num_partitions=None):
    """Pairwise cosine similarity between per-label embedding CENTROIDS
    — the domain-similarity matrix behind mixture design ("how close is
    source A's embedding mass to source B's"). Exactness: float sums
    are reduction-order-dependent, so values are quantized to integer
    units (``round_half_away(x * 2^scale_bits)`` — DuckDB ROUND parity)
    FIRST and all reductions are integer sums (order-independent).
    Cosine is computed from the integer SUM vectors directly (cosine is
    scale-invariant, so sums == centroids), with Python bigints for the
    dot products (a label's sum grows with its row count; int64 would
    overflow near ~10^8 rows/label — the SQL oracle uses HUGEINT for
    the same reason), then ONE exactly-mirrored float conversion chain:
    float(dot) / (sqrt(float(na)) * sqrt(float(nb))), rounded to 6.

    Scale shape: per-batch per-(label, dim) integer partial sums (long
    form, bounded labels x dims) -> adaptive_final -> the driver holds
    only the (labels x dims) sum table and emits the (labels choose 2)
    similarity rows. Returns pandas DataFrame
    [(label_a, label_b, cos)] with label_a < label_b.
    """
    import math

    from docstrange_ray.numerics import round6
    from docstrange_ray.shuffle import adaptive_final, arrow_out

    scale = float(1 << scale_bits)

    def partial(batch: pa.Table) -> pd.DataFrame:
        from docstrange_ray.numerics import round_half_away

        labels = np.asarray(batch.column("label").to_pylist())
        mat = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                for v in batch.column("embedding").to_pylist()
            ]
        )
        q = round_half_away(mat * scale, 0).astype(np.int64)
        out = []
        for lab in np.unique(labels):
            s = q[labels == lab].sum(axis=0)
            for dim, v in enumerate(s, 1):
                out.append((int(lab), dim, int(v)))
        return pd.DataFrame(out, columns=["label", "dim", "s"]).astype(
            {"label": "int64", "dim": "int64", "s": "int64"}
        )

    sums = adaptive_final(
        emb_ds.map_batches(arrow_out(partial), batch_format="pyarrow"),
        lambda df: df.groupby(["label", "dim"], as_index=False)["s"].sum(),
        keys=["label", "dim"],
        num_partitions=num_partitions,
    ).to_pandas()
    if "label" not in sums.columns:  # empty dataset loses its schema
        return pd.DataFrame({"label_a": [], "label_b": [], "cos": []})
    vecs = {
        int(lab): [int(x) for x in sub.sort_values("dim")["s"]]
        for lab, sub in sums.groupby("label")
    }
    labs = sorted(vecs)
    rows = []
    for i, a in enumerate(labs):
        na = sum(x * x for x in vecs[a])  # Python bigint: no overflow
        for b in labs[i + 1 :]:
            nb = sum(x * x for x in vecs[b])
            dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            if na == 0 or nb == 0:
                cos = 0.0
            else:
                cos = float(dot) / (math.sqrt(float(na)) * math.sqrt(float(nb)))
            rows.append((a, b, float(round6(cos))))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "cos"])


def kcenter_select(
    ds,
    k: int,
    id_col: str = "vec_id",
    col: str = "embedding",
    num_partitions=None,
):
    """Greedy k-center coreset selection (farthest-point traversal,
    Gonzalez 1985): pick the point maximizing cosine distance to the
    already-selected set, k times — the standard diverse-subset
    selector for eval/labeling sets and the 2-approximation to the
    optimal k-center cover.

    Distributed shape: unit-normalized vectors are materialized ONCE;
    each of the k-1 rounds broadcasts the (j x d) selected-center
    matrix via ``ray.put`` and runs one shuffle-free scan — per block:
    one matmul, per-row min-distance, local argmax — then ONE coalesced
    global argmax (n_blocks candidate rows). Total work O(n k d) per
    round / O(n k^2 d) overall, the stateless-recompute tradeoff: no
    per-round re-materialization of an updated distance column, every
    round is a pure function of (input, selected-so-far), so a killed
    job resumes by replaying selections. Ties break on lowest id; the
    seed is the lowest id (deterministic at any cluster size — argmax
    compares identical doubles regardless of blocking).

    Not SQL-expressible (k-step iterative argmax); pinned by an
    independent numpy loop reference in tests.

    Returns a pandas DataFrame [(sel_order, id, dist)] — ``dist`` the
    cosine distance to the previously-selected set (2.0 sentinel for
    the seed = the cosine-distance supremum).
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    def normalize(batch: pa.Table) -> pa.Table:
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch.column(col).to_pylist()]
        ) if batch.num_rows else np.zeros((0, 1))
        if batch.num_rows:
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            mat = mat / nrm
        return pa.table(
            {
                "id": batch.column(id_col),
                "v": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    unit = ds.map_batches(normalize, batch_format="pyarrow").materialize()
    n = unit.count()
    if n == 0 or k <= 0:
        return pd.DataFrame(columns=["sel_order", "id", "dist"])

    from ray.data.aggregate import Min

    seed_id = int(unit.aggregate(Min("id"))["min(id)"])
    seed_vec = np.asarray(
        unit.filter(expr=f"id == {seed_id}").take(1)[0]["v"], dtype=np.float64
    )
    selected = [(0, seed_id, 2.0)]
    centers = [seed_vec]

    for j in range(1, min(k, n)):
        cref = ray.put(np.stack(centers))

        def local_far(batch: pa.Table, _cref=cref) -> pd.DataFrame:
            C = ray.get(_cref)
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch.column("v").to_pylist()]
            )
            dist = 1.0 - (mat @ C.T).max(axis=1)
            # local argmax, ties lowest id: sort keys (-dist, id); the
            # winner CARRIES its vector so no per-round filter scan is
            # needed to fetch the new center
            order = np.lexsort((ids, -dist))
            b = order[0]
            return pd.DataFrame(
                {
                    "id": [int(ids[b])],
                    "dist": [float(dist[b])],
                    "v": [mat[b].tolist()],
                }
            )

        def global_far(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["dist", "id"], ascending=[False, True])
            return df.head(1)

        best = coalesced_blocks(
            unit.map_batches(arrow_out(local_far), batch_format="pyarrow"),
            global_far,
        ).take_all()[0]
        bid, bdist = int(best["id"]), float(best["dist"])
        selected.append((j, bid, bdist))
        centers.append(np.asarray(best["v"], dtype=np.float64))

    return pd.DataFrame(
        {
            "sel_order": pd.Series([s[0] for s in selected], dtype="int64"),
            "id": pd.Series([s[1] for s in selected], dtype="int64"),
            "dist": [s[2] for s in selected],
        }
    )


def cosine_join_exact(
    ds,
    threshold_num: int = 30,
    threshold_den: int = 100,
    q: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    brute_limit: int | None = None,
):
    """EXACT cosine similarity self-join over quantized embeddings —
    the SQL-checkable complement to the float LSH/IVF near-dup paths:
    no recall gap, no float-reduction ambiguity, every pair with
    cos(qx, qy) >= num/den present with a bit-deterministic score.

    Exactness argument (why floats can't break it): coordinates are
    quantized ONCE to int64 (``kmeans.quantize_vec``); for unit-norm
    embeddings at q = 1e6 every product |xi*yi| <= 1e12 and every dot
    or norm sum <= dim * 1e12 << 2^53, so the float64 MATMUL that
    computes them is EXACT integer arithmetic. The threshold cut is
    then the integer predicate ``dot >= 0 AND den^2*dot^2 >=
    num^2*n2a*n2b`` — dot^2 (~1e27) overflows float53 AND int64, so a
    float pre-cut with a 1e-9 relative band selects candidates and the
    borderline band is re-checked in arbitrary-precision Python ints
    (the exact-geometry two-tier idiom). Emitted ``cos6`` =
    round6(dot / sqrt(double(n2a) * n2b)) — IEEE mult/sqrt/div are
    correctly rounded, so DuckDB computes the identical bits from the
    identical integers.

    Scale shape: the quantized matrix is ray.put-broadcast ONCE and
    each block matmuls its rows against it (the ops/dedup
    EMBED_BRUTE_ROW_LIMIT gate; above it exact all-pairs is O(n^2) BY
    NATURE — use the LSH/IVF/semantic paths and their planted-recall
    oracles instead). Output is pair-scale.

    Returns Dataset[(a, b, dot_q, cos6)] with a < b (id order).
    """
    import ray

    from docstrange_ray.numerics import round6
    from docstrange_ray.ops.dedup import EMBED_BRUTE_ROW_LIMIT
    from docstrange_ray.ops.kmeans import quantize_vec
    from docstrange_ray.shuffle import arrow_out

    if brute_limit is None:
        brute_limit = EMBED_BRUTE_ROW_LIMIT
    n_rows = ds.count()
    if n_rows > brute_limit:
        raise ValueError(
            f"cosine_join_exact: {n_rows} rows exceeds brute_limit="
            f"{brute_limit}; exact all-pairs is quadratic by nature — "
            "use embedding_near_dups (LSH) / semantic_dedup at this scale"
        )

    rows = ds.select_columns([id_col, vec_col]).take_all()  # gated above
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = quantize_vec(
        np.array([rows[i][vec_col] for i in order], dtype=np.float64), q
    ).astype(np.float64)
    n2 = np.einsum("nd,nd->n", mat, mat)  # exact (< 2^53)
    ref = ray.put((ids, mat, n2))

    tn2 = threshold_num * threshold_num
    td2 = threshold_den * threshold_den

    def block_pairs(batch: pa.Table) -> pd.DataFrame:
        all_ids, M, N2 = ray.get(ref)
        bid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bmat = quantize_vec(
            np.array(batch.column(vec_col).to_pylist(), dtype=np.float64), q
        ).astype(np.float64)
        bn2 = np.einsum("nd,nd->n", bmat, bmat)
        dots = bmat @ M.T  # exact integers in float64
        # float pre-cut with relative band, then exact int verify
        denom = np.sqrt(bn2[:, None] * N2[None, :])
        with np.errstate(invalid="ignore", divide="ignore"):
            cosf = np.where(denom > 0, dots / denom, 0.0)
        t = threshold_num / threshold_den
        cand_i, cand_j = np.nonzero(
            (cosf >= t - 1e-9) & (bid[:, None] < all_ids[None, :])
        )
        out_a, out_b, out_d, out_c = [], [], [], []
        for i, j in zip(cand_i, cand_j):
            d = int(dots[i, j])
            if d < 0:
                continue
            if td2 * d * d < tn2 * int(bn2[i]) * int(N2[j]):  # exact ints
                continue
            out_a.append(int(bid[i]))
            out_b.append(int(all_ids[j]))
            out_d.append(d)
            out_c.append(
                float(round6(d / np.sqrt(float(bn2[i]) * float(N2[j]))))
            )
        return pd.DataFrame(
            {
                "a": pd.Series(out_a, dtype=np.int64),
                "b": pd.Series(out_b, dtype=np.int64),
                "dot_q": pd.Series(out_d, dtype=np.int64),
                "cos6": pd.Series(out_c, dtype=np.float64),
            }
        )

    return ds.map_batches(arrow_out(block_pairs), batch_format="pyarrow")


def kcenter_select_exact(
    ds,
    k: int,
    q: int = 10**6,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Greedy k-center (Gonzalez 1985) in EXACT integer arithmetic —
    the SQL-green twin of :func:`kcenter_select` (same
    farthest-point-traversal shape; squared-L2 on quantize-once int64
    coordinates instead of float cosine — monotone-equivalent for the
    unit-norm embeddings this runs on, since d2 = 2 - 2 cos there).

    Determinism: every pairwise d2 is an exact integer (< 2^53, so the
    float64 matmul computing it is exact — the ops/kmeans argument);
    argmax ties break on lowest id; already-selected ids are excluded
    (an all-coincident-points corpus would otherwise re-pick the
    seed). Output is a pure function of the input at any parallelism,
    mirrored by k unrolled CTEs in the oracle.

    Same broadcast-and-scan shape as kcenter_select: per round the
    (j x d) int center matrix is ray.put once, each block emits ONE
    candidate row, one coalesced global argmax.

    Returns pandas DataFrame [(sel_order, id, d2)] — d2 int64, -1
    sentinel for the seed.
    """
    import ray

    from docstrange_ray.ops.kmeans import quantize_vec
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    def quant(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pd.DataFrame(
                {"id": pd.Series([], dtype=np.int64),
                 "qv": pd.Series([], dtype=object)}
            )
        mat = quantize_vec(
            np.asarray(batch.column(col).to_pylist(), dtype=np.float64), q
        )
        return pd.DataFrame({"id": ids, "qv": [r.tobytes() for r in mat]})

    pts = ds.map_batches(arrow_out(quant), batch_format="pyarrow").materialize()
    n = pts.count()
    if n == 0 or k <= 0:
        return pd.DataFrame(
            {"sel_order": pd.Series([], dtype=np.int64),
             "id": pd.Series([], dtype=np.int64),
             "d2": pd.Series([], dtype=np.int64)}
        )

    from ray.data.aggregate import Min

    seed_id = int(pts.aggregate(Min("id"))["min(id)"])
    seed_vec = np.frombuffer(
        pts.filter(expr=f"id == {seed_id}").take(1)[0]["qv"], dtype=np.int64
    )
    selected = [(0, seed_id, -1)]
    centers = [seed_vec]

    for j in range(1, min(k, n)):
        cref = ray.put(
            (np.stack(centers).astype(np.float64),
             frozenset(s[1] for s in selected))
        )

        def local_far(batch: pa.Table, _cref=cref) -> pd.DataFrame:
            C, taken = ray.get(_cref)
            df = batch.to_pandas()
            df = df[~df["id"].isin(taken)]
            if df.empty:
                return pd.DataFrame(
                    {"id": pd.Series([], dtype=np.int64),
                     "d2": pd.Series([], dtype=np.int64),
                     "qv": pd.Series([], dtype=object)}
                )
            ids = df["id"].to_numpy(np.int64)
            mat = np.stack(
                [np.frombuffer(b, dtype=np.int64) for b in df["qv"]]
            ).astype(np.float64)
            # d2 to each center, exact in float64: |x|^2 + |c|^2 - 2 x.c
            x2 = np.einsum("nd,nd->n", mat, mat)
            c2 = np.einsum("kd,kd->k", C, C)
            d2 = (x2[:, None] + c2[None, :] - 2.0 * (mat @ C.T)).min(axis=1)
            order = np.lexsort((ids, -d2))
            b = order[0]
            return pd.DataFrame(
                {"id": [int(ids[b])], "d2": [int(d2[b])],
                 "qv": [df["qv"].iloc[b]]}
            )

        def global_far(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["d2", "id"], ascending=[False, True])
            return df.head(1)

        win = coalesced_blocks(
            pts.map_batches(arrow_out(local_far), batch_format="pyarrow"),
            global_far,
        ).take_all()
        if not win:
            break
        w = win[0]
        selected.append((j, int(w["id"]), int(w["d2"])))
        centers.append(np.frombuffer(w["qv"], dtype=np.int64))

    return pd.DataFrame(
        {
            "sel_order": pd.Series([s[0] for s in selected], dtype=np.int64),
            "id": pd.Series([s[1] for s in selected], dtype=np.int64),
            "d2": pd.Series([s[2] for s in selected], dtype=np.int64),
        }
    )
