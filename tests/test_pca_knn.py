"""Distributed PCA + k-NN classifier tests.

References are independent whole-matrix numpy / plain-loop
implementations (no Ray, no shared kernels) — agreement pins the
distributed plans, not the code.
"""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
import ray

from docstrange_ray.ops import ann, pca


def md5vec(tag: str, d: int = 16) -> np.ndarray:
    out = []
    for i in range(0, d, 4):
        h = hashlib.md5(f"{tag}:{i}".encode()).digest()
        out.extend(b / 255.0 - 0.5 for b in h[:4])
    return np.asarray(out[:d], dtype=np.float64)


def emb_rows(n: int = 120, d: int = 16, n_labels: int = 5):
    rows = []
    for i in range(n):
        rows.append(
            {
                "vec_id": i,
                "embedding": [float(x) for x in md5vec(f"v{i}", d)],
                "label": i % n_labels,
            }
        )
    return rows


def clustered_rows(n_per: int = 20, d: int = 16, n_labels: int = 4):
    """Well-separated clusters: label c lives near 4*basis_c; every
    vector's true nearest neighbors share its label, and IVF with
    enough centroids recovers brute exactly."""
    rows = []
    i = 0
    for c in range(n_labels):
        center = np.zeros(d)
        center[c] = 4.0
        for j in range(n_per):
            v = center + 0.05 * md5vec(f"c{c}j{j}", d)
            rows.append(
                {"vec_id": i, "embedding": [float(x) for x in v], "label": c}
            )
            i += 1
    return rows


def ref_round6(x):
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def ref_knn(rows, k):
    """Plain-loop leave-one-out kNN: round6 sims, (score desc, nid asc)
    neighbor rank, (votes desc, label asc) vote."""
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    out = {}
    for qi, rq in enumerate(rows):
        sims = []
        for ni, rn in enumerate(rows):
            if rn["vec_id"] == rq["vec_id"]:
                continue
            sims.append((ref_round6(float(mat[qi] @ mat[ni])), rn["vec_id"], rn["label"]))
        sims.sort(key=lambda t: (-t[0], t[1]))
        top = sims[:k]
        votes = {}
        for _, _, lab in top:
            votes[lab] = votes.get(lab, 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        out[rq["vec_id"]] = (pred, votes[pred], rq["label"])
    return out


class TestPCA:
    def test_moments_match_numpy(self):
        rows = emb_rows()
        ds = ray.data.from_items(rows)
        n, s, ss = pca.embedding_moments(ds)
        mat = np.stack([np.asarray(r["embedding"]) for r in rows])
        assert n == len(rows)
        np.testing.assert_allclose(s, mat.sum(axis=0), rtol=1e-12)
        np.testing.assert_allclose(ss, mat.T @ mat, rtol=1e-12)

    def test_fit_matches_whole_matrix_reference(self):
        rows = emb_rows()
        ds = ray.data.from_items(rows)
        mu, comps, ev = pca.pca_fit(ds, n_components=4)
        mat = np.stack([np.asarray(r["embedding"]) for r in rows])
        ref_mu = mat.mean(axis=0)
        cov = np.cov(mat, rowvar=False, bias=True)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(-w, kind="stable")
        np.testing.assert_allclose(mu, ref_mu, rtol=1e-10)
        np.testing.assert_allclose(ev, w[order[:4]], rtol=1e-8)
        for i in range(4):
            r = v[:, order[i]]
            j = int(np.argmax(np.abs(comps[i])))
            if r[j] < 0:
                r = -r
            np.testing.assert_allclose(comps[i], r, atol=1e-8)

    def test_project_matches_reference(self):
        rows = emb_rows()
        ds = ray.data.from_items(rows)
        mu, comps, _ = pca.pca_fit(ds, n_components=3)
        got = pca.pca_project(ds, mu, comps).to_pandas().sort_values("vec_id")
        mat = np.stack([np.asarray(r["embedding"]) for r in rows])
        ref = (mat - mu) @ comps.T
        for i in range(3):
            np.testing.assert_allclose(
                got[f"p{i}"].to_numpy(),
                [ref_round6(x) for x in ref[:, i]],
                atol=1e-12,
            )

    def test_variance_ratio_uses_full_trace(self):
        rows = emb_rows()
        ds = ray.data.from_items(rows)
        t = pca.pca_variance_table(ds, n_components=4)
        mat = np.stack([np.asarray(r["embedding"]) for r in rows])
        cov = np.cov(mat, rowvar=False, bias=True)
        w = np.sort(np.linalg.eigvalsh(cov))[::-1]
        np.testing.assert_allclose(
            t["var_ratio"].to_numpy(),
            [ref_round6(x) for x in w[:4] / w.sum()],
            atol=2e-6,
        )
        # scree is non-increasing
        assert (np.diff(t["explained_var"].to_numpy()) <= 1e-12).all()

    def test_second_moment_table_matches_raw_sums(self):
        rows = emb_rows(n=40, d=6)
        ds = ray.data.from_items(rows)
        t = pca.second_moment_table(ds).sort_values(["i", "j"]).reset_index(drop=True)
        mat = np.stack([np.asarray(r["embedding"]) for r in rows])
        ss = mat.T @ mat
        s = mat.sum(axis=0)
        assert len(t) == 36
        for _, r in t.iterrows():
            assert r["sxx"] == pytest.approx(ref_round6(ss[int(r["i"]), int(r["j"])]), abs=1e-12)
            assert r["si"] == pytest.approx(ref_round6(s[int(r["i"])]), abs=1e-12)


class TestKNNClassify:
    def test_brute_matches_loop_reference(self):
        rows = emb_rows(n=90, d=12, n_labels=4)
        ds = ray.data.from_items(rows)
        got = ann.knn_classify(ds, k=7, plan="brute").to_pandas()
        got = got.sort_values("vec_id").reset_index(drop=True)
        ref = ref_knn(rows, k=7)
        assert len(got) == len(rows)
        for _, r in got.iterrows():
            pred, votes, tlab = ref[int(r["vec_id"])]
            assert int(r["pred_label"]) == pred
            assert int(r["votes"]) == votes
            assert int(r["true_label"]) == tlab
            assert int(r["correct"]) == int(pred == tlab)

    def test_vote_tie_breaks_to_lowest_label(self):
        # 1 query + 4 neighbors: two labels with 2 votes each at k=4
        rows = []
        base = np.zeros(8)
        base[0] = 1.0
        rows.append({"vec_id": 0, "embedding": list(base), "label": 9})
        for i, lab in enumerate([3, 3, 1, 1]):
            v = base.copy()
            v[1 + i] = 0.1 + 0.01 * i
            rows.append({"vec_id": i + 1, "embedding": [float(x) for x in v], "label": lab})
        ds = ray.data.from_items(rows)
        got = ann.knn_classify(ds, k=4, plan="brute").to_pandas()
        q0 = got[got["vec_id"] == 0].iloc[0]
        assert int(q0["pred_label"]) == 1  # tie 2-2 -> lowest label
        assert int(q0["votes"]) == 2

    def test_ivf_equals_brute_on_separated_clusters(self):
        rows = clustered_rows()
        ds = ray.data.from_items(rows)
        brute = ann.knn_classify(ds, k=5, plan="brute").to_pandas()
        ivf = ann.knn_classify(
            ds, k=5, plan="ivf", n_centroids=4, n_probe=2
        ).to_pandas()
        b = brute.sort_values("vec_id").reset_index(drop=True)
        v = ivf.sort_values("vec_id").reset_index(drop=True)
        assert len(v) == len(b)
        pd.testing.assert_frame_equal(b, v[b.columns])
        assert (b["correct"] == 1).all()  # separated clusters: all correct

    def test_ivf_recall_on_random_vectors(self):
        rows = emb_rows(n=150, d=16, n_labels=5)
        ds = ray.data.from_items(rows)
        brute = ann.knn_classify(ds, k=5, plan="brute").to_pandas()
        ivf = ann.knn_classify(
            ds, k=5, plan="ivf", n_centroids=8, n_probe=4
        ).to_pandas()
        m = brute.merge(ivf, on="vec_id", suffixes=("_b", "_i"))
        assert len(m) == len(rows)
        agree = (m["pred_label_b"] == m["pred_label_i"]).mean()
        assert agree >= 0.7  # multi-probe recovers most exact votes

    def test_auto_plan_gates_on_count(self):
        rows = emb_rows(n=30, d=8)
        ds = ray.data.from_items(rows)
        small = ann.knn_classify(ds, k=3, plan="auto", brute_limit=100).to_pandas()
        big = ann.knn_classify(
            ds, k=3, plan="auto", brute_limit=10, n_centroids=4, n_probe=4
        ).to_pandas()
        assert len(small) == 30
        assert len(big) == 30  # ivf path engaged without error


class TestHashedDocVectors:
    def test_matches_loop_reference(self):
        import hashlib

        from docstrange_ray.ops import semantic

        texts = ["the cat sat on the mat", "cat cat cat", "", "unique words only"]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        M = 16
        got = semantic.hashed_doc_vectors(
            ray.data.from_items(rows), m=M
        ).to_pandas()
        got_map = {(r.doc_id, r.dim): r.val for r in got.itertuples(index=False)}
        # independent loop reference
        exp: dict = {}
        for i, t in enumerate(texts):
            for w in t.lower().split():
                d = hashlib.md5(w.encode()).digest()
                dim = int.from_bytes(d[:8], "big") % M
                sign = 1 if int.from_bytes(d[8:16], "big") % 2 == 0 else -1
                exp[(i, dim)] = exp.get((i, dim), 0) + sign
        exp = {k: v for k, v in exp.items() if v != 0}
        assert got_map == exp

    def test_dense_feeds_embedding_ops(self):
        from docstrange_ray.ops import semantic

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            {"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base + " extra"},  # near-dup
            {"doc_id": 2, "text": "completely different words entirely here"},
        ]
        vecs = semantic.hashed_doc_vectors(
            ray.data.from_items(rows), m=32, dense=True
        ).map_batches(
            lambda b: b.rename_columns(["vec_id", "embedding"]),
            batch_format="pyarrow",
        )
        from docstrange_ray.ops import dedup as dd

        pairs = dd.embedding_dup_pairs(vecs, threshold=0.9).to_pandas()
        found = set(zip(pairs["id_a"], pairs["id_b"]))
        assert (0, 1) in found or (1, 0) in found
        assert not any(2 in p for p in found)


class TestCosineJoinExact:
    @staticmethod
    def _reference(ids, vecs, num, den, q=10**6):
        from docstrange_ray.numerics import round6
        from docstrange_ray.ops.kmeans import quantize_vec

        # the Dataset column is list<float32>: round-trip first
        qm = quantize_vec(np.asarray(vecs, dtype=np.float32).astype(np.float64), q)
        out = []
        for i in range(len(ids)):
            for j in range(len(ids)):
                if ids[i] >= ids[j]:
                    continue
                d = int(np.dot(qm[i].astype(object), qm[j].astype(object)))
                na = int(np.dot(qm[i].astype(object), qm[i].astype(object)))
                nb = int(np.dot(qm[j].astype(object), qm[j].astype(object)))
                if d < 0 or den * den * d * d < num * num * na * nb:
                    continue
                c6 = float(round6(float(d) / np.sqrt(float(na) * float(nb))))
                out.append((ids[i], ids[j], d, c6))
        return sorted(out)

    def _ds(self, ids, vecs, parts=3):
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table(
                {"vec_id": pa.array(ids, pa.int64()),
                 "embedding": pa.array(
                     [list(map(float, v)) for v in vecs],
                     pa.list_(pa.float32()))}
            )
        ).repartition(parts)

    def test_equals_reference(self):
        from docstrange_ray.ops.semantic import cosine_join_exact

        rng = np.random.RandomState(3)
        vecs = rng.randn(40, 8)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        ids = list(range(40))
        want = self._reference(ids, vecs, 30, 100)
        got = sorted(
            (int(r["a"]), int(r["b"]), int(r["dot_q"]), float(r["cos6"]))
            for r in cosine_join_exact(self._ds(ids, vecs)).take_all()
        )
        assert got == want and len(want) > 0

    def test_exact_boundary_pair_included(self):
        from docstrange_ray.ops.semantic import cosine_join_exact

        # qx=(3,4), qy=(4,3): cos = 24/25 exactly
        vecs = [[3e-6, 4e-6], [4e-6, 3e-6]]
        got = cosine_join_exact(
            self._ds([1, 2], vecs), threshold_num=24, threshold_den=25
        ).take_all()
        assert len(got) == 1 and int(got[0]["dot_q"]) == 24
        got2 = cosine_join_exact(
            self._ds([1, 2], vecs), threshold_num=9601, threshold_den=10000
        ).take_all()
        assert len(got2) == 0

    def test_partition_invariance(self):
        from docstrange_ray.ops.semantic import cosine_join_exact

        rng = np.random.RandomState(8)
        vecs = rng.randn(50, 6)
        ids = list(range(50))
        a = sorted(
            tuple(r.values())
            for r in cosine_join_exact(self._ds(ids, vecs, parts=1)).take_all()
        )
        b = sorted(
            tuple(r.values())
            for r in cosine_join_exact(self._ds(ids, vecs, parts=8)).take_all()
        )
        assert a == b

    def test_gate_raises(self):
        from docstrange_ray.ops.semantic import cosine_join_exact

        rng = np.random.RandomState(0)
        with pytest.raises(ValueError):
            cosine_join_exact(
                self._ds(list(range(20)), rng.randn(20, 4)), brute_limit=10
            )


class TestKcenterExact:
    @staticmethod
    def _reference(ids, vecs, k, q=10**6):
        from docstrange_ray.ops.kmeans import quantize_vec

        qm = quantize_vec(np.asarray(vecs, dtype=np.float32).astype(np.float64), q)
        by_id = dict(zip(ids, qm))
        sel = [min(ids)]
        out = [(0, sel[0], -1)]
        for j in range(1, min(k, len(ids))):
            best = None
            for i in sorted(ids):
                if i in sel:
                    continue
                d2 = min(
                    int(sum((int(a) - int(b)) ** 2
                            for a, b in zip(by_id[i], by_id[c])))
                    for c in sel
                )
                if best is None or d2 > best[1]:
                    best = (i, d2)
            out.append((j, best[0], best[1]))
            sel.append(best[0])
        return out

    def _ds(self, ids, vecs, parts=4):
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table(
                {"vec_id": pa.array(ids, pa.int64()),
                 "embedding": pa.array([list(map(float, v)) for v in vecs],
                                       pa.list_(pa.float32()))}
            )
        ).repartition(parts)

    def test_equals_reference(self):
        from docstrange_ray.ops.semantic import kcenter_select_exact

        rng = np.random.RandomState(4)
        vecs = rng.randn(30, 5)
        ids = list(range(30))
        want = self._reference(ids, vecs, k=6)
        got = kcenter_select_exact(self._ds(ids, vecs), k=6)
        assert (
            list(zip(got["sel_order"].astype(int), got["id"].astype(int),
                     got["d2"].astype(int)))
            == want
        )

    def test_partition_invariance(self):
        from docstrange_ray.ops.semantic import kcenter_select_exact

        rng = np.random.RandomState(6)
        vecs = rng.randn(40, 4)
        ids = list(range(40))
        a = kcenter_select_exact(self._ds(ids, vecs, parts=1), k=5)
        b = kcenter_select_exact(self._ds(ids, vecs, parts=9), k=5)
        pd.testing.assert_frame_equal(a, b)

    def test_coincident_points_no_repick(self):
        from docstrange_ray.ops.semantic import kcenter_select_exact

        vecs = [[1.0, 2.0]] * 5
        got = kcenter_select_exact(self._ds(list(range(5)), vecs), k=3)
        assert list(got["id"].astype(int)) == [0, 1, 2]
        assert list(got["d2"].astype(int)) == [-1, 0, 0]
