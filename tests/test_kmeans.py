"""Exact-integer k-means (ops/kmeans.py): independent loop reference,
partition invariance, trunc-division pin, empty-cluster retention."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from docstrange_ray.ops.kmeans import kmeans_quantized, quantize_vec

pytestmark = pytest.mark.usefixtures("ray_session")


def _md5_key52(x):
    return int(hashlib.md5(str(x).encode()).hexdigest()[:13], 16)


def _reference(ids, vecs, k, iterations, q=10**6):
    """Independent pure-loop implementation of the module contract."""
    qv = {}
    for i, v in zip(ids, vecs):
        arr = []
        for x in v:
            xs = float(np.float64(x)) * q
            arr.append(int(np.sign(xs) * np.floor(abs(xs) + 0.5)))
        qv[i] = arr
    order = sorted(ids, key=lambda i: (_md5_key52(i), i))
    cents = [list(qv[i]) for i in order[:k]]

    def assign(vid):
        best, bd = None, None
        for ci, c in enumerate(cents):
            d = sum((a - b) ** 2 for a, b in zip(qv[vid], c))
            if bd is None or d < bd:
                best, bd = ci, d
        return best, bd

    for _ in range(iterations):
        groups = {}
        for i in ids:
            c, _ = assign(i)
            groups.setdefault(c, []).append(i)
        for c in range(len(cents)):
            mem = groups.get(c)
            if not mem:
                continue
            dim = len(cents[c])
            newc = []
            for d in range(dim):
                s = sum(qv[i][d] for i in mem)
                t = abs(s) // len(mem)
                newc.append(t if s >= 0 else -t)
            cents[c] = newc
    return {i: assign(i) for i in ids}


def _ds(ids, vecs, parts=4):
    return ray.data.from_arrow(
        pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "embedding": pa.array([list(map(float, v)) for v in vecs],
                                   pa.list_(pa.float32()))}
        )
    ).repartition(parts)


class TestKmeans:
    def test_equals_reference(self):
        rng = np.random.RandomState(5)
        ids = list(range(60))
        vecs = rng.randn(60, 6).astype(np.float32)
        want = _reference(ids, vecs, k=4, iterations=2)
        got = {
            int(r["vec_id"]): (int(r["cluster"]), int(r["d2"]))
            for r in kmeans_quantized(_ds(ids, vecs), k=4, iterations=2).take_all()
        }
        assert got == want

    def test_partition_invariance(self):
        rng = np.random.RandomState(9)
        ids = list(range(80))
        vecs = rng.randn(80, 5).astype(np.float32)
        a = sorted(
            (int(r["vec_id"]), int(r["cluster"]), int(r["d2"]))
            for r in kmeans_quantized(_ds(ids, vecs, parts=1), k=5).take_all()
        )
        b = sorted(
            (int(r["vec_id"]), int(r["cluster"]), int(r["d2"]))
            for r in kmeans_quantized(_ds(ids, vecs, parts=7), k=5).take_all()
        )
        assert a == b

    def test_trunc_division_matches_duckdb(self):
        import duckdb

        from docstrange_ray.ops.kmeans import _trunc_div

        con = duckdb.connect()
        for s, n in [(-7, 2), (7, 2), (-9, 4), (9, 4), (0, 3), (-1, 5)]:
            want = con.execute(
                f"select CAST({s} AS BIGINT) // CAST({n} AS BIGINT)"
            ).fetchone()[0]
            assert _trunc_div(np.array([s]), n)[0] == want, (s, n)

    def test_separated_clusters_recovered(self):
        # two tight blobs -> 2-means must split them exactly
        rng = np.random.RandomState(1)
        a = rng.randn(30, 4) * 0.01 + 5.0
        b = rng.randn(30, 4) * 0.01 - 5.0
        vecs = np.vstack([a, b]).astype(np.float32)
        ids = list(range(60))
        got = {
            int(r["vec_id"]): int(r["cluster"])
            for r in kmeans_quantized(_ds(ids, vecs), k=2, iterations=3).take_all()
        }
        blob_a = {got[i] for i in range(30)}
        blob_b = {got[i] for i in range(30, 60)}
        assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b

    def test_quantize_vec_half_away(self):
        assert quantize_vec(np.array([1.5e-6]))[0] == 2
        assert quantize_vec(np.array([-1.5e-6]))[0] == -2
        assert quantize_vec(np.array([0.0]))[0] == 0
