"""Z-order keys (ops/zorder.py): kernel vs pure-Python bit reference,
clamping, locality property, int64-bound validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from docstrange_ray.ops.zorder import morton_interleave, zorder_keys


def _ref(vals, bits):
    k = len(vals)
    out = 0
    for j, v in enumerate(vals):
        v = max(0, min(v, (1 << bits) - 1))
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * k + j)
    return out


class TestMorton:
    def test_matches_reference_2d(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 1 << 21, 500)
        y = rng.integers(0, 1 << 21, 500)
        got = morton_interleave([x, y], 21)
        for i in range(500):
            assert got[i] == _ref([int(x[i]), int(y[i])], 21)

    def test_matches_reference_3d(self):
        rng = np.random.default_rng(1)
        cols = [rng.integers(0, 1 << 10, 200) for _ in range(3)]
        got = morton_interleave(cols, 10)
        for i in range(200):
            assert got[i] == _ref([int(c[i]) for c in cols], 10)

    def test_clamps_out_of_range(self):
        got = morton_interleave(
            [np.array([-5, 1 << 30]), np.array([0, 0])], 8
        )
        assert got[0] == _ref([0, 0], 8)
        assert got[1] == _ref([255, 0], 8)

    def test_locality(self):
        # a 2x zkey-range window bounds BOTH dims (quadrant property):
        # keys in [q*4^b/4, (q+1)*4^b/4) share their top bit per dim
        x = np.arange(256)
        grid_x, grid_y = np.meshgrid(x, x)
        keys = morton_interleave([grid_x.ravel(), grid_y.ravel()], 8)
        top_quadrant = keys < (1 << 14)
        assert grid_x.ravel()[top_quadrant].max() < 128
        assert grid_y.ravel()[top_quadrant].max() < 128

    def test_bound_raises(self):
        with pytest.raises(ValueError, match="int64"):
            morton_interleave([np.array([1])] * 4, 16)


class TestZorderDataset:
    def test_scan(self, ray_session):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(100), pa.int64()),
                "a": pa.array([i * 7 % 64 for i in range(100)], pa.int64()),
                "b": pa.array([i * 13 % 64 for i in range(100)], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(5)
        got = {r["doc_id"]: r["zkey"] for r in zorder_keys(ds, ["a", "b"], 6).take_all()}
        for i in range(100):
            assert got[i] == _ref([i * 7 % 64, i * 13 % 64], 6)
