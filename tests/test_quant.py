"""int8 embedding quantization (ops/quant.py): error bound, midpoint
rounding (the half-away discipline), zero-vector path, distributed ==
sequential, DuckDB ROUND parity on the long form."""

import numpy as np
import pyarrow as pa
import ray.data

from docstrange_ray.ops.quant import (
    dequantize_batch,
    quantize_batch,
    quantize_embeddings,
)


class TestQuantKernel:
    def test_error_bound_and_range(self):
        rng = np.random.default_rng(0)
        mat = rng.normal(0, 3, (200, 32))
        codes, scale = quantize_batch(mat)
        assert codes.dtype == np.int8
        assert np.abs(codes.astype(int)).max() <= 127
        err = np.abs(dequantize_batch(codes, scale) - mat)
        assert (err <= scale[:, None] / 2 + 1e-12).all()

    def test_midpoint_rounds_half_away(self):
        # x*127/maxabs = 0.5 exactly: half-even would emit 0, SQL ROUND 1
        codes, scale = quantize_batch(np.array([[1.0, 254.0]]))
        assert codes.tolist() == [[1, 127]]
        assert scale[0] == 2.0

    def test_negative_midpoint(self):
        codes, _ = quantize_batch(np.array([[-1.0, 254.0]]))
        assert codes[0][0] == -1  # away from zero, not toward even

    def test_zero_vector(self):
        codes, scale = quantize_batch(np.zeros((1, 8)))
        assert scale[0] == 0.0 and codes.tolist() == [[0] * 8]

    def test_maxabs_element_is_exact(self):
        mat = np.random.default_rng(1).normal(0, 1, (50, 16))
        codes, scale = quantize_batch(mat)
        hit = np.abs(codes.astype(int)) == 127
        assert hit.any(axis=1).all()  # every vector's max maps to +/-127


class TestQuantDistributed:
    def test_matches_sequential(self, ray_session):
        rng = np.random.default_rng(2)
        mat = rng.normal(0, 1, (300, 12)).astype(np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(300), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in mat],
                        pa.list_(pa.float32()),
                    ),
                }
            )
        ).repartition(7)
        got = {
            r["vec_id"]: (list(r["codes"]), r["scale"])
            for r in quantize_embeddings(ds).take_all()
        }
        codes, scale = quantize_batch(mat.astype(np.float64))
        for i in range(300):
            assert got[i] == (codes[i].tolist(), scale[i]), i
