"""Poisson bootstrap (ops/bootstrap.py): weight distribution sanity,
determinism across parallelism, exactness vs a sequential reference,
replicate-mean dispersion behaves like a bootstrap."""

import numpy as np
import pyarrow as pa
import ray.data

from docstrange_ray.numerics import md5_key52, round6
from docstrange_ray.ops.bootstrap import (
    _CDF52,
    bootstrap_replicate_means,
    poisson_weight,
)


class TestWeights:
    def test_thresholds_monotone(self):
        assert list(_CDF52) == sorted(_CDF52)
        assert _CDF52[-1] < (1 << 52)

    def test_weight_distribution_close_to_poisson1(self):
        # exact CDF construction: P(w=0) and P(w=1) are both ~e^-1
        n = 200_000
        us = np.random.default_rng(0).integers(0, 1 << 52, n)
        ws = np.searchsorted(np.asarray(_CDF52), us, side="right")
        p0 = (ws == 0).mean()
        p1 = (ws == 1).mean()
        assert abs(p0 - np.exp(-1)) < 0.01
        assert abs(p1 - np.exp(-1)) < 0.01
        assert abs(ws.mean() - 1.0) < 0.01

    def test_poisson_weight_matches_searchsorted(self):
        for u in [0, _CDF52[0] - 1, _CDF52[0], _CDF52[3], (1 << 52) - 1]:
            assert poisson_weight(u) == int(
                np.searchsorted(np.asarray(_CDF52), u, side="right")
            )


class TestReplicateMeans:
    def _ds(self, n, parts):
        vals = (np.arange(n) * 17 % 997).astype(np.float64) / 4.0
        return ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(range(n), pa.int64()),
                    "v": pa.array(vals, pa.float64()),
                }
            )
        ).repartition(parts), vals

    def test_matches_sequential_reference_and_parallelism_invariant(
        self, ray_session
    ):
        n, reps = 300, 8
        ds, vals = self._ds(n, 6)
        got = bootstrap_replicate_means(ds, "k", "v", replicates=reps)
        cents = np.round(vals * 100).astype(np.int64)
        for r in range(reps):
            ws = np.array([poisson_weight(md5_key52(f"{k}:{r}")) for k in range(n)])
            sw, swc = int(ws.sum()), int((ws * cents).sum())
            row = got[got["rep"] == r].iloc[0]
            assert row["n_eff"] == sw
            assert row["mean_cents"] == float(round6(np.float64(swc) / sw))
        ds2, _ = self._ds(n, 13)
        got2 = bootstrap_replicate_means(ds2, "k", "v", replicates=reps)
        assert got.equals(got2)

    def test_replicate_means_scatter_around_truth(self, ray_session):
        ds, vals = self._ds(2000, 8)
        got = bootstrap_replicate_means(ds, "k", "v", replicates=16)
        truth = np.round(vals * 100).mean()
        m = got["mean_cents"].to_numpy()
        assert abs(m.mean() - truth) < truth * 0.05
        assert m.std() > 0  # replicates genuinely vary
