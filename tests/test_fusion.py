"""Reciprocal-rank fusion (ops/fusion.py): exact float parity with the
left-associated reference sum, missing-candidate semantics, single and
many-list shapes."""

import numpy as np
import pyarrow as pa
import ray.data

from docstrange_ray.ops.fusion import rrf_fuse


def _ds(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([p[0] for p in pairs], pa.int64()),
                "rank": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    ).repartition(4)


class TestRRF:
    def test_matches_reference_bitexact(self, ray_session):
        rng = np.random.default_rng(0)
        ids = list(range(120))
        lists = []
        for j in range(3):
            perm = rng.permutation(ids)
            lists.append([(int(d), r + 1) for r, d in enumerate(perm)])
        got = {
            r["doc_id"]: r["rrf"]
            for r in rrf_fuse([_ds(l) for l in lists]).take_all()
        }
        for d in ids:
            acc = 0.0
            for l in lists:  # left-associated, list order — the contract
                rank = dict(l)[d]
                acc = acc + 1.0 / (60 + rank)
            assert got[d] == acc, d

    def test_missing_candidates_contribute_zero(self, ray_session):
        a = [(1, 1), (2, 2), (3, 3)]
        b = [(2, 1)]  # docs 1 and 3 absent from ranking b
        got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([_ds(a), _ds(b)]).take_all()}
        assert got[1] == 1.0 / 61
        assert got[2] == 1.0 / 62 + 1.0 / 61
        assert got[3] == 1.0 / 63

    def test_single_list_is_reciprocal(self, ray_session):
        got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([_ds([(7, 4)])]).take_all()}
        assert got == {7: 1.0 / 64}
