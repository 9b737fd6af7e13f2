"""Source interleaving (sampling.interleave_by_source): closed-form
position math pinned against an independent brute-force global sort,
permutation/rate properties, skew safety, weight validation."""

import hashlib
import math

import pyarrow as pa
import pytest
import ray.data

from docstrange_ray.ops.sampling import interleave_by_source


def _brute_order(rows, weights):
    """Independent reference: materialize every (key, source, r) and
    sort — the semantics the distributed op must reproduce. The
    within-source key is the 52-bit md5 PREFIX (then id) — the op's
    documented contract; full-hex ordering would diverge on a
    13-hex-char prefix collision."""
    big_l = math.lcm(*weights.values())
    per_src = {}
    for doc_id, src in rows:
        per_src.setdefault(src, []).append(doc_id)
    entries = []
    for src, ids in per_src.items():
        ids.sort(
            key=lambda i: (
                int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16),
                i,
            )
        )
        m = big_l // weights[src]
        for r, doc_id in enumerate(ids, 1):
            entries.append((r * m, src, r, doc_id))
    entries.sort()
    return {doc_id: pos for pos, (_, _, _, doc_id) in enumerate(entries, 1)}


def _run(rows, weights, **kw):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows]),
            }
        )
    ).repartition(6)
    out = interleave_by_source(ds, weights, **kw).take_all()
    return {r["doc_id"]: r["pos"] for r in out}


class TestInterleave:
    def test_matches_brute_reference(self, ray_session):
        rows = [(i, f"s{i % 3}") for i in range(300)]
        weights = {"s0": 1, "s1": 2, "s2": 3}
        assert _run(rows, weights) == _brute_order(rows, weights)

    def test_is_permutation_and_rate(self, ray_session):
        rows = [(i, "a" if i % 5 else "b") for i in range(500)]
        weights = {"a": 3, "b": 1}
        got = _run(rows, weights)
        assert sorted(got.values()) == list(range(1, 501))
        # rate property: in the first quarter of the epoch, source 'a'
        # (weight 3, 80% of rows) appears at >= 3x source 'b''s rate
        first = {d for d, p in got.items() if p <= 125}
        a_cnt = sum(1 for d in first if d % 5)
        assert a_cnt >= 3 * (len(first) - a_cnt) - 3

    def test_hot_source_skew(self, ray_session):
        # 95% of rows in one source: md5 bucketing keeps blocks balanced
        rows = [(i, "hot" if i % 20 else "cold") for i in range(400)]
        weights = {"hot": 2, "cold": 5}
        assert _run(rows, weights) == _brute_order(rows, weights)

    def test_missing_weight_raises(self, ray_session):
        rows = [(1, "a"), (2, "zzz")]
        with pytest.raises(ValueError, match="zzz"):
            _run(rows, {"a": 1})

    def test_bad_weight_raises(self, ray_session):
        with pytest.raises(ValueError, match="positive"):
            _run([(1, "a")], {"a": 0})


class TestReviewFixes:
    def test_float_integer_weights_accepted(self, ray_session):
        rows = [(i, "a" if i % 2 else "b") for i in range(40)]
        got_f = _run(rows, {"a": 2.0, "b": 1})
        got_i = _run(rows, {"a": 2, "b": 1})
        assert got_f == got_i

    def test_empty_dataset(self, ray_session):
        import pyarrow as pa
        import ray.data

        from docstrange_ray.ops.sampling import interleave_by_source

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                }
            )
        )
        assert interleave_by_source(ds, {"a": 1}).take_all() == []
