"""Fixed-point integer PageRank (ops/graph.py): plan parity + an
independent pure-Python reference + structural properties."""

import numpy as np
import pyarrow as pa
import pytest

import ray


pytestmark = pytest.mark.usefixtures("ray_session")


def _reference(edges, iterations=5, scale=10**12):
    """Independent dict/loop implementation of the module's exact
    integer semantics (no shared code with the distributed plans)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    t0 = 15 * scale // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if outdeg[v] == 0)
        dshare = dang // n
        insum = {v: 0 for v in nodes}
        for s, d in edges:
            insum[d] += r[s] // outdeg[s]
        r = {v: t0 + 85 * (insum[v] + dshare) // 100 for v in nodes}
    return r


def _edge_ds(edges, parts=3):
    tbl = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.int64()),
            "dst": pa.array([d for _, d in edges], pa.int64()),
        }
    )
    return ray.data.from_arrow(tbl).repartition(parts)


def _random_edges(seed, n_nodes=30, n_edges=80):
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(0, n_nodes)), int(rng.randint(0, n_nodes)))
        for _ in range(n_edges)
        if True
    ]


class TestPagerank:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.graph import pagerank

        edges = [(1, 2), (2, 3), (3, 1), (4, 1), (5, 1), (1, 6)]
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edge_ds(edges), iterations=5, plan=plan).take_all()
        }
        assert got == _reference(edges)

    def test_plans_bit_identical_random(self):
        from docstrange_ray.ops.graph import pagerank

        edges = _random_edges(7)
        ref = _reference(edges)
        for plan in ("broadcast", "join"):
            got = {
                r["node"]: r["rank"]
                for r in pagerank(
                    _edge_ds(edges, parts=4), iterations=5, plan=plan
                ).take_all()
            }
            assert got == ref, plan

    def test_duplicate_edges_collapse(self):
        from docstrange_ray.ops.graph import pagerank

        edges = [(1, 2), (1, 2), (1, 2), (2, 1)]
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edge_ds(edges), iterations=3).take_all()
        }
        assert got == _reference(edges, iterations=3)

    def test_dangling_sink_gains_mass(self):
        # star into a sink: the sink must outrank the spokes, and the
        # redistribution must keep total mass ~ scale (floor losses only)
        from docstrange_ray.ops.graph import pagerank

        edges = [(i, 99) for i in range(1, 8)]
        rows = pagerank(_edge_ds(edges), iterations=5).take_all()
        ranks = {r["node"]: r["rank"] for r in rows}
        assert ranks[99] > max(v for k, v in ranks.items() if k != 99)
        total = sum(ranks.values())
        scale = 10**12
        assert scale * 0.95 <= total <= scale  # floors only ever drop mass

    def test_auto_gate_picks_broadcast_small(self):
        from docstrange_ray.ops import graph

        edges = [(1, 2), (2, 3)]
        got = {
            r["node"]: r["rank"]
            for r in graph.pagerank(
                _edge_ds(edges), iterations=2, plan="auto"
            ).take_all()
        }
        assert got == _reference(edges, iterations=2)
