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

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_personalized_equals_reference(self, plan):
        """PPR (teleport seeds): jump/dangling mass on seeds only —
        independent dict/loop mirror of the floor-integer semantics."""
        from docstrange_ray.ops.graph import pagerank

        edges = _random_edges(11)
        seeds = sorted({s for s, _ in edges} | {d for _, d in edges})[:3]
        scale = 10**12
        es = sorted(set(edges))
        nodes = sorted({s for s, _ in es} | {d for _, d in es})
        S = set(seeds)
        ns = len(S)
        outdeg = {v: 0 for v in nodes}
        for s, _ in es:
            outdeg[s] += 1
        r = {v: (scale // ns if v in S else 0) for v in nodes}
        for _ in range(5):
            dang = sum(r[v] for v in nodes if outdeg[v] == 0)
            dsh = dang // ns
            insum = {v: 0 for v in nodes}
            for s, d in es:
                insum[d] += r[s] // outdeg[s]
            r = {
                v: (15 * scale // (100 * ns) if v in S else 0)
                + 85 * (insum[v] + (dsh if v in S else 0)) // 100
                for v in nodes
            }
        got = {
            row["node"]: row["rank"]
            for row in pagerank(
                _edge_ds(edges), iterations=5, plan=plan, teleport=seeds
            ).take_all()
        }
        assert got == r

    def test_personalized_mass_concentrates_near_seeds(self):
        """Two disjoint directed cycles; seeding one cycle must leave
        the other with zero rank (no uniform jump leaks across)."""
        from docstrange_ray.ops.graph import pagerank

        edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)]
        ranks = {
            row["node"]: row["rank"]
            for row in pagerank(
                _edge_ds(edges), iterations=5, teleport=[1]
            ).take_all()
        }
        assert all(ranks[v] > 0 for v in (1, 2, 3))
        assert all(ranks[v] == 0 for v in (10, 11, 12))

    def test_personalized_empty_seeds_raises(self):
        from docstrange_ray.ops.graph import pagerank

        with pytest.raises(ValueError):
            pagerank(_edge_ds([(1, 2)]), teleport=[])

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_hits_equals_reference(self, plan):
        """HITS max-rescaled integer power iteration vs an independent
        dict/loop mirror; both plans bit-identical."""
        from docstrange_ray.ops.graph import hits

        rng = np.random.RandomState(5)
        edges = sorted(
            {
                (int(a), int(b))
                for a, b in zip(
                    rng.randint(0, 15, 60), rng.randint(100, 112, 60)
                )
            }
        )
        S = 10**9
        h = {v: S for v in sorted({a for a, _ in edges})}
        a: dict = {}
        for _ in range(3):
            araw: dict = {}
            for s, d in edges:
                araw[d] = araw.get(d, 0) + h[s]
            am = max(araw.values())
            a = {v: val * S // am for v, val in araw.items()}
            hraw: dict = {}
            for s, d in edges:
                hraw[s] = hraw.get(s, 0) + a[d]
            hm = max(hraw.values())
            h = {v: val * S // hm for v, val in hraw.items()}
        rows = hits(_edge_ds(edges), iterations=3, plan=plan).take_all()
        got_h = {r["node"]: r["score"] for r in rows if r["kind"] == "hub"}
        got_a = {
            r["node"]: r["score"] for r in rows if r["kind"] == "authority"
        }
        assert got_h == h and got_a == a

    def test_hits_star_authority_dominates(self):
        """Every hub points at node 99 plus one private sink: 99 must
        be the max-score authority (exactly scale), privates below."""
        from docstrange_ray.ops.graph import hits

        edges = [(i, 99) for i in range(1, 6)] + [
            (i, 200 + i) for i in range(1, 6)
        ]
        rows = hits(_edge_ds(edges), iterations=2).take_all()
        auth = {r["node"]: r["score"] for r in rows if r["kind"] == "authority"}
        assert auth[99] == 10**9
        assert all(auth[200 + i] < auth[99] for i in range(1, 6))

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


def _tri_reference(edges):
    """Independent set/dict triangle counter: per-node triangle counts,
    degrees and clustering over the distinct undirected simple graph."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b in und:
        for c in adj[a] & adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    tri = {v: t // 3 for v, t in tri.items()}  # each tri seen via 3 edges
    out = {}
    for v in adj:
        d = len(adj[v])
        cl = 0.0 if d < 2 else 2.0 * tri[v] / (d * (d - 1))
        out[v] = (d, tri[v], round(cl, 6))
    return out


def _bfs_reference(edges, seeds, max_hops):
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    lvl = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in lvl:
                    nxt.add(v)
        for v in nxt:
            lvl[v] = h
        frontier = nxt
    return lvl


class TestTriangles:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.graph import triangle_stats

        edges = _random_edges(11, n_nodes=25, n_edges=120)
        ref = _tri_reference(edges)
        got = {
            r["node"]: (r["deg"], r["triangles"], r["clustering"])
            for r in triangle_stats(_edge_ds(edges), plan=plan).take_all()
        }
        assert got == ref

    def test_plans_bit_identical(self):
        from docstrange_ray.ops.graph import triangle_stats

        edges = _random_edges(23, n_nodes=40, n_edges=200)
        a = sorted(
            map(tuple, (
                (r["node"], r["deg"], r["triangles"], r["clustering"])
                for r in triangle_stats(_edge_ds(edges), plan="broadcast").take_all()
            ))
        )
        b = sorted(
            map(tuple, (
                (r["node"], r["deg"], r["triangles"], r["clustering"])
                for r in triangle_stats(_edge_ds(edges), plan="join").take_all()
            ))
        )
        assert a == b

    def test_hot_node_star_has_no_triangles(self):
        # a star (hot hub) has zero triangles; after degree orientation
        # the hub (highest degree) has OUT-degree 0, so the wedge
        # explode never enumerates the hub's C(n,2) neighbor pairs
        from docstrange_ray.ops.graph import triangle_stats

        edges = [(0, i) for i in range(1, 60)]
        res = {r["node"]: r["triangles"] for r in
               triangle_stats(_edge_ds(edges)).take_all()}
        assert all(t == 0 for t in res.values())
        # plus one closing edge -> exactly one triangle, on all 3 nodes
        res2 = {r["node"]: r["triangles"] for r in
                triangle_stats(_edge_ds(edges + [(1, 2)])).take_all()}
        assert res2[0] == 1 and res2[1] == 1 and res2[2] == 1
        assert sum(res2.values()) == 3

    def test_duplicate_and_reversed_edges_collapse(self):
        from docstrange_ray.ops.graph import triangle_stats

        tri = [(1, 2), (2, 3), (3, 1)]
        noisy = tri + [(b, a) for a, b in tri] + tri + [(1, 1)]
        res = {r["node"]: (r["deg"], r["triangles"]) for r in
               triangle_stats(_edge_ds(noisy)).take_all()}
        assert res == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


class TestBfsLevels:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.graph import bfs_levels

        edges = _random_edges(7, n_nodes=30, n_edges=90)
        seeds = [0, 1]
        ref = _bfs_reference(edges, seeds, 4)
        got = {
            r["node"]: r["level"]
            for r in bfs_levels(_edge_ds(edges), seeds, max_hops=4, plan=plan).take_all()
        }
        assert got == ref

    def test_directed_chain_levels(self):
        from docstrange_ray.ops.graph import bfs_levels

        chain = [(i, i + 1) for i in range(6)]
        got = {
            r["node"]: r["level"]
            for r in bfs_levels(_edge_ds(chain), [0], max_hops=3).take_all()
        }
        # cap respected: nodes past 3 hops are NOT reached
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_min_level_wins_on_multiple_paths(self):
        from docstrange_ray.ops.graph import bfs_levels

        edges = [(0, 1), (1, 2), (0, 2)]  # 2 reachable at hop 1 and 2
        got = {
            r["node"]: r["level"]
            for r in bfs_levels(_edge_ds(edges), [0], max_hops=4).take_all()
        }
        assert got == {0: 0, 1: 1, 2: 1}

    def test_plans_bit_identical(self):
        from docstrange_ray.ops.graph import bfs_levels

        edges = _random_edges(31, n_nodes=35, n_edges=100)
        a = sorted(
            (r["node"], r["level"])
            for r in bfs_levels(_edge_ds(edges), [3], max_hops=4, plan="broadcast").take_all()
        )
        b = sorted(
            (r["node"], r["level"])
            for r in bfs_levels(_edge_ds(edges), [3], max_hops=4, plan="join").take_all()
        )
        assert a == b


def _kcore_reference(edges, k):
    """Independent set/dict peeling loop."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items()}


class TestKCore:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.graph import k_core

        edges = _random_edges(17, n_nodes=30, n_edges=120)
        ref = _kcore_reference(edges, 3)
        got = {
            r["node"]: r["deg"]
            for r in k_core(_edge_ds(edges), 3, plan=plan).take_all()
        }
        assert got == ref

    def test_plans_bit_identical(self):
        from docstrange_ray.ops.graph import k_core

        edges = _random_edges(29, n_nodes=40, n_edges=160)
        a = sorted(
            (r["node"], r["deg"])
            for r in k_core(_edge_ds(edges), 4, plan="broadcast").take_all()
        )
        b = sorted(
            (r["node"], r["deg"])
            for r in k_core(_edge_ds(edges), 4, plan="join").take_all()
        )
        assert a == b

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_clique_with_pendant_tail(self, plan):
        from docstrange_ray.ops.graph import k_core

        # K5 plus a path hanging off it: the 4-core is exactly the K5 —
        # the path peels away over MULTIPLE rounds (each round exposes
        # the next tail node), exercising the fixpoint loop
        clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        tail = [(4, 10), (10, 11), (11, 12)]
        got = {
            r["node"]: r["deg"]
            for r in k_core(_edge_ds(clique + tail), 4, plan=plan).take_all()
        }
        assert got == {v: 4 for v in range(5)}

    def test_star_has_empty_2core(self):
        from docstrange_ray.ops.graph import k_core

        star = [(0, i) for i in range(1, 20)]
        assert k_core(_edge_ds(star), 2).take_all() == []


class TestConnectedComponents:
    @staticmethod
    def _uf_reference(edges):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
        return {x: find(x) for x in parent}

    @staticmethod
    def _run(edges):
        import pyarrow as pa
        import ray.data

        from docstrange_ray.ops.graph import connected_components

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        ).repartition(5)
        return {
            r["node"]: r["component"]
            for r in connected_components(ds).take_all()
        }

    def test_long_path_graph(self, ray_session):
        # diameter 400: plain min-label propagation would need ~400
        # rounds; large-star/small-star collapses it in O(log^2 n)
        edges = [(i, i + 1) for i in range(400)]
        got = self._run(edges)
        assert got == {i: 0 for i in range(401)}

    def test_random_graph_vs_union_find(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(9)
        edges = [tuple(map(int, e)) for e in rng.integers(0, 300, (250, 2))]
        edges = [e for e in edges if e[0] != e[1]]
        assert self._run(edges) == self._uf_reference(edges)

    def test_two_components_and_dups(self, ray_session):
        edges = [(1, 2), (2, 3), (2, 3), (3, 1), (10, 11), (11, 10)]
        assert self._run(edges) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_star_already_converged(self, ray_session):
        edges = [(0, i) for i in range(1, 50)]
        assert self._run(edges) == {i: 0 for i in range(50)}


class TestLinkPredictions:
    @staticmethod
    def _reference(uedges, min_cn=1, cap=None, scale=10**6):
        """Independent dict/loop Adamic-Adar (no shared code)."""
        import math
        from collections import defaultdict

        adj = defaultdict(set)
        for a, b in uedges:
            adj[a].add(b)
            adj[b].add(a)
        cn = defaultdict(int)
        aa = defaultdict(int)
        for ctr, nbrs in adj.items():
            d = len(nbrs)
            if d < 2 or (cap is not None and d > cap):
                continue
            w = math.floor(scale / math.log(d) + 0.5)
            ns = sorted(nbrs)
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    cn[(ns[i], ns[j])] += 1
                    aa[(ns[i], ns[j])] += w
        eset = {tuple(sorted(e)) for e in uedges}
        return {
            p: (cn[p], aa[p])
            for p in cn
            if p not in eset and cn[p] >= min_cn
        }

    @staticmethod
    def _run(uedges, parts=3, **kw):
        from docstrange_ray.ops.graph import link_predictions

        tbl = pa.table(
            {
                "a": pa.array([a for a, _ in uedges], pa.int64()),
                "b": pa.array([b for _, b in uedges], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(parts)
        rows = link_predictions(ds, **kw).take_all()
        return {(r["a"], r["b"]): (r["cn"], r["aa_micro"]) for r in rows}

    def test_equals_reference_random(self):
        rng = np.random.default_rng(5)
        uedges = sorted(
            {
                (int(min(a, b)), int(max(a, b)))
                for a, b in rng.integers(0, 40, (300, 2))
                if a != b
            }
        )
        assert self._run(uedges) == self._reference(uedges)

    def test_min_cn_filters(self):
        uedges = [(1, 2), (1, 3), (2, 4), (3, 4), (1, 5)]
        got = self._run(uedges, min_cn=2)
        exp = self._reference(uedges, min_cn=2)
        assert got == exp
        assert all(v[0] >= 2 for v in got.values())

    def test_existing_edges_excluded(self):
        # triangle: every pair shares a neighbor but all pairs ARE edges
        assert self._run([(1, 2), (2, 3), (1, 3)]) == {}

    def test_hub_demotion_deterministic(self):
        # star hub of degree 6 + one small wedge; cap=5 demotes the hub
        uedges = [(0, i) for i in range(1, 7)] + [(10, 11), (11, 12)]
        capped = self._run(uedges, max_center_degree=5)
        assert capped == self._reference(uedges, cap=5)
        assert (10, 12) in capped
        assert all(a != 0 and b != 0 or (a, b) == (10, 12) for a, b in capped)
        full = self._run(uedges)
        assert len(full) > len(capped)


class TestSsspBounded:
    @staticmethod
    def _reference(wedges, seeds, max_hops):
        """Independent Bellman-Ford on dicts: min cost over <= h-hop
        paths (no shared code with the distributed plans)."""
        dist = {s: 0 for s in seeds}
        for _ in range(max_hops):
            nxt = dict(dist)
            for s, d, w in wedges:
                if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                    nxt[d] = dist[s] + w
            dist = nxt
        return dist

    @staticmethod
    def _wedge_ds(wedges, parts=3):
        tbl = pa.table(
            {
                "src": pa.array([s for s, _, _ in wedges], pa.int64()),
                "dst": pa.array([d for _, d, _ in wedges], pa.int64()),
                "w": pa.array([w for _, _, w in wedges], pa.int64()),
            }
        )
        return ray.data.from_arrow(tbl).repartition(parts)

    def _random_wedges(self, seed, n_nodes=25, n_edges=70, max_w=9):
        rng = np.random.RandomState(seed)
        return [
            (
                int(rng.randint(0, n_nodes)),
                int(rng.randint(0, n_nodes)),
                int(rng.randint(1, max_w + 1)),
            )
            for _ in range(n_edges)
        ]

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.graph import sssp_bounded

        wedges = [(1, 2, 5), (2, 3, 1), (1, 3, 10), (3, 4, 2), (4, 1, 1),
                  (5, 1, 2), (1, 6, 7), (6, 2, 1)]
        seeds = [1, 5]
        want = self._reference(wedges, seeds, 4)
        got = {
            int(r["node"]): int(r["dist"])
            for r in sssp_bounded(
                self._wedge_ds(wedges), seeds, max_hops=4, plan=plan
            ).take_all()
        }
        assert got == want

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_graphs_both_plans(self, seed):
        from docstrange_ray.ops.graph import sssp_bounded

        wedges = self._random_wedges(seed)
        seeds = [0, 1]
        want = self._reference(wedges, seeds, 3)
        for plan in ("broadcast", "join"):
            got = {
                int(r["node"]): int(r["dist"])
                for r in sssp_bounded(
                    self._wedge_ds(wedges), seeds, max_hops=3, plan=plan
                ).take_all()
            }
            assert got == want, plan

    def test_hop_bound_matters(self):
        # a cheap long path beyond the hop bound must NOT win
        from docstrange_ray.ops.graph import sssp_bounded

        wedges = [(0, 9, 100)] + [(i, i + 1, 1) for i in range(9)]
        got2 = {
            int(r["node"]): int(r["dist"])
            for r in sssp_bounded(self._wedge_ds(wedges), [0], max_hops=2).take_all()
        }
        assert got2[9] == 100  # direct edge; 9-hop path invisible at h=2
        got9 = {
            int(r["node"]): int(r["dist"])
            for r in sssp_bounded(self._wedge_ds(wedges), [0], max_hops=9).take_all()
        }
        assert got9[9] == 9

    def test_negative_weight_rejected(self):
        from docstrange_ray.ops.graph import sssp_bounded

        with pytest.raises(Exception):
            sssp_bounded(self._wedge_ds([(0, 1, -1)]), [0], max_hops=2).take_all()

    def test_empty_seeds(self):
        from docstrange_ray.ops.graph import sssp_bounded

        assert sssp_bounded(self._wedge_ds([(0, 1, 1)]), [], max_hops=2).count() == 0


class TestDegreeAssortativity:
    @staticmethod
    def _reference(edges):
        """Independent dict/loop Newman r over the distinct undirected
        simple graph (stub-based Pearson; no shared code)."""
        ue = sorted(
            {(min(a, b), max(a, b)) for a, b in edges if a != b}
        )
        deg = {}
        for a, b in ue:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        m = len(ue)
        p = sum(deg[a] * deg[b] for a, b in ue)
        s1 = sum(deg[a] + deg[b] for a, b in ue)
        s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in ue)
        num = 4.0 * m * p - float(s1) * s1
        den = 2.0 * m * s2 - float(s1) * s1
        from docstrange_ray.numerics import round6

        r = None if den == 0.0 else float(round6(num / den))
        return m, p, s1, s2, r

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.graph import degree_assortativity

        edges = _random_edges(3, n_nodes=20, n_edges=60)
        edges = [(a, b) for a, b in edges if a != b]
        m, p, s1, s2, r = self._reference(edges)
        row = degree_assortativity(_edge_ds(edges), plan=plan).take_all()[0]
        assert (
            int(row["m_edges"]), int(row["sum_jk"]),
            int(row["sum_j_plus_k"]), int(row["sum_j2_k2"]),
        ) == (m, p, s1, s2)
        assert row["assortativity"] == pytest.approx(r, abs=0)

    def test_star_graph_disassortative(self):
        from docstrange_ray.ops.graph import degree_assortativity

        edges = [(0, i) for i in range(1, 8)]
        row = degree_assortativity(_edge_ds(edges)).take_all()[0]
        assert row["assortativity"] == -1.0

    def test_regular_graph_none(self):
        from docstrange_ray.ops.graph import degree_assortativity

        # 4-cycle: every degree 2 -> zero denominator -> None
        edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
        row = degree_assortativity(_edge_ds(edges)).take_all()[0]
        import math

        assert row["assortativity"] is None or math.isnan(row["assortativity"])


class TestWeightedPagerank:
    @staticmethod
    def _reference(wedges, iterations=5, scale=10**12):
        """Independent dict/loop weighted-pagerank reference:
        contribution = rank * w // out_weight."""
        wedges = sorted(wedges)
        nodes = sorted({s for s, _, _ in wedges} | {d for _, d, _ in wedges})
        n = len(nodes)
        outw = {v: 0 for v in nodes}
        for s, _, w in wedges:
            outw[s] += w
        t0 = 15 * scale // (100 * n)
        r = {v: scale // n for v in nodes}
        for _ in range(iterations):
            dang = sum(r[v] for v in nodes if outw[v] == 0)
            dshare = dang // n
            insum = {v: 0 for v in nodes}
            for s, d, w in wedges:
                insum[d] += r[s] * w // outw[s]
            r = {v: t0 + 85 * (insum[v] + dshare) // 100 for v in nodes}
        return r

    @staticmethod
    def _wedge_ds(wedges, parts=3):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([s for s, _, _ in wedges], pa.int64()),
                    "dst": pa.array([d for _, d, _ in wedges], pa.int64()),
                    "w": pa.array([w for _, _, w in wedges], pa.int64()),
                }
            )
        ).repartition(parts)

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.graph import pagerank

        wedges = [(1, 2, 3), (2, 3, 1), (3, 1, 7), (4, 1, 2), (1, 3, 5),
                  (5, 1, 1), (2, 4, 4)]
        want = self._reference(wedges)
        got = {
            int(r["node"]): int(r["rank"])
            for r in pagerank(
                self._wedge_ds(wedges), plan=plan,
                assume_distinct=True, weighted=True,
            ).take_all()
        }
        assert got == want

    def test_uniform_weights_equal_unweighted(self):
        from docstrange_ray.ops.graph import pagerank

        edges = [(1, 2), (2, 3), (3, 1), (4, 1)]
        un = {
            int(r["node"]): int(r["rank"])
            for r in pagerank(_edge_ds(edges), assume_distinct=True).take_all()
        }
        wt = {
            int(r["node"]): int(r["rank"])
            for r in pagerank(
                self._wedge_ds([(s, d, 1) for s, d in edges]),
                assume_distinct=True, weighted=True,
            ).take_all()
        }
        assert un == wt

    def test_requires_assume_distinct(self):
        from docstrange_ray.ops.graph import pagerank

        with pytest.raises(ValueError):
            pagerank(self._wedge_ds([(1, 2, 1)]), weighted=True)

    def test_weight_bound_enforced(self):
        from docstrange_ray.ops.graph import pagerank

        with pytest.raises(Exception):
            pagerank(
                self._wedge_ds([(1, 2, 10**7)]),
                assume_distinct=True, weighted=True,
            ).take_all()
