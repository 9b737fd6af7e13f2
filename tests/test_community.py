"""Community / walks / centrality operators (ops/community.py): plan
parity (broadcast vs join) against independent pure-Python references
(dict/loop re-derivations sharing no code with the distributed plans),
plus the Feather/ORC source-sink round trips (io.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray

from docstrange_ray.numerics import md5_key52, round6


pytestmark = pytest.mark.usefixtures("ray_session")


def _edge_ds(edges, parts=3):
    tbl = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.int64()),
            "dst": pa.array([d for _, d in edges], pa.int64()),
        }
    )
    return ray.data.from_arrow(tbl).repartition(parts)


def _ref_graph(edges):
    ue = {
        (min(s, d), max(s, d)) for s, d in edges if s != d
    }
    adj: dict[int, set] = {}
    for a, b in ue:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return ue, adj


def _random_edges(seed, n_nodes=30, n_edges=80):
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(0, n_nodes)), int(rng.randint(0, n_nodes)))
        for _ in range(n_edges)
    ]


def _lpa_ref(adj, rounds):
    lab = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            cnt: dict[int, int] = {}
            for n in adj[v]:
                cnt[lab[n]] = cnt.get(lab[n], 0) + 1
            new[v] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lab = new
    return lab


class TestLabelPropagation:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.community import label_propagation

        edges = _random_edges(3)
        _, adj = _ref_graph(edges)
        got = {
            int(r["node"]): int(r["label"])
            for r in label_propagation(
                _edge_ds(edges), rounds=3, plan=plan
            ).take_all()
        }
        assert got == _lpa_ref(adj, 3)

    def test_two_cliques_converge(self):
        """Two triangles joined by one bridge edge: LPA keeps them as
        two communities (each triangle's min node wins its side)."""
        from docstrange_ray.ops.community import label_propagation

        edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
        got = {
            int(r["node"]): int(r["label"])
            for r in label_propagation(_edge_ds(edges), rounds=4).take_all()
        }
        assert len({got[0], got[1]} | {got[10], got[11]}) >= 2
        assert got[0] == got[1] and got[10] == got[11]

    def test_empty(self):
        from docstrange_ray.ops.community import label_propagation

        assert label_propagation(_edge_ds([(5, 5)])).count() == 0

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_weighted_votes(self, plan):
        """Node 2 has TWO unit-weight neighbors labeled {0, 1} but one
        weight-5 neighbor labeled 9: weighted LPA must elect 9 where
        unweighted elects min(0, 1). Caller supplies the symmetric
        weighted table (the pagerank weighted contract)."""
        import pyarrow as pa

        import ray.data

        from docstrange_ray.ops.community import label_propagation

        trip = [(0, 2, 1), (1, 2, 1), (9, 2, 5)]
        rows = trip + [(b, a, w) for a, b, w in trip]
        wedges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _, _ in rows], pa.int64()),
                    "dst": pa.array([b for _, b, _ in rows], pa.int64()),
                    "w": pa.array([w for _, _, w in rows], pa.int64()),
                }
            )
        ).repartition(2)
        got = {
            int(r["node"]): int(r["label"])
            for r in label_propagation(
                wedges, rounds=1, plan=plan, weighted=True
            ).take_all()
        }
        assert got[2] == 9
        unw = {
            int(r["node"]): int(r["label"])
            for r in label_propagation(
                _edge_ds([(0, 2), (1, 2), (9, 2)]), rounds=1
            ).take_all()
        }
        assert unw[2] == 0


class TestModularity:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.community import modularity_stats

        edges = _random_edges(4)
        ue, adj = _ref_graph(edges)
        lab = _lpa_ref(adj, 3)
        m = len(ue)
        intra = sum(1 for a, b in ue if lab[a] == lab[b])
        dc: dict[int, int] = {}
        for v in adj:
            dc[lab[v]] = dc.get(lab[v], 0) + len(adj[v])
        sum_dc2 = sum(d * d for d in dc.values())
        q = float(round6((4.0 * m * intra - float(sum_dc2)) / (4.0 * m * m)))

        df = modularity_stats(_edge_ds(edges), rounds=3, plan=plan).to_pandas()
        assert len(df) == 1
        row = df.iloc[0]
        assert (
            int(row.m_edges),
            int(row.intra_edges),
            int(row.sum_dc2),
        ) == (m, intra, sum_dc2)
        assert row.modularity == pytest.approx(q, abs=0)

    def test_disconnected_cliques_high_q(self):
        """Two disjoint triangles: perfect partition, Q = 1/2 exactly
        (intra = m, sum_dc2 = 2 * (3*2)^2 / ... -> (4*6*6 - 72)/144)."""
        from docstrange_ray.ops.community import modularity_stats

        edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
        row = modularity_stats(_edge_ds(edges), rounds=4).to_pandas().iloc[0]
        assert int(row.m_edges) == 6 and int(row.intra_edges) == 6
        assert row.modularity == pytest.approx(0.5, abs=0)


class TestWeightedModularity:
    def _wedges(self, trips, parts=3):
        import ray.data

        rows = trips + [(b, a, w) for a, b, w in trips]
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _, _ in rows], pa.int64()),
                    "dst": pa.array([b for _, b, _ in rows], pa.int64()),
                    "w": pa.array([w for _, _, w in rows], pa.int64()),
                }
            )
        ).repartition(parts)

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        """Weighted LPA + weighted Newman Q vs an independent dict/
        loop mirror over a random weighted graph."""
        from docstrange_ray.ops.community import modularity_stats_weighted

        rng = np.random.RandomState(6)
        trips = sorted(
            {
                (min(int(a), int(b)), max(int(a), int(b)))
                for a, b in zip(rng.randint(0, 20, 50), rng.randint(0, 20, 50))
                if a != b
            }
        )
        trips = [(a, b, 1 + (a + b) % 5) for a, b in trips]
        adj: dict = {}
        wmap: dict = {}
        for a, b, w in trips:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
            wmap[(a, b)] = w
        # weighted LPA reference (3 rounds)
        lab = {v: v for v in adj}
        for _ in range(3):
            new = {}
            for v in adj:
                votes: dict = {}
                for n in adj[v]:
                    w = wmap[(min(v, n), max(v, n))]
                    votes[lab[n]] = votes.get(lab[n], 0) + w
                new[v] = sorted(
                    votes.items(), key=lambda kv: (-kv[1], kv[0])
                )[0][0]
            lab = new
        W = sum(w for _, _, w in trips)
        intra = sum(w for a, b, w in trips if lab[a] == lab[b])
        strength = {
            v: sum(
                wmap[(min(v, n), max(v, n))] for n in adj[v]
            )
            for v in adj
        }
        sc: dict = {}
        for v in adj:
            sc[lab[v]] = sc.get(lab[v], 0) + strength[v]
        ssc2 = sum(x * x for x in sc.values())
        q = float(round6((4.0 * W * intra - float(ssc2)) / (4.0 * W * W)))

        row = (
            modularity_stats_weighted(self._wedges(trips), rounds=3, plan=plan)
            .to_pandas()
            .iloc[0]
        )
        assert (
            int(row.w_total),
            int(row.intra_weight),
            int(row.sum_sc2),
        ) == (W, intra, ssc2)
        assert row.modularity == pytest.approx(q, abs=0)


def _walks_ref(adj, steps):
    out = []
    for v in adj:
        cur = v
        out.append((v, 0, v))
        for t in range(steps):
            nbrs = sorted(adj[cur])
            cur = min(nbrs, key=lambda n: (md5_key52(f"{cur}|{t}|{n}"), n))
            out.append((v, t + 1, cur))
    return sorted(out)


class TestRandomWalks:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.community import random_walks

        edges = _random_edges(5)
        _, adj = _ref_graph(edges)
        got = sorted(
            (int(r["start"]), int(r["step"]), int(r["node"]))
            for r in random_walks(_edge_ds(edges), steps=3, plan=plan).take_all()
        )
        assert got == _walks_ref(adj, 3)

    def test_walks_follow_edges(self):
        from docstrange_ray.ops.community import random_walks

        edges = _random_edges(6)
        _, adj = _ref_graph(edges)
        rows = random_walks(_edge_ds(edges), steps=2).take_all()
        by_walker: dict[int, dict[int, int]] = {}
        for r in rows:
            by_walker.setdefault(int(r["start"]), {})[int(r["step"])] = int(
                r["node"]
            )
        for start, path in by_walker.items():
            assert path[0] == start
            for t in range(1, 3):
                assert path[t] in adj[path[t - 1]]


class TestEdgeStructuralSim:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.community import edge_structural_sim

        edges = _random_edges(2, n_nodes=25, n_edges=80)
        ue, adj = _ref_graph(edges)
        ref = {}
        for a, b in sorted(ue):
            common = len(adj[a] & adj[b])
            union = (len(adj[a]) - 1) + (len(adj[b]) - 1) - common
            sim = None if union == 0 else float(round6(common / union))
            ref[(a, b)] = (common, union, sim)
        got = {}
        for r in edge_structural_sim(_edge_ds(edges), plan=plan).take_all():
            s = r["sim"]
            if s is not None and np.isnan(s):
                s = None
            got[(int(r["a"]), int(r["b"]))] = (
                int(r["common"]), int(r["union_size"]), s,
            )
        assert got == ref

    def test_triangle_and_pendant(self):
        """Triangle 0-1-2 plus pendant 2-3: triangle edges have one
        common neighbor and union 1 (sim 1.0 for edge 0-1); the
        pendant edge has none (union = deg(2)-1 = 2, sim 0)."""
        from docstrange_ray.ops.community import edge_structural_sim

        edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
        got = {
            (r["a"], r["b"]): (r["common"], r["union_size"], r["sim"])
            for r in edge_structural_sim(_edge_ds(edges)).take_all()
        }
        assert got[(0, 1)] == (1, 1, 1.0)
        assert got[(2, 3)] == (0, 2, 0.0)
        assert got[(0, 2)] == (1, 2, 0.5)


def _biased_ref(adj, steps):
    import hashlib

    def key(cur, t, n, w):
        h = int.from_bytes(
            hashlib.md5(f"{cur}|{t}|{n}".encode()).digest()[:8], "big"
        )
        return -math.log((float(h) + 0.5) / 2.0**64) / w

    out = []
    for v in sorted(adj):
        prev, cur = None, v
        out.append((v, 0, v))
        for t in range(steps):
            best, bk = None, None
            for n in sorted(adj[cur]):
                if prev is None:
                    w = 1.0
                elif n == prev:
                    w = 0.25
                elif n in adj[prev]:
                    w = 1.0
                else:
                    w = 0.5
                k = key(cur, t, n, w)
                if bk is None or k < bk or (k == bk and n < best):
                    best, bk = n, k
            prev, cur = cur, best
            out.append((v, t + 1, cur))
    return sorted(out)


class TestBiasedWalks:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.community import biased_walks

        edges = _random_edges(13)
        _, adj = _ref_graph(edges)
        got = sorted(
            (int(r["start"]), int(r["step"]), int(r["node"]))
            for r in biased_walks(_edge_ds(edges), steps=3, plan=plan).take_all()
        )
        assert got == _biased_ref(adj, 3)

    def test_return_discouraged_on_path(self):
        """On a path graph the ONLY way back is the prev node: from an
        interior node, the walk prefers the outward neighbor in
        aggregate — verify the exact rule, not a statistic: wherever
        the reference picks the non-prev neighbor, so does the op."""
        from docstrange_ray.ops.community import biased_walks

        edges = [(i, i + 1) for i in range(12)]
        _, adj = _ref_graph(edges)
        got = sorted(
            (int(r["start"]), int(r["step"]), int(r["node"]))
            for r in biased_walks(_edge_ds(edges), steps=4).take_all()
        )
        assert got == _biased_ref(adj, 4)


class TestNeighborhoodFeatures:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.community import neighborhood_features

        edges = _random_edges(8)
        _, adj = _ref_graph(edges)
        deg = {v: len(adj[v]) for v in adj}
        s1 = {v: sum(deg[u] for u in adj[v]) for v in adj}
        s2 = {v: sum(s1[u] for u in adj[v]) for v in adj}
        got = {
            int(r["node"]): (
                int(r["deg"]),
                int(r["sum_nbr_deg"]),
                int(r["sum_2hop_deg"]),
            )
            for r in neighborhood_features(
                _edge_ds(edges), plan=plan
            ).take_all()
        }
        assert got == {v: (deg[v], s1[v], s2[v]) for v in adj}

    def test_path_graph_values(self):
        """0-1-2: degrees (1,2,1); s1 = (2,2,2); s2 = (2,4,2)."""
        from docstrange_ray.ops.community import neighborhood_features

        got = {
            int(r["node"]): (
                int(r["deg"]),
                int(r["sum_nbr_deg"]),
                int(r["sum_2hop_deg"]),
            )
            for r in neighborhood_features(
                _edge_ds([(0, 1), (1, 2)])
            ).take_all()
        }
        assert got == {0: (1, 2, 2), 1: (2, 2, 4), 2: (1, 2, 2)}


class TestWalkSkipgramPairs:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        """Pair counts == brute-force windowed pairing of the walk
        reference (both ordered directions, 1 <= |s-t| <= window)."""
        from docstrange_ray.ops.community import walk_skipgram_pairs

        edges = _random_edges(9)
        _, adj = _ref_graph(edges)
        W = 2
        ref: dict = {}
        walks_by_start: dict = {}
        for start, step, node in _walks_ref(adj, 3):
            walks_by_start.setdefault(start, {})[step] = node
        for path in walks_by_start.values():
            for s in path:
                for t in path:
                    if 1 <= abs(s - t) <= W:
                        k = (path[s], path[t])
                        ref[k] = ref.get(k, 0) + 1
        got = {
            (int(r["center"]), int(r["context"])): int(r["n"])
            for r in walk_skipgram_pairs(
                _edge_ds(edges), steps=3, window=W, plan=plan
            ).take_all()
        }
        assert got == ref


class TestWalkNegativeSamples:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_inverse_cdf_reference(self, plan):
        """Every draw lands in the correct cumulative-degree interval;
        sparse node ids (up to 2e5) exercise the range-bucket CDF of
        the scale plan."""
        from docstrange_ray.ops.community import (
            walk_negative_samples,
            walk_skipgram_pairs,
        )

        rng = np.random.RandomState(4)
        edges = [
            (int(a), int(b))
            for a, b in zip(
                rng.randint(0, 200000, 100), rng.randint(0, 200000, 100)
            )
        ]
        _, adj = _ref_graph(edges)
        deg = {v: len(adj[v]) for v in adj}
        nodes = sorted(deg)
        lo, acc = {}, 0
        for v in nodes:
            lo[v] = acc
            acc += deg[v]
        pairs = {
            (int(r["center"]), int(r["context"]))
            for r in walk_skipgram_pairs(
                _edge_ds(edges), steps=3, window=2
            ).take_all()
        }
        ref = {}
        for c, x in pairs:
            for k in range(2):
                u = md5_key52(f"{c}|{x}|{k}") % acc
                for v in nodes:
                    if lo[v] <= u < lo[v] + deg[v]:
                        ref[(c, x, k)] = v
                        break
        got = {
            (int(r["center"]), int(r["context"]), int(r["k"])): int(
                r["negative"]
            )
            for r in walk_negative_samples(
                _edge_ds(edges), steps=3, window=2, k_neg=2, plan=plan
            ).take_all()
        }
        assert got == ref

    def test_degree_bias(self):
        """A star graph: the hub holds half the total degree, so about
        half the draws must be the hub (exact fraction = deterministic
        given the md5 chain; assert a broad band, not a statistic)."""
        from docstrange_ray.ops.community import walk_negative_samples

        edges = [(0, i) for i in range(1, 21)]
        rows = walk_negative_samples(
            _edge_ds(edges), steps=2, window=1, k_neg=2
        ).take_all()
        frac_hub = sum(1 for r in rows if int(r["negative"]) == 0) / len(rows)
        assert 0.3 < frac_hub < 0.7


def _harm_ref(adj, k, hops):
    seeds = sorted(adj, key=lambda v: (md5_key52(str(v)), v))[:k]
    L = math.lcm(*range(1, hops + 1))
    acc: dict[int, int] = {}
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, hops + 1):
            nxt = []
            for u in frontier:
                for n in adj[u]:
                    if n not in dist:
                        dist[n] = d
                        nxt.append(n)
            frontier = nxt
        for v, d in dist.items():
            if d >= 1:
                acc[v] = acc.get(v, 0) + L // d
    return {v: (hn, float(round6(hn / L))) for v, hn in acc.items()}


class TestHarmonicCentrality:
    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_equals_reference(self, plan):
        from docstrange_ray.ops.community import harmonic_centrality

        edges = _random_edges(7)
        _, adj = _ref_graph(edges)
        got = {
            int(r["node"]): (int(r["harm_num"]), float(r["harmonic"]))
            for r in harmonic_centrality(
                _edge_ds(edges), k_seeds=4, max_hops=3, plan=plan
            ).take_all()
        }
        assert got == _harm_ref(adj, 4, 3)

    def test_path_graph_exact_values(self):
        """Path 0-1-2-3 with seed count 1: the single md5-min seed's
        harmonic numerators are exact L//d integers."""
        from docstrange_ray.ops.community import harmonic_centrality

        edges = [(0, 1), (1, 2), (2, 3)]
        seed = min([0, 1, 2, 3], key=lambda v: (md5_key52(str(v)), v))
        got = {
            int(r["node"]): int(r["harm_num"])
            for r in harmonic_centrality(
                _edge_ds(edges), k_seeds=1, max_hops=3
            ).take_all()
        }
        L = 6
        dist = {v: abs(v - seed) for v in [0, 1, 2, 3] if v != seed}
        want = {v: L // d for v, d in dist.items() if d <= 3}
        assert got == want


class TestFeatherOrcRoundtrip:
    def _docs_tbl(self):
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a,b\nc", 'quote"d', "unicode é中"]),
                "n": pa.array([1.5, None, 3.0], pa.float64()),
            }
        )

    def test_feather_roundtrip(self, tmp_path):
        from docstrange_ray.io import read_feather_docs, write_feather_docs

        tbl = self._docs_tbl()
        write_feather_docs(ray.data.from_arrow(tbl), str(tmp_path / "f"))
        back = read_feather_docs(str(tmp_path / "f")).to_pandas()
        assert sorted(back["text"]) == sorted(tbl.column("text").to_pylist())
        assert back["n"].sum() == pytest.approx(4.5)

    def test_orc_roundtrip_and_projection(self, tmp_path):
        from docstrange_ray.io import read_orc_docs, write_orc_docs

        tbl = self._docs_tbl()
        write_orc_docs(ray.data.from_arrow(tbl), str(tmp_path / "o"))
        back = read_orc_docs(
            str(tmp_path / "o"), columns=["doc_id", "text"]
        ).to_pandas()
        assert list(back.columns) == ["doc_id", "text"]
        assert sorted(back["text"]) == sorted(tbl.column("text").to_pylist())

    def test_missing_dir_raises(self, tmp_path):
        from docstrange_ray.io import read_feather_docs

        with pytest.raises(FileNotFoundError):
            read_feather_docs(str(tmp_path / "nope"))
