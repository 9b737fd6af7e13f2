"""A-Priori frequent triples (ops/itemsets.py): pinned against a
brute-force all-triples reference, prune-correctness (no frequent
triple lost to the pair prune), support threshold, basket guard."""

import itertools

import numpy as np
import pyarrow as pa
import ray.data

from docstrange_ray.ops.itemsets import frequent_triples


def _brute(baskets, minsup):
    from collections import Counter

    c = Counter()
    for items in baskets.values():
        for t in itertools.combinations(sorted(set(items)), 3):
            c[t] += 1
    return {t: n for t, n in c.items() if n >= minsup}


def _run(baskets, minsup, **kw):
    rows_b, rows_i = [], []
    for b, items in baskets.items():
        for i in items:
            rows_b.append(b)
            rows_i.append(i)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "basket": pa.array(rows_b, pa.int64()),
                "item": pa.array(rows_i, pa.int64()),
            }
        )
    ).repartition(5)
    out = frequent_triples(ds, "basket", "item", min_support=minsup, **kw)
    return {
        (r["p1"], r["p2"], r["p3"]): r["support"] for r in out.take_all()
    }


class TestFrequentTriples:
    def test_matches_brute(self, ray_session):
        rng = np.random.default_rng(4)
        baskets = {
            b: [int(x) for x in rng.integers(0, 25, rng.integers(2, 9))]
            for b in range(300)
        }
        assert _run(baskets, 3) == _brute(baskets, 3)

    def test_duplicate_items_in_basket_count_once(self, ray_session):
        baskets = {1: [5, 5, 6, 7], 2: [5, 6, 7, 7], 3: [9]}
        assert _run(baskets, 2) == {(5, 6, 7): 2}

    def test_threshold(self, ray_session):
        baskets = {1: [1, 2, 3], 2: [1, 2, 3], 3: [1, 2, 3]}
        assert _run(baskets, 4) == {}
        assert _run(baskets, 3) == {(1, 2, 3): 3}

    def test_max_basket_guard_skips(self, ray_session):
        # the guard bounds the L1-FILTERED basket size (that is what the
        # cubic explode depends on): two 40-item baskets keep all their
        # items frequent (support 2) yet are skipped at max_basket=10,
        # so only the small baskets' triple survives
        baskets = {
            1: list(range(40)),
            2: list(range(40)),
            3: [1, 2, 3],
            4: [1, 2, 3],
        }
        got = _run(baskets, 2, max_basket=10)
        assert got == {(1, 2, 3): 2}


class TestAssociationRules:
    def _run_rules(self, baskets, minsup):
        from docstrange_ray.ops.itemsets import association_rules

        rows_b, rows_i = [], []
        for b, items in baskets.items():
            for i in items:
                rows_b.append(b)
                rows_i.append(i)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "basket": pa.array(rows_b, pa.int64()),
                    "item": pa.array(rows_i, pa.int64()),
                }
            )
        ).repartition(5)
        out = association_rules(ds, "basket", "item", min_support=minsup)
        return {
            (r["ante"], r["cons"]): (
                r["n_ab"], r["n_a"], r["n_b"], r["confidence"], r["lift"]
            )
            for r in out.take_all()
        }

    def test_matches_brute(self, ray_session):
        from collections import Counter

        from docstrange_ray.numerics import round6

        rng = np.random.default_rng(9)
        baskets = {
            b: [int(x) for x in rng.integers(0, 20, rng.integers(2, 7))]
            for b in range(200)
        }
        n = len(baskets)
        ic = Counter()
        pc = Counter()
        for items in baskets.values():
            s = sorted(set(items))
            ic.update(s)
            pc.update(itertools.combinations(s, 2))
        want = {}
        for (a, b), nab in pc.items():
            if nab < 2:
                continue
            for x, y in ((a, b), (b, a)):
                want[(x, y)] = (
                    nab, ic[x], ic[y],
                    float(round6(nab / ic[x])),
                    float(round6(nab * n / (ic[x] * ic[y]))),
                )
        assert self._run_rules(baskets, 2) == want

    def test_rule_stats_exact(self, ray_session):
        # {1,2} in 2 of 3 baskets; item 1 in 3, item 2 in 2:
        # conf(1->2) = 2/3, lift = 2*3/(3*2) = 1.0
        baskets = {10: [1, 2], 11: [1, 2, 3], 12: [1]}
        got = self._run_rules(baskets, 2)
        nab, na, nb, conf, lift = got[(1, 2)]
        assert (nab, na, nb) == (2, 3, 2)
        assert conf == 0.666667 and lift == 1.0
        assert got[(2, 1)][3] == 1.0  # conf(2->1) = 2/2
