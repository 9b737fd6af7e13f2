"""Distributed chi-square / KS tests (ops/stats_tests.py): independent
pure-Python references + DuckDB-mirror bit-parity + degenerate shapes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from docstrange_ray.ops.stats_tests import (
    CHI2_SCALE,
    chi2_independence,
    ks_two_sample,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _chi2_reference(pairs):
    """Independent dict/loop implementation."""
    from collections import Counter

    cnt = Counter(pairs)
    ra, cb = Counter(), Counter()
    for (a, b), c in cnt.items():
        ra[a] += c
        cb[b] += c
    n = sum(cnt.values())
    s = 0
    for a, rt in ra.items():
        for b, ct in cb.items():
            o = cnt.get((a, b), 0)
            num = o * n - rt * ct
            s += (CHI2_SCALE * num * num) // (n * rt * ct)
    return n, len(ra), len(cb), s


def _ks_reference(va, vb):
    """Independent ECDF max-gap implementation (float, for sanity)."""
    allv = sorted(set(va) | set(vb))
    na, nb = len(va), len(vb)
    best = 0.0
    for v in allv:
        fa = sum(1 for x in va if x <= v) / na
        fb = sum(1 for x in vb if x <= v) / nb
        best = max(best, abs(fa - fb))
    return best


class TestChi2:
    def test_equals_reference_random(self):
        rng = np.random.default_rng(3)
        a = rng.choice(["x", "y", "z"], 2000)
        b = rng.choice(["u", "v"], 2000)
        ds = ray.data.from_arrow(pa.table({"a": a, "b": b})).repartition(6)
        got = chi2_independence(ds, "a", "b")
        n, r, c, s = _chi2_reference(list(zip(a, b)))
        assert int(got["n"].iloc[0]) == n
        assert int(got["dof"].iloc[0]) == (r - 1) * (c - 1)
        assert int(got["chi2_micro"].iloc[0]) == s

    def test_zero_observed_cell_counted(self):
        # (x, v) never occurs — its expected-count term must still count
        df = pd.DataFrame(
            {"a": ["x"] * 10 + ["y"] * 10, "b": ["u"] * 10 + ["v"] * 10}
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df))
        got = chi2_independence(ds, "a", "b")
        n, r, c, s = _chi2_reference(list(zip(df["a"], df["b"])))
        assert int(got["chi2_micro"].iloc[0]) == s
        # perfectly dependent 2x2: chi2 = n
        assert s == CHI2_SCALE * 20

    def test_independent_columns_near_zero(self):
        a = ["x", "y"] * 500
        b = ["u"] * 500 + ["v"] * 500
        ds = ray.data.from_arrow(pa.table({"a": a, "b": b})).repartition(4)
        got = chi2_independence(ds, "a", "b")
        assert int(got["chi2_micro"].iloc[0]) <= CHI2_SCALE  # chi2 <= 1


class TestKS:
    def test_equals_reference_random(self):
        rng = np.random.default_rng(9)
        va = rng.integers(0, 60, 800)
        vb = rng.integers(10, 90, 500)
        df = pd.DataFrame(
            {
                "v": np.concatenate([va, vb]),
                "g": ["a"] * len(va) + ["b"] * len(vb),
            }
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(5)
        got = ks_two_sample(ds, "v", "g", "a", "b")
        assert int(got["n_a"].iloc[0]) == len(va)
        assert int(got["n_b"].iloc[0]) == len(vb)
        exact = int(got["d_num"].iloc[0]) / (len(va) * len(vb))
        assert abs(exact - _ks_reference(list(va), list(vb))) < 1e-12
        assert abs(got["d"].iloc[0] - exact) < 1e-6

    def test_identical_distributions_zero(self):
        v = list(range(50)) * 2
        g = ["a"] * 50 + ["b"] * 50
        ds = ray.data.from_arrow(pa.table({"v": v, "g": g}))
        got = ks_two_sample(ds, "v", "g", "a", "b")
        assert int(got["d_num"].iloc[0]) == 0

    def test_disjoint_supports_d_one(self):
        df = pd.DataFrame(
            {"v": list(range(100)) + list(range(200, 300)),
             "g": ["a"] * 100 + ["b"] * 100}
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
        got = ks_two_sample(ds, "v", "g", "a", "b")
        assert got["d"].iloc[0] == 1.0

    def test_missing_group_empty(self):
        ds = ray.data.from_arrow(pa.table({"v": [1, 2], "g": ["a", "a"]}))
        got = ks_two_sample(ds, "v", "g", "a", "b")
        assert len(got) == 0

    def test_duckdb_mirror_bit_exact(self):
        import duckdb

        rng = np.random.default_rng(21)
        va = rng.integers(0, 40, 600)
        vb = rng.integers(5, 55, 400)
        df = pd.DataFrame(
            {"v": np.concatenate([va, vb]),
             "g": ["a"] * len(va) + ["b"] * len(vb)}
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(4)
        got = ks_two_sample(ds, "v", "g", "a", "b")
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            """WITH h AS (
                 SELECT v, SUM(CASE WHEN g='a' THEN 1 ELSE 0 END) AS ca,
                        SUM(CASE WHEN g='b' THEN 1 ELSE 0 END) AS cb
                 FROM t GROUP BY v
               ), c AS (
                 SELECT v, SUM(ca) OVER (ORDER BY v) AS cum_a,
                        SUM(cb) OVER (ORDER BY v) AS cum_b,
                        (SELECT SUM(ca) FROM h) AS na,
                        (SELECT SUM(cb) FROM h) AS nb
                 FROM h
               )
               SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                      CAST(MAX(ABS(cum_a*nb - cum_b*na)) AS BIGINT) AS d_num,
                      ROUND(CAST(MAX(ABS(cum_a*nb - cum_b*na)) AS DOUBLE)
                            / CAST(na*nb AS DOUBLE), 6) AS d
               FROM c GROUP BY na, nb"""
        ).fetchdf()
        assert int(got["d_num"].iloc[0]) == int(exp["d_num"].iloc[0])
        assert got["d"].iloc[0] == exp["d"].iloc[0]


class TestMannWhitney:
    @staticmethod
    def _reference(va, vb):
        """Independent pair-loop 2*U_a (2 per win, 1 per tie)."""
        u2 = 0
        for a in va:
            for b in vb:
                if a > b:
                    u2 += 2
                elif a == b:
                    u2 += 1
        return u2

    def test_equals_reference_with_ties(self):
        from docstrange_ray.ops.stats_tests import mann_whitney_u

        rng = np.random.default_rng(51)
        va = rng.integers(0, 15, 300)
        vb = rng.integers(3, 18, 200)
        df = pd.DataFrame(
            {"v": np.concatenate([va, vb]),
             "g": ["a"] * len(va) + ["b"] * len(vb)}
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(5)
        got = mann_whitney_u(ds, "v", "g", "a", "b")
        assert int(got["u2_a"].iloc[0]) == self._reference(list(va), list(vb))
        assert int(got["u2_b"].iloc[0]) == self._reference(list(vb), list(va))
        # complementarity: u2_a + u2_b = 2 * n_a * n_b
        assert (
            int(got["u2_a"].iloc[0]) + int(got["u2_b"].iloc[0])
            == 2 * len(va) * len(vb)
        )
        exp_tie = 0
        from collections import Counter

        for t in Counter(np.concatenate([va, vb]).tolist()).values():
            if t > 1:
                exp_tie += t**3 - t
        assert int(got["tie_term"].iloc[0]) == exp_tie
        assert got["u_a"].iloc[0] == int(got["u2_a"].iloc[0]) / 2.0

    def test_total_dominance(self):
        from docstrange_ray.ops.stats_tests import mann_whitney_u

        df = pd.DataFrame(
            {"v": list(range(100, 150)) + list(range(50)),
             "g": ["a"] * 50 + ["b"] * 50}
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
        got = mann_whitney_u(ds, "v", "g", "a", "b")
        assert int(got["u2_a"].iloc[0]) == 2 * 50 * 50
        assert int(got["u2_b"].iloc[0]) == 0


class TestAUC:
    def test_equals_sklearn_free_reference(self):
        """AUC vs an independent pair-counting reference; ties 1/2."""
        from docstrange_ray.ops.stats_tests import auc_score

        rng = np.random.default_rng(7)
        scores = rng.integers(0, 12, 400)
        labels = ((scores + rng.integers(0, 6, 400)) % 3 == 0).astype(int)
        df = pd.DataFrame({"s": scores, "y": labels})
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(5)
        got = auc_score(ds, "s", "y")
        pos = scores[labels == 1]
        neg = scores[labels == 0]
        u2 = sum(2 if p > n else (1 if p == n else 0)
                 for p in pos for n in neg)
        assert int(got["auc2_num"].iloc[0]) == u2
        den = 2 * len(pos) * len(neg)
        assert int(got["auc_micro"].iloc[0]) == (1_000_000 * u2) // den
        assert got["auc"].iloc[0] == float(u2) / float(den)

    def test_perfect_and_inverted(self):
        from docstrange_ray.ops.stats_tests import auc_score

        df = pd.DataFrame({"s": list(range(20)),
                           "y": [0] * 10 + [1] * 10})
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
        assert auc_score(ds, "s", "y")["auc"].iloc[0] == 1.0
        df["y"] = df["y"].iloc[::-1].to_list()
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
        assert auc_score(ds, "s", "y")["auc"].iloc[0] == 0.0

    def test_single_class_empty(self):
        from docstrange_ray.ops.stats_tests import auc_score

        df = pd.DataFrame({"s": [1, 2, 3], "y": [1, 1, 1]})
        ds = ray.data.from_arrow(pa.Table.from_pandas(df))
        assert auc_score(ds, "s", "y").empty


class TestWelchT:
    def test_duckdb_mirror_bit_exact(self):
        import duckdb

        from docstrange_ray.ops.stats_tests import welch_t

        rng = np.random.default_rng(53)
        va = rng.normal(100, 10, 400).round(2)
        vb = rng.normal(103, 25, 250).round(2)
        df = pd.DataFrame(
            {"v": np.concatenate([va, vb]),
             "g": ["a"] * len(va) + ["b"] * len(vb)}
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(4)
        from docstrange_ray.numerics import to_int_units

        got = welch_t(ds, "v", "g", "a", "b", to_int=to_int_units(100))
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            """WITH s AS (
                 SELECT g, COUNT(*) AS n,
                        SUM(CAST(ROUND(v*100) AS HUGEINT)) AS sx,
                        SUM(CAST(ROUND(v*100) AS HUGEINT)
                            * CAST(ROUND(v*100) AS HUGEINT)) AS sxx
                 FROM t GROUP BY g
               ), w AS (
                 SELECT
                   (SELECT n FROM s WHERE g='a') AS na,
                   (SELECT n FROM s WHERE g='b') AS nb,
                   CAST((SELECT sx FROM s WHERE g='a') AS DOUBLE)
                       / (SELECT n FROM s WHERE g='a') AS ma,
                   CAST((SELECT sx FROM s WHERE g='b') AS DOUBLE)
                       / (SELECT n FROM s WHERE g='b') AS mb,
                   CAST((SELECT n*sxx - sx*sx FROM s WHERE g='a') AS DOUBLE)
                     / (CAST((SELECT n FROM s WHERE g='a') AS DOUBLE)
                        * ((SELECT n FROM s WHERE g='a') - 1))
                     / (SELECT n FROM s WHERE g='a') AS se2a,
                   CAST((SELECT n*sxx - sx*sx FROM s WHERE g='b') AS DOUBLE)
                     / (CAST((SELECT n FROM s WHERE g='b') AS DOUBLE)
                        * ((SELECT n FROM s WHERE g='b') - 1))
                     / (SELECT n FROM s WHERE g='b') AS se2b
               )
               SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                      ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
                      ROUND((ma - mb) / SQRT(se2a + se2b), 6) AS t,
                      ROUND((se2a + se2b) * (se2a + se2b)
                            / (se2a*se2a/(na-1) + se2b*se2b/(nb-1)), 6) AS dof
               FROM w"""
        ).fetchdf()
        for c in ["n_a", "n_b", "mean_a", "mean_b", "t", "dof"]:
            assert got[c].iloc[0] == exp[c].iloc[0], c

    def test_identical_groups_t_zero(self):
        from docstrange_ray.ops.stats_tests import welch_t

        v = list(range(50)) * 2
        g = ["a"] * 50 + ["b"] * 50
        ds = ray.data.from_arrow(pa.table({"v": [float(x) for x in v], "g": g}))
        got = welch_t(ds, "v", "g", "a", "b")
        assert got["t"].iloc[0] == 0.0

    def test_degenerate_small_group_empty(self):
        from docstrange_ray.ops.stats_tests import welch_t

        ds = ray.data.from_arrow(
            pa.table({"v": [1.0, 2.0, 3.0], "g": ["a", "a", "b"]})
        )
        assert len(welch_t(ds, "v", "g", "a", "b")) == 0
