"""Radix-selection global quantiles (rankstats.select_quantiles):
order-key transform properties, exactness vs a sorted-array reference
at the quantile_disc rank contract, float/int/negative/NaN domains."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from docstrange_ray.ops.rankstats import (
    key_to_value,
    order_keys,
    select_quantiles,
)

QS = ((1, 4), (1, 2), (9, 10), (99, 100))


def _disc_reference(vals, quantiles):
    s = np.sort(np.asarray(vals))
    n = len(s)
    return [s[max(1, -(-qn * n // qd)) - 1] for qn, qd in quantiles]


class TestOrderKeys:
    def test_float_total_order_preserved(self):
        rng = np.random.default_rng(0)
        vals = np.concatenate(
            [
                rng.normal(0, 1e6, 500),
                rng.normal(0, 1e-6, 500),
                [0.0, -0.0, 1e308, -1e308, 5e-324, -5e-324],
            ]
        )
        keys = order_keys(vals)
        # keys are a total-order REFINEMENT of float order (-0.0 < 0.0),
        # so sorting by key must yield non-decreasing values
        assert (np.diff(vals[np.argsort(keys)]) >= 0).all()

    def test_roundtrip(self):
        for v in [0.0, -1.5, 3.25, 1e308, -5e-324, 42.0]:
            k = int(order_keys(np.array([v]))[0])
            assert key_to_value(k, float_domain=True) == v
        for v in [-(2**62), -1, 0, 7, 2**62]:
            k = int(order_keys(np.array([v], dtype=np.int64))[0])
            assert key_to_value(k, float_domain=False) == v

    def test_int_identity(self):
        vals = np.array([-5, 0, 3, 2**40], dtype=np.int64)
        assert (order_keys(vals) == vals).all()


class TestSelectQuantiles:
    def test_float_exact_vs_reference(self, ray_session):
        rng = np.random.default_rng(7)
        vals = np.concatenate(
            [rng.normal(100, 50, 3000), rng.normal(-1e4, 3, 200)]
        )  # both signs: exercises the full-range uint64 bucket math
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
        got = select_quantiles(ds, "v", QS)
        exp = _disc_reference(vals, QS)
        assert list(got["value"]) == exp
        assert (got["n"] == len(vals)).all()
        assert list(got["label"]) == ["p25", "p50", "p90", "p99"]

    def test_int_domain(self, ray_session):
        vals = np.random.default_rng(3).integers(-1000, 1000, 2500)
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(vals, pa.int64())})
        ).repartition(6)
        got = select_quantiles(ds, "v", QS, float_domain=False)
        assert list(got["value"]) == [int(x) for x in _disc_reference(vals, QS)]

    def test_nulls_and_nans_dropped(self, ray_session):
        vals = [1.0, 2.0, 3.0, 4.0, float("nan"), None] * 50
        ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
        got = select_quantiles(ds, "v", ((1, 2),))
        kept = np.array([1.0, 2.0, 3.0, 4.0] * 50)
        assert (got["n"] == 200).all()
        assert list(got["value"]) == _disc_reference(kept, ((1, 2),))

    def test_heavy_ties(self, ray_session):
        # one value holding 90% of the rows: selection narrows to it
        vals = np.concatenate([np.full(900, 5.0), np.arange(100, dtype=float)])
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(4)
        got = select_quantiles(ds, "v", QS)
        assert list(got["value"]) == _disc_reference(vals, QS)

    def test_duckdb_quantile_disc_parity(self, ray_session):
        import duckdb

        vals = np.random.default_rng(11).normal(0, 1, 1777)
        ds = ray.data.from_arrow(pa.table({"v": vals}))
        got = dict(zip(select_quantiles(ds, "v", QS)["label"],
                       select_quantiles(ds, "v", QS)["value"]))
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": vals}))
        for (qn, qd), lab in zip(QS, ["p25", "p50", "p90", "p99"]):
            exp = con.execute(
                f"SELECT quantile_disc(v, {qn}/{qd}) FROM t"
            ).fetchone()[0]
            assert got[lab] == exp, lab

    def test_empty(self, ray_session):
        ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
        assert len(select_quantiles(ds, "v", QS)) == 0


class TestWinsorize:
    def test_clip_matches_reference(self, ray_session):
        import duckdb
        import pandas as pd

        from docstrange_ray.ops.rankstats import winsorize

        vals = np.random.default_rng(13).normal(0, 100, 1500)
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(6)
        got = (
            winsorize(ds, "v", lower=(5, 100), upper=(95, 100))
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": vals}))
        exp = (
            con.execute(
                """SELECT v, LEAST(GREATEST(v,
                       (SELECT quantile_disc(v, 0.05) FROM t)),
                       (SELECT quantile_disc(v, 0.95) FROM t)) AS v_w
                   FROM t ORDER BY v"""
            )
            .fetchdf()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["v", "v_w"]], exp)
        assert got["v_w"].min() > got["v"].min()
        assert got["v_w"].max() < got["v"].max()

    def test_winsorize_all_null_passthrough(self, ray_session):
        from docstrange_ray.ops.rankstats import winsorize

        ds = ray.data.from_arrow(
            pa.table({"v": pa.array([None, None], pa.float64())})
        )
        out = winsorize(ds, "v").take_all()
        assert [r["v_w"] for r in out] == [None, None]


class TestGroupSelectQuantiles:
    def test_duckdb_group_parity(self, ray_session):
        import duckdb

        from docstrange_ray.ops.rankstats import group_select_quantiles

        rng = np.random.default_rng(17)
        n = 3000
        g = rng.choice(["a", "b", "c", "hot"], n, p=[0.05, 0.1, 0.05, 0.8])
        v = np.where(g == "hot", rng.normal(-50, 5, n), rng.normal(10, 3, n))
        ds = ray.data.from_arrow(pa.table({"src": g, "v": v})).repartition(8)
        got = group_select_quantiles(
            ds, "src", "v", quantiles=((1, 2), (9, 10))
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"src": g, "v": v}))
        exp = con.execute(
            """SELECT src, quantile_disc(v, 0.5) AS p50,
                      quantile_disc(v, 0.9) AS p90, COUNT(*) AS n
               FROM t GROUP BY src ORDER BY src"""
        ).fetchdf()
        for _, row in exp.iterrows():
            sub = got[got["src"] == row["src"]]
            by = dict(zip(sub["label"], sub["value"]))
            assert by["p50"] == row["p50"], row["src"]
            assert by["p90"] == row["p90"], row["src"]
            assert (sub["n"] == row["n"]).all()

    def test_negative_and_single_row_groups(self, ray_session):
        from docstrange_ray.ops.rankstats import group_select_quantiles

        df = pd.DataFrame(
            {
                "src": ["x"] * 100 + ["one"],
                "v": list(np.linspace(-1e6, 1e6, 100)) + [42.5],
            }
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(4)
        got = group_select_quantiles(ds, "src", "v", quantiles=((1, 2),))
        by = {(r["src"], r["label"]): r["value"] for _, r in got.iterrows()}
        assert by[("one", "p50")] == 42.5
        assert by[("x", "p50")] == np.sort(df[df.src == "x"]["v"].to_numpy())[49]

    def test_null_group_and_value_dropped(self, ray_session):
        from docstrange_ray.ops.rankstats import group_select_quantiles

        tbl = pa.table(
            {
                "src": pa.array(["a", "a", None, "a"], pa.string()),
                "v": pa.array([1.0, None, 2.0, 3.0], pa.float64()),
            }
        )
        got = group_select_quantiles(
            ray.data.from_arrow(tbl), "src", "v", quantiles=((1, 2),)
        )
        assert list(got["src"]) == ["a"]
        assert (got["n"] == 2).all()
        assert list(got["value"]) == [1.0]


class TestGroupCorr:
    def test_duckdb_mirror_bit_exact_and_corr_close(self, ray_session):
        import duckdb

        from docstrange_ray.ops.rankstats import group_corr

        rng = np.random.default_rng(23)
        n = 4000
        g = rng.choice(["p", "q", "r"], n)
        x = rng.integers(1, 51, n).astype(np.float64)
        y = (x * 250.0 + rng.normal(0, 300, n)).round(2)  # correlated dollars
        ds = ray.data.from_arrow(pa.table({"g": g, "x": x, "y": y})).repartition(7)
        got = group_corr(
            ds, "g", "x", "y",
            y_to_int=lambda a: np.round(np.asarray(a, np.float64) * 100).astype(np.int64),
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"g": g, "x": x, "y": y}))
        exp = con.execute(
            """WITH s AS (
                 SELECT g, COUNT(*) AS n,
                        SUM(CAST(ROUND(x) AS HUGEINT)) AS sx,
                        SUM(CAST(ROUND(y*100) AS HUGEINT)) AS sy,
                        SUM(CAST(ROUND(x) AS HUGEINT)*CAST(ROUND(y*100) AS HUGEINT)) AS sxy,
                        SUM(CAST(ROUND(x) AS HUGEINT)*CAST(ROUND(x) AS HUGEINT)) AS sxx,
                        SUM(CAST(ROUND(y*100) AS HUGEINT)*CAST(ROUND(y*100) AS HUGEINT)) AS syy
                 FROM t GROUP BY g)
               SELECT g, n, ROUND(CAST(n*sxy - sx*sy AS DOUBLE) /
                      (SQRT(CAST(n*sxx - sx*sx AS DOUBLE)) *
                       SQRT(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS corr
               FROM s ORDER BY g"""
        ).fetchdf()
        got = got.sort_values("g").reset_index(drop=True)
        assert list(got["g"]) == list(exp["g"])
        assert (got["n"].to_numpy() == exp["n"].to_numpy().astype(np.int64)).all()
        assert list(got["corr"]) == list(exp["corr"])  # BIT-equal
        # sanity vs DuckDB's own corr() on the integer units
        native = con.execute(
            "SELECT g, corr(ROUND(x), ROUND(y*100)) FROM t GROUP BY g ORDER BY g"
        ).fetchdf()
        assert np.allclose(got["corr"], native.iloc[:, 1], atol=1e-5)

    def test_degenerate_groups_dropped(self, ray_session):
        from docstrange_ray.ops.rankstats import group_corr

        df = pd.DataFrame(
            {
                "g": ["const", "const", "single", "ok", "ok", "ok"],
                "x": [1.0, 2.0, 1.0, 1.0, 2.0, 3.0],
                "y": [5.0, 5.0, 1.0, 1.0, 2.0, 3.0],  # const: zero y-variance
            }
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df))
        got = group_corr(ds, "g", "x", "y")
        assert list(got["g"]) == ["ok"]
        assert list(got["corr"]) == [1.0]

    def test_bignum_sums_exact(self, ray_session):
        # values sized so per-block int64 naive squared sums WOULD overflow
        from docstrange_ray.ops.rankstats import group_corr

        n = 20000
        x = np.full(n, 3_000_000_000.0)  # x^2 = 9e18 per row ~ int64 max
        x[: n // 2] = 2_999_999_999.0
        y = x + 1
        ds = ray.data.from_arrow(
            pa.table({"g": ["a"] * n, "x": x, "y": y})
        ).repartition(3)
        got = group_corr(ds, "g", "x", "y")
        assert list(got["corr"]) == [1.0]


class TestGroupRegression:
    def test_duckdb_mirror_bit_exact_and_regr_close(self, ray_session):
        import duckdb

        from docstrange_ray.ops.rankstats import group_regression

        rng = np.random.default_rng(29)
        n = 4000
        g = rng.choice(["p", "q", "r"], n)
        x = rng.integers(1, 51, n).astype(np.float64)
        y = (x * 250.0 + rng.normal(0, 300, n)).round(2)
        ds = ray.data.from_arrow(pa.table({"g": g, "x": x, "y": y})).repartition(7)
        got = group_regression(
            ds, "g", "x", "y",
            y_to_int=lambda a: np.round(np.asarray(a, np.float64) * 100).astype(np.int64),
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"g": g, "x": x, "y": y}))
        exp = con.execute(
            """WITH s AS (
                 SELECT g, COUNT(*) AS n,
                        SUM(CAST(ROUND(x) AS HUGEINT)) AS sx,
                        SUM(CAST(ROUND(y*100) AS HUGEINT)) AS sy,
                        SUM(CAST(ROUND(x) AS HUGEINT)*CAST(ROUND(y*100) AS HUGEINT)) AS sxy,
                        SUM(CAST(ROUND(x) AS HUGEINT)*CAST(ROUND(x) AS HUGEINT)) AS sxx
                 FROM t GROUP BY g),
               sl AS (
                 SELECT g, n, CAST(n*sxy - sx*sy AS DOUBLE)
                        / CAST(n*sxx - sx*sx AS DOUBLE) AS slope, sx, sy
                 FROM s WHERE n >= 2 AND n*sxx - sx*sx > 0)
               SELECT g, n, ROUND(slope, 6) AS slope,
                      ROUND((CAST(sy AS DOUBLE) - slope*CAST(sx AS DOUBLE))
                            / CAST(n AS DOUBLE), 6) AS intercept
               FROM sl ORDER BY g"""
        ).fetchdf()
        got = got.sort_values("g").reset_index(drop=True)
        assert list(got["g"]) == list(exp["g"])
        assert (got["n"].to_numpy() == exp["n"].to_numpy().astype(np.int64)).all()
        assert list(got["slope"]) == list(exp["slope"])  # BIT-equal
        assert list(got["intercept"]) == list(exp["intercept"])
        # sanity vs DuckDB's own regr_* on the integer units
        native = con.execute(
            """SELECT g, regr_slope(ROUND(y*100), ROUND(x)),
                      regr_intercept(ROUND(y*100), ROUND(x))
               FROM t GROUP BY g ORDER BY g"""
        ).fetchdf()
        assert np.allclose(got["slope"], native.iloc[:, 1], atol=1e-4)
        assert np.allclose(got["intercept"], native.iloc[:, 2], atol=1e-2)

    def test_exact_line_and_degenerate_groups(self, ray_session):
        from docstrange_ray.ops.rankstats import group_regression

        df = pd.DataFrame(
            {
                "g": ["ok"] * 3 + ["constx", "constx", "single"],
                "x": [1.0, 2.0, 3.0, 5.0, 5.0, 1.0],
                "y": [7.0, 9.0, 11.0, 1.0, 2.0, 1.0],  # ok: y = 2x + 5
            }
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df))
        got = group_regression(ds, "g", "x", "y")
        assert list(got["g"]) == ["ok"]
        assert list(got["slope"]) == [2.0]
        assert list(got["intercept"]) == [5.0]


class TestParetoFront:
    @staticmethod
    def _reference(pts, minimize=(True, True)):
        """Independent O(m^2) dominance check."""
        from collections import Counter

        sx = 1 if minimize[0] else -1
        sy = 1 if minimize[1] else -1
        norm = [(sx * x, sy * y) for x, y in pts]
        cnt = Counter(norm)
        keys = list(cnt)
        out = {}
        for p in keys:
            dominated = any(
                q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
                for q in keys
            )
            if not dominated:
                out[(sx * p[0], sy * p[1])] = cnt[p]
        return out

    @staticmethod
    def _run(pts, parts=4, **kw):
        from docstrange_ray.ops.rankstats import pareto_front

        tbl = pa.table(
            {
                "x": pa.array([float(x) for x, _ in pts], pa.float64()),
                "y": pa.array([float(y) for _, y in pts], pa.float64()),
            }
        )
        got = pareto_front(
            ray.data.from_arrow(tbl).repartition(parts), "x", "y", **kw
        )
        return {(int(r["x"]), int(r["y"])): int(r["cnt"]) for _, r in got.iterrows()}

    def test_equals_reference_random(self):
        rng = np.random.default_rng(31)
        pts = [tuple(map(int, p)) for p in rng.integers(0, 50, (1200, 2))]
        assert self._run(pts) == self._reference(pts)

    def test_maximize_direction(self):
        rng = np.random.default_rng(32)
        pts = [tuple(map(int, p)) for p in rng.integers(0, 30, (600, 2))]
        mm = (True, False)
        assert self._run(pts, minimize=mm) == self._reference(pts, mm)

    def test_duplicates_counted_and_equal_points_kept(self):
        pts = [(1, 5), (1, 5), (2, 4), (3, 3), (2, 6), (4, 4)]
        got = self._run(pts, parts=2)
        assert got == {(1, 5): 2, (2, 4): 1, (3, 3): 1}

    def test_anticorrelated_full_frontier(self):
        # y = C - x: nothing dominates anything — all points survive
        pts = [(i, 100 - i) for i in range(50)]
        got = self._run(pts, parts=5)
        assert len(got) == 50


class TestGroupModeEntropy:
    def test_mode_vs_duckdb(self, ray_session):
        import duckdb

        from docstrange_ray.ops.rankstats import group_mode

        rng = np.random.default_rng(41)
        g = rng.choice(["a", "b", "c"], 2000)
        v = rng.integers(0, 8, 2000)
        ds = ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(6)
        got = (
            group_mode(ds, "g", "v")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"g": g, "v": v}))
        exp = con.execute(
            """WITH c AS (SELECT g, v, COUNT(*) AS cnt FROM t GROUP BY g, v),
               r AS (SELECT g, v, cnt,
                            SUM(cnt) OVER (PARTITION BY g) AS n,
                            ROW_NUMBER() OVER (PARTITION BY g
                                ORDER BY cnt DESC, v) AS rn FROM c)
               SELECT g, v AS mode, CAST(cnt AS BIGINT) AS mode_cnt,
                      CAST(n AS BIGINT) AS n
               FROM r WHERE rn = 1 ORDER BY g"""
        ).fetchdf()
        assert list(got["mode"]) == list(exp["mode"])
        assert list(got["mode_cnt"]) == list(exp["mode_cnt"])
        assert list(got["n"]) == list(exp["n"])

    def test_mode_tie_breaks_value_ascending(self, ray_session):
        from docstrange_ray.ops.rankstats import group_mode

        ds = ray.data.from_arrow(
            pa.table({"g": ["x"] * 4, "v": [7, 7, 3, 3]})
        ).repartition(2)
        got = group_mode(ds, "g", "v").take_all()
        assert got[0]["mode"] == 3 and got[0]["mode_cnt"] == 2

    def test_entropy_reference_and_bounds(self, ray_session):
        import math

        from docstrange_ray.ops.rankstats import group_entropy

        # uniform over 4 values -> ln(4); constant -> 0
        g = ["u"] * 400 + ["k"] * 100
        v = [i % 4 for i in range(400)] + [9] * 100
        ds = ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(5)
        got = {
            r["g"]: r for r in group_entropy(ds, "g", "v").take_all()
        }
        assert got["k"]["entropy_micro"] == 0
        assert got["u"]["n_values"] == 4
        exp = 4 * math.floor(1e6 * 0.25 * math.log(4.0) + 0.5)
        assert got["u"]["entropy_micro"] == exp

    def test_entropy_vs_duckdb_mirror(self, ray_session):
        import duckdb

        from docstrange_ray.ops.rankstats import group_entropy

        rng = np.random.default_rng(43)
        g = rng.choice(["p", "q"], 1500)
        v = rng.choice(list("abcdefg"), 1500, p=[0.4, 0.3, 0.1, 0.1, 0.05, 0.03, 0.02])
        ds = ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(4)
        got = (
            group_entropy(ds, "g", "v")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"g": g, "v": v}))
        exp = con.execute(
            """WITH c AS (SELECT g, v, COUNT(*) AS cnt FROM t GROUP BY g, v),
               n AS (SELECT g, SUM(cnt) AS n FROM c GROUP BY g)
               SELECT c.g, CAST(SUM(FLOOR(1000000.0
                          * (CAST(c.cnt AS DOUBLE) / n.n)
                          * LN(CAST(n.n AS DOUBLE) / c.cnt) + 0.5))
                      AS BIGINT) AS entropy_micro
               FROM c JOIN n ON n.g = c.g GROUP BY c.g ORDER BY c.g"""
        ).fetchdf()
        assert list(got["entropy_micro"]) == list(exp["entropy_micro"])


class TestDefaultRoundingHalfAway:
    def test_to_int_units_matches_sql_round_on_ties(self, ray_session):
        import duckdb

        from docstrange_ray.numerics import to_int_units

        vals = np.array([0.5, 1.5, 2.5, -0.5, -1.5, 0.125])
        got = list(to_int_units(1)(vals)) + list(to_int_units(100)(vals))
        con = duckdb.connect()
        exp = [
            con.execute(f"SELECT CAST(ROUND({v!r}) AS BIGINT)").fetchone()[0]
            for v in vals
        ] + [
            con.execute(
                f"SELECT CAST(ROUND({v!r} * 100) AS BIGINT)"
            ).fetchone()[0]
            for v in vals
        ]
        assert got == exp  # np.round would give 0,2,2 on the .5 ties

    def test_group_corr_default_transform_half_away(self, ray_session):
        # x values land ON .5 ties: the default transform must follow
        # SQL ROUND (half-away), not np.round (half-even)
        from docstrange_ray.ops.rankstats import group_corr

        df = pd.DataFrame(
            {"g": ["a"] * 4, "x": [0.5, 1.5, 2.5, 3.5], "y": [1.0, 2.0, 3.0, 4.0]}
        )
        got = group_corr(
            ray.data.from_arrow(pa.Table.from_pandas(df)), "g", "x", "y"
        )
        import duckdb

        exp = duckdb.connect().execute(
            """WITH s AS (SELECT COUNT(*) n,
                 SUM(CAST(ROUND(x) AS HUGEINT)) sx, SUM(CAST(ROUND(y) AS HUGEINT)) sy,
                 SUM(CAST(ROUND(x) AS HUGEINT)*CAST(ROUND(y) AS HUGEINT)) sxy,
                 SUM(CAST(ROUND(x) AS HUGEINT)*CAST(ROUND(x) AS HUGEINT)) sxx,
                 SUM(CAST(ROUND(y) AS HUGEINT)*CAST(ROUND(y) AS HUGEINT)) syy
               FROM (VALUES (0.5,1.0),(1.5,2.0),(2.5,3.0),(3.5,4.0)) t(x,y))
               SELECT ROUND(CAST(n*sxy-sx*sy AS DOUBLE) /
                 (SQRT(CAST(n*sxx-sx*sx AS DOUBLE))*SQRT(CAST(n*syy-sy*sy AS DOUBLE))), 6)
               FROM s"""
        ).fetchone()[0]
        assert got["corr"].iloc[0] == exp


class TestWeightedSelectQuantiles:
    @staticmethod
    def _reference(vals, ws, quantiles):
        """Smallest positive-weight value whose cumweight crosses
        ceil(qn*W/qd) — independent sort/cumsum loop."""
        pairs = sorted((v, w) for v, w in zip(vals, ws) if w > 0)
        W = sum(w for _, w in pairs)
        out = []
        for qn, qd in quantiles:
            t = max(1, -(-qn * W // qd))
            cum = 0
            for v, w in pairs:
                cum += w
                if cum >= t:
                    out.append(v)
                    break
        return out

    def _ds(self, vals, ws, parts=4):
        import pyarrow as pa

        import ray

        return ray.data.from_arrow(
            pa.table({"v": pa.array(vals, pa.float64()),
                      "w": pa.array(ws, pa.int64())})
        ).repartition(parts)

    def test_equals_reference(self):
        from docstrange_ray.ops.rankstats import weighted_select_quantiles

        rng = np.random.RandomState(2)
        vals = rng.randn(500) * 100
        ws = rng.randint(1, 50, size=500)
        qs = ((1, 4), (1, 2), (3, 4), (99, 100))
        want = self._reference(vals.tolist(), ws.tolist(), qs)
        got = weighted_select_quantiles(
            self._ds(vals, ws), "v", "w", quantiles=qs
        )
        assert list(got["value"]) == want
        assert int(got["w_total"].iloc[0]) == int(ws.sum())

    def test_heavy_weight_dominates(self):
        from docstrange_ray.ops.rankstats import weighted_select_quantiles

        # one value holds 90% of the mass: it IS the median
        vals = [1.0, 2.0, 3.0, 4.0, 100.0]
        ws = [1, 1, 1, 1, 36]
        got = weighted_select_quantiles(
            self._ds(vals, ws), "v", "w", quantiles=((1, 2),)
        )
        assert got["value"].iloc[0] == 100.0

    def test_zero_and_null_weights_dropped(self):
        from docstrange_ray.ops.rankstats import weighted_select_quantiles

        vals = [5.0, 1.0, 9.0]
        ws = [0, 3, 0]
        got = weighted_select_quantiles(
            self._ds(vals, ws), "v", "w", quantiles=((1, 2),)
        )
        assert got["value"].iloc[0] == 1.0

    def test_partition_invariance(self):
        from docstrange_ray.ops.rankstats import weighted_select_quantiles

        rng = np.random.RandomState(7)
        vals = rng.randn(300)
        ws = rng.randint(1, 9, size=300)
        a = weighted_select_quantiles(self._ds(vals, ws, 1), "v", "w")
        b = weighted_select_quantiles(self._ds(vals, ws, 9), "v", "w")
        pd.testing.assert_frame_equal(a, b)
