"""Relational / composed ops vs DuckDB at sf0.001 — the pytest-side gate
mirroring the driver's per-round oracle comparison (the driver runs the
same comparisons at sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_match(ray_res, sql: str, con) -> None:
    rdf = ray_res.to_pandas() if hasattr(ray_res, "to_pandas") else pd.DataFrame(ray_res)
    odf = con.execute(sql).fetchdf()
    a, b = _norm(rdf), _norm(odf)
    assert a.shape == b.shape, (a.shape, b.shape)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.number):
            assert np.allclose(a[c], b[c], atol=1e-9), c
        else:
            assert a[c].equals(b[c]), c


@pytest.mark.usefixtures("ray_session")
class TestRelationalOracles:
    def test_q1_pricing(self, con):
        from docstrange_ray import relational

        _assert_match(relational.q1_pricing(SF), relational.Q1_SQL, con)

    def test_events_hourly(self, con):
        from docstrange_ray import relational

        _assert_match(relational.events_hourly(SF), relational.EVENTS_HOURLY_SQL, con)

    def test_events_sliding(self, con):
        from docstrange_ray import relational

        _assert_match(relational.events_sliding(SF), relational.EVENTS_SLIDING_SQL, con)

    def test_events_last_order_asof(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.events_last_order(SF), relational.EVENTS_LAST_ORDER_SQL, con
        )

    def test_events_last_order_copartitioned_plan(self, con):
        """The large-build-side plan (tag-union + ONE key shuffle +
        block-local merge_asof) must stay oracle-green when forced —
        it's what 'auto' selects once orders outgrow the broadcast
        bound."""
        from docstrange_ray import relational

        _assert_match(
            relational.events_last_order(SF, plan="copartition"),
            relational.EVENTS_LAST_ORDER_SQL,
            con,
        )

    def test_user_sessions(self, con):
        from docstrange_ray import relational

        _assert_match(relational.user_sessions(SF), relational.USER_SESSIONS_SQL, con)

    def test_order_event_window(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.order_event_window(SF),
            relational.ORDER_EVENT_WINDOW_SQL,
            con,
        )

    def test_priority_returned_orders(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.priority_returned_orders(SF),
            relational.PRIORITY_RETURNED_SQL,
            con,
        )

    def test_order_count_distribution(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.order_count_distribution(SF),
            relational.ORDER_COUNT_DIST_SQL,
            con,
        )

    def test_user_running_total(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.user_running_total(SF),
            relational.USER_RUNNING_TOTAL_SQL,
            con,
        )

    def test_q6_revenue(self, con):
        from docstrange_ray import relational

        res = relational.q6_revenue(SF)
        _assert_match(res, relational.Q6_SQL, con)
        # the pushdown band must actually select something at sf0.001
        assert res.to_pandas()["n_rows"].iloc[0] > 0

    def test_small_quantity_revenue(self, con):
        from docstrange_ray import relational

        res = relational.small_quantity_revenue(SF)
        _assert_match(res, relational.SMALL_QUANTITY_REVENUE_SQL, con)
        assert res.to_pandas()["n_rows"].iloc[0] > 0

    def test_top_supplier_revenue(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.top_supplier_revenue(SF),
            relational.TOP_SUPPLIER_REVENUE_SQL,
            con,
        )

    def test_revenue_rollup(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.revenue_rollup(SF),
            relational.REVENUE_ROLLUP_SQL,
            con,
        )

    def test_length_histogram(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.length_histogram(SF),
            relational.LENGTH_HISTOGRAM_SQL,
            con,
        )

    def test_length_dispersion(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.length_dispersion(SF),
            relational.LENGTH_DISPERSION_SQL,
            con,
        )

    def test_event_affinity(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.event_affinity(SF),
            relational.EVENT_AFFINITY_SQL,
            con,
        )

    def test_daily_anomalies(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.daily_anomalies(SF),
            relational.DAILY_ANOMALIES_SQL,
            con,
        )

    def test_user_journeys(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.user_journeys(SF),
            relational.USER_JOURNEYS_SQL,
            con,
        )

    def test_user_interarrival(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.user_interarrival(SF),
            relational.USER_INTERARRIVAL_SQL,
            con,
        )

    def test_source_decile(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.source_decile(SF),
            relational.SOURCE_DECILE_SQL,
            con,
        )

    def test_ntile_small_group_parity(self, con, ray_session):
        # n < k: NTILE hands out one row per bucket 1..n — pin against
        # DuckDB on a 7-row group
        import pyarrow as pa
        import pyarrow.parquet

        from docstrange_ray import relational

        tbl = pa.Table.from_pylist(
            [{"doc_id": i, "source": "s", "n_chars": 100 + i} for i in range(7)]
        )
        import os, tempfile
        d = tempfile.mkdtemp()
        pa.parquet.write_table(tbl, os.path.join(d, "documents.parquet"))
        got = (
            relational.source_decile(d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["decile"].tolist() == [1, 2, 3, 4, 5, 6, 7]

    def test_source_percent_rank(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.source_percent_rank(SF),
            relational.SOURCE_PERCENT_RANK_SQL,
            con,
        )

    def test_hourly_trend(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.hourly_trend(SF),
            relational.HOURLY_TREND_SQL,
            con,
        )

    def test_event_user_reach(self, con):
        from docstrange_ray import relational

        _assert_match(
            relational.event_user_reach(SF),
            relational.EVENT_USER_REACH_SQL,
            con,
        )

    def test_curated_docs(self, con):
        import ray.data

        from docstrange_ray.ops.curate import curated_docs

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        sql = """
            WITH scored AS (
                SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_md5,
                       ROUND(0.4 * LEAST(n_words / 100.0, 1.0)
                           + 0.3 * EXP(-0.5 * POW((CAST(sum_wlen AS DOUBLE) / GREATEST(n_words, 1) - 5.0) / 3.0, 2))
                           + 0.3 * LEAST(CAST(n_stop AS DOUBLE) / GREATEST(n_words, 1) * 5.0, 1.0), 6) AS quality
                FROM (
                    SELECT doc_id, text,
                           CASE WHEN trim(text) = '' THEN 0
                                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
                           length(regexp_replace(text, '\\s', '', 'g')) AS sum_wlen,
                           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop
                    FROM documents)
            ), filtered AS (SELECT * FROM scored WHERE quality >= 0.5)
            SELECT doc_id, content_md5, quality FROM (
                SELECT doc_id, content_md5, quality,
                       MIN(doc_id) OVER (PARTITION BY content_md5) AS keep
                FROM filtered)
            WHERE doc_id = keep
        """
        _assert_match(curated_docs(docs, min_quality=0.5), sql, con)


@pytest.mark.usefixtures("ray_session")
class TestSoleLateSupplier:
    """Q21-shape (sole late shipper on a multi-supplier 'F' order):
    sf0.001 oracle parity + hand-built edge cases."""

    def test_vs_duckdb(self, con, ray_session):
        from docstrange_ray import relational

        _assert_match(
            relational.sole_late_supplier(SF), relational.SOLE_LATE_SUPPLIER_SQL, con
        )

    def test_edge_cases(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from docstrange_ray import relational

        d0 = pd.Timestamp("2024-01-01")
        late = d0 + pd.Timedelta(days=61)
        ontime = d0 + pd.Timedelta(days=59)
        li = pd.DataFrame(
            {
                # order 1: sole late supplier 10 among {10, 11} -> counts
                # order 2: single-supplier order, late -> excluded (no EXISTS)
                # order 3: two late suppliers -> excluded (NOT EXISTS fails)
                # order 4: non-'F' order, sole late -> excluded
                # order 5: supplier 10 late on one line, on time on another
                #          (MAX(late) per supplier) + on-time 12 -> counts
                "l_orderkey": [1, 1, 2, 3, 3, 4, 4, 5, 5, 5],
                "l_suppkey": [10, 11, 10, 11, 12, 10, 11, 10, 10, 12],
                "l_shipdate": [
                    late, ontime, late, late, late, late, ontime,
                    late, ontime, ontime,
                ],
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4, 5],
                "o_orderdate": [d0] * 5,
                "o_orderstatus": ["F", "F", "F", "O", "F"],
            }
        )
        sf = str(tmp_path)
        pq.write_table(pa.Table.from_pandas(li), f"{sf}/lineitem.parquet")
        pq.write_table(pa.Table.from_pandas(orders), f"{sf}/orders.parquet")
        got = (
            relational.sole_late_supplier(sf)
            .to_pandas()
            .sort_values("s_suppkey")
            .reset_index(drop=True)
        )
        exp = pd.DataFrame({"s_suppkey": [10], "numwait": [2]})
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestHashJoin:
    def test_inner_join_matches_pandas(self):
        import ray.data

        from docstrange_ray.shuffle import hash_join

        left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
        right = pd.DataFrame({"k": [2, 3, 3, 4], "rv": [20, 30, 31, 40]})
        out = hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), key="k"
        ).to_pandas()
        expect = left.merge(right, on="k", how="inner")
        a = out.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        b = expect.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        # check_dtype=False: blocks whose right side is empty upcast the
        # merged int column to float when Ray concatenates block outputs
        pd.testing.assert_frame_equal(
            a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
        )

    def test_left_join_keeps_unmatched(self):
        import ray.data

        from docstrange_ray.shuffle import hash_join

        left = pd.DataFrame({"k": [1, 2], "lv": ["a", "b"]})
        right = pd.DataFrame({"k": [2], "rv": [20]})
        out = hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), key="k", how="left"
        ).to_pandas()
        assert len(out) == 2
        assert out[out["k"] == 1]["rv"].isna().all()

    def test_column_collision_rejected(self):
        import ray.data

        from docstrange_ray.shuffle import hash_join

        df = pd.DataFrame({"k": [1], "v": [2]})
        with pytest.raises(ValueError, match="collision"):
            hash_join(ray.data.from_pandas(df), ray.data.from_pandas(df), key="k")


@pytest.mark.usefixtures("ray_session")
class TestAdaptiveFinal:
    """The bounded-final guard: coalesced combine under the row bound,
    real hash shuffle above it — same result either way."""

    def _partials(self, n_keys):
        import pyarrow as pa
        import ray.data

        rows = [
            {"k": f"key-{i % n_keys:05d}", "v": i % 7} for i in range(4 * n_keys)
        ]
        return ray.data.from_arrow(pa.Table.from_pylist(rows)), rows

    def _expected(self, rows):
        agg = {}
        for r in rows:
            agg[r["k"]] = agg.get(r["k"], 0) + r["v"]
        return agg

    def test_wide_key_space_falls_back_to_shuffle(self):
        from docstrange_ray.shuffle import adaptive_final

        ds, rows = self._partials(300)
        out = adaptive_final(
            ds,
            lambda df: df.groupby("k", as_index=False)["v"].sum(),
            keys=["k"],
            max_coalesced_rows=100
        ).take_all()
        got = {r["k"]: r["v"] for r in out}
        assert got == self._expected(rows)
        assert len(got) == 300

    def test_bounded_key_space_coalesces(self):
        from docstrange_ray.shuffle import adaptive_final

        ds, rows = self._partials(20)
        out = adaptive_final(
            ds,
            lambda df: df.groupby("k", as_index=False)["v"].sum(),
            keys=["k"],
            max_coalesced_rows=10_000
        ).take_all()
        got = {r["k"]: r["v"] for r in out}
        assert got == self._expected(rows)


class TestEventsFunnel:
    def test_funnel_semantics(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from docstrange_ray import relational

        ts = pd.to_datetime(
            [
                # user 1: view -> click -> purchase (completes)
                "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:20",
                # user 2: click BEFORE the first view (click must not count),
                # then view, then purchase without an intermediate click
                "2024-01-01 00:00", "2024-01-01 00:05", "2024-01-01 00:30",
                # user 3: view only
                "2024-01-01 01:00",
            ]
        )
        tbl = pa.table(
            {
                "event_id": pa.array(list(range(7)), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "purchase", "click", "view", "purchase", "view"]
                ),
            }
        )
        sf = str(tmp_path)
        pq.write_table(tbl, f"{sf}/events.parquet")
        out = relational.events_funnel(sf).to_pandas()
        assert out["user_id"].tolist() == [1]
        assert out.loc[0, "click_ts"] == pd.Timestamp("2024-01-01 00:10")

        import duckdb

        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.execute(relational.EVENTS_FUNNEL_SQL).df()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
        )


class TestFkAudit:
    def test_planted_orphans_counted(self, ray_session, tmp_path):
        """Synthetic mini-warehouse with KNOWN orphans: 2 orders point
        at a missing customer, 3 lineitems at a missing order — the
        orphan tallies must be exact (the TPC fixture has zero orphans,
        so this pins the detection path itself)."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from docstrange_ray import relational

        sf = str(tmp_path)
        pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
            f"{sf}/customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
                    "o_custkey": pa.array([1, 2, 99, 99], pa.int64()),
                }
            ),
            f"{sf}/orders.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([10, 10, 77, 77, 77], pa.int64()),
                    "l_partkey": pa.array([5, 5, 5, 5, 5], pa.int64()),
                    "l_suppkey": pa.array([7, 7, 7, 7, 7], pa.int64()),
                }
            ),
            f"{sf}/lineitem.parquet",
        )
        pq.write_table(
            pa.table({"p_partkey": pa.array([5], pa.int64())}),
            f"{sf}/part.parquet",
        )
        pq.write_table(
            pa.table({"s_suppkey": pa.array([7], pa.int64())}),
            f"{sf}/supplier.parquet",
        )
        out = relational.fk_audit(sf).to_pandas()
        got = {
            r.relation: (r.n_child, r.n_orphans) for r in out.itertuples()
        }
        assert got["orders.o_custkey->customer"] == (4, 2)
        assert got["lineitem.l_orderkey->orders"] == (5, 3)
        assert got["lineitem.l_partkey->part"] == (5, 0)
        assert got["lineitem.l_suppkey->supplier"] == (5, 0)

        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem", "part", "supplier"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        exp = con.execute(relational.FK_AUDIT_SQL).df()
        a = out.sort_values("relation").reset_index(drop=True)
        b = exp.sort_values("relation").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestEventTransitions:
    def test_transition_counts_and_tie_order(self, ray_session, tmp_path):
        """Bigram counts per user ordered by (ts, event_id) — the
        DUPLICATE-timestamp rows must order by event_id (rows 1 and 2
        share a ts: a->b then b->c, never a->c), and user boundaries
        must not produce cross-user transitions."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from docstrange_ray import relational

        ts = pd.to_datetime(
            [
                "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:10",
                "2024-01-01 00:00", "2024-01-01 00:05",
                "2024-01-01 09:00",
            ]
        )
        tbl = pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                "event_type": pa.array(["a", "b", "c", "c", "a", "b"]),
            }
        )
        sf = str(tmp_path)
        pq.write_table(tbl, f"{sf}/events.parquet")
        out = relational.event_transitions(sf).to_pandas()
        got = {
            (r.from_type, r.to_type): (r.n, r.p) for r in out.itertuples()
        }
        assert got == {
            ("a", "b"): (1, 1.0),
            ("b", "c"): (1, 1.0),
            ("c", "a"): (1, 1.0),
        }

        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.execute(relational.EVENT_TRANSITIONS_SQL).df()
        a = out.sort_values(["from_type", "to_type"]).reset_index(drop=True)
        b = exp.sort_values(["from_type", "to_type"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestPivotAgg:
    def test_pivot_matches_pandas(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from docstrange_ray.relational import pivot_agg

        rng = np.random.default_rng(5)
        n = 600
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 40, n),
                "event_type": rng.choice(["a", "b", "c", "zz"], n),
                "value": np.round(rng.uniform(0, 50, n), 2),
            }
        )
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(7)
        got = (
            pivot_agg(ds, "user_id", "event_type", "value", ["a", "b", "c"])
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        kept = df[df["event_type"].isin(["a", "b", "c"])].copy()
        kept["c_"] = np.round(kept["value"] * 100).astype(np.int64)
        exp = pd.DataFrame(index=sorted(kept["user_id"].unique()))
        for v in ["a", "b", "c"]:
            sub = kept[kept["event_type"] == v].groupby("user_id")["c_"]
            exp[f"cnt_{v}"] = sub.size().reindex(exp.index, fill_value=0)
            exp[f"sum_{v}_cents"] = sub.sum().reindex(exp.index, fill_value=0)
        exp = exp.astype(np.int64).rename_axis("user_id").reset_index()
        pd.testing.assert_frame_equal(
            got[exp.columns].astype(exp.dtypes.to_dict()), exp
        )
        # 'zz' rows ignored, absent combos are 0 not NaN
        assert got.isna().sum().sum() == 0

    def test_pivot_null_values_sum_as_zero(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from docstrange_ray.relational import pivot_agg

        tbl = pa.table(
            {
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "event_type": pa.array(["a", "a", "a"]),
                "value": pa.array([1.5, None, None], pa.float64()),
            }
        )
        got = (
            pivot_agg(ray.data.from_arrow(tbl), "user_id", "event_type", "value", ["a"])
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        # SQL semantics: COUNT(*) counts null-value rows, SUM skips them
        assert list(got["cnt_a"]) == [2, 1]
        assert list(got["sum_a_cents"]) == [150, 0]


class TestSCD2Merge:
    HIGH = "9999-12-31"

    def _dim(self, rows):
        import ray.data

        return ray.data.from_pandas(
            pd.DataFrame(
                rows,
                columns=["key", "addr", "bal", "valid_from", "valid_to"],
            )
        ).repartition(3)

    def _snap(self, rows):
        import ray.data

        return ray.data.from_pandas(
            pd.DataFrame(rows, columns=["key", "addr", "bal"])
        ).repartition(2)

    def _merge(self, dim, snap, date):
        from docstrange_ray.relational import scd2_merge

        return (
            scd2_merge(dim, snap, "key", ["addr", "bal"], date,
                       int_cols=["bal"])
            .to_pandas()
            .sort_values(["key", "valid_from"])
            .reset_index(drop=True)
        )

    def test_all_four_cases_and_closed_passthrough(self):
        dim = self._dim([
            # already-closed history row: must pass through untouched
            (1, "old", 5, "2019-01-01", "2020-01-01"),
            (1, "a1", 10, "2020-01-01", self.HIGH),   # unchanged
            (2, "a2", 20, "2020-01-01", self.HIGH),   # bal changes
            (3, "a3", 30, "2020-01-01", self.HIGH),   # absent from snap
        ])
        snap = self._snap([
            (1, "a1", 10),       # identical -> keep
            (2, "a2", 25),       # changed -> close + reopen
            (4, "a4", 40),       # insert
        ])
        got = self._merge(dim, snap, "2024-06-01")
        want = pd.DataFrame(
            [
                (1, "old", 5, "2019-01-01", "2020-01-01"),
                (1, "a1", 10, "2020-01-01", self.HIGH),
                (2, "a2", 20, "2020-01-01", "2024-06-01"),
                (2, "a2", 25, "2024-06-01", self.HIGH),
                (3, "a3", 30, "2020-01-01", self.HIGH),
                (4, "a4", 40, "2024-06-01", self.HIGH),
            ],
            columns=["key", "addr", "bal", "valid_from", "valid_to"],
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got["key"].dtype == "int64" and got["bal"].dtype == "int64"

    def test_second_generation_merge(self):
        # applying a second snapshot on the merged output closes the
        # reopened row again and never touches older generations
        dim = self._dim([(7, "x", 1, "2020-01-01", self.HIGH)])
        g1 = self._merge(dim, self._snap([(7, "x", 2)]), "2021-01-01")
        import ray.data

        g2 = self._merge(
            ray.data.from_pandas(g1), self._snap([(7, "y", 2)]),
            "2022-01-01",
        )
        want = pd.DataFrame(
            [
                (7, "x", 1, "2020-01-01", "2021-01-01"),
                (7, "x", 2, "2021-01-01", "2022-01-01"),
                (7, "y", 2, "2022-01-01", self.HIGH),
            ],
            columns=["key", "addr", "bal", "valid_from", "valid_to"],
        )
        pd.testing.assert_frame_equal(g2, want, check_dtype=False)

    def test_empty_snapshot_keeps_everything(self):
        dim = self._dim([(1, "a", 1, "2020-01-01", self.HIGH)])
        got = self._merge(dim, self._snap([]), "2024-01-01")
        assert len(got) == 1 and got.iloc[0]["valid_to"] == self.HIGH
