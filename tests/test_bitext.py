"""Margin-based pair mining (ops/bitext.py) — exact plan pinned against
an independent pure-numpy reference AND the DuckDB oracle; bucketed IVF
plan pinned on planted cross-side near-duplicates and on measured
argmax recall vs the exact plan."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

import __ray_entry__ as entrymod
from docstrange_ray.numerics import round6
from docstrange_ray.ops import bitext

SF = "/root/testdata/sf0.001"


def _reference_margin(rows, k=4, threshold=1.0):
    """Independent scalar-loop implementation (no shared code with the
    plans: cosines via explicit dot loops, top-k via sorted())."""
    import math

    def cos6(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1e-12
        nb = math.sqrt(sum(x * x for x in b)) or 1e-12
        v = num / (na * nb)
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

    def r6(v):
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

    xs = [(r["vec_id"], r["embedding"]) for r in rows if r["label"] % 2 == 0]
    ys = [(r["vec_id"], r["embedding"]) for r in rows if r["label"] % 2 == 1]
    if not xs or not ys:
        return []
    # full cross cosines
    c = {(xi, yi): cos6(xe, ye) for xi, xe in xs for yi, ye in ys}
    topx = {
        xi: sorted(((c[(xi, yi)], yi) for yi, _ in ys), key=lambda t: (-t[0], t[1]))[:k]
        for xi, _ in xs
    }
    topy = {
        yi: sorted(((c[(xi, yi)], xi) for xi, _ in xs), key=lambda t: (-t[0], t[1]))[:k]
        for yi, _ in ys
    }
    mx = {xi: r6(sum(v for v, _ in tl) / len(tl)) for xi, tl in topx.items()}
    my = {yi: r6(sum(v for v, _ in tl) / len(tl)) for yi, tl in topy.items()}
    out = []
    for xi, _ in xs:
        best = None
        for cosv, yi in topx[xi]:
            margin = r6(cosv / ((mx[xi] + my[yi]) / 2))
            key = (-margin, -cosv, yi)
            if best is None or key < best[0]:
                best = (key, (xi, yi, cosv, margin))
        if best and best[1][3] >= threshold:
            out.append(best[1])
    return sorted(out)


@pytest.fixture(scope="module")
def small_corpus():
    rng = np.random.default_rng(31)
    rows = []
    for i in range(60):
        rows.append(
            {
                "vec_id": i,
                "embedding": rng.standard_normal(16).astype(np.float32).tolist(),
                "label": int(rng.integers(0, 10)),
            }
        )
    return rows


class TestMarginPairs:
    def test_broadcast_vs_reference(self, ray_session, small_corpus):
        ds = ray.data.from_arrow(pa.Table.from_pylist(small_corpus)).repartition(4)
        got = (
            bitext.margin_pairs(ds, k=4, threshold=1.0, plan="broadcast")
            .to_pandas()
            .sort_values(["src_id"])
            .reset_index(drop=True)
        )
        exp = _reference_margin(small_corpus, k=4, threshold=1.0)
        got_t = [tuple(r) for r in got.itertuples(index=False)]
        assert [(a, b) for a, b, _, _ in got_t] == [(a, b) for a, b, _, _ in exp]
        for (_, _, gc, gm), (_, _, ec, em) in zip(got_t, exp):
            assert gc == pytest.approx(ec, abs=2e-6)
            assert gm == pytest.approx(em, abs=2e-6)

    def test_broadcast_vs_duckdb_oracle(self, ray_session):
        got = (
            entrymod.queries()["margin_mined_pairs"](SF)
            .to_pandas()
            .sort_values("src_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
        )
        exp = (
            con.execute(entrymod.oracle_sql()["margin_mined_pairs"])
            .df()
            .sort_values("src_id")
            .reset_index(drop=True)
        )
        assert got.equals(exp)

    def test_bucketed_planted_recall(self, ray_session):
        # 40 cross-side near-identical pairs among 400 filler vectors:
        # every planted pair must be mined by BOTH plans (margin >> 1 for
        # a near-copy), and the bucketed argmax must agree on them.
        rng = np.random.default_rng(7)
        base = rng.standard_normal((40, 64))
        noise = base + 0.01 * rng.standard_normal((40, 64))
        fill = rng.standard_normal((400, 64))
        rows, vid = [], 0
        for i in range(40):
            rows.append(
                {"vec_id": vid, "embedding": base[i].astype(np.float32).tolist(), "label": 0}
            )
            vid += 1
            rows.append(
                {"vec_id": vid, "embedding": noise[i].astype(np.float32).tolist(), "label": 1}
            )
            vid += 1
        for i in range(400):
            rows.append(
                {"vec_id": vid, "embedding": fill[i].astype(np.float32).tolist(), "label": i % 2}
            )
            vid += 1
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(8)
        planted = {(2 * i, 2 * i + 1) for i in range(40)}
        ex = bitext.margin_pairs(ds, k=4, threshold=1.0, plan="broadcast").to_pandas()
        bu = bitext.margin_pairs_bucketed(ds, k=4, threshold=1.0, n_probe=2).to_pandas()
        assert planted <= set(zip(ex.src_id, ex.tgt_id))
        assert planted <= set(zip(bu.src_id, bu.tgt_id))

    def test_bucketed_argmax_recall_floor(self, ray_session):
        # adversarial no-structure case (uniform random vectors): the
        # IVF multi-probe plan must still recover >= 80% of the exact
        # plan's argmax pairs at the default n_probe=4 (measured 0.91)
        ds = ray.data.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
        ex = bitext.margin_pairs(ds, k=4, threshold=1.0, plan="broadcast").to_pandas()
        bu = bitext.margin_pairs(ds, k=4, threshold=1.0, plan="bucketed").to_pandas()
        hit = ex.merge(bu, on=["src_id", "tgt_id"], how="inner")
        assert len(hit) / len(ex) >= 0.8

    def test_empty_side(self, ray_session):
        rows = [
            {"vec_id": i, "embedding": [float(i), 1.0], "label": 0} for i in range(6)
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        out = bitext.margin_pairs(ds, plan="broadcast").to_pandas()
        assert len(out) == 0

    def test_auto_gate(self, ray_session, small_corpus, monkeypatch):
        # under the brute limit -> broadcast; above -> bucketed
        from docstrange_ray.ops import dedup as dedup_mod

        ds = ray.data.from_arrow(pa.Table.from_pylist(small_corpus))
        called = {}
        monkeypatch.setattr(
            bitext,
            "margin_pairs_broadcast",
            lambda *a, **kw: called.setdefault("plan", "broadcast"),
        )
        monkeypatch.setattr(
            bitext,
            "margin_pairs_bucketed",
            lambda *a, **kw: called.setdefault("plan", "bucketed"),
        )
        bitext.margin_pairs(ds, plan="auto")
        assert called["plan"] == "broadcast"
        called.clear()
        monkeypatch.setattr(dedup_mod, "EMBED_BRUTE_ROW_LIMIT", 10)
        bitext.margin_pairs(ds, plan="auto")
        assert called["plan"] == "bucketed"
