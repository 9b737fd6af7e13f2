"""Property-based (hypothesis) invariants for the distributed op
families added in round 3: randomized corpora and parameters against
in-test DuckDB oracles, at parallelisms that force real multi-block
execution. Complements the fixture-based oracle tests: these hunt the
boundary cases fixtures never contain (ties, tiny groups, degenerate
docs, sketch compression under adversarial skew)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.usefixtures("ray_session")

# words drawn from a small vocab (forces collisions/ties) plus an
# integer tail (forces MG compression and rare-gram pressure)
_small_vocab = st.sampled_from("aa bb cc dd ee ff".split())
_word = st.one_of(_small_vocab, st.integers(0, 999).map(lambda i: f"w{i}"))
_doc = st.lists(_word, min_size=0, max_size=40).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=25)


@settings(max_examples=8, deadline=None)
@given(docs=_docs, fraction=st.sampled_from([0.2, 0.25, 0.5]))
def test_heavy_tokens_equals_naive_group_by(docs, fraction):
    # k=8 satisfies the completeness precondition 1/(k+1) < fraction
    # for every drawn fraction, while still forcing real MG compression
    from docstrange_ray.ops.sketch import heavy_tokens

    tbl = pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    )
    got = heavy_tokens(
        ray.data.from_arrow(tbl).repartition(4), fraction=fraction, k=8
    ).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.sql(
        rf"""WITH words AS (
              SELECT UNNEST(list_filter(
                  regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
              FROM documents
            ), tot AS (SELECT COUNT(*) AS n FROM words)
            SELECT w AS token, COUNT(*) AS n_occurrences
            FROM words GROUP BY w
            HAVING COUNT(*) >= (SELECT {fraction} * n FROM tot)
            ORDER BY token"""
    ).df()
    if len(got) == 0 or exp.empty:
        # Ray drops zero-row blocks, so an empty Dataset cannot carry
        # schema into to_pandas — compare emptiness only
        assert len(got) == 0 and exp.empty
    else:
        got = got.sort_values("token").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["g1", "g2", "g3"]), st.integers(0, 20)),
        min_size=1,
        max_size=60,
    )
)
def test_ntile_and_percent_rank_match_duckdb(rows):
    import os
    import tempfile

    from docstrange_ray import relational

    tbl = pa.Table.from_pylist(
        [
            {"doc_id": i, "source": g, "n_chars": v}
            for i, (g, v) in enumerate(rows)
        ]
    )
    d = tempfile.mkdtemp()
    pa.parquet.write_table(tbl, os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.register("documents", tbl)

    got_n = (
        relational.source_decile(d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp_n = (
        con.sql(relational.SOURCE_DECILE_SQL + " ORDER BY doc_id").df()
    )
    pd.testing.assert_frame_equal(got_n, exp_n, check_dtype=False)

    got_p = (
        relational.source_percent_rank(d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp_p = con.sql(relational.SOURCE_PERCENT_RANK_SQL + " ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(got_p, exp_p, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.sampled_from(["same body", "same  body", "other", "third thing", ""]),
        min_size=1,
        max_size=20,
    ),
    split=st.integers(0, 19),
)
def test_incremental_dedup_invariants(texts, split):
    from docstrange_ray.ops.dedup import incremental_dedup
    from docstrange_ray.ops.textstats import content_fingerprint

    tbl = pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    split = min(split, len(texts))
    base_tbl = tbl.slice(0, split)
    out = incremental_dedup(
        ray.data.from_arrow(tbl).repartition(3),
        ray.data.from_arrow(base_tbl) if split else ray.data.from_arrow(
            tbl.schema.empty_table()
        ),
    ).to_pandas()

    fp = content_fingerprint(tbl).to_pandas()
    base_hashes = set(fp["content_md5"].iloc[:split])
    expected = set(fp["content_md5"]) - base_hashes
    if len(out) == 0:
        # empty Ray Datasets drop their schema; emptiness is the claim
        assert expected == set()
        return
    # survivors never collide with the base snapshot
    assert not (set(out["content_md5"]) & base_hashes)
    # one survivor per hash, and it is the minimal doc_id holder
    assert out["content_md5"].is_unique
    for h, did in zip(out["content_md5"], out["doc_id"]):
        holders = fp.loc[fp["content_md5"] == h, "doc_id"]
        assert did == holders.min()
    # completeness: every non-base hash survives exactly once
    assert set(out["content_md5"]) == expected


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=32), min_size=1, max_size=150
    )
)
def test_mrl_exact_when_group_fits_k(vals):
    from docstrange_ray.ops.sketch import approx_quantiles

    tbl = pa.Table.from_pylist([{"g": "a", "v": float(v)} for v in vals])
    got = approx_quantiles(
        ray.data.from_arrow(tbl).repartition(3), value_col="v", group_key="g", k=200
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(
        """SELECT quantile_disc(v, 0.50) AS q50, quantile_disc(v, 0.90) AS q90,
                  quantile_disc(v, 0.99) AS q99
           FROM t"""
    ).df()
    for c in ("q50", "q90", "q99"):
        assert got[c].iloc[0] == pytest.approx(exp[c].iloc[0], abs=0)


@settings(max_examples=8, deadline=None)
@given(
    ws=st.lists(st.floats(0.01, 100.0, allow_nan=False), min_size=1, max_size=80),
    k=st.integers(1, 20),
)
def test_weighted_sample_invariance_and_duckdb(ws, k):
    from docstrange_ray.ops.sampling import weighted_sample

    tbl = pa.Table.from_pylist(
        [{"id": i, "w": float(w)} for i, w in enumerate(ws)]
    )

    def run(parts):
        return (
            weighted_sample(
                ray.data.from_arrow(tbl).repartition(parts),
                k=k, weight_col="w", id_col="id",
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )

    a, b = run(1), run(5)
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = (
        con.sql(
            rf"""SELECT id, w,
                  ROUND(POW(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 16))::UBIGINT
                            / 18446744073709551616.0, 1.0 / w), 6) AS priority
               FROM t WHERE w > 0
               ORDER BY POW(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 16))::UBIGINT
                            / 18446744073709551616.0, 1.0 / w) DESC, id
               LIMIT {k}"""
        )
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, exp, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 8), st.sampled_from(["v", "c", "p"])),
        min_size=1,
        max_size=80,
    )
)
def test_event_affinity_random_vs_duckdb(events):
    import os
    import tempfile

    from docstrange_ray import relational

    tbl = pa.Table.from_pylist(
        [
            {
                "user_id": u,
                "event_type": t,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
            }
            for i, (u, t) in enumerate(events)
        ]
    )
    d = tempfile.mkdtemp()
    pa.parquet.write_table(tbl, os.path.join(d, "events.parquet"))
    got = relational.event_affinity(d).to_pandas()
    con = duckdb.connect()
    con.register("events", tbl)
    exp = con.execute(relational.EVENT_AFFINITY_SQL).fetchdf()
    if len(got) == 0 or exp.empty:
        assert len(got) == 0 and exp.empty
        return
    got = got.sort_values(["type_a", "type_b"]).reset_index(drop=True)
    exp = exp.sort_values(["type_a", "type_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(
    counts=st.lists(
        st.tuples(st.integers(0, 9), st.integers(1, 40)),  # (day offset, events)
        min_size=2,
        max_size=12,
    )
)
def test_daily_anomalies_random_vs_duckdb(counts):
    import os
    import tempfile

    from docstrange_ray import relational

    rows = []
    for day, n in counts:
        for j in range(n):
            rows.append(
                {
                    "event_type": "x",
                    "ts": pd.Timestamp("2024-03-01")
                    + pd.Timedelta(days=day, seconds=j),
                }
            )
    tbl = pa.Table.from_pylist(rows)
    d = tempfile.mkdtemp()
    pa.parquet.write_table(tbl, os.path.join(d, "events.parquet"))
    got = relational.daily_anomalies(d).to_pandas()
    con = duckdb.connect()
    con.register("events", tbl)
    exp = con.execute(relational.DAILY_ANOMALIES_SQL).fetchdf()
    if len(got) == 0 or exp.empty:
        assert len(got) == 0 and exp.empty
        return
    got = got.sort_values(["event_type", "day"]).reset_index(drop=True)
    exp = exp.sort_values(["event_type", "day"]).reset_index(drop=True)
    for c in ("event_type", "n_events"):
        assert got[c].tolist() == exp[c].tolist()
    assert (
        pd.to_datetime(got["day"]).tolist() == pd.to_datetime(exp["day"]).tolist()
    )


@settings(max_examples=6, deadline=None)
@given(docs=_docs)
def test_doc_novelty_random_vs_duckdb(docs):
    from docstrange_ray.ops.textstats import doc_novelty

    tbl = pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    )
    got = doc_novelty(ray.data.from_arrow(tbl).repartition(3), n=2).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.sql(
        r"""WITH docs AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS ws
              FROM documents
            ), g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(ws, i, i + 1), ' ') AS gram
              FROM docs, UNNEST(range(1, len(ws))) AS t(i)
            ), dfreq AS (
              SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
            )
            SELECT g.doc_id, COUNT(*) AS n_grams,
                   SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS n_unique,
                   ROUND(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1.0
                         / COUNT(*), 6) AS novelty
            FROM g JOIN dfreq d USING (gram)
            GROUP BY g.doc_id ORDER BY g.doc_id"""
    ).df()
    if len(got) == 0 or exp.empty:
        assert len(got) == 0 and exp.empty
        return
    got = got.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=6, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 500), st.sampled_from(["v", "c", "p"])),
        min_size=1,
        max_size=60,
        unique_by=lambda e: (e[0], e[1]),  # unique (user, minute): tie-free LAG
    )
)
def test_journeys_and_interarrival_random_vs_duckdb(events):
    import os
    import tempfile

    from docstrange_ray import relational

    tbl = pa.Table.from_pylist(
        [
            {
                "event_id": i,
                "user_id": u,
                "event_type": t,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=m),
                "value": 1.0,
            }
            for i, (u, m, t) in enumerate(events)
        ]
    )
    d = tempfile.mkdtemp()
    pa.parquet.write_table(tbl, os.path.join(d, "events.parquet"))
    con = duckdb.connect()
    con.register("events", tbl)

    got_j = (
        relational.user_journeys(d)
        .to_pandas()
        .sort_values("journey")
        .reset_index(drop=True)
    )
    exp_j = (
        con.execute(relational.USER_JOURNEYS_SQL)
        .fetchdf()
        .sort_values("journey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_j, exp_j, check_dtype=False)

    got_i = relational.user_interarrival(d).to_pandas()
    exp_i = con.execute(relational.USER_INTERARRIVAL_SQL).fetchdf()
    if len(got_i) == 0 or exp_i.empty:
        assert len(got_i) == 0 and exp_i.empty
        return
    got_i = got_i.sort_values("user_id").reset_index(drop=True)
    exp_i = exp_i.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_i, exp_i, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(docs=_docs, terms=st.lists(_small_vocab, min_size=1, max_size=3, unique=True))
def test_bm25_random_vs_duckdb(docs, terms):
    """Random corpora + random small-vocab queries: the pinned float
    expression shape must reproduce DuckDB's doubles bit-for-bit."""
    from docstrange_ray.ops.textstats import bm25_topk

    tbl = pa.Table.from_pylist([{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    got = bm25_topk(ray.data.from_arrow(tbl).repartition(3), terms, k=10).to_pandas()
    if len(got):
        got = got.sort_values("doc_id").reset_index(drop=True)
    tl = ", ".join(f"'{t}'" for t in sorted(terms))
    pivots = "\n + ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN part END), 0)" for t in sorted(terms)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = (
        con.sql(
            rf"""WITH w AS (
              SELECT doc_id, UNNEST(list_filter(
                  regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term
              FROM documents
            ), dl AS (
              SELECT d.doc_id, COALESCE(t.dl, 0) AS dl
              FROM documents d LEFT JOIN (
                  SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id) t USING (doc_id)
            ), stats AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT SUM(dl) FROM dl) / (SELECT COUNT(*) FROM documents) AS avgdl
            ), tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM w
              WHERE term IN ({tl}) GROUP BY doc_id, term
            ), df AS (
              SELECT term, COUNT(DISTINCT doc_id) AS df FROM w
              WHERE term IN ({tl}) GROUP BY term
            ), parts AS (
              SELECT tf.doc_id, tf.term,
                     LN((stats.n - df.df + 0.5e0) / (df.df + 0.5e0) + 1.0e0)
                     * (tf.tf * (1.2e0 + 1.0e0))
                     / (tf.tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * (dl.dl / stats.avgdl)))
                     AS part
              FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
            )
            SELECT doc_id, ROUND(s, 6) AS score, matched FROM (
              SELECT doc_id, {pivots} AS s, COUNT(*) AS matched
              FROM parts GROUP BY doc_id)
            ORDER BY s DESC, doc_id LIMIT 10"""
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    if len(got) == 0 or exp.empty:
        assert len(got) == 0 and exp.empty
    else:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=80),
    descending=st.booleans(),
    parts=st.integers(2, 9),
    kind=st.sampled_from(["row_number", "rank", "dense_rank"]),
)
def test_global_row_number_random_vs_duckdb(vals, descending, parts, kind):
    """Random (heavily tied) keys at random partition counts: every
    rank kind must match its SQL window function at every parallelism."""
    from docstrange_ray.shuffle import global_row_number

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(vals)), pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    got = (
        global_row_number(
            ray.data.from_arrow(tbl).repartition(3),
            "v",
            descending=descending,
            num_partitions=parts,
            rank_kind=kind,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", tbl)
    order = "DESC" if descending else ""
    fn = {"row_number": "ROW_NUMBER()", "rank": "RANK()", "dense_rank": "DENSE_RANK()"}[kind]
    tie = ", doc_id" if kind == "row_number" else ""
    exp = (
        con.sql(
            f"SELECT doc_id, v, {fn} OVER (ORDER BY v {order}{tie}) AS rank FROM t"
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "v", "rank"]], exp[["doc_id", "v", "rank"]], check_dtype=False
    )


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["s1", "s2", "s3", "s4"]), _doc),
        min_size=1,
        max_size=40,
    )
)
def test_source_overlap_random_vs_duckdb(rows):
    from docstrange_ray.ops.textstats import source_vocab_overlap

    tbl = pa.Table.from_pylist([{"source": s, "text": t} for s, t in rows])
    got = source_vocab_overlap(ray.data.from_arrow(tbl).repartition(4)).to_pandas()
    if len(got):
        got = got.sort_values(["source_a", "source_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = (
        con.sql(
            r"""WITH sw AS (
              SELECT DISTINCT source, UNNEST(list_filter(
                  regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word
              FROM documents
            ), tot AS (SELECT source, COUNT(*) AS n FROM sw GROUP BY source),
            pairs AS (
              SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
              FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
              GROUP BY a.source, b.source)
            SELECT source_a, source_b, n_common,
                   ROUND(CAST(n_common AS DOUBLE) / (ta.n + tb.n - n_common), 6) AS jaccard
            FROM pairs
            JOIN tot ta ON ta.source = pairs.source_a
            JOIN tot tb ON tb.source = pairs.source_b
            ORDER BY source_a, source_b"""
        )
        .df()
        .reset_index(drop=True)
    )
    if len(got) == 0 or exp.empty:
        assert len(got) == 0 and exp.empty
    else:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=6, deadline=None)
@given(
    totals=st.lists(st.integers(1, 10_000), min_size=1, max_size=6),
    shares=st.lists(st.integers(0, 5), min_size=1, max_size=6),
)
def test_mixture_weights_realizes_targets(totals, shares):
    # random per-source totals + integer share weights (normalized);
    # invariants: rates in [0,1], the binding source rate == 1, and the
    # realized mixture equals the target exactly for targeted sources
    from docstrange_ray.ops.sampling import mixture_weights

    n = min(len(totals), len(shares))
    totals, shares = totals[:n], shares[:n]
    ssum = sum(shares)
    targets = {
        f"s{i}": (shares[i] / ssum if ssum else 0.0) for i in range(n)
    }
    rows = [{"source": f"s{i}", "n_chars": totals[i]} for i in range(n)]
    got = (
        mixture_weights(
            ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2),
            targets,
        )
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    assert not got.isna().any().any()
    assert ((got["sample_rate"] >= 0) & (got["sample_rate"] <= 1.0)).all()
    pos = got[got["target_share"] > 0]
    if len(pos):
        assert np.isclose(pos["sample_rate"].max(), 1.0, atol=1e-6)
        ev = pos["expected_value"].to_numpy()
        if ev.sum() > 0:
            assert np.allclose(
                ev / ev.sum(), pos["target_share"].to_numpy(), atol=1e-4
            )


@settings(max_examples=6, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_bench=st.integers(1, 6),
    n_corpus=st.integers(1, 30),
    threshold=st.sampled_from([0.2, 0.5, 0.9]),
)
def test_embedding_decontam_equals_brute_force(seed, n_bench, n_corpus, threshold):
    from docstrange_ray.numerics import round6
    from docstrange_ray.ops.decontam import embedding_decontaminate

    rng = np.random.default_rng(seed)
    bench = rng.normal(size=(n_bench, 8))
    corpus = rng.normal(size=(n_corpus, 8))

    def tbl(mat, start):
        return pa.table(
            {
                "vec_id": pa.array(range(start, start + len(mat)), pa.int64()),
                "embedding": pa.array(
                    [r.astype(np.float32) for r in mat], pa.list_(pa.float32())
                ),
            }
        )

    got = embedding_decontaminate(
        ray.data.from_arrow(tbl(corpus, 100)).repartition(3),
        ray.data.from_arrow(tbl(bench, 0)),
        threshold=threshold,
    ).to_pandas()
    if len(got) == 0:
        # empty Ray result loses its schema (known quirk) — normalize
        got = pd.DataFrame({"vec_id": [], "bench_id": [], "max_cos": []})
    got = got.sort_values("vec_id").reset_index(drop=True)
    # brute force on the same float32-stored vectors
    bn = bench.astype(np.float32).astype(np.float64)
    cn = corpus.astype(np.float32).astype(np.float64)
    bn /= np.linalg.norm(bn, axis=1, keepdims=True)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    sims = round6(cn @ bn.T)
    best = np.argmax(sims, axis=1)
    mx = sims[np.arange(len(best)), best]
    keep = np.nonzero(mx >= threshold)[0]
    assert got["vec_id"].tolist() == [100 + int(i) for i in keep]
    assert got["bench_id"].tolist() == [int(best[i]) for i in keep]
    assert np.allclose(got["max_cos"], mx[keep], atol=1e-9)
