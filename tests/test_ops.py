"""Training-data ops tests: dedup family, ANN, text stats — verified
against in-test DuckDB/numpy oracles on corpora constructed to contain
known duplicates/neighbors."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from docstrange_ray.ops import ann, dedup, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups():
    """20 base docs + exact dups + near dups (word-dropped copies)."""
    rng = np.random.RandomState(7)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(20):
        text = " ".join(rng.choice(words) for _ in range(60))
        rows.append({"doc_id": i, "text": text})
    rows.append({"doc_id": 100, "text": rows[0]["text"]})        # exact dup
    rows.append({"doc_id": 101, "text": "  " + rows[1]["text"] + "  "})  # ws dup
    near = rows[2]["text"].split()
    del near[5]
    rows.append({"doc_id": 102, "text": " ".join(near)})          # near dup
    return pa.Table.from_pylist(rows)


class TestExactDedup:
    def test_against_duckdb(self, docs_with_dups):
        ds = ray.data.from_arrow(docs_with_dups)
        got = dedup.exact_dedup_groups(ds).to_pandas()
        got = got.sort_values("content_md5").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", docs_with_dups)
        exp = con.sql(
            r"""SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_md5,
                     MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_dups
              FROM documents GROUP BY 1 ORDER BY 1"""
        ).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert (got["n_dups"] > 1).sum() == 2  # the two exact-dup groups


class TestIncrementalDedup:
    def test_against_duckdb(self, docs_with_dups):
        # base = doc_id < 10, increment = everything (so every base doc
        # collides; odd split exercises keep + drop + first-wins paths)
        base_tbl = docs_with_dups.filter(
            pa.compute.less(docs_with_dups.column("doc_id"), 10)
        )
        new_ds = ray.data.from_arrow(docs_with_dups)
        base_ds = ray.data.from_arrow(base_tbl)
        got = (
            dedup.incremental_dedup(new_ds, base_ds)
            .to_pandas()
            .sort_values("content_md5")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", docs_with_dups)
        exp = con.sql(
            r"""WITH fp AS (
                  SELECT doc_id,
                         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_md5
                  FROM documents
                ), base AS (
                  SELECT DISTINCT content_md5 FROM fp WHERE doc_id < 10
                )
                SELECT MIN(doc_id) AS doc_id, content_md5
                FROM fp
                WHERE content_md5 NOT IN (SELECT content_md5 FROM base)
                GROUP BY content_md5 ORDER BY content_md5"""
        ).df()[["doc_id", "content_md5"]]
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # doc 100 (exact dup of base doc 0) and 101 (ws-dup of base doc
        # 1) must be dropped; near-dup 102 differs exactly -> kept
        assert 100 not in set(got["doc_id"]) and 101 not in set(got["doc_id"])
        assert 102 in set(got["doc_id"])

    def test_increment_fully_covered_is_empty(self, docs_with_dups):
        ds = ray.data.from_arrow(docs_with_dups)
        # increment == base -> everything collides -> zero survivors
        out = dedup.incremental_dedup(ds, ds).to_pandas()
        assert len(out) == 0

    def test_first_wins_inside_increment(self):
        new_tbl = pa.Table.from_pylist(
            [
                {"doc_id": 7, "text": "same body"},
                {"doc_id": 3, "text": "same  body "},  # ws-variant, same hash
                {"doc_id": 9, "text": "other body"},
            ]
        )
        base_tbl = pa.Table.from_pylist([{"doc_id": 1, "text": "unrelated"}])
        out = (
            dedup.incremental_dedup(
                ray.data.from_arrow(new_tbl), ray.data.from_arrow(base_tbl)
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [3, 9]


class TestMinHash:
    def test_signature_similarity_tracks_jaccard(self):
        a = "the quick brown fox jumps over the lazy dog again and again today"
        b = a.replace("dog", "cat")
        sa, sb = dedup.minhash_signature(a), dedup.minhash_signature(b)
        sim = (sa == sb).mean()
        assert 0.3 < sim < 1.0
        assert (sa == dedup.minhash_signature(a)).all()  # deterministic

    def test_near_dup_pairs_finds_planted(self, docs_with_dups):
        ds = ray.data.from_arrow(docs_with_dups)
        pairs = dedup.near_dup_pairs(ds, threshold=0.8)
        found = {(p["doc_id_a"], p["doc_id_b"]) for p in pairs}
        assert (0, 100) in found   # exact dup → jaccard 1.0
        assert (1, 101) in found
        assert (2, 102) in found   # near dup (1 word dropped)
        for p in pairs:
            assert p["jaccard"] >= 0.8


class TestSimHash:
    def test_near_pairs(self, docs_with_dups):
        ds = ray.data.from_arrow(docs_with_dups)
        pairs = dedup.simhash_near_pairs(ds, max_hamming=3).to_pandas()
        found = {tuple(r) for r in pairs[["doc_id_a", "doc_id_b"]].values}
        assert (0, 100) in found  # identical text → hamming 0
        assert (pairs["hamming"] <= 3).all()

    def test_simhash_stable(self):
        assert dedup.simhash64("hello world") == dedup.simhash64("hello world")
        assert dedup.simhash64("hello world") != dedup.simhash64("goodbye world")


class TestEmbeddingOps:
    def test_brute_force_topk_matches_numpy(self):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        rows = ds.take_all()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        q = matn[:3]
        got = ann.brute_force_topk(ds, mat[:3], ids[:3].tolist(), k=5).to_pandas()
        for qi in range(3):
            cos = np.round(matn @ q[qi], 6)
            order = np.lexsort((ids, -cos))[:5]
            exp = set(ids[order])
            g = set(got[got["query_id"] == ids[qi]]["vec_id"])
            assert g == exp

    def test_lsh_topk_self_recall(self):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        rows = ds.take(20)
        mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        ids = [r["vec_id"] for r in rows]
        got = ann.lsh_topk(ds, mat, ids, k=5).to_pandas()
        # every query's own vector lands in its bucket → top hit is itself
        for qid in ids:
            sub = got[got["query_id"] == qid]
            assert len(sub) > 0 and qid in set(sub["vec_id"])

    def test_embedding_dup_pairs_threshold(self):
        tbl = pa.table(
            {
                "vec_id": pa.array([1, 2, 3], pa.int64()),
                "embedding": [[1.0, 0.0], [1.0, 0.001], [0.0, 1.0]],
            }
        )
        ds = ray.data.from_arrow(tbl)
        pairs = dedup.embedding_dup_pairs(ds, threshold=0.99).to_pandas()
        assert set(zip(pairs["id_a"], pairs["id_b"])) == {(1, 2)}

    def test_auto_plan_selection_both_sizes(self):
        # the round-2 scale-killer: plan='auto' must route a corpus over
        # the brute limit to the bucketed (distributed) plan instead of
        # take_all()-ing the embedding table onto the driver
        tbl = pa.table(
            {
                "vec_id": pa.array(list(range(8)), pa.int64()),
                "embedding": [[1.0, 0.0]] * 4 + [[0.0, 1.0]] * 4,
            }
        )
        ds = ray.data.from_arrow(tbl)
        assert dedup.resolve_embedding_plan(ds) == "broadcast"
        assert dedup.resolve_embedding_plan(ds, brute_limit=4) == "bucketed"
        # dispatch above the limit produces bucketed-plan results (exact
        # duplicates always collide in every hyperplane set -> found)
        pairs = dedup.embedding_dup_pairs(
            ds, threshold=0.99, brute_limit=4
        ).to_pandas()
        assert {(0, 1), (0, 2), (4, 5)} <= set(zip(pairs["id_a"], pairs["id_b"]))


class TestTextStats:
    def test_token_and_quality_vs_duckdb(self):
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["The cat, sat.", "  ", "a b  c the of"],
            }
        )
        got_t = textstats.token_stats(tbl).to_pydict()
        assert got_t["n_ws_tokens"] == [3, 0, 5]
        assert got_t["n_bpe_tokens"] == [5, 0, 5]
        got_q = textstats.quality_stats(tbl).to_pydict()
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = con.sql(
            r"""SELECT CAST(length(text) AS BIGINT) AS n_chars_m,
                     CAST(CASE WHEN trim(text)='' THEN 0 ELSE len(regexp_split_to_array(trim(text),'\s+')) END AS BIGINT) AS n_words,
                     CAST(length(regexp_replace(text,'\s','','g')) AS BIGINT) AS sum_word_len,
                     CAST(length(regexp_replace(text,'[^.!?,;:]','','g')) AS BIGINT) AS n_punct,
                     CAST(len(list_filter(regexp_split_to_array(lower(trim(text)),'\s+'), x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stopwords
              FROM documents ORDER BY doc_id"""
        ).df()
        for col in exp.columns:
            assert got_q[col] == exp[col].tolist(), col

    def test_langid(self):
        lid = textstats.LangId()
        assert lid.predict("the cat is in the house and it is happy") == "en"
        assert lid.predict("der hund ist nicht in der küche und das ist gut") == "de"
        assert lid.predict("你好 世界") == "zh"
        assert lid.predict("") == "und"

    def test_quality_score_bounds(self):
        tbl = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["the quick brown fox " * 30]})
        q = textstats.quality_score(tbl).to_pydict()["quality"][0]
        assert 0.0 <= q <= 1.0

    def test_rolling_fingerprint_stable_and_shift_sensitive(self):
        tbl = pa.table(
            {"doc_id": pa.array([1, 2, 3], pa.int64()),
             "text": ["one two three four five six seven eight nine",
                      "one two three four five six seven eight nine",
                      "totally different words in this one here now ok"]}
        )
        fp = textstats.rolling_fingerprint(tbl).to_pydict()["fingerprint"]
        assert fp[0] == fp[1]
        assert fp[0] != fp[2]


class TestMultimodal:
    def test_decode_plumbing(self):
        from docstrange_ray.ops import multimodal as mm

        refs = [f"media://d/{i}" for i in range(40)]
        media = mm.synth_media_table(refs)
        ds = ray.data.from_arrow(media)
        out = mm.decode_features(ds, concurrency=(1, 2)).to_pandas()
        assert len(out) == 40
        assert set(out["media_ref"]) == set(refs)
        assert all(len(f) == 32 for f in out["feature"])
        assert out["mean_intensity"].between(0, 255).all()

    def test_pil_backend_is_gated(self):
        from docstrange_ray.ops import multimodal as mm

        with pytest.raises(NotImplementedError):
            mm.ImageDecodeActor(backend="pil")


@pytest.mark.usefixtures("ray_session")
class TestSampling:
    def test_hash_sample_deterministic_and_fractional(self):
        import ray.data

        from docstrange_ray.ops.sampling import hash_sample

        ds = ray.data.range(5000)
        a = sorted(r["id"] for r in hash_sample(ds, 0.2, key="id").take_all())
        b = sorted(r["id"] for r in hash_sample(ds, 0.2, key="id").take_all())
        assert a == b  # deterministic
        assert 0.15 < len(a) / 5000 < 0.25  # ~fraction

    def test_full_and_zero_fraction_edges(self):
        # fraction >= 1.0 must keep EVERYTHING (regression: the naive
        # 5-char '10000' threshold lexicographically kept only ~6%)
        import ray.data

        from docstrange_ray.ops.sampling import hash_sample, hash_split

        ds = ray.data.range(1000)
        assert len(hash_sample(ds, 1.0, key="id").take_all()) == 1000
        assert len(hash_sample(ds, 0.0, key="id").take_all()) == 0
        train, hold = hash_split(ds, 1.0, key="id")
        assert len(train.take_all()) == 1000
        assert len(hold.take_all()) == 0

    def test_hash_split_disjoint_exhaustive(self):
        import ray.data

        from docstrange_ray.ops.sampling import hash_split

        ds = ray.data.range(2000)
        train, hold = hash_split(ds, 0.8, key="id")
        t = {r["id"] for r in train.take_all()}
        h = {r["id"] for r in hold.take_all()}
        assert t.isdisjoint(h)
        assert len(t) + len(h) == 2000
        assert 0.7 < len(t) / 2000 < 0.9

    def _leak_corpus(self):
        """60 distinct docs plus 6 planted near-twin groups (identical
        text -> jaccard 1.0 pairs): twins MUST share a split."""
        import pyarrow as pa

        import ray.data

        texts, ids = [], []
        for i in range(60):
            ids.append(i)
            texts.append(
                f"unique document number {i} about topic {i * 7 % 13} "
                f"with words {i * 3} {i * 5} {i * 11} that share nothing"
            )
        for g in range(6):
            base = f"planted twin group {g} repeated content " * 5
            for j in range(2):
                ids.append(1000 + g * 10 + j)
                texts.append(base)
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts),
                }
            )
        ).repartition(3)

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_leakage_safe_split_twins_together(self, plan):
        from docstrange_ray.ops.sampling import leakage_safe_split

        ds = self._leak_corpus()
        rows = leakage_safe_split(ds, plan=plan).take_all()
        assert len(rows) == 72  # exhaustive, one row per doc
        by_id = {r["doc_id"]: r for r in rows}
        assert set(r["split"] for r in rows) <= {"train", "val", "test"}
        for g in range(6):
            a, b = by_id[1000 + g * 10], by_id[1000 + g * 10 + 1]
            assert a["cluster"] == b["cluster"] == 1000 + g * 10
            assert a["split"] == b["split"]  # the leakage guarantee
        # non-members cluster as themselves
        assert by_id[5]["cluster"] == 5

    def test_leakage_safe_split_plan_parity(self):
        from docstrange_ray.ops.sampling import leakage_safe_split

        ds = self._leak_corpus()
        key = lambda rows: sorted(
            (r["doc_id"], r["cluster"], r["split"]) for r in rows
        )
        a = key(leakage_safe_split(ds, plan="broadcast").take_all())
        b = key(leakage_safe_split(ds, plan="join").take_all())
        assert a == b


@pytest.mark.usefixtures("ray_session")
class TestIVF:
    def test_ivf_topk_recall(self):
        import ray.data

        from docstrange_ray.ops import ann

        rng = np.random.RandomState(11)
        # clustered corpus so IVF buckets are meaningful
        centers = rng.standard_normal((4, 16)) * 4
        vecs = np.concatenate(
            [c + rng.standard_normal((50, 16)) * 0.3 for c in centers]
        )
        rows = [
            {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))
        ]
        ds = ray.data.from_items(rows)
        q = vecs[:4]
        approx = ann.ivf_topk(ds, q, [0, 1, 2, 3], k=5, n_centroids=8, n_probe=3)
        exact = ann.brute_force_topk(ds, q, [0, 1, 2, 3], k=5)
        adf, edf = approx.to_pandas(), exact.to_pandas()
        recalls = []
        for qid in range(4):
            a = set(adf[adf.query_id == qid]["vec_id"])
            e = set(edf[edf.query_id == qid]["vec_id"])
            recalls.append(len(a & e) / len(e))
        assert np.mean(recalls) >= 0.8, recalls


@pytest.mark.usefixtures("ray_session")
class TestHotBucketCap:
    def test_mass_duplicate_bucket_is_linear(self):
        import ray.data

        from docstrange_ray.ops import dedup

        # 200 identical docs + 2 distinct: every band bucket for the
        # identical text holds 200 members -> all-pairs would be ~20k
        # pairs/band; the star cap bounds it to n-1 per band
        rows = [{"doc_id": i, "text": "the same exact text " * 5} for i in range(200)]
        rows += [
            {"doc_id": 900, "text": "completely different words entirely"},
            {"doc_id": 901, "text": "another unrelated document body"},
        ]
        ds = ray.data.from_items(rows)
        cands = dedup.minhash_candidates(ds).take_all()
        # dedup on pair: star pattern emits (0, j) pairs only
        pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in cands}
        assert len(pairs) <= 199  # linear, not quadratic
        assert all(a == 0 for a, _ in pairs)
        # every duplicate is still connected to the representative
        assert {b for _, b in pairs} == set(range(1, 200))


@pytest.mark.usefixtures("ray_session")
class TestBucketedEmbeddingDedup:
    def test_finds_planted_near_dups(self):
        import ray.data

        from docstrange_ray.ops import dedup

        rng = np.random.RandomState(3)
        base = rng.standard_normal((40, 16))
        rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
        # planted near-duplicates: tiny perturbations of vectors 0..4
        for k in range(5):
            rows.append(
                {
                    "vec_id": 100 + k,
                    "embedding": (base[k] + rng.standard_normal(16) * 0.01).tolist(),
                }
            )
        ds = ray.data.from_items(rows)
        pairs = dedup.embedding_dup_pairs_bucketed(ds, threshold=0.98).to_pandas()
        found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        # identical-bucket probability is high for near-identical vectors;
        # require most planted pairs recovered
        planted = {(k, 100 + k) for k in range(5)}
        assert len(found & planted) >= 4, found

    def test_multi_set_recall_vs_brute(self):
        """Round-2 recall fix: two independent hyperplane sets recover
        >= 0.9 of the brute-force pair set on a planted-dup corpus (the
        single-set version misses every pair crossing any of its 8
        planes)."""
        import ray.data

        from docstrange_ray.ops import dedup

        rng = np.random.RandomState(17)
        base = rng.standard_normal((60, 16))
        rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(60)]
        for k in range(20):
            rows.append(
                {
                    "vec_id": 200 + k,
                    "embedding": (base[k] + rng.standard_normal(16) * 0.02).tolist(),
                }
            )
        ds = ray.data.from_items(rows)
        brute = dedup.embedding_dup_pairs(ds, threshold=0.95).to_pandas()
        exact = {(a, b) for a, b in zip(brute["id_a"], brute["id_b"])}
        approx_df = dedup.embedding_dup_pairs_bucketed(
            ds, threshold=0.95, n_sets=2
        ).to_pandas()
        approx = {(a, b) for a, b in zip(approx_df["id_a"], approx_df["id_b"])}
        assert approx <= exact  # no false positives (same threshold)
        assert len(approx & exact) / max(1, len(exact)) >= 0.9, (
            len(approx & exact),
            len(exact),
        )


@pytest.mark.usefixtures("ray_session")
class TestFrameSampling:
    def test_frame_plumbing(self):
        import ray.data

        from docstrange_ray.ops import multimodal

        tbl = multimodal.synth_media_table([f"m://{i}" for i in range(10)])
        import pyarrow as pa

        tbl = tbl.set_column(
            tbl.schema.get_field_index("n_frames"),
            "n_frames",
            pa.array([12] * 10, type=pa.int32()),
        )
        rows = multimodal.sample_frames(ray.data.from_arrow(tbl), n_sample=4).take_all()
        assert len(rows) == 40  # 4 frames x 10 videos
        assert all(0 <= r["frame_index"] < 12 for r in rows)

    def test_ffmpeg_backend_gated(self):
        from docstrange_ray.ops.multimodal import FrameSampleActor

        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            FrameSampleActor(backend="ffmpeg")


class TestJaccardJoin:
    """Exact prefix-filter similarity join (ops/dedup.jaccard_join) —
    must equal brute-force n-gram Jaccard at ANY threshold, including
    below the LSH-reliable zone."""

    @staticmethod
    def _brute(docs, t, ngram=3):
        from docstrange_ray.ops.dedup import _shingles

        sets = {d["doc_id"]: _shingles(d["text"], ngram) for d in docs}
        out = []
        ids = sorted(sets)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                u = sets[a] | sets[b]
                j = len(sets[a] & sets[b]) / len(u) if u else 0.0
                if j >= t:
                    out.append((a, b, round(j, 6)))
        return sorted(out)

    @staticmethod
    def _docs():
        base = "the quick brown fox jumps over the lazy dog again and again today"
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " extra tail words here"},  # near dup
            {"doc_id": 3, "text": base.replace("quick", "slow")},     # near dup
            {"doc_id": 4, "text": "completely different content with many unique words"},
            {"doc_id": 5, "text": "another unrelated document about distributed engines"},
            {"doc_id": 6, "text": " ".join(f"w{i} w{i+1} filler" for i in range(8))},
        ]
        return rows

    @pytest.mark.parametrize("t", [0.3, 0.5, 0.8])
    def test_equals_brute_force(self, t):
        from docstrange_ray.ops.dedup import jaccard_join

        docs = self._docs()
        got = sorted(
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in jaccard_join(
                ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(3),
                threshold=t,
            ).take_all()
        )
        assert got == self._brute(docs, t)

    def test_low_threshold_below_lsh_zone(self):
        # t=0.25: banding at the minhash path's fixed parameters is not
        # reliable this low; the prefix filter must still be complete
        from docstrange_ray.ops.dedup import jaccard_join

        docs = self._docs()
        got = sorted(
            (r["doc_id_a"], r["doc_id_b"])
            for r in jaccard_join(
                ray.data.from_arrow(pa.Table.from_pylist(docs)), threshold=0.25
            ).take_all()
        )
        assert got == [(a, b) for a, b, _ in self._brute(docs, 0.25)]

    def test_demote_heavy_grams_invariant(self):
        # demotion changes only the global order; output must be
        # byte-identical, and the MG pass must surface the planted
        # universal stop-gram
        import numpy as np

        from docstrange_ray.ops.dedup import (
            _heavy_gram_hashes,
            _shingles,
            jaccard_join,
        )

        stop = "common phrase here"
        docs = [
            {"doc_id": i, "text": f"{stop} unique{i} tail{i} word{i} more{i} x{i}"}
            for i in range(12)
        ]
        docs += [
            {"doc_id": 100, "text": "alpha beta gamma delta epsilon zeta eta"},
            {"doc_id": 101, "text": "alpha beta gamma delta epsilon zeta theta"},
        ]
        tbl = pa.Table.from_pylist(docs)
        base = sorted(
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in jaccard_join(ray.data.from_arrow(tbl), threshold=0.5).take_all()
        )
        demoted = sorted(
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in jaccard_join(
                ray.data.from_arrow(tbl).repartition(3),
                threshold=0.5,
                demote_heavy_grams=4,
            ).take_all()
        )
        assert demoted == base
        assert (100, 101) in {(a, b) for a, b, _ in base}
        heavy = _heavy_gram_hashes(ray.data.from_arrow(tbl), 3, 4)
        stop_hash = np.int64(
            np.array(sorted(_shingles(stop, 3)), dtype=np.uint64).astype(np.int64)[0]
        )
        assert stop_hash in heavy

    def test_hot_gram_pair_found_by_default(self):
        """Adversarial: a pair whose ONLY shared gram is hot (appears in
        every doc). Pins VERDICT-r3 #4: the default path (posting_cap
        None) must find it; an explicit cap loses it DETERMINISTICALLY
        (lowest-(n, doc_id) survivors, stable across runs)."""
        from docstrange_ray.ops.dedup import jaccard_join

        # every doc = hot phrase "p1 p2 p3" + 3 private words: all pairs
        # share exactly 1 of 7 grams -> J = 1/7 >= t=0.1
        docs = [
            {"doc_id": i, "text": f"p1 p2 p3 a{i} b{i} c{i}"} for i in range(20)
        ] + [
            {"doc_id": 900, "text": "p1 p2 p3 ax bx cx"},
            {"doc_id": 901, "text": "p1 p2 p3 ay by cy"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(3)
        got = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in jaccard_join(ds, threshold=0.1).take_all()
        }
        assert (900, 901) in got and len(got) == 22 * 21 // 2
        # opt-in cap: only the 8 lowest doc_ids survive the hot list
        capped = [
            sorted(
                (r["doc_id_a"], r["doc_id_b"])
                for r in jaccard_join(
                    ds, threshold=0.1, posting_cap=8
                ).take_all()
            )
            for _ in range(2)
        ]
        assert capped[0] == capped[1]  # deterministic truncation
        assert (900, 901) not in set(capped[0])
        assert set(capped[0]) == {
            (a, b) for a in range(8) for b in range(8) if a < b
        }

    def test_property_random_vs_brute(self):
        from hypothesis import given, settings, strategies as st

        from docstrange_ray.ops.dedup import jaccard_join

        word = st.sampled_from("aa bb cc dd ee ff gg hh".split())
        doc = st.lists(word, min_size=0, max_size=20).map(" ".join)

        @settings(max_examples=6, deadline=None)
        @given(texts=st.lists(doc, min_size=1, max_size=10), t=st.sampled_from([0.4, 0.6]))
        def check(texts, t):
            docs = [{"doc_id": i, "text": x} for i, x in enumerate(texts)]
            got = sorted(
                (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
                for r in jaccard_join(
                    ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(2),
                    threshold=t,
                ).take_all()
            )
            assert got == self._brute(docs, t)

        check()


class TestContainmentJoin:
    """Exact asymmetric prefix-filter containment self-join
    (ops/dedup.containment_join) — must equal brute-force
    |A∩B|/min(|A|,|B|) at any threshold."""

    @staticmethod
    def _brute(docs, t, ngram=3):
        from docstrange_ray.ops.dedup import _shingles

        sets = {d["doc_id"]: _shingles(d["text"], ngram) for d in docs}
        out = []
        ids = sorted(sets)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                m = min(len(sets[a]), len(sets[b]))
                c = len(sets[a] & sets[b]) / m if m else 0.0
                if c >= t:
                    out.append((a, b, round(c, 6)))
        return sorted(out)

    def test_quote_inside_long_doc(self):
        """The case Jaccard structurally misses: a short doc fully
        quoted inside a much longer one has containment 1.0 but
        Jaccard ~ |A|/|B|."""
        from docstrange_ray.ops.dedup import containment_join, jaccard_join

        quote = "the five boxing wizards jump quickly tonight"
        long_doc = (
            "intro paragraph with many framing words before the quote "
            + quote
            + " followed by a very long unrelated analysis section "
            + " ".join(f"filler{i} token{i} pad{i}" for i in range(30))
        )
        docs = [
            {"doc_id": 1, "text": quote},
            {"doc_id": 2, "text": long_doc},
            {"doc_id": 3, "text": "entirely unrelated third document content here"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(2)
        got = {
            (r["doc_id_a"], r["doc_id_b"]): r["containment"]
            for r in containment_join(ds, threshold=0.9).take_all()
        }
        assert got == {(1, 2): 1.0}
        # jaccard at the same threshold misses it
        jgot = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in jaccard_join(ds, threshold=0.9).take_all()
        }
        assert (1, 2) not in jgot

    @pytest.mark.parametrize("t", [0.3, 0.6, 0.9])
    def test_equals_brute_force(self, t):
        from docstrange_ray.ops.dedup import containment_join

        docs = TestJaccardJoin._docs()
        got = sorted(
            (r["doc_id_a"], r["doc_id_b"], r["containment"])
            for r in containment_join(
                ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(3),
                threshold=t,
            ).take_all()
        )
        assert got == self._brute(docs, t)

    def test_hot_gram_pair_still_found_with_demotion(self):
        """A tiny doc whose ONLY gram is a universal hot phrase: the
        demoted gram re-enters the 1-gram doc's prefix (plen >= 1), so
        exactness survives demotion."""
        from docstrange_ray.ops.dedup import containment_join

        docs = [
            {"doc_id": i, "text": f"p1 p2 p3 a{i} b{i} c{i}"} for i in range(20)
        ] + [{"doc_id": 900, "text": "p1 p2 p3"}]  # 1 gram, universal
        ds = ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(3)
        got = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in containment_join(ds, threshold=1.0).take_all()
        }
        # doc 900 is fully contained in every other doc
        assert got == {(i, 900) for i in range(20)}

    def test_property_random_vs_brute(self):
        from hypothesis import given, settings, strategies as st

        from docstrange_ray.ops.dedup import containment_join

        word = st.sampled_from("aa bb cc dd ee ff gg hh".split())
        doc = st.lists(word, min_size=0, max_size=20).map(" ".join)

        @settings(max_examples=6, deadline=None)
        @given(
            texts=st.lists(doc, min_size=1, max_size=10),
            t=st.sampled_from([0.5, 0.8]),
        )
        def check(texts, t):
            docs = [{"doc_id": i, "text": x} for i, x in enumerate(texts)]
            got = sorted(
                (r["doc_id_a"], r["doc_id_b"], r["containment"])
                for r in containment_join(
                    ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(2),
                    threshold=t,
                ).take_all()
            )
            assert got == self._brute(docs, t)

        check()


class TestDupClusters:
    def test_union_find_transitive(self):
        from docstrange_ray.ops.dedup import dup_clusters

        pairs = [
            {"doc_id_a": 1, "doc_id_b": 2},
            {"doc_id_a": 2, "doc_id_b": 3},
            {"doc_id_a": 7, "doc_id_b": 9},
        ]
        assign = dup_clusters(pairs)
        assert assign[2] == assign[3] == 1
        assert assign[9] == 7

    @pytest.mark.usefixtures("ray_session")
    def test_drop_list_keeps_representative(self, docs_with_dups):
        import ray.data

        from docstrange_ray.ops.dedup import near_dup_drop_list

        ds = ray.data.from_arrow(docs_with_dups)
        drops = near_dup_drop_list(ds, threshold=0.8)
        # each planted near-dup cluster keeps exactly one member
        assert drops  # fixtures plant at least one dup pair
        all_ids = set(docs_with_dups.column("doc_id").to_pylist())
        assert set(drops) < all_ids  # strictly fewer than all docs dropped


@pytest.mark.usefixtures("ray_session")
class TestDistributedDedup:
    """Round-2 scale fixes: the MinHash verify path and connected
    components run Dataset-to-Dataset (no candidate collection on the
    driver)."""

    def test_near_dup_pairs_ds_finds_planted(self, docs_with_dups):
        # the same assertions as the (driver-wrapper) TestMinHash test,
        # but consumed as a Dataset — no candidate ever rides the driver
        ds = ray.data.from_arrow(docs_with_dups)
        got = dedup.near_dup_pairs_ds(ds, threshold=0.8).take_all()
        flat = {(r["doc_id_a"], r["doc_id_b"]) for r in got}
        assert (0, 100) in flat
        assert (1, 101) in flat
        assert (2, 102) in flat
        assert all(r["jaccard"] >= 0.8 for r in got)

    def test_bloom_prefilter_loses_nothing(self, docs_with_dups):
        # bloom filters have false positives, never false negatives:
        # the filtered plan returns exactly the unfiltered plan's pairs
        ds = ray.data.from_arrow(docs_with_dups)
        with_bloom = sorted(
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in dedup.near_dup_pairs_ds(ds, threshold=0.8, prefilter=True).take_all()
        )
        without = sorted(
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in dedup.near_dup_pairs_ds(ds, threshold=0.8, prefilter=False).take_all()
        )
        assert with_bloom == without
        assert len(with_bloom) >= 3

    def test_drop_list_ds_matches_driver_path(self, docs_with_dups):
        ds = ray.data.from_arrow(docs_with_dups)
        got = sorted(r["doc_id"] for r in dedup.near_dup_drop_list_ds(ds).take_all())
        exp = dedup.near_dup_drop_list(ds)
        assert got == sorted(exp)
        assert 100 in got and 101 in got and 102 in got

    def test_simhash_drop_list_ds(self, docs_with_dups):
        ds = ray.data.from_arrow(docs_with_dups)
        drops = sorted(
            r["doc_id"] for r in dedup.simhash_drop_list_ds(ds, max_hamming=3).take_all()
        )
        assert 100 in drops  # exact dup loses to representative 0
        assert 0 not in drops  # the minimal id always survives as rep

    def test_label_propagation_matches_union_find_on_chain(self):
        # a chain forces multi-round propagation (diameter 4)
        pairs = [
            {"doc_id_a": f"d{i:02d}", "doc_id_b": f"d{i + 1:02d}"}
            for i in range(4)
        ] + [{"doc_id_a": "x50", "doc_id_b": "x51"}]
        ds = ray.data.from_arrow(pa.Table.from_pylist(pairs))
        labels = {
            r["node"]: r["label"]
            for r in dedup.dup_clusters_ds(ds).take_all()
        }
        from docstrange_ray.ops.dedup import dup_clusters

        uf = dup_clusters(pairs)
        # every chained node resolves to the component min
        for i in range(5):
            assert labels[f"d{i:02d}"] == "d00"
        assert labels["x50"] == "x50" and labels["x51"] == "x50"
        # agreement with the driver union-find on non-representatives
        for node, rep in uf.items():
            assert labels[node] == rep


class TestMediaMetadata:
    """Real media header sniffing (ops/media_meta) over genuinely valid
    bytes written by the stdlib makers (synth_files)."""

    def test_png_round_trip(self):
        from docstrange_ray.ops.media_meta import sniff_media
        from docstrange_ray.synth_files import make_png

        m = sniff_media(make_png(40, 24))
        assert m["mime"] == "image/png" and (m["width"], m["height"]) == (40, 24)
        # the PNG is genuinely decodable: filter-0 scanlines inflate to w*h
        import zlib as _z

        data = make_png(10, 5, shade=200)
        idat = data[data.index(b"IDAT") + 4 :]
        raw = _z.decompressobj().decompress(idat)
        assert len(raw) == 5 * (10 + 1)
        assert raw[1] == 200

    def test_gif_wav_jpeg_bmp(self):
        from docstrange_ray.ops.media_meta import sniff_media
        from docstrange_ray.synth_files import make_gif, make_jpeg_header, make_wav

        g = sniff_media(make_gif(12, 8))
        assert g["mime"] == "image/gif" and (g["width"], g["height"]) == (12, 8)
        w = sniff_media(make_wav(250, sample_rate=8000, channels=1))
        assert w["mime"] == "audio/wav"
        assert w["channels"] == 1 and w["sample_rate"] == 8000
        assert abs(w["duration_ms"] - 250) <= 1
        j = sniff_media(make_jpeg_header(64, 32))
        assert j["mime"] == "image/jpeg" and (j["width"], j["height"]) == (64, 32)

    def test_bmp_header(self):
        from docstrange_ray.ops.media_meta import sniff_media
        from docstrange_ray.synth_files import make_bmp

        m = sniff_media(make_bmp(30, 12))
        assert m["mime"] == "image/bmp"
        assert (m["width"], m["height"]) == (30, 12)
        # top-down (negative height) BMPs normalize
        import struct

        data = bytearray(make_bmp(10, 4))
        struct.pack_into("<i", data, 22, -4)
        assert sniff_media(bytes(data))["height"] == 4

    def test_unknown_bytes(self):
        from docstrange_ray.ops.media_meta import sniff_media

        assert sniff_media(b"not a media file....")["mime"] == ""
        assert sniff_media(b"")["mime"] == ""

    @pytest.mark.usefixtures("ray_session")
    def test_dataset_op(self):
        import ray.data

        from docstrange_ray.ops.media_meta import media_metadata
        from docstrange_ray.synth_files import real_media_table

        out = media_metadata(ray.data.from_arrow(real_media_table(40))).take_all()
        assert len(out) == 40
        mimes = {r["mime"] for r in out}
        assert mimes == {
            "image/png",
            "image/gif",
            "audio/wav",
            "image/jpeg",
            "image/bmp",
            "image/tiff",
            "image/webp",
        }
        for r in out:
            if r["mime"].startswith("image"):
                assert r["width"] > 0 and r["height"] > 0
            if r["mime"] == "audio/wav":
                assert r["duration_ms"] > 0 and r["channels"] == 1


class TestPngDecode:
    """REAL stdlib PNG decode (ops/media_meta.decode_png): inflate +
    unfilter + luma."""

    def test_gray_round_trip(self):
        from docstrange_ray.ops.media_meta import decode_png
        from docstrange_ray.synth_files import make_png

        img = decode_png(make_png(20, 10, shade=170))
        assert img.shape == (10, 20)
        assert (img == 170).all()

    def test_all_filters_rgb(self):
        import struct
        import zlib

        from docstrange_ray.ops.media_meta import decode_png

        rng = np.random.RandomState(5)
        h, w, ch = 6, 8, 3
        pixels = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)

        def paeth(a, b, c):
            p = int(a) + int(b) - int(c)
            pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.int32)
        for y, f in enumerate([0, 1, 2, 3, 4, 1]):
            line = pixels[y].reshape(-1).astype(np.int32)
            raw.append(f)
            for x in range(w * ch):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 0:
                    v = line[x]
                elif f == 1:
                    v = line[x] - a
                elif f == 2:
                    v = line[x] - b
                elif f == 3:
                    v = line[x] - (a + b) // 2
                else:
                    v = line[x] - paeth(a, b, c)
                raw.append(v & 0xFF)
            prev = line

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        got = decode_png(png)
        exp = np.round(
            0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
        ).astype(np.uint8)
        assert (got == exp).all()

    @pytest.mark.usefixtures("ray_session")
    def test_auto_backend_decodes_real_pngs(self):
        import ray.data

        from docstrange_ray.ops import multimodal as mm
        from docstrange_ray.synth_files import real_media_table

        ds = ray.data.from_arrow(real_media_table(20))
        out = {
            r["media_ref"]: r
            for r in mm.decode_features(ds, concurrency=(1, 2), backend="auto").take_all()
        }
        # PNG entries (i % 8 == 0) decode for REAL: constant-shade image
        # -> mean_intensity equals the shade exactly
        for i in range(0, 20, 8):
            shade = (i * 37) % 256
            assert out[f"media://real/{i}"]["mean_intensity"] == float(shade)
        # JPEG entries (i % 8 == 3) decode for REAL too: the gradient
        # payload's mean intensity lands within DCT rounding of truth
        for i in range(3, 20, 8):
            w, h = 32 + (i % 3) * 16, 24 + (i % 2) * 8
            img = (
                np.add.outer(np.arange(h) * (2 + i % 3), np.arange(w)) + i * 11
            ) % 256
            assert (
                abs(out[f"media://real/{i}"]["mean_intensity"] - img.mean()) <= 1.0
            )


class TestJpegCodec:
    """REAL from-scratch baseline JPEG: make_jpeg (DCT + Annex-K
    Huffman) round-trips through decode_jpeg_gray (Huffman + IDCT)."""

    def test_round_trip_exact_at_quant1(self):
        from docstrange_ray.ops.media_meta import decode_jpeg_gray
        from docstrange_ray.synth_files import make_jpeg

        img = (np.add.outer(np.arange(37) * 3, np.arange(53) * 2) % 256).astype(
            np.uint8
        )
        dec = decode_jpeg_gray(make_jpeg(img))
        assert dec.shape == img.shape
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1

    def test_round_trip_noise(self):
        from docstrange_ray.ops.media_meta import decode_jpeg_gray
        from docstrange_ray.synth_files import make_jpeg

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, size=(64, 48)).astype(np.uint8)
        dec = decode_jpeg_gray(make_jpeg(img))
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1

    def test_lossy_quant_stays_close(self):
        from docstrange_ray.ops.media_meta import decode_jpeg_gray
        from docstrange_ray.synth_files import make_jpeg

        img = ((np.add.outer(np.arange(40), np.arange(40))) * 2 % 256).astype(
            np.uint8
        )
        dec = decode_jpeg_gray(make_jpeg(img, quant=8))
        assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 4.0

    def test_sniffable_and_rejects_header_only(self):
        from docstrange_ray.ops.media_meta import decode_jpeg_gray, sniff_media
        from docstrange_ray.synth_files import make_jpeg, make_jpeg_header

        img = np.full((16, 24), 99, dtype=np.uint8)
        data = make_jpeg(img)
        meta = sniff_media(data)
        assert (meta["mime"], meta["width"], meta["height"]) == ("image/jpeg", 24, 16)
        with pytest.raises(ValueError):
            decode_jpeg_gray(make_jpeg_header(32, 24))  # no scan data

    def test_rejects_progressive(self):
        from docstrange_ray.ops.media_meta import decode_jpeg_gray
        from docstrange_ray.synth_files import make_jpeg

        data = bytearray(make_jpeg(np.zeros((8, 8), dtype=np.uint8)))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError):
            decode_jpeg_gray(bytes(data))

    @pytest.mark.usefixtures("ray_session")
    def test_auto_backend_uses_real_jpeg_pixels(self):
        import ray.data

        from docstrange_ray.ops.multimodal import decode_features
        from docstrange_ray.synth_files import make_jpeg

        img = np.full((16, 16), 200, dtype=np.uint8)
        tbl = pa.table(
            {
                "media_ref": ["m1"],
                "payload": pa.array([make_jpeg(img)], type=pa.binary()),
                "width": pa.array([16], pa.int32()),
                "height": pa.array([16], pa.int32()),
            }
        )
        out = decode_features(
            ray.data.from_arrow(tbl), backend="auto"
        ).take_all()
        assert abs(out[0]["mean_intensity"] - 200.0) <= 1.0


class TestGifCodec:
    """From-scratch animated GIF: synth_files.make_gif_animated (LZW
    encoder) round-trips EXACTLY through media_meta.decode_gif_frames
    (LZW + palette + interlace + disposal composition) — the gray
    palette has palette[i] == (i,i,i) so luma is lossless."""

    def test_round_trip_exact(self):
        import numpy as np

        from docstrange_ray.ops.media_meta import decode_gif_frames, gif_frame_count
        from docstrange_ray.synth_files import make_gif_animated, synth_gif_frames

        frames = synth_gif_frames(5, 48, 33, seed=3)
        data = make_gif_animated(frames)
        assert gif_frame_count(data) == 5
        dec = decode_gif_frames(data)
        assert len(dec) == 5
        for a, b in zip(frames, dec):
            assert np.array_equal(a, b)

    def test_interlaced_round_trip(self):
        import numpy as np

        from docstrange_ray.ops.media_meta import decode_gif_frames
        from docstrange_ray.synth_files import make_gif_animated, synth_gif_frames

        frames = synth_gif_frames(3, 40, 29, seed=9)
        dec = decode_gif_frames(make_gif_animated(frames, interlace=True))
        for a, b in zip(frames, dec):
            assert np.array_equal(a, b)

    def test_dictionary_reset_on_random_frames(self):
        # random pixels blow past 4096 dictionary entries, forcing the
        # encoder's CLEAR-on-full reset and the decoder's table rebuild
        import numpy as np

        from docstrange_ray.ops.media_meta import decode_gif_frames
        from docstrange_ray.synth_files import make_gif_animated

        rng = np.random.RandomState(7)
        frames = [rng.randint(0, 256, size=(80, 97)).astype(np.uint8) for _ in range(3)]
        dec = decode_gif_frames(make_gif_animated(frames))
        for a, b in zip(frames, dec):
            assert np.array_equal(a, b)

    def test_transparency_and_disposal(self):
        import numpy as np

        from docstrange_ray.ops.media_meta import decode_gif_frames
        from docstrange_ray.synth_files import make_gif_animated

        base = np.full((20, 30), 200, dtype=np.uint8)
        patch = np.full((6, 8), 40, dtype=np.uint8)
        patch[0, 0] = 5  # the transparent index
        data = make_gif_animated(
            [base, patch, patch],
            rects=[(0, 0), (3, 4), (10, 2)],
            disposals=[1, 2, 0],
            transparent_idx=5,
        )
        dec = decode_gif_frames(data)
        assert len(dec) == 3
        # frame 2: patch composed over base at (3,4); transparent pixel
        # keeps the underlying base value
        assert dec[1][4, 3] == 200
        assert dec[1][5, 4] == 40
        # frame 3: frame 2's region restored to background (index 0),
        # new patch visible at (10,2)
        assert dec[2][5, 4] == 0
        assert dec[2][3, 11] == 40

    def test_max_frames_early_stop(self):
        import numpy as np

        from docstrange_ray.ops.media_meta import decode_gif_frames
        from docstrange_ray.synth_files import make_gif_animated, synth_gif_frames

        frames = synth_gif_frames(6, 24, 18, seed=1)
        dec = decode_gif_frames(make_gif_animated(frames), max_frames=2)
        assert len(dec) == 2
        assert np.array_equal(dec[1], frames[1])

    def test_rejects_non_gif_and_disposal3(self):
        import pytest as _pytest

        from docstrange_ray.ops.media_meta import decode_gif_frames
        from docstrange_ray.synth_files import make_gif_animated, synth_gif_frames

        with _pytest.raises(ValueError):
            decode_gif_frames(b"not a gif at all....")
        data = make_gif_animated(synth_gif_frames(2, 10, 10), disposals=[3, 0])
        with _pytest.raises(ValueError, match="disposal 3"):
            decode_gif_frames(data)

    def test_frame_sampler_real_means(self):
        import numpy as np
        import pyarrow as pa

        from docstrange_ray.ops.media_meta import decode_gif_frames
        from docstrange_ray.ops.multimodal import MEDIA_SCHEMA, FrameSampleActor
        from docstrange_ray.synth_files import make_gif_animated, synth_gif_frames

        frames = synth_gif_frames(6, 20, 14, seed=5)
        payload = make_gif_animated(frames)
        tbl = pa.Table.from_pylist(
            [
                {
                    "media_ref": "m://gif",
                    "payload": payload,
                    "mime": "image/gif",
                    "width": 20,
                    "height": 14,
                    "n_frames": 6,
                }
            ],
            schema=MEDIA_SCHEMA,
        )
        out = FrameSampleActor(backend="auto", n_sample=3)(tbl).to_pylist()
        assert [r["frame_index"] for r in out] == [0, 2, 4]
        dec = decode_gif_frames(payload)
        for r in out:
            assert r["frame_mean"] == round(float(dec[r["frame_index"]].mean()), 6)

    def test_image_decode_auto_gif_first_frame(self):
        import numpy as np
        import pyarrow as pa

        from docstrange_ray.ops.multimodal import MEDIA_SCHEMA, ImageDecodeActor
        from docstrange_ray.synth_files import make_gif_animated

        img = np.full((16, 16), 123, dtype=np.uint8)
        tbl = pa.Table.from_pylist(
            [
                {
                    "media_ref": "m://g",
                    "payload": make_gif_animated([img]),
                    "mime": "image/gif",
                    "width": 16,
                    "height": 16,
                    "n_frames": 1,
                }
            ],
            schema=MEDIA_SCHEMA,
        )
        out = ImageDecodeActor(backend="auto")(tbl).to_pylist()
        assert out[0]["mean_intensity"] == 123.0

    def test_property_round_trip(self):
        from hypothesis import given, settings, strategies as st

        import numpy as np

        from docstrange_ray.ops.media_meta import decode_gif_frames
        from docstrange_ray.synth_files import make_gif_animated

        @settings(max_examples=20, deadline=None)
        @given(
            st.integers(1, 4),
            st.integers(1, 25),
            st.integers(1, 25),
            st.integers(0, 2**31 - 1),
            st.booleans(),
        )
        def check(n, w, h, seed, interlace):
            rng = np.random.RandomState(seed)
            frames = [
                rng.randint(0, 256, size=(h, w)).astype(np.uint8) for _ in range(n)
            ]
            dec = decode_gif_frames(make_gif_animated(frames, interlace=interlace))
            assert len(dec) == n
            for a, b in zip(frames, dec):
                assert np.array_equal(a, b)

        check()


class TestAudioDecode:
    """From-scratch WAV PCM16 decode (media_meta.decode_wav) + the
    audio feature actor stage."""

    def test_round_trip_exact(self):
        import io
        import wave

        import numpy as np

        from docstrange_ray.ops.media_meta import decode_wav

        rng = np.random.RandomState(0)
        pcm = rng.randint(-(2**15), 2**15, size=(500, 2)).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(pcm.tobytes())
        s, sr = decode_wav(buf.getvalue())
        assert sr == 44100
        assert np.array_equal(s, pcm)

    def test_rejects_non_wav_and_nonpcm(self):
        import pytest as _pytest

        from docstrange_ray.ops.media_meta import decode_wav

        with _pytest.raises(ValueError):
            decode_wav(b"not a wav .........")
        # forge a float-format WAV header (audio_format=3)
        import struct

        hdr = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
            + b"data" + struct.pack("<I", 0)
        )
        with _pytest.raises(ValueError, match="non-PCM"):
            decode_wav(hdr)

    def test_tone_features(self):
        import math

        import numpy as np

        from docstrange_ray.ops.media_meta import decode_wav
        from docstrange_ray.synth_files import make_wav_tone

        data = make_wav_tone(440.0, 250, sample_rate=8000, amplitude=0.5)
        s, sr = decode_wav(data)
        assert sr == 8000 and len(s) == 2000
        x = s.astype(np.float64) / 32768.0
        rms = float(np.sqrt((x * x).mean()))
        # sine RMS = A / sqrt(2), within int16 quantization tolerance
        assert abs(rms - 0.5 / math.sqrt(2)) < 0.01

    def test_actor_real_and_fake_paths(self):
        import numpy as np
        import pyarrow as pa

        from docstrange_ray.ops.multimodal import MEDIA_SCHEMA, AudioFeatureActor
        from docstrange_ray.synth_files import make_wav_tone

        rows = [
            {
                "media_ref": "m://tone",
                "payload": make_wav_tone(440.0, 100),
                "mime": "audio/wav",
                "width": -1,
                "height": -1,
                "n_frames": 1,
            },
            {
                "media_ref": "m://blob",
                "payload": b"\x01\x02\x03\x04" * 32,
                "mime": "audio/mp3",
                "width": -1,
                "height": -1,
                "n_frames": 1,
            },
        ]
        out = AudioFeatureActor(backend="auto")(
            pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
        ).to_pylist()
        by_ref = {r["media_ref"]: r for r in out}
        assert by_ref["m://tone"]["real_decode"] is True
        assert abs(by_ref["m://tone"]["rms"] - 0.353553) < 0.01
        assert by_ref["m://tone"]["duration_ms"] == 100
        assert by_ref["m://tone"]["zcr"] > 0.05  # 440 Hz at 8 kHz: ~0.11
        assert by_ref["m://blob"]["real_decode"] is False
        assert by_ref["m://blob"]["duration_ms"] == -1

    def test_codec_backend_gated(self):
        import pytest as _pytest

        from docstrange_ray.ops.multimodal import AudioFeatureActor

        with _pytest.raises(NotImplementedError):
            AudioFeatureActor(backend="mp3")

    def test_empty_wav_is_real_decode_with_zero_features(self):
        # ADVICE-r3 #3: a structurally valid WAV with an empty data
        # payload is a REAL decode — zero features, not container-byte
        # stats with duration -1
        import pyarrow as pa

        from docstrange_ray.ops.multimodal import MEDIA_SCHEMA, AudioFeatureActor
        from docstrange_ray.synth_files import make_wav

        row = {
            "media_ref": "m://empty",
            "payload": make_wav(0),
            "mime": "audio/wav",
            "width": -1,
            "height": -1,
            "n_frames": 1,
        }
        out = AudioFeatureActor(backend="auto")(
            pa.Table.from_pylist([row], schema=MEDIA_SCHEMA)
        ).to_pylist()[0]
        assert out["real_decode"] is True
        assert out["rms"] == 0.0 and out["zcr"] == 0.0 and out["duration_ms"] == 0

    def test_truncated_media_takes_fake_path_not_crash(self):
        # ADVICE-r3 #2: truncated/corrupt GIF bytes raise struct.error/
        # IndexError/KeyError from the raw parsers; the decode entry
        # points normalize ALL parse failures to ValueError so the
        # actors' documented fake fallback engages instead of the task
        # crashing
        import numpy as np
        import pyarrow as pa

        from docstrange_ray.ops.multimodal import (
            MEDIA_SCHEMA,
            FrameSampleActor,
            ImageDecodeActor,
        )
        from docstrange_ray.synth_files import make_gif_animated, synth_gif_frames

        g = make_gif_animated(synth_gif_frames(3, 12, 10, seed=1))
        corrupt = bytearray(g)
        corrupt[len(corrupt) // 2] ^= 0xFF
        rows = [
            {
                "media_ref": f"m://bad{i}",
                "payload": p,
                "mime": "image/gif",
                "width": 12,
                "height": 10,
                "n_frames": 3,
            }
            for i, p in enumerate(
                [g[:8], g[:20], g[: len(g) // 2], g[:-3], bytes(corrupt)]
            )
        ]
        tbl = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
        out = FrameSampleActor(backend="auto", n_sample=2)(tbl)
        assert out.num_rows >= len(rows)  # every payload produced rows
        dec = ImageDecodeActor(backend="auto")(tbl)
        assert dec.num_rows == len(rows)


class TestCorpusTerms:
    """top_ngrams (partial-reduce + one shuffle + coalesced top-k) and
    tfidf_topk (distributed df broadcast back) vs in-test DuckDB."""

    @pytest.fixture()
    def term_docs(self):
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    "the cat sat on the mat",
                    "the cat sat on the hat",
                    "dogs bark",          # shorter than n=3 after split? no: 2 words -> no 3-grams
                    "",                    # empty doc: no terms, no grams
                ],
            }
        )

    def test_top_ngrams_vs_duckdb(self, term_docs):
        got = (
            textstats.top_ngrams(ray.data.from_arrow(term_docs), n=3, k=10)
            .to_pandas()
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", term_docs)
        exp = con.sql(
            r"""WITH l AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws FROM documents),
                 g AS (SELECT ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS ngram
                       FROM l, UNNEST(range(len(ws) - 2)) AS t(i))
              SELECT ngram, COUNT(*) AS n FROM g GROUP BY ngram
              ORDER BY n DESC, ngram LIMIT 10"""
        ).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert got.iloc[0]["ngram"] in ("cat sat on", "the cat sat")
        assert got.iloc[0]["n"] == 2

    def test_tfidf_vs_duckdb(self, term_docs):
        got = (
            textstats.tfidf_topk(ray.data.from_arrow(term_docs), k=3)
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", term_docs)
        exp = con.sql(
            r"""WITH w AS (SELECT doc_id, UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term FROM documents),
                 tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term),
                 df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY term),
                 n AS (SELECT COUNT(*) AS n FROM documents)
              SELECT doc_id, term, tf, ROUND(raw, 6) AS score FROM (
                  SELECT tf.doc_id, tf.term, tf.tf,
                         tf.tf * LN(CAST(n.n AS DOUBLE) / df.df) AS raw,
                         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                             ORDER BY tf.tf * LN(CAST(n.n AS DOUBLE) / df.df) DESC, tf.term) AS rn
                  FROM tf JOIN df USING (term), n)
              WHERE rn <= 3"""
        ).df().sort_values(["doc_id", "term"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # empty doc emits no rows; idf of a universal term ('the' in 2/4
        # docs) is ln(2), never negative-infinite
        assert 4 not in set(got["doc_id"])


class TestBM25:
    """bm25_topk (bounded stats pass + shuffle-free scoring scan) vs
    in-test DuckDB running the pinned-float oracle expression."""

    BM25_SQL = r"""
        WITH w AS (
            SELECT doc_id,
                   UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                      x -> x <> '')) AS term
            FROM documents
        ), dl AS (
            SELECT d.doc_id, COALESCE(t.dl, 0) AS dl
            FROM documents d LEFT JOIN (
                SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id
            ) t USING (doc_id)
        ), stats AS (
            SELECT (SELECT COUNT(*) FROM documents) AS n,
                   (SELECT SUM(dl) FROM dl) / (SELECT COUNT(*) FROM documents) AS avgdl
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM w
            WHERE term IN ('cat', 'mat') GROUP BY doc_id, term
        ), df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM w
            WHERE term IN ('cat', 'mat') GROUP BY term
        ), parts AS (
            SELECT tf.doc_id, tf.term,
                   LN((stats.n - df.df + 0.5e0) / (df.df + 0.5e0) + 1.0e0)
                   * (tf.tf * (1.2e0 + 1.0e0))
                   / (tf.tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * (dl.dl / stats.avgdl)))
                   AS part
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
        )
        SELECT doc_id, ROUND(s, 6) AS score, matched FROM (
            SELECT doc_id,
                   COALESCE(MAX(CASE WHEN term = 'cat' THEN part END), 0)
                   + COALESCE(MAX(CASE WHEN term = 'mat' THEN part END), 0) AS s,
                   COUNT(*) AS matched
            FROM parts GROUP BY doc_id)
        ORDER BY s DESC, doc_id
        LIMIT 3
    """

    @pytest.fixture()
    def bm_docs(self):
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": [
                    "the cat sat on the mat",
                    "the cat sat on the hat cat cat",
                    "dogs bark at the cat",
                    "",  # empty doc still counts toward N and avgdl
                    "nothing relevant here at all",
                ],
            }
        )

    def test_vs_duckdb_exact(self, bm_docs):
        got = (
            textstats.bm25_topk(ray.data.from_arrow(bm_docs), ["mat", "cat"], k=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", bm_docs)
        exp = con.sql(self.BM25_SQL).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # rare-term idf dominates: doc 1 (only 'mat' match) outranks
        # doc 2's tf=3 on the common 'cat'; among cat-only docs the
        # higher-tf doc 2 beats doc 3
        full = (
            textstats.bm25_topk(ray.data.from_arrow(bm_docs), ["mat", "cat"], k=5)
            .to_pandas()
            .sort_values("score", ascending=False)
            .reset_index(drop=True)
        )
        assert int(full.iloc[0]["doc_id"]) == 1
        scores = dict(zip(full["doc_id"], full["score"]))
        assert scores[2] > scores[3]

    def test_parallelism_invariant(self, bm_docs):
        # identical output at 1 block and at 5 blocks: partials and the
        # pinned summation order make the doubles batch-size-invariant
        a = (
            textstats.bm25_topk(ray.data.from_arrow(bm_docs), ["mat", "cat"], k=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            textstats.bm25_topk(
                ray.data.from_arrow(bm_docs).repartition(5), ["mat", "cat"], k=3
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_no_match_empty(self):
        docs = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": ["plain words only"]}
        )
        out = textstats.bm25_topk(ray.data.from_arrow(docs), ["zzz"], k=3).to_pandas()
        assert len(out) == 0


class TestSourceVocabOverlap:
    """source_vocab_overlap (one word shuffle + bounded coalesced
    final) vs in-test DuckDB."""

    SQL = r"""
        WITH sw AS (
            SELECT DISTINCT source,
                   UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                      x -> x <> '')) AS word
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
        ORDER BY source_a, source_b
    """

    @pytest.fixture()
    def src_docs(self):
        return pa.table(
            {
                "source": ["s1", "s1", "s2", "s3", "s3"],
                "text": [
                    "alpha beta gamma",
                    "beta delta",
                    "beta gamma epsilon",
                    "zeta eta",
                    "theta zeta",
                ],
            }
        )

    def test_vs_duckdb(self, src_docs):
        from docstrange_ray.ops.textstats import source_vocab_overlap

        got = (
            source_vocab_overlap(ray.data.from_arrow(src_docs))
            .to_pandas()
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", src_docs)
        exp = con.sql(self.SQL).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # s3 shares no vocabulary with s1/s2: exactly one pair (s1, s2)
        assert set(zip(got["source_a"], got["source_b"])) == {("s1", "s2")}

    def test_source_named_empty_string(self):
        # ADVICE-r3 #4: "" used to be the in-band totals sentinel; a
        # source literally named "" must now get correct totals/Jaccard
        from docstrange_ray.ops.textstats import source_vocab_overlap

        docs = pa.table(
            {
                "source": ["", "", "b"],
                "text": ["alpha beta gamma", "delta", "alpha beta zeta"],
            }
        )
        got = source_vocab_overlap(ray.data.from_arrow(docs)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        # "": {alpha,beta,gamma,delta} (4), b: {alpha,beta,zeta} (3), common 2
        assert (r["source_a"], r["source_b"]) == ("", "b")
        assert r["n_common"] == 2 and r["jaccard"] == 0.4

    def test_batch_invariant(self, src_docs):
        from docstrange_ray.ops.textstats import source_vocab_overlap

        a = (
            source_vocab_overlap(ray.data.from_arrow(src_docs))
            .to_pandas()
            .reset_index(drop=True)
        )
        b = (
            source_vocab_overlap(ray.data.from_arrow(src_docs).repartition(5))
            .to_pandas()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestPii:
    """PII detect/redact: Arrow RE2 kernels vs DuckDB RE2 on adversarial
    shapes (cross-category near-misses, multiple hits, no hits)."""

    TEXTS = [
        "mail a.b-c_d%x+1@sub.example.co.uk and b@x.io twice",
        "ip 192.168.1.255 but version 1.2.3 is not an ip",
        "ssn 078-05-1120 vs phone 555-867-5309 vs (212) 555-0123",
        "+1 (415) 555-0142 called 999-99-9999",
        "no pii here at all",
        "",
    ]

    def _tbl(self):
        return pa.table(
            {
                "doc_id": pa.array(list(range(len(self.TEXTS))), pa.int64()),
                "text": self.TEXTS,
            }
        )

    def test_counts_and_redaction_vs_duckdb(self):
        from docstrange_ray.ops import pii as piimod

        got = piimod.pii_scrub(self._tbl()).to_pandas()
        con = duckdb.connect()
        con.register("t", self._tbl())
        e, i, s, p = (pat for _, pat, _ in piimod.PII_PATTERNS)
        exp = con.execute(
            f"""SELECT doc_id,
                   len(regexp_extract_all(text, '{e}')) AS n_email,
                   len(regexp_extract_all(text, '{i}')) AS n_ipv4,
                   len(regexp_extract_all(text, '{s}')) AS n_ssn,
                   len(regexp_extract_all(text, '{p}')) AS n_phone,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       text, '{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'),
                       '{s}', '<SSN>', 'g'), '{p}', '<PHONE>', 'g') AS redacted
                FROM t"""
        ).fetchdf()
        for c in ("n_email", "n_ipv4", "n_ssn", "n_phone", "redacted"):
            assert list(got[c]) == list(exp[c]), c
        # semantic pins, independent of the oracle
        assert list(got["n_email"]) == [2, 0, 0, 0, 0, 0]
        assert list(got["n_ipv4"]) == [0, 1, 0, 0, 0, 0]
        assert list(got["n_ssn"]) == [0, 0, 1, 1, 0, 0]
        assert list(got["n_phone"]) == [0, 0, 2, 1, 0, 0]
        assert got["redacted"][4] == "no pii here at all"
        assert "<SSN>" in got["redacted"][3] and "<PHONE>" in got["redacted"][3]
        assert "078-05-1120" not in got["redacted"][2]

    def test_ray_stage_is_shuffle_free_scan(self):
        from docstrange_ray.ops import pii as piimod

        out = (
            ray.data.from_arrow(self._tbl())
            .map_batches(piimod.pii_scrub, batch_format="pyarrow")
            .to_pandas()
        )
        assert len(out) == len(self.TEXTS)
        assert out["n_pii"].sum() == 8


class TestPassageDedup:
    def test_first_wins_and_reassembly_order(self):
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "a b c d e f",        # chunks: 'a b c', 'd e f'
                    "d e f g h i a b c",  # 'd e f' dup, 'g h i' new, 'a b c' dup
                    "a b c d e f",        # fully duplicate -> no row
                ],
            }
        )
        got = (
            dedup.passage_dedup(ray.data.from_arrow(tbl), chunk_words=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == [1, 2]
        assert got["text_dedup"][0] == "a b c d e f"
        assert got["text_dedup"][1] == "g h i"

    def test_trailing_partial_chunk_and_case(self):
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["A b C d E", "e x t r a e"],  # doc1 tail chunk 'e'
            }
        )
        got = (
            dedup.passage_dedup(ray.data.from_arrow(tbl), chunk_words=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc1: 'a b', 'c d', 'e'; doc2: 'e x', 't r', 'a e' — the
        # trailing single-word chunk 'e' of doc1 is distinct from the
        # 2-word chunks of doc2, nothing collides
        assert got["text_dedup"][0] == "a b c d e"
        assert got["text_dedup"][1] == "e x t r a e"


class TestRepetitionStats:
    def test_planted_repetition(self):
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    # "a b c d e" repeated 3x: heavy 5-gram + 2-gram reuse
                    "a b c d e a b c d e a b c d e",
                    "all distinct words here now",
                    "x y x y x y x y",  # top 2-gram ('x','y') count 4 of 7
                    "",
                ],
            }
        )
        got = textstats.repetition_stats(tbl).to_pandas().set_index("doc_id")
        r1 = got.loc[1]
        assert r1["n_words"] == 15 and r1["n_distinct_words"] == 5
        assert r1["dup_word_frac"] == round(1 - 5 / 15, 6)
        # 11 five-gram positions, every gram occurs >= 2 times
        assert r1["dup5_frac"] == 1.0
        # top 2-gram ('a','b') occurs 3 times in 14 positions
        assert r1["top2_frac"] == round(3 * 2 / 15, 6)
        r2 = got.loc[2]
        assert r2["dup_word_frac"] == 0.0 and r2["dup5_frac"] == 0.0
        r3 = got.loc[3]
        assert r3["top2_frac"] == round(4 * 2 / 8, 6)
        r4 = got.loc[4]
        assert (
            r4["n_words"] == 0
            and r4["dup_word_frac"] == 0.0
            and r4["top2_frac"] == 0.0
            and r4["dup5_frac"] == 0.0
        )


class TestDecontaminate:
    def test_planted_overlap(self):
        from docstrange_ray.ops import decontam

        bench = pa.table(
            {
                "doc_id": pa.array([100, 101], pa.int64()),
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "pack my box with five dozen liquor jugs",
                ],
            }
        )
        corpus = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    # verbatim 5-gram from bench doc 100
                    "intro text the quick brown fox jumps outro",
                    # three distinct shared 5-grams (sliding windows)
                    "pack my box with five dozen liquor",
                    # shares only 4-gram-length runs -> clean at n=5
                    "quick brown fox jumps elsewhere now",
                    "completely unrelated content here today ok",
                ],
            }
        )
        got = (
            decontam.decontaminate(
                ray.data.from_arrow(corpus), ray.data.from_arrow(bench), n=5
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == [1, 2]
        assert list(got["n_overlap"]) == [1, 3]

    def test_case_and_whitespace_normalized(self):
        from docstrange_ray.ops import decontam

        bench = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": ["A B C D E"]}
        )
        corpus = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": ["x  a b\tc d e  y"]}
        )
        got = decontam.decontaminate(
            ray.data.from_arrow(corpus), ray.data.from_arrow(bench), n=5
        ).to_pandas()
        assert list(got["doc_id"]) == [1] and list(got["n_overlap"]) == [1]


class TestCcnetBuckets:
    def test_vs_oracle_sql_multilang(self, ray_session):
        import __ray_entry__ as entrymod
        from docstrange_ray.ops.curate import ccnet_buckets

        rng = np.random.default_rng(13)
        en = "the cat and the dog is in that house for it with them".split()
        de = "der hund und die katze ist nicht ein tier mit uns von hier".split()
        rows = []
        for i in range(30):
            words = (en if i % 2 == 0 else de)
            k = 6 + int(rng.integers(0, 6))
            rows.append(
                {
                    "doc_id": i,
                    "text": " ".join(words[int(rng.integers(0, 3)) :][:k]),
                }
            )
        tbl = pa.Table.from_pylist(rows)
        got = (
            ccnet_buckets(ray.data.from_arrow(tbl).repartition(3))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = (
            con.execute(entrymod.oracle_sql()["ccnet_buckets"]).fetchdf()
            .sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # both languages present and all three buckets assigned somewhere
        assert set(got["pred_lang"]) == {"en", "de"}
        assert set(got["bucket"]) == {"head", "middle", "tail"}


class TestEmbeddingDecontam:
    def test_flags_planted_paraphrase(self, ray_session):
        from docstrange_ray.ops.decontam import embedding_decontaminate

        rng = np.random.default_rng(9)
        bench = rng.normal(size=(4, 12))
        # corpus: 2 near-copies of bench[1] and bench[3], 20 randoms
        near = [bench[1] * 3.0, bench[3] + rng.normal(scale=1e-3, size=12)]
        fills = rng.normal(size=(20, 12))
        def tbl(mat, ids):
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [r.astype(np.float32) for r in mat], pa.list_(pa.float32())
                    ),
                }
            )
        bds = ray.data.from_arrow(tbl(bench, [0, 1, 2, 3]))
        cds = ray.data.from_arrow(
            tbl(np.vstack([near, fills]), list(range(100, 122)))
        ).repartition(3)
        got = embedding_decontaminate(cds, bds, threshold=0.95).to_pandas()
        got = got.sort_values("vec_id").reset_index(drop=True)
        assert got["vec_id"].tolist() == [100, 101]
        assert got["bench_id"].tolist() == [1, 3]
        assert (got["max_cos"] >= 0.999).all()

    def test_tie_breaks_to_lowest_bench_id(self, ray_session):
        from docstrange_ray.ops.decontam import embedding_decontaminate

        v = np.eye(8)[0]
        bds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([5, 2], pa.int64()),  # unsorted on purpose
                    "embedding": pa.array(
                        [(v * 2).astype(np.float32), v.astype(np.float32)],
                        pa.list_(pa.float32()),
                    ),
                }
            )
        )
        cds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([9], pa.int64()),
                    "embedding": pa.array([v.astype(np.float32)], pa.list_(pa.float32())),
                }
            )
        )
        got = embedding_decontaminate(cds, bds, threshold=0.5).to_pandas()
        # both bench vectors tie at rounded cos 1.0 -> lowest vec_id (2)
        assert got["bench_id"].tolist() == [2]


class TestMixtureWeights:
    def test_closed_form_vs_duckdb(self, ray_session):
        from docstrange_ray.ops.sampling import mixture_weights

        rows = []
        totals = {"a": 1000, "b": 400, "c": 250, "d": 77}
        for s, tot in totals.items():
            # split each source's mass over several docs
            parts = [tot // 3, tot // 3, tot - 2 * (tot // 3)]
            rows += [{"source": s, "n_chars": p} for p in parts]
        targets = {"a": 0.5, "b": 0.3, "c": 0.2}
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
        got = (
            mixture_weights(ds, targets)
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        # binding source: min(T/p) = min(2000, 1333.3, 1250) -> c (=250/0.2)
        assert got.loc[got["source"] == "c", "sample_rate"].iloc[0] == 1.0
        exp_c = 250 / 0.2
        assert np.allclose(
            got["expected_value"],
            [exp_c * 0.5, exp_c * 0.3, exp_c * 0.2, 0.0],
            atol=1e-6,
        )
        # target-0 source kept with rate 0
        assert got.loc[got["source"] == "d", "sample_rate"].iloc[0] == 0.0
        # realized mixture == target exactly (that's the solve)
        ev = got["expected_value"].to_numpy()
        assert np.allclose(ev[:3] / ev[:3].sum(), [0.5, 0.3, 0.2], atol=1e-9)

    def test_no_matching_targets_yields_zeros_not_nan(self, ray_session):
        from docstrange_ray.ops.sampling import mixture_weights

        ds = ray.data.from_arrow(
            pa.Table.from_pylist(
                [{"source": "a", "n_chars": 10}, {"source": "b", "n_chars": 5}]
            )
        )
        got = mixture_weights(ds, {"web": 1.0}).to_pandas()
        assert (got["sample_rate"] == 0.0).all()
        assert (got["expected_value"] == 0.0).all()
        assert not got.isna().any().any()


class TestLmScore:
    """Bigram-LM cross-entropy scoring vs a sequential in-test model.

    The corpus deliberately has MANY more distinct words/bigrams than
    shuffle partitions: this pins the pandas-groupby key-separator
    regression (NUL-joined keys silently collapse to their pre-NUL
    prefix in pandas' C-string hashtable, merging the whole vocabulary
    into one count per partition)."""

    def test_scores_match_sequential_model(self):
        import itertools
        from collections import Counter

        words = [f"w{i}" for i in range(40)]
        texts = [
            " ".join(words[i : i + 7]) for i in range(0, 34, 3)
        ] + ["w0 w1 w2 w0 w1", "solo", ""]
        tbl = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": texts,
            }
        )
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in texts:
            ws = t.lower().split()
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        v = len(uni)
        # mirror the default bigram_min_count=2 prune: sub-floor bigrams
        # take the smoothed c=0 floor
        bi = {k: c for k, c in bi.items() if c >= 2}
        exp = {}
        for did, t in enumerate(texts):
            ws = t.lower().split()
            if len(ws) < 2:
                continue
            bits = [
                -np.log2((bi.get((a, b), 0) + 1.0) / (uni[a] + v))
                for a, b in zip(ws, ws[1:])
            ]
            exp[did] = round(float(np.mean(bits)), 6)

        got = textstats.lm_score(ray.data.from_arrow(tbl)).to_pandas()
        got_map = dict(zip(got["doc_id"], got["bits_per_bigram"]))
        assert got_map == exp
        # short/empty docs emit no row
        assert len(texts) - 2 not in got_map and len(texts) - 1 not in got_map
        # a repeated high-frequency bigram scores fewer bits than a
        # one-off bigram chain
        assert got_map[len(texts) - 3] < max(got_map.values())

    def test_plan_gate_and_parity(self):
        """auto routes to join above the gate; both plans agree to 6 dp.

        Pins VERDICT-r3 #2: the bigram table must never be
        driver-materialized above broadcast_bigram_limit."""
        texts = [
            " ".join(f"t{(i * 7 + j) % 53}" for j in range(12)) for i in range(60)
        ]
        tbl = pa.table(
            {"doc_id": pa.array(list(range(len(texts))), pa.int64()), "text": texts}
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        bcast = (
            textstats.lm_score(ds, plan="broadcast")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # tiny limit forces auto -> join; output must match broadcast
        join = (
            textstats.lm_score(ds, plan="auto", broadcast_bigram_limit=10)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert (join["doc_id"] == bcast["doc_id"]).all()
        assert np.abs(
            join["bits_per_bigram"].to_numpy() - bcast["bits_per_bigram"].to_numpy()
        ).max() <= 1e-6
        # generous limit keeps auto on broadcast (bit-identical)
        auto_b = (
            textstats.lm_score(ds, plan="auto", broadcast_bigram_limit=1_000_000)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(auto_b, bcast)


class TestGopherFilter:
    def test_rules_vs_duckdb(self):
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    # passes: >50 words, sane lengths, stopwords, alpha
                    ("the cat and dog sat near a tree " * 8).strip(),
                    "too short to pass the word count rule",
                    ("99 42 17 " * 30).strip(),  # numeric: alpha_frac = 0
                    "",
                ],
            }
        )
        got = (
            textstats.gopher_quality_filter(tbl).to_pandas().reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", tbl)
        import __ray_entry__ as entrymod

        exp = (
            con.execute(entrymod.oracle_sql()["gopher_filter"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert got["pass"].tolist() == [True, False, False, False]

    def test_unicode_alpha_agreement(self):
        # Python isalpha and RE2 \p{L} must agree on non-ASCII letters
        tbl = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": ["héllo wörld événement 123 !!"],
            }
        )
        got = textstats.gopher_quality_filter(tbl).to_pydict()
        con = duckdb.connect()
        con.register("documents", tbl)
        import __ray_entry__ as entrymod

        exp = con.execute(entrymod.oracle_sql()["gopher_filter"]).df()
        assert got["alpha_frac"][0] == exp["alpha_frac"][0]
        assert got["n_words"][0] == 5


class TestPQ:
    """IVF-PQ: code compression + asymmetric LUT scoring. Random
    fixture embeddings are the PQ worst case (no cluster structure), so
    the recall bounds here are conservative floors."""

    def test_encode_shape_and_determinism(self):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        books = ann.train_pq_codebooks(ds, m=8, n_codes=16)
        assert len(books) == 8
        enc = ann.pq_encode(ds, books).take(5)
        assert all(len(r["pq_code"]) == 8 for r in enc)
        books2 = ann.train_pq_codebooks(ds, m=8, n_codes=16)
        assert all((a == b).all() for a, b in zip(books, books2))

    def test_self_hit_and_recall(self):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        rows = ds.take(10)
        q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        qids = [r["vec_id"] for r in rows]
        got = ann.ivf_pq_topk(
            ds, q, qids, k=10, m=16, n_codes=64, n_probe=8
        ).to_pandas()
        brute = ann.brute_force_topk(ds, q, qids, k=10).to_pandas()
        recalls = []
        for qid in qids:
            g = set(got[got["query_id"] == qid]["vec_id"])
            assert qid in g  # a vector always retrieves itself
            b = set(brute[brute["query_id"] == qid]["vec_id"])
            recalls.append(len(g & b) / len(b))
        assert sum(recalls) / len(recalls) >= 0.45


class TestHashJoinDtypes:
    def test_int64_keys_survive_join(self, ray_session):
        # the round-3 regression: null-padded union columns turned int64
        # into float64 through arrow->pandas, corrupting ids above 2^53
        # and breaking downstream exact-equality joins
        from docstrange_ray.shuffle import hash_join

        big = (1 << 53) + 1  # not exactly representable as float64
        left = ray.data.from_arrow(
            pa.table({"k": pa.array([1, big], pa.int64()),
                      "lv": pa.array([10, 20], pa.int64())})
        )
        right = ray.data.from_arrow(
            pa.table({"k": pa.array([1, big], pa.int64()),
                      "rv": pa.array([7, 8], pa.int64())})
        )
        out = hash_join(left, right, key="k").to_pandas().sort_values("k")
        assert out["k"].dtype == np.int64
        assert out["k"].tolist() == [1, big]
        assert out["lv"].tolist() == [10, 20] and out["rv"].tolist() == [7, 8]

    def test_curated_full_chain(self, ray_session):
        from docstrange_ray.ops.curate import curated_docs_full

        base = ("the cat and a dog sat on the mat near a tree " * 4).strip()
        permuted = " ".join(reversed(base.split()))  # same bag of words:
        # simhash hamming 0 (near dup) but a different content_md5
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    base,
                    base,      # exact dup of 1
                    permuted,  # simhash near-dup of 1, not an exact dup
                    "low",     # fails the quality floor
                ],
            }
        )
        out = curated_docs_full(ray.data.from_arrow(tbl)).to_pandas()
        assert out["doc_id"].tolist() == [1]


class TestGlobalRowNumber:
    """shuffle.global_row_number (sample-based range exchange + offset
    broadcast) vs DuckDB ROW_NUMBER."""

    def _check(self, tbl, descending):
        from docstrange_ray.shuffle import global_row_number

        got = (
            global_row_number(
                ray.data.from_arrow(tbl), "v", descending=descending, tiebreak="doc_id"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        order = "DESC" if descending else ""
        exp = (
            con.sql(
                f"SELECT doc_id, v, ROW_NUMBER() OVER (ORDER BY v {order}, doc_id) AS rank FROM t"
            )
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "v", "rank"]],
            exp[["doc_id", "v", "rank"]],
            check_dtype=False,
        )

    def test_vs_duckdb_with_heavy_ties(self):
        import numpy as np

        rng = np.random.RandomState(11)
        n = 2000
        # heavy ties: only 7 distinct values, so boundary values repeat
        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "v": pa.array(rng.randint(0, 7, size=n), pa.int64()),
            }
        )
        self._check(tbl, descending=True)
        self._check(tbl, descending=False)

    def test_parallelism_invariant(self):
        import numpy as np

        from docstrange_ray.shuffle import global_row_number

        rng = np.random.RandomState(3)
        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(500), pa.int64()),
                "v": pa.array(rng.randint(0, 10**6, size=500), pa.int64()),
            }
        )
        a = (
            global_row_number(ray.data.from_arrow(tbl), "v", num_partitions=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            global_row_number(
                ray.data.from_arrow(tbl).repartition(7), "v", num_partitions=13
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_rank_and_dense_rank_vs_duckdb(self):
        import numpy as np

        from docstrange_ray.shuffle import global_row_number

        rng = np.random.RandomState(5)
        n = 800
        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "v": pa.array(rng.randint(0, 12, size=n), pa.int64()),  # heavy ties
            }
        )
        con = duckdb.connect()
        con.register("t", tbl)
        for kind, fn in (("rank", "RANK()"), ("dense_rank", "DENSE_RANK()")):
            got = (
                global_row_number(
                    ray.data.from_arrow(tbl).repartition(5),
                    "v",
                    descending=True,
                    num_partitions=6,
                    rank_kind=kind,
                )
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            exp = (
                con.sql(
                    f"SELECT doc_id, v, {fn} OVER (ORDER BY v DESC) AS rank FROM t"
                )
                .df()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got[["doc_id", "v", "rank"]],
                exp[["doc_id", "v", "rank"]],
                check_dtype=False,
            )

    def test_bad_rank_kind(self):
        import pytest as _pytest

        from docstrange_ray.shuffle import global_row_number

        tbl = pa.table({"doc_id": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())})
        with _pytest.raises(ValueError, match="rank_kind"):
            global_row_number(ray.data.from_arrow(tbl), "v", rank_kind="percentile")

    def test_keys_above_2_53(self):
        # int64 boundaries: a float64 path would collapse 2^53+1 vs 2^53
        base = 2**53
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array([base + 1, base, base + 3, base + 2], pa.int64()),
            }
        )
        self._check(tbl, descending=False)


class TestStratifiedCap:
    def test_cap_and_determinism(self, ray_session):
        from docstrange_ray.ops.sampling import stratified_cap

        tbl = pa.table(
            {
                "doc_id": pa.array(list(range(100)), pa.int64()),
                "source": pa.array(
                    ["a"] * 60 + ["b"] * 30 + ["c"] * 10, pa.string()
                ),
            }
        )
        ds = ray.data.from_arrow(tbl)
        out = stratified_cap(ds, "source", cap=5).to_pandas()
        counts = out.groupby("source")["doc_id"].count().to_dict()
        assert counts == {"a": 5, "b": 5, "c": 5}
        assert set(out["sample_rank"]) == {1, 2, 3, 4, 5}
        # determinism across repartitioning: same winners at any layout
        out2 = stratified_cap(ds.repartition(7), "source", cap=5).to_pandas()
        a = out.sort_values(["source", "doc_id"]).reset_index(drop=True)
        b = out2.sort_values(["source", "doc_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_small_stratum_kept_whole(self, ray_session):
        from docstrange_ray.ops.sampling import stratified_cap

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "source": pa.array(["x", "x", "y"], pa.string()),
            }
        )
        out = stratified_cap(ray.data.from_arrow(tbl), "source", cap=10).to_pandas()
        assert len(out) == 3


class TestSemantic:
    """Distributed k-means + SemDeDup (ops/semantic.py). The fit is
    oracle-pinned against the unrolled Lloyd SQL (__ray_entry__._kmeans_cte)
    so the k-row-reduce-per-iteration plan provably matches a
    sequential implementation."""

    def test_kmeans_vs_duckdb(self, ray_session):
        from docstrange_ray.ops import semantic
        import __ray_entry__ as entrymod

        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        got = (
            semantic.kmeans_clusters(ds, k=8, n_iters=2)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
        )
        exp = (
            con.execute(entrymod.oracle_sql()["kmeans_clusters"])
            .df()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # sanity: every cluster non-empty on the near-random fixture
        assert got["cluster"].nunique() == 8

    def test_semantic_dedup_vs_duckdb(self, ray_session):
        from docstrange_ray.ops import semantic
        import __ray_entry__ as entrymod

        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        got = (
            semantic.semantic_dedup(ds, k=8, n_iters=2, tau=0.35)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)[["vec_id", "cluster", "kept"]]
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
        )
        exp = (
            con.execute(entrymod.oracle_sql()["semantic_dedup"])
            .df()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert (got["kept"] == 0).sum() > 0  # real drop pressure

    def test_planted_duplicates_dropped(self, ray_session):
        # 3 planted copies of vector 0 (tiny jitter) must all drop;
        # keep-lowest-id: the original (vec_id 0) survives.
        from docstrange_ray.ops import semantic

        rng = np.random.default_rng(7)
        base = rng.normal(size=(40, 16))
        dups = base[0] + rng.normal(scale=1e-4, size=(3, 16))
        mat = np.vstack([base, dups])
        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
        out = (
            semantic.semantic_dedup(
                ray.data.from_arrow(tbl), k=4, n_iters=2, tau=0.99
            )
            .to_pandas()
            .set_index("vec_id")
        )
        assert out.loc[0, "kept"] == 1
        assert out.loc[[40, 41, 42], "kept"].tolist() == [0, 0, 0]
        # dup rows land in the same cluster as their original
        assert out.loc[[40, 41, 42], "cluster"].nunique() == 1
        assert out.loc[40, "cluster"] == out.loc[0, "cluster"]

    def test_hot_cluster_under_tiny_tile_budget(self, ray_session, monkeypatch):
        """One planted hot cluster (~85% of rows) pruned correctly with
        the sim-tile edge forced to 4 — proves the both-axis tiling never
        needs more than _CHUNK^2 similarity floats (VERDICT-r3 #5) and
        that tiling is output-invariant."""
        from docstrange_ray.ops import semantic

        rng = np.random.default_rng(11)
        # hot blob: 100 near-identical vectors around e0 (tiny jitter,
        # cos ~ 1), cold blob: 18 well-spread vectors around e1
        hot = np.eye(12)[0] + rng.normal(scale=1e-3, size=(100, 12))
        cold = np.eye(12)[1] + rng.normal(scale=0.4, size=(18, 12))
        mat = np.vstack([hot, cold])
        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in mat], pa.list_(pa.float32())
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        ref = (
            semantic.semantic_dedup(ds, k=2, n_iters=2, tau=0.9)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        monkeypatch.setattr(semantic, "_CHUNK", 4)
        tiny = (
            semantic.semantic_dedup(ds, k=2, n_iters=2, tau=0.9)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(tiny, ref)
        # the hot blob collapsed to its lowest-id representative
        hot_rows = ref[ref["vec_id"] < 100]
        assert hot_rows["kept"].sum() == 1 and ref.loc[0, "kept"] == 1

    def test_target_cluster_size_derives_k(self, ray_session):
        from docstrange_ray.ops import semantic

        rng = np.random.default_rng(5)
        mat = rng.normal(size=(64, 8))
        tbl = pa.table(
            {
                "vec_id": pa.array(range(64), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in mat], pa.list_(pa.float32())
                ),
            }
        )
        out = semantic.semantic_dedup(
            ray.data.from_arrow(tbl), k=2, n_iters=1, tau=0.99,
            target_cluster_size=10,
        ).to_pandas()
        # ceil(64/10) = 7 clusters requested; >2 must actually materialize
        assert out["cluster"].nunique() > 2

    def test_kpp_init_partitions_planted_clusters(self, ray_session):
        # two well-separated blobs: kpp-seeded k=2 must split them exactly
        from docstrange_ray.ops import semantic

        rng = np.random.default_rng(3)
        a = rng.normal(loc=0.0, scale=0.05, size=(30, 8)) + np.eye(8)[0]
        b = rng.normal(loc=0.0, scale=0.05, size=(30, 8)) + np.eye(8)[1]
        mat = np.vstack([a, b])
        tbl = pa.table(
            {
                "vec_id": pa.array(range(60), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in mat], pa.list_(pa.float32())
                ),
            }
        )
        out = (
            semantic.kmeans_clusters(
                ray.data.from_arrow(tbl), k=2, n_iters=3, init="kpp"
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        first, second = out["cluster"][:30], out["cluster"][30:]
        assert first.nunique() == 1 and second.nunique() == 1
        assert first.iloc[0] != second.iloc[0]


class TestNBClassifier:
    """Multinomial NB (ops/classifier.py): trained with one count
    shuffle, scored shuffle-free against the broadcast model."""

    def test_vs_duckdb(self, ray_session):
        import __ray_entry__ as entrymod

        got = (
            entrymod.queries()["nb_classify"](SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = (
            con.execute(entrymod.oracle_sql()["nb_classify"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_planted_separable_corpus(self, ray_session):
        # disjoint vocabularies -> NB must recover the labels exactly,
        # including docs whose batch neighbors are other classes
        from docstrange_ray.ops import classifier

        rng = np.random.default_rng(11)
        vocab = {
            "red": ["apple", "brick", "rose", "fire"],
            "blue": ["sea", "sky", "ice", "jean"],
            "green": ["leaf", "grass", "lime", "moss"],
        }
        rows = []
        for i in range(120):
            lab = ["red", "blue", "green"][i % 3]
            words = rng.choice(vocab[lab], size=12)
            rows.append({"doc_id": i, "lang": lab, "text": " ".join(words)})
        tbl = pa.Table.from_pylist(rows)
        ds = ray.data.from_arrow(tbl).repartition(6)
        out = (
            classifier.nb_classify(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        truth = [r["lang"] for r in rows]
        assert out["nb_label"].tolist() == truth

    def test_oov_and_empty_docs(self, ray_session):
        # predict() on docs with unseen words / empty text must not
        # error: OOV words hit the smoothing floor, empty docs score
        # prior-only
        from docstrange_ray.ops import classifier

        train = pa.Table.from_pylist(
            [
                {"doc_id": 0, "lang": "a", "text": "x x y"},
                {"doc_id": 1, "lang": "b", "text": "z z w"},
                {"doc_id": 2, "lang": "b", "text": "w z"},
            ]
        )
        model = classifier.nb_train(ray.data.from_arrow(train))
        test = pa.Table.from_pylist(
            [
                {"doc_id": 10, "text": "x y"},
                {"doc_id": 11, "text": "unseen words entirely"},
                {"doc_id": 12, "text": "   "},
                {"doc_id": 13, "text": "z"},
            ]
        )
        out = (
            classifier.nb_predict(ray.data.from_arrow(test), model)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[10, "nb_label"] == "a"
        assert out.loc[13, "nb_label"] == "b"
        # empty doc falls back to the prior (b: 2/3 docs)
        assert out.loc[12, "nb_label"] == "b"
        # pure-OOV doc: every word scores the smoothing floor
        # 1/(class_total+V), which is LARGER for the smaller class —
        # 3*ln(1/7)+ln(1/3) > 3*ln(1/9)+ln(2/3), so 'a' wins
        assert out.loc[11, "nb_label"] == "a"


class TestSourceMix:
    """Domain-mix resampling (ops/sampling.source_mix): exact integer
    thresholds, binding source kept whole, never upsamples."""

    def test_vs_duckdb(self, ray_session):
        import __ray_entry__ as entrymod

        got = (
            entrymod.queries()["source_mix"](SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = (
            con.execute(entrymod.oracle_sql()["source_mix"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # binding source (largest weight, equal counts) survives whole
        assert (got["source"] == "src1").sum() == 25

    def test_mix_and_determinism(self, ray_session):
        from docstrange_ray.ops.sampling import source_mix

        # 3 sources x 4000 rows; target 2:1:1 -> src_a binding (whole)
        rows = [
            {"doc_id": i, "source": f"src_{'abc'[i % 3]}"} for i in range(12000)
        ]
        tbl = pa.Table.from_pylist(rows)
        ds = ray.data.from_arrow(tbl)
        out = source_mix(ds, {"src_a": 2, "src_b": 1, "src_c": 1}).to_pandas()
        counts = out.groupby("source").size().to_dict()
        assert counts["src_a"] == 4000  # binding: rate exactly 1
        # others target 2000 each; Bernoulli noise ~ +/- 3 sigma = 134
        assert abs(counts["src_b"] - 2000) < 150
        assert abs(counts["src_c"] - 2000) < 150
        # stable across block layouts
        out2 = source_mix(
            ds.repartition(13), {"src_a": 2, "src_b": 1, "src_c": 1}
        ).to_pandas()
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = out2.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_unweighted_and_missing_sources(self, ray_session):
        from docstrange_ray.ops.sampling import source_mix

        tbl = pa.Table.from_pylist(
            [
                {"doc_id": 1, "source": "x"},
                {"doc_id": 2, "source": "x"},
                {"doc_id": 3, "source": "y"},
            ]
        )
        ds = ray.data.from_arrow(tbl)
        # y unweighted -> dropped; ghost weight for absent source ignored
        out = source_mix(ds, {"x": 1, "ghost": 5}).to_pandas()
        assert set(out["source"]) == {"x"}
        assert len(out) == 2  # x is binding -> kept whole


class TestPackOffsets:
    """Distributed ordered prefix sum / sequence packing
    (ops/packing.py): two-pass scan, projection-only shuffles."""

    def test_vs_duckdb(self, ray_session):
        import __ray_entry__ as entrymod

        got = (
            entrymod.queries()["pack_offsets"](SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = (
            con.execute(entrymod.oracle_sql()["pack_offsets"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # prefix-sum invariant: offsets strictly increase by n_tokens
        g = got.sort_values("doc_id")
        assert (
            g["start_offset"].to_numpy()[1:]
            == (g["start_offset"] + g["n_tokens"]).to_numpy()[:-1]
        ).all()

    def test_sparse_ids_and_layout_stability(self, ray_session):
        from docstrange_ray.ops.packing import pack_offsets

        # skewed, sparse id space (hot low range + distant outliers)
        ids = list(range(100)) + [10_000, 50_000, 1_000_000]
        rows = [
            {"doc_id": i, "text": " ".join(["w"] * ((i % 7) + 1))} for i in ids
        ]
        tbl = pa.Table.from_pylist(rows)
        out1 = (
            pack_offsets(ray.data.from_arrow(tbl), budget=50)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        out2 = (
            pack_offsets(ray.data.from_arrow(tbl).repartition(9), budget=50)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out1, out2)
        # sequential oracle
        exp_off = 0
        for _, r in out1.iterrows():
            assert r["start_offset"] == exp_off
            assert r["shard_id"] == exp_off // 50
            exp_off += r["n_tokens"]

    def test_empty_and_blank_docs(self, ray_session):
        from docstrange_ray.ops.packing import pack_offsets

        tbl = pa.Table.from_pylist(
            [
                {"doc_id": 1, "text": "a b c"},
                {"doc_id": 2, "text": "   "},
                {"doc_id": 3, "text": "d"},
            ]
        )
        out = (
            pack_offsets(ray.data.from_arrow(tbl), budget=2)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[2, "n_tokens"] == 0
        assert out.loc[2, "start_offset"] == 3
        assert out.loc[3, "start_offset"] == 3
        assert out.loc[3, "shard_id"] == 1


class TestTfidfJoinPlan:
    def test_join_plan_matches_broadcast(self, ray_session):
        # the unbounded-vocabulary path must be byte-identical to the
        # broadcast path (same ranking, ties, rounding)
        ds = ray.data.read_parquet(f"{SF}/documents.parquet").limit(200)
        a = (
            textstats.tfidf_topk(ds, k=5, plan="broadcast")
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        b = (
            textstats.tfidf_topk(ds, k=5, plan="join")
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_auto_gate_selects_join_above_limit(self, ray_session):
        ds = ray.data.read_parquet(f"{SF}/documents.parquet").limit(50)
        a = (
            textstats.tfidf_topk(ds, k=3, plan="auto", broadcast_term_limit=10)
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        b = (
            textstats.tfidf_topk(ds, k=3, plan="broadcast")
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestDupSpans:
    """ExactSubstr-style duplicate spans (dedup.dup_spans)."""

    def test_vs_duckdb(self, ray_session):
        import __ray_entry__ as entrymod

        got = (
            entrymod.queries()["dup_spans"](SF)
            .to_pandas()
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = (
            con.execute(entrymod.oracle_sql()["dup_spans"])
            .df()
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_planted_cross_doc_substring(self, ray_session):
        rng = np.random.RandomState(5)
        vocab = [f"w{i}" for i in range(500)]
        uniq = lambda n: " ".join(rng.choice(vocab, n))
        shared = " ".join(f"s{i}" for i in range(20))  # 20-word shared run
        rows = [
            {"doc_id": 1, "text": uniq(30) + " " + shared + " " + uniq(25)},
            {"doc_id": 2, "text": uniq(40) + " " + shared},
            {"doc_id": 3, "text": uniq(50)},
        ]
        out = (
            dedup.dup_spans(
                ray.data.from_arrow(pa.Table.from_pylist(rows)), window=16
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # first occurrence (doc 1) is clean; doc 2's copy is cut
        assert out["doc_id"].tolist() == [2]
        # the shared run sits at words 41..60 (1-based); the 5 window
        # starts 41..45 cover 41..60 exactly after merging
        assert out.loc[0, "span_start"] == 41
        assert out.loc[0, "span_end"] == 60

    def test_within_doc_repetition_and_merge(self, ray_session):
        # a doc repeating its own 16-word block back-to-back: the second
        # copy is a duplicate span; merging collapses overlapping windows
        block = " ".join(f"b{i}" for i in range(16))
        rows = [{"doc_id": 7, "text": block + " " + block + " " + block}]
        out = (
            dedup.dup_spans(
                ray.data.from_arrow(pa.Table.from_pylist(rows)), window=16
            )
            .to_pandas()
        )
        assert len(out) == 1
        # copies 2 and 3 (words 17..48) are one merged cut; the window
        # starting at each position 2..33 repeats pos-16 so coverage
        # begins at word 2+? — first occurrence keeps pos 1 only
        assert out.loc[0, "doc_id"] == 7
        assert out.loc[0, "span_end"] == 48
        assert out.loc[0, "span_start"] <= 17

    def test_short_docs_and_layout_stability(self, ray_session):
        rows = [{"doc_id": i, "text": "too short " * 2} for i in range(30)]
        shared = " ".join(f"z{i}" for i in range(16))
        rows += [{"doc_id": 100 + i, "text": shared} for i in range(4)]
        tbl = pa.Table.from_pylist(rows)
        out1 = (
            dedup.dup_spans(ray.data.from_arrow(tbl), window=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        out2 = (
            dedup.dup_spans(ray.data.from_arrow(tbl).repartition(11), window=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out1, out2)
        # 4-word docs have no 16-windows; dup copies 101..103 are cut whole
        assert out1["doc_id"].tolist() == [101, 102, 103]
        assert (out1["span_start"] == 1).all() and (out1["span_end"] == 16).all()


class TestRankStats:
    def test_group_topk_matches_window_oracle(self, ray_session):
        from docstrange_ray.ops.rankstats import group_topk

        rng = np.random.RandomState(11)
        n = 400
        tbl = pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "source": pa.array(
                    [f"s{rng.randint(5)}" for _ in range(n)], pa.string()
                ),
                # heavy duplication so ties exercise the doc_id tie-break
                "score": pa.array(rng.randint(0, 20, n), pa.int64()),
            }
        )
        out = (
            group_topk(
                ray.data.from_arrow(tbl).repartition(9),
                group_key="source",
                order_key="score",
                k=4,
            )
            .to_pandas()
            .sort_values(["source", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            """
            SELECT source, doc_id, score, CAST(rn AS BIGINT) AS rank FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY score DESC, doc_id) AS rn FROM t)
            WHERE rn <= 4 ORDER BY source, rn
            """
        ).fetchdf()
        pd.testing.assert_frame_equal(out, exp)

    def test_group_topk_hot_group_partial_bound(self, ray_session):
        """A group with every row must still return exactly k, and the
        per-batch partial must cap what crosses the exchange: spy on the
        candidate stage by running it standalone."""
        from docstrange_ray.ops.rankstats import group_topk

        n = 1000
        tbl = pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "source": pa.array(["hot"] * n, pa.string()),
                "score": pa.array(list(range(n)), pa.int64()),
            }
        )
        out = group_topk(
            ray.data.from_arrow(tbl).repartition(8),
            group_key="source",
            order_key="score",
            k=3,
        ).to_pandas()
        assert out["doc_id"].tolist() == [999, 998, 997]
        assert out["rank"].tolist() == [1, 2, 3]

    def test_group_quantiles_duckdb_parity_many_n(self, ray_session):
        """Pin the ceil(q*n) position rule against DuckDB quantile_disc
        across group sizes 1..60 (every boundary in range) including
        heavy value duplication."""
        from docstrange_ray.ops.rankstats import group_quantiles

        rng = np.random.RandomState(3)
        rows = []
        for g in range(1, 61):
            for _ in range(g):
                rows.append({"g": f"g{g:02d}", "v": int(rng.randint(0, 10))})
        tbl = pa.Table.from_pylist(rows)
        out = (
            group_quantiles(
                ray.data.from_arrow(tbl).repartition(7), group_key="g", value_key="v"
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            """
            SELECT g, COUNT(*) AS n,
                   quantile_disc(v, 0.50) AS p50,
                   quantile_disc(v, 0.90) AS p90,
                   quantile_disc(v, 0.99) AS p99
            FROM t GROUP BY g ORDER BY g
            """
        ).fetchdf()
        pd.testing.assert_frame_equal(out, exp)


class TestHeavyTokens:
    """Misra-Gries candidates + exact verify: output must equal the
    naive GROUP BY ... HAVING regardless of sketch size k."""

    def _oracle(self, tbl, fraction):
        con = duckdb.connect()
        con.register("documents", tbl)
        return con.sql(
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

    def test_fixture_parity(self):
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sketch import heavy_tokens

        docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            heavy_tokens(docs, fraction=0.01)
            .to_pandas()
            .sort_values("token")
            .reset_index(drop=True)
        )
        import pyarrow.parquet as pq

        exp = self._oracle(pq.read_table(f"{SF}/documents.parquet"), 0.01)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_planted_heavy_hitter_survives_tiny_sketch(self):
        # 400 distinct rare words + one word at ~33% frequency; k=8
        # forces real MG compression in every batch, and the guarantee
        # (count > n/(k+1) survives) must still hold.
        rng = np.random.RandomState(11)
        rows = []
        for i in range(80):
            words = [f"rare{rng.randint(400)}" for _ in range(20)] + ["heavy"] * 10
            rng.shuffle(words)
            rows.append({"doc_id": i, "text": " ".join(words)})
        tbl = pa.Table.from_pylist(rows)
        from docstrange_ray.ops.sketch import heavy_tokens

        got = (
            heavy_tokens(ray.data.from_arrow(tbl).repartition(8), fraction=0.2, k=8)
            .to_pandas()
            .sort_values("token")
            .reset_index(drop=True)
        )
        exp = self._oracle(tbl, 0.2)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert got["token"].tolist() == ["heavy"]
        assert got["n_occurrences"].tolist() == [800]

    def test_empty_and_blank_docs(self):
        tbl = pa.Table.from_pylist(
            [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": "   "},
             {"doc_id": 2, "text": "x x y"}]
        )
        from docstrange_ray.ops.sketch import heavy_tokens

        got = (
            heavy_tokens(ray.data.from_arrow(tbl), fraction=0.5)
            .to_pandas()
            .sort_values("token")
            .reset_index(drop=True)
        )
        assert got["token"].tolist() == ["x"]
        assert got["n_occurrences"].tolist() == [2]

    def test_bad_fraction_rejected(self):
        from docstrange_ray.ops.sketch import heavy_tokens

        with pytest.raises(ValueError):
            heavy_tokens(None, fraction=0.0)


class TestHLL:
    def test_error_band_and_merge_invariance(self):
        from docstrange_ray.ops.sketch import approx_distinct

        rows = []
        # group g0: 100 distinct, g1: 10_000 distinct (each value once
        # or several times -- multiplicity must not matter)
        for i in range(100):
            rows.append({"g": "g0", "v": i})
            rows.append({"g": "g0", "v": i})
        for i in range(10_000):
            rows.append({"g": "g1", "v": i})
        tbl = pa.Table.from_pylist(rows)

        def run(parts):
            return (
                approx_distinct(
                    ray.data.from_arrow(tbl).repartition(parts),
                    value_col="v",
                    group_key="g",
                )
                .to_pandas()
                .sort_values("g")
                .reset_index(drop=True)
            )

        a, b = run(1), run(16)
        # merge is elementwise max => identical at any parallelism
        pd.testing.assert_frame_equal(a, b)
        est = dict(zip(a["g"], a["n_distinct_approx"]))
        assert abs(est["g0"] - 100) / 100 < 0.02
        assert abs(est["g1"] - 10_000) / 10_000 < 0.03

    def test_vs_exact_on_fixture(self, ray_session):
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sketch import approx_distinct

        ev = read_parquet_clean(
            f"{SF}/events.parquet", columns=["event_type", "user_id"]
        )
        got = approx_distinct(ev, value_col="user_id", group_key="event_type").to_pandas()
        con = duckdb.connect()
        exact = con.sql(
            f"""SELECT event_type, COUNT(DISTINCT user_id) AS n
                FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"""
        ).df()
        m = got.merge(exact, on="event_type")
        assert len(m) == len(exact)
        rel_err = (m["n_distinct_approx"] - m["n"]).abs() / m["n"]
        assert (rel_err < 0.05).all(), m

    def test_bad_p_rejected(self):
        from docstrange_ray.ops.sketch import approx_distinct

        with pytest.raises(ValueError):
            approx_distinct(None, value_col="v", group_key="g", p=3)


class TestWeightedSample:
    def test_vs_duckdb(self, ray_session):
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sampling import weighted_sample

        docs = read_parquet_clean(
            f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        got = weighted_sample(docs, k=25, weight_col="n_chars").to_pandas()
        con = duckdb.connect()
        exp = con.sql(
            rf"""SELECT doc_id, n_chars,
                      ROUND(POW(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                                / 18446744073709551616.0, 1.0 / n_chars), 6) AS priority
               FROM read_parquet('{SF}/documents.parquet')
               WHERE n_chars > 0
               ORDER BY POW(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                            / 18446744073709551616.0, 1.0 / n_chars) DESC, doc_id
               LIMIT 25"""
        ).df()
        a = got.sort_values("doc_id").reset_index(drop=True)
        b = exp.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_batching_invariance_and_weight_bias(self, ray_session):
        from docstrange_ray.ops.sampling import weighted_sample

        rows = [{"id": i, "w": 100.0 if i < 50 else 1.0} for i in range(1000)]
        tbl = pa.Table.from_pylist(rows)

        def run(parts):
            return (
                weighted_sample(
                    ray.data.from_arrow(tbl).repartition(parts),
                    k=30, weight_col="w", id_col="id",
                )
                .to_pandas()
                .sort_values("id")
                .reset_index(drop=True)
            )

        a, b = run(1), run(13)
        pd.testing.assert_frame_equal(a, b)
        # the 50 heavy rows (weight 100 vs 1) must dominate the sample
        assert (a["id"] < 50).sum() > 15

    def test_nonpositive_weights_excluded(self, ray_session):
        from docstrange_ray.ops.sampling import weighted_sample

        tbl = pa.Table.from_pylist(
            [{"id": 0, "w": 0.0}, {"id": 1, "w": -2.0}, {"id": 2, "w": 5.0}]
        )
        out = weighted_sample(
            ray.data.from_arrow(tbl), k=10, weight_col="w", id_col="id"
        ).to_pandas()
        assert out["id"].tolist() == [2]

    def test_bad_k_rejected(self):
        from docstrange_ray.ops.sampling import weighted_sample

        with pytest.raises(ValueError):
            weighted_sample(None, k=0, weight_col="w")


class TestMRL:
    def test_small_groups_exact(self, ray_session):
        # groups smaller than k never compact: the sketch IS the data
        # and quantiles must equal DuckDB quantile_disc exactly
        from docstrange_ray.ops.sketch import approx_quantiles

        rng = np.random.RandomState(5)
        rows = [
            {"g": f"g{i % 4}", "v": float(rng.randint(1000))} for i in range(600)
        ]
        tbl = pa.Table.from_pylist(rows)
        got = (
            approx_quantiles(
                ray.data.from_arrow(tbl).repartition(1), value_col="v", group_key="g"
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.sql(
            """SELECT g, COUNT(*) AS n,
                      quantile_disc(v, 0.50) AS q50,
                      quantile_disc(v, 0.90) AS q90,
                      quantile_disc(v, 0.99) AS q99
               FROM t GROUP BY g ORDER BY g"""
        ).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_rank_error_bound_large(self, ray_session):
        from docstrange_ray.ops.sketch import approx_quantiles

        rng = np.random.RandomState(6)
        vals = rng.normal(size=40_000)
        tbl = pa.Table.from_pylist([{"g": "a", "v": float(v)} for v in vals])
        got = approx_quantiles(
            ray.data.from_arrow(tbl).repartition(16),
            value_col="v",
            group_key="g",
            k=200,
        ).to_pandas()
        srt = np.sort(vals)
        for q, col in [(0.5, "q50"), (0.9, "q90"), (0.99, "q99")]:
            rank = np.searchsorted(srt, got[col].iloc[0]) / len(vals)
            assert abs(rank - q) < 0.02, (col, rank)
        assert int(got["n"].iloc[0]) == len(vals)

    def test_bad_k_rejected(self):
        from docstrange_ray.ops.sketch import approx_quantiles

        with pytest.raises(ValueError):
            approx_quantiles(None, value_col="v", group_key="g", k=4)


class TestVocabEncode:
    def test_vs_duckdb(self, ray_session):
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.textstats import vocab_encode

        docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            vocab_encode(docs, vocab_size=20)
            .to_pandas()
            .sort_values(["doc_id", "pos"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        exp = con.sql(
            rf"""WITH docs AS (
                  SELECT doc_id,
                         list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     x -> x <> '') AS ws
                  FROM read_parquet('{SF}/documents.parquet')
                ), cnt AS (
                  SELECT w, COUNT(*) AS c
                  FROM (SELECT UNNEST(ws) AS w FROM docs) GROUP BY w
                ), vocab AS (
                  SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS id
                  FROM cnt QUALIFY id <= 20
                ), tok AS (
                  SELECT doc_id, i - 1 AS pos, ws[i] AS w
                  FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(i)
                )
                SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS token_id
                FROM tok t LEFT JOIN vocab v USING (w)
                ORDER BY doc_id, pos"""
        ).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert (got["token_id"] == 0).any()  # OOV actually exercised

    def test_ids_deterministic_and_dense(self, ray_session):
        from docstrange_ray.ops.textstats import vocab_encode

        tbl = pa.Table.from_pylist(
            [
                {"doc_id": 0, "text": "b b b a a c"},
                {"doc_id": 1, "text": "a c d"},
            ]
        )

        def run(parts):
            return (
                vocab_encode(ray.data.from_arrow(tbl).repartition(parts), vocab_size=3)
                .to_pandas()
                .sort_values(["doc_id", "pos"])
                .reset_index(drop=True)
            )

        a, b = run(1), run(4)
        pd.testing.assert_frame_equal(a, b)
        # counts: b=3, a=3, c=2, d=1 -> ids by (count desc, word asc):
        # a=1, b=2, c=3; d OOV=0
        doc0 = a[a["doc_id"] == 0]["token_id"].tolist()
        doc1 = a[a["doc_id"] == 1]["token_id"].tolist()
        assert doc0 == [2, 2, 2, 1, 1, 3]
        assert doc1 == [1, 3, 0]

    def test_bad_vocab_size(self):
        from docstrange_ray.ops.textstats import vocab_encode

        with pytest.raises(ValueError):
            vocab_encode(None, vocab_size=0)


class TestPMICollocations:
    def test_vs_duckdb(self, ray_session):
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.textstats import pmi_collocations

        docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            pmi_collocations(docs, min_count=5, k=30)
            .to_pandas()
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        exp = con.sql(
            rf"""WITH docs AS (
                  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     x -> x <> '') AS ws
                  FROM read_parquet('{SF}/documents.parquet')
                ), uni AS (
                  SELECT w, COUNT(*) AS cx
                  FROM (SELECT UNNEST(ws) AS w FROM docs) GROUP BY w
                ), nu AS (SELECT SUM(cx) AS nu FROM uni),
                bi AS (
                  SELECT ws[i] AS x, ws[i+1] AS y, COUNT(*) AS c_xy
                  FROM docs, UNNEST(range(1, len(ws))) AS t(i)
                  GROUP BY 1, 2 HAVING COUNT(*) >= 5
                ), nb AS (SELECT SUM(GREATEST(len(ws) - 1, 0)) AS nb FROM docs)
                SELECT b.x, b.y, b.c_xy,
                       ROUND(LN(b.c_xy) + 2.0 * LN(nu.nu) - LN(nb.nb)
                             - LN(ux.cx) - LN(uy.cx), 6) AS pmi
                FROM bi b
                JOIN uni ux ON ux.w = b.x
                JOIN uni uy ON uy.w = b.y
                CROSS JOIN nu CROSS JOIN nb
                ORDER BY pmi DESC, b.x, b.y LIMIT 30"""
        ).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_planted_collocation_ranks_first(self, ray_session):
        # "zig zag" always co-occurs; filler words are shared across
        # docs so their bigrams have low PMI
        rng = np.random.RandomState(17)
        filler = "a b c d e f".split()
        rows = []
        for i in range(40):
            ws = [str(rng.choice(filler)) for _ in range(30)]
            ws[10:10] = ["zig", "zag"]
            rows.append({"doc_id": i, "text": " ".join(ws)})
        tbl = pa.Table.from_pylist(rows)
        from docstrange_ray.ops.textstats import pmi_collocations

        got = pmi_collocations(
            ray.data.from_arrow(tbl).repartition(5), min_count=5, k=10
        ).to_pandas()
        assert got.iloc[0]["x"] == "zig" and got.iloc[0]["y"] == "zag"

    def test_bad_min_count(self):
        from docstrange_ray.ops.textstats import pmi_collocations

        with pytest.raises(ValueError):
            pmi_collocations(None, min_count=0)


class TestRobustOutliers:
    def test_vs_duckdb(self, ray_session):
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import robust_outliers

        docs = read_parquet_clean(
            f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        )
        got = (
            robust_outliers(docs, group_key="source", value_key="n_chars")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        exp = con.sql(
            f"""WITH docs AS (
                  SELECT * FROM read_parquet('{SF}/documents.parquet')
                ), med AS (
                  SELECT source, quantile_disc(n_chars, 0.5) AS med
                  FROM docs GROUP BY source
                ), mad AS (
                  SELECT d.source, quantile_disc(ABS(d.n_chars - m.med), 0.5) AS mad
                  FROM docs d JOIN med m USING (source) GROUP BY d.source
                )
                SELECT d.doc_id, d.source, d.n_chars
                FROM docs d JOIN med USING (source) JOIN mad USING (source)
                WHERE ABS(d.n_chars - med.med) > 2.0 * mad.mad
                ORDER BY d.doc_id"""
        ).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert len(got) > 0  # threshold chosen to keep the op non-degenerate

    def test_planted_outlier(self, ray_session):
        from docstrange_ray.ops.rankstats import robust_outliers

        rows = [{"doc_id": i, "g": "a", "v": 100 + (i % 7)} for i in range(50)]
        rows.append({"doc_id": 99, "g": "a", "v": 10_000})
        tbl = pa.Table.from_pylist(rows)
        got = robust_outliers(
            ray.data.from_arrow(tbl).repartition(4),
            group_key="g", value_key="v",
        ).to_pandas()
        assert got["doc_id"].tolist() == [99]

    def test_bad_mult(self):
        from docstrange_ray.ops.rankstats import robust_outliers

        with pytest.raises(ValueError):
            robust_outliers(None, group_key="g", value_key="v", mad_mult=0)


class TestLexicalDiversity:
    def test_vs_duckdb(self, ray_session):
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.textstats import lexical_diversity

        docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            lexical_diversity(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        exp = con.sql(
            rf"""WITH docs AS (
                  SELECT doc_id,
                         list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     x -> x <> '') AS ws
                  FROM read_parquet('{SF}/documents.parquet')
                ), cnt AS (
                  SELECT doc_id, w, COUNT(*) AS c
                  FROM (SELECT doc_id, UNNEST(ws) AS w FROM docs)
                  GROUP BY doc_id, w
                ), agg AS (
                  SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct,
                         SUM(c * LOG2(c)) AS sclc
                  FROM cnt GROUP BY doc_id
                )
                SELECT doc_id, CAST(n AS BIGINT) AS n_words, n_distinct,
                       ROUND(LOG2(n) - sclc / n, 6) AS entropy_bits,
                       ROUND(n_distinct * 1.0 / n, 6) AS ttr
                FROM agg ORDER BY doc_id"""
        ).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_degenerate_and_uniform(self, ray_session):
        from docstrange_ray.ops.textstats import lexical_diversity

        tbl = pa.Table.from_pylist(
            [
                {"doc_id": 0, "text": "x x x x"},          # entropy 0
                {"doc_id": 1, "text": "a b c d"},          # entropy 2 bits
                {"doc_id": 2, "text": ""},                 # omitted
            ]
        )
        got = (
            lexical_diversity(ray.data.from_arrow(tbl))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [0, 1]
        assert got["entropy_bits"].tolist() == [0.0, 2.0]
        assert got["ttr"].tolist() == [0.25, 1.0]


class TestReviewRegressions:
    def test_heavy_tokens_exact_decimal_boundary(self):
        # 0.07 * 100 = 7.000000000000001 in binary floats; a token at
        # exactly 7/100 instances must be KEPT (decimal semantics)
        rows = [{"doc_id": 0, "text": " ".join(["hot"] * 7 + [f"w{i}" for i in range(93)])}]
        tbl = pa.Table.from_pylist(rows)
        from docstrange_ray.ops.sketch import heavy_tokens

        got = heavy_tokens(ray.data.from_arrow(tbl), fraction=0.07).to_pandas()
        assert "hot" in set(got["token"])
        assert got.loc[got["token"] == "hot", "n_occurrences"].iloc[0] == 7

    def test_mrl_quantile_labels_round(self):
        from docstrange_ray.ops.sketch import approx_quantiles

        tbl = pa.Table.from_pylist([{"g": "a", "v": float(i)} for i in range(100)])
        got = approx_quantiles(
            ray.data.from_arrow(tbl), value_col="v", group_key="g", qs=(0.29, 0.58)
        ).to_pandas()
        assert "q29" in got.columns and "q58" in got.columns

    def test_hourly_trend_degenerate_hour_is_null(self, ray_session):
        # all events of one type in a single hour: slope/intercept NULL
        # (SQL division-by-zero), not inf/nan
        import duckdb as _dd

        from docstrange_ray import relational

        rows = [
            {"event_type": "x", "ts": pd.Timestamp("2024-01-01 05:10:00") + pd.Timedelta(seconds=i), "value": 1.0 + i}
            for i in range(10)
        ]
        import tempfile, os
        d = tempfile.mkdtemp()
        pa.parquet.write_table(pa.Table.from_pylist(rows), os.path.join(d, "events.parquet"))
        got = relational.hourly_trend(d).to_pandas()
        assert got["slope_cents_per_hour"].isna().all()
        assert got["intercept_cents"].isna().all()
        con = _dd.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
        exp = con.execute(relational.HOURLY_TREND_SQL).fetchdf()
        assert exp["slope_cents_per_hour"].isna().all()


class TestDocNovelty:
    def test_vs_duckdb(self, ray_session):
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.textstats import doc_novelty

        docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            doc_novelty(docs, n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        exp = con.sql(
            rf"""WITH docs AS (
                  SELECT doc_id,
                         list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     x -> x <> '') AS ws
                  FROM read_parquet('{SF}/documents.parquet')
                ), g AS (
                  SELECT DISTINCT doc_id,
                         array_to_string(list_slice(ws, i, i + 2), ' ') AS gram
                  FROM docs, UNNEST(range(1, len(ws) - 1)) AS t(i)
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
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_copied_vs_novel(self, ray_session):
        from docstrange_ray.ops.textstats import doc_novelty

        base = "one two three four five six seven eight nine ten"
        tbl = pa.Table.from_pylist(
            [
                {"doc_id": 0, "text": base},
                {"doc_id": 1, "text": base},                      # full copy: novelty 0
                {"doc_id": 2, "text": "zip zap zop quux corge"},  # all its own: novelty 1
                {"doc_id": 3, "text": "so sh"},                   # < n words: omitted
            ]
        )
        got = (
            doc_novelty(ray.data.from_arrow(tbl).repartition(3), n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [0, 1, 2]
        assert got["novelty"].tolist() == [0.0, 0.0, 1.0]

    def test_rounding_tie_matches_duckdb(self, ray_session):
        """novelty = 1/128 lands exactly on a 6-digit midpoint (7812.5e-6).

        np.round (half-even) gives 0.007812; DuckDB ROUND (half-away)
        gives 0.007813 — the one red row in CORRECTNESS_r03. Pins the
        half-away emit (docstrange_ray.numerics.round6)."""
        from docstrange_ray.ops.textstats import doc_novelty

        words = [f"w{i:03d}" for i in range(130)]
        # doc 0: 130 words -> 128 trigrams; doc 1 shares the first 127,
        # so doc 0 has exactly 1 unique gram: novelty = 1/128.
        tbl = pa.Table.from_pylist(
            [
                {"doc_id": 0, "text": " ".join(words)},
                {"doc_id": 1, "text": " ".join(words[:129])},
            ]
        )
        got = (
            doc_novelty(ray.data.from_arrow(tbl).repartition(2), n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.loc[0, "n_grams"] == 128 and got.loc[0, "n_unique"] == 1
        exp = duckdb.sql("SELECT ROUND(1.0 / 128, 6) AS r").df()["r"][0]
        assert got.loc[0, "novelty"] == exp == 0.007813

    def test_round6_matches_duckdb_on_ties(self):
        """Unit pin for the shared helper: dyadic ties + random values."""
        import numpy as np

        from docstrange_ray.numerics import round6

        cases = [o / 2.0**k for k in range(1, 18) for o in (1, 3, 127, 255)]
        cases += [-c for c in cases]
        rng = np.random.default_rng(7)
        cases += list(rng.uniform(-50, 50, 2000))
        xs = np.array(cases, dtype=np.float64)
        df = pd.DataFrame({"x": xs})
        exp = duckdb.sql("SELECT ROUND(x, 6) AS r FROM df").df()["r"].to_numpy()
        assert (round6(xs) == exp).all()
        # and at 3 dp (the ccnet_buckets histogram quantization)
        from docstrange_ray.numerics import round_half_away

        exp3 = duckdb.sql("SELECT ROUND(x, 3) AS r FROM df").df()["r"].to_numpy()
        assert (round_half_away(xs, 3) == exp3).all()


class TestSharedGramPairs:
    def test_vs_duckdb(self, ray_session):
        from docstrange_ray.io import read_parquet_clean

        docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            dedup.shared_gram_pairs(docs, n=4, max_df=8, min_shared=2)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        exp = con.sql(
            rf"""WITH docs AS (
                  SELECT doc_id,
                         list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     x -> x <> '') AS ws
                  FROM read_parquet('{SF}/documents.parquet')
                ), g AS (
                  SELECT DISTINCT doc_id,
                         array_to_string(list_slice(ws, i, i + 3), ' ') AS gram
                  FROM docs, UNNEST(range(1, len(ws) - 2)) AS t(i)
                ), rare AS (
                  SELECT gram FROM (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
                  WHERE df BETWEEN 2 AND 8
                )
                SELECT g1.doc_id AS doc_a, g2.doc_id AS doc_b, COUNT(*) AS shared_grams
                FROM g g1 JOIN g g2 USING (gram) JOIN rare USING (gram)
                WHERE g1.doc_id < g2.doc_id
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
                ORDER BY doc_a, doc_b"""
        ).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_planted_copy_found_boilerplate_capped(self, ray_session):
        # docs 0/1 share a 12-word passage (many rare 4-grams); the
        # boilerplate sentence present in ALL docs is df-capped away
        boiler = "all rights reserved contact us for terms of service details here now"
        passage = "quick brown foxes jump over seven lazy dogs during cold winter nights"
        rng = np.random.RandomState(3)
        rows = []
        for i in range(12):
            filler = " ".join(f"w{rng.randint(5000)}" for _ in range(20))
            text = boiler + " " + (passage + " " if i < 2 else "") + filler
            rows.append({"doc_id": i, "text": text})
        tbl = pa.Table.from_pylist(rows)
        got = dedup.shared_gram_pairs(
            ray.data.from_arrow(tbl).repartition(4), n=4, max_df=6, min_shared=3
        ).to_pandas()
        assert set(zip(got["doc_a"], got["doc_b"])) == {(0, 1)}

    def test_bad_params(self):
        with pytest.raises(ValueError):
            dedup.shared_gram_pairs(None, max_df=1)


class TestLangConfusion:
    def test_vs_duckdb(self, ray_session):
        import __ray_entry__ as m

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        got = (
            m.queries()["lang_confusion"](SF)
            .to_pandas()
            .sort_values(["declared", "predicted"])
            .reset_index(drop=True)
        )
        exp = (
            con.execute(m.oracle_sql()["lang_confusion"])
            .fetchdf()
            .sort_values(["declared", "predicted"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # diagonal dominates: the matrix is a calibration readout
        diag = got[got["declared"] == got["predicted"]]["n_docs"].sum()
        assert diag > got["n_docs"].sum() * 0.2


class TestSnapshotDiff:
    def test_vs_duckdb(self, ray_session):
        import __ray_entry__ as m

        got = (
            m.queries()["snapshot_diff"](SF)
            .to_pandas()
            .sort_values(["content_md5"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        exp = (
            con.execute(m.oracle_sql()["snapshot_diff"])
            .fetchdf()
            .sort_values(["content_md5"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert set(got["status"]) == {"added", "removed"}

    def test_planted_add_remove(self, ray_session):
        base = pa.Table.from_pylist(
            [{"doc_id": 0, "text": "kept body"}, {"doc_id": 1, "text": "gone body"}]
        )
        new = pa.Table.from_pylist(
            [{"doc_id": 10, "text": "kept  body"},  # ws-variant: same hash
             {"doc_id": 11, "text": "fresh body"}]
        )
        out = (
            dedup.snapshot_diff(
                ray.data.from_arrow(new), ray.data.from_arrow(base)
            )
            .to_pandas()
            .sort_values("status")
            .reset_index(drop=True)
        )
        assert out["status"].tolist() == ["added", "removed"]


def test_heavy_tokens_rejects_k_below_guarantee():
    from docstrange_ray.ops.sketch import heavy_tokens

    with pytest.raises(ValueError, match="too small for fraction"):
        heavy_tokens(None, fraction=0.05, k=8)


@pytest.mark.usefixtures("ray_session")
class TestKeepBestDedup:
    """Quality-aware representative selection: each near-dup cluster
    keeps its max-score member (RefinedWeb's keep-the-longest policy),
    not the min id."""

    def test_keeps_highest_score_not_min_id(self):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            {"doc_id": 1, "text": base, "n_chars": len(base)},
            {"doc_id": 2, "text": base + " lam", "n_chars": len(base) + 4},
            {"doc_id": 3, "text": base + " lam mu", "n_chars": len(base) + 7},
            {"doc_id": 9, "text": "totally different words entirely unrelated content here", "n_chars": 10},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        drops = sorted(
            r["doc_id"]
            for r in dedup.keep_best_drop_list_ds(ds, threshold=0.5).take_all()
        )
        # 3 is the longest cluster member -> kept; plain min-id policy
        # would have kept 1 instead
        assert drops == [1, 2]

    def test_score_tie_breaks_to_min_id(self):
        txt = "one two three four five six seven eight nine ten"
        rows = [
            {"doc_id": i, "text": txt, "n_chars": len(txt)} for i in (5, 7)
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        drops = sorted(
            r["doc_id"]
            for r in dedup.keep_best_drop_list_ds(ds, threshold=0.5).take_all()
        )
        assert drops == [7]


@pytest.mark.usefixtures("ray_session")
class TestC4Clean:
    """C4 line-level cleaning rules (Raffel et al. 2020 §2.2): every
    line and page rule exercised on a purpose-built fixture."""

    FIXTURE = [
        # 5 good lines + 1 too-short + 1 no-terminal-punct -> kept 5/7
        ("d1", "Good line one here.\nshort.\nNo terminal punct line here\n"
               "Another good line yes.\nLine three is fine!\n"
               "Line four works too?\nLine five ends well."),
        # javascript line dropped -> only 2 kept -> page dropped (<5)
        ("d2", "Has javascript in this line.\nOnly two good lines here.\n"
               "Second good line right here."),
        # curly bracket -> page dropped regardless of line quality
        ("d3", "curly { brace doc.\nAa bb cc.\nDd ee ff.\nGg hh ii.\n"
               "Jj kk ll.\nMm nn oo."),
        # lorem ipsum (case-folded) -> page dropped
        ("d4", "lorem IPSUM somewhere here now.\nAa bb cc.\nDd ee ff.\n"
               "Gg hh ii.\nJj kk ll.\nMm nn oo."),
        # exactly 5 clean lines -> kept intact
        ("d5", "One fine line right here.\nTwo fine lines right here.\n"
               "Three fine lines right here.\nFour fine lines right here.\n"
               "Five fine lines right here."),
    ]

    def _run(self):
        from docstrange_ray.ops.curate import c4_clean

        tbl = pa.table(
            {
                "doc_id": [d for d, _ in self.FIXTURE],
                "text": [t for _, t in self.FIXTURE],
            }
        )
        out = c4_clean(ray.data.from_arrow(tbl)).take_all()
        return {r["doc_id"]: r for r in out}

    def test_page_and_line_rules(self):
        got = self._run()
        assert sorted(got) == ["d1", "d5"]
        assert got["d1"]["n_kept"] == 5 and got["d1"]["n_total"] == 7
        assert got["d1"]["clean_text"] == (
            "Good line one here.\nAnother good line yes.\n"
            "Line three is fine!\nLine four works too?\nLine five ends well."
        )
        assert got["d5"]["n_kept"] == 5 and got["d5"]["n_total"] == 5
        assert got["d5"]["clean_text"] == self.FIXTURE[4][1]

    def test_terminal_quote_counts_and_strip(self):
        from docstrange_ray.ops.curate import c4_clean

        text = '  "Quoted line ends well."  \nAa bb cc.\nDd ee ff.\nGg hh ii.\nJj kk ll.'
        tbl = pa.table({"doc_id": ["q1"], "text": [text]})
        out = c4_clean(ray.data.from_arrow(tbl)).take_all()
        assert len(out) == 1
        # kept lines are stripped before reassembly; closing quote is
        # terminal punctuation
        assert out[0]["clean_text"].startswith('"Quoted line ends well."\n')
        assert out[0]["n_kept"] == 5


class TestWinnowing:
    """Winnowing fingerprints (Schleimer et al. 2003, the MOSS sketch
    — ops/dedup.winnow_fingerprints / winnow_pairs). Pinned against an
    independent brute-force reference and the paper's locality
    guarantee: any shared word run of length >= window + k - 1 yields
    at least one shared fingerprint."""

    K, W = 4, 5

    @staticmethod
    def _brute(text, k=4, window=5):
        import hashlib

        MOD, BASE = (1 << 61) - 1, 1_000_003
        words = (text or "").lower().split()
        if len(words) < k:
            words = words + ["\x00"] * (k - len(words))
        vals = [
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            for w in words
        ]
        grams = []
        for i in range(len(vals) - k + 1):
            h = 0
            for v in vals[i : i + k]:
                h = (h * BASE + v) % MOD
            grams.append(h)
        n = len(grams)
        sel = set()
        for s in range(max(n - window + 1, 1)):
            best = None
            for i in range(s, min(s + window, n)):
                if best is None or grams[i] < grams[best] or (
                    grams[i] == grams[best] and i > best
                ):
                    best = i
            sel.add((best, grams[best]))
        return sorted(sel)

    def test_kernel_equals_brute_force(self):
        import random

        from docstrange_ray.ops.dedup import winnow_fingerprints

        rng = random.Random(7)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            for _ in range(40)
        ] + ["", "one", "one two three", "x " * 100]
        tbl = pa.table(
            {"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts}
        )
        out = winnow_fingerprints(tbl, k=self.K, window=self.W)
        got: dict = {}
        for d, p, f in zip(*(out.column(c).to_pylist() for c in ("doc_id", "pos", "fp"))):
            got.setdefault(d, []).append((p, f))
        for i, t in enumerate(texts):
            assert sorted(got.get(f"d{i}", [])) == self._brute(t, self.K, self.W), i

    def test_short_doc_single_fingerprint(self):
        from docstrange_ray.ops.dedup import winnow_fingerprints

        tbl = pa.table({"doc_id": ["a", "b"], "text": ["", "two words"]})
        out = winnow_fingerprints(tbl, k=self.K, window=self.W)
        assert out.column("pos").to_pylist() == [0, 0]
        assert out.num_rows == 2

    def test_locality_guarantee_and_pairing(self):
        # two docs that differ everywhere EXCEPT one shared run of
        # window + k - 1 = 8 words: the winnowing guarantee says they
        # MUST share a fingerprint, and winnow_pairs must surface them.
        from docstrange_ray.ops.dedup import winnow_fingerprints, winnow_pairs

        run = "the shared copied sentence fragment lives right here"  # 8 words
        assert len(run.split()) == self.W + self.K - 1
        rows = {
            "doc_id": ["p", "q", "r"],
            "text": [
                "totally unrelated lead-in words before " + run + " and a unique tail",
                "different opening material then " + run + " with another ending",
                "no overlap with anything else at all in this document",
            ],
        }
        tbl = pa.table(rows)
        out = winnow_fingerprints(tbl, k=self.K, window=self.W)
        fps: dict = {}
        for d, f in zip(out.column("doc_id").to_pylist(), out.column("fp").to_pylist()):
            fps.setdefault(d, set()).add(f)
        assert fps["p"] & fps["q"], "locality guarantee violated"
        pairs = winnow_pairs(
            ray.data.from_arrow(tbl), k=self.K, window=self.W, min_shared=1
        ).take_all()
        assert {(r["doc_id_a"], r["doc_id_b"]) for r in pairs} == {("p", "q")}

    def test_boilerplate_fingerprints_discarded(self):
        # a fingerprint present in > max_df documents identifies
        # boilerplate and is dropped BEFORE pairing (MOSS rule): docs
        # sharing ONLY the boilerplate run never pair.
        from docstrange_ray.ops.dedup import winnow_pairs

        boiler = "standard footer text repeated on every single page here"
        rows = [
            {"doc_id": f"b{i}", "text": f"unique{i} opener{i} words{i} then " + boiler}
            for i in range(6)
        ]
        ds = ray.data.from_items(rows)
        # max_df=3 < 6 docs -> every boilerplate fingerprint is dropped;
        # the unique prefixes share nothing -> no pairs at all.
        got = winnow_pairs(ds, k=self.K, window=self.W, min_shared=1, max_df=3).take_all()
        assert got == []
        # raising max_df past the corpus size restores the pairs
        got2 = winnow_pairs(ds, k=self.K, window=self.W, min_shared=1, max_df=10).take_all()
        assert len(got2) == 15  # C(6,2) — all docs share the boilerplate run


class TestBoilerplateLines:
    """RefinedWeb line-level boilerplate removal (ops/curate.py:
    line_df_table + strip_boilerplate_lines) — pinned against an
    independent Counter/dict reference, plan parity, and the
    passage_dedup-style drop-empty-doc contract."""

    @staticmethod
    def _fixture():
        docs = []
        for i in range(40):
            lines = [f"unique content line {i} alpha", f"more prose {i * 7} beta"]
            if i % 2 == 0:
                lines.insert(1, "subscribe to our newsletter")
            if i % 8 == 0:
                lines.append("all rights reserved")
            docs.append((i, "\n".join(lines)))
        docs.append((40, "subscribe to our newsletter"))  # all-boilerplate doc
        docs.append((41, ""))  # empty text = one empty line
        return docs

    @classmethod
    def _ds(cls):
        docs = cls._fixture()
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs],
                }
            )
        )

    @staticmethod
    def _reference(docs, min_df):
        from collections import Counter

        df = Counter()
        for _, t in docs:
            for ln in set(t.split("\n")):
                df[ln] += 1
        hot = {ln for ln, c in df.items() if c >= min_df}
        out = {}
        for did, t in docs:
            kept = [ln for ln in t.split("\n") if ln not in hot]
            if kept:
                out[did] = ("\n".join(kept), len(t.split("\n")) - len(kept))
        return {ln: df[ln] for ln in hot}, out

    def test_line_df_matches_reference(self):
        from docstrange_ray.ops.curate import line_df_table

        hot_ref, _ = self._reference(self._fixture(), 5)
        got = {
            r["line"]: r["df"] for r in line_df_table(self._ds(), min_df=5).take_all()
        }
        assert got == hot_ref
        # per-doc duplicate lines count once: a doc repeating a hot
        # line does not inflate df (doc 40 contributes exactly 1)
        assert got["subscribe to our newsletter"] == 21

    @pytest.mark.parametrize("plan", ["broadcast", "join"])
    def test_strip_matches_reference(self, plan):
        from docstrange_ray.ops.curate import strip_boilerplate_lines

        _, ref = self._reference(self._fixture(), 5)
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in strip_boilerplate_lines(self._ds(), min_df=5, plan=plan).take_all()
        }
        assert got == ref
        assert 40 not in got  # all-boilerplate doc emits no row
        # line ORDER inside surviving docs is preserved
        assert got[0][0] == "unique content line 0 alpha\nmore prose 0 beta"

    def test_plans_bit_identical(self):
        from docstrange_ray.ops.curate import strip_boilerplate_lines

        a = sorted(
            (r["doc_id"], r["clean_text"], r["n_removed"])
            for r in strip_boilerplate_lines(
                self._ds(), min_df=5, plan="broadcast"
            ).take_all()
        )
        b = sorted(
            (r["doc_id"], r["clean_text"], r["n_removed"])
            for r in strip_boilerplate_lines(
                self._ds(), min_df=5, plan="join"
            ).take_all()
        )
        assert a == b

    def test_per_doc_repeat_below_threshold_survives(self):
        from docstrange_ray.ops.curate import strip_boilerplate_lines

        # a line repeated many times inside ONE doc has df=1: never hot
        docs = [(0, "\n".join(["same line here"] * 30)), (1, "other text entirely")]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs],
                }
            )
        )
        got = {
            r["doc_id"]: r["n_removed"]
            for r in strip_boilerplate_lines(ds, min_df=5).take_all()
        }
        assert got == {0: 0, 1: 0}


class TestBmpTiffWebp:
    """Session-14 format parity: BMP/TIFF real decode round-trips,
    TIFF/WebP header sniffing (both endiannesses, all VP8 flavors)."""

    def test_bmp_gray_roundtrip(self):
        from docstrange_ray.ops.media_meta import decode_bmp_gray
        from docstrange_ray.synth_files import make_bmp_gray

        px = (np.add.outer(np.arange(13) * 5, np.arange(17) * 3) % 256).astype(
            np.uint8
        )  # odd width: exercises 4-byte row padding
        assert (decode_bmp_gray(make_bmp_gray(px)) == px).all()

    def test_bmp_legacy_writer_decodes(self):
        from docstrange_ray.ops.media_meta import decode_bmp_gray
        from docstrange_ray.synth_files import make_bmp

        img = decode_bmp_gray(make_bmp(10, 6, shade=77))
        assert img.shape == (6, 10) and (img == 77).all()

    def test_bmp_malformed_raises_valueerror(self):
        import pytest

        from docstrange_ray.ops.media_meta import decode_bmp_gray

        from docstrange_ray.synth_files import make_bmp_gray

        good = make_bmp_gray(np.zeros((8, 8), dtype=np.uint8))
        for bad in [b"BMxx", good[:30], good[:60]]:
            with pytest.raises(ValueError):
                decode_bmp_gray(bad)

    def test_tiff_gray_roundtrip_both_endian(self):
        from docstrange_ray.ops.media_meta import decode_tiff_gray, sniff_media
        from docstrange_ray.synth_files import make_tiff_gray

        px = (np.add.outer(np.arange(9) * 7, np.arange(14) * 2) % 256).astype(
            np.uint8
        )
        for be in (False, True):
            data = make_tiff_gray(px, big_endian=be)
            assert (decode_tiff_gray(data) == px).all(), be
            meta = sniff_media(data)
            assert (meta["mime"], meta["width"], meta["height"]) == (
                "image/tiff", 14, 9,
            ), be

    def test_webp_sniff_vp8x(self):
        from docstrange_ray.ops.media_meta import sniff_media
        from docstrange_ray.synth_files import make_webp_vp8x

        meta = sniff_media(make_webp_vp8x(300, 200))
        assert (meta["mime"], meta["width"], meta["height"]) == (
            "image/webp", 300, 200,
        )

    def test_webp_sniff_vp8_lossy_and_lossless(self):
        import struct

        from docstrange_ray.ops.media_meta import sniff_media

        # hand-built VP8 (lossy) chunk header: frame tag + start code + dims
        payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
        vp8 = b"VP8 " + struct.pack("<I", len(payload)) + payload
        data = b"RIFF" + struct.pack("<I", 4 + len(vp8)) + b"WEBP" + vp8
        meta = sniff_media(data)
        assert (meta["mime"], meta["width"], meta["height"]) == (
            "image/webp", 640, 480,
        )
        # VP8L (lossless): signature 0x2F then packed 14-bit dims-1
        bits = (127 - 1) | ((63 - 1) << 14)
        payload = bytes([0x2F]) + struct.pack("<I", bits)
        vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
        data = b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l
        meta = sniff_media(data)
        assert (meta["mime"], meta["width"], meta["height"]) == (
            "image/webp", 127, 63,
        )

    def test_tiff_malformed_raises_valueerror(self):
        import pytest

        from docstrange_ray.ops.media_meta import decode_tiff_gray
        from docstrange_ray.synth_files import make_tiff_gray

        good = make_tiff_gray(np.zeros((4, 4), dtype=np.uint8))
        for bad in [b"II*\x00", good[:20], good[: len(good) - 5]]:
            with pytest.raises(ValueError):
                decode_tiff_gray(bad)


class TestAutoBackendBmpTiff:
    @pytest.mark.usefixtures("ray_session")
    def test_bmp_and_tiff_decode_real(self):
        import ray.data

        from docstrange_ray.ops import multimodal as mm
        from docstrange_ray.synth_files import make_bmp_gray, make_tiff_gray

        px = (np.add.outer(np.arange(12) * 3, np.arange(16) * 5) % 256).astype(
            np.uint8
        )
        tbl = pa.table(
            {
                "media_ref": pa.array(["m://bmp", "m://tiff"]),
                "payload": pa.array(
                    [make_bmp_gray(px), make_tiff_gray(px)], pa.binary()
                ),
            }
        )
        out = {
            r["media_ref"]: r
            for r in mm.decode_features(
                ray.data.from_arrow(tbl), concurrency=(1, 2), backend="auto"
            ).take_all()
        }
        exp = float(np.round(px.mean(), 6))
        for ref in ("m://bmp", "m://tiff"):
            assert abs(out[ref]["mean_intensity"] - exp) < 1e-9, ref


class TestCooccurrence:
    @pytest.mark.usefixtures("ray_session")
    def test_matches_brute(self):
        import itertools as it

        import ray.data

        from docstrange_ray.ops.textstats import cooccurrence_topk

        texts = [
            "a b c a b",
            "b b b",
            "x y z x y z x",
            "solo",
            "",
        ] * 8
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        ).repartition(4)
        from collections import Counter

        brute = Counter()
        for t in texts:
            ws = t.lower().split()
            for i, j in it.combinations(range(len(ws)), 2):
                if j - i <= 3:
                    brute[tuple(sorted((ws[i], ws[j])))] += 1
        got = {
            (r["w1"], r["w2"]): r["n"]
            for r in cooccurrence_topk(ds, window=3, k=1000).take_all()
        }
        assert got == dict(brute)

    @pytest.mark.usefixtures("ray_session")
    def test_topk_deterministic_ties(self):
        import ray.data

        from docstrange_ray.ops.textstats import cooccurrence_topk

        ds = ray.data.from_items([{"doc_id": 0, "text": "p q r s t u"}])
        rows = cooccurrence_topk(ds, window=1, k=3).take_all()
        # all pairs have n=1: tie-break is (w1, w2) ascending
        assert [(r["w1"], r["w2"]) for r in rows] == [
            ("p", "q"), ("q", "r"), ("r", "s"),
        ]


class TestLabelCentroidSims:
    @pytest.mark.usefixtures("ray_session")
    def test_matches_whole_matrix_reference(self):
        import math

        import ray.data

        from docstrange_ray.numerics import round6, round_half_away
        from docstrange_ray.ops.semantic import label_centroid_sims

        rng = np.random.default_rng(8)
        mat = rng.normal(0, 0.3, (90, 16))
        labels = rng.integers(0, 4, 90)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "label": pa.array(labels, pa.int32()),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                    ),
                }
            )
        ).repartition(5)
        got = {
            (r.label_a, r.label_b): r.cos
            for r in label_centroid_sims(ds).itertuples()
        }
        # independent reference: quantize float32-widened values, sum, cosine
        q = round_half_away(mat.astype(np.float32).astype(np.float64) * (1 << 20), 0)
        for a in range(4):
            for b in range(a + 1, 4):
                va = [int(x) for x in q[labels == a].sum(axis=0)]
                vb = [int(x) for x in q[labels == b].sum(axis=0)]
                dot = sum(x * y for x, y in zip(va, vb))
                na = sum(x * x for x in va)
                nb = sum(x * x for x in vb)
                exp = float(
                    round6(float(dot) / (math.sqrt(float(na)) * math.sqrt(float(nb))))
                )
                assert got[(a, b)] == exp, (a, b)


class TestKCenterSelect:
    @staticmethod
    def _ds(mat, ids=None, parts=4):
        import pyarrow as pa

        import ray

        n = len(mat)
        ids = list(range(n)) if ids is None else ids
        tbl = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float64())
                ),
            }
        )
        return ray.data.from_arrow(tbl).repartition(parts)

    @staticmethod
    def _reference(mat, ids, k):
        """Independent numpy loop (same arithmetic class, no shared
        code): greedy farthest-point on cosine distance, seed = lowest
        id, ties lowest id."""
        import numpy as np

        mat = np.asarray(mat, dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        unit = mat / nrm
        order = np.argsort(ids)
        sel = [int(order[0])]
        out = [(0, ids[sel[0]], 2.0)]
        for j in range(1, k):
            dist = 1.0 - (unit @ unit[sel].T).max(axis=1)
            cand = sorted(
                range(len(ids)), key=lambda i: (-dist[i], ids[i])
            )[0]
            out.append((j, ids[cand], float(dist[cand])))
            sel.append(cand)
        return out

    def test_equals_reference_random(self, ray_session):
        import numpy as np

        from docstrange_ray.ops.semantic import kcenter_select

        rng = np.random.default_rng(61)
        mat = rng.normal(0, 1, (200, 16))
        ids = list(range(0, 400, 2))
        got = kcenter_select(self._ds(mat, ids), k=8)
        exp = self._reference(mat, ids, 8)
        tup = list(zip(got["sel_order"], got["id"], got["dist"]))
        assert [(a, b) for a, b, _ in tup] == [(a, b) for a, b, _ in exp]
        for (_, _, d1), (_, _, d2) in zip(tup, exp):
            assert d1 == d2  # identical doubles, any blocking

    def test_covers_planted_clusters(self, ray_session):
        import numpy as np

        from docstrange_ray.ops.semantic import kcenter_select

        rng = np.random.default_rng(62)
        centers = np.eye(3) * 10
        mat = np.vstack(
            [c + rng.normal(0, 0.05, (40, 3)) for c in centers]
        )
        got = kcenter_select(self._ds(mat), k=3)
        picked_clusters = {int(i) // 40 for i in got["id"]}
        assert picked_clusters == {0, 1, 2}

    def test_partitioning_invariant(self, ray_session):
        import numpy as np
        import pandas as pd

        from docstrange_ray.ops.semantic import kcenter_select

        rng = np.random.default_rng(63)
        mat = rng.normal(0, 1, (120, 8))
        a = kcenter_select(self._ds(mat, parts=2), k=6)
        b = kcenter_select(self._ds(mat, parts=9), k=6)
        pd.testing.assert_frame_equal(a, b)

    def test_k_at_least_n_selects_all(self, ray_session):
        import numpy as np

        from docstrange_ray.ops.semantic import kcenter_select

        mat = np.eye(4)
        got = kcenter_select(self._ds(mat, parts=2), k=10)
        assert len(got) == 4
        assert set(got["id"]) == {0, 1, 2, 3}


class TestKAnonymityAudit:
    def test_flags_and_counts_match_pandas_reference(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from docstrange_ray.ops.pii import k_anonymity_audit

        rng = np.random.default_rng(31)
        n = 3000
        df = pd.DataFrame(
            {
                "zip": rng.integers(0, 12, n),
                "age_band": rng.integers(0, 4, n),
                "diagnosis": rng.integers(0, 6, n),
            }
        )
        # plant: one uniform-sensitive group (l-risk but not k-risk)
        df.loc[df.index[:400], ["zip", "age_band", "diagnosis"]] = [99, 9, 7]
        # plant: one singleton group (k-risk)
        df.loc[df.index[-1], ["zip", "age_band", "diagnosis"]] = [77, 8, 3]
        got = k_anonymity_audit(
            ray.data.from_pandas(df).repartition(5),
            quasi_cols=["zip", "age_band"],
            sensitive_col="diagnosis",
            k=5,
            l=2,
        )
        ref = df.groupby(["zip", "age_band"]).agg(
            n=("diagnosis", "size"), n_sensitive=("diagnosis", "nunique")
        ).reset_index()
        ref = ref[(ref["n"] < 5) | (ref["n_sensitive"] < 2)]
        ref = ref.sort_values(["zip", "age_band"]).reset_index(drop=True)
        assert list(got["zip"]) == list(ref["zip"])
        assert list(got["n"]) == list(ref["n"])
        assert list(got["n_sensitive"]) == list(ref["n_sensitive"])
        planted = got[(got["zip"] == 99) & (got["age_band"] == 9)]
        assert len(planted) == 1 and bool(planted["at_risk_l"].iloc[0])
        assert not bool(planted["at_risk_k"].iloc[0])
        single = got[(got["zip"] == 77) & (got["age_band"] == 8)]
        assert len(single) == 1 and bool(single["at_risk_k"].iloc[0])

    def test_null_sensitive_excluded_from_distinct(self, ray_session):
        """SQL COUNT(DISTINCT) parity: nulls count toward n, not toward
        diversity (ADVICE r4)."""
        import pandas as pd
        import ray.data

        from docstrange_ray.ops.pii import k_anonymity_audit

        df = pd.DataFrame(
            {"q": ["a"] * 6, "s": [None, None, None, 1.0, 1.0, 1.0]}
        )
        got = k_anonymity_audit(
            ray.data.from_pandas(df), ["q"], "s", k=5, l=3
        )
        # n=6 (not k-risk), distinct non-null sensitive = {1.0} = 1 < 3
        assert len(got) == 1
        assert int(got["n"].iloc[0]) == 6
        assert int(got["n_sensitive"].iloc[0]) == 1

    def test_empty_result_keeps_schema(self, ray_session):
        """No violating groups -> empty frame with the SAME dtypes as a
        non-empty one (ADVICE r4 medium: the sf0.01 oracle MISMATCH)."""
        import numpy as np
        import pandas as pd
        import ray.data

        from docstrange_ray.ops.pii import k_anonymity_audit

        df = pd.DataFrame(
            {"q": ["a"] * 40 + ["b"] * 40, "s": list(range(40)) * 2}
        )
        got = k_anonymity_audit(ray.data.from_pandas(df), ["q"], "s", k=5, l=2)
        assert got.empty
        assert got["q"].dtype == object
        assert got["n"].dtype == np.int64
        assert got["n_sensitive"].dtype == np.int64
        assert got["at_risk_k"].dtype == np.bool_
        assert got["at_risk_l"].dtype == np.bool_
