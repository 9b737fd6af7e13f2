"""Content-defined chunking tests (FastCDC word-anchor shape).

The reference below re-derives chunking with plain loops and per-word
hashlib calls (no factorize, no numpy, no Ray) — agreement pins the
batch kernel, not the code.
"""

import hashlib

import numpy as np
import pytest
import ray

from docstrange_ray.ops import dedup

DIV = 4  # small divisor -> frequent anchors on tiny fixtures


def ref_anchor(w: str) -> bool:
    return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") % DIV == 0


def ref_chunks(text: str) -> list[list[str]]:
    ws = (text or "").lower().split()
    out, cur = [], []
    for w in ws:
        cur.append(w)
        if ref_anchor(w):
            out.append(cur)
            cur = []
    if cur:
        out.append(cur)
    return out


def rows_of(texts):
    return [{"doc_id": i, "text": t} for i, t in enumerate(texts)]


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "pack my box with five dozen liquor jugs",
    "",
    "word",
    "the quick brown fox jumps over the lazy dog again and again",  # exact dup
]


class TestCDCChunks:
    def test_matches_loop_reference(self):
        ds = ray.data.from_items(rows_of(TEXTS))
        got = dedup.cdc_chunk_table(ds, divisor=DIV).to_pandas()
        got = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        exp = []
        for i, t in enumerate(TEXTS):
            for ci, chunk in enumerate(ref_chunks(t)):
                exp.append((i, ci, len(chunk),
                            hashlib.md5(" ".join(chunk).encode()).hexdigest()))
        assert len(got) == len(exp)
        for row, (did, ci, n, h) in zip(got.itertuples(index=False), exp):
            assert (row.doc_id, row.chunk_idx, row.n_words, row.chunk_md5) == (
                did, ci, n, h)

    def test_empty_and_single_word_docs(self):
        ds = ray.data.from_items(rows_of(["", "hello"]))
        got = dedup.cdc_chunk_table(ds, divisor=DIV).to_pandas()
        # empty doc -> no chunks; 1-word doc -> exactly one chunk
        assert set(got["doc_id"]) == {1}
        assert len(got) == 1 and got["n_words"].iloc[0] == 1

    def test_insertion_shifts_at_most_neighbor_chunks(self):
        """The CDC locality property: prepending words only changes
        chunks up to the first anchor; all later chunk hashes are
        preserved (this is what fixed-width blocking cannot do)."""
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
        edited = "INSERTED WORDS HERE " + base
        h_base = {hashlib.md5(" ".join(c).encode()).hexdigest()
                  for c in ref_chunks(base)}
        h_edit = {hashlib.md5(" ".join(c).encode()).hexdigest()
                  for c in ref_chunks(edited)}
        # every base chunk after the first survives the edit
        chunks_base = ref_chunks(base)
        surviving = sum(
            1 for c in chunks_base[1:]
            if hashlib.md5(" ".join(c).encode()).hexdigest() in h_edit
        )
        assert surviving == len(chunks_base) - 1
        assert h_base != h_edit  # the head chunk did change

    def test_dup_chunks_cross_doc_only(self):
        ds = ray.data.from_items(rows_of(TEXTS))
        got = dedup.cdc_dup_chunks(ds, divisor=DIV).to_pandas()
        # docs 0 and 4 are identical -> every one of their chunks is a dup
        n_chunks_doc0 = len(ref_chunks(TEXTS[0]))
        dup_from_pair = got[got["min_doc"] == 0]
        assert len(dup_from_pair) >= n_chunks_doc0 - 1  # shared-with-others may merge
        assert (got["n_docs"] >= 2).all()
        # a chunk repeated only WITHIN one doc must not appear
        solo = ray.data.from_items(rows_of(["x y z x y z x y z"]))
        got_solo = dedup.cdc_dup_chunks(solo, divisor=DIV).to_pandas()
        assert len(got_solo) == 0

    def test_occurrence_counts(self):
        # same 1-word doc three times; chunk appears once per doc
        ds = ray.data.from_items(rows_of(["hello", "hello", "hello"]))
        got = dedup.cdc_dup_chunks(ds, divisor=DIV).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (int(r["n_docs"]), int(r["n_occurrences"]), int(r["min_doc"])) == (3, 3, 0)


class TestPairEditDistance:
    def test_kernel_matches_duckdb_bytes(self):
        """DuckDB levenshtein is BYTE-based (levenshtein('café','cafe')
        = 2); the kernel must agree on unicode, not just ASCII."""
        import duckdb
        import random

        from docstrange_ray.ops.dedup import _levenshtein

        rng = random.Random(7)
        alph = "abcdé中 "
        for _ in range(120):
            a = "".join(rng.choices(alph, k=rng.randint(0, 12)))
            b = "".join(rng.choices(alph, k=rng.randint(0, 12)))
            ref = duckdb.execute(
                "select levenshtein(?, ?)", [a, b]
            ).fetchone()[0]
            assert _levenshtein(a, b) == ref, (a, b)
        assert _levenshtein("café", "cafe") == 2  # bytes, not codepoints

    def test_pipeline_on_planted_near_dups(self):
        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau") * 2
        edited = base.replace("delta", "delja", 1)  # one substitution (t->j)
        rows = [
            {"doc_id": 0, "text": base},
            {"doc_id": 1, "text": edited},
            {"doc_id": 2, "text": "completely different text about fish"},
        ]
        ds = ray.data.from_items(rows)
        got = dedup.pair_edit_distance(ds, threshold=0.5).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (int(r["doc_id_a"]), int(r["doc_id_b"])) == (0, 1)
        assert int(r["edit_distance"]) == 1
        expect = 1.0 - 1 / len(base.encode())
        assert r["edit_sim"] == pytest.approx(round(expect, 6), abs=2e-6)


class TestDupPositionsExact:
    @staticmethod
    def brute(rows, w):
        import collections

        wins = collections.Counter()
        per = {}
        for r in rows:
            ws = (r["text"] or "").lower().split()
            for i in range(len(ws) - w + 1):
                wt = " ".join(ws[i:i + w])
                wins[wt] += 1
                per.setdefault(wt, []).append((r["doc_id"], i + 1))
        exp = set()
        for wt, c in wins.items():
            if c >= 2:
                exp.update(per[wt])
        return exp

    def test_matches_brute_on_planted(self):
        texts = [
            "a b c d e f g h i j k l m n o p q r",
            "x y a b c d e f g h i j zz",
            "a b c d e f g h i j k l m n o p q r",  # exact dup of 0
            "unrelated words only here nothing shared at all",
            "",          # empty
            "short doc",  # < window
        ]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        got = dedup.dup_positions_exact(
            ray.data.from_items(rows), window=8
        ).to_pandas()
        assert set(zip(got["doc_id"], got["pos"])) == self.brute(rows, 8)

    def test_fuzz_small_vocab(self):
        import random

        rng = random.Random(5)
        rows = [
            {"doc_id": i,
             "text": " ".join(rng.choices("u v w x".split(),
                                          k=rng.randint(0, 14)))}
            for i in range(25)
        ]
        got = dedup.dup_positions_exact(
            ray.data.from_items(rows), window=4
        ).to_pandas()
        assert set(zip(got["doc_id"], got["pos"])) == self.brute(rows, 4)

    def test_seed_len_variants_agree(self):
        rows = [
            {"doc_id": 0, "text": "p q r s t u v w p q r s t u v w"},
            {"doc_id": 1, "text": "z p q r s t u v w z"},
        ]
        ds = ray.data.from_items(rows)
        a = dedup.dup_positions_exact(ds, window=8, seed_len=1).to_pandas()
        b = dedup.dup_positions_exact(ds, window=8, seed_len=4).to_pandas()
        key = lambda df: sorted(zip(df["doc_id"], df["pos"]))
        assert key(a) == key(b) == sorted(self.brute(rows, 8))

    def test_rejects_non_power_of_two(self):
        ds = ray.data.from_items([{"doc_id": 0, "text": "a b c"}])
        with pytest.raises(ValueError):
            dedup.dup_positions_exact(ds, window=6)
        with pytest.raises(ValueError):
            dedup.dup_positions_exact(ds, window=8, seed_len=3)


class TestWeightedJaccard:
    def test_multiset_semantics(self):
        # doc1 repeats the shared phrase; set Jaccard would call these
        # near-identical, weighted Jaccard must not
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            {"doc_id": 0, "text": shared},
            {"doc_id": 1, "text": (shared + " ") * 4},
        ]
        ds = ray.data.from_items(rows)
        got = dedup.weighted_jaccard_pairs(ds, threshold=0.5).to_pandas()
        assert len(got) == 1
        # min-sum = 8 shared words once, max-sum = 8 + 32 - 8 = 32
        assert got["w_jaccard"].iloc[0] == pytest.approx(8 / 32, abs=1e-6)

    def test_identical_docs_score_one(self):
        t = "one two three four five six seven eight nine ten"
        ds = ray.data.from_items(
            [{"doc_id": 0, "text": t}, {"doc_id": 1, "text": t}]
        )
        got = dedup.weighted_jaccard_pairs(ds, threshold=0.5).to_pandas()
        assert len(got) == 1 and got["w_jaccard"].iloc[0] == 1.0


class TestLshTuning:
    def test_default_bands_optimal_at_half(self):
        assert dedup.lsh_tuning(0.5, 64) == (16, 4)

    def test_rows_grow_with_threshold(self):
        rows = [dedup.lsh_tuning(t, 64)[1] for t in (0.2, 0.5, 0.8, 0.9)]
        assert rows == sorted(rows) and rows[0] < rows[-1]

    def test_rejects_bad_threshold(self):
        with pytest.raises(ValueError):
            dedup.lsh_tuning(0.0)


class TestDupSpansExact:
    def test_matches_hash_dup_spans(self):
        """Cross-oracle: the collision-free prefix-doubling spans must
        equal the rolling-hash dup_spans output (collisions are the
        only way they could differ, and are ~2^-61 per window)."""
        texts = [
            "a b c d e f g h i j k l m n o p q r s t",
            "x y a b c d e f g h i j k l z z z",
            "a b c d e f g h i j k l m n o p q r s t",
            "totally different content with no shared runs at all here",
        ]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        ds = lambda: ray.data.from_items(rows)
        w = 8
        exact = dedup.dup_spans_exact(ds(), window=w).to_pandas()
        hashed = dedup.dup_spans(ds(), window=w).to_pandas()
        key = lambda df: sorted(
            zip(df["doc_id"], df["span_start"], df["span_end"]))
        assert key(exact) == key(hashed)
        assert len(exact) == 2  # doc2 (full dup) + doc1 (shared run)

    def test_gap_break_and_keep_first(self):
        # two duplicated runs separated by > window unique words; the
        # FIRST occurrence (doc 0) is kept — only doc 1 gets spans
        run1 = "p q r s"
        run2 = "w x y z"
        filler = " ".join(f"u{i}" for i in range(6))
        rows = [
            {"doc_id": 0, "text": f"{run1} {filler} {run2}"},
            {"doc_id": 1, "text": f"{run1} other filler words {run2}"},
        ]
        got = dedup.dup_spans_exact(
            ray.data.from_items(rows), window=4).to_pandas()
        assert (got["doc_id"] == 1).all()  # doc 0 = first occurrence, kept
        d1 = got[got["doc_id"] == 1]
        assert len(d1) == 2  # two separate islands, not one merged span
