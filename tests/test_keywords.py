"""RAKE keyword extraction (ops/keywords.py): independent reference,
plan parity, contract edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from docstrange_ray.ops.keywords import (
    SCALE,
    STOPWORDS,
    phrase_occurrences,
    rake_keywords,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _reference(texts, k):
    """Independent Counter/loop RAKE (module contract, no shared code
    beyond the stopword list, which IS the contract)."""
    import re
    from collections import Counter, defaultdict

    stop = set(STOPWORDS)
    occ = Counter()
    freq: Counter = Counter()
    deg: Counter = Counter()
    for t in texts:
        for frag in re.split(r"[^a-z0-9\s]+", (t or "").lower()):
            cur = []
            for w in frag.split():
                if w in stop:
                    if cur:
                        occ[" ".join(cur)] += 1
                        cur = []
                else:
                    cur.append(w)
            if cur:
                occ[" ".join(cur)] += 1
    for p, c in occ.items():
        ws = p.split(" ")
        for w in ws:
            freq[w] += c
            deg[w] += c * len(ws)
    wscore = {w: (SCALE * deg[w]) // freq[w] for w in freq}
    rows = [
        (p, len(p.split(" ")), c, sum(wscore[w] for w in p.split(" ")))
        for p, c in occ.items()
    ]
    rows.sort(key=lambda r: (-r[3], -r[2], r[0]))
    return rows[:k]


def _ds(texts, parts=4):
    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(parts)


class TestPhraseOccurrences:
    def test_stopword_and_punct_breaks(self):
        assert phrase_occurrences("the red apple, fell ON green grass") == [
            "red apple",
            "fell",
            "green grass",
        ]

    def test_all_stopwords_empty(self):
        assert phrase_occurrences("the and of a") == []
        assert phrase_occurrences("") == []
        assert phrase_occurrences(None) == []


class TestRake:
    TEXTS = [
        "the quick brown fox jumps over a lazy dog",
        "quick brown foxes! lazy dog; quick dog runs",
        "deep learning of deep networks, and deep learning rates",
        "the deep learning",
        "",
    ] * 3

    def test_equals_reference(self):
        got = rake_keywords(_ds(self.TEXTS), k=10)
        exp = _reference(self.TEXTS, 10)
        tup = list(
            zip(got["phrase"], got["n_words"], got["occurrences"],
                got["score_micro"])
        )
        assert tup == exp
        assert list(got["rank"]) == list(range(1, len(exp) + 1))

    def test_plan_parity_byte_identical(self):
        a = rake_keywords(_ds(self.TEXTS), k=10, plan="broadcast")
        b = rake_keywords(_ds(self.TEXTS), k=10, plan="join")
        pd.testing.assert_frame_equal(a, b)

    def test_auto_gate_picks_join_above_limit(self):
        got = rake_keywords(
            _ds(self.TEXTS), k=5, plan="auto", broadcast_word_limit=2
        )
        exp = _reference(self.TEXTS, 5)
        assert list(got["phrase"]) == [r[0] for r in exp]

    def test_degree_beats_frequency(self):
        # "word" appears alone often; "long phrase word" gives "word"
        # high degree: the multiword phrase must outrank the singleton
        texts = ["solo"] * 10 + ["alpha beta solo"] * 2
        got = rake_keywords(_ds(texts, 2), k=2)
        assert got["phrase"].iloc[0] == "alpha beta solo"

    def test_empty_corpus(self):
        got = rake_keywords(_ds(["the a of", ""]), k=5)
        assert len(got) == 0


class TestAsciiWhitespaceParity:
    def test_nbsp_is_a_boundary_like_duckdb(self):
        # RE2's \s is ASCII-only: a unicode NBSP must split phrases on
        # BOTH sides (review finding: Python's default unicode \s
        # silently swallowed it into one phrase)
        import duckdb

        text = "foo bar baz"
        got = phrase_occurrences(text)
        frags = duckdb.sql(
            r"""SELECT regexp_split_to_array(
                   lower('foo' || chr(160) || 'bar baz'),
                   '[^a-z0-9\s]+')"""
        ).fetchone()[0]
        # no stopwords here, so each fragment IS one phrase on both sides
        assert list(frags) == ["foo", "bar baz"]
        assert got == ["foo", "bar baz"]


class TestTextrank:
    @staticmethod
    def _tr_reference(texts, k=50, iterations=5, scale=10**12):
        """Independent dict/loop TextRank under the module contract:
        content tokens, adjacent distinct unordered pairs, integer
        pagerank (graph module semantics re-derived, no shared code)."""
        import hashlib
        import re as _re

        stop = set(STOPWORDS)
        word_re = _re.compile(r"[a-z]+\Z", _re.ASCII)
        ws_re = _re.compile(r"\s+", _re.ASCII)
        pairs = set()
        for t in texts:
            toks = [
                w
                for w in ws_re.split((t or "").lower())
                if w and word_re.fullmatch(w) and w not in stop
            ]
            for a, b in zip(toks, toks[1:]):
                if a != b:
                    pairs.add((a, b) if a < b else (b, a))
        wid = {
            w: int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            for p in pairs
            for w in p
        }
        edges = sorted(
            {(wid[a], wid[b]) for a, b in pairs}
            | {(wid[b], wid[a]) for a, b in pairs}
        )
        if not edges:
            return []
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
        by_word = {w: r[i] for w, i in wid.items()}
        ranked = sorted(by_word.items(), key=lambda t: (-t[1], t[0]))[:k]
        return ranked

    def _ds(self, texts, parts=4):
        return ray.data.from_arrow(
            pa.table({"doc_id": [f"d{i}" for i in range(len(texts))],
                      "text": texts})
        ).repartition(parts)

    def test_equals_reference(self):
        from docstrange_ray.ops.keywords import textrank_keywords

        texts = [
            "ray data streams arrow blocks across the cluster",
            "arrow blocks stream through ray tasks and ray actors",
            "the cluster schedules tasks with backpressure",
            "data pipelines use arrow and ray for streaming compute",
            "compute graphs schedule streaming tasks",
        ] * 3
        want = self._tr_reference(texts, k=10)
        got = textrank_keywords(self._ds(texts), k=10)
        assert list(zip(got["word"], got["rank"].astype(int))) == want

    def test_stopwords_and_nonalpha_excluded(self):
        from docstrange_ray.ops.keywords import textrank_keywords

        texts = ["the quick2 fox and the lazy dog", "fox dog fox dog"]
        got = textrank_keywords(self._ds(texts), k=20)
        words = set(got["word"])
        assert "the" not in words and "and" not in words
        assert "quick2" not in words  # non-alphabetic token excluded
        assert {"fox", "dog"} <= words

    def test_empty_corpus(self):
        from docstrange_ray.ops.keywords import textrank_keywords

        got = textrank_keywords(self._ds(["", "the a an", "12 34"]), k=5)
        assert len(got) == 0

    def test_partition_invariance(self):
        from docstrange_ray.ops.keywords import textrank_keywords

        texts = [f"alpha beta w{i} gamma delta" for i in range(40)]
        a = textrank_keywords(self._ds(texts, parts=1), k=15)
        b = textrank_keywords(self._ds(texts, parts=7), k=15)
        pd.testing.assert_frame_equal(a, b)
