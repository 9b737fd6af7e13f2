"""PassJoin exact edit-distance similarity join (ops/editjoin.py):
banded-kernel parity, pigeonhole completeness, brute-force equality,
hot-prefix adversarial shape, short/empty-string bucket."""

import random

import pandas as pd
import pytest

import ray.data

from docstrange_ray.ops.dedup import _levenshtein
from docstrange_ray.ops.editjoin import (
    _SHORT,
    _banded_distance,
    _even_segments,
    _probe_specs,
    _seg_hash,
    edit_distance_join,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _brute(df, tau):
    out = []
    texts = df["text"].tolist()
    ids = df["doc_id"].tolist()
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            d = _levenshtein(texts[i], texts[j])
            if d <= tau:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, d))
    return sorted(out)


def _got(res):
    return list(
        map(tuple, res[["doc_id_a", "doc_id_b", "edit_distance"]]
            .itertuples(index=False))
    )


class TestBandedKernel:
    def test_matches_full_distance_when_within_tau(self):
        rng = random.Random(3)
        for _ in range(1500):
            a = bytes(rng.choice(b"abc") for _ in range(rng.randint(0, 12)))
            b = bytes(rng.choice(b"abc") for _ in range(rng.randint(0, 12)))
            for tau in (1, 2, 3):
                full = _levenshtein(a.decode(), b.decode())
                want = full if full <= tau else tau + 1
                assert _banded_distance(a, b, tau) == want

    def test_multibyte_utf8_is_byte_semantics(self):
        # DuckDB levenshtein('café','cafe') = 2 (byte-based) — the
        # banded kernel must agree, not count codepoints.
        assert _banded_distance("café".encode(), b"cafe", 2) == 2


class TestPigeonholeCompleteness:
    def test_every_true_pair_meets_in_some_group(self):
        """Simulate the scan's index/probe emission locally: any pair
        within tau must share a (seg_hash, ordinal, partner_len) key
        with one side indexed and the other probing."""
        rng = random.Random(17)

        def index_rows(b, tau):
            k = tau + 1
            rows = set()
            if len(b) <= tau:
                rows.add((0, _SHORT, 0))
            if len(b) >= k:
                for i, (p, seg) in enumerate(_even_segments(len(b), k)):
                    rows.add((_seg_hash(b[p : p + seg]), i, len(b)))
            return rows

        def probe_rows(b, tau):
            rows = set()
            if len(b) <= 2 * tau:
                rows.add((0, _SHORT, 0))
            if len(b) >= tau + 1:
                for l_r, i, q, seg in _probe_specs(len(b), tau):
                    rows.add((_seg_hash(b[q : q + seg]), i, l_r))
            return rows

        checked = 0
        for _ in range(2500):
            n = rng.randint(0, 14)
            a = bytes(rng.choice(b"abcd") for _ in range(n))
            tau = rng.choice((1, 2, 3))
            b = bytearray(a)
            for _ in range(rng.randint(0, tau)):
                op = rng.choice(("sub", "ins", "del"))
                if op == "sub" and b:
                    b[rng.randrange(len(b))] = rng.choice(b"abcd")
                elif op == "ins":
                    b.insert(rng.randrange(len(b) + 1), rng.choice(b"abcd"))
                elif b:
                    del b[rng.randrange(len(b))]
            b = bytes(b)
            if a == b or _levenshtein(a.decode(), b.decode()) > tau:
                continue
            checked += 1
            assert (
                index_rows(a, tau) & probe_rows(b, tau)
                or index_rows(b, tau) & probe_rows(a, tau)
            ), (a, b, tau)
        assert checked > 800


class TestEditDistanceJoin:
    def _ds(self, rows):
        return ray.data.from_pandas(pd.DataFrame(rows))

    def test_brute_force_equality_with_edge_strings(self):
        rng = random.Random(11)
        words = ["red", "green", "blue", "grey", "gray", "teal",
                 "pink", "puce", "plum", "rose"]
        rows = [
            {"doc_id": f"d{i:04d}",
             "text": " ".join(rng.choice(words)
                              for _ in range(rng.randint(0, 4)))}
            for i in range(160)
        ]
        rows += [
            {"doc_id": "e0001", "text": ""},
            {"doc_id": "e0002", "text": "a"},
            {"doc_id": "e0003", "text": "ab"},
            {"doc_id": "e0004", "text": "ba"},
        ]
        df = pd.DataFrame(rows)
        for tau in (1, 2):
            got = edit_distance_join(self._ds(df), tau=tau)
            assert _got(got) == _brute(df, tau)

    def test_short_corpus_subbuckets_and_stays_exact(self):
        """ADVICE r4: a corpus dominated by very short strings must not
        collapse into one partition — shorts sub-bucket by index length
        — and the result stays brute-force exact."""
        rng = random.Random(7)
        alpha = "abcd"
        rows = [
            {"doc_id": f"s{i:04d}",
             "text": "".join(rng.choice(alpha)
                             for _ in range(rng.randint(0, 4)))}
            for i in range(120)
        ]
        df = pd.DataFrame(rows)
        got = edit_distance_join(self._ds(df), tau=2, num_partitions=8)
        assert _got(got) == _brute(df, 2)

    def test_hot_shared_prefix_stays_exact(self):
        """Sequential-id shape ('Customer#000000001'): one segment is
        universal, so its group holds the full index x probe cross —
        the true quadratic candidate set. Exactness must hold with no
        silent cap (the jaccard_join posting-cap lesson)."""
        df = pd.DataFrame(
            {"doc_id": [f"c{i:03d}" for i in range(80)],
             "text": [f"Customer#{i:09d}" for i in range(80)]}
        )
        got = edit_distance_join(self._ds(df), tau=1)
        exp = _brute(df, 1)
        assert len(exp) > 100  # the shape really is dense
        assert _got(got) == exp

    def test_distance_zero_exact_duplicates_found(self):
        df = pd.DataFrame(
            {"doc_id": ["a", "b", "c"],
             "text": ["same title here", "same title here", "other"]}
        )
        got = edit_distance_join(self._ds(df), tau=2)
        assert _got(got) == [("a", "b", 0)]
