"""Byte-level BPE (ops/bytebpe.py): byte-map bijection, pre-token
partition property, local/distributed plan parity, arbitrary-byte
round-trip, encoder vs sequential reference."""

import random

import numpy as np
import pandas as pd
import pytest

import ray.data

from docstrange_ray.ops import bytebpe as B

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus(n=60):
    rng = random.Random(5)
    words = ["stream", "shuffle", "actor", "arrow", "table", "don't", "(x)", "42"]
    return pd.DataFrame(
        {
            "doc_id": [f"d{i:03d}" for i in range(n)],
            "text": [
                " ".join(rng.choice(words) for _ in range(rng.randint(3, 12)))
                for _ in range(n)
            ],
        }
    )


class TestByteMap:
    def test_bijection_and_no_whitespace(self):
        m = B.byte_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256  # bijective
        assert all(not c.isspace() for c in m.values())
        assert m[ord("a")] == "a" and m[ord("!")] == "!"
        assert m[32] == chr(0x120)  # space -> Ġ (the published mapping)
        assert m[0] == chr(0x100)

    def test_pretokenize_partitions_bytes(self):
        # concatenating pre-tokens reconstructs the input EXACTLY, for
        # arbitrary (including invalid-UTF-8) bytes
        rng = random.Random(11)
        for ln in (0, 1, 5, 300):
            data = bytes(rng.randrange(256) for _ in range(ln))
            toks = B.pretokenize_bytes(data)
            assert "".join(toks).encode("latin-1") == data

    def test_contractions_and_space_prefix(self):
        toks = B.pretokenize_bytes(b"don't stop isn't it")
        assert "'t" in toks and " stop" in toks and "don" in toks


class TestTraining:
    def test_plan_parity_and_merge_shape(self):
        ds = ray.data.from_pandas(_corpus())
        loc = B.byte_bpe_train(ds, n_merges=16, plan="local")
        dist = B.byte_bpe_train(ds, n_merges=16, plan="distributed")
        assert loc.equals(dist)
        assert list(loc.columns) == ["rank", "left_sym", "right_sym", "freq"]
        # merge frequencies are non-increasing only within no-interaction
        # steps; but rank ordering and int64 dtypes always hold
        assert loc["rank"].tolist() == list(range(1, len(loc) + 1))
        assert loc["freq"].dtype == np.int64

    def test_first_merge_matches_naive_count(self):
        ds = ray.data.from_pandas(_corpus())
        merges = B.byte_bpe_train(ds, n_merges=1, plan="local")
        # naive recount: most frequent adjacent mapped-byte pair
        counts = {}
        for t in _corpus()["text"]:
            for tok in B.pretokenize_bytes(t.encode("utf-8")):
                syms = [B.map_pretoken(c) for c in tok]
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + 1
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        assert (merges["left_sym"][0], merges["right_sym"][0]) == best[0]
        assert int(merges["freq"][0]) == best[1]


class TestEncodeDecode:
    @pytest.fixture(scope="class")
    def merges(self):
        return B.byte_bpe_train(
            ray.data.from_pandas(_corpus()), n_merges=20, plan="local"
        )

    def test_roundtrip_arbitrary_bytes(self, merges):
        rng = random.Random(23)
        for ln in (0, 1, 3, 17, 400):
            data = bytes(rng.randrange(256) for _ in range(ln))
            assert B.decode_ids(B.encode_bytes(data, merges), merges) == data

    def test_roundtrip_utf8_text(self, merges):
        for s in ("hello world", "don't stop!", "héllo — wörld", "日本語 text"):
            data = s.encode("utf-8")
            assert B.decode_ids(B.encode_bytes(data, merges), merges) == data

    def test_byte_fallback_ids_cover_all_bytes(self, merges):
        # every single byte encodes to exactly its own base id
        for b in range(256):
            ids = B.encode_bytes(bytes([b]), merges)
            assert ids == [b]

    def test_token_counts_match_sequential(self, merges):
        df = _corpus()
        got = (
            B.byte_bpe_token_counts(ray.data.from_pandas(df), merges)
            .to_pandas()
            .set_index("doc_id")
        )
        for _, row in df.iloc[:20].iterrows():
            ids = B.encode_bytes(row["text"].encode("utf-8"), merges)
            assert got.loc[row["doc_id"], "n_tokens"] == len(ids)
            assert got.loc[row["doc_id"], "n_bytes"] == len(
                row["text"].encode("utf-8")
            )
        # merges compress: tokens strictly fewer than bytes on this corpus
        assert (got["n_tokens"] < got["n_bytes"]).all()
