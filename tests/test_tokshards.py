"""Indexed-binary token sink (io.write_token_shards /
read_token_shards — the Megatron-style .bin/.idx training-data
handoff): lossless round trip, byte determinism across arrival
orders, header validation, dtype-range validation."""

import glob
import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from docstrange_ray.io import read_token_shards, write_token_shards


def _rows(n=97, seed=3):
    rng = np.random.default_rng(seed)
    return [
        {
            "doc_id": i,
            "tokens": rng.integers(0, 50000, size=int(rng.integers(0, 30))).tolist(),
        }
        for i in range(n)
    ]


def _file_digest(out_dir):
    h = hashlib.md5()
    for p in sorted(glob.glob(f"{out_dir}/shard-*")):
        if p.endswith(".tmp"):
            continue
        h.update(p.rsplit("/", 1)[1].encode())
        h.update(open(p, "rb").read())
    return h.hexdigest()


class TestTokenShards:
    def test_round_trip_lossless(self, ray_session, tmp_path):
        rows = _rows()
        out = str(tmp_path / "shards")
        summary = write_token_shards(
            ray.data.from_items(rows), out, n_shards=5
        ).take_all()
        assert sorted(r["shard_id"] for r in summary) == list(range(5))
        assert sum(r["n_docs"] for r in summary) == len(rows)
        assert sum(r["n_tokens"] for r in summary) == sum(
            len(r["tokens"]) for r in rows
        )
        back = {r["doc_id"]: list(r["tokens"]) for r in read_token_shards(out).take_all()}
        assert back == {r["doc_id"]: r["tokens"] for r in rows}

    def test_bytes_deterministic_across_arrival_order(self, ray_session, tmp_path):
        rows = _rows()
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_token_shards(ray.data.from_items(rows), a, n_shards=4).take_all()
        write_token_shards(
            ray.data.from_items(rows[::-1]), b, n_shards=4
        ).take_all()
        assert _file_digest(a) == _file_digest(b)

    def test_bad_magic_raises(self, ray_session, tmp_path):
        out = str(tmp_path / "shards")
        write_token_shards(
            ray.data.from_items(_rows(20)), out, n_shards=2
        ).take_all()
        p = sorted(glob.glob(f"{out}/shard-*.idx"))[0]
        raw = bytearray(open(p, "rb").read())
        raw[:8] = b"NOTMAGIC"
        open(p, "wb").write(bytes(raw))
        with pytest.raises(Exception, match="magic"):
            read_token_shards(out).take_all()

    def test_token_out_of_uint32_range_raises(self, ray_session, tmp_path):
        ds = ray.data.from_items([{"doc_id": 0, "tokens": [1, 2**33]}])
        with pytest.raises(Exception, match="uint32"):
            write_token_shards(ds, str(tmp_path / "s"), n_shards=1).take_all()

    def test_empty_dir_reads_empty(self, ray_session, tmp_path):
        assert read_token_shards(str(tmp_path)).take_all() == []
