"""Bigger-N scale check for the round-4/5 op families (VERDICT r4 #6):
PassJoin edit join, entity resolution, audio constellation dedup, PLSA,
histogram tree, byte-BPE training. Per-row cost ratio big/small should
stay ~flat (<= ~1); super-linear growth flags a hidden materialization
or a skew hotspot (the 32 MiB block-granularity lesson only surfaced at
1M docs).

Usage: python scripts/scale_check_r5.py [small] [big] [audio_small] [audio_big]
"""
import io
import os
import sys
import time
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
import logging

import ray.data
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)

from docstrange_ray.shuffle import ensure_hash_shuffle

ensure_hash_shuffle()

ONLY = set(os.environ.get("R5_ONLY", "").split(",")) - {""}

SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
BIG = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
A_SMALL = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
A_BIG = int(sys.argv[4]) if len(sys.argv) > 4 else 100_000

_WORDS = [f"w{i:03d}" for i in range(300)]


def synth_texts(n: int):
    """Docs of 5 words; every 20th is a 1-edit variant of its
    predecessor (planted editjoin pairs)."""
    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = []
        import hashlib as _hl

        for i in ids:
            base = i - 1 if i % 20 == 0 and i > 0 else i
            # HIGH-ENTROPY body: 24 md5 hex chars + one pool word, so
            # EVERY PassJoin segment is essentially unique and the
            # candidate set is the planted pairs. (The first fixture
            # drew 4 of 5 tokens from a 300-word pool: segments 2-3
            # were pool-determined, ~30 strings shared each segment
            # value at identical (ordinal, length) coordinates, and at
            # 1M docs the documented exactness contract dutifully
            # produced ~10^8 candidates — 37 GB of object store and a
            # straggler group. Low-entropy corpora ARE the op's
            # documented quadratic case; a SCALING fixture must not be
            # answer-dominated.)
            tag = _hl.md5(str(int(base)).encode()).hexdigest()[:24]
            t = f"u{tag} {_WORDS[int(base) % 300]}"
            if i % 20 == 0 and i > 0:
                t = "x" + t[1:]
            texts.append(t)
        return pa.table(
            {
                "doc_id": pa.array([f"d{int(i):08d}" for i in ids]),
                "did": pa.array(ids),  # int64 id (plsa's doc_col contract)
                "text": pa.array(texts, pa.string()),
                "label": pa.array((ids % 2).astype(np.int64)),
                "val": pa.array(((ids * 2654435761) % (1 << 20)).astype(np.float64)),
                "y": pa.array((ids % 97).astype(np.float64)),
            }
        )

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")


def synth_records(n: int):
    """Entity records: phone pairs every 2 ids, zip blocks of ~50."""
    nblk = max(2, n // 50)

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "rec_id": pa.array(ids),
                "name": pa.array([f"name{int(i) // 2}" for i in ids]),
                "phone": pa.array([f"p{int(i) // 2}" for i in ids]),
                "zip": pa.array((ids % nblk).astype(np.int64)),
            }
        )

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")


def synth_audio(n: int):
    """200 ms 8 kHz PCM16 clips, 2 index-derived tones; every 10th clip
    repeats clip i-10's tones with a 50 ms silence shift (planted dup)."""
    sr, dur = 8000, 0.2

    def clip_bytes(i: int) -> bytes:
        # copy target must NOT itself be a copy (i-5 is never ≡ 0 mod
        # 10), else the "planted" pairs chain into nothing
        base = i - 5 if i % 10 == 0 and i >= 10 else i
        # time-VARYING tone sequence (10 x 20 ms segments, wide range):
        # constellations encode the temporal structure, so unrelated
        # clips share almost no (f1, f2, dt) hashes and only the
        # planted shifted copies clear the vote bar
        import hashlib as _hl

        seg_len = int(sr * 0.02)
        t = np.arange(seg_len)
        parts = []
        for seg in range(10):
            # md5 per (base, seg): no arithmetic structure, so distinct
            # bases are not shifted copies of each other (a linear
            # congruential scheme here made base+1 a time-shift of base
            # — which the shift-invariant matcher correctly caught).
            # TWO tones per segment: cross-clip collisions need a bin
            # PAIR, pushing unrelated max-votes under the bar (measured:
            # <= 6 for unrelated, ~93 for the planted shifted copy).
            h1 = int.from_bytes(
                _hl.md5(f"{int(base)}:{seg}:a".encode()).digest()[:4], "big"
            )
            h2 = int.from_bytes(
                _hl.md5(f"{int(base)}:{seg}:b".encode()).digest()[:4], "big"
            )
            fa = 200.0 + h1 % 3400
            fb = 200.0 + h2 % 3400
            parts.append(
                0.35 * np.sin(2 * np.pi * fa * t / sr)
                + 0.35 * np.sin(2 * np.pi * fb * t / sr)
            )
        sig = np.concatenate(parts)
        pcm = (sig * 32767).astype("<i2").tobytes()
        if i % 10 == 0 and i >= 10:
            pcm = b"\x00\x00" * int(sr * 0.05) + pcm
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm)
        return buf.getvalue()

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        return pa.table(
            {
                "media_ref": pa.array([f"a{int(i):08d}" for i in ids]),
                "payload": pa.array([clip_bytes(int(i)) for i in ids],
                                    pa.binary()),
            }
        )

    return ray.data.range(n).map_batches(build, batch_format="pyarrow",
                                         batch_size=512)


def _want(key: str) -> bool:
    return not ONLY or key in ONLY


def timed(name, n, fn):
    t0 = time.time()
    out = fn()
    cnt = out.count() if hasattr(out, "schema") else len(out)
    el = time.time() - t0
    print(f"{name} n={n}: {el:.1f}s rows_out={cnt} us/row={1e6*el/n:.2f}",
          flush=True)
    return el


def run(n: int, an: int) -> dict:
    from docstrange_ray.ops.bytebpe import byte_bpe_train
    from docstrange_ray.ops.editjoin import edit_distance_join
    from docstrange_ray.ops.entity import resolve_entities
    from docstrange_ray.ops.audiofp import audio_near_dups
    from docstrange_ray.ops.topics import plsa_train, doc_topics
    from docstrange_ray.ops.tree import train_histogram_tree

    res = {}
    rows = None
    if any(_want(k) for k in ("editjoin", "entity", "plsa", "tree", "bytebpe")):
        rows = synth_texts(n).materialize()
    if _want("editjoin"):
        res["editjoin"] = timed(
            "edit_distance_join", n,
            lambda: edit_distance_join(rows, tau=2),
        )

    def score(df):
        return (
            2 * (df["phone_a"].to_numpy() == df["phone_b"].to_numpy())
            + 1 * (df["name_a"].to_numpy() == df["name_b"].to_numpy())
        ).astype(np.int64)

    if _want("entity"):
        res["entity"] = timed(
            "resolve_entities", n,
            lambda: resolve_entities(
                synth_records(n), id_col="rec_id",
                block_keys=[["phone"], ["zip"]], pair_score=score, threshold=3,
            ),
        )
    if _want("plsa"):
        res["plsa"] = timed(
            "plsa_train+doc_topics", n,
            lambda: doc_topics(
                plsa_train(rows, k=6, iters=3, doc_col="did"), k=6,
                doc_col="did"
            ),
        )
    if _want("tree"):
        res["tree"] = timed(
            "train_histogram_tree", n,
            lambda: train_histogram_tree(rows, ["val", "y"], "label",
                                         max_depth=2),
        )
    if _want("bytebpe"):
        res["bytebpe"] = timed(
            "byte_bpe_train(distributed)", n,
            lambda: byte_bpe_train(rows, n_merges=8, plan="distributed"),
        )
    if not _want("audiofp"):
        return res
    audio = synth_audio(an).materialize()
    # min_votes=25: unrelated two-tone clips max out near 11 shared-
    # offset votes (measured) while planted shifted copies score ~93 —
    # the bar keeps the answer at the planted pairs so the timing
    # measures the ENGINE, not a quadratic accidental-pair output.
    res["audiofp"] = timed(
        "audio_near_dups", an,
        lambda: audio_near_dups(audio, min_votes=25),
    )
    return res


print(f"== scale check r5: {SMALL} vs {BIG} (audio {A_SMALL} vs {A_BIG}, "
      f"32 cpus) ==", flush=True)
small = run(SMALL, A_SMALL)
big = run(BIG, A_BIG)
for k in small:
    nb, ns = (A_BIG, A_SMALL) if k == "audiofp" else (BIG, SMALL)
    ratio = (big[k] / nb) / (small[k] / ns)
    print(f"{k}: per-row cost ratio big/small = {ratio:.2f}", flush=True)
ray.shutdown()
