"""Audio constellation fingerprinting (ops/audiofp.py): planted
shift/gain duplicates, non-dup rejection, malformed-payload fallback,
determinism."""

import io
import math
import wave

import pandas as pd
import pytest

import ray.data

from docstrange_ray.ops.audiofp import audio_near_dups, clip_landmarks
from docstrange_ray.ops.media_meta import decode_wav

pytestmark = pytest.mark.usefixtures("ray_session")


def tone_mix(freqs, dur_ms, sr=8000, amp=0.25, lead_silence_ms=0):
    n = int(sr * dur_ms / 1000)
    lead = int(sr * lead_silence_ms / 1000)
    frames = bytearray(b"\x00\x00" * lead)
    for i in range(n):
        v = int(amp * 32767 * sum(math.sin(2 * math.pi * f * i / sr)
                                  for f in freqs))
        frames += max(-32768, min(32767, v)).to_bytes(2, "little", signed=True)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def _media_ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


class TestClipLandmarks:
    def test_deterministic_and_gain_invariant(self):
        s, _ = decode_wav(tone_mix([440, 880, 1320], 500))
        h1, t1 = clip_landmarks(s)
        h2, t2 = clip_landmarks(s)
        assert (h1 == h2).all() and (t1 == t2).all()
        s_loud, _ = decode_wav(tone_mix([440, 880, 1320], 500, amp=0.45))
        h3, _ = clip_landmarks(s_loud)
        # peak LOCATIONS are gain-invariant: same landmark stream
        assert len(h3) == len(h1) and (h3 == h1).all()

    def test_short_or_silent_clip_yields_no_landmarks(self):
        import numpy as np

        assert clip_landmarks(np.zeros(100, dtype=np.int16))[0].size == 0
        assert clip_landmarks(np.zeros(4000, dtype=np.int16))[0].size == 0


class TestAudioNearDups:
    def test_planted_shift_and_gain_dups_found_non_dups_rejected(self):
        base = tone_mix([440, 880, 1320], 800)
        rows = [
            {"media_ref": "a:base", "payload": base},
            # 256 ms lead silence = 16 frames at hop 128 / sr 8000
            {"media_ref": "b:shift",
             "payload": tone_mix([440, 880, 1320], 800, lead_silence_ms=256)},
            {"media_ref": "c:gain",
             "payload": tone_mix([440, 880, 1320], 800, amp=0.45)},
            {"media_ref": "d:other",
             "payload": tone_mix([523, 1046, 1569], 800)},
            {"media_ref": "e:trunc", "payload": base[:40]},  # malformed
        ]
        got = audio_near_dups(_media_ds(rows), min_votes=50)
        pairs = {
            (r.media_ref_a, r.media_ref_b): (r.dt_frames, r.votes)
            for r in got.itertuples(index=False)
        }
        assert ("a:base", "b:shift") in pairs
        dt, votes = pairs[("a:base", "b:shift")]
        assert 14 <= dt <= 17 and votes >= 400
        assert ("a:base", "c:gain") in pairs
        assert ("b:shift", "c:gain") in pairs
        # the unrelated tone set and the malformed clip match nothing
        matched = set()
        for a, b in pairs:
            matched.update((a, b))
        assert "d:other" not in matched and "e:trunc" not in matched

    def test_min_votes_gates_matches(self):
        rows = [
            {"media_ref": "a", "payload": tone_mix([440, 880, 1320], 800)},
            {"media_ref": "b",
             "payload": tone_mix([440, 880, 1320], 800, amp=0.4)},
        ]
        assert len(audio_near_dups(_media_ds(rows), min_votes=50)) == 1
        assert len(audio_near_dups(_media_ds(rows), min_votes=10**6)) == 0
