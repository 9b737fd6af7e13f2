"""Audio fingerprinting: spectral-peak constellation near-dup detection.

The Shazam shape (Wang 2003, "An Industrial-Strength Audio Search
Algorithm"): STFT -> per-frame spectral peaks (the "constellation") ->
anchor/target peak TRIPLES hashed as (f1, f2, f3, dt1, dt2) landmarks
(pairs saturate their ~2e5 keyspace near 1e5 clips — measured — while
triples hold O(1) bucket sizes past 1e6; Wang §3's combinatorial
hashing trades a slightly higher per-clip landmark count for
collision rarity) -> two audio
clips are the same recording iff MANY landmarks collide AT A CONSISTENT
TIME OFFSET. Shift-invariant (a clip embedded in silence or trimmed
still matches — the offset histogram just moves) and amplitude-
invariant (peak LOCATIONS don't move under gain), which byte dedup and
the RMS/ZCR features (ops/multimodal) can never give.

Distributed shape (the imagedup/simhash discipline):

  1. actor-pool ``map_batches`` decodes PCM16 WAV (the from-scratch
     RIFF decoder, ops/media_meta.decode_wav), runs a numpy rfft STFT
     LOCALLY per clip, and emits (landmark_hash, anchor_frame, id)
     rows — the spectrogram never leaves the task; the exchange
     carries ~peaks x fan_out int64 rows per clip.
  2. ONE groupby on landmark_hash: candidate pair votes (a, b,
     dt = anchor_b - anchor_a) inside each bucket. ``bucket_cap``
     (default None) can skip ubiquitous landmarks — fingerprinting is
     a RETRIEVAL heuristic with a documented recall contract, unlike
     the exact joins (editjoin/jaccard), so a cap here is a tuning
     knob, not a correctness hole; skipped-bucket counts are logged.
  3. ONE groupby on (id_a, id_b, dt) counts aligned votes; pairs with
     ``min_votes`` agreeing on one offset are matches.

Determinism: the FFT is float but runs whole-clip inside one task —
no cross-task float reduction — so results are bit-stable for a given
numpy build; peak selection tie-breaks on (magnitude, -bin) via
lexsort, not argsort order. Malformed payloads decode to zero
landmarks (they simply can't match), mirroring the decode-fallback
convention of ops/multimodal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_FFT = 256
HOP = 128
PEAKS_PER_FRAME = 3
FAN_OUT = 4
TARGET_WINDOW = 12  # frames ahead an anchor pairs into
_DT_BITS = 8
_F_BITS = 9  # n_fft/2+1 = 129 bins < 512


def clip_landmarks(samples: np.ndarray, *, n_fft: int = N_FFT,
                   hop: int = HOP) -> tuple[np.ndarray, np.ndarray]:
    """(hashes int64, anchor_frames int32) for one mono PCM clip."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:  # channel mixdown
        x = x.mean(axis=1)
    n_frames = 1 + max(0, (len(x) - n_fft)) // hop
    if len(x) < n_fft or n_frames == 0:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    win = np.hanning(n_fft)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    mags = np.abs(np.fft.rfft(x[idx] * win, axis=1))
    # per-frame top-P peaks, deterministic tie-break (mag desc, bin asc)
    order = np.lexsort((np.arange(mags.shape[1])[None, :].repeat(
        n_frames, axis=0), -mags), axis=1)
    peaks = np.sort(order[:, :PEAKS_PER_FRAME], axis=1)  # (n_frames, P)
    # silence guard: frames with no energy produce no peaks
    live = mags[np.arange(n_frames)[:, None], peaks] > 1e-6
    hh, tt = [], []
    flat_t = np.repeat(np.arange(n_frames, dtype=np.int32), PEAKS_PER_FRAME)
    flat_f = peaks.ravel()
    flat_live = live.ravel()
    pts_t = flat_t[flat_live]
    pts_f = flat_f[flat_live]
    # anchor i forms a TRIPLE with each ordered pair of its next
    # FAN_OUT points: hash = (f1, f2, f3, dt1, dt2). Triples (not the
    # classic pairs) are the combinatorial-hashing scale lever (Wang
    # 2003 §3): pair keyspace here is ~129^2 x 12 ~ 2e5 and SATURATES
    # near 1e5 clips (measured: typical bucket ~60 at 100k clips x
    # ~120 landmarks, votes volume ~n^2/K — the 100k scale check ran
    # quadratic); the triple keyspace ~129^3 x 12^2 ~ 3e8 keeps
    # expected bucket size O(1) far past 1e6 clips, so the per-bucket
    # vote explode stays linear in corpus size.
    for k1 in range(1, FAN_OUT):
        for k2 in range(k1 + 1, FAN_OUT + 1):
            if k2 >= len(pts_t):
                break
            t1 = pts_t[:-k2]
            f1 = pts_f[:-k2]
            f2 = pts_f[k1:len(pts_t) - (k2 - k1)]
            t3 = pts_t[k2:]
            f3 = pts_f[k2:]
            dt1 = (pts_t[k1:len(pts_t) - (k2 - k1)] - t1).astype(np.int64)
            dt2 = (t3 - t1).astype(np.int64)
            ok = (dt1 >= 0) & (dt2 < TARGET_WINDOW)
            h = (
                (f1[ok].astype(np.int64)
                 << (2 * _F_BITS + 2 * _DT_BITS))
                | (f2[ok].astype(np.int64) << (_F_BITS + 2 * _DT_BITS))
                | (f3[ok].astype(np.int64) << (2 * _DT_BITS))
                | (dt1[ok] << _DT_BITS)
                | dt2[ok]
            )
            hh.append(h)
            tt.append(t1[ok])
    if not hh:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    return np.concatenate(hh), np.concatenate(tt).astype(np.int32)


class _LandmarkActor:
    """Stateless decode+STFT per batch (actor pool: the window and
    FFT plan stay warm per process)."""

    def __init__(self):
        from docstrange_ray.ops.media_meta import decode_wav

        self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        from docstrange_ray.shuffle import arrow_out

        return arrow_out(self._run)(batch)

    def _run(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_h, out_t, out_id = [], [], []
        for mid, data in zip(ids, payloads):
            try:
                samples, _sr = self._decode(bytes(data or b""))
            except ValueError:  # decode errors normalize to ValueError
                continue  # malformed: zero landmarks, can't match
            h, t = clip_landmarks(samples)
            out_h.append(h)
            out_t.append(t)
            out_id.extend([mid] * len(h))
        if not out_h:
            return pd.DataFrame(
                {"h": pd.Series(dtype="int64"),
                 "t": pd.Series(dtype="int32"),
                 "id": pd.Series(dtype=object)}
            )
        return pd.DataFrame(
            {"h": np.concatenate(out_h),
             "t": np.concatenate(out_t),
             "id": out_id}
        )


def audio_near_dups(
    media_ds,
    min_votes: int = 8,
    bucket_cap: int | None = None,
    concurrency=(1, 4),
    num_partitions: int | None = None,
):
    """Shift/gain-invariant audio near-dup pairs.

    Returns pandas [(media_ref_a, media_ref_b, dt_frames, votes)] —
    pairs whose landmark collisions agree on one time offset at least
    ``min_votes`` times, sorted, id_a < id_b. One row per PAIR: a pair
    matching at multiple offsets keeps only its best
    (votes DESC, dt ASC) offset — see the module docstring's tally
    step.
    """
    from docstrange_ray.stages import bind_actor
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    rows = media_ds.map_batches(
        bind_actor(_LandmarkActor),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
        num_cpus=1,
    )

    def votes(block: pa.Table) -> pd.DataFrame:
        df = block.to_pandas()
        out = []
        skipped = 0
        for _, grp in df.groupby("h", sort=False):
            m = len(grp)
            if m < 2:
                continue
            if bucket_cap is not None and m > bucket_cap:
                skipped += 1
                continue
            ids = grp["id"].to_numpy()
            ts = grp["t"].to_numpy()
            iu, ju = np.triu_indices(m, k=1)
            a, b = ids[iu], ids[ju]
            ta, tb = ts[iu], ts[ju]
            swap = a > b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            dt = np.where(swap, ta - tb, tb - ta).astype(np.int32)
            keep = a2 != b2
            out.append(pd.DataFrame(
                {"id_a": a2[keep], "id_b": b2[keep], "dt": dt[keep]}))
        if skipped:
            import logging

            logging.getLogger(__name__).warning(
                "audio_near_dups: skipped %d landmark buckets over "
                "bucket_cap=%s", skipped, bucket_cap)
        if not out:
            return pd.DataFrame({"id_a": pd.Series(dtype=object),
                                 "id_b": pd.Series(dtype=object),
                                 "dt": pd.Series(dtype="int32")})
        return pd.concat(out, ignore_index=True)

    pair_votes = grouped_blocks(rows, ["h"], votes,
                                num_partitions=num_partitions)

    def tally(block: pa.Table) -> pd.DataFrame:
        # ONE pair-keyed exchange: a pair's votes all land here, so the
        # per-offset histogram AND its argmax are block-local. Best
        # offset wins, ties to the smallest dt (periodic signals vote
        # at several offsets; the answer is one row per matched pair).
        df = block.to_pandas()
        g = (df.groupby(["id_a", "id_b", "dt"], as_index=False)
               .size().rename(columns={"size": "votes"}))
        g = g.sort_values(["id_a", "id_b", "votes", "dt"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        g = g.drop_duplicates(["id_a", "id_b"], keep="first")
        return g[g["votes"] >= min_votes]

    out = grouped_blocks(pair_votes, ["id_a", "id_b"], tally,
                         num_partitions=num_partitions).to_pandas()
    if out.empty:  # empty materialized Datasets lose their schema
        return pd.DataFrame({"media_ref_a": pd.Series(dtype=object),
                             "media_ref_b": pd.Series(dtype=object),
                             "dt_frames": pd.Series(dtype="int32"),
                             "votes": pd.Series(dtype="int64")})
    out = out.rename(columns={"id_a": "media_ref_a", "id_b": "media_ref_b",
                              "dt": "dt_frames"})
    out["votes"] = out["votes"].astype("int64")
    out["dt_frames"] = out["dt_frames"].astype("int32")
    return out.sort_values(
        ["media_ref_a", "media_ref_b"]
    ).reset_index(drop=True)
