"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

Decode is REAL for the codec-free formats — PNG (stdlib inflate +
unfilter), baseline JPEG (from-scratch Huffman + IDCT) and GIF incl.
animated multi-frame (from-scratch LZW + palette + disposal
composition, ``ops/media_meta.decode_gif_frames``) — and gated behind
``NotImplementedError`` for formats that need an external codec
(PIL/ffmpeg absent in this container). The Ray-side plumbing is the
same either way: schema, actor-pool stage shape, batch sizing for large
binary payloads, and output layout; swapping in a codec-backed decoder
touches exactly one method. This mirrors how the reference isolates its
model-bearing stages behind small interfaces (ocr_service.py:190-222).

Memory note (ray_guide pitfalls): binary payload batches must stay
small — ``media_batch_size`` default 16 keeps batch x concurrency well
under worker heap for multi-MB blobs; blocks stay in Arrow (never pandas
object dtype) end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from docstrange_ray.numerics import round6

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

MEDIA_BATCH_SIZE = 16


def synth_media_table(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic fake media payloads for the fixture media table
    (FIXTURES.md §4)."""
    rows = []
    for ref in refs:
        h = hashlib.md5(f"{seed}:{ref}".encode()).digest()
        size = 512 + h[0] * 16
        payload = (h * ((size // 16) + 1))[:size]
        rows.append(
            {
                "media_ref": ref,
                "payload": payload,
                "mime": "image/png" if h[1] % 2 == 0 else "image/jpeg",
                "width": 64 + (h[2] % 8) * 32,
                "height": 64 + (h[3] % 8) * 32,
                "n_frames": 1,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class ImageDecodeActor:
    """Actor-pool stage: decode + feature-extract image payloads.

    Backends:
      * ``'fake'`` — deterministic pseudo-pixels from the payload bytes
        (hermetic default for synthetic media tables);
      * ``'auto'`` — REAL stdlib decode when the payload is a PNG
        (ops/media_meta.decode_png: inflate + unfilter + luma) or a
        baseline JPEG (ops/media_meta.decode_jpeg_gray: Huffman + IDCT,
        from scratch), fake otherwise — real pixels for the two
        dominant image mimes with zero dependencies;
      * ``'pil'`` — raises until a real imaging library is present
        (progressive JPEG, WebP and friends need a codec).
    """

    def __init__(self, backend: str = "fake", resize_to: int = 32):
        self.backend = backend
        self.resize_to = resize_to
        if backend == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - env without PIL
                raise NotImplementedError(
                    "PIL backend requires pillow; use backend='fake' in this sandbox"
                ) from e

    def _decode_fake(self, payload: bytes, w: int, h: int) -> np.ndarray:
        # Deterministic pseudo-decode: tile the byte payload into (h, w).
        arr = np.frombuffer(payload, dtype=np.uint8)
        need = w * h
        tiled = np.resize(arr, need).reshape(h, w)
        return tiled

    def _decode(self, payload: bytes, w: int, h: int):
        if self.backend == "auto" and payload[:8] == b"\x89PNG\r\n\x1a\n":
            from docstrange_ray.ops.media_meta import decode_png

            return decode_png(payload)  # REAL pixels
        if self.backend == "auto" and payload[:2] == b"\xff\xd8":
            from docstrange_ray.ops.media_meta import decode_jpeg_gray

            try:
                return decode_jpeg_gray(payload)  # REAL pixels
            except ValueError:
                pass  # progressive/headers-only: deterministic fake
        if self.backend == "auto" and payload[:6] in (b"GIF87a", b"GIF89a"):
            from docstrange_ray.ops.media_meta import decode_gif_frames

            try:
                return decode_gif_frames(payload, max_frames=1)[0]  # REAL pixels
            except ValueError:
                pass
        if self.backend == "auto" and payload[:2] == b"BM":
            from docstrange_ray.ops.media_meta import decode_bmp_gray

            try:
                return decode_bmp_gray(payload)  # REAL pixels
            except ValueError:
                pass  # RLE/16-bit/palette exotica: deterministic fake
        if self.backend == "auto" and payload[:4] in (b"II*\x00", b"MM\x00*"):
            from docstrange_ray.ops.media_meta import decode_tiff_gray

            try:
                return decode_tiff_gray(payload)  # REAL pixels
            except ValueError:
                pass  # compressed/multi-sample TIFF: deterministic fake
        return self._decode_fake(payload, max(1, w), max(1, h))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend not in ("fake", "auto"):
            raise NotImplementedError(
                "only the 'fake'/'auto' backends run in this sandbox"
            )
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        names = set(batch.column_names)
        widths = (
            batch.column("width").to_pylist() if "width" in names else [0] * len(refs)
        )
        heights = (
            batch.column("height").to_pylist() if "height" in names else [0] * len(refs)
        )
        out = []
        r = self.resize_to
        for ref, payload, w, h in zip(refs, payloads, widths, heights):
            img = self._decode(payload, w, h)
            h, w = img.shape
            # nearest-neighbor "resize" to r x r
            yi = (np.arange(r) * (h / r)).astype(int)
            xi = (np.arange(r) * (w / r)).astype(int)
            small = img[np.ix_(yi, xi)].astype(np.float64)
            out.append(
                {
                    "media_ref": ref,
                    "mean_intensity": float(round6(img.mean())),
                    "feature": (small.mean(axis=0) / 255.0).round(6).tolist(),
                }
            )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("mean_intensity", pa.float64()),
                    ("feature", pa.list_(pa.float64())),
                ]
            ),
        )


class FrameSampleActor:
    """Actor-pool stage: uniform frame sampling + per-frame features for
    multi-frame payloads (the frame-sample stage of a multimodal
    training pipeline).

    Backends:
      * ``'auto'`` (preferred) — REAL frames when the payload is a GIF:
        ``ops/media_meta.decode_gif_frames`` is a from-scratch LZW +
        palette + interlace + disposal-composition decoder, so the
        sampled ``frame_mean`` comes from genuine pixels; non-GIF
        payloads fall back to the deterministic fake.
      * ``'fake'`` — deterministic per-frame pseudo features from
        payload bytes (hermetic plumbing tests).
      * ``'ffmpeg'`` — raises until a real video codec is present
        (mp4/webm need one; GIF is the honest codec-free stand-in).

    Emits one ROW PER SAMPLED FRAME (flat output beats nested lists for
    downstream shuffles)."""

    def __init__(self, backend: str = "fake", n_sample: int = 4):
        self.backend = backend
        self.n_sample = n_sample
        if backend == "ffmpeg":
            raise NotImplementedError(
                "ffmpeg backend unavailable in this sandbox; use backend='auto'"
            )

    def _real_gif_rows(self, ref: str, payload: bytes) -> list[dict]:
        from docstrange_ray.ops.media_meta import decode_gif_frames, gif_frame_count

        total = max(1, gif_frame_count(payload))
        k = min(self.n_sample, total)
        idxs = [int(i * total / k) for i in range(k)]
        # format is sequential by design; decode once up to the last
        # sampled frame rather than per index
        frames = decode_gif_frames(payload, max_frames=idxs[-1] + 1)
        return [
            {
                "media_ref": ref,
                "frame_index": fi,
                "frame_mean": float(round6(frames[fi].mean())),
            }
            for fi in idxs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for ref, payload, n_frames in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("n_frames").to_pylist(),
        ):
            payload = payload or b""
            if self.backend == "auto" and payload[:6] in (b"GIF87a", b"GIF89a"):
                try:
                    rows.extend(self._real_gif_rows(ref, payload))
                    continue
                except ValueError:
                    pass  # malformed GIF: deterministic fake below
            total = max(1, int(n_frames))
            k = min(self.n_sample, total)
            # uniform, deterministic frame indices
            idxs = [int(i * total / k) for i in range(k)]
            arr = np.frombuffer(payload, dtype=np.uint8)
            for fi in idxs:
                # fake per-frame feature: byte-slice mean keyed by index
                sl = arr[fi % max(1, len(arr) - 16) :][:16]
                rows.append(
                    {
                        "media_ref": ref,
                        "frame_index": fi,
                        "frame_mean": float(round6(sl.mean())) if len(sl) else 0.0,
                    }
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("frame_index", pa.int32()),
                    ("frame_mean", pa.float64()),
                ]
            ),
        )


def sample_frames(media_ds, n_sample: int = 4, concurrency=(1, 4), backend: str = "auto"):
    """Frame-sampling pipeline: actor pool, small batches (binary
    payloads), one output row per sampled frame. ``backend='auto'``
    decodes REAL frames for GIF payloads (stdlib LZW decoder)."""
    from docstrange_ray.stages import bind_actor

    return media_ds.map_batches(
        bind_actor(FrameSampleActor, backend=backend, n_sample=n_sample),
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


def decode_features(media_ds, concurrency=(1, 4), backend: str = "fake"):
    """The media feature pipeline: actor pool, small batches (binary
    payloads), Arrow end-to-end. ``backend='auto'`` decodes real PNG
    payloads with the stdlib decoder and falls back to the deterministic
    fake for other formats."""
    from docstrange_ray.stages import bind_actor

    return media_ds.map_batches(
        bind_actor(ImageDecodeActor, backend=backend),
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioFeatureActor:
    """Actor-pool stage: decode + feature-extract audio payloads — the
    audio leg of the multimodal pipeline. ``backend='auto'`` decodes
    REAL samples for PCM16 WAV payloads (ops/media_meta.decode_wav,
    from-scratch RIFF walk) and computes genuine signal features;
    other containers (mp3/ogg/flac need a codec) fall back to the
    deterministic fake. Emits per-payload ``rms`` (root-mean-square
    amplitude, normalized to [0, 1] full scale), ``zcr``
    (zero-crossing rate of the first channel) and ``duration_ms``."""

    def __init__(self, backend: str = "auto"):
        if backend not in ("auto", "fake"):
            raise NotImplementedError(
                "mp3/ogg/flac need a codec; use backend='auto' (real WAV) or 'fake'"
            )
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        from docstrange_ray.ops.media_meta import decode_wav

        rows = []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            payload = payload or b""
            real = False
            if self.backend == "auto" and payload[:4] == b"RIFF":
                try:
                    samples, sr = decode_wav(payload)
                    real = True
                except ValueError:
                    pass
            if real and len(samples):
                x = samples.astype(np.float64) / 32768.0
                rms = float(np.sqrt(np.mean(x * x)))
                ch0 = x[:, 0]
                zcr = (
                    float(np.mean(np.signbit(ch0[1:]) != np.signbit(ch0[:-1])))
                    if len(ch0) > 1
                    else 0.0
                )
                dur = int(round(1000 * len(samples) / sr))
            elif real:
                # a structurally valid WAV with an empty data payload IS
                # a real decode — report genuine zero features, not the
                # fake branch's container-byte stats (ADVICE-r3 #3)
                rms = zcr = 0.0
                dur = 0
            else:
                arr = np.frombuffer(payload, dtype=np.uint8)
                # no inner round(): the half-away round6 at emit is the
                # single rounding point (a quotient of ints can tie)
                rms = float(arr.mean()) / 255.0 if len(arr) else 0.0
                zcr = 0.0
                dur = -1
            rows.append(
                {
                    "media_ref": ref,
                    "rms": float(round6(rms)),
                    "zcr": float(round6(zcr)),
                    "duration_ms": dur,
                    "real_decode": real,
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("rms", pa.float64()),
                    ("zcr", pa.float64()),
                    ("duration_ms", pa.int64()),
                    ("real_decode", pa.bool_()),
                ]
            ),
        )


def audio_features(media_ds, concurrency=(1, 4), backend: str = "auto"):
    """Audio feature pipeline: actor pool, small batches (binary
    payloads), real PCM16 WAV decode under ``backend='auto'``."""
    from docstrange_ray.stages import bind_actor

    return media_ds.map_batches(
        bind_actor(AudioFeatureActor, backend=backend),
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )
