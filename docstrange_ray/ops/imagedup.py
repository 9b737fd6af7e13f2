"""Perceptual-hash image near-deduplication (dHash).

The multimodal counterpart of the text dedup family: web-scale corpora
carry millions of re-encoded / lightly-edited copies of the same image
(thumbnails, recompressions, one-pixel watermark variants) that
byte-level exact dedup can never see. The standard first-line tool is
the difference hash (dHash — public domain technique, popularized by
Krawetz's HackerFactor writeups): downscale to a tiny grid, emit one
bit per horizontally adjacent cell comparison, match by Hamming
distance. Near-identical pixels → near-identical hashes, while the
hash is invariant to exact affine brightness/contrast shifts
(the cross-multiplied comparison cancels a*x+b) and to any resize
that preserves cell ordering.

Design decisions (all for exactness / SQL-oracle parity):
  * grid = 8 rows x 8 cols -> 7 comparisons/row -> 56 bits: always a
    POSITIVE int64, so the hash survives every Arrow/pandas/SQL hop
    with no unsigned-wrap caveats;
  * cells compare by SUM cross-multiplication (sum_a * n_b >
    sum_b * n_a), never by float mean — integer-exact for ANY image
    size, and a pure-arithmetic SQL mirror exists;
  * pairing reuses the SimHash 4x16-bit segment blocking
    (ops.dedup.simhash_pairs_from_sigs): complete for Hamming <= 3 by
    pigeonhole, ONE segment-key exchange, no quadratic scan.

The decode step is the REAL from-scratch PNG codec
(ops.media_meta.decode_png); undecodable payloads emit the sentinel
hash -(1 << 63) with ok=False (the wordless-SimHash convention) and
never pair. Reference scope note: the reference treats images as
opaque OCR inputs only (docstrange/pipeline/neural_document_processor.py)
— this family is part of the training-data extension (SURVEY §2 LLM-ops
block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (house import style for ops modules)
import pyarrow as pa

_SENTINEL = -(1 << 63)


def dhash_gray(img: np.ndarray, rows: int = 8, cols: int = 8) -> int:
    """56-bit dHash of a grayscale (h, w) uint8 array. Cell boundaries
    are ``floor(i * h / rows)`` (exact for divisible sizes, deterministic
    for all); bit (r, c) = 1 iff cell (r, c)'s pixel sum exceeds cell
    (r, c+1)'s, compared via integer cross-multiplication so unequal
    cell areas stay exact. Bit (r, c) lands at position r*(cols-1)+c.
    Requires h >= rows and w >= cols (every cell non-empty)."""
    h, w = img.shape
    if h < rows or w < cols:
        raise ValueError(f"image {h}x{w} smaller than dhash grid {rows}x{cols}")
    ys = (np.arange(rows + 1, dtype=np.int64) * h) // rows
    xs = (np.arange(cols + 1, dtype=np.int64) * w) // cols
    # integral image -> O(1) exact cell sums
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(img, axis=0, dtype=np.int64), axis=1, out=ii[1:, 1:])
    sums = (
        ii[ys[1:, None], xs[None, 1:]]
        - ii[ys[:-1, None], xs[None, 1:]]
        - ii[ys[1:, None], xs[None, :-1]]
        + ii[ys[:-1, None], xs[None, :-1]]
    )  # (rows, cols)
    areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    left, right = sums[:, :-1], sums[:, 1:]
    a_l, a_r = areas[:, :-1], areas[:, 1:]
    bits = (left * a_r > right * a_l).astype(np.uint64)
    shifts = (
        np.arange(rows, dtype=np.uint64)[:, None] * np.uint64(cols - 1)
        + np.arange(cols - 1, dtype=np.uint64)[None, :]
    )
    return int((bits << shifts).sum(dtype=np.uint64))


def image_dhash_table(
    media_ds,
    id_col: str = "media_ref",
    payload_col: str = "payload",
    rows: int = 8,
    cols: int = 8,
):
    """(id, dhash, ok) per image — shuffle-free scan over the
    magic-dispatch decoder (PNG/JPEG/GIF/BMP/TIFF), so a re-encoded
    copy of the same pixels hashes identically ACROSS CONTAINERS —
    cross-format near-dup detection, the case byte-level dedup can
    never see. Decode failures (unknown container, truncated,
    unsupported layout) take the sentinel path instead of killing the
    task (the round-4 error-normalization contract)."""
    from docstrange_ray.ops.media_meta import decode_image_gray

    def batch_hash(batch: pa.Table) -> pa.Table:
        hashes, oks = [], []
        for payload in batch.column(payload_col).to_pylist():
            try:
                img = decode_image_gray(payload)
                hashes.append(dhash_gray(np.asarray(img), rows, cols))
                oks.append(True)
            except ValueError:
                hashes.append(_SENTINEL)
                oks.append(False)
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(hashes, pa.int64()),
                pa.array(oks, pa.bool_()),
            ],
            names=[id_col, "dhash", "ok"],
        )

    return media_ds.map_batches(batch_hash, batch_format="pyarrow")


def image_near_dup_pairs(
    media_ds,
    max_hamming: int = 3,
    id_col: str = "media_ref",
    payload_col: str = "payload",
    num_partitions: int | None = None,
):
    """Image near-dup pairs by dHash Hamming distance: hash scan, then
    the SimHash 4-segment blocking exchange (complete for
    max_hamming <= 3 over the 4x16-bit split — a pair differing in
    <= 3 bits leaves >= 1 segment identical). Returns
    Dataset[(doc_id_a, doc_id_b, hamming)] keyed by ``id_col`` values.
    Failed decodes (sentinel hash) are dropped before pairing — two
    unreadable images are not near-dups."""
    import pyarrow.compute as pc

    from docstrange_ray.ops.dedup import simhash_pairs_from_sigs

    sigs = image_dhash_table(
        media_ds, id_col=id_col, payload_col=payload_col
    ).map_batches(
        lambda b: b.filter(pc.field("ok")).select([id_col, "dhash"]).rename_columns(
            ["doc_id", "simhash"]
        ),
        batch_format="pyarrow",
    )
    # bucket_cap=None: the pigeonhole completeness claim must be
    # UNCONDITIONAL here (65+ copies of one image is the primary dedup
    # target, and a bucket of b equal hashes legitimately yields
    # b*(b-1)/2 pairs — the answer's own size, not an explosion)
    return simhash_pairs_from_sigs(
        sigs, max_hamming, num_partitions, bucket_cap=None
    )
