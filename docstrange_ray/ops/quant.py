"""Scalar int8 embedding quantization.

At 100 TB an embedding column dominates storage and exchange volume:
a 768-dim float32 vector is 3 KB/row, and every ANN / dedup / kNN
pass ships it. Symmetric per-vector int8 quantization (the
faiss-ScalarQuantizer / sentence-transformers shape) cuts that 4x
with a one-scan, shuffle-free transform:

    scale   = maxabs(x) / 127            (one float64 per vector)
    code_i  = round_half_away(x_i / scale)  in [-127, 127]
    x_i     ~ code_i * scale             (|error| <= scale / 2)

Design for exactness (the repo's oracle discipline):
  * codes use ROUND-HALF-AWAY — midpoints are REACHABLE here
    (x*127/maxabs lands on .5 whenever the ratio is a dyadic
    rational), so DuckDB-ROUND parity is a correctness requirement,
    not a nicety (the doc_novelty lesson, VERDICT r3 #1);
  * the max-abs reduction is comparison-only (no float-sum order
    dependence) and the scale division is a single IEEE-exact op,
    so the distributed result is bit-identical to any sequential
    reference;
  * float32 inputs are widened to float64 BEFORE the divide —
    DuckDB has no float32 arithmetic, so mixed-precision divides
    would diverge in the last ulp.

Reference scope note: the reference has no embedding ops at all
(SURVEY §2 — this family is part of the training-data extension);
the quantizer composes with ops/ann.py (PQ already quantizes
CENTROIDS; this is the orthogonal raw-vector path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docstrange_ray.numerics import round_half_away


def quantize_batch(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes int8 (n, d), scales float64 (n,)) for a float64 matrix.
    All-zero vectors take scale 0.0 and all-zero codes."""
    maxabs = np.abs(mat).max(axis=1)
    scale = maxabs / 127.0
    safe = np.where(scale == 0.0, 1.0, scale)
    codes = round_half_away(mat / safe[:, None], 0)
    codes = np.clip(codes, -127, 127).astype(np.int8)
    codes[scale == 0.0] = 0
    return codes, scale


def quantize_embeddings(ds, id_col: str = "vec_id", col: str = "embedding"):
    """Shuffle-free scan: Dataset[(id_col, codes: list<int8>,
    scale: float64)]. Reconstruction = codes * scale (see
    :func:`dequantize_batch`); max elementwise error is scale/2."""

    def q(batch: pa.Table) -> pa.Table:
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch.column(col).to_pylist()]
        ) if batch.num_rows else np.zeros((0, 1))
        codes, scale = quantize_batch(mat)
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(list(codes), pa.list_(pa.int8())),
                pa.array(scale, pa.float64()),
            ],
            names=[id_col, "codes", "scale"],
        )

    return ds.map_batches(q, batch_format="pyarrow")


def dequantize_batch(codes: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """codes (n, d) int8 + scale (n,) -> float64 approximation."""
    return codes.astype(np.float64) * scale[:, None]
