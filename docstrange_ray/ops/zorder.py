"""Z-order (Morton) clustering keys for locality-preserving layout.

At 100 TB the ORDER documents are written in decides how much future
scans read: range-partitioning output by a single column only prunes
that column's predicates. Interleaving the bits of several columns
(the Morton / Z-order curve — the technique behind Delta's and
Iceberg's ``OPTIMIZE ZORDER BY``) gives one int64 sort key whose
ranges are simultaneously local in EVERY interleaved dimension, so a
downstream ``sort``/``repartition`` on ``zkey`` makes per-file min-max
stats selective for all of them at once.

The kernel is pure integer bit arithmetic — vectorized numpy on the
Ray side, a ``SUM over bit positions`` expression in SQL — so the
distributed result is exactly oracle-checkable (no floats anywhere).
Values are clamped to ``[0, 2^bits - 1]`` per dimension (documented,
mirrored in the oracle); the scan is shuffle-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def morton_interleave(cols: list[np.ndarray], bits: int) -> np.ndarray:
    """Interleave ``bits`` low bits of each int64 array (dimension j's
    bit i lands at position ``i * len(cols) + j``). Inputs are clamped
    to [0, 2^bits - 1]. Requires ``bits * len(cols) <= 63`` (the key
    stays a non-negative int64)."""
    k = len(cols)
    if bits * k > 63:
        raise ValueError(f"{k} dims x {bits} bits exceeds a positive int64")
    hi = np.int64((1 << bits) - 1)
    out = np.zeros(len(cols[0]), dtype=np.int64)
    for j, c in enumerate(cols):
        v = np.clip(c.astype(np.int64, copy=False), 0, hi)
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * k + j)
    return out


def zorder_keys(
    ds,
    dims: list[str],
    bits: int = 21,
    id_col: str = "doc_id",
):
    """Shuffle-free scan: Dataset[(id_col, zkey: int64)]. Sort or
    range-partition the table by ``zkey`` downstream to cluster output
    files along every dimension in ``dims`` at once."""

    def key_batch(batch: pa.Table) -> pa.Table:
        cols = [
            np.asarray(batch.column(d).to_numpy(zero_copy_only=False))
            for d in dims
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "zkey": pa.array(morton_interleave(cols, bits), pa.int64()),
            }
        )

    return ds.map_batches(key_batch, batch_format="pyarrow")
