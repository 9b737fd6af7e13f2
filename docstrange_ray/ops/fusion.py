"""Reciprocal-rank fusion of corpus-wide rankings.

Curation pipelines rank the same corpus by several independent quality
signals (length, LM score, dedup priority, retrieval score) and need
ONE consensus order. Reciprocal Rank Fusion (Cormack, Clarke &
Buettcher 2009) is the standard scale-free combiner:

    rrf(d) = sum_j 1 / (k + rank_j(d))        (k = 60 in the paper)

It ignores score calibration entirely (only ranks cross the fuse), so
signals with wildly different distributions compose without tuning.

Determinism contract: the per-document terms are added in the FIXED
ranking-list order (left-associated float64 adds), and each term is the
single IEEE division 1/(k + rank), so the distributed result is
bit-identical to the SQL expression ``1/(k+r0) + 1/(k+r1) + ...``.
Documents missing from a ranking (bounded candidate lists) contribute
exactly 0 for that ranking — standard RRF semantics.

Scale shape: rankings are tagged with their list index in a scan, then
ONE id-key exchange co-locates each document's rank rows; the combine
is a vectorized pivot + fixed-order column adds. Ranks themselves come
from whatever produced them (``shuffle.global_row_number`` for exact
full-corpus window ranks, block-local top-k lists for retrieval).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.shuffle import grouped_blocks


def rrf_fuse(
    rankings: list,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    num_partitions: int | None = None,
):
    """Fuse ordered ``rankings`` (Datasets of (id_col, rank_col)) into
    Dataset[(id_col, rrf: float64)] — see module docstring for the
    exactness and scale contract."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    n_lists = len(rankings)

    def tag(j):
        def f(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    batch.column(id_col),
                    pa.compute.cast(batch.column(rank_col), pa.int64()),
                    pa.array(np.full(batch.num_rows, j, dtype=np.int8)),
                ],
                names=[id_col, "r", "src"],
            )

        return f

    tagged = rankings[0].map_batches(tag(0), batch_format="pyarrow")
    for j in range(1, n_lists):
        tagged = tagged.union(
            rankings[j].map_batches(tag(j), batch_format="pyarrow")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(
            index=id_col, columns="src", values="r", aggfunc="min"
        )
        acc = np.zeros(len(wide))
        for j in range(n_lists):  # FIXED order: left-associated adds
            if j in wide.columns:
                # float64 view: ranks < 2^53 are exact, and a no-missing
                # column arrives int64 (np.isnan rejects ints)
                r = wide[j].to_numpy(dtype=np.float64, na_value=np.nan)
                term = np.where(np.isnan(r), 0.0, 1.0 / (k + r))
            else:
                term = 0.0
            acc = acc + term
        return pd.DataFrame({id_col: wide.index.to_numpy(), "rrf": acc})

    return grouped_blocks(
        tagged, [id_col], combine, num_partitions, batch_format="pandas"
    )
