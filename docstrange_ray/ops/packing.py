"""Token-stream packing: the concatenate-and-chunk pretraining layout.

LM pretraining consumes documents as ONE logical token stream cut into
fixed-size context windows (GPT-2/3 style "sequence packing"). The
mapping every doc needs is its START OFFSET in that stream — a global
ordered prefix sum, which Ray Data has no primitive for. This module
implements it as the classic two-pass distributed scan:

1. token counts per doc — shuffle-free scan over the corpus; only the
   (doc_id, n_tokens) projection (16 bytes/row) goes further, the text
   never moves again.
2. range-bucket the projection by doc_id (uniform min/max split —
   deterministic; production would sample quantile boundaries exactly
   like Ray's sort does, the plumbing is identical), aggregate
   per-bucket token totals (B tiny rows), exclusive-scan them on the
   driver, broadcast the B bucket base offsets.
3. ONE shuffle of the projection keyed by bucket; each block sorts its
   buckets' rows by doc_id and adds cumsum + broadcast base.

Output: (doc_id, n_tokens, start_offset, shard_id) with
``shard_id = start_offset // budget`` — the context window the doc
starts in. All-integer arithmetic: exactly reproducible at any
parallelism and vs the SQL window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _token_counts(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Whitespace token count per doc (same rule as ops.textstats
    token_stats / the token_count oracle)."""
    text = batch.column(text_col)
    trimmed = pc.utf8_trim_whitespace(text)
    words = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    n = pc.list_value_length(words).cast(pa.int64())
    # '' splits to [''] -> count 0, not 1
    empty = pc.equal(trimmed, "")
    n = pc.if_else(empty, pa.scalar(0, pa.int64()), n)
    return pa.Table.from_arrays([batch.column(id_col), n], names=[id_col, "n_tokens"])


def pack_offsets(
    ds,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
):
    """(doc_id, n_tokens, start_offset, shard_id) for the doc_id-ordered
    concatenated token stream. ``budget`` = tokens per context window."""
    import ray.data

    from docstrange_ray.shuffle import _cluster_cpus, adaptive_final, grouped_blocks

    if num_buckets is None:
        num_buckets = max(8, _cluster_cpus())

    toks = ds.map_batches(
        lambda b: _token_counts(b, id_col, text_col), batch_format="pyarrow"
    ).materialize()  # tiny projection; consumed by two passes

    lohi = toks.aggregate(
        ray.data.aggregate.Min(id_col), ray.data.aggregate.Max(id_col)
    )
    lo, hi = lohi[f"min({id_col})"], lohi[f"max({id_col})"]
    if lo is None:
        return toks.map_batches(
            lambda b: b.append_column(
                "start_offset", pa.array([], pa.int64())
            ).append_column("shard_id", pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    width = max(1, (int(hi) - int(lo) + num_buckets) // num_buckets)

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return (ids - lo) // width

    def tag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        return batch.append_column("bucket", pa.array(bucket_of(ids), type=pa.int64()))

    tagged = toks.map_batches(tag, batch_format="pyarrow")

    # pass 2a: per-bucket totals (B tiny rows) -> driver exclusive scan
    def bucket_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "bucket": np.asarray(batch.column("bucket"), dtype=np.int64),
                "t": np.asarray(batch.column("n_tokens"), dtype=np.int64),
            }
        )
        return df.groupby("bucket", as_index=False)["t"].sum()

    totals = (
        adaptive_final(
            tagged.map_batches(bucket_partial, batch_format="pyarrow"),
            lambda df: df.groupby("bucket", as_index=False)["t"].sum(),
            keys=["bucket"],
        ).to_pandas()
    ).sort_values("bucket")
    base = {}
    acc = 0
    for _, r in totals.iterrows():
        base[int(r["bucket"])] = acc
        acc += int(r["t"])

    import ray

    base_ref = ray.put(base)

    # pass 2b: ONE projection shuffle by bucket; in-bucket cumsum + base
    def scan_block(df: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        frames = []
        for b, g in df.groupby("bucket", sort=True):
            g = g.sort_values(id_col)
            csum = g["n_tokens"].cumsum().shift(fill_value=0)
            start = csum.to_numpy(dtype=np.int64) + bases[int(b)]
            frames.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "n_tokens": g["n_tokens"].to_numpy(),
                        "start_offset": start,
                        "shard_id": start // budget,
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "start_offset": pd.Series([], dtype="int64"),
                    "shard_id": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    return grouped_blocks(tagged, ["bucket"], scan_block, batch_format="pandas")
