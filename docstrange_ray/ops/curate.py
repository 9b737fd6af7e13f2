"""Composed corpus-curation pipeline: quality filter → exact dedup.

The end-to-end shape of a training-data cleaning job: score and
fingerprint every document in ONE stateless pass (no intermediate
materialization), filter below-threshold docs before anything moves,
then exact-dedup the survivors with ONE content-hash shuffle
(first-wins). Only filtered (doc_id, content_md5, quality) triples ever
cross the exchange — never document text.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from docstrange_ray.ops.textstats import content_fingerprint, quality_score


def curated_docs(ds, min_quality: float = 0.5, num_partitions: int | None = None):
    """Dataset[(doc_id, text)] -> Dataset[(doc_id, content_md5, quality)]
    of kept documents: quality >= min_quality AND first (min doc_id) of
    its exact-content group."""
    from docstrange_ray.shuffle import grouped_blocks

    def score_fp_filter(batch: pa.Table) -> pd.DataFrame:
        scored = quality_score(batch)
        fp = content_fingerprint(batch)
        t = pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                fp.column("content_md5"),
                scored.column("quality"),
            ],
            names=["doc_id", "content_md5", "quality"],
        )
        df = t.filter(pc.greater_equal(t.column("quality"), min_quality)).to_pandas()
        # hot-key safety: local first-wins per batch bounds any one
        # content hash to n_batches rows through the exchange
        return df.sort_values(["content_md5", "doc_id"]).drop_duplicates(
            "content_md5", keep="first"
        )

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["content_md5", "doc_id"]).drop_duplicates(
            "content_md5", keep="first"
        )[["doc_id", "content_md5", "quality"]]

    filtered = ds.map_batches(score_fp_filter, batch_format="pyarrow")
    return grouped_blocks(
        filtered, ["content_md5"], keep_first, num_partitions, batch_format="pandas"
    )
