"""Deterministic corpus sampling.

``ds.random_shuffle`` / ``random_sample`` are seed-dependent and
ordering-dependent across cluster sizes; a 10^12-doc training pipeline
needs samples that are REPRODUCIBLE and resumable — a pure function of
the row key. ``hash_sample`` keeps a row iff the first 4 hex chars of
md5(key) fall below the fraction threshold: stable across processes,
partitionings and cluster sizes, trivially SQL-expressible for the
oracle, and composable (disjoint fractions -> disjoint splits).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _threshold_hex(fraction: float) -> str:
    """4-hex-char threshold compared lexicographically against md5
    prefixes. fraction >= 1.0 maps to 'g' — a character above every hex
    digit — so the comparison keeps ALL rows (the naive '10000' is
    5 chars and lexicographically BELOW most 4-char prefixes, which
    would silently keep only ~6% of rows at the full-fraction edge)."""
    n = int(fraction * 65536)
    if n >= 65536:
        return "g"
    return format(max(0, n), "04x")


def hash_sample(ds, fraction: float, key: str = "doc_id"):
    """Deterministic Bernoulli sample of ~``fraction`` of rows by key
    hash. SQL equivalent:
    ``WHERE substr(md5(CAST(key AS VARCHAR)), 1, 4) < '<hex threshold>'``."""
    thr = _threshold_hex(fraction)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [
                hashlib.md5(str(k).encode("utf-8")).hexdigest()[:4] < thr
                for k in batch.column(key).to_pylist()
            ]
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_cap(
    ds,
    strata_key: str,
    cap: int,
    id_key: str = "doc_id",
    num_partitions: int | None = None,
):
    """Balanced subsampling: keep at most ``cap`` rows per stratum
    (source / language / domain), chosen DETERMINISTICALLY as the cap
    lowest md5(id) hashes within each stratum — stable across cluster
    sizes and resumable, like every sampler here.

    Hot-stratum safe by partial reduction: each batch locally keeps its
    cap lowest-hash rows per stratum BEFORE the exchange, so a stratum
    with a billion rows ships ``n_batches x cap`` candidate rows — never
    the stratum — through the ONE strata-key shuffle; the block-local
    final applies the same rule to the candidates. SQL equivalent:
    ``ROW_NUMBER() OVER (PARTITION BY strata ORDER BY md5(id), id) <= cap``.
    Returns Dataset[(strata_key, id_key, sample_rank)]."""
    import pandas as pd

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local_cap(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                strata_key: batch.column(strata_key).to_pylist(),
                id_key: batch.column(id_key).to_pylist(),
            }
        )
        df["__h"] = [
            hashlib.md5(str(k).encode("utf-8")).hexdigest() for k in df[id_key]
        ]
        return (
            df.sort_values(["__h", id_key])
            .groupby(strata_key, as_index=False, sort=False)
            .head(cap)
        )

    def final_cap(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(["__h", id_key])
            .groupby(strata_key, as_index=False, sort=False)
            .head(cap)
            .sort_values([strata_key, "__h", id_key])
        )
        out["sample_rank"] = out.groupby(strata_key, sort=False).cumcount() + 1
        return out[[strata_key, id_key, "sample_rank"]]

    candidates = ds.map_batches(arrow_out(local_cap), batch_format="pyarrow")
    return grouped_blocks(
        candidates, [strata_key], final_cap, num_partitions, batch_format="pandas"
    )


def hash_split(ds, train_fraction: float, key: str = "doc_id"):
    """Deterministic train/holdout split: (train_ds, holdout_ds), disjoint
    and exhaustive, stable under any re-partitioning. Each side is its
    own lazy Dataset (the input plan is shared; two consumers)."""
    thr = _threshold_hex(train_fraction)

    def side(below: bool):
        def keep(batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [
                    (hashlib.md5(str(k).encode("utf-8")).hexdigest()[:4] < thr) == below
                    for k in batch.column(key).to_pylist()
                ]
            )
            return batch.filter(mask)

        return keep

    return (
        ds.map_batches(side(True), batch_format="pyarrow"),
        ds.map_batches(side(False), batch_format="pyarrow"),
    )
