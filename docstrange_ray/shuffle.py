"""Shuffle utilities: hash-co-located, block-local grouped processing.

``groupby(key).map_groups(fn)`` invokes ``fn`` once per GROUP — at one
group per document (or per LSH bucket) that is millions of per-group
Python calls and dominates wall-clock. The scalable shape used across
this engine is instead:

    ds.repartition(P, keys=[...])        # ONE hash shuffle, keys co-located
      .map_batches(fn, batch_size=None)  # fn sees whole blocks and handles
                                         # all its groups vectorized

Key-based repartition requires Ray Data's hash-shuffle strategy;
``ensure_hash_shuffle()`` flips the ``DataContext`` (idempotent — also
speeds up ordinary groupbys vs the sort-based default).
"""

from __future__ import annotations


def _cluster_cpus(default: int = 8) -> int:
    import ray

    try:
        if ray.is_initialized():
            return max(2, int(ray.cluster_resources().get("CPU", default)))
    except Exception:  # noqa: BLE001
        pass
    return default


def ensure_hash_shuffle() -> None:
    """Idempotent: select HASH_SHUFFLE and size its aggregator pool to the
    cluster. The defaults (200 partitions / 64 aggregator actors) assume a
    large cluster and serialize a small node behind actor startup."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ncpu = _cluster_cpus()
    # Aggregators are block routers, not compute: a handful saturate a
    # node's network/memcpy, while one-per-CPU pays ~6s of actor spawn
    # per exchange and starves map stages of scheduling slots. Partition
    # count (parallelism) stays high for granularity; aggregators each
    # own several partitions.
    ctx.max_hash_shuffle_aggregators = max(4, ncpu // 4)
    ctx.default_hash_shuffle_parallelism = ncpu
    # Task granularity: Ray's 128 MiB default block target makes ONE
    # block = one map task; with this corpus's heavy-doc skew a single
    # 113 MiB block cost 66 s while its siblings took 5 s — a 13x
    # straggler tail that throttled the 1M-doc headline to 4.3k docs/s.
    # 32 MiB blocks restored per-doc cost flat across corpus size
    # (233 s -> 82 s at 1M docs, measured; BASELINE.md §4c). Smaller
    # blocks also bound per-task heap for span-heavy rows. Engine
    # constant, set once per session alongside the shuffle knobs.
    from docstrange_ray.config import TARGET_BLOCK_BYTES

    ctx.target_max_block_size = TARGET_BLOCK_BYTES


def _strip_schema_metadata(ds):
    """Drop Arrow schema metadata before an exchange. Blocks produced by
    ``batch_format="pandas"`` stages carry a ``b'pandas'`` metadata entry
    whose value Ray's schema-dedup cannot hash ("Failed to hash the
    schemas (for deduplication): unhashable type: 'dict'" spam on every
    HashShuffleAggregator, and schema dedup silently disabled).
    ``replace_schema_metadata(None)`` is zero-copy and the map fuses
    with the upstream stage."""

    def strip(batch):
        if batch.schema.metadata:
            return batch.replace_schema_metadata(None)
        return batch

    # batch_size=None: strip whole blocks — re-batching would itself
    # concat metadata-bearing blocks and trip the same warning upstream
    return ds.map_batches(strip, batch_format="pyarrow", batch_size=None)


def arrow_out(fn):
    """Wrap a batch UDF so its output enters Ray as a metadata-free Arrow
    block: pandas results are converted via ``from_pandas`` and the
    ``b'pandas'`` schema metadata (unhashable for Ray's schema dedup —
    see :func:`_strip_schema_metadata`) is dropped at the source."""
    import functools

    import pandas as pd
    import pyarrow as pa

    @functools.wraps(fn)
    def wrapped(batch):
        out = fn(batch)
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False)
        if isinstance(out, pa.Table) and out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    return wrapped


def hash_join(
    left,
    right,
    key: str,
    how: str = "inner",
    num_partitions: int | None = None,
):
    """Co-partitioned hash join for two LARGE sides: tag each side, align
    schemas (missing columns null), union, hash-repartition on ``key``
    (ONE shuffle moves both sides), and pandas-merge block-locally —
    every key's rows from both sides are guaranteed co-located. For a
    SMALL side prefer the broadcast pattern instead (ray.put + lookup in
    map_batches; see relational.py) — it moves nothing."""
    import pandas as pd
    import pyarrow as pa

    # normalize both sides to Arrow blocks so schema types are Arrow
    # DataTypes (pandas-backed datasets report numpy/object dtypes)
    left = left.map_batches(lambda b: b, batch_format="pyarrow")
    right = right.map_batches(lambda b: b, batch_format="pyarrow")
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    r_names = [n for n in r_schema.names if n != key]
    overlap = (set(l_names) - {key}) & set(r_names)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    types = {}
    for name, typ in zip(l_schema.names, l_schema.types):
        types[name] = typ
    for name, typ in zip(r_schema.names, r_schema.types):
        types.setdefault(name, typ)
    all_names = l_names + r_names
    combined = pa.schema(
        [(n, types[n]) for n in all_names] + [("__side", pa.int8())]
    )

    def tag(side: int, present: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            arrays = []
            for n in all_names:
                if n in present:
                    arrays.append(batch.column(n))
                else:
                    arrays.append(pa.nulls(batch.num_rows, type=types[n]))
            arrays.append(pa.array([side] * batch.num_rows, type=pa.int8()))
            return pa.Table.from_arrays(arrays, schema=combined)

        return fn

    tagged = left.map_batches(tag(0, l_names), batch_format="pyarrow").union(
        right.map_batches(tag(1, list(r_schema.names)), batch_format="pyarrow")
    )

    def merge_block(block: pa.Table) -> pd.DataFrame:
        # Split sides while still ARROW, then convert each side alone:
        # the union's null-padded columns would otherwise turn int64
        # into float64 in pandas (Arrow ints with nulls have no pandas
        # int representation), silently corrupting ids above 2^53 and
        # breaking joins keyed on exact integer equality downstream.
        import pyarrow.compute as pc

        side = block.column("__side")
        l = block.filter(pc.equal(side, 0)).select(l_names).to_pandas()
        r = block.filter(pc.equal(side, 1)).select([key] + r_names).to_pandas()
        return l.merge(r, on=key, how=how)

    return grouped_blocks(tagged, [key], merge_block, num_partitions)


def coalesced_blocks(ds, fn, batch_format: str = "pandas"):
    """Final-combine for BOUNDED-size intermediates: coalesce ``ds`` into
    one block (plain task-based repartition — no hash-shuffle aggregator
    pool) and apply ``fn`` once. Correct only when ``ds`` is already
    reduced to a bounded size (e.g. per-block partial aggregates over a
    bounded key space, or per-block top-k candidates: n_blocks x n_keys
    rows). For unbounded key cardinality use :func:`grouped_blocks` — the
    real shuffle. Saves the aggregator-pool startup (~6s measured) that
    dominates small finals."""
    return _strip_schema_metadata(ds).repartition(1).map_batches(
        arrow_out(fn), batch_format=batch_format, batch_size=None
    )


def adaptive_final(
    partials,
    fn,
    keys: list[str],
    max_coalesced_rows: int = 200_000,
    num_partitions: int | None = None,
    batch_format: str = "pandas",
):
    """Final combine that VERIFIES the bounded-intermediate assumption
    instead of assuming it. ``coalesced_blocks`` is only correct when the
    partials stay small — but key spaces like event_type x hour GROW with
    the corpus's time span, so the bound eventually breaks. Plan:
    materialize the partials (tiny when the assumption holds; spilled to
    the object store, never the driver, when it doesn't), count for free,
    and pick the single-block coalesce under the bound or the real hash
    shuffle (:func:`grouped_blocks`) above it. ``fn`` must be a
    per-block group-combine (works for both shapes: in the coalesced
    case the one block holds all keys; in the grouped case each block
    holds complete key groups)."""
    mat = _strip_schema_metadata(partials).materialize()
    if mat.count() <= max_coalesced_rows:
        return coalesced_blocks(mat, fn, batch_format)
    return grouped_blocks(mat, keys, fn, num_partitions, batch_format)


def grouped_blocks(
    ds,
    keys: list[str],
    fn,
    num_partitions: int | None = None,
    batch_format: str = "pyarrow",
):
    """Hash-co-locate rows by ``keys`` into ``num_partitions`` blocks
    and apply ``fn`` to each whole block (every key's rows are
    guaranteed to be in exactly one block). ``fn`` must do its own
    within-block grouping (vectorized).

    Partition sizing: the default (cluster CPU count) keeps every
    combine slot busy while minimizing per-partition fixed cost
    (measured ~30ms/partition/exchange on this host — 64 partitions
    cost ~2s more than 8 on a fixture-scale exchange). Production
    callers MUST size ``num_partitions`` to the DATA instead
    (>= input_bytes / target_partition_bytes, and >= 4x max
    parallelism) — one partition's rows must fit a worker's heap, which
    no cluster-relative default can guarantee at 100 TB."""
    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = max(8, _cluster_cpus())
    return _strip_schema_metadata(ds).repartition(num_partitions, keys=keys).map_batches(
        arrow_out(fn), batch_format=batch_format, batch_size=None
    )


def global_row_number(
    ds,
    key: str,
    descending: bool = False,
    tiebreak: str = "doc_id",
    num_partitions: int | None = None,
    candidates_per_block: int = 64,
    rank_kind: str = "row_number",
):
    """Distributed global ROW_NUMBER() / RANK() / DENSE_RANK() OVER
    (ORDER BY key [DESC], tiebreak ASC) — the window shapes that
    genuinely need a global sort. ``rank_kind`` selects the semantics;
    RANK and DENSE_RANK are exact because equal keys are never split
    across buckets, so tie groups resolve block-locally and the driver
    only needs per-bucket row counts (RANK) or per-bucket distinct-key
    counts (DENSE_RANK) for the offsets. Ray Data's ``Dataset.sort`` range-partitions too, but gives no
    way to learn a block's global offset inside ``map_batches``, so the
    range exchange is explicit here:

    1. **Boundary sampling** — every block emits up to
       ``candidates_per_block`` evenly-spaced local key values (bounded:
       n_blocks x C scalars to the driver), which are merged into
       ``num_partitions - 1`` range boundaries.
    2. **ONE range exchange** — each row's bucket is a vectorized
       ``np.searchsorted`` against the boundaries; equal keys always
       land in the same bucket, so bucket order is consistent with key
       order without comparing the tiebreak at the boundary.
    3. **Bounded count pass** — per-bucket row counts (<= num_partitions
       scalars) come back to the driver and prefix-sum into offsets.
    4. **Rank emit** — each co-located block sorts its complete buckets
       by (key, tiebreak) and emits ``rank = bucket_offset + position``;
       no further exchange.

    The bucketed dataset is materialized once (any global sort
    materializes its exchange; blocks spill to the object store, never
    the driver). Skew note: ties on ``key`` are never split across
    buckets, so a value holding >1/num_partitions of the corpus makes a
    hot bucket — pass a higher-cardinality key (or pre-compose
    key+tiebreak into one column) for heavy-tie domains. ``key`` must
    be integer-valued (boundaries are int64 end to end — float64 would
    collapse keys above 2^53); rank string keys by first mapping them
    to an order-preserving int64 (e.g. a dictionary-encode + broadcast
    of the sorted vocabulary) or extend the boundary comparison.

    Returns Dataset[input columns + rank:int64] (1-based, dense)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    sign = -1 if descending else 1

    def candidates(batch: pa.Table) -> pd.DataFrame:
        vals = np.asarray(batch.column(key).to_numpy(zero_copy_only=False))
        if not len(vals):
            return pd.DataFrame({"v": pd.Series([], dtype="int64")})
        vals = np.sort(sign * vals.astype(np.int64))
        take = np.linspace(0, len(vals) - 1, min(candidates_per_block, len(vals)))
        # int64 end to end: float64 boundaries would collapse keys >2^53
        return pd.DataFrame({"v": vals[take.astype(int)]})

    cand = np.sort(
        np.array(
            [
                r["v"]
                for r in ds.map_batches(
                    arrow_out(candidates), batch_format="pyarrow", batch_size=65536
                ).take_all()
            ],
            dtype=np.int64,
        )
    )
    if num_partitions is None:
        num_partitions = max(8, _cluster_cpus())
    if len(cand):
        picks = np.linspace(0, len(cand) - 1, num_partitions + 1)[1:-1]
        bounds = np.unique(cand[picks.astype(int)])
    else:
        bounds = np.array([], dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        vals = sign * np.asarray(
            batch.column(key).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        b = np.searchsorted(bounds, vals, side="right")
        return batch.append_column("__bucket", pa.array(b.astype(np.int32)))

    ensure_hash_shuffle()
    coloc = (
        _strip_schema_metadata(
            ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)
        )
        .repartition(int(len(bounds)) + 1, keys=["__bucket"])
        .materialize()
    )

    if rank_kind not in ("row_number", "rank", "dense_rank"):
        raise ValueError(f"unknown rank_kind {rank_kind!r}")

    def counts(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "bucket": batch.column("__bucket").to_numpy(),
                "k": batch.column(key).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("bucket")["k"].agg(["size", "nunique"]).reset_index()
        return pd.DataFrame(
            {
                "bucket": g["bucket"].astype(np.int64),
                "n": g["size"].astype(np.int64),
                "nd": g["nunique"].astype(np.int64),
            }
        )

    per_bucket: dict[int, list[int]] = {}
    for r in coloc.map_batches(
        arrow_out(counts), batch_format="pyarrow", batch_size=None
    ).take_all():  # bounded: <= num_partitions rows
        cur = per_bucket.setdefault(int(r["bucket"]), [0, 0])
        cur[0] += int(r["n"])
        cur[1] += int(r["nd"])
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b][1] if rank_kind == "dense_rank" else per_bucket[b][0]

    def rank_block(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if not len(df):
            return df.drop(columns=["__bucket"]).assign(
                rank=pd.Series([], dtype="int64")
            )
        df["__k"] = sign * df[key].to_numpy().astype(np.int64)
        df = df.sort_values(["__bucket", "__k", tiebreak]).reset_index(drop=True)
        ranks = np.empty(len(df), dtype=np.int64)
        pos = 0
        for b, size in df.groupby("__bucket", sort=True).size().items():
            off = offsets[int(b)]
            if rank_kind == "row_number":
                ranks[pos : pos + size] = off + 1 + np.arange(size)
            else:
                k = df["__k"].to_numpy()[pos : pos + size]
                first = np.r_[True, k[1:] != k[:-1]]
                if rank_kind == "rank":
                    # ties share the rank of their first row
                    fp = np.arange(size)[first]
                    reps = np.diff(np.r_[fp, size])
                    ranks[pos : pos + size] = off + 1 + np.repeat(fp, reps)
                else:  # dense_rank
                    ranks[pos : pos + size] = off + np.cumsum(first)
            pos += size
        df["rank"] = ranks
        return df.drop(columns=["__bucket", "__k"])

    return coloc.map_batches(
        arrow_out(rank_block), batch_format="pyarrow", batch_size=None
    )
