"""One-scan table profiler (data-quality stats).

Before a 100-TB corpus enters the pipeline you profile it: row count,
null rates, value ranges per column — the Deequ/great-expectations
first pass. The whole profile is ONE shuffle-free scan: every batch
emits one bounded partial row per column (count, null count, min,
max), and the final combine is a coalesced merge of
``n_blocks x n_columns`` rows. Nothing corpus-sized ever leaves the
scan.

Exactness contract (so the profile is SQL-oracle-checkable):
  * counts are int64 sums (order-independent);
  * min/max are comparison-only (order-independent for every type);
  * numeric columns report min/max as float64 (int64 values above
    2^53 would lose precision — documented; the fixture tables stay
    far below);
  * string columns profile by UTF-8 LENGTH (min/max length) — value
    min/max of strings is locale/collation-bait, lengths are exact
    ints; DuckDB ``length()`` counts code points like Python ``len``;
  * timestamp columns profile as epoch MICROSECONDS (exact ints);
  * all-null / zero-row columns emit NULL min/max (SQL aggregate
    semantics).

Returns one row per profiled column:
    (column: str, n: int64, n_null: int64, vmin: float64, vmax: float64)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _col_minmax(col: pa.ChunkedArray):
    """(n, n_null, vmin, vmax) for one column; None min/max when no
    valid values. Strings profile by length, timestamps by epoch us."""
    n = len(col)
    n_null = col.null_count
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        col = pc.utf8_length(col)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        col = pc.binary_length(col)
    elif pa.types.is_timestamp(t):
        col = pc.cast(col, pa.int64())  # epoch in the column's unit
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        col = pc.cast(col, pa.int32())  # storage type (days / time units)
    elif pa.types.is_date64(t) or pa.types.is_time64(t):
        col = pc.cast(col, pa.int64())
    elif pa.types.is_boolean(t):
        col = pc.cast(col, pa.int64())
    if n == n_null:
        return n, n_null, None, None
    try:
        mm = pc.min_max(col)
        return n, n_null, float(mm["min"].as_py()), float(mm["max"].as_py())
    except (pa.ArrowNotImplementedError, TypeError):
        # nested / otherwise unorderable types: counts only (the
        # docstring's 'everything else' promise must not kill the scan)
        return n, n_null, None, None


def profile_table(ds, columns: list[str] | None = None):
    """One-scan profile — see module docstring. ``columns`` defaults to
    every column of the first batch."""
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    def partial(batch: pa.Table) -> pd.DataFrame:
        cols = columns or batch.column_names
        rows = []
        for name in cols:
            n, n_null, vmin, vmax = _col_minmax(batch.column(name))
            rows.append((name, n, n_null, vmin, vmax))
        return pd.DataFrame(
            rows, columns=["column", "n", "n_null", "vmin", "vmax"]
        ).astype({"vmin": "float64", "vmax": "float64"})  # None -> NaN

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("column", as_index=False).agg(
            n=("n", "sum"),
            n_null=("n_null", "sum"),
            vmin=("vmin", "min"),
            vmax=("vmax", "max"),
        )
        g["n"] = g["n"].astype(np.int64)
        g["n_null"] = g["n_null"].astype(np.int64)
        return g.sort_values("column").reset_index(drop=True)

    partials = ds.map_batches(arrow_out(partial), batch_format="pyarrow")
    return coalesced_blocks(partials, combine, batch_format="pandas")
