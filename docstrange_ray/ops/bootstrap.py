"""Poisson bootstrap: distributed confidence intervals without
resampling shuffles.

The classical bootstrap resamples n rows WITH replacement per
replicate — undistributable at 100 TB (each replicate is a full
shuffle). The Poisson bootstrap (Chamandy et al. 2012, "Estimating
Uncertainty for Massive Data Streams" — the production trick behind
large-scale A/B metrics) replaces multinomial resampling with an
independent Poisson(1) weight per (row, replicate): every replicate's
weighted aggregate is computable in the SAME one streaming pass as the
plain aggregate, with zero data movement beyond bounded per-batch
partials (replicates x 3 integers).

Determinism/oracle contract:
  * the per-(row, replicate) weight is a pure function of
    ``md5_key52(f"{key}:{rep}")`` — the house deterministic-sampling
    idiom, reproducible at any parallelism and SQL-mirrorable;
  * the Poisson(1) inverse CDF uses FIXED integer thresholds
    ``_CDF52[k] = floor(CDF(k) * 2^52)`` (module constants, inlined
    verbatim into the SQL oracle) — weight = #{k: u >= _CDF52[k]},
    capped at 8 (P[w > 8] < 1e-6, dropped identically on both sides);
  * values ride int64 cents, so every reduction is an integer sum;
    the only float op is the final per-replicate mean division
    (+ round6), mirrored exactly.

Output is the PER-REPLICATE bootstrap means (replicates rows) rather
than a collapsed stderr: collapsing needs a float reduction across
replicates whose order SQL cannot pin, and callers want the replicate
distribution anyway (percentile CIs, not just normal-theory stderr).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import md5_key52, round6

# floor(Poisson(1).cdf(k) * 2^52) for k = 0..7 — weight = count of
# thresholds <= u52, i.e. the inverse CDF over a 52-bit uniform
_CDF52: tuple[int, ...] = tuple(
    math.floor(sum(math.exp(-1) / math.factorial(j) for j in range(k + 1)) * (1 << 52))
    for k in range(8)
)


def poisson_weight(u52: int) -> int:
    """Poisson(1) inverse CDF at a 52-bit uniform (exact integer
    comparisons against the module thresholds; capped at 8)."""
    return sum(1 for t in _CDF52 if u52 >= t)


def bootstrap_replicate_means(
    ds,
    key_col: str,
    value_col: str,
    replicates: int = 32,
    num_partitions: int | None = None,
):
    """Per-replicate Poisson-bootstrap means of ``value_col`` (in exact
    cents) — see module docstring. Returns pandas DataFrame
    [(rep, n_eff, mean_cents)]; percentile CIs / stderr are the
    caller's O(replicates) arithmetic."""
    from docstrange_ray.shuffle import adaptive_final, arrow_out

    cdf = _CDF52

    def partial(batch: pa.Table) -> pd.DataFrame:
        keys = batch.column(key_col).to_pylist()
        vals = np.asarray(
            batch.column(value_col).to_numpy(zero_copy_only=False), dtype=np.float64
        )
        cents = np.round(vals * 100).astype(np.int64)
        sw = np.zeros(replicates, dtype=np.int64)
        swc = np.zeros(replicates, dtype=np.int64)
        for k, c in zip(keys, cents):
            for r in range(replicates):
                u = md5_key52(f"{k}:{r}")
                w = 0
                for t in cdf:
                    if u >= t:
                        w += 1
                if w:
                    sw[r] += w
                    swc[r] += w * int(c)
        return pd.DataFrame(
            {
                "rep": np.arange(replicates, dtype=np.int64),
                "sw": sw,
                "swc": swc,
            }
        )

    sums = adaptive_final(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow"),
        lambda df: df.groupby("rep", as_index=False)[["sw", "swc"]].sum(),
        keys=["rep"],
        num_partitions=num_partitions,
    ).to_pandas()
    if "rep" not in sums.columns:  # empty dataset loses its schema
        return pd.DataFrame({"rep": [], "n_eff": [], "mean_cents": []})
    sums = sums.sort_values("rep").reset_index(drop=True)
    mean = np.where(
        sums["sw"] > 0, sums["swc"] / sums["sw"], 0.0
    )  # one IEEE division per replicate, mirrored in the oracle
    return pd.DataFrame(
        {
            "rep": sums["rep"].astype(np.int64),
            "n_eff": sums["sw"].astype(np.int64),
            "mean_cents": round6(mean),
        }
    )


def poisson_sql_weight_expr(u_expr: str) -> str:
    """The SQL mirror of :func:`poisson_weight` over a 52-bit uniform
    expression — the SAME integer thresholds, inlined verbatim."""
    terms = " + ".join(
        f"CASE WHEN {u_expr} >= {t} THEN 1 ELSE 0 END" for t in _CDF52
    )
    return f"({terms})"
