"""Distributed statistical tests over bounded-cardinality columns:
chi-square independence, two-sample Kolmogorov-Smirnov, Mann-Whitney U
(rank-sum), and Welch's unequal-variance t.

Both are one-pre-reduced-exchange shapes (the contingency table /
value histogram is what crosses the wire, never rows) and both keep
every reduction in EXACT INTEGERS so the distributed result is
bit-equal to a SQL oracle by construction (the fixed-point-PageRank
discipline):

  * chi-square: each cell's term (O - E)^2 / E with E = row*col/n is
    the rational (O*n - row*col)^2 / (n*row*col); it is quantized to a
    micro-unit integer with FLOOR division BEFORE the sum (quantize-
    before-reduce — float term sums would be order-dependent). The
    <= 1e-6-per-cell quantization is a documented, deterministic bias,
    irrelevant at test-statistic magnitudes.
  * KS: D = max_v |F_a(v) - F_b(v)| compared by CROSS-MULTIPLICATION
    (|cum_a*n_b - cum_b*n_a| over the common denominator n_a*n_b) so
    the argmax is exact integer arithmetic; only the final reported
    statistic is a (mirrored, rounded) float.

Cardinality contract: the exchange carries the DISTINCT value/cell
histogram (group_quantiles' contract) — right for label/category/
length-like domains; continuous domains should be binned first.

The reference has no statistics module at all; this family serves the
corpus-curation questions ("is quality independent of source?", "did
the length distribution drift between snapshots?") that a 100-TB
pipeline answers before retraining.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

CHI2_SCALE = 1_000_000


def contingency_counts(ds, col_a: str, col_b: str, num_partitions=None):
    """Dataset[(a, b, cnt)] — the pre-reduced contingency exchange:
    per-block pair counts before ONE hash exchange."""
    from docstrange_ray.shuffle import adaptive_final, arrow_out

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([col_a, col_b]).to_pandas().dropna()
        out = df.groupby([col_a, col_b], as_index=False).size()
        return out.rename(columns={"size": "cnt", col_a: "a", col_b: "b"})

    return adaptive_final(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        lambda df: df.groupby(["a", "b"], as_index=False)["cnt"].sum(),
        keys=["a", "b"],
        num_partitions=num_partitions,
    )


def chi2_independence(ds, col_a: str, col_b: str, num_partitions=None):
    """Pearson chi-square test of independence between two bounded-
    cardinality columns. Returns a one-row DataFrame
    [(n, rows, cols, dof, chi2_micro)] where ``chi2_micro`` is the
    exact integer Σ_cells floor(1e6 * (O*n - row*col)^2 / (n*row*col))
    — see module docstring for why the quantization happens per cell.
    """
    ct = contingency_counts(ds, col_a, col_b, num_partitions).to_pandas()
    if ct.empty:
        return pd.DataFrame(
            columns=["n", "rows", "cols", "dof", "chi2_micro"]
        )
    ra = ct.groupby("a")["cnt"].sum().to_dict()
    cb = ct.groupby("b")["cnt"].sum().to_dict()
    n = int(ct["cnt"].sum())
    # observed-cell lookup built ONCE (O(cells)), not re-filtered per
    # row category; every a x b combination contributes, including
    # zero-observed cells
    obs = ct.set_index(["a", "b"])["cnt"].to_dict()
    chi2_micro = 0
    for av, rtot in ra.items():
        rt = int(rtot)
        for bv, ctot in cb.items():
            o = int(obs.get((av, bv), 0))
            ctt = int(ctot)
            num = o * n - rt * ctt
            chi2_micro += (CHI2_SCALE * num * num) // (n * rt * ctt)
    return pd.DataFrame(
        {
            "n": pd.Series([n], dtype="int64"),
            "rows": pd.Series([len(ra)], dtype="int64"),
            "cols": pd.Series([len(cb)], dtype="int64"),
            "dof": pd.Series([(len(ra) - 1) * (len(cb) - 1)], dtype="int64"),
            "chi2_micro": pd.Series([chi2_micro], dtype="int64"),
        }
    )


def _two_sample_hist(
    ds, value_col, group_col, group_a, group_b, num_partitions=None
):
    """Dataset[(v, ca, cb)] — the shared two-sample pre-reduced value
    histogram exchange (KS and Mann-Whitney both reduce over it)."""
    from docstrange_ray.shuffle import adaptive_final, arrow_out

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([value_col, group_col]).to_pandas().dropna()
        df = df[df[group_col].isin([group_a, group_b])]
        g = df.groupby([value_col, group_col], as_index=False).size()
        out = pd.DataFrame(
            {
                "v": g[value_col],
                "ca": np.where(g[group_col] == group_a, g["size"], 0),
                "cb": np.where(g[group_col] == group_b, g["size"], 0),
            }
        )
        return out.groupby("v", as_index=False)[["ca", "cb"]].sum()

    return adaptive_final(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        lambda df: df.groupby("v", as_index=False)[["ca", "cb"]].sum(),
        keys=["v"],
        num_partitions=num_partitions,
    )


def ks_two_sample(
    ds,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    num_partitions=None,
):
    """Two-sample Kolmogorov-Smirnov distance between ``value_col``'s
    distributions under two group labels. ONE pre-reduced exchange of
    (value, cnt_a, cnt_b); the final sorts the merged histogram once
    and takes D = max |cum_a*n_b - cum_b*n_a| / (n_a*n_b) with the max
    found in exact integers. Returns a one-row DataFrame
    [(n_a, n_b, d_num, d)] — ``d_num`` the exact integer numerator,
    ``d`` the mirrored 6dp float.
    """
    from docstrange_ray.numerics import round6
    from docstrange_ray.shuffle import coalesced_blocks

    hist = _two_sample_hist(
        ds, value_col, group_col, group_a, group_b, num_partitions
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v")
        na = int(df["ca"].sum())
        nb = int(df["cb"].sum())
        if na == 0 or nb == 0:
            return pd.DataFrame(columns=["n_a", "n_b", "d_num", "d"])
        # exact: |cum_a*n_b - cum_b*n_a|, common denominator n_a*n_b.
        # object dtype keeps the products in Python bignums (1e12-scale
        # cumsums x counts overflow int64 at corpus scale).
        ca = df["ca"].to_numpy(dtype=object).cumsum()
        cbm = df["cb"].to_numpy(dtype=object).cumsum()
        diffs = np.abs(ca * nb - cbm * na)
        d_num = int(max(diffs))
        if d_num >= 1 << 63:
            # the exact-integer witness column is int64-bounded (as is
            # the BIGINT oracle): past ~3e9 rows PER GROUP, report the
            # statistic from a quantile-binned or sampled column instead
            raise ValueError(
                f"ks_two_sample: exact D numerator {d_num} exceeds "
                "int64 (group sizes ~> 3e9); bin or sample the column"
            )
        # mirror SQL's evaluation exactly: CAST num AS DOUBLE, CAST den
        # AS DOUBLE, divide — two RN conversions, not Python's single
        # correctly-rounded bignum division (differs past 2^53)
        return pd.DataFrame(
            {
                "n_a": pd.Series([na], dtype="int64"),
                "n_b": pd.Series([nb], dtype="int64"),
                "d_num": pd.Series([d_num], dtype="int64"),
                "d": [float(round6(float(d_num) / float(na * nb)))],
            }
        )

    out = coalesced_blocks(hist, final).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["n_a", "n_b", "d_num", "d"])
    return out


def mann_whitney_u(
    ds,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    num_partitions=None,
):
    """Mann-Whitney U (Wilcoxon rank-sum) statistic between two groups
    — the nonparametric location test (does group_a stochastically
    dominate group_b?). Shares :func:`_two_sample_hist`'s ONE
    pre-reduced exchange; the final computes the DOUBLED statistic
    exactly in integers over the sorted histogram:

        2*U_a = Σ_v ca[v] * (2 * #{b strictly below v} + cb[v])

    (each strictly-won pair counts 2, each tie counts 1 — so ties never
    force a float). Also emits the tie-correction term Σ(t³ - t) for a
    normal-approximation consumer. ``u2_a + u2_b = 2 * n_a * n_b`` by
    construction (pinned in tests). int64-bounded like ks_two_sample's
    witness (explicit error past ~3e9 rows per group, matching the
    BIGINT oracle's own bound).

    Returns a one-row DataFrame [(n_a, n_b, u2_a, u2_b, tie_term, u_a)]
    — ``u_a`` = u2_a/2 as an (exactly representable) double.
    """
    from docstrange_ray.shuffle import coalesced_blocks

    hist = _two_sample_hist(
        ds, value_col, group_col, group_a, group_b, num_partitions
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v")
        na = int(df["ca"].sum())
        nb = int(df["cb"].sum())
        if na == 0 or nb == 0:
            return pd.DataFrame(
                columns=["n_a", "n_b", "u2_a", "u2_b", "tie_term", "u_a"]
            )
        ca = [int(x) for x in df["ca"]]
        cb = [int(x) for x in df["cb"]]
        below_b = 0
        below_a = 0
        u2a = 0
        u2b = 0
        tie = 0
        for a_c, b_c in zip(ca, cb):
            u2a += a_c * (2 * below_b + b_c)
            u2b += b_c * (2 * below_a + a_c)
            t = a_c + b_c
            if t > 1:
                tie += t * t * t - t
            below_b += b_c
            below_a += a_c
        if max(u2a, u2b, tie) >= 1 << 63:
            raise ValueError(
                "mann_whitney_u: exact statistic exceeds int64 "
                "(group sizes ~> 2e9); bin or sample the column"
            )
        return pd.DataFrame(
            {
                "n_a": pd.Series([na], dtype="int64"),
                "n_b": pd.Series([nb], dtype="int64"),
                "u2_a": pd.Series([u2a], dtype="int64"),
                "u2_b": pd.Series([u2b], dtype="int64"),
                "tie_term": pd.Series([tie], dtype="int64"),
                "u_a": [float(u2a) / 2.0],
            }
        )

    out = coalesced_blocks(hist, final).to_pandas()
    if out.empty:
        return pd.DataFrame(
            columns=["n_a", "n_b", "u2_a", "u2_b", "tie_term", "u_a"]
        )
    return out


def auc_score(ds, score_col, label_col, num_partitions=None):
    """ROC AUC of ``score_col`` as a ranking of the binary
    ``label_col`` (1 = positive), via the rank-sum identity
    AUC = U_pos / (n_pos * n_neg) — i.e. ``mann_whitney_u`` with the
    label as the group column, so it inherits the ONE pre-reduced
    value-histogram exchange and the exact tie handling (a tied
    (pos, neg) pair contributes exactly 1/2).  Same cardinality
    contract: the score must be a bounded integer domain (bin
    continuous model scores first, e.g. to 6dp micro-units).

    Returns one row [(n_pos, n_neg, auc2_num, auc_micro, auc)]:
    ``auc2_num`` = 2*U_pos exactly; ``auc_micro`` =
    (10**6 * auc2_num) // (2*n_pos*n_neg) (floor-quantized — the SQL
    mirror's HUGEINT arithmetic); ``auc`` the one-division double
    (exact in IEEE on both sides while the integers stay < 2^53)."""
    u = mann_whitney_u(ds, score_col, label_col, 1, 0, num_partitions)
    cols = ["n_pos", "n_neg", "auc2_num", "auc_micro", "auc"]
    if u.empty:
        return pd.DataFrame(columns=cols)
    np_, nn = int(u["n_a"].iloc[0]), int(u["n_b"].iloc[0])
    u2 = int(u["u2_a"].iloc[0])
    den = 2 * np_ * nn
    return pd.DataFrame(
        {
            "n_pos": pd.Series([np_], dtype="int64"),
            "n_neg": pd.Series([nn], dtype="int64"),
            "auc2_num": pd.Series([u2], dtype="int64"),
            "auc_micro": pd.Series([(1_000_000 * u2) // den], dtype="int64"),
            "auc": [float(u2) / float(den)],
        }
    )


def welch_t(
    ds,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    to_int=None,
    num_partitions=None,
):
    """Welch's unequal-variance t statistic between two groups from ONE
    integer sufficient-statistics scan (the :func:`group_corr`
    machinery: per-block (n, Σx, Σx²) bignum partials per group, sums
    cross the exchange as decimal strings). The final float chain is
    mirrored step-for-step against SQL (CAST-DOUBLE divisions, SQRT,
    ROUND 6), so ``t`` and the Welch-Satterthwaite ``dof`` are
    bit-equal to the oracle:

        var_i = (n_i*Σx² - Σx²ᵢ) / n_i   [as DOUBLE]  / (n_i - 1)
        se2_i = var_i / n_i
        t     = (mean_a - mean_b) / sqrt(se2_a + se2_b)
        dof   = (se2_a+se2_b)² / (se2_a²/(n_a-1) + se2_b²/(n_b-1))

    ``to_int`` maps values to exact integer units first (default
    half-away round — ``numerics.to_int_units``). Degenerate inputs
    (either group < 2 rows or both variances zero) return empty.

    Returns a one-row DataFrame [(n_a, n_b, mean_a, mean_b, t, dof)] —
    means as mirrored 6dp unit floats.
    """
    import math

    from docstrange_ray.numerics import round6, to_int_units
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    if to_int is None:
        to_int = to_int_units()

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([value_col, group_col]).to_pandas().dropna()
        df = df[df[group_col].isin([group_a, group_b])]
        rows = []
        for gval, sub in df.groupby(group_col, sort=False):
            x = to_int(sub[value_col].to_numpy())
            # the group_corr chunk discipline: chunk length derived from
            # max|x| so every int64 chunk dot is PROVABLY under 2^62;
            # values past ~2^31 fall back to Python bignums
            mx = int(np.abs(x).max(initial=0))
            maxprod = max(mx * mx, 1)
            sx = sxx = 0
            if maxprod >= 1 << 62:
                xi = [int(v) for v in x]
                sx = sum(xi)
                sxx = sum(v * v for v in xi)
            else:
                step = max(1, min(65536, (1 << 62) // maxprod))
                for i in range(0, len(x), step):
                    c = x[i : i + step]
                    sx += int(c.sum())
                    sxx += int(np.dot(c, c))
            rows.append(
                {
                    "g": "a" if gval == group_a else "b",
                    "n": np.int64(len(x)),
                    "sx": str(sx),
                    "sxx": str(sxx),
                }
            )
        return pd.DataFrame(rows, columns=["g", "n", "sx", "sxx"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        stats = {}
        for gval, sub in df.groupby("g"):
            n = int(sub["n"].sum())
            sx = sum(int(v) for v in sub["sx"])
            sxx = sum(int(v) for v in sub["sxx"])
            stats[gval] = (n, sx, sxx)
        if "a" not in stats or "b" not in stats:
            return pd.DataFrame(
                columns=["n_a", "n_b", "mean_a", "mean_b", "t", "dof"]
            )
        (na, sxa, sxxa), (nb, sxb, sxxb) = stats["a"], stats["b"]
        if na < 2 or nb < 2:
            return pd.DataFrame(
                columns=["n_a", "n_b", "mean_a", "mean_b", "t", "dof"]
            )
        # mirrored double chain — every op below exists verbatim in the
        # SQL oracle, in the same order
        ma = float(sxa) / float(na)
        mb = float(sxb) / float(nb)
        vara = float(na * sxxa - sxa * sxa) / (float(na) * float(na - 1))
        varb = float(nb * sxxb - sxb * sxb) / (float(nb) * float(nb - 1))
        se2a = vara / float(na)
        se2b = varb / float(nb)
        if se2a + se2b == 0.0:
            return pd.DataFrame(
                columns=["n_a", "n_b", "mean_a", "mean_b", "t", "dof"]
            )
        t = (ma - mb) / math.sqrt(se2a + se2b)
        dof = (se2a + se2b) * (se2a + se2b) / (
            se2a * se2a / float(na - 1) + se2b * se2b / float(nb - 1)
        )
        return pd.DataFrame(
            {
                "n_a": pd.Series([na], dtype="int64"),
                "n_b": pd.Series([nb], dtype="int64"),
                "mean_a": [float(round6(ma))],
                "mean_b": [float(round6(mb))],
                "t": [float(round6(t))],
                "dof": [float(round6(dof))],
            }
        )

    partials = ds.map_batches(arrow_out(partial), batch_format="pyarrow")
    out = coalesced_blocks(partials, final).to_pandas()
    if out.empty:
        return pd.DataFrame(
            columns=["n_a", "n_b", "mean_a", "mean_b", "t", "dof"]
        )
    return out
