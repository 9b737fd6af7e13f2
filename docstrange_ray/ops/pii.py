"""PII detection and redaction over a text column.

A first-class training-data op (the reference has no PII handling; this
is part of the large-scale-pipeline family alongside dedup/quality —
brief §"text analysis"). Both stages are pure per-batch Arrow RE2
kernels (``pyarrow.compute.count_substring_regex`` /
``replace_substring_regex``) — zero shuffles, zero Python loops, so the
op is scan-shaped and trivially scale-safe: redacting 100 TB is exactly
one streaming pass.

Pattern parity: Arrow's regex kernels and DuckDB's ``regexp_*`` are
both RE2, so the SAME pattern strings drive the engine and the SQL
oracle (no lookarounds used — RE2 has none). Redaction applies the
patterns in a FIXED order (email → ipv4 → ssn → phone) on both sides;
category counts are measured on the ORIGINAL text so they are
order-independent.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement token), applied in this order.
# Patterns deliberately avoid cross-matching: the phone alternatives
# require parentheses or the 3-3-4 shape, neither of which the 3-2-4
# SSN shape or a dotted IPv4 can satisfy.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"(\+?\d{1,2} ?)?\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_email, n_ipv4, n_ssn, n_phone, n_pii): non-overlapping
    leftmost match counts per category on the raw text."""
    col = batch.column("text")
    counts = [
        pc.cast(pc.count_substring_regex(col, pat), pa.int64())
        for _, pat, _ in PII_PATTERNS
    ]
    total = counts[0]
    for c in counts[1:]:
        total = pc.add(total, c)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), *counts, total],
        names=["doc_id", *(f"n_{name}" for name, _, _ in PII_PATTERNS), "n_pii"],
    )


def pii_redact(batch: pa.Table) -> pa.Table:
    """(doc_id, redacted): text with every PII category replaced by its
    token, patterns applied in the fixed PII_PATTERNS order."""
    col = batch.column("text")
    for _, pat, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pat, repl)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), col], names=["doc_id", "redacted"]
    )


def pii_scrub(batch: pa.Table) -> pa.Table:
    """Combined stats + redaction in ONE pass (one scan at scale
    instead of two): (doc_id, n_email, n_ipv4, n_ssn, n_phone, n_pii,
    redacted)."""
    stats = pii_stats(batch)
    red = pii_redact(batch)
    return stats.append_column("redacted", red.column("redacted"))


def k_anonymity_audit(
    ds,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
    num_partitions: int | None = None,
):
    """k-anonymity + l-diversity audit (Sweeney 2002; Machanavajjhala
    et al. 2007): for every quasi-identifier combination, the row count
    and the number of DISTINCT non-null sensitive values (SQL
    COUNT(DISTINCT) semantics: null-sensitive rows count toward ``n``
    but not toward diversity), flagging groups that
    re-identify (n < k) or leak (distinct sensitive < l) — the privacy
    gate a training-data release pipeline runs before publishing
    records. The reference has no privacy ops; this extends the
    pii_* family from per-row detection to corpus-level risk.

    Scale shape: exact distinct-per-group without shipping rows — the
    per-block pre-reduce groups by (quasi..., sensitive) FIRST, so the
    one exchange carries at most one row per distinct (QI, sensitive)
    combination per block (the same lossless two-level reduction as
    source_lang_entropy); the final then counts rows (=distinct
    sensitive) and sums counts per QI. Returns ONLY the violating
    groups: (quasi..., n, n_sensitive, at_risk_k, at_risk_l) — output
    is audit-sized, not corpus-sized.
    """
    import numpy as np
    import pandas as pd

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    keys = list(quasi_cols)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(keys + [sensitive_col]).to_pandas()
        return df.groupby(keys + [sensitive_col], as_index=False, sort=False,
                          dropna=False).size().rename(columns={"size": "cnt"})

    def final(block: pa.Table) -> pd.DataFrame:
        df = block.to_pandas()
        # re-merge per-block partials of the same (QI, sensitive)
        df = df.groupby(keys + [sensitive_col], as_index=False,
                        dropna=False)["cnt"].sum()
        # SQL COUNT(DISTINCT) parity: a NULL sensitive value counts toward
        # n but NOT toward diversity (ADVICE r4: the oracle shape is
        # COUNT(DISTINCT bal), which excludes NULLs)
        df["_nn"] = df[sensitive_col].notna().astype(np.int64)
        g = df.groupby(keys, dropna=False).agg(
            n=("cnt", "sum"), n_sensitive=("_nn", "sum")
        ).reset_index()
        g["at_risk_k"] = g["n"] < k
        g["at_risk_l"] = g["n_sensitive"] < l
        g = g[g["at_risk_k"] | g["at_risk_l"]]
        g["n"] = g["n"].astype(np.int64)
        g["n_sensitive"] = g["n_sensitive"].astype(np.int64)
        return g

    partials = ds.map_batches(arrow_out(partial), batch_format="pyarrow")
    out = grouped_blocks(partials, keys, final,
                         num_partitions=num_partitions).to_pandas()
    if out.empty:  # empty materialized Datasets lose their schema
        # explicit dtypes (ADVICE r4): quasi-column types from the input
        # schema, int64 counts, bool flags — so empty and non-empty
        # results share a schema and the oracle's bit-parity holds
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            qtypes = {kk: base.field(kk).type for kk in keys}
        else:  # PandasBlockSchema (from_pandas inputs): names + numpy dtypes
            def _to_pa(dtype):
                try:
                    return pa.from_numpy_dtype(dtype)
                except (pa.ArrowNotImplementedError, TypeError):
                    return pa.string()

            qtypes = {
                kk: _to_pa(base.types[list(base.names).index(kk)])
                for kk in keys
            }
        cols = {kk: pa.array([], qtypes[kk]) for kk in keys}
        cols["n"] = pa.array([], pa.int64())
        cols["n_sensitive"] = pa.array([], pa.int64())
        cols["at_risk_k"] = pa.array([], pa.bool_())
        cols["at_risk_l"] = pa.array([], pa.bool_())
        return pa.table(cols).to_pandas()
    return out.sort_values(keys).reset_index(drop=True)
