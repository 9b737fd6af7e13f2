"""URL canonicalization + host-level curation (the RefinedWeb URL steps).

Web-crawl pipelines dedup and filter BY URL before ever touching
content (RefinedWeb §3.1 / Penedo et al. 2023: URL dedup, per-host
caps, host blocklists). The reference ingests files, not crawls, so
this family is part of the beyond-the-reference training-data surface.

Canonicalization contract (documented so the SQL oracles can rebuild
expected outputs arithmetically; every rule is a pure string function):

1. the fragment (first ``#`` onward) is dropped;
2. scheme (before ``://``) is lowercased;
3. the authority (up to the first ``/`` or ``?`` after the scheme) is
   lowercased, and an explicit default port (``:80`` for http,
   ``:443`` for https) is stripped;
4. the query (after the first ``?``) is split on ``&``, the params are
   sorted lexicographically and rejoined; an empty query drops ``?``;
5. an empty path becomes ``/`` (so ``http://a.com`` == ``http://a.com/``).

Path CASE is preserved (paths are case-sensitive per RFC 3986; only
scheme and host are case-insensitive).

All ops are scans or standard pre-reduced exchanges:

- :func:`canonicalize_urls` — shuffle-free per-row scan;
- :func:`url_dedup_keep_first` — the exact-dedup plan keyed by the
  canonical URL: per-batch first-wins partial reduce, then ONE
  url-keyed exchange (hot URLs cross as n_batches rows, never n_docs);
- :func:`host_cap` — per-host document cap by lowest id (the
  RefinedWeb per-host limit): per-batch top-``cap`` pre-reduce bounds
  a hot host to n_batches x cap rows through the ONE host exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(u: str) -> str:
    """Apply the module's 5-rule canonicalization. Pure function."""
    u = u.split("#", 1)[0]
    if "://" in u:
        scheme, rest = u.split("://", 1)
        scheme = scheme.lower()
    else:
        scheme, rest = "", u
    # authority ends at the first '/' or '?'
    cut = len(rest)
    for ch in ("/", "?"):
        i = rest.find(ch)
        if i != -1:
            cut = min(cut, i)
    auth, tail = rest[:cut].lower(), rest[cut:]
    dp = _DEFAULT_PORTS.get(scheme)
    if dp and auth.endswith(dp):
        auth = auth[: -len(dp)]
    if "?" in tail:
        path, query = tail.split("?", 1)
        params = sorted(p for p in query.split("&") if p)
        query = "&".join(params)
        tail = path + ("?" + query if query else "")
    if not tail.split("?", 1)[0]:
        tail = "/" + tail
    prefix = scheme + "://" if scheme else ""
    return prefix + auth + tail


def url_host(u: str) -> str:
    """Canonical host (lowercased authority without a default port)."""
    c = canonicalize_url(u)
    rest = c.split("://", 1)[1] if "://" in c else c
    cut = len(rest)
    for ch in ("/", "?"):
        i = rest.find(ch)
        if i != -1:
            cut = min(cut, i)
    return rest[:cut]


def canonicalize_urls(ds, col: str = "url", host_col: str | None = None):
    """Shuffle-free canonicalization scan; optionally also emits the
    host as ``host_col``."""

    def apply(batch: pa.Table) -> pa.Table:
        urls = batch.column(col).to_pylist()
        canon = [canonicalize_url(u) for u in urls]
        i = batch.schema.get_field_index(col)
        out = batch.set_column(i, col, pa.array(canon, pa.string()))
        if host_col is not None:
            hosts = [url_host(u) for u in canon]
            out = out.append_column(host_col, pa.array(hosts, pa.string()))
        return out

    return ds.map_batches(apply, batch_format="pyarrow")


def url_dedup_keep_first(
    ds, url_col: str = "url", id_col: str = "doc_id", num_partitions=None
):
    """Keep the lowest-``id_col`` row per canonical URL (URL-level exact
    dedup, the first RefinedWeb stage). Input URLs are canonicalized
    in the same scan. Per-batch first-wins pre-reduce, ONE exchange."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    canon = canonicalize_urls(ds, col=url_col)

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.sort_values(id_col).groupby(url_col, as_index=False).first()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).groupby(url_col, as_index=False).first()

    return grouped_blocks(
        canon.map_batches(arrow_out(local), batch_format="pyarrow"),
        [url_col],
        final,
        num_partitions,
        batch_format="pandas",
    )


def host_stats(ds, url_col: str = "url", num_partitions=None):
    """Per-host doc count + total text chars (the host-level curation
    readout). Returns Dataset[(host, n_docs, n_chars)]. Pre-reduced."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local(batch: pa.Table) -> pd.DataFrame:
        urls = batch.column(url_col).to_pylist()
        hosts = [url_host(u) for u in urls]
        df = pd.DataFrame(
            {
                "host": hosts,
                "n_chars": [
                    len(t) for t in batch.column("text").to_pylist()
                ],
            }
        )
        g = df.groupby("host", as_index=False).agg(
            n_docs=("n_chars", "size"), n_chars=("n_chars", "sum")
        )
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("host", as_index=False)[["n_docs", "n_chars"]].sum()

    return grouped_blocks(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        ["host"],
        final,
        num_partitions,
        batch_format="pandas",
    )


def host_cap(
    ds,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    num_partitions=None,
):
    """Keep at most ``cap`` docs per host, lowest ``id_col`` first (the
    RefinedWeb per-host limit). Hot-host safe: each batch pre-reduces
    to its own top-``cap`` rows per host, so a host with millions of
    docs crosses the ONE host exchange as n_batches x cap rows."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["host"] = [url_host(u) for u in df[url_col]]
        return df.sort_values(id_col).groupby("host", group_keys=False).head(cap)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        kept = df.sort_values(id_col).groupby("host", group_keys=False).head(cap)
        return kept.drop(columns=["host"])

    return grouped_blocks(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        ["host"],
        final,
        num_partitions,
        batch_format="pandas",
    )
