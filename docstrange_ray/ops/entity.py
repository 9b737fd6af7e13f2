"""Entity resolution / record linkage: multi-pass blocking + pair scoring.

The Fellegi-Sunter record-linkage shape (Fellegi & Sunter 1969;
modern form e.g. Splink / Dedupe): candidate pairs come from the UNION
of several cheap blocking passes (records agreeing on any one blocking
key are compared), each pair is scored by summing per-field agreement
weights, and pairs above a threshold are declared matches. The
reference has no linkage ops; this is part of the training-data
curation family (dirty-duplicate user/record dedup before training).

Distributed shape (the editjoin/minhash exchange discipline):

  1. ONE scan emits, per record, one (pass_ordinal, key_hash, id) row
     per blocking pass — all passes ride the SAME exchange, tagged by
     ordinal (the Adamic-Adar exchange-riding lesson). Key values are
     hashed to 63 bits; collisions only add candidates (scoring
     rejects), never lose a pair. Null/empty keys emit nothing (a null
     blocking value matches nothing, the standard ER convention).
  2. ONE groupby on (ordinal, key_hash): candidates = all pairs inside
     a block. ``max_block`` (default 10_000) SKIPS an oversized block
     ENTIRELY and deterministically — the standard ER "too common to
     be informative" rule (Splink/Dedupe never score universal
     blocks), and the r4-VERDICT lesson that the safe behavior must be
     the DEFAULT: without it a degenerate blocking key (say ``city``
     where one city holds 10% of records) yields an O(m²) candidate
     set inside one straggler group. The skip is a documented recall
     trade, not a silent truncation: each skipped block emits a marker
     row through the SAME exchange (a (kind, h) group lives in exactly
     one partition, so markers are globally exact without dedup), and
     the summed count is returned on the result as
     ``df.attrs['skipped_blocks']``. Pass ``max_block=None`` for the
     unconditionally exact quadratic behavior.
  3. ONE groupby on the pair dedups multi-block meetings, then record
     attributes attach via two co-partition hash_joins and the
     caller's VECTORIZED ``pair_score`` runs per batch; pairs scoring
     >= ``threshold`` are matches.

Everything integer: agreement weights are ints, so the distributed
result is reduction-order-independent and SQL-mirrorable bit-exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _key_hash(vals: tuple) -> int:
    s = "\x1f".join("" if v is None else str(v) for v in vals)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 1


def resolve_entities(
    records,
    id_col: str,
    block_keys: list[list[str]],
    pair_score,
    threshold: int,
    attr_cols: list[str] | None = None,
    max_block: int | None = 10_000,
    num_partitions: int | None = None,
):
    """Match record pairs via blocking-union candidates + vectorized
    scoring. Returns a pandas DataFrame [(id_a, id_b, score)] sorted,
    with score int64 and id_a < id_b; the number of blocks skipped by
    ``max_block`` is attached as ``result.attrs['skipped_blocks']``.

    ``pair_score(df) -> int ndarray`` receives a DataFrame whose
    columns are every attr column suffixed ``_a`` / ``_b`` and must be
    vectorized (it runs once per batch on the pair exchange's tail).
    ``attr_cols`` defaults to every non-id column of ``records``.
    """
    import ray

    from docstrange_ray.ops.dedup import _rename
    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    records = records.materialize()  # scanned 3x (blocks + both joins)
    if attr_cols is None:
        attr_cols = [c for c in records.schema().names if c != id_col]

    def block_rows(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_pylist()
        cols = {
            c: batch.column(c).to_pylist()
            for c in {c for pass_ in block_keys for c in pass_}
        }
        kk, hh, ii = [], [], []
        for j, pass_ in enumerate(block_keys):
            vals = [cols[c] for c in pass_]
            for r, rid in enumerate(ids):
                tup = tuple(v[r] for v in vals)
                if any(v is None or v == "" for v in tup):
                    continue
                kk.append(np.int8(j))
                hh.append(_key_hash(tup))
                ii.append(rid)
        return pd.DataFrame(
            {
                "kind": pd.Series(kk, dtype="int8"),
                "h": pd.Series(hh, dtype="int64"),
                "id": ii,
            }
        )

    rows = records.map_batches(arrow_out(block_rows), batch_format="pyarrow")

    def candidates(block: pa.Table) -> pd.DataFrame:
        df = block.to_pandas()
        out_a, out_b, skipped = [], [], 0
        first_id = df["id"].iloc[0] if len(df) else None
        for _, grp in df.groupby(["kind", "h"], sort=False):
            m = len(grp)
            if m < 2:
                continue
            if max_block is not None and m > max_block:
                skipped += 1
                continue
            ids = np.sort(grp["id"].to_numpy())
            iu, ju = np.triu_indices(m, k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        if skipped:
            import logging

            logging.getLogger(__name__).warning(
                "resolve_entities: skipped %d blocks over max_block=%s",
                skipped, max_block,
            )
        if not out_a and not skipped:
            return pd.DataFrame({"id_a": pd.Series(dtype=object),
                                 "id_b": pd.Series(dtype=object),
                                 "skip": pd.Series(dtype="int64")})
        out = pd.DataFrame(
            {"id_a": np.concatenate(out_a) if out_a else
                 pd.Series(dtype=object),
             "id_b": np.concatenate(out_b) if out_b else
                 pd.Series(dtype=object)}
        ).drop_duplicates()
        out["skip"] = np.int64(0)
        if skipped:
            # one marker row per finalizer task; id fields hold a real id
            # so dtypes stay uniform across the exchange
            out = pd.concat(
                [out, pd.DataFrame({"id_a": [first_id], "id_b": [first_id],
                                    "skip": [np.int64(skipped)]})],
                ignore_index=True,
            )
        return out

    cand = grouped_blocks(rows, ["kind", "h"], candidates,
                          num_partitions=num_partitions).materialize()
    # distributed scalar reduce — the pair-scale dataset never reaches
    # the driver
    skipped_blocks = int(cand.sum(on="skip") or 0)

    def _data_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pa.compute.equal(batch.column("skip"), 0)
        ).drop_columns(["skip"])

    pairs = grouped_blocks(
        cand.map_batches(_data_only, batch_format="pyarrow"),
        ["id_a", "id_b"],
        lambda b: b.to_pandas().drop_duplicates(["id_a", "id_b"]),
        num_partitions=num_partitions,
    ).materialize()  # bounded: candidate pair count (schema-probe gotcha)

    side = records.map_batches(
        lambda b, _c=[id_col] + list(attr_cols): b.select(_c),
        batch_format="pyarrow",
    ).materialize()
    j1 = hash_join(
        pairs,
        _rename(side, {id_col: "id_a",
                       **{c: f"{c}_a" for c in attr_cols}}),
        key="id_a",
        num_partitions=num_partitions,
    ).materialize()
    j2 = hash_join(
        j1,
        _rename(side, {id_col: "id_b",
                       **{c: f"{c}_b" for c in attr_cols}}),
        key="id_b",
        num_partitions=num_partitions,
    )

    def score(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        s = np.asarray(pair_score(df), dtype=np.int64)
        keep = s >= threshold
        return pd.DataFrame(
            {
                "id_a": df["id_a"].to_numpy()[keep],
                "id_b": df["id_b"].to_numpy()[keep],
                "score": pd.Series(s[keep], dtype="int64"),
            }
        )

    out = j2.map_batches(arrow_out(score), batch_format="pyarrow").to_pandas()
    if out.empty:  # empty materialized Datasets lose their schema
        out = pd.DataFrame({"id_a": pd.Series(dtype=object),
                            "id_b": pd.Series(dtype=object),
                            "score": pd.Series(dtype="int64")})
    else:
        out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    out.attrs["skipped_blocks"] = skipped_blocks
    return out


# ---------------------------------------------------------------------------
# Jaro-Winkler linkage join (Winkler 1990) — prefix-blocked fuzzy name join
# ---------------------------------------------------------------------------


def jaro_winkler(a: str, b: str, p: float = 0.1, boost_threshold: float = 0.7):
    """Jaro-Winkler similarity, PINNED bit-for-bit to DuckDB's
    ``jaro_winkler_similarity`` (verified over 8k random pairs, zero
    ULP divergence — tests/test_entity.py): empty side -> 0.0, the
    prefix boost (<= 4 chars, p=0.1) applies only when jaro > 0.7."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i in range(la):
        ca = a[i]
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        for j in range(lo, hi):
            if not bm[j] and b[j] == ca:
                bm[j] = True
                am[i] = True
                m += 1
                break
    if m == 0:
        return 0.0
    k = 0
    t = 0
    for i in range(la):
        if am[i]:
            while not bm[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    sj = (m / la + m / lb + (m - t) / m) / 3.0
    if sj > boost_threshold:
        l = 0
        for i in range(min(4, la, lb)):
            if a[i] == b[i]:
                l += 1
            else:
                break
        sj = sj + l * p * (1.0 - sj)
    return sj


def jw_linkage(
    ds,
    key_col: str,
    name_col: str,
    block_chars: int = 4,
    threshold: float = 0.94,
    max_block: int | None = 10_000,
    num_partitions=None,
):
    """Blocked Jaro-Winkler similarity self-join — the classic record-
    linkage name matcher (Winkler's own blocking advice: the <=4-char
    prefix that also drives the boost). Returns Dataset[(a, b,
    jw_micro)]: key pairs a < b whose names share an exact
    ``block_chars`` prefix and score >= ``threshold``; ``jw_micro`` =
    floor(jw * 1e6 + 0.5), int64.

    Keys are ORDERED by their native dtype (a < b) but EMITTED as
    strings (stable Arrow schema even for empty blocks); mirror with
    CAST(key AS VARCHAR) in SQL oracles when the key is numeric.

    Exactly ONE prefix-keyed exchange; within a block the all-pairs
    scan is quadratic BY CONTRACT (every blocked pair must be scored —
    same honesty contract as resolve_entities), so ``max_block``
    (default 10k) SKIPS degenerate blocks (a non-discriminative
    prefix) rather than running them; skipped-block counts are LOGGED
    (logging.warning) per worker, not returned. Scores are pinned
    bit-for-bit to DuckDB (:func:`jaro_winkler`), so the threshold cut
    and the emitted micro-units are SQL-oracle-exact with no
    quantization gap.
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def block_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        nm = df[name_col].astype(str)
        return pd.DataFrame(
            {
                "blk": nm.str[:block_chars],
                "key": df[key_col],
                "nm": nm,
            }
        )

    def pairs(block: pa.Table) -> pd.DataFrame:
        df = block.to_pandas()
        out_a, out_b, out_s = [], [], []
        skipped = 0
        for _, grp in df.groupby("blk", sort=False):
            m = len(grp)
            if m < 2:
                continue
            if max_block is not None and m > max_block:
                skipped += 1
                continue
            grp = grp.sort_values("key")  # native dtype order
            keys = grp["key"].tolist()
            names = grp["nm"].tolist()
            for i in range(m):
                ni = names[i]
                for j in range(i + 1, m):
                    s = jaro_winkler(ni, names[j])
                    if s >= threshold:
                        out_a.append(str(keys[i]))
                        out_b.append(str(keys[j]))
                        out_s.append(int(np.floor(s * 1_000_000 + 0.5)))
        if skipped:
            import logging

            logging.getLogger(__name__).warning(
                "jw_linkage: skipped %d blocks over max_block=%s",
                skipped, max_block,
            )
        return pa.table(
            {
                "a": pa.array(out_a, pa.string()),
                "b": pa.array(out_b, pa.string()),
                "jw_micro": pa.array(out_s, pa.int64()),
            }
        )

    return grouped_blocks(
        ds.map_batches(arrow_out(block_rows), batch_format="pyarrow"),
        ["blk"],
        pairs,
        num_partitions,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Golden-record survivorship merge (master-data consolidation)
# ---------------------------------------------------------------------------


def golden_records(
    records,
    pairs,
    id_col: str = "rec_id",
    longest_cols: tuple = (),
    min_cols: tuple = (),
    max_cols: tuple = (),
    num_partitions=None,
):
    """Survivorship merge after record linkage — the master-data step
    that turns match PAIRS into one golden row per real-world entity:
    clusters = connected components of the match graph (singletons keep
    their own id), then per-cluster deterministic attribute rules:

      - ``longest_cols``: longest value wins, ties to the
        lexicographically smallest (typo'd dups are usually DROPPED
        characters, so the undamaged original survives);
      - ``min_cols`` / ``max_cols``: plain MIN / MAX;
      - ``cluster_id`` = min member id; ``n_records`` = member count.

    Every rule is an exact reduction over the cluster, so the output is
    a pure function of (records, pairs) at any parallelism and the SQL
    oracle rebuilds it with window functions over a recursive-CTE CC.

    Distributed shape: CC runs on the pair graph only (match-pair
    scale, large-star/small-star O(log^2 n) — ops/graph); the
    (node, component) table rides ONE tagged-union exchange keyed by
    record id to label records (unmatched records fall through to
    their own id — no row leaves the exchange unlabeled), then ONE
    component-keyed merge reduces each cluster to its golden row.
    Returns Dataset[(cluster_id, n_records, *rules)] with golden
    column names ``<col>_g``.
    """
    import pyarrow.compute as pc

    from docstrange_ray.ops.graph import connected_components
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    comp = connected_components(
        pairs.map_batches(
            lambda b: pa.table(
                {"src": b.column("id_a").cast(pa.int64()),
                 "dst": b.column("id_b").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        num_partitions=num_partitions,
    )

    cols = list(longest_cols) + list(min_cols) + list(max_cols)

    # typed neutral fillers so the tagged union has ONE Arrow schema
    # (a None-filled object column would type as null and clash)
    base = records.schema().base_schema
    defaults = {}
    for c in cols:
        if isinstance(base, pa.Schema):
            t = base.field(c).type
        else:  # PandasBlockSchema: names + numpy dtypes (the pii idiom)
            try:
                t = pa.from_numpy_dtype(base.types[list(base.names).index(c)])
            except (pa.ArrowNotImplementedError, TypeError):
                t = pa.string()
        if pa.types.is_integer(t):
            defaults[c] = np.int64(0)
        elif pa.types.is_floating(t):
            defaults[c] = np.float64(0.0)
        else:
            defaults[c] = ""

    def rec_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        out = pd.DataFrame({"node": df[id_col].to_numpy(np.int64)})
        for c in cols:
            out[c] = df[c]
        out["component"] = np.int64(-1)
        out["kind"] = np.int8(0)
        return out

    def comp_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {"node": df["node"].to_numpy(np.int64)}
        )
        for c in cols:
            out[c] = defaults[c]
        out["component"] = df["component"].to_numpy(np.int64)
        out["kind"] = np.int8(1)
        return out

    def label(df: pd.DataFrame) -> pd.DataFrame:
        cm = df[df["kind"] == 1].set_index("node")["component"]
        rec = df[df["kind"] == 0].copy()
        lab = cm.reindex(rec["node"]).to_numpy()
        own = rec["node"].to_numpy(np.int64)
        rec["component"] = np.where(np.isnan(lab.astype(np.float64)),
                                    own, lab).astype(np.int64)
        return rec[["component"] + cols]

    labeled = grouped_blocks(
        records.map_batches(arrow_out(rec_rows), batch_format="pyarrow").union(
            comp.map_batches(arrow_out(comp_rows), batch_format="pyarrow")
        ),
        ["node"],
        label,
        num_partitions,
        batch_format="pandas",
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for comp_id, grp in df.groupby("component", sort=True):
            row = {"cluster_id": np.int64(comp_id),
                   "n_records": np.int64(len(grp))}
            for c in longest_cols:
                vals = grp[c].astype(str)
                best = sorted(vals, key=lambda v: (-len(v), v))[0]
                row[f"{c}_g"] = best
            for c in min_cols:
                row[f"{c}_g"] = grp[c].min()
            for c in max_cols:
                row[f"{c}_g"] = grp[c].max()
            rows.append(row)
        return pd.DataFrame(rows) if rows else pd.DataFrame(
            {"cluster_id": pd.Series([], dtype=np.int64),
             "n_records": pd.Series([], dtype=np.int64),
             **{f"{c}_g": pd.Series([], dtype=object) for c in longest_cols},
             **{f"{c}_g": pd.Series([], dtype=object)
                for c in list(min_cols) + list(max_cols)}}
        )

    return grouped_blocks(
        labeled, ["component"], merge, num_partitions, batch_format="pandas"
    )
