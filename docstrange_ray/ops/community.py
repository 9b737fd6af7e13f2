"""Community detection, walk generation, and seed-centrality over the
co-purchase graph — the web-graph-curation operators a 100-TB corpus
pipeline runs BEFORE text filtering (spam-community pruning via label
propagation + modularity, crawl-seed scoring via bounded harmonic
centrality, node2vec-style walk corpora for graph-embedding training).
The reference (smoab/docstrange) has no graph analytics; these extend
the SURVEY §2 training-data families alongside ops/graph.py.

Determinism discipline (the repo's SQL-oracle contract):

* label propagation is SEMI-SYNCHRONOUS (all round-r labels computed
  from round r-1) with the argmax tie broken on (count DESC, label
  ASC) — a pure function of the edge set, mirrored round-for-round by
  an unrolled CTE chain in DuckDB.
* modularity is emitted as EXACT int64 sufficient statistics
  (m, intra_edges, sum_dc2) plus ONE double expression evaluated
  term-for-term identically in the oracle.
* random walks replace the RNG with the repo's md5 hash chain: the
  step-t move from node u picks argmin over neighbors n of
  md5_key52(f"{u}|{t}|{n}") (ties on n) — deterministic, reproducible
  across cluster sizes, and expressible verbatim in SQL.
* harmonic centrality seeds are the k smallest (md5_key52(node), node)
  — a deterministic "random" seed set; distances come from the
  existing bfs_levels frontier iteration via the product-graph trick
  (edges replicated per seed index), and 1/d sums are exact integers
  scaled by L = lcm(1..max_hops).

Scale notes per op are in the docstrings; every exchange here is
node-scale or edge-scale with pre-reduced partials — nothing is ever
all-pairs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import md5_key52, round6
from docstrange_ray.ops.graph import degree_table, undirected_edges


def symmetric_edges(edges, num_partitions=None):
    """Both-direction DISTINCT simple-graph edge table (src, dst) from
    any raw edge stream: dedupe via undirected_edges (one exchange),
    then emit each (a, b) as two directed rows — per-batch, no further
    exchange. The canonical adjacency input for every op below."""

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    return undirected_edges(edges, num_partitions).map_batches(
        both, batch_format="pyarrow"
    )


def _argmax_labels(df: pd.DataFrame) -> pd.DataFrame:
    """Per-node argmax over (node, lab, c) partials: sum counts, then
    pick (c DESC, lab ASC) — the deterministic LPA update rule."""
    g = df.groupby(["node", "lab"], as_index=False)["c"].sum()
    g = g.sort_values(["node", "c", "lab"], ascending=[True, False, True])
    out = g.drop_duplicates("node", keep="first")[["node", "lab"]]
    return pd.DataFrame(
        {
            "node": out["node"].to_numpy(np.int64),
            "lab": out["lab"].to_numpy(np.int64),
        }
    )


def label_propagation(
    edges,
    rounds: int = 4,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
    weighted: bool = False,
):
    """Semi-synchronous label propagation (Raghavan et al. 2007, made
    deterministic): every node starts as its own label; each round,
    node v's new label is the most frequent label among its neighbors
    at the PREVIOUS round, ties broken on the smallest label. A fixed
    ``rounds`` count (not convergence) keeps the op a pure function of
    the edge set — synchronous LPA can oscillate on bipartite-ish
    structures, and a data-dependent stop would make the output depend
    on the oscillation phase. Returns Dataset[(node, label)].

    Plans: below ``broadcast_node_limit`` nodes the label map lives on
    the driver (node-scale, gated) and each round is ONE pre-reduced
    edge-scan exchange (per-batch (node, lab, c) partials, combined
    per node). Above it labels stay a Dataset: per round, ONE
    co-partition join attaches src labels to edges, then ONE
    node-keyed exchange combines counts and argmaxes — label state
    never leaves the cluster. Skew: a hot node's incident edges
    pre-reduce to at most (distinct neighbor labels) rows per batch
    before either exchange.

    ``weighted=True``: votes are edge-weight SUMS instead of counts —
    the caller provides ``edges`` already as the SYMMETRIC DISTINCT
    weighted table (src, dst, w int64), the pagerank(weighted=...)
    contract (per-edge weight aggregation is the caller's); argmax tie
    stays (weight DESC, label ASC), so determinism is unchanged."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    if weighted:
        sym = edges.materialize()  # caller contract: symmetric distinct + w

        def node_partial(batch: pa.Table) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": np.unique(
                        batch.column("src").to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                }
            )

        from docstrange_ray.shuffle import grouped_blocks as _gb

        deg = _gb(
            sym.map_batches(
                arrow_out(node_partial), batch_format="pyarrow"
            ),
            ["node"],
            lambda df: df.drop_duplicates(),
            num_partitions,
            batch_format="pandas",
        ).materialize()
    else:
        sym = symmetric_edges(edges, num_partitions).materialize()
        deg = degree_table(
            undirected_edges(edges, num_partitions), num_partitions
        ).materialize()
    n_nodes = deg.count()
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )
    if n_nodes == 0:
        return ray.data.from_arrow(empty)
    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    if plan == "broadcast":
        labels = {
            int(r["node"]): int(r["node"]) for r in deg.take_all()
        }  # node-scale, gated
        for _ in range(rounds):
            l_ref = ray.put(labels)

            def partial(batch: pa.Table, _ref=l_ref) -> pd.DataFrame:
                lm = ray.get(_ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                lab = np.fromiter(
                    (lm[int(s)] for s in src), dtype=np.int64, count=len(src)
                )
                if weighted:
                    v = batch.column("w").to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64)
                else:
                    v = np.ones(len(src), dtype=np.int64)
                g = (
                    pd.DataFrame(
                        {"node": dst.astype(np.int64), "lab": lab, "c": v}
                    )
                    .groupby(["node", "lab"], as_index=False)["c"]
                    .sum()
                )
                return g

            new = grouped_blocks(
                sym.map_batches(arrow_out(partial), batch_format="pyarrow"),
                ["node"],
                _argmax_labels,
                num_partitions,
                batch_format="pandas",
            ).take_all()  # node-scale, gated
            for r in new:
                labels[int(r["node"])] = int(r["lab"])
        nodes = np.array(sorted(labels), dtype=np.int64)
        labs = np.fromiter((labels[int(v)] for v in nodes), dtype=np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "label": pa.array(labs, pa.int64()),
                }
            )
        )

    # ---- join (scale) plan: labels never leave the cluster ----
    lab_ds = deg.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "lab": b.column("node").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(rounds):
        if weighted:
            edge_side = sym.map_batches(
                lambda t: t.rename_columns(["node", "dst", "w"]),
                batch_format="pyarrow",
            )
        else:
            edge_side = sym.map_batches(
                lambda t: t.rename_columns(["node", "dst"]),
                batch_format="pyarrow",
            )
        attached = hash_join(
            edge_side,
            lab_ds,
            key="node",
            num_partitions=num_partitions,
        )

        def count_partial(df: pd.DataFrame) -> pd.DataFrame:
            if weighted:
                g = (
                    df.groupby(["dst", "lab"], as_index=False)["w"]
                    .sum()
                    .rename(columns={"dst": "node", "w": "c"})
                )
            else:
                g = (
                    df.groupby(["dst", "lab"], as_index=False)
                    .size()
                    .rename(columns={"dst": "node", "size": "c"})
                )
            return pd.DataFrame(
                {
                    "node": g["node"].to_numpy(np.int64),
                    "lab": g["lab"].to_numpy(np.int64),
                    "c": g["c"].to_numpy(np.int64),
                }
            )

        lab_ds = grouped_blocks(
            attached.map_batches(
                arrow_out(count_partial), batch_format="pandas"
            ),
            ["node"],
            _argmax_labels,
            num_partitions,
            batch_format="pandas",
        ).materialize()  # flat lineage per round
    return lab_ds.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "label": b.column("lab").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def modularity_stats(
    edges,
    rounds: int = 4,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """Newman modularity of the ``label_propagation(rounds)`` partition
    over the DISTINCT undirected simple graph, from EXACT int64
    sufficient statistics:

        Q = intra/m - sum_c d_c^2 / (4 m^2)
          = (4*m*intra - sum_dc2) / (4*m^2)

    with m = undirected edge count, intra = edges whose endpoints
    share a label, d_c = total degree of community c. One row out:
    (m_edges, intra_edges, sum_dc2, modularity) where ``modularity``
    is the single double expression above evaluated from the exact
    integers (round6; None on an empty graph) — mirrored term-for-term
    in the SQL oracle. int64 bound: sum_dc2 <= (2m)^2 holds while
    m < 2^31 undirected edges per connected label, and 4*m*m needs
    m < 2^30.5 — beyond that the finalize must move to Python bignum
    emit (ops/stats_tests discipline); document-scale co-purchase
    graphs are far below it.

    Plans: 'broadcast' (below ``broadcast_node_limit`` nodes) ships
    the label map once via ray.put; intra comes from ONE edge scan of
    single-row partials, sum_dc2 from the node-scale (label, deg)
    driver tables. 'join' attaches labels to both endpoints with two
    co-partition joins (edge-scale exchanges, single-row partials
    out), and d_c via one label-keyed exchange over the label-attached
    degree table."""
    import ray

    from docstrange_ray.shuffle import (
        arrow_out,
        coalesced_blocks,
        grouped_blocks,
        hash_join,
    )

    labels = label_propagation(
        edges, rounds, num_partitions, plan, broadcast_node_limit
    ).materialize()
    ue = undirected_edges(edges, num_partitions).materialize()
    deg = degree_table(ue, num_partitions).materialize()
    n_nodes = deg.count()

    def finalize_row(m: int, intra: int, sum_dc2: int) -> pd.DataFrame:
        q = (
            None
            if m == 0
            else float(
                round6((4.0 * m * intra - float(sum_dc2)) / (4.0 * m * m))
            )
        )
        return pd.DataFrame(
            {
                "m_edges": pd.Series([m], dtype=np.int64),
                "intra_edges": pd.Series([intra], dtype=np.int64),
                "sum_dc2": pd.Series([sum_dc2], dtype=np.int64),
                "modularity": pd.Series([q], dtype=np.float64),
            }
        )

    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    if plan == "broadcast":
        lmap = {int(r["node"]): int(r["label"]) for r in labels.take_all()}
        dc: dict[int, int] = {}
        for r in deg.take_all():  # node-scale, gated
            dc[lmap[int(r["node"])]] = dc.get(lmap[int(r["node"])], 0) + int(
                r["deg"]
            )
        sum_dc2 = sum(d * d for d in dc.values())
        l_ref = ray.put(lmap)

        def partial(batch: pa.Table, _ref=l_ref) -> pd.DataFrame:
            lm = ray.get(_ref)
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            intra = sum(1 for x, y in zip(a, b) if lm[int(x)] == lm[int(y)])
            return pd.DataFrame(
                {
                    "m": pd.Series([len(a)], dtype=np.int64),
                    "intra": pd.Series([intra], dtype=np.int64),
                }
            )

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return finalize_row(
                int(df["m"].sum()), int(df["intra"].sum()), sum_dc2
            )

        partials = ue.map_batches(arrow_out(partial), batch_format="pyarrow")
        return coalesced_blocks(partials, final)

    # ---- join (scale) plan ----
    lab_a = labels.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "la": b.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    lab_b = labels.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "lb": b.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    e_a = hash_join(
        ue.map_batches(
            lambda t: t.rename_columns(["node", "b"]), batch_format="pyarrow"
        ),
        lab_a,
        key="node",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.select(["b", "la"]).rename_columns(["node", "la"]),
        batch_format="pyarrow",
    )
    e_ab = hash_join(e_a, lab_b, key="node", num_partitions=num_partitions)

    def intra_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "m": pd.Series([len(df)], dtype=np.int64),
                "intra": pd.Series(
                    [int((df["la"].to_numpy() == df["lb"].to_numpy()).sum())],
                    dtype=np.int64,
                ),
                "dc2": pd.Series([0], dtype=np.int64),
            }
        )

    dl = hash_join(deg, lab_a, key="node", num_partitions=num_partitions)

    def dc_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("la", as_index=False)["deg"].sum()
        return pd.DataFrame(
            {
                "la": g["la"].to_numpy(np.int64),
                "dcs": g["deg"].to_numpy(np.int64),
            }
        )

    def dc_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("la", as_index=False)["dcs"].sum()
        d = g["dcs"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "m": pd.Series([0], dtype=np.int64),
                "intra": pd.Series([0], dtype=np.int64),
                "dc2": pd.Series([int((d * d).sum())], dtype=np.int64),
            }
        )

    # intra partials are already single-row per block — no exchange
    # needed; dc partials need ONE label-keyed exchange before the
    # square (d_c must be complete per label when squared)
    parts = e_ab.map_batches(
        arrow_out(intra_partial), batch_format="pandas"
    ).union(
        grouped_blocks(
            dl.map_batches(arrow_out(dc_partial), batch_format="pandas"),
            ["la"],
            dc_final,
            num_partitions,
            batch_format="pandas",
        )
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return finalize_row(
            int(df["m"].sum()), int(df["intra"].sum()), int(df["dc2"].sum())
        )

    return coalesced_blocks(parts, final)


def neighborhood_features(
    edges,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """GraphSAGE-style neighborhood feature aggregation — the feature
    table a GNN trainer consumes before it ever sees the graph: for
    every node of the DISTINCT undirected simple graph,

        deg          = |N(v)|
        sum_nbr_deg  = sum over u in N(v) of deg(u)           (1-hop)
        sum_2hop_deg = sum over u in N(v) of sum_nbr_deg(u)   (2-hop
                       path-counted, the GNN sum-aggregator semantics
                       — a node reachable two ways counts twice)

    Exact int64 throughout (bound: deg_max^3 < 2^63). Two aggregation
    hops, each one join + one pre-reduced node exchange in the join
    plan; the broadcast plan ships the (node -> value) map per hop
    (node-scale, gated) and scans edges once per hop with per-batch
    partial sums. Returns Dataset[(node, deg, sum_nbr_deg,
    sum_2hop_deg)]."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    sym = symmetric_edges(edges, num_partitions).materialize()
    deg = degree_table(
        undirected_edges(edges, num_partitions), num_partitions
    ).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                    "sum_nbr_deg": pa.array([], pa.int64()),
                    "sum_2hop_deg": pa.array([], pa.int64()),
                }
            )
        )
    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    def sum_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["v"].sum()
        return pd.DataFrame(
            {"node": g["node"].to_numpy(np.int64),
             "v": g["v"].to_numpy(np.int64)}
        )

    if plan == "broadcast":
        def hop(vals: dict) -> dict:
            v_ref = ray.put(vals)

            def partial(batch: pa.Table, _ref=v_ref) -> pd.DataFrame:
                vm = ray.get(_ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                v = np.fromiter(
                    (vm[int(d)] for d in dst), dtype=np.int64, count=len(dst)
                )
                g = (
                    pd.DataFrame({"node": src.astype(np.int64), "v": v})
                    .groupby("node", as_index=False)["v"].sum()
                )
                return g

            return {
                int(r["node"]): int(r["v"])
                for r in grouped_blocks(
                    sym.map_batches(arrow_out(partial), batch_format="pyarrow"),
                    ["node"], sum_final, num_partitions,
                    batch_format="pandas",
                ).take_all()  # node-scale, gated
            }

        dmap = {int(r["node"]): int(r["deg"]) for r in deg.take_all()}
        s1 = hop(dmap)
        s2 = hop(s1)
        nodes = np.array(sorted(dmap), dtype=np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "deg": pa.array(
                        [dmap[int(v)] for v in nodes], pa.int64()
                    ),
                    "sum_nbr_deg": pa.array(
                        [s1[int(v)] for v in nodes], pa.int64()
                    ),
                    "sum_2hop_deg": pa.array(
                        [s2[int(v)] for v in nodes], pa.int64()
                    ),
                }
            )
        )

    # ---- join (scale) plan ----
    def hop_ds(val_ds, col: str):
        attached = hash_join(
            sym.map_batches(
                lambda b: pa.table(
                    {
                        "node": b.column("dst").cast(pa.int64()),
                        "src": b.column("src").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            val_ds,
            key="node",
            num_partitions=num_partitions,
        )

        def partial(df: pd.DataFrame, _c=col) -> pd.DataFrame:
            g = df.groupby("src", as_index=False)[_c].sum()
            g.columns = ["node", "v"]
            return pd.DataFrame(
                {"node": g["node"].to_numpy(np.int64),
                 "v": g["v"].to_numpy(np.int64)}
            )

        return grouped_blocks(
            attached.map_batches(arrow_out(partial), batch_format="pandas"),
            ["node"], sum_final, num_partitions, batch_format="pandas",
        ).materialize()

    s1_ds = hop_ds(deg, "deg")
    s2_ds = hop_ds(s1_ds, "v")
    j1 = hash_join(deg, s1_ds.map_batches(
        lambda b: pa.table(
            {"node": b.column("node").cast(pa.int64()),
             "s1": b.column("v").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ), key="node", num_partitions=num_partitions)
    j2 = hash_join(j1, s2_ds.map_batches(
        lambda b: pa.table(
            {"node": b.column("node").cast(pa.int64()),
             "s2": b.column("v").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ), key="node", num_partitions=num_partitions)
    from docstrange_ray.shuffle import arrow_out as _ao

    return j2.map_batches(
        _ao(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].to_numpy(np.int64),
                    "deg": df["deg"].to_numpy(np.int64),
                    "sum_nbr_deg": df["s1"].to_numpy(np.int64),
                    "sum_2hop_deg": df["s2"].to_numpy(np.int64),
                }
            )
        ),
        batch_format="pandas",
    )


def modularity_stats_weighted(
    wedges,
    rounds: int = 4,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """Weighted Newman modularity of the WEIGHTED label-propagation
    partition (Newman 2004, "Analysis of weighted networks"): with
    W = total undirected weight, intra = within-community weight and
    S_c = community strength sums (strength = weighted degree),

        Q = intra/W - sum_c S_c^2 / (4 W^2)
          = (4*W*intra - sum_sc2) / (4*W^2)

    — the same expression shape as the unweighted op with weight sums
    replacing counts, evaluated from exact int64 sums over the
    SYMMETRIC caller-aggregated table (src, dst, w — the
    label_propagation(weighted=True) contract; symmetric sums are
    halved, exact since every undirected pair appears twice). One row
    out: (w_total, intra_weight, sum_sc2, modularity).

    Plans: 'broadcast' ships the label map once and derives strength/
    S_c from node-scale driver tables (gated); 'join' attaches labels
    to both endpoints with two co-partition joins and computes S_c via
    one label-keyed exchange over the label-attached strength table."""
    import ray

    from docstrange_ray.shuffle import (
        arrow_out,
        coalesced_blocks,
        grouped_blocks,
        hash_join,
    )

    labels = label_propagation(
        wedges, rounds, num_partitions, plan, broadcast_node_limit,
        weighted=True,
    ).materialize()
    sym = wedges.materialize()
    n_nodes = labels.count()

    def finalize_row(w_total: int, intra: int, sum_sc2: int) -> pd.DataFrame:
        q = (
            None
            if w_total == 0
            else float(
                round6(
                    (4.0 * w_total * intra - float(sum_sc2))
                    / (4.0 * w_total * w_total)
                )
            )
        )
        return pd.DataFrame(
            {
                "w_total": pd.Series([w_total], dtype=np.int64),
                "intra_weight": pd.Series([intra], dtype=np.int64),
                "sum_sc2": pd.Series([sum_sc2], dtype=np.int64),
                "modularity": pd.Series([q], dtype=np.float64),
            }
        )

    # strength = weighted degree, from the symmetric table (one
    # pre-reduced node exchange)
    def s_partial(batch: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "node": batch.column("src")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "s": batch.column("w")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby("node", as_index=False)["s"]
            .sum()
        )
        return g

    def s_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["s"].sum()

    strength = grouped_blocks(
        sym.map_batches(arrow_out(s_partial), batch_format="pyarrow"),
        ["node"],
        s_final,
        num_partitions,
        batch_format="pandas",
    ).materialize()

    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    if plan == "broadcast":
        lmap = {int(r["node"]): int(r["label"]) for r in labels.take_all()}
        sc: dict[int, int] = {}
        for r in strength.take_all():  # node-scale, gated
            lab = lmap[int(r["node"])]
            sc[lab] = sc.get(lab, 0) + int(r["s"])
        sum_sc2 = sum(v * v for v in sc.values())
        l_ref = ray.put(lmap)

        def partial(batch: pa.Table, _ref=l_ref) -> pd.DataFrame:
            lm = ray.get(_ref)
            s_ = batch.column("src").to_numpy(zero_copy_only=False)
            d_ = batch.column("dst").to_numpy(zero_copy_only=False)
            w_ = batch.column("w").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            same = np.fromiter(
                (lm[int(a)] == lm[int(b)] for a, b in zip(s_, d_)),
                dtype=bool,
                count=len(s_),
            )
            return pd.DataFrame(
                {
                    "w2": pd.Series([int(w_.sum())], dtype=np.int64),
                    "i2": pd.Series([int(w_[same].sum())], dtype=np.int64),
                }
            )

        def final(df: pd.DataFrame) -> pd.DataFrame:
            w2 = int(df["w2"].sum())
            i2 = int(df["i2"].sum())
            return finalize_row(w2 // 2, i2 // 2, sum_sc2)

        partials = sym.map_batches(arrow_out(partial), batch_format="pyarrow")
        return coalesced_blocks(partials, final)

    # ---- join (scale) plan ----
    lab_a = labels.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "la": b.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    lab_b = labels.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "lb": b.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    e_a = hash_join(
        sym.map_batches(
            lambda t: t.rename_columns(["node", "dst", "w"]),
            batch_format="pyarrow",
        ),
        lab_a,
        key="node",
        num_partitions=num_partitions,
    ).map_batches(
        arrow_out(
            lambda df: pd.DataFrame(
                {
                    "node": df["dst"].to_numpy(np.int64),
                    "w": df["w"].to_numpy(np.int64),
                    "la": df["la"].to_numpy(np.int64),
                }
            )
        ),
        batch_format="pandas",
    ).materialize()
    e_ab = hash_join(e_a, lab_b, key="node", num_partitions=num_partitions)

    def intra_partial(df: pd.DataFrame) -> pd.DataFrame:
        w_ = df["w"].to_numpy(np.int64)
        same = df["la"].to_numpy() == df["lb"].to_numpy()
        return pd.DataFrame(
            {
                "w2": pd.Series([int(w_.sum())], dtype=np.int64),
                "i2": pd.Series([int(w_[same].sum())], dtype=np.int64),
                "sc2": pd.Series([0], dtype=np.int64),
            }
        )

    sl = hash_join(strength, lab_a, key="node", num_partitions=num_partitions)

    def sc_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("la", as_index=False)["s"].sum()
        return pd.DataFrame(
            {"la": g["la"].to_numpy(np.int64), "scs": g["s"].to_numpy(np.int64)}
        )

    def sc_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("la", as_index=False)["scs"].sum()
        v = g["scs"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "w2": pd.Series([0], dtype=np.int64),
                "i2": pd.Series([0], dtype=np.int64),
                "sc2": pd.Series([int((v * v).sum())], dtype=np.int64),
            }
        )

    parts = e_ab.map_batches(
        arrow_out(intra_partial), batch_format="pandas"
    ).union(
        grouped_blocks(
            sl.map_batches(arrow_out(sc_partial), batch_format="pandas"),
            ["la"],
            sc_final,
            num_partitions,
            batch_format="pandas",
        )
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return finalize_row(
            int(df["w2"].sum()) // 2,
            int(df["i2"].sum()) // 2,
            int(df["sc2"].sum()),
        )

    return coalesced_blocks(parts, final)


def _hop_hash(cur: int, step: int, nxt: int) -> int:
    return md5_key52(f"{cur}|{step}|{nxt}")


def random_walks(
    edges,
    steps: int = 4,
    num_partitions=None,
    plan: str = "auto",
    broadcast_edge_limit: int = 2_000_000,
):
    """Deterministic node2vec-style walk corpus: ONE walk per node,
    ``steps`` moves along the symmetric simple graph; the step-t move
    from node u goes to argmin over neighbors n of
    md5_key52(f"{u}|{t}|{n}") with ties on n — the repo's hash-chain
    replacement for an RNG, so the corpus is a pure function of the
    edge set (same on any cluster size, SQL-mirrorable). Isolated
    walkers (no neighbors — impossible on an edge-derived symmetric
    graph, kept for safety) stay in place. Returns
    Dataset[(start, step, node)] with step 0 = the start row.

    Plans: below ``broadcast_edge_limit`` DIRECTED edges the adjacency
    map ships once via ray.put and every step is a frontier-local
    map_batches — zero exchanges. Above it the frontier stays a
    Dataset: per step, ONE co-partition join against the edge table
    keyed by current node, then ONE walker-keyed exchange of
    per-batch argmin partials (a hot node's candidate rows pre-reduce
    to one row per walker per batch before moving). The walk corpus
    at 10^12 nodes is exactly this: steps x 2 bounded exchanges, no
    state on the driver."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    sym = symmetric_edges(edges, num_partitions).materialize()
    n_edges = sym.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "start": pa.array([], pa.int64()),
                    "step": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                }
            )
        )
    if plan == "auto":
        plan = "broadcast" if n_edges <= broadcast_edge_limit else "join"

    nodes_ds = (
        degree_table(undirected_edges(edges, num_partitions), num_partitions)
        .map_batches(
            lambda b: pa.table(
                {
                    "start": b.column("node").cast(pa.int64()),
                    "node": b.column("node").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    if plan == "broadcast":
        adj: dict[int, list[int]] = {}
        for r in sym.take_all():  # edge-scale, gated by broadcast_edge_limit
            adj.setdefault(int(r["src"]), []).append(int(r["dst"]))
        for v in adj:
            adj[v].sort()
        a_ref = ray.put(adj)
        frontiers = [nodes_ds]
        for t in range(steps):
            def advance(batch: pa.Table, _t=t, _ref=a_ref) -> pa.Table:
                am = ray.get(_ref)
                st = batch.column("start").to_numpy(zero_copy_only=False)
                cur = batch.column("node").to_numpy(zero_copy_only=False)
                nxt = np.empty(len(cur), dtype=np.int64)
                for i, c in enumerate(cur):
                    nbrs = am.get(int(c))
                    if not nbrs:
                        nxt[i] = int(c)
                    else:
                        nxt[i] = min(
                            nbrs, key=lambda n: (_hop_hash(int(c), _t, n), n)
                        )
                return pa.table(
                    {
                        "start": pa.array(st.astype(np.int64), pa.int64()),
                        "node": pa.array(nxt, pa.int64()),
                    }
                )

            frontiers.append(
                frontiers[-1]
                .map_batches(advance, batch_format="pyarrow")
                .materialize()
            )
    else:
        frontiers = [nodes_ds]
        for t in range(steps):
            cand = hash_join(
                frontiers[-1],
                sym.map_batches(
                    lambda b: pa.table(
                        {
                            "node": b.column("src").cast(pa.int64()),
                            "dst": b.column("dst").cast(pa.int64()),
                        }
                    ),
                    batch_format="pyarrow",
                ),
                key="node",
                num_partitions=num_partitions,
            )

            def best_partial(df: pd.DataFrame, _t=t) -> pd.DataFrame:
                if df.empty:
                    return pd.DataFrame(
                        {
                            "start": pd.Series([], dtype=np.int64),
                            "h": pd.Series([], dtype=np.int64),
                            "dst": pd.Series([], dtype=np.int64),
                        }
                    )
                h = np.fromiter(
                    (
                        _hop_hash(int(c), _t, int(n))
                        for c, n in zip(df["node"], df["dst"])
                    ),
                    dtype=np.int64,
                    count=len(df),
                )
                d = df.assign(h=h).sort_values(["start", "h", "dst"])
                d = d.drop_duplicates("start", keep="first")
                return pd.DataFrame(
                    {
                        "start": d["start"].to_numpy(np.int64),
                        "h": d["h"].to_numpy(np.int64),
                        "dst": d["dst"].to_numpy(np.int64),
                    }
                )

            def best_final(df: pd.DataFrame) -> pd.DataFrame:
                d = df.sort_values(["start", "h", "dst"]).drop_duplicates(
                    "start", keep="first"
                )
                return pd.DataFrame(
                    {
                        "start": d["start"].to_numpy(np.int64),
                        "node": d["dst"].to_numpy(np.int64),
                    }
                )

            frontiers.append(
                grouped_blocks(
                    cand.map_batches(
                        arrow_out(best_partial), batch_format="pandas"
                    ),
                    ["start"],
                    best_final,
                    num_partitions,
                    batch_format="pandas",
                ).materialize()
            )

    out = None
    for t, fr in enumerate(frontiers):
        step_ds = fr.map_batches(
            lambda b, _t=t: pa.table(
                {
                    "start": b.column("start").cast(pa.int64()),
                    "step": pa.array(
                        np.full(b.num_rows, _t, dtype=np.int64), pa.int64()
                    ),
                    "node": b.column("node").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        out = step_ds if out is None else out.union(step_ds)
    return out


def edge_structural_sim(
    edges,
    num_partitions=None,
    plan: str = "auto",
    broadcast_edge_limit: int = 2_000_000,
):
    """Per-EDGE structural similarity — the local graph sparsification
    primitive (Satuluri, Parthasarathy & Ruan SIGMOD'11): for every
    edge (a, b) of the DISTINCT undirected simple graph, the Jaccard
    similarity of the endpoint neighborhoods excluding the endpoints
    themselves,

        common     = |N(a) ∩ N(b)|          (= triangles through a-b)
        union_size = (deg(a)-1) + (deg(b)-1) - common
        sim        = round6(common / union_size)   (NULL when union 0)

    Keep-top-sim-per-node sparsification preserves community structure
    while dropping noise edges — the pre-clustering curation step for
    web/co-purchase graphs. Exact int64 counts, ONE double division.

    Plans: below ``broadcast_edge_limit`` directed edges the adjacency
    sets ship once via ray.put and the whole op is a single edge scan
    (set intersections block-locally, zero extra exchanges). Above it,
    common counts come from the degree-ORIENTED wedge probe (the
    triangle_stats machinery — out-degree bounded by O(sqrt(2m)), so
    the hot-hub wedge explode cannot exist): each discovered triangle
    credits all three of its edges, one (a, b)-keyed exchange sums,
    and a packed-key left join attaches counts to the full edge list.
    Returns Dataset[(a, b, common, union_size, sim)] for every edge."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    OFF = 1 << 32
    ue = undirected_edges(edges, num_partitions).materialize()
    deg = degree_table(ue, num_partitions).materialize()
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "common": pa.array([], pa.int64()),
            "union_size": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )
    n_edges = ue.count()
    if n_edges == 0:
        return ray.data.from_arrow(empty)
    if plan == "auto":
        plan = "broadcast" if 2 * n_edges <= broadcast_edge_limit else "join"

    def emit(a, b, common, da, db):
        union = (int(da) - 1) + (int(db) - 1) - int(common)
        sim = None if union == 0 else float(round6(int(common) / union))
        return int(a), int(b), int(common), union, sim

    if plan == "broadcast":
        adj: dict[int, set] = {}
        for r in ue.take_all():  # edge-scale, gated
            a_, b_ = int(r["a"]), int(r["b"])
            adj.setdefault(a_, set()).add(b_)
            adj.setdefault(b_, set()).add(a_)
        a_ref = ray.put(adj)

        def scan(batch: pa.Table, _ref=a_ref) -> pd.DataFrame:
            am = ray.get(_ref)
            rows = []
            for a_, b_ in zip(
                batch.column("a").to_pylist(), batch.column("b").to_pylist()
            ):
                na, nb = am[int(a_)], am[int(b_)]
                rows.append(
                    emit(a_, b_, len(na & nb), len(na), len(nb))
                )
            return pd.DataFrame(
                rows, columns=["a", "b", "common", "union_size", "sim"]
            ).astype(
                {
                    "a": np.int64,
                    "b": np.int64,
                    "common": np.int64,
                    "union_size": np.int64,
                    "sim": np.float64,
                }
            )

        return ue.map_batches(arrow_out(scan), batch_format="pyarrow")

    # ---- join (scale) plan: oriented wedges, per-edge triangle credit
    from docstrange_ray.ops.graph import _oriented_edges_join

    oriented = _oriented_edges_join(ue, deg, num_partitions).materialize()

    def wedges(block: pa.Table) -> pd.DataFrame:
        df = block.to_pandas().sort_values(["u", "dv", "v"])
        outs = []
        for u, sub in df.groupby("u", sort=False):
            vs = sub["v"].to_numpy(dtype=np.int64)
            if len(vs) < 2:
                continue
            i, j = np.triu_indices(len(vs), 1)
            outs.append(
                pd.DataFrame({"x": vs[i], "y": vs[j], "center": np.int64(u)})
            )
        if not outs:
            return pd.DataFrame(
                {
                    "x": np.array([], dtype=np.int64),
                    "y": np.array([], dtype=np.int64),
                    "center": np.array([], dtype=np.int64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    wedge_ds = grouped_blocks(
        oriented, ["u"], wedges, num_partitions, batch_format="pyarrow"
    )

    def wedge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "x": batch.column("x").cast(pa.int64()),
                "y": batch.column("y").cast(pa.int64()),
                "center": batch.column("center").cast(pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "x": batch.column("u").cast(pa.int64()),
                "y": batch.column("v").cast(pa.int64()),
                "center": pa.nulls(n, pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    tagged = wedge_ds.map_batches(wedge_rows, batch_format="pyarrow").union(
        oriented.map_batches(edge_rows, batch_format="pyarrow")
    )

    def probe(block: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        kind = block.column("kind")
        ed = block.filter(pc.equal(kind, pa.scalar(1, pa.int8())))
        wd = block.filter(pc.equal(kind, pa.scalar(0, pa.int8())))
        empty_df = pd.DataFrame(
            {
                "ea": np.array([], dtype=np.int64),
                "eb": np.array([], dtype=np.int64),
                "c": np.array([], dtype=np.int64),
            }
        )
        if wd.num_rows == 0 or ed.num_rows == 0:
            return empty_df
        edf = pd.DataFrame(
            {
                "x": ed.column("x").to_numpy(zero_copy_only=False),
                "y": ed.column("y").to_numpy(zero_copy_only=False),
            }
        )
        wdf = pd.DataFrame(
            {
                "x": wd.column("x").to_numpy(zero_copy_only=False),
                "y": wd.column("y").to_numpy(zero_copy_only=False),
                "center": wd.column("center").to_numpy(zero_copy_only=False),
            }
        )
        hit = wdf.merge(edf, on=["x", "y"], how="inner")
        if not len(hit):
            return empty_df
        cx = hit["center"].to_numpy(np.int64)
        xx = hit["x"].to_numpy(np.int64)
        yy = hit["y"].to_numpy(np.int64)
        # triangle {c, x, y}: each of its three edges gains one
        # common neighbor (the opposite corner)
        ea = np.concatenate(
            [np.minimum(xx, yy), np.minimum(cx, xx), np.minimum(cx, yy)]
        )
        eb = np.concatenate(
            [np.maximum(xx, yy), np.maximum(cx, xx), np.maximum(cx, yy)]
        )
        g = (
            pd.DataFrame({"ea": ea, "eb": eb})
            .groupby(["ea", "eb"], as_index=False)
            .size()
        )
        g.columns = ["ea", "eb", "c"]
        return g.astype({"c": np.int64})

    def common_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["ea", "eb"], as_index=False)["c"].sum()

    # exchange 1: co-locate wedges with their closing edges by (x, y)
    # and emit per-edge triangle credits; a triangle credits edges
    # whose keys differ from its wedge's (x, y), so the same edge can
    # be credited from multiple probe blocks — exchange 2 keyed
    # (ea, eb) completes the sums exactly.
    probe_partials = grouped_blocks(
        tagged, ["x", "y"], probe, num_partitions, batch_format="pyarrow"
    )
    commons = grouped_blocks(
        probe_partials, ["ea", "eb"], common_final, num_partitions,
        batch_format="pandas",
    ).materialize()

    # attach degrees + counts to the full edge list via packed keys
    da = hash_join(
        ue.map_batches(
            lambda t: t.rename_columns(["node", "b"]), batch_format="pyarrow"
        ),
        deg.map_batches(
            lambda t: t.rename_columns(["node", "da"]), batch_format="pyarrow"
        ),
        key="node",
        num_partitions=num_partitions,
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "node": df["b"].to_numpy(np.int64),
                "a": df["node"].to_numpy(np.int64),
                "da": df["da"].to_numpy(np.int64),
            }
        ),
        batch_format="pandas",
    )
    dab = hash_join(
        da.map_batches(lambda b: b, batch_format="pyarrow").materialize(),
        deg.map_batches(
            lambda t: t.rename_columns(["node", "db"]), batch_format="pyarrow"
        ),
        key="node",
        num_partitions=num_partitions,
    ).map_batches(
        arrow_out(
            lambda df: pd.DataFrame(
                {
                    "pk": df["a"].to_numpy(np.int64) * OFF
                    + df["node"].to_numpy(np.int64),
                    "a": df["a"].to_numpy(np.int64),
                    "b": df["node"].to_numpy(np.int64),
                    "da": df["da"].to_numpy(np.int64),
                    "db": df["db"].to_numpy(np.int64),
                }
            )
        ),
        batch_format="pandas",
    ).materialize()
    ckeyed = commons.map_batches(
        arrow_out(
            lambda df: pd.DataFrame(
                {
                    "pk": df["ea"].to_numpy(np.int64) * OFF
                    + df["eb"].to_numpy(np.int64),
                    "c": df["c"].to_numpy(np.int64),
                }
            )
        ),
        batch_format="pandas",
    ).materialize()
    joined = hash_join(
        dab, ckeyed, key="pk", how="left", num_partitions=num_partitions
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = [
            emit(a_, b_, 0 if pd.isna(c_) else int(c_), da_, db_)
            for a_, b_, da_, db_, c_ in zip(
                df["a"], df["b"], df["da"], df["db"], df["c"]
            )
        ]
        return pd.DataFrame(
            rows, columns=["a", "b", "common", "union_size", "sim"]
        ).astype(
            {
                "a": np.int64,
                "b": np.int64,
                "common": np.int64,
                "union_size": np.int64,
                "sim": np.float64,
            }
        )

    return joined.map_batches(arrow_out(final), batch_format="pandas")


def _exp_key(cur: int, step: int, nxt: int, w: float) -> float:
    """Deterministic exponential-race key: k = -ln(u)/w with u the
    md5-uniform of "cur|step|n" ((h+0.5)/2^64, first 8 digest bytes —
    the _gumbel_of_ids convention) — P(argmin over candidates) is
    proportional to w, and ``math.log`` is bit-pinned to DuckDB LN, so
    the pick is SQL-mirrorable. Bias weights MUST be powers of two
    (0.25 / 0.5 / 1.0): the division is then exact scaling and the
    float comparison chain cannot diverge between engines."""
    import hashlib

    h = int.from_bytes(
        hashlib.md5(f"{cur}|{step}|{nxt}".encode("utf-8")).digest()[:8],
        "big",
    )
    u = (float(h) + 0.5) / 2.0**64
    return -math.log(u) / w


def biased_walks(
    edges,
    steps: int = 4,
    num_partitions=None,
    plan: str = "auto",
    broadcast_edge_limit: int = 2_000_000,
):
    """Second-order node2vec walks (Grover & Leskovec KDD'16) with
    p=4, q=2 — the return-discouraging, locally-exploring regime: the
    move from ``cur`` (having arrived from ``prev``) weighs candidate
    n by 1/p = 0.25 if n == prev (return), 1.0 if n is ALSO a
    neighbor of prev (triangle / BFS-like), 1/q = 0.5 otherwise
    (outward / DFS-like). The RNG is the deterministic exponential
    race of :func:`_exp_key` — biased sampling as a pure function of
    the edge set; the first move (no prev) is the uniform race. All
    bias weights are powers of two, so the float key chain is
    bit-identical in DuckDB and the unrolled oracle matches exactly.
    Returns Dataset[(start, step, node)], step 0 = start.

    Plans: below ``broadcast_edge_limit`` directed edges the adjacency
    map ships once (ray.put) and each step is frontier-local — zero
    exchanges (the triangle test is a set lookup). Above it, THREE
    co-partition exchanges per step: frontier x edges keyed cur, a
    packed (prev, candidate) membership join against the edge set
    (the triangle bit), then the walker-keyed argmin with per-batch
    pre-reduction."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    OFF = 1 << 32
    sym = symmetric_edges(edges, num_partitions).materialize()
    n_edges = sym.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "start": pa.array([], pa.int64()),
                    "step": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                }
            )
        )
    if plan == "auto":
        plan = "broadcast" if n_edges <= broadcast_edge_limit else "join"

    W_RET, W_TRI, W_OUT = 0.25, 1.0, 0.5

    nodes_ds = (
        degree_table(undirected_edges(edges, num_partitions), num_partitions)
        .map_batches(
            lambda b: pa.table(
                {
                    "start": b.column("node").cast(pa.int64()),
                    "prev": pa.nulls(b.num_rows, pa.int64()),
                    "node": b.column("node").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    if plan == "broadcast":
        adj: dict[int, list[int]] = {}
        aset: set[int] = set()
        for r in sym.take_all():  # edge-scale, gated
            s_, d_ = int(r["src"]), int(r["dst"])
            adj.setdefault(s_, []).append(d_)
            aset.add(s_ * OFF + d_)
        for v in adj:
            adj[v].sort()
        a_ref = ray.put((adj, aset))
        frontiers = [nodes_ds]
        for t in range(steps):
            def advance(batch: pa.Table, _t=t, _ref=a_ref) -> pa.Table:
                am, ae = ray.get(_ref)
                st = batch.column("start").to_numpy(zero_copy_only=False)
                pv = batch.column("prev").to_pylist()
                cur = batch.column("node").to_numpy(zero_copy_only=False)
                nxt = np.empty(len(cur), dtype=np.int64)
                for i, c in enumerate(cur):
                    nbrs = am.get(int(c))
                    if not nbrs:
                        nxt[i] = int(c)
                        continue
                    p_ = pv[i]
                    best, bk = None, None
                    for n in nbrs:
                        if p_ is None:
                            w = 1.0
                        elif n == p_:
                            w = W_RET
                        elif int(p_) * OFF + n in ae:
                            w = W_TRI
                        else:
                            w = W_OUT
                        k = _exp_key(int(c), _t, n, w)
                        if bk is None or k < bk or (k == bk and n < best):
                            best, bk = n, k
                    nxt[i] = best
                return pa.table(
                    {
                        "start": pa.array(st.astype(np.int64), pa.int64()),
                        "prev": pa.array(cur.astype(np.int64), pa.int64()),
                        "node": pa.array(nxt, pa.int64()),
                    }
                )

            frontiers.append(
                frontiers[-1]
                .map_batches(advance, batch_format="pyarrow")
                .materialize()
            )
    else:
        packed = sym.map_batches(
            lambda b: pa.table(
                {
                    "pk": pa.array(
                        b.column("src").to_numpy(zero_copy_only=False).astype(
                            np.int64
                        )
                        * OFF
                        + b.column("dst")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64),
                        pa.int64(),
                    ),
                    "tri": pa.array(
                        np.ones(b.num_rows, dtype=np.int8), pa.int8()
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        edge_keyed = sym.map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("src").cast(pa.int64()),
                    "dst": b.column("dst").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        frontiers = [nodes_ds]
        for t in range(steps):
            cand = hash_join(
                frontiers[-1],
                edge_keyed,
                key="node",
                num_partitions=num_partitions,
            )

            def pack_cand(df: pd.DataFrame) -> pd.DataFrame:
                prev = df["prev"].to_numpy()
                dst = df["dst"].to_numpy(np.int64)
                # null prev (first move) packs to a key no edge uses
                pk = np.full(len(df), -1, dtype=np.int64)
                mask = ~pd.isna(prev)
                pk[mask] = prev[mask].astype(np.int64) * OFF + dst[mask]
                out = df[["start", "prev", "node", "dst"]].copy()
                out["pk"] = pk
                return out

            tagged = hash_join(
                cand.map_batches(
                    arrow_out(pack_cand), batch_format="pandas"
                ).materialize(),
                packed,
                key="pk",
                how="left",
                num_partitions=num_partitions,
            )

            def best_partial(df: pd.DataFrame, _t=t) -> pd.DataFrame:
                if df.empty:
                    return pd.DataFrame(
                        {
                            "start": pd.Series([], dtype=np.int64),
                            "k": pd.Series([], dtype=np.float64),
                            "prev2": pd.Series([], dtype=np.int64),
                            "dst": pd.Series([], dtype=np.int64),
                        }
                    )
                ks = np.empty(len(df), dtype=np.float64)
                prev = df["prev"].to_numpy()
                cur = df["node"].to_numpy(np.int64)
                dst = df["dst"].to_numpy(np.int64)
                tri = df["tri"].to_numpy()
                for i in range(len(df)):
                    if pd.isna(prev[i]):
                        w = 1.0
                    elif int(dst[i]) == int(prev[i]):
                        w = W_RET
                    elif not pd.isna(tri[i]):
                        w = W_TRI
                    else:
                        w = W_OUT
                    ks[i] = _exp_key(int(cur[i]), _t, int(dst[i]), w)
                d = pd.DataFrame(
                    {
                        "start": df["start"].to_numpy(np.int64),
                        "k": ks,
                        "prev2": cur,
                        "dst": dst,
                    }
                ).sort_values(["start", "k", "dst"])
                return d.drop_duplicates("start", keep="first")

            def best_final(df: pd.DataFrame) -> pd.DataFrame:
                d = df.sort_values(["start", "k", "dst"]).drop_duplicates(
                    "start", keep="first"
                )
                return pd.DataFrame(
                    {
                        "start": d["start"].to_numpy(np.int64),
                        "prev": d["prev2"].to_numpy(np.int64),
                        "node": d["dst"].to_numpy(np.int64),
                    }
                )

            frontiers.append(
                grouped_blocks(
                    tagged.map_batches(
                        arrow_out(best_partial), batch_format="pandas"
                    ),
                    ["start"],
                    best_final,
                    num_partitions,
                    batch_format="pandas",
                ).materialize()
            )

    out = None
    for t, fr in enumerate(frontiers):
        step_ds = fr.map_batches(
            lambda b, _t=t: pa.table(
                {
                    "start": b.column("start").cast(pa.int64()),
                    "step": pa.array(
                        np.full(b.num_rows, _t, dtype=np.int64), pa.int64()
                    ),
                    "node": b.column("node").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        out = step_ds if out is None else out.union(step_ds)
    return out


def walk_skipgram_pairs(
    edges,
    steps: int = 4,
    window: int = 2,
    num_partitions=None,
    plan: str = "auto",
):
    """Skip-gram training pairs over the deterministic walk corpus —
    the node2vec/DeepWalk handoff: a graph-embedding trainer consumes
    (center, context) co-occurrence counts exactly like word2vec
    consumes windowed word pairs. For every walk (one per node,
    ``steps`` moves — :func:`random_walks`) emit each ordered pair of
    positions within ``window`` of each other (1 <= |s - t| <=
    window), then count per (center, context).

    Distribution: a walk is tiny ((steps+1) rows), so pairing is
    block-local after ONE walker-keyed exchange; pair counts pre-reduce
    per block before the final (center, context) exchange. Returns
    Dataset[(center, context, n)] — deterministic because the walk
    corpus is."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    walks = random_walks(edges, steps, num_partitions, plan)

    def pair_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "center": pd.Series([], dtype=np.int64),
                    "context": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        outs = []
        df = df.sort_values(["start", "step"])
        for d in range(1, window + 1):
            g = df.groupby("start", sort=False)
            a = df.assign(context=g["node"].shift(-d))
            a = a.dropna(subset=["context"])
            # both directions of the ordered pair
            outs.append(
                pd.DataFrame(
                    {
                        "center": a["node"].to_numpy(np.int64),
                        "context": a["context"].to_numpy(np.int64),
                    }
                )
            )
            outs.append(
                pd.DataFrame(
                    {
                        "center": a["context"].to_numpy(np.int64),
                        "context": a["node"].to_numpy(np.int64),
                    }
                )
            )
        p = pd.concat(outs, ignore_index=True)
        g = p.groupby(["center", "context"], as_index=False).size()
        g.columns = ["center", "context", "n"]
        return g.astype({"center": np.int64, "context": np.int64, "n": np.int64})

    paired = grouped_blocks(
        walks, ["start"], pair_block, num_partitions, batch_format="pandas"
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["center", "context"], as_index=False)["n"].sum()
        return g.astype({"center": np.int64, "context": np.int64, "n": np.int64})

    return grouped_blocks(
        paired, ["center", "context"], combine, num_partitions,
        batch_format="pandas",
    )


def walk_negative_samples(
    edges,
    steps: int = 4,
    window: int = 2,
    k_neg: int = 2,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """Negative samples for the skip-gram walk corpus — the third leg
    of the embedding-training handoff (pairs + counts + NEGATIVES =
    what an SGNS trainer consumes): for every (center, context) pair
    of :func:`walk_skipgram_pairs`, draw ``k_neg`` nodes from the
    DEGREE distribution by deterministic inverse-CDF: u_k =
    md5_key52("center|context|k") % total_degree indexes the node
    whose cumulative-degree interval [lo, lo + deg) contains it.
    Everything is exact integers (word2vec's degree^0.75 smoothing is
    deliberately replaced by exponent 1 — the integer-exact choice;
    the smoothing seam is this function's weight column), so the draw
    is a pure function of the edge set and the SQL mirror is a range
    join against the windowed cumulative table. A draw may collide
    with the pair's own nodes (kept — resampling would make the spec
    arrival-order-dependent; SGNS tolerates it). Returns
    Dataset[(center, context, k, negative)].

    Plans: below ``broadcast_node_limit`` nodes the cumulative table
    ships once via ray.put and each draw is a block-local
    searchsorted. Above it, only the occupied node-range buckets'
    cumulative BASES broadcast (one value per range — bounded);
    interval rows co-partition by bucket, each draw routes to its
    bucket by base search, and ONE bucket-keyed exchange joins draws
    to intervals — the distributed inverse-CDF."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    pairs = walk_skipgram_pairs(edges, steps, window, num_partitions, plan)
    deg = degree_table(
        undirected_edges(edges, num_partitions), num_partitions
    ).materialize()
    n_nodes = deg.count()
    empty = pa.table(
        {
            "center": pa.array([], pa.int64()),
            "context": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
            "negative": pa.array([], pa.int64()),
        }
    )
    if n_nodes == 0:
        return ray.data.from_arrow(empty)
    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    # cumulative-degree table: node-ascending, lo = prefix sum — the
    # inverse-CDF support. Node-scale; the broadcast gate bounds the
    # driver copy, the bucket plan never materializes it centrally.
    def draws_of(center: np.ndarray, context: np.ndarray, total: int):
        rows = []
        for c_, x_ in zip(center, context):
            for k in range(k_neg):
                rows.append(
                    (
                        int(c_),
                        int(x_),
                        k,
                        md5_key52(f"{int(c_)}|{int(x_)}|{k}") % total,
                    )
                )
        return rows

    if plan == "broadcast":
        rows = sorted(
            ((int(r["node"]), int(r["deg"])) for r in deg.take_all())
        )
        nodes_arr = np.array([n for n, _ in rows], dtype=np.int64)
        degs_arr = np.array([d for _, d in rows], dtype=np.int64)
        lo = np.zeros(len(rows), dtype=np.int64)
        np.cumsum(degs_arr[:-1], out=lo[1:])
        total = int(degs_arr.sum())
        ref = ray.put((nodes_arr, lo, total))

        def sample(batch: pa.Table, _ref=ref) -> pd.DataFrame:
            nodes_, lo_, total_ = ray.get(_ref)
            c = batch.column("center").to_numpy(zero_copy_only=False)
            x = batch.column("context").to_numpy(zero_copy_only=False)
            rows_ = draws_of(c, x, total_)
            if not rows_:
                return pd.DataFrame(
                    {
                        "center": pd.Series([], dtype=np.int64),
                        "context": pd.Series([], dtype=np.int64),
                        "k": pd.Series([], dtype=np.int64),
                        "negative": pd.Series([], dtype=np.int64),
                    }
                )
            arr = np.array(rows_, dtype=np.int64)
            idx = np.searchsorted(lo_, arr[:, 3], side="right") - 1
            return pd.DataFrame(
                {
                    "center": arr[:, 0],
                    "context": arr[:, 1],
                    "k": arr[:, 2],
                    "negative": nodes_[idx],
                }
            )

        return pairs.map_batches(arrow_out(sample), batch_format="pyarrow")

    # ---- bucket (scale) plan ----
    # One pass builds per-node intervals DISTRIBUTED: the prefix sum
    # needs a global order, so reuse the exact global-rank machinery:
    # here node-scale is modest enough that a single-exchange ordinal
    # prefix is computed per bucket after an interval exchange. The
    # boundaries (n_buckets quantile cut points of cumulative mass)
    # are derived from per-node degree partials — fixed-size driver
    # state.
    rows = deg.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "deg": b.column("deg").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    # node-ordered prefix sums need a total order; bucketing must be
    # CONTIGUOUS in that order (node % k would interleave ranges), so
    # buckets are node-value ranges (node >> 16). One exchange gives
    # each bucket its internal prefix; only the bucket TOTALS (one row
    # per occupied range) come to the driver to offset them.
    SHIFT = 16

    def range_partial(batch: pa.Table) -> pd.DataFrame:
        n = batch.column("node").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        d = batch.column("deg").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pd.DataFrame(
            {"bucket": n >> SHIFT, "node": n, "deg": d}
        )

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket", as_index=False)["deg"].sum()
        return g.astype({"bucket": np.int64, "deg": np.int64})

    btotals = (
        grouped_blocks(
            rows.map_batches(arrow_out(range_partial), batch_format="pyarrow"),
            ["bucket"],
            bucket_sum,
            num_partitions,
            batch_format="pandas",
        ).take_all()
    )  # bounded: one row per occupied node-range bucket
    btotals = sorted((int(r["bucket"]), int(r["deg"])) for r in btotals)
    boundaries = {}
    acc = 0
    for bk, d in btotals:
        boundaries[bk] = acc
        acc += d
    total = acc
    b_ref = ray.put(boundaries)

    def interval_rows(df: pd.DataFrame, _ref=b_ref) -> pd.DataFrame:
        base = ray.get(_ref)
        out = []
        for bk, g in df.groupby("bucket", sort=True):
            g = g.sort_values("node")
            d = g["deg"].to_numpy(np.int64)
            lo_ = np.zeros(len(g), dtype=np.int64)
            np.cumsum(d[:-1], out=lo_[1:])
            lo_ += base[int(bk)]
            out.append(
                pd.DataFrame(
                    {
                        "bucket": np.full(len(g), int(bk), dtype=np.int64),
                        "node": g["node"].to_numpy(np.int64),
                        "lo": lo_,
                        "hi": lo_ + d,
                        "kind": np.full(len(g), 1, dtype=np.int8),
                        "center": np.zeros(len(g), dtype=np.int64),
                        "context": np.zeros(len(g), dtype=np.int64),
                        "k": np.zeros(len(g), dtype=np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    intervals = grouped_blocks(
        rows.map_batches(arrow_out(range_partial), batch_format="pyarrow"),
        ["bucket"],
        interval_rows,
        num_partitions,
        batch_format="pandas",
    )

    bounds_sorted = sorted(boundaries.items())
    bkeys = np.array([b for b, _ in bounds_sorted], dtype=np.int64)
    bbases = np.array([v for _, v in bounds_sorted], dtype=np.int64)
    bl_ref = ray.put((bkeys, bbases, total))

    def draw_rows(batch: pa.Table, _ref=bl_ref) -> pd.DataFrame:
        bk_, bb_, total_ = ray.get(_ref)
        c = batch.column("center").to_numpy(zero_copy_only=False)
        x = batch.column("context").to_numpy(zero_copy_only=False)
        rows_ = draws_of(c, x, total_)
        if not rows_:
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype=np.int64),
                    "node": pd.Series([], dtype=np.int64),
                    "lo": pd.Series([], dtype=np.int64),
                    "hi": pd.Series([], dtype=np.int64),
                    "kind": pd.Series([], dtype=np.int8),
                    "center": pd.Series([], dtype=np.int64),
                    "context": pd.Series([], dtype=np.int64),
                    "k": pd.Series([], dtype=np.int64),
                }
            )
        arr = np.array(rows_, dtype=np.int64)
        u = arr[:, 3]
        # route the draw to the bucket whose base range covers u
        bidx = np.searchsorted(bb_, u, side="right") - 1
        return pd.DataFrame(
            {
                "bucket": bk_[bidx],
                "node": np.zeros(len(arr), dtype=np.int64),
                "lo": u,  # the draw value rides in 'lo'
                "hi": np.zeros(len(arr), dtype=np.int64),
                "kind": np.zeros(len(arr), dtype=np.int8),
                "center": arr[:, 0],
                "context": arr[:, 1],
                "k": arr[:, 2],
            }
        )

    tagged = intervals.union(
        pairs.map_batches(arrow_out(draw_rows), batch_format="pyarrow")
    )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        iv = df[df["kind"] == 1].sort_values("lo")
        dr = df[df["kind"] == 0]
        if dr.empty or iv.empty:
            return pd.DataFrame(
                {
                    "center": pd.Series([], dtype=np.int64),
                    "context": pd.Series([], dtype=np.int64),
                    "k": pd.Series([], dtype=np.int64),
                    "negative": pd.Series([], dtype=np.int64),
                }
            )
        lo_ = iv["lo"].to_numpy(np.int64)
        nodes_ = iv["node"].to_numpy(np.int64)
        u = dr["lo"].to_numpy(np.int64)
        idx = np.searchsorted(lo_, u, side="right") - 1
        return pd.DataFrame(
            {
                "center": dr["center"].to_numpy(np.int64),
                "context": dr["context"].to_numpy(np.int64),
                "k": dr["k"].to_numpy(np.int64),
                "negative": nodes_[idx],
            }
        )

    return grouped_blocks(
        tagged, ["bucket"], resolve, num_partitions, batch_format="pandas"
    )


def harmonic_centrality(
    edges,
    k_seeds: int = 4,
    max_hops: int = 3,
    num_partitions=None,
    plan: str = "auto",
):
    """Bounded harmonic centrality from a deterministic seed sample:
    seeds = the ``k_seeds`` nodes with smallest (md5_key52(node),
    node); for every node v reached within ``max_hops`` of any seed,
    harmonic(v) = sum over seeds s != v with d(s,v) <= max_hops of
    1/d(s,v). Seed-sampled bounded harmonic is the standard scalable
    estimator (Eppstein-Wang 2004 pivot sampling; HyperBall is the
    sketch path) — exact all-pairs centrality is O(n*m) and off the
    table at corpus scale, so k_seeds is the accuracy/cost knob.

    Exactness: 1/d sums are computed as integers scaled by
    L = lcm(1..max_hops) (every L//d is exact), emitted as
    ``harm_num`` with ``harmonic`` = round6(harm_num / L) — one double
    division, mirrored verbatim in SQL.

    Distances reuse ops.graph.bfs_levels (frontier iteration, both
    plans) via the PRODUCT-GRAPH trick: the symmetric edge table is
    replicated once per seed index under node' = idx * 2^40 + node, so
    ONE multi-source BFS run computes all k seed distance fields
    (k x edge-scale input — k is small by construction). Returns
    Dataset[(node, harm_num, harmonic)] for reached non-seed-distance-0
    nodes, sorted by node via the final exchange's block order."""
    import ray

    from docstrange_ray.ops.graph import bfs_levels
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    OFF = 1 << 40
    sym = symmetric_edges(edges, num_partitions).materialize()
    deg = degree_table(
        undirected_edges(edges, num_partitions), num_partitions
    ).materialize()
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "harm_num": pa.array([], pa.int64()),
            "harmonic": pa.array([], pa.float64()),
        }
    )
    if deg.count() == 0:
        return ray.data.from_arrow(empty)

    # deterministic seed pick: per-batch top-k partials -> one bounded
    # final (n_blocks x k rows), never the full node table
    def seed_partial(batch: pa.Table) -> pd.DataFrame:
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (md5_key52(str(int(v))) for v in nodes),
            dtype=np.int64,
            count=len(nodes),
        )
        d = pd.DataFrame({"node": nodes.astype(np.int64), "h": h})
        return d.sort_values(["h", "node"]).head(k_seeds)

    cands = deg.map_batches(
        arrow_out(seed_partial), batch_format="pyarrow"
    )
    seed_rows = (
        coalesced_blocks(
            cands,
            lambda df: df.sort_values(["h", "node"]).head(k_seeds),
        )
        .take_all()
    )
    seeds = [int(r["node"]) for r in seed_rows]

    def replicate(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        outs, outd = [], []
        for idx in range(len(seeds)):
            outs.append(src + idx * OFF)
            outd.append(dst + idx * OFF)
        return pa.table(
            {
                "src": pa.array(np.concatenate(outs), pa.int64()),
                "dst": pa.array(np.concatenate(outd), pa.int64()),
            }
        )

    prod_edges = sym.map_batches(replicate, batch_format="pyarrow")
    levels = bfs_levels(
        prod_edges,
        seeds=[idx * OFF + s for idx, s in enumerate(seeds)],
        max_hops=max_hops,
        num_partitions=num_partitions,
        plan=plan if plan != "auto" else "auto",
    )

    L = math.lcm(*range(1, max_hops + 1))

    def harm_partial(batch: pa.Table) -> pd.DataFrame:
        comp = batch.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        lv = batch.column("level").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = lv >= 1
        node = comp[keep] % OFF
        num = np.array([L // d for d in lv[keep]], dtype=np.int64)
        g = (
            pd.DataFrame({"node": node, "hn": num})
            .groupby("node", as_index=False)["hn"]
            .sum()
        )
        return pd.DataFrame(
            {
                "node": g["node"].to_numpy(np.int64),
                "hn": g["hn"].to_numpy(np.int64),
            }
        )

    def harm_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["hn"].sum()
        harm = np.array(
            [float(round6(int(v) / L)) for v in g["hn"]], dtype=np.float64
        )
        return pd.DataFrame(
            {
                "node": g["node"].to_numpy(np.int64),
                "harm_num": g["hn"].to_numpy(np.int64),
                "harmonic": harm,
            }
        )

    return grouped_blocks(
        levels.map_batches(arrow_out(harm_partial), batch_format="pyarrow"),
        ["node"],
        harm_final,
        num_partitions,
        batch_format="pandas",
    )
