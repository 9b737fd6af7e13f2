"""Graph ops over edge tables: fixed-point PageRank (+ degree stats).

Why FIXED-POINT INTEGERS: float PageRank sums depend on reduction
order, so a distributed plan and a SQL oracle (and two runs of the
same plan) can diverge in the last ulps and accumulate across
iterations. All rank mass here is int64 scaled by ``scale`` (default
1e12) with floor division everywhere — sums of ints are
order-independent, so the broadcast plan, the co-partition plan and
the DuckDB oracle are BIT-identical by construction. The floor's
dropped remainders (< 1 unit per edge per iteration, ~1e-12 of mass)
are a documented, deterministic quantization — both sides drop the
same units.

Iteration semantics (Page et al. 1999, damping d = 85/100, dangling
mass redistributed uniformly — the standard stochastic-matrix fix):

    T0      = (15 * scale) // (100 * N)
    contrib = rank[src] // outdeg[src]          (per edge)
    dshare  = (sum of dangling ranks) // N
    rank'   = T0 + (85 * (insum + dshare)) // 100

Distributed shape: edges are hash-partitioned once; each iteration is
two pre-reduced exchanges (rank-to-edge co-partition join -> per-dst
contribution sum; then insum-to-node join -> new ranks) — the Pregel
shape, node state never on the driver except one SCALAR (the dangling
total) per iteration. Below ``broadcast_node_limit`` nodes the rank
vector is instead ray.put-broadcast and each iteration is ONE
pre-reduced exchange (the tf-idf measure-then-choose idiom). Plans are
bit-identical (pinned by tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DAMP_NUM = 85
DAMP_DEN = 100


def distinct_edges(edges, num_partitions=None):
    """Pre-reduced distinct over (src, dst): per-block drop_duplicates
    before ONE hash exchange — duplicate-heavy edge lists (one row per
    lineitem) collapse early."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local(batch: pa.Table) -> pd.DataFrame:
        return (
            batch.select(["src", "dst"])
            .to_pandas()
            .drop_duplicates()
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return grouped_blocks(
        edges.map_batches(arrow_out(local), batch_format="pyarrow"),
        ["src", "dst"],
        final,
        num_partitions,
        batch_format="pandas",
    )


def _node_table(edges, num_partitions=None, weighted: bool = False):
    """Dataset[(node, outdeg)] — every node appearing as src or dst,
    outdeg 0 for sinks. When ``weighted``, ``outdeg`` carries the
    total OUT-WEIGHT (sum of w per src) instead of the edge count —
    the only state difference weighted PageRank needs. One pre-reduced
    exchange."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if weighted:
            out = df.groupby("src", as_index=False)["w"].sum()
        else:
            out = df.groupby("src", as_index=False).size()
        out.columns = ["node", "outdeg"]
        dsts = pd.DataFrame({"node": df["dst"].unique()})
        dsts["outdeg"] = 0
        return pd.concat([out, dsts], ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["outdeg"].sum()

    return grouped_blocks(
        edges.map_batches(arrow_out(local), batch_format="pyarrow"),
        ["node"],
        final,
        num_partitions,
        batch_format="pandas",
    )


def pagerank(
    edges,
    iterations: int = 5,
    scale: int = 10**12,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
    assume_distinct: bool = False,
    weighted: bool = False,
    teleport: list[int] | None = None,
):
    """Fixed-point integer PageRank over Dataset[(src int, dst int)].

    Returns Dataset[(node int64, rank int64)] — rank in units of
    1/``scale``. Deterministic and plan-independent (integer floor
    arithmetic; see module docstring). ``plan``: 'auto' counts the
    node table and broadcasts below ``broadcast_node_limit``, else
    runs the co-partition (Pregel) plan whose per-iteration driver
    state is ONE scalar.

    ``weighted=True``: edges carry an int64 ``w`` column (1 <= w <=
    1e6 — the bound keeps rank*w inside int64 at scale=1e12); a
    source's rank splits proportionally, contribution = rank * w //
    out_weight (floor — still exact-integer, still SQL-mirrorable).
    Weighted mode requires ``assume_distinct=True`` (the caller owns
    the per-edge weight aggregation).

    ``teleport``: PERSONALIZED PageRank (Jeh & Widom 2003 / Page et
    al. 1999 §6) — the teleport and dangling mass land only on the
    given seed set instead of uniformly: seeds start with scale //
    n_seeds, non-seeds with 0; per iteration non-seeds get ONLY the
    damped in-sum while seeds add the (1-d) jump term and the
    dangling share (// n_seeds). The seed set is SMALL by contract
    (it's a query, not a partition), so both plans ship it as a plain
    broadcast set; arithmetic stays floor-integer, so PPR is as
    plan-independent and SQL-mirrorable as the uniform walk.
    ``teleport=None`` is bit-for-bit the uniform behavior.
    """
    import ray

    from docstrange_ray.shuffle import _strip_schema_metadata

    if weighted and not assume_distinct:
        raise ValueError("weighted pagerank requires assume_distinct=True "
                         "(aggregate (src, dst) -> w upstream)")
    if not assume_distinct:
        edges = distinct_edges(edges, num_partitions)
    edges = _strip_schema_metadata(edges).materialize()  # consumed every iteration
    nodes = _node_table(edges, num_partitions, weighted=weighted).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})
        )
    tele = None
    if teleport is not None:
        tele = frozenset(int(s) for s in teleport)
        if not tele:
            raise ValueError("teleport seed set must be non-empty")
        n_jump = len(tele)
    else:
        n_jump = n_nodes
    t0 = (100 - DAMP_NUM) * scale // (DAMP_DEN * n_jump)
    r_init = scale // n_jump

    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    if plan == "broadcast":
        return _pagerank_broadcast(
            edges, nodes, n_nodes, iterations, scale, t0, r_init,
            num_partitions, weighted, tele
        )
    return _pagerank_join(
        edges, nodes, n_nodes, iterations, scale, t0, r_init,
        num_partitions, weighted, tele
    )


def _pagerank_broadcast(
    edges, nodes, n_nodes, iterations, scale, t0, r_init, num_partitions,
    weighted: bool = False, tele=None,
):
    """Gated plan: the (node -> rank, outdeg) map is ray.put-broadcast
    (bounded by broadcast_node_limit); each iteration = one per-block
    vectorized contribution histogram -> one pre-reduced dst exchange
    -> bounded take_all of the new insums. ``tele`` (personalized
    mode): jump/dangling terms apply to seed nodes only."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    node_rows = nodes.take_all()  # bounded by the gate
    node_ids = np.array(sorted(r["node"] for r in node_rows), dtype=np.int64)
    outdeg = {r["node"]: r["outdeg"] for r in node_rows}
    in_jump = (lambda v: True) if tele is None else (lambda v: v in tele)
    ranks = {int(v): (r_init if in_jump(int(v)) else 0) for v in node_ids}

    for _ in range(iterations):
        dang = sum(r for v, r in ranks.items() if outdeg[v] == 0)
        dshare = dang // (n_nodes if tele is None else len(tele))
        # outdeg is a GLOBAL property: ship (rank, outdeg) together so a
        # block can turn its edges into contributions with zero exchanges
        payload_ref = ray.put(
            {int(v): (ranks[int(v)], outdeg[int(v)]) for v in node_ids}
        )

        def partial2(batch: pa.Table, _ref=payload_ref) -> pd.DataFrame:
            pmap = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            if weighted:
                w = batch.column("w").to_numpy(zero_copy_only=False)
                if (w < 1).any() or (w > 10**6).any():
                    raise ValueError("weighted pagerank: w outside [1, 1e6]")
                contrib = np.fromiter(
                    (pmap[int(s)][0] * int(ww) // pmap[int(s)][1]
                     for s, ww in zip(src, w)),
                    dtype=np.int64,
                    count=len(src),
                )
            else:
                contrib = np.fromiter(
                    (pmap[int(s)][0] // pmap[int(s)][1] for s in src),
                    dtype=np.int64,
                    count=len(src),
                )
            out = (
                pd.DataFrame({"node": dst, "c": contrib})
                .groupby("node", as_index=False)["c"]
                .sum()
            )
            return out

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False)["c"].sum()

        insums = {
            r["node"]: r["c"]
            for r in grouped_blocks(
                edges.map_batches(arrow_out(partial2), batch_format="pyarrow"),
                ["node"],
                final,
                num_partitions,
                batch_format="pandas",
            ).take_all()  # bounded by the gate
        }
        ranks = {
            int(v): (t0 if in_jump(int(v)) else 0)
            + DAMP_NUM
            * (insums.get(int(v), 0) + (dshare if in_jump(int(v)) else 0))
            // DAMP_DEN
            for v in node_ids
        }

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(node_ids, pa.int64()),
                "rank": pa.array(
                    [ranks[int(v)] for v in node_ids], pa.int64()
                ),
            }
        )
    )


def _pagerank_join(
    edges, nodes, n_nodes, iterations, scale, t0, r_init, num_partitions,
    weighted: bool = False, tele=None,
):
    """Scale plan (Pregel shape): rank state is a Dataset co-partitioned
    with the edges each iteration. Two pre-reduced exchanges per
    iteration; the only driver value is the dangling-mass SCALAR.
    ``tele`` (personalized mode): the seed set is small by contract, so
    it rides into the init/gather closures as a plain broadcast set —
    node state never gains a column."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, _strip_schema_metadata

    def init_state(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if tele is None:
            rank0 = np.full(n, r_init, dtype=np.int64)
        else:
            ids = batch.column("node").to_numpy(zero_copy_only=False)
            rank0 = np.fromiter(
                (r_init if int(v) in tele else 0 for v in ids),
                dtype=np.int64,
                count=n,
            )
        return pa.table(
            {
                "node": batch.column("node").cast(pa.int64()),
                "rank": pa.array(rank0),
                "outdeg": batch.column("outdeg").cast(pa.int64()),
            }
        )

    state = (
        nodes.map_batches(init_state, batch_format="pyarrow").materialize()
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "node": batch.column("src").cast(pa.int64()),
            "dst": batch.column("dst").cast(pa.int64()),
            "rank": pa.nulls(n, pa.int64()),
            "outdeg": pa.nulls(n, pa.int64()),
        }
        if weighted:  # w rides the edge rows only in weighted mode
            w = batch.column("w").to_numpy(zero_copy_only=False)
            if (w < 1).any() or (w > 10**6).any():
                raise ValueError("weighted pagerank: w outside [1, 1e6]")
            cols["w"] = batch.column("w").cast(pa.int64())
        cols["kind"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    edge_tagged = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        # dangling mass: one scalar to the driver
        dang = (
            state.map_batches(
                lambda b: pa.table(
                    {
                        "d": pa.array(
                            [
                                int(
                                    b.to_pandas()
                                    .query("outdeg == 0")["rank"]
                                    .sum()
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .sum("d")
        )
        dshare = int(dang or 0) // (n_nodes if tele is None else len(tele))

        def state_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "node": batch.column("node"),
                "dst": pa.nulls(n, pa.int64()),
                "rank": batch.column("rank"),
                "outdeg": batch.column("outdeg"),
            }
            if weighted:
                cols["w"] = pa.nulls(n, pa.int64())
            cols["kind"] = pa.array(np.ones(n, dtype=np.int8))
            return pa.table(cols)

        def scatter(block: pa.Table) -> pd.DataFrame:
            # stay in Arrow until after the kind split: a pandas
            # conversion of the nullable tagged union coerces int64
            # rank columns to float64 (the r3 2^53 corruption class)
            import pyarrow.compute as pc

            kind = block.column("kind")
            st = block.filter(pc.equal(kind, pa.scalar(1, pa.int8())))
            ed = block.filter(pc.equal(kind, pa.scalar(0, pa.int8())))
            if ed.num_rows == 0:
                return pd.DataFrame(
                    {
                        "node": np.array([], dtype=np.int64),
                        "c": np.array([], dtype=np.int64),
                    }
                )
            rmap = dict(
                zip(
                    st.column("node").to_numpy(zero_copy_only=False).tolist(),
                    zip(
                        st.column("rank").to_numpy(zero_copy_only=False).tolist(),
                        st.column("outdeg").to_numpy(zero_copy_only=False).tolist(),
                    ),
                )
            )
            srcs = ed.column("node").to_numpy(zero_copy_only=False).tolist()
            if weighted:
                ws = ed.column("w").to_numpy(zero_copy_only=False).tolist()
                contrib = np.fromiter(
                    (rmap[s][0] * int(ww) // rmap[s][1]
                     for s, ww in zip(srcs, ws)),
                    dtype=np.int64,
                    count=len(srcs),
                )
            else:
                contrib = np.fromiter(
                    (rmap[s][0] // rmap[s][1] for s in srcs),
                    dtype=np.int64,
                    count=len(srcs),
                )
            return (
                pd.DataFrame(
                    {
                        "node": ed.column("dst")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64),
                        "c": contrib,
                    }
                )
                .groupby("node", as_index=False)["c"]
                .sum()
            )

        # partial per-dst sums, still possibly split across blocks (the
        # exchange above was keyed by SRC); the gather exchange below is
        # keyed by dst and finishes the sum — no separate finalize pass
        insums = grouped_blocks(
            edge_tagged.union(
                state.map_batches(state_rows, batch_format="pyarrow")
            ),
            ["node"],
            scatter,
            num_partitions,
            batch_format="pyarrow",
        )

        def insum_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "rank": pa.nulls(n, pa.int64()),
                    "outdeg": pa.nulls(n, pa.int64()),
                    "c": batch.column("c").cast(pa.int64()),
                    "kind": pa.array(np.zeros(n, dtype=np.int8)),
                }
            )

        def node_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node"),
                    "rank": batch.column("rank"),
                    "outdeg": batch.column("outdeg"),
                    "c": pa.nulls(n, pa.int64()),
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        def gather(block: pa.Table, _dshare=dshare) -> pa.Table:
            import pyarrow.compute as pc

            kind = block.column("kind")
            st = block.filter(pc.equal(kind, pa.scalar(1, pa.int8())))
            ib = block.filter(pc.equal(kind, pa.scalar(0, pa.int8())))
            ins: dict = {}
            for v, c in zip(
                ib.column("node").to_numpy(zero_copy_only=False).tolist(),
                ib.column("c").to_numpy(zero_copy_only=False).tolist(),
            ):
                ins[v] = ins.get(v, 0) + c
            nodes_ = st.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            if tele is None:
                new_rank = np.fromiter(
                    (
                        t0
                        + DAMP_NUM * (int(ins.get(int(v), 0)) + _dshare) // DAMP_DEN
                        for v in nodes_
                    ),
                    dtype=np.int64,
                    count=len(nodes_),
                )
            else:
                new_rank = np.fromiter(
                    (
                        (t0 if int(v) in tele else 0)
                        + DAMP_NUM
                        * (int(ins.get(int(v), 0))
                           + (_dshare if int(v) in tele else 0))
                        // DAMP_DEN
                        for v in nodes_
                    ),
                    dtype=np.int64,
                    count=len(nodes_),
                )
            return pa.table(
                {
                    "node": pa.array(nodes_, pa.int64()),
                    "rank": pa.array(new_rank, pa.int64()),
                    "outdeg": st.column("outdeg").cast(pa.int64()),
                }
            )

        state = _strip_schema_metadata(
            grouped_blocks(
                insums.map_batches(insum_rows, batch_format="pyarrow").union(
                    state.map_batches(node_rows, batch_format="pyarrow")
                ),
                ["node"],
                gather,
                num_partitions,
                batch_format="pyarrow",
            )
        ).materialize()  # flat lineage: next iteration starts fresh

    return state.map_batches(
        lambda b: b.select(["node", "rank"]), batch_format="pyarrow"
    )


def purchase_pagerank(sf_dir: str, iterations: int = 5, plan: str = "auto"):
    """PageRank over the customer->supplier purchase graph: one edge per
    DISTINCT (o_custkey, l_suppkey) in orders x lineitem. Node id space
    is disjoint by parity (customer k -> 2k, supplier k -> 2k+1).
    Suppliers are sinks (all dangling), so the dangling redistribution
    is load-bearing, not decorative. Column-pruned reads; the
    order-key join is the co-partition hash_join."""
    import pyarrow.compute as pc

    from docstrange_ray.io import read_parquet_clean
    from docstrange_ray.shuffle import hash_join

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_suppkey"]),
        batch_format="pyarrow",
    )
    joined = hash_join(orders, li, key="o_orderkey")

    def to_edges(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").cast(pa.int64())
        supp = batch.column("l_suppkey").cast(pa.int64())
        return pa.table(
            {
                "src": pc.multiply(cust, pa.scalar(2, pa.int64())),
                "dst": pc.add(
                    pc.multiply(supp, pa.scalar(2, pa.int64())),
                    pa.scalar(1, pa.int64()),
                ),
            }
        )

    edges = joined.map_batches(to_edges, batch_format="pyarrow")
    return pagerank(edges, iterations=iterations, plan=plan)


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented wedge check) + BFS levels
# ---------------------------------------------------------------------------


def undirected_edges(edges, num_partitions=None):
    """Normalize a directed edge Dataset to DISTINCT undirected edges
    ``(a < b)``, self-loops dropped. Pre-reduced: per-block normalize +
    drop_duplicates before ONE hash exchange."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local(batch: pa.Table) -> pd.DataFrame:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return grouped_blocks(
        edges.map_batches(arrow_out(local), batch_format="pyarrow"),
        ["a", "b"],
        final,
        num_partitions,
        batch_format="pandas",
    )


def degree_table(uedges, num_partitions=None):
    """Dataset[(node, deg)] over DISTINCT undirected edges (a, b): each
    edge contributes 1 to both endpoints. One pre-reduced exchange."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local(batch: pa.Table) -> pd.DataFrame:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        both = np.concatenate([a, b])
        out = pd.DataFrame({"node": both}).groupby("node", as_index=False).size()
        out.columns = ["node", "deg"]
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["deg"].sum()

    return grouped_blocks(
        uedges.map_batches(arrow_out(local), batch_format="pyarrow"),
        ["node"],
        final,
        num_partitions,
        batch_format="pandas",
    )


def _oriented_edges_broadcast(uedges, deg_rows, num_partitions=None):
    """Gated plan: the degree map is ray.put-broadcast; orientation is a
    shuffle-free scan. Emits (u, v, dv) with (deg, node) order u < v."""
    import ray

    deg_ref = ray.put({int(r["node"]): int(r["deg"]) for r in deg_rows})

    def orient(batch: pa.Table) -> pa.Table:
        dm = ray.get(deg_ref)
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        da = np.fromiter((dm[int(x)] for x in a), dtype=np.int64, count=len(a))
        db = np.fromiter((dm[int(x)] for x in b), dtype=np.int64, count=len(b))
        # orient from lower (deg, node) to higher: every node's
        # OUT-degree is then <= O(sqrt(2m)), which bounds the wedge
        # explode below (the Chiba-Nishizeki / MR node-iterator bound)
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "dv": pa.array(dv, pa.int64()),
            }
        )

    return uedges.map_batches(orient, batch_format="pyarrow")


def _oriented_edges_join(uedges, deg, num_partitions=None):
    """Scale plan: attach both endpoint degrees with two co-partition
    hash_joins (degree table is corpus-scale node state — never on the
    driver), then orient in a scan."""
    from docstrange_ray.shuffle import hash_join

    def as_a(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "da"])

    def as_b(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "db"])

    e1 = hash_join(
        uedges.map_batches(
            lambda t: t.rename_columns(["node", "b"]), batch_format="pyarrow"
        ),
        deg.map_batches(as_a, batch_format="pyarrow"),
        key="node",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.select(["node", "b", "da"]).rename_columns(["a", "node", "da"]),
        batch_format="pyarrow",
    )
    e2 = hash_join(
        e1,
        deg.map_batches(as_b, batch_format="pyarrow"),
        key="node",
        num_partitions=num_partitions,
    )

    def orient(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["node"].to_numpy(dtype=np.int64)
        da = df["da"].to_numpy(dtype=np.int64)
        db = df["db"].to_numpy(dtype=np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "dv": pa.array(dv, pa.int64()),
            }
        )

    return e2.map_batches(orient, batch_format="pyarrow")


def triangle_stats(
    edges,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """Per-node triangle counts + local clustering coefficient over an
    (arbitrarily directed, possibly duplicated) edge Dataset.

    Algorithm (MR node-iterator with degree orientation — Suri &
    Vassilvitskii 2011 "Counting Triangles and the Curse of the Last
    Reducer"): orient each undirected edge from lower (deg, node) to
    higher, so every triangle has exactly ONE wedge at its lowest
    vertex and per-node out-degree is bounded by O(sqrt(2m)) — the hot
    node that makes naive wedge counting quadratic cannot exist after
    orientation. Wedges (pairs of out-neighbors) are then matched
    against the oriented edge set with ONE (x, y)-keyed exchange.

    Exchanges: distinct(1) + degrees(1) + orientation(0 broadcast / 2
    join) + wedge-group(1) + wedge-probe(1) + node-sum(1) + final
    degree attach(0 broadcast / 1 join). ``plan='auto'`` broadcasts the
    degree map below ``broadcast_node_limit`` nodes (the tf-idf
    measure-then-choose idiom), else co-partition joins.

    Returns Dataset[(node, deg, triangles, clustering)] for every node
    with deg >= 1; clustering = round6(2*T / (deg*(deg-1))) (0.0 for
    deg < 2). Deterministic (integer counts; one float division at
    emit, rounded half-away like every oracle-facing emit site).
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    ue = undirected_edges(edges, num_partitions).materialize()
    deg = degree_table(ue, num_partitions).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                    "triangles": pa.array([], pa.int64()),
                    "clustering": pa.array([], pa.float64()),
                }
            )
        )
    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    if plan == "broadcast":
        deg_rows = deg.take_all()  # bounded by the gate
        oriented = _oriented_edges_broadcast(ue, deg_rows, num_partitions)
    else:
        deg_rows = None
        oriented = _oriented_edges_join(ue, deg, num_partitions)
    oriented = oriented.materialize()  # consumed twice (wedges + probe)

    def wedges(block: pa.Table) -> pd.DataFrame:
        # all out-neighbor pairs per u, pair ordered by (deg, node) so
        # the closing edge (if any) appears EXACTLY as (x, y) in the
        # oriented set; np.triu_indices keeps the pair gen vectorized
        df = block.to_pandas().sort_values(["u", "dv", "v"])
        outs = []
        for u, sub in df.groupby("u", sort=False):
            vs = sub["v"].to_numpy(dtype=np.int64)
            k = len(vs)
            if k < 2:
                continue
            i, j = np.triu_indices(k, 1)
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
        # Arrow-side split before pandas (the tagged-union int64 rule)
        import pyarrow.compute as pc

        kind = block.column("kind")
        ed = block.filter(pc.equal(kind, pa.scalar(1, pa.int8())))
        wd = block.filter(pc.equal(kind, pa.scalar(0, pa.int8())))
        if wd.num_rows == 0 or ed.num_rows == 0:
            return pd.DataFrame(
                {"node": np.array([], dtype=np.int64), "t": np.array([], dtype=np.int64)}
            )
        # composite key: node ids fit in int64 but pairing needs care —
        # use a structured join via pandas merge on (x, y)
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
            return pd.DataFrame(
                {"node": np.array([], dtype=np.int64), "t": np.array([], dtype=np.int64)}
            )
        # each matched wedge = one triangle; all three corners count it
        nodes = np.concatenate(
            [
                hit["center"].to_numpy(dtype=np.int64),
                hit["x"].to_numpy(dtype=np.int64),
                hit["y"].to_numpy(dtype=np.int64),
            ]
        )
        out = pd.DataFrame({"node": nodes}).groupby("node", as_index=False).size()
        out.columns = ["node", "t"]
        return out

    partial_t = grouped_blocks(
        tagged, ["x", "y"], probe, num_partitions, batch_format="pyarrow"
    )

    def sum_t(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["t"].sum()

    tri = grouped_blocks(
        partial_t, ["node"], sum_t, num_partitions, batch_format="pandas"
    )

    if plan == "broadcast":
        deg_ref = ray.put({int(r["node"]): int(r["deg"]) for r in deg_rows})

        def attach(batch: pa.Table) -> pa.Table:
            dm = ray.get(deg_ref)
            nodes = batch.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            t = batch.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
            tmap = dict(zip(nodes.tolist(), t.tolist()))
            all_nodes = np.array(sorted(dm), dtype=np.int64)
            degs = np.fromiter((dm[int(v)] for v in all_nodes), dtype=np.int64)
            tri_c = np.fromiter(
                (tmap.get(int(v), 0) for v in all_nodes), dtype=np.int64
            )
            return _emit_tri(all_nodes, degs, tri_c)

        # the triangle table is <= n_nodes rows (bounded by the gate):
        # coalesce once and emit every node, 0-triangle nodes included
        from docstrange_ray.shuffle import coalesced_blocks

        return coalesced_blocks(tri, attach, batch_format="pyarrow")

    joined = hash_join(
        deg, tri, key="node", how="left", num_partitions=num_partitions
    )

    def emit(df: pd.DataFrame) -> pa.Table:
        nodes = df["node"].to_numpy(dtype=np.int64)
        degs = df["deg"].to_numpy(dtype=np.int64)
        # left join: missing t is NaN (bounded columns, never ids)
        t = df["t"].fillna(0).to_numpy(dtype=np.int64)
        return _emit_tri(nodes, degs, t)

    return joined.map_batches(arrow_out(emit), batch_format="pandas")


def _emit_tri(nodes: np.ndarray, degs: np.ndarray, tri: np.ndarray) -> pa.Table:
    from docstrange_ray.numerics import round6

    denom = degs.astype(np.float64) * (degs.astype(np.float64) - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        cl = np.where(denom > 0, 2.0 * tri.astype(np.float64) / denom, 0.0)
    cl = round6(cl)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "deg": pa.array(degs, pa.int64()),
            "triangles": pa.array(tri, pa.int64()),
            "clustering": pa.array(cl, pa.float64()),
        }
    )


def bfs_levels(
    edges,
    seeds: list[int],
    max_hops: int = 4,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """Minimum hop distance from a seed set along DIRECTED edges, capped
    at ``max_hops`` (symmetrize the edge table first for undirected
    reach). Returns Dataset[(node, level)] for every reached node.

    Frontier iteration (the Pregel shape): at hop h the frontier is the
    set of nodes first reached at h-1; one co-partition probe per hop
    discovers the next frontier; a node's level is written once and
    never revisited, so output is deterministic and plan-independent
    (levels are ints; min-hop semantics need no tie-breaking).

    ``plan='auto'``: below ``broadcast_node_limit`` reached nodes the
    visited set is ray.put-broadcast and each hop is ONE pre-reduced
    exchange (bounded take_all of the newly-reached ids). Above it the
    state lives as a Dataset co-partitioned with the edges: per hop,
    frontier x edges via ONE tagged-union exchange keyed by src, then a
    state merge keyed by node; the only driver value per hop is the
    frontier COUNT (the loop-termination scalar). Skew note: a hot
    src's out-edges land in one block; the probe emits each dst once
    per block (pre-reduced distinct) so frontier fan-out, not raw edge
    multiplicity, bounds the exchange.
    """
    import ray

    from docstrange_ray.shuffle import (
        _strip_schema_metadata,
        arrow_out,
        grouped_blocks,
    )

    seeds = sorted({int(s) for s in seeds})
    if not seeds:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "level": pa.array([], pa.int64())}
            )
        )
    edges = _strip_schema_metadata(edges).materialize()  # consumed every hop

    if plan == "auto":
        plan = "broadcast"  # switches to 'join' mid-run if the gate breaks

    if plan == "broadcast":
        levels: dict[int, int] = {s: 0 for s in seeds}
        frontier = set(seeds)
        for hop in range(1, max_hops + 1):
            if not frontier or len(levels) > broadcast_node_limit:
                break
            f_ref = ray.put(frontier)

            def probe(batch: pa.Table, _ref=f_ref) -> pd.DataFrame:
                fr = ray.get(_ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                mask = np.fromiter(
                    (int(s) in fr for s in src), dtype=bool, count=len(src)
                )
                return pd.DataFrame({"node": np.unique(dst[mask])})

            def distinct(df: pd.DataFrame) -> pd.DataFrame:
                return df.drop_duplicates()

            reached = grouped_blocks(
                edges.map_batches(arrow_out(probe), batch_format="pyarrow"),
                ["node"],
                distinct,
                num_partitions,
                batch_format="pandas",
            ).take_all()  # bounded by the gate (distinct reached nodes)
            frontier = {
                int(r["node"]) for r in reached if int(r["node"]) not in levels
            }
            for v in frontier:
                levels[v] = hop
        nodes = np.array(sorted(levels), dtype=np.int64)
        lv = np.fromiter((levels[int(v)] for v in nodes), dtype=np.int64)
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array(nodes, pa.int64()), "level": pa.array(lv, pa.int64())}
            )
        )

    # ---- join (scale) plan: state never leaves the cluster ----
    state = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(seeds, pa.int64()),
                "level": pa.array(np.zeros(len(seeds), dtype=np.int64)),
            }
        )
    ).materialize()
    frontier_ds = state

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": batch.column("src").cast(pa.int64()),
                "dst": batch.column("dst").cast(pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    edge_tagged = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    for hop in range(1, max_hops + 1):
        if frontier_ds.count() == 0:
            break

        def front_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "dst": pa.nulls(n, pa.int64()),
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        def probe(block: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc

            kind = block.column("kind")
            fr = block.filter(pc.equal(kind, pa.scalar(1, pa.int8())))
            ed = block.filter(pc.equal(kind, pa.scalar(0, pa.int8())))
            if fr.num_rows == 0 or ed.num_rows == 0:
                return pd.DataFrame({"node": np.array([], dtype=np.int64)})
            fset = set(
                fr.column("node").to_numpy(zero_copy_only=False).tolist()
            )
            src = ed.column("node").to_numpy(zero_copy_only=False)
            dst = ed.column("dst").to_numpy(zero_copy_only=False)
            mask = np.fromiter(
                (int(s) in fset for s in src), dtype=bool, count=len(src)
            )
            return pd.DataFrame({"node": np.unique(dst[mask].astype(np.int64))})

        cand = grouped_blocks(
            edge_tagged.union(
                frontier_ds.map_batches(front_rows, batch_format="pyarrow")
            ),
            ["node"],
            probe,
            num_partitions,
            batch_format="pyarrow",
        )

        def cand_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "level": pa.nulls(n, pa.int64()),
                    "kind": pa.array(np.zeros(n, dtype=np.int8)),
                }
            )

        def state_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "level": batch.column("level").cast(pa.int64()),
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        def merge(block: pa.Table, _hop=hop) -> pd.DataFrame:
            import pyarrow.compute as pc

            kind = block.column("kind")
            st = block.filter(pc.equal(kind, pa.scalar(1, pa.int8())))
            cd = block.filter(pc.equal(kind, pa.scalar(0, pa.int8())))
            known = set(st.column("node").to_numpy(zero_copy_only=False).tolist())
            new = [
                int(v)
                for v in set(
                    cd.column("node").to_numpy(zero_copy_only=False).tolist()
                )
                if int(v) not in known
            ]
            out = pd.DataFrame(
                {
                    "node": np.concatenate(
                        [
                            st.column("node")
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64),
                            np.array(new, dtype=np.int64),
                        ]
                    ),
                    "level": np.concatenate(
                        [
                            st.column("level")
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64),
                            np.full(len(new), _hop, dtype=np.int64),
                        ]
                    ),
                }
            )
            out["is_new"] = (out["level"] == _hop).astype(np.int8)
            return out

        merged = grouped_blocks(
            cand.map_batches(cand_rows, batch_format="pyarrow").union(
                state.map_batches(state_rows, batch_format="pyarrow")
            ),
            ["node"],
            merge,
            num_partitions,
            batch_format="pyarrow",
        ).materialize()  # flat lineage per hop

        state = merged.map_batches(
            lambda b: b.select(["node", "level"]), batch_format="pyarrow"
        ).materialize()
        def only_new(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(
                pc.equal(b.column("is_new"), pa.scalar(1, pa.int8()))
            ).select(["node", "level"])

        frontier_ds = merged.map_batches(
            only_new, batch_format="pyarrow"
        ).materialize()

    return state.map_batches(
        lambda b: b.select(["node", "level"]), batch_format="pyarrow"
    )


def copurchase_path_edges(sf_dir: str, num_partitions=None):
    """Part co-purchase PATH graph: per order, the distinct parts sorted
    by key are chained consecutively (p1-p2, p2-p3, ...) — edge count
    stays LINEAR in lineitem rows, unlike the per-order clique explode
    (quadratic in order size), so the graph build survives wide orders.
    One order-key exchange. Returns Dataset[(src, dst)] (directed
    low-key -> high-key; symmetrize for undirected reach)."""
    from docstrange_ray.io import read_parquet_clean
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def local(batch: pa.Table) -> pd.DataFrame:
        return batch.to_pandas().drop_duplicates()

    def chain(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["l_orderkey", "l_partkey"])
        ok = df["l_orderkey"].to_numpy()
        p = df["l_partkey"].to_numpy(dtype=np.int64)
        same = ok[1:] == ok[:-1]
        return pd.DataFrame({"src": p[:-1][same], "dst": p[1:][same]})

    return grouped_blocks(
        li.map_batches(arrow_out(local), batch_format="pyarrow"),
        ["l_orderkey"],
        chain,
        num_partitions,
        batch_format="pandas",
    )


def k_core(
    edges,
    k: int,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
    max_rounds: int = 100,
):
    """Maximal k-core: the largest subgraph in which every node has
    degree >= ``k`` (over the DISTINCT undirected simple graph). The
    standard graph-curation filter (spam/host pruning): peel all
    nodes below degree k, recompute, repeat to the FIXPOINT — which is
    unique regardless of peel order, so the op is deterministic and
    plan-independent. Rounds are data-dependent (worst case a path
    peels 2 nodes/round, power-law web graphs converge in O(log n)
    rounds — Montresor et al. 2013); ``max_rounds`` is a safety bound
    and raises if the fixpoint was not reached (never silently wrong).

    Returns Dataset[(node, deg)] — core members with their in-core
    degree.

    Plans: below ``broadcast_node_limit`` CURRENT nodes the peel runs
    on the driver over the (node, deg) table with the edge list
    re-filtered by a broadcast survivor set per round (ONE pre-reduced
    degree exchange per round). Above it, survivors stay a Dataset:
    each round re-derives degrees with one exchange and drops edges
    with two co-partition membership joins (src, then dst) — node
    state never on the driver, loop scalar = peel count.
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ue = undirected_edges(edges, num_partitions).materialize()
    deg = degree_table(ue, num_partitions).materialize()
    n_nodes = deg.count()
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
    )
    if n_nodes == 0:
        return ray.data.from_arrow(empty)
    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    if plan == "broadcast":
        # bounded by the gate: the degree table (node-scale, never
        # edge-scale) comes to the driver ONCE; rounds re-filter the
        # edge Dataset against a broadcast survivor set
        degs = {int(r["node"]): int(r["deg"]) for r in deg.take_all()}
        survivors = set(degs)
        for _ in range(max_rounds):
            peel = {v for v in survivors if degs[v] < k}
            if not peel:
                break
            survivors -= peel
            if not survivors:
                break
            surv_ref = ray.put(survivors)

            def local_deg(batch: pa.Table, _ref=surv_ref) -> pd.DataFrame:
                sv = ray.get(_ref)
                a = batch.column("a").to_numpy(zero_copy_only=False)
                b = batch.column("b").to_numpy(zero_copy_only=False)
                keep = np.fromiter(
                    (int(x) in sv and int(y) in sv for x, y in zip(a, b)),
                    dtype=bool,
                    count=len(a),
                )
                both = np.concatenate([a[keep], b[keep]])
                out = (
                    pd.DataFrame({"node": both})
                    .groupby("node", as_index=False)
                    .size()
                )
                out.columns = ["node", "deg"]
                return out

            def final(df: pd.DataFrame) -> pd.DataFrame:
                return df.groupby("node", as_index=False)["deg"].sum()

            degs = {
                int(r["node"]): int(r["deg"])
                for r in grouped_blocks(
                    ue.map_batches(arrow_out(local_deg), batch_format="pyarrow"),
                    ["node"],
                    final,
                    num_partitions,
                    batch_format="pandas",
                ).take_all()
            }
            # survivors that lost ALL edges have no degree row left
            for v in survivors - set(degs):
                degs[v] = 0
        else:
            raise RuntimeError(f"k_core: no fixpoint within {max_rounds} rounds")
        members = sorted(v for v in survivors if degs.get(v, 0) >= k)
        if not members:
            return ray.data.from_arrow(empty)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(members, pa.int64()),
                    "deg": pa.array(
                        [degs[v] for v in members], pa.int64()
                    ),
                }
            )
        )

    # ---- join (scale) plan ----
    from docstrange_ray.shuffle import hash_join

    cur = ue
    cur_deg = deg
    for _ in range(max_rounds):
        peel_n = cur_deg.map_batches(
            lambda b: pa.table(
                {
                    "p": pa.array(
                        [
                            int(
                                (
                                    b.column("deg")
                                    .to_numpy(zero_copy_only=False)
                                    < k
                                ).sum()
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("p")
        if not peel_n:
            break

        def keep_rows(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.greater_equal(batch.column("deg"), pa.scalar(k, pa.int64()))
            ).select(["node"])

        keep = cur_deg.map_batches(keep_rows, batch_format="pyarrow").materialize()
        if keep.count() == 0:
            return ray.data.from_arrow(empty)
        # drop edges with a peeled endpoint: two co-partition SEMI joins
        e_a = hash_join(
            cur.map_batches(
                lambda t: t.rename_columns(["node", "b"]), batch_format="pyarrow"
            ),
            keep,
            key="node",
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: t.rename_columns(["a", "node"]), batch_format="pyarrow"
        )
        cur = (
            hash_join(e_a, keep, key="node", num_partitions=num_partitions)
            .map_batches(
                lambda t: t.select(["a", "node"]).rename_columns(["a", "b"]),
                batch_format="pyarrow",
            )
            .materialize()  # flat lineage per round
        )
        cur_deg = degree_table(cur, num_partitions).materialize()
    else:
        raise RuntimeError(f"k_core: no fixpoint within {max_rounds} rounds")

    def only_core(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch.column("deg"), pa.scalar(k, pa.int64()))
        )

    return cur_deg.map_batches(only_core, batch_format="pyarrow")


def connected_components(edges, max_rounds: int = 50, num_partitions=None):
    """Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — converges in O(log^2 n) rounds regardless of component
    DIAMETER, unlike plain min-label propagation (ops/dedup.
    dup_clusters_ds), which needs O(diameter) rounds and crawls on the
    path-shaped graphs ``copurchase_path_edges`` produces. Each round
    is ONE node-key exchange:

      * large-star: every node u (full symmetrized neighborhood) hooks
        each LARGER neighbor directly to ``m = min(N(u) + [u])`` —
        flattens tall chains toward local minima;
      * small-star: every node u (only its smaller-or-equal neighbors)
        re-hooks them AND ITSELF to the minimum — collapses the
        resulting shrubs into stars.

    Edges are always re-emitted oriented (big, small), self-loops
    dropped, per-group deduped; at the fixpoint the edge set IS the
    star forest (leaf -> component-min), whose per-round output is a
    stable multiset, detected by an order-independent md5-sum
    signature (the dup_clusters_ds convergence idiom — no driver
    materialization of anything but one scalar per round).

    Returns Dataset[(node, component)] for every node incident to an
    edge; ``component`` = the component's min node id. Isolated nodes
    never appear (they have no edges) — union them in at the caller if
    the node universe matters. Raises if ``max_rounds`` is hit
    (components are then possibly unmerged — honesty over silence).
    """
    import hashlib

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def canon(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        a = df.iloc[:, 0].to_numpy(np.int64)
        b = df.iloc[:, 1].to_numpy(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pd.DataFrame(
            {"big": np.maximum(a, b), "small": np.minimum(a, b)}
        ).drop_duplicates()

    cur = edges.map_batches(arrow_out(canon), batch_format="pyarrow").materialize()
    if cur.count() == 0:
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                }
            )
        )

    def _sig(ds) -> int:
        def sig_batch(batch: pa.Table) -> pa.Table:
            total = 0
            for x, y in zip(
                batch.column("big").to_pylist(), batch.column("small").to_pylist()
            ):
                h = hashlib.md5(f"{x}\x00{y}".encode()).digest()[:8]
                total = (total + int.from_bytes(h, "big")) & ((1 << 63) - 1)
            return pa.Table.from_arrays(
                [pa.array([total], pa.int64())], names=["sig"]
            )

        parts = ds.map_batches(sig_batch, batch_format="pyarrow").take_all()
        return sum(r["sig"] for r in parts) & ((1 << 63) - 1)

    def large_star(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        if not len(df):
            return pd.DataFrame({"big": pd.Series(dtype="int64"),
                                 "small": pd.Series(dtype="int64")})
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        m = np.minimum(df.groupby("u")["v"].transform("min").to_numpy(np.int64), u)
        sel = v > u
        return pd.DataFrame({"big": v[sel], "small": m[sel]}).drop_duplicates()

    def small_star(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        if not len(df):
            return pd.DataFrame({"big": pd.Series(dtype="int64"),
                                 "small": pd.Series(dtype="int64")})
        big = df["big"].to_numpy(np.int64)
        small = df["small"].to_numpy(np.int64)
        m = df.groupby("big")["small"].transform("min").to_numpy(np.int64)
        sel = small != m  # rehook non-min smaller neighbors to the min
        firsts = ~df["big"].duplicated().to_numpy()  # one self-attach per u
        return pd.DataFrame(
            {
                "big": np.concatenate([small[sel], big[firsts]]),
                "small": np.concatenate([m[sel], m[firsts]]),
            }
        ).drop_duplicates()

    def symmetrize(batch: pa.Table) -> pa.Table:
        big = batch.column("big").combine_chunks()
        small = batch.column("small").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([big, small]), pa.concat_arrays([small, big])],
            names=["u", "v"],
        )

    prev = None
    for _ in range(max_rounds):
        sym = cur.map_batches(symmetrize, batch_format="pyarrow")
        after_large = grouped_blocks(
            sym, ["u"], large_star, num_partitions, batch_format="pandas"
        )
        cur = grouped_blocks(
            after_large, ["big"], small_star, num_partitions, batch_format="pandas"
        ).materialize()
        sig = _sig(cur)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    def labels(batch: pa.Table) -> pa.Table:
        big = batch.column("big")
        small = batch.column("small")
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([big.combine_chunks(), small.combine_chunks()]),
                pa.concat_arrays([small.combine_chunks(), small.combine_chunks()]),
            ],
            names=["node", "component"],
        )

    return grouped_blocks(
        cur.map_batches(labels, batch_format="pyarrow"),
        ["node"],
        lambda df: df.groupby("node", as_index=False)["component"].min(),
        num_partitions,
        batch_format="pandas",
    )


def link_predictions(
    uedges,
    min_cn: int = 1,
    max_center_degree: int | None = None,
    scale: int = 1_000_000,
    num_partitions=None,
):
    """Link prediction over DISTINCT undirected edges ``(a < b)``:
    common-neighbor counts + Adamic-Adar scores (Adamic & Adar 2003,
    "Friends and neighbors on the Web") for every NON-edge pair sharing
    at least ``min_cn`` neighbors.

    Why integer micro-weights: Adamic-Adar sums 1/ln(deg(center)) over
    shared centers — float sums are reduction-order-dependent, so each
    wedge's weight is quantized ONCE to ``floor(scale/ln(deg) + 0.5)``
    (int64) and only integers are summed (the label_centroid_sims
    discipline: quantize BEFORE reduction). Python ``math.log`` and
    DuckDB ``LN`` are bit-identical libm doubles (pinned for deg up to
    2*10^5 by tests), so SQL oracles reproduce scores exactly.

    Distributed shape — exactly TWO pre-reduced exchanges:

      1. adjacency: each edge contributes both (ctr, nbr) directions;
         ONE center-key exchange groups neighbors. deg(ctr) = group size
         (edges are distinct — no degree table or join needed). Each
         center emits its triu neighbor pairs (u < w) carrying
         (cn=1, aa=weight(deg)), pre-summed per block before leaving.
      2. pair merge: candidate wedge partials UNION edge rows tagged
         ``kind=1``; ONE (a, b) exchange sums partials and drops any
         pair that co-locates with an edge row (the anti-join is free —
         no third exchange).

    Hot-hub contract: a center of degree d emits d(d-1)/2 wedge pairs —
    genuinely the answer's size (every pair sharing that hub IS a
    prediction), but a web-scale hub can dominate a block. With
    ``max_center_degree`` set, centers above it are demoted
    DETERMINISTICALLY on exact degree (the MOSS max-df discipline;
    principled here because a demoted hub's per-pair evidence is at most
    1/ln(cap) — the weakest signal in the graph). Default None = exact;
    demotion must be mirrored in any oracle.

    Returns Dataset[(a, b, cn, aa_micro)] — aa_micro = the exact int64
    Adamic-Adar sum in 1/``scale`` units.
    """
    import math

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    uedges = uedges.materialize()  # consumed by both exchanges

    def adj_local(batch: pa.Table) -> pd.DataFrame:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "ctr": np.concatenate([a, b]),
                "nbr": np.concatenate([b, a]),
            }
        )

    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in df.groupby("ctr", sort=False):
            nb = np.sort(sub["nbr"].to_numpy(dtype=np.int64))
            d = len(nb)
            if d < 2 or (max_center_degree is not None and d > max_center_degree):
                continue
            w = int(math.floor(scale / math.log(d) + 0.5))
            iu, ju = np.triu_indices(d, 1)
            outs.append(
                pd.DataFrame(
                    {"a": nb[iu], "b": nb[ju], "cn": np.int64(1),
                     "aa_micro": np.int64(w)}
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "cn": pd.Series(dtype="int64"),
                    "aa_micro": pd.Series(dtype="int64"),
                    "kind": pd.Series(dtype="int8"),
                }
            )
        out = (
            pd.concat(outs, ignore_index=True)
            .groupby(["a", "b"], as_index=False)[["cn", "aa_micro"]]
            .sum()
        )
        out["kind"] = np.int8(0)
        return out

    candidates = grouped_blocks(
        uedges.map_batches(arrow_out(adj_local), batch_format="pyarrow"),
        ["ctr"],
        wedge_pairs,
        num_partitions,
        batch_format="pandas",
    )

    def tag_edges(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["a", "b"]).to_pandas()
        df["cn"] = np.int64(0)
        df["aa_micro"] = np.int64(0)
        df["kind"] = np.int8(1)
        return df

    tagged = uedges.map_batches(arrow_out(tag_edges), batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["a", "b"], as_index=False).agg(
            cn=("cn", "sum"), aa_micro=("aa_micro", "sum"), edge=("kind", "max")
        )
        agg = agg[(agg["edge"] == 0) & (agg["cn"] >= min_cn)]
        return agg[["a", "b", "cn", "aa_micro"]]

    return grouped_blocks(
        candidates.union(tagged),
        ["a", "b"],
        merge,
        num_partitions,
        batch_format="pandas",
    )


def copurchase_weighted_edges(sf_dir: str, num_partitions=None):
    """Weighted co-purchase path edges: the distinct directed path edge
    (src < dst, :func:`copurchase_path_edges`) with an integer affinity
    COST ``w = max(1, 1000 // c)`` where c = number of orders producing
    the edge — frequently co-purchased pairs are cheap to traverse.
    ONE (src, dst) count exchange over the (already linear-in-lineitem)
    path-edge stream. Returns Dataset[(src, dst, w)] (all int64).
    """
    from docstrange_ray.shuffle import grouped_blocks

    edges = copurchase_path_edges(sf_dir, num_partitions)

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["src", "dst"], as_index=False).size()
        out.columns = ["src", "dst", "c"]
        w = np.maximum(1, 1000 // out["c"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "src": out["src"].to_numpy(np.int64),
                "dst": out["dst"].to_numpy(np.int64),
                "w": w.astype(np.int64),
            }
        )

    return grouped_blocks(
        edges, ["src", "dst"], weigh, num_partitions, batch_format="pandas"
    )


def sssp_bounded(
    edges,
    seeds: list[int],
    max_hops: int = 4,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """Hop-bounded single-source (multi-seed) cheapest paths along
    DIRECTED weighted edges: for every node reachable within
    ``max_hops`` edges, the minimum total edge cost over all paths of
    <= ``max_hops`` hops from any seed. Exactly ``max_hops`` rounds of
    Bellman-Ford relaxation (the invariant: after round h, dist[v] =
    min cost over <= h-hop paths), so the result is a pure function of
    (edges, seeds, max_hops) — deterministic integer min, no
    tie-breaking, SQL-mirrorable by a hop-bounded recursive CTE.
    Negative weights are rejected (min over bounded-hop paths is still
    well-defined but the relaxation-frontier pruning below is not).

    Returns Dataset[(node, dist)] — seeds included at dist 0.

    Plans (the :func:`bfs_levels` pair): below ``broadcast_node_limit``
    REACHED nodes, the dist map lives on the driver and each round
    broadcasts only the IMPROVED frontier (ray.put once per round) —
    one pre-reduced min exchange per round, bounded take_all (distinct
    improved nodes). Above the gate, state stays a co-partitioned
    Dataset: per round ONE tagged-union exchange keyed by node merges
    relax candidates into the dist table; the only driver scalar is
    the improved-count loop terminator. Skew: a hot src's out-edges
    land in one block and relax candidates are min-reduced per block
    before the exchange, so the exchange carries distinct dst rows,
    not edge multiplicity.
    """
    import ray

    from docstrange_ray.shuffle import (
        _strip_schema_metadata,
        arrow_out,
        coalesced_blocks,
        grouped_blocks,
    )

    seeds = sorted({int(s) for s in seeds})
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
    )
    if not seeds:
        return ray.data.from_arrow(empty)
    edges = _strip_schema_metadata(edges).materialize()  # consumed every round

    if plan == "auto":
        plan = "broadcast"  # gate-checked per round below

    if plan == "broadcast":
        dist: dict[int, int] = {s: 0 for s in seeds}
        frontier: dict[int, int] = dict(dist)
        for _ in range(max_hops):
            if not frontier or len(dist) > broadcast_node_limit:
                break
            f_ref = ray.put(frontier)

            def relax(batch: pa.Table, _ref=f_ref) -> pd.DataFrame:
                fr = ray.get(_ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                w = batch.column("w").to_numpy(zero_copy_only=False)
                if (w < 0).any():
                    raise ValueError("sssp_bounded: negative edge weight")
                return _relax_frame(
                    np.fromiter(fr.keys(), dtype=np.int64, count=len(fr)),
                    np.fromiter(fr.values(), dtype=np.int64, count=len(fr)),
                    src, dst, w,
                )

            def min_final(df: pd.DataFrame) -> pd.DataFrame:
                return df.groupby("node", as_index=False)["dist"].min()

            cand_rows = grouped_blocks(
                edges.map_batches(arrow_out(relax), batch_format="pyarrow"),
                ["node"],
                min_final,
                num_partitions,
                batch_format="pandas",
            ).take_all()  # bounded: distinct improved nodes under the gate
            frontier = {}
            for r in cand_rows:
                v, nd = int(r["node"]), int(r["dist"])
                if nd < dist.get(v, _INF64):
                    dist[v] = nd
                    frontier[v] = nd
        nodes = np.array(sorted(dist), dtype=np.int64)
        dd = np.fromiter((dist[int(v)] for v in nodes), dtype=np.int64)
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array(nodes, pa.int64()),
                 "dist": pa.array(dd, pa.int64())}
            )
        )

    # ---- join (scale) plan: dist table never leaves the cluster ----
    state = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(seeds, pa.int64()),
                "dist": pa.array(np.zeros(len(seeds), dtype=np.int64)),
            }
        )
    ).materialize()
    frontier_ds = state  # (node, dist) improved last round

    def edge_rows(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False)
        if (w < 0).any():
            raise ValueError("sssp_bounded: negative edge weight")
        n = batch.num_rows
        return pa.table(
            {
                "node": batch.column("src").cast(pa.int64()),
                "dst": batch.column("dst").cast(pa.int64()),
                "w": batch.column("w").cast(pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    edge_tagged = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    for _ in range(max_hops):
        if frontier_ds.count() == 0:
            break

        def front_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "dst": pa.nulls(n, pa.int64()),
                    "w": batch.column("dist").cast(pa.int64()),
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        def relax_block(block: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc

            kind = block.column("kind")
            fr = block.filter(pc.equal(kind, pa.scalar(1, pa.int8())))
            ed = block.filter(pc.equal(kind, pa.scalar(0, pa.int8())))
            if fr.num_rows == 0 or ed.num_rows == 0:
                return pd.DataFrame(
                    {"node": np.array([], dtype=np.int64),
                     "dist": np.array([], dtype=np.int64)}
                )
            src = ed.column("node").to_numpy(zero_copy_only=False)
            dst = ed.column("dst").to_numpy(zero_copy_only=False)
            w = ed.column("w").to_numpy(zero_copy_only=False)
            return _relax_frame(
                fr.column("node").to_numpy(zero_copy_only=False).astype(np.int64),
                fr.column("w").to_numpy(zero_copy_only=False).astype(np.int64),
                src, dst, w,
            )

        cand_ds = grouped_blocks(
            edge_tagged.union(
                frontier_ds.map_batches(front_rows, batch_format="pyarrow")
            ),
            ["node"],
            relax_block,
            num_partitions,
            batch_format="pyarrow",
        )

        # merge candidates into state keyed by node; improved rows form
        # the next frontier (tag: state=0, candidate=1)
        def tag_state(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "dist": batch.column("dist").cast(pa.int64()),
                    "kind": pa.array(np.zeros(n, dtype=np.int8)),
                }
            )

        def tag_cand(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "dist": batch.column("dist").cast(pa.int64()),
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        def min_merge(df: pd.DataFrame) -> pd.DataFrame:
            old = df[df["kind"] == 0].groupby("node")["dist"].min()
            best = df.groupby("node", as_index=False)["dist"].min()
            prior = old.reindex(best["node"]).to_numpy()
            improved = np.isnan(prior) | (best["dist"].to_numpy() < prior)
            out = best[["node", "dist"]].copy()
            out["improved"] = improved
            return out

        merged = grouped_blocks(
            state.map_batches(tag_state, batch_format="pyarrow").union(
                _strip_schema_metadata(cand_ds).map_batches(
                    tag_cand, batch_format="pyarrow"
                )
            ),
            ["node"],
            min_merge,
            num_partitions,
            batch_format="pandas",
        ).materialize()

        def only_improved(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.equal(batch.column("improved"), pa.scalar(True))
            ).select(["node", "dist"])

        state = merged.drop_columns(["improved"]).materialize()
        frontier_ds = merged.map_batches(
            only_improved, batch_format="pyarrow"
        ).materialize()

    return state


def _relax_frame(fr_nodes, fr_dist, src, dst, w):
    """Vectorized one-round relaxation: for edges whose src is in the
    frontier, emit per-dst min(frontier_dist[src] + w) — the per-block
    pre-reduction that keeps the exchange at distinct-dst scale."""
    if len(fr_nodes) == 0 or len(src) == 0:
        return pd.DataFrame(
            {"node": np.array([], dtype=np.int64),
             "dist": np.array([], dtype=np.int64)}
        )
    base = (
        pd.Series(fr_dist, index=fr_nodes)
        .reindex(src.astype(np.int64))
        .to_numpy(dtype=np.float64)
    )
    mask = ~np.isnan(base)
    if not mask.any():
        return pd.DataFrame(
            {"node": np.array([], dtype=np.int64),
             "dist": np.array([], dtype=np.int64)}
        )
    nd = base[mask].astype(np.int64) + w[mask].astype(np.int64)
    out = (
        pd.DataFrame({"node": dst[mask].astype(np.int64), "dist": nd})
        .groupby("node", as_index=False)["dist"]
        .min()
    )
    return out


_INF64 = np.iinfo(np.int64).max


def degree_assortativity(
    edges,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """Degree assortativity coefficient (Newman 2002) of the DISTINCT
    undirected simple graph: the Pearson correlation of endpoint
    degrees over edge stubs, computed from four EXACT int64 sufficient
    statistics over undirected edges (M, P = sum j*k, S1 = sum (j+k),
    S2 = sum (j^2+k^2)):

        r = (4*M*P - S1^2) / (2*M*S2 - S1^2)

    One row out: (m_edges, sum_jk, sum_j_plus_k, sum_j2_k2,
    assortativity) with ``assortativity`` = round6(r) (None when the
    denominator is 0 — a degree-regular graph). The float chain is the
    single expression above evaluated in doubles from the exact
    integers, mirrored TERM FOR TERM in the SQL oracle, so engine and
    DuckDB agree bit-for-bit. int64 bound: valid while
    max_degree^2 * M < 2^63 (document-scale graphs; beyond that the
    partials need the bignum emit discipline of ops/stats_tests).

    Plans: 'broadcast' ray.puts the degree map below
    ``broadcast_node_limit`` nodes — ONE edge scan with single-row
    partials. 'join' attaches degrees with two node-keyed tagged-union
    exchanges (deg rides as a marker kind; a hot node's edges land in
    one block but emit only summed partials), then the same single-row
    reduce.
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    ue = undirected_edges(edges, num_partitions).materialize()
    deg = degree_table(ue, num_partitions).materialize()
    n_nodes = deg.count()
    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        from docstrange_ray.numerics import round6

        m = int(df["m"].sum())
        p = int(df["p"].sum())
        s1 = int(df["s1"].sum())
        s2 = int(df["s2"].sum())
        num = 4.0 * m * p - float(s1) * s1
        den = 2.0 * m * s2 - float(s1) * s1
        r = None if den == 0.0 else float(round6(num / den))
        return pd.DataFrame(
            {
                "m_edges": pd.Series([m], dtype=np.int64),
                "sum_jk": pd.Series([p], dtype=np.int64),
                "sum_j_plus_k": pd.Series([s1], dtype=np.int64),
                "sum_j2_k2": pd.Series([s2], dtype=np.int64),
                "assortativity": pd.Series([r], dtype=np.float64),
            }
        )

    def stub_sums(ja: np.ndarray, jb: np.ndarray) -> pd.DataFrame:
        ja = ja.astype(np.int64)
        jb = jb.astype(np.int64)
        return pd.DataFrame(
            {
                "m": pd.Series([len(ja)], dtype=np.int64),
                "p": pd.Series([int((ja * jb).sum())], dtype=np.int64),
                "s1": pd.Series([int((ja + jb).sum())], dtype=np.int64),
                "s2": pd.Series([int((ja * ja + jb * jb).sum())], dtype=np.int64),
            }
        )

    if plan == "broadcast":
        dmap = {int(r_["node"]): int(r_["deg"]) for r_ in deg.take_all()}
        d_ref = ray.put(dmap)

        def partial(batch: pa.Table, _ref=d_ref) -> pd.DataFrame:
            dm = ray.get(_ref)
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            ja = np.fromiter((dm[int(x)] for x in a), dtype=np.int64, count=len(a))
            jb = np.fromiter((dm[int(x)] for x in b), dtype=np.int64, count=len(b))
            return stub_sums(ja, jb)

        partials = ue.map_batches(arrow_out(partial), batch_format="pyarrow")
        return coalesced_blocks(partials, finalize)

    # join plan: attach deg(a) then deg(b) via node-keyed tagged unions
    def edge_as_a(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {"node": df["a"].to_numpy(np.int64),
             "other": df["b"].to_numpy(np.int64),
             "deg": np.int64(0), "kind": np.int8(0)}
        )

    def deg_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {"node": df["node"].to_numpy(np.int64),
             "other": np.int64(0),
             "deg": df["deg"].to_numpy(np.int64), "kind": np.int8(1)}
        )

    def attach_a(df: pd.DataFrame) -> pd.DataFrame:
        dm = df[df["kind"] == 1].set_index("node")["deg"]
        ed = df[df["kind"] == 0]
        return pd.DataFrame(
            {"a": ed["node"].to_numpy(np.int64),
             "b": ed["other"].to_numpy(np.int64),
             "ja": dm.reindex(ed["node"]).to_numpy(dtype=np.int64)}
        )

    with_ja = grouped_blocks(
        ue.map_batches(arrow_out(edge_as_a), batch_format="pyarrow").union(
            deg.map_batches(arrow_out(deg_rows), batch_format="pyarrow")
        ),
        ["node"],
        attach_a,
        num_partitions,
        batch_format="pandas",
    )

    def edge_as_b(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {"node": df["b"].to_numpy(np.int64),
             "ja": df["ja"].to_numpy(np.int64),
             "deg": np.int64(0), "kind": np.int8(0)}
        )

    def deg_rows_b(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {"node": df["node"].to_numpy(np.int64),
             "ja": np.int64(0),
             "deg": df["deg"].to_numpy(np.int64), "kind": np.int8(1)}
        )

    def attach_b_and_sum(df: pd.DataFrame) -> pd.DataFrame:
        dm = df[df["kind"] == 1].set_index("node")["deg"]
        ed = df[df["kind"] == 0]
        jb = dm.reindex(ed["node"]).to_numpy(dtype=np.int64)
        return stub_sums(ed["ja"].to_numpy(np.int64), jb)

    partials = grouped_blocks(
        with_ja.map_batches(arrow_out(edge_as_b), batch_format="pyarrow").union(
            deg.map_batches(arrow_out(deg_rows_b), batch_format="pyarrow")
        ),
        ["node"],
        attach_b_and_sum,
        num_partitions,
        batch_format="pandas",
    )
    return coalesced_blocks(partials, finalize)


def hits(
    edges,
    iterations: int = 3,
    scale: int = 10**9,
    num_partitions=None,
    plan: str = "auto",
    broadcast_node_limit: int = 2_000_000,
):
    """HITS hubs & authorities (Kleinberg 1999) over DISTINCT directed
    edges, in EXACT integer arithmetic: hubs start at ``scale``; each
    round authorities sum incoming hub scores, rescale so the max is
    exactly ``scale`` (trunc division — DuckDB ``//`` parity), then
    hubs sum their authorities' rescaled scores and rescale the same
    way. Max-rescaling replaces the float L2 normalization with an
    integer-exact equivalent (the ranking fixpoint is the same
    principal-eigenvector direction); trunc-div makes every round a
    pure function of the edge set, so both plans and the unrolled CTE
    oracle agree bit-for-bit. Returns Dataset[(node, kind, score)]
    with kind in {'hub', 'authority'} — src and dst ids live in
    separate role spaces (bipartite usage: caller need not disjoin
    them numerically).

    int64 bound: sum-of-scores per node <= max_degree * scale, so
    scale=1e9 holds to a billion-edge star; shrink scale for denser
    hubs (documented, raises on overflow-risk detection is the
    caller's scale choice).

    Plans: below ``broadcast_node_limit`` src+dst DISTINCT nodes the
    score maps live on the driver (node-scale, gated) and each round
    is two pre-reduced edge-scan exchanges plus two driver max
    scalars. Above it, scores stay Datasets: per round two
    co-partition tagged-union exchanges (src-keyed scatter of h, then
    dst-keyed scatter of a) with the ONLY driver values the two max
    scalars (Dataset.max) — the Pregel discipline of pagerank's join
    plan."""
    import ray

    from docstrange_ray.shuffle import (
        _strip_schema_metadata,
        arrow_out,
        grouped_blocks,
        hash_join,
    )

    edges = distinct_edges(edges, num_partitions)
    edges = _strip_schema_metadata(edges).materialize()
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "score": pa.array([], pa.int64()),
        }
    )
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    def side_nodes(col):
        def f(batch: pa.Table) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": np.unique(
                    batch.column(col).to_numpy(zero_copy_only=False)
                ).astype(np.int64)}
            )
        return f

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    hubs = grouped_blocks(
        edges.map_batches(arrow_out(side_nodes("src")), batch_format="pyarrow"),
        ["node"], distinct, num_partitions, batch_format="pandas",
    ).materialize()
    n_hub = hubs.count()
    auths = grouped_blocks(
        edges.map_batches(arrow_out(side_nodes("dst")), batch_format="pyarrow"),
        ["node"], distinct, num_partitions, batch_format="pandas",
    ).materialize()
    n_auth = auths.count()

    if plan == "auto":
        plan = "broadcast" if n_hub + n_auth <= broadcast_node_limit else "join"

    if plan == "broadcast":
        h = {int(r["node"]): scale for r in hubs.take_all()}  # gated
        a: dict[int, int] = {}
        for _ in range(iterations):
            h_ref = ray.put(h)

            def fwd(batch: pa.Table, _ref=h_ref) -> pd.DataFrame:
                hm = ray.get(_ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                v = np.fromiter(
                    (hm[int(s)] for s in src), dtype=np.int64, count=len(src)
                )
                g = (
                    pd.DataFrame({"node": dst.astype(np.int64), "v": v})
                    .groupby("node", as_index=False)["v"].sum()
                )
                return g

            def fin(df: pd.DataFrame) -> pd.DataFrame:
                return df.groupby("node", as_index=False)["v"].sum()

            araw = {
                int(r["node"]): int(r["v"])
                for r in grouped_blocks(
                    edges.map_batches(arrow_out(fwd), batch_format="pyarrow"),
                    ["node"], fin, num_partitions, batch_format="pandas",
                ).take_all()
            }
            amax = max(araw.values())
            a = {v: val * scale // amax for v, val in araw.items()}
            a_ref = ray.put(a)

            def bwd(batch: pa.Table, _ref=a_ref) -> pd.DataFrame:
                am = ray.get(_ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                v = np.fromiter(
                    (am[int(d)] for d in dst), dtype=np.int64, count=len(dst)
                )
                g = (
                    pd.DataFrame({"node": src.astype(np.int64), "v": v})
                    .groupby("node", as_index=False)["v"].sum()
                )
                return g

            hraw = {
                int(r["node"]): int(r["v"])
                for r in grouped_blocks(
                    edges.map_batches(arrow_out(bwd), batch_format="pyarrow"),
                    ["node"], fin, num_partitions, batch_format="pandas",
                ).take_all()
            }
            hmax = max(hraw.values())
            h = {v: val * scale // hmax for v, val in hraw.items()}
        hn = np.array(sorted(h), dtype=np.int64)
        an = np.array(sorted(a), dtype=np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(np.concatenate([hn, an]), pa.int64()),
                    "kind": pa.array(
                        ["hub"] * len(hn) + ["authority"] * len(an)
                    ),
                    "score": pa.array(
                        np.concatenate(
                            [
                                np.fromiter((h[int(v)] for v in hn),
                                            dtype=np.int64, count=len(hn)),
                                np.fromiter((a[int(v)] for v in an),
                                            dtype=np.int64, count=len(an)),
                            ]
                        ),
                        pa.int64(),
                    ),
                }
            )
        )

    # ---- join (scale) plan: score state stays in the cluster ----
    h_ds = hubs.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "s": pa.array(
                    np.full(b.num_rows, scale, dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    a_ds = None

    def sum_side(joined, out_key: str, score_col: str):
        """Sum score_col of the joined edge rows per out_key node: per-
        batch partial + one node-keyed exchange."""
        def part(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(out_key, as_index=False)[score_col].sum()
            g.columns = ["node", "v"]
            return pd.DataFrame(
                {"node": g["node"].to_numpy(np.int64),
                 "v": g["v"].to_numpy(np.int64)}
            )

        def fin(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False)["v"].sum()

        from docstrange_ray.shuffle import arrow_out as _ao

        return grouped_blocks(
            joined.map_batches(_ao(part), batch_format="pandas"),
            ["node"], fin, num_partitions, batch_format="pandas",
        )

    def rescaled(raw_ds, mx: int):
        def f(batch: pa.Table, _m=mx) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "s": pa.array(v * scale // _m, pa.int64()),
                }
            )
        return raw_ds.map_batches(f, batch_format="pyarrow").materialize()

    e_fwd = edges.map_batches(
        lambda b: pa.table(
            {"node": b.column("src").cast(pa.int64()),
             "dst": b.column("dst").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    e_bwd = edges.map_batches(
        lambda b: pa.table(
            {"node": b.column("dst").cast(pa.int64()),
             "src": b.column("src").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iterations):
        fwd_join = hash_join(e_fwd, h_ds, key="node",
                             num_partitions=num_partitions)
        araw = sum_side(fwd_join, "dst", "s").materialize()
        amax = int(araw.max("v"))
        a_ds = rescaled(araw, amax)
        bwd_join = hash_join(e_bwd, a_ds, key="node",
                             num_partitions=num_partitions)
        hraw = sum_side(bwd_join, "src", "s").materialize()
        hmax = int(hraw.max("v"))
        h_ds = rescaled(hraw, hmax)

    def emit(kind: str):
        def f(batch: pa.Table, _k=kind) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "kind": pa.array([_k] * batch.num_rows),
                    "score": batch.column("s").cast(pa.int64()),
                }
            )
        return f

    return h_ds.map_batches(emit("hub"), batch_format="pyarrow").union(
        a_ds.map_batches(emit("authority"), batch_format="pyarrow")
    )
