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


def _node_table(edges, num_partitions=None):
    """Dataset[(node, outdeg)] — every node appearing as src or dst,
    outdeg 0 for sinks. One pre-reduced exchange."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
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
):
    """Fixed-point integer PageRank over Dataset[(src int, dst int)].

    Returns Dataset[(node int64, rank int64)] — rank in units of
    1/``scale``. Deterministic and plan-independent (integer floor
    arithmetic; see module docstring). ``plan``: 'auto' counts the
    node table and broadcasts below ``broadcast_node_limit``, else
    runs the co-partition (Pregel) plan whose per-iteration driver
    state is ONE scalar.
    """
    import ray

    from docstrange_ray.shuffle import _strip_schema_metadata

    if not assume_distinct:
        edges = distinct_edges(edges, num_partitions)
    edges = _strip_schema_metadata(edges).materialize()  # consumed every iteration
    nodes = _node_table(edges, num_partitions).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})
        )
    t0 = (100 - DAMP_NUM) * scale // (DAMP_DEN * n_nodes)
    r_init = scale // n_nodes

    if plan == "auto":
        plan = "broadcast" if n_nodes <= broadcast_node_limit else "join"

    if plan == "broadcast":
        return _pagerank_broadcast(
            edges, nodes, n_nodes, iterations, scale, t0, r_init, num_partitions
        )
    return _pagerank_join(
        edges, nodes, n_nodes, iterations, scale, t0, r_init, num_partitions
    )


def _pagerank_broadcast(
    edges, nodes, n_nodes, iterations, scale, t0, r_init, num_partitions
):
    """Gated plan: the (node -> rank, outdeg) map is ray.put-broadcast
    (bounded by broadcast_node_limit); each iteration = one per-block
    vectorized contribution histogram -> one pre-reduced dst exchange
    -> bounded take_all of the new insums."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    node_rows = nodes.take_all()  # bounded by the gate
    node_ids = np.array(sorted(r["node"] for r in node_rows), dtype=np.int64)
    outdeg = {r["node"]: r["outdeg"] for r in node_rows}
    ranks = {int(v): r_init for v in node_ids}

    for _ in range(iterations):
        dang = sum(r for v, r in ranks.items() if outdeg[v] == 0)
        dshare = dang // n_nodes
        # outdeg is a GLOBAL property: ship (rank, outdeg) together so a
        # block can turn its edges into contributions with zero exchanges
        payload_ref = ray.put(
            {int(v): (ranks[int(v)], outdeg[int(v)]) for v in node_ids}
        )

        def partial2(batch: pa.Table, _ref=payload_ref) -> pd.DataFrame:
            pmap = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
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
            int(v): t0 + DAMP_NUM * (insums.get(int(v), 0) + dshare) // DAMP_DEN
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
    edges, nodes, n_nodes, iterations, scale, t0, r_init, num_partitions
):
    """Scale plan (Pregel shape): rank state is a Dataset co-partitioned
    with the edges each iteration. Two pre-reduced exchanges per
    iteration; the only driver value is the dangling-mass SCALAR."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, _strip_schema_metadata

    def init_state(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": batch.column("node").cast(pa.int64()),
                "rank": pa.array(np.full(n, r_init, dtype=np.int64)),
                "outdeg": batch.column("outdeg").cast(pa.int64()),
            }
        )

    state = (
        nodes.map_batches(init_state, batch_format="pyarrow").materialize()
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": batch.column("src").cast(pa.int64()),
                "dst": batch.column("dst").cast(pa.int64()),
                "rank": pa.nulls(n, pa.int64()),
                "outdeg": pa.nulls(n, pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

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
        dshare = int(dang or 0) // n_nodes

        def state_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node"),
                    "dst": pa.nulls(n, pa.int64()),
                    "rank": batch.column("rank"),
                    "outdeg": batch.column("outdeg"),
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

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
            new_rank = np.fromiter(
                (
                    t0
                    + DAMP_NUM * (int(ins.get(int(v), 0)) + _dshare) // DAMP_DEN
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
