"""Relational operator demonstrations over the driver testdata tables.

These exercise the engine's wide operators — grouped aggregation with
partial pre-aggregation, broadcast joins, global sort/top-k, and
session windows — in the shapes the ray_guide prescribes:

  * aggregates pre-combine inside ``map_batches`` (one partial row per
    key per batch) before the small ``groupby`` shuffle; bounded-key
    finals go through the guarded ``adaptive_final`` (coalesce under a
    row bound, real hash shuffle above it);
  * join strategy is chosen by which sides SCALE with the corpus:
    fixed-cardinality dimensions (nation/region) broadcast via
    ``ray.put``; sides that grow with SF (customer, orders) go through
    the co-partitioned ``hash_join`` / tag-union exchanges — nothing
    corpus-sized ever collects on the driver;
  * money is aggregated in integer cents/e-4 units so results are
    EXACT and hash-identical to the DuckDB oracle (float sums are
    order-dependent; an engine that shuffles cannot reproduce them
    bitwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from docstrange_ray.shuffle import adaptive_final, arrow_out, coalesced_blocks

from docstrange_ray.numerics import round6

Q1_CUTOFF = "2000-01-01"


def _combine_sums(keys: list[str], sum_cols: list[str]):
    """Final combine for pre-aggregated partials over a BOUNDED key space
    (region names, return flags, hours x event types): one single-block
    pandas groupby via coalesced_blocks — no aggregator-pool shuffle.
    Unbounded-key aggregations (e.g. per-customer) use the real
    groupby/grouped_blocks shuffle instead."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False)[sum_cols].sum()

    return combine


def _read(sf_dir: str, name: str, columns=None):
    from docstrange_ray.io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


def _cents(arr) -> np.ndarray:
    return np.round(np.asarray(arr, dtype=np.float64) * 100).astype(np.int64)


def q1_pricing(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary with a shipdate filter pushed to
    the read and per-batch partial aggregation before the groupby."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = np.datetime64(Q1_CUTOFF)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["l_shipdate"].to_numpy() < cutoff]
        if df.empty:
            return pd.DataFrame(
                columns=[
                    "l_returnflag",
                    "l_linestatus",
                    "sum_qty",
                    "sum_base_price_cents",
                    "sum_disc_price_e4",
                    "count_order",
                ]
            ).astype(
                {
                    "sum_qty": np.int64,
                    "sum_base_price_cents": np.int64,
                    "sum_disc_price_e4": np.int64,
                    "count_order": np.int64,
                }
            )
        df["qty_i"] = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
        cents = _cents(df["l_extendedprice"])
        disc_bp = _cents(df["l_discount"])  # discount in 1/100 units
        df["base_c"] = cents
        df["disc_e4"] = cents * (100 - disc_bp)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty_i", "sum"),
            sum_base_price_cents=("base_c", "sum"),
            sum_disc_price_e4=("disc_e4", "sum"),
            count_order=("qty_i", "size"),
        )
        return g

    partials = ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536)
    return coalesced_blocks(
        partials,
        _combine_sums(
            ["l_returnflag", "l_linestatus"],
            ["sum_qty", "sum_base_price_cents", "sum_disc_price_e4", "count_order"],
        ),
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_base_price_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS sum_disc_price_e4,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def top_customers(sf_dir: str, k: int = 10):
    """Revenue top-k: orders aggregated per customer (partial combine +
    groupby), block-local top-k candidates, ONE coalesced final top-k —
    and ONLY THEN the customer names for the k winners, via a
    column-pruned vectorized filter scan of the dimension (k keys
    broadcast). The customer table scales with the corpus, so the
    round-1 full-dimension ``take_all`` broadcast was a driver OOM at
    100x; k rows are bounded by construction."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["rev_c"] = _cents(df["o_totalprice"])
        return df.groupby("o_custkey", as_index=False).agg(
            revenue_cents=("rev_c", "sum"), n_orders=("rev_c", "size")
        )

    from docstrange_ray.shuffle import grouped_blocks

    # custkey cardinality scales with the data -> a real hash shuffle,
    # block-local vectorized combine (no per-group Python dispatch)
    per_cust = grouped_blocks(
        orders.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        ["o_custkey"],
        lambda df: df.groupby("o_custkey", as_index=False)[
            ["revenue_cents", "n_orders"]
        ].sum(),
        batch_format="pandas",
    )

    # global top-k without a sort shuffle: per-block top-k candidates,
    # then one coalesced final top-k over n_blocks x k rows
    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_cents", "o_custkey"], ascending=[False, True]
        ).head(k)

    top = coalesced_blocks(
        per_cust.map_batches(arrow_out(local_topk), batch_format="pandas"), local_topk
    )

    # name lookup for exactly the k winners: broadcast the k keys into a
    # vectorized is_in filter over the (column-pruned) dimension scan
    winners = top.take_all()  # k rows by construction
    keys = pa.array(sorted(int(r["o_custkey"]) for r in winners), type=pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("c_custkey"), value_set=keys))

    names = {
        r["c_custkey"]: r["c_name"]
        for r in _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(pick, batch_format="pyarrow")
        .take_all()  # exactly k rows
    }
    out = pa.Table.from_pylist(
        [
            {
                "o_custkey": int(r["o_custkey"]),
                "c_name": names.get(int(r["o_custkey"]), ""),
                "revenue_cents": int(r["revenue_cents"]),
                "n_orders": int(r["n_orders"]),
            }
            for r in winners
        ]
    )
    return ray.data.from_arrow(out)


TOP_CUSTOMERS_SQL = """
SELECT o_custkey, c_name,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY revenue_cents DESC, o_custkey ASC
LIMIT 10
"""


def revenue_by_region(sf_dir: str):
    """Revenue per region: orders ⋈ customer is a co-partitioned
    hash_join on the customer key (BOTH sides scale with the corpus —
    ONE shuffle moves them, nothing rides the driver); only the
    fixed-cardinality nation (25 rows) and region (5) maps broadcast.
    The round-1 version broadcast the whole customer dimension via
    ``take_all`` — a linear-in-SF driver OOM."""
    from docstrange_ray.shuffle import hash_join

    nation = {
        r["n_nationkey"]: r["n_regionkey"] for r in _read(sf_dir, "nation").take_all()
    }
    region = {
        r["r_regionkey"]: r["r_name"] for r in _read(sf_dir, "region").take_all()
    }
    chain_ref = ray.put((nation, region))

    def cust_region(batch: pa.Table) -> pa.Table:
        n, rg = ray.get(chain_ref)
        names = [
            rg.get(n.get(nk, -1), "")
            for nk in batch.column("c_nationkey").to_pylist()
        ]
        return pa.Table.from_arrays(
            [batch.column("c_custkey"), pa.array(names, type=pa.string())],
            names=["o_custkey", "r_name"],
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        cust_region, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = hash_join(orders, cust, key="o_custkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev_c=_cents(df["o_totalprice"]))
        return df.groupby("r_name", as_index=False).agg(
            revenue_cents=("rev_c", "sum"), n_orders=("rev_c", "size")
        )

    return coalesced_blocks(
        joined.map_batches(arrow_out(partial), batch_format="pandas", batch_size=None),
        _combine_sums(["r_name"], ["revenue_cents", "n_orders"]),
    )


REVENUE_BY_REGION_SQL = """
SELECT r_name,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q6_revenue(sf_dir: str, year: int = 1995):
    """Q6-shape selective scan: forecast-revenue SUM over a narrow
    predicate band — the read-pruning showcase. The predicate is a
    ``pyarrow.dataset`` expression passed INTO ``read_parquet`` (filter
    pushdown): row groups whose min/max statistics exclude the ship-date
    year are skipped entirely and surviving fragments are filtered
    before a block is built, so at 100 TB the scan reads the one year it
    needs, not the table. The aggregate is a single exact-int64 sum
    (cents x discount-percent units) coalesced from per-block partials.
    """
    from datetime import datetime

    import pyarrow.dataset as pads

    from docstrange_ray.io import read_parquet_clean
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    flt = (
        (pads.field("l_shipdate") >= datetime(year, 1, 1))
        & (pads.field("l_shipdate") < datetime(year + 1, 1, 1))
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24)
    )
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=flt,
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = _cents(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))
        pct = _cents(batch.column("l_discount").to_numpy(zero_copy_only=False))
        return pd.DataFrame(
            {"revenue_units": [np.int64(np.sum(cents * pct))], "n_rows": [np.int64(batch.num_rows)]}
        )

    return coalesced_blocks(
        li.map_batches(arrow_out(partial), batch_format="pyarrow"),
        lambda df: pd.DataFrame(
            {
                "revenue_units": [np.int64(df["revenue_units"].sum())],
                "n_rows": [np.int64(df["n_rows"].sum())],
            }
        ),
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
           AS revenue_units,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def small_quantity_revenue(sf_dir: str, num_partitions: int | None = None):
    """Correlated-subquery shape (TPC-H Q17): revenue from lineitems
    whose quantity is below 20% of their part's average quantity.

    Scale shape: the correlated AVG needs per-part stats co-located
    with per-part detail rows — ONE tagged partkey exchange ships both
    the detail rows and the per-batch (sum_qty, n) partials, the block
    reconstructs each part's exact average (quantities are integral, so
    int64 sums are exact and the single final division is bit-identical
    across engines), filters its local details, and emits one bounded
    revenue partial; a coalesced final sums. No broadcast, no second
    pass, no per-part table materialization.
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def tagged(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        qty = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        detail = pd.DataFrame(
            {
                "key": df["l_partkey"].astype(np.int64),
                "qty": qty,
                "cents": _cents(df["l_extendedprice"]),
                "n": np.int64(0),
                "side": np.int8(0),
            }
        )
        stats = (
            pd.DataFrame({"key": detail["key"], "qty": qty})
            .groupby("key", as_index=False)
            .agg(qty=("qty", "sum"), n=("qty", "size"))
            .assign(cents=np.int64(0), side=np.int8(1))
        )
        stats["n"] = stats["n"].astype(np.int64)
        return pd.concat(
            [detail, stats[["key", "qty", "cents", "n", "side"]]], ignore_index=True
        )

    def block(df: pd.DataFrame) -> pd.DataFrame:
        st = df[df["side"] == 1].groupby("key", as_index=False)[["qty", "n"]].sum()
        avg = dict(zip(st["key"], st["qty"] / st["n"]))
        d = df[df["side"] == 0]
        thr = d["key"].map(avg) * 0.2
        keep = d[d["qty"] < thr]
        return pd.DataFrame(
            {
                "revenue_cents": [np.int64(keep["cents"].sum())],
                "n_rows": [np.int64(len(keep))],
            }
        )

    parts = grouped_blocks(
        li.map_batches(arrow_out(tagged), batch_format="pyarrow"),
        ["key"],
        block,
        num_partitions,
        batch_format="pandas",
    )
    return coalesced_blocks(
        parts,
        lambda df: pd.DataFrame(
            {
                "revenue_cents": [np.int64(df["revenue_cents"].sum())],
                "n_rows": [np.int64(df["n_rows"].sum())],
            }
        ),
    )


SMALL_QUANTITY_REVENUE_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       COUNT(*) AS n_rows
FROM lineitem l
WHERE l_quantity < 0.2 * (
    SELECT AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
"""


def sole_late_supplier(
    sf_dir: str, late_days: int = 60, num_partitions: int | None = None
):
    """Q21-shape multi-way self-join (TPC-H Q21 adapted to this
    schema's columns): suppliers who were the SOLE late shipper
    (l_shipdate > o_orderdate + late_days) on a multi-supplier 'F'
    order — an EXISTS + NOT-EXISTS pair over the same fact table.

    Scale shape: both EXISTS arms need the ORDER's full supplier set,
    so everything co-locates on orderkey — ONE tagged exchange ships
    the lineitem detail rows and the (filtered, metadata-per-order)
    order dates together; each block resolves the per-supplier late
    flags, keeps orders with >=2 suppliers and exactly one late one,
    and emits bounded per-supplier count partials; the per-supplier
    final is ``adaptive_final`` (supplier space is dimension-scale,
    verified not assumed). Timestamps normalize to int64 microseconds
    on both sides so the +60-day comparison is exact integer math.

    Returns Dataset[(s_suppkey, numwait)]."""
    from docstrange_ray.shuffle import adaptive_final, arrow_out, grouped_blocks

    late_us = np.int64(late_days) * 86_400 * 1_000_000
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"])

    def _us(s: pd.Series) -> np.ndarray:
        return pd.to_datetime(s).astype("datetime64[us]").astype("int64").to_numpy()

    def tag_li(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {
                "key": df["l_orderkey"].astype(np.int64),
                "supp": df["l_suppkey"].astype(np.int64),
                "ts": _us(df["l_shipdate"]),
                "side": np.int8(0),
            }
        )

    def tag_od(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["o_orderstatus"] == "F"]
        return pd.DataFrame(
            {
                "key": df["o_orderkey"].astype(np.int64),
                "supp": np.int64(0),
                "ts": _us(df["o_orderdate"]),
                "side": np.int8(1),
            }
        )

    tagged = li.map_batches(arrow_out(tag_li), batch_format="pyarrow").union(
        od.map_batches(arrow_out(tag_od), batch_format="pyarrow")
    )

    def block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "numwait": pd.Series([], dtype="int64"),
            }
        )
        ords = df[df["side"] == 1][["key", "ts"]].rename(columns={"ts": "ots"})
        det = df[df["side"] == 0]
        if not len(ords) or not len(det):
            return empty
        d = det.merge(ords, on="key")  # drops non-'F' orders
        if not len(d):
            return empty
        d["late"] = (d["ts"].to_numpy() > d["ots"].to_numpy() + late_us).astype(
            np.int64
        )
        per = d.groupby(["key", "supp"], as_index=False)["late"].max()
        ost = per.groupby("key").agg(n_supp=("supp", "size"), n_late=("late", "sum"))
        sole = ost[(ost["n_supp"] >= 2) & (ost["n_late"] == 1)].index
        hit = per[(per["late"] == 1) & per["key"].isin(sole)]
        if not len(hit):
            return empty
        out = hit.groupby("supp", as_index=False).size()
        return pd.DataFrame(
            {
                "s_suppkey": out["supp"].astype(np.int64),
                "numwait": out["size"].astype(np.int64),
            }
        )

    partials = grouped_blocks(tagged, ["key"], block, num_partitions, batch_format="pandas")
    return adaptive_final(
        partials,
        lambda df: df.groupby("s_suppkey", as_index=False)["numwait"].sum(),
        keys=["s_suppkey"],
        batch_format="pandas",
    )


SOLE_LATE_SUPPLIER_SQL = """
WITH lo AS (
    SELECT l_orderkey, l_suppkey,
           CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 1 ELSE 0 END AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
), per AS (
    SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
    FROM lo GROUP BY l_orderkey, l_suppkey
), ord AS (
    SELECT l_orderkey, COUNT(*) AS n_supp, SUM(supp_late) AS n_late
    FROM per GROUP BY l_orderkey
)
SELECT p.l_suppkey AS s_suppkey, COUNT(*) AS numwait
FROM per p JOIN ord o USING (l_orderkey)
WHERE p.supp_late = 1 AND o.n_supp >= 2 AND o.n_late = 1
GROUP BY p.l_suppkey
"""


def top_supplier_revenue(sf_dir: str, num_partitions: int | None = None):
    """Argmax-over-aggregate shape (TPC-H Q15): the supplier(s) with
    the maximum lineitem revenue, ties included.

    Scale shape: per-supplier revenue partial-reduces per batch before
    ONE suppkey exchange; the reduced per-supplier table materializes
    (object-store-resident), the global max closes as block-local max
    + a one-row coalesced final, and the winners are a vectorized
    filter over the materialized sums — no re-execution, no sort.
    Revenue is exact int64 cents x (100 - discount-percent) units, so
    the argmax has no float ties.
    """
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    li = _read(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        units = _cents(df["l_extendedprice"]) * (
            np.int64(100) - _cents(df["l_discount"])
        )
        return (
            pd.DataFrame({"l_suppkey": df["l_suppkey"].astype(np.int64), "revenue_units": units})
            .groupby("l_suppkey", as_index=False)
            .sum()
        )

    sums = grouped_blocks(
        li.map_batches(arrow_out(partial), batch_format="pyarrow"),
        ["l_suppkey"],
        lambda df: df.groupby("l_suppkey", as_index=False)["revenue_units"].sum(),
        num_partitions,
        batch_format="pandas",
    ).materialize()

    best = coalesced_blocks(
        sums.map_batches(
            arrow_out(lambda df: pd.DataFrame({"m": [np.int64(df["revenue_units"].max())]})),
            batch_format="pandas",
        ),
        lambda df: pd.DataFrame({"m": [np.int64(df["m"].max())]}),
    ).take_all()[0]["m"]

    return sums.map_batches(
        lambda b: b.filter(pc.equal(b.column("revenue_units"), best)),
        batch_format="pyarrow",
    )


TOP_SUPPLIER_REVENUE_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_units
    FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, revenue_units
FROM rev
WHERE revenue_units = (SELECT MAX(revenue_units) FROM rev)
"""


def revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP (region, nation): revenue + order counts at
    nation grain, region subtotals, and the grand total in one result.

    Scale shape: rollup needs NO extra passes — partials aggregate at
    the FINEST grain only (bounded: 25 nations), and the coarser levels
    are derived inside the bounded final combine by re-aggregating the
    finest-grain result (25 rows -> 5 -> 1). The fact-side join is the
    same co-partitioned customer-key hash_join as
    :func:`revenue_by_region`; subtotal rows use the 'ALL' sentinel
    (mirrored by COALESCE in the SQL oracle) so no NULL-vs-NaN
    normalization ambiguity reaches the driver compare.
    """
    from docstrange_ray.shuffle import hash_join

    nation_rows = _read(sf_dir, "nation").take_all()
    region = {
        r["r_regionkey"]: r["r_name"] for r in _read(sf_dir, "region").take_all()
    }
    chain = {
        r["n_nationkey"]: (region.get(r["n_regionkey"], ""), r["n_name"])
        for r in nation_rows
    }
    chain_ref = ray.put(chain)

    def cust_dims(batch: pa.Table) -> pa.Table:
        ch = ray.get(chain_ref)
        dims = [ch.get(nk, ("", "")) for nk in batch.column("c_nationkey").to_pylist()]
        return pa.Table.from_arrays(
            [
                batch.column("c_custkey"),
                pa.array([d[0] for d in dims], type=pa.string()),
                pa.array([d[1] for d in dims], type=pa.string()),
            ],
            names=["o_custkey", "r_name", "n_name"],
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        cust_dims, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = hash_join(orders, cust, key="o_custkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev_c=_cents(df["o_totalprice"]))
        return df.groupby(["r_name", "n_name"], as_index=False).agg(
            revenue_cents=("rev_c", "sum"), n_orders=("rev_c", "size")
        )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        sums = ["revenue_cents", "n_orders"]
        finest = df.groupby(["r_name", "n_name"], as_index=False)[sums].sum()
        per_region = finest.groupby("r_name", as_index=False)[sums].sum()
        per_region.insert(1, "n_name", "ALL")
        total = finest[sums].sum().to_frame().T
        total.insert(0, "r_name", "ALL")
        total.insert(1, "n_name", "ALL")
        out = pd.concat([finest, per_region, total], ignore_index=True)
        for c in sums:
            out[c] = out[c].astype(np.int64)
        return out

    return coalesced_blocks(
        joined.map_batches(arrow_out(partial), batch_format="pandas", batch_size=None),
        rollup,
    )


REVENUE_ROLLUP_SQL = """
SELECT COALESCE(r_name, 'ALL') AS r_name,
       COALESCE(n_name, 'ALL') AS n_name,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def events_hourly(sf_dir: str):
    """Tumbling-hour aggregate over the event stream (the batch analogue
    of a streaming window; ordering assumption: none needed — tumbling
    windows are order-insensitive)."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:00:00")
        df["value_c"] = _cents(df["value"])
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("value_c", "size"), sum_value_cents=("value_c", "sum")
        )

    # key space = event_type x hours: grows with the corpus time span,
    # so the final VERIFIES the bounded assumption (adaptive_final falls
    # back to a real hash shuffle past the bound)
    return adaptive_final(
        ev.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        _combine_sums(["event_type", "hour"], ["n_events", "sum_value_cents"]),
        keys=["event_type", "hour"],
    )


EVENTS_HOURLY_SQL = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY event_type, hour
"""

SESSION_GAP_MIN = 30


def user_retention(sf_dir: str):
    """Retention cohorts: users cohorted by their first active DAY; for
    each (cohort_day, day_offset) the count of cohort users active that
    day — the standard cohort-retention matrix.

    Both exchanges are metadata-scale: batches partial-reduce to
    distinct (user_id, day) rows before the user shuffle (an active
    user's thousandth event that day ships nothing); the per-user stage
    emits one (cohort_day, day_offset) row per active day, partial-
    counted per block before the small final groupby."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        return df[["user_id", "day"]].drop_duplicates()

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "day"])
        cohort = d.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": cohort,
                "day_offset": (d["day"] - cohort).dt.days.astype(np.int64),
            }
        )
        g = (
            out.groupby(["cohort_day", "day_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    per_user_rows = grouped_blocks(
        ev.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        ["user_id"],
        per_user,
        batch_format="pandas",
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cohort_day", "day_offset"], as_index=False)["n_users"].sum()
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    return grouped_blocks(
        per_user_rows, ["cohort_day", "day_offset"], combine, batch_format="pandas"
    )


USER_RETENTION_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day FROM events
), ch AS (
    SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT ch.cohort_day,
       CAST(DATEDIFF('day', ch.cohort_day, ud.day) AS BIGINT) AS day_offset,
       COUNT(*) AS n_users
FROM ud JOIN ch USING (user_id)
GROUP BY 1, 2
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str):
    """Funnel analysis: per user, the FIRST 'view', the first 'click'
    strictly after it, and the first 'purchase' strictly after that —
    completed funnels only.

    Plan: row-filter to the three funnel event types AND project
    (user_id, ts, event_type) BEFORE the one user-key exchange. That
    pruning is the only reduction available here: funnel matching is
    order-dependent across a user's whole history, so the
    interval-style partial reduction of :func:`user_sessions` does not
    compose (events of one user interleave arbitrarily across batches,
    and a per-batch automaton state cannot be merged). Per-user rows
    are bounded, so the block-local ordered scan is safe at any corpus
    size. Returns (user_id, view_ts, click_ts, purchase_ts)."""
    import pyarrow.compute as pc

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    steps = pa.array(FUNNEL_STEPS)

    def prune(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("event_type"), value_set=steps))

    def funnel_block(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            ts = g["ts"].to_numpy()
            et = g["event_type"].to_numpy()
            views = ts[et == "view"]
            if not views.size:
                continue
            t1 = views.min()
            clicks = ts[(et == "click") & (ts > t1)]
            if not clicks.size:
                continue
            t2 = clicks.min()
            purchases = ts[(et == "purchase") & (ts > t2)]
            if not purchases.size:
                continue
            rows.append((uid, t1, t2, purchases.min()))
        out = pd.DataFrame(
            rows, columns=["user_id", "view_ts", "click_ts", "purchase_ts"]
        )
        if out.empty:
            out = out.astype(
                {
                    "user_id": np.int64,
                    "view_ts": "datetime64[us]",
                    "click_ts": "datetime64[us]",
                    "purchase_ts": "datetime64[us]",
                }
            )
        return out

    pruned = ev.map_batches(prune, batch_format="pyarrow")
    return grouped_blocks(pruned, ["user_id"], funnel_block, batch_format="pandas")


EVENTS_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, MIN(ts) AS view_ts FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS click_ts
    FROM events e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > v.view_ts
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS purchase_ts
    FROM events e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
    GROUP BY e.user_id
)
SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
FROM v JOIN c USING (user_id) JOIN p USING (user_id)
"""


def fk_audit(sf_dir: str):
    """Referential-integrity audit — the data-quality gate a warehouse
    load runs before anything downstream trusts the tables: for each
    declared foreign key (orders.o_custkey -> customer, lineitem
    .l_orderkey -> orders, lineitem.l_partkey -> part, lineitem
    .l_suppkey -> supplier) count child rows and ORPHANED child rows
    (no matching parent key). One row per relation: (relation,
    n_child, n_orphans).

    Scale shape: the child side is PRE-REDUCED to (key, count) with
    one exchange (bounded by key cardinality, not row count) before
    the left co-partition join against the parent's distinct-key
    projection — orphan detection never moves child rows, only key
    tallies. Counts are exact int64."""
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, hash_join

    def key_counts(ds, col):
        def local(batch: pa.Table) -> pd.DataFrame:
            g = (
                batch.select([col]).to_pandas()
                .groupby(col, as_index=False).size()
            )
            g.columns = ["key", "c"]
            return g.astype({"key": np.int64, "c": np.int64})

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("key", as_index=False)["c"].sum()

        from docstrange_ray.shuffle import grouped_blocks

        return grouped_blocks(
            ds.map_batches(arrow_out(local), batch_format="pyarrow"),
            ["key"], final, batch_format="pandas",
        )

    def parent_keys(ds, col):
        def local(batch: pa.Table) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": np.unique(
                        batch.column(col).to_numpy(zero_copy_only=False)
                    ).astype(np.int64),
                    "ok": np.int8(1),
                }
            )

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return df.drop_duplicates("key")

        from docstrange_ray.shuffle import grouped_blocks

        return grouped_blocks(
            ds.map_batches(arrow_out(local), batch_format="pyarrow"),
            ["key"], final, batch_format="pandas",
        )

    rels = [
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
    ]
    partials = None
    for name, child_t, child_c, parent_t, parent_c in rels:
        # materialize the key-scale sides: hash_join reads .schema(),
        # which re-executes a deep lazy exchange plan otherwise (the
        # round-2 gotcha) — both tables are bounded by key cardinality
        child = key_counts(
            _read(sf_dir, child_t, columns=[child_c]), child_c
        ).materialize()
        parent = parent_keys(
            _read(sf_dir, parent_t, columns=[parent_c]), parent_c
        ).materialize()
        joined = hash_join(child, parent, key="key", how="left")

        def tally(df: pd.DataFrame, _n=name) -> pd.DataFrame:
            orphan = df["ok"].isna()
            return pd.DataFrame(
                {
                    "relation": pd.Series([_n], dtype=object),
                    "n_child": pd.Series(
                        [int(df["c"].sum())], dtype=np.int64
                    ),
                    "n_orphans": pd.Series(
                        [int(df.loc[orphan, "c"].sum())], dtype=np.int64
                    ),
                }
            )

        part = joined.map_batches(arrow_out(tally), batch_format="pandas")
        partials = part if partials is None else partials.union(part)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("relation", as_index=False)[["n_child", "n_orphans"]].sum()
        return g.astype({"n_child": np.int64, "n_orphans": np.int64})

    return coalesced_blocks(partials, final)


FK_AUDIT_SQL = """
SELECT 'orders.o_custkey->customer' AS relation,
       (SELECT COUNT(*) FROM orders) AS n_child,
       (SELECT COUNT(*) FROM orders o
        LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey IS NULL) AS n_orphans
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IS NULL)
UNION ALL
SELECT 'lineitem.l_partkey->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        LEFT JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_partkey IS NULL)
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_suppkey IS NULL)
"""


def event_transitions(sf_dir: str):
    """First-order Markov transition matrix over each user's event
    stream — the behavioral fingerprint a clickstream model trains on:
    per user, events ordered by (ts, event_id) (the tie-break makes
    the chain deterministic under equal timestamps), consecutive
    (from_type, to_type) bigrams counted globally, and transition
    probability = n / sum(n over same from_type).

    Plan: project (user_id, ts, event_id, event_type) at the read, ONE
    user-key exchange co-locates each user's stream, per-block ordered
    scan emits pre-reduced bigram counts, and the final combine runs
    on the bounded (type x type) table — counts exact int64,
    probability ONE double division (round6) mirrored in SQL. Returns
    (from_type, to_type, n, p)."""
    from docstrange_ray.numerics import round6
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    ev = _read(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def bigram_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        same = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        et = df["event_type"].to_numpy()
        out = pd.DataFrame(
            {"from_type": et[:-1][same], "to_type": et[1:][same]}
        )
        g = out.groupby(["from_type", "to_type"], as_index=False).size()
        g.columns = ["from_type", "to_type", "n"]
        return g.astype({"n": np.int64})

    partials = grouped_blocks(
        ev, ["user_id"], bigram_block, batch_format="pandas"
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
        tot = g.groupby("from_type")["n"].transform("sum")
        p = np.array(
            [
                float(round6(int(n) / int(t)))
                for n, t in zip(g["n"], tot)
            ],
            dtype=np.float64,
        )
        g = g.astype({"n": np.int64})
        g["p"] = p
        return g

    return coalesced_blocks(partials, final)


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS to_type
    FROM events
), big AS (
    SELECT from_type, to_type, COUNT(*) AS n
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM big
"""


def user_sessions(sf_dir: str):
    """Session windows per user (30-minute inactivity gap), with
    INTERVAL partial reduction: each batch sessionizes its own slice
    into per-(user, session) intervals ``(start, end, n_events)``, so
    the exchange ships interval rows — orders of magnitude fewer than
    raw events for active users — and the block-local combine merges
    interval lists under the same gap rule (sessionization is connected
    components on the time line; merging interval unions with the gap
    rule yields identical components regardless of how events were
    batched). The round-1 version shuffled every raw event."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().sort_values(["user_id", "ts"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        new_sess = new_user | (df["ts"].diff() > gap)
        df = df.assign(sess=new_sess.cumsum())
        g = df.groupby(["user_id", "sess"], as_index=False).agg(
            start=("ts", "min"), end=("ts", "max"), n_events=("ts", "size")
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        return g[["user_id", "start", "end", "n_events"]]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "start"], kind="mergesort")
        # running max end per user; a new session starts when the next
        # interval begins more than `gap` after everything seen so far
        cummax_end = df.groupby("user_id")["end"].cummax()
        prev_end = cummax_end.groupby(df["user_id"].values).shift()
        new_sess = prev_end.isna() | (df["start"] - prev_end > gap)
        g = (
            df.assign(ns=new_sess.astype(np.int64))
            .groupby("user_id", as_index=False)
            .agg(n_events=("n_events", "sum"), n_sessions=("ns", "sum"))
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        g["n_sessions"] = g["n_sessions"].astype(np.int64)
        return g

    partials = ev.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536)
    return grouped_blocks(partials, ["user_id"], combine, batch_format="pandas")


USER_SESSIONS_SQL = f"""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(new_sess) AS BIGINT) AS n_sessions
FROM (
    SELECT user_id,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
GROUP BY user_id
"""


# Auto-select bound for the as-of join build side: at/below this many
# order rows the {custkey: sorted dates} map broadcasts via ray.put;
# above it the co-partitioned merge_asof path runs (the build side
# scales with the corpus, so a fixed broadcast would eventually OOM the
# driver — VERDICT round 1 item 2).
ASOF_BROADCAST_ROW_LIMIT = 2_000_000


def _events_last_order_copartition(sf_dir: str, num_partitions: int | None = None):
    """Large-build-side as-of plan: tag-union events and orders on the
    user/customer key, hash-co-locate with ONE shuffle, and run pandas
    ``merge_asof(by=key)`` block-locally — every key's rows from both
    sides are guaranteed co-resident, and neither side ever touches the
    driver."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def tag_ev(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("user_id"),
                batch.column("event_id"),
                batch.column("ts"),
                pa.nulls(n, type=pa.timestamp("us")),
                pa.array(np.zeros(n, dtype=np.int8)),
            ],
            names=["key", "event_id", "ts", "odate", "side"],
        )

    def tag_od(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("o_custkey"),
                pa.nulls(n, type=pa.int64()),
                pa.nulls(n, type=pa.timestamp("us")),
                batch.column("o_orderdate"),
                pa.array(np.ones(n, dtype=np.int8)),
            ],
            names=["key", "event_id", "ts", "odate", "side"],
        )

    unioned = ev.map_batches(tag_ev, batch_format="pyarrow").union(
        orders.map_batches(tag_od, batch_format="pyarrow")
    )

    def asof_block(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        if e.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "last_orderdate": pd.Series([], dtype="datetime64[us]"),
                }
            )
        o = df[df["side"] == 1]
        e = e.sort_values("ts", kind="mergesort")
        o = o.sort_values("odate", kind="mergesort")
        out = pd.merge_asof(
            e[["event_id", "key", "ts"]],
            o[["key", "odate"]],
            left_on="ts",
            right_on="odate",
            by="key",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": out["event_id"].astype(np.int64),
                "user_id": out["key"].astype(np.int64),
                "last_orderdate": out["odate"],
            }
        )

    return grouped_blocks(
        unioned, ["key"], asof_block, num_partitions, batch_format="pandas"
    )


def events_last_order(sf_dir: str, plan: str = "auto"):
    """AS-OF JOIN: for each event, the user's most recent order date
    at-or-before the event timestamp.

    Two physical plans, auto-selected by the build side's row count
    (``plan='auto'``; parquet-metadata count, no scan):

      * ``'broadcast'`` — orders fit comfortably in worker memory:
        broadcast {custkey: sorted order dates} once via ``ray.put`` and
        answer each event batch with one vectorized searchsorted per
        user present (events NEVER shuffle);
      * ``'copartition'`` — orders scale with the corpus: tag-union both
        tables on the key, ONE hash shuffle, block-local
        ``merge_asof(by=key)`` (see :func:`_events_last_order_copartition`).
    """
    if plan == "auto":
        n = _read(sf_dir, "orders", columns=["o_custkey"]).count()
        plan = "broadcast" if n <= ASOF_BROADCAST_ROW_LIMIT else "copartition"
    if plan == "copartition":
        return _events_last_order_copartition(sf_dir)
    rows = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).take_all()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(int(r["o_custkey"]), []).append(r["o_orderdate"])
    lookup = {
        k: np.sort(np.array(v, dtype="datetime64[us]")) for k, v in by_cust.items()
    }
    ref = ray.put(lookup)

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def asof(batch: pa.Table) -> pd.DataFrame:
        lk = ray.get(ref)
        df = batch.to_pandas()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        out = np.full(len(df), np.datetime64("NaT"), dtype="datetime64[us]")
        users = df["user_id"].to_numpy()
        for u in np.unique(users):
            dates = lk.get(int(u))
            if dates is None or not len(dates):
                continue
            m = users == u
            idx = np.searchsorted(dates, ts[m], side="right") - 1
            vals = np.where(idx >= 0, dates[np.maximum(idx, 0)], np.datetime64("NaT"))
            out[m] = vals
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "last_orderdate": out,
            }
        )

    return ev.map_batches(asof, batch_format="pyarrow", batch_size=65536)


EVENTS_LAST_ORDER_SQL = """
SELECT e.event_id, e.user_id, o.o_orderdate AS last_orderdate
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def events_sliding(sf_dir: str):
    """Sliding-window aggregate (1-hour window, 15-minute slide): each
    event is flat-mapped to the 4 windows containing it, partially
    aggregated per batch, and combined with a bounded-key coalesced
    final — the batch expression of a streaming hopping window (ordering
    assumption: none; hop windows are order-insensitive)."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        bucket = df["ts"].dt.floor("15min")
        df["value_c"] = _cents(df["value"])
        parts = []
        for i in range(4):
            w = bucket - pd.Timedelta(minutes=15 * i)
            parts.append(
                pd.DataFrame(
                    {
                        "event_type": df["event_type"],
                        "window_start": w.dt.strftime("%Y-%m-%d %H:%M:00"),
                        "value_c": df["value_c"],
                    }
                )
            )
        allp = pd.concat(parts, ignore_index=True)
        return allp.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value_c", "size"), sum_value_cents=("value_c", "sum")
        )

    # window_start cardinality grows with the time span (see
    # events_hourly): guarded final
    return adaptive_final(
        ev.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        _combine_sums(["event_type", "window_start"], ["n_events", "sum_value_cents"]),
        keys=["event_type", "window_start"],
    )


EVENTS_SLIDING_SQL = """
WITH k AS (SELECT unnest([0, 1, 2, 3]) AS i)
SELECT event_type,
       strftime(date_trunc('minute', ts)
                - INTERVAL (CAST(EXTRACT(minute FROM ts) AS INT) % 15) MINUTE
                - INTERVAL (15 * i) MINUTE,
                '%Y-%m-%d %H:%M:00') AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events, k
GROUP BY event_type, window_start
"""


def events_prop_stats(sf_dir: str):
    """JSON scalar-function surface (SURVEY.md §2.8): parse the ``props``
    JSON column per batch (orjson-free stdlib json — vectorization here
    is the batch, not the parser), extract the 'k' field, aggregate
    per event_type with a bounded-key coalesced final."""
    import json as _json

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ks = np.fromiter(
            (
                int((_json.loads(p) or {}).get("k", 0)) if p else 0
                for p in batch.column("props").to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        df = pd.DataFrame(
            {"event_type": batch.column("event_type").to_pylist(), "k": ks}
        )
        return df.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max")
        )

    return coalesced_blocks(
        ev.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536), combine
    )


EVENTS_PROP_STATS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


def docs_by_source(sf_dir: str):
    """Per-source corpus stats over the documents table (partial combine
    + groupby)."""
    docs = _read(sf_dir, "documents", columns=["source", "n_chars", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        n_tokens = pc.if_else(
            pc.equal(trimmed, ""),
            pa.scalar(0, pa.int64()),
            pc.cast(
                pc.list_value_length(pc.utf8_split_whitespace(trimmed)), pa.int64()
            ),
        )
        df = batch.to_pandas()
        df["n_tokens"] = n_tokens.to_numpy(zero_copy_only=False)
        return df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"),
            sum_chars=("n_chars", "sum"),
            sum_tokens=("n_tokens", "sum"),
        )

    return coalesced_blocks(
        docs.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        _combine_sums(["source"], ["n_docs", "sum_chars", "sum_tokens"]),
    )


DOCS_BY_SOURCE_SQL = r"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT)
           AS sum_tokens
FROM documents
GROUP BY source
"""


def order_event_window(sf_dir: str, days: int = 7, num_partitions: int | None = None):
    """RANGE (interval) JOIN: for each order, the count and cents-exact
    value sum of the customer's events inside ``[o_orderdate,
    o_orderdate + days)`` — the "activity in the week after purchase"
    shape. Ray Data has no non-equi join; the plan is the engine's
    co-partition pattern specialized to interval predicates:

      * tag-union both tables on the user/customer key — ONE hash
        shuffle co-locates each key's orders AND events;
      * block-locally, per user: sort event timestamps once, then
        answer every order with two vectorized ``searchsorted`` probes
        (count = hi - lo) and a prefix-sum lookup (sum = cum[hi] -
        cum[lo]) — no per-event Python, no order x event blow-up.

    Partitioning assumption: one user's rows fit a block (same bound as
    user_sessions / the as-of join; keys are users, so no corpus-scale
    hot key exists). Orders for users with no events are emitted with
    zero counts (left-join semantics).

    Returns Dataset[(o_orderkey, n_events, sum_value_cents)].
    """
    from docstrange_ray.shuffle import grouped_blocks

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_ev(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("user_id"),
                pa.nulls(n, type=pa.int64()),
                batch.column("ts"),
                pa.array(_cents(batch.column("value").to_numpy(zero_copy_only=False))),
                pa.array(np.zeros(n, dtype=np.int8)),
            ],
            names=["key", "o_orderkey", "ts", "value_cents", "side"],
        )

    def tag_od(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("o_custkey"),
                batch.column("o_orderkey"),
                batch.column("o_orderdate"),
                pa.nulls(n, type=pa.int64()),
                pa.array(np.ones(n, dtype=np.int8)),
            ],
            names=["key", "o_orderkey", "ts", "value_cents", "side"],
        )

    unioned = ev.map_batches(tag_ev, batch_format="pyarrow").union(
        orders.map_batches(tag_od, batch_format="pyarrow")
    )
    span = np.timedelta64(days, "D").astype("timedelta64[us]")

    def window_block(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 1]
        if o.empty:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "sum_value_cents": pd.Series([], dtype=np.int64),
                }
            )
        e = df[df["side"] == 0]
        okeys = o["o_orderkey"].to_numpy(dtype=np.int64)
        n_events = np.zeros(len(o), dtype=np.int64)
        sums = np.zeros(len(o), dtype=np.int64)
        if not e.empty:
            e = e.sort_values(["key", "ts"], kind="mergesort")
            e_keys = e["key"].to_numpy()
            e_ts = e["ts"].to_numpy().astype("datetime64[us]")
            e_cum = np.concatenate(
                [[0], e["value_cents"].to_numpy(dtype=np.int64).cumsum()]
            )
            # per-user slices of the block-sorted event arrays
            starts = {}
            uniq, first = np.unique(e_keys, return_index=True)
            bounds = np.append(first, len(e_keys))
            for i, u in enumerate(uniq):
                starts[int(u)] = (bounds[i], bounds[i + 1])
            o_keys = o["key"].to_numpy()
            o_ts = o["ts"].to_numpy().astype("datetime64[us]")
            for u in np.unique(o_keys):
                seg = starts.get(int(u))
                if seg is None:
                    continue
                s0, s1 = seg
                sel = o_keys == u
                lo = np.searchsorted(e_ts[s0:s1], o_ts[sel], side="left") + s0
                hi = np.searchsorted(e_ts[s0:s1], o_ts[sel] + span, side="left") + s0
                n_events[sel] = hi - lo
                sums[sel] = e_cum[hi] - e_cum[lo]
        return pd.DataFrame(
            {"o_orderkey": okeys, "n_events": n_events, "sum_value_cents": sums}
        )

    return grouped_blocks(
        unioned, ["key"], window_block, num_partitions, batch_format="pandas"
    )


ORDER_EVENT_WINDOW_SQL = """
SELECT o_orderkey,
       COUNT(e.ts) AS n_events,
       COALESCE(SUM(CAST(ROUND(e.value * 100) AS BIGINT)), 0) AS sum_value_cents
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY o_orderkey
"""


def priority_returned_orders(sf_dir: str, num_partitions: int | None = None):
    """SEMI-JOIN (TPC-H-Q4 shape): count orders per priority that have at
    least one returned lineitem (l_returnflag = 'R').

    Scale shape: the EXISTS predicate is single-sided, so the lineitem
    probe side reduces per batch to DISTINCT order keys BEFORE the
    exchange (a million-line order ships n_batches rows, never its
    lines). ONE orderkey exchange co-locates probe keys with the orders;
    the block-local semi-join emits per-block priority partials, and the
    bounded final (5 priorities) coalesces without an aggregator pool.
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def probe_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        keys = df.loc[df["l_returnflag"] == "R", "l_orderkey"].unique()
        return pd.DataFrame(
            {
                "key": keys.astype(np.int64),
                "o_orderpriority": "",
                "side": np.int8(1),
            }
        )

    def tag_orders(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {
                "key": df["o_orderkey"].astype(np.int64),
                "o_orderpriority": df["o_orderpriority"],
                "side": np.int8(0),
            }
        )

    tagged = li.map_batches(arrow_out(probe_partial), batch_format="pyarrow").union(
        orders.map_batches(arrow_out(tag_orders), batch_format="pyarrow")
    )

    def semi_partial(df: pd.DataFrame) -> pd.DataFrame:
        probe = set(df.loc[df["side"] == 1, "key"])
        o = df[df["side"] == 0]
        hit = o[o["key"].isin(probe)]
        g = hit.groupby("o_orderpriority", as_index=False).size()
        return g.rename(columns={"size": "order_count"})

    partials = grouped_blocks(
        tagged, ["key"], semi_partial, num_partitions, batch_format="pandas"
    )
    return coalesced_blocks(
        partials,
        _combine_sums(["o_orderpriority"], ["order_count"]),
    )


def source_percent_rank(sf_dir: str, num_partitions: int | None = None):
    """Ranking window function: PERCENT_RANK of document length within
    its source. Per-row output, so the plan is the minimal one — ONE
    source-key exchange of the 3-column projection, then a block-local
    mergesort + arange rank per group ((rank-1)/(n-1) over the
    tie-free (n_chars, doc_id) order, exact integer division rounded at
    emit on both engines; single-row groups emit 0 like SQL does).
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def rank_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "n_chars", "doc_id"], kind="mergesort")
        sizes = df.groupby("source")["doc_id"].transform("size").to_numpy(np.int64)
        rank = df.groupby("source").cumcount().to_numpy(np.int64)  # 0-based
        denom = np.maximum(sizes - 1, 1)
        pr = np.where(sizes == 1, 0.0, rank / denom)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "source": df["source"].to_numpy(),
                "pct_rank": round6(pr, 6),
            }
        )

    return grouped_blocks(
        docs, ["source"], rank_block, num_partitions, batch_format="pandas"
    )


SOURCE_PERCENT_RANK_SQL = """
SELECT doc_id, source,
       ROUND(PERCENT_RANK() OVER (
           PARTITION BY source ORDER BY n_chars, doc_id), 6) AS pct_rank
FROM documents
"""


def source_decile(sf_dir: str, num_partitions: int | None = None):
    """NTILE(10) bucketing: each document's length decile within its
    source — the equal-width-bucket window function (train/val split
    assignment, per-bucket curriculum sampling). Same minimal plan as
    :func:`source_percent_rank` (ONE source exchange, block-local rank)
    with NTILE's exact integer bucket rule: the first n%k buckets get
    ceil(n/k) rows over the tie-free (n_chars, doc_id) order.
    """
    from docstrange_ray.shuffle import grouped_blocks

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    k = 10

    def ntile_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "n_chars", "doc_id"], kind="mergesort")
        n = df.groupby("source")["doc_id"].transform("size").to_numpy(np.int64)
        r = df.groupby("source").cumcount().to_numpy(np.int64)
        small = n // k
        big = n % k
        cut = big * (small + 1)
        in_big = r < cut
        # rows beyond the big buckets; guard small==0 (n < k: every row
        # is in a big bucket, the alternative branch is never selected)
        small_safe = np.maximum(small, 1)
        bucket = np.where(
            in_big, r // (small + 1) + 1, big + (r - cut) // small_safe + 1
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "source": df["source"].to_numpy(),
                "decile": bucket.astype(np.int64),
            }
        )

    return grouped_blocks(
        docs, ["source"], ntile_block, num_partitions, batch_format="pandas"
    )


SOURCE_DECILE_SQL = """
SELECT doc_id, source,
       NTILE(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS decile
FROM documents
"""


def hourly_trend(sf_dir: str):
    """Distributed least-squares via SUFFICIENT STATISTICS: per event
    type, the OLS slope/intercept of spend (cents) on hour-of-day.

    Scale shape: OLS needs only (n, Sx, Sy, Sxy, Sxx) — algebraic sums
    that pre-reduce per batch to one row per event type and combine by
    addition, so the whole regression is a bounded coalesced final with
    zero shuffles. Per-batch sums are exact int64 (hour <= 23, cents
    and batch rows bounded); the bounded final combines and solves in
    Python arbitrary-precision ints mirroring the oracle's HUGEINT
    arithmetic, and both engines perform the identical final double
    division — float-summation nondeterminism (the usual
    distributed-regression hazard) never enters, at any corpus size.
    A degenerate regressor (every event in one hour) yields NULL
    coefficients, matching SQL division-by-zero.
    """
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        x = df["ts"].dt.hour.to_numpy(np.int64)
        y = _cents(df["value"])
        g = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return g.groupby("event_type", as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["n", "sx", "sy", "sxy", "sxx"]
        # Python arbitrary-precision ints: n*sxy wraps numpy int64 at a
        # few million events per type (and the combined sxy sum itself
        # can), while the oracle's HUGEINT sums stay exact. Object-dtype
        # summation + the final float conversions mirror DuckDB's
        # HUGEINT arithmetic and HUGEINT->double cast, so the rounded
        # division is bit-identical.
        tmp = df.copy()
        for c in cols:
            tmp[c] = tmp[c].astype(object)
        g = tmp.groupby("event_type", as_index=False)[cols].sum()
        slopes, intercepts = [], []
        for n, sx, sy, sxy, sxx in zip(
            g["n"].tolist(), g["sx"].tolist(), g["sy"].tolist(),
            g["sxy"].tolist(), g["sxx"].tolist(),
        ):
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx
            if den == 0:  # all events in one hour: DuckDB x/0 is NULL
                slopes.append(None)
                intercepts.append(None)
                continue
            slope = float(num) / float(den)
            slopes.append(float(round6(slope)))
            intercepts.append(float(round6((float(sy) - slope * float(sx)) / float(n))))
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_events": g["n"].astype(np.int64),
                "slope_cents_per_hour": pd.array(slopes, dtype="float64"),
                "intercept_cents": pd.array(intercepts, dtype="float64"),
            }
        )

    parts = ev.map_batches(arrow_out(partial), batch_format="pyarrow")
    return coalesced_blocks(parts, final)


HOURLY_TREND_SQL = """
WITH s AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS sx,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sy,
           SUM(CAST(EXTRACT(hour FROM ts) AS BIGINT)
               * CAST(ROUND(value * 100) AS BIGINT)) AS sxy,
           SUM(CAST(EXTRACT(hour FROM ts) AS BIGINT)
               * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS sxx
    FROM events GROUP BY event_type
)
SELECT event_type, n AS n_events,
       ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
           AS slope_cents_per_hour,
       ROUND((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx)
             / n, 6) AS intercept_cents
FROM s
"""


def length_histogram(sf_dir: str, bin_width: int = 50):
    """Fixed-bin histogram of document length — the distribution
    primitive behind packing-budget and batch-size decisions. Pure
    partial-reduce: each batch emits one row per occupied bin (integer
    floor division), a bounded coalesced final sums.
    Returns Dataset[(bin_lo, n_docs)].
    """
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    docs = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        b = (
            batch.column("n_chars").to_pandas().astype(np.int64) // bin_width
        ) * bin_width
        vc = b.value_counts()
        return pd.DataFrame(
            {"bin_lo": vc.index.astype(np.int64), "n_docs": vc.to_numpy(np.int64)}
        )

    return coalesced_blocks(
        docs.map_batches(arrow_out(partial), batch_format="pyarrow"),
        _combine_sums(["bin_lo"], ["n_docs"]),
    )


LENGTH_HISTOGRAM_SQL = """
SELECT (n_chars // 50) * 50 AS bin_lo, COUNT(*) AS n_docs
FROM documents
GROUP BY 1
"""


def length_dispersion(sf_dir: str):
    """Per-source mean and SAMPLE VARIANCE of document length via exact
    integer sufficient statistics (n, Σx, Σx²) — the dispersion
    aggregate, same zero-float-summation discipline as
    :func:`hourly_trend`: partials are int64, the bounded final solves
    in Python bignums mirroring HUGEINT, and the only doubles are the
    two final divisions both engines compute identically.
    Returns Dataset[(source, n_docs, mean_chars, var_chars)].
    """
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    docs = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        x = df["n_chars"].astype(np.int64)
        g = (
            pd.DataFrame({"source": df["source"], "n": np.int64(1), "sx": x, "sq": x * x})
            .groupby("source", as_index=False)
            .sum()
        )
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        tmp = df.copy()
        for c in ("n", "sx", "sq"):
            tmp[c] = tmp[c].astype(object)
        g = tmp.groupby("source", as_index=False)[["n", "sx", "sq"]].sum()
        means, variances = [], []
        for n, sx, sq in zip(g["n"].tolist(), g["sx"].tolist(), g["sq"].tolist()):
            means.append(float(round6(float(sx) / float(n))))
            variances.append(
                None
                if n < 2
                else float(round6(float(n * sq - sx * sx) / float(n * (n - 1))))
            )
        return pd.DataFrame(
            {
                "source": g["source"],
                "n_docs": g["n"].astype(np.int64),
                "mean_chars": pd.array(means, dtype="float64"),
                "var_chars": pd.array(variances, dtype="float64"),
            }
        )

    return coalesced_blocks(
        docs.map_batches(arrow_out(partial), batch_format="pyarrow"), final
    )


LENGTH_DISPERSION_SQL = """
WITH s AS (
    SELECT source, COUNT(*) AS n, SUM(n_chars) AS sx,
           SUM(n_chars * n_chars) AS sq
    FROM documents GROUP BY source
)
SELECT source, n AS n_docs,
       ROUND(sx * 1.0 / n, 6) AS mean_chars,
       CASE WHEN n < 2 THEN NULL
            ELSE ROUND((n * sq - sx * sx) * 1.0 / (n * (n - 1)), 6) END
           AS var_chars
FROM s
"""


def event_affinity(sf_dir: str, num_partitions: int | None = None):
    """Market-basket affinity: for each pair of event types, how many
    users did BOTH, with lift = P(a,b) / (P(a)P(b)) — the association
    signal behind "users who X also Y".

    Scale shape: per-batch distinct (user, type) pairs -> ONE user
    exchange; each block holds complete users, so it emits per-user
    type-pair rows plus per-type single rows and one user sentinel —
    all already count-reduced. The (type, type) key space is bounded
    (T^2 for T event types), so the second stage is a coalesced
    combine, and lift's division mirrors the oracle's literal
    ``n_both * 1.0 * n_users / (c_a * 1.0 * c_b)`` double expression.
    Returns Dataset[(type_a, type_b, n_both, lift)].
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        return (
            batch.to_pandas()
            .drop_duplicates(["user_id", "event_type"])
            .reset_index(drop=True)
        )

    def user_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"])
        rows_a, rows_b = [], []
        n_users = df["user_id"].nunique()
        for _, sub in df.groupby("user_id", sort=False):
            ts = np.sort(sub["event_type"].to_numpy())
            ia, ib = np.triu_indices(len(ts), k=1)
            rows_a.append(ts[ia])
            rows_b.append(ts[ib])
        pairs = pd.DataFrame(
            {
                "type_a": np.concatenate(rows_a) if rows_a else [],
                "type_b": np.concatenate(rows_b) if rows_b else [],
            }
        )
        pc_ = pairs.groupby(["type_a", "type_b"], as_index=False).size()
        singles = df.groupby("event_type", as_index=False)["user_id"].nunique()
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "type_a": pc_["type_a"],
                        "type_b": pc_["type_b"],
                        "n": pc_["size"].astype(np.int64),
                    }
                ),
                pd.DataFrame(
                    {
                        "type_a": singles["event_type"],
                        "type_b": "",
                        "n": singles["user_id"].astype(np.int64),
                    }
                ),
                pd.DataFrame({"type_a": [""], "type_b": [""], "n": [np.int64(n_users)]}),
            ],
            ignore_index=True,
        )
        return out

    partials = grouped_blocks(
        ev.map_batches(arrow_out(pair_partial), batch_format="pyarrow"),
        ["user_id"],
        user_block,
        num_partitions,
        batch_format="pandas",
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["type_a", "type_b"], as_index=False)["n"].sum()
        n_users = int(g.loc[(g["type_a"] == "") & (g["type_b"] == ""), "n"].sum())
        singles = g[(g["type_b"] == "") & (g["type_a"] != "")]
        c = dict(zip(singles["type_a"], singles["n"].astype(int)))
        p = g[(g["type_a"] != "") & (g["type_b"] != "")]
        ca = p["type_a"].map(c).to_numpy(np.int64)
        cb = p["type_b"].map(c).to_numpy(np.int64)
        n_both = p["n"].to_numpy(np.int64)
        lift = round6(n_both * 1.0 * n_users / (ca * 1.0 * cb), 6)
        return pd.DataFrame(
            {
                "type_a": p["type_a"],
                "type_b": p["type_b"],
                "n_both": n_both,
                "lift": lift,
            }
        ).reset_index(drop=True)

    return coalesced_blocks(partials, final)


EVENT_AFFINITY_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
ta AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
    FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both,
       ROUND(p.n_both * 1.0 * n.n_users / (ta.c * 1.0 * tb.c), 6) AS lift
FROM pairs p
JOIN ta ON ta.event_type = p.type_a
JOIN ta tb ON tb.event_type = p.type_b
CROSS JOIN n
"""


def daily_anomalies(sf_dir: str, num_partitions: int | None = None):
    """Statistical anomaly detection with ZERO floating point: days
    whose event count deviates more than 2 sample standard deviations
    from their event type's daily mean. The 2-sigma test
    ``(c - mean)^2 > 4 * var`` cross-multiplies into pure integers —
    ``(c*n - Sc)^2 * (n-1) > 4 * n * (n*Sq - Sc^2)`` — evaluated in
    Python bignums mirroring the oracle's HUGEINT arithmetic, so the
    flag decision is EXACT at any scale (no epsilon, no rounding, no
    summation-order hazard).

    Scale shape: per-batch (type, day, count) partials (one row per
    type-day per batch) -> ONE event_type exchange co-locates each
    type's day histogram -> block-local integer filter. The exchange
    carries day-granularity rows, not events.
    Returns Dataset[(event_type, day, n_events)] — the anomalous days.
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = (
            pd.DataFrame(
                {"event_type": df["event_type"], "day": df["ts"].dt.normalize()}
            )
            .groupby(["event_type", "day"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    def block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "day"], as_index=False)["c"].sum()
        rows = []
        for et, sub in g.groupby("event_type", sort=True):
            cs = [int(x) for x in sub["c"]]
            n = len(cs)
            if n <= 1:
                continue
            sc = sum(cs)
            sq = sum(c * c for c in cs)
            var_num = n * sq - sc * sc  # n*(n-1)*sample_variance
            for day, c in zip(sub["day"], cs):
                if (c * n - sc) ** 2 * (n - 1) > 4 * n * var_num:
                    rows.append({"event_type": et, "day": day, "n_events": c})
        if not rows:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "day": pd.Series([], dtype="datetime64[ns]"),
                    "n_events": pd.Series([], dtype=np.int64),
                }
            )
        out = pd.DataFrame(rows)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    parts = ev.map_batches(arrow_out(partial), batch_format="pyarrow")
    return grouped_blocks(
        parts, ["event_type"], block, num_partitions, batch_format="pandas"
    )


DAILY_ANOMALIES_SQL = """
WITH d AS (
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
    FROM events GROUP BY 1, 2
), s AS (
    SELECT event_type, COUNT(*) AS n, SUM(c) AS sc, SUM(c * c) AS sq
    FROM d GROUP BY 1
)
SELECT d.event_type, CAST(d.day AS TIMESTAMP) AS day, d.c AS n_events
FROM d JOIN s USING (event_type)
WHERE n > 1
  AND (d.c * n - sc) * (d.c * n - sc) * (n - 1) > 4 * n * (n * sq - sc * sc)
"""


def user_journeys(sf_dir: str, num_partitions: int | None = None):
    """Ordered string aggregation (journey mining): each user's full
    event-type sequence in time order, then the frequency of each
    distinct journey — the behavioral-analytics shape (funnel mining's
    unsupervised cousin).

    Scale shape: an ORDER-dependent concat admits no pre-exchange
    reduction (unlike sums), so the minimal plan ships the 4-column
    projection through ONE user exchange and builds each journey
    block-locally (mergesort + groupby-agg-join); journey FREQUENCIES
    then pre-reduce per block before the second, journey-keyed
    exchange, so the heavy first exchange is user-bounded and the
    second ships one row per distinct journey per block.
    Returns Dataset[(journey, n_users)].
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def journey_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        j = df.groupby("user_id", sort=False)["event_type"].agg(">".join)
        vc = j.value_counts()
        return pd.DataFrame(
            {"journey": vc.index, "n_users": vc.to_numpy(dtype=np.int64)}
        )

    journeys = grouped_blocks(
        ev, ["user_id"], journey_block, num_partitions, batch_format="pandas"
    )
    return grouped_blocks(
        journeys,
        ["journey"],
        lambda df: df.groupby("journey", as_index=False)["n_users"].sum(),
        num_partitions,
        batch_format="pandas",
    )


USER_JOURNEYS_SQL = """
WITH j AS (
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
    FROM events GROUP BY user_id
)
SELECT journey, COUNT(*) AS n_users
FROM j GROUP BY journey
"""


def user_interarrival(sf_dir: str, num_partitions: int | None = None):
    """LAG-window query (mean inter-event gap per user) rewritten as an
    algebraic aggregate: consecutive-gap sums TELESCOPE to max(ts) -
    min(ts), so the per-user mean gap is (max - min)/(n - 1) and the
    whole window computation collapses to partial-reducible
    (n, min, max) triples — each batch ships one row per user seen, ONE
    user exchange, bounded combine. The SQL oracle runs the literal
    LAG/AVG window formulation, proving the rewrite. Gaps are summed in
    exact integer microseconds so the rounded division is bit-identical
    on both engines. Users with a single event have no gap and are
    omitted (matching the LAG NULL filter).
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        us = df["ts"].astype("int64")  # exact microseconds
        g = (
            pd.DataFrame({"user_id": df["user_id"].astype(np.int64), "us": us})
            .groupby("user_id", as_index=False)
            .agg(n=("us", "size"), mn=("us", "min"), mx=("us", "max"))
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(
            n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        g = g[g["n"] >= 2]
        gaps = g["n"].to_numpy(np.int64) - 1
        span_us = g["mx"].to_numpy(np.int64) - g["mn"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "n_events": g["n"].to_numpy(np.int64),
                "mean_gap_sec": round6(span_us / (gaps * 1_000_000.0), 6),
            }
        )

    partials = ev.map_batches(arrow_out(partial), batch_format="pyarrow")
    return grouped_blocks(
        partials, ["user_id"], combine, num_partitions, batch_format="pandas"
    )


USER_INTERARRIVAL_SQL = """
WITH d AS (
    SELECT user_id,
           EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events)
SELECT user_id, COUNT(*) + 1 AS n_events,
       ROUND(SUM(gap_us) / (COUNT(*) * 1000000.0), 6) AS mean_gap_sec
FROM d WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


def event_user_reach(sf_dir: str, num_partitions: int | None = None):
    """Distributed COUNT(DISTINCT): unique users per event type.

    Scale shape: distinct-count cannot pre-aggregate as plain sums, so
    the plan dedups per batch to DISTINCT (event_type, user_id) pairs
    (a user firing the same event a million times in one batch ships
    one row), exchanges on the PAIR key (hot event types spread across
    partitions — no single-reducer hot key), counts distinct pairs per
    block, and sums the disjoint per-block counts in a bounded final
    (pair-key partitioning makes block counts additive).
    """
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        return (
            batch.to_pandas()
            .drop_duplicates(["event_type", "user_id"])
            .reset_index(drop=True)
        )

    def block_count(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop_duplicates(["event_type", "user_id"])
            .groupby("event_type", as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    pairs = ev.map_batches(arrow_out(partial), batch_format="pyarrow")
    per_block = grouped_blocks(
        pairs,
        ["event_type", "user_id"],
        block_count,
        num_partitions,
        batch_format="pandas",
    )
    return coalesced_blocks(per_block, _combine_sums(["event_type"], ["n_users"]))


EVENT_USER_REACH_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


def user_running_total(sf_dir: str, num_partitions: int | None = None):
    """Cumulative window function (``SUM(value) OVER (PARTITION BY
    user_id ORDER BY ts)``): per-event running spend per user.

    Scale shape: a true per-row window cannot pre-reduce (its output IS
    one row per input row), so the plan is the minimal one — project the
    four needed columns, ONE user_id exchange, block-local mergesort +
    grouped cumsum (vectorized). A pathological user's whole history
    lands in one block (same partitioning assumption as
    ``user_sessions``); values are summed in integer cents so the
    running sums are exact and hash-stable.
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype(np.int64),
                "ts": df["ts"],
                "user_id": df["user_id"].astype(np.int64),
                "value_cents": _cents(df["value"]),
            }
        )

    def running_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "running_cents": df.groupby("user_id")["value_cents"]
                .cumsum()
                .to_numpy()
                .astype(np.int64),
            }
        )
        return out

    prepped = ev.map_batches(arrow_out(prep), batch_format="pyarrow")
    return grouped_blocks(
        prepped, ["user_id"], running_block, num_partitions, batch_format="pandas"
    )


USER_RUNNING_TOTAL_SQL = """
SELECT event_id, user_id,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS running_cents
FROM events
"""


def order_count_distribution(sf_dir: str, num_partitions: int | None = None):
    """LEFT-OUTER-JOIN distribution (TPC-H-Q13 shape): how many customers
    placed exactly N non-urgent orders, INCLUDING the zero-order bucket.

    Scale shape: the naive plan outer-joins two big tables; this one
    never joins at all. Orders pre-aggregate per batch to (custkey,
    partial_count) before the ONE custkey exchange; each co-located
    block reduces to a (c_count -> custdist) histogram partial, which is
    distribution-sized, not customer-sized. The zero bucket uses a
    signed correction: customer batches emit (0, +rows) partials and
    each custkey block emits (0, -distinct_custkeys), so the bounded
    final combine nets exactly the customers with no qualifying orders —
    the customer table is scanned once and never shuffled.
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    customer = _read(sf_dir, "customer", columns=["c_custkey"])

    def ord_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["o_orderpriority"] != "1-URGENT"]
        g = df.groupby("o_custkey", as_index=False).size()
        return pd.DataFrame(
            {
                "key": g["o_custkey"].astype(np.int64),
                "n": g["size"].astype(np.int64),
            }
        )

    counts = orders.map_batches(arrow_out(ord_partial), batch_format="pyarrow")

    def hist_block(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby("key", as_index=False)["n"].sum()
        h = per.groupby("n", as_index=False).size()
        h = h.rename(columns={"n": "c_count", "size": "custdist"})
        zero = pd.DataFrame({"c_count": [0], "custdist": [-len(per)]})
        return pd.concat([h, zero], ignore_index=True).astype(
            {"c_count": np.int64, "custdist": np.int64}
        )

    hist = grouped_blocks(
        counts, ["key"], hist_block, num_partitions, batch_format="pandas"
    )

    def cust_partial(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {"c_count": [np.int64(0)], "custdist": [np.int64(batch.num_rows)]}
        )

    cust = customer.map_batches(arrow_out(cust_partial), batch_format="pyarrow")

    combined = coalesced_blocks(
        hist.union(cust), _combine_sums(["c_count"], ["custdist"])
    )
    # a fully-netted zero bucket (every customer ordered) has no LEFT
    # JOIN group row — drop it rather than emit custdist = 0
    return combined.map_batches(
        lambda t: t.filter(pc.greater(t.column("custdist"), 0)),
        batch_format="pyarrow",
    )


ORDER_COUNT_DIST_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey)
GROUP BY c_count
"""


PRIORITY_RETURNED_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def pivot_agg(
    ds,
    index_col: str,
    pivot_col: str,
    value_col: str,
    pivot_values: list[str],
    num_partitions: int | None = None,
):
    """Relational PIVOT: one output row per ``index_col`` value with a
    count column and an exact integer-cent sum column per pivot value
    (``cnt_<v>``, ``sum_<v>_cents``) — the wide-format feature matrix a
    per-user / per-entity model consumes. ``pivot_values`` is the
    EXPLICIT bounded column list: a pivot's output schema must be fixed
    up front (SQL ``PIVOT ... IN (...)`` semantics); rows whose pivot
    value is outside the list are ignored, absent combinations emit 0.

    Scale shape: every batch pre-reduces to the wide (index x fixed
    columns) partial, so the ONE index-key exchange carries at most
    ``n_batches`` rows per index value, never the raw events — a
    billion-event user ships as per-batch partial rows. Sums ride
    int64 cents (the house float-sum discipline: order-independent,
    oracle-exact). Returns Dataset[(index_col, cnt_*, sum_*_cents...)].
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    order = list(pivot_values)
    cnt_cols = [f"cnt_{v}" for v in order]
    sum_cols = [f"sum_{v}_cents" for v in order]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([index_col, pivot_col, value_col]).to_pandas()
        df = df[df[pivot_col].isin(order)]
        # SQL SUM skips NULLs while COUNT(*) still counts the row:
        # a null value contributes 0 cents (np.round(NaN).astype(int64)
        # would emit INT64_MIN garbage)
        df["value_c"] = _cents(df[value_col].fillna(0.0))
        g = df.groupby([index_col, pivot_col])["value_c"].agg(["size", "sum"])
        wide_n = g["size"].unstack(fill_value=0).reindex(columns=order, fill_value=0)
        wide_s = g["sum"].unstack(fill_value=0).reindex(columns=order, fill_value=0)
        out = pd.DataFrame(index=wide_n.index)
        for v, c, s in zip(order, cnt_cols, sum_cols):
            out[c] = wide_n[v].astype(np.int64)
            out[s] = wide_s[v].astype(np.int64)
        return out.reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(index_col, as_index=False)[cnt_cols + sum_cols].sum()

    partials = ds.map_batches(
        arrow_out(partial), batch_format="pyarrow", batch_size=65536
    )
    return grouped_blocks(
        partials, [index_col], final, num_partitions, batch_format="pandas"
    )


def scd2_merge(
    dim,
    snap,
    key: str,
    attrs: list[str],
    snap_date: str,
    int_cols: list[str] | None = None,
    high_date: str = "9999-12-31",
    num_partitions: int | None = None,
):
    """Slowly-changing-dimension type-2 merge (Kimball DW): apply a new
    ``snap`` snapshot (key + attrs, no validity columns) to a ``dim``
    history table (key + attrs + valid_from/valid_to strings, open rows
    marked valid_to == ``high_date``), emitting the merged history:

      * key in both, attrs equal          -> current row kept open
      * key in both, any attr changed     -> current row CLOSED at
        ``snap_date`` + a new open row with the snapshot's attrs
      * key only in snapshot              -> new open row (insert)
      * key only in dim                   -> kept open (absence is not
        a delete in this contract — mirror of a LEFT-feed source)
      * already-closed history rows       -> pass through untouched

    Scale shape: closed rows never enter the exchange (filtered to a
    pass-through union); current-vs-snapshot is ONE co-partition
    ``hash_join`` outer merge on the key; the resolve step is a
    vectorized per-batch scan. ``int_cols`` names the integer columns
    to re-cast after pandas' outer-merge NaN-padding promotes them to
    float64 (exact below 2^53 — the documented bound; ids/cents above
    that need a string or split-column carrier).

    Dates ride as plain ISO strings on both sides — no date arithmetic
    exists to diverge, so the op is SQL-oracle-exact by construction.
    """
    from docstrange_ray.shuffle import hash_join

    int_cols = [key] + list(int_cols or [])
    dim_cols = [key] + list(attrs) + ["valid_from", "valid_to"]

    def _is_open(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch.column("valid_to"), high_date))

    def _is_closed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.not_equal(batch.column("valid_to"), high_date)
        )

    dim = dim.map_batches(
        lambda b: b.select(dim_cols), batch_format="pyarrow"
    )
    closed = dim.map_batches(_is_closed, batch_format="pyarrow")
    cur = dim.map_batches(_is_open, batch_format="pyarrow").map_batches(
        lambda df: df.assign(in_dim=np.int8(1)), batch_format="pandas"
    )
    snap_r = snap.map_batches(
        lambda df: df[[key] + list(attrs)]
        .rename(columns={a: f"s_{a}" for a in attrs})
        .assign(in_snap=np.int8(1)),
        batch_format="pandas",
    )
    # an all-empty snapshot loses its schema (Ray empty-Dataset gotcha)
    # and would crash hash_join's schema probe; the merge is a no-op
    if snap_r.schema() is None:
        return dim
    j = hash_join(cur, snap_r, key=key, how="outer",
                  num_partitions=num_partitions)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        in_dim = df["in_dim"].fillna(0).astype(bool)
        in_snap = df["in_snap"].fillna(0).astype(bool)
        same = in_dim & in_snap
        for a in attrs:
            same &= df[a] == df[f"s_{a}"]
        keep = df[in_dim & (same | ~in_snap)][dim_cols]
        chg = df[in_dim & in_snap & ~same]
        closed_now = chg[[key] + list(attrs) + ["valid_from"]].assign(
            valid_to=snap_date
        )
        new_src = df[in_snap & (~in_dim | ~same)]
        opened = pd.DataFrame(
            {key: new_src[key], **{a: new_src[f"s_{a}"] for a in attrs}}
        ).assign(valid_from=snap_date, valid_to=high_date)
        out = pd.concat([keep, closed_now, opened], ignore_index=True)[
            dim_cols
        ]
        for c in int_cols:
            out[c] = out[c].astype("int64")
        return out

    return closed.union(j.map_batches(resolve, batch_format="pandas"))
