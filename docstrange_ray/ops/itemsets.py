"""Frequent itemset mining (distributed A-Priori to 3-itemsets).

Market-basket mining over an (basket_id, item) table — the classic
data-mining op the relational family lacks (``event_affinity`` counts
raw pairs; A-Priori adds the LEVEL-WISE PRUNE that makes higher-order
itemsets tractable: a k-itemset can only be frequent if every (k-1)
subset is, Agrawal & Srikant 1994).

Scale shape — baskets are co-located ONCE, then every level is a
shuffle-light counting pass:

  1. ONE basket-key exchange groups each basket's distinct items;
     the grouped blocks are materialized and reused by every level
     (baskets ship once, not once per level);
  2. L1: per-block item-count partials -> adaptive_final -> frequent
     items, broadcast via ray.put (bounded by the ITEM-TYPE count —
     Heaps-law, not corpus-size);
  3. L2: per-block pair counts emitted ONLY for L1xL1 pairs
     (candidate prune) -> adaptive_final -> frequent pairs broadcast;
  4. L3: per-block triple counts emitted ONLY when all three member
     pairs are in L2 (the A-Priori subset prune — this is what keeps
     the cubic per-basket explode bounded) -> adaptive_final ->
     output.

Per-basket item lists are assumed bounded (a retail basket, an
order's parts — tens, not millions); ``max_basket`` guards the cubic
local explode by dropping oversized baskets ONCE at the grouping
step, so every level mines the SAME basket sub-corpus and the
A-Priori support invariant (triple support <= member pair support)
holds unconditionally — a per-level skip would silently break it.
The default 1000 never binds on basket data. Items must be int64
(the partial schemas are typed). Supports are exact int64 counts;
items are ordered ascending inside every itemset, so the output is
deterministic and the SQL oracle is a literal self-join.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa


def frequent_triples(
    ds,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 1000,
    num_partitions: int | None = None,
):
    """Dataset[(p1, p2, p3, support)] of 3-itemsets with support >=
    ``min_support`` (p1 < p2 < p3). See module docstring for the plan."""
    import ray

    from docstrange_ray.shuffle import adaptive_final, arrow_out, grouped_blocks

    def distinct_local(batch: pa.Table) -> pd.DataFrame:
        return (
            batch.select([basket_col, item_col]).to_pandas().drop_duplicates()
        )

    def cap_baskets(df: pd.DataFrame) -> pd.DataFrame:
        # the guard applies ONCE, here: every level then sees the same
        # basket set, so pair and triple supports stay consistent (a
        # per-level skip could emit a triple whose member pair was
        # under-counted — the silent-exactness hole this avoids)
        df = df.drop_duplicates()
        sizes = df.groupby(basket_col)[item_col].transform("size")
        return df[sizes <= max_basket]

    baskets = grouped_blocks(
        ds.map_batches(arrow_out(distinct_local), batch_format="pyarrow"),
        [basket_col],
        cap_baskets,
        num_partitions,
        batch_format="pandas",
    ).materialize()

    # L1 — frequent items (bounded: item-type cardinality)
    item_counts = adaptive_final(
        baskets.map_batches(
            arrow_out(
                lambda df: df.groupby(item_col, as_index=False)
                .size()
                .rename(columns={"size": "cnt"})
            ),
            batch_format="pandas",
        ),
        lambda df: df.groupby(item_col, as_index=False)["cnt"].sum(),
        keys=[item_col],
        num_partitions=num_partitions,
    ).to_pandas()
    if "cnt" not in item_counts.columns:  # empty dataset loses its schema
        item_counts = pd.DataFrame({item_col: [], "cnt": []})
    l1 = set(item_counts.loc[item_counts["cnt"] >= min_support, item_col])
    l1_ref = ray.put(frozenset(l1))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        keep = ray.get(l1_ref)
        rows = []
        for _, sub in df.groupby(basket_col, sort=False):
            items = sorted(x for x in sub[item_col].unique() if x in keep)
            rows.extend(itertools.combinations(items, 2))
        if not rows:
            return pd.DataFrame({"p1": [], "p2": [], "cnt": []}).astype(
                {"p1": "int64", "p2": "int64", "cnt": "int64"}
            )
        out = pd.DataFrame(rows, columns=["p1", "p2"])
        return out.groupby(["p1", "p2"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    pair_counts = adaptive_final(
        baskets.map_batches(arrow_out(pair_partial), batch_format="pandas"),
        lambda df: df.groupby(["p1", "p2"], as_index=False)["cnt"].sum(),
        keys=["p1", "p2"],
        num_partitions=num_partitions,
    ).to_pandas()
    if "cnt" not in pair_counts.columns:  # empty dataset loses its schema
        pair_counts = pd.DataFrame({"p1": [], "p2": [], "cnt": []})
    l2 = set(
        map(
            tuple,
            pair_counts.loc[pair_counts["cnt"] >= min_support, ["p1", "p2"]]
            .to_numpy()
            .tolist(),
        )
    )
    l2_ref = ray.put(frozenset(l2))

    def triple_partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = ray.get(l2_ref)
        keep = {x for p in pairs for x in p}
        rows = []
        for _, sub in df.groupby(basket_col, sort=False):
            items = sorted(x for x in sub[item_col].unique() if x in keep)
            for a, b, c in itertools.combinations(items, 3):
                # A-Priori subset prune: all member pairs must be frequent
                if (a, b) in pairs and (a, c) in pairs and (b, c) in pairs:
                    rows.append((a, b, c))
        if not rows:
            return pd.DataFrame(
                {"p1": [], "p2": [], "p3": [], "cnt": []}
            ).astype({"p1": "int64", "p2": "int64", "p3": "int64", "cnt": "int64"})
        out = pd.DataFrame(rows, columns=["p1", "p2", "p3"])
        return out.groupby(["p1", "p2", "p3"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    triple_counts = adaptive_final(
        baskets.map_batches(arrow_out(triple_partial), batch_format="pandas"),
        lambda df: df.groupby(["p1", "p2", "p3"], as_index=False)["cnt"].sum(),
        keys=["p1", "p2", "p3"],
        num_partitions=num_partitions,
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["cnt"] >= min_support].rename(columns={"cnt": "support"})
        return pa.Table.from_pandas(df, preserve_index=False)

    return triple_counts.map_batches(finish, batch_format="pyarrow")


def association_rules(
    ds,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 1000,
    num_partitions: int | None = None,
):
    """Association rules over frequent pairs (Agrawal & Srikant 1994):
    for every frequent pair {a, b} emit both directed rules with the
    classic exact-count statistics —

        confidence(a -> b) = n_ab / n_a
        lift(a -> b)       = (n_ab * N) / (n_a * n_b)

    where N = basket count (post-``max_basket`` guard), n_x = baskets
    containing x, n_ab = baskets containing both. Counts are exact
    int64; confidence/lift are ONE double division of exact integers
    (round6), mirrored term-for-term in the SQL oracle, so the output
    is bit-deterministic. Returns Dataset[(ante, cons, n_ab, n_a, n_b,
    confidence, lift)].

    Plan: the same level-wise shape as :func:`frequent_triples` (ONE
    basket exchange, L1 broadcast prune, pre-reduced pair partials);
    the rule emit is a bounded final over the frequent-pair table
    (itemset-type scale, not corpus scale)."""
    import ray

    from docstrange_ray.numerics import round6
    from docstrange_ray.shuffle import adaptive_final, arrow_out, grouped_blocks

    def distinct_local(batch: pa.Table) -> pd.DataFrame:
        return (
            batch.select([basket_col, item_col]).to_pandas().drop_duplicates()
        )

    def cap_baskets(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        sizes = df.groupby(basket_col)[item_col].transform("size")
        return df[sizes <= max_basket]

    baskets = grouped_blocks(
        ds.map_batches(arrow_out(distinct_local), batch_format="pyarrow"),
        [basket_col],
        cap_baskets,
        num_partitions,
        batch_format="pandas",
    ).materialize()

    # N: distinct baskets (groups are basket-complete per block, so a
    # per-block nunique sums exactly)
    n_baskets = int(
        baskets.map_batches(
            lambda b: pa.table(
                {
                    "n": pa.array(
                        [b.to_pandas()[basket_col].nunique()], pa.int64()
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("n")
        or 0
    )

    item_counts = adaptive_final(
        baskets.map_batches(
            arrow_out(
                lambda df: df.groupby(item_col, as_index=False)
                .size()
                .rename(columns={"size": "cnt"})
            ),
            batch_format="pandas",
        ),
        lambda df: df.groupby(item_col, as_index=False)["cnt"].sum(),
        keys=[item_col],
        num_partitions=num_partitions,
    ).to_pandas()
    if "cnt" not in item_counts.columns:
        item_counts = pd.DataFrame({item_col: [], "cnt": []})
    n_item = dict(
        zip(
            item_counts[item_col].astype("int64"),
            item_counts["cnt"].astype("int64"),
        )
    )
    l1 = {x for x, c in n_item.items() if c >= min_support}
    l1_ref = ray.put(frozenset(l1))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        keep = ray.get(l1_ref)
        rows = []
        for _, sub in df.groupby(basket_col, sort=False):
            items = sorted(x for x in sub[item_col].unique() if x in keep)
            rows.extend(itertools.combinations(items, 2))
        if not rows:
            return pd.DataFrame({"p1": [], "p2": [], "cnt": []}).astype(
                {"p1": "int64", "p2": "int64", "cnt": "int64"}
            )
        out = pd.DataFrame(rows, columns=["p1", "p2"])
        return out.groupby(["p1", "p2"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    pair_counts = adaptive_final(
        baskets.map_batches(arrow_out(pair_partial), batch_format="pandas"),
        lambda df: df.groupby(["p1", "p2"], as_index=False)["cnt"].sum(),
        keys=["p1", "p2"],
        num_partitions=num_partitions,
    )

    def rules(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["cnt"] >= min_support]
        if df.empty:
            return pd.DataFrame(
                {
                    "ante": pd.Series([], dtype=np.int64),
                    "cons": pd.Series([], dtype=np.int64),
                    "n_ab": pd.Series([], dtype=np.int64),
                    "n_a": pd.Series([], dtype=np.int64),
                    "n_b": pd.Series([], dtype=np.int64),
                    "confidence": pd.Series([], dtype=np.float64),
                    "lift": pd.Series([], dtype=np.float64),
                }
            )
        rows = []
        for p1, p2, nab in df[["p1", "p2", "cnt"]].itertuples(index=False):
            for a, b in ((int(p1), int(p2)), (int(p2), int(p1))):
                na, nb = n_item[a], n_item[b]
                rows.append(
                    (
                        a,
                        b,
                        int(nab),
                        na,
                        nb,
                        float(round6(int(nab) / na)),
                        float(round6(int(nab) * n_baskets / (na * nb))),
                    )
                )
        out = pd.DataFrame(
            rows,
            columns=[
                "ante", "cons", "n_ab", "n_a", "n_b", "confidence", "lift",
            ],
        )
        return out.astype(
            {
                "ante": np.int64, "cons": np.int64, "n_ab": np.int64,
                "n_a": np.int64, "n_b": np.int64,
                "confidence": np.float64, "lift": np.float64,
            }
        )

    return pair_counts.map_batches(arrow_out(rules), batch_format="pyarrow")
