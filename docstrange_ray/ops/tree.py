"""Distributed histogram-based decision-tree training (the Spark
MLlib / XGBoost-histogram shape: Panda et al. 2009 "PLANET", Chen &
Guestrin 2016 §3.3 "approximate/histogram split finding").

Contract: features are INTEGER-BINNED, bounded-cardinality columns
(the ``group_quantiles`` cardinality contract — continuous columns
must be binned first, e.g. ``n_chars // 128``) and the label is
binary 0/1.  Training never moves rows: each level does ONE
pre-reduced histogram exchange keyed (node, feature, bin) whose size
is bounded by ``frontier x features x bins`` regardless of corpus
size; the driver picks every frontier node's best split from the
bounded histogram and broadcasts the grown tree back into the next
level's assignment scan.  This is exactly how PLANET/LightGBM scale
tree induction to billions of rows — the rows stay put, the
histograms travel.

Split criterion: weighted Gini impurity, compared in EXACT integer
arithmetic.  For a candidate split with left counts (l0, l1) and
right counts (r0, r1) the quantity minimized is

    l0*l1/(l0+l1) + r0*r1/(r0+r1)        (= n/2 * weighted Gini)

which is quantized to ``score_micro = (10**6 * (l0*l1*nr + r0*r1*nl))
// (nl*nr)`` with Python-bignum / HUGEINT floor division BEFORE the
argmin (quantize-before-compare — the stats_tests discipline), so the
chosen tree is bit-equal to a SQL rebuild by construction.  Ties break
on (feature ASC, bin ASC).

A node becomes a leaf when it is pure, when no candidate split exists
(every row identical on every feature), when it is smaller than
``min_leaf``, or at ``max_depth``.  Node ids are heap-ordered (root 1,
children 2n / 2n+1); ``pred`` is the majority label (ties -> 0).

The reference has no ML-training module; this op serves the
quality-classifier / curation-rule induction step of a 100-TB
pipeline (e.g. "learn a cheap surrogate of the expensive LM quality
score from binned metadata features").
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

SCORE_SCALE = 1_000_000

_NODE_SCHEMA = [
    ("node", "int64"),
    ("depth", "int64"),
    ("kind", "object"),
    ("feature", "object"),
    ("bin", "int64"),
    ("n0", "int64"),
    ("n1", "int64"),
    ("score_micro", "int64"),
    ("pred", "int64"),
]


def node_histograms(ds, features: list[str], label: str, splits, frontier):
    """Dataset[(node, feature, bin, n0, n1)] for rows that land in a
    ``frontier`` node — the per-level bounded exchange.  ``splits`` is
    the grown tree so far ({node: (feature, bin)}), shipped by value in
    the closure (tiny: one tuple per internal node)."""
    from docstrange_ray.shuffle import adaptive_final, arrow_out

    splits = dict(splits)
    frontier = frozenset(frontier)

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(list(features) + [label]).to_pandas()
        # Vectorized node assignment: walk the (short) split path for
        # every row at once, one tree level per iteration.
        node = pd.Series(1, index=df.index)
        while True:
            todo = node.isin(tuple(splits))
            if not todo.any():
                break
            sub = node[todo]
            for nid in sub.unique():
                feat, b = splits[nid]
                rows = sub.index[sub == nid]
                left = df.loc[rows, feat] <= b
                node.loc[rows] = nid * 2 + (~left).astype(int)
        df = df[node.isin(tuple(frontier))]
        node = node[df.index]
        parts = []
        for feat in features:
            g = pd.DataFrame(
                {"node": node, "bin": df[feat], "y": df[label]}
            ).groupby(["node", "bin"], as_index=False)["y"].agg(["count", "sum"])
            g["feature"] = feat
            g["n0"] = g["count"] - g["sum"]
            parts.append(
                g.rename(columns={"sum": "n1"})[
                    ["node", "feature", "bin", "n0", "n1"]
                ]
            )
        return pd.concat(parts, ignore_index=True)

    return adaptive_final(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        lambda df: df.groupby(["node", "feature", "bin"], as_index=False)[
            ["n0", "n1"]
        ].sum(),
        keys=["node", "feature", "bin"],
    )


def _best_split(nh: pd.DataFrame, features: list[str]):
    """Exact-integer argmin split for one node's histogram.  Returns
    (score_micro, feature, bin, l0, l1) or None when no candidate
    separates the node.  All arithmetic is Python bignum (l0*l1*nr
    overflows int64 past ~2^31 rows/node)."""
    best = None
    for feat in features:
        fh = nh[nh["feature"] == feat].sort_values("bin")
        if len(fh) < 2:
            continue
        t0 = int(fh["n0"].sum())
        t1 = int(fh["n1"].sum())
        l0 = l1 = 0
        rows = list(zip(fh["bin"].tolist(), fh["n0"].tolist(), fh["n1"].tolist()))
        for b, c0, c1 in rows[:-1]:
            l0 += int(c0)
            l1 += int(c1)
            r0, r1 = t0 - l0, t1 - l1
            nl, nr = l0 + l1, r0 + r1
            score = (SCORE_SCALE * (l0 * l1 * nr + r0 * r1 * nl)) // (nl * nr)
            cand = (score, feat, int(b), l0, l1)
            if best is None or cand[:3] < best[:3]:
                best = cand
    return best


def train_histogram_tree(
    ds, features: list[str], label: str, max_depth: int = 2, min_leaf: int = 1
) -> pd.DataFrame:
    """Train a depth-``max_depth`` binary classification tree with one
    bounded histogram exchange per level; returns the heap-ordered node
    table (node, depth, kind, feature, bin, n0, n1, score_micro, pred).
    Split rows carry the chosen (feature, bin, score_micro); leaf rows
    carry feature='' / bin=-1 / score_micro=-1.  ``pred`` is always the
    node's majority label (ties -> 0)."""
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1 (the root's counts come "
                         "from its own level-0 histogram)")
    features = sorted(features)
    splits: dict[int, tuple[str, int]] = {}
    out_rows: list[dict] = []
    # (node, depth, n0, n1); counts of depth-d frontier nodes are known
    # from the parent's chosen split, so the root is the only node whose
    # counts come from its own histogram.
    frontier: dict[int, tuple[int, int | None, int | None]] = {1: (0, None, None)}
    for depth in range(max_depth + 1):
        live = {n for n, (d, _, _) in frontier.items() if d == depth}
        if not live:
            break
        force_leaf = depth == max_depth
        hist = None
        if not force_leaf:
            hist = node_histograms(ds, features, label, splits, live).to_pandas()
        nxt = {}
        for nid in sorted(live):
            _, n0, n1 = frontier[nid]
            nh = hist[hist["node"] == nid] if hist is not None else None
            if n0 is None:  # root: counts from its own histogram
                f0 = nh[nh["feature"] == features[0]]
                n0, n1 = int(f0["n0"].sum()), int(f0["n1"].sum())
            best = None
            if (
                not force_leaf
                and n0 > 0
                and n1 > 0
                and n0 + n1 >= 2 * min_leaf
            ):
                best = _best_split(nh, features)
            if best is None:
                out_rows.append(
                    dict(node=nid, depth=depth, kind="leaf", feature="",
                         bin=-1, n0=n0, n1=n1, score_micro=-1,
                         pred=int(n1 > n0))
                )
                continue
            score, feat, b, l0, l1 = best
            splits[nid] = (feat, b)
            out_rows.append(
                dict(node=nid, depth=depth, kind="split", feature=feat,
                     bin=b, n0=n0, n1=n1, score_micro=score,
                     pred=int(n1 > n0))
            )
            nxt[nid * 2] = (depth + 1, l0, l1)
            nxt[nid * 2 + 1] = (depth + 1, n0 - l0, n1 - l1)
        frontier = nxt
    out = pd.DataFrame(out_rows).sort_values("node").reset_index(drop=True)
    for col, dt in _NODE_SCHEMA:
        out[col] = out[col].astype(dt)
    return out[[c for c, _ in _NODE_SCHEMA]]


def predict_tree(ds, tree: pd.DataFrame, features: list[str], out_col: str = "pred"):
    """Broadcast-apply a trained node table to a dataset: one
    shuffle-free scan appends the reached leaf's majority label.  The
    tree is captured by value (bounded: 2^(depth+1) rows)."""
    splits = {
        int(r.node): (r.feature, int(r.bin))
        for r in tree.itertuples()
        if r.kind == "split"
    }
    preds = {int(r.node): int(r.pred) for r in tree.itertuples()}

    def scan(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        node = pd.Series(1, index=df.index)
        while True:
            todo = node.isin(tuple(splits))
            if not todo.any():
                break
            sub = node[todo]
            for nid in sub.unique():
                feat, b = splits[nid]
                rows = sub.index[sub == nid]
                left = df.loc[rows, feat] <= b
                node.loc[rows] = nid * 2 + (~left).astype(int)
        df[out_col] = node.map(preds).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    return ds.map_batches(scan, batch_format="pyarrow")
