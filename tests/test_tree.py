"""Histogram decision-tree tests: the distributed trainer is pinned
against an INDEPENDENT pure-Python reference that recursively
partitions the raw rows (structurally unrelated to the histogram
plan: rows vs histograms, recursion vs level loop), plus edge cases
(pure nodes, no-candidate nodes, min_leaf, exact-integer tie-breaks)
and the broadcast predictor's path semantics."""

import numpy as np
import pandas as pd
import pytest
import ray

from docstrange_ray.ops.tree import (
    SCORE_SCALE,
    predict_tree,
    train_histogram_tree,
)


# ---------------------------------------------------------------- reference
def _ref_tree(rows, features, max_depth, min_leaf=1):
    """Recursive row-partition reference (independent of the histogram
    implementation). rows = list of dicts with feature keys + 'y'."""
    out = []

    def best(rows):
        cands = []
        for feat in sorted(features):
            bins = sorted({r[feat] for r in rows})
            for b in bins[:-1]:
                left = [r for r in rows if r[feat] <= b]
                right = [r for r in rows if r[feat] > b]
                l1 = sum(r["y"] for r in left)
                r1 = sum(r["y"] for r in right)
                l0, r0 = len(left) - l1, len(right) - r1
                nl, nr = len(left), len(right)
                score = (SCORE_SCALE * (l0 * l1 * nr + r0 * r1 * nl)) // (nl * nr)
                cands.append((score, feat, b, left, right))
        if not cands:
            return None
        return min(cands, key=lambda c: c[:3])

    def rec(rows, node, depth):
        n1 = sum(r["y"] for r in rows)
        n0 = len(rows) - n1
        pred = int(n1 > n0)
        choice = None
        if depth < max_depth and n0 > 0 and n1 > 0 and len(rows) >= 2 * min_leaf:
            choice = best(rows)
        if choice is None:
            out.append(dict(node=node, depth=depth, kind="leaf", feature="",
                            bin=-1, n0=n0, n1=n1, score_micro=-1, pred=pred))
            return
        score, feat, b, left, right = choice
        out.append(dict(node=node, depth=depth, kind="split", feature=feat,
                        bin=int(b), n0=n0, n1=n1, score_micro=int(score),
                        pred=pred))
        rec(left, node * 2, depth + 1)
        rec(right, node * 2 + 1, depth + 1)

    rec(rows, 1, 0)
    return pd.DataFrame(out).sort_values("node").reset_index(drop=True)


def _mk_ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)


def _rand_rows(n, seed, n_feats=3, bins=5):
    rng = np.random.RandomState(seed)
    rows = []
    for _ in range(n):
        r = {f"f{j}": int(rng.randint(0, bins)) for j in range(n_feats)}
        # label depends on features + noise so splits are informative
        r["y"] = int((r["f0"] + 2 * r["f1"] + rng.randint(0, 3)) % 2)
        rows.append(r)
    return rows


@pytest.mark.parametrize("seed,depth", [(0, 1), (1, 2), (2, 3), (3, 2)])
def test_matches_recursive_reference(seed, depth):
    rows = _rand_rows(160, seed)
    feats = ["f0", "f1", "f2"]
    got = train_histogram_tree(_mk_ds(rows), feats, "y", max_depth=depth)
    want = _ref_tree(rows, feats, depth)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pure_node_is_leaf():
    rows = [{"f0": i % 3, "y": 1} for i in range(20)]
    got = train_histogram_tree(_mk_ds(rows), ["f0"], "y", max_depth=2)
    assert len(got) == 1 and got.iloc[0]["kind"] == "leaf"
    assert got.iloc[0]["pred"] == 1 and got.iloc[0]["n0"] == 0


def test_no_candidate_split_is_leaf():
    # every row identical on the only feature -> no separating bin
    rows = [{"f0": 7, "y": i % 2} for i in range(10)]
    got = train_histogram_tree(_mk_ds(rows), ["f0"], "y", max_depth=2)
    assert len(got) == 1 and got.iloc[0]["kind"] == "leaf"
    assert got.iloc[0]["pred"] == 0  # 5 vs 5 tie -> 0


def test_min_leaf_stops_split():
    rows = [{"f0": i, "y": i % 2} for i in range(4)]
    got = train_histogram_tree(_mk_ds(rows), ["f0"], "y",
                               max_depth=3, min_leaf=3)
    # root has 4 rows < 2*3 -> leaf immediately
    assert len(got) == 1 and got.iloc[0]["kind"] == "leaf"


def test_tie_breaks_on_feature_then_bin():
    # f0 and f1 are identical columns -> every split score ties; the
    # winner must be the lexicographically first (feature, bin).
    rows = [{"f0": i % 2, "f1": i % 2, "y": i % 2} for i in range(8)]
    got = train_histogram_tree(_mk_ds(rows), ["f1", "f0"], "y", max_depth=1)
    root = got[got["node"] == 1].iloc[0]
    assert root["feature"] == "f0" and root["bin"] == 0


def test_score_is_exact_integer_division():
    # hand-computed: left (2,1) right (1,2): score =
    # (1e6 * (2*1*3 + 1*2*3)) // (3*3) = 12e6 // 9 = 1333333
    rows = ([{"f0": 0, "y": 0}] * 2 + [{"f0": 0, "y": 1}]
            + [{"f0": 1, "y": 0}] + [{"f0": 1, "y": 1}] * 2)
    got = train_histogram_tree(_mk_ds(rows), ["f0"], "y", max_depth=1)
    root = got[got["node"] == 1].iloc[0]
    assert root["score_micro"] == (SCORE_SCALE * 12) // 9 == 1333333


def test_predict_tree_routes_rows():
    rows = _rand_rows(120, seed=5)
    feats = ["f0", "f1", "f2"]
    tree = train_histogram_tree(_mk_ds(rows), feats, "y", max_depth=2)
    scored = predict_tree(_mk_ds(rows), tree, feats).to_pandas()
    # reference prediction: walk the tree per row
    splits = {int(r.node): (r.feature, int(r.bin))
              for r in tree.itertuples() if r.kind == "split"}
    preds = {int(r.node): int(r.pred) for r in tree.itertuples()}
    for _, row in scored.iterrows():
        node = 1
        while node in splits:
            f, b = splits[node]
            node = node * 2 if row[f] <= b else node * 2 + 1
        assert row["pred"] == preds[node]


def test_max_depth_zero_rejected():
    with pytest.raises(ValueError):
        train_histogram_tree(_mk_ds(_rand_rows(10, 0)), ["f0"], "y",
                             max_depth=0)
