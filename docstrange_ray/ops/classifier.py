"""Distributed L2-regularized logistic regression over document quality
signals (the trained-filter stage of a curation pipeline: fastText-style
"reference vs crawl" classifiers, CCNet's quality LM cousins — here a
linear model over the engine's exact integer quality signals, trained
with iteratively reweighted least squares).

Scale shape (the Spark-MLlib / Newton-on-partials pattern)
----------------------------------------------------------
The model is d-dimensional with tiny d (5 features), so every pass is a
pure scan with BOUNDED partials:

1. ONE moments pass: per-batch (n, sum x, sum x², sum y) — a single
   row per block — coalesced to the driver for standardization stats.
2. Per IRLS iteration: broadcast (w, mu, sigma) once (``ray.put``,
   d floats); each block emits ONE row holding the flattened d×d
   Gram/Hessian partial ZᵀWZ, the gradient partial Zᵀ(y−p), and the
   log-likelihood partial; the driver sums ≤ n_blocks rows and solves a
   d×d system. Per-iteration exchange volume: n_blocks × (d²+d+2)
   floats — independent of corpus size. Iterations are bounded
   (quadratic convergence; default 25 with an early tol stop).
3. Scoring broadcasts the d raw-space coefficients once — shuffle-free.

Determinism: block partial-sum ORDER is nondeterministic, so converged
coefficients carry last-ulp float noise across runs; tests pin against
an independent driver-side IRLS at rtol 1e-6 (the ridge keeps the
optimum unique and well-conditioned). The gradient at w = 0 however is
EXACT — p is exactly 1/2, so 2·∇LL(0) = Σ x·(2y−1) is an int64 sum in
any order — which is what the ``logreg_grad0`` SQL oracle checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import round_half_away
from docstrange_ray.ops.textstats import _LANG_MARKERS, quality_stats
from docstrange_ray.shuffle import arrow_out, coalesced_blocks

FEATURES = [
    "bias", "n_words", "sum_word_len", "n_punct", "n_stopwords", "n_en_markers",
]
_D = len(FEATURES)


def _feature_matrix(batch: pa.Table) -> np.ndarray:
    """n x d int64 design matrix from the exact quality signals
    (column 0 is the all-ones bias; the last column counts hits in the
    lang-ID English marker set — the signal that makes the lang target
    actually learnable)."""
    q = quality_stats(batch)
    n = q.num_rows
    X = np.empty((n, _D), dtype=np.int64)
    X[:, 0] = 1
    for j, col in enumerate(["n_words", "sum_word_len", "n_punct", "n_stopwords"]):
        X[:, j + 1] = np.asarray(q.column(col), dtype=np.int64)
    en = _LANG_MARKERS["en"]
    texts = batch.column("text").to_pylist()
    X[:, 5] = np.fromiter(
        (sum(1 for w in (t or "").lower().split() if w in en) for t in texts),
        np.int64,
        count=n,
    )
    return X


def _labels(batch: pa.Table, target_lang: str) -> np.ndarray:
    langs = batch.column("lang").to_pylist()
    return np.fromiter((1 if l == target_lang else 0 for l in langs),
                       np.int64, count=len(langs))


def grad_at_zero(ds, target_lang: str = "en"):
    """2x the log-likelihood gradient at w = 0: per feature,
    Σ x·(2y−1) — an EXACT int64 statistic (p(0) = 1/2 exactly), hence
    SQL-oracleable. One scan, one single-row partial per block."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        X = _feature_matrix(batch)
        s = 2 * _labels(batch, target_lang) - 1
        g = X.T @ s
        return pd.DataFrame({"feature": FEATURES, "grad2x": g.astype(np.int64)})

    partials = ds.map_batches(arrow_out(partial), batch_format="pyarrow",
                              batch_size=8192)
    return coalesced_blocks(
        partials,
        lambda df: df.groupby("feature", as_index=False, sort=True)["grad2x"].sum(),
    )


def _design_matrix_ds(ds, target_lang: str):
    """Materialized compact design matrix (columns x0..x{d-1}, y):
    feature extraction runs ONCE; every IRLS iteration then scans
    d+1 int64 columns instead of re-parsing text — at 100 TB the
    iteration working set is ~50 bytes/doc regardless of text size."""

    def extract(batch: pa.Table) -> pd.DataFrame:
        X = _feature_matrix(batch)
        out = {f"x{j}": X[:, j] for j in range(_D)}
        out["y"] = _labels(batch, target_lang)
        return pd.DataFrame(out)

    return ds.map_batches(
        arrow_out(extract), batch_format="pyarrow", batch_size=8192
    ).materialize()


def _xy(batch: pa.Table):
    n = batch.num_rows
    X = np.empty((n, _D), dtype=np.float64)
    for j in range(_D):
        X[:, j] = np.asarray(batch.column(f"x{j}"), dtype=np.float64)
    y = np.asarray(batch.column("y"), dtype=np.float64)
    return X, y


def _moments(feats):
    """(count, per-feature sums, per-feature sum-of-squares, label sum)
    in ONE scan of the design matrix; exact int64 partials."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        row = {"n": np.int64(batch.num_rows),
               "sy": np.asarray(batch.column("y"), np.int64).sum()}
        for j, f in enumerate(FEATURES):
            col = np.asarray(batch.column(f"x{j}"), np.int64)
            row[f"s_{f}"] = col.sum()
            row[f"ss_{f}"] = (col.astype(object) ** 2).sum()  # overflow-safe
        return pd.DataFrame([row])

    summed = coalesced_blocks(
        feats.map_batches(arrow_out(partial), batch_format="pyarrow",
                          batch_size=None),
        lambda df: pd.DataFrame([df.astype(object).sum(axis=0)]),
    ).take_all()
    return summed[0]


def train_logreg(
    ds,
    target_lang: str = "en",
    n_iters: int = 25,
    ridge: float = 1e-3,
    tol: float = 1e-10,
) -> pd.DataFrame:
    """Fit P(lang == target | quality signals) by distributed IRLS.

    Returns one row per feature: (feature, coef_raw, coef_std) where
    coef_raw lives in raw-signal space (bias row = the intercept) and
    coef_std in standardized space. ``ridge`` penalizes standardized
    non-bias coefficients (keeps the optimum unique on separable data).
    """
    feats = _design_matrix_ds(ds, target_lang)
    return _train_on_feats(feats, n_iters=n_iters, ridge=ridge, tol=tol)


def _train_on_feats(
    feats, n_iters: int = 25, ridge: float = 1e-3, tol: float = 1e-10
) -> pd.DataFrame:
    import ray

    m = _moments(feats)
    n = float(m["n"])
    if n == 0:
        return pd.DataFrame({"feature": FEATURES,
                             "coef_raw": np.zeros(_D),
                             "coef_std": np.zeros(_D)})
    mu = np.array([float(m[f"s_{f}"]) / n for f in FEATURES])
    var = np.array(
        [float(m[f"ss_{f}"]) / n - (float(m[f"s_{f}"]) / n) ** 2 for f in FEATURES]
    )
    sigma = np.sqrt(np.maximum(var, 0.0))
    mu[0], sigma[0] = 0.0, 1.0  # bias column stays 1
    sigma[sigma == 0.0] = 1.0  # constant features contribute nothing

    w = np.zeros(_D)
    pen = np.full(_D, ridge)
    pen[0] = 0.0  # never penalize the intercept

    for _ in range(n_iters):
        state = ray.put((w.copy(), mu.copy(), sigma.copy()))

        def partial(batch: pa.Table) -> pd.DataFrame:
            import ray as _ray

            w_, mu_, sg_ = _ray.get(state)
            X, y = _xy(batch)
            Z = (X - mu_) / sg_
            eta = Z @ w_
            p = 1.0 / (1.0 + np.exp(-np.clip(eta, -35, 35)))
            wt = np.maximum(p * (1.0 - p), 1e-10)
            H = Z.T @ (Z * wt[:, None])
            g = Z.T @ (y - p)
            ll = float(np.sum(y * np.log(np.maximum(p, 1e-300))
                              + (1 - y) * np.log(np.maximum(1 - p, 1e-300))))
            row = {"ll": ll}
            for j in range(_D):
                row[f"g{j}"] = g[j]
                for k in range(_D):
                    row[f"h{j}_{k}"] = H[j, k]
            return pd.DataFrame([row])

        agg = coalesced_blocks(
            feats.map_batches(arrow_out(partial), batch_format="pyarrow",
                              batch_size=None),
            lambda df: pd.DataFrame([df.sum(axis=0)]),
        ).take_all()[0]
        g = np.array([agg[f"g{j}"] for j in range(_D)]) - pen * w
        H = np.array([[agg[f"h{j}_{k}"] for k in range(_D)] for j in range(_D)])
        H += np.diag(pen)
        delta = np.linalg.solve(H, g)
        w = w + delta
        if np.max(np.abs(delta)) < tol:
            break

    coef_raw = w / sigma
    coef_raw[0] = w[0] - float(np.sum(w[1:] * mu[1:] / sigma[1:]))
    return pd.DataFrame({"feature": FEATURES, "coef_raw": coef_raw,
                         "coef_std": w})


def classify_docs(ds, coefs: pd.DataFrame, threshold: float = 0.5):
    """Score every document under raw-space coefficients (broadcast
    once): (doc_id, score, pred) — shuffle-free."""
    import ray

    order = {f: i for i, f in enumerate(FEATURES)}
    w = np.zeros(_D)
    for f, c in zip(coefs["feature"], coefs["coef_raw"]):
        w[order[str(f)]] = float(c)
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pd.DataFrame:
        import ray as _ray

        w_ = _ray.get(w_ref)
        X = _feature_matrix(batch).astype(np.float64)
        eta = X @ w_
        p = 1.0 / (1.0 + np.exp(-np.clip(eta, -35, 35)))
        return pd.DataFrame(
            {
                "doc_id": batch.column("doc_id").to_pylist(),
                "score": round_half_away(p, 6),
                "pred": (p >= threshold).astype(np.int8),
            }
        )

    return ds.map_batches(arrow_out(score), batch_format="pyarrow",
                          batch_size=8192)


def confusion(ds, target_lang: str = "en", **train_kw) -> pd.DataFrame:
    """Train + evaluate on the corpus: one row with confusion counts and
    accuracy (training-set evaluation — the demo is the distributed
    training/scoring shape, not a holdout protocol). Builds the design
    matrix ONCE and both trains and scores from it."""
    import ray

    feats = _design_matrix_ds(ds, target_lang)
    coefs = _train_on_feats(feats, **train_kw)
    order = {f: i for i, f in enumerate(FEATURES)}
    w = np.zeros(_D)
    for f, c in zip(coefs["feature"], coefs["coef_raw"]):
        w[order[str(f)]] = float(c)
    w_ref = ray.put(w)

    def partial(batch: pa.Table) -> pd.DataFrame:
        import ray as _ray

        w_ = _ray.get(w_ref)
        X, y = _xy(batch)
        p = 1.0 / (1.0 + np.exp(-np.clip(X @ w_, -35, 35)))
        pred = (p >= 0.5).astype(np.int64)
        return pd.DataFrame(
            [
                {
                    "tp": int(((pred == 1) & (y == 1)).sum()),
                    "fp": int(((pred == 1) & (y == 0)).sum()),
                    "fn": int(((pred == 0) & (y == 1)).sum()),
                    "tn": int(((pred == 0) & (y == 0)).sum()),
                }
            ]
        )

    agg = coalesced_blocks(
        feats.map_batches(arrow_out(partial), batch_format="pyarrow",
                          batch_size=None),
        lambda df: pd.DataFrame([df.sum(axis=0)]),
    ).take_all()[0]
    tp, fp, fn, tn = (int(agg[k]) for k in ("tp", "fp", "fn", "tn"))
    total = tp + fp + fn + tn
    acc = round_half_away(np.float64(tp + tn) / total, 6) if total else 0.0
    return pd.DataFrame(
        [{"tp": tp, "fp": fp, "fn": fn, "tn": tn,
          "accuracy": float(acc)}]
    )
