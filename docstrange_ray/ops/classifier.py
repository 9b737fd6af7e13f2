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
import pyarrow.compute as pc

from docstrange_ray.numerics import round6, round_half_away
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

# ---------------------------------------------------------------------------
# Multinomial Naive-Bayes text classifier — the fasttext-shaped stage.
#
# (Restored after commit 1ee3401 accidentally replaced this module: the
# IRLS logistic-regression rewrite clobbered the NB section while its
# tests and the `nb_classify` oracled query still referenced it.)
#
# CCNet-style curation pipelines run a trained linear text classifier
# over every document. No model weights ship in this sandbox, so the
# rebuild provides the same pipeline shape with a classifier that TRAINS
# INSIDE the engine: multinomial NB over whitespace words with add-one
# smoothing — training is ONE shuffle of per-batch partial-reduced
# (label, word, count) rows + a tiny prior aggregate; the
# vocabulary-scale model is broadcast once (the bounded Heaps-law
# assumption tfidf_topk documents); scoring is a shuffle-free
# factorize + np.add.reduceat per batch. Unseen-at-train words score the
# smoothing floor 1/(class_total+|V|), matching the SQL LEFT JOIN.
# ---------------------------------------------------------------------------

def _words_of(texts: pa.ChunkedArray | pa.Array):
    """Lowercased whitespace words per doc (list<string>), '' -> []."""
    trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(texts))
    return pc.split_pattern_regex(trimmed, pattern=r"\s+")


class NBModel:
    """vocab: sorted word array; counts: (C, V) word counts per class;
    class_totals: (C,); priors: (C,) doc counts; labels: sorted class
    names. log P(w|c) = ln((counts+1) / (class_total + V))."""

    def __init__(self, labels, vocab, counts, priors):
        self.labels = list(labels)
        self.vocab = pd.Index(vocab)
        self.counts = np.asarray(counts, dtype=np.float64)
        self.priors = np.asarray(priors, dtype=np.float64)
        v = len(self.vocab)
        tot = self.counts.sum(axis=1, keepdims=True)
        # column V = the smoothing floor for out-of-vocab words
        smoothed = np.concatenate(
            [self.counts + 1.0, np.ones((len(self.labels), 1))], axis=1
        )
        self.logp = np.log(smoothed / (tot + v))
        self.logprior = np.log(self.priors / self.priors.sum())


def nb_train(ds, label_col: str = "lang", text_col: str = "text") -> NBModel:
    """One (label, word) count shuffle + one tiny prior aggregate."""
    from docstrange_ray.shuffle import adaptive_final

    def partial(batch: pa.Table) -> pd.DataFrame:
        words = _words_of(batch.column(text_col))
        labels = batch.column(label_col).to_pylist()
        reps = pc.list_value_length(words).fill_null(0).to_numpy(zero_copy_only=False)
        flat = words.combine_chunks().flatten().to_pandas()
        flat_labels = np.repeat(np.asarray(labels, dtype=object), reps)
        df = pd.DataFrame({"label": flat_labels, "w": flat})
        df = df[df["w"] != ""]
        out = df.groupby(["label", "w"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "c"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["label", "w"], as_index=False, sort=False)["c"].sum()

    partials = ds.map_batches(partial, batch_format="pyarrow")
    counts = adaptive_final(partials, combine, keys=["label", "w"]).to_pandas()

    prior_partials = ds.map_batches(
        lambda b: pd.DataFrame(
            {"label": b.column(label_col).to_pylist()}
        ).groupby("label", as_index=False).size().rename(columns={"size": "n"}),
        batch_format="pyarrow",
    )
    priors_df = adaptive_final(
        prior_partials,
        lambda df: df.groupby("label", as_index=False)["n"].sum(),
        keys=["label"],
    ).to_pandas()

    labels = sorted(priors_df["label"])
    vocab = np.sort(counts["w"].unique())
    vidx = pd.Index(vocab)
    cmat = np.zeros((len(labels), len(vocab)), dtype=np.int64)
    lpos = {l: i for i, l in enumerate(labels)}
    cmat[
        [lpos[l] for l in counts["label"]], vidx.get_indexer(counts["w"])
    ] = counts["c"].to_numpy()
    pri = np.zeros(len(labels), dtype=np.int64)
    pri[[lpos[l] for l in priors_df["label"]]] = priors_df["n"].to_numpy()
    return NBModel(labels, vocab, cmat, pri)


def nb_predict(ds, model: NBModel, text_col: str = "text", out_col: str = "nb_label"):
    """Shuffle-free scoring: (doc_id, nb_label, nb_score). Score =
    rounded(6) ln prior + sum of word log-probs; tie -> first label in
    sorted order (np.argmax first-max)."""
    import ray

    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        words = _words_of(batch.column(text_col))
        reps = pc.list_value_length(words).fill_null(0).to_numpy(zero_copy_only=False)
        flat = words.combine_chunks().flatten().to_pandas().to_numpy(dtype=object)
        keep = flat != ""
        flat = flat[keep]
        # per-word vocab slot; OOV -> the smoothing column V
        slots = m.vocab.get_indexer(flat)
        slots = np.where(slots < 0, len(m.vocab), slots)
        # word-count per doc after dropping empties
        doc_of = np.repeat(np.arange(len(reps)), reps)[keep]
        n = len(reps)
        scores = np.tile(m.logprior, (n, 1))  # (docs, classes)
        if len(flat):
            order = np.argsort(doc_of, kind="stable")
            doc_sorted = doc_of[order]
            slot_sorted = slots[order]
            starts = np.searchsorted(doc_sorted, np.arange(n))
            empty = np.diff(np.append(starts, len(flat))) == 0
            # reduceat rejects index == len and repeats the previous sum
            # for empty segments: clip, then zero the empty docs
            starts_c = np.minimum(starts, len(flat) - 1)
            for ci in range(len(m.labels)):
                sums = np.add.reduceat(m.logp[ci][slot_sorted], starts_c)
                sums[empty] = 0.0
                scores[:, ci] += sums
        scores = round6(scores, 6)
        best = np.argmax(scores, axis=1)
        out_labels = np.asarray(m.labels, dtype=object)[best]
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(out_labels, type=pa.string()),
                pa.array(scores[np.arange(n), best], type=pa.float64()),
            ],
            names=["doc_id", out_col, "nb_score"],
        )

    return ds.map_batches(score, batch_format="pyarrow")


def nb_classify(ds, label_col: str = "lang", text_col: str = "text"):
    """Train-and-score over the same corpus (the oracled query shape)."""
    model = nb_train(ds, label_col=label_col, text_col=text_col)
    return nb_predict(ds, model, text_col=text_col)


def isotonic_calibrate(
    ds,
    score_col: str,
    label_col: str,
    score_to_int=None,
    num_partitions: int | None = None,
):
    """Isotonic-regression probability calibration (pool-adjacent-
    violators; Barlow et al. 1972, the sklearn ``IsotonicRegression``
    shape): learn the monotone non-decreasing step function mapping a
    classifier score to an empirical positive rate — the standard
    post-hoc calibration for ops/classifier.py's logistic scores.

    Distributed shape: ONE pre-reduced histogram exchange — per-block
    (score_bin, n, pos) partials, so a billion rows ship their distinct
    -bin histogram (``score_to_int`` quantizes continuous scores to
    int64 bins, default 4dp micro-units; the group_quantiles
    cardinality contract). PAV then runs on the driver over the bounded
    bin table in EXACT INTEGER RATIONALS: pool rates are compared by
    cross-multiplication (pos_i * n_j vs pos_j * n_i), so pooling
    decisions have no float boundary and the segment set is
    deterministic at any cluster size. O(bins) stack algorithm.

    SQL-oracled via the minimax closed form (``isotonic_calibration``):
    fitted[i] = max_{j<=i} min_{k>=i} avg(j..k) computed in DOUBLE is
    EXACT here — distinct rational rates with denominators <= N differ
    by >= 1/N^2, far above double eps, so double min/max pick the true
    rational extremes and the level sets (= the PAV pools) group
    exactly. Also pinned by an independent exact-Fraction minimax
    reference in tests (two structurally unrelated derivations).

    Returns a pandas DataFrame of calibration segments
    [(bin_lo, bin_hi, n, pos, rate_micro)] with ``rate_micro`` =
    ``(1e6 * pos) // n`` (exact int) non-decreasing in score.
    """
    from docstrange_ray.numerics import to_int_units
    from docstrange_ray.shuffle import adaptive_final, arrow_out

    if score_to_int is None:
        score_to_int = to_int_units(10_000)  # half-away on .5 ties

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([score_col, label_col]).to_pandas().dropna()
        out = pd.DataFrame(
            {
                "bin": score_to_int(df[score_col].to_numpy()),
                "pos": df[label_col].to_numpy().astype(np.int64),
            }
        )
        g = out.groupby("bin", as_index=False).agg(
            n=("pos", "size"), pos=("pos", "sum")
        )
        return g

    hist = (
        adaptive_final(
            ds.map_batches(arrow_out(local), batch_format="pyarrow"),
            lambda df: df.groupby("bin", as_index=False)[["n", "pos"]].sum(),
            keys=["bin"],
            num_partitions=num_partitions,
        )
        .to_pandas()
    )
    if hist.empty:
        return pd.DataFrame(columns=["bin_lo", "bin_hi", "n", "pos", "rate_micro"])
    hist = hist.sort_values("bin").reset_index(drop=True)

    # PAV: stack of pools (lo, hi, n, pos); merge while the new pool's
    # rate is NOT above the previous pool's (<=, so equal-rate pools
    # merge — one canonical segment set). Cross-multiplied comparisons:
    # pos_new * n_prev <= pos_prev * n_new  <=>  rate_new <= rate_prev.
    pools: list[list[int]] = []
    for b, n, p in zip(hist["bin"], hist["n"], hist["pos"]):
        cur = [int(b), int(b), int(n), int(p)]
        while pools and cur[3] * pools[-1][2] <= pools[-1][3] * cur[2]:
            prev = pools.pop()
            cur = [prev[0], cur[1], prev[2] + cur[2], prev[3] + cur[3]]
        pools.append(cur)
    return pd.DataFrame(
        {
            "bin_lo": pd.Series([p[0] for p in pools], dtype="int64"),
            "bin_hi": pd.Series([p[1] for p in pools], dtype="int64"),
            "n": pd.Series([p[2] for p in pools], dtype="int64"),
            "pos": pd.Series([p[3] for p in pools], dtype="int64"),
            "rate_micro": pd.Series(
                [(1_000_000 * p[3]) // p[2] for p in pools], dtype="int64"
            ),
        }
    )
