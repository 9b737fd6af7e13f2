"""Distributed logistic-regression tests.

`ref_irls` is an INDEPENDENT whole-matrix numpy IRLS implementing the
module's documented spec (population standardization, ridge on
standardized non-bias coefficients, clipped sigmoid, weight floor) —
no Ray, no partials — so agreement pins the estimator, not the code.
"""

import re

import numpy as np
import pandas as pd
import pytest
import ray

from docstrange_ray.ops import classifier

PUNCT = re.compile(r"[.!?,;:]")
STOP = ("the", "a", "of", "and", "to", "in", "is")
EN_MARKERS = {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"}


def ref_features(texts):
    rows = []
    for t in texts:
        t = t or ""
        ws = t.split()
        low = [w.lower() for w in ws]
        rows.append(
            [
                1,
                len(ws),
                sum(len(w) for w in ws),
                len(PUNCT.findall(t)),
                sum(1 for w in low if w in STOP),
                sum(1 for w in low if w in EN_MARKERS),
            ]
        )
    return np.asarray(rows, dtype=np.float64)


def ref_irls(X, y, n_iters=25, ridge=1e-3, tol=1e-10):
    n, d = X.shape
    mu = X.mean(axis=0)
    sigma = np.sqrt(np.maximum(X.var(axis=0), 0.0))
    mu[0], sigma[0] = 0.0, 1.0
    sigma[sigma == 0.0] = 1.0
    Z = (X - mu) / sigma
    pen = np.full(d, ridge)
    pen[0] = 0.0
    w = np.zeros(d)
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-np.clip(Z @ w, -35, 35)))
        wt = np.maximum(p * (1 - p), 1e-10)
        H = Z.T @ (Z * wt[:, None]) + np.diag(pen)
        g = Z.T @ (y - p) - pen * w
        delta = np.linalg.solve(H, g)
        w = w + delta
        if np.max(np.abs(delta)) < tol:
            break
    raw = w / sigma
    raw[0] = w[0] - float(np.sum(w[1:] * mu[1:] / sigma[1:]))
    return raw, w


def fixture_rows(n=240, seed=7):
    """Two overlapping populations (non-separable): 'en' docs are
    stopword-heavier and slightly longer on average; md5-free
    numpy-seeded determinism is fine here (test-local data)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        is_en = i % 2 == 0
        n_words = int(rng.integers(5, 40)) + (6 if is_en else 0)
        words = []
        for j in range(n_words):
            if rng.random() < (0.35 if is_en else 0.12):
                words.append(STOP[int(rng.integers(0, len(STOP)))])
            else:
                words.append("w" * int(rng.integers(2, 9)))
        text = " ".join(words) + ("." if rng.random() < 0.7 else "")
        rows.append(
            {"doc_id": i, "text": text, "lang": "en" if is_en else "de"}
        )
    return rows


@pytest.mark.usefixtures("ray_session")
class TestClassifier:
    def test_grad_at_zero_exact(self):
        rows = fixture_rows()
        ds = ray.data.from_items(rows)
        got = pd.DataFrame(classifier.grad_at_zero(ds).take_all())
        X = ref_features([r["text"] for r in rows]).astype(np.int64)
        s = np.asarray([1 if r["lang"] == "en" else -1 for r in rows])
        exp = X.T @ s
        by_feat = dict(zip(got["feature"], got["grad2x"]))
        for j, f in enumerate(classifier.FEATURES):
            assert by_feat[f] == exp[j], f

    def test_train_matches_independent_irls(self):
        rows = fixture_rows()
        ds = ray.data.from_items(rows)
        got = classifier.train_logreg(ds)
        X = ref_features([r["text"] for r in rows])
        y = np.asarray([1.0 if r["lang"] == "en" else 0.0 for r in rows])
        exp_raw, exp_std = ref_irls(X, y)
        np.testing.assert_allclose(
            got["coef_raw"].to_numpy(), exp_raw, rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(
            got["coef_std"].to_numpy(), exp_std, rtol=1e-6, atol=1e-9
        )

    def test_signal_direction_learned(self):
        # stopword count is the constructed signal: its coefficient
        # must be positive and the model must beat majority class.
        rows = fixture_rows()
        ds = ray.data.from_items(rows)
        coefs = classifier.train_logreg(ds)
        by = dict(zip(coefs["feature"], coefs["coef_std"]))
        # stopword/marker rate is the constructed signal; the two
        # features are collinear in this fixture so only their combined
        # direction is identified
        assert by["n_stopwords"] + by["n_en_markers"] > 0
        ev = classifier.confusion(ds)
        assert ev.loc[0, "accuracy"] > 0.5
        assert (
            ev.loc[0, ["tp", "fp", "fn", "tn"]].sum() == len(rows)
        )

    def test_classify_scores_match_coefs(self):
        rows = fixture_rows(n=60)
        ds = ray.data.from_items(rows)
        coefs = classifier.train_logreg(ds)
        scored = (
            pd.DataFrame(classifier.classify_docs(ds, coefs).take_all())
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        X = ref_features([r["text"] for r in rows])
        order = {f: i for i, f in enumerate(classifier.FEATURES)}
        w = np.zeros(len(order))
        for f, c in zip(coefs["feature"], coefs["coef_raw"]):
            w[order[f]] = c
        p = 1.0 / (1.0 + np.exp(-np.clip(X @ w, -35, 35)))
        np.testing.assert_allclose(
            scored["score"].to_numpy(), np.round(p, 6), atol=5e-7
        )
        assert (scored["pred"].to_numpy() == (p >= 0.5)).all()

    def test_empty_and_degenerate(self):
        # single-class corpus: IRLS must still return finite coefs
        rows = [{"doc_id": i, "text": "the a of", "lang": "en"} for i in range(8)]
        ds = ray.data.from_items(rows)
        coefs = classifier.train_logreg(ds)
        assert np.isfinite(coefs["coef_raw"]).all()
        ev = classifier.confusion(ds)
        assert ev.loc[0, "tp"] + ev.loc[0, "fn"] == 8


class TestIsotonicCalibrate:
    @staticmethod
    def _run(scores, labels, parts=4):
        import pyarrow as pa

        import ray

        from docstrange_ray.ops.classifier import isotonic_calibrate

        tbl = pa.table(
            {
                "score": pa.array([float(s) for s in scores], pa.float64()),
                "label": pa.array([int(l) for l in labels], pa.int64()),
            }
        )
        return isotonic_calibrate(
            ray.data.from_arrow(tbl).repartition(parts), "score", "label"
        )

    @staticmethod
    def _minimax_reference(scores, labels):
        """Independent minimax closed form: fit(i) = max_{j<=i}
        min_{k>=i} avg(pos[j..k]) over exact Fractions — structurally
        unrelated to the PAV stack."""
        from collections import defaultdict
        from fractions import Fraction

        agg = defaultdict(lambda: [0, 0])
        for s, l in zip(scores, labels):
            b = int(round(s * 10_000))
            agg[b][0] += 1
            agg[b][1] += int(l)
        bins = sorted(agg)
        n = [agg[b][0] for b in bins]
        p = [agg[b][1] for b in bins]
        m = len(bins)
        fits = []
        for i in range(m):
            best = None
            for j in range(i + 1):
                worst = None
                for k in range(i, m):
                    a = Fraction(sum(p[j : k + 1]), sum(n[j : k + 1]))
                    worst = a if worst is None else min(worst, a)
                best = worst if best is None else max(best, worst)
            fits.append((bins[i], best))
        return fits

    def test_fit_equals_minimax_reference(self, ray_session):
        import numpy as np
        from fractions import Fraction

        rng = np.random.default_rng(47)
        scores = rng.integers(0, 20, 500) / 20.0
        labels = (rng.random(500) < scores * 0.8 + 0.1).astype(int)
        seg = self._run(scores, labels)
        # expand segments to per-bin fits as exact rationals
        fit_by_bin = {}
        for _, r in seg.iterrows():
            for b in range(int(r["bin_lo"]), int(r["bin_hi"]) + 1):
                fit_by_bin[b] = Fraction(int(r["pos"]), int(r["n"]))
        for b, exp in self._minimax_reference(scores, labels):
            assert fit_by_bin[b] == exp, b

    def test_monotone_and_partition(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(48)
        scores = rng.random(800).round(3)
        labels = rng.integers(0, 2, 800)
        seg = self._run(scores, labels)
        rates = [
            (int(r["pos"]), int(r["n"])) for _, r in seg.iterrows()
        ]
        for (p1, n1), (p2, n2) in zip(rates, rates[1:]):
            assert p1 * n2 < p2 * n1  # strictly increasing pool rates
        assert int(seg["n"].sum()) == 800
        assert int(seg["pos"].sum()) == labels.sum()
        assert (seg["rate_micro"].diff().dropna() >= 0).all()

    def test_already_monotone_identity(self, ray_session):
        # pure 0s below 0.5, pure 1s above: two segments
        scores = [0.1] * 50 + [0.9] * 50
        labels = [0] * 50 + [1] * 50
        seg = self._run(scores, labels, parts=2)
        assert len(seg) == 2
        assert list(seg["rate_micro"]) == [0, 1_000_000]

    def test_reversed_labels_pool_to_one_segment(self, ray_session):
        scores = [0.1] * 50 + [0.9] * 50
        labels = [1] * 50 + [0] * 50
        seg = self._run(scores, labels, parts=3)
        assert len(seg) == 1
        assert int(seg["rate_micro"].iloc[0]) == 500_000
