"""Multinomial Naive-Bayes text classifier — the fasttext-shaped stage.

CCNet-style curation pipelines run a trained linear text classifier
over every document (fasttext langid, quality classifiers trained on
Wikipedia-vs-crawl). No model weights ship in this sandbox, so the
rebuild provides the same pipeline shape with a classifier that TRAINS
INSIDE the engine: multinomial NB over whitespace words with add-one
smoothing — closed-form, so training is pure counting:

* **train** — ONE shuffle of (label, word, partial_count) rows
  (partial-reduced per batch first, so hot words cost one row per
  batch, not one per occurrence) plus a tiny label-prior aggregate.
  The model (vocab array + per-class count matrix + priors) is
  vocabulary-scale, broadcast once via ``ray.put`` — the same bounded
  Heaps-law assumption ``tfidf_topk`` documents.
* **predict** — shuffle-free: per batch, factorize words against the
  broadcast vocab and sum log-probabilities per (doc, class) with
  ``np.add.reduceat``; argmax with rounded scores (6 dp) and
  lowest-label tie-break, reproducible across block orders and vs the
  DuckDB oracle (which rebuilds the same counts + smoothing in SQL).

Unseen-at-train words score the smoothing floor 1/(class_total+|V|) —
same as a count-0 vocab word, which is what the SQL LEFT JOIN yields.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from docstrange_ray.numerics import round6


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
