"""Text analysis: token counting, quality signals, language ID,
document fingerprinting.

All stages are vectorized ``map_batches`` over Arrow/pandas batches;
regex state is compiled at module import (once per worker process).
Counting outputs are exact integers so the DuckDB oracle comparison is
bit-stable (no float-sum ordering issues).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from docstrange_ray.numerics import round6

_WORD_OR_PUNCT = re.compile(r"\w+|[^\w\s]")
_PUNCT = re.compile(r"[.!?,;:]")
_WS_RUN = re.compile(r"\s+")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (the corpus langs are en/de/zh/fr/es).
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "que", "dans"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "para", "que", "con"},
}


def token_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace tokens and a
    BPE-ish regex token count (words + punctuation marks) — the engine's
    analogue of the reference's tiktoken/char-4 token counter
    (mcp_server_module/server.py:69-86 — A10/G2)."""
    col = batch.column("text")
    trimmed = pc.utf8_trim_whitespace(col)
    # Arrow split of "" yields [""] (length 1) where Python's split()
    # yields [] — mask whitespace-only texts to zero explicitly.
    n_ws = pc.if_else(
        pc.equal(trimmed, ""),
        pa.scalar(0, pa.int64()),
        pc.cast(pc.list_value_length(pc.utf8_split_whitespace(trimmed)), pa.int64()),
    )
    # RE2 kernel agrees with the Python regex on this pattern (verified
    # against the re-based round-2 implementation corpus-wide).
    n_bpe = pc.cast(
        pc.count_substring_regex(col, r"\w+|[^\w\s]"), pa.int64()
    )
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_ws, n_bpe],
        names=["doc_id", "n_ws_tokens", "n_bpe_tokens"],
    )


def quality_stats(batch: pa.Table) -> pa.Table:
    """Integer quality-signal counts per document: characters, words,
    summed word length, sentence punctuation, stopword hits. Downstream
    quality *scores* are ratios of these; keeping the table integral keeps
    the oracle hash comparison exact."""
    texts = batch.column("text").to_pylist()
    n_chars, n_words, sum_wlen, n_punct, n_stop = [], [], [], [], []
    stopset = set(STOPWORDS)
    for t in texts:
        t = t or ""
        words = t.split()
        n_chars.append(len(t))
        n_words.append(len(words))
        sum_wlen.append(sum(len(w) for w in words))
        n_punct.append(len(_PUNCT.findall(t)))
        n_stop.append(sum(1 for w in words if w.lower() in stopset))
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_chars, type=pa.int64()),
            pa.array(n_words, type=pa.int64()),
            pa.array(sum_wlen, type=pa.int64()),
            pa.array(n_punct, type=pa.int64()),
            pa.array(n_stop, type=pa.int64()),
        ],
        names=["doc_id", "n_chars_m", "n_words", "sum_word_len", "n_punct", "n_stopwords"],
    )


def quality_score(batch: pa.Table) -> pa.Table:
    """Composite [0,1] quality score from the integer signals — the
    filter-threshold stage of a training-data pipeline (not SQL-oracled;
    combine weights are ours)."""
    t = quality_stats(batch)
    n_words = np.asarray(t.column("n_words"), dtype=np.float64)
    n_chars = np.maximum(np.asarray(t.column("n_chars_m"), dtype=np.float64), 1)
    sum_wlen = np.asarray(t.column("sum_word_len"), dtype=np.float64)
    n_stop = np.asarray(t.column("n_stopwords"), dtype=np.float64)
    avg_wlen = sum_wlen / np.maximum(n_words, 1)
    len_score = np.clip(n_words / 100.0, 0, 1)
    wlen_score = np.exp(-0.5 * np.square((avg_wlen - 5.0) / 3.0))
    stop_score = np.clip(n_stop / np.maximum(n_words, 1) * 5.0, 0, 1)
    score = 0.4 * len_score + 0.3 * wlen_score + 0.3 * stop_score
    return t.append_column("quality", pa.array(round6(score, 6)))


class LangId:
    """Stopword-profile language identifier (actor-pool stage: the marker
    sets and regex are built once per actor). Heuristic stand-in for a
    fastText-style model; CJK is detected by codepoint range."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self.word = re.compile(r"[a-zA-Zäöüéèêàçñ]+")
        self.cjk = re.compile(r"[一-鿿]")

    def predict(self, text: str) -> str:
        if not text:
            return "und"
        if self.cjk.search(text):
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "und"
        best, best_hits = "und", 0
        for lang, marks in sorted(self.markers.items()):
            hits = sum(1 for w in words if w in marks)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(preds, type=pa.string())],
            names=["doc_id", "pred_lang"],
        )


def content_fingerprint(batch: pa.Table) -> pa.Table:
    """Canonical content fingerprint: md5 of lowercased,
    whitespace-collapsed text — the exact-dedup key (the reference's only
    dedup mechanism is an md5-of-bytes cache, mcp_server_module/server.py:87-89).
    SQL-equivalent: md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))."""
    texts = batch.column("text").to_pylist()
    fps = [
        hashlib.md5(_WS_RUN.sub(" ", (t or "").strip()).lower().encode("utf-8")).hexdigest()
        for t in texts
    ]
    return batch.append_column("content_md5", pa.array(fps, type=pa.string()))


# Gopher-style repetition/quality rule bounds (public heuristics from
# the Gopher paper's appendix, adapted to this corpus's stopword set).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def gopher_quality_filter(batch: pa.Table) -> pa.Table:
    """Gopher-style document quality rules as one vectorized stage:
    word-count bounds, mean-word-length bounds, fraction of words with
    an alphabetic character, and a distinct-stopword floor. Emits the
    rule inputs as columns plus the combined ``pass`` flag so the
    downstream filter (and the SQL oracle) reproduce the decision
    exactly; integer/rounded outputs keep the oracle hash stable."""
    stopset = set(STOPWORDS)
    doc_ids = batch.column("doc_id")
    n_words, mean_wlen, alpha_frac, n_stop, passed = [], [], [], [], []
    for t in batch.column("text").to_pylist():
        words = (t or "").split()
        nw = len(words)
        swl = sum(len(w) for w in words)
        n_alpha = sum(1 for w in words if any(c.isalpha() for c in w))
        stops = len({w.lower() for w in words} & stopset)
        mwl = (swl / nw) if nw else 0.0
        af = (n_alpha / nw) if nw else 0.0
        ok = (
            GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS
            and GOPHER_MIN_MEAN_WLEN <= mwl <= GOPHER_MAX_MEAN_WLEN
            and af >= GOPHER_MIN_ALPHA_FRAC
            and stops >= GOPHER_MIN_DISTINCT_STOPWORDS
        )
        n_words.append(nw)
        mean_wlen.append(float(round6(mwl)))
        alpha_frac.append(float(round6(af)))
        n_stop.append(stops)
        passed.append(ok)
    return pa.Table.from_arrays(
        [
            doc_ids,
            pa.array(n_words, type=pa.int64()),
            pa.array(mean_wlen, type=pa.float64()),
            pa.array(alpha_frac, type=pa.float64()),
            pa.array(n_stop, type=pa.int64()),
            pa.array(passed, type=pa.bool_()),
        ],
        names=["doc_id", "n_words", "mean_word_len", "alpha_frac", "n_distinct_stopwords", "pass"],
    )


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Gopher-style intra-document repetition signals (the paper's
    second rule family, alongside :func:`gopher_quality_filter`):

    * ``dup_word_frac`` — ``1 - n_distinct_words / n_words``;
    * ``top2_frac`` — word positions covered by the most frequent
      2-gram (``max_count * 2 / n_words``);
    * ``dup5_frac`` — fraction of 5-gram positions whose gram occurs
      more than once in the doc.

    Word-position-based rather than the paper's character-based
    fractions so every output is an exact integer ratio (bit-stable for
    the DuckDB oracle); the thresholding behavior is equivalent.
    Per-document state only — shuffle-free, batch-parallel. Zero-length
    edge cases emit 0.0."""
    from collections import Counter

    doc_ids = batch.column("doc_id")
    n_words, n_distinct, dupw, top2, dup5 = [], [], [], [], []
    for t in batch.column("text").to_pylist():
        ws = (t or "").lower().split()
        nw = len(ws)
        nd = len(set(ws))
        g2 = Counter(zip(ws, ws[1:]))
        g5 = Counter(zip(ws, ws[1:], ws[2:], ws[3:], ws[4:]))
        n5 = max(0, nw - 4)
        n_words.append(nw)
        n_distinct.append(nd)
        dupw.append(float(round6(1.0 - nd / nw)) if nw else 0.0)
        top2.append(float(round6(max(g2.values()) * 2.0 / nw)) if g2 else 0.0)
        dup5.append(
            float(round6(sum(c for c in g5.values() if c >= 2) / n5)) if n5 else 0.0
        )
    return pa.Table.from_arrays(
        [
            doc_ids,
            pa.array(n_words, type=pa.int64()),
            pa.array(n_distinct, type=pa.int64()),
            pa.array(dupw, type=pa.float64()),
            pa.array(top2, type=pa.float64()),
            pa.array(dup5, type=pa.float64()),
        ],
        names=[
            "doc_id",
            "n_words",
            "n_distinct_words",
            "dup_word_frac",
            "top2_frac",
            "dup5_frac",
        ],
    )


class LangConfusionPartial(LangId):
    """Actor-pool partial for :func:`lang_confusion`: predicts with the
    inherited stopword profiles (built once per actor) and reduces the
    batch to (declared, predicted) pair counts."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        preds = [self.predict(t) for t in batch.column("text").to_pylist()]
        g = (
            pd.DataFrame(
                {"declared": batch.column("lang").to_pylist(), "predicted": preds}
            )
            .groupby(["declared", "predicted"], as_index=False)
            .size()
            .rename(columns={"size": "n_docs"})
        )
        g["n_docs"] = g["n_docs"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)


def lang_confusion(ds):
    """Language-ID confusion matrix: declared corpus language vs the
    stopword-profile prediction — the calibration readout any
    classifier-driven curation stage needs before its output is
    trusted as a filter.

    Scale shape: shuffle-free — the declared label rides the same row
    as the text, so each actor-pool batch reduces to (declared,
    predicted) pair counts and the bounded (langs x langs) partials
    coalesce. Returns Dataset[(declared, predicted, n_docs)].
    """
    from docstrange_ray.shuffle import coalesced_blocks

    partials = ds.map_batches(
        LangConfusionPartial, batch_format="pyarrow", concurrency=(1, 4)
    )
    return coalesced_blocks(
        partials,
        lambda df: df.groupby(["declared", "predicted"], as_index=False)[
            "n_docs"
        ].sum(),
    )


def word_counts(texts) -> pd.Series:
    """Lowercase-whitespace word histogram for a batch of texts — THE
    tokenization contract shared by every count-based op (vocab_encode,
    pmi_collocations, sketch.heavy_tokens) and their SQL oracles
    (``regexp_split_to_array(lower(text), '\\s+')`` with empties
    removed). One definition so a tokenization tweak cannot silently
    diverge the ops from each other or from the oracles. The total
    token count of the batch is exactly ``int(result.sum())``."""
    words: list[str] = []
    for t in texts:
        words.extend((t or "").lower().split())
    return pd.Series(words, dtype=object).value_counts()


def vocab_encode(ds, vocab_size: int = 20, num_partitions: int | None = None):
    """Tokenizer-style vocabulary build + token-id encode — the
    training-prep step between raw text and ``packing.pack_offsets``.

    Pass 1 (vocab): distributed word counts (per-batch partial, one
    row per DISTINCT word per batch -> ONE word shuffle), then the
    global top-``vocab_size`` via block-local candidates + a coalesced
    final (the exact ``top_ngrams`` shape); ids are the dense rank by
    (count DESC, word ASC), 1-based, with 0 reserved for OOV.

    Pass 2 (encode): the bounded vocab dict broadcasts once via
    ``ray.put``; every batch encodes shuffle-free. Output is the
    EXPLODED token stream ``(doc_id, pos, token_id)`` — flat int64
    columns rather than list rows, so the driver's value-hash compare
    (and any downstream Arrow consumer) sees a stable layout.
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        vc = word_counts(batch.column("text").to_pylist())
        return pd.DataFrame({"w": vc.index, "c": vc.to_numpy(dtype=np.int64)})

    counts = grouped_blocks(
        ds.map_batches(arrow_out(count_partial), batch_format="pyarrow", batch_size=65536),
        ["w"],
        lambda df: df.groupby("w", as_index=False)["c"].sum(),
        num_partitions,
        batch_format="pandas",
    )

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["c", "w"], ascending=[False, True]).head(vocab_size)

    vocab_rows = coalesced_blocks(
        counts.map_batches(arrow_out(local_top), batch_format="pandas"), local_top
    ).take_all()
    vocab_rows.sort(key=lambda r: (-r["c"], r["w"]))
    vocab = {r["w"]: i + 1 for i, r in enumerate(vocab_rows)}
    vocab_ref = ray.put(vocab)

    def encode(batch: pa.Table) -> pd.DataFrame:
        # vectorized: factorize the token stream once, map only the
        # batch's DISTINCT words through the vocab dict, then one take
        v = ray.get(vocab_ref)
        word_lists = [
            (t or "").lower().split() for t in batch.column("text").to_pylist()
        ]
        lens = np.array([len(ws) for ws in word_lists], dtype=np.int64)
        flat = np.asarray([w for ws in word_lists for w in ws], dtype=object)
        if len(flat) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "pos": pd.Series([], dtype=np.int64),
                    "token_id": pd.Series([], dtype=np.int64),
                }
            )
        doc_ids = np.repeat(
            np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64), lens
        )
        pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lens if n])
        codes, uniq = pd.factorize(flat)
        uid = np.asarray([v.get(w, 0) for w in uniq], dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": doc_ids, "pos": pos, "token_id": uid[codes]}
        )

    return ds.map_batches(arrow_out(encode), batch_format="pyarrow")


def lexical_diversity(ds):
    """Per-document lexical-diversity signals: unigram Shannon entropy
    (bits) and type-token ratio — the diversity axis of quality
    filtering (low-entropy docs are template/boilerplate; the Gopher
    repetition rules catch local duplication, this catches global
    degeneracy).

    Scale shape: pure shuffle-free ``map_batches`` — every signal is a
    function of one document's word histogram. Entropy uses
    H = log2(n) - (sum c_i*log2(c_i))/n over exact integer counts, with
    the identical expression in the SQL oracle (rounded 6 dp; the
    float-sum term is per-document over a bounded vocabulary, where
    6-dp rounding absorbs association-order noise — the `lm_quality`
    precedent). Empty documents are omitted (no tokens, no histogram).
    Returns Dataset[(doc_id, n_words, n_distinct, entropy_bits, ttr)].
    """
    from docstrange_ray.shuffle import arrow_out

    def per_doc(batch: pa.Table) -> pd.DataFrame:
        # vectorized: ONE factorize over the batch's token stream, ONE
        # (doc, word) groupby — no per-document Python histograms
        word_lists = [
            (t or "").lower().split() for t in batch.column("text").to_pylist()
        ]
        lens = np.array([len(ws) for ws in word_lists], dtype=np.int64)
        keep = lens > 0
        if not keep.any():
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_words": pd.Series([], dtype=np.int64),
                    "n_distinct": pd.Series([], dtype=np.int64),
                    "entropy_bits": pd.Series([], dtype=np.float64),
                    "ttr": pd.Series([], dtype=np.float64),
                }
            )
        flat = np.asarray(
            [w for ws in word_lists for w in ws], dtype=object
        )
        d_idx = np.repeat(np.arange(len(word_lists)), lens)
        codes, _ = pd.factorize(flat)
        pair = (
            pd.DataFrame({"d": d_idx, "w": codes})
            .groupby(["d", "w"], sort=False)
            .size()
            .reset_index(name="c")
        )
        c = pair["c"].to_numpy(np.float64)
        clc = c * np.log2(c)
        agg = (
            pd.DataFrame({"d": pair["d"], "clc": clc, "one": np.int64(1)})
            .groupby("d", sort=True)
            .agg(sclc=("clc", "sum"), n_distinct=("one", "sum"))
        )
        d = agg.index.to_numpy()
        n = lens[d].astype(np.float64)
        doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)[d]
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_words": lens[d],
                "n_distinct": agg["n_distinct"].to_numpy(np.int64),
                "entropy_bits": round6(
                    np.log2(n) - agg["sclc"].to_numpy(np.float64) / n, 6
                ),
                "ttr": round6(agg["n_distinct"].to_numpy(np.float64) / n, 6),
            }
        )

    return ds.map_batches(arrow_out(per_doc), batch_format="pyarrow")


def doc_novelty(ds, n: int = 3, num_partitions: int | None = None):
    """Per-document novelty: the fraction of a document's DISTINCT word
    n-grams that appear in NO other document — the inverse of the
    overlap signal dedup pipelines use to find boilerplate-heavy or
    mostly-copied documents (a doc can evade near-dup detection yet
    still be 80% recycled n-grams).

    Scale shape: two exchanges, both hot-key-safe. (1) per-batch
    distinct (gram, doc_id) pairs shuffle on the GRAM key; each block
    holds every holder of its grams, so it computes the gram's document
    frequency locally and credits each holder one (doc_id, credit,
    unique) partial row per gram. (2) the credit rows (one per distinct
    gram per doc — already minimal) shuffle on doc_id and sum into
    (n_grams, n_unique, novelty). Gram text never leaves exchange (1).
    Returns Dataset[(doc_id, n_grams, n_unique, novelty)]; documents
    with fewer than ``n`` words have no n-gram and are omitted.
    """
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        doc_ids, grams = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = (t or "").lower().split()
            gs = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
            doc_ids.extend([did] * len(gs))
            grams.extend(gs)
        return pd.DataFrame(
            {
                "gram": pd.Series(grams, dtype=object),
                "doc_id": pd.Series(doc_ids, dtype=np.int64),
            }
        )

    pairs = ds.map_batches(
        arrow_out(pair_partial), batch_format="pyarrow", batch_size=65536
    )

    def credit_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["gram", "doc_id"])
        dfreq = df.groupby("gram")["doc_id"].transform("size")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_grams": np.int64(1),
                "n_unique": (dfreq == 1).to_numpy().astype(np.int64),
            }
        )

    credits = grouped_blocks(
        pairs, ["gram"], credit_block, num_partitions, batch_format="pandas"
    )

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)[["n_grams", "n_unique"]].sum()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype(np.int64),
                "n_grams": g["n_grams"].astype(np.int64),
                "n_unique": g["n_unique"].astype(np.int64),
                "novelty": round6(
                    g["n_unique"].to_numpy(np.float64)
                    / g["n_grams"].to_numpy(np.float64),
                    6,
                ),
            }
        )

    return grouped_blocks(
        credits, ["doc_id"], per_doc, num_partitions, batch_format="pandas"
    )


def pmi_collocations(
    ds, min_count: int = 5, k: int = 50, num_partitions: int | None = None
):
    """Top-k word-bigram collocations by pointwise mutual information —
    PMI = ln(c_xy * Nu^2 / (Nb * c_x * c_y)) with p(x,y) over bigram
    instances Nb and p(x) over unigram instances Nu.

    Scale shape: fully distributed, NO vocabulary-scale driver state.
    Unigram and bigram counts each partial-reduce per batch before ONE
    key shuffle; corpus totals ride the same exchanges as "" sentinel
    rows (str.split can't produce an empty token), so no extra pass;
    the reduced count tables materialize (object-store-resident) and
    the bigram table — pruned hard by ``min_count`` BEFORE any join —
    picks up c_x and c_y via two co-partitioned ``hash_join`` s on the
    UNPRUNED unigram table. PMI is computed in LOG SPACE from the exact
    integer counts (the product form c_xy*Nu^2 wraps int64 at ~10M-word
    corpora) with the literal term order mirrored by the SQL oracle
    (rounded 6 dp), and the global top-k closes as local candidates +
    a coalesced final with (pmi DESC, x, y) ties.
    Returns Dataset[(x, y, c_xy, pmi)].
    """
    from docstrange_ray.shuffle import (
        arrow_out,
        coalesced_blocks,
        grouped_blocks,
        hash_join,
    )

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    def uni_partial(batch: pa.Table) -> pd.DataFrame:
        vc = word_counts(batch.column("text").to_pylist())
        return pd.DataFrame(
            {
                "x": np.append(vc.index.to_numpy(dtype=object), ""),
                "cx": np.append(vc.to_numpy(dtype=np.int64), np.int64(vc.sum())),
            }
        )

    def bi_partial(batch: pa.Table) -> pd.DataFrame:
        pairs: list[str] = []
        n_bi = 0
        for t in batch.column("text").to_pylist():
            ws = (t or "").lower().split()
            n_bi += max(len(ws) - 1, 0)
            pairs.extend(
                ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)
            )
        vc = pd.Series(pairs, dtype=object).value_counts()
        return pd.DataFrame(
            {
                "bigram": np.append(vc.index.to_numpy(dtype=object), ""),
                "c_xy": np.append(vc.to_numpy(dtype=np.int64), np.int64(n_bi)),
            }
        )

    uni = grouped_blocks(
        ds.map_batches(arrow_out(uni_partial), batch_format="pyarrow", batch_size=65536),
        ["x"],
        lambda df: df.groupby("x", as_index=False)["cx"].sum(),
        num_partitions,
        batch_format="pandas",
    ).materialize()
    bi = grouped_blocks(
        ds.map_batches(arrow_out(bi_partial), batch_format="pyarrow", batch_size=65536),
        ["bigram"],
        lambda df: df.groupby("bigram", as_index=False)["c_xy"].sum(),
        num_partitions,
        batch_format="pandas",
    ).materialize()

    nu = uni.map_batches(
        lambda b: b.filter(pc.equal(b.column("x"), "")), batch_format="pyarrow"
    ).take_all()[0]["cx"]
    nb = bi.map_batches(
        lambda b: b.filter(pc.equal(b.column("bigram"), "")), batch_format="pyarrow"
    ).take_all()[0]["c_xy"]

    def split_prune(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[(df["bigram"] != "") & (df["c_xy"] >= min_count)]
        parts = df["bigram"].str.split(" ", n=1, expand=True)
        if len(df) == 0:
            return pd.DataFrame(
                {"x": pd.Series([], dtype=object), "y": pd.Series([], dtype=object),
                 "c_xy": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"x": parts[0], "y": parts[1], "c_xy": df["c_xy"].to_numpy(np.int64)}
        )

    bi_pruned = bi.map_batches(arrow_out(split_prune), batch_format="pyarrow")
    uni_clean = uni.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("x"), "")), batch_format="pyarrow"
    ).materialize()

    j1 = hash_join(bi_pruned, uni_clean, key="x", num_partitions=num_partitions)

    def rename_y(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["y" if n == "x" else ("cy" if n == "cx" else n) for n in batch.schema.names]
        )

    uni_y = uni_clean.map_batches(rename_y, batch_format="pyarrow")
    j2 = hash_join(j1, uni_y, key="y", num_partitions=num_partitions)

    def score(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if len(df) == 0:
            return pd.DataFrame(
                {"x": pd.Series([], dtype=object), "y": pd.Series([], dtype=object),
                 "c_xy": pd.Series([], dtype=np.int64),
                 "pmi": pd.Series([], dtype=np.float64)}
            )
        # log-space: c_xy * nu^2 in int64 wraps silently at ~10M-word
        # corpora (nu^2 alone is 1e14); the sum of logs is exact-enough
        # at 6 dp and each term + the left-to-right association is
        # mirrored literally by the SQL oracle, preserving bit parity
        pmi = round6(
            np.log(df["c_xy"].to_numpy(np.float64))
            + 2.0 * np.log(float(nu))
            - np.log(float(nb))
            - np.log(df["cx"].to_numpy(np.float64))
            - np.log(df["cy"].to_numpy(np.float64)),
            6,
        )
        out = pd.DataFrame(
            {"x": df["x"], "y": df["y"],
             "c_xy": df["c_xy"].to_numpy(np.int64), "pmi": pmi}
        )
        return out.sort_values(["pmi", "x", "y"], ascending=[False, True, True]).head(k)

    return coalesced_blocks(
        j2.map_batches(arrow_out(score), batch_format="pyarrow"),
        lambda df: df.sort_values(
            ["pmi", "x", "y"], ascending=[False, True, True]
        ).head(k),
    )


def top_ngrams(ds, n: int = 3, k: int = 100, num_partitions: int | None = None):
    """Corpus-wide word n-gram frequency top-k — the canonical
    partial-reduce workload shape at 100 TB: every batch emits ONE
    partial count row per DISTINCT n-gram (never one row per
    occurrence), the n-gram key hash-shuffles ONCE, and the global
    top-k is block-local candidates + a coalesced final (no sort
    shuffle; n_blocks x k rows cross). Ties break on n-gram text
    ascending so the result is deterministic at any parallelism.
    Returns Dataset[(ngram, n)]."""
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    def partial(batch: pa.Table) -> pd.DataFrame:
        grams: list[str] = []
        for t in batch.column("text").to_pylist():
            words = (t or "").lower().split()
            grams.extend(
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            )
        if not grams:
            return pd.DataFrame({"ngram": pd.Series([], dtype=object), "n": pd.Series([], dtype=np.int64)})
        vc = pd.Series(grams).value_counts()
        return pd.DataFrame({"ngram": vc.index, "n": vc.to_numpy(dtype=np.int64)})

    counts = grouped_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        ["ngram"],
        lambda df: df.groupby("ngram", as_index=False)["n"].sum(),
        num_partitions,
        batch_format="pandas",
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "ngram"], ascending=[False, True]).head(k)

    return coalesced_blocks(
        counts.map_batches(arrow_out(local_topk), batch_format="pandas"), local_topk
    )


def tfidf_topk(
    ds,
    k: int = 5,
    num_partitions: int | None = None,
    plan: str = "auto",
    broadcast_term_limit: int = 2_000_000,
):
    """Per-document top-k terms by tf-idf (idf = ln(N/df)).

    Document frequencies are always computed distributed: per-batch
    partial (one row per distinct term per batch, counting DOCS not
    occurrences) -> ONE term-keyed shuffle. The scoring pass then picks
    a plan:

    * ``broadcast`` — the df map (vocabulary-scale, Heaps-law
      sublinear) is collected and broadcast once via ``ray.put``;
      scoring + top-k is a pure shuffle-free ``map_batches``.
    * ``join`` — the unbounded-vocabulary path: the (doc_id, term, tf)
      explosion co-partition-joins the df table on term (one exchange
      moves both sides) and per-doc top-k closes with a doc_id-keyed
      exchange. 2 extra exchanges of the term projection, zero
      worker-memory assumption.
    * ``auto`` (default) — counts the materialized df table (free) and
      takes broadcast at/below ``broadcast_term_limit`` terms, join
      above — the same measure-then-choose gate as the as-of join and
      embedding-dup plans.

    Both plans rank by the identical unrounded score with term-asc
    ties and round at emit, so their outputs are byte-identical
    (pinned by a test). Returns Dataset[(doc_id, term, tf, score)],
    score rounded to 6 dp."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(set((t or "").lower().split()))
        return pd.DataFrame(
            {"term": list(c.keys()), "df": np.fromiter(c.values(), dtype=np.int64, count=len(c))}
        )

    df_ds = grouped_blocks(
        ds.map_batches(arrow_out(df_partial), batch_format="pyarrow", batch_size=65536),
        ["term"],
        lambda d: d.groupby("term", as_index=False)["df"].sum(),
        num_partitions,
        batch_format="pandas",
    ).materialize()
    if plan == "auto":
        plan = "broadcast" if df_ds.count() <= broadcast_term_limit else "join"

    if plan == "join":
        def explode(batch: pa.Table) -> pd.DataFrame:
            from collections import Counter

            out_doc, out_term, out_tf = [], [], []
            for did, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                for w, c in Counter((t or "").lower().split()).items():
                    out_doc.append(did)
                    out_term.append(w)
                    out_tf.append(c)
            return pd.DataFrame(
                {"doc_id": out_doc, "term": out_term, "tf": out_tf}
            )

        exploded = ds.map_batches(
            arrow_out(explode), batch_format="pyarrow", batch_size=65536
        )
        joined = hash_join(exploded, df_ds, key="term", num_partitions=num_partitions)

        def topk_block(dfb: pd.DataFrame) -> pd.DataFrame:
            if not len(dfb):
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "term": pd.Series([], dtype="object"),
                        "tf": pd.Series([], dtype="int64"),
                        "score": pd.Series([], dtype="float64"),
                    }
                )
            # rank on the UNROUNDED score (term-asc ties), round at emit
            dfb = dfb.assign(
                score=dfb["tf"].to_numpy(dtype=np.float64)
                * np.log(n_docs / dfb["df"].to_numpy(dtype=np.float64))
            )
            out = (
                dfb.sort_values(["doc_id", "score", "term"], ascending=[True, False, True])
                .groupby("doc_id", sort=False)
                .head(k)
            )
            out = out.assign(score=[float(round6(v)) for v in out["score"]])
            return out[["doc_id", "term", "tf", "score"]]

        return grouped_blocks(
            joined, ["doc_id"], topk_block, num_partitions, batch_format="pandas"
        )

    df_map = {r["term"]: int(r["df"]) for r in df_ds.take_all()}
    ref = ray.put(df_map)

    def score_batch(batch: pa.Table) -> pa.Table:
        from collections import Counter

        dfm = ray.get(ref)
        out_doc, out_term, out_tf, out_score = [], [], [], []
        doc_ids = batch.column("doc_id").to_pylist()
        for did, t in zip(doc_ids, batch.column("text").to_pylist()):
            tf = Counter((t or "").lower().split())
            if not tf:
                continue
            scored = [
                (float(c) * float(np.log(n_docs / dfm.get(w, 1))), w, c)
                for w, c in tf.items()
            ]
            scored.sort(key=lambda x: (-x[0], x[1]))
            for score, w, c in scored[:k]:
                out_doc.append(did)
                out_term.append(w)
                out_tf.append(c)
                out_score.append(float(round6(score)))
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, type=batch.schema.field("doc_id").type),
                pa.array(out_term, type=pa.string()),
                pa.array(out_tf, type=pa.int64()),
                pa.array(out_score, type=pa.float64()),
            ],
            names=["doc_id", "term", "tf", "score"],
        )

    return ds.map_batches(score_batch, batch_format="pyarrow")


def lm_score(
    ds,
    num_partitions: int | None = None,
    bigram_min_count: int = 2,
    plan: str = "auto",
    broadcast_bigram_limit: int = 2_000_000,
):
    """Statistical language-model quality scoring (the CCNet-recipe
    shape, with an in-corpus bigram model standing in for KenLM): train
    add-one-smoothed bigram statistics over the corpus DISTRIBUTED (one
    count shuffle) and score every document as its mean bigram
    cross-entropy ``-mean log2 (c(w1 w2)+1)/(c(w1)+V)`` — low
    bits-per-bigram = typical phrasing, high = atypical/garbled (the
    repetition/fluency signal real pipelines threshold on).

    Scale bounds (the bigram vocabulary grows near-linearly with corpus
    tokens — unlike the Heaps-sublinear unigram table — so it gets two
    independent defenses):

    * ``bigram_min_count`` — bigrams whose EXACT global count is below
      the floor are pruned inside the count shuffle's final (a
      HAVING-style filter on already-reduced counts, so the prune is
      deterministic and SQL-mirrorable) and score as the smoothed floor
      ``c=0``. By Zipf, singleton bigrams dominate the table; pruning
      them removes most of its mass while perturbing cross-entropy by
      at most ``log2(min_count)`` bits on the pruned pairs — the same
      reason KenLM/CCNet models ship count-pruned.
    * ``plan`` — ``broadcast`` collects the (pruned) bigram table and
      ships it once via ``ray.put``; ``join`` never materializes it:
      per-doc bigram occurrences co-partition-join the count table on
      the bigram key and only the inner-join CORRECTION term
      ``sum occ*log2(c+1)`` flows back (pruned/absent bigrams
      contribute log2(0+1)=0, so no outer join is needed); the base
      term ``sum log2(c(w1)+V)`` is computed shuffle-free from the
      unigram broadcast (vocabulary-scale, same assumption as tf-idf).
      ``auto`` (default) counts the pruned table (free — it is
      materialized for the gate) and takes broadcast at/below
      ``broadcast_bigram_limit`` entries — the same measure-then-choose
      gate as tf-idf/embedding-dup.

    Documents with fewer than two words emit no row. Returns
    Dataset[(doc_id, bits_per_bigram)] rounded to 6 dp. The two plans
    agree to 6 dp on real corpora (pinned by a test); sub-ulp summation
    order differs (per-pair mean vs base-minus-correction)."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter

        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch.column("text").to_pylist():
            ws = (t or "").lower().split()
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        # Space-joined keys: tokens come from str.split() so they can
        # never contain whitespace. (NUL separators are NOT safe here —
        # pandas' groupby string hashtable treats keys as C strings and
        # silently merges everything sharing a pre-NUL prefix.)
        rows = [("u " + w, c) for w, c in uni.items()]
        rows += [("b " + a + " " + b, c) for (a, b), c in bi.items()]
        return pd.DataFrame(
            {"key": [k for k, _ in rows], "c": np.array([c for _, c in rows], dtype=np.int64)}
        )

    def count_final(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("key", as_index=False)["c"].sum()
        # HAVING-style prune on EXACT post-reduce counts: bigram rows
        # below the floor never leave the shuffle. Unigrams always kept
        # (they are the denominator and |V|).
        keep = ~g["key"].str.startswith("b ") | (g["c"] >= bigram_min_count)
        return g[keep]

    counts_ds = grouped_blocks(
        ds.map_batches(arrow_out(count_partial), batch_format="pyarrow", batch_size=65536),
        ["key"],
        count_final,
        num_partitions,
        batch_format="pandas",
    ).materialize()
    if plan == "auto":
        # gate on the BIGRAM table size only — the unigram rows ride the
        # same counts table but are broadcast under either plan
        n_bigrams = counts_ds.map_batches(
            lambda d: pd.DataFrame(
                {"n": [int(d["key"].str.startswith("b ").sum())]}
            ),
            batch_format="pandas",
        ).sum("n")
        plan = "broadcast" if (n_bigrams or 0) <= broadcast_bigram_limit else "join"

    if plan == "broadcast":
        uni_c: dict[str, int] = {}
        bi_c: dict[tuple[str, str], int] = {}
        for r in counts_ds.take_all():  # gated: <= broadcast_bigram_limit rows
            k = r["key"]
            if k.startswith("u "):
                uni_c[k[2:]] = int(r["c"])
            else:
                a, b = k[2:].split(" ", 1)
                bi_c[(a, b)] = int(r["c"])
        vocab_size = len(uni_c)
        ref = ray.put((uni_c, bi_c, vocab_size))

        def score_batch(batch: pa.Table) -> pa.Table:
            uni, bi, v = ray.get(ref)
            out_doc, out_score = [], []
            for did, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                ws = (t or "").lower().split()
                if len(ws) < 2:
                    continue
                bits = np.array(
                    [
                        -np.log2((bi.get((a, b), 0) + 1.0) / (uni.get(a, 0) + v))
                        for a, b in zip(ws, ws[1:])
                    ]
                )
                out_doc.append(did)
                out_score.append(float(round6(bits.mean())))
            return pa.Table.from_arrays(
                [
                    pa.array(out_doc, type=batch.schema.field("doc_id").type),
                    pa.array(out_score, type=pa.float64()),
                ],
                names=["doc_id", "bits_per_bigram"],
            )

        return ds.map_batches(score_batch, batch_format="pyarrow")

    # plan == 'join': only the unigram table (vocabulary-scale) is
    # broadcast; the bigram table stays distributed.
    uni_rows = counts_ds.map_batches(
        lambda d: d[d["key"].str.startswith("u ")][["key", "c"]],
        batch_format="pandas",
    )
    uni_c = {r["key"][2:]: int(r["c"]) for r in uni_rows.take_all()}
    vocab_size = len(uni_c)
    uni_ref = ray.put((uni_c, vocab_size))
    bi_ds = counts_ds.map_batches(
        lambda d: d[d["key"].str.startswith("b ")][["key", "c"]],
        batch_format="pandas",
    )

    def base_partial(batch: pa.Table) -> pd.DataFrame:
        """Per-doc floor term sum log2(c(w1)+V) + the pair count."""
        uni, v = ray.get(uni_ref)
        out_doc, out_n, out_base = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = (t or "").lower().split()
            if len(ws) < 2:
                continue
            base = float(
                np.sum(np.log2([uni.get(a, 0) + v for a in ws[:-1]], dtype=np.float64))
            )
            out_doc.append(did)
            out_n.append(len(ws) - 1)
            out_base.append(base)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype=np.int64),
                "n_pairs": pd.Series(out_n, dtype=np.int64),
                "base_bits": pd.Series(out_base, dtype=np.float64),
                "corr_bits": np.float64(0.0),
            }
        )

    def occ_partial(batch: pa.Table) -> pd.DataFrame:
        """Per-doc DISTINCT bigram occurrence counts, keyed like the count table."""
        from collections import Counter

        out_doc, out_key, out_occ = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = (t or "").lower().split()
            for (a, b), c in Counter(zip(ws, ws[1:])).items():
                out_doc.append(did)
                out_key.append("b " + a + " " + b)
                out_occ.append(c)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype=np.int64),
                "key": pd.Series(out_key, dtype=object),
                "occ": pd.Series(out_occ, dtype=np.int64),
            }
        )

    occs = ds.map_batches(arrow_out(occ_partial), batch_format="pyarrow", batch_size=65536)
    joined = hash_join(occs, bi_ds, key="key", num_partitions=num_partitions)

    def corr_block(dfb: pd.DataFrame) -> pd.DataFrame:
        if not len(dfb):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_pairs": pd.Series([], dtype="int64"),
                    "base_bits": pd.Series([], dtype="float64"),
                    "corr_bits": pd.Series([], dtype="float64"),
                }
            )
        corr = dfb["occ"].to_numpy(np.float64) * np.log2(
            dfb["c"].to_numpy(np.float64) + 1.0
        )
        g = (
            pd.DataFrame({"doc_id": dfb["doc_id"].to_numpy(np.int64), "corr": corr})
            .groupby("doc_id", as_index=False)["corr"]
            .sum()
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype(np.int64),
                "n_pairs": np.int64(0),
                "base_bits": np.float64(0.0),
                "corr_bits": g["corr"].astype(np.float64),
            }
        )

    corrections = joined.map_batches(arrow_out(corr_block), batch_format="pandas")
    base = ds.map_batches(arrow_out(base_partial), batch_format="pyarrow", batch_size=65536)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)[["n_pairs", "base_bits", "corr_bits"]].sum()
        n = g["n_pairs"].to_numpy(np.float64)
        bits = (g["base_bits"].to_numpy(np.float64) - g["corr_bits"].to_numpy(np.float64)) / n
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype(np.int64),
                "bits_per_bigram": round6(bits),
            }
        )

    return grouped_blocks(
        base.union(corrections), ["doc_id"], per_doc, num_partitions, batch_format="pandas"
    )


def rolling_fingerprint(batch: pa.Table, window: int = 8) -> pa.Table:
    """Rolling polynomial hash over word windows; the per-doc fingerprint
    is the MINIMUM window hash (a 1-perm MinHash — deterministic,
    cross-process stable, no PYTHONHASHSEED dependence). True O(1)
    rolling update per position (outgoing term scaled by
    BASE^{window-1} subtracted, shift, incoming added) — byte-identical
    to the from-scratch fold."""
    MOD = (1 << 61) - 1
    BASE = 1_000_003
    BW = pow(BASE, window - 1, MOD)
    out = []
    word_cache: dict[str, int] = {}
    for t in batch.column("text").to_pylist():
        words = (t or "").lower().split()
        if len(words) < window:
            words = words + ["\x00"] * (window - len(words))
        vals = []
        for w in words:
            v = word_cache.get(w)
            if v is None:
                v = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                word_cache[w] = v
            vals.append(v)
        h = 0
        for v in vals[:window]:
            h = (h * BASE + v) % MOD
        mn = h
        for i in range(1, len(vals) - window + 1):
            h = ((h - vals[i - 1] * BW) * BASE + vals[i + window - 1]) % MOD
            if h < mn:
                mn = h
        out.append(mn)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(out, type=pa.int64())],
        names=["doc_id", "fingerprint"],
    )


def bm25_topk(ds, query_terms: list[str], k: int = 20, k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 top-k document search for a fixed term query — the
    lexical retrieval op beside the ANN family (reference's search
    surface: mcp_server_module/server.py search tools).

    Two scan-shaped stages, zero all-to-all exchange:

    1. Corpus stats — every batch emits ONE bounded partial row set
       (doc count, total word count, per-query-term document
       frequency: ``len(terms) + 2`` numbers), reduced on the driver.
       At 100 TB this crossing is n_blocks x (terms+2) scalars.
    2. Scoring scan — stats are closure-broadcast (a handful of
       floats); every batch scores its docs shuffle-free and emits its
       block-local top-k; the global top-k closes with a coalesced
       final (n_blocks x k rows cross, the ``top_ngrams`` shape).

    Float determinism contract (what makes the SQL oracle exact): the
    per-term score is evaluated with the literal expression shape
    ``idf * (tf * (k1+1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))``
    with ``idf = ln((n - df + 0.5) / (df + 0.5) + 1)`` (the
    Lucene-variant idf, always positive), terms are summed in SORTED
    order (float addition order pinned), ranking uses the UNROUNDED
    double (ties doc_id asc), and rounding to 6 dp happens only at
    emit. Tokenization is the ``word_counts`` contract.

    Returns Dataset[(doc_id, score, matched)] of the global top-k docs.
    """
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    terms = sorted(set(query_terms))
    term_set = set(terms)

    def stats_partial(batch: pa.Table) -> pd.DataFrame:
        n = 0
        total = 0
        df: dict[str, int] = dict.fromkeys(terms, 0)
        for t in batch.column("text").to_pylist():
            words = (t or "").lower().split()
            n += 1
            total += len(words)
            for w in term_set.intersection(words):
                df[w] += 1
        rows = [("__docs__", n), ("__words__", total)] + list(df.items())
        return pd.DataFrame({"key": [r[0] for r in rows], "n": [r[1] for r in rows]})

    parts = ds.map_batches(
        arrow_out(stats_partial), batch_format="pyarrow", batch_size=65536
    ).take_all()  # bounded: n_blocks x (len(terms) + 2) scalar rows
    n_docs = sum(r["n"] for r in parts if r["key"] == "__docs__")
    total_words = sum(r["n"] for r in parts if r["key"] == "__words__")
    df_map: dict[str, int] = dict.fromkeys(terms, 0)
    for r in parts:
        if r["key"] in df_map:
            df_map[r["key"]] += int(r["n"])
    avgdl = total_words / n_docs if n_docs else 1.0
    idf = {
        t: float(np.log((n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5) + 1.0))
        for t in terms
    }

    def empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
                "matched": pd.Series([], dtype="int64"),
            }
        )

    def score_block(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter

        out_doc, out_score, out_matched = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            words = (t or "").lower().split()
            dl = len(words)
            c = Counter(words)
            s = 0.0
            matched = 0
            for term in terms:  # sorted: float addition order is pinned
                tf = c.get(term, 0)
                if not tf:
                    continue
                matched += 1
                s += idf[term] * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (dl / avgdl))
                )
            if matched:
                out_doc.append(did)
                out_score.append(s)
                out_matched.append(matched)
        if not out_doc:
            return empty()
        return pd.DataFrame(
            {
                "doc_id": np.array(out_doc, dtype=np.int64),
                "score": np.array(out_score, dtype=np.float64),
                "matched": np.array(out_matched, dtype=np.int64),
            }
        )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty()
        return df.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)

    candidates = ds.map_batches(
        arrow_out(lambda b: local_topk(score_block(b))),
        batch_format="pyarrow",
        batch_size=65536,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = local_topk(df)
        return out.assign(score=[float(round6(v)) for v in out["score"]])

    return coalesced_blocks(candidates, final)


def source_vocab_overlap(ds, num_partitions: int | None = None):
    """Pairwise vocabulary Jaccard between sources — the cross-source
    similarity diagnostic a mixture-curation pass reads before choosing
    sampling weights (near-identical sources are dedup candidates;
    disjoint ones are mixture diversity).

    Plan: per-batch DISTINCT (source, word) partial -> ONE word-keyed
    shuffle (each word's source set lands whole in one block) -> per
    block emit pair-count partials (one row per co-occurring source
    pair per block) + per-source distinct-word totals -> ONE coalesced
    final. The final needs totals and pairs together, so it must see
    every key: correct because the partial space is n_blocks x
    (n_sources^2 + n_sources) — sources are a curated mixture list
    (tens to thousands), never corpus-scale. A word co-occurring in
    many sources emits quadratic pair rows; cap the blow-up upstream by
    filtering stopword-universal words if n_sources grows large.
    Jaccard = ``n_common / (n_a + n_b - n_common)`` on exact int64
    counts, rounded at emit. Tokenization is the ``word_counts``
    contract.

    Returns Dataset[(source_a, source_b, n_common, jaccard)], pairs
    with source_a < source_b and n_common >= 1."""
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    def distinct_partial(batch: pa.Table) -> pd.DataFrame:
        seen: set[tuple[str, str]] = set()
        for src, t in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            for w in set((t or "").lower().split()):
                seen.add((src, w))
        return pd.DataFrame(
            {
                "source": [s for s, _ in seen],
                "word": [w for _, w in seen],
            }
        )

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["source", "word"])
        rows_k, rows_a, rows_b, rows_n = [], [], [], []
        # per-source distinct-word totals ride along as kind=0 rows — a
        # dedicated marker column, NOT an in-band sentinel key, so a
        # source literally named "" can never collide (ADVICE-r3 #4)
        tot = df.groupby("source").size()
        for src, n in tot.items():
            rows_k.append(0)
            rows_a.append(src)
            rows_b.append(src)
            rows_n.append(int(n))
        for _, grp in df.groupby("word", sort=False):
            srcs = sorted(grp["source"].tolist())
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    rows_k.append(1)
                    rows_a.append(srcs[i])
                    rows_b.append(srcs[j])
                    rows_n.append(1)
        out = pd.DataFrame(
            {
                "kind": pd.Series(rows_k, dtype=np.int8),
                "source_a": rows_a,
                "source_b": rows_b,
                "n": rows_n,
            }
        )
        return out.groupby(["kind", "source_a", "source_b"], as_index=False)["n"].sum()

    partials = grouped_blocks(
        ds.map_batches(
            arrow_out(distinct_partial), batch_format="pyarrow", batch_size=65536
        ),
        ["word"],
        pair_partials,
        num_partitions,
        batch_format="pandas",
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["kind", "source_a", "source_b"], as_index=False)["n"].sum()
        tot_rows = df[df["kind"] == 0]
        totals = dict(zip(tot_rows["source_a"], tot_rows["n"]))
        pairs = df[df["kind"] == 1].copy()
        if not len(pairs):
            return pd.DataFrame(
                {
                    "source_a": pd.Series([], dtype="object"),
                    "source_b": pd.Series([], dtype="object"),
                    "n_common": pd.Series([], dtype="int64"),
                    "jaccard": pd.Series([], dtype="float64"),
                }
            )
        na = pairs["source_a"].map(totals).to_numpy(dtype=np.int64)
        nb = pairs["source_b"].map(totals).to_numpy(dtype=np.int64)
        nc = pairs["n"].to_numpy(dtype=np.int64)
        jac = round6(nc.astype(np.float64) / (na + nb - nc))
        return pd.DataFrame(
            {
                "source_a": pairs["source_a"].to_numpy(),
                "source_b": pairs["source_b"].to_numpy(),
                "n_common": nc,
                "jaccard": np.array(jac, dtype=np.float64),
            }
        ).sort_values(["source_a", "source_b"])

    return coalesced_blocks(partials, final, batch_format="pandas")


def compression_stats(ds, level: int = 6, num_partitions=None):
    """Compression-ratio quality signal (the Dolma/Gopher-family
    repetitiveness detector: highly repetitive or templated text
    compresses far below natural prose; near-random noise compresses
    above it). One shuffle-free scan; zlib (RFC 1950, stdlib C speed)
    at a FIXED level so the value is deterministic for a given zlib
    build — floats are round6'd. Not SQL-expressible (no DEFLATE in
    DuckDB): pytest-oracled against direct zlib calls.

    Returns Dataset[(doc_id, raw_bytes, gz_bytes, ratio)] with
    ratio = gz_bytes / max(raw_bytes, 1) — low = repetitive,
    high = high-entropy."""
    import zlib

    from docstrange_ray.numerics import round6

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        gz = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            b = (t or "").encode("utf-8")
            raw[i] = len(b)
            gz[i] = len(zlib.compress(b, level))
        ratio = round6(gz / np.maximum(raw, 1))
        return pa.Table.from_arrays(
            [batch.column("doc_id"),
             pa.array(raw, type=pa.int64()),
             pa.array(gz, type=pa.int64()),
             pa.array(ratio, type=pa.float64())],
            names=["doc_id", "raw_bytes", "gz_bytes", "ratio"],
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def cooccurrence_topk(
    ds, window: int = 5, k: int = 200, num_partitions: int | None = None
):
    """Corpus-wide windowed word CO-OCCURRENCE counts, top-k — the
    word2vec/GloVe preprocessing stage, and at 100 TB the single
    heaviest text shuffle there is (every token emits up to ``window``
    pairs). The plan is the ``top_ngrams`` partial-reduce shape:

      * per batch, the pair stream is built VECTORIZED — one flat word
        array with doc-boundary masks, shifted against itself for each
        distance d in [1, window] (no Python loop over positions), and
        value-counted locally so each batch ships one row per DISTINCT
        pair, never one per occurrence;
      * pairs are UNORDERED: (a, b) canonicalized lexicographically
        (numpy elementwise min/max on the string arrays), matching the
        symmetric co-occurrence matrix both embedding recipes use;
      * ONE pair-key exchange sums partials; global top-k closes with
        block-local candidates + a coalesced final (ties break on
        (w1, w2) ascending — deterministic at any parallelism).

    Returns Dataset[(w1, w2, n)] with w1 <= w2.
    """
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    def partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        words_per_doc = [(t or "").lower().split() for t in texts]
        flat = [w for ws in words_per_doc for w in ws]
        if not flat:
            return pd.DataFrame(
                {
                    "w1": pd.Series([], dtype=object),
                    "w2": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        words = np.asarray(flat, dtype=object)
        doc_ids = np.repeat(
            np.arange(len(words_per_doc)), [len(ws) for ws in words_per_doc]
        )
        a_parts, b_parts = [], []
        for d in range(1, window + 1):
            if d >= len(words):
                break
            same = doc_ids[:-d] == doc_ids[d:]
            x, y = words[:-d][same], words[d:][same]
            a_parts.append(np.minimum(x, y))
            b_parts.append(np.maximum(x, y))
        if not a_parts:
            return pd.DataFrame(
                {
                    "w1": pd.Series([], dtype=object),
                    "w2": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        df = pd.DataFrame(
            {"w1": np.concatenate(a_parts), "w2": np.concatenate(b_parts)}
        )
        out = df.groupby(["w1", "w2"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    counts = grouped_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        ["w1", "w2"],
        lambda df: df.groupby(["w1", "w2"], as_index=False)["n"].sum(),
        num_partitions,
        batch_format="pandas",
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "w1", "w2"], ascending=[False, True, True]
        ).head(k)

    return coalesced_blocks(
        counts.map_batches(arrow_out(local_topk), batch_format="pandas"), local_topk
    )
