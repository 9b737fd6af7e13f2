"""RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010,
"Automatic keyword extraction from individual documents") — corpus-wide
candidate-phrase scoring, the unsupervised keyword signal a curation
pipeline uses for topic auditing and index building.

Contract (pinned so SQL oracles can rebuild it exactly):

  1. fragments = ``lower(text)`` split on ``[^a-z0-9\\s]+``
     (punctuation bounds candidate phrases);
  2. within a fragment, whitespace words; a STOPWORD breaks the
     fragment into phrase groups (the CDC cumulative-anchor idiom:
     group id = running stopword count) and is itself discarded;
  3. each non-empty group is one candidate phrase OCCURRENCE (tokens
     joined by one space);
  4. word stats over all occurrences: ``freq(w)`` += 1 and
     ``deg(w)`` += phrase_len per token occurrence (degree counts
     self-co-occurrence, the paper's Fig. 1 semantics);
  5. word score is quantized ONCE to ``(1e6 * deg(w)) // freq(w)``
     (integer floor — quantize-before-reduce, so phrase-score sums are
     order-independent and bit-equal to SQL);
  6. phrase score = sum of member TOKEN scores (multiplicity counts);
     ranking = (score_micro DESC, occurrences DESC, phrase ASC) — a
     total order, so top-k is deterministic.

Distributed shape: one extraction scan -> ONE phrase exchange
(pre-reduced occurrence counts) -> word stats derived from the
DISTINCT-phrase table weighted by occurrence count (vocabulary-scale,
Heaps-bounded: ONE word exchange) -> scoring either BROADCASTS the
word-score map (at/below ``broadcast_word_limit``, measured not
assumed) or co-partition-JOINS the exploded (phrase, word) projection
against it (unbounded-vocabulary path) -> block-local top-k candidates
-> ONE coalesced global top-k. Both plans rank by identical integers
(byte-identical outputs, pinned by tests).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000

# Fixed stopword list — part of the op contract (embedded verbatim in
# SQL oracles); the classic closed-class English core.
STOPWORDS = (
    "a an and are as at be but by for from has have he her his if in is it "
    "its not of on or she that the their them they this to was were which "
    "will with you your"
).split()
_STOPSET = frozenset(STOPWORDS)

# re.ASCII pins \s to [ \t\n\r\f\v] — DuckDB's RE2 \s is ASCII-only, so
# a unicode space (NBSP etc.) must be a phrase BOUNDARY on both sides;
# Python's default unicode \s / str.split() would swallow it silently
_FRAG_RE = re.compile(r"[^a-z0-9\s]+", re.ASCII)
_WS_RE = re.compile(r"\s+", re.ASCII)


def phrase_occurrences(text: str) -> list[str]:
    """Candidate phrase occurrences of one document (module contract
    steps 1-3). Pure function — shared by the distributed plan and
    tests' independent references only via the CONTRACT, not code."""
    out = []
    for frag in _FRAG_RE.split((text or "").lower()):
        cur: list[str] = []
        for w in _WS_RE.split(frag):
            if not w:
                continue
            if w in _STOPSET:
                if cur:
                    out.append(" ".join(cur))
                    cur = []
            else:
                cur.append(w)
        if cur:
            out.append(" ".join(cur))
    return out


def extract_phrases(ds, text_col: str = "text"):
    """Dataset[(phrase, n_words)] — one row per candidate occurrence."""
    def scan(batch: pa.Table) -> pa.Table:
        phrases: list[str] = []
        for t in batch.column(text_col).to_pylist():
            phrases.extend(phrase_occurrences(t))
        nw = np.fromiter(
            (p.count(" ") + 1 for p in phrases), dtype=np.int64, count=len(phrases)
        )
        return pa.table(
            {"phrase": pa.array(phrases, pa.string()), "n_words": pa.array(nw)}
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def rake_keywords(
    ds,
    k: int = 50,
    text_col: str = "text",
    plan: str = "auto",
    broadcast_word_limit: int = 2_000_000,
    num_partitions: int | None = None,
):
    """Corpus-wide top-``k`` RAKE keywords. Returns a pandas DataFrame
    [(rank, phrase, n_words, occurrences, score_micro)] — O(k) rows.
    See module docstring for the exact contract and the two scoring
    plans; ``plan='auto'`` measures the materialized word table and
    takes broadcast at/below ``broadcast_word_limit`` words."""
    import ray

    from docstrange_ray.shuffle import (
        arrow_out,
        coalesced_blocks,
        grouped_blocks,
        hash_join,
    )

    # phrase exchange: occurrence counts pre-reduced per block
    def ph_local(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby(["phrase", "n_words"], as_index=False).size().rename(
            columns={"size": "occ"}
        )

    def ph_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["phrase", "n_words"], as_index=False)["occ"].sum()

    ptab = grouped_blocks(
        extract_phrases(ds, text_col).map_batches(
            arrow_out(ph_local), batch_format="pyarrow"
        ),
        ["phrase"],
        ph_final,
        num_partitions,
        batch_format="pandas",
    ).materialize()

    _EMPTY = pd.DataFrame(
        columns=["rank", "phrase", "n_words", "occurrences", "score_micro"]
    )
    if ptab.count() == 0:  # all-stopword corpus: no candidates at all
        return _EMPTY

    # word stats from the DISTINCT-phrase table weighted by occurrences
    def w_local(df: pd.DataFrame) -> pd.DataFrame:
        words, freqs, degs = [], [], []
        for phrase, nw, occ in zip(df["phrase"], df["n_words"], df["occ"]):
            for w in phrase.split(" "):
                words.append(w)
                freqs.append(occ)
                degs.append(occ * nw)
        out = pd.DataFrame({"word": words, "freq": freqs, "deg": degs})
        return out.groupby("word", as_index=False)[["freq", "deg"]].sum()

    from docstrange_ray.shuffle import adaptive_final

    wtab = adaptive_final(
        ptab.map_batches(
            arrow_out(lambda b: w_local(b.to_pandas())), batch_format="pyarrow"
        ),
        lambda df: df.groupby("word", as_index=False)[["freq", "deg"]].sum(),
        keys=["word"],
        num_partitions=num_partitions,
    ).materialize()

    n_words_total = wtab.count()
    if plan == "auto":
        plan = "broadcast" if n_words_total <= broadcast_word_limit else "join"

    if plan == "broadcast":
        wdf = wtab.to_pandas()
        scores = {
            w: (SCALE * int(d)) // int(f)
            for w, f, d in zip(wdf["word"], wdf["freq"], wdf["deg"])
        }
        ref = ray.put(scores)

        def score_block(batch: pa.Table) -> pd.DataFrame:
            sc = ray.get(ref)
            df = batch.to_pandas()
            df["score_micro"] = np.fromiter(
                (
                    sum(sc[w] for w in p.split(" "))
                    for p in df["phrase"]
                ),
                dtype=np.int64,
                count=len(df),
            )
            return _local_topk(df, k)

        cands = ptab.map_batches(arrow_out(score_block), batch_format="pyarrow")
    elif plan == "join":
        def explode(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            ps, ws = [], []
            for p in df["phrase"]:
                for w in p.split(" "):
                    ps.append(p)
                    ws.append(w)
            return pd.DataFrame({"phrase": ps, "word": ws})

        def wscore(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            # Python ints: SCALE * deg wraps silently in numpy int64 for
            # deg > ~9.2e12, diverging from the broadcast plan's exact
            # (SCALE * int(d)) // int(f); vocab-scale rows, so the loop
            # is cheap
            df["wscore"] = pd.Series(
                [(SCALE * int(d)) // int(f)
                 for d, f in zip(df["deg"], df["freq"])],
                index=df.index,
                dtype="int64",
            )
            return df[["word", "wscore"]]

        exploded = ptab.map_batches(arrow_out(explode), batch_format="pyarrow")
        wscores = wtab.map_batches(arrow_out(wscore), batch_format="pyarrow")
        joined = hash_join(
            exploded, wscores, key="word", num_partitions=num_partitions
        )

        def sum_per_phrase(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("phrase", as_index=False)["wscore"].sum().rename(
                columns={"wscore": "score_micro"}
            )

        psc = grouped_blocks(
            joined, ["phrase"], sum_per_phrase, num_partitions,
            batch_format="pandas",
        )
        merged = hash_join(ptab, psc, key="phrase", num_partitions=num_partitions)
        cands = merged.map_batches(
            arrow_out(lambda b: _local_topk(b.to_pandas(), k)),
            batch_format="pyarrow",
        )
    else:
        raise ValueError(f"unknown plan {plan!r}")

    out = coalesced_blocks(cands, lambda df: _local_topk(df, k)).to_pandas()
    if out.empty:
        return _EMPTY
    out = out.reset_index(drop=True).rename(columns={"occ": "occurrences"})
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


def _local_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(
        ["score_micro", "occ", "phrase"], ascending=[False, False, True]
    ).head(k)
    return pd.DataFrame(
        {
            "phrase": df["phrase"].to_numpy(),
            "n_words": df["n_words"].to_numpy().astype(np.int64),
            "occ": df["occ"].to_numpy().astype(np.int64),
            "score_micro": df["score_micro"].to_numpy().astype(np.int64),
        }
    )


# ---------------------------------------------------------------------------
# TextRank keywords (Mihalcea & Tarau 2004) — PageRank over the word
# co-occurrence graph, on the exact-integer pagerank machinery
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"[a-z]+\Z", re.ASCII)


def _word_node_id(w: str) -> int:
    """Deterministic 60-bit word node id: int of the first 15 hex chars
    of md5 — the house SQL-mirrorable hash (< 2^60, BIGINT-safe)."""
    import hashlib

    return int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)


def content_tokens(text: str) -> list[str]:
    """TextRank content-token sequence (module contract): lower,
    ASCII-whitespace split, keep purely alphabetic non-stopwords."""
    return [
        w
        for w in _WS_RE.split((text or "").lower())
        if w and _WORD_RE.fullmatch(w) and w not in _STOPSET
    ]


def textrank_keywords(
    ds,
    k: int = 50,
    iterations: int = 5,
    scale: int = 10**12,
    text_col: str = "text",
    num_partitions=None,
):
    """Corpus-level TextRank keywords: fixed-point integer PageRank
    (ops/graph.pagerank — 5 iterations, d=0.85, dangling handled) over
    the word co-occurrence graph, top-``k`` words by (rank DESC, word
    ASC). Returns pandas DataFrame[(word, rank)] — rank in 1/scale
    units, bit-identical across plans and to the SQL oracle.

    Graph contract (shared verbatim with the oracle): adjacent pairs of
    the per-doc CONTENT token sequence (:func:`content_tokens`),
    equal-word pairs dropped, unordered (min, max) distinct corpus-wide,
    symmetrized to both directions; node id = md5-prefix
    (:func:`_word_node_id`).

    Scale shape: ONE (x, y) pair exchange carries per-block DISTINCT
    pairs (co-occurrence-pair scale, not token scale); the vocabulary
    table derives from the distinct pair table (Heaps-bounded); ranks
    rejoin words on ONE vocab-scale tagged-union exchange; top-k is
    block-local candidates -> one coalesced final. The pagerank inner
    loop auto-gates broadcast vs co-partition at 2M nodes.
    """
    from docstrange_ray.ops.graph import pagerank
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    def pair_scan(batch: pa.Table) -> pd.DataFrame:
        pairs: set[tuple[str, str]] = set()
        for t in batch.column(text_col).to_pylist():
            toks = content_tokens(t)
            for a, b in zip(toks, toks[1:]):
                if a != b:
                    pairs.add((a, b) if a < b else (b, a))
        if not pairs:
            return pd.DataFrame({"x": pd.Series([], dtype=object),
                                 "y": pd.Series([], dtype=object)})
        xs, ys = zip(*sorted(pairs))
        return pd.DataFrame({"x": list(xs), "y": list(ys)})

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    wpairs = grouped_blocks(
        ds.map_batches(arrow_out(pair_scan), batch_format="pyarrow"),
        ["x", "y"],
        distinct_pairs,
        num_partitions,
        batch_format="pandas",
    ).materialize()

    # vocabulary = words of the distinct pair table (Heaps-bounded)
    def words_local(batch: pa.Table) -> pd.DataFrame:
        ws = pd.unique(
            np.concatenate(
                [
                    batch.column("x").to_numpy(zero_copy_only=False),
                    batch.column("y").to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pd.DataFrame(
            {"word": ws,
             "node": np.array([_word_node_id(w) for w in ws], dtype=np.int64)}
        )

    def words_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    wordmap = grouped_blocks(
        wpairs.map_batches(arrow_out(words_local), batch_format="pyarrow"),
        ["word"],
        words_final,
        num_partitions,
        batch_format="pandas",
    )

    def to_edges(batch: pa.Table) -> pd.DataFrame:
        xs = batch.column("x").to_numpy(zero_copy_only=False)
        ys = batch.column("y").to_numpy(zero_copy_only=False)
        xi = np.array([_word_node_id(w) for w in xs], dtype=np.int64)
        yi = np.array([_word_node_id(w) for w in ys], dtype=np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([xi, yi]), "dst": np.concatenate([yi, xi])}
        )

    edges = wpairs.map_batches(arrow_out(to_edges), batch_format="pyarrow")
    # globally distinct by construction: (x, y) pairs are distinct with
    # x < y, so the two emitted directions cannot collide
    ranks = pagerank(
        edges,
        iterations=iterations,
        scale=scale,
        num_partitions=num_partitions,
        assume_distinct=True,
    )

    # attach words: vocab-scale tagged union keyed by node id
    def tag_rank(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {"node": df["node"].to_numpy(np.int64), "word": "",
             "rank": df["rank"].to_numpy(np.int64), "kind": np.int8(0)}
        )

    def tag_word(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {"node": df["node"].to_numpy(np.int64), "word": df["word"],
             "rank": np.int64(0), "kind": np.int8(1)}
        )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["kind"] == 0][["node", "rank"]]
        w = df[df["kind"] == 1][["node", "word"]]
        out = r.merge(w, on="node", how="inner")
        return out[["word", "rank"]]

    named = grouped_blocks(
        ranks.map_batches(arrow_out(tag_rank), batch_format="pyarrow").union(
            wordmap.map_batches(arrow_out(tag_word), batch_format="pyarrow")
        ),
        ["node"],
        attach,
        num_partitions,
        batch_format="pandas",
    )

    def local_top(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.sort_values(
            ["rank", "word"], ascending=[False, True]
        ).head(k)

    cands = named.map_batches(arrow_out(local_top), batch_format="pyarrow")
    out = coalesced_blocks(
        cands,
        lambda df: df.sort_values(["rank", "word"], ascending=[False, True]).head(k),
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"word": pd.Series([], dtype=object),
             "rank": pd.Series([], dtype=np.int64)}
        )
    return out.reset_index(drop=True)
