"""Distributed hard-EM PLSA topic modeling (Hofmann 1999, with the
k-means-style hard assignment variant — "hard EM" — chosen for the
same reason ops/unigram.py uses hard-EM Viterbi: every statistic is
an exact integer, so the distributed plan is BIT-identical to a local
reference and deterministic across cluster sizes).

Model: each distinct (doc, word) pair holds one topic assignment
z in [0, k).  E-step: z := argmax_z (n(d,z) + 1) * W(w,z) where
W(w,z) = floor(SCALE * (n(w,z) + 1) / (n(z) + V)) is the add-one-
smoothed word-given-topic weight QUANTIZED ON THE DRIVER to an int64
(quantize-before-compare — the house stats_tests discipline; the
<= 1/SCALE relative quantization is the documented, deterministic
contract).  n(d,z) is the doc's topic token count, n(w,z)/n(z) the
global ones, V the distinct-word vocabulary size.  Ties break to the
LOWEST z (np.argmax first-max).  M-step: recount.  Init: z0 =
md5_key52(f"{doc_id} {word}") % k — the house deterministic-shuffle
key, SQL-mirrorable.

Scale shape: the working table is ONE ROW PER DOC with list columns
(words/occs/zs), so n(d,z) is computed inside the row — Ray can split
blocks anywhere and per-doc statistics stay correct (row atomicity),
and NO per-iteration doc exchange exists.  Each iteration costs ONE
bounded (word x topic) count exchange (Heaps-bounded like tf-idf's
unigram table) whose reduced form broadcasts back via ``ray.put``.
Words beyond ``vocab_limit`` (kept by count desc, word asc) score
with the smoothed OOV floor W_oov(z) = floor(SCALE / (n(z) + V)) —
the tf-idf ``broadcast_term_limit`` discipline, so a 100-TB corpus's
long tail cannot OOM the driver or the workers.

The reference has no topic-model module; this serves corpus
exploration / domain-mixture analysis (cluster-then-balance) in a
training-data pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000


def _doc_word_counts(text: str):
    """Distinct words + occurrence counts, tokenizer contract
    text.lower().split() (shared with the jaccard/overlap oracles).
    Sorted by word so row layout is deterministic."""
    ws = text.lower().split()
    if not ws:
        return [], []
    s = pd.Series(ws).value_counts().sort_index()
    return s.index.tolist(), s.to_numpy(dtype=np.int64).tolist()


def build_plsa_table(ds, k: int, text_col: str = "text",
                     doc_col: str = "doc_id"):
    """Dataset[(doc_id, words list<str>, occs list<int64>,
    zs list<int64>)] with the md5 init assignment — one scan, no
    exchange (each doc's state is one atomic row)."""
    from docstrange_ray.numerics import md5_key52

    def explode(batch: pa.Table) -> pa.Table:
        docs = batch.column(doc_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        words, occs, zs = [], [], []
        for d, t in zip(docs, texts):
            w, o = _doc_word_counts(t)
            words.append(w)
            occs.append(o)
            zs.append([md5_key52(f"{d} {wi}") % k for wi in w])
        return pa.Table.from_arrays(
            [
                pa.array(docs, pa.int64()),
                pa.array(words, pa.list_(pa.string())),
                pa.array(occs, pa.list_(pa.int64())),
                pa.array(zs, pa.list_(pa.int64())),
            ],
            names=[doc_col, "words", "occs", "zs"],
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def topic_word_counts(table, k: int, num_partitions=None):
    """Dataset[(w, z, c)] — the bounded (word x topic) count exchange:
    per-block partial sums of occ by (word, z) before ONE hash
    exchange."""
    from docstrange_ray.shuffle import adaptive_final, arrow_out

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["words", "occs", "zs"]).to_pandas()
        w_all, z_all, c_all = [], [], []
        for ws, os_, zs in zip(df["words"], df["occs"], df["zs"]):
            w_all.extend(ws)
            z_all.extend(zs)
            c_all.extend(os_)
        out = pd.DataFrame({"w": w_all, "z": z_all, "c": c_all})
        return out.groupby(["w", "z"], as_index=False)["c"].sum()

    return adaptive_final(
        table.map_batches(arrow_out(partial), batch_format="pyarrow"),
        lambda df: df.groupby(["w", "z"], as_index=False)["c"].sum(),
        keys=["w", "z"],
        num_partitions=num_partitions,
    )


def _weights(wz: pd.DataFrame, k: int, vocab_limit: int):
    """Driver-side quantized weight table from the reduced (w, z, c)
    counts: W(w,z) = (SCALE*(c+1)) // (n_z + V) as int64 rows, plus
    the OOV floor row.  Python-int arithmetic (SCALE*c can pass 2^63
    only past ~9e12 tokens per topic — guarded)."""
    vocab = wz.groupby("w")["c"].sum().sort_values(
        ascending=False, kind="stable"
    )
    # deterministic keep set: count desc, word asc
    order = sorted(vocab.index, key=lambda w: (-int(vocab[w]), w))
    keep = set(order[:vocab_limit])
    V = len(vocab)
    nz = [0] * k
    for z, c in zip(wz["z"], wz["c"]):
        nz[int(z)] += int(c)
    den = [nz[z] + V for z in range(k)]
    if max(nz) >= (1 << 63) // SCALE:
        raise ValueError("plsa: topic token count too large for the "
                         "int64 quantized weights; raise SCALE design")
    rows: dict[str, np.ndarray] = {}
    for w, grp in wz[wz["w"].isin(keep)].groupby("w"):
        arr = np.array(
            [SCALE // d for d in den], dtype=np.int64
        )  # smoothed floor (c=0)
        for z, c in zip(grp["z"], grp["c"]):
            arr[int(z)] = (SCALE * (int(c) + 1)) // den[int(z)]
        rows[w] = arr
    oov = np.array([SCALE // d for d in den], dtype=np.int64)
    return rows, oov


def _reassign(table, w_ref, k: int):
    """E-step scan: per doc row, n(d,z) from the row's own lists, then
    z := argmax (n(d,z)+1) * W(w,z) vectorized over the doc's distinct
    words (ties -> lowest z)."""
    import ray

    def scan(batch: pa.Table) -> pa.Table:
        rows, oov = ray.get(w_ref)
        new_zs = []
        for ws, os_, zs in zip(
            batch.column("words").to_pylist(),
            batch.column("occs").to_pylist(),
            batch.column("zs").to_pylist(),
        ):
            if len(ws) == 0:
                new_zs.append([])
                continue
            occ = np.asarray(os_, dtype=np.int64)
            zarr = np.asarray(zs, dtype=np.int64)
            ndz = np.bincount(zarr, weights=occ.astype(np.float64),
                              minlength=k).astype(np.int64)
            wmat = np.stack([rows.get(w, oov) for w in ws])  # (m, k)
            scores = wmat * (ndz + 1)[None, :]
            new_zs.append(np.argmax(scores, axis=1).astype(np.int64)
                          .tolist())
        # rebuild with explicit types so an all-empty-doc block cannot
        # degrade zs to list<null> and break the union's schema
        names = list(batch.schema.names)
        arrays = [
            batch.column(n) if n != "zs"
            else pa.array(new_zs, pa.list_(pa.int64()))
            for n in names
        ]
        return pa.Table.from_arrays(arrays, names=names)

    return table.map_batches(scan, batch_format="pyarrow")


def plsa_train(ds, k: int = 6, iters: int = 3, vocab_limit: int = 2_000_000,
               text_col: str = "text", doc_col: str = "doc_id",
               num_partitions=None):
    """Train hard-EM PLSA; returns the final assignment table (one row
    per doc, materialized).  Per iteration: ONE bounded (word x topic)
    exchange + one broadcast + one shuffle-free scan; the table is
    re-materialized each iteration for flat lineage (the bpe
    distributed-loop discipline)."""
    import ray

    table = build_plsa_table(ds, k, text_col, doc_col).materialize()
    for _ in range(iters):
        wz = topic_word_counts(table, k, num_partitions).to_pandas()
        if wz.empty:
            break
        w_ref = ray.put(_weights(wz, k, vocab_limit))
        table = _reassign(table, w_ref, k).materialize()
    return table


def doc_topics(table, k: int, doc_col: str = "doc_id"):
    """Per-doc dominant topic from the assignment table: (doc_id,
    topic, topic_tokens, total_tokens), ties -> lowest z.  Scan-only."""
    def scan(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        top, tt, tot = [], [], []
        for os_, zs in zip(df["occs"], df["zs"]):
            if len(zs) == 0:
                top.append(-1)
                tt.append(0)
                tot.append(0)
                continue
            occ = np.asarray(os_, dtype=np.int64)
            zarr = np.asarray(zs, dtype=np.int64)
            ndz = np.bincount(zarr, weights=occ.astype(np.float64),
                              minlength=k).astype(np.int64)
            z = int(np.argmax(ndz))
            top.append(z)
            tt.append(int(ndz[z]))
            tot.append(int(occ.sum()))
        return pa.Table.from_arrays(
            [
                batch.column(doc_col),
                pa.array(top, pa.int64()),
                pa.array(tt, pa.int64()),
                pa.array(tot, pa.int64()),
            ],
            names=[doc_col, "topic", "topic_tokens", "total_tokens"],
        )

    return table.map_batches(scan, batch_format="pyarrow")


def topic_top_words(table, k: int, m: int = 10, num_partitions=None):
    """Top-``m`` words per topic by final count (c desc, word asc) —
    reduced from the same bounded exchange, coalesced final."""
    from docstrange_ray.shuffle import coalesced_blocks

    wz = topic_word_counts(table, k, num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["z", "c", "w"],
                            ascending=[True, False, True])
        out = df.groupby("z", as_index=False).head(m)
        out["rank"] = out.groupby("z").cumcount() + 1
        return out[["z", "rank", "w", "c"]].reset_index(drop=True)

    return coalesced_blocks(wz, final)
