"""EXACT sparse TF-IDF cosine similarity self-join with AllPairs
prefix filtering (Bayardo, Ma & Srikant WWW'07 — "Scaling Up All
Pairs Similarity Search") — the lexical-vector complement to the
set-based `jaccard_join` and the dense `cosine_join_exact`: document
similarity under idf weighting, where a shared RARE word counts and a
shared stop word is worth ~nothing. This is the similarity measure
plagiarism / template detection actually wants (Jaccard dilutes rare
overlap by total vocabulary; dense embeddings need a model).

Exactness discipline (the repo's SQL-oracle contract):

* tokens: lowercase whitespace words (the corpus-wide convention,
  shared with the tf-idf / BM25 ops and mirrored by
  ``regexp_split_to_array(lower(text), '\\s+')`` in every oracle);
* idf quantized ONCE to integer units: ``idf_u = floor(ln(N/df) *
  idf_q + 0.5)`` — ln(N/df) >= 0 so half-away == floor(x+0.5), and
  ``math.log`` is bit-equal to DuckDB ``LN`` on the same double (the
  ops/dsir pin); weight ``w = tf * idf_u`` is an exact int64;
* dot products and norms are integer sums of int64 products,
  accumulated in PYTHON ints (never float) — no 2^53 ceiling;
* the threshold cut is the integer predicate ``den^2 * dot^2 >=
  num^2 * n2a * n2b`` in arbitrary-precision ints (the
  cosine_join_exact two-tier idiom, minus the float pre-cut — sparse
  dots are computed exactly anyway);
* emitted ``cos6`` = round6(dot / sqrt(float(n2a) * float(n2b))) —
  IEEE mult/sqrt/div are correctly rounded, so DuckDB reproduces the
  bits from the same integers.

Prefix-filter lemma (why the join is subquadratic without losing a
pair): fix a global term order (here: (md5_key52(term), term) — the
house hash order, no extra pass). For document d let the SUFFIX S_d
be the maximal tail of its ordered term list with
``||S_d||^2 * den^2 < num^2 * ||d||^2`` (exact integers). If a pair
(a, b) shares ONLY terms inside S_a, then by Cauchy-Schwarz
``dot(a,b) <= ||S_a|| * ||b||``, so ``cos(a,b) <= ||S_a|| / ||a|| <
t`` — below threshold. Hence every qualifying pair shares at least
one term lying in a's PREFIX (and symmetrically b's): indexing only
prefix terms and probing with all terms generates a candidate
superset. Stop words get tiny idf weights, land in every suffix, and
never open a posting pair — tf-idf's natural hot-key suppression,
doing the job `jaccard_join` needs Misra-Gries demotion for.

Scale shape (6 bounded exchanges, no driver vocabulary, no
broadcast): term-df exchange (vocab-scale, Heaps-bounded) ->
co-partition idf attach keyed term -> doc regroup keyed doc (norm +
prefix marking, block-local per doc) -> candidate exchange keyed term
(prefix x all per posting, pre-deduped per block) -> the shared
verify tail: membership join keyed doc + pair exchange computing the
exact dot from both full vectors.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import md5_key52, round6


def _term_counts(batch: pa.Table, id_col: str, text_col: str) -> pd.DataFrame:
    ids, terms, tfs = [], [], []
    for i, t in zip(
        batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
    ):
        counts: dict[str, int] = {}
        for w in (t or "").lower().split():
            counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            ids.append(int(i))
            terms.append(w)
            tfs.append(c)
    return pd.DataFrame(
        {
            "doc": pd.Series(ids, dtype=np.int64),
            "term": pd.Series(terms, dtype=object),
            "tf": pd.Series(tfs, dtype=np.int64),
        }
    )


def tfidf_cosine_join(
    ds,
    threshold_num: int = 35,
    threshold_den: int = 100,
    idf_q: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions=None,
):
    """Dataset[(a, b, dot_q, cos6)] with a < b: every document pair
    whose quantized tf-idf cosine >= threshold_num/threshold_den,
    with the exact integer dot and the deterministic rounded cosine.
    See module docstring for the exactness + prefix-filter plan."""
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    n_docs = int(ds.count())
    if n_docs == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "dot_q": pa.array([], pa.int64()),
                    "cos6": pa.array([], pa.float64()),
                }
            )
        )

    postings = ds.map_batches(
        arrow_out(lambda b: _term_counts(b, id_col, text_col)),
        batch_format="pyarrow",
    )

    # exchange 1: exact df per term (pre-reduced per block)
    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", as_index=False).size()
        g.columns = ["term", "df"]
        return g.astype({"df": np.int64})

    def df_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False)["df"].sum()

    dfs = grouped_blocks(
        postings.map_batches(arrow_out(df_partial), batch_format="pandas"),
        ["term"],
        df_final,
        num_partitions,
        batch_format="pandas",
    ).materialize()

    # exchange 2: attach idf to postings, co-partitioned by term —
    # the vocabulary never visits the driver (Heaps-bounded but
    # corpus-scale at 100 TB; a broadcast map would not hold)
    def idf_rows(batch: pa.Table) -> pd.DataFrame:
        d = batch.to_pandas()
        idf = np.array(
            [
                int(math.floor(math.log(n_docs / int(x)) * idf_q + 0.5))
                for x in d["df"]
            ],
            dtype=np.int64,
        )
        return pd.DataFrame({"term": d["term"], "idf_u": idf})

    weighted = hash_join(
        postings.materialize(),
        dfs.map_batches(arrow_out(idf_rows), batch_format="pyarrow"),
        key="term",
        num_partitions=num_partitions,
    )

    # exchange 3: regroup by doc — norm2 + prefix marking block-local
    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "th": pd.Series([], dtype=np.int64),
                    "doc": pd.Series([], dtype=np.int64),
                    "w": pd.Series([], dtype=np.int64),
                    "n2": pd.Series([], dtype=np.int64),
                    "pre": pd.Series([], dtype=np.int8),
                }
            )
        df = df.assign(
            w=df["tf"].to_numpy(np.int64) * df["idf_u"].to_numpy(np.int64),
            th=np.fromiter(
                (md5_key52(t) for t in df["term"]),
                dtype=np.int64,
                count=len(df),
            ),
        )
        out = []
        tn2 = threshold_num * threshold_num
        td2 = threshold_den * threshold_den
        for doc, g in df.groupby("doc", sort=False):
            g = g.sort_values(["th", "term"])
            w = [int(x) for x in g["w"]]
            n2 = sum(x * x for x in w)
            if n2 == 0:
                continue  # all-stop-word doc: zero vector, no cosine
            # maximal suffix with ||S||^2 * den^2 < num^2 * ||d||^2
            # (exact ints); everything before it is the PREFIX
            suf2 = 0
            cut = len(w)  # first index belonging to the suffix
            for i in range(len(w) - 1, -1, -1):
                if (suf2 + w[i] * w[i]) * td2 < tn2 * n2:
                    suf2 += w[i] * w[i]
                    cut = i
                else:
                    break
            th = g["th"].to_numpy(np.int64)
            pre = np.zeros(len(w), dtype=np.int8)
            pre[:cut] = 1
            out.append(
                pd.DataFrame(
                    {
                        "th": th,
                        "doc": np.full(len(w), int(doc), dtype=np.int64),
                        "w": np.array(w, dtype=np.int64),
                        "n2": np.full(len(w), n2, dtype=np.int64),
                        "pre": pre,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    docvecs = grouped_blocks(
        weighted, ["doc"], doc_rows, num_partitions, batch_format="pandas"
    ).materialize()

    # exchange 4: candidate pairs per term — prefix postings x all
    # postings (the AllPairs index/probe split), deduped per block
    def cand_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id_a": pd.Series([], dtype=np.int64),
                "doc_id_b": pd.Series([], dtype=np.int64),
            }
        )
        if df.empty:
            return empty
        pre = df.loc[df["pre"] == 1, ["th", "doc"]]
        if pre.empty:
            return empty
        m = pre.merge(
            df[["th", "doc"]], on="th", suffixes=("_p", "_q")
        )
        m = m[m["doc_p"] != m["doc_q"]]
        if m.empty:
            return empty
        dp = m["doc_p"].to_numpy(np.int64)
        dq = m["doc_q"].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "doc_id_a": np.minimum(dp, dq),
                "doc_id_b": np.maximum(dp, dq),
            }
        )
        return out.drop_duplicates()

    cands = grouped_blocks(
        docvecs, ["th"], cand_block, num_partitions, batch_format="pandas"
    )

    # verify tail: membership join keyed doc + pair exchange with the
    # exact integer dot from both full vectors (exchanges 5 + 6)
    def explode_membership(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id_a").combine_chunks()
        b = batch.column("doc_id_b").combine_chunks()
        n = len(a)
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([a, b]),
                pa.concat_arrays([a, a]),
                pa.concat_arrays([b, b]),
            ],
            names=["doc", "pa_", "pb_"],
        )

    members = cands.map_batches(explode_membership, batch_format="pyarrow")
    attached = hash_join(
        members.materialize(),
        docvecs.map_batches(
            lambda t: t.select(["doc", "th", "w", "n2"]),
            batch_format="pyarrow",
        ).materialize(),
        key="doc",
        num_partitions=num_partitions,
    )

    tn2 = threshold_num * threshold_num
    td2 = threshold_den * threshold_den

    t_float = threshold_num / threshold_den

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "dot_q": pd.Series([], dtype=np.int64),
                "cos6": pd.Series([], dtype=np.float64),
            }
        )
        if df.empty:
            return empty
        # a pair reached the candidate exchange once PER sharing
        # prefix term (different blocks can't see each other), so its
        # membership rows arrive duplicated — (doc, th) is unique
        # within a real vector, so this dedup is exact
        df = df.drop_duplicates(["pa_", "pb_", "doc", "th"])
        A = df[df["doc"] == df["pa_"]]
        B = df[df["doc"] == df["pb_"]]
        # exact int dot via a merge-join on shared terms (weights and
        # norms are < 2^53 by the idf_q quantization bound, so the
        # int64 product/sum chain is exact)
        m = A[["pa_", "pb_", "th", "w"]].merge(
            B[["pa_", "pb_", "th", "w"]],
            on=["pa_", "pb_", "th"],
            suffixes=("_a", "_b"),
        )
        if m.empty:
            return empty
        m = m.assign(
            prod=m["w_a"].to_numpy(np.int64) * m["w_b"].to_numpy(np.int64)
        )
        dots = m.groupby(["pa_", "pb_"], as_index=False)["prod"].sum()
        n2a = A.groupby(["pa_", "pb_"], as_index=False)["n2"].first()
        n2b = B.groupby(["pa_", "pb_"], as_index=False)["n2"].first()
        j = dots.merge(n2a, on=["pa_", "pb_"]).merge(
            n2b, on=["pa_", "pb_"], suffixes=("_a", "_b")
        )
        dot = j["prod"].to_numpy(np.int64)
        fa = j["n2_a"].to_numpy(np.int64).astype(np.float64)
        fb = j["n2_b"].to_numpy(np.int64).astype(np.float64)
        cosf = dot.astype(np.float64) / np.sqrt(fa * fb)
        # two-tier cut: the float comparison is reliable outside a
        # ~1e-9 band (dot/n2 are exact in float64: < 2^53); only
        # borderline rows get the arbitrary-precision int predicate
        keep = cosf >= t_float - 1e-9
        j = j[keep]
        cosf = cosf[keep]
        border = np.abs(cosf - t_float) < 2e-9
        if border.any():
            dots_b = j["prod"].to_numpy(np.int64)
            na_b = j["n2_a"].to_numpy(np.int64)
            nb_b = j["n2_b"].to_numpy(np.int64)
            ok = np.ones(len(j), dtype=bool)
            for i in np.nonzero(border)[0]:
                d = int(dots_b[i])
                ok[i] = d >= 0 and td2 * d * d >= tn2 * int(na_b[i]) * int(
                    nb_b[i]
                )
            j = j[ok]
            cosf = cosf[ok]
        if j.empty:
            return empty
        return pd.DataFrame(
            {
                "a": j["pa_"].to_numpy(np.int64),
                "b": j["pb_"].to_numpy(np.int64),
                "dot_q": j["prod"].to_numpy(np.int64),
                "cos6": round6(
                    j["prod"].to_numpy(np.int64).astype(np.float64)
                    / np.sqrt(
                        j["n2_a"].to_numpy(np.int64).astype(np.float64)
                        * j["n2_b"].to_numpy(np.int64).astype(np.float64)
                    )
                ),
            }
        )

    return grouped_blocks(
        attached, ["pa_", "pb_"], verify, num_partitions,
        batch_format="pandas",
    )
