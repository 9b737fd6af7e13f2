"""Composed corpus-curation pipeline: quality filter → exact dedup.

The end-to-end shape of a training-data cleaning job: score and
fingerprint every document in ONE stateless pass (no intermediate
materialization), filter below-threshold docs before anything moves,
then exact-dedup the survivors with ONE content-hash shuffle
(first-wins). Only filtered (doc_id, content_md5, quality) triples ever
cross the exchange — never document text.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from docstrange_ray.ops.textstats import content_fingerprint, quality_score


def curated_docs(ds, min_quality: float = 0.5, num_partitions: int | None = None):
    """Dataset[(doc_id, text)] -> Dataset[(doc_id, content_md5, quality)]
    of kept documents: quality >= min_quality AND first (min doc_id) of
    its exact-content group."""
    from docstrange_ray.shuffle import grouped_blocks

    def score_fp_filter(batch: pa.Table) -> pd.DataFrame:
        scored = quality_score(batch)
        fp = content_fingerprint(batch)
        t = pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                fp.column("content_md5"),
                scored.column("quality"),
            ],
            names=["doc_id", "content_md5", "quality"],
        )
        df = t.filter(pc.greater_equal(t.column("quality"), min_quality)).to_pandas()
        # hot-key safety: local first-wins per batch bounds any one
        # content hash to n_batches rows through the exchange
        return df.sort_values(["content_md5", "doc_id"]).drop_duplicates(
            "content_md5", keep="first"
        )

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["content_md5", "doc_id"]).drop_duplicates(
            "content_md5", keep="first"
        )[["doc_id", "content_md5", "quality"]]

    filtered = ds.map_batches(score_fp_filter, batch_format="pyarrow")
    return grouped_blocks(
        filtered, ["content_md5"], keep_first, num_partitions, batch_format="pandas"
    )


def curated_docs_full(
    ds,
    min_quality: float = 0.5,
    max_hamming: int = 3,
    num_partitions: int | None = None,
):
    """The FULL curation chain of a training-data pipeline, end-to-end
    distributed and (via the `curated_full` driver query) end-to-end
    SQL-oracled: quality floor → exact dedup (first-wins per content
    hash) → SimHash near-dup drop (each surviving near-dup cluster
    keeps its min-id representative).

    Exchange budget — document text NEVER crosses an exchange:
      1. ONE content_md5 shuffle over per-batch-partialed
         (doc_id, md5, quality, simhash) metadata tuples (the simhash
         rides along so the near-dup stage needs no second text scan);
      2. ONE segment shuffle over the exact-dedup winners' signatures
         (pigeonhole blocking) + the pair-scale label-propagation
         exchanges of :func:`dedup.dup_clusters_ds`;
      3. ONE doc_id shuffle anti-joining the drop list (id-scale).

    Winners materialize once (metadata-width rows) because two
    consumers read them — the deep-lazy-plan re-execution trap from the
    round-2 notes. Returns Dataset[(doc_id, content_md5, quality)]."""
    import numpy as np

    from docstrange_ray.ops.dedup import (
        _simhash_values,
        dup_clusters_ds,
        simhash_pairs_from_sigs,
    )
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def pass_a(batch: pa.Table) -> pd.DataFrame:
        scored = quality_score(batch)
        fp = content_fingerprint(batch)
        sims = _simhash_values(batch.column("text").to_pylist())
        t = pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                fp.column("content_md5"),
                scored.column("quality"),
                pa.array(sims, type=pa.int64()),
            ],
            names=["doc_id", "content_md5", "quality", "simhash"],
        )
        df = t.filter(pc.greater_equal(t.column("quality"), min_quality)).to_pandas()
        return df.sort_values(["content_md5", "doc_id"]).drop_duplicates(
            "content_md5", keep="first"
        )

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["content_md5", "doc_id"]).drop_duplicates(
            "content_md5", keep="first"
        )[["doc_id", "content_md5", "quality", "simhash"]]

    winners = grouped_blocks(
        ds.map_batches(arrow_out(pass_a), batch_format="pyarrow"),
        ["content_md5"],
        keep_first,
        num_partitions,
        batch_format="pandas",
    ).materialize()

    pairs = simhash_pairs_from_sigs(
        winners.select_columns(["doc_id", "simhash"]), max_hamming, num_partitions
    ).materialize()  # pair-scale; consumed by count + clustering
    if pairs.count() == 0:  # no near-dups: winners are final
        return winners.select_columns(["doc_id", "content_md5", "quality"])
    labels = dup_clusters_ds(pairs, num_partitions=num_partitions)

    def drop_rows(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(batch.column("node"), batch.column("label")))
        t = batch.filter(keep)
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t.column("node"),
                pa.nulls(n, type=pa.string()),
                pa.nulls(n, type=pa.float64()),
                pa.array(np.ones(n, dtype=np.int8)),
            ],
            names=["doc_id", "content_md5", "quality", "dropped"],
        )

    def tag_winners(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("content_md5"),
                batch.column("quality"),
                pa.array(np.zeros(n, dtype=np.int8)),
            ],
            names=["doc_id", "content_md5", "quality", "dropped"],
        )

    tagged = winners.map_batches(tag_winners, batch_format="pyarrow").union(
        labels.map_batches(drop_rows, batch_format="pyarrow")
    )

    def anti_join(df: pd.DataFrame) -> pd.DataFrame:
        dropped_ids = set(df.loc[df["dropped"] == 1, "doc_id"])
        out = df[(df["dropped"] == 0) & (~df["doc_id"].isin(dropped_ids))]
        return out[["doc_id", "content_md5", "quality"]]

    return grouped_blocks(
        tagged, ["doc_id"], anti_join, num_partitions, batch_format="pandas"
    )


def ccnet_buckets(ds, num_partitions: int | None = None):
    """CCNet-style quality bucketing (Wenzek et al. 2020, arXiv:
    1911.00359 — the CommonCrawl curation recipe): language-ID every
    document, score it with the bigram-LM cross-entropy
    (:func:`docstrange_ray.ops.textstats.lm_score` — the in-corpus
    stand-in for CCNet's KenLM), and split each LANGUAGE into
    head/middle/tail at the per-language score TERCILES (CCNet keeps
    head+middle for training; low bits = fluent).

    Plan (all bounded):
      1. lang-ID — shuffle-free actor-pool scan.
      2. lm_score — its own bounded plan (pruned count shuffle +
         broadcast-or-join gate).
      3. ONE doc_id co-partition join of (lang) x (score).
      4. per-language terciles via the value-count histogram exchange
         (:func:`rankstats.group_quantiles` exactness contract —
         positions ceil(q*n) in integer arithmetic, quantile_disc
         parity) over the score QUANTIZED to 3 dp (half-away). The
         quantization is what bounds the exchange: a continuous score
         ships ~one distinct value per doc, but bits-per-bigram lives
         in ~[0, 40], so 3 dp caps the histogram at ~40k values per
         language no matter the corpus size — CCNet itself takes
         percentiles from a binned histogram for the same reason.
      5. the tiny (n_langs x 2) threshold table broadcasts; bucketing
         is a shuffle-free final scan on the SAME quantized value.

    Returns Dataset[(doc_id, pred_lang, bits_per_bigram, bucket)] with
    bucket in {'head','middle','tail'}: head iff round3(score) <= p33,
    middle iff <= p66, else tail. Docs with < 2 words have no score and
    are omitted (the lm_score contract)."""
    import ray

    from docstrange_ray.numerics import round_half_away
    from docstrange_ray.ops.rankstats import group_quantiles
    from docstrange_ray.ops.textstats import LangId, lm_score
    from docstrange_ray.shuffle import hash_join

    lang = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    scores = lm_score(ds, num_partitions=num_partitions)
    joined = hash_join(
        lang.materialize(), scores.materialize(), key="doc_id",
        num_partitions=num_partitions,
    ).materialize()

    def add_quantized(batch: pa.Table) -> pa.Table:
        import numpy as np

        qs = round_half_away(
            np.asarray(batch.column("bits_per_bigram"), dtype=np.float64), 3
        )
        return batch.append_column("qs", pa.array(qs, type=pa.float64()))

    quantized = joined.map_batches(add_quantized, batch_format="pyarrow")
    th_rows = group_quantiles(
        quantized, "pred_lang", "qs",
        quantiles=((1, 3), (2, 3)), num_partitions=num_partitions,
    ).take_all()  # bounded: one row per language
    th = {r["pred_lang"]: (float(r["p33"]), float(r["p66"])) for r in th_rows}
    ref = ray.put(th)

    def bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        t = ray.get(ref)
        langs = batch.column("pred_lang").to_pylist()
        qs = round_half_away(
            np.asarray(batch.column("bits_per_bigram"), dtype=np.float64), 3
        )
        buckets = []
        for lg, s in zip(langs, qs):
            t1, t2 = t[lg]
            buckets.append("head" if s <= t1 else ("middle" if s <= t2 else "tail"))
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("pred_lang"),
                batch.column("bits_per_bigram"),
                pa.array(buckets, type=pa.string()),
            ],
            names=["doc_id", "pred_lang", "bits_per_bigram", "bucket"],
        )

    return joined.map_batches(bucket, batch_format="pyarrow")


# --- C4 line-level cleaning ---------------------------------------------------


def c4_clean(ds, min_kept_lines: int = 5, min_words: int = 3):
    """C4's line-level cleaning rules (Raffel et al. 2020 §2.2 — the
    recipe that produced the C4 corpus), as ONE shuffle-free vectorized
    batch pass (the op is embarrassingly parallel: every rule is
    per-line or per-document, so nothing ever crosses an exchange and
    the stage streams at read speed at any corpus size):

      line level (a line = a ``\\n``-separated segment, stripped):
        * keep only lines ending in a terminal punctuation mark
          (``. ! ? "``);
        * keep only lines with at least ``min_words`` words;
        * drop any line containing the word "javascript" (case-folded
          substring, as C4 does);
      document level:
        * drop the whole document if it contains a curly bracket
          (``{``) or the phrase "lorem ipsum" (case-folded);
        * drop the document if fewer than ``min_kept_lines`` lines
          survive — the paper's "fewer than 5 sentences" rule, with
          sentence = retained line (every retained line ends in
          terminal punctuation, so at fixture granularity the two
          coincide; documented contract).

    Returns Dataset[(doc_id, clean_text, n_kept, n_total)] of surviving
    documents: ``clean_text`` = the stripped kept lines re-joined with
    ``\\n`` in original order, ``n_kept``/``n_total`` = kept / original
    line counts (int64). The reference has no corpus-curation stage at
    all — this family is the training-data extension (SURVEY §2 LLM-ops
    block)."""
    import pandas as pd

    def clean(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "text"]).to_pandas()
        low_doc = df["text"].str.lower()
        bad_doc = df["text"].str.contains("{", regex=False) | low_doc.str.contains(
            "lorem ipsum", regex=False
        )
        lines = (
            df.set_index("doc_id")["text"].str.split("\n").explode().str.strip()
        )
        n_total = lines.groupby(level=0, sort=False).size()
        n_words = lines.str.split().str.len().fillna(0)
        keep = (
            lines.str.slice(-1).isin([".", "!", "?", '"'])
            & (n_words >= min_words)
            & ~lines.str.lower().str.contains("javascript", regex=False)
        )
        kept = lines[keep]
        agg = kept.groupby(level=0, sort=False).agg(["count", "\n".join])
        agg.columns = ["n_kept", "clean_text"]
        out = (
            df[~bad_doc.values][["doc_id"]]
            .merge(agg, left_on="doc_id", right_index=True)
            .merge(n_total.rename("n_total"), left_on="doc_id", right_index=True)
        )
        out = out[out["n_kept"] >= min_kept_lines]
        return pa.Table.from_arrays(
            [
                pa.array(out["doc_id"], type=batch.schema.field("doc_id").type),
                pa.array(out["clean_text"], type=pa.string()),
                pa.array(out["n_kept"].astype("int64")),
                pa.array(out["n_total"].astype("int64")),
            ],
            names=["doc_id", "clean_text", "n_kept", "n_total"],
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def _doc_lines(batch: pa.Table) -> pd.DataFrame:
    """(doc_id, j, line) rows for every ``\\n``-separated segment of
    every document in the batch, ``j`` = 0-based line position. Line
    identity is the EXACT raw segment (no strip/casefold) — the same
    contract DuckDB's string_split gives the oracle. An empty text
    yields one empty line (Python and DuckDB split agree)."""
    df = batch.select(["doc_id", "text"]).to_pandas()
    s = df.set_index("doc_id")["text"].str.split("\n").explode()
    out = pd.DataFrame({"doc_id": s.index.to_numpy(), "line": s.to_numpy()})
    out["j"] = out.groupby("doc_id", sort=False).cumcount().astype("int64")
    return out


def line_df_table(ds, min_df: int = 2, num_partitions: int | None = None):
    """Corpus-wide line document frequency — the measurement half of
    RefinedWeb/Dolma line-level boilerplate removal (Penedo et al. 2023
    §3.3 strip navigation/cookie/footer lines that recur across many
    pages; Dolma's paragraph-frequency filter is the same shape one
    granularity up). Returns Dataset[(line, df)] for lines whose
    document frequency (COUNT DISTINCT doc) >= ``min_df``.

    Scale shape: each batch PRE-REDUCES to one (line, partial_df) row
    per distinct line — per-doc duplicates collapse batch-locally
    (each doc is one input row, so doc-distinctness is exact locally) —
    then ONE line-keyed exchange sums partials. A line pasted on every
    page of the corpus ships n_batches rows, never n_docs. The output
    is bounded: sum(df) over emitted lines <= total (doc, line) pairs,
    so |output| <= pairs / min_df."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def partial(batch: pa.Table) -> pd.DataFrame:
        out = _doc_lines(batch).drop_duplicates(["doc_id", "line"])
        part = out.groupby("line", as_index=False, sort=False).size()
        part.columns = ["line", "df"]
        return part

    def final(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("line", as_index=False, sort=False)["df"].sum()
        return tot[tot["df"] >= min_df]

    return grouped_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow"),
        ["line"],
        final,
        num_partitions,
        batch_format="pandas",
    )


def strip_boilerplate_lines(
    ds,
    min_df: int = 100,
    plan: str = "auto",
    broadcast_line_limit: int = 2_000_000,
    num_partitions: int | None = None,
):
    """Remove every line whose corpus document frequency >= ``min_df``
    (the RefinedWeb boilerplate strip: cookie banners, nav bars,
    share-button rows recur verbatim across pages; genuine prose does
    not). Surviving lines are re-joined with ``\\n`` in original order;
    documents keeping zero lines emit no row (same contract as
    :func:`docstrange_ray.ops.dedup.passage_dedup`). Returns
    Dataset[(doc_id, clean_text, n_removed)].

    Plans (measure-then-choose, the tf-idf idiom): the hot-line table
    from :func:`line_df_table` is materialized and counted — its row
    count is bounded by pairs/min_df, but a pathological corpus of
    hot MEGABYTE lines could still be byte-heavy, hence the gate.
    Below ``broadcast_line_limit`` rows the hot set broadcasts once
    (``ray.put``) and the strip is a shuffle-free scan. Above it, an
    anti-join plan: lines explode once, ONE line-keyed co-partition
    left join against the hot table keeps only unmatched lines, ONE
    doc_id exchange reassembles — corpus text crosses both exchanges
    (the honest price; decision-only metadata cannot rebuild the doc).
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, grouped_blocks, hash_join

    hot = line_df_table(ds, min_df, num_partitions).materialize()
    if plan == "auto":
        plan = "broadcast" if hot.count() <= broadcast_line_limit else "join"

    if plan == "broadcast":
        hot_ref = ray.put({r["line"] for r in hot.take_all()})

        def strip(batch: pa.Table, _ref=hot_ref) -> pd.DataFrame:
            hot_set = ray.get(_ref)
            lines = _doc_lines(batch)
            lines["keep"] = ~lines["line"].isin(hot_set)
            agg = lines.groupby("doc_id", sort=False).agg(
                n_total=("keep", "size"), n_kept=("keep", "sum")
            )
            kept = lines[lines["keep"]]
            text = kept.groupby("doc_id", sort=False)["line"].agg("\n".join)
            out = agg[agg["n_kept"] > 0].join(text.rename("clean_text"))
            out = out.reset_index()
            out["n_removed"] = (out["n_total"] - out["n_kept"]).astype("int64")
            return out[["doc_id", "clean_text", "n_removed"]]

        return ds.map_batches(arrow_out(strip), batch_format="pyarrow")

    # ---- join (scale) plan ----
    exploded = ds.map_batches(arrow_out(_doc_lines), batch_format="pyarrow")
    joined = hash_join(exploded, hot, key="line", how="left", num_partitions=num_partitions)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "j"], kind="mergesort")
        df["keep"] = df["df"].isna()
        agg = df.groupby("doc_id", sort=False).agg(
            n_total=("keep", "size"), n_kept=("keep", "sum")
        )
        text = df[df["keep"]].groupby("doc_id", sort=False)["line"].agg("\n".join)
        out = agg[agg["n_kept"] > 0].join(text.rename("clean_text")).reset_index()
        out["n_removed"] = (out["n_total"] - out["n_kept"]).astype("int64")
        return out[["doc_id", "clean_text", "n_removed"]]

    return grouped_blocks(
        joined, ["doc_id"], reassemble, num_partitions, batch_format="pandas"
    )
