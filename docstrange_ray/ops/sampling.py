"""Deterministic corpus sampling.

``ds.random_shuffle`` / ``random_sample`` are seed-dependent and
ordering-dependent across cluster sizes; a 10^12-doc training pipeline
needs samples that are REPRODUCIBLE and resumable — a pure function of
the row key. ``hash_sample`` keeps a row iff the first 4 hex chars of
md5(key) fall below the fraction threshold: stable across processes,
partitionings and cluster sizes, trivially SQL-expressible for the
oracle, and composable (disjoint fractions -> disjoint splits).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from docstrange_ray.numerics import round6


def _threshold_hex(fraction: float) -> str:
    """4-hex-char threshold compared lexicographically against md5
    prefixes. fraction >= 1.0 maps to 'g' — a character above every hex
    digit — so the comparison keeps ALL rows (the naive '10000' is
    5 chars and lexicographically BELOW most 4-char prefixes, which
    would silently keep only ~6% of rows at the full-fraction edge)."""
    n = int(fraction * 65536)
    if n >= 65536:
        return "g"
    return format(max(0, n), "04x")


def hash_sample(ds, fraction: float, key: str = "doc_id"):
    """Deterministic Bernoulli sample of ~``fraction`` of rows by key
    hash. SQL equivalent:
    ``WHERE substr(md5(CAST(key AS VARCHAR)), 1, 4) < '<hex threshold>'``."""
    thr = _threshold_hex(fraction)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [
                hashlib.md5(str(k).encode("utf-8")).hexdigest()[:4] < thr
                for k in batch.column(key).to_pylist()
            ]
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_cap(
    ds,
    strata_key: str,
    cap: int,
    id_key: str = "doc_id",
    num_partitions: int | None = None,
):
    """Balanced subsampling: keep at most ``cap`` rows per stratum
    (source / language / domain), chosen DETERMINISTICALLY as the cap
    lowest md5(id) hashes within each stratum — stable across cluster
    sizes and resumable, like every sampler here.

    Hot-stratum safe by partial reduction: each batch locally keeps its
    cap lowest-hash rows per stratum BEFORE the exchange, so a stratum
    with a billion rows ships ``n_batches x cap`` candidate rows — never
    the stratum — through the ONE strata-key shuffle; the block-local
    final applies the same rule to the candidates. SQL equivalent:
    ``ROW_NUMBER() OVER (PARTITION BY strata ORDER BY md5(id), id) <= cap``.
    Returns Dataset[(strata_key, id_key, sample_rank)]."""
    import pandas as pd

    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def local_cap(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                strata_key: batch.column(strata_key).to_pylist(),
                id_key: batch.column(id_key).to_pylist(),
            }
        )
        df["__h"] = [
            hashlib.md5(str(k).encode("utf-8")).hexdigest() for k in df[id_key]
        ]
        return (
            df.sort_values(["__h", id_key])
            .groupby(strata_key, as_index=False, sort=False)
            .head(cap)
        )

    def final_cap(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(["__h", id_key])
            .groupby(strata_key, as_index=False, sort=False)
            .head(cap)
            .sort_values([strata_key, "__h", id_key])
        )
        out["sample_rank"] = out.groupby(strata_key, sort=False).cumcount() + 1
        return out[[strata_key, id_key, "sample_rank"]]

    candidates = ds.map_batches(arrow_out(local_cap), batch_format="pyarrow")
    return grouped_blocks(
        candidates, [strata_key], final_cap, num_partitions, batch_format="pandas"
    )


def hash_split(ds, train_fraction: float, key: str = "doc_id"):
    """Deterministic train/holdout split: (train_ds, holdout_ds), disjoint
    and exhaustive, stable under any re-partitioning. Each side is its
    own lazy Dataset (the input plan is shared; two consumers)."""
    thr = _threshold_hex(train_fraction)

    def side(below: bool):
        def keep(batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [
                    (hashlib.md5(str(k).encode("utf-8")).hexdigest()[:4] < thr) == below
                    for k in batch.column(key).to_pylist()
                ]
            )
            return batch.filter(mask)

        return keep

    return (
        ds.map_batches(side(True), batch_format="pyarrow"),
        ds.map_batches(side(False), batch_format="pyarrow"),
    )


def source_mix(
    ds,
    weights: dict[str, int],
    key: str = "doc_id",
    source_col: str = "source",
):
    """Domain-mix resampling: downsample per-source so the output
    approximates the integer ``weights`` proportions (the training-mix
    reweighting step of every LLM data recipe — e.g. The Pile / Gopher
    table-of-mixtures). Never upsamples: the binding source (largest
    weight per available row) is kept whole and every other source's
    acceptance rate derives from it.

    Scale shape: phase 1 is a per-source COUNT (per-batch partial
    reduce, tiny key space — one small aggregate, the corpus never
    moves); the per-source thresholds are broadcast and phase 2 is a
    shuffle-free filter scan.

    Determinism: acceptance is the pure-function rule
    ``uint32(md5(str(key))[:8]) < t_s`` with ``t_s`` computed in EXACT
    integer arithmetic — ``t_s = (2^32 * w_s * n_m) // (w_m * n_s)``
    where ``m`` is the binding source (exact-fraction argmin of
    ``n_s/w_s``, ties to the smallest source name). Python bigints here,
    HUGEINT in the SQL oracle: no float boundary can flip a row.
    Target sources absent from the corpus are ignored (nothing to
    supply); sources without a weight are dropped.

    Returns Dataset[(key, source_col)].
    """
    import pandas as pd

    from docstrange_ray.shuffle import adaptive_final

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({source_col: batch.column(source_col).to_pylist()})
        return (
            df.groupby(source_col, as_index=False).size().rename(columns={"size": "n"})
        )

    counts = (
        adaptive_final(
            ds.map_batches(count_partial, batch_format="pyarrow"),
            lambda df: df.groupby(source_col, as_index=False)["n"].sum(),
            keys=[source_col],
        ).to_pandas()
    )
    n_by_src = {
        str(r[source_col]): int(r["n"])
        for _, r in counts.iterrows()
        if str(r[source_col]) in weights
    }
    if not n_by_src:
        return ds.filter(lambda r: False).select_columns([key, source_col])

    # binding source: exact-fraction argmin of n_s / w_s
    def frac_lt(a, b):  # n_a/w_a < n_b/w_b  <=>  n_a*w_b < n_b*w_a
        return n_by_src[a] * weights[b] < n_by_src[b] * weights[a]

    msrc = None
    for s in sorted(n_by_src):
        if msrc is None or frac_lt(s, msrc):
            msrc = s
    thresholds = {
        s: (2**32 * weights[s] * n_by_src[msrc]) // (weights[msrc] * n_by_src[s])
        for s in n_by_src
    }

    def keep(batch: pa.Table) -> pa.Table:
        srcs = batch.column(source_col).to_pylist()
        keys = batch.column(key).to_pylist()
        mask = pa.array(
            [
                s in thresholds
                and int(hashlib.md5(str(k).encode("utf-8")).hexdigest()[:8], 16)
                < thresholds[s]
                for k, s in zip(keys, srcs)
            ]
        )
        return batch.filter(mask).select([key, source_col])

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(ds, k: int, weight_col: str, id_col: str = "doc_id"):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES,
    IPL 2006): each row gets priority u^(1/w) with u a DETERMINISTIC
    md5-derived uniform of its id, and the sample is the global top-k by
    priority — inclusion probability proportional to weight, yet fully
    reproducible across processes, batchings and cluster sizes (u is a
    pure function of the id, like every sampler here), and therefore
    SQL-oracle-able.

    Scale shape: shuffle-free — each batch keeps its local top-k
    candidates (n_batches x k rows total), one coalesced final applies
    the same rule. Rows with weight <= 0 are excluded. Ties break on id
    ascending; the emitted priority is rounded to 6 dp, the ORDERING
    uses the unrounded key on both engines.
    Returns Dataset[(id_col, weight_col, priority)].
    """
    import numpy as np
    import pandas as pd

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def candidates(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_pylist()
        w = np.asarray(batch.column(weight_col).to_pylist(), dtype=np.float64)
        digest = b"".join(
            hashlib.md5(str(i).encode("utf-8")).digest()[:8] for i in ids
        )
        u = np.frombuffer(digest, dtype=">u8").astype(np.float64) / 2.0**64
        df = pd.DataFrame(
            {id_col: ids, weight_col: batch.column(weight_col).to_pylist(), "__pri": 0.0}
        )
        keep = w > 0
        df.loc[keep, "__pri"] = u[keep] ** (1.0 / w[keep])
        df = df[keep]
        return df.sort_values(
            ["__pri", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        top = df.sort_values(
            ["__pri", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        out = top[[id_col, weight_col]].reset_index(drop=True)
        out["priority"] = round6(top["__pri"].to_numpy(), 6)
        return out

    parts = ds.map_batches(arrow_out(candidates), batch_format="pyarrow")
    return coalesced_blocks(parts, final)


def mixture_weights(ds, targets: dict[str, float], value_col: str = "n_chars"):
    """Source-mixture sampling rates: given target mixture proportions
    (summing to 1) over the ``source`` column, compute the per-source
    keep RATE that realizes the largest corpus whose value mass
    (chars/tokens) matches the target exactly without upsampling —
    the weighting step every multi-source pretraining mix runs (the
    Pile / LLaMA-style mixture tables) before weighted sampling.

    Math: with per-source totals T_s and targets p_s, the binding
    source maximizes p_s/T_s; the realizable corpus is
    C = min_{p_s>0} T_s / p_s and rate_s = C * p_s / T_s  (= 1 for the
    binding source; sources with p_s = 0 get rate 0).

    Scale shape: ONE bounded aggregate — per-batch partial sums
    (n_sources rows per batch) -> coalesced final (n_sources total;
    sources are a curated list, never corpus-scale); the closed-form
    solve happens inside the bounded final. Zero corpus-scale state.

    Returns Dataset[(source, total_value, target_share, sample_rate,
    expected_value)] rounded at emit; unknown sources (present in the
    corpus, absent from ``targets``) get target 0/rate 0.
    """
    import numpy as np
    import pandas as pd

    from docstrange_ray.numerics import round6
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pylist(),
                "v": np.asarray(batch.column(value_col), dtype=np.int64),
            }
        )
        return df.groupby("source", as_index=False)["v"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False)["v"].sum().sort_values("source")
        tot = g["v"].to_numpy(np.float64)
        share = np.array([float(targets.get(s, 0.0)) for s in g["source"]])
        # c = 0 when no targeted source has corpus mass (inf would NaN
        # the expected_value emits); a zero-mass targeted source binds
        # at c = 0 (nothing is realizable).
        with np.errstate(divide="ignore"):
            cap = np.where(share > 0, tot / share, np.inf)
        c = float(cap.min()) if len(cap) else np.inf
        if not np.isfinite(c):
            c = 0.0
        with np.errstate(invalid="ignore"):
            rate = np.where((share > 0) & (tot > 0), c * share / tot, 0.0)
        return pd.DataFrame(
            {
                "source": g["source"],
                "total_value": g["v"].astype(np.int64),
                "target_share": share,
                "sample_rate": round6(rate),
                "expected_value": round6(c * share),
            }
        )

    return coalesced_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        final,
    )


# ---------------------------------------------------------------------------
# Deterministic source interleaving (training-mix scheduling)
# ---------------------------------------------------------------------------


def interleave_by_source(
    ds,
    weights: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    num_partitions: int | None = None,
):
    """Deterministic global TRAINING ORDER that interleaves sources at
    integer rates — the scheduling half of the data-mixing story
    (``mixture_weights`` decides how much of each source; this decides
    WHERE each document lands in the epoch). Stride scheduling: the
    r-th document of source ``s`` (1-indexed, ordered by
    ``md5(str(id))`` then id — the house deterministic shuffle) runs at
    virtual time ``r / weights[s]``; the global order sorts by virtual
    time with ties broken by source name. All arithmetic is INTEGER:
    virtual times are cleared to ``k = r * (L // w_s)`` with
    ``L = lcm(weights)``, so the order (and the SQL oracle) is exact —
    no float comparisons anywhere.

    The plan needs NO global sort:

      1. one projection scan keys every row with its md5-52-bit value
         and range-bucket (md5 is uniform, so buckets are balanced
         regardless of source skew — a 90%-hot source cannot create a
         hot bucket); the projection is materialized once;
      2. one counting scan reduces to (source, bucket, count) partials
         (bounded: sources x buckets) — the driver prefix-sums them
         into per-(source, bucket) rank offsets and per-source totals;
      3. ONE bucket exchange co-locates each bucket; blocks sort their
         complete (source, bucket) groups by (md5, id) and emit
         ``r = offset + local position``;
      4. the global position is CLOSED-FORM from the totals — for a
         document with cleared key ``k``, every other source ``s'``
         contributes ``min(n_s', (k-1) // m_s')`` earlier documents
         (plus its tie when ``m_s' | k`` and the tied source sorts
         first), so ``pos`` is pure per-row arithmetic over the
         broadcast totals. No second exchange, no rank shuffle.

    Returns Dataset[(pos, id_col, source_col)] where pos is the
    1-based permutation index of the interleaved epoch. Every source
    present in the data must have a weight (raises otherwise).
    """
    import math

    import numpy as np
    import pandas as pd

    from docstrange_ray.shuffle import adaptive_final, arrow_out, grouped_blocks

    if not weights or any(w < 1 or w != int(w) for w in weights.values()):
        raise ValueError("weights must be positive integers per source")
    int_weights = {s: int(w) for s, w in weights.items()}  # 2.0 ok; lcm needs int
    big_l = math.lcm(*int_weights.values())
    mult = {s: big_l // w for s, w in int_weights.items()}  # key = r * mult[s]
    src_order = {s: i for i, s in enumerate(sorted(weights))}

    n_buckets = num_partitions or 64

    def project(batch: pa.Table) -> pa.Table:
        from docstrange_ray.numerics import md5_key52

        ids = batch.column(id_col).to_pylist()
        h52 = [md5_key52(i) for i in ids]
        bucket = [(h * n_buckets) >> 52 for h in h52]
        return pa.table(
            {
                "id": batch.column(id_col),
                "source": batch.column(source_col),
                "h": pa.array(h52, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    keyed = ds.map_batches(project, batch_format="pyarrow").materialize()

    counts = adaptive_final(
        keyed.map_batches(
            arrow_out(
                lambda df: df.groupby(["source", "bucket"], as_index=False)
                .size()
                .rename(columns={"size": "cnt"})
            ),
            batch_format="pandas",
        ),
        lambda df: df.groupby(["source", "bucket"], as_index=False)["cnt"].sum(),
        keys=["source", "bucket"],
        num_partitions=num_partitions,
    ).to_pandas()

    if "source" not in counts.columns:  # empty dataset loses its schema
        counts = pd.DataFrame({"source": [], "bucket": [], "cnt": []})
    unseen = set(counts["source"]) - set(weights)
    if unseen:
        raise ValueError(f"sources without a weight: {sorted(unseen)}")
    offsets: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for s, sub in counts.sort_values(["source", "bucket"]).groupby("source"):
        run = 0
        for b, c in zip(sub["bucket"], sub["cnt"]):
            offsets[(s, int(b))] = run
            run += int(c)
        totals[s] = run
    # closed-form position: per-source (mult, total, order) vectors in
    # the tie-break source order — broadcast via closure (O(sources))
    others = sorted(totals)
    o_mult = np.array([mult[s] for s in others], dtype=np.int64)
    o_tot = np.array([totals[s] for s in others], dtype=np.int64)
    o_ord = np.array([src_order[s] for s in others], dtype=np.int64)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "bucket", "h", "id"], kind="mergesort")
        local = df.groupby(["source", "bucket"]).cumcount().to_numpy(np.int64)
        off = np.array(
            [offsets[(s, int(b))] for s, b in zip(df["source"], df["bucket"])],
            dtype=np.int64,
        )
        r = off + local + 1
        m = np.array([mult[s] for s in df["source"]], dtype=np.int64)
        ordv = np.array([src_order[s] for s in df["source"]], dtype=np.int64)
        k = r * m
        pos = r.copy()
        for j in range(len(others)):
            not_self = ordv != o_ord[j]
            lt = np.minimum(o_tot[j], (k - 1) // o_mult[j])
            eq = ((k % o_mult[j] == 0) & (k // o_mult[j] <= o_tot[j])
                  & (o_ord[j] < ordv)).astype(np.int64)
            pos += np.where(not_self, np.maximum(lt, 0) + eq, 0)
        return pd.DataFrame(
            {
                "pos": pos,
                id_col: df["id"].to_numpy(),
                source_col: df["source"].to_numpy(),
            }
        )

    return grouped_blocks(
        keyed, ["bucket"], emit, num_partitions, batch_format="pandas"
    )


def leakage_safe_split(
    ds,
    threshold: float = 0.8,
    ngram: int = 3,
    buckets: tuple[int, int] = (80, 90),
    num_partitions=None,
    plan: str = "auto",
    broadcast_member_limit: int = 2_000_000,
):
    """Train/val/test assignment that cannot leak near-duplicates
    across splits — the decontamination rule hash_split misses: two
    near-identical documents hash independently, so one lands in train
    and its twin in test, inflating eval. Here the split is a function
    of the near-dup CLUSTER, not the document:

      verified pairs (dedup.near_dup_pairs_ds — the SQL-pinned
      3-gram-jaccard chain) -> connected components
      (dedup.dup_clusters_ds, min-reachable-id label) -> every doc's
      cluster = its component label (or its own doc_id when it has no
      near-dup) -> bucket = md5_key52(str(cluster)) % 100 -> 'train'
      below buckets[0], 'val' below buckets[1], else 'test'.

    Whole clusters move together, so train/test contamination by
    near-dups is structurally impossible; the assignment stays a pure
    function of the corpus (resumable, cluster-size-independent).
    Returns Dataset[(doc_id, cluster, split)].

    Plans: cluster labels cover only CLUSTER MEMBERS (pair-scale, a
    tiny fraction of the corpus). Below ``broadcast_member_limit``
    members the label map ships once via ray.put and assignment is one
    corpus scan with zero extra exchanges. Above it, ONE left
    co-partition join attaches labels (corpus-scale exchange — the
    honest cost when the member table itself outgrows a broadcast).
    """
    import numpy as np
    import pandas as pd
    import ray

    from docstrange_ray.numerics import md5_key52
    from docstrange_ray.ops.dedup import dup_clusters_ds, near_dup_pairs_ds
    from docstrange_ray.shuffle import arrow_out, hash_join

    lo, hi = buckets
    text_proj = ds.map_batches(
        lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow"
    )
    pairs = near_dup_pairs_ds(
        text_proj, threshold=threshold, ngram=ngram,
        num_partitions=num_partitions,
    )
    labels = dup_clusters_ds(pairs, num_partitions=num_partitions).materialize()
    n_members = labels.count()

    def split_of(cluster: np.ndarray) -> list[str]:
        out = []
        for c in cluster:
            b = md5_key52(str(int(c))) % 100
            out.append("train" if b < lo else ("val" if b < hi else "test"))
        return out

    if plan == "auto":
        plan = "broadcast" if n_members <= broadcast_member_limit else "join"

    if plan == "broadcast":
        lmap_ref = ray.put(
            {int(r["node"]): int(r["label"]) for r in labels.take_all()}
        )  # member-scale, gated

        def assign(batch: pa.Table, _ref=lmap_ref) -> pd.DataFrame:
            lm = ray.get(_ref)
            ids = batch.column("doc_id").to_pylist()
            cluster = np.fromiter(
                (lm.get(int(i), int(i)) for i in ids),
                dtype=np.int64,
                count=len(ids),
            )
            return pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "cluster": cluster,
                    "split": pd.Series(split_of(cluster), dtype=object),
                }
            )

        return ds.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        ).map_batches(arrow_out(assign), batch_format="pyarrow")

    # ---- join (scale) plan: one left co-partition join ----
    ids_ds = ds.map_batches(
        lambda b: pa.table({"node": b.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    joined = hash_join(
        ids_ds, labels, key="node", how="left", num_partitions=num_partitions
    )

    def assign_join(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["node"].to_numpy(np.int64)
        lab = df["label"].to_numpy()
        cluster = np.where(pd.isna(lab), ids, lab).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "cluster": cluster,
                "split": pd.Series(split_of(cluster), dtype=object),
            }
        )

    return joined.map_batches(arrow_out(assign_join), batch_format="pandas")
