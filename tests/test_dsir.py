"""DSIR importance-resampling tests.

The reference below re-derives the pipeline with Counters and plain
loops (no factorize, no bincount, no Ray) — structurally different
from docstrange_ray.ops.dsir, so agreement pins the method.
"""

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray

from docstrange_ray.ops import dsir

M = 512


def ref_bucket(tok):
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "big") % M


def ref_tokens(text):
    ws = (text or "").lower().split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def ref_counts(rows, target_source):
    raw, tgt = Counter(), Counter()
    for r in rows:
        for tok in ref_tokens(r["text"]):
            b = ref_bucket(tok)
            raw[b] += 1
            if r["source"] == target_source:
                tgt[b] += 1
    return raw, tgt


def ref_logw(rows, target_source):
    """Exact mirror of the op's quantized contract: per-bucket lambda
    rounded half-away to 1e-8 int units, summed as ints per doc,
    emitted round6(sum/1e8) — identical (not approx) to the engine."""
    raw, tgt = ref_counts(rows, target_source)
    R, T = sum(raw.values()), sum(tgt.values())
    out = {}
    for r in rows:
        s = 0
        for tok in ref_tokens(r["text"]):
            b = ref_bucket(tok)
            v = (math.log(tgt.get(b, 0) + 1.0) - math.log(T + M)) - (
                math.log(raw.get(b, 0) + 1.0) - math.log(R + M)
            )
            s += int(math.copysign(math.floor(abs(v * 1e8) + 0.5), v))
        out[r["doc_id"]] = ref_round6(s / 1e8)
    return out


def ref_round6(x):
    # half-away-from-zero at 6 dp (the engine's documented emit rounding)
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def ref_gumbel(doc_id):
    u = (
        int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8], "big")
        + 0.5
    ) / 2.0**64
    return -math.log(-math.log(u))


def fixture_rows():
    rows = []
    # target source: "wiki"-flavored docs share marker tokens
    for i in range(30):
        rows.append(
            {
                "doc_id": i,
                "text": f"curated reference article number {i % 5} with citations",
                "source": "trusted",
            }
        )
    for i in range(30, 120):
        flavor = "curated reference article" if i % 3 == 0 else "spam click buy now offer"
        rows.append(
            {"doc_id": i, "text": f"{flavor} item {i % 7}", "source": "crawl"}
        )
    rows.append({"doc_id": 999, "text": "", "source": "crawl"})
    return rows


def ds_of(rows):
    return ray.data.from_items(rows)


@pytest.mark.usefixtures("ray_session")
class TestDsir:
    def test_bucket_counts_exact(self):
        rows = fixture_rows()
        got = (
            pd.DataFrame(dsir.bucket_counts(ds_of(rows), m=M,
                                            target_source="trusted").take_all())
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        raw, tgt = ref_counts(rows, "trusted")
        exp = (
            pd.DataFrame(
                [(b, raw[b], tgt.get(b, 0)) for b in sorted(raw)],
                columns=["bucket", "raw_c", "tgt_c"],
            ).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_logweights_match_reference(self):
        rows = fixture_rows()
        got = pd.DataFrame(
            dsir.dsir_logweights(ds_of(rows), m=M,
                                 target_source="trusted").take_all()
        )
        exp = ref_logw(rows, "trusted")
        by_id = dict(zip(got["doc_id"], got["logw"]))
        assert set(by_id) == set(exp)
        for d, v in exp.items():
            assert by_id[d] == v, d  # EXACT: quantized integer contract

    def test_target_flavored_docs_outscore_spam(self):
        rows = fixture_rows()
        got = pd.DataFrame(
            dsir.dsir_logweights(ds_of(rows), m=M,
                                 target_source="trusted").take_all()
        )
        by_id = dict(zip(got["doc_id"], got["logw"]))
        flavored = [by_id[i] for i in range(30, 120) if i % 3 == 0]
        spam = [by_id[i] for i in range(30, 120) if i % 3 != 0]
        assert min(flavored) > max(spam)

    def test_select_is_deterministic_gumbel_topk(self):
        rows = fixture_rows()
        k = 12
        got = pd.DataFrame(
            dsir.dsir_select(ds_of(rows), k=k, m=M,
                             target_source="trusted").take_all()
        )
        assert len(got) == k
        exp_lw = ref_logw(rows, "trusted")
        keys = {
            d: ref_round6(lw) + ref_gumbel(d) for d, lw in exp_lw.items()
        }
        exp_ids = [
            d for d, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))
        ][:k]
        assert got["doc_id"].tolist() == exp_ids
        # rerun: byte-identical selection
        again = pd.DataFrame(
            dsir.dsir_select(ds_of(rows), k=k, m=M,
                             target_source="trusted").take_all()
        )
        pd.testing.assert_frame_equal(got, again)

    def test_k_larger_than_corpus(self):
        rows = fixture_rows()[:5]
        got = pd.DataFrame(
            dsir.dsir_select(ds_of(rows), k=50, m=M,
                             target_source="trusted").take_all()
        )
        assert len(got) == 5

    def test_k_must_be_positive(self):
        with pytest.raises(ValueError):
            dsir.dsir_select(ds_of(fixture_rows()), k=0)
