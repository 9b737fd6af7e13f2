"""Count-Min sketch tests: the reference below rebuilds the sketch
with a dict-of-dicts (no numpy matrices, no Ray) from the same md5 row
hashes, so agreement pins the construction; the one-sided and additive
error guarantees are checked against exact counts.
"""

import hashlib
from collections import Counter

import pandas as pd
import pytest
import ray

from docstrange_ray.ops import sketch

D, W = 4, 64  # small w so collisions actually happen in the fixture


def ref_bucket(j, tok, w=W):
    return int.from_bytes(hashlib.md5(f"{j}|{tok}".encode()).digest()[:4], "big") % w


def ref_sketch(texts):
    counts = Counter()
    for t in texts:
        counts.update((t or "").lower().split())
    table = {j: Counter() for j in range(D)}
    for tok, c in counts.items():
        for j in range(D):
            table[j][ref_bucket(j, tok)] += c
    return counts, table


def ref_estimate(table, tok):
    return min(table[j].get(ref_bucket(j, tok), 0) for j in range(D))


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the brown tree",
    "data data data query table merge",
    "query table query table merge merge merge",
    "",
] * 7  # repeated so per-block partials actually merge


def ds_of():
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    )


@pytest.mark.usefixtures("ray_session")
class TestCountMin:
    def test_matches_reference_sketch_exactly(self):
        queries = ["the", "data", "query", "merge", "absent_tok"]
        got = pd.DataFrame(
            sketch.countmin_estimates(ds_of(), queries, d=D, w=W).take_all()
        )
        counts, table = ref_sketch(TEXTS)
        by_tok = dict(zip(got["token"], got["est"]))
        for q in queries:
            assert by_tok[q] == ref_estimate(table, q), q

    def test_one_sided_guarantee(self):
        counts, table = ref_sketch(TEXTS)
        queries = list(counts)[:20] + ["never_seen"]
        got = pd.DataFrame(
            sketch.countmin_estimates(ds_of(), queries, d=D, w=W).take_all()
        )
        n_total = sum(counts.values())
        for tok, est in zip(got["token"], got["est"]):
            true = counts.get(tok, 0)
            assert est >= true, tok  # never underestimates
            # additive error bound (loose 3x margin over e/w * N)
            assert est - true <= 3 * 2.72 * n_total / W, tok

    def test_param_validation(self):
        with pytest.raises(ValueError):
            sketch.countmin_estimates(ds_of(), ["x"], d=0, w=W)
        with pytest.raises(ValueError):
            sketch.countmin_estimates(ds_of(), ["x"], d=D, w=4)
