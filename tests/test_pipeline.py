"""Pipeline-level tests: the north-rule span-sequence-equality invariant
(kind, text, media_ref, order) between the sequential oracle and the Ray
pipeline, plus resumability (BASELINE.md targets)."""

import os
import shutil

import pyarrow as pa
import pytest
import ray.data

from docstrange_ray.extract.core import extract_corpus
from docstrange_ray.pipeline import extract_pipeline, run_extract_job
from docstrange_ray.schema import DOCUMENTS_SCHEMA
from docstrange_ray.state import manifest as mstate
from docstrange_ray.synth import gen_corpus_table

N_DOCS = 80
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    return gen_corpus_table(SEED, 0, N_DOCS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return {r["doc_id"]: r["spans"] for r in extract_corpus(corpus.to_pylist())}


def _assert_equal(rows, oracle):
    assert len(rows) == len(oracle)
    for r in rows:
        got = [dict(s) for s in r["spans"]]
        exp = oracle[r["doc_id"]]
        assert got == exp, f"span mismatch in {r['doc_id']}"


def test_explode_plan_matches_oracle(corpus, oracle):
    ds = ray.data.from_arrow(corpus)
    rows = extract_pipeline(ds, skew_threshold_units=4).take_all()
    _assert_equal(rows, oracle)


def test_inline_plan_matches_oracle(corpus, oracle):
    ds = ray.data.from_arrow(corpus)
    rows = extract_pipeline(ds, skew_threshold_units=None).take_all()
    _assert_equal(rows, oracle)


def test_plans_agree_at_any_threshold(corpus, oracle):
    ds = ray.data.from_arrow(corpus)
    rows = extract_pipeline(ds, skew_threshold_units=1).take_all()
    _assert_equal(rows, oracle)


def test_empty_and_degenerate_docs():
    rows_in = [
        {"doc_id": "e1", "spans": []},
        {"doc_id": "e2", "spans": [{"kind": "unknown-kind", "text": "x", "media_ref": "", "offset": 0}]},
        {"doc_id": "e3", "spans": [{"kind": "page-src", "text": "not json {", "media_ref": "", "offset": 0}]},
    ]
    tbl = pa.Table.from_pylist(rows_in, schema=DOCUMENTS_SCHEMA)
    oracle = {r["doc_id"]: r["spans"] for r in extract_corpus(rows_in)}
    rows = extract_pipeline(ray.data.from_arrow(tbl), skew_threshold_units=None).take_all()
    _assert_equal(rows, oracle)


class TestResumableJob:
    OUT = "/tmp/dsray_test_job"
    FP = f"synth-{SEED}-{N_DOCS}"

    def test_job_writes_all_partitions(self, corpus, oracle):
        shutil.rmtree(self.OUT, ignore_errors=True)
        ds = ray.data.from_arrow(corpus)
        man = run_extract_job(ds, self.OUT, self.FP, num_partitions=8)
        assert len(man) == 8
        assert sum(m["n_docs"] for m in man) == N_DOCS
        out = mstate.read_output(self.OUT).take_all()
        _assert_equal(out, oracle)

    def test_resume_skips_completed(self, corpus):
        # drop two partitions → resume rewrites exactly those
        for pid in (2, 5):
            os.remove(f"{self.OUT}/part-{pid:05d}.parquet")
            os.remove(f"{self.OUT}/part-{pid:05d}.manifest.json")
        ds = ray.data.from_arrow(corpus)
        man = run_extract_job(ds, self.OUT, self.FP, num_partitions=8)
        assert sorted(m["part_id"] for m in man) == [2, 5]

    def test_resume_noop_when_complete(self, corpus):
        ds = ray.data.from_arrow(corpus)
        man = run_extract_job(ds, self.OUT, self.FP, num_partitions=8)
        assert man == []

    def test_fingerprint_change_invalidates(self, corpus):
        ds = ray.data.from_arrow(corpus)
        man = run_extract_job(ds, self.OUT, self.FP + "-v2", num_partitions=8)
        assert len(man) == 8

    def test_partition_assignment_is_parallelism_independent(self):
        # crc32-based: same doc → same partition regardless of cluster size
        assert mstate.partition_of("doc-00000042", 32) == mstate.partition_of(
            "doc-00000042", 32
        )
        spread = {mstate.partition_of(f"doc-{i:08d}", 32) for i in range(200)}
        assert len(spread) > 24  # well spread


def test_deterministic_generation_is_order_independent():
    a = gen_corpus_table(SEED, 0, 10).to_pylist()
    b = [gen_corpus_table(SEED, i, 1).to_pylist()[0] for i in range(10)]
    assert a == b
