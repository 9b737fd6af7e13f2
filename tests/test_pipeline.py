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

    def test_config_change_invalidates(self, corpus):
        """Resuming with different extraction HEURISTICS must reprocess
        (the manifest carries a config fingerprint; ADVICE round 1)."""
        from docstrange_ray.config import ExtractConfig

        ds = ray.data.from_arrow(corpus)
        cfg2 = ExtractConfig(heading_max_words=4)  # fidelity-facing change
        man = run_extract_job(ds, self.OUT, self.FP + "-v2", cfg=cfg2, num_partitions=8)
        assert len(man) == 8  # all partitions rewritten
        # …but an engine-knob change (batch size) resumes as a no-op
        cfg3 = ExtractConfig(heading_max_words=4, parse_batch_size=64)
        man = run_extract_job(ds, self.OUT, self.FP + "-v2", cfg=cfg3, num_partitions=8)
        assert man == []

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


class TestSkewGate:
    def test_explicit_int_is_span_count(self):
        from docstrange_ray.config import DEFAULT
        from docstrange_ray.stages import make_skew_gate

        gate = make_skew_gate(DEFAULT, 3)
        assert not gate([{"kind": "text", "text": "hi"}] * 2)
        assert gate([{"kind": "text", "text": "hi"}] * 3)

    def test_auto_gate_is_cost_based(self):
        from docstrange_ray.config import ExtractConfig
        from docstrange_ray.stages import make_skew_gate

        cfg = ExtractConfig(explode_cost_threshold=1000.0)
        gate = make_skew_gate(cfg, "auto")
        # two tiny spans: cost ~ chars -> below threshold
        assert not gate([{"kind": "text", "text": "hi", "offset": 0}] * 2)
        # one page-src costs cost_per_page=2000 > 1000, but single-span
        # docs never explode (nothing to parallelize)
        page = [{"kind": "page-src", "text": "{}", "offset": 0}]
        assert not gate(page)
        assert gate(page * 2)

    def test_auto_plan_sampling_elides_split(self, ray_session):
        """With no doc crossing the cost gate the auto plan equals the
        inline plan's results (and the explode branch is elided)."""
        import ray.data

        from docstrange_ray.synth import gen_corpus_table

        tbl = gen_corpus_table(7, 0, 50)
        a = extract_pipeline(ray.data.from_arrow(tbl)).take_all()
        b = extract_pipeline(
            ray.data.from_arrow(tbl), skew_threshold_units=None
        ).take_all()
        key = lambda r: r["doc_id"]
        assert sorted(a, key=key) == sorted(b, key=key)


class TestAssembleSorted:
    def test_columnar_matches_finalize(self):
        import pyarrow as pa

        from docstrange_ray.extract.core import finalize_spans
        from docstrange_ray.schema import SPAN_STRUCT
        from docstrange_ray.stages import assemble_sorted

        spans_a1 = [{"kind": "heading", "text": "# H", "media_ref": None, "offset": None}]
        spans_a2 = [
            {"kind": "text", "text": "p1", "media_ref": None, "offset": None},
            {"kind": "image-ref", "text": "alt", "media_ref": "m://1", "offset": None},
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(["a", "a", "b", "c"]),
                "spans": pa.array(
                    [spans_a1, spans_a2, [], None], type=pa.list_(SPAN_STRUCT)
                ),
            }
        )
        out = assemble_sorted(tbl.column("doc_id"), tbl.column("spans"))
        rows = {r["doc_id"]: r["spans"] for r in out.to_pylist()}
        assert rows["a"] == finalize_spans(spans_a1 + spans_a2)
        assert rows["b"] == []
        assert rows["c"] == []

    def test_empty_block(self):
        import pyarrow as pa

        from docstrange_ray.schema import SPAN_STRUCT
        from docstrange_ray.stages import assemble_sorted

        out = assemble_sorted(
            pa.array([], type=pa.string()), pa.array([], type=pa.list_(SPAN_STRUCT))
        )
        assert out.num_rows == 0


def test_io_fallback_and_job_summary(ray_session, tmp_path):
    """io.read_corpus/write_corpus round-trip (parquet fallback in this
    sandbox; Lance when the package exists) + manifest job_summary."""
    import ray.data

    from docstrange_ray.io import read_corpus, write_corpus
    from docstrange_ray.state.manifest import job_summary
    from docstrange_ray.synth import gen_corpus_table

    tbl = gen_corpus_table(3, 0, 20)
    write_corpus(ray.data.from_arrow(tbl), str(tmp_path / "corpus"))
    back = read_corpus(str(tmp_path / "corpus"), columns=["doc_id"])
    assert back.count() == 20

    out = str(tmp_path / "job")
    man = run_extract_job(ray.data.from_arrow(tbl), out, "fp-x", num_partitions=4)
    s = job_summary(out)
    assert s["n_partitions"] == len(man) == 4
    assert s["n_docs"] == 20
    assert s["n_spans"] > 0


class TestErrorPolicy:
    """Swallow-and-record: poisoned documents surface error spans in the
    output (the reference's per-page behavior, gpu_processor.py:412-417)
    instead of failing the job; the oracle and every plan agree."""

    POISON = [
        {"kind": "page-src", "text": "{}", "media_ref": "", "offset": "bogus"},
        {"kind": "text", "text": "fine", "media_ref": "", "offset": 1},
    ]

    def test_oracle_emits_error_span(self):
        from docstrange_ray.extract.core import extract_spans

        spans = extract_spans("d", self.POISON)
        assert len(spans) == 1
        assert spans[0]["kind"] == "text"
        assert spans[0]["text"].startswith("[extraction error:")

    def test_pipeline_survives_and_matches_oracle(self, ray_session):
        import pyarrow as pa
        import ray.data

        from docstrange_ray.extract.core import extract_corpus
        from docstrange_ray.schema import DOCUMENTS_SCHEMA
        from docstrange_ray.synth import gen_corpus_table

        good = gen_corpus_table(5, 0, 10).to_pylist()
        rows = good + [{"doc_id": "poison", "spans": self.POISON}]
        # offsets are int32 in the schema; a poisoned offset arrives as a
        # parse-level corruption, so build the table loosely typed
        schema = pa.schema(
            [
                ("doc_id", pa.string()),
                (
                    "spans",
                    pa.list_(
                        pa.struct(
                            [
                                ("kind", pa.string()),
                                ("text", pa.string()),
                                ("media_ref", pa.string()),
                                ("offset", pa.string()),
                            ]
                        )
                    ),
                ),
            ]
        )
        loose = [
            {
                "doc_id": r["doc_id"],
                "spans": [
                    {**s, "offset": str(s.get("offset", ""))} for s in r["spans"]
                ],
            }
            for r in rows
        ]
        # "bogus" offsets break int() in both oracle and pipeline the same way
        oracle = {r["doc_id"]: extract_corpus([r])[0]["spans"] for r in loose}
        ds = ray.data.from_arrow(pa.Table.from_pylist(loose, schema=schema))
        out = extract_pipeline(ds, skew_threshold_units=None).take_all()
        assert len(out) == len(loose)
        for r in out:
            assert [dict(s) for s in r["spans"]] == oracle[r["doc_id"]]

    def test_heavy_path_swallows_malformed_offset(self, ray_session):
        """The EXPLODE branch must apply the same per-document
        swallow-and-record policy as the light path: a heavy document
        with a null/bogus offset becomes one error-span row instead of
        failing the whole Ray task (ADVICE round 1)."""
        import pyarrow as pa
        import ray.data

        from docstrange_ray.extract.core import extract_corpus
        from docstrange_ray.synth import gen_corpus_table

        poison = {
            "doc_id": "poison-heavy",
            "spans": [
                {
                    "kind": "text",
                    "text": f"unit {i}",
                    "media_ref": "",
                    "offset": "bogus" if i == 3 else str(i),
                }
                for i in range(8)
            ],
        }
        good = [
            {
                "doc_id": r["doc_id"],
                "spans": [
                    {**s, "offset": str(s.get("offset", ""))} for s in r["spans"]
                ],
            }
            for r in gen_corpus_table(7, 0, 6).to_pylist()
        ]
        rows = good + [poison]
        schema = pa.schema(
            [
                ("doc_id", pa.string()),
                (
                    "spans",
                    pa.list_(
                        pa.struct(
                            [
                                ("kind", pa.string()),
                                ("text", pa.string()),
                                ("media_ref", pa.string()),
                                ("offset", pa.string()),
                            ]
                        )
                    ),
                ),
            ]
        )
        oracle = {r["doc_id"]: extract_corpus([r])[0]["spans"] for r in rows}
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))
        # threshold 2 forces the poisoned 8-span doc down the explode path
        out = extract_pipeline(ds, skew_threshold_units=2).take_all()
        assert len(out) == len(rows)
        for r in out:
            assert [dict(s) for s in r["spans"]] == oracle[r["doc_id"]]
        by_id = {r["doc_id"]: r for r in out}
        assert by_id["poison-heavy"]["spans"][0]["text"].startswith(
            "[extraction error:"
        )


class TestAutoPlanChoice:
    def _straggler_doc(self):
        # 1001 page-src units: est_cost ~ 1001 * cost_per_page (2e3) > 2e6
        spans = [
            {"kind": "page-src", "text": "{}", "media_ref": "", "offset": i}
            for i in range(1001)
        ]
        return {"doc_id": "giant", "spans": spans}

    def test_uniform_corpus_selects_inline(self, ray_session):
        import ray.data

        from docstrange_ray.pipeline import resolve_auto_plan
        from docstrange_ray.synth import gen_corpus_table

        assert resolve_auto_plan(ray.data.from_arrow(gen_corpus_table(9, 0, 50))) is None

    def test_straggler_corpus_selects_split_and_matches_oracle(self, ray_session):
        import pyarrow as pa
        import ray.data

        from docstrange_ray.extract.core import extract_corpus
        from docstrange_ray.pipeline import resolve_auto_plan
        from docstrange_ray.schema import DOCUMENTS_SCHEMA
        from docstrange_ray.synth import gen_corpus_table

        rows = gen_corpus_table(9, 0, 30).to_pylist() + [self._straggler_doc()]
        tbl = pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
        ds = ray.data.from_arrow(tbl)
        assert resolve_auto_plan(ds) == "auto"
        oracle = {r["doc_id"]: r["spans"] for r in extract_corpus(rows)}
        out = extract_pipeline(ds, skew_threshold_units="auto").take_all()
        assert len(out) == len(rows)
        for r in out:
            assert [dict(s) for s in r["spans"]] == oracle[r["doc_id"]]


class TestCLIs:
    def test_convert_cli(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data

        from docstrange_ray.convert import main as convert_main
        from docstrange_ray.synth import gen_corpus_table

        src = str(tmp_path / "corpus")
        ray.data.from_arrow(gen_corpus_table(13, 0, 30)).write_parquet(src)
        out = str(tmp_path / "md")
        assert convert_main(["--input", src, "--output", out, "--format", "markdown"]) == 0
        tbl = pq.read_table(out)
        assert tbl.num_rows == 30
        assert set(tbl.column_names) == {"doc_id", "markdown"}

    def test_convert_cli_real_files(self, ray_session, tmp_path):
        """The reference's `docstrange <files>` input mode: --files over
        a directory of real binary documents."""
        import pyarrow.parquet as pq

        from docstrange_ray.convert import main as convert_main
        from docstrange_ray.synth_files import write_fixture_corpus

        src = str(tmp_path / "files")
        write_fixture_corpus(src)
        out = str(tmp_path / "md")
        assert convert_main(["--files", src, "--output", out, "--format", "markdown"]) == 0
        tbl = pq.read_table(out)
        assert tbl.num_rows == 13
        md = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("markdown").to_pylist()))
        assert "# Annual Report" in md["report.docx"]

    def test_job_cli(self, ray_session, tmp_path):
        import ray.data

        from docstrange_ray.job import main as job_main
        from docstrange_ray.synth import gen_corpus_table

        src = str(tmp_path / "corpus")
        ray.data.from_arrow(gen_corpus_table(13, 0, 30)).write_parquet(src)
        out = str(tmp_path / "job")
        rc = job_main(
            ["--input", src, "--output", out, "--fingerprint", "t", "--partitions", "4"]
        )
        assert rc == 0
        from docstrange_ray.state.manifest import job_summary

        assert job_summary(out)["n_docs"] == 30


class TestActorRestart:
    """bind_actor ships ctor kwargs inside the cloudpickled class so the
    actor creation task carries zero object-store args (ray#53727): an
    actor killed mid-job restarts and the job completes."""

    def test_bound_actor_needs_no_args(self):
        from docstrange_ray.config import DEFAULT
        from docstrange_ray.stages import ExtractUnitActor, bind_actor

        bound = bind_actor(ExtractUnitActor, cfg=DEFAULT)
        inst = bound()  # zero-arg construction
        assert inst.cfg is DEFAULT
        assert isinstance(inst, ExtractUnitActor)

    def test_job_survives_actor_kill(self, ray_session, tmp_path, corpus, oracle):
        from docstrange_ray.config import DEFAULT
        from docstrange_ray.stages import ExtractUnitActor, bind_actor

        marker = str(tmp_path / "killed-once")
        bound = bind_actor(ExtractUnitActor, cfg=DEFAULT)

        # Defined inside the test fn so cloudpickle serializes it by
        # value (module-level test classes pickle by reference and fail
        # on workers).
        class FlakyActor(bound):
            def __call__(self, batch):
                if not os.path.exists(marker):
                    with open(marker, "w"):
                        pass
                    os._exit(1)  # hard-kill this actor process
                return super().__call__(batch)

        ds = ray.data.from_arrow(corpus)
        rows = extract_pipeline(
            ds, skew_threshold_units=4, actor_cls=FlakyActor
        ).take_all()
        assert os.path.exists(marker), "fault was never injected"
        _assert_equal(rows, oracle)
