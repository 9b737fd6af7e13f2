"""Spec-oracle tests (synth_expected.py): corpus determinism pin, spec vs
engine span equality over every oracle-able population, independent-chunker
parity, and fixture round-trip."""

import hashlib
import json

import pytest

from docstrange_ray.extract.core import extract_document
from docstrange_ray.projections import spans_to_chunks, spans_to_json, spans_to_markdown
from docstrange_ray.synth import gen_corpus_table, gen_doc_full, population_of
from docstrange_ray.synth_expected import (
    ORACLEABLE_POPS,
    expected_chunks,
    expected_spans,
    oracleable_doc_ids,
    write_expected_fixtures,
)

N = 400
SEED = 42


def test_corpus_hash_unchanged():
    """The structure-capturing refactor of synth.py must not perturb the rng
    draw order: corpus bytes are pinned (hash recorded pre-refactor)."""
    t = gen_corpus_table(SEED, 0, 200)
    h = hashlib.md5(json.dumps(t.to_pylist(), sort_keys=True).encode()).hexdigest()
    assert h == "34ca53448d9f47fb97dc4c3cffbaea73"


@pytest.fixture(scope="module")
def docs():
    return [gen_doc_full(SEED, i) for i in range(N)]


def test_spec_matches_engine_extraction(docs):
    """structure --spec--> expected spans == payload --engine--> spans,
    for every oracle-able document."""
    checked = 0
    for row, pop, struct in docs:
        if pop not in ORACLEABLE_POPS:
            continue
        checked += 1
        exp = expected_spans(pop, struct, row["doc_id"])
        got = extract_document(row)["spans"]
        assert got == exp, f"{row['doc_id']} ({pop})"
    assert checked > N // 2  # oracle-able pops are ~82% of the mix


def test_all_populations_covered(docs):
    pops = {pop for _, pop, _ in docs}
    assert ORACLEABLE_POPS <= pops  # every oracle-able pop appears in N docs


def test_chunker_parity(docs):
    """Independent chunker == projections.spans_to_chunks on expected spans
    (two re-derivations of the packing contract agreeing exactly)."""
    for row, pop, struct in docs:
        if pop not in ORACLEABLE_POPS:
            continue
        exp = expected_spans(pop, struct, row["doc_id"])
        assert expected_chunks(exp, 512) == spans_to_chunks(exp, 512)


def test_meta_and_markdown_sql_contract(docs):
    """The SQL oracle derives markdown / metadata from flat expected spans;
    pin the Python side of that contract (projection over expected spans ==
    what the SQL expressions compute)."""
    for row, pop, struct in docs[:120]:
        if pop not in ORACLEABLE_POPS:
            continue
        exp = expected_spans(pop, struct, row["doc_id"])
        # markdown: blank-line join of non-empty parts, image-refs rendered
        parts = [
            f"![{s['text']}]({s['media_ref']})" if s["kind"] == "image-ref" else s["text"]
            for s in exp
        ]
        assert spans_to_markdown(exp) == "\n\n".join(p for p in parts if p)
        # metadata: section_count == heading spans; level == leading-# run
        m = spans_to_json(exp)["document"]["metadata"]
        headings = [s for s in exp if s["kind"] == "heading"]
        assert m["section_count"] == len(headings)
        lvl = max(
            (len(s["text"]) - len(s["text"].lstrip("#")) for s in headings),
            default=0,
        )
        assert m["max_heading_level"] == lvl


def test_projection_rederivations_match_engine(docs):
    """The independent contract mirrors (exp_html/csv/sections/structure/
    search) agree with the engine's projections module on expected
    spans — so the fixture-backed driver oracles check engine extraction
    AND projection end-to-end."""
    import json as _json

    from docstrange_ray import projections as P
    from docstrange_ray.synth_expected import (
        exp_csv,
        exp_headers,
        exp_html,
        exp_markdown,
        exp_search,
        exp_sections,
        exp_structure,
        exp_summaries,
    )

    for row, pop, struct in docs[:150]:
        if pop not in ORACLEABLE_POPS:
            continue
        sp = expected_spans(pop, struct, row["doc_id"])
        assert exp_markdown(sp) == P.spans_to_markdown(sp)
        assert exp_html(sp) == P.spans_to_html(sp)
        assert exp_csv(sp) == P.spans_to_csv(sp)
        ref_secs = [
            {
                k: s[k]
                for k in (
                    "level",
                    "title",
                    "start_line",
                    "end_line",
                    "content",
                    "token_count",
                )
            }
            for s in P.parse_sections(sp)
        ]
        assert exp_sections(sp) == ref_secs
        # structure mirrors hierarchical_structure's tree + tiers
        st = exp_structure(sp)
        assert st["n_sections"] == len(ref_secs)
        assert st["total_tokens"] == sum(s["token_count"] for s in ref_secs)
        _json.loads(st["structure"])  # valid JSON tree
        assert len(exp_headers(sp)) == sum(1 for s in ref_secs if s["level"] > 0)
        assert len(exp_summaries(sp)) == len(ref_secs)
        exp_search(sp, "shuffle")  # derives without error


def test_paged_spec_matches_engine(docs):
    """The paged populations' spec oracle (page-descriptor contract
    mirrors: conf floor, reading order, classify, word join, OCR
    cleanup, grouping, table merge, page assembly) == engine
    extraction."""
    from docstrange_ray.synth_expected import expected_spans_paged

    checked = 0
    for row, pop, _ in docs:
        if pop not in ("paged_doc", "giant_doc"):
            continue
        checked += 1
        exp = expected_spans_paged(row["spans"], row["doc_id"])
        got = extract_document(row)["spans"]
        assert got == exp, f"{row['doc_id']} ({pop})"
    assert checked > 0


def test_oracleable_ids_match_population(docs):
    # full-corpus coverage since the paged spec oracle landed
    ids = oracleable_doc_ids(N, SEED)
    assert ids == {row["doc_id"] for row, _, _ in docs}
    for i in range(50):
        assert population_of(SEED, i) == docs[i][1]


def test_fixture_roundtrip(tmp_path):
    spans_path, chunks_path = write_expected_fixtures(
        60, seed=SEED, out_dir=str(tmp_path)
    )
    import pyarrow.parquet as pq

    sp = pq.read_table(spans_path)
    ch = pq.read_table(chunks_path)
    assert sp.num_rows > 0 and ch.num_rows > 0
    assert set(sp.column("n").to_pylist()) == {60}
    assert set(sp.column("doc_id").to_pylist()) == oracleable_doc_ids(60, SEED)
