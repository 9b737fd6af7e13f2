"""Property-based invariants (hypothesis) over the span data model.

These complement the example-based golden tests: any well-formed span
sequence must project and re-parse without crashing, and structural
invariants (section counts, chunk budgets, order preservation) must
hold for ALL inputs, not just fixtures.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

KINDS = ("heading", "text", "list_item", "table", "code", "image-ref")

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=80
)


@st.composite
def span(draw):
    kind = draw(st.sampled_from(KINDS))
    text = draw(_text)
    if kind == "heading":
        level = draw(st.integers(1, 6))
        text = "#" * level + " " + text.replace("\n", " ")
    elif kind == "table":
        text = "| a | b |\n| --- | --- |\n| c | d |"
    elif kind == "code":
        text = f"```\n{text}\n```"
    media = draw(_text) if kind == "image-ref" else ""
    return {"kind": kind, "text": text, "media_ref": media, "offset": 0}


spans_lists = st.lists(span(), min_size=0, max_size=30).map(
    lambda ss: [{**s, "offset": i} for i, s in enumerate(ss)]
)


@settings(max_examples=60, deadline=None)
@given(spans_lists)
def test_projections_never_crash_and_are_strings(spans):
    from docstrange_ray.projections import (
        spans_to_csv,
        spans_to_html,
        spans_to_json,
        spans_to_markdown,
    )

    assert isinstance(spans_to_markdown(spans), str)
    assert isinstance(spans_to_html(spans), str)
    assert isinstance(spans_to_csv(spans), str)
    tree = spans_to_json(spans)
    meta = tree["document"]["metadata"]
    # section count == number of heading spans (hierarchy never drops one)
    assert meta["section_count"] == sum(1 for s in spans if s["kind"] == "heading")
    assert meta["has_images"] == any(s["kind"] == "image-ref" for s in spans)


@settings(max_examples=60, deadline=None)
@given(spans_lists, st.integers(1, 500))
def test_chunks_cover_all_sections_within_budget(spans, budget):
    from docstrange_ray.projections import spans_to_chunks

    chunks = spans_to_chunks(spans, token_budget=budget)
    n_headings = sum(1 for s in spans if s["kind"] == "heading")
    has_preamble = bool(spans) and spans[0]["kind"] != "heading"
    # every section lands in exactly one chunk
    assert sum(c["n_sections"] for c in chunks) == n_headings + (1 if has_preamble else 0)
    # no chunk except single-oversize-section ones exceeds the budget
    for c in chunks:
        assert c["n_sections"] == 1 or c["n_tokens_est"] <= budget
    assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))


@settings(max_examples=40, deadline=None)
@given(spans_lists)
def test_finalize_preserves_order_and_normalizes(spans):
    from docstrange_ray.extract.core import finalize_spans

    out = finalize_spans([{k: v for k, v in s.items() if k != "offset"} for s in spans])
    assert [s["offset"] for s in out] == list(range(len(spans)))
    assert [s["kind"] for s in out] == [s["kind"] for s in spans]
    assert all(s["media_ref"] is not None and s["text"] is not None for s in out)


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=0, max_size=400))
def test_text_extraction_roundtrip_stable(payload):
    """Extracting plain text twice is idempotent at the text level: the
    markdown rendering of the spans re-extracts to the same spans."""
    from docstrange_ray.extract.text_extract import text_to_spans
    from docstrange_ray.projections import spans_to_markdown

    first = text_to_spans(payload)
    again = text_to_spans(spans_to_markdown(first))
    assert again == first


# --- binary-format round trips ----------------------------------------------
# The stdlib writers (synth_files) and the stdlib parsers (binary_formats)
# are independent implementations of each format; round-tripping arbitrary
# content through bytes is the strongest in-sandbox correctness check for
# both.

_cell = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"),  # no surrogates/control chars
    ),
    min_size=0,
    max_size=20,
)
_word_text = _cell.map(lambda s: " ".join(s.split()))


@settings(max_examples=25, deadline=None)
@given(
    paras=st.lists(
        st.tuples(
            _word_text.filter(lambda s: s.strip()),
            st.sampled_from(["", "Title", "Heading1", "Heading2", "ListParagraph"]),
        ),
        max_size=8,
    ),
    grid=st.lists(
        st.lists(_word_text, min_size=1, max_size=4), min_size=1, max_size=5
    ),
)
def test_docx_bytes_round_trip(paras, grid):
    from docstrange_ray.extract.binary_formats import parse_docx_bytes
    from docstrange_ray.synth_files import make_docx

    width = max(len(r) for r in grid)
    grid = [r + [""] * (width - len(r)) for r in grid]
    doc = parse_docx_bytes(make_docx(paras, tables=[grid]))
    style_names = {
        "": "",
        "Title": "Title",
        "Heading1": "Heading 1",
        "Heading2": "Heading 2",
        "ListParagraph": "List Paragraph",
    }
    assert doc["paragraphs"] == [
        {"text": t, "style": style_names[s]} for t, s in paras
    ]
    # cell newlines are flattened by the parser (none generated here)
    assert doc["tables"] == [[[c.strip() for c in row] for row in grid]]


@settings(max_examples=25, deadline=None)
@given(
    sheets=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
                min_size=1,
                max_size=10,
            ),
            st.lists(
                st.lists(
                    st.one_of(_word_text, st.integers(-1000, 1000)),
                    min_size=1,
                    max_size=4,
                ),
                min_size=1,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    )
)
def test_xlsx_bytes_round_trip(sheets):
    from docstrange_ray.extract.binary_formats import parse_xlsx_bytes
    from docstrange_ray.synth_files import make_xlsx

    book = parse_xlsx_bytes(make_xlsx(sheets))
    assert [s["name"] for s in book["sheets"]] == [n for n, _ in sheets]
    for parsed, (_, grid) in zip(book["sheets"], sheets):
        exp = [[str(c) for c in row] for row in grid]
        assert parsed["grid"] == exp


@settings(max_examples=25, deadline=None)
@given(
    pages=st.lists(
        st.lists(_word_text.filter(lambda s: s.strip()), max_size=5).map(
            "\n".join
        ),
        min_size=1,
        max_size=4,
    )
)
def test_pdf_bytes_round_trip(pages):
    from docstrange_ray.extract.binary_formats import parse_pdf_pages
    from docstrange_ray.synth_files import make_pdf

    # the writer draws line-by-line; latin-1 is the PDF literal-string
    # encoding, so constrain content to it
    pages = ["\n".join(p.split("\n")) for p in pages]
    pages = [
        p.encode("latin-1", "replace").decode("latin-1") for p in pages
    ]
    assert parse_pdf_pages(make_pdf(pages)) == pages
    assert parse_pdf_pages(make_pdf(pages, compress=False)) == pages


@settings(max_examples=25, deadline=None)
@given(
    slides=st.lists(
        st.lists(
            _word_text.filter(lambda s: s.strip()), min_size=0, max_size=4
        ),
        min_size=1,
        max_size=4,
    )
)
def test_pptx_bytes_round_trip(slides):
    from docstrange_ray.extract.binary_formats import parse_pptx_bytes
    from docstrange_ray.synth_files import make_pptx

    deck = parse_pptx_bytes(make_pptx(slides))
    assert deck == {"slides": [{"texts": [t for t in texts]} for texts in slides]}


@settings(max_examples=25, deadline=None)
@given(
    paras=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            min_size=1,
            max_size=40,
        )
        .map(lambda s: " ".join(s.split()))
        .filter(lambda s: s.strip()),
        max_size=6,
    ),
    ansi=st.booleans(),
)
def test_doc_bytes_round_trip(paras, ansi):
    from docstrange_ray.extract.binary_formats import parse_doc_bytes
    from docstrange_ray.synth_files import make_doc

    if ansi:
        paras = [
            p.encode("cp1252", "replace").decode("cp1252") for p in paras
        ]
        paras = [" ".join(p.split()) for p in paras if p.strip()]
    doc = parse_doc_bytes(make_doc(paras, ansi=ansi))
    assert [p["text"] for p in doc["paragraphs"]] == [p for p in paras if p.strip()]


@settings(max_examples=25, deadline=None)
@given(
    sheets=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
                min_size=1,
                max_size=8,
            ),
            st.lists(
                st.lists(
                    st.one_of(
                        _word_text.filter(lambda s: s.strip()),
                        st.integers(-10_000, 10_000),
                        st.floats(
                            allow_nan=False,
                            allow_infinity=False,
                            min_value=-1e6,
                            max_value=1e6,
                        ),
                    ),
                    min_size=1,
                    max_size=4,
                ),
                min_size=1,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    )
)
def test_xls_bytes_round_trip(sheets):
    from docstrange_ray.extract.legacy_office import parse_xls_bytes
    from docstrange_ray.synth_files import make_xls

    book = parse_xls_bytes(make_xls(sheets))
    # a tiny record cap forces SST CONTINUE fragments; must round-trip
    # identically to the unsplit layout
    assert parse_xls_bytes(make_xls(sheets, max_record=64)) == book
    assert [s["name"] for s in book["sheets"]] == [n for n, _ in sheets]
    for parsed, (_, grid) in zip(book["sheets"], sheets):
        for prow, row in zip(parsed["grid"], grid):
            for pcell, cell in zip(prow, row):
                if isinstance(cell, (int, float)) and not isinstance(cell, bool):
                    assert float(pcell) == float(cell)
                else:
                    assert pcell == str(cell)


@settings(max_examples=25, deadline=None)
@given(
    slides=st.lists(
        st.lists(
            _word_text.filter(lambda s: s.strip()), min_size=0, max_size=3
        ),
        min_size=1,
        max_size=3,
    )
)
def test_ppt_bytes_round_trip(slides):
    from docstrange_ray.extract.legacy_office import parse_ppt_bytes
    from docstrange_ray.synth_files import make_ppt

    deck = parse_ppt_bytes(make_ppt(slides))
    assert deck == {"slides": [{"texts": list(t)} for t in slides]}
    # persist-directory layout with per-slide textbox text appended
    deck2 = parse_ppt_bytes(
        make_ppt(slides, textbox_texts=[["box"] for _ in slides])
    )
    assert deck2 == {
        "slides": [
            {"texts": [t for t in texts] + (["box"] if "box" not in texts else [])}
            for texts in slides
        ]
    }
