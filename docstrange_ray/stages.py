"""Ray Data pipeline stages for the extraction engine.

Physical plan (see SURVEY.md §3.4):

    read (Arrow blocks)
      → map_batches(extract_or_explode)     # stateless tasks: light docs
                                            #   finish inline; docs with
                                            #   >= skew_threshold page units
                                            #   explode into unit rows
      → map_batches(ExtractUnitActor, ...)  # actor pool: layout/OCR units
      → groupby(doc_id).map_groups(assemble)# ordered reassembly (shuffle
                                            #   keyed on doc_id)

Skew handling: a multi-hundred-page document (the reference's sequential
per-page loop, pdf_processor.py:135-161) becomes many independent unit
rows whose extraction spreads across the actor pool; ordering is
restored by the ``seq`` column at reassembly. Light documents never pay
the explode — they carry their finished spans through as single-row
groups.
"""

from __future__ import annotations

import pyarrow as pa

from docstrange_ray.config import DEFAULT, ExtractConfig
from docstrange_ray.extract.core import extract_spans, extract_unit, finalize_spans
from docstrange_ray.schema import DOCUMENTS_SCHEMA, SPAN_STRUCT

# Inter-stage schema: either a finished doc (done=True, spans set) or an
# extraction unit (done=False, payload fields set).
UNITS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("seq", pa.int32()),
        ("done", pa.bool_()),
        ("unit_kind", pa.string()),
        ("payload", pa.string()),
        ("media_ref", pa.string()),
        ("page_no", pa.int32()),
        ("table_idx", pa.int32()),
        ("est_cost", pa.float64()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)


def estimate_cost(spans: list[dict], cfg: ExtractConfig = DEFAULT) -> float:
    """Cheap parse-cost estimate per document: bytes of text + per-page and
    per-media surcharges (SURVEY.md §4.2 skew row). Drives both the
    explode decision and the optional cost-ordered scheduling."""
    cost = 0.0
    for s in spans:
        cost += cfg.cost_per_char * len(s.get("text") or "")
        k = s.get("kind")
        if k == "page-src":
            cost += cfg.cost_per_page
        elif k == "image-ref":
            cost += cfg.cost_per_media_ref
    return cost


def make_extract_or_explode(
    cfg: ExtractConfig = DEFAULT,
    skew_threshold_units: int = 16,
    keep_columns: tuple[str, ...] = (),
):
    """Stage 1 (stateless tasks). Documents with fewer than
    ``skew_threshold_units`` input spans are extracted inline (no shuffle
    ever touches them as units); heavier documents are exploded into one
    row per input span for the actor stage. ``keep_columns`` (e.g. the
    sink's ``part_id``) are propagated onto every emitted row."""

    schema = UNITS_SCHEMA
    for col in keep_columns:
        if col == "part_id":
            schema = schema.append(pa.field("part_id", pa.int32()))
        else:
            schema = schema.append(pa.field(col, pa.string()))

    def extract_or_explode(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        kept = {c: batch.column(c).to_pylist() for c in keep_columns}
        for row_idx, (doc_id, in_spans) in enumerate(zip(doc_ids, spans_col)):
            kept_vals = {c: kept[c][row_idx] for c in keep_columns}
            in_spans = in_spans or []
            cost = estimate_cost(in_spans, cfg)
            if len(in_spans) < skew_threshold_units:
                out.append(
                    {
                        "doc_id": doc_id,
                        "seq": 0,
                        "done": True,
                        "unit_kind": "",
                        "payload": "",
                        "media_ref": "",
                        "page_no": 0,
                        "table_idx": 0,
                        "est_cost": cost,
                        "spans": extract_spans(doc_id, in_spans, cfg),
                        **kept_vals,
                    }
                )
            else:
                page_no = 0
                table_idx = 0
                ordered = sorted(in_spans, key=lambda s: int(s.get("offset", 0)))
                for seq, s in enumerate(ordered):
                    kind = s.get("kind", "")
                    if kind == "page-src":
                        page_no += 1
                    if kind == "table-src":
                        table_idx += 1
                    out.append(
                        {
                            "doc_id": doc_id,
                            "seq": seq,
                            "done": False,
                            "unit_kind": kind,
                            "payload": s.get("text", "") or "",
                            "media_ref": s.get("media_ref", "") or "",
                            "page_no": page_no,
                            "table_idx": table_idx,
                            "est_cost": cost / max(1, len(ordered)),
                            "spans": [],
                            **kept_vals,
                        }
                    )
        return pa.Table.from_pylist(out, schema=schema)

    return extract_or_explode


class ExtractUnitActor:
    """Stage 2: the stateful layout/OCR stage as an actor-pool callable.

    Mirrors the reference's model-holding processors (SURVEY.md §2.3 A1-A3,
    A7: models constructed once, reused across pages,
    pdf_processor.py:24-32). Here the "model" is the deterministic mock
    layout/OCR backend plus compiled classification regexes — loaded once
    per actor in ``__init__``; real weights would drop in behind the same
    interface (model_downloader.py:61-143 semantics).
    """

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or DEFAULT
        # Force-compile all classification/cleaning regexes once per actor.
        from docstrange_ray.extract import classify, cleaners, markdown_extract  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        done_mask = batch.column("done").to_pylist()
        if all(done_mask):
            return batch
        rows = batch.to_pylist()
        for r in rows:
            if r["done"]:
                continue
            r["spans"] = extract_unit(
                r["unit_kind"],
                r["payload"],
                r["media_ref"],
                r["doc_id"],
                r["page_no"],
                r["table_idx"],
                self.cfg,
            )
            r["done"] = True
            r["payload"] = ""
        return pa.Table.from_pylist(rows, schema=batch.schema)


def assemble_group(group: pa.Table) -> pa.Table:
    """Reassemble one document from its (seq-ordered) unit rows, assigning
    final span order. Ordering contract: output span order is input-span
    order (seq), then within-unit emission order — identical to the
    sequential oracle's loop (SURVEY.md §7.4 item 3)."""
    import pyarrow.compute as pc

    order = pc.sort_indices(group, sort_keys=[("seq", "ascending")])
    group = group.take(order)
    doc_id = group.column("doc_id")[0].as_py()
    spans: list[dict] = []
    for unit_spans in group.column("spans").to_pylist():
        spans.extend(unit_spans or [])
    return pa.Table.from_pylist(
        [{"doc_id": doc_id, "spans": finalize_spans(spans)}], schema=DOCUMENTS_SCHEMA
    )


def assemble_block(block: pa.Table) -> pa.Table:
    """Stage 3 (block-local): reassemble ALL documents in one
    hash-co-located block (see shuffle.grouped_blocks — every doc's unit
    rows are guaranteed to be entirely in this block). One stable sort on
    (doc_id, seq), then a single walk; no per-group Python dispatch."""
    import pyarrow.compute as pc

    order = pc.sort_indices(
        block, sort_keys=[("doc_id", "ascending"), ("seq", "ascending")]
    )
    block = block.take(order)
    doc_ids = block.column("doc_id").to_pylist()
    span_lists = block.column("spans").to_pylist()
    rows: list[dict] = []
    cur_id: str | None = None
    cur_spans: list[dict] = []
    for did, spans in zip(doc_ids, span_lists):
        if did != cur_id:
            if cur_id is not None:
                rows.append({"doc_id": cur_id, "spans": finalize_spans(cur_spans)})
            cur_id, cur_spans = did, []
        cur_spans.extend(spans or [])
    if cur_id is not None:
        rows.append({"doc_id": cur_id, "spans": finalize_spans(cur_spans)})
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
