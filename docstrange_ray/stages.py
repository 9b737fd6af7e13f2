"""Ray Data pipeline stages for the extraction engine.

Physical plan (split-stream; see pipeline.extract_pipeline):

    read ──┬─ map_batches(extract_light)       # stateless tasks, full
           │                                   #   width; finished docs
           │                                   #   never touch a shuffle
           └─ map_batches(explode_heavy)       # heavy tail -> unit rows
                → hash-repartition(dist_key)   # DISTRIBUTE: spread one
                                               #   doc's units cluster-wide
                → map_batches(ExtractUnitActor)# actor pool: layout/OCR
                → hash-repartition(doc_id)     # GATHER for reassembly
                → map_batches(assemble_block)  # columnar reassembly
    union(light, heavy)                        # both exchanges tail-only

Skew handling: a multi-hundred-page document (the reference's sequential
per-page loop, pdf_processor.py:135-161) becomes many independent unit
rows whose extraction spreads across the actor pool; ordering is
restored by the ``seq`` column at reassembly. The explode gate is
cost-based by default (make_skew_gate) so only straggler-class
documents pay the explode/shuffle tax.
"""

from __future__ import annotations

import pyarrow as pa

from docstrange_ray.config import DEFAULT, ExtractConfig
from docstrange_ray.extract.core import extract_spans, extract_unit
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
        # distribution salt: (seq % n_dist) — the key of the DISTRIBUTE
        # exchange that spreads one giant document's units across the
        # cluster before the actor stage (without it, operator fusion
        # keeps all of a doc's units in the task that exploded them and
        # a 500-page scan still straggles one worker)
        ("dist_key", pa.int32()),
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


def make_skew_gate(cfg: ExtractConfig, skew_threshold_units):
    """Build the explode predicate. An explicit int keeps pure
    span-count semantics (tests pin both paths with it); ``'auto'`` (the
    production default) gates on estimated extraction COST so only
    documents that would straggle a task pay the explode/shuffle tax —
    with the mock backend's us-scale units that is nothing, with a
    real-OCR cost model it is every multi-page scan (see
    config.explode_cost_threshold)."""
    if skew_threshold_units == "auto":
        thr = cfg.explode_cost_threshold
        return lambda spans: len(spans) >= 2 and estimate_cost(spans, cfg) >= thr
    return lambda spans: len(spans) >= skew_threshold_units


def make_extract_light(cfg: ExtractConfig = DEFAULT, skew_threshold_units: int = 16):
    """Light-doc branch (stateless tasks, full cluster width): extract
    documents with < threshold input spans inline and emit finished
    (doc_id, spans) rows; heavy documents are DROPPED here (the heavy
    branch re-reads the pruned input — two cheap scans beat shuffling
    every finished document through the reassembly exchange)."""
    explode = make_skew_gate(cfg, skew_threshold_units)

    def extract_light(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for doc_id, in_spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            in_spans = in_spans or []
            if not explode(in_spans):
                out.append(
                    {"doc_id": doc_id, "spans": extract_spans(doc_id, in_spans, cfg)}
                )
        return pa.Table.from_pylist(out, schema=DOCUMENTS_SCHEMA)

    return extract_light


def make_explode_heavy(
    cfg: ExtractConfig = DEFAULT, skew_threshold_units: int = 16, n_dist: int = 64
):
    """Heavy-doc branch: documents with >= threshold input spans explode
    into one unit row per input span (the actor stage's work queue);
    light documents are dropped (they finish in the light branch).
    ``n_dist`` sizes the round-robin distribution salt (see
    UNITS_SCHEMA.dist_key)."""
    explode = make_skew_gate(cfg, skew_threshold_units)

    def explode_heavy(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for doc_id, in_spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            in_spans = in_spans or []
            if not explode(in_spans):
                continue
            cost = estimate_cost(in_spans, cfg)
            try:
                # identical sort key + exception set to the sequential
                # oracle (core.extract_spans) so heavy-path output stays
                # span-equal on malformed documents
                ordered = sorted(in_spans, key=lambda s: int(s.get("offset", 0)))
            except (TypeError, ValueError, AttributeError) as e:
                # same per-document swallow-and-record policy as
                # extract_spans (core.error_span): a malformed offset in
                # one document must not fail the whole task — emit a
                # single finished error-span row for it instead
                from docstrange_ray.extract.core import error_span, finalize_spans

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
                        "dist_key": 0,
                        "spans": finalize_spans([error_span(e)]),
                    }
                )
                continue
            page_no = 0
            table_idx = 0
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
                        "dist_key": seq % n_dist,
                        "spans": [],
                    }
                )
        return pa.Table.from_pylist(out, schema=UNITS_SCHEMA)

    return explode_heavy


def bind_actor(cls: type, **kwargs) -> type:
    """Bake constructor kwargs into a zero-arg subclass for actor-pool
    ``map_batches`` stages, so the UDF's own state rides inside the
    cloudpickled class definition rather than as separate constructor
    arguments. Context: Ray warns (ray#53727) that actor ctor args
    living in the object store make restart fail if those objects are
    lost. With Ray Data 2.49 the warning fires regardless of
    ``fn_constructor_kwargs`` — the residual ctor args are Ray Data's
    own ``_MapWorker.__init__(ctx, ..., map_transformer, ...)``, which
    are DRIVER-owned (a lost copy is re-fetched from the owner), so an
    actor killed mid-job does restart and the job completes —
    exercised by tests/test_pipeline.py::TestActorRestart."""

    def __init__(self):
        cls.__init__(self, **kwargs)

    return type(f"{cls.__name__}Bound", (cls,), {"__init__": __init__})


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
        from docstrange_ray.extract.core import _backend_for

        # Warm-load the layout/OCR backend ONCE per actor (A1-A3/A7
        # co-residency; real weights select via cfg.page_backend). The
        # instance lives in core's per-process cache — the same one
        # extract_unit reads, so the oracle and the actor share it.
        self.backend = _backend_for(self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Split on `done` with Arrow filters so finished documents (whose
        # span lists are the expensive nested payload) pass through
        # zero-copy; only pending unit rows (spans == []) cross the
        # Arrow<->Python boundary. Row order within the batch changes, but
        # reassembly sorts on (doc_id, seq) anyway.
        done_col = batch.column("done")
        n_done = pc.sum(pc.cast(done_col, pa.int32())).as_py() or 0
        if n_done == batch.num_rows:
            return batch
        passthrough = batch.filter(done_col) if n_done else None
        todo = batch.filter(pc.invert(done_col)) if n_done else batch
        rows = todo.to_pylist()
        for r in rows:
            try:
                # backend application (mock identity / pixels projection
                # profiles / docling models) happens INSIDE extract_unit
                # — the one shared point with the sequential oracle, so
                # span equality holds for any configured backend
                r["spans"] = extract_unit(
                    r["unit_kind"],
                    r["payload"],
                    r["media_ref"],
                    r["doc_id"],
                    r["page_no"],
                    r["table_idx"],
                    self.cfg,
                )
            except Exception as e:  # noqa: BLE001 — same swallow-and-record
                # policy as extract_spans (core.error_span): one bad unit
                # must not fail a task of thousands
                from docstrange_ray.extract.core import error_span

                r["spans"] = [error_span(e)]
            r["done"] = True
            r["payload"] = ""
        out = pa.Table.from_pylist(rows, schema=batch.schema)
        return pa.concat_tables([passthrough, out]) if passthrough is not None else out


def assemble_sorted(doc_id_col, spans_col) -> pa.Table:
    """Columnar reassembly of (doc_id, seq)-sorted unit rows into one row
    per document — the vectorized equivalent of finalize_spans over each
    doc's concatenated unit spans: doc boundaries from run-length change
    points, span payloads re-nested zero-copy (ListArray.flatten /
    from_arrays), and the output ``offset`` field rebuilt as the 0-based
    per-doc position with one numpy subtraction. No Python touches a
    span."""
    import numpy as np
    import pyarrow.compute as pc

    dids = (
        doc_id_col.combine_chunks()
        if isinstance(doc_id_col, pa.ChunkedArray)
        else doc_id_col
    )
    spans = (
        spans_col.combine_chunks()
        if isinstance(spans_col, pa.ChunkedArray)
        else spans_col
    )
    n = len(dids)
    if n == 0:
        return pa.Table.from_pylist([], schema=DOCUMENTS_SCHEMA)

    # per-unit span counts (null list -> 0; flatten skips null slots too)
    lens = pc.list_value_length(spans)
    lens = pc.fill_null(lens, 0).to_numpy().astype(np.int64)
    cums = np.concatenate(([0], np.cumsum(lens)))

    # doc boundaries = change points in the sorted doc_id run
    if n == 1:
        starts = np.array([0], dtype=np.int64)
    else:
        neq = pc.not_equal(dids.slice(1), dids.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.where(neq)[0] + 1))
    doc_offsets = np.append(cums[starts], cums[-1])  # into flattened spans

    flat = spans.flatten()
    total = len(flat)
    doc_nspans = doc_offsets[1:] - doc_offsets[:-1]
    # output offset = global span index - owning doc's first span index
    new_offset = np.arange(total, dtype=np.int64) - np.repeat(
        doc_offsets[:-1], doc_nspans
    )
    struct = pa.StructArray.from_arrays(
        [
            pc.fill_null(flat.field("kind"), ""),
            pc.fill_null(flat.field("text"), ""),
            pc.fill_null(flat.field("media_ref"), ""),
            pa.array(new_offset, type=pa.int32()),
        ],
        fields=[SPAN_STRUCT.field(i) for i in range(4)],
    )
    out_spans = pa.ListArray.from_arrays(
        pa.array(doc_offsets, type=pa.int32()), struct
    )
    return pa.Table.from_arrays(
        [dids.take(pa.array(starts)), out_spans], schema=DOCUMENTS_SCHEMA
    )


def assemble_block(block: pa.Table) -> pa.Table:
    """Stage 3 (block-local): reassemble ALL documents in one
    hash-co-located block (see shuffle.grouped_blocks — every doc's unit
    rows are guaranteed to be entirely in this block). One stable sort on
    (doc_id, seq), then the columnar reassembly; no per-group Python
    dispatch, no per-span Python."""
    import pyarrow.compute as pc

    if block.num_rows == 0:
        return pa.Table.from_pylist([], schema=DOCUMENTS_SCHEMA)
    order = pc.sort_indices(
        block, sort_keys=[("doc_id", "ascending"), ("seq", "ascending")]
    )
    block = block.take(order)
    return assemble_sorted(block.column("doc_id"), block.column("spans"))
