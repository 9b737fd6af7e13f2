"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` spans three families:
  * extraction — the flagship docstrange-capability pipeline over the
    deterministic synthetic interleaved-span corpus (NOT SQL-expressible:
    DOM pruning / layout heuristics; the span-equality gate for these
    lives in ``tests/`` against the sequential oracle). Rows-only checks.
  * training-data ops — dedup / fingerprints / token & quality stats /
    ANN over ``documents`` & ``embeddings``, each with a DuckDB oracle
    where SQL can express it.
  * relational — groupby/join/sort/window shapes over the TPC-H-ish
    tables, all DuckDB-oracled with exact integer arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


# --- helpers ----------------------------------------------------------------

_EXTRACT_DOCS_CAP = 2000

# mixture_weights targets — mirrored literally in the oracle SQL VALUES
MIXTURE_TARGETS = {"src0": 0.3, "src1": 0.25, "src2": 0.2, "src3": 0.15, "src4": 0.1}


def _corpus_size(sf_dir: str) -> int:
    """Deterministic synthetic corpus size for this sf tier (scaled off
    the documents table's row count, capped per FIXTURES.md §3)."""
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return max(200, min(_EXTRACT_DOCS_CAP, n))


def _synth_ds(sf_dir: str):
    from docstrange_ray.shuffle import ensure_hash_shuffle
    from docstrange_ray.synth import synth_dataset

    ensure_hash_shuffle()
    return synth_dataset(_corpus_size(sf_dir), seed=42)


def _extracted(sf_dir: str):
    from docstrange_ray.pipeline import extract_pipeline

    return extract_pipeline(_synth_ds(sf_dir))


# --- driver contract --------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthetic interleaved
    corpus → adaptive extraction (inline light docs at full width; the
    explode → actor pool → reassembly branch engages when the cost gate
    finds straggler-class documents) → markdown projection column."""
    from docstrange_ray.projections import add_projection

    out = _extracted("/root/testdata/sf0.001")
    return add_projection(out, "markdown")


def queries() -> dict[str, Callable[[str], Any]]:
    import ray.data

    from docstrange_ray.ops import ann, dedup, textstats
    from docstrange_ray import relational
    from docstrange_ray.projections import add_projection
    from docstrange_ray.shuffle import ensure_hash_shuffle

    ensure_hash_shuffle()

    # Write the extraction spec-oracle fixtures (synth_expected.py) for every
    # test-data tier up front, so the DuckDB oracle's read_parquet() finds
    # them regardless of which side the driver runs first. Idempotent and
    # cheap (~2 s total, cached on disk).
    import glob as _glob

    from docstrange_ray.synth_expected import write_expected_fixtures

    for _sf in _glob.glob("/root/testdata/sf*"):
        try:
            write_expected_fixtures(_corpus_size(_sf))
        except OSError:
            pass  # fixture dir unwritable: extraction oracles fall back red

    from docstrange_ray.io import read_parquet_clean

    def read_docs(sf_dir):
        # clean read: the driver parquet carries b'pandas' schema
        # metadata that breaks Ray's schema-hash dedup on every exchange
        return read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    def read_docs_lang(sf_dir):
        # classifier features need the label column too (column-pruned)
        return read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )

    def read_docs_src(sf_dir):
        return read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )

    def read_emb(sf_dir):
        return read_parquet_clean(f"{sf_dir}/embeddings.parquet")

    # -- extraction family (rows-only: non-SQL-expressible semantics) --
    def extract_flagship(sf_dir):
        def flatten(batch: pa.Table) -> pa.Table:
            # columnar explode: list flatten is zero-copy on the struct
            # child; doc_id repeats by per-row span counts
            import pyarrow.compute as pc

            from docstrange_ray.schema import FLAT_SPANS_SCHEMA

            spans = batch.column("spans").combine_chunks()
            lens = pc.fill_null(pc.list_value_length(spans), 0).to_numpy()
            flat = spans.flatten()
            doc_ids = pa.array(
                np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), lens)
            )
            return pa.Table.from_arrays(
                [
                    doc_ids,
                    flat.field("offset"),
                    flat.field("kind"),
                    flat.field("text"),
                    flat.field("media_ref"),
                ],
                schema=FLAT_SPANS_SCHEMA,
            )

        return _extracted(sf_dir).map_batches(flatten, batch_format="pyarrow")

    def real_format_extract(sf_dir):
        """REAL file bytes end-to-end: deterministic .docx/.xlsx/.pptx/
        .pdf/.csv/.txt/.html fixture files (stdlib writers; genuinely
        valid formats) → read_binary_files → stdlib binary parsers →
        the full adaptive extract_pipeline → flat span rows. Gated by
        span equality vs the sequential oracle in
        tests/test_real_formats.py (no SQL oracle: extraction
        semantics)."""
        import hashlib
        import os

        from docstrange_ray.sources import extract_files
        from docstrange_ray.synth_files import write_fixture_corpus

        from docstrange_ray.synth_files import FIXTURE_VERSION

        out = (
            f"/tmp/dsray_real_fixtures_v{FIXTURE_VERSION}_"
            f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
        )
        if not os.path.isdir(out):
            write_fixture_corpus(out)

        def flatten(batch: pa.Table) -> pa.Table:
            from docstrange_ray.schema import FLAT_SPANS_SCHEMA

            rows = []
            for did, spans in zip(
                batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
            ):
                for s in spans:
                    rows.append({"doc_id": did, **s})
            return pa.Table.from_pylist(rows, schema=FLAT_SPANS_SCHEMA)

        return extract_files(out).map_batches(flatten, batch_format="pyarrow")

    def pixel_layout_extract(sf_dir):
        """REAL pixel-based layout end-to-end: deterministic page-image
        PNGs (text-line bands) → the S12 image route with
        page_backend='pixels' (projection-profile line segmentation over
        stdlib-decoded pixels) → per-line spans with real geometry.
        Oracle-parity gated by TestPixelsBackend (no SQL: extraction
        semantics)."""
        import hashlib
        import os
        from dataclasses import replace

        import numpy as np

        from docstrange_ray.config import DEFAULT as _DCFG
        from docstrange_ray.sources import extract_files
        from docstrange_ray.synth_files import make_png_gray

        from docstrange_ray.synth_files import make_table_png, make_text_png

        out = (
            "/tmp/dsray_pixel_pages_v4_"
            f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
        )
        if not os.path.isdir(out):
            os.makedirs(out, exist_ok=True)
            for i in range(8):
                img = np.full((80, 120), 250, dtype=np.uint8)
                for li in range(2 + i % 3):  # 2-4 text-line bands
                    y0 = 6 + li * 24
                    img[y0 : y0 + 7 + (i % 2), 8 : 110 - (li * 9) % 40] = 20
                with open(os.path.join(out, f"page{i}.png"), "wb") as f:
                    f.write(make_png_gray(img))
            # glyph-font pages: the recognizer reads ACTUAL text back
            # from actual pixels (extract/glyphs template matcher);
            # scale cycles 1/2/3 so the reference's 2x-zoom rasterization
            # path (pdf_processor.py:139) is exercised end-to-end
            for i in range(4):
                lines = [f"PAGE {i + 2} OF 9", "RAY DATA ENGINE", f"SECTION {i + 2}-A"]
                with open(os.path.join(out, f"text{i}.png"), "wb") as f:
                    f.write(make_text_png(lines, scale=1 + i % 3))
            # ruled-table pages: grid structure + per-cell glyph OCR
            # (the TableFormer-analogue path, extract/backends._detect_tables)
            for i in range(2):
                grid = [
                    ["ITEM", "QTY", "PRICE"],
                    [f"PART {i + 2}A", str(7 + i), f"{i + 3}.25"],
                    [f"PART {i + 2}B", str(12 + i), f"{i + 4}.50"],
                ]
                with open(os.path.join(out, f"table{i}.png"), "wb") as f:
                    f.write(make_table_png(grid))

        def flatten(batch: pa.Table) -> pa.Table:
            from docstrange_ray.schema import FLAT_SPANS_SCHEMA

            rows = []
            for did, spans in zip(
                batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
            ):
                for s in spans:
                    rows.append({"doc_id": did, **s})
            return pa.Table.from_pylist(rows, schema=FLAT_SPANS_SCHEMA)

        cfg = replace(_DCFG, page_backend="pixels")
        return extract_files(out, cfg).map_batches(flatten, batch_format="pyarrow")

    def _spec_subset(sf_dir, ds):
        """Restrict an extraction result to the spec-oracle subset (the
        non-paged populations whose expected output is closed-form from the
        generator structure — synth_expected.py). The engine still extracts
        the FULL corpus upstream (extract_flagship covers the paged docs
        rows-only + pytest span-equality); this filter makes the driver's
        rows+schema+hash comparison against the expected-span fixture a
        genuine end-to-end extraction check."""
        import pyarrow.compute as pc

        from docstrange_ray.synth_expected import oracleable_doc_ids

        ids = pa.array(sorted(oracleable_doc_ids(_corpus_size(sf_dir))))

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column("doc_id"), value_set=ids))

        return ds.map_batches(keep, batch_format="pyarrow")

    def extract_markdown(sf_dir):
        return _spec_subset(
            sf_dir,
            add_projection(_extracted(sf_dir), "markdown").select_columns(
                ["doc_id", "markdown"]
            ),
        )

    def extract_html(sf_dir):
        return _spec_subset(
            sf_dir,
            add_projection(_extracted(sf_dir), "html").select_columns(
                ["doc_id", "html"]
            ),
        )

    def extract_csv(sf_dir):
        return _spec_subset(
            sf_dir,
            add_projection(_extracted(sf_dir), "csv").select_columns(
                ["doc_id", "csv"]
            ),
        )

    def section_chunks(sf_dir):
        from docstrange_ray.projections import chunk_documents

        return _spec_subset(
            sf_dir, chunk_documents(_extracted(sf_dir), token_budget=512)
        )

    def search_docs(sf_dir):
        from docstrange_ray.projections import search_documents
        from docstrange_ray.synth_expected import SEARCH_NEEDLE

        return _spec_subset(
            sf_dir,
            search_documents(_extracted(sf_dir), SEARCH_NEEDLE, context_lines=2),
        )

    def doc_headers(sf_dir):
        from docstrange_ray.projections import document_headers

        return _spec_subset(sf_dir, document_headers(_extracted(sf_dir)))

    def doc_summaries(sf_dir):
        from docstrange_ray.projections import section_summaries

        return _spec_subset(sf_dir, section_summaries(_extracted(sf_dir)))

    def doc_structure(sf_dir):
        from docstrange_ray.projections import hierarchical_structure

        return _spec_subset(sf_dir, hierarchical_structure(_extracted(sf_dir)))

    def field_extraction(sf_dir):
        """Schema-driven field extraction over the real-format fixture
        corpus (its DOCX/XLSX tables carry extractable key/value
        fields)."""
        import hashlib
        import os

        from docstrange_ray.ops.fields import extract_fields
        from docstrange_ray.sources import extract_files
        from docstrange_ray.synth_files import write_fixture_corpus

        from docstrange_ray.synth_files import FIXTURE_VERSION

        out = (
            f"/tmp/dsray_real_fixtures_v{FIXTURE_VERSION}_"
            f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
        )
        if not os.path.isdir(out):
            write_fixture_corpus(out)
        return extract_fields(
            extract_files(out), ["revenue", "costs", "region", "name"]
        )

    def schema_extraction(sf_dir):
        """Nested json_schema variant over the same real-format fixture
        corpus (ops/fields.extract_with_schema — VERDICT r4 #10):
        typed scalars + nested object + array-of-object (table rows
        under covering headers); one JSON row per doc. Rules-based
        behind the documented LLM seam; cast matrix and nested walk
        pinned in tests/test_navigation_fields.py."""
        import hashlib
        import os

        from docstrange_ray.ops.fields import extract_with_schema
        from docstrange_ray.sources import extract_files
        from docstrange_ray.synth_files import FIXTURE_VERSION, write_fixture_corpus

        out = (
            f"/tmp/dsray_real_fixtures_v{FIXTURE_VERSION}_"
            f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
        )
        if not os.path.isdir(out):
            write_fixture_corpus(out)
        schema = {
            "properties": {
                "revenue": {"type": "number"},
                "meta": {
                    "type": "object",
                    "properties": {
                        "region": {"type": "string"},
                        "name": {"type": "string"},
                    },
                },
                "rows": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "properties": {
                            "region": {"type": "string"},
                            "total": {"type": "integer"},
                        },
                    },
                },
            }
        }
        return extract_with_schema(extract_files(out), schema)

    def extract_doc_meta(sf_dir):
        from docstrange_ray.projections import spans_to_json

        def meta(batch: pa.Table) -> pa.Table:
            rows = []
            for did, spans in zip(
                batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
            ):
                m = spans_to_json(list(spans))["document"]["metadata"]
                rows.append(
                    {
                        "doc_id": did,
                        "n_spans": len(spans),
                        "section_count": m["section_count"],
                        "max_heading_level": m["max_heading_level"],
                        "has_tables": m["has_tables"],
                        "has_images": m["has_images"],
                    }
                )
            return pa.Table.from_pylist(rows)

        return _spec_subset(
            sf_dir, _extracted(sf_dir).map_batches(meta, batch_format="pyarrow")
        )

    # -- training-data ops --
    def token_count(sf_dir):
        return read_docs(sf_dir).map_batches(
            textstats.token_stats, batch_format="pyarrow"
        )

    def top_ngrams(sf_dir):
        """Corpus 3-gram frequency top-100: partial reduce per batch ->
        ONE ngram shuffle -> block-local top-k + coalesced final."""
        return textstats.top_ngrams(read_docs(sf_dir), n=3, k=100)

    def tfidf_terms(sf_dir):
        """Per-doc top-5 tf-idf terms: distributed df (one term shuffle)
        broadcast back, per-doc scoring with no second shuffle."""
        return textstats.tfidf_topk(read_docs(sf_dir), k=5)

    def global_length_rank(sf_dir):
        """Global RANK() (ties share rank) over n_chars DESC — the
        tie-sharing sibling of global_doc_rank; exactness relies on
        equal keys never splitting across range buckets."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.shuffle import global_row_number

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        return global_row_number(
            docs, "n_chars", descending=True, tiebreak="doc_id", rank_kind="rank"
        )

    def late_suppliers(sf_dir):
        """Q21-shape EXISTS + NOT-EXISTS self-join: sole late shipper
        on multi-supplier 'F' orders, resolved in ONE tagged orderkey
        exchange (relational.sole_late_supplier)."""
        from docstrange_ray import relational

        return relational.sole_late_supplier(sf_dir)

    def source_overlap(sf_dir):
        """Pairwise source vocabulary Jaccard (mixture-curation
        diagnostic): distinct (source, word) partial -> ONE word
        shuffle -> pair-count partials -> bounded coalesced final."""
        from docstrange_ray.io import read_parquet_clean

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        return textstats.source_vocab_overlap(docs)

    def global_doc_rank(sf_dir):
        """Global ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id):
        deterministic sample-based range partitioning -> ONE range
        exchange -> bounded per-bucket count pass -> offset broadcast
        -> in-bucket rank emit (shuffle.global_row_number)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.shuffle import global_row_number

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        return global_row_number(docs, "n_chars", descending=True, tiebreak="doc_id")

    def ensemble_rank(sf_dir):
        """Reciprocal-rank fusion (ops/fusion.py, Cormack et al. 2009)
        of three exact full-corpus rankings — length (DESC), whitespace
        token count (DESC), md5 order (the deterministic-shuffle rank).
        Terms are added in fixed list order (left-associated float64),
        so the fused doubles are bit-identical to the SQL expression
        1/(60+r0) + 1/(60+r1) + 1/(60+r2)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops import textstats
        from docstrange_ray.ops.fusion import rrf_fuse
        from docstrange_ray.shuffle import global_row_number

        docs = read_docs(sf_dir)

        def sel(ds):
            return ds.select_columns(["doc_id", "rank"])

        r0 = sel(
            global_row_number(
                read_parquet_clean(
                    f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
                ),
                "n_chars",
                descending=True,
                tiebreak="doc_id",
            )
        )
        toks = docs.map_batches(textstats.token_stats, batch_format="pyarrow")
        r1 = sel(
            global_row_number(
                toks.select_columns(["doc_id", "n_ws_tokens"]),
                "n_ws_tokens",
                descending=True,
                tiebreak="doc_id",
            )
        )

        def md5key(batch: pa.Table) -> pa.Table:
            from docstrange_ray.numerics import md5_key52

            ids = batch.column("doc_id").to_pylist()
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "h": pa.array([md5_key52(i) for i in ids], pa.int64()),
                }
            )

        r2 = sel(
            global_row_number(
                docs.select_columns(["doc_id"]).map_batches(
                    md5key, batch_format="pyarrow"
                ),
                "h",
                descending=False,
                tiebreak="doc_id",
            )
        )
        return rrf_fuse([r0, r1, r2])

    def zorder_layout_keys(sf_dir):
        """Z-order clustering keys (ops/zorder.py): interleave the bits
        of (n_chars, ws-token count) into one int64 Morton key — the
        write-layout op behind OPTIMIZE ZORDER BY; sorting output by
        zkey makes per-file min-max stats selective on BOTH columns.
        Both dims come from one row, so it is ONE shuffle-free scan
        (token_stats kernel inline); oracle = SUM over bit positions."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops import textstats
        from docstrange_ray.ops.zorder import zorder_keys

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        )

        def dims(batch: pa.Table) -> pa.Table:
            toks = textstats.token_stats(batch)
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_chars": batch.column("n_chars"),
                    "n_ws_tokens": toks.column("n_ws_tokens"),
                }
            )

        return zorder_keys(
            docs.map_batches(dims, batch_format="pyarrow"),
            ["n_chars", "n_ws_tokens"],
            bits=21,
        )

    def price_winsorized(sf_dir):
        """Winsorization at exact global quantiles (rankstats.winsorize):
        clip o_totalprice to [p01, p99] found by scan-only radix
        selection — the robust-stats pretreatment, zero shuffles."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import winsorize

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        return winsorize(orders, "o_totalprice", lower=(1, 100), upper=(99, 100))

    def frequent_part_triples(sf_dir):
        """Distributed A-Priori 3-itemset mining (ops/itemsets.py) over
        order baskets: one basket co-location exchange reused by every
        level, then level-wise counting passes with broadcast candidate
        prunes (a triple is counted only when all three member pairs
        are frequent). Oracle = the brute all-triples self-join — a
        different algorithm agreeing on the exact support table."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.itemsets import frequent_triples

        li = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
        return frequent_triples(li, "l_orderkey", "l_partkey", min_support=2)

    def part_rules_q(sf_dir):
        """Association rules over frequent part pairs (itemsets.
        association_rules — Agrawal & Srikant 1994): both directed
        rules per frequent pair with exact-count n_ab/n_a/n_b and
        confidence / lift as single double divisions of exact ints
        (round6) — the market-basket output a recommender consumes.
        Oracle = brute pair self-join + the same two divisions."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.itemsets import association_rules

        li = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
        return association_rules(li, "l_orderkey", "l_partkey", min_support=2)

    def cooccurrence_pairs(sf_dir):
        """Windowed word co-occurrence top-200 (textstats.
        cooccurrence_topk): the word2vec/GloVe prep stage — vectorized
        shifted-array pair stream, per-batch distinct-pair pre-reduce,
        ONE pair exchange, coalesced top-k final."""
        return textstats.cooccurrence_topk(read_docs(sf_dir), window=5, k=200)

    def bootstrap_price_means(sf_dir):
        """Poisson-bootstrap replicate means of order price (ops/
        bootstrap.py, Chamandy et al. 2012): per-(row, replicate)
        Poisson(1) weights from the md5-key idiom with FIXED integer
        CDF thresholds, int-cent weighted sums in ONE streaming pass,
        bounded (replicates x 3) partials — distributed confidence
        intervals with zero resampling shuffles."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.bootstrap import bootstrap_replicate_means

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        return bootstrap_replicate_means(
            orders, "o_orderkey", "o_totalprice", replicates=16
        )

    def label_centroid_sims(sf_dir):
        """Domain-similarity matrix (semantic.label_centroid_sims):
        pairwise cosine between per-label embedding centroids. Values
        quantized to 2^20 integer units BEFORE any reduction (order-
        independent integer sums; bigint/HUGEINT dot products), then
        one exactly-mirrored float conversion chain — bit-exact vs
        SQL."""
        from docstrange_ray.ops.semantic import label_centroid_sims as _lcs

        return _lcs(read_emb(sf_dir))

    def orders_profile(sf_dir):
        """One-scan table profile (ops/profile.py): per-column row/null
        counts and min/max — strings by code-point length, timestamps
        by epoch microseconds, everything else as float64. Bounded
        per-batch partials, coalesced final, zero shuffles."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.profile import profile_table

        return profile_table(read_parquet_clean(f"{sf_dir}/orders.parquet"))

    def bm25_search(sf_dir):
        """Okapi BM25 top-20 lexical retrieval for a fixed 3-term query:
        one bounded stats pass (docs/words/df partials), then a
        shuffle-free scoring scan with block-local top-k + coalesced
        final. Float expression shape + summation order pinned so the
        DuckDB oracle reproduces the exact doubles."""
        return textstats.bm25_topk(
            read_docs(sf_dir), ["customer", "merge", "window"], k=20
        )

    def lm_quality(sf_dir):
        """Bigram LM cross-entropy scoring (CCNet-recipe shape): corpus
        counts distributed, vocabulary-scale broadcast, shuffle-free
        per-doc scoring."""
        return textstats.lm_score(read_docs(sf_dir))

    def pii_scrub_q(sf_dir):
        """PII detection + redaction in one pass (Arrow RE2 kernels,
        shuffle-free). The synthetic corpus has no natural PII, so the
        query first dirties each doc with DETERMINISTIC doc_id-derived
        PII (email / ipv4 / ssn / phone) — mirrored verbatim in the SQL
        oracle — then scrubs it. The injection is fixture dressing
        (plain Python over a 500-row table); the scrub itself is the
        op under test and stays fully vectorized."""
        from docstrange_ray.ops import pii

        def dirty(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out = [
                f"{t} contact user{i}@example.com ip 10.{i % 256}.0.{i % 100}"
                f" ssn 123-45-{i % 10000:04d} call (415) 555-{i % 10000:04d}"
                for i, t in zip(ids, texts)
            ]
            return pa.Table.from_arrays(
                [batch.column("doc_id"), pa.array(out, pa.string())],
                names=["doc_id", "text"],
            )

        return read_docs(sf_dir).map_batches(
            dirty, batch_format="pyarrow"
        ).map_batches(pii.pii_scrub, batch_format="pyarrow")

    def decontaminate_q(sf_dir):
        """Benchmark decontamination: docs with doc_id % 97 == 0 act as
        the held-out benchmark; every other doc sharing a distinct
        3-gram with it is flagged with its overlap count (n=13 in
        production; 3 here because the fixture vocabulary is ~30 words,
        so longer grams never collide). Broadcast benchmark gram set +
        ONE shuffle-free corpus scan."""
        from docstrange_ray.ops import decontam

        def split(want_bench):
            def f(batch: pa.Table) -> pa.Table:
                mask = (batch.column("doc_id").to_numpy() % 97 == 0) == want_bench
                return batch.filter(pa.array(mask))

            return f

        docs = read_docs(sf_dir)
        bench = docs.map_batches(split(True), batch_format="pyarrow")
        train = docs.map_batches(split(False), batch_format="pyarrow")
        return decontam.decontaminate(train, bench, n=3)

    def gopher_filter(sf_dir):
        """Gopher-style quality rules (word-count / mean-word-length /
        alpha-fraction / stopword-floor bounds) with rule inputs as
        columns — shuffle-free map stage."""
        return read_docs(sf_dir).map_batches(
            textstats.gopher_quality_filter, batch_format="pyarrow"
        )

    def repetition(sf_dir):
        """Gopher-style intra-doc repetition signals (dup-word /
        top-2-gram / dup-5-gram fractions) — shuffle-free map stage."""
        return read_docs(sf_dir).map_batches(
            textstats.repetition_stats, batch_format="pyarrow"
        )

    def quality_stats(sf_dir):
        return read_docs(sf_dir).map_batches(
            textstats.quality_stats, batch_format="pyarrow"
        )

    def content_fp(sf_dir):
        return (
            read_docs(sf_dir)
            .map_batches(textstats.content_fingerprint, batch_format="pyarrow")
            .select_columns(["doc_id", "content_md5"])
        )

    def exact_dedup(sf_dir):
        return dedup.exact_dedup_groups(read_docs(sf_dir))

    def approx_length_quantiles_q(sf_dir):
        """MRL-sketch per-source length quantiles: the unbounded-value
        answer to the exact `length_quantiles` histogram exchange.
        Rows-only driver check; rank-error bound and the small-group
        exactness property are pinned by tests/test_ops.py::TestMRL."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sketch import approx_quantiles

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
        )
        return approx_quantiles(docs, value_col="n_chars", group_key="source")

    def approx_user_reach_q(sf_dir):
        """HyperLogLog distinct users per event type: one-pass,
        shuffle-free register partials (16 KiB per group per batch
        regardless of cardinality). SQL-oracled EXACTLY: the sketch is
        deterministic given the md5 hash, so the oracle rebuilds the
        registers and the bias-corrected estimate in SQL; the ~0.8%
        error band vs truth and batching-invariance are additionally
        pinned by tests/test_ops.py::TestHLL; the exact twin is
        `event_user_reach`."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sketch import approx_distinct

        ev = read_parquet_clean(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        )
        return approx_distinct(ev, value_col="user_id", group_key="event_type")

    def vocab_encode_q(sf_dir):
        """Top-20 vocabulary build (distributed counts -> dense rank)
        + broadcast token-id encode; exploded (doc_id, pos, token_id)
        stream, OOV = 0. SQL-oracled end-to-end."""
        from docstrange_ray.ops.textstats import vocab_encode

        return vocab_encode(read_docs(sf_dir), vocab_size=20)

    def bpe_pair_counts_q(sf_dir):
        """First-iteration BPE statistics: top-50 adjacent character
        pairs within words, weighted by word frequency (ONE word
        exchange -> bounded pair final). SQL-oracled via character
        arithmetic over the word table."""
        from docstrange_ray.ops import bpe

        return bpe.pair_counts(read_docs(sf_dir), top_k=50)

    def bpe_merges_q(sf_dir):
        """Learned BPE merge list (rank, left, right, freq), 32 merges,
        Sennrich tie-break (freq DESC, pair ASC). The auto plan gates
        in-memory vs distributed on the counted word-type table; plan
        parity and a sequential ground-truth oracle are pinned in
        tests/test_bpe.py (iterative — not SQL-expressible)."""
        from docstrange_ray.ops import bpe

        return bpe.bpe_train(read_docs(sf_dir), n_merges=32)

    def bpe_token_counts_q(sf_dir):
        """Per-doc token counts under the learned 32-merge BPE:
        broadcast merge list, distinct-word factorize encode per batch,
        shuffle-free (pytest-oracled vs per-word sequential encode)."""
        from docstrange_ray.ops import bpe

        docs = read_docs(sf_dir)
        merges = bpe.bpe_train(docs, n_merges=32)
        return bpe.bpe_encode_counts(docs, merges)

    def byte_bpe_pair_counts_q(sf_dir):
        """First-iteration BYTE-level BPE statistics (GPT-2-style,
        ops/bytebpe): top-50 adjacent mapped-byte pairs within regex
        pre-tokens, weighted by pre-token frequency — ONE pre-token
        exchange -> bounded pair final. SQL-oracled (RE2
        pre-tokenization + byte-map CASE + LEAD pairing share the
        module's contract constants verbatim)."""
        from docstrange_ray.ops import bytebpe

        return bytebpe.byte_pair_counts(read_docs(sf_dir), top_k=50)

    def byte_bpe_tokens_q(sf_dir):
        """Train 24 byte-level merges on the corpus, then per-doc token
        counts under them (broadcast merge list, distinct-pretoken
        cache per batch, shuffle-free). Iterative + encoder semantics —
        pytest-oracled (plan parity + arbitrary-byte round-trip in
        tests/test_bytebpe.py), rows-only here."""
        from docstrange_ray.ops import bytebpe

        docs = read_docs(sf_dir)
        merges = bytebpe.byte_bpe_train(docs, n_merges=24)
        return bytebpe.byte_bpe_token_counts(docs, merges)

    def wp_pair_stats_q(sf_dir):
        """First-iteration WordPiece statistics: top-50 character pairs
        by likelihood-gain score freq(ab)/(freq(a)·freq(b)) — emitted
        as the five INT columns (the score is the derived ratio).
        ONE word exchange + bounded pair/symbol finals; the symbol
        inventory broadcast is alphabet-bounded. SQL-oracled."""
        from docstrange_ray.ops import wordpiece

        return wordpiece.pair_stats(read_docs(sf_dir), top_k=50)

    def wp_merges_q(sf_dir):
        """Learned WordPiece merge list (24 merges): per-iteration
        bounded pair + symbol exchanges, float64 shortlist + EXACT
        integer-fraction final argmax, (left, right) tie-break. Plan
        parity and a Fraction-based ground truth pinned in
        tests/test_wordpiece.py (iterative — not SQL-expressible)."""
        from docstrange_ray.ops import wordpiece

        return wordpiece.wordpiece_train(read_docs(sf_dir), n_merges=24)

    def wp_token_counts_q(sf_dir):
        """Per-doc token counts under the learned WordPiece vocab:
        broadcast piece sets, distinct-word factorize, greedy
        longest-match encode (BERT semantics, character fallback).
        Pytest-oracled vs the per-word encoder."""
        from docstrange_ray.ops import wordpiece

        docs = read_docs(sf_dir)
        merges = wordpiece.wordpiece_train(docs, n_merges=24)
        return wordpiece.wordpiece_encode_counts(docs, merges)

    def unigram_seed_counts_q(sf_dir):
        """First-iteration unigram-LM (SentencePiece) statistics:
        top-50 seed substrings (length <= 4) of word types weighted by
        word frequency (ONE word exchange -> bounded substring final).
        SQL-oracled via substring arithmetic over the word table."""
        from docstrange_ray.ops import unigram

        return unigram.seed_counts(read_docs(sf_dir), max_piece_len=4, top_k=50)

    def unigram_vocab_q(sf_dir):
        """Learned unigram-LM piece vocabulary (piece, logp), 64 pieces,
        deterministic hard-EM (Viterbi) with exact integer expected
        counts — local and distributed plans bit-identical, pinned in
        tests/test_unigram.py (iterative — not SQL-expressible)."""
        from docstrange_ray.ops import unigram

        return unigram.unigram_train(read_docs(sf_dir), vocab_size=64)

    def unigram_token_counts_q(sf_dir):
        """Per-doc token counts under the learned 64-piece unigram LM:
        broadcast vocab, distinct-word factorize Viterbi encode per
        batch, shuffle-free (pytest-oracled vs an independent DP)."""
        from docstrange_ray.ops import unigram

        docs = read_docs(sf_dir)
        vocab = unigram.unigram_train(docs, vocab_size=64)
        return unigram.unigram_encode_counts(docs, vocab)

    def logreg_grad0_q(sf_dir):
        """2x the logistic log-likelihood gradient at w=0 for the
        lang=='en' quality-signal classifier: per feature,
        sum(x * (2y-1)) — exact int64 (p(0)=1/2 exactly), ONE scan with
        single-row block partials. SQL-oracled."""
        from docstrange_ray.ops import classifier

        return classifier.grad_at_zero(read_docs_lang(sf_dir))

    def quality_classifier_q(sf_dir):
        """Distributed IRLS logistic regression (Spark-MLlib shape:
        per-block ZᵀWZ / Zᵀ(y-p) partials, d²-float exchange per
        iteration) predicting lang=='en' from the exact quality
        signals; returns (feature, coef_raw, coef_std). Pinned in
        tests/test_classifier.py vs an independent whole-matrix IRLS
        (iterative float optimum — not SQL-expressible)."""
        from docstrange_ray.ops import classifier

        return classifier.train_logreg(read_docs_lang(sf_dir))

    def classifier_eval_q(sf_dir):
        """Train + score in-corpus: one confusion-matrix row
        (tp, fp, fn, tn, accuracy) under the trained classifier —
        broadcast coefficients, shuffle-free scoring scan. NOTE: the
        driver testdata's lang label is statistically independent of
        its text, so converging to the base rate IS the correct fit
        here; tests/test_classifier.py pins that the same estimator
        recovers a planted signal when one exists."""
        from docstrange_ray.ops import classifier

        return classifier.confusion(read_docs_lang(sf_dir))

    def kn_perplexity_q(sf_dir):
        """Interpolated Kneser-Ney trigram bits-per-trigram per doc
        (ops/kneser.py — the KenLM-style filter): ONE trigram-type
        exchange, per-type probability table broadcast, shuffle-free
        scoring scan. SQL-oracled: every KN statistic is an exact
        integer over the trigram type table and the float chain is
        mirrored term-for-term."""
        from docstrange_ray.ops.kneser import kn_score

        return kn_score(read_docs(sf_dir))

    def dsir_bucket_counts_q(sf_dir):
        """DSIR (Xie et al. 2023) hashed unigram+bigram bucket counts:
        (bucket, raw_c, tgt_c) with target = source 'src0'; exact int64
        over ONE bounded exchange (<= 4096 buckets, corpus-independent).
        SQL-oracled via the md5-prefix bucket hash."""
        from docstrange_ray.ops import dsir

        return dsir.bucket_counts(read_docs_src(sf_dir), m=4096,
                                  target_source="src0")

    def dsir_weights_q(sf_dir):
        """Per-doc DSIR importance log-weights under the add-one
        smoothed bucket multinomials (broadcast m-float lambda, one
        shuffle-free scoring scan); floats — pytest-oracled vs an
        independent Counter/loop reference."""
        from docstrange_ray.ops import dsir

        return dsir.dsir_logweights(read_docs_src(sf_dir), m=4096,
                                    target_source="src0")

    def dsir_selected_q(sf_dir):
        """Deterministic Gumbel top-k DSIR selection (k=100): sampling
        without replacement proportional to importance weight, with
        md5-derived Gumbel noise (pure function of doc_id — stable
        across cluster sizes). Per-block top-k candidates -> coalesced
        final; rerun-identical (pinned in tests/test_dsir.py)."""
        from docstrange_ray.ops import dsir

        return dsir.dsir_select(read_docs_src(sf_dir), k=100, m=4096,
                                target_source="src0")

    def cm_estimates_q(sf_dir):
        """Count-Min sketch (Cormode-Muthukrishnan) frequency estimates
        for five probe tokens (one absent): per-block d x w matrices as
        single binary-blob rows, elementwise-merged — no token crosses
        an exchange. Deterministic md5 row hashes make the SKETCH math
        itself SQL-reproducible, so the oracle checks the estimates
        exactly (not just the true counts)."""
        from docstrange_ray.ops.sketch import countmin_estimates

        return countmin_estimates(
            read_docs(sf_dir),
            ["data", "query", "table", "merge", "zz_absent_token"],
            d=4, w=2048,
        )

    def shared_gram_pairs_q(sf_dir):
        """Copy-detection pairs: docs sharing >=3 rare 4-grams
        (df <= 8) via an inverted-index pair exchange with a
        quadratic-blowup df cap. SQL-oracled."""
        return dedup.shared_gram_pairs(read_docs(sf_dir), n=4, max_df=8, min_shared=3)

    def lang_confusion_q(sf_dir):
        """Declared-vs-predicted language confusion matrix
        (shuffle-free pair-count partials). SQL-oracled by reusing the
        lang_id argmax CTE."""
        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        return textstats.lang_confusion(docs)

    def doc_novelty_q(sf_dir):
        """Per-doc novelty: fraction of the doc's distinct 3-grams
        appearing in no other document (two hot-key-safe exchanges).
        SQL-oracled."""
        from docstrange_ray.ops.textstats import doc_novelty

        return doc_novelty(read_docs(sf_dir), n=3)

    def lexical_diversity_q(sf_dir):
        """Per-doc unigram entropy + type-token ratio (shuffle-free
        quality signals). SQL-oracled."""
        from docstrange_ray.ops.textstats import lexical_diversity

        return lexical_diversity(read_docs(sf_dir))

    def pmi_collocations_q(sf_dir):
        """Top-50 bigram collocations by PMI (min bigram count 5):
        sentinel-carried corpus totals, min_count prune BEFORE the two
        co-partition unigram joins, exact-integer PMI. SQL-oracled."""
        from docstrange_ray.ops.textstats import pmi_collocations

        return pmi_collocations(read_docs(sf_dir), min_count=5, k=50)

    def snapshot_diff_q(sf_dir):
        """FULL-OUTER snapshot diff by content hash: base = even
        doc_ids, new = doc_id % 3 != 0, so both exclusive sides are
        non-empty. SQL-oracled (FULL OUTER JOIN with IS NULL arms)."""
        import pyarrow.compute as pc

        docs = read_docs(sf_dir)

        def even(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0)
            )

        def mod3(batch: pa.Table) -> pa.Table:
            did = batch.column("doc_id")
            rem = pc.subtract(did, pc.multiply(pc.divide(did, 3), 3))
            return batch.filter(pc.not_equal(rem, 0))

        base = docs.map_batches(even, batch_format="pyarrow")
        new = docs.map_batches(mod3, batch_format="pyarrow")
        return dedup.snapshot_diff(new, base)

    def heavy_tokens_q(sf_dir):
        """Misra-Gries heavy hitters + exact verify: tokens covering
        >=1% of all token instances, with NO vocabulary shuffle (sketch
        rows are the only exchange; candidates broadcast for the exact
        pass). Output equals the naive GROUP BY ... HAVING oracle."""
        from docstrange_ray.ops.sketch import heavy_tokens

        return heavy_tokens(read_docs(sf_dir), fraction=0.01)

    def incremental_dedup_q(sf_dir):
        """Ingest anti-join: the daily-increment-vs-corpus-snapshot step
        of a continuously updated training set. Base = even doc_ids,
        increment = the full table, so the result exercises both the
        drop path (every even doc collides with the base) and the keep
        path (odd docs survive, first-wins inside the increment)."""
        import pyarrow.compute as pc

        docs = read_docs(sf_dir)

        def even(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0)
            )

        base = docs.map_batches(even, batch_format="pyarrow")
        return dedup.incremental_dedup(docs, base)

    def passage_dedup_q(sf_dir):
        """C4-style global passage dedup: first occurrence of each
        distinct passage wins, docs reassembled in order. Passage = 2
        words here (the ~30-word fixture vocabulary makes longer
        passages collision-free; production uses ~50-word spans)."""
        return dedup.passage_dedup(read_docs(sf_dir), chunk_words=2)

    def hashed_doc_vectors_q(sf_dir):
        """Feature-hashing doc vectors (signed hashing trick): exact
        integer long form (doc_id, dim, val), nonzero entries only —
        a vocabulary-free shuffle-free text vectorizer. SQL-oracled
        via the md5 bucket/sign idiom."""
        from docstrange_ray.ops import semantic

        return semantic.hashed_doc_vectors(read_docs(sf_dir), m=64)

    def text_semantic_dups_q(sf_dir):
        """Cross-module composition: text -> hashed vectors (dense) ->
        cosine near-dup pairs via the auto-gated embedding dedup.
        Exercises the text-to-embedding-space bridge end to end
        (rows-only: float cosine pipeline; the primitive underneath is
        the SQL-oracled hashed_doc_vectors)."""
        from docstrange_ray.ops import semantic

        vecs = semantic.hashed_doc_vectors(
            read_docs(sf_dir), m=64, dense=True
        ).map_batches(
            lambda b: b.rename_columns(["vec_id", "embedding"]),
            batch_format="pyarrow",
        )
        return dedup.embedding_dup_pairs(vecs, threshold=0.9)

    def weighted_jaccard_pairs_q(sf_dir):
        """Exact generalized (weighted/multiset) Jaccard over the
        MinHash candidate pairs — min/max of word term-frequencies;
        shares pair_edit_distance's bloom-prefiltered pair_texts tail.
        SQL-oracled bit-exact (integer ratio, half-away round6)."""
        return dedup.weighted_jaccard_pairs(read_docs(sf_dir), threshold=0.8)

    def compression_stats_q(sf_dir):
        """zlib compression-ratio quality signal (Dolma-family
        repetitiveness detector): shuffle-free scan, fixed level 6.
        No DEFLATE in DuckDB — pytest-oracled vs direct zlib calls;
        the repetitive-vs-noise ordering property is pinned."""
        return textstats.compression_stats(read_docs(sf_dir))

    def jsonl_roundtrip_q(sf_dir):
        """JSONL ingest correctness (the web-corpus interchange format):
        the documents table is written as gzipped JSONL shards once per
        sf_dir (md5-keyed /tmp cache), read back via
        ray.data.read_json, and emitted as-is — the oracle is simply
        SELECT * FROM documents, so a value-hash match proves the
        ingest path is lossless end to end (types, escaping, unicode,
        compression)."""
        import hashlib as _hl
        import os as _os

        from docstrange_ray.io import read_jsonl_docs, write_jsonl_docs

        tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
        out_dir = f"/tmp/dsray_jsonl_{tag}"
        # marker OUTSIDE the shard dir: read_json parses every file in
        # the directory, so an in-dir marker would be read as data
        done = out_dir + ".done"
        if not _os.path.exists(done):
            import shutil as _sh

            _sh.rmtree(out_dir, ignore_errors=True)  # no stale partials
            write_jsonl_docs(
                read_parquet_clean(f"{sf_dir}/documents.parquet"),
                out_dir, compression="gzip",
            )
            with open(done, "w") as f:
                f.write("ok")
        return read_jsonl_docs(out_dir, compression="gzip")

    def csv_roundtrip_q(sf_dir):
        """CSV ingest correctness (the reference's S7 interchange
        format as a Ray source/sink): documents written as CSV shards
        once per sf_dir (md5-keyed /tmp cache), read back via
        ray.data.read_csv, emitted as-is; oracle = SELECT * FROM
        documents — a value-hash match proves quoting/typing round-trip
        losslessly."""
        import hashlib as _hl
        import os as _os

        from docstrange_ray.io import read_csv_docs, write_csv_docs

        tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
        out_dir = f"/tmp/dsray_csv_{tag}"
        done = out_dir + ".done"
        if not _os.path.exists(done):
            import shutil as _sh

            _sh.rmtree(out_dir, ignore_errors=True)
            write_csv_docs(
                read_parquet_clean(f"{sf_dir}/documents.parquet"), out_dir
            )
            with open(done, "w") as f:
                f.write("ok")
        return read_csv_docs(out_dir)

    def ipc_roundtrip_q(sf_dir):
        """Feather-v2 / Arrow-IPC interchange correctness (io.
        write_feather_docs / read_feather_docs — the mmap-able handoff
        to pandas/polars/R consumers): documents written once per
        sf_dir as one-file-per-block IPC shards (md5-keyed /tmp cache,
        atomic tmp+rename), read back one task per file; oracle =
        SELECT * FROM documents, so a value-hash match proves the
        zero-copy container round-trips types and unicode losslessly."""
        import hashlib as _hl
        import os as _os

        from docstrange_ray.io import read_feather_docs, write_feather_docs

        tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
        out_dir = f"/tmp/dsray_ipc_{tag}"
        done = out_dir + ".done"
        if not _os.path.exists(done):
            import shutil as _sh

            _sh.rmtree(out_dir, ignore_errors=True)
            write_feather_docs(
                read_parquet_clean(f"{sf_dir}/documents.parquet"), out_dir
            )
            with open(done, "w") as f:
                f.write("ok")
        return read_feather_docs(out_dir)

    def orc_roundtrip_q(sf_dir):
        """ORC interchange correctness (io.write_orc_docs /
        read_orc_docs — the Hive/Trino-side columnar handoff):
        documents written once per sf_dir as one-file-per-block ORC
        shards, read back one task per file; oracle = SELECT * FROM
        documents — a value-hash match proves stripe encoding,
        timestamps and unicode survive the round trip."""
        import hashlib as _hl
        import os as _os

        from docstrange_ray.io import read_orc_docs, write_orc_docs

        tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
        out_dir = f"/tmp/dsray_orc_{tag}"
        done = out_dir + ".done"
        if not _os.path.exists(done):
            import shutil as _sh

            _sh.rmtree(out_dir, ignore_errors=True)
            write_orc_docs(
                read_parquet_clean(f"{sf_dir}/documents.parquet"), out_dir
            )
            with open(done, "w") as f:
                f.write("ok")
        return read_orc_docs(out_dir)

    def token_shard_roundtrip(sf_dir):
        """Indexed-binary training-data sink end-to-end (io.
        write_token_shards / read_token_shards — the Megatron-style
        .bin/.idx handoff): documents are tokenized with the md5-parity
        word hash (id = md5-prefix % 50000, the repo's SQL-mirrorable
        tokenizer idiom), written as 8 shard file pairs (ONE shard
        exchange, per-shard atomic writes), read BACK from the bytes on
        disk, and reduced to (doc_id, n_tokens, tok_sum). The oracle
        recomputes both from the word stream — a match proves the
        binary layout round-trips losslessly."""
        import hashlib as _hl
        import os as _os
        import shutil as _sh

        import numpy as _np

        from docstrange_ray.io import read_token_shards, write_token_shards

        def tokenize(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            toks = [
                [
                    int(_hl.md5(w.encode()).hexdigest()[:16], 16) % 50000
                    for w in t.split()
                ]
                for t in texts
            ]
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "tokens": pa.array(toks, pa.list_(pa.int64())),
                }
            )

        tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
        out_dir = f"/tmp/dsray_tokshards_{tag}"
        _sh.rmtree(out_dir, ignore_errors=True)  # deterministic rebuild
        write_token_shards(
            read_docs(sf_dir).map_batches(tokenize, batch_format="pyarrow"),
            out_dir,
            n_shards=8,
        ).materialize()  # consume the sink: files exist after this

        def stats(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            toks = batch.column("tokens").to_pylist()
            return pa.table(
                {
                    "doc_id": ids.cast(pa.int64()),
                    "n_tokens": pa.array(
                        [len(t) for t in toks], pa.int64()
                    ),
                    "tok_sum": pa.array(
                        [int(_np.sum(t, dtype=_np.int64)) if t else 0 for t in toks],
                        pa.int64(),
                    ),
                }
            )

        return read_token_shards(out_dir).map_batches(stats, batch_format="pyarrow")

    def source_zscore_q(sf_dir):
        """Per-source z-score standardization of doc length: batch
        (group, n, sum, sumsq) pre-reduce -> constant-size coalesced
        combine -> broadcast moments -> shuffle-free scoring scan.
        SQL-oracled (window AVG/STDDEV_POP)."""
        from docstrange_ray.ops.rankstats import group_zscore

        return group_zscore(
            read_parquet_clean(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "source", "n_chars"],
            )
        )

    _BLOCKLIST = ["hash", "merge", "slow query", "table", "able",
                  "row scan", "a a"]

    def blocklist_tags_q(sf_dir):
        """Aho-Corasick multi-pattern blocklist tagging (RefinedWeb
        banned-list step): automaton built once per actor, shuffle-free
        scan; OCCURRENCE counts (overlaps included — 'able' also fires
        inside 'table', 'a a' overlaps itself), which the SQL oracle
        reproduces with a position scan rather than replace()."""
        from docstrange_ray.ops.blocklist import blocklist_tags

        return blocklist_tags(read_docs(sf_dir), _BLOCKLIST)

    def streaming_dedup_pairs_q(sf_dir):
        """Online dedup against a SHARED MUTABLE MinHash index (the one
        raw-actor op: sharded _BandShard actors hold the growing LSH
        buckets; map_batches tasks query+insert atomically). Stateful
        streaming — no SQL oracle by nature; the pair set is pinned in
        tests against the batch chain's signature-verified candidates
        and against arrival-order reversal."""
        from docstrange_ray.ops.streamdedup import StreamingDedupIndex

        idx = StreamingDedupIndex(n_shards=8, threshold=0.8)
        try:
            return idx.add_corpus(read_docs(sf_dir)).materialize()
        finally:
            idx.shutdown()

    def dup_positions_exact_q(sf_dir):
        """Collision-free ExactSubstr positions via Manber-Myers
        prefix-doubling equality classes: word strings cross ONE
        exchange, then 2*log2(window) integer exchanges (no global
        sort, no hash collisions). window=8 matches the fixture's
        dup-run lengths."""
        return dedup.dup_positions_exact(read_docs(sf_dir), window=8)

    def cdc_chunks_q(sf_dir):
        """Content-defined chunking (FastCDC/LBFS word-anchor rule):
        boundary after any word with md5-hash % 8 == 0 — a pure local
        function of the text, shuffle-free. SQL-oracled (windowed
        cumulative anchor sum + string_agg md5)."""
        return dedup.cdc_chunk_table(read_docs(sf_dir), divisor=8)

    def cdc_dup_chunks_q(sf_dir):
        """Cross-document duplicated CDC chunks: batch-local
        (chunk, doc) pre-reduce then ONE chunk_md5 exchange — the
        storage-dedup / boilerplate view. SQL-oracled."""
        return dedup.cdc_dup_chunks(read_docs(sf_dir), divisor=8)

    def lang_id(sf_dir):
        return read_docs(sf_dir).map_batches(
            textstats.LangId, batch_format="pyarrow", concurrency=(1, 4)
        )

    def doc_fingerprint(sf_dir):
        return read_docs(sf_dir).map_batches(
            textstats.rolling_fingerprint, batch_format="pyarrow"
        )

    def winnow_fps(sf_dir):
        """Winnowing fingerprints (Schleimer et al. 2003 / MOSS):
        rolling k=4 gram hash, min-rightmost selection over window=5 —
        the LOCAL-similarity sketch (any shared >=8-word run yields a
        shared fingerprint). Shuffle-free kernel; oracle rebuilds the
        selection with a windowed ROW_NUMBER."""
        from docstrange_ray.ops.dedup import winnow_fingerprints

        return read_docs(sf_dir).map_batches(
            winnow_fingerprints, batch_format="pyarrow"
        )

    def winnow_pairs_q(sf_dir):
        """Shared-winnowing-fingerprint candidate pairs with the MOSS
        stop-fingerprint rule (df > 64 discarded as boilerplate): two
        pre-reduced exchanges, text never moves."""
        from docstrange_ray.ops.dedup import winnow_pairs

        return winnow_pairs(read_docs(sf_dir))

    def jaccard_drops(sf_dir):
        """Exact near-dup drop list at t=0.5: prefix-filter Jaccard
        join -> distributed min-label-propagation components -> drop
        everything but each cluster's min-id representative. The
        deterministic-threshold counterpart of near_dup_drops."""
        from docstrange_ray.ops.dedup import dup_clusters_ds, jaccard_join

        pairs = jaccard_join(read_docs(sf_dir), threshold=0.5)
        labels = dup_clusters_ds(pairs)

        def drops(batch):
            import pyarrow.compute as pc

            keep = pc.not_equal(batch.column("node"), batch.column("label"))
            t = batch.filter(keep)
            return t.select(["node"]).rename_columns(["doc_id"])

        return labels.map_batches(drops, batch_format="pyarrow")

    def jaccard_join_pairs(sf_dir):
        """EXACT 3-gram-Jaccard self-join at t=0.5 via prefix
        filtering (hash-order AllPairs/PPJoin) — deterministic, no
        LSH recall gap; shares the bloom-prefiltered verify tail with
        the MinHash path."""
        from docstrange_ray.ops.dedup import jaccard_join

        return jaccard_join(read_docs(sf_dir), threshold=0.5)

    def pagerank_purchases(sf_dir):
        """Fixed-point integer PageRank (5 iterations, d=0.85, dangling
        mass redistributed) over the distinct customer->supplier
        purchase graph. Integer floor arithmetic makes the distributed
        plan, the broadcast plan and the DuckDB oracle BIT-identical —
        float PageRank cannot be oracle-checked this way."""
        from docstrange_ray.ops.graph import purchase_pagerank

        return purchase_pagerank(sf_dir, iterations=5)

    def copurchase_triangles(sf_dir):
        """Per-node triangle counts + local clustering coefficient over
        the part co-purchase PATH graph (consecutive sorted parts per
        order — edge count linear in lineitem). Degree-oriented wedge
        counting (Suri & Vassilvitskii 2011): orientation bounds every
        out-degree at O(sqrt(2m)), so no hot node can blow the wedge
        explode; ONE (x,y)-keyed probe exchange closes the wedges."""
        from docstrange_ray.ops.graph import copurchase_path_edges, triangle_stats

        return triangle_stats(copurchase_path_edges(sf_dir))

    def copurchase_reach(sf_dir):
        """BFS minimum hop levels (<= 3) over the symmetrized co-purchase
        path graph from the 3 lowest-keyed nodes — the Pregel frontier
        shape; per hop ONE src-keyed probe exchange + one state merge,
        driver state = the frontier COUNT scalar."""
        from docstrange_ray.ops.graph import bfs_levels, copurchase_path_edges

        edges = copurchase_path_edges(sf_dir).materialize()

        def sym(batch):
            return pa.table(
                {
                    "src": pa.concat_arrays(
                        [
                            batch.column("src").cast(pa.int64()).combine_chunks(),
                            batch.column("dst").cast(pa.int64()).combine_chunks(),
                        ]
                    ),
                    "dst": pa.concat_arrays(
                        [
                            batch.column("dst").cast(pa.int64()).combine_chunks(),
                            batch.column("src").cast(pa.int64()).combine_chunks(),
                        ]
                    ),
                }
            )

        sym_edges = edges.map_batches(sym, batch_format="pyarrow")
        # seed set: the 3 lowest node ids — per-block bounded min-3
        # candidates, then one coalesced final (n_blocks x 3 scalars)
        from docstrange_ray.shuffle import arrow_out, coalesced_blocks

        def local_min3(batch):
            import numpy as np
            import pandas as pd

            vals = np.unique(
                batch.column("src").to_numpy(zero_copy_only=False)
            )[:3]
            return pd.DataFrame({"node": vals})

        def final_min3(df):
            import numpy as np
            import pandas as pd

            return pd.DataFrame({"node": np.unique(df["node"].to_numpy())[:3]})

        seeds = [
            int(r["node"])
            for r in coalesced_blocks(
                sym_edges.map_batches(arrow_out(local_min3), batch_format="pyarrow"),
                final_min3,
            ).take_all()
        ]
        return bfs_levels(sym_edges, seeds, max_hops=3)

    def copurchase_core(sf_dir):
        """Maximal 3-core of the co-purchase path graph (the standard
        graph-curation prune: nodes with in-core degree >= 3 after
        iterative peeling to the unique fixpoint). SQL-oracled since
        r5 block 3: peeling is MONOTONE, so an unrolled 24-round CTE
        chain is a no-op past the fixpoint and equals the engine's
        exact fixpoint whenever the engine converges (it raises past
        its own cap, so a silent divergence cannot happen); also
        pinned by the independent peeling reference + plan-parity
        tests in tests/test_graph.py."""
        from docstrange_ray.ops.graph import copurchase_path_edges, k_core

        return k_core(copurchase_path_edges(sf_dir), k=3)

    def copurchase_components(sf_dir):
        """Connected components of the co-purchase path graph via
        alternating large-star/small-star (graph.connected_components,
        Kiveris et al. 2014): O(log^2 n) one-exchange rounds regardless
        of component diameter — the path-shaped graph is exactly the
        adversarial case for plain min-label propagation. Oracle =
        recursive-CTE min-reachable-label."""
        from docstrange_ray.ops.graph import (
            connected_components,
            copurchase_path_edges,
        )

        return connected_components(copurchase_path_edges(sf_dir))

    def copurchase_pagerank_weighted_q(sf_dir):
        """WEIGHTED fixed-point integer PageRank (5 iters) over the
        co-purchase path graph: edge weight = co-purchase count (capped
        at 1e6 — the rank*w int64 bound), contribution = rank * w //
        out_weight. Exact integers -> bit-identical across plans and
        to the weighted unrolled-CTE oracle."""
        from docstrange_ray.ops.graph import copurchase_path_edges, pagerank
        from docstrange_ray.shuffle import grouped_blocks

        edges = copurchase_path_edges(sf_dir)

        def weigh(df):
            out = df.groupby(["src", "dst"], as_index=False).size()
            out.columns = ["src", "dst", "w"]
            out["w"] = np.minimum(
                out["w"].to_numpy(np.int64), 10**6
            ).astype(np.int64)
            return out

        wedges = grouped_blocks(
            edges, ["src", "dst"], weigh, batch_format="pandas"
        )
        return pagerank(wedges, iterations=5, assume_distinct=True,
                        weighted=True)

    def copurchase_cheapest(sf_dir):
        """Hop-bounded multi-seed cheapest paths (<= 4 hops, exactly 4
        Bellman-Ford relaxation rounds — graph.sssp_bounded) over the
        WEIGHTED co-purchase path graph: edge cost = max(1, 1000 //
        co-purchase count), seeds = the 3 lowest-keyed source parts.
        Integer min arithmetic makes broadcast plan, join plan and the
        hop-bounded recursive-CTE oracle bit-identical."""
        from docstrange_ray.ops.graph import (
            copurchase_weighted_edges,
            sssp_bounded,
        )
        from docstrange_ray.shuffle import arrow_out, coalesced_blocks

        edges = copurchase_weighted_edges(sf_dir).materialize()

        def local_min3(batch):
            import numpy as np
            import pandas as pd

            vals = np.unique(
                batch.column("src").to_numpy(zero_copy_only=False)
            )[:3]
            return pd.DataFrame({"node": vals})

        def final_min3(df):
            import numpy as np
            import pandas as pd

            return pd.DataFrame({"node": np.unique(df["node"].to_numpy())[:3]})

        seeds = [
            int(r["node"])
            for r in coalesced_blocks(
                edges.map_batches(arrow_out(local_min3), batch_format="pyarrow"),
                final_min3,
            ).take_all()
        ]
        return sssp_bounded(edges, seeds, max_hops=4)

    def copurchase_assortativity_q(sf_dir):
        """Degree assortativity coefficient (Newman 2002) of the
        co-purchase path graph: Pearson correlation of endpoint degrees
        from four exact int64 sufficient stats (graph.
        degree_assortativity); the one-expression float chain is
        mirrored term-for-term in SQL, so round6 output is bit-exact."""
        from docstrange_ray.ops.graph import (
            copurchase_path_edges,
            degree_assortativity,
        )

        return degree_assortativity(copurchase_path_edges(sf_dir))

    def purchase_hits_q(sf_dir):
        """HITS hubs & authorities (Kleinberg 1999, graph.hits) over
        the bipartite customer->part purchase graph, 3 rounds of exact
        integer power iteration with max-rescale (score * scale //
        max, trunc division) replacing the float L2 normalization —
        hub customers concentrate on authoritative parts and vice
        versa. Both plans and the unrolled-CTE oracle agree
        bit-for-bit; output is (node, kind, score) with src/dst role
        spaces kept separate by the kind column."""
        from docstrange_ray.ops.graph import hits

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        li = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
        from docstrange_ray.shuffle import hash_join

        ok = orders.map_batches(
            lambda b: pa.table(
                {
                    "k": b.column("o_orderkey").cast(pa.int64()),
                    "src": b.column("o_custkey").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        lk = li.map_batches(
            lambda b: pa.table(
                {
                    "k": b.column("l_orderkey").cast(pa.int64()),
                    "dst": b.column("l_partkey").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        edges = hash_join(ok, lk, key="k").map_batches(
            lambda df: df[["src", "dst"]], batch_format="pandas"
        )
        return hits(edges, iterations=3)

    def copurchase_ppr_q(sf_dir):
        """Personalized PageRank (5 iters) from the 3 lowest part ids
        over the directed co-purchase path graph (graph.pagerank with
        teleport=seeds — Jeh & Widom 2003): jump + dangling mass land
        only on the seed set, ranking parts by relevance TO those
        seeds (the related-item / local-relevance query uniform
        PageRank cannot express). Floor-integer arithmetic throughout,
        so both plans match the seeded unrolled-CTE oracle exactly."""
        from docstrange_ray.ops.graph import copurchase_path_edges, pagerank
        from docstrange_ray.shuffle import arrow_out, coalesced_blocks

        edges = copurchase_path_edges(sf_dir).materialize()

        def local_min3(batch):
            import numpy as np
            import pandas as pd

            both = np.concatenate(
                [
                    batch.column("src").to_numpy(zero_copy_only=False),
                    batch.column("dst").to_numpy(zero_copy_only=False),
                ]
            )
            return pd.DataFrame({"node": np.unique(both)[:3]})

        def final_min3(df):
            import numpy as np
            import pandas as pd

            return pd.DataFrame({"node": np.unique(df["node"].to_numpy())[:3]})

        seeds = [
            int(r["node"])
            for r in coalesced_blocks(
                edges.map_batches(arrow_out(local_min3), batch_format="pyarrow"),
                final_min3,
            ).take_all()
        ]
        return pagerank(edges, iterations=5, teleport=seeds)

    def copurchase_communities_q(sf_dir):
        """Semi-synchronous label propagation (4 rounds, Raghavan et
        al. 2007 made deterministic — community.label_propagation) over
        the co-purchase path graph: each round every node takes the
        most frequent previous-round label among its neighbors, ties on
        the smallest label. A fixed round count (not convergence) keeps
        the output a pure function of the edge set, so the unrolled
        4-round CTE oracle is bit-identical on both plans."""
        from docstrange_ray.ops.community import label_propagation
        from docstrange_ray.ops.graph import copurchase_path_edges

        return label_propagation(copurchase_path_edges(sf_dir), rounds=4)

    def _copurchase_wedges(sf_dir):
        """Symmetric weighted co-purchase table (src, dst, w) — w =
        consecutive-pair count per unordered pair, both directions
        emitted: the caller-side weight aggregation the weighted
        LPA/modularity contract expects."""
        from docstrange_ray.ops.graph import copurchase_path_edges
        from docstrange_ray.shuffle import grouped_blocks

        edges = copurchase_path_edges(sf_dir)

        def weigh(df):
            g = df.groupby(["src", "dst"], as_index=False).size()
            g.columns = ["src", "dst", "w"]
            return g.astype({"w": np.int64})

        wed = grouped_blocks(
            edges, ["src", "dst"], weigh, batch_format="pandas"
        )

        def both(batch):
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            w = batch.column("w").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "src": pa.array(
                        np.concatenate([s, d]).astype(np.int64), pa.int64()
                    ),
                    "dst": pa.array(
                        np.concatenate([d, s]).astype(np.int64), pa.int64()
                    ),
                    "w": pa.array(
                        np.concatenate([w, w]).astype(np.int64), pa.int64()
                    ),
                }
            )

        return wed.map_batches(both, batch_format="pyarrow")

    def copurchase_communities_weighted_q(sf_dir):
        """WEIGHTED label propagation (community.label_propagation,
        weighted=True): votes are co-purchase-count sums instead of
        neighbor counts, so a pair bought together often pulls labels
        harder than a one-off — the weighted variant real co-purchase
        clustering wants. Weight aggregation (count per unordered
        pair, both directions emitted) is the caller's, mirroring the
        weighted-pagerank contract; exact int64 vote sums keep both
        plans bit-identical to the unrolled SUM(w) oracle."""
        from docstrange_ray.ops.community import label_propagation

        return label_propagation(
            _copurchase_wedges(sf_dir), rounds=4, weighted=True
        )

    def copurchase_modularity_weighted_q(sf_dir):
        """Weighted Newman modularity (community.
        modularity_stats_weighted, Newman 2004) of the weighted-LPA
        partition: W / intra-weight / strength-sum squares as exact
        int64 (symmetric sums halved), one mirrored double expression
        — the quality gate for the weighted community structure."""
        from docstrange_ray.ops.community import modularity_stats_weighted

        return modularity_stats_weighted(_copurchase_wedges(sf_dir), rounds=4)

    def copurchase_modularity_q(sf_dir):
        """Newman modularity of the 4-round label-propagation partition
        (community.modularity_stats): exact int64 sufficient stats
        (m, intra_edges, sum_dc2) plus the single double expression
        (4*m*intra - sum_dc2)/(4*m^2), mirrored term-for-term in SQL —
        the spam-community-pruning quality gate for graph curation."""
        from docstrange_ray.ops.community import modularity_stats
        from docstrange_ray.ops.graph import copurchase_path_edges

        return modularity_stats(copurchase_path_edges(sf_dir), rounds=4)

    def copurchase_walks_q(sf_dir):
        """Deterministic node2vec-style walk corpus (community.
        random_walks): one 4-step walk per node over the symmetric
        co-purchase graph; the step-t move from u is argmin over
        neighbors n of md5_key52(f"{u}|{t}|{n}") — the house hash chain
        replaces the RNG, so the corpus is cluster-size-independent and
        the 4-step unrolled window-function oracle matches exactly."""
        from docstrange_ray.ops.community import random_walks
        from docstrange_ray.ops.graph import copurchase_path_edges

        return random_walks(copurchase_path_edges(sf_dir), steps=4)

    def copurchase_walk_negatives_q(sf_dir):
        """Negative samples for the skip-gram walk corpus (community.
        walk_negative_samples) — the third leg of the SGNS training
        handoff: 2 draws per (center, context) pair from the DEGREE
        distribution via deterministic inverse-CDF (md5 % total_degree
        into cumulative-degree intervals; exponent-1 weighting keeps
        it exact-integer, the documented smoothing seam). The scale
        plan distributes the CDF over node-range buckets with only the
        bucket bases on the driver. Oracle = walk-pair chain + window
        cumulative sums + a range join."""
        from docstrange_ray.ops.community import walk_negative_samples
        from docstrange_ray.ops.graph import copurchase_path_edges

        return walk_negative_samples(
            copurchase_path_edges(sf_dir), steps=4, window=2, k_neg=2
        )

    def copurchase_neighbor_feats_q(sf_dir):
        """GraphSAGE-style neighborhood aggregation (community.
        neighborhood_features): per part, exact int64 degree, 1-hop
        neighbor-degree sum and 2-hop path-counted degree sum — the
        feature table a GNN trainer consumes. Two aggregation hops,
        each one co-partition join + one pre-reduced node exchange."""
        from docstrange_ray.ops.community import neighborhood_features
        from docstrange_ray.ops.graph import copurchase_path_edges

        return neighborhood_features(copurchase_path_edges(sf_dir))

    def copurchase_edge_sim_q(sf_dir):
        """Per-edge structural similarity (community.edge_structural_
        sim — Satuluri et al. SIGMOD'11 local sparsification): for
        every co-purchase edge, the exact common-neighbor count
        (= triangles through the edge, via the degree-oriented wedge
        probe at scale), the endpoint-excluded union size, and their
        round6 Jaccard — keep-top-per-node on this is the curation
        prune that preserves communities while dropping noise edges."""
        from docstrange_ray.ops.community import edge_structural_sim
        from docstrange_ray.ops.graph import copurchase_path_edges

        return edge_structural_sim(copurchase_path_edges(sf_dir))

    def copurchase_biased_walks_q(sf_dir):
        """Second-order node2vec walks (p=4 return-discouraging, q=2
        locally-exploring — community.biased_walks): biased moves via
        the deterministic exponential race -ln(u)/w with power-of-two
        weights, so the sampler is a pure function of the edge set and
        both plans match the unrolled oracle bit-for-bit. The triangle
        test (candidate adjacent to prev) rides a packed-key membership
        join in the scale plan."""
        from docstrange_ray.ops.community import biased_walks
        from docstrange_ray.ops.graph import copurchase_path_edges

        return biased_walks(copurchase_path_edges(sf_dir), steps=4)

    def copurchase_walk_pairs_q(sf_dir):
        """Skip-gram (center, context) pair counts over the
        deterministic walk corpus (community.walk_skipgram_pairs,
        window 2) — the node2vec/DeepWalk training-data handoff: what
        a graph-embedding trainer consumes, produced with one
        walker-keyed exchange for the block-local pairing and one
        pre-reduced pair-count exchange. Oracle = the walk chain plus
        a windowed self-join."""
        from docstrange_ray.ops.community import walk_skipgram_pairs
        from docstrange_ray.ops.graph import copurchase_path_edges

        return walk_skipgram_pairs(
            copurchase_path_edges(sf_dir), steps=4, window=2
        )

    def copurchase_centrality_q(sf_dir):
        """Bounded harmonic centrality from 4 deterministic seeds
        (community.harmonic_centrality, Eppstein-Wang pivot sampling):
        seeds = smallest (md5_key52(node), node); harmonic(v) = sum of
        1/d(s,v) over seeds within 3 hops, held exact as integers
        scaled by lcm(1..3)=6 (harm_num) with one final double divide.
        Distances ride the existing bfs_levels frontier iteration via
        the product-graph replication trick (k x edge-scale)."""
        from docstrange_ray.ops.community import harmonic_centrality
        from docstrange_ray.ops.graph import copurchase_path_edges

        return harmonic_centrality(
            copurchase_path_edges(sf_dir), k_seeds=4, max_hops=3
        )

    def part_link_predictions(sf_dir):
        """Common-neighbor + Adamic-Adar link prediction over the
        co-purchase path graph (graph.link_predictions, Adamic & Adar
        2003): every NON-edge part pair sharing >= 2 wedge centers,
        scored by the exact int64 micro-weight sum
        floor(1e6/ln(deg(center)) + 0.5) — integers are quantized
        BEFORE reduction so the distributed sum is order-independent
        and bit-equal to SQL (Python math.log == DuckDB LN, pinned).
        Two pre-reduced exchanges; the existing-edge anti-join rides
        the pair exchange for free (tagged-union kind column)."""
        from docstrange_ray.ops.graph import (
            copurchase_path_edges,
            link_predictions,
            undirected_edges,
        )

        return link_predictions(
            undirected_edges(copurchase_path_edges(sf_dir)), min_cn=2
        )

    def tfidf_cosine_pairs_q(sf_dir):
        """EXACT sparse tf-idf cosine self-join at t=0.35 (sparsesim.
        tfidf_cosine_join — AllPairs prefix filtering, Bayardo et al.
        WWW'07): idf-weighted lexical similarity where shared rare
        words count and stop words are worth ~nothing (their tiny
        weights land in every suffix and never open a posting pair —
        tf-idf's built-in hot-key suppression). Integer weights, exact
        int dot, arbitrary-precision threshold predicate; the oracle
        is the brute term self-join with identical arithmetic — a
        different algorithm agreeing on every pair and every bit.

        Fixture scoping: the synthetic corpus draws from a CLOSED
        vocabulary, so idf carries little information and every doc
        pair is lexically similar — the answer (and the candidate
        set) is quadratic BY NATURE at any threshold, which no exact
        algorithm can avoid (the real-web regime the op targets is
        sparse). The driver query therefore runs the deterministic
        doc_id % 10 == 0 subset (the _spec_subset idiom); the full-
        corpus path is exercised by tests/test_sparsesim.py."""
        from docstrange_ray.ops.sparsesim import tfidf_cosine_join

        docs = read_docs(sf_dir).map_batches(
            lambda b: b.filter(
                pa.array(
                    b.column("doc_id").to_numpy(zero_copy_only=False) % 10
                    == 0
                )
            ),
            batch_format="pyarrow",
        )
        return tfidf_cosine_join(docs, threshold_num=60, threshold_den=100)

    def containment_pairs(sf_dir):
        """EXACT 3-gram max-containment self-join at t=0.6 via the
        asymmetric prefix filter (smaller doc probes its prefix against
        the larger doc's full gram set) — catches subset/quote
        duplication whose Jaccard is diluted by the size gap."""
        from docstrange_ray.ops.dedup import containment_join

        return containment_join(read_docs(sf_dir), threshold=0.6)

    def minhash_near_dups(sf_dir):
        pairs = dedup.near_dup_pairs(read_docs(sf_dir), threshold=0.8)
        return pa.Table.from_pylist(
            pairs,
            schema=pa.schema(
                [("doc_id_a", pa.int64()), ("doc_id_b", pa.int64()), ("jaccard", pa.float64())]
            ),
        )

    def near_dup_drops(sf_dir):
        """The fully distributed actionable dedup chain: LSH candidates
        -> bloom-prefiltered repartition verify -> label-propagation
        connected components -> drop list (doc_ids losing to their
        cluster representative)."""
        return dedup.near_dup_drop_list_ds(read_docs(sf_dir), threshold=0.8)

    def pair_edit_distance_q(sf_dir):
        """Exact byte-level Levenshtein verification of the MinHash
        near-dup pairs (the code-dedup second-stage pass): bounded pair
        set materialized once, texts attached via two co-partition
        hash_joins, vectorized Wagner-Fischer kernel per pair.
        SQL-oracled bit-exact via DuckDB levenshtein() (byte-based —
        the kernel matches it on unicode too)."""
        return dedup.pair_edit_distance(read_docs(sf_dir), threshold=0.8)

    def edit_dup_pairs(sf_dir):
        """ALL title pairs within byte Levenshtein distance 2 — the
        PassJoin exact similarity join (ops/editjoin.py), no
        candidate-generation recall gap (contrast pair_edit_distance,
        which only verifies MinHash candidates). Titles = first 30
        codepoints of text (Python slice == SQL substr semantics);
        three bounded exchanges carry 64-bit segment hashes, never
        text; banded O(len*tau) verify."""
        from docstrange_ray.ops.editjoin import edit_distance_join

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

        def title(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "text": pa.array(
                        [(t or "")[:30] for t in batch.column("text").to_pylist()]
                    ),
                }
            )

        return edit_distance_join(
            docs.map_batches(title, batch_format="pyarrow"), tau=2
        )

    def near_dup_keep_best(sf_dir):
        """Quality-aware dedup representative selection: each near-dup
        cluster keeps its LONGEST member (max n_chars, min-doc_id
        tiebreak) instead of the arbitrary min-id — RefinedWeb's
        keep-the-best policy. Pairs -> distributed connected components
        -> ONE co-partition score join -> per-cluster argmax."""
        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        )
        return dedup.keep_best_drop_list_ds(docs, score_col="n_chars", threshold=0.8)

    def leakage_safe_split_q(sf_dir):
        """Decontaminated train/val/test assignment (sampling.
        leakage_safe_split): the split is a function of the NEAR-DUP
        CLUSTER (verified 3-gram-jaccard pairs -> connected
        components), not the document, so a doc and its near-twin can
        never straddle train/test — the leakage hash_split cannot
        prevent. Bucket = md5_key52(cluster) % 100: <80 train, <90
        val, else test. Oracle re-derives the pair chain, the
        recursive component closure, and the md5 bucket in SQL."""
        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        from docstrange_ray.ops.sampling import leakage_safe_split

        return leakage_safe_split(docs, threshold=0.8)

    def _messy_urls(sf_dir, collide: bool = False):
        """Deterministic messy-URL fixture over documents (the in-plan
        corruption idiom): mixed-case scheme/host, explicit default
        port ~1/3, shuffled query params ~1/2, fragment ~1/4. With
        ``collide`` the whole URL derives from doc_id % 101 so distinct
        docs share canonical URLs (the URL-dedup case)."""

        def attach(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            urls = []
            for i in ids:
                m = i % 101 if collide else i
                k = m % 37
                host = "".join(
                    c.upper() if (i + j) % 3 == 0 else c
                    for j, c in enumerate(f"site{k}.example.com")
                )
                scheme = "HtTpS" if i % 2 == 0 else "https"
                port = ":443" if i % 3 == 0 else ""
                a, b = m % 10, m % 7
                params = f"a={a}&b={b}" if i % 2 == 0 else f"b={b}&a={a}"
                frag = f"#s{i % 5}" if i % 4 == 0 else ""
                path = f"/page/{m % 61}" if collide else f"/p/{i}"
                urls.append(f"{scheme}://{host}{port}{path}?{params}{frag}")
            return batch.append_column("url", pa.array(urls, pa.string()))

        return read_docs(sf_dir).map_batches(attach, batch_format="pyarrow")

    def url_canonical(sf_dir):
        """RFC-3986-style URL canonicalization (RefinedWeb's URL-prep
        step): drop fragment, lowercase scheme+host, strip default
        port, sort query params, root empty paths. The oracle rebuilds
        the expected canonical string arithmetically, so the
        canonicalizer must invert every injected mess. Shuffle-free."""
        from docstrange_ray.ops.urls import canonicalize_urls

        ds = canonicalize_urls(_messy_urls(sf_dir), col="url")
        return ds.map_batches(
            lambda b: b.select(["doc_id", "url"]), batch_format="pyarrow"
        )

    def url_dedup_first(sf_dir):
        """URL-level exact dedup, lowest doc_id wins (RefinedWeb stage
        1): canonicalize in-scan, per-batch first-wins pre-reduce, ONE
        canonical-url exchange."""
        from docstrange_ray.ops.urls import url_dedup_keep_first

        ds = _messy_urls(sf_dir, collide=True).map_batches(
            lambda b: b.select(["doc_id", "url"]), batch_format="pyarrow"
        )
        return url_dedup_keep_first(ds)

    def url_host_stats(sf_dir):
        """Per-host corpus readout (host-level curation): doc count +
        total chars per canonical host; pre-reduced host exchange."""
        from docstrange_ray.ops.urls import host_stats

        return host_stats(_messy_urls(sf_dir))

    def host_capped(sf_dir):
        """Per-host document cap (RefinedWeb per-host limit), cap=3 by
        lowest doc_id. Hot-host safe: each batch pre-reduces to its own
        top-3 per host, so no host ships more than n_batches x 3 rows."""
        from docstrange_ray.ops.urls import canonicalize_urls, host_cap

        ds = canonicalize_urls(
            _messy_urls(sf_dir).map_batches(
                lambda b: b.select(["doc_id", "url"]), batch_format="pyarrow"
            ),
            col="url",
        )
        return host_cap(ds, cap=3)

    def mojibake_repair(sf_dir):
        """ftfy-style encoding repair over a deterministically CORRUPTED
        corpus: docs with doc_id % 7 == 0 get 'e' -> 'é' (accent
        injection), then the classic mojibake mis-decode (UTF-8 bytes
        read as cp1252, 'é' -> 'Ã©') — all inside the Ray plan. The
        oracle rebuilds the expected CLEAN text arithmetically, so the
        acceptance-gated repair must actually INVERT the corruption on
        the corrupted subset while leaving the untouched docs
        byte-identical. Shuffle-free scan; ASCII fast path."""
        from docstrange_ray.ops.textfix import fix_mojibake

        def corrupt(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out = [
                t.replace("e", "\u00e9").encode("utf-8").decode("cp1252")
                if i % 7 == 0
                else t
                for i, t in zip(ids, texts)
            ]
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").cast(pa.int64()),
                    "text": pa.array(out, pa.string()),
                }
            )

        corrupted = read_docs(sf_dir).map_batches(corrupt, batch_format="pyarrow")
        return fix_mojibake(corrupted)

    def nfc_normalized(sf_dir):
        """NFC unicode normalization over deterministically DECOMPOSED
        text: docs with doc_id % 5 == 0 get 'e' -> 'e' + U+0301
        (combining acute), which NFC must recompose to the single
        codepoint 'é'. Oracle rebuilds the composed form via replace().
        Shuffle-free scan; ASCII is NFC-invariant (fast path)."""
        from docstrange_ray.ops.textfix import normalize_nfc

        def decompose(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out = [
                t.replace("e", "e\u0301") if i % 5 == 0 else t
                for i, t in zip(ids, texts)
            ]
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").cast(pa.int64()),
                    "text": pa.array(out, pa.string()),
                }
            )

        decomposed = read_docs(sf_dir).map_batches(decompose, batch_format="pyarrow")
        return normalize_nfc(decomposed)

    def c4_clean(sf_dir):
        """C4's line-level cleaning rules (Raffel et al. 2020 §2.2)
        over a deterministically LINED corpus: the flat word-stream
        documents get 7-word lines whose punctuation / noise
        decorations derive from md5(doc_id:j) (the repo's md5-parity
        oracle idiom — terminal punct, missing punct, a javascript
        line, a too-short line, page-level lorem-ipsum / curly-brace
        markers), then ops.curate.c4_clean applies the paper's line and
        page rules. Shuffle-free end to end — every rule is per-line or
        per-document."""
        import hashlib as _hl

        from docstrange_ray.ops.curate import c4_clean as _c4

        def line_structure(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out = []
            for doc_id, text in zip(ids, texts):
                ws = text.split()
                lines = []
                for j in range((len(ws) + 6) // 7):
                    body = " ".join(ws[7 * j : 7 * j + 7])
                    d = _hl.md5(f"{doc_id}:{j}".encode()).hexdigest()[0]
                    if d == "c":
                        lines.append(body + "?")
                    elif d == "d":
                        lines.append(body)  # no terminal punct
                    elif d == "e":
                        lines.append("javascript " + body + ".")
                    elif d == "f":
                        lines.append(" ".join(ws[7 * j : 7 * j + 2]) + ".")
                    else:
                        lines.append(body + ".")
                h0 = _hl.md5(str(doc_id).encode()).hexdigest()[0]
                if h0 == "0":
                    lines.append("lorem ipsum dolor sit amet.")
                elif h0 == "1":
                    lines.append("var config = { x: 1 };")
                out.append("\n".join(lines))
            return pa.Table.from_arrays(
                [batch.column("doc_id"), pa.array(out, type=pa.string())],
                names=["doc_id", "text"],
            )

        lined = read_docs(sf_dir).map_batches(
            line_structure, batch_format="pyarrow"
        )
        return _c4(lined)

    def _boiler_lined(sf_dir):
        """Deterministically LINED corpus with planted boilerplate for
        the RefinedWeb line-strip family: content = 7-word lines
        (j = 0..), plus 'subscribe to our newsletter' (j = 1000000) on
        docs with md5(doc_id)[0] in 0-9a-b (~75% -> df well above
        min_df=100 at the 500-doc test scales) and 'all rights
        reserved' (j = 1000001) on md5[0] in 0-1 (~12.5% -> df ~62,
        below the threshold: planted NON-boilerplate discriminator)."""
        import hashlib as _hl

        _HOT = set("0123456789ab")

        def line_structure(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out = []
            for doc_id, text in zip(ids, texts):
                ws = text.split()
                lines = [
                    " ".join(ws[7 * j : 7 * j + 7])
                    for j in range((len(ws) + 6) // 7)
                ]
                h0 = _hl.md5(str(doc_id).encode()).hexdigest()[0]
                if h0 in _HOT:
                    lines.append("subscribe to our newsletter")
                if h0 in ("0", "1"):
                    lines.append("all rights reserved")
                out.append("\n".join(lines))
            return pa.Table.from_arrays(
                [batch.column("doc_id").cast(pa.int64()), pa.array(out, pa.string())],
                names=["doc_id", "text"],
            )

        return read_docs(sf_dir).map_batches(line_structure, batch_format="pyarrow")

    def boilerplate_lines(sf_dir):
        """Corpus-wide line document frequencies >= 100 over the planted
        fixture (ops.curate.line_df_table): per-batch pre-reduced
        distinct-(doc, line) partials, ONE line exchange. The planted
        navigation line must surface; the rarer footer must not."""
        from docstrange_ray.ops.curate import line_df_table

        return line_df_table(_boiler_lined(sf_dir), min_df=100)

    def boilerplate_stripped(sf_dir):
        """RefinedWeb boilerplate line strip (ops.curate.
        strip_boilerplate_lines, auto plan -> broadcast at this scale:
        the hot-line table is bounded by (doc,line) pairs / min_df):
        every line with corpus df >= 100 removed, survivors re-joined
        in order, docs keeping zero lines dropped."""
        from docstrange_ray.ops.curate import strip_boilerplate_lines

        return strip_boilerplate_lines(_boiler_lined(sf_dir), min_df=100)

    def quality_filter(sf_dir):
        import pyarrow.compute as pc

        def score_and_filter(batch: pa.Table) -> pa.Table:
            t = textstats.quality_score(batch)
            return t.filter(pc.greater_equal(t.column("quality"), 0.5)).select(
                ["doc_id", "quality"]
            )

        return read_docs(sf_dir).map_batches(score_and_filter, batch_format="pyarrow")

    def simhash_sigs(sf_dir):
        return read_docs(sf_dir).map_batches(dedup.simhash_batch, batch_format="pyarrow")

    def simhash_pairs(sf_dir):
        return dedup.simhash_near_pairs(read_docs(sf_dir), max_hamming=3)

    def simhash_drops(sf_dir):
        """Distributed SimHash dedup chain end-to-end: blocked pairs ->
        min-label propagation components -> drop list (everything but
        each cluster's min-id representative). SQL-oracled: simhash
        blocking is EXACT for hamming<=3 (pigeonhole), so a recursive-
        CTE component closure over the all-pairs SQL reproduces it."""
        return dedup.simhash_drop_list_ds(read_docs(sf_dir), max_hamming=3)

    def lsh_ann_topk(sf_dir):
        first = read_emb(sf_dir).filter(expr="vec_id < 8").take_all()
        first.sort(key=lambda r: r["vec_id"])
        q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in first])
        qids = [int(r["vec_id"]) for r in first]
        return ann.lsh_topk(read_emb(sf_dir), q, qids, k=10)

    def media_features(sf_dir):
        import ray
        from docstrange_ray.ops import multimodal

        # deterministic fake media table keyed off the corpus image refs
        refs = [f"media://img/{i}" for i in range(_corpus_size(sf_dir))]
        media = ray.data.from_arrow(multimodal.synth_media_table(refs))
        return multimodal.decode_features(media)

    def weighted_sample_q(sf_dir):
        """Length-weighted sample of 50 docs (Efraimidis-Spirakis
        priorities from md5-derived uniforms): deterministic,
        shuffle-free local-top-k shape, SQL-oracled."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sampling import weighted_sample

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        return weighted_sample(docs, k=50, weight_col="n_chars")

    def hash_sample_10(sf_dir):
        from docstrange_ray.ops.sampling import hash_sample

        return hash_sample(read_docs(sf_dir), 0.10).select_columns(["doc_id"])

    def stratified_sample(sf_dir):
        """Balanced subsampling: at most 10 docs per source, picked
        deterministically (lowest md5(doc_id) per stratum), hot-stratum
        safe via per-batch partial caps before the ONE strata shuffle."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sampling import stratified_cap

        docs = read_parquet_clean(f"{sf_dir}/documents.parquet").select_columns(
            ["doc_id", "source"]
        )
        return stratified_cap(docs, strata_key="source", cap=10)

    def source_topk(sf_dir):
        """Per-group top-k: the 3 longest docs per source (ties by
        doc_id). Hot-key safe: each batch ships at most k candidate rows
        per group through the ONE group-key shuffle."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import group_topk

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "doc_id", "n_chars"]
        )
        return group_topk(docs, group_key="source", order_key="n_chars", k=3)

    def length_outliers(sf_dir):
        """Robust per-source outliers: |n_chars - median| > 2 * MAD
        with exact quantile_disc medians (two histogram exchanges +
        broadcast bounds + shuffle-free scan). SQL-oracled."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import robust_outliers

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        )
        return robust_outliers(docs, group_key="source", value_key="n_chars")

    def length_quantiles(sf_dir):
        """EXACT per-source p50/p90/p99 of document length via a
        value-count histogram exchange (position = ceil(q*n) in integer
        arithmetic — DuckDB quantile_disc parity)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import group_quantiles

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
        )
        return group_quantiles(docs, group_key="source", value_key="n_chars")

    def price_quantile_select(sf_dir):
        """EXACT global quantiles of a CONTINUOUS column (order total
        price) via distributed radix selection (rankstats.select_quantiles)
        — zero shuffles: an order-preserving int64 keying scan, then
        <= 6 counting scans narrowing 4096-bucket histograms on the
        driver. The plan group_quantiles cedes for unbounded-cardinality
        domains; rank contract = quantile_disc (ceil(q*n), 1-indexed)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import select_quantiles

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
        )
        return select_quantiles(
            orders, "o_totalprice", quantiles=((1, 4), (1, 2), (9, 10), (99, 100))
        )

    def returnflag_price_quantiles(sf_dir):
        """EXACT per-GROUP quantiles of a CONTINUOUS column (extended
        price by return flag) via per-group radix selection
        (rankstats.group_select_quantiles) — the remaining quadrant of
        the quantile matrix (group_quantiles handles discrete domains;
        select_quantiles handles the global case). No per-key shuffle:
        <= 6 counting scans whose exchange is bounded by
        n_groups x n_quantiles x 4096 counts at any corpus size; a hot
        group costs the same as a cold one. Rank contract =
        quantile_disc (ceil(q*n), 1-indexed, integer arithmetic)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import group_select_quantiles

        li = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice"],
        )
        return group_select_quantiles(
            li,
            "l_returnflag",
            "l_extendedprice",
            quantiles=((1, 4), (1, 2), (9, 10), (99, 100)),
        )

    def returnflag_price_corr(sf_dir):
        """EXACT per-group Pearson correlation (quantity vs price cents
        by return flag) from ONE integer sufficient-statistics scan
        (rankstats.group_corr): per-block (n, Σx, Σy, Σxy, Σx², Σy²)
        bignum partials cross the exchange as decimal strings — nothing
        float is ever reduced, so the result is BIT-equal to the SQL
        mirror (HUGEINT sums -> CAST DOUBLE -> SQRT chain -> ROUND 6)
        by construction."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import group_corr

        li = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        from docstrange_ray.numerics import to_int_units

        return group_corr(
            li,
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            y_to_int=to_int_units(100),
        )

    def customer_k_anonymity(sf_dir):
        """k-anonymity / l-diversity privacy audit over customer
        (ops/pii.k_anonymity_audit): quasi-identifiers (nation,
        market segment), sensitive value = rounded balance; emits the
        groups with n < 5 or fewer than 2 distinct sensitive values.
        Exact distinct-per-group via the lossless two-level
        (QI, sensitive) pre-reduce — one bounded exchange."""
        import numpy as np

        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.numerics import to_int_units
        from docstrange_ray.ops.pii import k_anonymity_audit

        cust = read_parquet_clean(
            f"{sf_dir}/customer.parquet",
            columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
        )
        units = to_int_units()

        def add_bal(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "bal", pa.array(units(batch.column("c_acctbal").to_numpy()),
                                pa.int64()),
            ).drop_columns(["c_acctbal"])

        out = k_anonymity_audit(
            cust.map_batches(add_bal, batch_format="pyarrow"),
            quasi_cols=["c_nationkey", "c_mktsegment"],
            sensitive_col="bal",
            k=5,
            l=2,
        )
        out["at_risk_k"] = out["at_risk_k"].astype(np.int64)
        out["at_risk_l"] = out["at_risk_l"].astype(np.int64)
        return out

    def returnflag_price_regression(sf_dir):
        """EXACT per-group OLS regression (price cents on quantity by
        return flag) from the same ONE integer sufficient-statistics
        scan as group_corr (rankstats.group_regression): bignum
        partials cross the exchange as decimal strings, final slope /
        intercept float chain mirrored step-for-step in the SQL oracle
        (HUGEINT sums -> CAST DOUBLE division -> ROUND 6) — BIT-equal
        by construction."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.numerics import to_int_units
        from docstrange_ray.ops.rankstats import group_regression

        li = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        return group_regression(
            li,
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            y_to_int=to_int_units(100),
        )

    def _entity_records(sf_dir):
        """Shared dirty-records fixture for the linkage family (see
        entity_matches docstring for the corruption rules)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.numerics import to_int_units

        cust = read_parquet_clean(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
        )
        cents = to_int_units(100)

        def to_records(batch: pa.Table) -> pa.Table:
            ks = batch.column("c_custkey").to_pylist()
            names = batch.column("c_name").to_pylist()
            nations = batch.column("c_nationkey").to_pylist()
            bal = cents(batch.column("c_acctbal").to_numpy())
            rid, nm, ph, nat, bl = [], [], [], [], []
            for k, name, nation, b in zip(ks, names, nations, bal):
                phone = f"({10 + k % 90}){(k * 7) % 10_000_000:07d}"
                rid.append(k * 2)
                nm.append(name)
                ph.append(phone)
                nat.append(nation)
                bl.append(b)
                if k % 3 == 0:
                    p0 = 9 + (k % 9)  # drop a digit of the name tail
                    dphone = phone
                    if k % 6 == 0:  # corrupt last phone digit
                        dphone = phone[:-1] + str((int(phone[-1]) + 1) % 10)
                    rid.append(k * 2 + 1)
                    nm.append(name[:p0] + name[p0 + 1 :])
                    ph.append(dphone)
                    nat.append(nation)
                    bl.append(b)
            return pa.table(
                {
                    "rec_id": pa.array(rid, pa.int64()),
                    "name": pa.array(nm),
                    "phone": pa.array(ph),
                    "nation": pa.array(nat, pa.int32()),
                    "bal": pa.array([int(v) for v in bl], pa.int64()),
                }
            )

        return cust.map_batches(to_records, batch_format="pyarrow")

    def entity_matches(sf_dir):
        """Record linkage (ops/entity.py — Fellegi-Sunter shape): a
        deterministic dirty-records fixture over customer (every 3rd
        customer gains a duplicate with a 1-char name typo; every 6th
        also a corrupted phone digit), candidates from the UNION of
        two blocking passes (exact phone; exact nation+balance — the
        corrupted-phone dups only survive via pass 2), integer
        agreement weights (phone 25, name-edit<=1 30, nation 10,
        balance 15), matches at >= 55. Everything integer and
        arithmetic-derived, so the oracle rebuilds the records AND the
        pipeline in SQL."""
        import numpy as np

        from docstrange_ray.ops.editjoin import _banded_distance
        from docstrange_ray.ops.entity import resolve_entities

        recs = _entity_records(sf_dir)

        def pair_score(df):
            s = np.where(
                df["phone_a"].to_numpy() == df["phone_b"].to_numpy(), 25, 0
            ).astype(np.int64)
            near = [
                _banded_distance(
                    (x or "").encode("utf-8"), (y or "").encode("utf-8"), 1
                ) <= 1
                for x, y in zip(df["name_a"].tolist(), df["name_b"].tolist())
            ]
            s += np.where(np.asarray(near, dtype=bool), 30, 0)
            s += np.where(
                df["nation_a"].to_numpy() == df["nation_b"].to_numpy(), 10, 0
            )
            s += np.where(df["bal_a"].to_numpy() == df["bal_b"].to_numpy(), 15, 0)
            return s

        out = resolve_entities(
            recs,
            id_col="rec_id",
            block_keys=[["phone"], ["nation", "bal"]],
            pair_score=pair_score,
            threshold=55,
        )
        return out.rename(columns={"id_a": "rec_id_a", "id_b": "rec_id_b"})

    def golden_customers_q(sf_dir):
        """Golden-record survivorship merge (entity.golden_records) on
        the linkage fixture: Fellegi-Sunter match pairs -> connected-
        component clusters (singletons kept) -> deterministic rules
        (longest-then-lexico name, MIN phone/nation, MAX bal). The SQL
        oracle rebuilds the records, the matcher, a recursive-CTE CC,
        and the window/aggregate rules end to end."""
        import ray.data as _rd

        from docstrange_ray.ops.entity import golden_records

        recs = _entity_records(sf_dir).materialize()
        pairs_df = entity_matches(sf_dir)
        pairs = _rd.from_arrow(
            pa.table(
                {"id_a": pa.array(pairs_df["rec_id_a"].astype("int64")),
                 "id_b": pa.array(pairs_df["rec_id_b"].astype("int64"))}
            )
        )
        return golden_records(
            recs,
            pairs,
            id_col="rec_id",
            longest_cols=("name",),
            min_cols=("phone", "nation"),
            max_cols=("bal",),
        )

    def kcenter_coreset(sf_dir):
        """Greedy k-center coreset over the embeddings table
        (semantic.kcenter_select, Gonzalez 1985 farthest-point
        traversal): k=16 maximally-diverse vectors for eval/labeling
        sets. Stateless-recompute rounds — each broadcasts the selected
        centers and runs ONE shuffle-free matmul scan + coalesced
        argmax; the winner carries its vector, so no per-round fetch
        scan. Rows-only by nature (k-step iterative argmax); pinned by
        an independent numpy loop reference + partitioning-invariance
        tests."""
        from docstrange_ray.ops.semantic import kcenter_select

        return kcenter_select(read_emb(sf_dir), k=16)

    def source_length_mwu(sf_dir):
        """Mann-Whitney U (rank-sum) statistic between src0's and
        src1's document-length distributions (ops/stats_tests.
        mann_whitney_u) — the nonparametric drift test. Shares the KS
        histogram exchange; the DOUBLED statistic (2 per win, 1 per
        tie) plus the tie-correction term are exact integers, bit-equal
        to the SQL window-cumsum rebuild."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.stats_tests import mann_whitney_u

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
        )
        return mann_whitney_u(docs, "n_chars", "source", "src0", "src1")

    def priority_price_welch(sf_dir):
        """Welch's unequal-variance t statistic comparing URGENT vs LOW
        order totals (ops/stats_tests.welch_t): ONE bignum sufficient-
        stats scan in exact cent units; the t / Welch-Satterthwaite dof
        float chain is mirrored step-for-step against SQL (bit-equal)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.numerics import to_int_units
        from docstrange_ray.ops.stats_tests import welch_t

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_totalprice"],
        )
        return welch_t(
            orders,
            "o_totalprice",
            "o_orderpriority",
            "1-URGENT",
            "5-LOW",
            to_int=to_int_units(100),
        )

    def isotonic_calibration(sf_dir):
        """Isotonic (PAV) calibration curve mapping document length to
        the empirical P(doc mentions 'data') — the post-hoc probability
        calibration step for any monotone quality score
        (ops/classifier.isotonic_calibrate). ONE pre-reduced histogram
        exchange; PAV pooling runs in exact cross-multiplied integer
        rationals on the bounded bin table. SQL-oracled via the O(B^2)
        minimax closed form (exact in doubles — see the op docstring);
        also pinned by an independent exact-Fraction minimax reference
        in tests/test_classifier.py."""
        import pyarrow.compute as pc

        from docstrange_ray.ops.classifier import isotonic_calibrate

        def feat(batch):
            txt = batch.column("text")
            lab = pc.cast(
                pc.match_substring(txt, "data"), pa.int64()
            )
            ln = pc.cast(batch.column("n_chars"), pa.float64())
            return pa.table({"score": pc.divide(ln, 4000.0), "label": lab})

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["text", "n_chars"]
        ).map_batches(feat, batch_format="pyarrow")
        return isotonic_calibrate(docs, "score", "label")

    def source_mode_length(sf_dir):
        """Per-source MODE document length (rankstats.group_mode):
        pre-reduced (source, n_chars, cnt) histogram exchange, winner =
        (cnt DESC, value ASC) — a deterministic total order mirrored by
        the oracle's ROW_NUMBER."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import group_mode

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
        )
        return group_mode(docs, "source", "n_chars")

    def source_lang_entropy(sf_dir):
        """Per-source Shannon entropy of the language distribution
        (rankstats.group_entropy) — the composition-diversity audit.
        Each value's (c/n)*ln(n/c) term is quantized to a micro-int
        BEFORE summation; Python libm and DuckDB LN are bit-identical
        (grid-pinned), so entropy_micro is bit-equal to SQL."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import group_entropy

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "lang"]
        )
        return group_entropy(docs, "source", "lang")

    def price_qty_frontier(sf_dir):
        """Pareto frontier of lineitem (min extended price, max
        quantity) via the distributed skyline (rankstats.pareto_front,
        Börzsönyi et al. 2001): per-block skyline pre-reduce is LOSSLESS
        (a locally dominated point is globally dominated), so only
        ~ln(block) survivors per block reach the ONE coalesced final.
        Exact int64 objective units (cents / rounded qty) — SQL
        NOT-EXISTS dominance oracle agrees bit-for-bit."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import pareto_front

        li = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_extendedprice", "l_quantity"],
        )
        from docstrange_ray.numerics import to_int_units

        out = pareto_front(
            li,
            "l_extendedprice",
            "l_quantity",
            x_to_int=to_int_units(100),
            minimize=(True, False),
        )
        return out.rename(columns={"x": "price_cents", "y": "qty"})

    def kcenter_coreset_exact_q(sf_dir):
        """Greedy k-center (k=8) in exact int64 squared-L2 over the
        quantized embeddings (semantic.kcenter_select_exact) — the
        SQL-green twin of kcenter_coreset's float-cosine traversal
        (monotone-equivalent on unit-norm vectors)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.semantic import kcenter_select_exact

        emb = read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return kcenter_select_exact(emb, k=8)

    def cosine_pairs_exact_q(sf_dir):
        """EXACT quantized-cosine similarity self-join (t=0.30) over
        the embeddings table (semantic.cosine_join_exact): int64
        quantize-once coordinates make every dot/norm exact in float64
        matmul; the threshold cut is an arbitrary-precision integer
        predicate; cos6 is IEEE-deterministic. The SQL-green complement
        to the LSH/IVF recall-oracle paths."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.semantic import cosine_join_exact

        emb = read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return cosine_join_exact(emb, threshold_num=30, threshold_den=100)

    def weighted_price_quantiles_q(sf_dir):
        """EXACT global quantity-weighted price quantiles
        (rankstats.weighted_select_quantiles): radix selection with
        int64 weight-sum histograms — never shuffles, <= 6 counting
        scans; the crossing test qd*cumw >= qn*W is exact integer
        cross-multiplication mirrored by the SQL window cumsum."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.rankstats import weighted_select_quantiles

        li = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_extendedprice", "l_quantity"],
        )
        return weighted_select_quantiles(
            li, "l_extendedprice", "l_quantity",
            quantiles=((1, 4), (1, 2), (3, 4), (9, 10)),
        )

    def kmeans_exact_assignments_q(sf_dir):
        """Exact-integer Lloyd k-means (k=8, 2 iterations) over the
        embeddings table (ops/kmeans.py) — the quantized-int TWIN of
        kmeans_clusters (semantic.py float path, first-k init): this
        one uses md5-ordered seeding, trunc-division updates pinned to
        DuckDB //, and emits the exact integer d2 alongside the
        cluster. Centroids broadcast per round; points never shuffle."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.kmeans import kmeans_quantized

        emb = read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return kmeans_quantized(emb, k=8, iterations=2)

    def doc_title_links_q(sf_dir):
        """Blocked Jaro-Winkler linkage over 24-char document titles
        (first-4-chars exact blocking, threshold 0.90): the classic
        record-linkage name matcher. Scores pinned bit-for-bit to
        DuckDB's jaro_winkler_similarity (ops/entity.jaro_winkler), so
        threshold cut + micro-unit emit are oracle-exact."""
        import pyarrow.compute as pc

        from docstrange_ray.ops.entity import jw_linkage

        def titles(batch):
            t = pc.utf8_slice_codeunits(
                pc.utf8_lower(batch.column("text")), 0, 24
            )
            return pa.table({"doc_id": batch.column("doc_id"), "title": t})

        return jw_linkage(
            read_docs(sf_dir).map_batches(titles, batch_format="pyarrow"),
            "doc_id",
            "title",
            threshold=0.90,
        )

    def textrank_keywords_q(sf_dir):
        """Corpus TextRank keywords (Mihalcea & Tarau 2004): top-50
        words by fixed-point integer PageRank (5 iters, d=0.85) over
        the adjacent-content-word co-occurrence graph. Integer
        arithmetic + md5-prefix node ids make engine and unrolled-CTE
        oracle bit-identical (ops/keywords.textrank_keywords)."""
        from docstrange_ray.ops.keywords import textrank_keywords

        return textrank_keywords(read_docs(sf_dir), k=50)

    def rake_keywords_q(sf_dir):
        """Corpus-wide top-50 RAKE keywords (ops/keywords.rake_keywords,
        Rose et al. 2010): punctuation/stopword-delimited candidate
        phrases, word score = floor(1e6*deg/freq) quantized BEFORE the
        phrase-score sum (order-independent ints — bit-equal to the SQL
        rebuild), measure-then-choose broadcast-vs-join scoring over the
        Heaps-bounded word table, block-local top-k then ONE coalesced
        global top-k."""
        from docstrange_ray.ops.keywords import rake_keywords

        return rake_keywords(read_docs(sf_dir), k=50)

    def lang_source_chi2(sf_dir):
        """Chi-square test of independence between document language and
        source (ops/stats_tests.chi2_independence) — the pre-retraining
        audit question "is labeling independent of provenance?". ONE
        pre-reduced contingency exchange (lang x source cell counts,
        bounded); every cell term is quantized to an exact micro-unit
        integer BEFORE summation so the statistic is bit-equal to the
        SQL mirror (floor-division HUGEINT arithmetic on both sides)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.stats_tests import chi2_independence

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["lang", "source"]
        )
        return chi2_independence(docs, "lang", "source")

    def source_length_ks(sf_dir):
        """Two-sample Kolmogorov-Smirnov distance between the document-
        length distributions of src0 and src1 (ops/stats_tests.
        ks_two_sample) — the distribution-drift detector. ONE value-
        histogram exchange; D's argmax runs in exact cross-multiplied
        integers (|cum_a*n_b - cum_b*n_a|), so d_num is bit-equal to
        SQL's window-cumsum rebuild; only the reported ``d`` is a
        (mirrored, 6dp) float."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.stats_tests import ks_two_sample

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
        )
        return ks_two_sample(docs, "n_chars", "source", "src0", "src1")

    def plsa_init_counts(sf_dir):
        """Topic-word count exchange of hard-EM PLSA's deterministic
        init (ops/topics): z0 = md5_key52(f"{doc_id} {word}") % 6 per
        distinct (doc, word) pair, counts weighted by occurrences —
        ONE bounded (word x topic) exchange. The oracle rebuilds the
        md5 assignment with the house 13-hex-char key idiom, so the
        explode + init + exchange are verified bit-for-bit (the
        iterative EM itself is pytest-oracled in tests/test_topics.py
        against an independent reference)."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.topics import (
            build_plsa_table,
            topic_word_counts,
        )

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return topic_word_counts(build_plsa_table(docs, 6), 6)

    def plsa_doc_topics(sf_dir):
        """Per-document dominant topic after 3 hard-EM PLSA iterations
        (k=6): every statistic is an exact integer and ties break to
        the lowest topic, so the result is deterministic and
        partitioning-invariant (pinned in tests); each iteration costs
        ONE Heaps-bounded (word x topic) exchange + a broadcast — no
        per-iteration doc exchange exists because each doc's state is
        one atomic list-column row. Iterative (not SQL-expressible):
        rows-only driver check by design."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.topics import doc_topics, plsa_train

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return doc_topics(plsa_train(docs, k=6, iters=3), 6)

    def customer_scd2(sf_dir):
        """Slowly-changing-dimension type-2 merge (relational.
        scd2_merge, the Kimball DW maintenance op): the customer table
        is the open dimension; a snapshot is synthesized IN-PLAN with
        deterministic churn (keys %3==2 absent, %10==0 balance +100
        cents, %17==3 address suffixed, %100==4 cloned to a new key) so
        the merge must close, keep, re-open and insert exactly the SQL
        mirror's rows. ONE co-partition outer join on the key; closed
        history never enters the exchange; dates ride as ISO strings so
        nothing can diverge."""
        import pandas as _pd

        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.numerics import to_int_units
        from docstrange_ray.relational import scd2_merge

        cust = read_parquet_clean(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal"],
        )
        _cents = to_int_units(100)

        def mk_dim(df: _pd.DataFrame) -> _pd.DataFrame:
            return _pd.DataFrame(
                {
                    "key": df["c_custkey"],
                    "address": df["c_name"],
                    "acct_cents": _cents(df["c_acctbal"]),
                    "valid_from": "2020-01-01",
                    "valid_to": "9999-12-31",
                }
            )

        def mk_snap(df: _pd.DataFrame) -> _pd.DataFrame:
            k = df["c_custkey"]
            addr = df["c_name"]
            cents = _cents(df["c_acctbal"])
            upd = _pd.DataFrame(
                {
                    "key": k,
                    "address": addr.where(k % 17 != 3, addr + " APT 7"),
                    "acct_cents": cents + (k % 10 == 0) * 100,
                }
            )[(k % 3 != 2).values]
            ins = _pd.DataFrame(
                {
                    "key": k + 1_000_000,
                    "address": "NEW " + addr,
                    "acct_cents": cents + 1,
                }
            )[(k % 100 == 4).values]
            return _pd.concat([upd, ins], ignore_index=True)

        dim = cust.map_batches(mk_dim, batch_format="pandas")
        snap = cust.map_batches(mk_snap, batch_format="pandas")
        return scd2_merge(
            dim, snap, "key", ["address", "acct_cents"],
            snap_date="2024-06-01", int_cols=["acct_cents"],
        )

    def pair_bleu_overlap(sf_dir):
        """Clipped 1/2-gram overlap counts (BLEU precision / ROUGE
        recall numerators, ops/overlap.pair_ngram_overlap) for the
        deterministic pair set (doc_id % 7 == 0) x (doc_id + 1): texts
        attach through the bloom-prefiltered pair_texts tail, the
        Counter-intersection kernel runs per pair in map_batches, and
        every emitted column is an exact int64 — the oracle is a pure
        gram-count SQL rebuild with no float chain at all."""
        import pandas as _pd

        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.overlap import pair_ngram_overlap

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

        def mk_pairs(df: _pd.DataFrame) -> _pd.DataFrame:
            sel = df[df["doc_id"] % 7 == 0]
            return _pd.DataFrame(
                {"doc_id_a": sel["doc_id"], "doc_id_b": sel["doc_id"] + 1}
            )

        pairs = docs.map_batches(mk_pairs, batch_format="pandas")
        return pair_ngram_overlap(docs, pairs, orders=(1, 2))

    def length_auc(sf_dir):
        """ROC AUC of document length as a ranking score for
        lang=='en' (ops/stats_tests.auc_score) — the model-eval
        primitive, computed distributed via the rank-sum identity
        AUC = U_pos/(n_pos*n_neg) over the SAME one pre-reduced
        value-histogram exchange as Mann-Whitney; ties count exactly
        1/2 in integer arithmetic, so auc2_num/auc_micro are bit-equal
        to the SQL window-cumsum rebuild."""
        import pandas as _pd

        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.stats_tests import auc_score

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
        )

        def lab(df: _pd.DataFrame) -> _pd.DataFrame:
            return _pd.DataFrame(
                {
                    "score": df["n_chars"],
                    "y": (df["lang"] == "en").astype("int64"),
                }
            )

        return auc_score(docs.map_batches(lab, batch_format="pandas"),
                         "score", "y")

    def doc_quality_tree(sf_dir):
        """Depth-2 histogram decision tree predicting lang=='en' from
        binned metadata features (ops/tree.train_histogram_tree — the
        PLANET / XGBoost-histogram shape): rows never move, each level
        is ONE bounded (node x feature x bin) histogram exchange, and
        every split is chosen by exact-integer micro-quantized Gini
        (quantize-before-compare), so the whole grown tree is bit-equal
        to the SQL rebuild. Oracle precondition (holds in the driver
        corpus at every sf): the root is impure — the SQL mirror does
        not model the root-leaf degenerate case."""
        import pandas as _pd

        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.tree import train_histogram_tree

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet",
            columns=["lang", "source", "n_chars"],
        )

        def featurize(df: _pd.DataFrame) -> _pd.DataFrame:
            return _pd.DataFrame(
                {
                    "f_len": df["n_chars"] // 128,
                    "f_mod": df["n_chars"] % 7,
                    "f_src": df["source"].str.slice(3).astype("int64"),
                    "y": (df["lang"] == "en").astype("int64"),
                }
            )

        feats = docs.map_batches(featurize, batch_format="pandas")
        return train_histogram_tree(
            feats, ["f_len", "f_mod", "f_src"], "y", max_depth=2
        )

    def source_interleave(sf_dir):
        """Deterministic training-mix interleave (stride scheduling,
        sampling.interleave_by_source): source weights 1 + idx%4 over the
        alphabetically-ranked sources, within-source order = md5 shuffle,
        global position CLOSED-FORM from per-source totals — one uniform
        md5-bucket exchange, no global sort. Oracle rebuilds the cleared
        integer virtual-time keys (L = lcm(1..4) = 12) and ranks them."""
        import pyarrow.parquet as _pq

        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sampling import interleave_by_source

        srcs = sorted(
            set(
                _pq.read_table(
                    f"{sf_dir}/documents.parquet", columns=["source"]
                )
                .column("source")
                .to_pylist()
            )
        )
        weights = {s: 1 + i % 4 for i, s in enumerate(srcs)}
        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        )
        return interleave_by_source(docs, weights)

    def user_event_pivot(sf_dir):
        """Relational PIVOT (relational.pivot_agg): per-user wide counts
        + exact int64-cent sums per event type — per-batch wide partial
        reduce, ONE user exchange of pre-reduced rows. Oracle =
        conditional FILTER aggregation with the same fixed column set."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.relational import pivot_agg

        ev = read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "value"],
        )
        return pivot_agg(
            ev,
            "user_id",
            "event_type",
            "value",
            ["click", "error", "purchase", "signup", "view"],
        )

    def embedding_quantized(sf_dir):
        """Symmetric per-vector int8 scalar quantization (ops/quant.py),
        exploded to long form (vec_id, dim, code, scale) for the oracle.
        Midpoints are reachable (dyadic ratios), so codes use the
        half-away ROUND discipline; the oracle mirrors the EXACT IEEE
        op order round(x / (maxabs/127)) — not x*127/maxabs, which can
        differ in the last ulp."""
        from docstrange_ray.ops.quant import quantize_embeddings

        def explode(batch: pa.Table) -> pa.Table:
            ids, dims, codes, scales = [], [], [], []
            for vid, cs, sc in zip(
                batch.column("vec_id").to_pylist(),
                batch.column("codes").to_pylist(),
                batch.column("scale").to_pylist(),
            ):
                ids.extend([vid] * len(cs))
                dims.extend(range(1, len(cs) + 1))
                codes.extend(cs)
                scales.extend([sc] * len(cs))
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "dim": pa.array(dims, pa.int64()),
                    "code": pa.array([int(c) for c in codes], pa.int64()),
                    "scale": pa.array(scales, pa.float64()),
                }
            )

        return quantize_embeddings(read_emb(sf_dir)).map_batches(
            explode, batch_format="pyarrow"
        )

    def ivf_ann_topk(sf_dir):
        first = read_emb(sf_dir).filter(expr="vec_id < 8").take_all()
        first.sort(key=lambda r: r["vec_id"])
        q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in first])
        qids = [int(r["vec_id"]) for r in first]
        return ann.ivf_topk(read_emb(sf_dir), q, qids, k=10)

    def pq_ann_topk(sf_dir):
        """IVF-PQ approximate top-k: coarse probe + asymmetric
        lookup-table scoring over m-byte codes (floats never leave the
        codebooks) — the memory-scale ANN path. Rows-only check: recall
        bounds are pinned by tests/test_ops.py::TestPQ."""
        first = read_emb(sf_dir).filter(expr="vec_id < 8").take_all()
        first.sort(key=lambda r: r["vec_id"])
        q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in first])
        qids = [int(r["vec_id"]) for r in first]
        return ann.ivf_pq_topk(
            read_emb(sf_dir), q, qids, k=10, m=16, n_codes=64, n_probe=8
        )

    def _planted_ann_table():
        """Deterministic planted-neighbor fixture (VERDICT-r3 #7): 4
        md5-derived base vectors (vec_id 0..3), 9 positively-SCALED
        copies each (vec_id 4 + b*9 + c — cosine exactly 1.0 after
        normalization, but different stored bytes), plus 480 md5 random
        fillers whose cosine vs any base stays far from 1. The exact
        top-10 for query b is therefore {b} + its 9 copies, all at
        rounded score 1.0 — SQL-expressible as pure arithmetic."""
        import hashlib as _hl

        import pyarrow as _pa

        D = 16

        def md5vec(tag: str) -> np.ndarray:
            h = _hl.md5(tag.encode()).digest()
            return np.array([float(h[j]) - 127.5 for j in range(D)])

        vecs: list[np.ndarray] = [md5vec(f"base:{b}") for b in range(4)]
        for b in range(4):
            for c in range(9):
                vecs.append(vecs[b] * float(c + 2))
        vecs.extend(md5vec(f"fill:{i}") for i in range(480))
        return _pa.table(
            {
                "vec_id": _pa.array(range(len(vecs)), _pa.int64()),
                "embedding": _pa.array(
                    [v.astype(np.float32) for v in vecs],
                    _pa.list_(_pa.float32()),
                ),
            }
        )

    def ivf_recall_planted(sf_dir):
        """IVF recall oracle: on the planted fixture the true top-10 per
        query lies entirely in the query's own IVF list (identical
        normalized vectors assign identically), so the approximate probe
        must return the exact planted set — SQL-oracled."""
        import ray

        tbl = _planted_ann_table()
        q = np.stack(
            [np.asarray(v, dtype=np.float64) for v in tbl["embedding"][:4].to_pylist()]
        )
        return ann.ivf_topk(
            ray.data.from_arrow(tbl).repartition(8), q, [0, 1, 2, 3], k=10,
            n_centroids=8, n_probe=2,
        )

    def lsh_recall_planted(sf_dir):
        """LSH-bucket recall oracle on the planted fixture: identical
        normalized vectors share a hyperplane signature by construction,
        so the bucket probe must return the exact planted set."""
        import ray

        tbl = _planted_ann_table()
        q = np.stack(
            [np.asarray(v, dtype=np.float64) for v in tbl["embedding"][:4].to_pylist()]
        )
        return ann.lsh_topk(ray.data.from_arrow(tbl).repartition(8), q, [0, 1, 2, 3], k=10)

    def hnsw_recall_planted(sf_dir):
        """Sharded-HNSW recall oracle on the planted fixture: per-shard
        graphs + merged top-k must return the exact planted set (the
        ivf/lsh planted pattern; ops/hnsw.py)."""
        import ray

        from docstrange_ray.ops.hnsw import hnsw_topk

        tbl = _planted_ann_table()
        q = np.stack(
            [np.asarray(v, dtype=np.float64) for v in tbl["embedding"][:4].to_pylist()]
        )
        return hnsw_topk(
            ray.data.from_arrow(tbl).repartition(8), q, [0, 1, 2, 3], k=10, ef=64
        )

    def hnsw_ann_topk(sf_dir):
        """Sharded-HNSW top-10 over the embeddings table (graph ANN —
        the family's scale path alongside IVF/LSH/PQ). Approximate by
        design: rows-only here; exactness on the planted fixture is the
        oracled `hnsw_recall_planted`, recall vs brute force pinned in
        tests/test_hnsw.py."""
        import ray

        from docstrange_ray.ops.hnsw import hnsw_topk

        emb = read_emb(sf_dir)
        head = emb.limit(8).to_pandas()
        q = np.stack([np.asarray(v, np.float64) for v in head["embedding"]])
        return hnsw_topk(emb, q, head["vec_id"].tolist(), k=10, ef=64)

    def embedding_dups_bucketed(sf_dir):
        return dedup.embedding_dup_pairs_bucketed(read_emb(sf_dir), threshold=0.4)

    def margin_mined_pairs(sf_dir):
        """Margin-criterion pair mining (Artetxe & Schwenk 2019 ratio
        margin; productionized as CCMatrix): even-label embeddings mine
        their argmax-ratio-margin odd-label candidate among the full
        top-4 cosine neighbours, forward direction, margin >= 1.0.
        Exact broadcast plan (fixture sits under the embedding-op brute
        gate); ops/bitext.margin_pairs_bucketed is the 10^12-row IVF
        multi-probe plan, recall pinned in tests/test_bitext.py."""
        from docstrange_ray.ops import bitext

        return bitext.margin_pairs(read_emb(sf_dir), k=4, threshold=1.0, plan="broadcast")

    def ccnet_buckets(sf_dir):
        """CCNet-recipe composition (ops/curate.ccnet_buckets): lang-ID
        -> bigram-LM scoring -> per-language tercile head/middle/tail
        split. Fully SQL-oracled end-to-end (lang argmax + pruned LM +
        integer-arithmetic tercile positions in one statement)."""
        from docstrange_ray.ops.curate import ccnet_buckets as _cb

        return _cb(read_docs(sf_dir))

    def embedding_decontam(sf_dir):
        """Semantic decontamination (ops/decontam.embedding_decontaminate):
        vec_id < 16 plays the benchmark, the rest the corpus; one
        benchmark broadcast + one shuffle-free matmul scan. SQL-oracled
        (max rounded cosine + lowest-bench-id argmax)."""
        from docstrange_ray.ops.decontam import embedding_decontaminate

        emb = read_emb(sf_dir).materialize()
        bench = emb.filter(expr="vec_id < 16")
        corpus = emb.filter(expr="vec_id >= 16")
        return embedding_decontaminate(corpus, bench, threshold=0.35)

    def mixture_weights(sf_dir):
        """Source-mixture sampling rates (ops/sampling.mixture_weights):
        closed-form largest-feasible-corpus solve from ONE bounded
        per-source aggregate. SQL-oracled."""
        from docstrange_ray.io import read_parquet_clean
        from docstrange_ray.ops.sampling import mixture_weights as _mw

        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
        )
        return _mw(docs, MIXTURE_TARGETS)

    def media_metadata(sf_dir):
        """REAL media bytes (valid PNG/GIF/WAV + JPEG headers, stdlib
        writers) → header-sniffed metadata columns (ops/media_meta):
        the non-stubbed half of the multimodal story."""
        import ray
        from docstrange_ray.ops.media_meta import media_metadata as _meta
        from docstrange_ray.synth_files import real_media_table

        media = ray.data.from_arrow(real_media_table(_corpus_size(sf_dir)))
        return _meta(media).select_columns(
            ["media_ref", "mime", "width", "height", "channels", "sample_rate", "duration_ms"]
        )

    def _image_fixture(sf_dir):
        """Deterministic 32x32 grayscale PNG corpus for the perceptual
        image-dedup family: pixel(y, x) = (cy*y + cx*x + y*x + b) % 256
        with id-dependent gradient coefficients cy = 7 + 13b % 97,
        cx = 5 + 29b % 89 (coprime periods keep distinct base images
        far apart in dHash space out to the 2000-image cap); every
        10th image is a PLANTED near-dup of its predecessor — same base
        pixels with the top-left dHash cell brightened by
        LEAST(p+100, 255), which flips at most one comparison bit. The
        oracle rebuilds the pixels arithmetically; the Ray side ENCODES
        them into real PNGs so the query exercises the from-scratch
        codec end to end."""
        import ray

        def build(batch: pa.Table) -> pa.Table:
            import numpy as _np

            from docstrange_ray.synth_files import make_png_gray

            ids = batch.column("id").to_pylist()
            payloads = []
            for i in ids:
                b = i - 1 if i % 10 == 9 else i
                y, x = _np.mgrid[0:32, 0:32]
                p = ((7 + (b * 13) % 97) * y + (5 + (b * 29) % 89) * x + y * x + b) % 256
                if i % 10 == 9:
                    m = (y < 4) & (x < 4)
                    p = _np.where(m, _np.minimum(p + 100, 255), p)
                payloads.append(make_png_gray(p.astype(_np.uint8)))
            return pa.table(
                {
                    "img_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary()),
                }
            )

        return ray.data.range(_corpus_size(sf_dir)).map_batches(
            build, batch_format="pyarrow"
        )

    def image_dhash(sf_dir):
        """Perceptual difference-hash per image (ops/imagedup.py):
        REAL PNG decode (from-scratch codec) -> integral-image cell
        sums -> 56-bit comparison hash, shuffle-free scan. The oracle
        recomputes the hash from the arithmetic pixel definition — a
        match proves decode + dHash are bit-exact."""
        from docstrange_ray.ops.imagedup import image_dhash_table

        return image_dhash_table(_image_fixture(sf_dir), id_col="img_id").select_columns(
            ["img_id", "dhash"]
        )

    def image_near_dups(sf_dir):
        """Image near-dup pairs by dHash Hamming distance <= 3 via the
        SimHash 4x16-bit segment blocking (complete by pigeonhole, ONE
        segment exchange — no quadratic scan). Finds every planted
        brightened-cell near-dup; the oracle enumerates all pairs."""
        from docstrange_ray.ops.imagedup import image_near_dup_pairs

        return image_near_dup_pairs(_image_fixture(sf_dir), max_hamming=3, id_col="img_id")

    def audio_features(sf_dir):
        """REAL audio decode: PCM16 WAV payloads (exact-integer square
        waves + silence, stdlib writers) -> genuine RMS /
        zero-crossing-rate / duration via the from-scratch RIFF+PCM
        decoder (ops/media_meta.decode_wav). Square waves make every
        feature an exact rational (RMS = amp/32768, ZCR = flips/(n-1)),
        so the whole query is SQL-oracled — the oracle regenerates the
        sample signs arithmetically and recomputes the features."""
        import pyarrow as _pa
        import ray
        from docstrange_ray.ops import multimodal
        from docstrange_ray.synth_files import make_wav, make_wav_square

        rows = []
        for i in range(200):
            if i % 4 == 0:
                payload = make_wav(100 + (i % 7) * 50, sample_rate=8000)
            else:
                payload = make_wav_square(
                    200 + 50 * (i % 8),
                    80 + (i % 5) * 40,
                    sample_rate=8000,
                    amp=6000 + (i % 5) * 1500,
                )
            rows.append(
                {
                    "media_ref": f"media://aud/{i}",
                    "payload": payload,
                    "mime": "audio/wav",
                    "width": -1,
                    "height": -1,
                    "n_frames": 1,
                }
            )
        tbl = _pa.Table.from_pylist(rows, schema=multimodal.MEDIA_SCHEMA)
        return multimodal.audio_features(ray.data.from_arrow(tbl))

    def audio_fp_dups(sf_dir):
        """Shift/gain-invariant audio near-dup detection
        (ops/audiofp.py — the Shazam constellation shape): 60 PCM16
        clips with index-derived 3-tone spectra; every 4th clip gains
        a silence-shifted copy and every 6th a gain-scaled copy.
        Landmark hashes ride ONE exchange; pairs vote per time offset.
        No SQL oracle by nature (STFT); planted-duplicate recall and
        non-dup rejection are pinned by tests/test_audiofp.py."""
        import io as _io
        import math as _math
        import wave as _wave

        import ray
        from docstrange_ray.ops.audiofp import audio_near_dups

        def clip(freqs, dur_ms, amp=0.25, lead_ms=0, sr=8000):
            n = int(sr * dur_ms / 1000)
            frames = bytearray(b"\x00\x00" * int(sr * lead_ms / 1000))
            for i in range(n):
                v = int(amp * 32767 * sum(
                    _math.sin(2 * _math.pi * f * i / sr) for f in freqs))
                frames += max(-32768, min(32767, v)).to_bytes(
                    2, "little", signed=True)
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(bytes(frames))
            return buf.getvalue()

        rows = []
        for i in range(60):
            freqs = [300 + 37 * (i % 19), 900 + 53 * (i % 11),
                     1700 + 29 * (i % 13)]
            rows.append({"media_ref": f"aud/{i:03d}/base",
                         "payload": clip(freqs, 600)})
            if i % 4 == 0:
                rows.append({"media_ref": f"aud/{i:03d}/shift",
                             "payload": clip(freqs, 600,
                                             lead_ms=128 * (1 + i % 3))})
            if i % 6 == 0:
                rows.append({"media_ref": f"aud/{i:03d}/gain",
                             "payload": clip(freqs, 600, amp=0.4)})
        tbl = pa.Table.from_pylist(rows)
        return audio_near_dups(ray.data.from_arrow(tbl), min_votes=40)

    def media_frames(sf_dir):
        """REAL multi-frame decode: animated GIF payloads (stdlib
        writer) -> uniform frame sampling with genuine pixel means via
        the from-scratch LZW/palette/disposal decoder
        (ops/media_meta.decode_gif_frames). The honest codec-free
        stand-in for the video frame-sample stage."""
        import pyarrow as _pa
        import ray
        from docstrange_ray.ops import multimodal
        from docstrange_ray.synth_files import make_gif_animated, synth_gif_frames

        rows = []
        for i in range(200):
            n = 2 + (i % 7)
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 6
            payload = make_gif_animated(
                synth_gif_frames(n, w, h, seed=i), interlace=(i % 3 == 0)
            )
            rows.append(
                {
                    "media_ref": f"media://vid/{i}",
                    "payload": payload,
                    "mime": "image/gif",
                    "width": w,
                    "height": h,
                    "n_frames": n,
                }
            )
        tbl = _pa.Table.from_pylist(rows, schema=multimodal.MEDIA_SCHEMA)
        return multimodal.sample_frames(ray.data.from_arrow(tbl))

    def curated_docs(sf_dir):
        from docstrange_ray.ops.curate import curated_docs as _curate

        return _curate(read_docs(sf_dir), min_quality=0.5)

    def curated_full(sf_dir):
        """The FULL curation chain (quality floor -> exact dedup ->
        SimHash near-dup drop), end-to-end distributed AND end-to-end
        SQL-oracled (window-function dedup + recursive-CTE component
        closure). Text never crosses an exchange."""
        from docstrange_ray.ops.curate import curated_docs_full

        return curated_docs_full(read_docs(sf_dir), min_quality=0.5)

    def media_join(sf_dir):
        """media_ref resolution (SURVEY.md §2.4): image-ref spans of the
        extracted corpus joined to decoded media features by a
        co-partitioned hash join (both sides as Datasets; ONE shuffle)."""
        import ray
        from docstrange_ray.ops import multimodal
        from docstrange_ray.schema import FLAT_SPANS_SCHEMA  # noqa: F401
        from docstrange_ray.shuffle import hash_join

        def image_refs(batch: pa.Table) -> pa.Table:
            rows = []
            for did, spans in zip(
                batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
            ):
                for s in spans:
                    if s["kind"] == "image-ref" and s["media_ref"]:
                        rows.append({"doc_id": did, "media_ref": s["media_ref"]})
            return pa.Table.from_pylist(
                rows,
                schema=pa.schema([("doc_id", pa.string()), ("media_ref", pa.string())]),
            )

        # materialize the (doc_id, media_ref) rows once: they are a tiny
        # projection of the corpus, and both the distinct-ref collection
        # and the join consume them (re-running extraction twice is the
        # alternative)
        refs_ds = (
            _extracted(sf_dir)
            .map_batches(image_refs, batch_format="pyarrow")
            .materialize()
        )
        # distinct refs computed DISTRIBUTED (one hash shuffle of the
        # tiny (media_ref) projection); the collected result is the
        # already-distinct set, needed driver-side only to synthesize
        # the fake media table — at scale the media table pre-exists
        from docstrange_ray.shuffle import grouped_blocks

        distinct_ds = grouped_blocks(
            refs_ds.select_columns(["media_ref"]),
            ["media_ref"],
            lambda df: df.drop_duplicates("media_ref"),
            batch_format="pandas",
        )
        distinct = sorted(r["media_ref"] for r in distinct_ds.take_all())
        media = ray.data.from_arrow(multimodal.synth_media_table(distinct))
        feats = multimodal.decode_features(media).select_columns(
            ["media_ref", "mean_intensity"]
        )
        return hash_join(refs_ds, feats, key="media_ref")

    def embedding_dups(sf_dir):
        # fixture embeddings are near-random (max pairwise cos ~0.5); the
        # fixture threshold 0.4 keeps the op's output non-degenerate
        return dedup.embedding_dup_pairs(read_emb(sf_dir), threshold=0.4)

    def dup_spans_q(sf_dir):
        # ExactSubstr-style duplicate spans at 16-word windows
        return dedup.dup_spans(read_docs(sf_dir), window=16)

    def dup_spans_exact_q(sf_dir):
        """dup_spans' EXACT twin: the same removable-span semantics
        (keep-first, merged intervals, 16-word windows) computed by
        collision-free prefix-doubling classes instead of the rolling
        hash — two independent implementations verified against ONE
        shared SQL oracle."""
        return dedup.dup_spans_exact(read_docs(sf_dir), window=16)

    def pack_offsets_q(sf_dir):
        # concatenate-and-chunk packing layout: 1000-token windows
        from docstrange_ray.ops.packing import pack_offsets

        return pack_offsets(read_docs(sf_dir), budget=1000)

    def source_mix_q(sf_dir):
        # training-mix reweighting: src1:src2:src3:src5 at 4:2:1:1,
        # other sources dropped; binding source kept whole
        from docstrange_ray.ops.sampling import source_mix

        return source_mix(
            read_parquet_clean(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
            ),
            weights={"src1": 4, "src2": 2, "src3": 1, "src5": 1},
        )

    def nb_classify_q(sf_dir):
        # fasttext-shaped stage: NB trained in-engine (one count
        # shuffle), scored shuffle-free. Fixture langs share vocab, so
        # self-accuracy is bounded ~0.44 — separability is pinned by
        # the planted-corpus unit test; THIS query pins exactness.
        from docstrange_ray.ops import classifier

        return classifier.nb_classify(read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        ))

    def kmeans_clusters_q(sf_dir):
        # distributed Lloyd (first-k init, 2 iterations — the exact plan
        # the unrolled SQL oracle reproduces)
        from docstrange_ray.ops import semantic

        return semantic.kmeans_clusters(read_emb(sf_dir), k=8, n_iters=2)

    def semantic_dedup_q(sf_dir):
        # SemDeDup recipe: cluster then drop within-cluster cosine dups;
        # tau=0.35 yields real drop pressure on the near-random fixture
        from docstrange_ray.ops import semantic

        return semantic.semantic_dedup(read_emb(sf_dir), k=8, n_iters=2, tau=0.35)

    def ann_topk(sf_dir):
        first = (
            read_emb(sf_dir)
            .filter(expr="vec_id < 8")
            .take_all()
        )
        first.sort(key=lambda r: r["vec_id"])
        q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in first])
        qids = [int(r["vec_id"]) for r in first]
        return ann.brute_force_topk(read_emb(sf_dir), q, qids, k=10)

    def knn_classify_q(sf_dir):
        """Leave-one-out k-NN label prediction (brute/exact plan):
        corpus broadcast once, one shuffle-free matmul scan, round6
        scores ranked (desc, nid asc), vote ties to lowest label —
        all mirrored verbatim by the SQL oracle."""
        return ann.knn_classify(read_emb(sf_dir), k=10, plan="brute")

    def knn_classify_ivf_q(sf_dir):
        """Scale plan for the same op: IVF coarse quantizer, queries
        probe n_probe buckets, ONE bucket exchange + ONE qid merge/vote
        exchange — approximate (agreement vs brute pinned in
        tests/test_pca_knn.py; exact on separated clusters)."""
        return ann.knn_classify(
            read_emb(sf_dir), k=10, plan="ivf", n_centroids=8, n_probe=3
        )

    def pca_scatter_q(sf_dir):
        """The distributed PCA moment exchange made oracle-visible:
        raw second-moment sums sxx = sum x_i x_j (+ first moments) per
        dimension pair, computed as per-block d x d partials reduced in
        one coalesced combine — SQL rebuilds them by unnesting the
        embedding lists. d=64 -> 4096 rows, corpus-independent."""
        from docstrange_ray.ops import pca

        return pca.second_moment_table(read_emb(sf_dir))

    def pca_project_q(sf_dir):
        """Fit (moments scan + driver eigh, sign-deterministic) then
        project to 8 components via a broadcast shuffle-free scan.
        Eigendecomposition is LAPACK — not SQL-expressible; pinned by
        pytest vs a whole-matrix numpy reference instead."""
        from docstrange_ray.ops import pca

        emb = read_emb(sf_dir)
        mu, comps, _ = pca.pca_fit(emb, n_components=8)
        return pca.pca_project(emb, mu, comps)

    def pca_variance_q(sf_dir):
        """Scree table: top-8 eigenvalues + ratio over the FULL trace.
        Same single moment scan; pytest-pinned (LAPACK floats)."""
        from docstrange_ray.ops import pca

        return pca.pca_variance_table(read_emb(sf_dir), n_components=8)

    return {
        # extraction
        "extract_flagship": extract_flagship,
        "real_format_extract": real_format_extract,
        "pixel_layout_extract": pixel_layout_extract,
        "extract_markdown": extract_markdown,
        "extract_html": extract_html,
        "extract_csv": extract_csv,
        "extract_doc_meta": extract_doc_meta,
        "section_chunks": section_chunks,
        "schema_extraction": schema_extraction,
        "search_docs": search_docs,
        "doc_headers": doc_headers,
        "doc_summaries": doc_summaries,
        "doc_structure": doc_structure,
        "field_extraction": field_extraction,
        # training-data ops
        "token_count": token_count,
        "top_ngrams": top_ngrams,
        "tfidf_terms": tfidf_terms,
        "bm25_search": bm25_search,
        "global_doc_rank": global_doc_rank,
        "source_overlap": source_overlap,
        "late_suppliers": late_suppliers,
        "global_length_rank": global_length_rank,
        "gopher_filter": gopher_filter,
        "lm_quality": lm_quality,
        "pii_scrub": pii_scrub_q,
        "decontaminate": decontaminate_q,
        "repetition_stats": repetition,
        "passage_dedup": passage_dedup_q,
        "cdc_chunks": cdc_chunks_q,
        "cdc_dup_chunks": cdc_dup_chunks_q,
        "pair_edit_distance": pair_edit_distance_q,
        "blocklist_tags": blocklist_tags_q,
        "source_zscore": source_zscore_q,
        "jsonl_roundtrip": jsonl_roundtrip_q,
        "csv_roundtrip": csv_roundtrip_q,
        "ipc_roundtrip": ipc_roundtrip_q,
        "orc_roundtrip": orc_roundtrip_q,
        "token_shard_roundtrip": token_shard_roundtrip,
        "compression_stats": compression_stats_q,
        "weighted_jaccard_pairs": weighted_jaccard_pairs_q,
        "hashed_doc_vectors": hashed_doc_vectors_q,
        "text_semantic_dups": text_semantic_dups_q,
        "dup_positions_exact": dup_positions_exact_q,
        "streaming_dedup_pairs": streaming_dedup_pairs_q,
        "quality_stats": quality_stats,
        "quality_filter": quality_filter,
        "content_fingerprint": content_fp,
        "exact_dedup": exact_dedup,
        "incremental_dedup": incremental_dedup_q,
        "snapshot_diff": snapshot_diff_q,
        "heavy_tokens": heavy_tokens_q,
        "vocab_encode": vocab_encode_q,
        "bpe_pair_counts": bpe_pair_counts_q,
        "byte_bpe_pair_counts": byte_bpe_pair_counts_q,
        "byte_bpe_tokens": byte_bpe_tokens_q,
        "bpe_merges": bpe_merges_q,
        "bpe_token_counts": bpe_token_counts_q,
        "wp_pair_stats": wp_pair_stats_q,
        "wp_merges": wp_merges_q,
        "wp_token_counts": wp_token_counts_q,
        "unigram_seed_counts": unigram_seed_counts_q,
        "unigram_vocab": unigram_vocab_q,
        "unigram_token_counts": unigram_token_counts_q,
        "logreg_grad0": logreg_grad0_q,
        "quality_classifier": quality_classifier_q,
        "classifier_eval": classifier_eval_q,
        "kn_perplexity": kn_perplexity_q,
        "dsir_bucket_counts": dsir_bucket_counts_q,
        "dsir_weights": dsir_weights_q,
        "dsir_selected": dsir_selected_q,
        "cm_estimates": cm_estimates_q,
        "pmi_collocations": pmi_collocations_q,
        "lexical_diversity": lexical_diversity_q,
        "doc_novelty": doc_novelty_q,
        "shared_gram_pairs": shared_gram_pairs_q,
        "lang_confusion": lang_confusion_q,
        "approx_user_reach": approx_user_reach_q,
        "approx_length_quantiles": approx_length_quantiles_q,
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "winnow_fps": winnow_fps,
        "winnow_pairs": winnow_pairs_q,
        "minhash_near_dups": minhash_near_dups,
        "jaccard_join_pairs": jaccard_join_pairs,
        "edit_dup_pairs": edit_dup_pairs,
        "containment_pairs": containment_pairs,
        "tfidf_cosine_pairs": tfidf_cosine_pairs_q,
        "pagerank_purchases": pagerank_purchases,
        "copurchase_triangles": copurchase_triangles,
        "copurchase_reach": copurchase_reach,
        "copurchase_core": copurchase_core,
        "copurchase_cheapest": copurchase_cheapest,
        "copurchase_pagerank_weighted": copurchase_pagerank_weighted_q,
        "copurchase_assortativity": copurchase_assortativity_q,
        "copurchase_ppr": copurchase_ppr_q,
        "purchase_hits": purchase_hits_q,
        "copurchase_communities": copurchase_communities_q,
        "copurchase_communities_weighted": copurchase_communities_weighted_q,
        "copurchase_modularity_weighted": copurchase_modularity_weighted_q,
        "copurchase_modularity": copurchase_modularity_q,
        "copurchase_walks": copurchase_walks_q,
        "copurchase_walk_pairs": copurchase_walk_pairs_q,
        "copurchase_biased_walks": copurchase_biased_walks_q,
        "copurchase_edge_sim": copurchase_edge_sim_q,
        "copurchase_walk_negatives": copurchase_walk_negatives_q,
        "copurchase_neighbor_feats": copurchase_neighbor_feats_q,
        "copurchase_centrality": copurchase_centrality_q,
        "copurchase_components": copurchase_components,
        "part_link_predictions": part_link_predictions,
        "jaccard_drops": jaccard_drops,
        "near_dup_drops": near_dup_drops,
        "near_dup_keep_best": near_dup_keep_best,
        "leakage_safe_split": leakage_safe_split_q,
        "c4_clean": c4_clean,
        "boilerplate_lines": boilerplate_lines,
        "boilerplate_stripped": boilerplate_stripped,
        "mojibake_repair": mojibake_repair,
        "nfc_normalized": nfc_normalized,
        "url_canonical": url_canonical,
        "url_dedup_first": url_dedup_first,
        "url_host_stats": url_host_stats,
        "host_capped": host_capped,
        "simhash_sigs": simhash_sigs,
        "simhash_pairs": simhash_pairs,
        "simhash_drops": simhash_drops,
        "embedding_dups": embedding_dups,
        "margin_mined_pairs": margin_mined_pairs,
        "nb_classify": nb_classify_q,
        "source_mix": source_mix_q,
        "pack_offsets": pack_offsets_q,
        "dup_spans": dup_spans_q,
        "dup_spans_exact": dup_spans_exact_q,
        "kmeans_exact_assignments": kmeans_exact_assignments_q,
        "weighted_price_quantiles": weighted_price_quantiles_q,
        "cosine_pairs_exact": cosine_pairs_exact_q,
        "kcenter_coreset_exact": kcenter_coreset_exact_q,
        "semantic_dedup": semantic_dedup_q,
        "ann_topk": ann_topk,
        "lsh_ann_topk": lsh_ann_topk,
        "media_features": media_features,
        "media_metadata": media_metadata,
        "image_dhash": image_dhash,
        "image_near_dups": image_near_dups,
        "media_join": media_join,
        "curated_docs": curated_docs,
        "curated_full": curated_full,
        "hash_sample_10": hash_sample_10,
        "weighted_sample": weighted_sample_q,
        "stratified_sample": stratified_sample,
        "source_topk": source_topk,
        "length_quantiles": length_quantiles,
        "price_quantile_select": price_quantile_select,
        "returnflag_price_quantiles": returnflag_price_quantiles,
        "returnflag_price_corr": returnflag_price_corr,
        "returnflag_price_regression": returnflag_price_regression,
        "entity_matches": entity_matches,
        "golden_customers": golden_customers_q,
        "customer_k_anonymity": customer_k_anonymity,
        "price_qty_frontier": price_qty_frontier,
        "isotonic_calibration": isotonic_calibration,
        "kcenter_coreset": kcenter_coreset,
        "source_length_mwu": source_length_mwu,
        "priority_price_welch": priority_price_welch,
        "source_mode_length": source_mode_length,
        "source_lang_entropy": source_lang_entropy,
        "rake_keywords": rake_keywords_q,
        "textrank_keywords": textrank_keywords_q,
        "doc_title_links": doc_title_links_q,
        "kmeans_clusters": kmeans_clusters_q,
        "lang_source_chi2": lang_source_chi2,
        "source_length_ks": source_length_ks,
        "plsa_init_counts": plsa_init_counts,
        "plsa_doc_topics": plsa_doc_topics,
        "customer_scd2": customer_scd2,
        "pair_bleu_overlap": pair_bleu_overlap,
        "length_auc": length_auc,
        "doc_quality_tree": doc_quality_tree,
        "source_interleave": source_interleave,
        "user_event_pivot": user_event_pivot,
        "embedding_quantized": embedding_quantized,
        "ensemble_rank": ensemble_rank,
        "zorder_layout_keys": zorder_layout_keys,
        "orders_profile": orders_profile,
        "frequent_part_triples": frequent_part_triples,
        "part_rules": part_rules_q,
        "price_winsorized": price_winsorized,
        "cooccurrence_pairs": cooccurrence_pairs,
        "label_centroid_sims": label_centroid_sims,
        "bootstrap_price_means": bootstrap_price_means,
        "length_outliers": length_outliers,
        "embedding_dups_bucketed": embedding_dups_bucketed,
        "media_frames": media_frames,
        "audio_features": audio_features,
        "audio_fp_dups": audio_fp_dups,
        "ivf_ann_topk": ivf_ann_topk,
        "pq_ann_topk": pq_ann_topk,
        "ivf_recall_planted": ivf_recall_planted,
        "lsh_recall_planted": lsh_recall_planted,
        "hnsw_recall_planted": hnsw_recall_planted,
        "hnsw_ann_topk": hnsw_ann_topk,
        "knn_classify": knn_classify_q,
        "knn_classify_ivf": knn_classify_ivf_q,
        "pca_scatter": pca_scatter_q,
        "pca_project": pca_project_q,
        "pca_variance": pca_variance_q,
        "embedding_decontam": embedding_decontam,
        "mixture_weights": mixture_weights,
        "ccnet_buckets": ccnet_buckets,
        # relational
        "q1_pricing": relational.q1_pricing,
        "q6_revenue": relational.q6_revenue,
        "small_quantity_revenue": relational.small_quantity_revenue,
        "top_supplier_revenue": relational.top_supplier_revenue,
        "top_customers": relational.top_customers,
        "revenue_by_region": relational.revenue_by_region,
        "revenue_rollup": relational.revenue_rollup,
        "events_hourly": relational.events_hourly,
        "events_sliding": relational.events_sliding,
        "events_last_order": relational.events_last_order,
        "order_event_window": relational.order_event_window,
        "priority_returned_orders": relational.priority_returned_orders,
        "order_count_distribution": relational.order_count_distribution,
        "user_running_total": relational.user_running_total,
        "user_interarrival": relational.user_interarrival,
        "user_journeys": relational.user_journeys,
        "daily_anomalies": relational.daily_anomalies,
        "event_affinity": relational.event_affinity,
        "length_histogram": relational.length_histogram,
        "length_dispersion": relational.length_dispersion,
        "source_percent_rank": relational.source_percent_rank,
        "source_decile": relational.source_decile,
        "hourly_trend": relational.hourly_trend,
        "event_user_reach": relational.event_user_reach,
        "events_prop_stats": relational.events_prop_stats,
        "user_sessions": relational.user_sessions,
        "events_funnel": relational.events_funnel,
        "event_transitions": relational.event_transitions,
        "fk_audit": relational.fk_audit,
        "user_retention": relational.user_retention,
        "docs_by_source": relational.docs_by_source,
    }


def _kmeans_cte(k: int, n_iters: int) -> str:
    """CTE chain ending in ``assign(vec_id, cluster)``: the unrolled
    deterministic Lloyd iterations matching
    ``ops/semantic.kmeans_clusters`` (first-k init, rounded-to-6
    centroids and similarities, lowest-cid tie-break, empty clusters
    carry the previous centroid)."""
    parts = [
        f"""ev AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) AS idx,
                   unnest(embedding::DOUBLE[]) /
                     sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y))) AS val
            FROM embeddings
        ),
        seed AS (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
        ),
        c0 AS (
            SELECT s.cid, e.idx, ROUND(e.val, 6) AS cval
            FROM ev e JOIN seed s USING (vec_id)
        )"""
    ]
    for t in range(1, n_iters + 1):
        p = t - 1
        parts.append(
            f"""b{t} AS (
            SELECT vec_id, cid
            FROM (
                SELECT e.vec_id, c.cid, ROUND(SUM(e.val * c.cval), 6) AS sim
                FROM ev e JOIN c{p} c USING (idx)
                GROUP BY 1, 2
            )
            QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) = 1
        ),
        m{t} AS (
            SELECT b.cid, e.idx, AVG(e.val) AS mval
            FROM ev e JOIN b{t} b USING (vec_id)
            GROUP BY 1, 2
        ),
        c{t} AS (
            SELECT cid, idx,
                   ROUND(mval / sqrt(SUM(mval * mval) OVER (PARTITION BY cid)), 6) AS cval
            FROM m{t}
            UNION ALL
            SELECT p.cid, p.idx, p.cval FROM c{p} p
            WHERE p.cid NOT IN (SELECT DISTINCT cid FROM m{t})
        )"""
        )
    parts.append(
        f"""assign AS (
            SELECT vec_id, cid AS cluster
            FROM (
                SELECT e.vec_id, c.cid, ROUND(SUM(e.val * c.cval), 6) AS sim
                FROM ev e JOIN c{n_iters} c USING (idx)
                GROUP BY 1, 2
            )
            QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) = 1
        )"""
    )
    return "WITH " + ",\n".join(parts)


def _pagerank_core(iters: int = 5, scale: int = 10**12,
                   weighted: bool = False,
                   tele_sql: str | None = None) -> str:
    """Unrolled-CTE DuckDB mirror of ops.graph.pagerank's iteration
    chain over a caller-provided CTE ``e(src, dst)`` of DISTINCT
    directed edges: one CTE per iteration, integer floor arithmetic
    throughout (DuckDB `//`), so the comparison is bit-exact. The
    returned fragment starts mid-WITH (", nodes AS ...") and defines
    nodes/nn/deg/r0..r{iters}. ``tele_sql`` (a SELECT yielding the
    seed node column over ``nodes``) switches to the PERSONALIZED
    walk: jump term, initial mass and dangling share land on the seed
    set only — mirroring pagerank(teleport=...) term for term."""
    dexpr = "SUM(w)" if weighted else "COUNT(*)"
    head = f""", nodes AS MATERIALIZED (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ), nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
        deg AS MATERIALIZED (SELECT src, {dexpr} AS d FROM e GROUP BY src)"""
    if tele_sql is None:
        jump_n = "(SELECT n FROM nn)"
        is_seed = None
    else:
        head += f""", tele AS MATERIALIZED ({tele_sql}),
        nt AS MATERIALIZED (SELECT COUNT(*) AS n FROM tele)"""
        jump_n = "(SELECT n FROM nt)"
        is_seed = "n.node IN (SELECT node FROM tele)"
    if tele_sql is None:
        head += f""",
        r0 AS MATERIALIZED (
            SELECT node, {scale} // {jump_n} AS r FROM nodes
        )"""
    else:
        head += f""",
        r0 AS MATERIALIZED (
            SELECT n.node,
                   CASE WHEN {is_seed}
                        THEN {scale} // {jump_n} ELSE 0 END AS r
            FROM nodes n
        )"""
    its = []
    contrib = "p.r * e.w // d.d" if weighted else "p.r // d.d"
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        dang = f"""(SELECT COALESCE(SUM(p.r), 0) FROM {p} p
                              LEFT JOIN deg d ON d.src = p.node
                              WHERE d.d IS NULL) // {jump_n}"""
        if tele_sql is None:
            jump_term = f"15 * {scale} // (100 * {jump_n})"
            dang_term = dang
        else:
            jump_term = (f"CASE WHEN {is_seed} THEN "
                         f"15 * {scale} // (100 * {jump_n}) ELSE 0 END")
            dang_term = f"CASE WHEN {is_seed} THEN {dang} ELSE 0 END"
        its.append(
            f""", r{i} AS MATERIALIZED (
            SELECT n.node,
                   {jump_term}
                   + 85 * (COALESCE(s.insum, 0)
                           + {dang_term}
                     ) // 100 AS r
            FROM nodes n
            LEFT JOIN (
                SELECT e.dst AS node, SUM({contrib}) AS insum
                FROM e JOIN {p} p ON p.node = e.src
                       JOIN deg d ON d.src = e.src
                GROUP BY e.dst
            ) s ON s.node = n.node
        )"""
        )
    return head + "".join(its)


def _pagerank_oracle(iters: int = 5, scale: int = 10**12) -> str:
    """_pagerank_core over the distinct customer->supplier purchase
    graph (parity-disjoint node ids, ops.graph.purchase_pagerank)."""
    return (
        """
        WITH e AS (
            SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        )"""
        + _pagerank_core(iters, scale)
        + f'\n        SELECT node, CAST(r AS BIGINT) AS "rank" FROM r{iters}'
    )


def _kcenter_oracle(k: int = 8, q: int = 10**6) -> str:
    """Unrolled-CTE mirror of semantic.kcenter_select_exact: one
    (min-dist, argmax, union) CTE triple per greedy round, exact int64
    squared-L2 on the quantized coordinates, ties on lowest id."""
    quant = (
        f"CAST(CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0 "
        f"THEN FLOOR(CAST(embedding[i] AS DOUBLE) * {q}.0 + 0.5) "
        f"ELSE -FLOOR(-CAST(embedding[i] AS DOUBLE) * {q}.0 + 0.5) END "
        f"AS BIGINT)"
    )
    sql = f"""
        WITH pts AS MATERIALIZED (
            SELECT vec_id, i, {quant} AS x
            FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        ), sel0 AS MATERIALIZED (
            SELECT MIN(vec_id) AS id FROM pts
        )"""
    for j in range(1, k):
        sql += f""", m{j} AS MATERIALIZED (
            SELECT t.vid AS id, MIN(t.d2) AS d2 FROM (
                SELECT a.vec_id AS vid, s.id AS cid,
                       SUM((a.x - c.x) * (a.x - c.x)) AS d2
                FROM sel{j - 1} s
                JOIN pts c ON c.vec_id = s.id
                JOIN pts a ON a.i = c.i
                GROUP BY 1, 2
            ) t
            WHERE t.vid NOT IN (SELECT id FROM sel{j - 1})
            GROUP BY 1
        ), w{j} AS MATERIALIZED (
            SELECT id, CAST(d2 AS BIGINT) AS d2
            FROM m{j} ORDER BY d2 DESC, id LIMIT 1
        ), sel{j} AS MATERIALIZED (
            SELECT id FROM sel{j - 1} UNION ALL SELECT id FROM w{j}
        )"""
    finals = [
        "SELECT CAST(0 AS BIGINT) AS sel_order, id, "
        "CAST(-1 AS BIGINT) AS d2 FROM sel0"
    ]
    for j in range(1, k):
        finals.append(
            f"SELECT CAST({j} AS BIGINT) AS sel_order, id, d2 FROM w{j}"
        )
    return sql + "\n        " + "\n        UNION ALL ".join(finals)


def _kmeans_oracle(k: int = 8, iters: int = 2, q: int = 10**6) -> str:
    """Unrolled-CTE DuckDB mirror of ops.kmeans.kmeans_quantized over
    the embeddings table: quantize (sign * floor(|x*q| + 0.5)), seed by
    (md5_key52, id), per-iteration argmin assignment (ties -> lowest
    centroid index) + truncated-division centroid update (DuckDB `//`),
    final assignment emit. Exact integers throughout -> bit-identical."""
    quant = (
        f"CAST(CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0 "
        f"THEN FLOOR(CAST(embedding[i] AS DOUBLE) * {q}.0 + 0.5) "
        f"ELSE -FLOOR(-CAST(embedding[i] AS DOUBLE) * {q}.0 + 0.5) END "
        f"AS BIGINT)"
    )
    sql = f"""
        WITH pts AS MATERIALIZED (
            SELECT vec_id, i, {quant} AS x
            FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        ), seeds AS MATERIALIZED (
            SELECT vec_id,
                   ROW_NUMBER() OVER (
                       ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                                1, 13))::BIGINT, vec_id
                   ) - 1 AS cidx
            FROM (SELECT DISTINCT vec_id FROM embeddings)
            ORDER BY cidx LIMIT {k}
        ), c0 AS MATERIALIZED (
            SELECT s.cidx, p.i, p.x AS v
            FROM seeds s JOIN pts p ON p.vec_id = s.vec_id
        )"""
    for r in range(1, iters + 1):
        prev = f"c{r - 1}"
        sql += f""", d{r} AS MATERIALIZED (
            SELECT p.vec_id, c.cidx,
                   CAST(SUM((p.x - c.v) * (p.x - c.v)) AS BIGINT) AS d2
            FROM pts p JOIN {prev} c ON c.i = p.i
            GROUP BY 1, 2
        ), a{r} AS MATERIALIZED (
            SELECT vec_id, cidx FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d2, cidx) AS rn
                FROM d{r}
            ) WHERE rn = 1
        ), c{r} AS MATERIALIZED (
            SELECT c.cidx, c.i, CAST(COALESCE(u.v, c.v) AS BIGINT) AS v
            FROM {prev} c LEFT JOIN (
                SELECT a.cidx, p.i, SUM(p.x) // COUNT(*) AS v
                FROM a{r} a JOIN pts p ON p.vec_id = a.vec_id
                GROUP BY 1, 2
            ) u ON u.cidx = c.cidx AND u.i = c.i
        )"""
    sql += f""", dF AS MATERIALIZED (
            SELECT p.vec_id, c.cidx,
                   CAST(SUM((p.x - c.v) * (p.x - c.v)) AS BIGINT) AS d2
            FROM pts p JOIN c{iters} c ON c.i = p.i
            GROUP BY 1, 2
        )
        SELECT vec_id, CAST(cidx AS BIGINT) AS cluster, d2 FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d2, cidx) AS rn
            FROM dF
        ) WHERE rn = 1"""
    return sql


def _textrank_oracle(stop_vals: str, k: int = 50, iters: int = 5) -> str:
    """_pagerank_core over the TextRank word co-occurrence graph
    (ops/keywords.textrank_keywords contract: content tokens =
    alphabetic non-stopwords of the ASCII-whitespace split, adjacent
    distinct pairs, unordered distinct, symmetrized; node id =
    md5-prefix 60-bit)."""
    return (
        rf"""
        WITH stop(sw) AS (VALUES {stop_vals}),
        docs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS ws
            FROM documents
        ), tok AS (
            SELECT doc_id, i, ws[i] AS w
            FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(i)
        ), content AS MATERIALIZED (
            SELECT doc_id, w,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS rn
            FROM tok
            WHERE regexp_full_match(w, '[a-z]+')
              AND w NOT IN (SELECT sw FROM stop)
        ), pair0 AS (
            SELECT c1.w AS wa, c2.w AS wb
            FROM content c1 JOIN content c2
              ON c1.doc_id = c2.doc_id AND c2.rn = c1.rn + 1
            WHERE c1.w <> c2.w
        ), wpairs AS MATERIALIZED (
            SELECT LEAST(wa, wb) AS x, GREATEST(wa, wb) AS y
            FROM pair0 GROUP BY 1, 2
        ), wordmap AS MATERIALIZED (
            SELECT w, CAST(('0x' || substr(md5(w), 1, 15))::UBIGINT AS BIGINT)
                       AS id
            FROM (SELECT x AS w FROM wpairs UNION SELECT y AS w FROM wpairs)
        ), e AS MATERIALIZED (
            SELECT mx.id AS src, my.id AS dst
            FROM wpairs JOIN wordmap mx ON mx.w = wpairs.x
                        JOIN wordmap my ON my.w = wpairs.y
            UNION
            SELECT my.id AS src, mx.id AS dst
            FROM wpairs JOIN wordmap mx ON mx.w = wpairs.x
                        JOIN wordmap my ON my.w = wpairs.y
        )"""
        + _pagerank_core(iters)
        + rf"""
        SELECT wm.w AS word, CAST(r.r AS BIGINT) AS "rank"
        FROM r{iters} r JOIN wordmap wm ON wm.id = r.node
        ORDER BY r.r DESC, wm.w LIMIT {k}"""
    )


def _kcore_oracle(k: int = 3, rounds: int = 24) -> str:
    """Unrolled-peel mirror of ops.graph.k_core over the co-purchase
    path graph: each round keeps nodes with >= k neighbors among the
    previous survivors. Peeling is monotone, so rounds past the
    fixpoint are no-ops — unrolling MORE rounds than the engine needed
    is harmless, and the engine RAISES if its own cap is exceeded, so
    a converged engine result always equals the ``rounds``-deep CTE
    (MATERIALIZED: each s_r is referenced twice per round — plain CTEs
    would inline 2^rounds copies)."""
    sql = """
        WITH op AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        ), sq AS (
            SELECT ok, p,
                   ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
            FROM op
        ), e0 AS (
            SELECT s1.p AS x, s2.p AS y
            FROM sq s1 JOIN sq s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
        ), ue AS MATERIALIZED (
            SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b
            FROM e0 WHERE x <> y GROUP BY 1, 2
        ), sym AS MATERIALIZED (
            SELECT a AS node, b AS other FROM ue
            UNION ALL
            SELECT b, a FROM ue
        ), s0 AS MATERIALIZED (
            SELECT DISTINCT node FROM sym
        )"""
    for r in range(1, rounds + 1):
        sql += f""", s{r} AS MATERIALIZED (
            SELECT node FROM (
                SELECT x.node, COUNT(*) AS d
                FROM sym x
                JOIN s{r - 1} p1 ON p1.node = x.node
                JOIN s{r - 1} p2 ON p2.node = x.other
                GROUP BY x.node
            ) WHERE d >= {k}
        )"""
    sql += f"""
        SELECT x.node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym x
        JOIN s{rounds} p1 ON p1.node = x.node
        JOIN s{rounds} p2 ON p2.node = x.other
        GROUP BY x.node"""
    return sql


_CP_SYM_HEAD = """
        WITH op AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        ), sq AS (
            SELECT ok, p,
                   ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
            FROM op
        ), e0 AS (
            SELECT s1.p AS x, s2.p AS y
            FROM sq s1 JOIN sq s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
        ), ue AS MATERIALIZED (
            SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b
            FROM e0 WHERE x <> y GROUP BY 1, 2
        ), e AS MATERIALIZED (
            SELECT a AS src, b AS dst FROM ue
            UNION ALL
            SELECT b, a FROM ue
        ), nodes AS MATERIALIZED (
            SELECT DISTINCT src AS node FROM e
        )"""


def _lpa_chain(rounds: int) -> str:
    """Unrolled-CTE mirror of ops.community.label_propagation over the
    _CP_SYM_HEAD symmetric edge table ``e``: per round, count previous
    labels over incoming edges, argmax on (count DESC, label ASC) —
    semi-synchronous, so round r reads ONLY l{r-1}. Every node of an
    edge-derived symmetric graph has >= 1 neighbor, so l{r} covers all
    nodes without a COALESCE fallback (the engine keeps isolated
    walkers' labels only for safety)."""
    sql = """, l0 AS MATERIALIZED (
            SELECT node, node AS lab FROM nodes
        )"""
    for i in range(1, rounds + 1):
        sql += f""", c{i} AS MATERIALIZED (
            SELECT e.dst AS node, p.lab, COUNT(*) AS c
            FROM e JOIN l{i - 1} p ON p.node = e.src
            GROUP BY 1, 2
        ), l{i} AS MATERIALIZED (
            SELECT node, lab FROM (
                SELECT node, lab,
                       ROW_NUMBER() OVER (
                           PARTITION BY node ORDER BY c DESC, lab
                       ) AS rn
                FROM c{i}
            ) WHERE rn = 1
        )"""
    return sql


def _communities_oracle(rounds: int = 4) -> str:
    return (
        _CP_SYM_HEAD
        + _lpa_chain(rounds)
        + f"\n        SELECT node, lab AS label FROM l{rounds}"
    )


def _communities_weighted_oracle(rounds: int = 4) -> str:
    """Weighted-LPA mirror: e carries w = co-purchase count per
    unordered pair (both directions), votes are SUM(e.w)."""
    sql = """
        WITH op AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        ), sq AS (
            SELECT ok, p,
                   ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
            FROM op
        ), e0 AS (
            SELECT s1.p AS x, s2.p AS y
            FROM sq s1 JOIN sq s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
        ), uw AS MATERIALIZED (
            SELECT x AS a, y AS b, COUNT(*) AS w FROM e0 GROUP BY 1, 2
        ), e AS MATERIALIZED (
            SELECT a AS src, b AS dst, w FROM uw
            UNION ALL
            SELECT b, a, w FROM uw
        ), nodes AS MATERIALIZED (
            SELECT DISTINCT src AS node FROM e
        ), l0 AS MATERIALIZED (
            SELECT node, node AS lab FROM nodes
        )"""
    for i in range(1, rounds + 1):
        sql += f""", c{i} AS MATERIALIZED (
            SELECT e.dst AS node, p.lab, SUM(e.w) AS c
            FROM e JOIN l{i - 1} p ON p.node = e.src
            GROUP BY 1, 2
        ), l{i} AS MATERIALIZED (
            SELECT node, lab FROM (
                SELECT node, lab,
                       ROW_NUMBER() OVER (
                           PARTITION BY node ORDER BY c DESC, lab
                       ) AS rn
                FROM c{i}
            ) WHERE rn = 1
        )"""
    return sql + f"\n        SELECT node, lab AS label FROM l{rounds}"


def _modularity_weighted_oracle(rounds: int = 4) -> str:
    """Weighted-modularity mirror: W / intra / sum_sc2 from the
    weighted chain (strength = SUM w per node), the same double
    expression as community.modularity_stats_weighted.finalize_row."""
    chain = _communities_weighted_oracle(rounds)
    # reuse the weighted head+chain text up to (not incl.) the final
    # SELECT, then append the stats tail
    head = chain.rsplit("SELECT node, lab AS label", 1)[0]
    return head + f""", st AS (
            SELECT (SELECT SUM(w) FROM uw) AS wt,
                   (SELECT SUM(u.w)
                    FROM uw u
                    JOIN l{rounds} x ON x.node = u.a
                    JOIN l{rounds} y ON y.node = u.b
                    WHERE x.lab = y.lab) AS intra,
                   (SELECT SUM(sc * sc) FROM (
                        SELECT SUM(s.s) AS sc
                        FROM l{rounds} l
                        JOIN (SELECT src AS node, SUM(w) AS s
                              FROM e GROUP BY 1) s ON s.node = l.node
                        GROUP BY l.lab)) AS ssc2
        )
        SELECT CAST(wt AS BIGINT) AS w_total,
               CAST(COALESCE(intra, 0) AS BIGINT) AS intra_weight,
               CAST(ssc2 AS BIGINT) AS sum_sc2,
               ROUND((4.0 * wt * COALESCE(intra, 0) - CAST(ssc2 AS DOUBLE))
                     / (4.0 * wt * wt), 6) AS modularity
        FROM st"""


def _modularity_oracle(rounds: int = 4) -> str:
    """Exact-int modularity of the LPA partition: m / intra / sum_dc2
    as BIGINTs plus ONE double expression mirrored term-for-term with
    community.modularity_stats.finalize_row."""
    return (
        _CP_SYM_HEAD
        + _lpa_chain(rounds)
        + f""", st AS (
            SELECT (SELECT COUNT(*) FROM ue) AS m,
                   (SELECT COUNT(*)
                    FROM ue u
                    JOIN l{rounds} x ON x.node = u.a
                    JOIN l{rounds} y ON y.node = u.b
                    WHERE x.lab = y.lab) AS intra,
                   (SELECT SUM(dc * dc) FROM (
                        SELECT SUM(d.d) AS dc
                        FROM l{rounds} l
                        JOIN (SELECT src AS node, COUNT(*) AS d
                              FROM e GROUP BY 1) d ON d.node = l.node
                        GROUP BY l.lab)) AS sdc2
        )
        SELECT CAST(m AS BIGINT) AS m_edges,
               CAST(intra AS BIGINT) AS intra_edges,
               CAST(sdc2 AS BIGINT) AS sum_dc2,
               ROUND((4.0 * m * intra - CAST(sdc2 AS DOUBLE))
                     / (4.0 * m * m), 6) AS modularity
        FROM st"""
    )


def _walks_chain(steps: int) -> str:
    """The unrolled walk CTE chain (mirror of ops.community.
    random_walks — the step-t move from node u picks argmin over
    neighbors n of the house 52-bit md5 key of 'u|t|n', ties on n),
    ending with ``w(start, step, node)`` holding the full corpus."""
    sql = _CP_SYM_HEAD + """, s0 AS MATERIALIZED (
            SELECT node AS start, node FROM nodes
        )"""
    for i in range(1, steps + 1):
        t = i - 1
        sql += f""", s{i} AS MATERIALIZED (
            SELECT start, dst AS node FROM (
                SELECT p.start, e.dst,
                       ROW_NUMBER() OVER (PARTITION BY p.start ORDER BY
                           ('0x' || substr(md5(
                               CAST(p.node AS VARCHAR) || '|{t}|'
                               || CAST(e.dst AS VARCHAR)), 1, 13))::BIGINT,
                           e.dst) AS rn
                FROM s{i - 1} p JOIN e ON e.src = p.node
            ) WHERE rn = 1
        )"""
    steps_sql = "\n            UNION ALL ".join(
        f"SELECT start, CAST({i} AS BIGINT) AS step, node FROM s{i}"
        for i in range(steps + 1)
    )
    return sql + f""", w AS MATERIALIZED (
            {steps_sql}
        )"""


def _walks_oracle(steps: int = 4) -> str:
    return _walks_chain(steps) + "\n        SELECT start, step, node FROM w"


def _walk_negatives_oracle(
    steps: int = 4, window: int = 2, k_neg: int = 2
) -> str:
    """Mirror of ops.community.walk_negative_samples: the walk-pair
    chain, the node-ordered cumulative-degree table (window prefix
    sums), and the deterministic inverse-CDF draw md5_key52(
    "center|context|k") % total joined into its [lo, lo+d) interval."""
    ks = ", ".join(str(i) for i in range(k_neg))
    return _walks_chain(steps) + f""", prs AS MATERIALIZED (
            SELECT w1.node AS center, w2.node AS context
            FROM w w1 JOIN w w2 ON w1.start = w2.start
                 AND ABS(w1.step - w2.step) BETWEEN 1 AND {window}
            GROUP BY 1, 2
        ), dg AS MATERIALIZED (
            SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1
        ), cum AS MATERIALIZED (
            SELECT node, d,
                   COALESCE(SUM(d) OVER (ORDER BY node
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS lo
            FROM dg
        ), tot AS (
            SELECT SUM(d) AS t FROM dg
        ), dr AS (
            SELECT center, context, k,
                   ('0x' || substr(md5(
                       CAST(center AS VARCHAR) || '|'
                       || CAST(context AS VARCHAR) || '|'
                       || CAST(k AS VARCHAR)), 1, 13))::BIGINT
                   % (SELECT t FROM tot) AS u
            FROM prs, (SELECT UNNEST([{ks}]) AS k)
        )
        SELECT d.center, d.context, CAST(d.k AS BIGINT) AS k,
               c.node AS negative
        FROM dr d JOIN cum c ON d.u >= c.lo AND d.u < c.lo + c.d"""


def _biased_walks_oracle(steps: int = 4) -> str:
    """Unrolled mirror of ops.community.biased_walks (node2vec p=4,
    q=2): the move key is the deterministic exponential race
    -LN((h+0.5)/2^64) / w with h the 64-bit md5 prefix of "cur|t|n"
    and w in {0.25, 1.0, 0.5} (return / triangle / outward — powers
    of two, so the float chain is bit-identical); the first move (no
    prev) races uniformly."""
    sql = _CP_SYM_HEAD + """, s0 AS MATERIALIZED (
            SELECT node AS start, CAST(NULL AS BIGINT) AS prev, node
            FROM nodes
        )"""
    for i in range(1, steps + 1):
        t = i - 1
        sql += f""", s{i} AS MATERIALIZED (
            SELECT start, node AS prev, dst AS node FROM (
                SELECT p.start, p.node, e.dst,
                       ROW_NUMBER() OVER (PARTITION BY p.start ORDER BY
                           -LN((CAST(('0x' || substr(md5(
                                CAST(p.node AS VARCHAR) || '|{t}|'
                                || CAST(e.dst AS VARCHAR)
                            ), 1, 16))::UBIGINT AS DOUBLE) + 0.5)
                            / 18446744073709551616.0)
                           / (CASE WHEN p.prev IS NULL THEN 1.0
                                   WHEN e.dst = p.prev THEN 0.25
                                   WHEN EXISTS (SELECT 1 FROM e e2
                                                WHERE e2.src = p.prev
                                                  AND e2.dst = e.dst)
                                        THEN 1.0
                                   ELSE 0.5 END),
                           e.dst) AS rn
                FROM s{i - 1} p JOIN e ON e.src = p.node
            ) WHERE rn = 1
        )"""
    finals = [
        f"SELECT start, CAST({i} AS BIGINT) AS step, node FROM s{i}"
        for i in range(steps + 1)
    ]
    return sql + "\n        " + "\n        UNION ALL ".join(finals)


def _walk_pairs_oracle(steps: int = 4, window: int = 2) -> str:
    """Skip-gram pairs over the walk corpus (ops.community.
    walk_skipgram_pairs): every ordered within-window position pair per
    walk, counted per (center, context)."""
    return _walks_chain(steps) + f"""
        SELECT w1.node AS center, w2.node AS context,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM w w1 JOIN w w2 ON w1.start = w2.start
             AND ABS(w1.step - w2.step) BETWEEN 1 AND {window}
        GROUP BY 1, 2"""


def _harmonic_oracle(k_seeds: int = 4, max_hops: int = 3) -> str:
    """Unrolled multi-source BFS mirror of ops.community.
    harmonic_centrality: seeds = k smallest (md5_key52(node), node);
    per hop, the new frontier is unreached neighbors of the previous
    hop's frontier; 1/d sums held exact as integers scaled by
    L = lcm(1..max_hops)."""
    import math as _math

    L = _math.lcm(*range(1, max_hops + 1))
    sql = _CP_SYM_HEAD + f""", seeds AS MATERIALIZED (
            SELECT node FROM (
                SELECT node,
                       ('0x' || substr(md5(CAST(node AS VARCHAR)),
                                       1, 13))::BIGINT AS h
                FROM nodes
            ) ORDER BY h, node LIMIT {k_seeds}
        ), v0 AS MATERIALIZED (
            SELECT node AS seed, node, 0 AS d FROM seeds
        )"""
    for i in range(1, max_hops + 1):
        sql += f""", f{i} AS MATERIALIZED (
            SELECT DISTINCT p.seed, e.dst AS node
            FROM v{i - 1} p JOIN e ON e.src = p.node
            WHERE p.d = {i - 1} AND NOT EXISTS (
                SELECT 1 FROM v{i - 1} v
                WHERE v.seed = p.seed AND v.node = e.dst)
        ), v{i} AS MATERIALIZED (
            SELECT * FROM v{i - 1}
            UNION ALL
            SELECT seed, node, {i} AS d FROM f{i}
        )"""
    return sql + f"""
        SELECT node, CAST(SUM({L} // d) AS BIGINT) AS harm_num,
               ROUND(CAST(SUM({L} // d) AS DOUBLE) / {L}.0, 6) AS harmonic
        FROM v{max_hops} WHERE d >= 1 GROUP BY 1"""


def _hits_oracle(iters: int = 3, scale: int = 10**9) -> str:
    """Unrolled-CTE mirror of ops.graph.hits over the customer->part
    purchase graph: per round, authority = sum of incoming hub scores
    rescaled by v * scale // max(v), then hubs symmetrically — trunc
    division (DuckDB `//`) keeps every round exact-integer."""
    sql = f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS src, l_partkey AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ), h0 AS MATERIALIZED (
            SELECT DISTINCT src AS node, CAST({scale} AS BIGINT) AS s FROM e
        )"""
    for r in range(1, iters + 1):
        sql += f""", ar{r} AS MATERIALIZED (
            SELECT e.dst AS node, SUM(h.s) AS v
            FROM e JOIN h{r - 1} h ON h.node = e.src GROUP BY 1
        ), a{r} AS MATERIALIZED (
            SELECT node, v * {scale} // (SELECT MAX(v) FROM ar{r}) AS s
            FROM ar{r}
        ), hr{r} AS MATERIALIZED (
            SELECT e.src AS node, SUM(a.s) AS v
            FROM e JOIN a{r} a ON a.node = e.dst GROUP BY 1
        ), h{r} AS MATERIALIZED (
            SELECT node, v * {scale} // (SELECT MAX(v) FROM hr{r}) AS s
            FROM hr{r}
        )"""
    return sql + f"""
        SELECT node, 'hub' AS kind, s AS score FROM h{iters}
        UNION ALL
        SELECT node, 'authority' AS kind, s AS score FROM a{iters}"""


def _copurchase_weighted_pagerank_oracle(iters: int = 5) -> str:
    """Weighted _pagerank_core over the co-purchase path graph
    (w = LEAST(count, 1e6))."""
    return (
        """
        WITH op AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        ), sq AS (
            SELECT ok, p,
                   ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
            FROM op
        ), e0 AS (
            SELECT s1.p AS x, s2.p AS y
            FROM sq s1 JOIN sq s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
        ), e AS MATERIALIZED (
            SELECT x AS src, y AS dst,
                   LEAST(COUNT(*), 1000000) AS w
            FROM e0 GROUP BY 1, 2
        )"""
        + _pagerank_core(iters, weighted=True)
        + f'\n        SELECT node, CAST(r AS BIGINT) AS "rank" FROM r{iters}'
    )


def oracle_sql() -> dict[str, str]:
    from docstrange_ray import relational
    from docstrange_ray.ops.bootstrap import poisson_sql_weight_expr
    from docstrange_ray.ops.bytebpe import BYTE_PRETOKEN_PATTERN, byte_to_unicode
    from docstrange_ray.ops.keywords import STOPWORDS as _RAKE_STOP

    _rake_stop_vals = ", ".join(f"('{w}')" for w in _RAKE_STOP)
    # byte-BPE contract constants shared verbatim with ops/bytebpe: the
    # RE2-compatible pre-token pattern and the byte->unicode stand-ins
    # for the whitespace/control bytes an ASCII corpus can contain
    # (printable ASCII maps to itself)
    _bbpe_pat = BYTE_PRETOKEN_PATTERN.replace("'", "''")
    _b2u = byte_to_unicode()
    _bbpe_map_cases = " ".join(
        f"WHEN chr({b}) THEN chr({ord(_b2u[b])})"
        for b in (9, 10, 11, 12, 13, 32, 127)
    )

    return {
        # --- extraction spec oracles (VERDICT r4 #1) -----------------------
        # The expected-span fixtures are written by queries() registration
        # from the generator STRUCTURE (synth_expected.py — independent of
        # the extract/ parsers); these oracles rebuild each query's exact
        # output table from the fixture, so the driver's hash compare is an
        # end-to-end check of serialize → parse → extract → project.
        # extract_markdown: spans_to_markdown contract — image-refs render
        # ![alt](ref), empty parts dropped, blank-line join in span order.
        "extract_markdown": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            ), sp AS (
                SELECT * FROM read_parquet('/tmp/dsray_expected_v2/spans_n*.parquet')
                WHERE n = (SELECT n FROM nn)
            ), parts AS (
                SELECT doc_id, "offset",
                       CASE WHEN kind = 'image-ref'
                            THEN '![' || text || '](' || media_ref || ')'
                            ELSE text END AS part
                FROM sp
            )
            SELECT doc_id,
                   STRING_AGG(part, chr(10) || chr(10) ORDER BY "offset")
                       AS markdown
            FROM parts WHERE part <> '' GROUP BY doc_id
        """,
        # extract_doc_meta: spans_to_json metadata contract — sections =
        # heading spans, level = leading-'#' run length, flags from kinds.
        "extract_doc_meta": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            ), sp AS (
                SELECT * FROM read_parquet('/tmp/dsray_expected_v2/spans_n*.parquet')
                WHERE n = (SELECT n FROM nn)
            )
            SELECT doc_id,
                   COUNT(*) AS n_spans,
                   COUNT(*) FILTER (kind = 'heading') AS section_count,
                   COALESCE(MAX(CASE WHEN kind = 'heading'
                                     THEN LENGTH(text) - LENGTH(LTRIM(text, '#'))
                                END), 0) AS max_heading_level,
                   BOOL_OR(kind = 'table') AS has_tables,
                   BOOL_OR(kind = 'image-ref') AS has_images
            FROM sp GROUP BY doc_id
        """,
        # section_chunks: the chunk fixture is computed by an independent
        # re-derivation of the greedy token-budget packing contract.
        "section_chunks": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            )
            SELECT doc_id, chunk_id, n_sections, n_tokens_est,
                   first_section, text
            FROM read_parquet('/tmp/dsray_expected_v2/chunks_n*.parquet')
            WHERE n = (SELECT n FROM nn)
        """,
        # schema_extraction: golden nested-schema JSON per fixture doc —
        # numbers.xlsx's Summary sheet (headers cover region+total)
        # exercises the array-of-object rule; report.docx the typed
        # scalar; data.csv the nested-object leaf fallback.
        "schema_extraction": """
            SELECT * FROM (VALUES
                ('data.csv', '{"meta": {"name": "widget", "region": null}, "revenue": null, "rows": []}'),
                ('deck.pptx', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('ledger.xls', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('legacy.doc', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('notes.txt', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('numbers.xlsx', '{"meta": {"name": null, "region": "north"}, "revenue": null, "rows": [{"region": "north", "total": 10}, {"region": "south", "total": 7}]}'),
                ('page.html', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('paper.pdf', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('photo.png', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('report.docx', '{"meta": {"name": null, "region": null}, "revenue": 100.0, "rows": []}'),
                ('scan.jpg', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('scan.pdf', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}'),
                ('talk.ppt', '{"meta": {"name": null, "region": null}, "revenue": null, "rows": []}')
            ) AS t(doc_id, extracted)
        """,
        # field_extraction: golden (doc, field, value, found) table over
        # the real-bytes fixture corpus — the rules-based analogue's
        # contract: report.docx's two-column table rows yield revenue/
        # costs, data.csv's and numbers.xlsx's header columns yield
        # name/region (first data row), everything else is absent.
        "field_extraction": """
            SELECT * FROM (VALUES
                ('data.csv', 'costs', '', FALSE),
                ('data.csv', 'name', 'widget', TRUE),
                ('data.csv', 'region', '', FALSE),
                ('data.csv', 'revenue', '', FALSE),
                ('deck.pptx', 'costs', '', FALSE),
                ('deck.pptx', 'name', '', FALSE),
                ('deck.pptx', 'region', '', FALSE),
                ('deck.pptx', 'revenue', '', FALSE),
                ('ledger.xls', 'costs', '', FALSE),
                ('ledger.xls', 'name', '', FALSE),
                ('ledger.xls', 'region', '', FALSE),
                ('ledger.xls', 'revenue', '', FALSE),
                ('legacy.doc', 'costs', '', FALSE),
                ('legacy.doc', 'name', '', FALSE),
                ('legacy.doc', 'region', '', FALSE),
                ('legacy.doc', 'revenue', '', FALSE),
                ('notes.txt', 'costs', '', FALSE),
                ('notes.txt', 'name', '', FALSE),
                ('notes.txt', 'region', '', FALSE),
                ('notes.txt', 'revenue', '', FALSE),
                ('numbers.xlsx', 'costs', '', FALSE),
                ('numbers.xlsx', 'name', '', FALSE),
                ('numbers.xlsx', 'region', 'north', TRUE),
                ('numbers.xlsx', 'revenue', '', FALSE),
                ('page.html', 'costs', '', FALSE),
                ('page.html', 'name', '', FALSE),
                ('page.html', 'region', '', FALSE),
                ('page.html', 'revenue', '', FALSE),
                ('paper.pdf', 'costs', '', FALSE),
                ('paper.pdf', 'name', '', FALSE),
                ('paper.pdf', 'region', '', FALSE),
                ('paper.pdf', 'revenue', '', FALSE),
                ('photo.png', 'costs', '', FALSE),
                ('photo.png', 'name', '', FALSE),
                ('photo.png', 'region', '', FALSE),
                ('photo.png', 'revenue', '', FALSE),
                ('report.docx', 'costs', '40', TRUE),
                ('report.docx', 'name', '', FALSE),
                ('report.docx', 'region', '', FALSE),
                ('report.docx', 'revenue', '100', TRUE),
                ('scan.jpg', 'costs', '', FALSE),
                ('scan.jpg', 'name', '', FALSE),
                ('scan.jpg', 'region', '', FALSE),
                ('scan.jpg', 'revenue', '', FALSE),
                ('scan.pdf', 'costs', '', FALSE),
                ('scan.pdf', 'name', '', FALSE),
                ('scan.pdf', 'region', '', FALSE),
                ('scan.pdf', 'revenue', '', FALSE),
                ('talk.ppt', 'costs', '', FALSE),
                ('talk.ppt', 'name', '', FALSE),
                ('talk.ppt', 'region', '', FALSE),
                ('talk.ppt', 'revenue', '', FALSE)
            ) AS t(doc_id, field, value, found)
        """,
        # pixel_layout_extract: hand-verified GOLDEN span table for the
        # deterministic page-image fixtures — geometry pages emit
        # placeholder lines (with the reference-faithful lossy OCR
        # rewrite 1->l), glyph pages at scales 1/2/3 read their REAL
        # text back from pixels (multi-scale matcher), ruled-table
        # pages recognize grid structure + per-cell OCR. Each row
        # derived from the fixture parameters + the documented layout
        # contracts and frozen, so a regression in the decoder,
        # segmenter, recognizer, or table detector shows driver-red.
        "pixel_layout_extract": """
            SELECT * FROM (VALUES
                ('page0.png', 0, 'heading', '## Page 1', ''),
                ('page0.png', 1, 'text', '[text line l: 7px]', ''),
                ('page0.png', 2, 'text', '[text line 2: 7px]', ''),
                ('page1.png', 0, 'heading', '## Page 1', ''),
                ('page1.png', 1, 'text', '[text line l: 8px]', ''),
                ('page1.png', 2, 'text', '[text line 2: 8px]', ''),
                ('page1.png', 3, 'text', '[text line 3: 8px]', ''),
                ('page2.png', 0, 'heading', '## Page 1', ''),
                ('page2.png', 1, 'text', '[text line l: 7px]', ''),
                ('page2.png', 2, 'text', '[text line 2: 7px]', ''),
                ('page2.png', 3, 'text', '[text line 3: 7px]', ''),
                ('page2.png', 4, 'text', '[text line 4: 2px]', ''),
                ('page3.png', 0, 'heading', '## Page 1', ''),
                ('page3.png', 1, 'text', '[text line l: 8px]', ''),
                ('page3.png', 2, 'text', '[text line 2: 8px]', ''),
                ('page4.png', 0, 'heading', '## Page 1', ''),
                ('page4.png', 1, 'text', '[text line l: 7px]', ''),
                ('page4.png', 2, 'text', '[text line 2: 7px]', ''),
                ('page4.png', 3, 'text', '[text line 3: 7px]', ''),
                ('page5.png', 0, 'heading', '## Page 1', ''),
                ('page5.png', 1, 'text', '[text line l: 8px]', ''),
                ('page5.png', 2, 'text', '[text line 2: 8px]', ''),
                ('page5.png', 3, 'text', '[text line 3: 8px]', ''),
                ('page5.png', 4, 'text', '[text line 4: 2px]', ''),
                ('page6.png', 0, 'heading', '## Page 1', ''),
                ('page6.png', 1, 'text', '[text line l: 7px]', ''),
                ('page6.png', 2, 'text', '[text line 2: 7px]', ''),
                ('page7.png', 0, 'heading', '## Page 1', ''),
                ('page7.png', 1, 'text', '[text line l: 8px]', ''),
                ('page7.png', 2, 'text', '[text line 2: 8px]', ''),
                ('page7.png', 3, 'text', '[text line 3: 8px]', ''),
                ('table0.png', 0, 'heading', '## Page 1', ''),
                ('table0.png', 1, 'table', '| ITEM | QTY | PRICE |' || chr(10) || '| --- | --- | --- |' || chr(10) || '| PART 2A | 7 | 3.25 |' || chr(10) || '| PART 2B | 12 | 4.50 |', ''),
                ('table1.png', 0, 'heading', '## Page 1', ''),
                ('table1.png', 1, 'table', '| ITEM | QTY | PRICE |' || chr(10) || '| --- | --- | --- |' || chr(10) || '| PART 3A | 8 | 4.25 |' || chr(10) || '| PART 3B | 13 | 5.50 |', ''),
                ('text0.png', 0, 'heading', '## Page 1', ''),
                ('text0.png', 1, 'heading', '## PAGE 2 OF 9', ''),
                ('text0.png', 2, 'heading', '# RAY DATA ENGINE', ''),
                ('text0.png', 3, 'heading', '# SECTION 2-A', ''),
                ('text1.png', 0, 'heading', '## Page 1', ''),
                ('text1.png', 1, 'heading', '## PAGE 3 OF 9', ''),
                ('text1.png', 2, 'heading', '# RAY DATA ENGINE', ''),
                ('text1.png', 3, 'heading', '# SECTION 3-A', ''),
                ('text2.png', 0, 'heading', '## Page 1', ''),
                ('text2.png', 1, 'heading', '## PAGE 4 OF 9', ''),
                ('text2.png', 2, 'heading', '# RAY DATA ENGINE', ''),
                ('text2.png', 3, 'heading', '# SECTION 4-A', ''),
                ('text3.png', 0, 'heading', '## Page 1', ''),
                ('text3.png', 1, 'heading', '## PAGE 5 OF 9', ''),
                ('text3.png', 2, 'heading', '# RAY DATA ENGINE', ''),
                ('text3.png', 3, 'heading', '# SECTION 5-A', '')
            ) AS t(doc_id, "offset", kind, text, media_ref)
        """,
        # real_format_extract: hand-verified GOLDEN span table for the
        # 14-file real-bytes fixture corpus — every row was derived from
        # the fixture CONTENT + the documented per-format contracts
        # (CSV heading rule, Excel sheet headings, DOCX style map, PPT
        # slide assembly, PDF direct-text threshold, OCR-path page
        # headings) and frozen as literals, so a regression in ANY
        # binary parser shows as a driver-red row.
        "real_format_extract": """
            SELECT * FROM (VALUES
                ('data.csv', 0, 'heading', '# CSV Data: data.csv.t1', ''),
                ('data.csv', 1, 'table', '| name | qty |' || chr(10) || '| --- | --- |' || chr(10) || '| widget | 3 |' || chr(10) || '| gadget | 5 |', ''),
                ('deck.pptx', 0, 'heading', '## Slide 1', ''),
                ('deck.pptx', 1, 'text', 'Quarterly Update', ''),
                ('deck.pptx', 2, 'text', 'Prepared by the team', ''),
                ('deck.pptx', 3, 'heading', '## Slide 2', ''),
                ('deck.pptx', 4, 'text', 'Thanks!' || chr(10) || 'Questions?', ''),
                ('ledger.xls', 0, 'heading', '# Excel Data: ledger.xls', ''),
                ('ledger.xls', 1, 'heading', '## Sheet: Accounts', ''),
                ('ledger.xls', 2, 'table', '| account | balance |' || chr(10) || '| --- | --- |' || chr(10) || '| ops | 250 |' || chr(10) || '| eng | 410 |', ''),
                ('legacy.doc', 0, 'text', 'Legacy memo.', ''),
                ('legacy.doc', 1, 'text', 'Written long ago in the binary format.', ''),
                ('notes.txt', 0, 'text', 'plain notes' || chr(10) || 'with two lines', ''),
                ('numbers.xlsx', 0, 'heading', '# Excel Data: numbers.xlsx', ''),
                ('numbers.xlsx', 1, 'heading', '## Sheet: Summary', ''),
                ('numbers.xlsx', 2, 'table', '| region | total |' || chr(10) || '| --- | --- |' || chr(10) || '| north | 10 |' || chr(10) || '| south | 7 |', ''),
                ('numbers.xlsx', 3, 'heading', '## Sheet: Detail', ''),
                ('numbers.xlsx', 4, 'table', '| day | count |' || chr(10) || '| --- | --- |' || chr(10) || '| mon | 3 |' || chr(10) || '| tue | 4 |', ''),
                ('page.html', 0, 'heading', '# A Page', ''),
                ('page.html', 1, 'heading', '# Hello', ''),
                ('page.html', 2, 'text', 'World body text.', ''),
                ('paper.pdf', 0, 'heading', '## Page 1', ''),
                ('paper.pdf', 1, 'text', 'Introduction' || chr(10) || 'This paper explains the approach in detail, covering background and methods over several sentences.', ''),
                ('paper.pdf', 2, 'heading', '## Page 2', ''),
                ('paper.pdf', 3, 'text', 'Results' || chr(10) || 'Everything improved across the board in every measured dimension of the study, as the tables show.', ''),
                ('photo.png', 0, 'heading', '## Page 1', ''),
                ('report.docx', 0, 'heading', '# Annual Report', ''),
                ('report.docx', 1, 'heading', '# Overview', ''),
                ('report.docx', 2, 'text', 'The year went well.', ''),
                ('report.docx', 3, 'heading', '## Details', ''),
                ('report.docx', 4, 'list_item', '- first item', ''),
                ('report.docx', 5, 'list_item', '- second item', ''),
                ('report.docx', 6, 'table', '| metric | value |' || chr(10) || '| --- | --- |' || chr(10) || '| revenue | 100 |' || chr(10) || '| costs | 40 |', ''),
                ('scan.jpg', 0, 'heading', '## Page 1', ''),
                ('scan.pdf', 0, 'heading', '## Page 1', ''),
                ('scan.pdf', 1, 'heading', '## Page 2', ''),
                ('talk.ppt', 0, 'heading', '## Slide 1', ''),
                ('talk.ppt', 1, 'text', 'Old Deck', ''),
                ('talk.ppt', 2, 'text', 'Legacy bullets', ''),
                ('talk.ppt', 3, 'heading', '## Slide 2', ''),
                ('talk.ppt', 4, 'text', 'The End', '')
            ) AS t(doc_id, "offset", kind, text, media_ref)
        """,
        # extract_flagship: the FULL-corpus flat span table (every
        # population, paged included) vs the spec-oracle fixture.
        "extract_flagship": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            )
            SELECT doc_id, "offset"::INTEGER AS "offset", kind, text,
                   media_ref
            FROM read_parquet('/tmp/dsray_expected_v2/spans_n*.parquet')
            WHERE n = (SELECT n FROM nn)
        """,
        # extract_html / extract_csv / doc_structure: doc-level expected
        # projections from the independent contract re-derivations
        # (synth_expected.exp_html / exp_csv / exp_structure).
        "extract_html": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            )
            SELECT doc_id, html
            FROM read_parquet('/tmp/dsray_expected_v2/docproj_n*.parquet')
            WHERE n = (SELECT n FROM nn)
        """,
        "extract_csv": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            )
            SELECT doc_id, csv
            FROM read_parquet('/tmp/dsray_expected_v2/docproj_n*.parquet')
            WHERE n = (SELECT n FROM nn)
        """,
        "doc_structure": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            )
            SELECT doc_id, n_sections, total_tokens, recommendation, structure
            FROM read_parquet('/tmp/dsray_expected_v2/docproj_n*.parquet')
            WHERE n = (SELECT n FROM nn)
        """,
        "doc_headers": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            )
            SELECT doc_id, level, title, start_line, token_count
            FROM read_parquet('/tmp/dsray_expected_v2/headers_n*.parquet')
            WHERE n = (SELECT n FROM nn)
        """,
        "doc_summaries": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            )
            SELECT doc_id, level, title, token_count, summary
            FROM read_parquet('/tmp/dsray_expected_v2/summaries_n*.parquet')
            WHERE n = (SELECT n FROM nn)
        """,
        "search_docs": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            )
            SELECT doc_id, line_no, snippet
            FROM read_parquet('/tmp/dsray_expected_v2/search_n*.parquet')
            WHERE n = (SELECT n FROM nn)
        """,
        "pagerank_purchases": _pagerank_oracle(),
        # bootstrap_price_means: the Poisson(1) inverse-CDF thresholds
        # are inlined from the SAME module constants the op uses
        "bootstrap_price_means": f"""
            WITH reps AS (
                SELECT UNNEST(range(16)) AS rep
            ), u AS (
                SELECT r.rep,
                       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS c,
                       ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)
                                           || ':' || CAST(r.rep AS VARCHAR)),
                                       1, 13))::BIGINT AS h
                FROM orders o, reps r
            ), w AS (
                SELECT rep, c, {poisson_sql_weight_expr('h')} AS w FROM u
            )
            SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
                   ROUND(CAST(SUM(w * c) AS DOUBLE) / CAST(SUM(w) AS BIGINT), 6)
                       AS mean_cents
            FROM w GROUP BY rep
        """,
        "copurchase_triangles": r"""
            WITH op AS (
                SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            ), s AS (
                SELECT ok, p,
                       ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
                FROM op
            ), e0 AS (
                SELECT s1.p AS x, s2.p AS y
                FROM s s1 JOIN s s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
            ), ue AS (
                SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
                FROM e0 WHERE x <> y
            ), deg AS (
                SELECT node, COUNT(*) AS deg
                FROM (SELECT a AS node FROM ue UNION ALL SELECT b FROM ue)
                GROUP BY node
            ), tr AS (
                -- each triangle {v1 < v2 < v3} enumerated exactly once
                SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
                FROM ue e1
                JOIN ue e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN ue e3 ON e3.a = e1.b AND e3.b = e2.b
            ), tcnt AS (
                SELECT node, COUNT(*) AS t
                FROM (
                    SELECT v1 AS node FROM tr
                    UNION ALL SELECT v2 FROM tr
                    UNION ALL SELECT v3 FROM tr
                )
                GROUP BY node
            )
            SELECT d.node, d.deg,
                   COALESCE(t.t, 0) AS triangles,
                   CASE WHEN d.deg >= 2 THEN ROUND(
                       2.0 * COALESCE(t.t, 0) / (d.deg * (d.deg - 1)), 6)
                   ELSE 0.0 END AS clustering
            FROM deg d LEFT JOIN tcnt t ON t.node = d.node
        """,
        "copurchase_reach": r"""
            WITH RECURSIVE op AS (
                SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            ), s AS (
                SELECT ok, p,
                       ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
                FROM op
            ), e0 AS (
                SELECT s1.p AS x, s2.p AS y
                FROM s s1 JOIN s s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
            ), e AS (
                SELECT x AS src, y AS dst FROM e0
                UNION
                SELECT y AS src, x AS dst FROM e0
            ), seeds AS (
                SELECT DISTINCT src AS node FROM e ORDER BY src LIMIT 3
            ), bfs AS (
                SELECT node, 0 AS lvl FROM seeds
                UNION
                SELECT e.dst AS node, b.lvl + 1 AS lvl
                FROM bfs b JOIN e ON e.src = b.node
                WHERE b.lvl < 3
            )
            SELECT node, MIN(lvl) AS level FROM bfs GROUP BY node
        """,
        "copurchase_pagerank_weighted": _copurchase_weighted_pagerank_oracle(),
        "copurchase_core": _kcore_oracle(),
        "purchase_hits": _hits_oracle(iters=3),
        "copurchase_ppr": (
            """
        WITH op AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        ), sq AS (
            SELECT ok, p,
                   ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
            FROM op
        ), e AS MATERIALIZED (
            SELECT DISTINCT s1.p AS src, s2.p AS dst
            FROM sq s1 JOIN sq s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
        )"""
            + _pagerank_core(
                5,
                tele_sql="SELECT node FROM nodes ORDER BY node LIMIT 3",
            )
            + '\n        SELECT node, CAST(r AS BIGINT) AS "rank" FROM r5'
        ),
        "copurchase_communities": _communities_oracle(rounds=4),
        "copurchase_communities_weighted": _communities_weighted_oracle(
            rounds=4
        ),
        "copurchase_modularity_weighted": _modularity_weighted_oracle(
            rounds=4
        ),
        "copurchase_modularity": _modularity_oracle(rounds=4),
        "copurchase_walks": _walks_oracle(steps=4),
        "copurchase_walk_pairs": _walk_pairs_oracle(steps=4, window=2),
        "copurchase_walk_negatives": _walk_negatives_oracle(
            steps=4, window=2, k_neg=2
        ),
        "copurchase_biased_walks": _biased_walks_oracle(steps=4),
        "copurchase_edge_sim": _CP_SYM_HEAD + """
            , cm AS MATERIALIZED (
                SELECT u.a, u.b, COUNT(*) AS c
                FROM ue u
                JOIN e na ON na.src = u.a
                JOIN e nb ON nb.src = u.b AND nb.dst = na.dst
                GROUP BY 1, 2
            ), dg AS MATERIALIZED (
                SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1
            )
            SELECT u.a, u.b,
                   CAST(COALESCE(cm.c, 0) AS BIGINT) AS common,
                   CAST(da.d + db.d - 2 - COALESCE(cm.c, 0) AS BIGINT)
                       AS union_size,
                   CASE WHEN da.d + db.d - 2 - COALESCE(cm.c, 0) = 0
                        THEN NULL
                        ELSE ROUND(CAST(COALESCE(cm.c, 0) AS DOUBLE)
                                   / (da.d + db.d - 2 - COALESCE(cm.c, 0)),
                                   6) END AS sim
            FROM ue u
            JOIN dg da ON da.node = u.a
            JOIN dg db ON db.node = u.b
            LEFT JOIN cm ON cm.a = u.a AND cm.b = u.b
        """,
        # GraphSAGE neighborhood sums: deg, 1-hop and 2-hop
        # path-counted degree aggregates over the symmetric co-purchase
        # graph — exact integers, two chained join-aggregates
        "copurchase_neighbor_feats": _CP_SYM_HEAD + """
            , deg AS MATERIALIZED (
                SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1
            ), s1 AS MATERIALIZED (
                SELECT e.src AS node, SUM(d.d) AS s
                FROM e JOIN deg d ON d.node = e.dst GROUP BY 1
            ), s2 AS MATERIALIZED (
                SELECT e.src AS node, SUM(s1.s) AS s
                FROM e JOIN s1 ON s1.node = e.dst GROUP BY 1
            )
            SELECT d.node, d.d AS deg,
                   s1.s AS sum_nbr_deg, s2.s AS sum_2hop_deg
            FROM deg d
            JOIN s1 ON s1.node = d.node
            JOIN s2 ON s2.node = d.node
        """,
        "copurchase_centrality": _harmonic_oracle(k_seeds=4, max_hops=3),
        "copurchase_cheapest": r"""
            WITH RECURSIVE op AS (
                SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            ), s AS (
                SELECT ok, p,
                       ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
                FROM op
            ), e0 AS (
                SELECT s1.p AS x, s2.p AS y
                FROM s s1 JOIN s s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
            ), e AS (
                SELECT x AS src, y AS dst,
                       GREATEST(1, 1000 // COUNT(*)) AS w
                FROM e0 GROUP BY x, y
            ), seeds AS (
                SELECT DISTINCT src AS node FROM e ORDER BY src LIMIT 3
            ), walk AS (
                SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM seeds
                UNION ALL
                SELECT e.dst, walk.dist + e.w, walk.hops + 1
                FROM walk JOIN e ON e.src = walk.node
                WHERE walk.hops < 4
            )
            SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
            FROM walk GROUP BY node
        """,
        "copurchase_assortativity": r"""
            WITH op AS (
                SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            ), s AS (
                SELECT ok, p,
                       ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
                FROM op
            ), e0 AS (
                SELECT s1.p AS x, s2.p AS y
                FROM s s1 JOIN s s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
            ), ue AS MATERIALIZED (
                SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b
                FROM e0 WHERE x <> y GROUP BY 1, 2
            ), deg AS MATERIALIZED (
                SELECT node, COUNT(*) AS d
                FROM (SELECT a AS node FROM ue UNION ALL SELECT b FROM ue)
                GROUP BY 1
            ), j AS (
                SELECT da.d AS ja, db.d AS jb
                FROM ue JOIN deg da ON da.node = ue.a
                        JOIN deg db ON db.node = ue.b
            ), st AS (
                SELECT COUNT(*) AS m, SUM(ja * jb) AS p,
                       SUM(ja + jb) AS s1, SUM(ja * ja + jb * jb) AS s2
                FROM j
            )
            SELECT CAST(m AS BIGINT) AS m_edges,
                   CAST(p AS BIGINT) AS sum_jk,
                   CAST(s1 AS BIGINT) AS sum_j_plus_k,
                   CAST(s2 AS BIGINT) AS sum_j2_k2,
                   ROUND((4.0 * m * p - CAST(s1 AS DOUBLE) * s1)
                         / NULLIF(2.0 * m * s2 - CAST(s1 AS DOUBLE) * s1, 0),
                         6) AS assortativity
            FROM st
        """,
        "copurchase_components": r"""
            WITH RECURSIVE op AS (
                SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            ), s AS (
                SELECT ok, p,
                       ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
                FROM op
            ), e0 AS (
                SELECT s1.p AS x, s2.p AS y
                FROM s s1 JOIN s s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
            ), e AS (
                SELECT x AS src, y AS dst FROM e0 WHERE x <> y
                UNION
                SELECT y AS src, x AS dst FROM e0 WHERE x <> y
            ), reach AS (
                SELECT src AS node, src AS lab FROM e
                UNION
                SELECT e.src AS node, r.lab
                FROM reach r JOIN e ON e.dst = r.node
            )
            SELECT node, MIN(lab) AS component FROM reach GROUP BY node
        """,
        "part_link_predictions": r"""
            WITH op AS (
                SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            ), s AS (
                SELECT ok, p,
                       ROW_NUMBER() OVER (PARTITION BY ok ORDER BY p) AS rn
                FROM op
            ), e0 AS (
                SELECT s1.p AS x, s2.p AS y
                FROM s s1 JOIN s s2 ON s1.ok = s2.ok AND s2.rn = s1.rn + 1
                WHERE s1.p <> s2.p
            ), e AS (
                SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM e0
                GROUP BY 1, 2
            ), adj AS (
                SELECT a AS ctr, b AS nbr FROM e
                UNION ALL
                SELECT b AS ctr, a AS nbr FROM e
            ), deg AS (
                SELECT ctr, COUNT(*) AS d FROM adj GROUP BY ctr
            ), wedge AS (
                SELECT a1.nbr AS a, a2.nbr AS b,
                       CAST(FLOOR(1000000.0 / LN(CAST(deg.d AS DOUBLE)) + 0.5)
                            AS BIGINT) AS w
                FROM adj a1
                JOIN adj a2 ON a1.ctr = a2.ctr AND a1.nbr < a2.nbr
                JOIN deg ON deg.ctr = a1.ctr
                WHERE deg.d >= 2
            )
            SELECT a, b, COUNT(*) AS cn, SUM(w) AS aa_micro
            FROM wedge
            WHERE NOT EXISTS (
                SELECT 1 FROM e WHERE e.a = wedge.a AND e.b = wedge.b
            )
            GROUP BY a, b
            HAVING COUNT(*) >= 2
        """,
        "token_count": r"""
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
                       AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                       AS n_bpe_tokens
            FROM documents
        """,
        # ensemble_rank: three exact window ranks fused by RRF with
        # left-associated adds — 1/(60+r) is one IEEE division on both
        # engines, so the doubles hash-match bit for bit
        "ensemble_rank": r"""
            WITH r0 AS (
                SELECT doc_id, ROW_NUMBER() OVER (
                    ORDER BY n_chars DESC, doc_id) AS r
                FROM documents
            ), r1 AS (
                SELECT doc_id, ROW_NUMBER() OVER (ORDER BY
                    CASE WHEN trim(text) = '' THEN 0
                         ELSE len(regexp_split_to_array(trim(text), '\s+'))
                    END DESC, doc_id) AS r
                FROM documents
            ), r2 AS (
                SELECT doc_id, ROW_NUMBER() OVER (ORDER BY
                    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT,
                    doc_id) AS r
                FROM documents
            )
            SELECT doc_id,
                   1.0 / (60 + r0.r) + 1.0 / (60 + r1.r) + 1.0 / (60 + r2.r)
                       AS rrf
            FROM r0 JOIN r1 USING (doc_id) JOIN r2 USING (doc_id)
        """,
        # zorder_layout_keys: Morton interleave rebuilt as a SUM over
        # bit positions — dim j's bit i lands at position i*2 + j
        "zorder_layout_keys": r"""
            WITH t AS (
                SELECT doc_id,
                       LEAST(GREATEST(n_chars, 0), (1::BIGINT << 21) - 1) AS a,
                       LEAST(GREATEST(
                           CASE WHEN trim(text) = '' THEN 0
                                ELSE len(regexp_split_to_array(trim(text), '\s+'))
                           END, 0), (1::BIGINT << 21) - 1) AS b
                FROM documents
            )
            SELECT doc_id,
                   CAST(SUM((((a >> i) & 1) << (i * 2))
                          + (((b >> i) & 1) << (i * 2 + 1))) AS BIGINT) AS zkey
            FROM t, UNNEST(range(21)) AS u(i)
            GROUP BY doc_id
        """,
        # orders_profile: strings by length(), timestamps by epoch_us
        "orders_profile": """
            SELECT 'o_custkey' AS column, COUNT(*) AS n,
                   COUNT(*) - COUNT(o_custkey) AS n_null,
                   CAST(MIN(o_custkey) AS DOUBLE) AS vmin,
                   CAST(MAX(o_custkey) AS DOUBLE) AS vmax FROM orders
            UNION ALL
            SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
                   CAST(MIN(epoch_us(o_orderdate)) AS DOUBLE),
                   CAST(MAX(epoch_us(o_orderdate)) AS DOUBLE) FROM orders
            UNION ALL
            SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey),
                   CAST(MIN(o_orderkey) AS DOUBLE),
                   CAST(MAX(o_orderkey) AS DOUBLE) FROM orders
            UNION ALL
            SELECT 'o_orderpriority', COUNT(*),
                   COUNT(*) - COUNT(o_orderpriority),
                   CAST(MIN(length(o_orderpriority)) AS DOUBLE),
                   CAST(MAX(length(o_orderpriority)) AS DOUBLE) FROM orders
            UNION ALL
            SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
                   CAST(MIN(length(o_orderstatus)) AS DOUBLE),
                   CAST(MAX(length(o_orderstatus)) AS DOUBLE) FROM orders
            UNION ALL
            SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
                   MIN(o_totalprice), MAX(o_totalprice) FROM orders
        """,
        "frequent_part_triples": """
            WITH b AS (
                SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            )
            SELECT b1.p AS p1, b2.p AS p2, b3.p AS p3,
                   COUNT(*) AS support
            FROM b b1
            JOIN b b2 ON b1.ok = b2.ok AND b2.p > b1.p
            JOIN b b3 ON b1.ok = b3.ok AND b3.p > b2.p
            GROUP BY b1.p, b2.p, b3.p
            HAVING COUNT(*) >= 2
        """,
        # association rules: brute pair self-join + the same two exact-
        # int double divisions the engine emits (n_ab*N and n_a*n_b are
        # exact BIGINTs < 2^53, so the divisions are bit-identical)
        "part_rules": """
            WITH b AS (
                SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            ), nb AS (
                SELECT COUNT(DISTINCT ok) AS n FROM b
            ), ic AS (
                SELECT p, COUNT(*) AS c FROM b GROUP BY 1
            ), pc AS (
                SELECT b1.p AS p1, b2.p AS p2, COUNT(*) AS c
                FROM b b1 JOIN b b2 ON b1.ok = b2.ok AND b2.p > b1.p
                GROUP BY 1, 2
                HAVING COUNT(*) >= 2
            ), r AS (
                SELECT p1 AS ante, p2 AS cons, c FROM pc
                UNION ALL
                SELECT p2, p1, c FROM pc
            )
            SELECT r.ante, r.cons, CAST(r.c AS BIGINT) AS n_ab,
                   CAST(ia.c AS BIGINT) AS n_a, CAST(ib.c AS BIGINT) AS n_b,
                   ROUND(CAST(r.c AS DOUBLE) / ia.c, 6) AS confidence,
                   ROUND(CAST(r.c * (SELECT n FROM nb) AS DOUBLE)
                         / (ia.c * ib.c), 6) AS lift
            FROM r JOIN ic ia ON ia.p = r.ante
                   JOIN ic ib ON ib.p = r.cons
        """,
        "price_winsorized": """
            SELECT o_orderkey, o_totalprice,
                   LEAST(GREATEST(o_totalprice,
                       (SELECT quantile_disc(o_totalprice, 0.01) FROM orders)),
                       (SELECT quantile_disc(o_totalprice, 0.99) FROM orders))
                       AS o_totalprice_w
            FROM orders
        """,
        "cooccurrence_pairs": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), pos AS (
                SELECT doc_id, unnest(ws) AS w,
                       generate_subscripts(ws, 1) AS i
                FROM docs
            )
            SELECT LEAST(p1.w, p2.w) AS w1, GREATEST(p1.w, p2.w) AS w2,
                   COUNT(*)::BIGINT AS n
            FROM pos p1 JOIN pos p2
              ON p1.doc_id = p2.doc_id AND p2.i > p1.i AND p2.i <= p1.i + 5
            GROUP BY 1, 2
            ORDER BY n DESC, w1, w2
            LIMIT 200
        """,
        # label_centroid_sims: quantize -> integer sums (HUGEINT dots:
        # a label's sum vector grows with rows; int64 products overflow)
        # -> the same float conversion chain as the op
        "label_centroid_sims": """
            WITH e AS (
                SELECT label,
                       generate_subscripts(embedding, 1) AS dim,
                       CAST(ROUND(unnest(embedding::DOUBLE[]) * 1048576)
                            AS BIGINT) AS q
                FROM embeddings
            ), s AS (
                SELECT label, dim, CAST(SUM(q) AS HUGEINT) AS s
                FROM e GROUP BY 1, 2
            ), d AS (
                SELECT a.label AS la, b.label AS lb,
                       SUM(a.s * b.s) AS dot
                FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
                GROUP BY 1, 2
            ), nn AS (
                SELECT label, SUM(s * s) AS n2 FROM s GROUP BY label
            )
            SELECT CAST(d.la AS BIGINT) AS label_a,
                   CAST(d.lb AS BIGINT) AS label_b,
                   ROUND(CAST(d.dot AS DOUBLE) /
                         (sqrt(CAST(na.n2 AS DOUBLE))
                          * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos
            FROM d JOIN nn na ON na.label = d.la
                   JOIN nn nb ON nb.label = d.lb
        """,
        "quality_stats": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_m,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
                       AS n_words,
                   CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
                       AS sum_word_len,
                   CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT)
                       AS n_punct,
                   CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                            x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT)
                       AS n_stopwords
            FROM documents
        """,
        "quality_filter": r"""
            SELECT doc_id, quality FROM (
                SELECT doc_id,
                       ROUND(0.4 * LEAST(n_words / 100.0, 1.0)
                           + 0.3 * EXP(-0.5 * POW((CAST(sum_wlen AS DOUBLE) / GREATEST(n_words, 1) - 5.0) / 3.0, 2))
                           + 0.3 * LEAST(CAST(n_stop AS DOUBLE) / GREATEST(n_words, 1) * 5.0, 1.0), 6)
                           AS quality
                FROM (
                    SELECT doc_id,
                           CASE WHEN trim(text) = '' THEN 0
                                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
                           length(regexp_replace(text, '\s', '', 'g')) AS sum_wlen,
                           len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                               x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop
                    FROM documents))
            WHERE quality >= 0.5
        """,
        "weighted_sample": r"""
            SELECT doc_id, n_chars,
                   ROUND(POW(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                             / 18446744073709551616.0, 1.0 / n_chars), 6) AS priority
            FROM documents
            WHERE n_chars > 0
            ORDER BY POW(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                         / 18446744073709551616.0, 1.0 / n_chars) DESC, doc_id
            LIMIT 50
        """,
        "hash_sample_10": """
            SELECT doc_id FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
        """,
        "stratified_sample": """
            SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank FROM (
                SELECT source, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rn
                FROM documents)
            WHERE rn <= 10
        """,
        "source_topk": """
            SELECT source, doc_id, n_chars, CAST(rn AS BIGINT) AS rank FROM (
                SELECT source, doc_id, n_chars,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id
                       ) AS rn
                FROM documents)
            WHERE rn <= 3
        """,
        "length_outliers": """
            WITH med AS (
                SELECT source, quantile_disc(n_chars, 0.5) AS med
                FROM documents GROUP BY source
            ), mad AS (
                SELECT d.source, quantile_disc(ABS(d.n_chars - m.med), 0.5) AS mad
                FROM documents d JOIN med m USING (source) GROUP BY d.source
            )
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN med USING (source) JOIN mad USING (source)
            WHERE ABS(d.n_chars - med.med) > 2.0 * mad.mad
        """,
        "length_quantiles": """
            SELECT source,
                   COUNT(*) AS n,
                   quantile_disc(n_chars, 0.50) AS p50,
                   quantile_disc(n_chars, 0.90) AS p90,
                   quantile_disc(n_chars, 0.99) AS p99
            FROM documents
            GROUP BY source
        """,
        "price_quantile_select": """
            SELECT lab AS label, (SELECT COUNT(*) FROM orders) AS n, v AS value
            FROM (VALUES
                ('p25', (SELECT quantile_disc(o_totalprice, 0.25) FROM orders)),
                ('p50', (SELECT quantile_disc(o_totalprice, 0.50) FROM orders)),
                ('p90', (SELECT quantile_disc(o_totalprice, 0.90) FROM orders)),
                ('p99', (SELECT quantile_disc(o_totalprice, 0.99) FROM orders))
            ) AS t(lab, v)
        """,
        "returnflag_price_quantiles": """
            SELECT l_returnflag, lab AS label, n, v AS value
            FROM (
                SELECT l_returnflag, COUNT(*) AS n,
                       quantile_disc(l_extendedprice, 0.25) AS p25,
                       quantile_disc(l_extendedprice, 0.50) AS p50,
                       quantile_disc(l_extendedprice, 0.90) AS p90,
                       quantile_disc(l_extendedprice, 0.99) AS p99
                FROM lineitem GROUP BY l_returnflag
            ) q, LATERAL (VALUES
                ('p25', q.p25), ('p50', q.p50),
                ('p90', q.p90), ('p99', q.p99)
            ) AS t(lab, v)
        """,
        "returnflag_price_corr": """
            WITH s AS (
                SELECT l_returnflag, COUNT(*) AS n,
                       SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS sx,
                       SUM(CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS sy,
                       SUM(CAST(ROUND(l_quantity) AS HUGEINT)
                           * CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS sxy,
                       SUM(CAST(ROUND(l_quantity) AS HUGEINT)
                           * CAST(ROUND(l_quantity) AS HUGEINT)) AS sxx,
                       SUM(CAST(ROUND(l_extendedprice*100) AS HUGEINT)
                           * CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS syy
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag, n,
                   ROUND(CAST(n*sxy - sx*sy AS DOUBLE) /
                         (SQRT(CAST(n*sxx - sx*sx AS DOUBLE)) *
                          SQRT(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS corr
            FROM s
            WHERE n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        """,
        "customer_k_anonymity": """
            WITH c AS (
                SELECT c_nationkey, c_mktsegment,
                       CAST(ROUND(c_acctbal) AS BIGINT) AS bal
                FROM customer
            ), g AS (
                SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
                       COUNT(DISTINCT bal) AS n_sensitive
                FROM c GROUP BY 1, 2
            )
            SELECT c_nationkey, c_mktsegment, CAST(n AS BIGINT) AS n,
                   CAST(n_sensitive AS BIGINT) AS n_sensitive,
                   CAST(n < 5 AS BIGINT) AS at_risk_k,
                   CAST(n_sensitive < 2 AS BIGINT) AS at_risk_l
            FROM g WHERE n < 5 OR n_sensitive < 2
        """,
        "golden_customers": """
            WITH RECURSIVE cust AS (
                SELECT c_custkey AS k, c_name, c_nationkey,
                       CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal,
                       '(' || CAST(10 + c_custkey % 90 AS VARCHAR) || ')'
                           || lpad(CAST((c_custkey*7) % 10000000 AS VARCHAR),
                                   7, '0') AS phone
                FROM customer
            ), recs AS MATERIALIZED (
                SELECT k*2 AS rec_id, c_name AS name, phone,
                       c_nationkey AS nation, bal
                FROM cust
                UNION ALL
                SELECT k*2+1,
                       substr(c_name, 1, 9 + (k % 9))
                           || substr(c_name, 11 + (k % 9)),
                       CASE WHEN k % 6 = 0 THEN
                           substr(phone, 1, length(phone)-1) ||
                           CAST((CAST(substr(phone, length(phone), 1) AS INT)
                                 + 1) % 10 AS VARCHAR)
                       ELSE phone END,
                       c_nationkey, bal
                FROM cust WHERE k % 3 = 0
            ), blocks AS (
                SELECT a.rec_id AS ia, b.rec_id AS ib
                FROM recs a JOIN recs b
                  ON a.rec_id < b.rec_id AND a.phone = b.phone
                UNION
                SELECT a.rec_id, b.rec_id
                FROM recs a JOIN recs b
                  ON a.rec_id < b.rec_id
                 AND a.nation = b.nation AND a.bal = b.bal
            ), matches AS MATERIALIZED (
                SELECT ia AS a, ib AS b FROM blocks
                JOIN recs ra ON ra.rec_id = ia
                JOIN recs rb ON rb.rec_id = ib
                WHERE (CASE WHEN ra.phone = rb.phone THEN 25 ELSE 0 END)
                    + (CASE WHEN levenshtein(ra.name, rb.name) <= 1
                            THEN 30 ELSE 0 END)
                    + (CASE WHEN ra.nation = rb.nation THEN 10 ELSE 0 END)
                    + (CASE WHEN ra.bal = rb.bal THEN 15 ELSE 0 END) >= 55
            ), e AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM matches
                UNION
                SELECT b, a FROM matches
            ), reach AS (
                SELECT rec_id AS node, rec_id AS lab FROM recs
                UNION
                SELECT e.src AS node, r.lab
                FROM reach r JOIN e ON e.dst = r.node
            ), compo AS MATERIALIZED (
                SELECT node, MIN(lab) AS component FROM reach GROUP BY node
            ), lab AS MATERIALIZED (
                SELECT r.*, c.component
                FROM recs r JOIN compo c ON c.node = r.rec_id
            ), best_name AS (
                SELECT component, name FROM (
                    SELECT component, name,
                           ROW_NUMBER() OVER (
                               PARTITION BY component
                               ORDER BY length(name) DESC, name) AS rn
                    FROM lab
                ) WHERE rn = 1
            ), agg AS (
                SELECT component, COUNT(*) AS n_records,
                       MIN(phone) AS phone_g, MIN(nation) AS nation_g,
                       MAX(bal) AS bal_g
                FROM lab GROUP BY 1
            )
            SELECT a.component AS cluster_id,
                   CAST(a.n_records AS BIGINT) AS n_records,
                   b.name AS name_g, a.phone_g,
                   CAST(a.nation_g AS INT) AS nation_g,
                   CAST(a.bal_g AS BIGINT) AS bal_g
            FROM agg a JOIN best_name b ON b.component = a.component
        """,
        "entity_matches": """
            WITH cust AS (
                SELECT c_custkey AS k, c_name, c_nationkey,
                       CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal,
                       '(' || CAST(10 + c_custkey % 90 AS VARCHAR) || ')'
                           || lpad(CAST((c_custkey*7) % 10000000 AS VARCHAR),
                                   7, '0') AS phone
                FROM customer
            ), recs AS (
                SELECT k*2 AS rec_id, c_name AS name, phone,
                       c_nationkey AS nation, bal
                FROM cust
                UNION ALL
                SELECT k*2+1,
                       substr(c_name, 1, 9 + (k % 9))
                           || substr(c_name, 11 + (k % 9)),
                       CASE WHEN k % 6 = 0 THEN
                           substr(phone, 1, length(phone)-1) ||
                           CAST((CAST(substr(phone, length(phone), 1) AS INT)
                                 + 1) % 10 AS VARCHAR)
                       ELSE phone END,
                       c_nationkey, bal
                FROM cust WHERE k % 3 = 0
            ), blocks AS (
                SELECT a.rec_id AS ia, b.rec_id AS ib
                FROM recs a JOIN recs b
                  ON a.rec_id < b.rec_id AND a.phone = b.phone
                UNION
                SELECT a.rec_id, b.rec_id
                FROM recs a JOIN recs b
                  ON a.rec_id < b.rec_id
                 AND a.nation = b.nation AND a.bal = b.bal
            ), scored AS (
                SELECT ia AS rec_id_a, ib AS rec_id_b,
                       (CASE WHEN a.phone = b.phone THEN 25 ELSE 0 END)
                     + (CASE WHEN levenshtein(a.name, b.name) <= 1
                             THEN 30 ELSE 0 END)
                     + (CASE WHEN a.nation = b.nation THEN 10 ELSE 0 END)
                     + (CASE WHEN a.bal = b.bal THEN 15 ELSE 0 END) AS score
                FROM blocks
                JOIN recs a ON a.rec_id = ia
                JOIN recs b ON b.rec_id = ib
            )
            SELECT rec_id_a, rec_id_b, CAST(score AS BIGINT) AS score
            FROM scored WHERE score >= 55
        """,
        "returnflag_price_regression": """
            WITH s AS (
                SELECT l_returnflag, COUNT(*) AS n,
                       SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS sx,
                       SUM(CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS sy,
                       SUM(CAST(ROUND(l_quantity) AS HUGEINT)
                           * CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS sxy,
                       SUM(CAST(ROUND(l_quantity) AS HUGEINT)
                           * CAST(ROUND(l_quantity) AS HUGEINT)) AS sxx
                FROM lineitem GROUP BY l_returnflag
            ), sl AS (
                SELECT l_returnflag, n,
                       CAST(n*sxy - sx*sy AS DOUBLE)
                           / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
                       sx, sy
                FROM s WHERE n >= 2 AND n*sxx - sx*sx > 0
            )
            SELECT l_returnflag, n, ROUND(slope, 6) AS slope,
                   ROUND((CAST(sy AS DOUBLE) - slope*CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE), 6) AS intercept
            FROM sl
        """,
        "source_mode_length": """
            WITH c AS (
                SELECT source, n_chars, COUNT(*) AS cnt
                FROM documents GROUP BY source, n_chars
            ), r AS (
                SELECT source, n_chars, cnt,
                       SUM(cnt) OVER (PARTITION BY source) AS n,
                       ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY cnt DESC, n_chars) AS rn
                FROM c
            )
            SELECT source, n_chars AS mode, CAST(cnt AS BIGINT) AS mode_cnt,
                   CAST(n AS BIGINT) AS n
            FROM r WHERE rn = 1
        """,
        "source_lang_entropy": """
            WITH c AS (
                SELECT source, lang, COUNT(*) AS cnt
                FROM documents GROUP BY source, lang
            ), n AS (SELECT source, SUM(cnt) AS n FROM c GROUP BY source)
            SELECT c.source, CAST(MAX(n.n) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_values,
                   CAST(SUM(FLOOR(1000000.0
                        * (CAST(c.cnt AS DOUBLE) / n.n)
                        * LN(CAST(n.n AS DOUBLE) / c.cnt) + 0.5))
                        AS BIGINT) AS entropy_micro
            FROM c JOIN n ON n.source = c.source
            GROUP BY c.source
        """,
        "price_qty_frontier": """
            WITH pts AS (
                SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           AS price_cents,
                       CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                       COUNT(*) AS cnt
                FROM lineitem GROUP BY 1, 2
            )
            SELECT p.price_cents, p.qty, CAST(p.cnt AS BIGINT) AS cnt
            FROM pts p
            WHERE NOT EXISTS (
                SELECT 1 FROM pts q
                WHERE q.price_cents <= p.price_cents AND q.qty >= p.qty
                  AND (q.price_cents < p.price_cents OR q.qty > p.qty)
            )
        """,
        # rake_keywords: the full RAKE contract rebuilt in SQL — frag
        # split, stopword grouping (cumulative-anchor idiom), word
        # freq/deg from occurrence-weighted distinct phrases, integer
        # floor-division word scores summed per phrase token
        "textrank_keywords": _textrank_oracle(_rake_stop_vals),
        "kmeans_exact_assignments": _kmeans_oracle(),
        "weighted_price_quantiles": r"""
            WITH t AS (
                SELECT l_extendedprice AS v,
                       CAST(l_quantity AS BIGINT) AS w
                FROM lineitem
                WHERE l_quantity IS NOT NULL AND l_quantity > 0
                  AND l_extendedprice IS NOT NULL
            ), tot AS (SELECT SUM(w) AS wt FROM t),
            cum AS (
                SELECT v, SUM(w) OVER (
                    ORDER BY v
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS cw
                FROM t
            ), q(label, qn, qd) AS (
                VALUES ('p25', 25, 100), ('p50', 50, 100),
                       ('p75', 75, 100), ('p90', 90, 100)
            )
            SELECT q.label,
                   CAST(tot.wt AS BIGINT) AS w_total,
                   MIN(c.v) AS value
            FROM q CROSS JOIN tot JOIN cum c
              ON q.qd * c.cw >= q.qn * tot.wt
            GROUP BY q.label, tot.wt
        """,
        "kcenter_coreset_exact": _kcenter_oracle(),
        "cosine_pairs_exact": r"""
            WITH pts AS MATERIALIZED (
                SELECT vec_id, i,
                       CAST(CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0
                            THEN FLOOR(CAST(embedding[i] AS DOUBLE)
                                       * 1000000.0 + 0.5)
                            ELSE -FLOOR(-CAST(embedding[i] AS DOUBLE)
                                        * 1000000.0 + 0.5) END AS BIGINT) AS x
                FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
            ), nrm AS MATERIALIZED (
                SELECT vec_id, SUM(x * x) AS n2 FROM pts GROUP BY 1
            ), dots AS MATERIALIZED (
                SELECT a.vec_id AS a, b.vec_id AS b, SUM(a.x * b.x) AS dot
                FROM pts a JOIN pts b ON a.i = b.i AND a.vec_id < b.vec_id
                GROUP BY 1, 2
            )
            SELECT d.a, d.b, CAST(d.dot AS BIGINT) AS dot_q,
                   ROUND(CAST(d.dot AS DOUBLE)
                         / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)),
                         6) AS cos6
            FROM dots d JOIN nrm na ON na.vec_id = d.a
                        JOIN nrm nb ON nb.vec_id = d.b
            WHERE d.dot >= 0
              AND 100 * 100 * d.dot * d.dot >= 30 * 30 * na.n2 * nb.n2
        """,
        "doc_title_links": r"""
            WITH t AS (
                SELECT doc_id, substr(lower(text), 1, 24) AS nm FROM documents
            )
            SELECT CAST(a.doc_id AS VARCHAR) AS a,
                   CAST(b.doc_id AS VARCHAR) AS b,
                   CAST(FLOOR(jaro_winkler_similarity(a.nm, b.nm) * 1000000
                              + 0.5) AS BIGINT) AS jw_micro
            FROM t a JOIN t b
              ON substr(a.nm, 1, 4) = substr(b.nm, 1, 4)
             AND a.doc_id < b.doc_id
            WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.90
        """,
        "rake_keywords": rf"""
            WITH stop(sw) AS (VALUES {_rake_stop_vals}),
            docs AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(text), '[^a-z0-9\s]+')
                           AS frags
                FROM documents
            ), fr AS (
                SELECT doc_id, f,
                       list_filter(regexp_split_to_array(frags[f], '\s+'),
                                   x -> x <> '') AS ws
                FROM docs, UNNEST(range(1, len(frags) + 1)) AS t(f)
            ), w AS (
                SELECT doc_id, f, i, ws[i] AS w,
                       CASE WHEN ws[i] IN (SELECT sw FROM stop)
                            THEN 1 ELSE 0 END AS is_stop
                FROM fr, UNNEST(range(1, len(ws) + 1)) AS t(i)
            ), g AS (
                SELECT doc_id, f, i, w, is_stop,
                       COALESCE(SUM(is_stop) OVER (
                           PARTITION BY doc_id, f ORDER BY i
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS grp
                FROM w
            ), occ_raw AS (
                SELECT doc_id, f, grp,
                       string_agg(w, ' ' ORDER BY i) AS phrase,
                       COUNT(*) AS nw
                FROM g WHERE is_stop = 0 GROUP BY doc_id, f, grp
            ), ptab AS (
                SELECT phrase, CAST(nw AS BIGINT) AS n_words,
                       CAST(COUNT(*) AS BIGINT) AS occ
                FROM occ_raw GROUP BY phrase, nw
            ), wstat AS (
                SELECT tok.w AS word, SUM(p.occ) AS freq,
                       SUM(p.occ * p.n_words) AS deg
                FROM ptab p,
                     UNNEST(regexp_split_to_array(p.phrase, ' ')) AS tok(w)
                GROUP BY tok.w
            ), wscore AS (
                SELECT word,
                       (1000000 * CAST(deg AS BIGINT)) // CAST(freq AS BIGINT)
                           AS ws
                FROM wstat
            ), psc AS (
                SELECT p.phrase, p.n_words, p.occ,
                       CAST(SUM(s.ws) AS BIGINT) AS score_micro
                FROM ptab p,
                     UNNEST(regexp_split_to_array(p.phrase, ' ')) AS tok(w)
                JOIN wscore s ON s.word = tok.w
                GROUP BY p.phrase, p.n_words, p.occ
            )
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY score_micro DESC, occ DESC, phrase
                   ) AS BIGINT) AS rank,
                   phrase, n_words, occ AS occurrences, score_micro
            FROM psc
            ORDER BY score_micro DESC, occ DESC, phrase
            LIMIT 50
        """,
        "lang_source_chi2": """
            WITH ct AS (
                SELECT lang AS a, source AS b, COUNT(*) AS cnt
                FROM documents GROUP BY 1, 2
            ), ra AS (SELECT a, SUM(cnt) AS rt FROM ct GROUP BY a),
            cb AS (SELECT b, SUM(cnt) AS ctot FROM ct GROUP BY b),
            tot AS (SELECT SUM(cnt) AS n FROM ct),
            cells AS (
                SELECT ra.rt, cb.ctot, COALESCE(ct.cnt, 0) AS o, tot.n
                FROM ra CROSS JOIN cb CROSS JOIN tot
                LEFT JOIN ct ON ct.a = ra.a AND ct.b = cb.b
            )
            SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
                   CAST((SELECT COUNT(*) FROM ra) AS BIGINT) AS "rows",
                   CAST((SELECT COUNT(*) FROM cb) AS BIGINT) AS cols,
                   CAST(((SELECT COUNT(*) FROM ra) - 1)
                        * ((SELECT COUNT(*) FROM cb) - 1) AS BIGINT) AS dof,
                   CAST(SUM(
                       (1000000 * CAST(o*n - rt*ctot AS HUGEINT)
                                * CAST(o*n - rt*ctot AS HUGEINT))
                       // (CAST(n AS HUGEINT) * rt * ctot)
                   ) AS BIGINT) AS chi2_micro
            FROM cells
        """,
        "plsa_init_counts": r"""
            WITH l AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), wc AS (
                SELECT doc_id, ws[i+1] AS w, COUNT(*) AS c
                FROM l, UNNEST(range(len(ws))) AS t(i)
                GROUP BY 1, 2
            ), z AS (
                SELECT w,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                           || ' ' || w), 1, 13))::BIGINT
                           % 6 AS z,
                       c
                FROM wc
            )
            SELECT w, CAST(z AS BIGINT) AS z, CAST(SUM(c) AS BIGINT) AS c
            FROM z GROUP BY 1, 2
        """,
        "customer_scd2": """
            WITH dim AS (
                SELECT c_custkey AS key, c_name AS address,
                       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acct_cents
                FROM customer
            ), snap AS (
                SELECT key,
                       CASE WHEN key % 17 = 3 THEN address || ' APT 7'
                            ELSE address END AS address,
                       acct_cents
                       + CASE WHEN key % 10 = 0 THEN 100 ELSE 0 END
                           AS acct_cents
                FROM dim WHERE key % 3 <> 2
                UNION ALL
                SELECT key + 1000000, 'NEW ' || address, acct_cents + 1
                FROM dim WHERE key % 100 = 4
            )
            SELECT d.key, d.address, d.acct_cents,
                   '2020-01-01' AS valid_from,
                   CASE WHEN s.key IS NULL
                             OR (s.address = d.address
                                 AND s.acct_cents = d.acct_cents)
                        THEN '9999-12-31' ELSE '2024-06-01'
                   END AS valid_to
            FROM dim d LEFT JOIN snap s ON s.key = d.key
            UNION ALL
            SELECT s.key, s.address, s.acct_cents,
                   '2024-06-01' AS valid_from,
                   '9999-12-31' AS valid_to
            FROM snap s LEFT JOIN dim d ON d.key = s.key
            WHERE d.key IS NULL
               OR s.address <> d.address
               OR s.acct_cents <> d.acct_cents
        """,
        "pair_bleu_overlap": r"""
            WITH l AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), p AS (
                SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
                FROM documents a
                JOIN documents b ON b.doc_id = a.doc_id + 1
                WHERE a.doc_id % 7 = 0
            ), g1 AS (
                SELECT doc_id, ws[i+1] AS gram, COUNT(*) AS c
                FROM l, UNNEST(range(len(ws))) AS t(i)
                GROUP BY 1, 2
            ), g2 AS (
                SELECT doc_id, ws[i+1] || ' ' || ws[i+2] AS gram,
                       COUNT(*) AS c
                FROM l, UNNEST(range(len(ws) - 1)) AS t(i)
                GROUP BY 1, 2
            ), t1 AS (
                SELECT doc_id, SUM(c) AS n FROM g1 GROUP BY doc_id
            ), t2 AS (
                SELECT doc_id, SUM(c) AS n FROM g2 GROUP BY doc_id
            ), m1 AS (
                SELECT p.doc_id_a, p.doc_id_b,
                       SUM(LEAST(ga.c, gb.c)) AS m
                FROM p
                JOIN g1 ga ON ga.doc_id = p.doc_id_a
                JOIN g1 gb ON gb.doc_id = p.doc_id_b
                          AND gb.gram = ga.gram
                GROUP BY 1, 2
            ), m2 AS (
                SELECT p.doc_id_a, p.doc_id_b,
                       SUM(LEAST(ga.c, gb.c)) AS m
                FROM p
                JOIN g2 ga ON ga.doc_id = p.doc_id_a
                JOIN g2 gb ON gb.doc_id = p.doc_id_b
                          AND gb.gram = ga.gram
                GROUP BY 1, 2
            )
            SELECT p.doc_id_a, p.doc_id_b,
                   CAST(COALESCE(m1.m, 0) AS BIGINT) AS m1,
                   CAST(COALESCE(t1a.n, 0) AS BIGINT) AS total1_a,
                   CAST(COALESCE(t1b.n, 0) AS BIGINT) AS total1_b,
                   CAST(COALESCE(m2.m, 0) AS BIGINT) AS m2,
                   CAST(COALESCE(t2a.n, 0) AS BIGINT) AS total2_a,
                   CAST(COALESCE(t2b.n, 0) AS BIGINT) AS total2_b
            FROM p
            LEFT JOIN m1 ON m1.doc_id_a = p.doc_id_a
                        AND m1.doc_id_b = p.doc_id_b
            LEFT JOIN m2 ON m2.doc_id_a = p.doc_id_a
                        AND m2.doc_id_b = p.doc_id_b
            LEFT JOIN t1 t1a ON t1a.doc_id = p.doc_id_a
            LEFT JOIN t1 t1b ON t1b.doc_id = p.doc_id_b
            LEFT JOIN t2 t2a ON t2a.doc_id = p.doc_id_a
            LEFT JOIN t2 t2b ON t2b.doc_id = p.doc_id_b
        """,
        "length_auc": """
            WITH d AS (
                SELECT n_chars AS v,
                       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                FROM documents
            ), h AS (
                SELECT v, SUM(y) AS ca, SUM(1 - y) AS cb
                FROM d GROUP BY v
            ), c AS (
                SELECT v, ca, cb,
                       SUM(cb) OVER (ORDER BY v) - cb AS below_b,
                       (SELECT SUM(ca) FROM h) AS na,
                       (SELECT SUM(cb) FROM h) AS nb
                FROM h
            )
            SELECT CAST(na AS BIGINT) AS n_pos,
                   CAST(nb AS BIGINT) AS n_neg,
                   CAST(SUM(ca * (2 * below_b + cb)) AS BIGINT)
                       AS auc2_num,
                   CAST((1000000
                         * CAST(SUM(ca * (2 * below_b + cb)) AS HUGEINT))
                        // (2 * CAST(na AS HUGEINT) * nb)
                        AS BIGINT) AS auc_micro,
                   CAST(SUM(ca * (2 * below_b + cb)) AS DOUBLE)
                       / CAST(2 * na * nb AS DOUBLE) AS auc
            FROM c GROUP BY na, nb
        """,
        "doc_quality_tree": """
            WITH base AS (
                SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                       n_chars // 128 AS f_len,
                       n_chars % 7 AS f_mod,
                       CAST(substr(source, 4) AS BIGINT) AS f_src
                FROM documents
            ), feats AS (
                SELECT 'f_len' AS feature, f_len AS bin, y FROM base
                UNION ALL SELECT 'f_mod', f_mod, y FROM base
                UNION ALL SELECT 'f_src', f_src, y FROM base
            ), tot AS (
                SELECT SUM(1 - y) AS n0, SUM(y) AS n1 FROM base
            ), h1 AS (
                SELECT feature, bin, SUM(1 - y) AS c0, SUM(y) AS c1
                FROM feats GROUP BY 1, 2
            ), c1 AS (
                SELECT feature, bin,
                       SUM(c0) OVER w AS l0, SUM(c1) OVER w AS l1,
                       MAX(bin) OVER (PARTITION BY feature) AS maxbin
                FROM h1
                WINDOW w AS (PARTITION BY feature ORDER BY bin)
            ), s1 AS (
                SELECT feature, bin, l0, l1,
                       (1000000 * (CAST(l0 AS HUGEINT) * l1
                                     * (tot.n0 - l0 + tot.n1 - l1)
                                 + CAST(tot.n0 - l0 AS HUGEINT)
                                     * (tot.n1 - l1) * (l0 + l1)))
                       // (CAST(l0 + l1 AS HUGEINT)
                           * (tot.n0 - l0 + tot.n1 - l1)) AS score
                FROM c1, tot WHERE bin < maxbin
            ), root AS (
                SELECT s1.* FROM s1, tot
                WHERE tot.n0 > 0 AND tot.n1 > 0
                ORDER BY score, feature, bin LIMIT 1
            ), a2 AS (
                SELECT b.*, CASE WHEN (CASE root.feature
                                         WHEN 'f_len' THEN b.f_len
                                         WHEN 'f_mod' THEN b.f_mod
                                         ELSE b.f_src END) <= root.bin
                            THEN 2 ELSE 3 END AS node
                FROM base b CROSS JOIN root
            ), feats2 AS (
                SELECT node, 'f_len' AS feature, f_len AS bin, y FROM a2
                UNION ALL SELECT node, 'f_mod', f_mod, y FROM a2
                UNION ALL SELECT node, 'f_src', f_src, y FROM a2
            ), t2 AS (
                SELECT node, SUM(1 - y) AS n0, SUM(y) AS n1
                FROM a2 GROUP BY node
            ), h2 AS (
                SELECT node, feature, bin, SUM(1 - y) AS c0, SUM(y) AS c1
                FROM feats2 GROUP BY 1, 2, 3
            ), c2 AS (
                SELECT node, feature, bin,
                       SUM(c0) OVER w AS l0, SUM(c1) OVER w AS l1,
                       MAX(bin) OVER (PARTITION BY node, feature) AS maxbin
                FROM h2
                WINDOW w AS (PARTITION BY node, feature ORDER BY bin)
            ), s2 AS (
                SELECT c2.node, feature, bin, l0, l1,
                       (1000000 * (CAST(l0 AS HUGEINT) * l1
                                     * (t2.n0 - l0 + t2.n1 - l1)
                                 + CAST(t2.n0 - l0 AS HUGEINT)
                                     * (t2.n1 - l1) * (l0 + l1)))
                       // (CAST(l0 + l1 AS HUGEINT)
                           * (t2.n0 - l0 + t2.n1 - l1)) AS score
                FROM c2 JOIN t2 ON t2.node = c2.node
                WHERE bin < maxbin
            ), w2 AS (
                SELECT * FROM (
                    SELECT s2.*, ROW_NUMBER() OVER
                        (PARTITION BY node
                         ORDER BY score, feature, bin) AS rn
                    FROM s2
                ) WHERE rn = 1
            ), child AS (
                SELECT t2.node, t2.n0, t2.n1, w2.feature, w2.bin,
                       w2.score, w2.l0, w2.l1,
                       (t2.n0 > 0 AND t2.n1 > 0
                        AND w2.feature IS NOT NULL) AS does_split
                FROM t2 LEFT JOIN w2 ON w2.node = t2.node
            )
            SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth,
                   'split' AS kind, root.feature,
                   CAST(root.bin AS BIGINT) AS bin,
                   CAST(tot.n0 AS BIGINT) AS n0,
                   CAST(tot.n1 AS BIGINT) AS n1,
                   CAST(root.score AS BIGINT) AS score_micro,
                   CAST(CASE WHEN tot.n1 > tot.n0 THEN 1 ELSE 0 END
                        AS BIGINT) AS pred
            FROM root, tot
            UNION ALL
            SELECT CAST(node AS BIGINT), 1,
                   CASE WHEN does_split THEN 'split' ELSE 'leaf' END,
                   CASE WHEN does_split THEN feature ELSE '' END,
                   CAST(CASE WHEN does_split THEN bin ELSE -1 END
                        AS BIGINT),
                   CAST(n0 AS BIGINT), CAST(n1 AS BIGINT),
                   CAST(CASE WHEN does_split THEN score ELSE -1 END
                        AS BIGINT),
                   CAST(CASE WHEN n1 > n0 THEN 1 ELSE 0 END AS BIGINT)
            FROM child
            UNION ALL
            SELECT CAST(node * 2 AS BIGINT), 2, 'leaf', '', -1,
                   CAST(l0 AS BIGINT), CAST(l1 AS BIGINT), -1,
                   CAST(CASE WHEN l1 > l0 THEN 1 ELSE 0 END AS BIGINT)
            FROM child WHERE does_split
            UNION ALL
            SELECT CAST(node * 2 + 1 AS BIGINT), 2, 'leaf', '', -1,
                   CAST(n0 - l0 AS BIGINT), CAST(n1 - l1 AS BIGINT), -1,
                   CAST(CASE WHEN n1 - l1 > n0 - l0 THEN 1 ELSE 0 END
                        AS BIGINT)
            FROM child WHERE does_split
            ORDER BY node
        """,
        "source_length_mwu": """
            WITH h AS (
                SELECT n_chars AS v,
                       SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
                FROM documents WHERE source IN ('src0', 'src1') GROUP BY v
            ), c AS (
                SELECT v, ca, cb,
                       SUM(cb) OVER (ORDER BY v) - cb AS below_b,
                       SUM(ca) OVER (ORDER BY v) - ca AS below_a,
                       (SELECT SUM(ca) FROM h) AS na,
                       (SELECT SUM(cb) FROM h) AS nb
                FROM h
            )
            SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   CAST(SUM(ca * (2 * below_b + cb)) AS BIGINT) AS u2_a,
                   CAST(SUM(cb * (2 * below_a + ca)) AS BIGINT) AS u2_b,
                   CAST(SUM(CASE WHEN ca + cb > 1
                            THEN (ca+cb)*(ca+cb)*(ca+cb) - (ca+cb)
                            ELSE 0 END) AS BIGINT) AS tie_term,
                   CAST(SUM(ca * (2 * below_b + cb)) AS DOUBLE) / 2 AS u_a
            FROM c GROUP BY na, nb
        """,
        "priority_price_welch": """
            WITH s AS (
                SELECT o_orderpriority AS g, COUNT(*) AS n,
                       SUM(CAST(ROUND(o_totalprice*100) AS HUGEINT)) AS sx,
                       SUM(CAST(ROUND(o_totalprice*100) AS HUGEINT)
                           * CAST(ROUND(o_totalprice*100) AS HUGEINT)) AS sxx
                FROM orders
                WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
                GROUP BY 1
            ), w AS (
                SELECT
                  (SELECT n FROM s WHERE g='1-URGENT') AS na,
                  (SELECT n FROM s WHERE g='5-LOW') AS nb,
                  CAST((SELECT sx FROM s WHERE g='1-URGENT') AS DOUBLE)
                      / (SELECT n FROM s WHERE g='1-URGENT') AS ma,
                  CAST((SELECT sx FROM s WHERE g='5-LOW') AS DOUBLE)
                      / (SELECT n FROM s WHERE g='5-LOW') AS mb,
                  CAST((SELECT n*sxx - sx*sx FROM s WHERE g='1-URGENT')
                       AS DOUBLE)
                    / (CAST((SELECT n FROM s WHERE g='1-URGENT') AS DOUBLE)
                       * ((SELECT n FROM s WHERE g='1-URGENT') - 1))
                    / (SELECT n FROM s WHERE g='1-URGENT') AS se2a,
                  CAST((SELECT n*sxx - sx*sx FROM s WHERE g='5-LOW')
                       AS DOUBLE)
                    / (CAST((SELECT n FROM s WHERE g='5-LOW') AS DOUBLE)
                       * ((SELECT n FROM s WHERE g='5-LOW') - 1))
                    / (SELECT n FROM s WHERE g='5-LOW') AS se2b
            )
            SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
                   ROUND((ma - mb) / SQRT(se2a + se2b), 6) AS t,
                   ROUND((se2a + se2b) * (se2a + se2b)
                         / (se2a*se2a/(na-1) + se2b*se2b/(nb-1)), 6) AS dof
            FROM w
        """,
        "source_length_ks": """
            WITH h AS (
                SELECT n_chars AS v,
                       SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
                FROM documents WHERE source IN ('src0', 'src1') GROUP BY v
            ), c AS (
                SELECT v, SUM(ca) OVER (ORDER BY v) AS cum_a,
                       SUM(cb) OVER (ORDER BY v) AS cum_b,
                       (SELECT SUM(ca) FROM h) AS na,
                       (SELECT SUM(cb) FROM h) AS nb
                FROM h
            )
            SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   CAST(MAX(ABS(cum_a*nb - cum_b*na)) AS BIGINT) AS d_num,
                   ROUND(CAST(MAX(ABS(cum_a*nb - cum_b*na)) AS DOUBLE)
                         / CAST(na*nb AS DOUBLE), 6) AS d
            FROM c GROUP BY na, nb
        """,
        # source_interleave: stride scheduling with integer virtual-time
        # keys k = r * (12 / w), w = 1 + (alpha-rank % 4); within-source
        # rank r = md5 order; global pos = rank over (k, source)
        "source_interleave": """
            WITH src AS (
                SELECT source,
                       ROW_NUMBER() OVER (ORDER BY source) - 1 AS idx
                FROM (SELECT DISTINCT source FROM documents)
            ), ranked AS (
                -- 52-bit md5 prefix + doc_id: the EXACT key the op
                -- ranks by (numerics.md5_key52) — ordering by the full
                -- md5 hex would diverge on a 13-hex-prefix collision
                SELECT doc_id, source,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                    1, 13))::BIGINT,
                                    doc_id
                       ) AS r
                FROM documents
            ), keyed AS (
                SELECT k.doc_id, k.source,
                       k.r * (12 // (1 + s.idx % 4)) AS vt
                FROM ranked k JOIN src s USING (source)
            )
            SELECT ROW_NUMBER() OVER (ORDER BY vt, source) AS pos,
                   doc_id, source
            FROM keyed
        """,
        "user_event_pivot": """
            SELECT user_id,
                   COUNT(*) FILTER (event_type = 'click')    AS cnt_click,
                   COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT))
                            FILTER (event_type = 'click'), 0)    AS sum_click_cents,
                   COUNT(*) FILTER (event_type = 'error')    AS cnt_error,
                   COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT))
                            FILTER (event_type = 'error'), 0)    AS sum_error_cents,
                   COUNT(*) FILTER (event_type = 'purchase') AS cnt_purchase,
                   COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT))
                            FILTER (event_type = 'purchase'), 0) AS sum_purchase_cents,
                   COUNT(*) FILTER (event_type = 'signup')   AS cnt_signup,
                   COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT))
                            FILTER (event_type = 'signup'), 0)   AS sum_signup_cents,
                   COUNT(*) FILTER (event_type = 'view')     AS cnt_view,
                   COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT))
                            FILTER (event_type = 'view'), 0)     AS sum_view_cents
            FROM events
            WHERE event_type IN ('click','error','purchase','signup','view')
            GROUP BY user_id
        """,
        # embedding_quantized: scale = maxabs/127 FIRST, then round(x/scale)
        # — the same two IEEE ops in the same order as quantize_batch
        "embedding_quantized": """
            WITH m AS (
                SELECT vec_id,
                       list_aggregate(
                           list_transform(embedding::DOUBLE[], x -> ABS(x)),
                           'max') / 127 AS scale
                FROM embeddings
            ), e AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) AS dim,
                       unnest(embedding::DOUBLE[]) AS x
                FROM embeddings
            )
            SELECT e.vec_id, CAST(e.dim AS BIGINT) AS dim,
                   CASE WHEN m.scale = 0 THEN 0
                        ELSE CAST(ROUND(e.x / m.scale) AS BIGINT) END AS code,
                   m.scale AS scale
            FROM e JOIN m USING (vec_id)
        """,
        "curated_docs": r"""
            WITH scored AS (
                SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_md5,
                       ROUND(0.4 * LEAST(n_words / 100.0, 1.0)
                           + 0.3 * EXP(-0.5 * POW((CAST(sum_wlen AS DOUBLE) / GREATEST(n_words, 1) - 5.0) / 3.0, 2))
                           + 0.3 * LEAST(CAST(n_stop AS DOUBLE) / GREATEST(n_words, 1) * 5.0, 1.0), 6)
                           AS quality
                FROM (
                    SELECT doc_id, text,
                           CASE WHEN trim(text) = '' THEN 0
                                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
                           length(regexp_replace(text, '\s', '', 'g')) AS sum_wlen,
                           len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                               x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop
                    FROM documents)
            ), filtered AS (SELECT * FROM scored WHERE quality >= 0.5)
            SELECT doc_id, content_md5, quality FROM (
                SELECT doc_id, content_md5, quality,
                       MIN(doc_id) OVER (PARTITION BY content_md5) AS keep
                FROM filtered)
            WHERE doc_id = keep
        """,
        "content_fingerprint": r"""
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_md5
            FROM documents
        """,
        "lm_quality": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), uni AS (
                SELECT w, COUNT(*) AS c
                FROM (SELECT UNNEST(ws) AS w FROM docs) GROUP BY w
            ), v AS (SELECT COUNT(*) AS v FROM uni),
            bi AS (
                -- mirrors lm_score's bigram_min_count=2 prune: bigrams
                -- below the floor take the smoothed c=0 path via the
                -- LEFT JOIN's COALESCE
                SELECT w1, w2, COUNT(*) AS c FROM (
                    SELECT ws[i] AS w1, ws[i+1] AS w2
                    FROM docs, UNNEST(range(1, len(ws))) AS t(i))
                GROUP BY w1, w2
                HAVING COUNT(*) >= 2
            ), docbi AS (
                SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
                FROM docs, UNNEST(range(1, len(ws))) AS t(i)
            )
            SELECT d.doc_id,
                   ROUND(AVG(-LOG2((COALESCE(b.c, 0) + 1.0) / (u.c + v.v))), 6)
                       AS bits_per_bigram
            FROM docbi d
            JOIN uni u ON u.w = d.w1
            LEFT JOIN bi b ON b.w1 = d.w1 AND b.w2 = d.w2
            CROSS JOIN v
            GROUP BY d.doc_id
        """,
        "passage_dedup": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), ch AS (
                SELECT doc_id, i AS chunk_idx,
                       array_to_string(list_slice(ws, i * 2 + 1, i * 2 + 2), ' ') AS chunk
                FROM docs,
                     UNNEST(range(CAST(ceil(len(ws) / 2.0) AS BIGINT))) AS t(i)
            ), win AS (
                SELECT doc_id, chunk_idx, chunk,
                       ROW_NUMBER() OVER (PARTITION BY chunk
                                          ORDER BY doc_id, chunk_idx) AS rn
                FROM ch
            )
            SELECT doc_id,
                   string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_dedup
            FROM win WHERE rn = 1
            GROUP BY doc_id
        """,
        # dup_positions_exact: a window-text self-count — every 1-based
        # position whose 8-word window occurs >= 2 times corpus-wide.
        "dup_positions_exact": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), w AS (
                SELECT doc_id, i, array_to_string(ws[i:i+7], ' ') AS wt
                FROM docs, UNNEST(range(1, len(ws) - 8 + 2)) AS t(i)
            )
            SELECT doc_id, CAST(i AS BIGINT) AS pos
            FROM w
            WHERE wt IN (SELECT wt FROM w GROUP BY wt HAVING COUNT(*) >= 2)
        """,
        # jsonl_roundtrip: the Ray side writes documents as gzipped
        # JSONL and reads them back; hash-equality against the source
        # table proves the ingest path lossless.
        "jsonl_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "csv_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "ipc_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "orc_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        # token_shard_roundtrip: the stats are recomputed from the WORD
        # stream with the same md5-prefix token ids the Ray side wrote
        # into the .bin files — a match proves the binary sink + reader
        # are lossless (docs with zero words still emit a row)
        "token_shard_roundtrip": r"""
            WITH ws AS (
                SELECT doc_id,
                       UNNEST(list_filter(regexp_split_to_array(text, '\s+'),
                                          x -> x <> '')) AS w
                FROM documents
            ), agg AS (
                SELECT doc_id, COUNT(*) AS n_tokens,
                       CAST(SUM(('0x' || substr(md5(w), 1, 16))::UBIGINT % 50000)
                            AS BIGINT) AS tok_sum
                FROM ws GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   COALESCE(a.tok_sum, 0) AS tok_sum
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # image_dhash / image_near_dups: the pixels are an arithmetic
        # function of (img_id, y, x) (see _image_fixture), so the oracle
        # rebuilds them, takes 4x4 cell sums (equal areas: the sum
        # comparison equals the op's cross-multiplied mean comparison)
        # and reassembles the 56-bit hash — verifying the REAL PNG
        # decode + integral-image dHash bit-for-bit
        "image_dhash": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            ), ids AS (
                SELECT i AS img_id,
                       CASE WHEN i % 10 = 9 THEN i - 1 ELSE i END AS b
                FROM (SELECT UNNEST(range((SELECT n FROM nn))) AS i)
            ), px AS (
                SELECT img_id, y, x,
                       CASE WHEN img_id % 10 = 9 AND y < 4 AND x < 4
                            THEN LEAST(bp + 100, 255) ELSE bp END AS p
                FROM (
                    SELECT img_id, y, x,
                           ((7 + (b*13) % 97) * y + (5 + (b*29) % 89) * x
                            + y*x + b) % 256 AS bp
                    FROM ids, range(32) ty(y), range(32) tx(x)
                )
            ), cells AS (
                SELECT img_id, y // 4 AS r, x // 4 AS c, SUM(p) AS s
                FROM px GROUP BY img_id, y // 4, x // 4
            )
            SELECT a.img_id,
                   CAST(SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END
                            * (1::BIGINT << (a.r * 7 + a.c))) AS BIGINT) AS dhash
            FROM cells a JOIN cells b
              ON a.img_id = b.img_id AND a.r = b.r AND b.c = a.c + 1
            WHERE a.c < 7
            GROUP BY a.img_id
        """,
        "image_near_dups": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            ), ids AS (
                SELECT i AS img_id,
                       CASE WHEN i % 10 = 9 THEN i - 1 ELSE i END AS b
                FROM (SELECT UNNEST(range((SELECT n FROM nn))) AS i)
            ), px AS (
                SELECT img_id, y, x,
                       CASE WHEN img_id % 10 = 9 AND y < 4 AND x < 4
                            THEN LEAST(bp + 100, 255) ELSE bp END AS p
                FROM (
                    SELECT img_id, y, x,
                           ((7 + (b*13) % 97) * y + (5 + (b*29) % 89) * x
                            + y*x + b) % 256 AS bp
                    FROM ids, range(32) ty(y), range(32) tx(x)
                )
            ), cells AS (
                SELECT img_id, y // 4 AS r, x // 4 AS c, SUM(p) AS s
                FROM px GROUP BY img_id, y // 4, x // 4
            ), h AS (
                SELECT a.img_id,
                       CAST(SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END
                                * (1::BIGINT << (a.r * 7 + a.c))) AS BIGINT) AS dhash
                FROM cells a JOIN cells b
                  ON a.img_id = b.img_id AND a.r = b.r AND b.c = a.c + 1
                WHERE a.c < 7
                GROUP BY a.img_id
            )
            SELECT a.img_id AS doc_id_a, b.img_id AS doc_id_b,
                   CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
            FROM h a JOIN h b ON a.img_id < b.img_id
            WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
        """,
        "source_zscore": """
            SELECT doc_id, source, n_chars,
                   ROUND(CASE WHEN STDDEV_POP(n_chars) OVER w > 0
                              THEN (n_chars - AVG(n_chars) OVER w)
                                   / STDDEV_POP(n_chars) OVER w
                              ELSE 0 END, 6) AS z
            FROM documents
            WINDOW w AS (PARTITION BY source)
        """,
        # blocklist_tags: occurrence semantics (overlaps included)
        # rebuilt as a position scan — replace()-division would count
        # non-overlapping only and diverge on 'a a'-style patterns.
        "blocklist_tags": r"""
            WITH pats AS (
                SELECT * FROM (VALUES ('hash'), ('merge'), ('slow query'),
                                      ('table'), ('able'), ('row scan'),
                                      ('a a')) AS p(pat)
            ), hits AS (
                SELECT d.doc_id, p.pat, COUNT(*) AS c
                FROM documents d, pats p,
                     UNNEST(range(1, GREATEST(len(lower(d.text))
                                              - len(p.pat) + 2, 1))) AS t(i)
                WHERE substr(lower(d.text), i, len(p.pat)) = p.pat
                GROUP BY d.doc_id, p.pat
            )
            SELECT d.doc_id,
                   CAST(COALESCE(SUM(h.c), 0) AS BIGINT) AS n_matches,
                   CAST(COUNT(h.pat) AS BIGINT) AS n_distinct
            FROM documents d LEFT JOIN hits h USING (doc_id)
            GROUP BY d.doc_id
        """,
        # cdc_chunks / cdc_dup_chunks: boundaries = windowed cumulative
        # sum of word anchors (md5 % 8 == 0, the engine's word-hash
        # parity idiom); chunk identity = md5 of the space-joined words.
        "cdc_chunks": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), w AS (
                SELECT doc_id, i, ws[i] AS w,
                       CASE WHEN ('0x' || substr(md5(ws[i]), 1, 16))::UBIGINT
                                 % 8 = 0 THEN 1 ELSE 0 END AS anchor
                FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(i)
            ), c AS (
                SELECT doc_id, i, w,
                       CAST(COALESCE(SUM(anchor) OVER (
                           PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS BIGINT) AS chunk_idx
                FROM w
            )
            SELECT doc_id, chunk_idx, CAST(COUNT(*) AS BIGINT) AS n_words,
                   md5(string_agg(w, ' ' ORDER BY i)) AS chunk_md5
            FROM c GROUP BY doc_id, chunk_idx
        """,
        "cdc_dup_chunks": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), w AS (
                SELECT doc_id, i, ws[i] AS w,
                       CASE WHEN ('0x' || substr(md5(ws[i]), 1, 16))::UBIGINT
                                 % 8 = 0 THEN 1 ELSE 0 END AS anchor
                FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(i)
            ), c AS (
                SELECT doc_id, i, w,
                       COALESCE(SUM(anchor) OVER (
                           PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS chunk_idx
                FROM w
            ), chunks AS (
                SELECT doc_id, chunk_idx,
                       md5(string_agg(w, ' ' ORDER BY i)) AS chunk_md5
                FROM c GROUP BY doc_id, chunk_idx
            )
            SELECT chunk_md5,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                   MIN(doc_id) AS min_doc
            FROM chunks GROUP BY chunk_md5
            HAVING COUNT(DISTINCT doc_id) > 1
        """,
        "repetition_stats": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), w AS (
                SELECT doc_id, len(ws) AS n_words,
                       len(list_distinct(ws)) AS n_distinct_words
                FROM docs
            ), top2 AS (
                SELECT doc_id, MAX(c) AS mx FROM (
                    SELECT doc_id, ws[i+1] || ' ' || ws[i+2] AS g, COUNT(*) AS c
                    FROM docs, UNNEST(range(len(ws) - 1)) AS t(i)
                    GROUP BY doc_id, g)
                GROUP BY doc_id
            ), d5 AS (
                SELECT doc_id,
                       SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup,
                       SUM(c) AS tot
                FROM (
                    SELECT doc_id,
                           ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' '
                                   || ws[i+4] || ' ' || ws[i+5] AS g,
                           COUNT(*) AS c
                    FROM docs, UNNEST(range(len(ws) - 4)) AS t(i)
                    GROUP BY doc_id, g)
                GROUP BY doc_id
            )
            SELECT w.doc_id, w.n_words, w.n_distinct_words,
                   ROUND(CASE WHEN w.n_words = 0 THEN 0.0
                         ELSE 1.0 - CAST(w.n_distinct_words AS DOUBLE) / w.n_words END, 6)
                       AS dup_word_frac,
                   ROUND(COALESCE(top2.mx * 2.0 / w.n_words, 0.0), 6) AS top2_frac,
                   ROUND(COALESCE(CAST(d5.dup AS DOUBLE) / d5.tot, 0.0), 6) AS dup5_frac
            FROM w
            LEFT JOIN top2 USING (doc_id)
            LEFT JOIN d5 USING (doc_id)
        """,
        "decontaminate": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id,
                       ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
                FROM docs, UNNEST(range(len(ws) - 2)) AS t(i)
            ), bench AS (
                SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
            )
            SELECT doc_id, COUNT(DISTINCT gram) AS n_overlap
            FROM g JOIN bench USING (gram)
            WHERE doc_id % 97 <> 0
            GROUP BY doc_id
        """,
        "pii_scrub": r"""
            WITH dirty AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id || '@example.com ip 10.'
                            || (doc_id % 256) || '.0.' || (doc_id % 100)
                            || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            || ' call (415) 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           AS text
                FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                   len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
                   len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
                   len(regexp_extract_all(text, '(\+?\d{1,2} ?)?\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
                   len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                   + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                   + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
                   + len(regexp_extract_all(text, '(\+?\d{1,2} ?)?\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b'))
                       AS n_pii,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                       '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                     '(\+?\d{1,2} ?)?\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')
                       AS redacted
            FROM dirty
        """,
        "gopher_filter": r"""
            SELECT doc_id, n_words,
                   ROUND(CASE WHEN n_words = 0 THEN 0.0
                              ELSE CAST(sum_wlen AS DOUBLE) / n_words END, 6)
                       AS mean_word_len,
                   ROUND(CASE WHEN n_words = 0 THEN 0.0
                              ELSE CAST(n_alpha AS DOUBLE) / n_words END, 6)
                       AS alpha_frac,
                   n_stop AS n_distinct_stopwords,
                   (n_words BETWEEN 50 AND 100000
                    AND (CAST(sum_wlen AS DOUBLE) / n_words) BETWEEN 3.0 AND 10.0
                    AND (CAST(n_alpha AS DOUBLE) / n_words) >= 0.8
                    AND n_stop >= 2) AS "pass"
            FROM (
                SELECT doc_id,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
                           AS n_words,
                       CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
                           AS sum_wlen,
                       CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                x -> regexp_matches(x, '\p{L}'))) AS BIGINT) AS n_alpha,
                       CAST(len(list_distinct(list_filter(
                                list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
                                               x -> x),
                                x -> x IN ('the','a','of','and','to','in','is')))) AS BIGINT)
                           AS n_stop
                FROM documents)
        """,
        "top_ngrams": r"""
            WITH l AS (
                SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), g AS (
                SELECT ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS ngram
                FROM l, UNNEST(range(len(ws) - 2)) AS t(i)
            )
            SELECT ngram, COUNT(*) AS n FROM g GROUP BY ngram
            ORDER BY n DESC, ngram LIMIT 100
        """,
        "jaccard_drops": r"""
            WITH RECURSIVE l AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), g AS (
                -- mirrors _shingle_arrays: docs shorter than the gram
                -- width contribute ONE whole-text shingle (empty docs
                -- none), so sub-ngram near-identical docs still pair
                SELECT DISTINCT doc_id,
                       ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
                FROM l, UNNEST(range(len(ws) - 2)) AS t(i)
                UNION ALL
                SELECT doc_id, array_to_string(ws, ' ') AS gram
                FROM l WHERE len(ws) BETWEEN 1 AND 2
            ), tot AS (
                SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*) AS c
                FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), prs AS (
                SELECT pa, pb FROM inter
                JOIN tot ta ON ta.doc_id = inter.pa
                JOIN tot tb ON tb.doc_id = inter.pb
                WHERE CAST(c AS DOUBLE) / (ta.n + tb.n - c) >= 0.5
            ), edges AS (
                SELECT pa AS a, pb AS b FROM prs UNION SELECT pb, pa FROM prs
            ), lbl(node, label) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e.a, x.label FROM edges e JOIN lbl x ON x.node = e.b
            )
            SELECT node AS doc_id
            FROM (SELECT node, MIN(label) AS m FROM lbl GROUP BY node)
            WHERE m <> node
        """,
        # sparse tf-idf cosine: brute term self-join with the SAME
        # integer arithmetic the engine uses (idf floor(LN(N/df)*1000
        # + 0.5) -> int weights -> exact dot; HUGEINT threshold
        # predicate; ROUND(dot/SQRT(double), 6)) — a different
        # algorithm (no prefix filter) agreeing on every pair and bit
        "tfidf_cosine_pairs": r"""
            WITH sub AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
            ), nn AS (
                SELECT COUNT(*) AS n FROM sub
            ), tf AS (
                SELECT doc_id, w, COUNT(*) AS tf FROM (
                    SELECT doc_id, UNNEST(
                        list_filter(
                            regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')
                    ) AS w
                    FROM sub
                ) GROUP BY 1, 2
            ), df AS (
                SELECT w, COUNT(*) AS df FROM tf GROUP BY 1
            ), wt AS MATERIALIZED (
                SELECT tf.doc_id, tf.w,
                       tf.tf * CAST(FLOOR(
                           LN(CAST((SELECT n FROM nn) AS DOUBLE) / df.df)
                           * 1000 + 0.5) AS BIGINT) AS wgt
                FROM tf JOIN df USING (w)
            ), n2 AS MATERIALIZED (
                SELECT doc_id, SUM(wgt * wgt) AS n2 FROM wt GROUP BY 1
            ), dotp AS (
                SELECT x.doc_id AS da, y.doc_id AS db,
                       SUM(x.wgt * y.wgt) AS dot
                FROM wt x JOIN wt y
                     ON x.w = y.w AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT da AS a, db AS b, CAST(dot AS BIGINT) AS dot_q,
                   ROUND(dot / SQRT(CAST(na.n2 AS DOUBLE) * nb.n2), 6)
                       AS cos6
            FROM dotp
            JOIN n2 na ON na.doc_id = da
            JOIN n2 nb ON nb.doc_id = db
            WHERE na.n2 > 0 AND nb.n2 > 0 AND dot >= 0
              AND CAST(10000 AS HUGEINT) * dot * dot
                  >= CAST(3600 AS HUGEINT) * na.n2 * nb.n2
        """,
        "containment_pairs": r"""
            WITH l AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), g AS (
                -- mirrors _shingle_arrays: docs shorter than the gram
                -- width contribute ONE whole-text shingle
                SELECT DISTINCT doc_id,
                       ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
                FROM l, UNNEST(range(len(ws) - 2)) AS t(i)
                UNION ALL
                SELECT doc_id, array_to_string(ws, ' ') AS gram
                FROM l WHERE len(ws) BETWEEN 1 AND 2
            ), tot AS (
                SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS c
                FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_id_a, doc_id_b,
                   ROUND(CAST(c AS DOUBLE) / LEAST(ta.n, tb.n), 6) AS containment
            FROM inter
            JOIN tot ta ON ta.doc_id = inter.doc_id_a
            JOIN tot tb ON tb.doc_id = inter.doc_id_b
            WHERE CAST(c AS DOUBLE) / LEAST(ta.n, tb.n) >= 0.6
        """,
        "edit_dup_pairs": """
            WITH s AS (
                SELECT doc_id, substr(text, 1, 30) AS t FROM documents
            )
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_distance
            FROM s a JOIN s b
              ON a.doc_id < b.doc_id
             AND abs(length(a.t) - length(b.t)) <= 2
            WHERE levenshtein(a.t, b.t) <= 2
        """,
        "jaccard_join_pairs": r"""
            WITH l AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), g AS (
                -- mirrors _shingle_arrays: docs shorter than the gram
                -- width contribute ONE whole-text shingle (empty docs
                -- none), so sub-ngram near-identical docs still pair
                SELECT DISTINCT doc_id,
                       ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
                FROM l, UNNEST(range(len(ws) - 2)) AS t(i)
                UNION ALL
                SELECT doc_id, array_to_string(ws, ' ') AS gram
                FROM l WHERE len(ws) BETWEEN 1 AND 2
            ), tot AS (
                SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS c
                FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_id_a, doc_id_b,
                   ROUND(CAST(c AS DOUBLE) / (ta.n + tb.n - c), 6) AS jaccard
            FROM inter
            JOIN tot ta ON ta.doc_id = inter.doc_id_a
            JOIN tot tb ON tb.doc_id = inter.doc_id_b
            WHERE CAST(c AS DOUBLE) / (ta.n + tb.n - c) >= 0.5
        """,
        "global_length_rank": r"""
            SELECT doc_id, n_chars,
                   RANK() OVER (ORDER BY n_chars DESC) AS rank
            FROM documents
        """,
        "late_suppliers": r"""
            WITH lo AS (
                SELECT l_orderkey, l_suppkey,
                       CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            ), per AS (
                SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
                FROM lo GROUP BY l_orderkey, l_suppkey
            ), ord AS (
                SELECT l_orderkey, COUNT(*) AS n_supp, SUM(supp_late) AS n_late
                FROM per GROUP BY l_orderkey
            )
            SELECT p.l_suppkey AS s_suppkey, COUNT(*) AS numwait
            FROM per p JOIN ord o USING (l_orderkey)
            WHERE p.supp_late = 1 AND o.n_supp >= 2 AND o.n_late = 1
            GROUP BY p.l_suppkey
        """,
        "source_overlap": r"""
            WITH sw AS (
                SELECT DISTINCT source,
                       UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                          x -> x <> '')) AS word
                FROM documents
            ), tot AS (
                SELECT source, COUNT(*) AS n FROM sw GROUP BY source
            ), pairs AS (
                SELECT a.source AS source_a, b.source AS source_b,
                       COUNT(*) AS n_common
                FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
                GROUP BY a.source, b.source
            )
            SELECT source_a, source_b, n_common,
                   ROUND(CAST(n_common AS DOUBLE) / (ta.n + tb.n - n_common), 6)
                       AS jaccard
            FROM pairs
            JOIN tot ta ON ta.source = pairs.source_a
            JOIN tot tb ON tb.source = pairs.source_b
        """,
        "global_doc_rank": r"""
            SELECT doc_id, n_chars,
                   ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rank
            FROM documents
        """,
        # BM25: every constant is a DOUBLE literal (1.2e0 not the
        # DECIMAL 1.2), the expression shape mirrors ops/textstats.bm25_topk
        # token for token, and the per-term parts add in sorted-term order
        # via MAX(CASE) pivots (one non-null each) — so the summed double
        # is bit-identical to the Ray side's.
        "bm25_search": r"""
            WITH w AS (
                SELECT doc_id,
                       UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                          x -> x <> '')) AS term
                FROM documents
            ), dl AS (
                SELECT d.doc_id, COALESCE(t.dl, 0) AS dl
                FROM documents d LEFT JOIN (
                    SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id
                ) t USING (doc_id)
            ), stats AS (
                SELECT (SELECT COUNT(*) FROM documents) AS n,
                       (SELECT SUM(dl) FROM dl) / (SELECT COUNT(*) FROM documents) AS avgdl
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM w
                WHERE term IN ('customer', 'merge', 'window')
                GROUP BY doc_id, term
            ), df AS (
                SELECT term, COUNT(DISTINCT doc_id) AS df FROM w
                WHERE term IN ('customer', 'merge', 'window')
                GROUP BY term
            ), parts AS (
                SELECT tf.doc_id, tf.term,
                       LN((stats.n - df.df + 0.5e0) / (df.df + 0.5e0) + 1.0e0)
                       * (tf.tf * (1.2e0 + 1.0e0))
                       / (tf.tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * (dl.dl / stats.avgdl)))
                       AS part
                FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
            )
            SELECT doc_id, ROUND(s, 6) AS score, matched FROM (
                SELECT doc_id,
                       COALESCE(MAX(CASE WHEN term = 'customer' THEN part END), 0)
                       + COALESCE(MAX(CASE WHEN term = 'merge' THEN part END), 0)
                       + COALESCE(MAX(CASE WHEN term = 'window' THEN part END), 0) AS s,
                       COUNT(*) AS matched
                FROM parts GROUP BY doc_id)
            ORDER BY s DESC, doc_id
            LIMIT 20
        """,
        "tfidf_terms": r"""
            WITH w AS (
                SELECT doc_id,
                       UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                          x -> x <> '')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term
            ), df AS (
                SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY term
            ), n AS (SELECT COUNT(*) AS n FROM documents)
            SELECT doc_id, term, tf, ROUND(raw, 6) AS score FROM (
                SELECT tf.doc_id, tf.term, tf.tf,
                       tf.tf * LN(CAST(n.n AS DOUBLE) / df.df) AS raw,
                       ROW_NUMBER() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf * LN(CAST(n.n AS DOUBLE) / df.df) DESC,
                                    tf.term
                       ) AS rn
                FROM tf JOIN df USING (term), n)
            WHERE rn <= 5
        """,
        # lang_id heuristic is deterministic + SQL-expressible: stopword
        # hits per language with strict-improvement tie-break (the
        # Python iterates sorted lang keys, so first-at-max wins).
        "lang_id": r"""
            WITH words AS (
                SELECT doc_id, lower(w) AS w
                FROM documents,
                     UNNEST(regexp_extract_all(text, '[a-zA-Zäöüéèêàçñ]+')) AS t(w)
            ), hits AS (
                SELECT doc_id,
                       COUNT(*) FILTER (WHERE w IN ('der','die','das','und','ist','nicht','ein','mit','für','von')) AS h_de,
                       COUNT(*) FILTER (WHERE w IN ('the','and','of','to','is','in','that','it','for','with')) AS h_en,
                       COUNT(*) FILTER (WHERE w IN ('el','la','los','las','es','un','una','para','que','con')) AS h_es,
                       COUNT(*) FILTER (WHERE w IN ('le','la','les','et','est','un','une','pour','que','dans')) AS h_fr
                FROM words GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN regexp_matches(d.text, '[一-鿿]') THEN 'zh'
                        WHEN COALESCE(GREATEST(h_de, h_en, h_es, h_fr), 0) = 0 THEN 'und'
                        WHEN h_de = GREATEST(h_de, h_en, h_es, h_fr) THEN 'de'
                        WHEN h_en = GREATEST(h_de, h_en, h_es, h_fr) THEN 'en'
                        WHEN h_es = GREATEST(h_de, h_en, h_es, h_fr) THEN 'es'
                        ELSE 'fr' END AS pred_lang
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        # word hash parity: ('0x' || substr(md5(w),1,16))::UBIGINT equals
        # Python's int.from_bytes(md5(w).digest()[:8], 'big') exactly.
        "simhash_sigs": r"""
            WITH words AS (
                SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS v
                FROM (SELECT doc_id,
                             UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                                x -> x <> '')) AS w
                      FROM documents)
            ), bits AS (
                SELECT doc_id, k,
                       SUM(CAST((v >> k) & 1 AS BIGINT)) AS ones,
                       COUNT(*) AS n
                FROM words, UNNEST(range(64)) AS t(k)
                GROUP BY doc_id, k
            ), vals AS (
                SELECT doc_id,
                       SUM(CASE WHEN 2 * ones > n THEN (1::HUGEINT << k) ELSE 0 END) AS uval
                FROM bits GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(v.uval, 0) - 9223372036854775808 AS BIGINT) AS simhash
            FROM documents d LEFT JOIN vals v USING (doc_id)
        """,
        # exact all-pairs Hamming: valid as the oracle for the blocked
        # plan because pigeonhole blocking is COMPLETE for hamming<=3
        # and no segment bucket at this scale exceeds the star cap.
        "simhash_pairs": r"""
            WITH words AS (
                SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS v
                FROM (SELECT doc_id,
                             UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                                x -> x <> '')) AS w
                      FROM documents)
            ), bits AS (
                SELECT doc_id, k,
                       SUM(CAST((v >> k) & 1 AS BIGINT)) AS ones,
                       COUNT(*) AS n
                FROM words, UNNEST(range(64)) AS t(k)
                GROUP BY doc_id, k
            ), vals AS (
                SELECT doc_id,
                       SUM(CASE WHEN 2 * ones > n THEN (1::HUGEINT << k) ELSE 0 END) AS uval
                FROM bits GROUP BY doc_id
            ), sims AS (
                SELECT d.doc_id,
                       CAST(COALESCE(v.uval, 0) - 9223372036854775808 AS BIGINT) AS simhash
                FROM documents d LEFT JOIN vals v USING (doc_id)
            )
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # the FULL curation pipeline oracled end-to-end: quality floor
        # -> window-function exact dedup -> simhash pairs ->
        # recursive-CTE components -> anti-join the drop list.
        "curated_full": r"""
            WITH RECURSIVE scored AS (
                SELECT doc_id, text,
                       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_md5,
                       ROUND(0.4 * LEAST(n_words / 100.0, 1.0)
                           + 0.3 * EXP(-0.5 * POW((CAST(sum_wlen AS DOUBLE) / GREATEST(n_words, 1) - 5.0) / 3.0, 2))
                           + 0.3 * LEAST(CAST(n_stop AS DOUBLE) / GREATEST(n_words, 1) * 5.0, 1.0), 6)
                           AS quality
                FROM (
                    SELECT doc_id, text,
                           CASE WHEN trim(text) = '' THEN 0
                                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
                           length(regexp_replace(text, '\s', '', 'g')) AS sum_wlen,
                           len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                               x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop
                    FROM documents)
            ), filtered AS (SELECT * FROM scored WHERE quality >= 0.5),
            w1 AS (
                SELECT doc_id, text, content_md5, quality FROM (
                    SELECT *, MIN(doc_id) OVER (PARTITION BY content_md5) AS keep
                    FROM filtered)
                WHERE doc_id = keep
            ), words AS (
                SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS v
                FROM (SELECT doc_id,
                             UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                                x -> x <> '')) AS w
                      FROM w1)
            ), bits AS (
                SELECT doc_id, k, SUM(CAST((v >> k) & 1 AS BIGINT)) AS ones, COUNT(*) AS n
                FROM words, UNNEST(range(64)) AS t(k) GROUP BY doc_id, k
            ), vals AS (
                SELECT doc_id, SUM(CASE WHEN 2 * ones > n THEN (1::HUGEINT << k) ELSE 0 END) AS uval
                FROM bits GROUP BY doc_id
            ), sims AS (
                SELECT w.doc_id,
                       CAST(COALESCE(v.uval, 0) - 9223372036854775808 AS BIGINT) AS simhash
                FROM w1 w LEFT JOIN vals v USING (doc_id)
            ), prs AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb
                FROM sims a JOIN sims b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ), edges AS (
                SELECT pa AS a, pb AS b FROM prs UNION SELECT pb, pa FROM prs
            ), lbl(node, label) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e.a, l.label FROM edges e JOIN lbl l ON l.node = e.b
            ), drops AS (
                SELECT node FROM (SELECT node, MIN(label) AS m FROM lbl GROUP BY node)
                WHERE m <> node
            )
            SELECT doc_id, content_md5, quality FROM w1
            WHERE doc_id NOT IN (SELECT node FROM drops)
        """,
        # MinHash-LSH verified pairs vs EXACT all-pairs n-gram Jaccard.
        # Valid as a hard oracle because the banding is DETERMINISTIC
        # (fixed permutations — no runtime randomness) and verified
        # complete on this corpus: every pair at or above the 0.8
        # threshold sits at j >= 0.9, where a band collision is
        # near-certain (1-(1-0.9^4)^16 ~ 1 - 3e-6); the exact-Jaccard
        # verify stage then matches the SQL values digit for digit
        # (hashed-shingle Jaccard == string-gram Jaccard absent
        # collisions).
        "minhash_near_dups": r"""
            WITH g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, GREATEST(len(ws) - 1,
                                             CASE WHEN len(ws) > 0 THEN 2 ELSE 1 END)),
                           i -> CASE WHEN len(ws) >= 3
                                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                     ELSE array_to_string(ws, ' ') END)) AS gs
                FROM (SELECT doc_id,
                             list_filter(regexp_split_to_array(lower(text), '\s+'),
                                         x -> x <> '') AS ws
                      FROM documents)
            ), e AS (
                SELECT doc_id, UNNEST(gs) AS gram, len(gs) AS n FROM g
            ), inter AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*) AS ni,
                       ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
                FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT pa AS doc_id_a, pb AS doc_id_b,
                   ROUND(ni * 1.0 / (na + nb - ni), 6) AS jaccard
            FROM inter
            WHERE ni * 1.0 / (na + nb - ni) >= 0.8
        """,
        # hashed_doc_vectors: signed hashing trick rebuilt from the md5
        # bucket (first 8 digest bytes) / sign (next 8 bytes) idiom;
        # nonzero entries only (cancellation drops a dim).
        "hashed_doc_vectors": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '')) AS w
                FROM documents
            )
            SELECT doc_id,
                   CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % 64
                        AS BIGINT) AS dim,
                   CAST(SUM(CASE WHEN ('0x' || substr(md5(w), 17, 16))::UBIGINT
                                      % 2 = 0 THEN 1 ELSE -1 END)
                        AS BIGINT) AS val
            FROM toks
            GROUP BY 1, 2
            HAVING SUM(CASE WHEN ('0x' || substr(md5(w), 17, 16))::UBIGINT
                                 % 2 = 0 THEN 1 ELSE -1 END) <> 0
        """,
        # weighted_jaccard_pairs: the same pair CTE, then the exact
        # multiset Jaccard from per-doc word term-frequencies.
        "weighted_jaccard_pairs": r"""
            WITH g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, GREATEST(len(ws) - 1,
                                             CASE WHEN len(ws) > 0 THEN 2 ELSE 1 END)),
                           i -> CASE WHEN len(ws) >= 3
                                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                     ELSE array_to_string(ws, ' ') END)) AS gs
                FROM (SELECT doc_id,
                             list_filter(regexp_split_to_array(lower(text), '\s+'),
                                         x -> x <> '') AS ws
                      FROM documents)
            ), e AS (
                SELECT doc_id, UNNEST(gs) AS gram, len(gs) AS n FROM g
            ), inter AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*) AS ni,
                       ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
                FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ), pairs AS (
                SELECT pa AS doc_id_a, pb AS doc_id_b FROM inter
                WHERE ni * 1.0 / (na + nb - ni) >= 0.8
            ), wc AS (
                SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
                FROM (SELECT doc_id,
                             unnest(list_filter(
                                 regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '')) AS w
                      FROM documents)
                GROUP BY doc_id, w
            ), tot AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM wc GROUP BY doc_id
            ), num AS (
                SELECT p.doc_id_a, p.doc_id_b,
                       CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS num
                FROM pairs p
                JOIN wc a ON a.doc_id = p.doc_id_a
                JOIN wc b ON b.doc_id = p.doc_id_b AND b.w = a.w
                GROUP BY 1, 2
            )
            SELECT p.doc_id_a, p.doc_id_b,
                   CASE WHEN COALESCE(ta.t, 0) + COALESCE(tb.t, 0)
                             - COALESCE(n.num, 0) = 0 THEN 1.0
                        ELSE ROUND(COALESCE(n.num, 0) * 1.0
                                   / (COALESCE(ta.t, 0) + COALESCE(tb.t, 0)
                                      - COALESCE(n.num, 0)), 6)
                   END AS w_jaccard
            FROM pairs p
            LEFT JOIN num n ON n.doc_id_a = p.doc_id_a
                           AND n.doc_id_b = p.doc_id_b
            LEFT JOIN tot ta ON ta.doc_id = p.doc_id_a
            LEFT JOIN tot tb ON tb.doc_id = p.doc_id_b
        """,
        # pair_edit_distance: the same exact-Jaccard pair CTE, then
        # byte-level levenshtein over the pair texts (DuckDB's
        # levenshtein and strlen are byte-based; the Ray kernel
        # operates on UTF-8 bytes for unconditional parity).
        "pair_edit_distance": r"""
            WITH g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, GREATEST(len(ws) - 1,
                                             CASE WHEN len(ws) > 0 THEN 2 ELSE 1 END)),
                           i -> CASE WHEN len(ws) >= 3
                                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                     ELSE array_to_string(ws, ' ') END)) AS gs
                FROM (SELECT doc_id,
                             list_filter(regexp_split_to_array(lower(text), '\s+'),
                                         x -> x <> '') AS ws
                      FROM documents)
            ), e AS (
                SELECT doc_id, UNNEST(gs) AS gram, len(gs) AS n FROM g
            ), inter AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*) AS ni,
                       ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
                FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ), pairs AS (
                SELECT pa AS doc_id_a, pb AS doc_id_b FROM inter
                WHERE ni * 1.0 / (na + nb - ni) >= 0.8
            )
            SELECT p.doc_id_a, p.doc_id_b,
                   CAST(levenshtein(da.text, db.text) AS BIGINT)
                       AS edit_distance,
                   ROUND(1.0 - levenshtein(da.text, db.text)
                             / GREATEST(strlen(da.text), strlen(db.text), 1),
                         6) AS edit_sim
            FROM pairs p
            JOIN documents da ON da.doc_id = p.doc_id_a
            JOIN documents db ON db.doc_id = p.doc_id_b
        """,
        # ... and the MinHash drop list: components over those exact
        # pairs (recursive-CTE min-label closure), drop all but min id.
        "near_dup_drops": r"""
            WITH RECURSIVE g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, GREATEST(len(ws) - 1,
                                             CASE WHEN len(ws) > 0 THEN 2 ELSE 1 END)),
                           i -> CASE WHEN len(ws) >= 3
                                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                     ELSE array_to_string(ws, ' ') END)) AS gs
                FROM (SELECT doc_id,
                             list_filter(regexp_split_to_array(lower(text), '\s+'),
                                         x -> x <> '') AS ws
                      FROM documents)
            ), e AS (
                SELECT doc_id, UNNEST(gs) AS gram, len(gs) AS n FROM g
            ), inter AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*) AS ni,
                       ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
                FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ), prs AS (
                SELECT pa, pb FROM inter WHERE ni * 1.0 / (na + nb - ni) >= 0.8
            ), edges AS (
                SELECT pa AS a, pb AS b FROM prs UNION SELECT pb, pa FROM prs
            ), lbl(node, label) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e2.a, l.label FROM edges e2 JOIN lbl l ON l.node = e2.b
            )
            SELECT node AS doc_id
            FROM (SELECT node, MIN(label) AS m FROM lbl GROUP BY node)
            WHERE m <> node
        """,
        # same pair + component closure as near_dup_drops, then every
        # document (member or not) is assigned cluster = component min
        # id (or its own id) and a md5-bucket split — verifies
        # sampling.leakage_safe_split end to end: whole clusters land
        # in one split
        "leakage_safe_split": r"""
            WITH RECURSIVE g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, GREATEST(len(ws) - 1,
                                             CASE WHEN len(ws) > 0 THEN 2 ELSE 1 END)),
                           i -> CASE WHEN len(ws) >= 3
                                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                     ELSE array_to_string(ws, ' ') END)) AS gs
                FROM (SELECT doc_id,
                             list_filter(regexp_split_to_array(lower(text), '\s+'),
                                         x -> x <> '') AS ws
                      FROM documents)
            ), e AS (
                SELECT doc_id, UNNEST(gs) AS gram, len(gs) AS n FROM g
            ), inter AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*) AS ni,
                       ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
                FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ), prs AS (
                SELECT pa, pb FROM inter WHERE ni * 1.0 / (na + nb - ni) >= 0.8
            ), edges AS (
                SELECT pa AS a, pb AS b FROM prs UNION SELECT pb, pa FROM prs
            ), lbl(node, label) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e2.a, l.label FROM edges e2 JOIN lbl l ON l.node = e2.b
            ), comp AS (
                SELECT node, MIN(label) AS m FROM lbl GROUP BY node
            ), asg AS (
                SELECT d.doc_id,
                       CAST(COALESCE(c.m, d.doc_id) AS BIGINT) AS cluster
                FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
            )
            SELECT doc_id, cluster,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, cluster,
                         ('0x' || substr(md5(CAST(cluster AS VARCHAR)),
                                         1, 13))::BIGINT % 100 AS b
                  FROM asg)
        """,
        # same pair + component closure as near_dup_drops, but the
        # representative is the cluster's LONGEST member (max n_chars,
        # min doc_id tiebreak) — verifies keep_best_drop_list_ds's
        # score join + per-cluster argmax end to end
        "near_dup_keep_best": r"""
            WITH RECURSIVE g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, GREATEST(len(ws) - 1,
                                             CASE WHEN len(ws) > 0 THEN 2 ELSE 1 END)),
                           i -> CASE WHEN len(ws) >= 3
                                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                     ELSE array_to_string(ws, ' ') END)) AS gs
                FROM (SELECT doc_id,
                             list_filter(regexp_split_to_array(lower(text), '\s+'),
                                         x -> x <> '') AS ws
                      FROM documents)
            ), e AS (
                SELECT doc_id, UNNEST(gs) AS gram, len(gs) AS n FROM g
            ), inter AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*) AS ni,
                       ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
                FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ), prs AS (
                SELECT pa, pb FROM inter WHERE ni * 1.0 / (na + nb - ni) >= 0.8
            ), edges AS (
                SELECT pa AS a, pb AS b FROM prs UNION SELECT pb, pa FROM prs
            ), lbl(node, label) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e2.a, l.label FROM edges e2 JOIN lbl l ON l.node = e2.b
            ), comp AS (
                SELECT node, MIN(label) AS label FROM lbl GROUP BY node
            ), scored AS (
                SELECT c.node, c.label,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.label
                           ORDER BY d.n_chars DESC, c.node ASC) AS rn
                FROM comp c JOIN documents d ON d.doc_id = c.node
            )
            SELECT node AS doc_id FROM scored WHERE rn > 1
        """,
        # the md5-decorated line fixture rebuilt arithmetically, then
        # C4's line rules (terminal punct, >=3 words, no javascript)
        # and page rules (curly brace / lorem ipsum / >=5 kept lines)
        # applied in SQL — verifies ops.curate.c4_clean bit-for-bit
        "url_canonical": r"""
            -- expected canonical URL rebuilt arithmetically: the
            -- canonicalizer must strip the injected case/port/fragment
            -- mess and sort the shuffled query params
            SELECT doc_id,
                   'https://site' || (doc_id % 37) || '.example.com/p/'
                   || doc_id || '?a=' || (doc_id % 10)
                   || '&b=' || (doc_id % 7) AS url
            FROM documents
        """,
        "url_dedup_first": r"""
            WITH u AS (
                SELECT doc_id, doc_id % 101 AS m FROM documents
            ), w AS (
                SELECT m, MIN(doc_id) AS doc_id FROM u GROUP BY m
            )
            SELECT
                'https://site' || (m % 37) || '.example.com/page/'
                || (m % 61) || '?a=' || (m % 10)
                || '&b=' || (m % 7) AS url,
                doc_id
            FROM w
        """,
        "url_host_stats": r"""
            SELECT 'site' || (doc_id % 37) || '.example.com' AS host,
                   COUNT(*) AS n_docs,
                   SUM(length(text)) AS n_chars
            FROM documents
            GROUP BY 1
        """,
        "host_capped": r"""
            WITH u AS (
                SELECT doc_id,
                       'site' || (doc_id % 37) || '.example.com' AS host,
                       'https://site' || (doc_id % 37) || '.example.com/p/'
                       || doc_id || '?a=' || (doc_id % 10)
                       || '&b=' || (doc_id % 7) AS url
                FROM documents
            ), r AS (
                SELECT doc_id, url,
                       ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS rn
                FROM u
            )
            SELECT doc_id, url FROM r WHERE rn <= 3
        """,
        "mojibake_repair": r"""
            -- expected CLEAN text: the repair must invert the in-plan
            -- cp1252 mis-decode on the corrupted subset (doc_id % 7 = 0,
            -- 'e' -> e-acute) and leave every other doc byte-identical
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN replace(text, 'e', chr(233))
                        ELSE text END AS text
            FROM documents
        """,
        "nfc_normalized": r"""
            -- NFC must recompose the injected 'e' + U+0301 into the
            -- single precomposed codepoint U+00E9
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0
                        THEN replace(text, 'e', chr(233))
                        ELSE text END AS text
            FROM documents
        """,
        "c4_clean": r"""
            WITH ws AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS w
                FROM documents
            ), idx AS (
                SELECT doc_id, w,
                       UNNEST(range(CAST(ceil(len(w) / 7.0) AS BIGINT))) AS j
                FROM ws
            ), dec AS (
                SELECT doc_id, j,
                       CASE substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                       || CAST(j AS VARCHAR)), 1, 1)
                           WHEN 'c' THEN array_to_string(w[(7*j+1):(7*j+7)], ' ') || '?'
                           WHEN 'd' THEN array_to_string(w[(7*j+1):(7*j+7)], ' ')
                           WHEN 'e' THEN 'javascript ' || array_to_string(w[(7*j+1):(7*j+7)], ' ') || '.'
                           WHEN 'f' THEN array_to_string(w[(7*j+1):(7*j+2)], ' ') || '.'
                           ELSE array_to_string(w[(7*j+1):(7*j+7)], ' ') || '.'
                       END AS line
                FROM idx
                UNION ALL
                SELECT doc_id, 1000000 AS j,
                       CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                           WHEN '0' THEN 'lorem ipsum dolor sit amet.'
                           WHEN '1' THEN 'var config = { x: 1 };'
                       END AS line
                FROM documents
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
            ), tot AS (
                SELECT doc_id, COUNT(*) AS n_total,
                       MAX(CASE WHEN contains(line, '{')
                                  OR contains(lower(line), 'lorem ipsum')
                                THEN 1 ELSE 0 END) AS bad
                FROM dec GROUP BY doc_id
            ), kept AS (
                SELECT doc_id, j, trim(line) AS line
                FROM dec
                WHERE substr(trim(line), length(trim(line)), 1)
                          IN ('.', '!', '?', '"')
                  AND len(list_filter(regexp_split_to_array(trim(line), '\s+'),
                                      x -> x <> '')) >= 3
                  AND NOT contains(lower(line), 'javascript')
            )
            SELECT k.doc_id,
                   string_agg(k.line, chr(10) ORDER BY k.j) AS clean_text,
                   COUNT(*) AS n_kept,
                   ANY_VALUE(t.n_total) AS n_total
            FROM kept k JOIN tot t USING (doc_id)
            WHERE t.bad = 0
            GROUP BY k.doc_id
            HAVING COUNT(*) >= 5
        """,
        # RefinedWeb line-level boilerplate: the oracle rebuilds the
        # planted lined fixture (7-word content lines + md5-gated
        # navigation/footer lines) and recomputes line document
        # frequency with COUNT(DISTINCT doc_id) — mirroring the op's
        # per-doc line dedup before the count
        "boilerplate_lines": r"""
            WITH ws AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS w
                FROM documents
            ), dec AS (
                SELECT doc_id, j,
                       array_to_string(w[(7*j+1):(7*j+7)], ' ') AS line
                FROM (SELECT doc_id, w,
                             UNNEST(range(CAST(ceil(len(w) / 7.0) AS BIGINT))) AS j
                      FROM ws)
                UNION ALL
                SELECT doc_id, 1000000 AS j, 'subscribe to our newsletter' AS line
                FROM documents
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                UNION ALL
                SELECT doc_id, 1000001 AS j, 'all rights reserved' AS line
                FROM documents
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
            )
            SELECT line, COUNT(DISTINCT doc_id) AS df
            FROM dec GROUP BY line
            HAVING COUNT(DISTINCT doc_id) >= 100
        """,
        "boilerplate_stripped": r"""
            WITH ws AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS w
                FROM documents
            ), dec AS (
                SELECT doc_id, j,
                       array_to_string(w[(7*j+1):(7*j+7)], ' ') AS line
                FROM (SELECT doc_id, w,
                             UNNEST(range(CAST(ceil(len(w) / 7.0) AS BIGINT))) AS j
                      FROM ws)
                UNION ALL
                SELECT doc_id, 1000000 AS j, 'subscribe to our newsletter' AS line
                FROM documents
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                UNION ALL
                SELECT doc_id, 1000001 AS j, 'all rights reserved' AS line
                FROM documents
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
            ), hot AS (
                SELECT line FROM dec GROUP BY line
                HAVING COUNT(DISTINCT doc_id) >= 100
            ), tot AS (
                SELECT doc_id, COUNT(*) AS n_total FROM dec GROUP BY doc_id
            ), kept AS (
                SELECT doc_id, j, line FROM dec
                WHERE line NOT IN (SELECT line FROM hot)
            )
            SELECT k.doc_id,
                   string_agg(k.line, chr(10) ORDER BY k.j) AS clean_text,
                   ANY_VALUE(t.n_total) - COUNT(*) AS n_removed
            FROM kept k JOIN tot t USING (doc_id)
            GROUP BY k.doc_id
        """,
        # the full distributed dedup chain oracled: exact all-pairs
        # hamming (valid: blocking complete for <=3, no star cap at this
        # scale) -> connected components as a recursive-CTE min-label
        # closure -> drop everything but each component's min id. This
        # makes dup_clusters_ds's label propagation itself SQL-verified.
        "simhash_drops": r"""
            WITH RECURSIVE words AS (
                SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS v
                FROM (SELECT doc_id,
                             UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                                x -> x <> '')) AS w
                      FROM documents)
            ), bits AS (
                SELECT doc_id, k,
                       SUM(CAST((v >> k) & 1 AS BIGINT)) AS ones,
                       COUNT(*) AS n
                FROM words, UNNEST(range(64)) AS t(k)
                GROUP BY doc_id, k
            ), vals AS (
                SELECT doc_id,
                       SUM(CASE WHEN 2 * ones > n THEN (1::HUGEINT << k) ELSE 0 END) AS uval
                FROM bits GROUP BY doc_id
            ), sims AS (
                SELECT d.doc_id,
                       CAST(COALESCE(v.uval, 0) - 9223372036854775808 AS BIGINT) AS simhash
                FROM documents d LEFT JOIN vals v USING (doc_id)
            ), prs AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb
                FROM sims a JOIN sims b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ), edges AS (
                SELECT pa AS a, pb AS b FROM prs UNION SELECT pb, pa FROM prs
            ), lbl(node, label) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e.a, l.label FROM edges e JOIN lbl l ON l.node = e.b
            )
            SELECT node AS doc_id
            FROM (SELECT node, MIN(label) AS m FROM lbl GROUP BY node)
            WHERE m <> node
        """,
        # rolling polynomial min-hash fingerprint, word values as above;
        # HUGEINT keeps the (2^61-1)-mod arithmetic exact.
        "doc_fingerprint": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws0
                FROM documents
            ), padded AS (
                SELECT doc_id,
                       CASE WHEN len(ws0) < 8
                            THEN list_concat(ws0, list_transform(range(8 - len(ws0)),
                                                                 x -> chr(0)))
                            ELSE ws0 END AS ws
                FROM docs
            ), vals AS (
                SELECT doc_id,
                       list_transform(ws, w -> ('0x' || substr(md5(w), 1, 16))::UBIGINT::HUGEINT) AS vs
                FROM padded
            ), wins AS (
                SELECT doc_id,
                       ((((((((((((((vs[i] % 2305843009213693951) * 1000003 + vs[i+1]) % 2305843009213693951)
                          * 1000003 + vs[i+2]) % 2305843009213693951)
                          * 1000003 + vs[i+3]) % 2305843009213693951)
                          * 1000003 + vs[i+4]) % 2305843009213693951)
                          * 1000003 + vs[i+5]) % 2305843009213693951)
                          * 1000003 + vs[i+6]) % 2305843009213693951)
                          * 1000003 + vs[i+7]) % 2305843009213693951 AS h
                FROM vals, UNNEST(range(1, len(vs) - 6)) AS t(i)
            )
            SELECT doc_id, CAST(MIN(h) AS BIGINT) AS fingerprint
            FROM wins GROUP BY doc_id
        """,
        # winnowing: k=4 rolling gram hash (same fold as
        # doc_fingerprint), then per-window-of-5 min with RIGHTMOST
        # position on ties (ROW_NUMBER h ASC, i DESC), distinct picks.
        "winnow_fps": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws0
                FROM documents
            ), padded AS (
                SELECT doc_id,
                       CASE WHEN len(ws0) < 4
                            THEN list_concat(ws0, list_transform(range(4 - len(ws0)),
                                                                 x -> chr(0)))
                            ELSE ws0 END AS ws
                FROM docs
            ), vals AS (
                SELECT doc_id,
                       list_transform(ws, w -> ('0x' || substr(md5(w), 1, 16))::UBIGINT::HUGEINT) AS vs
                FROM padded
            ), grams AS (
                SELECT doc_id, i,
                       ((((((vs[i] % 2305843009213693951) * 1000003 + vs[i+1]) % 2305843009213693951)
                          * 1000003 + vs[i+2]) % 2305843009213693951)
                          * 1000003 + vs[i+3]) % 2305843009213693951 AS h,
                       len(vs) - 3 AS n
                FROM vals, UNNEST(range(1, len(vs) - 2)) AS t(i)
            ), sel AS (
                SELECT doc_id, i, h,
                       ROW_NUMBER() OVER (PARTITION BY doc_id, s
                                          ORDER BY h ASC, i DESC) AS rn
                FROM grams, UNNEST(range(1, greatest(n - 5 + 1, 1) + 1)) AS w(s)
                WHERE i BETWEEN s AND s + 4
            )
            SELECT DISTINCT doc_id, CAST(i - 1 AS BIGINT) AS pos, CAST(h AS BIGINT) AS fp
            FROM sel WHERE rn = 1
        """,
        "winnow_pairs": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws0
                FROM documents
            ), padded AS (
                SELECT doc_id,
                       CASE WHEN len(ws0) < 4
                            THEN list_concat(ws0, list_transform(range(4 - len(ws0)),
                                                                 x -> chr(0)))
                            ELSE ws0 END AS ws
                FROM docs
            ), vals AS (
                SELECT doc_id,
                       list_transform(ws, w -> ('0x' || substr(md5(w), 1, 16))::UBIGINT::HUGEINT) AS vs
                FROM padded
            ), grams AS (
                SELECT doc_id, i,
                       ((((((vs[i] % 2305843009213693951) * 1000003 + vs[i+1]) % 2305843009213693951)
                          * 1000003 + vs[i+2]) % 2305843009213693951)
                          * 1000003 + vs[i+3]) % 2305843009213693951 AS h,
                       len(vs) - 3 AS n
                FROM vals, UNNEST(range(1, len(vs) - 2)) AS t(i)
            ), sel AS (
                SELECT doc_id, i, h,
                       ROW_NUMBER() OVER (PARTITION BY doc_id, s
                                          ORDER BY h ASC, i DESC) AS rn
                FROM grams, UNNEST(range(1, greatest(n - 5 + 1, 1) + 1)) AS w(s)
                WHERE i BETWEEN s AND s + 4
            ), fps AS (
                SELECT DISTINCT doc_id, h AS fp FROM sel WHERE rn = 1
            ), live AS (
                SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 64
            ), pairs AS (
                SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                       COUNT(*) AS n_shared
                FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
                JOIN live l ON l.fp = a.fp
                GROUP BY 1, 2
            )
            SELECT doc_id_a, doc_id_b, CAST(n_shared AS BIGINT) AS n_shared
            FROM pairs WHERE n_shared >= 2
        """,
        "exact_dedup": r"""
            SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_md5,
                   MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS n_dups
            FROM documents
            GROUP BY 1
        """,
        "bpe_pair_counts": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           w -> w <> '')) AS w
                FROM documents
            ), words AS (
                SELECT w, COUNT(*) AS f FROM toks GROUP BY w
            ), idx AS (
                SELECT w, f, unnest(generate_series(1, length(w) - 1)) AS i
                FROM words WHERE length(w) >= 2
            ), pairs AS (
                SELECT substr(w, i, 1) AS left_sym,
                       substr(w, i + 1, 1) AS right_sym,
                       CAST(SUM(f) AS BIGINT) AS freq
                FROM idx GROUP BY 1, 2
            )
            SELECT left_sym, right_sym, freq FROM pairs
            ORDER BY freq DESC, left_sym, right_sym LIMIT 50
        """,
        # byte_bpe_pair_counts: RE2 pre-tokenization (the shared
        # contract pattern — no lookarounds by design), byte->unicode
        # CASE mapping, LEAD pairing within each distinct pre-token,
        # frequency-weighted sums. ASCII corpus => char == byte.
        "byte_bpe_pair_counts": f"""
            WITH toks AS (
                SELECT unnest(regexp_extract_all(text, '{_bbpe_pat}')) AS tok
                FROM documents
            ), tf AS (
                SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok
            ), syms AS (
                SELECT tok, f, i,
                       CASE substr(tok, i, 1) {_bbpe_map_cases}
                            ELSE substr(tok, i, 1) END AS sym
                FROM (SELECT tok, f,
                             unnest(generate_series(1, length(tok))) AS i
                      FROM tf)
            ), pairs AS (
                SELECT f, sym AS left_sym,
                       LEAD(sym) OVER (PARTITION BY tok ORDER BY i)
                           AS right_sym
                FROM syms
            )
            SELECT left_sym, right_sym, CAST(SUM(f) AS BIGINT) AS freq
            FROM pairs WHERE right_sym IS NOT NULL
            GROUP BY 1, 2
            ORDER BY freq DESC, left_sym, right_sym LIMIT 50
        """,
        # wp_pair_stats: the bpe_pair_counts character arithmetic plus
        # per-character totals; ordered by the SAME float64 division
        # the Ray side pre-ranks with (ints emitted, score derived).
        "wp_pair_stats": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           w -> w <> '')) AS w
                FROM documents
            ), words AS (
                SELECT w, COUNT(*) AS f FROM toks GROUP BY w
            ), chars AS (
                SELECT substr(w, i, 1) AS sym, CAST(SUM(f) AS BIGINT) AS sfreq
                FROM (SELECT w, f,
                             unnest(generate_series(1, length(w))) AS i
                      FROM words)
                GROUP BY 1
            ), pairs AS (
                SELECT substr(w, i, 1) AS left_sym,
                       substr(w, i + 1, 1) AS right_sym,
                       CAST(SUM(f) AS BIGINT) AS pair_freq
                FROM (SELECT w, f,
                             unnest(generate_series(1, length(w) - 1)) AS i
                      FROM words WHERE length(w) >= 2)
                GROUP BY 1, 2
            )
            SELECT p.left_sym, p.right_sym, p.pair_freq,
                   l.sfreq AS left_freq, r.sfreq AS right_freq
            FROM pairs p
            JOIN chars l ON l.sym = p.left_sym
            JOIN chars r ON r.sym = p.right_sym
            ORDER BY p.pair_freq / (l.sfreq::DOUBLE * r.sfreq) DESC,
                     p.left_sym, p.right_sym
            LIMIT 50
        """,
        "cm_estimates": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '')) AS w
                FROM documents
            ), counts AS (
                SELECT w, COUNT(*) AS c FROM toks GROUP BY w
            ), rows_ AS (
                SELECT unnest(range(0, 4)) AS j
            ), bucketed AS (
                SELECT j,
                       ('0x' || substr(md5(j::VARCHAR || '|' || w), 1, 8))::UBIGINT
                           % 2048 AS bucket,
                       SUM(c) AS s
                FROM counts, rows_
                GROUP BY 1, 2
            ), q(token) AS (
                VALUES ('data'), ('query'), ('table'), ('merge'),
                       ('zz_absent_token')
            )
            SELECT q.token, CAST(MIN(COALESCE(b.s, 0)) AS BIGINT) AS est
            FROM q
            CROSS JOIN rows_ r
            LEFT JOIN bucketed b
              ON b.j = r.j
             AND b.bucket = ('0x' || substr(md5(r.j::VARCHAR || '|' || q.token), 1, 8))::UBIGINT % 2048
            GROUP BY q.token
        """,
        "dsir_bucket_counts": r"""
            WITH docs AS (
                SELECT source,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), uni AS (
                SELECT source, ws[i] AS tok
                FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(i)
            ), bi AS (
                SELECT source, ws[i] || ' ' || ws[i + 1] AS tok
                FROM docs, UNNEST(range(1, len(ws))) AS t(i)
            ), toks AS (
                SELECT source, tok FROM uni
                UNION ALL
                SELECT source, tok FROM bi
            )
            SELECT CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 4096 AS BIGINT)
                       AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS raw_c,
                   CAST(COUNT(*) FILTER (WHERE source = 'src0') AS BIGINT)
                       AS tgt_c
            FROM toks GROUP BY 1
        """,
        # approx_user_reach: HLL is DETERMINISTIC given the md5 hash —
        # registers (idx = top-14 hash bits, rho = leading zeros of the
        # sentinel-padded remainder + 1, via 65 - length(bin(rest))),
        # then the Flajolet bias-corrected estimate with the
        # linear-counting small-range branch, float chain mirrored.
        "approx_user_reach": r"""
            WITH vals AS (
                SELECT DISTINCT event_type AS g, user_id AS v FROM events
            ), h AS (
                SELECT g,
                       ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 16))::UBIGINT
                           AS h
                FROM vals
            ), parts AS (
                SELECT g, (h >> 50) AS idx,
                       ((h % 1125899906842624::UBIGINT) * 16384::UBIGINT
                        + 16383::UBIGINT) AS rest
                FROM h
            ), regs AS (
                SELECT g, idx, MAX(65 - length(bin(rest))) AS m_j
                FROM parts GROUP BY g, idx
            ), agg AS (
                SELECT g, COUNT(*)::BIGINT AS present,
                       SUM(POWER(2.0, -m_j)) AS s
                FROM regs GROUP BY g
            ), est AS (
                SELECT g, 16384 - present AS zeros,
                       (0.7213 / (1.0 + 1.079 / 16384.0)) * 16384 * 16384
                           / (s + (16384 - present)) AS e0
                FROM agg
            )
            SELECT g AS event_type,
                   CAST(ROUND(CASE WHEN e0 <= 2.5 * 16384 AND zeros > 0
                                   THEN 16384 * LN(CAST(16384 AS DOUBLE) / zeros)
                                   ELSE e0 END) AS BIGINT)
                       AS n_distinct_approx
            FROM est
        """,
        # isotonic_calibration: the PAV pools via the minimax closed
        # form fitted[i] = max_{j<=i} min_{k>=i} avg(j..k) — exact in
        # DOUBLE because distinct rational rates (denominators <= N)
        # differ by >= 1/N^2, far above double eps, so min/max pick the
        # true rational extremes and level sets group exactly. O(B^2)
        # pair rows over the bounded bin table (B = distinct bins).
        "isotonic_calibration": r"""
            WITH hist AS (
                SELECT CAST(ROUND((n_chars / 4000.0) * 10000) AS BIGINT)
                           AS bin,
                       COUNT(*)::BIGINT AS n,
                       SUM(CASE WHEN text LIKE '%data%' THEN 1 ELSE 0
                           END)::BIGINT AS pos
                FROM documents GROUP BY 1
            ), ord AS (
                SELECT bin, n, pos,
                       ROW_NUMBER() OVER (ORDER BY bin) AS r,
                       SUM(n) OVER (ORDER BY bin) AS cn,
                       SUM(pos) OVER (ORDER BY bin) AS cp
                FROM hist
            ), pairs AS (
                SELECT j.r AS jr, k.r AS kr,
                       CAST(k.cp - j.cp + j.pos AS DOUBLE)
                           / (k.cn - j.cn + j.n) AS a
                FROM ord j JOIN ord k ON j.r <= k.r
            ), sm AS (
                SELECT jr, kr,
                       MIN(a) OVER (PARTITION BY jr ORDER BY kr DESC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS m
                FROM pairs
            ), fitted AS (
                SELECT kr, MAX(m) AS fit FROM sm GROUP BY kr
            ), seg AS (
                SELECT f.fit, MIN(o.bin) AS bin_lo, MAX(o.bin) AS bin_hi,
                       SUM(o.n)::BIGINT AS n, SUM(o.pos)::BIGINT AS pos
                FROM fitted f JOIN ord o ON o.r = f.kr
                GROUP BY f.fit
            )
            SELECT bin_lo, bin_hi, n, pos,
                   CAST((1000000 * pos) // n AS BIGINT) AS rate_micro
            FROM seg
        """,
        # kn_perplexity: every KN statistic is an exact integer over the
        # trigram TYPE table (c12/N3 per context, continuation counts
        # N1/MT/TY, unigram continuation Nc, bigram-type total B); the
        # interpolation float chain mirrors ops/kneser term-for-term
        # (left-assoc * and /), -LOG2 per type, ROUND(AVG, 6) per doc —
        # the lm_quality/ccnet float discipline.
        "kn_perplexity": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), dtri AS (
                SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3
                FROM docs, UNNEST(range(1, len(ws) - 1)) AS t(i)
            ), tri AS (
                SELECT w1, w2, w3, COUNT(*)::BIGINT AS c
                FROM dtri GROUP BY 1, 2, 3
            ), c12 AS (
                SELECT w1, w2, SUM(c)::BIGINT AS c12, COUNT(*)::BIGINT AS n3
                FROM tri GROUP BY 1, 2
            ), n1 AS (
                SELECT w2, w3, COUNT(*)::BIGINT AS n1 FROM tri GROUP BY 1, 2
            ), mid AS (
                SELECT w2, SUM(n1)::BIGINT AS mt, COUNT(*)::BIGINT AS ty
                FROM n1 GROUP BY 1
            ), cont AS (
                SELECT w3, COUNT(*)::BIGINT AS nc FROM n1 GROUP BY 1
            ), bt AS (
                SELECT COUNT(*)::BIGINT AS b FROM n1
            ), ptype AS (
                SELECT t.w1, t.w2, t.w3,
                       -LOG2(GREATEST(t.c - 0.75, 0.0) / j.c12
                             + 0.75 * j.n3 / j.c12
                               * (GREATEST(k.n1 - 0.75, 0.0) / m.mt
                                  + 0.75 * m.ty / m.mt
                                    * (o.nc / (SELECT b FROM bt))))
                           AS bits
                FROM tri t
                JOIN c12 j ON j.w1 = t.w1 AND j.w2 = t.w2
                JOIN n1 k ON k.w2 = t.w2 AND k.w3 = t.w3
                JOIN mid m ON m.w2 = t.w2
                JOIN cont o ON o.w3 = t.w3
            )
            SELECT d.doc_id, ROUND(AVG(p.bits), 6) AS bits_per_trigram
            FROM dtri d
            JOIN ptype p ON p.w1 = d.w1 AND p.w2 = d.w2 AND p.w3 = d.w3
            GROUP BY d.doc_id
        """,
        # dsir_weights: rebuild the bucket counts, quantize the add-one
        # smoothed per-bucket log-ratio to 1e-8 int units (DuckDB LN is
        # pinned bit-equal to Python math.log on this platform —
        # NOTES_r4; the op uses math.log for exactly this reason), sum
        # ints per doc, mirror the final ROUND(x/1e8, 6) float chain.
        "dsir_weights": r"""
            WITH docs AS (
                SELECT doc_id, source,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), uni AS (
                SELECT doc_id, source, ws[i] AS tok
                FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(i)
            ), bi AS (
                SELECT doc_id, source, ws[i] || ' ' || ws[i + 1] AS tok
                FROM docs, UNNEST(range(1, len(ws))) AS t(i)
            ), occ AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 4096
                            AS BIGINT) AS bucket,
                       source
                FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
            ), cnt AS (
                SELECT bucket, COUNT(*)::BIGINT AS raw_c,
                       COUNT(*) FILTER (WHERE source = 'src0')::BIGINT AS tgt_c
                FROM occ GROUP BY bucket
            ), tot AS (
                SELECT SUM(raw_c)::BIGINT AS R, SUM(tgt_c)::BIGINT AS T
                FROM cnt
            ), lam AS (
                SELECT bucket,
                       CAST(ROUND(((LN(tgt_c + 1.0) - LN(T + 4096))
                                   - (LN(raw_c + 1.0) - LN(R + 4096)))
                                  * 100000000) AS BIGINT) AS lam_int
                FROM cnt, tot
            ), per_doc AS (
                SELECT o.doc_id, SUM(l.lam_int)::BIGINT AS units
                FROM occ o JOIN lam l ON l.bucket = o.bucket
                GROUP BY o.doc_id
            )
            SELECT d.doc_id,
                   ROUND(CAST(COALESCE(p.units, 0) AS DOUBLE) / 100000000, 6)
                       AS logw
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN per_doc p ON p.doc_id = d.doc_id
        """,
        # dsir_selected: the dsir_weights chain + the deterministic
        # md5-Gumbel key (u = (CAST md5-prefix AS DOUBLE + 0.5)/2^64,
        # g = -LN(-LN(u)) — LN pinned; the op mirrors with math.log),
        # ordered by the RAW key, emitted at 6 dp.
        "dsir_selected": r"""
            WITH docs AS (
                SELECT doc_id, source,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), uni AS (
                SELECT doc_id, source, ws[i] AS tok
                FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(i)
            ), bi AS (
                SELECT doc_id, source, ws[i] || ' ' || ws[i + 1] AS tok
                FROM docs, UNNEST(range(1, len(ws))) AS t(i)
            ), occ AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 4096
                            AS BIGINT) AS bucket,
                       source
                FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
            ), cnt AS (
                SELECT bucket, COUNT(*)::BIGINT AS raw_c,
                       COUNT(*) FILTER (WHERE source = 'src0')::BIGINT AS tgt_c
                FROM occ GROUP BY bucket
            ), tot AS (
                SELECT SUM(raw_c)::BIGINT AS R, SUM(tgt_c)::BIGINT AS T
                FROM cnt
            ), lam AS (
                SELECT bucket,
                       CAST(ROUND(((LN(tgt_c + 1.0) - LN(T + 4096))
                                   - (LN(raw_c + 1.0) - LN(R + 4096)))
                                  * 100000000) AS BIGINT) AS lam_int
                FROM cnt, tot
            ), per_doc AS (
                SELECT o.doc_id, SUM(l.lam_int)::BIGINT AS units
                FROM occ o JOIN lam l ON l.bucket = o.bucket
                GROUP BY o.doc_id
            ), weights AS (
                SELECT d.doc_id,
                       ROUND(CAST(COALESCE(p.units, 0) AS DOUBLE)
                             / 100000000, 6) AS logw
                FROM (SELECT DISTINCT doc_id FROM documents) d
                LEFT JOIN per_doc p ON p.doc_id = d.doc_id
            ), keyed AS (
                SELECT doc_id, logw,
                       logw + (-LN(-LN(
                           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                 1, 16))::UBIGINT
                                 AS DOUBLE) + 0.5)
                           / 18446744073709551616.0))) AS rawkey
                FROM weights
            )
            SELECT doc_id, logw, ROUND(rawkey, 6) AS key
            FROM keyed ORDER BY rawkey DESC, doc_id ASC LIMIT 100
        """,
        "logreg_grad0": r"""
            WITH q AS (
                SELECT doc_id,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
                           AS n_words,
                       CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
                           AS sum_word_len,
                       CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT)
                           AS n_punct,
                       CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT)
                           AS n_stopwords,
                       CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                x -> x IN ('the','and','of','to','is','in','that','it','for','with'))) AS BIGINT)
                           AS n_en_markers,
                       CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS s
                FROM documents
            )
            SELECT 'bias' AS feature, CAST(SUM(s) AS BIGINT) AS grad2x FROM q
            UNION ALL
            SELECT 'n_words', CAST(SUM(s * n_words) AS BIGINT) FROM q
            UNION ALL
            SELECT 'sum_word_len', CAST(SUM(s * sum_word_len) AS BIGINT) FROM q
            UNION ALL
            SELECT 'n_punct', CAST(SUM(s * n_punct) AS BIGINT) FROM q
            UNION ALL
            SELECT 'n_stopwords', CAST(SUM(s * n_stopwords) AS BIGINT) FROM q
            UNION ALL
            SELECT 'n_en_markers', CAST(SUM(s * n_en_markers) AS BIGINT) FROM q
        """,
        "unigram_seed_counts": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           w -> w <> '')) AS w
                FROM documents
            ), words AS (
                SELECT w, COUNT(*) AS f FROM toks GROUP BY w
            ), starts AS (
                SELECT w, f, unnest(generate_series(1, length(w))) AS i
                FROM words
            ), pieces AS (
                SELECT substr(w, i, L) AS piece,
                       CAST(SUM(f) AS BIGINT) AS freq
                FROM starts, UNNEST(generate_series(1, 4)) AS t(L)
                WHERE i + L - 1 <= length(w)
                GROUP BY 1
            )
            SELECT piece, freq FROM pieces
            ORDER BY freq DESC, piece LIMIT 50
        """,
        "vocab_encode": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), cnt AS (
                SELECT w, COUNT(*) AS c
                FROM (SELECT UNNEST(ws) AS w FROM docs) GROUP BY w
            ), vocab AS (
                SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS id
                FROM cnt
                QUALIFY id <= 20
            ), tok AS (
                SELECT doc_id, i - 1 AS pos, ws[i] AS w
                FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(i)
            )
            SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS token_id
            FROM tok t LEFT JOIN vocab v USING (w)
        """,
        "lang_confusion": r"""
            WITH words AS (
                SELECT doc_id, lower(w) AS w
                FROM documents,
                     UNNEST(regexp_extract_all(text, '[a-zA-Zäöüéèêàçñ]+')) AS t(w)
            ), hits AS (
                SELECT doc_id,
                       COUNT(*) FILTER (WHERE w IN ('der','die','das','und','ist','nicht','ein','mit','für','von')) AS h_de,
                       COUNT(*) FILTER (WHERE w IN ('the','and','of','to','is','in','that','it','for','with')) AS h_en,
                       COUNT(*) FILTER (WHERE w IN ('el','la','los','las','es','un','una','para','que','con')) AS h_es,
                       COUNT(*) FILTER (WHERE w IN ('le','la','les','et','est','un','une','pour','que','dans')) AS h_fr
                FROM words GROUP BY doc_id
            ), pred AS (
                SELECT d.doc_id,
                       CASE WHEN regexp_matches(d.text, '[一-鿿]') THEN 'zh'
                            WHEN COALESCE(GREATEST(h_de, h_en, h_es, h_fr), 0) = 0 THEN 'und'
                            WHEN h_de = GREATEST(h_de, h_en, h_es, h_fr) THEN 'de'
                            WHEN h_en = GREATEST(h_de, h_en, h_es, h_fr) THEN 'en'
                            WHEN h_es = GREATEST(h_de, h_en, h_es, h_fr) THEN 'es'
                            ELSE 'fr' END AS predicted
                FROM documents d LEFT JOIN hits h USING (doc_id)
            )
            SELECT d.lang AS declared, p.predicted, COUNT(*) AS n_docs
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY 1, 2
        """,
        "shared_gram_pairs": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), g AS (
                SELECT DISTINCT doc_id,
                       array_to_string(list_slice(ws, i, i + 3), ' ') AS gram
                FROM docs, UNNEST(range(1, len(ws) - 2)) AS t(i)
            ), rare AS (
                SELECT gram FROM (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
                WHERE df BETWEEN 2 AND 8
            )
            SELECT g1.doc_id AS doc_a, g2.doc_id AS doc_b,
                   COUNT(*) AS shared_grams
            FROM g g1 JOIN g g2 USING (gram) JOIN rare USING (gram)
            WHERE g1.doc_id < g2.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        """,
        "doc_novelty": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), g AS (
                SELECT DISTINCT doc_id,
                       array_to_string(list_slice(ws, i, i + 2), ' ') AS gram
                FROM docs, UNNEST(range(1, len(ws) - 1)) AS t(i)
            ), dfreq AS (
                SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
            )
            SELECT g.doc_id, COUNT(*) AS n_grams,
                   SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS n_unique,
                   ROUND(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1.0
                         / COUNT(*), 6) AS novelty
            FROM g JOIN dfreq d USING (gram)
            GROUP BY g.doc_id
        """,
        "lexical_diversity": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), cnt AS (
                SELECT doc_id, w, COUNT(*) AS c
                FROM (SELECT doc_id, UNNEST(ws) AS w FROM docs)
                GROUP BY doc_id, w
            ), agg AS (
                SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct,
                       SUM(c * LOG2(c)) AS sclc
                FROM cnt GROUP BY doc_id
            )
            SELECT doc_id, CAST(n AS BIGINT) AS n_words, n_distinct,
                   ROUND(LOG2(n) - sclc / n, 6) AS entropy_bits,
                   ROUND(n_distinct * 1.0 / n, 6) AS ttr
            FROM agg
        """,
        "pmi_collocations": r"""
            WITH docs AS (
                SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), uni AS (
                SELECT w, COUNT(*) AS cx
                FROM (SELECT UNNEST(ws) AS w FROM docs) GROUP BY w
            ), nu AS (SELECT SUM(cx) AS nu FROM uni),
            bi AS (
                SELECT ws[i] AS x, ws[i+1] AS y, COUNT(*) AS c_xy
                FROM docs, UNNEST(range(1, len(ws))) AS t(i)
                GROUP BY 1, 2
                HAVING COUNT(*) >= 5
            ), nb AS (SELECT SUM(GREATEST(len(ws) - 1, 0)) AS nb FROM docs)
            SELECT b.x, b.y, b.c_xy,
                   ROUND(LN(b.c_xy) + 2.0 * LN(nu.nu) - LN(nb.nb)
                         - LN(ux.cx) - LN(uy.cx), 6) AS pmi
            FROM bi b
            JOIN uni ux ON ux.w = b.x
            JOIN uni uy ON uy.w = b.y
            CROSS JOIN nu CROSS JOIN nb
            ORDER BY pmi DESC, b.x, b.y
            LIMIT 50
        """,
        "heavy_tokens": r"""
            WITH words AS (
                SELECT UNNEST(list_filter(
                    regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
                FROM documents
            ), tot AS (SELECT COUNT(*) AS n FROM words)
            SELECT w AS token, COUNT(*) AS n_occurrences
            FROM words
            GROUP BY w
            HAVING COUNT(*) >= (SELECT 0.01 * n FROM tot)
        """,
        "snapshot_diff": r"""
            WITH fp AS (
                SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
                FROM documents
            ),
            base AS (SELECT DISTINCT h FROM fp WHERE doc_id % 2 = 0),
            new AS (SELECT DISTINCT h FROM fp WHERE doc_id % 3 <> 0)
            SELECT COALESCE(b.h, n.h) AS content_md5,
                   CASE WHEN b.h IS NULL THEN 'added' ELSE 'removed' END AS status
            FROM base b FULL OUTER JOIN new n ON b.h = n.h
            WHERE b.h IS NULL OR n.h IS NULL
        """,
        "incremental_dedup": r"""
            WITH fp AS (
                SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_md5
                FROM documents
            ), base AS (
                SELECT DISTINCT content_md5 FROM fp WHERE doc_id % 2 = 0
            )
            SELECT MIN(doc_id) AS doc_id, content_md5
            FROM fp
            WHERE content_md5 NOT IN (SELECT content_md5 FROM base)
            GROUP BY content_md5
        """,
        # the paper's exact contract: candidates = top-4 by (cos DESC,
        # tgt ASC); mx/my = 6dp means over those; ratio margin re-rounded;
        # argmax per source with (margin DESC, cos DESC, tgt ASC) ties.
        # Ray emits the identical 6dp operands (see ops/bitext.py emit
        # discipline), so the value-hash matches bit-for-bit.
        "margin_mined_pairs": """
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, label % 2 AS side
                       FROM embeddings),
            x AS (SELECT vec_id, e FROM v WHERE side = 0),
            y AS (SELECT vec_id, e FROM v WHERE side = 1),
            xy AS (SELECT x.vec_id AS src_id, y.vec_id AS tgt_id,
                          ROUND(list_cosine_similarity(x.e, y.e), 6) AS cos
                   FROM x, y),
            ck AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS rn
                   FROM xy) WHERE rn <= 4),
            mx AS (SELECT src_id, ROUND(AVG(cos), 6) AS mx FROM ck GROUP BY src_id),
            yk AS (SELECT * FROM (SELECT src_id, tgt_id, cos, ROW_NUMBER() OVER (
                       PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS rn
                   FROM xy) WHERE rn <= 4),
            my AS (SELECT tgt_id, ROUND(AVG(cos), 6) AS my FROM yk GROUP BY tgt_id),
            m AS (SELECT c.src_id, c.tgt_id, c.cos,
                         ROUND(c.cos / ((mx.mx + my.my) / 2), 6) AS margin
                  FROM ck c JOIN mx USING (src_id) JOIN my USING (tgt_id)),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                      ORDER BY margin DESC, cos DESC, tgt_id) AS rn FROM m)
            SELECT src_id, tgt_id, cos, margin FROM r WHERE rn = 1 AND margin >= 1.0
        """,
        "embedding_dups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        """,
        "dup_spans": r"""
            WITH words AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            vals AS (
                SELECT doc_id,
                       list_transform(ws, w ->
                           ('0x' || substr(md5(w), 1, 16))::UBIGINT::HUGEINT
                               % 2305843009213693951) AS vs,
                       len(ws) AS n
                FROM words
            ),
            wins AS (
                SELECT doc_id, i.i AS pos,
                       list_reduce(vs[i.i : i.i + 15],
                                   (a, b) -> (a * 1000003 + b) % 2305843009213693951) AS h
                FROM vals, LATERAL (SELECT unnest(range(1, n - 14)) AS i) i
            ),
            dups AS (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, pos,
                           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
                    FROM wins
                ) WHERE rn > 1
            ),
            iv AS (SELECT doc_id, pos AS s, pos + 15 AS e FROM dups),
            flag AS (
                SELECT doc_id, s, e,
                       CASE WHEN s <= MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                            THEN 0 ELSE 1 END AS new_grp
                FROM iv
            ),
            grp AS (
                SELECT doc_id, s, e,
                       SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY s, e) AS g
                FROM flag
            )
            SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end
            FROM grp GROUP BY doc_id, g
        """,
        # dup_spans_exact: SAME oracle — the prefix-doubling twin must
        # reproduce the rolling-hash op byte-for-byte
        "dup_spans_exact": r"""
            WITH words AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            vals AS (
                SELECT doc_id,
                       list_transform(ws, w ->
                           ('0x' || substr(md5(w), 1, 16))::UBIGINT::HUGEINT
                               % 2305843009213693951) AS vs,
                       len(ws) AS n
                FROM words
            ),
            wins AS (
                SELECT doc_id, i.i AS pos,
                       list_reduce(vs[i.i : i.i + 15],
                                   (a, b) -> (a * 1000003 + b) % 2305843009213693951) AS h
                FROM vals, LATERAL (SELECT unnest(range(1, n - 14)) AS i) i
            ),
            dups AS (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, pos,
                           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
                    FROM wins
                ) WHERE rn > 1
            ),
            iv AS (SELECT doc_id, pos AS s, pos + 15 AS e FROM dups),
            flag AS (
                SELECT doc_id, s, e,
                       CASE WHEN s <= MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                            THEN 0 ELSE 1 END AS new_grp
                FROM iv
            ),
            grp AS (
                SELECT doc_id, s, e,
                       SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY s, e) AS g
                FROM flag
            )
            SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end
            FROM grp GROUP BY doc_id, g
        """,
        "pack_offsets": r"""
            WITH toks AS (
                SELECT doc_id,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
                           AS n_tokens
                FROM documents
            )
            SELECT doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset,
                   COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000 AS shard_id
            FROM toks
        """,
        "source_mix": r"""
            WITH weights(source, w) AS (VALUES ('src1', 4), ('src2', 2), ('src3', 1), ('src5', 1)),
            n AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY 1),
            j AS (SELECT w.source, w.w::HUGEINT AS w, n.ns::HUGEINT AS ns
                  FROM weights w JOIN n USING (source)),
            m AS (  -- binding source: exact-fraction argmin of ns/w, tie to name
                SELECT * FROM j j1
                WHERE NOT EXISTS (
                    SELECT 1 FROM j j2
                    WHERE j2.ns * j1.w < j1.ns * j2.w
                       OR (j2.ns * j1.w = j1.ns * j2.w AND j2.source < j1.source)
                )
            ),
            t AS (
                SELECT j.source, (4294967296::HUGEINT * j.w * m.ns) // (m.w * j.ns) AS thr
                FROM j, m
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN t ON d.source = t.source
            WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::UBIGINT::HUGEINT < t.thr
        """,
        "nb_classify": r"""
            WITH words AS (
                SELECT doc_id, lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
                FROM documents WHERE trim(text) <> ''
            ),
            counts AS (
                SELECT lang AS label, w, COUNT(*)::DOUBLE AS c
                FROM words WHERE w <> '' GROUP BY 1, 2
            ),
            vocab_n AS (SELECT COUNT(DISTINCT w) AS v FROM counts),
            class_tot AS (SELECT label, SUM(c) AS tot FROM counts GROUP BY 1),
            priors AS (SELECT lang AS label, COUNT(*)::DOUBLE AS n FROM documents GROUP BY 1),
            total AS (SELECT SUM(n) AS nn FROM priors),
            pair AS (
                SELECT dw.doc_id, ct.label,
                       SUM(ln((COALESCE(c.c, 0) + 1) / (ct.tot + vn.v))) AS s
                FROM (SELECT doc_id, w FROM words WHERE w <> '') dw
                CROSS JOIN class_tot ct
                CROSS JOIN vocab_n vn
                LEFT JOIN counts c ON c.label = ct.label AND c.w = dw.w
                GROUP BY 1, 2
            ),
            scored AS (
                SELECT d.doc_id, p.label,
                       ROUND(ln(p.n / t.nn) + COALESCE(pr.s, 0), 6) AS nb_score
                FROM documents d
                CROSS JOIN priors p CROSS JOIN total t
                LEFT JOIN pair pr ON pr.doc_id = d.doc_id AND pr.label = p.label
            )
            SELECT doc_id, label AS nb_label, nb_score FROM scored
            QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY nb_score DESC, label ASC) = 1
        """,
        "kmeans_clusters": _kmeans_cte(8, 2) + "\nSELECT vec_id, cluster FROM assign",
        "semantic_dedup": _kmeans_cte(8, 2)
        + """,
            drops AS (
                SELECT DISTINCT a.vec_id
                FROM assign a
                JOIN assign b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
                JOIN embeddings ea ON ea.vec_id = a.vec_id
                JOIN embeddings eb ON eb.vec_id = b.vec_id
                WHERE ROUND(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) >= 0.35
            )
            SELECT s.vec_id, s.cluster,
                   CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
            FROM assign s LEFT JOIN drops d USING (vec_id)
        """,
        "ann_topk": """
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                   ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score
            FROM embeddings e, embeddings q
            WHERE q.vec_id < 8
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY q.vec_id
                ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) DESC,
                         e.vec_id ASC
            ) <= 10
        """,
        # knn_classify: leave-one-out kNN vote — neighbor rank
        # (round6 score DESC, nid ASC) and vote tie-break
        # (votes DESC, label ASC) mirror ops/ann.knn_classify verbatim.
        "knn_classify": """
            WITH sims AS (
                SELECT q.vec_id AS vec_id, q.label AS true_label,
                       e.vec_id AS nid, e.label AS nlabel,
                       ROUND(list_cosine_similarity(
                           e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
                           AS score
                FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            ), knn AS (
                SELECT * FROM sims
                QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY score DESC, nid ASC) <= 10
            ), votes AS (
                SELECT vec_id, true_label, nlabel AS pred_label,
                       CAST(COUNT(*) AS BIGINT) AS votes
                FROM knn GROUP BY vec_id, true_label, nlabel
            )
            SELECT vec_id, CAST(pred_label AS BIGINT) AS pred_label, votes,
                   CAST(true_label AS BIGINT) AS true_label,
                   CAST(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END
                        AS BIGINT) AS correct
            FROM votes
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY votes DESC, pred_label ASC) = 1
        """,
        # pca_scatter: the PCA moment exchange — raw sums per dimension
        # pair, rebuilt by 1-based list indexing over the embedding.
        "pca_scatter": """
            WITH dims AS (SELECT UNNEST(range(64)) AS i),
            x AS (SELECT embedding::DOUBLE[] AS e FROM embeddings)
            SELECT d1.i AS i, d2.i AS j,
                   ROUND(SUM(e[d1.i + 1] * e[d2.i + 1]), 6) AS sxx,
                   ROUND(SUM(e[d1.i + 1]), 6) AS si,
                   ROUND(SUM(e[d2.i + 1]), 6) AS sj
            FROM x, dims d1, dims d2
            GROUP BY d1.i, d2.i
        """,
        # media_metadata: the Ray side sniffs REAL container bytes; the
        # generator (synth_files.real_media_table) parametrizes every
        # header field as modular arithmetic of the row index, so the
        # expected table is SQL-buildable from the same arithmetic —
        # the sniffer must recover exactly what the writers encoded.
        "media_metadata": r"""
            WITH nn AS (
                SELECT GREATEST(200, LEAST(2000, COUNT(*)))::BIGINT AS n
                FROM documents
            ), idx AS (
                SELECT UNNEST(range((SELECT n FROM nn))) AS i
            )
            SELECT 'media://real/' || i AS media_ref,
                   CASE i % 8 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
                              WHEN 2 THEN 'audio/wav'
                              WHEN 5 THEN 'image/bmp'
                              WHEN 6 THEN 'image/tiff'
                              WHEN 7 THEN 'image/webp'
                              ELSE 'image/jpeg'
                   END AS mime,
                   CASE i % 8 WHEN 0 THEN 16 + (i % 5) * 8
                              WHEN 1 THEN 8 + (i % 4) * 4
                              WHEN 2 THEN -1
                              WHEN 5 THEN 12 + (i % 4) * 4
                              WHEN 6 THEN 14 + (i % 3) * 6
                              WHEN 7 THEN 20 + (i % 5) * 10
                              ELSE 32 + (i % 3) * 16 END AS width,
                   CASE i % 8 WHEN 0 THEN 16 + (i % 3) * 8
                              WHEN 1 THEN 8 + (i % 2) * 4
                              WHEN 2 THEN -1
                              WHEN 5 THEN 10 + (i % 3) * 4
                              WHEN 6 THEN 9 + (i % 4) * 3
                              WHEN 7 THEN 15 + (i % 2) * 5
                              ELSE 24 + (i % 2) * 8 END AS height,
                   CASE i % 8 WHEN 2 THEN 1 ELSE -1 END AS channels,
                   CASE i % 8 WHEN 2 THEN 8000 ELSE -1 END AS sample_rate,
                   CASE i % 8 WHEN 2 THEN 50 + (i % 5) * 25 ELSE -1 END
                       AS duration_ms
            FROM idx
        """,
        # media_frames: the Ray side decodes REAL animated-GIF bytes
        # (from-scratch LZW + palette + interlace + disposal); the
        # fixture frames are arithmetic (synth_gif_frames: pixel =
        # (y*3 + x*7 + phase*5) % 256, phase = (md5-digest-byte[fi%16]
        # + 17*fi) % 251), so the oracle rebuilds the sampled frame
        # means exactly — integer pixel sums are exact in any order,
        # one mirrored division + ROUND 6
        "media_frames": r"""
            WITH m AS (
                SELECT i,
                       2 + (i % 7) AS n,
                       16 + (i % 4) * 8 AS w,
                       12 + (i % 3) * 6 AS h,
                       md5('gif:' || i) AS hx
                FROM (SELECT UNNEST(range(200)) AS i)
            ), f AS (
                SELECT m.i, m.n, m.w, m.h, m.hx,
                       (t.j * m.n) // LEAST(4, m.n) AS fi
                FROM m, UNNEST(range(LEAST(4, m.n))) AS t(j)
            ), ph AS (
                SELECT i, w, h, fi,
                       ((('0x' || substr(hx, 2 * (fi % 16) + 1, 2))::BIGINT
                         + 17 * fi) % 251) AS phase
                FROM f
            ), s AS (
                SELECT i, fi, w, h,
                       SUM((y * 3 + x * 7 + phase * 5) % 256) AS sp
                FROM ph, UNNEST(range(ph.h)) AS ty(y),
                         UNNEST(range(ph.w)) AS tx(x)
                GROUP BY i, fi, w, h
            )
            SELECT 'media://vid/' || i AS media_ref,
                   CAST(fi AS BIGINT) AS frame_index,
                   ROUND(CAST(sp AS DOUBLE) / (w * h), 6) AS frame_mean
            FROM s
        """,
        # audio_features: the Ray side decodes REAL WAV bytes; the
        # generator writes exact-integer square waves (+ silence), so
        # the oracle regenerates sample SIGNS arithmetically and
        # recomputes RMS/ZCR/duration as exact rationals.
        "audio_features": r"""
            WITH idx AS (
                SELECT UNNEST(range(200)) AS i
            ), sil AS (
                SELECT 'media://aud/' || i AS media_ref,
                       0.0 AS rms, 0.0 AS zcr,
                       (100 + (i % 7) * 50)::BIGINT AS duration_ms,
                       TRUE AS real_decode
                FROM idx WHERE i % 4 = 0
            ), sq AS (
                SELECT i,
                       (6000 + (i % 5) * 1500)::BIGINT AS amp,
                       (200 + 50 * (i % 8))::BIGINT AS freq,
                       (80 + (i % 5) * 40)::BIGINT AS dur
                FROM idx WHERE i % 4 <> 0
            ), samp AS (
                SELECT sq.i, sq.amp, sq.dur, t.j,
                       ((t.j * 2 * sq.freq) // 8000) % 2 AS phase
                FROM sq, UNNEST(range(8 * sq.dur)) AS t(j)
            ), flips AS (
                SELECT i, amp, dur,
                       SUM(CASE WHEN phase <> prev THEN 1 ELSE 0 END) AS n_flips,
                       COUNT(*) AS n
                FROM (
                    SELECT i, amp, dur, phase,
                           LAG(phase) OVER (PARTITION BY i ORDER BY j) AS prev
                    FROM samp
                )
                WHERE prev IS NOT NULL
                GROUP BY i, amp, dur
            )
            SELECT 'media://aud/' || i AS media_ref,
                   ROUND(amp / 32768.0, 6) AS rms,
                   ROUND(CAST(n_flips AS DOUBLE) / n, 6) AS zcr,
                   dur AS duration_ms,
                   TRUE AS real_decode
            FROM flips
            UNION ALL
            SELECT * FROM sil
        """,
        # planted-neighbor ANN recall oracles: the fixture is built so
        # the EXACT top-10 per query is {base} + its 9 scaled copies at
        # rounded cosine 1.0 (fillers provably below) — the approximate
        # probes must therefore return exactly this arithmetic table.
        "ivf_recall_planted": r"""
            WITH q AS (SELECT UNNEST(range(4)) AS b),
                 c AS (SELECT UNNEST(range(9)) AS c)
            SELECT b::BIGINT AS query_id, vec_id, 1.0 AS score FROM (
                SELECT b, b::BIGINT AS vec_id FROM q
                UNION ALL
                SELECT b, (4 + b * 9 + c)::BIGINT FROM q, c
            )
        """,
        "lsh_recall_planted": r"""
            WITH q AS (SELECT UNNEST(range(4)) AS b),
                 c AS (SELECT UNNEST(range(9)) AS c)
            SELECT b::BIGINT AS query_id, vec_id, 1.0 AS score FROM (
                SELECT b, b::BIGINT AS vec_id FROM q
                UNION ALL
                SELECT b, (4 + b * 9 + c)::BIGINT FROM q, c
            )
        """,
        "hnsw_recall_planted": r"""
            WITH q AS (SELECT UNNEST(range(4)) AS b),
                 c AS (SELECT UNNEST(range(9)) AS c)
            SELECT b::BIGINT AS query_id, vec_id, 1.0 AS score FROM (
                SELECT b, b::BIGINT AS vec_id FROM q
                UNION ALL
                SELECT b, (4 + b * 9 + c)::BIGINT FROM q, c
            )
        """,
        # ccnet_buckets: lang_id argmax CTE + the pruned bigram-LM CTE +
        # integer-arithmetic tercile positions ((n+2)//3, (2n+2)//3 =
        # ceil) over ROW_NUMBER — the group_quantiles exactness contract.
        "ccnet_buckets": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), uni AS (
                SELECT w, COUNT(*) AS c
                FROM (SELECT UNNEST(ws) AS w FROM docs) GROUP BY w
            ), v AS (SELECT COUNT(*) AS v FROM uni),
            bi AS (
                SELECT w1, w2, COUNT(*) AS c FROM (
                    SELECT ws[i] AS w1, ws[i+1] AS w2
                    FROM docs, UNNEST(range(1, len(ws))) AS t(i))
                GROUP BY w1, w2
                HAVING COUNT(*) >= 2
            ), docbi AS (
                SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
                FROM docs, UNNEST(range(1, len(ws))) AS t(i)
            ), scores AS (
                SELECT d.doc_id,
                       ROUND(AVG(-LOG2((COALESCE(b.c, 0) + 1.0) / (u.c + v.v))), 6)
                           AS bits_per_bigram
                FROM docbi d
                JOIN uni u ON u.w = d.w1
                LEFT JOIN bi b ON b.w1 = d.w1 AND b.w2 = d.w2
                CROSS JOIN v
                GROUP BY d.doc_id
            ), lwords AS (
                SELECT doc_id, lower(w) AS w
                FROM documents,
                     UNNEST(regexp_extract_all(text, '[a-zA-Zäöüéèêàçñ]+')) AS t(w)
            ), hits AS (
                SELECT doc_id,
                       COUNT(*) FILTER (WHERE w IN ('der','die','das','und','ist','nicht','ein','mit','für','von')) AS h_de,
                       COUNT(*) FILTER (WHERE w IN ('the','and','of','to','is','in','that','it','for','with')) AS h_en,
                       COUNT(*) FILTER (WHERE w IN ('el','la','los','las','es','un','una','para','que','con')) AS h_es,
                       COUNT(*) FILTER (WHERE w IN ('le','la','les','et','est','un','une','pour','que','dans')) AS h_fr
                FROM lwords GROUP BY doc_id
            ), lang AS (
                SELECT d.doc_id,
                       CASE WHEN regexp_matches(d.text, '[一-鿿]') THEN 'zh'
                            WHEN COALESCE(GREATEST(h_de, h_en, h_es, h_fr), 0) = 0 THEN 'und'
                            WHEN h_de = GREATEST(h_de, h_en, h_es, h_fr) THEN 'de'
                            WHEN h_en = GREATEST(h_de, h_en, h_es, h_fr) THEN 'en'
                            WHEN h_es = GREATEST(h_de, h_en, h_es, h_fr) THEN 'es'
                            ELSE 'fr' END AS pred_lang
                FROM documents d LEFT JOIN hits h USING (doc_id)
            ), j AS (
                SELECT l.doc_id, l.pred_lang, s.bits_per_bigram
                FROM lang l JOIN scores s USING (doc_id)
            ), ranked AS (
                -- terciles over the 3dp-QUANTIZED score (the histogram
                -- bound mirrored from ops/curate.ccnet_buckets)
                SELECT pred_lang, ROUND(bits_per_bigram, 3) AS s,
                       ROW_NUMBER() OVER (PARTITION BY pred_lang
                                          ORDER BY ROUND(bits_per_bigram, 3)) AS rn,
                       COUNT(*) OVER (PARTITION BY pred_lang) AS n
                FROM j
            ), th AS (
                SELECT pred_lang,
                       MAX(CASE WHEN rn = (n + 2) // 3 THEN s END) AS t1,
                       MAX(CASE WHEN rn = (2 * n + 2) // 3 THEN s END) AS t2
                FROM ranked GROUP BY pred_lang
            )
            SELECT j.doc_id, j.pred_lang, j.bits_per_bigram,
                   CASE WHEN ROUND(j.bits_per_bigram, 3) <= th.t1 THEN 'head'
                        WHEN ROUND(j.bits_per_bigram, 3) <= th.t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM j JOIN th USING (pred_lang)
        """,
        "embedding_decontam": r"""
            SELECT vec_id, bench_id, max_cos FROM (
                SELECT e.vec_id, b.vec_id AS bench_id,
                       ROUND(list_cosine_similarity(
                           e.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                           AS max_cos,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                               e.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                               DESC,
                               b.vec_id ASC) AS rn
                FROM embeddings e, embeddings b
                WHERE e.vec_id >= 16 AND b.vec_id < 16
            ) WHERE rn = 1 AND max_cos >= 0.35
        """,
        # mixture_weights: targets mirrored literally from MIXTURE_TARGETS;
        # identical double expression shapes (c*share/tot, left-assoc) keep
        # the rounded rates bit-equal.
        "mixture_weights": r"""
            WITH tgt(source, share) AS (VALUES
                ('src0', 0.3), ('src1', 0.25), ('src2', 0.2),
                ('src3', 0.15), ('src4', 0.1)
            ), t AS (
                SELECT source, SUM(n_chars) AS tot
                FROM documents GROUP BY source
            ), c AS (
                SELECT MIN(t.tot / tgt.share) AS c
                FROM t JOIN tgt USING (source) WHERE tgt.share > 0
            )
            SELECT t.source,
                   t.tot::BIGINT AS total_value,
                   COALESCE(tgt.share, 0.0) AS target_share,
                   ROUND(CASE WHEN COALESCE(tgt.share, 0) > 0
                              THEN c.c * tgt.share / t.tot ELSE 0.0 END, 6)
                       AS sample_rate,
                   ROUND(CASE WHEN COALESCE(tgt.share, 0) > 0
                              THEN c.c * tgt.share ELSE 0.0 END, 6)
                       AS expected_value
            FROM t LEFT JOIN tgt USING (source) CROSS JOIN c
        """,
        "q1_pricing": relational.Q1_SQL,
        "q6_revenue": relational.Q6_SQL,
        "small_quantity_revenue": relational.SMALL_QUANTITY_REVENUE_SQL,
        "top_supplier_revenue": relational.TOP_SUPPLIER_REVENUE_SQL,
        "top_customers": relational.TOP_CUSTOMERS_SQL,
        "revenue_by_region": relational.REVENUE_BY_REGION_SQL,
        "revenue_rollup": relational.REVENUE_ROLLUP_SQL,
        "events_hourly": relational.EVENTS_HOURLY_SQL,
        "events_sliding": relational.EVENTS_SLIDING_SQL,
        "events_last_order": relational.EVENTS_LAST_ORDER_SQL,
        "order_event_window": relational.ORDER_EVENT_WINDOW_SQL,
        "priority_returned_orders": relational.PRIORITY_RETURNED_SQL,
        "order_count_distribution": relational.ORDER_COUNT_DIST_SQL,
        "user_running_total": relational.USER_RUNNING_TOTAL_SQL,
        "user_interarrival": relational.USER_INTERARRIVAL_SQL,
        "user_journeys": relational.USER_JOURNEYS_SQL,
        "daily_anomalies": relational.DAILY_ANOMALIES_SQL,
        "event_affinity": relational.EVENT_AFFINITY_SQL,
        "length_histogram": relational.LENGTH_HISTOGRAM_SQL,
        "length_dispersion": relational.LENGTH_DISPERSION_SQL,
        "source_percent_rank": relational.SOURCE_PERCENT_RANK_SQL,
        "source_decile": relational.SOURCE_DECILE_SQL,
        "hourly_trend": relational.HOURLY_TREND_SQL,
        "event_user_reach": relational.EVENT_USER_REACH_SQL,
        "events_prop_stats": relational.EVENTS_PROP_STATS_SQL,
        "user_sessions": relational.USER_SESSIONS_SQL,
        "events_funnel": relational.EVENTS_FUNNEL_SQL,
        "event_transitions": relational.EVENT_TRANSITIONS_SQL,
        "fk_audit": relational.FK_AUDIT_SQL,
        "user_retention": relational.USER_RETENTION_SQL,
        "docs_by_source": relational.DOCS_BY_SOURCE_SQL,
    }
