"""Grid → markdown-table span emission.

Re-implements the reference's DataFrame→markdown serializer
(excel_processor.py:150-180 — SURVEY.md M17), the CSV reader semantics
(excel_processor.py:60-96 — S7: a ``# CSV Data: <name>`` heading plus one
markdown table), and the DOCX 20-row cap with truncation notice
(docx_processor.py:140-148 — O2).
"""

from __future__ import annotations

from docstrange_ray.config import DEFAULT, ExtractConfig


def grid_to_markdown(grid: list[list[str]]) -> str:
    """Render a rectangular grid as a canonical markdown table: header row,
    ``---`` separator, body; empty/None cells become ''
    (reference: excel_processor.py:150-180)."""
    if not grid:
        return ""
    width = max(len(r) for r in grid)

    def cells(row: list[str]) -> list[str]:
        vals = [("" if c is None else str(c)).replace("|", "\\|") for c in row]
        vals += [""] * (width - len(vals))
        return vals

    lines = ["| " + " | ".join(cells(grid[0])) + " |"]
    lines.append("| " + " | ".join(["---"] * width) + " |")
    for row in grid[1:]:
        lines.append("| " + " | ".join(cells(row)) + " |")
    return "\n".join(lines)


def parse_table_src(payload: str) -> list[list[str]]:
    """Parse the 'table-src' payload: newline rows, TAB- or comma-separated
    cells (the synthetic stand-in for the reference's pandas read_csv /
    read_excel ingestion, excel_processor.py:60-148)."""
    rows: list[list[str]] = []
    for line in payload.split("\n"):
        if not line.strip():
            continue
        sep = "\t" if "\t" in line else ","
        rows.append([c.strip() for c in line.split(sep)])
    return rows


def table_src_to_spans(payload: str, name: str, cfg: ExtractConfig = DEFAULT) -> list[dict]:
    """Emit ('heading', '# CSV Data: <name>') + table span(s) with the
    reference's row-cap semantics: tables longer than ``table_row_cap``
    data rows are truncated and followed by a notice text span
    (docx_processor.py:140-148)."""
    grid = parse_table_src(payload)
    spans: list[dict] = [
        {"kind": "heading", "text": f"# CSV Data: {name}", "media_ref": ""}
    ]
    if not grid:
        return spans
    n_data = len(grid) - 1
    capped = grid[: cfg.table_row_cap + 1]
    spans.append({"kind": "table", "text": grid_to_markdown(capped), "media_ref": ""})
    if n_data > cfg.table_row_cap:
        spans.append(
            {
                "kind": "text",
                "text": f"... ({n_data - cfg.table_row_cap} more rows truncated)",
                "media_ref": "",
            }
        )
    return spans
