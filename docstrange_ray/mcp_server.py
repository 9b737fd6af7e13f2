"""MCP (Model Context Protocol) serving shell over the extraction
engine — the rebuild of the reference's `mcp_server_module/server.py`
(the 11 document tools at server.py:346-509), implemented from scratch
against the PUBLIC MCP spec: JSON-RPC 2.0 over stdio, one
newline-delimited message per line, `initialize` / `tools/list` /
`tools/call` methods. Stdlib-only — no mcp package needed.

The serving path is single-document and synchronous (an MCP session
navigates ONE document at a time), so it uses the sequential
extraction kernels directly — the same span-producing code the Ray
pipeline distributes; the batch engine remains the scale path. The
parse cache is keyed by md5 of file bytes exactly like the reference
(server.py:87-89): re-parsing happens only when the file changes.

Run: ``python -m docstrange_ray.mcp_server`` (speaks MCP on stdio).
"""

from __future__ import annotations

import hashlib
import json
import sys

from docstrange_ray.extract.binary_formats import file_bytes_to_input_spans
from docstrange_ray.extract.core import extract_spans
from docstrange_ray.projections import (
    _context_recommendation,
    parse_sections,
    spans_to_chunks,
    spans_to_markdown,
)

SERVER_NAME = "docstrange-ray-mcp"
SERVER_VERSION = "0.3.0"
PROTOCOL_VERSION = "2024-11-05"

_PATH_ARG = {
    "type": "object",
    "properties": {"file_path": {"type": "string"}},
    "required": ["file_path"],
}


def _tool(name: str, description: str, schema: dict | None = None) -> dict:
    return {
        "name": name,
        "description": description,
        "inputSchema": schema or _PATH_ARG,
    }


TOOLS = [
    _tool("parse_document", "Parse a document into markdown (cached by content hash)."),
    _tool("get_headers", "Markdown headers of a parsed document."),
    _tool(
        "search_document",
        "Substring search with surrounding context lines.",
        {
            "type": "object",
            "properties": {
                "file_path": {"type": "string"},
                "query": {"type": "string"},
            },
            "required": ["file_path", "query"],
        },
    ),
    _tool(
        "get_section",
        "One section's content by title.",
        {
            "type": "object",
            "properties": {
                "file_path": {"type": "string"},
                "section_title": {"type": "string"},
            },
            "required": ["file_path", "section_title"],
        },
    ),
    _tool("get_section_summaries", "Per-section first-200-char summaries."),
    _tool("get_full_content", "Full markdown content."),
    _tool(
        "list_cached_documents",
        "Paths currently in the parse cache.",
        {"type": "object", "properties": {}},
    ),
    _tool("get_document_info", "Token/section counts + context-window tier."),
    _tool("get_hierarchical_structure", "Nested header tree."),
    _tool(
        "get_section_chunks",
        "Greedy token-budget section packing.",
        {
            "type": "object",
            "properties": {
                "file_path": {"type": "string"},
                "token_budget": {"type": "integer", "default": 4000},
            },
            "required": ["file_path"],
        },
    ),
    _tool(
        "get_chunk_content",
        "One chunk by index.",
        {
            "type": "object",
            "properties": {
                "file_path": {"type": "string"},
                "chunk_index": {"type": "integer"},
            },
            "required": ["file_path", "chunk_index"],
        },
    ),
]


class DocCache:
    """md5-of-bytes parse cache (reference server.py:87-89 semantics)."""

    def __init__(self):
        self._docs: dict[str, dict] = {}

    def load(self, path: str) -> dict:
        with open(path, "rb") as f:
            data = f.read()
        digest = hashlib.md5(data).hexdigest()
        cached = self._docs.get(path)
        if cached and cached["md5"] == digest:
            return cached
        in_spans = file_bytes_to_input_spans(path, data)
        spans = extract_spans(path, [dict(s) for s in in_spans])
        markdown = spans_to_markdown(spans)
        doc = {
            "md5": digest,
            "spans": spans,
            "markdown": markdown,
            "sections": parse_sections(spans),
        }
        self._docs[path] = doc
        return doc

    def paths(self) -> list[str]:
        return sorted(self._docs)


class McpServer:
    def __init__(self):
        self.cache = DocCache()

    # --- tool implementations (each returns a plain dict) -------------------

    def parse_document(self, file_path: str) -> dict:
        doc = self.cache.load(file_path)
        return {
            "file_path": file_path,
            "md5": doc["md5"],
            "n_spans": len(doc["spans"]),
            "n_sections": len(doc["sections"]),
            "markdown_chars": len(doc["markdown"]),
        }

    def get_headers(self, file_path: str) -> dict:
        doc = self.cache.load(file_path)
        return {
            "headers": [
                {"level": s["level"], "title": s["title"]}
                for s in doc["sections"]
                if s["title"]
            ]
        }

    def search_document(self, file_path: str, query: str) -> dict:
        # substring search with +-2 context lines (server.py:265-296)
        doc = self.cache.load(file_path)
        lines = doc["markdown"].split("\n")
        matches = []
        needle = query.lower()
        for i, line in enumerate(lines):
            if needle in line.lower():
                lo, hi = max(0, i - 2), min(len(lines), i + 3)
                matches.append(
                    {"line": i + 1, "context": "\n".join(lines[lo:hi])}
                )
        return {"query": query, "n_matches": len(matches), "matches": matches}

    def get_section(self, file_path: str, section_title: str) -> dict:
        doc = self.cache.load(file_path)
        for s in doc["sections"]:
            if s["title"] == section_title:
                return {"title": s["title"], "content": s["content"]}
        return {"error": f"section not found: {section_title}"}

    def get_section_summaries(self, file_path: str) -> dict:
        doc = self.cache.load(file_path)
        return {
            "summaries": [
                {
                    "title": s["title"],
                    "summary": s["content"][:200],
                    "n_tokens": s["token_count"],
                }
                for s in doc["sections"]
            ]
        }

    def get_full_content(self, file_path: str) -> dict:
        return {"content": self.cache.load(file_path)["markdown"]}

    def list_cached_documents(self) -> dict:
        return {"documents": self.cache.paths()}

    def get_document_info(self, file_path: str) -> dict:
        doc = self.cache.load(file_path)
        total_tokens = sum(s["token_count"] for s in doc["sections"])
        return {
            "file_path": file_path,
            "md5": doc["md5"],
            "n_sections": len(doc["sections"]),
            "total_tokens": total_tokens,
            "context_recommendation": _context_recommendation(total_tokens),
        }

    def get_hierarchical_structure(self, file_path: str) -> dict:
        doc = self.cache.load(file_path)
        root: list[dict] = []
        stack: list[tuple[int, list[dict]]] = [(0, root)]
        for s in doc["sections"]:
            if not s["title"]:
                continue
            node = {"title": s["title"], "level": s["level"], "children": []}
            while stack and stack[-1][0] >= s["level"]:
                stack.pop()
            (stack[-1][1] if stack else root).append(node)
            stack.append((s["level"], node["children"]))
        return {"structure": root}

    def get_section_chunks(self, file_path: str, token_budget: int = 4000) -> dict:
        doc = self.cache.load(file_path)
        chunks = spans_to_chunks(doc["spans"], token_budget=token_budget)
        return {
            "n_chunks": len(chunks),
            "chunks": [
                {"index": c["chunk_id"], "n_tokens": c["n_tokens_est"]}
                for c in chunks
            ],
        }

    def get_chunk_content(self, file_path: str, chunk_index: int) -> dict:
        doc = self.cache.load(file_path)
        chunks = spans_to_chunks(doc["spans"])
        if 0 <= chunk_index < len(chunks):
            return dict(chunks[chunk_index])
        return {"error": f"chunk index out of range: {chunk_index}"}

    # --- JSON-RPC dispatch ---------------------------------------------------

    def handle(self, msg: dict) -> dict | None:
        method = msg.get("method", "")
        msg_id = msg.get("id")
        if method == "initialize":
            return self._result(
                msg_id,
                {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": {"name": SERVER_NAME, "version": SERVER_VERSION},
                },
            )
        if method.startswith("notifications/"):
            return None  # notifications get no response
        if method == "ping":
            return self._result(msg_id, {})
        if method == "tools/list":
            return self._result(msg_id, {"tools": TOOLS})
        if method == "tools/call":
            params = msg.get("params", {})
            name = params.get("name", "")
            args = params.get("arguments", {}) or {}
            fn = getattr(self, name, None)
            if fn is None or name.startswith("_") or name not in {t["name"] for t in TOOLS}:
                return self._error(msg_id, -32602, f"unknown tool: {name}")
            try:
                out = fn(**args)
            except FileNotFoundError as ex:
                out = {"error": f"file not found: {ex.filename}"}
            except TypeError as ex:
                return self._error(msg_id, -32602, str(ex))
            except Exception as ex:  # per-call error policy: report, keep serving
                out = {"error": f"{type(ex).__name__}: {ex}"}
            return self._result(
                msg_id,
                {
                    "content": [
                        {"type": "text", "text": json.dumps(out, ensure_ascii=False)}
                    ],
                    "isError": "error" in out,
                },
            )
        return self._error(msg_id, -32601, f"method not found: {method}")

    @staticmethod
    def _result(msg_id, result: dict) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id, "result": result}

    @staticmethod
    def _error(msg_id, code: int, message: str) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id, "error": {"code": code, "message": message}}


def main() -> int:
    """Newline-delimited JSON-RPC loop on stdio (MCP stdio transport)."""
    server = McpServer()
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError:
            continue
        resp = server.handle(msg)
        if resp is not None:
            sys.stdout.write(json.dumps(resp, ensure_ascii=False) + "\n")
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
