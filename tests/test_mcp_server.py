"""MCP serving shell: JSON-RPC over stdio (newline-delimited), the 11
document tools of the reference's mcp_server_module/server.py:346-509
rebuilt over the span engine. The subprocess test exercises the actual
stdio transport; in-process tests cover tool semantics."""

import json
import os
import subprocess
import sys

import pytest

from docstrange_ray.mcp_server import McpServer
from docstrange_ray.synth_files import write_fixture_corpus


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mcpdocs"))
    write_fixture_corpus(out)
    return out


def _call(server, name, **args):
    resp = server.handle(
        {
            "jsonrpc": "2.0",
            "id": 1,
            "method": "tools/call",
            "params": {"name": name, "arguments": args},
        }
    )
    assert "result" in resp, resp
    return json.loads(resp["result"]["content"][0]["text"])


class TestTools:
    def test_parse_and_navigate(self, fixture_dir):
        s = McpServer()
        p = os.path.join(fixture_dir, "report.docx")
        info = _call(s, "parse_document", file_path=p)
        assert info["n_sections"] == 3
        heads = _call(s, "get_headers", file_path=p)["headers"]
        assert [h["title"] for h in heads] == ["Annual Report", "Overview", "Details"]
        sec = _call(s, "get_section", file_path=p, section_title="Overview")
        assert "year went well" in sec["content"]
        tree = _call(s, "get_hierarchical_structure", file_path=p)["structure"]
        assert tree[1]["children"][0]["title"] == "Details"
        hits = _call(s, "search_document", file_path=p, query="revenue")
        assert hits["n_matches"] == 1
        doc_info = _call(s, "get_document_info", file_path=p)
        assert doc_info["context_recommendation"] == "full_document"
        chunks = _call(s, "get_section_chunks", file_path=p)
        assert chunks["n_chunks"] >= 1
        c0 = _call(s, "get_chunk_content", file_path=p, chunk_index=0)
        assert "Annual Report" in c0["text"]
        assert _call(s, "list_cached_documents")["documents"] == [p]

    def test_cache_by_content_hash(self, fixture_dir, tmp_path):
        s = McpServer()
        p = str(tmp_path / "a.txt")
        with open(p, "w") as f:
            f.write("first version")
        assert "first" in _call(s, "get_full_content", file_path=p)["content"]
        with open(p, "w") as f:
            f.write("second version")  # same path, new bytes -> re-parse
        assert "second" in _call(s, "get_full_content", file_path=p)["content"]

    def test_error_paths(self, fixture_dir):
        s = McpServer()
        out = _call(s, "parse_document", file_path="/nope/missing.txt")
        assert "error" in out
        resp = s.handle(
            {"jsonrpc": "2.0", "id": 5, "method": "tools/call",
             "params": {"name": "handle", "arguments": {}}}
        )
        assert "error" in resp  # internal methods are not tools
        resp = s.handle({"jsonrpc": "2.0", "id": 6, "method": "bogus/method"})
        assert resp["error"]["code"] == -32601


class TestStdioTransport:
    def test_subprocess_round_trip(self, fixture_dir):
        p = os.path.join(fixture_dir, "notes.txt")
        msgs = [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
             "params": {"name": "parse_document", "arguments": {"file_path": p}}},
        ]
        proc = subprocess.run(
            [sys.executable, "-m", "docstrange_ray.mcp_server"],
            input="\n".join(json.dumps(m) for m in msgs) + "\n",
            capture_output=True,
            text=True,
            timeout=60,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        out = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
        assert len(out) == 3  # the notification gets no response
        by_id = {r["id"]: r for r in out}
        assert by_id[1]["result"]["serverInfo"]["name"] == "docstrange-ray-mcp"
        assert len(by_id[2]["result"]["tools"]) == 11
        parsed = json.loads(by_id[3]["result"]["content"][0]["text"])
        assert parsed["n_spans"] >= 1
