"""End-to-end MCP stdio transport test: a real subprocess speaking JSON-RPC
2.0 line framing — initialize handshake, tools/list, both tools/call paths,
and protocol error handling."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from opencode_hive_archon_spark.mcp_transport import StdioTransport


class TestDispatchInProcess:
    """Protocol semantics without subprocess overhead."""

    def test_initialize_and_list(self):
        t = StdioTransport()
        resp = t.handle({"jsonrpc": "2.0", "id": 1, "method": "initialize"})
        assert resp["result"]["protocolVersion"]
        assert resp["result"]["capabilities"]["tools"] is not None
        resp = t.handle({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        names = [tool["name"] for tool in resp["result"]["tools"]]
        assert names == ["recall_search", "validate_branch"]

    def test_notification_gets_no_response(self):
        t = StdioTransport()
        assert t.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None

    def test_unknown_method_and_bad_params(self):
        t = StdioTransport()
        resp = t.handle({"jsonrpc": "2.0", "id": 3, "method": "nope"})
        assert resp["error"]["code"] == -32601
        resp = t.handle(
            {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
             "params": {"name": "recall_search", "arguments": {}}}
        )
        assert resp["error"]["code"] == -32602


def test_stdio_roundtrip_subprocess():
    """Full wire test: spawn the server, run the MCP handshake, call both
    tools, assert the reference key structure comes back over stdout."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.Popen(
        [sys.executable, "-m", "opencode_hive_archon_spark.mcp_transport"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd="/root/repo", env=env,
    )
    try:
        msgs = [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
             "params": {"name": "recall_search",
                        "arguments": {"query": "fast hash join"}}},
            {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
             "params": {"name": "validate_branch",
                        "arguments": {"scenario_id": "S001"}}},
        ]
        out, _ = proc.communicate(
            "".join(json.dumps(m) + "\n" for m in msgs), timeout=300
        )
        responses = {r["id"]: r for r in map(json.loads, out.splitlines())}
        assert len(responses) == 4  # the notification produced no response
        assert responses[1]["result"]["serverInfo"]["name"]
        assert [t["name"] for t in responses[2]["result"]["tools"]] == [
            "recall_search", "validate_branch",
        ]
        recall = json.loads(responses[3]["result"]["content"][0]["text"])
        assert responses[3]["result"]["isError"] is False
        # reference key parity (schemas.py:25-57 envelope + flat duplicates)
        assert set(recall) >= {
            "context_packet", "next_action", "candidates", "branch",
            "confidence", "routing_metadata",
        }
        assert recall["context_packet"]["summary"]["candidate_count"] == 5
        validate = json.loads(responses[4]["result"]["content"][0]["text"])
        assert validate["success"] is True
        assert validate["branch_match"] is True and validate["action_match"] is True
    finally:
        proc.kill()
