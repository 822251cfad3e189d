"""MCP wire transport: JSON-RPC 2.0 over stdio for the two engine tools.

Closes the reference's serving surface end to end (mcp_server.py:106-136
exposes ``recall_search_tool`` / ``validate_branch_tool`` through an MCP
server): this module speaks the Model Context Protocol's stdio framing —
one JSON-RPC 2.0 object per line on stdin/stdout — with the standard
``initialize`` / ``tools/list`` / ``tools/call`` method surface, backed by
:class:`opencode_hive_archon_spark.mcp.MCPServer` (the key-parity dict
adapters). Pure stdlib: no MCP SDK dependency.

Protocol notes:
- requests carry ``id``; notifications (no ``id``) get no response, per
  JSON-RPC 2.0.
- ``tools/call`` results use MCP content framing:
  ``{"content": [{"type": "text", "text": <json>}], "isError": false}``.
- The SparkSession is created lazily on the FIRST ``tools/call`` so
  ``initialize``/``tools/list`` respond instantly (important for MCP
  client handshakes with short timeouts).

Run: ``python -m opencode_hive_archon_spark.mcp_transport`` (honors
``SPARK_GRAFT_SF_DIR``). Exercised end to end by tests/test_mcp_transport.py.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "opencode_hive_archon_spark", "version": "0.7.0"}

TOOLS = [
    {
        "name": "recall_search",
        "description": "Search memory with intelligent routing and branch "
        "classification; returns the context packet envelope plus legacy "
        "compatibility fields.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {"type": "string"},
                "mode": {"type": "string", "default": "conversation"},
                "top_k": {"type": "integer", "default": 5},
                "threshold": {"type": "number", "default": 0.6},
                "provider_override": {"type": ["string", "null"], "default": None},
            },
            "required": ["query"],
        },
    },
    {
        "name": "validate_branch",
        "description": "Replay a branch scenario by id and report "
        "expected-vs-actual branch/action matches.",
        "inputSchema": {
            "type": "object",
            "properties": {"scenario_id": {"type": "string"}},
            "required": ["scenario_id"],
        },
    },
]


class StdioTransport:
    """Line-delimited JSON-RPC 2.0 loop around MCPServer."""

    def __init__(self, sf_dir: str | None = None):
        self.sf_dir = sf_dir or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
        )
        self._server = None  # lazy: built on first tools/call

    def _engine_server(self):
        if self._server is None:
            from opencode_hive_archon_spark.mcp import MCPServer
            from opencode_hive_archon_spark.session import get_spark

            self._server = MCPServer(get_spark("mcp_transport"), self.sf_dir)
        return self._server

    # -- method handlers -----------------------------------------------------

    def _initialize(self, params: dict[str, Any]) -> dict[str, Any]:
        return {
            "protocolVersion": PROTOCOL_VERSION,
            "serverInfo": SERVER_INFO,
            "capabilities": {"tools": {"listChanged": False}},
        }

    def _tools_list(self, params: dict[str, Any]) -> dict[str, Any]:
        return {"tools": TOOLS}

    def _tools_call(self, params: dict[str, Any]) -> dict[str, Any]:
        name = params.get("name")
        args = params.get("arguments") or {}
        server = self._engine_server()
        if name == "recall_search":
            if "query" not in args:
                raise _InvalidParams("recall_search requires 'query'")
            try:
                top_k = int(args.get("top_k") if args.get("top_k") is not None else 5)
                threshold = float(
                    args.get("threshold") if args.get("threshold") is not None else 0.6
                )
            except (TypeError, ValueError) as exc:
                raise _InvalidParams(f"bad argument type: {exc}") from exc
            result = server.recall_search(
                query=args["query"],
                mode=args.get("mode", "conversation"),
                top_k=top_k,
                threshold=threshold,
                provider_override=args.get("provider_override"),
            )
        elif name == "validate_branch":
            if "scenario_id" not in args:
                raise _InvalidParams("validate_branch requires 'scenario_id'")
            result = server.validate_branch(args["scenario_id"])
        else:
            raise _InvalidParams(f"unknown tool: {name}")
        return {
            "content": [{"type": "text", "text": json.dumps(result)}],
            "isError": False,
        }

    # -- dispatch -------------------------------------------------------------

    def handle(self, msg: dict[str, Any]) -> dict[str, Any] | None:
        """One JSON-RPC message in, one response dict out (None for
        notifications)."""
        msg_id = msg.get("id")
        method = msg.get("method", "")
        handlers = {
            "initialize": self._initialize,
            "tools/list": self._tools_list,
            "tools/call": self._tools_call,
            "ping": lambda params: {},
        }
        if method.startswith("notifications/"):
            return None
        try:
            handler = handlers.get(method)
            if handler is None:
                return _error(msg_id, -32601, f"method not found: {method}")
            result = handler(msg.get("params") or {})
        except _InvalidParams as exc:
            return _error(msg_id, -32602, str(exc))
        except Exception as exc:  # tool execution failure -> JSON-RPC error
            return _error(msg_id, -32603, f"{type(exc).__name__}: {exc}")
        if msg_id is None:
            return None
        return {"jsonrpc": "2.0", "id": msg_id, "result": result}

    def serve(self, stdin=None, stdout=None) -> None:
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                resp = _error(None, -32700, "parse error")
            else:
                # valid JSON but not a request object (batch arrays are not
                # supported by MCP stdio framing; scalars are never valid)
                if not isinstance(msg, dict):
                    resp = _error(None, -32600, "invalid request: expected object")
                else:
                    resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()


class _InvalidParams(Exception):
    pass


def _error(msg_id, code: int, message: str) -> dict[str, Any]:
    return {
        "jsonrpc": "2.0",
        "id": msg_id,
        "error": {"code": code, "message": message},
    }


def main() -> None:
    StdioTransport().serve()


if __name__ == "__main__":
    main()
