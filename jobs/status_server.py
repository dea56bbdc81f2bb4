"""Read-only HTTP status API — the sandbox-appropriate slice of the
reference's REST control plane (``web/controller/
Mysql2MysqlController.scala:23-89`` in /root/reference serves per-task
start/stop/restart/status over Spring REST; the estuary status queries
are ``SyncControllerMessages`` + ``ProcessingCounter`` counters).

Here the CONTROL verbs stay with the schedulers that own the jobs
(spark-submit / cron / an orchestrator restarting from checkpoints —
SURVEY.md §7.5), and the STATUS surface is served directly from table
metadata: every document is derived from snapshot manifests and
checkpoint files on disk (``monitor.table_status``), so the server needs
no Spark session, holds no state, and can run beside or apart from the
sync drivers. stdlib-only (http.server, threading).

Routes (JSON):
  GET /health                 liveness + server time
  GET /tables                 summary per destination table under --root
  GET /tables/<name>          full position/health document for one table
  GET /checkpoint             the driver checkpoint file, if configured

Usage:
  python jobs/status_server.py --root /lake/tables [--multi]
      [--checkpoint /ckpt/sync.json] [--port 8718] [--host 127.0.0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _table_dirs(root: str, multi: bool) -> dict[str, str]:
    """name -> table dir. Single-table mode serves the root itself under
    its basename; multi mode lists destination tables under the root."""
    from estuary_spark.tables import LakeTable

    if not multi:
        return {os.path.basename(root.rstrip("/")) or "table": root}
    return {
        d: os.path.join(root, d)
        for d in sorted(os.listdir(root) if os.path.isdir(root) else [])
        if LakeTable(os.path.join(root, d)).exists()
    }


def make_handler(root: str, multi: bool, checkpoint_path: str | None):
    from estuary_spark.monitor import table_status

    class Handler(BaseHTTPRequestHandler):
        server_version = "estuary-spark-status/1"

        def log_message(self, *a):  # quiet by default; ops tail access logs
            pass

        def _send(self, code: int, doc) -> None:
            body = json.dumps(doc).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            try:
                path = self.path.rstrip("/")
                if path in ("", "/health"):
                    self._send(200, {"ok": True, "ts": time.time(), "root": root})
                elif path == "/tables":
                    dirs = _table_dirs(root, multi)
                    self._send(
                        200,
                        {
                            "ts": time.time(),
                            "tables": {n: table_status(d) for n, d in dirs.items()},
                        },
                    )
                elif path.startswith("/tables/"):
                    name = path[len("/tables/"):]
                    dirs = _table_dirs(root, multi)
                    if name not in dirs:
                        self._send(404, {"error": f"unknown table {name!r}"})
                        return
                    self._send(200, {"ts": time.time(), "table": name,
                                     **table_status(dirs[name])})
                elif path == "/checkpoint":
                    if not checkpoint_path or not os.path.exists(checkpoint_path):
                        self._send(404, {"error": "no checkpoint configured/present"})
                        return
                    with open(checkpoint_path) as fh:
                        self._send(200, json.load(fh))
                else:
                    self._send(404, {"error": f"unknown route {path!r}"})
            except Exception as e:  # never kill the serving thread
                self._send(500, {"error": str(e)})

    return Handler


def make_server(
    root: str,
    multi: bool = False,
    checkpoint_path: str | None = None,
    host: str = "127.0.0.1",
    port: int = 8718,
) -> ThreadingHTTPServer:
    """Construct (without starting) the threaded status server — tests
    drive it via ``serve_forever`` on a daemon thread; the CLI blocks."""
    return ThreadingHTTPServer((host, port), make_handler(root, multi, checkpoint_path))


def main() -> None:
    ap = argparse.ArgumentParser(description="estuary_spark read-only status API")
    ap.add_argument("--root", required=True,
                    help="LakeTable root (or multi-table sync root with --multi)")
    ap.add_argument("--multi", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8718)
    args = ap.parse_args()
    srv = make_server(args.root, args.multi, args.checkpoint, args.host, args.port)
    print(json.dumps({"serving": f"http://{args.host}:{srv.server_address[1]}",
                      "root": args.root}), flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
