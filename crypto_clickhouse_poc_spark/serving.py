"""HTTP serving shell: the reference's REST surface over the Spark engine.

Mirrors every route of the reference's FastAPI app (``api/server.py:41-200``)
— the five analytics endpoints plus collector control — using only the
standard library (this environment has no FastAPI; the handler layer is
deliberately thin so swapping in FastAPI/uvicorn is mechanical). Responses
are JSON arrays of row objects with ISO-formatted timestamps, matching the
reference's marshalling (``api/server.py:31-37,81-83`` — survey F9/S8).

The server holds ONE SparkSession and a trades-DataFrame provider; each
request builds a Catalyst plan via ``api.*`` and collects. Parse/plan/
execute all happen in Spark — the shell is transport only, exactly the
reference's division of labor with ClickHouse.

``GET /`` serves the bundled dashboard (``web/index.html`` — the
functional analog of the reference's ``web/index.html:1-276`` +
``web/main.js:1-418``, original dependency-free implementation; see the
comment at the top of that file).
"""

from __future__ import annotations

import json
import threading
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame

from . import api

_DASHBOARD = Path(__file__).parent / "web" / "index.html"


def _jsonify(rows: list[dict]) -> list[dict]:
    out = []
    for r in rows:
        out.append(
            {
                k: (v.isoformat() if isinstance(v, datetime) else v)
                for k, v in r.items()
            }
        )
    return out


class AnalyticsServer:
    """Start/stoppable HTTP server over a trades DataFrame provider.

    ``trades_provider`` returns the CURRENT trades DataFrame per request (so
    a streaming-ingested table is re-read each call); ``collector`` is an
    optional ``streaming.collector.Collector`` wired to the control routes;
    ``anchor`` pins now() for deterministic tests (None = wall clock).
    """

    def __init__(
        self,
        trades_provider: Callable[[], DataFrame],
        collector=None,
        anchor: Optional[datetime] = None,
        port: int = 0,
    ) -> None:
        self._trades = trades_provider
        self._collector = collector
        self._anchor = anchor
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a) -> None:  # silent in tests
                pass

            def _send(self, code: int, payload) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802
                u = urlparse(self.path)
                if u.path in ("/", "/index.html"):
                    try:
                        body = _DASHBOARD.read_bytes()
                    except OSError as exc:  # shipped without web/ → JSON 404
                        return self._send(404, {"error": f"dashboard: {exc}"})
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    payload = outer._route_get(u.path, q)
                except KeyError as exc:
                    return self._send(404, {"error": str(exc)})
                except Exception as exc:  # surface as 400, reference-style
                    return self._send(400, {"error": str(exc)})
                self._send(200, payload)

            def do_POST(self) -> None:  # noqa: N802
                try:
                    payload = outer._route_post(urlparse(self.path).path)
                except KeyError as exc:
                    return self._send(404, {"error": str(exc)})
                except RuntimeError as exc:  # double start → 409 (reference)
                    return self._send(409, {"error": str(exc)})
                self._send(200, payload)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread: Optional[threading.Thread] = None

    # ---- routing -----------------------------------------------------
    def _route_get(self, path: str, q: dict) -> object:
        t = self._trades()
        a = self._anchor
        if path == "/ohlcv":
            df = api.ohlcv(t, q["symbol"], int(q.get("minutes", 60)), a)
        elif path == "/top_symbols":
            df = api.top_symbols(t, int(q.get("minutes", 10)), int(q.get("limit", 10)), a)
        elif path == "/live_trades":
            df = api.live_trades(
                t, q["symbol"], int(q.get("window_sec", 60)), int(q.get("limit", 500)), a
            )
        elif path == "/live_buy_sell":
            df = api.live_buy_sell(t, int(q.get("minutes", 10)), int(q.get("top", 5)), a)
        elif path == "/hist_buy_sell":
            df = api.hist_buy_sell(t, q["symbol"], int(q.get("minutes", 60)), a)
        elif path == "/collector/status":
            if self._collector is None:
                raise KeyError("no collector configured")
            return self._collector.status
        else:
            raise KeyError(f"unknown route {path}")
        return _jsonify([r.asDict() for r in df.collect()])

    def _route_post(self, path: str) -> object:
        if self._collector is None:
            raise KeyError("no collector configured")
        if path == "/collector/start":
            self._collector.start()
            return {"started": True}
        if path == "/collector/stop":
            self._collector.stop()
            return {"stopped": True}
        raise KeyError(f"unknown route {path}")

    # ---- lifecycle ---------------------------------------------------
    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
