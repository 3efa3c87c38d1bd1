"""HTTP observability endpoints (src/http_server.rs:41-87 analog).

The reference serves /health /ready /live /metrics /version over warp;
this serves the same surface from the stdlib ``http.server`` on a
daemon thread — no framework, no event loop, good enough for a probe
endpoint (kubelet-style GETs, one every few seconds).

Semantics ported from http_server.rs handlers:
- ``/health``  — full JSON health report; 200 for healthy AND degraded
  (degraded still serves traffic), 503 for unhealthy.
- ``/ready``   — readiness gate: 200 iff healthy or degraded.
- ``/live``    — liveness gate: 200 unless unhealthy (restart signal).
- ``/metrics`` — Prometheus text exposition from ``MetricsRegistry``.
- ``/version`` — engine name + version JSON.

Interactive queries (Kafka Streams' queryable-state analog): when the
pipeline passes a ``state_reader``, ``/state`` and ``/state/<view>``
serve the LATEST COMMITTED epoch's state — a deliberately stronger
consistency model than Kafka Streams' live-store reads: a query can
never observe results of an epoch whose 2PC has not finished, so
reads are exactly-once-consistent by construction. ``/state`` returns
the commit summary (epoch, watermark, counters); views are reader-
defined (the streaming pipeline ships ``topk`` and ``window/<key>``).

On a real cluster this runs on the driver (one server per job); worker
health rides the report via the actor-liveness checker, so no
per-worker listeners are needed.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .health import HealthMonitor, HealthStatus
from .metrics import MetricsRegistry

_SERVING = (HealthStatus.HEALTHY, HealthStatus.DEGRADED)


class ObservabilityServer:
    """Serve health/metrics endpoints for a running pipeline.

    ``start()`` binds to ``127.0.0.1:port`` (port 0 = ephemeral; read
    the bound port from ``.port``) and serves on a daemon thread;
    ``stop()`` shuts the listener down. Handlers re-run the health
    checks on demand — probe cadence is the poller's choice, matching
    the reference's pull model.
    """

    def __init__(self, monitor: HealthMonitor, metrics: MetricsRegistry,
                 port: int = 0, version: str = "0", state_reader=None,
                 traces=None):
        self.monitor = monitor
        self.metrics = metrics
        self.version = version
        # state_reader: Callable[[str], dict | list | None] — takes the
        # subpath after "/state" ("" | "topk" | "window/en" | ...) and
        # returns a JSON-able view of the latest committed state, or
        # None for unknown views (404)
        self.state_reader = state_reader
        # traces: Callable[[], list[dict]] — recent finished spans in
        # Jaeger JSON (tracing.rs:247-283 export analog), served on
        # /trace; None disables the route (404)
        self.traces = traces
        self._httpd = ThreadingHTTPServer(("127.0.0.1", port),
                                          self._make_handler())
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # probes are not log events
                pass

            def _send(self, code: int, body: str,
                      ctype: str = "application/json"):
                data = body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                try:
                    if self.path == "/health":
                        report = server.monitor.check_health()
                        code = 200 if report["status"] in _SERVING else 503
                        self._send(code, json.dumps(report))
                    elif self.path == "/ready":
                        report = server.monitor.check_health()
                        ready = report["status"] in _SERVING
                        self._send(200 if ready else 503,
                                   json.dumps({"ready": ready,
                                               "status": report["status"]}))
                    elif self.path == "/live":
                        report = server.monitor.check_health()
                        alive = report["status"] != HealthStatus.UNHEALTHY
                        self._send(200 if alive else 503,
                                   json.dumps({"alive": alive,
                                               "status": report["status"]}))
                    elif self.path == "/metrics":
                        self._send(200, server.metrics.export_prometheus(),
                                   ctype="text/plain; version=0.0.4")
                    elif (self.path == "/state"
                          or self.path.startswith("/state/")):
                        if server.state_reader is None:
                            self._send(404, json.dumps(
                                {"error": "queryable state not enabled"}))
                        else:
                            sub = self.path[len("/state"):].lstrip("/")
                            view = server.state_reader(sub)
                            if view is None:
                                self._send(404, json.dumps(
                                    {"error": f"unknown view {sub!r}"}))
                            else:
                                self._send(200, json.dumps(view))
                    elif self.path == "/trace":
                        if server.traces is None:
                            self._send(404, json.dumps(
                                {"error": "tracing not enabled"}))
                        else:
                            self._send(200, json.dumps(
                                {"spans": list(server.traces())}))
                    elif self.path == "/version":
                        self._send(200, json.dumps({
                            "name": "bitquery_kafka_streams_rust_ray",
                            "version": server.version,
                        }))
                    else:
                        self._send(404, json.dumps({"error": "not found"}))
                except Exception as exc:  # probe endpoints never raise
                    self._send(500, json.dumps({"error": repr(exc)}))

        return Handler

    def start(self) -> "ObservabilityServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        name="observability-http",
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "ObservabilityServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
