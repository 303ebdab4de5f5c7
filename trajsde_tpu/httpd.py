"""HTTP front-end for the serving engine (stdlib-only, no framework deps).

The reference has no serving story at all (its eval surface is
``trainer.test``, ``/root/reference/test.py:58``); this completes the
deployment analog: :class:`trajsde_tpu.server.ServingEngine` behind a
threaded HTTP API.  One OS thread per in-flight request (stdlib
``ThreadingHTTPServer``) — each handler parks on ``engine.submit``'s
Future, so CONCURRENT requests are grouped by the engine's micro-batcher
into shared device dispatches, which is exactly the batching discipline
the engine was built around.

Endpoints:

- ``POST /predict`` — body is either a raw ``.npz`` scene (the
  preprocessor shard schema; ``Content-Type: application/octet-stream``)
  or JSON ``{"npz": "/local/path.npz"}``.  Response: JSON with the
  engine's result fields — ``agent_world`` (the submission payload),
  ``agent_pi``, ``seq_id``, plus ``loc``/``pi`` (the dense per-actor
  grids) unless the engine was built ``slim`` (``serve.py --slim``),
  plus ``ood_std``/``agent_std`` when it was built with ``ood=True``
  (``serve.py --ood``).  Clients that want the arrays without the JSON
  float-text cost send ``Accept: application/x-npz`` and get the same
  result as ``.npz`` bytes (measured 0.49 vs 325 ms/scene to encode a
  full-grid result vs its float-text JSON — PERF.md round 5).
- ``GET /stats`` — engine latency/occupancy counters.
- ``GET /healthz`` — liveness probe (200 once the engine is up).

Deployment guidance: the full-grid JSON body is ~1.3 MiB and costs
~300 ms of single-core encode time per scene; a daemon meant to sustain
load should run ``--slim`` (25 KB JSON) and bulk clients should prefer
``Accept: application/x-npz``.

Start via ``serve.py --http PORT`` (see there for engine/artifact
options) or embed with :func:`make_http_server`.
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# one scene at production capacity is <2 MiB; anything near this bound is
# not a scene.  Enforced BEFORE the body read — Content-Length is
# attacker-controlled and the read allocates it
MAX_BODY_BYTES = 64 * 2**20


def _cast(v):
    # bf16 (ml_dtypes) values are neither json-serializable nor
    # npz-portable; any non-integer payload goes through float32 first.
    # ONE policy shared by the JSON and npz reply paths.
    a = np.asarray(v)
    return a.astype(np.float32) if a.dtype.kind not in "iub" else a


def _json_ready(result):
    out = {}
    for k, v in result.items():
        a = _cast(v)
        out[k] = a.tolist() if a.ndim else a.item()
    return out


def make_http_server(engine, host: str = "127.0.0.1", port: int = 0):
    """Build (not start) a ``ThreadingHTTPServer`` fronting ``engine``.

    ``port=0`` binds an ephemeral port; read it back from
    ``server.server_address[1]``.  Call ``serve_forever()`` (blocking) or
    drive it from a thread; ``shutdown()`` stops it without closing the
    engine (the caller owns the engine lifecycle).
    """

    class Handler(BaseHTTPRequestHandler):
        # quiet: one access-log line per request would swamp the console
        def log_message(self, fmt, *args):  # noqa: A003
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_npz(self, result: dict) -> None:
            # binary result path: npz encode is ~650× cheaper than the
            # float-text JSON of the same arrays on this host
            buf = io.BytesIO()
            np.savez(buf, **{k: _cast(v) for k, v in result.items()})
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npz")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats":
                self._reply(200, engine.stats())
            else:
                self._reply(404, {"error": f"unknown path {self.path!r}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._reply(404, {"error": f"unknown path {self.path!r}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._reply(400, {"error": "bad Content-Length"})
                return
            if n < 0:
                # rfile.read(-1) means read-until-EOF — a negative length
                # would bypass the size bound below and let a client
                # stream unbounded data into memory
                self._reply(400, {"error": "bad Content-Length"})
                return
            if n > MAX_BODY_BYTES:
                self._reply(413, {"error": (
                    f"body of {n} bytes exceeds the {MAX_BODY_BYTES}-byte "
                    "limit (one scene per request)"
                )})
                return
            try:
                body = self.rfile.read(n)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if ctype == "application/json":
                    from trajsde_tpu.data.loader import load_scene_npz

                    scene = load_scene_npz(json.loads(body)["npz"])
                else:  # raw .npz bytes
                    with np.load(io.BytesIO(body), allow_pickle=False) as z:
                        scene = {k: z[k] for k in z.files}
            except Exception as e:  # malformed input is the CLIENT's error
                self._reply(400, {"error": f"bad request: {e!r}"})
                return
            try:
                # submit() validates/aligns the scene SYNCHRONOUSLY — a
                # malformed scene (missing keys, bad shapes) raises here
                # and is the CLIENT's error, not a server failure
                fut = engine.submit(scene)
            except Exception as e:
                self._reply(400, {"error": f"bad scene: {e!r}"})
                return
            try:
                # park on the future: the engine's micro-batcher groups
                # this with every other thread currently waiting
                result = fut.result()
                accept = (self.headers.get("Accept") or "").lower()
                if "application/x-npz" in accept:
                    self._reply_npz(result)
                else:
                    self._reply(200, _json_ready(result))
            except Exception as e:
                self._reply(500, {"error": repr(e)})

    return ThreadingHTTPServer((host, port), Handler)


def run_http_server(engine, host: str, port: int):
    """Start the server on a daemon thread; returns (server, bound_port)."""
    server = make_http_server(engine, host, port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]
