"""Minimal production HTTP model server over a serving bundle.

Stdlib-only (http.server): no framework dependency, so it runs in any
environment the library itself runs in. One Predictor instance serves all
requests; prediction is serialized with a lock (the TPU executes one
program at a time anyway — concurrency belongs in the batch, which is why
the Predictor AOT-compiles batch buckets).

Endpoints:
  GET  /healthz          -> {"status": "ok"}
  GET  /info             -> model_meta.json (model, params, version)
  POST /predict          -> {"probabilities": [...], "n": N, "latency_ms": X}

Request body (JSON), either orientation:
  {"rows": [{"col": val, ...}, ...]}        row-major
  {"columns": {"col": [v1, v2, ...], ...}}  column-major
Add "raw": true to route untokenized features through the bundle's offline
FeatureProcessor artifacts (Predictor.predict_raw); default expects
already-encoded ids, mirroring Predictor.predict.

No reference equivalent — the reference stops at training checkpoints
(fuxictr/pytorch/models/rank_model.py:417-423); serving is new
architecture for the TPU framework.

CLI: python -m fuxictr_tpu.serving.server --bundle DIR [--port 8000]
     [--buckets 1,8,64,512] [--quantize int8] [--no-aot]
"""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _to_columns(payload):
    """Normalize a request body to a dict of numpy columns + row count."""
    if "columns" in payload:
        cols = {k: np.asarray(v) for k, v in payload["columns"].items()}
    elif "rows" in payload:
        rows = payload["rows"]
        if not rows:
            raise ValueError("empty rows")
        keys = rows[0].keys()
        cols = {k: np.asarray([r[k] for r in rows]) for k in keys}
    else:
        raise ValueError('body must carry "rows" or "columns"')
    n = {v.shape[0] for v in cols.values()}
    if len(n) != 1:
        raise ValueError(f"ragged columns: row counts {sorted(n)}")
    return cols, n.pop()


class PredictionServer:
    """Owns the Predictor and the HTTP server; see module docstring.

    ``microbatch=True`` routes concurrent requests through a
    :class:`fuxictr_tpu.serving.microbatch.MicroBatcher`: the dispatcher
    thread coalesces them into shared AOT-bucket batches (one program for
    many requests) instead of serializing one program per request —
    throughput under concurrent load scales with the bucket, not the
    request count (see BENCHMARKS.md "Serving under load")."""

    def __init__(self, predictor, host="0.0.0.0", port=8000,
                 microbatch=False, linger_ms=2.0):
        self.predictor = predictor
        self.batcher = None
        if microbatch:
            from fuxictr_tpu.serving.microbatch import MicroBatcher
            self.batcher = MicroBatcher(predictor, linger_ms=linger_ms)
        self._lock = threading.Lock()
        self._requests = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # quiet per-request stderr logging; errors still surface
            def log_message(self, fmt, *args):
                pass

            def _send(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok",
                                     "requests": outer._requests})
                elif self.path == "/info":
                    self._send(200, outer.predictor.meta)
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path != "/predict":
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    cols, n = _to_columns(payload)
                    t0 = time.perf_counter()
                    with outer._lock:
                        outer._requests += 1
                    if payload.get("raw"):
                        # encode on the request thread (host-side, thread
                        # safe); only the device call is coalesced
                        cols = outer.predictor.encode(cols)
                    if outer.batcher is not None:
                        y = outer.batcher.predict(cols)
                    else:
                        with outer._lock:
                            y = outer.predictor.predict(cols)
                    ms = (time.perf_counter() - t0) * 1e3
                    self._send(200, {"probabilities":
                                     np.asarray(y).tolist(),
                                     "n": n, "latency_ms": round(ms, 3)})
                except (ValueError, KeyError) as exc:
                    self._send(400, {"error": str(exc)})
                except Exception as exc:    # noqa: BLE001 — serve must not die
                    self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

        class Server(ThreadingHTTPServer):
            # default backlog (5) resets connections under concurrent
            # load; the micro-batching design expects many waiters
            request_queue_size = 128
            daemon_threads = True

        self.httpd = Server((host, port), Handler)
        self.port = self.httpd.server_address[1]

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self):
        """Run the server in a daemon thread (tests/embedding); returns it."""
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self.batcher is not None:
            self.batcher.close()


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--bundle", required=True,
                    help="export_model() bundle directory")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--buckets", default="1,8,64,512",
                    help="comma-separated AOT batch buckets")
    ap.add_argument("--quantize", default=None, choices=[None, "int8"])
    ap.add_argument("--no-aot", action="store_true",
                    help="compile buckets lazily on first use")
    ap.add_argument("--microbatch", action="store_true",
                    help="coalesce concurrent requests into shared "
                    "AOT-bucket batches (serving/microbatch.py)")
    ap.add_argument("--linger-ms", type=float, default=2.0)
    args = ap.parse_args(argv)

    from fuxictr_tpu.serving import Predictor
    buckets = tuple(int(b) for b in args.buckets.split(","))
    pred = Predictor(args.bundle, batch_buckets=buckets,
                     aot=not args.no_aot, quantize=args.quantize)
    server = PredictionServer(pred, host=args.host, port=args.port,
                              microbatch=args.microbatch,
                              linger_ms=args.linger_ms)
    print(f"serving {args.bundle} on {args.host}:{server.port} "
          f"(buckets={buckets}, quantize={args.quantize or 'off'})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
