"""Serving under concurrent load: HTTP p50/p99 + rows/s vs offered load,
per-request dispatch vs the micro-batching queue.

Clients send SMALL requests (default 2 rows — the realistic online-serving
shape) from N concurrent threads against the stdlib HTTP server
(serving/server.py). Two server modes are measured back to back on the
same Predictor:

  lock        per-request dispatch serialized by a lock (one compiled
              program per request — the round-3 design)
  microbatch  the MicroBatcher coalesces concurrent requests into shared
              AOT-bucket batches (serving/microbatch.py)

Run (real chip): python scripts/bench_serving_load.py
     (CPU smoke):  python scripts/bench_serving_load.py --cpu --duration 3
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _build_predictor(args):
    from fuxictr_tpu.models.zoo.ranking import DCNv2
    from fuxictr_tpu.serving import Predictor, export_model
    from fuxictr_tpu.utils.synthetic import make_synthetic_feature_map

    fm = make_synthetic_feature_map(num_categorical=26, num_numeric=13,
                                    vocab_size=args.vocab,
                                    embedding_dim=args.emb_dim)
    net = dict(model="DCNv2", embedding_dim=args.emb_dim,
               model_structure="parallel",
               stacked_dnn_hidden_units=[1024, 512, 256],
               parallel_dnn_hidden_units=[1024, 512, 256],
               num_cross_layers=4)
    model = DCNv2(fm, model_id="DCNv2_load", model_root=tempfile.mkdtemp(),
                  **{k: v for k, v in net.items() if k != "model"})
    model.init_params()
    bundle = export_model(model, tempfile.mkdtemp(prefix="load_bundle_"),
                          params=net, include_processor=False)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    return Predictor(bundle, batch_buckets=buckets, aot=True), fm


def _client_payload(fm, rows, seed):
    from fuxictr_tpu.utils.synthetic import make_synthetic_batch
    batch = make_synthetic_batch(fm, batch_size=rows, seed=seed)
    return json.dumps({"columns": {
        k: np.asarray(v).tolist() for k, v in batch.items()
        if k not in fm.labels and k != "__mask__"}}).encode()


def _drive(port, payloads, n_clients, duration):
    """N client threads fire requests for ``duration`` seconds; returns
    latencies (ms) and completed-request count."""
    import http.client
    stop = time.perf_counter() + duration
    lats, lock = [], threading.Lock()

    def worker(wid):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        i = wid
        local = []
        while time.perf_counter() < stop:
            body = payloads[i % len(payloads)]
            i += n_clients
            t0 = time.perf_counter()
            conn.request("POST", "/predict", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = resp.read()
            if resp.status != 200:
                raise RuntimeError(data[:200])
            local.append((time.perf_counter() - t0) * 1e3)
        conn.close()
        with lock:
            lats.extend(local)

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return np.sort(np.asarray(lats))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="1,8,64,512")
    ap.add_argument("--rows", type=int, default=2,
                    help="rows per client request")
    ap.add_argument("--clients", default="1,4,16,64")
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--vocab", type=int, default=100000)
    ap.add_argument("--emb_dim", type=int, default=16)
    ap.add_argument("--linger-ms", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fuxictr_tpu.serving.server import PredictionServer

    pred, fm = _build_predictor(args)
    payloads = [_client_payload(fm, args.rows, seed=s) for s in range(64)]
    results = []
    for mode in ("lock", "microbatch"):
        server = PredictionServer(pred, port=0,
                                  microbatch=mode == "microbatch",
                                  linger_ms=args.linger_ms)
        server.start_background()
        # warm the HTTP + dispatch path
        _drive(server.port, payloads, n_clients=2, duration=0.5)
        for n_clients in (int(c) for c in args.clients.split(",")):
            lats = _drive(server.port, payloads, n_clients, args.duration)
            rec = {
                "mode": mode, "clients": n_clients,
                "rows_per_request": args.rows,
                "requests": int(len(lats)),
                "rows_per_s": round(len(lats) * args.rows / args.duration),
                "p50_ms": round(float(np.percentile(lats, 50)), 2),
                "p99_ms": round(float(np.percentile(lats, 99)), 2),
            }
            if mode == "microbatch" and server.batcher is not None:
                rec["avg_rows_per_device_batch"] = round(
                    server.batcher.rows_run
                    / max(server.batcher.batches_run, 1), 2)
            results.append(rec)
            print(json.dumps(rec), flush=True)
        server.shutdown()
    print(json.dumps({"metric": "serving_load", "results": results}))


if __name__ == "__main__":
    main()
