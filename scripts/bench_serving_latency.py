"""Serving latency: AOT-bucketed Predictor on the real chip.

Measures per-bucket request latency (p50/p95/p99) through the full serve
path — host padding + H2D + compiled forward + D2H — for a production-
shaped DCNv2 (26 cat + 13 num fields, vocab 100k x dim 16, the bench.py
shape). The reference has no serving path to compare against; this
quantifies the bundle/Predictor design (fuxictr_tpu/serving/).

Run: python scripts/bench_serving_latency.py [--buckets 1,8,64,512]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="1,8,64,512")
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--vocab", type=int, default=100000)
    ap.add_argument("--emb_dim", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quantize", default=None, choices=[None, "int8"],
                    help="serve int8 tables + per-row scales "
                    "(serving/quantize.py)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fuxictr_tpu.models.zoo.ranking import DCNv2
    from fuxictr_tpu.serving import Predictor, export_model
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    buckets = tuple(int(b) for b in args.buckets.split(","))
    fm = make_synthetic_feature_map(num_categorical=26, num_numeric=13,
                                    vocab_size=args.vocab,
                                    embedding_dim=args.emb_dim)
    model = DCNv2(fm, model_id="DCNv2_serve", embedding_dim=args.emb_dim,
                  model_structure="parallel",
                  stacked_dnn_hidden_units=[1024, 512, 256],
                  parallel_dnn_hidden_units=[1024, 512, 256],
                  num_cross_layers=4,
                  model_root=tempfile.mkdtemp(prefix="serve_bench_"))
    model.init_params()

    bundle = export_model(
        model, tempfile.mkdtemp(prefix="serve_bundle_"),
        params=dict(model="DCNv2", embedding_dim=args.emb_dim,
                    model_structure="parallel",
                    stacked_dnn_hidden_units=[1024, 512, 256],
                    parallel_dnn_hidden_units=[1024, 512, 256],
                    num_cross_layers=4),
        include_processor=False)

    t0 = time.perf_counter()
    pred = Predictor(bundle, batch_buckets=buckets, aot=True,
                     quantize=args.quantize)
    aot_s = time.perf_counter() - t0
    print(f"# bundle load + AOT compile of {len(buckets)} buckets: "
          f"{aot_s:.1f}s")
    from fuxictr_tpu.serving.quantize import table_bytes
    tb = table_bytes(pred.model.state.params)
    print(f"# table storage ({args.quantize or 'float32'}): "
          f"{tb / 1e6:.1f} MB")

    results = []
    for b in buckets:
        # request size = the bucket (worst case: no padding waste) drawn
        # fresh per request so the host path isn't cache-warm
        reqs = []
        for i in range(args.requests):
            batch = make_synthetic_batch(fm, batch_size=b, seed=i)
            batch.pop("__mask__", None)
            reqs.append({k: v for k, v in batch.items()
                         if k not in fm.labels})
        pred.predict(reqs[0])  # warm dispatch path
        lat = []
        for r in reqs:
            t = time.perf_counter()
            y = pred.predict(r)
            lat.append((time.perf_counter() - t) * 1e3)
        assert y.shape == (b,)
        lat = np.sort(np.asarray(lat))
        rec = {"bucket": b,
               "p50_ms": round(float(np.percentile(lat, 50)), 3),
               "p95_ms": round(float(np.percentile(lat, 95)), 3),
               "p99_ms": round(float(np.percentile(lat, 99)), 3),
               "qps_at_p50": round(1000.0 / float(np.percentile(lat, 50)), 1),
               "rows_per_s_at_p50":
                   round(b * 1000.0 / float(np.percentile(lat, 50)), 1)}
        results.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"metric": "serving_latency",
                      "table_dtype": args.quantize or "float32",
                      "table_mb": round(tb / 1e6, 1),
                      "aot_compile_s": round(aot_s, 1),
                      "buckets": results}))


if __name__ == "__main__":
    main()
