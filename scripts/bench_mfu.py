"""MFU / roofline accounting for the flagship DCNv2 train step (VERDICT
r3 #2): express the step in FLOP/s and HBM GB/s against v5e peaks, and
measure the dense-layout levers the round-3 "XLA ceiling" claim never
quantified:

  (a) concat width padded to a 128-lane multiple (624 = 39 fields x D16
      -> 640 = 40 fields), which changes MXU tiling of every cross layer
      and the tower input matmul;
  (b) batch scaling B = 8192 / 16384 / 32768 (MXU utilization grows with
      the M dimension until HBM or scatter binds);
  (c) the tower-fusion question: in the benched `parallel` structure only
      ONE dnn tower runs (crossnet + parallel_dnn — DCNv2.py:92-101), so
      "fuse the stacked+parallel first matmuls" is vacuous; reported as
      n/a.

FLOPs come from the compiled program's own cost analysis when the backend
exposes it, else from the analytic dense count. Peaks are knobs:
MFU_PEAK_TFLOPS (default 197, v5e bf16), MFU_HBM_GBS (default 819, v5e).

Run on the TPU chip: python scripts/bench_mfu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS = float(os.environ.get("MFU_PEAK_TFLOPS", 197.0))
HBM_GBS = float(os.environ.get("MFU_HBM_GBS", 819.0))


def analytic_dense_flops(width, hidden, cross_layers, batch):
    """fwd matmul FLOPs; train ~= 3x (fwd + 2 backward matmuls per layer)."""
    per_ex = cross_layers * 2 * width * width
    dims = [width] + list(hidden)
    for a, b in zip(dims[:-1], dims[1:]):
        per_ex += 2 * a * b
    per_ex += 2 * (dims[-1] + width)          # concat -> logit
    return 3 * per_ex * batch


# production Criteo vocab mix (make_criteo_scale.VOCABS): buckets into the
# 3-table layout the real benchmark runs with
CRITEO_VOCABS = [1200000, 550000, 300000, 180000, 90000, 60000, 40000,
                 25000, 15000, 11000, 8000, 5500, 4000, 2600, 1800, 1200,
                 800, 500, 300, 180, 110, 60, 35, 22, 14, 9]


def measure(num_fields, batch, steps=40, k=10, emb_dim=16, vocab=100000):
    import jax

    from fuxictr_tpu.models.zoo.ranking import DCNv2
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    n_cat = num_fields - 13
    if vocab == "criteo":
        vocab = (CRITEO_VOCABS + [1000] * max(n_cat - 26, 0))[:n_cat]
    fm = make_synthetic_feature_map(num_categorical=n_cat, num_numeric=13,
                                    vocab_size=vocab, embedding_dim=emb_dim)
    model = DCNv2(fm, model_id=f"DCNv2_mfu_{num_fields}_{batch}",
                  embedding_dim=emb_dim, model_structure="parallel",
                  stacked_dnn_hidden_units=[1024, 512, 256],
                  parallel_dnn_hidden_units=[1024, 512, 256],
                  num_cross_layers=4, compute_dtype="bfloat16",
                  model_root="/tmp/fuxictr_tpu_mfu")
    model.init_params()
    multi_step = model._make_multi_step()
    b = make_synthetic_batch(fm, batch_size=batch, seed=0)
    stacked = jax.device_put(
        jax.tree_util.tree_map(lambda x: np.stack([x] * k), b))
    rng = jax.random.PRNGKey(0)
    state, loss = multi_step(model.state, stacked, rng)   # compile+warm
    float(loss)
    n_calls = max(1, steps // k)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, loss = multi_step(state, stacked, rng)
    float(loss)
    dt = time.perf_counter() - t0
    ms_step = dt / (n_calls * k) * 1e3

    width = num_fields * emb_dim
    flops = None
    bytes_accessed = None
    try:
        import functools
        step = functools.partial(jax.jit, donate_argnums=(0,))(
            model._train_step_body())
        ca = step.lower(state, jax.device_put(b), rng).compile() \
                 .cost_analysis()
        flops = ca.get("flops")
        bytes_accessed = ca.get("bytes accessed")
    except Exception as exc:
        print(f"# cost_analysis unavailable ({type(exc).__name__}); "
              "using analytic dense FLOPs", file=sys.stderr)
    if not flops:
        flops = analytic_dense_flops(width, [1024, 512, 256], 4, batch)
    rec = {
        "fields": num_fields, "concat_width": width, "batch": batch,
        "ms_per_step": round(ms_step, 3),
        "examples_per_s": round(batch / ms_step * 1e3),
        "step_gflops": round(flops / 1e9, 2),
        "tflops_per_s": round(flops / (ms_step / 1e3) / 1e12, 2),
        "mfu_pct": round(flops / (ms_step / 1e3) / (PEAK_TFLOPS * 1e12)
                         * 100, 2),
    }
    if bytes_accessed:
        rec["step_gbytes"] = round(bytes_accessed / 1e9, 2)
        rec["hbm_util_pct"] = round(
            bytes_accessed / (ms_step / 1e3) / (HBM_GBS * 1e9) * 100, 1)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", default="100000",
                    help="'criteo' for the production bucketed vocab mix, "
                    "else a uniform per-field vocab size")
    args = ap.parse_args()
    vocab = args.vocab if args.vocab == "criteo" else int(args.vocab)
    results = []
    for fields, batch in ((39, 8192), (40, 8192), (39, 16384),
                          (40, 16384), (39, 32768), (40, 32768)):
        results.append(measure(fields, batch, vocab=vocab))
    out = f"/tmp/mfu_results_{args.vocab}.json"
    with open(out, "w") as fd:
        json.dump(results, fd, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
