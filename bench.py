"""Throughput benchmark: DCNv2 training on a Criteo-shaped workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes (see BENCHMARKS.md): on the axon remote backend
``block_until_ready`` returns at dispatch, so the loss scalar is fetched as
a true barrier. The bench exercises the framework's production path:
bf16 compute (f32 master weights) + ``steps_per_call`` scanned training.

The reference publishes no in-repo throughput numbers (SURVEY.md §6);
``vs_baseline`` divides by BASELINE.json's dcnv2_examples_per_sec when
present, else reports 1.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    from fuxictr_tpu.models.zoo.ranking import DCNv2
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    batch_size = int(os.environ.get("BENCH_BATCH", 8192))
    vocab = int(os.environ.get("BENCH_VOCAB", 100000))
    emb_dim = int(os.environ.get("BENCH_EMB_DIM", 16))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    k = int(os.environ.get("BENCH_STEPS_PER_CALL", 10))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    fm = make_synthetic_feature_map(num_categorical=26, num_numeric=13,
                                    vocab_size=vocab, embedding_dim=emb_dim)
    model = DCNv2(fm, model_id="DCNv2_bench", embedding_dim=emb_dim,
                  model_structure="parallel",
                  stacked_dnn_hidden_units=[1024, 512, 256],
                  parallel_dnn_hidden_units=[1024, 512, 256],
                  num_cross_layers=4,
                  compute_dtype=dtype,
                  model_root="/tmp/fuxictr_tpu_bench")
    model.init_params()
    multi_step = model._make_multi_step()

    batch = make_synthetic_batch(fm, batch_size=batch_size, seed=0)
    stacked = jax.tree_util.tree_map(
        lambda x: np.stack([x] * k), batch)
    stacked = jax.device_put(stacked)
    rng = jax.random.PRNGKey(0)

    # warmup/compile; loss fetch = true barrier on the remote backend
    state, loss = multi_step(model.state, stacked, rng)
    float(loss)

    n_calls = max(1, steps // k)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, loss = multi_step(state, stacked, rng)
    float(loss)
    dt = time.perf_counter() - t0

    examples_per_sec = n_calls * k * batch_size / dt
    baseline = None
    if os.path.exists("BASELINE.json"):
        try:
            with open("BASELINE.json") as fd:
                baseline = json.load(fd).get("published", {}).get(
                    "dcnv2_examples_per_sec")
        except Exception:
            baseline = None
    vs = examples_per_sec / baseline if baseline else 1.0
    print(json.dumps({"metric": "dcnv2_train_throughput",
                      "value": round(examples_per_sec, 1),
                      "unit": "examples/s",
                      "vs_baseline": round(vs, 3)}))


def main_criteo():
    """End-to-end DCNv2 training on the prebuilt full-Criteo-scale dataset
    (scripts/make_criteo_scale.py + run_criteo_scale.py --phase build):
    sustained examples/s THROUGH the streaming input pipeline, not just the
    device step. Prints the same one-line JSON contract."""
    import io
    from contextlib import redirect_stdout

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import run_criteo_scale as rcs

    fm_json = os.path.join(rcs.DATA_ROOT, rcs.DATASET_ID,
                           "feature_map.json")
    if not os.path.exists(fm_json):
        print(json.dumps({"metric": "dcnv2_criteo_e2e_throughput",
                          "value": 0, "unit": "examples/s",
                          "vs_baseline": 0,
                          "error": f"dataset not built ({fm_json}); run "
                          "scripts/run_criteo_scale.py --phase build"}))
        return
    buf = io.StringIO()
    with redirect_stdout(buf):
        rcs.phase_train("DCNv2",
                        epochs=int(os.environ.get("BENCH_EPOCHS", 2)),
                        loader=os.environ.get("BENCH_LOADER", "device"))
    result = {}
    for line in buf.getvalue().splitlines():
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("phase") == "train":
            # headline = compile-free steady state (epoch-2 window); the
            # end-to-end rate incl. one-time compiles/staging rides along
            result["value"] = (rec.get("steady_examples_per_s")
                               or rec["sustained_examples_per_s"])
            result["e2e_examples_per_s"] = rec["sustained_examples_per_s"]
        if rec.get("phase") == "eval" and rec.get("split") == "test":
            result.update(test_AUC=rec["AUC"], bayes_AUC=rec["bayes_AUC"])
    print(json.dumps({"metric": "dcnv2_criteo_steady_throughput",
                      "unit": "examples/s", "vs_baseline": 1.0, **result}))


def _backend_watchdog():
    """The remote-TPU tunnel can stall indefinitely at backend init (a
    multi-hour axon outage was observed round 5). Probe device discovery
    on a side thread with a deadline so the bench emits a diagnosable
    JSON line instead of hanging past the driver's patience."""
    import threading

    deadline = float(os.environ.get("BENCH_BACKEND_DEADLINE", 900))
    ok = threading.Event()

    def probe():
        try:
            import jax
            jax.devices()
            ok.set()
        except Exception:
            pass            # fast failure: main path re-raises with detail

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(deadline)
    if not ok.is_set() and t.is_alive():
        # a genuine hang (thread still blocked in device discovery) — a
        # fast exception instead falls through so the main path surfaces
        # the real error
        print(json.dumps({
            "metric": "dcnv2_criteo_steady_throughput", "value": 0,
            "unit": "examples/s", "vs_baseline": 0,
            "error": f"backend unavailable: jax.devices() did not return "
                     f"within {deadline:.0f}s (TPU tunnel down?)"}),
            flush=True)
        os._exit(3)


if __name__ == "__main__":
    import argparse
    _ap = argparse.ArgumentParser()
    _ap.add_argument("--dataset", default=None)
    _ap.add_argument("--synthetic", action="store_true")
    _args, _ = _ap.parse_known_args()
    _backend_watchdog()
    if _args.dataset == "criteo":
        main_criteo()
    elif _args.synthetic:
        main()
    else:
        # default: prefer the real end-to-end Criteo-scale benchmark
        # (train + eval through the device-resident input path) whenever
        # the prebuilt dataset is present; else the synthetic step bench.
        _fm = os.path.join(
            os.environ.get("CRITEO_DATA", "/tmp/ctr_scale/criteo_full_data"),
            os.environ.get("CRITEO_DATASET_ID", "criteo_full_syn"),
            "feature_map.json")
        if os.path.exists(_fm):
            main_criteo()
        else:
            main()
