"""Crash-resume drill at full Criteo scale (VERDICT r4 #7).

Exercises the fault-tolerance path end-to-end under the PRODUCTION loader
(device-cache epochs, async orbax periodic checkpoints) rather than the
unit-test surface: a 2-epoch DCNv2 run on the 45.8M-row benchmark is
SIGKILLed mid-epoch-2, resumed from ``latest_checkpoint()``, and the
resumed model's final test AUC/logloss is compared against the
uninterrupted control run. Also asserts periodic-ckpt rotation held
(``periodic_ckpt_keep`` newest steps, no stale steps, tmp debris swept —
the ADVICE-r3-fixed orbax paths under real async saves).

Usage (chip):
    python scripts/drill_resume.py --phase control   # uninterrupted 2 ep
    python scripts/drill_resume.py --phase drill     # crash + resume
    python scripts/drill_resume.py --phase all

The worker subprocess is this same file with --worker; the parent watches
its stdout for the epoch-2 marker and SIGKILLs it (the process group, so
orbax's background save threads die with it — the crash the tmp-dir
sweeper exists for).
"""

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_criteo_scale import DATA_ROOT, DATASET_ID  # noqa: E402

MODEL_ROOT = "/tmp/ctr_scale/checkpoints"
MODEL_ID = "DCNv2_drill"
KEEP = 3


def _build(params_over=None):
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models import get_model, seed_everything

    params = dict(
        model="DCNv2", model_id=MODEL_ID, dataset_id=DATASET_ID,
        data_root=DATA_ROOT + "/", model_root=MODEL_ROOT + "/",
        data_format="parquet", device_cache=True, shuffle=True,
        batch_size=32768, learning_rate=2e-3, float_staging="float16",
        steps_per_call=32, compute_dtype="bfloat16", rng_impl="rbg",
        embedding_dim=16, model_structure="parallel",
        stacked_dnn_hidden_units=[1024, 512, 256],
        parallel_dnn_hidden_units=[1024, 512, 256],
        num_cross_layers=4, net_dropout=0.1,
        net_regularizer=None, embedding_regularizer=None,
        monitor="AUC", metrics=["AUC", "logloss"],
        reduce_lr_on_plateau=True, verbose=1,
        # quarter-epoch evals: periodic ckpts land 4x/epoch and the parent
        # can observe "Train loss" lines INSIDE epoch 2 to time the kill
        eval_steps=250,
        periodic_ckpt=1, periodic_ckpt_keep=KEEP,
        train_data=f"{DATA_ROOT}/{DATASET_ID}/train/",
        valid_data=f"{DATA_ROOT}/{DATASET_ID}/valid/",
        test_data=f"{DATA_ROOT}/{DATASET_ID}/test/")
    if os.environ.get("DRILL_SMOKE"):
        # CPU smoke of the orchestration (point CRITEO_DATA/CRITEO_DATASET_ID
        # at any small built dataset): tiny recipe, same control flow
        params.update(batch_size=4096, embedding_dim=4,
                      stacked_dnn_hidden_units=[16],
                      parallel_dnn_hidden_units=[16], num_cross_layers=1,
                      steps_per_call=4, compute_dtype=None,
                      float_staging=None, rng_impl=None, eval_steps=50)
    params.update(params_over or {})
    set_logger(params)
    seed_everything(2019)
    data_dir = os.path.join(params["data_root"], DATASET_ID)
    fm = FeatureMap(DATASET_ID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"), params)
    model = get_model(params["model"])(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **params).make_iterator()
    test_gen = RankDataLoader(
        fm, stage="test", test_data=params["test_data"],
        batch_size=params["batch_size"], data_format="parquet",
        device_cache=True, shuffle=False).make_iterator()
    return model, train_gen, valid_gen, test_gen


def worker(mode):
    """mode=victim: train 2 epochs (parent kills us in epoch 2).
    mode=control: train 2 epochs to completion.
    mode=resume: restore latest periodic ckpt, train 1 more epoch."""
    if os.environ.get("DRILL_PLATFORM") == "cpu":
        # CPU smoke: the axon sitecustomize force-updates jax_platforms to
        # "axon,cpu"; env alone cannot counter it (verify-skill gotcha)
        import jax
        jax.config.update("jax_platforms", "cpu")
    model, train_gen, valid_gen, test_gen = _build()
    if mode == "resume":
        ck = model.latest_checkpoint(model.periodic_ckpt_dir)
        assert ck, f"no checkpoint to resume under {model.periodic_ckpt_dir}"
        print(f"RESUME_FROM {ck}", flush=True)
        model.init_params()
        model.load_checkpoint(ck, use_orbax=True)
        # consume the crashed epoch's EXACT remaining data stream
        # (models/base.py resume_align_data), then no further epochs:
        # total data seen == the uninterrupted run's
        model.kwargs["resume_align_data"] = True
        epochs = 1
    else:
        epochs = 2
    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=epochs)
    logs = model.evaluate(test_gen)
    print(json.dumps({
        "mode": mode, "seconds": round(time.time() - t0, 1),
        "test_AUC": round(float(logs["AUC"]), 6),
        "test_logloss": round(float(logs["logloss"]), 6),
        "resumed_from_step": int(getattr(model, "_resume_step", 0)),
    }), flush=True)


def _spawn(mode):
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        bufsize=1, start_new_session=True)


def _ckpt_steps():
    root = os.path.join(MODEL_ROOT, DATASET_ID, f"{MODEL_ID}_ckpt")
    if not os.path.isdir(root):
        return [], []
    steps = sorted((d for d in os.listdir(root)
                    if re.fullmatch(r"step_\d+", d)),
                   key=lambda d: int(d.split("_")[1]))
    debris = [d for d in os.listdir(root) if ".orbax-checkpoint-tmp-" in d]
    return steps, debris


def phase_control():
    p = _spawn("control")
    out = []
    for line in p.stdout:
        print("  [control]", line, end="", flush=True)
        out.append(line)
    p.wait()
    assert p.returncode == 0, "control run failed"
    result = json.loads([l for l in out if l.startswith("{")][-1])
    with open("/tmp/ctr_scale/drill_control.json", "w") as fd:
        json.dump(result, fd)
    return result


def phase_drill():
    # clean slate for the victim's checkpoint dir
    import shutil
    root = os.path.join(MODEL_ROOT, DATASET_ID, f"{MODEL_ID}_ckpt")
    shutil.rmtree(root, ignore_errors=True)

    victim = _spawn("victim")
    epoch2 = False
    killed = False
    trainloss_after_epoch2 = 0
    for line in victim.stdout:
        print("  [victim]", line, end="", flush=True)
        if "Epoch=1 end" in line:       # fit logs only epoch-END markers
            epoch2 = True
        if epoch2 and "Train loss:" in line:
            trainloss_after_epoch2 += 1
            if trainloss_after_epoch2 >= 2:   # well inside epoch 2
                print(">>> SIGKILL mid-epoch-2", flush=True)
                os.killpg(victim.pid, signal.SIGKILL)
                killed = True
                break
    victim.wait()
    assert killed, "never reached epoch 2 — is the dataset built?"

    steps, debris = _ckpt_steps()
    print(f">>> after crash: steps={steps} debris={debris}", flush=True)
    assert steps, "no periodic checkpoints survived the crash"
    assert len(steps) <= KEEP, f"rotation failed: {steps}"

    resume = _spawn("resume")
    out = []
    for line in resume.stdout:
        print("  [resume]", line, end="", flush=True)
        out.append(line)
    resume.wait()
    assert resume.returncode == 0, "resume run failed"
    result = json.loads([l for l in out if l.startswith("{")][-1])

    steps2, debris2 = _ckpt_steps()
    print(f">>> after resume: steps={steps2} debris={debris2}", flush=True)
    assert len(steps2) <= KEEP, f"rotation failed post-resume: {steps2}"
    assert not debris2, f"tmp debris not swept: {debris2}"
    assert int(steps2[-1].split("_")[1]) > int(steps[-1].split("_")[1]), \
        "resumed run did not advance periodic-ckpt numbering"

    control = None
    if os.path.exists("/tmp/ctr_scale/drill_control.json"):
        control = json.load(open("/tmp/ctr_scale/drill_control.json"))
    summary = {"phase": "drill", "resumed": result, "control": control,
               "ckpt_steps_after_crash": steps,
               "ckpt_steps_after_resume": steps2}
    if control:
        summary["auc_delta_vs_control"] = round(
            result["test_AUC"] - control["test_AUC"], 6)
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["control", "drill", "all"])
    ap.add_argument("--worker", default=None,
                    choices=["victim", "control", "resume"])
    args = ap.parse_args()
    if args.worker:
        worker(args.worker)
    else:
        if args.phase in ("control", "all"):
            phase_control()
        if args.phase in ("drill", "all"):
            phase_drill()
