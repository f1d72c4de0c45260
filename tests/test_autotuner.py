"""Autotuner tests: grid enumeration + subprocess scheduling end-to-end."""

import os

import pytest
import yaml

from fuxictr_tpu import autotuner


@pytest.fixture
def tuner_yaml(tmp_path):
    cfg = {
        "base_config": os.path.abspath("./configs/tiny"),
        "base_expid": "DNN_test",
        "tuner_space": {
            "learning_rate": [1.0e-3, 1.0e-2],
            "hidden_units": [[32, 16]],
        },
    }
    path = tmp_path / "tuner_config.yaml"
    with open(path, "w") as fd:
        yaml.dump(cfg, fd)
    return str(path)


def test_enumerate_params(tuner_yaml):
    config_dir = autotuner.enumerate_params(tuner_yaml)
    expids = autotuner.load_experiment_ids(config_dir)
    assert len(expids) == 2                       # 2 learning rates
    assert all(e.startswith("DNN_test_") for e in expids)
    with open(os.path.join(config_dir, "model_config.yaml")) as fd:
        model_cfg = yaml.safe_load(fd)
    lrs = sorted(v["learning_rate"] for v in model_cfg.values())
    assert lrs == [1.0e-3, 1.0e-2]
    # same space enumerated twice → identical hashed ids (deterministic)
    assert autotuner.load_experiment_ids(
        autotuner.enumerate_params(tuner_yaml)) == expids


def test_grid_search_runs_experiments(tuner_yaml, tmp_path):
    config_dir = autotuner.enumerate_params(tuner_yaml)
    # run children on CPU: empty PALLAS_AXON_POOL_IPS disables the axon
    # plugin registration in sitecustomize
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        autotuner.grid_search(config_dir, device_slots=["0", "1"],
                              script=os.path.abspath("run_expid.py"),
                              poll_interval=1)
    finally:
        os.environ["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    result_csv = os.path.join(os.path.abspath(config_dir),
                              os.path.basename(config_dir) + ".csv")
    assert os.path.exists(result_csv)
    with open(result_csv) as fd:
        lines = [l for l in fd if l.strip()]
    assert len(lines) == 2                        # one row per expid
    assert all("[exp_id] DNN_test_" in l for l in lines)


def test_grid_search_retries_crashed_expid(tmp_path, monkeypatch):
    """A nonzero-exit expid is relaunched once, then reported as failed."""
    import subprocess
    from fuxictr_tpu import autotuner

    launches = []

    class FakeProc:
        def __init__(self, cmd, env=None):
            launches.append(cmd[cmd.index("--expid") + 1])
            self._rc = 1
        def poll(self):
            return self._rc
        def wait(self):
            return self._rc

    monkeypatch.setattr(autotuner, "load_experiment_ids",
                        lambda d: ["bad_expid"])
    monkeypatch.setattr(subprocess, "Popen", FakeProc)
    failed = autotuner.grid_search(str(tmp_path), ["0"], poll_interval=0,
                                   max_retries=1)
    assert launches == ["bad_expid", "bad_expid"]
    assert failed == ["bad_expid"]


def test_grid_search_inprocess(tuner_yaml, tmp_path):
    """Warm mode: both expids run in-process, share staged loaders, and
    produce the same metrics a fresh (isolated) run produces."""
    config_dir = autotuner.enumerate_params(tuner_yaml)
    failed = autotuner.grid_search_inprocess(config_dir)
    assert failed == []
    result_csv = os.path.join(os.path.abspath(config_dir),
                              os.path.basename(config_dir) + ".csv")
    with open(result_csv) as fd:
        lines = [l for l in fd if l.strip()]
    assert len(lines) == 2

    # metric parity with an isolated run of the same expid
    from fuxictr_tpu.experiment import run_expid
    expid = autotuner.load_experiment_ids(config_dir)[0]
    import re
    fresh = run_expid(config_dir, expid)
    row = next(l for l in lines if expid in l)
    auc_in_row = float(re.search(r"AUC: ([0-9.]+)", row).group(1))
    assert abs(fresh["valid"]["AUC"] - auc_in_row) < 1e-6


def test_shared_loaders_reused_and_reset(tmp_path):
    """run_expid(shared=...) caches loaders across calls and resets their
    epoch counters so each expid sees a fresh shuffle stream."""
    from fuxictr_tpu.config import load_config
    from fuxictr_tpu.experiment import run_expid
    cfg = os.path.abspath("./configs/tiny")
    params = load_config(cfg, "DNN_test")
    params["model_root"] = str(tmp_path)
    shared = {}
    run_expid(cfg, "DNN_test", params=dict(params), shared=shared)
    loaders_before = dict(shared["loaders"])
    r2 = run_expid(cfg, "DNN_test", params=dict(params), shared=shared)
    assert shared["loaders"] == loaders_before      # same objects reused
    r3 = run_expid(cfg, "DNN_test", params=dict(params))  # isolated
    assert abs(r2["valid"]["AUC"] - r3["valid"]["AUC"]) < 1e-6


def test_shared_loader_cache_evicts_oldest(tmp_path):
    """Warm-tuner loader cache keeps at most _LOADER_CACHE_KEEP sets per
    stage — a batch_size grid must not pile up staged caches."""
    from fuxictr_tpu.config import load_config
    from fuxictr_tpu.experiment import _LOADER_CACHE_KEEP, run_expid

    cfg = os.path.abspath("./configs/tiny")
    base = load_config(cfg, "DNN_test")
    base["model_root"] = str(tmp_path)
    shared = {}
    for bs in (16, 32, 64):
        run_expid(cfg, "DNN_test", params=dict(base, batch_size=bs),
                  shared=shared)
    per_stage = {}
    for key in shared["loaders"]:
        per_stage[key[0]] = per_stage.get(key[0], 0) + 1
    assert all(n <= _LOADER_CACHE_KEEP for n in per_stage.values()), \
        per_stage
    # the newest entry (batch_size=64) is among the survivors
    assert any("64" in repr(k) for k in shared["loaders"])
