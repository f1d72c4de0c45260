"""Config-driven experiment system.

Reproduces the reference's two-file YAML semantics (`Base` section merged
under the expid section; dataset config keyed by dataset_id — cf.
/root/reference/fuxictr/utils.py:31-109) plus logging and the weighted-sum
early-stop Monitor. No ``eval()`` anywhere: strings that name initializers,
encoders, or metrics are resolved through explicit registries.
"""

import glob
import json
import logging
import os
from collections import OrderedDict

import yaml


def load_config(config_dir, experiment_id):
    """Merged model + dataset params for an experiment id."""
    params = load_model_config(config_dir, experiment_id)
    data_params = load_dataset_config(config_dir, params["dataset_id"])
    params.update(data_params)
    return params


def load_model_config(config_dir, experiment_id):
    """Load ``model_config.yaml`` (or ``model_config/*.yaml``) and merge
    the ``Base`` section with the expid section (expid wins on conflict)."""
    model_configs = glob.glob(os.path.join(config_dir, "model_config.yaml"))
    if not model_configs:
        model_configs = sorted(glob.glob(os.path.join(config_dir, "model_config/*.yaml")))
    if not model_configs:
        raise RuntimeError(f"config_dir={config_dir} is not valid!")
    found = {}
    for config in model_configs:
        with open(config, "r") as fd:
            cfg = yaml.safe_load(fd)
        if "Base" in cfg:
            found["Base"] = cfg["Base"]
        if experiment_id in cfg:
            found[experiment_id] = cfg[experiment_id]
        if len(found) == 2:
            break
    params = dict(found.get("Base", {}))
    params.update(found.get(experiment_id, {}))
    if "dataset_id" not in params:
        raise RuntimeError(f"expid={experiment_id} is not valid in config.")
    params["model_id"] = experiment_id
    return params


def load_dataset_config(config_dir, dataset_id):
    """Load the dataset section keyed by ``dataset_id``."""
    params = {"dataset_id": dataset_id}
    dataset_configs = glob.glob(os.path.join(config_dir, "dataset_config.yaml"))
    if not dataset_configs:
        dataset_configs = sorted(glob.glob(os.path.join(config_dir, "dataset_config/*.yaml")))
    for config in dataset_configs:
        with open(config, "r") as fd:
            cfg = yaml.safe_load(fd)
        if dataset_id in cfg:
            params.update(cfg[dataset_id])
            return params
    raise RuntimeError(f"dataset_id={dataset_id} is not found in config.")


def set_logger(params, stream=True):
    """Per-run logger at ``<model_root>/<dataset_id>/<model_id>.log``."""
    dataset_id = params["dataset_id"]
    model_id = params.get("model_id", "")
    log_dir = os.path.join(params.get("model_root", "./checkpoints"), dataset_id)
    os.makedirs(log_dir, exist_ok=True)
    log_file = os.path.join(log_dir, model_id + ".log")
    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)
    handlers = [logging.FileHandler(log_file, mode="w")]
    if stream:
        handlers.append(logging.StreamHandler())
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s P%(process)d %(levelname)s %(message)s",
        handlers=handlers)
    import fuxictr_tpu
    logging.info("fuxictr_tpu version: %s", fuxictr_tpu.__version__)


def print_to_json(data, sort_keys=True):
    new_data = {k: str(v) for k, v in data.items()}
    if sort_keys:
        new_data = OrderedDict(sorted(new_data.items(), key=lambda x: x[0]))
    return json.dumps(new_data, indent=4)


def print_to_list(data):
    return " - ".join(f"{k}: {v:.6f}" for k, v in data.items())


class Monitor:
    """Weighted-sum early-stop criterion, e.g. ``{'AUC': 1, 'logloss': -1}``."""

    def __init__(self, kv):
        if isinstance(kv, str):
            kv = {kv: 1}
        self.kv_pairs = kv

    def get_value(self, logs):
        return sum(logs.get(k, 0) * w for k, w in self.kv_pairs.items())

    def get_metrics(self):
        return list(self.kv_pairs.keys())


def not_in_whitelist(element, whitelist=()):
    """True if ``element`` is excluded by a non-empty whitelist."""
    if not whitelist:
        return False
    if isinstance(whitelist, (list, tuple)):
        return element not in whitelist
    return element != whitelist
