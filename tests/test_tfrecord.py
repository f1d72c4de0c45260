"""TFRecord input format: pure-Python reader vs the npz build of the same
tiny rows (both fixtures encode identical data, so columns must match
exactly), plus an end-to-end train on tfrecord input."""

import numpy as np

from fuxictr_tpu.data.tfrecord import count_records, load_tfrecord_columns
from fuxictr_tpu.features import FeatureMap

DATA = "/root/repo/data/tiny_tfrecord"


def _fm():
    fm = FeatureMap("tiny_tfrecord", DATA)
    fm.load(f"{DATA}/feature_map.json", {})
    return fm


def test_tfrecord_columns_match_npz_build():
    fm = _fm()
    cols = load_tfrecord_columns(fm, f"{DATA}/train.tfrecord")
    raw = np.load("/root/repo/data/tiny_npz/train.npz", allow_pickle=True)
    assert count_records(f"{DATA}/train.tfrecord") == 100
    for name in list(fm.features) + fm.labels:
        if name not in raw:
            continue
        ref = raw[name]
        if ref.dtype == object:
            ref = np.stack(ref)
        if ref.ndim == 2 and name in fm.features \
                and fm.features[name]["type"] == "sequence":
            ref = ref[:, :fm.features[name]["max_len"]]
        np.testing.assert_array_equal(
            np.asarray(cols[name], dtype=np.float64),
            np.asarray(ref[:100], dtype=np.float64), err_msg=name)


def test_tfrecord_end_to_end(tmp_path):
    from fuxictr_tpu.config import load_config
    from fuxictr_tpu.experiment import run_expid
    params = load_config("/root/repo/configs/tiny", "DNN_test")
    params.update(
        model_root=str(tmp_path), dataset_id="tiny_tfrecord",
        data_format="tfrecord",
        train_data=f"{DATA}/train.tfrecord",
        valid_data=f"{DATA}/valid.tfrecord",
        test_data=f"{DATA}/test.tfrecord",
        feature_specs=None)
    result = run_expid("/root/repo/configs/tiny", "DNN_test", params=params)
    assert 0.0 < result["valid"]["AUC"] <= 1.0
