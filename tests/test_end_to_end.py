"""End-to-end smoke + learning tests on the tiny fixtures (the reference's
test strategy: run every model's *_test expid one epoch — tests/test_torch.sh)."""

import numpy as np
import pytest

from fuxictr_tpu.experiment import run_expid

CFG = "/root/repo/configs/tiny"

RANKING_EXPIDS = [
    "LR_test", "FM_test", "DNN_test", "WideDeep_test", "DeepFM_test",
    "DCN_test", "DCNv2_test", "DCNv2_mix_test", "xDeepFM_test", "AutoInt_test",
    "NFM_test", "AFM_test", "FFM_test", "FFMv2_test", "FwFM_test",
    "FmFM_test", "HOFM_test", "LorentzFM_test", "HFM_test", "PNN_test",
    "ONN_test", "DeepCrossing_test", "DeepIM_test", "FiGNN_test",
    "FGCNN_test", "InterHAt_test", "AFN_test", "DESTINE_test",
    "MaskNet_test", "MaskNetP_test", "SAM_test", "SAM3A_test",
    "AOANet_test", "DLRM_test", "DSSM_test", "FLEN_test", "FinalMLP_test",
    "FinalNet_test", "EulerNet_test", "WuKong_test", "QNN_test",
    "GDCN_test", "GDCNP_test", "EDCN_test", "CCPM_test", "FiBiNET_test",
    "DCNv3_test", "DCNv3_ecn_test",
    "PPNet_test", "APG_DeepFM_test", "APG_DCNv2_test",
    "DIN_test", "DIEN_test", "BST_test", "TransAct_test", "DMIN_test",
    "DMR_test", "MMoE_test", "PLE_test", "SIM_test", "TWIN_test",
    "ETA_test", "ETA_pp_test", "TWIN_pp_test", "SDIM_test", "LongDIN_test",
    # round 2: full 67/67 smoke matrix
    "MIRRN_test", "PEPNet_test", "ShareBottom_test", "ONNv2_test",
    "LongDIEN_test", "LongDCNv2_test", "LongFinalMLP_test",
    "LongTransAct_test",
]


@pytest.mark.parametrize("expid", RANKING_EXPIDS)
def test_model_smoke(expid, tmp_path):
    from fuxictr_tpu.config import load_config
    params = load_config(CFG, expid)
    params["model_root"] = str(tmp_path)
    result = run_expid(CFG, expid, params=params)
    assert 0.0 < result["valid"]["AUC"] <= 1.0
    # finite-sanity bound only: the reference smoke harness checks exit
    # codes, and exp/complex-dynamics models (AFN, EulerNet) legitimately
    # start with large logits on 1 epoch of 100 rows
    assert np.isfinite(result["valid"]["logloss"])
    assert result["valid"]["logloss"] < 50.0


def test_deepfm_learns(tmp_path):
    """DeepFM should fit the tiny train set well within a few epochs."""
    from fuxictr_tpu.config import load_config
    params = load_config(CFG, "DeepFM_test")
    params.update(model_root=str(tmp_path), epochs=3)
    result = run_expid(CFG, "DeepFM_test", params=params)
    assert result["valid"]["AUC"] > 0.6


def test_npz_format(tmp_path):
    from fuxictr_tpu.config import load_config
    params = load_config(CFG, "DeepFM_test")
    params.update(
        model_root=str(tmp_path), dataset_id="tiny_npz", data_format="npz",
        train_data="/root/reference/data/tiny_npz/train.npz",
        valid_data="/root/reference/data/tiny_npz/valid.npz",
        test_data="/root/reference/data/tiny_npz/test.npz")
    result = run_expid(CFG, "DeepFM_test", params=params)
    assert 0.0 < result["valid"]["AUC"] <= 1.0


def test_streaming_shuffle_buffer(tmp_path):
    """The cross-block shuffle buffer mixes rows ACROSS part files (the
    reference's torchdata 100k-row buffer semantics,
    parquet_block_dataloader.py:91) and still visits every row once."""
    from fuxictr_tpu.data import BlockStreamingDataLoader
    from fuxictr_tpu.utils.synthetic import make_synthetic_feature_map
    fm = make_synthetic_feature_map(num_categorical=1, num_numeric=0,
                                    vocab_size=100000)
    n_parts, rows = 4, 256
    for p in range(n_parts):
        ids = np.arange(p * rows, (p + 1) * rows, dtype=np.int32) + 1
        np.savez(tmp_path / f"part_{p:05d}.npz", C1=ids,
                 label=np.zeros(rows, np.float32))
    loader = BlockStreamingDataLoader(
        fm, str(tmp_path), batch_size=64, shuffle=True, seed=7,
        buffer_size=600)   # > 2 part files → must mix across blocks
    batches = list(loader)
    assert len(batches) == len(loader) == n_parts * rows // 64
    seen = np.concatenate([b["C1"][b["__mask__"] > 0] for b in batches])
    np.testing.assert_array_equal(np.sort(seen),
                                  np.arange(n_parts * rows) + 1)
    # the first batch must contain rows from >1 source part — a per-block
    # shuffle cannot do this (each part holds a distinct id range)
    first_parts = np.unique((batches[0]["C1"] - 1) // rows)
    assert len(first_parts) > 1
    # different epochs yield different orders
    second = list(loader)
    assert any(not np.array_equal(a["C1"], b["C1"])
               for a, b in zip(batches, second))


def test_streaming_loader_equivalence():
    """Streaming vs in-memory loaders must visit the same rows."""
    from fuxictr_tpu.data import (BlockStreamingDataLoader, InMemoryDataLoader)
    from fuxictr_tpu.features import FeatureMap
    fm = FeatureMap("tiny_parquet", "/root/reference/data/tiny_parquet")
    fm.load("/root/reference/data/tiny_parquet/feature_map.json", {})
    path = "/root/reference/data/tiny_parquet/train.parquet"
    mem = InMemoryDataLoader(fm, path, batch_size=32, shuffle=False)
    stream = BlockStreamingDataLoader(fm, path, batch_size=32, shuffle=False)
    assert len(mem) == len(stream) == 4
    assert mem.num_samples == stream.num_samples == 100
    a = np.concatenate([b["userid"][b["__mask__"] > 0] for b in mem])
    b = np.concatenate([b["userid"][b["__mask__"] > 0] for b in stream])
    np.testing.assert_array_equal(a, b)
