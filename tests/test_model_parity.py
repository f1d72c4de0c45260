"""Full-model forward parity: our DeepFM vs the reference's PyTorch DeepFM
with identical weights on identical tiny_parquet batches — the end-to-end
oracle across embedding fusion, FM, LR, and MLP."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_STUBS = os.path.join(os.path.dirname(__file__), "_ref_stubs")
for p in ("/root/reference", _STUBS,
          "/root/reference/model_zoo/DeepFM/DeepFM_torch"):
    if p not in sys.path:
        sys.path.insert(0, p)

torch = pytest.importorskip("torch")
try:
    from fuxictr.features import FeatureMap as RefFM
    from src.DeepFM import DeepFM as RefDeepFM
except Exception as exc:  # pragma: no cover
    pytest.skip(f"reference not importable: {exc}", allow_module_level=True)

from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.models.zoo.ranking import DeepFM

FM_JSON = "/root/reference/data/tiny_parquet/feature_map.json"
DATA_DIR = "/root/reference/data/tiny_parquet"
EMB_DIM = 4

REF_KWARGS = dict(
    gpu=-1, embedding_dim=EMB_DIM, hidden_units=[16, 8],
    hidden_activations="ReLU", net_dropout=0, batch_norm=False,
    optimizer="adam", loss="binary_crossentropy", learning_rate=1e-3,
    model_root="/tmp/ref_parity", verbose=0, monitor="AUC",
    monitor_mode="max", early_stop_patience=2, save_best_only=True,
    eval_steps=None, embedding_regularizer=None, net_regularizer=None,
    reduce_lr_on_plateau=True, task="binary_classification", metrics=["AUC"])


def test_deepfm_forward_parity(tmp_path):
    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ours = DeepFM(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                  hidden_activations="relu", net_dropout=0, batch_norm=False,
                  model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ref = RefDeepFM(ref_fm, **REF_KWARGS)
    ref.eval()

    # ---- copy weights: fused table rows → per-field nn.Embedding
    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])
    lr_layout = EmbeddingLayout(fm, 1, use_pretrain=False, use_sharing=False,
                                force_dim=1)
    lr_table = np.asarray(params["fm"]["lr"]["embedding"]["table_d1"])
    with torch.no_grad():
        emb_layers = ref.embedding_layer.embedding_layer.embedding_layers
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]]
            emb_layers[name].weight.copy_(torch.from_numpy(rows))
        lr_emb = ref.fm.lr_layer.embedding_layer \
            .embedding_layer.embedding_layers
        for name, plan in lr_layout.fields.items():
            rows = lr_table[plan["offset"]:plan["offset"]
                            + plan["spec"]["vocab_size"]]
            lr_emb[name].weight.copy_(torch.from_numpy(rows))
        ref.fm.lr_layer.bias.copy_(torch.from_numpy(
            np.asarray(params["fm"]["lr"]["bias"])))
        lins = [m for m in ref.mlp.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(params["mlp"][key]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(
                np.asarray(params["mlp"][key]["bias"])))

    # ---- identical batch from the fixture
    import pandas as pd
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(32)
    batch_np = {c: df[c].to_numpy() for c in df.columns}
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(len(df), np.float32)

    pred = ours._make_predict_step()(ours.state,
                                     jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v)) for c, v in
                   batch_np.items()}
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)
