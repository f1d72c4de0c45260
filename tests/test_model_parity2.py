"""Full-model forward-parity oracles, part 2: the remaining ranking models.

Same identical-weights technique as tests/test_model_parity.py — our flax
model's initialized params are copied into the reference's torch model and
both forwards are compared on identical tiny_parquet fixture rows. Together
with part 1 / the LongCTR file this gives every registered model a
reference oracle.
"""

import importlib.util
import os
import sys

import jax
import numpy as np
import pytest

_STUBS = os.path.join(os.path.dirname(__file__), "_ref_stubs")
for p in ("/root/reference", _STUBS):
    if p not in sys.path:
        sys.path.insert(0, p)

torch = pytest.importorskip("torch")
try:
    from fuxictr.features import FeatureMap as RefFM
except Exception as exc:  # pragma: no cover
    pytest.skip(f"reference not importable: {exc}", allow_module_level=True)

from fuxictr_tpu.features import FeatureMap

FM_JSON = "/root/reference/data/tiny_parquet/feature_map.json"
DATA_DIR = "/root/reference/data/tiny_parquet"
EMB_DIM = 4

BASE_KWARGS = dict(
    gpu=-1, optimizer="adam", loss="binary_crossentropy", learning_rate=1e-3,
    model_root="/tmp/ref_parity2", verbose=0, monitor="AUC",
    monitor_mode="max", early_stop_patience=2, save_best_only=True,
    eval_steps=None, embedding_regularizer=None, net_regularizer=None,
    reduce_lr_on_plateau=True, task="binary_classification", metrics=["AUC"])


def _load_ref(name, class_name=None):
    """Import the reference model class from model_zoo/<name>/(src|*_torch/src)."""
    class_name = class_name or name
    base = f"/root/reference/model_zoo/{name}"
    for sub in ("src", f"{name}_torch/src"):
        for fname in (class_name, name):
            path = f"{base}/{sub}/{fname}.py"
            if os.path.exists(path):
                spec = importlib.util.spec_from_file_location(
                    f"ref_{fname}", path)
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
                if hasattr(mod, class_name):
                    return getattr(mod, class_name)
    raise FileNotFoundError(f"no reference source for {name}")


def _feature_maps(overrides=None):
    overrides = dict({"embedding_dim": EMB_DIM}, **(overrides or {}))
    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, overrides)
    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, overrides)
    return fm, ref_fm


def _fixture_batch(n=32):
    import pandas as pd
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(n)
    batch_np = {c: df[c].to_numpy() for c in df.columns}
    batch_ours = dict(batch_np, __mask__=np.ones(len(df), np.float32))
    torch_batch = {c: torch.from_numpy(np.asarray(v)) for c, v in
                   batch_np.items()}
    return batch_ours, torch_batch


def _copy_fused_table(params, ref, fm, dim=EMB_DIM, key="embedding"):
    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, dim)
    table = np.asarray(params[key][f"table_d{dim}"])
    emb_layers = ref.embedding_layer.embedding_layer.embedding_layers
    for name, plan in layout.fields.items():
        rows = table[plan["offset"]:plan["offset"]
                     + plan["spec"]["vocab_size"]]
        emb_layers[name].weight.copy_(torch.from_numpy(rows))


def _copy_lr(params, ref_lr, fm, key):
    """Our dim-1 fused LR table (+ bias if present) → reference LR layer."""
    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    lr_layout = EmbeddingLayout(fm, 1, use_pretrain=False, use_sharing=False,
                                force_dim=1)
    sub = params[key]
    lr_table = np.asarray(sub["embedding"]["table_d1"])
    lr_emb = ref_lr.embedding_layer.embedding_layer.embedding_layers
    for name, plan in lr_layout.fields.items():
        rows = lr_table[plan["offset"]:plan["offset"]
                        + plan["spec"]["vocab_size"]]
        lr_emb[name].weight.copy_(torch.from_numpy(rows))
    if "bias" in sub:
        ref_lr.bias.copy_(torch.from_numpy(np.asarray(sub["bias"])))


def _copy_mlp(params, ref_mlp, key, n_dense):
    lins = [m for m in ref_mlp.mlp if isinstance(m, torch.nn.Linear)]
    assert len(lins) == n_dense, (key, len(lins), n_dense)
    for i, lin in enumerate(lins):
        lin.weight.copy_(torch.from_numpy(
            np.asarray(params[key][f"Dense_{i}"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(
            np.asarray(params[key][f"Dense_{i}"]["bias"])))


def _copy_dense(params_sub, ref_linear):
    ref_linear.weight.copy_(torch.from_numpy(
        np.asarray(params_sub["kernel"]).T))
    if getattr(ref_linear, "bias", None) is not None and "bias" in params_sub:
        ref_linear.bias.copy_(torch.from_numpy(
            np.asarray(params_sub["bias"])))


def _assert_parity(ours, ref, atol=1e-5, rtol=1e-4, n=32):
    batch_ours, torch_batch = _fixture_batch(n)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    ref.eval()
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=rtol, atol=atol)


def _init(ours):
    ours.init_params()
    return jax.device_get(ours.state.params)


# ---------------------------------------------------------------- oracles

def test_lr_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking import LR as OurLR
    RefLR = _load_ref("LR")
    fm, ref_fm = _feature_maps()
    ours = OurLR(fm, model_root=str(tmp_path))
    params = _init(ours)
    kw = {k: v for k, v in BASE_KWARGS.items()
          if k not in ("embedding_regularizer", "net_regularizer")}
    ref = RefLR(ref_fm, regularizer=None, **kw)
    with torch.no_grad():
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
    _assert_parity(ours, ref)


def test_fm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking import FM as OurFM
    RefFMModel = _load_ref("FM")
    fm, ref_fm = _feature_maps()
    ours = OurFM(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path))
    params = _init(ours)
    kw = {k: v for k, v in BASE_KWARGS.items()
          if k not in ("embedding_regularizer", "net_regularizer")}
    ref = RefFMModel(ref_fm, embedding_dim=EMB_DIM, regularizer=None, **kw)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_lr(params["fm"], ref.fm.lr_layer, fm, "lr")
    _assert_parity(ours, ref)


def test_dnn_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking import DNN as OurDNN
    RefDNN = _load_ref("DNN")
    fm, ref_fm = _feature_maps()
    ours = OurDNN(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                  model_root=str(tmp_path))
    params = _init(ours)
    ref = RefDNN(ref_fm, embedding_dim=EMB_DIM, hidden_units=[16, 8],
                 hidden_activations="ReLU", net_dropout=0, batch_norm=False,
                 **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_mlp(params, ref.mlp, "mlp", 3)
    _assert_parity(ours, ref)


def test_widedeep_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking import WideDeep as OurWD
    RefWD = _load_ref("WideDeep")
    fm, ref_fm = _feature_maps()
    ours = OurWD(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                 model_root=str(tmp_path))
    params = _init(ours)
    ref = RefWD(ref_fm, embedding_dim=EMB_DIM, hidden_units=[16, 8],
                hidden_activations="ReLU", net_dropout=0, batch_norm=False,
                **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_lr(params, ref.lr_layer, fm, "embedding_wide")
        _copy_mlp(params, ref.dnn, "mlp", 3)
    _assert_parity(ours, ref)


def test_dcn_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking import DCN as OurDCN
    RefDCN = _load_ref("DCN")
    fm, ref_fm = _feature_maps()
    ours = OurDCN(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                  crossing_layers=3, model_root=str(tmp_path))
    params = _init(ours)
    ref = RefDCN(ref_fm, embedding_dim=EMB_DIM, dnn_hidden_units=[16, 8],
                 dnn_activations="ReLU", num_cross_layers=3, net_dropout=0,
                 batch_norm=False, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        for i, layer in enumerate(ref.crossnet.cross_net):
            layer.weight.weight.copy_(torch.from_numpy(
                np.asarray(params["crossnet"][f"w_{i}"]).T))
            layer.bias.copy_(torch.from_numpy(
                np.asarray(params["crossnet"][f"b_{i}"])))
        _copy_mlp(params, ref.dnn, "dnn", 2)
        _copy_dense(params["fc"], ref.fc)
    _assert_parity(ours, ref)


def test_nfm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import NFM as OurNFM
    RefNFM = _load_ref("NFM")
    fm, ref_fm = _feature_maps()
    ours = OurNFM(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                  model_root=str(tmp_path))
    params = _init(ours)
    ref = RefNFM(ref_fm, embedding_dim=EMB_DIM, hidden_units=[16, 8],
                 hidden_activations="ReLU", net_dropout=0, batch_norm=False,
                 **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
        _copy_mlp(params, ref.dnn, "dnn", 3)
    _assert_parity(ours, ref)


def test_afm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import AFM as OurAFM
    RefAFM = _load_ref("AFM")
    fm, ref_fm = _feature_maps()
    ours = OurAFM(fm, embedding_dim=EMB_DIM, attention_dim=10,
                  model_root=str(tmp_path))
    params = _init(ours)
    ref = RefAFM(ref_fm, embedding_dim=EMB_DIM, attention_dim=10,
                 attention_dropout=[0, 0], use_attention=True, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
        _copy_dense(params["attention_1"], ref.attention[0])
        _copy_dense(params["attention_2"], ref.attention[2])
        _copy_dense(params["weight_p"], ref.weight_p)
    _assert_parity(ours, ref)


def test_pnn_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import PNN as OurPNN
    RefPNN = _load_ref("PNN")
    fm, ref_fm = _feature_maps()
    ours = OurPNN(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                  model_root=str(tmp_path))
    params = _init(ours)
    ref = RefPNN(ref_fm, embedding_dim=EMB_DIM, hidden_units=[16, 8],
                 hidden_activations="ReLU", net_dropout=0, batch_norm=False,
                 product_type="inner", **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_mlp(params, ref.dnn, "dnn", 3)
    _assert_parity(ours, ref)


def test_ffm_forward_parity(tmp_path):
    """FFM: our fused [B,F,F-1,D] tensor vs the reference's ModuleList of
    F-1 per-target-field FeatureEmbeddings (FFM.py:52-91)."""
    from fuxictr_tpu.models.zoo.ranking2 import FFM as OurFFM
    RefFFM = _load_ref("FFM")
    fm, ref_fm = _feature_maps()
    ours = OurFFM(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path))
    params = _init(ours)
    kw = {k: v for k, v in BASE_KWARGS.items()
          if k not in ("embedding_regularizer", "net_regularizer")}
    ref = RefFFM(ref_fm, embedding_dim=EMB_DIM, regularizer=None, **kw)
    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    F = fm.num_fields
    layout = EmbeddingLayout(fm, EMB_DIM * (F - 1))
    table = np.asarray(params["embedding"][f"table_d{EMB_DIM * (F - 1)}"])
    with torch.no_grad():
        for t in range(F - 1):
            emb_layers = ref.embedding_layers[t] \
                .embedding_layer.embedding_layers
            for name, plan in layout.fields.items():
                rows = table[plan["offset"]:plan["offset"]
                             + plan["spec"]["vocab_size"],
                             t * EMB_DIM:(t + 1) * EMB_DIM]
                emb_layers[name].weight.copy_(torch.from_numpy(rows.copy()))
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
    _assert_parity(ours, ref)


def test_ffmv2_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import FFMv2 as OurFFMv2
    RefFFMv2 = _load_ref("FFM", "FFMv2")
    fm, ref_fm = _feature_maps()
    ours = OurFFMv2(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path))
    params = _init(ours)
    kw = {k: v for k, v in BASE_KWARGS.items()
          if k not in ("embedding_regularizer", "net_regularizer")}
    ref = RefFFMv2(ref_fm, embedding_dim=EMB_DIM, regularizer=None, **kw)
    F = fm.num_fields
    with torch.no_grad():
        _copy_fused_table(params, ref, fm, dim=EMB_DIM * (F - 1))
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
    _assert_parity(ours, ref)


def test_hofm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import HOFM as OurHOFM
    RefHOFM = _load_ref("HOFM")
    fm, ref_fm = _feature_maps()
    ours = OurHOFM(fm, embedding_dim=EMB_DIM, order=3, reuse_embedding=False,
                   model_root=str(tmp_path))
    params = _init(ours)
    kw = {k: v for k, v in BASE_KWARGS.items()
          if k not in ("embedding_regularizer", "net_regularizer")}
    ref = RefHOFM(ref_fm, order=3, embedding_dim=[EMB_DIM, EMB_DIM],
                  reuse_embedding=False, regularizer=None, **kw)
    with torch.no_grad():
        for i in range(2):
            fake = type("R", (), {"embedding_layer":
                                  ref.embedding_layers[i]})()
            _copy_fused_table(params, fake, fm, key=f"embedding_{i}")
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
    _assert_parity(ours, ref)


def test_fwfm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import FwFM as OurFwFM
    RefFwFM = _load_ref("FwFM")
    fm, ref_fm = _feature_maps()
    ours = OurFwFM(fm, embedding_dim=EMB_DIM, linear_type="FiLV",
                   model_root=str(tmp_path))
    params = _init(ours)
    kw = {k: v for k, v in BASE_KWARGS.items()
          if k not in ("embedding_regularizer", "net_regularizer")}
    ref = RefFwFM(ref_fm, embedding_dim=EMB_DIM, linear_type="FiLV",
                  regularizer=None, **kw)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_dense(params["interaction_weight"], ref.interaction_weight)
        _copy_dense(params["filv"], ref.linear_weight_layer)
    _assert_parity(ours, ref)


def test_fmfm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import FmFM as OurFmFM
    RefFmFM = _load_ref("FmFM")
    fm, ref_fm = _feature_maps()
    ours = OurFmFM(fm, embedding_dim=EMB_DIM,
                   field_interaction_type="matrixed", model_root=str(tmp_path))
    params = _init(ours)
    kw = {k: v for k, v in BASE_KWARGS.items()
          if k not in ("embedding_regularizer", "net_regularizer")}
    ref = RefFmFM(ref_fm, embedding_dim=EMB_DIM,
                  field_interaction_type="matrixed", regularizer=None, **kw)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        ref.interaction_weight.copy_(torch.from_numpy(
            np.asarray(params["interaction_weight"])))
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
    _assert_parity(ours, ref)


def test_lorentzfm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import LorentzFM as OurLFM
    RefLFM = _load_ref("LorentzFM")
    fm, ref_fm = _feature_maps()
    ours = OurLFM(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path))
    params = _init(ours)
    kw = {k: v for k, v in BASE_KWARGS.items()
          if k not in ("embedding_regularizer", "net_regularizer")}
    ref = RefLFM(ref_fm, embedding_dim=EMB_DIM, regularizer=None, **kw)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
    _assert_parity(ours, ref)


def test_hfm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking2 import HFM as OurHFM
    RefHFM = _load_ref("HFM")
    fm, ref_fm = _feature_maps()
    ours = OurHFM(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                  interaction_type="circular_convolution", use_dnn=True,
                  model_root=str(tmp_path))
    params = _init(ours)
    ref = RefHFM(ref_fm, embedding_dim=EMB_DIM, hidden_units=[16, 8],
                 interaction_type="circular_convolution", use_dnn=True,
                 hidden_activations="ReLU", net_dropout=0, batch_norm=False,
                 **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
        _copy_mlp(params, ref.dnn, "dnn", 3)
    _assert_parity(ours, ref)


def test_deepcrossing_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import DeepCrossing as OurDC
    RefDC = _load_ref("DeepCrossing")
    fm, ref_fm = _feature_maps()
    ours = OurDC(fm, embedding_dim=EMB_DIM, residual_blocks=(16, 8),
                 model_root=str(tmp_path))
    params = _init(ours)
    ref = RefDC(ref_fm, embedding_dim=EMB_DIM, residual_blocks=[16, 8],
                hidden_activations="ReLU", net_dropout=0, batch_norm=False,
                use_residual=True, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        for i in range(2):
            block = ref.crossing_layer[i]
            _copy_dense(params[f"res_{i}"]["fc1"], block.layer[0])
            _copy_dense(params[f"res_{i}"]["fc2"], block.layer[2])
        _copy_dense(params["fc"], ref.crossing_layer[-1])
    _assert_parity(ours, ref)


def test_ccpm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import CCPM as OurCCPM
    RefCCPM = _load_ref("CCPM")
    fm, ref_fm = _feature_maps()
    ours = OurCCPM(fm, embedding_dim=EMB_DIM, channels=(4, 4, 2),
                   kernel_heights=(6, 5, 3), model_root=str(tmp_path))
    params = _init(ours)
    ref = RefCCPM(ref_fm, embedding_dim=EMB_DIM, channels=[4, 4, 2],
                  kernel_heights=[6, 5, 3], activation="Tanh", **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        convs = [m for m in ref.conv_layer.conv_layer
                 if isinstance(m, torch.nn.Conv2d)]
        for i, conv in enumerate(convs):
            k = np.asarray(params[f"conv_{i}"]["kernel"])  # (kh, 1, in, out)
            conv.weight.copy_(torch.from_numpy(
                np.transpose(k, (3, 2, 0, 1)).copy()))      # (out, in, kh, 1)
            conv.bias.copy_(torch.from_numpy(
                np.asarray(params[f"conv_{i}"]["bias"])))
        _copy_dense(params["fc"], ref.fc)
    _assert_parity(ours, ref)


def test_deepim_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import DeepIM as OurDeepIM
    RefDeepIM = _load_ref("DeepIM")
    fm, ref_fm = _feature_maps()
    ours = OurDeepIM(fm, embedding_dim=EMB_DIM, im_order=3,
                     hidden_units=(16, 8), model_root=str(tmp_path))
    params = _init(ours)
    ref = RefDeepIM(ref_fm, embedding_dim=EMB_DIM, im_order=3,
                    im_batch_norm=False, hidden_units=[16, 8],
                    hidden_activations="ReLU", net_dropout=0,
                    net_batch_norm=False, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_dense(params["im"]["fc"], ref.im_layer.fc)
        _copy_mlp(params, ref.dnn, "dnn", 3)
    _assert_parity(ours, ref)


def _copy_fused_table_dict(params, ref_dict_layer, fm, dim=EMB_DIM,
                           key="embedding"):
    """Fused table → a reference FeatureEmbeddingDict (used directly by
    DSSM/FLEN instead of the FeatureEmbedding wrapper)."""
    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, dim)
    table = np.asarray(params[key][f"table_d{dim}"])
    for name, plan in layout.fields.items():
        rows = table[plan["offset"]:plan["offset"]
                     + plan["spec"]["vocab_size"]]
        ref_dict_layer.embedding_layers[name].weight.copy_(
            torch.from_numpy(rows.copy()))


def test_gdcn_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking4 import GDCN as OurGDCN
    RefGDCN = _load_ref("GDCN")
    fm, ref_fm = _feature_maps()
    ours = OurGDCN(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                   num_cross_layers=3, model_root=str(tmp_path))
    params = _init(ours)
    ref = RefGDCN(ref_fm, embedding_dim=EMB_DIM, dnn_hidden_units=[16, 8],
                  dnn_activations="ReLU", num_cross_layers=3, net_dropout=0,
                  batch_norm=False, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        for i in range(3):
            ref.cross_net.w[i].weight.copy_(torch.from_numpy(
                np.asarray(params["cross_net"][f"w_{i}"]["kernel"]).T))
            ref.cross_net.wg[i].weight.copy_(torch.from_numpy(
                np.asarray(params["cross_net"][f"wg_{i}"]["kernel"]).T))
            ref.cross_net.b[i].copy_(torch.from_numpy(
                np.asarray(params["cross_net"][f"b_{i}"])))
        lins = [m for m in ref.dnn.mlp if isinstance(m, torch.nn.Linear)]
        for i in range(2):
            _copy_dense(params["dnn"][f"Dense_{i}"], lins[i])
        _copy_dense(params["fc"], lins[2])
    _assert_parity(ours, ref)


def test_gdcnp_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking4 import GDCNP as OurGDCNP
    RefGDCNP = _load_ref("GDCN", "GDCNP")
    fm, ref_fm = _feature_maps()
    ours = OurGDCNP(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                    num_cross_layers=3, model_root=str(tmp_path))
    params = _init(ours)
    ref = RefGDCNP(ref_fm, embedding_dim=EMB_DIM, dnn_hidden_units=[16, 8],
                   dnn_activations="ReLU", num_cross_layers=3, net_dropout=0,
                   batch_norm=False, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        for i in range(3):
            ref.cross_net.w[i].weight.copy_(torch.from_numpy(
                np.asarray(params["cross_net"][f"w_{i}"]["kernel"]).T))
            ref.cross_net.wg[i].weight.copy_(torch.from_numpy(
                np.asarray(params["cross_net"][f"wg_{i}"]["kernel"]).T))
            ref.cross_net.b[i].copy_(torch.from_numpy(
                np.asarray(params["cross_net"][f"b_{i}"])))
        _copy_mlp(params, ref.dnn, "dnn", 2)
        _copy_dense(params["fc"], ref.fc)
    _assert_parity(ours, ref)


def test_afn_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import AFN as OurAFN
    RefAFN = _load_ref("AFN")
    fm, ref_fm = _feature_maps()
    ours = OurAFN(fm, embedding_dim=EMB_DIM, afn_hidden_units=(16, 8),
                  dnn_hidden_units=(16, 8), logarithmic_neurons=5,
                  ensemble_dnn=True, batch_norm=True, model_root=str(tmp_path))
    params = _init(ours)
    ref = RefAFN(ref_fm, embedding_dim=EMB_DIM, ensemble_dnn=True,
                 dnn_hidden_units=[16, 8], dnn_activations="ReLU",
                 dnn_dropout=0, afn_hidden_units=[16, 8],
                 afn_activations="ReLU", afn_dropout=0, logarithmic_neurons=5,
                 batch_norm=True, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        fake2 = type("R", (), {"embedding_layer": ref.embedding_layer2})()
        _copy_fused_table(params, fake2, fm, key="embedding2")
        ref.coefficient_W.weight.copy_(torch.from_numpy(
            np.asarray(params["coefficient_W"]).T))
        ref.log_batch_norm.weight.copy_(torch.from_numpy(
            np.asarray(params["log_bn"]["scale"])))
        ref.log_batch_norm.bias.copy_(torch.from_numpy(
            np.asarray(params["log_bn"]["bias"])))
        ref.exp_batch_norm.weight.copy_(torch.from_numpy(
            np.asarray(params["exp_bn"]["scale"])))
        ref.exp_batch_norm.bias.copy_(torch.from_numpy(
            np.asarray(params["exp_bn"]["bias"])))
        _copy_mlp(params, ref.dense_layer, "afn_dnn", 3)
        _copy_mlp(params, ref.dnn, "dnn", 3)
        _copy_dense(params["fc"], ref.fc)
    _assert_parity(ours, ref)


def test_flen_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import FLEN as OurFLEN
    RefFLEN = _load_ref("FLEN")
    fm, ref_fm = _feature_maps()
    ours = OurFLEN(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                   model_root=str(tmp_path))
    params = _init(ours)
    ref = RefFLEN(ref_fm, embedding_dim=EMB_DIM, dnn_hidden_units=[16, 8],
                  dnn_activations="ReLU", net_dropout=0, batch_norm=False,
                  **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table_dict(params, ref.embedding_layer, fm)
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
        _copy_dense(params["r_ij"], ref.r_ij)
        _copy_dense(params["r_mm"], ref.r_mm)
        _copy_dense(params["w_FwBI"], ref.w_FwBI[0])
        _copy_dense(params["w_F"], ref.w_F)
        _copy_mlp(params, ref.dnn, "dnn", 2)
    _assert_parity(ours, ref)


def test_sam_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import SAM as OurSAM
    RefSAM = _load_ref("SAM")
    fm, ref_fm = _feature_maps()
    ours = OurSAM(fm, embedding_dim=EMB_DIM, interaction_type="SAM2E",
                  aggregation="concat", model_root=str(tmp_path))
    params = _init(ours)
    ref = RefSAM(ref_fm, embedding_dim=EMB_DIM, interaction_type="SAM2E",
                 aggregation="concat", num_interaction_layers=3,
                 use_residual=False, net_dropout=0, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_dense(params["fc"], ref.fc)
    _assert_parity(ours, ref)


def test_aoanet_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import AOANet as OurAOANet
    RefAOANet = _load_ref("AOANet")
    fm, ref_fm = _feature_maps()
    ours = OurAOANet(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                     num_interaction_layers=3, num_subspaces=4,
                     model_root=str(tmp_path))
    params = _init(ours)
    ref = RefAOANet(ref_fm, embedding_dim=EMB_DIM, dnn_hidden_units=[16, 8],
                    dnn_hidden_activations="ReLU", num_interaction_layers=3,
                    num_subspaces=4, net_dropout=0, batch_norm=False,
                    **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_mlp(params, ref.dnn, "dnn", 2)
        for i, layer in enumerate(ref.gin.layers):
            layer.W.copy_(torch.from_numpy(
                np.asarray(params[f"gin_{i}"]["W"])))
            layer.alpha.copy_(torch.from_numpy(
                np.asarray(params[f"gin_{i}"]["alpha"])))
            layer.h.copy_(torch.from_numpy(
                np.asarray(params[f"gin_{i}"]["h"])))
        _copy_dense(params["fc"], ref.fc)
    _assert_parity(ours, ref)


def test_dlrm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import DLRM as OurDLRM
    RefDLRM = _load_ref("DLRM")
    fm, ref_fm = _feature_maps()
    ours = OurDLRM(fm, embedding_dim=EMB_DIM, top_mlp_units=(16, 8),
                   interaction_op="dot", model_root=str(tmp_path))
    params = _init(ours)
    ref = RefDLRM(ref_fm, embedding_dim=EMB_DIM, top_mlp_units=[16, 8],
                  bottom_mlp_units=[16, 8], top_mlp_activations="ReLU",
                  bottom_mlp_activations="ReLU", top_mlp_dropout=0,
                  bottom_mlp_dropout=0, interaction_op="dot",
                  batch_norm=False, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_mlp(params, ref.top_mlp, "top_mlp", 3)
    _assert_parity(ours, ref)


def test_dssm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking3 import DSSM as OurDSSM
    RefDSSM = _load_ref("DSSM")
    fm, ref_fm = _feature_maps()
    ours = OurDSSM(fm, embedding_dim=EMB_DIM, user_tower_units=(16, 8),
                   item_tower_units=(16, 8), model_root=str(tmp_path))
    params = _init(ours)
    ref = RefDSSM(ref_fm, embedding_dim=EMB_DIM, user_tower_units=[16, 8],
                  item_tower_units=[16, 8], user_tower_activations="ReLU",
                  item_tower_activations="ReLU", user_tower_dropout=0,
                  item_tower_dropout=0, batch_norm=False, **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table_dict(params, ref.embedding_layer, fm)
        _copy_mlp(params, ref.user_tower, "user_tower", 2)
        _copy_mlp(params, ref.item_tower, "item_tower", 2)
    _assert_parity(ours, ref)


def test_finalnet_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking4 import FinalNet as OurFinalNet
    RefFinalNet = _load_ref("FinalNet")
    fm, ref_fm = _feature_maps()
    ours = OurFinalNet(fm, embedding_dim=EMB_DIM, block_type="2B",
                       block1_hidden_units=(16, 8),
                       block2_hidden_units=(16, 8),
                       batch_norm=True, use_feature_gating=False,
                       model_root=str(tmp_path))
    params = _init(ours)
    ref = RefFinalNet(ref_fm, embedding_dim=EMB_DIM, block_type="2B",
                      batch_norm=True, use_feature_gating=False,
                      block1_hidden_units=[16, 8],
                      block1_hidden_activations=None, block1_dropout=0,
                      block2_hidden_units=[16, 8],
                      block2_hidden_activations=None, block2_dropout=0,
                      residual_type="concat", **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        for b, ref_block in (("block1", ref.block1), ("block2", ref.block2)):
            for i, fi in enumerate(ref_block.layer):
                _copy_dense(params[b][f"fi_{i}"]["linear"], fi.linear)
        _copy_dense(params["fc1"], ref.fc1)
        _copy_dense(params["fc2"], ref.fc2)
    _assert_parity(ours, ref)


def test_qnn_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.ranking4 import QNN as OurQNN
    RefQNN = _load_ref("QNN")
    fm, ref_fm = _feature_maps()
    ours = OurQNN(fm, embedding_dim=EMB_DIM, num_cross_layers=3,
                  neuron_type="T1", model_root=str(tmp_path))
    params = _init(ours)
    ref = RefQNN(ref_fm, embedding_dim=EMB_DIM, num_cross_layers=3,
                 net_dropout=0, batch_norm=False, hidden_activations="ReLU",
                 neuron_type="T1", **BASE_KWARGS)

    # the mounted reference's QNN calls embedding_layer(X, dynamic_emb_dim=
    # True), an API its own packaged fuxictr lacks (the model source is newer
    # than the library). With uniform embedding dims dynamic_emb_dim ==
    # flatten_emb, so shim the kwarg through.
    class _EmbShim(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, X, dynamic_emb_dim=False):
            return self.inner(X, flatten_emb=dynamic_emb_dim)

    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_dense(params["compressed"], ref.qnn.compressed)
        for i, layer in enumerate(ref.qnn.layer):
            layer.bi_linear.weight.copy_(torch.from_numpy(
                np.asarray(params[f"bilinear_{i}"])))
            layer.bi_linear.bias.copy_(torch.from_numpy(
                np.asarray(params[f"bilinear_b_{i}"])))
            _copy_dense(params[f"linear_{i}"], layer.linear)
        _copy_dense(params["fc"], ref.qnn.fc)
    ref.embedding_layer = _EmbShim(ref.embedding_layer)
    _assert_parity(ours, ref)


def test_onnv2_forward_parity(tmp_path):
    """Covers both ONN and ONNv2 registrations (our ONN implements the
    reference's vectorized ONNv2 formulation, which the reference's own
    unit-test asserts equivalent to ONN)."""
    from fuxictr_tpu.models.zoo.ranking2 import ONNv2 as OurONNv2
    RefONNv2 = _load_ref("ONN", "ONNv2")
    fm, ref_fm = _feature_maps()
    ours = OurONNv2(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                    model_root=str(tmp_path))
    params = _init(ours)
    ref = RefONNv2(ref_fm, embedding_dim=EMB_DIM, hidden_units=[16, 8],
                   hidden_activations="ReLU", net_dropout=0,
                   batch_norm=False, **BASE_KWARGS)
    F = fm.num_fields
    with torch.no_grad():
        _copy_fused_table(params, ref, fm, dim=EMB_DIM * F)
        _copy_mlp(params, ref.dnn, "dnn", 3)
    _assert_parity(ours, ref)


def _load_ref_pkg(name, module, class_name):
    """Load a reference model whose source uses relative imports
    (e.g. APG_DeepFM does ``from .APG import APG_MLP``) by registering its
    src/ dir as a package."""
    src = f"/root/reference/model_zoo/{name}/src"
    pkg_name = f"ref_pkg_{name}"
    if pkg_name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            pkg_name, os.path.join(src, "__init__.py"),
            submodule_search_locations=[src])
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[pkg_name] = pkg
        try:
            spec.loader.exec_module(pkg)
        except Exception:
            pass  # __init__ may import models with missing deps; submodule
                  # import below is what matters
    mod = importlib.import_module(f"{pkg_name}.{module}")
    return getattr(mod, class_name)


def _copy_apg_mlp(params_mlp, ref_apg_mlp, n_layers):
    """Our _APGMLP params → ref APG_MLP dense_layers (U/V + hypernet)."""
    for i in range(n_layers):
        sub = params_mlp[f"apg_linear_{i}"]
        ref_lin = ref_apg_mlp.dense_layers[f"linear_{i + 1}"]
        ref_lin.U.copy_(torch.from_numpy(np.asarray(sub["U"])))
        ref_lin.V.copy_(torch.from_numpy(np.asarray(sub["V"])))
        hyper_lins = [m for m in ref_lin.hypernet.mlp
                      if isinstance(m, torch.nn.Linear)]
        _copy_dense(sub["hypernet"]["Dense_0"], hyper_lins[0])


def test_apg_deepfm_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.dynamic import APG_DeepFM as OurAPG
    RefAPG = _load_ref_pkg("APG", "APG_DeepFM", "APG_DeepFM")
    fm, ref_fm = _feature_maps()
    ours = OurAPG(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                  rank_k=4, generate_bias=True, model_root=str(tmp_path))
    params = _init(ours)
    ref = RefAPG(ref_fm, embedding_dim=EMB_DIM, hidden_units=[16, 8],
                 hidden_activations="ReLU", net_dropout=0, batch_norm=False,
                 hypernet_config={}, condition_features=[],
                 condition_mode="self-wise", new_condition_emb=False,
                 rank_k=4, overparam_p=None, generate_bias=True,
                 **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table_dict(params, ref.embedding_layer, fm)
        _copy_lr(params["fm"], ref.fm.lr_layer, fm, "lr")
        _copy_apg_mlp(params["mlp"], ref.mlp, 2)
        _copy_dense(params["mlp"]["fc"], ref.mlp.dense_layers["out_proj"])
    _assert_parity(ours, ref)


def test_apg_dcnv2_forward_parity(tmp_path):
    from fuxictr_tpu.models.zoo.dynamic import APG_DCNv2 as OurAPG
    RefAPG = _load_ref_pkg("APG", "APG_DCNv2", "APG_DCNv2")
    fm, ref_fm = _feature_maps()
    ours = OurAPG(fm, embedding_dim=EMB_DIM, num_cross_layers=3,
                  parallel_dnn_hidden_units=(16, 8), rank_k=4,
                  generate_bias=True, model_root=str(tmp_path))
    params = _init(ours)
    ref = RefAPG(ref_fm, embedding_dim=EMB_DIM, model_structure="parallel",
                 use_low_rank_mixture=False, num_cross_layers=3,
                 stacked_dnn_hidden_units=[], parallel_dnn_hidden_units=[16, 8],
                 dnn_activations="ReLU", net_dropout=0, batch_norm=False,
                 hypernet_config={}, condition_features=[],
                 condition_mode="self-wise", new_condition_emb=False,
                 rank_k=4, overparam_p=None, generate_bias=True,
                 **BASE_KWARGS)
    with torch.no_grad():
        _copy_fused_table_dict(params, ref.embedding_layer, fm)
        for i, lin in enumerate(ref.crossnet.cross_layers):
            _copy_dense(params["crossnet"][f"cross_{i}"], lin)
        _copy_apg_mlp(params["parallel_dnn"], ref.parallel_dnn, 2)
        _copy_dense(params["fc"], ref.fc)
    _assert_parity(ours, ref)


def test_sharebottom_forward_parity(tmp_path):
    """ShareBottom multitask forward parity (dual heads over tiny_parquet
    with a pretend second label, same technique as the MMoE oracle)."""
    spec = importlib.util.spec_from_file_location(
        "ref_sb", "/root/reference/model_zoo/multitask/ShareBottom/src/"
        "ShareBottom.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    RefSB = mod.ShareBottom
    from fuxictr_tpu.models.zoo.multitask_zoo import ShareBottom as OurSB

    fm, ref_fm = _feature_maps()
    fm.labels = ["clk", "conv"]
    ref_fm.labels = ["clk", "conv"]
    ours = OurSB(fm, embedding_dim=EMB_DIM, num_tasks=2,
                 task=["binary_classification", "binary_classification"],
                 bottom_hidden_units=(16, 8), tower_hidden_units=(8,),
                 model_root=str(tmp_path))
    orig = ours._example_batch

    def example_batch(batch_size=2):
        b = orig(batch_size)
        b["conv"] = np.zeros(batch_size, np.float32)
        return b
    ours._example_batch = example_batch
    params = _init(ours)

    kw = dict(BASE_KWARGS)
    kw.pop("task")
    ref = RefSB(ref_fm, embedding_dim=EMB_DIM, num_tasks=2,
                task=["binary_classification", "binary_classification"],
                bottom_hidden_units=[16, 8], tower_hidden_units=[8],
                hidden_activations="ReLU", net_dropout=0, batch_norm=False,
                **kw)
    ref.eval()
    with torch.no_grad():
        _copy_fused_table(params, ref, fm)
        _copy_mlp(params, ref.bottom, "bottom", 2)
        for t in range(2):
            _copy_mlp(params, ref.tower[t], f"tower_{t}", 2)

    batch_ours, torch_batch = _fixture_batch()
    batch_ours["conv"] = batch_ours["clk"]
    torch_batch["conv"] = torch_batch["clk"]
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        out = ref.forward(torch_batch)
    ref_pred = np.stack([out["clk_pred"].numpy().reshape(-1),
                         out["conv_pred"].numpy().reshape(-1)], axis=1)
    np.testing.assert_allclose(np.asarray(pred), ref_pred,
                               rtol=1e-4, atol=1e-5)
