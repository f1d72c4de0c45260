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


def test_din_forward_parity(tmp_path):
    """DIN on tiny_seq: sequence target-attention + share_embedding."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_din", "/root/reference/model_zoo/DIN/src/DIN.py")
    ref_din_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_din_mod)
    RefDIN = ref_din_mod.DIN
    from fuxictr_tpu.models.zoo.sequence import DIN as OurDIN

    seq_dir = "/root/reference/data/tiny_seq"
    overrides = {"embedding_dim": EMB_DIM,
                 "feature_specs": [{"name": "click_sequence",
                                    "feature_encoder": None}]}
    fm = FeatureMap("tiny_seq", seq_dir)
    fm.load(f"{seq_dir}/feature_map.json", overrides)
    ours = OurDIN(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                  dnn_activations="relu", attention_hidden_units=(8,),
                  attention_hidden_activations="relu",
                  attention_dropout=0, net_dropout=0, batch_norm=False,
                  din_target_field="adgroup_id",
                  din_sequence_field="click_sequence",
                  din_use_softmax=False, model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_seq", seq_dir)
    ref_fm.load(f"{seq_dir}/feature_map.json", overrides)
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    ref = RefDIN(ref_fm, dnn_hidden_units=[16, 8], dnn_activations="ReLU",
                 attention_hidden_units=[8],
                 attention_hidden_activations="ReLU",
                 attention_output_activation=None, attention_dropout=0,
                 net_dropout=0, batch_norm=False,
                 din_target_field="adgroup_id",
                 din_sequence_field="click_sequence",
                 din_use_softmax=False, **kwargs)
    ref.eval()

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])
    with torch.no_grad():
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]]
            ref.embedding_layer.embedding_layers[name].weight.copy_(
                torch.from_numpy(rows))
        att = params["attention_0"]["attention_mlp"]
        ref_att = ref.attention_layers[0].attention_layer.mlp
        ref_att[0].weight.copy_(torch.from_numpy(
            np.asarray(att["Dense_0"]["kernel"]).T))
        ref_att[0].bias.copy_(torch.from_numpy(
            np.asarray(att["Dense_0"]["bias"])))
        ref_att[2].weight.copy_(torch.from_numpy(
            np.asarray(att["Dense_1"]["kernel"]).T))
        ref_att[2].bias.copy_(torch.from_numpy(
            np.asarray(att["Dense_1"]["bias"])))
        lins = [m for m in ref.dnn.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(params["dnn"][key]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(
                np.asarray(params["dnn"][key]["bias"])))

    raw = np.load(f"{seq_dir}/train.npz", allow_pickle=True)
    n = 32
    batch_np = {}
    for name in list(fm.features) + fm.labels:
        arr = raw[name][:n]
        if arr.dtype == object:
            arr = np.stack(arr)
        batch_np[name] = arr
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(n, np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v, np.int64))
                   if np.asarray(v).dtype.kind in "iu"
                   else torch.from_numpy(np.asarray(v, np.float32))
                   for c, v in batch_np.items()}
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_dcnv2_forward_parity(tmp_path):
    """DCNv2-parallel (the flagship bench model) forward parity."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_dcnv2", "/root/reference/model_zoo/DCNv2/src/DCNv2.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    RefDCNv2 = mod.DCNv2
    from fuxictr_tpu.models.zoo.ranking import DCNv2 as OurDCNv2

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ours = OurDCNv2(fm, embedding_dim=EMB_DIM, model_structure="parallel",
                    num_cross_layers=3, parallel_dnn_hidden_units=(16, 8),
                    stacked_dnn_hidden_units=(16,), dnn_activations="relu",
                    net_dropout=0, batch_norm=False,
                    model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    ref = RefDCNv2(ref_fm, model_structure="parallel",
                   use_low_rank_mixture=False, num_cross_layers=3,
                   parallel_dnn_hidden_units=[16, 8],
                   stacked_dnn_hidden_units=[16], dnn_activations="ReLU",
                   net_dropout=0, batch_norm=False, **kwargs)
    ref.eval()

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])
    with torch.no_grad():
        emb_layers = ref.embedding_layer.embedding_layer.embedding_layers
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]]
            emb_layers[name].weight.copy_(torch.from_numpy(rows))
        for i in range(3):
            ref.crossnet.cross_layers[i].weight.copy_(torch.from_numpy(
                np.asarray(params["crossnet"][f"cross_{i}"]["kernel"]).T))
            ref.crossnet.cross_layers[i].bias.copy_(torch.from_numpy(
                np.asarray(params["crossnet"][f"cross_{i}"]["bias"])))
        lins = [m for m in ref.parallel_dnn.mlp
                if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1"]):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(params["parallel_dnn"][key]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(
                np.asarray(params["parallel_dnn"][key]["bias"])))
        ref.fc.weight.copy_(torch.from_numpy(
            np.asarray(params["fc"]["kernel"]).T))
        ref.fc.bias.copy_(torch.from_numpy(np.asarray(params["fc"]["bias"])))

    import pandas as pd
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(32)
    batch_np = {c: df[c].to_numpy() for c in df.columns}
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(len(df), np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v)) for c, v in
                   batch_np.items()}
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_mmoe_forward_parity(tmp_path):
    """MMoE multitask forward parity (experts, gates, towers, dual heads)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_mmoe", "/root/reference/model_zoo/multitask/MMoE/src/MMoE.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    RefMMoE = mod.MMoE
    from fuxictr_tpu.models.zoo.multitask_zoo import MMoE as OurMMoE

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    fm.labels = ["clk", "conv"]            # pretend dual labels
    ours = OurMMoE(fm, embedding_dim=EMB_DIM, num_tasks=2,
                   task=["binary_classification", "binary_classification"],
                   num_experts=3, expert_hidden_units=(16,),
                   gate_hidden_units=(8,), tower_hidden_units=(8,),
                   hidden_activations="relu", net_dropout=0,
                   batch_norm=False, model_root=str(tmp_path))
    # dual labels in the init batch
    orig = ours._example_batch

    def example_batch(batch_size=2):
        b = orig(batch_size)
        b["conv"] = np.zeros(batch_size, np.float32)
        return b
    ours._example_batch = example_batch
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ref_fm.labels = ["clk", "conv"]
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm", "task"):
        kwargs.pop(k)
    ref = RefMMoE(ref_fm, num_tasks=2,
                  task=["binary_classification", "binary_classification"],
                  num_experts=3, expert_hidden_units=[16],
                  gate_hidden_units=[8], tower_hidden_units=[8],
                  hidden_activations="ReLU", net_dropout=0,
                  batch_norm=False, **kwargs)
    ref.eval()

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])

    def copy_mlp(ref_mlp, our_params, keys):
        lins = [m for m in ref_mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, keys):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(our_params[key]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(
                np.asarray(our_params[key]["bias"])))

    with torch.no_grad():
        emb_layers = ref.embedding_layer.embedding_layer.embedding_layers
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]]
            emb_layers[name].weight.copy_(torch.from_numpy(rows))
        # stacked experts: [E, d_in, d_out] kernels (ops/mlp.py:stacked_mlp)
        ek = np.asarray(params["experts"]["Dense_0"]["kernel"])
        eb = np.asarray(params["experts"]["Dense_0"]["bias"])
        for i in range(3):
            lin = [m for m in ref.mmoe_layer.experts[i].mlp
                   if isinstance(m, torch.nn.Linear)][0]
            lin.weight.copy_(torch.from_numpy(ek[i].T))
            lin.bias.copy_(torch.from_numpy(eb[i]))
        for t in range(2):
            copy_mlp(ref.mmoe_layer.gate[t].mlp, params[f"gate_{t}"],
                     ["Dense_0", "Dense_1"])
            copy_mlp(ref.tower[t].mlp, params[f"tower_{t}"],
                     ["Dense_0", "Dense_1"])

    import pandas as pd
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(32)
    batch_np = {c: df[c].to_numpy() for c in df.columns}
    batch_np["conv"] = batch_np["clk"]
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(len(df), np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v)) for c, v in
                   batch_np.items()}
    with torch.no_grad():
        out = ref.forward(torch_batch)
    ref_pred = np.stack([out["clk_pred"].numpy().reshape(-1),
                         out["conv_pred"].numpy().reshape(-1)], axis=1)
    np.testing.assert_allclose(np.asarray(pred), ref_pred,
                               rtol=1e-4, atol=1e-5)


def _fixture_batch(n=32):
    import pandas as pd
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(n)
    batch_np = {c: df[c].to_numpy() for c in df.columns}
    batch_ours = dict(batch_np, __mask__=np.ones(len(df), np.float32))
    torch_batch = {c: torch.from_numpy(np.asarray(v)) for c, v in
                   batch_np.items()}
    return batch_ours, torch_batch


def _copy_fused_table(params, ref, fm, dim, key="embedding"):
    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, dim)
    table = np.asarray(params[key][f"table_d{dim}"])
    emb_layers = ref.embedding_layer.embedding_layer.embedding_layers
    for name, plan in layout.fields.items():
        rows = table[plan["offset"]:plan["offset"]
                     + plan["spec"]["vocab_size"]]
        emb_layers[name].weight.copy_(torch.from_numpy(rows))


def _copy_lr(params, ref_lr, fm, key):
    """Copy our dim-1 fused LR table into the reference LogisticRegression."""
    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    lr_layout = EmbeddingLayout(fm, 1, use_pretrain=False, use_sharing=False,
                                force_dim=1)
    lr_table = np.asarray(params[key]["embedding"]["table_d1"])
    lr_emb = ref_lr.embedding_layer.embedding_layer.embedding_layers
    for name, plan in lr_layout.fields.items():
        rows = lr_table[plan["offset"]:plan["offset"]
                        + plan["spec"]["vocab_size"]]
        lr_emb[name].weight.copy_(torch.from_numpy(rows))


def _copy_mlp(params, ref_mlp, key, n_dense):
    lins = [m for m in ref_mlp.mlp if isinstance(m, torch.nn.Linear)]
    for lin, i in zip(lins, range(n_dense)):
        lin.weight.copy_(torch.from_numpy(
            np.asarray(params[key][f"Dense_{i}"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(
            np.asarray(params[key][f"Dense_{i}"]["bias"])))


def test_xdeepfm_forward_parity(tmp_path):
    """xDeepFM forward parity: fused embedding + LR + CIN + DNN (the CIN
    x0-major flattening and conv bias are the tricky bits)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_xdeepfm", "/root/reference/model_zoo/xDeepFM/src/xDeepFM.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking import xDeepFM as OurXDeepFM

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ours = OurXDeepFM(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                      dnn_activations="relu", cin_hidden_units=(7, 5),
                      net_dropout=0, batch_norm=False,
                      model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    kwargs.pop("hidden_units")
    ref = mod.xDeepFM(ref_fm, dnn_hidden_units=[16, 8],
                      cin_hidden_units=[7, 5], **kwargs)
    ref.eval()
    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
        for i in range(2):
            w = np.asarray(params["cin"][f"conv_{i}"])        # [in, out]
            ref.cin.cin_layer[f"layer_{i+1}"].weight.copy_(
                torch.from_numpy(w.T[:, :, None]))            # [out, in, 1]
            ref.cin.cin_layer[f"layer_{i+1}"].bias.copy_(
                torch.from_numpy(np.asarray(params["cin"][f"conv_bias_{i}"])))
        ref.cin.fc.weight.copy_(torch.from_numpy(
            np.asarray(params["cin"]["fc"]["kernel"]).T))
        ref.cin.fc.bias.copy_(torch.from_numpy(
            np.asarray(params["cin"]["fc"]["bias"])))
        _copy_mlp(params, ref.dnn, "dnn", 3)

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_autoint_forward_parity(tmp_path):
    """AutoInt forward parity with the hard options on: 2 heads, scaling,
    residual projection (input_dim != attention_dim), LayerNorm, wide."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_autoint", "/root/reference/model_zoo/AutoInt/src/AutoInt.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking import AutoInt as OurAutoInt

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ours = OurAutoInt(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                      dnn_activations="relu", attention_layers=2,
                      num_heads=2, attention_dim=8, use_residual=True,
                      use_scale=True, layer_norm=True, use_wide=True,
                      net_dropout=0, batch_norm=False,
                      model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    kwargs.pop("hidden_units")
    kwargs.pop("hidden_activations")
    ref = mod.AutoInt(ref_fm, dnn_hidden_units=[16, 8],
                      dnn_activations="ReLU", attention_layers=2,
                      num_heads=2, attention_dim=8, use_residual=True,
                      use_scale=True, layer_norm=True, use_wide=True,
                      **kwargs)
    ref.eval()
    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
        for i, att in enumerate(ref.self_attention):
            p = params[f"self_attention_{i}"]
            for wn in ("W_q", "W_k", "W_v", "W_res"):
                if wn in p:
                    getattr(att, wn).weight.copy_(torch.from_numpy(
                        np.asarray(p[wn]["kernel"]).T))
            att.layer_norm.weight.copy_(torch.from_numpy(
                np.asarray(p["LayerNorm_0"]["scale"])))
            att.layer_norm.bias.copy_(torch.from_numpy(
                np.asarray(p["LayerNorm_0"]["bias"])))
        ref.fc.weight.copy_(torch.from_numpy(
            np.asarray(params["attn_fc"]["kernel"]).T))
        ref.fc.bias.copy_(torch.from_numpy(
            np.asarray(params["attn_fc"]["bias"])))
        _copy_mlp(params, ref.dnn, "dnn", 3)

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_dien_forward_parity(tmp_path):
    """DIEN (AUGRU) on tiny_seq: packed-GRU interest extraction + bilinear
    attention + AUGRU evolution vs our masked-scan formulation — the
    hardest recurrence-semantics oracle (packed sequences vs masks)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_dien", "/root/reference/model_zoo/DIEN/src/DIEN.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.sequence import DIEN as OurDIEN

    seq_dir = "/root/reference/data/tiny_seq"
    overrides = {"embedding_dim": EMB_DIM,
                 "feature_specs": [{"name": "click_sequence",
                                    "feature_encoder": None}]}
    fm = FeatureMap("tiny_seq", seq_dir)
    fm.load(f"{seq_dir}/feature_map.json", overrides)
    common = dict(dnn_activations="relu", net_dropout=0, batch_norm=False,
                  dien_target_field="adgroup_id",
                  dien_sequence_field="click_sequence",
                  dien_neg_seq_field=None, gru_type="AUGRU",
                  attention_type="bilinear_attention",
                  use_attention_softmax=True, aux_loss_alpha=0)
    ours = OurDIEN(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16, 8),
                   model_root=str(tmp_path), **common)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_seq", seq_dir)
    ref_fm.load(f"{seq_dir}/feature_map.json", overrides)
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rc = {k: v for k, v in common.items()
          if k not in ("dnn_activations", "net_dropout", "batch_norm")}
    # the reference miscounts feature_dim for dien_neg_seq_field=None
    # (pandas flatten([None]) == [None]); [] is its consistent spelling
    rc["dien_neg_seq_field"] = []
    ref = mod.DIEN(ref_fm, dnn_hidden_units=[16, 8], net_dropout=0,
                   batch_norm=False, dnn_activations="ReLU", **rc, **kwargs)
    ref.eval()

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])

    def copy_gru(tm, p, torch_order):
        """Copy our scanned cell into a torch GRU/AGRU module.
        torch_order: permutation mapping our (u, r, n) chunks to torch's."""
        H = np.asarray(p["h2h"]["kernel"]).shape[0]
        for ours_name, w_attr, b_attr in (
                ("x2h", "weight_ih_l0", "bias_ih_l0"),
                ("h2h", "weight_hh_l0", "bias_hh_l0")):
            k = np.asarray(p[ours_name]["kernel"]).T      # [3H, in]
            b = np.asarray(p[ours_name]["bias"])
            chunks_k = np.split(k, 3, axis=0)
            chunks_b = np.split(b, 3, axis=0)
            k2 = np.concatenate([chunks_k[i] for i in torch_order], axis=0)
            b2 = np.concatenate([chunks_b[i] for i in torch_order], axis=0)
            if hasattr(tm, w_attr):                        # nn.GRU
                getattr(tm, w_attr).copy_(torch.from_numpy(k2))
                getattr(tm, b_attr).copy_(torch.from_numpy(b2))
            else:                                          # AGRU/AUGRU cell
                lin = getattr(tm, ours_name)
                lin.weight.copy_(torch.from_numpy(k2))
                lin.bias.copy_(torch.from_numpy(b2))

    with torch.no_grad():
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]]
            ref.embedding_layer.embedding_layers[name].weight.copy_(
                torch.from_numpy(rows))
        # extraction: torch nn.GRU chunk order (r, z, n); ours (u=z, r, n)
        copy_gru(ref.extraction_modules[0],
                 params["extraction_0"]["cell"], [1, 0, 2])
        # evolution: reference AUGRUCell chunk order (u, r, n) — same as ours
        copy_gru(ref.evolving_modules[0].gru_cell,
                 params["evolving_0"]["cell"], [0, 1, 2])
        ref.attention_modules[0].W_kernel.copy_(torch.from_numpy(
            np.asarray(params["W_kernel_0"])))
        lins = [m for m in ref.dnn.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(params["dnn"][key]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(
                np.asarray(params["dnn"][key]["bias"])))

    raw = np.load(f"{seq_dir}/train.npz", allow_pickle=True)
    n = 32
    batch_np = {}
    for name in list(fm.features) + fm.labels:
        arr = raw[name][:n]
        if arr.dtype == object:
            arr = np.stack(arr)
        batch_np[name] = arr
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(n, np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v, np.int64))
                   if np.asarray(v).dtype.kind in "iu"
                   else torch.from_numpy(np.asarray(v, np.float32))
                   for c, v in batch_np.items()}
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_finalmlp_forward_parity(tmp_path):
    """FinalMLP with the full option set: context-gated feature selection
    (one real-context gate, one bias gate) + 2-head bilinear fusion."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_finalmlp", "/root/reference/model_zoo/FinalMLP/src/FinalMLP.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking4 import FinalMLP as OurFinalMLP

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ctx_field = list(fm.features)[0]
    cfg = dict(mlp1_hidden_units=(16, 8), mlp2_hidden_units=(16, 12),
               mlp1_hidden_activations="relu",
               mlp2_hidden_activations="relu", mlp1_dropout=0,
               mlp2_dropout=0, mlp1_batch_norm=False, mlp2_batch_norm=False,
               use_fs=True, fs_hidden_units=(8,),
               fs1_context=(ctx_field,), fs2_context=(), num_heads=2)
    ours = OurFinalMLP(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                       **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(mlp1_hidden_units=[16, 8], mlp2_hidden_units=[16, 12],
                mlp1_hidden_activations="ReLU",
                mlp2_hidden_activations="ReLU", fs_hidden_units=[8],
                fs1_context=[ctx_field], fs2_context=[])
    ref = mod.FinalMLP(ref_fm, **rcfg, **kwargs)
    ref.eval()

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        # fs1 context embedding: its own single-field fused table
        from fuxictr_tpu.ops.embedding import EmbeddingLayout
        ctx_layout = EmbeddingLayout(fm, EMB_DIM, required=[ctx_field])
        ctx_table = np.asarray(params["fs1_ctx"][f"table_d{EMB_DIM}"])
        for name, plan in ctx_layout.fields.items():
            rows = ctx_table[plan["offset"]:plan["offset"]
                             + plan["spec"]["vocab_size"]]
            ref.fs_module.fs1_ctx_emb.embedding_layer \
                .embedding_layers[name].weight.copy_(torch.from_numpy(rows))
        ref.fs_module.fs2_ctx_bias.copy_(torch.from_numpy(
            np.asarray(params["fs2_bias"])))
        _copy_mlp(params, ref.fs_module.fs1_gate, "fs1_gate", 2)
        _copy_mlp(params, ref.fs_module.fs2_gate, "fs2_gate", 2)
        _copy_mlp(params, ref.mlp1, "mlp1", 2)
        _copy_mlp(params, ref.mlp2, "mlp2", 2)
        ref.fusion_module.w_x.weight.copy_(torch.from_numpy(
            np.asarray(params["w_x"]["kernel"]).T))
        ref.fusion_module.w_x.bias.copy_(torch.from_numpy(
            np.asarray(params["w_x"]["bias"])))
        ref.fusion_module.w_y.weight.copy_(torch.from_numpy(
            np.asarray(params["w_y"]["kernel"]).T))
        ref.fusion_module.w_y.bias.copy_(torch.from_numpy(
            np.asarray(params["w_y"]["bias"])))
        ref.fusion_module.w_xy.copy_(torch.from_numpy(
            np.asarray(params["w_xy"])))

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_fibinet_forward_parity(tmp_path):
    """FiBiNET: SENet recalibration + two bilinear interactions + LR."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_fibinet", "/root/reference/model_zoo/FiBiNET/src/FiBiNET.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking3 import FiBiNET as OurFiBiNET

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ours = OurFiBiNET(fm, embedding_dim=EMB_DIM, hidden_units=(16, 8),
                      hidden_activations="relu", excitation_activation="relu",
                      reduction_ratio=3, bilinear_type="field_interaction",
                      net_dropout=0, batch_norm=False,
                      model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    ref = mod.FiBiNET(ref_fm, hidden_units=[16, 8],
                      hidden_activations="ReLU",
                      excitation_activation="ReLU", reduction_ratio=3,
                      bilinear_type="field_interaction", net_dropout=0,
                      batch_norm=False, **kwargs)
    ref.eval()

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        _copy_lr(params, ref.lr_layer, fm, "embedding_lr")
        se = params["senet"]
        lins = [m for m in ref.senet_layer.excitation
                if isinstance(m, torch.nn.Linear)]
        lins[0].weight.copy_(torch.from_numpy(
            np.asarray(se["squeeze"]["kernel"]).T))
        lins[1].weight.copy_(torch.from_numpy(
            np.asarray(se["excite"]["kernel"]).T))
        ref.bilinear_interaction1.bilinear_W.copy_(torch.from_numpy(
            np.asarray(params["bilinear1"]["W"])))
        ref.bilinear_interaction2.bilinear_W.copy_(torch.from_numpy(
            np.asarray(params["bilinear2"]["W"])))
        _copy_mlp(params, ref.dnn, "dnn", 3)

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_type", ["SerialMaskNet", "ParallelMaskNet"])
def test_masknet_forward_parity(model_type, tmp_path):
    """MaskNet serial/parallel: per-field emb LayerNorm, instance-guided
    mask blocks (raw-emb mask input vs normed hidden stream)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_masknet", "/root/reference/model_zoo/MaskNet/src/MaskNet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking3 import MaskNet as OurMaskNet

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    cfg = dict(dnn_hidden_units=(16, 8), dnn_hidden_activations="relu",
               model_type=model_type, parallel_num_blocks=2,
               parallel_block_dim=8, reduction_ratio=1.0, net_dropout=0,
               emb_layernorm=True, net_layernorm=True)
    ours = OurMaskNet(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                      **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(dnn_hidden_units=[16, 8], dnn_hidden_activations="ReLU",
                reduction_ratio=1, net_dropout=0)
    ref = mod.MaskNet(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_block(rb, p):
        lins = [m for m in rb.mask_layer
                if isinstance(m, torch.nn.Linear)]
        lins[0].weight.copy_(torch.from_numpy(
            np.asarray(p["mask_1"]["kernel"]).T))
        lins[0].bias.copy_(torch.from_numpy(np.asarray(p["mask_1"]["bias"])))
        lins[1].weight.copy_(torch.from_numpy(
            np.asarray(p["mask_2"]["kernel"]).T))
        lins[1].bias.copy_(torch.from_numpy(np.asarray(p["mask_2"]["bias"])))
        hl = [m for m in rb.hidden_layer if isinstance(m, torch.nn.Linear)]
        hl[0].weight.copy_(torch.from_numpy(
            np.asarray(p["hidden"]["kernel"]).T))
        ln = [m for m in rb.hidden_layer
              if isinstance(m, torch.nn.LayerNorm)]
        ln[0].weight.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_0"]["scale"])))
        ln[0].bias.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_0"]["bias"])))

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        for i, emb_ln in enumerate(ref.emb_norm):
            emb_ln.weight.copy_(torch.from_numpy(
                np.asarray(params["emb_ln_scale"])[i]))
            emb_ln.bias.copy_(torch.from_numpy(
                np.asarray(params["emb_ln_bias"])[i]))
        if model_type == "SerialMaskNet":
            for i, rb in enumerate(ref.mask_net.mask_blocks):
                copy_block(rb, params[f"block_{i}"])
            ref.mask_net.fc[0].weight.copy_(torch.from_numpy(
                np.asarray(params["fc"]["kernel"]).T))
            ref.mask_net.fc[0].bias.copy_(torch.from_numpy(
                np.asarray(params["fc"]["bias"])))
        else:
            for i, rb in enumerate(ref.mask_net.mask_blocks):
                copy_block(rb, params[f"block_{i}"])
            _copy_mlp(params, ref.mask_net.dnn, "dnn", 3)

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_edcn_forward_parity(tmp_path):
    """EDCN with the attention_pooling bridge: cross/deep towers exchanging
    through bridge + softmax-regulation modules."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_edcn", "/root/reference/model_zoo/EDCN/src/EDCN.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking4 import EDCN as OurEDCN

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    cfg = dict(num_cross_layers=2, hidden_activations="relu",
               bridge_type="attention_pooling", temperature=0.7,
               net_dropout=0, batch_norm=False)
    ours = OurEDCN(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                   **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg["hidden_activations"] = "ReLU"
    ref = mod.EDCN(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p, bias=True):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        if bias:
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        for i in range(2):
            ref.regulation_modules[i].g1.copy_(torch.from_numpy(
                np.asarray(params[f"g1_{i}"])))
            ref.regulation_modules[i].g2.copy_(torch.from_numpy(
                np.asarray(params[f"g2_{i}"])))
            ref.cross_layers[i].weight.weight.copy_(torch.from_numpy(
                np.asarray(params[f"cross_w_{i}"]).T))
            ref.cross_layers[i].bias.copy_(torch.from_numpy(
                np.asarray(params[f"cross_b_{i}"])))
            lin = [m for m in ref.dense_layers[i].mlp
                   if isinstance(m, torch.nn.Linear)][0]
            copy_lin(lin, params[f"dense_{i}"]["Dense_0"])
            att1 = [m for m in ref.bridge_modules[i].attention1
                    if isinstance(m, torch.nn.Linear)]
            att2 = [m for m in ref.bridge_modules[i].attention2
                    if isinstance(m, torch.nn.Linear)]
            copy_lin(att1[0], params[f"att1_{i}_1"])
            copy_lin(att1[1], params[f"att1_{i}_2"], bias=False)
            copy_lin(att2[0], params[f"att2_{i}_1"])
            copy_lin(att2[1], params[f"att2_{i}_2"], bias=False)
        copy_lin(ref.fc, params["fc"])

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_fignn_forward_parity(tmp_path):
    """FiGNN: attentional field graph + per-field W_in/W_out transforms +
    GRU state updates + attentional prediction."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_fignn", "/root/reference/model_zoo/FiGNN/src/FiGNN.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking4 import FiGNN as OurFiGNN

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    cfg = dict(gnn_layers=2, use_residual=True, use_gru=True,
               reuse_graph_layer=False)
    ours = OurFiGNN(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                    **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    ref = mod.FiGNN(ref_fm, **cfg, **kwargs)
    ref.eval()

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        ref.fignn.W_attn.weight.copy_(torch.from_numpy(
            np.asarray(params["W_attn"]["kernel"]).T))
        for i in range(2):
            gl = ref.fignn.gnn[i]
            gl.W_in.copy_(torch.from_numpy(np.asarray(params[f"W_in_{i}"])))
            gl.W_out.copy_(torch.from_numpy(
                np.asarray(params[f"W_out_{i}"])))
            gl.bias_p.copy_(torch.from_numpy(
                np.asarray(params[f"bias_p_{i}"])))
        # flax GRUCell → torch GRUCell: chunk order (r, z, n); flax holds
        # biases on ir/iz/in + hn only (i/h linears are summed)
        g = params["gru"]
        kT = lambda k: np.asarray(g[k]["kernel"]).T
        ref.fignn.gru.weight_ih.copy_(torch.from_numpy(
            np.concatenate([kT("ir"), kT("iz"), kT("in")], axis=0)))
        ref.fignn.gru.weight_hh.copy_(torch.from_numpy(
            np.concatenate([kT("hr"), kT("hz"), kT("hn")], axis=0)))
        ref.fignn.gru.bias_ih.copy_(torch.from_numpy(np.concatenate(
            [np.asarray(g["ir"]["bias"]), np.asarray(g["iz"]["bias"]),
             np.asarray(g["in"]["bias"])])))
        D = EMB_DIM
        ref.fignn.gru.bias_hh.copy_(torch.from_numpy(np.concatenate(
            [np.zeros(D, np.float32), np.zeros(D, np.float32),
             np.asarray(g["hn"]["bias"])])))
        ref.fc.mlp1.weight.copy_(torch.from_numpy(
            np.asarray(params["mlp1"]["kernel"]).T))
        ref.fc.mlp2[0].weight.copy_(torch.from_numpy(
            np.asarray(params["mlp2"]["kernel"]).T))

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_eulernet_forward_parity(tmp_path):
    """EulerNet: complex-plane (log-polar) interactions with LayerNorm."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_eulernet",
        "/root/reference/model_zoo/EulerNet/src/EulerNet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking4 import EulerNet as OurEulerNet

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    cfg = dict(shape=(3, 3), net_ex_dropout=0, net_im_dropout=0,
               layer_norm=True)
    ours = OurEulerNet(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                       **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    ref = mod.EulerNet(ref_fm, shape=[3, 3], net_ex_dropout=0,
                       net_im_dropout=0, layer_norm=True, **kwargs)
    ref.eval()

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        ref.mu.copy_(torch.from_numpy(np.asarray(params["mu"])))
        for i, layer in enumerate(ref.Euler_interaction_layers):
            p = params[f"euler_{i}"]
            layer.inter_orders.copy_(torch.from_numpy(
                np.asarray(p["inter_orders"])))
            layer.bias_lam.copy_(torch.from_numpy(np.asarray(p["bias_lam"])))
            layer.bias_theta.copy_(torch.from_numpy(
                np.asarray(p["bias_theta"])))
            layer.im.weight.copy_(torch.from_numpy(
                np.asarray(p["im"]["kernel"]).T))
            layer.im.bias.copy_(torch.from_numpy(
                np.asarray(p["im"]["bias"])))
            layer.norm_r.weight.copy_(torch.from_numpy(
                np.asarray(p["norm_r"]["scale"])))
            layer.norm_r.bias.copy_(torch.from_numpy(
                np.asarray(p["norm_r"]["bias"])))
            layer.norm_p.weight.copy_(torch.from_numpy(
                np.asarray(p["norm_p"]["scale"])))
            layer.norm_p.bias.copy_(torch.from_numpy(
                np.asarray(p["norm_p"]["bias"])))
        ref.reg.weight.copy_(torch.from_numpy(
            np.asarray(params["reg"]["kernel"]).T))
        ref.reg.bias.copy_(torch.from_numpy(
            np.asarray(params["reg"]["bias"])))

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_wukong_forward_parity(tmp_path):
    """WuKong: low-rank FMB + LCB stacking with residual projections."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_wukong", "/root/reference/model_zoo/WuKong/src/WuKong.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking4 import WuKong as OurWuKong

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    cfg = dict(num_wukong_layers=2, lcb_features=4, fmb_features=3,
               fmb_mlp_units=(16,), fmb_mlp_activations="relu",
               fmp_rank_k=2, mlp_hidden_units=(16, 8),
               mlp_hidden_activations="relu", mlp_batch_norm=False,
               layer_norm=True, net_dropout=0)
    ours = OurWuKong(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                     **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(fmb_mlp_units=[16], mlp_hidden_units=[16, 8])
    ref = mod.WuKong(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p, bias=True):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        if bias:
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        for i, layer in enumerate(ref.wukong_stack):
            p = params[f"wukong_{i}"]
            layer.fmb.proj_Y.copy_(torch.from_numpy(
                np.asarray(p["proj_Y"])))
            layer.fmb.layer_norm.weight.copy_(torch.from_numpy(
                np.asarray(p["fm_ln"]["scale"])))
            layer.fmb.layer_norm.bias.copy_(torch.from_numpy(
                np.asarray(p["fm_ln"]["bias"])))
            lins = [m for m in layer.fmb.mlp.mlp
                    if isinstance(m, torch.nn.Linear)]
            copy_lin(lins[0], p["fmb_mlp"]["Dense_0"])
            copy_lin(lins[1], p["fmb_mlp"]["Dense_1"])
            layer.lcb.linear.weight.copy_(torch.from_numpy(
                np.asarray(p["lcb"]["kernel"]).T))
            if "residual_proj" in p:
                copy_lin(layer.residual_proj, p["residual_proj"])
            layer.layer_norm.weight.copy_(torch.from_numpy(
                np.asarray(p["ln"]["scale"])))
            layer.layer_norm.bias.copy_(torch.from_numpy(
                np.asarray(p["ln"]["bias"])))
        lins = [m for m in ref.fc.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            copy_lin(lin, params["fc"][key])

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_ppnet_forward_parity(tmp_path):
    """PPNet (dynamic-weights family): GateNU-rescaled MLP fed
    [stop_grad(features), gate-prior embeddings]."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_ppnet", "/root/reference/model_zoo/PEPNet/src/PPNet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.dynamic import PPNet as OurPPNet

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    priors = list(fm.features)[:2]
    cfg = dict(gate_emb_dim=3, gate_priors=priors, gate_hidden_dim=8,
               hidden_units=(16, 8), hidden_activations="relu",
               net_dropout=0, batch_norm=False)
    ours = OurPPNet(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                    **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(hidden_units=[16, 8], hidden_activations="ReLU",
                gate_priors=list(priors))
    ref = mod.PPNet(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        from fuxictr_tpu.ops.embedding import EmbeddingLayout
        g_layout = EmbeddingLayout(fm, 3, required=priors)
        g_table = np.asarray(params["gate_embedding"]["table_d3"])
        for name, plan in g_layout.fields.items():
            rows = g_table[plan["offset"]:plan["offset"]
                           + plan["spec"]["vocab_size"]]
            ref.gate_embed_layer.embedding_layer \
                .embedding_layers[name].weight.copy_(torch.from_numpy(rows))
        for i in range(2):
            copy_lin(ref.ppn.mlp_layers[i][0], params[f"mlp_{i}"])
            gl = [m for m in ref.ppn.gate_layers[i].gate
                  if isinstance(m, torch.nn.Linear)]
            copy_lin(gl[0], params[f"gate_{i}"]["fc1"])
            copy_lin(gl[1], params[f"gate_{i}"]["fc2"])
        copy_lin(ref.ppn.mlp_layers[-1], params["fc"])

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_destine_forward_parity(tmp_path):
    """DESTINE: whitened pairwise + unary disentangled attention. Locks the
    reference's raw-view head split (interleaves heads with fields), which
    a clean transpose split silently diverges from at num_heads > 1."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_destine", "/root/reference/model_zoo/DESTINE/src/DESTINE.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking4 import DESTINE as OurDESTINE

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    cfg = dict(attention_dim=8, num_heads=2, attention_layers=2,
               dnn_hidden_units=(16, 8), dnn_activations="relu",
               net_dropout=0, att_dropout=0, relu_before_att=False,
               batch_norm=False, use_scale=True, use_wide=True,
               residual_mode="each_layer")
    ours = OurDESTINE(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                      **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(dnn_hidden_units=[16, 8], dnn_activations="ReLU")
    ref = mod.DESTINE(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        _copy_lr(params, ref.lr, fm, "embedding_lr")
        ref.lr.bias.copy_(torch.from_numpy(
            np.asarray(params["embedding_lr"]["bias"])))
        for i, att in enumerate(ref.self_attns):
            p = params[f"self_attn_{i}"]
            for wn in ("W_q", "W_k", "W_v", "W_unary", "W_res"):
                if wn in p:
                    copy_lin(getattr(att, wn), p[wn])
        copy_lin(ref.attn_fc, params["attn_fc"])
        lins = [m for m in ref.dnn.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            copy_lin(lin, params["dnn"][key])

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_bst_forward_parity(tmp_path):
    """BST: torch-MultiheadAttention transformer over [sequence; target]
    with concatenated sinusoidal positions, diagonal-allowed padding mask
    + causal mask, LeakyReLU FFN, post-LN, mean pooling."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_bst", "/root/reference/model_zoo/BST/src/BST.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.sequence import BST as OurBST

    seq_dir = "/root/reference/data/tiny_seq"
    overrides = {"embedding_dim": EMB_DIM,
                 "feature_specs": [{"name": "click_sequence",
                                    "feature_encoder": None}]}
    fm = FeatureMap("tiny_seq", seq_dir)
    fm.load(f"{seq_dir}/feature_map.json", overrides)
    cfg = dict(dnn_hidden_units=(16, 8), dnn_activations="relu",
               num_heads=2, stacked_transformer_layers=1,
               attention_dropout=0, net_dropout=0, batch_norm=False,
               layer_norm=True, use_residual=True,
               bst_target_field="adgroup_id",
               bst_sequence_field="click_sequence",
               seq_pooling_type="mean", use_position_emb=True,
               use_causal_mask=True)
    ours = OurBST(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                  **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_seq", seq_dir)
    ref_fm.load(f"{seq_dir}/feature_map.json", overrides)
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(dnn_hidden_units=[16, 8], dnn_activations="ReLU")
    ref = mod.BST(ref_fm, **rcfg, **kwargs)
    ref.eval()

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])
    with torch.no_grad():
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]]
            ref.embedding_layer.embedding_layers[name].weight.copy_(
                torch.from_numpy(rows))
        bt = ref.transformer_encoders[0]
        bt.position_emb.copy_(torch.from_numpy(
            np.asarray(params["pos_emb_0"])))
        block = bt.transformer_blocks[0]
        p = params["transformer_0_0"]
        kT = lambda k: np.asarray(p[k]["kernel"]).T
        kb = lambda k: np.asarray(p[k]["bias"])
        block.attention.in_proj_weight.copy_(torch.from_numpy(
            np.concatenate([kT("W_q"), kT("W_k"), kT("W_v")], axis=0)))
        block.attention.in_proj_bias.copy_(torch.from_numpy(
            np.concatenate([kb("W_q"), kb("W_k"), kb("W_v")])))
        block.attention.out_proj.weight.copy_(torch.from_numpy(kT("W_o")))
        block.attention.out_proj.bias.copy_(torch.from_numpy(kb("W_o")))
        ffn = [m for m in block.ffn if isinstance(m, torch.nn.Linear)]
        ffn[0].weight.copy_(torch.from_numpy(kT("ffn_1")))
        ffn[0].bias.copy_(torch.from_numpy(kb("ffn_1")))
        ffn[1].weight.copy_(torch.from_numpy(kT("ffn_2")))
        ffn[1].bias.copy_(torch.from_numpy(kb("ffn_2")))
        block.layer_norm1.weight.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_0"]["scale"])))
        block.layer_norm1.bias.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_0"]["bias"])))
        block.layer_norm2.weight.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_1"]["scale"])))
        block.layer_norm2.bias.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_1"]["bias"])))
        lins = [m for m in ref.dnn.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(params["dnn"][key]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(
                np.asarray(params["dnn"][key]["bias"])))

    raw = np.load(f"{seq_dir}/train.npz", allow_pickle=True)
    n = 32
    batch_np = {}
    for name in list(fm.features) + fm.labels:
        arr = raw[name][:n]
        if arr.dtype == object:
            arr = np.stack(arr)
        batch_np[name] = arr
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(n, np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v, np.int64))
                   if np.asarray(v).dtype.kind in "iu"
                   else torch.from_numpy(np.asarray(v, np.float32))
                   for c, v in batch_np.items()}
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_transact_forward_parity(tmp_path):
    """TransAct: torch nn.TransformerEncoder over [seq || target], first-k
    + masked max pool outputs, DCNv2-parallel fusion head."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_transact",
        "/root/reference/model_zoo/TransAct/src/TransAct.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.sequence import TransAct as OurTransAct

    seq_dir = "/root/reference/data/tiny_seq"
    overrides = {"embedding_dim": EMB_DIM,
                 "feature_specs": [{"name": "click_sequence",
                                    "feature_encoder": None}]}
    fm = FeatureMap("tiny_seq", seq_dir)
    fm.load(f"{seq_dir}/feature_map.json", overrides)
    cfg = dict(hidden_activations="relu", dcn_cross_layers=2,
               dcn_hidden_units=(16,), mlp_hidden_units=(8,),
               num_heads=2, transformer_layers=1, transformer_dropout=0,
               dim_feedforward=16, net_dropout=0, batch_norm=False,
               target_item_field="adgroup_id",
               sequence_item_field="click_sequence",
               first_k_cols=2, use_time_window_mask=False,
               concat_max_pool=True)
    ours = OurTransAct(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                       **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_seq", seq_dir)
    ref_fm.load(f"{seq_dir}/feature_map.json", overrides)
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(hidden_activations="ReLU", dcn_hidden_units=[16],
                mlp_hidden_units=[8])
    ref = mod.TransAct(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p, bias=True):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        if bias:
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])
    with torch.no_grad():
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]].copy()
            # torch padding_idx relies on row 0 being zero at init; our
            # fused table masks pad ids at lookup instead
            rows[0] = 0.0
            ref.embedding_layer.embedding_layers[name].weight.copy_(
                torch.from_numpy(rows))
        enc_layer = ref.transformer_encoders[0].transformer_encoder.layers[0]
        p = params["transformer_0_0"]
        kT = lambda k: np.asarray(p[k]["kernel"]).T
        kb = lambda k: np.asarray(p[k]["bias"])
        enc_layer.self_attn.in_proj_weight.copy_(torch.from_numpy(
            np.concatenate([kT("W_q"), kT("W_k"), kT("W_v")], axis=0)))
        enc_layer.self_attn.in_proj_bias.copy_(torch.from_numpy(
            np.concatenate([kb("W_q"), kb("W_k"), kb("W_v")])))
        enc_layer.self_attn.out_proj.weight.copy_(torch.from_numpy(
            kT("W_o")))
        enc_layer.self_attn.out_proj.bias.copy_(torch.from_numpy(kb("W_o")))
        enc_layer.linear1.weight.copy_(torch.from_numpy(kT("ffn_1")))
        enc_layer.linear1.bias.copy_(torch.from_numpy(kb("ffn_1")))
        enc_layer.linear2.weight.copy_(torch.from_numpy(kT("ffn_2")))
        enc_layer.linear2.bias.copy_(torch.from_numpy(kb("ffn_2")))
        enc_layer.norm1.weight.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_0"]["scale"])))
        enc_layer.norm1.bias.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_0"]["bias"])))
        enc_layer.norm2.weight.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_1"]["scale"])))
        enc_layer.norm2.bias.copy_(torch.from_numpy(
            np.asarray(p["LayerNorm_1"]["bias"])))
        copy_lin(ref.transformer_encoders[0].out_linear,
                 params["out_linear_0"])
        for i in range(2):
            ref.crossnet.cross_layers[i].weight.copy_(torch.from_numpy(
                np.asarray(params["crossnet"][f"cross_{i}"]["kernel"]).T))
            ref.crossnet.cross_layers[i].bias.copy_(torch.from_numpy(
                np.asarray(params["crossnet"][f"cross_{i}"]["bias"])))
        lins = [m for m in ref.parallel_dnn.mlp
                if isinstance(m, torch.nn.Linear)]
        copy_lin(lins[0], params["parallel_dnn"]["Dense_0"])
        lins = [m for m in ref.mlp.mlp if isinstance(m, torch.nn.Linear)]
        copy_lin(lins[0], params["mlp"]["Dense_0"])
        copy_lin(lins[1], params["mlp"]["Dense_1"])

    raw = np.load(f"{seq_dir}/train.npz", allow_pickle=True)
    n = 32
    batch_np = {}
    for name in list(fm.features) + fm.labels:
        arr = raw[name][:n]
        if arr.dtype == object:
            arr = np.stack(arr)
        batch_np[name] = arr
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(n, np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v, np.int64))
                   if np.asarray(v).dtype.kind in "iu"
                   else torch.from_numpy(np.asarray(v, np.float32))
                   for c, v in batch_np.items()}
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_interhat_forward_parity(tmp_path):
    """InterHAt: its own MHA variant (raw-view heads, W_res back-projection,
    relu->dropout->residual->LN order) + hierarchical aggregation."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_interhat",
        "/root/reference/model_zoo/InterHAt/src/InterHAt.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking4 import InterHAt as OurInterHAt

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    cfg = dict(hidden_dim=None, order=3, num_heads=2, attention_dim=8,
               hidden_units=(16, 8), hidden_activations="relu",
               batch_norm=False, layer_norm=True, use_residual=True,
               net_dropout=0)
    ours = OurInterHAt(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                       **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(hidden_units=[16, 8])
    ref = mod.InterHAt(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p, bias=True):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        if bias:
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    def copy_agg(ragg, prefix):
        lins = [m for m in ragg.agg if isinstance(m, torch.nn.Linear)]
        copy_lin(lins[0], params[f"{prefix}_1"])
        copy_lin(lins[1], params[f"{prefix}_2"], bias=False)

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        mha = ref.multi_head_attention
        for wn in ("W_q", "W_k", "W_v", "W_res"):
            getattr(mha, wn).weight.copy_(torch.from_numpy(
                np.asarray(params[wn]["kernel"]).T))
        mha.layer_norm.weight.copy_(torch.from_numpy(
            np.asarray(params["mhsa_ln"]["scale"])))
        mha.layer_norm.bias.copy_(torch.from_numpy(
            np.asarray(params["mhsa_ln"]["bias"])))
        ffn = [m for m in ref.feedforward.ffn
               if isinstance(m, torch.nn.Linear)]
        copy_lin(ffn[0], params["ffn_1"])
        copy_lin(ffn[1], params["ffn_2"])
        ref.feedforward.layer_norm.weight.copy_(torch.from_numpy(
            np.asarray(params["ffn_ln"]["scale"])))
        ref.feedforward.layer_norm.bias.copy_(torch.from_numpy(
            np.asarray(params["ffn_ln"]["bias"])))
        for p_i, ragg in enumerate(ref.aggregation_layers):
            copy_agg(ragg, f"agg_{p_i}")
        copy_agg(ref.attentional_score, "score")
        lins = [m for m in ref.mlp.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            copy_lin(lin, params["mlp"][key])

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_ple_forward_parity(tmp_path):
    """PLE (2 CGC layers): task-specific + shared experts, per-task gates,
    shared-route gate feeding the next layer."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_ple", "/root/reference/model_zoo/multitask/PLE/src/PLE.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.multitask_zoo import PLE as OurPLE

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    fm.labels = ["clk", "conv"]
    cfg = dict(num_layers=2, num_shared_experts=2, num_specific_experts=1,
               expert_hidden_units=(16,), gate_hidden_units=(8,),
               tower_hidden_units=(8,), hidden_activations="relu",
               net_dropout=0, batch_norm=False)
    ours = OurPLE(fm, embedding_dim=EMB_DIM, num_tasks=2,
                  task=["binary_classification", "binary_classification"],
                  model_root=str(tmp_path), **cfg)
    orig = ours._example_batch

    def example_batch(batch_size=2):
        b = orig(batch_size)
        b["conv"] = np.zeros(batch_size, np.float32)
        return b
    ours._example_batch = example_batch
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    ref_fm.labels = ["clk", "conv"]
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm", "task"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(expert_hidden_units=[16], gate_hidden_units=[8],
                tower_hidden_units=[8], hidden_activations="ReLU")
    ref = mod.PLE(ref_fm, num_tasks=2,
                  task=["binary_classification", "binary_classification"],
                  **rcfg, **kwargs)
    ref.eval()

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])

    def copy_mlp(ref_mlp, our_params, keys):
        lins = [m for m in ref_mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, keys):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(our_params[key]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(
                np.asarray(our_params[key]["bias"])))

    with torch.no_grad():
        emb_layers = ref.embedding_layer.embedding_layer.embedding_layers
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]]
            emb_layers[name].weight.copy_(torch.from_numpy(rows))
        for li, cgc in enumerate(ref.cgc_layers):
            p = params[f"cgc_{li}"]
            # stacked experts (ops/mlp.py:stacked_mlp): order = task0
            # specifics, task1 specifics, shared; ns=1, nsh=2 here
            ek = np.asarray(p["experts"]["Dense_0"]["kernel"])
            eb = np.asarray(p["experts"]["Dense_0"]["bias"])

            def copy_lin(ref_mlp, idx):
                lin = [m for m in ref_mlp
                       if isinstance(m, torch.nn.Linear)][0]
                lin.weight.copy_(torch.from_numpy(ek[idx].T))
                lin.bias.copy_(torch.from_numpy(eb[idx]))

            for t in range(2):
                copy_lin(cgc.specific_experts[t][0].mlp, t)
            for k in range(2):
                copy_lin(cgc.shared_experts[k].mlp, 2 + k)
            for g in range(3):
                if f"gate_{g}" in p:
                    copy_mlp(cgc.gate[g].mlp, p[f"gate_{g}"],
                             ["Dense_0", "Dense_1"])
        for t in range(2):
            copy_mlp(ref.tower[t].mlp, params[f"tower_{t}"],
                     ["Dense_0", "Dense_1"])

    import pandas as pd
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(32)
    batch_np = {c: df[c].to_numpy() for c in df.columns}
    batch_np["conv"] = batch_np["clk"]
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(len(df), np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v)) for c, v in
                   batch_np.items()}
    with torch.no_grad():
        out = ref.forward(torch_batch)
    ref_pred = np.stack([out["clk_pred"].numpy().reshape(-1),
                         out["conv_pred"].numpy().reshape(-1)], axis=1)
    np.testing.assert_allclose(np.asarray(pred), ref_pred,
                               rtol=1e-4, atol=1e-5)


def test_dmin_forward_parity(tmp_path):
    """DMIN: behavior refiner (torch-MHA with the reference's additive
    float-mask quirk), per-head multi-interest extractor, pos-emb target
    attention — causal+diagonal masking throughout."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_dmin", "/root/reference/model_zoo/DMIN/src/DMIN.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.sequence2 import DMIN as OurDMIN

    seq_dir = "/root/reference/data/tiny_seq"
    overrides = {"embedding_dim": EMB_DIM,
                 "feature_specs": [{"name": "click_sequence",
                                    "feature_encoder": None}]}
    fm = FeatureMap("tiny_seq", seq_dir)
    fm.load(f"{seq_dir}/feature_map.json", overrides)
    cfg = dict(dnn_hidden_units=(16, 8), dnn_activations="relu",
               net_dropout=0, target_field="adgroup_id",
               sequence_field="click_sequence", neg_seq_field=None,
               num_heads=2, enable_sum_pooling=False,
               attention_hidden_units=(8,), attention_activation="relu",
               attention_dropout=0, use_pos_emb=True, pos_emb_dim=3,
               use_behavior_refiner=True, aux_loss_lambda=0,
               batch_norm=False, layer_norm=True)
    ours = OurDMIN(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                   **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_seq", seq_dir)
    ref_fm.load(f"{seq_dir}/feature_map.json", overrides)
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(dnn_hidden_units=[16, 8], dnn_activations="ReLU",
                attention_hidden_units=[8], attention_activation="ReLU")
    ref = mod.DMIN(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p, bias=True):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        if bias:
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])
    with torch.no_grad():
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]].copy()
            rows[0] = 0.0      # torch padding_idx rows are zero-initialized
            ref.embedding_layer.embedding_layers[name].weight.copy_(
                torch.from_numpy(rows))
        br = ref.behavior_refiner[0]
        br.attention.in_proj_weight.copy_(torch.from_numpy(
            np.asarray(params["refiner_qkv_0"]["kernel"]).T))
        br.attention.in_proj_bias.copy_(torch.from_numpy(
            np.asarray(params["refiner_qkv_0"]["bias"])))
        copy_lin(br.attention.out_proj, params["refiner_o_0"])
        br.layer_norm.weight.copy_(torch.from_numpy(
            np.asarray(params["refiner_ln_0"]["scale"])))
        br.layer_norm.bias.copy_(torch.from_numpy(
            np.asarray(params["refiner_ln_0"]["bias"])))
        ffn = [m for m in br.ffn if isinstance(m, torch.nn.Linear)]
        copy_lin(ffn[0], params["refiner_ffn1_0"])
        copy_lin(ffn[1], params["refiner_ffn2_0"])
        mie = ref.multi_interest_extractor[0]
        mie.W_qkv.weight.copy_(torch.from_numpy(
            np.asarray(params["mie_qkv_0"]["kernel"]).T))
        for h in range(2):
            mie.W_o[h].weight.copy_(torch.from_numpy(
                np.asarray(params[f"mie_o_0_{h}"]["kernel"]).T))
            mie.layer_norm[h].weight.copy_(torch.from_numpy(
                np.asarray(params[f"mie_ln_0_{h}"]["scale"])))
            mie.layer_norm[h].bias.copy_(torch.from_numpy(
                np.asarray(params[f"mie_ln_0_{h}"]["bias"])))
            ffn = [m for m in mie.ffn[h] if isinstance(m, torch.nn.Linear)]
            copy_lin(ffn[0], params[f"mie_ffn1_0_{h}"])
            copy_lin(ffn[1], params[f"mie_ffn2_0_{h}"])
            ta = mie.target_attention[h]
            ta.pos_emb.copy_(torch.from_numpy(
                np.asarray(params[f"ta_0_{h}_pos"])))
            copy_lin(ta.W_proj, params[f"ta_0_{h}_proj"])
            lins = [m for m in ta.attn_mlp.mlp
                    if isinstance(m, torch.nn.Linear)]
            copy_lin(lins[0], params[f"ta_0_{h}_mlp"]["Dense_0"])
            copy_lin(lins[1], params[f"ta_0_{h}_mlp"]["Dense_1"])
        lins = [m for m in ref.dnn.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            copy_lin(lin, params["dnn"][key])

    raw = np.load(f"{seq_dir}/train.npz", allow_pickle=True)
    n = 32
    batch_np = {}
    for name in list(fm.features) + fm.labels:
        arr = raw[name][:n]
        if arr.dtype == object:
            arr = np.stack(arr)
        batch_np[name] = arr
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(n, np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v, np.int64))
                   if np.asarray(v).dtype.kind in "iu"
                   else torch.from_numpy(np.asarray(v, np.float32))
                   for c, v in batch_np.items()}
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_dmr_forward_parity(tmp_path):
    """DMR: item2item attention (+rel score) and user2item network with
    output-vocab embeddings, causal per-position softmax, pos embeddings."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_dmr", "/root/reference/model_zoo/DMR/src/DMR.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.sequence2 import DMR as OurDMR

    seq_dir = "/root/reference/data/tiny_seq"
    overrides = {"embedding_dim": EMB_DIM,
                 "feature_specs": [{"name": "click_sequence",
                                    "feature_encoder": None}]}
    fm = FeatureMap("tiny_seq", seq_dir)
    fm.load(f"{seq_dir}/feature_map.json", overrides)
    cfg = dict(dnn_hidden_units=(16, 8), dnn_activations="relu",
               net_dropout=0, batch_norm=False,
               target_field="adgroup_id", sequence_field="click_sequence",
               neg_seq_field=None, context_field=None,
               enable_sum_pooling=False, enable_u2i_rel=True,
               enable_i2i_rel=True, attention_hidden_units=(8,),
               attention_activation="relu", attention_dropout=0,
               use_pos_emb=True, pos_emb_dim=3, aux_loss_beta=0)
    ours = OurDMR(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                  **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_seq", seq_dir)
    ref_fm.load(f"{seq_dir}/feature_map.json", overrides)
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(dnn_hidden_units=[16, 8], dnn_activations="ReLU",
                attention_hidden_units=[8], attention_activation="ReLU")
    ref = mod.DMR(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p, bias=True):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        if bias:
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    from fuxictr_tpu.ops.embedding import EmbeddingLayout
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"]["table_d4"])
    with torch.no_grad():
        for name, plan in layout.fields.items():
            rows = table[plan["offset"]:plan["offset"]
                         + plan["spec"]["vocab_size"]].copy()
            rows[0] = 0.0
            ref.embedding_layer.embedding_layers[name].weight.copy_(
                torch.from_numpy(rows))
        out_rows = np.asarray(params["out_emb_adgroup_id"]["embedding"])
        out_rows = out_rows.copy()
        out_rows[0] = 0.0
        ref.output_emb_layer["adgroup_id"].weight.copy_(
            torch.from_numpy(out_rows))
        i2i = ref.i2i_net[0]
        copy_lin(i2i.W_q[0], params["i2i_Wq_0"])
        i2i.pos_emb.copy_(torch.from_numpy(np.asarray(params["i2i_pos_0"])))
        lins = [m for m in i2i.attn_mlp.mlp
                if isinstance(m, torch.nn.Linear)]
        copy_lin(lins[0], params["i2i_0_mlp"]["Dense_0"])
        copy_lin(lins[1], params["i2i_0_mlp"]["Dense_1"])
        u2i = ref.u2i_net[0]
        copy_lin(u2i.W_q[0], params["u2i_Wq_0"])
        copy_lin(u2i.W_o[0], params["u2i_Wo_0"])
        u2i.pos_emb.copy_(torch.from_numpy(np.asarray(params["u2i_pos_0"])))
        lins = [m for m in u2i.attn_mlp.mlp
                if isinstance(m, torch.nn.Linear)]
        copy_lin(lins[0], params["u2i_0_mlp"]["Dense_0"])
        copy_lin(lins[1], params["u2i_0_mlp"]["Dense_1"])
        lins = [m for m in ref.dnn.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            copy_lin(lin, params["dnn"][key])

    raw = np.load(f"{seq_dir}/train.npz", allow_pickle=True)
    n = 32
    batch_np = {}
    for name in list(fm.features) + fm.labels:
        arr = raw[name][:n]
        if arr.dtype == object:
            arr = np.stack(arr)
        batch_np[name] = arr
    batch_ours = dict(batch_np)
    batch_ours["__mask__"] = np.ones(n, np.float32)
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    torch_batch = {c: torch.from_numpy(np.asarray(v, np.int64))
                   if np.asarray(v).dtype.kind in "iu"
                   else torch.from_numpy(np.asarray(v, np.float32))
                   for c, v in batch_np.items()}
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_fgcnn_forward_parity(tmp_path):
    """FGCNN: conv feature generation over the field axis + recombination
    (layout permutation NHWC vs NCHW) + IPNN head over raw+generated."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_fgcnn", "/root/reference/model_zoo/FGCNN/src/FGCNN.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from fuxictr_tpu.models.zoo.ranking4 import FGCNN as OurFGCNN

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    cfg = dict(share_embedding=False, channels=(3, 4),
               kernel_heights=(3, 3), pooling_sizes=(2, 2),
               recombined_channels=(2, 2), conv_activation="tanh",
               conv_batch_norm=False, dnn_hidden_units=(16, 8),
               dnn_activations="relu", dnn_batch_norm=False, net_dropout=0)
    ours = OurFGCNN(fm, embedding_dim=EMB_DIM, model_root=str(tmp_path),
                    **cfg)
    ours.init_params()
    params = jax.device_get(ours.state.params)

    ref_fm = RefFM("tiny_parquet", DATA_DIR)
    ref_fm.load(FM_JSON, {"embedding_dim": EMB_DIM})
    kwargs = dict(REF_KWARGS)
    for k in ("hidden_units", "hidden_activations", "net_dropout",
              "batch_norm"):
        kwargs.pop(k)
    rcfg = dict(cfg)
    rcfg.update(channels=[3, 4], kernel_heights=[3, 3],
                pooling_sizes=[2, 2], recombined_channels=[2, 2],
                dnn_hidden_units=[16, 8], dnn_activations="ReLU")
    ref = mod.FGCNN(ref_fm, **rcfg, **kwargs)
    ref.eval()

    def copy_lin(lin, p):
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    with torch.no_grad():
        _copy_fused_table(params, ref, fm, EMB_DIM)
        # fg (conv-input) embedding: separate fused table
        from fuxictr_tpu.ops.embedding import EmbeddingLayout
        layout = EmbeddingLayout(fm, EMB_DIM)
        fg_table = np.asarray(params["fg_embedding"][f"table_d{EMB_DIM}"])
        for name, plan in layout.fields.items():
            rows = fg_table[plan["offset"]:plan["offset"]
                            + plan["spec"]["vocab_size"]]
            ref.fg_embedding_layer.embedding_layer \
                .embedding_layers[name].weight.copy_(torch.from_numpy(rows))
        heights = []
        H = fm.num_fields
        for ps in (2, 2):
            H = int(np.ceil(H / ps))
            heights.append(H)
        for i in range(2):
            conv = [m for m in ref.fgcnn_layer.conv_layers[i]
                    if isinstance(m, torch.nn.Conv2d)][0]
            k = np.asarray(params[f"conv_{i}"]["kernel"])  # [kh,1,in,out]
            conv.weight.copy_(torch.from_numpy(
                k.transpose(3, 2, 0, 1)))                  # [out,in,kh,1]
            conv.bias.copy_(torch.from_numpy(
                np.asarray(params[f"conv_{i}"]["bias"])))
            rec = [m for m in ref.fgcnn_layer.recombine_layers[i]
                   if isinstance(m, torch.nn.Linear)][0]
            rk = np.asarray(params[f"recombine_{i}"]["kernel"])
            Hh, D, C = heights[i], EMB_DIM, (3, 4)[i]
            # our flat input ordering is (h, d, c) [NHWC]; torch flattens
            # (c, h, d) [NCHW] — permute the input rows
            rk = rk.reshape(Hh, D, C, -1).transpose(2, 0, 1, 3) \
                .reshape(C * Hh * D, -1)
            rec.weight.copy_(torch.from_numpy(rk.T))
            rec.bias.copy_(torch.from_numpy(
                np.asarray(params[f"recombine_{i}"]["bias"])))
        lins = [m for m in ref.dnn.mlp if isinstance(m, torch.nn.Linear)]
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            copy_lin(lin, params["dnn"][key])

    batch_ours, torch_batch = _fixture_batch()
    pred = ours._make_predict_step()(ours.state, jax.device_put(batch_ours))
    with torch.no_grad():
        ref_out = ref.forward(torch_batch)["y_pred"].numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_out,
                               rtol=1e-4, atol=1e-5)
