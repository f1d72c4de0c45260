"""Full-model forward parity for the LongCTR retrieval family: our JAX
SIM/ETA/SDIM/TWIN/MIRRN vs the reference PyTorch implementations
(/root/reference/model_zoo/LongCTR/*) with identical weights on identical
side-table batches — the oracle across fused embedding, GSU/ESU retrieval,
SimHash/LSH, consistent top-k attention, and frequency-domain filters.

Tie handling: hash distances are integer-valued, and torch's ``topk`` tie
order is implementation-defined (heap order), so for the LSH retrievers
(ETA, MIRRN) the oracle uses ``topk >= seq_len`` — selection becomes
total, which is tie-proof, while still exercising hashing, gather,
positional offsets, filters, and attention end-to-end. SIM and TWIN select
on continuous scores (ties are measure-zero) and run with a real top-k.
"""

import importlib.util
import os
import sys

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

import jax

from fuxictr_tpu.data.longctr_loader import (ITEMS_KEY, SEQ_MASK_KEY,
                                             LongCTRDataLoader)
from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.ops.embedding import EmbeddingLayout

DATA = "/root/repo/data/tiny_longctr"
EMB_DIM = 8
MAX_LEN = 12
BATCH = 16

REF_BASE = dict(
    gpu=-1, optimizer="adam", loss="binary_crossentropy",
    learning_rate=1e-3, model_root="/tmp/ref_longctr_parity", verbose=0,
    monitor="AUC", monitor_mode="max", early_stop_patience=2,
    save_best_only=True, eval_steps=None, embedding_regularizer=None,
    net_regularizer=None, reduce_lr_on_plateau=True,
    task="binary_classification", metrics=["AUC"], embedding_dim=EMB_DIM,
    net_dropout=0, batch_norm=False)


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_longctr_{name}",
        f"/root/reference/model_zoo/LongCTR/{name}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, name)


def _feature_maps():
    fm = FeatureMap("tiny_longctr", DATA)
    fm.load(f"{DATA}/feature_map.json", {"embedding_dim": EMB_DIM})
    rfm = RefFM("tiny_longctr", DATA)
    rfm.load(f"{DATA}/feature_map.json", {"embedding_dim": EMB_DIM})
    return fm, rfm


def _batches(fm):
    """One loader batch in our layout + the reference's 3-tuple layout."""
    loader = LongCTRDataLoader(
        fm, f"{DATA}/train.parquet", batch_size=BATCH, shuffle=False,
        user_info=f"{DATA}/user_info.parquet",
        item_info=f"{DATA}/item_info.parquet",
        max_len=MAX_LEN, dedup_items=False)
    batch = next(iter(loader))
    assert np.all(batch["__mask__"] > 0), "need a full batch for the oracle"
    batch_dict = {}
    for col in list(fm.features) + fm.labels:
        if col in batch:
            arr = np.asarray(batch[col])
            batch_dict[col] = (
                torch.from_numpy(arr.astype(np.int64))
                if arr.dtype.kind in "iu"
                else torch.from_numpy(arr.astype(np.float32)))
    item_dict = {k: torch.from_numpy(np.asarray(v, np.int64))
                 for k, v in batch[ITEMS_KEY].items()}
    mask = torch.from_numpy(np.asarray(batch[SEQ_MASK_KEY], np.float32))
    return batch, (batch_dict, item_dict, mask)


def _copy_table(params, fm, ref):
    layout = EmbeddingLayout(fm, EMB_DIM)
    table = np.asarray(params["embedding"][f"table_d{EMB_DIM}"])
    emb_layers = ref.embedding_layer.embedding_layer.embedding_layers
    for name, plan in layout.fields.items():
        rows = table[plan["offset"]:plan["offset"]
                     + plan["spec"]["vocab_size"]].copy()
        # torch nn.Embedding(padding_idx=0) keeps row 0 at zero; our fused
        # table enforces padding-zero at LOOKUP instead, so its row 0 is
        # arbitrary — zero it to preserve torch's invariant
        if plan["spec"].get("padding_idx") == 0:
            rows[0] = 0.0
        emb_layers[name].weight.copy_(torch.from_numpy(rows))


def _copy_linear(ref_linear, kernel, bias=None):
    ref_linear.weight.copy_(torch.from_numpy(np.asarray(kernel).T))
    if bias is not None:
        ref_linear.bias.copy_(torch.from_numpy(np.asarray(bias)))


def _copy_mha(att_params, ref_mod):
    for w in ("W_q", "W_k", "W_v", "W_o"):
        _copy_linear(getattr(ref_mod, w), att_params[w]["kernel"])


def _copy_mlp(mlp_params, ref_mlp):
    lins = [m for m in ref_mlp.mlp if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(lins):
        d = mlp_params[f"Dense_{i}"]
        _copy_linear(lin, d["kernel"], d.get("bias"))


def _our_outputs(ours, batch):
    out = ours.net.apply({"params": ours.state.params}, batch, train=False)
    return {k: np.asarray(jax.nn.sigmoid(v)).reshape(-1)
            for k, v in out.items() if hasattr(v, "reshape")}


def test_sim_forward_parity(tmp_path):
    """SIM: GSU soft-search qk → top-k → ESU attention + aux head
    (ref: model_zoo/LongCTR/SIM/SIM.py:124-168)."""
    from fuxictr_tpu.models.zoo.longctr import SIM
    fm, rfm = _feature_maps()
    ours = SIM(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16,),
               dnn_activations="relu", attention_dim=8, num_heads=1,
               short_seq_len=4, topk=5, max_len=MAX_LEN,
               model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    RefSIM = _load_ref("SIM")
    ref = RefSIM(rfm, dnn_hidden_units=[16], dnn_activations="ReLU",
                 attention_dim=8, num_heads=1, short_seq_len=4, topk=5,
                 **REF_BASE)
    ref.eval()
    with torch.no_grad():
        _copy_table(params, fm, ref)
        _copy_linear(ref.W_a, params["W_a"]["kernel"])
        _copy_linear(ref.W_b, params["W_b"]["kernel"])
        _copy_mha(params["short_attention"], ref.short_attention)
        _copy_mha(params["long_attention"], ref.long_attention)
        _copy_mlp(params["dnn"], ref.dnn)
        _copy_mlp(params["dnn_aux"], ref.dnn_aux)

    batch, ref_inputs = _batches(fm)
    got = _our_outputs(ours, batch)
    with torch.no_grad():
        want = ref.forward(ref_inputs)
    np.testing.assert_allclose(got["y_pred"],
                               want["y_pred"].numpy().reshape(-1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["y_aux"],
                               want["y_aux"].numpy().reshape(-1),
                               rtol=1e-4, atol=1e-5)


def test_eta_forward_parity(tmp_path):
    """ETA: SimHash retrieval (ref: model_zoo/LongCTR/ETA/ETA.py:126-199).
    topk >= seq_len for tie-proof selection (see module docstring)."""
    from fuxictr_tpu.models.zoo.longctr import ETA
    fm, rfm = _feature_maps()
    ours = ETA(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16,),
               dnn_activations="relu", attention_dim=8, num_heads=1,
               short_seq_len=4, topk=MAX_LEN, hash_bits=16,
               max_len=MAX_LEN, model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    RefETA = _load_ref("ETA")
    ref = RefETA(rfm, dnn_hidden_units=[16], dnn_activations="ReLU",
                 attention_dim=8, num_heads=1, short_seq_len=4,
                 topk=MAX_LEN, hash_bits=16, **REF_BASE)
    ref.eval()
    with torch.no_grad():
        _copy_table(params, fm, ref)
        ref.random_rotations.copy_(torch.from_numpy(
            np.asarray(params["random_rotations"])))
        _copy_mha(params["short_attention"], ref.short_attention)
        _copy_mha(params["long_attention"], ref.long_attention)
        _copy_mlp(params["dnn"], ref.dnn)

    batch, ref_inputs = _batches(fm)
    got = _our_outputs(ours, batch)
    with torch.no_grad():
        want = ref.forward(ref_inputs)
    np.testing.assert_allclose(got["y_pred"],
                               want["y_pred"].numpy().reshape(-1),
                               rtol=1e-4, atol=1e-5)


def test_sdim_forward_parity(tmp_path):
    """SDIM: multi-round LSH collision attention — our dense collision-mask
    contraction vs the reference's embedding_bag over nonzero indices
    (ref: model_zoo/LongCTR/SDIM/SDIM.py:123-195)."""
    from fuxictr_tpu.models.zoo.longctr import SDIM
    fm, rfm = _feature_maps()
    ours = SDIM(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16,),
                dnn_activations="relu", attention_dim=8, num_heads=1,
                short_seq_len=4, num_hashes=3, hash_bits=4, l2_norm=True,
                max_len=MAX_LEN, model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    RefSDIM = _load_ref("SDIM")
    ref = RefSDIM(rfm, dnn_hidden_units=[16], dnn_activations="ReLU",
                  attention_dim=8, num_heads=1, short_seq_len=4,
                  num_hashes=3, hash_bits=4, l2_norm=True, **REF_BASE)
    ref.eval()
    with torch.no_grad():
        _copy_table(params, fm, ref)
        ref.random_rotations.copy_(torch.from_numpy(
            np.asarray(params["random_rotations"])))
        _copy_mha(params["short_attention"], ref.short_attention)
        _copy_mlp(params["dnn"], ref.dnn)

    batch, ref_inputs = _batches(fm)
    got = _our_outputs(ours, batch)
    with torch.no_grad():
        want = ref.forward(ref_inputs)
    np.testing.assert_allclose(got["y_pred"],
                               want["y_pred"].numpy().reshape(-1),
                               rtol=1e-4, atol=1e-5)


def test_twin_forward_parity(tmp_path):
    """TWIN: consistent two-stage top-k attention, multi-head
    (ref: model_zoo/LongCTR/TWIN/TWIN.py:110-296)."""
    from fuxictr_tpu.models.zoo.longctr import TWIN
    fm, rfm = _feature_maps()
    ours = TWIN(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16,),
                dnn_activations="relu", attention_dim=8, num_heads=2,
                short_seq_len=4, topk=5, max_len=MAX_LEN,
                model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    RefTWIN = _load_ref("TWIN")
    ref = RefTWIN(rfm, dnn_hidden_units=[16], dnn_activations="ReLU",
                  attention_dim=8, num_heads=2, short_seq_len=4, topk=5,
                  **REF_BASE)
    ref.eval()
    with torch.no_grad():
        _copy_table(params, fm, ref)
        _copy_mha(params["short_attention"], ref.short_attention)
        for w in ("W_q", "W_h", "W_v", "W_o"):
            _copy_linear(getattr(ref.long_attention, w),
                         params[w]["kernel"])
        _copy_mlp(params["dnn"], ref.dnn)

    batch, ref_inputs = _batches(fm)
    got = _our_outputs(ours, batch)
    with torch.no_grad():
        want = ref.forward(ref_inputs)
    np.testing.assert_allclose(got["y_pred"],
                               want["y_pred"].numpy().reshape(-1),
                               rtol=1e-4, atol=1e-5)


def test_mirrn_forward_parity(tmp_path):
    """MIRRN: triple LSH retrieval + positional offsets + block FFT filters
    + fusion attention (ref: model_zoo/LongCTR/MIRRN/MIRRN.py:131-366).
    topk >= seq_len for tie-proof selection; indices are re-sorted
    ascending on both sides so the order-sensitive FFT path aligns."""
    from fuxictr_tpu.models.zoo.longctr import MIRRN
    fm, rfm = _feature_maps()
    ours = MIRRN(fm, embedding_dim=EMB_DIM, dnn_hidden_units=(16,),
                 dnn_activations="relu", attention_dim=8, num_heads=1,
                 short_seq_len=4, topk=MAX_LEN, hash_bits=16,
                 max_len=MAX_LEN, model_root=str(tmp_path))
    ours.init_params()
    params = jax.device_get(ours.state.params)

    RefMIRRN = _load_ref("MIRRN")
    ref = RefMIRRN(rfm, dnn_hidden_units=[16], dnn_activations="ReLU",
                   attention_dim=8, num_heads=1, short_seq_len=4,
                   topk=MAX_LEN, hash_bits=16, max_len=MAX_LEN, **REF_BASE)
    ref.eval()
    with torch.no_grad():
        _copy_table(params, fm, ref)
        ref.random_rotations.copy_(torch.from_numpy(
            np.asarray(params["random_rotations"])))
        ref.pos.weight.copy_(torch.from_numpy(
            np.asarray(params["pos_emb"])))
        _copy_mha(params["short_attention"], ref.short_attention)
        _copy_mha(params["long_attention"], ref.long_attention)
        for i in range(3):
            w = np.asarray(params[f"complex_weight_{i}"])  # [nb, d, 2]
            nb, d = w.shape[0], w.shape[1]
            # the reference stores a full [nb, d, d, 2] matrix but its
            # einsum "blnd,ndd->blnd" only reads the diagonal
            # (MIRRN.py:361) — embed our diagonal params
            full = np.zeros((nb, d, d, 2), np.float32)
            full[:, np.arange(d), np.arange(d)] = w
            ref.MHFT_block[i].complex_weight.copy_(torch.from_numpy(full))
            ln = params[f"filter_ln_{i}"]
            ref.MHFT_block[i].LayerNorm.weight.copy_(
                torch.from_numpy(np.asarray(ln["scale"])))
            ref.MHFT_block[i].LayerNorm.bias.copy_(
                torch.from_numpy(np.asarray(ln["bias"])))
        _copy_mlp(params["dnn"], ref.dnn)

    batch, ref_inputs = _batches(fm)
    got = _our_outputs(ours, batch)
    with torch.no_grad():
        want = ref.forward(ref_inputs)
    np.testing.assert_allclose(got["y_pred"],
                               want["y_pred"].numpy().reshape(-1),
                               rtol=1e-4, atol=1e-5)
