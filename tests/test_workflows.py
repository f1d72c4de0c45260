"""Workflow coverage mirroring the reference demo examples: pretrained
embeddings, grouped metrics, checkpoint/resume, seed determinism."""

import os

import numpy as np
import pytest

from fuxictr_tpu.config import load_config
from fuxictr_tpu.experiment import run_expid

CFG = "/root/repo/configs/tiny"
TINY_CSV = "/root/reference/data/tiny_csv"

PRETRAIN_FEATURE_COLS = [
    {"name": "userid", "active": True, "dtype": "str", "type": "categorical",
     "pretrained_emb": f"{TINY_CSV}/userid_emb_dim8.npz",
     "embedding_dim": 8, "freeze_emb": True},
    {"name": ["adgroup_id", "pid", "cate_id", "campaign_id", "customer",
              "brand", "cms_segid", "cms_group_id", "final_gender_code",
              "age_level", "pvalue_level", "shopping_level", "occupation"],
     "active": True, "dtype": "str", "type": "categorical"},
]


def test_pretrained_embedding_end_to_end(tmp_path):
    """Demo example5: frozen pretrained userid vectors (csv build → train)."""
    params = load_config(CFG, "DeepFM_test")
    params.update(
        model_root=str(tmp_path), data_root=str(tmp_path) + "/data/",
        dataset_id="tiny_pretrain", data_format="csv",
        train_data=f"{TINY_CSV}/train_sample.csv",
        valid_data=f"{TINY_CSV}/valid_sample.csv",
        test_data=f"{TINY_CSV}/test_sample.csv",
        min_categr_count=1,
        embedding_dim=8,        # match the pretrained dim (demo example5)
        feature_cols=PRETRAIN_FEATURE_COLS,
        label_col={"name": "clk", "dtype": "float"})
    result = run_expid(CFG, "DeepFM_test", params=params)
    assert 0.0 < result["valid"]["AUC"] <= 1.0
    # artifacts: copied pretrained table + spec in feature_map.json
    import json
    fmj = json.load(open(tmp_path / "data" / "tiny_pretrain"
                         / "feature_map.json"))
    spec = {k: v for e in fmj["features"] for k, v in e.items()}["userid"]
    assert spec["pretrained_emb"] == "pretrained_userid.npz"
    assert spec["freeze_emb"] is True
    assert os.path.exists(tmp_path / "data" / "tiny_pretrain"
                          / "pretrained_userid.npz")


def test_group_metrics_end_to_end(tmp_path):
    """gAUC/avgAUC/NDCG with group_id=userid (reference group metrics)."""
    params = load_config(CFG, "DeepFM_test")
    params.update(model_root=str(tmp_path), group_id="userid",
                  metrics=["gAUC", "avgAUC", "MRR", "AUC"],
                  monitor="gAUC")
    result = run_expid(CFG, "DeepFM_test", params=params)
    assert 0.0 < result["valid"]["gAUC"] <= 1.0
    assert 0.0 < result["valid"]["avgAUC"] <= 1.0
    assert result["valid"]["MRR"] > 0.0


def test_checkpoint_weights_roundtrip(tmp_path):
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)
    import jax
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=20, embedding_dim=4)
    m = DNN(fm, embedding_dim=4, hidden_units=(8,), model_root=str(tmp_path))
    m.init_params()
    batch = jax.device_put(make_synthetic_batch(fm, 8))
    step = m._make_train_step()
    m.state, _ = step(m.state, batch, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "w.model")
    m.save_weights(ckpt)
    before = np.asarray(m._make_predict_step()(m.state, batch))

    m2 = DNN(fm, embedding_dim=4, hidden_units=(8,), model_root=str(tmp_path))
    m2.init_params()
    m2.load_weights(ckpt)
    after = np.asarray(m2._make_predict_step()(m2.state, batch))
    np.testing.assert_allclose(before, after, rtol=1e-6)


def test_full_state_resume(tmp_path):
    """save_checkpoint/load_checkpoint restore optimizer state + step, so
    resumed training matches uninterrupted training exactly."""
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)
    import jax
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=20, embedding_dim=4)
    batches = [make_synthetic_batch(fm, 8, seed=s) for s in range(4)]

    def fresh():
        m = DNN(fm, embedding_dim=4, hidden_units=(8,),
                model_root=str(tmp_path))
        m.init_params()
        return m, m._make_train_step()

    # uninterrupted: 4 steps
    m, step = fresh()
    rngs = [jax.random.PRNGKey(i) for i in range(4)]
    for b, r in zip(batches, rngs):
        m.state, _ = step(m.state, jax.device_put(b), r)
    ref = jax.device_get(m.state.params)

    # interrupted after 2 steps + resume
    m1, step1 = fresh()
    for b, r in zip(batches[:2], rngs[:2]):
        m1.state, _ = step1(m1.state, jax.device_put(b), r)
    ckpt = str(tmp_path / "full.ckpt")
    m1.save_checkpoint(ckpt)
    m2, step2 = fresh()
    m2.load_checkpoint(ckpt)
    assert int(m2.state.step) == 2
    for b, r in zip(batches[2:], rngs[2:]):
        m2.state, _ = step2(m2.state, jax.device_put(b), r)
    resumed = jax.device_get(m2.state.params)
    for a, b_ in zip(jax.tree_util.tree_leaves(ref),
                     jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_allclose(a, b_, rtol=1e-6, atol=1e-7)


def test_resume_through_fit(tmp_path):
    """load_checkpoint + fit() keeps the restored opt_state/step (true
    resume) and matches uninterrupted fit() exactly."""
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)
    import jax
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=20, embedding_dim=4)
    batches = [make_synthetic_batch(fm, 16, seed=s) for s in range(4)]
    valid = [make_synthetic_batch(fm, 16, seed=9)]

    def fresh(root):
        return DNN(fm, embedding_dim=4, hidden_units=(8,),
                   model_root=str(tmp_path / root),
                   reduce_lr_on_plateau=False)

    m = fresh("full")
    m.fit(batches, epochs=1, validation_data=valid)
    ref = jax.device_get(m.state.params)

    m1 = fresh("part1")
    m1.fit(batches[:2], epochs=1, validation_data=valid)
    ckpt = str(tmp_path / "resume.ckpt")
    m1.save_checkpoint(ckpt)

    m2 = fresh("part2")
    m2.load_checkpoint(ckpt)
    assert int(m2.state.step) == 2
    m2.fit(batches[2:], epochs=1, validation_data=valid)
    assert int(m2.state.step) == 4
    resumed = jax.device_get(m2.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_regularizer_scope_is_type_based(tmp_path):
    """Embedding-vs-net regularizer split keys on FeatureEmbedding module
    TYPE (reference rank_model.py:106-112), not on name prefixes."""
    from fuxictr_tpu.models.base import _is_embedding_path
    from fuxictr_tpu.models.zoo.ranking import DeepFM
    from fuxictr_tpu.utils.synthetic import make_synthetic_feature_map
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=20, embedding_dim=4)
    m = DeepFM(fm, embedding_dim=4, hidden_units=[8],
               model_root=str(tmp_path))
    prefixes = m._embedding_prefixes()
    assert ("embedding",) in prefixes
    assert ("fm", "lr", "embedding") in prefixes
    assert _is_embedding_path(("embedding", "table_d4"), prefixes)
    assert not _is_embedding_path(("mlp", "Dense_0", "kernel"), prefixes)
    # a net module that merely *sounds* like an embedding is NOT matched
    assert not _is_embedding_path(("embedding_head", "kernel"), prefixes)


def test_lr_decay_with_accumulation(tmp_path):
    """lr_decay finds the injected LR by tree traversal — including through
    the MultiSteps wrapper used for gradient accumulation."""
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.utils.synthetic import make_synthetic_feature_map
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=20, embedding_dim=4)
    for acc in (1, 2):
        m = DNN(fm, embedding_dim=4, hidden_units=(8,),
                model_root=str(tmp_path), learning_rate=1e-3,
                accumulation_steps=acc)
        m.init_params()
        np.testing.assert_allclose(m.lr_decay(), 1e-4, rtol=1e-6)
        np.testing.assert_allclose(m.lr_decay(), 1e-5, rtol=1e-6)


def test_seed_determinism(tmp_path):
    """Same seed → identical metrics (reference reproducibility guarantee)."""
    results = []
    for run in range(2):
        params = load_config(CFG, "DNN_test")
        params.update(model_root=str(tmp_path / f"run{run}"), seed=2019)
        results.append(run_expid(CFG, "DNN_test", params=params))
    assert results[0]["valid"]["AUC"] == results[1]["valid"]["AUC"]
    assert results[0]["valid"]["logloss"] == results[1]["valid"]["logloss"]


def test_embedding_type_input_end_to_end(tmp_path):
    """Demo example8: pre-embedded list features as model inputs."""
    params = load_config(CFG, "DNN_test")
    params.update(
        model_root=str(tmp_path), data_root=str(tmp_path) + "/data/",
        dataset_id="tiny_emb", data_format="parquet", rebuild_dataset=True,
        train_data="/root/reference/data/tiny_emb/train.parquet",
        valid_data="/root/reference/data/tiny_emb/valid.parquet",
        test_data="/root/reference/data/tiny_emb/test.parquet",
        feature_cols=[
            {"active": True, "dtype": "float", "name": "feat1",
             "type": "numeric"},
            {"active": True, "dtype": "float", "name": "feat2",
             "type": "numeric"},
            {"active": True, "dtype": "list", "name": "feat3",
             "pretrain_dim": 96, "type": "embedding"}],
        label_col={"dtype": "float", "name": "label"})
    # parquet inputs with feature_cols go through build_dataset (csv-style)
    from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset
    fp = FeatureProcessor(**params)
    params["train_data"], params["valid_data"], params["test_data"] = \
        build_dataset(fp, **params)
    params["data_format"] = "parquet"
    result = run_expid(CFG, "DNN_test", params=params)
    assert 0.0 < result["valid"]["AUC"] <= 1.0


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax sharded-checkpoint save/restore preserves the train state."""
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)
    import jax
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=16, embedding_dim=4)
    m = DNN(fm, embedding_dim=4, hidden_units=(8,), model_root=str(tmp_path))
    m.init_params()
    batch = jax.device_put(make_synthetic_batch(fm, 8))
    m.state, _ = m._make_train_step()(m.state, batch, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "orbax_ckpt")
    m.save_checkpoint(ckpt, use_orbax=True)

    m2 = DNN(fm, embedding_dim=4, hidden_units=(8,),
             model_root=str(tmp_path))
    m2.load_checkpoint(ckpt, use_orbax=True)
    assert int(m2.state.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(m.state.params)),
                    jax.tree_util.tree_leaves(
                        jax.device_get(m2.state.params))):
        np.testing.assert_allclose(a, b)


def test_profiler_trace(tmp_path):
    """profile_dir captures an XLA trace of the first epoch."""
    params = load_config(CFG, "DNN_test")
    params.update(model_root=str(tmp_path),
                  profile_dir=str(tmp_path / "trace"))
    run_expid(CFG, "DNN_test", params=params)
    import glob
    assert glob.glob(str(tmp_path / "trace" / "**" / "*.trace.json*"),
                     recursive=True) or \
        glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"),
                  recursive=True)


def test_periodic_async_checkpoints(tmp_path):
    """periodic_ckpt: N writes full-state orbax checkpoints every N eval
    boundaries without blocking, rotates to periodic_ckpt_keep newest,
    and the latest one resumes through fit() exactly."""
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)
    import jax
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=20, embedding_dim=4)
    batches = [make_synthetic_batch(fm, 16, seed=s) for s in range(6)]

    def fresh(root, **kw):
        return DNN(fm, embedding_dim=4, hidden_units=(8,),
                   model_root=str(tmp_path / root),
                   reduce_lr_on_plateau=False, **kw)

    m = fresh("periodic", periodic_ckpt=1, periodic_ckpt_keep=2,
              eval_steps=2)
    # no validation: periodic ckpts fire on eval boundaries regardless,
    # and fit() does not end by reloading "best" weights (which would
    # make the parity comparison below depend on which eval won)
    m.fit(batches, epochs=1)                          # 6 steps → 3 evals
    m._finish_periodic_checkpoint()
    root = m.periodic_ckpt_dir
    steps = sorted(int(d.split("_")[1]) for d in os.listdir(root)
                   if d.startswith("step_"))
    assert len(steps) == 2, steps            # rotated: keep 2 newest
    assert steps[-1] == 6
    latest = m.latest_checkpoint(root)
    assert latest.endswith("step_6")

    # the saved state resumes through fit() and matches uninterrupted
    m_ref = fresh("uninterrupted", eval_steps=2)
    m_ref.fit(batches + batches[:2], epochs=1)

    m2 = fresh("resumed", eval_steps=2)
    m2.load_checkpoint(latest, use_orbax=True)
    assert int(m2.state.step) == 6
    m2.fit(batches[:2], epochs=1)
    assert int(m2.state.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(
                        jax.device_get(m_ref.state.params)),
                    jax.tree_util.tree_leaves(
                        jax.device_get(m2.state.params))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_docs_build(tmp_path):
    """scripts/build_docs.py renders the documentation set to a static
    HTML site (the reference ships a jupyter-book build; this is the
    no-extra-deps equivalent)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "build_docs", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "build_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    pages = mod.build(str(tmp_path))
    assert len(pages) >= 5
    html = open(os.path.join(str(tmp_path), "index.html")).read()
    assert "<nav>" in html and "fuxictr_tpu" in html
