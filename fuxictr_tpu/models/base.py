"""Training runtime: functional TrainState + jitted train/eval steps.

Behavioral parity with the reference BaseModel
(/root/reference/fuxictr/pytorch/models/rank_model.py:31-470): fit →
train_epoch → train_step, eval every ``eval_steps``, weighted-Monitor early
stop (patience, min_delta 1e-6), reduce-LR-on-plateau (×0.1, floor 1e-6),
best-only weight checkpointing, split embedding/net p-norm regularization,
global-norm grad clipping (default max 10).

TPU-native differences:
  - one compiled ``train_step`` (forward+loss+reg+clip+update) with donated
    state; losses stay on device until the logging boundary.
  - the loss is computed on logits (stable fused sigmoid-BCE) and weighted by
    the batch validity mask so padded fixed-shape batches are exact.
  - LR plateau decay mutates the optax ``inject_hyperparams`` leaf — no
    retrace.
  - checkpoints carry the full train state (params + opt state + step) so
    mid-run resume works (the reference saves weights only).
"""

import logging
import os
import pickle
import shutil
import time
from functools import partial

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from fuxictr_tpu.config import Monitor
from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
from fuxictr_tpu.data.device_cache import ROWS_KEY, expand_cached_batch
from fuxictr_tpu.metrics import evaluate_metrics
from fuxictr_tpu.ops.common import get_regularizer
from fuxictr_tpu.parallel import (param_sharding, replicated, shard_batch,
                                  shard_params)
from fuxictr_tpu.utils.compile_cache import timed_first_dispatch


def seed_everything(seed=2019, impl=None):
    """Seed numpy and build the model's root PRNG key.

    ``impl`` selects the key's PRNG implementation (e.g. ``'rbg'``, the
    TPU-native hardware generator) for THIS key lineage only — split keys
    inherit it — without mutating the process-global
    ``jax_default_prng_impl`` (which would silently switch every other
    model's random streams)."""
    np.random.seed(seed)
    if impl:
        # typed key: carries its impl in the dtype, so split/fold_in keep
        # using it (a raw PRNGKey array would be re-interpreted under the
        # process default impl downstream)
        return jax.random.key(seed, impl=impl)
    return jax.random.PRNGKey(seed)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    model_state: dict      # batch_stats etc.
    opt_state: optax.OptState


def _is_embedding_path(path, prefixes=None):
    """True for params owned by an embedding front-end module (the split the
    reference draws BY MODULE TYPE at FeatureEmbeddingDict,
    rank_model.py:106-112). When ``prefixes`` (module paths of
    FeatureEmbedding instances, collected via flax ``module_paths``) is
    available it is authoritative; the name heuristic is only the fallback
    for nets that cannot be abstractly traced."""
    if prefixes is not None:
        return any(tuple(path[:len(pre)]) == pre for pre in prefixes)
    return any(str(p).startswith(("embedding", "FeatureEmbedding", "Embedding"))
               for p in path)


def _is_grouped_metric(m):
    """Metrics needing a group_id: grouped AUCs + the ranked family."""
    return m in ("gAUC", "avgAUC", "MRR") or m.startswith("NDCG")


def _device_metric_supported(m, gid):
    """Whether metric ``m`` has an exact on-device pass
    (metrics.py: device_metric_components / device_grouped_components /
    device_ranked_components)."""
    if m in ("AUC", "logloss", "binary_crossentropy"):
        return True
    return gid is not None and _is_grouped_metric(m)


def make_loss_fn(loss):
    """Map config loss names to logit-space losses."""
    if callable(loss):
        return loss
    name = str(loss).lower()
    if name in ("bce", "binary_crossentropy", "binary_cross_entropy"):
        return lambda logits, y: optax.sigmoid_binary_cross_entropy(logits, y)
    if name in ("mse", "mean_squared_error"):
        return lambda pred, y: (pred - y) ** 2
    if name in ("mae", "l1"):
        return lambda pred, y: jnp.abs(pred - y)
    raise NotImplementedError(f"loss={loss} is not supported.")


def _is_lazy_table_path(path):
    """Fused embedding tables eligible for lazy (touched-rows-only) adam."""
    import re
    return bool(re.fullmatch(r"table_d\d+(b\d+)?", str(path[-1]))) \
        if path else False


def make_optimizer(name, lr, max_gradient_norm=10.0, accumulation_steps=1,
                   lazy_adam=False):
    """optax chain: global-norm clip → injected-LR optimizer (mutable LR);
    optionally wrapped in MultiSteps for gradient accumulation (the
    reference's SIM-style accumulation, SIM.py:229-246).

    ``lazy_adam=True`` masks the fused embedding tables OUT of the dense
    optimizer (their clipped grads pass through unchanged) — the train
    step applies row-sparse adam to them from the embedding layer's
    ``touched_rows`` trace instead. The global-norm clip still sees every
    gradient."""
    name = str(name).lower()
    opts = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "adagrad": optax.adagrad,
        "rmsprop": optax.rmsprop,
        "ftrl": getattr(optax, "ftrl", optax.adagrad),
    }
    if name not in opts:
        raise NotImplementedError(f"optimizer={name} is not supported.")
    inner = optax.inject_hyperparams(opts[name])(learning_rate=lr)
    if lazy_adam:
        if name != "adam":
            raise ValueError("lazy_adam requires optimizer=adam")
        if accumulation_steps and accumulation_steps > 1:
            raise ValueError("lazy_adam is incompatible with "
                             "accumulation_steps > 1")

        def dense_mask(params):
            flat = flax.traverse_util.flatten_dict(params)
            return flax.traverse_util.unflatten_dict(
                {p: not _is_lazy_table_path(p) for p in flat})

        inner = optax.masked(inner, dense_mask)
    tx = optax.chain(optax.clip_by_global_norm(max_gradient_norm), inner)
    if accumulation_steps and accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx


ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


def lazy_adam_row_update(table, mu, nu, count, clipped_grad, rows, lr):
    """Row-sparse adam on ``rows`` only (torch SparseAdam semantics: moment
    decay and updates are skipped for untouched rows; bias correction uses
    the per-table step count). Duplicate row ids are safe: every duplicate
    computes the identical new value, so the scatter-set is deterministic."""
    g = clipped_grad[rows]
    mu_new = ADAM_B1 * mu[rows] + (1.0 - ADAM_B1) * g
    nu_new = ADAM_B2 * nu[rows] + (1.0 - ADAM_B2) * g * g
    t = count + 1
    mu_hat = mu_new / (1.0 - ADAM_B1 ** t)
    nu_hat = nu_new / (1.0 - ADAM_B2 ** t)
    delta = -lr * mu_hat / (jnp.sqrt(nu_hat) + ADAM_EPS)
    return (table.at[rows].set(table[rows] + delta.astype(table.dtype)),
            mu.at[rows].set(mu_new), nu.at[rows].set(nu_new), t)


class RankModel:
    """Host-side driver around a flax net returning {"y_pred": logits, ...}."""

    def __init__(self,
                 feature_map,
                 net=None,
                 model_id="RankModel",
                 task="binary_classification",
                 gpu=-1,                      # accepted for config parity
                 monitor="AUC",
                 save_best_only=True,
                 monitor_mode="max",
                 early_stop_patience=2,
                 eval_steps=None,
                 embedding_regularizer=None,
                 net_regularizer=None,
                 reduce_lr_on_plateau=True,
                 **kwargs):
        self.feature_map = feature_map
        self.net = net
        self.model_id = model_id
        self.task = task
        self._monitor = Monitor(kv=monitor)
        self._monitor_mode = monitor_mode
        self._early_stop_patience = early_stop_patience
        self._eval_steps = eval_steps
        self._eval_steps_user = eval_steps
        self._save_best_only = save_best_only
        self._emb_reg = get_regularizer(embedding_regularizer)
        self._net_reg = get_regularizer(net_regularizer)
        self._reduce_lr_on_plateau = reduce_lr_on_plateau
        self._verbose = kwargs.get("verbose", 1)
        self._lazy_adam = bool(kwargs.get("lazy_adam", False))
        # 'rbg' is the TPU-native hardware generator: dropout mask cost
        # drops ~5x vs the default threefry (0.79 -> 0.16 ms/step on the
        # DCNv2/Criteo step, BENCHMARKS.md). Opt-in because it changes
        # the random stream (not the reproducibility guarantee). Scoped to
        # this model's key lineage via seed_everything(impl=...) — NOT the
        # process-global jax_default_prng_impl.
        self._rng_impl = kwargs.get("rng_impl") or None
        if "table_size_buckets" in kwargs:
            # config knob for the size-bucketed fused-table layout; carried
            # on the FeatureMap so every FeatureEmbedding in the net sees it
            # (ops/embedding.py:EmbeddingLayout resolution order)
            feature_map.table_size_buckets = kwargs["table_size_buckets"]
        if "table_dtype" in kwargs:
            # serving-only quantized table storage (ops/embedding.py);
            # fit() rejects it — see the guard there
            feature_map.table_dtype = kwargs["table_dtype"]
        if "seq_slice_gather" in kwargs:
            # sequence-history gathers route through a materialized
            # vocab-slice temp when the field vocab is smaller than the
            # flat id count (ops/embedding.py:_lookup_fused) — numerics
            # identical; knob exists to disable for A/B measurement
            feature_map.seq_slice_gather = kwargs["seq_slice_gather"]
        self._max_len = kwargs.get("max_len", 50)   # LongCTR batch layout
        self.validation_metrics = kwargs.get("metrics", ["AUC"])
        self.model_dir = os.path.join(kwargs.get("model_root", "./checkpoints"),
                                      feature_map.dataset_id)
        self.checkpoint = os.path.abspath(
            os.path.join(self.model_dir, self.model_id + ".model"))
        self.kwargs = kwargs
        self._optimizer_name = kwargs.get("optimizer", "adam")
        self._loss_name = kwargs.get("loss", "binary_crossentropy")
        self._learning_rate = kwargs.get("learning_rate", 1e-3)
        self.state = None
        self.mesh = None
        self._rng = seed_everything(kwargs.get("seed", 2019),
                                    impl=self._rng_impl)
        if kwargs.get("compile_cache", True):
            # persistent XLA compile cache: identical programs compile once
            # per machine, not once per process (utils/compile_cache.py) —
            # collapses the epoch-1 / tuner / serving-restart compile tax
            from fuxictr_tpu.utils.compile_cache import \
                enable_compilation_cache
            enable_compilation_cache(kwargs.get("compile_cache_dir"))
        cd = kwargs.get("compute_dtype")
        self._compute_dtype = None if cd in (None, "float32", "fp32") \
            else jnp.dtype(cd)
        self._jit_train_step = None
        self._jit_predict_step = None
        self._jit_multi_step = None
        self._jit_cached_epoch = None
        self._jit_cached_predict = None
        self._jit_cached_eval = None
        self._jit_metric_components = None
        # in-jit batch expansion for device-cache loaders; loaders with a
        # custom on-device layout (e.g. LongCTRDeviceCacheLoader) install
        # their own expander via _install_cache_expander
        self._expand_batch = partial(expand_cached_batch, self.feature_map)

    def _install_cache_expander(self, loader):
        """Adopt a loader's in-jit cache expander (device-resident custom
        layouts), or restore the default when the loader has none. Resets
        compiled steps whenever the expansion changes."""
        fn = getattr(loader, "cache_expander", None)
        src = type(loader) if fn is not None else None
        if src is getattr(self, "_expander_src", None):
            return
        self._expander_src = src
        self._expand_batch = (fn if fn is not None
                              else partial(expand_cached_batch,
                                           self.feature_map))
        self._jit_train_step = None
        self._jit_predict_step = None
        self._jit_multi_step = None
        self._jit_cached_epoch = None
        self._jit_cached_predict = None
        self._jit_cached_eval = None
        self._jit_metric_components = None

    # --------------------------------------------------------------- setup
    def compile(self, optimizer=None, loss=None, lr=None):
        """(Re)configure optimizer/loss/LR. Safe to call between fits: a
        changed optimizer rebuilds the transform (and re-inits opt_state —
        its structure differs); a changed LR is written into the LIVE
        opt_state hyperparams (optax inject_hyperparams carries the LR in
        state, so rebuilding the transform alone would not apply it)."""
        if optimizer is not None and optimizer != self._optimizer_name:
            self._optimizer_name = optimizer
            self._tx = None     # force rebuild on next fit
            if self.state is not None:
                self._ensure_optimizer(
                    getattr(self, "_max_gradient_norm", None) or 10.0)
                self.state = self.state.replace(
                    opt_state=self._init_opt_state(self.state.params))
        if loss is not None:
            self._loss_name = loss
        if lr is not None:
            self._learning_rate = lr
            if self.state is not None:
                for node in self._find_hyperparam_nodes(self.state.opt_state):
                    cur = node.hyperparams["learning_rate"]
                    node.hyperparams["learning_rate"] = jnp.asarray(
                        lr, dtype=jnp.asarray(cur).dtype)

    def _example_batch(self, batch_size=2):
        """Synth a minimal batch for parameter init (static shapes only)."""
        batch = {}
        for name, spec in self.feature_map.features.items():
            t = spec["type"]
            if t == "meta":
                batch[name] = np.zeros((batch_size,), np.int32)
            elif t == "sequence":
                batch[name] = np.zeros((batch_size, spec["max_len"]), np.int32)
            elif t == "numeric":
                batch[name] = np.zeros((batch_size,), np.float32)
            elif t == "embedding":
                batch[name] = np.zeros(
                    (batch_size, spec.get("pretrain_dim", 1)), np.float32)
            else:
                batch[name] = np.zeros((batch_size,), np.int32)
        for label in self.feature_map.labels:
            batch[label] = np.zeros((batch_size,), np.float32)
        batch[SAMPLE_MASK_KEY] = np.ones((batch_size,), np.float32)
        if getattr(self, "_longctr", False):
            # LongCTR batch layout (data/longctr_loader.py): item-source
            # features live in a flat [B*(max_len+1)] side-table dict
            L = int(getattr(self, "_max_len", 50))
            items = {}
            for name, spec in self.feature_map.features.items():
                if spec.get("source") == "item" and name in batch:
                    items[name] = np.zeros((batch_size * (L + 1),) +
                                           batch[name].shape[1:],
                                           batch[name].dtype)
                    del batch[name]
            from fuxictr_tpu.data.longctr_loader import (ITEMS_KEY,
                                                         SEQ_MASK_KEY)
            batch[ITEMS_KEY] = items
            batch[SEQ_MASK_KEY] = np.ones((batch_size, L), np.float32)
        return batch

    def _variable_shardings(self, init_p, rngs, example):
        """Sharding tree for the whole variables dict, computed abstractly.

        Table leaves (param_sharding: ``table_*``/``pretrain_*`` rows over
        'model', expert stacks over 'model') get their mesh placement; every
        other leaf — including non-'params' collections such as batch
        stats — is replicated. The leading collection-name path component
        is harmless to param_sharding (it matches on leaf names anywhere
        in the path)."""
        shapes = jax.eval_shape(init_p, rngs, example)
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: param_sharding(self.mesh, path, leaf), shapes)

    def init_params(self):
        if self.state is not None:
            return
        self._rng, init_rng = jax.random.split(self._rng)
        example = self._example_batch()
        rngs = {"params": init_rng, "dropout": init_rng}
        init_p = partial(self.net.init, train=False)
        self._born_sharded = False
        try:
            # one fused init program instead of op-by-op eager dispatch
            # (minutes of per-op round trips on a remote backend) — and it
            # lands in the persistent compile cache like any other program.
            #
            # Born-sharded init (new architecture; the reference is
            # single-device only, torch_utils.py:42-56): when a mesh is
            # attached BEFORE init, out_shardings pins every table leaf to
            # its row-sharded placement, so XLA materializes each shard
            # directly on its own device — no device ever holds a full
            # table, and the max trainable vocab scales with AGGREGATE
            # slice HBM instead of one chip's.
            if self.mesh is not None:
                init_fn = timed_first_dispatch(
                    jax.jit(init_p, out_shardings=self._variable_shardings(
                        init_p, rngs, example)), "init")
                variables = init_fn(rngs, example)
                self._born_sharded = self.mesh
            else:
                init_fn = timed_first_dispatch(jax.jit(init_p), "init")
                variables = init_fn(rngs, example)
        except Exception:
            variables = self.net.init(
                {"params": init_rng, "dropout": init_rng},
                example, train=False)
            self._born_sharded = False
        params = variables["params"]
        # "touched_rows" is a per-step trace (lazy adam), not model state
        model_state = {k: v for k, v in variables.items()
                       if k not in ("params", "touched_rows")}
        self._build_state(params, model_state)
        self.count_parameters()

    def _ensure_optimizer(self, max_gradient_norm=10.0):
        """(Re)build the optax transform. The opt-state *structure* depends
        only on optimizer name + accumulation steps (clip_by_global_norm is
        stateless), so rebuilding the transform never invalidates an
        existing/restored ``opt_state``."""
        self._accumulation_steps = int(
            self.kwargs.get("accumulation_steps", 1) or 1)
        if self._lazy_adam and (self._emb_reg or self._net_reg):
            raise ValueError(
                "lazy_adam skips untouched table rows, but regularizers "
                "produce dense gradients on every row — disable one.")
        self._tx = make_optimizer(self._optimizer_name, self._learning_rate,
                                  max_gradient_norm,
                                  self._accumulation_steps,
                                  lazy_adam=self._lazy_adam)
        self._max_gradient_norm = max_gradient_norm

    def _init_opt_state(self, params):
        base = self._tx.init(params)
        if not self._lazy_adam:
            return base
        flat = flax.traverse_util.flatten_dict(params)
        lazy = {}
        for path, leaf in flat.items():
            if _is_lazy_table_path(path):
                lazy[path + ("mu",)] = jnp.zeros_like(leaf)
                lazy[path + ("nu",)] = jnp.zeros_like(leaf)
                lazy[path + ("count",)] = jnp.zeros((), jnp.int32)
        return {"base": base,
                "lazy": flax.traverse_util.unflatten_dict(lazy)}

    def _sharded_opt_init(self, params):
        """Opt-state init with out_shardings pinned from the param tree:
        adam moments mirror params (their tree paths contain the param
        names, so the same param_sharding rule applies), and jit alone
        does not propagate input shardings to init outputs."""
        opt_shapes = jax.eval_shape(self._init_opt_state, params)
        opt_shardings = jax.tree_util.tree_map_with_path(
            lambda p, l: param_sharding(self.mesh, p, l), opt_shapes)
        return jax.jit(self._init_opt_state,
                       out_shardings=opt_shardings)(params)

    def _build_state(self, params, model_state,
                     max_gradient_norm=10.0):
        self._ensure_optimizer(max_gradient_norm)
        self._resume_step = 0
        if getattr(self, "_born_sharded", False):
            # moments born sharded too — a replicated eager init here would
            # transiently hold 2x full-table bytes on one device, defeating
            # the born-sharded init
            opt_state = self._sharded_opt_init(params)
            step = jax.device_put(jnp.zeros((), jnp.int32),
                                  replicated(self.mesh))
        else:
            opt_state = self._init_opt_state(params)
            step = jnp.zeros((), jnp.int32)
        self.state = TrainState(
            step=step, params=params,
            model_state=model_state, opt_state=opt_state)

    def distribute(self, mesh):
        """Place the train state on a (data, model) mesh: embedding tables
        row-sharded over 'model', dense params replicated, and the
        optimizer moments matching the param shardings.

        Called BEFORE any init (the run_expid flow), params are **born
        sharded**: init runs as one jitted program with out_shardings, each
        table shard materializes on its own device, and this method is a
        no-op re-pin — no device ever holds a full table (see
        :meth:`init_params`). Called on an existing single-device state
        (e.g. after a pickle restore), it falls back to resharding the
        materialized tree — which requires the full tree to fit one device.

        New TPU architecture — the reference is single-device only
        (SURVEY.md §2.6). Batches are sharded over 'data' in the train loop.
        """
        self.mesh = mesh
        if self.state is None:
            self.init_params()
        if getattr(self, "_born_sharded", None) is not mesh:
            params = shard_params(mesh, self.state.params)
            model_state = jax.device_put(self.state.model_state,
                                         replicated(mesh))
            if getattr(self, "_tx", None) is None:
                self._ensure_optimizer()
            opt_state = self._sharded_opt_init(params)
            self.state = TrainState(
                step=jax.device_put(self.state.step, replicated(mesh)),
                params=params, model_state=model_state, opt_state=opt_state)
        self._jit_train_step = None
        self._jit_predict_step = None
        self._jit_multi_step = None
        self._jit_cached_epoch = None
        self._jit_cached_predict = None
        self._jit_cached_eval = None
        self._jit_metric_components = None

    def _place_batch(self, batch):
        return shard_batch(self.mesh, batch) if self.mesh is not None else batch

    # ------------------------------------------------------------- lossref
    def get_labels(self, batch):
        return batch[self.feature_map.labels[0]].reshape(-1, 1)

    def _embedding_prefixes(self):
        """Module paths of FeatureEmbedding instances in the net — the
        type-scoped equivalent of the reference's
        ``isinstance(module, FeatureEmbeddingDict)`` check. Cached; falls
        back to None (name heuristic) if abstract tracing fails."""
        if not hasattr(self, "_emb_prefix_cache"):
            try:
                from fuxictr_tpu.ops.embedding import FeatureEmbedding
                mods = self.net.module_paths(
                    jax.random.PRNGKey(0), self._example_batch(),
                    train=False)
                self._emb_prefix_cache = tuple(
                    tuple(p.split("/")) for p, m in mods.items()
                    if p and isinstance(m, FeatureEmbedding))
            except Exception as exc:
                if list(self._emb_reg) != list(self._net_reg):
                    # the split CHANGES the loss here; a silent name-prefix
                    # guess could regularize embeddings as net params (the
                    # reference draws this split by module type,
                    # rank_model.py:106-112) — refuse instead
                    raise RuntimeError(
                        "could not trace the net's module paths to locate "
                        "FeatureEmbedding params, and embedding_regularizer "
                        "differs from net_regularizer — the reg split "
                        "cannot be applied reliably. Make the net abstractly "
                        "traceable (module_paths must work on the example "
                        f"batch). Tracing error: {exc!r}") from exc
                self._emb_prefix_cache = None
        return self._emb_prefix_cache

    def regularization_loss(self, params):
        if not self._emb_reg and not self._net_reg:
            return 0.0
        prefixes = self._embedding_prefixes()
        reg = 0.0
        flat = flax.traverse_util.flatten_dict(params)
        for path, leaf in flat.items():
            pairs = (self._emb_reg if _is_embedding_path(path, prefixes)
                     else self._net_reg)
            for p, lam in pairs:
                reg = reg + (lam / p) * jnp.sum(jnp.abs(leaf) ** p)
        return reg

    def add_loss(self, outputs, y_true, weights):
        loss_fn = make_loss_fn(self._loss_name)
        per_example = loss_fn(outputs["y_pred"], y_true)
        w = weights.reshape(-1, 1)
        loss = jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1.0)
        if "aux_loss" in outputs:
            loss = loss + outputs["aux_loss"]
        return loss

    # --------------------------------------------------------------- steps
    def _make_train_step(self):
        return timed_first_dispatch(
            partial(jax.jit, donate_argnums=(0,))(self._train_step_body()),
            "train_step")

    def _make_multi_step(self):
        """One jitted call that scans ``steps_per_call`` train steps over a
        stacked batch pytree [K, B, ...] — a single XLA program per K
        steps, so host dispatch overhead amortizes (TPU-native; no
        reference equivalent)."""
        train_step_inner = self._train_step_body()

        @partial(jax.jit, donate_argnums=(0,))
        def multi_step(state, batches, rng):
            # device-cache blocks ride OUTSIDE the scan (no leading K dim,
            # and they must not be stacked/copied per step)
            cache = {k: v for k, v in batches.items()
                     if k.startswith("__cache")}
            xs = {k: v for k, v in batches.items()
                  if not k.startswith("__cache")}

            def body(s, inp):
                batch, r = inp
                if cache:
                    batch = dict(batch, **cache)
                s, loss = train_step_inner(s, batch, r)
                return s, loss

            k = jax.tree_util.tree_leaves(xs)[0].shape[0]
            rngs = jax.random.split(rng, k)
            state, losses = jax.lax.scan(body, state, (xs, rngs))
            return state, jnp.mean(losses)

        return timed_first_dispatch(multi_step, "multi_step")

    def _make_cached_epoch_step(self, batch_size):
        """Jitted runner for ``chunk`` consecutive train steps whose batches
        are sliced ON DEVICE from a resident row-order array (device-cache
        loaders). Per-call host->device traffic: one scalar offset + one rng
        key — nothing batch-sized crosses the wire, which matters on
        backends where each transferred array pays fixed latency (see
        data/device_cache.py)."""
        body = self._train_step_body()
        B = int(batch_size)
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data_spec = NamedSharding(mesh, P("data"))

        @partial(jax.jit, donate_argnums=(0,), static_argnums=(5,))
        def run(state, cache, order, start, rng, chunk):
            rngs = jax.random.split(rng, chunk)

            def scan_body(s, inp):
                j, r = inp
                idx = jax.lax.dynamic_slice(order, (start + j * B,), (B,))
                if mesh is not None:
                    # GSPMD: shard the index window over the data axis so
                    # the gathered batch (and everything downstream) runs
                    # data-parallel against the replicated cache blocks
                    idx = jax.lax.with_sharding_constraint(idx, data_spec)
                mask = (idx >= 0).astype(jnp.float32)
                batch = dict(cache)
                batch[ROWS_KEY] = idx
                batch[SAMPLE_MASK_KEY] = mask
                s, loss = body(s, batch, r)
                return s, (loss, mask.sum())

            state, (losses, counts) = jax.lax.scan(
                scan_body, state, (jnp.arange(chunk), rngs))
            return state, jnp.mean(losses), jnp.sum(counts)

        return timed_first_dispatch(run, "cached_epoch")

    def _train_epoch_device(self, loader, k):
        """Epoch driver for device-cache loaders (single-device path): the
        row order is staged once, then each dispatch runs ``k`` steps fully
        on device."""
        if self._jit_cached_epoch is None:
            self._jit_cached_epoch = self._make_cached_epoch_step(
                loader.batch_size)
        B = loader.batch_size
        pending_losses = []
        pending_counts = []
        window = {"t0": time.perf_counter()}
        trace_calls = int(os.environ.get("FUXICTR_CALL_TRACE", 0) or 0)
        call_no = 0
        batches_done = 0
        for cache, order_dev, num_batches, _base in loader.epoch_chunks():
            done = 0
            skip = int(getattr(self, "_resume_skip_batches", 0) or 0)
            if skip:        # resume alignment: already-trained batches
                done = min(skip, num_batches)
                self._resume_skip_batches = skip - done
            while done < num_batches and not self._stop_training:
                to_boundary = self._eval_steps - (
                    self._total_steps % self._eval_steps)
                chunk = int(min(k, num_batches - done, to_boundary))
                self._rng, call_rng = jax.random.split(self._rng)
                t_call = (time.perf_counter() if call_no < trace_calls
                          else None)
                self.state, loss, count = self._jit_cached_epoch(
                    self.state, cache, order_dev,
                    jnp.asarray(done * B, jnp.int32), call_rng, chunk)
                if t_call is not None:
                    # loss fetch = true barrier on the remote backend
                    logging.info("call %d (chunk=%d): %.3fs loss=%.5f",
                                 call_no, chunk,
                                 time.perf_counter() - t_call,
                                 float(np.asarray(loss)))
                call_no += 1
                pending_losses.append((loss, chunk))
                pending_counts.append(count)
                self._total_steps += chunk
                done += chunk
                self._batch_index = batches_done + done - 1
                if self._total_steps % self._eval_steps == 0:
                    vals = jax.device_get([l for l, _ in pending_losses])
                    train_loss = float(np.average(
                        vals, weights=[c for _, c in pending_losses]))
                    examples = float(np.sum(jax.device_get(pending_counts)))
                    pending_losses = []
                    pending_counts = []
                    dt = max(time.perf_counter() - window["t0"], 1e-9)
                    self._window_rates.append(examples / dt)
                    logging.info("Train loss: %.6f (%.0f examples/s)",
                                 train_loss, examples / dt)
                    self.eval_step()
                    window["t0"] = time.perf_counter()
            batches_done += num_batches
            if self._stop_training:
                break

    def _train_step_body(self):
        """Un-jitted single train step (shared by train_step/multi_step)."""
        net = self.net
        tx = self._tx
        compute_dtype = self._compute_dtype
        lazy = self._lazy_adam

        def train_step(state, batch, rng):
            # device-cache batches carry only row indices; expand to the
            # standard feature dict by an on-device packed-row gather
            batch = self._expand_batch(batch)
            y_true = self.get_labels(batch)
            weights = batch[SAMPLE_MASK_KEY]

            def loss_fn(params):
                apply_params = params
                if compute_dtype is not None:
                    # mixed precision: bf16 compute, f32 master params/grads
                    # (v5e MXU is bf16-native; f32 matmul is emulated).
                    # Float leaves only: integer leaves (int8 quantized
                    # tables) must reach the gather untouched.
                    apply_params = jax.tree_util.tree_map(
                        lambda x: (x.astype(compute_dtype)
                                   if jnp.issubdtype(x.dtype, jnp.floating)
                                   else x), params)
                mutable = list(state.model_state.keys()) or ["batch_stats"]
                if lazy:
                    mutable = mutable + ["touched_rows"]

                def fwd(apply_params, model_state, batch, rng):
                    return net.apply(
                        {"params": apply_params, **model_state}, batch,
                        train=True, rngs={"dropout": rng}, mutable=mutable)

                if self.kwargs.get("remat"):
                    # rematerialize the forward in the backward pass: the
                    # quadratic field-interaction models ([B,F,F] attention
                    # maps, [pairs,D,B] bilinear products) keep O(B·F²)
                    # activations alive for the backward, which is what
                    # OOMs them at large batch — trade the FLOPs to
                    # recompute instead (jax.checkpoint; TPU MXU FLOPs are
                    # cheaper than HBM here, see BENCHMARKS roofline)
                    fwd = jax.checkpoint(fwd)
                outputs, new_ms = fwd(apply_params, state.model_state,
                                      batch, rng)
                if compute_dtype is not None:
                    outputs = {k: (v.astype(jnp.float32)
                                   if hasattr(v, "astype") else v)
                               for k, v in outputs.items()}
                loss = self.add_loss(outputs, y_true, weights)
                loss = loss + self.regularization_loss(params)
                return loss, new_ms

            (loss, new_ms), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if not lazy:
                updates, new_opt = tx.update(grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
            else:
                new_params, new_opt, new_ms = self._lazy_update(
                    state, grads, new_ms)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                model_state=new_ms if new_ms else state.model_state,
                opt_state=new_opt)
            return new_state, loss

        return train_step

    def _lazy_update(self, state, grads, new_ms):
        """Dense update for everything except fused tables; row-sparse adam
        on the table rows the embedding layer actually gathered (recorded
        in the ``touched_rows`` collection). On TPU this skips the dense
        [V, D] moment read+write per step — worthwhile exactly when the
        touched-row count is small, i.e. the LongCTR dedup path."""
        new_ms = dict(new_ms)
        touched = new_ms.pop("touched_rows", {})
        updates, new_base = self._tx.update(grads, state.opt_state["base"],
                                            state.params)
        flat_upd = flax.traverse_util.flatten_dict(updates)
        flat_touched = {
            p: v for p, v in flax.traverse_util.flatten_dict(touched).items()
            if _is_lazy_table_path(p)}
        # masked() passed table grads through unchanged — capture and zero
        clipped = {}
        for path in flat_touched:
            clipped[path] = flat_upd[path]
            flat_upd[path] = jnp.zeros_like(flat_upd[path])
        new_params = optax.apply_updates(
            state.params, flax.traverse_util.unflatten_dict(flat_upd))
        lr_nodes = self._find_hyperparam_nodes(new_base)
        lr = lr_nodes[0].hyperparams["learning_rate"]
        flat_params = flax.traverse_util.flatten_dict(new_params)
        flat_lazy = flax.traverse_util.flatten_dict(
            state.opt_state["lazy"])
        for path, sown in flat_touched.items():
            rows = jnp.concatenate(
                [jnp.reshape(a, (-1,)) for a in sown])
            table, mu, nu, count = (
                flat_params[path], flat_lazy[path + ("mu",)],
                flat_lazy[path + ("nu",)], flat_lazy[path + ("count",)])
            table, mu, nu, count = lazy_adam_row_update(
                table, mu, nu, count, clipped[path], rows, lr)
            flat_params[path] = table
            flat_lazy[path + ("mu",)] = mu
            flat_lazy[path + ("nu",)] = nu
            flat_lazy[path + ("count",)] = count
        new_opt = {"base": new_base,
                   "lazy": flax.traverse_util.unflatten_dict(flat_lazy)}
        return (flax.traverse_util.unflatten_dict(flat_params), new_opt,
                new_ms)

    def _predict_body(self):
        net = self.net
        act = (jax.nn.sigmoid if self.task == "binary_classification"
               else (lambda x: x))
        compute_dtype = self._compute_dtype

        def predict_step(state, batch):
            batch = self._expand_batch(batch)
            params = state.params
            if compute_dtype is not None:
                params = jax.tree_util.tree_map(
                    lambda x: (x.astype(compute_dtype)
                               if jnp.issubdtype(x.dtype, jnp.floating)
                               else x), params)
            outputs = net.apply({"params": params, **state.model_state},
                                batch, train=False)
            return act(outputs["y_pred"].astype(jnp.float32))

        return predict_step

    def _make_predict_step(self):
        return jax.jit(self._predict_body())

    def _make_cached_predict(self, batch_size):
        """Scan ``chunk`` forward batches sliced on device from a resident
        row order — one dispatch + one [chunk*B] fetch instead of per-batch
        round trips (device-cache evaluation path)."""
        body = self._predict_body()
        B = int(batch_size)

        @partial(jax.jit, static_argnums=(4,))
        def run(state, cache, n_valid, start, chunk):
            def scan_body(_, j):
                idx = start + j * B + jnp.arange(B, dtype=jnp.int32)
                mask = (idx < n_valid).astype(jnp.float32)
                batch = dict(cache)
                batch[ROWS_KEY] = jnp.where(idx < n_valid, idx, 0)
                batch[SAMPLE_MASK_KEY] = mask
                return None, body(state, batch)

            _, ys = jax.lax.scan(scan_body, None, jnp.arange(chunk))
            return ys

        return run

    def _cache_eval_slots(self, loader):
        """(label_col, group_col_or_None) in the loader's PACKED blocks.

        Loaders with custom block layouts (LongCTR) provide ``eval_slots``;
        the default derives them from the canonical cache_layout. The
        group slot must point into the INT block — a wrong or float-block
        column would silently corrupt grouped metrics, so None disables
        the grouped device path (evaluate() gates on it)."""
        slots_fn = getattr(loader, "eval_slots", None)
        if slots_fn is not None:
            return slots_fn(self.feature_map)
        from fuxictr_tpu.data.device_cache import cache_layout
        layout, _, _ = cache_layout(self.feature_map)
        _, lab_lo, _, _ = layout[self.feature_map.labels[0]]
        gid = getattr(self.feature_map, "group_id", None)
        g_lo = (layout[gid][1]
                if gid in layout and layout[gid][0] == "int" else None)
        return lab_lo, g_lo

    def _make_cached_eval(self, batch_size, lab_cols, g_lo):
        """Like :meth:`_make_cached_predict` but also returns each row's
        labels (float-block columns ``lab_cols`` — one per task; rank
        models pass a single-element tuple), group id (int block col
        ``g_lo``, when the FeatureMap declares one) and validity mask —
        the building blocks of fully on-device evaluation incl. gAUC.
        Predictions come back ``[N, T]`` (the predict body's trailing
        task axis; T=1 for rank models)."""
        from fuxictr_tpu.data.device_cache import (CACHE_FLOAT_KEY,
                                                   CACHE_INT_KEY)
        body = self._predict_body()
        B = int(batch_size)
        lab_cols = jnp.asarray(list(lab_cols), jnp.int32)

        @partial(jax.jit, static_argnums=(5,))
        def run(state, cache, host_valid, per, start, chunk):
            # validity generalized to per-host-padded global layouts
            # (multi-host mesh cache): row idx is valid iff its in-host
            # offset (idx % per) is below that host's valid count.
            # Single-host callers pass per >= all idx and host_valid=[nv],
            # which reduces to the plain prefix test.
            def scan_body(_, j):
                idx = start + j * B + jnp.arange(B, dtype=jnp.int32)
                h = jnp.clip(idx // per, 0, host_valid.shape[0] - 1)
                # the global bound matters: batch tail-padding rows beyond
                # per*H would otherwise CLIP into the last host's range and
                # pass its in-host test, silently double-counting the final
                # row in every metric
                valid = ((idx < per * host_valid.shape[0])
                         & ((idx % per) < jnp.take(host_valid, h)))
                safe = jnp.where(valid, idx, 0)
                batch = dict(cache)
                batch[ROWS_KEY] = safe
                batch[SAMPLE_MASK_KEY] = valid.astype(jnp.float32)
                y = body(state, batch).reshape(B, -1)         # [B, T]
                lab = cache[CACHE_FLOAT_KEY][safe][:, lab_cols]
                grp = (cache[CACHE_INT_KEY][safe, g_lo].astype(jnp.int32)
                       if g_lo is not None
                       else jnp.zeros((B,), jnp.int32))
                return None, (y, lab, grp, valid)

            _, (ys, labs, grps, valids) = jax.lax.scan(scan_body, None,
                                                       jnp.arange(chunk))
            T = ys.shape[-1]
            return (ys.reshape(-1, T), labs.reshape(-1, T),
                    grps.reshape(-1), valids.reshape(-1))

        return run

    def _cached_eval_arrays(self, loader, lab_cols, g_lo, chunk_size=32):
        """Shared chunk loop over ``loader.eval_chunks()``: returns the
        accumulated ([N, T] predictions, [N, T] labels, [N] groups,
        [N] validity) device arrays for metric-component programs —
        single- and multi-host, single- and multi-task."""
        if not isinstance(self._jit_cached_eval, dict):
            self._jit_cached_eval = {}
        B = loader.batch_size
        key = (B, tuple(lab_cols), g_lo)
        if key not in self._jit_cached_eval:
            self._jit_cached_eval[key] = timed_first_dispatch(
                self._make_cached_eval(B, lab_cols, g_lo), "cached_eval")
        eval_fn = self._jit_cached_eval[key]
        multihost = getattr(loader, "_multihost", False)
        ys, labs, grps, valids = [], [], [], []
        for cache, num_batches, n_valid, _base in loader.eval_chunks():
            if multihost:
                host_valid = jnp.asarray(loader._host_valid, jnp.int32)
                per = jnp.asarray(loader._per_host_rows, jnp.int32)
            else:
                host_valid = jnp.asarray([n_valid], jnp.int32)
                per = jnp.asarray(num_batches * B, jnp.int32)
            done = 0
            while done < num_batches:
                chunk = int(min(chunk_size, num_batches - done))
                y, lab, grp, valid = eval_fn(
                    self.state, cache, host_valid, per,
                    jnp.asarray(done * B, jnp.int32), chunk)
                ys.append(y)
                labs.append(lab)
                grps.append(grp)
                valids.append(valid)
                done += chunk
        return (jnp.concatenate(ys), jnp.concatenate(labs),
                jnp.concatenate(grps), jnp.concatenate(valids))

    def _device_eval(self, loader, metrics, chunk_size=32):
        """Evaluate a device-cached split WITHOUT downloading predictions:
        the forward passes, the exact tie-averaged AUC rank statistics,
        the logloss sum, and (when a group_id is declared) the exact
        grouped gAUC/avgAUC all run on the accelerator; only a few scalars
        cross the wire (metrics.py:device_metric_components /
        device_grouped_components — sklearn-exact, SURVEY §7.1).

        Raises OverflowError when a group exceeds the int32-exact bound;
        evaluate() falls back to the host pass."""
        from fuxictr_tpu.metrics import (device_grouped_components,
                                         device_metric_components,
                                         finish_device_grouped,
                                         finish_device_metrics)
        lab_lo, g_lo = self._cache_eval_slots(loader)
        if self._jit_metric_components is None:
            self._jit_metric_components = jax.jit(device_metric_components)
        y, lab, g, valid = self._cached_eval_arrays(
            loader, (lab_lo,), g_lo, chunk_size)
        y, lab = y[:, 0], lab[:, 0]
        out = {}
        scalar = [m for m in metrics
                  if m in ("AUC", "logloss", "binary_crossentropy")]
        grouped = [m for m in metrics if m in ("gAUC", "avgAUC")]
        ranked = [m for m in metrics
                  if m == "MRR" or m.startswith("NDCG")]
        if scalar:
            comps = self._jit_metric_components(y, lab, valid)
            out.update(finish_device_metrics(jax.device_get(comps), scalar))
        if grouped:
            if getattr(self, "_jit_grouped_components", None) is None:
                self._jit_grouped_components = jax.jit(
                    device_grouped_components)
            gcomps = self._jit_grouped_components(y, lab, g, valid)
            out.update(finish_device_grouped(
                jax.device_get(gcomps), grouped))   # may raise Overflow
        if ranked:
            out.update(self._device_ranked(y, lab, g, valid, ranked))
        return {m: out[m] for m in metrics}

    def _device_ranked(self, y, lab, g, valid, ranked):
        """Grouped MRR/NDCG@k on device (metrics.py:
        device_ranked_components); jit cached per static cutoff tuple."""
        from fuxictr_tpu.metrics import (device_ranked_components,
                                         finish_device_ranked,
                                         _parse_ndcg_k)
        ks = tuple(_parse_ndcg_k(m) for m in ranked if m != "MRR")
        cache = getattr(self, "_jit_ranked_components", None)
        if cache is None:
            cache = self._jit_ranked_components = {}
        if ks not in cache:
            cache[ks] = jax.jit(
                partial(device_ranked_components, ks=ks))
        comps = cache[ks](y, lab, g, valid)
        return finish_device_ranked(jax.device_get(comps), ranked)

    def _cached_predictions(self, loader, chunk_size=32):
        """All predictions for a device-cache loader in natural row order
        (valid rows only), fetched chunk-wise. Row indices are derived
        on-device from a scalar offset — no index arrays cross the wire.
        Chunked (HBM-limited) loaders rotate super-chunks through the
        device with staging overlapped."""
        if not isinstance(self._jit_cached_predict, dict):
            self._jit_cached_predict = {}
        B = loader.batch_size
        if B not in self._jit_cached_predict:
            self._jit_cached_predict[B] = timed_first_dispatch(
                self._make_cached_predict(B), "cached_predict")
        predict_fn = self._jit_cached_predict[B]
        rows_parts = []
        parts = []
        for cache, num_batches, n_valid, base_row in loader.eval_chunks():
            chunk_parts = []
            done = 0
            while done < num_batches:
                chunk = int(min(chunk_size, num_batches - done))
                ys = predict_fn(
                    self.state, cache, jnp.asarray(n_valid, jnp.int32),
                    jnp.asarray(done * B, jnp.int32), chunk)
                chunk_parts.append(np.asarray(ys).reshape(chunk * B, -1))
                done += chunk
            parts.append(np.concatenate(chunk_parts)[:n_valid])
            rows_parts.append(base_row + np.arange(n_valid))
        return np.concatenate(parts), np.concatenate(rows_parts)

    # ----------------------------------------------------------------- fit
    def fit(self, data_generator, epochs=1, validation_data=None,
            max_gradient_norm=10.0, **kwargs):
        # examples/s of each train window (between evals) — window [-1] of a
        # multi-epoch run is the compile-free steady state drivers report
        self._window_rates = []
        self._evals_done = 0
        if getattr(self.feature_map, "table_dtype", None) not in (
                None, "float32", "fp32") or self.kwargs.get("table_dtype") \
                not in (None, "float32", "fp32"):
            raise NotImplementedError(
                "quantized tables (table_dtype) are serving-only: train in "
                "float32, then serve with Predictor(quantize='int8')")
        self.valid_gen = validation_data
        self._install_cache_expander(data_generator)
        if self.state is None:
            self.init_params()
        # never reset opt_state/step here: a restored checkpoint must resume
        # (rank_model.py:272-298 reference behavior is weights-only; this
        # framework checkpoints full state, so fit() must honor it). Only
        # the stateless transform is rebuilt when the clip norm changes.
        if getattr(self, "_tx", None) is None or \
                max_gradient_norm != getattr(self, "_max_gradient_norm", None):
            self._ensure_optimizer(max_gradient_norm)
        self._jit_train_step = self._make_train_step()
        self._jit_multi_step = None
        self._jit_cached_epoch = None
        self._best_metric = (np.inf if self._monitor_mode == "min"
                             else -np.inf)
        self._stopping_steps = 0
        self._stop_training = False
        self._steps_per_epoch = len(data_generator)
        # resume flow (load_checkpoint(latest_checkpoint(...)) then fit())
        # must continue periodic-ckpt numbering from the restored optimizer
        # step — restarting at step_1 would make rotation keep deleting the
        # fresh checkpoints while latest_checkpoint() returns the stale
        # pre-crash state. The step is mirrored host-side (_resume_step,
        # set by load_checkpoint): a device_get here would be a premature
        # barrier that serializes fit() behind all in-flight staging
        # transfers (minutes on a remote tunnel).
        self._total_steps = int(getattr(self, "_resume_step", 0) or 0)
        self._batch_index = 0
        self._epoch_index = 0
        # opt-in mid-epoch data alignment (resume_align_data: true): after
        # a checkpoint restore, fast-forward the loader's epoch counter to
        # the crashed epoch and skip its already-trained batches, so the
        # resumed run consumes the EXACT remaining data stream (epoch
        # permutations are deterministic in (seed, epoch)). Only applies
        # right after load_checkpoint (the _just_restored flag) — a plain
        # consecutive fit() must keep running fresh epochs. Requires the
        # same loader/batch geometry as the crashed run.
        self._resume_skip_batches = 0
        if (self.kwargs.get("resume_align_data")
                and getattr(self, "_just_restored", False)
                and self._total_steps and self._steps_per_epoch):
            self._resume_skip_batches = (self._total_steps
                                         % self._steps_per_epoch)
            if hasattr(data_generator, "_epoch"):
                data_generator._epoch = (self._total_steps
                                         // self._steps_per_epoch)
            logging.info(
                "Resume alignment: epoch %d, skipping %d already-trained "
                "batches", self._total_steps // self._steps_per_epoch + 1,
                self._resume_skip_batches)
        self._just_restored = False
        # per-fit: a None eval_steps means "once per epoch" of THIS
        # generator; don't let a previous fit's epoch length stick
        self._eval_steps = (self._eval_steps_user
                            if getattr(self, "_eval_steps_user", None)
                            else self._steps_per_epoch)
        profile_dir = self.kwargs.get("profile_dir")
        if profile_dir:
            # XLA trace of the first training epoch (the reference has no
            # profiler at all — SURVEY §5); view with tensorboard/xprof
            try:
                jax.profiler.start_trace(profile_dir)
                self._profiling = True
                logging.info("JAX profiler tracing to %s", profile_dir)
            except Exception as exc:
                logging.warning("profiler unavailable: %s", exc)
                self._profiling = False
        else:
            self._profiling = False
        logging.info("Start training: %d batches/epoch", self._steps_per_epoch)
        logging.info("************ Epoch=1 start ************")
        for epoch in range(epochs):
            self._epoch_index = epoch
            self.train_epoch(data_generator)
            if self._profiling:
                try:
                    jax.profiler.stop_trace()
                finally:
                    self._profiling = False
            if self._stop_training:
                break
            logging.info("************ Epoch=%d end ************", epoch + 1)
        logging.info("Training finished.")
        self._resume_step = self._total_steps   # consecutive fits continue
        self._finish_periodic_checkpoint()
        if os.path.exists(self.checkpoint):
            logging.info("Load best model: %s", self.checkpoint)
            self.load_weights(self.checkpoint)

    def _prefetched(self, data_generator, size=2):
        """Double-buffered host→device transfer: device_put the next batches
        while the current step runs (single-device path; the mesh path
        places batches with explicit shardings instead)."""
        import collections
        import itertools
        it = iter(data_generator)
        queue = collections.deque()

        def enqueue(n):
            for b in itertools.islice(it, n):
                # count valid rows on host — reading it later would force a
                # device sync and break the transfer/compute overlap
                n_valid = int(np.sum(np.asarray(b[SAMPLE_MASK_KEY]) > 0))
                queue.append((jax.device_put(b), n_valid))

        enqueue(size)
        while queue:
            yield queue.popleft()
            enqueue(1)

    def train_epoch(self, data_generator):
        self._batch_index = 0
        k = int(self.kwargs.get("steps_per_call", 1) or 1)
        on_mesh = (self.mesh is not None
                   and getattr(data_generator, "mesh", None) is self.mesh)
        if (self.mesh is not None and not on_mesh
                and hasattr(data_generator, "cache_refs")):
            raise ValueError(
                "device-cache loader was staged without the model's mesh: "
                "its HBM blocks are committed to a single device, which "
                "cannot feed a mesh-sharded train step. Build the loader "
                "with mesh=model.mesh (run_expid passes params['mesh'] "
                "automatically when use_mesh/device_cache are set).")
        if (hasattr(data_generator, "epoch_chunks")
                and (self.mesh is None or on_mesh)
                and (k > 1 or on_mesh
                     or getattr(data_generator, "chunked", False))):
            # device-cache loader: run the epoch's batches fully on device
            # (single-device, or GSPMD over the mesh when the cache blocks
            # were replicated onto it)
            return self._train_epoch_device(data_generator, k)
        skip = int(getattr(self, "_resume_skip_batches", 0) or 0)
        if skip:            # resume alignment for host-iterated loaders
            import itertools
            self._resume_skip_batches = 0
            data_generator = itertools.islice(iter(data_generator), skip,
                                              None)
        if k > 1:
            return self._train_epoch_scanned(data_generator, k)
        if self.mesh is None:
            data_generator = self._prefetched(data_generator)
        else:
            data_generator = ((b, None) for b in data_generator)
        pending_losses = []
        window_start = time.perf_counter()
        window_examples = 0
        for batch_index, (batch, n_valid) in enumerate(data_generator):
            self._batch_index = batch_index
            self._total_steps += 1
            self._rng, step_rng = jax.random.split(self._rng)
            self.state, loss = self._jit_train_step(
                self.state, self._place_batch(batch), step_rng)
            pending_losses.append(loss)
            window_examples += n_valid if n_valid is not None else \
                int((np.asarray(batch[SAMPLE_MASK_KEY]) > 0).sum())
            if self._total_steps % self._eval_steps == 0:
                train_loss = float(np.mean(jax.device_get(pending_losses)))
                pending_losses = []
                dt = max(time.perf_counter() - window_start, 1e-9)
                self._window_rates.append(window_examples / dt)
                logging.info("Train loss: %.6f (%.0f examples/s)",
                             train_loss, window_examples / dt)
                self.eval_step()
                window_start = time.perf_counter()
                window_examples = 0
            if self._stop_training:
                break

    def _train_epoch_scanned(self, data_generator, k):
        """Run k train steps per device dispatch via lax.scan over stacked
        batches — amortizes host→device dispatch latency."""
        if self._jit_multi_step is None:
            self._jit_multi_step = self._make_multi_step()
        pending = []
        pending_losses = []
        window = {"t0": time.perf_counter(), "examples": 0}

        def flush():
            if not pending:
                return
            # device-cache blocks are per-epoch constants already resident
            # on device: np.stack would download+copy them K times
            cache = {ck: v for ck, v in pending[0].items()
                     if ck.startswith("__cache")}
            plain = [{bk: v for bk, v in b.items()
                      if not bk.startswith("__cache")} for b in pending]
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *plain)
            pending.clear()
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                def _put(x, spec):
                    return jax.device_put(np.asarray(x),
                                          NamedSharding(self.mesh, spec))

                stacked = {
                    k: jax.tree_util.tree_map(lambda x: _put(x, P()), v)
                    if k == "__items__"     # side tables: not batch-aligned
                    else jax.tree_util.tree_map(
                        lambda x: _put(x, P(None, "data",
                                            *(None,) * (np.ndim(x) - 2))), v)
                    for k, v in stacked.items()}
            if cache:
                stacked = dict(stacked, **cache)
            self._rng, step_rng = jax.random.split(self._rng)
            self.state, loss = self._jit_multi_step(
                self.state, stacked, step_rng)
            pending_losses.append(loss)

        def signature(b):
            return tuple(np.shape(x) for x in jax.tree_util.tree_leaves(b))

        pending_sig = None
        for batch_index, batch in enumerate(data_generator):
            self._batch_index = batch_index
            self._total_steps += 1
            # variable-shape loaders (e.g. LongCTR dedup buckets) can change
            # shape mid-epoch; stack only like-shaped neighbours
            sig = signature(batch)
            if pending and sig != pending_sig:
                flush()
            pending_sig = sig
            pending.append(batch)
            window["examples"] += int(
                np.sum(np.asarray(batch[SAMPLE_MASK_KEY]) > 0))
            if len(pending) == k:
                flush()
            boundary = self._total_steps % self._eval_steps == 0
            if boundary:
                flush()
                train_loss = float(np.mean(jax.device_get(pending_losses)))
                pending_losses = []
                dt = max(time.perf_counter() - window["t0"], 1e-9)
                self._window_rates.append(window["examples"] / dt)
                logging.info("Train loss: %.6f (%.0f examples/s)",
                             train_loss, window["examples"] / dt)
                self.eval_step()
                window["t0"] = time.perf_counter()
                window["examples"] = 0
            if self._stop_training:
                break
        flush()

    def eval_step(self):
        self._maybe_periodic_checkpoint()
        if self.valid_gen is None:
            # fit() without validation_data: nothing to monitor — no
            # eval, no early stop, no best-checkpoint tracking
            return
        logging.info("Evaluation @epoch %d - batch %d:",
                     self._epoch_index + 1, self._batch_index + 1)
        val_logs = self.evaluate(self.valid_gen,
                                 metrics=self._monitor.get_metrics())
        self.checkpoint_and_earlystop(val_logs)

    # ----------------------------------------------- periodic checkpoints
    # Fault tolerance for long runs (no reference equivalent — the
    # reference only writes best-model weights, rank_model.py:272-298):
    # ``periodic_ckpt: N`` saves the FULL train state every N eval
    # boundaries into <model_dir>/<model_id>_ckpt/step_<total_steps> via
    # orbax WITHOUT blocking the train loop (the save runs in orbax's
    # background thread; sharded arrays are written shard-by-shard on the
    # multi-chip path). ``periodic_ckpt_keep`` (default 2) newest steps
    # are retained. Resume: load_checkpoint(latest_checkpoint(dir),
    # use_orbax=True) then fit() — opt_state/step are honored.
    @property
    def periodic_ckpt_dir(self):
        return os.path.join(self.model_dir, f"{self.model_id}_ckpt")

    @staticmethod
    def _list_step_dirs(ckpt_dir):
        """Completed step_<N> checkpoint dirs, sorted by N ascending.

        Matches exactly ``step_<digits>`` — orbax async saves stage into
        ``step_<N>.orbax-checkpoint-tmp-<ts>`` siblings, and a crash mid-save
        (the very scenario periodic checkpoints exist for) leaves those
        behind; they must never be parsed as resumable steps."""
        import re
        if not os.path.isdir(ckpt_dir):
            return []
        steps = [d for d in os.listdir(ckpt_dir)
                 if re.fullmatch(r"step_(\d+)", d)]
        return sorted(steps, key=lambda d: int(d.split("_")[1]))

    @staticmethod
    def latest_checkpoint(ckpt_dir):
        """Newest step_<N> orbax checkpoint under a periodic-ckpt dir."""
        steps = RankModel._list_step_dirs(ckpt_dir)
        if not steps:
            return None
        return os.path.join(ckpt_dir, steps[-1])

    def _maybe_periodic_checkpoint(self):
        every = int(self.kwargs.get("periodic_ckpt", 0) or 0)
        if every <= 0:
            return
        self._evals_done = getattr(self, "_evals_done", 0) + 1
        if self._evals_done % every:
            return
        import orbax.checkpoint as ocp
        if getattr(self, "_periodic_ckptr", None) is None:
            self._periodic_ckptr = ocp.StandardCheckpointer()
        ckptr = self._periodic_ckptr
        # one in-flight save at a time: wait for the previous (normally
        # long finished — an eval interval passed), then prune old steps
        ckptr.wait_until_finished()
        keep = int(self.kwargs.get("periodic_ckpt_keep", 2) or 2)
        root = self.periodic_ckpt_dir
        if os.path.isdir(root):
            steps = self._list_step_dirs(root)
            for stale in steps[:max(len(steps) - (keep - 1), 0)]:
                shutil.rmtree(os.path.join(root, stale),
                              ignore_errors=True)
            # sweep crashed-save debris so it can't pile up forever
            for tmp in os.listdir(root):
                if ".orbax-checkpoint-tmp-" in tmp:
                    shutil.rmtree(os.path.join(root, tmp),
                                  ignore_errors=True)
        path = os.path.abspath(os.path.join(root,
                                            f"step_{self._total_steps}"))
        ckptr.save(path, self.state, force=True)   # async: returns at once
        logging.info("Periodic checkpoint (async): %s", path)

    def _finish_periodic_checkpoint(self):
        ckptr = getattr(self, "_periodic_ckptr", None)
        if ckptr is not None:
            ckptr.wait_until_finished()

    def checkpoint_and_earlystop(self, logs, min_delta=1e-6):
        monitor_value = self._monitor.get_value(logs)
        if (self._monitor_mode == "min"
                and monitor_value > self._best_metric - min_delta) or \
           (self._monitor_mode == "max"
                and monitor_value < self._best_metric + min_delta):
            self._stopping_steps += 1
            logging.info("Monitor(%s)=%.6f STOP!",
                         self._monitor_mode, monitor_value)
            if self._reduce_lr_on_plateau:
                lr = self.lr_decay()
                logging.info("Reduce learning rate on plateau: %.6f", lr)
        else:
            self._stopping_steps = 0
            self._best_metric = monitor_value
            if self._save_best_only:
                logging.info("Save best model: monitor(%s)=%.6f",
                             self._monitor_mode, monitor_value)
                self.save_weights(self.checkpoint)
        if self._stopping_steps >= self._early_stop_patience:
            self._stop_training = True
            logging.info("********* Epoch=%d early stop *********",
                         self._epoch_index + 1)
        if not self._save_best_only:
            self.save_weights(self.checkpoint)

    @staticmethod
    def _find_hyperparam_nodes(opt_state):
        """Walk an optax state tree for ``InjectHyperparamsState``-like nodes
        carrying a ``learning_rate`` — robust to how the chain is composed
        (wrappers like MultiSteps expose inner state under different
        attribute names)."""
        found = []

        def visit(node):
            hp = getattr(node, "hyperparams", None)
            if isinstance(hp, dict) and "learning_rate" in hp:
                found.append(node)
                return
            for attr in ("inner_opt_state", "inner_state"):
                if hasattr(node, attr):
                    visit(getattr(node, attr))
                    return
            if isinstance(node, dict):
                for child in node.values():
                    visit(child)
            elif isinstance(node, (tuple, list)):
                for child in node:
                    visit(child)

        visit(opt_state)
        return found

    def lr_decay(self, factor=0.1, min_lr=1e-6):
        """Scale the injected optimizer LR in-place (no retrace)."""
        nodes = self._find_hyperparam_nodes(self.state.opt_state)
        if not nodes:
            raise RuntimeError(
                "no injected learning_rate found in the optimizer state; "
                "was the optimizer built without inject_hyperparams?")
        new_lr = min_lr
        for node in nodes:
            cur = node.hyperparams["learning_rate"]
            new_lr = max(float(cur) * factor, min_lr)
            node.hyperparams["learning_rate"] = jnp.asarray(
                new_lr, dtype=jnp.asarray(cur).dtype)
        self.state = self.state.replace(opt_state=self.state.opt_state)
        return new_lr

    # ---------------------------------------------------------- eval/infer
    def _predictions(self, data_generator):
        self._install_cache_expander(data_generator)
        if self.state is None:
            self.init_params()
        from fuxictr_tpu.parallel.distributed import is_multiprocess
        if (not is_multiprocess()
                and hasattr(data_generator, "cache_refs")
                and (self.mesh is None
                     or getattr(data_generator, "mesh", None) is self.mesh)):
            y_pred, rows = self._cached_predictions(data_generator)
            mask = np.ones(len(rows), bool)
            group_id = (data_generator.host_group[rows]
                        if data_generator.host_group is not None else None)
            return y_pred, mask, group_id
        if self._jit_predict_step is None:
            self._jit_predict_step = timed_first_dispatch(
                self._make_predict_step(), "predict_step")
        preds, masks, groups = [], [], []
        for batch in data_generator:
            y = self._jit_predict_step(self.state, self._place_batch(batch))
            preds.append(np.asarray(y).reshape(len(batch[SAMPLE_MASK_KEY]), -1))
            masks.append(batch[SAMPLE_MASK_KEY] > 0)
            if self.feature_map.group_id is not None:
                from fuxictr_tpu.data.device_cache import GROUP_KEY
                groups.append(batch[GROUP_KEY] if ROWS_KEY in batch
                              else batch[self.feature_map.group_id])
        mask = np.concatenate(masks)
        y_pred = np.concatenate(preds)[mask]
        group_id = np.concatenate(groups)[mask] if groups else None
        return y_pred, mask, group_id

    def evaluate(self, data_generator, metrics=None):
        y_pred_parts, y_true_parts, masks, groups = [], [], [], []
        self._install_cache_expander(data_generator)
        if self._jit_predict_step is None:
            self._jit_predict_step = timed_first_dispatch(
                self._make_predict_step(), "predict_step")
        # multi-host: every process holds a local shard of each batch; the
        # prediction comes back as a global array, and host-side arrays
        # (mask/labels/groups) are gathered in the same data-axis order so
        # all processes compute identical metrics
        from fuxictr_tpu.parallel.distributed import (all_gather_host,
                                                      is_multiprocess)
        from fuxictr_tpu.metrics import DEVICE_METRIC_EXACT_ROWS
        want = list(metrics or self.validation_metrics)
        gid = self.feature_map.group_id
        device_metrics_on = (self.kwargs.get("device_metrics", True)
                             and self.task == "binary_classification"
                             and len(self.feature_map.labels) == 1
                             and all(_device_metric_supported(m, gid)
                                     for m in want))
        if (is_multiprocess() and hasattr(data_generator, "cache_refs")
                and getattr(data_generator, "_multihost", False)):
            # multi-host device cache (VERDICT r4 #4): predictions, labels
            # and groups are slices of 'data'-row-sharded global blocks —
            # no process can host-combine them, so evaluation MUST stay on
            # device (the metric components are replicated scalars,
            # identical on every process).
            if getattr(data_generator, "mesh", None) is not self.mesh:
                raise ValueError(
                    "multi-host device-cache eval needs the loader staged "
                    "on the model's mesh")
            if not device_metrics_on:
                raise NotImplementedError(
                    f"multi-host device-cache eval supports only the exact "
                    f"device metrics; got {want}")
            if (gid is not None
                    and any(_is_grouped_metric(m) for m in want)
                    and self._cache_eval_slots(data_generator)[1] is None):
                raise NotImplementedError(
                    "grouped metrics need the group_id at a named int-block "
                    "slot in this loader's packed layout")
            # fail-closed default: a loader without num_samples raises
            # rather than risking silent int32 overflow on device
            if (int(getattr(data_generator, "num_samples",
                            DEVICE_METRIC_EXACT_ROWS + 1))
                    > DEVICE_METRIC_EXACT_ROWS):
                raise NotImplementedError(
                    "dataset exceeds (or does not declare) the int32-exact "
                    "device-metric bound; use the streaming loader for "
                    "multi-host eval at this scale")
            val_logs = self._device_eval(data_generator, want)
            logging.info("[Metrics] " + " - ".join(
                f"{k}: {v:.6f}" for k, v in val_logs.items()))
            return val_logs
        if (not is_multiprocess()
                and hasattr(data_generator, "cache_refs")
                and (self.mesh is None
                     or getattr(data_generator, "mesh", None) is self.mesh)):
            # in-cache group ids must live in the INT block at a slot the
            # loader can actually name — a wrong column would silently
            # corrupt grouped metrics (loaders with custom layouts provide
            # eval_slots; _cache_eval_slots returns None to disable)
            cache_grouped_ok = True
            if gid is not None and any(_is_grouped_metric(m)
                                       for m in want):
                cache_grouped_ok = (
                    self._cache_eval_slots(data_generator)[1] is not None)
            if (device_metrics_on
                    and cache_grouped_ok
                    and (getattr(data_generator, "eval_slots", None)
                         is not None
                         or getattr(self, "_expander_src", None) is None)
                    and int(getattr(data_generator, "num_samples",
                                    DEVICE_METRIC_EXACT_ROWS + 1))
                    <= DEVICE_METRIC_EXACT_ROWS):
                # fail-closed default: a loader without num_samples takes
                # the host path rather than risking silent int32 overflow
                # fully on-device path: predictions never leave the chip
                # (metrics.py:device_metric_components /
                # device_grouped_components, sklearn-exact AUC + gAUC).
                # Mesh-staged caches take it too (round 5): the cached-eval
                # scan is a plain GSPMD program over the (replicated or
                # row-sharded) blocks — the multi-host branch above already
                # relies on exactly this.
                try:
                    val_logs = self._device_eval(data_generator, want)
                    logging.info("[Metrics] " + " - ".join(
                        f"{k}: {v:.6f}" for k, v in val_logs.items()))
                    return val_logs
                except OverflowError as exc:
                    # a group beyond the int32-exact device bound: host pass
                    logging.info("device gAUC fallback: %s", exc)
            # device-cache loader: scanned on-device batches, labels host-side
            y_pred, rows = self._cached_predictions(data_generator)
            y_true = data_generator.host_labels[rows, 0]
            group_id = (data_generator.host_group[rows]
                        if data_generator.host_group is not None else None)
            val_logs = evaluate_metrics(
                y_true.astype(np.float64),
                y_pred.reshape(-1).astype(np.float64),
                metrics or self.validation_metrics, group_id)
            logging.info("[Metrics] " + " - ".join(
                f"{k}: {v:.6f}" for k, v in val_logs.items()))
            return val_logs
        if (device_metrics_on
                and self.mesh is not None
                and not hasattr(data_generator, "cache_refs")):
            # mesh / multi-host: keep predictions+labels as data-sharded
            # GLOBAL device arrays and compute metric components in one
            # jitted program over them (XLA partitions the sort and inserts
            # the collectives) — O(batch) host memory per process, replacing
            # the all_gather_host O(dataset)-per-host eval (VERDICT r3 #4).
            # Past the int32-exact bounds it host-combines from the SAME
            # accumulated arrays (no second sweep), so it always returns.
            val_logs = self._device_eval_streaming(data_generator, want)
            logging.info("[Metrics] " + " - ".join(
                f"{k}: {v:.6f}" for k, v in val_logs.items()))
            return val_logs
        gather = all_gather_host if is_multiprocess() else np.asarray
        from fuxictr_tpu.data.device_cache import GROUP_KEY, LABELS_KEY
        for batch in data_generator:
            y = self._jit_predict_step(self.state, self._place_batch(batch))
            y = gather(y)
            m = gather(batch[SAMPLE_MASK_KEY]) > 0
            y_pred_parts.append(np.asarray(y).reshape(len(m), -1)[m])
            if ROWS_KEY in batch:   # device-cache batch: labels ride host-side
                y_true = batch[LABELS_KEY][:, :1]
            else:
                y_true = self.get_labels(batch)
            y_true_parts.append(gather(y_true).reshape(len(m), -1)[m])
            if self.feature_map.group_id is not None:
                g = (batch[GROUP_KEY] if ROWS_KEY in batch
                     else batch[self.feature_map.group_id])
                groups.append(gather(g)[m])
        y_pred = np.concatenate(y_pred_parts).reshape(-1).astype(np.float64)
        y_true = np.concatenate(y_true_parts).reshape(-1).astype(np.float64)
        group_id = np.concatenate(groups) if groups else None
        val_logs = evaluate_metrics(
            y_true, y_pred, metrics or self.validation_metrics, group_id)
        logging.info("[Metrics] " + " - ".join(
            f"{k}: {v:.6f}" for k, v in val_logs.items()))
        return val_logs

    def _device_eval_streaming(self, data_generator, want):
        """Mesh-path evaluation with O(batch) host memory: per-batch
        predictions/labels/masks/groups stay as data-sharded global device
        arrays; exact AUC/logloss/gAUC components run as jitted programs
        over their sharded concatenation and only scalars reach the host
        (metrics.py:device_metric_components / device_grouped_components).

        Beyond the int32-exact bounds (total rows, or one group's rows for
        gAUC) the metrics are instead combined on the HOST from the same
        already-accumulated arrays — no second forward sweep, and the
        data_generator is consumed exactly once (it may be a one-shot
        generator)."""
        from fuxictr_tpu.metrics import (DEVICE_METRIC_EXACT_ROWS,
                                         device_grouped_components,
                                         device_metric_components,
                                         evaluate_metrics,
                                         finish_device_grouped,
                                         finish_device_metrics)
        label = self.feature_map.labels[0]
        gid = self.feature_map.group_id
        grouped = [m for m in want if m in ("gAUC", "avgAUC")]
        ranked = [m for m in want if m == "MRR" or m.startswith("NDCG")]
        scalar = [m for m in want
                  if m in ("AUC", "logloss", "binary_crossentropy")]
        ys, labs, ms, gs = [], [], [], []
        for batch in data_generator:
            placed = self._place_batch(batch)
            y = self._jit_predict_step(self.state, placed)
            ys.append(y.reshape(-1))
            labs.append(placed[label].reshape(-1))
            ms.append(placed[SAMPLE_MASK_KEY].reshape(-1))
            if grouped or ranked:
                gs.append(placed[gid].reshape(-1))
        y = jnp.concatenate(ys)
        lab = jnp.concatenate(labs)
        valid = jnp.concatenate(ms) > 0
        g = jnp.concatenate(gs) if gs else None

        def host_combine():
            # rare big-eval fallback: O(dataset) host memory, but no second
            # forward sweep. all_gather_host resolves global sharded arrays
            # on every process identically (no-op single-process).
            from fuxictr_tpu.parallel.distributed import all_gather_host
            m = all_gather_host(valid)
            yt = all_gather_host(lab)[m].astype(np.float64)
            yp = all_gather_host(y)[m].astype(np.float64)
            gh = all_gather_host(g)[m] if g is not None else None
            return evaluate_metrics(yt, yp, want, gh)

        if y.shape[0] > DEVICE_METRIC_EXACT_ROWS:
            logging.info("device metrics: %d rows exceed the int32-exact "
                         "bound; combining on host", y.shape[0])
            return host_combine()
        out = {}
        if scalar:
            if self._jit_metric_components is None:
                self._jit_metric_components = jax.jit(
                    device_metric_components)
            comps = self._jit_metric_components(y, lab, valid)
            out.update(finish_device_metrics(jax.device_get(comps), scalar))
        if grouped:
            if getattr(self, "_jit_grouped_components", None) is None:
                self._jit_grouped_components = jax.jit(
                    device_grouped_components)
            gcomps = self._jit_grouped_components(y, lab, g, valid)
            try:
                out.update(finish_device_grouped(jax.device_get(gcomps),
                                                 grouped))
            except OverflowError as exc:
                logging.info("device gAUC: %s; combining on host", exc)
                return host_combine()
        if ranked:
            out.update(self._device_ranked(y, lab, g, valid, ranked))
        return {m: out[m] for m in want}

    def predict(self, data_generator):
        y_pred, _, _ = self._predictions(data_generator)
        return y_pred.reshape(-1).astype(np.float64)

    # ------------------------------------------------------------ weights
    def save_weights(self, checkpoint):
        os.makedirs(os.path.dirname(checkpoint), exist_ok=True)
        payload = {"params": jax.device_get(self.state.params),
                   "model_state": jax.device_get(self.state.model_state)}
        with open(checkpoint, "wb") as fd:
            fd.write(flax.serialization.to_bytes(payload))

    def load_weights(self, checkpoint):
        # template built host-side from shapes only: device_get of the live
        # params here costs a full device->host download of the tables
        # (minutes over the remote-TPU tunnel) for bytes that from_bytes
        # immediately overwrites
        template = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, x.dtype),
            {"params": self.state.params,
             "model_state": self.state.model_state})
        with open(checkpoint, "rb") as fd:
            payload = flax.serialization.from_bytes(template, fd.read())
        # stage explicitly (bounded, observable) rather than letting the
        # next dispatch upload ~the whole model implicitly — large implicit
        # transfers are where flaky remote backends stall. Under a mesh,
        # place each leaf at its param_sharding so every device receives
        # only its own table shard (the flat weights file itself is a full
        # host-side copy; orbax checkpoints are the shard-native format).
        if self.mesh is None:
            payload = jax.device_put(payload)
        else:
            payload = {
                "params": shard_params(self.mesh, payload["params"]),
                "model_state": jax.device_put(payload["model_state"],
                                              replicated(self.mesh))}
        self.state = self.state.replace(
            params=payload["params"], model_state=payload["model_state"])
        jax.block_until_ready(self.state.params)

    def save_checkpoint(self, path, use_orbax=False):
        """Full train state (params + opt + step) for mid-run resume.

        ``use_orbax=True`` writes an orbax checkpoint directory: sharded
        arrays are saved shard-by-shard without gathering to one host —
        the multi-chip path (the pickle default gathers via device_get).
        """
        if use_orbax:
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(path), self.state, force=True)
            ckptr.wait_until_finished()
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fd:
            pickle.dump(jax.device_get(self.state), fd)

    def load_checkpoint(self, path, use_orbax=False):
        if use_orbax:
            import orbax.checkpoint as ocp
            if self.state is None:   # need the target structure/shardings
                self.init_params()
            ckptr = ocp.StandardCheckpointer()
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, self.state)
            self.state = ckptr.restore(os.path.abspath(path), abstract)
        else:
            with open(path, "rb") as fd:
                self.state = pickle.load(fd)
            # host arrays replaced the (possibly mesh-placed) state;
            # a subsequent distribute() must actually reshard
            self._born_sharded = False
        # host mirror of the restored step: fit() resumes periodic-ckpt
        # numbering from it without a device barrier on the hot path
        self._resume_step = int(jax.device_get(self.state.step))
        self._just_restored = True      # enables resume_align_data in fit()

    def count_parameters(self, count_embedding=True):
        total = 0
        prefixes = self._embedding_prefixes() if not count_embedding else None
        flat = flax.traverse_util.flatten_dict(self.state.params)
        for path, leaf in flat.items():
            if not count_embedding and _is_embedding_path(path, prefixes):
                continue
            total += leaf.size
        logging.info("Total number of parameters: %d.", total)
        return total
