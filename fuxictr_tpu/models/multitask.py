"""Multitask training runtime.

Parity with the reference MultiTaskModel
(/root/reference/fuxictr/pytorch/models/multitask_model.py:29-246): one
label per task (feature_map.labels), per-task output activations and
losses, equal-weight ('EQ') loss summation, per-task + mean metric
reporting. Nets return ``{f"{label}_pred": logits}`` per task.
"""

import logging

import jax
import numpy as np
import jax.numpy as jnp

from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
from fuxictr_tpu.data.device_cache import (LABELS_KEY, ROWS_KEY,
                                           expand_cached_batch)
from fuxictr_tpu.metrics import DEVICE_METRIC_EXACT_ROWS, evaluate_metrics
from fuxictr_tpu.models.base import RankModel, make_loss_fn


class MultiTaskModel(RankModel):
    _multitask = True

    def __init__(self, feature_map, model_id="MultiTaskModel",
                 task="binary_classification", num_tasks=1, loss_weight="EQ",
                 **kwargs):
        super().__init__(feature_map, model_id=model_id,
                         task="binary_classification", **kwargs)
        self.num_tasks = num_tasks
        self.loss_weight = loss_weight
        tasks = task if isinstance(task, list) else [task] * num_tasks
        assert len(tasks) == num_tasks, \
            'the number of tasks must equal the length of "task"'
        self.tasks = tasks

    # ------------------------------------------------------------- labels
    def get_labels(self, batch):
        """[B, T] stacked task labels (order = feature_map.labels)."""
        return jnp.stack(
            [jnp.asarray(batch[l]).reshape(-1)
             for l in self.feature_map.labels], axis=1)

    def add_loss(self, outputs, y_true, weights):
        losses = self._loss_name if isinstance(self._loss_name, list) \
            else [self._loss_name] * self.num_tasks
        w = weights.reshape(-1, 1)
        total = 0.0
        for i, label in enumerate(self.feature_map.labels):
            loss_fn = make_loss_fn(losses[i])
            per_example = loss_fn(outputs[f"{label}_pred"],
                                  y_true[:, i:i + 1])
            total = total + (jnp.sum(per_example * w)
                             / jnp.maximum(jnp.sum(w), 1.0))
        if "aux_loss" in outputs:
            total = total + outputs["aux_loss"]
        return total  # 'EQ' weighting: plain sum

    # ---------------------------------------------------------- eval/infer
    def _predict_body(self):
        net = self.net
        acts = [jax.nn.sigmoid if t == "binary_classification"
                else (lambda x: x) for t in self.tasks]
        labels = self.feature_map.labels
        compute_dtype = self._compute_dtype
        feature_map = self.feature_map

        def predict_step(state, batch):
            batch = expand_cached_batch(feature_map, batch)
            params = state.params
            if compute_dtype is not None:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(compute_dtype), params)
            outputs = net.apply({"params": params, **state.model_state},
                                batch, train=False)
            return jnp.concatenate(
                [acts[i](outputs[f"{label}_pred"].astype(jnp.float32))
                 for i, label in enumerate(labels)], axis=1)   # [B, T]

        return predict_step

    def _make_predict_step(self):
        return jax.jit(self._predict_body())

    def evaluate(self, data_generator, metrics=None):
        labels = self.feature_map.labels
        from fuxictr_tpu.models.base import _device_metric_supported
        from fuxictr_tpu.parallel.distributed import is_multiprocess
        want = list(metrics or self.validation_metrics)
        gid = self.feature_map.group_id
        if (self.kwargs.get("device_metrics", True)
                and self.mesh is not None
                and not hasattr(data_generator, "cache_refs")
                and all(t == "binary_classification" for t in self.tasks)
                and all(_device_metric_supported(m, gid) for m in want)):
            # mesh path: per-task metric components computed on the
            # data-sharded global prediction matrix — O(batch) host memory,
            # the multitask twin of RankModel._device_eval_streaming
            # (VERDICT r4 #5; the reference's multitask eval is host-only,
            # multitask_model.py:177-223)
            return self._device_eval_streaming_multitask(data_generator,
                                                         want)
        cache_dev_ok = (
            self.kwargs.get("device_metrics", True)
            and hasattr(data_generator, "eval_label_cols")
            and all(t == "binary_classification" for t in self.tasks)
            and all(_device_metric_supported(m, gid) for m in want)
            and (gid is None
                 or not any(m for m in want
                            if m not in ("AUC", "logloss",
                                         "binary_crossentropy"))
                 or self._cache_eval_slots(data_generator)[1] is not None)
            and int(getattr(data_generator, "num_samples", 1 << 62))
            <= DEVICE_METRIC_EXACT_ROWS)
        if (hasattr(data_generator, "cache_refs")
                and getattr(data_generator, "_multihost", False)):
            # multi-host device cache: sharded global blocks cannot be
            # host-combined — evaluation must stay on device
            if getattr(data_generator, "mesh", None) is not self.mesh:
                raise ValueError(
                    "multi-host device-cache eval needs the loader staged "
                    "on the model's mesh")
            if not cache_dev_ok:
                raise NotImplementedError(
                    f"multi-host multitask device-cache eval supports only "
                    f"the exact device metrics; got {want}")
            return self._device_eval_multitask(data_generator, want)
        if (not is_multiprocess()
                and hasattr(data_generator, "cache_refs")
                and (self.mesh is None
                     or getattr(data_generator, "mesh", None) is self.mesh)):
            if cache_dev_ok:
                # fully on-device per-task eval: predictions never leave
                # the chip (VERDICT r4 #5 extended to the cache path)
                try:
                    return self._device_eval_multitask(data_generator, want)
                except OverflowError as exc:
                    logging.info("device multitask gAUC fallback: %s", exc)
            # device-cache loader (incl. chunked): scanned predict path,
            # labels/groups host-side
            y_pred, rows = self._cached_predictions(data_generator)
            y_true = data_generator.host_labels[rows]
            group_id = (data_generator.host_group[rows]
                        if data_generator.host_group is not None else None)
            return self._per_task_metrics(
                y_true.astype(np.float64), y_pred.astype(np.float64),
                group_id, metrics)
        if self._jit_predict_step is None:
            self._jit_predict_step = self._make_predict_step()
        preds, trues, groups = [], [], []
        for batch in data_generator:
            y = self._jit_predict_step(self.state, self._place_batch(batch))
            m = batch[SAMPLE_MASK_KEY] > 0
            preds.append(np.asarray(y)[m])
            if ROWS_KEY in batch:   # device-cache batch: labels ride host-side
                trues.append(batch[LABELS_KEY][m])
            else:
                trues.append(np.asarray(self.get_labels(batch))[m])
            if self.feature_map.group_id is not None:
                from fuxictr_tpu.data.device_cache import GROUP_KEY
                groups.append(np.asarray(
                    batch[GROUP_KEY] if ROWS_KEY in batch
                    else batch[self.feature_map.group_id])[m])
        y_pred = np.concatenate(preds).astype(np.float64)
        y_true = np.concatenate(trues).astype(np.float64)
        group_id = np.concatenate(groups) if groups else None
        return self._per_task_metrics(y_true, y_pred, group_id, metrics)

    def _device_eval_multitask(self, loader, want, chunk_size=32):
        """Per-task fully on-device evaluation of a device-cached split
        (single-host or multi-host mesh): the shared cached-eval kernel
        (RankModel._cached_eval_arrays; the multitask predict body's
        trailing axis makes it [N, T]) feeds the shared per-task
        combiner. Only metric scalars leave the accelerator. Raises
        OverflowError past the int32-exact gAUC bound (single-host
        callers fall back to the host pass)."""
        lab_cols = loader.eval_label_cols(self.feature_map)
        _, g_lo = self._cache_eval_slots(loader)
        y, lab, g, valid = self._cached_eval_arrays(
            loader, tuple(lab_cols), g_lo, chunk_size)
        return self._per_task_device_metrics(y, lab, g, valid, want)

    def _per_task_device_metrics(self, y, lab, g, valid, want):
        """Per-task device metric combination over [N, T] global
        prediction/label arrays — shared by the cached and streaming
        multitask device eval paths. Grouped overflows propagate
        (OverflowError) for the caller to handle."""
        from fuxictr_tpu.metrics import (device_grouped_components,
                                         device_metric_components,
                                         finish_device_grouped,
                                         finish_device_metrics)
        grouped = [m for m in want if m in ("gAUC", "avgAUC")]
        ranked = [m for m in want if m == "MRR" or m.startswith("NDCG")]
        scalar = [m for m in want
                  if m in ("AUC", "logloss", "binary_crossentropy")]
        if self._jit_metric_components is None:
            self._jit_metric_components = jax.jit(device_metric_components)
        all_logs, mean_logs = {}, {}
        for i, label in enumerate(self.feature_map.labels):
            logs = {}
            if scalar:
                comps = self._jit_metric_components(
                    y[:, i], lab[:, i], valid)
                logs.update(finish_device_metrics(
                    jax.device_get(comps), scalar))
            if grouped:
                if getattr(self, "_jit_grouped_components", None) is None:
                    self._jit_grouped_components = jax.jit(
                        device_grouped_components)
                gcomps = self._jit_grouped_components(
                    y[:, i], lab[:, i], g, valid)
                logs.update(finish_device_grouped(
                    jax.device_get(gcomps), grouped))    # may raise
            if ranked:
                logs.update(self._device_ranked(
                    y[:, i], lab[:, i], g, valid, ranked))
            logs = {m: logs[m] for m in want}
            logging.info(f"[Task: {label}][Metrics] " + " - ".join(
                f"{k}: {v:.6f}" for k, v in logs.items()))
            for k, v in logs.items():
                all_logs[f"{label}_{k}"] = v
                mean_logs.setdefault(k, []).append(v)
        for k, vs in mean_logs.items():
            all_logs[k] = float(np.mean(vs))
        logging.info("[Metrics] " + " - ".join(
            f"{k}: {np.mean(v):.6f}" for k, v in mean_logs.items()))
        return all_logs

    def _device_eval_streaming_multitask(self, data_generator, want):
        """Per-task device eval under the mesh: predictions/labels stay as
        data-sharded global [*, T] arrays; each task's exact AUC/logloss
        (+ grouped/ranked) components run as jitted programs over its
        column and only scalars reach the host. Beyond the int32-exact
        bound the per-task metrics are host-combined from the SAME
        accumulated arrays (no second sweep)."""
        from fuxictr_tpu.metrics import (DEVICE_METRIC_EXACT_ROWS,
                                         device_grouped_components,
                                         device_metric_components,
                                         evaluate_metrics,
                                         finish_device_grouped,
                                         finish_device_metrics)
        labels = self.feature_map.labels
        gid = self.feature_map.group_id
        grouped = [m for m in want if m in ("gAUC", "avgAUC")]
        ranked = [m for m in want if m == "MRR" or m.startswith("NDCG")]
        scalar = [m for m in want
                  if m in ("AUC", "logloss", "binary_crossentropy")]
        if self._jit_predict_step is None:
            self._jit_predict_step = self._make_predict_step()
        ys, labs, ms, gs = [], [], [], []
        for batch in data_generator:
            placed = self._place_batch(batch)
            y = self._jit_predict_step(self.state, placed)   # [B, T]
            ys.append(y)
            labs.append(jnp.stack(
                [jnp.asarray(placed[l]).reshape(-1) for l in labels],
                axis=1))
            ms.append(jnp.asarray(placed[SAMPLE_MASK_KEY]).reshape(-1))
            if grouped or ranked:
                gs.append(jnp.asarray(placed[gid]).reshape(-1))
        y = jnp.concatenate(ys)            # [N, T] global, data-sharded
        lab = jnp.concatenate(labs)
        valid = jnp.concatenate(ms) > 0
        g = jnp.concatenate(gs) if gs else None

        def host_combine():
            from fuxictr_tpu.parallel.distributed import all_gather_host
            m = all_gather_host(valid)
            yt = all_gather_host(lab)[m].astype(np.float64)
            yp = all_gather_host(y)[m].astype(np.float64)
            gh = all_gather_host(g)[m] if g is not None else None
            return self._per_task_metrics(yt, yp, gh, want)

        if y.shape[0] > DEVICE_METRIC_EXACT_ROWS:
            logging.info("device multitask metrics: %d rows exceed the "
                         "int32-exact bound; combining on host", y.shape[0])
            return host_combine()
        gz = g if g is not None else jnp.zeros(y.shape[0], jnp.int32)
        try:
            return self._per_task_device_metrics(y, lab, gz, valid, want)
        except OverflowError as exc:
            logging.info("device multitask gAUC: %s; combining on host",
                         exc)
            return host_combine()

    def _per_task_metrics(self, y_true, y_pred, group_id, metrics=None):
        all_logs = {}
        mean_logs = {}
        for i, label in enumerate(self.feature_map.labels):
            logs = evaluate_metrics(y_true[:, i], y_pred[:, i],
                                    metrics or self.validation_metrics,
                                    group_id)
            logging.info(f"[Task: {label}][Metrics] " + " - ".join(
                f"{k}: {v:.6f}" for k, v in logs.items()))
            for k, v in logs.items():
                all_logs[f"{label}_{k}"] = v
                mean_logs.setdefault(k, []).append(v)
        for k, vs in mean_logs.items():
            all_logs[k] = float(np.mean(vs))
        logging.info("[Metrics] " + " - ".join(
            f"{k}: {np.mean(v):.6f}" for k, v in mean_logs.items()))
        return all_logs

    def predict(self, data_generator):
        if self._jit_predict_step is None:
            self._jit_predict_step = self._make_predict_step()
        if self.state is None:
            self.init_params()
        preds, masks = [], []
        for batch in data_generator:
            y = self._jit_predict_step(self.state, self._place_batch(batch))
            preds.append(np.asarray(y))
            masks.append(batch[SAMPLE_MASK_KEY] > 0)
        mask = np.concatenate(masks)
        y_pred = np.concatenate(preds)[mask]
        return {label: y_pred[:, i].astype(np.float64)
                for i, label in enumerate(self.feature_map.labels)}
