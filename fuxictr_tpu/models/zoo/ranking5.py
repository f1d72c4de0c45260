"""Feature-interaction ranking models, tranche 5 — extensions.

DCNv3 (exponential + linear cross networks with self-mask and tri-BCE).
The reference README indexes DCNv3 (README.md:60) but the mounted tree
ships no ``model_zoo/DCNv3`` source, so this is implemented from the
paper (Li et al., "DCNv3: Towards Next Generation Deep Cross Network for
CTR Prediction", arXiv:2407.13349) rather than from reference code.
Deliberate divergences are documented on each module.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.models.base import RankModel, make_loss_fn
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.common import xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding


class _CrossNetV3(nn.Module):
    """DCNv3 cross network (paper §3.2-3.3), one branch.

    Per layer: H = x W (no bias, half width); self-mask = relu(LN(H));
    cross vector c = [H, H ∘ mask] (back to full width); then
      exponential branch: x ← x ∘ (c + b) + x     (order doubles/layer)
      linear branch:      x ← x0 ∘ (c + b) + x    (order grows by 1)
    Ends with a per-head scalar logit head, averaged over heads.

    Weights are shared across heads (a torch ``nn.Linear`` on a
    [B, heads, D] tensor broadcasts the same way).
    """

    num_layers: int = 3
    exponential: bool = True
    layer_norm: bool = True
    batch_norm: bool = False
    net_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        x0 = x
        dim = x.shape[-1]
        half = dim // 2
        for i in range(self.num_layers):
            h = nn.Dense(half, use_bias=False, kernel_init=xavier_normal(),
                         name=f"w_{i}")(x)
            if self.batch_norm:
                # per-head statistics (torch BatchNorm1d(num_heads) on
                # [B, heads, half])
                h = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, axis=1, name=f"bn_{i}")(h)
            gate = nn.LayerNorm(name=f"ln_{i}")(h) if self.layer_norm else h
            mask = nn.relu(gate)
            cross = jnp.concatenate([h, h * mask], axis=-1)
            b = self.param(f"b_{i}", zeros_init, (dim,))
            base = x if self.exponential else x0
            x = base * (cross + b) + x
            if self.net_dropout > 0:
                x = nn.Dropout(self.net_dropout,
                               deterministic=not train)(x)
        logit = nn.Dense(1, kernel_init=xavier_normal(),
                         bias_init=zeros_init, name="logit")(x)
        return jnp.mean(logit, axis=1)  # [B, heads, 1] -> [B, 1]


class _DCNv3Net(nn.Module):
    """DCNv3: multi-head embedding + ECN ∥ LCN fusion (paper §3.1, §3.4).

    Multi-head split: [B, F, D] -> [B, heads, F*(D/heads)] (the paper's
    extra halve-and-interleave inside each head is a fixed permutation of
    embedding lanes — weight-equivalent at init, omitted).
    structure: "parallel" (ECN+LCN, mean-of-logits), "ecn", or "lcn".
    """

    feature_map: Any
    embedding_dim: int = 16
    num_heads: int = 1
    num_deep_cross_layers: int = 4
    num_shallow_cross_layers: int = 4
    layer_norm: bool = True
    batch_norm: bool = False
    deep_net_dropout: float = 0.0
    shallow_net_dropout: float = 0.0
    structure: str = "parallel"

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        bsz, nf, dim = emb.shape
        if dim % self.num_heads:
            raise ValueError(
                f"embedding_dim={dim} not divisible by "
                f"num_heads={self.num_heads}")
        # [B, F, H, D/H] -> [B, H, F*(D/H)]
        x = emb.reshape(bsz, nf, self.num_heads, dim // self.num_heads)
        x = x.transpose(0, 2, 1, 3).reshape(bsz, self.num_heads, -1)
        if x.shape[-1] < 2:
            raise ValueError("per-head width must be >= 2")
        out = {}
        if self.structure in ("parallel", "ecn"):
            out["y_d"] = _CrossNetV3(
                self.num_deep_cross_layers, exponential=True,
                layer_norm=self.layer_norm, batch_norm=self.batch_norm,
                net_dropout=self.deep_net_dropout, name="ecn")(x, train)
        if self.structure in ("parallel", "lcn"):
            out["y_s"] = _CrossNetV3(
                self.num_shallow_cross_layers, exponential=False,
                layer_norm=self.layer_norm, batch_norm=self.batch_norm,
                net_dropout=self.shallow_net_dropout, name="lcn")(x, train)
        if self.structure == "parallel":
            out["y_pred"] = (out["y_d"] + out["y_s"]) * 0.5
        elif self.structure == "ecn":
            out["y_pred"] = out.pop("y_d")
        elif self.structure == "lcn":
            out["y_pred"] = out.pop("y_s")
        else:
            raise NotImplementedError(
                f"structure={self.structure} is not supported.")
        return out


@register_model
class DCNv3(RankModel):
    """DCNv3 (paper arXiv:2407.13349; absent from the mounted reference
    tree — see module docstring). Tri-BCE: the fused loss plus each
    branch's BCE weighted by max(branch_loss − fused_loss, 0); the
    weights are stop-gradiented (treated as coefficients per the paper's
    intent; the official torch lets gradients flow through them)."""

    def __init__(self, feature_map, model_id="DCNv3", learning_rate=1e-3,
                 embedding_dim=16, num_heads=1, num_deep_cross_layers=4,
                 num_shallow_cross_layers=4, layer_norm=True,
                 batch_norm=False, deep_net_dropout=0.0,
                 shallow_net_dropout=0.0, structure="parallel", **kwargs):
        net = _DCNv3Net(feature_map, embedding_dim, num_heads,
                        num_deep_cross_layers, num_shallow_cross_layers,
                        layer_norm, batch_norm, deep_net_dropout,
                        shallow_net_dropout, structure)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)

    def add_loss(self, outputs, y_true, weights):
        loss_fn = make_loss_fn(self._loss_name)
        w = weights.reshape(-1, 1)
        denom = jnp.maximum(jnp.sum(w), 1.0)

        def wmean(logits):
            return jnp.sum(loss_fn(logits, y_true) * w) / denom

        loss = wmean(outputs["y_pred"])
        for branch in ("y_d", "y_s"):
            if branch in outputs:
                bl = wmean(outputs[branch])
                bw = jax.lax.stop_gradient(jnp.maximum(bl - loss, 0.0))
                loss = loss + bl * bw
        if "aux_loss" in outputs:
            loss = loss + outputs["aux_loss"]
        return loss
