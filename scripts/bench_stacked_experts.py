"""Measure the stacked-experts win: E sequential small matmuls (the
reference's ModuleList loop shape, model_zoo/multitask/MMoE/src/MMoE.py:42-50)
vs ONE [E, d_in, d_out]-batched contraction (ops/mlp.py:stacked_mlp).

MMoE-shaped fwd+bwd+sgd step at production scale; loss-fetch barrier
(BENCHMARKS.md measurement methodology).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", 8192))
D_IN = int(os.environ.get("D_IN", 256))      # 16 fields x emb 16
HID = int(os.environ.get("HID", 512))
D_OUT = int(os.environ.get("D_OUT", 256))
E = int(os.environ.get("E", 8))
STEPS = 30


def run(variant):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4 * E + 2)
    w1 = jnp.stack([jax.random.normal(ks[i], (D_IN, HID)) * 0.02
                    for i in range(E)])
    b1 = jnp.zeros((E, HID))
    w2 = jnp.stack([jax.random.normal(ks[E + i], (HID, D_OUT)) * 0.02
                    for i in range(E)])
    b2 = jnp.zeros((E, D_OUT))
    gate = jax.random.normal(ks[-2], (D_IN, E)) * 0.02
    x = jax.random.normal(ks[-1], (B, D_IN), jnp.bfloat16)
    params = (w1, b1, w2, b2, gate)

    def forward(p, x):
        w1, b1, w2, b2, gate = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), p)
        if variant == "loop":
            outs = []
            for e in range(E):
                h = jax.nn.relu(x @ w1[e] + b1[e])
                outs.append(h @ w2[e] + b2[e])
            expert_out = jnp.stack(outs, axis=1)          # [B, E, D]
        else:
            h = jax.nn.relu(jnp.einsum("bi,eih->beh", x, w1)
                            + b1[None])
            expert_out = jnp.einsum("beh,eho->beo", h, w2) + b2[None]
        g = jax.nn.softmax((x @ gate).astype(jnp.float32), axis=-1)
        mixed = jnp.einsum("be,bed->bd", g, expert_out.astype(jnp.float32))
        return jnp.mean(mixed ** 2)

    @jax.jit
    def step(p, x):
        loss, grads = jax.value_and_grad(forward)(p, x)
        p = jax.tree_util.tree_map(lambda a, g: a - 1e-3 * g, p, grads)
        return p, loss

    p, loss = step(params, x)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        p, loss = step(p, x)
    float(loss)
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{variant:8s} {dt:7.2f} ms/step "
          f"({B / dt * 1000:,.0f} examples/s)", flush=True)
    return dt


if __name__ == "__main__":
    t_loop = run("loop")
    t_stacked = run("stacked")
    print(f"speedup: {t_loop / t_stacked:.2f}x "
          f"(B={B} E={E} {D_IN}->{HID}->{D_OUT})", flush=True)
