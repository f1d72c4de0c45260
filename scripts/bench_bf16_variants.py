"""Measure bf16 strategies for the embedding path on the real chip.

Variants (VERDICT r1 weak #7 / next-step 7):
  A  f32 params, f32 compute (baseline)
  B  full-tree cast to bf16 each step — the current compute_dtype path
     (includes casting the entire [V,D] table; does XLA fuse or
     materialize?)
  C  gather-then-cast: dense params cast to bf16, table stays f32, only
     the gathered [B*F,D] rows are cast
  D  bf16 table STORAGE: table param itself bf16 (gather+scatter move half
     the bytes); dense kept f32-master + cast

Each step: gather -> DCNv2-ish dense stack (cross + MLP) -> loss -> grads
-> sgd update (the scatter-add backward dominates at large V). Loss fetch
is the axon dispatch barrier.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

V = int(2.6e6)
D = 16
B = 8192
F = 26
STEPS = 30
bf16 = jnp.bfloat16


def make_params(rng, table_dtype=jnp.float32):
    k = jax.random.split(rng, 8)
    in_dim = F * D
    return {
        "table": jax.random.normal(k[0], (V, D), table_dtype) * 0.01,
        "cross_w": jax.random.normal(k[1], (3, in_dim, in_dim),
                                     jnp.float32) * 0.01,
        "cross_b": jnp.zeros((3, in_dim), jnp.float32),
        "w1": jax.random.normal(k[2], (in_dim, 1024), jnp.float32) * 0.02,
        "w2": jax.random.normal(k[3], (1024, 512), jnp.float32) * 0.02,
        "w3": jax.random.normal(k[4], (512, 256), jnp.float32) * 0.02,
        "w4": jax.random.normal(k[5], (256, 1), jnp.float32) * 0.02,
    }


def forward(params, ids, y, emb_cast=None):
    emb = params["table"][ids.reshape(-1)]
    if emb_cast is not None:
        emb = emb.astype(emb_cast)
    x0 = emb.reshape(B, F * D)
    x = x0
    for i in range(3):
        w = params["cross_w"][i].astype(x.dtype)
        b = params["cross_b"][i].astype(x.dtype)
        x = x0 * (x @ w + b) + x
    h = x
    for wname in ("w1", "w2", "w3"):
        h = jax.nn.relu(h @ params[wname].astype(h.dtype))
    logit = (h @ params["w4"].astype(h.dtype)).astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logit, 0) - logit * y
        + jnp.log1p(jnp.exp(-jnp.abs(logit))))


def make_step(mode):
    def loss_fn(params, ids, y):
        if mode == "A":
            return forward(params, ids, y)
        if mode == "B":
            cast = jax.tree_util.tree_map(lambda p: p.astype(bf16), params)
            return forward(cast, ids, y)
        if mode == "C":
            cast = {k: (v if k == "table" else v.astype(bf16))
                    for k, v in params.items()}
            return forward(cast, ids, y, emb_cast=bf16)
        if mode == "D":   # table already stored bf16
            cast = {k: (v if k == "table" else v.astype(bf16))
                    for k, v in params.items()}
            return forward(cast, ids, y)
        raise ValueError(mode)

    @jax.jit
    def step(params, ids, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids, y)
        new = jax.tree_util.tree_map(
            lambda p, g: p - 0.01 * g.astype(p.dtype), params, grads)
        return new, loss

    return step


def run(mode):
    rng = jax.random.PRNGKey(0)
    params = make_params(rng, bf16 if mode == "D" else jnp.float32)
    ids = np.random.default_rng(0).integers(0, V, (B, F), np.int32)
    y = np.random.default_rng(1).random((B, 1)).astype(np.float32) < 0.25
    ids, y = jax.device_put(ids), jax.device_put(y.astype(np.float32))
    step = make_step(mode)
    params, loss = step(params, ids, y)
    float(loss)                              # compile + barrier
    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, loss = step(params, ids, y)
    float(loss)                              # fetch = true barrier on axon
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{mode}: {dt * 1e3:.2f} ms/step "
          f"({B / dt / 1e3:.0f}k ex/s)", flush=True)
    return dt


if __name__ == "__main__":
    import sys
    modes = sys.argv[1:] or ["A", "B", "C", "D"]
    for m in modes:
        run(m)
