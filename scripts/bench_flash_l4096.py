"""Flash target-attention revisit at lifelong lengths (VERDICT r3 #3 /
BENCHMARKS revisit trigger: "lifelong TWIN at max_len >= 4096").

Round 1 measured the Pallas kernel 3.8x SLOWER than XLA at L=2048 (Mosaic
lowered the per-row contractions to the VPU). The trigger condition is a
>=4k-token sequence per query, where the kernel's O(L) memory advantage
could matter. This measures both paths at L in {2048, 4096, 8192}.

Run: python scripts/bench_flash_l4096.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fuxictr_tpu.ops.pallas_kernels import (flash_target_attention,
                                                target_attention)

    B, D = 1024, 64
    for L in (2048, 4096, 8192):
        q = jnp.asarray(np.random.default_rng(0).normal(
            size=(B, D)), jnp.float32)
        k = jnp.asarray(np.random.default_rng(1).normal(
            size=(B, L, D)), jnp.float32)
        v = jnp.asarray(np.random.default_rng(2).normal(
            size=(B, L, D)), jnp.float32)
        mask = jnp.ones((B, L), jnp.float32)

        def timed(fn, n=20):
            y = fn(q, k, v, mask)
            float(jnp.sum(y))                       # barrier
            t0 = time.perf_counter()
            for _ in range(n):
                y = fn(q, k, v, mask)
            float(jnp.sum(y))
            return (time.perf_counter() - t0) / n * 1e3

        xla = timed(jax.jit(lambda q, k, v, m: target_attention(
            q, k, v, m, use_flash=False)))
        try:
            fl = timed(jax.jit(lambda q, k, v, m: flash_target_attention(
                q, k, v, m)))
        except Exception as exc:
            fl = None
            print(f"# flash failed at L={L}: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
        print(json.dumps({"L": L, "B": B, "D": D,
                          "xla_ms": round(xla, 2),
                          "flash_ms": round(fl, 2) if fl else None,
                          "flash_vs_xla":
                              round(fl / xla, 2) if fl else None}),
              flush=True)


if __name__ == "__main__":
    main()
