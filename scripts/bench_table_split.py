"""Microbenchmark: size-bucketed embedding tables vs one fused table.

Motivation (BENCHMARKS.md "Gather/scatter cost scales with TABLE SIZE"):
per-row gather cost from a 2.6M-row table is ~8x the cost from a 100k-row
table, and scatter-add shows the same ~5x table-size effect. The current
FeatureEmbedding fuses ALL same-dim fields into ONE table, so on Criteo
the 22 small-vocab fields (266k rows combined) pay big-table (2.15M-row)
DMA stride prices for 85% of the gathered rows.

This bench isolates the embedding train path (gather -> loss -> scatter
-> dense adam) for the DCNv2/Criteo shape (B=8192, 26 fields, D=16,
vocabs = scripts/make_criteo_scale.VOCABS) under three layouts:

  fused   one [2.15M, 16] table (current design)
  split2  small table (V<=100k fields) + big table (4 fields)
  split3  tiny (<=8k) + mid (<=100k) + big

Run: python scripts/bench_table_split.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scripts.make_criteo_scale import VOCABS

B = int(os.environ.get("BENCH_BATCH", 8192))
D = int(os.environ.get("BENCH_EMB_DIM", 16))
STEPS = int(os.environ.get("BENCH_STEPS", 30))
DTYPE = jnp.bfloat16


def make_ids(rng, vocabs):
    """Zipf-ish ids per field, [B, F] int32."""
    cols = []
    for V in vocabs:
        p = 1.0 / np.power(np.arange(1, V + 1), 1.05)
        p /= p.sum()
        cdf = np.cumsum(p)
        cols.append(np.searchsorted(cdf, rng.random(B)).astype(np.int32))
    return np.stack(cols, axis=1)


def build_layout(buckets):
    """buckets: list of lists of vocab sizes -> per-bucket (rows, offsets)."""
    out = []
    for vs in buckets:
        offs = np.cumsum([0] + list(vs[:-1])).astype(np.int32)
        out.append((int(sum(vs)), offs))
    return out


def run(name, buckets, ids_by_bucket):
    layout = build_layout(buckets)
    key = jax.random.PRNGKey(0)
    tables = [jax.random.normal(jax.random.fold_in(key, i), (rows, D),
                                jnp.float32) * 1e-2
              for i, (rows, _) in enumerate(layout)]
    offs = [jnp.asarray(o) for _, o in layout]
    ids = [jnp.asarray(x) for x in ids_by_bucket]
    tx = optax.adam(1e-3)
    opt_state = tx.init(tables)

    def loss_fn(tabs):
        acc = 0.0
        for t, o, x in zip(tabs, offs, ids):
            e = jnp.take(t.astype(DTYPE), x + o[None, :], axis=0)  # [B,F,D]
            acc = acc + jnp.sum(e.astype(jnp.float32) ** 2)
        return acc / B

    @jax.jit
    def step(tabs, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(tabs)
        upd, opt_state = tx.update(g, opt_state, tabs)
        tabs = optax.apply_updates(tabs, upd)
        return tabs, opt_state, loss

    tables, opt_state, loss = step(tables, opt_state)
    float(loss)  # barrier (axon: block_until_ready returns at dispatch)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        tables, opt_state, loss = step(tables, opt_state)
    float(loss)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    rows = sum(r for r, _ in layout)
    print(f"{name:8s} tables={[r for r, _ in layout]} "
          f"total_rows={rows} {dt:7.2f} ms/step")
    return dt


def main():
    rng = np.random.default_rng(0)
    vocabs = list(VOCABS)
    all_ids = make_ids(rng, vocabs)

    def bucketize(edges):
        """edges: list of max-vocab thresholds ascending; returns buckets of
        vocab lists + matching id column groups."""
        groups = [[] for _ in range(len(edges))]
        idg = [[] for _ in range(len(edges))]
        for f, V in enumerate(vocabs):
            for bi, e in enumerate(edges):
                if V <= e:
                    groups[bi].append(V)
                    idg[bi].append(all_ids[:, f])
                    break
        groups = [g for g in groups if g]
        idg = [np.stack(g, 1) for g in idg if g]
        return groups, idg

    g1, i1 = bucketize([10**18])
    run("fused", g1, i1)
    g2, i2 = bucketize([100_000, 10**18])
    run("split2", g2, i2)
    g3, i3 = bucketize([8_000, 100_000, 10**18])
    run("split3", g3, i3)
    g4, i4 = bucketize([1_000, 16_000, 100_000, 400_000, 10**18])
    run("split5", g4, i4)


if __name__ == "__main__":
    main()
