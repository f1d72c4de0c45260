"""Measure host->device transfer bandwidth + dispatch latency on the axon
backend. Hypothesis: sustained training is transfer-bound (~1.3MB/batch at
~10MB/s tunnel bandwidth), which caps real-data throughput regardless of
the 16.75 ms compiled step."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def put_and_barrier(x):
    d = jax.device_put(x)
    # axon: block_until_ready returns at dispatch; sum-fetch is the barrier
    float(jnp.sum(d[..., :1].astype(jnp.float32)))
    return d


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    # dispatch latency: tiny transfer, many reps
    x = np.ones((8,), np.float32)
    put_and_barrier(x)
    t0 = time.perf_counter()
    reps = 30
    for _ in range(reps):
        put_and_barrier(x)
    lat_ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({"probe": "tiny_put_roundtrip", "ms": round(lat_ms, 2)}),
          flush=True)

    for mb in (1, 13, 64):
        x = np.ones((mb * 1024 * 1024 // 4,), np.float32)
        put_and_barrier(x)  # warm any allocator path
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            put_and_barrier(x)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"probe": f"put_{mb}MB",
                          "ms": round(dt * 1e3, 1),
                          "MB_per_s": round(mb / dt, 1)}), flush=True)

    # device->host fetch bandwidth (eval y_pred path)
    d = jax.device_put(np.ones((16 * 1024 * 1024 // 4,), np.float32))
    float(jnp.sum(d[:1]))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        _ = np.asarray(d)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"probe": "get_16MB", "ms": round(dt * 1e3, 1),
                      "MB_per_s": round(16 / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
