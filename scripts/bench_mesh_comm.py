"""Mesh scaling evidence: per-step collective volumes from compiled HLO +
a bandwidth-parameterized scaling projection.

Multi-chip correctness is proven elsewhere (tests/test_parallel.py,
tests/test_distributed.py, __graft_entry__.dryrun_multichip parity). This
script quantifies what scaling would COST: it compiles the full DCNv2
train step (production Criteo shape) for several mesh layouts on the
virtual CPU mesh, parses the optimized (SPMD-partitioned) HLO for every
collective, and reports

  - bytes moved per collective type per step (per device),
  - compiled per-device FLOPs,
  - a projected scaling efficiency at each layout under stated link
    bandwidths (no-overlap lower bound AND perfect-overlap upper bound),

against BASELINE.md's ">85% efficiency at 2 hosts" target.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_mesh_comm.py

Assumption knobs (override via env):
  MESH_ICI_GBYTES   effective per-chip ICI bandwidth (default 45 GB/s
                    per direction — v5e has 4x ~400Gbps links; 45 GB/s
                    is a deliberately conservative achievable figure)
  MESH_DCN_GBYTES   effective per-host DCN bandwidth (default 12.5 GB/s
                    = 100 Gbps NIC)
  MESH_CHIP_TFLOPS  peak bf16 (default 197, v5e) — scaled by the
                    measured bench MFU so t_comp reflects reality, not
                    peak
  MESH_MFU          achieved MXU utilization from the single-chip bench
                    (default 0.12, BENCHMARKS.md roofline section)
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1, "f64": 8}
COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def _shape_bytes(shape_str):
    """'f32[8192,16]{1,0}' -> bytes; tuple shapes sum their elements."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text):
    """Per-step, per-device bytes by collective type (output shapes of
    collective ops in the SPMD-partitioned module; 'start' variants
    counted once, their 'done' halves skipped)."""
    out = {c: {"count": 0, "bytes": 0} for c in COLLECTIVES}
    for line in hlo_text.splitlines():
        m = re.search(
            r"=\s*((?:\([^)]*\)|\S+))\s+(all-reduce|all-gather|"
            r"reduce-scatter|collective-permute|all-to-all)"
            r"(-start)?\(", line)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        out[op]["count"] += 1
        out[op]["bytes"] += _shape_bytes(shape)
    return out


def build_step(mesh, batch_size):
    """Full DCNv2 train step (production Criteo shape) lowered on
    ``mesh`` (or single device when mesh is None); returns (compiled,
    global batch example)."""
    from functools import partial

    import jax

    from fuxictr_tpu.models.zoo.ranking import DCNv2
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    fm = make_synthetic_feature_map(num_categorical=26, num_numeric=13,
                                    vocab_size=100000, embedding_dim=16)
    model = DCNv2(fm, model_id="DCNv2_meshcomm", embedding_dim=16,
                  model_structure="parallel",
                  stacked_dnn_hidden_units=[1024, 512, 256],
                  parallel_dnn_hidden_units=[1024, 512, 256],
                  num_cross_layers=4, compute_dtype="bfloat16",
                  model_root="/tmp/fuxictr_tpu_meshcomm")
    model.init_params()
    if mesh is not None:
        model.distribute(mesh)
    batch = make_synthetic_batch(fm, batch_size=batch_size, seed=0)
    placed = model._place_batch(batch)
    step = partial(jax.jit, donate_argnums=(0,))(model._train_step_body())
    compiled = step.lower(model.state, placed,
                          jax.random.PRNGKey(0)).compile()
    return compiled


def analyze(mesh_shape, batch_size=8192):
    import jax

    from fuxictr_tpu.parallel import make_mesh

    n_data, n_model = mesh_shape
    n_dev = n_data * n_model
    mesh = (None if n_dev == 1
            else make_mesh(n_data=n_data, n_model=n_model,
                           devices=jax.devices()[:n_dev]))
    compiled = build_step(mesh, batch_size)
    ca = compiled.cost_analysis()
    colls = collective_bytes(compiled.as_text())
    total_coll = sum(v["bytes"] for v in colls.values())
    return {
        "mesh": {"data": n_data, "model": n_model},
        "global_batch": batch_size,
        "per_device_flops": ca.get("flops"),
        "per_device_bytes_accessed": ca.get("bytes accessed"),
        "collectives": {k: v for k, v in colls.items() if v["count"]},
        "collective_bytes_per_step": total_coll,
    }


def project(result, two_host=False):
    """Projected efficiency vs the 1-device step under stated bandwidths.

    t_comp uses peak*MFU (the measured single-chip reality). Collectives
    ride ICI inside a slice; the 2-host projection instead prices the
    dense-gradient all-reduce over DCN (ring: 2(n-1)/n of payload per
    host). Reports the no-overlap bound (comm fully serialized) and the
    perfect-overlap bound (comm hidden under compute)."""
    ici = float(os.environ.get("MESH_ICI_GBYTES", 45)) * 1e9
    dcn = float(os.environ.get("MESH_DCN_GBYTES", 12.5)) * 1e9
    peak = float(os.environ.get("MESH_CHIP_TFLOPS", 197)) * 1e12
    mfu = float(os.environ.get("MESH_MFU", 0.12))
    t_comp = (result["per_device_flops"] or 0) / (peak * mfu)
    link_bw = dcn if two_host else ici
    factor = 2 * (2 - 1) / 2 if two_host else 1.0   # ring over 2 hosts
    t_comm = result["collective_bytes_per_step"] * factor / link_bw
    no_overlap = t_comp / (t_comp + t_comm) if t_comp else 0.0
    perfect = 1.0 if t_comm <= t_comp else t_comp / t_comm
    return {"t_compute_ms": round(t_comp * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "link": "DCN" if two_host else "ICI",
            "efficiency_no_overlap": round(no_overlap, 4),
            "efficiency_perfect_overlap": round(perfect, 4)}


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, \
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    out = {"assumptions": {
        "ici_gbytes_s": float(os.environ.get("MESH_ICI_GBYTES", 45)),
        "dcn_gbytes_s": float(os.environ.get("MESH_DCN_GBYTES", 12.5)),
        "chip_tflops_bf16": float(os.environ.get("MESH_CHIP_TFLOPS", 197)),
        "achieved_mfu": float(os.environ.get("MESH_MFU", 0.12)),
    }, "layouts": []}
    for shape in ((1, 1), (8, 1), (4, 2), (2, 4)):
        res = analyze(shape)
        if shape != (1, 1):
            res["projection_ici"] = project(res, two_host=False)
            # 2-host reading of the same layout: the data-axis gradient
            # all-reduce crosses DCN instead
            res["projection_2host_dcn"] = project(res, two_host=True)
        out["layouts"].append(res)
        print(json.dumps(res), flush=True)
    with open("/tmp/mesh_comm.json", "w") as fd:
        json.dump(out, fd, indent=2)
    print("wrote /tmp/mesh_comm.json")


if __name__ == "__main__":
    main()
