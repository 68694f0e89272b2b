"""Multi-chip scaling benchmark (BASELINE.md criterion 4: >=85% efficiency
at 2 hosts).

Runs the sharded fast-path BPRMF epoch at the scaled config over increasing
mesh sizes and reports triples/s and efficiency vs linear scaling from the
1-device point.  On a pod slice, launch one process per host with
JAX_COORDINATOR_ADDRESS/... set (parallel/multihost.py) and run this script
on every host.  In this build image only one chip exists; the script also
runs on the virtual CPU mesh (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=8) for functional validation —
CPU-mesh timings do NOT measure ICI and are labeled as such.

Run:  python scripts/scaling_bench.py [--users ... --items ...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--items", type=int, default=500_000)
    ap.add_argument("--pos_per_user", type=int, default=20)
    ap.add_argument("--embed_k", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--mesh_model", type=int, default=2,
                    help="model-axis size for multi-device meshes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scaled_bench import make_scaled_arrays

    from fashionvisualexpl_tpu.core.mesh import make_mesh
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_fast_spmd_epoch_fn,
        shard_fast_state,
    )
    from fashionvisualexpl_tpu.train.fast import init_fast_state

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    print(f"{n_dev} {platform} devices", flush=True)

    pairs, padded, counts = make_scaled_arrays(
        args.users, args.items, args.pos_per_user
    )
    model = BPRMF(args.users, args.items, embed_k=args.embed_k)
    data_args = tuple(map(jnp.asarray, (pairs, padded, counts)))

    sizes = sorted({1, 2, 4, n_dev} & set(range(1, n_dev + 1)))
    results = {}
    for n in sizes:
        m_axis = args.mesh_model if n % args.mesh_model == 0 and n > 1 else 1
        mesh = make_mesh(data=n // m_axis, model=m_axis,
                         devices=jax.devices()[:n])
        params, _ = model.init(jax.random.PRNGKey(0))
        state = shard_fast_state(init_fast_state(params), mesh)
        epoch = make_fast_spmd_epoch_fn(
            model, mesh, 0.001, 0.001, args.items, args.steps, args.batch,
            with_replacement=True,
        )
        key = jax.random.PRNGKey(0)
        state, loss = epoch(state, key, *data_args)
        float(loss)
        t0 = time.time()
        state, loss = epoch(state, jax.random.fold_in(key, 1), *data_args)
        float(loss)
        el = time.time() - t0
        tps = args.steps * args.batch / el
        results[n] = tps
        eff = tps / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(f"devices={n} mesh=({n // m_axis}x{m_axis}): "
              f"{tps:,.0f} triples/s  efficiency={eff:.2%}", flush=True)

    print(json.dumps({
        "platform": platform,
        "triples_per_sec_by_devices": results,
        "note": ("CPU-mesh timings validate function, not ICI bandwidth"
                 if platform == "cpu" else "TPU measurement"),
    }))


if __name__ == "__main__":
    main()
