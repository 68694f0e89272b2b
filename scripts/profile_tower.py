"""Op-level profile of the AttentiveFashion packed step per edge-tower
implementation (xla / fused / s2d) — the evidence behind SPEED.md's
round-4 conv contraction-depth verdict.

Run:  python scripts/profile_tower.py --edge_tower s2d --compute_dtype bfloat16
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaled_bench import make_scaled_arrays  # noqa: E402
from profile_step import summarize_xplane  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--items", type=int, default=100_000)
    ap.add_argument("--img_hw", type=int, default=32)
    ap.add_argument("--embed_k", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ap.add_argument("--edge_tower", choices=["auto", "fused", "xla", "s2d"],
                    default="xla")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace_dir", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
    )

    hw = args.img_hw
    model = AttentiveFashion(
        args.users, args.items,
        synthetic_features(args.items, 512, seed=1),
        np.random.default_rng(2).random((args.items, hw, hw, 1),
                                        dtype=np.float32),
        synthetic_features(args.items, 100, seed=3),
        embed_k=args.embed_k, compute_dtype=args.compute_dtype,
        edge_tower=args.edge_tower,
    )
    pairs, padded_pos, counts = make_scaled_arrays(args.users, args.items, 20)
    params, frozen = model.init(jax.random.PRNGKey(0))
    state = pack_generic_state(model, params)
    epoch = make_generic_packed_epoch_fn(
        model, 0.001, 0.001, args.items, args.steps, args.batch,
        with_replacement=False,
    )
    a = (jnp.asarray(pairs), jnp.asarray(padded_pos), jnp.asarray(counts))
    key = jax.random.PRNGKey(0)
    for e in range(3):  # compile + 2 settle epochs
        state, loss = epoch(state, frozen, jax.random.fold_in(key, e), *a)
        float(loss)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="fvx_tower_")
    jax.profiler.start_trace(trace_dir)
    state, loss = epoch(state, frozen, jax.random.fold_in(key, 99), *a)
    float(loss)
    jax.profiler.stop_trace()
    print(f"[{args.edge_tower}/{args.compute_dtype}] trace in {trace_dir} "
          f"({args.steps} steps x {args.batch})")
    summarize_xplane(trace_dir, top=args.top)


if __name__ == "__main__":
    main()
