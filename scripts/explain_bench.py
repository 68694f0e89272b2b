"""Batched explanation-engine benchmark (VERDICT r2 item 6 'Done' check):
grad-x-input attributions for EVERY (user, positive) pair of a large
synthetic catalog through the bucketed batched engine — a few compiled
programs, no per-user dispatch.

Run:  python scripts/explain_bench.py [--users 200000 --items 50000]
Emits one JSON line (pairs/s, wall time, compiled-program bound).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--items", type=int, default=50_000)
    ap.add_argument("--pos_per_user", type=int, default=20)
    ap.add_argument("--dim_f", type=int, default=64)
    ap.add_argument("--user_block", type=int, default=2048)
    ap.add_argument("--repeat", type=int, default=1,
                    help="runs; >1 separates compile cost from steady state "
                         "(first = cold incl. remote compiles, best-of-rest "
                         "= warm)")
    ap.add_argument("--profile", action="store_true",
                    help="xplane-trace the warm run and print the device "
                         "op summary (the SPEED.md denominator evidence)")
    args = ap.parse_args()

    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.data.interactions import Interactions
    from fashionvisualexpl_tpu.explain.grads import batched_attributions
    from fashionvisualexpl_tpu.models.grad_fashion import GradFashion

    rng = np.random.default_rng(0)
    U, I, P = args.users, args.items, args.pos_per_user
    base = rng.integers(0, I, size=(U, 1))
    stride = I // (P + 2)
    items = (base + np.arange(P) * stride) % I
    training = items.tolist()
    empty = [[] for _ in range(U)]
    data = Interactions.from_lists(training, empty, I, empty)

    color = synthetic_features(I, args.dim_f, seed=1)
    edges = synthetic_features(I, args.dim_f, seed=2)
    model = GradFashion(U, I, color, edges, embed_k=64, embed_d=16,
                        embed_color=16, embed_edges=16)
    import jax
    import jax.numpy as jnp

    params, frozen = model.init(jax.random.PRNGKey(0))

    runs = []
    for r in range(max(1, args.repeat)):
        t0 = time.time()
        att = batched_attributions(
            model.feature_attributions_block, params, frozen, data,
            user_block=args.user_block,
        )
        runs.append(time.time() - t0)
        print(f"run {r}: {runs[-1]:.2f}s", flush=True)
    pairs = sum(len(v) for v in att.values())
    warm = min(runs[1:]) if len(runs) > 1 else None

    if args.profile:
        # device-op attribution of ONE warm block program (the engine is
        # a scan of identical blocks): trace a single dispatch
        import tempfile

        from profile_step import summarize_xplane

        fn = jax.jit(model.feature_attributions_block)
        B = args.user_block
        W = 1 << max(0, P - 1).bit_length() if P > 1 else 1
        u_arr = jnp.asarray(np.arange(B, dtype=np.int32))
        i_arr = jnp.asarray(
            np.tile(np.arange(W, dtype=np.int32), (B, 1)) % I
        )
        np.asarray(fn(params, frozen, u_arr, i_arr))  # warm/compile
        trace_dir = tempfile.mkdtemp(prefix="explain_prof_")
        jax.profiler.start_trace(trace_dir)
        for _ in range(10):
            out = fn(params, frozen, u_arr, i_arr)
        np.asarray(out)
        jax.profiler.stop_trace()
        print(f"trace ({B} users x {W} width x 10 calls):", flush=True)
        summarize_xplane(trace_dir, top=10)

    # compiled-program bound: one per (bucket width, block size) pair
    widths = {1 << max(0, P - 1).bit_length() if P > 1 else 1}
    out = {
        "pairs": pairs,
        "wall_s": round(runs[0], 2),
        "pairs_per_sec": round(pairs / runs[0], 1),
        "distinct_bucket_widths": len(widths),
        "config": vars(args),
    }
    if warm is not None:
        out["warm_wall_s"] = round(warm, 2)
        out["warm_pairs_per_sec"] = round(pairs / warm, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
