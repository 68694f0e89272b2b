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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--items", type=int, default=50_000)
    ap.add_argument("--pos_per_user", type=int, default=20)
    ap.add_argument("--dim_f", type=int, default=64)
    ap.add_argument("--user_block", type=int, default=2048)
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

    params, frozen = model.init(jax.random.PRNGKey(0))

    t0 = time.time()
    att = batched_attributions(
        model.feature_attributions_block, params, frozen, data,
        user_block=args.user_block,
    )
    elapsed = time.time() - t0
    pairs = sum(len(v) for v in att.values())
    # compiled-program bound: one per (bucket width, block size) pair
    widths = {1 << max(0, P - 1).bit_length() if P > 1 else 1}
    print(json.dumps({
        "pairs": pairs,
        "wall_s": round(elapsed, 2),
        "pairs_per_sec": round(pairs / elapsed, 1),
        "distinct_bucket_widths": len(widths),
        "config": vars(args),
    }))


if __name__ == "__main__":
    main()
