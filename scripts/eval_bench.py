"""Streaming-eval counts-kernel benchmark (the SPEED.md eval numbers).

Measures the counts-only kernel (the per-epoch metric path's cost center,
ops/topk.py::streaming_counts) at the documented config: 4096 users x 500k
items, K=128, ~40 train + 1 eval banned ids per user.  Reports user-item
scores/s.  Optionally also times the FULL FactoredEvaluator at 200k x 100k.

  python scripts/eval_bench.py [--items 500000] [--banned 40] [--profile]

Timing per CLAUDE.md: value-fetch barrier, warm until two consecutive runs
agree within 20% (layout settle takes two post-compile epochs).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def settle(fn, fetch, max_iters=6, tol=0.2):
    """Run fn until two consecutive timings agree within tol; return best s."""
    prev = None
    best = float("inf")
    for _ in range(max_iters):
        t0 = time.time()
        out = fn()
        fetch(out)
        dt = time.time() - t0
        best = min(best, dt)
        if prev is not None and abs(dt - prev) / max(dt, prev) < tol:
            break
        prev = dt
    return best


def full_evaluator_bench(args):
    """Time FactoredEvaluator.evaluate end-to-end (both splits, all
    metrics) on a synthetic catalog — the SPEED.md 'full metric
    evaluation' number."""
    from types import SimpleNamespace

    import jax

    from fashionvisualexpl_tpu.data.interactions import Interactions
    from fashionvisualexpl_tpu.eval.factored import FactoredEvaluator
    from fashionvisualexpl_tpu.models.bprmf import BPRMF

    # random unique per-user item lists WITHOUT the [U, I] score matrix
    # synthetic_interactions plants (149GiB at this geometry)
    rng = np.random.default_rng(0)
    n = 22  # 20 train + 1 val + 1 test
    ids = rng.integers(0, args.items, size=(args.users, n), dtype=np.int64)
    bad = np.nonzero(
        (np.sort(ids, axis=1)[:, 1:] == np.sort(ids, axis=1)[:, :-1]).any(1)
    )[0]
    while bad.size:  # redraw the ~0.2% of rows with duplicate draws
        ids[bad] = rng.integers(0, args.items, size=(bad.size, n))
        s = np.sort(ids[bad], axis=1)
        bad = bad[(s[:, 1:] == s[:, :-1]).any(1)]
    data = Interactions.from_lists(
        [row[:-2].tolist() for row in ids],
        [[int(row[-1])] for row in ids],
        args.items,
        [[int(row[-2])] for row in ids],
    )
    model = BPRMF(data.num_users, data.num_items, embed_k=args.dim)
    params, frozen = model.init(jax.random.PRNGKey(0))
    mesh = None
    if args.mesh_model:
        # the sharded evaluator on however many devices exist (1x1 on the
        # single real chip = the shard_map-overhead sanity number for the
        # round-5 sharded fast-counts engines)
        from fashionvisualexpl_tpu.core.mesh import make_mesh

        mesh = make_mesh(data=1, model=args.mesh_model)
    ev = FactoredEvaluator(
        model, data, k=20, user_block=4096, item_block=args.item_block,
        counts_impl=args.counts_impl, mesh=mesh,
    )
    out = ev.evaluate(params, frozen)  # compile + settle
    best = prev = None
    for _ in range(4):
        t0 = time.time()
        out = ev.evaluate(params, frozen)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if prev is not None and abs(dt - prev) / max(dt, prev) < 0.2:
            break
        prev = dt
    scored = 2 * data.num_users * data.num_items  # val + test splits
    print(json.dumps({
        "kernel": (
            f"full_evaluator[{ev.counts_impl}"
            + (f",mesh=1x{args.mesh_model}" if mesh is not None else "")
            + "]"
        ),
        "elapsed_s": round(best, 4),
        "scores_per_sec": round(scored / best),
        "auc_t": round(out["auc_t"], 4),
        "config": {"users": args.users, "items": args.items,
                   "dim": args.dim, "item_block": args.item_block},
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=4096)
    p.add_argument("--items", type=int, default=500_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--banned", type=int, default=40)
    p.add_argument("--t", type=int, default=1, help="eval items per user")
    p.add_argument("--item_block", type=int, default=32768)
    p.add_argument("--profile", action="store_true")
    p.add_argument("--kernel", default="counts",
                   choices=("counts", "counts_bucketed", "counts_pallas"))
    p.add_argument("--chain", type=int, default=8,
                   help="chained kernel invocations per timed call — "
                        "amortizes the ~29ms host-fetch tunnel RTT "
                        "(CLAUDE.md) that would otherwise dominate")
    p.add_argument("--full", action="store_true",
                   help="time FactoredEvaluator.evaluate end-to-end "
                        "instead of the bare counts kernel")
    p.add_argument("--counts_impl", default="auto")
    p.add_argument("--mesh_model", type=int, default=0,
                   help="run the SHARDED evaluator over a 1 x N model "
                        "mesh (0 = single-device path)")
    args = p.parse_args()

    if args.full:
        full_evaluator_bench(args)
        return

    from fashionvisualexpl_tpu.ops.topk import streaming_counts

    rng = np.random.default_rng(0)
    Bu, I, D = args.users, args.items, args.dim
    uf = jnp.asarray(rng.normal(size=(Bu, D)).astype(np.float32) * 0.1)
    iv = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32) * 0.1)
    ib = jnp.asarray(rng.normal(size=(I,)).astype(np.float32) * 0.01)
    # banned ids: ~banned train + t eval per user, unique per user
    Pb = args.banned + args.t
    banned = np.stack(
        [rng.choice(I, size=Pb, replace=False) for _ in range(Bu)]
    ).astype(np.int32)
    ref = jnp.asarray(rng.normal(size=(Bu, args.t)).astype(np.float32) * 0.5)
    banned_d = jnp.asarray(banned)

    chain = args.chain

    def chained(one):
        """Run `one(ref, *ops) -> counts` 1+chain times with a data
        dependency between iterations (counts*0 folded into ref) so XLA
        cannot CSE the repeats; per-call cost = total / (1 + chain).
        Operands are jit ARGUMENTS, never closure constants (a large
        closure constant re-ships through the tunnel every call,
        CLAUDE.md)."""
        @jax.jit
        def fn(r, *ops):
            def body(i, carry):
                c = one(carry, *ops)
                return carry + c.astype(carry.dtype) * 0.0
            r = jax.lax.fori_loop(0, chain, body, r)
            return one(r, *ops)
        return fn

    if args.kernel == "counts":
        fn = chained(lambda r, u, v, b, bn: streaming_counts(
            u, v, b, ref_scores=r, banned_ids=bn,
            item_block=args.item_block))
        operands = (uf, iv, ib, banned_d)
    elif args.kernel == "counts_bucketed":
        from fashionvisualexpl_tpu.ops.topk import (
            bucket_banned_ids, streaming_counts_bucketed)
        loc, msk = bucket_banned_ids(banned, I, args.item_block)
        fn = chained(lambda r, u, v, b, l, m: streaming_counts_bucketed(
            u, v, b, ref_scores=r, banned_local=l, banned_valid=m,
            item_block=args.item_block))
        operands = (uf, iv, ib, jnp.asarray(loc), jnp.asarray(msk))
    else:
        from fashionvisualexpl_tpu.ops.counts import streaming_counts_pallas
        from fashionvisualexpl_tpu.ops.topk import bucket_banned_ids
        loc, msk = bucket_banned_ids(banned, I, args.item_block)
        fn = chained(lambda r, u, v, b, l, m: streaming_counts_pallas(
            u, v, b, ref_scores=r, banned_local=l, banned_valid=m,
            item_block=args.item_block))
        operands = (uf, iv, ib, jnp.asarray(loc), jnp.asarray(msk))
    call = lambda: fn(ref, *operands)

    out = call()
    jax.block_until_ready(out)

    if args.profile:
        import datetime
        import os
        tracedir = f"/tmp/evalprof-{datetime.datetime.now():%H%M%S}"
        os.makedirs(tracedir, exist_ok=True)
        with jax.profiler.trace(tracedir):
            int(call()[0, 0])
        print(f"trace in {tracedir}", flush=True)

    dt = settle(call, lambda o: int(o[0, 0]))
    dt = dt / (1 + chain)
    scored = Bu * I
    print(json.dumps({
        "kernel": args.kernel,
        "elapsed_s": round(dt, 4),
        "scores_per_sec": round(scored / dt),
        "config": {"users": Bu, "items": I, "dim": D, "banned": Pb,
                   "t": args.t, "item_block": args.item_block},
    }))


if __name__ == "__main__":
    main()
