"""Row-gather DMA-issue-wall microbenchmark (VERDICT r2 item 5).

SPEED.md's ablation pins the scaled packed step on ~80ns/row gather issue
latency (24k rows x 512B from a [1M, 128] table = 12MB, 1.9ms measured vs
15us at HBM bandwidth — 128x off the bandwidth bound).  This script tests
the hypotheses a faster gather would need, each as a direct measurement:

  H1 (sortedness): issuing the same gathers in ascending id order lets the
     HBM row buffer / prefetcher amortize — measure take(sorted) vs
     take(random) at identical row counts.
  H2 (descriptor amortization): fewer, wider descriptors beat many narrow
     ones — view the table as [N/R, R*D] "superrows" and gather whole
     R-row blocks; per-descriptor bytes grow R-fold while descriptor count
     falls R-fold.  If the wall is per-descriptor issue, block gathers
     approach R-fold speedup until bandwidth binds.
  H3 (payload width): per-row cost is flat in row width below the issue
     latency — gather the same rows from [N, 32] / [N, 128] / [N, 512]
     tables.  Flat time across widths = latency-bound; linear = bandwidth.

Interpretation for the training step: random negative ids cannot be
clustered (H2 needs id locality), so H2 only helps tables whose access
sets are STATIC per user (ACF's per-user positive rows) after an offline
item renumbering.  H1 is free (sort + inverse-permute on device) if it
measures >1.1x.

Run on the real chip:  python scripts/gather_wall_bench.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, warmup=3, iters=20):
    """Median wall time of a jitted call; fetches one value to force
    completion (block_until_ready is unreliable on this platform)."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out).ravel()[0]  # one fetch = completion barrier
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--n_gather", type=int, default=24576)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    N, D, G = args.rows, args.width, args.n_gather
    rng = np.random.default_rng(0)
    results = {}

    table = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    ids_rand = jnp.asarray(rng.integers(0, N, size=G).astype(np.int32))
    ids_sorted = jnp.sort(ids_rand)

    take = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0), axis=0))
    t_rand = _timeit(take, table, ids_rand, iters=args.iters)
    t_sort = _timeit(take, table, ids_sorted, iters=args.iters)
    results["H1_random_ms"] = t_rand * 1e3
    results["H1_sorted_ms"] = t_sort * 1e3
    results["H1_sorted_speedup"] = t_rand / t_sort

    # H1b: end-to-end sort + gather + unsort (what a step would actually pay)
    def sorted_gather(t, i):
        order = jnp.argsort(i)
        rows = jnp.take(t, i[order], axis=0)
        inv = jnp.argsort(order)
        return jnp.sum(jnp.take(rows, inv, axis=0), axis=0)

    t_sg = _timeit(jax.jit(sorted_gather), table, ids_rand, iters=args.iters)
    results["H1b_sort_gather_unsort_ms"] = t_sg * 1e3

    # H2: R-row superrow blocks, same TOTAL useful rows (G), R-fold fewer
    # descriptors, R-fold more bytes
    for R in (2, 4, 8, 16):
        blocks = table.reshape(N // R, R * D)
        bids = jnp.asarray(
            rng.integers(0, N // R, size=G // R).astype(np.int32)
        )
        t_blk = _timeit(take, blocks, bids, iters=args.iters)
        results[f"H2_block{R}_ms"] = t_blk * 1e3
        results[f"H2_block{R}_per_useful_row_vs_base"] = t_blk / t_rand

    # H3: payload width sweep at constant descriptor count
    for W in (32, 128, 512):
        tw = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))
        t_w = _timeit(take, tw, ids_rand, iters=args.iters)
        results[f"H3_width{W}_ms"] = t_w * 1e3

    results["config"] = vars(args)
    results["ns_per_row_random"] = t_rand / G * 1e9
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
