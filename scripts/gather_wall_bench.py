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


CHAIN = 100  # gathers chained on device per timed program


def _chain_gather(table, ids):
    """One jitted program = CHAIN dependent gathers (ids perturbed per
    iteration so nothing hoists), ONE value fetch at the end.  A per-call
    fetch costs one ~29ms tunnel RTT on this platform — 10x the op under
    measurement — so op cost must be amortized on device (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    N = table.shape[0]

    def prog(t, i0):
        def body(carry, i):
            rows = jnp.take(t, (i0 + i) % N, axis=0)
            return carry + jnp.sum(rows, axis=0), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((t.shape[1],), t.dtype),
            jnp.arange(CHAIN, dtype=jnp.int32),
        )
        return out[0]

    return jax.jit(prog), ids


def _chain_scatter(dst, ids, vals):
    import jax
    import jax.numpy as jnp

    N = dst.shape[0]

    def prog(d, i0, v):
        def body(carry, i):
            return carry.at[(i0 + i) % N].add(v), None

        out, _ = jax.lax.scan(
            body, d, jnp.arange(CHAIN, dtype=jnp.int32)
        )
        return out[0, 0]

    return jax.jit(prog)


def _timeit(fn, *args, warmup=1, iters=3):
    """Seconds per CHAINED ITERATION: runs the chained program (CHAIN ops
    inside one jit), fetches once, divides by CHAIN.  Min over `iters`
    repeats (platform variance is additive noise)."""
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out).ravel()[0]  # one fetch = completion barrier
        times.append(time.perf_counter() - t0)
    return float(min(times)) / CHAIN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--n_gather", type=int, default=24576)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="",
                    help="comma list of hypotheses to run (e.g. 'H1,H4'); "
                         "empty = all")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    def want(h):
        return not only or h in only

    import jax
    import jax.numpy as jnp

    N, D, G = args.rows, args.width, args.n_gather
    rng = np.random.default_rng(0)
    results = {}

    def rec(k, v):
        results[k] = v
        print(f"{k} = {v}", file=sys.stderr, flush=True)

    table = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    ids_rand = jnp.asarray(rng.integers(0, N, size=G).astype(np.int32))
    ids_sorted = jnp.sort(ids_rand)

    take, _ = _chain_gather(table, ids_rand)
    t_rand = _timeit(take, table, ids_rand)
    rec("H1_random_ms", t_rand * 1e3)
    if want("H1"):
        # NOTE the +i perturbation leaves sorted ids sorted-with-one-wrap —
        # still locality-preserving
        t_sort = _timeit(take, table, ids_sorted)
        rec("H1_sorted_ms", t_sort * 1e3)
        rec("H1_sorted_speedup", t_rand / t_sort)

    # H1b: end-to-end sort + gather + unsort (what a step would actually pay)
    if want("H1"):
        def prog_sg(t, i0):
            def body(carry, i):
                ii = (i0 + i) % N
                order = jnp.argsort(ii)
                rows = jnp.take(t, ii[order], axis=0)
                inv = jnp.argsort(order)
                return carry + jnp.sum(jnp.take(rows, inv, axis=0), axis=0), None

            out, _ = jax.lax.scan(
                body, jnp.zeros((t.shape[1],), t.dtype),
                jnp.arange(CHAIN, dtype=jnp.int32),
            )
            return out[0]

        t_sg = _timeit(jax.jit(prog_sg), table, ids_rand)
        rec("H1b_sort_gather_unsort_ms", t_sg * 1e3)

    # H2: R-row superrow blocks, same TOTAL useful rows (G), R-fold fewer
    # descriptors, R-fold more bytes
    for R in (2, 4, 8, 16) if want("H2") else ():
        blocks = table.reshape(N // R, R * D)
        bids = jnp.asarray(
            rng.integers(0, N // R, size=G // R).astype(np.int32)
        )
        take_b, _ = _chain_gather(blocks, bids)
        t_blk = _timeit(take_b, blocks, bids)
        rec(f"H2_block{R}_ms", t_blk * 1e3)
        rec(f"H2_block{R}_per_useful_row_vs_base", t_blk / t_rand)

    # H3: payload width sweep at constant descriptor count
    for W in (32, 128, 512) if want("H3") else ():
        tw = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))
        take_w, _ = _chain_gather(tw, ids_rand)
        t_w = _timeit(take_w, tw, ids_rand)
        rec(f"H3_width{W}_ms", t_w * 1e3)

    # H4 (source size): gather the same G rows from source tables of
    # shrinking row count.  If per-row cost is flat in source size, the
    # wall is descriptor issue (a batch-view-from-unique-rows restructure
    # saves nothing); if small sources are much cheaper (VMEM-resident
    # lowering), gathering unique rows once and building batch views by
    # small-array reindex removes half the step's HBM row traffic.
    for SN in (1_000_000, 65_536, 24_576, 8_192) if want("H4") else ():
        ts = jnp.asarray(rng.standard_normal((SN, D)).astype(np.float32))
        ids_s = jnp.asarray(rng.integers(0, SN, size=G).astype(np.int32))
        take_s, _ = _chain_gather(ts, ids_s)
        t_s = _timeit(take_s, ts, ids_s)
        rec(f"H4_src{SN}_ms", t_s * 1e3)

    # H4b (scatter-add source size): the adjoint of the reindex — G
    # duplicate-index scatter-adds into [SN, D]
    vals = jnp.asarray(rng.standard_normal((G, D)).astype(np.float32))
    for SN in (1_000_000, 24_576) if want("H4") else ():
        dst = jnp.zeros((SN, D), jnp.float32)
        ids_s = jnp.asarray(rng.integers(0, SN, size=G).astype(np.int32))
        t_sc = _timeit(_chain_scatter(dst, ids_s, vals), dst, ids_s, vals)
        rec(f"H4b_scatteradd_src{SN}_ms", t_sc * 1e3)

    # H5 (the packed step's actual write ops): scatter-SET of unique rows
    # (what .at[uids].set(unique_indices=True) costs vs the H4b adds), and
    # the 1D int32 tau gather/scatter pair — candidates for folding into
    # the packed row (row width is nearly free below ~2KB, H3)
    if want("H5"):
        vals = jnp.asarray(rng.standard_normal((G, D)).astype(np.float32))
        dst = jnp.zeros((N, D), jnp.float32)

        def prog_set(d, i0, v):
            def body(carry, i):
                return carry.at[(i0 + i) % N].set(
                    v, unique_indices=True
                ), None

            out, _ = jax.lax.scan(
                body, d, jnp.arange(CHAIN, dtype=jnp.int32)
            )
            return out[0, 0]

        # ids here are a random permutation slice -> genuinely unique
        ids_u = jnp.asarray(
            np.random.default_rng(1).permutation(N)[:G].astype(np.int32)
        )
        t_set = _timeit(jax.jit(prog_set), dst, ids_u, vals)
        rec("H5_scatterset_rows_ms", t_set * 1e3)

        # the step's actual ids are SORTED (sort-based dedupe) — measure
        # whether the scatter lowering exploits that.  (The +i chain
        # perturbation keeps sorted ids sorted-with-one-wrap.)
        t_set_s = _timeit(jax.jit(prog_set), dst, jnp.sort(ids_u), vals)
        rec("H5_scatterset_sorted_ms", t_set_s * 1e3)

        tau = jnp.zeros((N,), jnp.int32)
        tvals = jnp.arange(G, dtype=jnp.int32)

        def prog_tau(d, i0, v):
            def body(carry, i):
                ii = (i0 + i) % N
                got = jnp.take(carry, ii)  # the dt read
                return carry.at[ii].set(
                    v + got[0], unique_indices=True
                ), None

            out, _ = jax.lax.scan(
                body, d, jnp.arange(CHAIN, dtype=jnp.int32)
            )
            return out[0]

        t_tau = _timeit(jax.jit(prog_tau), tau, ids_u, tvals)
        rec("H5_tau_gather_plus_set_1d_ms", t_tau * 1e3)

    rec("config", vars(args))
    rec("ns_per_row_random", t_rand / G * 1e9)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
