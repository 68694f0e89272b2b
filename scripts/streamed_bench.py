"""Streamed (>HBM) trainer benchmark — VERDICT r3 task 3.

Measures train/streamed.py's host-prefetch pipeline (AttentiveFashion,
modality tensors on host / np.memmap) in two regimes:

- ``--mode streamed`` at a device-FITTING shape, against
  ``--mode resident`` (the device-resident generic Trainer) at identical
  shapes: the cost of the host pipe when you don't need it;
- ``--mode streamed --memmap`` at a genuinely >HBM shape (e.g. 1M items
  x 64x64 images = 16GB of edges alone): the regime the path exists for.
  The edge stack is materialized once as a .npy next to --workdir and
  opened read-only mmap — nothing ever holds the stack in host RAM or HBM.

Reports per-epoch triples/s (epoch 1 = compile excluded) and, for the
streamed mode, the host-gather bytes/step so the prefetch-vs-device
balance is explicit.

Run:
  python scripts/streamed_bench.py --mode resident --users 200000 --items 200000
  python scripts/streamed_bench.py --mode streamed --users 200000 --items 200000
  python scripts/streamed_bench.py --mode streamed --memmap --items 1000000 --img_hw 64
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scaled_bench import make_scaled_arrays  # noqa: E402


def build_memmap_stack(path, items, hw, chunk=4096):
    """Materialize a random [I, hw, hw, 1] fp32 edge stack on disk."""
    if os.path.exists(path):
        arr = np.load(path, mmap_mode="r")
        if arr.shape == (items, hw, hw, 1):
            return
        del arr
    print(f"building {items}x{hw}x{hw} edge stack "
          f"({items * hw * hw * 4 / 1e9:.1f} GB) at {path}...", flush=True)
    arr = np.lib.format.open_memmap(
        path, mode="w+", dtype=np.float32, shape=(items, hw, hw, 1)
    )
    rng = np.random.default_rng(0)
    for s in range(0, items, chunk):
        e = min(s + chunk, items)
        arr[s:e] = rng.random((e - s, hw, hw, 1), dtype=np.float32)
    arr.flush()
    del arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["streamed", "resident"],
                    default="streamed")
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--pos_per_user", type=int, default=20)
    ap.add_argument("--img_hw", type=int, default=32)
    ap.add_argument("--embed_k", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=100,
                    help="steps per measured epoch")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ap.add_argument("--memmap", action="store_true",
                    help="edges from an on-disk .npy memmap (the >HBM "
                         "configuration) instead of a host RAM array")
    ap.add_argument("--prefetch_depth", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/streamed_bench")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.core.train_state import (
        apply_gradients, create_train_state, tf_parity_adam,
    )
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.data.pipeline import HostPrefetcher
    from fashionvisualexpl_tpu.data.sampler import sample_triplets
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion
    from fashionvisualexpl_tpu.train.streamed import ArrayFeatureStore

    hw = args.img_hw
    color = synthetic_features(args.items, 512, seed=1)
    cls = synthetic_features(args.items, 100, seed=3)
    if args.memmap:
        os.makedirs(args.workdir, exist_ok=True)
        stack = os.path.join(args.workdir, f"edges_{args.items}_{hw}.npy")
        build_memmap_stack(stack, args.items, hw)
        edges = np.load(stack, mmap_mode="r")
    else:
        edges = np.random.default_rng(2).random(
            (args.items, hw, hw, 1), dtype=np.float32
        )

    model = AttentiveFashion(
        args.users, args.items, color, edges, cls,
        embed_k=args.embed_k, compute_dtype=args.compute_dtype,
        host_features=(args.mode == "streamed"),
    )
    pairs, padded_pos, counts = make_scaled_arrays(
        args.users, args.items, args.pos_per_user
    )
    pairs_d = jnp.asarray(pairs)
    pos_d = jnp.asarray(padded_pos)
    cnt_d = jnp.asarray(counts)
    params, frozen = model.init(jax.random.PRNGKey(0))
    steps, batch = args.steps, args.batch
    key = jax.random.PRNGKey(0)

    if args.mode == "resident":
        # device-resident generic epoch: one scanned XLA program (the
        # Trainer's train_path='generic' inner loop at fixed steps)
        tx = tf_parity_adam(0.001)
        state = create_train_state(params, tx)

        @jax.jit
        def run(state, k):
            users, pos, neg = sample_triplets(
                k, pairs_d, pos_d, cnt_d, args.items, steps, batch
            )
            kk = jax.random.split(jax.random.fold_in(k, 7), steps)

            def body(st, sb):
                u, p, n, r = sb

                def loss_fn(prm):
                    return model.loss(prm, frozen, u, p, n, 0.001, rng=r)

                loss, grads = jax.value_and_grad(loss_fn)(st.params)
                return apply_gradients(st, grads, tx), loss

            state, losses = jax.lax.scan(body, state, (users, pos, neg, kk))
            return state, jnp.sum(losses)

        rates = []
        for e in range(args.epochs + 1):
            t0 = time.time()
            state, loss = run(state, jax.random.fold_in(key, e))
            float(loss)
            dt = time.time() - t0
            tag = "compile+first" if e == 0 else f"epoch {e}"
            rate = steps * batch / dt
            print(f"  {tag}: {rate:,.0f} triples/s ({dt:.2f}s)", flush=True)
            if e > 0:
                rates.append(rate)
        result = max(rates)
    else:
        # the streamed loop: fit_streamed's mechanics at a fixed step count
        store = ArrayFeatureStore(model._color, model._edges, model._class)
        tx = tf_parity_adam(0.001)
        state = create_train_state(params, tx)

        @jax.jit
        def train_step(state, users, pos, neg, feats, rng):
            def loss_fn(p):
                return model.loss_streamed(p, users, pos, neg, feats, 0.001,
                                           rng=rng)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return apply_gradients(state, grads, tx), loss

        bytes_per_step = 2 * batch * (
            color.shape[1] * 4 + hw * hw * 4 + cls.shape[1] * 4
        )
        print(f"host gather: {bytes_per_step / 1e6:.0f} MB/step", flush=True)

        rates = []
        for e in range(args.epochs + 1):
            ekey = jax.random.fold_in(key, e)
            users, pos, neg = map(np.asarray, sample_triplets(
                ekey, pairs_d, pos_d, cnt_d, args.items, steps, batch
            ))

            def gather(s):
                return (users[s], pos[s], neg[s],
                        store.gather(pos[s], neg[s]))

            t0 = time.time()
            losses = []
            for s, (u, p, n, feats) in HostPrefetcher(
                iter(range(steps)), gather, depth=args.prefetch_depth
            ):
                state, loss = train_step(
                    state, jnp.asarray(u), jnp.asarray(p), jnp.asarray(n),
                    {k_: jnp.asarray(v) for k_, v in feats.items()},
                    jax.random.fold_in(ekey, 1000 + s),
                )
                losses.append(loss)
            float(jnp.sum(jnp.stack(losses)))
            dt = time.time() - t0
            tag = "compile+first" if e == 0 else f"epoch {e}"
            rate = steps * batch / dt
            print(f"  {tag}: {rate:,.0f} triples/s ({dt:.2f}s)", flush=True)
            if e > 0:
                rates.append(rate)
        result = max(rates)

    print(json.dumps({
        "streamed_train_triples_per_sec": result,
        "config": vars(args),
    }))


if __name__ == "__main__":
    main()
