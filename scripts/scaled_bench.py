"""Scaled-config benchmark (BASELINE.json config 4): 1M users x 500k items,
128-dim — training triples/sec and streaming full-catalog eval items/sec on
one chip.  Interaction structure is synthesized directly as arrays (no
planted semantics needed for throughput).

Run:  python scripts/scaled_bench.py [--users 1000000 --items 500000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_scaled_arrays(num_users, num_items, pos_per_user, seed=0,
                       build_pairs=True):
    """Vectorized padded-positives construction: row u gets pos_per_user
    distinct pseudo-random items (affine spread), sorted ascending.
    ``build_pairs=False`` (derived-pairs capacity mode) skips the [N, 2]
    table entirely — rows are sorted + uniform, so the sampler re-derives
    it from the padded matrix bit-identically (data/sampler.py)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, num_items, size=(num_users, 1), dtype=np.int64)
    stride = (num_items // (pos_per_user + 1)) - 1
    items = (base + np.arange(pos_per_user, dtype=np.int64) * stride) % num_items
    items = np.sort(items, axis=1).astype(np.int32)
    counts = np.full((num_users,), pos_per_user, dtype=np.int32)
    if not build_pairs:
        return None, items, counts
    users = np.repeat(
        np.arange(num_users, dtype=np.int32), pos_per_user
    )
    pairs = np.stack([users, items.reshape(-1)], axis=1)
    return pairs, items, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--items", type=int, default=500_000)
    ap.add_argument("--pos_per_user", type=int, default=20)
    ap.add_argument("--embed_k", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--fast", action="store_true", help="compact-grad + sparse-apply Adam path")
    ap.add_argument("--bootstrap", action="store_true",
                    help="with-replacement sampling (original-BPR scheme; "
                         "skips the per-epoch permutation)")
    ap.add_argument("--lazy", action="store_true",
                    help="LazyAdam semantics: touched-rows-only optimizer "
                         "(no full-table moment/param sweeps); implies --fast")
    ap.add_argument("--packed", action="store_true",
                    help="packed-state path (train/packed.py): p/m/v/bias in "
                         "one row per id, LazyAdam semantics — the fastest "
                         "single-chip path at this scale")
    ap.add_argument("--eval_users", type=int, default=4096)
    ap.add_argument("--model",
                    choices=["bprmf", "vbpr", "grad_fashion",
                             "attentive_fashion", "comp_vbpr", "acf"],
                    default="bprmf",
                    help="non-bprmf models require --packed (the fastest "
                         "path; their generic numbers are in SPEED.md)")
    ap.add_argument("--img_hw", type=int, default=32,
                    help="edge-image side for the encoder models "
                         "(attentive_fashion / comp_vbpr)")
    ap.add_argument("--spatial_s", type=int, default=8,
                    help="acf: spatial components per item (reference: 49)")
    ap.add_argument("--spatial_c", type=int, default=64,
                    help="acf: channels per spatial component")
    ap.add_argument("--packed_engine", choices=["specialized", "generic"],
                    default="generic",
                    help="generic = train/packed_generic.py (the Trainer's "
                         "shipping path); specialized = the hand-written "
                         "per-model steps in train/packed.py")
    ap.add_argument("--dim_f", type=int, default=64,
                    help="frozen feature dim (per family for grad_fashion)")
    ap.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="encoder-tower compute dtype "
                         "(attentive_fashion / comp_vbpr)")
    ap.add_argument("--edge_tower", choices=["auto", "fused", "xla", "s2d"],
                    default="auto",
                    help="attentive_fashion conv->pool->GAP tower impl "
                         "(ops/edge_tower.py fused Pallas kernel vs inline "
                         "XLA vs ops/s2d_conv.py space-to-depth)")
    ap.add_argument("--moment_dtype",
                    choices=["float32", "bfloat16", "float8"],
                    default="float32",
                    help="packed generic engine: Adam moment storage "
                         "(bfloat16 = m,v bit-packed into one fp32 column "
                         "per param column; 1/3 less row traffic)")
    ap.add_argument("--row_align", type=int, default=1,
                    help="packed generic engine: pad packed-row widths to "
                         "this multiple (capacity mode; see SPEED.md r5)")
    ap.add_argument("--skip_eval", action="store_true",
                    help="skip the eval section (capacity-ladder runs)")
    ap.add_argument("--host_pack", action="store_true",
                    help="init + pack on the CPU backend, ship packed "
                         "tables once (avoids the params+packed pack-time "
                         "transient at the HBM capacity frontier)")
    ap.add_argument("--derived_pairs", action="store_true",
                    help="capacity mode: never materialize the [N, 2] pair "
                         "table (920MB at the 11.5M-row ceiling) — the "
                         "sampler re-derives pairs from padded_pos "
                         "bit-identically (rows here are sorted + uniform)")
    ap.add_argument("--lazy_catchup", action="store_true",
                    help="packed generic engine: closed-form momentum "
                         "catch-up on touch")
    ap.add_argument("--fused_frozen", action="store_true",
                    help="fold frozen per-item feature columns into the "
                         "packed item rows (vbpr/grad_fashion/acf, generic "
                         "engine): one row gather instead of two")
    args = ap.parse_args()
    if args.model != "bprmf" and not args.packed:
        ap.error(f"--model {args.model} requires --packed")
    if (args.packed_engine == "specialized"
            and args.model not in ("bprmf", "vbpr", "grad_fashion")):
        ap.error(f"--model {args.model} has no specialized packed step; "
                 f"use --packed_engine generic")

    import jax
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.core.train_state import (
        apply_gradients, create_train_state, tf_parity_adam,
    )
    from fashionvisualexpl_tpu.data.sampler import sample_triplets
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.ops.topk import streaming_topk_and_counts

    print(f"building {args.users}x{args.items} arrays...", flush=True)
    pairs, padded_pos, counts = make_scaled_arrays(
        args.users, args.items, args.pos_per_user,
        build_pairs=not args.derived_pairs,
    )
    if args.model == "bprmf":
        model = BPRMF(args.users, args.items, embed_k=args.embed_k)
    elif args.model == "vbpr":
        from fashionvisualexpl_tpu.data.features import synthetic_features
        from fashionvisualexpl_tpu.models.vbpr import VBPR

        feats = synthetic_features(args.items, args.dim_f, seed=1)
        model = VBPR(args.users, args.items, feats,
                     embed_k=args.embed_k, embed_d=20)
    elif args.model == "grad_fashion":
        from fashionvisualexpl_tpu.data.features import synthetic_features
        from fashionvisualexpl_tpu.models.grad_fashion import GradFashion

        color = synthetic_features(args.items, args.dim_f, seed=1)
        edges = synthetic_features(args.items, args.dim_f, seed=2)
        model = GradFashion(args.users, args.items, color, edges,
                            embed_k=args.embed_k, embed_d=20)
    elif args.model == "attentive_fashion":
        from fashionvisualexpl_tpu.data.features import synthetic_features
        from fashionvisualexpl_tpu.models.attentive_fashion import (
            AttentiveFashion,
        )

        hw = args.img_hw
        imgs = np.random.default_rng(2).random(
            (args.items, hw, hw, 1), dtype=np.float32
        )
        model = AttentiveFashion(
            args.users, args.items,
            color_features=synthetic_features(args.items, 512, seed=1),
            edge_images=imgs,
            class_features=synthetic_features(args.items, 100, seed=3),
            embed_k=args.embed_k,
            compute_dtype=args.compute_dtype,
            edge_tower=args.edge_tower,
        )
    elif args.model == "acf":
        from fashionvisualexpl_tpu.models.acf import ACF

        spat = np.random.default_rng(1).standard_normal(
            (args.items, args.spatial_s, args.spatial_c)
        ).astype(np.float32)
        model = ACF(
            args.users, args.items, spat,
            embed_k=args.embed_k,
            padded_positives=padded_pos, positive_counts=counts,
            compute_dtype=args.compute_dtype,
        )
    else:  # comp_vbpr, all four families active
        from fashionvisualexpl_tpu.data.features import synthetic_features
        from fashionvisualexpl_tpu.models.comp_vbpr import CompVBPR

        hw = args.img_hw
        imgs = np.random.default_rng(2).random(
            (args.items, hw, hw, 1), dtype=np.float32
        )
        model = CompVBPR(
            args.users, args.items,
            semantic_features=synthetic_features(args.items, args.dim_f, seed=1),
            color_features=synthetic_features(args.items, 512, seed=3),
            edge_images=imgs,
            texture_features=synthetic_features(args.items, args.dim_f, seed=4),
            embed_k=args.embed_k, embed_d=20,
            compute_dtype=args.compute_dtype,
        )
    params, frozen = model.init(jax.random.PRNGKey(0))
    print("state built", flush=True)

    pairs_d = None if pairs is None else jnp.asarray(pairs)
    pos_d = jnp.asarray(padded_pos)
    cnt_d = jnp.asarray(counts)

    steps, batch = args.steps, args.batch

    if args.packed and args.packed_engine == "generic":
        from fashionvisualexpl_tpu.train.packed_generic import (
            make_generic_packed_epoch_fn, pack_generic_state,
            unpack_generic_params,
        )

        fused = bool(args.fused_frozen
                     and model.packed_spec().frozen_item_tables)
        if args.host_pack:
            # capacity frontier: packing on device transiently holds the
            # fp32 init params NEXT TO the packed tables (4.3G + 13.1G at
            # 8.5M K=128 rows — the pack itself OOMs before any step).
            # Init + pack on the CPU backend instead and ship each packed
            # table once.  The earlier device-side init must go first.
            import jax

            # tree_leaves, not .values(): ACF/encoder models carry NESTED
            # param dicts (attention/tower MLPs) whose values are dicts
            for v in jax.tree_util.tree_leaves(params):
                v.delete()
            params = {}
            cpu0 = jax.devices("cpu")[0]
            dev0 = jax.devices()[0]
            with jax.default_device(cpu0):
                params_h, frozen_h = model.init(jax.random.PRNGKey(0))
                state_h = pack_generic_state(
                    model, params_h, frozen=frozen_h if fused else None,
                    moment_dtype=args.moment_dtype,
                    row_align=args.row_align,
                )
            del params_h, frozen_h
            t0 = time.time()
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, dev0), state_h
            )
            jax.block_until_ready(state.user_pmv)
            del state_h
            print(f"host-pack shipped in {time.time() - t0:.1f}s",
                  flush=True)
        else:
            state = pack_generic_state(
                model, params, frozen=frozen if fused else None,
                moment_dtype=args.moment_dtype, row_align=args.row_align,
            )
        # the fp32 init params must not stay alive next to the packed state
        # — but the state's dense entries (encoder/attention MLPs) ALIAS
        # the originals rather than repacking them: delete only the leaves
        # the packed state does not still reference
        kept = {id(x) for x in jax.tree_util.tree_leaves(state)}
        for v in jax.tree_util.tree_leaves(params):
            if id(v) not in kept:
                v.delete()
        params = None
        epoch_fn = make_generic_packed_epoch_fn(
            model, 0.001, 0.001, args.items, steps, batch,
            with_replacement=args.bootstrap, fused_frozen=fused,
            moment_dtype=args.moment_dtype, lazy_catchup=args.lazy_catchup,
        )

        def run(state, key):
            return epoch_fn(state, frozen, key, pairs_d, pos_d, cnt_d)
    elif args.packed and args.model == "vbpr":
        from fashionvisualexpl_tpu.train.packed import (
            make_packed_vbpr_epoch_fn, pack_vbpr_state,
        )

        state = pack_vbpr_state(params)
        epoch_fn = make_packed_vbpr_epoch_fn(
            model, 0.001, 0.001, args.items, steps, batch,
            with_replacement=args.bootstrap,
        )
        frozen_F = frozen["F"]

        def run(state, key):
            return epoch_fn(state, frozen_F, key, pairs_d, pos_d, cnt_d)
    elif args.packed and args.model == "grad_fashion":
        from fashionvisualexpl_tpu.train.packed import (
            make_packed_grad_fashion_epoch_fn, pack_grad_fashion_state,
        )

        state = pack_grad_fashion_state(params)
        epoch_fn = make_packed_grad_fashion_epoch_fn(
            model, 0.001, 0.001, args.items, steps, batch,
            with_replacement=args.bootstrap,
        )
        Fc, Fe = frozen["Fc"], frozen["Fe"]

        def run(state, key):
            return epoch_fn(state, Fc, Fe, key, pairs_d, pos_d, cnt_d)
    elif args.packed:
        from fashionvisualexpl_tpu.train.packed import (
            make_packed_epoch_fn, pack_bprmf_state, unpack_bprmf_params,
        )

        state = pack_bprmf_state(params)
        epoch_fn = make_packed_epoch_fn(
            model, 0.001, 0.001, args.items, steps, batch,
            with_replacement=args.bootstrap,
        )

        def run(state, key):
            return epoch_fn(state, key, pairs_d, pos_d, cnt_d)
    elif args.fast or args.lazy:
        from fashionvisualexpl_tpu.train.fast import (
            init_fast_state, init_lazy_state, make_fast_epoch_fn,
        )

        state = (
            init_lazy_state(params, ("Gu", "Gi", "Bi"))
            if args.lazy else init_fast_state(params)
        )
        epoch_fn = make_fast_epoch_fn(
            model, 0.001, 0.001, args.items, steps, batch,
            with_replacement=args.bootstrap, lazy=args.lazy,
        )

        def run(state, key):
            return epoch_fn(state, key, pairs_d, pos_d, cnt_d)
    else:
        tx = tf_parity_adam(0.001)
        state = create_train_state(params, tx)

        @jax.jit
        def run(state, key):
            users, pos, neg = sample_triplets(
                key, pairs_d, pos_d, cnt_d, args.items, steps, batch
            )

            def body(st, sb):
                u, p, n = sb

                def loss_fn(prm):
                    return model.loss(prm, frozen, u, p, n, 0.001)

                loss, grads = jax.value_and_grad(loss_fn)(st.params)
                return apply_gradients(st, grads, tx), loss

            state, losses = jax.lax.scan(body, state, (users, pos, neg))
            return state, jnp.sum(losses)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, loss = run(state, key)
    print(f"compile+first: {time.time() - t0:.1f}s loss={float(loss):.1f}",
          flush=True)
    # layout settle can take MORE than one post-compile epoch on this
    # platform; warm until two consecutive runs agree within 20%, then
    # report the best measured run (per-epoch prints show the variance)
    tps = 0.0
    prev = None
    for it in range(2, 6):
        t0 = time.time()
        state, loss = run(state, jax.random.fold_in(key, it))
        float(loss)
        train_elapsed = time.time() - t0
        cur = steps * batch / train_elapsed
        print(f"  epoch {it}: {cur:,.0f} triples/s ({train_elapsed:.2f}s)",
              flush=True)
        tps = max(tps, cur)
        if prev is not None and abs(cur - prev) / max(cur, prev) < 0.2:
            break
        prev = cur
    print(f"train: {tps:,.0f} triples/s (best of settled runs, "
          f"{steps}x{batch})", flush=True)

    if args.model != "bprmf" or args.skip_eval:
        # eval throughput for the factored models is recorded by the full
        # evaluator benchmarks (SPEED.md); this script's eval section
        # measures the shared MF core only.  --skip_eval: capacity-ladder
        # runs where the eval-side table copies would OOM after training
        print(json.dumps({
            "scaled_train_triples_per_sec": tps,
            "config": vars(args),
        }))
        return

    # streaming eval throughput: top-k + counts over the full catalog for a
    # block of users
    Bu = args.eval_users
    if args.packed:
        from types import SimpleNamespace

        if args.packed_engine == "generic":
            state = SimpleNamespace(
                params=unpack_generic_params(state, model.packed_spec())
            )
        else:
            state = SimpleNamespace(
                params=unpack_bprmf_params(state, args.embed_k)
            )
    uf = state.params["Gu"][:Bu]
    ref_scores = jnp.zeros((Bu, 1), jnp.float32)

    @jax.jit
    def eval_block(uf, gi, bi):
        return streaming_topk_and_counts(
            uf, gi, bi, 84, ref_scores=ref_scores, item_block=32768,
        )

    out = eval_block(uf, state.params["Gi"], state.params["Bi"])
    jax.block_until_ready(out)
    t0 = time.time()
    out = eval_block(uf, state.params["Gi"], state.params["Bi"])
    float(out[0][0, 0])
    eval_elapsed = time.time() - t0
    scored = Bu * args.items
    ips = scored / eval_elapsed
    print(f"eval: {ips:,.0f} user-item scores/s "
          f"({eval_elapsed:.3f}s for {Bu} users x {args.items} items)",
          flush=True)
    full_eval_s = args.users * args.items / ips
    print(f"extrapolated full-catalog eval (all {args.users} users): "
          f"{full_eval_s:,.0f}s", flush=True)

    print(json.dumps({
        "scaled_train_triples_per_sec": tps,
        "scaled_eval_scores_per_sec": ips,
        "config": vars(args),
    }))


if __name__ == "__main__":
    main()
