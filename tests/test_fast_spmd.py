"""Sharded fast path must match the single-device fast path numerically."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.mesh import make_mesh
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.parallel.fast_spmd import (
    make_fast_spmd_epoch_fn,
    shard_fast_state,
)
from fashionvisualexpl_tpu.train.fast import init_fast_state, make_fast_epoch_fn


def test_fast_spmd_matches_fast_single_device():
    mesh = make_mesh(data=4, model=2)
    # num_users/items divisible by model axis (padding is upstream's job)
    data = synthetic_interactions(24, 32, interactions_per_user=8, seed=0)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    lr, reg, batch = 0.01, 0.01, 16
    steps = data.steps_per_epoch(batch)
    args = (
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
    )
    key = jax.random.PRNGKey(0)

    params, _ = model.init(jax.random.PRNGKey(1))

    # single-device fast path (keys must line up: the single-device fast
    # epoch uses `key` directly for sampling; SPMD splits — run both through
    # the same sampler discipline by comparing with the split variant)
    s1 = init_fast_state(params)
    ep1 = make_fast_epoch_fn(model, lr, reg, data.num_items, steps, batch)
    s8 = shard_fast_state(init_fast_state(params), mesh)
    ep8 = make_fast_spmd_epoch_fn(
        model, mesh, lr, reg, data.num_items, steps, batch
    )

    for e in range(3):
        k = jax.random.fold_in(key, e)
        sk, _ = jax.random.split(k)
        # feed the single-device epoch the pre-split key so both paths
        # sample identical batches
        s1, l1 = ep1(s1, sk, *args)
        s8, l8 = ep8(s8, k, *args)

    np.testing.assert_allclose(float(l8), float(l1), rtol=2e-4)
    for name in ("Bi", "Gu", "Gi"):
        np.testing.assert_allclose(
            np.asarray(s8.params[name]), np.asarray(s1.params[name]),
            rtol=3e-4, atol=1e-5, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(s8.mu[name]), np.asarray(s1.mu[name]),
            rtol=3e-4, atol=1e-6, err_msg=f"mu {name}",
        )


def test_packed_spmd_matches_packed_single_device():
    """Sharded packed path == single-device packed path (same LazyAdam
    semantics; collectives must not perturb the numbers beyond float
    reduction order)."""
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_packed_spmd_epoch_fn, shard_packed_state,
    )
    from fashionvisualexpl_tpu.train.packed import (
        make_packed_epoch_fn, pack_bprmf_state, unpack_bprmf_params,
    )

    mesh = make_mesh(data=4, model=2)
    data = synthetic_interactions(24, 32, interactions_per_user=8, seed=0)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    lr, reg, batch = 0.01, 0.01, 16
    steps = data.steps_per_epoch(batch)
    args = (
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
    )
    key = jax.random.PRNGKey(0)
    params, _ = model.init(jax.random.PRNGKey(1))

    s1 = pack_bprmf_state(params)
    ep1 = make_packed_epoch_fn(model, lr, reg, data.num_items, steps, batch,
                               with_replacement=False)
    s8 = shard_packed_state(pack_bprmf_state(params), mesh)
    ep8 = make_packed_spmd_epoch_fn(
        model, mesh, lr, reg, data.num_items, steps, batch
    )

    for e in range(3):
        k = jax.random.fold_in(key, e)
        sk, _ = jax.random.split(k)
        s1, l1 = ep1(s1, sk, *args)
        s8, l8 = ep8(s8, k, *args)
        np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)

    p1 = unpack_bprmf_params(s1, 8)
    p8 = unpack_bprmf_params(s8, 8)
    for k_ in ("Bi", "Gu", "Gi"):
        np.testing.assert_allclose(
            np.asarray(p8[k_]), np.asarray(p1[k_]),
            rtol=2e-4, atol=1e-6, err_msg=k_,
        )
    np.testing.assert_array_equal(np.asarray(s8.tau_u), np.asarray(s1.tau_u))
    np.testing.assert_array_equal(np.asarray(s8.tau_i), np.asarray(s1.tau_i))


def test_generic_packed_spmd_matches_single_device():
    """Sharded GENERIC packed engine == single-device generic packed engine
    for a dense-param model (GradFashion: two frozen families + 4 dense
    projections), including row padding (30 items over a model axis of 4)."""
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.grad_fashion import GradFashion
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_generic_packed_spmd_epoch_fn, shard_generic_packed_state,
    )
    from fashionvisualexpl_tpu.parallel.spmd import shard_params
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
        unpack_generic_params,
    )

    mesh = make_mesh(data=2, model=4)
    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    color = synthetic_features(30, 7, seed=1)
    edges = synthetic_features(30, 9, seed=2)
    model = GradFashion(24, 30, color, edges, embed_k=8, embed_d=4,
                        embed_color=4, embed_edges=4)
    lr, reg, batch = 0.01, 0.01, 16
    steps = data.steps_per_epoch(batch)
    args = (
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
    )
    key = jax.random.PRNGKey(0)
    params, frozen = model.init(jax.random.PRNGKey(1))

    s1 = pack_generic_state(model, params)
    ep1 = make_generic_packed_epoch_fn(
        model, lr, reg, data.num_items, steps, batch, with_replacement=False
    )
    _, frozen_sh = shard_params(model, params, frozen, mesh)
    s8 = shard_generic_packed_state(pack_generic_state(model, params), mesh)
    ep8 = make_generic_packed_spmd_epoch_fn(
        model, mesh, lr, reg, data.num_items, steps, batch
    )

    for e in range(3):
        k = jax.random.fold_in(key, e)
        # both engines split the key identically -> identical batches
        s1, l1 = ep1(s1, frozen, k, *args)
        s8, l8 = ep8(s8, frozen_sh, k, *args)
        np.testing.assert_allclose(float(l8), float(l1), rtol=2e-4)

    spec = model.packed_spec()
    p1 = unpack_generic_params(s1, spec)
    p8 = unpack_generic_params(s8, spec)
    for name in ("Gu", "Tu", "Gi", "Bi", "E", "Bp", "Ec", "Ee"):
        got = np.asarray(p8[name])
        want = np.asarray(p1[name])
        got = got[: want.shape[0]]  # drop pad rows on item tables
        np.testing.assert_allclose(
            got, want, rtol=3e-4, atol=1e-5, err_msg=name,
        )
    # tau rides the final pmv column in the generic layout
    np.testing.assert_array_equal(
        np.asarray(s8.user_pmv)[:, -1], np.asarray(s1.user_pmv)[:, -1]
    )
    np.testing.assert_array_equal(
        np.asarray(s8.item_pmv)[:30, -1], np.asarray(s1.item_pmv)[:, -1]
    )


def test_generic_packed_spmd_acf_matches_single_device():
    """Sharded generic packed engine == single-device engine for ACF — the
    extra-item-rows path (attentive profile over each user's positive set)
    must survive the collective gather + shared item dedupe."""
    from fashionvisualexpl_tpu.models.acf import ACF
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_generic_packed_spmd_epoch_fn, shard_generic_packed_state,
    )
    from fashionvisualexpl_tpu.parallel.spmd import shard_params
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
        unpack_generic_params,
    )

    mesh = make_mesh(data=2, model=4)
    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    spat = np.asarray(
        np.random.default_rng(7).normal(size=(30, 3, 5)), np.float32
    )
    model = ACF(24, 30, spat, data, embed_k=8,
                layers_component=(4, 1), layers_item=(4, 1), max_user_pos=5)
    lr, reg, batch = 0.01, 0.01, 16
    steps = data.steps_per_epoch(batch)
    args = (
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
    )
    key = jax.random.PRNGKey(0)
    params, frozen = model.init(jax.random.PRNGKey(1))

    s1 = pack_generic_state(model, params)
    ep1 = make_generic_packed_epoch_fn(
        model, lr, reg, data.num_items, steps, batch, with_replacement=False
    )
    _, frozen_sh = shard_params(model, params, frozen, mesh)
    s8 = shard_generic_packed_state(pack_generic_state(model, params), mesh)
    ep8 = make_generic_packed_spmd_epoch_fn(
        model, mesh, lr, reg, data.num_items, steps, batch
    )

    for e in range(3):
        k = jax.random.fold_in(key, e)
        s1, l1 = ep1(s1, frozen, k, *args)
        s8, l8 = ep8(s8, frozen_sh, k, *args)
        np.testing.assert_allclose(float(l8), float(l1), rtol=2e-4)

    spec = model.packed_spec()
    p1 = unpack_generic_params(s1, spec)
    p8 = unpack_generic_params(s8, spec)
    for name in ("Gu", "Gi", "Pi"):
        got = np.asarray(p8[name])
        want = np.asarray(p1[name])
        got = got[: want.shape[0]]  # drop pad rows on item tables
        np.testing.assert_allclose(
            got, want, rtol=3e-4, atol=1e-5, err_msg=name,
        )
    for sub in ("comp", "item"):
        for k_, v in p1[sub].items():
            np.testing.assert_allclose(
                np.asarray(p8[sub][k_]), np.asarray(v),
                rtol=3e-4, atol=1e-5, err_msg=f"{sub}.{k_}",
            )
    # tau rides the final pmv column in the generic layout
    np.testing.assert_array_equal(
        np.asarray(s8.user_pmv)[:, -1], np.asarray(s1.user_pmv)[:, -1]
    )
    np.testing.assert_array_equal(
        np.asarray(s8.item_pmv)[:30, -1], np.asarray(s1.item_pmv)[:, -1]
    )


def test_fit_packed_over_mesh():
    """fit() with train_path='packed' AND a mesh runs the sharded generic
    packed engine end-to-end (train + per-epoch eval on padded tables)."""
    from fashionvisualexpl_tpu.core.config import MeshConfig, TrainConfig
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.eval.evaluator import Evaluator
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.trainer import fit

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    feats = synthetic_features(30, 12, seed=1)
    model = VBPR(24, 30, feats, embed_k=8, embed_d=4)
    cfg = TrainConfig(batch_size=16, epochs=3, lr=0.05, reg=0.001, top_k=5,
                      train_path="packed", eval_every=3, bootstrap=True,
                      mesh=MeshConfig(data=4, model=2))
    ev = Evaluator(model, data, k=5, user_block=32)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    history = extra["history"]
    assert history[-1].loss < history[0].loss
    assert results, "eval ran"


def test_generic_packed_spmd_attentive_fashion_matches_single_device():
    """Sharded generic packed engine == single-device engine for
    AttentiveFashion — the replicated-dense-towers + data-psum'd tower
    grads composition (three encoders + attention MLP as `dense`, Gu/Gi as
    packed rows, frozen modality stacks replicated).  Witnesses the
    sharded analogue of reference AttentiveFashion.py:209-256.

    Dropout is disabled: the SPMD engine folds the step rng per data
    shard, so stochastic masks cannot line up with the single-device
    draw; equality is only defined for the deterministic path."""
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_generic_packed_spmd_epoch_fn, shard_generic_packed_state,
    )
    from fashionvisualexpl_tpu.parallel.spmd import shard_params
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
        unpack_generic_params,
    )

    mesh = make_mesh(data=2, model=4)
    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    rng_np = np.random.default_rng(5)
    color = synthetic_features(30, 7, seed=1)
    edges = rng_np.random((30, 8, 8, 1)).astype(np.float32)
    cls = np.eye(5, dtype=np.float32)[rng_np.integers(0, 5, 30)]
    model = AttentiveFashion(
        24, 30, color, edges, cls, embed_k=8,
        attention_layers=(4, 1), encoder_hidden=8, dropout_rate=0.0,
    )
    lr, reg, batch = 0.01, 0.01, 16
    steps = data.steps_per_epoch(batch)
    args = (
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
    )
    key = jax.random.PRNGKey(0)
    params, frozen = model.init(jax.random.PRNGKey(1))

    s1 = pack_generic_state(model, params)
    ep1 = make_generic_packed_epoch_fn(
        model, lr, reg, data.num_items, steps, batch, with_replacement=False
    )
    _, frozen_sh = shard_params(model, params, frozen, mesh)
    s8 = shard_generic_packed_state(pack_generic_state(model, params), mesh)
    ep8 = make_generic_packed_spmd_epoch_fn(
        model, mesh, lr, reg, data.num_items, steps, batch
    )

    for e in range(3):
        k = jax.random.fold_in(key, e)
        s1, l1 = ep1(s1, frozen, k, *args)
        s8, l8 = ep8(s8, frozen_sh, k, *args)
        np.testing.assert_allclose(float(l8), float(l1), rtol=2e-4)

    spec = model.packed_spec()
    p1 = unpack_generic_params(s1, spec)
    p8 = unpack_generic_params(s8, spec)
    for name in ("Gu", "Gi"):
        got = np.asarray(p8[name])[: np.asarray(p1[name]).shape[0]]
        np.testing.assert_allclose(
            got, np.asarray(p1[name]), rtol=3e-4, atol=1e-5, err_msg=name,
        )
    for tower in ("color_enc", "class_enc", "edges_enc", "attention"):
        for k_, v in p1[tower].items():
            np.testing.assert_allclose(
                np.asarray(p8[tower][k_]), np.asarray(v),
                rtol=3e-4, atol=1e-5, err_msg=f"{tower}.{k_}",
            )


@pytest.mark.slow
def test_generic_packed_spmd_comp_vbpr_matches_single_device():
    """Sharded generic packed engine == single-device engine for CompVBPR —
    four feature families: row-sharded frozen tables read through
    collective_take, the trainable CNN edge tower replicated as `dense`
    with data-psum'd grads, per-family user profiles as packed user
    columns.  (CNN dropout zeroed: see the attentive_fashion test.)"""
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.comp_vbpr import CompVBPR
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_generic_packed_spmd_epoch_fn, shard_generic_packed_state,
    )
    from fashionvisualexpl_tpu.parallel.spmd import shard_params
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
        unpack_generic_params,
    )

    mesh = make_mesh(data=2, model=4)
    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    rng_np = np.random.default_rng(9)
    sem = synthetic_features(30, 6, seed=1)
    color = synthetic_features(30, 7, seed=2)
    tex = synthetic_features(30, 5, seed=3)
    edges = rng_np.random((30, 8, 8, 1)).astype(np.float32)
    model = CompVBPR(24, 30, sem, color, edges, tex, embed_k=8, embed_d=4)
    model.cnn.dropout_rate = 0.0
    lr, reg, batch = 0.01, 0.01, 16
    steps = data.steps_per_epoch(batch)
    args = (
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
    )
    key = jax.random.PRNGKey(0)
    params, frozen = model.init(jax.random.PRNGKey(1))

    s1 = pack_generic_state(model, params)
    ep1 = make_generic_packed_epoch_fn(
        model, lr, reg, data.num_items, steps, batch, with_replacement=False
    )
    _, frozen_sh = shard_params(model, params, frozen, mesh)
    s8 = shard_generic_packed_state(pack_generic_state(model, params), mesh)
    ep8 = make_generic_packed_spmd_epoch_fn(
        model, mesh, lr, reg, data.num_items, steps, batch
    )

    for e in range(3):
        k = jax.random.fold_in(key, e)
        s1, l1 = ep1(s1, frozen, k, *args)
        s8, l8 = ep8(s8, frozen_sh, k, *args)
        np.testing.assert_allclose(float(l8), float(l1), rtol=2e-4)

    spec = model.packed_spec()
    p1 = unpack_generic_params(s1, spec)
    p8 = unpack_generic_params(s8, spec)
    for name in ("Gu", "Tus", "Tuc", "Tue", "Tut", "Gi", "Bi"):
        got = np.asarray(p8[name])[: np.asarray(p1[name]).shape[0]]
        np.testing.assert_allclose(
            got, np.asarray(p1[name]), rtol=3e-4, atol=1e-5, err_msg=name,
        )
    # dense projections: Adam's 1/sqrt(v) amplifies reduction-order noise
    # on near-zero params (the [D,1] Bp* vectors), so atol is a touch wider
    for name in ("Es", "Bps", "Ec", "Bpc", "Bpe", "Et", "Bpt"):
        np.testing.assert_allclose(
            np.asarray(p8[name]), np.asarray(p1[name]),
            rtol=3e-4, atol=5e-5, err_msg=name,
        )
    # the deep CNN tower cannot be compared per-entry: its per-entry
    # grads are tiny (~1e-6), and Adam's first-step update is lr*sign(g),
    # so entries whose true gradient sits below reduction-order noise take
    # lr-sized coin-flip steps that differ between the two engines (the
    # conv biases random-walk up to ~11*lr over 27 steps) — while the
    # LOSS tracks to 6 digits, because those dimensions carry no signal.
    # The meaningful witnesses are the per-epoch loss equality above and
    # FUNCTIONAL equivalence of the trained models: scores within float
    # noise and identical top-k rankings.
    p8_trim = {
        k_: (np.asarray(v)[:30] if k_ in ("Gi", "Bi") else v)
        for k_, v in p8.items()
    }
    x1 = np.asarray(model.predict_all(p1, frozen))
    x8 = np.asarray(model.predict_all(p8_trim, frozen))
    np.testing.assert_allclose(x8, x1, atol=5e-3, rtol=0)
    np.testing.assert_array_equal(
        np.argsort(-x1, axis=1)[:, :5], np.argsort(-x8, axis=1)[:, :5]
    )


def test_generic_packed_spmd_derived_pairs_matches_materialized():
    """train_pairs=None (derived-pairs capacity mode, data/sampler.py) under
    the mesh: the sampler runs in plain jit OUTSIDE shard_map, so deriving
    the pair list from padded_pos must leave the sharded epoch bit-identical
    to the materialized-pairs run — on every device's table shard."""
    from fashionvisualexpl_tpu.data.interactions import Interactions
    from fashionvisualexpl_tpu.data.sampler import derived_pairs_ok
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_generic_packed_spmd_epoch_fn, shard_generic_packed_state,
    )
    from fashionvisualexpl_tpu.train.packed_generic import pack_generic_state

    rng = np.random.default_rng(29)
    training = [
        sorted(rng.choice(32, size=7, replace=False).tolist())
        for _ in range(24)
    ]
    test = [[int(rng.integers(32))] for _ in range(24)]
    data = Interactions.from_lists(training, test, 32)
    assert derived_pairs_ok(data.train_pairs, data.padded_pos)

    mesh = make_mesh(data=2, model=4)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    batch = 16
    steps = data.steps_per_epoch(batch)
    params, frozen = model.init(jax.random.PRNGKey(1))
    pos_d = jnp.asarray(data.padded_pos)
    cnt_d = jnp.asarray(data.pos_counts)
    key = jax.random.PRNGKey(3)

    outs = {}
    for label, pairs_arg in (
        ("pairs", jnp.asarray(data.train_pairs)), ("derived", None)
    ):
        st = shard_generic_packed_state(
            pack_generic_state(model, params), mesh
        )
        ep = make_generic_packed_spmd_epoch_fn(
            model, mesh, 0.01, 0.01, data.num_items, steps, batch
        )
        losses = []
        for e in range(2):
            st, l = ep(st, frozen, jax.random.fold_in(key, e),
                       pairs_arg, pos_d, cnt_d)
            losses.append(float(l))
        outs[label] = (losses, np.asarray(st.user_pmv),
                       np.asarray(st.item_pmv))

    assert outs["pairs"][0] == outs["derived"][0]
    np.testing.assert_array_equal(outs["pairs"][1], outs["derived"][1])
    np.testing.assert_array_equal(outs["pairs"][2], outs["derived"][2])
