"""SPMD path: sharded training must match the single-device path numerically
(SURVEY.md §4 distributed criterion — virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashionvisualexpl_tpu.core.mesh import make_mesh
from fashionvisualexpl_tpu.core.train_state import create_train_state, tf_parity_adam
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.models.vbpr import VBPR
from fashionvisualexpl_tpu.parallel.spmd import (
    collective_take,
    make_spmd_train_step,
    pad_rows_to_multiple,
    shard_params,
)


def _batches(rng, data, n_steps, batch):
    out = []
    for _ in range(n_steps):
        idx = rng.integers(0, data.num_train, batch)
        users = data.train_pairs[idx, 0]
        pos = data.train_pairs[idx, 1]
        neg = rng.integers(0, data.num_items, batch).astype(np.int32)
        # crude but valid negatives for an equivalence test: resample clashes
        for b in range(batch):
            while neg[b] in data.training_list[users[b]]:
                neg[b] = rng.integers(0, data.num_items)
        out.append((users, pos, neg))
    return out


def _run_reference(model, data, batches, reg, lr, rng_key):
    tx = tf_parity_adam(lr)
    params, frozen = model.init(rng_key)
    state = create_train_state(params, tx)
    losses = []
    for u, p, n in batches:
        def loss_fn(prm):
            return model.loss(prm, frozen, jnp.asarray(u), jnp.asarray(p),
                              jnp.asarray(n), reg)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        from fashionvisualexpl_tpu.core.train_state import apply_gradients
        state = apply_gradients(state, grads, tx)
        losses.append(float(loss))
    return state, losses


def _run_spmd(model, data, batches, reg, lr, rng_key, mesh):
    tx = tf_parity_adam(lr)
    params, frozen = model.init(rng_key)
    params, frozen = shard_params(model, params, frozen, mesh)
    state = create_train_state(params, tx)
    step = make_spmd_train_step(model, mesh, tx, reg)
    losses = []
    for u, p, n in batches:
        state, loss = step(
            state, frozen, jnp.asarray(u), jnp.asarray(p), jnp.asarray(n)
        )
        losses.append(float(loss))
    return state, losses


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_bprmf_spmd_matches_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    data = synthetic_interactions(24, 40, interactions_per_user=8, seed=0)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    rng = np.random.default_rng(0)
    batches = _batches(rng, data, n_steps=4, batch=16)
    key = jax.random.PRNGKey(0)

    ref_state, ref_losses = _run_reference(model, data, batches, 0.01, 0.01, key)
    spmd_state, spmd_losses = _run_spmd(model, data, batches, 0.01, 0.01, key, mesh)

    np.testing.assert_allclose(ref_losses, spmd_losses, rtol=2e-4)
    for k in ("Bi", "Gu", "Gi"):
        ref = np.asarray(ref_state.params[k])
        got = np.asarray(spmd_state.params[k])[: ref.shape[0]]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)


def test_vbpr_spmd_matches_single_device():
    mesh = make_mesh(data=2, model=4)
    data = synthetic_interactions(16, 24, interactions_per_user=6, seed=1)
    feats = synthetic_features(data.num_items, 12, seed=2)
    model = VBPR(data.num_users, data.num_items, feats, embed_k=8, embed_d=4)
    rng = np.random.default_rng(1)
    batches = _batches(rng, data, n_steps=3, batch=8)
    key = jax.random.PRNGKey(1)

    ref_state, ref_losses = _run_reference(model, data, batches, 0.02, 0.01, key)
    spmd_state, spmd_losses = _run_spmd(model, data, batches, 0.02, 0.01, key, mesh)

    np.testing.assert_allclose(ref_losses, spmd_losses, rtol=2e-4)
    for k in ("Bi", "Gu", "Gi", "Tu", "E", "Bp"):
        ref = np.asarray(ref_state.params[k])
        got = np.asarray(spmd_state.params[k])[: ref.shape[0]]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)


def test_collective_take_matches_plain_gather():
    mesh = make_mesh(data=1, model=8)
    table = np.arange(64, dtype=np.float32).reshape(16, 4)
    ids = np.array([0, 3, 15, 7, 7, 12], dtype=np.int32)

    take = collective_take(("T",))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        lambda t, i: take("T", t, i),
        mesh=mesh,
        in_specs=(P("model", None), P()),
        out_specs=P(),
        check_vma=False,
    )
    got = np.asarray(fn(jnp.asarray(table), jnp.asarray(ids)))
    np.testing.assert_allclose(got, table[ids])


@pytest.mark.parametrize("batch", [4, 8, 16])
def test_collective_take_4d_image_table(batch):
    """Regression: the ownership mask must broadcast over ALL trailing
    table dims.  For a 4-D [rows, H, W, C] image table, ok[..., None]
    aligned the mask with the W axis instead of the batch axis — silently
    wrong when batch == W (the round-4 comp_vbpr mesh test geometry), a
    broadcast error otherwise."""
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(0)
    table = rng.normal(size=(32, 8, 8, 1)).astype(np.float32)
    ids = rng.integers(0, 32, size=batch).astype(np.int32)

    take = collective_take(("T",))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        lambda t, i: take("T", t, i),
        mesh=mesh,
        in_specs=(P("model", None, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    got = np.asarray(fn(jnp.asarray(table), jnp.asarray(ids)))
    np.testing.assert_array_equal(got, table[ids])

    from fashionvisualexpl_tpu.parallel.fast_spmd import _sharded_take

    fn2 = shard_map(
        _sharded_take,
        mesh=mesh,
        in_specs=(P("model", None, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    got2 = np.asarray(fn2(jnp.asarray(table), jnp.asarray(ids)))
    np.testing.assert_array_equal(got2, table[ids])


def test_pad_rows():
    a = np.ones((10, 3))
    p = pad_rows_to_multiple(a, 4)
    assert p.shape == (12, 3)
    assert p[10:].sum() == 0
    assert pad_rows_to_multiple(a, 5).shape == (10, 3)


def test_spmd_epoch_fn_runs_and_learns():
    """Full sharded epoch (sampling + scan of shard_mapped steps) executes
    and reduces the loss over epochs on the 8-device mesh."""
    from fashionvisualexpl_tpu.parallel.spmd import make_spmd_epoch_fn

    mesh = make_mesh(data=4, model=2)
    data = synthetic_interactions(32, 48, interactions_per_user=8, seed=7)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    tx = tf_parity_adam(0.02)
    params, frozen = model.init(jax.random.PRNGKey(0))
    params, frozen = shard_params(model, params, frozen, mesh)
    state = create_train_state(params, tx)

    steps = data.steps_per_epoch(16)
    epoch = make_spmd_epoch_fn(
        model, mesh, tx, 0.0, data.num_items, steps, 16
    )
    args = (
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
    )
    key = jax.random.PRNGKey(1)
    losses = []
    for e in range(8):
        state, loss = epoch(state, frozen, jax.random.fold_in(key, e), *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_trainer_with_mesh_matches_single_device():
    """Trainer(cfg.mesh=4x2) must reproduce the single-device trainer's
    epoch numerics (same sampling keys -> same batches -> same updates)."""
    from fashionvisualexpl_tpu.core.config import MeshConfig, TrainConfig
    from fashionvisualexpl_tpu.eval.evaluator import Evaluator
    from fashionvisualexpl_tpu.train.trainer import Trainer

    data = synthetic_interactions(24, 32, interactions_per_user=8, seed=9)
    cfg1 = TrainConfig(batch_size=16, epochs=1, lr=0.01, reg=0.01)
    cfg8 = cfg1.replace(mesh=MeshConfig(data=4, model=2))
    key = jax.random.PRNGKey(3)

    m1 = BPRMF(data.num_users, data.num_items, embed_k=8)
    t1 = Trainer(m1, data, cfg1)
    s1, f1 = t1.init_state()
    for e in range(3):
        s1, l1 = t1.run_epoch(s1, f1, jax.random.fold_in(key, e))

    m8 = BPRMF(data.num_users, data.num_items, embed_k=8)
    t8 = Trainer(m8, data, cfg8)
    s8, f8 = t8.init_state()
    for e in range(3):
        s8, l8 = t8.run_epoch(s8, f8, jax.random.fold_in(key, e))

    np.testing.assert_allclose(float(l8), float(l1), rtol=2e-4)
    for k in ("Bi", "Gu", "Gi"):
        ref = np.asarray(s1.params[k])
        got = np.asarray(s8.params[k])[: ref.shape[0]]
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=1e-5, err_msg=k)

    # eval over the sharded (row-padded) params drops pad items correctly
    ev = Evaluator(m8, data, k=5, user_block=8)
    metrics = ev.evaluate(s8.params, f8)
    ref_metrics = Evaluator(m1, data, k=5, user_block=8).evaluate(
        s1.params, f1
    )
    np.testing.assert_allclose(metrics["auc_t"], ref_metrics["auc_t"],
                               rtol=1e-3)
