"""Fast-path (compact-grad + sparse-apply Adam) must match the generic
dense-path trainer numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.core.train_state import (
    apply_gradients, create_train_state, tf_parity_adam,
)
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.train.fast import (
    FastState, compact_row_grads, init_fast_state, make_fast_bprmf_step,
)


def test_compact_row_grads():
    ids = jnp.asarray([3, 1, 3, 0, 1, 3], jnp.int32)
    g = jnp.arange(6, dtype=jnp.float32)[:, None] * jnp.ones((1, 2))
    uids, summed = compact_row_grads(ids, g, 6)
    got = {}
    for i, s in zip(np.asarray(uids), np.asarray(summed)):
        got[int(i)] = got.get(int(i), 0) + s[0]
    assert got[3] == 0 + 2 + 5
    assert got[1] == 1 + 4
    assert got[0] == 3


def test_fast_matches_dense_path():
    data = synthetic_interactions(30, 40, interactions_per_user=8, seed=0)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    lr, reg = 0.01, 0.01
    params, frozen = model.init(jax.random.PRNGKey(0))

    tx = tf_parity_adam(lr)
    dense_state = create_train_state(params, tx)
    fast_state = init_fast_state(params)
    fast_step = jax.jit(make_fast_bprmf_step(model, lr, reg))

    rng = np.random.default_rng(0)
    for s in range(6):
        u = jnp.asarray(rng.integers(0, 30, 16), jnp.int32)
        p = jnp.asarray(rng.integers(0, 40, 16), jnp.int32)
        n = jnp.asarray(rng.integers(0, 40, 16), jnp.int32)

        def loss_fn(prm):
            return model.loss(prm, frozen, u, p, n, reg)

        dl, grads = jax.value_and_grad(loss_fn)(dense_state.params)
        dense_state = apply_gradients(dense_state, grads, tx)
        fast_state, fl = fast_step(fast_state, (u, p, n))
        np.testing.assert_allclose(float(fl), float(dl), rtol=1e-5)

    for k in ("Bi", "Gu", "Gi"):
        np.testing.assert_allclose(
            np.asarray(fast_state.params[k]),
            np.asarray(dense_state.params[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_fast_vbpr_matches_dense_path():
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.fast import make_fast_vbpr_step

    data = synthetic_interactions(20, 30, interactions_per_user=6, seed=1)
    feats = synthetic_features(data.num_items, 10, seed=2)
    model = VBPR(data.num_users, data.num_items, feats, embed_k=8, embed_d=4)
    lr, reg = 0.01, 0.02
    params, frozen = model.init(jax.random.PRNGKey(1))

    tx = tf_parity_adam(lr)
    dense_state = create_train_state(params, tx)
    fast_state = init_fast_state(params)
    fast_step = jax.jit(make_fast_vbpr_step(model, lr, reg))

    rng = np.random.default_rng(1)
    for _ in range(5):
        u = jnp.asarray(rng.integers(0, 20, 8), jnp.int32)
        p = jnp.asarray(rng.integers(0, 30, 8), jnp.int32)
        n = jnp.asarray(rng.integers(0, 30, 8), jnp.int32)

        def loss_fn(prm):
            return model.loss(prm, frozen, u, p, n, reg)

        dl, grads = jax.value_and_grad(loss_fn)(dense_state.params)
        dense_state = apply_gradients(dense_state, grads, tx)
        fast_state, fl = fast_step(fast_state, (frozen["F"], (u, p, n)))
        np.testing.assert_allclose(float(fl), float(dl), rtol=1e-5)

    for k in ("Bi", "Gu", "Gi", "Tu", "E", "Bp"):
        np.testing.assert_allclose(
            np.asarray(fast_state.params[k]),
            np.asarray(dense_state.params[k]),
            rtol=3e-4, atol=1e-6, err_msg=k,
        )
