"""Momentum catch-up for LazyAdam (train/packed.py::_momentum_catchup).

Plain LazyAdam drops the momentum tail dense Adam applies to untouched
rows — measured as a real convergence cost (BASELINE.md round 4).  The
catch-up applies that tail in closed form on touch.  Pins:

- dt=1 (touched every step) => catch-up is a no-op, bit-equal to plain;
- a row touched every k-th step under catch-up tracks dense Adam's
  trajectory far closer than plain LazyAdam does;
- the engine option threads through and trains.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.train.fast import B1, B2, EPS
from fashionvisualexpl_tpu.train.packed import _lazy_rows


def dense_adam_steps(p, m, v, grads, lr):
    """Reference dense Adam applied EVERY step (grads may be zero)."""
    t = 0
    for g in grads:
        t += 1
        m = B1 * m + (1 - B1) * g
        v = B2 * v + (1 - B2) * g * g
        m_hat = m / (1 - B1 ** t)
        v_hat = v / (1 - B2 ** t)
        p = p - lr * m_hat / (np.sqrt(v_hat) + EPS)
    return p


def lazy_steps(p0, touch_grads, lr, catchup):
    """LazyAdam touched only at the steps where touch_grads[t] is not
    None; global step counter advances every step."""
    rows = jnp.concatenate([
        jnp.asarray(p0, jnp.float32)[None, :],
        jnp.zeros((1, 2 * len(p0)), jnp.float32),
    ], axis=1)
    tau = 0
    for t, g in enumerate(touch_grads, start=1):
        if g is None:
            continue
        dt = jnp.asarray([[float(t - tau)]])
        rows = _lazy_rows(rows, jnp.asarray(g, jnp.float32)[None, :],
                          dt, float(t), lr, catchup=catchup)
        tau = t
    return np.asarray(rows[0, : len(p0)])


def test_catchup_noop_when_touched_every_step():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=3).astype(np.float32)
    grads = [rng.normal(size=3).astype(np.float32) for _ in range(6)]
    a = lazy_steps(p0, grads, 0.01, catchup=False)
    b = lazy_steps(p0, grads, 0.01, catchup=True)
    np.testing.assert_array_equal(a, b)


def test_catchup_tracks_dense_adam_on_sparse_touches():
    """One gradient event, then a long gap: dense Adam keeps pushing the
    row ~1/(1-B1) more update mass via momentum.  Catch-up must recover
    most of it; plain LazyAdam misses it entirely."""
    lr = 0.01
    p0 = np.zeros(1, np.float32)
    g = np.ones(1, np.float32)
    gap = 30
    # dense: real gradient at step 1, zero gradients after
    dense = dense_adam_steps(p0.copy(), 0.0, 0.0,
                             [g] + [np.zeros(1)] * gap + [g], lr)
    seq = [g] + [None] * gap + [g]
    plain = lazy_steps(p0, seq, lr, catchup=False)
    catch = lazy_steps(p0, seq, lr, catchup=True)
    err_plain = abs(float(plain[0] - dense[0]))
    err_catch = abs(float(catch[0] - dense[0]))
    assert err_catch < 0.35 * err_plain, (err_plain, err_catch)
    # and the tail mass is in the right DIRECTION (more negative p)
    assert catch[0] < plain[0]


def test_engine_lazy_catchup_trains():
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
    )

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    model = BPRMF(24, 30, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(1))
    state = pack_generic_state(model, params)
    ep = make_generic_packed_epoch_fn(
        model, 0.05, 0.001, 30, data.steps_per_epoch(16), 16,
        with_replacement=False, lazy_catchup=True,
    )
    args = (jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
            jnp.asarray(data.pos_counts))
    losses = []
    for e in range(4):
        state, loss = ep(state, frozen,
                         jax.random.fold_in(jax.random.PRNGKey(0), e), *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(np.asarray(losses)).all()


def test_engine_catchup_bf16_moments_compose():
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
    )

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    model = BPRMF(24, 30, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(1))
    state = pack_generic_state(model, params, moment_dtype="bfloat16")
    ep = make_generic_packed_epoch_fn(
        model, 0.05, 0.001, 30, data.steps_per_epoch(16), 16,
        with_replacement=False, lazy_catchup=True,
        moment_dtype="bfloat16",
    )
    args = (jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
            jnp.asarray(data.pos_counts))
    for e in range(3):
        state, loss = ep(state, frozen,
                         jax.random.fold_in(jax.random.PRNGKey(0), e), *args)
    assert np.isfinite(float(loss))
