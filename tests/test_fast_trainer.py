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


def test_pallas_bpr_fast_step_matches_plain():
    """The Pallas-kernel-backed fast step must produce the same params as
    the autodiff-backed fast step (interpret-mode kernel on CPU)."""
    import fashionvisualexpl_tpu.train.fast as F

    data = synthetic_interactions(20, 30, interactions_per_user=6, seed=3)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    lr, reg = 0.01, 0.02
    params, _ = model.init(jax.random.PRNGKey(2))

    plain = init_fast_state(params)
    kern = init_fast_state(params)
    step_plain = jax.jit(F.make_fast_bprmf_step(model, lr, reg))
    from fashionvisualexpl_tpu.ops.bpr import bpr_triplet_loss as orig

    rng = np.random.default_rng(3)
    for _ in range(4):
        u = jnp.asarray(rng.integers(0, 20, 16), jnp.int32)
        p = jnp.asarray(rng.integers(0, 30, 16), jnp.int32)
        n = jnp.asarray(rng.integers(0, 30, 16), jnp.int32)
        plain, lp = step_plain(plain, (u, p, n))
        # replicate the pallas_bpr step with the interpret-mode kernel
        # (the production flag runs the compiled kernel, TPU-only)
        P = kern.params
        gu = jnp.take(P["Gu"], u, axis=0)
        gp_ = jnp.take(P["Gi"], p, axis=0)
        gn_ = jnp.take(P["Gi"], n, axis=0)
        bp_ = jnp.take(P["Bi"], p)
        bn_ = jnp.take(P["Bi"], n)
        pair_loss, vjp = jax.vjp(
            lambda *a: orig(*a, 16, True), gu, gp_, gn_, bp_, bn_
        )
        dgu, dgp, dgn, dbp, dbn = vjp(jnp.float32(1.0))
        dgu = dgu + 2.0 * reg * gu
        dgp = dgp + 2.0 * reg * gp_
        dgn = dgn + 2.0 * reg * gn_
        dbp = dbp + 2.0 * reg * bp_
        dbn = dbn + (2.0 * reg / 10.0) * bn_
        t = (kern.step + 1).astype(jnp.float32)
        B = 16
        new_p, new_m, new_v = dict(P), dict(kern.mu), dict(kern.nu)
        uids, g = F.compact_row_grads(u, dgu, B)
        new_p["Gu"], new_m["Gu"], new_v["Gu"] = F.sparse_adam_table(
            P["Gu"], kern.mu["Gu"], kern.nu["Gu"], uids, g, lr, t)
        ii = jnp.concatenate([p, n])
        uids, g = F.compact_row_grads(ii, jnp.concatenate([dgp, dgn]), 2 * B)
        new_p["Gi"], new_m["Gi"], new_v["Gi"] = F.sparse_adam_table(
            P["Gi"], kern.mu["Gi"], kern.nu["Gi"], uids, g, lr, t)
        uids, g = F.compact_row_grads(ii, jnp.concatenate([dbp, dbn]), 2 * B)
        new_p["Bi"], new_m["Bi"], new_v["Bi"] = F.sparse_adam_table(
            P["Bi"], kern.mu["Bi"], kern.nu["Bi"], uids, g, lr, t)
        kern = F.FastState(kern.step + 1, new_p, new_m, new_v)

    for k in ("Bi", "Gu", "Gi"):
        np.testing.assert_allclose(
            np.asarray(kern.params[k]), np.asarray(plain.params[k]),
            rtol=3e-4, atol=1e-6, err_msg=k,
        )


def test_lazy_adam_matches_sparse_when_all_rows_touched():
    """With every row touched every step (dt == 1 always), LazyAdam is
    EXACTLY the dense-semantics sparse path — params, moments, loss."""
    U, I, K = 4, 6, 3
    model = BPRMF(U, I, embed_k=K)
    lr, reg = 0.02, 0.01
    params, _ = model.init(jax.random.PRNGKey(1))
    from fashionvisualexpl_tpu.train.fast import init_lazy_state

    fast_state = init_fast_state(params)
    lazy_state = init_lazy_state(params, ("Gu", "Gi", "Bi"))
    fast_step = jax.jit(make_fast_bprmf_step(model, lr, reg))
    lazy_step = jax.jit(make_fast_bprmf_step(model, lr, reg, lazy=True))

    # batch covers all users; pos+neg together cover all items
    u = jnp.asarray([0, 1, 2, 3, 0, 1], jnp.int32)
    p = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    n = jnp.asarray([5, 4, 3, 2, 1, 0], jnp.int32)
    for _ in range(5):
        fast_state, fl = fast_step(fast_state, (u, p, n))
        lazy_state, ll = lazy_step(lazy_state, (u, p, n))
        np.testing.assert_allclose(float(ll), float(fl), rtol=1e-6)
    for k in ("Bi", "Gu", "Gi"):
        np.testing.assert_allclose(
            np.asarray(lazy_state.params[k]),
            np.asarray(fast_state.params[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
        np.testing.assert_allclose(
            np.asarray(lazy_state.mu[k]), np.asarray(fast_state.mu[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )


def test_lazy_adam_catchup_decay_and_untouched_rows():
    """Rows untouched for a gap get one catch-up decay b^dt on touch; rows
    never touched keep their parameters bit-exactly (LazyAdam semantics)."""
    from fashionvisualexpl_tpu.train.fast import (
        init_lazy_state, make_fast_bprmf_step,
    )

    U, I, K = 5, 8, 2
    model = BPRMF(U, I, embed_k=K)
    lr, reg = 0.1, 0.0
    params, _ = model.init(jax.random.PRNGKey(2))
    p0 = {k: np.asarray(v).copy() for k, v in params.items()}
    state = init_lazy_state(params, ("Gu", "Gi", "Bi"))
    step = jax.jit(make_fast_bprmf_step(model, lr, reg, lazy=True))

    # step 1 touches user 0 (items 0/1); steps 2,3 touch user 1 (items 2/3)
    batches = [
        ([0], [0], [1]),
        ([1], [2], [3]),
        ([1], [2], [3]),
        ([0], [0], [1]),  # step 4: user 0 returns after a 3-step gap
    ]
    mu_after_1 = None
    for i, (u, p, n) in enumerate(batches):
        b = tuple(jnp.asarray(x, jnp.int32) for x in (u, p, n))
        prev_mu0 = np.asarray(state.mu["Gu"][0]).copy()
        prev_tau0 = int(state.tau["Gu"][0])
        state, _ = step(state, b)
        if i == 3:
            # catch-up decay: m_4 = b1^(4-1) * m_1 + (1-b1) g_4
            t_now = 4
            dt = t_now - prev_tau0
            assert dt == 3
            g_part = np.asarray(state.mu["Gu"][0]) - prev_mu0 * 0.9 ** dt
            # the grad contribution must be (1-b1)*g, i.e. finite & nonzero
            assert np.all(np.isfinite(g_part)) and np.any(g_part != 0)
    # users 2..4 were never touched: params identical to init
    np.testing.assert_array_equal(np.asarray(state.params["Gu"][2:]),
                                  p0["Gu"][2:])
    # their tau never advanced
    assert np.all(np.asarray(state.tau["Gu"][2:]) == 0)


def test_lazy_vbpr_step_runs_and_matches_when_all_touched():
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.fast import (
        init_lazy_state, make_fast_vbpr_step,
    )

    U, I, K, D, Fd = 4, 6, 3, 2, 5
    feats = synthetic_features(I, Fd, seed=0)
    model = VBPR(U, I, feats, embed_k=K, embed_d=D)
    params, frozen = model.init(jax.random.PRNGKey(0))
    lr, reg = 0.02, 0.01

    from fashionvisualexpl_tpu.train.fast import make_fast_vbpr_step as mk
    fast_state = init_fast_state(params)
    lazy_state = init_lazy_state(params, ("Gu", "Gi", "Bi", "Tu"))
    fast_step = jax.jit(mk(model, lr, reg))
    lazy_step = jax.jit(mk(model, lr, reg, lazy=True))

    F = frozen["F"]
    u = jnp.asarray([0, 1, 2, 3, 0, 1], jnp.int32)
    p = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    n = jnp.asarray([5, 4, 3, 2, 1, 0], jnp.int32)
    for _ in range(4):
        fast_state, fl = fast_step(fast_state, (F, (u, p, n)))
        lazy_state, ll = lazy_step(lazy_state, (F, (u, p, n)))
        np.testing.assert_allclose(float(ll), float(fl), rtol=1e-6)
    for k in ("Bi", "Gu", "Gi", "Tu", "E", "Bp"):
        np.testing.assert_allclose(
            np.asarray(lazy_state.params[k]),
            np.asarray(fast_state.params[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
