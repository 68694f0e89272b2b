"""Packed-state fast path must match the unpacked LazyAdam path exactly
(same semantics, different memory layout)."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.train.fast import (
    init_lazy_state, make_fast_bprmf_step,
)
from fashionvisualexpl_tpu.train.packed import (
    make_packed_bprmf_step, pack_bprmf_state, unpack_bprmf_params,
)


def test_packed_matches_unpacked_lazy():
    U, I, K = 30, 40, 8
    model = BPRMF(U, I, embed_k=K)
    lr, reg = 0.02, 0.01
    params, _ = model.init(jax.random.PRNGKey(0))

    lazy_state = init_lazy_state(params, ("Gu", "Gi", "Bi"))
    packed_state = pack_bprmf_state(params)
    lazy_step = jax.jit(make_fast_bprmf_step(model, lr, reg, lazy=True))
    packed_step = jax.jit(make_packed_bprmf_step(model, lr, reg))

    rng = np.random.default_rng(3)
    for s in range(8):
        u = jnp.asarray(rng.integers(0, U, 16), jnp.int32)
        p = jnp.asarray(rng.integers(0, I, 16), jnp.int32)
        n = jnp.asarray(rng.integers(0, I, 16), jnp.int32)
        lazy_state, ll = lazy_step(lazy_state, (u, p, n))
        packed_state, pl_ = packed_step(packed_state, (u, p, n))
        np.testing.assert_allclose(float(pl_), float(ll), rtol=1e-6)

    got = unpack_bprmf_params(packed_state, K)
    for k in ("Bi", "Gu", "Gi"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(lazy_state.params[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(packed_state.tau_u), np.asarray(lazy_state.tau["Gu"])
    )
    np.testing.assert_array_equal(
        np.asarray(packed_state.tau_i), np.asarray(lazy_state.tau["Gi"])
    )


def test_packed_vbpr_matches_unpacked_lazy():
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.fast import make_fast_vbpr_step
    from fashionvisualexpl_tpu.train.packed import (
        make_packed_vbpr_step, pack_vbpr_state, unpack_vbpr_params,
    )

    U, I, K, D, Fd = 25, 35, 6, 4, 9
    feats = synthetic_features(I, Fd, seed=1)
    model = VBPR(U, I, feats, embed_k=K, embed_d=D)
    lr, reg = 0.02, 0.01
    params, frozen = model.init(jax.random.PRNGKey(0))

    lazy_state = init_lazy_state(params, ("Gu", "Gi", "Bi", "Tu"))
    packed_state = pack_vbpr_state(params)
    lazy_step = jax.jit(make_fast_vbpr_step(model, lr, reg, lazy=True))
    packed_step = jax.jit(make_packed_vbpr_step(model, lr, reg))

    F = frozen["F"]
    rng = np.random.default_rng(7)
    for s in range(6):
        u = jnp.asarray(rng.integers(0, U, 12), jnp.int32)
        p = jnp.asarray(rng.integers(0, I, 12), jnp.int32)
        n = jnp.asarray(rng.integers(0, I, 12), jnp.int32)
        lazy_state, ll = lazy_step(lazy_state, (F, (u, p, n)))
        packed_state, pl_ = packed_step(packed_state, (F, (u, p, n)))
        np.testing.assert_allclose(float(pl_), float(ll), rtol=1e-6)

    got = unpack_vbpr_params(packed_state, K, D)
    for k in ("Bi", "Gu", "Gi", "Tu", "E", "Bp"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(lazy_state.params[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )


def test_packed_grad_fashion_matches_generic_full_coverage():
    """With every user and item touched every step, LazyAdam == dense Adam
    exactly, so the packed GradFashion step must reproduce the generic path
    (model.loss + tf_parity_adam) to float32 accuracy."""
    from fashionvisualexpl_tpu.core.train_state import (
        apply_gradients, create_train_state, tf_parity_adam,
    )
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.grad_fashion import GradFashion
    from fashionvisualexpl_tpu.train.packed import (
        make_packed_grad_fashion_step, pack_grad_fashion_state,
        unpack_grad_fashion_params,
    )

    U, I, K, D = 6, 8, 5, 3
    dim_c, dim_e = 7, 9
    color = synthetic_features(I, dim_c, seed=2)
    edges = synthetic_features(I, dim_e, seed=3)
    model = GradFashion(U, I, color, edges, embed_k=K, embed_d=D,
                        embed_color=4, embed_edges=4)
    lr, reg = 0.02, 0.01
    params, frozen = model.init(jax.random.PRNGKey(0))

    tx = tf_parity_adam(lr)
    dense_state = create_train_state(params, tx)
    packed_state = pack_grad_fashion_state(params)
    packed_step = jax.jit(make_packed_grad_fashion_step(model, lr, reg))

    @jax.jit
    def dense_step(st, batch):
        u, p, n = batch

        def loss_fn(prm):
            return model.loss(prm, frozen, u, p, n, reg)

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return apply_gradients(st, grads, tx), loss

    Fc, Fe = frozen["Fc"], frozen["Fe"]
    rng = np.random.default_rng(11)
    B = 16
    for s in range(6):
        # full coverage: all users in u, all items in pos ∪ neg
        u = jnp.asarray(
            np.concatenate([np.arange(U), rng.integers(0, U, B - U)]),
            jnp.int32,
        )
        p = jnp.asarray(
            np.concatenate([np.arange(I), rng.integers(0, I, B - I)]),
            jnp.int32,
        )
        n = jnp.asarray(rng.integers(0, I, B), jnp.int32)
        dense_state, dl = dense_step(dense_state, (u, p, n))
        packed_state, pl_ = packed_step(
            packed_state, ((Fc, Fe), (u, p, n))
        )
        np.testing.assert_allclose(float(pl_), float(dl), rtol=1e-6)

    got = unpack_grad_fashion_params(packed_state, K, D)
    for k in ("Bi", "Gu", "Gi", "Tu", "E", "Bp", "Ec", "Ee"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(dense_state.params[k]),
            rtol=2e-5, atol=1e-6, err_msg=k,
        )


def test_fit_with_packed_grad_fashion():
    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.eval.evaluator import Evaluator
    from fashionvisualexpl_tpu.models.grad_fashion import GradFashion
    from fashionvisualexpl_tpu.train.trainer import fit

    data = synthetic_interactions(30, 40, interactions_per_user=8, seed=0)
    color = synthetic_features(40, 10, seed=1)
    edges = synthetic_features(40, 12, seed=2)
    model = GradFashion(data.num_users, data.num_items, color, edges,
                        embed_k=8, embed_d=4, embed_color=4, embed_edges=4)
    cfg = TrainConfig(batch_size=32, epochs=4, lr=0.05, reg=0.001,
                      top_k=5, train_path="packed", eval_every=2)
    ev = Evaluator(model, data, k=5, user_block=32)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    history = extra["history"]
    assert history[-1].loss < history[0].loss
    assert results, "eval ran"
    s = model.score(state.params, frozen, jnp.asarray([0, 1]),
                    jnp.asarray([2, 3]))
    assert s.shape == (2,)
    # the explanation engine runs off the unpacked params view
    attr = model.feature_attributions(
        state.params, frozen, 0, jnp.asarray([1, 2, 3])
    )
    assert attr.shape == (3, 2)


def test_fit_with_packed_train_path():
    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.eval.evaluator import Evaluator
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.trainer import fit

    data = synthetic_interactions(40, 50, interactions_per_user=8, seed=0)
    feats = synthetic_features(50, 12, seed=1)
    model = VBPR(data.num_users, data.num_items, feats, embed_k=8, embed_d=4)
    cfg = TrainConfig(batch_size=32, epochs=4, lr=0.05, reg=0.001,
                      top_k=5, train_path="packed", eval_every=2)
    ev = Evaluator(model, data, k=5, user_block=32)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    history = extra["history"]
    assert history[-1].loss < history[0].loss
    assert results, "eval ran"
    # params view is a standard dict usable by the model
    import jax.numpy as jnp
    s = model.score(state.params, frozen, jnp.asarray([0, 1]),
                    jnp.asarray([2, 3]))
    assert s.shape == (2,)


def test_packed_state_checkpoint_roundtrip(tmp_path):
    from fashionvisualexpl_tpu.core.checkpoint import CheckpointManager
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.packed import (
        PackedTrainState, pack_bprmf_state,
    )

    model = BPRMF(10, 12, embed_k=4)
    params, _ = model.init(jax.random.PRNGKey(0))
    state = PackedTrainState(pack_bprmf_state(params), "bprmf", 4, 0)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state)
    mgr.close() if hasattr(mgr, "close") else None

    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    template = PackedTrainState(
        pack_bprmf_state({k: jnp.zeros_like(v) for k, v in params.items()}),
        "bprmf", 4, 0,
    )
    restored = mgr2.restore(template)
    assert int(mgr2.latest_step()) == 3
    for k in ("Gu", "Gi", "Bi"):
        np.testing.assert_array_equal(
            np.asarray(restored.params[k]), np.asarray(state.params[k]), k
        )
