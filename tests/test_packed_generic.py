"""Generic packed engine (train/packed_generic.py) parity:

- for BPRMF/VBPR/GradFashion it must reproduce the specialized packed steps
  (train/packed.py) exactly — same layout, same ops;
- for CompVBPR/AttentiveFashion (dense towers in `dense`) it must match the
  generic dense path when every row is touched every step (LazyAdam == dense
  Adam under full coverage);
- the shared fit() loop must run it end-to-end via train_path='packed'.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.train_state import (
    apply_gradients, create_train_state, tf_parity_adam,
)
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.train.packed_generic import (
    make_generic_packed_step, pack_generic_state, unpack_generic_params,
)


def _random_batches(rng, U, I, B, n, full_coverage=False):
    for _ in range(n):
        if full_coverage:
            u = np.concatenate([np.arange(U), rng.integers(0, U, B - U)])
            p = np.concatenate([np.arange(I), rng.integers(0, I, B - I)])
        else:
            u = rng.integers(0, U, B)
            p = rng.integers(0, I, B)
        n_ = rng.integers(0, I, B)
        yield (
            jnp.asarray(u, jnp.int32),
            jnp.asarray(p, jnp.int32),
            jnp.asarray(n_, jnp.int32),
        )


def test_generic_matches_specialized_bprmf():
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.packed import (
        make_packed_bprmf_step, pack_bprmf_state,
    )

    U, I, K = 30, 40, 8
    model = BPRMF(U, I, embed_k=K)
    lr, reg = 0.02, 0.01
    params, frozen = model.init(jax.random.PRNGKey(0))

    spec_state = pack_bprmf_state(params)
    gen_state = pack_generic_state(model, params)
    spec_step = jax.jit(make_packed_bprmf_step(model, lr, reg))
    gen_step = jax.jit(make_generic_packed_step(model, lr, reg))

    rng = np.random.default_rng(3)
    for u, p, n in _random_batches(rng, U, I, 16, 8):
        spec_state, sl = spec_step(spec_state, (u, p, n))
        gen_state, gl = gen_step(gen_state, (frozen, (u, p, n), None))
        np.testing.assert_allclose(float(gl), float(sl), rtol=1e-6)

    # the generic layout appends the LazyAdam tau as a final fp32 column
    np.testing.assert_array_equal(
        np.asarray(gen_state.user_pmv)[:, :-1],
        np.asarray(spec_state.user_pmv),
    )
    np.testing.assert_array_equal(
        np.asarray(gen_state.item_pmv)[:, :-1],
        np.asarray(spec_state.item_pmv),
    )
    np.testing.assert_array_equal(
        np.asarray(gen_state.item_pmv)[:, -1].astype(np.int32),
        np.asarray(spec_state.tau_i),
    )


def test_generic_matches_specialized_vbpr():
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.packed import (
        make_packed_vbpr_step, pack_vbpr_state,
    )

    U, I, K, D, Fd = 25, 35, 6, 4, 9
    feats = synthetic_features(I, Fd, seed=1)
    model = VBPR(U, I, feats, embed_k=K, embed_d=D)
    lr, reg = 0.02, 0.01
    params, frozen = model.init(jax.random.PRNGKey(0))

    spec_state = pack_vbpr_state(params)
    gen_state = pack_generic_state(model, params)
    spec_step = jax.jit(make_packed_vbpr_step(model, lr, reg))
    gen_step = jax.jit(make_generic_packed_step(model, lr, reg))

    F = frozen["F"]
    rng = np.random.default_rng(7)
    for u, p, n in _random_batches(rng, U, I, 12, 6):
        spec_state, sl = spec_step(spec_state, (F, (u, p, n)))
        gen_state, gl = gen_step(gen_state, (frozen, (u, p, n), None))
        np.testing.assert_allclose(float(gl), float(sl), rtol=1e-6)

    np.testing.assert_allclose(
        np.asarray(gen_state.user_pmv)[:, :-1],
        np.asarray(spec_state.user_pmv),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(gen_state.item_pmv)[:, :-1],
        np.asarray(spec_state.item_pmv),
        rtol=1e-6, atol=1e-8,
    )
    for name in ("E", "Bp"):
        np.testing.assert_allclose(
            np.asarray(gen_state.dense[name][0]),
            np.asarray(spec_state.dense[name][0]),
            rtol=1e-6, atol=1e-8, err_msg=name,
        )


def test_generic_matches_specialized_grad_fashion():
    from fashionvisualexpl_tpu.models.grad_fashion import GradFashion
    from fashionvisualexpl_tpu.train.packed import (
        make_packed_grad_fashion_step, pack_grad_fashion_state,
    )

    U, I, K, D = 20, 30, 5, 3
    color = synthetic_features(I, 7, seed=2)
    edges = synthetic_features(I, 9, seed=3)
    model = GradFashion(U, I, color, edges, embed_k=K, embed_d=D,
                        embed_color=4, embed_edges=4)
    lr, reg = 0.02, 0.01
    params, frozen = model.init(jax.random.PRNGKey(0))

    spec_state = pack_grad_fashion_state(params)
    gen_state = pack_generic_state(model, params)
    spec_step = jax.jit(make_packed_grad_fashion_step(model, lr, reg))
    gen_step = jax.jit(make_generic_packed_step(model, lr, reg))

    Fc, Fe = frozen["Fc"], frozen["Fe"]
    rng = np.random.default_rng(5)
    for u, p, n in _random_batches(rng, U, I, 12, 6):
        spec_state, sl = spec_step(spec_state, ((Fc, Fe), (u, p, n)))
        gen_state, gl = gen_step(gen_state, (frozen, (u, p, n), None))
        np.testing.assert_allclose(float(gl), float(sl), rtol=1e-6)

    np.testing.assert_allclose(
        np.asarray(gen_state.user_pmv)[:, :-1],
        np.asarray(spec_state.user_pmv),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(gen_state.item_pmv)[:, :-1],
        np.asarray(spec_state.item_pmv),
        rtol=1e-6, atol=1e-8,
    )


def _full_coverage_parity(model, frozen, params, lr, reg, B, steps, seed):
    """Packed-generic vs dense-generic equality when every row is touched
    every step (LazyAdam == dense Adam for touched rows)."""
    U = model.num_users
    I = model.num_items
    tx = tf_parity_adam(lr)
    dense_state = create_train_state(params, tx)
    gen_state = pack_generic_state(model, params)
    gen_step = jax.jit(make_generic_packed_step(model, lr, reg))

    @jax.jit
    def dense_step(st, batch):
        u, p, n = batch

        def loss_fn(prm):
            return model.loss(prm, frozen, u, p, n, reg)

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return apply_gradients(st, grads, tx), loss

    rng = np.random.default_rng(seed)
    for u, p, n in _random_batches(rng, U, I, B, steps, full_coverage=True):
        dense_state, dl = dense_step(dense_state, (u, p, n))
        gen_state, gl = gen_step(gen_state, (frozen, (u, p, n), None))
        np.testing.assert_allclose(float(gl), float(dl), rtol=1e-6)

    got = unpack_generic_params(gen_state, model.packed_spec())
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    want = dense_state.params
    for path, leaf in flat_got:
        want_leaf = want
        for k in path:
            want_leaf = want_leaf[k.key if hasattr(k, "key") else k.idx]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want_leaf),
            rtol=2e-5, atol=1e-5, err_msg=str(path),
        )


@pytest.mark.slow
def test_generic_comp_vbpr_matches_dense_full_coverage():
    from fashionvisualexpl_tpu.models.comp_vbpr import CompVBPR

    U, I = 6, 8
    model = CompVBPR(
        U, I,
        semantic_features=synthetic_features(I, 7, seed=1),
        color_features=synthetic_features(I, 5, seed=2),
        edge_images=np.asarray(
            np.random.default_rng(3).random((I, 8, 8, 1)), np.float32
        ),
        texture_features=synthetic_features(I, 6, seed=4),
        embed_k=5, embed_d=3,
    )
    params, frozen = model.init(jax.random.PRNGKey(0))
    _full_coverage_parity(model, frozen, params, 0.02, 0.01, 16, 4, seed=11)


def test_generic_attentive_matches_dense_full_coverage():
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion

    U, I = 6, 8
    model = AttentiveFashion(
        U, I,
        color_features=synthetic_features(I, 6, seed=1),
        edge_images=np.asarray(
            np.random.default_rng(2).random((I, 8, 8, 1)), np.float32
        ),
        class_features=np.eye(I, 5, dtype=np.float32),
        embed_k=4, attention_layers=(4, 1), encoder_hidden=8,
        conv_filters=4,
    )
    params, frozen = model.init(jax.random.PRNGKey(0))
    _full_coverage_parity(model, frozen, params, 0.02, 0.01, 16, 4, seed=13)


def test_generic_acf_matches_dense_full_coverage():
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.models.acf import ACF

    U, I = 6, 8
    data = synthetic_interactions(U, I, interactions_per_user=4, seed=0)
    spat = np.asarray(
        np.random.default_rng(9).normal(size=(I, 3, 5)), np.float32
    )
    model = ACF(
        U, I, spat, data, embed_k=5,
        layers_component=(4, 1), layers_item=(4, 1), max_user_pos=4,
    )
    params, frozen = model.init(jax.random.PRNGKey(0))
    _full_coverage_parity(model, frozen, params, 0.02, 0.01, 16, 4, seed=17)


def test_fit_packed_acf():
    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.eval.evaluator import Evaluator
    from fashionvisualexpl_tpu.models.acf import ACF
    from fashionvisualexpl_tpu.train.trainer import fit

    data = synthetic_interactions(24, 30, interactions_per_user=6, seed=0)
    I = data.num_items
    spat = np.asarray(
        np.random.default_rng(4).normal(size=(I, 3, 6)), np.float32
    )
    model = ACF(
        data.num_users, I, spat, data, embed_k=6,
        layers_component=(4, 1), layers_item=(4, 1), max_user_pos=6,
    )
    cfg = TrainConfig(batch_size=24, epochs=4, lr=0.01, reg=0.001,
                      top_k=5, train_path="packed", eval_every=4)
    ev = Evaluator(model, data, k=5, user_block=32)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    history = extra["history"]
    assert history[-1].loss < history[0].loss
    assert results
    s = model.score(state.params, frozen, jnp.asarray([0, 1]),
                    jnp.asarray([2, 3]))
    assert s.shape == (2,)


@pytest.mark.slow
def test_fit_packed_comp_vbpr_and_attentive():
    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.eval.evaluator import Evaluator
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion
    from fashionvisualexpl_tpu.models.comp_vbpr import CompVBPR
    from fashionvisualexpl_tpu.train.trainer import fit

    data = synthetic_interactions(24, 30, interactions_per_user=6, seed=0)
    I = data.num_items
    edge_imgs = np.asarray(
        np.random.default_rng(5).random((I, 8, 8, 1)), np.float32
    )
    for model in (
        CompVBPR(
            data.num_users, I,
            semantic_features=synthetic_features(I, 7, seed=1),
            color_features=synthetic_features(I, 5, seed=2),
            edge_images=edge_imgs,
            texture_features=synthetic_features(I, 6, seed=4),
            embed_k=6, embed_d=3,
        ),
        AttentiveFashion(
            data.num_users, I,
            color_features=synthetic_features(I, 6, seed=1),
            edge_images=edge_imgs,
            class_features=np.eye(I, 5, dtype=np.float32),
            embed_k=6, attention_layers=(4, 1), encoder_hidden=8,
            conv_filters=4,
        ),
    ):
        # lr modest: dropout is live on this path (per-step keys) and the
        # CNN tower diverges at BPR-table learning rates
        cfg = TrainConfig(batch_size=24, epochs=4, lr=0.01, reg=0.001,
                          top_k=5, train_path="packed", eval_every=4)
        ev = Evaluator(model, data, k=5, user_block=32)
        state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
        history = extra["history"]
        assert history[-1].loss < history[0].loss, model.name
        assert results, model.name
        s = model.score(state.params, frozen, jnp.asarray([0, 1]),
                        jnp.asarray([2, 3]))
        assert s.shape == (2,)


def test_generic_packed_checkpoint_roundtrip(tmp_path):
    from fashionvisualexpl_tpu.core.checkpoint import CheckpointManager
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.packed_generic import (
        GenericPackedTrainState,
    )

    model = BPRMF(10, 12, embed_k=4)
    params, _ = model.init(jax.random.PRNGKey(0))
    spec = model.packed_spec()
    state = GenericPackedTrainState(pack_generic_state(model, params), spec)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state)
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    template = GenericPackedTrainState(
        pack_generic_state(
            model, {k: jnp.zeros_like(v) for k, v in params.items()}
        ),
        spec,
    )
    restored = mgr2.restore(template)
    assert int(mgr2.latest_step()) == 3
    for k in ("Gu", "Gi", "Bi"):
        np.testing.assert_array_equal(
            np.asarray(restored.params[k]), np.asarray(state.params[k]), k
        )


def _fused_vs_unfused(model, params, frozen, lr=0.02, reg=0.01, B=12,
                      steps=6, seed=21):
    """fused_frozen must be value-identical to the unfused step: the frozen
    columns carry the same bits the separate gather would fetch."""
    state_u = pack_generic_state(model, params)
    state_f = pack_generic_state(model, params, frozen=frozen)
    step_u = jax.jit(make_generic_packed_step(model, lr, reg))
    step_f = jax.jit(
        make_generic_packed_step(model, lr, reg, fused_frozen=True)
    )

    spec = model.packed_spec()
    Wi = sum(w for _, w in spec.item_tables)
    F0 = 3 * Wi + 3 * len(spec.item_scalars)
    assert state_f.item_pmv.shape[1] == F0 + sum(
        w for _, w in spec.frozen_item_tables
    ) + 1  # + the tau column

    rng = np.random.default_rng(seed)
    for u, p, n in _random_batches(rng, model.num_users, model.num_items,
                                   B, steps):
        state_u, lu = step_u(state_u, (frozen, (u, p, n), None))
        state_f, lf = step_f(state_f, (frozen, (u, p, n), None))
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lu))

    np.testing.assert_array_equal(
        np.asarray(state_f.user_pmv), np.asarray(state_u.user_pmv)
    )
    np.testing.assert_array_equal(
        np.asarray(state_f.item_pmv)[:, :F0],
        np.asarray(state_u.item_pmv)[:, :F0],
    )
    for name in state_u.dense:
        np.testing.assert_array_equal(
            np.asarray(jnp.concatenate([
                x.reshape(-1)
                for x in jax.tree_util.tree_leaves(state_f.dense[name][0])
            ])),
            np.asarray(jnp.concatenate([
                x.reshape(-1)
                for x in jax.tree_util.tree_leaves(state_u.dense[name][0])
            ])),
            err_msg=name,
        )
    # frozen columns pass through updates untouched
    packed_cols = np.asarray(state_f.item_pmv)[:, F0:-1]
    off = 0
    for name, w in spec.frozen_item_tables:
        want = np.asarray(frozen[name]).reshape(model.num_items, -1)
        np.testing.assert_array_equal(packed_cols[:, off:off + w], want, name)
        off += w


def test_fused_frozen_vbpr():
    from fashionvisualexpl_tpu.models.vbpr import VBPR

    U, I = 25, 35
    model = VBPR(U, I, synthetic_features(I, 9, seed=1), embed_k=6, embed_d=4)
    params, frozen = model.init(jax.random.PRNGKey(0))
    _fused_vs_unfused(model, params, frozen)


def test_fused_frozen_grad_fashion():
    from fashionvisualexpl_tpu.models.grad_fashion import GradFashion

    U, I = 20, 30
    model = GradFashion(
        U, I, synthetic_features(I, 7, seed=2), synthetic_features(I, 9, seed=3),
        embed_k=5, embed_d=3, embed_color=4, embed_edges=4,
    )
    params, frozen = model.init(jax.random.PRNGKey(0))
    _fused_vs_unfused(model, params, frozen)


def test_fused_frozen_acf():
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.models.acf import ACF

    U, I = 12, 16
    data = synthetic_interactions(U, I, interactions_per_user=4, seed=0)
    spat = np.asarray(
        np.random.default_rng(9).normal(size=(I, 3, 5)), np.float32
    )
    model = ACF(U, I, spat, data, embed_k=5,
                layers_component=(4, 1), layers_item=(4, 1), max_user_pos=4)
    params, frozen = model.init(jax.random.PRNGKey(0))
    _fused_vs_unfused(model, params, frozen)


def test_trainer_fused_frozen_matches_unfused():
    """Trainer-level: TrainConfig.fused_frozen (default on for models that
    declare frozen_item_tables) must not change the trajectory."""
    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.trainer import Trainer

    data = synthetic_interactions(20, 24, interactions_per_user=5, seed=3)
    model = VBPR(20, 24, synthetic_features(24, 8, seed=1),
                 embed_k=6, embed_d=3)
    losses = {}
    params = {}
    for fused in (True, False):
        cfg = TrainConfig(batch_size=16, epochs=1, lr=0.01, reg=0.001,
                          train_path="packed", fused_frozen=fused)
        trainer = Trainer(model, data, cfg)
        assert trainer._fused_frozen is fused
        state, frozen = trainer.init_state()
        key = jax.random.PRNGKey(7)
        ls = []
        for e in range(3):
            state, loss = trainer.run_epoch(
                state, frozen, jax.random.fold_in(key, e)
            )
            ls.append(float(loss))
        losses[fused] = ls
        params[fused] = jax.tree_util.tree_map(np.asarray, state.params)
    assert losses[True] == losses[False]
    for k in params[True]:
        np.testing.assert_array_equal(params[True][k], params[False][k], k)
