"""ACF: attention shapes/semantics, profile masking, end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.interactions import (
    Interactions,
    synthetic_interactions,
)
from fashionvisualexpl_tpu.eval.evaluator import Evaluator
from fashionvisualexpl_tpu.models.acf import ACF
from fashionvisualexpl_tpu.train.trainer import fit


def _make(U=15, I=20, S=4, C=6, K=8, seed=0, max_user_pos=5):
    data = synthetic_interactions(U, I, interactions_per_user=7, seed=seed)
    rng = np.random.default_rng(seed)
    spat = rng.normal(size=(I, S, C)).astype(np.float32)
    model = ACF(
        U, I, spat, data, embed_k=K,
        layers_component=(5, 1), layers_item=(5, 1),
        max_user_pos=max_user_pos, seed=seed,
    )
    return model, data


def test_profile_shapes_and_zero_pos_user():
    model, data = _make()
    # blank out one user's positives entirely
    model._pos_train[3] = 0
    model._cnt_train[3] = 0
    params, frozen = model.init(jax.random.PRNGKey(0))
    users = jnp.asarray([0, 3, 7])
    prof = np.asarray(model.user_profile(params, frozen, users))
    assert prof.shape == (3, model.embed_k)
    # user with no positives keeps the plain embedding
    np.testing.assert_allclose(prof[1], np.asarray(params["Gu"])[3], rtol=1e-6)
    # others differ from the plain embedding (attention adds Pi mass)
    assert not np.allclose(prof[0], np.asarray(params["Gu"])[0])


def test_padding_invariance():
    """Padded slots must not influence the profile: same user with
    max_user_pos larger than their count gives the same result."""
    model5, data = _make(max_user_pos=5)
    model9, _ = _make(max_user_pos=9)
    params, frozen5 = model5.init(jax.random.PRNGKey(0))
    _, frozen9 = model9.init(jax.random.PRNGKey(0))
    users = jnp.asarray([u for u in range(data.num_users)
                         if len(data.training_list[u]) <= 5])
    p5 = np.asarray(model5.user_profile(params, frozen5, users))
    p9 = np.asarray(model9.user_profile(params, frozen9, users))
    np.testing.assert_allclose(p5, p9, rtol=1e-5, atol=1e-6)


def test_predict_consistency():
    model, data = _make()
    params, frozen = model.init(jax.random.PRNGKey(1))
    full = np.asarray(model.predict_all(params, frozen))
    users = jnp.asarray([0, 6, 14])
    blk = np.asarray(model.predict_user_block(params, frozen, users))
    np.testing.assert_allclose(blk, full[np.asarray(users)], rtol=2e-5,
                               atol=1e-6)
    # pointwise score path (eval profile) agrees
    items = jnp.asarray([2, 9, 19])
    pw = np.asarray(
        model.score(params, frozen, users, items, train_only=False)
    )
    np.testing.assert_allclose(
        pw, full[np.asarray(users), np.asarray(items)], rtol=2e-5, atol=1e-6
    )


def test_trains_end_to_end():
    model, data = _make(U=25, I=30, seed=2)
    cfg = TrainConfig(batch_size=32, epochs=8, lr=0.01, reg=0.0001, top_k=5,
                      eval_every=8)
    ev = Evaluator(model, data, k=5, user_block=16)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    assert np.isfinite(results[8]["auc_t"])
    assert results[8]["auc_t"] > 0.5


def test_exact_eval_chunked_matches_oneshot():
    """The chunked online-softmax profile must equal the one-shot masked
    softmax bit-for-nearly-bit at every chunk width (including widths that
    do not divide the padded length)."""
    model, data = _make(max_user_pos=9)
    params, frozen = model.init(jax.random.PRNGKey(2))
    users = jnp.arange(data.num_users)
    # one-shot eval profile (pos_eval width 9 covers every user here)
    oneshot = np.asarray(
        model.user_profile(params, frozen, users, train_only=False)
    )
    pos = frozen["pos_eval"]
    cnt = frozen["cnt_eval"]
    g_u = jnp.take(params["Gu"], users, axis=0)
    for w in (1, 2, 3, 4, 9, 16):
        model.pos_chunk = w
        chunked = np.asarray(
            model._attentive_profile_chunked(params, frozen, g_u, pos, cnt)
        )
        np.testing.assert_allclose(chunked, oneshot, rtol=2e-6, atol=2e-6)


def test_exact_eval_uses_all_positives_beyond_cap():
    """With exact_eval, a user whose positive count exceeds max_user_pos
    gets the full-set profile (differs from the subsampled one and matches
    an uncapped model's)."""
    U, I = 10, 30
    rng = np.random.default_rng(3)
    data = synthetic_interactions(U, I, interactions_per_user=12, seed=3)
    spat = rng.normal(size=(I, 3, 5)).astype(np.float32)
    kw = dict(embed_k=6, layers_component=(4, 1), layers_item=(4, 1), seed=0)
    capped = ACF(U, I, spat, data, max_user_pos=4, **kw)
    exact = ACF(U, I, spat, data, max_user_pos=4, exact_eval=True,
                pos_chunk=3, **kw)
    uncapped = ACF(U, I, spat, data, max_user_pos=64, **kw)
    params, frozen_c = capped.init(jax.random.PRNGKey(5))
    _, frozen_e = exact.init(jax.random.PRNGKey(5))
    _, frozen_u = uncapped.init(jax.random.PRNGKey(5))
    users = jnp.arange(U)
    p_exact = np.asarray(
        exact.user_profile(params, frozen_e, users, train_only=False)
    )
    p_uncapped = np.asarray(
        uncapped.user_profile(params, frozen_u, users, train_only=False)
    )
    p_capped = np.asarray(
        capped.user_profile(params, frozen_c, users, train_only=False)
    )
    # exact == uncapped one-shot; capped differs (users have ~11 eval pos)
    np.testing.assert_allclose(p_exact, p_uncapped, rtol=2e-5, atol=2e-5)
    assert np.abs(p_capped - p_uncapped).max() > 1e-4
    # training profile still uses the cap (unchanged shape/semantics)
    assert exact._pos_train.shape[1] == 4
    assert exact._pos_eval.shape[1] > 4
    # end-to-end eval path (predict_all -> precompute_eval) runs chunked
    s = np.asarray(exact.predict_all(params, frozen_e))
    su = np.asarray(uncapped.predict_all(params, frozen_u))
    np.testing.assert_allclose(s, su, rtol=2e-4, atol=2e-5)


def test_exact_train_gradients_match_padded_when_under_cap():
    """With no user above the cap, exact_train (chunked scan with remat)
    and the padded one-shot path attend over the same set — loss and
    gradients must agree."""
    U, I, S, C = 12, 16, 3, 5
    data = synthetic_interactions(U, I, interactions_per_user=5, seed=7)
    rng = np.random.default_rng(7)
    spat = rng.normal(size=(I, S, C)).astype(np.float32)

    def build(exact):
        return ACF(U, I, spat, data, embed_k=6,
                   layers_component=(4, 1), layers_item=(4, 1),
                   max_user_pos=8, seed=7, exact_train=exact, pos_chunk=3)

    m_pad, m_ex = build(False), build(True)
    params, fr_pad = m_pad.init(jax.random.PRNGKey(3))
    _, fr_ex = m_ex.init(jax.random.PRNGKey(3))
    users = jnp.asarray([0, 4, 9])
    pos = jnp.asarray([1, 5, 10])
    neg = jnp.asarray([2, 6, 11])

    l_pad, g_pad = jax.value_and_grad(
        lambda p: m_pad.loss(p, fr_pad, users, pos, neg, 0.001)
    )(params)
    l_ex, g_ex = jax.value_and_grad(
        lambda p: m_ex.loss(p, fr_ex, users, pos, neg, 0.001)
    )(params)
    np.testing.assert_allclose(float(l_ex), float(l_pad), rtol=1e-5)
    flat_pad = jax.tree_util.tree_leaves(g_pad)
    flat_ex = jax.tree_util.tree_leaves(g_ex)
    for a, b in zip(flat_pad, flat_ex):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-6
        )


def test_exact_train_uses_all_positives_beyond_cap():
    """A user above the cap trains on the FULL positive set: the exact
    profile differs from the subsampled one and matches an uncapped model."""
    U, I, S, C = 8, 30, 3, 5
    data = synthetic_interactions(U, I, interactions_per_user=12, seed=9)
    rng = np.random.default_rng(9)
    spat = rng.normal(size=(I, S, C)).astype(np.float32)
    capped = ACF(U, I, spat, data, embed_k=6, layers_component=(4, 1),
                 layers_item=(4, 1), max_user_pos=4, seed=9)
    exact = ACF(U, I, spat, data, embed_k=6, layers_component=(4, 1),
                layers_item=(4, 1), max_user_pos=4, seed=9,
                exact_train=True, pos_chunk=5)
    uncapped = ACF(U, I, spat, data, embed_k=6, layers_component=(4, 1),
                   layers_item=(4, 1), max_user_pos=64, seed=9)
    params, fr_c = capped.init(jax.random.PRNGKey(4))
    _, fr_e = exact.init(jax.random.PRNGKey(4))
    _, fr_u = uncapped.init(jax.random.PRNGKey(4))
    users = jnp.arange(U)
    p_c = np.asarray(capped.user_profile(params, fr_c, users))
    p_e = np.asarray(exact.user_profile(params, fr_e, users))
    p_u = np.asarray(uncapped.user_profile(params, fr_u, users))
    assert not np.allclose(p_e, p_c, rtol=1e-3)
    np.testing.assert_allclose(p_e, p_u, rtol=2e-5, atol=2e-6)


def test_exact_train_rejects_packed_path():
    import pytest

    model, data = _make()
    model.exact_train = True
    with pytest.raises(ValueError, match="generic"):
        model.packed_spec()


def test_exact_train_end_to_end():
    U, I = 20, 24
    data = synthetic_interactions(U, I, interactions_per_user=8, seed=11)
    rng = np.random.default_rng(11)
    spat = rng.normal(size=(I, 3, 5)).astype(np.float32)
    model = ACF(U, I, spat, data, embed_k=8, layers_component=(4, 1),
                layers_item=(4, 1), max_user_pos=4, seed=11,
                exact_train=True, exact_eval=True, pos_chunk=4)
    cfg = TrainConfig(batch_size=32, epochs=6, lr=0.01, reg=0.0001, top_k=5,
                      eval_every=6)
    ev = Evaluator(model, data, k=5, user_block=16)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    assert np.isfinite(results[6]["auc_t"])


def test_acf_bf16_attention_tracks_fp32():
    """compute_dtype='bfloat16' (attention MLP einsums on the MXU; softmax
    and profile fp32) must track the fp32 scores closely and train."""
    import jax
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.models.acf import ACF

    data = synthetic_interactions(16, 20, interactions_per_user=6, seed=0)
    spat = np.asarray(
        np.random.default_rng(3).normal(size=(20, 3, 5)), np.float32
    )
    kw = dict(embed_k=8, layers_component=(4, 1), layers_item=(4, 1),
              max_user_pos=6)
    m32 = ACF(16, 20, spat, data, **kw)
    m16 = ACF(16, 20, spat, data, compute_dtype="bfloat16", **kw)
    params, frozen = m32.init(jax.random.PRNGKey(0))
    users = jnp.arange(8)
    items = jnp.arange(8) % 20
    s32 = np.asarray(m32.score(params, frozen, users, items))
    s16 = np.asarray(m16.score(params, frozen, users, items))
    np.testing.assert_allclose(s16, s32, rtol=0.02, atol=0.02)
    # trains: loss decreases over a few steps
    l0 = float(m16.loss(params, frozen, users, items,
                        (items + 3) % 20, 0.01))
    assert np.isfinite(l0)
