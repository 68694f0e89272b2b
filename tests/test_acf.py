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
