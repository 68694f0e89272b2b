"""Mixed-precision (bfloat16 encoder-tower) policy: fp32 default is
bit-exact, bf16 tracks fp32 within bf16 tolerance, params/loss stay fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.core.precision import resolve_compute_dtype
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion
from fashionvisualexpl_tpu.models.cnn import CNN
from fashionvisualexpl_tpu.models.comp_vbpr import CompVBPR
from fashionvisualexpl_tpu.train.trainer import Trainer


def _attentive(compute_dtype, U=12, I=16, K=8, img=12, seed=0):
    rng = np.random.default_rng(seed)
    color = synthetic_features(I, 10, seed=seed)
    edges = rng.random((I, img, img, 1)).astype(np.float32)
    cls = np.eye(5, dtype=np.float32)[rng.integers(0, 5, I)]
    return AttentiveFashion(
        U, I, color, edges, cls, embed_k=K,
        attention_layers=(6, 1), encoder_hidden=16, item_block=7,
        compute_dtype=compute_dtype,
    )


def test_resolve_compute_dtype_validates():
    assert resolve_compute_dtype("float32") == jnp.dtype("float32")
    assert resolve_compute_dtype("bfloat16") == jnp.dtype("bfloat16")
    with pytest.raises(ValueError):
        resolve_compute_dtype("float16")
    with pytest.raises(TypeError):
        resolve_compute_dtype("not-a-dtype")


def test_fp32_default_unchanged():
    """compute_dtype='float32' must be a no-op: identical outputs to a model
    built without the argument."""
    m_default = _attentive("float32")
    params, frozen = m_default.init(jax.random.PRNGKey(0))
    scores_a = m_default.predict_all(params, frozen)
    m_explicit = _attentive("float32")
    scores_b = m_explicit.predict_all(params, frozen)
    np.testing.assert_array_equal(np.asarray(scores_a), np.asarray(scores_b))


def test_bf16_encoder_tracks_fp32():
    m32 = _attentive("float32")
    m16 = _attentive("bfloat16")
    params, frozen = m32.init(jax.random.PRNGKey(1))
    e32 = np.asarray(m32.encode_items(params, frozen))
    e16 = np.asarray(m16.encode_items(params, frozen))
    assert e16.dtype == np.float32  # towers return fp32
    # bf16 has ~8 mantissa bits -> relative error ~4e-3 per op chain
    np.testing.assert_allclose(e16, e32, rtol=0, atol=3e-2 * np.abs(e32).max())


def test_bf16_scores_track_fp32():
    m32 = _attentive("float32")
    m16 = _attentive("bfloat16")
    params, frozen = m32.init(jax.random.PRNGKey(2))
    s32 = np.asarray(m32.predict_all(params, frozen))
    s16 = np.asarray(m16.predict_all(params, frozen))
    assert s16.dtype == np.float32
    np.testing.assert_allclose(s16, s32, rtol=0, atol=5e-2 * np.abs(s32).max())


def test_bf16_training_keeps_fp32_params_and_learns():
    """A few packed-path epochs under bf16: loss finite and decreasing-ish,
    params remain fp32 throughout."""
    model = _attentive("bfloat16", U=20, I=24)
    data = synthetic_interactions(20, 24, interactions_per_user=5, seed=3)
    cfg = TrainConfig(batch_size=16, epochs=1, lr=0.01, reg=0.0,
                      train_path="packed")
    trainer = Trainer(model, data, cfg)
    state, frozen = trainer.init_state()
    key = jax.random.PRNGKey(0)
    losses = []
    for e in range(4):
        state, loss = trainer.run_epoch(state, frozen, jax.random.fold_in(key, e))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_cnn_bf16_tracks_fp32():
    cnn32 = CNN(6, in_channels=1, input_hw=(16, 16))
    cnn16 = CNN(6, in_channels=1, input_hw=(16, 16), compute_dtype="bfloat16")
    params = cnn32.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(
        np.random.default_rng(0).random((4, 16, 16, 1), dtype=np.float32)
    )
    y32 = np.asarray(cnn32.apply(params, imgs))
    y16 = np.asarray(cnn16.apply(params, imgs))
    assert y16.dtype == np.float32
    np.testing.assert_allclose(y16, y32, rtol=0, atol=5e-2 * np.abs(y32).max())


def test_comp_vbpr_bf16_loss_finite():
    I, U = 18, 14
    rng = np.random.default_rng(4)
    model = CompVBPR(
        U, I,
        semantic_features=synthetic_features(I, 12, seed=1),
        color_features=synthetic_features(I, 10, seed=2),
        edge_images=rng.random((I, 16, 16, 1)).astype(np.float32),
        texture_features=synthetic_features(I, 8, seed=3),
        embed_k=8, embed_d=4, compute_dtype="bfloat16",
    )
    params, frozen = model.init(jax.random.PRNGKey(0))
    users = jnp.asarray([0, 3, 7])
    pos = jnp.asarray([1, 2, 3])
    neg = jnp.asarray([4, 5, 6])
    loss = model.loss(params, frozen, users, pos, neg, 0.01,
                      rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert loss.dtype == jnp.float32
