"""Space-to-depth edge tower (ops/s2d_conv.py) vs the direct XLA path.

The s2d re-expression computes the SAME taps with the same adds (gather'd
kernel, structural zeros on dead taps), so forward AND gradients must
match the direct conv to float noise — including at odd spatial content
near the SAME-pad borders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashionvisualexpl_tpu.ops.s2d_conv import (
    edge_tower_s2d_gap,
    pack_kernel_s2d,
    space_to_depth,
)


def _xla_tower(images, conv_W, conv_b):
    y = jax.lax.conv_general_dilated(
        images, conv_W, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + conv_b
    y = jax.nn.relu(y)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="SAME",
    )
    return jnp.mean(y, axis=(1, 2))


@pytest.mark.parametrize("hw", [(8, 8), (16, 12)])
def test_s2d_tower_matches_xla(hw):
    rng = np.random.default_rng(0)
    B, F = 3, 8
    imgs = jnp.asarray(rng.random((B, *hw, 1)).astype(np.float32))
    cw = jnp.asarray(rng.normal(size=(5, 5, 1, F)).astype(np.float32) * 0.1)
    cb = jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1)
    np.testing.assert_allclose(
        np.asarray(edge_tower_s2d_gap(imgs, cw, cb)),
        np.asarray(_xla_tower(imgs, cw, cb)),
        rtol=1e-5, atol=1e-6,
    )


def test_s2d_tower_gradients_match():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32))
    cw = jnp.asarray(rng.normal(size=(5, 5, 1, 4)).astype(np.float32) * 0.1)
    cb = jnp.asarray(rng.normal(size=(4,)).astype(np.float32) * 0.1)
    gw1, gb1 = jax.grad(
        lambda w, b: _xla_tower(imgs, w, b).sum(), argnums=(0, 1)
    )(cw, cb)
    gw2, gb2 = jax.grad(
        lambda w, b: edge_tower_s2d_gap(imgs, w, b).sum(), argnums=(0, 1)
    )(cw, cb)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb2), np.asarray(gb1),
                               rtol=1e-5, atol=1e-6)


def test_packed_kernel_tap_structure():
    """Each packed output channel must carry exactly kh*kw live taps."""
    cw = jnp.asarray(np.ones((5, 5, 1, 2), np.float32))
    w = np.asarray(pack_kernel_s2d(cw))  # [3, 3, 4, 8]
    assert w.shape == (3, 3, 4, 8)
    # per output channel: 25 ones, 11 structural zeros (3*3*4 = 36 taps)
    sums = w.reshape(-1, 8).sum(axis=0)
    np.testing.assert_array_equal(sums, np.full(8, 25.0))


def test_space_to_depth_roundtrip():
    x = jnp.arange(2 * 4 * 6 * 1, dtype=jnp.float32).reshape(2, 4, 6, 1)
    y = np.asarray(space_to_depth(x, 2))  # [2, 2, 3, 4]
    assert y.shape == (2, 2, 3, 4)
    x_np = np.asarray(x)
    np.testing.assert_array_equal(y[1, 0, 1], x_np[1, 0:2, 2:4, 0].ravel())


def test_model_s2d_tower_matches_xla_tower():
    """AttentiveFashion(edge_tower='s2d') == edge_tower='xla' end-to-end
    (encoded items, loss, attention dumps share everything but the conv)."""
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion

    rng = np.random.default_rng(2)
    U, I, K = 6, 10, 8
    color = rng.random((I, 5)).astype(np.float32)
    edges = rng.random((I, 8, 8, 1)).astype(np.float32)
    cls = np.eye(3, dtype=np.float32)[rng.integers(0, 3, I)]
    kw = dict(embed_k=K, attention_layers=(4, 1), encoder_hidden=8,
              dropout_rate=0.0)
    m_xla = AttentiveFashion(U, I, color, edges, cls, edge_tower="xla", **kw)
    m_s2d = AttentiveFashion(U, I, color, edges, cls, edge_tower="s2d", **kw)
    params, frozen = m_xla.init(jax.random.PRNGKey(0))
    e1 = np.asarray(m_xla.encode_items(params, frozen))
    e2 = np.asarray(m_s2d.encode_items(params, frozen))
    np.testing.assert_allclose(e2, e1, rtol=1e-5, atol=1e-6)
    u = jnp.asarray([0, 1, 2])
    p = jnp.asarray([1, 2, 3])
    n = jnp.asarray([4, 5, 6])
    l1 = float(m_xla.loss(params, frozen, u, p, n, 0.01))
    l2 = float(m_s2d.loss(params, frozen, u, p, n, 0.01))
    np.testing.assert_allclose(l2, l1, rtol=1e-5)


def test_s2d_rejects_odd_hw():
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion

    rng = np.random.default_rng(3)
    with pytest.raises(ValueError, match="even"):
        AttentiveFashion(
            4, 6, rng.random((6, 5)).astype(np.float32),
            rng.random((6, 7, 7, 1)).astype(np.float32),
            np.eye(3, dtype=np.float32)[rng.integers(0, 3, 6)],
            embed_k=8, edge_tower="s2d",
        )
