"""The fused Pallas edge tower (ops/edge_tower.py) pinned against its own
XLA oracle — forward, backward (incl. max-tie routing), the zero
image-gradient contract, and the AttentiveFashion integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashionvisualexpl_tpu.ops.edge_tower import (
    edge_tower_gap,
    edge_tower_gap_xla,
)

INTERP = jax.default_backend() != "tpu"


def _inputs(B=5, H=8, W=16, C=4, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.random((B, H, W, 1)).astype(np.float32))
    cw = jnp.asarray(0.1 * rng.standard_normal((5, 5, 1, C)).astype(np.float32))
    cb = jnp.asarray(0.1 * rng.standard_normal((C,)).astype(np.float32))
    return imgs, cw, cb


@pytest.mark.parametrize("B,H,W,C,tile", [
    (5, 8, 16, 4, 4),     # batch not a tile multiple (pads)
    (8, 6, 10, 3, 8),     # W not pow2, C odd
    (3, 12, 8, 8, 2),
])
def test_forward_matches_xla(B, H, W, C, tile):
    imgs, cw, cb = _inputs(B, H, W, C, seed=B + C)
    out_f = edge_tower_gap(imgs, cw, cb, tile, INTERP)
    out_x = edge_tower_gap_xla(imgs, cw, cb)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-5, atol=1e-6
    )


def test_gradients_match_xla():
    imgs, cw, cb = _inputs()

    def loss(f):
        return lambda w, b: jnp.sum(jnp.sin(f(imgs, w, b)))

    gf = jax.grad(loss(lambda i, w, b: edge_tower_gap(i, w, b, 4, INTERP)),
                  argnums=(0, 1))(cw, cb)
    gx = jax.grad(loss(edge_tower_gap_xla), argnums=(0, 1))(cw, cb)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gx[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-5)


def test_tie_routing_matches_select_and_scatter():
    """Constant images tie every pool window and the relu boundary — the
    kernel's even-column/top-row tie winners must match XLA's
    select-and-scatter first-match rule exactly."""
    _, cw, cb = _inputs(C=4)
    imgs = jnp.full((4, 8, 12, 1), 0.5, jnp.float32)
    gf = jax.grad(
        lambda w: jnp.sum(edge_tower_gap(imgs, w, cb, 4, INTERP))
    )(cw)
    gx = jax.grad(lambda w: jnp.sum(edge_tower_gap_xla(imgs, w, cb)))(cw)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-5, atol=1e-6)


def test_zero_image_gradient_contract():
    """Images are frozen features in every caller; the custom VJP returns
    exactly zero for them (documented contract, not an approximation)."""
    imgs, cw, cb = _inputs()
    gi = jax.grad(
        lambda i: jnp.sum(edge_tower_gap(i, cw, cb, 4, INTERP))
    )(imgs)
    assert float(jnp.abs(gi).max()) == 0.0


@pytest.mark.slow
def test_attentive_fashion_fused_tower_matches_xla():
    """AttentiveFashion with edge_tower='fused' must score/eval like the
    inline XLA tower (within last-ulp accumulation differences)."""
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion

    U, I = 12, 10
    color = synthetic_features(I, 8, seed=1)
    cls = synthetic_features(I, 6, seed=2)
    rng = np.random.default_rng(3)
    edges = rng.random((I, 8, 8, 1)).astype(np.float32)

    def build(tower):
        return AttentiveFashion(
            U, I, color, edges, cls, embed_k=6, attention_layers=(4, 1),
            conv_filters=4, edge_tower=tower,
        )

    m_xla, m_fused = build("xla"), build("fused")
    assert not m_xla._fused_tower and m_fused._fused_tower
    params, frozen = m_xla.init(jax.random.PRNGKey(0))
    s_xla = np.asarray(m_xla.predict_all(params, frozen))
    s_fused = np.asarray(m_fused.predict_all(params, frozen))
    np.testing.assert_allclose(s_fused, s_xla, rtol=1e-4, atol=1e-5)

    # training gradients agree too (no dropout rng -> deterministic)
    users = jnp.asarray([0, 3]); pos = jnp.asarray([1, 4])
    neg = jnp.asarray([2, 5])
    g_xla = jax.grad(
        lambda p: m_xla.loss(p, frozen, users, pos, neg, 0.01)
    )(params)
    g_fused = jax.grad(
        lambda p: m_fused.loss(p, frozen, users, pos, neg, 0.01)
    )(params)
    for path, a in jax.tree_util.tree_leaves_with_path(g_xla):
        b = g_fused
        for k in path:
            b = b[k.key]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
            err_msg=str(path),
        )


def test_fused_rejects_odd_hw():
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion

    color = synthetic_features(4, 8, seed=1)
    cls = synthetic_features(4, 6, seed=2)
    edges = np.zeros((4, 7, 8, 1), np.float32)
    with pytest.raises(ValueError, match="even"):
        AttentiveFashion(5, 4, color, edges, cls, embed_k=4,
                         attention_layers=(4, 1), edge_tower="fused")
    # auto falls back silently
    m = AttentiveFashion(5, 4, color, edges, cls, embed_k=4,
                         attention_layers=(4, 1), edge_tower="auto")
    assert not m._fused_tower
