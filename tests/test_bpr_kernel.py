"""Pallas fused BPR kernel vs pure-jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashionvisualexpl_tpu.ops.bpr import (
    bpr_triplet_loss,
    bpr_triplet_loss_reference,
)


def _inputs(B, K, seed=0, extreme=False):
    rng = np.random.default_rng(seed)
    scale = 20.0 if extreme else 1.0
    gu = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32)) * scale
    gp = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32)) * scale
    gn = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32)) * scale
    bp = jnp.asarray(rng.normal(size=B).astype(np.float32))
    bn = jnp.asarray(rng.normal(size=B).astype(np.float32))
    return gu, gp, gn, bp, bn


@pytest.mark.parametrize("B,K,tile", [(64, 16, 16), (100, 8, 32), (8, 128, 8)])
def test_forward_matches_reference(B, K, tile):
    args = _inputs(B, K)
    got = bpr_triplet_loss(*args, tile, True)
    want = bpr_triplet_loss_reference(*args)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_gradients_match_autodiff():
    args = _inputs(48, 12, seed=1)
    g_kernel = jax.grad(
        lambda *a: bpr_triplet_loss(*a, 16, True), argnums=(0, 1, 2, 3, 4)
    )(*args)
    g_ref = jax.grad(
        bpr_triplet_loss_reference, argnums=(0, 1, 2, 3, 4)
    )(*args)
    for gk, gr in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-6)


def test_clip_gradient_zero_outside_bounds():
    """Large score differences hit the clip; gradient must vanish exactly as
    tf.clip_by_value's does (reference BPRMF.py:104)."""
    args = _inputs(32, 8, seed=2, extreme=True)
    g_kernel = jax.grad(
        lambda *a: bpr_triplet_loss(*a, 16, True), argnums=(0,)
    )(*args)[0]
    g_ref = jax.grad(bpr_triplet_loss_reference, argnums=(0,))(*args)[0]
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
