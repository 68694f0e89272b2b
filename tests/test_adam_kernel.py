"""Fused Adam sweep kernel vs the reference jnp implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.ops.adam import (
    fused_adam_sweep,
    sparse_adam_table_fused,
)
from fashionvisualexpl_tpu.train.fast import sparse_adam_table


def test_sweep_matches_reference():
    rng = np.random.default_rng(0)
    R, C = 100, 8
    p = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    v = jnp.asarray(np.abs(rng.normal(size=(R, C))).astype(np.float32))
    lr, t = 0.01, jnp.float32(5.0)

    from fashionvisualexpl_tpu.train.fast import B1, B2, EPS

    m_ref = m * B1
    v_ref = v * B2
    p_ref = p - lr * (m_ref / (1 - B1 ** t)) / (
        jnp.sqrt(v_ref / (1 - B2 ** t)) + EPS
    )
    p2, m2, v2 = fused_adam_sweep(p, m, v, lr, t, block_rows=16,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_ref), rtol=1e-5)


def test_sparse_fused_matches_sparse_plain():
    rng = np.random.default_rng(1)
    R, C, S = 64, 4, 10
    p = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    v = jnp.asarray(np.abs(rng.normal(size=(R, C))).astype(np.float32))
    uids = jnp.asarray(rng.choice(R, S, replace=False).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(S, C)).astype(np.float32))
    lr, t = 0.02, jnp.float32(3.0)

    pa, ma, va = sparse_adam_table(p, m, v, uids, g, lr, t)
    pb, mb, vb = sparse_adam_table_fused(p, m, v, uids, g, lr, t,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pa), rtol=2e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), rtol=2e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), rtol=2e-5,
                               atol=1e-7)


def test_sweep_1d():
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.normal(size=50).astype(np.float32))
    m = jnp.zeros(50)
    v = jnp.zeros(50)
    p2, m2, v2 = fused_adam_sweep(p, m, v, 0.01, jnp.float32(1.0),
                                  interpret=True)
    assert p2.shape == (50,)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), rtol=1e-6)
