"""Trainable CNN encoder: shapes, dropout determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.models.cnn import CNN


def test_shapes_small_input():
    cnn = CNN(k=16, in_channels=1, input_hw=(32, 32))
    params = cnn.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((3, 32, 32, 1)),
                    jnp.float32)
    out = cnn.apply(params, x)
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_dropout_behavior():
    cnn = CNN(k=8, in_channels=1, input_hw=(16, 16))
    params = cnn.init(jax.random.PRNGKey(1))
    x = jnp.ones((2, 16, 16, 1))
    d1 = np.asarray(cnn.apply(params, x))
    d2 = np.asarray(cnn.apply(params, x))
    np.testing.assert_allclose(d1, d2)  # eval mode deterministic
    t1 = np.asarray(cnn.apply(params, x, rng=jax.random.PRNGKey(0)))
    t2 = np.asarray(cnn.apply(params, x, rng=jax.random.PRNGKey(1)))
    assert not np.allclose(t1, t2)  # train mode stochastic
