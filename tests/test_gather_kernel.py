"""Pallas gather kernel vs jnp.take (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.ops.gather import gather_rows


def test_gather_matches_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, 40), jnp.int32)
    got = gather_rows(table, ids, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.take(table, ids, axis=0)))


def test_gather_duplicate_ids():
    table = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
    ids = jnp.asarray([3, 3, 0, 7, 3], jnp.int32)
    got = gather_rows(table, ids, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table)[np.asarray(ids)])
