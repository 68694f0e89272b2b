"""Pallas row scatter-SET kernel vs `.at[ids].set(mode="drop")` (interpret).

`ops/row_scatter.py` is kept as a measured NEGATIVE (SPEED.md "row-op
wall") — these pins make the "CORRECT on chip" claim reproducible, incl.
the drop semantics for the dedupe's out-of-range padding and for negative
ids (which `.at[].set` would wrap; the kernel routes them out of range).
"""

import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.ops.row_scatter import scatter_rows_set


def _oracle(table, ids, vals):
    ids = jnp.where(ids < 0, table.shape[0], ids)
    return table.at[ids].set(vals, mode="drop", unique_indices=True)


def test_scatter_matches_set():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    ids = jnp.asarray(rng.permutation(64)[:40], jnp.int32)
    vals = jnp.asarray(rng.normal(size=(40, 16)).astype(np.float32))
    got = scatter_rows_set(table, ids, vals, rows_per_step=8, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(_oracle(table, ids, vals))
    )


def test_scatter_drops_out_of_range_and_negative():
    # the packed engines pad their deduped id lists with out-of-range
    # sentinels; ids < 0 must ALSO drop (not wrap to row R-1)
    table = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
    ids = jnp.asarray([3, 8, 100, -1, 0], jnp.int32)
    vals = -jnp.ones((5, 4), jnp.float32)
    got = scatter_rows_set(table, ids, vals, rows_per_step=4, interpret=True)
    want = np.asarray(table).copy()
    want[3] = -1.0
    want[0] = -1.0
    np.testing.assert_array_equal(np.asarray(got), want)
    # row R-1 untouched — negative id did NOT wrap
    np.testing.assert_array_equal(np.asarray(got)[7], np.asarray(table)[7])


def test_scatter_internal_padding():
    # B not a multiple of rows_per_step: internal pads must drop
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    ids = jnp.asarray([5, 2, 11], jnp.int32)
    vals = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    got = scatter_rows_set(table, ids, vals, rows_per_step=4, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(_oracle(table, ids, vals))
    )


def test_cpu_fallback_matches_kernel_semantics():
    # the automatic off-TPU fallback must agree with the kernel on
    # negative ids (advisor finding r3: it used to wrap them)
    table = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
    ids = jnp.asarray([-1, 2], jnp.int32)
    vals = -jnp.ones((2, 4), jnp.float32)
    got = scatter_rows_set(table, ids, vals)  # cpu backend -> fallback
    want = np.asarray(table).copy()
    want[2] = -1.0
    np.testing.assert_array_equal(np.asarray(got), want)
