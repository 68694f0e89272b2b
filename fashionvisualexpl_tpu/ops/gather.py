"""Pallas embedding row-gather kernel.

The idiomatic TPU embedding gather: ids are scalar-prefetched
(PrefetchScalarGridSpec) so the pipeline can compute each grid step's block
index BEFORE the body runs — every step DMAs exactly one table row
HBM->VMEM, double-buffered by the Pallas pipeline.  An alternative to
XLA's gather for HBM-resident tables; bench_gather() compares both so the
faster path can be chosen per shape (XLA's gather is strong on TPU — this
kernel exists to make the choice measurable, not to presume it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_gather_kernel(rows_per_step: int):
    def kernel(ids_ref, table_ref, out_ref, scratch, sems):
        # table stays in HBM; issue one row DMA per output row, all in
        # flight concurrently, then wait — the Pallas grid pipeline
        # overlaps this group's DMAs with the previous group's copy-out.
        g = pl.program_id(0)
        for j in range(rows_per_step):
            row = ids_ref[g * rows_per_step + j]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1), :],
                scratch.at[pl.ds(j, 1), :],
                sems.at[j],
            ).start()
        for j in range(rows_per_step):
            row = ids_ref[g * rows_per_step + j]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1), :],
                scratch.at[pl.ds(j, 1), :],
                sems.at[j],
            ).wait()
        out_ref[:, :] = scratch[:, :]

    return kernel


def gather_rows(table: jax.Array, ids: jax.Array,
                rows_per_step: int = 8, interpret: bool = False) -> jax.Array:
    """table [R, K] float32, ids [B] int32 -> [B, K].  B is padded up to a
    multiple of rows_per_step internally (pad ids point at row 0)."""
    B = ids.shape[0]
    K = table.shape[1]
    Bp = -(-B // rows_per_step) * rows_per_step
    ids_p = jnp.pad(ids, (0, Bp - B))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // rows_per_step,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table in HBM
        out_specs=pl.BlockSpec(
            (rows_per_step, K), lambda i, ids_ref: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_per_step, K), table.dtype),
            pltpu.SemaphoreType.DMA((rows_per_step,)),
        ],
    )
    out = pl.pallas_call(
        _make_gather_kernel(rows_per_step),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, K), table.dtype),
        interpret=interpret,
    )(ids_p, table)
    return out[:B]


def bench_gather(table_rows=1_000_000, dim=128, batch=24576, reps=20):
    """Compare Pallas gather vs XLA take on the current backend; returns
    (pallas_ms, xla_ms)."""
    import time

    import numpy as np

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (table_rows, dim))
    ids = jax.random.randint(key, (batch,), 0, table_rows)

    steps = reps

    @jax.jit
    def run_pallas(table, ids):
        def body(carry, i):
            out = gather_rows(table, (ids + i) % table.shape[0])
            return carry + out[0, 0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return acc

    @jax.jit
    def run_xla(table, ids):
        def body(carry, i):
            out = jnp.take(table, (ids + i) % table.shape[0], axis=0)
            return carry + out[0, 0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return acc

    float(run_pallas(table, ids))
    t0 = time.time()
    float(run_pallas(table, ids))
    pallas_ms = (time.time() - t0) / steps * 1000

    float(run_xla(table, ids))
    t0 = time.time()
    float(run_xla(table, ids))
    xla_ms = (time.time() - t0) / steps * 1000
    return pallas_ms, xla_ms
