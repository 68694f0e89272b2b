"""Pallas row scatter-SET kernel (the packed optimizer's write op).

Round-3 gather-wall measurements (scripts/gather_wall_bench.py, SPEED.md):
on v5e an XLA `.at[ids].set(unique_indices=True)` into a [1M, 128] table
costs ~83ns/row while the matching gather costs ~19ns/row — the scatter
lowering, not the HBM, is the packed step's dominant row cost (~2ms of a
4.6ms step).  This kernel issues one VMEM->HBM row DMA per scattered row
with `rows_per_step` copies in flight, double-buffered by the Pallas grid
pipeline over the values blocks — the write-side mirror of
ops/gather.py's idiomatic scalar-prefetch gather.

Semantics match `.at[ids].set(vals, unique_indices=True, mode="drop")`:
- ids MUST be unique (concurrent row DMAs race on duplicates — the packed
  engines guarantee uniqueness via their sort/segment dedupe);
- out-of-range ids (the dedupe's padding convention) are dropped.

Like the gather, this exists to make the choice MEASURABLE
(bench_scatter()); integration sites keep the XLA path selectable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_scatter_kernel(rows_per_step: int, num_rows: int):
    def kernel(ids_ref, table_hbm_ref, vals_ref, out_ref, sems):
        # out_ref IS table_hbm_ref (input_output_aliasing) — rows not
        # scattered to are already in place; each in-range id gets one
        # VMEM->HBM row DMA, all rows_per_step in flight together.
        # BOTH refs are 3-D ([.., 1, K]) so every per-row slice runs along
        # the UNTILED leading dim — Mosaic rejects 1-row slices of a
        # (8,128)-tiled dim on either end of a DMA.
        g = pl.program_id(0)
        for j in range(rows_per_step):
            row = ids_ref[g * rows_per_step + j]

            @pl.when(row < num_rows)
            def _():
                pltpu.make_async_copy(
                    vals_ref.at[j],
                    out_ref.at[row],
                    sems.at[j],
                ).start()

        for j in range(rows_per_step):
            row = ids_ref[g * rows_per_step + j]

            @pl.when(row < num_rows)
            def _():
                pltpu.make_async_copy(
                    vals_ref.at[j],
                    out_ref.at[row],
                    sems.at[j],
                ).wait()

    return kernel


def scatter_rows_set(table: jax.Array, ids: jax.Array, vals: jax.Array,
                     rows_per_step: int = 16,
                     interpret: bool = False) -> jax.Array:
    """table [R, K], ids [B] int32 unique, vals [B, K] -> updated [R, K].

    Equivalent to ``table.at[ids].set(vals, unique_indices=True,
    mode="drop")``; ids >= R (or < 0, mapped out of range by the caller's
    padding) are dropped.  B is padded internally to a multiple of
    rows_per_step with dropped ids.

    The table buffer is donated (input_output_aliasing) — the update is
    in place when XLA can prove the input dead, exactly like `.at[].set`.
    """
    if not interpret and jax.default_backend() != "tpu":
        # reference semantics off-TPU (CPU meshes).  `.at[].set` WRAPS
        # negative ids; the kernel drops them — route ids<0 out of range
        # first so both paths agree (advisor finding r3).  Tests exercise
        # the real kernel via interpret=True (as ops/gather.py does).
        ids = jnp.where(ids < 0, table.shape[0], ids)
        return table.at[ids].set(vals, mode="drop", unique_indices=True)
    B, K = vals.shape
    R = table.shape[0]
    Bp = -(-B // rows_per_step) * rows_per_step
    ids_p = jnp.pad(ids, (0, Bp - B), constant_values=R)  # pads drop
    # negative ids must drop too — route them out of range for the single
    # `row < R` guard (unsigned-style)
    ids_p = jnp.where(ids_p < 0, R, ids_p)
    vals_p = jnp.pad(vals, ((0, Bp - B), (0, 0)))[:, None, :]  # [Bp, 1, K]
    table3 = table[:, None, :]  # [R, 1, K] — slices stay on dim 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // rows_per_step,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            pl.BlockSpec(
                (rows_per_step, 1, K), lambda i, ids_ref: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # aliased table
        scratch_shapes=[pltpu.SemaphoreType.DMA((rows_per_step,))],
    )
    out = pl.pallas_call(
        _make_scatter_kernel(rows_per_step, R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table3.shape, table.dtype),
        input_output_aliases={1: 0},  # table (after the prefetch arg) -> out
        interpret=interpret,
    )(ids_p, table3, vals_p)
    return out[:, 0, :]


def bench_scatter(table_rows=1_000_000, dim=384, batch=24576, reps=20,
                  rows_per_step=16):
    """Chained on-device comparison (one fetch): Pallas scatter-set vs XLA
    .at[].set; returns (pallas_ms, xla_ms) per op."""
    import time

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (table_rows, dim))
    ids = jax.random.permutation(
        jax.random.fold_in(key, 1), table_rows
    )[:batch].astype(jnp.int32)
    vals = jax.random.normal(jax.random.fold_in(key, 2), (batch, dim))

    @jax.jit
    def run_pallas(table, ids, vals):
        def body(t, i):
            return scatter_rows_set(
                t, (ids + i) % table_rows, vals, rows_per_step
            ), None

        out, _ = jax.lax.scan(body, table, jnp.arange(reps))
        return out[0, 0]

    @jax.jit
    def run_xla(table, ids, vals):
        def body(t, i):
            return t.at[(ids + i) % table_rows].set(
                vals, unique_indices=True
            ), None

        out, _ = jax.lax.scan(body, table, jnp.arange(reps))
        return out[0, 0]

    import numpy as np

    _ = np.asarray(run_pallas(table, ids, vals))
    t0 = time.time()
    _ = np.asarray(run_pallas(table, ids, vals))
    pallas_ms = (time.time() - t0) / reps * 1000

    _ = np.asarray(run_xla(table, ids, vals))
    t0 = time.time()
    _ = np.asarray(run_xla(table, ids, vals))
    xla_ms = (time.time() - t0) / reps * 1000
    return pallas_ms, xla_ms


if __name__ == "__main__":
    p, x = bench_scatter()
    print({"pallas_ms": p, "xla_ms": x, "speedup": x / p})
