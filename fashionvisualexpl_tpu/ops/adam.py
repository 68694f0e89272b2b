"""Fused Pallas Adam sweep.

The sparse-apply fast path (train/fast.py) ends each step with a full-table
elementwise sweep: decay both moments and apply the bias-corrected update.
Left to XLA this materializes intermediate temporaries (m_hat, v_hat, the
rsqrt chain); this kernel does the whole sweep in ONE pass with in-place
aliasing — read m, v, p once, write m, v, p once (the HBM floor for an
optimizer whose state all mutates).

Exactness trick used by the caller: the gradient scatter happens BEFORE the
sweep with pre-scaled contributions ((1-b)/b * g), so the sweep's uniform
decay produces exactly b*m + (1-b)*g on touched rows and b*m elsewhere —
the same math as dense Adam.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashionvisualexpl_tpu.train.fast import B1, B2, EPS


def _sweep_kernel(scal_ref, m_ref, v_ref, p_ref,
                  m_out, v_out, p_out):
    lr_t1 = scal_ref[0, 0]  # lr / (1 - b1^t)
    inv_bc2 = scal_ref[0, 1]  # 1 / (1 - b2^t)
    m = m_ref[:] * B1
    v = v_ref[:] * B2
    m_out[:] = m
    v_out[:] = v
    p_out[:] = p_ref[:] - lr_t1 * m / (jnp.sqrt(v * inv_bc2) + EPS)


def fused_adam_sweep(p, m, v, lr, t, block_rows: int = 1024,
                     interpret: bool = False):
    """In-place decay + update sweep.  p/m/v same shape (1-D or 2-D),
    t = new step count (float scalar)."""
    orig_shape = p.shape
    if p.ndim == 1:
        p, m, v = (a.reshape(-1, 1) for a in (p, m, v))
    R, C = p.shape
    blk = min(block_rows, R)
    n_blocks = -(-R // blk)
    pad = n_blocks * blk - R
    if pad:
        p, m, v = (jnp.pad(a, ((0, pad), (0, 0))) for a in (p, m, v))

    # hoisted scalar math: lr/(1-b1^t), 1/(1-b2^t)
    scal = jnp.stack(
        [lr / (1.0 - B1 ** t), 1.0 / (1.0 - B2 ** t)]
    ).reshape(1, 2).astype(p.dtype)

    spec = pl.BlockSpec((blk, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    m2, v2, p2 = pl.pallas_call(
        _sweep_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec,
        ],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(p.shape, p.dtype),
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2},  # m, v, p in-place
        interpret=interpret,
    )(scal, m, v, p)
    if pad:
        m2, v2, p2 = (a[:R] for a in (m2, v2, p2))
    return p2.reshape(orig_shape), m2.reshape(orig_shape), v2.reshape(orig_shape)


def sparse_adam_table_fused(p, m, v, uids, g, lr, t, interpret=False):
    """Drop-in for train/fast.sparse_adam_table using the fused sweep."""
    if g.ndim < m.ndim:
        g = g[..., None] if m.ndim == 2 and g.ndim == 1 else g
    # pre-scaled scatter so the sweep's decay lands on the exact Adam update
    m = m.at[uids].add((1.0 - B1) / B1 * g, unique_indices=True)
    v = v.at[uids].add(
        (1.0 - B2) / B2 * jnp.square(g), unique_indices=True
    )
    return fused_adam_sweep(p, m, v, lr, t, interpret=interpret)
