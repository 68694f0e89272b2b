"""Fused Pallas BPR triplet kernel.

Computes the BPR pairwise loss and its analytic gradients in one fused pass
over gathered embeddings — the Pallas ranking kernel of the BASELINE.json
north star.  Semantics match the reference train step exactly
(src/recommender/models/BPRMF.py:95-106): scores x = b_i + <g_u, g_i>,
difference clipped to [-80, 1e8], loss = sum softplus(-diff); the clip's
gradient is zero outside the bounds.

Structure: the forward kernel produces the per-triplet sigmoid factor
sigma = d softplus(-diff)/d(-diff) (masked by the clip) as the residual; the
backward kernel turns sigma into all five input gradients in one elementwise
pass.  Gathers/scatters stay in XLA (which lowers them well); what Pallas
fuses away is the elementwise chain and its autodiff intermediates.

Falls back to pure-jnp on non-TPU backends (interpret mode covers tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLIP_LO = -80.0
CLIP_HI = 1e8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(gu_ref, gp_ref, gn_ref, bp_ref, bn_ref,
                loss_ref, sigma_ref):
    i = pl.program_id(0)
    gu = gu_ref[:]
    diff_dot = jnp.sum(gu * (gp_ref[:] - gn_ref[:]), axis=1)  # [T]
    diff = bp_ref[i, :] - bn_ref[i, :] + diff_dot
    clipped = jnp.clip(diff, CLIP_LO, CLIP_HI)
    loss_tile = jnp.sum(jax.nn.softplus(-clipped))
    # accumulate across grid steps
    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[0, 0] = 0.0
    loss_ref[0, 0] += loss_tile
    in_range = jnp.logical_and(diff > CLIP_LO, diff < CLIP_HI)
    sigma_ref[i, :] = jnp.where(in_range, jax.nn.sigmoid(-diff), 0.0)


def _bwd_kernel(sigma_ref, gu_ref, gp_ref, gn_ref,
                dgu_ref, dgp_ref, dgn_ref, dbp_ref, dbn_ref):
    i = pl.program_id(0)
    s = sigma_ref[i, :]  # [T]
    gu = gu_ref[:]
    gp = gp_ref[:]
    gn = gn_ref[:]
    sc = s[:, None]
    dgu_ref[:] = sc * (gn - gp)
    dgp_ref[:] = -sc * gu
    dgn_ref[:] = sc * gu
    dbp_ref[i, :] = -s
    dbn_ref[i, :] = s


def _pad_batch(x, T):
    b = x.shape[0]
    pad = _round_up(b, T) - b
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


def _fwd_pallas(gu, gp, gn, bp, bn, tile, interpret):
    B, K = gu.shape
    Bp_ = _round_up(B, tile)
    G = Bp_ // tile
    grid = (G,)
    gu_, gp_, gn_ = (_pad_batch(a, tile) for a in (gu, gp, gn))
    # vectors as [G, tile] so VMEM blocks are 2-D (TPU layout constraint);
    # padded rows give diff=0 whose log(2) loss is subtracted below
    bp_ = _pad_batch(bp, tile).reshape(G, tile)
    bn_ = _pad_batch(bn, tile).reshape(G, tile)

    row_spec = pl.BlockSpec((tile, K), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole [G, tile]
    loss, sigma = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, vec_spec, vec_spec],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vec_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, tile), jnp.float32),
        ],
        interpret=interpret,
    )(gu_, gp_, gn_, bp_, bn_)
    sigma = sigma.reshape(-1)
    # padded rows have diff = 0 -> softplus(0) = log 2 counted; subtract
    n_pad = Bp_ - B
    loss = loss[0, 0] - n_pad * jnp.log(2.0)
    return loss, sigma[:B]


def _bwd_pallas(sigma, gu, gp, gn, tile, interpret):
    B, K = gu.shape
    Bp_ = _round_up(B, tile)
    G = Bp_ // tile
    grid = (G,)
    sigma_ = _pad_batch(sigma, tile).reshape(G, tile)  # padded sigma = 0
    gu_, gp_, gn_ = (_pad_batch(a, tile) for a in (gu, gp, gn))
    row_spec = pl.BlockSpec((tile, K), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole [G, tile]
    dgu, dgp, dgn, dbp, dbn = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[vec_spec, row_spec, row_spec, row_spec],
        out_specs=[row_spec, row_spec, row_spec, vec_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Bp_, K), jnp.float32),
            jax.ShapeDtypeStruct((Bp_, K), jnp.float32),
            jax.ShapeDtypeStruct((Bp_, K), jnp.float32),
            jax.ShapeDtypeStruct((G, tile), jnp.float32),
            jax.ShapeDtypeStruct((G, tile), jnp.float32),
        ],
        interpret=interpret,
    )(sigma_, gu_, gp_, gn_)
    return (dgu[:B], dgp[:B], dgn[:B],
            dbp.reshape(-1)[:B], dbn.reshape(-1)[:B])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bpr_triplet_loss(gu, gi_pos, gi_neg, b_pos, b_neg,
                     tile: int = 512, interpret: bool = False):
    """Summed BPR loss over gathered triplet embeddings, Pallas-fused.

    Args: gu/gi_pos/gi_neg [B, K] float32, b_pos/b_neg [B] float32.
    """
    loss, _ = _fwd_pallas(gu, gi_pos, gi_neg, b_pos, b_neg, tile, interpret)
    return loss


def _vjp_fwd(gu, gi_pos, gi_neg, b_pos, b_neg, tile, interpret):
    loss, sigma = _fwd_pallas(gu, gi_pos, gi_neg, b_pos, b_neg, tile, interpret)
    return loss, (sigma, gu, gi_pos, gi_neg)


def _vjp_bwd(tile, interpret, res, g):
    sigma, gu, gp, gn = res
    dgu, dgp, dgn, dbp, dbn = _bwd_pallas(sigma, gu, gp, gn, tile, interpret)
    return (g * dgu, g * dgp, g * dgn, g * dbp, g * dbn)


bpr_triplet_loss.defvjp(_vjp_fwd, _vjp_bwd)


def bpr_triplet_loss_reference(gu, gi_pos, gi_neg, b_pos, b_neg):
    """Pure-jnp reference implementation (identical math, for testing and
    non-TPU fallback)."""
    x_pos = b_pos + jnp.sum(gu * gi_pos, axis=1)
    x_neg = b_neg + jnp.sum(gu * gi_neg, axis=1)
    diff = jnp.clip(x_pos - x_neg, CLIP_LO, CLIP_HI)
    return jnp.sum(jax.nn.softplus(-diff))
