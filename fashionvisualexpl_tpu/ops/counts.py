"""Pallas fused scoring + >=-position-count kernel (streaming eval).

The per-epoch metric path (eval/factored.py) is a blocked scan whose body
is matmul -> banned-mask -> ge-compare -> reduce.  XLA materializes the
[Bu, item_block] fp32 score block (and the banned mask) to HBM between the
matmul and the reduce — at the 4096 x 500k benchmark geometry that is
~8GB of score traffic for ~0.5TFLOP of matmul.  This kernel computes

    counts[u, t] = |{i in tile : allowed(u, i), s_ui >= ref[u, t]}|

entirely in VMEM per (user-tile, item-tile) grid cell and accumulates the
int32 counts across item tiles in the output block: scores never touch
HBM.  Exclusions stay BY ID (the evaluator's ulp-safety invariant,
ops/topk.py): banned ids arrive pre-bucketed per item tile
(bucket_banned_ids) as block-local offsets with -1 sentinels.

Same role as the reference's per-user python rank walk
(src/recommender/Evaluator.py:181-187), at ~50B user-item scores/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(uf_ref, iv_ref, ib_ref, ref_ref, loc_ref, out_ref):
    # scores TRANSPOSED ([items, users]) so both the item-id compare and
    # the count reduce work the SUBLANE dim (segmax.py's Mosaic lesson).
    # f32 operands keep this path count-identical to the CPU/XLA scans on
    # arbitrary data (bf16 operands measured the same speed — the kernel
    # is VPU/DMA-bound, not MXU-bound, so the cheaper matmul buys nothing)
    s = jax.lax.dot_general(
        iv_ref[:], uf_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TI, TB]
    s = s + ib_ref[:][:, None]
    ti, tb = s.shape
    item_iota = jax.lax.broadcasted_iota(jnp.int32, (ti, tb), 0)
    loc = loc_ref[0]  # [TB, W] block-local banned offsets, -1 = none
    banned = jnp.zeros((ti, tb), jnp.bool_)
    for w in range(loc.shape[1]):
        banned = jnp.logical_or(banned, item_iota == loc[:, w][None, :])
    refs = ref_ref[:]  # [TB, T]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    for t in range(refs.shape[1]):
        ge = jnp.logical_and(
            s >= refs[:, t][None, :], jnp.logical_not(banned)
        )
        out_ref[:, t] += ge.sum(axis=0, dtype=jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("item_tile", "user_tile", "interpret")
)
def counts_kernel(
    uf: jax.Array,  # [B, D] f32, B % user_tile == 0
    iv: jax.Array,  # [Ip, D] f32, Ip % item_tile == 0
    ib_pad: jax.Array,  # [Ip] f32: bias; pad items hold -inf (never >= ref)
    ref_scores: jax.Array,  # [B, T] f32 (+inf for pad users)
    banned_local: jax.Array,  # [Ip // item_tile, B, W] int32, -1 = none
    item_tile: int = 2048,
    user_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """[B, T] int32 counts of allowed items scoring >= each ref score."""
    B, D = uf.shape
    Ip = iv.shape[0]
    T = ref_scores.shape[1]
    W = banned_local.shape[2]
    if Ip % item_tile or B % user_tile:
        raise ValueError(f"geometry: {Ip=} {item_tile=} {B=} {user_tile=}")
    if banned_local.shape[0] != Ip // item_tile:
        raise ValueError(
            f"banned buckets for {banned_local.shape[0]} tiles, "
            f"grid has {Ip // item_tile}"
        )
    grid = (B // user_tile, Ip // item_tile)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((user_tile, D), lambda u, i: (u, 0)),
            pl.BlockSpec((item_tile, D), lambda u, i: (i, 0)),
            pl.BlockSpec((item_tile,), lambda u, i: (i,)),
            pl.BlockSpec((user_tile, T), lambda u, i: (u, 0)),
            pl.BlockSpec((1, user_tile, W), lambda u, i: (i, u, 0)),
        ],
        out_specs=pl.BlockSpec((user_tile, T), lambda u, i: (u, 0)),
        # user tiles are independent; item dim accumulates into out_ref
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(uf, iv, ib_pad, ref_scores, banned_local)


def streaming_counts_pallas(
    user_vecs: jax.Array,  # [Bu, D]
    item_vecs: jax.Array,  # [I, D]
    item_bias,  # [I] or None
    ref_scores: jax.Array,  # [Bu, T]
    banned_local: jax.Array,  # [n_tiles, Bu, W] (bucket_banned_ids at item_block)
    banned_valid: jax.Array,  # [n_tiles, Bu, W]
    item_block: int = 2048,
    user_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.topk.streaming_counts with pre-bucketed banned ids.

    Pads users/items to the kernel tiles (pad items score -inf, pad users
    compare against +inf — neither can satisfy >=) and folds the validity
    mask into a -1 offset sentinel.
    """
    Bu, D = user_vecs.shape
    I = item_vecs.shape[0]
    ut = min(user_tile, max(8, Bu))
    pad_u = (-Bu) % ut
    pad_i = (-I) % item_block

    uf = jnp.pad(user_vecs, ((0, pad_u), (0, 0)))
    iv = jnp.pad(item_vecs, ((0, pad_i), (0, 0)))
    ib = (
        item_bias if item_bias is not None
        else jnp.zeros((I,), user_vecs.dtype)
    )
    ib = jnp.pad(ib, (0, pad_i), constant_values=-jnp.inf)
    ref = jnp.pad(ref_scores, ((0, pad_u), (0, 0)), constant_values=jnp.inf)
    loc = jnp.where(banned_valid, banned_local, -1)
    loc = jnp.pad(loc, ((0, 0), (0, pad_u), (0, 0)), constant_values=-1)
    out = counts_kernel(
        uf, iv, ib, ref, loc,
        item_tile=item_block, user_tile=ut, interpret=interpret,
    )
    return out[:Bu]
