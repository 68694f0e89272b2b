"""Pallas fused catalog-scoring + segment-max kernel (serving stage 1).

XLA does not fuse the segment max-pool into the scoring matmul's epilogue:
the [B, item_block] score block round-trips HBM before the reduce, which
measured ~6x the matmul's own cost at the 1M-item serving bench
(serve/engine.py).  This kernel computes

    out[b, s] = max_{j in segment s} (uf[b] . iv[j] + ib_cand[j])

entirely in VMEM per (user-tile, item-tile) grid cell: one MXU dot, bias
add, and an in-register segment max — scores never touch HBM.

`ib_cand` carries the item bias AND the validity mask (pad items hold a
large negative value), so the kernel body is branch-free.

Two output layouts: the natural [S, B]-major one (the scores come out
transposed so the segment reduction splits the SUBLANE dim) and a
[B, S]-major one that transposes each reduced tile in VMEM before the
store — the downstream `approx_max_k` wants [B, S]-major, and at small B
the layout copy it otherwise pays measured ~1.1ms of a 4.0ms query
(round-4 xplane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(uf_ref, iv_ref, ib_ref, out_ref, *, seg: int, transposed: bool):
    # scores come out TRANSPOSED ([items, users]) so the segment reduction
    # splits the SUBLANE dim — Mosaic rejects lane-dim shape casts
    # ([TB, TI] -> [TB, TI//seg, seg] fails with 'unsupported shape cast')
    s = jax.lax.dot_general(
        iv_ref[:], uf_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TI, TB]
    s = s + ib_ref[:][:, None]
    ti, tb = s.shape
    m = jnp.max(s.reshape(ti // seg, seg, tb), axis=1)  # [TI/seg, TB]
    if transposed:
        # in-VMEM tile transpose: the store becomes [TB, TI/seg]-major so
        # the whole kernel output is [B, S]-major — no relayout before the
        # downstream approx_max_k
        out_ref[:] = m.T
    else:
        out_ref[:] = m


@functools.partial(
    jax.jit,
    static_argnames=("seg", "item_tile", "interpret", "transposed_out"),
)
def segmax_scores(
    uf: jax.Array,  # [B, D] bf16 (or f32)
    iv: jax.Array,  # [Ip, D] bf16 (or f32), Ip % item_tile == 0
    ib_cand: jax.Array,  # [Ip] f32: bias + validity penalty for pad items
    seg: int,
    item_tile: int = 2048,
    interpret: bool = False,
    transposed_out: bool = False,
) -> jax.Array:
    """[B, Ip//seg] f32 segment maxima of the full score matrix.

    ``transposed_out=True`` stores [B, S]-major directly (per-tile VMEM
    transpose) instead of [S, B]-major + a logical ``.T``."""
    B, D = uf.shape
    Ip = iv.shape[0]
    if Ip % item_tile or item_tile % seg:
        raise ValueError(f"geometry: {Ip=} {item_tile=} {seg=}")
    TB = min(128, B)
    if B % TB:
        raise ValueError(f"batch {B} not a multiple of user tile {TB}")
    grid = (B // TB, Ip // item_tile)
    kern = functools.partial(_kernel, seg=seg, transposed=transposed_out)
    common = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, D), lambda i, j: (i, 0)),
            pl.BlockSpec((item_tile, D), lambda i, j: (j, 0)),
            pl.BlockSpec((item_tile,), lambda i, j: (j,)),
        ],
        interpret=interpret,
    )
    if transposed_out:
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, Ip // seg), jnp.float32),
            out_specs=pl.BlockSpec(
                (TB, item_tile // seg), lambda i, j: (i, j)
            ),
            **common,
        )(uf, iv, ib_cand)
    out_t = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Ip // seg, B), jnp.float32),
        out_specs=pl.BlockSpec(
            (item_tile // seg, TB), lambda i, j: (j, i)
        ),
        **common,
    )(uf, iv, ib_cand)
    return out_t.T  # [B, S]
