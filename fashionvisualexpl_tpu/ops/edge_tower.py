"""Pallas fused edge-encoder tower: Conv5x5(SAME) -> ReLU -> MaxPool2x2 ->
GlobalAvgPool, computed per batch tile entirely in VMEM.

The reference edge encoder (AttentiveFashion.py:57-64) expands each
[H, W, 1] edge map into an [H, W, C] activation tensor that exists only to
be immediately pooled away.  In XLA that tensor (2.1GB bf16 at the scaled
step's 16k images) round-trips HBM once per op — profiled 27.7ms fwd+bwd,
with the maxpool backward's select-and-scatter alone at 7.9ms.  This
kernel never materializes it.

Formulation (every op Mosaic-legal — no lane-dim shape casts, no lane
shuffles):

- the 5x5 single-channel conv = sum over the 5 vertical taps ky of
  `rowshift(x, ky-2) @ M[ky]`, where M[ky] is the [W, C*W/2] BANDED
  matrix embedding the 5 horizontal taps (built in XLA from conv_W, so
  the kernel sees plain matmuls; band waste is W/5 = 6.4x FLOPs but the
  MXU runs them at full depth-W contraction vs the 25-deep im2col).
- TWO such matmul stacks produce the even-column and odd-column score
  planes; the horizontal 2-pool is then just max(z_even, z_odd) — the
  lane layout never changes.
- ReLU commutes with max, bias is uniform per pair: relu(max(ze,zo)+b).
- vertical 2-pool = sublane reshape [TB*H, L] -> [TB, H/2, 2, L] -> max.
- GAP = one [., L] @ Sel[L, C] matmul (Sel carries the 1/((H/2)(W/2))).

The backward kernel recomputes the forward (FLOPs are cheap, HBM is not),
routes grads through the two max stages with XLA's first-match tie rule
(even column / top row win ties, matching select-and-scatter's window
order), and accumulates dM/db on the MXU across the batch grid.  Images
are FROZEN features in every caller (AttentiveFashion's Fe_img) — the
custom VJP returns zeros for them by design.

Consumed by AttentiveFashion._edges_encode (edge_tower="fused"/"auto" on
TPU); pinned against edge_tower_gap_xla in tests/test_edge_tower.py.
CompVBPR's edge tower is the reference's AlexNet-style multi-layer CNN
(models/cnn.py, CompVBPR.py:96-103) — a different architecture this
single-conv kernel deliberately does not cover.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 5  # kernel size of the reference tower (AttentiveFashion.py:57)


def _placement(parity: int, w: int):
    """[K, W, W//2] 0/1 tensor P with P[kx, j', m] = 1 iff input column j'
    feeds tap kx of output column j = 2m + parity (SAME zero padding =
    out-of-range j' simply has no row)."""
    import numpy as np

    p = np.zeros((K, w, w // 2), np.float32)
    for kx in range(K):
        for m in range(w // 2):
            jp = 2 * m + parity + kx - K // 2
            if 0 <= jp < w:
                p[kx, jp, m] = 1.0
    return jnp.asarray(p)


def _banded(conv_w, placement, dtype):
    """conv_w [K, K, 1, C] -> M [K(ky), W, C*(W//2)] banded matmul weights."""
    w = conv_w[:, :, 0, :]  # [K(ky), K(kx), C]
    m = jnp.einsum("xjm,yxc->yjcm", placement, w)  # [ky, j', C, W//2]
    ky, jp, c, hw = m.shape
    return m.reshape(ky, jp, c * hw).astype(dtype)


def _unbanded(dm, placement):
    """Adjoint of _banded: dM [K, W, C*(W//2)] -> dconv_w [K, K, 1, C]."""
    ky, jp, l = dm.shape
    hw = placement.shape[2]
    dm3 = dm.reshape(ky, jp, l // hw, hw)
    dw = jnp.einsum("xjm,yjcm->yxc", placement, dm3.astype(jnp.float32))
    return dw[:, :, None, :]  # [ky, kx, 1, C]


def _shift_rows(x, dy, tb, h, w):
    """xs[b, i] = x[b, i+dy], zero-filled at image edges (SAME padding)."""
    if dy == 0:
        return x
    z = jnp.zeros((tb, abs(dy), w), x.dtype)
    if dy > 0:
        return jnp.concatenate([x[:, dy:, :], z], axis=1)
    return jnp.concatenate([z, x[:, :h + dy, :]], axis=1)


def _fwd_conv(x, me_ref, mo_ref, tb, h, w):
    """Even/odd column score planes [TB*H, L] (f32) + per-ky shifted rows."""
    xs_all = []
    ze = zo = None
    for ky in range(K):
        xs = _shift_rows(x, ky - K // 2, tb, h, w).reshape(tb * h, w)
        xs_all.append(xs)
        pe = jax.lax.dot_general(
            xs, me_ref[ky], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        po = jax.lax.dot_general(
            xs, mo_ref[ky], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ze = pe if ze is None else ze + pe
        zo = po if zo is None else zo + po
    return ze, zo, xs_all


def _fwd_kernel(x_ref, me_ref, mo_ref, bt_ref, sel_ref, out_ref):
    tb, h, w = x_ref.shape
    l = me_ref.shape[2]
    ze, zo, _ = _fwd_conv(x_ref[:], me_ref, mo_ref, tb, h, w)
    a = jax.nn.relu(jnp.maximum(ze, zo) + bt_ref[:][None, :])
    vm = a.reshape(tb, h // 2, 2, l).max(axis=2)  # vertical 2-pool
    g = jax.lax.dot_general(
        vm.reshape(tb * (h // 2), l), sel_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out_ref[:] = g.reshape(tb, h // 2, -1).sum(axis=1)


def _bwd_kernel(
    x_ref, me_ref, mo_ref, bt_ref, sel_ref, dout_ref,
    dme_ref, dmo_ref, dbt_ref,
):
    tb, h, w = x_ref.shape
    l = me_ref.shape[2]
    c = sel_ref.shape[1]
    ze, zo, xs_all = _fwd_conv(x_ref[:], me_ref, mo_ref, tb, h, w)
    pre = jnp.maximum(ze, zo) + bt_ref[:][None, :]
    a = jax.nn.relu(pre)
    a3 = a.reshape(tb, h // 2, 2, l)
    top, bot = a3[:, :, 0, :], a3[:, :, 1, :]

    # GAP adjoint: dvm = dout (broadcast over row groups) @ Sel^T
    dout = dout_ref[:]  # [TB, C]
    dout_rows = jnp.broadcast_to(
        dout[:, None, :], (tb, h // 2, c)
    ).reshape(tb * (h // 2), c)
    dvm = jax.lax.dot_general(
        dout_rows, sel_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tb, h // 2, l)

    # vertical max: top row wins ties (select-and-scatter window order)
    top_wins = top >= bot
    da3 = jnp.stack(
        [jnp.where(top_wins, dvm, 0.0), jnp.where(top_wins, 0.0, dvm)],
        axis=2,
    )
    da = da3.reshape(tb * h, l)
    dpre = jnp.where(pre > 0, da, 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dme_ref[:] = jnp.zeros_like(dme_ref)
        dmo_ref[:] = jnp.zeros_like(dmo_ref)
        dbt_ref[:] = jnp.zeros_like(dbt_ref)

    dbt_ref[:] += dpre.sum(axis=0, dtype=jnp.float32)[None, :]

    # horizontal max: even column wins ties
    even_wins = ze >= zo
    dze = jnp.where(even_wins, dpre, 0.0)
    dzo = dpre - dze
    cd = x_ref.dtype
    for ky in range(K):
        xs = xs_all[ky]
        dme_ref[ky] += jax.lax.dot_general(
            xs, dze.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dmo_ref[ky] += jax.lax.dot_general(
            xs, dzo.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def kernel_vmem_bytes(batch_tile: int, h: int, w: int, c: int,
                      cd_bytes: int) -> int:
    """Estimated peak scoped-VMEM bytes of the kernels at this geometry.

    Calibrated against the compiler's own accounting (fwd at TB=32,
    H=W=32, C=64, bf16 reported 16.78MB; this model gives 16.4MB): the
    dominant live set is the f32 even/odd score planes + activation +
    pooled rows, each [TB*H, L] with L = C*W/2.  The backward roughly
    doubles the plane count and adds the f32 dM accumulators."""
    L = c * (w // 2)
    planes_fwd = 3.5 * batch_tile * h * L * 4
    planes_bwd = 7.5 * batch_tile * h * L * 4
    shifted_x = 7 * batch_tile * h * w * cd_bytes
    weights = 2 * K * w * L * cd_bytes + L * c * 4
    dweights = 2 * K * w * L * 4
    fwd = planes_fwd + shifted_x + weights
    bwd = planes_bwd + shifted_x + weights + dweights
    return int(max(fwd, bwd))


def auto_batch_tile(h: int, w: int, c: int, cd_bytes: int = 4,
                    budget: int = 14 * 2 ** 20):
    """Largest power-of-two batch tile whose kernels fit the ~16MB scoped
    VMEM (with slack), or 0 when even TB=1 does not fit (callers fall back
    to the XLA tower — e.g. 224x224xC=64, whose score planes alone exceed
    VMEM; strip-mining the image rows is the future fix)."""
    for tb in (64, 32, 16, 8, 4, 2, 1):
        if kernel_vmem_bytes(tb, h, w, c, cd_bytes) <= budget:
            return tb
    return 0


def _pad_batch(arr, tile):
    b = arr.shape[0]
    pad = (-b) % tile
    if pad:
        arr = jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1))
    return arr


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def _fwd_call(images, me, mo, bt, sel, batch_tile, interpret):
    b = images.shape[0]
    x = _pad_batch(images[..., 0], batch_tile)
    bp, h, w = x.shape
    c = sel.shape[1]
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((bp, c), jnp.float32),
        grid=(bp // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec(me.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(mo.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(bt.shape, lambda i: (0,)),
            pl.BlockSpec(sel.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((batch_tile, c), lambda i: (i, 0)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(x, me, mo, bt, sel)
    return out[:b]


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def _bwd_call(images, me, mo, bt, sel, dout, batch_tile, interpret):
    x = _pad_batch(images[..., 0], batch_tile)
    dout = _pad_batch(dout.astype(jnp.float32), batch_tile)
    bp, h, w = x.shape
    dme, dmo, dbt = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(me.shape, jnp.float32),
            jax.ShapeDtypeStruct(mo.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, bt.shape[0]), jnp.float32),
        ),
        grid=(bp // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec(me.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(mo.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(bt.shape, lambda i: (0,)),
            pl.BlockSpec(sel.shape, lambda i: (0, 0)),
            pl.BlockSpec((batch_tile, dout.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec(me.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(mo.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec((1, bt.shape[0]), lambda i: (0, 0)),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(x, me, mo, bt, sel, dout)
    return dme, dmo, dbt[0]


def _weights(conv_w, conv_b, h, w, dtype):
    c = conv_w.shape[3]
    pe, po = _placement(0, w), _placement(1, w)
    me = _banded(conv_w, pe, dtype)
    mo = _banded(conv_w, po, dtype)
    bt = jnp.broadcast_to(
        conv_b.astype(jnp.float32)[:, None], (c, w // 2)
    ).reshape(c * (w // 2))
    sel = (
        jnp.eye(c, dtype=jnp.float32)[:, None, :]
        .repeat(w // 2, axis=1)
        .reshape(c * (w // 2), c)
        / float((h // 2) * (w // 2))
    )
    return me, mo, bt, sel, pe, po


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def edge_tower_gap(
    images, conv_w, conv_b, batch_tile: int = 32, interpret: bool = False
):
    """GAP(MaxPool2x2(ReLU(Conv5x5_SAME(images) + b))) -> [B, C] f32.

    images [B, H, W, 1] (H, W even); conv_w [5, 5, 1, C]; conv_b [C].
    Differentiable in conv_w/conv_b only — images are frozen features in
    every caller; their gradient is returned as zeros.
    """
    h, w = images.shape[1:3]
    me, mo, bt, sel, _, _ = _weights(conv_w, conv_b, h, w, images.dtype)
    return _fwd_call(images, me, mo, bt, sel, batch_tile, interpret)


def _vjp_fwd(images, conv_w, conv_b, batch_tile, interpret):
    return (
        edge_tower_gap(images, conv_w, conv_b, batch_tile, interpret),
        (images, conv_w, conv_b),
    )


def _vjp_bwd(batch_tile, interpret, res, dout):
    images, conv_w, conv_b = res
    h, w = images.shape[1:3]
    me, mo, bt, sel, pe, po = _weights(
        conv_w, conv_b, h, w, images.dtype
    )
    dme, dmo, dbt = _bwd_call(
        images, me, mo, bt, sel, dout, batch_tile, interpret
    )
    dw = _unbanded(dme, pe) + _unbanded(dmo, po)
    c = conv_b.shape[0]
    db = dbt.reshape(c, w // 2).sum(axis=1)
    return (
        jnp.zeros_like(images),
        dw.astype(conv_w.dtype),
        db.astype(conv_b.dtype),
    )


edge_tower_gap.defvjp(_vjp_fwd, _vjp_bwd)


def edge_tower_gap_xla(images, conv_w, conv_b):
    """Reference XLA implementation (what attentive_fashion's encoder
    computed inline) — the oracle for the fused kernel's tests."""
    y = jax.lax.conv_general_dilated(
        images, conv_w.astype(images.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + conv_b.astype(images.dtype)
    y = jax.nn.relu(y)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )
    return jnp.mean(y.astype(jnp.float32), axis=(1, 2))
