"""Space-to-depth re-expression of the single-channel 5x5 edge conv.

The AttentiveFashion edges tower (reference AttentiveFashion.py:57-64) is
Conv2D(F, 5x5, SAME, relu) -> MaxPool(2x2, s2, SAME) -> GAP over a
SINGLE-channel [B, H, W, 1] edge map.  As a matmul that conv has
contraction depth kh*kw*Cin = 25 — the MXU's 128-deep contraction axis
runs ~20% utilized, and the output width F=64 fills only half the lane
axis (SPEED.md round-3 "conv contraction-depth wall").

This op re-expresses the SAME math on a 2x2 space-to-depth layout:

- input  [B, H, W, 1]  ->  X [B, H/2, W/2, 4]        (c = (ri, rj))
- kernel [5, 5, 1, F]  ->  W' [3, 3, 4, 4F]          (o = (di, dj, f))
- one SAME 3x3 conv on X computes ALL full-resolution conv outputs:
  output channel (di, dj, f) at packed pixel (p, q) equals the original
  conv output at full-res pixel (2p+di, 2q+dj).  Each output channel
  reads 25 of the 36 packed taps; the rest are structural zeros.
- the 2x2/stride-2 SAME maxpool windows are EXACTLY the (di, dj) groups,
  so pooling collapses to a max over 4 channels — the full-resolution
  [B, H, W, F] activation is never materialized.

Contraction depth becomes 36 (packed) with output width 4F=256: the MXU
lane axis fills completely and the batch dimension shrinks 4x, at the
cost of 36/25 structurally-zero MACs.  Numerically exact vs the direct
conv (same taps, same adds — pinned in tests/test_s2d_conv.py).

Requires H, W even (SAME-pad equivalence: 1 packed pixel = 2 full-res
pixels of zero padding); the kernel re-pack is a gather, so gradients
flow to conv_W/conv_b through the same map.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _s2d_kernel_index_map(kh: int = 5, kw: int = 5, s: int = 2):
    """[kh', kw', s*s, s*s] int map into the flattened [kh*kw] kernel
    (kh*kw = the 'missing tap' sentinel -> zero row).

    Entry [dp, dq, c=(ri,rj), o=(di,dj)] names the original kernel tap
    (u, v) that connects packed input channel (ri, rj) at packed offset
    (dp-1, dq-1) to full-res output offset (di, dj):
        u = s*(dp-1) + ri + (kh//2) - di,  v likewise.
    """
    khp = (kh // 2 + s - 1) // s * 2 + 1  # 3 for kh=5, s=2
    kwp = (kw // 2 + s - 1) // s * 2 + 1
    idx = np.full((khp, kwp, s * s, s * s), kh * kw, np.int32)
    for dp in range(khp):
        for dq in range(kwp):
            for ri in range(s):
                for rj in range(s):
                    for di in range(s):
                        for dj in range(s):
                            u = s * (dp - khp // 2) + ri + kh // 2 - di
                            v = s * (dq - kwp // 2) + rj + kw // 2 - dj
                            if 0 <= u < kh and 0 <= v < kw:
                                idx[dp, dq, ri * s + rj, di * s + dj] = (
                                    u * kw + v
                                )
    return idx


def pack_kernel_s2d(conv_W: jax.Array, s: int = 2) -> jax.Array:
    """[kh, kw, 1, F] -> [kh', kw', s^2, s^2 * F] packed kernel (gather —
    differentiable; dead taps read a structural zero row)."""
    kh, kw, cin, F = conv_W.shape
    if cin != 1:
        raise ValueError("space-to-depth repack assumes a 1-channel input")
    idx = jnp.asarray(_s2d_kernel_index_map(kh, kw, s))  # [kh',kw',s2,s2]
    flat = jnp.concatenate(
        [conv_W.reshape(kh * kw, F),
         jnp.zeros((1, F), conv_W.dtype)], axis=0
    )  # [kh*kw+1, F]
    w = flat[idx]  # [kh', kw', s2, s2, F]
    return w.reshape(idx.shape[0], idx.shape[1], s * s, s * s * F)


def space_to_depth(x: jax.Array, s: int = 2) -> jax.Array:
    """[B, H, W, 1] -> [B, H/s, W/s, s^2] (c-order: (ri, rj))."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // s, s, W // s, s, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // s, W // s, s * s * C)


def edge_tower_s2d_gap(images: jax.Array, conv_W: jax.Array,
                       conv_b: jax.Array) -> jax.Array:
    """conv(5x5, SAME) -> +b -> relu -> maxpool(2x2, s2, SAME) -> GAP,
    computed on the 2x2 space-to-depth layout.  images [B, H, W, 1]
    (H, W even) -> [B, F] float32.

    The conv/bias/relu/max run in the images' dtype (bf16 on the MXU when
    the caller casts); the GAP accumulates fp32 like the XLA path."""
    B, H, W, _ = images.shape
    if H % 2 or W % 2:
        raise ValueError("space-to-depth tower requires even H, W")
    F = conv_W.shape[-1]
    x = space_to_depth(images, 2)  # [B, H/2, W/2, 4]
    w = pack_kernel_s2d(conv_W.astype(images.dtype), 2)  # [3, 3, 4, 4F]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H/2, W/2, 4F] — channel o = (di, dj, f)
    y = y + jnp.tile(conv_b.astype(y.dtype), 4)
    y = jax.nn.relu(y)
    # maxpool == max over the (di, dj) group of 4
    y = y.reshape(B, H // 2, W // 2, 4, F).max(axis=3)
    return jnp.mean(y.astype(jnp.float32), axis=(1, 2))  # [B, F]
