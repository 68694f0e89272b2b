"""AlexNet-style trainable CNN encoder (reference src/recommender/models/
cnn.py:10-66): 5 conv blocks + 3 FC layers to a k-dim embedding, used as a
trainable image encoder (the reference wires it into its ExplVBPR/CompVBPR
variants as the edge-image tower).

Pure-functional JAX implementation, NHWC layout (MXU-friendly convs).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fashionvisualexpl_tpu.core.precision import (
    cast_compute,
    cast_f32,
    resolve_compute_dtype,
)
from fashionvisualexpl_tpu.models.base import glorot_uniform


def _conv(x, W, b, strides=(1, 1)):
    y = jax.lax.conv_general_dilated(
        x, W, window_strides=strides, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="SAME",
    )


def _dropout(x, rate, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


class CNN:
    """conv(64,11x11,s4) -> pool -> conv(256,5x5) -> pool -> 3x conv(256,3x3)
    -> pool -> FC4096 -> FC4096 -> FC k  (reference cnn.py:13-34)."""

    def __init__(self, k: int, in_channels: int = 3,
                 input_hw: Tuple[int, int] = (224, 224),
                 dropout_rate: float = 0.5,
                 compute_dtype: str = "float32"):
        self.k = k
        self.in_channels = in_channels
        self.input_hw = input_hw
        self.dropout_rate = dropout_rate
        # bf16 MXU path for the convs/FCs (core/precision.py); params and
        # the tower output stay fp32
        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        # spatial size after stride-4 conv and three 2x2 same-pools
        h, w = input_hw
        h = -(-h // 4); w = -(-w // 4)
        for _ in range(3):
            h = -(-h // 2); w = -(-w // 2)
        self.flat_dim = h * w * 256

    def init(self, rng: jax.Array) -> Dict[str, jax.Array]:
        ks = iter(jax.random.split(rng, 16))
        p = {
            "conv1_W": glorot_uniform(next(ks), (11, 11, self.in_channels, 64)),
            "conv1_b": jnp.zeros((64,)),
            "conv2_W": glorot_uniform(next(ks), (5, 5, 64, 256)),
            "conv2_b": jnp.zeros((256,)),
            "conv3_W": glorot_uniform(next(ks), (3, 3, 256, 256)),
            "conv3_b": jnp.zeros((256,)),
            "conv4_W": glorot_uniform(next(ks), (3, 3, 256, 256)),
            "conv4_b": jnp.zeros((256,)),
            "conv5_W": glorot_uniform(next(ks), (3, 3, 256, 256)),
            "conv5_b": jnp.zeros((256,)),
            "fc6_W": glorot_uniform(next(ks), (self.flat_dim, 4096)),
            "fc6_b": jnp.zeros((4096,)),
            "fc7_W": glorot_uniform(next(ks), (4096, 4096)),
            "fc7_b": jnp.zeros((4096,)),
            "fc8_W": glorot_uniform(next(ks), (4096, self.k)),
            "fc8_b": jnp.zeros((self.k,)),
        }
        return p

    def apply(self, params, images, rng=None):
        """images [B, H, W, C] -> [B, k].  rng enables train-mode dropout."""
        cd = self.compute_dtype
        p = {k: cast_compute(v, cd) for k, v in params.items()}
        x = cast_compute(images, cd)
        x = jax.nn.relu(_conv(x, p["conv1_W"], p["conv1_b"], strides=(4, 4)))
        x = _maxpool(x)
        x = jax.nn.relu(_conv(x, p["conv2_W"], p["conv2_b"]))
        x = _maxpool(x)
        x = jax.nn.relu(_conv(x, p["conv3_W"], p["conv3_b"]))
        x = jax.nn.relu(_conv(x, p["conv4_W"], p["conv4_b"]))
        x = jax.nn.relu(_conv(x, p["conv5_W"], p["conv5_b"]))
        x = _maxpool(x)
        x = x.reshape(x.shape[0], -1)
        r1, r2 = (None, None) if rng is None else jax.random.split(rng)
        x = jax.nn.relu(x @ p["fc6_W"] + p["fc6_b"])
        x = _dropout(x, self.dropout_rate, r1)
        x = jax.nn.relu(x @ p["fc7_W"] + p["fc7_b"])
        x = _dropout(x, self.dropout_rate, r2)
        return cast_f32(x @ p["fc8_W"] + p["fc8_b"])
