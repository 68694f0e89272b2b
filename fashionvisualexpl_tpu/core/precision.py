"""Mixed-precision compute policy for encoder towers.

The v5e MXU is bfloat16-native: bf16 matmuls/convs run at full systolic
rate while fp32 falls back to multi-pass emulation.  The reference (TF
2.3.1) runs everything in fp32; here the FLOP-heavy trainable towers
(AttentiveFashion's modality encoders, CompVBPR's AlexNet-style edge CNN)
can opt into bf16 compute while keeping

- master params fp32 (the optimizer never sees bf16),
- loss, regularization, and score accumulation fp32,
- reductions with long accumulation chains (global average pool) fp32.

The policy is a per-model constructor argument (``compute_dtype``), not a
global flag, so fp32 models keep bit-exact reference parity by default.
"""

from __future__ import annotations

import jax.numpy as jnp

_ALLOWED = ("float32", "bfloat16")


def resolve_compute_dtype(name) -> jnp.dtype:
    """'float32' | 'bfloat16' (or a dtype) -> validated jnp dtype."""
    dt = jnp.dtype(name)
    if dt.name not in _ALLOWED:
        raise ValueError(
            f"compute_dtype must be one of {_ALLOWED}, got {dt.name}"
        )
    return dt


def cast_compute(x, dtype):
    """Cast an activation/weight to the compute dtype (no-op for fp32)."""
    return x if x.dtype == dtype else x.astype(dtype)


def cast_f32(x):
    """Cast a tower output back to fp32 for loss/score accumulation."""
    return x if x.dtype == jnp.float32 else x.astype(jnp.float32)
