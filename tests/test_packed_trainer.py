"""Packed-state fast path must match the unpacked LazyAdam path exactly
(same semantics, different memory layout)."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.train.fast import (
    init_lazy_state, make_fast_bprmf_step,
)
from fashionvisualexpl_tpu.train.packed import (
    make_packed_bprmf_step, pack_bprmf_state, unpack_bprmf_params,
)


def test_packed_matches_unpacked_lazy():
    U, I, K = 30, 40, 8
    model = BPRMF(U, I, embed_k=K)
    lr, reg = 0.02, 0.01
    params, _ = model.init(jax.random.PRNGKey(0))

    lazy_state = init_lazy_state(params, ("Gu", "Gi", "Bi"))
    packed_state = pack_bprmf_state(params)
    lazy_step = jax.jit(make_fast_bprmf_step(model, lr, reg, lazy=True))
    packed_step = jax.jit(make_packed_bprmf_step(model, lr, reg))

    rng = np.random.default_rng(3)
    for s in range(8):
        u = jnp.asarray(rng.integers(0, U, 16), jnp.int32)
        p = jnp.asarray(rng.integers(0, I, 16), jnp.int32)
        n = jnp.asarray(rng.integers(0, I, 16), jnp.int32)
        lazy_state, ll = lazy_step(lazy_state, (u, p, n))
        packed_state, pl_ = packed_step(packed_state, (u, p, n))
        np.testing.assert_allclose(float(pl_), float(ll), rtol=1e-6)

    got = unpack_bprmf_params(packed_state, K)
    for k in ("Bi", "Gu", "Gi"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(lazy_state.params[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(packed_state.tau_u), np.asarray(lazy_state.tau["Gu"])
    )
    np.testing.assert_array_equal(
        np.asarray(packed_state.tau_i), np.asarray(lazy_state.tau["Gi"])
    )
