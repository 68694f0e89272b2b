"""bf16 Adam-moment storage for packed rows (moment_dtype='bfloat16').

The generic packed engine can bit-pack (m, v) as two bf16 halves of one
fp32 column — rows shrink from 3W+1 to 2W+1 columns.  These tests pin the
pack/unpack bit mechanics, the engine's layout handling (vector tables +
scalar triples + fused frozen columns), and that the quantized-moment
trajectory tracks the fp32 one (it cannot be bit-equal: ~8-bit moment
mantissas are the measured trade).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.train.packed_generic import (
    _mv_pack,
    _mv_unpack,
    make_generic_packed_epoch_fn,
    pack_generic_state,
    unpack_generic_params,
)


def test_mv_pack_roundtrip():
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    v = jnp.asarray((rng.random((5, 7)) * 1e-3).astype(np.float32))
    m2, v2 = _mv_unpack(_mv_pack(m, v))
    # bf16 keeps 8 mantissa bits -> rel error <= 2^-8
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1 / 256)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1 / 256)
    # zero bits decode to exact (0, 0) — pack_generic_state zero-init
    z = jnp.zeros((3,), jnp.float32)
    m0, v0 = _mv_unpack(z)
    np.testing.assert_array_equal(np.asarray(m0), 0.0)
    np.testing.assert_array_equal(np.asarray(v0), 0.0)
    # exact bf16 values roundtrip bit-exactly
    me = jnp.asarray([1.0, -0.5, 2.0], jnp.float32)
    ve = jnp.asarray([0.25, 4.0, 0.0], jnp.float32)
    m3, v3 = _mv_unpack(_mv_pack(me, ve))
    np.testing.assert_array_equal(np.asarray(m3), np.asarray(me))
    np.testing.assert_array_equal(np.asarray(v3), np.asarray(ve))


def _run_engine(model, data, frozen, moment_dtype, epochs=3, lr=0.01,
                fused_frozen=False):
    params, _ = model.init(jax.random.PRNGKey(1))
    batch = 16
    steps = data.steps_per_epoch(batch)
    state = pack_generic_state(
        model, params, frozen=frozen if fused_frozen else None,
        moment_dtype=moment_dtype,
    )
    ep = make_generic_packed_epoch_fn(
        model, lr, 0.01, data.num_items, steps, batch,
        with_replacement=False, fused_frozen=fused_frozen,
        moment_dtype=moment_dtype,
    )
    args = (
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
    )
    losses = []
    for e in range(epochs):
        state, loss = ep(state, frozen, jax.random.fold_in(
            jax.random.PRNGKey(0), e), *args)
        losses.append(float(loss))
    return state, losses


def test_bf16_moments_track_fp32_vbpr():
    """VBPR exercises vector tables (Gu/Tu/Gi) + the Bi scalar triple.
    The bf16-moment trajectory must track fp32 closely (not bit-equal)."""
    from fashionvisualexpl_tpu.models.vbpr import VBPR

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    feats = synthetic_features(30, 12, seed=1)
    model = VBPR(24, 30, feats, embed_k=8, embed_d=4)
    _, frozen = model.init(jax.random.PRNGKey(1))

    s32, l32 = _run_engine(model, data, frozen, "float32")
    s16, l16 = _run_engine(model, data, frozen, "bfloat16")
    # row widths: 3W+1 vs 2W+1
    spec = model.packed_spec()
    Wu = sum(w for _, w in spec.user_tables)
    Wi = sum(w for _, w in spec.item_tables)
    assert s32.user_pmv.shape[1] == 3 * Wu + 1
    assert s16.user_pmv.shape[1] == 2 * Wu + 1
    assert s32.item_pmv.shape[1] == 3 * Wi + 3 + 1
    assert s16.item_pmv.shape[1] == 2 * Wi + 2 + 1
    assert l16[-1] < l16[0], "bf16-moment training diverged"
    for a, b in zip(l16, l32):
        np.testing.assert_allclose(a, b, rtol=0.02)
    p32 = unpack_generic_params(s32, spec)
    p16 = unpack_generic_params(s16, spec)
    for name in ("Gu", "Tu", "Gi", "Bi", "E", "Bp"):
        a, b = np.asarray(p16[name]), np.asarray(p32[name])
        assert np.abs(a - b).max() < 0.05, name  # lr=0.01, 27 steps
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999, name


def test_bf16_moments_with_fused_frozen():
    """Fused frozen columns must sit at the bf16 layout's F0 and pass
    through updates unchanged."""
    from fashionvisualexpl_tpu.models.vbpr import VBPR

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    feats = synthetic_features(30, 12, seed=1)
    model = VBPR(24, 30, feats, embed_k=8, embed_d=4)
    _, frozen = model.init(jax.random.PRNGKey(1))
    s_plain, l_plain = _run_engine(model, data, frozen, "bfloat16")
    s_fused, l_fused = _run_engine(model, data, frozen, "bfloat16",
                                   fused_frozen=True)
    np.testing.assert_allclose(l_fused, l_plain, rtol=1e-6)
    spec = model.packed_spec()
    pa = unpack_generic_params(s_plain, spec)
    pb = unpack_generic_params(s_fused, spec)
    for name in ("Gu", "Gi", "Bi"):
        np.testing.assert_allclose(
            np.asarray(pb[name]), np.asarray(pa[name]),
            rtol=1e-5, atol=1e-7, err_msg=name,
        )
    # frozen cols in the fused rows unchanged by 3 epochs of updates
    Wi = sum(w for _, w in spec.item_tables)
    F0 = 2 * Wi + 2 * len(spec.item_scalars)
    np.testing.assert_array_equal(
        np.asarray(s_fused.item_pmv[:, F0:-1]),
        np.asarray(frozen["F"], np.float32),
    )


def test_mv_pack_fp8_roundtrip():
    """fp8 quad packing: m and sqrt(v) as e5m2 codes (x256 pre-scale),
    four per fp32 column, odd widths padded."""
    from fashionvisualexpl_tpu.train.packed_generic import (
        _mv_pack_fp8,
        _mv_unpack_fp8,
    )

    rng = np.random.default_rng(0)
    for W in (7, 8):
        m = jnp.asarray((rng.normal(size=(5, W)) * 1e-3).astype(np.float32))
        v = jnp.asarray((rng.random((5, W)) * 1e-6).astype(np.float32))
        cols = _mv_pack_fp8(m, v)
        assert cols.shape == (5, (W + 1) // 2)
        m2, v2 = _mv_unpack_fp8(cols, W)
        # e5m2 keeps 2 mantissa bits -> rel error <= 2^-3 on m and sqrt(v)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=0.13)
        np.testing.assert_allclose(
            np.sqrt(np.asarray(v2)), np.sqrt(np.asarray(v)), rtol=0.13
        )
    # zero bits decode to exact (0, 0) — pack_generic_state zero-init
    m0, v0 = _mv_unpack_fp8(jnp.zeros((3, 2), jnp.float32), 4)
    np.testing.assert_array_equal(np.asarray(m0), 0.0)
    np.testing.assert_array_equal(np.asarray(v0), 0.0)
    # exactly-representable values roundtrip bit-exactly
    me = jnp.asarray([[0.25, -0.5, 2.0, 0.0]], jnp.float32)
    ve = jnp.asarray([[1.0, 0.0625, 4.0, 0.0]], jnp.float32)
    m3, v3 = _mv_unpack_fp8(_mv_pack_fp8(me, ve), 4)
    np.testing.assert_array_equal(np.asarray(m3), np.asarray(me))
    np.testing.assert_array_equal(np.asarray(v3), np.asarray(ve))


def test_fp8_moments_track_fp32_vbpr():
    """fp8-moment training must follow the fp32 trajectory (loosely: ~2-bit
    moment mantissas) and the rows must take the 1.5W layout."""
    from fashionvisualexpl_tpu.models.vbpr import VBPR

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    feats = synthetic_features(30, 12, seed=1)
    model = VBPR(24, 30, feats, embed_k=8, embed_d=4)
    _, frozen = model.init(jax.random.PRNGKey(1))

    s32, l32 = _run_engine(model, data, frozen, "float32")
    s8, l8 = _run_engine(model, data, frozen, "float8")
    spec = model.packed_spec()
    Wu = sum(w for _, w in spec.user_tables)
    Wi = sum(w for _, w in spec.item_tables)
    assert s8.user_pmv.shape[1] == Wu + (Wu + 1) // 2 + 1
    assert s8.item_pmv.shape[1] == Wi + (Wi + 1) // 2 + 2 + 1
    assert l8[-1] < l8[0], "fp8-moment training diverged"
    for a, b in zip(l8, l32):
        np.testing.assert_allclose(a, b, rtol=0.05)
    p32 = unpack_generic_params(s32, spec)
    p8 = unpack_generic_params(s8, spec)
    for name in ("Gu", "Tu", "Gi", "Bi", "E", "Bp"):
        a, b = np.asarray(p8[name]), np.asarray(p32[name])
        assert np.abs(a - b).max() < 0.1, name  # lr=0.01, 27 steps
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.995, name


def test_fp8_moments_acf_extra_items():
    """The target workload: ACF's extra-item-rows path (per-triple positive
    -set gathers) on fp8 moments — must train and track fp32."""
    from fashionvisualexpl_tpu.models.acf import ACF

    data = synthetic_interactions(20, 24, interactions_per_user=6, seed=2)
    rng = np.random.default_rng(3)
    spat = rng.normal(size=(24, 3, 5)).astype(np.float32)
    model = ACF(20, 24, spat, data, embed_k=8,
                layers_component=(4, 1), layers_item=(4, 1), max_user_pos=4)
    _, frozen = model.init(jax.random.PRNGKey(2))
    _, l32 = _run_engine(model, data, frozen, "float32")
    _, l8 = _run_engine(model, data, frozen, "float8")
    assert l8[-1] < l8[0]
    for a, b in zip(l8, l32):
        np.testing.assert_allclose(a, b, rtol=0.05)


def test_fp8_moments_with_fused_frozen():
    """Fused frozen columns must sit at the fp8 layout's F0 and pass
    through unchanged."""
    from fashionvisualexpl_tpu.models.vbpr import VBPR

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    feats = synthetic_features(30, 12, seed=1)
    model = VBPR(24, 30, feats, embed_k=8, embed_d=4)
    _, frozen = model.init(jax.random.PRNGKey(1))
    s_plain, l_plain = _run_engine(model, data, frozen, "float8")
    s_fused, l_fused = _run_engine(model, data, frozen, "float8",
                                   fused_frozen=True)
    np.testing.assert_allclose(l_fused, l_plain, rtol=1e-6)
    spec = model.packed_spec()
    Wi = sum(w for _, w in spec.item_tables)
    F0 = Wi + (Wi + 1) // 2 + 2 * len(spec.item_scalars)
    np.testing.assert_array_equal(
        np.asarray(s_fused.item_pmv[:, F0:-1]),
        np.asarray(frozen["F"], np.float32),
    )


@pytest.mark.parametrize("moment_dtype", ["float32", "bfloat16"])
def test_row_align_bit_identical(moment_dtype):
    """Capacity mode (row_align=128): padded rows must reproduce the
    unpadded layout's trajectory — the pads are dead columns that ride the
    gathers/scatters untouched.  (Not bit-exact: the wider gather shapes
    change XLA's reduction tiling in the loss sums, a last-ulp effect.)"""
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.packed_generic import _row_pad

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    feats = synthetic_features(30, 12, seed=1)
    model = VBPR(24, 30, feats, embed_k=8, embed_d=4)
    _, frozen = model.init(jax.random.PRNGKey(1))

    def run(row_align):
        params, _ = model.init(jax.random.PRNGKey(1))
        batch = 16
        steps = data.steps_per_epoch(batch)
        state = pack_generic_state(
            model, params, moment_dtype=moment_dtype, row_align=row_align
        )
        ep = make_generic_packed_epoch_fn(
            model, 0.01, 0.01, data.num_items, steps, batch,
            with_replacement=False, moment_dtype=moment_dtype,
            lazy_catchup=True,
        )
        args = (jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
                jnp.asarray(data.pos_counts))
        losses = []
        for e in range(3):
            state, loss = ep(state, frozen, jax.random.fold_in(
                jax.random.PRNGKey(0), e), *args)
            losses.append(float(loss))
        return state, losses

    s1, l1 = run(1)
    s128, l128 = run(128)
    assert s128.user_pmv.shape[1] % 128 == 0
    assert s128.item_pmv.shape[1] % 128 == 0
    assert s128.user_pmv.shape[1] > s1.user_pmv.shape[1]
    np.testing.assert_allclose(l128, l1, rtol=1e-6)
    spec = model.packed_spec()
    p1 = unpack_generic_params(s1, spec, moment_dtype=moment_dtype)
    p128 = unpack_generic_params(s128, spec, moment_dtype=moment_dtype)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p128[k]), np.asarray(p1[k]), rtol=1e-5, atol=1e-7,
            err_msg=k,
        )
    # pad columns stay exactly zero after training
    base_u = s1.user_pmv.shape[1]
    np.testing.assert_array_equal(
        np.asarray(s128.user_pmv[:, base_u:]), 0.0
    )
    assert _row_pad(base_u, 128) == s128.user_pmv.shape[1] - base_u


@pytest.mark.parametrize("moment_dtype", ["bfloat16", "float8"])
def test_row_align_with_fused_frozen(moment_dtype):
    """row_align + fused frozen columns: the frozen tail sits between F0
    and tau, pads after tau — all three must slice correctly."""
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.packed_generic import _row_pad

    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    feats = synthetic_features(30, 12, seed=1)
    model = VBPR(24, 30, feats, embed_k=8, embed_d=4)
    _, frozen = model.init(jax.random.PRNGKey(1))
    s_plain, l_plain = _run_engine(model, data, frozen, moment_dtype,
                                   fused_frozen=True)
    # re-run with row_align by direct engine calls (same seeds)
    params, _ = model.init(jax.random.PRNGKey(1))
    batch = 16
    steps = data.steps_per_epoch(batch)
    state = pack_generic_state(model, params, frozen=frozen,
                               moment_dtype=moment_dtype, row_align=128)
    assert state.item_pmv.shape[1] % 128 == 0
    ep = make_generic_packed_epoch_fn(
        model, 0.01, 0.01, data.num_items, steps, batch,
        with_replacement=False, fused_frozen=True,
        moment_dtype=moment_dtype,
    )
    args = (jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
            jnp.asarray(data.pos_counts))
    losses = []
    for e in range(3):
        state, loss = ep(state, frozen, jax.random.fold_in(
            jax.random.PRNGKey(0), e), *args)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, l_plain, rtol=1e-6)
    spec = model.packed_spec()
    pa = unpack_generic_params(s_plain, spec, moment_dtype=moment_dtype)
    pb = unpack_generic_params(state, spec, moment_dtype=moment_dtype)
    for k in ("Gu", "Gi", "Bi", "Tu"):
        np.testing.assert_allclose(
            np.asarray(pb[k]), np.asarray(pa[k]), rtol=1e-5, atol=1e-7,
            err_msg=k,
        )
    # frozen cols still exactly the feature matrix; pads still zero
    Wi = sum(w for _, w in spec.item_tables)
    from fashionvisualexpl_tpu.train.packed_generic import (
        _mom_width, _scalar_group,
    )
    F0 = Wi + _mom_width(moment_dtype, Wi) + _scalar_group(
        moment_dtype) * len(spec.item_scalars)
    fw = sum(w for _, w in spec.frozen_item_tables)
    tau_i = F0 + fw
    np.testing.assert_array_equal(
        np.asarray(state.item_pmv[:, F0:tau_i]),
        np.asarray(frozen["F"], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(state.item_pmv[:, tau_i + 1:]), 0.0
    )


def test_row_align_sharded_matches_single_device():
    """row_align over the mesh: the sharded engine must pass the pads
    through its taucol apply and match the single-device padded run."""
    from fashionvisualexpl_tpu.core.mesh import make_mesh
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_generic_packed_spmd_epoch_fn, shard_generic_packed_state,
    )

    mesh = make_mesh(data=2, model=4)
    data = synthetic_interactions(24, 32, interactions_per_user=8, seed=3)
    model = BPRMF(24, 32, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(2))
    lr, reg, batch = 0.01, 0.01, 16
    steps = data.steps_per_epoch(batch)
    args = (jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
            jnp.asarray(data.pos_counts))

    s1 = pack_generic_state(model, params, moment_dtype="bfloat16",
                            row_align=128)
    ep1 = make_generic_packed_epoch_fn(
        model, lr, reg, data.num_items, steps, batch,
        with_replacement=False, moment_dtype="bfloat16", lazy_catchup=True,
    )
    s8 = shard_generic_packed_state(
        pack_generic_state(model, params, moment_dtype="bfloat16",
                           row_align=128), mesh
    )
    ep8 = make_generic_packed_spmd_epoch_fn(
        model, mesh, lr, reg, data.num_items, steps, batch,
        moment_dtype="bfloat16", lazy_catchup=True,
    )
    key = jax.random.PRNGKey(0)
    for e in range(2):
        k = jax.random.fold_in(key, e)
        s1, l1 = ep1(s1, frozen, k, *args)
        s8, l8 = ep8(s8, frozen, k, *args)
        np.testing.assert_allclose(float(l8), float(l1), rtol=2e-4)
    spec = model.packed_spec()
    # padded widths at tiny Wu are ambiguous across layouts — the explicit
    # moment_dtype (what GenericPackedTrainState carries) resolves them
    p1 = unpack_generic_params(s1, spec, moment_dtype="bfloat16")
    p8 = unpack_generic_params(s8, spec, moment_dtype="bfloat16")
    for name in ("Gu", "Gi", "Bi"):
        got = np.asarray(p8[name])[: np.asarray(p1[name]).shape[0]]
        np.testing.assert_allclose(
            got, np.asarray(p1[name]), rtol=3e-4, atol=2e-5, err_msg=name,
        )


def test_fp8_rejected_by_sharded_engine():
    from fashionvisualexpl_tpu.core.mesh import make_mesh
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_generic_packed_spmd_epoch_fn,
    )

    model = BPRMF(24, 32, embed_k=8)
    mesh = make_mesh(data=4, model=2)
    with pytest.raises(ValueError, match="single-device only"):
        make_generic_packed_spmd_epoch_fn(
            model, mesh, 0.01, 0.01, 32, 2, 16, moment_dtype="float8"
        )


def test_trainer_moment_dtype():
    """fit() honors TrainConfig.moment_dtype on BOTH the single-device and
    the sharded packed paths (8-device virtual mesh)."""
    from fashionvisualexpl_tpu.core.config import MeshConfig, TrainConfig
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.trainer import fit

    data = synthetic_interactions(24, 32, interactions_per_user=8, seed=0)
    model = BPRMF(24, 32, embed_k=8)
    cfg = TrainConfig(batch_size=16, epochs=3, lr=0.05, reg=0.001,
                      train_path="packed", moment_dtype="bfloat16",
                      lazy_catchup=True, eval_every=10)
    state, frozen, results, extra = fit(model, data, cfg)
    history = extra["history"]
    assert history[-1].loss < history[0].loss

    cfg_mesh = cfg.replace(mesh=MeshConfig(data=4, model=2))
    model2 = BPRMF(24, 32, embed_k=8)
    state2, frozen2, results2, extra2 = fit(model2, data, cfg_mesh)
    h2 = extra2["history"]
    assert h2[-1].loss < h2[0].loss


def test_sharded_bf16_catchup_matches_single_device():
    """Sharded generic engine with bf16 moments + momentum catch-up ==
    single-device engine with the same options (the 10^8-row regime the
    option exists for IS the multi-chip regime)."""
    from fashionvisualexpl_tpu.core.mesh import make_mesh
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.parallel.fast_spmd import (
        make_generic_packed_spmd_epoch_fn, shard_generic_packed_state,
    )
    from fashionvisualexpl_tpu.parallel.spmd import shard_params

    mesh = make_mesh(data=2, model=4)
    data = synthetic_interactions(24, 30, interactions_per_user=8, seed=0)
    feats = synthetic_features(30, 12, seed=1)
    model = VBPR(24, 30, feats, embed_k=8, embed_d=4)
    params, frozen = model.init(jax.random.PRNGKey(1))
    lr, reg, batch = 0.01, 0.01, 16
    steps = data.steps_per_epoch(batch)
    args = (jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
            jnp.asarray(data.pos_counts))
    key = jax.random.PRNGKey(0)

    s1 = pack_generic_state(model, params, moment_dtype="bfloat16")
    ep1 = make_generic_packed_epoch_fn(
        model, lr, reg, data.num_items, steps, batch,
        with_replacement=False, moment_dtype="bfloat16", lazy_catchup=True,
    )
    _, frozen_sh = shard_params(model, params, frozen, mesh)
    s8 = shard_generic_packed_state(
        pack_generic_state(model, params, moment_dtype="bfloat16"), mesh
    )
    ep8 = make_generic_packed_spmd_epoch_fn(
        model, mesh, lr, reg, data.num_items, steps, batch,
        moment_dtype="bfloat16", lazy_catchup=True,
    )
    for e in range(3):
        k = jax.random.fold_in(key, e)
        s1, l1 = ep1(s1, frozen, k, *args)
        s8, l8 = ep8(s8, frozen_sh, k, *args)
        np.testing.assert_allclose(float(l8), float(l1), rtol=2e-4)
    spec = model.packed_spec()
    p1 = unpack_generic_params(s1, spec)
    p8 = unpack_generic_params(s8, spec)
    for name in ("Gu", "Tu", "Gi", "Bi"):
        got = np.asarray(p8[name])[: np.asarray(p1[name]).shape[0]]
        np.testing.assert_allclose(
            got, np.asarray(p1[name]), rtol=3e-4, atol=2e-5, err_msg=name,
        )
