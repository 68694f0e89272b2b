"""Sharded fast path: row-sharded tables + compact-grad sparse-apply Adam.

Combines the two scaling mechanisms into one SPMD step (the training path of
BASELINE.json config 5 — sharded embedding training across chips/hosts):

- tables and their Adam moments row-sharded over the `model` mesh axis,
  batch sharded over `data` (parallel/spmd.py's layout);
- the fast path's dense-gradient-free update (train/fast.py): grads wrt
  gathered rows only, sort + segment-sum dedupe, pre-scaled unique scatter,
  one fused decay+update sweep over the LOCAL shard.

Per step and device: collective lookup = masked local gather + psum over
`model` (ICI); row-grad psum over `data`; then every model-shard applies the
compact updates that land in its row range — no dense table gradients, no
cross-shard optimizer traffic.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fashionvisualexpl_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from fashionvisualexpl_tpu.data.sampler import sample_triplets
from fashionvisualexpl_tpu.models.base import bpr_pairwise_loss, l2_loss
from fashionvisualexpl_tpu.train.fast import (
    B1,
    B2,
    EPS,
    FastState,
    compact_row_grads,
)


def _sharded_take(table_shard, ids, axis_name=MODEL_AXIS):
    """Masked local gather + psum (collective lookup for row-sharded tables)."""
    shard = jax.lax.axis_index(axis_name)
    rows = table_shard.shape[0]
    local = ids - shard * rows
    ok = jnp.logical_and(local >= 0, local < rows)
    vals = jnp.take(table_shard, jnp.where(ok, local, 0), axis=0)
    # broadcast over ALL trailing table dims (4-D image tables included)
    mask = ok.reshape(ok.shape + (1,) * (vals.ndim - ok.ndim))
    return jax.lax.psum(jnp.where(mask, vals, 0.0), axis_name)


def _sharded_sparse_adam(p, m, v, uids, g, lr, t, axis_name=MODEL_AXIS):
    """Sparse-apply Adam on a row shard: scatter only the compact rows this
    shard owns (pre-scaled, so the uniform decay completes the exact Adam
    update), then one fused local sweep."""
    shard = jax.lax.axis_index(axis_name)
    rows = p.shape[0]
    local = uids - shard * rows
    ok = jnp.logical_and(local >= 0, local < rows)
    # non-owned (and pad) ids route OUT OF RANGE: JAX drops out-of-bounds
    # scatter updates, keeping the applied index set unique — mapping them
    # to row 0 would put duplicate 0s into a unique_indices scatter (UB)
    safe = jnp.where(ok, local, rows)
    if g.ndim < m.ndim:
        g = g[..., None] if m.ndim == 2 and g.ndim == 1 else g
    gmask = ok if g.ndim == 1 else ok[:, None]
    gm = jnp.where(gmask, (1.0 - B1) / B1 * g, 0.0)
    gv = jnp.where(gmask, (1.0 - B2) / B2 * jnp.square(g), 0.0)
    m = m.at[safe].add(gm, unique_indices=True)
    v = v.at[safe].add(gv, unique_indices=True)
    m = m * B1
    v = v * B2
    m_hat = m / (1.0 - B1 ** t)
    v_hat = v / (1.0 - B2 ** t)
    p = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
    return p, m, v


def make_fast_spmd_epoch_fn(
    model,  # BPRMF
    mesh: Mesh,
    lr: float,
    reg: float,
    num_items: int,
    steps: int,
    batch: int,
    with_replacement: bool = False,
) -> Callable:
    """Sharded fast epoch for BPRMF: one jitted program — on-device sampling,
    lax.scan of shard_mapped fast steps."""
    d_size = mesh.shape[DATA_AXIS]
    if batch % d_size != 0:
        raise ValueError(f"batch {batch} not divisible by data axis {d_size}")

    def local_step(state: FastState, u, p_ids, n_ids):
        """Runs per-device: u/p/n are this data-shard's batch slice; params
        and moments are this model-shard's rows."""
        Pp = state.params
        gu = _sharded_take(Pp["Gu"], u)
        gp = _sharded_take(Pp["Gi"], p_ids)
        gn = _sharded_take(Pp["Gi"], n_ids)
        bp = _sharded_take(Pp["Bi"], p_ids)
        bn = _sharded_take(Pp["Bi"], n_ids)

        def local_loss(gu, gp, gn, bp, bn):
            x_pos = bp + jnp.sum(gu * gp, axis=1)
            x_neg = bn + jnp.sum(gu * gn, axis=1)
            loss = bpr_pairwise_loss(x_pos, x_neg)
            return loss + (
                reg * (l2_loss(gu) + l2_loss(gp) + l2_loss(gn)) * 2.0
                + reg * l2_loss(bp) * 2.0
                + reg * l2_loss(bn) * 2.0 / 10.0
            )

        loss, grads = jax.value_and_grad(
            local_loss, argnums=(0, 1, 2, 3, 4)
        )(gu, gp, gn, bp, bn)
        loss = jax.lax.psum(loss, DATA_AXIS)

        # gather ids + row grads across the data axis so every device holds
        # the full batch's contributions, then dedupe once
        def gather_all(x):
            g = jax.lax.all_gather(x, DATA_AXIS)
            return g.reshape((-1,) + g.shape[2:])

        u_all = gather_all(u)
        p_all = gather_all(p_ids)
        n_all = gather_all(n_ids)
        dgu, dgp, dgn, dbp, dbn = (gather_all(g) for g in grads)

        t = (state.step + 1).astype(jnp.float32)
        B = u_all.shape[0]
        new_p, new_m, new_v = (
            dict(Pp), dict(state.mu), dict(state.nu)
        )
        uids, g = compact_row_grads(u_all, dgu, B)
        new_p["Gu"], new_m["Gu"], new_v["Gu"] = _sharded_sparse_adam(
            Pp["Gu"], state.mu["Gu"], state.nu["Gu"], uids, g, lr, t
        )
        ii = jnp.concatenate([p_all, n_all])
        uids, g = compact_row_grads(ii, jnp.concatenate([dgp, dgn]), 2 * B)
        new_p["Gi"], new_m["Gi"], new_v["Gi"] = _sharded_sparse_adam(
            Pp["Gi"], state.mu["Gi"], state.nu["Gi"], uids, g, lr, t
        )
        uids, g = compact_row_grads(ii, jnp.concatenate([dbp, dbn]), 2 * B)
        new_p["Bi"], new_m["Bi"], new_v["Bi"] = _sharded_sparse_adam(
            Pp["Bi"], state.mu["Bi"], state.nu["Bi"], uids, g, lr, t
        )
        return FastState(state.step + 1, new_p, new_m, new_v), loss

    def table_specs():
        ndims = {"Bi": 1, "Gu": 2, "Gi": 2}
        return {
            k: P(MODEL_AXIS, *([None] * (nd - 1))) for k, nd in ndims.items()
        }

    state_specs = FastState(
        step=P(),
        params=table_specs(),
        mu=table_specs(),
        nu=table_specs(),
    )
    batch_spec = P(DATA_AXIS)

    sharded_step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, batch_spec, batch_spec, batch_spec),
        out_specs=(state_specs, P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: FastState, key, train_pairs, padded_pos, pos_counts):
        sample_key, _ = jax.random.split(key)
        users, pos, neg = sample_triplets(
            sample_key, train_pairs, padded_pos, pos_counts,
            num_items, steps, batch, with_replacement=with_replacement,
        )

        def body(st, sb):
            u, p, n = sb
            return sharded_step(st, u, p, n)

        state, losses = jax.lax.scan(body, state, (users, pos, neg))
        return state, jnp.sum(losses)

    return epoch


def shard_fast_state(state: FastState, mesh: Mesh) -> FastState:
    """Place a FastState with tables (and moments) row-sharded over `model`.
    Rows must divide the model-axis size (pad upstream if needed)."""
    from jax.sharding import NamedSharding

    def place(tree):
        out = {}
        for k, v in tree.items():
            spec = P(MODEL_AXIS, *([None] * (v.ndim - 1)))
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        return out

    return FastState(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=place(state.params),
        mu=place(state.mu),
        nu=place(state.nu),
    )


# --- sharded packed-state path (train/packed.py layout over a mesh) ---


def _packed_forward_take(pmv_shard, ids, emb_cols, bias_col=None,
                         axis_name=MODEL_AXIS):
    """Collective forward lookup against a row-sharded PACKED table: one
    local row gather, slice out the parameter columns (and optionally the
    folded bias), one psum of just those columns — the m/v columns never
    ride the ICI."""
    shard = jax.lax.axis_index(axis_name)
    rows = pmv_shard.shape[0]
    local = ids - shard * rows
    ok = jnp.logical_and(local >= 0, local < rows)
    rows_v = jnp.take(pmv_shard, jnp.where(ok, local, 0), axis=0)
    emb = jnp.where(ok[:, None], rows_v[:, :emb_cols], 0.0)
    if bias_col is None:
        return jax.lax.psum(emb, axis_name)
    bias = jnp.where(ok, rows_v[:, bias_col], 0.0)
    out = jax.lax.psum(
        jnp.concatenate([emb, bias[:, None]], axis=1), axis_name
    )
    return out[:, :emb_cols], out[:, emb_cols]


def _sharded_packed_lazy_apply(pmv, tau, uids, g, lr, t, k_groups,
                               axis_name=MODEL_AXIS):
    """Per-shard LazyAdam on packed rows: gather the owned unique rows,
    apply catch-up decay + update per column group, scatter back.  Non-owned
    (and pad) ids route out of range and are dropped by the scatter.

    k_groups: list of (pmv column offset, grad column offset, width) — e.g.
    the item table updates its [3K] embedding block and its [3] bias block
    from one [S, K+1] grad matrix."""
    from fashionvisualexpl_tpu.train.packed import _lazy_rows

    shard = jax.lax.axis_index(axis_name)
    rows = pmv.shape[0]
    local = uids - shard * rows
    ok = jnp.logical_and(local >= 0, local < rows)
    safe_read = jnp.where(ok, local, 0)
    safe_write = jnp.where(ok, local, rows)  # out-of-range => dropped
    old = jnp.take(pmv, safe_read, axis=0)
    dt = (t - tau[safe_read].astype(jnp.float32))[:, None]
    parts = []
    for pmv_off, g_off, width in k_groups:
        parts.append(_lazy_rows(
            old[:, pmv_off:pmv_off + 3 * width],
            g[:, g_off:g_off + width], dt, t, lr,
        ))
    new = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    pmv = pmv.at[safe_write].set(new, unique_indices=True)
    tau = tau.at[safe_write].set(t.astype(tau.dtype), unique_indices=True)
    return pmv, tau


def _sharded_packed_lazy_apply_taucol(pmv, uids, g, lr, t, k_groups,
                                      axis_name=MODEL_AXIS,
                                      rows_fn=None, mw: int = 3,
                                      tau_ix: int = -1):
    """Like _sharded_packed_lazy_apply, for rows carrying their LazyAdam
    timestamp as a trailing fp32 column (the generic engine's layout,
    train/packed_generic.py): the tau read rides the owned-row gather and
    the tau refresh rides the row scatter — no 1D tau arrays or ops.

    ``rows_fn``/``mw`` select the moment layout: default fp32 [p|m|v]
    triples (mw=3, train/packed.py::_lazy_rows); the generic engine passes
    the bf16-packed variant (mw=2) and/or the momentum catch-up partial.
    ``tau_ix`` is the tau column (default: last); columns after it are
    row_align pads that pass through unchanged."""
    if rows_fn is None:
        from fashionvisualexpl_tpu.train.packed import _lazy_rows as rows_fn

    shard = jax.lax.axis_index(axis_name)
    rows = pmv.shape[0]
    if tau_ix < 0:
        tau_ix = pmv.shape[1] + tau_ix
    local = uids - shard * rows
    ok = jnp.logical_and(local >= 0, local < rows)
    safe_read = jnp.where(ok, local, 0)
    safe_write = jnp.where(ok, local, rows)  # out-of-range => dropped
    old = jnp.take(pmv, safe_read, axis=0)
    dt = (t - old[:, tau_ix])[:, None]
    parts = []
    for pmv_off, g_off, width in k_groups:
        parts.append(rows_fn(
            old[:, pmv_off:pmv_off + mw * width],
            g[:, g_off:g_off + width], dt, t, lr,
        ))
    parts.append(jnp.full((old.shape[0], 1), t, old.dtype))  # tau col
    parts.append(old[:, tau_ix + 1:])  # alignment pads pass through
    new = jnp.concatenate(parts, axis=1)
    return pmv.at[safe_write].set(new, unique_indices=True)


def make_packed_spmd_epoch_fn(
    model,  # BPRMF
    mesh: Mesh,
    lr: float,
    reg: float,
    num_items: int,
    steps: int,
    batch: int,
    with_replacement: bool = False,
) -> Callable:
    """Sharded packed epoch for BPRMF: the packed-state/LazyAdam fast path
    (train/packed.py — measured 2.5x the sparse path on one chip) with
    tables row-sharded over `model` and the batch over `data`.  Collectives
    per step: K(+1)-wide lookup psums over `model`, row-grad all_gather
    over `data`; the optimizer applies strictly locally."""
    from fashionvisualexpl_tpu.train.packed import PackedLazyState

    d_size = mesh.shape[DATA_AXIS]
    if batch % d_size != 0:
        raise ValueError(f"batch {batch} not divisible by data axis {d_size}")
    K = model.embed_k

    def local_step(state: PackedLazyState, u, p_ids, n_ids):
        gu = _packed_forward_take(state.user_pmv, u, K)
        gp, bp = _packed_forward_take(state.item_pmv, p_ids, K, 3 * K)
        gn, bn = _packed_forward_take(state.item_pmv, n_ids, K, 3 * K)

        def local_loss(gu, gp, gn, bp, bn):
            x_pos = bp + jnp.sum(gu * gp, axis=1)
            x_neg = bn + jnp.sum(gu * gn, axis=1)
            loss = bpr_pairwise_loss(x_pos, x_neg)
            return loss + (
                reg * (l2_loss(gu) + l2_loss(gp) + l2_loss(gn)) * 2.0
                + reg * l2_loss(bp) * 2.0
                + reg * l2_loss(bn) * 2.0 / 10.0
            )

        loss, grads = jax.value_and_grad(
            local_loss, argnums=(0, 1, 2, 3, 4)
        )(gu, gp, gn, bp, bn)
        loss = jax.lax.psum(loss, DATA_AXIS)

        def gather_all(x):
            g = jax.lax.all_gather(x, DATA_AXIS)
            return g.reshape((-1,) + g.shape[2:])

        u_all = gather_all(u)
        p_all = gather_all(p_ids)
        n_all = gather_all(n_ids)
        dgu, dgp, dgn, dbp, dbn = (gather_all(g) for g in grads)

        t = (state.step + 1).astype(jnp.float32)
        B = u_all.shape[0]

        uids, cg = compact_row_grads(u_all, dgu, B)
        user_pmv, tau_u = _sharded_packed_lazy_apply(
            state.user_pmv, state.tau_u, uids, cg, lr, t, [(0, 0, K)]
        )
        ii = jnp.concatenate([p_all, n_all])
        gi_cat = jnp.concatenate(
            [
                jnp.concatenate([dgp, dgn], axis=0),
                jnp.concatenate([dbp, dbn])[:, None],
            ],
            axis=1,
        )
        iids, cgi = compact_row_grads(ii, gi_cat, 2 * B)
        item_pmv, tau_i = _sharded_packed_lazy_apply(
            state.item_pmv, state.tau_i, iids, cgi, lr, t,
            [(0, 0, K), (3 * K, K, 1)],
        )
        return (
            PackedLazyState(state.step + 1, user_pmv, item_pmv, tau_u, tau_i),
            loss,
        )

    from fashionvisualexpl_tpu.train.packed import PackedLazyState as PLS

    state_specs = PLS(
        step=P(),
        user_pmv=P(MODEL_AXIS, None),
        item_pmv=P(MODEL_AXIS, None),
        tau_u=P(MODEL_AXIS),
        tau_i=P(MODEL_AXIS),
    )
    batch_spec = P(DATA_AXIS)

    sharded_step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, batch_spec, batch_spec, batch_spec),
        out_specs=(state_specs, P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state, key, train_pairs, padded_pos, pos_counts):
        sample_key, _ = jax.random.split(key)
        users, pos, neg = sample_triplets(
            sample_key, train_pairs, padded_pos, pos_counts,
            num_items, steps, batch, with_replacement=with_replacement,
        )

        def body(st, sb):
            u, p, n = sb
            return sharded_step(st, u, p, n)

        state, losses = jax.lax.scan(body, state, (users, pos, neg))
        return state, jnp.sum(losses)

    return epoch


def _packed_forward_take_cols(pmv_shard, ids, emb_cols, scalar_cols,
                              axis_name=MODEL_AXIS):
    """Collective forward lookup against a row-sharded packed table: gather
    the parameter columns (a [0:emb_cols) block plus arbitrary scalar
    columns) and psum ONLY those — the m/v columns never ride the ICI."""
    shard = jax.lax.axis_index(axis_name)
    rows = pmv_shard.shape[0]
    local = ids - shard * rows
    ok = jnp.logical_and(local >= 0, local < rows)
    rows_v = jnp.take(pmv_shard, jnp.where(ok, local, 0), axis=0)
    parts = [jnp.where(ok[:, None], rows_v[:, :emb_cols], 0.0)]
    for c in scalar_cols:
        parts.append(jnp.where(ok, rows_v[:, c], 0.0)[:, None])
    out = jax.lax.psum(jnp.concatenate(parts, axis=1), axis_name)
    return out[:, :emb_cols], out[:, emb_cols:]


def make_generic_packed_spmd_epoch_fn(
    model,
    mesh: Mesh,
    lr: float,
    reg: float,
    num_items: int,
    steps: int,
    batch: int,
    with_replacement: bool = False,
    moment_dtype: str = "float32",
    lazy_catchup: bool = False,
) -> Callable:
    """Sharded epoch for the GENERIC packed engine (train/packed_generic.py):
    any model implementing packed_spec/packed_loss runs its packed-row +
    LazyAdam fast path over the mesh — rows sharded over `model`, batch over
    `data`, dense params (projections / CNN towers / attention) replicated
    with data-psum'd grads.

    Collectives per step: parameter-column lookup psums over `model`,
    row-grad + dense-grad reductions over `data`; the row optimizer applies
    strictly locally (each shard updates only the rows it owns)."""
    from fashionvisualexpl_tpu.parallel.spmd import (
        collective_take, param_spec_tree,
    )
    import functools as _ft

    from fashionvisualexpl_tpu.train.fast import dense_adam
    from fashionvisualexpl_tpu.train.packed import _lazy_rows
    from fashionvisualexpl_tpu.train.packed_generic import (
        GenericPackedState, _lazy_rows_bf16, _moment_cols, _offsets,
    )

    spec = model.packed_spec()
    u_offs, Wu = _offsets(spec.user_tables)
    i_offs, Wi = _offsets(spec.item_tables)
    nS = len(spec.item_scalars)
    E = spec.extra_items
    mw = _moment_cols(moment_dtype)
    rows_fn = _ft.partial(_lazy_rows if mw == 3 else _lazy_rows_bf16,
                          catchup=lazy_catchup)
    scalar_cols = [mw * Wi + mw * j for j in range(nS)]
    item_groups = [(0, 0, Wi)] + [
        (mw * Wi + mw * j, Wi + j, 1) for j in range(nS)
    ]

    d_size = mesh.shape[DATA_AXIS]
    if batch % d_size != 0:
        raise ValueError(f"batch {batch} not divisible by data axis {d_size}")
    take = collective_take(tuple(model.row_sharded_params()))

    def local_step(state: "GenericPackedState", frozen, u, p_ids, n_ids, rng):
        b = u.shape[0]
        UR = _packed_forward_take(state.user_pmv, u, Wu)
        IRe, IRs = _packed_forward_take_cols(
            state.item_pmv, jnp.concatenate([p_ids, n_ids]), Wi, scalar_cols
        )
        user_vw = {n: UR[:, off:off + w] for n, off, w in u_offs}
        pos_vw = {n: IRe[:b, off:off + w] for n, off, w in i_offs}
        neg_vw = {n: IRe[b:, off:off + w] for n, off, w in i_offs}
        for j, s in enumerate(spec.item_scalars):
            pos_vw[s] = IRs[:b, j]
            neg_vw[s] = IRs[b:, j]
        dense_p = {name: state.dense[name][0] for name in spec.dense}
        # distinct dropout per data shard, identical across model shards
        # (dense grads must stay replicated over `model`)
        rng_l = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        if E:
            # extra item rows (ACF's user-positive sets): collective gather
            # of the parameter columns, grads join the item dedupe below
            xids = model.packed_extra_item_ids(
                frozen, (u, p_ids, n_ids)
            ).reshape(-1)  # [b*E]
            XRe, XRs = _packed_forward_take_cols(
                state.item_pmv, xids, Wi, scalar_cols
            )
            extra_vw = {
                n: XRe[:, off:off + w].reshape(b, E, w)
                for n, off, w in i_offs
            }
            for j, s in enumerate(spec.item_scalars):
                extra_vw[s] = XRs[:, j].reshape(b, E)
            ii = jnp.concatenate([p_ids, n_ids, xids])
        else:
            extra_vw = None
            ii = jnp.concatenate([p_ids, n_ids])

        def run_packed_loss(user_vw, pos_vw, neg_vw, extra_vw, dense_p):
            old_take = model.take
            old_scale = model.global_reg_scale
            model.take = take
            model.global_reg_scale = 1.0 / d_size
            try:
                kw = {"extra_vw": extra_vw} if E else {}
                return model.packed_loss(
                    user_vw, pos_vw, neg_vw, dense_p, frozen,
                    (u, p_ids, n_ids), reg, rng_l, **kw,
                )
            finally:
                model.take = old_take
                model.global_reg_scale = old_scale

        if E:
            loss, (gU, gP, gN, gX, gD) = jax.value_and_grad(
                run_packed_loss, argnums=(0, 1, 2, 3, 4)
            )(user_vw, pos_vw, neg_vw, extra_vw, dense_p)
        else:
            loss, (gU, gP, gN, gD) = jax.value_and_grad(
                lambda uv, pv, nv, dp: run_packed_loss(uv, pv, nv, None, dp),
                argnums=(0, 1, 2, 3),
            )(user_vw, pos_vw, neg_vw, dense_p)
            gX = None
        loss = jax.lax.psum(loss, DATA_AXIS)

        def gather_all(x):
            g = jax.lax.all_gather(x, DATA_AXIS)
            return g.reshape((-1,) + g.shape[2:])

        u_all = gather_all(u)
        ii_all = gather_all(ii)
        gu_all = gather_all(
            jnp.concatenate([gU[n] for n, _, _ in u_offs], axis=1)
        )
        gi_parts = [
            jnp.concatenate(
                [gP[n], gN[n]] + ([gX[n].reshape(b * E, w)] if E else []),
                axis=0,
            )
            for n, _, w in i_offs
        ]
        for s in spec.item_scalars:
            gi_parts.append(
                jnp.concatenate(
                    [gP[s], gN[s]] + ([gX[s].reshape(b * E)] if E else [])
                )[:, None]
            )
        gi_all = gather_all(jnp.concatenate(gi_parts, axis=1))

        t = (state.step + 1).astype(jnp.float32)
        B = u_all.shape[0]
        uids, cg = compact_row_grads(u_all, gu_all, B)
        user_pmv = _sharded_packed_lazy_apply_taucol(
            state.user_pmv, uids, cg, lr, t, [(0, 0, Wu)],
            rows_fn=rows_fn, mw=mw, tau_ix=mw * Wu,
        )
        iids, cgi = compact_row_grads(ii_all, gi_all, (2 + E) * B)
        item_pmv = _sharded_packed_lazy_apply_taucol(
            state.item_pmv, iids, cgi, lr, t, item_groups,
            rows_fn=rows_fn, mw=mw, tau_ix=mw * (Wi + nS),
        )

        dense = {}
        for name in spec.dense:
            p, m, v = state.dense[name]
            g = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, DATA_AXIS), gD[name]
            )
            flat_p, treedef = jax.tree_util.tree_flatten(p)
            flat_m = jax.tree_util.tree_leaves(m)
            flat_v = jax.tree_util.tree_leaves(v)
            flat_g = jax.tree_util.tree_leaves(g)
            outs = [
                dense_adam(pl, ml, vl, gl, lr, t)
                for pl, ml, vl, gl in zip(flat_p, flat_m, flat_v, flat_g)
            ]
            dense[name] = tuple(
                jax.tree_util.tree_unflatten(treedef, [o[i] for o in outs])
                for i in range(3)
            )

        return (
            GenericPackedState(state.step + 1, user_pmv, item_pmv, dense),
            loss,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state, frozen, key, train_pairs, padded_pos, pos_counts):
        dense_specs = {
            name: jax.tree_util.tree_map(
                lambda x: P(*([None] * x.ndim)), state.dense[name]
            )
            for name in spec.dense
        }
        state_specs = GenericPackedState(
            step=P(),
            user_pmv=P(MODEL_AXIS, None),
            item_pmv=P(MODEL_AXIS, None),
            dense=dense_specs,
        )
        fspecs = param_spec_tree(model, frozen)
        batch_spec = P(DATA_AXIS)
        sharded_step = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(state_specs, fspecs, batch_spec, batch_spec,
                      batch_spec, P()),
            out_specs=(state_specs, P()),
            check_vma=False,
        )

        sample_key, step_key = jax.random.split(key)
        users, pos, neg = sample_triplets(
            sample_key, train_pairs, padded_pos, pos_counts,
            num_items, steps, batch, with_replacement=with_replacement,
        )
        step_keys = jax.random.split(step_key, steps)

        def body(st, sb):
            u, p, n, k = sb
            return sharded_step(st, frozen, u, p, n, k)

        state, losses = jax.lax.scan(
            body, state, (users, pos, neg, step_keys)
        )
        return state, jnp.sum(losses)

    return epoch


def shard_generic_packed_state(state, mesh: Mesh):
    """Place a GenericPackedState with rows sharded over `model` (padding
    user/item rows to the axis multiple; pad rows are unreachable ids) and
    dense params replicated."""
    import numpy as np
    from jax.sharding import NamedSharding

    from fashionvisualexpl_tpu.parallel.spmd import pad_rows_to_multiple
    from fashionvisualexpl_tpu.train.packed_generic import GenericPackedState

    m = mesh.shape[MODEL_AXIS]

    def row_sharded(x):
        arr = pad_rows_to_multiple(np.asarray(x), m)
        spec = P(MODEL_AXIS, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(mesh, spec))

    def replicated(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(*([None] * x.ndim)))
        )

    return GenericPackedState(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        user_pmv=row_sharded(state.user_pmv),
        item_pmv=row_sharded(state.item_pmv),
        dense=jax.tree_util.tree_map(replicated, state.dense),
    )


def shard_packed_state(state, mesh: Mesh):
    """Place a PackedLazyState row-sharded over `model` (rows must divide
    the model-axis size; pad upstream if needed)."""
    from jax.sharding import NamedSharding

    from fashionvisualexpl_tpu.train.packed import PackedLazyState

    def row_sharded(x):
        spec = P(MODEL_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return PackedLazyState(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        user_pmv=row_sharded(state.user_pmv),
        item_pmv=row_sharded(state.item_pmv),
        tau_u=row_sharded(state.tau_u),
        tau_i=row_sharded(state.tau_i),
    )
