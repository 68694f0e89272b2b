"""Fast-path trainer: compact row gradients + sparse-apply Adam.

The generic trainer differentiates through `jnp.take`, whose VJP
materializes a DENSE table-shaped gradient per step (zeros + scatter-add
with duplicate indices — at the scaled config that is ~0.8GB of writes per
step before Adam even starts).  This path never materializes dense
gradients:

1. gather the batch rows, differentiate the loss wrt the GATHERED rows
   ([B, K] cotangents — no table-shaped intermediates);
2. dedupe ids by sort + segment-sum into compact per-unique-row gradients;
3. Adam with the same update rule as optax.adam, applied as:
   full-table elementwise decay of the moments (m *= b1, v *= b2 — the part
   TF's sparse path also does densely every step), a unique-index
   scatter-add of the compact gradients, and the elementwise parameter
   update.  Bitwise-equivalent semantics to the dense path up to float
   reduction order (verified in tests).

Implemented for BPRMF (make_fast_bprmf_step) and VBPR
(make_fast_vbpr_step); whole-matrix params (VBPR's E/Bp) get standard
dense Adam.  Crossover note: at the small reference workload (10k tables)
the per-step sort/segment/scatter overhead exceeds the dense-Adam saving —
the generic trainer wins there; the fast path wins from ~10^5 rows up.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fashionvisualexpl_tpu.data.sampler import sample_triplets

B1, B2, EPS = 0.9, 0.999, 1e-7


class FastState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Dict[str, jax.Array]
    mu: Dict[str, jax.Array]
    nu: Dict[str, jax.Array]


def init_fast_state(params: Dict[str, jax.Array]) -> FastState:
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    return FastState(
        jnp.zeros((), jnp.int32), params,
        zeros, {k: jnp.zeros_like(v) for k, v in params.items()},
    )


class LazyFastState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Dict[str, jax.Array]
    mu: Dict[str, jax.Array]
    nu: Dict[str, jax.Array]
    tau: Dict[str, jax.Array]  # per ROW-table: [rows] int32 last-touch step


def init_lazy_state(
    params: Dict[str, jax.Array], row_tables: Tuple[str, ...]
) -> LazyFastState:
    base = init_fast_state(params)
    tau = {
        k: jnp.zeros((params[k].shape[0],), jnp.int32)
        for k in row_tables if k in params
    }
    return LazyFastState(base.step, base.params, base.mu, base.nu, tau)


def compact_row_grads(
    ids: jax.Array, grads: jax.Array, num_segments: int,
    pad_id: int = 2**30,
):
    """Sort + segment-sum duplicate ids -> (unique_ids [S], summed [S, ...]).

    Padded (unused) segments carry `pad_id`, which callers MUST choose
    out-of-range for the target table (default 2^30): JAX drops
    out-of-bounds scatter updates, and an out-of-range pad keeps the
    applied index set genuinely unique — padding with a real id (e.g. 0)
    would violate scatter's unique_indices contract whenever the batch
    contains that id, which is undefined behavior."""
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = grads[order]
    new_seg = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sid[1:] != sid[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(new_seg) - 1  # [B] segment index per sorted entry
    summed = jax.ops.segment_sum(sg, seg, num_segments=num_segments)
    uids = jnp.full((num_segments,), pad_id, ids.dtype).at[seg].set(sid)
    return uids, summed


def sparse_adam_table(
    p: jax.Array, m: jax.Array, v: jax.Array,
    uids: jax.Array, g: jax.Array,  # compact: [S] ids, [S, ...] grads
    lr: float, t: jax.Array,
):
    """One Adam step where the gradient is zero outside `uids` rows.

    Equivalent to optax.adam's dense update with the dense-scatter gradient.
    The scatter runs FIRST with pre-scaled contributions ((1-b)/b * g), so
    the uniform decay that follows produces exactly b*m + (1-b)*g on touched
    rows — and XLA fuses the decay + bias-corrected parameter update into a
    single elementwise sweep with no scatter in the middle (measured ~13%
    faster at the 1M x 500k config than decay-then-scatter)."""
    if g.ndim < m.ndim:
        g = g[..., None] if m.ndim == 2 and g.ndim == 1 else g
    m = m.at[uids].add((1.0 - B1) / B1 * g, unique_indices=True)
    v = v.at[uids].add(
        (1.0 - B2) / B2 * jnp.square(g), unique_indices=True
    )
    m = m * B1
    v = v * B2
    m_hat = m / (1.0 - B1 ** t)
    v_hat = v / (1.0 - B2 ** t)
    p = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
    return p, m, v


def lazy_adam_table(
    p: jax.Array, m: jax.Array, v: jax.Array, tau: jax.Array,
    uids: jax.Array, g: jax.Array,  # compact: [S] ids, [S, ...] grads
    lr: float, t: jax.Array,
):
    """One LAZY Adam step: only the touched rows are read or written.

    The sparse/dense paths above decay the moments and re-apply the
    parameter update over the ENTIRE table every step (TF-Adam dense
    semantics — 6 full HBM passes, the measured 5.6ms/step floor at the
    1M x 500k config, SPEED.md).  This variant implements LazyAdam
    semantics (tf.contrib LazyAdamOptimizer): per-row last-touch
    timestamps `tau`; on touch, the deferred geometric decay is applied in
    one catch-up (b^(t - tau) — exactly what step-by-step decay would have
    compounded to), then the standard Adam update runs on those rows.
    Untouched rows keep their parameters (the deliberate semantic
    difference from dense Adam, whose bias-corrected update keeps nudging
    stale rows); moment decay is EXACT relative to the dense path.

    Padded segment ids (out-of-range, see compact_row_grads) gather
    clamped garbage rows and are dropped on the scatter back — harmless
    and branch-free."""
    if g.ndim < m.ndim:
        g = g[..., None] if m.ndim == 2 and g.ndim == 1 else g
    dt = (t - tau[uids].astype(jnp.float32))
    if m.ndim > 1:
        dt_b = dt[:, None]
    else:
        dt_b = dt
    m_rows = m[uids] * jnp.power(B1, dt_b) + (1.0 - B1) * g
    v_rows = v[uids] * jnp.power(B2, dt_b) + (1.0 - B2) * jnp.square(g)
    m_hat = m_rows / (1.0 - B1 ** t)
    v_hat = v_rows / (1.0 - B2 ** t)
    p_rows = p[uids] - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
    p = p.at[uids].set(p_rows, unique_indices=True)
    m = m.at[uids].set(m_rows, unique_indices=True)
    v = v.at[uids].set(v_rows, unique_indices=True)
    tau = tau.at[uids].set(t.astype(tau.dtype), unique_indices=True)
    return p, m, v, tau


def dense_adam(p, m, v, g, lr, t):
    m = B1 * m + (1.0 - B1) * g
    v = B2 * v + (1.0 - B2) * jnp.square(g)
    m_hat = m / (1.0 - B1 ** t)
    v_hat = v / (1.0 - B2 ** t)
    return p - lr * m_hat / (jnp.sqrt(v_hat) + EPS), m, v


def make_fast_bprmf_step(model, lr: float, reg: float,
                         fused_adam: bool = False,
                         pallas_bpr: bool = False,
                         lazy: bool = False,
                         bpr_tile: int = 512) -> Callable:
    """Fast train step for BPRMF (reference loss semantics,
    BPRMF.py:95-112).  fused_adam=True routes the full-table sweep through
    the one-pass Pallas kernel (ops/adam.py); pallas_bpr=True computes the
    pairwise loss + analytic row gradients through the fused Pallas BPR
    kernel (ops/bpr.py) instead of autodiff over the jnp chain; lazy=True
    switches the optimizer to LazyAdam semantics (lazy_adam_table — no
    full-table sweeps; state is a LazyFastState)."""
    from fashionvisualexpl_tpu.models.base import bpr_pairwise_loss, l2_loss

    if fused_adam:
        from fashionvisualexpl_tpu.ops.adam import sparse_adam_table_fused
        apply_table = sparse_adam_table_fused
    else:
        apply_table = sparse_adam_table

    if pallas_bpr:
        from fashionvisualexpl_tpu.ops.bpr import bpr_triplet_loss

    def step(state: FastState, batch) -> Tuple[FastState, jax.Array]:
        u, p_ids, n_ids = batch
        P = state.params
        gu = jnp.take(P["Gu"], u, axis=0)
        gp = jnp.take(P["Gi"], p_ids, axis=0)
        gn = jnp.take(P["Gi"], n_ids, axis=0)
        bp = jnp.take(P["Bi"], p_ids)
        bn = jnp.take(P["Bi"], n_ids)

        if pallas_bpr:
            # fused kernel fwd/bwd for the pairwise term; reg grads are
            # analytic (d(2 reg l2(x))/dx = 2 reg x)
            pair_loss, vjp = jax.vjp(
                lambda *a: bpr_triplet_loss(*a, bpr_tile, False),
                gu, gp, gn, bp, bn,
            )
            dgu, dgp, dgn, dbp, dbn = vjp(jnp.float32(1.0))
            dgu = dgu + 2.0 * reg * gu
            dgp = dgp + 2.0 * reg * gp
            dgn = dgn + 2.0 * reg * gn
            dbp = dbp + 2.0 * reg * bp
            dbn = dbn + (2.0 * reg / 10.0) * bn
            loss = pair_loss + (
                reg * (l2_loss(gu) + l2_loss(gp) + l2_loss(gn)) * 2.0
                + reg * l2_loss(bp) * 2.0
                + reg * l2_loss(bn) * 2.0 / 10.0
            )
        else:
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
            dgu, dgp, dgn, dbp, dbn = grads
        t = (state.step + 1).astype(jnp.float32)
        B = u.shape[0]

        new_p, new_m, new_v = dict(P), dict(state.mu), dict(state.nu)
        new_tau = dict(state.tau) if lazy else None

        ii = jnp.concatenate([p_ids, n_ids])
        for name, ids, g, ns in (
            ("Gu", u, dgu, B),
            ("Gi", ii, jnp.concatenate([dgp, dgn]), 2 * B),
            ("Bi", ii, jnp.concatenate([dbp, dbn]), 2 * B),
        ):
            uids, cg = compact_row_grads(ids, g, ns)
            if lazy:
                (new_p[name], new_m[name], new_v[name],
                 new_tau[name]) = lazy_adam_table(
                    P[name], state.mu[name], state.nu[name],
                    state.tau[name], uids, cg, lr, t,
                )
            else:
                new_p[name], new_m[name], new_v[name] = apply_table(
                    P[name], state.mu[name], state.nu[name], uids, cg, lr, t
                )
        if lazy:
            return LazyFastState(
                state.step + 1, new_p, new_m, new_v, new_tau
            ), loss
        return FastState(state.step + 1, new_p, new_m, new_v), loss

    return step


def make_fast_epoch_fn(model, lr: float, reg: float, num_items: int,
                       steps: int, batch: int,
                       fused_adam: bool = False,
                       with_replacement: bool = False,
                       pallas_bpr: bool = False,
                       lazy: bool = False) -> Callable:
    step_fn = make_fast_bprmf_step(model, lr, reg, fused_adam=fused_adam,
                                   pallas_bpr=pallas_bpr, lazy=lazy)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: FastState, key, train_pairs, padded_pos, pos_counts):
        users, pos, neg = sample_triplets(
            key, train_pairs, padded_pos, pos_counts, num_items, steps, batch,
            with_replacement=with_replacement,
        )
        state, losses = jax.lax.scan(step_fn, state, (users, pos, neg))
        return state, jnp.sum(losses)

    return epoch


def make_fast_vbpr_step(model, lr: float, reg: float,
                        lazy: bool = False) -> Callable:
    """Fast train step for VBPR (reference loss semantics, VBPR.py:99-143):
    row tables (Gu, Gi, Bi, Tu) get the sparse-apply path (LazyAdam when
    lazy=True — state must then be a LazyFastState); the small dense E/Bp
    matrices get ordinary dense Adam either way."""
    from fashionvisualexpl_tpu.models.base import bpr_pairwise_loss, l2_loss

    def step(state: FastState, batch):
        frozen_F, (u, p_ids, n_ids) = batch
        P = state.params
        gu = jnp.take(P["Gu"], u, axis=0)
        tu = jnp.take(P["Tu"], u, axis=0)
        gp = jnp.take(P["Gi"], p_ids, axis=0)
        gn = jnp.take(P["Gi"], n_ids, axis=0)
        bp = jnp.take(P["Bi"], p_ids)
        bn = jnp.take(P["Bi"], n_ids)
        fp = jnp.take(frozen_F, p_ids, axis=0)
        fn_ = jnp.take(frozen_F, n_ids, axis=0)

        def local_loss(gu, tu, gp, gn, bp, bn, E, Bp):
            x_pos = (
                bp + jnp.sum(gu * gp, axis=1)
                + jnp.sum(tu * (fp @ E), axis=1) + (fp @ Bp)[:, 0]
            )
            x_neg = (
                bn + jnp.sum(gu * gn, axis=1)
                + jnp.sum(tu * (fn_ @ E), axis=1) + (fn_ @ Bp)[:, 0]
            )
            loss = bpr_pairwise_loss(x_pos, x_neg)
            return loss + (
                reg * (l2_loss(gu) + l2_loss(gp) + l2_loss(gn) + l2_loss(tu))
                * 2.0
                + reg * l2_loss(bp) * 2.0
                + reg * l2_loss(bn) * 2.0 / 10.0
                + reg * (l2_loss(E) + l2_loss(Bp)) * 2.0
            )

        loss, grads = jax.value_and_grad(
            local_loss, argnums=tuple(range(8))
        )(gu, tu, gp, gn, bp, bn, P["E"], P["Bp"])
        dgu, dtu, dgp, dgn, dbp, dbn, dE, dBp = grads
        t = (state.step + 1).astype(jnp.float32)
        B = u.shape[0]

        new_p, new_m, new_v = dict(P), dict(state.mu), dict(state.nu)
        new_tau = dict(state.tau) if lazy else None
        for name, ids, g, ns in (
            ("Gu", u, dgu, B),
            ("Tu", u, dtu, B),
            ("Gi", jnp.concatenate([p_ids, n_ids]),
             jnp.concatenate([dgp, dgn]), 2 * B),
            ("Bi", jnp.concatenate([p_ids, n_ids]),
             jnp.concatenate([dbp, dbn]), 2 * B),
        ):
            uids, cg = compact_row_grads(ids, g, ns)
            if lazy:
                (new_p[name], new_m[name], new_v[name],
                 new_tau[name]) = lazy_adam_table(
                    P[name], state.mu[name], state.nu[name],
                    state.tau[name], uids, cg, lr, t,
                )
            else:
                new_p[name], new_m[name], new_v[name] = sparse_adam_table(
                    P[name], state.mu[name], state.nu[name], uids, cg, lr, t
                )
        for name, g in (("E", dE), ("Bp", dBp)):
            new_p[name], new_m[name], new_v[name] = dense_adam(
                P[name], state.mu[name], state.nu[name], g, lr, t
            )
        if lazy:
            return LazyFastState(
                state.step + 1, new_p, new_m, new_v, new_tau
            ), loss
        return FastState(state.step + 1, new_p, new_m, new_v), loss

    return step


def make_fast_vbpr_epoch_fn(model, frozen, lr: float, reg: float,
                            num_items: int, steps: int,
                            batch: int, lazy: bool = False) -> Callable:
    step_fn = make_fast_vbpr_step(model, lr, reg, lazy=lazy)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: FastState, frozen_F, key,
              train_pairs, padded_pos, pos_counts):
        users, pos, neg = sample_triplets(
            key, train_pairs, padded_pos, pos_counts, num_items, steps, batch
        )

        def body(st, sb):
            return step_fn(st, (frozen_F, sb))

        state, losses = jax.lax.scan(body, state, (users, pos, neg))
        return state, jnp.sum(losses)

    return epoch
