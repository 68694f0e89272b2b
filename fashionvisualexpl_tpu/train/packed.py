"""Packed-state fast path: one row op per table instead of one per array.

In-context phase ablation of the fast step at the 1M x 500k config
(SPEED.md) shows the step is NOT compute- or bandwidth-bound: sampling +
gathers + loss + gradients cost 1.6ms and id-dedupe 0.9ms, while the
sparse Adam apply costs ~10.7ms of the 13.2ms step.  The apply's cost is
almost entirely the NUMBER of row-granular gather/scatter ops (each is
DMA-issue-latency bound at ~80ns/row regardless of row width — the Pallas
per-row-DMA gather measures identically to XLA's, ops/gather.py).

So: pack parameters and Adam moments into ONE row per id —

- user table  [U, 3K]     : columns [0:K)=Gu, [K:2K)=m, [2K:3K)=v
- item table  [I, 3K + 3] : columns [0:K)=Gi, [K:2K)=m, [2K:3K)=v,
                            [3K]=Bi, [3K+1]=Bi's m, [3K+2]=Bi's v
  (the item bias FOLDED into the item row — its three separate [I]-array
  ops ride along for free)

and run LazyAdam (train/fast.py::lazy_adam_table semantics: per-row
last-touch step, catch-up decay b^dt, touched rows only — no full-table
sweeps, which would reintroduce a table-size-proportional floor).  Per
step the entire optimizer traffic is then:

  2 gathers (forward rows ARE the optimizer rows — no separate forward
  lookup), 2 unique-row gathers, 2 packed scatter-sets, 2 small [rows]
  tau updates.

versus the unpacked lazy path's ~8 gathers + ~8 scatters.  Wider rows are
free: 16k x 1.5KB is 24MB, far below the bandwidth a latency-bound op
leaves on the table.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fashionvisualexpl_tpu.data.sampler import sample_triplets
from fashionvisualexpl_tpu.models.base import bpr_pairwise_loss, l2_loss
from fashionvisualexpl_tpu.train.fast import B1, B2, EPS, compact_row_grads


class PackedLazyState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    user_pmv: jax.Array  # [U, 3K]
    item_pmv: jax.Array  # [I, 3K + 3]
    tau_u: jax.Array  # [U] int32 last-touch step
    tau_i: jax.Array  # [I] int32


def pack_bprmf_state(params) -> PackedLazyState:
    """Build the packed state from a BPRMF params dict (Gu/Gi/Bi)."""
    Gu, Gi, Bi = params["Gu"], params["Gi"], params["Bi"]
    U, K = Gu.shape
    I = Gi.shape[0]
    user = jnp.concatenate([Gu, jnp.zeros((U, 2 * K), Gu.dtype)], axis=1)
    item = jnp.concatenate(
        [
            Gi,
            jnp.zeros((I, 2 * K), Gi.dtype),
            Bi[:, None],
            jnp.zeros((I, 2), Bi.dtype),
        ],
        axis=1,
    )
    return PackedLazyState(
        jnp.zeros((), jnp.int32), user, item,
        jnp.zeros((U,), jnp.int32), jnp.zeros((I,), jnp.int32),
    )


def unpack_bprmf_params(state: PackedLazyState, embed_k: int):
    """Materialize the standard params dict (one slice copy per table —
    amortized over an epoch/eval, not per step)."""
    K = embed_k
    return {
        "Gu": state.user_pmv[:, :K],
        "Gi": state.item_pmv[:, :K],
        "Bi": state.item_pmv[:, 3 * K],
    }


def _momentum_catchup(p, m, v, dt, t, lr):
    """Apply the momentum TAIL dense Adam would have applied over the
    skipped steps, in closed form.

    LazyAdam's plain catch-up decays m by B1^dt but never applies the
    dt-1 intervening updates `p -= lr*m_hat_j/(sqrt(v_hat_j)+EPS)` that
    dense Adam performs on every row each step (momentum keeps pushing a
    row after its last gradient).  At B1=0.9 that tail carries ~9x the
    single-step update mass — dropping it acts like a smaller effective
    LR and measurably slows convergence (BASELINE.md round 4: -0.06 AUC
    at the parity config).  Skipped step j has m_j = m*B1^j and
    v_j = v*B2^j, so with bias corrections approximated at the touch step
    the tail telescopes to a geometric sum in r = B1/sqrt(B2):

        p -= lr * m_hat/(sqrt(v_hat)+EPS) * sum_{j=1}^{dt-1} r^j
    """
    r = B1 / jnp.sqrt(B2)
    geom = r * (1.0 - jnp.power(r, jnp.maximum(dt - 1.0, 0.0))) / (1.0 - r)
    m_hat = m / (1.0 - B1 ** t)
    v_hat = v / (1.0 - B2 ** t)
    return p - lr * geom * m_hat / (jnp.sqrt(v_hat) + EPS)


def _lazy_rows(rows, g, dt, t, lr, catchup: bool = False):
    """LazyAdam on gathered packed rows: rows [S, 3K(+3)] with p|m|v
    column groups, g [S, K(+1)] summed grads for the p columns.
    ``catchup=True`` additionally applies the closed-form momentum tail of
    the skipped steps (see _momentum_catchup) before the touch update —
    dense-Adam-like convergence at touched-rows-only cost."""
    K = g.shape[1]
    p, m, v = rows[:, :K], rows[:, K:2 * K], rows[:, 2 * K:3 * K]
    if catchup:
        p = _momentum_catchup(p, m, v, dt, t, lr)
    m = m * jnp.power(B1, dt) + (1.0 - B1) * g
    v = v * jnp.power(B2, dt) + (1.0 - B2) * jnp.square(g)
    m_hat = m / (1.0 - B1 ** t)
    v_hat = v / (1.0 - B2 ** t)
    p = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
    return jnp.concatenate([p, m, v], axis=1)


def make_packed_bprmf_step(model, lr: float, reg: float) -> Callable:
    """BPRMF train step over packed state (reference loss semantics,
    BPRMF.py:95-112; LazyAdam update semantics)."""
    K = model.embed_k

    def step(state: PackedLazyState, batch) -> Tuple[PackedLazyState, jax.Array]:
        u, p_ids, n_ids = batch
        B = u.shape[0]
        ii = jnp.concatenate([p_ids, n_ids])

        UR = jnp.take(state.user_pmv, u, axis=0)  # [B, 3K]
        IR = jnp.take(state.item_pmv, ii, axis=0)  # [2B, 3K+3]
        gu = UR[:, :K]
        gp, gn = IR[:B, :K], IR[B:, :K]
        bp, bn = IR[:B, 3 * K], IR[B:, 3 * K]

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

        # --- users ---
        uids, cg = compact_row_grads(u, dgu, B)
        rows = jnp.take(state.user_pmv, uids, axis=0)
        dt = (t - state.tau_u[uids].astype(jnp.float32))[:, None]
        new_rows = _lazy_rows(rows, cg, dt, t, lr)
        user_pmv = state.user_pmv.at[uids].set(new_rows, unique_indices=True)
        tau_u = state.tau_u.at[uids].set(
            t.astype(jnp.int32), unique_indices=True
        )

        # --- items: embedding grads and bias grads share the id dedupe ---
        gi_cat = jnp.concatenate(
            [
                jnp.concatenate([dgp, dgn], axis=0),
                jnp.concatenate([dbp, dbn])[:, None],
            ],
            axis=1,
        )  # [2B, K+1]
        iids, cgi = compact_row_grads(ii, gi_cat, 2 * B)
        rows = jnp.take(state.item_pmv, iids, axis=0)  # [S, 3K+3]
        dt = (t - state.tau_i[iids].astype(jnp.float32))[:, None]
        emb = _lazy_rows(rows[:, : 3 * K], cgi[:, :K], dt, t, lr)
        bias = _lazy_rows(
            rows[:, 3 * K:].reshape(-1, 3), cgi[:, K:], dt, t, lr
        )
        item_pmv = state.item_pmv.at[iids].set(
            jnp.concatenate([emb, bias], axis=1), unique_indices=True
        )
        tau_i = state.tau_i.at[iids].set(
            t.astype(jnp.int32), unique_indices=True
        )

        return (
            PackedLazyState(state.step + 1, user_pmv, item_pmv, tau_u, tau_i),
            loss,
        )

    return step


def make_packed_epoch_fn(model, lr: float, reg: float, num_items: int,
                         steps: int, batch: int,
                         with_replacement: bool = True) -> Callable:
    step_fn = make_packed_bprmf_step(model, lr, reg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: PackedLazyState, key, train_pairs, padded_pos, pos_counts):
        users, pos, neg = sample_triplets(
            key, train_pairs, padded_pos, pos_counts, num_items, steps, batch,
            with_replacement=with_replacement,
        )
        state, losses = jax.lax.scan(step_fn, state, (users, pos, neg))
        return state, jnp.sum(losses)

    return epoch


class PackedTrainState:
    """Pytree adapter presenting a packed state to the shared fit() loop:
    `.params` materializes the standard params dict (slice views, amortized
    — used by eval/best-copy/checkpoint, never inside the step)."""

    def __init__(self, inner, kind: str, embed_k: int, embed_d: int = 0):
        self.inner = inner
        self.kind = kind
        self.embed_k = embed_k
        self.embed_d = embed_d

    def with_inner(self, inner):
        return PackedTrainState(inner, self.kind, self.embed_k, self.embed_d)

    @property
    def step(self):
        return self.inner.step

    @property
    def params(self):
        if self.kind == "bprmf":
            return unpack_bprmf_params(self.inner, self.embed_k)
        if self.kind == "grad_fashion":
            return unpack_grad_fashion_params(
                self.inner, self.embed_k, self.embed_d
            )
        return unpack_vbpr_params(self.inner, self.embed_k, self.embed_d)


jax.tree_util.register_pytree_node(
    PackedTrainState,
    lambda s: ((s.inner,), (s.kind, s.embed_k, s.embed_d)),
    lambda aux, ch: PackedTrainState(ch[0], *aux),
)


# --- VBPR (reference loss semantics, VBPR.py:99-143) ---


class PackedVbprState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    user_pmv: jax.Array  # [U, 3(K+D)]: p=[Gu|Tu], then m, then v
    item_pmv: jax.Array  # [I, 3K + 3]  (as BPRMF)
    tau_u: jax.Array  # [U] int32
    tau_i: jax.Array  # [I] int32
    dense: dict  # {"E": (p, m, v), "Bp": (p, m, v)} — small whole matrices


def pack_vbpr_state(params) -> PackedVbprState:
    Gu, Tu, Gi, Bi = params["Gu"], params["Tu"], params["Gi"], params["Bi"]
    U, K = Gu.shape
    D = Tu.shape[1]
    I = Gi.shape[0]
    user = jnp.concatenate(
        [Gu, Tu, jnp.zeros((U, 2 * (K + D)), Gu.dtype)], axis=1
    )
    item = jnp.concatenate(
        [
            Gi,
            jnp.zeros((I, 2 * K), Gi.dtype),
            Bi[:, None],
            jnp.zeros((I, 2), Bi.dtype),
        ],
        axis=1,
    )
    dense = {
        name: (params[name], jnp.zeros_like(params[name]),
               jnp.zeros_like(params[name]))
        for name in ("E", "Bp")
    }
    return PackedVbprState(
        jnp.zeros((), jnp.int32), user, item,
        jnp.zeros((U,), jnp.int32), jnp.zeros((I,), jnp.int32), dense,
    )


def unpack_vbpr_params(state: PackedVbprState, embed_k: int, embed_d: int):
    K, D = embed_k, embed_d
    return {
        "Gu": state.user_pmv[:, :K],
        "Tu": state.user_pmv[:, K:K + D],
        "Gi": state.item_pmv[:, :K],
        "Bi": state.item_pmv[:, 3 * K],
        "E": state.dense["E"][0],
        "Bp": state.dense["Bp"][0],
    }


def make_packed_vbpr_step(model, lr: float, reg: float) -> Callable:
    """VBPR train step over packed state: row tables via packed LazyAdam,
    the small whole-matrix E/Bp via ordinary dense Adam (as train/fast.py)."""
    from fashionvisualexpl_tpu.train.fast import dense_adam

    K, D = model.embed_k, model.embed_d

    def step(state: PackedVbprState, batch):
        frozen_F, (u, p_ids, n_ids) = batch
        B = u.shape[0]
        ii = jnp.concatenate([p_ids, n_ids])

        UR = jnp.take(state.user_pmv, u, axis=0)  # [B, 3(K+D)]
        IR = jnp.take(state.item_pmv, ii, axis=0)  # [2B, 3K+3]
        FR = jnp.take(frozen_F, ii, axis=0)  # [2B, dim_f]
        gu, tu = UR[:, :K], UR[:, K:K + D]
        gp, gn = IR[:B, :K], IR[B:, :K]
        bp, bn = IR[:B, 3 * K], IR[B:, 3 * K]
        fp, fn_ = FR[:B], FR[B:]
        E, Bp = state.dense["E"][0], state.dense["Bp"][0]

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
        )(gu, tu, gp, gn, bp, bn, E, Bp)
        dgu, dtu, dgp, dgn, dbp, dbn, dE, dBp = grads
        t = (state.step + 1).astype(jnp.float32)

        # users: Gu and Tu grads share the id dedupe (one packed row)
        uids, cg = compact_row_grads(
            u, jnp.concatenate([dgu, dtu], axis=1), B
        )
        rows = jnp.take(state.user_pmv, uids, axis=0)
        dt = (t - state.tau_u[uids].astype(jnp.float32))[:, None]
        user_pmv = state.user_pmv.at[uids].set(
            _lazy_rows(rows, cg, dt, t, lr), unique_indices=True
        )
        tau_u = state.tau_u.at[uids].set(
            t.astype(jnp.int32), unique_indices=True
        )

        # items: embedding + bias grads share the id dedupe
        gi_cat = jnp.concatenate(
            [
                jnp.concatenate([dgp, dgn], axis=0),
                jnp.concatenate([dbp, dbn])[:, None],
            ],
            axis=1,
        )
        iids, cgi = compact_row_grads(ii, gi_cat, 2 * B)
        rows = jnp.take(state.item_pmv, iids, axis=0)
        dt = (t - state.tau_i[iids].astype(jnp.float32))[:, None]
        emb = _lazy_rows(rows[:, : 3 * K], cgi[:, :K], dt, t, lr)
        bias = _lazy_rows(
            rows[:, 3 * K:].reshape(-1, 3), cgi[:, K:], dt, t, lr
        )
        item_pmv = state.item_pmv.at[iids].set(
            jnp.concatenate([emb, bias], axis=1), unique_indices=True
        )
        tau_i = state.tau_i.at[iids].set(
            t.astype(jnp.int32), unique_indices=True
        )

        dense = {}
        for name, g in (("E", dE), ("Bp", dBp)):
            p, m, v = state.dense[name]
            dense[name] = dense_adam(p, m, v, g, lr, t)

        return (
            PackedVbprState(
                state.step + 1, user_pmv, item_pmv, tau_u, tau_i, dense
            ),
            loss,
        )

    return step


def make_packed_vbpr_epoch_fn(model, lr: float, reg: float, num_items: int,
                              steps: int, batch: int,
                              with_replacement: bool = True) -> Callable:
    step_fn = make_packed_vbpr_step(model, lr, reg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: PackedVbprState, frozen_F, key,
              train_pairs, padded_pos, pos_counts):
        users, pos, neg = sample_triplets(
            key, train_pairs, padded_pos, pos_counts, num_items, steps, batch,
            with_replacement=with_replacement,
        )

        def body(st, sb):
            return step_fn(st, (frozen_F, sb))

        state, losses = jax.lax.scan(body, state, (users, pos, neg))
        return state, jnp.sum(losses)

    return epoch


# --- GradFashion (reference loss semantics, GradFashion.py:136-193) ---


class PackedGradFashionState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    user_pmv: jax.Array  # [U, 3(K+D)]: p=[Gu|Tu], then m, then v
    item_pmv: jax.Array  # [I, 3K + 3]  (as BPRMF)
    tau_u: jax.Array  # [U] int32
    tau_i: jax.Array  # [I] int32
    dense: dict  # {"E"/"Bp"/"Ec"/"Ee": (p, m, v)} — small whole matrices


def pack_grad_fashion_state(params) -> PackedGradFashionState:
    Gu, Tu, Gi, Bi = params["Gu"], params["Tu"], params["Gi"], params["Bi"]
    U, K = Gu.shape
    D = Tu.shape[1]
    I = Gi.shape[0]
    user = jnp.concatenate(
        [Gu, Tu, jnp.zeros((U, 2 * (K + D)), Gu.dtype)], axis=1
    )
    item = jnp.concatenate(
        [
            Gi,
            jnp.zeros((I, 2 * K), Gi.dtype),
            Bi[:, None],
            jnp.zeros((I, 2), Bi.dtype),
        ],
        axis=1,
    )
    dense = {
        name: (params[name], jnp.zeros_like(params[name]),
               jnp.zeros_like(params[name]))
        for name in ("E", "Bp", "Ec", "Ee")
    }
    return PackedGradFashionState(
        jnp.zeros((), jnp.int32), user, item,
        jnp.zeros((U,), jnp.int32), jnp.zeros((I,), jnp.int32), dense,
    )


def unpack_grad_fashion_params(state: PackedGradFashionState,
                               embed_k: int, embed_d: int):
    K, D = embed_k, embed_d
    return {
        "Gu": state.user_pmv[:, :K],
        "Tu": state.user_pmv[:, K:K + D],
        "Gi": state.item_pmv[:, :K],
        "Bi": state.item_pmv[:, 3 * K],
        "E": state.dense["E"][0],
        "Bp": state.dense["Bp"][0],
        "Ec": state.dense["Ec"][0],
        "Ee": state.dense["Ee"][0],
    }


def make_packed_grad_fashion_step(model, lr: float, reg: float) -> Callable:
    """GradFashion train step over packed state.  Structure is VBPR's plus a
    second frozen family and the Ec/Ee family projections; the reference's
    reg here keeps BOTH biases at full reg — no /10 (GradFashion.py:171-181,
    reproduced from models/grad_fashion.py::loss)."""
    from fashionvisualexpl_tpu.train.fast import dense_adam

    K, D = model.embed_k, model.embed_d

    def step(state: PackedGradFashionState, batch):
        (frozen_Fc, frozen_Fe), (u, p_ids, n_ids) = batch
        B = u.shape[0]
        ii = jnp.concatenate([p_ids, n_ids])

        UR = jnp.take(state.user_pmv, u, axis=0)  # [B, 3(K+D)]
        IR = jnp.take(state.item_pmv, ii, axis=0)  # [2B, 3K+3]
        FC = jnp.take(frozen_Fc, ii, axis=0)  # [2B, dim_c]
        FE = jnp.take(frozen_Fe, ii, axis=0)  # [2B, dim_e]
        gu, tu = UR[:, :K], UR[:, K:K + D]
        gp, gn = IR[:B, :K], IR[B:, :K]
        bp, bn = IR[:B, 3 * K], IR[B:, 3 * K]
        cp, cn = FC[:B], FC[B:]
        ep, en = FE[:B], FE[B:]
        E, Bp = state.dense["E"][0], state.dense["Bp"][0]
        Ec, Ee = state.dense["Ec"][0], state.dense["Ee"][0]

        def local_loss(gu, tu, gp, gn, bp, bn, E, Bp, Ec, Ee):
            vf_p = jnp.concatenate([cp @ Ec, ep @ Ee], axis=1)
            vf_n = jnp.concatenate([cn @ Ec, en @ Ee], axis=1)
            x_pos = (
                bp + jnp.sum(gu * gp, axis=1)
                + jnp.sum(tu * (vf_p @ E), axis=1) + (vf_p @ Bp)[:, 0]
            )
            x_neg = (
                bn + jnp.sum(gu * gn, axis=1)
                + jnp.sum(tu * (vf_n @ E), axis=1) + (vf_n @ Bp)[:, 0]
            )
            loss = bpr_pairwise_loss(x_pos, x_neg)
            return loss + (
                reg * (l2_loss(gu) + l2_loss(gp) + l2_loss(gn) + l2_loss(tu))
                * 2.0
                + reg * (l2_loss(bp) + l2_loss(bn)) * 2.0
                + reg * (l2_loss(Ec) + l2_loss(Ee) + l2_loss(E) + l2_loss(Bp))
                * 2.0
            )

        loss, grads = jax.value_and_grad(
            local_loss, argnums=tuple(range(10))
        )(gu, tu, gp, gn, bp, bn, E, Bp, Ec, Ee)
        dgu, dtu, dgp, dgn, dbp, dbn, dE, dBp, dEc, dEe = grads
        t = (state.step + 1).astype(jnp.float32)

        # users: Gu and Tu grads share the id dedupe (one packed row)
        uids, cg = compact_row_grads(
            u, jnp.concatenate([dgu, dtu], axis=1), B
        )
        rows = jnp.take(state.user_pmv, uids, axis=0)
        dt = (t - state.tau_u[uids].astype(jnp.float32))[:, None]
        user_pmv = state.user_pmv.at[uids].set(
            _lazy_rows(rows, cg, dt, t, lr), unique_indices=True
        )
        tau_u = state.tau_u.at[uids].set(
            t.astype(jnp.int32), unique_indices=True
        )

        # items: embedding + bias grads share the id dedupe
        gi_cat = jnp.concatenate(
            [
                jnp.concatenate([dgp, dgn], axis=0),
                jnp.concatenate([dbp, dbn])[:, None],
            ],
            axis=1,
        )
        iids, cgi = compact_row_grads(ii, gi_cat, 2 * B)
        rows = jnp.take(state.item_pmv, iids, axis=0)
        dt = (t - state.tau_i[iids].astype(jnp.float32))[:, None]
        emb = _lazy_rows(rows[:, : 3 * K], cgi[:, :K], dt, t, lr)
        bias = _lazy_rows(
            rows[:, 3 * K:].reshape(-1, 3), cgi[:, K:], dt, t, lr
        )
        item_pmv = state.item_pmv.at[iids].set(
            jnp.concatenate([emb, bias], axis=1), unique_indices=True
        )
        tau_i = state.tau_i.at[iids].set(
            t.astype(jnp.int32), unique_indices=True
        )

        dense = {}
        for name, g in (("E", dE), ("Bp", dBp), ("Ec", dEc), ("Ee", dEe)):
            p, m, v = state.dense[name]
            dense[name] = dense_adam(p, m, v, g, lr, t)

        return (
            PackedGradFashionState(
                state.step + 1, user_pmv, item_pmv, tau_u, tau_i, dense
            ),
            loss,
        )

    return step


def make_packed_grad_fashion_epoch_fn(
    model, lr: float, reg: float, num_items: int, steps: int, batch: int,
    with_replacement: bool = True,
) -> Callable:
    step_fn = make_packed_grad_fashion_step(model, lr, reg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: PackedGradFashionState, frozen_Fc, frozen_Fe, key,
              train_pairs, padded_pos, pos_counts):
        users, pos, neg = sample_triplets(
            key, train_pairs, padded_pos, pos_counts, num_items, steps, batch,
            with_replacement=with_replacement,
        )

        def body(st, sb):
            return step_fn(st, ((frozen_Fc, frozen_Fe), sb))

        state, losses = jax.lax.scan(body, state, (users, pos, neg))
        return state, jnp.sum(losses)

    return epoch
