"""Generic packed-state engine: the packed-row + LazyAdam fast path
(train/packed.py) factored into a model-agnostic engine.

A model opts in by implementing two methods:

- ``packed_spec() -> PackedSpec`` — which params are user-row tables,
  item-row tables, item scalars (folded into the item row, e.g. the item
  bias), and which are small dense params (arrays or whole pytrees, e.g. a
  CNN tower) updated with ordinary dense Adam;
- ``packed_loss(user_vw, pos_vw, neg_vw, dense, frozen, ids, reg, rng)``
  — the per-batch loss over the GATHERED row views (``user_vw['Gu']`` is
  the [B, K] slice of the packed user rows, etc.), mirroring the model's
  ``loss`` semantics exactly.  ``frozen`` is the whole frozen pytree
  (device-resident); the model gathers what it needs with ``ids=(u, p, n)``.

The engine owns everything else: row packing ([p | m | v] columns, scalars
as trailing [p,m,v] triples), the one-dedupe-per-table id compaction, the
LazyAdam catch-up update on touched rows only, dense Adam on the dense
pytrees, and the scanned, donated epoch function.  See train/packed.py for
the measurements motivating the layout (row ops are DMA-issue-latency
bound; packing p/m/v per id makes the whole optimizer 4 gathers +
2 scatters regardless of how many logical arrays ride in the row).

Parity: for BPRMF/VBPR/GradFashion this engine reproduces the specialized
steps in train/packed.py bit-for-bit (pinned in tests/test_packed_generic.py);
it additionally powers CompVBPR and AttentiveFashion, whose trainable
towers ride in ``dense``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fashionvisualexpl_tpu.data.sampler import sample_triplets
from fashionvisualexpl_tpu.models.base import PackedSpec
from fashionvisualexpl_tpu.train.fast import compact_row_grads, dense_adam
from fashionvisualexpl_tpu.train.packed import _lazy_rows

__all__ = [
    "PackedSpec",
    "GenericPackedState",
    "pack_generic_state",
    "unpack_generic_params",
    "make_generic_packed_step",
    "make_generic_packed_epoch_fn",
    "GenericPackedTrainState",
]


class GenericPackedState(NamedTuple):
    """Packed rows carry their OWN LazyAdam last-touch timestamp as the
    final fp32 column (exact for step counts < 2^24): row =
    [p|m|v (+scalar triples) (+frozen cols when fused) | tau].  Folding tau
    into the row removes FOUR row-granular ops per step (two 1D tau gathers
    + two 1D tau scatters) — row width below ~2KB is free while every
    row-granular op pays a ~19-84ns/row access floor (SPEED.md round-3
    gather-wall measurements); the tau read now rides the unique-row gather
    and the tau write rides the row scatter."""

    step: jnp.ndarray  # scalar int32
    user_pmv: jax.Array  # [U, 3*Wu + 1]
    item_pmv: jax.Array  # [I, 3*Wi + 3*nS (+ frozen cols when fused) + 1]
    dense: Dict[str, tuple]  # name -> (p, m, v) pytrees


def _offsets(tables):
    offs, off = [], 0
    for name, w in tables:
        offs.append((name, off, w))
        off += w
    return offs, off


def _moment_cols(moment_dtype) -> int:
    """Columns per logical parameter column: 3 ([p|m|v] fp32) or 2
    ([p|mv] with m,v bit-packed as two bf16 halves of one fp32 column).
    float8 moments have no uniform per-column width (4 codes share one
    fp32 column) — engines built on this helper (the sharded fast path)
    reject it explicitly."""
    if moment_dtype in ("float32", jnp.float32, None):
        return 3
    if moment_dtype in ("bfloat16", jnp.bfloat16):
        return 2
    if moment_dtype == "float8":
        raise ValueError(
            "moment_dtype 'float8' is single-device only (the sharded "
            "packed engine's column groups assume a uniform per-column "
            "moment width) — use 'bfloat16' over a mesh"
        )
    raise ValueError(
        f"moment_dtype {moment_dtype!r} not float32/bfloat16/float8"
    )


def _mom_width(moment_dtype, w: int) -> int:
    """Moment-block columns for a `w`-wide parameter block: fp32 stores
    [m|v] (2w), bf16 one packed mv column per parameter column (w), fp8
    four e5m2 codes (m,v for TWO parameter columns) per fp32 column
    (ceil(w/2))."""
    if moment_dtype in ("float32", jnp.float32, None):
        return 2 * w
    if moment_dtype in ("bfloat16", jnp.bfloat16):
        return w
    if moment_dtype == "float8":
        return (w + 1) // 2
    raise ValueError(
        f"moment_dtype {moment_dtype!r} not float32/bfloat16/float8"
    )


def _scalar_group(moment_dtype) -> int:
    """Columns per item-scalar group.  fp32: [p|m|v].  bf16 AND fp8:
    [p|mv] with the bf16 pair packing — a lone scalar cannot fill a 4-code
    fp8 column, and nS is tiny (<= 1 in every registered model), so fp8
    rows keep their scalars at bf16 precision."""
    return 3 if moment_dtype in ("float32", jnp.float32, None) else 2


def _mv_pack(m: jax.Array, v: jax.Array) -> jax.Array:
    """(m, v) fp32 -> one fp32 column carrying (bf16(m) << 16) | bf16(v).

    bf16 = the top 16 bits of fp32, so the round-to-nearest cast keeps
    8 mantissa bits of each moment; zero bits decode to (0, 0), which is
    what pack_generic_state's zero-init relies on."""
    mb = jax.lax.bitcast_convert_type(
        m.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    vb = jax.lax.bitcast_convert_type(
        v.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((mb << 16) | vb, jnp.float32)


def _mv_unpack(col: jax.Array) -> Tuple[jax.Array, jax.Array]:
    bits = jax.lax.bitcast_convert_type(col, jnp.uint32)
    m = jax.lax.bitcast_convert_type(
        (bits >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    v = jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return m, v


# static pre-scale moving fp8-stored moments away from e5m2's subnormal
# floor (2^-16): m ~ lr-scale gradients (1e-4-ish) and sqrt(v) ~ |g| both
# land in e5m2's NORMAL range after *256, where relative error is a flat
# ~6-12% (2 mantissa bits) instead of degrading to 50%+ near the floor
_FP8_SCALE = 256.0


def _mv_pack_fp8(m: jax.Array, v: jax.Array) -> jax.Array:
    """(m, v) fp32 [S, W] -> [S, ceil(W/2)] fp32 columns of 4 e5m2 codes
    (m0,v0,m1,v1 per column; odd W pads a zero pair).

    v is stored as sqrt(v): it halves the exponent range the 5-bit
    exponent must span (v ~ g^2 reaches 1e-10 while sqrt stays ~1e-5) and
    the consumer needs sqrt(v_hat) anyway.  Zero bits decode to (0, 0) —
    pack_generic_state's zero-init needs no special casing."""
    S, W = m.shape
    if W % 2:
        m = jnp.pad(m, ((0, 0), (0, 1)))
        v = jnp.pad(v, ((0, 0), (0, 1)))
    enc = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
        (x * _FP8_SCALE).astype(jnp.float8_e5m2), jnp.uint8
    ).astype(jnp.uint32)
    mb = enc(m)
    vb = enc(jnp.sqrt(v))
    quad = (
        (mb[:, 0::2] << 24) | (vb[:, 0::2] << 16)
        | (mb[:, 1::2] << 8) | vb[:, 1::2]
    )
    return jax.lax.bitcast_convert_type(quad, jnp.float32)


def _mv_unpack_fp8(cols: jax.Array, w: int) -> Tuple[jax.Array, jax.Array]:
    """Inverse of _mv_pack_fp8: [S, ceil(w/2)] -> (m [S, w], v [S, w])."""
    bits = jax.lax.bitcast_convert_type(cols, jnp.uint32)
    dec = lambda u: jax.lax.bitcast_convert_type(  # noqa: E731
        u.astype(jnp.uint8), jnp.float8_e5m2
    ).astype(jnp.float32) / _FP8_SCALE
    S, H = bits.shape
    m = jnp.stack([dec(bits >> 24), dec(bits >> 8)], axis=2).reshape(S, 2 * H)
    s = jnp.stack([dec(bits >> 16), dec(bits)], axis=2).reshape(S, 2 * H)
    return m[:, :w], jnp.square(s[:, :w])


def _lazy_rows_fp8(rows, g, dt, t, lr, catchup: bool = False):
    """LazyAdam on gathered packed rows with fp8-packed moments:
    rows [S, K + ceil(K/2)] as p|mv8 column groups, g [S, K].  Moment math
    runs fp32; storage rounds m and sqrt(v) to e5m2 — HALF the bf16
    moment bytes at ~2 mantissa bits."""
    from fashionvisualexpl_tpu.train.fast import B1, B2, EPS
    from fashionvisualexpl_tpu.train.packed import _momentum_catchup

    K = g.shape[1]
    p = rows[:, :K]
    m, v = _mv_unpack_fp8(rows[:, K:], K)
    if catchup:
        p = _momentum_catchup(p, m, v, dt, t, lr)
    m = m * jnp.power(B1, dt) + (1.0 - B1) * g
    v = v * jnp.power(B2, dt) + (1.0 - B2) * jnp.square(g)
    m_hat = m / (1.0 - B1 ** t)
    v_hat = v / (1.0 - B2 ** t)
    p = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
    return jnp.concatenate([p, _mv_pack_fp8(m, v)], axis=1)


def _lazy_rows_bf16(rows, g, dt, t, lr, catchup: bool = False):
    """LazyAdam on gathered packed rows with bf16-packed moments:
    rows [S, 2K(+2)] with p|mv column groups, g [S, K(+1)].  Moment math
    runs fp32; storage rounds to bf16 (the measured trade: 1/3 less row
    traffic on the bytes-bound scatters vs ~8-bit moment mantissas)."""
    from fashionvisualexpl_tpu.train.fast import B1, B2, EPS
    from fashionvisualexpl_tpu.train.packed import _momentum_catchup

    K = g.shape[1]
    p = rows[:, :K]
    m, v = _mv_unpack(rows[:, K:2 * K])
    if catchup:
        p = _momentum_catchup(p, m, v, dt, t, lr)
    m = m * jnp.power(B1, dt) + (1.0 - B1) * g
    v = v * jnp.power(B2, dt) + (1.0 - B2) * jnp.square(g)
    m_hat = m / (1.0 - B1 ** t)
    v_hat = v / (1.0 - B2 ** t)
    p = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
    return jnp.concatenate([p, _mv_pack(m, v)], axis=1)


def _row_pad(width: int, row_align: int) -> int:
    """Dead trailing columns to make a packed-row width a multiple of
    ``row_align``.  TPU tiled layouts pad the lane dim to 128: a 257-col
    row occupies 384 lanes, and XLA materializes a full PADDED copy of
    the whole table at the epoch scan's boundary (measured: [400k, 257]
    table -> 0.615GB transient vs ZERO at width 256) — at the capacity
    frontier that transient is a 1.5x HBM tax.  Padding the row
    explicitly costs the same per-row bytes RESIDENT but removes the
    transient, cutting peak HBM from ~2.5x to ~1.5x of the logical table
    — the difference between ~5.5M and ~9M K=128 bf16 rows on 16GB."""
    if row_align <= 1:
        return 0
    if row_align > 128:
        raise ValueError("row_align > 128 defeats moment-dtype inference")
    return (-width) % row_align


def pack_generic_state(model, params, frozen=None,
                       moment_dtype="float32",
                       row_align: int = 1) -> GenericPackedState:
    """Pack params into p|m|v rows.  When `frozen` is given and the spec
    declares ``frozen_item_tables``, their columns are folded into the item
    rows (the step then issues ONE row gather where it would issue two —
    row gathers are latency-bound, not width-bound).  The sharded engine
    packs without `frozen` (frozen columns must not ride the lookup psum).

    ``moment_dtype='bfloat16'`` stores the Adam moments as two bf16 halves
    bit-packed into ONE fp32 column per parameter column (row layout
    [p | mv | scalar (p, mv) pairs | frozen | tau]) — the row shrinks from
    3W+1 to 2W+1 columns, cutting the bytes-bound scatter traffic by ~1/3
    at ~8-bit moment mantissas (zero bits decode to (0, 0), so zero-init
    needs no special casing).  ``moment_dtype='float8'`` packs m and
    sqrt(v) as e5m2 codes, FOUR per fp32 column — rows shrink further to
    W + ceil(W/2) + gs*nS + 1 (~25% below bf16 at large W) at ~2-bit
    moment mantissas; single-device only."""
    spec: PackedSpec = model.packed_spec()
    u_offs, Wu = _offsets(spec.user_tables)
    i_offs, Wi = _offsets(spec.item_tables)
    gs = _scalar_group(moment_dtype)
    U = params[spec.user_tables[0][0]].shape[0]
    I = params[spec.item_tables[0][0]].shape[0]
    dtype = params[spec.user_tables[0][0]].dtype

    u_base = Wu + _mom_width(moment_dtype, Wu) + 1
    user = jnp.concatenate(
        [params[n] for n, _, _ in u_offs]
        + [jnp.zeros(
            (U, _mom_width(moment_dtype, Wu) + 1
             + _row_pad(u_base, row_align)), dtype,
        )],
        axis=1,
    )  # m, v (packed) + tau (+ alignment pad)
    parts = [params[n] for n, _, _ in i_offs] + [
        jnp.zeros((I, _mom_width(moment_dtype, Wi)), dtype)
    ]
    for s in spec.item_scalars:
        parts += [params[s][:, None], jnp.zeros((I, gs - 1), dtype)]
    if frozen is not None:
        for name, w in spec.frozen_item_tables:
            col = jnp.asarray(frozen[name]).reshape(I, -1).astype(dtype)
            if col.shape[1] != w:
                raise ValueError(
                    f"frozen table {name!r}: declared width {w} != "
                    f"flattened width {col.shape[1]}"
                )
            parts.append(col)
    i_base = 1 + sum(int(p.shape[1]) for p in parts)  # + tau
    parts.append(
        jnp.zeros((I, 1 + _row_pad(i_base, row_align)), dtype)
    )  # tau col (+ alignment pad)
    item = jnp.concatenate(parts, axis=1)

    zeros_like_tree = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
    dense = {
        name: (params[name], zeros_like_tree(params[name]),
               zeros_like_tree(params[name]))
        for name in spec.dense
    }
    return GenericPackedState(jnp.zeros((), jnp.int32), user, item, dense)


def unpack_generic_params(state: GenericPackedState, spec: PackedSpec,
                          moment_dtype=None):
    """Standard params dict from the packed state (slice views + dense p —
    amortized over an epoch/eval, never used inside the step).  The moment
    layout (fp32 triples / bf16 pairs / fp8 quads) is taken from
    ``moment_dtype`` when given, else inferred from the user row width
    Wu + mom_width + 1 (unique for unpadded states; can be ambiguous for
    row_align-padded ones)."""
    u_offs, Wu = _offsets(spec.user_tables)
    i_offs, Wi = _offsets(spec.item_tables)
    md = moment_dtype
    if md is None:
        # infer from the user row width.  Exact (unpadded) widths are
        # unique across layouts for Wu >= 2; row_align-padded widths can
        # be ambiguous (several bases fit within the <128 pad budget), in
        # which case the caller must pass moment_dtype — the trainer's
        # GenericPackedTrainState carries it for exactly this reason.
        wu_total = state.user_pmv.shape[1]
        bases = {
            cand: Wu + _mom_width(cand, Wu) + 1
            for cand in ("float32", "bfloat16", "float8")
        }
        exact = [c for c in ("bfloat16", "float32", "float8")
                 if bases[c] == wu_total]
        viable = [c for c in ("bfloat16", "float32", "float8")
                  if 0 <= wu_total - bases[c] < 128]
        if exact:
            md = exact[0]
        elif len(viable) == 1:
            md = viable[0]
        elif viable:
            raise ValueError(
                f"user row width {wu_total} is row_align-padded and "
                f"matches several moment layouts {viable} for Wu={Wu} — "
                "pass moment_dtype explicitly"
            )
        else:
            raise ValueError(
                f"user row width {wu_total} does not match any moment "
                f"layout for Wu={Wu}"
            )
    gs = _scalar_group(md)
    sc0 = Wi + _mom_width(md, Wi)
    params = {}
    for n, off, w in u_offs:
        params[n] = state.user_pmv[:, off:off + w]
    for n, off, w in i_offs:
        params[n] = state.item_pmv[:, off:off + w]
    for j, s in enumerate(spec.item_scalars):
        params[s] = state.item_pmv[:, sc0 + gs * j]
    for name, (p, _, _) in state.dense.items():
        params[name] = p
    return params


def make_generic_packed_step(
    model, lr: float, reg: float, fused_frozen: bool = False,
    moment_dtype: str = "float32", lazy_catchup: bool = False,
) -> Callable:
    """`fused_frozen=True` requires the state to have been packed WITH the
    frozen pytree (pack_generic_state(..., frozen=...)); the step then reads
    the frozen feature columns out of the same row gathers and hands them to
    packed_loss as `frozen_vw`.  `moment_dtype` must match the value the
    state was packed with (see pack_generic_state).  ``lazy_catchup=True``
    applies the closed-form momentum tail of skipped steps on touch
    (train/packed.py::_momentum_catchup) — dense-Adam-like convergence at
    touched-rows-only cost."""
    spec: PackedSpec = model.packed_spec()
    u_offs, Wu = _offsets(spec.user_tables)
    i_offs, Wi = _offsets(spec.item_tables)
    nS = len(spec.item_scalars)
    E = spec.extra_items
    f_offs, _ = _offsets(spec.frozen_item_tables)
    _rows_fn = {
        3: _lazy_rows, 2: _lazy_rows_bf16, 1: _lazy_rows_fp8,
    }[3 if moment_dtype in ("float32", None) else
      (2 if moment_dtype == "bfloat16" else 1)]
    lazy_rows = functools.partial(_rows_fn, catchup=lazy_catchup)
    # fp8 scalars keep the bf16 pair layout (see _scalar_group)
    _sc_fn = _lazy_rows_bf16 if moment_dtype == "float8" else _rows_fn
    lazy_scalar_rows = functools.partial(_sc_fn, catchup=lazy_catchup)
    gs = _scalar_group(moment_dtype)
    sc0 = Wi + _mom_width(moment_dtype, Wi)  # scalar groups start here
    F0 = sc0 + gs * nS  # frozen columns start here
    fused_frozen = bool(fused_frozen and spec.frozen_item_tables)
    # tau column indices (row_align pads trail AFTER tau; the pads pass
    # through gather/scatter untouched — see _row_pad)
    frozen_w = (
        sum(w for _, w in spec.frozen_item_tables) if fused_frozen else 0
    )
    tau_u = Wu + _mom_width(moment_dtype, Wu)
    tau_i = F0 + frozen_w

    def step(state: GenericPackedState, batch):
        frozen, (u, p_ids, n_ids), rng = batch
        B = u.shape[0]

        UR = jnp.take(state.user_pmv, u, axis=0)  # [B, 3Wu+1]
        IR = jnp.take(
            state.item_pmv, jnp.concatenate([p_ids, n_ids]), axis=0
        )  # [2B, 3Wi+3nS(+F)+1]

        user_vw = {n: UR[:, off:off + w] for n, off, w in u_offs}
        pos_vw = {n: IR[:B, off:off + w] for n, off, w in i_offs}
        neg_vw = {n: IR[B:, off:off + w] for n, off, w in i_offs}
        for j, s in enumerate(spec.item_scalars):
            col = sc0 + gs * j
            pos_vw[s] = IR[:B, col]
            neg_vw[s] = IR[B:, col]
        dense_p = {name: state.dense[name][0] for name in spec.dense}

        # extra per-batch-element item rows (ACF's user-positive sets):
        # gathered here, differentiated alongside pos/neg, scattered back
        # through the same item dedupe below
        if E:
            xids = model.packed_extra_item_ids(
                frozen, (u, p_ids, n_ids)
            ).reshape(-1)  # [B*E]
            XR = jnp.take(state.item_pmv, xids, axis=0)  # [B*E, 3Wi+3nS(+F)+1]
            extra_vw = {
                n: XR[:, off:off + w].reshape(B, E, w)
                for n, off, w in i_offs
            }
            for j, s in enumerate(spec.item_scalars):
                extra_vw[s] = XR[:, sc0 + gs * j].reshape(B, E)
            ii = jnp.concatenate([p_ids, n_ids, xids])
        else:
            extra_vw = None
            ii = jnp.concatenate([p_ids, n_ids])

        # frozen feature columns, sliced out of the SAME row gathers —
        # closure constants w.r.t. the differentiated views below
        frozen_vw = None
        if fused_frozen:
            frozen_vw = {
                "pos": {n: IR[:B, F0 + off:F0 + off + w]
                        for n, off, w in f_offs},
                "neg": {n: IR[B:, F0 + off:F0 + off + w]
                        for n, off, w in f_offs},
            }
            if E:
                frozen_vw["extra"] = {
                    n: XR[:, F0 + off:F0 + off + w].reshape(B, E, w)
                    for n, off, w in f_offs
                }

        def local_loss(user_vw, pos_vw, neg_vw, extra_vw, dense_p):
            kw = {"extra_vw": extra_vw} if E else {}
            if fused_frozen:
                kw["frozen_vw"] = frozen_vw
            return model.packed_loss(
                user_vw, pos_vw, neg_vw, dense_p, frozen,
                (u, p_ids, n_ids), reg, rng, **kw,
            )

        if E:
            loss, (gU, gP, gN, gX, gD) = jax.value_and_grad(
                local_loss, argnums=(0, 1, 2, 3, 4)
            )(user_vw, pos_vw, neg_vw, extra_vw, dense_p)
        else:
            loss, (gU, gP, gN, gD) = jax.value_and_grad(
                lambda uv, pv, nv, dp: local_loss(uv, pv, nv, None, dp),
                argnums=(0, 1, 2, 3),
            )(user_vw, pos_vw, neg_vw, dense_p)
            gX = None
        t = (state.step + 1).astype(jnp.float32)

        # --- users: all user tables share one packed row and one dedupe;
        # the tau column rides the same gather/scatter (no 1D tau ops) ---
        gu_cat = jnp.concatenate([gU[n] for n, _, _ in u_offs], axis=1)
        uids, cg = compact_row_grads(u, gu_cat, B)
        rows = jnp.take(state.user_pmv, uids, axis=0)  # [S, tau_u+1(+pad)]
        dt = (t - rows[:, tau_u])[:, None]
        new_rows = jnp.concatenate(
            [
                lazy_rows(rows[:, :tau_u], cg, dt, t, lr),
                jnp.full((rows.shape[0], 1), t, rows.dtype),
                rows[:, tau_u + 1:],  # alignment pads pass through
            ],
            axis=1,
        )
        user_pmv = state.user_pmv.at[uids].set(new_rows, unique_indices=True)

        # --- items: vector tables + scalars (+ extra rows) share one dedupe ---
        gi_parts = [
            jnp.concatenate(
                [gP[n], gN[n]]
                + ([gX[n].reshape(B * E, w)] if E else []),
                axis=0,
            )
            for n, _, w in i_offs
        ]
        for s in spec.item_scalars:
            gi_parts.append(
                jnp.concatenate(
                    [gP[s], gN[s]] + ([gX[s].reshape(B * E)] if E else [])
                )[:, None]
            )
        iids, cgi = compact_row_grads(
            ii, jnp.concatenate(gi_parts, axis=1), 2 * B + B * E
        )
        rows = jnp.take(state.item_pmv, iids, axis=0)  # [S, tau_i+1(+pad)]
        dt = (t - rows[:, tau_i])[:, None]
        emb = lazy_rows(rows[:, :sc0], cgi[:, :Wi], dt, t, lr)
        # frozen cols (when fused) and alignment pads pass through
        # unchanged; tau col refreshed
        tail = [rows[:, F0:tau_i]] if fused_frozen else []
        tau_col = jnp.full((rows.shape[0], 1), t, rows.dtype)
        pads = [rows[:, tau_i + 1:]]
        if nS:
            S = rows.shape[0]
            sc_rows = rows[:, sc0:F0].reshape(S * nS, gs)
            sc_g = cgi[:, Wi:].reshape(S * nS, 1)
            # broadcast, not jnp.repeat: repeat lowers to a real gather
            # (measured 8x on the sampler's perm expansion, SPEED.md r5);
            # row-major broadcast gives the same interleaving for free
            sc_dt = jnp.broadcast_to(dt, (S, nS)).reshape(S * nS, 1)
            sc = lazy_scalar_rows(sc_rows, sc_g, sc_dt, t, lr).reshape(
                S, gs * nS
            )
            new_rows = jnp.concatenate(
                [emb, sc] + tail + [tau_col] + pads, axis=1
            )
        else:
            new_rows = jnp.concatenate(
                [emb] + tail + [tau_col] + pads, axis=1
            )
        item_pmv = state.item_pmv.at[iids].set(
            new_rows, unique_indices=True
        )

        # --- dense params (arrays or whole pytrees): ordinary dense Adam ---
        dense = {}
        for name in spec.dense:
            p, m, v = state.dense[name]
            flat_p, treedef = jax.tree_util.tree_flatten(p)
            flat_m = jax.tree_util.tree_leaves(m)
            flat_v = jax.tree_util.tree_leaves(v)
            flat_g = jax.tree_util.tree_leaves(gD[name])
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

    return step


def make_generic_packed_epoch_fn(
    model, lr: float, reg: float, num_items: int, steps: int, batch: int,
    with_replacement: bool = True, fused_frozen: bool = False,
    moment_dtype: str = "float32", lazy_catchup: bool = False,
) -> Callable:
    """Scanned, donated epoch over the generic packed step.  Per-step PRNG
    keys are threaded through for models whose loss uses dropout
    (AttentiveFashion, CompVBPR's CNN tower); others ignore them.
    `fused_frozen` requires a state packed with the frozen pytree;
    `moment_dtype`/`lazy_catchup`: see make_generic_packed_step."""
    step_fn = make_generic_packed_step(
        model, lr, reg, fused_frozen=fused_frozen, moment_dtype=moment_dtype,
        lazy_catchup=lazy_catchup,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: GenericPackedState, frozen, key,
              train_pairs, padded_pos, pos_counts):
        sample_key, step_key = jax.random.split(key)
        users, pos, neg = sample_triplets(
            sample_key, train_pairs, padded_pos, pos_counts,
            num_items, steps, batch, with_replacement=with_replacement,
        )
        step_keys = jax.random.split(step_key, steps)

        def body(st, sb):
            u, p, n, k = sb
            return step_fn(st, (frozen, (u, p, n), k))

        state, losses = jax.lax.scan(
            body, state, (users, pos, neg, step_keys)
        )
        return state, jnp.sum(losses)

    return epoch


class GenericPackedTrainState:
    """Pytree adapter presenting a generic packed state to the shared fit()
    loop: `.params` materializes the standard dict (slice views + dense p)
    for eval/best-copy/checkpoint — never used inside the step.
    ``moment_dtype`` rides as static aux so row_align-padded layouts
    unpack unambiguously (None = infer from widths)."""

    def __init__(self, inner: GenericPackedState, spec: PackedSpec,
                 moment_dtype=None):
        self.inner = inner
        self.spec = spec
        self.moment_dtype = moment_dtype

    def with_inner(self, inner):
        return GenericPackedTrainState(inner, self.spec, self.moment_dtype)

    @property
    def step(self):
        return self.inner.step

    @property
    def params(self):
        return unpack_generic_params(self.inner, self.spec,
                                     self.moment_dtype)


jax.tree_util.register_pytree_node(
    GenericPackedTrainState,
    lambda s: ((s.inner,), (s.spec, s.moment_dtype)),
    lambda aux, ch: GenericPackedTrainState(ch[0], *aux),
)
