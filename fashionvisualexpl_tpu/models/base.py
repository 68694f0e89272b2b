"""Model protocol and shared loss pieces.

The reference buries the train loop, checkpointing, and best-model tracking
inside every model class (src/recommender/models/BPRMF.py:127-192).  Here a
model is a thin, stateless object exposing pure functions over explicit
parameter pytrees; one shared jitted trainer (train/trainer.py) and one
evaluator (eval/evaluator.py) serve every model.

Parameters are split into two pytrees:
- ``params``  — trainable (optimized);
- ``frozen``  — non-trainable constants (e.g. VBPR's frozen CNN feature matrix
  F, reference VBPR.py:49-51), passed as jit arguments so they are not baked
  into the compiled program as literals.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
Frozen = Dict[str, Any]


class PackedSpec(NamedTuple):
    """How a model's params map onto the packed-row fast path
    (train/packed_generic.py): user/item row tables (name, width), item
    scalars folded into the item rows, and dense-Adam params (arrays or
    whole pytrees such as a CNN tower).

    ``extra_items`` > 0 declares that the loss additionally reads E item
    rows PER BATCH ELEMENT beyond the pos/neg rows (ACF's attentive profile
    over each user's positive set, reference ACF.py:164-179); the engine
    gathers them from ``packed_extra_item_ids`` and routes their gradients
    into the same item-row dedupe/scatter.

    ``frozen_item_tables`` names per-item FROZEN feature tables (name in the
    frozen pytree, flattened row width) that the single-device engine can
    fold into the packed item rows: row gathers are DMA-issue-latency bound
    (~80ns/row regardless of width, SPEED.md), so co-locating the frozen
    columns makes the big extra-row gather ONE gather instead of two.  The
    engine passes the gathered views to ``packed_loss`` via ``frozen_vw``;
    when it doesn't (sharded engine, or packing without the frozen pytree),
    ``frozen_vw`` is None and the loss gathers from ``frozen`` itself."""

    user_tables: Tuple[Tuple[str, int], ...]
    item_tables: Tuple[Tuple[str, int], ...]
    item_scalars: Tuple[str, ...]
    dense: Tuple[str, ...]
    extra_items: int = 0
    frozen_item_tables: Tuple[Tuple[str, int], ...] = ()


def l2_loss(x: jax.Array) -> jax.Array:
    """tf.nn.l2_loss parity: 0.5 * sum(x**2)."""
    return 0.5 * jnp.sum(jnp.square(x))


def bpr_pairwise_loss(x_pos: jax.Array, x_neg: jax.Array) -> jax.Array:
    """Summed BPR triplet loss with the reference's clip quirk
    (BPRMF.py:104-106): softplus(-clip(x_pos - x_neg, -80, 1e8))."""
    diff = jnp.clip(x_pos - x_neg, -80.0, 1e8)
    return jnp.sum(jax.nn.softplus(-diff))


def glorot_uniform(key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    """GlorotUniform parity with tf.initializers.GlorotUniform (BPRMF.py:36)."""
    return jax.nn.initializers.glorot_uniform()(key, shape, jnp.float32)


def normal_init(
    key: jax.Array, shape: Tuple[int, ...], stddev: float = 0.01
) -> jax.Array:
    """RandomNormal(mean=0, stddev=0.01) parity (AttentiveFashion.py:24)."""
    return stddev * jax.random.normal(key, shape, jnp.float32)


def default_take(name: str, arr: jax.Array, ids: jax.Array) -> jax.Array:
    """Single-device table lookup: plain row gather (name is advisory)."""
    del name
    return jnp.take(arr, ids, axis=0)


class RecommenderModel:
    """Base interface.  Concrete models implement:

    - init(rng) -> (params, frozen)
    - score(params, frozen, users, items) -> [B] pointwise scores
    - loss(params, frozen, users, pos, neg, reg) -> scalar training loss
    - predict_all(params, frozen) -> [U, I] full score matrix
    - predict_user_block(params, frozen, user_ids) -> [B_u, I] score rows

    Table access inside `loss` goes through ``self.take(name, arr, ids)`` so
    the SPMD engine (parallel/spmd.py) can swap in a collective
    local-gather + psum lookup for row-sharded tables without touching model
    code.  ``row_sharded_params()`` names the tables that shard over the
    `model` mesh axis; ``global_reg_scale`` divides whole-matrix
    regularization terms so they are counted once across data-parallel
    replicas (batch-row reg terms sum correctly on their own).
    """

    name: str = "base"

    def __init__(self, num_users: int, num_items: int):
        self.num_users = num_users
        self.num_items = num_items
        self.take = default_take
        self.global_reg_scale = 1.0

    def row_sharded_params(self) -> tuple:
        """Names (in params/frozen) of tables row-sharded over `model`."""
        return ()

    def init(self, rng: jax.Array) -> Tuple[Params, Frozen]:
        raise NotImplementedError

    def score(self, params, frozen, users, items):
        raise NotImplementedError

    def loss(self, params, frozen, users, pos, neg, reg, rng=None):
        """Training loss.  `rng` is a per-step PRNG key for stochastic layers
        (dropout); models without stochastic layers ignore it."""
        raise NotImplementedError

    # --- packed fast path (train/packed_generic.py), optional ---

    def packed_spec(self) -> "PackedSpec":
        """Row/dense layout for the packed fast path; models that support
        `train_path='packed'` override this together with `packed_loss`."""
        raise NotImplementedError(
            f"{self.name} does not implement the packed fast path"
        )

    def packed_loss(self, user_vw, pos_vw, neg_vw, dense, frozen, ids,
                    reg, rng, extra_vw=None):
        """`loss` over pre-gathered row views: user_vw/pos_vw/neg_vw map
        table names to [B, width] (scalars to [B]) slices of the packed
        rows; `dense` maps dense param names to values; `frozen` is the
        whole frozen pytree and `ids=(users, pos, neg)` lets the model
        gather from it.  When the spec declares ``extra_items``, `extra_vw`
        maps item-table names to [B, E, width] (scalars to [B, E]) views of
        the extra gathered rows.  When the spec declares
        ``frozen_item_tables`` AND the engine packed them (single-device
        fused path), a `frozen_vw` kwarg additionally carries
        {"pos": {name: [B, w]}, "neg": ..., "extra": {name: [B, E, w]}}
        views of the frozen columns — the model must fall back to gathering
        from `frozen` when it is None.  Must mirror `loss` semantics
        exactly."""
        raise NotImplementedError

    def packed_extra_item_ids(self, frozen, ids):
        """[B, extra_items] int32 item ids the loss reads beyond pos/neg
        (only called when packed_spec().extra_items > 0).  Padded slots must
        point at valid rows whose gradient contribution is exactly zero
        (e.g. masked out of a softmax), and should point at rows ALREADY in
        the step's dedupe (e.g. the element's own pos id) — a fixed filler
        row would be "touched" every step and collect per-step LazyAdam
        momentum-tail updates no other idle row gets."""
        raise NotImplementedError

    def precompute_eval(self, params, frozen):
        """Optional once-per-evaluation precomputation (e.g. encode all items
        once — the fix for the reference's O(U x I) encoder re-execution,
        AttentiveFashion.py:338-367).  Returned value is passed to
        predict_user_block as `ctx`."""
        return None

    def predict_all(self, params, frozen):
        raise NotImplementedError

    def predict_user_block(self, params, frozen, user_ids, ctx=None):
        """Default: slice users out of the model's full-matrix formula.

        Models with factored score structure override this to compute only the
        requested rows (every built-in model does)."""
        del ctx
        return jnp.take(self.predict_all(params, frozen), user_ids, axis=0)
