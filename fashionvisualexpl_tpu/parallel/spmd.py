"""SPMD training engine: row-sharded embedding tables over a device mesh.

The reference is single-device; its embedding state is whole `tf.Variable`s
(src/recommender/models/BPRMF.py:48-50) and lookups are local
`tf.nn.embedding_lookup` calls (BPRMF.py:70-72).  Here tables are row-sharded
over the mesh's `model` axis and the triplet batch is sharded over `data`:

- **Lookup** (collective_take): each model-shard gathers the rows of the
  *global* id batch it owns (masked local gather) and a `psum` over `model`
  assembles full embeddings, replicated across the model axis.  XLA lowers
  the psum onto ICI.  Backward through this is automatically the right thing:
  the cotangent scatter-adds into the owned rows only.
- **Gradients**: `psum` over `data` (classic DP all-reduce).  Whole-matrix
  regularization terms are pre-scaled by 1/|data| in the model loss
  (models/base.py global_reg_scale) so the reduction counts them once.
- **Update**: applied OUTSIDE shard_map under jit — Adam is elementwise, so
  XLA keeps every table update local to the shard that owns the rows; no
  resharding traffic.

Tables whose row count doesn't divide the model-axis size are padded with
zero rows (pad ids can never be sampled, so padded rows stay zero except for
Adam's decay of zero moments — a no-op).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from fashionvisualexpl_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from fashionvisualexpl_tpu.core.train_state import TrainState, apply_gradients
from fashionvisualexpl_tpu.models.base import RecommenderModel, default_take


def collective_take(row_sharded: Tuple[str, ...], axis_name: str = MODEL_AXIS):
    """Build a `take` implementation for use inside shard_map.

    For row-sharded tables: masked local gather + psum over the model axis.
    For replicated tables: plain gather.
    """

    def take(name: str, arr: jax.Array, ids: jax.Array) -> jax.Array:
        if name not in row_sharded:
            return jnp.take(arr, ids, axis=0)
        shard = jax.lax.axis_index(axis_name)
        rows = arr.shape[0]  # local shard rows (static)
        local = ids - shard * rows
        ok = jnp.logical_and(local >= 0, local < rows)
        vals = jnp.take(arr, jnp.where(ok, local, 0), axis=0)
        # mask broadcasts over ALL trailing table dims (image tables are
        # 4-D: [rows, H, W, C] — ok[..., None] would align with the wrong
        # axes there)
        mask = ok.reshape(ok.shape + (1,) * (vals.ndim - ok.ndim))
        vals = jnp.where(mask, vals, 0.0)
        return jax.lax.psum(vals, axis_name)

    return take


def pad_rows_to_multiple(arr: np.ndarray, multiple: int) -> np.ndarray:
    rows = arr.shape[0]
    padded = -(-rows // multiple) * multiple
    if padded == rows:
        return arr
    pad_width = [(0, padded - rows)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width)


def param_spec_tree(model: RecommenderModel, tree: Dict[str, Any]):
    """PartitionSpec pytree for a params/frozen dict: row-sharded tables get
    P('model', ...), everything else replicated."""
    sharded = set(model.row_sharded_params())

    def spec_for(name, leaf):
        if name in sharded:
            return P(MODEL_AXIS, *([None] * (leaf.ndim - 1)))
        return P(*([None] * leaf.ndim))

    def replicated(node):
        # nested subtrees (attention/encoder towers) are always replicated —
        # row sharding applies only to top-level named tables
        if isinstance(node, dict):
            return {k: replicated(v) for k, v in node.items()}
        return P(*([None] * node.ndim))

    return {
        k: replicated(v) if isinstance(v, dict) else spec_for(k, v)
        for k, v in tree.items()
    }


def shard_params(model, params, frozen, mesh: Mesh):
    """Pad row-sharded tables to the model-axis multiple and place every leaf
    with its NamedSharding."""
    m = mesh.shape[MODEL_AXIS]
    sharded = set(model.row_sharded_params())

    def prep(tree):
        out = {}
        specs = param_spec_tree(model, tree)
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = jax.tree_util.tree_map(
                    lambda a, s: jax.device_put(
                        np.asarray(a), NamedSharding(mesh, s)
                    ),
                    v, specs[k],
                )
                continue
            arr = np.asarray(v)
            if k in sharded:
                arr = pad_rows_to_multiple(arr, m)
            out[k] = jax.device_put(arr, NamedSharding(mesh, specs[k]))
        return out

    return prep(params), prep(frozen)


def make_spmd_grad_fn(model: RecommenderModel, mesh: Mesh, reg: float):
    """Build the shard_mapped (loss, grads) function.

    Inputs: params/frozen sharded per param_spec_tree, batch arrays sharded
    over `data`.  Outputs: psum'd scalar loss (replicated) and grads with the
    same shardings as params.
    """
    take = collective_take(tuple(model.row_sharded_params()))
    d = mesh.shape[DATA_AXIS]

    def local_loss(params, frozen, users, pos, neg):
        old_take, old_scale = model.take, model.global_reg_scale
        model.take = take
        model.global_reg_scale = 1.0 / d
        try:
            return model.loss(params, frozen, users, pos, neg, reg)
        finally:
            model.take, model.global_reg_scale = old_take, old_scale

    def grad_step(params, frozen, users, pos, neg):
        loss, grads = jax.value_and_grad(local_loss)(
            params, frozen, users, pos, neg
        )
        loss = jax.lax.psum(loss, DATA_AXIS)
        grads = jax.lax.psum(grads, DATA_AXIS)
        return loss, grads

    # specs are bound lazily at first call (need leaf ndims)
    def wrapped(params, frozen, users, pos, neg):
        pspecs = param_spec_tree(model, params)
        fspecs = param_spec_tree(model, frozen)
        batch_spec = P(DATA_AXIS)
        fn = shard_map(
            grad_step,
            mesh=mesh,
            in_specs=(pspecs, fspecs, batch_spec, batch_spec, batch_spec),
            out_specs=(P(), pspecs),
            check_vma=False,
        )
        return fn(params, frozen, users, pos, neg)

    return wrapped


def make_spmd_train_step(
    model: RecommenderModel, mesh: Mesh, tx, reg: float
) -> Callable:
    """Jitted full train step: shard_mapped loss/grads + elementwise update."""
    grad_fn = make_spmd_grad_fn(model, mesh, reg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, frozen, users, pos, neg):
        loss, grads = grad_fn(state.params, frozen, users, pos, neg)
        new_state = apply_gradients(state, grads, tx)
        return new_state, loss

    return step


def make_spmd_epoch_fn(
    model: RecommenderModel,
    mesh: Mesh,
    tx,
    reg: float,
    num_items: int,
    steps: int,
    batch: int,
    sampling="user_perm",
) -> Callable:
    """Full epoch as ONE jitted program over the mesh: on-device sampling,
    then a lax.scan of shard_mapped train steps — the multi-chip analogue of
    train/trainer.py's epoch function.

    Sampler tables stay replicated (they are id metadata, small relative to
    the embedding tables); batches are resharded over `data` per step by
    XLA.  Call with params/frozen placed by shard_params().
    """
    from fashionvisualexpl_tpu.data.sampler import sample_triplets

    grad_fn = make_spmd_grad_fn(model, mesh, reg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: TrainState, frozen, key,
              train_pairs, padded_pos, pos_counts):
        # same key discipline as the single-device epoch (trainer.py):
        # identical keys must produce identical batches on any mesh
        sample_key, _step_key = jax.random.split(key)
        users, pos, neg = sample_triplets(
            sample_key, train_pairs, padded_pos, pos_counts,
            num_items, steps, batch, with_replacement=sampling,
        )

        def body(st, sb):
            u, p, n = sb
            loss, grads = grad_fn(st.params, frozen, u, p, n)
            return apply_gradients(st, grads, tx), loss

        state, losses = jax.lax.scan(body, state, (users, pos, neg))
        return state, jnp.sum(losses)

    return epoch
