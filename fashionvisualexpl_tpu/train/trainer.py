"""Shared training engine.

One trainer for every model, replacing the copy-pasted in-class loops of the
reference (src/recommender/models/BPRMF.py:127-192, GradFashion.py:195-267,
AttentiveFashion.py:258-331).  TPU-first structure:

- negative sampling, batching, and the full epoch of optimizer steps run as a
  SINGLE jitted program per epoch (`lax.scan` over step batches) — the
  reference re-dispatches eager ops from Python per 256-triple batch;
- best-model tracking keeps a device-resident copy of the params pytree
  (the reference deepcopies the whole model object into host RAM,
  BPRMF.py:156);
- per-epoch evaluation via eval/evaluator.py; metric records are emitted both
  in the reference's printed format and as JSONL.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.core.train_state import (
    TrainState,
    apply_gradients,
    create_train_state,
    tf_parity_adam,
)
from fashionvisualexpl_tpu.data.interactions import Interactions
from fashionvisualexpl_tpu.data.sampler import sample_triplets
from fashionvisualexpl_tpu.models.base import RecommenderModel


@dataclass
class EpochResult:
    epoch: int
    loss: float
    train_time_s: float
    eval_time_s: float = 0.0
    metrics: Optional[Dict[str, float]] = None


class Trainer:
    def __init__(
        self,
        model: RecommenderModel,
        data: Interactions,
        cfg: TrainConfig,
        tx=None,
    ):
        self.model = model
        self.data = data
        self.cfg = cfg
        self.tx = tx if tx is not None else tf_parity_adam(cfg.lr)
        self.steps_per_epoch = data.steps_per_epoch(cfg.batch_size)
        if self.steps_per_epoch == 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} > {data.num_train} interactions"
            )

        # multi-device: shard tables over `model`, batch over `data`
        self.mesh = None
        if cfg.mesh.num_devices > 1:
            from fashionvisualexpl_tpu.core.mesh import make_mesh

            self.mesh = make_mesh(data=cfg.mesh.data, model=cfg.mesh.model)

        # device-resident sampler tables.  When the pair list is exactly
        # the row-major flattening of padded_pos (uniform counts, sorted
        # stored order), skip shipping it: the sampler re-derives pairs
        # from padded_pos bit-identically (data/sampler.py derived mode).
        # Strictly better when eligible — the [N, 2] table is the dominant
        # sampler footprint at the HBM capacity frontier AND its 2-wide row
        # gather is the sampler's slowest op (114 -> 21 ms/epoch at
        # 1M x 500k, SPEED.md r5).  Mesh paths too: every epoch fn samples
        # in plain jit outside shard_map with replicated sampler tables
        # (pinned in tests/test_fast_spmd.py).
        from fashionvisualexpl_tpu.data.sampler import derived_pairs_ok

        if derived_pairs_ok(data.train_pairs, data.padded_pos):
            self._train_pairs = None
        else:
            self._train_pairs = jnp.asarray(data.train_pairs)
        self._padded_pos = jnp.asarray(data.padded_pos)
        self._pos_counts = jnp.asarray(data.pos_counts)

        self._packed = None  # (pack_fn, unpack_fn) when the packed path is on
        self._fused_frozen = False  # set by _build_packed_epoch_fn
        if self.mesh is not None and cfg.train_path == "packed":
            from fashionvisualexpl_tpu.parallel.fast_spmd import (
                make_generic_packed_spmd_epoch_fn,
            )

            inner = make_generic_packed_spmd_epoch_fn(
                model, self.mesh, cfg.lr, cfg.reg, data.num_items,
                self.steps_per_epoch, cfg.batch_size,
                with_replacement=cfg.sampling_scheme,
                moment_dtype=getattr(cfg, "moment_dtype", "float32"),
                lazy_catchup=getattr(cfg, "lazy_catchup", False),
            )

            def packed_spmd_epoch(state, frozen, key, pairs, pos, cnt):
                new, loss = inner(state.inner, frozen, key, pairs, pos, cnt)
                return state.with_inner(new), loss

            self._epoch_fn = packed_spmd_epoch
        elif self.mesh is not None:
            from fashionvisualexpl_tpu.parallel.spmd import make_spmd_epoch_fn

            self._epoch_fn = make_spmd_epoch_fn(
                model, self.mesh, self.tx, cfg.reg, data.num_items,
                self.steps_per_epoch, cfg.batch_size,
                sampling=cfg.sampling_scheme,
            )
        elif cfg.train_path == "packed":
            self._epoch_fn = self._build_packed_epoch_fn()
        elif cfg.train_path != "generic":
            raise ValueError(f"unknown train_path {cfg.train_path!r}")
        else:
            self._epoch_fn = self._build_epoch_fn()

    def _build_epoch_fn(self) -> Callable:
        model, cfg = self.model, self.cfg
        steps, batch = self.steps_per_epoch, self.cfg.batch_size
        num_items = self.data.num_items
        tx = self.tx
        reg = cfg.reg

        def epoch_fn(state: TrainState, frozen, key,
                     train_pairs, padded_pos, pos_counts):
            sample_key, step_key = jax.random.split(key)
            users, pos, neg = sample_triplets(
                sample_key, train_pairs, padded_pos, pos_counts,
                num_items, steps, batch,
                with_replacement=cfg.sampling_scheme,
            )
            step_keys = jax.random.split(step_key, steps)

            def body(st, step_batch):
                u, p, n, k = step_batch

                def loss_fn(params):
                    return model.loss(params, frozen, u, p, n, reg, rng=k)

                loss, grads = jax.value_and_grad(loss_fn)(st.params)
                st = apply_gradients(st, grads, tx)
                return st, loss

            state, losses = jax.lax.scan(
                body, state, (users, pos, neg, step_keys)
            )
            return state, jnp.sum(losses)

        return jax.jit(epoch_fn, donate_argnums=(0,))

    def _build_packed_epoch_fn(self) -> Callable:
        """Packed-state + LazyAdam path (train/packed_generic.py) behind the
        same epoch-fn interface; state is a GenericPackedTrainState whose
        `.params` property materializes the standard dict for
        eval/checkpoint.  Works for any model implementing
        packed_spec/packed_loss (all six registered models: bprmf, vbpr,
        grad_fashion, comp_vbpr, attentive_fashion, acf)."""
        from fashionvisualexpl_tpu.train.packed_generic import (
            make_generic_packed_epoch_fn,
        )

        model, cfg = self.model, self.cfg
        steps, batch = self.steps_per_epoch, cfg.batch_size
        try:
            spec = model.packed_spec()
        except NotImplementedError as e:
            raise NotImplementedError(
                f"train_path='packed' requires packed_spec/packed_loss; "
                f"{model.name} does not implement them"
            ) from e
        # init_state packs the state WITH the frozen columns iff this is on
        self._fused_frozen = bool(cfg.fused_frozen and spec.frozen_item_tables)
        inner = make_generic_packed_epoch_fn(
            model, cfg.lr, cfg.reg, self.data.num_items, steps, batch,
            with_replacement=cfg.sampling_scheme,
            fused_frozen=self._fused_frozen,
            moment_dtype=getattr(cfg, "moment_dtype", "float32"),
            lazy_catchup=getattr(cfg, "lazy_catchup", False),
        )

        def epoch_fn(state, frozen, key, pairs, pos, cnt):
            new, loss = inner(state.inner, frozen, key, pairs, pos, cnt)
            return state.with_inner(new), loss

        return epoch_fn

    def init_state(self, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        params, frozen = self.model.init(rng)
        if self.mesh is not None and self.cfg.train_path == "packed":
            from fashionvisualexpl_tpu.parallel.fast_spmd import (
                shard_generic_packed_state,
            )
            from fashionvisualexpl_tpu.parallel.spmd import shard_params
            from fashionvisualexpl_tpu.train.packed_generic import (
                GenericPackedTrainState, pack_generic_state,
            )

            packed = pack_generic_state(
                self.model, params,
                moment_dtype=getattr(self.cfg, "moment_dtype", "float32"),
                row_align=getattr(self.cfg, "row_align", 1),
            )
            _, frozen = shard_params(self.model, params, frozen, self.mesh)
            return (
                GenericPackedTrainState(
                    shard_generic_packed_state(packed, self.mesh),
                    self.model.packed_spec(),
                    moment_dtype=getattr(self.cfg, "moment_dtype",
                                         "float32"),
                ),
                frozen,
            )
        if self.mesh is not None:
            from fashionvisualexpl_tpu.parallel.spmd import shard_params

            params, frozen = shard_params(self.model, params, frozen, self.mesh)
        elif self.cfg.train_path == "packed":
            from fashionvisualexpl_tpu.train.packed_generic import (
                GenericPackedTrainState, pack_generic_state,
            )

            return (
                GenericPackedTrainState(
                    pack_generic_state(
                        self.model, params,
                        frozen=frozen if self._fused_frozen else None,
                        moment_dtype=getattr(self.cfg, "moment_dtype",
                                             "float32"),
                        row_align=getattr(self.cfg, "row_align", 1),
                    ),
                    self.model.packed_spec(),
                    moment_dtype=getattr(self.cfg, "moment_dtype",
                                         "float32"),
                ),
                frozen,
            )
        return create_train_state(params, self.tx), frozen

    def run_epoch(
        self, state: TrainState, frozen, key: jax.Array
    ) -> Tuple[TrainState, jax.Array]:
        """Run one full epoch (sampling + all optimizer steps) on device."""
        return self._epoch_fn(
            state, frozen, key,
            self._train_pairs, self._padded_pos, self._pos_counts,
        )


def fit(
    model: RecommenderModel,
    data: Interactions,
    cfg: TrainConfig,
    evaluator=None,
    rng: Optional[jax.Array] = None,
    log: Optional[Callable[[Dict[str, Any]], None]] = None,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
) -> Tuple[TrainState, Any, Dict[int, Dict[str, float]], List[EpochResult]]:
    """Full training run with per-epoch eval and best-model tracking.

    Returns (final_state, frozen, results dict keyed by epoch with the
    reference's result-record schema (Evaluator.py:216-221), epoch log).
    Best-model selection follows the reference (BPRMF.py:150-156): argmax of
    the validation `best_metric`, ties resolved to the LATEST epoch (the
    reference uses `<=`).

    With `ckpt_dir`, the train state is checkpointed every `cfg.verbose`
    epochs (reference BPRMF.py:158-160 cadence) and the best params at the
    end; `resume=True` restores the latest checkpoint and continues — the
    capability the reference's --restore_epochs flag never implemented.
    """
    trainer = Trainer(model, data, cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    init_rng, epoch_rng = jax.random.split(rng)
    state, frozen = trainer.init_state(init_rng)

    ckpt = None
    start_epoch = 1
    if ckpt_dir is not None:
        from fashionvisualexpl_tpu.core.checkpoint import CheckpointManager

        ckpt = CheckpointManager(ckpt_dir)
        if resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            start_epoch = int(ckpt.latest_step()) + 1

    results: Dict[int, Dict[str, float]] = {}
    history: List[EpochResult] = []
    # must COPY: run_epoch donates the state, so aliasing state.params here
    # would return deleted buffers if no eval ever updates the best (e.g.
    # evaluator=None)
    best_params = jax.tree_util.tree_map(jnp.copy, state.params)
    best_epoch = 0
    best_value = -float("inf")
    metric_key = cfg.best_metric + "_v"

    for epoch in range(start_epoch, cfg.epochs + 1):
        t0 = time.time()
        key = jax.random.fold_in(epoch_rng, epoch)
        state, loss = trainer.run_epoch(state, frozen, key)
        loss = float(loss)
        train_time = time.time() - t0

        rec = EpochResult(epoch=epoch, loss=loss, train_time_s=train_time)
        if evaluator is not None and epoch % cfg.eval_every == 0:
            t1 = time.time()
            metrics = evaluator.evaluate(state.params, frozen)
            rec.eval_time_s = time.time() - t1
            rec.metrics = metrics
            results[epoch] = metrics
            evaluator.print_epoch(
                epoch, cfg.epochs, loss / trainer.steps_per_epoch, rec
            )
            if metrics.get(metric_key, -float("inf")) >= best_value:
                best_value = metrics[metric_key]
                best_epoch = epoch
                # device-resident copy: run_epoch donates the state, so
                # aliasing state.params here would hold dead buffers
                best_params = jax.tree_util.tree_map(
                    jnp.copy, state.params
                )
        history.append(rec)
        # reference cadence (BPRMF.py:158): every `verbose` epochs and epoch
        # 1; any verbose <= 0 disables (the reference only handles -1 and
        # would die on `it % 0`)
        if ckpt is not None and cfg.verbose > 0 and (
            epoch % cfg.verbose == 0 or epoch == 1
        ):
            ckpt.save(epoch, state)
        if log is not None:
            log(
                {
                    "epoch": epoch,
                    "loss": loss,
                    "train_time_s": train_time,
                    "eval_time_s": rec.eval_time_s,
                    **(rec.metrics or {}),
                }
            )

    if ckpt is not None:
        ckpt.save_best(best_params)
        ckpt.close()

    return state, frozen, results, {
        "history": history,
        "best_params": best_params,
        "best_epoch": best_epoch,
    }
