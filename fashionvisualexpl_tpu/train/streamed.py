"""Streamed-feature trainer for catalogs whose modality tensors exceed HBM.

The resident trainer (train/trainer.py) holds every modality tensor on
device and runs whole epochs as one XLA program.  When edge-image stacks at
catalog scale don't fit (I x 224 x 224 images are ~200KB/item), this
trainer keeps features on host (arrays or np.memmap), samples triplet ids
on device, and streams per-batch feature gathers through a double-buffered
host prefetcher into a jitted per-step function — the role tf.data's
py_function + AUTOTUNE prefetch plays in the reference
(src/dataset/dataset.py:124-139), without the per-sample Python boundary.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

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
from fashionvisualexpl_tpu.data.pipeline import HostPrefetcher
from fashionvisualexpl_tpu.data.sampler import sample_triplets


class ArrayFeatureStore:
    """Per-item modality store backed by host arrays / np.memmap files.

    gather(pos_ids, neg_ids) -> the feats dict loss_streamed expects.
    Row copies go through the native threaded gather when available
    (native/fvx_native.cpp::fvx_gather_rows — numpy fancy indexing copies
    on ONE thread, ~1.1GB/s on this host; threads scale it by core count
    and parallelize memmap page faults); falls back to `src[ids]`."""

    def __init__(self, color: np.ndarray, edges: np.ndarray, cls: np.ndarray):
        self.color, self.edges, self.cls = color, edges, cls
        from fashionvisualexpl_tpu.data.native import load_library
        self._native = load_library() is not None

    @classmethod
    def from_memmap(cls, color_path, edges_path, cls_path):
        return cls(
            np.load(color_path, mmap_mode="r"),
            np.load(edges_path, mmap_mode="r"),
            np.load(cls_path, mmap_mode="r"),
        )

    def _take(self, src: np.ndarray, ids: np.ndarray) -> np.ndarray:
        if self._native and src.dtype == np.float32:
            from fashionvisualexpl_tpu.data.native import gather_rows_native

            out = gather_rows_native(src, ids)
            if out is not None:
                return out
        return np.asarray(src[ids], np.float32)

    def gather(self, pos: np.ndarray, neg: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            "col_pos": self._take(self.color, pos),
            "img_pos": self._take(self.edges, pos),
            "cls_pos": self._take(self.cls, pos),
            "col_neg": self._take(self.color, neg),
            "img_neg": self._take(self.edges, neg),
            "cls_neg": self._take(self.cls, neg),
        }


def fit_streamed(
    model,
    data: Interactions,
    cfg: TrainConfig,
    store: ArrayFeatureStore,
    evaluator=None,
    prefetch_depth: int = 2,
    log: Optional[Callable[[Dict], None]] = None,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
):
    """Training loop with host-streamed modality features — the same
    surface as train/trainer.py::fit (evaluation cadence, best-model
    tracking, JSONL logging, checkpoint/resume), returning
    (state, frozen, results, extra).

    Requires the model to implement loss_streamed(params, users, pos, neg,
    feats, reg, rng) (AttentiveFashion does).  Eval still uses the
    evaluator's path (items encoded once per evaluation; in
    host_features mode the model streams eval blocks from host too)."""
    tx = tf_parity_adam(cfg.lr)
    params, frozen = model.init(jax.random.PRNGKey(cfg.seed))
    state = create_train_state(params, tx)
    steps = data.steps_per_epoch(cfg.batch_size)

    # derived-pairs mode when eligible, like the Trainer (data/sampler.py):
    # the streamed regime exists precisely because features outgrow HBM,
    # so not shipping the [N, 2] pair table matters most here
    from fashionvisualexpl_tpu.data.sampler import derived_pairs_ok

    train_pairs = (
        None if derived_pairs_ok(data.train_pairs, data.padded_pos)
        else jnp.asarray(data.train_pairs)
    )
    padded_pos = jnp.asarray(data.padded_pos)
    pos_counts = jnp.asarray(data.pos_counts)

    @jax.jit
    def train_step(state, users, pos, neg, feats, rng):
        def loss_fn(p):
            return model.loss_streamed(p, users, pos, neg, feats, cfg.reg,
                                       rng=rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_gradients(state, grads, tx), loss

    ckpt = None
    start_epoch = 1
    if ckpt_dir is not None:
        from fashionvisualexpl_tpu.core.checkpoint import CheckpointManager

        ckpt = CheckpointManager(ckpt_dir)
        if resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            start_epoch = int(ckpt.latest_step()) + 1

    results: Dict[int, Dict[str, float]] = {}
    history = []
    best_params = jax.tree_util.tree_map(jnp.copy, state.params)
    best_epoch = 0
    best_value = -float("inf")
    metric_key = cfg.best_metric + "_v"

    key = jax.random.PRNGKey(cfg.seed + 1)
    for epoch in range(start_epoch, cfg.epochs + 1):
        ekey = jax.random.fold_in(key, epoch)
        users, pos, neg = sample_triplets(
            ekey, train_pairs, padded_pos, pos_counts,
            data.num_items, steps, cfg.batch_size,
        )
        users, pos, neg = map(np.asarray, (users, pos, neg))

        def batches():
            for s in range(steps):
                yield s

        def gather(s):
            return (
                users[s], pos[s], neg[s],
                store.gather(pos[s], neg[s]),
            )

        # a single device-side accumulator: appending every per-step loss
        # and jnp.stack-ing would dispatch an N-operand program, pin N
        # device scalars per epoch, and recompile whenever the step count
        # changes (advisor, round 4)
        total_dev = jnp.float32(0.0)
        n_steps = 0
        t0 = time.time()
        for s, (u, p, n, feats) in HostPrefetcher(
            batches(), gather, depth=prefetch_depth
        ):
            step_rng = jax.random.fold_in(ekey, 1000 + s)
            state, loss = train_step(
                state, jnp.asarray(u), jnp.asarray(p), jnp.asarray(n),
                {k: jnp.asarray(v) for k, v in feats.items()}, step_rng,
            )
            # keep the loss ON DEVICE: a float() here would sync every
            # step (one ~29ms tunnel RTT each on remote-TPU hosts) and
            # stall the prefetch pipeline — fetch ONCE per epoch below
            total_dev = total_dev + loss
            n_steps += 1
        total = float(total_dev) if n_steps else 0.0
        train_time = time.time() - t0

        eval_time = 0.0
        metrics = None
        if evaluator is not None and epoch % cfg.eval_every == 0:
            t1 = time.time()
            metrics = evaluator.evaluate(state.params, frozen)
            eval_time = time.time() - t1
            results[epoch] = metrics
            if hasattr(evaluator, "print_epoch"):
                from fashionvisualexpl_tpu.train.trainer import EpochResult

                evaluator.print_epoch(
                    epoch, cfg.epochs, total / max(steps, 1),
                    EpochResult(epoch=epoch, loss=total,
                                train_time_s=train_time,
                                eval_time_s=eval_time, metrics=metrics),
                )
            if metrics.get(metric_key, -float("inf")) >= best_value:
                best_value = metrics[metric_key]
                best_epoch = epoch
                best_params = jax.tree_util.tree_map(jnp.copy, state.params)
        history.append(
            {"epoch": epoch, "loss": total, "train_time_s": train_time,
             "eval_time_s": eval_time, "metrics": metrics}
        )
        if ckpt is not None and cfg.verbose > 0 and (
            epoch % cfg.verbose == 0 or epoch == 1
        ):
            ckpt.save(epoch, state)
        if log is not None:
            log({"epoch": epoch, "loss": total, "train_time_s": train_time,
                 "eval_time_s": eval_time, **(metrics or {})})

    if ckpt is not None:
        ckpt.save_best(best_params)
        ckpt.close()

    return state, frozen, results, {
        "history": history,
        "best_params": best_params,
        "best_epoch": best_epoch,
    }
