"""Checkpoint save/restore roundtrip — including resume-equivalence: a run
interrupted and restored must produce the same params as an uninterrupted one
(the capability the reference's dead --restore_epochs flag never delivered)."""

import jax
import numpy as np
import pytest

from fashionvisualexpl_tpu.core.checkpoint import CheckpointManager
from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.train.trainer import Trainer


def _setup():
    data = synthetic_interactions(20, 30, interactions_per_user=6, seed=0)
    cfg = TrainConfig(batch_size=16, epochs=1, lr=0.01)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    return Trainer(model, data, cfg)


def test_roundtrip_and_resume_equivalence(tmp_path):
    trainer = _setup()
    key = jax.random.PRNGKey(7)

    # uninterrupted: 4 epochs
    state, frozen = trainer.init_state()
    for e in range(4):
        state, _ = trainer.run_epoch(state, frozen, jax.random.fold_in(key, e))
    full_run = jax.tree_util.tree_map(np.asarray, state.params)

    # interrupted: 2 epochs -> save -> restore -> 2 more epochs
    state2, frozen = trainer.init_state()
    for e in range(2):
        state2, _ = trainer.run_epoch(state2, frozen, jax.random.fold_in(key, e))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(2, state2)

    template, _ = trainer.init_state()
    restored = mgr.restore(template)
    assert int(restored.step) == int(state2.step)
    for e in range(2, 4):
        restored, _ = trainer.run_epoch(
            restored, frozen, jax.random.fold_in(key, e)
        )
    resumed = jax.tree_util.tree_map(np.asarray, restored.params)

    for k in full_run:
        np.testing.assert_allclose(resumed[k], full_run[k], rtol=1e-6,
                                   atol=1e-7)

    # best-params store/restore
    mgr.save_best(state2.params)
    best = mgr.restore_best(template.params)
    for k in best:
        np.testing.assert_allclose(
            np.asarray(best[k]), np.asarray(state2.params[k])
        )
    mgr.close()


@pytest.mark.parametrize("moment_dtype", ["float32", "bfloat16", "float8"])
def test_packed_roundtrip_and_resume_equivalence(tmp_path, moment_dtype):
    """Resume-equivalence for the DEFAULT fast training configuration:
    train_path='packed' with lazy_catchup=True (the CLI default) and both
    moment dtypes.  The packed state's Orbax round-trip must preserve the
    fused tau column (LazyAdam row ages) and the bit-packed bf16 m/v
    halves EXACTLY — interrupted + restored must match uninterrupted
    bit-for-bit, not just to tolerance."""
    data = synthetic_interactions(20, 30, interactions_per_user=6, seed=0)
    cfg = TrainConfig(
        batch_size=16, epochs=1, lr=0.01, train_path="packed",
        lazy_catchup=True, moment_dtype=moment_dtype,
    )
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    trainer = Trainer(model, data, cfg)
    key = jax.random.PRNGKey(7)

    # uninterrupted: 4 epochs
    state, frozen = trainer.init_state()
    for e in range(4):
        state, _ = trainer.run_epoch(state, frozen, jax.random.fold_in(key, e))
    full_inner = jax.tree_util.tree_map(np.asarray, state.inner)

    # interrupted: 2 epochs -> save -> restore -> 2 more epochs
    state2, frozen = trainer.init_state()
    for e in range(2):
        state2, _ = trainer.run_epoch(
            state2, frozen, jax.random.fold_in(key, e)
        )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(2, state2)
    saved_inner = jax.tree_util.tree_map(np.asarray, state2.inner)

    template, _ = trainer.init_state()
    restored = mgr.restore(template)
    assert int(restored.step) == int(state2.step)
    # the restore itself must be exact (incl. tau ages / bf16 halves)
    for a, b in zip(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, restored.inner)
        ),
        jax.tree_util.tree_leaves(saved_inner),
    ):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)

    for e in range(2, 4):
        restored, _ = trainer.run_epoch(
            restored, frozen, jax.random.fold_in(key, e)
        )
    resumed_inner = jax.tree_util.tree_map(np.asarray, restored.inner)
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed_inner),
        jax.tree_util.tree_leaves(full_inner),
    ):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)

    # unpacked-params view of the resumed state matches too
    full_params = jax.tree_util.tree_map(np.asarray, state.params)
    for k, v in restored.params.items():
        np.testing.assert_array_equal(np.asarray(v), full_params[k])
    mgr.close()
