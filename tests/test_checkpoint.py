"""Checkpoint save/restore roundtrip — including resume-equivalence: a run
interrupted and restored must produce the same params as an uninterrupted one
(the capability the reference's dead --restore_epochs flag never delivered)."""

import jax
import numpy as np

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
