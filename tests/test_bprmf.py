"""BPRMF: loss parity with the reference formula and end-to-end learning."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.eval.evaluator import Evaluator
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.train.trainer import Trainer, fit
from tests.reference_oracle import bprmf_loss_oracle


def test_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    U, I, K, B = 10, 15, 4, 8
    model = BPRMF(U, I, embed_k=K)
    params, frozen = model.init(jax.random.PRNGKey(0))
    params = {
        "Bi": jnp.asarray(rng.normal(size=I).astype(np.float32)),
        "Gu": jnp.asarray(rng.normal(size=(U, K)).astype(np.float32)),
        "Gi": jnp.asarray(rng.normal(size=(I, K)).astype(np.float32)),
    }
    users = rng.integers(0, U, B)
    pos = rng.integers(0, I, B)
    neg = rng.integers(0, I, B)
    for reg in (0.0, 0.01, 0.1):
        got = float(
            model.loss(
                params, frozen,
                jnp.asarray(users), jnp.asarray(pos), jnp.asarray(neg), reg,
            )
        )
        want = bprmf_loss_oracle(
            np.asarray(params["Bi"]), np.asarray(params["Gu"]),
            np.asarray(params["Gi"]), users, pos, neg, reg,
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_predict_all_matches_score():
    model = BPRMF(7, 9, embed_k=3)
    params, frozen = model.init(jax.random.PRNGKey(1))
    full = model.predict_all(params, frozen)
    users = jnp.asarray([0, 3, 6])
    items = jnp.asarray([2, 5, 8])
    pointwise = model.score(params, frozen, users, items)
    np.testing.assert_allclose(
        np.asarray(pointwise),
        np.asarray(full)[np.asarray(users), np.asarray(items)],
        rtol=1e-5,
    )
    block = model.predict_user_block(params, frozen, users)
    np.testing.assert_allclose(
        np.asarray(block), np.asarray(full)[np.asarray(users)], rtol=1e-6
    )


def test_training_beats_random_ranking():
    """End-to-end: BPRMF on planted low-rank data must clearly beat random
    (SURVEY.md §4 integration criterion)."""
    data = synthetic_interactions(60, 80, interactions_per_user=12, seed=0)
    cfg = TrainConfig(
        batch_size=64, epochs=50, lr=0.02, reg=0.0, top_k=10, eval_every=50
    )
    model = BPRMF(data.num_users, data.num_items, embed_k=16)
    evaluator = Evaluator(model, data, k=cfg.top_k, user_block=64)

    params0, frozen = model.init(jax.random.PRNGKey(0))
    before = evaluator.evaluate(params0, frozen)

    state, frozen, results, extra = fit(model, data, cfg, evaluator=evaluator)
    after = results[max(results)]

    assert after["auc_t"] > 0.70, after
    assert after["auc_t"] > before["auc_t"] + 0.15
    assert after["hr_t"] > before["hr_t"]


def test_epoch_fn_is_deterministic():
    data = synthetic_interactions(20, 30, interactions_per_user=6, seed=5)
    cfg = TrainConfig(batch_size=16, epochs=1, lr=0.01)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    trainer = Trainer(model, data, cfg)
    state, frozen = trainer.init_state()
    s1, l1 = trainer.run_epoch(state, frozen, jax.random.PRNGKey(42))
    state2, _ = trainer.init_state()
    s2, l2 = trainer.run_epoch(state2, frozen, jax.random.PRNGKey(42))
    np.testing.assert_allclose(float(l1), float(l2))
    np.testing.assert_allclose(
        np.asarray(s1.params["Gu"]), np.asarray(s2.params["Gu"])
    )
