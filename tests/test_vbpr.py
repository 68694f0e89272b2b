"""VBPR: predict_all parity with the reference formula; BPRMF equivalence when
visual weights are zeroed (SURVEY.md §4 integration criterion); learning."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.eval.evaluator import Evaluator
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.models.vbpr import VBPR
from fashionvisualexpl_tpu.train.trainer import fit
from tests.reference_oracle import vbpr_predict_all_oracle


def _random_params(rng, U, I, K, D, F_dim):
    return {
        "Bi": jnp.asarray(rng.normal(size=I).astype(np.float32)),
        "Gu": jnp.asarray(rng.normal(size=(U, K)).astype(np.float32)),
        "Gi": jnp.asarray(rng.normal(size=(I, K)).astype(np.float32)),
        "Tu": jnp.asarray(rng.normal(size=(U, D)).astype(np.float32)),
        "E": jnp.asarray(rng.normal(size=(F_dim, D)).astype(np.float32)),
        "Bp": jnp.asarray(rng.normal(size=(F_dim, 1)).astype(np.float32)),
    }


def test_predict_all_matches_reference_formula():
    rng = np.random.default_rng(0)
    U, I, K, D, Fd = 8, 12, 4, 3, 6
    feats = synthetic_features(I, Fd, seed=1)
    model = VBPR(U, I, feats, embed_k=K, embed_d=D)
    params = _random_params(rng, U, I, K, D, Fd)
    frozen = {"F": jnp.asarray(feats)}

    got = np.asarray(model.predict_all(params, frozen))
    want = vbpr_predict_all_oracle(
        *(np.asarray(params[k]) for k in ("Bi", "Gu", "Gi", "Tu")),
        feats,
        np.asarray(params["E"]),
        np.asarray(params["Bp"]),
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # pointwise and user-block paths agree with the full matrix
    users = jnp.asarray([0, 3, 7])
    items = jnp.asarray([1, 5, 11])
    np.testing.assert_allclose(
        np.asarray(model.score(params, frozen, users, items)),
        got[np.asarray(users), np.asarray(items)],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(model.predict_user_block(params, frozen, users)),
        got[np.asarray(users)],
        rtol=1e-5, atol=1e-6,
    )


def test_zero_visual_weights_reduce_to_bprmf():
    rng = np.random.default_rng(3)
    U, I, K, D, Fd = 9, 14, 5, 3, 7
    feats = synthetic_features(I, Fd, seed=2)
    vbpr = VBPR(U, I, feats, embed_k=K, embed_d=D)
    bprmf = BPRMF(U, I, embed_k=K)
    shared = {
        "Bi": jnp.asarray(rng.normal(size=I).astype(np.float32)),
        "Gu": jnp.asarray(rng.normal(size=(U, K)).astype(np.float32)),
        "Gi": jnp.asarray(rng.normal(size=(I, K)).astype(np.float32)),
    }
    vparams = dict(
        shared,
        Tu=jnp.zeros((U, D)), E=jnp.zeros((Fd, D)), Bp=jnp.zeros((Fd, 1)),
    )
    frozen = {"F": jnp.asarray(feats)}
    np.testing.assert_allclose(
        np.asarray(vbpr.predict_all(vparams, frozen)),
        np.asarray(bprmf.predict_all(shared, {})),
        rtol=1e-6,
    )
    # losses agree too when visual params are zero and reg=0
    users = jnp.asarray([0, 2, 5])
    pos = jnp.asarray([1, 3, 6])
    neg = jnp.asarray([7, 8, 9])
    np.testing.assert_allclose(
        float(vbpr.loss(vparams, frozen, users, pos, neg, 0.0)),
        float(bprmf.loss(shared, {}, users, pos, neg, 0.0)),
        rtol=1e-6,
    )


def test_vbpr_trains_end_to_end():
    data = synthetic_interactions(40, 60, interactions_per_user=10, seed=4)
    feats = synthetic_features(data.num_items, 16, seed=5)
    model = VBPR(data.num_users, data.num_items, feats, embed_k=16, embed_d=4)
    cfg = TrainConfig(batch_size=64, epochs=50, lr=0.02, reg=0.0, top_k=10,
                      eval_every=50)
    evaluator = Evaluator(model, data, k=cfg.top_k, user_block=64)
    params0, frozen0 = model.init(jax.random.PRNGKey(cfg.seed))
    before = evaluator.evaluate(params0, frozen0)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=evaluator)
    after = results[50]
    assert after["auc_t"] > 0.6, (before, after)
    assert after["auc_t"] > before["auc_t"] + 0.1, (before, after)
