"""Streamed-feature trainer: host-prefetched batches must train
AttentiveFashion equivalently to the resident path (same loss math)."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.eval.evaluator import Evaluator
from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion
from fashionvisualexpl_tpu.train.streamed import ArrayFeatureStore, fit_streamed


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    data = synthetic_interactions(15, 12, interactions_per_user=5, seed=seed)
    I = data.num_items
    color = synthetic_features(I, 8, seed=seed)
    edges = rng.random((I, 8, 8, 1)).astype(np.float32)
    cls = np.eye(4, dtype=np.float32)[rng.integers(0, 4, I)]
    model = AttentiveFashion(
        data.num_users, I, color, edges, cls, embed_k=6,
        attention_layers=(4, 1), encoder_hidden=8, item_block=5,
    )
    return data, model, color, edges, cls


def test_loss_streamed_matches_resident():
    data, model, color, edges, cls = _setup()
    params, frozen = model.init(jax.random.PRNGKey(0))
    u = jnp.asarray([0, 3]); p = jnp.asarray([1, 5]); n = jnp.asarray([2, 7])
    resident = float(model.loss(params, frozen, u, p, n, 0.01))
    store = ArrayFeatureStore(color, edges, cls)
    feats = {k: jnp.asarray(v) for k, v in
             store.gather(np.asarray(p), np.asarray(n)).items()}
    streamed = float(model.loss_streamed(params, u, p, n, feats, 0.01))
    np.testing.assert_allclose(streamed, resident, rtol=1e-5)


def test_fit_streamed_end_to_end():
    data, model, color, edges, cls = _setup(seed=1)
    store = ArrayFeatureStore(color, edges, cls)
    cfg = TrainConfig(batch_size=8, epochs=3, lr=0.01, reg=0.0001,
                      top_k=4, eval_every=3)
    ev = Evaluator(model, data, k=4, user_block=8)
    state, frozen, results = fit_streamed(model, data, cfg, store,
                                          evaluator=ev)
    assert np.isfinite(results[3]["auc_t"])
