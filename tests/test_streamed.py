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
    state, frozen, results, extra = fit_streamed(model, data, cfg, store,
                                                 evaluator=ev)
    assert np.isfinite(results[3]["auc_t"])
    assert extra["best_epoch"] == 3
    assert len(extra["history"]) == 3


def test_host_features_eval_matches_resident():
    """host_features=True (empty frozen, host-streamed eval encoding) must
    produce the same eval scores as the device-resident model."""
    import jax

    data, model, color, edges, cls = _setup(seed=2)
    host_model = AttentiveFashion(
        data.num_users, data.num_items, color, edges, cls, embed_k=6,
        attention_layers=(4, 1), encoder_hidden=8, item_block=5,
        host_features=True,
    )
    params, frozen = model.init(jax.random.PRNGKey(7))
    h_params, h_frozen = host_model.init(jax.random.PRNGKey(7))
    assert h_frozen == {}
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, params, h_params
    )
    resident = np.asarray(model.predict_all(params, frozen))
    streamed = np.asarray(host_model.predict_all(h_params, h_frozen))
    np.testing.assert_allclose(streamed, resident, rtol=2e-5, atol=2e-5)


def test_fit_streamed_host_features_memmap(tmp_path):
    """End-to-end streamed fit with memmap-backed features and an empty
    frozen pytree — the >HBM catalog configuration the CLI --streamed flag
    drives."""
    data, _, color, edges, cls = _setup(seed=3)
    paths = {}
    for name, arr in (("color", color), ("edges", edges), ("cls", cls)):
        p = tmp_path / f"{name}.npy"
        np.save(p, arr)
        paths[name] = str(p)
    store = ArrayFeatureStore.from_memmap(
        paths["color"], paths["edges"], paths["cls"]
    )
    model = AttentiveFashion(
        data.num_users, data.num_items,
        store.color, store.edges, store.cls,
        embed_k=6, attention_layers=(4, 1), encoder_hidden=8, item_block=5,
        host_features=True,
    )
    cfg = TrainConfig(batch_size=8, epochs=2, lr=0.01, reg=0.0001,
                      top_k=4, eval_every=2)
    ev = Evaluator(model, data, k=4, user_block=8)
    state, frozen, results, extra = fit_streamed(model, data, cfg, store,
                                                 evaluator=ev)
    assert frozen == {}
    assert np.isfinite(results[2]["auc_t"])
