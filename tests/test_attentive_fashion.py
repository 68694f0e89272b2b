"""AttentiveFashion: attention semantics, cached-eval consistency, training."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.eval.evaluator import Evaluator
from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion
from fashionvisualexpl_tpu.train.trainer import fit


def _make(U=12, I=16, K=8, img=12, seed=0):
    rng = np.random.default_rng(seed)
    color = synthetic_features(I, 10, seed=seed)
    edges = rng.random((I, img, img, 1)).astype(np.float32)
    cls = np.eye(5, dtype=np.float32)[rng.integers(0, 5, I)]
    model = AttentiveFashion(
        U, I, color, edges, cls, embed_k=K,
        attention_layers=(6, 1), encoder_hidden=16, item_block=7,
    )
    return model


def test_attention_sums_to_one():
    model = _make()
    params, frozen = model.init(jax.random.PRNGKey(0))
    e = model.encode_items(params, frozen)  # [I, 3, K]
    gamma_u = params["Gu"][:4]
    alpha = model._attention(params, gamma_u[:, None, :], e[None])
    s = np.asarray(alpha.sum(axis=-2))
    np.testing.assert_allclose(s, np.ones_like(s), rtol=1e-5)


def test_blocked_scoring_matches_pointwise():
    """predict_user_block (cached item encodings, blocked attention) must
    equal the direct pointwise score path."""
    model = _make()
    params, frozen = model.init(jax.random.PRNGKey(1))
    users = jnp.asarray([0, 5, 11])
    block = np.asarray(model.predict_user_block(params, frozen, users))
    assert block.shape == (3, model.num_items)
    for r, u in enumerate(np.asarray(users)):
        items = jnp.arange(model.num_items)
        uu = jnp.full((model.num_items,), u)
        pointwise = np.asarray(model.score(params, frozen, uu, items))
        np.testing.assert_allclose(block[r], pointwise, rtol=1e-4, atol=1e-5)


def test_attention_weights_shape_and_simplex():
    model = _make()
    params, frozen = model.init(jax.random.PRNGKey(2))
    att = np.asarray(
        model.attention_weights(params, frozen, jnp.asarray([0, 1]))
    )
    assert att.shape == (2, model.num_items, 3)
    np.testing.assert_allclose(att.sum(-1), np.ones((2, model.num_items)),
                               rtol=1e-5)


def test_dropout_only_with_rng():
    model = _make()
    params, frozen = model.init(jax.random.PRNGKey(3))
    u = jnp.asarray([0, 1]); p = jnp.asarray([2, 3]); n = jnp.asarray([4, 5])
    l_det1 = float(model.loss(params, frozen, u, p, n, 0.0))
    l_det2 = float(model.loss(params, frozen, u, p, n, 0.0))
    assert l_det1 == l_det2
    l_rng1 = float(model.loss(params, frozen, u, p, n, 0.0,
                              rng=jax.random.PRNGKey(0)))
    l_rng2 = float(model.loss(params, frozen, u, p, n, 0.0,
                              rng=jax.random.PRNGKey(1)))
    assert l_rng1 != l_rng2  # different dropout masks


def test_trains_end_to_end_with_eval_and_attention_dump(tmp_path):
    data = synthetic_interactions(20, 16, interactions_per_user=6, seed=4)
    model = _make(U=data.num_users, I=data.num_items, seed=5)
    cfg = TrainConfig(batch_size=16, epochs=5, lr=0.01, reg=0.0001, top_k=5,
                      eval_every=5)
    ev = Evaluator(model, data, k=5, user_block=8)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    assert np.isfinite(results[5]["auc_t"])

    path = str(tmp_path / "att_recs.tsv")
    ev.store_recommendation_attention(
        state.params, frozen, path,
        attention_fn=lambda p, f, ids, ctx: model.attention_weights(p, f, ids, ctx),
    )
    lines = open(path).read().strip().split("\n")
    assert len(lines) == data.num_users * 5
    first = lines[0].split("\t")
    assert len(first) == 6  # user, item, score, alpha_color, alpha_edges, alpha_class
    alphas = np.array([float(x) for x in first[3:]])
    np.testing.assert_allclose(alphas.sum(), 1.0, rtol=1e-4)
