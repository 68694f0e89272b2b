"""GradFashion: scoring consistency, reg semantics, explanation engine."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.eval.evaluator import Evaluator
from fashionvisualexpl_tpu.explain.grads import explanation_table, join_reviews
from fashionvisualexpl_tpu.models.grad_fashion import GradFashion
from fashionvisualexpl_tpu.train.trainer import fit


def _model(U=10, I=14, seed=0):
    color = synthetic_features(I, 8, seed=seed)
    edges = synthetic_features(I, 6, seed=seed + 1)
    return GradFashion(
        U, I, color, edges, embed_k=4, embed_d=3, embed_color=5, embed_edges=4
    )


def test_predict_all_consistent_with_score():
    model = _model()
    params, frozen = model.init(jax.random.PRNGKey(0))
    full = np.asarray(model.predict_all(params, frozen))
    users = jnp.asarray([0, 4, 9])
    items = jnp.asarray([1, 7, 13])
    np.testing.assert_allclose(
        np.asarray(model.score(params, frozen, users, items)),
        full[np.asarray(users), np.asarray(items)],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model.predict_user_block(params, frozen, users)),
        full[np.asarray(users)], rtol=1e-5, atol=1e-6,
    )


def test_loss_no_neg_bias_discount():
    """GradFashion regularizes both biases at full reg (GradFashion.py:
    171-181) — unlike BPRMF's /10 quirk.  Check numerically."""
    model = _model()
    params, frozen = model.init(jax.random.PRNGKey(1))
    params = dict(params, Bi=jnp.ones((model.num_items,)))
    users = jnp.asarray([0, 1])
    pos = jnp.asarray([2, 3])
    neg = jnp.asarray([4, 5])
    l0 = float(model.loss(params, frozen, users, pos, neg, 0.0))
    l1 = float(model.loss(params, frozen, users, pos, neg, 1.0))
    # isolate the bias contribution: with Bi=1, bias reg = reg*(l2(pos)+l2(neg))*2
    # = 1*(0.5*2 + 0.5*2)*2 = 4 on top of embedding/matrix terms.
    import fashionvisualexpl_tpu.models.base as base
    emb_terms = float(
        2.0 * (
            base.l2_loss(params["Gu"][users])
            + base.l2_loss(params["Gi"][pos])
            + base.l2_loss(params["Gi"][neg])
            + base.l2_loss(params["Tu"][users])
        )
        + 2.0 * (
            base.l2_loss(params["Ec"]) + base.l2_loss(params["Ee"])
            + base.l2_loss(params["E"]) + base.l2_loss(params["Bp"])
        )
    )
    bias_terms = (l1 - l0) - emb_terms
    np.testing.assert_allclose(bias_terms, 4.0, rtol=1e-4)


def test_attributions_match_manual_grad():
    """grad-x-input must equal the analytic attribution for this bilinear
    model: for score terms linear in the features, sum(grad*feat) per family
    recovers that family's additive score contribution."""
    model = _model()
    params, frozen = model.init(jax.random.PRNGKey(2))
    u = 3
    items = jnp.asarray([0, 5, 9], jnp.int32)
    att = np.asarray(model.feature_attributions(params, frozen, u, items))
    assert att.shape == (3, 2)

    # analytic: color contribution = theta_u . (color@Ec rows of E) + color@Ec . Bp[:ec]
    theta_u = np.asarray(params["Tu"])[u]
    E = np.asarray(params["E"])
    Bp = np.asarray(params["Bp"])[:, 0]
    ec = model.embed_color
    for j, it in enumerate(np.asarray(items)):
        c = np.asarray(frozen["Fc"])[it]
        e = np.asarray(frozen["Fe"])[it]
        pc = c @ np.asarray(params["Ec"])  # [ec]
        pe = e @ np.asarray(params["Ee"])  # [ee]
        color_contrib = theta_u @ (pc @ E[:ec]) + pc @ Bp[:ec]
        edge_contrib = theta_u @ (pe @ E[ec:]) + pe @ Bp[ec:]
        np.testing.assert_allclose(att[j, 0], color_contrib, rtol=1e-4)
        np.testing.assert_allclose(att[j, 1], edge_contrib, rtol=1e-4)


def test_trains_and_explains_end_to_end():
    data = synthetic_interactions(30, 40, interactions_per_user=8, seed=3)
    color = synthetic_features(data.num_items, 12, seed=4)
    edges = synthetic_features(data.num_items, 10, seed=5)
    model = GradFashion(
        data.num_users, data.num_items, color, edges,
        embed_k=8, embed_d=4, embed_color=6, embed_edges=6,
    )
    cfg = TrainConfig(batch_size=32, epochs=10, lr=0.02, reg=0.001, top_k=5,
                      eval_every=10)
    ev = Evaluator(model, data, k=5, user_block=32)
    state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    assert np.isfinite(results[10]["auc_t"])

    table = explanation_table(model, state.params, frozen, data)
    assert set(table.columns) == {"USER_ID", "ITEM_ID", "COLOR", "EDGES"}
    assert len(table) == sum(
        len(data.training_list[u]) + len(data.validation_list[u])
        + len(data.test_list[u])
        for u in range(data.num_users)
    )

    import pandas as pd
    reviews = pd.DataFrame({
        "USER_ID": table.USER_ID, "ITEM_ID": table.ITEM_ID,
        "REVIEW": ["text"] * len(table),
    })
    color_driven, edge_driven = join_reviews(table, reviews, top_n=5)
    assert len(color_driven) == 5 and len(edge_driven) == 5
    assert (color_driven["DIFF"].values >= edge_driven["DIFF"].values).all()


def test_batched_attributions_match_per_user():
    """The bucketed batched engine (explain/grads.py batched_attributions)
    must match the per-user path on every real slot (last-ulp: the outer
    vmap batches the matmuls)."""
    from fashionvisualexpl_tpu.explain.grads import batched_attributions

    data = synthetic_interactions(23, 31, interactions_per_user=5, seed=21)
    color = synthetic_features(data.num_items, 9, seed=22)
    edges = synthetic_features(data.num_items, 7, seed=23)
    model = GradFashion(
        data.num_users, data.num_items, color, edges,
        embed_k=6, embed_d=3, embed_color=4, embed_edges=3,
    )
    params, frozen = model.init(jax.random.PRNGKey(9))
    att = batched_attributions(
        model.feature_attributions_block, params, frozen, data, user_block=8
    )
    for u in range(data.num_users):
        pos = (
            data.training_list[u] + data.validation_list[u]
            + data.test_list[u]
        )
        if not pos:
            assert u not in att
            continue
        ref = np.asarray(
            model.feature_attributions(
                params, frozen, u, jnp.asarray(pos, jnp.int32)
            )
        )
        np.testing.assert_allclose(att[u], ref, rtol=1e-5, atol=1e-6)
