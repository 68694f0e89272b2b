"""CompVBPR: reference-formula parity (CompVBPR.py:190-200, :388-459),
component ablation semantics, loss quirks, and end-to-end learning."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.models.comp_vbpr import CompVBPR
from fashionvisualexpl_tpu.train.trainer import fit
from tests.reference_oracle import l2, softplus

U, I, K, D = 7, 11, 4, 3
DIM_S, DIM_C, DIM_T = 6, 5, 4
HW = (19, 19)  # non-power-of-two exercises the CNN's pool-shape arithmetic


def _frozen_families(seed=0):
    return (
        synthetic_features(I, DIM_S, seed=seed),
        synthetic_features(I, DIM_C, seed=seed + 1),
        synthetic_features(I, DIM_T, seed=seed + 2),
    )


def _edge_images(seed=3):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=(I, HW[0], HW[1], 1)).astype(np.float32)


def _full_model(weights=(0.25, 0.25, 0.25, 0.25)):
    sem, col, tex = _frozen_families()
    return CompVBPR(
        U, I, sem, col, _edge_images(), tex,
        embed_k=K, embed_d=D, weight_components=weights,
    )


def comp_vbpr_predict_all_oracle(params, frozen, weights, fe):
    """Reference predict_all (CompVBPR.py:410-459) in numpy; `fe` is the
    CNN-encoded edge matrix [I, D] (computed by the model under test —
    the oracle pins the score assembly, not the tower)."""
    p = {k: np.asarray(v) for k, v in params.items() if k != "cnn"}
    f = {k: np.asarray(v) for k, v in frozen.items()}
    x = p["Bi"][None, :] + p["Gu"] @ p["Gi"].T
    x = x + weights[0] * (
        p["Tus"] @ (f["Fs"] @ p["Es"]).T + (f["Fs"] @ p["Bps"]).reshape(-1)
    )
    x = x + weights[1] * (
        p["Tuc"] @ (f["Fc"] @ p["Ec"]).T + (f["Fc"] @ p["Bpc"]).reshape(-1)
    )
    x = x + weights[2] * (p["Tue"] @ fe.T + (fe @ p["Bpe"]).reshape(-1))
    x = x + weights[3] * (
        p["Tut"] @ (f["Ft"] @ p["Et"]).T + (f["Ft"] @ p["Bpt"]).reshape(-1)
    )
    return x


def test_predict_all_matches_reference_formula():
    model = _full_model()
    params, frozen = model.init(jax.random.PRNGKey(0))
    fe = np.asarray(model.encode_all_edges(params, frozen))

    got = np.asarray(model.predict_all(params, frozen))
    want = comp_vbpr_predict_all_oracle(params, frozen, model.weights, fe)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    users = jnp.asarray([0, 3, 6])
    items = jnp.asarray([1, 5, 10])
    np.testing.assert_allclose(
        np.asarray(model.score(params, frozen, users, items)),
        got[np.asarray(users), np.asarray(items)],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(model.predict_user_block(params, frozen, users)),
        got[np.asarray(users)],
        rtol=1e-4, atol=1e-5,
    )


def test_factored_eval_matches_predict_all():
    model = _full_model()
    params, frozen = model.init(jax.random.PRNGKey(1))
    uf, vf, bias = model.factored_eval(params, frozen)
    got = np.asarray(uf @ vf.T + bias[None, :])
    want = np.asarray(model.predict_all(params, frozen))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_eval_encode_blocking_invariant():
    """Blocked CNN encode == single-shot encode regardless of block size
    (incl. a block that does not divide num_items)."""
    model = _full_model()
    params, frozen = model.init(jax.random.PRNGKey(2))
    whole = np.asarray(
        model.cnn.apply(params["cnn"], frozen["Fe_img"])
    )
    for blk in (1, 4, I, I + 3):
        model.eval_encode_block = blk
        np.testing.assert_allclose(
            np.asarray(model.encode_all_edges(params, frozen)),
            whole, rtol=1e-5, atol=1e-5,
        )


def test_all_components_off_reduces_to_bprmf():
    model = CompVBPR(U, I, activated_components=(False,) * 4, embed_k=K)
    params, frozen = model.init(jax.random.PRNGKey(3))
    assert set(params) == {"Bi", "Gu", "Gi"}
    bprmf = BPRMF(U, I, embed_k=K)
    np.testing.assert_allclose(
        np.asarray(model.predict_all(params, frozen)),
        np.asarray(bprmf.predict_all(params, {})),
        rtol=1e-5,
    )


def test_single_component_toggle_matches_manual_delta():
    """Activating only the color family adds exactly the weighted color term
    (the ablation semantics of CompVBPR.py:190-200)."""
    _, col, _ = _frozen_families()
    w = 0.7
    model = CompVBPR(
        U, I, color_features=col, embed_k=K, embed_d=D,
        weight_components=(0.25, w, 0.25, 0.25),
    )
    assert model.activated == (False, True, False, False)
    params, frozen = model.init(jax.random.PRNGKey(4))
    base = (
        np.asarray(params["Bi"])[None, :]
        + np.asarray(params["Gu"]) @ np.asarray(params["Gi"]).T
    )
    color_term = w * (
        np.asarray(params["Tuc"]) @ (col @ np.asarray(params["Ec"])).T
        + (col @ np.asarray(params["Bpc"])).reshape(-1)[None, :]
    )
    np.testing.assert_allclose(
        np.asarray(model.predict_all(params, frozen)),
        base + color_term, rtol=1e-4, atol=1e-5,
    )


def test_loss_matches_reference_oracle_frozen_families():
    """Loss parity against a literal numpy port of CompVBPR.py:264-293
    (frozen families only — the CNN path is covered by the score tests and
    grad checks below): gathered-factor reg, neg-bias reg/10, whole-matrix
    E*/Bp* reg."""
    sem, col, tex = _frozen_families(seed=7)
    model = CompVBPR(
        U, I, semantic_features=sem, color_features=col,
        texture_features=tex, embed_k=K, embed_d=D,
        weight_components=(0.5, 0.25, 0.25, 2.0),
    )
    params, frozen = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(11)
    users = jnp.asarray(rng.integers(0, U, 16), jnp.int32)
    pos = jnp.asarray(rng.integers(0, I, 16), jnp.int32)
    neg = jnp.asarray(rng.integers(0, I, 16), jnp.int32)
    reg = 0.37

    got = float(model.loss(params, frozen, users, pos, neg, reg))

    p = {k: np.asarray(v) for k, v in params.items()}
    f = {k: np.asarray(v) for k, v in frozen.items()}
    u, pp, nn = (np.asarray(a) for a in (users, pos, neg))
    ws = model.weights

    def score(ids):
        x = p["Bi"][ids] + np.sum(p["Gu"][u] * p["Gi"][ids], axis=1)
        x = x + ws[0] * (
            np.sum(p["Tus"][u] * (f["Fs"][ids] @ p["Es"]), axis=1)
            + (f["Fs"][ids] @ p["Bps"])[:, 0]
        )
        x = x + ws[1] * (
            np.sum(p["Tuc"][u] * (f["Fc"][ids] @ p["Ec"]), axis=1)
            + (f["Fc"][ids] @ p["Bpc"])[:, 0]
        )
        x = x + ws[3] * (
            np.sum(p["Tut"][u] * (f["Ft"][ids] @ p["Et"]), axis=1)
            + (f["Ft"][ids] @ p["Bpt"])[:, 0]
        )
        return x

    diff = np.clip(score(pp) - score(nn), -80.0, 1e8)
    want = np.sum(softplus(-diff))
    want += (
        reg * (
            l2(p["Gu"][u]) + l2(p["Gi"][pp]) + l2(p["Gi"][nn])
            + l2(p["Tus"][u]) + l2(p["Tuc"][u]) + l2(p["Tut"][u])
        ) * 2
        + reg * l2(p["Bi"][pp]) * 2
        + reg * l2(p["Bi"][nn]) * 2 / 10
        + reg * (
            l2(p["Es"]) + l2(p["Ec"]) + l2(p["Et"])
            + l2(p["Bps"]) + l2(p["Bpc"]) + l2(p["Bpt"])
        ) * 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.slow
def test_cnn_weights_regularized_biases_not():
    """d(loss)/d(cnn) reg component hits conv/fc weights but not biases
    (CompVBPR.py:286-290 filters 'bias' out of the CNN reg)."""
    model = CompVBPR(U, I, edge_images=_edge_images(), embed_k=K, embed_d=D)
    params, frozen = model.init(jax.random.PRNGKey(6))
    users = jnp.asarray([0, 1], jnp.int32)
    pos = jnp.asarray([1, 2], jnp.int32)
    neg = jnp.asarray([3, 4], jnp.int32)

    def reg_only(cnn_params):
        p = dict(params, cnn=cnn_params)
        return model.loss(p, frozen, users, pos, neg, 1.0) - model.loss(
            p, frozen, users, pos, neg, 0.0
        )

    g = jax.grad(reg_only)(params["cnn"])
    # reg gradient of a pure-L2 term is 2*reg*W for weights, 0 for biases
    np.testing.assert_allclose(
        np.asarray(g["conv1_W"]), 2.0 * np.asarray(params["cnn"]["conv1_W"]),
        rtol=1e-4, atol=1e-5,
    )
    # biases carry only float-cancellation noise from the (reg=1)-(reg=0)
    # subtraction, many orders below the weight-reg gradient
    assert float(jnp.max(jnp.abs(g["conv1_b"]))) < 1e-8
    assert float(jnp.max(jnp.abs(g["fc8_b"]))) < 1e-8


def test_training_reduces_loss():
    data = synthetic_interactions(U, I, interactions_per_user=4, seed=0)
    sem, col, tex = _frozen_families()
    model = CompVBPR(
        U, I, sem, col, _edge_images(), tex, embed_k=8, embed_d=4,
    )
    # lr kept small: the 4096-wide CNN tower diverges chaotically at 0.05
    # (amplifies run-to-run float reduction-order differences into a flake);
    # at 28 triples/epoch the per-epoch loss is noisy, so compare the mean
    # of the last epochs against the start instead of a single endpoint
    cfg = TrainConfig(batch_size=8, epochs=6, lr=0.001, reg=0.0,
                      validation=False)
    state, frozen, results, extra = fit(model, data, cfg)
    history = extra["history"]
    assert np.mean([h.loss for h in history[-3:]]) < history[0].loss
