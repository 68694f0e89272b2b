"""GradFashion: explainable VBPR over two frozen low-level feature families.

Capability parity with reference src/recommender/models/GradFashion.py —
color (Fc/Ec) and edge (Fe/Ee) families projected and concatenated
(GradFashion.py:105-116), scoring b_i + <gamma_u,gamma_i> + <theta_u,theta_i>
+ vf_i . Bp (GradFashion.py:121-126), and the gradient-x-input explanation
engine (GradFashion.py:269-302) — rebuilt as one vmapped jax.grad program
instead of a ThreadPoolExecutor of per-(u,i) GradientTapes.

Note the reference's reg here does NOT divide the negative bias by 10
(GradFashion.py:171-181) — both biases are at full reg.  Reproduced.

The reference reads params.embed_color/embed_edges which its CLI never
defines (GradFashion.py:29-30, a crash-as-shipped bug per SURVEY.md C9);
here they are explicit constructor arguments.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.models.base import (
    Frozen,
    Params,
    RecommenderModel,
    bpr_pairwise_loss,
    glorot_uniform,
    l2_loss,
)


class GradFashion(RecommenderModel):
    name = "grad_fashion"

    def __init__(
        self,
        num_users: int,
        num_items: int,
        color_features: np.ndarray,  # [I, dim_c] maxabs-normalized
        edge_features: np.ndarray,  # [I, dim_e] maxabs-normalized
        embed_k: int = 128,
        embed_d: int = 20,
        embed_color: int = 32,
        embed_edges: int = 32,
    ):
        super().__init__(num_users, num_items)
        for f, nm in ((color_features, "color"), (edge_features, "edge")):
            if f.shape[0] != num_items:
                raise ValueError(f"{nm} features rows != num_items")
        self.embed_k = embed_k
        self.embed_d = embed_d
        self.embed_color = embed_color
        self.embed_edges = embed_edges
        self.dim_c = int(color_features.shape[1])
        self.dim_e = int(edge_features.shape[1])
        self._color = np.asarray(color_features, np.float32)
        self._edges = np.asarray(edge_features, np.float32)

    def row_sharded_params(self):
        return ("Bi", "Gu", "Gi", "Tu", "Fc", "Fe")

    def init(self, rng: jax.Array) -> Tuple[Params, Frozen]:
        ks = jax.random.split(rng, 7)
        d_vf = self.embed_color + self.embed_edges
        params = {
            "Bi": jnp.zeros((self.num_items,), jnp.float32),
            "Gu": glorot_uniform(ks[0], (self.num_users, self.embed_k)),
            "Gi": glorot_uniform(ks[1], (self.num_items, self.embed_k)),
            "Ec": glorot_uniform(ks[2], (self.dim_c, self.embed_color)),
            "Ee": glorot_uniform(ks[3], (self.dim_e, self.embed_edges)),
            "Bp": glorot_uniform(ks[4], (d_vf, 1)),
            "E": glorot_uniform(ks[5], (d_vf, self.embed_d)),
            "Tu": glorot_uniform(ks[6], (self.num_users, self.embed_d)),
        }
        frozen = {
            "Fc": jnp.asarray(self._color),
            "Fe": jnp.asarray(self._edges),
        }
        return params, frozen

    # --- scoring pieces ---

    def _visual_features(self, params, color_i, edges_i):
        """concat([color @ Ec, edges @ Ee]) (GradFashion.py:112-116)."""
        return jnp.concatenate(
            [color_i @ params["Ec"], edges_i @ params["Ee"]], axis=-1
        )

    def _score_from_feats(self, params, gamma_u, theta_u, gamma_i, beta_i,
                          color_i, edges_i):
        vf = self._visual_features(params, color_i, edges_i)
        theta_i = vf @ params["E"]
        return (
            beta_i
            + jnp.sum(gamma_u * gamma_i, axis=-1)
            + jnp.sum(theta_u * theta_i, axis=-1)
            + (vf @ params["Bp"])[..., 0]
        )

    def score(self, params, frozen, users, items):
        return self._score_from_feats(
            params,
            jnp.take(params["Gu"], users, axis=0),
            jnp.take(params["Tu"], users, axis=0),
            jnp.take(params["Gi"], items, axis=0),
            jnp.take(params["Bi"], items),
            jnp.take(frozen["Fc"], items, axis=0),
            jnp.take(frozen["Fe"], items, axis=0),
        )

    def loss(self, params, frozen, users, pos, neg, reg, rng=None):
        gamma_u = self.take("Gu", params["Gu"], users)
        theta_u = self.take("Tu", params["Tu"], users)
        x, feats = {}, {}
        for tag, ids in (("pos", pos), ("neg", neg)):
            gamma_i = self.take("Gi", params["Gi"], ids)
            beta_i = self.take("Bi", params["Bi"], ids)
            color_i = self.take("Fc", frozen["Fc"], ids)
            edges_i = self.take("Fe", frozen["Fe"], ids)
            x[tag] = self._score_from_feats(
                params, gamma_u, theta_u, gamma_i, beta_i, color_i, edges_i
            )
            feats[tag] = (gamma_i, beta_i)
        loss = bpr_pairwise_loss(x["pos"], x["neg"])

        gamma_pos, beta_pos = feats["pos"]
        gamma_neg, beta_neg = feats["neg"]
        # GradFashion.py:171-181 — both biases at full reg, no /10 here
        reg_loss = (
            reg
            * (
                l2_loss(gamma_u)
                + l2_loss(gamma_pos)
                + l2_loss(gamma_neg)
                + l2_loss(theta_u)
            )
            * 2.0
            + reg * (l2_loss(beta_pos) + l2_loss(beta_neg)) * 2.0
            + self.global_reg_scale
            * reg
            * (
                l2_loss(params["Ec"])
                + l2_loss(params["Ee"])
                + l2_loss(params["E"])
                + l2_loss(params["Bp"])
            )
            * 2.0
        )
        return loss + reg_loss

    # --- packed fast path (train/packed_generic.py) ---

    def packed_spec(self):
        from fashionvisualexpl_tpu.models.base import PackedSpec

        return PackedSpec(
            user_tables=(("Gu", self.embed_k), ("Tu", self.embed_d)),
            item_tables=(("Gi", self.embed_k),),
            item_scalars=("Bi",),
            dense=("E", "Bp", "Ec", "Ee"),
            frozen_item_tables=(("Fc", self.dim_c), ("Fe", self.dim_e)),
        )

    def packed_loss(self, user_vw, pos_vw, neg_vw, dense, frozen, ids,
                    reg, rng=None, frozen_vw=None):
        _, p_ids, n_ids = ids
        gu, tu = user_vw["Gu"], user_vw["Tu"]
        gp, gn = pos_vw["Gi"], neg_vw["Gi"]
        bp, bn = pos_vw["Bi"], neg_vw["Bi"]
        if frozen_vw is not None:  # Fc/Fe columns ride the packed item rows
            cp, cn = frozen_vw["pos"]["Fc"], frozen_vw["neg"]["Fc"]
            ep, en = frozen_vw["pos"]["Fe"], frozen_vw["neg"]["Fe"]
        else:
            cp = self.take("Fc", frozen["Fc"], p_ids)
            cn = self.take("Fc", frozen["Fc"], n_ids)
            ep = self.take("Fe", frozen["Fe"], p_ids)
            en = self.take("Fe", frozen["Fe"], n_ids)
        E, Bp = dense["E"], dense["Bp"]
        Ec, Ee = dense["Ec"], dense["Ee"]
        vf_p = jnp.concatenate([cp @ Ec, ep @ Ee], axis=1)
        vf_n = jnp.concatenate([cn @ Ec, en @ Ee], axis=1)
        x_pos = (
            bp + jnp.sum(gu * gp, axis=1)
            + jnp.sum(tu * (vf_p @ E), axis=1) + (vf_p @ Bp)[:, 0]
        )
        x_neg = (
            bn + jnp.sum(gu * gn, axis=1)
            + jnp.sum(tu * (vf_n @ E), axis=1) + (vf_n @ Bp)[:, 0]
        )
        loss = bpr_pairwise_loss(x_pos, x_neg)
        # GradFashion.py:171-181 — both biases at FULL reg, no /10
        return loss + (
            reg * (l2_loss(gu) + l2_loss(gp) + l2_loss(gn) + l2_loss(tu))
            * 2.0
            + reg * (l2_loss(bp) + l2_loss(bn)) * 2.0
            + self.global_reg_scale * reg
            * (l2_loss(Ec) + l2_loss(Ee) + l2_loss(E) + l2_loss(Bp)) * 2.0
        )

    def item_factors(self, params, frozen):
        vf = self._visual_features(params, frozen["Fc"], frozen["Fe"])  # [I, d_vf]
        theta_i = vf @ params["E"]  # [I, d]
        vis_bias = (vf @ params["Bp"])[:, 0]  # [I]
        return theta_i, vis_bias

    def factored_eval(self, params, frozen):
        """Factored scores for the streaming evaluator (eval/factored.py)."""
        theta_i, vis_bias = self.item_factors(params, frozen)
        uf = jnp.concatenate([params["Gu"], params["Tu"]], axis=1)
        vf = jnp.concatenate([params["Gi"], theta_i], axis=1)
        return uf, vf, params["Bi"] + vis_bias

    def predict_all(self, params, frozen):
        theta_i, vis_bias = self.item_factors(params, frozen)
        return (
            params["Bi"][None, :]
            + params["Gu"] @ params["Gi"].T
            + params["Tu"] @ theta_i.T
            + vis_bias[None, :]
        )

    def precompute_eval(self, params, frozen):
        """Projected item factors, computed once per evaluation (the
        evaluator passes them back as ctx to every user block)."""
        return self.item_factors(params, frozen)

    def predict_user_block(self, params, frozen, user_ids, ctx=None):
        theta_i, vis_bias = (
            ctx if ctx is not None else self.item_factors(params, frozen)
        )
        gu = jnp.take(params["Gu"], user_ids, axis=0)
        tu = jnp.take(params["Tu"], user_ids, axis=0)
        return (
            params["Bi"][None, :]
            + gu @ params["Gi"].T
            + tu @ theta_i.T
            + vis_bias[None, :]
        )

    # --- explanation engine (GradFashion.py:269-302) ---

    def feature_attributions(self, params, frozen, user, items):
        """Gradient-x-input attributions [len(items), 2] (color, edges).

        attribution_family = sum_j d(score)/d(feat_j) * feat_j, computed for
        every item in ONE vmapped jax.grad program (the reference runs one
        GradientTape per (u, i) in a thread pool, GradFashion.py:294-302).
        """
        gamma_u = params["Gu"][user]
        theta_u = params["Tu"][user]

        def score_of_feats(color_i, edges_i, item):
            return self._score_from_feats(
                params,
                gamma_u,
                theta_u,
                params["Gi"][item],
                params["Bi"][item],
                color_i,
                edges_i,
            )

        grad_fn = jax.grad(score_of_feats, argnums=(0, 1))

        def per_item(item):
            c = frozen["Fc"][item]
            e = frozen["Fe"][item]
            gc, ge = grad_fn(c, e, item)
            return jnp.stack([jnp.sum(gc * c), jnp.sum(ge * e)])

        return jax.vmap(per_item)(items)

    def feature_attributions_block(self, params, frozen, users, items):
        """Batched attributions: users [B], items [B, W] -> [B, W, 2].

        One fixed-shape XLA program for a whole user block — the batch_fn
        contract of explain/grads.py batched_attributions, replacing the
        per-user dispatch (the last survivor of the reference's
        per-user-pathology, GradFashion.py:294-302).  Per-(user, item)
        results are independent and match feature_attributions to the last
        ulp (pinned in tests)."""
        return jax.vmap(
            lambda u, row: self.feature_attributions(params, frozen, u, row)
        )(users, items)
